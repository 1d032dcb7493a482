"""Round-6 hardening: quarantine false positives, sketch-sidecar races,
whole-sweep maintenance locking, same-key stream enrichment, hostile
dedup_lines separators."""

import pathlib

import pytest

from rawdata_client_provider_gcs_spark.datamodel import MESSAGE_SCHEMA
from rawdata_client_provider_gcs_spark.sources import topic_stats
from rawdata_client_provider_gcs_spark.sources.topic import (
    ConcurrentMaintenanceError,
    Topic,
)


def _fill_topic(spark, tmp_path, name, n=60, per_file=30):
    topic = Topic(spark, f"file://{tmp_path}", name)
    rows = []
    for i in range(n):
        ts = 1_700_000_000_000 + i * 10
        ulid = ts.to_bytes(6, "big") + i.to_bytes(10, "big")
        rows.append((ulid, ts, "g", i, f"p-{i}", {"k": b"v"}))
    topic.write_dataframe(
        spark.createDataFrame(rows, MESSAGE_SCHEMA),
        max_records_per_file=per_file,
    )
    return topic


# -- quarantine must not eat healthy files the probe missed ----------------


def test_probe_absentee_is_reverified_not_quarantined(spark, tmp_path):
    """A healthy file ABSENT from the distributed probe output (transient
    storage error, >2GiB binaryFile limit) must survive the sweep; an
    absent file that really is corrupt is still caught by the driver-side
    re-verify."""
    topic = _fill_topic(spark, tmp_path, "qabs")
    paths = [p for p, _ in topic.list_manifest()]
    assert len(paths) == 2

    # simulate transient probe absence for a HEALTHY file
    healthy_name = paths[0].rsplit("/", 1)[-1]
    real_probe = Topic._probe_magic_distributed

    def probe_missing_healthy(self, ps):
        out = real_probe(self, ps)
        out.pop(healthy_name, None)
        return out

    topic._probe_magic_distributed = probe_missing_healthy.__get__(topic)
    assert topic.quarantine_corrupt() == []
    assert len(topic.list_manifest()) == 2
    assert topic.dataframe().count() == 60

    # now corrupt that same file: even while absent from the probe, the
    # driver-side re-verify flags it affirmatively
    victim = pathlib.Path(paths[0].replace("file:", ""))
    victim.write_bytes(b"\x00garbage" * 64)
    assert topic.quarantine_corrupt() == [healthy_name]
    assert topic.dataframe().count() == 30


def test_magic_ok_driver_checks(spark, tmp_path):
    topic = _fill_topic(spark, tmp_path, "qmag", n=10, per_file=10)
    path = [p for p, _ in topic.list_manifest()][0]
    assert topic._magic_ok_driver(path) is True

    # a 4-byte PAR1 remnant fails the 12-byte floor
    stub = tmp_path / "stub.parquet"
    stub.write_bytes(b"PAR1")
    assert topic._magic_ok_driver(f"file://{stub}") is False

    garbage = tmp_path / "g.parquet"
    garbage.write_bytes(b"\x00" * 64)
    assert topic._magic_ok_driver(f"file://{garbage}") is False

    avro_ok = tmp_path / "a.avro"
    avro_ok.write_bytes(b"Obj\x01" + b"\x00" * 16)
    assert topic._magic_ok_driver(f"file://{avro_ok}") is True

    # unreadable after retries -> affirmatively bad
    assert (
        topic._magic_ok_driver(f"file://{tmp_path}/nope.parquet", attempts=2)
        is False
    )


# -- maintenance lock: one lock for the whole sweep ------------------------


def test_maintain_holds_one_lock_for_whole_sweep(spark, tmp_path):
    topic = _fill_topic(spark, tmp_path, "mlock")
    lock_uri = topic._maintenance_lock_uri()

    held_during = []
    real_describe = Topic.describe

    def spying_describe(self):
        held_during.append(self.fs.exists(lock_uri))
        return real_describe(self)

    topic.describe = spying_describe.__get__(topic)
    report = topic.maintain(
        compact_small_file_max_records=100,
        quarantine=True,
        refresh_stats_columns=("position",),
    )
    # the lock was held at the LAST step of the sweep (describe), i.e.
    # across all sub-operations, and released after
    assert held_during == [True]
    assert not topic.fs.exists(lock_uri)
    assert report["quarantined"] == []

    # a second owner fails fast while the sweep's lock is held
    other = Topic(spark, f"file://{tmp_path}", "mlock")
    with topic._maintenance_lock("sweep"):
        with pytest.raises(ConcurrentMaintenanceError):
            other.maintain(quarantine=True)
        # same handle re-enters (what maintain()'s sub-ops do)
        assert topic.quarantine_corrupt() == []
    # reentrant exit must not release the outer lock early: lock is gone
    # only now, after the outer context exited
    assert not topic.fs.exists(lock_uri)


def test_reentrant_exit_does_not_release_outer_lock(spark, tmp_path):
    topic = _fill_topic(spark, tmp_path, "mlock2", n=10, per_file=10)
    lock_uri = topic._maintenance_lock_uri()
    with topic._maintenance_lock("outer"):
        with topic._maintenance_lock("inner"):
            pass
        assert topic.fs.exists(lock_uri)  # inner exit kept the lock
    assert not topic.fs.exists(lock_uri)


# -- sketch sidecar: concurrent writers' columns survive -------------------


def test_refresh_sketches_merges_under_lock(spark, tmp_path):
    """A concurrent refresh of a DIFFERENT column landing between this
    refresh's scan and its store must survive: the table is re-loaded
    under the maintenance lock before merging."""
    topic = _fill_topic(spark, tmp_path, "sketch")

    real_sketch_files = topic_stats._sketch_files
    injected = {}

    def racing_sketch_files(t, paths, exts, column, lg_k):
        out = real_sketch_files(t, paths, exts, column, lg_k)
        if not injected:
            # simulate another process completing a refresh of a
            # different column between our scan and our store
            injected["racing"] = True
            other = Topic(spark, f"file://{tmp_path}", "sketch")
            injected["ordering_group"] = topic_stats.refresh_sketches(
                other, "ordering_group"
            )
        return out

    topic_stats._sketch_files = racing_sketch_files
    try:
        mine = topic_stats.refresh_sketches(topic, "position")
    finally:
        topic_stats._sketch_files = real_sketch_files

    assert len(mine) == 2
    table = topic_stats.load_sketches(topic)
    # both columns present: the race no longer last-writer-wins
    assert set(table) == {"position", "ordering_group"}
    assert len(table["ordering_group"]) == 2


def test_refresh_sketches_waits_out_then_raises_on_held_lock(
    spark, tmp_path, monkeypatch
):
    topic = _fill_topic(spark, tmp_path, "sketch2", n=10, per_file=10)
    other = Topic(spark, f"file://{tmp_path}", "sketch2")
    monkeypatch.setattr(topic_stats.time, "sleep", lambda s: None)
    with other._maintenance_lock("sweep"):
        with pytest.raises(ConcurrentMaintenanceError):
            topic_stats.refresh_sketches(topic, "position")
    # lock released -> refresh succeeds
    assert len(topic_stats.refresh_sketches(topic, "position")) == 1


# -- stream_static_enrich with identical key names -------------------------


def test_stream_static_enrich_same_key_name(spark):
    from rawdata_client_provider_gcs_spark.streaming.windows import (
        stream_static_enrich,
    )

    events = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "user_id int, action string"
    )
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id int, tier string"
    )
    out = stream_static_enrich(events, dim, on=("user_id", "user_id"))
    # exactly one user_id column; select/groupBy by name must work
    assert out.columns.count("user_id") == 1
    got = {
        (r["user_id"], r["tier"])
        for r in out.groupBy("user_id", "tier").count().collect()
    }
    assert got == {(1, "gold"), (2, "silver")}

    left = stream_static_enrich(
        events, dim, on=("user_id", "user_id"), how="left"
    )
    assert left.count() == 3
    assert left.filter("tier IS NULL").select("user_id").first()[0] == 3


def test_stream_static_enrich_distinct_key_names_unchanged(spark):
    from rawdata_client_provider_gcs_spark.streaming.windows import (
        stream_static_enrich,
    )

    events = spark.createDataFrame([(1, "a")], "uid int, action string")
    dim = spark.createDataFrame([(1, "gold")], "id int, tier string")
    out = stream_static_enrich(events, dim, on=("uid", "id"))
    assert sorted(out.columns) == ["action", "tier", "uid"]
    assert out.first()["tier"] == "gold"


# -- dedup_lines hostile separators ----------------------------------------


def test_dedup_lines_separator_containing_quote_terminator(spark):
    from rawdata_client_provider_gcs_spark.functions.text import dedup_lines

    # a separator containing the literal \E used to terminate the \Q
    # quote early, interpreting the remainder as regex
    sep = r"\E."
    docs = spark.createDataFrame(
        [("d1", rf"alpha{sep}beta{sep}alpha{sep}gamma")],
        "doc_id string, text string",
    )
    row = dedup_lines(docs, sep=sep).first()
    assert row["n_segments"] == 4
    assert row["n_kept"] == 3
    assert row["cleaned_text"] == rf"alpha{sep}beta{sep}gamma"


def test_dedup_lines_backslash_and_regex_meta_separators(spark):
    from rawdata_client_provider_gcs_spark.functions.text import dedup_lines

    for sep in ("\\", ".*", "\\Q", "|"):
        docs = spark.createDataFrame(
            [("d", f"x{sep}y{sep}x")], "doc_id string, text string"
        )
        row = dedup_lines(docs, sep=sep).first()
        assert row["n_segments"] == 3, sep
        assert row["n_kept"] == 2, sep
        assert row["cleaned_text"] == f"x{sep}y", sep


def test_dedup_lines_rejects_empty_separator(spark):
    from rawdata_client_provider_gcs_spark.functions.text import dedup_lines

    docs = spark.createDataFrame([("d", "xy")], "doc_id string, text string")
    with pytest.raises(ValueError):
        dedup_lines(docs, sep="")


# -- IVF self-join constraint-transfer regression --------------------------


def test_ivf_survives_jittered_multifile_selfjoin(spark, tmp_path):
    """Regression for a pyspark 4.1.2 InferFiltersFromConstraints bug:
    equi-joining on an alias of the (large-literal) IVF assignment
    expression, with queries filtered from the SAME corpus scan, could
    transfer the alias's defining expression across the join onto the
    probes side where the source attribute does not exist —
    INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND at execution.  The trigger needed
    a session that had previously built other lambda-bearing plans (the
    constraint-set iteration order shifts with expression identifiers),
    which this test reproduces by writing a transformed multi-file
    corpus first, exactly the vector_stress tool's failing sequence.
    The fix (_constraint_opaque) hides the join-key alias from
    constraint inference without changing its value."""
    from pyspark.sql import functions as F

    from rawdata_client_provider_gcs_spark.operators import similarity as S

    base = spark.range(400).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda j: (
                F.pmod(F.xxhash64(F.col("id"), j), F.lit(1000)) / 1000.0
            ).cast("float"),
        ).alias("embedding"),
    )
    out = str(tmp_path / "vec")
    base.repartition(6).write.parquet(out)
    corpus = spark.read.parquet(out)
    q = corpus.filter(F.col("vec_id") < 10)
    rows = S.ivf_ann_topk(corpus, q, k=5, nlist=8, nprobe=2).collect()
    assert len(rows) == 50
    # the guard is value-neutral: assignments equal the cell report's
    per_query = {}
    for r in rows:
        per_query.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_query.values())

    pairs = S.lsh_ann_topk(corpus, q, k=5, dim=16).collect()
    assert {r["query_id"] for r in pairs} <= set(range(10))


# -- materialized IVF inverted lists ---------------------------------------


def test_ivf_index_build_query_matches_inline_and_prunes(
    spark, tmp_path, sf_smoke_dir
):
    """build_ivf_index + ivf_query_index returns exactly what the inline
    ivf_ann_topk computes for the same corpus/quantizer, and the probe
    scan reads ONLY the probed cells' partition directories."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from rawdata_client_provider_gcs_spark.operators import similarity as S
    from rawdata_client_provider_gcs_spark.tables import load_table

    e = load_table(spark, sf_smoke_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    idx = str(tmp_path / "ivf-index")
    S.build_ivf_index(e, idx, nlist=16)

    got = S.ivf_query_index(spark, idx, q, k=5, nprobe=4)
    want = S.ivf_ann_topk(e, q, k=5, nlist=16, nprobe=4)
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, want.collect()))
    assert [t[:2] + (t[3],) for t in a] == [t[:2] + (t[3],) for t in b]
    for x, y in zip(a, b):
        assert abs(x[2] - y[2]) < 1e-9

    # partition pruning: the lists scan carries a cid partition filter
    # and reads only the probed cells' directories (few queries + low
    # nprobe so the probed set is a strict subset of the 16 cells)
    narrow = S.ivf_query_index(
        spark, idx, e.filter(F.col("vec_id") < 2), k=5, nprobe=2
    )
    import pathlib
    import re

    buf = io.StringIO()
    with redirect_stdout(buf):
        narrow.explain()
    plan = buf.getvalue()
    # the literal IN lands in the scan's partition filters (static
    # pruning — only those directories are listed/read)
    assert "PartitionFilters" in plan
    part_section = plan.split("PartitionFilters", 1)[1][:300]
    m = re.search(r"cid#\d+ IN \(([0-9,]+)\)", part_section)
    assert m, part_section
    probed = set(m.group(1).split(","))
    on_disk = {
        p.name.split("=")[1]
        for p in pathlib.Path(idx).iterdir()
        if p.name.startswith("cid=")
    }
    # 2 queries x 2 probes: a strict subset of the 16 cells is scanned
    assert probed and probed < on_disk, (len(probed), len(on_disk))


def test_ivf_index_append_equals_full_rebuild(spark, tmp_path, sf_smoke_dir):
    """Appending new vectors with the stored quantizer yields exactly
    the same query results as rebuilding the whole index from the
    unioned corpus with the same quantizer."""
    from pyspark.sql import functions as F

    from rawdata_client_provider_gcs_spark.operators import similarity as S
    from rawdata_client_provider_gcs_spark.tables import load_table

    e = load_table(spark, sf_smoke_dir, "embeddings")
    old = e.filter(F.col("vec_id") % 2 == 0)
    new = e.filter(F.col("vec_id") % 2 == 1)
    q = e.filter(F.col("vec_id") < 6)

    grown = str(tmp_path / "grown")
    # quantizer trained (lowest-id) on the OLD half only, then frozen
    S.build_ivf_index(old, grown, nlist=8)
    S.append_to_ivf_index(new, grown)

    full = str(tmp_path / "full")
    cents = spark.read.parquet(f"{grown}/_centroids")
    S.build_ivf_index(e, full, centroids=cents)

    a = sorted(map(tuple, S.ivf_query_index(spark, grown, q, k=5).collect()))
    b = sorted(map(tuple, S.ivf_query_index(spark, full, q, k=5).collect()))
    assert a == b
    assert len(a) == 6 * 5


def test_ivf_index_rebuild_invalidates_lists_schema_cache(
    spark, tmp_path, sf_smoke_dir
):
    """The lists-schema cache (r17: probe calls no longer re-infer the
    read-back schema) must be dropped when the index at the same path is
    REBUILT.  The rebuild here changes the neighbor_id column TYPE
    (long -> string): ``_assign_cells`` always emits the same column
    NAMES, so only a type change makes a stale cached schema actually
    observable (string ids read through a pinned long schema surface as
    nulls/garbage) — the r17 rename-only variant of this test passed
    even with the invalidation removed (ADVICE r17)."""
    from pyspark.sql import functions as F

    from rawdata_client_provider_gcs_spark.operators import similarity as S
    from rawdata_client_provider_gcs_spark.tables import load_table

    e = load_table(spark, sf_smoke_dir, "embeddings")
    idx = str(tmp_path / "reused")
    S.build_ivf_index(e, idx, nlist=4)
    r1 = S.ivf_query_index(
        spark, idx, e.filter(F.col("vec_id") < 4), k=3, nprobe=2
    ).collect()
    assert r1 and all(row["neighbor_id"] is not None for row in r1)
    # rebuild IN the same application at the same path with STRING ids
    # (explicit quantizer: the default derives cid by casting ids to
    # long, which string ids cannot satisfy)
    cents = spark.read.parquet(f"{idx}/_centroids")
    e2 = e.select(
        F.concat(F.lit("doc-"), F.col("vec_id").cast("string")).alias("doc"),
        F.col("embedding").alias("vec"),
    )
    S.build_ivf_index(e2, idx, id_col="doc", vec_col="vec", centroids=cents)
    q2 = e2.filter(F.substring("doc", 5, 10).cast("long") < 4)
    r2 = S.ivf_query_index(
        spark, idx, q2, id_col="doc", vec_col="vec", k=3, nprobe=2
    ).collect()
    assert r2 and all(
        isinstance(row["neighbor_id"], str)
        and row["neighbor_id"].startswith("doc-")
        for row in r2
    )
    # appends share the schema by contract: the cache entry survives and
    # appended vectors are visible through it
    new = e2.filter(F.substring("doc", 5, 10).cast("long") >= 4)
    S.append_to_ivf_index(new, idx, id_col="doc", vec_col="vec")
    n_rebuilt = e2.count()
    n_appended = new.count()
    seen = S._read_lists(spark, idx)  # served from the cached schema
    assert seen.count() == n_rebuilt + n_appended
    assert seen.filter(F.col("neighbor_id").isNull()).count() == 0


def test_ivf_index_large_nlist_fallback_paths(spark, tmp_path):
    """Above the inlined-literal codegen bound (nlist*dim > 16384 — the
    regime the materialized index targets, nlist ~ sqrt(N)), assignment
    and probing fall back to broadcast-cross + combinable argmax; index
    query results still match the inline operator exactly."""
    from pyspark.sql import functions as F

    from rawdata_client_provider_gcs_spark.operators import similarity as S

    corpus = spark.range(400).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: (
                F.pmod(F.xxhash64(F.col("id"), j), F.lit(997)) / 997.0 - 0.5
            ).cast("float"),
        ).alias("embedding"),
    )
    q = corpus.filter(F.col("vec_id") < 5)
    nlist = 280  # 280 * 64 = 17920 > _MAPSIDE_CENTROID_CELLS
    assert nlist * 64 > S._MAPSIDE_CENTROID_CELLS

    idx = str(tmp_path / "big-nlist")
    S.build_ivf_index(corpus, idx, nlist=nlist)
    got = sorted(
        map(tuple, S.ivf_query_index(spark, idx, q, k=3, nprobe=4).collect())
    )
    want = sorted(
        map(
            tuple,
            S.ivf_ann_topk(corpus, q, k=3, nlist=nlist, nprobe=4).collect(),
        )
    )
    assert [t[:2] + (t[3],) for t in got] == [t[:2] + (t[3],) for t in want]
    for a, b in zip(got, want):
        assert abs(a[2] - b[2]) < 1e-9


def test_ivf_index_report_matches_cell_report(spark, tmp_path, sf_smoke_dir):
    """The materialized-index health report (stored-cid equi-join)
    equals the recompute-based ivf_cell_report for the same
    corpus/quantizer."""
    from rawdata_client_provider_gcs_spark.operators import similarity as S
    from rawdata_client_provider_gcs_spark.tables import load_table

    e = load_table(spark, sf_smoke_dir, "embeddings")
    idx = str(tmp_path / "report-idx")
    S.build_ivf_index(e, idx, nlist=8)
    got = {
        r["cid"]: (r["n_vectors"], round(r["min_cos"], 9), round(r["max_cos"], 9))
        for r in S.ivf_index_report(spark, idx).collect()
    }
    want = {
        r["cid"]: (r["n_vectors"], round(r["min_cos"], 9), round(r["max_cos"], 9))
        for r in S.ivf_cell_report(e, nlist=8).collect()
    }
    assert got == want


# -- concurrent producers on one topic -------------------------------------


def test_two_producers_interleaved_one_topic(spark, tmp_path):
    """Two producer handles publishing distinct messages into the same
    topic, with interleaved flush windows: every message survives, the
    ordered scan sees the union, and the logical-twin convergence in
    the commit protocol does not eat either side (their manifest facts
    differ by first position).  Same-millisecond flushes from both
    producers are the adversarial part."""
    from rawdata_client_provider_gcs_spark import RawdataClient, RawdataMessage

    client_a = RawdataClient(spark, str(tmp_path))
    client_b = RawdataClient(spark, str(tmp_path))
    pa = client_a.producer("t")
    pb = client_b.producer("t")
    for i in range(3):
        for j in range(4):
            pa.publish(RawdataMessage(position=f"a-{i}-{j}", data={}))
            pb.publish(RawdataMessage(position=f"b-{i}-{j}", data={}))
        pa.flush()
        pb.flush()
    pa.close()
    pb.close()

    topic = client_a.topic("t")
    assert len(topic.list_manifest()) == 6  # 3 windows x 2 producers
    rows = topic.ordered_dataframe().select("position").collect()
    got = [r["position"] for r in rows]
    assert len(got) == 24 and len(set(got)) == 24
    assert {p.split("-")[0] for p in got} == {"a", "b"}
    # ULID global order holds across producers within each reader
    consumer = client_a.consumer("t")
    seen = []
    while True:
        m = consumer.receive(0)
        if m is None:
            break
        seen.append(m.ulid)
    assert seen == sorted(seen)
    client_a.close()
    client_b.close()
