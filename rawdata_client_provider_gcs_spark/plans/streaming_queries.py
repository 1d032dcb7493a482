"""Streaming operator queries, run bounded via ``availableNow``.

Each query runs a real Structured Streaming pipeline (file source →
stateful transformation → memory sink) to completion and returns the
result table, so the driver's batch-style harness can still check it.
Window aggregations align to epoch boundaries, so tumbling/sliding results
are oracle-checkable with ``date_trunc`` arithmetic; ordering-dependent
behaviors (late-data drops) are semantic smoke checks instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming import windows as W
from ..tables import load_table
from .catalog import register


@register(
    "q_stream_tumbling",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
""",
    tags=("streaming", "window"),
)
def q_stream_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 1-hour event-time windows with watermark (§2B Streaming).

    Append output: each window is emitted exactly once, after the
    watermark passes its end, and its state is dropped — bounded state at
    any scale (sentinel flush batches close the trailing windows, see
    ``flushable_event_stream``)."""
    events = W.flushable_event_stream(spark, sf)
    out = W.run_available_now_append(
        W.tumbling_counts(events, "1 hour"), "t_tumbling"
    )
    return out.filter(F.col("event_type") != W.SENTINEL_EVENT_TYPE)


@register(
    "q_stream_sliding",
    oracle="""
WITH starts AS (
  SELECT unnest([
           ts - (epoch_us(ts) % 1800000000) * INTERVAL 1 MICROSECOND,
           ts - (epoch_us(ts) % 1800000000) * INTERVAL 1 MICROSECOND
              - INTERVAL 30 MINUTE
         ]) AS window_start
  FROM events
)
SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n
FROM starts GROUP BY window_start
""",
    tags=("streaming", "window"),
)
def q_stream_sliding(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding 1-hour/30-min windows — every event in exactly 2 windows.

    Append output with sentinel flush; sentinel-only windows are tagged
    and dropped inside the streaming aggregation itself, so the whole
    query is a single streaming job (no side batch job to find the real
    max timestamp)."""
    events = W.flushable_event_stream(spark, sf)
    return W.run_available_now_append(
        W.sliding_counts(
            events, "1 hour", "30 minutes", drop_sentinel_windows=True
        ),
        "t_sliding",
    )


@register(
    "q_stream_session",
    oracle="""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
                OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM gaps
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       MIN(ts) AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sessions GROUP BY user_id, session_id
""",
    tags=("streaming", "session"),
    bench=True,
)
def q_stream_session(spark: SparkSession, sf: str) -> DataFrame:
    """Native session windows (30-min gap) — oracle is the batch
    gaps-and-islands formulation of the same semantics.  Append output:
    a session is emitted once, when the watermark passes gap past its last
    event, and its state is evicted."""
    events = W.flushable_event_stream(spark, sf)
    out = W.run_available_now_append(
        W.session_counts(events, "30 minutes"), "t_session"
    )
    return out.filter(F.col("user_id") != F.lit(W.SENTINEL_USER_ID))


@register(
    "q_stream_dedup",
    oracle="""
SELECT event_type, CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_unique
FROM events GROUP BY event_type
""",
    tags=("streaming", "dedup"),
)
def q_stream_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Stateful streaming dedup: a doubled stream deduped on event_id
    inside the stream, then aggregated.

    ``dropDuplicatesWithinWatermark`` so dedup state EVICTS as the
    watermark advances — with plain ``dropDuplicates(["event_id"])``
    (no event-time column in the subset) Spark keeps one state entry
    per distinct id forever, which a production tail cannot afford
    (review r8; the duplicates here are exact copies, so results are
    identical)."""
    events = W.stream_events(spark, sf)
    doubled = events.union(events)
    deduped = doubled.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    agg = deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_unique")
    )
    return W.run_available_now(agg, "t_dedup")


@register(
    "q_stream_stateful_counts",
    oracle="""
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MAX(ts) AS last_ts
FROM events GROUP BY user_id
""",
    tags=("streaming", "stateful"),
    bench=True,
)
def q_stream_stateful_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): final per-user
    counters equal the batch group-by."""
    events = W.stream_events(spark, sf)
    counts = W.stateful_user_counts(events)
    # per-key Python work is the load here (one pandas call per user),
    # so state partitions track cores up to the measured knee at 16 —
    # scale-adaptive, not a local[32] constant (the driver also benches
    # at lower core counts)
    out = W.run_available_now_update(
        counts,
        "t_stateful",
        state_partitions=min(spark.sparkContext.defaultParallelism, 16),
    )
    # update mode emits one row per key per micro-batch; keep the final
    # (largest) counter per key so multi-batch runs stay correct
    return (
        out.groupBy(F.col("user_id").cast("long").alias("user_id"))
        .agg(
            F.max("n_events").cast("long").alias("n_events"),
            F.max("last_ts").cast("timestamp_ntz").alias("last_ts"),
        )
    )


@register(
    "q_stream_stream_join",
    oracle="""
SELECT CAST(p.event_id AS BIGINT) AS purchase_id,
       CAST(c.event_id AS BIGINT) AS click_id,
       CAST(p.user_id AS BIGINT) AS user_id
FROM events p JOIN events c
  ON c.user_id = p.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
""",
    tags=("streaming", "join"),
)
def q_stream_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked stream-stream inner join: clicks meet purchases of the
    same user within a 1-hour lookback.  Both sides carry 1-hour
    watermarks, so join state for rows older than the range bound is
    evicted as the watermark advances (the sentinel batches push it past
    all real data before the bounded run ends) — the exact mechanics of a
    production dual-stream join.  The oracle is the equivalent batch join.
    """
    purchases, clicks = W.stream_join_sides(spark, sf, "purchase", "click")
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    )
    out = W.run_available_now_append(joined, "t_ss_join")
    return out.filter(F.col("p_user") != W.SENTINEL_USER_ID).select(
        F.col("purchase_id").cast("long").alias("purchase_id"),
        F.col("click_id").cast("long").alias("click_id"),
        F.col("p_user").cast("long").alias("user_id"),
    )


@register("q_stream_near_dup", tags=("streaming", "dedup", "llm"))
def q_stream_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental MinHash-LSH near-dup filter over a document stream
    (§2B streaming × LLM dedup).  Admitted = documents whose LSH band
    buckets were all unseen at arrival; the admitted set is the greedy
    maximal independent set of the LSH collision graph in doc-id order.
    Rows-only check (band hashes use Spark's xxhash64, not expressible
    in the DuckDB oracle); batch-parity of the bucket computation and
    cross-batch dedup behavior are pytest-asserted
    (tests/test_sources.py)."""
    from ..streaming import dedup as SD

    docs = SD.stream_documents(spark, sf)
    return SD.near_dup_admitted(spark, docs, query_name="t_near_dup")


@register(
    "q_stream_sequence_gaps",
    oracle="""
WITH seqs AS (
  SELECT user_id % 50 AS group_id,
         ROW_NUMBER() OVER (PARTITION BY user_id % 50 ORDER BY event_id)
           AS seq
  FROM events
), kept AS (
  SELECT group_id, seq FROM seqs WHERE seq % 101 != 7
), lagged AS (
  SELECT group_id, seq,
         LAG(seq) OVER (PARTITION BY group_id ORDER BY seq) AS prev
  FROM kept
)
SELECT CAST(group_id AS BIGINT) AS group_id,
       CAST(COUNT(*) AS BIGINT) AS n_seen,
       CAST(MIN(seq) AS BIGINT) AS min_seq,
       CAST(MAX(seq) AS BIGINT) AS max_seq,
       CAST(MAX(seq) - MIN(seq) + 1 - COUNT(*) AS BIGINT) AS n_missing,
       CAST(SUM(CASE WHEN prev IS NOT NULL AND seq > prev + 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps
FROM lagged GROUP BY group_id
""",
    tags=("streaming", "stateful", "tws"),
    bench=True,
)
def q_stream_sequence_gaps(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming sequence-gap detection (the reference's
    ``orderingGroup``/``sequenceNumber`` fields,
    AvroRawdataProducer.java:241-242, finally *interpreted*: which
    sequence numbers never arrived?).

    A deterministic sequenced stream with planted holes (every seq ≡ 7
    mod 101 dropped) is staged into 3 micro-batches sharded by
    ``seq % 3``, so each group's sequences arrive out of order and the
    per-group interval-set state must merge across batches.  The final
    per-group stats equal the batch gaps-and-islands computation the
    oracle states in SQL — an exact check of a custom stateful operator
    whose state is bounded by hole count, not message count (see
    ``streaming/gaps.py``; this query runs the GroupState engine, the
    ``transformWithStateInPandas`` twin is runtime-gated)."""
    from ..streaming import gaps as G
    from ..streaming import windows as W2

    stream = G.staged_sequence_stream(
        spark, sf, n_groups=50, drop_mod=101, drop_rem=7, n_files=3
    )
    out = W2.run_available_now_update(
        G.sequence_gap_stats_groupstate(stream), "t_seq_gaps"
    )
    # update mode emits one stats row per key per batch; n_seen is
    # nondecreasing and rows with equal n_seen are identical, so the
    # struct-max is the final state snapshot
    final = out.groupBy("group_id").agg(
        F.max(
            F.struct("n_seen", "min_seq", "max_seq", "n_missing", "n_gaps")
        ).alias("s")
    )
    return final.select(
        F.col("group_id").cast("long").alias("group_id"),
        F.col("s.n_seen").cast("long").alias("n_seen"),
        F.col("s.min_seq").cast("long").alias("min_seq"),
        F.col("s.max_seq").cast("long").alias("max_seq"),
        F.col("s.n_missing").cast("long").alias("n_missing"),
        F.col("s.n_gaps").cast("long").alias("n_gaps"),
    )


@register(
    "q_log_sequence_gap_ranges",
    oracle="""
WITH seqs AS (
  SELECT user_id % 50 AS group_id,
         ROW_NUMBER() OVER (PARTITION BY user_id % 50 ORDER BY event_id)
           AS seq
  FROM events
), kept AS (
  SELECT group_id, seq FROM seqs WHERE seq % 101 != 7
), lagged AS (
  SELECT group_id, seq,
         LAG(seq) OVER (PARTITION BY group_id ORDER BY seq) AS prev
  FROM kept
)
SELECT CAST(group_id AS BIGINT) AS group_id,
       CAST(prev + 1 AS BIGINT) AS gap_start,
       CAST(seq - 1 AS BIGINT) AS gap_end,
       CAST(seq - prev - 1 AS BIGINT) AS gap_len
FROM lagged WHERE prev IS NOT NULL AND seq > prev + 1
""",
    tags=("messagelog", "audit"),
)
def q_log_sequence_gap_ranges(spark: SparkSession, sf: str) -> DataFrame:
    """Offline sequence audit: enumerate every missing range per
    ordering group (the batch complement of `q_stream_sequence_gaps`,
    same derived sequence stream with planted holes).  One distinct +
    one lag window; each hole surfaces as ``[gap_start, gap_end]``."""
    from pyspark.sql import Window

    from ..streaming import gaps as G

    n_groups, drop_mod, drop_rem = 50, 101, 7
    w = Window.partitionBy(F.col("user_id") % n_groups).orderBy("event_id")
    rows = (
        load_table(spark, sf, "events")
        .select(
            (F.col("user_id") % n_groups).alias("group_id"),
            F.row_number().over(w).alias("seq"),
        )
        .filter(F.col("seq") % drop_mod != drop_rem)
    )
    return G.sequence_gap_ranges_batch(rows)


@register(
    "q_stream_enrich_static",
    oracle="""
SELECT c.c_mktsegment AS segment,
       e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
""",
    tags=("streaming", "join", "enrich"),
)
def q_stream_enrich_static(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-static broadcast enrichment (§2B streaming): unbounded
    events join the static customer dimension without shuffling the
    stream, then aggregate per (segment, event_type).  Complete-mode
    memory sink keeps the harness deterministic; the oracle states the
    identical batch join."""
    events = W.stream_events(spark, sf)
    dim = load_table(spark, sf, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = W.stream_static_enrich(events, dim, ("user_id", "c_custkey"))
    agg = joined.groupBy(
        F.col("c_mktsegment").alias("segment"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("total_value"),
    )
    return W.run_available_now(agg, "t_enrich_static")


@register(
    "q_stream_stream_left_join",
    oracle="""
SELECT CAST(p.event_id AS BIGINT) AS purchase_id,
       CAST(c.event_id AS BIGINT) AS click_id,
       CAST(p.user_id AS BIGINT) AS user_id
FROM events p LEFT JOIN events c
  ON c.user_id = p.user_id
 AND c.event_type = 'click'
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
WHERE p.event_type = 'purchase'
""",
    tags=("streaming", "join"),
)
def q_stream_stream_left_join(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join — the semantics the
    inner join can't show: a purchase with no qualifying click is
    emitted NULL-extended only once the watermark proves no match can
    still arrive (state eviction = result emission).  The sentinel
    flush batches push the watermark past all real data so every
    pending outer row drains in the bounded run; the oracle is the
    equivalent batch left join.

    The sides come from :func:`...streaming.windows.stream_join_sides`
    — the event-type predicate must not drop the sentinel rows before
    the watermark operator (Catalyst pushes a plain filter below it,
    into the scan, which silently freezes the watermark and strands
    every pending outer row; see that helper's docstring)."""
    purchases, clicks = W.stream_join_sides(spark, sf, "purchase", "click")
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    )
    out = W.run_available_now_append(joined, "t_ss_left_join")
    return out.filter(F.col("p_user") != W.SENTINEL_USER_ID).select(
        F.col("purchase_id").cast("long").alias("purchase_id"),
        F.col("click_id").cast("long").alias("click_id"),
        F.col("p_user").cast("long").alias("user_id"),
    )


@register(
    "q_stream_stream_full_join",
    oracle="""
SELECT CAST(p.event_id AS BIGINT) AS purchase_id,
       CAST(c.event_id AS BIGINT) AS click_id,
       CAST(COALESCE(p.user_id, c.user_id) AS BIGINT) AS user_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
""",
    tags=("streaming", "join"),
)
def q_stream_stream_full_join(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked stream-stream FULL OUTER join: both the purchases
    that never saw a click and the clicks that never led to a purchase
    NULL-emit when their state evicts — the union of both sides'
    eviction semantics in one operator (sides via
    :func:`...streaming.windows.stream_join_sides`, sentinels kept
    above the watermark)."""
    purchases, clicks = W.stream_join_sides(spark, sf, "purchase", "click")
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        "full_outer",
    )
    out = W.run_available_now_append(joined, "t_ss_full_join")
    return out.filter(
        (F.coalesce(F.col("p_user"), F.lit(0)) != W.SENTINEL_USER_ID)
        & (F.coalesce(F.col("c_user"), F.lit(0)) != W.SENTINEL_USER_ID)
    ).select(
        F.col("purchase_id").cast("long").alias("purchase_id"),
        F.col("click_id").cast("long").alias("click_id"),
        F.coalesce(F.col("p_user"), F.col("c_user"))
        .cast("long")
        .alias("user_id"),
    )


@register(
    "q_stream_crawl_ingest",
    oracle="""
WITH pages AS (
  SELECT doc_id,
         '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
         || '</title><script>var x = 1 < 2;</script></head><body><p>'
         || substr(text, 1, 80) || ' &amp; tail</p>'
         || repeat('<a href="https://example.com/x">link</a> ',
                   CAST(doc_id % 4 AS INTEGER))
         || '</body></html>' AS html
  FROM documents WHERE doc_id < 200
), x AS (
  SELECT doc_id,
         trim(regexp_replace(
           replace(replace(replace(replace(replace(replace(
             regexp_replace(
               regexp_replace(html,
                 '<script[^>]*>.*?</script\\s*>|<style[^>]*>.*?</style\\s*>|<title[^>]*>.*?</title\\s*>',
                 ' ', 'gis'),
               '<[^>]+>', ' ', 'g'),
             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
             '&nbsp;', ' '), '&amp;', '&'),
           '\\s+', ' ', 'g')) AS vis
  FROM pages
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(length(vis) AS BIGINT) AS text_len,
       CAST(len(string_split(vis, ' ')) AS BIGINT) AS n_tokens
FROM x
""",
    tags=("streaming", "source", "warc", "html"),
)
def q_stream_crawl_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """The crawl front door as a STREAM, oracle-exact: WARC files
    arrive in micro-batches (file source, ``maxFilesPerTrigger=1``),
    each batch explodes to records, filters HTTP 200 and extracts
    visible text — entirely STATELESS transforms, so append mode needs
    no watermark and state is zero at any scale.  This is the shape a
    production crawl tail runs: new WARC drops stream through the same
    ``warc_records`` + ``functions/html.py`` plan the batch query
    (``q_crawl_pipeline``) uses, and the same DuckDB oracle checks it.
    """
    import tempfile

    from ..functions import html as H
    from ..sources import warc as Wsrc

    d = (
        load_table(spark, sf, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )

    def make(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                page = (
                    f"<html><head><title>Doc {did}</title>"
                    "<script>var x = 1 < 2;</script></head><body><p>"
                    + str(text)[:80]
                    + " &amp; tail</p>"
                    + '<a href="https://example.com/x">link</a> ' * (did % 4)
                    + "</body></html>"
                )
                recs = [
                    {"warc_type": "response",
                     "target_uri": f"https://crawl.example/{did}",
                     "http_status": 200, "body": page.encode()},
                    {"warc_type": "response",
                     "target_uri": f"https://crawl.example/{did}/404",
                     "http_status": 404, "body": b"x"},
                ]
                payloads.append(
                    Wsrc.build_warc(recs, gzip_members=(did % 2 == 0))
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    # stage the WARC corpus as four parquet drops, then stream them
    stage = tempfile.mkdtemp(prefix="rawdata-warc-stream-")
    files = d.mapInPandas(make, "doc_id long, payload binary")
    files.withColumn("part", F.col("doc_id") % 4).repartition(
        4, "part"
    ).drop("part").write.mode("overwrite").parquet(stage)

    stream = (
        spark.readStream.schema("doc_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    recs = Wsrc.warc_records(stream).filter(
        (F.col("warc_type") == "response") & (F.col("http_status") == 200)
    )
    pages = recs.select("doc_id", F.col("body").cast("string").alias("html"))
    out = W.run_available_now_append(
        H.with_html_columns(pages, "html").select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("html_text_len").alias("text_len"),
            F.size(F.split("html_text", " ")).cast("long").alias("n_tokens"),
        ),
        "t_crawl_ingest",
    )
    return out


@register(
    "q_stream_archive_ingest",
    oracle="""
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       'doc/' || CAST(doc_id AS VARCHAR) || '/a.txt' AS path,
       substr(text, 1, 50) AS content
FROM d
UNION ALL
SELECT CAST(doc_id AS BIGINT),
       'doc/' || CAST(doc_id AS VARCHAR) || '/b.txt',
       substr(text, 51, 70)
FROM d
""",
    tags=("streaming", "source", "archive"),
)
def q_stream_archive_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """The archive tier as a STREAM, oracle-exact: ZIP/TAR drops arrive
    in micro-batches and explode to member rows through the same
    ``archive_members`` kernel as the batch query
    (``q_crawl_archive_members``) — stateless append, zero state at any
    scale, both container formats under the one oracle.
    """
    import tempfile

    from ..sources import archive as A

    d = (
        load_table(spark, sf, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )

    def make(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                t = str(text)
                members = [
                    (f"doc/{did}/a.txt", t[:50].encode()),
                    (f"doc/{did}/b.txt", t[50:120].encode()),
                ]
                if did % 2 == 0:
                    payloads.append(A.build_zip(members))
                else:
                    payloads.append(A.build_tar(members))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    stage = tempfile.mkdtemp(prefix="rawdata-archive-stream-")
    files = d.mapInPandas(make, "doc_id long, payload binary")
    files.withColumn("part", F.col("doc_id") % 4).repartition(
        4, "part"
    ).drop("part").write.mode("overwrite").parquet(stage)

    stream = (
        spark.readStream.schema("doc_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    out = W.run_available_now_append(
        A.archive_members(stream).select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "path",
            F.col("payload").cast("string").alias("content"),
        ),
        "t_archive_ingest",
    )
    return out


@register(
    "q_stream_classify",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CASE CAST(doc_id % 6 AS INTEGER)
         WHEN 0 THEN 'zip' WHEN 1 THEN 'tar' WHEN 2 THEN 'rtf'
         WHEN 3 THEN 'pdf' WHEN 4 THEN 'html' ELSE 'utf8-text' END
         AS format,
       CASE CAST(doc_id % 6 AS INTEGER)
         WHEN 0 THEN 'archive' WHEN 1 THEN 'archive'
         WHEN 2 THEN 'document' WHEN 3 THEN 'document'
         WHEN 4 THEN 'web' ELSE 'text' END AS category,
       CASE WHEN doc_id % 6 = 1 THEN 'gzip' ELSE NULL END AS wrapper
FROM documents WHERE doc_id < 150
""",
    tags=("streaming", "source", "crawl", "classify"),
)
def q_stream_classify(spark: SparkSession, sf: str) -> DataFrame:
    """Payload ROUTING as a stream, oracle-exact: mixed drops arrive
    in micro-batches and each is classified by the same magic-first
    union as the batch router (``q_crawl_classify``) — stateless
    append, the shape of a landing-zone triage job that fans files to
    per-format pipelines as they arrive.
    """
    import tempfile

    from ..sources import archive as A
    from ..sources import rtf as RT
    from ..sources.classify import classify_payloads

    d = (
        load_table(spark, sf, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id", "text")
    )

    def make(batches):
        import gzip as _gzip

        import pandas as pd

        from ..operators import rawpdf

        for pdf in batches:
            payloads = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                t = str(text)[:60]
                v = did % 6
                if v == 0:
                    blob = A.build_zip([("a.txt", t.encode())])
                elif v == 1:
                    blob = _gzip.compress(
                        A.build_tar([("a.txt", t.encode())])
                    )
                elif v == 2:
                    blob = RT.build_rtf([t])
                elif v == 3:
                    blob = rawpdf.encode_pdf([[t[:40]]])
                elif v == 4:
                    blob = (b"<!DOCTYPE html><html><body>"
                            + t.encode() + b"</body></html>")
                else:
                    blob = ("prose " + t + "\n").encode()
                payloads.append(blob)
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    stage = tempfile.mkdtemp(prefix="rawdata-classify-stream-")
    files = d.mapInPandas(make, "doc_id long, payload binary")
    files.withColumn("part", F.col("doc_id") % 4).repartition(
        4, "part"
    ).drop("part").write.mode("overwrite").parquet(stage)

    stream = (
        spark.readStream.schema("doc_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    out = W.run_available_now_append(
        classify_payloads(stream).select(
            "doc_id", "format", "category", "wrapper"
        ),
        "t_classify_stream",
    )
    return out


@register(
    "q_stream_office_ingest",
    oracle="""
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 150)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       'docx' AS doc_format,
       CAST(0 AS BIGINT) AS part_idx,
       trim(regexp_replace(
         substr(text, 1, 40) || ' ' || substr(text, 41, 40),
         '\\s+', ' ', 'g')) AS text
FROM d WHERE doc_id % 5 = 0
UNION ALL
SELECT CAST(doc_id AS BIGINT), 'epub', CAST(i AS BIGINT),
       trim(regexp_replace(substr(text, 1 + 40 * CAST(i AS INTEGER), 40),
                           '\\s+', ' ', 'g'))
FROM d, unnest(generate_series(0, 1)) AS t(i) WHERE doc_id % 5 = 1
UNION ALL
SELECT CAST(doc_id AS BIGINT), 'odt', CAST(0 AS BIGINT),
       trim(regexp_replace(
         substr(text, 1, 40) || ' ' || substr(text, 41, 40),
         '\\s+', ' ', 'g'))
FROM d WHERE doc_id % 5 = 2
UNION ALL
SELECT CAST(doc_id AS BIGINT), 'doc', CAST(0 AS BIGINT),
       trim(regexp_replace(
         substr(text, 1, 40) || ' ' || substr(text, 41, 40),
         '\\s+', ' ', 'g'))
FROM d WHERE doc_id % 5 = 3
UNION ALL
SELECT CAST(doc_id AS BIGINT), 'rtf', CAST(0 AS BIGINT),
       trim(regexp_replace(
         substr(text, 1, 40) || ' ' || substr(text, 41, 40),
         '\\s+', ' ', 'g'))
FROM d WHERE doc_id % 5 = 4
""",
    tags=("streaming", "source", "office"),
)
def q_stream_office_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """The office tier as a STREAM, oracle-exact: DOCX/EPUB/ODT plus
    legacy .doc and RTF drops
    arrive in micro-batches and explode to per-part text rows through
    the same ``office_text`` pipeline as the batch query
    (``q_crawl_office_text``) — stateless append, zero state at any
    scale, zip-XML, CFB piece-table, and RTF token formats under the
    one oracle.
    """
    import tempfile

    from ..sources import legacy_office as LO
    from ..sources import office as O
    from ..sources import rtf as RT

    d = (
        load_table(spark, sf, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id", "text")
    )

    def make(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                t = str(text)
                halves = [t[:40], t[40:80]]
                v = did % 5
                if v == 0:
                    payloads.append(O.build_docx(halves))
                elif v == 1:
                    payloads.append(O.build_epub(halves, title=""))
                elif v == 2:
                    payloads.append(O.build_odt(halves))
                elif v == 3:
                    payloads.append(LO.build_doc(halves))
                else:
                    payloads.append(RT.build_rtf(halves))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    stage = tempfile.mkdtemp(prefix="rawdata-office-stream-")
    files = d.mapInPandas(make, "doc_id long, payload binary")
    files.withColumn("part", F.col("doc_id") % 4).repartition(
        4, "part"
    ).drop("part").write.mode("overwrite").parquet(stage)

    stream = (
        spark.readStream.schema("doc_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    out = W.run_available_now_append(
        O.office_text(stream).select(
            "doc_id", "doc_format", "part_idx", "text"
        ),
        "t_office_ingest",
    )
    return out


@register(
    "q_stream_pdf_ingest",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(0 AS BIGINT) AS page_idx,
       substr(text, 1, 40) || chr(10) || substr(text, 41, 40) AS page_text
FROM documents WHERE doc_id < 200
UNION ALL
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(1 AS BIGINT) AS page_idx,
       substr(text, 81, 40) AS page_text
FROM documents WHERE doc_id < 200
""",
    tags=("streaming", "source", "pdf", "multimodal"),
)
def q_stream_pdf_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """The PDF tier as a STREAM, oracle-exact: PDF drops arrive in
    micro-batches (file source, ``maxFilesPerTrigger=1``) and explode
    to per-page text through the same ``multimodal.pdf_text`` kernel
    the batch query (``q_crawl_pdf_text``) uses — entirely STATELESS,
    append mode, zero state at any scale.  Both writer layouts (classic
    xref / ObjStm) flow through the stream under the one oracle.
    """
    import tempfile

    from ..operators import multimodal

    d = (
        load_table(spark, sf, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )

    def make(batches):
        import pandas as pd

        from ..operators import rawpdf

        for pdf in batches:
            payloads = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                t = str(text)
                pages = [[t[:40], t[40:80]], [t[80:120]]]
                enc = (
                    rawpdf.encode_pdf
                    if int(did) % 2 == 0
                    else rawpdf.encode_pdf_modern
                )
                payloads.append(enc(pages))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    stage = tempfile.mkdtemp(prefix="rawdata-pdf-stream-")
    files = d.mapInPandas(make, "doc_id long, payload binary")
    files.withColumn("part", F.col("doc_id") % 4).repartition(
        4, "part"
    ).drop("part").write.mode("overwrite").parquet(stage)

    stream = (
        spark.readStream.schema("doc_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    media = multimodal.with_media_columns(
        stream, "payload", "application/pdf", "doc_id"
    )
    out = W.run_available_now_append(
        multimodal.pdf_text(media).select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "page_idx",
            "page_text",
        ),
        "t_pdf_ingest",
    )
    return out


@register(
    "q_stream_pdf_images",
    oracle="""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(doc_id % 256 AS BIGINT) AS k
  FROM documents WHERE doc_id < 150
)
SELECT doc_id,
       CAST(0 AS BIGINT) AS img_idx,
       'FlateDecode' AS img_filter,
       CAST(k * 128 AS BIGINT) AS sum_pixel
FROM d
UNION ALL
SELECT doc_id,
       CAST(1 AS BIGINT),
       CASE WHEN doc_id % 2 = 0 THEN 'DCTDecode'
            ELSE 'CCITTFaxDecode' END,
       CAST(CASE WHEN doc_id % 2 = 0
            THEN 2 * (doc_id % 113) * 1152
            ELSE 255 * 16 * (8 - ((doc_id % 7) + 1)) END AS BIGINT)
FROM d
""",
    tags=("streaming", "source", "pdf", "multimodal", "image"),
)
def q_stream_pdf_images(spark: SparkSession, sf: str) -> DataFrame:
    """PDF embedded-image extraction as a STREAM, oracle-exact (r14):
    image-carrying PDF drops arrive in micro-batches and explode to
    per-image pixel stats through the same ``multimodal.pdf_images``
    kernel the batch query (``q_crawl_pdf_images``) uses — stateless,
    append mode.  Each document carries a Flate gray XObject plus a
    DCT (even doc_ids, bit-exact constant gray) or CCITT G4 (odd)
    image, so all three decode routes stream under one closed-form
    oracle."""
    import tempfile

    from ..operators import multimodal

    d = (
        load_table(spark, sf, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id")
    )

    def make(batches):
        import numpy as np
        import pandas as pd

        from ..operators import rawpdf

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                k = did % 256
                page = [{"kind": "gray",
                         "array": np.full((8, 16), k, np.uint8)}]
                if did % 2 == 0:
                    kj = 2 * (did % 113)
                    page.append({"kind": "jpeg", "quality": 50,
                                 "array": np.full((16, 24, 3), kj,
                                                  np.uint8)})
                else:
                    bits = np.zeros((8, 16), np.uint8)
                    bits[: (did % 7) + 1] = 1
                    page.append({"kind": "g4", "bits": bits})
                payloads.append(
                    rawpdf.encode_pdf([["scan"]], images=[page])
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    stage = tempfile.mkdtemp(prefix="rawdata-pdfimg-stream-")
    files = d.mapInPandas(make, "doc_id long, payload binary")
    files.withColumn("part", F.col("doc_id") % 4).repartition(
        4, "part"
    ).drop("part").write.mode("overwrite").parquet(stage)

    stream = (
        spark.readStream.schema("doc_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    media = multimodal.with_media_columns(
        stream, "payload", "application/pdf", "doc_id"
    )
    out = W.run_available_now_append(
        multimodal.pdf_images(media).select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "img_idx",
            F.col("filter").alias("img_filter"),
            "sum_pixel",
        ),
        "t_pdf_images",
    )
    return out


@register(
    "q_stream_djvu_text",
    oracle="""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         trim(regexp_replace(regexp_replace(lower(substr(text, 1, 60)),
              '[^a-z ]', '', 'g'), ' +', ' ', 'g')) AS c
  FROM documents WHERE doc_id < 120
)
SELECT doc_id, c AS text,
       CAST(CASE WHEN c = '' THEN 0
            ELSE length(c) - length(replace(c, ' ', '')) + 1
            END AS BIGINT) AS n_words
FROM d
""",
    tags=("streaming", "source", "djvu", "multimodal", "text"),
)
def q_stream_djvu_text(spark: SparkSession, sf: str) -> DataFrame:
    """DjVu hidden-text extraction as a STREAM (the r15 batch query's
    twin): scanned-document drops arrive in micro-batches and the
    BZZ → TXT-zone-tree decode runs in the same Arrow kernel —
    stateless, append mode."""
    import re as _re
    import tempfile

    d = (
        load_table(spark, sf, "documents")
        .filter(F.col("doc_id") < 120)
        .select("doc_id", "text")
    )

    def make(batches):
        import pandas as pd

        from ..operators import rawdjvu

        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                c = _re.sub(
                    " +", " ",
                    _re.sub("[^a-z ]", "", str(t)[:60].lower()),
                ).strip()
                payloads.append(rawdjvu.build_djvu(
                    [{"width": 2550, "height": 3300, "text": c}]
                ))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    files = d.mapInPandas(make, "doc_id long, payload binary")
    stage = tempfile.mkdtemp(prefix="djvu_text_stream_")
    files.withColumn("part", F.col("doc_id") % 4).repartition(
        4, "part"
    ).drop("part").write.mode("overwrite").parquet(stage)

    stream = (
        spark.readStream.schema("doc_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )

    def extract(batches):
        import pandas as pd

        from ..operators import rawdjvu

        for pdf in batches:
            rows = {"doc_id": [], "text": [], "n_words": []}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                out = rawdjvu.extract_djvu_text(bytes(payload))
                rows["doc_id"].append(int(did))
                rows["text"].append(out["text"])
                rows["n_words"].append(len(out["words"]))
            yield pd.DataFrame(rows)

    return W.run_available_now_append(
        stream.mapInPandas(extract,
                           "doc_id long, text string, n_words long"),
        "t_djvu_text",
    )


@register(
    "q_stream_vp9_pixels",
    oracle="""
WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id
           FROM documents WHERE doc_id < 24),
px AS (
  SELECT d.doc_id,
         CAST(SUM((r * 31 + c * 17 + d.doc_id) % 256) AS BIGINT)
           AS y_sum
  FROM d, generate_series(0, 15) AS gr(r), generate_series(0, 15) AS gc(c)
  GROUP BY d.doc_id
)
SELECT doc_id, CAST(1 AS BIGINT) AS lossless, y_sum FROM px
""",
    tags=("streaming", "multimodal", "video", "vp9"),
)
def q_stream_vp9_pixels(spark: SparkSession, sf: str) -> DataFrame:
    """VP9 keyframe intra decode as a STREAM (the r15 batch query's
    twin): lossless 16×16 keyframes stream through the same decode
    kernel, value-exact plane sums in append mode."""
    import tempfile

    import numpy as np

    d = (
        load_table(spark, sf, "documents")
        .filter(F.col("doc_id") < 24)
        .select("doc_id")
    )

    def make(batches):
        import pandas as pd

        from ..operators import rawvp9

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                r = np.arange(16)[:, None]
                c = np.arange(16)[None, :]
                y = ((r * 31 + c * 17 + did) % 256).astype(np.uint8)
                u = np.full((8, 8), did % 256, np.uint8)
                v = np.full((8, 8), (2 * did) % 256, np.uint8)
                payloads.append(rawvp9.build_keyframe(y, u, v))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    files = d.mapInPandas(make, "doc_id long, payload binary")
    stage = tempfile.mkdtemp(prefix="vp9_stream_")
    files.withColumn("part", F.col("doc_id") % 3).repartition(
        3, "part"
    ).drop("part").write.mode("overwrite").parquet(stage)

    stream = (
        spark.readStream.schema("doc_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )

    def decode(batches):
        import pandas as pd

        from ..operators import rawvp9

        for pdf in batches:
            rows = {"doc_id": [], "lossless": [], "y_sum": []}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                out = rawvp9.decode_keyframe(bytes(payload))
                rows["doc_id"].append(int(did))
                rows["lossless"].append(int(out["lossless"]))
                rows["y_sum"].append(int(out["y"].sum()))
            yield pd.DataFrame(rows)

    return W.run_available_now_append(
        stream.mapInPandas(decode,
                           "doc_id long, lossless long, y_sum long"),
        "t_vp9_pixels",
    )


@register(
    "q_stream_vp9_gop",
    oracle="""
WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  1 + doc_id % 3 AS dr,
                  1 + doc_id % 4 AS dc
           FROM documents WHERE doc_id < 24),
px AS (
  SELECT d.doc_id,
         CAST(SUM((r * 31 + c * 17 + d.doc_id) % 256) AS BIGINT)
           AS y_key_sum,
         CAST(SUM((LEAST(r + dr, 15) * 31 + LEAST(c + dc, 31) * 17
                   + d.doc_id) % 256) AS BIGINT) AS y_mv_sum
  FROM d, generate_series(0, 15) AS gr(r), generate_series(0, 31) AS gc(c)
  GROUP BY d.doc_id
)
SELECT doc_id, CAST(3 AS BIGINT) AS n_frames, y_key_sum, y_mv_sum
FROM px
""",
    tags=("streaming", "multimodal", "video", "vp9", "inter"),
)
def q_stream_vp9_gop(spark: SparkSession, sf: str) -> DataFrame:
    """VP9 GOP decode as a STREAM (the r16 batch query's twin):
    WebM-carried keyframe + carry-forward + motion-compensated frames
    arrive in micro-batches and run the full inter tier (reference
    bank, is-inter/NEWMV walk, BILINEAR MC) in the stream kernel —
    stateless, append mode, value-exact closed forms."""
    import tempfile

    import numpy as np

    d = (
        load_table(spark, sf, "documents")
        .filter(F.col("doc_id") < 24)
        .select("doc_id")
    )

    def make(batches):
        import pandas as pd

        from ..operators import rawvp9, rawwebm

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                r = np.arange(16)[:, None]
                c = np.arange(32)[None, :]
                y = ((r * 31 + c * 17 + did) % 256).astype(np.uint8)
                u = np.full((8, 16), did % 256, np.uint8)
                v = np.full((8, 16), (2 * did) % 256, np.uint8)
                blobs = rawvp9.build_gop((y, u, v), [
                    {"carry": True},
                    {"mv": (8 * (1 + did % 3), 8 * (1 + did % 4))},
                ])
                payloads.append(rawwebm.build_webm(
                    video=("V_VP9", 320, 240), vp9_frames=blobs
                ))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    files = d.mapInPandas(make, "doc_id long, payload binary")
    stage = tempfile.mkdtemp(prefix="vp9_gop_stream_")
    files.withColumn("part", F.col("doc_id") % 3).repartition(
        3, "part"
    ).drop("part").write.mode("overwrite").parquet(stage)

    stream = (
        spark.readStream.schema("doc_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )

    def decode(batches):
        import pandas as pd

        from ..operators import rawwebm

        for pdf in batches:
            rows = {"doc_id": [], "n_frames": [], "y_key_sum": [],
                    "y_mv_sum": []}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                out = rawwebm.decode_vp9_gop(bytes(payload))
                fs = out["frames"]
                rows["doc_id"].append(int(did))
                rows["n_frames"].append(len(fs))
                rows["y_key_sum"].append(int(fs[1][0].sum()))
                rows["y_mv_sum"].append(int(fs[2][0].sum()))
            yield pd.DataFrame(rows)

    return W.run_available_now_append(
        stream.mapInPandas(
            decode,
            "doc_id long, n_frames long, y_key_sum long, y_mv_sum long",
        ),
        "t_vp9_gop",
    )


@register(
    "q_stream_djvu_image",
    oracle="""
WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  1 + doc_id % 4 AS h1,
                  2 + doc_id % 5 AS w1
           FROM documents WHERE doc_id < 24),
bg AS (
  SELECT d.doc_id,
         CAST(SUM((r * 5 + c * 7 + d.doc_id) % 89 + 80) AS BIGINT)
           AS bg_sum
  FROM d, generate_series(0, 31) AS gr(r), generate_series(0, 31) AS gc(c)
  GROUP BY d.doc_id
)
SELECT d.doc_id,
       CAST(2 * h1 * w1 AS BIGINT) AS mask_ink,
       bg.bg_sum
FROM d JOIN bg USING (doc_id)
""",
    tags=("streaming", "multimodal", "djvu", "image"),
)
def q_stream_djvu_image(spark: SparkSession, sf: str) -> DataFrame:
    """DjVu image-layer decode as a STREAM (the r16 batch query's
    twin): JB2 mask + IW44 background pages arrive in micro-batches
    and both ZP-coded decoders run in the stream kernel — stateless,
    append mode, value-exact closed forms."""
    import tempfile

    import numpy as np

    d = (
        load_table(spark, sf, "documents")
        .filter(F.col("doc_id") < 24)
        .select("doc_id")
    )

    def make(batches):
        import pandas as pd

        from ..operators import rawdjvu

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                g1 = np.ones((1 + did % 4, 2 + did % 5), np.uint8)
                r = np.arange(32)[:, None]
                c = np.arange(32)[None, :]
                bg = ((r * 5 + c * 7 + did) % 89 + 80).astype(np.uint8)
                payloads.append(rawdjvu.build_djvu([{
                    "width": 48, "height": 32,
                    "mask": [(g1, 0, 0), (0, 24, 16)],
                    "background": bg,
                }]))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    files = d.mapInPandas(make, "doc_id long, payload binary")
    stage = tempfile.mkdtemp(prefix="djvu_image_stream_")
    files.withColumn("part", F.col("doc_id") % 3).repartition(
        3, "part"
    ).drop("part").write.mode("overwrite").parquet(stage)

    stream = (
        spark.readStream.schema("doc_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )

    def decode(batches):
        import pandas as pd

        from ..operators import rawdjvu

        for pdf in batches:
            rows = {"doc_id": [], "mask_ink": [], "bg_sum": []}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                out = rawdjvu.extract_djvu_images(bytes(payload))
                page = out["pages"][0]
                rows["doc_id"].append(int(did))
                rows["mask_ink"].append(page["mask_ink"])
                rows["bg_sum"].append(page["bg_sum"])
            yield pd.DataFrame(rows)

    return W.run_available_now_append(
        stream.mapInPandas(
            decode, "doc_id long, mask_ink long, bg_sum long"
        ),
        "t_djvu_image",
    )


@register(
    "q_stream_media_meta",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CASE CAST(doc_id % 7 AS INTEGER)
         WHEN 0 THEN 'mp3' WHEN 1 THEN 'ogg'
         WHEN 2 THEN 'mp4' WHEN 3 THEN 'webm'
         WHEN 5 THEN 'ts' WHEN 6 THEN 'aac'
         ELSE CASE WHEN doc_id % 2 = 0 THEN 'avif' ELSE 'heic' END
       END AS kind,
       CAST(CASE CAST(doc_id % 7 AS INTEGER)
         WHEN 0 THEN (5 + doc_id % 20) * 1152 * 1000 // 44100
         WHEN 1 THEN 1000 * (1 + doc_id % 3)
         WHEN 2 THEN 600 + doc_id % 1000
         WHEN 3 THEN 700 + doc_id % 900
         WHEN 5 THEN 500 + doc_id % 800
         WHEN 6 THEN (4 + doc_id % 16) * 1024 * 1000 // 44100
         ELSE 0 END AS BIGINT) AS duration_ms,
       CASE CAST(doc_id % 7 AS INTEGER)
         WHEN 0 THEN 'MPEG1/L3' WHEN 1 THEN 'vorbis'
         WHEN 2 THEN 'avc1' WHEN 3 THEN 'V_VP9'
         WHEN 5 THEN 'h264' WHEN 6 THEN 'AAC/LC'
         ELSE CASE WHEN doc_id % 2 = 0 THEN 'av01' ELSE 'hvc1' END
       END AS codec
FROM documents WHERE doc_id < 200
UNION ALL
SELECT CAST(doc_id AS BIGINT),
       CASE WHEN doc_id - 200 IN (1, 2, 3, 4, 5) THEN 'error'
            ELSE 'unknown' END,
       CAST(0 AS BIGINT), ''
FROM documents WHERE doc_id >= 200 AND doc_id < 207
""",
    tags=("streaming", "multimodal", "audio", "video"),
)
def q_stream_media_meta(spark: SparkSession, sf: str) -> DataFrame:
    """The media-metadata tier as a STREAM, oracle-exact: mixed
    MP3/Ogg/MP4/WebM/HEIF/TS/AAC file drops arrive in micro-batches
    and flow through one sniff-dispatched metadata kernel into a
    unified (kind, duration, codec) schema — stateless append, the
    same per-format parsers the batch queries use.  This is the
    crawl-side shape: a media bucket is NEVER single-format, so the
    kernel must dispatch per row, and a malformed file must land
    per-row rather than kill the stream.  The capture contract is
    hash-checked, not just pytest-checked: doc_ids 200-206 carry one
    poisoned payload per format — strict parsers (ogg/mp4/webm/heif/
    ts) raise and land as ``kind='error'``; the resync-tolerant
    mp3/aac sniffers reject their truncated shapes as
    ``kind='unknown'``.
    """
    import tempfile

    d = (
        load_table(spark, sf, "documents")
        .filter(F.col("doc_id") < 207)
        .select("doc_id")
    )

    def make(batches):
        import pandas as pd

        from ..operators import (
            rawaac,
            rawheif,
            rawmp3,
            rawmp4,
            rawogg,
            rawts,
            rawwebm,
        )

        def poisoned(fmt_idx: int) -> bytes:
            # one sniff-reaching corrupt shape per format
            if fmt_idx == 0:
                # mp3: junk long past the first frame's claimed length
                # (+ the ID3v1 window) so the second-header coherence
                # check — not single-frame acceptance — decides
                return rawmp3.build_mp3(5)[:4] + b"\x55" * 2048
            if fmt_idx == 1:  # ogg: magic then zeros — no complete packets
                return b"OggS" + b"\x00" * 40
            if fmt_idx == 2:  # mp4: truncated moov — box overrun
                return rawmp4.build_mp4()[:40]
            if fmt_idx == 3:  # webm: EBML magic, no Segment
                return b"\x1aE\xdf\xa3" + b"\xff" * 40
            if fmt_idx == 4:  # heif: ftyp only — no meta box
                return rawheif.build_heif(fmt="avif")[:32]
            if fmt_idx == 5:  # ts: aligned packet, adaptation overrun
                pkt = bytearray(rawts.build_ts()[:188])
                pkt[3], pkt[4] = 0x30, 0xFF
                return bytes(pkt)
            # aac: shorter than one ADTS header — sniff rejects
            return rawaac.build_aac(4)[:5]

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did >= 200:
                    payloads.append(poisoned(did - 200))
                    continue
                v = did % 7
                if v == 0:
                    payloads.append(rawmp3.build_mp3(5 + did % 20))
                elif v == 1:
                    payloads.append(
                        rawogg.build_ogg(
                            codec="vorbis",
                            total_samples=44100 * (1 + did % 3),
                        )
                    )
                elif v == 2:
                    payloads.append(
                        rawmp4.build_mp4(duration_ms=600 + did % 1000)
                    )
                elif v == 3:
                    payloads.append(
                        rawwebm.build_webm(duration_ms=700 + did % 900)
                    )
                elif v == 5:
                    payloads.append(
                        rawts.build_ts(duration_ms=500 + did % 800)
                    )
                elif v == 6:
                    payloads.append(rawaac.build_aac(4 + did % 16))
                else:
                    payloads.append(
                        rawheif.build_heif(
                            fmt="avif" if did % 2 == 0 else "heic"
                        )
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    stage = tempfile.mkdtemp(prefix="rawdata-media-stream-")
    files = d.mapInPandas(make, "doc_id long, payload binary")
    files.withColumn("part", F.col("doc_id") % 5).repartition(
        5, "part"
    ).drop("part").write.mode("overwrite").parquet(stage)

    def meta(batches):
        import pandas as pd

        from ..operators import (
            rawaac,
            rawheif,
            rawmp3,
            rawmp4,
            rawogg,
            rawts,
            rawwebm,
        )

        def sniffed(b):
            if rawogg.sniff_ogg(b):
                m = rawogg.parse_ogg(b)
                return "ogg", m["duration_ms"], m["codec"]
            if rawwebm.sniff_webm(b):
                m = rawwebm.parse_webm(b)
                vids = [t for t in m["tracks"] if t.get("track_type") == 1]
                return ("webm", m["duration_ms"],
                        vids[0]["codec_id"] if vids else "")
            # HEIF before generic ISO-BMFF: both carry ftyp, the brand
            # decides — rawmp4.sniff_mp4 would claim an avif otherwise
            if rawheif.sniff_heif(b):
                m = rawheif.parse_heif(b)
                return m["format"], 0, m["codec"]
            if rawmp4.sniff_mp4(b):
                m = rawmp4.parse_mp4(b)
                vids = [t for t in m["tracks"] if t.get("handler") == "vide"]
                return ("mp4", m["duration_ms"],
                        vids[0]["codec"] if vids else "")
            # mp3 before aac before ts — the multimodal._decode_bytes
            # order (both MPEG audio syncs are 0xFFF; the layer bits
            # disambiguate inside the sniffers)
            if rawmp3.sniff_mp3(b):
                m = rawmp3.parse_mp3(b)
                return "mp3", m["duration_ms"], f"{m['version']}/L{m['layer']}"
            if rawaac.sniff_aac(b):
                m = rawaac.parse_aac(b)
                return "aac", m["duration_ms"], f"AAC/{m['profile']}"
            if rawts.sniff_ts(b):
                m = rawts.parse_ts(b)
                return ("ts", m["duration_ms"],
                        m["streams"][0]["codec"] if m["streams"] else "")
            return "unknown", 0, ""

        for pdf in batches:
            rows = {"doc_id": [], "kind": [], "duration_ms": [], "codec": []}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    kind, dur, codec = sniffed(bytes(payload))
                except ValueError:
                    # sniff-passing but structurally corrupt: per-row,
                    # never stream-killing
                    kind, dur, codec = "error", 0, ""
                rows["doc_id"].append(int(did))
                rows["kind"].append(kind)
                rows["duration_ms"].append(dur)
                rows["codec"].append(codec)
            yield pd.DataFrame(rows)

    stream = (
        spark.readStream.schema("doc_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    out = W.run_available_now_append(
        stream.mapInPandas(
            meta,
            "doc_id long, kind string, duration_ms long, codec string",
        ),
        "t_media_meta",
    )
    return out


@register(
    "q_stream_theora_keyframe",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(16 * (2 + doc_id % 2) AS BIGINT) AS width,
       CAST(32 AS BIGINT) AS height,
       CAST(128 + ((((46341 * ((46341 * ((1 + doc_id % 23) * 64))
            >> 16)) >> 16) + 8) >> 4) AS BIGINT) AS y_val,
       CAST(128 + ((((46341 * ((46341 * (((1 + doc_id % 23)
            + 1 + doc_id % 4) * 64)) >> 16)) >> 16) + 8) >> 4)
            AS BIGINT) AS cb_val,
       CAST(128 + ((((46341 * ((46341 * (((1 + doc_id % 23)
            + (1 + doc_id % 4) + 1 + doc_id % 3) * 64)) >> 16)) >> 16)
            + 8) >> 4) AS BIGINT) AS cr_val
FROM documents WHERE doc_id < 90
""",
    tags=("streaming", "multimodal", "theora", "video"),
)
def q_stream_theora_keyframe(spark: SparkSession, sf: str) -> DataFrame:
    """Theora keyframe pixel decode as a STREAM, oracle-exact — the
    r13 video tier gets the same availableNow twin the WARC/PDF/
    archive/media/office/classify fronts have: Ogg Theora drops
    arrive in micro-batches and each decodes through the full §7
    intra pipeline (:mod:`..operators.theoradec`) inside a stateless
    mapInPandas append, per-row error capture intact.  Same
    closed-form oracle arithmetic as the batch query.
    """
    import tempfile

    d = (
        load_table(spark, sf, "documents")
        .filter(F.col("doc_id") < 90)
        .select("doc_id")
    )

    def make(batches):
        import pandas as pd

        from ..operators import theoradec

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                dcy = 1 + did % 23
                dcb = dcy + 1 + did % 4
                dcr = dcb + 1 + did % 3
                payloads.append(theoradec.build_theora_ogg(
                    16 * (2 + did % 2), 32, [(dcy, dcb, dcr)],
                    second_qi=18 if did % 3 == 0 else None,
                ))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    stage = tempfile.mkdtemp(prefix="rawdata-theora-stream-")
    files = d.mapInPandas(make, "doc_id long, payload binary")
    files.withColumn("part", F.col("doc_id") % 4).repartition(
        4, "part"
    ).drop("part").write.mode("overwrite").parquet(stage)

    def decode(batches):
        import pandas as pd

        from ..operators import theoradec

        cols = ("doc_id", "width", "height", "y_val", "cb_val", "cr_val")
        for pdf in batches:
            rows = {k: [] for k in cols}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                out = theoradec.decode_ogg_theora(bytes(payload))
                y, cb, cr = out["frames"][0]
                rows["doc_id"].append(int(did))
                rows["width"].append(out["width"])
                rows["height"].append(out["height"])
                rows["y_val"].append(int(y[0, 0]))
                rows["cb_val"].append(int(cb[0, 0]))
                rows["cr_val"].append(int(cr[0, 0]))
            yield pd.DataFrame(rows)

    stream = (
        spark.readStream.schema("doc_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    return W.run_available_now_append(
        stream.mapInPandas(
            decode,
            "doc_id long, width long, height long, y_val long, "
            "cb_val long, cr_val long",
        ),
        "t_theora_stream",
    )


@register(
    "q_stream_theora_gop",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(5 AS BIGINT) AS n_frames,
       CAST(128 + ((((46341 * ((46341 * ((1 + doc_id % 17) * 64))
            >> 16)) >> 16) + 8) >> 4) AS BIGINT) AS y_key,
       TRUE AS uniform
FROM documents WHERE doc_id < 80
""",
    tags=("streaming", "multimodal", "theora", "video", "inter"),
)
def q_stream_theora_gop(spark: SparkSession, sf: str) -> DataFrame:
    """Theora GOP decode — keyframe, NO_MV, carry-forward, and the r14
    MV-coded modes — as a STREAM: five-frame groups (keyframe →
    INTER_MV under a rotating fixed alphabet → an INTER_MV/LAST chain
    under the fixed MV code → carry-forward → GOLDEN_MV back to the
    keyframe) arrive as whole Ogg payloads and decode statelessly per
    file, the same availableNow shape as the keyframe twin.  Flat
    references make every MV value-invariant, but the §7.5 vector
    decode sits upstream of the token stream, so any desync breaks the
    closed-form keyframe value or the uniform flag."""
    import tempfile

    d = (
        load_table(spark, sf, "documents")
        .filter(F.col("doc_id") < 80)
        .select("doc_id")
    )

    def make(batches):
        import pandas as pd

        from ..operators import theoradec as T

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                dk = 1 + did % 17
                mv1 = ((did % 13) - 6, (did % 9) - 4)
                payloads.append(T.build_theora_ogg(48, 32, [
                    (dk, dk + 1, dk + 2),
                    {"mb_script": [(T.MODE_INTER_MV, mv1)],
                     "mode_scheme": 1 + did % 6},
                    {"mb_script": [
                        (T.MODE_INTER_MV, mv1),
                        (T.MODE_INTER_MV_LAST, None)],
                     "mv_fixed": True},
                    {"coverage": "none"},
                    {"mode": T.MODE_GOLDEN_NO_MV, "coverage": "all"},
                ]))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    stage = tempfile.mkdtemp(prefix="rawdata-theora-gop-stream-")
    files = d.mapInPandas(make, "doc_id long, payload binary")
    files.withColumn("part", F.col("doc_id") % 4).repartition(
        4, "part"
    ).drop("part").write.mode("overwrite").parquet(stage)

    def decode(batches):
        import pandas as pd

        from ..operators import theoradec as T

        cols = ("doc_id", "n_frames", "y_key", "uniform")
        for pdf in batches:
            rows = {k: [] for k in cols}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                out = T.decode_ogg_theora(bytes(payload))
                fs = out["frames"]
                y0 = int(fs[0][0][0, 0])
                rows["doc_id"].append(int(did))
                rows["n_frames"].append(len(fs))
                rows["y_key"].append(y0)
                rows["uniform"].append(bool(
                    all(p.min() == p.max() for f in fs for p in f)
                    and all(int(f[0][0, 0]) == y0 for f in fs)
                ))
            yield pd.DataFrame(rows)

    stream = (
        spark.readStream.schema("doc_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    return W.run_available_now_append(
        stream.mapInPandas(
            decode,
            "doc_id long, n_frames long, y_key long, uniform boolean",
        ),
        "t_theora_gop_stream",
    )
