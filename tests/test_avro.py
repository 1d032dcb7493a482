"""Avro-format topics: reference envelope compatibility and client paths.

The reference's storage layer is Avro container files of RawdataMessage
records (AvroRawdataProducer.java:42-49).  These tests prove the engine's
pure-Python codec is byte-compatible with the reference's exact JVM
reader/writer stack (avro core is always on Spark's classpath), and that
avro topics flow through the full client surface.  The native spark-avro
datasource path is exercised only where that jar exists (skip otherwise).
"""

import pytest
from pyspark.sql import functions as F

from rawdata_client_provider_gcs_spark import RawdataClient, RawdataMessage
from rawdata_client_provider_gcs_spark.sources import avro_codec as A

ROWS = [
    (bytes(range(16)), None, 0, "p-1", {"k": b"v", "k2": b"\x00\xff"}),
    (bytes(range(1, 17)), "grp", 7, "p-2", {}),
    (b"\x7f" * 16, None, -3, "pæøå", {"nøkkel": b"data"}),
]


def test_python_codec_roundtrip():
    assert A.decode_container(A.encode_container(ROWS)) == ROWS
    # multi-block framing
    assert A.decode_container(A.encode_container(ROWS, records_per_block=1)) == ROWS


def test_jvm_reads_python_written_avro(spark, tmp_path):
    path = str(tmp_path / "py.avro")
    with open(path, "wb") as fh:
        fh.write(A.encode_container(ROWS))
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(A.ENVELOPE_SCHEMA_JSON)
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), jvm.org.apache.avro.generic.GenericDatumReader(schema)
    )
    got = []
    while reader.hasNext():
        rec = reader.next()
        og = rec.get("orderingGroup")
        m = rec.get("data")
        d = {}
        it = m.entrySet().iterator()
        while it.hasNext():
            e = it.next()
            bb = e.getValue()
            arr = jvm.java.util.Arrays.copyOfRange(
                bb.array(), bb.arrayOffset() + bb.position(), bb.arrayOffset() + bb.limit()
            )
            d[e.getKey().toString()] = bytes(arr)
        got.append(
            (
                bytes(rec.get("id").bytes()),
                None if og is None else og.toString(),
                rec.get("sequenceNumber"),
                rec.get("position").toString(),
                d,
            )
        )
    reader.close()
    assert got == ROWS


def test_python_decodes_jvm_written_avro(spark, tmp_path):
    path = str(tmp_path / "jvm.avro")
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(A.ENVELOPE_SCHEMA_JSON)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    writer.create(schema, jvm.java.io.File(path))
    for uid, og, seq, pos, d in ROWS:
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put(
            "id",
            jvm.org.apache.avro.generic.GenericData.Fixed(
                schema.getField("id").schema(), uid
            ),
        )
        rec.put("orderingGroup", og)
        rec.put("sequenceNumber", jvm.java.lang.Long.parseLong(str(seq)))
        rec.put("position", pos)
        m = jvm.java.util.HashMap()
        for k, v in d.items():
            m.put(k, jvm.java.nio.ByteBuffer.wrap(v))
        rec.put("data", m)
        writer.append(rec)
    writer.close()
    with open(path, "rb") as fh:
        assert A.decode_container(fh.read()) == ROWS


def test_avro_topic_producer_consumer_roundtrip(spark, tmp_path):
    client = RawdataClient(
        spark, str(tmp_path), avro_file_max_bytes=256, file_format="avro"
    )
    with client.producer("t") as p:
        for i in range(10):
            p.publish(RawdataMessage(position=f"p-{i}", data={"x": bytes([i])}))
    files = [path for path, e in client.topic("t").list_manifest()]
    assert files and all(path.endswith(".avro") for path in files)
    c = client.consumer("t")
    got = []
    while True:
        msg = c.receive(0)
        if msg is None:
            break
        got.append((msg.position, msg.data["x"]))
    assert got == [(f"p-{i}", bytes([i])) for i in range(10)]
    assert client.last_message("t").position == "p-9"
    client.close()


def test_avro_bulk_publish_distributed(spark, tmp_path):
    client = RawdataClient(spark, str(tmp_path), file_format="avro")
    df = spark.range(0, 500).selectExpr(
        "cast(id as string) position", "1700000000000 + id * 1000 as ts_ms"
    )
    with client.producer("bulk") as p:
        files = p.publish_dataframe(
            df, ts_ms_col="ts_ms", max_records_per_file=100
        )
    assert len(files) >= 5 and all(f.endswith(".avro") for f in files)
    topic = client.topic("bulk")
    assert topic.dataframe().count() == 500
    # ordered scan across avro files, and event-time seek (sidecar-backed)
    first = topic.ordered_dataframe().select("position").first()[0]
    assert first == "0"
    c = client.consumer("bulk", seek_to_ts_ms=1700000000000 + 499 * 1000)
    assert c.receive(0).position == "499"
    client.close()


def test_mixed_format_topic(spark, tmp_path):
    """parquet and avro files interleave in one topic (migration story)."""
    client_pq = RawdataClient(spark, str(tmp_path))
    with client_pq.producer("mix") as p:
        p.publish(RawdataMessage(position="pq-1", data={"k": b"a"}))
    client_av = RawdataClient(spark, str(tmp_path), file_format="avro")
    with client_av.producer("mix") as p:
        p.publish(RawdataMessage(position="av-1", data={"k": b"b"}))
    c = client_pq.consumer("mix")
    got = {c.receive(0).position, c.receive(0).position}
    assert got == {"pq-1", "av-1"}
    assert c.receive(0) is None


def test_avro_datasource_native_path(spark, tmp_path):
    """Native spark-avro write/read — runs only where the jar is present."""
    if not A.avro_datasource_available(spark):
        pytest.skip("spark-avro datasource not on the classpath")
    client = RawdataClient(spark, str(tmp_path), file_format="avro")
    df = spark.range(0, 50).selectExpr("cast(id as string) position")
    with client.producer("native") as p:
        p.publish_dataframe(df)
    assert client.topic("native").dataframe().count() == 50


def test_compact_migrates_avro_topic_to_parquet(spark, tmp_path):
    """Compaction reads small avro files and rewrites them as parquet —
    the reference-format -> engine-format migration path."""
    client = RawdataClient(
        spark, str(tmp_path), avro_file_max_bytes=128, file_format="avro"
    )
    with client.producer("m") as p:
        for i in range(20):
            p.publish(RawdataMessage(position=f"p-{i}", data={"x": bytes([i])}))
    topic = client.topic("m")
    n_small = len([1 for _, e in topic.list_manifest() if e.ext == "avro"])
    assert n_small >= 3
    new_files, removed = topic.compact(
        small_file_max_records=1000, target_records_per_file=1000
    )
    assert new_files and len(removed) == n_small
    assert all(f.endswith(".parquet") for f, _ in topic.list_manifest())
    c = client.consumer("m")
    got = [c.receive(0).position for _ in range(20)]
    assert got == [f"p-{i}" for i in range(20)] and c.receive(0) is None
    client.close()


def test_python_decodes_jvm_deflate_avro(spark, tmp_path):
    """Reference files may be deflate-compressed; the codec must read them."""
    path = str(tmp_path / "jvm-deflate.avro")
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(A.ENVELOPE_SCHEMA_JSON)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    writer.create(schema, jvm.java.io.File(path))
    for uid, og, seq, pos, d in ROWS:
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put(
            "id",
            jvm.org.apache.avro.generic.GenericData.Fixed(
                schema.getField("id").schema(), uid
            ),
        )
        rec.put("orderingGroup", og)
        rec.put("sequenceNumber", jvm.java.lang.Long.parseLong(str(seq)))
        rec.put("position", pos)
        m = jvm.java.util.HashMap()
        for k, v in d.items():
            m.put(k, jvm.java.nio.ByteBuffer.wrap(v))
        rec.put("data", m)
        writer.append(rec)
    writer.close()
    with open(path, "rb") as fh:
        raw = fh.read()
    assert b"deflate" in raw[:600]  # codec really landed in the header
    assert A.decode_container(raw) == ROWS
