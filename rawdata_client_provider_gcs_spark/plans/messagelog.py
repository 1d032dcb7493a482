"""Message-log queries: the reference's native surface under the oracle.

These queries build a real topic (parquet files with manifest filenames)
from the ``events`` table using **deterministic ULIDs** — timestamp from
``ts``, randomness from ``event_id`` — then exercise the consumer-side
operations (ordered scan S5, seek S7, cursor S8/S9, lastMessage S10)
through the engine's Topic layer.  Because the ULIDs are deterministic,
every result is exactly reproducible and the oracle can state the same
semantics directly over ``events``.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datamodel import MESSAGE_SCHEMA
from ..session import local_rows_df
from ..sources.topic import Topic
from ..tables import load_table
from .catalog import register

_TOPIC_CACHE: dict[str, str] = {}
_SINK_CACHE: dict[str, str] = {}


def _message_columns() -> list:
    """events → MESSAGE_SCHEMA projection (deterministic ULIDs).

    ULID = (epoch_ms(ts) << 80) | event_id — shared by the batch-built
    topic and the streaming-sink round-trip so both are oracle-stated
    directly over ``events``.  Pure column expressions: applies to batch
    and streaming DataFrames alike.
    """
    ts_ms = F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000")
    ulid_hex = F.concat(
        F.lpad(F.hex(ts_ms), 12, "0"),
        F.lpad(F.hex(F.col("event_id")), 20, "0"),
    )
    return [
        F.unhex(ulid_hex).alias("ulid"),
        ts_ms.alias("ulid_ts_ms"),
        F.col("event_type").alias("ordering_group"),
        F.col("event_id").cast("long").alias("sequence_number"),
        F.concat(F.lit("ev-"), F.col("event_id").cast("string")).alias(
            "position"
        ),
        F.create_map(
            F.lit("value"),
            F.col("value").cast("string").cast("binary"),
            F.lit("props"),
            F.col("props").cast("binary"),
        ).alias("data"),
    ]


def _events_topic(spark: SparkSession, sf: str) -> Topic:
    """Materialize (once per sf_dir per process) a topic holding events.

    ULID = (epoch_ms(ts) << 80) | event_id — deterministic, unique, and
    ordered exactly like (ts, event_id).
    """
    key = os.path.abspath(sf)
    root = _TOPIC_CACHE.get(key)
    topic_name = "events-log"
    if root is None:
        root = tempfile.mkdtemp(prefix="rawdata-events-topic-")
        e = load_table(spark, sf, "events")
        msg = e.select(*_message_columns())
        topic = Topic(spark, f"file://{root}", topic_name)
        topic.write_dataframe(msg.select(*[f.name for f in MESSAGE_SCHEMA.fields]))
        _TOPIC_CACHE[key] = root
    return Topic(spark, f"file://{root}", topic_name)


def _sink_topic(spark: SparkSession, sf: str) -> Topic:
    """Topic filled by the STREAMING write path (once per sf per process).

    The events file streams in (``stream_events``), the message
    projection runs on the unbounded DataFrame, and ``stream_to_topic``
    lands each micro-batch through the commit protocol — the full
    producer-side streaming pipeline, not a batch shortcut.
    """
    from ..streaming.sink import stream_to_topic
    from ..streaming.windows import stream_events

    key = os.path.abspath(sf)
    root = _SINK_CACHE.get(key)
    topic_name = "events-stream-sink"
    if root is None:
        root = tempfile.mkdtemp(prefix="rawdata-sink-topic-")
        ev = stream_events(spark, sf)
        msg = ev.select(*_message_columns()).select(
            *[f.name for f in MESSAGE_SCHEMA.fields]
        )
        topic = Topic(spark, f"file://{root}", topic_name)
        q = stream_to_topic(
            msg,
            topic,
            checkpoint_dir=tempfile.mkdtemp(prefix="rawdata-sink-ck-"),
            available_now=True,
        )
        q.awaitTermination()
        _SINK_CACHE[key] = root
    return Topic(spark, f"file://{root}", topic_name)


@register(
    "q_log_ordered_scan",
    oracle="""
SELECT event_type AS ordering_group,
       CAST(COUNT(*) AS BIGINT) AS n_messages,
       CAST(MIN(CAST(epoch_us(ts) // 1000 AS BIGINT)) AS BIGINT) AS first_ts_ms,
       CAST(MAX(CAST(epoch_us(ts) // 1000 AS BIGINT)) AS BIGINT) AS last_ts_ms,
       CAST(MIN(event_id) AS BIGINT) AS min_seq,
       CAST(MAX(event_id) AS BIGINT) AS max_seq
FROM events GROUP BY event_type
""",
    tags=("messagelog", "scan"),
)
def q_log_ordered_scan(spark: SparkSession, sf: str) -> DataFrame:
    """S5: full ordered topic scan, aggregated per ordering group after a
    write→read round-trip through manifest-named files."""
    topic = _events_topic(spark, sf)
    df = topic.dataframe()
    return df.groupBy("ordering_group").agg(
        F.count(F.lit(1)).alias("n_messages"),
        F.min("ulid_ts_ms").alias("first_ts_ms"),
        F.max("ulid_ts_ms").alias("last_ts_ms"),
        F.min("sequence_number").alias("min_seq"),
        F.max("sequence_number").alias("max_seq"),
    )


@register(
    "q_log_stream_sink_roundtrip",
    bench=True,
    oracle="""
SELECT event_type AS ordering_group,
       CAST(COUNT(*) AS BIGINT) AS n_messages,
       CAST(MIN(CAST(epoch_us(ts) // 1000 AS BIGINT)) AS BIGINT) AS first_ts_ms,
       CAST(MAX(CAST(epoch_us(ts) // 1000 AS BIGINT)) AS BIGINT) AS last_ts_ms,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_positions
FROM events GROUP BY event_type
""",
    tags=("messagelog", "streaming", "sink"),
)
def q_log_stream_sink_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming WRITE path round-trip, oracle-checked end to end.

    events → file stream → message projection → ``stream_to_topic``
    (micro-batches through the commit protocol, exactly-once epoch
    tracking) → batch read of the sink-written topic → aggregate.  The
    oracle states the same aggregates directly over ``events``: any
    loss, duplication, or ULID corruption in the streaming sink breaks
    the hash.  Complements S6 (tail = streaming read) with the
    producer-side equivalent (S1/S2's continuous write, reference:
    AvroRawdataProducer.java:148-152).
    """
    topic = _sink_topic(spark, sf)
    df = topic.dataframe()
    return df.groupBy("ordering_group").agg(
        F.count(F.lit(1)).alias("n_messages"),
        F.min("ulid_ts_ms").alias("first_ts_ms"),
        F.max("ulid_ts_ms").alias("last_ts_ms"),
        F.countDistinct("position").alias("n_positions"),
    )


@register(
    "q_log_seek",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_after,
       CAST(MIN(event_id) AS BIGINT) AS first_seq
FROM events
WHERE CAST(epoch_us(ts) // 1000 AS BIGINT) >= epoch_ms(TIMESTAMP '2024-01-15 00:00:00')
""",
    tags=("messagelog", "seek"),
)
def q_log_seek(spark: SparkSession, sf: str) -> DataFrame:
    """S7: event-time seek — manifest file pruning + row predicate."""
    topic = _events_topic(spark, sf)
    seek_ms = 1705276800000  # 2024-01-15T00:00:00Z
    df = topic.dataframe(from_ts_ms=seek_ms)
    # one combinable agg pass: count + first-by-ulid in the same scan
    return df.agg(
        F.count(F.lit(1)).alias("n_after"),
        F.min_by("sequence_number", "ulid").alias("first_seq"),
    )


@register(
    "q_log_cursor_position",
    oracle="""
WITH target AS (
  SELECT ts, event_id FROM events WHERE event_id = 500
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_from_cursor
FROM events e, target t
WHERE e.ts > t.ts OR (e.ts = t.ts AND e.event_id >= t.event_id)
""",
    tags=("messagelog", "cursor"),
)
def q_log_cursor_position(spark: SparkSession, sf: str) -> DataFrame:
    """S8/S9: position cursor — find 'ev-500', count the inclusive tail.

    The position lookup is the reference's as-of cursor (filter + top-1);
    the tail count verifies ULID-order resume semantics.
    """
    topic = _events_topic(spark, sf)
    df = topic.dataframe()
    anchor = (
        df.filter(F.col("position") == "ev-500")
        .orderBy("ulid")
        .limit(1)
        .select(F.col("ulid").alias("anchor_ulid"))
    )
    return (
        df.crossJoin(F.broadcast(anchor))
        .filter(F.col("ulid") >= F.col("anchor_ulid"))
        .agg(F.count(F.lit(1)).alias("n_from_cursor"))
    )


@register(
    "q_log_last_message",
    oracle="""
SELECT CAST(event_id AS BIGINT) AS sequence_number,
       'ev-' || CAST(event_id AS VARCHAR) AS position,
       event_type AS ordering_group
FROM events
ORDER BY ts DESC, event_id DESC
LIMIT 1
""",
    tags=("messagelog", "tail"),
)
def q_log_last_message(spark: SparkSession, sf: str) -> DataFrame:
    """S10: lastMessage — manifest-pruned single-file tail read."""
    topic = _events_topic(spark, sf)
    return topic.last_message_df().select(
        "sequence_number", "position", "ordering_group"
    )


@register(
    "q_log_payload_map",
    oracle="""
SELECT event_type AS ordering_group,
       CAST(SUM(CAST(octet_length(encode(props)) AS BIGINT)) AS BIGINT)
         AS props_bytes,
       CAST(COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                       THEN 1 END) AS BIGINT) AS n_high_k
FROM events GROUP BY event_type
""",
    tags=("messagelog", "payload"),
)
def q_log_payload_map(spark: SparkSession, sf: str) -> DataFrame:
    """Payload map<string,binary> access: decode bytes back to JSON and
    aggregate — the ``data`` map round-trip (S1/S5 payload semantics)."""
    topic = _events_topic(spark, sf)
    df = topic.dataframe()
    props = F.element_at(F.col("data"), "props").cast("string")
    k = F.get_json_object(props, "$.k").cast("long")
    return df.groupBy("ordering_group").agg(
        F.sum(F.octet_length(F.element_at(F.col("data"), "props"))).cast(
            "long"
        ).alias("props_bytes"),
        F.count(F.when(k > 50, 1)).alias("n_high_k"),
    )


@register(
    "q_log_time_travel",
    oracle="""
SELECT event_type AS ordering_group,
       CAST(COUNT(*) AS BIGINT) AS n_messages,
       CAST(MAX(CAST(epoch_us(ts) // 1000 AS BIGINT)) AS BIGINT) AS last_ts_ms,
       CAST(MAX(event_id) AS BIGINT) AS max_seq
FROM events
WHERE CAST(epoch_us(ts) // 1000 AS BIGINT)
      <= epoch_ms(TIMESTAMP '2024-01-15 00:00:00')
GROUP BY event_type
""",
    tags=("messagelog", "time-travel"),
)
def q_log_time_travel(spark: SparkSession, sf: str) -> DataFrame:
    """Snapshot-as-of read: the topic as of a past event-time bound.

    The reproducible "train on the corpus as of T" read — the batch
    mirror of the reference consumer's event-time seek (S7,
    AvroRawdataConsumer.java:153-157) but bounding the FUTURE side:
    files whose first-event time exceeds T are pruned from the manifest
    before any scan (safe without sidecars — from_ts is the file min),
    and the row predicate trims the boundary file.
    """
    topic = _events_topic(spark, sf)
    as_of_ms = 1705276800000  # 2024-01-15T00:00:00Z
    df = topic.dataframe(to_ts_ms=as_of_ms)
    return df.groupBy("ordering_group").agg(
        F.count(F.lit(1)).alias("n_messages"),
        F.max("ulid_ts_ms").alias("last_ts_ms"),
        F.max("sequence_number").alias("max_seq"),
    )


@register("q_log_approx_distinct", tags=("messagelog", "sketch", "stats"))
def q_log_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental distinct-position estimate from merged per-file HLL
    sketches (rows-only by design: Datasketches HLL estimates are not
    SQL-expressible in the oracle; accuracy, incrementality, and the
    no-rescan property are pytest-asserted —
    test_sources.py::test_hll_file_sketches_incremental_and_no_rescan).

    The 100 TB cardinality-stats pattern: kilobytes of mergeable
    sketches answer topic-wide distinct counts without a data scan;
    appends only sketch the new files (:mod:`..sources.topic_stats`).
    The returned row pairs the estimate with the exact count so the
    harness records the live error margin.
    """
    topic = _events_topic(spark, sf)
    from ..sources import topic_stats

    est = topic_stats.approx_distinct(topic, "position")
    exact = topic.dataframe().select("position").distinct().count()
    return local_rows_df(
        spark,
        [(est, exact, abs(est - exact) <= max(2, exact * 0.02))],
        "approx_distinct long, exact_distinct long, within_2pct boolean",
    )


@register(
    "q_log_increment",
    oracle="""
SELECT event_type AS ordering_group,
       CAST(COUNT(*) AS BIGINT) AS n_new,
       CAST(MIN(event_id) AS BIGINT) AS min_seq,
       CAST(MAX(event_id) AS BIGINT) AS max_seq
FROM events
WHERE CAST(epoch_us(ts) // 1000 AS BIGINT)
        > epoch_ms(TIMESTAMP '2024-01-10 00:00:00')
  AND CAST(epoch_us(ts) // 1000 AS BIGINT)
        <= epoch_ms(TIMESTAMP '2024-01-20 00:00:00')
GROUP BY event_type
""",
    tags=("messagelog", "incremental"),
)
def q_log_increment(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental batch consumption: everything that arrived between
    two snapshot bounds — ``(T1, T2]`` with both manifest prunings
    composing (S7 floor scan for the lower bound, future-file drop for
    the upper).  The pattern a periodic training-data refresh runs:
    process exactly the delta since the last materialization.
    """
    topic = _events_topic(spark, sf)
    t1 = 1704844800000  # 2024-01-10T00:00:00Z
    t2 = 1705708800000  # 2024-01-20T00:00:00Z
    # from_ts is inclusive; the increment contract is (T1, T2], so drop
    # the exact-boundary millisecond on the low side
    df = topic.dataframe(from_ts_ms=t1, to_ts_ms=t2).filter(
        F.col("ulid_ts_ms") > t1
    )
    return df.groupBy("ordering_group").agg(
        F.count(F.lit(1)).alias("n_new"),
        F.min("sequence_number").alias("min_seq"),
        F.max("sequence_number").alias("max_seq"),
    )


_FANIN_CACHE: dict[str, str] = {}


@register(
    "q_log_fan_in",
    oracle="""
SELECT CASE WHEN event_id % 2 = 0 THEN 'events-even' ELSE 'events-odd' END
         AS topic,
       CAST(COUNT(*) AS BIGINT) AS n_messages,
       CAST(MIN(event_id) AS BIGINT) AS min_seq,
       CAST(MAX(event_id) AS BIGINT) AS max_seq
FROM events GROUP BY 1
""",
    tags=("messagelog", "streaming", "fan-in"),
)
def q_log_fan_in(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-topic fan-in (§2C): two topics under one root, tailed by a
    SINGLE streaming query (``stream_topics``) with rows tagged by
    topic, drained bounded and aggregated.  The oracle restates the
    split over ``events`` — any row lost, duplicated, or mis-tagged
    across the fan-in breaks the hash."""
    from ..streaming.tail import stream_topics

    key = os.path.abspath(sf)
    root = _FANIN_CACHE.get(key)
    if root is None:
        root = tempfile.mkdtemp(prefix="rawdata-fanin-")
        e = load_table(spark, sf, "events")
        msg = e.select(*_message_columns())
        cols = [f.name for f in MESSAGE_SCHEMA.fields]
        for name, pred in (
            ("events-even", F.col("sequence_number") % 2 == 0),
            ("events-odd", F.col("sequence_number") % 2 == 1),
        ):
            Topic(spark, f"file://{root}", name).write_dataframe(
                msg.filter(pred).select(*cols)
            )
        _FANIN_CACHE[key] = root
    stream = stream_topics(spark, f"file://{root}")
    q = (
        stream.groupBy("topic").agg(
            F.count(F.lit(1)).alias("n_messages"),
            F.min("sequence_number").alias("min_seq"),
            F.max("sequence_number").alias("max_seq"),
        )
        .writeStream.format("memory")
        .queryName("t_fan_in")
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="rawdata-fanin-ck-"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("t_fan_in")


@register(
    "q_log_bulk_positions",
    oracle="""
SELECT 'ev-' || CAST(event_id AS VARCHAR) AS position,
       CAST(event_id AS BIGINT) AS sequence_number,
       CAST(epoch_us(ts) // 1000 AS BIGINT) AS ulid_ts_ms,
       event_type AS ordering_group
FROM events WHERE event_id BETWEEN 100 AND 119
""",
    tags=("messagelog", "cursor", "bulk"),
)
def q_log_bulk_positions(spark: SparkSession, sf: str) -> DataFrame:
    """Bulk position resolution (S9 at fleet scale): a coordinator
    resolving thousands of consumers' positions does ONE broadcast
    semi-join against the topic instead of one sequential scan per
    cursor (AvroRawdataClient.java:84-115 resolves them one at a
    time).  Each resolved row carries the cursor facts a consumer
    needs to resume."""
    topic = _events_topic(spark, sf)
    wanted = spark.range(100, 120).select(
        F.concat(F.lit("ev-"), F.col("id").cast("string")).alias("position")
    )
    df = topic.dataframe()
    return df.join(F.broadcast(wanted), "position").select(
        "position",
        F.col("sequence_number").cast("long").alias("sequence_number"),
        F.col("ulid_ts_ms").cast("long").alias("ulid_ts_ms"),
        "ordering_group",
    )
