"""Structured Streaming sink: continuous writes into a rawdata topic.

Completes the streaming story's write side.  The reference producer
appends to a topic continuously (AvroRawdataProducer.java:148-152 rotates
and uploads on its window triggers); the Spark-native equivalent is a
``writeStream`` whose micro-batches land through the topic's existing
commit protocol (temp dir → manifest-named rename,
``sources/topic.py:_commit_part_files``), so every file a streaming sink
produces is indistinguishable from a batch-written one: manifest-named,
time-disjoint when range-partitioned, prunable, tailable.

Exactly-once: Spark replays the in-flight micro-batch after a failure
(same ``batch_id``), so the sink records the last committed batch id in
the topic's metadata area (the reference's metadata KV,
``FilesystemRawdataMetadataClient.java:43-58`` analog) and skips batches
it has already committed — the standard idempotent-``foreachBatch``
pattern.  One writer per ``sink_id`` is assumed, which is Spark's own
single-active-query-per-checkpoint semantic.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from ..metadata import RawdataMetadataClient
from ..sources.topic import Topic

_SINK_KEY_PREFIX = "stream-sink-epoch."


def _epoch_key(sink_id: str) -> str:
    return f"{_SINK_KEY_PREFIX}{sink_id}"


def last_committed_batch(topic: Topic, sink_id: str) -> int | None:
    """The newest micro-batch id this sink has durably committed."""
    meta = RawdataMetadataClient(topic.fs, topic.uri, topic.name)
    raw = meta.get(_epoch_key(sink_id))
    if raw is None:
        return None
    return json.loads(raw.decode("utf-8"))["batch_id"]


def stream_to_topic(
    stream_df: DataFrame,
    topic: Topic,
    checkpoint_dir: str,
    sink_id: str = "default",
    ext: str = "parquet",
    max_records_per_file: int | None = None,
    available_now: bool = False,
    query_name: str | None = None,
):
    """Start a streaming query appending ``stream_df`` to ``topic``.

    ``stream_df`` must produce MESSAGE_SCHEMA rows.  Returns the
    ``StreamingQuery``; pass ``available_now=True`` for a bounded drain
    (process everything present, then stop — the deterministic test
    mode), otherwise the query runs until stopped.

    Scale shape: each micro-batch goes through ``Topic.write_dataframe``
    — range-partitioned by ulid, size-windowed via
    ``max_records_per_file`` — so file count and time-disjointness are
    controlled per batch and manifest pruning stays truthful for
    readers tailing concurrently.
    """
    meta = RawdataMetadataClient(topic.fs, topic.uri, topic.name)
    key = _epoch_key(sink_id)

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        raw = meta.get(key)
        if raw is not None and json.loads(raw.decode("utf-8"))["batch_id"] >= batch_id:
            return  # replayed batch after recovery — already durable
        topic.write_dataframe(
            batch_df, ext=ext, max_records_per_file=max_records_per_file
        )
        meta.put(key, json.dumps({"batch_id": batch_id}).encode("utf-8"))

    writer = (
        stream_df.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if query_name:
        writer = writer.queryName(query_name)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
