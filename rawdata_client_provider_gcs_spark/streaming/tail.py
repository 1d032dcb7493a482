"""Streaming tail of a topic — the unbounded consumer (S6).

The reference tails by polling listings every 500 ms
(AvroRawdataConsumer.java:97-111, TopicAvroFileCache.java:23-30); the
Spark-native replacement is the Structured Streaming file source, whose
new-file discovery, listing cache, and backpressure
(``maxFilesPerTrigger``) are built in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..datamodel import MESSAGE_SCHEMA


def stream_topic(
    spark: SparkSession,
    topic_uri: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Unbounded message stream over a topic folder.

    Metadata objects live under ``<topic>/metadata/`` and are excluded by
    the non-recursive glob on manifest-named files.
    """
    reader = (
        spark.readStream.schema(MESSAGE_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "false")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(topic_uri)
