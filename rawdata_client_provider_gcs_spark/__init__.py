"""PySpark-native rawdata engine.

A Spark-first reimplementation of the capabilities of
``statisticsnorway/rawdata-client-provider-gcs`` (a topic/producer/consumer
message-log over manifest-named container files on GCS or a local
filesystem) plus the relational and LLM-data-pipeline operator surface
described in SURVEY.md §2B, designed for 100 TB scale.
"""

from .client import RawdataClient, RawdataConsumer, RawdataProducer
from .datamodel import MESSAGE_SCHEMA, RawdataMessage, RawdataMessageBuilder
from .errors import (
    RawdataClosedException,
    RawdataException,
    RawdataNoSuchPositionException,
)
from .session import ensure_engine_confs, gcs_connector_conf, get_spark
from .sources.topic import Topic
from .streaming.tail import stream_topic, stream_topics
from .tables import load_table, load_tables, register_views
from .ulid import MonotonicUlidGenerator, UlidCursor

__all__ = [
    "MESSAGE_SCHEMA",
    "MonotonicUlidGenerator",
    "RawdataClient",
    "RawdataClosedException",
    "RawdataConsumer",
    "RawdataException",
    "RawdataMessage",
    "RawdataMessageBuilder",
    "RawdataNoSuchPositionException",
    "RawdataProducer",
    "Topic",
    "UlidCursor",
    "ensure_engine_confs",
    "gcs_connector_conf",
    "get_spark",
    "load_table",
    "load_tables",
    "register_views",
    "stream_topic",
    "stream_topics",
]

__version__ = "0.1.0"
