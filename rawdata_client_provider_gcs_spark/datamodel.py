"""RawdataMessage data model.

The reference's single record type is a hard-coded Avro record
(reference: src/main/java/no/ssb/rawdata/avro/AvroRawdataProducer.java:42-49):

    id: fixed(16) ulid, orderingGroup: string?, sequenceNumber: long,
    position: string, data: map<string, bytes>

Spark mapping (SURVEY.md §1.4): one DataFrame row with a BinaryType ulid, a
derived event-time column, and a MapType payload.  The payload map is also
the host for multimodal binary columns (bytes + typed sidecar metadata).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Row
from pyspark.sql.types import (
    BinaryType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from . import ulid as ulid_mod

#: Storage schema for one topic row.  ``ulid_ts_ms`` is denormalized from the
#: ULID's first 6 bytes so event-time predicates push down to the scan
#: without any decoding expression in the way.
MESSAGE_SCHEMA = StructType(
    [
        StructField("ulid", BinaryType(), nullable=False),
        StructField("ulid_ts_ms", LongType(), nullable=False),
        StructField("ordering_group", StringType(), nullable=True),
        StructField("sequence_number", LongType(), nullable=False),
        StructField("position", StringType(), nullable=False),
        StructField("data", MapType(StringType(), BinaryType()), nullable=False),
    ]
)


@dataclass
class RawdataMessage:
    """User-facing message POJO, mirroring the reference's RawdataMessage.

    Field semantics per SURVEY.md §1.1; accessors named after the reference
    API (``ulid()``/``position()``/``get(key)`` in
    no.ssb.rawdata.api.RawdataMessage).
    """

    position: str
    data: dict[str, bytes] = field(default_factory=dict)
    ulid: bytes | None = None
    ordering_group: str | None = None
    sequence_number: int = 0

    def timestamp(self) -> int:
        """Millisecond event time from the ULID (reference:
        AvroRawdataConsumer.java:170-174)."""
        if self.ulid is None:
            raise ValueError("message has no ulid assigned yet")
        return ulid_mod.timestamp_ms(self.ulid)

    def get(self, key: str) -> bytes | None:
        return self.data.get(key)

    def keys(self):
        return self.data.keys()

    def to_row(self) -> Row:
        if self.ulid is None:
            raise ValueError("assign a ulid before building a row")
        return Row(
            ulid=bytearray(self.ulid),
            ulid_ts_ms=ulid_mod.timestamp_ms(self.ulid),
            ordering_group=self.ordering_group,
            sequence_number=self.sequence_number,
            position=self.position,
            data={k: bytearray(v) for k, v in self.data.items()},
        )

    @staticmethod
    def from_row(row: Row) -> "RawdataMessage":
        return RawdataMessage(
            position=row["position"],
            data={k: bytes(v) for k, v in (row["data"] or {}).items()},
            ulid=bytes(row["ulid"]),
            ordering_group=row["ordering_group"],
            sequence_number=row["sequence_number"],
        )


class RawdataMessageBuilder:
    """Fluent builder matching the reference producer's ``builder()`` API."""

    def __init__(self):
        self._msg = RawdataMessage(position="")

    def ulid(self, value: bytes):
        self._msg.ulid = value
        return self

    def ordering_group(self, value: str | None):
        self._msg.ordering_group = value
        return self

    def sequence_number(self, value: int):
        self._msg.sequence_number = value
        return self

    def position(self, value: str):
        self._msg.position = value
        return self

    def put(self, key: str, payload: bytes):
        self._msg.data[key] = payload
        return self

    def build(self) -> RawdataMessage:
        if not self._msg.position:
            raise ValueError("position is required")
        return self._msg
