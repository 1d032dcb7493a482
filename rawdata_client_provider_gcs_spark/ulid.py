"""ULID helpers: python-side generation and Spark column expressions.

A ULID is 16 bytes: 48-bit big-endian millisecond timestamp followed by
80 bits of randomness.  The reference uses it as the total order of a topic
and as the event-time axis (reference:
src/main/java/no/ssb/rawdata/avro/AvroRawdataProducer.java:229-233 assigns a
*monotonic* ULID per producer; AvroRawdataConsumer.java:53,170-174 derive
seek timestamps from ``ulid.timestamp()``).

Spark-first design notes (100 TB):

- The ULID is stored as ``BinaryType`` (16 bytes).  Spark orders binary
  columns by unsigned lexicographic comparison, which for this layout equals
  ``(timestamp_ms, randomness)`` order — so ``ORDER BY ulid`` is the stream
  order with no decoding step.
- Distributed generation cannot share the reference's in-process mutex.  We
  preserve the same *observable* guarantee the reference gives across
  multiple producers (none) while keeping per-partition strict monotonicity:
  the 80 randomness bits are ``(16-bit partition salt, 64-bit per-partition
  monotonically increasing counter)`` — see :func:`with_ulid`.
"""

from __future__ import annotations

import os
import threading
import time
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ULID_LEN = 16
_MAX_RANDOM = (1 << 80) - 1
_MAX_TS = (1 << 48) - 1

# Crockford base32 alphabet (public ULID spec) for canonical text form.
_B32 = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"


def encode(timestamp_ms: int, randomness: int) -> bytes:
    """Pack (48-bit ms timestamp, 80-bit randomness) into 16 bytes."""
    if not 0 <= timestamp_ms <= _MAX_TS:
        raise ValueError(f"timestamp out of ULID range: {timestamp_ms}")
    if not 0 <= randomness <= _MAX_RANDOM:
        raise ValueError("randomness out of 80-bit range")
    return timestamp_ms.to_bytes(6, "big") + randomness.to_bytes(10, "big")


def timestamp_ms(ulid: bytes) -> int:
    """Millisecond timestamp from the first 6 bytes."""
    return int.from_bytes(ulid[:6], "big")


def randomness(ulid: bytes) -> int:
    return int.from_bytes(ulid[6:], "big")


def to_int(ulid: bytes) -> int:
    return int.from_bytes(ulid, "big")


def from_int(value: int) -> bytes:
    return value.to_bytes(16, "big")


def to_text(ulid: bytes) -> str:
    """Canonical 26-char Crockford base32 text form."""
    v = to_int(ulid)
    out = []
    for _ in range(26):
        out.append(_B32[v & 0x1F])
        v >>= 5
    return "".join(reversed(out))


def from_text(text: str) -> bytes:
    v = 0
    for ch in text.upper():
        v = (v << 5) | _B32.index(ch)
    return from_int(v & ((1 << 128) - 1))


def beginning_of(timestamp_ms_: int) -> bytes:
    """Smallest ULID with the given timestamp — used as a time lower bound.

    Mirrors the reference's ``RawdataConsumer.beginningOf`` semantics used by
    ``cursorOf(position, …)`` window bounds
    (reference: AvroRawdataClient.java:90-91).
    """
    return encode(timestamp_ms_, 0)


def end_of(timestamp_ms_: int) -> bytes:
    """Largest ULID with the given timestamp (inclusive upper bound)."""
    return encode(timestamp_ms_, _MAX_RANDOM)


class MonotonicUlidGenerator:
    """Strictly-increasing ULID source for a single producer.

    Mirrors ``RawdataProducer.nextMonotonicUlid`` semantics (reference:
    AvroRawdataProducer.java:229-233): if the wall clock has not advanced
    past the previous ULID's timestamp, the previous value + 1 is used, so
    ids strictly increase even within one millisecond.
    """

    def __init__(self, clock=None):
        self._clock = clock or (lambda: int(time.time() * 1000))
        self._lock = threading.Lock()
        self._prev: int | None = None

    def next(self) -> bytes:
        with self._lock:
            now = self._clock()
            candidate = (now << 80) | int.from_bytes(os.urandom(10), "big")
            if self._prev is not None and candidate <= self._prev:
                candidate = self._prev + 1
            self._prev = candidate
            return from_int(candidate)

    def observe(self, ulid: bytes) -> None:
        """Account for an externally supplied id so later ids sort after it."""
        with self._lock:
            v = to_int(ulid)
            if self._prev is None or v > self._prev:
                self._prev = v


# ---------------------------------------------------------------------------
# Spark column expressions (JVM-side; no Python UDFs in the hot path)
# ---------------------------------------------------------------------------

def ulid_timestamp_ms_col(ulid_col: Column | str) -> Column:
    """Extract the 48-bit millisecond timestamp as a LongType column."""
    c = F.col(ulid_col) if isinstance(ulid_col, str) else ulid_col
    return F.conv(F.hex(F.substring(c, 1, 6)), 16, 10).cast("long")


def ulid_ts_col(ulid_col: Column | str) -> Column:
    """Event-time TimestampType column derived from the ULID."""
    return F.timestamp_millis(ulid_timestamp_ms_col(ulid_col))


def ulid_lit(ulid: bytes) -> Column:
    """Literal binary ULID column."""
    return F.lit(bytearray(ulid))


def with_ulid(
    df: DataFrame,
    out_col: str = "ulid",
    ts_ms_col: Column | None = None,
) -> DataFrame:
    """Assign distributed ULIDs to every row of ``df``.

    The low 64 randomness bits are ``monotonically_increasing_id()``
    verbatim: its layout is ``(31-bit partition id) << 33 | 33-bit
    per-partition record counter``, so values are unique across up to 2^31
    partitions (not 2^16 as a modulo salt would give) and strictly
    increasing within each partition — all without any shuffle or driver
    coordination.  This is the distributed analog of the reference's
    per-producer mutex (AvroRawdataProducer.java:206-216).
    """
    ts = ts_ms_col if ts_ms_col is not None else F.lit(int(time.time() * 1000))
    rand_low = F.monotonically_increasing_id()
    ulid_hex = F.concat(
        F.lpad(F.hex(ts.cast("long")), 12, "0"),
        F.lpad(F.hex(F.lit(0)), 4, "0"),        # top 16 randomness bits zero
        F.lpad(F.hex(rand_low), 16, "0"),       # low 64 randomness bits
    )
    return df.withColumn(out_col, F.unhex(ulid_hex))


@dataclass(frozen=True)
class UlidCursor:
    """Cursor over a topic: start at ``ulid``, inclusive or exclusive.

    Mirrors ``RawdataCursor`` resolution in the reference consumer
    (AvroRawdataConsumer.java:37-63): exact match honors the inclusive flag;
    if the stream has no exact match the scan starts at the first later id.
    """

    ulid: bytes
    inclusive: bool = True
