"""Exception hierarchy mirroring the reference rawdata-client API.

The reference depends on ``no.ssb.rawdata.api`` exceptions; the behaviors we
must preserve are the ones its provider code actually raises:

- ``RawdataNoSuchPositionException`` on a position-cursor miss
  (reference: src/main/java/no/ssb/rawdata/avro/AvroRawdataClient.java:104,111)
- ``RawdataClosedException`` when using a closed client/producer/consumer
  (reference: src/main/java/no/ssb/rawdata/avro/AvroRawdataProducer.java:208)
"""

from __future__ import annotations


class RawdataException(RuntimeError):
    """Base class for all rawdata client errors."""


class RawdataClosedException(RawdataException):
    """Operation attempted on a closed client, producer, or consumer."""


class RawdataNoSuchPositionException(RawdataException):
    """No message with the requested position exists in the scanned window."""


class RawdataNotBufferedException(RawdataException):
    """Kept for API parity with the reference's buffer/publish split."""
