"""Property-based tests (hypothesis) for the pure codec foundations.

The message-log correctness chain rests on four pure functions whose
round-trip behavior must hold for *arbitrary* inputs, not just the
examples in the TCK tests: the filename-as-manifest codec, the metadata
key escaping, ULID encode/decode + monotonic generation, and the Avro
envelope container codec.  Hypothesis hammers each with generated input;
every property here is a contract the reference relies on
(AvroFileMetadata.java encode/decode, GCSRawdataMetadataClient.java key
escaping, de-huszar ULID ordering, AvroRawdataProducer.java container
layout).

No SparkSession needed — these run in milliseconds.
"""

from __future__ import annotations

import re

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from rawdata_client_provider_gcs_spark import ulid as ulid_mod  # noqa: E402
from rawdata_client_provider_gcs_spark.metadata import (  # noqa: E402
    escape_key,
    unescape_key,
)
from rawdata_client_provider_gcs_spark.sources import avro_codec  # noqa: E402
from rawdata_client_provider_gcs_spark.sources.filenames import (  # noqa: E402
    decode_filename,
    encode_filename,
    format_timestamp_ms,
    parse_timestamp_ms,
)

# positions the filename codec can carry: no "_" (field separator), no "/"
# (path separator), no leading-dot ambiguity; the producer API accepts any
# string but the reference convention keeps positions in this alphabet
_POSITION = st.text(
    alphabet=st.characters(
        codec="ascii", categories=("L", "N"), include_characters="-.:+="
    ),
    min_size=1,
    max_size=40,
).filter(lambda s: not s.startswith(".") and not s.endswith("."))

_TS_MS = st.integers(min_value=0, max_value=4_102_444_800_000)  # ..2100


@given(ts=_TS_MS)
def test_timestamp_text_roundtrip(ts):
    assert parse_timestamp_ms(format_timestamp_ms(ts)) == ts


@given(
    ts=_TS_MS,
    count=st.integers(min_value=0, max_value=2**31),
    offset=st.integers(min_value=0, max_value=2**40),
    position=_POSITION,
    ext=st.sampled_from(["parquet", "avro"]),
)
def test_filename_codec_roundtrip(ts, count, offset, position, ext):
    name = encode_filename(
        from_ts_ms=ts,
        count=count,
        last_block_offset=offset,
        first_position=position,
        ext=ext,
    )
    entry = decode_filename(name)
    assert entry.from_ts_ms == ts
    assert entry.count == count
    assert entry.last_block_offset == offset
    assert entry.first_position == position
    assert entry.ext == ext
    # Hadoop Path constraint: no ':' anywhere in the name
    assert ":" not in name.split(position)[0]


@given(key=st.text(min_size=1, max_size=60))
def test_metadata_key_escaping_roundtrip(key):
    escaped = escape_key(key)
    # escaped form is filesystem-safe: ascii, no separators or dot-files
    assert re.fullmatch(r"[A-Za-z0-9.\-*_+%]*", escaped), escaped
    assert not escaped.startswith(".") or escaped.startswith("...")
    assert unescape_key(escaped) == key


@given(ts=_TS_MS, rnd=st.integers(min_value=0, max_value=(1 << 80) - 1))
def test_ulid_encode_decode_roundtrip(ts, rnd):
    u = ulid_mod.encode(ts, rnd)
    assert len(u) == 16
    assert ulid_mod.timestamp_ms(u) == ts
    assert ulid_mod.randomness(u) == rnd
    assert ulid_mod.from_int(ulid_mod.to_int(u)) == u
    assert ulid_mod.from_text(ulid_mod.to_text(u)) == u


@given(
    tss=st.lists(_TS_MS, min_size=2, max_size=50),
)
def test_ulid_generator_strictly_monotonic_even_with_clock_skew(tss):
    """ids strictly increase even when the supplied clock jumps backwards."""
    it = iter(tss)
    last = tss[-1]

    def clock():
        return next(it, last)

    gen = ulid_mod.MonotonicUlidGenerator(clock=clock)
    ids = [gen.next() for _ in tss]
    assert all(a < b for a, b in zip(ids, ids[1:]))
    # byte order == numeric order (files sort by ulid bytes)
    assert ids == sorted(ids)


_DATA_MAP = st.dictionaries(
    st.text(min_size=1, max_size=10),
    st.binary(max_size=200),
    max_size=4,
)


@given(
    rows=st.lists(
        st.tuples(
            _TS_MS,
            st.integers(min_value=0, max_value=(1 << 80) - 1),
            st.one_of(st.none(), st.text(max_size=10)),
            st.integers(min_value=0, max_value=2**40),
            st.text(min_size=1, max_size=20),
            _DATA_MAP,
        ),
        min_size=0,
        max_size=30,
    ),
    records_per_block=st.integers(min_value=1, max_value=7),
)
@settings(max_examples=50)
def test_avro_container_roundtrip(rows, records_per_block):
    tuples = [
        (ulid_mod.encode(ts, rnd), og, seq, pos, data)
        for ts, rnd, og, seq, pos, data in rows
    ]
    blob = avro_codec.encode_container(
        tuples, records_per_block=records_per_block
    )
    assert avro_codec.decode_container(blob) == tuples
