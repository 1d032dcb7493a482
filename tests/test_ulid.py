"""Unit tests for ULID packing, text form, monotonic generation, and the
distributed assignment path."""

import pyspark.sql.functions as F
import pytest

from rawdata_client_provider_gcs_spark import ulid as U


def test_encode_decode_roundtrip():
    ts, rnd = 1_700_000_123_456, (1 << 79) + 12345
    u = U.encode(ts, rnd)
    assert len(u) == 16
    assert U.timestamp_ms(u) == ts
    assert U.randomness(u) == rnd
    assert U.from_int(U.to_int(u)) == u


def test_text_form_roundtrip_and_order():
    a = U.encode(1000, 1)
    b = U.encode(1000, 2)
    c = U.encode(1001, 0)
    assert U.from_text(U.to_text(a)) == a
    assert len(U.to_text(a)) == 26
    # binary order == text order == (ts, randomness) order
    assert a < b < c
    assert U.to_text(a) < U.to_text(b) < U.to_text(c)


def test_encode_bounds():
    with pytest.raises(ValueError):
        U.encode(1 << 48, 0)
    with pytest.raises(ValueError):
        U.encode(0, 1 << 80)
    assert U.beginning_of(5) < U.end_of(5) < U.beginning_of(6)


def test_monotonic_generator_same_millisecond():
    clock = lambda: 1_700_000_000_000  # frozen clock
    gen = U.MonotonicUlidGenerator(clock=clock)
    ids = [gen.next() for _ in range(100)]
    assert ids == sorted(ids)
    assert len(set(ids)) == 100
    # all in the frozen millisecond
    assert {U.timestamp_ms(u) for u in ids} == {1_700_000_000_000}


def test_monotonic_generator_observe():
    gen = U.MonotonicUlidGenerator(clock=lambda: 1000)
    external = U.encode(2000, 999)  # from the future
    gen.observe(external)
    nxt = gen.next()
    assert nxt > external


def test_with_ulid_distributed_unique_and_ordered(spark):
    df = spark.range(0, 20000, 1, 8).select(
        F.col("id"), (F.lit(1_700_000_000_000) + F.col("id") % 50).alias("ms")
    )
    out = U.with_ulid(df, out_col="u", ts_ms_col=F.col("ms"))
    rows = out.select("id", "ms", "u").collect()
    ulids = [bytes(r["u"]) for r in rows]
    assert len(set(ulids)) == 20000  # globally unique, no coordination
    for r in rows:
        assert U.timestamp_ms(bytes(r["u"])) == r["ms"]
    # ulid order within a timestamp is well-defined and binary-sortable
    df_sorted = out.orderBy("u").select("ms").collect()
    ms_sorted = [r["ms"] for r in df_sorted]
    assert ms_sorted == sorted(ms_sorted)
