"""MPEG-TS metadata (rawts) — hand-derived bit-layout vectors, fixture
roundtrips, hostile input, continuity accounting, Spark boundary."""

from __future__ import annotations

import pytest

from rawdata_client_provider_gcs_spark.operators import rawts as T
from rawdata_client_provider_gcs_spark.operators.rawavi import (
    UnsupportedCodecError,
)


def test_pts_bit_layout_hand_vector():
    """PTS 90000 (1 second) packed by hand per ISO 13818-1 §2.4.3.7:
    0x21 0x00 0x05 0xBF 0x21 — independent of the fixture packer."""
    # 90000 = 0b0_0000000000000010_101111110010000 in 33 bits:
    # [32:30]=000, [29:15]=000000000000010, [14:0]=101111110010000
    hand = bytes([0x21, 0x00, 0x05, 0xBF, 0x21])
    assert T._pts_of(hand, 0) == 90000
    assert T._pts_bytes(90000) == hand
    # max 33-bit value survives
    top = (1 << 33) - 1
    assert T._pts_of(T._pts_bytes(top), 0) == top


def test_packet_header_bit_layout():
    """PID and PUSI packed by hand: PID 0x1ABC needs the 5-bit high
    part in byte 1 and full byte 2."""
    pkt = T._packet(0x1ABC, b"x", cc=7, pusi=True)
    assert len(pkt) == 188 and pkt[0] == 0x47
    assert pkt[1] == 0x40 | 0x1A and pkt[2] == 0xBC
    assert pkt[3] == 0x10 | 7


def test_roundtrip_and_stream_census():
    b = T.build_ts(duration_ms=6000, pes_per_stream=4,
                   streams=((0x24, 0x41), (0x81, 0x42)), null_packets=3)
    m = T.parse_ts(b)
    assert m["duration_ms"] == 6000
    assert [s["codec"] for s in m["streams"]] == ["hevc", "ac3"]
    assert m["programs"] == {1: 0x20}
    assert m["n_packets"] == 2 + 2 * 4 * 2 + 3
    assert m["continuity_errors"] == 0 and m["n_sync_losses"] == 0
    # single PES: zero-length span
    one = T.parse_ts(T.build_ts(pes_per_stream=1))
    assert one["duration_ms"] == 0


def test_continuity_error_and_resync_accounting():
    b = bytearray(T.build_ts(pes_per_stream=3))
    # drop one full payload packet of stream 0x100 -> continuity skip
    # packets: 0 PAT, 1 PMT, then stream packets; remove packet #3
    del b[3 * 188 : 4 * 188]
    m = T.parse_ts(bytes(b))
    assert m["continuity_errors"] >= 1
    # junk splice mid-stream -> bounded resync, parse continues
    clean = T.build_ts(pes_per_stream=3)
    spliced = clean[: 5 * 188] + b"\x00" * 100 + clean[5 * 188 :]
    m2 = T.parse_ts(spliced)
    assert m2["n_sync_losses"] >= 1
    assert m2["n_packets"] >= m["n_packets"]


def test_hostile_inputs():
    with pytest.raises(ValueError, match="sync"):
        T.parse_ts(b"\x00" * 400)
    # adaptation field length lying over packet end
    pkt = bytearray(T._packet(0x100, b"", cc=0))
    pkt[3] = 0x30  # adaptation + payload
    pkt[4] = 200   # af length > packet
    with pytest.raises(ValueError, match="adaptation"):
        T.parse_ts(bytes(pkt))
    # PAT section length over packet end
    base = T.build_ts()
    pat = bytearray(base[:188])
    pat[4 + 1 + 2] = 0xBF  # section_length high nibble -> huge
    with pytest.raises(ValueError, match="PAT section length"):
        T.parse_ts(bytes(pat))
    # truncation at every packet boundary parses or raises cleanly
    for cut in range(0, len(base), 188):
        try:
            T.parse_ts(base[:cut])
        except ValueError:
            pass
    # bit flips
    import random

    rng = random.Random(10)
    for _ in range(200):
        mutated = bytearray(base)
        for _ in range(4):
            mutated[rng.randrange(len(mutated))] ^= 0xFF
        try:
            T.parse_ts(bytes(mutated))
        except ValueError:
            pass


def test_spark_per_row_boundary(spark):
    from pyspark.sql import functions as F

    from rawdata_client_provider_gcs_spark.operators import multimodal as M

    rows = [
        (1, bytearray(T.build_ts())),
        (2, bytearray(b"\x00" * 600)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {
        r["doc_id"]: r["error"]
        for r in M.extract_features(
            M.with_media_columns(df, "content", "video/mp2t", "doc_id")
        ).collect()
    }
    assert out[1].startswith("UnsupportedCodecError")
    assert out[2].startswith("MediaDecodeError")
    fr = M.sample_frames(
        M.with_media_columns(
            df.filter(F.col("doc_id") == 1), "content", "video/mp2t",
            "doc_id",
        ),
        fake=True,
    ).collect()
    assert fr and all(r["error"] is None for r in fr)


def test_ts_h264_sps_dimensions():
    """Round-10: the buffered ES head of an h264 stream yields the
    SPS's true coded dimensions; absence or corruption degrades to
    dimension-less metadata, never an error."""
    m = T.parse_ts(T.build_ts(h264_sps=(1280, 720)))
    v = [s for s in m["streams"] if s["codec"] == "h264"][0]
    assert (v["width"], v["height"]) == (1280, 720)
    assert v["profile"] == "Baseline"
    v2 = [
        s for s in T.parse_ts(T.build_ts())["streams"]
        if s["codec"] == "h264"
    ][0]
    assert "width" not in v2
