"""LZ4 + Snappy pure-Python codecs (sources/compression.py) — spec
vectors, roundtrips, integrity, bombs, archive-wrapper integration."""

from __future__ import annotations

import gzip
import random

import pytest

from rawdata_client_provider_gcs_spark.sources import archive as A
from rawdata_client_provider_gcs_spark.sources import compression as C


def test_xxh32_spec_vectors():
    # xxHash reference test values (public spec/sanity suite)
    assert C.xxh32(b"") == 0x02CC5D05
    assert C.xxh32(b"", seed=0x9E3779B1) == 0x36B78AE7
    # self-consistency across the three length regimes
    for n in (1, 3, 4, 15, 16, 17, 63, 64, 1000):
        h = C.xxh32(bytes(range(256)) * 4 + b"x" * n)
        assert 0 <= h <= 0xFFFFFFFF


def test_lz4_hand_decoded_block():
    """Hand-assembled LZ4 sequences, independent of the encoder:
    token 0x54 = 5 literals + (4+4)-byte match at offset 5 — classic
    'abcde' + period-5 copy; then an RLE overlap (offset 1)."""
    blk = bytes([0x54]) + b"abcde" + (5).to_bytes(2, "little")
    # spec: last sequence must be literals-only; append one
    blk += bytes([0x10]) + b"!"
    assert C.lz4_block_decompress(blk) == b"abcdeabcdeabc!"
    rle = bytes([0x17]) + b"z" + (1).to_bytes(2, "little") + bytes([0x10]) + b"."
    # 0x17: 1 literal, match len 7+4=11 at offset 1 -> 12 z's
    assert C.lz4_block_decompress(rle) == b"z" * 12 + b"."


def test_snappy_hand_decoded():
    """Hand-assembled Snappy: varint 11, literal 'hello ', copy-1
    len 5 offset 6."""
    blob = bytes([11]) + bytes([(6 - 1) << 2]) + b"hello " + bytes(
        [0x01 | ((5 - 4) << 2)]
    ) + bytes([6])
    assert C.snappy_decompress(blob) == b"hello hello"


def test_roundtrips_all_shapes():
    rng = random.Random(7)
    corpora = [
        b"", b"a", b"ab" * 40, b"hello world " * 500,
        bytes(rng.randrange(256) for _ in range(20_000)),
        b"\x00" * 10_000,
        open("/root/repo/README.md", "rb").read(),
    ]
    for t in corpora:
        assert C.lz4_block_decompress(C.lz4_block_compress(t)) == t
        for kw in (
            dict(), dict(store_uncompressed=True),
            dict(block_checksums=True, content_size=True),
            dict(block_size=333),
        ):
            assert C.lz4_decompress(C.lz4_compress(t, **kw)) == t
        assert C.snappy_decompress(C.snappy_compress(t)) == t
        assert C.snappy_stream_decompress(C.snappy_stream_compress(t)) == t


def test_integrity_and_bombs():
    body = b"The quick brown fox jumps over the lazy dog. " * 200
    # content checksum catches a silent body flip
    good = C.lz4_compress(body)
    flipped = bytearray(good)
    flipped[-20] ^= 0x01
    with pytest.raises(ValueError):
        C.lz4_decompress(bytes(flipped))
    # snappy framing CRC32C catches the same
    sz = bytearray(C.snappy_stream_compress(body))
    sz[len(sz) // 2] ^= 0x01
    with pytest.raises(ValueError):
        C.snappy_stream_decompress(bytes(sz))
    # bomb caps hold
    with pytest.raises(ValueError, match="cap"):
        C.lz4_decompress(C.lz4_compress(b"\x00" * 100_000), cap=10_000)
    with pytest.raises(ValueError, match="cap"):
        C.snappy_decompress(C.snappy_compress(b"\x00" * 100_000), cap=10_000)
    # fuzz: ValueError only
    rng = random.Random(11)
    for base, fn in (
        (C.lz4_compress(body), C.lz4_decompress),
        (C.snappy_stream_compress(body), C.snappy_stream_decompress),
    ):
        for _ in range(200):
            mb = bytearray(base)
            for _ in range(3):
                mb[rng.randrange(len(mb))] ^= 0xFF
            try:
                fn(bytes(mb))
            except ValueError:
                pass


def test_archive_wrapper_integration(spark):
    tar = A.build_tar([("a.txt", b"hello"), ("d/b.bin", b"x" * 3000)])
    zipb = A.build_zip([("z.txt", b"zz")])
    cases = [
        (C.lz4_compress(tar), "tar.lz4"),
        (C.snappy_stream_compress(tar), "tar.sz"),
        (C.lz4_compress(zipb), "zip.lz4"),
        (gzip.compress(C.lz4_compress(tar)), "tar.lz4.gz"),
        (C.lz4_compress(gzip.compress(tar)), "tar.gz.lz4"),
    ]
    for blob, want in cases:
        fmt, members = A.parse_archive(blob)
        assert fmt == want, (fmt, want)
        assert members[0]["path"] in ("a.txt", "z.txt")
    # triple nesting is a bomb
    with pytest.raises(ValueError, match="nested"):
        A.parse_archive(gzip.compress(C.lz4_compress(gzip.compress(tar))))
    # corrupt wrapper lands per-row through the Spark kernel
    bad = bytearray(C.lz4_compress(tar))
    bad[30] ^= 0xFF
    df = spark.createDataFrame(
        [(1, bytearray(C.lz4_compress(tar))), (2, bad)],
        "doc_id long, payload binary",
    )
    rows = A.archive_members(df).collect()
    ok = [r for r in rows if r["doc_id"] == 1]
    err = [r for r in rows if r["doc_id"] == 2]
    assert len(ok) == 2 and all(r["error"] is None for r in ok)
    assert len(err) == 1 and err[0]["error"] is not None
