"""LZ4 + Snappy pure-Python codecs (sources/compression.py) — spec
vectors, roundtrips, integrity, bombs, archive-wrapper integration."""

from __future__ import annotations

import gzip
import random

import pytest

from rawdata_client_provider_gcs_spark.sources import archive as A
from rawdata_client_provider_gcs_spark.sources import compression as C


def test_xxh32_spec_vectors():
    # xxHash reference test values (public spec/sanity suite) — cover
    # the <16-byte tail path, the 4-byte stride, and the 16-byte
    # stripe accumulator, not just the empty string
    assert C.xxh32(b"") == 0x02CC5D05
    assert C.xxh32(b"", seed=0x9E3779B1) == 0x36B78AE7
    assert C.xxh32(b"a") == 0x550D7456
    assert C.xxh32(b"abc") == 0x32D153FF
    assert C.xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F


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


def test_review_fixes_linked_frames_and_padding():
    """Round-10 review pins: block-LINKED frames (the lz4 CLI default)
    carry the 64 KiB window across blocks; snappy 0xFE padding chunks
    skip; 6-byte varints reject."""
    magic = C.LZ4_FRAME_MAGIC
    flg = bytes([0x40, 0x70])  # v1, B.Indep CLEAR = linked
    hc = (C.xxh32(flg) >> 8) & 0xFF
    blk1 = b"abcdefghijklmnop"
    frame = bytearray(magic + flg + bytes([hc]))
    frame += (len(blk1) | 0x80000000).to_bytes(4, "little") + blk1
    blk2 = (
        bytes([0x10]) + b"X" + (10).to_bytes(2, "little")
        + bytes([0x10]) + b"!"
    )
    frame += len(blk2).to_bytes(4, "little") + blk2
    frame += (0).to_bytes(4, "little")
    assert C.lz4_decompress(bytes(frame)) == b"abcdefghijklmnopXhijk!"

    # an INDEPENDENT frame with the same cross-block match must fail
    flg_i = bytes([0x60, 0x70])
    frame_i = bytearray(
        magic + flg_i + bytes([(C.xxh32(flg_i) >> 8) & 0xFF])
    )
    frame_i += (len(blk1) | 0x80000000).to_bytes(4, "little") + blk1
    frame_i += len(blk2).to_bytes(4, "little") + blk2
    frame_i += (0).to_bytes(4, "little")
    with pytest.raises(ValueError, match="window"):
        C.lz4_decompress(bytes(frame_i))

    sz = bytearray(C.snappy_stream_compress(b"data!"))
    pad = bytes([0xFE]) + (4).to_bytes(3, "little") + b"\x00" * 4
    assert C.snappy_stream_decompress(bytes(sz[:10] + pad + sz[10:])) == b"data!"
    with pytest.raises(ValueError, match="varint"):
        C.snappy_decompress(b"\x80\x80\x80\x80\x80\x00")

    # CRC-32C check vector (slicing-by-8 path)
    assert C.crc32c(b"123456789") == 0xE3069283


def test_ts_es_head_strips_pes_header():
    """Round-10 review pin: a video PES stream id of 0xE7 (legal,
    (id & 0x1F) == 7) must not read as an SPS NAL — the ES head
    buffer starts after the PES header."""
    from rawdata_client_provider_gcs_spark.operators import rawh264, rawts

    blob = bytearray(rawts.build_ts(h264_sps=(640, 360)))
    # rewrite every PES stream id 0xE0 -> 0xE7 (packets 0/1 are
    # PAT/PMT, whose section bytes coincidentally contain the same
    # pattern — start past them)
    i = 2 * 188
    while True:
        i = blob.find(b"\x00\x00\x01\xe0", i)
        if i < 0:
            break
        blob[i + 3] = 0xE7
        i += 4
    m = rawts.parse_ts(bytes(blob))
    v = [s for s in m["streams"] if s["codec"] == "h264"][0]
    assert (v.get("width"), v.get("height")) == (640, 360)


def test_prefix_mode_bounds_output():
    """max_output (r13): each decoder returns exactly the requested
    prefix of the full decode, without error, for head-only consumers
    like payload classification."""
    rng = random.Random(7)
    payload = bytes(rng.randrange(0, 96) + 32 for _ in range(300_000))
    for comp, dec in (
        (C.lz4_compress, C.lz4_decompress),
        (C.snappy_stream_compress, C.snappy_stream_decompress),
        (C.z_compress, C.z_decompress),
    ):
        blob = comp(payload)
        full = dec(blob)
        assert full == payload
        for k in (1, 4096, 65536, len(payload), len(payload) * 2):
            got = dec(blob, max_output=k)
            assert got == payload[:k], (dec.__name__, k)
    # prefix mode must not weaken full-decode integrity: corrupting
    # a byte still raises when decoding past it without max_output
    blob = bytearray(C.lz4_compress(payload))
    blob[len(blob) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        C.lz4_decompress(bytes(blob))
