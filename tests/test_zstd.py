"""zstd (sources/zstd_codec.py): RFC 8878 decode, two-direction CLI
interop, hostile shapes, wrapper integration."""

from __future__ import annotations

import gzip
import os
import random
import shutil
import struct
import subprocess

import pytest

from rawdata_client_provider_gcs_spark.operators.rawavi import (
    UnsupportedCodecError,
)
from rawdata_client_provider_gcs_spark.sources import archive as A
from rawdata_client_provider_gcs_spark.sources import zstd_codec as Z

ZSTD = shutil.which("zstd") or (
    "/root/miniconda/bin/zstd"
    if os.path.exists("/root/miniconda/bin/zstd")
    else None
)


def _cli_compress(data: bytes, tmp_path, *args: str) -> bytes:
    src = tmp_path / "in.bin"
    dst = tmp_path / "out.zst"
    src.write_bytes(data)
    subprocess.run(
        [ZSTD, "-q", "-f", *args, str(src), "-o", str(dst)], check=True
    )
    return dst.read_bytes()


def _corpora() -> dict[str, bytes]:
    rng = random.Random(42)
    words = [b"the", b"quick", b"zstd", b"spark", b"frame", b"data"]
    return {
        "text": b" ".join(rng.choice(words) for _ in range(40000)),
        "rep": b"ABCD" * 30000 + b"x" * 999 + b"ABCD" * 9000,
        "rand": bytes(rng.getrandbits(8) for _ in range(60000)),
        "tiny": b"hi",
        "empty": b"",
    }


# ---------------------------------------------------------------------------
# xxh64 — public test vectors (xxHash reference implementation)
# ---------------------------------------------------------------------------


def test_xxh64_public_vectors():
    assert Z.xxh64(b"") == 0xEF46DB3751D8E999
    assert Z.xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert Z.xxh64(b"abc") == 0x44BC2CF5AD770999
    assert (
        Z.xxh64(b"Nobody inspects the spammish repetition")
        == 0xFBCEA83C8A378BF1
    )


# ---------------------------------------------------------------------------
# raw-block writer roundtrip (independent of entropy paths)
# ---------------------------------------------------------------------------


def test_raw_block_roundtrip():
    data = bytes(random.Random(1).getrandbits(8) for _ in range(200000))
    assert Z.zstd_decompress(Z.build_zst(data)) == data
    assert Z.zstd_decompress(Z.build_zst(data, checksum=False)) == data
    multi = Z.build_zst(
        data, frame_split=70000, skippable_prefix=b"meta", block_size=999
    )
    assert Z.zstd_decompress(multi) == data
    assert Z.zstd_decompress(Z.build_zst(b"")) == b""


# ---------------------------------------------------------------------------
# CLI interop: system-compressed -> engine-decoded
# ---------------------------------------------------------------------------


@pytest.mark.skipif(ZSTD is None, reason="no system zstd CLI")
@pytest.mark.parametrize("level", ["-1", "-3", "-19"])
def test_cli_to_engine_levels(tmp_path, level):
    for name, data in _corpora().items():
        z = _cli_compress(data, tmp_path, level)
        assert Z.zstd_decompress(z) == data, (name, level)


@pytest.mark.skipif(ZSTD is None, reason="no system zstd CLI")
def test_cli_to_engine_shapes(tmp_path):
    data = _corpora()["text"]
    # ultra level (large window), long-distance matching, no checksum
    assert Z.zstd_decompress(
        _cli_compress(data, tmp_path, "--ultra", "-22")
    ) == data
    assert Z.zstd_decompress(
        _cli_compress(data, tmp_path, "-3", "--long=24")
    ) == data
    assert Z.zstd_decompress(
        _cli_compress(data, tmp_path, "-3", "--no-check")
    ) == data
    # concatenated frames (cat a.zst b.zst — the pzstd/split shape)
    rep = _corpora()["rep"]
    z1 = _cli_compress(data, tmp_path, "-3")
    z2 = _cli_compress(rep, tmp_path, "-3")
    assert Z.zstd_decompress(z1 + z2) == data + rep
    # skippable frame prefix
    sk = struct.pack("<I", 0x184D2A50) + struct.pack("<I", 5) + b"hello"
    assert Z.zstd_decompress(sk + z1) == data


# ---------------------------------------------------------------------------
# CLI interop: engine fixtures -> system-decoded
# ---------------------------------------------------------------------------


@pytest.mark.skipif(ZSTD is None, reason="no system zstd CLI")
def test_engine_to_cli(tmp_path):
    data = bytes(random.Random(2).getrandbits(8) for _ in range(120000))
    for kwargs in (
        {},
        {"checksum": False},
        {"frame_split": 50000, "skippable_prefix": b"x" * 9},
        {"block_size": 777},
    ):
        z = tmp_path / "ours.zst"
        z.write_bytes(Z.build_zst(data, **kwargs))
        out = tmp_path / "ours.out"
        subprocess.run(
            [ZSTD, "-q", "-d", "-f", str(z), "-o", str(out)], check=True
        )
        assert out.read_bytes() == data, kwargs


# ---------------------------------------------------------------------------
# hostile shapes
# ---------------------------------------------------------------------------


def test_dictionary_frame_unsupported():
    # frame header with Dictionary_ID_flag=1 and a nonzero 1-byte id
    frame = Z.ZSTD_MAGIC + bytes([0x21, 7]) + b"\x00" * 8
    with pytest.raises(UnsupportedCodecError, match="dictionary"):
        Z.zstd_decompress(frame)


def test_declared_content_size_bomb():
    # single-segment frame declaring 1 GiB content against a small cap
    frame = Z.ZSTD_MAGIC + bytes([0xA0]) + struct.pack("<I", 1 << 30)
    with pytest.raises(ValueError, match="bomb"):
        Z.zstd_decompress(frame + b"\x00" * 8, cap=1 << 20)


def test_rle_block_expansion_capped():
    # frame without FCS: window descriptor, then RLE blocks regenerating
    # 100 KB each from 4 bytes — the cap must trip while decoding
    hdr = Z.ZSTD_MAGIC + bytes([0x00, 0x88])  # fhd: no flags; wd
    blk = (0 | (1 << 1) | (100_000 << 3)).to_bytes(3, "little") + b"A"
    last = (1 | (1 << 1) | (100_000 << 3)).to_bytes(3, "little") + b"A"
    with pytest.raises(ValueError, match="bomb"):
        Z.zstd_decompress(hdr + blk * 30 + last, cap=1 << 20)


def test_checksum_mismatch_raises():
    data = b"payload " * 100
    z = bytearray(Z.build_zst(data, checksum=True))
    z[-1] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        Z.zstd_decompress(bytes(z))


def test_content_size_mismatch_raises():
    z = bytearray(Z.build_zst(b"abcdef"))
    # frame declares 6 bytes; shrink the raw block to 5
    # (single frame: magic+fhd+fcs4 = 9 bytes, then 3-byte block header)
    bh = int.from_bytes(z[9:12], "little")
    z[9:12] = ((bh & 7) | (5 << 3)).to_bytes(3, "little")
    del z[12 + 5]  # drop the 6th payload byte
    with pytest.raises(ValueError, match="declared"):
        Z.zstd_decompress(bytes(z[: 12 + 5] + z[-4:]))


def test_reserved_block_type_raises():
    hdr = Z.ZSTD_MAGIC + bytes([0x00, 0x88])
    blk = (1 | (3 << 1) | (4 << 3)).to_bytes(3, "little") + b"zzzz"
    with pytest.raises(ValueError, match="reserved block"):
        Z.zstd_decompress(hdr + blk)


def test_no_frame_raises():
    with pytest.raises(ValueError):
        Z.zstd_decompress(b"")
    with pytest.raises(ValueError):
        Z.zstd_decompress(b"not zstd at all")
    # skippable-only payload: recognized but carries no content frame
    sk = struct.pack("<I", 0x184D2A50) + struct.pack("<I", 3) + b"abc"
    with pytest.raises(ValueError, match="no zstd frame"):
        Z.zstd_decompress(sk)


@pytest.mark.skipif(ZSTD is None, reason="no system zstd CLI")
def test_truncation_and_bitflip_fuzz(tmp_path):
    data = _corpora()["text"]
    z = _cli_compress(data, tmp_path, "-3")
    rng = random.Random(3)
    for cut in [1, 3, 5, 9, 13, 40, len(z) // 2, len(z) - 1]:
        with pytest.raises((ValueError, UnsupportedCodecError)):
            Z.zstd_decompress(z[:cut])
    for _ in range(80):
        i = rng.randrange(len(z))
        zz = bytearray(z)
        zz[i] ^= 1 << rng.randrange(8)
        try:
            out = Z.zstd_decompress(bytes(zz))
            # a flip that still decodes must reproduce the content
            # exactly (e.g. a flip inside a skipped region); anything
            # else is silent corruption
            assert out == data
        except (ValueError, UnsupportedCodecError):
            pass


# ---------------------------------------------------------------------------
# wrapper integration (archive tier)
# ---------------------------------------------------------------------------


def test_wrapper_tar_zst():
    members = [("a.txt", b"hello zstd wrapper"), ("b/c.bin", bytes(256))]
    tar = A.build_tar(members)
    fmt, ms = A.parse_archive(Z.build_zst(tar))
    assert fmt == "tar.zst"
    assert [(m["path"], m["payload"]) for m in ms] == members


def test_wrapper_zip_zst_multiframe():
    members = [("x.txt", b"zip inside zstd frames " * 20)]
    blob = Z.build_zst(A.build_zip(members), frame_split=200)
    fmt, ms = A.parse_archive(blob)
    assert fmt == "zip.zst"
    assert ms[0]["payload"] == members[0][1]


def test_wrapper_stacked_tar_zst_gz():
    members = [("d.txt", b"stacked")]
    blob = gzip.compress(Z.build_zst(A.build_tar(members)))
    fmt, ms = A.parse_archive(blob)
    assert fmt == "tar.zst.gz"
    assert ms[0]["payload"] == b"stacked"


def test_wrapper_three_layers_refused():
    members = [("e.txt", b"deep")]
    blob = gzip.compress(
        gzip.compress(Z.build_zst(A.build_tar(members)))
    )
    with pytest.raises(ValueError, match="nested compression"):
        A.parse_archive(blob)


def test_wrapper_corrupt_zst_is_value_error():
    tar = A.build_tar([("f.txt", b"x")])
    z = bytearray(Z.build_zst(tar))
    z[10] ^= 0x55
    with pytest.raises(ValueError):
        A.parse_archive(bytes(z))


@pytest.mark.skipif(ZSTD is None, reason="no system zstd CLI")
def test_wrapper_cli_compressed_tar(tmp_path):
    members = [("real.txt", b"CLI-compressed tar, entropy-coded " * 40)]
    z = _cli_compress(A.build_tar(members), tmp_path, "-19")
    fmt, ms = A.parse_archive(z)
    assert fmt == "tar.zst"
    assert ms[0]["payload"] == members[0][1]


# ---------------------------------------------------------------------------
# dictionaries (RFC 8878 §5) — trained, raw, and the web-archive
# embedded-skippable convention
# ---------------------------------------------------------------------------


def _train_dict(tmp_path, n=40, maxdict=4096):
    samples = tmp_path / "samples"
    samples.mkdir()
    rng = random.Random(7)
    words = [b"alpha", b"beta", b"gamma", b"delta", b"epsilon", b"zeta"]
    paths = []
    for i in range(n):
        p = samples / f"s{i}.txt"
        p.write_bytes(b" ".join(rng.choice(words) for _ in range(500)))
        paths.append(p)
    dpath = tmp_path / "dict.bin"
    subprocess.run(
        [ZSTD, "-q", "--train", *map(str, paths), "-o", str(dpath),
         f"--maxdict={maxdict}"],
        check=True,
    )
    return dpath.read_bytes(), paths


@pytest.mark.skipif(ZSTD is None, reason="no system zstd CLI")
def test_trained_dictionary_frames(tmp_path):
    d, paths = _train_dict(tmp_path)
    pd = Z.parse_dictionary(d)
    assert pd["dict_id"] != 0 and pd["huf"] and pd["content"]
    for p in paths[:4]:
        z = tmp_path / "x.zst"
        subprocess.run(
            [ZSTD, "-q", "-19", "-D", str(tmp_path / "dict.bin"), "-f",
             str(p), "-o", str(z)],
            check=True,
        )
        assert Z.zstd_decompress(z.read_bytes(), dict_data=d) \
            == p.read_bytes()


@pytest.mark.skipif(ZSTD is None, reason="no system zstd CLI")
def test_embedded_dict_skippable_convention(tmp_path):
    """The Common Crawl .warc.zst shape: dictionary in a leading
    0x184D2A5D skippable frame (raw AND zstd-compressed variants),
    member frames referencing it."""
    d, paths = _train_dict(tmp_path)
    frames = b""
    want = b""
    for p in paths[:3]:
        z = tmp_path / "m.zst"
        subprocess.run(
            [ZSTD, "-q", "-3", "-D", str(tmp_path / "dict.bin"), "-f",
             str(p), "-o", str(z)],
            check=True,
        )
        frames += z.read_bytes()
        want += p.read_bytes()
    raw_sk = struct.pack("<II", 0x184D2A5D, len(d)) + d
    assert Z.zstd_decompress(raw_sk + frames) == want
    zd = subprocess.run(
        [ZSTD, "-q", "-19", "-c"], input=d, capture_output=True,
        check=True,
    ).stdout
    comp_sk = struct.pack("<II", 0x184D2A5D, len(zd)) + zd
    assert Z.zstd_decompress(comp_sk + frames) == want
    # without any dictionary the frames stay a loud boundary
    with pytest.raises(UnsupportedCodecError, match="dictionary"):
        Z.zstd_decompress(frames)


@pytest.mark.skipif(ZSTD is None, reason="no system zstd CLI")
def test_raw_content_dictionary(tmp_path):
    """A non-structured dictionary file is a raw window prefix."""
    prefix = b"the quick brown fox jumps over the lazy dog " * 20
    (tmp_path / "raw.dict").write_bytes(prefix)
    data = prefix[:300] + b" and then some new text " * 10
    (tmp_path / "in.bin").write_bytes(data)
    z = tmp_path / "out.zst"
    subprocess.run(
        [ZSTD, "-q", "-3", "-D", str(tmp_path / "raw.dict"), "-f",
         str(tmp_path / "in.bin"), "-o", str(z)],
        check=True,
    )
    assert Z.zstd_decompress(z.read_bytes(), dict_data=prefix) == data


@pytest.mark.skipif(ZSTD is None, reason="no system zstd CLI")
def test_dictionary_hostiles(tmp_path):
    d, paths = _train_dict(tmp_path)
    z = tmp_path / "x.zst"
    subprocess.run(
        [ZSTD, "-q", "-3", "-D", str(tmp_path / "dict.bin"), "-f",
         str(paths[0]), "-o", str(z)],
        check=True,
    )
    zb = z.read_bytes()
    # wrong dictionary id
    wrong = bytearray(d)
    wrong[4] ^= 0xFF
    with pytest.raises(ValueError, match="wants dictionary"):
        Z.zstd_decompress(zb, dict_data=bytes(wrong))
    # truncated structured dictionary
    with pytest.raises(ValueError):
        Z.zstd_decompress(zb, dict_data=d[:20])
    with pytest.raises(ValueError, match="empty dictionary"):
        Z.zstd_decompress(zb, dict_data=b"")
    # zero repeat offset in the dictionary header
    pd = Z.parse_dictionary(d)
    content_off = len(d) - len(pd["content"])
    broken = bytearray(d)
    broken[content_off - 12 : content_off - 8] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="repeat offset of zero"):
        Z.zstd_decompress(zb, dict_data=bytes(broken))


# ---------------------------------------------------------------------------
# .warc.zst (IIPC convention): per-record frames + embedded dictionary
# ---------------------------------------------------------------------------


@pytest.mark.skipif(ZSTD is None, reason="no system zstd CLI")
def test_warc_zst_per_record_frames_with_embedded_dict(tmp_path):
    from rawdata_client_provider_gcs_spark.sources import warc as W

    records = [
        {"warc_type": "response", "target_uri": f"http://ex.org/{i}",
         "payload": (f"HTTP/1.1 200 OK\r\n\r\nbody {i} " * 5).encode()}
        for i in range(4)
    ]
    plain = W.build_warc(records)
    want = W.parse_warc(plain)

    # one frame per record region: split the plain warc at record
    # starts and compress each chunk with a trained dictionary
    d, _ = _train_dict(tmp_path)
    dpath = tmp_path / "dict.bin"
    chunks = [plain[i : i + 400] for i in range(0, len(plain), 400)]
    frames = b""
    for j, ch in enumerate(chunks):
        src = tmp_path / f"c{j}.bin"
        dst = tmp_path / f"c{j}.zst"
        src.write_bytes(ch)
        subprocess.run(
            [ZSTD, "-q", "-3", "-D", str(dpath), "-f", str(src),
             "-o", str(dst)],
            check=True,
        )
        frames += dst.read_bytes()
    blob = struct.pack("<II", 0x184D2A5D, len(d)) + d + frames
    got = W.parse_warc(blob)
    assert [(r["warc_type"], r["target_uri"]) for r in got] == [
        (r["warc_type"], r["target_uri"]) for r in want
    ]
    assert got[0]["payload"] == want[0]["payload"]


def test_warc_zst_raw_block_frames():
    """Engine raw-block frames wrap a warc without any CLI: the
    sniff + peel path inside parse_warc."""
    from rawdata_client_provider_gcs_spark.sources import warc as W

    records = [{"warc_type": "response", "target_uri": "http://ex.org/",
                "payload": b"HTTP/1.1 200 OK\r\n\r\nzst body"}]
    plain = W.build_warc(records)
    got = W.parse_warc(Z.build_zst(plain, frame_split=256))
    assert got[0]["target_uri"] == "http://ex.org/"


def test_prefix_mode_bounds_output():
    """max_output (r13): zstd_decompress returns exactly the requested
    prefix, stopping at block granularity — including across the
    multi-frame (pzstd) shape — and a declared content size past the
    cap is not an error in prefix mode."""
    payload = bytes((i * 131) % 251 for i in range(400_000))
    for blob in (
        Z.build_zst(payload, block_size=1 << 14),
        Z.build_zst(payload, frame_split=100_000),
    ):
        assert Z.zstd_decompress(blob) == payload
        for k in (1, 10_000, 1 << 16, len(payload), len(payload) * 2):
            assert Z.zstd_decompress(blob, max_output=k) == payload[:k]
    # content size far past the cap: full decode rejects (bomb guard),
    # prefix decode returns the head
    big = Z.build_zst(b"x" * 1000)
    with pytest.raises(ValueError, match="guard"):
        Z.zstd_decompress(big, cap=100)
    assert Z.zstd_decompress(big, cap=100, max_output=64) == b"x" * 64
