"""7z container (sources/sevenzip.py): spec grammar, coder subset,
two-direction bsdtar interop, hostile shapes."""

from __future__ import annotations

import shutil
import subprocess

import pytest

from rawdata_client_provider_gcs_spark.operators.rawavi import (
    UnsupportedCodecError,
)
from rawdata_client_provider_gcs_spark.sources import archive as A
from rawdata_client_provider_gcs_spark.sources import sevenzip as S

BSDTAR = shutil.which("bsdtar")

MEMBERS = [
    ("a.txt", b"hello 7z member one"),
    ("dir/b.bin", bytes(range(256)) * 8),
    ("empty.txt", b""),
    ("c.log", b"tail " * 400),
]


@pytest.mark.parametrize("method", ["store", "lzma2", "bzip2", "bcj2"])
def test_roundtrip(method):
    ms = S.parse_7z(S.build_7z(MEMBERS, method=method))
    assert [(m["path"], m["payload"]) for m in ms] == MEMBERS


def test_number_codec_edges():
    # multi-byte NUMBER forms (writer spills to the 8-byte form)
    big = b"x" * 200_000
    ms = S.parse_7z(S.build_7z([("big.bin", big)], method="store"))
    assert ms[0]["payload"] == big


def test_lzma1_and_deflate_coders():
    """Coders our writer doesn't emit, hand-assembled: LZMA1 props
    from a FORMAT_ALONE header, deflate via raw zlib."""
    import lzma
    import zlib

    blob = b"lzma one coder payload " * 40
    alone = lzma.compress(blob, format=lzma.FORMAT_ALONE)
    seven = _hand_7z(S._METHOD_LZMA1, alone[:5], alone[13:], blob)
    assert S.parse_7z(seven)[0]["payload"] == blob

    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    packed = c.compress(blob) + c.flush()
    seven = _hand_7z(S._METHOD_DEFLATE, b"", packed, blob)
    assert S.parse_7z(seven)[0]["payload"] == blob


def _hand_7z(method: int, props: bytes, packed: bytes, blob: bytes) -> bytes:
    """Single-member 7z with an arbitrary coder, built through the
    writer's primitives."""
    import binascii
    import struct

    w = S._W()
    w.number(S._K_HEADER)
    w.number(S._K_MAIN_STREAMS)
    w.number(S._K_PACK_INFO)
    w.number(0)
    w.number(1)
    w.number(S._K_SIZE)
    w.number(len(packed))
    w.number(S._K_END)
    w.number(S._K_UNPACK_INFO)
    w.number(S._K_FOLDER)
    w.number(1)
    w.byte(0)
    w.number(1)
    mid = method.to_bytes(max(1, (method.bit_length() + 7) // 8), "big")
    w.byte(len(mid) | (0x20 if props else 0))
    w.b += mid
    if props:
        w.number(len(props))
        w.b += props
    w.number(S._K_CODERS_UNPACK_SIZE)
    w.number(len(blob))
    w.number(S._K_END)
    w.number(S._K_END)
    w.number(S._K_FILES_INFO)
    w.number(1)
    names = "m.bin\x00".encode("utf-16-le")
    w.number(S._K_NAME)
    w.number(len(names) + 1)
    w.byte(0)
    w.b += names
    w.number(S._K_END)
    w.number(S._K_END)
    header = bytes(w.b)
    out = bytearray(S.SEVENZIP_MAGIC + bytes([0, 4]))
    start = struct.pack(
        "<QQI", len(packed), len(header),
        binascii.crc32(header) & 0xFFFFFFFF,
    )
    out += struct.pack("<I", binascii.crc32(start) & 0xFFFFFFFF)
    out += start + packed + header
    return bytes(out)


@pytest.mark.skipif(BSDTAR is None, reason="no system bsdtar")
def test_bsdtar_reads_our_archives(tmp_path):
    for method in ("store", "lzma2", "bzip2", "bcj2"):
        path = tmp_path / f"m_{method}.7z"
        path.write_bytes(S.build_7z(MEMBERS, method=method))
        out = tmp_path / f"x_{method}"
        out.mkdir()
        r = subprocess.run(
            [BSDTAR, "-xf", str(path), "-C", str(out)],
            capture_output=True,
        )
        assert r.returncode == 0, r.stderr
        for name, payload in MEMBERS:
            assert (out / name).read_bytes() == payload, (method, name)


@pytest.mark.skipif(BSDTAR is None, reason="no system bsdtar")
@pytest.mark.parametrize(
    "opts",
    [None, "7zip:compression=store", "7zip:compression=bzip2",
     "7zip:compression=deflate"],
)
def test_we_read_bsdtar_archives(tmp_path, opts):
    """libarchive-written archives in all four 7zip compression modes
    — the no-mirror-loophole direction."""
    src = tmp_path / "in"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_bytes(b"alpha content 123")
    (src / "sub" / "b.dat").write_bytes(bytes(range(200)) * 3)
    path = tmp_path / "t.7z"
    cmd = [BSDTAR, "-cf", str(path), "--format", "7zip"]
    if opts:
        cmd += ["--options", opts]
    r = subprocess.run(
        cmd + ["a.txt", "sub/b.dat"], cwd=src, capture_output=True
    )
    assert r.returncode == 0, r.stderr
    ms = {m["path"]: m["payload"] for m in S.parse_7z(path.read_bytes())}
    assert ms["a.txt"] == b"alpha content 123"
    assert ms["sub/b.dat"] == bytes(range(200)) * 3


def test_archive_walk_and_wrappers():
    blob = S.build_7z(MEMBERS, method="lzma2")
    fmt, ms = A.parse_archive(blob)
    assert fmt == "7z" and len(ms) == len(MEMBERS)
    import gzip

    fmt, _ = A.parse_archive(gzip.compress(blob))
    assert fmt == "7z.gz"


def test_hostile_shapes():
    good = S.build_7z(MEMBERS, method="lzma2")
    with pytest.raises(ValueError, match="magic"):
        S.parse_7z(b"not a seven zip archive....")
    with pytest.raises(ValueError, match="signature header"):
        S.parse_7z(good[:20])
    # flip a start-header byte -> CRC mismatch
    bad = bytearray(good)
    bad[13] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        S.parse_7z(bytes(bad))
    # flip a next-header byte
    bad = bytearray(good)
    bad[-3] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        S.parse_7z(bytes(bad))
    # flip a payload byte -> member CRC mismatch (or coder error)
    bad = bytearray(good)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError):
        S.parse_7z(bytes(bad))
    # unsupported coder chain -> per-row loud class
    aes = _hand_7z(0x06F10701, b"", b"\x00" * 16, b"x" * 16)
    with pytest.raises(UnsupportedCodecError, match="supported set"):
        S.parse_7z(aes)
    # the archive kernel captures it per row (NotImplementedError branch)
    # bomb: declared output over the guard
    import struct

    w_blob = b"z" * 64
    seven = bytearray(_hand_7z(S._METHOD_COPY, b"", w_blob, w_blob))
    # (declared sizes live in the header; easier: cap at parse level)
    with pytest.raises(ValueError, match="guard"):
        S.parse_7z(bytes(seven), cap=16)


def test_archive_members_per_row_capture(spark):
    """An unsupported coder chain lands as an error row through the
    Spark kernel, never kills the job."""
    aes = _hand_7z(0x06F10701, b"", b"\x00" * 16, b"x" * 16)
    rows = [
        (0, S.build_7z([("ok.txt", b"fine")], method="store")),
        (1, aes),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in A.archive_members(df).collect()}
    assert got[0].path == "ok.txt" and got[0].error is None
    assert got[1].error and "supported set" in got[1].error


def test_folder_level_crc_enforced():
    """Non-solid shape: folder-level kCRC in UnpackInfo with NO
    SubStreamsInfo — a flipped payload byte must raise (pre-fix it
    decoded silently)."""
    import binascii
    import struct

    blob = b"payload bytes to protect"
    w = S._W()
    w.number(S._K_HEADER)
    w.number(S._K_MAIN_STREAMS)
    w.number(S._K_PACK_INFO)
    w.number(0)
    w.number(1)
    w.number(S._K_SIZE)
    w.number(len(blob))
    w.number(S._K_END)
    w.number(S._K_UNPACK_INFO)
    w.number(S._K_FOLDER)
    w.number(1)
    w.byte(0)
    w.number(1)
    w.byte(1)
    w.b += b"\x00"  # copy coder
    w.number(S._K_CODERS_UNPACK_SIZE)
    w.number(len(blob))
    w.number(S._K_CRC)
    w.byte(1)
    w.b += struct.pack("<I", binascii.crc32(blob) & 0xFFFFFFFF)
    w.number(S._K_END)
    w.number(S._K_END)
    w.number(S._K_FILES_INFO)
    w.number(1)
    names = "f.bin\x00".encode("utf-16-le")
    w.number(S._K_NAME)
    w.number(len(names) + 1)
    w.byte(0)
    w.b += names
    w.number(S._K_END)
    w.number(S._K_END)
    header = bytes(w.b)
    out = bytearray(S.SEVENZIP_MAGIC + bytes([0, 4]))
    start = struct.pack(
        "<QQI", len(blob), len(header),
        binascii.crc32(header) & 0xFFFFFFFF,
    )
    out += struct.pack("<I", binascii.crc32(start) & 0xFFFFFFFF)
    out += start + blob + header
    good = bytes(out)
    assert S.parse_7z(good)[0]["payload"] == blob
    bad = bytearray(good)
    bad[33] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        S.parse_7z(bytes(bad))


def test_archive_properties_block_skipped():
    """A kArchiveProperties block before kMainStreamsInfo must not be
    whole-file data loss."""
    good = S.build_7z([("x.txt", b"with props")], method="store")
    import binascii
    import struct

    nh_off, nh_size, _ = struct.unpack("<QQI", good[12:32])
    hdr = good[32 + nh_off : 32 + nh_off + nh_size]
    assert hdr[0] == S._K_HEADER
    # splice: kArchiveProperties { type=0x30 size=2 data } kEnd
    props = bytes([S._K_ARCHIVE_PROPS, 0x30, 2, 0xAB, 0xCD, S._K_END])
    new_hdr = hdr[:1] + props + hdr[1:]
    start = struct.pack(
        "<QQI", nh_off, len(new_hdr),
        binascii.crc32(new_hdr) & 0xFFFFFFFF,
    )
    blob = (
        good[:8]
        + struct.pack("<I", binascii.crc32(start) & 0xFFFFFFFF)
        + start
        + good[32 : 32 + nh_off]
        + new_hdr
    )
    assert S.parse_7z(blob)[0]["payload"] == b"with props"


def test_plain_notimplementederror_stays_loud(spark):
    """archive_members catches UnsupportedCodecError per-row but a
    PLAIN NotImplementedError (mime-tier missing) must stay
    job-killing by design."""
    from unittest import mock

    df = spark.createDataFrame(
        [(0, S.build_7z([("x", b"y")], method="store"))],
        "doc_id long, payload binary",
    )
    with mock.patch.object(
        A, "parse_archive", side_effect=NotImplementedError("tier missing")
    ):
        with pytest.raises(Exception):
            A.archive_members(df).collect()


# --------------------------------------------------------------- round 12:
# BCJ x86 / Delta filter chains


def _code_fixture(seed: int = 5, n: int = 4000) -> bytes:
    """Synthetic x86-like bytes rich in E8/E9 branches with small
    (convertible) targets."""
    import random

    rng = random.Random(seed)
    code = bytearray()
    for _ in range(n):
        r = rng.random()
        if r < 0.25:
            code.append(0xE8 if r < 0.15 else 0xE9)
            code += rng.randrange(0, 1 << 22).to_bytes(4, "little")
        else:
            code += bytes(
                rng.randrange(256) for _ in range(rng.randrange(1, 8))
            )
    return bytes(code)


def _chain_7z(blob: bytes, packed: bytes, coders: list[tuple[int, bytes]],
              bind_pairs: list[tuple[int, int]]) -> bytes:
    """Hand-assembled single-folder 7z with an arbitrary coder chain.
    ``coders``: (method, props) in header order; every coder 1-in/1-out;
    out size of every stage = len(blob)."""
    import binascii
    import struct

    w = S._W()
    w.number(S._K_HEADER)
    w.number(S._K_MAIN_STREAMS)
    w.number(S._K_PACK_INFO)
    w.number(0)
    w.number(1)
    w.number(S._K_SIZE)
    w.number(len(packed))
    w.number(S._K_END)
    w.number(S._K_UNPACK_INFO)
    w.number(S._K_FOLDER)
    w.number(1)
    w.byte(0)
    w.number(len(coders))
    for method, props in coders:
        mid = method.to_bytes(max(1, (method.bit_length() + 7) // 8), "big")
        w.byte(len(mid) | (0x20 if props else 0))
        w.b += mid
        if props:
            w.number(len(props))
            w.b += props
    for i, o in bind_pairs:
        w.number(i)
        w.number(o)
    w.number(S._K_CODERS_UNPACK_SIZE)
    for _ in coders:
        w.number(len(blob))
    w.number(S._K_END)
    w.number(S._K_END)
    w.number(S._K_FILES_INFO)
    w.number(1)
    names = "m.bin\x00".encode("utf-16-le")
    w.number(S._K_NAME)
    w.number(len(names) + 1)
    w.byte(0)
    w.b += names
    w.number(S._K_END)
    w.number(S._K_END)
    header = bytes(w.b)
    out = bytearray(S.SEVENZIP_MAGIC + bytes([0, 4]))
    start = struct.pack(
        "<QQI", len(packed), len(header),
        binascii.crc32(header) & 0xFFFFFFFF,
    )
    out += struct.pack("<I", binascii.crc32(start) & 0xFFFFFFFF)
    out += start + packed + header
    return bytes(out)


def test_bcj_x86_inverts_liblzma_encoder():
    """liblzma's FILTER_X86 (independent C implementation of the same
    public transform) encodes; our decoder must invert bit-exactly."""
    import lzma

    code = _code_fixture()
    raw = lzma.compress(
        code, format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_X86},
                 {"id": lzma.FILTER_LZMA2, "preset": 6}],
    )
    mid = lzma.decompress(
        raw, format=lzma.FORMAT_RAW, filters=[{"id": lzma.FILTER_LZMA2}]
    )
    assert mid != code  # the filter really transformed something
    assert S.bcj_x86_decode(mid) == code


def test_delta_inverts_liblzma_encoder():
    import lzma
    import random

    rng = random.Random(6)
    data = bytes(rng.randrange(256) for _ in range(20000))
    for dist in (1, 2, 4, 16, 255):
        raw = lzma.compress(
            data, format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_DELTA, "dist": dist},
                     {"id": lzma.FILTER_LZMA2, "preset": 1}],
        )
        mid = lzma.decompress(
            raw, format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA2}],
        )
        assert S.delta_decode(mid, dist) == data


@pytest.mark.parametrize("coder_order", ["lzma_first", "bcj_first"])
def test_7z_bcj_lzma2_chain(coder_order):
    """A real BCJ+LZMA2 folder: pack -> LZMA2 -> BCJ-decode -> member.
    The packed bytes come from liblzma's own X86+LZMA2 raw encoder, so
    the fixture cannot mirror our decoder.  Both header coder orders
    decode (bind pairs define the topology, not list position)."""
    import lzma

    code = _code_fixture(seed=9)
    packed = lzma.compress(
        code, format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_X86},
                 {"id": lzma.FILTER_LZMA2, "preset": 6}],
    )
    lz = (S._METHOD_LZMA2, bytes([18]))
    bcj = (S._METHOD_BCJ_X86, b"")
    if coder_order == "lzma_first":
        # coder0=LZMA2, coder1=BCJ; BCJ input (1) <- LZMA2 output (0)
        seven = _chain_7z(code, packed, [lz, bcj], [(1, 0)])
    else:
        # coder0=BCJ, coder1=LZMA2; BCJ input (0) <- LZMA2 output (1)
        seven = _chain_7z(code, packed, [bcj, lz], [(0, 1)])
    ms = S.parse_7z(seven)
    assert ms[0]["payload"] == code


def test_7z_delta_lzma2_chain():
    import lzma
    import random

    rng = random.Random(11)
    # audio-ish data where delta helps
    data = bytes((i // 3 + rng.randrange(3)) & 0xFF for i in range(30000))
    dist = 4
    packed = lzma.compress(
        data, format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_DELTA, "dist": dist},
                 {"id": lzma.FILTER_LZMA2, "preset": 6}],
    )
    seven = _chain_7z(
        data, packed,
        [(S._METHOD_LZMA2, bytes([18])), (S._METHOD_DELTA, bytes([dist - 1]))],
        [(1, 0)],
    )
    ms = S.parse_7z(seven)
    assert ms[0]["payload"] == data


def test_7z_aes_still_unsupported_loudly():
    """AES (multi-input key-stream coder) stays out of scope —
    recognized chain, UnsupportedCodecError, never a job-killing
    error.  (BCJ2, the other multi-input coder, decodes since r13.)"""
    import binascii
    import struct

    w = S._W()
    w.number(S._K_HEADER)
    w.number(S._K_MAIN_STREAMS)
    w.number(S._K_PACK_INFO)
    w.number(0)
    w.number(4)
    w.number(S._K_SIZE)
    for _ in range(4):
        w.number(2)
    w.number(S._K_END)
    w.number(S._K_UNPACK_INFO)
    w.number(S._K_FOLDER)
    w.number(1)
    w.byte(0)
    w.number(2)  # LZMA2 + BCJ2(4-in/1-out)
    w.byte(1 | 0x20)
    w.byte(S._METHOD_LZMA2)
    w.number(1)
    w.b += bytes([18])
    mid = (0x06F10701).to_bytes(4, "big")  # AES-256+SHA-256
    w.byte(len(mid) | 0x10)
    w.b += mid
    w.number(4)
    w.number(1)
    w.number(1)  # bind pair: bcj2 input 1 <- lzma output 0
    w.number(0)
    for idx in (0, 2, 3, 4):  # packed stream indices (n_packed=4)
        w.number(idx)
    w.number(S._K_CODERS_UNPACK_SIZE)
    w.number(8)
    w.number(8)
    w.number(S._K_END)
    w.number(S._K_END)
    w.number(S._K_FILES_INFO)
    w.number(1)
    names = "m.bin\x00".encode("utf-16-le")
    w.number(S._K_NAME)
    w.number(len(names) + 1)
    w.byte(0)
    w.b += names
    w.number(S._K_END)
    w.number(S._K_END)
    header = bytes(w.b)
    out = bytearray(S.SEVENZIP_MAGIC + bytes([0, 4]))
    start = struct.pack("<QQI", 8, len(header),
                        binascii.crc32(header) & 0xFFFFFFFF)
    out += struct.pack("<I", binascii.crc32(start) & 0xFFFFFFFF)
    out += start + b"\x00" * 8 + header
    with pytest.raises(UnsupportedCodecError, match="multi-input"):
        S.parse_7z(out)


def test_bcj_hostile_and_edges():
    # short buffers pass through untouched
    assert S.bcj_x86_decode(b"") == b""
    assert S.bcj_x86_decode(b"\xe8\x01\x02") == b"\xe8\x01\x02"
    # non-branch bytes untouched
    data = bytes(range(200))
    assert S.bcj_x86_decode(data) == data
    # delta distance bounds
    with pytest.raises(ValueError):
        S.delta_decode(b"abc", 0)
    with pytest.raises(ValueError):
        S.delta_decode(b"abc", 257)


def _branchy(n: int = 600) -> bytes:
    import random

    rng = random.Random(9)
    buf = bytearray(rng.randbytes(n))
    for _ in range(n // 15):
        buf[rng.randrange(n)] = rng.choice([0xE8, 0xE9, 0x0F])
    return bytes(buf)


def test_bcj2_codec_roundtrip_and_streams():
    data = _branchy()
    m, c, j, rc = S.bcj2_encode(data)
    assert S.bcj2_decode(m, c, j, rc, len(data)) == data
    # converted operands left the main stream: it is strictly shorter
    # whenever any call/jump addresses exist
    if c or j:
        assert len(m) < len(data)
        assert (len(data) - len(m)) == len(c) + len(j)
    # empty input: 5 flush bytes of rc, nothing else
    m0, c0, j0, rc0 = S.bcj2_encode(b"")
    assert (m0, c0, j0) == (b"", b"", b"") and len(rc0) == 5
    assert S.bcj2_decode(m0, c0, j0, rc0, 0) == b""


def test_bcj2_hostile_streams():
    data = _branchy()
    m, c, j, rc = S.bcj2_encode(data)
    with pytest.raises(ValueError, match="under 5 bytes"):
        S.bcj2_decode(m, c, j, rc[:3], len(data))
    if len(c) >= 4:
        with pytest.raises(ValueError, match="exhausted"):
            S.bcj2_decode(m, c[:2], j, rc, len(data))
    with pytest.raises(ValueError, match="exhausted"):
        S.bcj2_decode(m[: len(m) // 2], c, j, rc, len(data))
    # a conversion that would overrun the declared output size
    one = bytes([0xE8, 1, 0, 0, 0, 0x90])
    m1, c1, j1, rc1 = S.bcj2_encode(one)
    with pytest.raises(ValueError, match="past declared"):
        S.bcj2_decode(m1, c1, j1, rc1, 3)


def test_7z_bcj2_7zr_four_coder_shape_decodes():
    """The OTHER public BCJ2 storage form (three sub-coders feeding
    the splitter) rides the generic folder-graph evaluator."""
    import binascii
    import struct

    data = _branchy(300)
    m, c, j, rc = S.bcj2_encode(data)
    streams = [m, c, j, rc]
    w = S._W()
    w.number(S._K_HEADER)
    w.number(S._K_MAIN_STREAMS)
    w.number(S._K_PACK_INFO)
    w.number(0)
    w.number(4)
    w.number(S._K_SIZE)
    for st in streams:
        w.number(len(st))
    w.number(S._K_END)
    w.number(S._K_UNPACK_INFO)
    w.number(S._K_FOLDER)
    w.number(1)
    w.byte(0)
    w.number(4)  # Copy, Copy, Copy, BCJ2
    for _ in range(3):
        w.byte(1)
        w.byte(S._METHOD_COPY)
    mid = (0x0303011B).to_bytes(4, "big")
    w.byte(len(mid) | 0x10)
    w.b += mid
    w.number(4)
    w.number(1)
    for a, b in ((3, 0), (4, 1), (5, 2)):
        w.number(a)
        w.number(b)
    for idx in (0, 1, 2, 6):
        w.number(idx)
    w.number(S._K_CODERS_UNPACK_SIZE)
    for st in streams[:3]:
        w.number(len(st))
    w.number(len(data))
    w.number(S._K_END)
    w.number(S._K_SUBSTREAMS_INFO)
    w.number(S._K_NUM_UNPACK_STREAM)
    w.number(1)
    w.number(S._K_CRC)
    w.byte(1)
    w.b += struct.pack("<I", binascii.crc32(data) & 0xFFFFFFFF)
    w.number(S._K_END)
    w.number(S._K_END)
    w.number(S._K_FILES_INFO)
    w.number(1)
    names = "m.bin\x00".encode("utf-16-le")
    w.number(S._K_NAME)
    w.number(len(names) + 1)
    w.byte(0)
    w.b += names
    w.number(S._K_END)
    w.number(S._K_END)
    header = bytes(w.b)
    packed = b"".join(streams)
    out = bytearray(S.SEVENZIP_MAGIC + bytes([0, 4]))
    start = struct.pack("<QQI", len(packed), len(header),
                        binascii.crc32(header) & 0xFFFFFFFF)
    out += struct.pack("<I", binascii.crc32(start) & 0xFFFFFFFF)
    out += start + packed + header
    ms = S.parse_7z(bytes(out))
    assert [(r["path"], r["payload"]) for r in ms] == [("m.bin", data)]
