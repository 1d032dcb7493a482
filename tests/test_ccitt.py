"""CCITT T.4/T.6 fax codecs, cross-pinned against the JDK.

Three layers:

- pure-Python round-trips (MH/RLE, G3-1D, G4) over shapes chosen to
  cover every MH table entry: the coverage raster's rows step white
  runs through 0..2699, so every terminating code (0-63), every makeup
  (64-1728) and every extended makeup (1792-2560) of both colors is
  emitted and re-read;
- the TIFF container wiring (compressions 2/3/4, bits=1 default when
  tag 258 is absent, FillOrder, photometric 0/1, multi-strip);
- JDK ImageIO cross-validation BOTH directions (``tools/ccitt_oracle/
  CcittTool.java`` — an independent CCITT implementation): our TIFFs
  decoded by the JDK, JDK-written TIFFs (including its 2D Group 3,
  T4Options bit 0) decoded by us.  Gated on a working ``javac``.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

import numpy as np
import pytest

from rawdata_client_provider_gcs_spark.operators import rawccitt as C
from rawdata_client_provider_gcs_spark.operators import rawtiff
from rawdata_client_provider_gcs_spark.operators.rawavi import (
    UnsupportedCodecError,
)


def _coverage() -> np.ndarray:
    """Rows stepping the leading white run through 0..2699 — full MH
    table coverage for both colors (the black tail covers black runs)."""
    cov = np.zeros((600, 2700), np.uint8)
    for i in range(600):
        cov[i, (i * 41) % 2700 :] = 1
    return cov


def _shapes() -> dict[str, np.ndarray]:
    rng = np.random.default_rng(7)
    bars = np.zeros((40, 250), np.uint8)
    bars[3:9, 20:240] = 1
    bars[15:30, 100:110] = 1
    return {
        "cov": _coverage(),
        "covb": 1 - _coverage(),
        "noise": (rng.random((60, 317)) < 0.5).astype(np.uint8),
        "sparse": (rng.random((60, 317)) < 0.05).astype(np.uint8),
        "bars": bars,
        "white": np.zeros((9, 33), np.uint8),
        "black": np.ones((9, 33), np.uint8),
    }


# ------------------------------------------------------ kernel round-trips


@pytest.mark.parametrize("name", list(_shapes()))
def test_kernel_roundtrips(name):
    s = _shapes()[name]
    h, w = s.shape
    assert np.array_equal(C.decode_mh(C.encode_mh(s), w, h), s)
    assert np.array_equal(
        C.decode_g3(C.encode_mh(s, eol=True), w, h, two_d=False), s
    )
    assert np.array_equal(C.decode_g4(C.encode_g4(s), w, h), s)


def test_g4_beats_mh_on_correlated_rows():
    """2D coding must win on vertically-correlated content (the point
    of Group 4) — a structural pin that the vertical/pass modes are
    actually being chosen, not everything degenerating to horizontal."""
    bars = _shapes()["bars"]
    assert len(C.encode_g4(bars)) < len(C.encode_mh(bars)) // 3


def test_kernel_hostile_streams():
    for data in (b"", b"\xff" * 8, b"\x00" * 8, b"\x0b\x0b\x0b\x0b"):
        for fn in (
            lambda d: C.decode_mh(d, 64, 4),
            lambda d: C.decode_g3(d, 64, 4),
            lambda d: C.decode_g4(d, 64, 4),
        ):
            try:
                fn(data)
            except ValueError:
                pass  # the only admissible escape


def test_kernel_bitflip_fuzz():
    s = _shapes()["noise"]
    h, w = s.shape
    rng = np.random.default_rng(5)
    for codec, enc in (
        ("mh", C.encode_mh(s)),
        ("g4", C.encode_g4(s)),
    ):
        blob = bytearray(enc)
        for _ in range(200):
            pos = int(rng.integers(0, len(blob)))
            bit = 1 << int(rng.integers(0, 8))
            blob[pos] ^= bit
            try:
                out = (
                    C.decode_mh(bytes(blob), w, h)
                    if codec == "mh"
                    else C.decode_g4(bytes(blob), w, h)
                )
                assert out.shape == (h, w)
            except ValueError:
                pass
            finally:
                blob[pos] ^= bit


# --------------------------------------------------------- TIFF container


@pytest.mark.parametrize("comp", ["ccitt_rle", "g3", "g4"])
@pytest.mark.parametrize("rows_per_strip", [None, 16])
def test_tiff_container_roundtrip(comp, rows_per_strip):
    img = _shapes()["sparse"]
    blob = rawtiff.encode_tiff(
        img, compression=comp, rows_per_strip=rows_per_strip
    )
    out = rawtiff.decode_tiff(blob)
    exp = np.repeat(
        np.where(img == 1, 0, 255).astype(np.uint8)[:, :, None], 3, axis=2
    )
    np.testing.assert_array_equal(out, exp)


def test_tiff_bilevel_uncompressed_and_default_bits():
    """A packed 1-bit raster with tag 258 ABSENT (the spec default the
    JDK relies on) decodes under compression 1."""
    img = _shapes()["bars"]
    h, w = img.shape
    import struct

    row_bytes = (w + 7) // 8
    packed = np.packbits(img, axis=1).tobytes()
    ifd_off = 8 + len(packed) + (len(packed) & 1)
    tags = [
        (256, 3, 1, w),
        (257, 3, 1, h),
        (259, 3, 1, 1),
        (262, 3, 1, 0),
        (273, 4, 1, 8),
        (277, 3, 1, 1),
        (278, 3, 1, h),
        (279, 4, 1, h * row_bytes),
    ]
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off) + packed)
    out += b"\x00" * (ifd_off - len(out))
    out += struct.pack("<H", len(tags))
    for t, typ, n, v in tags:
        out += struct.pack("<HHII", t, typ, n, v)
    out += struct.pack("<I", 0)
    dec = rawtiff.decode_tiff(bytes(out))
    exp = np.repeat(
        np.where(img == 1, 0, 255).astype(np.uint8)[:, :, None], 3, axis=2
    )
    np.testing.assert_array_equal(dec, exp)


def test_uncompressed_mode_flags_are_loud():
    img = _shapes()["white"]
    import struct

    for comp, tag in (("g3", 292), ("g4", 293)):
        blob = rawtiff.encode_tiff(img, compression=comp)
        # set the uncompressed-mode bit in T4Options/T6Options
        (ifd_off,) = struct.unpack_from("<I", blob, 4)
        (count,) = struct.unpack_from("<H", blob, ifd_off)
        out = bytearray(blob)
        for k in range(count):
            off = ifd_off + 2 + 12 * k
            t, typ, _n = struct.unpack_from("<HHI", blob, off)
            if t == tag:
                struct.pack_into("<I", out, off + 8, 2)
        with pytest.raises(UnsupportedCodecError, match="uncompressed mode"):
            rawtiff.decode_tiff(bytes(out))


# ------------------------------------------------------ JDK cross-check


@pytest.fixture(scope="module")
def jdk_tool():
    java_home = os.environ.get("JAVA_HOME")
    if not java_home or not os.path.exists(java_home + "/bin/javac"):
        pytest.skip("no JDK available")
    src = os.path.join(
        os.path.dirname(__file__), "..", "tools", "ccitt_oracle",
        "CcittTool.java",
    )
    d = tempfile.mkdtemp(prefix="ccitt-oracle-")
    subprocess.run(
        [java_home + "/bin/javac", "-d", d, src],
        check=True,
        capture_output=True,
    )
    return java_home + "/bin/java", d


def _jdk_decode(tool, tiff_bytes):
    java, cp = tool
    with tempfile.TemporaryDirectory() as d:
        open(d + "/in.tiff", "wb").write(tiff_bytes)
        subprocess.run(
            [java, "-cp", cp, "CcittTool", "decode", d + "/in.tiff",
             d + "/out.raw"],
            check=True,
            capture_output=True,
        )
        raw = open(d + "/out.raw", "rb").read()
        w, h = map(int, raw[:16].decode().split())
        return np.frombuffer(raw, np.uint8, w * h, 16).reshape(h, w)


def _jdk_encode(tool, bits, typ):
    java, cp = tool
    h, w = bits.shape
    with tempfile.TemporaryDirectory() as d:
        hdr = f"{w} {h}".ljust(15) + "\n"
        open(d + "/in.raw", "wb").write(hdr.encode() + bits.tobytes())
        subprocess.run(
            [java, "-cp", cp, "CcittTool", "encode", d + "/in.raw",
             d + "/out.tiff", typ],
            check=True,
            capture_output=True,
        )
        return open(d + "/out.tiff", "rb").read()


_JDK_TYPES = {"ccitt_rle": "CCITT RLE", "g3": "CCITT T.4", "g4": "CCITT T.6"}


@pytest.mark.parametrize("comp", list(_JDK_TYPES))
def test_jdk_reads_ours(jdk_tool, comp):
    """The JDK's independent CCITT decoder must reproduce our pixels —
    over the full-table coverage raster, so every MH code we emit is
    validated against a second implementation."""
    for name in ("cov", "noise", "bars"):
        s = _shapes()[name]
        got = _jdk_decode(jdk_tool, rawtiff.encode_tiff(s, compression=comp))
        np.testing.assert_array_equal(got, s, err_msg=f"{comp}/{name}")


@pytest.mark.parametrize("comp", list(_JDK_TYPES))
def test_we_read_jdk(jdk_tool, comp):
    """JDK-written TIFFs decode exactly — including its Group 3 2D
    layout (T4Options bit 0: per-row 1D/2D tag bits) and its omitted
    BitsPerSample tag (spec default 1)."""
    for name in ("cov", "noise", "bars"):
        s = _shapes()[name]
        blob = _jdk_encode(jdk_tool, s, _JDK_TYPES[comp])
        dec = rawtiff.decode_tiff(blob)
        bits = (dec[:, :, 0] == 0).astype(np.uint8)
        np.testing.assert_array_equal(bits, s, err_msg=f"{comp}/{name}")


def test_jdk_t4_really_uses_2d(jdk_tool):
    """Guard the cross-check's coverage claim: the JDK's T.4 writer
    sets T4Options bit 0, so test_we_read_jdk exercises the 2D G3 path."""
    blob = _jdk_encode(jdk_tool, _shapes()["bars"], "CCITT T.4")
    e = rawtiff._read_ifd(blob)
    assert e[292][1][0] & 1
