"""TIFF codec coverage (ADVICE r7 #1/#2: the codec shipped untested).

Pins ``rawtiff`` the same way the other still-image codecs are pinned:

- encode→decode round-trip across the full option matrix (4 compressions
  × 2 byte orders × predictor × strip heights × gray/RGB);
- the LZW kernel alone across every width transition (9→10→11→12 bits)
  and the 4094-entry table reset, on incompressible data;
- the PackBits kernel on run/literal/boundary shapes;
- hand-built fixtures for photometric 0 (WhiteIsZero) and 3 (palette);
- tile-layout and 16-bit round-trips (both decode since round 8);
- loud ``UnsupportedCodecError`` for recognized-but-undecodable shapes
  (planar 2, CCITT, 32-bit) — the per-row error boundary
  ``multimodal._catch_row`` relies on;
- hostile-bytes fuzz (truncation + bit flips) — only ``ValueError`` /
  ``UnsupportedCodecError`` may escape, and the decompression-bomb
  guards must hold memory when the IFD lies about the image size;
- pillow parity both directions where pillow is installed.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from rawdata_client_provider_gcs_spark.operators import rawtiff
from rawdata_client_provider_gcs_spark.operators.rawavi import (
    UnsupportedCodecError,
)


def _rgb(h=13, w=17, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _gray(h=13, w=17, seed=4):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


# ------------------------------------------------------------ round-trip


@pytest.mark.parametrize("compression", ["none", "lzw", "deflate", "packbits"])
@pytest.mark.parametrize("byte_order", ["<", ">"])
@pytest.mark.parametrize("rows_per_strip", [None, 3, 1])
def test_roundtrip_rgb(compression, byte_order, rows_per_strip):
    img = _rgb()
    blob = rawtiff.encode_tiff(
        img,
        compression=compression,
        byte_order=byte_order,
        rows_per_strip=rows_per_strip,
    )
    assert rawtiff.sniff_tiff(blob)
    out = rawtiff.decode_tiff(blob)
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("compression", ["none", "lzw", "deflate", "packbits"])
def test_roundtrip_gray(compression):
    img = _gray()
    blob = rawtiff.encode_tiff(img, compression=compression)
    out = rawtiff.decode_tiff(blob)
    # gray decodes to RGB with the channel replicated
    np.testing.assert_array_equal(out, np.repeat(img[:, :, None], 3, axis=2))


@pytest.mark.parametrize("compression", ["lzw", "deflate"])
@pytest.mark.parametrize("byte_order", ["<", ">"])
def test_roundtrip_predictor2(compression, byte_order):
    # a smooth gradient is where predictor 2 actually changes the bytes
    y, x = np.mgrid[0:19, 0:23]
    img = np.stack([(x * 7) % 256, (y * 5) % 256, (x + y) % 256], axis=2)
    img = img.astype(np.uint8)
    blob = rawtiff.encode_tiff(
        img,
        compression=compression,
        byte_order=byte_order,
        predictor=2,
        rows_per_strip=4,
    )
    np.testing.assert_array_equal(rawtiff.decode_tiff(blob), img)


def test_predictor2_requires_lzw_or_deflate():
    with pytest.raises(ValueError, match="predictor 2"):
        rawtiff.encode_tiff(_rgb(), compression="packbits", predictor=2)


def test_roundtrip_single_pixel_and_single_row():
    for img in (_rgb(1, 1), _rgb(1, 40), _rgb(40, 1)):
        for comp in ("none", "lzw", "deflate", "packbits"):
            blob = rawtiff.encode_tiff(img, compression=comp)
            np.testing.assert_array_equal(rawtiff.decode_tiff(blob), img)


# ------------------------------------------------------------ LZW kernel


@pytest.mark.parametrize("n", [0, 1, 10, 300, 700, 2000, 5000, 20000])
def test_lzw_roundtrip_incompressible(n):
    """Random bytes add ~one table entry per input byte, so 5000+ bytes
    walk the table through every width transition (511/1023/2047) and
    past the 4094 reset; 20000 crosses the reset several times."""
    rng = np.random.default_rng(n)
    data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
    assert rawtiff._lzw_decode(rawtiff._lzw_encode(data)) == data


def test_lzw_roundtrip_repetitive():
    data = b"TOBEORNOTTOBEORTOBEORNOT" * 400  # the KwKwK-heavy classic
    enc = rawtiff._lzw_encode(data)
    assert len(enc) < len(data) // 2
    assert rawtiff._lzw_decode(enc) == data


def test_lzw_decode_limit_stops_expansion():
    data = bytes(100_000)  # 100 kB of zeros compresses tiny
    enc = rawtiff._lzw_encode(data)
    assert len(enc) < 2000
    out = rawtiff._lzw_decode(enc, limit=512)
    assert out == bytes(512)


def test_lzw_bad_first_code_raises():
    # first code after Clear must be a root; craft 9-bit stream Clear,300
    bitstream = ((256 << 9) | 300) << 6  # left-align 18 bits in 3 bytes
    blob = bitstream.to_bytes(3, "big")
    with pytest.raises(ValueError):
        rawtiff._lzw_decode(blob.ljust(8, b"\x00"))


# ------------------------------------------------------- PackBits kernel


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"\x01",
        b"A" * 3,
        b"A" * 200,  # run longer than one 128 repeat
        bytes(range(256)),  # pure literals crossing the 128 cap
        b"ABABAB" + b"C" * 5 + b"DE" * 64,
        np.random.default_rng(9).integers(0, 4, 5000, dtype=np.uint8).tobytes(),
    ],
)
def test_packbits_roundtrip(data):
    assert rawtiff._packbits_decode(rawtiff._packbits_encode(data)) == data


def test_packbits_truncated_runs_raise():
    with pytest.raises(ValueError):
        rawtiff._packbits_decode(b"\x05AB")  # literal run promises 6 bytes
    with pytest.raises(ValueError):
        rawtiff._packbits_decode(b"\xfe")  # repeat run missing its byte


def test_packbits_limit_stops_expansion():
    enc = b"\x81a" * 1000  # 1000 × repeat 'a' 128 times = 128 kB
    out = rawtiff._packbits_decode(enc, limit=256)
    assert out == b"a" * 256


# ------------------------------------------------- hand-built fixtures


def _patch_short_tag(blob: bytes, tag: int, value: int) -> bytes:
    """Rewrite the value of a SHORT/LONG IFD tag in an ``encode_tiff``
    blob (little-endian only — enough for fixture surgery)."""
    (ifd_off,) = struct.unpack_from("<I", blob, 4)
    (count,) = struct.unpack_from("<H", blob, ifd_off)
    out = bytearray(blob)
    for k in range(count):
        off = ifd_off + 2 + 12 * k
        t, typ, _n = struct.unpack_from("<HHI", blob, off)
        if t == tag:
            fmt = "<H" if typ == 3 else "<I"
            struct.pack_into(fmt, out, off + 8, value)
            return bytes(out)
    raise AssertionError(f"tag {tag} not in fixture")


def test_photometric0_inverts():
    img = _gray(6, 7)
    blob = _patch_short_tag(rawtiff.encode_tiff(img), 262, 0)  # WhiteIsZero
    out = rawtiff.decode_tiff(blob)
    np.testing.assert_array_equal(
        out, np.repeat((255 - img)[:, :, None], 3, axis=2)
    )


def test_palette_tiff_decodes_via_colormap():
    # build a palette fixture by surgery on a gray encode: flip
    # photometric to 3 and append a ColorMap IFD by re-encoding manually
    idx = ((np.arange(30).reshape(5, 6) * 8) % 256).astype(np.uint8)
    lut16 = np.zeros((3, 256), np.uint16)
    lut16[0] = np.arange(256) << 8  # R ramps
    lut16[1] = 0x7F00  # G constant
    lut16[2] = (255 - np.arange(256)) << 8  # B inverse ramp
    blob = _build_palette_fixture(idx, lut16)
    out = rawtiff.decode_tiff(blob)
    exp = np.stack(
        [lut16[0][idx] >> 8, lut16[1][idx] >> 8, lut16[2][idx] >> 8], axis=2
    ).astype(np.uint8)
    np.testing.assert_array_equal(out, exp)


def _build_palette_fixture(idx: np.ndarray, lut16: np.ndarray) -> bytes:
    h, w = idx.shape
    strip = idx.tobytes()
    header = 8
    strip_off = header
    ifd_off = strip_off + len(strip) + (len(strip) & 1)
    n_tags = 10
    cmap_off = ifd_off + 2 + 12 * n_tags + 4
    tags = [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, 1, 8),
        (259, 3, 1, 1),
        (262, 3, 1, 3),  # palette
        (273, 4, 1, strip_off),
        (277, 3, 1, 1),
        (278, 4, 1, h),
        (279, 4, 1, len(strip)),
        (320, 3, 3 * 256, cmap_off),
    ]
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += strip
    out += b"\x00" * (ifd_off - len(out))
    out += struct.pack("<H", n_tags)
    for tag, typ, n, val in tags:
        out += struct.pack("<HHII", tag, typ, n, val)
    out += struct.pack("<I", 0)
    out += struct.pack("<768H", *lut16.reshape(-1).tolist())
    return bytes(out)


# ------------------------------------------------ unsupported boundaries


def test_unsupported_shapes_raise_codec_error():
    base = rawtiff.encode_tiff(_rgb())
    for tag, value, label in [
        (259, 3, "CCITT G3 compression"),
        (262, 6, "YCbCr photometric"),
        (277, 1, None),  # shrink spp then widen bits below
    ]:
        if label is None:
            continue
        with pytest.raises(UnsupportedCodecError):
            rawtiff.decode_tiff(_patch_short_tag(base, tag, value))
    # planar configuration 2 needs the tag added; patch predictor slot
    gray = rawtiff.encode_tiff(_gray(), compression="deflate", predictor=2)
    with pytest.raises(UnsupportedCodecError):
        rawtiff.decode_tiff(_patch_short_tag(gray, 317, 3))


def test_32bit_raises_codec_error():
    # 8- and 16-bit decode; anything else is the unsupported boundary
    blob = _patch_short_tag(rawtiff.encode_tiff(_gray()), 258, 32)
    with pytest.raises(UnsupportedCodecError, match="bits-per-sample"):
        rawtiff.decode_tiff(blob)


def test_not_a_tiff_raises_valueerror():
    with pytest.raises(ValueError):
        rawtiff.decode_tiff(b"P6 1 1 255\n\x00\x00\x00")


# --------------------------------------------------- bomb + hostile fuzz


def test_deflate_bomb_is_bounded():
    """A 200-byte strip claiming to be a 16k×16k image must fail with a
    clean ValueError without materializing the 800 MB it promises."""
    img = np.zeros((4, 4), np.uint8)
    blob = rawtiff.encode_tiff(img, compression="deflate")
    blob = _patch_short_tag(blob, 256, 16000)
    blob = _patch_short_tag(blob, 257, 16000)
    blob = _patch_short_tag(blob, 278, 16000)
    with pytest.raises(ValueError, match="decodes to|strip"):
        rawtiff.decode_tiff(blob)


def test_dimension_cap_rejects_absurd_ifd():
    blob = rawtiff.encode_tiff(np.zeros((4, 4), np.uint8))
    blob = _patch_short_tag(blob, 256, 2_000_000)
    blob = _patch_short_tag(blob, 257, 2_000_000)
    with pytest.raises(ValueError, match="decode cap"):
        rawtiff.decode_tiff(blob)


def test_lzw_bomb_is_bounded():
    img = np.zeros((4, 4), np.uint8)
    blob = rawtiff.encode_tiff(img, compression="lzw")
    blob = _patch_short_tag(blob, 257, 60000)
    blob = _patch_short_tag(blob, 278, 60000)
    with pytest.raises(ValueError, match="decodes to|strips cover"):
        rawtiff.decode_tiff(blob)


@pytest.mark.parametrize("compression", ["none", "lzw", "deflate", "packbits"])
def test_truncation_fuzz(compression):
    blob = rawtiff.encode_tiff(_rgb(9, 9), compression=compression)
    for cut in range(2, len(blob), max(1, len(blob) // 40)):
        try:
            rawtiff.decode_tiff(blob[:cut])
        except (ValueError, UnsupportedCodecError):
            pass  # the only admissible escapes
        except struct.error as exc:  # pragma: no cover
            raise AssertionError(f"raw struct.error leaked at cut {cut}: {exc}")


@pytest.mark.parametrize("compression", ["lzw", "deflate", "packbits"])
def test_bitflip_fuzz(compression):
    blob = bytearray(rawtiff.encode_tiff(_rgb(9, 9), compression=compression))
    rng = np.random.default_rng(42)
    for _ in range(300):
        pos = int(rng.integers(0, len(blob)))
        bit = 1 << int(rng.integers(0, 8))
        blob[pos] ^= bit
        try:
            out = rawtiff.decode_tiff(bytes(blob))
            assert out.dtype == np.uint8 and out.ndim == 3
        except (ValueError, UnsupportedCodecError):
            pass
        finally:
            blob[pos] ^= bit  # restore for the next flip


# -------------------------------------------------------- pillow parity


def test_pillow_parity_both_directions():
    Image = pytest.importorskip("PIL.Image", reason="pillow not installed")
    import io

    img = _rgb(21, 33, seed=11)
    # ours → pillow, across every compression we emit
    for comp in ("none", "lzw", "deflate", "packbits"):
        blob = rawtiff.encode_tiff(img, compression=comp, rows_per_strip=5)
        got = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
        np.testing.assert_array_equal(got, img)
    # pillow → ours
    for comp in (None, "tiff_lzw", "tiff_adobe_deflate", "packbits"):
        buf = io.BytesIO()
        kw = {"compression": comp} if comp else {}
        Image.fromarray(img).save(buf, format="TIFF", **kw)
        np.testing.assert_array_equal(rawtiff.decode_tiff(buf.getvalue()), img)


def test_multimodal_routes_tiff_errors_per_row():
    """A truncated TIFF under mime image/tiff lands in the error column
    (data corruption), while a planar-2 TIFF is captured under the
    UnsupportedCodecError class name — neither kills the kernel."""
    from rawdata_client_provider_gcs_spark.operators import multimodal

    ok = rawtiff.encode_tiff(_rgb(8, 8), compression="lzw")
    planar2 = _add_extra_tag(ok, 284, 2)
    res_ok, err_ok = multimodal._catch_row(
        multimodal._decode_bytes, ok, "image/tiff", False
    )
    assert err_ok is None and res_ok is not None
    _, err_trunc = multimodal._catch_row(
        multimodal._decode_bytes, ok[:40], "image/tiff", False
    )
    assert err_trunc is not None
    _, err_planar = multimodal._catch_row(
        multimodal._decode_bytes, planar2, "image/tiff", False
    )
    assert err_planar is not None and "UnsupportedCodecError" in err_planar


def _add_extra_tag(blob: bytes, tag: int, value: int) -> bytes:
    """Append a SHORT tag by rebuilding the IFD with one extra entry."""
    (ifd_off,) = struct.unpack_from("<I", blob, 4)
    (count,) = struct.unpack_from("<H", blob, ifd_off)
    entries = blob[ifd_off + 2 : ifd_off + 2 + 12 * count]
    rest = blob[ifd_off + 2 + 12 * count :]
    new = struct.pack("<HHII", tag, 3, 1, value)
    out = bytearray(blob[:ifd_off])
    out += struct.pack("<H", count + 1)
    out += entries + new + rest
    return bytes(out)


# ------------------------------------------------------ tiles and 16-bit


@pytest.mark.parametrize("compression", ["none", "lzw", "deflate", "packbits"])
@pytest.mark.parametrize("byte_order", ["<", ">"])
def test_roundtrip_tiled(compression, byte_order):
    """Tile layout with ragged edges: 29x37 image under 16x16 tiles
    exercises zero-padded right/bottom edge tiles (TIFF 6.0 §15)."""
    img = _rgb(29, 37, seed=6)
    blob = rawtiff.encode_tiff(
        img, compression=compression, byte_order=byte_order, tile=(16, 16)
    )
    np.testing.assert_array_equal(rawtiff.decode_tiff(blob), img)


def test_roundtrip_tiled_predictor_gray():
    y, x = np.mgrid[0:21, 0:18]
    img = ((x * 9 + y * 3) % 256).astype(np.uint8)
    blob = rawtiff.encode_tiff(
        img, compression="deflate", predictor=2, tile=(8, 8)
    )
    np.testing.assert_array_equal(
        rawtiff.decode_tiff(blob), np.repeat(img[:, :, None], 3, axis=2)
    )


def test_tiled_requires_consistent_grid():
    blob = rawtiff.encode_tiff(_rgb(20, 20), tile=(8, 8))  # 3x3 = 9 tiles
    # claim a tile size that implies a larger grid than the file carries
    patched = _patch_short_tag(_patch_short_tag(blob, 322, 4), 323, 4)
    with pytest.raises(ValueError, match="grid needs"):
        rawtiff.decode_tiff(patched)


def test_tile_and_strip_params_are_exclusive():
    with pytest.raises(ValueError, match="mutually exclusive"):
        rawtiff.encode_tiff(_rgb(), tile=(8, 8), rows_per_strip=4)


@pytest.mark.parametrize("compression", ["none", "lzw", "deflate", "packbits"])
@pytest.mark.parametrize("byte_order", ["<", ">"])
def test_roundtrip_16bit_gray(compression, byte_order):
    """16-bit samples decode to the high byte (pillow I;16->L), in both
    byte orders — the byte order applies to the SAMPLES, not just the
    IFD."""
    rng = np.random.default_rng(16)
    img16 = rng.integers(0, 65536, size=(11, 7), dtype=np.uint16)
    blob = rawtiff.encode_tiff(
        img16, compression=compression, byte_order=byte_order
    )
    exp = (img16 >> 8).astype(np.uint8)
    np.testing.assert_array_equal(
        rawtiff.decode_tiff(blob), np.repeat(exp[:, :, None], 3, axis=2)
    )


def test_roundtrip_16bit_rgb_predictor_strips_and_tiles():
    y, x = np.mgrid[0:19, 0:23]
    img16 = np.stack(
        [(x * 700) % 65536, (y * 500) % 65536, (x * y) % 65536], axis=2
    ).astype(np.uint16)
    exp = (img16 >> 8).astype(np.uint8)
    for kw in (
        {"rows_per_strip": 4},
        {"tile": (8, 8)},
    ):
        blob = rawtiff.encode_tiff(
            img16, compression="lzw", predictor=2, byte_order=">", **kw
        )
        np.testing.assert_array_equal(rawtiff.decode_tiff(blob), exp)


def test_16bit_deflate_bomb_still_bounded():
    img16 = np.zeros((4, 4), np.uint16)
    blob = rawtiff.encode_tiff(img16, compression="deflate")
    blob = _patch_short_tag(blob, 256, 16000)
    blob = _patch_short_tag(blob, 257, 16000)
    blob = _patch_short_tag(blob, 278, 16000)
    with pytest.raises(ValueError, match="decodes to|decode cap"):
        rawtiff.decode_tiff(blob)


@pytest.mark.parametrize("compression", ["lzw", "packbits"])
def test_tiled_truncation_fuzz(compression):
    blob = rawtiff.encode_tiff(_rgb(20, 20), compression=compression,
                               tile=(8, 8))
    for cut in range(2, len(blob), max(1, len(blob) // 40)):
        try:
            rawtiff.decode_tiff(blob[:cut])
        except (ValueError, UnsupportedCodecError):
            pass


def test_tiled_16bit_pillow_parity():
    Image = pytest.importorskip("PIL.Image", reason="pillow not installed")
    import io

    img = _rgb(21, 33, seed=12)
    blob = rawtiff.encode_tiff(img, compression="deflate", tile=(16, 16))
    got = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    np.testing.assert_array_equal(got, img)
    # pillow-written 16-bit gray decodes to our high-byte convention
    img16 = (np.arange(64, dtype=np.uint16).reshape(8, 8) * 1021) % 65536
    buf = io.BytesIO()
    Image.fromarray(img16, mode="I;16").save(buf, format="TIFF")
    exp = (img16 >> 8).astype(np.uint8)
    np.testing.assert_array_equal(
        rawtiff.decode_tiff(buf.getvalue()),
        np.repeat(exp[:, :, None], 3, axis=2),
    )


# ------------------------------------------------------- JPEG-in-TIFF


def test_jpeg_in_tiff_single_strip_equals_plain_jpeg():
    """A full-interchange single-strip JPEG TIFF must decode to exactly
    what the repo's JPEG tier decodes from the same stream."""
    from rawdata_client_provider_gcs_spark.operators import rawjpeg

    img = _rgb(29, 37, seed=31)
    blob = rawtiff.encode_tiff(img, compression="jpeg", jpeg_tables=False)
    ref = rawjpeg.decode_jpeg(rawjpeg.encode_jpeg(img))
    np.testing.assert_array_equal(rawtiff.decode_tiff(blob), ref)


def test_jpeg_in_tiff_abbreviated_equals_full():
    """JPEGTables splicing (tag 347) reproduces the full-stream decode
    bit-for-bit, across strips and tiles."""
    img = _rgb(29, 37, seed=32)
    for kw in ({"rows_per_strip": 8}, {"tile": (16, 16)}, {}):
        full = rawtiff.decode_tiff(
            rawtiff.encode_tiff(
                img, compression="jpeg", jpeg_tables=False, **kw
            )
        )
        abbr = rawtiff.decode_tiff(
            rawtiff.encode_tiff(img, compression="jpeg", jpeg_tables=True, **kw)
        )
        np.testing.assert_array_equal(abbr, full)


def test_jpeg_in_tiff_constant_gray_roundtrips_exactly():
    """Constant even-gray at 4:4:4 is the JPEG tier's bit-exact shape
    (test_jpeg_roundtrip_constant_gray_exact) — it must stay exact
    through the TIFF container, including gray input lifted to RGB."""
    c8 = np.full((24, 32), 128, np.uint8)
    for kw in ({"rows_per_strip": 8}, {"tile": (16, 16)}):
        blob = rawtiff.encode_tiff(c8, compression="jpeg", **kw)
        np.testing.assert_array_equal(
            rawtiff.decode_tiff(blob), np.full((24, 32, 3), 128, np.uint8)
        )


def test_jpeg_in_tiff_multistrip_stitches_strip_decodes():
    from rawdata_client_provider_gcs_spark.operators import rawjpeg

    img = _rgb(20, 15, seed=33)
    blob = rawtiff.encode_tiff(
        img, compression="jpeg", jpeg_tables=False, rows_per_strip=8
    )
    exp = np.concatenate(
        [
            rawjpeg.decode_jpeg(rawjpeg.encode_jpeg(img[y : y + 8]))
            for y in (0, 8, 16)
        ]
    )
    np.testing.assert_array_equal(rawtiff.decode_tiff(blob), exp)


def test_jpeg_in_tiff_malformed_tables_and_streams():
    img = _rgb(9, 9)
    blob = rawtiff.encode_tiff(img, compression="jpeg", jpeg_tables=True)
    # corrupt the JPEGTables SOI: decode must see malformed tables
    i = blob.find(b"\xff\xd8", 2)  # the tables blob's own SOI
    assert i > 0
    broken = blob[:i] + b"\x00\x00" + blob[i + 2 :]
    with pytest.raises(ValueError):
        rawtiff.decode_tiff(broken)
    with pytest.raises(ValueError):
        rawtiff.encode_tiff(
            np.zeros((4, 4), np.uint16), compression="jpeg"
        )


@pytest.mark.parametrize("jpeg_tables", [False, True])
def test_jpeg_in_tiff_truncation_fuzz(jpeg_tables):
    blob = rawtiff.encode_tiff(
        _rgb(17, 17), compression="jpeg", jpeg_tables=jpeg_tables,
        rows_per_strip=8,
    )
    for cut in range(2, len(blob), max(1, len(blob) // 40)):
        try:
            rawtiff.decode_tiff(blob[:cut])
        except (ValueError, UnsupportedCodecError):
            pass


def test_jpeg_in_tiff_pillow_parity():
    Image = pytest.importorskip("PIL.Image", reason="pillow not installed")
    import io

    c = np.full((24, 32, 3), 128, np.uint8)
    blob = rawtiff.encode_tiff(c, compression="jpeg", rows_per_strip=8)
    got = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    np.testing.assert_array_equal(got, c)


# ------------------------------------------- planar 2 and sub-byte packs


@pytest.mark.parametrize("compression", ["none", "lzw", "deflate", "packbits"])
@pytest.mark.parametrize("rows_per_strip", [None, 8])
def test_roundtrip_planar2(compression, rows_per_strip):
    """Planar configuration 2: one full strip run per sample plane."""
    img = _rgb(21, 17, seed=41)
    blob = rawtiff.encode_tiff(
        img, compression=compression, rows_per_strip=rows_per_strip, planar=2
    )
    np.testing.assert_array_equal(rawtiff.decode_tiff(blob), img)


def test_roundtrip_planar2_16bit_predictor():
    rng = np.random.default_rng(42)
    img16 = rng.integers(0, 65536, (11, 13, 3), dtype=np.uint16)
    blob = rawtiff.encode_tiff(
        img16, compression="deflate", predictor=2, planar=2, rows_per_strip=4
    )
    np.testing.assert_array_equal(
        rawtiff.decode_tiff(blob), (img16 >> 8).astype(np.uint8)
    )


def test_planar2_rejects_unsupported_combos():
    img = _rgb(9, 9)
    with pytest.raises(ValueError):
        rawtiff.encode_tiff(img, compression="jpeg", planar=2)
    with pytest.raises(ValueError):
        rawtiff.encode_tiff(img, tile=(8, 8), planar=2)
    # a planar TIFF claiming too few strips is malformed
    blob = rawtiff.encode_tiff(img, planar=2, rows_per_strip=4)
    patched = _patch_short_tag(blob, 278, 2)  # implies more strips/plane
    with pytest.raises(ValueError, match="planar TIFF carries"):
        rawtiff.decode_tiff(patched)


def _subbyte_fixture(vals, b, photometric, cmap=None, comp=1):
    h, w = vals.shape
    rowb = (w * b + 7) // 8
    rows = []
    for r in vals:
        bits = np.zeros(rowb * 8, np.uint8)
        for j, v in enumerate(r):
            for k in range(b):
                bits[j * b + k] = (v >> (b - 1 - k)) & 1
        rows.append(np.packbits(bits))
    packed = np.concatenate(rows).tobytes()
    ifd = 8 + len(packed) + (len(packed) & 1)
    tags = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, b), (259, 3, 1, comp),
        (262, 3, 1, photometric), (273, 4, 1, 8), (277, 3, 1, 1),
        (278, 3, 1, h), (279, 4, 1, len(packed)),
    ]
    ntags = len(tags) + (1 if cmap is not None else 0)
    cmap_off = ifd + 2 + 12 * ntags + 4
    if cmap is not None:
        tags.append((320, 3, 3 * (1 << b), cmap_off))
    tags.sort()
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd) + packed)
    out += b"\x00" * (ifd - len(out))
    out += struct.pack("<H", len(tags))
    for t, ty, n, v in tags:
        out += struct.pack("<HHII", t, ty, n, v)
    out += struct.pack("<I", 0)
    if cmap is not None:
        out += struct.pack(f"<{3 * (1 << b)}H", *cmap.reshape(-1).tolist())
    return bytes(out)


@pytest.mark.parametrize("b", [2, 4])
def test_subbyte_gray_scales_to_8bit(b):
    rng = np.random.default_rng(b)
    vals = rng.integers(0, 1 << b, (9, 14), dtype=np.uint8)
    scale = 255 // ((1 << b) - 1)
    dec = rawtiff.decode_tiff(_subbyte_fixture(vals, b, 1))
    np.testing.assert_array_equal(dec[:, :, 0], vals * scale)
    # photometric 0 inverts
    dec0 = rawtiff.decode_tiff(_subbyte_fixture(vals, b, 0))
    np.testing.assert_array_equal(dec0[:, :, 0], 255 - vals * scale)


def test_subbyte_palette_uses_small_colormap():
    rng = np.random.default_rng(44)
    vals = rng.integers(0, 16, (9, 14), dtype=np.uint8)
    cmap = np.zeros((3, 16), np.uint16)
    cmap[0] = np.arange(16) << 12
    cmap[1] = 0x0F00
    cmap[2] = (15 - np.arange(16)) << 12
    dec = rawtiff.decode_tiff(_subbyte_fixture(vals, 4, 3, cmap=cmap))
    exp = np.stack(
        [(cmap[0] >> 8)[vals], (cmap[1] >> 8)[vals], (cmap[2] >> 8)[vals]],
        axis=2,
    ).astype(np.uint8)
    np.testing.assert_array_equal(dec, exp)


def test_subbyte_pillow_parity():
    Image = pytest.importorskip("PIL.Image", reason="pillow not installed")
    import io

    vals = (np.arange(63, dtype=np.uint8).reshape(7, 9)) % 16
    buf = io.BytesIO()
    Image.fromarray(vals * 17, mode="L").convert("P").save(
        buf, format="TIFF", bits=4
    )
    try:
        dec = rawtiff.decode_tiff(buf.getvalue())
    except Exception:
        pytest.skip("pillow did not write a 4-bit TIFF")
    assert dec.shape == (7, 9, 3)


def test_truncated_header_raises_valueerror():
    """A sniffable 4-7 byte stub must fail with the documented
    ValueError, not struct.error (review r8)."""
    for stub in (b"II*\x00", b"II*\x00\x08", b"MM\x00*\x00\x00\x00"):
        with pytest.raises(ValueError):
            rawtiff.decode_tiff(stub)


# --------------------------------------------------------- multi-page


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"compression": "lzw", "rows_per_strip": 3},
        {"compression": "deflate", "predictor": 2},
        {"compression": "packbits", "tile": (8, 8)},
    ],
)
def test_multipage_roundtrip(kw):
    """Multi-page chains (the scanned-document layout): every page's
    offsets rebase correctly across strips, tiles, and out-of-line
    value blocks; decode_tiff still reads page 0."""
    rng = np.random.default_rng(50)
    pages = [
        rng.integers(0, 256, (9 + i, 13, 3), dtype=np.uint8)
        for i in range(4)
    ]
    blob = rawtiff.encode_tiff_multipage(pages, **kw)
    dec = rawtiff.decode_tiff_pages(blob)
    assert len(dec) == 4
    for d, p in zip(dec, pages):
        np.testing.assert_array_equal(d, p)
    np.testing.assert_array_equal(rawtiff.decode_tiff(blob), pages[0])


def test_multipage_fax_document():
    """A 3-page G4 fax document decodes page-exact."""
    pages = []
    for i in range(3):
        page = np.zeros((16, 64), np.uint8)
        page[2 + i : 6 + i, 4:60] = 1
        pages.append(page)
    blob = rawtiff.encode_tiff_multipage(pages, compression="g4")
    dec = rawtiff.decode_tiff_pages(blob)
    assert len(dec) == 3
    for d, p in zip(dec, pages):
        np.testing.assert_array_equal((d[:, :, 0] == 0).astype(np.uint8), p)


def test_multipage_ifd_loop_is_bounded():
    """A hostile next-IFD pointer that loops back must raise ValueError,
    not spin forever."""
    import struct

    blob = bytearray(rawtiff.encode_tiff_multipage(
        [np.zeros((4, 4), np.uint8)] * 2
    ))
    (first_ifd,) = struct.unpack_from("<I", blob, 4)
    (count,) = struct.unpack_from("<H", blob, first_ifd)
    # point page 0's next-IFD back at itself
    struct.pack_into("<I", blob, first_ifd + 2 + 12 * count, first_ifd)
    with pytest.raises(ValueError, match="loops"):
        rawtiff.decode_tiff_pages(bytes(blob))


def test_multipage_pillow_parity():
    Image = pytest.importorskip("PIL.Image", reason="pillow not installed")
    import io

    rng = np.random.default_rng(51)
    pages = [rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
             for _ in range(3)]
    blob = rawtiff.encode_tiff_multipage(pages, compression="deflate")
    img = Image.open(io.BytesIO(blob))
    for i, p in enumerate(pages):
        img.seek(i)
        np.testing.assert_array_equal(np.asarray(img.convert("RGB")), p)
