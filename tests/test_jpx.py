"""JPEG 2000 reversible subset (ITU-T T.800) — r15.

The reversible 5/3 path makes every round-trip a decoder-independent
byte expectation (the original pixels); the MQ coder is the already-
pinned T.88 coder, and each layer (tag trees, EBCOT passes, DWT,
packet headers) is additionally pinned in isolation.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from rawdata_client_provider_gcs_spark.operators import rawjpx as X


def test_dwt53_exact_inverse():
    rs = np.random.RandomState(2)
    for _ in range(30):
        h, w = rs.randint(1, 70), rs.randint(1, 70)
        img = rs.randint(-300, 300, (h, w))
        lv = rs.randint(0, 5)
        assert (X.dwt53_inverse(X.dwt53_forward(img, lv)) == img).all()


def test_t1_roundtrip_all_bands_and_densities():
    rs = np.random.RandomState(1)
    for band in ("LL", "HL", "LH", "HH"):
        for p in (0.03, 0.4, 0.95):
            mag = (rs.randint(-500, 501, (21, 17))
                   * (rs.rand(21, 17) < p)).astype(np.int64)
            data, npl = X.t1_encode(mag, band)
            if npl == 0:
                continue
            assert (X.t1_decode(data, 21, 17, band, npl) == mag).all()


def test_tag_tree_protocol():
    rnd = random.Random(3)
    for _ in range(40):
        h, w = rnd.randint(1, 6), rnd.randint(1, 6)
        vals = [[rnd.randint(0, 6) for _ in range(w)] for _ in range(h)]
        et = X.TagTree(h, w)
        for y in range(h):
            for x in range(w):
                et.set(y, x, vals[y][x])
        bits = []
        queries = [(y, x, t) for t in range(1, 8)
                   for y in range(h) for x in range(w)]
        for y, x, t in queries:
            et.encode(bits.append, y, x, t)
        it = iter(bits)
        dt = X.TagTree(h, w, decoder=True)
        got = [dt.decode(lambda: next(it), y, x, t)
               for y, x, t in queries]
        assert got == [vals[y][x] < t for y, x, t in queries]
        assert sum(1 for _ in it) == 0


def test_header_bit_stuffing():
    w = X._HdrWriter()
    for _ in range(16):
        w.bit(1)  # produces 0xFF -> stuffing
    blob = w.flush()
    r = X._HdrReader(blob, 0)
    assert all(r.bit() == 1 for _ in range(16))
    assert blob[0] == 0xFF and blob[1] <= 0x7F


@pytest.mark.parametrize("shape,levels", [
    ((8, 8), 0), ((16, 16), 1), ((40, 56), 2), ((70, 90), 3),
    ((33, 65), 2), ((100, 130), 1), ((1, 9), 1), ((9, 1), 2),
])
def test_lossless_roundtrip_gray(shape, levels):
    rs = np.random.RandomState(shape[0] * 100 + shape[1])
    img = rs.randint(0, 256, shape).astype(np.uint8)
    blob = X.encode_jpx(img, levels=levels)
    assert (X.decode_jpx(blob) == img).all()


def test_lossless_roundtrip_rgb_rct():
    rs = np.random.RandomState(7)
    rgb = rs.randint(0, 256, (32, 48, 3)).astype(np.uint8)
    blob = X.encode_jpx(rgb, levels=2)
    got = X.decode_jpx(blob)
    assert got.shape == (32, 48, 3) and (got == rgb).all()


def test_smooth_content_compresses():
    smooth = (np.add.outer(np.arange(64), np.arange(64)) // 2
              % 256).astype(np.uint8)
    blob = X.encode_jpx(smooth, levels=3)
    assert len(blob) < 64 * 64 // 4
    assert (X.decode_jpx(blob) == smooth).all()


def test_jp2_box_wrapper():
    img = np.full((8, 8), 55, np.uint8)
    cs = X.encode_jpx(img, levels=1)
    jp2 = (b"\x00\x00\x00\x0cjP  \r\n\x87\n"
           + (len(cs) + 8).to_bytes(4, "big") + b"jp2c" + cs)
    assert (X.decode_jpx(jp2) == img).all()
    with pytest.raises(ValueError, match="jp2c"):
        X.decode_jpx(b"\x00\x00\x00\x0cjP  \r\n\x87\n")


def test_subset_bounds_are_loud():
    img = np.full((8, 8), 9, np.uint8)
    blob = bytearray(X.encode_jpx(img, levels=1))
    with pytest.raises(ValueError, match="SOC"):
        X.decode_jpx(b"\x00" * 16)
    # flip the wavelet byte to 9/7 (SPcod transform, last COD byte)
    i = blob.index(b"\xff\x52")
    (ln,) = __import__("struct").unpack(">H", blob[i + 2 : i + 4])
    bad = bytearray(blob)
    bad[i + 2 + ln - 1] = 0
    with pytest.raises(ValueError, match="9/7"):
        X.decode_jpx(bytes(bad))
    # quantized QCD style
    j = blob.index(b"\xff\x5c")
    bad = bytearray(blob)
    bad[j + 4] |= 0x02
    with pytest.raises(ValueError, match="quantized"):
        X.decode_jpx(bytes(bad))
    # hostile garbage never escapes ValueError
    rs = np.random.RandomState(8)
    for _ in range(80):
        data = bytes(rs.randint(0, 256, rs.randint(2, 80),
                                dtype=np.uint8))
        try:
            X.decode_jpx(b"\xff\x4f" + data)
        except ValueError:
            pass


def test_pdf_jpx_route_bit_exact():
    from rawdata_client_provider_gcs_spark.operators import rawpdf

    rs = np.random.RandomState(9)
    gray = rs.randint(0, 256, (16, 24)).astype(np.uint8)
    rgb = rs.randint(0, 256, (12, 20, 3)).astype(np.uint8)
    pdf = rawpdf.encode_pdf([["x"]], images=[[
        {"kind": "jpx", "array": gray},
        {"kind": "jpx", "array": rgb, "levels": 1},
    ]])
    out = rawpdf.extract_pdf_images(pdf)
    a, b = out["images"]
    assert a["error"] is None and (a["pixels"] == gray).all()
    assert b["error"] is None and (b["pixels"] == rgb).all()
    assert rawpdf.extract_pdf(pdf)["pages"] == ["x"]


def test_rawimage_and_classify_route_jp2():
    from rawdata_client_provider_gcs_spark.operators import rawimage
    from rawdata_client_provider_gcs_spark.sources.classify import (
        classify_payload)

    rs = np.random.RandomState(3)
    img = rs.randint(0, 256, (12, 16, 3)).astype(np.uint8)
    cs = X.encode_jpx(img)
    jp2 = (b"\x00\x00\x00\x0cjP  \r\n\x87\n"
           + (len(cs) + 8).to_bytes(4, "big") + b"jp2c" + cs)
    for blob in (cs, jp2):
        assert rawimage.sniff_format(blob) == "jp2"
        assert (rawimage.decode_image(blob) == img).all()
        assert classify_payload(blob)["format"] == "jp2"


def test_empty_packets_decode_to_zero_bands():
    """An empty packet (first header bit 0) is legal per T.800 B.10.1
    and decodes that resolution's bands as all-zero — previously it
    left the band slot None and crashed the inverse DWT (r15 ADVICE)."""
    data = bytes(3)  # 3 aligned empty packets: levels=2, 1 component
    bands = X._decode_tile(data, 0, 3, 2, 8, 8, 1)[0]
    flat = [bands[0]] + [bands[r] for r in range(1, 3)]
    img = X.dwt53_inverse(flat)
    assert img.shape == (8, 8) and not img.any()


def test_per_component_override_markers_raise():
    """COC/QCC/RGN change per-component decode parameters; skipping
    them silently would produce wrong pixels — they must be loud."""
    import struct as _s

    rs = np.random.RandomState(9)
    good = X.encode_jpx(rs.randint(0, 256, (16, 16), dtype=np.uint8).astype(np.uint8))
    sot = good.index(b"\xff\x90")
    for mk, name in ((b"\x53", "COC"), (b"\x5d", "QCC"),
                     (b"\x5e", "RGN")):
        bad = good[:sot] + b"\xff" + mk + _s.pack(">H", 4) + b"\x00\x00" \
            + good[sot:]
        with pytest.raises(ValueError, match=name):
            X.decode_jpx(bad)
    # QCD band exponent drift must fail at the QCD, not downstream
    qcd = good.index(b"\xff\x5c")
    bad = bytearray(good)
    bad[qcd + 5] = (X._EXP + 1) << 3  # first SPqcd byte
    with pytest.raises(ValueError, match="band exponent"):
        X.decode_jpx(bytes(bad))
    bad = bytearray(good)
    bad[qcd + 4] = ((X._GUARD + 1) << 5) | (bad[qcd + 4] & 0x1F)
    with pytest.raises(ValueError, match="guard-bit"):
        X.decode_jpx(bytes(bad))


# ---------------------------------------------------------------- 9/7 (r16)


def test_dwt97_perfect_reconstruction_and_dc_gain():
    """Float 9/7 forward/inverse are inverse to ~1e-12, and the
    1/K-lowpass normalization gives DC gain exactly 1 (a flat signal's
    LL band equals the signal)."""
    rs = np.random.RandomState(5)
    img = rs.randint(-128, 128, (45, 67)).astype(np.float64)
    bands = X.dwt97_forward(img, 3)
    assert np.abs(X.dwt97_inverse(bands) - img).max() < 1e-9
    flat = np.full((32, 48), 53.0)
    fb = X.dwt97_forward(flat, 2)
    assert np.abs(fb[0] - 53.0).max() < 1e-9
    for trio in fb[1:]:
        for b in trio:
            assert np.abs(b).max() < 1e-9


@pytest.mark.parametrize("shape,levels,eps,bound", [
    ((50, 70), 2, 16, 1), ((33, 61), 3, 16, 1),
    ((50, 70), 2, 10, 2), ((64, 64), 1, 12, 2),
])
def test_lossy_roundtrip_gray_bounded(shape, levels, eps, bound):
    """9/7 + scalar quantization round trips within the documented
    per-band Δ/2 bound (≤ ``bound`` grey levels after synthesis)."""
    rs = np.random.RandomState(sum(shape) + eps)
    g = rs.randint(0, 256, shape).astype(np.uint8)
    out = X.decode_jpx(X.encode_jpx_97(g, levels=levels, eps=eps))
    assert out.shape == g.shape and out.dtype == np.uint8
    assert np.abs(out.astype(int) - g.astype(int)).max() <= bound


def test_lossy_roundtrip_rgb_ict_bounded():
    rs = np.random.RandomState(9)
    rgb = rs.randint(0, 256, (40, 56, 3)).astype(np.uint8)
    out = X.decode_jpx(X.encode_jpx_97(rgb, levels=2))
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 2


def test_lossy_smooth_content_compresses_harder():
    """Coarser quantization strictly shrinks the codestream on smooth
    content (the point of the lossy path)."""
    r = np.arange(96)[:, None]
    c = np.arange(96)[None, :]
    g = ((r + c) // 2).astype(np.uint8)
    fine = X.encode_jpx_97(g, levels=3, eps=16)
    coarse = X.encode_jpx_97(g, levels=3, eps=9)
    assert len(coarse) < len(fine)
    out = X.decode_jpx(coarse)
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 4


def test_lossy_qcd_cod_consistency_is_enforced():
    """9/7 codestreams must carry style-2 QCD with one SPqcd per
    band; mismatches raise rather than misdecode."""
    g = np.zeros((16, 16), np.uint8)
    import struct

    blob = bytearray(X.encode_jpx_97(g, levels=2))
    # locate QCD (ff 5c) and corrupt its style to 0
    i = blob.find(b"\xff\x5c")
    assert i > 0
    sqcd = blob[i + 4]
    blob[i + 4] = sqcd & 0xE0  # style 0, keep guard bits
    with pytest.raises(ValueError, match="scalar-expounded"):
        X.decode_jpx(bytes(blob))
    # truncate one SPqcd entry: count disagrees with COD levels
    blob2 = bytearray(X.encode_jpx_97(g, levels=2))
    i = blob2.find(b"\xff\x5c")
    (ln,) = struct.unpack(">H", blob2[i + 2 : i + 4])
    del blob2[i + ln : i + ln + 2]  # drop last entry bytes
    blob2[i + 2 : i + 4] = struct.pack(">H", ln - 2)
    with pytest.raises(ValueError, match="entry count"):
        X.decode_jpx(bytes(blob2))


def test_reversible_and_lossy_paths_coexist():
    """Wavelet byte routes the codestream: 5/3 stays bit-exact, 9/7
    through the same tile machinery stays bounded."""
    rs = np.random.RandomState(21)
    g = rs.randint(0, 256, (48, 48)).astype(np.uint8)
    assert np.array_equal(X.decode_jpx(X.encode_jpx(g)), g)
    out = X.decode_jpx(X.encode_jpx_97(g))
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 1
