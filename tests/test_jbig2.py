"""JBIG2 generic region (ITU-T T.88) — r15.

The MQ-coder table is the spec-printed Table E.1; decode paths are
pinned by pixel-exact round-trips through the dual MQ encoder, by the
CCITT G4 cross-check for the MMR route (an independent, separately
verified codec), and by structural invariants of the table itself.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from rawdata_client_provider_gcs_spark.operators import rawjbig2 as J


def _bits(h, w, p, seed=0):
    return (np.random.RandomState(seed or h * w + 1).rand(h, w) < p) \
        .astype(np.uint8)


def test_mq_table_structure():
    """47 states; transitions in range; Qe halves toward certainty
    along the main chain; SWITCH only on the three MPS-flip states."""
    assert len(J.MQ_TABLE) == 47
    for i, (qe, nmps, nlps, sw) in enumerate(J.MQ_TABLE):
        assert 0 < qe <= 0x5601 and 0 <= nmps <= 46 and 0 <= nlps <= 46
    assert [i for i, t in enumerate(J.MQ_TABLE) if t[3]] == [0, 6, 14]
    chain = [J.MQ_TABLE[i][0] for i in range(14, 46)]
    assert chain == sorted(chain, reverse=True)
    assert J.MQ_TABLE[45][0] == 0x0001  # most-confident state
    assert J.MQ_TABLE[46] == (0x5601, 46, 46, 0)  # non-adaptive state


def test_mq_roundtrip_fuzz():
    rnd = random.Random(3)
    for _ in range(25):
        n = rnd.randint(1, 3000)
        ncx = rnd.randint(1, 16)
        p1 = rnd.choice([0.02, 0.3, 0.5, 0.8, 0.98])
        seq = [(1 if rnd.random() < p1 else 0, rnd.randrange(ncx))
               for _ in range(n)]
        e = J.MQEncoder()
        ei, em = [0] * ncx, [0] * ncx
        for b, c in seq:
            e.encode(b, ei, em, c)
        blob = e.flush()
        d = J.MQDecoder(blob)
        di, dm = [0] * ncx, [0] * ncx
        assert [d.decode(di, dm, c) for _, c in seq] == [b for b, _ in seq]
        assert (ei, em) == (di, dm)  # adaptation walks the same path


def test_mq_skewed_compresses():
    rnd = random.Random(5)
    n = 8000
    seq = [1 if rnd.random() < 0.01 else 0 for _ in range(n)]
    e = J.MQEncoder()
    ei, em = [0], [0]
    for b in seq:
        e.encode(b, ei, em, 0)
    assert len(e.flush()) * 8 < n * 0.25


@pytest.mark.parametrize("template", [0, 1, 2, 3])
@pytest.mark.parametrize("tpgdon", [False, True])
def test_generic_region_roundtrip(template, tpgdon):
    for h, w, p in ((8, 16, 0.3), (20, 33, 0.05), (5, 5, 0.9),
                    (1, 7, 0.5), (16, 8, 0.0)):
        bits = _bits(h, w, p)
        blob = J.encode_generic_region(bits, template, None, tpgdon)
        got = J.decode_generic_region(blob, w, h, template, None, tpgdon)
        assert (got == bits).all(), (template, tpgdon, h, w, p)


def test_generic_region_custom_at_pixels():
    bits = _bits(12, 19, 0.4)
    for template in range(4):
        at = [(1, -1)] + [(-2, -1), (1, -2), (-1, -2)][
            : len(J.NOMINAL_AT[template]) - 1
        ]
        blob = J.encode_generic_region(bits, template, at, True)
        got = J.decode_generic_region(blob, 19, 12, template, at, True)
        assert (got == bits).all(), template
        # a decoder given the WRONG AT pixels must not reproduce it
        wrong = J.decode_generic_region(blob, 19, 12, template, None, True)
        assert not (wrong == bits).all(), template


def test_tpgdon_actually_compresses_repeated_rows():
    bits = np.tile(_bits(1, 64, 0.5, seed=7), (64, 1))  # 64 equal rows
    plain = J.encode_generic_region(bits, 0, None, False)
    typical = J.encode_generic_region(bits, 0, None, True)
    assert len(typical) < len(plain) / 3
    got = J.decode_generic_region(typical, 64, 64, 0, None, True)
    assert (got == bits).all()


def test_embedded_stream_and_composition():
    bits = _bits(24, 40, 0.2)
    for kw in (dict(), dict(template=2, tpgdon=True), dict(mmr=True),
               dict(template=3), dict(x=5, y=3, page_size=(60, 40)),
               dict(combop=4)):
        out = J.decode_jbig2(J.build_jbig2(bits, **kw))
        x, y = kw.get("x", 0), kw.get("y", 0)
        assert (out["bits"][y : y + 24, x : x + 40] == bits).all(), kw
    # XNOR onto a default-1 page inverts the region
    out = J.decode_jbig2(J.build_jbig2(bits, combop=3, default_pixel=1))
    assert (out["bits"] == 1 - (1 ^ bits)).all()


def test_mmr_route_matches_ccitt():
    """MMR generic regions are T.6 — decoded by the independently
    verified CCITT codec, a genuine cross-implementation check."""
    from rawdata_client_provider_gcs_spark.operators import rawccitt

    bits = _bits(16, 48, 0.15)
    blob = J.build_jbig2(bits, mmr=True)
    got = J.decode_jbig2(blob)["bits"]
    assert (got == bits).all()
    assert (np.asarray(rawccitt.decode_g4(rawccitt.encode_g4(bits),
                                          48, 16)) == bits).all()


def test_jbig2_globals_stream_split():
    """PDF /JBIG2Globals: the page-information segment may live in the
    globals stream while the region arrives in the image stream."""
    bits = _bits(8, 16, 0.4)
    full = J.build_jbig2(bits)
    segs = list(J._segments(full))
    assert [t for _n, t, _r, _p in segs] == [48, 38, 49]
    # re-serialize: globals = page info; data = region + end-of-page
    def seg(num, stype, payload):
        return J._segment(num, stype, payload)

    gl = seg(0, 48, segs[0][3])
    da = seg(1, 38, segs[1][3]) + seg(2, 49, b"")
    out = J.decode_jbig2(da, gl)
    assert (out["bits"] == bits).all()
    with pytest.raises(ValueError, match="page information"):
        J.decode_jbig2(da)  # region with no page info anywhere


def test_jbig2_hostiles_are_valueerror():
    bits = _bits(8, 16, 0.4)
    good = J.build_jbig2(bits)
    with pytest.raises(ValueError, match="truncated"):
        J.decode_jbig2(good[:10])
    # an unassigned segment type is loud with the type named
    bad = bytearray(good)
    bad[4] = 44  # first segment type 48 -> 44 (unassigned)
    with pytest.raises(ValueError, match="segment type 44"):
        J.decode_jbig2(bytes(bad))
    # lying data length
    bad = bytearray(good)
    bad[7:11] = (1 << 30).to_bytes(4, "big")
    with pytest.raises(ValueError):
        J.decode_jbig2(bytes(bad))
    # region outside the page
    with pytest.raises(ValueError, match="outside the page"):
        J.decode_jbig2(J.build_jbig2(bits, x=100, page_size=(50, 8)))
    # garbage MQ data must land on ValueError or decode to *something*
    # bounded, never crash
    rnd = random.Random(11)
    for _ in range(50):
        blob = bytes(rnd.randrange(256) for _ in range(rnd.randint(1, 80)))
        try:
            J.decode_jbig2(blob)
        except ValueError:
            pass


def test_pdf_jbig2_route_and_globals():
    from rawdata_client_provider_gcs_spark.operators import rawpdf

    BITS = np.zeros((8, 16), np.uint8)
    BITS[:3] = 1
    pdf = rawpdf.encode_pdf([["scan"]], images=[[
        {"kind": "jbig2", "bits": BITS},
        {"kind": "jbig2", "bits": BITS, "template": 1, "tpgdon": True},
        {"kind": "jbig2", "bits": BITS, "mmr": True},
    ]])
    out = rawpdf.extract_pdf_images(pdf)
    expect = ((1 - BITS) * 255).astype(np.uint8)
    assert len(out["images"]) == 3
    for im in out["images"]:
        assert im["error"] is None
        assert im["filter"] == "JBIG2Decode"
        assert (im["pixels"] == expect).all()
    assert rawpdf.extract_pdf(pdf)["pages"] == ["scan"]
    # a corrupt JBIG2 payload is a per-image error row, not a crash:
    # repaint one stream's segment headers with garbage of equal length
    single = rawpdf.encode_pdf(
        [["scan"]], images=[[{"kind": "jbig2", "bits": BITS},
                             {"kind": "gray", "array": np.full(
                                 (4, 4), 9, np.uint8)}]]
    )
    blob = J.build_jbig2(BITS)
    bad = single.replace(blob, bytes(len(blob)), 1)
    out = rawpdf.extract_pdf_images(bad)
    errs = [im for im in out["images"] if im["error"]]
    oks = [im for im in out["images"] if not im["error"]]
    assert len(errs) == 1 and "jbig2" in errs[0]["error"]
    assert len(oks) == 1  # the sibling image still lands


def test_current_row_at_pixel_uses_general_path():
    """A causal AT pixel ON the current row (dy=0, dx<0) can't use the
    sliding-register fast path; the general gather must keep round-
    tripping (and differ from the nominal-AT stream)."""
    bits = _bits(12, 30, 0.35)
    for template in (1, 2, 3):
        at = [(-3, 0)]
        blob = J.encode_generic_region(bits, template, at, False)
        got = J.decode_generic_region(blob, 30, 12, template, at, False)
        assert (got == bits).all(), template


# ---------------------------------------------------------------------------
# Symbol dictionaries + text regions (r15)
# ---------------------------------------------------------------------------


def test_ia_integer_roundtrip_all_buckets():
    """Annex-A integer coding across every bucket boundary + OOB."""
    vals = [0, 1, -1, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436,
            70000, -70000, J.OOB, -4435, J.OOB]
    enc = J.MQEncoder()
    cx = J.IntCtx()
    for v in vals:
        J._ia_encode(enc, cx, v)
    dec = J.MQDecoder(enc.flush())
    cx2 = J.IntCtx()
    got = [J._ia_decode(dec, cx2) for _ in vals]
    assert all((a is J.OOB) == (b is J.OOB) and (a is J.OOB or a == b)
               for a, b in zip(got, vals))
    assert (cx.icx, cx.mps) == (cx2.icx, cx2.mps)


def test_symbol_dict_roundtrip_mixed_heights():
    rs = np.random.RandomState(4)
    glyphs = [(rs.rand(h, w) < 0.5).astype(np.uint8)
              for h, w in ((9, 5), (7, 4), (12, 6), (7, 5), (5, 3))]
    payload, order = J.encode_symbol_dict(glyphs)
    got = J.decode_symbol_dict(payload, [])
    assert len(got) == len(glyphs)
    for k, orig in enumerate(order):
        assert (got[k] == glyphs[orig]).all()


def test_symbol_dict_input_symbols_and_export_runs():
    """A dictionary may import referred symbols and re-export a
    subset mixed with its new ones."""
    rs = np.random.RandomState(6)
    ins = [(rs.rand(6, 4) < 0.5).astype(np.uint8) for _ in range(3)]
    new = [(rs.rand(8, 5) < 0.5).astype(np.uint8) for _ in range(2)]
    payload, order = J.encode_symbol_dict(new, n_input=len(ins))
    got = J.decode_symbol_dict(payload, ins)
    # imports not re-exported; the two new symbols are
    assert len(got) == 2
    for k, orig in enumerate(order):
        assert (got[k] == new[orig]).all()
    # a run table sized for imports is loud without them
    with pytest.raises(ValueError, match="export"):
        J.decode_symbol_dict(payload, [])


def test_text_region_all_refcorners_and_multiline():
    rs = np.random.RandomState(7)
    glyphs = [(rs.rand(h, w) < 0.5).astype(np.uint8)
              for h, w in ((7, 5), (7, 4), (9, 6), (5, 3))]
    payload, order = J.encode_symbol_dict(glyphs)
    ordered = J.decode_symbol_dict(payload, [])
    placements = [(0, 2, 1), (1, 9, 3), (2, 15, 0), (3, 23, 4),
                  (0, 2, 12), (2, 10, 11)]
    for rc in range(4):
        tr = J.encode_text_region(placements, ordered, 32, 22,
                                  refcorner=rc)
        region, x, y, op = J.decode_text_region(tr, ordered)
        expect = np.zeros((22, 32), np.uint8)
        for sid, x0, y0 in placements:
            hi, wi = ordered[sid].shape
            expect[y0 : y0 + hi, x0 : x0 + wi] |= ordered[sid]
        assert (region == expect).all(), rc


def test_jbig2_text_end_to_end_and_globals_split():
    text = "the quick brown fox\njumps over jbig2"
    blob = J.build_jbig2_text(text)
    out = J.decode_jbig2(blob)
    expect = np.zeros((out["height"], out["width"]), np.uint8)
    for row, line in enumerate(text.split("\n")):
        for col, c in enumerate(line):
            if not c.isspace():
                expect[2 + 10 * row : 10 + 10 * row,
                       2 + 6 * col : 7 + 6 * col] |= J.glyph_bitmap(c)
    assert (out["bits"] == expect).all()
    # the PDF layout: symbol dictionary in /JBIG2Globals, text region
    # in the image stream
    segs = list(J._segments(blob))
    gl = J._segment(0, 48, segs[0][3]) + J._segment(1, 0, segs[1][3])
    da = J._segment(2, 6, segs[2][3], refs=(1,)) + J._segment(3, 49,
                                                              b"")
    out2 = J.decode_jbig2(da, gl)
    assert (out2["bits"] == expect).all()


def test_text_region_hostiles():
    rs = np.random.RandomState(8)
    glyphs = [(rs.rand(6, 4) < 0.5).astype(np.uint8)]
    payload, _ = J.encode_symbol_dict(glyphs)
    syms = J.decode_symbol_dict(payload, [])
    tr = J.encode_text_region([(0, 2, 2)], syms, 12, 10)
    # no symbols at all
    with pytest.raises(ValueError, match="no symbols"):
        J.decode_text_region(tr, [])
    # huffman flag is loud
    bad = bytearray(tr)
    bad[17] |= 0x01 >> 0  # tflags high byte: huffman is bit 0 of u16
    bad = bytearray(tr)
    bad[18] |= 0x01
    with pytest.raises(ValueError, match="Huffman"):
        J.decode_text_region(bytes(bad), syms)
    # placement past the region edge clips (pdf.js behavior) — fully
    # outside leaves the region untouched, partial overhang keeps the
    # in-bounds slice
    tr2 = J.encode_text_region([(0, 50, 2)], syms, 12, 10)
    out2, *_ = J.decode_text_region(tr2, syms)
    assert out2.sum() == 0
    tr3 = J.encode_text_region([(0, 10, 2)], syms, 12, 10)
    out3, *_ = J.decode_text_region(tr3, syms)
    assert (out3[2:8, 10:12] == glyphs[0][:, :2]).all()
    assert out3[:, :10].sum() == 0
    # symbol dict hostiles: huffman/refinement flags
    bad = bytearray(payload)
    bad[1] |= 1
    with pytest.raises(ValueError, match="Huffman"):
        J.decode_symbol_dict(bytes(bad), [])
    bad = bytearray(payload)
    bad[1] |= 2
    with pytest.raises(ValueError, match="refinement"):
        J.decode_symbol_dict(bytes(bad), [])


def test_pdf_jbig2_sym_route():
    from rawdata_client_provider_gcs_spark.operators import rawpdf

    g1 = np.ones((8, 5), np.uint8)
    g2 = np.ones((4, 3), np.uint8)
    pdf = rawpdf.encode_pdf([["x"]], images=[[{
        "kind": "jbig2_sym", "size": (16, 8),
        "glyphs": [g1, g2],
        "placements": [(0, 1, 0), (1, 9, 2)],
    }]])
    im = rawpdf.extract_pdf_images(pdf)["images"][0]
    assert im["error"] is None
    assert int((im["pixels"] == 0).sum()) == 8 * 5 + 4 * 3


# ---------------------------------------------------------------------------
# Pattern dictionaries + halftone regions, file organization (r15)
# ---------------------------------------------------------------------------


def test_pattern_dict_roundtrip():
    rs = np.random.RandomState(6)
    pats = [(rs.rand(6, 5) < (k + 1) / 8).astype(np.uint8)
            for k in range(7)]
    got = J.decode_pattern_dict(J.encode_pattern_dict(pats))
    assert len(got) == 7
    assert all((a == b).all() for a, b in zip(got, pats))
    with pytest.raises(ValueError, match="MMR"):
        bad = bytearray(J.encode_pattern_dict(pats))
        bad[0] |= 1
        J.decode_pattern_dict(bytes(bad))


def test_halftone_region_roundtrip_and_gaps():
    rs = np.random.RandomState(6)
    pats = [(rs.rand(5, 5) < (k + 1) / 8).astype(np.uint8)
            for k in range(7)]
    gray = rs.randint(0, 7, (9, 12))
    region, x, y, op = J.decode_halftone_region(
        J.encode_halftone_region(gray, pats), pats
    )
    expect = np.zeros((45, 60), np.uint8)
    for m in range(9):
        for n in range(12):
            expect[m * 5 : (m + 1) * 5, n * 5 : (n + 1) * 5] |= \
                pats[gray[m, n]]
    assert (region == expect).all()
    # non-square patterns on the square pitch leave gaps but roundtrip
    pats2 = [(rs.rand(4, 6) < 0.4).astype(np.uint8) for _ in range(4)]
    gray2 = rs.randint(0, 4, (5, 7))
    region2, *_ = J.decode_halftone_region(
        J.encode_halftone_region(gray2, pats2), pats2
    )
    expect2 = np.zeros((30, 42), np.uint8)
    for m in range(5):
        for n in range(7):
            expect2[m * 6 : m * 6 + 4, n * 6 : n * 6 + 6] |= \
                pats2[gray2[m, n]]
    assert (region2 == expect2).all()


def test_halftone_end_to_end_and_file_org():
    rs = np.random.RandomState(8)
    pats = [(rs.rand(4, 4) < (k + 1) / 6).astype(np.uint8)
            for k in range(5)]
    gray = rs.randint(0, 5, (6, 8))
    blob = J.build_jbig2_halftone(gray, pats)
    out = J.decode_jbig2(blob)
    expect = np.zeros((24, 32), np.uint8)
    for m in range(6):
        for n in range(8):
            expect[m * 4 : (m + 1) * 4, n * 4 : (n + 1) * 4] |= \
                pats[gray[m, n]]
    assert (out["bits"] == expect).all()
    # standalone file organization, both page-count shapes
    f = J._FILE_MAGIC + bytes([1]) + (1).to_bytes(4, "big") + blob
    assert (J.decode_jbig2_file(f)["bits"] == expect).all()
    f2 = J._FILE_MAGIC + bytes([3]) + blob
    assert (J.decode_jbig2_file(f2)["bits"] == expect).all()
    with pytest.raises(ValueError, match="random-access"):
        J.decode_jbig2_file(J._FILE_MAGIC + bytes([0]) + blob)
    with pytest.raises(ValueError, match="magic"):
        J.decode_jbig2_file(blob)
    # hostile: HENABLESKIP and gray values past the dictionary
    ht = bytearray(J.encode_halftone_region(gray, pats))
    ht[17] |= 8
    with pytest.raises(ValueError, match="HENABLESKIP"):
        J.decode_halftone_region(bytes(ht), pats)
    with pytest.raises(ValueError, match="no patterns"):
        J.decode_halftone_region(
            J.encode_halftone_region(gray, pats), []
        )


def test_classify_routes_standalone_jb2():
    from rawdata_client_provider_gcs_spark.sources.classify import (
        classify_payload)

    bits = _bits(8, 8, 0.4)
    f = J._FILE_MAGIC + bytes([3]) + J.build_jbig2(bits)
    r = classify_payload(f)
    assert (r["format"], r["category"]) == ("jbig2", "image")
    assert (J.decode_jbig2_file(f)["bits"] == bits).all()


def test_unknown_height_page_grows_on_demand():
    """T.88 §7.4.8.2 striped pages: page height 0xFFFFFFFF means the
    page grows as stripes arrive — a later region below the current
    extent must compose, not raise (r15 ADVICE)."""
    import struct

    rs = np.random.RandomState(21)
    top = (rs.rand(4, 8) < 0.5).astype(np.uint8)
    bot = (rs.rand(4, 8) < 0.5).astype(np.uint8)
    page_info = (struct.pack(">IIII", 8, 0xFFFFFFFF, 0, 0)
                 + bytes([0]) + struct.pack(">H", 0))
    blob = J._segment(0, 48, page_info)

    def region(num, bits, y):
        h, w = bits.shape
        payload = struct.pack(">IIII", w, h, 0, y) + bytes([0, 0])
        for ax, ay in J.NOMINAL_AT[0]:
            payload += struct.pack("bb", ax, ay)
        payload += J.encode_generic_region(bits, 0, list(J.NOMINAL_AT[0]),
                                           False)
        return J._segment(num, 38, payload)

    blob += region(1, top, 0) + region(2, bot, 10) + J._segment(3, 49, b"")
    out = J.decode_jbig2(blob)
    assert out["height"] == 14 and out["width"] == 8
    assert (out["bits"][0:4] == top).all()
    assert (out["bits"][10:14] == bot).all()
    assert out["bits"][4:10].sum() == 0
    # a KNOWN page height stays a hard bound
    with pytest.raises(ValueError, match="outside the page"):
        J.decode_jbig2(J.build_jbig2(top, y=100, page_size=(8, 50)))


@pytest.mark.parametrize("template", [0, 1])
@pytest.mark.parametrize("tpgron", [False, True])
def test_refinement_region_roundtrip(template, tpgron):
    """§6.3 generic refinement: pixel-exact round-trips through the
    dual MQ encoder, across both templates and TPGRON, with the
    refined image a small perturbation of the reference (the shape
    refinement exists for)."""
    rs = np.random.RandomState(13 + template + 2 * tpgron)
    for h, w in ((8, 16), (21, 9), (1, 5), (33, 33)):
        base = (rs.rand(h, w) < 0.4).astype(np.uint8)
        refined = base.copy()
        flips = rs.rand(h, w) < 0.07
        refined[flips] ^= 1
        payload = J.encode_refinement_region(
            refined, ref=base, template=template, tpgron=tpgron)
        bits, x, y, combop = J.decode_refinement_region(payload, base)
        assert (bits == refined).all(), (template, tpgron, h, w)
        assert (x, y, combop) == (0, 0, 4)


def test_refinement_tpgron_mixed_typical_rows():
    """TPGRON row mix: rows that are reference-typical alternate with
    rows that differ near a uniform window — the LTP flag must flip
    correctly in both directions and stay pixel-exact.  (Size-wise the
    plain path is competitive on identical copies — the reference
    center pixel sits in the context, so MPS adaptation is near-free —
    which is why this pins correctness, not compression.)"""
    base = np.zeros((24, 40), np.uint8)
    base[4:20, 8:30] = 1
    refined = base.copy()
    refined[6, 2] = 1    # flip inside an all-zero (typical) window
    refined[10, 12] = 0  # flip inside an all-one (typical) window
    for tpgron in (False, True):
        payload = J.encode_refinement_region(refined, ref=base,
                                             tpgron=tpgron)
        bits, *_ = J.decode_refinement_region(payload, base)
        assert (bits == refined).all(), tpgron
    # identical copy stays exact under TPGRON and does not blow up
    typ = J.encode_refinement_region(base, ref=base, tpgron=True)
    plain = J.encode_refinement_region(base, ref=base, tpgron=False)
    assert len(typ) <= len(plain) + 8
    bits, *_ = J.decode_refinement_region(typ, base)
    assert (bits == base).all()


def test_refinement_embedded_stream_page_reference():
    """Immediate refinement regions (type 41) take the page under the
    region box as their reference and REPLACE it."""
    rs = np.random.RandomState(7)
    base = (rs.rand(16, 24) < 0.35).astype(np.uint8)
    refined = base.copy()
    refined[rs.rand(16, 24) < 0.1] ^= 1
    for template in (0, 1):
        for tpgron in (False, True):
            blob = J.build_jbig2_refinement(
                base, refined, template=template, tpgron=tpgron)
            out = J.decode_jbig2(blob)
            assert (out["bits"] == refined).all(), (template, tpgron)
    # standalone-file carriage too
    f = J._FILE_MAGIC + bytes([3]) + J.build_jbig2_refinement(base,
                                                              refined)
    assert (J.decode_jbig2_file(f)["bits"] == refined).all()


def test_refinement_intermediate_region_reference():
    """An intermediate refinement region (type 40) is stored, not
    composed; a later refinement segment referring to it uses it as
    the reference bitmap."""
    import struct

    rs = np.random.RandomState(9)
    a = (rs.rand(10, 12) < 0.4).astype(np.uint8)
    b = a.copy()
    b[rs.rand(10, 12) < 0.15] ^= 1
    page_info = struct.pack(">IIII", 12, 10, 0, 0) + bytes([0]) \
        + struct.pack(">H", 0)
    blob = J._segment(0, 48, page_info)
    # intermediate: refine an all-zero page slice into `a`, stored
    blob += J._segment(1, 40, J.encode_refinement_region(a))
    # immediate: refine the stored `a` into `b`, replacing the page
    blob += J._segment(2, 41, J.encode_refinement_region(b, ref=a),
                       refs=(1,))
    blob += J._segment(3, 49, b"")
    out = J.decode_jbig2(blob)
    assert (out["bits"] == b).all()


def test_refinement_hostiles():
    rs = np.random.RandomState(2)
    base = (rs.rand(6, 6) < 0.5).astype(np.uint8)
    good = J.encode_refinement_region(base, ref=base)
    with pytest.raises(ValueError, match="short refinement"):
        J.decode_refinement_region(good[:10], base)
    bad = bytearray(good)
    bad[17] |= 4  # reserved flag bit
    with pytest.raises(ValueError, match="reserved refinement"):
        J.decode_refinement_region(bytes(bad), base)
    with pytest.raises(ValueError, match="shape disagrees"):
        J.decode_refinement_region(good, base[:4])
    with pytest.raises(ValueError, match="AT pixels"):
        J.encode_refinement_region(base, ref=base, template=1,
                                   at=((-1, -1), (-1, -1)))
