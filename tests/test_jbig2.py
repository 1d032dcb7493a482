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
    assert [t for t, _ in segs] == [48, 38, 49]
    # re-serialize: globals = page info; data = region + end-of-page
    def seg(num, stype, payload):
        return J._segment(num, stype, payload)

    gl = seg(0, 48, segs[0][1])
    da = seg(1, 38, segs[1][1]) + seg(2, 49, b"")
    out = J.decode_jbig2(da, gl)
    assert (out["bits"] == bits).all()
    with pytest.raises(ValueError, match="page information"):
        J.decode_jbig2(da)  # region with no page info anywhere


def test_jbig2_hostiles_are_valueerror():
    bits = _bits(8, 16, 0.4)
    good = J.build_jbig2(bits)
    with pytest.raises(ValueError, match="truncated"):
        J.decode_jbig2(good[:10])
    # symbol-dictionary segment type: loud with the type named
    bad = bytearray(good)
    bad[4] = 0  # first segment type 48 -> 0
    with pytest.raises(ValueError, match="segment type 0"):
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
