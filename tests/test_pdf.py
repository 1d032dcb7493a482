"""PDF codec tests: roundtrip across layouts, grammar edges, hostile
bytes, bomb guard, and the Spark per-page extraction wrapper."""

import random
import zlib

import pytest

from rawdata_client_provider_gcs_spark.operators import multimodal, rawpdf

PAGES = [
    ["Hello (world) \\ backslash", "second line"],
    ["page two only line"],
]
FLAT = ["Hello (world) \\ backslash\nsecond line", "page two only line"]


@pytest.mark.parametrize(
    "enc",
    [
        lambda p: rawpdf.encode_pdf(p, compress=True),
        lambda p: rawpdf.encode_pdf(p, compress=False),
        rawpdf.encode_pdf_modern,
    ],
    ids=["classic-flate", "classic-plain", "modern-objstm-xrefstream"],
)
def test_roundtrip_layouts(enc):
    out = rawpdf.extract_pdf(enc(PAGES))
    assert out["n_pages"] == 2
    assert out["pages"] == FLAT


def test_producer_metadata():
    out = rawpdf.extract_pdf(rawpdf.encode_pdf(PAGES, producer="unit (x)"))
    assert out["producer"] == "unit (x)"


def test_broken_startxref_falls_back_to_scan():
    buf = bytearray(rawpdf.encode_pdf(PAGES))
    i = buf.rfind(b"startxref")
    buf[i + 10 : i + 12] = b"99"  # xref offset now points into a stream
    assert rawpdf.extract_pdf(bytes(buf))["pages"] == FLAT


def test_string_grammar_edges():
    # hex strings, octal escapes, line continuation, UTF-16BE
    body = (
        b"BT "
        b"<48656C6C6F> Tj "  # hex 'Hello'
        b"(\\101\\102) Tj "  # octal 'AB'
        b"(a\\\nb) Tj "  # line continuation joins
        b"(\xfe\xff\x00Z\x00!) Tj "  # UTF-16BE 'Z!'
        b"ET"
    )
    assert rawpdf._page_text(body) == "HelloABabZ!"


def test_tj_array_and_line_ops():
    body = b"BT [(ab) -120 (cd)] TJ 0 -14 Td (next) Tj T* (last) ' ET"
    assert rawpdf._page_text(body) == "abcd\nnext\nlast"


def test_name_hash_escape_and_nested_dict():
    lex = rawpdf._Lexer(b"<< /A#42 [1 2.5 /N] /D << /K (v) >> /R 3 0 R >>")
    d = lex.parse_object()
    assert d["AB"] == [1, 2.5, "N"]
    assert d["D"]["K"] == b"v"
    assert isinstance(d["R"], rawpdf._Ref) and d["R"].num == 3


def test_incremental_update_overrides_page():
    """An appended update replacing the page content must win."""
    base = rawpdf.encode_pdf([["old text"]])
    # find object number of the content stream (object 1 by construction)
    new_stream = b"BT /F1 12 Tf 72 720 Td (new text) Tj ET"
    add = bytearray()
    off0 = len(base)
    add += b"1 0 obj\n<< /Length %d >>\nstream\n" % len(new_stream)
    add += new_stream + b"\nendstream\nendobj\n"
    xref_off = off0 + len(add)
    prev = int(base.rsplit(b"startxref", 1)[1].split()[0])
    add += b"xref\n1 1\n%010d 00000 n \n" % off0
    add += (
        b"trailer\n<< /Size 7 /Root 5 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
        % (prev, xref_off)
    )
    out = rawpdf.extract_pdf(base + bytes(add))
    assert out["pages"] == ["new text"]


def test_flate_bomb_is_rejected():
    bomb = zlib.compress(b"\x00" * (rawpdf.MAX_STREAM_BYTES + 1), 9)
    with pytest.raises(ValueError, match="cap"):
        rawpdf._flate(bomb)


def test_png_predictor_roundtrip():
    # predictor 12 (PNG Up) over 3 columns, as xref streams emit
    rows = [b"\x02" + bytes([1, 2, 3]), b"\x02" + bytes([10, 20, 30])]
    data = b"".join(rows)
    out = rawpdf._unpredict(data, 12, 3, 1, 8)
    assert out == bytes([1, 2, 3, 11, 22, 33])


def test_type0_font_rejected_loudly():
    buf = rawpdf.encode_pdf(PAGES).replace(b"/Subtype /Type1", b"/Subtype /Type0")
    with pytest.raises(ValueError, match="Type0"):
        rawpdf.extract_pdf(buf)


def test_encrypted_rejected_loudly():
    buf = rawpdf.encode_pdf(PAGES).replace(
        b"/Root", b"/Encrypt 1 0 R /Root"
    )
    with pytest.raises(ValueError, match="encrypted"):
        rawpdf.extract_pdf(buf)


def test_not_a_pdf():
    with pytest.raises(ValueError, match="%PDF"):
        rawpdf.extract_pdf(b"GIF89a not a pdf")


@pytest.mark.parametrize("seed", range(6))
def test_kernel_never_raises_uncatchable(seed):
    """Truncation / bit flips / splices must land on ValueError, never
    an uncatchable or non-Exception error (same bar as the image
    codecs' fuzz suite)."""
    rng = random.Random(seed)
    for base in (rawpdf.encode_pdf(PAGES), rawpdf.encode_pdf_modern(PAGES)):
        for _ in range(150):
            buf = bytearray(base)
            mode = rng.randrange(3)
            if mode == 0:
                buf = buf[: rng.randrange(1, len(buf))]
            elif mode == 1:
                for _ in range(rng.randrange(1, 6)):
                    buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
            else:
                i = rng.randrange(len(buf))
                del buf[i : min(len(buf), i + rng.randrange(1, 64))]
            try:
                rawpdf.extract_pdf(bytes(buf))
            except ValueError:
                pass


def test_decodeparms_null_and_array_forms():
    """/DecodeParms may be a single dict, an array aligned with
    /Filter, or null entries meaning defaults (ISO 32000 §7.3.8.2) —
    all must decode, none may crash."""
    base = rawpdf.encode_pdf([["parms shapes"]])
    for variant in (
        b"/Filter /FlateDecode /DecodeParms null ",
        b"/Filter [/FlateDecode] /DecodeParms [null] ",
        b"/Filter [/FlateDecode] ",
    ):
        buf = base.replace(b"/Filter /FlateDecode ", variant)
        assert rawpdf.extract_pdf(buf)["pages"] == ["parms shapes"]


def test_objstm_self_cycle_is_valueerror():
    """An xref entry claiming an ObjStm lives inside itself must land
    on ValueError, not RecursionError."""
    buf = rawpdf.encode_pdf_modern([["cycle"]])
    doc = rawpdf._Document(buf)
    objstm_num = next(n for n, e in doc.xref.items() if doc.xref.get(n, ("",))[0] == "n" and isinstance(doc.get(n), rawpdf._Stream) and doc.get(n).dict.get("Type") == "ObjStm")
    fresh = rawpdf._Document(buf)
    fresh.xref[objstm_num] = ("c", objstm_num, 0)
    fresh._cache.clear()
    with pytest.raises(ValueError, match="cycle"):
        fresh.get(objstm_num)


def test_type0_inherited_resources_rejected():
    """/Resources with a Type0 font hoisted to the /Pages parent (an
    inheritable attribute) must still trip the CID loud boundary."""
    buf = rawpdf.encode_pdf(PAGES).replace(b"/Subtype /Type1", b"/Subtype /Type0")
    # hoist: strip per-page Resources, attach them to the Pages node
    res = b"/Resources << /Font << /F1 %d 0 R >> >>"
    import re as _re

    m = _re.search(rb"/Resources << /Font << /F1 (\d+) 0 R >> >> ", buf)
    assert m
    fnum = int(m.group(1))
    hoisted = buf.replace(res % fnum + b" ", b"")
    hoisted = hoisted.replace(
        b"<< /Type /Pages ", b"<< /Type /Pages " + (res % fnum) + b" "
    )
    # offsets in the xref are now stale -> the scan fallback recovers;
    # the point under test is the inherited-resources check, which must
    # fire before any text is emitted
    with pytest.raises(ValueError, match="Type0"):
        rawpdf.extract_pdf(hoisted)


def test_zip_truncated_central_directory_is_valueerror():
    from rawdata_client_provider_gcs_spark.sources import archive as A

    z = bytearray(A.build_zip([("doc/x.txt", b"payload")]))
    eocd = bytes(z).rfind(b"PK\x05\x06")
    # point cd_off just before the EOCD at a planted CDH signature so
    # the fixed-size unpacks would run out of buffer
    import struct as _struct

    cd_off = eocd - 4
    patched = (
        bytes(z[:cd_off])
        + b"PK\x01\x02"
        + bytes(z[cd_off + 4 : eocd + 16])
        + _struct.pack("<I", cd_off)
        + bytes(z[eocd + 20 :])
    )
    with pytest.raises(ValueError):
        A.parse_zip(patched)


def test_spark_pdf_text_null_payload_survives(spark):
    good = rawpdf.encode_pdf([["alive"]])
    rows = [(0, bytearray(good)), (1, None)]
    df = spark.createDataFrame(rows, "doc_id long, pdf binary")
    media = multimodal.with_media_columns(df, "pdf", "application/pdf", "doc_id")
    out = multimodal.pdf_text(media).toPandas().sort_values("doc_id")
    assert list(out[out["doc_id"] == 0]["page_text"]) == ["alive"]
    nulls = out[out["doc_id"] == 1]
    assert len(nulls) == 1 and nulls["error"].str.contains("null").all()


def test_spark_pdf_text_captures_errors_per_row(spark):
    good = rawpdf.encode_pdf([["alpha"], ["beta"]])
    rows = [
        (0, bytearray(good)),
        (1, bytearray(b"%PDF-1.4 garbage with no structure")),
        (2, bytearray(good[: len(good) // 2])),
    ]
    df = spark.createDataFrame(rows, "doc_id long, pdf binary")
    media = multimodal.with_media_columns(df, "pdf", "application/pdf", "doc_id")
    out = multimodal.pdf_text(media).toPandas().sort_values(
        ["doc_id", "page_idx"], na_position="first"
    )
    by_doc = {d: g for d, g in out.groupby("doc_id")}
    assert list(by_doc[0]["page_text"]) == ["alpha", "beta"]
    assert by_doc[0]["error"].isna().all()
    for bad in (1, 2):
        g = by_doc[bad]
        assert len(g) == 1 and g["error"].notna().all()
        assert g["page_text"].isna().all()


def test_pdf_structure_census():
    """Page/outline census, including shapes text extraction refuses."""
    from rawdata_client_provider_gcs_spark.operators.rawpdf import (
        encode_pdf,
        encode_pdf_modern,
        pdf_structure,
    )

    blob = encode_pdf([["a"], ["b"], ["c"]],
                      outlines=["One", "Two"])
    m = pdf_structure(blob)
    assert (m["version"], m["n_pages"], m["n_outlines"],
            m["first_outline"]) == ("1.4", 3, 2, "One")
    assert pdf_structure(encode_pdf_modern([["x"]]))["version"] == "1.5"
    # an /Encrypt trailer entry flips the flag; page count still walks
    enc = blob.replace(b"/Root", b"/Encrypt 1 0 R /Root")
    m2 = pdf_structure(enc)
    assert m2["encrypted"] is True and m2["n_pages"] == 3
    assert m2["first_outline"] == ""  # strings are skipped when encrypted
    # outline loop bomb
    import pytest

    loop = encode_pdf([["a"]], outlines=["A", "B"])
    looped = loop.replace(b"/Parent 5 0 R /Prev 6 0 R", b"/Next 6 0 R", 1)
    try:
        pdf_structure(looped)
    except ValueError:
        pass  # loops land on ValueError, never hang


# ---------------------------------------------------------------------------
# Embedded images (r14)
# ---------------------------------------------------------------------------

import numpy as np  # noqa: E402

GRAY = np.arange(128, dtype=np.uint8).reshape(8, 16)
BITS = np.zeros((8, 16), np.uint8)
BITS[:3] = 1  # top 3 rows black


def _image_specs():
    rgb = np.stack(
        [np.full((8, 16), v, np.uint8) for v in (10, 20, 30)], axis=2
    )
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.tile(np.array([0, 1, 2, 1], np.uint8), (4, 2))
    return [
        [
            {"kind": "gray", "array": GRAY},
            {"kind": "inline_gray", "array": np.full((4, 4), 77, np.uint8)},
        ],
        [
            {"kind": "jpeg", "array": np.full((16, 24, 3), 74, np.uint8)},
            {"kind": "g4", "bits": BITS},
            {"kind": "gray_pred", "array": GRAY},
            {"kind": "rgb", "array": rgb},
            {"kind": "indexed", "array": idx, "palette": pal},
            {"kind": "mask", "bits": BITS},
            {"kind": "mh", "bits": BITS},
            {"kind": "inline_gray_fl", "array": np.full((3, 5), 9, np.uint8)},
            {"kind": "inline_ahx", "array": np.full((2, 2), 200, np.uint8)},
        ],
    ]


@pytest.mark.parametrize(
    "enc", [rawpdf.encode_pdf, rawpdf.encode_pdf_modern],
    ids=["classic", "modern-objstm"],
)
def test_embedded_images_roundtrip_both_layouts(enc):
    """Every XObject/inline image kind decodes pixel-exactly, and text
    extraction is untouched by the embedded images."""
    specs = _image_specs()
    pdf = enc(PAGES, images=specs)
    assert rawpdf.extract_pdf(pdf)["pages"] == FLAT
    out = rawpdf.extract_pdf_images(pdf)
    assert out["n_pages"] == 2
    ims = out["images"]
    assert [im["error"] for im in ims] == [None] * 11
    by_name = {(im["page_idx"], im["name"]): im for im in ims
               if im["kind"] == "xobject"}
    assert np.array_equal(by_name[(0, "Im0")]["pixels"], GRAY)
    # DCT: even constant gray at quality 50 round-trips bit-exactly
    assert np.array_equal(
        by_name[(1, "Im0")]["pixels"], np.full((16, 24, 3), 74, np.uint8)
    )
    # CCITT G4 and MH (EncodedByteAlign): BlackIs1 default false →
    # black rows decode to 0, white to 255
    exp = np.where(BITS == 1, 0, 255).astype(np.uint8)
    assert np.array_equal(by_name[(1, "Im1")]["pixels"], exp)
    assert np.array_equal(by_name[(1, "Im6")]["pixels"], exp)
    assert by_name[(1, "Im1")]["filter"] == "CCITTFaxDecode"
    # PNG Up predictor reproduces the plain gray image
    assert np.array_equal(by_name[(1, "Im2")]["pixels"], GRAY)
    # indexed palette expansion
    assert by_name[(1, "Im4")]["pixels"].shape == (4, 8, 3)
    assert by_name[(1, "Im4")]["pixels"][0, 1].tolist() == [0, 255, 0]
    # image mask: 1-bpc samples through the default /Decode
    assert by_name[(1, "Im5")]["pixels"].dtype == np.uint8
    inl = [im for im in ims if im["kind"] == "inline"]
    assert [im["filter"] for im in inl] == ["", "FlateDecode",
                                            "ASCIIHexDecode"]
    assert int(inl[0]["pixels"].sum()) == 77 * 16
    assert int(inl[1]["pixels"].sum()) == 9 * 15
    assert int(inl[2]["pixels"].sum()) == 200 * 4


def test_image_decode_array_inverts_one_bit():
    """/Decode [1 0] flips a 1-bpc gray image."""
    pdf = rawpdf.encode_pdf([["x"]], images=[[{"kind": "mask",
                                               "bits": BITS}]])
    # patch the object: add an explicit inverted Decode array
    pdf = pdf.replace(b"/ImageMask true", b"/ImageMask true /Decode [1 0]")
    # classic xref offsets shift — the scan fallback must not be needed
    # because the patch is length-preserving only if we rebuild; use
    # the hostile-recovery path instead by breaking startxref
    pdf = pdf.replace(b"startxref", b"startxref % moved", 1)
    out = rawpdf.extract_pdf_images(pdf)
    im = out["images"][0]
    assert im["error"] is None
    exp = np.where(BITS == 1, 0, 255).astype(np.uint8)
    assert np.array_equal(im["pixels"], exp)


def test_hostile_images_are_per_image_errors():
    """A hostile image poisons only its own row: the other images on
    the page still decode and the document still parses."""
    good = {"kind": "gray", "array": GRAY}
    pdf = rawpdf.encode_pdf([["x"]], images=[[good, good]])
    # corrupt the SECOND image object's stream bytes (both objects are
    # identical Flate streams; clobber the last one's data)
    i = pdf.rfind(b"stream\n", 0, pdf.rfind(b"/Subtype /Image"))
    # simpler: swap the second image's filter to an undecodable one
    pdf2 = pdf.replace(b"/Filter /FlateDecode", b"/Filter /JPXDecode\x20\x20", 1)
    out = rawpdf.extract_pdf_images(pdf2)
    errs = [im["error"] for im in out["images"]]
    assert sum(e is None for e in errs) == 1
    # JPX now decodes; flate bytes behind a /JPXDecode tag are a
    # per-image codestream error
    assert any(e and "jpx" in e for e in errs)
    del i


def test_ccitt_k0_unaligned_is_loud():
    pdf = rawpdf.encode_pdf([["x"]], images=[[{"kind": "mh",
                                               "bits": BITS}]])
    pdf = pdf.replace(b"/EncodedByteAlign true", b"                     ")
    out = rawpdf.extract_pdf_images(pdf)
    assert "K=0" in out["images"][0]["error"]


def test_image_bomb_guards():
    pdf = rawpdf.encode_pdf([["x"]], images=[[{"kind": "gray",
                                               "array": GRAY}]])
    big = pdf.replace(b"/Width 16 /Height 8", b"/Width 99999 /Height 9999")
    out = rawpdf.extract_pdf_images(big)
    assert "too large" in out["images"][0]["error"]
    short = pdf.replace(b"/Width 16 /Height 8", b"/Width 160 /Height 80")
    out = rawpdf.extract_pdf_images(short)
    assert "shorter" in out["images"][0]["error"]


def test_bi_inside_string_is_not_an_inline_image():
    """Content with ' BI ' inside a text string must not desync the
    inline-image scan."""
    pdf = rawpdf.encode_pdf([["watch BI /W 1 ID here", "more text"]])
    out = rawpdf.extract_pdf_images(pdf)
    assert out["images"] == []
    assert "watch BI /W 1 ID here" in rawpdf.extract_pdf(pdf)["pages"][0]


def test_truncated_inline_image_is_error_entry():
    content = b"BT (x) Tj ET BI /W 8 /H 8 /BPC 8 /CS /G ID " + b"\x00" * 10
    recs = rawpdf._inline_images(content)  # needs 64 data bytes
    assert len(recs) == 1
    d, raw, err = recs[0]
    assert raw is None and "truncated" in err
    # and an unterminated Flate inline image is its own error entry
    recs = rawpdf._inline_images(
        b"BI /W 4 /H 4 /BPC 8 /CS /G /F /Fl ID " + b"\x78\x9c\x00"
    )
    assert recs and "Flate" in recs[0][2]


def test_spark_pdf_images_two_level_error_capture(spark):
    """Document-level error → one error row; image-level error →
    its own row while sibling images still land; pixel stats are
    computed kernel-side."""
    good = rawpdf.encode_pdf(
        [["x"]],
        images=[[{"kind": "gray", "array": GRAY},
                 {"kind": "gray", "array": GRAY}]],
    )
    # image-level poison: first image's filter becomes undecodable
    img_bad = good.replace(
        b"/Filter /FlateDecode", b"/Filter /JPXDecode\x20\x20", 1
    )
    rows = [
        (0, bytearray(good)),
        (1, bytearray(img_bad)),
        (2, bytearray(b"%PDF-1.4 garbage with no structure")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, pdf binary")
    media = multimodal.with_media_columns(
        df, "pdf", "application/pdf", "doc_id"
    )
    out = multimodal.pdf_images(media).toPandas()
    by_doc = {d: g for d, g in out.groupby("doc_id")}
    g0 = by_doc[0]
    assert len(g0) == 2 and g0["error"].isna().all()
    assert set(g0["sum_pixel"]) == {int(GRAY.astype("int64").sum())}
    g1 = by_doc[1]
    assert len(g1) == 2
    assert g1["error"].notna().sum() == 1
    assert g1["error"].str.contains("jpx").any()
    assert g1[g1["error"].isna()]["sum_pixel"].iloc[0] == int(
        GRAY.astype("int64").sum()
    )
    for bad in (2, 3):
        g = by_doc[bad]
        assert len(g) == 1 and g["error"].notna().all()
        assert g["img_idx"].isna().all()


def test_image_cap_truncates_with_marker_row():
    """A legitimate many-image document keeps the rows under the cap
    and appends ONE truncation marker instead of raising (ADVICE r14):
    per-image error capture must not turn into a document-level
    error row."""
    pdf = rawpdf.encode_pdf(
        [["x"]],
        images=[[{"kind": "gray", "array": GRAY}] * 4],
    )
    out = rawpdf.extract_pdf_images(pdf, max_images=2)
    ims = out["images"]
    assert len(ims) == 3
    assert [im["error"] for im in ims[:2]] == [None, None]
    assert ims[2]["kind"] == "truncated"
    assert "cap" in ims[2]["error"]
    # under the cap: no marker
    assert all(
        im["error"] is None
        for im in rawpdf.extract_pdf_images(pdf, max_images=4)["images"]
    )


def test_undecodable_inline_data_is_skipped_past_ei():
    """After an inline image whose data extent cannot be determined,
    the scan resumes past the next EI — a 'BI' pair INSIDE the
    undecodable data must not spawn spurious extra rows (ADVICE r14),
    and a later genuine inline image is still found."""
    inner = b" BI /W 1 /H 1 /BPC 8 /CS /G ID z"  # lives inside bad data
    content = (
        b"BI /W 9 /H 9 /BPC 8 /CS /G ID " + inner + b" EI "
        + b"BI /W 2 /H 2 /BPC 8 /CS /G ID " + b"\x07" * 4 + b" EI"
    )
    recs = rawpdf._inline_images(content)
    assert len(recs) == 2
    assert recs[0][1] is None and "truncated" in recs[0][2]
    assert recs[1][1] == b"\x07" * 4 and recs[1][2] is None
    # no EI anywhere after the bad data: scan ends cleanly
    recs = rawpdf._inline_images(
        b"BI /W 9 /H 9 /BPC 8 /CS /G ID " + inner
    )
    assert len(recs) == 1 and "truncated" in recs[0][2]
