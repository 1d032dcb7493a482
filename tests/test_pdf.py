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
