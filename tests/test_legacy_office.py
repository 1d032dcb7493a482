"""Legacy binary Office text tier (.doc/.xls/.ppt — MS-DOC piece
table, BIFF8 records, PPT text atoms).

The hand-packed vectors here are deliberately built with DIFFERENT
layouts than the module's fixture writers (pieces out of stream
order, a Prc before the Pcdt, MULRK/BOOLERR/FORMULA records the
builder never emits, nested PPT containers) so a decoder bug cannot
hide behind a mirrored builder.
"""

import struct

import pytest

from rawdata_client_provider_gcs_spark.sources import legacy_office as L
from rawdata_client_provider_gcs_spark.sources import office as O
from rawdata_client_provider_gcs_spark.sources import cfb as C


# ---------------------------------------------------------------------------
# .doc piece table
# ---------------------------------------------------------------------------


def _hand_doc(table_flag: int = 0x0200):
    """Hand-packed WordDocument + table streams, independent of
    build_doc_streams: text pieces stored in REVERSE stream order,
    a Prc element before the Pcdt, and FIB blob padded past the Clx
    slot.  Text: 'AB\\r' (cp1252) then 'c\\u00e9\\r' (UTF-16)."""
    fib = bytearray(1200)
    struct.pack_into("<HH", fib, 0, 0xA5EC, 0x00C1)
    struct.pack_into("<H", fib, 10, table_flag)
    struct.pack_into("<H", fib, 32, 14)
    struct.pack_into("<H", fib, 62, 22)
    struct.pack_into("<I", fib, 76, 6)  # ccpText = all six CPs
    struct.pack_into("<H", fib, 152, 93)
    # second piece's UTF-16 bytes FIRST in the stream
    uni = "cé\r".encode("utf-16-le")
    comp = b"AB\r"
    uni_off = 1200
    comp_off = 1200 + len(uni)
    body = uni + comp
    cps = (0, 3, 6)
    pcd1 = struct.pack("<HIH", 0, (comp_off * 2) | 0x40000000, 0)
    pcd2 = struct.pack("<HIH", 0, uni_off, 0)
    plcpcd = b"".join(struct.pack("<I", c) for c in cps) + pcd1 + pcd2
    prc = b"\x01" + struct.pack("<h", 2) + b"\x00\x00"
    clx = prc + b"\x02" + struct.pack("<I", len(plcpcd)) + plcpcd
    table = b"\xee" * 7 + clx  # Clx not at offset 0
    struct.pack_into("<II", fib, 154 + 8 * 33, 7, len(clx))
    struct.pack_into("<I", fib, 64, uni_off + len(body))  # cbMac
    return bytes(fib) + body, table


def test_doc_hand_vector_pieces_and_encodings():
    word, table = _hand_doc()
    assert L.doc_text_of(word, table) == "AB\ncé\n"


def test_doc_ccptext_truncates_subdocument_cps():
    word, table = _hand_doc()
    word = bytearray(word)
    struct.pack_into("<I", word, 76, 4)  # main doc = first 4 CPs
    assert L.doc_text_of(bytes(word), table) == "AB\nc"


def test_doc_control_char_mapping():
    mapped = L._doc_chars("a\rb\x07c\x0bd\x1ee\x1ff\x13\x14\x15g\x03h")
    assert mapped == "a\nb\tc\nd-ef" + "g h"


def test_doc_which_table_stream_bit():
    for flag, name in ((0x0200, "1Table"), (0, "0Table")):
        word, table = _hand_doc(flag)
        blob = C.build_cfb([("WordDocument", word), (name, table)])
        fmt, parts = O.office_parts_of(blob)
        assert fmt == "doc"
        assert parts == [("WordDocument", "<w:t>AB\ncé\n</w:t>")]


def test_doc_missing_named_table_stream():
    word, table = _hand_doc(0x0200)
    blob = C.build_cfb([("WordDocument", word), ("0Table", table)])
    with pytest.raises(ValueError, match="missing stream '1Table'"):
        O.office_parts_of(blob)


def test_doc_hostiles():
    word, table = _hand_doc()
    # encrypted flag
    w = bytearray(word)
    struct.pack_into("<H", w, 10, 0x0100)
    with pytest.raises(ValueError, match="encrypted"):
        L.doc_text_of(bytes(w), table)
    # Clx range past table stream
    w = bytearray(word)
    struct.pack_into("<II", w, 154 + 8 * 33, 7, len(table) + 50)
    with pytest.raises(ValueError, match="past the table stream"):
        L.doc_text_of(bytes(w), table)
    # piece fc past WordDocument end
    t = bytearray(table)
    pcd_off = len(table) - 16  # first PCD's fcRaw field
    struct.pack_into("<I", t, pcd_off + 2,
                     ((len(word) * 2 + 64) * 2) | 0x40000000)
    with pytest.raises(ValueError, match="past the stream end"):
        L.doc_text_of(word, bytes(t))
    # unknown Clx element
    t = bytearray(table)
    t[7] = 0x77
    with pytest.raises(ValueError, match="unknown Clx element"):
        L.doc_text_of(word, bytes(t))
    # PlcPcd length not 12n+4
    w = bytearray(word)
    struct.pack_into("<II", w, 154 + 8 * 33, 7, len(table) - 7 - 1)
    with pytest.raises(ValueError, match="no Pcdt|not 12n|past the Clx"):
        L.doc_text_of(bytes(w), table)
    # decreasing CPs
    t = bytearray(table)
    cps_off = len(table) - 28  # second CP
    struct.pack_into("<I", t, cps_off, 99)
    with pytest.raises(ValueError, match="decrease"):
        L.doc_text_of(word, bytes(t))
    # truncated FIB → ValueError, not struct.error
    with pytest.raises(ValueError):
        L.doc_text_of(word[:40], table)


# ---------------------------------------------------------------------------
# .xls BIFF8
# ---------------------------------------------------------------------------


def _rec(rt, payload):
    return struct.pack("<HH", rt, len(payload)) + payload


def _hand_xls():
    """Hand-packed BIFF8 Workbook: records the fixture writer never
    emits — LABEL, MULRK, BOOLERR (bool + error), FORMULA with f64 /
    bool / string results, cells written in NON-row-major order."""
    sst = _rec(0x00FC, struct.pack("<II", 3, 2)
               + struct.pack("<HB", 2, 0) + b"s0"
               + struct.pack("<HB", 3, 1) + "péq".encode("utf-16-le"))
    sheet = bytearray()
    sheet += _rec(0x0809, struct.pack("<HH8x", 0x0600, 0x0010))
    # row 1 BEFORE row 0 — reader must sort
    sheet += _rec(0x00FD, struct.pack("<HHHI", 1, 0, 0, 1))
    sheet += _rec(0x0204, struct.pack("<HHH", 0, 0, 0)
                  + struct.pack("<HB", 4, 0) + b"labl")
    # MULRK: row 0, cols 1-2: 7 (fInt) and 2.5 (f64 high bits: 2.5 ok?)
    rk_int = (7 << 2) | 0x02
    (hi,) = struct.unpack("<I", struct.pack("<d", 2.5)[4:])
    rk_f = hi & 0xFFFFFFFC
    sheet += _rec(0x00BD, struct.pack("<HH", 0, 1)
                  + struct.pack("<HI", 0, rk_int)
                  + struct.pack("<HI", 0, rk_f)
                  + struct.pack("<H", 2))
    # BOOLERR: bool TRUE at (0,3), #DIV/0! at (0,4)
    sheet += _rec(0x0205, struct.pack("<HHHBB", 0, 3, 0, 1, 0))
    sheet += _rec(0x0205, struct.pack("<HHHBB", 0, 4, 0, 0x07, 1))
    # FORMULA numeric at (2,0): 6.25
    sheet += _rec(0x0006, struct.pack("<HHH", 2, 0, 0)
                  + struct.pack("<d", 6.25) + b"\x00\x00\x00\x00\x00\x00")
    # FORMULA string at (2,1) + STRING record
    sheet += _rec(0x0006, struct.pack("<HHH", 2, 1, 0)
                  + b"\x00\x00\x00\x00\x00\x00\xff\xff" + b"\x00" * 6)
    sheet += _rec(0x0207, struct.pack("<HB", 3, 0) + b"fml")
    # RK x100: 314 → 3.14
    sheet += _rec(0x027E, struct.pack("<HHHI", 2, 2, 0,
                                      ((314 << 2) | 0x02 | 0x01)))
    sheet += _rec(0x000A, b"")

    glob = bytearray()
    glob += _rec(0x0809, struct.pack("<HH8x", 0x0600, 0x0005))
    name = b"Hand"
    # boundsheet position patched after globals assembled
    bs = struct.pack("<IHBB", 0, 0, len(name), 0) + name
    glob += _rec(0x0085, bs)
    glob += sst
    glob += _rec(0x000A, b"")
    # lbPlyPos: BOF record is 16 bytes, boundsheet header 4 more
    struct.pack_into("<I", glob, 20, len(glob))
    return bytes(glob) + bytes(sheet)


def test_xls_hand_vector_all_record_kinds():
    sheets = L.xls_sheets_of(_hand_xls())
    assert sheets == [(
        "Hand",
        ["labl", "7", "2.5", "TRUE", "#DIV/0!",   # row 0, cols 0-4
         "péq",                                    # row 1 (LABELSST)
         "6.25", "fml", "3.14"],                   # row 2
    )]


def test_xls_rk_decode_vectors():
    # fInt negative, fX100 int, raw f64 high bits
    neg = ((-5 << 2) & 0xFFFFFFFF) | 0x02
    assert L._rk_value(neg) == -5.0
    assert L._rk_value((250 << 2) | 0x03) == 2.5  # fInt + fX100
    (hi,) = struct.unpack("<I", struct.pack("<d", -17.0)[4:])
    assert L._rk_value(hi & 0xFFFFFFFC) == -17.0


def test_xls_sst_continue_split_encoding_flip():
    blob = L.build_xls(
        [("S", [["first string cell", "second long string here"]])],
        split_sst=True,
    )
    fmt, parts = O.office_parts_of(blob)
    assert fmt == "xls"
    assert parts == [(
        "workbook/S",
        "<x:sheet><x:c>first string cell</x:c>"
        "<x:c>second long string here</x:c></x:sheet>",
    )]


def test_xls_hostiles():
    wb = _hand_xls()
    # record length past stream (truncate into the final RK payload)
    with pytest.raises(ValueError, match="length past the stream"):
        L.xls_sheets_of(wb[:-5])
    # EOF record itself missing
    with pytest.raises(ValueError, match="has no EOF"):
        L.xls_sheets_of(wb[:-4])
    # SST index out of range
    bad = wb.replace(struct.pack("<HHHI", 1, 0, 0, 1),
                     struct.pack("<HHHI", 1, 0, 0, 99))
    with pytest.raises(ValueError, match="out of range"):
        L.xls_sheets_of(bad)
    # boundsheet offset not a BOF
    b = bytearray(wb)
    struct.pack_into("<I", b, 20, 2)
    with pytest.raises(ValueError, match="not a BOF"):
        L.xls_sheets_of(bytes(b))
    # stream not starting at a BOF record
    with pytest.raises(ValueError, match="does not start with BOF"):
        L.xls_sheets_of(b"\x42\x00\x00\x00")
    # SST declaring more strings than its bytes carry
    sst_bomb = _rec(0x00FC, struct.pack("<II", 9, 9)
                    + struct.pack("<HB", 2, 0) + b"ab")
    g = (_rec(0x0809, struct.pack("<HH8x", 0x0600, 0x0005))
         + _rec(0x0085, struct.pack("<IHBB", 0, 0, 1, 0) + b"S")
         + sst_bomb + _rec(0x000A, b""))
    with pytest.raises(ValueError, match="runs past its Continue"):
        L.xls_sheets_of(g)


# ---------------------------------------------------------------------------
# .ppt text atoms
# ---------------------------------------------------------------------------


def _atom(rt, body):
    return struct.pack("<HHI", 0, rt, len(body)) + body


def _container(rt, body):
    return struct.pack("<HHI", 0x000F, rt, len(body)) + body


def test_ppt_hand_vector_nested_and_document_level():
    # document-level atom, then a slide whose atom sits inside a
    # NESTED (drawing-ish) container, then a notes container
    inner = _container(0x0FF0, _atom(0x0FA8, b"outline"))
    slide = _container(0x03EE, _container(
        0x1234, _atom(0x0FA0, "deep\rrun".encode("utf-16-le"))
    ))
    notes = _container(0x03F0, _atom(0x0FA8, b"note\x0bline"))
    parts = L.ppt_parts_of(inner + slide + notes)
    assert parts == [
        ("document", "outline"),
        ("slide1", "deep\nrun"),
        ("notes1", "note\nline"),
    ]


def test_ppt_multiple_atoms_one_slide_join():
    slide = _container(0x03EE, _atom(0x0FA8, b"a") + _atom(0x0FA8, b"b"))
    assert L.ppt_parts_of(slide) == [("slide1", "a\nb")]


def test_ppt_hostiles():
    # record length past container
    bad = struct.pack("<HHI", 0, 0x0FA8, 400) + b"zz"
    with pytest.raises(ValueError, match="past its container"):
        L.ppt_parts_of(bad)
    # child overflowing its parent container
    child = struct.pack("<HHI", 0, 0x0FA8, 64) + b"x" * 64
    parent = struct.pack("<HHI", 0x000F, 0x03EE, 8) + child
    with pytest.raises(ValueError, match="past its container"):
        L.ppt_parts_of(parent)
    # depth bomb
    blob = _atom(0x0FA8, b"t")
    for _ in range(L.MAX_PPT_DEPTH + 2):
        blob = _container(0x1001, blob)
    with pytest.raises(ValueError, match="too deep"):
        L.ppt_parts_of(blob)
    # no text atoms at all → legacy_parts refuses
    blob = C.build_cfb([("PowerPoint Document", _container(0x03EE, b""))])
    with pytest.raises(ValueError, match="no text atoms"):
        O.office_parts_of(blob)


# ---------------------------------------------------------------------------
# Spark integration — per-row capture + mixed modern/legacy batch
# ---------------------------------------------------------------------------


def test_office_text_spark_legacy_mix(spark):
    rows = [
        (0, L.build_doc(["alpha beta", "gamma"], title="D")),
        (1, L.build_xls([("S1", [["u", "7"]])])),
        (2, L.build_ppt(["one", "two"])),
        (3, O.build_docx(["modern"])),
        (4, C.build_cfb([("WordDocument", b"nope" * 800)])),  # bad FIB
        (5, C.build_cfb([("Nothing", b"x")])),  # no office stream
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = [
        (r.doc_id, r.doc_format, r.part_idx, r.part_name, r.text, r.error)
        for r in O.office_text(df).orderBy("doc_id", "part_idx").collect()
    ]
    assert got[0] == (0, "doc", 0, "WordDocument", "alpha beta gamma", None)
    assert got[1] == (1, "xls", 0, "workbook/S1", "u 7", None)
    assert got[2] == (2, "ppt", 0, "slide1", "one", None)
    assert got[3] == (2, "ppt", 1, "slide2", "two", None)
    assert got[4] == (3, "docx", 0, "word/document.xml", "modern", None)
    assert got[5][0] == 4 and "FIB wIdent" in got[5][5]
    assert got[6][0] == 5 and "no WordDocument" in got[6][5]


def test_office_info_legacy_formats():
    doc = L.build_doc(["t"], title="Memo", author="Bea")
    info = O.office_info_of(doc)
    assert info == {"doc_format": "doc", "title": "Memo", "creator": "Bea",
                    "language": "", "n_parts": 3}
    xls = L.build_xls([("S", [["a"]])], title="Q3", author="Cal")
    info = O.office_info_of(xls)
    assert (info["doc_format"], info["title"], info["n_parts"]) == (
        "xls", "Q3", 2,
    )
    ppt = L.build_ppt(["s"], title="Deck", author="Dee")
    info = O.office_info_of(ppt)
    assert (info["doc_format"], info["title"], info["n_parts"]) == (
        "ppt", "Deck", 2,
    )


def test_doc_subdocument_text_second_part():
    """Piece-table CPs past ccpText (footnotes/headers) land in a
    second 'subdocuments' part instead of being dropped."""
    blob = L.build_doc_streams(
        ["main body"], footnotes=["a footnote", "a header"]
    )
    word = dict(blob)["WordDocument"]
    table = dict(blob)["1Table"]
    main, subs = L.doc_texts_of(word, table)
    assert main == "main body\n"
    assert subs == "a footnote\na header\n"
    cfb = C.build_cfb(blob)
    fmt, parts = O.office_parts_of(cfb)
    assert fmt == "doc"
    assert [p[0] for p in parts] == ["WordDocument", "subdocuments"]
    assert parts[1][1] == "<w:t>a footnote\na header\n</w:t>"
    # without footnotes: single part, unchanged contract
    fmt, parts = O.office_parts_of(L.build_doc(["only main"]))
    assert [p[0] for p in parts] == ["WordDocument"]


def test_xls_infinite_cell_value_stays_valueerror():
    """An IEEE +inf NUMBER payload (or RK 0x7FF00000) must land in
    the ValueError per-row class, not OverflowError (review, r12)."""
    inf_number = _rec(0x0203, struct.pack("<HHH", 0, 0, 0)
                      + struct.pack("<d", float("inf")))
    g = (_rec(0x0809, struct.pack("<HH8x", 0x0600, 0x0005))
         + _rec(0x0085, struct.pack("<IHBB", 0, 0, 1, 0) + b"S")
         + _rec(0x00FC, struct.pack("<II", 0, 0))
         + _rec(0x000A, b""))
    sheet = (_rec(0x0809, struct.pack("<HH8x", 0x0600, 0x0010))
             + inf_number + _rec(0x000A, b""))
    wb = bytearray(g + sheet)
    struct.pack_into("<I", wb, 20, len(g))
    with pytest.raises(ValueError, match="non-finite cell"):
        L.xls_sheets_of(bytes(wb))
