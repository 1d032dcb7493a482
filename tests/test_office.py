"""Office/ebook text extraction (sources/office.py): DOCX/EPUB/ODT
container navigation, the Catalyst text chain, and hostile shapes."""

from __future__ import annotations

import pytest

from rawdata_client_provider_gcs_spark.sources import archive as A
from rawdata_client_provider_gcs_spark.sources import office as O


# ------------------------------------------------------------- kernels


def test_docx_roundtrip_with_markup_chars():
    blob = O.build_docx(["a & b < c > d", "second  para\twith\nspace"])
    fmt, parts = O.office_parts_of(blob)
    assert fmt == "docx"
    assert [n for n, _ in parts] == ["word/document.xml"]
    xml = parts[0][1]
    assert "&amp;" in xml and "&lt;" in xml  # escaped in the container
    assert "<w:t" in xml


def test_epub_spine_order_and_relative_hrefs():
    blob = O.build_epub(["one", "two", "three"], title="Book")
    fmt, parts = O.office_parts_of(blob)
    assert fmt == "epub"
    assert [n for n, _ in parts] == [
        "OPS/text/ch0.xhtml", "OPS/text/ch1.xhtml", "OPS/text/ch2.xhtml"
    ]
    assert "one" in parts[0][1] and "three" in parts[2][1]


def test_epub_dotdot_href_and_single_quotes():
    """OPF navigation must survive ../ hrefs and single-quoted attrs."""
    xhtml = b"<html><body><p>deep text</p></body></html>"
    opf = (
        "<package><manifest>"
        "<item id='c0' href='../text/ch.xhtml' "
        "media-type='application/xhtml+xml'/>"
        "</manifest><spine><itemref idref='c0'/></spine></package>"
    ).encode()
    container = (
        b'<container><rootfiles><rootfile full-path="OPS/opf/content.opf"/>'
        b"</rootfiles></container>"
    )
    blob = A.build_zip([
        ("mimetype", b"application/epub+zip"),
        ("META-INF/container.xml", container),
        ("OPS/opf/content.opf", opf),
        ("OPS/text/ch.xhtml", xhtml),
    ])
    fmt, parts = O.office_parts_of(blob)
    assert fmt == "epub" and parts[0][0] == "OPS/text/ch.xhtml"
    assert "deep text" in parts[0][1]


def test_odt_roundtrip():
    fmt, parts = O.office_parts_of(O.build_odt(["p1", "p2"]))
    assert fmt == "odt" and parts[0][0] == "content.xml"
    assert "<text:p>p1</text:p>" in parts[0][1]


def test_ods_tables_in_document_order():
    blob = O.build_ods(
        [("First", [["a & b", "c"], ["d", "17"]]), ("Second", [["x"]])],
        title="Wb", creator="me",
    )
    fmt, parts = O.office_parts_of(blob)
    assert fmt == "ods"
    assert [n for n, _ in parts] == ["First", "Second"]
    # bodies carry the full table subtree — the <table:table-row /
    # -cell children must not truncate the prefix-sharing parent scan
    assert "a &amp; b" in parts[0][1] and "17" in parts[0][1]
    assert "x" in parts[1][1]
    info = O.office_info_of(blob)
    assert (info["title"], info["creator"], info["n_parts"]) == \
        ("Wb", "me", 2)


def test_odp_pages_in_document_order():
    blob = O.build_odp(["slide one", "slide two"], title="Deck")
    fmt, parts = O.office_parts_of(blob)
    assert fmt == "odp"
    assert [n for n, _ in parts] == ["page1", "page2"]
    assert "slide one" in parts[0][1] and "slide two" in parts[1][1]
    assert O.office_info_of(blob)["n_parts"] == 2


def test_odf_mimetype_member_is_stored_first():
    """ODF 1.3 part 3 §2.2.4: the mimetype member rides first and
    uncompressed, so magic sniffers (and the classify router) can read
    the subtype without inflating."""
    for build, mime in (
        (lambda: O.build_ods([("S", [["v"]])]), b"spreadsheet"),
        (lambda: O.build_odp(["s"]), b"presentation"),
        (lambda: O.build_odt(["p"]), b"opendocument.text"),
    ):
        blob = build()
        assert mime in blob[:128]


def test_ods_odp_hostile_shapes():
    # ODF mimetype but no content.xml
    blob = A.build_zip([("mimetype", O._ODS_MIME)])
    with pytest.raises(ValueError, match="ods: missing content.xml"):
        O.office_parts_of(blob)
    # content.xml without any table/page elements
    blob = A.build_zip([
        ("mimetype", O._ODP_MIME),
        ("content.xml", b"<office:document-content/>"),
    ])
    with pytest.raises(ValueError, match="odp: content.xml has no"):
        O.office_parts_of(blob)
    # part-count bomb: one self-closing table per part over the cap
    many = "<table:table/>" * (O.MAX_SPINE_PARTS + 1)
    blob = A.build_zip([
        ("mimetype", O._ODS_MIME),
        ("content.xml", many.encode()),
    ])
    with pytest.raises(ValueError, match="bomb"):
        O.office_parts_of(blob)


def test_tag_scan_name_boundary():
    """<itemref> must not match a scan for <item> (longer tag name)."""
    xml = '<itemref idref="r"/><item id="i" href="h"/>'
    assert [O._attr(t, "id") for t in O._tags(xml, "item")] == ["i"]


def test_hostile_shapes():
    # plain zip: not an office container
    with pytest.raises(ValueError, match="not a DOCX/EPUB/ODT"):
        O.office_parts_of(A.build_zip([("x.txt", b"hi")]))
    # corrupt zip
    with pytest.raises(ValueError):
        O.office_parts_of(b"PK\x03\x04garbage")
    # epub without container.xml
    with pytest.raises(ValueError, match="container.xml"):
        O.office_parts_of(
            A.build_zip([("mimetype", b"application/epub+zip")])
        )
    # container names a missing rootfile
    with pytest.raises(ValueError, match="rootfile"):
        O.office_parts_of(A.build_zip([
            ("mimetype", b"application/epub+zip"),
            ("META-INF/container.xml",
             b'<rootfile full-path="nope.opf"/>'),
        ]))
    # empty spine
    with pytest.raises(ValueError, match="spine is empty"):
        O.office_parts_of(A.build_zip([
            ("mimetype", b"application/epub+zip"),
            ("META-INF/container.xml",
             b'<rootfile full-path="c.opf"/>'),
            ("c.opf", b"<package><manifest/><spine/></package>"),
        ]))
    # spine idref not in manifest
    with pytest.raises(ValueError, match="not in manifest"):
        O.office_parts_of(A.build_zip([
            ("mimetype", b"application/epub+zip"),
            ("META-INF/container.xml",
             b'<rootfile full-path="c.opf"/>'),
            ("c.opf",
             b'<package><manifest/><spine><itemref idref="ghost"/>'
             b"</spine></package>"),
        ]))
    # spine document missing from the zip
    with pytest.raises(ValueError, match="missing"):
        O.office_parts_of(A.build_zip([
            ("mimetype", b"application/epub+zip"),
            ("META-INF/container.xml",
             b'<rootfile full-path="c.opf"/>'),
            ("c.opf",
             b'<package><manifest><item id="c" href="gone.xhtml"/>'
             b'</manifest><spine><itemref idref="c"/></spine></package>'),
        ]))
    # odt mimetype without content.xml
    with pytest.raises(ValueError, match="content.xml"):
        O.office_parts_of(A.build_zip([
            ("mimetype", b"application/vnd.oasis.opendocument.text"),
        ]))


def test_spine_bomb_cap():
    """A hostile OPF fanning one file into millions of rows trips the
    part cap before any member reads."""
    refs = "".join(
        f'<itemref idref="c{i}"/>' for i in range(O.MAX_SPINE_PARTS + 1)
    )
    blob = A.build_zip([
        ("mimetype", b"application/epub+zip"),
        ("META-INF/container.xml", b'<rootfile full-path="c.opf"/>'),
        ("c.opf",
         f"<package><manifest/><spine>{refs}</spine></package>".encode()),
    ])
    with pytest.raises(ValueError, match="bomb"):
        O.office_parts_of(blob)


# --------------------------------------------------------------- spark


def test_office_text_spark_with_poisoned_row(spark):
    """office_text explodes parts with per-row error capture — the
    poisoned payload lands as an error row, never kills the job; the
    Catalyst chain decodes the fixture's XML escapes back exactly."""
    rows = [
        (0, O.build_docx(["a & b", "c < d"])),
        (1, O.build_epub(["ch one", "ch two"], title="")),
        (2, O.build_odt(["only  para"])),
        (3, b"PK\x03\x04 corrupt office bytes"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        (r.doc_id, r.part_idx): r
        for r in O.office_text(df).collect()
    }
    assert got[(0, 0)].text == "a & b c < d"
    assert got[(0, 0)].doc_format == "docx"
    assert got[(1, 0)].text == "ch one"
    assert got[(1, 1)].text == "ch two"
    assert got[(2, 0)].text == "only para"  # whitespace collapsed
    assert got[(3, None)].error and got[(3, None)].text is None
    assert got[(4, None)].error == "ValueError: null office payload"


def test_office_info_metadata_and_hostility():
    """Dublin Core metadata per format; absence is data; self-closing
    and attribute-bearing dc tags handled; hostile zips land as
    ValueError."""
    import pytest

    assert O.office_info_of(
        O.build_docx(["x"], title="A & B", creator="Ann <X>")
    ) == {"doc_format": "docx", "title": "A & B", "creator": "Ann <X>",
          "language": "", "n_parts": 1}
    info = O.office_info_of(
        O.build_epub(["c1", "c2"], title="Book", creator="Bob",
                     language="en")
    )
    assert (info["title"], info["creator"], info["language"],
            info["n_parts"]) == ("Book", "Bob", "en", 2)
    assert O.office_info_of(O.build_odt(["p"], title="T"))["title"] == "T"
    # absence is data
    assert O.office_info_of(O.build_docx(["x"]))["title"] == ""
    # self-closing dc tag is not a value; longer tag names don't match
    assert O._dc("<dc:title/><dc:titles>no</dc:titles>", "title") == ""
    assert O._dc('<dc:title id="t">Yes</dc:title>', "title") == "Yes"
    with pytest.raises(ValueError):
        O.office_info_of(A.build_zip([("x.txt", b"plain")]))


# --------------------------------------------------------------- round 12:
# PPTX / XLSX (the rest of the OPC family)


def test_pptx_slide_order_beats_rels_order():
    """build_pptx writes the .rels entries REVERSED; the reader must
    order slides by sldIdLst, so a rels-order walk fails here."""
    p = O.build_pptx(["first slide", "second slide", "third slide"])
    fmt, parts = O.office_parts_of(p)
    assert fmt == "pptx"
    assert [n for n, _ in parts] == [
        "ppt/slides/slide1.xml", "ppt/slides/slide2.xml",
        "ppt/slides/slide3.xml",
    ]
    assert "first slide" in parts[0][1]
    assert "third slide" in parts[2][1]


def test_pptx_hostile_shapes():
    # no slide list
    blob = A.build_zip([
        ("ppt/presentation.xml", b"<p:presentation/>"),
    ])
    with pytest.raises(ValueError, match="no slide list"):
        O.office_parts_of(blob)
    # slide rid missing from rels
    blob = A.build_zip([
        ("ppt/presentation.xml",
         b'<p:presentation><p:sldIdLst><p:sldId id="256" r:id="rId9"/>'
         b"</p:sldIdLst></p:presentation>"),
        ("ppt/_rels/presentation.xml.rels", b"<Relationships/>"),
    ])
    with pytest.raises(ValueError, match="not in .rels"):
        O.office_parts_of(blob)
    # rels target missing from package
    blob = A.build_zip([
        ("ppt/presentation.xml",
         b'<p:presentation><p:sldIdLst><p:sldId id="256" r:id="rId2"/>'
         b"</p:sldIdLst></p:presentation>"),
        ("ppt/_rels/presentation.xml.rels",
         b'<Relationships><Relationship Id="rId2" '
         b'Target="slides/slide1.xml"/></Relationships>'),
    ])
    with pytest.raises(ValueError, match="missing from the package"):
        O.office_parts_of(blob)
    # slide-list bomb
    ids = "".join(
        f'<p:sldId id="{i}" r:id="r{i}"/>'
        for i in range(O.MAX_SPINE_PARTS + 1)
    )
    blob = A.build_zip([
        ("ppt/presentation.xml",
         f"<p:presentation><p:sldIdLst>{ids}</p:sldIdLst>"
         "</p:presentation>".encode()),
    ])
    with pytest.raises(ValueError, match="bomb"):
        O.office_parts_of(blob)


def test_xlsx_cell_paths_and_reading_order():
    """Shared-string, inline-string and numeric cells resolve in
    row-major reading order; absolute-target rels and multi-sheet
    workbook order hold."""
    x = O.build_xlsx(
        [[["alpha", "beta"], ["gamma & d", "42"]],
         [["second", "sheet"]]],
    )
    fmt, parts = O.office_parts_of(x)
    assert fmt == "xlsx"
    assert [n for n, _ in parts] == [
        "xl/worksheets/sheet1.xml", "xl/worksheets/sheet2.xml",
    ]
    assert parts[0][1] == (
        "<x:sheet><x:c>alpha</x:c><x:c>beta</x:c>"
        "<x:c>gamma &amp; d</x:c><x:c>42</x:c></x:sheet>"
    )
    assert parts[1][1] == (
        "<x:sheet><x:c>second</x:c><x:c>sheet</x:c></x:sheet>"
    )


def test_xlsx_hostile_shapes():
    # shared-string index out of range
    blob = A.build_zip([
        ("xl/workbook.xml",
         b'<workbook><sheets><sheet name="S1" sheetId="1" r:id="rId1"/>'
         b"</sheets></workbook>"),
        ("xl/_rels/workbook.xml.rels",
         b'<Relationships><Relationship Id="rId1" '
         b'Target="worksheets/sheet1.xml"/></Relationships>'),
        ("xl/worksheets/sheet1.xml",
         b'<worksheet><sheetData><row><c r="A1" t="s"><v>7</v></c>'
         b"</row></sheetData></worksheet>"),
    ])
    with pytest.raises(ValueError, match="out of range"):
        O.office_parts_of(blob)
    # non-numeric shared-string index
    blob = A.build_zip([
        ("xl/workbook.xml",
         b'<workbook><sheets><sheet name="S1" sheetId="1" r:id="rId1"/>'
         b"</sheets></workbook>"),
        ("xl/_rels/workbook.xml.rels",
         b'<Relationships><Relationship Id="rId1" '
         b'Target="worksheets/sheet1.xml"/></Relationships>'),
        ("xl/worksheets/sheet1.xml",
         b'<worksheet><sheetData><row><c r="A1" t="s"><v>x</v></c>'
         b"</row></sheetData></worksheet>"),
    ])
    with pytest.raises(ValueError, match="non-numeric"):
        O.office_parts_of(blob)
    # workbook without sheets
    blob = A.build_zip([("xl/workbook.xml", b"<workbook/>")])
    with pytest.raises(ValueError, match="no sheets"):
        O.office_parts_of(blob)


def test_xlsx_cell_bomb_cap():
    cells = b'<c r="A1"><v>1</v></c>' * 200
    # patch the cap down so the test doesn't build a million cells
    import rawdata_client_provider_gcs_spark.sources.office as o

    old = o.MAX_SHEET_CELLS
    o.MAX_SHEET_CELLS = 100
    try:
        blob = A.build_zip([
            ("xl/workbook.xml",
             b'<workbook><sheets><sheet name="S" sheetId="1" '
             b'r:id="rId1"/></sheets></workbook>'),
            ("xl/_rels/workbook.xml.rels",
             b'<Relationships><Relationship Id="rId1" '
             b'Target="worksheets/sheet1.xml"/></Relationships>'),
            ("xl/worksheets/sheet1.xml",
             b"<worksheet><sheetData><row>" + cells
             + b"</row></sheetData></worksheet>"),
        ])
        with pytest.raises(ValueError, match="bomb"):
            O.office_parts_of(blob)
    finally:
        o.MAX_SHEET_CELLS = old


def test_pptx_xlsx_metadata():
    info = O.office_info_of(
        O.build_pptx(["s1", "s2"], title="Deck <1>", creator="P & Q")
    )
    assert info == {"doc_format": "pptx", "title": "Deck <1>",
                    "creator": "P & Q", "language": "", "n_parts": 2}
    info = O.office_info_of(O.build_xlsx([[["a"]]], title="Wb"))
    assert (info["doc_format"], info["title"], info["n_parts"]) == (
        "xlsx", "Wb", 1,
    )
    # absence is data
    assert O.office_info_of(O.build_pptx(["s"]))["title"] == ""


def test_office_text_spark_pptx_xlsx(spark):
    """The Catalyst text chain over the two new formats: slide runs
    and resolved cells decode their XML escapes exactly once."""
    rows = [
        (0, O.build_pptx(["a & b", "c < d"])),
        (1, O.build_xlsx([[["x & y", "9"], ["z", "w"]]])),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        (r.doc_id, r.part_idx): r for r in O.office_text(df).collect()
    }
    assert got[(0, 0)].text == "a & b"
    assert got[(0, 1)].text == "c < d"
    assert got[(0, 0)].doc_format == "pptx"
    assert got[(1, 0)].text == "x & y 9 z w"
    assert got[(1, 0)].doc_format == "xlsx"


# ---------------------------------------------------------------------------
# FictionBook2 (r14)
# ---------------------------------------------------------------------------


def test_fb2_parts_and_metadata():
    from rawdata_client_provider_gcs_spark.sources import office as O

    blob = O.build_fb2(
        ["first chapter text", "second & <escaped>"],
        title="War and Peace",
        author=("Leo", "Tolstoy"),
        language="ru",
        notes=["a footnote"],
    )
    fmt, parts = O.office_parts_of(blob)
    assert fmt == "fb2"
    assert [p[0] for p in parts] == ["section0", "section1", "section2"]
    assert "first chapter text" in parts[0][1]
    assert "&amp;" in parts[1][1]  # markup preserved for the chain
    info = O.office_info_of(blob)
    assert info == {"doc_format": "fb2", "title": "War and Peace",
                    "creator": "Leo Tolstoy", "language": "ru",
                    "n_parts": 3}
    # nested sections: only depth-1 spans become parts
    nested = blob.replace(
        b"<section><p>first chapter text</p></section>",
        b"<section><title><p>T</p></title>"
        b"<section><p>inner</p></section></section>",
    )
    fmt, parts = O.office_parts_of(nested)
    assert len(parts) == 3 and "inner" in parts[0][1]


def test_fb2_hostiles_and_classify():
    from rawdata_client_provider_gcs_spark.sources import office as O
    from rawdata_client_provider_gcs_spark.sources.classify import (
        classify_payload,
    )

    blob = O.build_fb2(["x"])
    got = classify_payload(blob)
    assert got == {"format": "fb2", "category": "document",
                   "wrapper": None}
    # plain XML is still xml, svg still svg
    assert classify_payload(b'<?xml version="1.0"?><data/>')["format"] \
        == "xml"
    with pytest.raises(ValueError, match="unbalanced"):
        O.office_parts_of(blob.replace(b"</section>", b"", 1))
    with pytest.raises(ValueError, match="no body"):
        O.office_parts_of(
            b'<?xml version="1.0"?><FictionBook></FictionBook>'
        )
