"""Office/ebook document text: DOCX, EPUB, and ODT part extraction.

All three formats are zip-of-XML — the engine already owns both
halves (the bounded ZIP member walk in :mod:`.archive`, the
tag-strip/entity chain in :mod:`..functions.html`); this module is
the composition.  The Python kernel only LOCATES the text-bearing
XML parts (OPC/OCF/ODF container navigation); the actual text
extraction (tag strip, entity decode, whitespace collapse) runs
Catalyst-side so it shares the html tier's linear-pass guarantees.

Per-format part discovery:

- **DOCX** (OPC, ISO 29500-2): one part, ``word/document.xml``.
- **EPUB** (OCF/OPF, EPUB 3.3 §3-4): ``mimetype`` ==
  ``application/epub+zip``; ``META-INF/container.xml`` names the OPF
  rootfile; the OPF ``<spine>`` orders ``<manifest>`` items — one
  output row per spine document, in spine order.
- **ODT** (ODF 1.3 §2.2): ``mimetype`` ==
  ``application/vnd.oasis.opendocument.text``; one part,
  ``content.xml``.
- **PPTX** (OPC, PresentationML): ``ppt/presentation.xml``'s
  ``<p:sldIdLst>`` orders the slides by ``r:id``;
  ``ppt/_rels/presentation.xml.rels`` resolves each to its
  ``slides/slideN.xml`` part — one output row per slide, in
  presentation order (the EPUB-spine shape with OPC relationships
  instead of an OPF manifest).
- **XLSX** (OPC, SpreadsheetML): ``xl/workbook.xml``'s ``<sheet>``
  list orders the worksheets by ``r:id`` via
  ``xl/_rels/workbook.xml.rels`` — one output row per sheet.  Cell
  text is NOT in the sheet part (``t="s"`` cells store indices into
  ``xl/sharedStrings.xml``), so the kernel resolves shared-string /
  inline-string / numeric cells in reading order into a synthetic
  ``<x:c>`` part, keeping values entity-escaped so the Catalyst
  tag-strip/entity chain downstream stays the single decode point.
  Rich-text phonetic runs (``<rPh>``) are out of the documented
  subset.

Legacy binary Office (.doc/.xls/.ppt — OLE2/CFB containers) routes
through :mod:`.legacy_office` (piece table, BIFF8 records, text
atoms), emitting the same synthetic XML-escaped parts.

Container navigation uses linear ``str.find`` passes, never lazy
regexes (hostile unclosed-opener markup is quadratic there — the
html.py lesson).  A malformed container raises ``ValueError`` and
lands as a per-row error, mirroring ``archive_members``.

Reference behavioral parity: the reference transport carries opaque
named byte arrays per message (RawdataMessage.java:15-60); document
decoding is this repo's derived crawl tier, the same opaque-payload
argument as PDF (operators/rawpdf.py).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .archive import parse_zip

_EPUB_MIME = b"application/epub+zip"
_ODT_MIME = b"application/vnd.oasis.opendocument.text"
_ODS_MIME = b"application/vnd.oasis.opendocument.spreadsheet"
_ODP_MIME = b"application/vnd.oasis.opendocument.presentation"

#: hard cap on spine length — a hostile OPF must not fan one file into
#: millions of rows
MAX_SPINE_PARTS = 4096

#: hard cap on cells walked per worksheet (bomb guard)
MAX_SHEET_CELLS = 1 << 20


def _attr(tag: str, name: str) -> str | None:
    """Value of ``name="..."`` inside one tag's text (single or double
    quotes), via linear find — no regex."""
    for quote in ('"', "'"):
        probe = f"{name}={quote}"
        i = tag.find(probe)
        if i >= 0:
            j = tag.find(quote, i + len(probe))
            if j >= 0:
                return tag[i + len(probe) : j]
    return None


def _tags(xml: str, name: str) -> list[str]:
    """Every ``<name ...>`` opening-tag text, linear split passes."""
    out = []
    for chunk in xml.split(f"<{name}")[1:]:
        if chunk[:1] not in (" ", "\t", "\n", "\r", ">", "/"):
            continue  # <itemX — longer tag name
        end = chunk.find(">")
        out.append(chunk if end < 0 else chunk[:end])
    return out


def _elements(xml: str, name: str) -> list[str]:
    """Every ``<name ...>body</name>`` body (self-closing → empty
    string, including the attribute-less ``<name/>`` form), linear
    split passes — same discipline as :func:`_tags`."""
    out = []
    close = f"</{name}>"
    for chunk in xml.split(f"<{name}")[1:]:
        if chunk[:1] == "/" and chunk[1:2] == ">":
            out.append("")  # bare self-closing <name/>
            continue
        if chunk[:1] not in (" ", "\t", "\n", "\r", ">"):
            continue
        gt = chunk.find(">")
        if gt < 0:
            break
        if chunk[gt - 1 : gt] == "/":
            out.append("")
            continue
        end = chunk.find(close, gt + 1)
        out.append(chunk[gt + 1 : end] if end >= 0 else chunk[gt + 1 :])
    return out


def _first_element(xml: str, name: str) -> str | None:
    els = _elements(xml, name)
    return els[0] if els else None


def _named_elements(
    xml: str, name: str, attr: str
) -> list[tuple[str, str]]:
    """Every ``<name ...>body</name>`` as ``(attr_value, body)`` in
    document order (self-closing → empty body, missing attribute →
    empty string) — the :func:`_elements` walk keeping the opening
    tag's identifying attribute, for ODF tables and draw pages."""
    out = []
    open_tok = f"<{name}"
    close = f"</{name}>"
    i = 0
    while True:
        i = xml.find(open_tok, i)
        if i < 0:
            break
        j = i + len(open_tok)
        if xml[j : j + 1] not in (" ", "\t", "\n", "\r", ">", "/"):
            i = j  # longer tag name (<table:table-row under table:table)
            continue
        gt = xml.find(">", j)
        if gt < 0:
            break
        tag = xml[j:gt]
        nm = _attr(tag, attr) or ""
        if tag.endswith("/"):
            out.append((nm, ""))
            i = gt + 1
            continue
        end = xml.find(close, gt + 1)
        if end < 0:
            out.append((nm, xml[gt + 1 :]))
            break
        out.append((nm, xml[gt + 1 : end]))
        i = end + len(close)
    return out


def _rels_of(members: dict[str, bytes], rels_path: str) -> dict[str, str]:
    """OPC relationships part → ``{Id: Target}``."""
    rels_xml = members.get(rels_path, b"").decode("utf-8", "replace")
    rels: dict[str, str] = {}
    for t in _tags(rels_xml, "Relationship"):
        rid, target = _attr(t, "Id"), _attr(t, "Target")
        if rid and target:
            rels[rid] = target
    return rels


def _opc_part(
    members: dict[str, bytes],
    rels: dict[str, str],
    rid: str,
    base_dir: str,
    what: str,
) -> tuple[str, bytes]:
    """Resolve one relationship id to its part (path, bytes)."""
    target = rels.get(rid)
    if target is None:
        raise ValueError(f"{what}: relationship {rid!r} not in .rels")
    path = target[1:] if target.startswith("/") else _resolve(base_dir, target)
    body = members.get(path)
    if body is None:
        raise ValueError(f"{what}: part {path!r} missing from the package")
    return path, body


def _shared_strings(data: bytes | None) -> list[str]:
    """``xl/sharedStrings.xml`` → ordered ``<si>`` texts (all ``<t>``
    runs concatenated, still entity-escaped — the Catalyst chain is
    the single decode point)."""
    if data is None:
        return []
    xml = data.decode("utf-8", "replace")
    return [
        "".join(_elements(si, "t")) for si in _elements(xml, "si")
    ]


def _sheet_to_part(sheet_xml: str, shared: list[str]) -> str:
    """One worksheet → synthetic ``<x:c>`` XML with every cell's text
    resolved in reading order (row-major document order): ``t="s"``
    via the shared-string table, ``t="inlineStr"`` from its ``<is>``
    runs, everything else (n/str/b/e) from its ``<v>`` body."""
    vals: list[str] = []
    n_cells = 0
    for chunk in sheet_xml.split("<c")[1:]:
        if chunk[:1] not in (" ", "\t", "\n", "\r", ">"):
            continue  # <cols>, <col, <cellXfs …
        n_cells += 1
        if n_cells > MAX_SHEET_CELLS:
            raise ValueError(
                f"xlsx: sheet over {MAX_SHEET_CELLS} cells (bomb)"
            )
        gt = chunk.find(">")
        if gt < 0:
            break
        tag = chunk[:gt]
        if tag.endswith("/"):
            continue  # empty cell
        body = chunk[gt + 1 :]
        end = body.find("</c>")
        if end >= 0:
            body = body[:end]
        ctype = _attr(tag, "t") or "n"
        if ctype == "s":
            v = _first_element(body, "v")
            if v is None:
                continue
            try:
                idx = int(v.strip())
            except ValueError:
                raise ValueError(
                    f"xlsx: non-numeric shared-string index {v.strip()!r}"
                )
            if not 0 <= idx < len(shared):
                raise ValueError(
                    f"xlsx: shared-string index {idx} out of range "
                    f"({len(shared)} strings)"
                )
            vals.append(shared[idx])
        elif ctype == "inlineStr":
            is_body = _first_element(body, "is")
            vals.append("".join(_elements(is_body or "", "t")))
        else:
            v = _first_element(body, "v")
            if v is not None:
                vals.append(v)
    return (
        "<x:sheet>"
        + "".join(f"<x:c>{v}</x:c>" for v in vals)
        + "</x:sheet>"
    )


def _resolve(base_dir: str, href: str) -> str:
    """Resolve a manifest href against the OPF's directory, collapsing
    ``../`` steps (zip paths, always ``/``-separated)."""
    parts = (base_dir + href).split("/") if base_dir else href.split("/")
    out: list[str] = []
    for p in parts:
        if p == "..":
            if out:
                out.pop()
        elif p not in ("", "."):
            out.append(p)
    return "/".join(out)


def office_parts_of(data: bytes) -> tuple[str, list[tuple[str, str]]]:
    """One office/ebook file → ``(doc_format, [(part_name, xml), ...])``.

    Raises ``ValueError`` on anything that is not a well-formed DOCX,
    EPUB, ODT, PPTX, XLSX, or legacy CFB Office container (per-row
    capture in :func:`office_parts`).  Legacy binary Office
    (OLE2/CFB — .doc/.xls/.ppt) routes through
    :mod:`.legacy_office`: the .doc piece table, BIFF8 cell records,
    and PPT text atoms each land as synthetic XML-escaped parts so
    the Catalyst chain downstream stays the single decode point.
    """
    from .cfb import parse_cfb, sniff_cfb
    from .legacy_office import legacy_parts
    from .mobi import mobi_parts, sniff_mobi
    from .rtf import rtf_text_of, sniff_rtf

    if sniff_cfb(data):
        return legacy_parts(parse_cfb(data)["entries"])
    if sniff_rtf(data):
        return "rtf", [("rtf", "<p>" + _xml_escape(rtf_text_of(data))
                        + "</p>")]
    if sniff_mobi(data):
        return mobi_parts(data)
    if sniff_fb2(data):
        return "fb2", _fb2_parts(data.decode("utf-8", "replace"))
    members = {m["path"]: m["payload"] for m in parse_zip(data)}
    fmt, parts, _meta = _container_parts(members)
    return fmt, parts


def sniff_fb2(data: bytes) -> bool:
    """FictionBook2: bare XML whose root element is <FictionBook>."""
    head = data[:256].lstrip().lower()
    return head.startswith(b"<?xml") and b"<fictionbook" in head


def _fb2_sections(body: str) -> list[str]:
    """Top-level <section> spans of one FB2 <body> (sections nest;
    only depth-1 spans become parts, keeping their inner markup for
    the shared Catalyst text chain)."""
    out = []
    depth = 0
    start = -1
    for m in re.finditer(r"<(/?)section\b[^>]*>", body):
        if m.group(1):
            depth -= 1
            if depth == 0 and start >= 0:
                out.append(body[start : m.start()])
                start = -1
            if depth < 0:
                raise ValueError("fb2: unbalanced section tags")
        else:
            if depth == 0:
                start = m.end()
            depth += 1
    if depth != 0:
        raise ValueError("fb2: unbalanced section tags")
    return out


def _fb2_parts(text: str) -> list[tuple[str, str]]:
    """One part per top-level section across every <body> (the notes
    body included — its sections are footnote text, still text)."""
    parts: list[tuple[str, str]] = []
    for bm in re.finditer(r"<body\b[^>]*>(.*?)</body\s*>", text,
                          re.DOTALL | re.IGNORECASE):
        for sec in _fb2_sections(bm.group(1)):
            parts.append((f"section{len(parts)}", sec))
    if not parts:
        raise ValueError("fb2: no body sections")
    return parts


def _fb2_info(text: str) -> dict:
    def first(tag: str) -> str:
        m = re.search(
            rf"<{tag}\b[^>]*>(.*?)</{tag}\s*>", text,
            re.DOTALL | re.IGNORECASE,
        )
        return re.sub(r"<[^>]+>", " ", m.group(1)).strip() if m else ""

    author = ""
    am = re.search(r"<author\b[^>]*>(.*?)</author\s*>", text,
                   re.DOTALL | re.IGNORECASE)
    if am:
        names = re.findall(
            r"<(?:first|middle|last)-name\b[^>]*>(.*?)</[a-z-]+\s*>",
            am.group(1), re.DOTALL | re.IGNORECASE,
        )
        author = " ".join(n.strip() for n in names if n.strip())
    return {
        "doc_format": "fb2",
        "title": first("book-title"),
        "creator": author,
        "language": first("lang"),
        "n_parts": len(_fb2_parts(text)),
    }


def _container_parts(
    members: dict[str, bytes],
) -> tuple[str, list[tuple[str, str]], str]:
    """Shared container walk over an already-inflated member dict →
    ``(doc_format, parts, meta_xml)`` where ``meta_xml`` is the
    format's metadata member (OPF for EPUB, docProps/core.xml for
    DOCX, meta.xml for ODT; empty when absent) — so
    :func:`office_info_of` never inflates the ZIP a second time."""
    mime = bytes(members.get("mimetype", b"")).strip()

    if mime == _EPUB_MIME:
        container = members.get("META-INF/container.xml")
        if container is None:
            raise ValueError("epub: missing META-INF/container.xml")
        rootfiles = _tags(container.decode("utf-8", "replace"), "rootfile")
        opf_path = next(
            (p for t in rootfiles if (p := _attr(t, "full-path"))), None
        )
        if opf_path is None or opf_path not in members:
            raise ValueError("epub: container names no readable rootfile")
        opf = members[opf_path].decode("utf-8", "replace")
        opf_dir = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
        hrefs = {}
        for t in _tags(opf, "item"):
            iid, href = _attr(t, "id"), _attr(t, "href")
            if iid and href:
                hrefs[iid] = href
        spine = [
            idref
            for t in _tags(opf, "itemref")
            if (idref := _attr(t, "idref"))
        ]
        if not spine:
            raise ValueError("epub: OPF spine is empty")
        if len(spine) > MAX_SPINE_PARTS:
            raise ValueError(
                f"epub: spine over {MAX_SPINE_PARTS} parts (bomb)"
            )
        parts = []
        for idref in spine:
            href = hrefs.get(idref)
            if href is None:
                raise ValueError(f"epub: spine idref {idref!r} not in manifest")
            path = _resolve(opf_dir, href)
            body = members.get(path)
            if body is None:
                raise ValueError(f"epub: spine document {path!r} missing")
            parts.append((path, body.decode("utf-8", "replace")))
        return "epub", parts, opf

    if mime == _ODT_MIME:
        body = members.get("content.xml")
        if body is None:
            raise ValueError("odt: missing content.xml")
        meta = members.get("meta.xml", b"").decode("utf-8", "replace")
        return "odt", [("content.xml", body.decode("utf-8", "replace"))], meta

    if mime in (_ODS_MIME, _ODP_MIME):
        # ODS: one part per <table:table> in document order, named by
        # table:name; ODP: one part per <draw:page>, named by
        # draw:name — the ODF mirror of the xlsx-sheet / pptx-slide
        # shapes, text still extracted Catalyst-side from the raw XML
        fmt = "ods" if mime == _ODS_MIME else "odp"
        body = members.get("content.xml")
        if body is None:
            raise ValueError(f"{fmt}: missing content.xml")
        xml = body.decode("utf-8", "replace")
        elem, attr, slug = (
            ("table:table", "table:name", "table")
            if fmt == "ods"
            else ("draw:page", "draw:name", "page")
        )
        found = _named_elements(xml, elem, attr)
        if not found:
            raise ValueError(f"{fmt}: content.xml has no {elem} elements")
        if len(found) > MAX_SPINE_PARTS:
            raise ValueError(
                f"{fmt}: over {MAX_SPINE_PARTS} {elem} parts (bomb)"
            )
        parts = [
            (nm or f"{slug}{i + 1}", part_xml)
            for i, (nm, part_xml) in enumerate(found)
        ]
        meta = members.get("meta.xml", b"").decode("utf-8", "replace")
        return fmt, parts, meta

    body = members.get("word/document.xml")
    if body is not None:
        meta = members.get("docProps/core.xml", b"").decode(
            "utf-8", "replace"
        )
        return (
            "docx",
            [("word/document.xml", body.decode("utf-8", "replace"))],
            meta,
        )

    pres = members.get("ppt/presentation.xml")
    if pres is not None:
        xml = pres.decode("utf-8", "replace")
        lst = xml.split("<p:sldIdLst")
        slide_rids: list[str] = []
        if len(lst) > 1:
            for t in _tags(lst[1].split("</p:sldIdLst>")[0], "p:sldId"):
                rid = _attr(t, "r:id")
                if rid:
                    slide_rids.append(rid)
        if not slide_rids:
            raise ValueError("pptx: presentation has no slide list")
        if len(slide_rids) > MAX_SPINE_PARTS:
            raise ValueError(
                f"pptx: slide list over {MAX_SPINE_PARTS} parts (bomb)"
            )
        rels = _rels_of(members, "ppt/_rels/presentation.xml.rels")
        parts = []
        for rid in slide_rids:
            path, body = _opc_part(members, rels, rid, "ppt/", "pptx")
            parts.append((path, body.decode("utf-8", "replace")))
        meta = members.get("docProps/core.xml", b"").decode(
            "utf-8", "replace"
        )
        return "pptx", parts, meta

    wb = members.get("xl/workbook.xml")
    if wb is not None:
        xml = wb.decode("utf-8", "replace")
        sheet_rids = []
        for t in _tags(xml, "sheet"):
            rid = _attr(t, "r:id")
            if rid:
                sheet_rids.append(rid)
        if not sheet_rids:
            raise ValueError("xlsx: workbook has no sheets")
        if len(sheet_rids) > MAX_SPINE_PARTS:
            raise ValueError(
                f"xlsx: sheet list over {MAX_SPINE_PARTS} parts (bomb)"
            )
        rels = _rels_of(members, "xl/_rels/workbook.xml.rels")
        shared = _shared_strings(members.get("xl/sharedStrings.xml"))
        parts = []
        for rid in sheet_rids:
            path, body = _opc_part(members, rels, rid, "xl/", "xlsx")
            parts.append(
                (path, _sheet_to_part(body.decode("utf-8", "replace"),
                                      shared))
            )
        meta = members.get("docProps/core.xml", b"").decode(
            "utf-8", "replace"
        )
        return "xlsx", parts, meta

    raise ValueError(
        "office: zip is not a DOCX/EPUB/ODT/PPTX/XLSX container "
        "(no word/document.xml, ppt/presentation.xml, xl/workbook.xml, "
        "epub mimetype, or odt mimetype)"
    )


def office_parts(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Explode office/ebook payloads into one row per text-bearing XML
    part: ``(id, doc_format, part_idx, part_name, xml, error)``.

    One Arrow task per file (the ``archive_members`` fan-out shape);
    a malformed container yields a single row carrying the error.
    """

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = {
                k: []
                for k in (
                    "doc_id", "doc_format", "part_idx", "part_name",
                    "xml", "error",
                )
            }

            def emit(did, fmt=None, idx=None, name=None, xml=None, err=None):
                out["doc_id"].append(did)
                out["doc_format"].append(fmt)
                out["part_idx"].append(idx)
                out["part_name"].append(name)
                out["xml"].append(xml)
                out["error"].append(err)

            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    emit(did, err="ValueError: null office payload")
                    continue
                try:
                    fmt, parts = office_parts_of(bytes(payload))
                except ValueError as exc:
                    emit(did, err=f"{type(exc).__name__}: {str(exc)[:200]}")
                    continue
                for idx, (name, xml) in enumerate(parts):
                    emit(did, fmt, idx, name, xml)
            yield pd.DataFrame(out)

    return df.mapInPandas(
        run,
        "doc_id long, doc_format string, part_idx long, "
        "part_name string, xml string, error string",
    )


def office_text_col(xml: Column) -> Column:
    """One XML part → visible text, Catalyst-only: tags → space,
    entity decode, whitespace collapse, trim — the html tier's
    ``_clean_cell`` semantics (office XML has no script/style
    subtrees to drop)."""
    from ..functions.html import _decode_entities

    no_tags = F.regexp_replace(xml, "<[^>]+>", " ")
    return F.trim(F.regexp_replace(_decode_entities(no_tags), "\\s+", " "))


def office_text(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Office/ebook payloads → per-part visible text rows
    ``(id, doc_format, part_idx, part_name, text, error)``."""
    parts = office_parts(df, payload_col, id_col)
    return parts.select(
        "doc_id",
        "doc_format",
        "part_idx",
        "part_name",
        F.when(
            parts["xml"].isNotNull(), office_text_col(parts["xml"])
        ).alias("text"),
        "error",
    )


# ---------------------------------------------------------------------------
# Fixture writers
# ---------------------------------------------------------------------------


def _xml_escape(text: str) -> str:
    return (
        text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def build_fb2(
    sections: list[str],
    *,
    title: str = "",
    author: tuple[str, str] | None = None,
    language: str = "",
    notes: list[str] | None = None,
) -> bytes:
    """Minimal valid FictionBook2: description (title-info with
    book-title / author / lang), one main <body> with one section per
    entry, and an optional name="notes" body."""
    desc = ""
    if title or author or language:
        fields = ""
        if title:
            fields += f"<book-title>{_xml_escape(title)}</book-title>"
        if author:
            fields += (
                "<author><first-name>" + _xml_escape(author[0])
                + "</first-name><last-name>" + _xml_escape(author[1])
                + "</last-name></author>"
            )
        if language:
            fields += f"<lang>{_xml_escape(language)}</lang>"
        desc = ("<description><title-info>" + fields
                + "</title-info></description>")
    body = "".join(
        "<section><p>" + _xml_escape(s) + "</p></section>"
        for s in sections
    )
    out = ('<?xml version="1.0" encoding="utf-8"?>'
           '<FictionBook xmlns="http://www.gribuser.ru/xml/fictionbook/2.0">'
           + desc + "<body>" + body + "</body>")
    if notes:
        out += ('<body name="notes">' + "".join(
            "<section><p>" + _xml_escape(s) + "</p></section>"
            for s in notes
        ) + "</body>")
    return (out + "</FictionBook>").encode("utf-8")


def build_docx(
    paragraphs: list[str],
    *,
    title: str | None = None,
    creator: str | None = None,
) -> bytes:
    """Minimal valid OPC/WordprocessingML: [Content_Types].xml plus
    word/document.xml with one ``<w:p><w:r><w:t>`` run per paragraph;
    with ``title``/``creator`` a ``docProps/core.xml`` core-properties
    part is added."""
    from .archive import build_zip

    body = "".join(
        '<w:p><w:r><w:t xml:space="preserve">'
        + _xml_escape(p)
        + "</w:t></w:r></w:p>"
        for p in paragraphs
    )
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        + body
        + "</w:body></w:document>"
    )
    types = (
        '<?xml version="1.0"?><Types xmlns="http://schemas.'
        'openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/word/document.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.wordprocessingml.document.'
        'main+xml"/></Types>'
    )
    members = [
        ("[Content_Types].xml", types.encode()),
        ("word/document.xml", doc.encode()),
    ]
    if title is not None or creator is not None:
        core = (
            '<?xml version="1.0"?><cp:coreProperties xmlns:cp="http://'
            'schemas.openxmlformats.org/package/2006/metadata/'
            'core-properties" xmlns:dc="http://purl.org/dc/elements/1.1/">'
            + (f"<dc:title>{_xml_escape(title)}</dc:title>" if title else "")
            + (
                f"<dc:creator>{_xml_escape(creator)}</dc:creator>"
                if creator
                else ""
            )
            + "</cp:coreProperties>"
        )
        members.append(("docProps/core.xml", core.encode()))
    return build_zip(members)


def build_epub(
    chapters: list[str],
    *,
    title: str = "Fixture",
    creator: str | None = None,
    language: str | None = None,
) -> bytes:
    """Minimal valid OCF/EPUB: mimetype, container.xml, OPF with
    manifest+spine, one XHTML document per chapter (spine order);
    ``creator``/``language`` (and a truthy ``title``) land as Dublin
    Core fields in the OPF metadata block."""
    from .archive import build_zip

    members: list[tuple[str, bytes]] = [
        ("mimetype", _EPUB_MIME),
        (
            "META-INF/container.xml",
            (
                '<?xml version="1.0"?><container version="1.0" '
                'xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
                '<rootfiles><rootfile full-path="OPS/content.opf" '
                'media-type="application/oebps-package+xml"/></rootfiles>'
                "</container>"
            ).encode(),
        ),
    ]
    items, refs = [], []
    for i, text in enumerate(chapters):
        name = f"ch{i}.xhtml"
        items.append(
            f'<item id="c{i}" href="text/{name}" '
            'media-type="application/xhtml+xml"/>'
        )
        refs.append(f'<itemref idref="c{i}"/>')
        xhtml = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<html xmlns="http://www.w3.org/1999/xhtml"><head><title>'
            + _xml_escape(f"{title} {i}" if title else "")
            + "</title></head><body><p>"
            + _xml_escape(text)
            + "</p></body></html>"
        )
        members.append((f"OPS/text/{name}", xhtml.encode()))
    dc = (
        (f"<dc:title>{_xml_escape(title)}</dc:title>" if title else "")
        + (f"<dc:creator>{_xml_escape(creator)}</dc:creator>" if creator else "")
        + (f"<dc:language>{language}</dc:language>" if language else "")
    )
    meta_block = (
        '<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">'
        + dc
        + "</metadata>"
        if dc
        else "<metadata/>"
    )
    opf = (
        '<?xml version="1.0"?><package xmlns="http://www.idpf.org/2007/opf" '
        'version="3.0" unique-identifier="id">' + meta_block
        + "<manifest>" + "".join(items) + "</manifest>"
        "<spine>" + "".join(refs) + "</spine></package>"
    )
    members.insert(2, ("OPS/content.opf", opf.encode()))
    return build_zip(members)


_ODF_CONTENT_HEAD = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<office:document-content xmlns:office="urn:oasis:names:tc:'
    'opendocument:xmlns:office:1.0" xmlns:text="urn:oasis:names:tc:'
    'opendocument:xmlns:text:1.0" xmlns:table="urn:oasis:names:tc:'
    'opendocument:xmlns:table:1.0" xmlns:draw="urn:oasis:names:tc:'
    'opendocument:xmlns:drawing:1.0"><office:body>'
)


def _odf_zip(
    mime: bytes, content: str, title: str | None, creator: str | None
) -> bytes:
    """Assemble an ODF container: stored ``mimetype`` first (ODF 1.3
    part 3 §2.2.4 — sniffers read it in place), content.xml, optional
    Dublin Core meta.xml."""
    from .archive import build_zip

    members = [("mimetype", mime), ("content.xml", content.encode())]
    if title is not None or creator is not None:
        meta = (
            '<?xml version="1.0"?><office:document-meta xmlns:office='
            '"urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
            'xmlns:dc="http://purl.org/dc/elements/1.1/"><office:meta>'
            + (f"<dc:title>{_xml_escape(title)}</dc:title>" if title else "")
            + (
                f"<dc:creator>{_xml_escape(creator)}</dc:creator>"
                if creator
                else ""
            )
            + "</office:meta></office:document-meta>"
        )
        members.append(("meta.xml", meta.encode()))
    return build_zip(members, store_paths=frozenset(["mimetype"]))


def build_odt(
    paragraphs: list[str],
    *,
    title: str | None = None,
    creator: str | None = None,
) -> bytes:
    """Minimal valid ODF text document: mimetype plus content.xml with
    one ``<text:p>`` per paragraph; ``title``/``creator`` land in a
    ``meta.xml`` part as Dublin Core fields."""
    body = "".join(
        "<text:p>" + _xml_escape(p) + "</text:p>" for p in paragraphs
    )
    content = (
        _ODF_CONTENT_HEAD + "<office:text>" + body
        + "</office:text></office:body></office:document-content>"
    )
    return _odf_zip(_ODT_MIME, content, title, creator)


def build_ods(
    sheets: list[tuple[str, list[list[str]]]],
    *,
    title: str | None = None,
    creator: str | None = None,
) -> bytes:
    """Minimal valid ODF spreadsheet: one ``<table:table>`` per
    ``(name, rows)`` entry, each cell a string-valued
    ``<table:table-cell>`` with its ``<text:p>`` body."""
    tables = "".join(
        f'<table:table table:name="{_xml_escape(nm)}">'
        + "".join(
            "<table:table-row>"
            + "".join(
                '<table:table-cell office:value-type="string"><text:p>'
                + _xml_escape(c)
                + "</text:p></table:table-cell>"
                for c in row
            )
            + "</table:table-row>"
            for row in rows
        )
        + "</table:table>"
        for nm, rows in sheets
    )
    content = (
        _ODF_CONTENT_HEAD + "<office:spreadsheet>" + tables
        + "</office:spreadsheet></office:body></office:document-content>"
    )
    return _odf_zip(_ODS_MIME, content, title, creator)


def build_odp(
    slides: list[str],
    *,
    title: str | None = None,
    creator: str | None = None,
) -> bytes:
    """Minimal valid ODF presentation: one ``<draw:page>`` per slide
    text, the paragraph riding a frame's text box as Impress writes."""
    pages = "".join(
        f'<draw:page draw:name="page{i + 1}"><draw:frame>'
        "<draw:text-box><text:p>" + _xml_escape(s) + "</text:p>"
        "</draw:text-box></draw:frame></draw:page>"
        for i, s in enumerate(slides)
    )
    content = (
        _ODF_CONTENT_HEAD + "<office:presentation>" + pages
        + "</office:presentation></office:body></office:document-content>"
    )
    return _odf_zip(_ODP_MIME, content, title, creator)


def _core_props(title: str | None, creator: str | None) -> bytes:
    return (
        '<?xml version="1.0"?><cp:coreProperties xmlns:cp="http://'
        'schemas.openxmlformats.org/package/2006/metadata/'
        'core-properties" xmlns:dc="http://purl.org/dc/elements/1.1/">'
        + (f"<dc:title>{_xml_escape(title)}</dc:title>" if title else "")
        + (
            f"<dc:creator>{_xml_escape(creator)}</dc:creator>"
            if creator
            else ""
        )
        + "</cp:coreProperties>"
    ).encode()


def build_pptx(
    slides: list[str],
    *,
    title: str | None = None,
    creator: str | None = None,
) -> bytes:
    """Minimal valid OPC/PresentationML: presentation.xml with a
    ``<p:sldIdLst>`` ordering the slides, the .rels part resolving
    each ``r:id``, and one ``slides/slideN.xml`` per entry carrying a
    single ``<a:t>`` text run.  Relationship ids are deliberately
    emitted in REVERSED .rels file order so a reader that ignores
    ``sldIdLst`` order fails the fixtures."""
    from .archive import build_zip

    types = (
        '<?xml version="1.0"?><Types xmlns="http://schemas.'
        'openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/ppt/presentation.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.presentationml.'
        'presentation.main+xml"/></Types>'
    )
    sld_ids = "".join(
        f'<p:sldId id="{256 + i}" r:id="rId{i + 2}"/>'
        for i in range(len(slides))
    )
    pres = (
        '<?xml version="1.0"?><p:presentation xmlns:p="http://schemas.'
        'openxmlformats.org/presentationml/2006/main" xmlns:r="http://'
        'schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<p:sldIdLst>{sld_ids}</p:sldIdLst></p:presentation>"
    )
    rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.'
        'openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 2}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/slide"
            f'" Target="slides/slide{i + 1}.xml"/>'
            for i in reversed(range(len(slides)))
        )
        + "</Relationships>"
    )
    members = [
        ("[Content_Types].xml", types.encode()),
        ("ppt/presentation.xml", pres.encode()),
        ("ppt/_rels/presentation.xml.rels", rels.encode()),
    ]
    for i, text in enumerate(slides):
        slide = (
            '<?xml version="1.0"?><p:sld xmlns:p="http://schemas.'
            'openxmlformats.org/presentationml/2006/main" xmlns:a="http://'
            'schemas.openxmlformats.org/drawingml/2006/main">'
            "<p:cSld><p:spTree><p:sp><p:txBody><a:p><a:r><a:t>"
            + _xml_escape(text)
            + "</a:t></a:r></a:p></p:txBody></p:sp></p:spTree></p:cSld>"
            "</p:sld>"
        )
        members.append((f"ppt/slides/slide{i + 1}.xml", slide.encode()))
    if title is not None or creator is not None:
        members.append(("docProps/core.xml", _core_props(title, creator)))
    return build_zip(members)


def build_xlsx(
    sheets: list[list[list[str]]],
    *,
    title: str | None = None,
    creator: str | None = None,
    inline_every: int = 3,
) -> bytes:
    """Minimal valid OPC/SpreadsheetML: workbook.xml ordering the
    sheets, the .rels part, one ``worksheets/sheetN.xml`` per sheet,
    and ``xl/sharedStrings.xml``.  Cells that look numeric
    (``int()``-parseable) are written as plain ``<v>`` values; every
    ``inline_every``-th string cell is written as an ``inlineStr``
    (so both string paths are exercised); the rest go through the
    shared-string table."""
    from .archive import build_zip

    types = (
        '<?xml version="1.0"?><Types xmlns="http://schemas.'
        'openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        "</Types>"
    )
    shared: list[str] = []
    sheet_parts: list[bytes] = []
    n_str = 0
    for rows in sheets:
        body = []
        for r, row in enumerate(rows):
            cells = []
            for c, val in enumerate(row):
                ref = f"{chr(65 + (c % 26))}{r + 1}"
                try:
                    int(val)
                    cells.append(f'<c r="{ref}"><v>{val}</v></c>')
                    continue
                except ValueError:
                    pass
                n_str += 1
                if n_str % inline_every == 0:
                    cells.append(
                        f'<c r="{ref}" t="inlineStr"><is>'
                        f'<t xml:space="preserve">{_xml_escape(val)}</t>'
                        "</is></c>"
                    )
                else:
                    shared.append(val)
                    cells.append(
                        f'<c r="{ref}" t="s"><v>{len(shared) - 1}</v></c>'
                    )
            body.append(f'<row r="{r + 1}">' + "".join(cells) + "</row>")
        sheet_parts.append(
            (
                '<?xml version="1.0"?><worksheet xmlns="http://schemas.'
                'openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
                + "".join(body)
                + "</sheetData></worksheet>"
            ).encode()
        )
    wb = (
        '<?xml version="1.0"?><workbook xmlns="http://schemas.'
        'openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://'
        'schemas.openxmlformats.org/officeDocument/2006/relationships">'
        "<sheets>"
        + "".join(
            f'<sheet name="S{i + 1}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i in range(len(sheets))
        )
        + "</sheets></workbook>"
    )
    rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.'
        'openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/worksheet"
            f'" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheets))
        )
        + "</Relationships>"
    )
    sst = (
        '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.'
        f'org/spreadsheetml/2006/main" count="{len(shared)}" '
        f'uniqueCount="{len(shared)}">'
        + "".join(
            f'<si><t xml:space="preserve">{_xml_escape(s)}</t></si>'
            for s in shared
        )
        + "</sst>"
    )
    members = [
        ("[Content_Types].xml", types.encode()),
        ("xl/workbook.xml", wb.encode()),
        ("xl/_rels/workbook.xml.rels", rels.encode()),
        ("xl/sharedStrings.xml", sst.encode()),
    ]
    for i, part in enumerate(sheet_parts):
        members.append((f"xl/worksheets/sheet{i + 1}.xml", part))
    if title is not None or creator is not None:
        members.append(("docProps/core.xml", _core_props(title, creator)))
    return build_zip(members)


# ---------------------------------------------------------------------------
# Document metadata (title/creator/language)
# ---------------------------------------------------------------------------

_XML_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                 ("&apos;", "'"), ("&amp;", "&"))  # &amp; last


def _xml_unescape(text: str) -> str:
    for ent, ch in _XML_ENTITIES:
        text = text.replace(ent, ch)
    return text


def _dc(xml: str, tag: str) -> str:
    """First ``<dc:tag ...>text</dc:tag>`` body, linear find — Dublin
    Core fields as OPF/OPC/ODF metadata all use the ``dc:`` prefix."""
    for chunk in xml.split(f"<dc:{tag}")[1:]:
        if chunk[:1] not in (" ", "\t", "\n", "\r", ">", "/"):
            continue
        gt = chunk.find(">")
        if gt < 0 or chunk[gt - 1 : gt] == "/":
            continue
        lt = chunk.find("<", gt + 1)
        return _xml_unescape(chunk[gt + 1 : lt if lt >= 0 else len(chunk)])
    return ""


def office_info_of(data: bytes) -> dict:
    """One office/ebook file → document metadata
    ``{doc_format, title, creator, language, n_parts}`` (empty strings
    when a field or its carrying member is absent — absence is data).

    Metadata members per format: EPUB reads the OPF ``<metadata>``
    block, DOCX/PPTX/XLSX ``docProps/core.xml`` (OPC core properties),
    ODT ``meta.xml`` — all Dublin Core ``dc:`` fields.  Legacy binary
    Office (.doc/.xls/.ppt — OLE2/CFB containers,
    :mod:`.cfb`) reads the ``\\x05SummaryInformation`` property set;
    ``n_parts`` counts the container's streams, language is always
    absent (the property set has no language field).
    """
    from .cfb import classify_cfb, parse_cfb, parse_summary_info, sniff_cfb
    from .mobi import parse_mobi, sniff_mobi
    from .rtf import rtf_extract, sniff_rtf

    if sniff_mobi(data):
        m = parse_mobi(data)
        return {
            "doc_format": m["format"],
            "title": m["title"],
            "creator": m["author"],
            "language": m["language"],
            "n_parts": 1,
        }
    if sniff_fb2(data):
        return _fb2_info(data.decode("utf-8", "replace"))
    if sniff_rtf(data):
        _text, info = rtf_extract(data)
        return {
            "doc_format": "rtf",
            "title": info.get("title", ""),
            "creator": info.get("author", ""),
            "language": "",
            "n_parts": 1,
        }
    if sniff_cfb(data):
        parsed = parse_cfb(data)
        entries = parsed["entries"]
        info = {"title": "", "subject": "", "author": "", "app_name": ""}
        for e in entries:
            if e["name"] == "\x05SummaryInformation" and e["payload"]:
                info = parse_summary_info(e["payload"])
                break
        return {
            "doc_format": classify_cfb(entries),
            "title": info["title"],
            "creator": info["author"],
            "language": "",
            "n_parts": sum(1 for e in entries if e["type"] == 2),
        }
    members = {m["path"]: m["payload"] for m in parse_zip(data)}
    fmt, parts, meta_xml = _container_parts(members)
    return {
        "doc_format": fmt,
        "title": _dc(meta_xml, "title"),
        "creator": _dc(meta_xml, "creator"),
        "language": _dc(meta_xml, "language"),
        "n_parts": len(parts),
    }


def office_info(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Office/ebook payloads → one metadata row per document
    ``(id, doc_format, title, creator, language, n_parts, error)``."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = {
                k: []
                for k in ("doc_id", "doc_format", "title", "creator",
                          "language", "n_parts", "error")
            }
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    if payload is None:
                        raise ValueError("null office payload")
                    info = office_info_of(bytes(payload))
                except ValueError as exc:
                    info = {"doc_format": None, "title": None,
                            "creator": None, "language": None,
                            "n_parts": None}
                    out["error"].append(
                        f"{type(exc).__name__}: {str(exc)[:200]}"
                    )
                else:
                    out["error"].append(None)
                out["doc_id"].append(did)
                for k in ("doc_format", "title", "creator", "language",
                          "n_parts"):
                    out[k].append(info[k])
            yield pd.DataFrame(out)

    return df.mapInPandas(
        run,
        "doc_id long, doc_format string, title string, creator string, "
        "language string, n_parts long, error string",
    )
