"""DjVu container census — the scanned-document format of archival
corpora (Internet-Archive-class collections ship millions of DjVu
files).

Public structure (DjVu v3 reference, djvu.org): an ``AT&T`` magic
prefix, then an IFF85 chunk stream — ``FORM:DJVU`` for a single page,
``FORM:DJVM`` for a multipage document whose first chunk is ``DIRM``
(flags byte, big-endian component count, bundled offsets) followed by
the component ``FORM`` chunks, each padded to even offsets.  The
page's leading ``INFO`` chunk carries width/height (big-endian),
version bytes, and — a classic DjVu quirk — a LITTLE-endian dpi.

This module is a CENSUS tier by design: page geometry, component
counts, chunk inventories, and text/annotation presence flags.  The
compressed payloads (JB2 masks, IW44 wavelets, and the BZZ-compressed
``TXTz`` hidden-text and ``DIRM`` metadata) stay a documented loud
boundary — BZZ's ZP-coder probability tables are not transcribable
offline, the same honesty rule as the other entropy-coded refusals
(COVERAGE.md).  Presence flags still let a curation pass select
text-carrying scans before any decode.

Reference behavioral parity: the reference transport stores opaque
named byte arrays (RawdataMessage.java:15-60); container censuses are
this repo's derived multimodal tier.
"""

from __future__ import annotations

import struct

MAX_CHUNKS = 4096
MAX_COMPONENTS = 1 << 16


def sniff_djvu(data: bytes) -> bool:
    return data[:8] == b"AT&TFORM"


def _chunks(data: bytes, pos: int, end: int):
    """IFF85 sibling-chunk walk: 4CC + BE32 length + payload, padded
    to even offsets."""
    n = 0
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack(">I", data[pos + 4 : pos + 8])
        body_end = pos + 8 + ln
        if body_end > end:
            raise ValueError(f"djvu: chunk {tag!r} past container end")
        yield tag, pos + 8, ln
        n += 1
        if n > MAX_CHUNKS:
            raise ValueError("djvu: chunk count over the cap")
        pos = body_end + (ln & 1)  # even padding
    if pos != end:
        raise ValueError("djvu: trailing bytes after the last chunk")


def _parse_info(data: bytes, pos: int, ln: int) -> dict:
    if ln < 10:
        raise ValueError("djvu: INFO chunk shorter than 10 bytes")
    width, height, minor, major = struct.unpack(
        ">HHBB", data[pos : pos + 6]
    )
    (dpi,) = struct.unpack("<H", data[pos + 6 : pos + 8])  # little!
    gamma = data[pos + 8]
    if width == 0 or height == 0:
        raise ValueError("djvu: INFO with zero page dimensions")
    return {"width": width, "height": height,
            "version": f"{major}.{minor}", "dpi": dpi,
            "gamma": gamma / 10.0}


def _page_census(data: bytes, pos: int, end: int) -> dict:
    """One FORM:DJVU payload → INFO fields + chunk inventory."""
    out = {"chunks": [], "has_text": False, "has_fg": False,
           "has_bg": False, "has_mask": False, "has_anno": False}
    first = True
    for tag, cpos, ln in _chunks(data, pos, end):
        name = tag.decode("latin-1")
        out["chunks"].append(name)
        if first:
            if tag != b"INFO":
                raise ValueError(
                    "djvu: page does not start with an INFO chunk"
                )
            out.update(_parse_info(data, cpos, ln))
            first = False
        elif tag in (b"TXTz", b"TXTa"):
            out["has_text"] = True
        elif tag in (b"FG44", b"FGbz"):
            out["has_fg"] = True
        elif tag == b"BG44":
            out["has_bg"] = True
        elif tag == b"Sjbz":
            out["has_mask"] = True
        elif tag in (b"ANTz", b"ANTa"):
            out["has_anno"] = True
    if first:
        raise ValueError("djvu: page carries no chunks")
    return out


def parse_djvu(data: bytes) -> dict:
    """DjVu payload → ``{"kind", "n_components", "n_pages", page
    fields of the first page, "chunks", presence flags}``.

    ``kind``: ``single`` (FORM:DJVU), ``bundled`` (FORM:DJVM with
    in-file components) or ``indirect`` (FORM:DJVM whose components
    live in sibling files — metadata only)."""
    if not sniff_djvu(data):
        raise ValueError("djvu: missing AT&T FORM magic")
    if len(data) < 16:
        raise ValueError("djvu: header shorter than 16 bytes")
    (total,) = struct.unpack(">I", data[8:12])
    form_end = 12 + total
    if form_end > len(data):
        raise ValueError("djvu: FORM length past end of file")
    form_type = data[12:16]
    if form_type == b"DJVU":
        page = _page_census(data, 16, form_end)
        return dict(page, kind="single", n_components=1, n_pages=1)
    if form_type != b"DJVM":
        raise ValueError(
            f"djvu: unsupported top-level FORM type {form_type!r}"
        )
    kind = "indirect"
    n_components = 0
    first_page = None
    n_pages = 0
    saw_dirm = False
    for tag, cpos, ln in _chunks(data, 16, form_end):
        if tag == b"DIRM":
            if ln < 3:
                raise ValueError("djvu: DIRM chunk shorter than 3 bytes")
            flags = data[cpos]
            (n_components,) = struct.unpack(
                ">H", data[cpos + 1 : cpos + 3]
            )
            if n_components > MAX_COMPONENTS:
                raise ValueError("djvu: DIRM component count over cap")
            kind = "bundled" if flags & 0x80 else "indirect"
            saw_dirm = True
        elif tag == b"FORM":
            sub = data[cpos : cpos + 4]
            if sub == b"DJVU":
                n_pages += 1
                if first_page is None:
                    first_page = _page_census(data, cpos + 4, cpos + ln)
        # NAVM / other shared components: census only
    if not saw_dirm:
        raise ValueError("djvu: DJVM without a DIRM directory")
    if kind == "bundled" and first_page is None:
        raise ValueError("djvu: bundled document with no DJVU page")
    out = dict(first_page or {
        "width": 0, "height": 0, "version": "", "dpi": 0, "gamma": 0.0,
        "chunks": [], "has_text": False, "has_fg": False,
        "has_bg": False, "has_mask": False, "has_anno": False,
    })
    out.update(kind=kind, n_components=n_components, n_pages=n_pages)
    return out


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------


def _chunk(tag: bytes, body: bytes) -> bytes:
    out = tag + struct.pack(">I", len(body)) + body
    if len(body) & 1:
        out += b"\x00"
    return out


def _info(width: int, height: int, dpi: int = 300,
          version: tuple[int, int] = (26, 0)) -> bytes:
    # INFO stores the minor version byte before the major one; the
    # ubiquitous on-disk value is minor 26, major 0 → "0.26"
    minor, major = version
    return _chunk(b"INFO", struct.pack(">HHBB", width, height, minor,
                                       major)
                  + struct.pack("<H", dpi) + bytes([22, 1]))


def build_djvu_page(
    width: int, height: int, *, dpi: int = 300, text: bool = False,
    anno: bool = False, color: bool = False,
) -> bytes:
    """One FORM:DJVU page with an INFO chunk and census-only stand-in
    payload chunks (opaque compressed bodies by design)."""
    body = _info(width, height, dpi)
    body += _chunk(b"Sjbz", b"\x00JB2-opaque\x01")
    if color:
        body += _chunk(b"BG44", b"\x00IW44-opaque")
        body += _chunk(b"FG44", b"\x00IW44-fg!")
    if text:
        body += _chunk(b"TXTz", b"\x00BZZ-opaque")
    if anno:
        body += _chunk(b"ANTz", b"\x00BZZ-anno")
    return _chunk(b"FORM", b"DJVU" + body)


def build_djvu(
    pages: list[dict], *, bundled: bool = True
) -> bytes:
    """Single-page (one entry) or DJVM multipage document; each entry
    is a :func:`build_djvu_page` kwargs dict."""
    forms = [build_djvu_page(**p) for p in pages]
    if len(pages) == 1:
        return b"AT&T" + forms[0]
    flags = 0x80 if bundled else 0
    dirm_body = bytes([flags]) + struct.pack(">H", len(forms))
    if bundled:
        # component offsets from file start (header 4 + FORM hdr 12 +
        # DIRM chunk), as the bundled layout requires
        dirm_len = 8 + len(dirm_body) + 4 * len(forms)
        dirm_len += dirm_len & 1
        pos = 4 + 12 + dirm_len
        offs = []
        for f in forms:
            offs.append(pos)
            pos += len(f)
        dirm_body += b"".join(struct.pack(">I", o) for o in offs)
    body = _chunk(b"DIRM", dirm_body)
    if bundled:
        body += b"".join(forms)
    return b"AT&T" + _chunk(b"FORM", b"DJVM" + body)
