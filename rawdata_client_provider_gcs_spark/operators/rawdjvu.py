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

Census tier: page geometry, component counts, chunk inventories, and
text/annotation presence flags.  Text tier (r15): the BZZ-compressed
``TXTz`` hidden-text layer — pre-OCR'd text, the highest-value byte
range of a scanned corpus — decodes through :mod:`..sources.bzz`
(ZP-coder + inverse BWT) into the full text plus the word/line zone
tree.  Image tier (r16): the JB2 ``Sjbz`` bitonal mask
(:mod:`.rawjb2`) and IW44 ``BG44`` gray background (:mod:`.rawiw44`)
decode via :func:`extract_djvu_images`; their provenance tiers are
documented in those modules, and real-world conformance for ALL
ZP-coded layers is bounded by the ZP state-table transcription tiers
documented in ``sources/bzz.py`` (in-repo streams are exact; a
mis-transcribed state fails loudly with high probability — the bound
is probabilistic, see ``sources/bzz.py``).

Reference behavioral parity: the reference transport stores opaque
named byte arrays (RawdataMessage.java:15-60); container censuses are
this repo's derived multimodal tier.
"""

from __future__ import annotations

import re
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
    width: int, height: int, *, dpi: int = 300,
    text: bool | str = False, anno: bool | str = False,
    color: bool = False, mask: list | None = None,
    background=None, foreground=None,
    fg_palette: list | None = None,
    fg_indices: list | None = None,
) -> bytes:
    """One FORM:DJVU page with an INFO chunk.  By default the image
    payload chunks stay census-only stand-ins (opaque compressed
    bodies), but each layer can be made REAL (r15/r16 decode
    surfaces):

    - ``text`` — a string, or ``True`` for a default sample — embeds
      a ``TXTz`` hidden-text layer (zone tree through the BZZ
      encoder);
    - ``mask`` — a :func:`rawjb2.encode_jb2` marks list — embeds a
      JB2-coded ``Sjbz`` bitonal mask at the page size;
    - ``background`` — a (H, W) uint8 array, or a (Y, Cb, Cr) plane
      tuple — embeds an IW44-coded ``BG44`` gray or color
      background;
    - ``foreground`` — gray array or (Y, Cb, Cr) tuple — embeds an
      IW44-coded ``FG44`` foreground layer (the pixel-map alternative
      to the palette);
    - ``fg_palette`` (+ optional per-blit ``fg_indices``) — RGB
      triples — embeds an ``FGbz`` foreground palette keyed to the
      mask's blit order (:func:`build_fgbz`)."""
    from ..sources.bzz import bzz_encode

    body = _info(width, height, dpi)
    if mask is not None:
        from . import rawjb2

        body += _chunk(b"Sjbz", rawjb2.encode_jb2(width, height, mask))
        if fg_palette is not None:
            body += _chunk(b"FGbz", build_fgbz(fg_palette, fg_indices))
    elif background is None:
        # legacy census shape: an opaque compressed stand-in (pages
        # with a REAL background and no mask are photo pages — they
        # legitimately carry no Sjbz)
        body += _chunk(b"Sjbz", b"\x00JB2-opaque\x01")
    if background is not None:
        from . import rawiw44

        if isinstance(background, tuple):
            # (Y, Cb, Cr[, crcbdelay]) planes -> COLOR IW44 (r16)
            planes, delay = background[:3], 0
            if len(background) == 4:
                delay = int(background[3])
            body += _chunk(b"BG44",
                           rawiw44.encode_iw44_color(*planes,
                                                     delay=delay))
        else:
            body += _chunk(b"BG44", rawiw44.encode_iw44(background))
    if foreground is not None:
        from . import rawiw44

        if isinstance(foreground, tuple):
            body += _chunk(b"FG44",
                           rawiw44.encode_iw44_color(*foreground))
        else:
            body += _chunk(b"FG44", rawiw44.encode_iw44(foreground))
    if color:
        if background is None:
            body += _chunk(b"BG44", b"\x00IW44-opaque")
        if foreground is None:
            body += _chunk(b"FG44", b"\x00IW44-fg!")
    if text:
        if text is True:
            text = "scanned page text"
        body += _chunk(
            b"TXTz",
            bzz_encode(build_txt(text, width=width, height=height)),
        )
    if anno:
        if anno is True:
            anno = ('(maparea "https://example.org/scan" "link" '
                    '(rect 10 10 40 20)) (background #FFFFFF)')
        body += _chunk(b"ANTz", bzz_encode(anno.encode("utf-8")))
    return _chunk(b"FORM", b"DJVU" + body)


def build_djvu(
    pages: list[dict], *, bundled: bool = True,
    names: list | None = None, titles: list | None = None,
    bookmarks: list | None = None,
) -> bytes:
    """Single-page (one entry) or DJVM multipage document; each entry
    is a :func:`build_djvu_page` kwargs dict.  The DIRM directory
    carries a REAL BZZ-compressed tail (sizes/flags/IDs plus optional
    per-component ``names``/``titles``); ``bookmarks`` — a list of
    ``(n_children, description, url)`` — adds a BZZ ``NAVM`` chunk."""
    from ..sources.bzz import bzz_encode as _bzz

    forms = [build_djvu_page(**p) for p in pages]
    if len(pages) == 1 and not bookmarks:
        return b"AT&T" + forms[0]
    n = len(forms)
    flags = 0x81 if bundled else 0x01  # version 1
    dirm_head = bytes([flags]) + struct.pack(">H", n)
    navm = b""
    if bookmarks:
        nv = struct.pack(">H", len(bookmarks))
        for nkids, desc, url in bookmarks:
            d, u = desc.encode("utf-8"), url.encode("utf-8")
            nv += bytes([nkids]) + len(d).to_bytes(3, "big") + d \
                + len(u).to_bytes(3, "big") + u
        navm = _chunk(b"NAVM", _bzz(nv))
    # compressed tail: sizes, flags, id[/name/title] strings
    tail = bytearray()
    for f in forms:
        tail += len(f).to_bytes(3, "big")
    for i in range(n):
        cf = 1  # page
        if names and names[i] is not None:
            cf |= 0x80
        if titles and titles[i] is not None:
            cf |= 0x40
        tail.append(cf)
    for i in range(n):
        tail += f"p{i:04d}.djvu".encode() + b"\x00"
        if names and names[i] is not None:
            tail += names[i].encode("utf-8") + b"\x00"
        if titles and titles[i] is not None:
            tail += titles[i].encode("utf-8") + b"\x00"
    ztail = _bzz(bytes(tail))
    if bundled:
        # component offsets from file start (header 4 + FORM hdr 12 +
        # DIRM chunk [+ NAVM chunk]), as the bundled layout requires
        dirm_len = 8 + len(dirm_head) + 4 * n + len(ztail)
        dirm_len += dirm_len & 1
        pos = 4 + 12 + dirm_len + len(navm)
        offs = bytearray()
        for f in forms:
            offs += struct.pack(">I", pos)
            pos += len(f)
        dirm_body = dirm_head + bytes(offs) + ztail
    else:
        dirm_body = dirm_head + ztail
    body = _chunk(b"DIRM", dirm_body) + navm
    if bundled:
        body += b"".join(forms)
    return b"AT&T" + _chunk(b"FORM", b"DJVM" + body)


# ---------------------------------------------------------------------------
# Hidden-text layer (TXTz / TXTa) — r15
# ---------------------------------------------------------------------------

#: DjVu text-zone types (DjVu Reference v3, text chunk)
ZONE_TYPES = {1: "page", 2: "column", 3: "region", 4: "paragraph",
              5: "line", 6: "word", 7: "character"}
MAX_ZONES = 100_000
MAX_TEXT = 16 << 20


def _read16(raw: bytes, pos: int) -> int:
    if pos + 2 > len(raw):
        raise ValueError("djvu: text zone record truncated")
    return (raw[pos] << 8) | raw[pos + 1]


def _read24(raw: bytes, pos: int) -> int:
    if pos + 3 > len(raw):
        raise ValueError("djvu: text zone record truncated")
    return (raw[pos] << 16) | (raw[pos + 1] << 8) | raw[pos + 2]


def _parse_zone(raw: bytes, pos: int, textlen: int, parent: dict | None,
                prev: dict | None, depth: int, out: list) -> int:
    """One zone record (17 bytes + children): type, biased/delta-coded
    rectangle, delta-coded text span, 24-bit child count.  Geometry
    deltas follow the sibling/parent rules of the public text-chunk
    spec (PAGE/PARAGRAPH/LINE chain off the previous sibling's lower
    edge; COLUMN/REGION/WORD/CHARACTER off its right edge; a first
    child anchors to its parent's top-left)."""
    if len(out) >= MAX_ZONES:
        raise ValueError("djvu: zone count over the cap")
    if depth > 8:
        raise ValueError("djvu: zone tree deeper than the 8-level cap")
    if pos >= len(raw):
        raise ValueError("djvu: zone tree past end of chunk")
    ztype = raw[pos]
    if ztype not in ZONE_TYPES:
        raise ValueError(f"djvu: unknown zone type {ztype}")
    x = _read16(raw, pos + 1) - 0x8000
    y = _read16(raw, pos + 3) - 0x8000
    width = _read16(raw, pos + 5) - 0x8000
    height = _read16(raw, pos + 7) - 0x8000
    tstart = _read16(raw, pos + 9) - 0x8000
    tlen = _read24(raw, pos + 11)
    nkids = _read24(raw, pos + 14)
    pos += 17
    if prev is not None:
        if ztype in (1, 4, 5):  # page / paragraph / line: stack down
            x += prev["xmin"]
            y += prev["ymin"]
        else:  # column / region / word / character: flow right
            x += prev["xmax"]
            y += prev["ymin"]
        tstart += prev["text_start"] + prev["text_length"]
    elif parent is not None:
        x += parent["xmin"]
        y = parent["ymax"] - height - y
        tstart += parent["text_start"]
    if width < 0 or height < 0:
        raise ValueError("djvu: zone with negative extent")
    if tstart < 0 or tlen < 0 or tstart + tlen > textlen:
        raise ValueError("djvu: zone text span outside the text")
    zone = {"type": ZONE_TYPES[ztype], "xmin": x, "ymin": y,
            "xmax": x + width, "ymax": y + height,
            "text_start": tstart, "text_length": tlen}
    out.append(zone)
    kid_prev = None
    for _ in range(nkids):
        pos, kid = _parse_zone(raw, pos, textlen, zone, kid_prev,
                               depth + 1, out)
        kid_prev = kid
    return pos, zone


def parse_txt(raw: bytes) -> dict:
    """Decode one (already-decompressed) TXT payload → ``{"text",
    "zones", "n_zones", "words"}`` — the pre-OCR'd hidden-text layer,
    the highest-value byte range of a scanned corpus."""
    if len(raw) < 4:
        raise ValueError("djvu: text chunk shorter than 4 bytes")
    textlen = _read24(raw, 0)
    if textlen > MAX_TEXT:
        raise ValueError("djvu: text length over the cap")
    if 3 + textlen + 1 > len(raw):
        raise ValueError("djvu: text chunk shorter than its text")
    text = raw[3 : 3 + textlen]
    version = raw[3 + textlen]
    if version != 1:
        raise ValueError(f"djvu: unsupported text-chunk version {version}")
    pos = 3 + textlen + 1
    zones: list = []
    prev = None
    while pos < len(raw):
        pos, prev = _parse_zone(raw, pos, textlen, None, prev, 0, zones)
    try:
        decoded = text.decode("utf-8")
    except UnicodeDecodeError as exc:
        raise ValueError(f"djvu: text layer is not UTF-8: {exc}") from None
    words = []
    for z in zones:
        if z["type"] == "word":
            words.append(
                text[z["text_start"] : z["text_start"] + z["text_length"]]
                .decode("utf-8", "replace").strip()
            )
    return {"text": decoded, "zones": zones, "n_zones": len(zones),
            "words": words}


def extract_djvu_text(data: bytes) -> dict:
    """DjVu payload → hidden-text census: per-page decoded text layers
    (``TXTz`` through the BZZ decoder, ``TXTa`` verbatim), concatenated
    text, word list, zone counts.  Raises ``ValueError`` on malformed
    containers; per-file error capture is the caller's (Spark kernel)
    job, the same discipline as the other media routes."""
    from ..sources.bzz import bzz_decode

    if not sniff_djvu(data):
        raise ValueError("djvu: missing AT&T FORM magic")
    (total,) = struct.unpack(">I", data[8:12])
    form_end = 12 + total
    if form_end > len(data):
        raise ValueError("djvu: FORM length past end of file")
    form_type = data[12:16]
    page_ranges = []
    if form_type == b"DJVU":
        page_ranges.append((16, form_end))
    elif form_type == b"DJVM":
        for tag, cpos, ln in _chunks(data, 16, form_end):
            if tag == b"FORM" and data[cpos : cpos + 4] == b"DJVU":
                page_ranges.append((cpos + 4, cpos + ln))
    else:
        raise ValueError(
            f"djvu: unsupported top-level FORM type {form_type!r}"
        )
    pages = []
    for start, end in page_ranges:
        page_text = None
        for tag, cpos, ln in _chunks(data, start, end):
            if tag == b"TXTz":
                page_text = parse_txt(
                    bzz_decode(data[cpos : cpos + ln],
                               max_bytes=MAX_TEXT + 4096)
                )
            elif tag == b"TXTa":
                page_text = parse_txt(data[cpos : cpos + ln])
        pages.append(page_text)
    texts = [p["text"] for p in pages if p is not None]
    words = [w for p in pages if p is not None for w in p["words"]]
    n_zones = sum(p["n_zones"] for p in pages if p is not None)
    return {
        "n_pages": len(pages),
        "n_text_pages": sum(1 for p in pages if p is not None),
        "text": "\n".join(texts),
        "words": words,
        "n_zones": n_zones,
        "pages": pages,
    }


#: FGbz palette bounds
MAX_PALETTE = 65535


def build_fgbz(palette: list, indices: list | None = None) -> bytes:
    """FGbz foreground-palette chunk (DjVu v3 reference structure):
    version byte (bit 0x80 = per-blit index data follows), big-endian
    palette count, BGR color triples; the index tail is a
    BZZ-compressed stream of a 24-bit blit count then one big-endian
    16-bit palette index per JB2 blit (mark), pairing each glyph
    placement with its foreground color."""
    from ..sources.bzz import bzz_encode

    if not palette or len(palette) > MAX_PALETTE:
        raise ValueError("djvu: palette size out of range")
    out = bytearray()
    out.append(0x80 if indices is not None else 0x00)
    out += struct.pack(">H", len(palette))
    for r, g, b in palette:
        out += bytes([b & 0xFF, g & 0xFF, r & 0xFF])
    if indices is not None:
        if any(not 0 <= i < len(palette) for i in indices):
            raise ValueError("djvu: palette index out of range")
        raw = len(indices).to_bytes(3, "big") + b"".join(
            struct.pack(">H", i) for i in indices
        )
        out += bzz_encode(raw)
    return bytes(out)


def parse_fgbz(data: bytes) -> dict:
    """FGbz chunk → ``{"palette": [(r, g, b), ...], "indices":
    [...] | None}``."""
    from ..sources.bzz import bzz_decode

    if len(data) < 3:
        raise ValueError("djvu: FGbz shorter than its header")
    version = data[0]
    if version & 0x7F:
        raise ValueError("djvu: unknown FGbz version")
    (n,) = struct.unpack(">H", data[1:3])
    if n == 0 or len(data) < 3 + 3 * n:
        raise ValueError("djvu: FGbz palette truncated")
    palette = []
    for i in range(n):
        b, g, r = data[3 + 3 * i : 6 + 3 * i]
        palette.append((r, g, b))
    indices = None
    if version & 0x80:
        raw = bzz_decode(data[3 + 3 * n :],
                         max_bytes=3 + 2 * (MAX_PALETTE * 16))
        if len(raw) < 3:
            raise ValueError("djvu: FGbz index stream truncated")
        count = int.from_bytes(raw[:3], "big")
        if len(raw) != 3 + 2 * count:
            raise ValueError("djvu: FGbz index count disagrees")
        indices = [struct.unpack(">H", raw[3 + 2 * i : 5 + 2 * i])[0]
                   for i in range(count)]
        if any(i >= n for i in indices):
            raise ValueError("djvu: FGbz index outside the palette")
    return {"palette": palette, "indices": indices}


def render_djvu_page(data: bytes) -> "object":
    """Composite the first page's decoded layers into an RGB image
    (r16): the IW44 background (gray replicated to RGB; white when
    absent), with each JB2 mask blit painted in its FGbz palette
    color (black when no FGbz).  This is the DjVu imaging model's
    foreground-over-background rule restricted to the decoded subset
    (no subsampled-layer rescaling: layers must match the page size
    or be absent)."""
    import numpy as np

    from . import rawiw44, rawjb2

    if not sniff_djvu(data):
        raise ValueError("djvu: missing AT&T FORM magic")
    (total,) = struct.unpack(">I", data[8:12])
    form_end = 12 + total
    if form_end > len(data):
        raise ValueError("djvu: FORM length past end of file")
    form_type = data[12:16]
    if form_type == b"DJVU":
        start, end = 16, form_end
    elif form_type == b"DJVM":
        start = end = None
        for tag, cpos, ln in _chunks(data, 16, form_end):
            if tag == b"FORM" and data[cpos : cpos + 4] == b"DJVU":
                start, end = cpos + 4, cpos + ln
                break
        if start is None:
            raise ValueError("djvu: no DJVU page to render")
    else:
        raise ValueError(
            f"djvu: unsupported top-level FORM type {form_type!r}"
        )
    info = None
    sjbz = bg44 = fgbz = fg44 = None
    for tag, cpos, ln in _chunks(data, start, end):
        if tag == b"INFO":
            info = _parse_info(data, cpos, ln)
        elif tag == b"Sjbz":
            sjbz = data[cpos : cpos + ln]
        elif tag == b"BG44":
            bg44 = data[cpos : cpos + ln]
        elif tag == b"FGbz":
            fgbz = data[cpos : cpos + ln]
        elif tag == b"FG44":
            fg44 = data[cpos : cpos + ln]
    if info is None:
        raise ValueError("djvu: page without INFO")
    w, h = info["width"], info["height"]
    if bg44 is not None:
        if rawiw44.iw44_is_gray(bg44):
            bg = rawiw44.decode_iw44(bg44)
            rgb = np.repeat(bg[:, :, None], 3, axis=2)
        else:
            rgb = rawiw44.ycbcr_to_rgb(
                *rawiw44.decode_iw44_color(bg44))
            bg = rgb[:, :, 0]
        if bg.shape != (h, w):
            raise ValueError(
                "djvu: subsampled background outside the render subset"
            )
        page = rgb.astype(np.uint8)
    else:
        page = np.full((h, w, 3), 255, np.uint8)
    if sjbz is not None:
        blits = rawjb2.decode_jb2_blits(sjbz)
        colors = None
        fgimg = None
        if fgbz is not None:
            # per-blit palette colors take precedence (the compact
            # representation encoders prefer for text)
            fg = parse_fgbz(fgbz)
            colors = fg["indices"], fg["palette"]
            if colors[0] is not None and len(colors[0]) != len(blits):
                raise ValueError(
                    "djvu: FGbz blit count disagrees with the mask"
                )
        elif fg44 is not None:
            if rawiw44.iw44_is_gray(fg44):
                g = rawiw44.decode_iw44(fg44)
                fgimg = np.repeat(g[:, :, None], 3, axis=2)
            else:
                fgimg = rawiw44.ycbcr_to_rgb(
                    *rawiw44.decode_iw44_color(fg44))
            if fgimg.shape[:2] != (h, w):
                raise ValueError(
                    "djvu: subsampled foreground outside the render "
                    "subset"
                )
        for bi, (bm, x, y) in enumerate(blits):
            col = None
            if colors is not None and colors[0] is not None:
                col = colors[1][colors[0][bi]]
            elif colors is not None:
                col = colors[1][0]
            elif fgimg is None:
                col = (0, 0, 0)
            sh, sw = bm.shape
            ph, pw = min(sh, h - y), min(sw, w - x)
            if ph <= 0 or pw <= 0:
                continue
            region = page[y : y + ph, x : x + pw]
            on = bm[:ph, :pw].astype(bool)
            if col is not None:
                for ch in range(3):
                    region[:, :, ch][on] = col[ch]
            else:
                region[on] = fgimg[y : y + ph, x : x + pw][on]
    return page


def extract_djvu_images(data: bytes) -> dict:
    """DjVu payload → decoded image layers per page (r16 verdict ask
    #6): the JB2 ``Sjbz`` bitonal mask and the IW44 ``BG44`` gray
    background, as dimension/ink/sum statistics (no pixel arrays
    cross Arrow — the same executor-side-summary discipline as the
    PDF image route).  Pages whose layers are absent report zeros;
    malformed layers raise ``ValueError`` for the caller's per-row
    capture."""
    from . import rawiw44, rawjb2

    if not sniff_djvu(data):
        raise ValueError("djvu: missing AT&T FORM magic")
    (total,) = struct.unpack(">I", data[8:12])
    form_end = 12 + total
    if form_end > len(data):
        raise ValueError("djvu: FORM length past end of file")
    form_type = data[12:16]
    page_ranges = []
    if form_type == b"DJVU":
        page_ranges.append((16, form_end))
    elif form_type == b"DJVM":
        for tag, cpos, ln in _chunks(data, 16, form_end):
            if tag == b"FORM" and data[cpos : cpos + 4] == b"DJVU":
                page_ranges.append((cpos + 4, cpos + ln))
    else:
        raise ValueError(
            f"djvu: unsupported top-level FORM type {form_type!r}"
        )
    pages = []
    for start, end in page_ranges:
        page = {"mask_w": 0, "mask_h": 0, "mask_ink": 0,
                "bg_w": 0, "bg_h": 0, "bg_sum": 0, "bg_color": False,
                "fg_w": 0, "fg_h": 0, "fg_sum": 0}
        for tag, cpos, ln in _chunks(data, start, end):
            if tag == b"Sjbz":
                bm = rawjb2.decode_jb2(data[cpos : cpos + ln])
                page["mask_h"], page["mask_w"] = bm.shape
                page["mask_ink"] = int(bm.sum())
            elif tag == b"BG44":
                blob = data[cpos : cpos + ln]
                if rawiw44.iw44_is_gray(blob):
                    bg = rawiw44.decode_iw44(blob)
                else:
                    # color: report the luma plane's sum (r16)
                    bg = rawiw44.decode_iw44_color(blob)[0]
                    page["bg_color"] = True
                page["bg_h"], page["bg_w"] = bg.shape
                page["bg_sum"] = int(bg.sum(dtype="int64"))
            elif tag == b"FG44":
                blob = data[cpos : cpos + ln]
                if rawiw44.iw44_is_gray(blob):
                    fgl = rawiw44.decode_iw44(blob)
                else:
                    fgl = rawiw44.decode_iw44_color(blob)[0]
                page["fg_h"], page["fg_w"] = fgl.shape
                page["fg_sum"] = int(fgl.sum(dtype="int64"))
        pages.append(page)
    return {"n_pages": len(pages), "pages": pages}


# ---------------------------------------------------------------------------
# Text-layer fixture writer
# ---------------------------------------------------------------------------


def _zone_record(ztype: int, x: int, y: int, w: int, h: int,
                 tstart: int, tlen: int, nkids: int) -> bytes:
    return bytes([ztype]) + struct.pack(
        ">HHHHH", x + 0x8000, y + 0x8000, w + 0x8000, h + 0x8000,
        tstart + 0x8000,
    ) + tlen.to_bytes(3, "big") + nkids.to_bytes(3, "big")


def build_txt(text: str, *, width: int = 2550, height: int = 3300) -> bytes:
    """TXT payload for a page: the UTF-8 text plus a page→line→word
    zone tree with synthetic typography (fixed line pitch, words packed
    left to right) delta-coded by the sibling/parent rules that
    :func:`parse_txt` inverts."""
    btext = text.encode("utf-8")
    out = bytearray()
    out += len(btext).to_bytes(3, "big")
    out += btext
    out.append(1)  # version
    lines = []  # (byte_start, byte_len, [(wstart, wlen), ...])
    bpos = 0
    for raw_line in text.split("\n"):
        bline = raw_line.encode("utf-8")
        words = []
        woff = 0
        for tok in raw_line.split(" "):
            btok = tok.encode("utf-8")
            if btok:
                words.append((bpos + woff, len(btok)))
            woff += len(btok) + 1
        lines.append((bpos, len(bline), words))
        bpos += len(bline) + 1
    # page zone (absolute: no parent, no prev sibling)
    page_len = len(btext)
    out += _zone_record(1, 0, 0, width, height, 0, page_len, len(lines))
    # synthetic typography, clamped so tiny pages stay well-formed
    margin = min(100, width // 10)
    line_h = min(40, max(9, height // 10))
    prev_line = None  # (xmin, ymin, tstart, tlen)
    for li, (lstart, llen, words) in enumerate(lines):
        lx, lw = margin, max(1, width - 2 * margin)
        ly = height - margin - line_h * (li + 1)
        if prev_line is None:
            # first child: x rel parent.xmin, y = parent.ymax - h - enc
            ex, ey = lx - 0, height - line_h - ly
            et = lstart - 0
        else:
            px, py, pt, pl = prev_line
            ex, ey = lx - px, ly - py
            et = lstart - (pt + pl)
        out += _zone_record(5, ex, ey, lw, line_h, et,
                            llen + (1 if li < len(lines) - 1 else 0),
                            len(words))
        prev_line = (lx, ly, lstart,
                     llen + (1 if li < len(lines) - 1 else 0))
        prev_word = None
        for wi, (wstart, wlen) in enumerate(words):
            wx = lx + 10 + 60 * wi
            wy, ww, wh = ly + 4, 50, max(1, line_h - 8)
            if prev_word is None:
                ex, ey = wx - lx, (ly + line_h) - wh - wy
                et = wstart - lstart
            else:
                qx, qy, qt, ql = prev_word
                ex, ey = wx - (qx + 50), wy - qy
                et = wstart - (qt + ql)
            out += _zone_record(6, ex, ey, ww, wh, et, wlen, 0)
            prev_word = (wx, wy, wstart, wlen)
    return bytes(out)


# ---------------------------------------------------------------------------
# BZZ-compressed metadata: DIRM names, NAVM bookmarks, ANT annotations (r15)
# ---------------------------------------------------------------------------

#: DIRM component-flag bits (DjVu Reference v3, directory chunk)
_DIRM_HAS_NAME = 0x80
_DIRM_HAS_TITLE = 0x40
_DIRM_TYPES = {0: "include", 1: "page", 2: "thumbnail", 3: "shared_anno"}
MAX_BOOKMARKS = 10_000


def parse_dirm(data: bytes, cpos: int, ln: int) -> dict:
    """Full DIRM decode: header flags + component count + (bundled)
    offsets, then the BZZ-compressed tail — per-component sizes,
    flags, IDs and optional names/titles."""
    from ..sources.bzz import bzz_decode

    if ln < 3:
        raise ValueError("djvu: DIRM chunk shorter than 3 bytes")
    flags = data[cpos]
    (n,) = struct.unpack(">H", data[cpos + 1 : cpos + 3])
    if n > MAX_COMPONENTS:
        raise ValueError("djvu: DIRM component count over cap")
    bundled = bool(flags & 0x80)
    pos = cpos + 3
    offsets = []
    if bundled:
        if pos + 4 * n > cpos + ln:
            raise ValueError("djvu: DIRM offsets past chunk end")
        for i in range(n):
            offsets.append(
                struct.unpack(">I", data[pos + 4 * i : pos + 4 * i + 4])[0]
            )
        pos += 4 * n
    raw = bzz_decode(data[pos : cpos + ln], max_bytes=MAX_TEXT)
    need = 4 * n
    if len(raw) < need:
        raise ValueError("djvu: DIRM compressed tail too short")
    sizes = [int.from_bytes(raw[3 * i : 3 * i + 3], "big")
             for i in range(n)]
    cflags = list(raw[3 * n : 4 * n])
    p = 4 * n

    def cstr() -> str:
        nonlocal p
        end = raw.index(b"\x00", p)
        s = raw[p:end].decode("utf-8", "replace")
        p = end + 1
        return s

    comps = []
    try:
        for i in range(n):
            f = cflags[i]
            comp = {
                "id": cstr(),
                "type": _DIRM_TYPES.get(f & 0x3F, "reserved"),
                "size": sizes[i],
                "name": None,
                "title": None,
            }
            if f & _DIRM_HAS_NAME:
                comp["name"] = cstr()
            if f & _DIRM_HAS_TITLE:
                comp["title"] = cstr()
            comps.append(comp)
    except ValueError:
        raise ValueError("djvu: DIRM strings truncated") from None
    return {"bundled": bundled, "version": flags & 0x7F,
            "offsets": offsets, "components": comps}


def parse_navm(raw: bytes) -> list:
    """Decompressed NAVM payload → flat bookmark list (count, then per
    bookmark: child count, 24-bit-length description and URL)."""
    if len(raw) < 2:
        raise ValueError("djvu: NAVM shorter than its count")
    (count,) = struct.unpack(">H", raw[:2])
    if count > MAX_BOOKMARKS:
        raise ValueError("djvu: bookmark count over cap")
    pos = 2
    out = []
    for _ in range(count):
        if pos + 1 > len(raw):
            raise ValueError("djvu: truncated bookmark record")
        nkids = raw[pos]
        pos += 1
        fields = []
        for _f in range(2):
            if pos + 3 > len(raw):
                raise ValueError("djvu: truncated bookmark string")
            ln = int.from_bytes(raw[pos : pos + 3], "big")
            pos += 3
            if pos + ln > len(raw):
                raise ValueError("djvu: bookmark string past end")
            fields.append(raw[pos : pos + ln].decode("utf-8", "replace"))
            pos += ln
        out.append({"n_children": nkids, "description": fields[0],
                    "url": fields[1]})
    if pos != len(raw):
        # structural sanity against the probabilistic BZZ bound
        # (sources/bzz.py): a wrongly decoded column that slipped the
        # BWT walk is very unlikely to also frame exactly
        raise ValueError("djvu: trailing bytes after NAVM bookmarks")
    return out


_ANT_TOKEN = re.compile(rb'"((?:[^"\\]|\\.)*)"|\(|\)|[^\s()"]+')


def parse_ant(text: bytes) -> dict:
    """DjVu annotation s-expressions → census: maparea URLs +
    comments, shape counts, page background/zoom/mode settings."""
    pos = 0
    n = len(text)
    depth = 0
    urls: list = []
    comments: list = []
    shapes: dict = {}
    settings: dict = {}
    stack: list = []
    for m in _ANT_TOKEN.finditer(text):
        tok = m.group(0)
        if tok == b"(":
            depth += 1
            if depth > 32:
                raise ValueError("djvu: annotation nesting over cap")
            stack.append([])
        elif tok == b")":
            if not stack:
                raise ValueError("djvu: unbalanced annotation parens")
            expr = stack.pop()
            depth -= 1
            if expr and expr[0] == b"maparea":
                if len(expr) >= 2 and isinstance(expr[1], tuple):
                    urls.append(expr[1][0].decode("utf-8", "replace"))
                if len(expr) >= 3 and isinstance(expr[2], tuple):
                    c = expr[2][0].decode("utf-8", "replace")
                    if c:
                        comments.append(c)
            elif expr and expr[0] in (b"rect", b"oval", b"poly",
                                      b"line", b"text"):
                name = expr[0].decode()
                shapes[name] = shapes.get(name, 0) + 1
            elif expr and expr[0] in (b"background", b"zoom", b"mode",
                                      b"align"):
                if len(expr) >= 2 and not isinstance(expr[1], list):
                    v = expr[1]
                    settings[expr[0].decode()] = (
                        v[0] if isinstance(v, tuple) else v
                    ).decode("utf-8", "replace")
            if stack:
                stack[-1].append(expr)
        elif m.group(1) is not None:
            if stack:
                stack[-1].append((m.group(1),))  # quoted string
        else:
            if stack:
                stack[-1].append(tok)
    if stack:
        raise ValueError("djvu: unbalanced annotation parens")
    _ = pos, n
    return {"urls": urls, "comments": comments, "shapes": shapes,
            "settings": settings}


def extract_djvu_metadata(data: bytes) -> dict:
    """Container-wide metadata census: DIRM component directory
    (names/titles through BZZ), NAVM bookmarks, and per-page ANT
    annotations (ANTz through BZZ, ANTa verbatim)."""
    from ..sources.bzz import bzz_decode

    if not sniff_djvu(data):
        raise ValueError("djvu: missing AT&T FORM magic")
    (total,) = struct.unpack(">I", data[8:12])
    form_end = 12 + total
    if form_end > len(data):
        raise ValueError("djvu: FORM length past end of file")
    form_type = data[12:16]
    out = {"components": [], "bookmarks": [], "urls": [],
           "comments": [], "shapes": {}, "settings": {}}

    def eat_page(start, end):
        for tag, cpos, ln in _chunks(data, start, end):
            if tag == b"ANTz":
                ant = parse_ant(bzz_decode(data[cpos : cpos + ln],
                                           max_bytes=MAX_TEXT))
            elif tag == b"ANTa":
                ant = parse_ant(data[cpos : cpos + ln])
            else:
                continue
            out["urls"] += ant["urls"]
            out["comments"] += ant["comments"]
            for k, v in ant["shapes"].items():
                out["shapes"][k] = out["shapes"].get(k, 0) + v
            out["settings"].update(ant["settings"])

    if form_type == b"DJVU":
        eat_page(16, form_end)
    elif form_type == b"DJVM":
        for tag, cpos, ln in _chunks(data, 16, form_end):
            if tag == b"DIRM":
                out["components"] = parse_dirm(data, cpos, ln)[
                    "components"
                ]
            elif tag == b"NAVM":
                out["bookmarks"] = parse_navm(
                    bzz_decode(data[cpos : cpos + ln],
                               max_bytes=MAX_TEXT)
                )
            elif tag == b"FORM" and data[cpos : cpos + 4] == b"DJVU":
                eat_page(cpos + 4, cpos + ln)
    else:
        raise ValueError(
            f"djvu: unsupported top-level FORM type {form_type!r}"
        )
    return out
