"""Font-file metadata: TTF/OTF (sfnt), WOFF1, and TTC collections.

Web crawls carry fonts as first-class assets; their metadata (family,
style, version, glyph count, units-per-em) is what an asset-dedup or
license-audit pass keys on.  The sfnt container is pure public
structure (OpenType spec): an offset table of tagged tables — this
module reads ``name`` (IDs 1/2/5/6: family, subfamily, version,
PostScript name), ``head`` (unitsPerEm), and ``maxp`` (numGlyphs).

- **TTF/OTF**: sfnt versions 0x00010000 / ``OTTO`` / ``true``.
- **WOFF1**: the W3C wrapper — per-table zlib compression (stdlib);
  tables are inflated individually and bounded.
- **TTC**: the collection header; every face parses, one row each.
- **WOFF2** (r13): the W3C format's whole-stream Brotli block
  decodes through the in-repo RFC 7932 decoder
  (:mod:`..sources.brotli_codec`); the table directory (known-tag
  indices, UIntBase128 lengths, transform flags) is walked and
  untransformed tables — including the metadata set — extract
  byte-exact.  Font collections (``ttcf`` flavor) stay loud.
- **WOFF2 glyf/loca transform** (r14): the §5.1 triplet transform
  reconstructs — 255UInt16 and coordinate-triplet decode (all six
  byte-count classes, sign selectors, delta bases per §5.2),
  per-contour point counts, explicit/computed bounding boxes with
  the bbox bitmap, composite component records with instruction
  routing, the overlapSimpleBitmap option flag, canonical native
  re-packing (short/same coordinate flags with repeat compression),
  and loca regeneration in both index formats — with both
  reconstructed lengths checked against the directory's declared
  originals.  Real glyph geometry (point/contour/composite counts,
  union bbox) becomes queryable metadata.

All malformed-input paths raise ``ValueError``; table counts, sizes,
and name records are bounded so hostile fonts cannot balloon.

Reference behavioral parity: the reference transport stores opaque
named byte arrays (RawdataMessage.java:15-60); asset introspection is
this repo's derived crawl tier.
"""

from __future__ import annotations

import struct
import zlib

MAX_TABLES = 256
MAX_NAME_RECORDS = 1024
MAX_FACES = 64
MAX_TABLE_BYTES = 64 * 1024 * 1024

_SFNT_VERSIONS = (b"\x00\x01\x00\x00", b"OTTO", b"true")

#: name IDs the metadata tier reads (OpenType §name)
_NAME_IDS = {1: "family", 2: "subfamily", 5: "version", 6: "ps_name"}


def sniff_font(data: bytes) -> str | None:
    """'ttf' | 'otf' | 'woff' | 'woff2' | 'ttc' | None by magic."""
    if data[:4] == b"OTTO":
        return "otf"
    if data[:4] in (b"\x00\x01\x00\x00", b"true"):
        return "ttf"
    if data[:4] == b"wOFF":
        return "woff"
    if data[:4] == b"wOF2":
        return "woff2"
    if data[:4] == b"ttcf":
        return "ttc"
    return None


def probe_font(data: bytes) -> str | None:
    """Magic + shallow header sanity — the classification probe.  A
    text file beginning with the ASCII bytes ``true`` must not route
    as a font, so ttf/otf/ttc magics also need a sane table count."""
    kind = sniff_font(data)
    if kind in ("ttf", "otf"):
        if len(data) < 12:
            return None
        (n_tables,) = struct.unpack(">H", data[4:6])
        if not 1 <= n_tables <= MAX_TABLES:
            return None
        if 12 + 16 * n_tables > len(data):
            return None
    elif kind == "ttc":
        if len(data) < 12:
            return None
        (n_faces,) = struct.unpack(">I", data[8:12])
        if not 1 <= n_faces <= MAX_FACES:
            return None
    return kind


def _parse_name_table(blob: bytes) -> dict:
    out = {v: "" for v in _NAME_IDS.values()}
    if len(blob) < 6:
        raise ValueError("font: name table shorter than its header")
    (_fmt, count, str_off) = struct.unpack(">HHH", blob[:6])
    if count > MAX_NAME_RECORDS:
        raise ValueError("font: name record count over the cap")
    best: dict[str, tuple[int, str]] = {}
    for i in range(count):
        rec = blob[6 + 12 * i : 18 + 12 * i]
        if len(rec) < 12:
            raise ValueError("font: truncated name record")
        (pid, _eid, _lang, nid, length, off) = struct.unpack(">6H", rec)
        key = _NAME_IDS.get(nid)
        if key is None:
            continue
        raw = blob[str_off + off : str_off + off + length]
        if len(raw) < length:
            raise ValueError("font: name string past the table end")
        # platform 0 (Unicode) and 3 (Windows) store UTF-16BE;
        # platform 1 (Macintosh) stores MacRoman-ish single bytes
        text = (raw.decode("utf-16-be", "replace") if pid in (0, 3)
                else raw.decode("mac-roman", "replace"))
        # prefer Windows/Unicode strings over Macintosh ones
        rank = 1 if pid in (0, 3) else 0
        if key not in best or rank >= best[key][0]:
            best[key] = (rank, text)
    for key, (_rank, text) in best.items():
        out[key] = text
    return out


def _parse_sfnt_face(data: bytes, off: int) -> dict:
    if off + 12 > len(data):
        raise ValueError("font: offset table past end")
    version = data[off : off + 4]
    if version not in _SFNT_VERSIONS:
        raise ValueError(f"font: unknown sfnt version {version!r}")
    (n_tables,) = struct.unpack(">H", data[off + 4 : off + 6])
    if n_tables == 0 or n_tables > MAX_TABLES:
        raise ValueError(f"font: {n_tables} tables out of range")
    tables: dict[bytes, bytes] = {}
    for i in range(n_tables):
        rec = data[off + 12 + 16 * i : off + 28 + 16 * i]
        if len(rec) < 16:
            raise ValueError("font: truncated table record")
        tag = rec[:4]
        (t_off, t_len) = struct.unpack(">II", rec[8:16])
        if t_len > MAX_TABLE_BYTES or t_off + t_len > len(data):
            raise ValueError(f"font: table {tag!r} past end of file")
        if tag in (b"name", b"head", b"maxp"):
            tables[tag] = data[t_off : t_off + t_len]
    return _face_meta(version, tables)


def _face_meta(version: bytes, tables: dict[bytes, bytes]) -> dict:
    meta = {
        "flavor": "otf" if version == b"OTTO" else "ttf",
        "family": "", "subfamily": "", "version": "", "ps_name": "",
        "units_per_em": 0, "n_glyphs": 0,
    }
    name = tables.get(b"name")
    if name is not None:
        meta.update(_parse_name_table(name))
    head = tables.get(b"head")
    if head is not None:
        if len(head) < 20:
            raise ValueError("font: head table shorter than unitsPerEm")
        (meta["units_per_em"],) = struct.unpack(">H", head[18:20])
    maxp = tables.get(b"maxp")
    if maxp is not None:
        if len(maxp) < 6:
            raise ValueError("font: maxp table shorter than numGlyphs")
        (meta["n_glyphs"],) = struct.unpack(">H", maxp[4:6])
    return meta


def _parse_woff(data: bytes) -> list[dict]:
    if len(data) < 44:
        raise ValueError("font: WOFF header shorter than 44 bytes")
    flavor = data[4:8]
    (n_tables,) = struct.unpack(">H", data[12:14])
    if n_tables == 0 or n_tables > MAX_TABLES:
        raise ValueError(f"font: {n_tables} WOFF tables out of range")
    tables: dict[bytes, bytes] = {}
    for i in range(n_tables):
        rec = data[44 + 20 * i : 64 + 20 * i]
        if len(rec) < 20:
            raise ValueError("font: truncated WOFF table record")
        tag = rec[:4]
        (t_off, comp_len, orig_len, _cksum) = struct.unpack(">4I", rec[4:20])
        if tag not in (b"name", b"head", b"maxp"):
            continue
        if orig_len > MAX_TABLE_BYTES or t_off + comp_len > len(data):
            raise ValueError(f"font: WOFF table {tag!r} past end")
        raw = data[t_off : t_off + comp_len]
        if comp_len == orig_len:
            tables[tag] = raw
        else:
            try:
                blob = zlib.decompress(raw, bufsize=min(
                    orig_len, MAX_TABLE_BYTES
                ))
            except zlib.error as exc:
                raise ValueError(f"font: corrupt WOFF table: {exc}")
            if len(blob) != orig_len:
                raise ValueError(
                    f"font: WOFF table {tag!r} inflates to {len(blob)}, "
                    f"declared {orig_len}"
                )
            tables[tag] = blob
    face = _face_meta(
        flavor if flavor in _SFNT_VERSIONS else b"\x00\x01\x00\x00",
        tables,
    )
    face["flavor"] = "otf" if flavor == b"OTTO" else "ttf"
    return [face]


def parse_font(data: bytes) -> dict:
    """Font payload → ``{"container", "faces": [face_meta, ...]}``.

    Containers: ``ttf``/``otf`` (one face), ``woff`` (one face,
    per-table zlib), ``ttc`` (one row per collection face).  WOFF2
    raises loudly (Brotli constants wall)."""
    kind = sniff_font(data)
    if kind is None:
        raise ValueError("font: no sfnt/WOFF/TTC magic")
    if kind == "woff2":
        return {"container": "woff2", "faces": [_parse_woff2(data)]}
    if kind == "ttc":
        if len(data) < 12:
            raise ValueError("font: TTC header shorter than 12 bytes")
        (n_faces,) = struct.unpack(">I", data[8:12])
        if n_faces == 0 or n_faces > MAX_FACES:
            raise ValueError(f"font: {n_faces} TTC faces out of range")
        faces = []
        for i in range(n_faces):
            rec = data[12 + 4 * i : 16 + 4 * i]
            if len(rec) < 4:
                raise ValueError("font: truncated TTC face offset")
            (f_off,) = struct.unpack(">I", rec)
            faces.append(_parse_sfnt_face(data, f_off))
        return {"container": "ttc", "faces": faces}
    if kind == "woff":
        return {"container": "woff", "faces": _parse_woff(data)}
    return {"container": kind, "faces": [_parse_sfnt_face(data, 0)]}




#: WOFF2 known table tags, directory order (W3C WOFF2 §5.2) — index
#: 63 marks an arbitrary 4-byte tag
_WOFF2_TAGS = (
    b"cmap", b"head", b"hhea", b"hmtx", b"maxp", b"name", b"OS/2",
    b"post", b"cvt ", b"fpgm", b"glyf", b"loca", b"prep", b"CFF ",
    b"VORG", b"EBDT", b"EBLC", b"gasp", b"hdmx", b"kern", b"LTSH",
    b"PCLT", b"VDMX", b"vhea", b"vmtx", b"BASE", b"GDEF", b"GPOS",
    b"GSUB", b"EBSC", b"JSTF", b"MATH", b"CBDT", b"CBLC", b"COLR",
    b"CPAL", b"SVG ", b"sbix", b"acnt", b"avar", b"bdat", b"bloc",
    b"bsln", b"cvar", b"fdsc", b"feat", b"fmtx", b"fvar", b"gvar",
    b"hsty", b"just", b"lcar", b"mort", b"morx", b"opbd", b"prop",
    b"trak", b"Zapf", b"Silf", b"Glat", b"Gloc", b"Feat", b"Sill",
    b"????",
)


def _uintbase128(data: bytes, pos: int) -> tuple[int, int]:
    """WOFF2 UIntBase128: MSB-first 7-bit groups, max 5 bytes, no
    leading zero byte, 32-bit range."""
    out = 0
    for i in range(5):
        if pos >= len(data):
            raise ValueError("font: UIntBase128 past end")
        b = data[pos]
        pos += 1
        if i == 0 and b == 0x80:
            raise ValueError("font: UIntBase128 leading zero")
        if out & 0xFE000000:
            raise ValueError("font: UIntBase128 over 32 bits")
        out = (out << 7) | (b & 0x7F)
        if not b & 0x80:
            return out, pos
    raise ValueError("font: UIntBase128 over 5 bytes")


def _parse_woff2(data: bytes) -> dict:
    """One WOFF2 font: directory walk + whole-stream Brotli decode;
    untransformed tables extract, transformed glyf/loca stay census
    (the face meta set — name/head/maxp — is never transformed)."""
    from ..sources.brotli_codec import brotli_decompress

    if len(data) < 48:
        raise ValueError("font: WOFF2 header shorter than 48 bytes")
    flavor = data[4:8]
    if flavor == b"ttcf":
        raise ValueError(
            "font: WOFF2 collections (ttcf) are out of the documented "
            "subset"
        )
    (n_tables,) = struct.unpack(">H", data[12:14])
    if n_tables == 0 or n_tables > MAX_TABLES:
        raise ValueError(f"font: {n_tables} WOFF2 tables out of range")
    (total_comp,) = struct.unpack(">I", data[20:24])
    pos = 48
    entries = []  # (tag, orig_len, stream_len, transformed)
    for _ in range(n_tables):
        if pos >= len(data):
            raise ValueError("font: WOFF2 directory past end")
        flags = data[pos]
        pos += 1
        idx = flags & 0x3F
        if idx == 63:
            tag = data[pos : pos + 4]
            if len(tag) < 4:
                raise ValueError("font: WOFF2 arbitrary tag past end")
            pos += 4
        else:
            tag = _WOFF2_TAGS[idx]
        tversion = flags >> 6
        orig_len, pos = _uintbase128(data, pos)
        if orig_len > MAX_TABLE_BYTES:
            raise ValueError(f"font: WOFF2 table {tag!r} over the cap")
        # glyf/loca: version 0 MEANS transformed; other tables:
        # nonzero version means transformed (W3C §5.3)
        transformed = (tversion == 0) if tag in (b"glyf", b"loca") \
            else (tversion != 0)
        stream_len = orig_len
        if transformed:
            stream_len, pos = _uintbase128(data, pos)
            if stream_len > MAX_TABLE_BYTES:
                raise ValueError(
                    f"font: WOFF2 transform of {tag!r} over the cap"
                )
        entries.append((tag, orig_len, stream_len, transformed))
    if pos + total_comp > len(data):
        raise ValueError("font: WOFF2 compressed block past end")
    total_stream = sum(e[2] for e in entries)
    blob = brotli_decompress(
        data[pos : pos + total_comp],
        cap=min(total_stream, MAX_TABLE_BYTES * 4),
    )
    if len(blob) != total_stream:
        raise ValueError(
            f"font: WOFF2 stream inflates to {len(blob)}, directory "
            f"declares {total_stream}"
        )
    tables: dict[bytes, bytes] = {}
    census = []
    off = 0
    glyf_body = None
    glyf_len = loca_len = 0
    hmtx_body = None
    hmtx_len = 0
    for tag, orig_len, stream_len, transformed in entries:
        body = blob[off : off + stream_len]
        off += stream_len
        census.append({"tag": tag.decode("latin-1"), "size": orig_len,
                       "transformed": transformed})
        if not transformed and tag in (b"name", b"head", b"maxp",
                                       b"hhea"):
            tables[tag] = body
        elif transformed and tag == b"glyf":
            glyf_body = body
            glyf_len = orig_len
        elif transformed and tag == b"loca":
            if stream_len != 0:
                raise ValueError(
                    "font: transformed loca must have a zero-length "
                    "stream (W3C WOFF2 §5.1)"
                )
            loca_len = orig_len
        elif transformed and tag == b"hmtx":
            hmtx_body = body
            hmtx_len = orig_len
    face = _face_meta(
        flavor if flavor in _SFNT_VERSIONS else b"\x00\x01\x00\x00",
        tables,
    )
    face["flavor"] = "otf" if flavor == b"OTTO" else "ttf"
    face["tables"] = census
    face["glyf"] = None
    face["hmtx"] = None
    stats = None
    if glyf_body is not None:
        # r14: the §5.1 triplet transform reconstructs — glyph counts,
        # contours/points, and the union bbox become real columns
        _glyf, _loca, stats = reconstruct_glyf(
            glyf_body, glyf_len, loca_len
        )
        face["glyf"] = {k: v for k, v in stats.items() if k != "xmins"}
        for c in census:
            if c["tag"] in ("glyf", "loca"):
                c["transformed"] = False
                c["reconstructed"] = True
    if hmtx_body is not None:
        # §5.4: only legal alongside a transformed glyf (the omitted
        # lsb arrays reconstruct from the glyf xMins)
        if stats is None:
            raise ValueError(
                "font: transformed hmtx without a transformed glyf"
            )
        hhea = tables.get(b"hhea")
        if hhea is None or len(hhea) < 36:
            raise ValueError("font: transformed hmtx without hhea")
        (num_hmetrics,) = struct.unpack(">H", hhea[34:36])
        hmtx = reconstruct_hmtx(
            hmtx_body, stats["n_glyphs"], num_hmetrics, stats["xmins"]
        )
        if len(hmtx) != hmtx_len:
            raise ValueError(
                f"font: reconstructed hmtx is {len(hmtx)} bytes, "
                f"directory declares {hmtx_len}"
            )
        advances = [
            struct.unpack(">H", hmtx[4 * i : 4 * i + 2])[0]
            for i in range(num_hmetrics)
        ]
        face["hmtx"] = {
            "n_metrics": num_hmetrics,
            "advance_max": max(advances) if advances else 0,
        }
        for c in census:
            if c["tag"] == "hmtx":
                c["transformed"] = False
                c["reconstructed"] = True
    return face


# ---------------------------------------------------------------------------
# WOFF2 glyf/loca triplet transform (W3C WOFF2 §5.1) — r14
# ---------------------------------------------------------------------------

MAX_GLYPH_POINTS = 1 << 20  # per-glyph bomb guard


def _read_255uint16(data: bytes, pos: int) -> tuple[int, int]:
    """255UInt16 variable-length encoding: 253 → 16-bit word follows,
    254 → byte + 506, 255 → byte + 253, else the byte itself."""
    if pos >= len(data):
        raise ValueError("font: 255UInt16 past end")
    b = data[pos]
    pos += 1
    if b == 253:
        if pos + 2 > len(data):
            raise ValueError("font: 255UInt16 word past end")
        return struct.unpack(">H", data[pos : pos + 2])[0], pos + 2
    if b == 255:
        if pos >= len(data):
            raise ValueError("font: 255UInt16 byte past end")
        return data[pos] + 253, pos + 1
    if b == 254:
        if pos >= len(data):
            raise ValueError("font: 255UInt16 byte past end")
        return data[pos] + 506, pos + 1
    return b, pos


def _write_255uint16(v: int) -> bytes:
    if v < 0 or v > 0xFFFF:
        raise ValueError("font fixture: 255UInt16 out of range")
    if v < 253:
        return bytes([v])
    if v < 506:
        return bytes([255, v - 253])
    if v < 762:
        return bytes([254, v - 506])
    return bytes([253]) + struct.pack(">H", v)


def _triplet_decode(
    flag: int, data: bytes, pos: int
) -> tuple[int, int, int]:
    """One coordinate triplet (W3C WOFF2 §5.2): the 7-bit flag selects
    byte count, bit widths, delta bases and signs; returns
    ``(dx, dy, new_pos)``.  Sign convention: an odd selector bit means
    positive."""

    def sign(bit: int, base: int) -> int:
        return base if bit & 1 else -base

    if flag < 10:
        if pos + 1 > len(data):
            raise ValueError("font: triplet past end")
        return 0, sign(flag, ((flag & 14) << 7) + data[pos]), pos + 1
    if flag < 20:
        if pos + 1 > len(data):
            raise ValueError("font: triplet past end")
        return (
            sign(flag, (((flag - 10) & 14) << 7) + data[pos]), 0, pos + 1
        )
    if flag < 84:
        if pos + 1 > len(data):
            raise ValueError("font: triplet past end")
        b0 = flag - 20
        b1 = data[pos]
        dx = sign(flag, 1 + (b0 & 0x30) + (b1 >> 4))
        dy = sign(flag >> 1, 1 + ((b0 & 0x0C) << 2) + (b1 & 0x0F))
        return dx, dy, pos + 1
    if flag < 120:
        if pos + 2 > len(data):
            raise ValueError("font: triplet past end")
        b0 = flag - 84
        dx = sign(flag, 1 + ((b0 // 12) << 8) + data[pos])
        dy = sign(flag >> 1, 1 + (((b0 % 12) >> 2) << 8) + data[pos + 1])
        return dx, dy, pos + 2
    if flag < 124:
        if pos + 3 > len(data):
            raise ValueError("font: triplet past end")
        b2 = data[pos + 1]
        dx = sign(flag, (data[pos] << 4) + (b2 >> 4))
        dy = sign(flag >> 1, ((b2 & 0x0F) << 8) + data[pos + 2])
        return dx, dy, pos + 3
    if pos + 4 > len(data):
        raise ValueError("font: triplet past end")
    dx = sign(flag, (data[pos] << 8) + data[pos + 1])
    dy = sign(flag >> 1, (data[pos + 2] << 8) + data[pos + 3])
    return dx, dy, pos + 4


def _triplet_encode(dx: int, dy: int, on_curve: bool) -> tuple[int, bytes]:
    """Inverse of :func:`_triplet_decode` for the fixture writer →
    ``(flag byte, glyphStream bytes)``.  Uses the same class choices as
    the reference encoder: axis-aligned 1-byte forms first, then the
    2-coordinate 1/2/3/4-byte classes by magnitude."""
    xbit = 1 if dx > 0 else 0
    ybit = 1 if dy > 0 else 0
    ax, ay = abs(dx), abs(dy)
    if dx == 0 and ay < 1280:
        flag = 2 * (ay >> 8) + ybit
        body = bytes([ay & 0xFF])
    elif dy == 0 and ax < 1280:
        flag = 10 + 2 * (ax >> 8) + xbit
        body = bytes([ax & 0xFF])
    elif 1 <= ax <= 64 and 1 <= ay <= 64:
        flag = (20 + ((ax - 1) & 0x30) + (((ay - 1) & 0x30) >> 2)
                + 2 * ybit + xbit)
        body = bytes([(((ax - 1) & 0x0F) << 4) | ((ay - 1) & 0x0F)])
    elif 1 <= ax <= 768 and 1 <= ay <= 768:
        flag = (84 + 12 * ((ax - 1) >> 8) + 4 * ((ay - 1) >> 8)
                + 2 * ybit + xbit)
        body = bytes([(ax - 1) & 0xFF, (ay - 1) & 0xFF])
    elif ax < 4096 and ay < 4096:
        flag = 120 + 2 * ybit + xbit
        body = bytes([ax >> 4, ((ax & 0x0F) << 4) | (ay >> 8), ay & 0xFF])
    else:
        flag = 124 + 2 * ybit + xbit
        body = struct.pack(">HH", ax, ay)
    if not on_curve:
        flag |= 0x80
    return flag, body


def _pack_simple_glyph(
    contours: list[list[tuple[int, int, bool]]],
    instructions: bytes,
    bbox: tuple[int, int, int, int],
    overlap: bool = False,
) -> bytes:
    """Canonical native glyf encoding of a simple glyph — the packing
    the reconstruction emits (short/same coordinate flags with repeat
    compression), shared by the fixture writer so transform round trips
    are byte-exact.  ``contours``: per contour, (x, y, on_curve)
    absolute points."""
    n_contours = len(contours)
    out = bytearray(struct.pack(">h4h", n_contours, *bbox))
    end = -1
    for c in contours:
        end += len(c)
        out += struct.pack(">H", end)
    out += struct.pack(">H", len(instructions)) + instructions
    flags = bytearray()
    xbytes = bytearray()
    ybytes = bytearray()
    px = py = 0
    last_flag = -1
    repeat_at = -1
    for ci, c in enumerate(contours):
        for pi, (x, y, on) in enumerate(c):
            dx, dy = x - px, y - py
            px, py = x, y
            flag = 1 if on else 0
            if ci == 0 and pi == 0 and overlap:
                flag |= 0x40  # OVERLAP_SIMPLE
            if dx == 0:
                flag |= 0x10
            elif -256 < dx < 256:
                flag |= 0x02 | (0x10 if dx > 0 else 0)
                xbytes.append(abs(dx))
            else:
                xbytes += struct.pack(">h", dx)
            if dy == 0:
                flag |= 0x20
            elif -256 < dy < 256:
                flag |= 0x04 | (0x20 if dy > 0 else 0)
                ybytes.append(abs(dy))
            else:
                ybytes += struct.pack(">h", dy)
            if flag == last_flag and repeat_at >= 0 \
                    and flags[repeat_at] < 255:
                flags[repeat_at - 1] |= 0x08
                flags[repeat_at] += 1
            elif flag == last_flag and repeat_at < 0:
                flags.append(0)  # fresh repeat counter (starts at 1)
                flags[-2] |= 0x08
                flags[-1] = 1
                repeat_at = len(flags) - 1
            else:
                flags.append(flag)
                last_flag = flag
                repeat_at = -1
    out += flags + xbytes + ybytes
    if len(out) % 2:
        out.append(0)
    return bytes(out)


def _composite_extent(data: bytes, pos: int) -> tuple[int, bool]:
    """Size of one composite glyph's component records in the
    compositeStream, and whether instructions follow."""
    have_instr = False
    start = pos
    while True:
        if pos + 4 > len(data):
            raise ValueError("font: composite record past end")
        (flags,) = struct.unpack(">H", data[pos : pos + 2])
        pos += 4  # flags + glyphIndex
        pos += 4 if flags & 0x0001 else 2  # ARG_1_AND_2_ARE_WORDS
        if flags & 0x0008:  # WE_HAVE_A_SCALE
            pos += 2
        elif flags & 0x0040:  # X_AND_Y_SCALE
            pos += 4
        elif flags & 0x0080:  # TWO_BY_TWO
            pos += 8
        if flags & 0x0100:
            have_instr = True
        if not flags & 0x0020:  # MORE_COMPONENTS clear
            break
    if pos > len(data):
        raise ValueError("font: composite record past end")
    return pos - start, have_instr


def reconstruct_glyf(
    body: bytes, orig_glyf_len: int, orig_loca_len: int
) -> tuple[bytes, bytes, dict]:
    """W3C WOFF2 §5.1 transformed-glyf reconstruction → ``(glyf,
    loca, stats)``.  Walks the seven sub-streams (nContour, nPoints,
    flags, glyph, composite, bbox, instruction), decodes coordinate
    triplets, re-emits native simple/composite glyphs in the canonical
    packing, regenerates loca in the declared index format, and checks
    both reconstructed lengths against the directory's declared
    originals.  ``stats``: n_glyphs, n_contours, n_points,
    n_composites, and the union bbox."""
    if len(body) < 36:
        raise ValueError("font: transformed glyf header past end")
    (_reserved, option_flags, num_glyphs, index_format) = struct.unpack(
        ">HHHH", body[:8]
    )
    sizes = struct.unpack(">7I", body[8:36])
    (n_contour_sz, n_points_sz, flag_sz, glyph_sz, comp_sz, bbox_sz,
     instr_sz) = sizes
    pos = 36
    streams = []
    for sz in sizes:
        if pos + sz > len(body):
            raise ValueError("font: transformed glyf stream past end")
        streams.append(body[pos : pos + sz])
        pos += sz
    (n_contour_s, n_points_s, flag_s, glyph_s, comp_s, bbox_s,
     instr_s) = streams
    overlap_s = b""
    if option_flags & 1:
        need = (num_glyphs + 7) >> 3
        if pos + need > len(body):
            raise ValueError("font: overlapSimpleBitmap past end")
        overlap_s = body[pos : pos + need]
    if n_contour_sz != 2 * num_glyphs:
        raise ValueError("font: nContourStream size mismatch")
    n_contours = struct.unpack(f">{num_glyphs}h", n_contour_s)
    bbox_bitmap_len = ((num_glyphs + 31) >> 5) << 2
    if bbox_sz < bbox_bitmap_len:
        raise ValueError("font: bboxBitmap past bboxStream end")
    bbox_bitmap = bbox_s[:bbox_bitmap_len]
    np_pos = fl_pos = gl_pos = cp_pos = in_pos = 0
    bb_pos = bbox_bitmap_len
    glyf = bytearray()
    offsets = [0]
    stats = {"n_glyphs": num_glyphs, "n_contours": 0, "n_points": 0,
             "n_composites": 0,
             "xmin": 0, "ymin": 0, "xmax": 0, "ymax": 0,
             "xmins": []}  # per glyph, 0 for empty (hmtx lsb source)
    have_bbox_any = False
    for gi in range(num_glyphs):
        nc = n_contours[gi]
        explicit_bbox = bool(
            bbox_bitmap[gi >> 3] & (0x80 >> (gi & 7))
        )
        if nc == 0:
            if explicit_bbox:
                raise ValueError(
                    "font: explicit bbox on an empty glyph"
                )
            offsets.append(len(glyf))
            stats["xmins"].append(0)
            continue
        if nc > 0:
            counts = []
            for _ in range(nc):
                v, np_pos = _read_255uint16(n_points_s, np_pos)
                counts.append(v)
            total = sum(counts)
            if total > MAX_GLYPH_POINTS or total == 0:
                raise ValueError("font: glyph point count out of range")
            if fl_pos + total > len(flag_s):
                raise ValueError("font: flag stream past end")
            contours: list[list[tuple[int, int, bool]]] = []
            x = y = 0
            xmin = ymin = 1 << 30
            xmax = ymax = -(1 << 30)
            for cnt in counts:
                c = []
                for _ in range(cnt):
                    fb = flag_s[fl_pos]
                    fl_pos += 1
                    dx, dy, gl_pos = _triplet_decode(
                        fb & 0x7F, glyph_s, gl_pos
                    )
                    x += dx
                    y += dy
                    c.append((x, y, not fb & 0x80))
                    xmin, xmax = min(xmin, x), max(xmax, x)
                    ymin, ymax = min(ymin, y), max(ymax, y)
                contours.append(c)
            ilen, gl_pos = _read_255uint16(glyph_s, gl_pos)
            if in_pos + ilen > len(instr_s):
                raise ValueError("font: instruction stream past end")
            instructions = instr_s[in_pos : in_pos + ilen]
            in_pos += ilen
            if explicit_bbox:
                if bb_pos + 8 > len(bbox_s):
                    raise ValueError("font: bbox stream past end")
                bbox = struct.unpack(">4h", bbox_s[bb_pos : bb_pos + 8])
                bb_pos += 8
            else:
                bbox = (xmin, ymin, xmax, ymax)
            overlap = bool(
                overlap_s and overlap_s[gi >> 3] & (0x80 >> (gi & 7))
            )
            glyf += _pack_simple_glyph(contours, instructions, bbox,
                                       overlap)
            stats["n_contours"] += nc
            stats["n_points"] += total
        else:
            if nc != -1:
                raise ValueError(
                    f"font: glyph {gi} contour count {nc} is invalid"
                )
            if not explicit_bbox:
                raise ValueError(
                    "font: composite glyph without explicit bbox"
                )
            if bb_pos + 8 > len(bbox_s):
                raise ValueError("font: bbox stream past end")
            bbox = struct.unpack(">4h", bbox_s[bb_pos : bb_pos + 8])
            bb_pos += 8
            ext, have_instr = _composite_extent(comp_s, cp_pos)
            rec = bytearray(struct.pack(">h4h", -1, *bbox))
            rec += comp_s[cp_pos : cp_pos + ext]
            cp_pos += ext
            if have_instr:
                ilen, gl_pos = _read_255uint16(glyph_s, gl_pos)
                if in_pos + ilen > len(instr_s):
                    raise ValueError("font: instruction stream past end")
                rec += struct.pack(">H", ilen)
                rec += instr_s[in_pos : in_pos + ilen]
                in_pos += ilen
            if len(rec) % 2:
                rec.append(0)
            glyf += rec
            stats["n_composites"] += 1
        if not have_bbox_any:
            stats["xmin"], stats["ymin"] = bbox[0], bbox[1]
            stats["xmax"], stats["ymax"] = bbox[2], bbox[3]
            have_bbox_any = True
        else:
            stats["xmin"] = min(stats["xmin"], bbox[0])
            stats["ymin"] = min(stats["ymin"], bbox[1])
            stats["xmax"] = max(stats["xmax"], bbox[2])
            stats["ymax"] = max(stats["ymax"], bbox[3])
        stats["xmins"].append(bbox[0])
        offsets.append(len(glyf))
    if len(glyf) != orig_glyf_len:
        raise ValueError(
            f"font: reconstructed glyf is {len(glyf)} bytes, directory "
            f"declares {orig_glyf_len}"
        )
    if index_format == 0:
        if any(o % 2 for o in offsets):
            raise ValueError("font: odd glyph offset with short loca")
        loca = b"".join(struct.pack(">H", o // 2) for o in offsets)
    else:
        loca = b"".join(struct.pack(">I", o) for o in offsets)
    if len(loca) != orig_loca_len:
        raise ValueError(
            f"font: reconstructed loca is {len(loca)} bytes, directory "
            f"declares {orig_loca_len}"
        )
    return bytes(glyf), loca, stats


def reconstruct_hmtx(
    body: bytes, num_glyphs: int, num_hmetrics: int, xmins: list[int]
) -> bytes:
    """W3C WOFF2 §5.4 transformed-hmtx reconstruction: a flags byte
    (bit 0: proportional lsb array omitted, bit 1: monospace
    leftSideBearing array omitted), the advance widths, and whichever
    lsb arrays were NOT omitted; omitted left side bearings equal the
    glyph's glyf xMin — which is why the spec only allows this
    transform alongside a transformed (reconstructed) glyf."""
    if not 1 <= num_hmetrics <= num_glyphs:
        raise ValueError("font: numOfHMetrics out of range")
    if len(xmins) != num_glyphs:
        raise ValueError("font: xMin list does not cover every glyph")
    if len(body) < 1:
        raise ValueError("font: transformed hmtx is empty")
    flags = body[0]
    if flags & 0xFC:
        raise ValueError("font: reserved transformed-hmtx flag bits set")
    pos = 1
    need = 2 * num_hmetrics
    if pos + need > len(body):
        raise ValueError("font: advanceWidth stream past end")
    advances = struct.unpack(f">{num_hmetrics}H", body[pos : pos + need])
    pos += need
    if flags & 0x01:
        lsbs = list(xmins[:num_hmetrics])
    else:
        if pos + need > len(body):
            raise ValueError("font: lsb stream past end")
        lsbs = list(struct.unpack(f">{num_hmetrics}h",
                                  body[pos : pos + need]))
        pos += need
    n_left = num_glyphs - num_hmetrics
    if flags & 0x02:
        lefts = list(xmins[num_hmetrics:])
    else:
        need = 2 * n_left
        if pos + need > len(body):
            raise ValueError("font: leftSideBearing stream past end")
        lefts = list(struct.unpack(f">{n_left}h", body[pos : pos + need]))
        pos += need
    if pos != len(body):
        raise ValueError("font: transformed hmtx has trailing bytes")
    out = bytearray()
    for aw, lsb in zip(advances, lsbs):
        out += struct.pack(">Hh", aw, lsb)
    for lsb in lefts:
        out += struct.pack(">h", lsb)
    return bytes(out)


def encode_hmtx_transform(
    advances: list[int], xmins: list[int], num_glyphs: int,
) -> tuple[bytes, bytes]:
    """Fixture writer → ``(native hmtx, transformed body)`` with both
    lsb arrays omitted (flags 0b11) — the shape real WOFF2 encoders
    emit when every lsb equals its glyph's xMin."""
    num_hmetrics = len(advances)
    body = bytes([0x03]) + b"".join(
        struct.pack(">H", a) for a in advances
    )
    native = bytearray()
    for a, x in zip(advances, xmins[:num_hmetrics]):
        native += struct.pack(">Hh", a, x)
    for x in xmins[num_hmetrics:num_glyphs]:
        native += struct.pack(">h", x)
    return bytes(native), body


def build_hhea(num_hmetrics: int) -> bytes:
    """Minimal hhea: version 1.0, numberOfHMetrics in the final
    field (offset 34)."""
    return (b"\x00\x01\x00\x00" + b"\x00" * 30
            + struct.pack(">H", num_hmetrics))


def encode_glyf_transform(
    glyphs: list, index_format: int = 0
) -> tuple[bytes, bytes, bytes]:
    """Fixture writer: native glyf+loca AND the §5.1 transformed body
    → ``(glyf, loca, transformed)``.  ``glyphs``: None (empty), a
    dict ``{"contours": [[(x, y, on_curve), ...]], "instructions":
    bytes, "bbox": optional explicit, "overlap": bool}`` for simple
    glyphs, or ``{"composite": bytes, "bbox": (...), "instructions":
    bytes | None}`` with raw component records for composites."""
    num_glyphs = len(glyphs)
    n_contour_s = bytearray()
    n_points_s = bytearray()
    flag_s = bytearray()
    glyph_s = bytearray()
    comp_s = bytearray()
    bbox_bitmap = bytearray(((num_glyphs + 31) >> 5) << 2)
    bbox_vals = bytearray()
    instr_s = bytearray()
    overlap_bitmap = bytearray((num_glyphs + 7) >> 3)
    any_overlap = False
    glyf = bytearray()
    offsets = [0]
    for gi, g in enumerate(glyphs):
        if g is None:
            n_contour_s += struct.pack(">h", 0)
            offsets.append(len(glyf))
            continue
        if "composite" in g:
            n_contour_s += struct.pack(">h", -1)
            bbox = g["bbox"]
            bbox_bitmap[gi >> 3] |= 0x80 >> (gi & 7)
            bbox_vals += struct.pack(">4h", *bbox)
            comp_s += g["composite"]
            rec = bytearray(struct.pack(">h4h", -1, *bbox))
            rec += g["composite"]
            instructions = g.get("instructions")
            if instructions is not None:
                glyph_s += _write_255uint16(len(instructions))
                instr_s += instructions
                rec += struct.pack(">H", len(instructions))
                rec += instructions
            if len(rec) % 2:
                rec.append(0)
            glyf += rec
            offsets.append(len(glyf))
            continue
        contours = g["contours"]
        instructions = g.get("instructions", b"")
        n_contour_s += struct.pack(">h", len(contours))
        x = y = 0
        xmin = ymin = 1 << 30
        xmax = ymax = -(1 << 30)
        for c in contours:
            n_points_s += _write_255uint16(len(c))
            for (px, py, on) in c:
                fb, body = _triplet_encode(px - x, py - y, on)
                flag_s.append(fb)
                glyph_s += body
                x, y = px, py
                xmin, xmax = min(xmin, x), max(xmax, x)
                ymin, ymax = min(ymin, y), max(ymax, y)
        glyph_s += _write_255uint16(len(instructions))
        instr_s += instructions
        auto_bbox = (xmin, ymin, xmax, ymax)
        bbox = g.get("bbox")
        if bbox is not None and tuple(bbox) != auto_bbox:
            bbox_bitmap[gi >> 3] |= 0x80 >> (gi & 7)
            bbox_vals += struct.pack(">4h", *bbox)
        else:
            bbox = auto_bbox
        if g.get("overlap"):
            overlap_bitmap[gi >> 3] |= 0x80 >> (gi & 7)
            any_overlap = True
        glyf += _pack_simple_glyph(contours, instructions, bbox,
                                   bool(g.get("overlap")))
        offsets.append(len(glyf))
    bbox_s = bytes(bbox_bitmap) + bytes(bbox_vals)
    option_flags = 1 if any_overlap else 0
    header = struct.pack(
        ">HHHH7I", 0, option_flags, num_glyphs, index_format,
        len(n_contour_s), len(n_points_s), len(flag_s), len(glyph_s),
        len(comp_s), len(bbox_s), len(instr_s),
    )
    transformed = (header + bytes(n_contour_s) + bytes(n_points_s)
                   + bytes(flag_s) + bytes(glyph_s) + bytes(comp_s)
                   + bbox_s + bytes(instr_s))
    if any_overlap:
        transformed += bytes(overlap_bitmap)
    if index_format == 0:
        loca = b"".join(struct.pack(">H", o // 2) for o in offsets)
    else:
        loca = b"".join(struct.pack(">I", o) for o in offsets)
    return bytes(glyf), loca, transformed


def _write_uintbase128(directory: bytearray, v: int) -> None:
    chunks = []
    while True:
        chunks.append(v & 0x7F)
        v >>= 7
        if not v:
            break
    for k, c in enumerate(reversed(chunks)):
        directory.append(c | (0x80 if k < len(chunks) - 1 else 0))


def build_woff2(
    sfnt: bytes, transformed_glyf: bytes | None = None,
    transformed_hmtx: bytes | None = None,
) -> bytes:
    """Deterministic WOFF2 writer from an sfnt blob: the data block is
    an uncompressed-meta-block Brotli stream — so the reference Brotli
    implementation reads it back too.  Without ``transformed_glyf``,
    glyf/loca are marked null-transform (version 3 per spec) and every
    table is stored verbatim; with it, glyf carries transform version 0
    with the given §5.1 transformed body (and its transformLength) and
    loca carries version 0 with the mandated zero-length stream.
    ``transformed_hmtx`` marks hmtx with transform version 1 and the
    §5.4 body."""
    from ..sources.brotli_codec import brotli_store

    (n_tables,) = struct.unpack(">H", sfnt[4:6])
    directory = bytearray()
    stream = bytearray()
    for i in range(n_tables):
        rec = sfnt[12 + 16 * i : 28 + 16 * i]
        tag = rec[:4]
        (t_off, t_len) = struct.unpack(">II", rec[8:16])
        body = sfnt[t_off : t_off + t_len]
        try:
            idx = _WOFF2_TAGS.index(tag)
        except ValueError:
            idx = 63
        transform = (transformed_glyf is not None
                     and tag in (b"glyf", b"loca"))
        hmtx_transform = (transformed_hmtx is not None
                          and tag == b"hmtx")
        if tag in (b"glyf", b"loca"):
            tversion = 0 if transform else 3  # 0 = transformed, 3 = null
        elif hmtx_transform:
            tversion = 1
        else:
            tversion = 0
        directory.append((tversion << 6) | idx)
        if idx == 63:
            directory += tag
        _write_uintbase128(directory, t_len)
        if transform or hmtx_transform:
            if tag == b"glyf":
                tbody = transformed_glyf
            elif tag == b"hmtx":
                tbody = transformed_hmtx
            else:
                tbody = b""
            _write_uintbase128(directory, len(tbody))
            stream += tbody
            continue
        stream += body
    comp = brotli_store(bytes(stream))
    header = bytearray(b"wOF2")
    header += sfnt[:4]  # flavor
    total_len = 48 + len(directory) + len(comp)
    header += struct.pack(">I", total_len)
    header += struct.pack(">HH", n_tables, 0)
    header += struct.pack(">I", 12 + 16 * n_tables + len(stream))
    header += struct.pack(">I", len(comp))
    header += struct.pack(">HH", 1, 0)
    header += struct.pack(">IIIII", 0, 0, 0, 0, 0)
    return bytes(header) + bytes(directory) + comp


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------


def _name_table(family: str, subfamily: str, version: str,
                ps_name: str) -> bytes:
    # one Windows/Unicode record per field (platform 3, encoding 1)
    entries = [(1, family), (2, subfamily), (5, version), (6, ps_name)]
    strings = bytearray()
    recs = bytearray()
    for nid, text in entries:
        raw = text.encode("utf-16-be")
        recs += struct.pack(">6H", 3, 1, 0x0409, nid, len(raw),
                            len(strings))
        strings += raw
    head = struct.pack(">HHH", 0, len(entries), 6 + len(recs))
    return bytes(head) + bytes(recs) + bytes(strings)


def build_sfnt(
    *,
    family: str = "Fixture Sans",
    subfamily: str = "Regular",
    version: str = "Version 1.0",
    ps_name: str = "FixtureSans-Regular",
    units_per_em: int = 1000,
    n_glyphs: int = 42,
    flavor: bytes = b"\x00\x01\x00\x00",
    glyphs: list | None = None,
    index_format: int = 0,
    hmetrics: list[int] | None = None,
) -> bytes:
    """Minimal valid sfnt: offset table + name/head/maxp — plus real
    glyf/loca tables (canonical packing, head.indexToLocFormat set)
    when ``glyphs`` is given (see :func:`encode_glyf_transform`), and
    hhea/hmtx when ``hmetrics`` (advance widths; lsbs = glyf xMins)
    is given too."""
    name = _name_table(family, subfamily, version, ps_name)
    head = (b"\x00" * 18 + struct.pack(">H", units_per_em)
            + b"\x00" * 30 + struct.pack(">hh", index_format, 0))
    maxp = b"\x00\x00\x50\x00" + struct.pack(">H", n_glyphs) + b"\x00" * 26
    tables = [(b"head", head), (b"maxp", maxp), (b"name", name)]
    if glyphs is not None:
        glyf, loca, transformed = encode_glyf_transform(
            glyphs, index_format
        )
        tables += [(b"glyf", glyf), (b"loca", loca)]
        if hmetrics is not None:
            _g2, _l2, stats = reconstruct_glyf(
                transformed, len(glyf), len(loca)
            )
            hmtx, _body = encode_hmtx_transform(
                hmetrics, stats["xmins"], len(glyphs)
            )
            tables += [(b"hhea", build_hhea(len(hmetrics))),
                       (b"hmtx", hmtx)]
    off = 12 + 16 * len(tables)
    recs = bytearray()
    body = bytearray()
    for tag, blob in tables:
        recs += tag + struct.pack(">III", 0, off + len(body), len(blob))
        body += blob + b"\x00" * ((-len(blob)) % 4)
    header = flavor + struct.pack(">HHHH", len(tables), 16, 4, 0)
    return bytes(header) + bytes(recs) + bytes(body)


def build_woff(sfnt: bytes, *, compress_name: bool = True) -> bytes:
    """Wrap a fixture sfnt as WOFF1 (name table zlib'd when asked)."""
    (n_tables,) = struct.unpack(">H", sfnt[4:6])
    entries = []
    for i in range(n_tables):
        rec = sfnt[12 + 16 * i : 28 + 16 * i]
        tag = rec[:4]
        (t_off, t_len) = struct.unpack(">II", rec[8:16])
        blob = sfnt[t_off : t_off + t_len]
        comp = (zlib.compress(blob) if compress_name and tag == b"name"
                else blob)
        if len(comp) >= len(blob):
            comp = blob
        entries.append((tag, blob, comp))
    off = 44 + 20 * len(entries)
    dirs = bytearray()
    body = bytearray()
    for tag, blob, comp in entries:
        dirs += tag + struct.pack(">4I", off + len(body), len(comp),
                                  len(blob), 0)
        body += comp + b"\x00" * ((-len(comp)) % 4)
    total = 44 + len(dirs) + len(body)
    header = (b"wOFF" + sfnt[:4] + struct.pack(">I", total)
              + struct.pack(">HH", len(entries), 0)
              + struct.pack(">I", len(sfnt))
              + struct.pack(">HH", 1, 0)
              + struct.pack(">IIIII", 0, 0, 0, 0, 0))  # meta + priv
    return bytes(header) + bytes(dirs) + bytes(body)


def build_ttc(faces: list[bytes]) -> bytes:
    """Concatenate fixture sfnts into a TTC (each face's table offsets
    rewritten to its position in the collection)."""
    header_len = 12 + 4 * len(faces)
    out = bytearray(b"ttcf\x00\x01\x00\x00")
    out += struct.pack(">I", len(faces))
    offsets = []
    pos = header_len
    bodies = bytearray()
    for face in faces:
        offsets.append(pos)
        # rewrite the face's table offsets relative to the collection
        (n_tables,) = struct.unpack(">H", face[4:6])
        face = bytearray(face)
        for i in range(n_tables):
            ro = 12 + 16 * i + 8
            (t_off,) = struct.unpack(">I", face[ro : ro + 4])
            struct.pack_into(">I", face, ro, t_off + pos)
        bodies += face
        pos += len(face)
    for off in offsets:
        out += struct.pack(">I", off)
    return bytes(out) + bytes(bodies)
