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
  byte-exact.  The glyf/loca triplet transform stays a documented
  census boundary (tables are listed with sizes, content marked
  transformed); font collections (``ttcf`` flavor) stay loud.

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
    for tag, orig_len, stream_len, transformed in entries:
        body = blob[off : off + stream_len]
        off += stream_len
        census.append({"tag": tag.decode("latin-1"), "size": orig_len,
                       "transformed": transformed})
        if not transformed and tag in (b"name", b"head", b"maxp"):
            tables[tag] = body
    face = _face_meta(
        flavor if flavor in _SFNT_VERSIONS else b"\x00\x01\x00\x00",
        tables,
    )
    face["flavor"] = "otf" if flavor == b"OTTO" else "ttf"
    face["tables"] = census
    return face


def build_woff2(sfnt: bytes) -> bytes:
    """Deterministic WOFF2 writer from an sfnt blob: untransformed
    tables (glyf/loca marked null-transform version 3 per spec), the
    data block as an uncompressed-meta-block Brotli stream — so the
    reference Brotli implementation reads it back too."""
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
        tversion = 3 if tag in (b"glyf", b"loca") else 0  # null transform
        directory.append((tversion << 6) | idx)
        if idx == 63:
            directory += tag
        v = t_len
        chunks = []
        while True:
            chunks.append(v & 0x7F)
            v >>= 7
            if not v:
                break
        for k, c in enumerate(reversed(chunks)):
            directory.append(c | (0x80 if k < len(chunks) - 1 else 0))
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
) -> bytes:
    """Minimal valid sfnt: offset table + name/head/maxp."""
    name = _name_table(family, subfamily, version, ps_name)
    head = b"\x00" * 18 + struct.pack(">H", units_per_em) + b"\x00" * 34
    maxp = b"\x00\x00\x50\x00" + struct.pack(">H", n_glyphs) + b"\x00" * 26
    tables = [(b"head", head), (b"maxp", maxp), (b"name", name)]
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
