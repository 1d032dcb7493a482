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
- **WOFF2** is recognized but raises loudly: its table stream is
  Brotli-compressed and Brotli's dictionary is a fixed constants wall
  (the MP3/AAC honesty class) — metadata stays per-row capturable.

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
        from .rawavi import UnsupportedCodecError

        raise UnsupportedCodecError(
            "WOFF2 table decompression needs Brotli's fixed dictionary "
            "(the documented constants boundary); metadata is available "
            "for TTF/OTF/WOFF1/TTC"
        )
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
