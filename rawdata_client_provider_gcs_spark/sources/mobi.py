"""MOBI / PalmDoc ebooks — PDB record walk, PalmDoc LZ77, MOBI header.

The other half of the ebook family beside EPUB: Project-Gutenberg-era
archives and Kindle-adjacent corpora carry ``.mobi``/``.pdb`` files.
Everything here is public structure:

- **PDB** (Palm Database): a 78-byte header (32-byte name, type and
  creator four-CCs at offset 60) followed by an 8-byte-per-record
  offset list; ``TEXtREAd`` is bare PalmDoc, ``BOOKMOBI`` is MOBI.
- **PalmDoc header** (record 0, 16 bytes): compression (1 = none,
  2 = PalmDoc LZ77), text length, text-record count, record size.
- **PalmDoc LZ77**: byte-wise ops — 0x01-0x08 literal escapes,
  0x09-0x7F literals, 0x80-0xBF two-byte distance/length pairs
  (11-bit distance ≤ 2047, lengths 3-10), 0xC0-0xFF space+char pairs.
- **MOBI header** (record 0 from offset 16): text encoding (cp1252 /
  UTF-8), full-name offset/length, version, and — for version ≥ 5
  with header length ≥ 0xE4 — the extra-record-data flags whose set
  bits mark per-record TRAILING entries (backward-coded sizes, plus
  the multibyte-overlap low bit) that must be stripped before
  decompression.
- **HuffCDIC** (compression 17480, ``DH``): the Kindle-era scheme —
  canonical-Huffman codes over a phrase dictionary whose HUFF/CDIC
  table records ship inside the same PDB container (r15;
  ``sources/huffcdic.py``).  Unknown compressions raise ``ValueError``
  with the reason for per-row capture.

The fixture writer emits both containers with both compressions,
multi-record texts, and optional trailing entries, so the reader's
grammar is pinned both directions without any external tool (none in
this environment can produce PalmDoc).

Reference behavioral parity: the reference transport stores opaque
named byte arrays (RawdataMessage.java:15-60); document parsing is
this repo's derived curation tier.
"""

from __future__ import annotations

import struct

MAX_TEXT_BYTES = 64 * 1024 * 1024
MAX_RECORDS = 1 << 16


def sniff_mobi(data: bytes) -> bool:
    """PDB container with a PalmDoc/MOBI type-creator pair.  The
    type/creator live at offset 60 (not a prefix magic), so the probe
    also demands a sane record list — a tar member whose NAME happens
    to span those bytes must not route here."""
    if len(data) < 78 or data[60:68] not in (b"BOOKMOBI", b"TEXtREAd"):
        return False
    # nextRecordListID is 0 in every on-disk PDB; octal-ASCII tar
    # header fields in the same region are nonzero
    if data[72:76] != b"\x00\x00\x00\x00":
        return False
    (n_records,) = struct.unpack(">H", data[76:78])
    if not 1 <= n_records <= MAX_RECORDS:
        return False
    return 78 + 8 * n_records <= len(data)


def palmdoc_decompress(data: bytes, cap: int = MAX_TEXT_BYTES) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        i += 1
        if 1 <= c <= 8:
            if i + c > n:
                raise ValueError("palmdoc: literal escape past end")
            out += data[i : i + c]
            i += c
        elif c < 0x80:
            out.append(c)
        elif c >= 0xC0:
            out += b" "
            out.append(c ^ 0x80)
        else:
            if i >= n:
                raise ValueError("palmdoc: truncated LZ77 pair")
            pair = (c << 8) | data[i]
            i += 1
            dist = (pair >> 3) & 0x07FF
            length = (pair & 7) + 3
            if dist == 0 or dist > len(out):
                raise ValueError("palmdoc: LZ77 distance out of range")
            for _ in range(length):
                out.append(out[-dist])
        if len(out) > cap:
            raise ValueError("palmdoc: output over the cap")
    return bytes(out)


def palmdoc_compress(data: bytes) -> bytes:
    """Greedy PalmDoc LZ77 encoder (fixture + genuine compressor):
    longest match 3-10 within the 2047-byte window, space+char pairs,
    literal escapes for bytes outside 0x09-0x7F."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        best_len = 0
        best_dist = 0
        max_dist = min(i, 2047)
        for dist in range(1, max_dist + 1):
            ln = 0
            while (ln < 10 and i + ln < n
                   and data[i + ln - dist] == data[i + ln]):
                ln += 1
            if ln > best_len:
                best_len, best_dist = ln, dist
                if ln == 10:
                    break
        if best_len >= 3:
            pair = 0x8000 | (best_dist << 3) | (best_len - 3)
            out += pair.to_bytes(2, "big")
            i += best_len
            continue
        b = data[i]
        if (b == 0x20 and i + 1 < n and 0x40 <= data[i + 1] <= 0x7F):
            out.append(data[i + 1] ^ 0x80)
            i += 2
            continue
        if 0x09 <= b <= 0x7F:
            out.append(b)
            i += 1
            continue
        j = i
        while j < n and j - i < 8 and not 0x09 <= data[j] <= 0x7F:
            j += 1
        out.append(j - i)
        out += data[i:j]
        i = j
    return bytes(out)


def _trailing_size(record: bytes, extra_flags: int) -> int:
    """Total size of the per-record trailing entries marked by the
    MOBI extra-record-data flags (each a backward-coded size that
    includes its own bytes; the low bit marks the 2-bit-sized
    multibyte-overlap entry)."""

    def entry_size(data: bytes) -> int:
        num = 0
        for v in data[-4:]:
            if v & 0x80:
                num = 0
            num = (num << 7) | (v & 0x7F)
        return num

    num = 0
    flags = extra_flags >> 1
    while flags:
        if flags & 1:
            if num >= len(record):
                raise ValueError(
                    "mobi: trailing entries exceed the record"
                )
            num += entry_size(record[: len(record) - num])
        flags >>= 1
    if extra_flags & 1:
        if num >= len(record):
            raise ValueError("mobi: trailing entries exceed the record")
        num += (record[len(record) - num - 1] & 0x3) + 1
    if num > len(record):
        raise ValueError("mobi: trailing entries exceed the record")
    return num


def parse_mobi(data: bytes) -> dict:
    """PDB/PalmDoc/MOBI → ``{"format", "title", "encoding",
    "compression", "n_text_records", "text"}``."""
    if not sniff_mobi(data):
        raise ValueError("mobi: no PDB TEXtREAd/BOOKMOBI signature")
    (n_records,) = struct.unpack(">H", data[76:78])
    if n_records == 0 or n_records > MAX_RECORDS:
        raise ValueError(f"mobi: {n_records} PDB records out of range")
    if 78 + 8 * n_records > len(data):
        raise ValueError("mobi: PDB record list past end")
    offsets = []
    for i in range(n_records):
        (off,) = struct.unpack(">I", data[78 + 8 * i : 82 + 8 * i])
        if off > len(data):
            raise ValueError("mobi: PDB record offset past end")
        if offsets and off < offsets[-1]:
            raise ValueError("mobi: PDB record offsets not monotonic")
        offsets.append(off)
    offsets.append(len(data))

    def record(i: int) -> bytes:
        return data[offsets[i] : offsets[i + 1]]

    r0 = record(0)
    if len(r0) < 16:
        raise ValueError("mobi: record 0 shorter than a PalmDoc header")
    compression, _u, text_length, record_count, _rec_size, _enc = (
        struct.unpack(">HHIHHH", r0[:14])
    )
    if text_length > MAX_TEXT_BYTES:
        raise ValueError("mobi: declared text length over the cap")
    if record_count >= n_records:
        raise ValueError("mobi: text-record count exceeds PDB records")
    is_mobi = data[60:68] == b"BOOKMOBI"
    encoding = "cp1252"
    title = data[:32].split(b"\x00", 1)[0].decode("latin-1")
    extra_flags = 0
    exth: dict[int, bytes] = {}
    if is_mobi:
        if len(r0) < 24 or r0[16:20] != b"MOBI":
            raise ValueError("mobi: BOOKMOBI without a MOBI header")
        (mobi_len,) = struct.unpack(">I", r0[20:24])
        (enc_code,) = struct.unpack(">I", r0[28:32])
        encoding = {1252: "cp1252", 65001: "utf-8"}.get(enc_code)
        if encoding is None:
            raise ValueError(f"mobi: unsupported text encoding {enc_code}")
        if len(r0) >= 92:
            name_off, name_len = struct.unpack(">II", r0[84:92])
            if name_off + name_len <= len(r0) and name_len < 4096:
                title = r0[name_off : name_off + name_len].decode(
                    encoding, "replace"
                )
        if mobi_len >= 0xE4 and len(r0) >= 0xF4:
            (version,) = struct.unpack(">I", r0[0x68:0x6C])
            if version >= 5:
                (extra_flags,) = struct.unpack(">H", r0[0xF2:0xF4])
        if len(r0) >= 132:
            (exth_flag,) = struct.unpack(">I", r0[128:132])
            if exth_flag & 0x40:
                exth = _parse_exth(r0, 16 + mobi_len)
    huff = None
    if compression == 17480:
        if not is_mobi:
            raise ValueError("mobi: DH compression without a MOBI header")
        if len(r0) < 0x78:
            raise ValueError("mobi: MOBI header too short for HUFF fields")
        huff_off, huff_count = struct.unpack(">II", r0[0x70:0x78])
        if huff_count < 2 or huff_off + huff_count > n_records:
            raise ValueError("mobi: HUFF record range out of bounds")
        from .huffcdic import HuffCdic

        huff = HuffCdic([record(huff_off + i) for i in range(huff_count)])
    elif compression not in (1, 2):
        raise ValueError(f"mobi: unknown compression {compression}")
    chunks = []
    total = 0
    for i in range(1, record_count + 1):
        rec = record(i)
        if extra_flags:
            rec = rec[: len(rec) - _trailing_size(rec, extra_flags)]
        if compression == 2:
            rec = palmdoc_decompress(rec, MAX_TEXT_BYTES - total)
        elif huff is not None:
            rec = huff.unpack(rec, MAX_TEXT_BYTES - total)
        total += len(rec)
        if total > MAX_TEXT_BYTES:
            raise ValueError("mobi: text over the cap")
        chunks.append(rec)
    raw = b"".join(chunks)[:text_length]
    if len(raw) < text_length:
        raise ValueError(
            f"mobi: text records yield {len(raw)} bytes, header "
            f"declares {text_length}"
        )
    return {
        "format": "mobi" if is_mobi else "palmdoc",
        "title": title,
        "author": exth.get(100, b"").decode(encoding, "replace"),
        "language": exth.get(524, b"").decode(encoding, "replace"),
        "encoding": encoding,
        "compression": compression,
        "n_text_records": record_count,
        "text": raw.decode(encoding, "replace"),
    }


def _parse_exth(r0: bytes, pos: int) -> dict[int, bytes]:
    """EXTH metadata block → {record type: payload} (first wins)."""
    if pos + 12 > len(r0) or r0[pos : pos + 4] != b"EXTH":
        raise ValueError("mobi: EXTH flag set but no EXTH header")
    _hlen, count = struct.unpack(">II", r0[pos + 4 : pos + 12])
    if count > 4096:
        raise ValueError("mobi: EXTH record count out of range")
    out: dict[int, bytes] = {}
    p = pos + 12
    for _ in range(count):
        if p + 8 > len(r0):
            raise ValueError("mobi: truncated EXTH record")
        rtype, rlen = struct.unpack(">II", r0[p : p + 8])
        if rlen < 8 or p + rlen > len(r0):
            raise ValueError("mobi: EXTH record length out of range")
        out.setdefault(rtype, r0[p + 8 : p + rlen])
        p += rlen
    return out


def mobi_parts(data: bytes) -> tuple[str, list[tuple[str, str]]]:
    """Office-tier adapter: the book text as one XML-escaped part so
    the shared Catalyst chain stays the single decode point."""
    m = parse_mobi(data)
    esc = (m["text"].replace("&", "&amp;").replace("<", "&lt;")
           .replace(">", "&gt;"))
    return m["format"], [("book", "<p>" + esc + "</p>")]


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------


def _pdb(name: bytes, type_creator: bytes, records: list[bytes]) -> bytes:
    header = bytearray()
    header += name[:31].ljust(32, b"\x00")
    header += struct.pack(">HHIIIIII", 0, 0, 0, 0, 0, 0, 0, 0)
    header += type_creator
    header += struct.pack(">II", 0, 0)
    header += struct.pack(">H", len(records))
    out = bytearray(header)
    off = len(header) + 8 * len(records)
    for i, rec in enumerate(records):
        # record entry: offset(4) attributes(1) uniqueID(3)
        out += struct.pack(">I", off) + bytes([0]) + i.to_bytes(3, "big")
        off += len(rec)
    for rec in records:
        out += rec
    return bytes(out)


def build_mobi(
    text: str,
    *,
    title: str = "Fixture Book",
    author: str = "",
    language: str = "",
    compression: int = 2,
    record_size: int = 4096,
    encoding: str = "utf-8",
    palmdoc: bool = False,
    trailing: bytes = b"",
    huff_code_len: int = 8,
    huff_cdic_bits: int = 16,
    huff_recursive: bool = False,
) -> bytes:
    """Deterministic PDB writer: bare PalmDoc (``palmdoc=True``,
    always cp1252) or MOBI with a version-6 header (cp1252/UTF-8,
    full-name record, an EXTH block carrying author/language when
    given, extra-flags bit 1 when ``trailing`` bytes are appended to
    every text record).  ``compression=17480`` emits HuffCDIC text
    records plus their in-container HUFF/CDIC table records (the
    ``huff_*`` knobs select the fixture encoder's code paths)."""
    if palmdoc:
        encoding = "cp1252"
    raw = text.encode(encoding)
    recs = [raw[i : i + record_size]
            for i in range(0, len(raw), record_size)] or [b""]
    huff_records: list = []
    if compression == 2:
        body = [palmdoc_compress(r) for r in recs]
    elif compression == 17480:
        if palmdoc:
            raise ValueError("mobi fixture: DH needs a MOBI header")
        from .huffcdic import HuffCdicEncoder

        enc = HuffCdicEncoder(
            recs, code_len=huff_code_len, cdic_bits=huff_cdic_bits,
            recursive=huff_recursive,
        )
        body = [enc.encode(r) for r in recs]
        huff_records = enc.records()
    else:
        body = list(recs)
    if trailing:
        if len(trailing) > 62:
            raise ValueError("mobi fixture: trailing entry too large")
        # backward-coded size includes its own byte: size byte has the
        # high bit set (terminator of the backward scan)
        entry = trailing + bytes([0x80 | (len(trailing) + 1)])
        body = [b + entry for b in body]
    palm_header = struct.pack(
        ">HHIHHH", compression, 0, len(raw), len(body), record_size, 0
    ) + b"\x00\x00"
    if palmdoc:
        r0 = palm_header
        return _pdb(title.encode("cp1252", "replace"), b"TEXtREAd",
                    [r0] + body)
    name = title.encode(encoding)
    exth = b""
    if author or language:
        exth_recs = []
        if author:
            a = author.encode(encoding)
            exth_recs.append(struct.pack(">II", 100, 8 + len(a)) + a)
        if language:
            lg = language.encode(encoding)
            exth_recs.append(struct.pack(">II", 524, 8 + len(lg)) + lg)
        eb = b"".join(exth_recs)
        exth = (b"EXTH" + struct.pack(">II", 12 + len(eb), len(exth_recs))
                + eb)
    mobi_len = 0xE8
    mobi = bytearray(b"\x00" * mobi_len)
    mobi[0:4] = b"MOBI"
    struct.pack_into(">I", mobi, 4, mobi_len)
    struct.pack_into(">I", mobi, 8, 2)  # mobitype: book
    struct.pack_into(">I", mobi, 12, 65001 if encoding == "utf-8" else 1252)
    struct.pack_into(">I", mobi, 16, 0x2A)  # uid
    struct.pack_into(">I", mobi, 20, 6)  # version (header field)
    # full name lives after the MOBI header (and EXTH) in record 0
    name_off = 16 + mobi_len + len(exth)
    struct.pack_into(">II", mobi, 68, name_off, len(name))
    if exth:
        # EXTH-present flag: record0 offset 0x80 = MOBI offset 0x70
        struct.pack_into(">I", mobi, 0x70, 0x40)
    # version field the extra-flags gate reads (record0 offset 0x68 =
    # MOBI offset 0x58)
    struct.pack_into(">I", mobi, 0x58, 6)
    extra_flags = 0b10 if trailing else 0
    # record0 offset 0xF2 = MOBI offset 0xE2
    struct.pack_into(">H", mobi, 0xE2, extra_flags)
    if huff_records:
        # HUFF record index/count: record0 0x70/0x74 = MOBI 0x60/0x64
        struct.pack_into(">II", mobi, 0x60, 1 + len(body),
                         len(huff_records))
    r0 = palm_header + bytes(mobi) + exth + name + b"\x00\x00"
    return _pdb(title.encode("latin-1", "replace")[:20], b"BOOKMOBI",
                [r0] + body + huff_records)
