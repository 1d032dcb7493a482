"""Legacy binary Office text: .doc piece table, .xls BIFF8 cells,
.ppt text atoms.

The OLE2/CFB container walk (:mod:`.cfb`) already exposes the named
streams; this module decodes the text-bearing ones — all three
formats store text as *located verbatim bytes* (code-page or UTF-16
runs addressed by offset tables), so extraction is navigation plus
transcoding, never numeric synthesis:

- **.doc** (public spec MS-DOC): the ``WordDocument`` stream's FIB
  names a Clx structure in the ``0Table``/``1Table`` stream (the
  FibBase ``fWhichTblStm`` bit picks which); the Clx's PlcPcd maps
  character positions to *pieces*, each a run of cp1252 (``fc`` bit
  30 set, byte offset ``fc/2``) or UTF-16LE (offset ``fc``) bytes in
  the ``WordDocument`` stream.  The tier emits the main-document
  range (the FIB's ``ccpText`` CPs); footnote/header subdocument CPs
  past it are out of the documented subset.
- **.xls** (public spec MS-XLS, BIFF8): the ``Workbook`` stream is a
  record sequence; the globals substream carries ``BoundSheet8``
  records (sheet names + substream offsets) and the ``SST`` shared
  strings (with ``Continue``-record splits that restart the
  ``fHighByte`` flag mid-string); each sheet substream's cell records
  (``LabelSst``/``Label``/``Number``/``RK``/``MulRk``/``BoolErr``/
  ``Formula``+``String``) resolve to text in (row, column) order.
- **.ppt** (public spec MS-PPT): the ``PowerPoint Document`` stream
  is a record tree; ``TextCharsAtom`` (UTF-16LE) and
  ``TextBytesAtom`` (cp1252) atoms carry the display text, grouped
  here by their innermost ``Slide``/``Notes``/``MainMaster``
  container (atoms outside any land in a ``document`` part — where
  PPT97 ``SlideListWithText`` outline text lives).

Output parts are synthetic XML (values entity-escaped, one
``<x:c>``-style element per unit) so the Catalyst tag-strip/entity
chain in :func:`.office.office_text_col` stays the single decode
point, exactly like the XLSX path.  Malformed input raises
``ValueError`` (per-row capture); offset tables are bounds-checked
and count-capped so hostile files cannot loop or balloon.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); document
container decoding is this repo's derived crawl tier.
"""

from __future__ import annotations

import math
import struct

#: bomb guards
MAX_PIECES = 1 << 16
MAX_DOC_CHARS = 64 * 1024 * 1024
MAX_SST_STRINGS = 1 << 20
MAX_SHEETS = 4096
MAX_CELLS = 1 << 20
MAX_PPT_DEPTH = 16
MAX_PPT_ATOMS = 1 << 16

_XLS_ERRORS = {
    0x00: "#NULL!", 0x07: "#DIV/0!", 0x0F: "#VALUE!", 0x17: "#REF!",
    0x1D: "#NAME?", 0x24: "#NUM!", 0x2A: "#N/A",
}


def _xml_escape(text: str) -> str:
    return (
        text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


# ---------------------------------------------------------------------------
# .doc — FIB + piece table (MS-DOC)
# ---------------------------------------------------------------------------

#: FibRgFcLcb97 pair index of fcClx/lcbClx (MS-DOC §2.5.5: StshfOrig=0
#: … SttbfAssoc=32, Clx=33)
_FCLCB_CLX = 33

#: piece-text control characters → output (MS-DOC §2.8.24 / §1.3.5):
#: CR paragraph mark, cell/row mark, vertical tab (line break), page/
#: section break, non-breaking and optional hyphens, field chars
_DOC_CTRL = {
    0x0D: "\n", 0x07: "\t", 0x0B: "\n", 0x0C: "\n",
    0x1E: "-", 0x1F: "", 0x13: "", 0x14: "", 0x15: "",
    0x01: "", 0x02: "", 0x05: "", 0x08: "",
}


def _doc_chars(text: str) -> str:
    out = []
    for ch in text:
        o = ord(ch)
        if o < 0x20:
            out.append(_DOC_CTRL.get(o, " "))
        else:
            out.append(ch)
    return "".join(out)


def doc_text_of(worddoc: bytes, table: bytes) -> str:
    """``WordDocument`` + table stream → main-document text (the
    FIB's ``ccpText`` CPs).  See :func:`doc_texts_of` for the
    subdocument tail."""
    return doc_texts_of(worddoc, table)[0]


def doc_texts_of(worddoc: bytes, table: bytes) -> tuple[str, str]:
    """``WordDocument`` + table stream → ``(main_text, subdoc_text)``.

    Walks FIB → fcClx/lcbClx → Clx → PlcPcd → pieces, decoding each
    piece's cp1252 or UTF-16LE run and mapping Word control
    characters.  The first ``ccpText`` CPs are the main document; the
    piece table's remaining CPs (footnotes, headers/footers,
    annotations — MS-DOC's trailing subdocuments) come back as the
    second element instead of being dropped."""
    try:
        return _doc_text(worddoc, table)
    except struct.error as exc:
        raise ValueError(f"doc: truncated structure: {exc}")


def _doc_text(worddoc: bytes, table: bytes) -> str:
    if len(worddoc) < 34:
        raise ValueError("doc: WordDocument stream shorter than FibBase")
    (w_ident, n_fib) = struct.unpack_from("<HH", worddoc, 0)
    if w_ident != 0xA5EC:
        raise ValueError(f"doc: FIB wIdent 0x{w_ident:04x}")
    (flags,) = struct.unpack_from("<H", worddoc, 10)
    if flags & 0x0100:
        raise ValueError("doc: encrypted document (fEncrypted)")
    (csw,) = struct.unpack_from("<H", worddoc, 32)
    lw_count_off = 34 + 2 * csw
    (cslw,) = struct.unpack_from("<H", worddoc, lw_count_off)
    lw_off = lw_count_off + 2
    (ccp_text,) = struct.unpack_from("<I", worddoc, lw_off + 12)
    fclcb_count_off = lw_off + 4 * cslw
    (cb_rgfclcb,) = struct.unpack_from("<H", worddoc, fclcb_count_off)
    if cb_rgfclcb <= _FCLCB_CLX:
        raise ValueError(
            f"doc: FIB declares {cb_rgfclcb} fc/lcb pairs (nFib "
            f"0x{n_fib:04x}) — no Clx slot"
        )
    clx_slot = fclcb_count_off + 2 + 8 * _FCLCB_CLX
    (fc_clx, lcb_clx) = struct.unpack_from("<II", worddoc, clx_slot)
    if lcb_clx == 0:
        raise ValueError("doc: FIB names an empty Clx")
    if fc_clx + lcb_clx > len(table):
        raise ValueError("doc: Clx range past the table stream")
    clx = table[fc_clx : fc_clx + lcb_clx]

    # Clx = Prc* (clxt=0x01) then one Pcdt (clxt=0x02)
    pos = 0
    plcpcd = None
    while pos < len(clx):
        kind = clx[pos]
        if kind == 0x01:
            (cb_grpprl,) = struct.unpack_from("<h", clx, pos + 1)
            if cb_grpprl < 0:
                raise ValueError("doc: negative Prc length")
            pos += 3 + cb_grpprl
        elif kind == 0x02:
            (lcb,) = struct.unpack_from("<I", clx, pos + 1)
            if pos + 5 + lcb > len(clx):
                raise ValueError("doc: Pcdt length past the Clx")
            plcpcd = clx[pos + 5 : pos + 5 + lcb]
            break
        else:
            raise ValueError(f"doc: unknown Clx element 0x{kind:02x}")
    if plcpcd is None:
        raise ValueError("doc: Clx has no Pcdt")
    if len(plcpcd) < 4 or (len(plcpcd) - 4) % 12:
        raise ValueError(f"doc: PlcPcd length {len(plcpcd)} not 12n+4")
    n = (len(plcpcd) - 4) // 12
    if n == 0:
        raise ValueError("doc: empty piece table")
    if n > MAX_PIECES:
        raise ValueError(f"doc: {n} pieces over the cap (bomb)")
    cps = struct.unpack_from(f"<{n + 1}I", plcpcd, 0)
    if cps[-1] > MAX_DOC_CHARS:
        raise ValueError("doc: piece table spans over the char cap (bomb)")

    out: list[str] = []
    for i in range(n):
        cp_len = cps[i + 1] - cps[i]
        if cp_len < 0:
            raise ValueError("doc: piece CPs decrease")
        (_pflags, fc_raw, _prm) = struct.unpack_from(
            "<HIH", plcpcd, 4 * (n + 1) + 8 * i
        )
        fc = fc_raw & 0x3FFFFFFF
        if fc_raw & 0x40000000:  # fCompressed: cp1252, byte offset fc/2
            off = fc // 2
            if off + cp_len > len(worddoc):
                raise ValueError("doc: cp1252 piece past the stream end")
            out.append(worddoc[off : off + cp_len].decode("cp1252", "replace"))
        else:
            if fc + 2 * cp_len > len(worddoc):
                raise ValueError("doc: unicode piece past the stream end")
            out.append(
                worddoc[fc : fc + 2 * cp_len].decode("utf-16-le", "replace")
            )
    text = "".join(out)
    if not ccp_text:
        ccp_text = len(text)
    return _doc_chars(text[:ccp_text]), _doc_chars(text[ccp_text:])


# ---------------------------------------------------------------------------
# .xls — BIFF8 (MS-XLS)
# ---------------------------------------------------------------------------

_RT_BOF = 0x0809
_RT_EOF = 0x000A
_RT_BOUNDSHEET = 0x0085
_RT_SST = 0x00FC
_RT_CONTINUE = 0x003C
_RT_LABELSST = 0x00FD
_RT_LABEL = 0x0204
_RT_NUMBER = 0x0203
_RT_RK = 0x027E
_RT_MULRK = 0x00BD
_RT_BOOLERR = 0x0205
_RT_FORMULA = 0x0006
_RT_STRING = 0x0207


def _records(data: bytes):
    """BIFF record walk → ``[(rt, payload, offset)]`` with bounds
    guards; a record length past the stream raises."""
    out = []
    pos = 0
    while pos + 4 <= len(data):
        (rt, cb) = struct.unpack_from("<HH", data, pos)
        if pos + 4 + cb > len(data):
            raise ValueError(f"xls: record 0x{rt:04x} length past the stream")
        out.append((rt, data[pos + 4 : pos + 4 + cb], pos))
        pos += 4 + cb
    return out


class _SstCursor:
    """Cursor over SST + Continue payload segments.  Fixed fields read
    across segment boundaries by concatenation; character data honors
    the fresh ``fHighByte`` grbit each Continue restarts mid-string
    (MS-XLS §2.5.293)."""

    def __init__(self, segments: list[bytes]):
        self.segs = segments
        self.i = 0
        self.off = 0

    def _avail(self) -> int:
        return len(self.segs[self.i]) - self.off if self.i < len(self.segs) \
            else 0

    def _advance_segment(self) -> None:
        self.i += 1
        self.off = 0
        if self.i >= len(self.segs):
            raise ValueError("xls: SST runs past its Continue records")

    def take(self, n: int) -> bytes:
        """n raw bytes, spanning segments (fixed fields, runs, ExtRst)."""
        out = bytearray()
        while n:
            if not self._avail():
                self._advance_segment()
                continue
            k = min(n, self._avail())
            out += self.segs[self.i][self.off : self.off + k]
            self.off += k
            n -= k
        return bytes(out)

    def chars(self, cch: int, high: bool) -> str:
        """cch characters; each segment crossing re-reads the grbit."""
        out = []
        while cch:
            if not self._avail():
                self._advance_segment()
                (grbit,) = self.take(1)
                high = bool(grbit & 1)
                continue
            width = 2 if high else 1
            k = min(cch, self._avail() // width)
            if k == 0:  # a UTF-16 char split across segments is invalid
                raise ValueError("xls: string character split mid-segment")
            raw = self.segs[self.i][self.off : self.off + k * width]
            self.off += k * width
            cch -= k
            out.append(
                raw.decode("utf-16-le" if high else "latin-1", "replace")
            )
        return "".join(out)


def _sst_strings(segments: list[bytes]) -> list[str]:
    cur = _SstCursor(segments)
    (_total, unique) = struct.unpack("<II", cur.take(8))
    if unique > MAX_SST_STRINGS:
        raise ValueError(f"xls: SST declares {unique} strings (bomb)")
    out = []
    for _ in range(unique):
        (cch,) = struct.unpack("<H", cur.take(2))
        (flags,) = cur.take(1)
        c_run = 0
        cb_ext = 0
        if flags & 0x08:
            (c_run,) = struct.unpack("<H", cur.take(2))
        if flags & 0x04:
            (cb_ext,) = struct.unpack("<i", cur.take(4))
            if cb_ext < 0:
                raise ValueError("xls: negative ExtRst length")
        out.append(cur.chars(cch, bool(flags & 0x01)))
        cur.take(4 * c_run)
        cur.take(cb_ext)
    return out


def _short_unistr(data: bytes, pos: int) -> tuple[str, int]:
    """ShortXLUnicodeString (u8 cch) → (text, next_pos)."""
    cch = data[pos]
    flags = data[pos + 1]
    if flags & 0x01:
        raw = data[pos + 2 : pos + 2 + 2 * cch]
        return raw.decode("utf-16-le", "replace"), pos + 2 + 2 * cch
    raw = data[pos + 2 : pos + 2 + cch]
    return raw.decode("latin-1", "replace"), pos + 2 + cch


def _unistr(data: bytes, pos: int) -> str:
    """XLUnicodeString (u16 cch) → text (trailing rich/ext ignored)."""
    (cch,) = struct.unpack_from("<H", data, pos)
    flags = data[pos + 2]
    p = pos + 3
    if flags & 0x08:
        p += 2
    if flags & 0x04:
        p += 4
    if flags & 0x01:
        return data[p : p + 2 * cch].decode("utf-16-le", "replace")
    return data[p : p + cch].decode("latin-1", "replace")


def _rk_value(v: int) -> float:
    """RK number decode: fX100 (bit 0) divides by 100; fInt (bit 1)
    holds a signed 30-bit integer in bits 2-31, else bits 2-31 are the
    high 30 bits of an IEEE f64."""
    if v & 0x02:
        n = v >> 2
        if n & 0x20000000:
            n -= 0x40000000
        val = float(n)
    else:
        (val,) = struct.unpack("<d", struct.pack("<Q", (v & 0xFFFFFFFC) << 32))
    return val / 100.0 if v & 0x01 else val


def _num_text(v: float) -> str:
    if not math.isfinite(v):
        # IEEE inf/nan in a NUMBER/RK payload is hostile input — keep
        # it in the ValueError per-row class (int(inf) raises
        # OverflowError, which would escape the capture contract)
        raise ValueError(f"xls: non-finite cell value {v!r}")
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def xls_sheets_of(workbook: bytes) -> list[tuple[str, list[str]]]:
    """``Workbook`` stream → ``[(sheet_name, [cell_text, ...])]`` with
    cells in (row, column) order; visible and hidden worksheets both
    emit (hiding is presentation, not absence)."""
    try:
        return _xls_sheets(workbook)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"xls: truncated record: {exc}")


def _xls_sheets(workbook: bytes) -> list[tuple[str, list[str]]]:
    recs = _records(workbook)
    if not recs or recs[0][0] != _RT_BOF:
        raise ValueError("xls: Workbook stream does not start with BOF")
    bounds: list[tuple[int, str]] = []
    sst: list[str] = []
    i = 0
    # globals substream: up to the first EOF
    while i < len(recs):
        rt, body, _off = recs[i]
        if rt == _RT_EOF:
            break
        if rt == _RT_BOUNDSHEET:
            (lb_ply_pos, grbit) = struct.unpack_from("<IH", body, 0)
            name, _ = _short_unistr(body, 6)
            if (grbit >> 8) & 0xFF == 0:  # worksheet (not chart/macro)
                bounds.append((lb_ply_pos, name))
        elif rt == _RT_SST:
            segments = [body]
            while i + 1 < len(recs) and recs[i + 1][0] == _RT_CONTINUE:
                i += 1
                segments.append(recs[i][1])
            sst = _sst_strings(segments)
        i += 1
    else:
        raise ValueError("xls: globals substream has no EOF")
    if not bounds:
        raise ValueError("xls: no BoundSheet8 records")
    if len(bounds) > MAX_SHEETS:
        raise ValueError(f"xls: {len(bounds)} sheets over the cap (bomb)")

    by_offset = {off: k for k, (_rt, _b, off) in enumerate(recs)}
    out: list[tuple[str, list[str]]] = []
    for lb_ply_pos, name in bounds:
        k = by_offset.get(lb_ply_pos)
        if k is None or recs[k][0] != _RT_BOF:
            raise ValueError(
                f"xls: sheet {name!r} offset {lb_ply_pos} is not a BOF"
            )
        cells: list[tuple[int, int, str]] = []
        k += 1
        pending_formula: tuple[int, int] | None = None
        while k < len(recs):
            rt, body, _off = recs[k]
            if rt == _RT_EOF:
                break
            if len(cells) > MAX_CELLS:
                raise ValueError(f"xls: sheet over {MAX_CELLS} cells (bomb)")
            if rt == _RT_LABELSST:
                (rw, col, _ixfe, isst) = struct.unpack_from("<HHHI", body, 0)
                if isst >= len(sst):
                    raise ValueError(
                        f"xls: SST index {isst} out of range ({len(sst)})"
                    )
                cells.append((rw, col, sst[isst]))
            elif rt == _RT_LABEL:
                (rw, col, _ixfe) = struct.unpack_from("<HHH", body, 0)
                cells.append((rw, col, _unistr(body, 6)))
            elif rt == _RT_NUMBER:
                (rw, col, _ixfe, num) = struct.unpack_from("<HHHd", body, 0)
                cells.append((rw, col, _num_text(num)))
            elif rt == _RT_RK:
                (rw, col, _ixfe, rk) = struct.unpack_from("<HHHI", body, 0)
                cells.append((rw, col, _num_text(_rk_value(rk))))
            elif rt == _RT_MULRK:
                (rw, col_first) = struct.unpack_from("<HH", body, 0)
                n_rk = (len(body) - 6) // 6
                for j in range(n_rk):
                    (_ixfe, rk) = struct.unpack_from("<HI", body, 4 + 6 * j)
                    cells.append(
                        (rw, col_first + j, _num_text(_rk_value(rk)))
                    )
            elif rt == _RT_BOOLERR:
                (rw, col, _ixfe, val, f_err) = struct.unpack_from(
                    "<HHHBB", body, 0
                )
                if f_err:
                    cells.append(
                        (rw, col, _XLS_ERRORS.get(val, f"#ERR{val:02X}"))
                    )
                else:
                    cells.append((rw, col, "TRUE" if val else "FALSE"))
            elif rt == _RT_FORMULA:
                (rw, col, _ixfe) = struct.unpack_from("<HHH", body, 0)
                result = body[6:14]
                if result[6:8] == b"\xff\xff":
                    kind = result[0]
                    if kind == 0:  # string — value in the String record
                        pending_formula = (rw, col)
                    elif kind == 1:
                        cells.append(
                            (rw, col, "TRUE" if result[2] else "FALSE")
                        )
                    elif kind == 2:
                        cells.append((
                            rw, col,
                            _XLS_ERRORS.get(result[2], f"#ERR{result[2]:02X}"),
                        ))
                    # kind 3 = blank string: emit nothing
                else:
                    (num,) = struct.unpack("<d", result)
                    cells.append((rw, col, _num_text(num)))
            elif rt == _RT_STRING and pending_formula is not None:
                rw, col = pending_formula
                cells.append((rw, col, _unistr(body, 0)))
                pending_formula = None
            k += 1
        else:
            raise ValueError(f"xls: sheet {name!r} substream has no EOF")
        cells.sort(key=lambda c: (c[0], c[1]))
        out.append((name, [c[2] for c in cells]))
    return out


# ---------------------------------------------------------------------------
# .ppt — text atoms (MS-PPT)
# ---------------------------------------------------------------------------

_PPT_SLIDE = 0x03EE
_PPT_NOTES = 0x03F0
_PPT_MAINMASTER = 0x03F8
_PPT_TEXTCHARS = 0x0FA0
_PPT_TEXTBYTES = 0x0FA8

_GROUP_NAMES = {
    _PPT_SLIDE: "slide", _PPT_NOTES: "notes", _PPT_MAINMASTER: "master",
}


def ppt_parts_of(stream: bytes) -> list[tuple[str, str]]:
    """``PowerPoint Document`` stream → ``[(part_name, text)]``: one
    part per ``Slide``/``Notes``/``MainMaster`` container holding text
    atoms (stream order, named ``slide1``…), plus a ``document`` part
    for atoms outside any (the PPT97 ``SlideListWithText`` outline)."""
    try:
        parts: dict[str, list[str]] = {}
        order: list[str] = []
        counts = {"slide": 0, "notes": 0, "master": 0}
        state = {"atoms": 0}

        def walk(pos: int, end: int, depth: int, group: str) -> None:
            while pos + 8 <= end:
                (verinst, rt, ln) = struct.unpack_from("<HHI", stream, pos)
                body_end = pos + 8 + ln
                if body_end > end:
                    raise ValueError(
                        f"ppt: record 0x{rt:04x} length past its container"
                    )
                if verinst & 0x0F == 0x0F:  # container
                    if depth >= MAX_PPT_DEPTH:
                        raise ValueError("ppt: record tree too deep (bomb)")
                    g = group
                    if rt in _GROUP_NAMES:
                        counts[_GROUP_NAMES[rt]] += 1
                        g = f"{_GROUP_NAMES[rt]}{counts[_GROUP_NAMES[rt]]}"
                    walk(pos + 8, body_end, depth + 1, g)
                elif rt in (_PPT_TEXTCHARS, _PPT_TEXTBYTES):
                    state["atoms"] += 1
                    if state["atoms"] > MAX_PPT_ATOMS:
                        raise ValueError("ppt: text atom count over the cap")
                    raw = stream[pos + 8 : body_end]
                    text = (
                        raw.decode("utf-16-le", "replace")
                        if rt == _PPT_TEXTCHARS
                        else raw.decode("cp1252", "replace")
                    )
                    text = text.replace("\r", "\n").replace("\x0b", "\n")
                    if group not in parts:
                        parts[group] = []
                        order.append(group)
                    parts[group].append(text)
                pos = body_end
        walk(0, len(stream), 0, "document")
        return [(g, "\n".join(parts[g])) for g in order]
    except struct.error as exc:
        raise ValueError(f"ppt: truncated record: {exc}")


# ---------------------------------------------------------------------------
# dispatch — CFB entries → synthetic escaped parts
# ---------------------------------------------------------------------------


def legacy_parts(entries: list[dict]) -> tuple[str, list[tuple[str, str]]]:
    """Classified CFB streams → ``(doc_format, [(part_name, xml)])``
    with the extracted text XML-escaped into synthetic parts, so the
    downstream Catalyst tag-strip/entity chain is the single decode
    point (the XLSX convention in :mod:`.office`)."""
    streams = {e["name"]: e["payload"] for e in entries if e["type"] == 2}
    if "WordDocument" in streams:
        word = streams["WordDocument"]
        if len(word) < 12:
            raise ValueError("doc: WordDocument stream shorter than FibBase")
        (w_ident,) = struct.unpack_from("<H", word, 0)
        if w_ident != 0xA5EC:
            raise ValueError(f"doc: FIB wIdent 0x{w_ident:04x}")
        (flags,) = struct.unpack_from("<H", word, 10)
        table_name = "1Table" if flags & 0x0200 else "0Table"
        table = streams.get(table_name)
        if table is None:
            raise ValueError(f"doc: FIB names missing stream {table_name!r}")
        main, subdocs = doc_texts_of(word, table)
        parts = [("WordDocument", "<w:t>" + _xml_escape(main) + "</w:t>")]
        if subdocs.strip():
            parts.append(
                ("subdocuments", "<w:t>" + _xml_escape(subdocs) + "</w:t>")
            )
        return "doc", parts
    wb = streams.get("Workbook", streams.get("Book"))
    if wb is not None:
        parts = []
        for name, cells in xls_sheets_of(wb):
            xml = (
                "<x:sheet>"
                + "".join(f"<x:c>{_xml_escape(c)}</x:c>" for c in cells)
                + "</x:sheet>"
            )
            parts.append((f"workbook/{name}", xml))
        return "xls", parts
    if "PowerPoint Document" in streams:
        parts = [
            (name, "<a:t>" + _xml_escape(text) + "</a:t>")
            for name, text in ppt_parts_of(streams["PowerPoint Document"])
        ]
        if not parts:
            raise ValueError("ppt: document carries no text atoms")
        return "ppt", parts
    raise ValueError(
        "cfb: container has no WordDocument/Workbook/PowerPoint "
        "Document stream"
    )


# ---------------------------------------------------------------------------
# Fixture writers
# ---------------------------------------------------------------------------


def build_doc_streams(
    paragraphs: list[str],
    *,
    which_table: int = 1,
    footnotes: list[str] | None = None,
) -> list[tuple[str, bytes]]:
    """Hand-packed ``WordDocument`` + table streams: one piece per
    paragraph (each ending in the CR paragraph mark), alternating
    cp1252-compressed and UTF-16 pieces (cp1252 only when encodable),
    FIB nFib 0x00C1 with 93 fc/lcb pairs, Clx at table offset 0.
    ``footnotes`` append subdocument pieces past ``ccpText``."""
    if which_table not in (0, 1):
        raise ValueError("doc fixture: which_table must be 0 or 1")
    n_pairs = 93  # cbRgFcLcb for nFib 0x00C1 (Word 97)
    fib_len = 34 + 28 + 2 + 88 + 2 + 8 * n_pairs
    body = bytearray()
    cps = [0]
    pcds = []
    main_cp = None
    all_paras = list(paragraphs) + list(footnotes or [])
    for i, para in enumerate(all_paras):
        if i == len(paragraphs):
            main_cp = cps[-1]
        text = para + "\r"
        compressed = i % 2 == 0
        if compressed:
            try:
                raw = text.encode("cp1252")
            except UnicodeEncodeError:
                compressed = False
        off = fib_len + len(body)
        if compressed:
            fc_raw = (off * 2) | 0x40000000
        else:
            raw = text.encode("utf-16-le")
            fc_raw = off
        body += raw
        cps.append(cps[-1] + len(text))
        pcds.append(struct.pack("<HIH", 0, fc_raw, 0))
    plcpcd = b"".join(struct.pack("<I", c) for c in cps) + b"".join(pcds)
    clx = b"\x02" + struct.pack("<I", len(plcpcd)) + plcpcd

    fib = bytearray(fib_len)
    struct.pack_into("<HH", fib, 0, 0xA5EC, 0x00C1)
    struct.pack_into("<H", fib, 10, 0x0200 if which_table else 0)
    struct.pack_into("<H", fib, 32, 14)          # csw
    struct.pack_into("<H", fib, 62, 22)          # cslw
    struct.pack_into("<I", fib, 64, fib_len + len(body))  # cbMac
    struct.pack_into(
        "<I", fib, 76, main_cp if main_cp is not None else cps[-1]
    )  # ccpText: footnote pieces sit past it
    struct.pack_into("<H", fib, 152, n_pairs)
    struct.pack_into("<II", fib, 154 + 8 * _FCLCB_CLX, 0, len(clx))
    table_name = "1Table" if which_table else "0Table"
    return [("WordDocument", bytes(fib) + bytes(body)), (table_name, clx)]


def _xls_rec(rt: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rt, len(payload)) + payload


def _xls_sst(strings: list[str], split_second: bool) -> bytes:
    """SST record bytes (+ a Continue record when ``split_second``:
    the second string's characters split mid-run with an encoding
    flip to UTF-16 — the hard continuation case)."""
    head = struct.pack("<II", len(strings), len(strings))
    if not split_second or len(strings) < 2 or len(strings[1]) < 4:
        blob = bytearray(head)
        for s in strings:
            raw = s.encode("cp1252", "replace")
            blob += struct.pack("<HB", len(s), 0) + raw
        return _xls_rec(_RT_SST, bytes(blob))
    first = bytearray(head)
    raw0 = strings[0].encode("cp1252", "replace")
    first += struct.pack("<HB", len(strings[0]), 0) + raw0
    s1 = strings[1]
    k = len(s1) // 2
    first += struct.pack("<HB", len(s1), 0)
    first += s1[:k].encode("cp1252", "replace")
    cont = bytearray(b"\x01")  # grbit: continuation switches to UTF-16
    cont += s1[k:].encode("utf-16-le")
    for s in strings[2:]:
        raw = s.encode("cp1252", "replace")
        cont += struct.pack("<HB", len(s), 0) + raw
    return _xls_rec(_RT_SST, bytes(first)) + _xls_rec(
        _RT_CONTINUE, bytes(cont)
    )


def build_xls_stream(
    sheets: list[tuple[str, list[list[str]]]], *, split_sst: bool = False
) -> bytes:
    """Hand-packed BIFF8 ``Workbook`` stream: globals (BOF,
    BoundSheet8 per sheet, SST, EOF) then one substream per sheet.
    Integer-looking cells are written as RK (30-bit) or NUMBER
    records; strings go through the SST as LabelSst."""
    shared: list[str] = []
    shared_idx: dict[str, int] = {}
    cell_recs: list[bytes] = []
    sheet_bodies: list[bytes] = []
    for _name, rows in sheets:
        recs = bytearray()
        for r, row in enumerate(rows):
            for c, val in enumerate(row):
                val = str(val)
                try:
                    n = int(val)
                    if -(1 << 29) <= n < (1 << 29):
                        recs += _xls_rec(
                            _RT_RK,
                            struct.pack("<HHHI", r, c, 0,
                                        (n << 2 | 0x02) & 0xFFFFFFFF),
                        )
                    else:
                        recs += _xls_rec(
                            _RT_NUMBER,
                            struct.pack("<HHHd", r, c, 0, float(n)),
                        )
                    continue
                except ValueError:
                    pass
                if val not in shared_idx:
                    shared_idx[val] = len(shared)
                    shared.append(val)
                recs += _xls_rec(
                    _RT_LABELSST,
                    struct.pack("<HHHI", r, c, 0, shared_idx[val]),
                )
        sheet_bodies.append(
            _xls_rec(_RT_BOF, struct.pack("<HH8x", 0x0600, 0x0010))
            + bytes(recs)
            + _xls_rec(_RT_EOF, b"")
        )
    cell_recs.extend(sheet_bodies)

    def boundsheet(pos: int, name: str) -> bytes:
        raw = name.encode("cp1252", "replace")
        return _xls_rec(
            _RT_BOUNDSHEET,
            struct.pack("<IHBB", pos, 0, len(raw), 0) + raw,
        )

    sst_blob = _xls_sst(shared, split_sst)
    # two-pass: globals length depends only on fixed-size parts
    globals_len = (
        len(_xls_rec(_RT_BOF, struct.pack("<HH8x", 0x0600, 0x0005)))
        + sum(len(boundsheet(0, n)) for n, _ in sheets)
        + len(sst_blob)
        + len(_xls_rec(_RT_EOF, b""))
    )
    positions = []
    pos = globals_len
    for body in sheet_bodies:
        positions.append(pos)
        pos += len(body)
    out = _xls_rec(_RT_BOF, struct.pack("<HH8x", 0x0600, 0x0005))
    for (name, _rows), p in zip(sheets, positions):
        out += boundsheet(p, name)
    out += sst_blob + _xls_rec(_RT_EOF, b"")
    return out + b"".join(sheet_bodies)


def build_ppt_stream(slides: list[str]) -> bytes:
    """Hand-packed ``PowerPoint Document`` stream: one ``Slide``
    container per entry, alternating ``TextCharsAtom`` (UTF-16LE) and
    ``TextBytesAtom`` (cp1252, only when encodable)."""
    out = bytearray()
    for i, text in enumerate(slides):
        use_bytes = i % 2 == 1
        if use_bytes:
            try:
                raw = text.encode("cp1252")
                atom = struct.pack("<HHI", 0x0000, _PPT_TEXTBYTES, len(raw))
                atom += raw
            except UnicodeEncodeError:
                use_bytes = False
        if not use_bytes:
            raw = text.encode("utf-16-le")
            atom = struct.pack("<HHI", 0x0000, _PPT_TEXTCHARS, len(raw))
            atom += raw
        out += struct.pack("<HHI", 0x000F, _PPT_SLIDE, len(atom)) + atom
    return bytes(out)


def build_doc(
    paragraphs: list[str],
    *,
    title: str = "",
    author: str = "",
    which_table: int = 1,
) -> bytes:
    """A complete legacy ``.doc``: CFB container holding the
    hand-packed WordDocument + table streams and a
    SummaryInformation property set."""
    from .cfb import build_cfb

    return build_cfb(
        build_doc_streams(paragraphs, which_table=which_table),
        title=title, author=author,
    )


def build_xls(
    sheets: list[tuple[str, list[list[str]]]],
    *,
    title: str = "",
    author: str = "",
    split_sst: bool = False,
) -> bytes:
    """A complete legacy ``.xls``: CFB container holding the BIFF8
    Workbook stream."""
    from .cfb import build_cfb

    return build_cfb(
        [("Workbook", build_xls_stream(sheets, split_sst=split_sst))],
        title=title, author=author,
    )


def build_ppt(
    slides: list[str], *, title: str = "", author: str = ""
) -> bytes:
    """A complete legacy ``.ppt``: CFB container holding the
    PowerPoint Document stream."""
    from .cfb import build_cfb

    return build_cfb(
        [("PowerPoint Document", build_ppt_stream(slides))],
        title=title, author=author,
    )
