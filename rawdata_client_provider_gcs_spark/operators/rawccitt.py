"""Pure-Python CCITT fax codecs (ITU-T T.4 / T.6) for bilevel TIFF.

Scanned-document crawls are dominated by Group 3/Group 4 fax TIFFs —
the last recognized-but-undecodable compression family in the repo's
library-free TIFF tier (``rawtiff``).  Everything here is bit-level
stdlib + numpy:

- **Modified Huffman (MH) 1D** run-length coding: the shared T.4 code
  tables (white/black terminating runs 0–63, makeup runs 64–1728, the
  extended makeup 1792–2560 common to both colors).  Used directly by
  TIFF compression 2 ("CCITT RLE": MH with every row byte-aligned, no
  EOLs) and by T.4 1D (compression 3 without the 2D option: MH rows
  framed by EOL codes).
- **T.6 (Group 4) 2D** coding for TIFF compression 4: every row coded
  against the reference row above (vertical V0/VR1-3/VL1-3, pass, and
  horizontal modes; the imaginary all-white reference above row 0),
  terminated by EOFB.

Correctness bar: the JDK bundles an independent CCITT implementation
(``com.sun.imageio.plugins.tiff``); ``tests/test_ccitt.py`` cross-pins
this module against it BOTH directions over run lengths covering every
terminating and makeup table entry, plus structured/noise 2D shapes —
so each of the ~200 code-table entries is exercised against a second
implementation, not just round-tripped against itself.

Reference behavioral parity: the reference transport treats payloads
as opaque bytes (RawdataMessage.java:15-60); fax decode belongs to
this repo's derived multimodal tier, like every codec here.
"""

from __future__ import annotations

import bisect

import numpy as np

# ------------------------------------------------------------ MH tables
# ITU-T T.4 §2.2: terminating codes (runs 0..63) and makeup codes
# (64..1728) per color, extended makeup (1792..2560) shared.

_WHITE_TERM = [
    "00110101", "000111", "0111", "1000", "1011", "1100", "1110", "1111",
    "10011", "10100", "00111", "01000", "001000", "000011", "110100",
    "110101", "101010", "101011", "0100111", "0001100", "0001000",
    "0010111", "0000011", "0000100", "0101000", "0101011", "0010011",
    "0100100", "0011000", "00000010", "00000011", "00011010", "00011011",
    "00010010", "00010011", "00010100", "00010101", "00010110", "00010111",
    "00101000", "00101001", "00101010", "00101011", "00101100", "00101101",
    "00000100", "00000101", "00001010", "00001011", "01010010", "01010011",
    "01010100", "01010101", "00100100", "00100101", "01011000", "01011001",
    "01011010", "01011011", "01001010", "01001011", "00110010", "00110011",
    "00110100",
]

_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010",
    1664: "011000", 1728: "010011011",
}

_BLACK_TERM = [
    "0000110111", "010", "11", "10", "011", "0011", "0010", "00011",
    "000101", "000100", "0000100", "0000101", "0000111", "00000100",
    "00000111", "000011000", "0000010111", "0000011000", "0000001000",
    "00001100111", "00001101000", "00001101100", "00000110111",
    "00000101000", "00000010111", "00000011000", "000011001010",
    "000011001011", "000011001100", "000011001101", "000001101000",
    "000001101001", "000001101010", "000001101011", "000011010010",
    "000011010011", "000011010100", "000011010101", "000011010110",
    "000011010111", "000001101100", "000001101101", "000011011010",
    "000011011011", "000001010100", "000001010101", "000001010110",
    "000001010111", "000001100100", "000001100101", "000001010010",
    "000001010011", "000000100100", "000000110111", "000000111000",
    "000000100111", "000000101000", "000001011000", "000001011001",
    "000000101011", "000000101100", "000001011010", "000001100110",
    "000001100111",
]

_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

_EOL = "000000000001"  # T.4 end-of-line


def _enc_table(color: int) -> tuple[list[str], dict[int, str]]:
    term = _WHITE_TERM if color == 0 else _BLACK_TERM
    makeup = dict(_WHITE_MAKEUP if color == 0 else _BLACK_MAKEUP)
    makeup.update(_EXT_MAKEUP)
    return term, makeup


#: precomputed per-color encode tables (mirror of _DEC below) — the
#: encoder hot loops must not rebuild the makeup dict per run
_ENC = {0: _enc_table(0), 1: _enc_table(1)}


def _dec_table(color: int) -> dict[str, tuple[str, int]]:
    """{code: ("term"|"makeup", run)} for one color."""
    term, makeup = _enc_table(color)
    out: dict[str, tuple[str, int]] = {}
    for run, code in enumerate(term):
        out[code] = ("term", run)
    for run, code in makeup.items():
        out[code] = ("makeup", run)
    return out


_DEC = {0: _dec_table(0), 1: _dec_table(1)}
_MAX_CODE_LEN = 14  # longest MH code is 13 bits; +1 slack for the scan


# ------------------------------------------------------------- bit I/O


class _BitWriter:
    __slots__ = ("bits", "nbits")

    def __init__(self) -> None:
        self.bits: list[str] = []
        self.nbits = 0  # running count: align() per row must be O(1),
        # not a rescan of everything written (quadratic in page height)

    def write(self, code: str) -> None:
        self.bits.append(code)
        self.nbits += len(code)

    def align(self) -> None:
        if self.nbits % 8:
            pad = "0" * (8 - self.nbits % 8)
            self.bits.append(pad)
            self.nbits += len(pad)

    def to_bytes(self) -> bytes:
        s = "".join(self.bits)
        if len(s) % 8:
            s += "0" * (8 - len(s) % 8)
        return int(s, 2).to_bytes(len(s) // 8, "big") if s else b""


class _BitReader:
    __slots__ = ("s", "pos")

    def __init__(self, data: bytes) -> None:
        # one bool-string upfront: the MH scan matches prefix codes by
        # slicing, which beats per-bit integer shifting in Python
        self.s = bin(int.from_bytes(b"\x01" + data, "big"))[3:]
        self.pos = 0

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def eof(self) -> bool:
        return self.pos >= len(self.s)

    def peek(self, n: int) -> str:
        return self.s[self.pos : self.pos + n]

    def skip(self, n: int) -> None:
        self.pos += n


def _read_run(r: _BitReader, color: int) -> int:
    """One complete MH run (zero or more makeups + one terminating)."""
    table = _DEC[color]
    total = 0
    while True:
        window = r.peek(_MAX_CODE_LEN)
        for ln in range(2, min(_MAX_CODE_LEN, len(window)) + 1):
            hit = table.get(window[:ln])
            if hit is not None:
                kind, run = hit
                r.skip(ln)
                total += run
                if kind == "term":
                    return total
                break  # makeup: keep reading (term of same color follows)
        else:
            raise ValueError("corrupt CCITT stream: no MH code matches")


def _write_run(w: _BitWriter, run: int, color: int) -> None:
    term, makeup = _ENC[color]
    while run >= 64:
        # largest makeup <= run (makeups step by 64 up to 2560)
        step = min(run - run % 64, 2560)
        w.write(makeup[step])
        run -= step
    w.write(term[run])


def _row_runs(row: np.ndarray) -> list[int]:
    """Alternating run lengths starting with white (possibly 0)."""
    n = len(row)
    if n == 0:
        return [0]
    change = np.flatnonzero(np.diff(row)) + 1
    bounds = np.concatenate(([0], change, [n]))
    runs = np.diff(bounds).tolist()
    if row[0] == 1:  # rows must start with a white run
        runs.insert(0, 0)
    return runs


# ----------------------------------------------------------- MH 1D (RLE)


def encode_mh(bits: np.ndarray, eol: bool = False) -> bytes:
    """TIFF compression 2 layout (``eol=False``): MH rows, each
    byte-aligned.  ``eol=True`` is the T.4 1D layout (compression 3,
    default options): EOL before every row, six trailing EOLs (RTC)."""
    w = _BitWriter()
    for row in np.asarray(bits, np.uint8):
        if eol:
            w.write(_EOL)
        color = 0
        for run in _row_runs(row):
            _write_run(w, run, color)
            color ^= 1
        if not eol:
            w.align()
    if eol:
        for _ in range(6):
            w.write(_EOL)
    return w.to_bytes()


def decode_mh(
    data: bytes, width: int, height: int, eol: bool = False
) -> np.ndarray:
    """Inverse of :func:`encode_mh` → (H, W) uint8 {0=white, 1=black}.

    The ``eol=True`` layout IS T.4 1D, so it delegates to
    :func:`decode_g3` — one EOL-resync implementation, not two copies
    that could drift (review r8)."""
    if eol:
        return decode_g3(data, width, height, two_d=False)
    r = _BitReader(data)
    out = np.zeros((height, width), np.uint8)
    for y in range(height):
        x = 0
        color = 0
        while x < width:
            run = _read_run(r, color)
            if x + run > width:
                raise ValueError("CCITT run overruns the row")
            if color:
                out[y, x : x + run] = 1
            x += run
            color ^= 1
        r.align()  # compression-2 rows are byte-aligned
    return out


# ------------------------------------------------------------- T.6 (G4)

_V_CODES = {0: "1", 1: "011", -1: "010", 2: "000011", -2: "000010",
            3: "0000011", -3: "0000010"}
_H_CODE = "001"
_P_CODE = "0001"
_EOFB = _EOL + _EOL


def _changes(row: np.ndarray) -> np.ndarray:
    """Positions where the color changes (first pixel counts if black)."""
    d = np.flatnonzero(np.diff(row)) + 1
    if len(row) and row[0] == 1:
        d = np.concatenate(([0], d))
    return d


def _b1_b2(refc: list[int], a0: int, color: int, width: int) -> tuple[int, int]:
    """T.6 reference-line elements: ``b1`` is the first change on the
    reference line right of ``a0`` whose new color is opposite ``a0``'s
    color (changes alternate white→black at even indices), ``b2`` the
    change after it."""
    k = bisect.bisect_right(refc, a0)
    if k < len(refc) and k % 2 != color % 2:
        k += 1  # parities alternate: the matching change is at most next
    b1 = refc[k] if k < len(refc) else width
    b2 = refc[k + 1] if k + 1 < len(refc) else width
    return b1, b2


def encode_g4(bits: np.ndarray) -> bytes:
    """T.6 (Group 4) encode → TIFF compression 4 payload (ends EOFB)."""
    bits = np.asarray(bits, np.uint8)
    h, width = bits.shape
    w = _BitWriter()
    refc: list[int] = []  # change positions of the all-white row above
    for y in range(h):
        row = bits[y]
        cur = _changes(row).tolist()
        a0 = -1
        color = 0
        while a0 < width:
            i1 = bisect.bisect_right(cur, a0)
            a1 = cur[i1] if i1 < len(cur) else width
            b1, b2 = _b1_b2(refc, a0, color, width)
            if b2 < a1:  # pass mode
                w.write(_P_CODE)
                a0 = b2
                continue
            if abs(a1 - b1) <= 3:  # vertical mode
                w.write(_V_CODES[a1 - b1])
                a0 = a1
                color ^= 1
                continue
            # horizontal mode: two complete runs from a0
            a2 = cur[i1 + 1] if i1 + 1 < len(cur) else width
            start = max(a0, 0)
            w.write(_H_CODE)
            _write_run(w, a1 - start, color)
            _write_run(w, a2 - a1, color ^ 1)
            a0 = a2
        refc = cur
    w.write(_EOFB)
    return w.to_bytes()


def _decode_2d_row(r: _BitReader, refc: list[int], width: int) -> list[int]:
    """Decode ONE 2D-coded row → its change positions (shared by T.6
    and the 2D rows of T.4)."""
    cur: list[int] = []
    a0 = -1
    color = 0
    while a0 < width:
        b1, b2 = _b1_b2(refc, a0, color, width)
        if r.peek(4) == _P_CODE:  # pass
            r.skip(4)
            a0 = b2
            continue
        if r.peek(3) == _H_CODE:  # horizontal
            r.skip(3)
            start = max(a0, 0)
            r1 = _read_run(r, color)
            r2 = _read_run(r, color ^ 1)
            a1 = start + r1
            a2 = a1 + r2
            if a2 > width or a2 <= a0:
                raise ValueError("G4 horizontal runs overrun the row")
            if a1 < width:
                cur.append(a1)
            if a2 < width:
                cur.append(a2)
            a0 = a2
            continue
        # vertical modes
        for delta, code in _V_CODES.items():
            if r.peek(len(code)) == code:
                r.skip(len(code))
                a1 = b1 + delta
                if a1 <= a0 or a1 > width:
                    # a hostile stream walking a1 backwards would loop
                    # forever; valid T.6 always advances
                    raise ValueError("G4 vertical move outside the row")
                if a1 < width:
                    cur.append(a1)
                a0 = a1
                color ^= 1
                break
        else:
            raise ValueError("corrupt or truncated G4 stream")
    return cur


def _paint(cur: list[int], width: int) -> np.ndarray:
    """Change positions → (W,) uint8 row (1=black)."""
    row = np.zeros(width, np.uint8)
    for k in range(0, len(cur), 2):
        s = cur[k]
        e = cur[k + 1] if k + 1 < len(cur) else width
        row[s:e] = 1
    return row


def decode_g4(data: bytes, width: int, height: int) -> np.ndarray:
    """T.6 decode → (H, W) uint8 {0=white, 1=black}."""
    r = _BitReader(data)
    out = np.zeros((height, width), np.uint8)
    refc: list[int] = []  # change positions of the reference row
    for y in range(height):
        cur = _decode_2d_row(r, refc, width)
        out[y] = _paint(cur, width)
        refc = cur
    return out


def decode_g3(
    data: bytes, width: int, height: int, two_d: bool = False
) -> np.ndarray:
    """T.4 (Group 3) decode: EOL-framed rows; with ``two_d`` (T4Options
    bit 0) each EOL carries a tag bit — 1 selects a 1D (MH) row, 0 a 2D
    row coded like T.6 against the row above."""
    r = _BitReader(data)
    out = np.zeros((height, width), np.uint8)
    refc: list[int] = []
    for y in range(height):
        # resynchronize on EOL (fill zeros before it are legal)
        while True:
            if r.eof():
                raise ValueError("truncated T.4 stream: missing EOL")
            if r.peek(12) == _EOL:
                r.skip(12)
                break
            if r.peek(1) != "0":
                raise ValueError("corrupt T.4 stream: expected EOL fill")
            r.skip(1)
        one_d = True
        if two_d:
            tag = r.peek(1)
            if not tag:
                raise ValueError("truncated T.4 stream: missing mode bit")
            r.skip(1)
            one_d = tag == "1"
        if one_d:
            x = 0
            color = 0
            cur = []
            while x < width:
                run = _read_run(r, color)
                if x + run > width:
                    raise ValueError("CCITT run overruns the row")
                x += run
                if x < width:
                    cur.append(x)
                color ^= 1
        else:
            cur = _decode_2d_row(r, refc, width)
        out[y] = _paint(cur, width)
        refc = cur
    return out
