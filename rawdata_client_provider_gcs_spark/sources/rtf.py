"""RTF text + metadata extraction (public spec: Microsoft Rich Text
Format, word-processing interchange since Word 1.x).

RTF is a plain-text token stream — ``{`` ``}`` groups, ``\\control``
words with optional signed numeric parameters, ``\\'hh`` code-page
escapes, ``\\uN`` Unicode escapes with ``\\ucN`` fallback skipping —
so extraction is tokenization plus a destination skip-list, never
decompression or synthesis.  The walker is a single linear pass with
an explicit group stack (no recursion, no regex backtracking — the
html.py hostile-input lesson).

Subset contract:

- Non-text destinations are skipped (font/color/style tables, info,
  pict/object payloads, list tables, and every unknown ``{\\*…}``
  starred group); field results (``\\fldrslt``) are kept, field
  instructions (``\\fldinst``) are not.
- ``\\par``/``\\line``/``\\row``/``\\sect``/``\\page`` → newline,
  ``\\tab``/``\\cell`` → tab, the punctuation words (em/en dash,
  smart quotes, bullet, ``\\~`` ``\\_``) → their characters.
- ``\\'hh`` decodes via the declared ``\\ansicpgN`` (default 1252);
  ``\\uN`` emits the BMP char (negative N + 65536) and skips the
  following ``\\ucN`` fallback chars (default 1).

Metadata: the ``{\\info …}`` destination's ``{\\title …}`` /
``{\\author …}`` groups, mirroring the Dublin-Core tier of the other
office formats (absence is data).

All malformed-input paths raise ``ValueError`` (per-row capture);
group depth and output length are capped so hostile input cannot
recurse or balloon.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); document
decoding is this repo's derived crawl tier.
"""

from __future__ import annotations

import re

#: bomb guards
MAX_GROUP_DEPTH = 256
MAX_TEXT_CHARS = 64 * 1024 * 1024

#: batch scanners (no backtracking: single character classes and a
#: two-branch alternation whose branches cannot match the same start
#: byte) — plain-text spans advance at C speed instead of per-byte
#: Python stepping, and a whole text+\'hh-escape alternation decodes
#: through ONE regex scan + split + decode instead of one _control
#: round per escape (the escape-dense shape real cp1252/DBCS RTF has)
_TEXT_RUN = re.compile(rb"[^{}\\\r\n\x00]+")
_MIXED_RUN = re.compile(rb"(?:\\'[0-9a-fA-F]{2}|[^{}\\\r\n\x00]+)+")


def _decode_mixed(span: bytes, codepage: str) -> str:
    """Decode a ``_MIXED_RUN`` span: every ``\\'`` in it is an escape
    delimiter (the text class excludes backslash), so splitting on it
    and folding each part's leading hex pair rebuilds the raw byte
    string — ONE codepage decode for the whole span, which also
    handles DBCS codepages pair-wise instead of byte-at-a-time."""
    parts = span.split(b"\\'")
    buf = bytearray(parts[0])
    for p in parts[1:]:
        buf.append(int(p[:2], 16))
        buf += p[2:]
    return buf.decode(codepage, "replace")

#: destinations whose content is never display text
_SKIP_DESTINATIONS = frozenset({
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "fldinst", "generator", "themedata", "colorschememapping",
    "listtable", "listoverridetable", "latentstyles", "datastore",
    "defchp", "defpap", "xmlnstbl", "wgrffmtfilter", "filetbl",
    "revtbl", "rsidtbl", "mmathPr", "ftnsep", "ftnsepc", "aftnsep",
    "aftnsepc", "background", "docvar", "atnid", "xe", "tc",
    "pntext", "pntxta", "pntxtb",
})

#: control words emitting a fixed character
_CHAR_WORDS = {
    "par": "\n", "line": "\n", "row": "\n", "sect": "\n", "page": "\n",
    "tab": "\t", "cell": "\t", "nestcell": "\t", "nestrow": "\n",
    "emdash": "\u2014", "endash": "\u2013", "emspace": "\u2003",
    "enspace": "\u2002", "qmspace": "\u2005", "bullet": "\u2022",
    "lquote": "\u2018", "rquote": "\u2019",
    "ldblquote": "\u201c", "rdblquote": "\u201d",
    "~": "\u00a0", "_": "\u2011", "-": "", "|": "", ":": "",
    "zwj": "\u200d", "zwnj": "\u200c", "ltrmark": "", "rtlmark": "",
}


def sniff_rtf(data: bytes) -> bool:
    return data[:5] == b"{\\rtf"


class _Walker:
    """Single-pass RTF tokenizer.  Group state tracked explicitly:
    (skipping, uc_skip_count) per stack level."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data)
        self.codepage = "cp1252"
        self.out: list[str] = []
        self.info: dict[str, str] = {}
        # per-group state: [skipping, uc, info_field or None]
        self.stack: list[list] = [[False, 1, None]]
        self.pending_uc_skip = 0
        self.in_info = 0  # depth inside {\info …}
        self.out_len = 0
        self._pending_high: int | None = None

    def _emit(self, text: str) -> None:
        top = self.stack[-1]
        if top[0]:  # skipping destination
            if self.in_info and top[2]:
                self.info[top[2]] = self.info.get(top[2], "") + text
            return
        self.out.append(text)
        self.out_len += len(text)
        if self.out_len > MAX_TEXT_CHARS:
            raise ValueError("rtf: output text over the cap (bomb)")

    def _skip_entity(self) -> bool:
        """True when a \\uc fallback skip is pending: the next entity
        (character, \\'hh escape, or control word/symbol — RTF counts
        each as ONE skippable item) is consumed without emitting."""
        if self.pending_uc_skip > 0:
            self.pending_uc_skip -= 1
            return True
        return False

    def _control(self) -> None:
        """pos sits after the backslash."""
        data, n = self.data, self.n
        if self.pos >= n:
            raise ValueError("rtf: dangling backslash at end of input")
        ch = data[self.pos : self.pos + 1]
        # symbol escapes
        if ch in (b"\\", b"{", b"}"):
            self.pos += 1
            if not self._skip_entity():
                self._emit(ch.decode("ascii"))
            return
        if ch in (b"\r", b"\n"):  # \<newline> is \par
            self.pos += 1
            if not self._skip_entity():
                self._emit("\n")
            return
        if ch == b"'":
            # batch a RUN of consecutive \'hh escapes through one
            # regex scan + one fromhex + one decode (escape-dense
            # documents spend most of their bytes here); runs also
            # decode DBCS codepages correctly, pair-wise.  The slow
            # path remains for a pending \uc skip (each escape is one
            # skippable entity) and for malformed escapes.
            if self.pending_uc_skip == 0:
                m = _MIXED_RUN.match(data, self.pos - 1)
                if m:
                    self.pos = m.end()
                    self._emit(_decode_mixed(m.group(), self.codepage))
                    return
            hx = data[self.pos + 1 : self.pos + 3]
            if len(hx) < 2:
                raise ValueError("rtf: truncated \\'hh escape")
            try:
                byte = bytes([int(hx, 16)])
            except ValueError:
                raise ValueError(f"rtf: bad hex escape \\'{hx!r}")
            self.pos += 3
            if not self._skip_entity():
                self._emit(byte.decode(self.codepage, "replace"))
            return
        if not ch.isalpha():
            # unknown control symbol (\~ \_ \- \| \: handled via table)
            self.pos += 1
            if not self._skip_entity():
                sym = ch.decode("latin-1")
                self._emit(_CHAR_WORDS.get(sym, ""))
            return
        # control word: letters, optional signed number, optional space
        start = self.pos
        while self.pos < n and data[self.pos : self.pos + 1].isalpha():
            self.pos += 1
        word = data[start : self.pos].decode("ascii")
        num = None
        num_start = self.pos
        if self.pos < n and data[self.pos : self.pos + 1] == b"-":
            self.pos += 1
        while self.pos < n and data[self.pos : self.pos + 1].isdigit():
            self.pos += 1
        if self.pos > num_start:
            num = int(data[num_start : self.pos])
        if self.pos < n and data[self.pos : self.pos + 1] == b" ":
            self.pos += 1  # the delimiter space is part of the control
        if self.pending_uc_skip > 0 and word != "u":
            # a control word counts as one skipped fallback entity
            # (RTF spec: control words are single items for \\uc
            # skipping) — except a new \\u, which starts a new char.
            # State-bearing words STILL take effect (\\uc changes the
            # count, \\pict opens a skip destination, \\bin consumes
            # its payload); only their character emission is skipped.
            self.pending_uc_skip -= 1
            self._word(word, num, suppress=True)
            return
        if word == "u":
            self.pending_uc_skip = 0  # a new \\u ends any fallback run
        self._word(word, num)

    def _word(self, word: str, num: int | None,
              suppress: bool = False) -> None:
        top = self.stack[-1]
        if word == "bin":
            # raw binary follows the control — skip it wholesale so
            # embedded { } \ bytes cannot derail the group walk
            k = max(0, num or 0)
            if self.pos + k > self.n:
                raise ValueError("rtf: \\bin length past end of input")
            self.pos += k
            return
        if word == "u":
            if num is None:
                raise ValueError("rtf: \\u without a code point")
            cp = num + 65536 if num < 0 else num
            # astral chars arrive as surrogate \u pairs \u2014 combine them;
            # a lone surrogate must not reach Arrow/parquet strings
            if 0xD800 <= cp < 0xDC00:
                self._pending_high = cp
            elif 0xDC00 <= cp < 0xE000:
                high = self._pending_high
                self._pending_high = None
                if high is not None:
                    self._emit(chr(0x10000 + ((high - 0xD800) << 10)
                                   + (cp - 0xDC00)))
                else:
                    self._emit("\ufffd")
            else:
                if self._pending_high is not None:
                    self._emit("\ufffd")
                    self._pending_high = None
                self._emit(chr(cp) if 0 < cp < 0x110000 else "\ufffd")
            self.pending_uc_skip = top[1]
            return
        if word == "uc":
            top[1] = num if num is not None else 1
            return
        if word == "ansicpg" and num is not None:
            try:
                b"\x41".decode(f"cp{num}")
                self.codepage = f"cp{num}"
            except LookupError:
                pass  # unknown code page: keep the default
            return
        if word in _CHAR_WORDS:
            if not suppress:
                self._emit(_CHAR_WORDS[word])
            return
        if word == "info":
            self.in_info = len(self.stack)
            top[0] = True  # info content is not display text
            return
        if self.in_info and word in ("title", "author", "subject",
                                     "operator", "company"):
            top[0] = True
            top[2] = word
            self.info.setdefault(word, "")
            return
        if word in _SKIP_DESTINATIONS:
            top[0] = True
            return
        # all other formatting words: ignored

    def walk(self) -> None:
        data, n = self.data, self.n
        while self.pos < n:
            b = data[self.pos]
            if b == 0x7B:  # {
                if len(self.stack) > MAX_GROUP_DEPTH:
                    raise ValueError("rtf: group nesting over the cap")
                top = self.stack[-1]
                self.stack.append([top[0], top[1], top[2]])
                self.pending_uc_skip = 0  # skips never span groups
                self.pos += 1
                # {\* …}: skip unless a known keeper follows
                if data[self.pos : self.pos + 2] == b"\\*":
                    self.pos += 2
                    self.stack[-1][0] = True
            elif b == 0x7D:  # }
                if len(self.stack) == 1:
                    raise ValueError("rtf: unbalanced closing brace")
                self.pending_uc_skip = 0  # skips never span groups
                popped = self.stack.pop()
                if self.in_info and len(self.stack) < self.in_info:
                    self.in_info = 0
                del popped
                self.pos += 1
            elif b == 0x5C:  # backslash
                self.pos += 1
                self._control()
            elif b in (0x0D, 0x0A, 0x00):
                self.pos += 1  # raw CR/LF/NUL are not document text
            elif self.pending_uc_skip == 0:
                # batch the whole text+escape alternation in one scan
                m = _MIXED_RUN.match(data, self.pos)
                self.pos = m.end()
                self._emit(_decode_mixed(m.group(), self.codepage))
            else:
                end = _TEXT_RUN.match(data, self.pos).end()
                text = data[self.pos : end].decode(self.codepage, "replace")
                k = min(self.pending_uc_skip, len(text))
                self.pending_uc_skip -= k
                text = text[k:]
                if text:
                    self._emit(text)
                self.pos = end


def rtf_extract(data: bytes) -> tuple[str, dict[str, str]]:
    """RTF bytes → ``(text, info)`` where ``info`` carries the
    ``{\\info}`` destination's title/author/subject fields."""
    if not sniff_rtf(data):
        raise ValueError("rtf: payload does not start with {\\rtf")
    w = _Walker(data)
    w.walk()
    if len(w.stack) != 1:
        raise ValueError(f"rtf: {len(w.stack) - 1} unclosed groups")
    return "".join(w.out), w.info


def rtf_text_of(data: bytes) -> str:
    return rtf_extract(data)[0]


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------


def _rtf_escape(text: str) -> str:
    out = []
    for ch in text:
        o = ord(ch)
        if ch in "\\{}":
            out.append("\\" + ch)
        elif o < 0x80:
            out.append(ch)
        elif o < 0x100:
            out.append(f"\\'{o:02x}")
        elif o < 0x10000:
            n = o - 65536 if o > 32767 else o
            out.append(f"\\u{n} ?")
        else:  # astral: surrogate pair of \u words (RFC'd RTF practice)
            o -= 0x10000
            hi = 0xD800 + (o >> 10)
            lo = 0xDC00 + (o & 0x3FF)
            out.append(f"\\u{hi - 65536} ?\\u{lo - 65536} ?")
    return "".join(out)


def build_rtf(
    paragraphs: list[str], *, title: str = "", author: str = ""
) -> bytes:
    """Minimal valid RTF: font table (a skip destination the reader
    must not leak), optional ``{\\info}`` block, one ``\\par``-ended
    paragraph per entry — non-ASCII exercises both the ``\\'hh`` and
    ``\\uN`` escape paths."""
    info = ""
    if title or author:
        info = (
            "{\\info"
            + (f"{{\\title {_rtf_escape(title)}}}" if title else "")
            + (f"{{\\author {_rtf_escape(author)}}}" if author else "")
            + "}"
        )
    body = "".join(_rtf_escape(p) + "\\par\n" for p in paragraphs)
    return (
        "{\\rtf1\\ansi\\ansicpg1252\\deff0"
        "{\\fonttbl{\\f0\\fswiss Helvetica;}}"
        + info
        + "\\f0\\fs24 "
        + body
        + "}"
    ).encode("latin-1", "replace")
