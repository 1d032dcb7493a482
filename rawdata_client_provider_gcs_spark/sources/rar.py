"""RAR 4.x / RAR5 archive census + stored-member extraction.

Both header grammars are public (rarlab's technote for RAR5's
vint-coded CRC32-guarded blocks; the long-documented fixed 7-byte
block heads with CRC16 for RAR 4.x — the unrarsrc headers mirror
them).  The census — member names, packed/unpacked sizes, methods,
CRCs, directory flags — always works, and STORED members (method 0 /
0x30, the common case for already-compressed payloads) extract
byte-exact with CRC32 verification.  RAR's proprietary LZSS/PPMd
compression and AES encryption stay the documented loud boundary,
exactly like the 7z AES tier: a recognized-but-undecodable member
raises :class:`~..operators.rawavi.UnsupportedCodecError`, which
``archive_members`` captures per-row.

Fixture writers (:func:`build_rar5` / :func:`build_rar4`) emit
stored-member archives straight from the spec; the gated pytest
cross-checks them against the system bsdtar (libarchive's independent
RAR readers), so the writers cannot mirror a reader bug.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); archive
explosion is this repo's derived crawl tier.
"""

from __future__ import annotations

import binascii
import struct

from ..operators.rawavi import UnsupportedCodecError

RAR5_SIG = b"Rar!\x1a\x07\x01\x00"
RAR4_SIG = b"Rar!\x1a\x07\x00"

#: bomb guards (shared discipline with archive.py)
MAX_MEMBER_BYTES = 1 << 30
MAX_MEMBERS = 1 << 20

_RAR5_METHODS = ("store", "fastest", "fast", "normal", "good", "best")


def sniff_rar(data: bytes) -> str | None:
    """'rar5' | 'rar4' | None.  The RAR5 signature extends the 4.x
    one by a version byte, so it must probe first."""
    if data[: len(RAR5_SIG)] == RAR5_SIG:
        return "rar5"
    if data[: len(RAR4_SIG)] == RAR4_SIG:
        return "rar4"
    return None


# ---------------------------------------------------------------------------
# RAR5 (vint blocks)
# ---------------------------------------------------------------------------


def _vint(data: bytes, pos: int) -> tuple[int, int]:
    """Little-endian base-128 with bit-7 continuation, max 10 bytes."""
    out = 0
    for i in range(10):
        if pos >= len(data):
            raise ValueError("rar5: vint runs past end of data")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << (7 * i)
        if not b & 0x80:
            return out, pos
    raise ValueError("rar5: vint over 10 bytes")


def _vint_w(value: int) -> bytes:
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def parse_rar5(data: bytes, cap: int = MAX_MEMBER_BYTES) -> list[dict]:
    """RAR5 member census: every block's CRC32 verified, file headers
    decoded into ``{path, size, packed_size, method, crc32, is_dir,
    payload}`` — ``payload`` is the extracted bytes for stored
    members, None for compressed ones (census-only)."""
    if data[: len(RAR5_SIG)] != RAR5_SIG:
        raise ValueError("rar5: bad signature")
    pos = len(RAR5_SIG)
    members: list[dict] = []
    saw_end = False
    while pos < len(data):
        if len(data) - pos < 6:
            raise ValueError("rar5: truncated block head")
        crc = struct.unpack("<I", data[pos : pos + 4])[0]
        hsize, hstart = _vint(data, pos + 4)
        if hsize < 2 or hstart + hsize > len(data):
            raise ValueError("rar5: header size past end of data")
        header = data[hstart : hstart + hsize]
        # technote: the CRC32 covers the header SIZE vint too (from
        # the size field through the end of the header)
        if binascii.crc32(data[pos + 4 : hstart + hsize]) & 0xFFFFFFFF \
                != crc:
            raise ValueError("rar5: header CRC32 mismatch")
        hp = 0
        htype, hp = _vint(header, hp)
        hflags, hp = _vint(header, hp)
        extra_size = data_size = 0
        if hflags & 0x01:
            extra_size, hp = _vint(header, hp)
        if hflags & 0x02:
            data_size, hp = _vint(header, hp)
        if data_size > cap:
            raise ValueError(
                f"rar5: data area declares {data_size} bytes, over the "
                f"{cap}-byte guard"
            )
        if hstart + hsize + data_size > len(data):
            raise ValueError("rar5: data area past end of archive")
        if htype == 4:
            raise UnsupportedCodecError(
                "rar5: encrypted archive headers (AES) are out of the "
                "documented subset"
            )
        if htype == 2:  # file header
            ffl, hp = _vint(header, hp)
            unpsize, hp = _vint(header, hp)
            _attr, hp = _vint(header, hp)
            if ffl & 0x02:  # mtime
                hp += 4
            fcrc = None
            if ffl & 0x04:
                if hp + 4 > len(header):
                    raise ValueError("rar5: file CRC past header end")
                fcrc = struct.unpack("<I", header[hp : hp + 4])[0]
                hp += 4
            comp, hp = _vint(header, hp)
            _host, hp = _vint(header, hp)
            nlen, hp = _vint(header, hp)
            if hp + nlen > len(header):
                raise ValueError("rar5: name past header end")
            name = header[hp : hp + nlen].decode("utf-8", "replace")
            method = (comp >> 7) & 0x07
            is_dir = bool(ffl & 0x01)
            if unpsize > cap:
                raise ValueError(
                    f"rar5: member {name!r} declares {unpsize} bytes, "
                    f"over the {cap}-byte guard"
                )
            payload = None
            if not is_dir and method == 0:
                if hflags & 0x08 or hflags & 0x10:
                    raise UnsupportedCodecError(
                        f"rar5: member {name!r} is split across volumes"
                    )
                payload = data[hstart + hsize : hstart + hsize + data_size]
                if len(payload) != unpsize:
                    raise ValueError(
                        f"rar5: stored member {name!r} size mismatch "
                        f"({len(payload)} data vs {unpsize} declared)"
                    )
                if fcrc is not None and \
                        binascii.crc32(payload) & 0xFFFFFFFF != fcrc:
                    raise ValueError(
                        f"rar5: member {name!r} fails CRC-32"
                    )
            members.append({
                "path": name,
                "size": unpsize,
                "packed_size": data_size,
                "method": _RAR5_METHODS[method]
                if method < len(_RAR5_METHODS) else f"method-{method}",
                "crc32": fcrc,
                "is_dir": is_dir,
                "payload": payload,
            })
            if len(members) > MAX_MEMBERS:
                raise ValueError("rar5: member count over the cap")
        elif htype == 5:
            saw_end = True
            pos = hstart + hsize + data_size
            break
        pos = hstart + hsize + data_size
    if not saw_end:
        raise ValueError("rar5: archive ends without its end header")
    return members


# ---------------------------------------------------------------------------
# RAR 4.x (fixed block heads)
# ---------------------------------------------------------------------------


def parse_rar4(data: bytes, cap: int = MAX_MEMBER_BYTES) -> list[dict]:
    """RAR 4.x member census: CRC16-verified block heads, file headers
    decoded into the same member shape as :func:`parse_rar5`.  A
    unicode-flagged name (the custom RAR encoding) keeps its 8-bit
    half before the NUL — documented subset, never synthesis."""
    if data[: len(RAR4_SIG)] != RAR4_SIG:
        raise ValueError("rar4: bad signature")
    pos = len(RAR4_SIG)
    members: list[dict] = []
    saw_end = False
    while pos + 7 <= len(data):
        hcrc, htype, hflags, hsize = struct.unpack(
            "<HBHH", data[pos : pos + 7]
        )
        if hsize < 7 or pos + hsize > len(data):
            raise ValueError("rar4: header size past end of data")
        header = data[pos : pos + hsize]
        # HEAD_CRC is the low 16 bits of CRC32 over the head from
        # HEAD_TYPE on
        if binascii.crc32(header[2:]) & 0xFFFF != hcrc:
            raise ValueError("rar4: header CRC16 mismatch")
        add_size = 0
        if htype == 0x74:  # file header
            if hsize < 32:
                raise ValueError("rar4: file header under 32 bytes")
            (pack, unp, _host, fcrc, _ftime, _unpver, method, nlen,
             _attr) = struct.unpack("<IIBIIBBHI", header[7:32])
            noff = 32
            if hflags & 0x0100:  # 64-bit sizes
                if hsize < 40:
                    raise ValueError("rar4: large-file header under 40")
                hi_p, hi_u = struct.unpack("<II", header[32:40])
                pack |= hi_p << 32
                unp |= hi_u << 32
                noff = 40
            if noff + nlen > hsize:
                raise ValueError("rar4: name past header end")
            raw_name = header[noff : noff + nlen]
            if hflags & 0x0200 and b"\x00" in raw_name:
                raw_name = raw_name.split(b"\x00", 1)[0]
            name = raw_name.decode("utf-8", "replace")
            if pack > cap or unp > cap:
                raise ValueError(
                    f"rar4: member {name!r} declares {max(pack, unp)} "
                    f"bytes, over the {cap}-byte guard"
                )
            if pos + hsize + pack > len(data):
                raise ValueError("rar4: file data past end of archive")
            is_dir = (hflags & 0xE0) == 0xE0
            if hflags & 0x04:
                raise UnsupportedCodecError(
                    f"rar4: member {name!r} is AES-encrypted"
                )
            payload = None
            if not is_dir and method == 0x30:
                if hflags & 0x01 or hflags & 0x02:
                    raise UnsupportedCodecError(
                        f"rar4: member {name!r} is split across volumes"
                    )
                payload = data[pos + hsize : pos + hsize + pack]
                if len(payload) != unp:
                    raise ValueError(
                        f"rar4: stored member {name!r} size mismatch"
                    )
                if binascii.crc32(payload) & 0xFFFFFFFF != fcrc:
                    raise ValueError(f"rar4: member {name!r} fails CRC-32")
            members.append({
                "path": name,
                "size": unp,
                "packed_size": pack,
                "method": "store" if method == 0x30
                else f"method-{method - 0x30}" if 0x30 < method <= 0x35
                else f"method-0x{method:02x}",
                "crc32": fcrc,
                "is_dir": is_dir,
                "payload": payload,
            })
            if len(members) > MAX_MEMBERS:
                raise ValueError("rar4: member count over the cap")
            add_size = pack
        elif htype == 0x7B:
            saw_end = True
            pos += hsize
            break
        elif hflags & 0x8000:
            if hsize < 11:
                raise ValueError("rar4: long block under 11 bytes")
            add_size = struct.unpack("<I", header[7:11])[0]
            if pos + hsize + add_size > len(data):
                raise ValueError("rar4: block data past end of archive")
        pos += hsize + add_size
    if not saw_end:
        raise ValueError("rar4: archive ends without its end block")
    return members


# ---------------------------------------------------------------------------
# shared surface
# ---------------------------------------------------------------------------


def parse_rar(
    data: bytes, cap: int = MAX_MEMBER_BYTES
) -> tuple[str, list[dict]]:
    """``(format, members)`` for either RAR flavor; ValueError on
    anything else (per-row capture)."""
    fmt = sniff_rar(data)
    if fmt == "rar5":
        return "rar5", parse_rar5(data, cap)
    if fmt == "rar4":
        return "rar4", parse_rar4(data, cap)
    raise ValueError("rar: payload carries neither RAR signature")


# ---------------------------------------------------------------------------
# fixture writers (stored members only — the decodable subset)
# ---------------------------------------------------------------------------


def _rar5_block(htype: int, fields: bytes, data_area: bytes = b"") -> bytes:
    # file blocks always declare a data area, even a zero-byte one —
    # libarchive rejects a file/service block without the flag
    hflags = 0x02 if (data_area or htype == 2) else 0
    body = _vint_w(htype) + _vint_w(hflags)
    if hflags & 0x02:
        body += _vint_w(len(data_area))
    body += fields
    sized = _vint_w(len(body)) + body  # CRC spans the size vint too
    crc = binascii.crc32(sized) & 0xFFFFFFFF
    return struct.pack("<I", crc) + sized + data_area


def build_rar5(members: list[tuple[str, bytes]]) -> bytes:
    """Deterministic RAR5 writer, stored members with CRC32."""
    out = bytearray(RAR5_SIG)
    out += _rar5_block(1, _vint_w(0))  # main header: archive flags 0
    for path, data in members:
        name = path.encode("utf-8")
        fields = (
            _vint_w(0x04)                      # file flags: CRC present
            + _vint_w(len(data))               # unpacked size
            + _vint_w(0)                       # attributes
            + struct.pack("<I", binascii.crc32(data) & 0xFFFFFFFF)
            + _vint_w(0)                       # compression: v0, store
            + _vint_w(1)                       # host OS: unix
            + _vint_w(len(name))
            + name
        )
        out += _rar5_block(2, fields, data)
    out += _rar5_block(5, _vint_w(0))  # end of archive
    return bytes(out)


def _rar4_block(htype: int, hflags: int, tail: bytes,
                data_area: bytes = b"") -> bytes:
    hsize = 7 + len(tail)
    body = struct.pack("<BHH", htype, hflags, hsize) + tail
    crc = binascii.crc32(body) & 0xFFFF
    return struct.pack("<H", crc) + body + data_area


def build_rar4(members: list[tuple[str, bytes]]) -> bytes:
    """Deterministic RAR 4.x writer, stored members with CRC32."""
    out = bytearray(RAR4_SIG)
    out += _rar4_block(0x73, 0, b"\x00" * 6)  # main: HighPosAV+PosAV
    for path, data in members:
        name = path.encode("utf-8")
        tail = struct.pack(
            "<IIBIIBBHI",
            len(data),                      # PACK_SIZE
            len(data),                      # UNP_SIZE
            3,                              # HOST_OS: unix
            binascii.crc32(data) & 0xFFFFFFFF,
            0x5821_0000 >> 16 | 0x0548 << 16,  # fixed DOS timestamp
            20,                             # UNP_VER 2.0
            0x30,                           # METHOD: store
            len(name),
            0o644,                          # ATTR
        ) + name
        out += _rar4_block(0x74, 0x8000, tail, data)
    out += _rar4_block(0x7B, 0x4000, b"")  # end block
    return bytes(out)


def parse_rar_members(
    data: bytes, cap: int = MAX_MEMBER_BYTES
) -> tuple[str, list[dict]]:
    """The ``archive_members`` shape: regular extractable files only.
    Any RAR-compressed member makes the archive census-only — that is
    :class:`UnsupportedCodecError` here (per-row data downstream),
    same contract as an out-of-scope 7z coder chain."""
    fmt, ms = parse_rar(data, cap)
    out = []
    for m in ms:
        if m["is_dir"]:
            continue
        if m["payload"] is None:
            raise UnsupportedCodecError(
                f"{fmt}: member {m['path']!r} uses RAR compression "
                f"({m['method']}); only stored members extract"
            )
        out.append({"path": m["path"], "size": m["size"],
                    "payload": m["payload"]})
    return fmt, out
