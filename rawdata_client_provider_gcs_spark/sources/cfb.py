"""OLE2 / Compound File Binary (.doc/.xls/.ppt) — container walk +
SummaryInformation metadata.

Legacy binary Office files are Compound File Binary containers
(public spec MS-CFB): a FAT filesystem-in-a-file of 512-byte sectors
holding named streams, with a 64-byte mini-sector tier for streams
under 4096 bytes.  This module walks the container — header, DIFAT,
FAT chains, directory entries, miniFAT + mini stream — and parses the
``\\x05SummaryInformation`` property-set stream (public spec MS-OLEPS)
for the Dublin-Core-equivalent fields curation keys on: title,
author, application.

Text extraction for the classified formats (.doc piece table, .xls
BIFF8 cells, .ppt text atoms) lives in :mod:`.legacy_office`, built
on this module's stream walk; ``office_info`` reports metadata with
``absence-is-data`` semantics like every other format.

All malformed-input paths raise ``ValueError`` (per-row capture);
sector chains are cycle-guarded and size-capped so a hostile FAT
cannot loop or balloon an executor.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); document
container decoding is this repo's derived crawl tier.
"""

from __future__ import annotations

import struct

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC

#: bomb guards
MAX_SECTORS = 1 << 20          # 512 MiB of 512-byte sectors
MAX_STREAM_BYTES = 256 * 1024 * 1024
MAX_DIR_ENTRIES = 1 << 16

_SUMMARY_FMTID = bytes.fromhex("e085 9ff2 f94f 6810 ab91 08002b27b3d9"
                               .replace(" ", ""))

#: MS-OLEPS SummaryInformation property ids
_PIDSI_TITLE = 2
_PIDSI_SUBJECT = 3
_PIDSI_AUTHOR = 4
_PIDSI_APPNAME = 18

_VT_I2 = 0x02
_VT_LPSTR = 0x1E
_VT_LPWSTR = 0x1F


def sniff_cfb(data: bytes) -> bool:
    return data[:8] == CFB_MAGIC


def _chain(fat: list[int], start: int, label: str,
           max_len: int) -> list[int]:
    """Follow a FAT/miniFAT chain with cycle + length guards."""
    out = []
    cur = start
    while cur != _ENDOFCHAIN:
        if cur in (_FREESECT, _FATSECT, _DIFSECT):
            raise ValueError(f"cfb: {label} chain hits a non-data sector")
        if cur >= len(fat):
            raise ValueError(f"cfb: {label} chain sector {cur} out of range")
        out.append(cur)
        if len(out) > max_len:
            raise ValueError(f"cfb: {label} chain longer than the file (loop)")
        cur = fat[cur]
    return out


def parse_cfb(data: bytes) -> dict:
    """Parse a CFB container → ``{"entries": [{"name", "type",
    "size", "payload"}], "version": major}``.  Stream payloads are
    read through the FAT (≥4096 bytes) or the mini stream (<4096);
    storage (directory) entries carry no payload."""
    if not sniff_cfb(data):
        raise ValueError("cfb: bad signature magic")
    if len(data) < 512:
        raise ValueError("cfb: shorter than its 512-byte header")
    (major, byte_order, sector_shift, mini_shift) = struct.unpack_from(
        "<HHHH", data, 26
    )
    if byte_order != 0xFFFE:
        raise ValueError(f"cfb: byte-order mark 0x{byte_order:04x}")
    if major not in (3, 4):
        raise ValueError(f"cfb: major version {major}")
    if sector_shift != (9 if major == 3 else 12):
        raise ValueError(f"cfb: sector shift {sector_shift} for v{major}")
    if mini_shift != 6:
        raise ValueError(f"cfb: mini sector shift {mini_shift}")
    ssize = 1 << sector_shift
    (n_fat,) = struct.unpack_from("<I", data, 44)
    (first_dir,) = struct.unpack_from("<I", data, 48)
    (cutoff,) = struct.unpack_from("<I", data, 56)
    (first_minifat, n_minifat) = struct.unpack_from("<II", data, 60)
    (first_difat, n_difat) = struct.unpack_from("<II", data, 68)

    # sector i starts at (i+1)*ssize — for v4 the 512-byte header is
    # padded to a full 4096-byte first region (MS-CFB §2.2)
    n_sectors = max(0, (len(data) - ssize + ssize - 1) // ssize)
    if n_sectors > MAX_SECTORS:
        raise ValueError("cfb: sector count over the cap")

    def sector(i: int) -> bytes:
        off = (i + 1) * ssize
        if off + ssize > len(data):
            # the final sector of a v4 file may be truncated; pad
            return data[off:] + b"\x00" * (off + ssize - len(data))
        return data[off : off + ssize]

    # DIFAT: 109 header entries + chained DIFAT sectors.  n_difat is an
    # attacker-controlled u32 and each sector appends 127 entries, so
    # the walk is BOTH cycle-guarded and capped at what the file could
    # physically hold — a self-looping DIFAT must not be a memory bomb.
    difat: list[int] = list(struct.unpack_from("<109I", data, 76))
    cur = first_difat
    seen_difat: set[int] = set()
    for _ in range(min(n_difat, n_sectors + 1)):
        if cur in (_ENDOFCHAIN, _FREESECT):
            break
        if cur >= n_sectors:
            raise ValueError("cfb: DIFAT sector out of range")
        if cur in seen_difat:
            raise ValueError("cfb: DIFAT chain loops")
        seen_difat.add(cur)
        body = sector(cur)
        vals = struct.unpack(f"<{ssize // 4}I", body)
        difat.extend(vals[:-1])
        cur = vals[-1]
    fat_sectors = [s for s in difat if s != _FREESECT][:n_fat]
    if len(fat_sectors) < n_fat:
        raise ValueError("cfb: DIFAT names fewer FAT sectors than declared")

    fat: list[int] = []
    for s in fat_sectors:
        if s >= n_sectors:
            raise ValueError("cfb: FAT sector out of range")
        fat.extend(struct.unpack(f"<{ssize // 4}I", sector(s)))

    def read_chain(start: int, size: int, label: str) -> bytes:
        if size > MAX_STREAM_BYTES:
            raise ValueError(f"cfb: {label} stream over the size cap")
        chain = _chain(fat, start, label, n_sectors + 1)
        if len(chain) * ssize < size:
            raise ValueError(f"cfb: {label} chain shorter than its size")
        return b"".join(sector(i) for i in chain)[:size]

    # directory entries
    dir_chain = _chain(fat, first_dir, "directory", n_sectors + 1)
    dir_data = b"".join(sector(i) for i in dir_chain)
    n_entries = len(dir_data) // 128
    if n_entries > MAX_DIR_ENTRIES:
        raise ValueError("cfb: directory entry count over the cap")
    entries = []
    root = None
    for i in range(n_entries):
        e = dir_data[i * 128 : (i + 1) * 128]
        (name_len,) = struct.unpack_from("<H", e, 64)
        etype = e[66]
        if etype == 0 or name_len < 2 or name_len > 64:
            continue  # unused entry
        name = e[: name_len - 2].decode("utf-16-le", "replace")
        (start,) = struct.unpack_from("<I", e, 116)
        (size,) = struct.unpack_from("<Q", e, 120)
        if major == 3:
            size &= 0xFFFFFFFF
        entry = {"name": name, "type": etype, "start": start, "size": size}
        entries.append(entry)
        if etype == 5 and root is None:
            root = entry

    # mini stream: held in the root entry's regular chain
    minifat: list[int] = []
    if n_minifat and first_minifat != _ENDOFCHAIN:
        for s in _chain(fat, first_minifat, "miniFAT", n_sectors + 1):
            minifat.extend(struct.unpack(f"<{ssize // 4}I", sector(s)))
    mini_stream = b""
    if root is not None and root["size"]:
        mini_stream = read_chain(root["start"], root["size"], "mini stream")

    def read_mini(start: int, size: int, label: str) -> bytes:
        if size > MAX_STREAM_BYTES:
            raise ValueError(f"cfb: {label} stream over the size cap")
        chain = _chain(minifat, start, label, len(minifat) + 1)
        if len(chain) * 64 < size:
            raise ValueError(f"cfb: {label} mini chain shorter than its size")
        out = bytearray()
        for i in chain:
            off = i * 64
            if off + 64 > len(mini_stream):
                raise ValueError(f"cfb: {label} mini sector past mini stream")
            out += mini_stream[off : off + 64]
        return bytes(out[:size])

    out_entries = []
    for e in entries:
        payload = b""
        if e["type"] == 2 and e["size"]:
            if e["size"] < cutoff:
                payload = read_mini(e["start"], e["size"], e["name"])
            else:
                payload = read_chain(e["start"], e["size"], e["name"])
        out_entries.append(
            {"name": e["name"], "type": e["type"], "size": e["size"],
             "payload": payload}
        )
    return {"entries": out_entries, "version": major}


# ---------------------------------------------------------------------------
# SummaryInformation (MS-OLEPS)
# ---------------------------------------------------------------------------


def parse_summary_info(stream: bytes) -> dict:
    """``\\x05SummaryInformation`` property set → ``{title, subject,
    author, app_name}`` (empty strings when absent — absence is data).

    Raises ``ValueError`` on any malformed bytes — including short
    buffers that would otherwise surface as ``struct.error``, which is
    NOT a per-row capture class."""
    try:
        return _parse_summary_info(stream)
    except struct.error as exc:
        raise ValueError(f"oleps: truncated property set: {exc}")


def _parse_summary_info(stream: bytes) -> dict:
    out = {"title": "", "subject": "", "author": "", "app_name": ""}
    if len(stream) < 48:
        raise ValueError("oleps: property set stream too short")
    (byte_order, _fmt) = struct.unpack_from("<HH", stream, 0)
    if byte_order != 0xFFFE:
        raise ValueError(f"oleps: byte-order mark 0x{byte_order:04x}")
    (n_sets,) = struct.unpack_from("<I", stream, 24)
    if not 1 <= n_sets <= 2:
        raise ValueError(f"oleps: {n_sets} property sets")
    fmtid = stream[28:44]
    (sec_off,) = struct.unpack_from("<I", stream, 44)
    if fmtid != _SUMMARY_FMTID:
        return out  # some other property set — nothing to read
    if sec_off + 8 > len(stream):
        raise ValueError("oleps: section offset past end")
    (sec_size, n_props) = struct.unpack_from("<II", stream, sec_off)
    if sec_off + sec_size > len(stream) or n_props > 256:
        raise ValueError("oleps: section size/property count out of range")
    codepage = 1252
    props: dict[int, int] = {}
    for i in range(n_props):
        pid, off = struct.unpack_from("<II", stream, sec_off + 8 + 8 * i)
        props[pid] = off

    def read_prop(pid: int) -> str | int | None:
        off = props.get(pid)
        if off is None:
            return None
        p = sec_off + off
        if p + 4 > len(stream):
            raise ValueError("oleps: property offset past end")
        (vt,) = struct.unpack_from("<I", stream, p)
        vt &= 0xFFFF
        if vt == _VT_I2:
            return struct.unpack_from("<h", stream, p + 4)[0]
        if vt == _VT_LPSTR:
            (cb,) = struct.unpack_from("<I", stream, p + 4)
            raw = stream[p + 8 : p + 8 + cb].split(b"\x00")[0]
            enc = "utf-8" if codepage == 65001 else "cp1252"
            return raw.decode(enc, "replace")
        if vt == _VT_LPWSTR:
            (cch,) = struct.unpack_from("<I", stream, p + 4)
            raw = stream[p + 8 : p + 8 + 2 * cch]
            return raw.decode("utf-16-le", "replace").split("\x00")[0]
        return None  # FILETIME/counts: not needed by the metadata tier

    cp = read_prop(1)
    if isinstance(cp, int):
        codepage = cp & 0xFFFF
    for key, pid in (("title", _PIDSI_TITLE), ("subject", _PIDSI_SUBJECT),
                     ("author", _PIDSI_AUTHOR), ("app_name", _PIDSI_APPNAME)):
        v = read_prop(pid)
        if isinstance(v, str):
            out[key] = v
    return out


def classify_cfb(entries: list[dict]) -> str:
    """Stream-name classification: WordDocument → doc, Workbook/Book →
    xls, 'PowerPoint Document' → ppt, anything else → cfb."""
    names = {e["name"] for e in entries}
    if "WordDocument" in names:
        return "doc"
    if "Workbook" in names or "Book" in names:
        return "xls"
    if "PowerPoint Document" in names:
        return "ppt"
    return "cfb"


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------


def _oleps_summary(title: str, author: str, app_name: str = "") -> bytes:
    """Serialize a SummaryInformation property set (VT_LPSTR strings,
    cp1252, codepage property first — the shape legacy Office wrote)."""
    def lpstr(s: str) -> bytes:
        raw = s.encode("cp1252", "replace") + b"\x00"
        pad = (-len(raw)) % 4
        return struct.pack("<II", _VT_LPSTR, len(raw)) + raw + b"\x00" * pad

    values: list[tuple[int, bytes]] = [
        (1, struct.pack("<Ih2x", _VT_I2, 1252)),
    ]
    if title:
        values.append((_PIDSI_TITLE, lpstr(title)))
    if author:
        values.append((_PIDSI_AUTHOR, lpstr(author)))
    if app_name:
        values.append((_PIDSI_APPNAME, lpstr(app_name)))
    head = 8 + 8 * len(values)
    offs = []
    pos = head
    for _, blob in values:
        offs.append(pos)
        pos += len(blob)
    section = struct.pack("<II", pos, len(values))
    for (pid, _), off in zip(values, offs):
        section += struct.pack("<II", pid, off)
    for _, blob in values:
        section += blob
    stream = struct.pack("<HHI", 0xFFFE, 0, 0x00020005)
    stream += b"\x00" * 16  # CLSID
    stream += struct.pack("<I", 1)
    stream += _SUMMARY_FMTID
    stream += struct.pack("<I", 48)
    return stream + section


def build_cfb(
    streams: list[tuple[str, bytes]],
    *,
    title: str = "",
    author: str = "",
    app_name: str = "",
    version: int = 3,
) -> bytes:
    """Deterministic CFB writer (v3 = 512-byte sectors, v4 = 4096):
    one FAT sector, a directory chain, a SummaryInformation stream
    (always < 4096, so it exercises the miniFAT + mini-stream path),
    and the caller's streams (FAT chains when ≥ 4096 bytes, mini
    chains below)."""
    if version not in (3, 4):
        raise ValueError(f"cfb fixture: version {version}")
    ssize = 512 if version == 3 else 4096
    msize, cutoff = 64, 4096
    summary = _oleps_summary(title, author, app_name)
    all_streams = [("\x05SummaryInformation", summary)] + list(streams)

    mini_payloads: list[tuple[int, bytes]] = []  # (entry idx, data)
    big_payloads: list[tuple[int, bytes]] = []
    for i, (_, body) in enumerate(all_streams):
        (mini_payloads if len(body) < cutoff else big_payloads).append(
            (i, body)
        )

    # mini stream assembly + miniFAT
    minifat: list[int] = []
    mini_stream = bytearray()
    mini_starts: dict[int, int] = {}
    for idx, body in mini_payloads:
        n = max(1, (len(body) + msize - 1) // msize)
        start = len(minifat)
        for k in range(n):
            minifat.append(start + k + 1 if k < n - 1 else _ENDOFCHAIN)
        mini_starts[idx] = start
        mini_stream += body + b"\x00" * ((-len(body)) % msize)

    # sector plan: [0]=FAT, then directory, miniFAT, mini stream, big
    n_dir_entries = 1 + len(all_streams)
    n_dir_sectors = max(1, (n_dir_entries * 128 + ssize - 1) // ssize)
    sectors: list[bytes] = []
    fat: list[int] = []

    def alloc(data_: bytes) -> int:
        """Append one chain of sectors for data_, return start index."""
        n = max(1, (len(data_) + ssize - 1) // ssize)
        start = 1 + len(sectors)  # sector 0 is the FAT
        padded = data_ + b"\x00" * ((-len(data_)) % ssize)
        for k in range(n):
            sectors.append(padded[k * ssize : (k + 1) * ssize])
            fat.append(start + k + 1 if k < n - 1 else _ENDOFCHAIN)
        return start

    # reserve directory chain positions first so its start is stable
    dir_start = 1 + len(sectors)
    for k in range(n_dir_sectors):
        sectors.append(b"")  # placeholder
        fat.append(dir_start + k + 1 if k < n_dir_sectors - 1
                   else _ENDOFCHAIN)

    minifat_blob = b"".join(struct.pack("<I", v) for v in minifat)
    minifat_start = alloc(minifat_blob) if minifat else _ENDOFCHAIN
    n_minifat_sectors = (
        max(1, (len(minifat_blob) + ssize - 1) // ssize) if minifat else 0
    )
    mini_stream_start = (
        alloc(bytes(mini_stream)) if mini_stream else _ENDOFCHAIN
    )
    big_starts: dict[int, int] = {}
    for idx, body in big_payloads:
        big_starts[idx] = alloc(body)

    def dir_entry(name: str, etype: int, start: int, size: int,
                  child: int = _FREESECT, right: int = _FREESECT) -> bytes:
        raw = name.encode("utf-16-le")
        e = bytearray(128)
        e[: len(raw)] = raw
        struct.pack_into("<H", e, 64, len(raw) + 2)
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, _FREESECT, right, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    # Directory tree: entries sorted by the CFB name order (UTF-16
    # length, then uppercased name) and linked as a right-descending
    # chain — a degenerate but VALID sibling BST, so conforming
    # readers walking root→child→right see every stream (a flat
    # sibling-less list would hide all but the first).
    order = sorted(
        range(len(all_streams)),
        key=lambda i: (len(all_streams[i][0].encode("utf-16-le")),
                       all_streams[i][0].upper()),
    )
    entries = [
        dir_entry("Root Entry", 5, mini_stream_start, len(mini_stream),
                  child=1)
    ]
    for k, i in enumerate(order):
        name, body = all_streams[i]
        start = (mini_starts[i] if len(body) < cutoff
                 else big_starts.get(i, _ENDOFCHAIN))
        right = k + 2 if k < len(order) - 1 else _FREESECT
        entries.append(dir_entry(name, 2, start, len(body), right=right))
    dir_blob = b"".join(entries)
    dir_blob += b"\x00" * ((-len(dir_blob)) % ssize)
    for k in range(n_dir_sectors):
        sectors[dir_start - 1 + k] = dir_blob[k * ssize : (k + 1) * ssize]

    # FAT sector 0 covers itself + everything allocated
    fat_full = [_FATSECT] + fat
    if len(fat_full) > ssize // 4:
        raise ValueError("cfb fixture: too many sectors for one FAT sector")
    fat_blob = b"".join(struct.pack("<I", v) for v in fat_full)
    fat_blob += struct.pack("<I", _FREESECT) * (
        (ssize - len(fat_blob)) // 4
    )

    header = bytearray(512 if version == 3 else 4096)
    header[:8] = CFB_MAGIC
    struct.pack_into("<HHHH", header, 24, 0x003E, version, 0xFFFE,
                     9 if version == 3 else 12)
    # offset 26: major=3, byte order, sector shift... careful: layout is
    # minor(24) major(26) byteorder(28) shift(30)? MS-CFB: minor at 24,
    # major at 26, byte order 28, sector shift 30, mini shift 32.
    struct.pack_into("<H", header, 32, 6)
    struct.pack_into("<I", header, 44, 1)  # one FAT sector
    struct.pack_into("<I", header, 48, dir_start)
    struct.pack_into("<I", header, 56, cutoff)
    struct.pack_into(
        "<II", header, 60,
        minifat_start if minifat else _ENDOFCHAIN, n_minifat_sectors,
    )
    struct.pack_into("<II", header, 68, _ENDOFCHAIN, 0)  # no DIFAT chain
    struct.pack_into("<I", header, 76, 0)  # DIFAT[0] -> FAT at sector 0
    for i in range(1, 109):
        struct.pack_into("<I", header, 76 + 4 * i, _FREESECT)
    return bytes(header) + fat_blob + b"".join(sectors)
