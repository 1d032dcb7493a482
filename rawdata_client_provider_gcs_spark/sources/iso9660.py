"""ISO 9660 (ECMA-119) disc images — the software-dump container.

Distribution media, firmware dumps, and archived install discs ship
as ``.iso``; the format is pure fixed layout: 2048-byte sectors, a
primary volume descriptor at sector 16, and a directory tree of
both-endian-numbered records.  This module walks the PVD tree and
returns regular-file members, honoring Rock Ridge ``NM`` system-use
entries (the POSIX long names every Unix-authored disc carries) and
falling back to the plain ``NAME.EXT;1`` identifiers otherwise.
Multi-extent files (interleaving, flag 0x80) and extended attribute
records are out of scope and raise cleanly.

Hostile structure — lying extents, record floods, loops via deep
nesting — lands on ``ValueError`` under sector/entry/depth caps, the
per-row capture class.

Verification: images written by the system ``bsdtar`` (libarchive's
ISO 9660 writer with Rock Ridge) parse back byte-exact in the gated
pytest, and bsdtar extracts :func:`build_iso` fixtures byte-exact —
two-direction interop, so the fixture writer cannot mirror a reader
bug.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); container
explosion belongs to this repo's derived ingestion tier.
"""

from __future__ import annotations

_SECTOR = 2048
MAX_MEMBER_BYTES = 256 * 1024 * 1024
MAX_TOTAL_BYTES = 1 << 30
MAX_ENTRIES = 1_000_000
MAX_DEPTH = 64


def sniff_iso(data: bytes) -> bool:
    """A volume descriptor magic at sector 16."""
    off = 16 * _SECTOR
    return len(data) > off + 6 and data[off + 1 : off + 6] == b"CD001"


def _u32_both(rec: bytes, at: int) -> int:
    """Both-endian 32-bit field (LE copy is authoritative; a mismatch
    with the BE copy marks corruption)."""
    le = int.from_bytes(rec[at : at + 4], "little")
    be = int.from_bytes(rec[at + 4 : at + 8], "big")
    if le != be:
        raise ValueError("iso: both-endian field halves disagree")
    return le


def _rock_ridge_name(su: bytes) -> str | None:
    """Concatenate Rock Ridge ``NM`` entries from a record's system-use
    area (SUSP: sig(2) len(1) ver(1) payload; NM payload = flags(1) +
    name, CONTINUE flag 0x01 spans entries)."""
    pos = 0
    name = ""
    found = False
    while pos + 4 <= len(su):
        sig = su[pos : pos + 2]
        ln = su[pos + 2]
        if ln < 4 or pos + ln > len(su):
            break  # padding / malformed tail: stop scanning
        if sig == b"NM":
            found = True
            name += su[pos + 5 : pos + ln].decode("utf-8", "replace")
            if not su[pos + 4] & 0x01:  # no CONTINUE
                return name
        pos += ln
    return name if found else None


def parse_iso(data: bytes, cap: int = MAX_MEMBER_BYTES) -> list[dict]:
    """Parse an ISO 9660 image into member dicts
    ``[{"path", "size", "payload"}]`` (regular files, directory walk
    from the PVD root, Rock Ridge names preferred)."""
    pvd_at = 16 * _SECTOR
    if len(data) < pvd_at + _SECTOR:
        raise ValueError("iso: shorter than its volume descriptor area")
    # walk descriptors: type 1 = primary, 255 = terminator
    pvd = None
    for i in range(16, 32):
        off = i * _SECTOR
        if off + _SECTOR > len(data):
            break
        if data[off + 1 : off + 6] != b"CD001":
            break
        t = data[off]
        if t == 1 and pvd is None:
            pvd = data[off : off + _SECTOR]
        if t == 255:
            break
    if pvd is None:
        raise ValueError("iso: no primary volume descriptor")
    root = pvd[156 : 156 + 34]

    members: list[dict] = []
    budget = [MAX_ENTRIES]
    total = [0]

    def read_dir(extent: int, size: int, prefix: str, depth: int) -> None:
        if depth > MAX_DEPTH:
            raise ValueError("iso: directory nesting over the cap")
        start = extent * _SECTOR
        if start + size > len(data):
            raise ValueError("iso: directory extent past end of image")
        pos = start
        end = start + size
        while pos < end:
            ln = data[pos]
            if ln == 0:
                # records never span sectors: skip to the next one
                pos = (pos // _SECTOR + 1) * _SECTOR
                continue
            if pos + ln > end or ln < 34:
                raise ValueError("iso: directory record overruns its extent")
            budget[0] -= 1
            if budget[0] < 0:
                raise ValueError("iso: record count over the hostile cap")
            rec = data[pos : pos + ln]
            pos += ln
            ext = _u32_both(rec, 2)
            dlen = _u32_both(rec, 10)
            flags = rec[25]
            len_fi = rec[32]
            if 33 + len_fi > ln:
                raise ValueError("iso: file identifier over record end")
            fi = rec[33 : 33 + len_fi]
            if fi in (b"\x00", b"\x01"):
                continue  # self / parent
            su_at = 33 + len_fi + (1 - len_fi % 2)  # pad to even
            rr = _rock_ridge_name(rec[su_at:])
            if rr is not None:
                name = rr
            else:
                name = fi.decode("latin-1", "replace")
                if ";" in name:
                    name = name.split(";")[0]
            path = f"{prefix}{name}"
            if flags & 0x80:
                raise ValueError(
                    f"iso: multi-extent file {path!r} is out of scope"
                )
            if flags & 0x02:
                read_dir(ext, dlen, path + "/", depth + 1)
                continue
            if dlen > cap:
                raise ValueError(
                    f"iso: member {path!r} of {dlen} bytes past the "
                    f"{cap}-byte guard"
                )
            body_at = ext * _SECTOR
            if body_at + dlen > len(data):
                raise ValueError(f"iso: member {path!r} past end of image")
            total[0] += dlen
            if total[0] > MAX_TOTAL_BYTES:
                raise ValueError("iso: image inflates past the total guard")
            members.append(
                {
                    "path": path,
                    "size": dlen,
                    "payload": data[body_at : body_at + dlen],
                }
            )

    root_ext = _u32_both(root, 2)
    root_len = _u32_both(root, 10)
    read_dir(root_ext, root_len, "", 0)
    return members


# ---------------------------------------------------------------------------
# Fixture writer (plain ISO names, flat root — the Rock Ridge path is
# pinned against real bsdtar images instead)
# ---------------------------------------------------------------------------


def _both32(v: int) -> bytes:
    return v.to_bytes(4, "little") + v.to_bytes(4, "big")


def _both16(v: int) -> bytes:
    return v.to_bytes(2, "little") + v.to_bytes(2, "big")


def _dir_record(
    extent: int, size: int, flags: int, fi: bytes
) -> bytes:
    body = (
        bytes([0])                 # ext attr length
        + _both32(extent)
        + _both32(size)
        + bytes(7)                 # recording date
        + bytes([flags, 0, 0])
        + _both16(1)               # volume sequence number
        + bytes([len(fi)])
        + fi
    )
    rec = bytes([len(body) + 1]) + body
    if len(rec) % 2:
        rec += b"\x00"
    return bytes([len(rec)]) + rec[1:]


def build_iso(members: list[tuple[str, bytes]]) -> bytes:
    """Minimal valid single-sector-root ISO 9660 image: PVD +
    terminator, type-L/M path tables, flat root of ``NAME;1``
    records, sector-aligned file data, padded to libarchive's 64-
    sector read-ahead minimum.  Interop-pinned: the system bsdtar
    lists and extracts this output in the gated test."""
    pt_extent = 18
    root_extent = 19
    recs = (
        _dir_record(root_extent, _SECTOR, 0x02, b"\x00")
        + _dir_record(root_extent, _SECTOR, 0x02, b"\x01")
    )
    data_extent = 20
    payload = bytearray()
    for name, body in members:
        fi = (name.upper() + ";1").encode("ascii")
        recs += _dir_record(data_extent, len(body), 0x00, fi)
        payload += body + b"\x00" * (-len(body) % _SECTOR)
        data_extent += max(1, (len(body) + _SECTOR - 1) // _SECTOR)
    if len(recs) > _SECTOR:
        raise ValueError("iso fixture: too many members for one sector")
    # libarchive's bidder needs a read-ahead window: pad to 64 sectors
    total_sectors = max(data_extent, 64)

    # type-L path table (one root entry); the M copy is byte-swapped
    pt_l = (
        bytes([1, 0])
        + root_extent.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + b"\x00"
    )

    pvd = bytearray(_SECTOR)
    pvd[0] = 1
    pvd[1:6] = b"CD001"
    pvd[6] = 1
    pvd[8:40] = b"LINUX".ljust(32)          # system id
    pvd[40:72] = b"RAWDATA".ljust(32)       # volume id
    pvd[80:88] = _both32(total_sectors)     # volume space size
    pvd[120:124] = _both16(1)               # volume set size
    pvd[124:128] = _both16(1)               # volume sequence number
    pvd[128:132] = _both16(_SECTOR)         # logical block size
    pvd[132:140] = _both32(len(pt_l))       # path table size
    pvd[140:144] = pt_extent.to_bytes(4, "little")  # L path table
    pvd[148:152] = pt_extent.to_bytes(4, "big")     # M path table
    pvd[156:190] = _dir_record(root_extent, _SECTOR, 0x02, b"\x00")
    pvd[881] = 1                            # file structure version
    term = bytearray(_SECTOR)
    term[0] = 255
    term[1:6] = b"CD001"
    term[6] = 1

    out = bytearray(16 * _SECTOR)
    out += pvd + term
    out += pt_l + b"\x00" * (_SECTOR - len(pt_l))
    out += recs + b"\x00" * (_SECTOR - len(recs))
    out += payload
    out += b"\x00" * (total_sectors * _SECTOR - len(out))
    return bytes(out)
