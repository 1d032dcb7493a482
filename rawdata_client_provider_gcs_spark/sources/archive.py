"""ZIP / TAR archive ingestion — the bundled-documents crawl shape.

Datasets routinely arrive as archives: source-code dumps and doc sets
as ``.zip``, research corpora and model shards as ``.tar``.  A 100 TB
ingest treats the ARCHIVE as the unit of parallelism — one Arrow task
per file row explodes it into member rows (exactly the WARC fan-out
shape in :mod:`.warc`), and no record-level shuffle exists until the
caller aggregates.

Both containers are parsed by hand on purpose — stdlib ``zipfile``
trusts the central directory and raises a zoo of exception types on
hostile bytes; here every malformed-input path lands on ``ValueError``
(the per-row capture class) and decompression is bounded so a
kilobyte-sized zip bomb cannot expand to gigabytes inside an executor:

- **ZIP** (APPNOTE.TXT layout): end-of-central-directory scan from the
  tail, Zip64 EOCD record + locator and 0x0001 extended-info extras
  (>65,535 members / >4 GiB offsets), central-directory walk,
  local-header offset validation, methods 0 (store), 8 (deflate, raw
  ``zlib`` wbits=-15) and 12 (bzip2), CRC-32 verified, declared sizes
  cross-checked against ``MAX_MEMBER_BYTES``.
- **gzip wrappers** (``.tar.gz``/``.tgz``/``.zip.gz``): inflated
  transparently with a 1 GiB bomb guard, then dispatched on the real
  container (the format column reports ``tar.gz``/``zip.gz``).
  The same transparent peel covers ``.lz4``/``.sz``
  (:mod:`.compression`), ``.xz``/``.bz2`` (stdlib), ``.Z`` (LZW) and
  ``.zst`` (:mod:`.zstd_codec`, RFC 8878 pure-Python decode).
- **TAR** (POSIX ustar + the long-path mechanisms real archives use:
  GNU ``L`` longname entries and pax ``x`` extended headers): 512-byte
  headers, octal size fields, header checksum verified, ``prefix``
  joining, regular files only (links, devices and directories are
  skipped as members but never error).

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); container
explosion belongs to this repo's derived ingestion tier, like the WARC
source it mirrors.
"""

from __future__ import annotations

import binascii
import bz2 as _bz2
import lzma as _lzma
import struct
import zlib

from pyspark.sql import DataFrame

from ..operators.rawavi import UnsupportedCodecError

# Hard cap on any single decompressed member (bomb guard).
MAX_MEMBER_BYTES = 256 * 1024 * 1024

_EOCD_SIG = b"PK\x05\x06"
_CDH_SIG = b"PK\x01\x02"
_LFH_SIG = b"PK\x03\x04"
_EOCD64_SIG = b"PK\x06\x06"
_EOCD64_LOC_SIG = b"PK\x06\x07"

ARCHIVE_SCHEMA = (
    "doc_id long, member_idx long, archive_format string, "
    "path string, size long, payload binary, error string"
)


# ---------------------------------------------------------------------------
# ZIP
# ---------------------------------------------------------------------------


#: LZMA-in-zip default properties (APPNOTE 5.8.8 layout): lc=3 lp=0
#: pb=2, 1 MiB dictionary — encoded as (pb*5+lp)*9+lc then dict LE32.
_ZIP_LZMA_FILTER = {"lc": 3, "lp": 0, "pb": 2, "dict_size": 1 << 20}


def _zip_lzma_compress(data: bytes) -> bytes:
    """Member body for method 14: version(2) + propsize(2) + the 5
    LZMA properties + raw LZMA1 stream with EOS (APPNOTE 5.8.5)."""
    import lzma

    c = lzma.LZMACompressor(
        format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_LZMA1, **_ZIP_LZMA_FILTER}],
    )
    body = c.compress(data) + c.flush()
    props = bytes([
        (_ZIP_LZMA_FILTER["pb"] * 5 + _ZIP_LZMA_FILTER["lp"]) * 9
        + _ZIP_LZMA_FILTER["lc"]
    ]) + struct.pack("<I", _ZIP_LZMA_FILTER["dict_size"])
    return struct.pack("<BBH", 9, 4, len(props)) + props + body


def build_zip(
    members: list[tuple[str, bytes]], *, method: str = "deflate",
    zip64: bool = False, store_paths: frozenset[str] = frozenset(),
) -> bytes:
    """Deterministic ZIP writer (fixed DOS timestamp).

    With ``zip64=True`` the central directory carries 0x0001 extended-
    info extras (sizes + offset), the classic EOCD holds sentinels, and
    the Zip64 EOCD record + locator are appended — the layout a
    >65,535-member or >4 GiB archive must use (APPNOTE 4.4.1.4),
    exercised here at small sizes so the structural path is testable.

    ``store_paths`` names members written uncompressed regardless of
    ``method`` — the ODF convention for the leading ``mimetype`` member
    (ODF 1.3 part 3 §2.2.4), which magic-based sniffers read in place.
    """
    methods = {"store": 0, "deflate": 8, "deflate64": 9, "bzip2": 12,
               "lzma": 14, "zstd": 93, "xz": 95}
    if method not in methods:
        raise ValueError(f"unsupported zip method: {method}")
    out = bytearray()
    central = bytearray()
    entries = []  # (name, crc, clen, ulen, offset, mnum, flags, ver)
    for path, data in members:
        name = path.encode("utf-8")
        crc = binascii.crc32(data) & 0xFFFFFFFF
        mnum = 0 if path in store_paths else methods[method]
        # APPNOTE 4.4.4: general-purpose bit 1 marks the LZMA EOS
        # marker, which the raw liblzma encoder always emits
        # (size-unknown mode)
        flags = 0x02 if mnum == 14 else 0
        if mnum == 8:
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            comp = c.compress(data) + c.flush()
        elif mnum == 9:
            from .deflate64 import deflate64_compress

            comp = deflate64_compress(data)
        elif mnum == 12:
            import bz2

            comp = bz2.compress(data, 9)
        elif mnum == 14:
            comp = _zip_lzma_compress(data)
        elif mnum == 93:
            from .zstd_codec import build_zst

            comp = build_zst(data, checksum=False)
        elif mnum == 95:
            import lzma

            comp = lzma.compress(data, format=lzma.FORMAT_XZ, preset=6)
        else:
            comp = data
        # APPNOTE 4.4.3.2: method 9 (Deflate64) needs extractor 2.1;
        # zip64 structures need 4.5, which dominates when present
        ver = 45 if zip64 else (21 if mnum == 9 else 20)
        entries.append((name, crc, len(comp), len(data), len(out), mnum,
                        flags, ver))
        out += _LFH_SIG
        out += struct.pack(
            "<HHHHHIII", ver, flags, mnum, 0x21, 0x548, crc,
            len(comp), len(data),
        )
        out += struct.pack("<HH", len(name), 0)
        out += name + comp
    for name, crc, clen, ulen, off, mnum, flags, ver in entries:
        central += _CDH_SIG
        if zip64:
            extra = struct.pack("<HHQQQ", 0x0001, 24, ulen, clen, off)
            central += struct.pack(
                "<HHHHHHIII", 45, 45, flags, mnum, 0x21, 0x548, crc,
                0xFFFFFFFF, 0xFFFFFFFF,
            )
            central += struct.pack(
                "<HHHHHII", len(name), len(extra), 0, 0, 0, 0, 0xFFFFFFFF
            )
            central += name + extra
        else:
            central += struct.pack(
                "<HHHHHHIII", ver, ver, flags, mnum, 0x21, 0x548, crc, clen,
                ulen,
            )
            central += struct.pack("<HHHHHII", len(name), 0, 0, 0, 0, 0, off)
            central += name
    cd_off = len(out)
    out += central
    if zip64:
        z64_off = len(out)
        out += _EOCD64_SIG
        out += struct.pack(
            "<QHHIIQQQQ", 44, 45, 45, 0, 0,
            len(members), len(members), len(central), cd_off,
        )
        out += _EOCD64_LOC_SIG
        out += struct.pack("<IQI", 0, z64_off, 1)
        out += _EOCD_SIG
        out += struct.pack(
            "<HHHHIIH", 0, 0, 0xFFFF, 0xFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0
        )
    else:
        out += _EOCD_SIG
        out += struct.pack(
            "<HHHHIIH", 0, 0, len(members), len(members), len(central), cd_off, 0
        )
    return bytes(out)


def _zip64_resolve(
    extra: bytes, ulen: int, clen: int, lfh_off: int, name: str
) -> tuple[int, int, int]:
    """Resolve 0xFFFFFFFF central-directory sentinels from the 0x0001
    Zip64 extended-info extra field (APPNOTE 4.5.3: 8-byte values in
    fixed order — uncompressed, compressed, offset — each present only
    when its classic field is the sentinel)."""
    pos = 0
    n = len(extra)
    while pos + 4 <= n:
        fid, flen = struct.unpack("<HH", extra[pos : pos + 4])
        if pos + 4 + flen > n:
            raise ValueError(f"zip: member {name!r} extra field overruns")
        if fid == 0x0001:
            body = extra[pos + 4 : pos + 4 + flen]
            off = 0
            need = 8 * (
                (ulen == 0xFFFFFFFF)
                + (clen == 0xFFFFFFFF)
                + (lfh_off == 0xFFFFFFFF)
            )
            if len(body) < need:
                raise ValueError(
                    f"zip: member {name!r} zip64 extra shorter than its "
                    "sentinel fields require"
                )
            if ulen == 0xFFFFFFFF:
                ulen = struct.unpack("<Q", body[off : off + 8])[0]
                off += 8
            if clen == 0xFFFFFFFF:
                clen = struct.unpack("<Q", body[off : off + 8])[0]
                off += 8
            if lfh_off == 0xFFFFFFFF:
                lfh_off = struct.unpack("<Q", body[off : off + 8])[0]
            return ulen, clen, lfh_off
        pos += 4 + flen
    raise ValueError(
        f"zip: member {name!r} has zip64 sentinels but no 0x0001 extra"
    )


def _zip_central_directory(data: bytes) -> tuple[int, int, int]:
    """EOCD scan + Zip64 resolution → ``(n_entries, cd_off, cd_size)``.

    Zip64: a locator immediately precedes the classic EOCD; the
    classic record then carries 0xFFFF/0xFFFFFFFF sentinels and the
    real counts live in the Zip64 EOCD record (APPNOTE 4.4.1.4).
    Without this, a >65,535-member or >4 GiB archive — which source
    dumps at corpus scale do hit — is wholly unreachable.  NO locator
    + sentinel-valued fields: taken literally (stdlib zipfile writes
    no zip64 records at EXACTLY 65,535 members)."""
    n = len(data)
    tail_start = max(0, n - 65557)  # EOCD fixed part + max comment
    eocd = data.rfind(_EOCD_SIG, tail_start)
    if eocd < 0:
        raise ValueError("zip: no end-of-central-directory record")
    if eocd + 22 > n:
        raise ValueError("zip: truncated end-of-central-directory record")
    (
        _disk,
        _cd_disk,
        _n_disk,
        n_entries,
        cd_size,
        cd_off,
        _clen,
    ) = struct.unpack("<HHHHIIH", data[eocd + 4 : eocd + 22])
    cd_limit = eocd
    if eocd >= 20 and data[eocd - 20 : eocd - 16] == _EOCD64_LOC_SIG:
        _l_disk, z64_off, _n_disks = struct.unpack(
            "<IQI", data[eocd - 16 : eocd]
        )
        if z64_off + 56 > eocd - 20 or data[z64_off : z64_off + 4] != _EOCD64_SIG:
            raise ValueError("zip: bad zip64 end-of-central-directory record")
        (
            _rec_size,
            _vm,
            _vn,
            _z_disk,
            _z_cd_disk,
            _n_disk64,
            n_entries64,
            cd_size64,
            cd_off64,
        ) = struct.unpack("<QHHIIQQQQ", data[z64_off + 4 : z64_off + 56])
        if n_entries == 0xFFFF:
            n_entries = n_entries64
        if cd_size == 0xFFFFFFFF:
            cd_size = cd_size64
        if cd_off == 0xFFFFFFFF:
            cd_off = cd_off64
        cd_limit = z64_off
    # A lying 0xFFFFFFFF cd_size/cd_off still fails this bound.
    if cd_off + cd_size > cd_limit:
        raise ValueError("zip: central directory extends past EOCD")
    return n_entries, cd_off, cd_size


def zip_member_names(data: bytes, limit: int = 65536) -> set[str]:
    """Member names from the central directory ONLY — no inflation,
    no local-header walks.  The classification router uses this to
    refine zip subtypes (office/ebook) in microseconds regardless of
    member sizes; zip64 archives resolve through the shared EOCD
    logic."""
    n_entries, cd_off, _cd_size = _zip_central_directory(data)
    names: set[str] = set()
    pos = cd_off
    for _ in range(min(n_entries, limit)):
        if pos + 46 > len(data) or data[pos : pos + 4] != _CDH_SIG:
            raise ValueError("zip: bad central-directory entry")
        name_len, extra_len, cmt_len = struct.unpack(
            "<HHH", data[pos + 28 : pos + 34]
        )
        names.add(
            data[pos + 46 : pos + 46 + name_len].decode("utf-8", "replace")
        )
        pos += 46 + name_len + extra_len + cmt_len
    return names


def parse_zip(data: bytes, cap: int = MAX_MEMBER_BYTES) -> list[dict]:
    """Parse a ZIP's central directory into member dicts.

    Returns ``[{"path", "size", "payload"}]``; raises ``ValueError`` on
    anything malformed, lying, or outside the store/deflate subset.
    """
    n = len(data)
    n_entries, cd_off, cd_size = _zip_central_directory(data)
    members = []
    pos = cd_off
    for _ in range(n_entries):
        if pos + 46 > n:
            # bounds-check BEFORE the unpacks: a truncated directory
            # must land on ValueError (per-row capture), never
            # struct.error
            raise ValueError("zip: truncated central-directory entry")
        if data[pos : pos + 4] != _CDH_SIG:
            raise ValueError("zip: bad central-directory signature")
        (
            _ver_made,
            _ver_need,
            flags,
            method,
            _t,
            _d,
            crc,
            clen,
            ulen,
        ) = struct.unpack("<HHHHHHIII", data[pos + 4 : pos + 28])
        name_len, extra_len, cmt_len, _dsk, _ia, _ea, lfh_off = struct.unpack(
            "<HHHHHII", data[pos + 28 : pos + 46]
        )
        name = data[pos + 46 : pos + 46 + name_len].decode("utf-8", "replace")
        extra = data[pos + 46 + name_len : pos + 46 + name_len + extra_len]
        pos += 46 + name_len + extra_len + cmt_len
        if pos > cd_off + cd_size:
            raise ValueError("zip: central-directory entry overruns directory")
        if flags & 0x1:
            raise ValueError("zip: encrypted members not supported")
        if 0xFFFFFFFF in (ulen, clen, lfh_off):
            # resolve BEFORE the bomb-cap check: the sentinel itself is
            # 4 GiB and would trip the guard with a misleading message
            ulen, clen, lfh_off = _zip64_resolve(extra, ulen, clen, lfh_off, name)
        if ulen > cap or clen > cap:
            raise ValueError(
                f"zip: member {name!r} declares {max(ulen, clen)} bytes, "
                f"over the {cap}-byte guard"
            )
        # local header walk (offsets may lie on hostile input)
        if lfh_off + 30 > n or data[lfh_off : lfh_off + 4] != _LFH_SIG:
            raise ValueError(f"zip: member {name!r} has a bad local header")
        lnl, lel = struct.unpack("<HH", data[lfh_off + 26 : lfh_off + 30])
        body = lfh_off + 30 + lnl + lel
        if body + clen > n:
            raise ValueError(f"zip: member {name!r} payload past end of file")
        raw = data[body : body + clen]
        if method == 0:
            if clen != ulen:
                raise ValueError(f"zip: stored member {name!r} size mismatch")
            payload = raw
        elif method == 8:
            d = zlib.decompressobj(-15)
            try:
                payload = d.decompress(raw, ulen + 1)
            except zlib.error as exc:
                raise ValueError(f"zip: corrupt deflate in {name!r}: {exc}")
            if len(payload) != ulen or d.unconsumed_tail:
                raise ValueError(
                    f"zip: member {name!r} inflates to a size other than "
                    "declared (bomb or corruption)"
                )
        elif method == 9:
            # Deflate64 (APPNOTE method 9): 64 KiB window, 16-extra-bit
            # length code 285, distance codes 30/31 — pure-Python
            # enhanced inflate (stdlib zlib cannot read it)
            from .deflate64 import inflate64

            try:
                payload = inflate64(raw, ulen + 1)
            except ValueError as exc:
                raise ValueError(
                    f"zip: corrupt deflate64 in {name!r}: {exc}"
                )
            if len(payload) != ulen:
                raise ValueError(
                    f"zip: member {name!r} inflates to a size other than "
                    "declared (bomb or corruption)"
                )
        elif method == 12:
            import bz2

            d = bz2.BZ2Decompressor()
            try:
                payload = d.decompress(raw, ulen + 1)
            except OSError as exc:  # bz2's corrupt-stream error class
                raise ValueError(f"zip: corrupt bzip2 in {name!r}: {exc}")
            if len(payload) != ulen or not d.eof:
                raise ValueError(
                    f"zip: member {name!r} inflates to a size other than "
                    "declared (bomb or corruption)"
                )
        elif method == 14:
            # APPNOTE 5.8.5: version(2) + propsize(2) precede the 5
            # LZMA properties, then the raw LZMA1 stream (EOS marker
            # when general-purpose bit 1 is set — liblzma handles both)
            import lzma

            if len(raw) < 4:
                raise ValueError(
                    f"zip: member {name!r} LZMA prelude truncated"
                )
            psize = int.from_bytes(raw[2:4], "little")
            props = raw[4 : 4 + psize]
            if psize != 5 or len(props) != 5:
                raise ValueError(
                    f"zip: member {name!r} has {psize}-byte LZMA "
                    "properties, expected 5"
                )
            if props[0] >= 225:
                raise ValueError(
                    f"zip: member {name!r} invalid LZMA properties byte"
                )
            lc, rest = props[0] % 9, props[0] // 9
            d = lzma.LZMADecompressor(
                format=lzma.FORMAT_RAW,
                filters=[{
                    "id": lzma.FILTER_LZMA1, "lc": lc, "lp": rest % 5,
                    "pb": rest // 5,
                    "dict_size": struct.unpack("<I", props[1:5])[0],
                }],
            )
            try:
                payload = d.decompress(raw[4 + psize :], ulen + 1)
            except lzma.LZMAError as exc:
                raise ValueError(f"zip: corrupt LZMA in {name!r}: {exc}")
            if len(payload) != ulen:
                raise ValueError(
                    f"zip: member {name!r} inflates to a size other than "
                    "declared (bomb or corruption)"
                )
        elif method == 93:
            from .zstd_codec import zstd_decompress

            try:
                payload = zstd_decompress(raw, ulen + 1)
            except ValueError as exc:
                raise ValueError(f"zip: corrupt zstd in {name!r}: {exc}")
            if len(payload) != ulen:
                raise ValueError(
                    f"zip: member {name!r} inflates to a size other than "
                    "declared (bomb or corruption)"
                )
        elif method == 95:
            import lzma

            d = lzma.LZMADecompressor(format=lzma.FORMAT_XZ)
            try:
                payload = d.decompress(raw, ulen + 1)
            except lzma.LZMAError as exc:
                raise ValueError(f"zip: corrupt xz in {name!r}: {exc}")
            if len(payload) != ulen:
                raise ValueError(
                    f"zip: member {name!r} inflates to a size other than "
                    "declared (bomb or corruption)"
                )
        else:
            raise ValueError(f"zip: unsupported compression method {method}")
        if name.endswith("/"):
            continue  # directory entry
        if binascii.crc32(payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"zip: member {name!r} fails CRC-32")
        members.append({"path": name, "size": len(payload), "payload": payload})
    return members


# ---------------------------------------------------------------------------
# TAR
# ---------------------------------------------------------------------------


def build_tar(members: list[tuple[str, bytes]]) -> bytes:
    """Deterministic POSIX-ustar writer (fixed mtime, root ownership)."""
    out = bytearray()
    for path, data in members:
        name = path.encode("utf-8")
        if len(name) > 100:
            raise ValueError("tar: member name over 100 bytes")
        hdr = bytearray(512)
        hdr[0 : len(name)] = name
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"
        hdr[116:124] = b"0000000\x00"
        hdr[124:136] = ("%011o" % len(data)).encode() + b"\x00"
        hdr[136:148] = b"00000000000\x00"
        hdr[148:156] = b"        "  # checksum placeholder
        hdr[156] = 0x30  # typeflag '0'
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        chk = sum(hdr)
        hdr[148:156] = ("%06o" % chk).encode() + b"\x00 "
        out += hdr + data
        pad = (-len(data)) % 512
        out += b"\x00" * pad
    out += b"\x00" * 1024
    return bytes(out)


def _tar_num(field: bytes) -> int:
    s = field.split(b"\x00", 1)[0].strip()
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError:
        raise ValueError(f"tar: non-octal numeric field {field!r}")


def _parse_pax_records(blob: bytes) -> dict[str, str]:
    """Decode pax extended-header records: ``"%d %s=%s\\n" % (len, k, v)``."""
    out: dict[str, str] = {}
    pos = 0
    n = len(blob)
    while pos < n:
        sp = blob.find(b" ", pos)
        if sp < 0:
            break
        try:
            rec_len = int(blob[pos:sp])
        except ValueError:
            raise ValueError("tar: malformed pax record length")
        if rec_len <= 0 or pos + rec_len > n:
            raise ValueError("tar: pax record overruns header")
        body = blob[sp + 1 : pos + rec_len]
        if not body.endswith(b"\n"):
            # a length lying SHORT would otherwise mis-split the record
            # and silently drop the path/size override
            raise ValueError("tar: pax record length does not end at newline")
        body = body[:-1]
        k, _, v = body.partition(b"=")
        out[k.decode("utf-8", "replace")] = v.decode("utf-8", "replace")
        pos += rec_len
    return out


def parse_tar(data: bytes, cap: int = MAX_MEMBER_BYTES) -> list[dict]:
    """Parse a tar archive into member dicts (regular files only).

    Handles the three long-path mechanisms real tars use: ustar
    ``prefix``, GNU ``L`` longname entries, and pax ``x`` extended
    headers (``path``/``size`` overrides) — without any of these a
    >100-byte path silently truncates, corrupting every deep member
    path in the archive.
    """
    members = []
    pos = 0
    n = len(data)
    pending_longname: str | None = None
    pending_pax: dict[str, str] | None = None
    while pos + 512 <= n:
        hdr = data[pos : pos + 512]
        if hdr == b"\x00" * 512:
            break  # end-of-archive marker
        stored_chk = _tar_num(hdr[148:156])
        calc = sum(hdr) - sum(hdr[148:156]) + 8 * 0x20
        if calc != stored_chk:
            raise ValueError(f"tar: header checksum mismatch at offset {pos}")
        size = _tar_num(hdr[124:136])
        if size < 0 or size > cap:
            raise ValueError(f"tar: member size {size} outside [0, {cap}]")
        name = hdr[0:100].split(b"\x00", 1)[0].decode("utf-8", "replace")
        # prefix lives at 345 in POSIX ustar ONLY ("ustar\0" magic);
        # GNU format ("ustar  \0") stores atime/ctime there — joining
        # those as a prefix would corrupt every GNU member path
        if hdr[257:263] == b"ustar\x00":
            prefix = hdr[345:500].split(b"\x00", 1)[0].decode("utf-8", "replace")
            if prefix:
                name = prefix + "/" + name
        typeflag = hdr[156:157]
        body = pos + 512
        if body + size > n:
            raise ValueError(f"tar: member {name!r} payload past end of file")
        payload = data[body : body + size]
        if typeflag == b"L":  # GNU longname: payload names the NEXT entry
            pending_longname = payload.split(b"\x00", 1)[0].decode(
                "utf-8", "replace"
            )
        elif typeflag == b"x":  # pax per-file header: overrides NEXT entry
            pending_pax = _parse_pax_records(payload)
        elif typeflag in (b"g", b"K"):
            # pax global header / GNU longlink: metadata only — must
            # not clear a pending longname (GNU emits K before L)
            pass
        elif typeflag in (b"0", b"\x00"):
            if pending_longname is not None:
                name = pending_longname
            if pending_pax is not None:
                name = pending_pax.get("path", name)
                if "size" in pending_pax:
                    try:
                        size = int(pending_pax["size"])
                    except ValueError:
                        raise ValueError("tar: non-numeric pax size record")
                    if size < 0 or size > cap or body + size > n:
                        raise ValueError(
                            f"tar: pax size for {name!r} outside the file"
                        )
                    payload = data[body : body + size]
            members.append({"path": name, "size": size, "payload": payload})
            pending_longname = None
            pending_pax = None
        else:
            # links, devices, directories, GNU longlink: not members,
            # but they consume any pending overrides
            pending_longname = None
            pending_pax = None
        pos = body + size + ((-size) % 512)
    else:
        if pos != n:
            raise ValueError("tar: trailing partial header block")
    return members


# ---------------------------------------------------------------------------
# Dispatch + Spark explosion
# ---------------------------------------------------------------------------


def sniff_format(data: bytes) -> str | None:
    """'zip' | 'tar' | '7z' | 'rar4' | 'rar5' | 'cpio' | 'iso' | None
    by container magic."""
    if data[:4] in (_LFH_SIG, _EOCD_SIG) or data[:4] == b"PK\x07\x08":
        return "zip"
    if data[:6] == b"7z\xbc\xaf\x27\x1c":
        return "7z"
    if data[:7] == b"Rar!\x1a\x07\x00" or data[:8] == b"Rar!\x1a\x07\x01\x00":
        from .rar import sniff_rar  # noqa: PLC0415

        return sniff_rar(data)
    # The ustar magic at its FIXED offset 257 outranks the cpio/iso
    # probes: cpio's magic is plain ASCII at offset 0 (a tar whose
    # first member is literally named '070701…' would sniff as cpio)
    # and the ISO probe keys on 'CD001' at 32769 (a tar CONTAINING a
    # disc image would match).  A real cpio/iso cannot carry 'ustar'
    # at 257 by accident: cpio puts the first member's name/body
    # there, iso is zero-fill in the system area.
    if len(data) >= 512 and data[257:262] == b"ustar":
        return "tar"
    if sniff_cpio(data):
        return "cpio"
    from .iso9660 import sniff_iso  # noqa: PLC0415

    if sniff_iso(data):
        return "iso"
    if len(data) >= 512:
        hdr = data[:512]
        try:
            if hdr != b"\x00" * 512 and sum(hdr) - sum(hdr[148:156]) + 8 * 0x20 == _tar_num(
                hdr[148:156]
            ):
                return "tar"
        except ValueError:
            pass
    return None


#: whole-archive gzip wrappers (.tar.gz/.tgz — source dumps' favorite
#: shape) inflate to at most this many bytes (bomb guard: a 1 KB
#: gzip bomb must not expand to gigabytes inside an executor)
MAX_ARCHIVE_BYTES = 1 << 30


def _gunzip_bounded(data: bytes, cap: int = MAX_ARCHIVE_BYTES) -> bytes:
    import gzip
    import io

    out = bytearray()
    with gzip.GzipFile(fileobj=io.BytesIO(data)) as gz:
        try:
            while True:
                chunk = gz.read(1 << 20)
                if not chunk:
                    break
                out += chunk
                if len(out) > cap:
                    raise ValueError(
                        f"archive: gzip wrapper inflates past the {cap}-byte "
                        "guard (bomb or corruption)"
                    )
        except (OSError, EOFError, zlib.error) as exc:
            # gzip's corrupt-stream classes: BadGzipFile/EOFError for
            # header/trailer damage, zlib.error for a corrupt deflate
            # body — all per-row data, never job-killing
            raise ValueError(f"archive: corrupt gzip wrapper: {exc}")
    return bytes(out)


#: xz container magic (tukaani.org/xz/xz-file-format §2.1.1.1)
_XZ_MAGIC = b"\xfd7zXZ\x00"


def _is_bzip2(blob: bytes) -> bool:
    # 'BZh' + level digit '1'-'9' + the first block's pi magic
    # (0x314159265359) — checking the block magic keeps plain text
    # starting with "BZh9" from sniffing as a wrapper
    return (
        len(blob) >= 10
        and blob[:3] == b"BZh"
        and 0x31 <= blob[3] <= 0x39
        and blob[4:10] == b"\x31\x41\x59\x26\x53\x59"
    )


def _stdlib_stream_bounded(
    data: bytes, new_decomp, label: str, cap: int = MAX_ARCHIVE_BYTES
) -> bytes:
    """Bounded multi-stream decode through a stdlib incremental
    decompressor factory (``lzma.LZMADecompressor`` /
    ``bz2.BZ2Decompressor``).  Feeds ``max_length`` chunks so a bomb
    trips the cap without ever materializing past it, and restarts the
    decompressor on stream end with ``unused_data`` — parallel
    compressors (pixz, pbzip2) emit concatenated streams."""
    out = bytearray()
    rest = data
    try:
        while rest:
            d = new_decomp()
            chunk = rest
            while not d.eof:
                piece = d.decompress(chunk, max_length=1 << 20)
                chunk = b""
                out += piece
                if len(out) > cap:
                    raise ValueError(
                        f"archive: {label} wrapper inflates past the "
                        f"{cap}-byte guard (bomb or corruption)"
                    )
                if not piece and d.needs_input:
                    # input exhausted mid-stream: truncated wrapper
                    raise ValueError(
                        f"archive: truncated {label} wrapper stream"
                    )
            rest = d.unused_data
            if rest and not rest.lstrip(b"\x00"):
                break  # trailing null padding after the last stream
    except (OSError, EOFError, _lzma.LZMAError) as exc:
        # the stdlib corrupt-stream classes — per-row data, never
        # job-killing
        raise ValueError(f"archive: corrupt {label} wrapper: {exc}")
    return bytes(out)


def _unxz_bounded(data: bytes, cap: int = MAX_ARCHIVE_BYTES) -> bytes:
    return _stdlib_stream_bounded(
        data,
        lambda: _lzma.LZMADecompressor(format=_lzma.FORMAT_XZ),
        "xz",
        cap,
    )


def _bunzip2_bounded(data: bytes, cap: int = MAX_ARCHIVE_BYTES) -> bytes:
    return _stdlib_stream_bounded(data, _bz2.BZ2Decompressor, "bzip2", cap)


def parse_archive(data: bytes, fmt: str = "auto") -> tuple[str, list[dict]]:
    # transparent compression wrappers (.tar.gz/.tgz, .tar.lz4,
    # .tar.sz, .tar.xz, .tar.bz2): inflate bounded, then dispatch on
    # the real container.
    # Nesting is bounded at TWO layers — nobody double-wraps archives
    # legitimately, and unbounded peeling would let a nested bomb
    # recurse to RecursionError (which escapes per-row capture)
    from .compression import (  # noqa: PLC0415
        LZ4_FRAME_MAGIC,
        SNAPPY_STREAM_MAGIC,
        Z_MAGIC,
        lz4_decompress,
        snappy_stream_decompress,
        z_decompress,
    )
    from .zstd_codec import sniff_zstd, zstd_decompress  # noqa: PLC0415

    def _wrapper(blob: bytes) -> str | None:
        if blob[:2] == b"\x1f\x8b":
            return ".gz"
        if blob[:4] == LZ4_FRAME_MAGIC:
            return ".lz4"
        if blob.startswith(SNAPPY_STREAM_MAGIC):
            return ".sz"
        if blob[:6] == _XZ_MAGIC:
            return ".xz"
        if _is_bzip2(blob):
            return ".bz2"
        if blob[:2] == Z_MAGIC:
            return ".Z"
        if sniff_zstd(blob):
            return ".zst"
        return None

    suffix = ""
    for _ in range(2):
        w = _wrapper(data) if fmt == "auto" else None
        if w == ".gz":
            data = _gunzip_bounded(data)
        elif w == ".lz4":
            data = lz4_decompress(data, cap=MAX_ARCHIVE_BYTES)
        elif w == ".sz":
            data = snappy_stream_decompress(data, cap=MAX_ARCHIVE_BYTES)
        elif w == ".xz":
            data = _unxz_bounded(data)
        elif w == ".bz2":
            data = _bunzip2_bounded(data)
        elif w == ".Z":
            data = z_decompress(data, cap=MAX_ARCHIVE_BYTES)
        elif w == ".zst":
            data = zstd_decompress(data, cap=MAX_ARCHIVE_BYTES)
        else:
            break
        # extension chains read innermost-first (file.tar.lz4.gz = tar,
        # then lz4, then gzip), i.e. REVERSED peel order — prepend
        suffix = w + suffix
    if fmt == "auto" and _wrapper(data) is not None:
        raise ValueError(
            "archive: more than two nested compression layers (bomb)"
        )
    if suffix:
        inner_fmt, members = parse_archive(data, "auto")
        return inner_fmt + suffix, members
    if fmt == "auto":
        sniffed = sniff_format(data)
        if sniffed is None:
            raise ValueError(
                "archive: payload is not zip, ustar tar, 7z, rar, "
                "cpio, or iso"
            )
        fmt = sniffed
    if fmt == "zip":
        return "zip", parse_zip(data)
    if fmt == "tar":
        return "tar", parse_tar(data)
    if fmt == "7z":
        from .sevenzip import parse_7z  # noqa: PLC0415

        return "7z", parse_7z(data)
    if fmt in ("rar4", "rar5"):
        from .rar import parse_rar_members  # noqa: PLC0415

        return parse_rar_members(data)
    if fmt == "cpio":
        return "cpio", parse_cpio(data)
    if fmt == "iso":
        from .iso9660 import parse_iso  # noqa: PLC0415

        return "iso", parse_iso(data)
    raise ValueError(f"archive: unknown format {fmt!r}")


def archive_members(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fmt: str = "auto",
) -> DataFrame:
    """Explode archive payloads into one row per member file.

    One Arrow task per archive row (the WARC fan-out shape).  A corrupt
    archive yields a single row carrying the error; clean archives emit
    ``(id, member_idx, archive_format, path, size, payload)`` rows.
    """

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = {
                k: []
                for k in (
                    "doc_id",
                    "member_idx",
                    "archive_format",
                    "path",
                    "size",
                    "payload",
                    "error",
                )
            }

            def emit(did, idx=None, afmt=None, m=None, err=None):
                out["doc_id"].append(did)
                out["member_idx"].append(idx)
                out["archive_format"].append(afmt)
                out["path"].append(m["path"] if m else None)
                out["size"].append(m["size"] if m else None)
                out["payload"].append(m["payload"] if m else None)
                out["error"].append(err)

            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    emit(did, err="ValueError: null archive payload")
                    continue
                try:
                    afmt, members = parse_archive(bytes(payload), fmt)
                except (ValueError, UnsupportedCodecError) as exc:
                    # UnsupportedCodecError (a recognized 7z whose
                    # coder chain is out of scope) is per-row data; a
                    # PLAIN NotImplementedError stays loud by design —
                    # it means a whole mime tier is missing
                    emit(did, err=f"{type(exc).__name__}: {str(exc)[:200]}")
                    continue
                for idx, m in enumerate(members):
                    emit(did, idx, afmt, m)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, ARCHIVE_SCHEMA)


# ---------------------------------------------------------------------------
# cpio — newc (SVR4, "070701"/"070702") and odc (POSIX, "070707")
# ---------------------------------------------------------------------------

_CPIO_NEWC = (b"070701", b"070702")
_CPIO_ODC = b"070707"


def _cpio_hex(field: bytes, what: str) -> int:
    try:
        return int(field, 16)
    except ValueError:
        raise ValueError(f"cpio: non-hex {what} field {field!r}")


def _cpio_oct(field: bytes, what: str) -> int:
    try:
        return int(field, 8)
    except ValueError:
        raise ValueError(f"cpio: non-octal {what} field {field!r}")


def parse_cpio(data: bytes, cap: int = MAX_MEMBER_BYTES) -> list[dict]:
    """Parse a cpio archive (newc 110-byte hex headers with 4-byte
    alignment, or odc 76-byte octal headers) into member dicts —
    the initramfs / RPM-payload container.  Regular files only
    (directories and specials skipped); ends at ``TRAILER!!!``."""
    members = []
    pos = 0
    total = 0
    while True:
        if pos + 6 > len(data):
            raise ValueError("cpio: archive ends without its trailer")
        magic = data[pos : pos + 6]
        if magic in _CPIO_NEWC:
            if pos + 110 > len(data):
                raise ValueError("cpio: truncated newc header")
            f = [
                _cpio_hex(data[pos + 6 + 8 * i : pos + 14 + 8 * i], "newc")
                for i in range(13)
            ]
            mode, filesize, namesize = f[1], f[6], f[11]
            name_at = pos + 110
            if name_at + namesize > len(data):
                raise ValueError("cpio: member name past end of archive")
            name = data[name_at : name_at + namesize - 1].decode(
                "utf-8", "replace"
            )
            body_at = (name_at + namesize + 3) & ~3
            nxt = (body_at + filesize + 3) & ~3
        elif magic == _CPIO_ODC:
            if pos + 76 > len(data):
                raise ValueError("cpio: truncated odc header")
            h = data[pos : pos + 76]
            mode = _cpio_oct(h[18:24], "mode")
            namesize = _cpio_oct(h[59:65], "namesize")
            filesize = _cpio_oct(h[65:76], "filesize")
            name_at = pos + 76
            if name_at + namesize > len(data):
                raise ValueError("cpio: member name past end of archive")
            name = data[name_at : name_at + namesize - 1].decode(
                "utf-8", "replace"
            )
            body_at = name_at + namesize
            nxt = body_at + filesize
        else:
            raise ValueError(f"cpio: bad entry magic {magic!r}")
        if name == "TRAILER!!!":
            return members
        if filesize > cap:
            raise ValueError(
                f"cpio: member {name!r} of {filesize} bytes past the "
                f"{cap}-byte guard"
            )
        if body_at + filesize > len(data):
            raise ValueError("cpio: member body past end of archive")
        total += filesize
        if total > MAX_ARCHIVE_BYTES:
            raise ValueError("cpio: archive inflates past the total guard")
        if len(members) >= 1_000_000:
            raise ValueError("cpio: member count over the cap")
        if (mode & 0o170000) == 0o100000:  # regular files only
            members.append(
                {
                    "path": name,
                    "size": filesize,
                    "payload": data[body_at : body_at + filesize],
                }
            )
        pos = nxt


def sniff_cpio(data: bytes) -> bool:
    # Magic alone is weak (plain ASCII at offset 0 — any text starting
    # '070701' would match); require the whole fixed-width header to be
    # the right digit class: newc = 13 × 8 hex chars, odc = 8 octal
    # fields (66 chars).
    if data[:6] in _CPIO_NEWC:
        hdr = data[6:110]
        return len(hdr) == 104 and all(
            0x30 <= c <= 0x39 or 0x41 <= c <= 0x46 or 0x61 <= c <= 0x66
            for c in hdr
        )
    if data[:6] == _CPIO_ODC:
        hdr = data[6:76]
        return len(hdr) == 70 and all(0x30 <= c <= 0x37 for c in hdr)
    return False


def build_cpio(
    members: list[tuple[str, bytes]], *, fmt: str = "newc"
) -> bytes:
    """Deterministic cpio writer (fixed mtime/uid, regular files).
    Interop-pinned: the system bsdtar reads this output back."""
    out = bytearray()
    for i, (path, body) in enumerate(members):
        name = path.encode() + b"\x00"
        if fmt == "newc":
            fields = [
                i + 1, 0o100644, 0, 0, 1, 0, len(body), 0, 0, 0, 0,
                len(name), 0,
            ]
            out += b"070701" + b"".join(b"%08X" % v for v in fields)
            out += name
            out += b"\x00" * (-(110 + len(name)) % 4)
            out += body
            out += b"\x00" * (-len(body) % 4)
        elif fmt == "odc":
            out += b"070707"
            out += b"%06o%06o%06o%06o%06o%06o%06o%011o%06o%011o" % (
                0, i + 1, 0o100644, 0, 0, 1, 0, 0, len(name), len(body)
            )
            out += name + body
        else:
            raise ValueError(f"cpio fixture: unknown format {fmt!r}")
    trailer = b"TRAILER!!!\x00"
    if fmt == "newc":
        fields = [0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, len(trailer), 0]
        out += b"070701" + b"".join(b"%08X" % v for v in fields)
        out += trailer
        out += b"\x00" * (-(110 + len(trailer)) % 4)
    else:
        out += b"070707"
        out += b"%06o%06o%06o%06o%06o%06o%06o%011o%06o%011o" % (
            0, 0, 0, 0, 0, 1, 0, 0, len(trailer), 0
        )
        out += trailer
    return bytes(out)
