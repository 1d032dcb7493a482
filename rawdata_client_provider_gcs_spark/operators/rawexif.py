"""EXIF metadata extraction (JPEG APP1 / TIFF IFD0) — CIPA DC-008.

EXIF is a TIFF-structured block, so this module is a thin layer over
the verified IFD machinery in :mod:`.rawtiff`: find the ``Exif\\0\\0``
APP1 segment in a JPEG (or use a TIFF's own IFD0), then read the tags
a curation pipeline consumes:

- **Orientation** (tag 0x0112) — images with orientation 5-8 are
  rotated 90°, and a feature/thumbnail pipeline that ignores it trains
  on sideways images;
- **DateTime / DateTimeOriginal** (0x0132, Exif-IFD 0x9003) — temporal
  dedup and provenance;
- **Make / Model / Software** (0x010F/0x0110/0x0131) — source-device
  stratification and synthetic-image screening;
- **GPS presence + coordinates** (IFD pointer 0x8825; lat/lon as
  degree-minute-second rationals with N/S/E/W refs) — embedded
  geolocation is PII: the ``has_gps`` flag feeds the same curation
  tier as the text PII scrubbers, and coordinates are decoded so a
  pipeline can round/strip them.

Hostile structure lands on ``ValueError`` (rawtiff's bounds checks);
a JPEG without EXIF returns an empty dict — absence is data, not an
error.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); metadata
extraction belongs to this repo's derived multimodal tier.
"""

from __future__ import annotations

import struct

from . import rawtiff

_IFD0_TAGS = {
    0x010F: "make",
    0x0110: "model",
    0x0112: "orientation",
    0x0131: "software",
    0x0132: "datetime",
}


def _ascii(vals) -> str:
    return bytes(v for v in vals if v).decode("ascii", "replace").strip()


def find_exif_block(jpeg: bytes) -> bytes | None:
    """The TIFF-structured body of the first ``Exif\\0\\0`` APP1
    segment, or None (marker walk mirrors rawjpeg's segment grammar)."""
    if jpeg[:2] != b"\xff\xd8":
        return None
    pos = 2
    n = len(jpeg)
    while pos + 4 <= n:
        if jpeg[pos] != 0xFF:
            return None  # marker desync: treat as no EXIF
        marker = jpeg[pos + 1]
        if marker == 0xFF:  # legal fill byte before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS: entropy data follows
            return None
        (seg_len,) = struct.unpack_from(">H", jpeg, pos + 2)
        if seg_len < 2 or pos + 2 + seg_len > n:
            return None
        if marker == 0xE1 and jpeg[pos + 4 : pos + 10] == b"Exif\x00\x00":
            return jpeg[pos + 10 : pos + 2 + seg_len]
        pos += 2 + seg_len
    return None


def _ifd_pointer(entry) -> int | None:
    """A sub-IFD pointer must be an integer type (LONG/SHORT/LONG8);
    a hostile RATIONAL declaration yields floats that would TypeError
    inside struct — malformed data → ValueError per-row."""
    if entry is None or not entry[1]:
        return None
    v = entry[1][0]
    if not isinstance(v, int):
        raise ValueError("exif: IFD pointer declared as a non-integer type")
    return v


def _parse_tiff_exif(block: bytes) -> dict:
    bo, big, ifd_off = rawtiff._header(block)
    e, _ = rawtiff._read_ifd_at(block, bo, ifd_off, big)
    out: dict = {}
    for tag, key in _IFD0_TAGS.items():
        got = e.get(tag)
        if got is None:
            continue
        typ, vals = got
        if typ == 2:
            out[key] = _ascii(vals)
        elif vals:
            out[key] = vals[0]
    exif_ptr = _ifd_pointer(e.get(0x8769))
    if exif_ptr is not None:
        sub, _ = rawtiff._read_ifd_at(block, bo, exif_ptr, big)
        dto = sub.get(0x9003)
        if dto is not None and dto[0] == 2:
            out["datetime_original"] = _ascii(dto[1])
    gps_ptr = _ifd_pointer(e.get(0x8825))
    out["has_gps"] = False
    if gps_ptr is not None:
        gps, _ = rawtiff._read_ifd_at(block, bo, gps_ptr, big)
        lat, lon = gps.get(0x0002), gps.get(0x0004)
        lat_ref, lon_ref = gps.get(0x0001), gps.get(0x0003)
        if lat and lon and len(lat[1]) == 3 and len(lon[1]) == 3:
            out["has_gps"] = True
            d, m, s = lat[1]
            latitude = d + m / 60 + s / 3600
            if lat_ref and _ascii(lat_ref[1]).upper() == "S":
                latitude = -latitude
            d, m, s = lon[1]
            longitude = d + m / 60 + s / 3600
            if lon_ref and _ascii(lon_ref[1]).upper() == "W":
                longitude = -longitude
            out["gps_lat"] = latitude
            out["gps_lon"] = longitude
        elif gps:
            out["has_gps"] = True  # GPS IFD present, coords incomplete
    return out


def exif_meta(payload: bytes) -> dict:
    """EXIF fields from a JPEG (APP1) or TIFF (IFD0) payload.

    Empty dict (plus ``has_gps=False``) when no EXIF exists; hostile
    EXIF structure raises ``ValueError`` for per-row capture.
    """
    if payload[:2] == b"\xff\xd8":
        block = find_exif_block(payload)
        if block is None:
            return {"has_gps": False}
        return _parse_tiff_exif(block)
    if rawtiff.sniff_tiff(payload):
        return _parse_tiff_exif(payload)
    return {"has_gps": False}


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------


def _ifd_entry(tag: int, typ: int, vals, data_area: bytearray, base: int) -> bytes:
    if typ == 2:
        raw = vals.encode("ascii") + b"\x00"
        n = len(raw)
    elif typ == 3:
        raw = b"".join(struct.pack("<H", v) for v in vals)
        n = len(vals)
    elif typ == 4:
        raw = b"".join(struct.pack("<I", v) for v in vals)
        n = len(vals)
    elif typ == 5:
        raw = b"".join(struct.pack("<II", a, b) for a, b in vals)
        n = len(vals)
    else:
        raise ValueError(f"fixture: type {typ}")
    ent = struct.pack("<HHI", tag, typ, n)
    if len(raw) <= 4:
        ent += raw.ljust(4, b"\x00")
    else:
        ent += struct.pack("<I", base + len(data_area))
        data_area += raw
    return ent


def build_exif_tiff(
    *,
    orientation: int = 1,
    make: str = "FixtureCam",
    model: str = "FX-1",
    datetime_str: str = "2020:01:02 03:04:05",
    gps: tuple[float, float] | None = None,
) -> bytes:
    """The little-endian TIFF EXIF block alone (IFD0 [+ GPS IFD]) —
    the payload format shared by JPEG APP1 and the HEIF Exif item."""
    # lay out: header(8) | IFD0 | [GPS IFD] | data area
    entries0 = [
        (0x010F, 2, make),
        (0x0110, 2, model),
        (0x0112, 3, [orientation]),
        (0x0132, 2, datetime_str),
    ]
    n0 = len(entries0) + (1 if gps is not None else 0)
    ifd0_size = 2 + 12 * n0 + 4
    gps_off = 8 + ifd0_size
    gps_entries = []
    gps_size = 0
    if gps is not None:
        lat, lon = gps

        def dms(v):
            v = abs(v)
            d = int(v)
            m = int((v - d) * 60)
            s = (v - d - m / 60) * 3600
            return [(d, 1), (m, 1), (int(round(s * 1000)), 1000)]

        gps_entries = [
            (0x0001, 2, "N" if lat >= 0 else "S"),
            (0x0002, 5, dms(lat)),
            (0x0003, 2, "E" if lon >= 0 else "W"),
            (0x0004, 5, dms(lon)),
        ]
        gps_size = 2 + 12 * len(gps_entries) + 4
    data_base = gps_off + gps_size
    data = bytearray()
    ifd0 = struct.pack("<H", n0)
    for tag, typ, vals in entries0:
        ifd0 += _ifd_entry(tag, typ, vals, data, data_base)
    if gps is not None:
        ifd0 += _ifd_entry(0x8825, 4, [gps_off], data, data_base)
    ifd0 += struct.pack("<I", 0)
    block = b"II*\x00" + struct.pack("<I", 8) + ifd0
    if gps is not None:
        gifd = struct.pack("<H", len(gps_entries))
        for tag, typ, vals in gps_entries:
            gifd += _ifd_entry(tag, typ, vals, data, data_base)
        gifd += struct.pack("<I", 0)
        block += gifd
    block += bytes(data)
    return block


def build_exif_jpeg(**kwargs) -> bytes:
    """A minimal JPEG (SOI + APP1 Exif + EOI; no scan data — metadata
    fixtures never decode pixels) wrapping :func:`build_exif_tiff`."""
    app1 = b"Exif\x00\x00" + build_exif_tiff(**kwargs)
    seg = b"\xff\xe1" + struct.pack(">H", 2 + len(app1)) + app1
    return b"\xff\xd8" + seg + b"\xff\xd9"
