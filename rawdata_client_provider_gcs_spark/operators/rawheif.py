"""HEIF / AVIF still-image container metadata — ISO/IEC 23008-12.

HEIC (HEVC-in-HEIF) and AVIF (AV1-in-HEIF) are the web's modern image
containers; a crawl ships them by the million.  The item-based ``meta``
box structure is exact, small, and table-free, so this module walks it
for everything a curation pipeline needs — dimensions, codec, bit
depth, alpha/Exif presence, rotation — while the actual AV1/HEVC
payload decode stays the documented loud boundary
(:func:`decode_heif_pixels` raises
:class:`~.rawavi.UnsupportedCodecError`; crawl rows capture per-row).

Parsed boxes (all inside ``meta``): ``hdlr`` (must be ``pict``),
``pitm`` (primary item, version 0 and 1), ``iinf``/``infe`` (item ids,
types — ``av01``/``hvc1``/``grid``/``Exif``/``mime``), ``iprp`` →
``ipco`` (the 1-indexed property pool: ``ispe`` dimensions, ``pixi``
channel depths, ``irot`` rotation, ``imir`` mirror, ``auxC`` auxiliary
type) + ``ipma`` (item→property associations, 7- and 15-bit index
forms), ``iref`` (``auxl``/``thmb``/``cdsc``/``dimg`` single-item
reference boxes, version 0 and 1), and ``iloc`` (per-item extent byte
totals, versions 0/1/2).  Box iteration reuses the hostile-input-capped
ISO-BMFF walker from :mod:`.rawmp4` (lying sizes, 64-bit sizes,
truncation, depth/count caps all land on ``ValueError``).

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); media
handling belongs to this repo's derived multimodal tier.
"""

from __future__ import annotations

from .rawavi import UnsupportedCodecError
from .rawmp4 import _MAX_BOXES, _walk

#: brands that mark an ISO-BMFF payload as a HEIF-family still image
#: (or image sequence); used by sniff + format classification
_HEIF_BRANDS = {
    b"avif", b"avis", b"heic", b"heix", b"heim", b"heis",
    b"hevc", b"hevx", b"mif1", b"msf1",
}


def sniff_heif(data: bytes) -> bool:
    """True when the payload is ISO-BMFF with a HEIF-family brand."""
    if len(data) < 16 or data[4:8] != b"ftyp":
        return False
    size = int.from_bytes(data[:4], "big")
    end = min(size if 16 <= size <= len(data) else len(data), len(data))
    if data[8:12] in _HEIF_BRANDS:
        return True
    return any(
        data[p : p + 4] in _HEIF_BRANDS for p in range(16, end - 3, 4)
    )


def _cstring(data: bytes, pos: int, end: int) -> tuple[str, int]:
    nul = data.find(b"\x00", pos, end)
    if nul < 0:
        nul = end
    return data[pos:nul].decode("latin-1", "replace"), nul + 1


def _parse_iinf(data: bytes, body: int, box_end: int, budget: list[int]):
    """item_id -> item_type fourcc (and optional content_type for mime)."""
    if box_end - body < 6:
        raise ValueError("heif: iinf box shorter than its fields")
    ver = data[body]
    n_off = body + 4
    if ver == 0:
        count = int.from_bytes(data[n_off : n_off + 2], "big")
        pos = n_off + 2
    else:
        count = int.from_bytes(data[n_off : n_off + 4], "big")
        pos = n_off + 4
    items: dict[int, dict] = {}
    seen = 0
    for fourcc, b, e in _walk(data, pos, box_end, budget):
        if fourcc != b"infe":
            continue
        seen += 1
        if e - b < 8:
            raise ValueError("heif: infe box shorter than its fields")
        iver = data[b]
        if iver < 2:
            raise ValueError(f"heif: infe version {iver} predates item types")
        p = b + 4
        if iver == 2:
            item_id = int.from_bytes(data[p : p + 2], "big")
            p += 2
        else:
            item_id = int.from_bytes(data[p : p + 4], "big")
            p += 4
        p += 2  # item_protection_index
        if p + 4 > e:
            raise ValueError("heif: infe truncated before item_type")
        item_type = data[p : p + 4].decode("latin-1", "replace")
        p += 4
        _, p = _cstring(data, p, e)  # item_name
        info = {"type": item_type}
        if item_type == "mime" and p < e:
            info["content_type"], p = _cstring(data, p, e)
        items[item_id] = info
    if seen != count:
        raise ValueError(
            f"heif: iinf declares {count} items but carries {seen}"
        )
    return items


def _parse_ipco(data: bytes, body: int, box_end: int, budget: list[int]):
    """The 1-indexed property pool: list of (fourcc, parsed-or-None)."""
    props: list[tuple[str, dict | None]] = []
    for fourcc, b, e in _walk(data, body, box_end, budget):
        if fourcc == b"ispe":
            if e - b < 12:
                raise ValueError("heif: ispe box shorter than its fields")
            props.append((
                "ispe",
                {
                    "width": int.from_bytes(data[b + 4 : b + 8], "big"),
                    "height": int.from_bytes(data[b + 8 : b + 12], "big"),
                },
            ))
        elif fourcc == b"pixi":
            if e - b < 5:
                raise ValueError("heif: pixi box shorter than its fields")
            n = data[b + 4]
            if b + 5 + n > e:
                raise ValueError("heif: pixi channel list truncated")
            props.append((
                "pixi",
                {"bits": list(data[b + 5 : b + 5 + n])},
            ))
        elif fourcc == b"irot":
            if e - b < 1:
                raise ValueError("heif: irot box shorter than its fields")
            props.append(("irot", {"angle": (data[b] & 3) * 90}))
        elif fourcc == b"imir":
            if e - b < 1:
                raise ValueError("heif: imir box shorter than its fields")
            props.append(("imir", {"axis": data[b] & 1}))
        elif fourcc == b"auxC":
            aux, _ = _cstring(data, b + 4, e)
            props.append(("auxC", {"aux_type": aux}))
        elif fourcc in (b"av1C", b"hvcC"):
            # keep the record: its sequence header carries the
            # codec-AUTHORITATIVE dimensions (ispe can lie)
            props.append((
                fourcc.decode("latin-1"), {"record": data[b:e]}
            ))
        else:  # colr, clap, ... — presence only
            props.append((fourcc.decode("latin-1", "replace"), None))
    return props


def _parse_ipma(data: bytes, body: int, box_end: int):
    """item_id -> [property index] (1-indexed into the ipco pool)."""
    if box_end - body < 8:
        raise ValueError("heif: ipma box shorter than its fields")
    ver = data[body]
    flags = int.from_bytes(data[body + 1 : body + 4], "big")
    count = int.from_bytes(data[body + 4 : body + 8], "big")
    if count > _MAX_BOXES:
        raise ValueError("heif: ipma entry count over the hostile-input cap")
    pos = body + 8
    assoc: dict[int, list[int]] = {}
    wide = bool(flags & 1)
    for _ in range(count):
        if ver < 1:
            if pos + 3 > box_end:
                raise ValueError("heif: ipma entry truncated")
            item_id = int.from_bytes(data[pos : pos + 2], "big")
            pos += 2
        else:
            if pos + 5 > box_end:
                raise ValueError("heif: ipma entry truncated")
            item_id = int.from_bytes(data[pos : pos + 4], "big")
            pos += 4
        n = data[pos]
        pos += 1
        idxs = []
        for _ in range(n):
            if wide:
                if pos + 2 > box_end:
                    raise ValueError("heif: ipma association truncated")
                raw = int.from_bytes(data[pos : pos + 2], "big")
                idxs.append(raw & 0x7FFF)
                pos += 2
            else:
                if pos + 1 > box_end:
                    raise ValueError("heif: ipma association truncated")
                idxs.append(data[pos] & 0x7F)
                pos += 1
        assoc[item_id] = idxs
    return assoc


def _parse_iref(data: bytes, body: int, box_end: int, budget: list[int]):
    """List of (ref_type, from_item, [to_items])."""
    if box_end - body < 4:
        raise ValueError("heif: iref box shorter than its fields")
    ver = data[body]
    idw = 2 if ver == 0 else 4
    refs: list[tuple[str, int, list[int]]] = []
    for fourcc, b, e in _walk(data, body + 4, box_end, budget):
        if e - b < idw + 2:
            raise ValueError("heif: item reference box truncated")
        from_id = int.from_bytes(data[b : b + idw], "big")
        n = int.from_bytes(data[b + idw : b + idw + 2], "big")
        p = b + idw + 2
        if p + n * idw > e:
            raise ValueError("heif: item reference list truncated")
        to_ids = [
            int.from_bytes(data[p + i * idw : p + (i + 1) * idw], "big")
            for i in range(n)
        ]
        refs.append((fourcc.decode("latin-1", "replace"), from_id, to_ids))
    return refs


def _parse_iloc(data: bytes, body: int, box_end: int):
    """item_id -> {"size": total extent bytes, "extents": [(off, len)]}
    (absolute file offsets; construction methods other than file-offset
    yield size accounting but empty extents)."""
    if box_end - body < 8:
        raise ValueError("heif: iloc box shorter than its fields")
    ver = data[body]
    if ver > 2:
        raise ValueError(f"heif: iloc unknown version {ver}")
    sizes = data[body + 4 : body + 6]
    offset_size = sizes[0] >> 4
    length_size = sizes[0] & 0xF
    base_offset_size = sizes[1] >> 4
    index_size = (sizes[1] & 0xF) if ver in (1, 2) else 0
    for nm, v in (("offset", offset_size), ("length", length_size),
                  ("base offset", base_offset_size), ("index", index_size)):
        if v not in (0, 4, 8):
            raise ValueError(f"heif: iloc {nm} size {v} not in 0/4/8")
    pos = body + 6
    if ver < 2:
        count = int.from_bytes(data[pos : pos + 2], "big")
        pos += 2
    else:
        count = int.from_bytes(data[pos : pos + 4], "big")
        pos += 4
    if count > _MAX_BOXES:
        raise ValueError("heif: iloc item count over the hostile-input cap")
    out: dict[int, dict] = {}
    for _ in range(count):
        idw = 2 if ver < 2 else 4
        if pos + idw > box_end:
            raise ValueError("heif: iloc item truncated")
        item_id = int.from_bytes(data[pos : pos + idw], "big")
        pos += idw
        method = 0
        if ver in (1, 2):
            method = int.from_bytes(data[pos : pos + 2], "big") & 0xF
            pos += 2  # reserved + construction_method
        pos += 2  # data_reference_index
        base = int.from_bytes(data[pos : pos + base_offset_size], "big")
        pos += base_offset_size
        if pos + 2 > box_end:
            raise ValueError("heif: iloc item truncated")
        n_ext = int.from_bytes(data[pos : pos + 2], "big")
        pos += 2
        total = 0
        extents: list[tuple[int, int]] = []
        ext = index_size + offset_size + length_size
        for _ in range(n_ext):
            if pos + ext > box_end:
                raise ValueError("heif: iloc extent truncated")
            off_at = pos + index_size
            off = int.from_bytes(data[off_at : off_at + offset_size], "big")
            ln_off = pos + index_size + offset_size
            ln = int.from_bytes(data[ln_off : ln_off + length_size], "big")
            total += ln
            if method == 0:  # file-offset construction only
                extents.append((base + off, ln))
            pos += ext
        out[item_id] = {"size": total, "extents": extents}
    return out


def parse_heif(data: bytes) -> dict:
    """Still-image metadata for a HEIF/AVIF payload.

    Returns ``major_brand``, ``brands``, ``format`` (``avif``/``heic``/
    ``heif``, with ``-sequence`` for avis/msf1), ``primary_item_id``,
    ``n_items``, ``codec`` (the primary item's type), ``width``/
    ``height``, ``rotation_deg``, ``mirrored``, ``channels``/
    ``bit_depth`` (pixi), ``has_alpha``, ``has_exif``,
    ``has_thumbnail``, ``n_tiles`` (``dimg`` refs of a ``grid``
    primary, else 0), and ``primary_size`` (iloc extent bytes).
    """
    if not sniff_heif(data):
        raise ValueError("heif: payload lacks a HEIF-family ftyp brand")
    budget = [_MAX_BOXES]
    meta: dict = {"brands": []}
    items: dict[int, dict] = {}
    props: list[tuple[str, dict | None]] = []
    assoc: dict[int, list[int]] = {}
    refs: list[tuple[str, int, list[int]]] = []
    iloc: dict[int, int] = {}
    primary = None
    saw_meta = False

    for fourcc, body, box_end in _walk(data, 0, len(data), budget):
        if fourcc == b"ftyp":
            meta["major_brand"] = data[body : body + 4].decode(
                "latin-1", "replace"
            )
            meta["brands"] = [
                data[p : p + 4].decode("latin-1", "replace")
                for p in range(body + 8, box_end, 4)
            ]
        elif fourcc == b"meta":
            saw_meta = True
            if box_end - body < 4:
                raise ValueError("heif: meta box shorter than its fields")
            for mcc, mb, me in _walk(data, body + 4, box_end, budget):
                if mcc == b"hdlr":
                    if me - mb < 12:
                        raise ValueError(
                            "heif: hdlr box shorter than its fields"
                        )
                    meta["handler"] = data[mb + 8 : mb + 12].decode(
                        "latin-1", "replace"
                    )
                elif mcc == b"pitm":
                    if me - mb < 4:
                        raise ValueError(
                            "heif: pitm box shorter than its fields"
                        )
                    ver = data[mb]
                    idw = 2 if ver == 0 else 4
                    if me - mb < 4 + idw:
                        raise ValueError(
                            "heif: pitm box shorter than its fields"
                        )
                    primary = int.from_bytes(data[mb + 4 : mb + 4 + idw], "big")
                elif mcc == b"iinf":
                    items = _parse_iinf(data, mb, me, budget)
                elif mcc == b"iprp":
                    for pcc, pb, pe in _walk(data, mb, me, budget):
                        if pcc == b"ipco":
                            props = _parse_ipco(data, pb, pe, budget)
                        elif pcc == b"ipma":
                            assoc = _parse_ipma(data, pb, pe)
                elif mcc == b"iref":
                    refs = _parse_iref(data, mb, me, budget)
                elif mcc == b"iloc":
                    iloc = _parse_iloc(data, mb, me)
    if not saw_meta:
        raise ValueError("heif: no meta box")
    if primary is None:
        raise ValueError("heif: no pitm (primary item) box")
    if primary not in items:
        raise ValueError(f"heif: primary item {primary} missing from iinf")

    brands = set(meta["brands"]) | {meta.get("major_brand", "")}
    if brands & {"avis"}:
        fmt = "avif-sequence"
    elif brands & {"avif"}:
        fmt = "avif"
    elif brands & {"msf1", "hevc", "hevx"} and not brands & {"heic", "heix"}:
        # msf1 (MIAF sequence) and hevc/hevx (HEVC image-sequence
        # brands, ISO 23008-12 §B.3) all declare a sequence, not a still
        fmt = "heic-sequence"
    elif brands & {"heic", "heix", "heim", "heis"}:
        fmt = "heic"
    else:
        fmt = "heif"
    meta["format"] = fmt
    meta["primary_item_id"] = primary
    meta["n_items"] = len(items)
    meta["codec"] = items[primary]["type"]

    # resolve the primary item's properties through ipma → ipco
    width = height = 0
    rotation = 0
    mirrored = False
    channels = 0
    bit_depth = 0
    for idx in assoc.get(primary, []):
        if idx == 0:
            continue
        if idx > len(props):
            raise ValueError(
                f"heif: ipma property index {idx} outside the ipco pool"
            )
        name, val = props[idx - 1]
        if name == "ispe" and val:
            width, height = val["width"], val["height"]
        elif name == "irot" and val:
            rotation = val["angle"]
        elif name == "imir":
            mirrored = True
        elif name == "pixi" and val:
            channels = len(val["bits"])
            bit_depth = max(val["bits"], default=0)
        elif name == "av1C" and val:
            from . import rawav1  # noqa: PLC0415

            try:
                av1 = rawav1.parse_av1c(val["record"])
            except ValueError:
                av1 = None  # stub/corrupt config: ispe stands alone
            if av1 is not None and "width" in av1:
                meta["av1_width"] = av1["width"]
                meta["av1_height"] = av1["height"]
                meta["av1_profile"] = av1["profile"]
        elif name == "hvcC" and val:
            from . import rawhevc  # noqa: PLC0415

            try:
                hevc = rawhevc.sps_from_hvcc(val["record"])
            except ValueError:
                hevc = None
            if hevc is not None:
                meta["hevc_width"] = hevc["width"]
                meta["hevc_height"] = hevc["height"]
                meta["hevc_profile"] = hevc["profile"]
    meta["width"], meta["height"] = width, height
    meta["rotation_deg"] = rotation
    meta["mirrored"] = mirrored
    meta["channels"] = channels
    meta["bit_depth"] = bit_depth

    has_alpha = False
    has_thumb = False
    n_tiles = 0
    for rtype, from_id, to_ids in refs:
        if rtype == "auxl" and primary in to_ids:
            # the aux item's auxC property says WHICH auxiliary; alpha
            # is the only one a curation pipeline needs to flag
            for idx in assoc.get(from_id, []):
                if 0 < idx <= len(props):
                    name, val = props[idx - 1]
                    if name == "auxC" and val and "alpha" in val["aux_type"]:
                        has_alpha = True
        elif rtype == "thmb" and primary in to_ids:
            has_thumb = True
        elif rtype == "dimg" and from_id == primary:
            n_tiles = len(to_ids)
    # "the file carries Exif" — an Exif ITEM exists, whatever it
    # describes (a cdsc-to-primary-only test would be strictly narrower
    # and real encoders always link it to the primary anyway)
    has_exif = any(i["type"] == "Exif" for i in items.values())
    meta["has_alpha"] = has_alpha
    meta["has_thumbnail"] = has_thumb
    meta["has_exif"] = has_exif
    meta["n_tiles"] = n_tiles
    meta["primary_size"] = iloc.get(primary, {}).get("size", 0)
    return meta


def heif_exif(data: bytes) -> dict:
    """EXIF fields from the HEIF's ``Exif`` item (HEIC photos — the
    phone-default format — carry camera/orientation/GPS here, the
    GPS being the PII flag curation needs).

    The item payload is an ExifDataBlock (ISO 23008-12 A.2.1): a u32
    offset from the start of the remaining payload to the TIFF
    header, then the classic EXIF bytes — delegated to
    :func:`..rawexif.exif_meta`.  Absence of an Exif item is DATA
    (``{"has_gps": False}``), unreachable or lying extents raise
    ``ValueError`` for per-row capture."""
    from . import rawexif  # noqa: PLC0415

    if not sniff_heif(data):
        raise ValueError("heif: payload lacks a HEIF-family ftyp brand")
    budget = [_MAX_BOXES]
    items: dict[int, dict] = {}
    iloc: dict[int, dict] = {}
    for fourcc, body, box_end in _walk(data, 0, len(data), budget):
        if fourcc == b"meta":
            if box_end - body < 4:
                raise ValueError("heif: meta box shorter than its fields")
            for mcc, mb, me in _walk(data, body + 4, box_end, budget):
                if mcc == b"iinf":
                    items = _parse_iinf(data, mb, me, budget)
                elif mcc == b"iloc":
                    iloc = _parse_iloc(data, mb, me)
    exif_ids = [i for i, inf in items.items() if inf["type"] == "Exif"]
    if not exif_ids:
        return {"has_gps": False}
    loc = iloc.get(exif_ids[0])
    if not loc or not loc["extents"]:
        raise ValueError("heif: Exif item has no reachable extents")
    for off, ln in loc["extents"]:
        if off + ln > len(data):
            raise ValueError("heif: Exif extent outside the file")
    payload = b"".join(data[o : o + ln] for o, ln in loc["extents"])
    if len(payload) < 4:
        raise ValueError("heif: Exif payload shorter than its offset field")
    tiff_off = int.from_bytes(payload[:4], "big")
    if 4 + tiff_off >= len(payload):
        raise ValueError("heif: Exif tiff offset outside the payload")
    return rawexif.exif_meta(payload[4 + tiff_off :])


def decode_heif_pixels(data: bytes):
    """The documented loud boundary (AV1/HEVC intra payloads)."""
    raise UnsupportedCodecError(
        "HEIF/AVIF pixel decode (AV1/HEVC intra) is not implemented; "
        "container metadata is available via parse_heif"
    )


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------


def _box(fourcc: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + fourcc + body


def _full(fourcc: bytes, ver: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, bytes([ver]) + flags.to_bytes(3, "big") + body)


def build_heif(
    *,
    fmt: str = "avif",
    width: int = 320,
    height: int = 240,
    bit_depth: int = 8,
    rotation: int = 0,
    alpha: bool = False,
    exif: bool = False,
    exif_tiff: bytes | None = None,
    thumbnail: bool = False,
    wide_ipma: bool = False,
    v1_boxes: bool = False,
) -> bytes:
    """Write a structurally valid HEIF/AVIF whose codec payloads are
    placeholder bytes (metadata parsing never touches them).

    ``wide_ipma`` exercises the 15-bit association form; ``v1_boxes``
    exercises version-1 pitm/iinf/iref/iloc (32-bit item ids).
    """
    if fmt == "avif":
        brands = ("avif", "mif1", "miaf")
        codec, cfg = b"av01", b"av1C"
    elif fmt == "heic":
        brands = ("heic", "mif1")
        codec, cfg = b"hvc1", b"hvcC"
    else:
        raise ValueError(f"heif fixture: unknown fmt {fmt}")
    ftyp = _box(
        b"ftyp",
        brands[0].encode() + (0).to_bytes(4, "big")
        + b"".join(b.encode() for b in brands),
    )

    payloads: list[bytes] = []
    item_ids = {"primary": 1}
    next_id = 2
    payloads.append(b"\x12" * 64)  # placeholder coded image
    if alpha:
        item_ids["alpha"] = next_id
        next_id += 1
        payloads.append(b"\xa1" * 32)
    if exif or exif_tiff is not None:
        item_ids["exif"] = next_id
        next_id += 1
        if exif_tiff is not None:
            # real ExifDataBlock: u32 offset 6, 'Exif\\0\\0', TIFF bytes
            payloads.append(
                b"\x00\x00\x00\x06Exif\x00\x00" + exif_tiff
            )
        else:
            payloads.append(b"\x00\x00\x00\x06Exif\x00\x00" + b"\x11" * 16)
    if thumbnail:
        item_ids["thumb"] = next_id
        next_id += 1
        payloads.append(b"\x07" * 24)

    iver = 1 if v1_boxes else 0
    idw = 4 if v1_boxes else 2

    def iid(n: int) -> bytes:
        return n.to_bytes(idw, "big")

    hdlr = _full(b"hdlr", 0, 0, bytes(4) + b"pict" + bytes(12) + b"\x00")
    pitm = _full(b"pitm", iver, 0, iid(item_ids["primary"]))

    infe_ver = 3 if v1_boxes else 2

    def infe(item_id: int, itype: bytes) -> bytes:
        return _full(
            b"infe", infe_ver, 0,
            iid(item_id) + (0).to_bytes(2, "big") + itype + b"\x00",
        )

    infes = infe(item_ids["primary"], codec)
    if alpha:
        infes += infe(item_ids["alpha"], codec)
    if "exif" in item_ids:
        infes += infe(item_ids["exif"], b"Exif")
    if thumbnail:
        infes += infe(item_ids["thumb"], codec)
    n_items = len(payloads)
    iinf = _full(
        b"iinf", iver, 0,
        n_items.to_bytes(2 if iver == 0 else 4, "big") + infes,
    )

    # ipco pool: 1=ispe 2=pixi 3=codec config 4=irot 5=auxC 6=thumb ispe
    ispe = _full(
        b"ispe", 0, 0,
        width.to_bytes(4, "big") + height.to_bytes(4, "big"),
    )
    pixi = _full(b"pixi", 0, 0, bytes([3, bit_depth, bit_depth, bit_depth]))
    if fmt == "avif":
        from . import rawav1  # noqa: PLC0415

        cfgb = _box(
            cfg, rawav1.build_av1c(width=width, height=height)
        )
    else:
        from . import rawhevc  # noqa: PLC0415

        cfgb = _box(
            cfg,
            rawhevc.build_hvcc(
                rawhevc.build_sps(width=width, height=height)
            ),
        )
    irot = _box(b"irot", bytes([(rotation // 90) & 3]))
    auxc = _full(
        b"auxC", 0, 0, b"urn:mpeg:mpegB:cicp:systems:auxiliary:alpha\x00"
    )
    thumb_ispe = _full(
        b"ispe", 0, 0,
        max(width // 8, 1).to_bytes(4, "big")
        + max(height // 8, 1).to_bytes(4, "big"),
    )
    ipco = _box(b"ipco", ispe + pixi + cfgb + irot + auxc + thumb_ispe)

    def ipma_entry(item_id: int, idxs: list[int]) -> bytes:
        out = iid(item_id) if iver == 1 else item_id.to_bytes(2, "big")
        out += bytes([len(idxs)])
        for i in idxs:
            if wide_ipma:
                out += (0x8000 | i).to_bytes(2, "big")
            else:
                out += bytes([0x80 | i])
        return out

    entries = [ipma_entry(item_ids["primary"], [1, 2, 3, 4])]
    if alpha:
        entries.append(ipma_entry(item_ids["alpha"], [2, 3, 5]))
    if thumbnail:
        entries.append(ipma_entry(item_ids["thumb"], [3, 6]))
    ipma = _full(
        b"ipma", iver, 1 if wide_ipma else 0,
        len(entries).to_bytes(4, "big") + b"".join(entries),
    )
    iprp = _box(b"iprp", ipco + ipma)

    ref_boxes = b""
    if alpha:
        ref_boxes += _box(
            b"auxl", iid(item_ids["alpha"]) + (1).to_bytes(2, "big")
            + iid(item_ids["primary"]),
        )
    if "exif" in item_ids:
        ref_boxes += _box(
            b"cdsc", iid(item_ids["exif"]) + (1).to_bytes(2, "big")
            + iid(item_ids["primary"]),
        )
    if thumbnail:
        ref_boxes += _box(
            b"thmb", iid(item_ids["thumb"]) + (1).to_bytes(2, "big")
            + iid(item_ids["primary"]),
        )
    iref = _full(b"iref", iver, 0, ref_boxes) if ref_boxes else b""

    # iloc: offsets are absolute into the file; mdat follows meta, so
    # lay out meta with a placeholder, then patch the real offsets in
    iloc_ver = 1 if v1_boxes else 0
    item_sizes = [len(p) for p in payloads]

    def iloc_body(mdat_data_start: int) -> bytes:
        body = bytes([0x44, 0x00])  # offset_size=4, length_size=4
        body += len(payloads).to_bytes(2 if iloc_ver < 2 else 4, "big")
        off = mdat_data_start
        out = bytearray(body)
        for item_id, size in zip(item_ids.values(), item_sizes):
            # iloc item ids are u16 through version 1 (u32 only in v2),
            # independent of the pitm/iinf/iref id width
            out += item_id.to_bytes(2 if iloc_ver < 2 else 4, "big")
            if iloc_ver in (1, 2):
                out += (0).to_bytes(2, "big")  # construction_method=file
            out += (0).to_bytes(2, "big")  # data_reference_index
            out += (1).to_bytes(2, "big")  # extent_count
            out += off.to_bytes(4, "big") + size.to_bytes(4, "big")
            off += size
        return bytes(out)

    # two-pass: sizes are stable because the offset field width is fixed
    probe = _full(b"iloc", iloc_ver, 0, iloc_body(0))
    meta_body = b"\x00\x00\x00\x00" + hdlr + pitm + iinf + iprp + iref + probe
    meta_box_len = 8 + len(meta_body)
    mdat_data_start = len(ftyp) + meta_box_len + 8
    iloc = _full(b"iloc", iloc_ver, 0, iloc_body(mdat_data_start))
    meta_box = _box(
        b"meta",
        b"\x00\x00\x00\x00" + hdlr + pitm + iinf + iprp + iref + iloc,
    )
    mdat = _box(b"mdat", b"".join(payloads))
    return ftyp + meta_box + mdat
