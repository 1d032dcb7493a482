"""HEIF/AVIF container metadata (rawheif) — hand-derived vectors,
fixture roundtrips, byte-level iloc verification, hostile structure,
and the Spark per-row boundary."""

from __future__ import annotations

import pytest

from rawdata_client_provider_gcs_spark.operators import rawheif as H
from rawdata_client_provider_gcs_spark.operators.rawavi import (
    UnsupportedCodecError,
)


def _b(fourcc: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + fourcc + body


def _f(fourcc: bytes, ver: int, flags: int, body: bytes) -> bytes:
    return _b(fourcc, bytes([ver]) + flags.to_bytes(3, "big") + body)


def hand_minimal_avif() -> bytes:
    """A minimal AVIF written as raw literal boxes, independent of
    build_heif — one av01 item, 64×48 ispe, associated via a NON-essential
    7-bit ipma entry (build_heif always sets the essential bit, so this
    also pins that the parser ignores it)."""
    ftyp = _b(b"ftyp", b"avif" + bytes(4) + b"avifmif1")
    hdlr = _f(b"hdlr", 0, 0, bytes(4) + b"pict" + bytes(12) + b"\x00")
    pitm = _f(b"pitm", 0, 0, (7).to_bytes(2, "big"))
    infe = _f(b"infe", 2, 0, (7).to_bytes(2, "big") + bytes(2) + b"av01\x00")
    iinf = _f(b"iinf", 0, 0, (1).to_bytes(2, "big") + infe)
    ispe = _f(b"ispe", 0, 0, (64).to_bytes(4, "big") + (48).to_bytes(4, "big"))
    ipco = _b(b"ipco", ispe)
    # entry: item 7, 1 association, index 1, essential bit CLEAR
    ipma = _f(b"ipma", 0, 0, (1).to_bytes(4, "big")
              + (7).to_bytes(2, "big") + bytes([1, 0x01]))
    iprp = _b(b"iprp", ipco + ipma)
    meta = _b(b"meta", bytes(4) + hdlr + pitm + iinf + iprp)
    return ftyp + meta


def test_hand_written_minimal_avif():
    m = H.parse_heif(hand_minimal_avif())
    assert m["format"] == "avif"
    assert m["codec"] == "av01"
    assert m["primary_item_id"] == 7
    assert (m["width"], m["height"]) == (64, 48)
    assert m["n_items"] == 1
    assert m["rotation_deg"] == 0 and not m["mirrored"]
    assert m["bit_depth"] == 0 and m["channels"] == 0  # no pixi
    assert m["primary_size"] == 0  # no iloc
    assert not m["has_alpha"] and not m["has_exif"]


def test_fixture_roundtrip_matrix():
    for fmt in ("avif", "heic"):
        for v1 in (False, True):
            for wide in (False, True):
                b = H.build_heif(
                    fmt=fmt, width=777, height=333, rotation=180,
                    alpha=True, exif=True, thumbnail=True,
                    bit_depth=12, v1_boxes=v1, wide_ipma=wide,
                )
                m = H.parse_heif(b)
                assert m["format"] == fmt
                assert (m["width"], m["height"]) == (777, 333)
                assert m["rotation_deg"] == 180
                assert m["bit_depth"] == 12 and m["channels"] == 3
                assert m["has_alpha"] and m["has_exif"] and m["has_thumbnail"]
                assert m["n_items"] == 4
                assert m["codec"] == ("av01" if fmt == "avif" else "hvc1")


def test_iloc_extents_point_at_mdat_payload():
    """Byte-level: follow the parsed iloc offsets by hand and check the
    primary extent really is the placeholder coded-image bytes (0x12)
    inside mdat — the offsets are absolute, not box-relative."""
    blob = H.build_heif(alpha=True, exif=True)
    # independent mini-walk: find iloc inside meta and decode extent 0
    def find(box: bytes, data: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            size = int.from_bytes(data[pos : pos + 4], "big")
            if data[pos + 4 : pos + 8] == box:
                return pos + 8, pos + size
            pos += size
        return None

    meta_span = find(b"meta", blob, 0, len(blob))
    assert meta_span
    iloc_span = find(b"iloc", blob, meta_span[0] + 4, meta_span[1])
    assert iloc_span
    b0 = iloc_span[0] + 4  # skip ver/flags
    assert blob[b0] == 0x44  # offset_size=4, length_size=4
    count = int.from_bytes(blob[b0 + 2 : b0 + 4], "big")
    assert count == 3
    p = b0 + 4
    item_id = int.from_bytes(blob[p : p + 2], "big")
    assert item_id == 1
    n_ext = int.from_bytes(blob[p + 4 : p + 6], "big")
    assert n_ext == 1
    off = int.from_bytes(blob[p + 6 : p + 10], "big")
    ln = int.from_bytes(blob[p + 10 : p + 14], "big")
    assert ln == 64
    assert blob[off : off + ln] == b"\x12" * 64
    # and the parser agrees
    assert H.parse_heif(blob)["primary_size"] == 64


def test_alpha_needs_the_auxc_property():
    """An auxl reference alone must NOT flag alpha — only an aux item
    whose auxC property carries the alpha urn (depth maps etc. are
    auxl too)."""
    blob = bytearray(H.build_heif(alpha=True))
    # corrupt the urn so it is a different auxiliary type
    i = bytes(blob).find(b"auxiliary:alpha")
    assert i > 0
    blob[i : i + 15] = b"auxiliary:depth"
    m = H.parse_heif(bytes(blob))
    assert not m["has_alpha"]
    assert m["n_items"] == 2  # the aux item itself still counts


def test_sniff_rejects_plain_mp4_and_garbage():
    from rawdata_client_provider_gcs_spark.operators import rawmp4

    assert not H.sniff_heif(rawmp4.build_mp4())
    assert not H.sniff_heif(b"")
    assert not H.sniff_heif(b"\x00" * 64)
    assert H.sniff_heif(H.build_heif(fmt="heic"))


def test_hostile_structures_raise_value_error():
    base = H.build_heif()

    # truncations at every prefix length: ValueError or sniff-reject,
    # never a crash or a garbage dict
    for cut in range(0, len(base), 7):
        try:
            H.parse_heif(base[:cut])
        except ValueError:
            pass

    # bit flips across the whole payload
    for pos in range(0, len(base), 11):
        mutated = bytearray(base)
        mutated[pos] ^= 0xFF
        try:
            H.parse_heif(bytes(mutated))
        except ValueError:
            pass

    # ipma property index outside the ipco pool
    blob = bytearray(H.build_heif())
    i = bytes(blob).find(b"ipma")
    # entry starts at i+4(ver/flags)+4(count): item_id(2) count(1) assoc
    assoc_at = i + 4 + 4 + 4 + 2 + 1
    blob[assoc_at] = 0x80 | 0x7F  # index 127, pool has 6
    with pytest.raises(ValueError, match="ipco pool"):
        H.parse_heif(bytes(blob))

    # iinf count lies about its infe children
    blob2 = bytearray(H.build_heif())
    j = bytes(blob2).find(b"iinf")
    blob2[j + 4 + 4 + 1] = 9  # declared count 9, carries 1
    with pytest.raises(ValueError, match="declares"):
        H.parse_heif(bytes(blob2))

    # primary item missing from iinf
    blob3 = bytearray(H.build_heif())
    k = bytes(blob3).find(b"pitm")
    blob3[k + 4 + 4 + 1] = 99  # pitm -> item 99 (u16 low byte)
    with pytest.raises(ValueError, match="primary"):
        H.parse_heif(bytes(blob3))


def test_decode_is_the_loud_boundary():
    with pytest.raises(UnsupportedCodecError):
        H.decode_heif_pixels(H.build_heif())


def test_spark_per_row_boundary(spark):
    """Crawl discipline: HEIF rows land as UnsupportedCodecError in the
    error column; corrupt declared-heif rows as corruption — the task
    never dies."""
    from pyspark.sql import functions as F

    from rawdata_client_provider_gcs_spark.operators import multimodal as M

    rows = [
        (1, bytearray(H.build_heif()), "image/avif"),
        (2, bytearray(H.build_heif(fmt="heic")), "image/heic"),
        (3, bytearray(b"garbage" * 10), "image/avif"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary, mime string")
    out = {
        r["doc_id"]: r["error"]
        for r in M.extract_features(
            M.with_media_columns(
                df.filter(F.col("mime") == "image/avif"), "content",
                "image/avif", "doc_id",
            )
        ).collect()
    }
    assert out[1].startswith("UnsupportedCodecError")
    assert out[3].startswith("MediaDecodeError")
    out2 = M.extract_features(
        M.with_media_columns(
            df.filter(F.col("doc_id") == 2), "content", "image/heic",
            "doc_id",
        )
    ).collect()
    assert out2[0]["error"].startswith("UnsupportedCodecError")

    # frame sampling: sentinel row with the boundary label
    fr = M.sample_frames(
        M.with_media_columns(
            df.filter(F.col("doc_id") == 1), "content", "image/avif",
            "doc_id",
        )
    ).collect()
    assert len(fr) == 1 and fr[0]["error"].startswith("UnsupportedCodecError")

    # resize: same boundary; fake=True keeps schema with a stub thumb
    rz = M.resize_images(
        M.with_media_columns(
            df.filter(F.col("doc_id") == 1), "content", "image/avif",
            "doc_id",
        ),
        16, 16,
    ).collect()
    assert rz[0]["error"].startswith("UnsupportedCodecError")
    rz_fake = M.resize_images(
        M.with_media_columns(
            df.filter(F.col("doc_id") == 1), "content", "image/avif",
            "doc_id",
        ),
        16, 16, fake=True,
    ).collect()
    assert rz_fake[0]["error"] is None and len(rz_fake[0]["thumb"]) == 256


def test_heif_exif_extraction():
    """Round-10: the Exif item payload (ExifDataBlock: u32 offset +
    'Exif\\0\\0' + TIFF) resolves through iinf+iloc extents into
    rawexif — the HEIC-photo PII tier."""
    from rawdata_client_provider_gcs_spark.operators import rawexif as E

    tiff = E.build_exif_tiff(
        orientation=6, make="PhoneCam", gps=(59.91, 10.75)
    )
    blob = H.build_heif(exif_tiff=tiff, alpha=True)
    assert H.parse_heif(blob)["has_exif"]
    x = H.heif_exif(blob)
    assert x["make"] == "PhoneCam" and x["orientation"] == 6
    assert x["has_gps"] and abs(x["gps_lat"] - 59.91) < 1e-4

    # v1 (32-bit id) boxes carry extents the same way
    assert H.heif_exif(H.build_heif(exif_tiff=tiff, v1_boxes=True))[
        "has_gps"
    ]
    # absence is DATA, not an error
    assert H.heif_exif(H.build_heif()) == {"has_gps": False}
    # junk Exif payload: lenient non-TIFF path, still not an error
    assert H.heif_exif(H.build_heif(exif=True))["has_gps"] is False

    # lying extents raise for per-row capture
    bad = bytearray(H.build_heif(exif_tiff=tiff))
    i = bytes(bad).find(b"iloc")
    # first extent offset field of item 1 (header byte 0x44: off4/len4)
    # corrupting the mdat start offset makes the Exif extent lie
    with pytest.raises(ValueError):
        mutated = bytes(bad).replace(b"mdat", b"zdat")  # extents point
        H.heif_exif(mutated[: len(mutated) // 2])        # past the cut
