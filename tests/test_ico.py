"""ICO/CUR codec tests: DIB and PNG entries, palettized depths, the
generic decode dispatch, hostile bytes, and the Spark feature path."""

import random

import numpy as np
import pytest

from rawdata_client_provider_gcs_spark.operators import multimodal, rawico, rawimage


def _imgs():
    a = np.zeros((16, 16, 3), np.uint8)
    a[:, :, 0] = 200
    a[:, :, 1] = 30
    b = np.full((32, 32, 3), 77, np.uint8)
    return a, b


@pytest.mark.parametrize("png", [False, True], ids=["dib32", "png"])
def test_roundtrip_and_best_entry(png):
    a, b = _imgs()
    ico = rawico.encode_ico([a, b], png=png)
    entries = rawico.decode_ico(ico)
    assert [(e["width"], e["height"]) for e in entries] == [(16, 16), (32, 32)]
    assert (entries[0]["image"] == a).all() and (entries[1]["image"] == b).all()
    assert (rawico.decode_ico_best(ico) == b).all()


def test_generic_decode_dispatch():
    a, b = _imgs()
    ico = rawico.encode_ico([a, b])
    assert rawimage.sniff_format(ico) == "ico"
    assert (rawimage.decode_image(ico) == b).all()


def test_palettized_dib_depths():
    """Hand-build 8/4/1-bit palettized DIB entries."""
    pal_rgb = np.array([[10, 20, 30], [200, 100, 50]], np.uint8)

    def build(bpp, w, h, idx_rows):
        pal = bytearray()
        n_colors = 1 << bpp
        for i in range(n_colors):
            c = pal_rgb[i % 2]
            pal += bytes([c[2], c[1], c[0], 0])  # BGRA
        row_bits = w * bpp
        stride = ((row_bits + 31) // 32) * 4
        px = bytearray()
        for row in idx_rows[::-1]:  # bottom-up
            bits = bytearray(stride)
            for x, v in enumerate(row):
                if bpp == 8:
                    bits[x] = v
                elif bpp == 4:
                    bits[x // 2] |= v << (4 if x % 2 == 0 else 0)
                else:
                    bits[x // 8] |= v << (7 - x % 8)
            px += bits
        mask_stride = ((w + 31) // 32) * 4
        hdr = (
            (40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True)
            + (2 * h).to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little")
            + bpp.to_bytes(2, "little")
            + (0).to_bytes(4, "little")
            + len(px).to_bytes(4, "little")
            + bytes(8)
            + n_colors.to_bytes(4, "little")
            + bytes(4)
        )
        blob = hdr + bytes(pal) + bytes(px) + bytes(mask_stride * h)
        out = bytearray(b"\x00\x00\x01\x00\x01\x00")
        out += bytes([w, h, 0, 0]) + (1).to_bytes(2, "little")
        out += bpp.to_bytes(2, "little")
        out += len(blob).to_bytes(4, "little") + (22).to_bytes(4, "little")
        return bytes(out) + blob

    idx = [[0, 1, 0, 1], [1, 0, 1, 0], [0, 0, 1, 1], [1, 1, 0, 0]]
    for bpp in (8, 4, 1):
        got = rawico.decode_ico(build(bpp, 4, 4, idx))[0]["image"]
        want = pal_rgb[np.array(idx)]
        assert (got == want).all(), bpp


def test_hostile_rejections():
    a, _ = _imgs()
    ico = bytearray(rawico.encode_ico([a]))
    with pytest.raises(ValueError):
        rawico.decode_ico(b"\x00\x00\x03\x00\x01\x00")  # bad type
    # directory count lying past the payload
    lie = bytes(ico[:4]) + (999).to_bytes(2, "little") + bytes(ico[6:])
    with pytest.raises(ValueError, match="directory"):
        rawico.decode_ico(lie)
    # huge declared dimensions
    big = bytes(ico).replace(
        (16).to_bytes(4, "little", signed=True) + (32).to_bytes(4, "little", signed=True),
        (60000).to_bytes(4, "little", signed=True)
        + (120000).to_bytes(4, "little", signed=True),
    )
    with pytest.raises(ValueError):
        rawico.decode_ico(big)


@pytest.mark.parametrize("seed", range(3))
def test_kernel_never_raises_uncatchable(seed):
    """Mutated icons must raise only data-dependent exceptions that
    _catch_row records — never NotImplementedError or a crash (the
    same bar as test_media_fuzz)."""
    a, b = _imgs()
    rng = random.Random(seed)
    for base in (rawico.encode_ico([a, b]), rawico.encode_ico([a], png=True)):
        for _ in range(200):
            buf = bytearray(base)
            mode = rng.randrange(3)
            if mode == 0:
                buf = buf[: rng.randrange(1, len(buf))]
            elif mode == 1:
                for _ in range(rng.randrange(1, 6)):
                    buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
            else:
                i = rng.randrange(len(buf))
                del buf[i : min(len(buf), i + rng.randrange(1, 64))]
            _, err = multimodal._catch_row(
                rawico.decode_ico, bytes(buf)
            )
            assert err is None or "NotImplementedError" not in err


def test_spark_features_on_icons(spark):
    a, b = _imgs()
    rows = [
        (0, bytearray(rawico.encode_ico([a, b]))),
        (1, bytearray(rawico.encode_ico([b], png=True))),
        (2, bytearray(b"\x00\x00\x01\x00\x01\x00 not a real entry")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, icon binary")
    media = multimodal.with_media_columns(df, "icon", "image/x-icon", "doc_id")
    out = multimodal.extract_features(media, fake=False).toPandas()
    ok = out[out["error"].isna()].sort_values("doc_id")
    assert list(ok["doc_id"]) == [0, 1]
    # both decode to the same 32x32 constant-77 image -> same histogram
    assert list(ok["features"].iloc[0]) == list(ok["features"].iloc[1])
    assert list(out[out["error"].notna()]["doc_id"]) == [2]


def _bmp(w, h, bpp, compression, pal_rgb, pixel_data, n_colors=None):
    """Hand-build a standalone BMP file."""
    n_colors = n_colors if n_colors is not None else (1 << bpp if bpp <= 8 else 0)
    pal = bytearray()
    for i in range(n_colors):
        c = pal_rgb[i % len(pal_rgb)]
        pal += bytes([c[2], c[1], c[0], 0])
    dib = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + bpp.to_bytes(2, "little")
        + compression.to_bytes(4, "little")
        + len(pixel_data).to_bytes(4, "little")
        + bytes(8)
        + n_colors.to_bytes(4, "little")
        + bytes(4)
    )
    data_off = 14 + len(dib) + len(pal)
    hdr = (
        b"BM"
        + (data_off + len(pixel_data)).to_bytes(4, "little")
        + bytes(4)
        + data_off.to_bytes(4, "little")
    )
    return hdr + dib + bytes(pal) + pixel_data


def test_bmp_palettized_depths_standalone():
    pal_rgb = np.array([[10, 20, 30], [200, 100, 50]], np.uint8)
    idx = np.array([[0, 1, 0, 1], [1, 0, 1, 0], [0, 0, 1, 1], [1, 1, 0, 0]], np.uint8)
    want = pal_rgb[idx]
    for bpp in (8, 4, 1):
        row_bits = 4 * bpp
        stride = ((row_bits + 31) // 32) * 4
        px = bytearray()
        for row in idx[::-1]:  # bottom-up
            bits = bytearray(stride)
            for x, v in enumerate(row):
                if bpp == 8:
                    bits[x] = v
                elif bpp == 4:
                    bits[x // 2] |= v << (4 if x % 2 == 0 else 0)
                else:
                    bits[x // 8] |= v << (7 - x % 8)
            px += bits
        payload = _bmp(4, 4, bpp, 0, pal_rgb, bytes(px))
        assert rawimage.sniff_format(payload) == "bmp"
        assert (rawimage.decode_image(payload) == want).all(), bpp


def test_bmp_rle8_standalone():
    from rawdata_client_provider_gcs_spark.operators import rawavi

    pal_rgb = np.array(
        [[5, 5, 5], [250, 10, 10], [10, 250, 10], [10, 10, 250]], np.uint8
    )
    rng = np.random.RandomState(3)
    idx = rng.randint(0, 4, (6, 9), np.uint8)
    rle = rawavi._rle8_encode(idx[::-1])  # encoder wants bottom-up
    payload = _bmp(9, 6, 8, 1, pal_rgb, rle, n_colors=4)
    assert rawimage.sniff_format(payload) == "bmp"
    assert (rawimage.decode_image(payload) == pal_rgb[idx]).all()


def test_bmp_32bpp_standalone():
    rng = np.random.RandomState(4)
    rgb = rng.randint(0, 256, (5, 7, 3), np.uint8)
    rows = bytearray()
    for row in rgb[::-1]:
        for px in row:
            rows += bytes([px[2], px[1], px[0], 255])
    payload = _bmp(7, 5, 32, 0, np.zeros((1, 3), np.uint8), bytes(rows), n_colors=0)
    assert (rawimage.decode_image(payload) == rgb).all()


def test_bmp_hostile_rejections():
    pal_rgb = np.array([[1, 2, 3]], np.uint8)
    lying = _bmp(60000, 60000, 8, 0, pal_rgb, b"", n_colors=1)
    with pytest.raises(ValueError):
        rawimage.decode_image(lying)
    short = _bmp(8, 8, 8, 0, pal_rgb, b"\x00" * 4, n_colors=1)
    with pytest.raises(ValueError):
        rawimage.decode_image(short)
