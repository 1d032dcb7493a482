"""VP8L lossless WebP codec tests: bit-exact roundtrips through every
transform and coding path, container handling, hostile bytes, the
lossy loud boundary, and the Spark feature path."""

import random

import numpy as np
import pytest

from rawdata_client_provider_gcs_spark.operators import (
    multimodal,
    rawimage,
    rawwebp as W,
)


def _img(h=13, w=17, ch=3, seed=7):
    return np.random.RandomState(seed).randint(0, 256, (h, w, ch), np.uint8)


@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        {"subtract_green": True},
        {"cache_bits": 4},
        {"color_transform": (0x10, 0xE0, 0x08)},
        {"subtract_green": True, "color_transform": (3, 250, 17)},
        {"meta_bits": 3},
        {"subtract_green": True, "meta_bits": 2},
        {"subtract_green": True, "color_transform": (99, 1, 200), "predictor": 11},
    ],
    ids=lambda k: "+".join(sorted(k)) or "plain",
)
def test_roundtrip_variants(kwargs):
    img = _img()
    out = W.decode_webp(W.encode_webp_lossless(img, **kwargs))
    assert (out == img).all()


@pytest.mark.parametrize("mode", range(14))
def test_all_predictor_modes_roundtrip(mode):
    img = _img(seed=100 + mode)
    out = W.decode_webp(W.encode_webp_lossless(img, predictor=mode))
    assert (out == img).all()


@pytest.mark.parametrize(
    "n_colors,expect_bits", [(2, 3), (3, 2), (13, 1), (30, 0)]
)
def test_palette_roundtrip_with_bundling(n_colors, expect_bits):
    rng = np.random.RandomState(n_colors)
    img = (rng.randint(0, n_colors, (11, 7, 1), np.uint8) * (255 // n_colors)).repeat(
        3, axis=2
    )
    payload = W.encode_webp_lossless(img, palette=True)
    assert (W.decode_webp(payload) == img).all()


def test_rle_and_cache_roundtrip():
    rng = np.random.RandomState(3)
    runny = np.repeat(rng.randint(0, 4, (9, 5, 3), np.uint8) * 60, 3, axis=1)
    for kwargs in ({"rle": True}, {"rle": True, "cache_bits": 3}):
        assert (W.decode_webp(W.encode_webp_lossless(runny, **kwargs)) == runny).all()


def test_rgba_alpha_survives():
    img = _img(ch=4)
    out = W.decode_webp_rgba(W.encode_webp_lossless(img))
    assert (out == img).all()


def test_vp8x_extended_container():
    """A VP8X-wrapped lossless file (the layout files with metadata
    use) must decode — the walk skips unknown chunks to VP8L."""
    img = _img(8, 8)
    bare = W.encode_webp_lossless(img)
    vp8l_chunk = bare[12:]
    vp8x = b"VP8X" + (10).to_bytes(4, "little") + bytes(10)
    body = b"WEBP" + vp8x + vp8l_chunk
    wrapped = b"RIFF" + len(body).to_bytes(4, "little") + body
    assert (W.decode_webp(wrapped) == img).all()


def test_lossy_boundaries():
    # truncated VP8 chunk = corruption -> ValueError (decodes since r9)
    body = b"WEBP" + b"VP8 " + (4).to_bytes(4, "little") + b"\x00\x00\x00\x00"
    payload = b"RIFF" + len(body).to_bytes(4, "little") + body
    with pytest.raises(ValueError):
        W.decode_webp(payload)
    # a corrupt ALPH plane on a valid VP8 frame is also a ValueError
    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawvp8

    frame = rawvp8.encode_vp8_keyframe(
        np.full((16, 16), 80, np.uint8),
        np.full((8, 8), 128, np.uint8),
        np.full((8, 8), 128, np.uint8),
    )
    body = (
        b"WEBP"
        + b"ALPH" + (2).to_bytes(4, "little") + b"\x02\x00"  # bad method
        + b"VP8 " + len(frame).to_bytes(4, "little") + frame
    )
    payload = b"RIFF" + len(body).to_bytes(4, "little") + body
    with pytest.raises(ValueError, match="ALPH"):
        W.decode_webp(payload)


def test_generic_decode_dispatch():
    img = _img()
    payload = W.encode_webp_lossless(img, subtract_green=True)
    assert rawimage.sniff_format(payload) == "webp"
    assert (rawimage.decode_image(payload) == img).all()


def test_dimension_bomb_rejected():
    img = _img(2, 2)
    payload = bytearray(W.encode_webp_lossless(img))
    # rewrite the 14+14-bit dimensions to the max (16384x16384 > cap)
    header = W._BitWriter()
    header.write(16383, 14)
    header.write(16383, 14)
    header.write(0, 1)
    header.write(0, 3)
    hdr_bytes = header.getvalue()
    start = payload.index(b"VP8L") + 9  # skip fourcc+size+signature
    payload[start : start + 4] = hdr_bytes[:4]
    with pytest.raises(ValueError):
        W.decode_webp(bytes(payload))


@pytest.mark.parametrize("seed", range(3))
def test_kernel_never_raises_uncatchable(seed):
    rng = random.Random(seed)
    img = _img(9, 9)
    bases = [
        W.encode_webp_lossless(img),
        W.encode_webp_lossless(img, subtract_green=True, cache_bits=3),
        W.encode_webp_lossless(img, predictor=7),
    ]
    for base in bases:
        for _ in range(150):
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
            _, err = multimodal._catch_row(W.decode_webp, bytes(buf))
            assert err is None or "NotImplementedError" not in err or (
                "UnsupportedCodecError" in err
            )


def test_predictor_mode13_uses_truncating_division():
    """ClampAddSubtractHalf is C `(a - b) / 2` (truncation): for
    avg=100, TL=103 the result is 100 + trunc(-3/2) = 99, not the
    floor-shift 98."""
    L = np.array([100, 100, 100, 255], np.uint8)
    T = np.array([100, 100, 100, 255], np.uint8)
    TL = np.array([103, 103, 103, 255], np.uint8)
    out = W._predict(13, L, T, TL, T)
    assert list(out[:3]) == [99, 99, 99]


def test_predictor_tr_right_edge_uses_current_row_leftmost():
    """At x = w-1 the TR pixel is flat-addressed top[x+1], i.e. the
    CURRENT row's column 0 (already decoded), not the row above's."""
    # 2x2, mode 3 (TR) everywhere; hand-build expected reconstruction
    modes = [(0xFF << 24) | (3 << 8)]  # one 4x4 tile covers the image
    res = np.zeros((2, 2, 4), np.uint16)
    res[0, 0] = [10, 20, 30, 0]  # pred = [0,0,0,255]
    res[0, 1] = [1, 1, 1, 0]  # y=0 -> pred = L = out[0,0]
    res[1, 0] = [2, 2, 2, 0]  # x=0 -> pred = T = out[0,0]
    res[1, 1] = [3, 3, 3, 0]  # mode 3 TR at right edge -> out[1,0]
    out = W._inv_predictor(res.astype(np.uint8), modes, 2)
    assert list(out[0, 0]) == [10, 20, 30, 255]
    assert list(out[0, 1]) == [11, 21, 31, 255]
    assert list(out[1, 0]) == [12, 22, 32, 255]  # pred = T (res alpha 0)
    expected_tr = out[1, 0]  # current row leftmost
    assert list(out[1, 1][:3]) == [
        (int(expected_tr[i]) + 3) & 0xFF for i in range(3)
    ]


def test_degenerate_prefix_codes_rejected():
    # duplicate simple-code symbols
    bw = W._BitWriter()
    bw.write(1, 1)  # simple
    bw.write(1, 1)  # two symbols
    bw.write(1, 1)  # 8-bit first
    bw.write(7, 8)
    bw.write(7, 8)  # same symbol again
    with pytest.raises(ValueError, match="duplicate"):
        W._read_prefix_code(W._BitReader(bw.getvalue()), 256)
    # a lone code-length symbol with length > 1 is an incomplete table
    with pytest.raises(ValueError, match="incomplete|complete"):
        W._PrefixCode([0, 0, 5])


def test_palette_then_subtract_green_transform_order():
    """COLOR_INDEXING read first, another transform second — legal per
    spec, inverted in reverse — must decode, not crash."""
    rng = np.random.RandomState(6)
    idx = rng.randint(0, 20, (5, 6), np.uint8)
    palette = [(0xFF << 24) | int(c) for c in rng.randint(0, 1 << 24, 20)]
    bw = W._BitWriter()
    bw.write(6 - 1, 14)
    bw.write(5 - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    # transform 1: COLOR_INDEXING (read first -> inverted last)
    bw.write(1, 1)
    bw.write(3, 2)
    bw.write(20 - 1, 8)
    deltas = []
    prev = 0
    for c in palette:
        d = 0
        for shift in (24, 16, 8, 0):
            d |= (((c >> shift) - (prev >> shift)) & 0xFF) << shift
        deltas.append(d)
        prev = c
    W._emit_entropy_image(bw, deltas, is_main=False)
    # transform 2: SUBTRACT_GREEN (read second -> inverted first)
    bw.write(1, 1)
    bw.write(2, 2)
    bw.write(0, 1)  # no more transforms
    # index image with subtract-green applied forward: green=idx,
    # r = (0 - g) & 0xff, b = (0 - g) & 0xff
    pix = [
        (0xFF << 24)
        | (((0 - int(g)) & 0xFF) << 16)
        | (int(g) << 8)
        | ((0 - int(g)) & 0xFF)
        for g in idx.reshape(-1)
    ]
    W._emit_entropy_image(bw, pix, is_main=True)
    payload = W._wrap_riff(bw.getvalue())
    out = W.decode_webp_rgba(payload)
    want = np.zeros((5, 6, 4), np.uint8)
    for y in range(5):
        for x in range(6):
            c = palette[idx[y, x]]
            want[y, x] = [(c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF, 255]
    assert (out == want).all()


def test_sample_frames_corrupt_webp_lands_in_error_column(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b"RIFFxxxxWEB_ not a webp at all"))],
        "doc_id long, pic binary",
    )
    media = multimodal.with_media_columns(df, "pic", "image/webp", "doc_id")
    out = multimodal.sample_frames(media, every_ms=100, max_frames=2).toPandas()
    assert len(out) == 1 and out["error"].notna().all()


def test_palette_writer_rejects_combined_transforms():
    img = np.zeros((4, 4, 3), np.uint8)
    with pytest.raises(ValueError, match="combined"):
        W.encode_webp_lossless(img, palette=True, predictor=2)


def test_animation_roundtrip_and_compositing():
    rng = np.random.RandomState(4)
    frames = [(100, rng.randint(0, 256, (10, 12, 3), np.uint8)) for _ in range(3)]
    payload = W.encode_webp_animation(frames)
    assert W.is_animated_webp(payload)
    out = W.decode_webp_frames(payload)
    assert [d for d, _ in out] == [100, 100, 100]
    assert all((o == f).all() for (_, o), (_, f) in zip(out, frames))
    # a still file through the frames API: one frame, duration 0
    still = W.encode_webp_lossless(frames[0][1])
    assert not W.is_animated_webp(still)
    assert len(W.decode_webp_frames(still)) == 1


def test_animation_alpha_blend_and_dispose():
    """A no-blend base frame then an alpha-blended transparent overlay
    must leave the base visible; dispose-to-background clears for the
    NEXT frame."""
    base = np.full((4, 4, 4), 200, np.uint8)
    overlay = np.zeros((4, 4, 4), np.uint8)  # fully transparent
    b1 = W.encode_webp_animation([(50, base)], blend_none=True)
    # hand-splice a second alpha-blend ANMF frame
    second = W.encode_webp_animation([(60, overlay)], blend_none=False)
    anmf2 = second[second.index(b"ANMF") :]
    spliced = bytearray(b1)
    spliced += anmf2
    spliced[4:8] = (len(spliced) - 8).to_bytes(4, "little")
    out = W.decode_webp_frames(bytes(spliced))
    assert len(out) == 2
    # blending a fully transparent frame leaves the base RGB intact
    assert (out[1][1] == out[0][1]).all()


def test_spark_sample_frames_on_animated_webp(spark):
    rng = np.random.RandomState(11)
    frames = [(500, rng.randint(0, 256, (8, 8, 3), np.uint8)) for _ in range(4)]
    payload = W.encode_webp_animation(frames)
    df = spark.createDataFrame(
        [(0, bytearray(payload))], "doc_id long, pic binary"
    )
    media = multimodal.with_media_columns(df, "pic", "image/webp", "doc_id")
    out = multimodal.sample_frames(media, every_ms=500, max_frames=8).toPandas()
    assert out["error"].isna().all()
    assert list(out["frame_idx"]) == [0, 1, 2, 3]
    assert list(out["frame_ms"]) == [0, 500, 1000, 1500]
    assert all(f[:2] == b"P6" for f in out["frame"])


def test_spark_features_on_webp(spark):
    img = np.full((16, 16, 3), 96, np.uint8)
    rows = [
        (0, bytearray(W.encode_webp_lossless(img))),
        (1, bytearray(W.encode_webp_lossless(img, subtract_green=True))),
        (2, bytearray(b"RIFF\x10\x00\x00\x00WEBP garbage here")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, pic binary")
    media = multimodal.with_media_columns(df, "pic", "image/webp", "doc_id")
    out = multimodal.extract_features(media, fake=False).toPandas()
    ok = out[out["error"].isna()].sort_values("doc_id")
    assert list(ok["doc_id"]) == [0, 1]
    # constant 96 -> one-hot luma bucket 3
    assert all(list(f)[3] == 1.0 for f in ok["features"])
    assert list(out[out["error"].notna()]["doc_id"]) == [2]
