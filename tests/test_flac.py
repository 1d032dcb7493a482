"""FLAC codec tests: roundtrips across subframe kinds and stereo
decorrelation, an LPC path pinned by a hand-built bitstream, CRC
enforcement, hostile bytes, and the audio-dispatch integration."""

import random

import numpy as np
import pytest

from rawdata_client_provider_gcs_spark.operators import (
    multimodal,
    rawaudio,
    rawflac as FL,
)


def _sig(frames=5000, channels=2, rate=8000):
    t = np.arange(frames) / rate
    cols = [np.sin(2 * np.pi * 440 * t), np.cos(2 * np.pi * 220 * t)]
    return np.stack(cols[:channels], axis=1) * 0.4


@pytest.mark.parametrize(
    "kind", ["verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4"]
)
def test_roundtrip_subframe_kinds(kind):
    sig = _sig()
    out, rate = FL.decode_flac(
        FL.encode_flac(sig, 8000, subframe=kind, block_size=1024)
    )
    assert rate == 8000 and out.shape == sig.shape
    assert np.abs(out - sig).max() <= 1 / 32768 * 1.01


def test_higher_fixed_orders_actually_compress():
    sig = _sig(channels=1)
    sizes = [
        len(FL.encode_flac(sig, 8000, subframe=k, block_size=1024))
        for k in ("verbatim", "fixed2", "fixed4")
    ]
    assert sizes[0] > sizes[1] > sizes[2]  # Rice coding earns its keep


def test_mid_side_roundtrip():
    sig = _sig()
    out, _ = FL.decode_flac(
        FL.encode_flac(sig, 8000, subframe="fixed2", mid_side=True, block_size=512)
    )
    assert np.abs(out - sig).max() <= 1 / 32768 * 1.01


def test_constant_subframe():
    const = np.full((3000, 1), 0.25)
    out, _ = FL.decode_flac(FL.encode_flac(const, 16000, subframe="constant"))
    assert np.allclose(out, 0.25, atol=1 / 32768)


def test_lpc_subframe_hand_built():
    """The encoder never emits LPC; pin the decoder path with a
    hand-built order-2 LPC subframe (coef [2, -1] at shift 0 mimics
    fixed-order-2, so the expected samples are computable)."""
    samples = [100, 103, 109, 118, 130, 145]
    bw = FL._BitWriter()
    bw.write(0, 1)  # padding
    bw.write(32 + 2 - 1, 6)  # LPC order 2
    bw.write(0, 1)  # no wasted bits
    bw.write_signed(samples[0], 16)
    bw.write_signed(samples[1], 16)
    bw.write(4 - 1, 4)  # precision 4
    bw.write_signed(0, 5)  # shift 0
    bw.write_signed(2, 4)
    bw.write_signed(-1, 4)
    resid = [
        samples[i] - (2 * samples[i - 1] - samples[i - 2])
        for i in range(2, len(samples))
    ]
    bw.write(0, 2)  # 4-bit rice
    bw.write(0, 4)  # partition order 0
    bw.write(3, 4)  # rice param
    FL._write_rice(bw, resid, 3)
    br = FL._BitReader(bw.getvalue())
    got = FL._read_subframe(br, len(samples), 16)
    assert got == samples


def test_final_partial_block_shorter_than_order():
    """A stream whose last block has fewer samples than the fixed
    predictor order must still roundtrip (verbatim fallback)."""
    for extra in (1, 2):
        sig = _sig(256 + extra, channels=1)
        out, _ = FL.decode_flac(
            FL.encode_flac(sig, 8000, subframe="fixed4", block_size=256)
        )
        assert out.shape[0] == 256 + extra
        assert np.abs(out[:, 0] - sig[:, 0]).max() <= 1 / 32768 * 1.01


def test_many_frames_coded_number_multibyte():
    """Frame numbers >= 2048 need the 3+ byte coded form; the stream
    must stay decodable (regression: the 2-byte writer overflowed)."""
    sig = _sig(2100 * 4, channels=1)
    out, _ = FL.decode_flac(FL.encode_flac(sig, 8000, block_size=4))
    assert out.shape[0] == 2100 * 4
    assert np.abs(out[:, 0] - sig[:, 0]).max() <= 1 / 32768 * 1.01


def test_coded_number_writer_inverts_reader():
    for v in (0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x1FFFFF, 0xFFFFFFF):
        bw = FL._BitWriter()
        FL._write_coded_number(bw, v)
        assert FL._read_coded_number(FL._BitReader(bw.getvalue())) == v


def test_frame_sample_size_mismatch_rejected():
    """A frame coding a different bps than STREAMINFO must raise, not
    silently mis-scale amplitudes."""
    payload = bytearray(FL.encode_flac(_sig(256, channels=1), 8000, block_size=256))
    # frame header starts right after fLaC + 4-byte block hdr + 34-byte
    # STREAMINFO; byte 3 of the header holds (ss_code << 1) in bits 3-1
    fh = 4 + 4 + 34
    hdr = bytearray(payload[fh : fh + 5])
    hdr[3] = (hdr[3] & 0xF1) | (1 << 1)  # ss_code = 1 (8-bit)
    payload[fh : fh + 5] = hdr
    # fix the header CRC-8 so the mismatch check (not the CRC) fires
    end = fh + 5
    payload[end] = FL._crc8(bytes(payload[fh:end]))
    with pytest.raises(ValueError, match="sample size"):
        FL.decode_flac(bytes(payload))


def test_empty_clip_rejected_at_encode():
    with pytest.raises(ValueError, match="empty"):
        FL.encode_flac(np.zeros((0, 1)), 8000)


def test_writer_rejects_out_of_range_fields():
    with pytest.raises(ValueError, match="fit"):
        FL.encode_flac(_sig(64, channels=1), rate=1 << 20)


def test_crc_enforced():
    sig = _sig(channels=1)
    payload = bytearray(FL.encode_flac(sig, 8000, block_size=1024))
    # flip a bit inside the first frame's audio data (past STREAMINFO)
    payload[60] ^= 0x10
    with pytest.raises(ValueError, match="CRC|sync|flac"):
        FL.decode_flac(bytes(payload))


def test_wasted_bits_unpacking():
    """A subframe with wasted bits shifts decoded samples back up."""
    bw = FL._BitWriter()
    bw.write(0, 1)
    bw.write(1, 6)  # VERBATIM
    bw.write(1, 1)  # wasted bits flag
    bw.write_unary(1)  # 2 wasted bits
    for v in (5, -3, 7):
        bw.write_signed(v, 14)  # eff_bps = 16 - 2
    br = FL._BitReader(bw.getvalue())
    got = FL._read_subframe(br, 3, 16)
    assert got == [20, -12, 28]


@pytest.mark.parametrize("seed", range(3))
def test_kernel_never_raises_uncatchable(seed):
    rng = random.Random(seed)
    sig = _sig(1500, channels=1)
    bases = [
        FL.encode_flac(sig, 8000, subframe="fixed2", block_size=512),
        FL.encode_flac(_sig(1500), 8000, mid_side=True, block_size=512),
    ]
    for base in bases:
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
            try:
                FL.decode_flac(bytes(buf))
            except ValueError:
                pass


def test_audio_dispatch_and_segmentation():
    sig = _sig(4000, channels=1, rate=1000)
    payload = FL.encode_flac(sig, 1000, block_size=1024)
    assert rawaudio.sniff_audio(payload)
    out, rate = rawaudio.decode_audio(payload)
    assert rate == 1000
    segs = rawaudio.segment_wav(payload, 500, 4)
    assert [s[0] for s in segs] == [0, 1, 2, 3]


def test_spark_features_on_flac(spark):
    sig = _sig(1000, channels=1, rate=1000)
    rows = [
        (0, bytearray(FL.encode_flac(sig, 1000, block_size=512))),
        (1, bytearray(b"fLaC truncated and hostile")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, clip binary")
    media = multimodal.with_media_columns(df, "clip", "audio/flac", "doc_id")
    out = multimodal.extract_features(media, fake=False).toPandas()
    ok = out[out["error"].isna()]
    assert list(ok["doc_id"]) == [0]
    assert list(out[out["error"].notna()]["doc_id"]) == [1]


def test_ogg_flac_mapping_roundtrip_and_hostiles():
    """Xiph Ogg-FLAC: reassembly through decode_ogg_pcm matches the
    native decode bit-exactly; mapping hostiles land as ValueError."""
    import numpy as np
    import pytest

    from rawdata_client_provider_gcs_spark.operators import rawogg as O

    sig = 0.125 * np.where(np.arange(120) % 2 == 0, 1.0, -1.0)
    native = FL.encode_flac(sig, 1000, block_size=128)
    blob = O.build_ogg_flac(native)
    pcm, rate = O.decode_ogg_pcm(blob)
    ref, rr = FL.decode_flac(native)
    assert rate == rr and np.array_equal(pcm, ref)
    # first packet: mapping major version must be 1
    bad = bytearray(blob)
    # locate the \x7fFLAC packet: page 0 body starts at 28 (27 hdr + 1 lace)
    idx = bad.find(b"\x7fFLAC")
    bad[idx + 5] = 2
    with pytest.raises(ValueError, match="mapping version"):
        O.decode_ogg_pcm(bytes(bad))
    # fLaC signature missing inside the first packet
    bad = bytearray(blob)
    bad[idx + 9 : idx + 13] = b"nope"
    with pytest.raises(ValueError, match="fLaC signature"):
        O.decode_ogg_pcm(bytes(bad))
    # fixture refuses non-FLAC input
    with pytest.raises(ValueError, match="not a native FLAC"):
        O.build_ogg_flac(b"RIFF....")
