"""AIFF / Sun-AU codec tests: roundtrips, stdlib parity where the
deprecated modules still import, AIFC branches, hostile bytes, and the
container-dispatching Spark kernels."""

import random

import numpy as np
import pytest

from rawdata_client_provider_gcs_spark.operators import multimodal, rawaudio as R


def _sig(frames=800, channels=2, rate=8000):
    t = np.arange(frames) / rate
    cols = [np.sin(2 * np.pi * 440 * t), np.cos(2 * np.pi * 220 * t)]
    return np.stack(cols[:channels], axis=1) * 0.5


def test_aiff_pcm16_roundtrip():
    sig = _sig()
    out, rate = R.decode_aiff(R.encode_aiff_pcm16(sig, 8000))
    assert rate == 8000 and out.shape == sig.shape
    assert np.abs(out - sig).max() <= 1 / 32768 * 1.01


def test_au_pcm16_roundtrip():
    sig = _sig()
    out, rate = R.decode_au(R.encode_au(sig, 8000, "pcm16"))
    assert rate == 8000 and out.shape == sig.shape
    assert np.abs(out - sig).max() <= 1 / 32768 * 1.01


def test_au_ulaw_roundtrip_snr():
    sig = _sig(channels=1)
    out, _ = R.decode_au(R.encode_au(sig, 8000, "ulaw"))
    snr = 10 * np.log10((sig**2).mean() / ((out - sig) ** 2).mean())
    assert snr > 30  # G.711 design point


def test_aiff_stdlib_parity():
    """Our AIFF writer must be readable by stdlib aifc and vice versa
    (module deprecated but still present here — gate on import)."""
    aifc = pytest.importorskip("aifc")
    import io

    sig = _sig()
    buf = io.BytesIO(R.encode_aiff_pcm16(sig, 8000))
    with aifc.open(buf) as f:
        assert f.getnchannels() == 2
        assert f.getframerate() == 8000
        assert f.getsampwidth() == 2
        raw = f.readframes(f.getnframes())
    theirs = np.frombuffer(raw, np.dtype(">i2")).reshape(-1, 2) / 32768.0
    ours, _ = R.decode_aiff(R.encode_aiff_pcm16(sig, 8000))
    assert np.allclose(theirs, ours)
    # their writer, our reader (aifc closes the underlying buffer on
    # exit, so keep the bytes reachable)
    class KeepOpen(io.BytesIO):
        def close(self):  # aifc flushes in close(); defer the real one
            pass

    wbuf = KeepOpen()
    with aifc.open(wbuf, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes(
            np.clip(np.round(sig * 32768), -32768, 32767)
            .astype(">i2")
            .tobytes()
        )
    out, rate = R.decode_aiff(wbuf.getvalue())
    assert rate == 8000 and np.abs(out - sig).max() <= 1 / 32768 * 1.01


def test_aifc_sowt_and_float_branches():
    """Hand-build AIFC containers for the sowt and fl32 encodings."""
    sig = (_sig(channels=1)[:, 0] * 32768).round().astype("<i2")

    def aifc(compression, data, bits):
        comm = (
            (1).to_bytes(2, "big")
            + len(sig).to_bytes(4, "big")
            + bits.to_bytes(2, "big")
            + R._write_extended80(8000.0)
            + compression
            + b"\x00\x00"  # empty pascal name (len 0) + even pad
        )
        ssnd = bytes(8) + data
        body = (
            b"AIFC"
            + b"COMM"
            + len(comm).to_bytes(4, "big")
            + comm
            + b"SSND"
            + len(ssnd).to_bytes(4, "big")
            + ssnd
        )
        return b"FORM" + len(body).to_bytes(4, "big") + body

    out, rate = R.decode_aiff(aifc(b"sowt", sig.tobytes(), 16))
    assert rate == 8000
    assert np.allclose(out[:, 0], sig / 32768.0)

    f32 = (sig / 32768.0).astype(">f4")
    out2, _ = R.decode_aiff(aifc(b"fl32", f32.tobytes(), 32))
    assert np.allclose(out2[:, 0], f32.astype(np.float64))


def test_extended80_roundtrip():
    for rate in (8000, 11025, 22050, 44100, 48000, 1000):
        assert R._read_extended80(R._write_extended80(float(rate))) == rate


@pytest.mark.parametrize("exp_bytes", [b"\x7f\xfe", b"\x43\xff", b"\x00\x01"])
def test_extended80_hostile_exponents_are_valueerror(exp_bytes):
    """Exponents that would overflow float64 (or denormal-underflow)
    must raise ValueError, never OverflowError — the loud-boundary
    class _catch_row and the fuzz suite rely on."""
    blob = exp_bytes + (1 << 63).to_bytes(8, "big")
    with pytest.raises(ValueError):
        R._read_extended80(blob)


def test_dispatch_and_segmentation():
    sig = _sig(frames=4000, channels=1, rate=1000)
    for payload in (
        R.encode_aiff_pcm16(sig, 1000),
        R.encode_au(sig, 1000, "pcm16"),
    ):
        assert R.sniff_audio(payload)
        segs = R.segment_wav(payload, 500, 4)
        assert [s[0] for s in segs] == [0, 1, 2, 3]
        # every segment is a standalone WAV clip
        for _, _, wav in segs:
            assert R.sniff_wav(wav)


@pytest.mark.parametrize("seed", range(3))
def test_kernels_never_raise_uncatchable(seed):
    rng = random.Random(seed)
    sig = _sig(channels=1)
    for base in (
        R.encode_aiff_pcm16(sig, 8000),
        R.encode_au(sig, 8000, "pcm16"),
        R.encode_au(sig, 8000, "ulaw"),
    ):
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
                R.decode_audio(bytes(buf))
            except ValueError:
                pass


def test_spark_features_dispatch_all_containers(spark):
    sig = _sig(frames=1000, channels=1, rate=1000)
    rows = [
        (0, bytearray(R.encode_wav_pcm16(sig, 1000)), "audio/wav"),
        (1, bytearray(R.encode_aiff_pcm16(sig, 1000)), "audio/aiff"),
        (2, bytearray(R.encode_au(sig, 1000, "pcm16")), "audio/basic"),
        (3, bytearray(b"not audio at all"), "audio/aiff"),
    ]
    dfs = []
    for did, payload, mime in rows:
        df = spark.createDataFrame([(did, payload)], "doc_id long, clip binary")
        dfs.append(multimodal.with_media_columns(df, "clip", mime, "doc_id"))
    media = dfs[0]
    for d in dfs[1:]:
        media = media.unionByName(d)
    out = multimodal.extract_features(media, fake=False).toPandas()
    ok = out[out["error"].isna()].sort_values("doc_id")
    assert list(ok["doc_id"]) == [0, 1, 2]
    # same clip through AIFF and AU (identical quantizers) -> identical
    # features; the WAV writer rounds at a different full-scale, so it
    # matches to quantization error only
    f = [list(x) for x in ok["features"]]
    assert f[1] == pytest.approx(f[2], abs=1e-12)
    assert f[0] == pytest.approx(f[1], rel=1e-3)
    bad = out[out["error"].notna()]
    assert list(bad["doc_id"]) == [3]
