"""Audio-quality curation signals (rawaudio.audio_quality)."""

import math

import numpy as np

from rawdata_client_provider_gcs_spark.operators import rawaudio as A


def test_hand_case_all_signals():
    z = np.zeros(40)
    c = np.where(np.arange(40) % 2 == 0, 1.0, -1.0)
    m = np.where(np.arange(60) % 2 == 0, 0.25, -0.25)
    q = A.audio_quality(np.concatenate([z, c, m])[:, None], 1000)
    rms = math.sqrt((40 + 60 * 0.0625) / 140)
    assert q[0] == 40 / 140          # clipping
    assert q[1] == 2 / 7             # 2 of 7 windows silent
    assert q[2] == 0.0               # alternating: zero DC
    assert abs(q[3] - 20 * math.log10(1 / rms)) < 1e-12
    assert q[4] == 40 / 140          # leading trim


def test_trailing_and_middle_silence():
    # active, silent, active, silent: trim drops only the tail
    sig = np.concatenate([
        np.where(np.arange(20) % 2 == 0, 0.5, -0.5),
        np.zeros(40),
        np.where(np.arange(20) % 2 == 0, 0.5, -0.5),
        np.zeros(20),
    ])
    q = A.audio_quality(sig[:, None], 1000)
    assert q[1] == 3 / 5
    assert q[4] == 20 / 100  # middle silence is NOT trimmable


def test_stereo_mono_mix_and_dc():
    # L = +0.5 constant, R = 0: mono mix = +0.25 constant
    s = np.zeros((40, 2))
    s[:, 0] = 0.5
    q = A.audio_quality(s, 1000)
    assert q[2] == 0.25              # DC offset survives the mix
    assert q[3] == 0.0               # constant: peak == rms
    assert q[1] == 0.0


def test_odd_tail_window_and_empty():
    # 25 samples at 1 kHz: one full 20-sample window + a 5-sample tail
    sig = np.concatenate([np.zeros(20), np.full(5, 0.5)])
    q = A.audio_quality(sig[:, None], 1000)
    assert q[1] == 0.5               # 1 of 2 windows silent
    assert q[4] == 0.8               # 20 leading samples of 25 trimmed
    assert A.audio_quality(np.zeros((0, 1)), 1000) == [0.0] * 5
    assert A.audio_quality(np.zeros((100, 1)), 1000) == \
        [0.0, 1.0, 0.0, 0.0, 1.0]


def test_clip_threshold_edge():
    sig = np.concatenate([np.full(10, 0.999), np.full(10, 0.9989)])
    q = A.audio_quality(sig[:, None], 1000)
    assert q[0] == 0.5               # >= threshold counts, below not
