"""Property tests for the pure-stdlib media codecs (no Spark session):
BMP 24-bit BI_RGB and YUV4MPEG2 Cmono roundtrip for arbitrary shapes,
including stride-padded widths, and WAV for arbitrary PCM16 content."""

import numpy as np
from hypothesis import given, settings, strategies as st

from spinterps_spark.operators import multimodal as M


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=37),
    h=st.integers(min_value=1, max_value=23),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_roundtrip_any_shape(w, h, seed):
    px = np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)
    payload = M.synth_bmp(px)
    # header + padded stride rows, exactly
    assert len(payload) == 54 + ((w * 3 + 3) // 4 * 4) * h
    np.testing.assert_array_equal(M.decode_bmp(payload), px)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=16),
    nf=st.integers(min_value=0, max_value=6),
    fps=st.integers(min_value=1, max_value=120),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_y4m_roundtrip_any_shape(w, h, nf, fps, seed):
    fr = np.random.RandomState(seed).randint(0, 256, (nf, h, w)).astype(np.uint8)
    back, got_fps = M.decode_y4m(M.synth_y4m(fr, fps=fps))
    assert got_fps == fps
    assert back.shape == (nf, h, w)
    np.testing.assert_array_equal(back, fr)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=500),
    sr=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_roundtrip_any_content(n, sr, seed):
    s = (
        np.random.RandomState(seed)
        .randint(-(2**15), 2**15, n)
        .astype(np.int16)
    )
    back, got_sr = M.decode_wav(M.synth_wav(s, sample_rate=sr))
    assert got_sr == sr
    np.testing.assert_array_equal(back, s)
