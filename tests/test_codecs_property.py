"""Property tests for the dependency-free PNG/WAV codecs: any array in
the supported subset must round-trip bit-exactly through real encoded
bytes (the decode path exercises zlib inflate + all emitted filter
types / RIFF chunk walk on every example)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mbta_etl_spark.functions.codecs import (
    decode_png,
    decode_wav_pcm16,
    encode_png,
    encode_wav_pcm16,
)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_any_shape(h, w, c, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    out = decode_png(encode_png(px if c > 1 else px[:, :, 0]))
    assert out.shape == (h, w, c)
    assert np.array_equal(out, px)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 2048),
    ch=st.sampled_from([1, 2]),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_any_length(n, ch, rate, seed):
    rng = np.random.default_rng(seed)
    shape = (n,) if ch == 1 else (n, ch)
    s = rng.integers(-32768, 32768, shape, dtype=np.int16)
    r, back = decode_wav_pcm16(encode_wav_pcm16(s, rate))
    assert r == rate
    assert np.array_equal(back, s)
