"""Property-based codec proofs (hypothesis): the round-7 pure-Python
codecs -- GIF LZW + animated GIF, WAV/RIFF PCM, baseline JPEG -- are
exact (or error-bounded, for the lossy DCT) inverses on ARBITRARY
inputs, not just the crafted vectors in test_round7_ops.py. Same
strategy as test_kv_property.py: hypothesis explores the input space
(alphabet sizes that cross LZW width growth, dimensions that exercise
MCU padding, sample streams with clipping extremes) far beyond what
hand-written cases cover, and shrinks any failure to a minimal
counterexample.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from map_reduce_framework_spark.operators.audio import (
    decode_wav,
    encode_wav,
)
from map_reduce_framework_spark.operators.jpeg import (
    decode_jpeg_pixels,
    encode_jpeg,
)
from map_reduce_framework_spark.operators.multimodal import (
    _gif_lzw_decode,
    _gif_lzw_encode,
    decode_gif_frames,
    encode_gif,
)


@settings(max_examples=60, deadline=None)
@given(
    mcs=st.integers(min_value=2, max_value=8),
    data=st.data(),
)
def test_gif_lzw_roundtrip_property(mcs, data):
    """encode -> decode is the identity for any index stream over any
    legal alphabet, including streams long enough to grow the code
    width and highly repetitive streams that race to the 4096-entry
    table reset."""
    n = data.draw(st.integers(min_value=0, max_value=3000))
    stream = bytes(
        data.draw(
            st.lists(
                st.integers(0, (1 << mcs) - 1), min_size=n, max_size=n
            )
        )
    )
    out = _gif_lzw_decode(_gif_lzw_encode(stream, mcs), mcs, len(stream))
    assert out is not None and bytes(out) == stream


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    n_frames=st.integers(min_value=1, max_value=5),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_animated_gif_roundtrip_property(h, w, n_frames, seed):
    """encode_gif -> decode_gif_frames reproduces every frame's pixels
    exactly for any canvas size and frame count (grayscale palette is
    lossless)."""
    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, (h, w), dtype=np.uint8)
        for _ in range(n_frames)
    ]
    out = decode_gif_frames(encode_gif(frames))
    assert out is not None and len(out) == n_frames
    for a, b in zip(frames, out):
        assert np.array_equal(np.stack([a, a, a], axis=-1), b)


@settings(max_examples=60, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=500,
    ),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_property(samples, rate):
    """encode_wav -> decode_wav is the identity for any int16 sample
    stream at any common rate (PCM is lossless)."""
    out, got_rate, ch = decode_wav(encode_wav(samples, rate))
    assert got_rate == rate and ch == 1
    assert np.array_equal(out, np.array(samples, dtype=np.int16))


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_grayscale_error_bound_property(h, w, seed):
    """Baseline JPEG at quality 1 reconstructs ANY grayscale image
    within +/-1 per pixel (the only loss is DCT float rounding) at any
    dimensions, including non-multiple-of-8 edges."""
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 256, (h, w), dtype=np.uint8)
    out = decode_jpeg_pixels(encode_jpeg(g))
    assert out.shape == (h, w, 3)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 1


@settings(max_examples=30, deadline=None)
@given(v=st.integers(min_value=0, max_value=255),
       h=st.integers(min_value=1, max_value=20),
       w=st.integers(min_value=1, max_value=20))
def test_jpeg_constant_exact_property(v, h, w):
    """Constant images (DC-only blocks) roundtrip EXACTLY through the
    JPEG codec for every value and any dimensions."""
    out = decode_jpeg_pixels(encode_jpeg(np.full((h, w), v, np.uint8)))
    assert (out[:, :, 0] == v).all()
