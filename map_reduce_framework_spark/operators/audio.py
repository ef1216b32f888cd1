"""Audio modality: WAV/RIFF PCM as an opaque BINARY column, processed
by Arrow-batched pandas UDFs -- completing "multimodal columns" across
image (multimodal.py, real BMP/PNG/GIF), video (video_frame_dhash, real
animated GIF), and audio (this module, real WAV).

Everything is dependency-free per the RIFF/WAVE spec: ``encode_wav``
writes mono 16-bit PCM (stdlib struct-free byte arithmetic) and
``decode_wav`` walks the chunk list back to the int16 samples. Each
doc's clip is GENERATED deterministically from its tokens -- token i
contributes a 16-sample chunk whose samples are its md5 bytes recentred
to int16 ((b - 128) * 256) -- so every registered query runs the REAL
codec round trip (generate -> encode_wav -> decode_wav -> feature
math) while the DuckDB oracle recomputes the same numbers from md5
token bytes alone: a sweep match certifies the codec end to end,
exactly like image_dhash certifies the BMP path and video_frame_dhash
the animated-GIF path.

Two registered surfaces:

* ``audio_features`` -- per-clip duration/peak/RMS/clipping/silence,
  the filter columns an audio curation pipeline keys on (cf. the
  audio-quality heuristics in large-scale speech datasets: clipping
  and silence ratios are the standard junk detectors).
* ``audio_fingerprint_pairs`` -- sample-block fingerprint near-dup:
  every 4-chunk (64-sample) sliding window hashes to an exact-integer
  polynomial fingerprint (mod 2^61-1, precomputed power table shared
  with the oracle); docs sharing >= AUDIO_FP_MIN distinct window
  fingerprints are near-duplicate clips. Blocking is the fingerprint
  equi-join itself -- matching windows are rare across unrelated docs
  (vocab^4 windows), so this is never an all-pairs comparison, the
  same scale argument as MinHash banding.

Scale notes: generation+decode+features is scan-bound Arrow map work
(no shuffle); the pair relation shuffles only exploded (doc, window,
fp) rows on fp -- at 100 TB the fingerprint join behaves like any
shingle-gram join, with AQE skew handling on pathological fp keys.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

AUDIO_RATE = 8000  # Hz; 8 kHz telephony rate keeps payloads small
CHUNK_SAMPLES = 16  # samples contributed per token (md5 has 16 bytes)
AUDIO_MAX_TOKENS = 64  # cap: clips are <= 1024 samples / ~2 KiB PCM
CLIP_THRESH = 30000  # |s| >= this counts as clipped
SILENCE_THRESH = 2000  # |s| <= this counts as silent
FP_WINDOW_CHUNKS = 4  # fingerprint window: 4 chunks = 64 samples
AUDIO_FP_MIN = 3  # near-dup pairs share >= this many distinct fps

#: Exact-integer polynomial fingerprint: fp = sum(s'_k * P^k) mod M
#: over the window's 64 samples shifted non-negative (s + 32768).
#: M = 2^61 - 1 (Mersenne), P an odd mixing constant; the power table
#: is precomputed HERE and inlined into the DuckDB oracle as literals,
#: so both engines do pure integer arithmetic -- no float, no hashing
#: library semantics to match.
FP_MOD = (1 << 61) - 1
FP_P = 1315423911
FP_POWERS = [pow(FP_P, k, FP_MOD) for k in range(FP_WINDOW_CHUNKS * CHUNK_SAMPLES)]


def _fp_powers_np():
    """(powers, hi-limbs, lo-limbs) int64 arrays for the vectorized
    Mersenne modmul (powers = hi * 2^30 + lo)."""
    import numpy as np

    p = np.asarray(FP_POWERS, dtype=np.int64)
    return p, p >> 30, p & ((1 << 30) - 1)


_FP_POWERS_NP = None  # set lazily below (numpy import stays function-local)

#: Robust (gain-invariant) fingerprint geometry: each 64-sample window
#: splits into RFP_BLOCKS subblocks of RFP_BLOCK_SAMPLES samples;
#: subblock ENERGY RATIOS E_b * RFP_Q // T (T = window energy) are
#: quantized to 6 bits and polynomial-combined mod 2^61-1. A gain
#: change scales every E_b and T by g^2, so the ratios -- hence the
#: fingerprint -- are invariant (exactly so for exact rational scaling,
#: e.g. halving even samples); the exact sample-value fingerprint above
#: breaks under ANY gain change. This is the Haitsma-Kalker band-energy
#: idea (ISMIR 2002, "A Highly Robust Audio Fingerprinting System")
#: with time-domain subblock energies playing the band energies, chosen
#: over an FFT so the arithmetic stays integer-exact cross-engine.
RFP_BLOCKS = 16
RFP_BLOCK_SAMPLES = 4  # 16 x 4 = the 64-sample window
RFP_Q = 64  # ratio quantization: 6 bits per subblock


def encode_wav(samples, sample_rate: int = AUDIO_RATE) -> bytes:
    """Dependency-free mono 16-bit PCM RIFF/WAVE writer: canonical
    44-byte header + little-endian int16 samples."""
    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * 2
    hdr = (
        b"RIFF"
        + (36 + len(pcm)).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + (1).to_bytes(2, "little")  # mono
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (2).to_bytes(2, "little")  # block align
        + (16).to_bytes(2, "little")  # bits per sample
        + b"data"
        + len(pcm).to_bytes(4, "little")
    )
    return hdr + pcm


def encode_wav_float(samples, sample_rate: int = AUDIO_RATE) -> bytes:
    """IEEE-float (format tag 3) mono RIFF/WAVE writer: samples stored
    as float32 in [-1, 1) via s / 32768 -- EXACTLY representable for
    every int16 (float32 carries 24 mantissa bits), so the int16
    round trip through decode_wav is lossless (round 11: the 'float'
    WAV class left the rejected set)."""
    import numpy as np

    f = (np.asarray(samples, dtype="<i2").astype(np.float64) / 32768.0)
    pcm = f.astype("<f4").tobytes()
    byte_rate = sample_rate * 4
    hdr = (
        b"RIFF"
        + (36 + len(pcm)).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + (16).to_bytes(4, "little")
        + (3).to_bytes(2, "little")  # IEEE float
        + (1).to_bytes(2, "little")  # mono
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (4).to_bytes(2, "little")  # block align
        + (32).to_bytes(2, "little")  # bits per sample
        + b"data"
        + len(pcm).to_bytes(4, "little")
    )
    return hdr + pcm


def decode_wav(payload: bytes):
    """Dependency-free WAV decode: returns (samples int16 numpy array
    of channel 0, sample_rate, n_channels), or None when the payload
    is not 16-bit-PCM or 32-bit-IEEE-float RIFF/WAVE (float samples
    quantize back through round(f * 32768), the encode_wav_float
    inverse -- exact for any clip that started life as int16). Walks
    the chunk list per the RIFF spec (chunks are word-aligned; fmt
    must precede data), so writers that insert LIST/fact chunks still
    decode."""
    import numpy as np

    n = len(payload)
    if n < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        clen = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            return None
        if cid == b"fmt ":
            if clen < 16:
                return None
            audio_format = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if channels < 1 or rate <= 0:
                return None
            if audio_format == 1 and bits == 16:
                fmt = (channels, rate, "i2")
            elif audio_format == 3 and bits == 32:
                fmt = (channels, rate, "f4")
            else:
                return None
        elif cid == b"data":
            if fmt is None:
                return None
            channels, rate, kind = fmt
            if kind == "i2":
                frames = np.frombuffer(
                    body,
                    dtype="<i2",
                    count=(clen // 2 // channels) * channels,
                ).reshape(-1, channels)
                return frames[:, 0].copy(), rate, channels
            frames = np.frombuffer(
                body,
                dtype="<f4",
                count=(clen // 4 // channels) * channels,
            ).reshape(-1, channels)
            ch0 = np.clip(
                np.rint(frames[:, 0].astype(np.float64) * 32768.0),
                -32768,
                32767,
            ).astype("<i2")
            return ch0, rate, channels
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    return None


def decode_audio(payload):
    """The one audio-payload dispatcher: RIFF/WAVE through decode_wav,
    fLaC through operators/flac.decode_flac (round 11), raw MPEG-1
    Layer I/II bitstreams through operators/mpeg_audio.decode_mpeg
    (round 12; the sniff is the strict whole-stream header walk, so
    random binary cannot false-positive) -- all return (samples int16
    array, rate, channels) or None. A FLAC or MPEG re-encoding of a
    WAV clip therefore lands in the SAME fingerprint space, which is
    how the planted cross-codec duplicates are caught."""
    if len(payload) >= 4 and bytes(payload[:4]) == b"fLaC":
        from .flac import decode_flac

        return decode_flac(payload)
    if len(payload) >= 12 and bytes(payload[:4]) == b"RIFF":
        return decode_wav(payload)
    from .mpeg_audio import decode_mpeg, mpeg_stream_info

    if mpeg_stream_info(payload) is not None:
        return decode_mpeg(payload)
    return decode_wav(payload)


def _token_chunk(token: str) -> list[int]:
    """The 16 int16 samples a token contributes: its md5 bytes,
    recentred ((b - 128) * 256, exactly int16 range)."""
    return [(b - 128) * 256 for b in hashlib.md5(token.encode()).digest()]


def _doc_samples(tokens: list) -> list[int]:
    """A doc's clip: per-token 16-sample chunks concatenated in order,
    capped at AUDIO_MAX_TOKENS tokens; a tokenless doc contributes the
    empty-string token's chunk (clips are never zero-length, like a
    real recorder's minimum buffer)."""
    toks = tokens[:AUDIO_MAX_TOKENS] if tokens else [""]
    out: list[int] = []
    cache: dict = {}
    for t in toks:
        c = cache.get(t)
        if c is None:
            c = _token_chunk(t)
            cache[t] = c
        out.extend(c)
    return out


_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("peak", IntegerType()),
        StructField("rms_q6", LongType()),
        StructField("n_clipped", LongType()),
        StructField("clipping_ratio", DoubleType()),
        StructField("n_silent", LongType()),
        StructField("silence_ratio", DoubleType()),
    ]
)


def audio_features(
    documents: DataFrame, *, codec: str = "wav"
) -> DataFrame:
    """Per-clip audio features through the REAL codec round trip:
    generate samples from tokens, encode, decode, then compute
    duration / peak / RMS / clipping ratio / silence ratio from the
    DECODED int16 stream. ``codec`` picks the round-trip pair: 'wav'
    (encode_wav/decode_wav), 'wav_float' (IEEE-float samples,
    quantized back exactly), 'flac' (round 11 -- the Rice-coded
    constant/fixed path), 'flac_lpc' (every subframe through the LPC
    wire format), or 'flac_ms' (STEREO mid/side decorrelation, clip
    on the left channel); the oracle is IDENTICAL md5 token math, so
    a sweep hash match certifies each codec path end to end exactly
    like the WAV one. All integer or exactly-quantized math:
    rms_q6 = floor(sqrt(sum(s^2)/n) * 1e6 + 0.5) (sum(s^2) < 2^53, so
    the double divide and IEEE sqrt are bit-deterministic across
    engines); the ratios are int/int doubles. One Arrow-batched pass,
    no shuffle -- scan-bound map work at 100 TB."""
    import math

    from ..functions.text import _WS_RE

    if codec in ("flac", "flac_lpc"):
        from .flac import decode_flac as _dec
        from .flac import encode_flac

        _mode = "lpc" if codec == "flac_lpc" else None

        def _enc(samples):
            return encode_flac(samples, mode=_mode)
    elif codec == "flac_ms":
        # STEREO mid/side round trip: the clip rides the LEFT channel
        # (a deterministic right channel -- the reversed clip -- keeps
        # the decorrelation honest: mid and side are both nontrivial);
        # decode returns channel 0, so the features -- and the oracle
        # -- are unchanged while the whole stereo reconstruction path
        # is certified per document
        from .flac import decode_flac as _dec
        from .flac import encode_flac_stereo

        def _enc(samples):
            return encode_flac_stereo(
                samples, list(samples)[::-1], mode="mid_side"
            )
    elif codec == "wav_float":
        _enc, _dec = encode_wav_float, decode_wav
    else:
        _enc, _dec = encode_wav, decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in [f.name for f in _FEATURES_SCHEMA.fields]}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = [t for t in _WS_RE.split(str(text) or "") if t]
                payload = _enc(_doc_samples(toks))
                samples, rate, _ch = _dec(payload)
                s = samples.astype("int64")
                n = len(s)
                sum_sq = int((s * s).sum())
                a = abs(s)
                n_clip = int((a >= CLIP_THRESH).sum())
                n_sil = int((a <= SILENCE_THRESH).sum())
                out["doc_id"].append(doc_id)
                out["n_samples"].append(n)
                out["sample_rate"].append(rate)
                out["duration_ms"].append(n * 1000 // rate)
                out["peak"].append(int(a.max()))
                out["rms_q6"].append(
                    math.floor(math.sqrt(sum_sq / n) * 1e6 + 0.5)
                )
                out["n_clipped"].append(n_clip)
                out["clipping_ratio"].append(n_clip / n)
                out["n_silent"].append(n_sil)
                out["silence_ratio"].append(n_sil / n)
            yield pd.DataFrame(out)

    from .text_analysis import _fan_out

    base = documents.select("doc_id", "text")
    # single-file scans are one partition: repartition so the codec
    # work parallelizes (the measured single-scan trap, SCALE.md)
    return _fan_out(base).mapInPandas(
        run, schema=_FEATURES_SCHEMA
    )


def _window_fingerprints_scalar(samples, *, drop_silent: bool = True) -> list:
    """Per-sample scalar spec form of ``window_fingerprints`` -- kept as
    the pinned reference the vectorized kernel is tested bit-equal to."""
    win = FP_WINDOW_CHUNKS * CHUNK_SAMPLES
    vals = [int(v) for v in samples]
    n_chunks = len(vals) // CHUNK_SAMPLES
    out = []
    for i in range(n_chunks - FP_WINDOW_CHUNKS + 1):
        base = i * CHUNK_SAMPLES
        wnd = vals[base : base + win]
        if drop_silent and max(abs(v) for v in wnd) <= SILENCE_THRESH:
            continue
        fp = 0
        for k in range(win):
            fp = (fp + (wnd[k] + 32768) * FP_POWERS[k]) % FP_MOD
        out.append((i, fp))
    return out


def _robust_window_fingerprints_scalar(samples) -> list:
    """Scalar spec form of ``robust_window_fingerprints`` (pinned
    reference for the vectorized kernel)."""
    win = FP_WINDOW_CHUNKS * CHUNK_SAMPLES
    vals = [int(v) for v in samples]
    n_chunks = len(vals) // CHUNK_SAMPLES
    out = []
    for i in range(n_chunks - FP_WINDOW_CHUNKS + 1):
        base = i * CHUNK_SAMPLES
        wnd = vals[base : base + win]
        if max(abs(v) for v in wnd) <= SILENCE_THRESH:
            continue
        e = [
            sum(
                v * v
                for v in wnd[
                    b * RFP_BLOCK_SAMPLES : (b + 1) * RFP_BLOCK_SAMPLES
                ]
            )
            for b in range(RFP_BLOCKS)
        ]
        total = sum(e)
        if total == 0:
            continue
        rfp = 0
        for b in range(RFP_BLOCKS):
            code = min(e[b] * RFP_Q // total, RFP_Q - 1)
            rfp = (rfp + code * FP_POWERS[b]) % FP_MOD
        out.append((i, rfp))
    return out


_FP_M61 = FP_MOD  # 2^61 - 1, a Mersenne prime
_MASK30 = (1 << 30) - 1
_MASK31 = (1 << 31) - 1


def _mulmod_small_vec(a, bh, bl):
    """Exact (a * b) mod 2^61-1 for int64 arrays with a < 2^18 and
    b = bh*2^30 + bl < 2^61 (bh, bl precomputed): the shifted-limb
    Mersenne reduction, every intermediate provably < 2^63.

        a*b = (a*bh)*2^30 + a*bl
        t*2^30 mod M = (t>>31) + ((t & 2^31-1) << 30)   [2^61 == 1 mod M]

    Result is < 2^61 + 2 (one fold) -- congruent mod M, NOT fully
    reduced; callers fold after summation."""
    t = a * bh  # < 2^18 * 2^31 = 2^49
    r = (t >> 31) + ((t & _MASK31) << 30) + a * bl  # < 2^18 + 2^61 + 2^48
    return (r & _FP_M61) + (r >> 61)  # < 2^61 + 2


def _fold61(x):
    """Fully reduce congruent values (< 2^63) into [0, M)."""
    import numpy as np

    x = (x & _FP_M61) + (x >> 61)
    x = (x & _FP_M61) + (x >> 61)
    return np.where(x >= _FP_M61, x - _FP_M61, x)


def window_fingerprints(samples, *, drop_silent: bool = True) -> list:
    """(window_idx, fp) for every 64-sample sliding window (stride one
    chunk) of an int16 sample stream -- the shared engine kernel for
    the generated-clip and real-payload paths. ``drop_silent`` skips
    windows whose every sample is within SILENCE_THRESH: true silence
    produces CONSTANT blocks, i.e. one colossal fingerprint key shared
    by every quiet clip -- the pathological skew the fp equi-join can
    see (SCALE.md's documented knob, now code; tests plant it).

    Vectorized (r12, guide §4.2): all windows of a clip at once via a
    sliding-window view and exact int64 Mersenne modmuls -- bit-equal to
    ``_window_fingerprints_scalar`` (pinned by test): modular arithmetic
    is exact, only the evaluation order differs, and every intermediate
    is bounded < 2^63 (see _mulmod_small_vec)."""
    import numpy as np

    win = FP_WINDOW_CHUNKS * CHUNK_SAMPLES
    vals = np.asarray(samples, dtype=np.int64)
    n_chunks = len(vals) // CHUNK_SAMPLES
    nw = n_chunks - FP_WINDOW_CHUNKS + 1
    if nw <= 0:
        return []
    usable = vals[: n_chunks * CHUNK_SAMPLES]
    wnd = np.lib.stride_tricks.sliding_window_view(usable, win)[
        ::CHUNK_SAMPLES
    ]  # (nw, 64)
    keep = np.ones(nw, dtype=bool)
    if drop_silent:
        keep = np.abs(wnd).max(axis=1) > SILENCE_THRESH
    idx = np.flatnonzero(keep)
    if len(idx) == 0:
        return []
    a = wnd[idx] + 32768  # < 2^17
    global _FP_POWERS_NP
    if _FP_POWERS_NP is None:
        _FP_POWERS_NP = _fp_powers_np()
    powers = _FP_POWERS_NP
    terms = _mulmod_small_vec(a, powers[1], powers[2])  # each < 2^61+2
    acc = np.zeros(len(idx), dtype=np.int64)
    for k in range(win):  # acc < 2^61+2; sum < 2^62+4 < 2^63
        acc = acc + terms[:, k]
        acc = (acc & _FP_M61) + (acc >> 61)
    fps = _fold61(acc)
    return [(int(i), int(f)) for i, f in zip(idx, fps)]


def robust_window_fingerprints(samples) -> list:
    """(window_idx, rfp) gain-invariant fingerprints: quantized
    subblock-energy RATIOS (see RFP_BLOCKS) polynomial-combined.
    All-silent windows are always dropped (they are both the skew keys
    and ratio-undefined when the energy is zero). Vectorized like
    ``window_fingerprints``; bit-equal to the scalar spec form (energies
    and codes are exact int64 -- e < 2^32, e*RFP_Q < 2^38)."""
    import numpy as np

    win = FP_WINDOW_CHUNKS * CHUNK_SAMPLES
    vals = np.asarray(samples, dtype=np.int64)
    n_chunks = len(vals) // CHUNK_SAMPLES
    nw = n_chunks - FP_WINDOW_CHUNKS + 1
    if nw <= 0:
        return []
    usable = vals[: n_chunks * CHUNK_SAMPLES]
    wnd = np.lib.stride_tricks.sliding_window_view(usable, win)[
        ::CHUNK_SAMPLES
    ]
    keep = np.abs(wnd).max(axis=1) > SILENCE_THRESH
    # subblock energies: block sums of v^2, then windows of RFP_BLOCKS
    # consecutive blocks (window i starts at block i * chunk/block)
    v2 = usable * usable  # < 2^30
    blocks = v2.reshape(-1, RFP_BLOCK_SAMPLES).sum(axis=1)  # < 2^32
    blocks_per_chunk = CHUNK_SAMPLES // RFP_BLOCK_SAMPLES
    e = np.lib.stride_tricks.sliding_window_view(blocks, RFP_BLOCKS)[
        ::blocks_per_chunk
    ]  # (nw, RFP_BLOCKS)
    total = e.sum(axis=1)  # < 2^36
    keep &= total > 0
    idx = np.flatnonzero(keep)
    if len(idx) == 0:
        return []
    codes = np.minimum(
        (e[idx] * RFP_Q) // total[idx, None], RFP_Q - 1
    )  # exact int64: e*RFP_Q < 2^38
    global _FP_POWERS_NP
    if _FP_POWERS_NP is None:
        _FP_POWERS_NP = _fp_powers_np()
    powers = _FP_POWERS_NP
    terms = _mulmod_small_vec(
        codes, powers[1][:RFP_BLOCKS], powers[2][:RFP_BLOCKS]
    )
    acc = np.zeros(len(idx), dtype=np.int64)
    for b in range(RFP_BLOCKS):
        acc = acc + terms[:, b]
        acc = (acc & _FP_M61) + (acc >> 61)
    rfps = _fold61(acc)
    return [(int(i), int(f)) for i, f in zip(idx, rfps)]


def _fp_map(documents: DataFrame, kernel, col_name: str) -> DataFrame:
    """Generated-clip fingerprint scan: tokens -> encode_wav ->
    decode_wav -> ``kernel`` per doc, Arrow-batched, repartitioned to
    cluster width first (the single-file scan trap)."""
    from ..functions.text import _WS_RE
    from .text_analysis import _fan_out

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("window_idx", IntegerType()),
            StructField(col_name, LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "window_idx": [], col_name: []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = [t for t in _WS_RE.split(str(text) or "") if t]
                payload = encode_wav(_doc_samples(toks))
                samples, _rate, _ch = decode_wav(payload)
                for i, fp in kernel(samples):
                    out["doc_id"].append(doc_id)
                    out["window_idx"].append(i)
                    out[col_name].append(fp)
            yield pd.DataFrame(out)

    base = documents.select("doc_id", "text")
    return _fan_out(base).mapInPandas(
        run, schema=schema
    )


def audio_fingerprints(
    documents: DataFrame, *, drop_silent: bool = True
) -> DataFrame:
    """(doc_id, window_idx, fp): every 4-chunk (64-sample) sliding
    window's exact-integer polynomial fingerprint over the DECODED
    samples -- window i covers chunks i..i+3 (stride one chunk), so a
    one-token edit invalidates exactly the <= 4 windows covering it
    while every other window survives, the locality a fingerprint
    dedup needs. Computed from the real encode->decode round trip.
    All-silent windows are dropped by default (the constant-block skew
    keys; see window_fingerprints)."""

    def kernel(samples):
        return window_fingerprints(samples, drop_silent=drop_silent)

    return _fp_map(documents, kernel, "fp")


def audio_fingerprints_robust(documents: DataFrame) -> DataFrame:
    """(doc_id, window_idx, rfp): the gain-invariant subblock-energy-
    ratio fingerprints of every window (robust_window_fingerprints),
    through the same real codec round trip. Catches duplicates the
    exact fp misses -- a re-gained copy of a clip (volume change,
    normalization pass) shares every rfp and NO exact fp (the planted
    test asserts both)."""
    return _fp_map(documents, robust_window_fingerprints, "rfp")


def audio_fingerprints_from_payloads(
    df: DataFrame,
    payload_col: str = "payload",
    *,
    robust: bool = False,
    drop_silent: bool = True,
) -> DataFrame:
    """Fingerprints over a REAL audio binary column (doc_id, payload)
    -- WAV or FLAC, dispatched by magic (decode_audio): the production
    entry point -- the registered queries generate their clips from
    tokens so the DuckDB oracle can certify the codecs, but a real
    corpus carries opaque payloads. Undecodable payloads are skipped
    (curation drops junk, it does not crash). Same kernels as the
    generated path, so a FLAC copy of a WAV clip shares every
    fingerprint."""
    from .text_analysis import _fan_out

    name = "rfp" if robust else "fp"
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("window_idx", IntegerType()),
            StructField(name, LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "window_idx": [], name: []}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                decoded = decode_audio(bytes(payload))
                if decoded is None:
                    continue
                samples, _rate, _ch = decoded
                fps = (
                    robust_window_fingerprints(samples)
                    if robust
                    else window_fingerprints(
                        samples, drop_silent=drop_silent
                    )
                )
                for i, fp in fps:
                    out["doc_id"].append(doc_id)
                    out["window_idx"].append(i)
                    out[name].append(fp)
            yield pd.DataFrame(out)

    base = df.select("doc_id", payload_col)
    return _fan_out(base).mapInPandas(
        run, schema=schema
    )


def audio_fingerprint_pairs(
    documents: DataFrame, min_shared: int = AUDIO_FP_MIN
) -> DataFrame:
    """Near-duplicate CLIP pairs (doc_a < doc_b, n_shared_fp): an
    equi-join of window fingerprints (position-independent, so a clip
    embedded at a different offset still matches), counting the
    DISTINCT shared fingerprints per doc pair; >= min_shared is a
    near-dup. The fp equi-join IS the blocking -- unrelated docs share
    no 4-token windows, so candidates stay near-linear (the shingle-
    join scale argument)."""
    fps = audio_fingerprints(documents)
    a = fps.alias("a")
    b = fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.fp").alias("fp"),
        )
        .distinct()
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("n_shared_fp"))
        .where(F.col("n_shared_fp") >= min_shared)
    )


def audio_robust_fp_pairs(
    documents: DataFrame, min_shared: int = AUDIO_FP_MIN
) -> DataFrame:
    """Near-duplicate clip pairs under the GAIN-INVARIANT fingerprint
    (doc_a < doc_b, n_shared_rfp): the audio_fingerprint_pairs shape
    over rfp -- catches volume-changed / re-normalized duplicates the
    exact fp misses, at the cost of coarser keys (quantized energy
    ratios), which the >= min_shared distinct-window rule compensates.
    The rfp equi-join is still the blocking; all-silent windows are
    always dropped, so quiet corpora cannot recreate the constant-key
    skew."""
    fps = audio_fingerprints_robust(documents)
    a = fps.alias("a")
    b = fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.rfp") == F.col("b.rfp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.rfp").alias("rfp"),
        )
        .distinct()
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("n_shared_rfp"))
        .where(F.col("n_shared_rfp") >= min_shared)
    )


# ---------------------------------------------------------------------------
# DuckDB oracles: recompute everything from md5 token bytes, never
# touching WAV bytes -- a sweep match certifies encode_wav/decode_wav.
# ---------------------------------------------------------------------------

#: (b - 128) * 256 for md5 byte k of token list element (1-indexed i):
#: the sample math shared by every oracle below.
def _sample_expr(tok_expr: str, k: str) -> str:
    return (
        f"(CAST(concat('0x', substr(md5({tok_expr}), "
        f"2 * ({k}) + 1, 2)) AS BIGINT) - 128) * 256"
    )


def _audio_cte() -> str:
    """CTE chain ending in ``asamp(doc_id, s)`` where s is the clip's
    int16 sample LIST (1-indexed), built from md5 token bytes."""
    # token list, capped, '' fallback for tokenless docs
    samp = _sample_expr("t[(j // 16) + 1]", "j % 16")
    return f"""
    atoks AS (
        SELECT doc_id,
               CASE WHEN len(w0) = 0 THEN ['']
                    ELSE w0[1:{AUDIO_MAX_TOKENS}] END AS t
        FROM (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> '') AS w0
            FROM documents
        )
    ),
    asamp AS (
        SELECT doc_id,
               list_transform(range(0, len(t) * {CHUNK_SAMPLES}),
                              j -> {samp}) AS s
        FROM atoks
    )"""


ORACLE_SQL: dict[str, str] = {
    "audio_features": f"""
        WITH {_audio_cte().strip()},
        agg AS (
            SELECT doc_id,
                   len(s) AS n,
                   list_sum(list_transform(s, v -> v * v)) AS sum_sq,
                   list_max(list_transform(s, v -> abs(v))) AS peak,
                   len(list_filter(s, v -> abs(v) >= {CLIP_THRESH}))
                       AS n_clipped,
                   len(list_filter(s, v -> abs(v) <= {SILENCE_THRESH}))
                       AS n_silent
            FROM asamp
        )
        SELECT doc_id,
               CAST(n AS BIGINT) AS n_samples,
               CAST({AUDIO_RATE} AS INT) AS sample_rate,
               CAST(n * 1000 // {AUDIO_RATE} AS BIGINT) AS duration_ms,
               CAST(peak AS INT) AS peak,
               CAST(floor(sqrt(CAST(sum_sq AS DOUBLE) / n) * 1000000
                          + 0.5) AS BIGINT) AS rms_q6,
               CAST(n_clipped AS BIGINT) AS n_clipped,
               CAST(n_clipped AS DOUBLE) / n AS clipping_ratio,
               CAST(n_silent AS BIGINT) AS n_silent,
               CAST(n_silent AS DOUBLE) / n AS silence_ratio
        FROM agg
    """,
}


def _fp_cte() -> str:
    """CTE chain ending in ``afp(doc_id, window_idx, fp)`` -- the
    polynomial window fingerprints in exact HUGEINT arithmetic with
    the SAME precomputed power table the engine uses. ``awin`` drops
    all-silent windows, mirroring the engine's skew guard (the filter
    is a no-op on the md5-generated testdata clips -- a chunk byte
    within 8 of 128 sixty-four times in a row -- but both engines
    state the rule)."""
    win = FP_WINDOW_CHUNKS * CHUNK_SAMPLES
    pw = ", ".join(str(p) for p in FP_POWERS)
    return f"""
    {_audio_cte().strip()},
    awin AS (
        SELECT doc_id, i AS window_idx,
               s[(i * {CHUNK_SAMPLES}) + 1 :
                 (i * {CHUNK_SAMPLES}) + {win}] AS wnd
        FROM asamp
        CROSS JOIN range(0, {AUDIO_MAX_TOKENS}) t(i)
        WHERE i <= len(s) // {CHUNK_SAMPLES} - {FP_WINDOW_CHUNKS}
          AND len(list_filter(s[(i * {CHUNK_SAMPLES}) + 1 :
                                (i * {CHUNK_SAMPLES}) + {win}],
                              v -> abs(v) > {SILENCE_THRESH})) > 0
    ),
    apw AS (SELECT [{pw}] AS pw),
    afp AS (
        SELECT doc_id, window_idx,
               CAST(list_sum(
                   list_transform(range(1, {win} + 1),
                       k -> (CAST(wnd[k] + 32768 AS HUGEINT)
                             * pw[k]) % {FP_MOD})
               ) % {FP_MOD} AS BIGINT) AS fp
        FROM awin, apw
    )"""


#: FLAC twin of audio_features: the SAME md5-token oracle -- the
#: oracle never sees codec bytes, so a hash match on BOTH registered
#: queries certifies encode_wav/decode_wav AND encode_flac/decode_flac
#: against one independent derivation.
ORACLE_SQL["audio_features_flac"] = ORACLE_SQL["audio_features"]
ORACLE_SQL["audio_features_flac_lpc"] = ORACLE_SQL["audio_features"]
ORACLE_SQL["audio_features_flac_ms"] = ORACLE_SQL["audio_features"]
ORACLE_SQL["audio_features_wav_float"] = ORACLE_SQL["audio_features"]


ORACLE_SQL["audio_fingerprints"] = (
    "WITH "
    + _fp_cte().strip()
    + """
    SELECT doc_id, CAST(window_idx AS INT) AS window_idx, fp FROM afp"""
)

ORACLE_SQL["audio_fingerprint_pairs"] = (
    "WITH "
    + _fp_cte().strip()
    + f""",
    ashared AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.fp
        FROM afp a JOIN afp b
          ON a.fp = b.fp AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_shared_fp
    FROM ashared
    GROUP BY doc_a, doc_b
    HAVING count(*) >= {AUDIO_FP_MIN}"""
)


def _rfp_cte() -> str:
    """CTE chain ending in ``arfp(doc_id, window_idx, rfp)`` -- the
    gain-invariant subblock-energy-ratio fingerprints, all HUGEINT
    (energies <= 64 * 32768^2 and the * RFP_Q product stay far inside
    128 bits; the // floor division is exact in both engines)."""
    pw = ", ".join(str(p) for p in FP_POWERS[:RFP_BLOCKS])
    return f"""
    {_fp_cte().strip()},
    aene AS (
        SELECT doc_id, window_idx,
               list_transform(range(0, {RFP_BLOCKS}),
                   b -> CAST(list_sum(list_transform(
                            range(1, {RFP_BLOCK_SAMPLES} + 1),
                            k -> CAST(wnd[b * {RFP_BLOCK_SAMPLES} + k]
                                      AS HUGEINT)
                                 * wnd[b * {RFP_BLOCK_SAMPLES} + k]))
                        AS HUGEINT)) AS e
        FROM awin
    ),
    arpw AS (SELECT [{pw}] AS rpw),
    arfp AS (
        SELECT doc_id, window_idx,
               CAST(list_sum(list_transform(range(1, {RFP_BLOCKS} + 1),
                   b -> (least((e[b] * {RFP_Q}) // te, {RFP_Q - 1})
                         * rpw[b]) % {FP_MOD})) % {FP_MOD} AS BIGINT)
                   AS rfp
        FROM (SELECT doc_id, window_idx, e, list_sum(e) AS te
              FROM aene), arpw
        WHERE te > 0
    )"""


ORACLE_SQL["audio_fingerprints_robust"] = (
    "WITH "
    + _rfp_cte().strip()
    + """
    SELECT doc_id, CAST(window_idx AS INT) AS window_idx, rfp FROM arfp"""
)

ORACLE_SQL["audio_robust_fp_pairs"] = (
    "WITH "
    + _rfp_cte().strip()
    + f""",
    arshared AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.rfp
        FROM arfp a JOIN arfp b
          ON a.rfp = b.rfp AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_shared_rfp
    FROM arshared
    GROUP BY doc_a, doc_b
    HAVING count(*) >= {AUDIO_FP_MIN}"""
)
