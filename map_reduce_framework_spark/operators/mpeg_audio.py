"""MPEG-1 audio (Layer I/II) codec + MPEG frame-header walk -- the
round-12 ask: the largest real-world audio population the engine
counted but dropped (media_boundary_report plants WAV format-tag 0x55;
raw .mp3/.mp2 bitstreams weren't even sniffed).  Same discipline as
operators/flac.py: a dependency-free encoder+decoder pair, certified
end to end by registered queries whose oracle recomputes every
header-math column from md5 token bytes alone, plus a pinned
reconstruction bound for the lossy part.

What is EXACTLY per ISO/IEC 11172-3 (public spec):

* the 32-bit frame header (sync/version/layer/bitrate/rate/padding/
  mode/emphasis) and the frame-length arithmetic for every version
  (MPEG-1, MPEG-2 LSF, MPEG-2.5) and layer -- ``mpeg_stream_info``
  walks any raw bitstream, ID3v2/ID3v1 tags skipped;
* the optional CRC-16 (poly 0x8005, init 0xFFFF) over header bits
  16-31 + the side-info region (Layer I: allocation; Layer II:
  allocation + scfsi), VERIFIED when the protection bit announces it;
* Layer I syntax: 384 samples, 4-bit allocation (steps 2^nb-1,
  nb 2..15), one 6-bit scalefactor per active subband;
* Layer II syntax: 1152 samples, the B.2a/b/c/d allocation-table
  family with per-subband step lists, scfsi patterns, 3/5/9-step
  GROUPED codes (3 samples per 5/7/10-bit code), 2.4.3.3.4
  requantization s'' = C*(s''' + D) with the exact spec constants
  (C = 2^nb/steps, D = 0.5 grouped / 2^(1-nb) ungrouped);
* the scalefactor table scf[i] = 2^(1 - i/3), i 0..62;
* the analysis/synthesis flowcharts (Annex C / 2.4.3.2): X/Z/Y
  matrixing with M[k][j] = cos((2k+1)(j-16)pi/64), V/U/W FIFO with
  N[i][k] = cos((16+i)(2k+1)pi/64).

The ONE deliberate divergence: the 512-tap window pair.  The spec
gives it only as a printed numeric table (no closed form, not
reconstructible offline), so this engine ships its OWN pair, designed
by alternating least squares against the flowchart itself to -88 dB
reconstruction (generator + provenance: experiments/gen_qmf_window.py;
frozen tables: operators/mpeg_window.py).  Boundary consequence,
stated honestly: streams from THIS encoder decode through THIS
decoder inside the pinned bounds below; a stream from a spec-window
encoder parses bit-exactly (all syntax above is spec) but
reconstructs with mixed-prototype aliasing instead of bit-parity
with a reference decoder.  Layer III and MPEG-2(.5) payloads are
walked/classified/counted, never guessed at decode.

Encoder configurations (any table-legal allocation is spec-legal; the
fidelity gate is the pinned round-trip bound, not a psychoacoustic
model).  Honesty note on bitrate/mode: Table B.1 restricts Layer II
224-384 kbps to stereo modes; this encoder declares single_channel at
384 to buy the full 12 bits/sample for one channel -- a combination
real decoders parse without complaint but a strict B.1 validator
would flag.  The decoder accepts both, and the stereo configuration
below is the strictly-conforming path:

* Layer I mono @448 kbps/32 kHz: 13-bit steps on all 32 subbands.
* Layer II mono @384 kbps/32 kHz (table B.2b): 8191 steps on
  subbands 0-10, 31 on 11-22, 65535 on 23-29 -- the best fidelity
  the 12-bits-per-sample Layer II ceiling admits for wideband input.
* Layer II stereo @384 kbps/32 kHz: 63 / 9 / 5 steps (a structural
  configuration exercising grouped codes and the channel loops).

Scale: decode is the same scan-bound Arrow map work as WAV/FLAC --
per-payload pure-Python bit reads over clips of a few KiB, no shuffle.
"""

from __future__ import annotations

import math

from .mpeg_window import ANALYSIS_C, DELAY, SCALE_BITS, SYNTHESIS_D

# ---------------------------------------------------------------- tables

#: bitrate (kbps) tables by (version_group, layer); index 1..14.
#: version_group: 0 = MPEG-1, 1 = MPEG-2 / MPEG-2.5 (LSF).
_BITRATES = {
    (0, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (0, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (0, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (1, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (1, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (1, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}

#: sample-rate tables by version bits (header bits 19-20):
#: 3 = MPEG-1, 2 = MPEG-2 (LSF), 0 = MPEG-2.5.
_RATES = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}

_VERSION_NAMES = {3: "1", 2: "2", 0: "2.5"}

#: samples per frame by (version_group, layer)
_SPF = {
    (0, 1): 384, (0, 2): 1152, (0, 3): 1152,
    (1, 1): 384, (1, 2): 1152, (1, 3): 576,
}

#: Layer II quantization step lists (ISO 11172-3 Tables B.2a-d).
#: Four per-subband "step list" groups for the high-rate tables:
_STEPS_A = (3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
            16383, 32767, 65535)
_STEPS_B = (3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
            8191, 65535)
_STEPS_C = (3, 5, 7, 9, 15, 31, 65535)
_STEPS_D = (3, 5, 65535)
#: and the low-rate (B.2c/d) lists:
_STEPS_LOW4 = (3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
               8191, 16383, 32767)
_STEPS_LOW3 = (3, 5, 9, 15, 31, 63, 127)


def _mk_table(groups):
    """[(nbal, steps_list)] per subband from (count, nbal, list) runs."""
    out = []
    for count, nbal, steps in groups:
        out.extend([(nbal, steps)] * count)
    return tuple(out)


#: table index -> per-subband (nbal, step list); sblimit = len(table)
_L2_TABLES = (
    _mk_table([(3, 4, _STEPS_A), (8, 4, _STEPS_B),
               (12, 3, _STEPS_C), (4, 2, _STEPS_D)]),      # B.2a, sblimit 27
    _mk_table([(3, 4, _STEPS_A), (8, 4, _STEPS_B),
               (12, 3, _STEPS_C), (7, 2, _STEPS_D)]),      # B.2b, sblimit 30
    _mk_table([(2, 4, _STEPS_LOW4), (6, 3, _STEPS_LOW3)]),  # B.2c, sblimit 8
    _mk_table([(2, 4, _STEPS_LOW4), (10, 3, _STEPS_LOW3)]),  # B.2d, sblimit 12
)


def _l2_table_index(bitrate_kbps: int, nch: int, rate: int) -> int:
    """ISO 11172-3 Table B.1 mapping (the libmad/dist10 selection):
    which of B.2a-d applies for (per-channel bitrate, sample rate)."""
    per_ch = bitrate_kbps // nch
    if per_ch <= 48:
        return 3 if rate == 32000 else 2
    if per_ch <= 80:
        return 0
    return 0 if rate == 48000 else 1


#: steps -> (code bits, grouped?) -- grouped packs 3 samples per code
_QC = {}
for _nb in range(2, 17):
    _QC[(1 << _nb) - 1] = (_nb, False)
_QC[3] = (5, True)
_QC[5] = (7, True)
_QC[9] = (10, True)

#: scalefactor table: scf[i] = 2^(1 - i/3), i = 0..62 (index 63 forbidden)
SCF = tuple(2.0 ** (1.0 - i / 3.0) for i in range(63))


def _nb_of(steps: int) -> int:
    """Effective fraction bits nb for requantization constants."""
    if steps in (3, 5, 9):
        return {3: 2, 5: 3, 9: 4}[steps]
    return steps.bit_length()


# ------------------------------------------------------------- bit I/O


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def pad_to(self, nbytes: int):
        if self.nbits:
            self.write(0, 8 - self.nbits)
        if len(self.buf) > nbytes:
            raise ValueError("frame overflow")
        self.buf.extend(b"\x00" * (nbytes - len(self.buf)))

    def bytes(self) -> bytes:
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos", "end")

    def __init__(self, data, start_bit: int, end_bit: int):
        self.data = data
        self.pos = start_bit
        self.end = end_bit

    def read(self, bits: int):
        # byte-batched MSB-first read (one int.from_bytes per call
        # beats a per-bit Python loop ~10x on full frames)
        pos = self.pos
        if pos + bits > self.end:
            return None
        start_byte = pos >> 3
        end_byte = (pos + bits + 7) >> 3
        chunk = int.from_bytes(
            bytes(self.data[start_byte:end_byte]), "big"
        )
        shift = (end_byte << 3) - (pos + bits)
        self.pos = pos + bits
        return (chunk >> shift) & ((1 << bits) - 1)


def _crc16(bits_bytes: bytes, nbits: int) -> int:
    """CRC-16 poly 0x8005, init 0xFFFF over the first nbits of the
    given byte string (MSB-first) -- the spec's protection CRC."""
    crc = 0xFFFF
    for i in range(nbits):
        bit = (bits_bytes[i >> 3] >> (7 - (i & 7))) & 1
        hi = (crc >> 15) & 1
        crc = (crc << 1) & 0xFFFF
        if hi ^ bit:
            crc ^= 0x8005
    return crc


# ------------------------------------------------------ header walking


def _parse_header(b0: int, b1: int, b2: int, b3: int):
    """Decode a 32-bit frame header; returns dict or None.  Strict:
    reserved version/layer/bitrate/rate codes and free format (bitrate
    index 0 -- frame length unknowable) are rejected."""
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version_bits = (b1 >> 3) & 0x03
    if version_bits == 1:
        return None  # reserved
    layer_bits = (b1 >> 1) & 0x03
    if layer_bits == 0:
        return None  # reserved
    layer = 4 - layer_bits  # 3->I, 2->II, 1->III
    protection = b1 & 1
    bitrate_idx = (b2 >> 4) & 0x0F
    rate_idx = (b2 >> 2) & 0x03
    if bitrate_idx in (0, 15) or rate_idx == 3:
        return None
    vgroup = 0 if version_bits == 3 else 1
    bitrate = _BITRATES[(vgroup, layer)][bitrate_idx - 1]
    rate = _RATES[version_bits][rate_idx]
    padding = (b2 >> 1) & 1
    mode = (b3 >> 6) & 0x03
    mode_ext = (b3 >> 4) & 0x03
    if layer == 1:
        frame_len = (12 * bitrate * 1000 // rate + padding) * 4
    elif layer == 3 and vgroup == 1:
        frame_len = 72 * bitrate * 1000 // rate + padding
    else:
        frame_len = 144 * bitrate * 1000 // rate + padding
    return {
        "version_bits": version_bits,
        "version": _VERSION_NAMES[version_bits],
        "vgroup": vgroup,
        "layer": layer,
        "protection": protection,
        "bitrate_kbps": bitrate,
        "sample_rate": rate,
        "padding": padding,
        "mode": mode,
        "mode_ext": mode_ext,
        "nch": 1 if mode == 3 else 2,
        "frame_len": frame_len,
        "spf": _SPF[(vgroup, layer)],
    }


def _skip_tags(payload, pos: int) -> int:
    """Skip a leading ID3v2 tag (10-byte header + synchsafe size,
    +footer when flagged)."""
    n = len(payload)
    if pos + 10 <= n and bytes(payload[pos : pos + 3]) == b"ID3":
        flags = payload[pos + 5]
        size = 0
        for i in range(6, 10):
            b = payload[pos + i]
            if b & 0x80:
                return pos  # not synchsafe: not a valid ID3v2
            size = (size << 7) | b
        pos += 10 + size + (10 if flags & 0x10 else 0)
    return pos


def mpeg_stream_info(payload):
    """Walk a raw MPEG audio bitstream: returns a dict with version
    ('1'/'2'/'2.5'), layer (1/2/3), bitrate_kbps / sample_rate / mode
    of the FIRST frame, n_frames, duration_ms, and total samples --
    header walk only, no decode.  None unless the payload is a clean
    whole-stream walk: optional ID3v2 tag, then >= 1 complete frame
    back to back (version/layer/rate constant across frames, bitrate
    may vary), then EOF or an ID3v1 'TAG' trailer.  TOTAL over
    arbitrary bytes -- random binary dies on the sync/structure
    checks, which is what lets decode_audio use this as a sniff."""
    try:
        n = len(payload)
        pos = _skip_tags(payload, 0)
        first = None
        frames = 0
        while pos < n:
            if n - pos == 128 and bytes(payload[pos : pos + 3]) == b"TAG":
                break  # ID3v1 trailer
            if pos + 4 > n:
                return None
            h = _parse_header(
                payload[pos], payload[pos + 1], payload[pos + 2],
                payload[pos + 3],
            )
            if h is None:
                return None
            if first is None:
                first = h
            elif (
                h["version_bits"] != first["version_bits"]
                or h["layer"] != first["layer"]
                or h["sample_rate"] != first["sample_rate"]
            ):
                return None
            if pos + h["frame_len"] > n:
                return None
            pos += h["frame_len"]
            frames += 1
        if first is None or frames == 0:
            return None
        spf = first["spf"]
        rate = first["sample_rate"]
        return {
            "version": first["version"],
            "layer": first["layer"],
            "bitrate_kbps": first["bitrate_kbps"],
            "sample_rate": rate,
            "mode": first["mode"],
            "nch": first["nch"],
            "n_frames": frames,
            "n_samples": frames * spf,
            "duration_ms": frames * spf * 1000 // rate,
        }
    except (IndexError, ValueError, TypeError):
        return None


# ------------------------------------------------------------ filterbank


def _analyze(x):
    """Annex C analysis flowchart over float samples in [-1, 1):
    returns (n_granules, 32) subband samples.  numpy matrix form of
    the X/Z/Y/M steps; len(x) must be a multiple of 32."""
    import numpy as np

    C = np.asarray(ANALYSIS_C, dtype=np.float64) / (1 << SCALE_BITS)
    j = np.arange(64)
    k = np.arange(32)
    Mmat = np.cos((2 * k[:, None] + 1) * (j[None, :] - 16) * np.pi / 64)
    nb = len(x) // 32
    X = np.zeros(512)
    S = np.zeros((nb, 32))
    for t in range(nb):
        X[32:] = X[:-32].copy()
        X[:32] = x[t * 32 : (t + 1) * 32][::-1]
        Y = (C * X).reshape(8, 64).sum(axis=0)
        S[t] = Mmat @ Y
    return S


class _Synth:
    """2.4.3.2 synthesis flowchart with the V FIFO carried across
    frames (the decoder feeds granules stream-wide, per channel)."""

    def __init__(self):
        import numpy as np

        self.np = np
        self.V = np.zeros(1024)
        i = np.arange(64)
        k = np.arange(32)
        self.Nmat = np.cos((16 + i[:, None]) * (2 * k[None, :] + 1) * np.pi / 64)
        self.D = np.asarray(SYNTHESIS_D, dtype=np.float64) / (1 << SCALE_BITS)

    def granule(self, S):
        np = self.np
        V = self.V
        V[64:] = V[:-64].copy()
        V[:64] = self.Nmat @ S
        U = np.empty(512)
        for jj in range(8):
            U[jj * 64 : jj * 64 + 32] = V[jj * 128 : jj * 128 + 32]
            U[jj * 64 + 32 : jj * 64 + 64] = V[jj * 128 + 96 : jj * 128 + 128]
        return (U * self.D).reshape(16, 32).sum(axis=0)


# -------------------------------------------------------------- encoder

#: encoder allocation plans: per subband-range target STEPS; chosen to
#: maximize fidelity under the frame bit budget (module docstring).
_MONO_L2_PLAN = ((11, 8191), (12, 31), (18, 65535))  # by B.2b sb runs
_STEREO_L2_PLAN = ((11, 63), (12, 9), (18, 5))
_L1_NB = 13  # Layer I: 13-bit steps on every subband


def _plan_steps(plan, sblimit):
    out = []
    for count, steps in plan:
        out.extend([steps] * count)
    return out[:sblimit]


def _alloc_index(table_entry, steps):
    nbal, step_list = table_entry
    return step_list.index(steps) + 1


def _quantize(x_norm: float, steps: int) -> int:
    """Spec quantizer (Annex C.1.5.4.4): c = floor((A*x + B)*2^(nb-1))
    + 2^(nb-1) with A = steps/2^nb, B = 2^-nb - D."""
    nb = _nb_of(steps)
    d = 0.5 if steps in (3, 5, 9) else 2.0 ** (1 - nb)
    a = steps / float(1 << nb)
    b = 2.0 ** (-nb) - d
    h = 1 << (nb - 1)
    c = math.floor((a * x_norm + b) * h) + h
    return min(max(c, 0), steps - 1)


def _quantize_vec(x_norm, steps: int):
    """Vector twin of _quantize over a float64 array -- the SAME IEEE
    double expression in the same order, so the codes are bit-equal to
    the scalar path (pinned by test)."""
    import numpy as np

    nb = _nb_of(steps)
    d = 0.5 if steps in (3, 5, 9) else 2.0 ** (1 - nb)
    a = steps / float(1 << nb)
    b = 2.0 ** (-nb) - d
    h = 1 << (nb - 1)
    c = np.floor((a * x_norm + b) * h).astype(np.int64) + h
    return np.clip(c, 0, steps - 1)


def _scf_index(peak: float) -> int:
    """Largest scalefactor index (smallest scf) still >= peak."""
    if peak <= 0.0:
        return 62
    idx = int(math.floor((1.0 - math.log2(peak)) * 3.0))
    idx = min(max(idx, 0), 62)
    while idx > 0 and SCF[idx] < peak:
        idx -= 1
    return idx


def _prep_channels(samples_list, spf: int):
    """int16 sample lists -> float arrays padded to a whole number of
    frames (>= 1 frame), all channels equal length."""
    import numpy as np

    n = max(len(s) for s in samples_list)
    frames = max(1, -(-n // spf))
    total = frames * spf
    chans = []
    for s in samples_list:
        arr = np.zeros(total)
        a = np.asarray(s, dtype=np.int64)
        if np.any(a > 32767) or np.any(a < -32768):
            raise ValueError("samples out of int16 range")
        arr[: len(a)] = a / 32768.0
        chans.append(arr)
    return chans, frames, total


def _header_bytes(layer: int, bitrate_kbps: int, rate: int, nch: int) -> bytes:
    layer_bits = 4 - layer
    bitrate_idx = _BITRATES[(0, layer)].index(bitrate_kbps) + 1
    rate_idx = _RATES[3].index(rate)
    b1 = 0xE0 | (3 << 3) | (layer_bits << 1) | 1  # MPEG-1, no CRC
    b2 = (bitrate_idx << 4) | (rate_idx << 2)
    b3 = (3 if nch == 1 else 0) << 6
    return bytes((0xFF, b1, b2, b3))


def encode_mp1(samples, sample_rate: int = 32000) -> bytes:
    """MPEG-1 Layer I mono encoder @448 kbps: 13-bit quantization on
    all 32 subbands (the best the Layer I bit budget admits).  Frames
    are emitted for ceil(n/384) * 384 samples (zero-padded tail)."""
    if sample_rate not in _RATES[3]:
        raise ValueError("MPEG-1 rates are 32000/44100/48000")
    chans, frames, total = _prep_channels([samples], 384)
    S = _analyze(chans[0])  # (frames*12, 32)
    steps = (1 << _L1_NB) - 1
    alloc_idx = _L1_NB - 1  # Layer I: index = nb - 1
    frame_bytes = (12 * 448000 // sample_rate) * 4
    out = bytearray()
    import numpy as np

    for f in range(frames):
        w = _BitWriter()
        w.buf.extend(_header_bytes(1, 448, sample_rate, 1))
        gran = S[f * 12 : (f + 1) * 12]  # 12 granules x 32 subbands
        for sb in range(32):
            w.write(alloc_idx, 4)
        scf_idx = [
            _scf_index(float(np.abs(gran[:, sb]).max()))
            for sb in range(32)
        ]
        for idx in scf_idx:
            w.write(idx, 6)
        codes = np.empty((12, 32), dtype=np.int64)
        for sb in range(32):
            codes[:, sb] = _quantize_vec(
                gran[:, sb] / SCF[scf_idx[sb]], steps
            )
        for s in range(12):
            for sb in range(32):
                w.write(int(codes[s, sb]), _L1_NB)
        w.pad_to(frame_bytes)
        out += w.bytes()
    return bytes(out)


def encode_mp2(samples, sample_rate: int = 32000, *, right=None) -> bytes:
    """MPEG-1 Layer II encoder @384 kbps (allocation table B.2b).
    Mono by default; pass ``right`` for 2-channel stereo (mode 00, no
    joint coding -- a structural configuration with a coarser
    allocation plan, since stereo halves the per-channel budget).
    scfsi 00 everywhere: all three scalefactors transmitted."""
    if sample_rate not in _RATES[3]:
        raise ValueError("MPEG-1 rates are 32000/44100/48000")
    nch = 2 if right is not None else 1
    sig = [samples, right] if nch == 2 else [samples]
    chans, frames, total = _prep_channels(sig, 1152)
    table = _L2_TABLES[_l2_table_index(384, nch, sample_rate)]
    sblimit = len(table)
    plan = _plan_steps(
        _MONO_L2_PLAN if nch == 1 else _STEREO_L2_PLAN, sblimit
    )
    Ss = [_analyze(c) for c in chans]  # each (frames*36, 32)
    frame_bytes = 144 * 384000 // sample_rate
    out = bytearray()
    for f in range(frames):
        w = _BitWriter()
        w.buf.extend(_header_bytes(2, 384, sample_rate, nch))
        grans = [S[f * 36 : (f + 1) * 36] for S in Ss]  # 36 x 32 each
        for sb in range(sblimit):
            for ch in range(nch):
                w.write(_alloc_index(table[sb], plan[sb]), table[sb][0])
        for sb in range(sblimit):
            for ch in range(nch):
                w.write(0, 2)  # scfsi 00: three scalefactors
        import numpy as np

        scf_idx = [[None] * sblimit for _ in range(nch)]
        for sb in range(sblimit):
            for ch in range(nch):
                idxs = []
                for part in range(3):
                    seg = grans[ch][part * 12 : (part + 1) * 12, sb]
                    idx = _scf_index(float(np.abs(seg).max()))
                    idxs.append(idx)
                    w.write(idx, 6)
                scf_idx[ch][sb] = idxs
        # vectorized quantization: all 36 rows per (ch, sb) at once
        # (the per-part scalefactor divides its 12-row slice)
        codes_all = [
            np.empty((36, sblimit), dtype=np.int64) for _ in range(nch)
        ]
        for ch in range(nch):
            for sb in range(sblimit):
                xn = np.empty(36)
                for part in range(3):
                    xn[part * 12 : (part + 1) * 12] = grans[ch][
                        part * 12 : (part + 1) * 12, sb
                    ] / SCF[scf_idx[ch][sb][part]]
                codes_all[ch][:, sb] = _quantize_vec(xn, plan[sb])
        for gr in range(12):
            for sb in range(sblimit):
                steps = plan[sb]
                nb, grouped = _QC[steps]
                for ch in range(nch):
                    c0 = int(codes_all[ch][gr * 3, sb])
                    c1 = int(codes_all[ch][gr * 3 + 1, sb])
                    c2 = int(codes_all[ch][gr * 3 + 2, sb])
                    if grouped:
                        w.write(
                            c0 + steps * c1 + steps * steps * c2, nb
                        )
                    else:
                        w.write(c0, nb)
                        w.write(c1, nb)
                        w.write(c2, nb)
        w.pad_to(frame_bytes)
        out += w.bytes()
    return bytes(out)


def bandlimit_for_l2(samples, sblimit: int = 30):
    """Band-limit int16 samples to Layer II's transmitted band by
    running analysis -> zero subbands >= sblimit -> synthesis (delay
    compensated).  Layer II at table B.2a/b NEVER transmits the top
    32-sblimit subbands (spec sblimit 27/30) -- content there is
    structurally untransmittable, so a fidelity-certified round trip
    feeds the codec what the format can carry, exactly like a real
    pipeline's anti-alias stage.  Returns an int16 list, same length."""
    import numpy as np

    a = np.asarray(samples, dtype=np.int64)
    n = len(a)
    total = -(-max(n + DELAY, 32) // 32) * 32
    x = np.zeros(total)
    x[:n] = a / 32768.0
    S = _analyze(x)
    S[:, sblimit:] = 0.0
    syn = _Synth()
    out = np.concatenate([syn.granule(S[t]) for t in range(S.shape[0])])
    y = out[DELAY : DELAY + n]
    return [
        int(v) for v in np.clip(np.rint(y * 32768.0), -32768, 32767)
    ]


# -------------------------------------------------------------- decoder


def _dequant(code: int, steps: int) -> float:
    """2.4.3.3.4 requantization: s'' = C * (s''' + D)."""
    nb = _nb_of(steps)
    h = 1 << (nb - 1)
    frac = (code - h) / float(h)
    c = float(1 << nb) / steps
    d = 0.5 if steps in (3, 5, 9) else 2.0 ** (1 - nb)
    return c * (frac + d)


#: code -> requantized value, per steps (lazy; <= 0.5 MB at 65535).
#: The hot decode path reads these instead of recomputing _dequant
#: per sample -- same values by construction.
_DEQ_CACHE: dict = {}


def _deq_table(steps: int):
    t = _DEQ_CACHE.get(steps)
    if t is None:
        import numpy as np

        t = np.array([_dequant(c, steps) for c in range(steps)])
        _DEQ_CACHE[steps] = t
    return t


#: decoder bomb guard: MPEG frames expand up to ~64x (a 144-byte
#: Layer II frame decodes to 1152 samples), so a crafted stream of
#: minimum-bitrate frames amplifies memory; cap the decoded length
#: like the image decoders cap pixels (~2 minutes at 32 kHz).
MAX_DECODE_SAMPLES = 4_194_304


def decode_mpeg(payload):
    """MPEG-1 Layer I/II decode: (channel-0 samples as int16 numpy
    array, rate, n_channels) -- decode_wav's exact contract; None for
    anything outside the supported set: not a clean MPEG stream walk,
    Layer III, MPEG-2/2.5 (LSF), joint-stereo mode, CRC mismatch,
    forbidden scalefactor index 63, an invalid allocation code, or a
    stream longer than the MAX_DECODE_SAMPLES bomb guard.
    TOTAL over arbitrary bytes."""
    try:
        return _decode_mpeg(payload)
    except (IndexError, ValueError, TypeError, OverflowError):
        return None


def _decode_mpeg(payload):
    import numpy as np

    info = mpeg_stream_info(payload)
    if info is None or info["version"] != "1" or info["layer"] == 3:
        return None
    if info["mode"] == 1:
        return None  # joint stereo: intensity coding not implemented
    if info["n_samples"] > MAX_DECODE_SAMPLES:
        return None  # bomb guard (module constant)
    nch = info["nch"]
    rate = info["sample_rate"]
    layer = info["layer"]
    synths = [_Synth() for _ in range(nch)]
    out = [[] for _ in range(nch)]
    pos = _skip_tags(payload, 0)
    n = len(payload)
    while pos < n:
        if n - pos == 128 and bytes(payload[pos : pos + 3]) == b"TAG":
            break
        h = _parse_header(
            payload[pos], payload[pos + 1], payload[pos + 2], payload[pos + 3]
        )
        end_bit = (pos + h["frame_len"]) * 8
        start = pos + 4
        crc_val = None
        if h["protection"] == 0:
            crc_val = (payload[start] << 8) | payload[start + 1]
            start += 2
        r = _BitReader(payload, start * 8, end_bit)
        if layer == 1:
            ok = _decode_l1_frame(r, h, nch, synths, out, payload, pos, crc_val)
        else:
            ok = _decode_l2_frame(r, h, nch, synths, out, payload, pos, crc_val)
        if not ok:
            return None
        pos += h["frame_len"]
    pcm = np.clip(
        np.rint(np.asarray(out[0]) * 32768.0), -32768, 32767
    ).astype("<i2")
    return pcm, rate, nch


def _check_crc(payload, frame_pos: int, crc_val, side_bits: int) -> bool:
    """Verify the protection CRC: header bits 16-31 + the first
    side_bits audio bits (which start after the 2 CRC bytes)."""
    if crc_val is None:
        return True
    region = bytearray(payload[frame_pos + 2 : frame_pos + 4])
    audio_start = frame_pos + 6
    nbytes = (side_bits + 7) // 8
    region += bytes(payload[audio_start : audio_start + nbytes])
    return _crc16(bytes(region), 16 + side_bits) == crc_val


def _decode_l1_frame(r, h, nch, synths, out, payload, pos, crc_val):
    bound = 32  # no joint stereo support: bound unused
    alloc = [[0] * 32 for _ in range(nch)]
    side_bits = 0
    for sb in range(32):
        for ch in range(nch):
            a = r.read(4)
            if a is None or a == 15:
                return False
            alloc[ch][sb] = a
            side_bits += 4
    if not _check_crc(payload, pos, crc_val, side_bits):
        return False
    scf = [[1.0] * 32 for _ in range(nch)]
    for sb in range(32):
        for ch in range(nch):
            if alloc[ch][sb]:
                idx = r.read(6)
                if idx is None or idx == 63:
                    return False
                scf[ch][sb] = SCF[idx]
    import numpy as np

    for s in range(12):
        S = np.zeros((nch, 32))
        for sb in range(32):
            for ch in range(nch):
                a = alloc[ch][sb]
                if a:
                    nb = a + 1
                    code = r.read(nb)
                    if code is None:
                        return False
                    S[ch, sb] = (
                        _deq_table((1 << nb) - 1)[code] * scf[ch][sb]
                    )
        for ch in range(nch):
            out[ch].extend(synths[ch].granule(S[ch]))
    return True


def _decode_l2_frame(r, h, nch, synths, out, payload, pos, crc_val):
    import numpy as np

    table = _L2_TABLES[_l2_table_index(h["bitrate_kbps"], nch, h["sample_rate"])]
    sblimit = len(table)
    alloc = [[0] * sblimit for _ in range(nch)]
    side_bits = 0
    for sb in range(sblimit):
        nbal = table[sb][0]
        for ch in range(nch):
            a = r.read(nbal)
            if a is None or a > len(table[sb][1]):
                return False
            alloc[ch][sb] = a
            side_bits += nbal
    scfsi = [[0] * sblimit for _ in range(nch)]
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc[ch][sb]:
                v = r.read(2)
                if v is None:
                    return False
                scfsi[ch][sb] = v
                side_bits += 2
    if not _check_crc(payload, pos, crc_val, side_bits):
        return False
    scf = [[None] * sblimit for _ in range(nch)]
    for sb in range(sblimit):
        for ch in range(nch):
            if not alloc[ch][sb]:
                continue
            pat = scfsi[ch][sb]
            count = {0: 3, 1: 2, 2: 1, 3: 2}[pat]
            got = []
            for _ in range(count):
                idx = r.read(6)
                if idx is None or idx == 63:
                    return False
                got.append(SCF[idx])
            if pat == 0:
                scf[ch][sb] = got
            elif pat == 1:
                scf[ch][sb] = [got[0], got[0], got[1]]
            elif pat == 2:
                scf[ch][sb] = [got[0], got[0], got[0]]
            else:
                scf[ch][sb] = [got[0], got[1], got[1]]
    for gr in range(12):
        vals = np.zeros((nch, 3, 32))
        for sb in range(sblimit):
            step_list = table[sb][1]
            for ch in range(nch):
                a = alloc[ch][sb]
                if not a:
                    continue
                steps = step_list[a - 1]
                nb, grouped = _QC[steps]
                deq = _deq_table(steps)
                part = (gr * 3) // 12
                s_scf = scf[ch][sb][part]
                if grouped:
                    cc = r.read(nb)
                    if cc is None:
                        return False
                    for s in range(3):
                        vals[ch, s, sb] = (
                            deq[cc % steps] * s_scf
                        )
                        cc //= steps
                else:
                    for s in range(3):
                        code = r.read(nb)
                        if code is None:
                            return False
                        vals[ch, s, sb] = deq[code] * s_scf
        for s in range(3):
            for ch in range(nch):
                out[ch].extend(synths[ch].granule(vals[ch, s]))
    return True


# ----------------------------------------------------- registered layer

#: Pinned round-trip bounds (int16 LSB), measured over 20 random
#: fullscale 1024-sample clips with margin (worst observed: MP1
#: max 12 / rms 3.1; MP2-on-bandlimited max 3835 / rms 564 -- the
#: 31-step quantization of subbands 11-22 under the Layer II budget).
#: The registered queries compute recon_ok from the REAL decode
#: against these bounds and the oracle pins it TRUE, so a sweep match
#: fails if the codec ever degrades past them.
MP1_MAX_ERR, MP1_RMS_ERR = 64, 16.0
MP2_MAX_ERR, MP2_RMS_ERR = 6144, 1024.0
MP2_STEREO_MAX_ERR, MP2_STEREO_RMS_ERR = 16384, 4096.0


def _mpeg_features_schema():
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    return StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_frames", LongType()),
            StructField("n_samples", LongType()),
            StructField("sample_rate", IntegerType()),
            StructField("duration_ms", LongType()),
            StructField("bitrate_kbps", IntegerType()),
            StructField("layer", IntegerType()),
            StructField("recon_ok", BooleanType()),
        ]
    )


def audio_features_mpeg(documents, *, layer: int = 2):
    """Per-clip MPEG-audio features through the REAL codec round trip:
    generate the md5-token clip (audio._doc_samples -- the exact
    convention every audio oracle shares), encode to MPEG-1 Layer I or
    II, decode, and emit the header-math columns (frame count, sample
    count, duration) plus ``recon_ok`` = the decoded samples land
    inside the pinned error bounds against the reference clip (Layer
    II: the band-limited clip -- sblimit 30 content is structurally
    untransmittable, module docstring).  The DuckDB oracle recomputes
    every header column from token counts alone and pins recon_ok
    TRUE, so a hash match certifies the frame arithmetic exactly and
    the reconstruction within the pinned envelope.  Scan-bound Arrow
    map work, no shuffle."""
    import numpy as np
    import pandas as pd

    from ..functions.text import _WS_RE
    from .audio import _doc_samples
    from .text_analysis import _fan_out

    if layer == 1:
        spf, bitrate = 384, 448
        max_b, rms_b = MP1_MAX_ERR, MP1_RMS_ERR
    else:
        spf, bitrate = 1152, 384
        max_b, rms_b = MP2_MAX_ERR, MP2_RMS_ERR

    def run(batches):
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "doc_id",
                    "n_frames",
                    "n_samples",
                    "sample_rate",
                    "duration_ms",
                    "bitrate_kbps",
                    "layer",
                    "recon_ok",
                )
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = [t for t in _WS_RE.split(str(text) or "") if t]
                clip = _doc_samples(toks)
                if layer == 1:
                    ref = clip
                    payload = encode_mp1(ref + [0] * DELAY)
                else:
                    ref = bandlimit_for_l2(clip)
                    payload = encode_mp2(ref + [0] * DELAY)
                info = mpeg_stream_info(payload)
                samples, rate, _nch = decode_mpeg(payload)
                err = samples[DELAY : DELAY + len(ref)].astype(
                    np.int64
                ) - np.asarray(ref, dtype=np.int64)
                ok = bool(
                    len(samples) == info["n_samples"]
                    and np.abs(err).max() <= max_b
                    and float(np.std(err)) <= rms_b
                )
                out["doc_id"].append(doc_id)
                out["n_frames"].append(info["n_frames"])
                out["n_samples"].append(info["n_samples"])
                out["sample_rate"].append(rate)
                out["duration_ms"].append(info["duration_ms"])
                out["bitrate_kbps"].append(info["bitrate_kbps"])
                out["layer"].append(info["layer"])
                out["recon_ok"].append(ok)
            yield pd.DataFrame(out)

    base = documents.select("doc_id", "text")
    return _fan_out(base).mapInPandas(
        run, schema=_mpeg_features_schema()
    )


def _plant_stream(
    version_bits: int, layer: int, bitrate_kbps: int, rate: int,
    n_frames: int,
) -> bytes:
    """Header-only MPEG stream: n_frames valid frame headers with
    zeroed bodies -- what the walk classifies and the decoder honestly
    refuses (Layer III / LSF: counted classes, never guessed)."""
    vgroup = 0 if version_bits == 3 else 1
    layer_bits = 4 - layer
    bitrate_idx = _BITRATES[(vgroup, layer)].index(bitrate_kbps) + 1
    rate_idx = _RATES[version_bits].index(rate)
    b1 = 0xE0 | (version_bits << 3) | (layer_bits << 1) | 1
    b2 = (bitrate_idx << 4) | (rate_idx << 2)
    hdr = bytes((0xFF, b1, b2, 0xC0))  # single-channel mode
    h = _parse_header(*hdr)
    frame = hdr + b"\x00" * (h["frame_len"] - 4)
    return frame * n_frames


def mpeg_stream_report(documents):
    """(doc_id, version, layer, sample_rate, bitrate_kbps, n_frames,
    duration_ms, decodable): the MPEG version/layer matrix over a
    planted raw-bitstream corpus -- doc_id % 6 picks the class:
    0 Layer I (this encoder, decodable), 1 Layer II (this encoder,
    decodable), 2 MPEG-1 Layer III (header-only: walked, counted,
    refused at decode), 3 MPEG-2 LSF Layer II (ditto), 4 MPEG-2.5
    Layer III at 8 kHz (ditto), 5 ID3v2-wrapped Layer II (the tag-skip
    path, decodable).  The engine WALKS the planted bytes
    (mpeg_stream_info) and proves decodability by calling the real
    decoder; the oracle recomputes every column from the planting rule
    + token counts alone, so a hash match certifies the whole
    version/layer/bitrate/duration arithmetic."""
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..functions.text import _WS_RE
    from .audio import _doc_samples
    from .text_analysis import _fan_out

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("version", StringType()),
            StructField("layer", IntegerType()),
            StructField("sample_rate", IntegerType()),
            StructField("bitrate_kbps", IntegerType()),
            StructField("n_frames", LongType()),
            StructField("duration_ms", LongType()),
            StructField("decodable", BooleanType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            out = {f.name: [] for f in schema.fields}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                mode = doc_id % 6
                if mode in (0, 1, 5):
                    toks = [
                        t for t in _WS_RE.split(str(text) or "") if t
                    ]
                    clip = _doc_samples(toks)
                    if mode == 0:
                        payload = encode_mp1(clip + [0] * DELAY)
                    else:
                        payload = encode_mp2(
                            bandlimit_for_l2(clip) + [0] * DELAY
                        )
                        if mode == 5:
                            tag = b"ID3\x04\x00\x00" + bytes(
                                (0, 0, 0, 20)
                            )
                            payload = tag + b"\x00" * 20 + payload
                elif mode == 2:
                    payload = _plant_stream(3, 3, 32, 32000, 3)
                elif mode == 3:
                    payload = _plant_stream(2, 2, 8, 16000, 3)
                else:
                    payload = _plant_stream(0, 3, 8, 8000, 3)
                info = mpeg_stream_info(payload)
                decodable = decode_mpeg(payload) is not None
                out["doc_id"].append(doc_id)
                out["version"].append(info["version"])
                out["layer"].append(info["layer"])
                out["sample_rate"].append(info["sample_rate"])
                out["bitrate_kbps"].append(info["bitrate_kbps"])
                out["n_frames"].append(info["n_frames"])
                out["duration_ms"].append(info["duration_ms"])
                out["decodable"].append(decodable)
            yield pd.DataFrame(out)

    base = documents.select("doc_id", "text")
    return _fan_out(base).mapInPandas(
        run, schema=schema
    )


def _ntok_cte() -> str:
    """CTE ``mtoks(doc_id, ntok)``: the effective token count of each
    doc's clip -- audio._doc_samples' exact convention (cap 64,
    tokenless docs contribute the one '' token)."""
    return """
    mtoks AS (
        SELECT doc_id,
               CASE WHEN len(w0) = 0 THEN 1
                    ELSE least(len(w0), 64) END AS ntok
        FROM (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> '') AS w0
            FROM documents
        )
    )"""


def _features_oracle(spf: int, bitrate: int, layer: int) -> str:
    return f"""
        WITH {_ntok_cte().strip()}
        SELECT doc_id,
               CAST((16 * ntok + {DELAY} + {spf - 1}) // {spf} AS BIGINT)
                   AS n_frames,
               CAST(((16 * ntok + {DELAY} + {spf - 1}) // {spf}) * {spf}
                   AS BIGINT) AS n_samples,
               CAST(32000 AS INT) AS sample_rate,
               CAST(((16 * ntok + {DELAY} + {spf - 1}) // {spf}) * {spf}
                    * 1000 // 32000 AS BIGINT) AS duration_ms,
               CAST({bitrate} AS INT) AS bitrate_kbps,
               CAST({layer} AS INT) AS layer,
               TRUE AS recon_ok
        FROM mtoks
    """


ORACLE_SQL = {
    "audio_features_mp1": _features_oracle(384, 448, 1),
    "audio_features_mp2": _features_oracle(1152, 384, 2),
    "mpeg_stream_report": f"""
        WITH {_ntok_cte().strip()}
        SELECT doc_id,
               CASE WHEN doc_id % 6 = 3 THEN '2'
                    WHEN doc_id % 6 = 4 THEN '2.5'
                    ELSE '1' END AS version,
               CAST(CASE WHEN doc_id % 6 = 0 THEN 1
                         WHEN doc_id % 6 IN (2, 4) THEN 3
                         ELSE 2 END AS INT) AS layer,
               CAST(CASE WHEN doc_id % 6 = 3 THEN 16000
                         WHEN doc_id % 6 = 4 THEN 8000
                         ELSE 32000 END AS INT) AS sample_rate,
               CAST(CASE WHEN doc_id % 6 = 0 THEN 448
                         WHEN doc_id % 6 IN (1, 5) THEN 384
                         WHEN doc_id % 6 = 2 THEN 32
                         ELSE 8 END AS INT) AS bitrate_kbps,
               CAST(CASE WHEN doc_id % 6 = 0
                         THEN (16 * ntok + {DELAY} + 383) // 384
                         WHEN doc_id % 6 IN (1, 5)
                         THEN (16 * ntok + {DELAY} + 1151) // 1152
                         ELSE 3 END AS BIGINT) AS n_frames,
               CAST(CASE WHEN doc_id % 6 = 0
                         THEN ((16 * ntok + {DELAY} + 383) // 384) * 384
                              * 1000 // 32000
                         WHEN doc_id % 6 IN (1, 5)
                         THEN ((16 * ntok + {DELAY} + 1151) // 1152)
                              * 1152 * 1000 // 32000
                         WHEN doc_id % 6 = 2 THEN 3 * 1152 * 1000 // 32000
                         WHEN doc_id % 6 = 3 THEN 3 * 1152 * 1000 // 16000
                         ELSE 3 * 576 * 1000 // 8000
                    END AS BIGINT) AS duration_ms,
               doc_id % 6 IN (0, 1, 5) AS decodable
        FROM mtoks
    """,
}
