"""FLAC audio codec (dependency-free, 16-bit): constant /
verbatim / fixed-predictor subframes with Rice-coded residuals -- the
subframe set that carries the overwhelming majority of real FLAC
streams (VERDICT r10 ask #4) -- plus LPC subframes (order 1-32,
quantized signed coefficients, arithmetic-shift prediction) and
STEREO (2-8 independent channels and the three decorrelation modes:
left/side, right/side, mid/side, with 17-bit side subframes), both
added later in round 11, so the full practical stream shape decodes.
The remaining honest boundary is reserved subframe types (2-7,
13-31) and non-16-bit sample depths, counted per source by the media
boundary report (the arithmetic-JPEG discipline).

Format per the public FLAC specification (now RFC 9639):

* ``fLaC`` magic, metadata blocks (1-byte last/type, 24-bit length);
  STREAMINFO (type 0) carries blocksize/framesize bounds, 20-bit
  sample rate, channels-1, bits-per-sample-1, 36-bit total samples,
  and the MD5 of the unencoded little-endian sample bytes -- which
  this decoder VERIFIES when present (a torn stream cannot round-trip
  silently).
* Frames: 14-bit sync + fixed-blocksize strategy, 4-bit blocksize /
  sample-rate codes, channel assignment, UTF-8-coded frame number,
  CRC-8 (poly 0x07) over the header and CRC-16 (poly 0x8005) over the
  whole frame -- both verified on decode.
* Subframes: CONSTANT (one value), VERBATIM (raw samples), FIXED
  orders 0-4 (polynomial predictors, warmup + residual); residuals in
  4-bit Rice partitions (method 0) or 5-bit (method 1), zigzag
  mapping u = 2v / -2v-1, unary quotient = q zeros then a 1, escape
  partitions as raw n-bit two's complement.

The encoder emits fixed-blocksize frames (explicit 16-bit blocksize),
picking per-subframe the cheapest of constant / fixed-order-0..2 with
a size-optimal single-partition Rice parameter -- deterministic, so
the registered oracle (md5 token math, knowing nothing of FLAC)
certifies the full encode -> decode loop in the sweep exactly like
the WAV path.
"""

from __future__ import annotations

import hashlib

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

#: 4-bit sample-rate codes (0 = STREAMINFO, 12/13/14 = explicit field
#: follows, 15 invalid). The encoder uses the inverse map for the
#: dedicated rates and falls back to 13 (16-bit Hz) / 14 (16-bit
#: Hz x 10) for the rest -- every rate its own decoder accepts is
#: encodable (review finding r11: the old `13 or bust` rule overflowed
#: two bytes for 96 kHz even though code 11 exists for it).
_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_RATE_TO_CODE = {v: k for k, v in _RATE_CODES.items()}


def _rate_code(sample_rate: int):
    """(code, trailing bytes) for a sample rate; raises ValueError for
    rates no 4-bit code or explicit field can carry."""
    code = _RATE_TO_CODE.get(sample_rate)
    if code is not None:
        return code, b""
    if 0 < sample_rate < 1 << 16:
        return 13, sample_rate.to_bytes(2, "big")
    if sample_rate % 10 == 0 and 0 < sample_rate // 10 < 1 << 16:
        return 14, (sample_rate // 10).to_bytes(2, "big")
    raise ValueError(f"sample rate {sample_rate} not representable")


def _crc8(data) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index): an m-byte
    sequence carries 6*(m-1) + (7-m) payload bits."""
    if n < 0x80:
        return bytes([n])
    bits = n.bit_length()
    nbytes = next(m for m in range(2, 8) if bits <= 6 * (m - 1) + (7 - m))
    out = [0] * nbytes
    for i in range(nbytes - 1, 0, -1):
        out[i] = 0x80 | (n & 0x3F)
        n >>= 6
    out[0] = ((0xFF << (8 - nbytes)) & 0xFF) | n
    return bytes(out)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.bit = 0

    def read(self, nbits: int):
        v = 0
        for _ in range(nbits):
            if self.pos >= len(self.data):
                return None
            v = (v << 1) | ((self.data[self.pos] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def read_unary(self):
        q = 0
        while True:
            b = self.read(1)
            if b is None:
                return None
            if b:
                return q
            q += 1
            if q > 1 << 20:
                return None  # bomb guard: runaway unary

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if not (u & 1) else -((u + 1) >> 1)


def _residuals(samples: list, order: int) -> list:
    coefs = _FIXED_COEFS[order]
    return [
        samples[i]
        - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        for i in range(order, len(samples))
    ]


def _best_rice_param(res: list) -> int:
    best_p, best_cost = 0, None
    for p in range(15):
        cost = sum((_zigzag(v) >> p) + 1 + p for v in res)
        if best_cost is None or cost < best_cost:
            best_p, best_cost = p, cost
        if best_cost is not None and cost > best_cost * 4:
            break
    return best_p


def encode_flac(
    samples, sample_rate: int = 8000, *, mode: str | None = None
) -> bytes:
    """Mono 16-bit FLAC writer: fixed-blocksize frames (<= 4096
    samples each, explicit 16-bit blocksize code), per-frame the
    cheapest of CONSTANT / FIXED order 0-2 with a size-optimal
    single-partition Rice parameter; ``mode="lpc"`` instead forces
    every subframe through the LPC wire format (_LPC_COEFS at
    _LPC_SHIFT -- numerically the order-2 fixed predictor, carried
    through precision/shift/signed-coefficient fields so the LPC
    decode machinery round-trips for real). STREAMINFO carries the
    real MD5 of the little-endian sample bytes, so the decoder's
    verification is meaningful."""
    import numpy as np

    samples = [int(s) for s in np.asarray(samples, dtype="<i2")]
    n = len(samples)
    block = 4096
    md5 = hashlib.md5(
        np.asarray(samples, dtype="<i2").tobytes()
    ).digest()
    # STREAMINFO (34 bytes)
    w = _BitWriter()
    bs_min = min(block, n) if n else block
    w.write(max(bs_min, 16), 16)  # min blocksize (spec floor 16)
    w.write(max(min(block, n) if n else block, 16), 16)
    w.write(0, 24)  # min framesize unknown
    w.write(0, 24)  # max framesize unknown
    w.write(sample_rate, 20)
    w.write(0, 3)  # channels - 1 (mono)
    w.write(15, 5)  # bits per sample - 1
    w.write(n, 36)
    info = w.bytes() + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + info  # last block

    frame_idx = 0
    pos = 0
    while pos < n:
        bs = min(block, n - pos)
        chunk = samples[pos : pos + bs]
        hdr = bytearray(b"\xff\xf8")
        sr_code, sr_bytes = _rate_code(sample_rate)
        hdr.append((0x07 << 4) | sr_code)  # blocksize code 7: 16-bit
        hdr.append((0x00 << 4) | (0x04 << 1))  # mono, 16 bps
        hdr += _utf8_number(frame_idx)
        hdr += (bs - 1).to_bytes(2, "big")
        hdr += sr_bytes
        hdr.append(_crc8(hdr))
        body = _BitWriter()
        _encode_subframe(body, chunk, mode)
        body.align()
        frame = bytes(hdr) + body.bytes()
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
        pos += bs
        frame_idx += 1
    return bytes(out)


#: The LPC configuration the ``mode="lpc"`` encoder emits: order-2
#: quantized coefficients [2.0, -1.0] at shift 5 ([64, -32], 8-bit
#: precision) -- numerically the order-2 fixed predictor, but carried
#: through the FULL LPC wire format (precision/shift/signed-coef
#: fields), so the round trip exercises exactly the machinery a real
#: encoder's Levinson-Durbin output rides.
_LPC_COEFS = [64, -32]
_LPC_SHIFT = 5
_LPC_PRECISION = 8


def _encode_subframe(
    w: _BitWriter, chunk: list, mode: str | None = None, bps: int = 16
) -> None:
    bs = len(chunk)
    mask = (1 << bps) - 1
    if mode == "lpc" and bs > len(_LPC_COEFS):
        order = len(_LPC_COEFS)
        res = [
            chunk[i]
            - (
                sum(
                    c * chunk[i - 1 - j]
                    for j, c in enumerate(_LPC_COEFS)
                )
                >> _LPC_SHIFT
            )
            for i in range(order, bs)
        ]
        p = _best_rice_param(res)
        w.write(0, 1)
        w.write(0b100000 | (order - 1), 6)  # LPC, order
        w.write(0, 1)  # no wasted bits
        for s in chunk[:order]:
            w.write(s & mask, bps)
        w.write(_LPC_PRECISION - 1, 4)
        w.write(_LPC_SHIFT, 5)
        for c in _LPC_COEFS:
            w.write(c & ((1 << _LPC_PRECISION) - 1), _LPC_PRECISION)
        w.write(0, 2)  # residual method 0
        w.write(0, 4)  # partition order 0
        w.write(p, 4)
        for v in res:
            u = _zigzag(v)
            w.write_unary(u >> p)
            if p:
                w.write(u & ((1 << p) - 1), p)
        return
    if bs and all(s == chunk[0] for s in chunk):
        w.write(0, 1)  # padding
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)  # no wasted bits
        w.write(chunk[0] & mask, bps)
        return
    # pick the cheapest fixed order 0..2 (order must be < blocksize)
    best = None
    for order in range(0, min(3, bs)):
        res = _residuals(chunk, order)
        p = _best_rice_param(res)
        cost = order * bps + sum((_zigzag(v) >> p) + 1 + p for v in res)
        if best is None or cost < best[3]:
            best = (order, res, p, cost)
    order, res, p, cost = best
    if cost >= bs * bps:  # verbatim is smaller: raw samples
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(0, 1)
        for s in chunk:
            w.write(s & mask, bps)
        return
    w.write(0, 1)
    w.write(0b001000 | order, 6)  # FIXED, order
    w.write(0, 1)
    for s in chunk[:order]:  # warmup
        w.write(s & mask, bps)
    w.write(0, 2)  # residual method 0: 4-bit Rice
    w.write(0, 4)  # partition order 0: one partition
    w.write(p, 4)
    for v in res:
        u = _zigzag(v)
        w.write_unary(u >> p)
        if p:
            w.write(u & ((1 << p) - 1), p)


def decode_flac(payload):
    """16-bit FLAC decode: (channel-0 samples as int16 numpy array,
    rate, n_channels) -- decode_wav's exact contract. Handles mono,
    2-8 independent channels, and the three stereo decorrelation
    modes (left/side, right/side, mid/side; side subframes carry 17
    bits). None for anything outside the supported set -- not FLAC,
    non-16-bit, reserved subframe types, reserved residual methods,
    CRC mismatch, or STREAMINFO-MD5 mismatch (verified over the
    channel-interleaved bytes). TOTAL over arbitrary bytes."""
    try:
        return _decode_flac(payload)
    except (IndexError, ValueError, TypeError, OverflowError):
        # OverflowError backstop (ADVICE r11 #1): a crafted valid-CRC
        # stream (LPC shift 0, huge coefficients) can push reconstructed
        # Python-int samples past int64 before the range gate runs.
        return None


def _decode_flac(payload):
    import numpy as np

    n = len(payload)
    if n < 8 or bytes(payload[:4]) != b"fLaC":
        return None
    pos = 4
    info = None
    while pos + 4 <= n:
        hdr = payload[pos]
        blen = int.from_bytes(bytes(payload[pos + 1 : pos + 4]), "big")
        body_start = pos + 4
        if body_start + blen > n:
            return None
        if hdr & 0x7F == 0:  # STREAMINFO
            info = bytes(payload[body_start : body_start + blen])
            if len(info) < 34:
                return None
        pos = body_start + blen
        if hdr & 0x80:
            break
    if info is None:
        return None
    r = _BitReader(info, 0)
    r.read(16)
    r.read(16)
    r.read(24)
    r.read(24)
    rate = r.read(20)
    channels = r.read(3) + 1
    bps = r.read(5) + 1
    total = r.read(36)
    md5 = info[18:34]
    if channels < 1 or channels > 8 or bps != 16 or rate <= 0:
        return None  # the 16-bit boundary, like decode_wav
    chans: list = [[] for _ in range(channels)]
    while pos + 2 <= n and len(chans[0]) < total:
        got = _decode_frame(
            payload, pos, rate, total - len(chans[0]), channels
        )
        if got is None:
            return None
        frame_chans, pos = got
        for i in range(channels):
            chans[i].extend(frame_chans[i])
    if len(chans[0]) != total:
        return None
    # Range gate (ADVICE r11 #1): reconstructed samples are unbounded
    # Python ints (invalid LPC/stereo streams overflow 16 bits); int16
    # conversion would silently wrap (numpy<2) or raise (numpy>=2), so
    # reject out-of-range streams as invalid rather than decode wrong.
    for ch in chans:
        if ch and (min(ch) < -32768 or max(ch) > 32767):
            return None
    pcm = np.asarray(chans, dtype="<i2")  # (channels, total)
    if md5 != b"\x00" * 16:
        # STREAMINFO MD5 covers the channel-INTERLEAVED LE sample bytes
        interleaved = pcm.T.reshape(-1)
        if hashlib.md5(interleaved.tobytes()).digest() != md5:
            return None  # stream lies about its own audio: reject
    return pcm[0].copy(), rate, channels


def _walk_frame_header(payload, pos: int, info_rate: int):
    """The ONE frame-header walk (review finding r11: this arithmetic
    existed twice): returns (bs, rate, chan, size_code, crc_off,
    subframe_off) without judging CRC or channel support -- the strict
    decoder layers those checks on top, the classifier reads offsets
    only. Raises ValueError on sync/structure violations."""
    n = len(payload)
    if pos + 5 > n:
        raise ValueError("truncated frame header")
    if payload[pos] != 0xFF or payload[pos + 1] != 0xF8:
        # Exact 0xF8: 6 sync bits 111110 + reserved 0 + strategy 0.
        # The variable-blocksize strategy bit (0xF9) is rejected here
        # (ADVICE r11 #3): under it the coded number is a SAMPLE number,
        # not a frame index, and this decoder implements fixed-blocksize
        # semantics only -- accepting it would misread headers.
        raise ValueError("bad sync (fixed-blocksize strategy only)")
    hdr_start = pos
    bs_code = payload[pos + 2] >> 4
    sr_code = payload[pos + 2] & 0x0F
    chan = payload[pos + 3] >> 4
    size_code = (payload[pos + 3] >> 1) & 0x07
    pos += 4
    first = payload[pos]  # UTF-8 coded frame number
    pos += 1
    if first & 0x80:
        m, probe = 0, first
        while probe & 0x80:
            m += 1
            probe = (probe << 1) & 0xFF
        if m < 2 or m > 7:
            raise ValueError("bad UTF-8 frame number")
        pos += m - 1
    if bs_code in (6, 7):
        width = 1 if bs_code == 6 else 2
        if pos + width > n:
            raise ValueError("truncated blocksize field")
        bs = int.from_bytes(bytes(payload[pos : pos + width]), "big") + 1
        pos += width
    elif bs_code == 1:
        bs = 192
    elif 2 <= bs_code <= 5:
        bs = 576 << (bs_code - 2)
    elif 8 <= bs_code <= 15:
        bs = 256 << (bs_code - 8)
    else:
        raise ValueError("reserved blocksize code")
    if sr_code == 0:
        rate = info_rate
    elif sr_code in _RATE_CODES:
        rate = _RATE_CODES[sr_code]
    elif sr_code in (12, 13, 14):
        width = 1 if sr_code == 12 else 2
        if pos + width > n:
            raise ValueError("truncated sample-rate field")
        v = int.from_bytes(bytes(payload[pos : pos + width]), "big")
        rate = v * 1000 if sr_code == 12 else (v if sr_code == 13 else v * 10)
        pos += width
    else:
        raise ValueError("invalid sample-rate code")
    if pos >= n:
        raise ValueError("truncated before CRC-8")
    return bs, rate, chan, size_code, pos, pos + 1


def _decode_frame(
    payload, pos: int, info_rate: int, remaining: int, n_channels: int = 1
):
    """One frame -> (list of per-channel sample lists, next_pos).
    Channel assignments (round 11 stereo): 0-7 independent channels,
    8 left/side, 9 right/side, 10 mid/side -- the side subframe
    carries bps+1 bits and the stereo decorrelation is inverted
    exactly per the spec (side = L - R; mid = (L + R) >> 1 with the
    side's low bit restoring the dropped parity)."""
    hdr_start = pos
    try:
        bs, rate, chan, size_code, crc_off, sub_off = _walk_frame_header(
            payload, pos, info_rate
        )
    except ValueError:
        return None
    if size_code != 4:
        return None  # 16-bit samples only
    if chan <= 7:
        n_sub, kinds = chan + 1, None
    elif chan == 8:
        n_sub, kinds = 2, ("main", "side")  # left/side
    elif chan == 9:
        n_sub, kinds = 2, ("side", "main")  # right/side
    elif chan == 10:
        n_sub, kinds = 2, ("main", "side")  # mid/side
    else:
        return None
    if n_sub != n_channels:
        return None  # frame disagrees with STREAMINFO
    if _crc8(payload[hdr_start:crc_off]) != payload[crc_off]:
        return None
    if bs > remaining or bs <= 0 or bs > 1 << 20:
        return None
    r = _BitReader(payload, sub_off)
    subs = []
    for i in range(n_sub):
        bps = 16 + (1 if kinds and kinds[i] == "side" else 0)
        sub = _decode_subframe(r, bs, bps)
        if sub is None:
            return None
        subs.append(sub)
    r.align()
    crc16 = int.from_bytes(bytes(payload[r.pos : r.pos + 2]), "big")
    if _crc16(payload[hdr_start : r.pos]) != crc16:
        return None
    if chan == 8:  # left/side: R = L - S
        left, side = subs
        chans = [left, [l - s for l, s in zip(left, side)]]
    elif chan == 9:  # right/side: L = R + S
        side, right = subs
        chans = [[rr + s for rr, s in zip(right, side)], right]
    elif chan == 10:  # mid/side
        mid, side = subs
        chans = [[], []]
        for m, s in zip(mid, side):
            mm = (m << 1) | (s & 1)
            chans[0].append((mm + s) >> 1)
            chans[1].append((mm - s) >> 1)
    else:
        chans = subs
    return chans, r.pos + 2


def _decode_subframe(r: _BitReader, bs: int, bps: int = 16):
    pad = r.read(1)
    ftype = r.read(6)
    wflag = r.read(1)
    if pad is None or ftype is None or wflag is None or pad != 0:
        return None
    wasted = 0
    if wflag:
        q = r.read_unary()
        if q is None:
            return None
        wasted = q + 1
    width = bps - wasted

    def sgn(v):
        return v - (1 << width) if v >= (1 << (width - 1)) else v

    if ftype == 0:  # CONSTANT
        v = r.read(width)
        if v is None:
            return None
        return [sgn(v) << wasted] * bs
    if ftype == 1:  # VERBATIM
        out = []
        for _ in range(bs):
            v = r.read(width)
            if v is None:
                return None
            out.append(sgn(v) << wasted)
        return out
    if 8 <= ftype <= 12:  # FIXED, order 0-4
        order = ftype - 8
        if order > bs:
            return None
        warm = []
        for _ in range(order):
            v = r.read(width)
            if v is None:
                return None
            warm.append(sgn(v))
        res = _decode_residual(r, bs, order)
        if res is None:
            return None
        coefs = _FIXED_COEFS[order]
        out = list(warm)
        for e in res:
            pred = sum(c * out[len(out) - 1 - j] for j, c in enumerate(coefs))
            out.append(pred + e)
        return [v << wasted for v in out]
    if ftype >= 32:  # LPC, order 1-32 (round 11: decodes)
        order = (ftype & 0x1F) + 1
        if order > bs:
            return None
        warm = []
        for _ in range(order):
            v = r.read(width)
            if v is None:
                return None
            warm.append(sgn(v))
        prec_m1 = r.read(4)
        if prec_m1 is None or prec_m1 == 15:  # 15: invalid per spec
            return None
        prec = prec_m1 + 1
        shift = r.read(5)
        if shift is None or shift & 0x10:  # negative shift: invalid
            return None
        coefs = []
        for _ in range(order):
            c = r.read(prec)
            if c is None:
                return None
            if c >= 1 << (prec - 1):
                c -= 1 << prec  # two's complement signed
            coefs.append(c)
        res = _decode_residual(r, bs, order)
        if res is None:
            return None
        out = list(warm)
        for e in res:
            # arithmetic right shift of the UNSHIFTED prediction sum
            # (Python's >> on negatives IS arithmetic -- the spec's rule)
            pred = sum(
                c * out[len(out) - 1 - j] for j, c in enumerate(coefs)
            ) >> shift
            out.append(pred + e)
        return [v << wasted for v in out]
    # reserved subframe types (2-7, 13-31): the counted boundary
    return None


def _decode_residual(r: _BitReader, bs: int, order: int):
    method = r.read(2)
    if method is None or method > 1:
        return None
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.read(4)
    if po is None:
        return None
    parts = 1 << po
    if bs % parts:
        return None  # blocksize must split evenly across partitions
    out = []
    for i in range(parts):
        count = (bs >> po) - (order if i == 0 else 0)
        if count < 0:
            return None
        p = r.read(pbits)
        if p is None:
            return None
        if p == escape:
            raw = r.read(5)
            if raw is None:
                return None
            for _ in range(count):
                v = r.read(raw) if raw else 0
                if v is None:
                    return None
                if raw and v >= (1 << (raw - 1)):
                    v -= 1 << raw
                out.append(v)
        else:
            for _ in range(count):
                q = r.read_unary()
                if q is None:
                    return None
                rem = r.read(p) if p else 0
                if rem is None:
                    return None
                out.append(_unzigzag((q << p) | rem))
    return out



#: Frame channel-assignment codes for the stereo encoder's modes.
_STEREO_CHAN = {
    "independent": 1,  # 2 independent channels
    "left_side": 8,
    "right_side": 9,
    "mid_side": 10,
}


def encode_flac_stereo(
    left, right, sample_rate: int = 8000, *, mode: str = "mid_side"
) -> bytes:
    """Stereo 16-bit FLAC writer: the mono writer's frame discipline
    with two subframes per frame under the chosen channel assignment
    -- 'independent', 'left_side' (L + side), 'right_side' (side +
    R), or 'mid_side' (mid + side). Side subframes carry 17 bits;
    all decorrelations are exactly invertible, so decode returns the
    original channels bit-for-bit (the lossless claim the tests pin
    per mode). STREAMINFO MD5 covers the channel-interleaved bytes."""
    import numpy as np

    if mode not in _STEREO_CHAN:
        raise ValueError(f"unknown stereo mode {mode!r}")
    left = [int(s) for s in np.asarray(left, dtype="<i2")]
    right = [int(s) for s in np.asarray(right, dtype="<i2")]
    if len(left) != len(right):
        raise ValueError("channel length mismatch")
    n = len(left)
    block = 4096
    interleaved = np.empty(2 * n, dtype="<i2")
    interleaved[0::2] = left
    interleaved[1::2] = right
    md5 = hashlib.md5(interleaved.tobytes()).digest()
    w = _BitWriter()
    w.write(max(min(block, n) if n else block, 16), 16)
    w.write(max(min(block, n) if n else block, 16), 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(sample_rate, 20)
    w.write(1, 3)  # channels - 1
    w.write(15, 5)  # bits per sample - 1
    w.write(n, 36)
    info = w.bytes() + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + info

    chan_code = _STEREO_CHAN[mode]
    frame_idx = 0
    pos = 0
    while pos < n:
        bs = min(block, n - pos)
        lc = left[pos : pos + bs]
        rc = right[pos : pos + bs]
        if mode == "independent":
            subs = [(lc, 16), (rc, 16)]
        elif mode == "left_side":
            subs = [(lc, 16), ([l - r for l, r in zip(lc, rc)], 17)]
        elif mode == "right_side":
            subs = [([l - r for l, r in zip(lc, rc)], 17), (rc, 16)]
        else:  # mid_side: mid drops the parity bit the side restores
            subs = [
                ([(l + r) >> 1 for l, r in zip(lc, rc)], 16),
                ([l - r for l, r in zip(lc, rc)], 17),
            ]
        hdr = bytearray(b"\xff\xf8")
        sr_code, sr_bytes = _rate_code(sample_rate)
        hdr.append((0x07 << 4) | sr_code)
        hdr.append((chan_code << 4) | (0x04 << 1))
        hdr += _utf8_number(frame_idx)
        hdr += (bs - 1).to_bytes(2, "big")
        hdr += sr_bytes
        hdr.append(_crc8(hdr))
        body = _BitWriter()
        for chunk, bps in subs:
            _encode_subframe(body, chunk, None, bps)
        body.align()
        frame = bytes(hdr) + body.bytes()
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
        pos += bs
        frame_idx += 1
    return bytes(out)


def _first_subframe_offset(payload) -> int:
    """Byte offset of the first frame's first subframe header (it is
    byte-aligned: the frame header is whole bytes) -- the walked
    offset the boundary report's LPC planting rewrites, and the
    classifier reads. Shares _walk_frame_header with the strict
    decoder (which additionally judges CRC and channel support).
    Raises ValueError when the stream has no frame."""
    n = len(payload)
    if n < 8 or bytes(payload[:4]) != b"fLaC":
        raise ValueError("not FLAC")
    pos = 4
    while pos + 4 <= n:
        hdr = payload[pos]
        blen = int.from_bytes(bytes(payload[pos + 1 : pos + 4]), "big")
        pos += 4 + blen
        if hdr & 0x80:
            break
    _bs, _rate, _ch, _sz, _crc_off, sub_off = _walk_frame_header(
        payload, pos, 0
    )
    if sub_off >= n:
        raise ValueError("truncated frame header")
    return sub_off


def flac_subframe_class(payload) -> str | None:
    """Subframe class of the first frame ('constant', 'verbatim',
    'fixed', 'lpc', 'other') by header walk -- no residual decode;
    None when the bytes are not a FLAC stream with a frame."""
    try:
        off = _first_subframe_offset(payload)
    except ValueError:
        return None
    t = (payload[off] >> 1) & 0x3F
    if t == 0:
        return "constant"
    if t == 1:
        return "verbatim"
    if 8 <= t <= 12:
        return "fixed"
    if t >= 32:
        return "lpc"
    return "reserved"
