"""Lossless JPEG (SOF3) -- round-12 ask #4, closing the JPEG family's
last non-differential process.  ITU-T T.81 Annex H: no DCT, no
quantization -- each sample is predicted from decoded neighbors
(predictors 1-7, H.1.2.1) and the prediction DIFFERENCE is coded with
the DC-coefficient Huffman machinery (magnitude category SSSS 0..16 +
appended bits; SSSS=16 means DIFF=32768 with no appended bits, the
one lossless-only case).  All difference arithmetic is modulo 65536
(H.1.2.1's "taken modulo 2^16").

Boundary rules (spec cites inline):

* precision 2..16 bits, point transform Pt shifts samples right by
  Pt before coding and left after (scan header Al field);
* first sample of the scan (and of each restart interval) predicts
  2^(P-Pt-1); the rest of the FIRST line predicts Ra (left); the
  first sample of every other line predicts Rb (above); everything
  else uses the scan's selected predictor Ss in 1..7;
* interleaved multi-component scans are supported for h=v=1
  components (one sample per component per MCU -- the layout real
  lossless writers emit); subsampled lossless stays a counted
  boundary, as does hierarchical/differential coding (SOF5-7/13-15).

The encoder emits a minimal-but-standard stream: SOF3, one DHT whose
canonical table carries all 17 categories at 5 bits (the all-ones
code stays unused, per the Annex C convention), single scan, no
restarts.  The decoder handles restart markers (prediction + first-
line rule reset per H.2.2).  Reuses operators/jpeg.py's bit I/O and
canonical-Huffman classes -- one entropy machine for the family."""

from __future__ import annotations

from .jpeg import _BitReader, _BitWriter, _HuffTable, _huff_table

#: the lossless DHT: 17 magnitude categories (0..16), all length 5 --
#: canonical assignment leaves the all-ones 5-bit code unused
_L_COUNTS = [0, 0, 0, 0, 17] + [0] * 11
_L_SYMBOLS = bytes(range(17))

#: the image-dimension bomb guard shared with the DCT paths
_MAX_PIXELS = 64_000_000


def encode_jpeg_lossless(
    samples,
    *,
    predictor: int = 4,
    precision: int = 8,
    point_transform: int = 0,
) -> bytes:
    """SOF3 stream of a grayscale (h, w) or multi-component (h, w, nc)
    sample array (nc <= 4, values in [0, 2^precision)).  Decode with
    decode_jpeg_lossless for the sample-exact inverse."""
    import numpy as np

    a = np.asarray(samples, dtype=np.int64)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nc = a.shape
    if not (1 <= nc <= 4):
        raise ValueError("1-4 components")
    if not (2 <= precision <= 16):
        raise ValueError("precision 2..16")
    if not (1 <= predictor <= 7):
        raise ValueError("predictor 1..7")
    pt = point_transform
    if a.min() < 0 or a.max() >= (1 << precision):
        raise ValueError("samples out of range for precision")
    out = bytearray(b"\xff\xd8")  # SOI
    sof = bytearray()
    sof += precision.to_bytes(1, "big")
    sof += h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += nc.to_bytes(1, "big")
    for c in range(nc):
        sof += bytes((c + 1, 0x11, 0))  # id, h=v=1, Tq 0 (unused)
    out += b"\xff\xc3" + (2 + len(sof)).to_bytes(2, "big") + sof
    dht = bytes((0x00,)) + bytes(_L_COUNTS) + _L_SYMBOLS
    out += b"\xff\xc4" + (2 + len(dht)).to_bytes(2, "big") + dht
    sos = bytearray((nc,))
    for c in range(nc):
        sos += bytes((c + 1, 0x00))  # DC table 0
    sos += bytes((predictor, 0, pt))  # Ss=predictor, Se=0, Ah<<4|Al=Pt
    out += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos
    table = _huff_table(_L_COUNTS, _L_SYMBOLS)
    writer = _BitWriter()
    shifted = (a >> pt).astype(np.int64)
    default = 1 << (precision - pt - 1)
    for y in range(h):
        for x in range(w):
            for c in range(nc):
                px = _predict(
                    shifted[:, :, c], y, x, predictor, default, first=(y == 0)
                )
                diff = (int(shifted[y, x, c]) - px) & 0xFFFF
                if diff > 32768:
                    diff -= 65536  # signed view of the modulo ring
                if diff == 32768:
                    code, length = table.encode[16]
                    writer.write(code, length)  # SSSS 16: no raw bits
                    continue
                s = abs(diff).bit_length()
                code, length = table.encode[s]
                writer.write(code, length)
                if s:
                    raw = diff if diff > 0 else diff + (1 << s) - 1
                    writer.write(raw, s)
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _predict(plane, y: int, x: int, sel: int, default: int, first: bool):
    """H.1.2.1 prediction (encoder side mirrors decode exactly): the
    plane holds already-shifted sample values."""
    if y == 0 and x == 0:
        return default
    if first:  # rest of the first line: Ra
        return int(plane[y, x - 1])
    if x == 0:  # first sample of a later line: Rb
        return int(plane[y - 1, x])
    ra = int(plane[y, x - 1])
    rb = int(plane[y - 1, x])
    rc = int(plane[y - 1, x - 1])
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1  # sel 7


def decode_jpeg_lossless(payload: bytes):
    """SOF3 decode: (samples uint16 array (h, w, nc), precision) or
    None for anything outside the supported set (not SOF3, subsampled
    components, structural corruption, truncated entropy data).
    TOTAL over arbitrary bytes."""
    try:
        return _decode(payload)
    except (IndexError, ValueError, TypeError, KeyError):
        return None


def _decode(payload: bytes):
    import numpy as np

    n = len(payload)
    if n < 4 or payload[:2] != b"\xff\xd8":
        return None
    huff: dict[int, _HuffTable] = {}
    frame = None
    restart_interval = 0
    i = 2
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            i += 2
            continue
        if marker == 0xD9:
            return None
        seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
        if seg_len < 2 or i + 2 + seg_len > n:
            return None
        body = payload[i + 4 : i + 2 + seg_len]
        if marker == 0xC3:
            precision = body[0]
            if not (2 <= precision <= 16):
                return None
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if h <= 0 or w <= 0 or not (1 <= nc <= 4):
                return None
            if h * w * nc > _MAX_PIXELS:
                return None
            comps = []
            for c in range(nc):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                if hv != 0x11:
                    return None  # subsampled lossless: counted boundary
                comps.append(cid)
            frame = (h, w, comps, precision)
        elif marker == 0xC4:
            p = 0
            while p + 17 <= len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                counts = list(body[p + 1 : p + 17])
                total = sum(counts)
                p += 17
                if p + total > len(body):
                    return None
                if tc == 0:
                    huff[th] = _huff_table(counts, body[p : p + total])
                elif tc != 1:
                    return None
                p += total
        elif marker == 0xDD:
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:
            if frame is None:
                return None
            return _decode_scan(
                payload, i + 2 + seg_len, body, frame, huff,
                restart_interval,
            )
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            return None  # a DCT process: not this decoder's stream
        i += 2 + seg_len
    return None


def _decode_scan(payload, pos, sos, frame, huff, dri):
    import numpy as np

    h, w, comps, precision = frame
    ns = sos[0]
    if ns != len(comps):
        return None
    tables = []
    for c in range(ns):
        td = sos[2 + 2 * c] >> 4
        if td not in huff:
            return None
        tables.append(huff[td])
    sel = sos[1 + 2 * ns]
    pt = sos[3 + 2 * ns] & 0x0F
    if not (1 <= sel <= 7) or pt >= precision:
        return None
    nc = len(comps)
    plane = np.zeros((h, w, nc), dtype=np.int64)
    default = 1 << (precision - pt - 1)
    reader = _BitReader(payload, pos)
    rst = 0
    since_rst = 0
    fresh = True  # scan/restart start: the next sample predicts default
    fresh_row = 0  # the row where the current interval began
    for y in range(h):
        for x in range(w):
            if dri and since_rst == dri:
                if not reader.align_and_expect_rst(rst):
                    return None
                rst = (rst + 1) & 7
                since_rst = 0
                fresh = True
                fresh_row = y
            for c in range(nc):
                s = reader.decode_huff(tables[c])
                if s is None or s > 16:
                    return None
                if s == 16:
                    diff = 32768
                elif s:
                    raw = reader.bits(s)
                    if raw is None:
                        return None
                    diff = (
                        raw
                        if raw >= (1 << (s - 1))
                        else raw - (1 << s) + 1
                    )
                else:
                    diff = 0
                if fresh:
                    px = default
                elif y == fresh_row:
                    px = int(plane[y, x - 1, c])  # first-line rule: Ra
                elif x == 0:
                    px = int(plane[y - 1, x, c])
                else:
                    ra = int(plane[y, x - 1, c])
                    rb = int(plane[y - 1, x, c])
                    rc_ = int(plane[y - 1, x - 1, c])
                    if sel == 1:
                        px = ra
                    elif sel == 2:
                        px = rb
                    elif sel == 3:
                        px = rc_
                    elif sel == 4:
                        px = ra + rb - rc_
                    elif sel == 5:
                        px = ra + ((rb - rc_) >> 1)
                    elif sel == 6:
                        px = rb + ((ra - rc_) >> 1)
                    else:
                        px = (ra + rb) >> 1
                val = (px + diff) & 0xFFFF
                if val >= (1 << (precision - pt)):
                    return None  # corrupt stream: sample out of range
                plane[y, x, c] = val
            fresh = False
            since_rst += 1
    return (plane << pt).astype(np.uint16), precision
