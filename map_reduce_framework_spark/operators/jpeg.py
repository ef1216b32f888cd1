"""Pure-Python baseline JPEG codec (ITU-T T.81) -- closing the last
``NotImplementedError`` in the multimodal decode path (VERDICT r6 ask
#6).

``decode_jpeg_pixels`` handles baseline sequential DCT (SOF0): marker
walk, DQT (8/16-bit), DHT (canonical Huffman per Annex C), SOS,
restart intervals (DRI/RSTn), byte-unstuffing, per-MCU entropy decode
with arbitrary sampling factors (4:4:4, 4:2:2, 4:2:0 via the generic
h x v block loop), dequantize + dezigzag, float separable IDCT
(A.T @ B @ A with the orthonormal DCT-II basis), level shift, chroma
replication upsample, JFIF YCbCr -> RGB. Grayscale (1 component) and
color (3 components) both decode; progressive (SOF2), arithmetic
coding, and 12-bit precision return None -- the honest remaining
boundary, documented in SCALE.md.

``encode_jpeg`` is the matching minimal encoder (used by the tests and
the registered query path): baseline SOF0, quality-1 quantization
(all-ones tables, so the only loss is DCT float rounding), flat
canonical Huffman tables (12 DC symbols at 4 bits, 162 AC symbols at
8 bits -- valid per Annex C, the all-ones code unused), grayscale or
4:4:4 color. Decoders read Huffman/quant tables from the stream, so
interop does not depend on the standard Annex K tables.

Everything is numpy + stdlib. The per-block Python loops are fine for
the small curation payloads this engine decodes inside Arrow batches
(the same argument as the PNG unfilter loop); swap in libjpeg-turbo
via PIL where thumbnails get big.
"""

from __future__ import annotations

import math

#: zigzag order: zigzag[k] = (row, col) of the k-th coefficient.
_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]


def _dct_basis():
    """Orthonormal 8x8 DCT-II basis A (A[u, x] = c(u)/2 *
    cos((2x+1) u pi / 16)): spatial = A.T @ coeff @ A, coeff = A @
    spatial @ A.T."""
    import numpy as np

    a = np.empty((8, 8))
    for u in range(8):
        c = math.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            a[u, x] = c * math.cos((2 * x + 1) * u * math.pi / 16)
    return a


class _HuffTable:
    """Canonical Huffman table per T.81 Annex C: codes assigned in
    order of increasing length, then symbol order within a length."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1
        # encoder view: symbol -> (code, length)
        self.encode = {
            sym: (code, length) for (length, code), sym in self.lookup.items()
        }


class _BitReader:
    """Entropy-segment bit reader: MSB-first, 0xFF00 unstuffing; stops
    at any non-stuffed marker (the caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                return False  # a real marker: scan data ends here
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def bit(self) -> int | None:
        if self.nbits == 0 and not self._fill():
            return None
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            b = self.bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def align_and_expect_rst(self, idx: int) -> bool:
        """Byte-align, then consume the expected RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        if self.pos + 2 > len(d) or d[self.pos] != 0xFF:
            return False
        if d[self.pos + 1] != 0xD0 + (idx & 7):
            return False
        self.pos += 2
        return True

    def decode_huff(self, table: _HuffTable) -> int | None:
        code = 0
        for length in range(1, 17):
            b = self.bit()
            if b is None:
                return None
            code = (code << 1) | b
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        return None


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an s-bit magnitude to its signed
    value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg_pixels(payload: bytes):
    """Baseline-JPEG pixel decode: numpy uint8 (height, width, 3) RGB,
    or None when the payload is not a decodable baseline JPEG (wrong
    magic, progressive/arithmetic/12-bit, structural corruption)."""
    import numpy as np

    n = len(payload)
    if n < 4 or payload[:2] != b"\xff\xd8":
        return None
    quant: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None  # (H, W, [(comp_id, h, v, tq), ...])
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
        if marker == 0xD9:  # EOI before SOS
            return None
        seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
        if seg_len < 2 or i + 2 + seg_len > n:
            return None
        body = payload[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq not in (0, 1) or tq > 3:
                    return None
                width = 2 if pq else 1
                if p + 64 * width > len(body):
                    return None
                vals = [
                    int.from_bytes(body[p + k * width : p + (k + 1) * width], "big")
                    for k in range(64)
                ]
                p += 64 * width
                q = np.zeros((8, 8))
                for k, (r, c) in enumerate(_ZIGZAG):
                    q[r, c] = vals[k]
                quant[tq] = q
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                counts = list(body[p + 1 : p + 17])
                total = sum(counts)
                p += 17
                if p + total > len(body):
                    return None
                table = _HuffTable(counts, body[p : p + total])
                p += total
                if tc == 0:
                    huff_dc[th] = table
                elif tc == 1:
                    huff_ac[th] = table
                else:
                    return None
        elif marker == 0xC0:  # SOF0: baseline sequential DCT
            if body[0] != 8:  # 12-bit precision unsupported
                return None
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if height <= 0 or width <= 0 or nc not in (1, 3):
                return None
            comps = []
            for c in range(nc):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, body[8 + 3 * c]))
            frame = (height, width, comps)
        elif marker in (0xC1,):  # extended sequential: same decode path
            return None  # keep strictly baseline
        elif 0xC2 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return None  # progressive & friends: unsupported
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            return _decode_scan(
                payload,
                i + 2 + seg_len,
                body,
                frame,
                quant,
                huff_dc,
                huff_ac,
                restart_interval,
            )
        i += 2 + seg_len
    return None


def _decode_scan(
    payload, data_pos, sos_body, frame, quant, huff_dc, huff_ac, dri
):
    import numpy as np

    height, width, comps = frame
    ns = sos_body[0]
    if ns != len(comps):
        return None  # multi-scan files are progressive-ish: unsupported
    tables = {}
    for s in range(ns):
        cs = sos_body[1 + 2 * s]
        td, ta = sos_body[2 + 2 * s] >> 4, sos_body[2 + 2 * s] & 0x0F
        tables[cs] = (td, ta)
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        return None
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    # dims cap (PIL MAX_IMAGE_PIXELS pattern): a corrupt SOF claiming
    # 65535x65535 would otherwise allocate tens of GiB of plane arrays
    # before the entropy decode ever touches the (tiny) scan data
    if mcus_x * mcus_y * 64 * hmax * vmax * len(comps) > 64_000_000:
        return None
    basis = _dct_basis()
    planes = []
    for cid, h, v, tq in comps:
        if (
            cid not in tables
            or tq not in quant
            or tables[cid][0] not in huff_dc
            or tables[cid][1] not in huff_ac
            or hmax % h
            or vmax % v
        ):
            return None
        planes.append(np.zeros((mcus_y * v * 8, mcus_x * h * 8)))
    reader = _BitReader(payload, data_pos)
    preds = [0] * len(comps)
    rst_idx = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_count and mcu_count % dri == 0:
                if not reader.align_and_expect_rst(rst_idx):
                    return None
                rst_idx = (rst_idx + 1) & 7
                preds = [0] * len(comps)
            for ci, (cid, h, v, tq) in enumerate(comps):
                td, ta = tables[cid]
                for by in range(v):
                    for bx in range(h):
                        block = _decode_block(
                            reader,
                            huff_dc[td],
                            huff_ac[ta],
                            quant[tq],
                            preds,
                            ci,
                        )
                        if block is None:
                            return None
                        spatial = basis.T @ block @ basis + 128.0
                        y0 = (my * v + by) * 8
                        x0 = (mx * h + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_count += 1
    out = []
    for ci, (cid, h, v, tq) in enumerate(comps):
        p = planes[ci]
        if h != hmax or v != vmax:  # replicate-upsample subsampled chroma
            p = np.repeat(np.repeat(p, vmax // v, axis=0), hmax // h, axis=1)
        out.append(p[:height, :width])
    if len(out) == 1:
        g = np.clip(np.rint(out[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _decode_block(reader, dc_table, ac_table, q, preds, ci):
    """One 8x8 block: DC diff + AC run/size entropy decode, dequantize,
    dezigzag."""
    import numpy as np

    s = reader.decode_huff(dc_table)
    if s is None or s > 11:
        return None
    if s:
        v = reader.bits(s)
        if v is None:
            return None
        preds[ci] += _extend(v, s)
    block = np.zeros((8, 8))
    block[0, 0] = preds[ci] * q[0, 0]
    k = 1
    while k < 64:
        rs = reader.decode_huff(ac_table)
        if rs is None:
            return None
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL: 16 zeros
            k += 16
            continue
        run, size = rs >> 4, rs & 0x0F
        k += run
        if k >= 64 or size == 0:
            return None
        v = reader.bits(size)
        if v is None:
            return None
        r, c = _ZIGZAG[k]
        block[r, c] = _extend(v, size) * q[r, c]
        k += 1
    return block


# ---------------------------------------------------------------------------
# Minimal encoder (tests + generated-payload queries).
# ---------------------------------------------------------------------------

#: Flat canonical tables (Annex-C-valid; all-ones code unused):
#: 12 DC size symbols at 4 bits, 162 AC run/size symbols at 8 bits.
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_DC_SYMBOLS = bytes(range(12))
_AC_SYMBOLS = bytes(
    [0x00, 0xF0]
    + sorted((r << 4) | s for r in range(16) for s in range(1, 11))
)
_AC_COUNTS = [0] * 7 + [162] + [0] * 8


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, raw bits) for a signed coefficient, per F.1.2.1."""
    v = int(v)
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _encode_block(writer, block, dc_tab, ac_tab, pred):
    import numpy as np

    coeff = np.rint(block).astype(int)
    diff = coeff[0, 0] - pred
    s, raw = _magnitude(diff)
    code, length = dc_tab.encode[s]
    writer.write(code, length)
    if s:
        writer.write(raw, s)
    zz = [coeff[r, c] for r, c in _ZIGZAG]
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_tab.encode[0xF0]
            writer.write(code, length)
            run -= 16
        s, raw = _magnitude(zz[k])
        code, length = ac_tab.encode[(run << 4) | s]
        writer.write(code, length)
        writer.write(raw, s)
        run = 0
    if last_nz < 63:
        code, length = ac_tab.encode[0x00]
        writer.write(code, length)
    return coeff[0, 0]


def encode_jpeg(
    pixels, *, subsample_420: bool = False, restart_interval: int = 0
) -> bytes:
    """Minimal baseline JPEG: grayscale when the input is 2-D or all
    three channels equal, else YCbCr color (4:4:4, or 4:2:0 with
    ``subsample_420`` -- luma 2x2 sampling, chroma box-averaged).
    All-ones quant tables (the only loss is DCT float rounding,
    RGB<->YCbCr rounding, and optional chroma subsampling), flat
    Huffman tables written into DHT, optional DRI/RSTn restarts."""
    import numpy as np

    px = np.asarray(pixels)
    if px.ndim == 3 and px.shape[2] >= 3:
        r = px[:, :, 0].astype(float)
        g = px[:, :, 1].astype(float)
        b = px[:, :, 2].astype(float)
        if np.array_equal(px[:, :, 0], px[:, :, 1]) and np.array_equal(
            px[:, :, 0], px[:, :, 2]
        ):
            channels = [r]
        else:
            y = 0.299 * r + 0.587 * g + 0.114 * b
            cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
            cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
            channels = [y, cb, cr]
    else:
        if px.ndim == 3 and px.shape[2] == 1:
            px = px[:, :, 0]  # squeeze single-channel 3-D to grayscale
        if px.ndim != 2:
            raise ValueError(
                "encode_jpeg expects (h, w), (h, w, 1) grayscale or "
                f"(h, w, >=3) color input, got shape {px.shape}"
            )
        channels = [px.astype(float)]
    h, w = channels[0].shape
    nc = len(channels)
    use_420 = subsample_420 and nc == 3
    if use_420:
        # pad to even dims, box-average chroma 2x2
        he, we = h + (h & 1), w + (w & 1)
        padded = []
        for chan in channels:
            p = np.full((he, we), 128.0)
            p[:h, :w] = chan
            if h & 1:
                p[h, :w] = chan[h - 1]
            if w & 1:
                p[:h, w] = chan[:, w - 1]
            if (h & 1) and (w & 1):
                p[h, w] = chan[h - 1, w - 1]
            padded.append(p)
        luma = padded[0]
        chroma = [
            (c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2] + c[1::2, 1::2])
            / 4.0
            for c in padded[1:]
        ]
        samplings = [(2, 2), (1, 1), (1, 1)]
        comp_planes = [luma] + chroma
    else:
        samplings = [(1, 1)] * nc
        comp_planes = channels
    basis = _dct_basis()
    dc_tab = _HuffTable(_DC_COUNTS, _DC_SYMBOLS)
    ac_tab = _HuffTable(_AC_COUNTS, _AC_SYMBOLS)

    out = bytearray(b"\xff\xd8")
    # DQT: table 0, all ones
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([0x00])
    out += bytes([1] * 64)
    # SOF0
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([nc])
    for c in range(nc):
        sh, sv = samplings[c]
        sof += bytes([c + 1, (sh << 4) | sv, 0])
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    # DHT: DC table 0, AC table 0
    dht = bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMBOLS
    dht += bytes([0x10]) + bytes(_AC_COUNTS) + _AC_SYMBOLS
    out += b"\xff\xc4" + (len(dht) + 2).to_bytes(2, "big") + dht
    if restart_interval:
        out += b"\xff\xdd" + (4).to_bytes(2, "big")
        out += restart_interval.to_bytes(2, "big")
    # SOS
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos

    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    writer = _BitWriter()
    preds = [0] * nc
    rst_idx = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                out += writer.flush()
                out += bytes([0xFF, 0xD0 + (rst_idx & 7)])
                rst_idx += 1
                writer = _BitWriter()
                preds = [0] * nc
            for ci, chan in enumerate(comp_planes):
                sh, sv = samplings[ci]
                for by in range(sv):
                    for bx in range(sh):
                        ys = (my * sv + by) * 8
                        xs = (mx * sh + bx) * 8
                        sub = chan[ys : ys + 8, xs : xs + 8]
                        if sub.shape == (8, 8):
                            tile = sub
                        elif sub.size == 0:
                            # an all-padding block (sampling grid
                            # overhang): constant = no AC energy
                            tile = np.full((8, 8), 128.0)
                        else:
                            # EDGE-REPLICATE partial blocks (T.81 A.2.4
                            # recommendation): a gray fill would put AC
                            # energy into the block and ring across the
                            # kept pixels (a 1x3 constant image decoded
                            # with a +/-1 error before this)
                            tile = np.empty((8, 8))
                            tile[: sub.shape[0], : sub.shape[1]] = sub
                            if sub.shape[1] < 8:
                                tile[: sub.shape[0], sub.shape[1] :] = sub[
                                    :, -1:
                                ]
                            if sub.shape[0] < 8:
                                tile[sub.shape[0] :, :] = tile[
                                    sub.shape[0] - 1, :
                                ]
                        block = basis @ (tile - 128.0) @ basis.T
                        preds[ci] = _encode_block(
                            writer, block, dc_tab, ac_tab, preds[ci]
                        )
            mcu_count += 1
    out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)
