"""Video stream metadata for codecs the engine cannot decode -- the
round-12 ask #2: a real curation pipeline wants the data-card columns
(resolution, duration, frame count) for avc1/hev1/vp09 payloads even
though their bitstreams stay outside the pure-Python codec boundary.
Header-walk work only, riding the strict box/chunk parsers in
operators/multimodal.py -- no codec needed:

* mp4: mvhd/tkhd/mdhd (movie + track + media headers, version 0 AND
  version 1 64-bit layouts), stsd visual-sample-entry dimensions,
  stsz sample count; for ``avc1`` the CODED dimensions come from the
  H.264 sequence parameter set inside the avcC record (ISO 14496-15)
  -- the sample-entry width/height is advisory in real files, the SPS
  is authoritative, and this module parses it for real (exp-Golomb,
  profile branches, frame cropping; ITU-T H.264 7.3.2.1).  hev1/vp09
  report the sample-entry dimensions (hvcC/vpcC parsing is the stated
  boundary -- entry dims, not coded dims, for those two).
* AVI: avih (dwTotalFrames, dwWidth/dwHeight), the 'vids' strh
  (dwRate/dwScale/dwLength -> duration), strf BITMAPINFOHEADER
  (biWidth/biHeight -- the authoritative stream dims).

The registered ``video_meta_report`` plants a per-doc container with
md5-derived dimensions/frame counts (the media_boundary_report
discipline: doc_id picks the class, md5 bytes pick the numbers, the
planted avc1 SPS carries dimensions that DIFFER from the sample-entry
fields so a hash match proves the SPS -- not the entry -- was read)
and the DuckDB oracle recomputes every column from the planting rule
alone.  Scale: a few hundred bytes of header reads per payload,
scan-bound Arrow map work, one map pass + no shuffle."""

from __future__ import annotations

import hashlib

from .multimodal import (
    IMG_SIDE,
    VIDEO_N_FRAMES,
    _avi_vids_offsets,
    _md5_quad_frames,
    _mp4_box,
    _mp4_children,
    _mp4_find,
    _mp4_full_box,
    _riff_children,
    encode_avi,
    encode_mp4,
)

# ------------------------------------------------------ exp-Golomb I/O


class _EgReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def u(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("exp-Golomb overrun")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


class _EgWriter:
    __slots__ = ("bits",)

    def __init__(self):
        self.bits: list = []

    def u(self, value: int, bits: int):
        for i in range(bits - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def ue(self, value: int):
        code = value + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def bytes(self) -> bytes:
        bits = self.bits + [1]  # rbsp_stop_one_bit
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


#: profiles whose SPS carries the chroma/bit-depth block (H.264
#: 7.3.2.1.1 "profile_idc == 100 || ..." branch)
_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}


def parse_sps_dims(nal: bytes):
    """(width, height) from an H.264 SPS NAL (header byte included) --
    the 7.3.2.1 parse up through frame cropping: profile/level,
    high-profile chroma block (scaling matrices REJECTED -> None, the
    stated boundary), pic order count types 0/1/2, mbs/map-units
    dimensions, frame_mbs_only, cropping with the 4:2:0/4:2:2/4:4:4
    crop-unit arithmetic.  None for anything malformed -- total."""
    try:
        if not nal or (nal[0] & 0x1F) != 7:
            return None
        r = _EgReader(_strip_emulation(nal[1:]))
        profile = r.u(8)
        r.u(8)  # constraint flags + reserved
        r.u(8)  # level_idc
        r.ue()  # seq_parameter_set_id
        chroma = 1
        if profile in _HIGH_PROFILES:
            chroma = r.ue()
            if chroma == 3:
                r.u(1)  # separate_colour_plane_flag
            r.ue()  # bit_depth_luma_minus8
            r.ue()  # bit_depth_chroma_minus8
            r.u(1)  # qpprime_y_zero_transform_bypass
            if r.u(1):  # seq_scaling_matrix_present: boundary
                return None
        r.ue()  # log2_max_frame_num_minus4
        poc_type = r.ue()
        if poc_type == 0:
            r.ue()
        elif poc_type == 1:
            r.u(1)
            r.se()
            r.se()
            for _ in range(r.ue()):
                r.se()
        r.ue()  # max_num_ref_frames
        r.u(1)  # gaps_in_frame_num_value_allowed
        pw = r.ue() + 1  # pic_width_in_mbs
        ph = r.ue() + 1  # pic_height_in_map_units
        frame_mbs_only = r.u(1)
        if not frame_mbs_only:
            r.u(1)  # mb_adaptive_frame_field
        r.u(1)  # direct_8x8_inference
        crop_l = crop_r = crop_t = crop_b = 0
        if r.u(1):  # frame_cropping_flag
            crop_l, crop_r, crop_t, crop_b = (
                r.ue(), r.ue(), r.ue(), r.ue(),
            )
        # crop units (7.4.2.1.1): chroma 0 -> 1/1; 4:2:0 -> 2/2;
        # 4:2:2 -> 2/1; 4:4:4 -> 1/1; height unit doubles for fields
        cw = 2 if chroma in (1, 2) else 1
        ch = 2 if chroma == 1 else 1
        ch *= 2 - frame_mbs_only
        width = pw * 16 - cw * (crop_l + crop_r)
        height = (2 - frame_mbs_only) * ph * 16 - ch * (crop_t + crop_b)
        if width <= 0 or height <= 0:
            return None
        return width, height
    except (IndexError, ValueError):
        return None


def _strip_emulation(rbsp: bytes) -> bytes:
    """Remove 0x000003 emulation-prevention bytes (H.264 7.4.1)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b == 3:
            zeros = 0
            continue
        zeros = zeros + 1 if b == 0 else 0
        out.append(b)
    return bytes(out)


def build_sps(width: int, height: int) -> bytes:
    """Baseline-profile SPS NAL with the given EVEN dimensions (4:2:0
    crop units are 2 luma samples).  The round-trip twin of
    parse_sps_dims: used by the planting side and the tests."""
    if width % 2 or height % 2 or width <= 0 or height <= 0:
        raise ValueError("dimensions must be positive and even")
    mb_w = -(-width // 16)
    mb_h = -(-height // 16)
    w = _EgWriter()
    w.u(66, 8)  # profile_idc baseline
    w.u(0, 8)  # constraint flags
    w.u(30, 8)  # level 3.0
    w.ue(0)  # sps id
    w.ue(4)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type 2 (no extra fields)
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps flag
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u(1, 1)  # frame_mbs_only
    w.u(0, 1)  # direct_8x8
    crop_r = (mb_w * 16 - width) // 2
    crop_b = (mb_h * 16 - height) // 2
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui_parameters_present
    return b"\x67" + w.bytes()


def build_avcc(sps: bytes, level: int = 30) -> bytes:
    """avcC (AVCDecoderConfigurationRecord, ISO 14496-15 5.2.4.1) body
    wrapping one SPS and one minimal PPS."""
    pps = b"\x68\xce\x38\x80"  # minimal PPS NAL
    return (
        bytes((1, sps[1] if len(sps) > 1 else 66, 0, level))
        + b"\xff"  # 6 bits reserved + lengthSizeMinusOne 3
        + b"\xe1"  # 3 bits reserved + 1 SPS
        + len(sps).to_bytes(2, "big")
        + sps
        + b"\x01"
        + len(pps).to_bytes(2, "big")
        + pps
    )


# ------------------------------------------------------------ mp4 walk


def _full_box_times(payload, b: int, n_times: int):
    """(version, values...) of an mvhd/mdhd/tkhd-style full box where
    version 1 widens the leading time fields to 64 bits."""
    version = payload[b]
    pos = b + 4
    width = 8 if version == 1 else 4
    vals = []
    for _ in range(n_times):
        vals.append(int.from_bytes(bytes(payload[pos : pos + width]), "big"))
        pos += width
    return version, vals, pos


def mp4_video_meta(payload):
    """Stream metadata of the first video trak by STRICT box walk:
    dict(fmt, width, height, disp_width, disp_height, n_frames,
    duration_ms) or None.  width/height are the CODED dims -- from the
    avcC SPS for avc1 (authoritative; missing/unparseable avcC ->
    None, the counted boundary), from the sample entry otherwise;
    disp_* are the tkhd 16.16 presentation dims; duration from mdhd
    (media timescale).  Handles version-1 (64-bit) header boxes."""
    try:
        n = len(payload)
        top = _mp4_children(payload, 0, n)
        if not top or top[0][0] != b"ftyp":
            return None
        moov = _mp4_find(top, b"moov")
        if moov is None:
            return None
        for t, b, e in _mp4_children(payload, *moov) or []:
            if t != b"trak":
                continue
            trak_kids = _mp4_children(payload, b, e)
            mdia = _mp4_find(trak_kids, b"mdia")
            if mdia is None:
                continue
            mdia_kids = _mp4_children(payload, *mdia)
            hdlr = _mp4_find(mdia_kids, b"hdlr")
            if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
                continue
            tkhd = _mp4_find(trak_kids, b"tkhd")
            mdhd = _mp4_find(mdia_kids, b"mdhd")
            minf = _mp4_find(mdia_kids, b"minf")
            if tkhd is None or mdhd is None or minf is None:
                return None
            # size floors: a truncated tkhd must not read its own
            # header bytes (or a neighbor's) as the dims; v0 tkhd
            # body is 84 bytes, v0 mdhd body 24
            if tkhd[1] - tkhd[0] < 84 or mdhd[1] - mdhd[0] < 24:
                return None
            stbl = _mp4_find(_mp4_children(payload, *minf), b"stbl")
            if stbl is None:
                return None
            stbl_kids = _mp4_children(payload, *stbl)
            stsd = _mp4_find(stbl_kids, b"stsd")
            stsz = _mp4_find(stbl_kids, b"stsz")
            if stsd is None or stsz is None:
                return None
            # tkhd: version, creation, modification, track_id(32),
            # reserved(32), duration(ver width); dims are the LAST 8
            # bytes of the box
            disp_w = int.from_bytes(
                bytes(payload[tkhd[1] - 8 : tkhd[1] - 4]), "big"
            ) >> 16
            disp_h = int.from_bytes(
                bytes(payload[tkhd[1] - 4 : tkhd[1]]), "big"
            ) >> 16
            # mdhd: creation/modification (ver width), timescale (32),
            # duration (ver width)
            ver, _times, pos = _full_box_times(payload, mdhd[0], 2)
            timescale = int.from_bytes(bytes(payload[pos : pos + 4]), "big")
            dwidth = 8 if ver == 1 else 4
            duration = int.from_bytes(
                bytes(payload[pos + 4 : pos + 4 + dwidth]), "big"
            )
            if timescale <= 0:
                return None
            # stsd first entry
            entry_count = int.from_bytes(
                bytes(payload[stsd[0] + 4 : stsd[0] + 8]), "big"
            )
            if entry_count < 1:
                return None
            ents = _mp4_children(payload, stsd[0] + 8, stsd[1])
            if not ents:
                return None
            fmt_b, eb, ee = ents[0]
            fmt = fmt_b.decode("latin-1")
            width = int.from_bytes(bytes(payload[eb + 24 : eb + 26]), "big")
            height = int.from_bytes(bytes(payload[eb + 26 : eb + 28]), "big")
            if fmt == "avc1":
                # the visual sample entry is 78 bytes; extension boxes
                # (avcC among them) follow
                exts = _mp4_children(payload, eb + 78, ee)
                avcc = _mp4_find(exts, b"avcC")
                if avcc is None:
                    return None
                dims = _avcc_sps_dims(bytes(payload[avcc[0] : avcc[1]]))
                if dims is None:
                    return None
                width, height = dims
            n_frames = int.from_bytes(
                bytes(payload[stsz[0] + 8 : stsz[0] + 12]), "big"
            )
            return {
                "fmt": fmt,
                "width": width,
                "height": height,
                "disp_width": disp_w,
                "disp_height": disp_h,
                "n_frames": n_frames,
                "duration_ms": duration * 1000 // timescale,
            }
        return None
    except (IndexError, ValueError, TypeError):
        return None


def _avcc_sps_dims(avcc: bytes):
    """Coded dims from an avcC record's first SPS."""
    if len(avcc) < 8 or avcc[0] != 1:
        return None
    n_sps = avcc[5] & 0x1F
    if n_sps < 1:
        return None
    ln = int.from_bytes(avcc[6:8], "big")
    sps = avcc[8 : 8 + ln]
    if len(sps) != ln:
        return None
    return parse_sps_dims(sps)


def avi_video_meta(payload):
    """Stream metadata of an AVI by strict RIFF walk: dict(fmt, width,
    height, n_frames, duration_ms) or None.  Dims from the strf
    BITMAPINFOHEADER (authoritative; negative biHeight = top-down is
    reported as its magnitude), frame count from avih dwTotalFrames,
    duration from the 'vids' strh dwLength * dwScale / dwRate."""
    try:
        n = len(payload)
        if n < 12 or bytes(payload[:4]) != b"RIFF" or bytes(
            payload[8:12]
        ) != b"AVI ":
            return None
        h_off, _ = _avi_vids_offsets(payload)  # strh 'vids' located
        end = min(8 + int.from_bytes(bytes(payload[4:8]), "little"), n)
        avih_b = avih_e = None
        strf_b = strf_e = None
        for cid, b, e in _riff_children(payload, 12, end) or []:
            if cid != b"LIST" or bytes(payload[b : b + 4]) != b"hdrl":
                continue
            for cid2, b2, e2 in _riff_children(payload, b + 4, e) or []:
                if cid2 == b"avih":
                    avih_b, avih_e = b2, e2
                elif cid2 == b"LIST" and bytes(
                    payload[b2 : b2 + 4]
                ) == b"strl":
                    kids = _riff_children(payload, b2 + 4, e2) or []
                    strh = next(
                        (
                            (bb, ee)
                            for cc, bb, ee in kids
                            if cc == b"strh"
                            and bytes(payload[bb : bb + 4]) == b"vids"
                        ),
                        None,
                    )
                    if strh is not None and strf_b is None:
                        strf_b, strf_e = next(
                            (
                                (bb, ee)
                                for cc, bb, ee in kids
                                if cc == b"strf"
                            ),
                            (None, None),
                        )
        if avih_b is None or strf_b is None:
            return None
        # chunk size floors: avih needs dwTotalFrames at +16 (body 56
        # in practice, 20 is the read floor), strf the BITMAPINFOHEADER
        # dims at +4/+8; the strh floor is checked by _avi_vids_offsets
        if avih_e - avih_b < 20 or strf_e - strf_b < 12:
            return None

        def u32(off):
            return int.from_bytes(bytes(payload[off : off + 4]), "little")

        total_frames = u32(avih_b + 16)
        # h_off is the HANDLER fourcc offset (strh body + 4), so the
        # AVISTREAMHEADER fields sit at handler-relative offsets:
        # dwScale +16, dwRate +20, dwLength +28
        fcc = bytes(payload[h_off : h_off + 4])
        fmt = (
            "DIB "
            if fcc == b"\x00\x00\x00\x00"
            else fcc.decode("latin-1")
        )
        scale = u32(h_off + 16)
        rate = u32(h_off + 20)
        length = u32(h_off + 28)
        if rate == 0:
            return None
        bi_w = int.from_bytes(
            bytes(payload[strf_b + 4 : strf_b + 8]), "little", signed=True
        )
        bi_h = int.from_bytes(
            bytes(payload[strf_b + 8 : strf_b + 12]), "little", signed=True
        )
        return {
            "fmt": fmt,
            "width": abs(bi_w),
            "height": abs(bi_h),
            "n_frames": total_frames,
            "duration_ms": length * scale * 1000 // rate,
        }
    except (IndexError, ValueError, TypeError):
        return None


# --------------------------------------------------- planting + report


def _plant_mp4_video(
    fmt: str,
    entry_w: int,
    entry_h: int,
    n_frames: int,
    *,
    sps_dims=None,
    timescale: int = 25,
) -> bytes:
    """Header-true mp4 with an undecodable video codec: real box
    structure (the strict walks parse it), 1-byte dummy samples, the
    stsd entry carrying ``fmt`` and entry dims; for avc1 an avcC whose
    SPS codes ``sps_dims`` (deliberately different from the entry dims
    in the planted corpus -- the walk must prefer the SPS)."""
    ftyp = _mp4_box(
        b"ftyp", b"isom" + (512).to_bytes(4, "big") + b"isom" + b"mp41"
    )
    mdat = _mp4_box(b"mdat", b"\x00" * n_frames)
    entry = (
        fmt.encode("latin-1")
        + b"\x00" * 6
        + (1).to_bytes(2, "big")
        + b"\x00" * 16
        + entry_w.to_bytes(2, "big")
        + entry_h.to_bytes(2, "big")
        + (0x00480000).to_bytes(4, "big") * 2
        + b"\x00" * 4
        + (1).to_bytes(2, "big")
        + b"\x00" * 32
        + (24).to_bytes(2, "big")
        + (0xFFFF).to_bytes(2, "big")
    )
    if fmt == "avc1":
        sw, sh = sps_dims
        entry += _mp4_box(b"avcC", build_avcc(build_sps(sw, sh)))
    stsd = _mp4_full_box(
        b"stsd",
        0,
        0,
        (1).to_bytes(4, "big")
        + (4 + len(entry)).to_bytes(4, "big")
        + entry,
    )
    stts = _mp4_full_box(
        b"stts",
        0,
        0,
        (1).to_bytes(4, "big")
        + n_frames.to_bytes(4, "big")
        + (1).to_bytes(4, "big"),
    )
    stsc = _mp4_full_box(
        b"stsc",
        0,
        0,
        (1).to_bytes(4, "big")
        + (1).to_bytes(4, "big")
        + n_frames.to_bytes(4, "big")
        + (1).to_bytes(4, "big"),
    )
    stsz = _mp4_full_box(
        b"stsz",
        0,
        0,
        (0).to_bytes(4, "big")
        + n_frames.to_bytes(4, "big")
        + b"".join((1).to_bytes(4, "big") for _ in range(n_frames)),
    )
    stco = _mp4_full_box(
        b"stco",
        0,
        0,
        (1).to_bytes(4, "big") + (len(ftyp) + 8).to_bytes(4, "big"),
    )
    stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
    url_ = _mp4_full_box(b"url ", 0, 1, b"")
    dref = _mp4_full_box(b"dref", 0, 0, (1).to_bytes(4, "big") + url_)
    dinf = _mp4_box(b"dinf", dref)
    vmhd = _mp4_full_box(b"vmhd", 0, 1, b"\x00" * 8)
    minf = _mp4_box(b"minf", vmhd + dinf + stbl)
    hdlr = _mp4_full_box(
        b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00"
    )
    # version-1 mdhd: the walk must handle 64-bit times in the wild
    mdhd = _mp4_full_box(
        b"mdhd",
        1,
        0,
        (0).to_bytes(16, "big")
        + timescale.to_bytes(4, "big")
        + n_frames.to_bytes(8, "big")
        + (0x55C4).to_bytes(2, "big")
        + (0).to_bytes(2, "big"),
    )
    mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
    tkhd = _mp4_full_box(
        b"tkhd",
        0,
        7,
        (0).to_bytes(8, "big")
        + (1).to_bytes(4, "big")
        + (0).to_bytes(4, "big")
        + n_frames.to_bytes(4, "big")
        + (0).to_bytes(8, "big")
        + (0).to_bytes(4, "big") * 2
        + (0x00010000).to_bytes(4, "big")
        + (0).to_bytes(4, "big") * 3
        + (0x00010000).to_bytes(4, "big")
        + (0).to_bytes(4, "big") * 3
        + (0x40000000).to_bytes(4, "big")
        + (entry_w << 16).to_bytes(4, "big")
        + (entry_h << 16).to_bytes(4, "big"),
    )
    trak = _mp4_box(b"trak", tkhd + mdia)
    mvhd = _mp4_full_box(
        b"mvhd",
        0,
        0,
        (0).to_bytes(8, "big")
        + timescale.to_bytes(4, "big")
        + n_frames.to_bytes(4, "big")
        + (0x00010000).to_bytes(4, "big")
        + (0x0100).to_bytes(2, "big")
        + (0).to_bytes(10, "big")
        + (0x00010000).to_bytes(4, "big")
        + (0).to_bytes(4, "big") * 3
        + (0x00010000).to_bytes(4, "big")
        + (0).to_bytes(4, "big") * 3
        + (0x40000000).to_bytes(4, "big")
        + (0).to_bytes(4, "big") * 6
        + (2).to_bytes(4, "big"),
    )
    moov = _mp4_box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def video_meta_report(documents):
    """(doc_id, container, fmt, width, height, n_frames, duration_ms):
    stream metadata over a planted video corpus -- doc_id % 6 picks
    the class: 0 mp4/jpeg (real encode), 1 mp4/avc1 (SPS-coded dims !=
    entry dims: md5-derived w = 320+2*(b0%64), h = 240+2*(b1%64),
    frames = 1+(b2%8), entry dims deliberately w+2/h+2), 2 mp4/hev1
    and 3 mp4/vp09 (entry dims, same md5 rule), 4 AVI/MJPG (real
    encode), 5 AVI/XVID (fourcc planted over a real writer's stream
    headers).  The engine WALKS the bytes (mp4_video_meta /
    avi_video_meta); the oracle recomputes every column from the
    planting rule, so a hash match proves tkhd/mdhd/stsd/stsz/avcC-SPS
    and avih/strh/strf are all read correctly."""
    import pandas as pd
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from .text_analysis import _fan_out

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("container", StringType()),
            StructField("fmt", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("n_frames", LongType()),
            StructField("duration_ms", LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            out = {f.name: [] for f in schema.fields}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                mode = doc_id % 6
                dig = hashlib.md5(str(text or "").encode()).digest()
                w = 320 + 2 * (dig[0] % 64)
                h = 240 + 2 * (dig[1] % 64)
                frames = 1 + dig[2] % 8
                if mode == 0:
                    payload = encode_mp4(
                        _md5_quad_frames(text), codec="jpeg"
                    )
                elif mode == 1:
                    payload = _plant_mp4_video(
                        "avc1", w + 2, h + 2, frames, sps_dims=(w, h)
                    )
                elif mode in (2, 3):
                    payload = _plant_mp4_video(
                        "hev1" if mode == 2 else "vp09", w, h, frames
                    )
                elif mode == 4:
                    payload = encode_avi(
                        _md5_quad_frames(text), codec="MJPG"
                    )
                else:
                    payload = bytearray(
                        encode_avi(_md5_quad_frames(text), codec="MJPG")
                    )
                    h_off, c_off = _avi_vids_offsets(payload)
                    payload[h_off : h_off + 4] = b"XVID"
                    payload[c_off : c_off + 4] = b"XVID"
                    payload = bytes(payload)
                if mode <= 3:
                    meta = mp4_video_meta(payload)
                    container = "mp4"
                else:
                    meta = avi_video_meta(payload)
                    container = "avi"
                out["doc_id"].append(doc_id)
                out["container"].append(container)
                out["fmt"].append(meta["fmt"])
                out["width"].append(meta["width"])
                out["height"].append(meta["height"])
                out["n_frames"].append(meta["n_frames"])
                out["duration_ms"].append(meta["duration_ms"])
            yield pd.DataFrame(out)

    base = documents.select("doc_id", "text")
    return _fan_out(base).mapInPandas(
        run, schema=schema
    )


#: md5 byte k of a doc's text, as DuckDB SQL (0-indexed byte)
def _md5_byte(k: int) -> str:
    return (
        "CAST(concat('0x', substr(md5(coalesce(text, '')), "
        f"{2 * k + 1}, 2)) AS BIGINT)"
    )


ORACLE_SQL = {
    "video_meta_report": f"""
        SELECT doc_id,
               CASE WHEN doc_id % 6 <= 3 THEN 'mp4' ELSE 'avi' END
                   AS container,
               CASE doc_id % 6
                    WHEN 0 THEN 'jpeg' WHEN 1 THEN 'avc1'
                    WHEN 2 THEN 'hev1' WHEN 3 THEN 'vp09'
                    WHEN 4 THEN 'MJPG' ELSE 'XVID' END AS fmt,
               CAST(CASE WHEN doc_id % 6 IN (0, 4, 5) THEN {IMG_SIDE}
                    ELSE 320 + 2 * ({_md5_byte(0)} % 64) END AS INT)
                   AS width,
               CAST(CASE WHEN doc_id % 6 IN (0, 4, 5) THEN {IMG_SIDE}
                    ELSE 240 + 2 * ({_md5_byte(1)} % 64) END AS INT)
                   AS height,
               CAST(CASE WHEN doc_id % 6 IN (0, 4, 5)
                    THEN {VIDEO_N_FRAMES}
                    ELSE 1 + {_md5_byte(2)} % 8 END AS BIGINT) AS n_frames,
               CAST(CASE WHEN doc_id % 6 IN (0, 4, 5)
                    THEN {VIDEO_N_FRAMES} * 40
                    ELSE (1 + {_md5_byte(2)} % 8) * 40 END AS BIGINT)
                   AS duration_ms
        FROM documents
    """,
}
