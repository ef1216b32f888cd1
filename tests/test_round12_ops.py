"""Round-12 tests: ADVICE r11 fixes (FLAC decode totality, WAV
bits-per-sample boundary gate, FLAC variable-blocksize rejection),
then the round's new operators (MPEG-1 audio, video metadata,
epoch-dir retention, lossless JPEG)."""

from __future__ import annotations

import pytest


def _flac_streaminfo(total: int, rate: int = 8000) -> bytes:
    import map_reduce_framework_spark.operators.flac as FL

    w = FL._BitWriter()
    w.write(16, 16)
    w.write(max(total, 16), 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(rate, 20)
    w.write(0, 3)  # mono
    w.write(15, 5)  # 16 bps
    w.write(total, 36)
    # zero MD5 => decoder skips sample verification (the adversarial
    # stream lies about everything else; MD5 can't be precomputed for
    # samples the attacker wants to overflow)
    return w.bytes() + b"\x00" * 16


def _crafted_lpc_stream(warmup: int, coef: int, shift: int, bs: int) -> bytes:
    """Valid-CRC mono FLAC with one LPC subframe: order 1, given
    coefficient and shift, all-zero residuals. Decoded samples follow
    s[i] = (coef * s[i-1]) >> shift from the warmup value."""
    import map_reduce_framework_spark.operators.flac as FL

    info = _flac_streaminfo(bs)
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + info
    hdr = bytearray(b"\xff\xf8")
    sr_code, sr_bytes = FL._rate_code(8000)
    hdr.append((0x07 << 4) | sr_code)  # 16-bit blocksize code
    hdr.append((0x00 << 4) | (0x04 << 1))  # mono, 16 bps
    hdr += FL._utf8_number(0)
    hdr += (bs - 1).to_bytes(2, "big")
    hdr += sr_bytes
    hdr.append(FL._crc8(hdr))
    body = FL._BitWriter()
    body.write(0, 1)
    body.write(0b100000 | 0, 6)  # LPC, order 1
    body.write(0, 1)  # no wasted bits
    body.write(warmup & 0xFFFF, 16)  # warmup sample
    body.write(8 - 1, 4)  # precision 8
    body.write(shift, 5)
    body.write(coef & 0xFF, 8)
    body.write(0, 2)  # residual method 0
    body.write(0, 4)  # partition order 0
    body.write(0, 4)  # rice parameter 0
    for _ in range(bs - 1):
        body.write_unary(0)  # residual 0
    body.align()
    frame = bytes(hdr) + body.bytes()
    frame += FL._crc16(frame).to_bytes(2, "big")
    out += frame
    return bytes(out)


class TestFlacDecodeTotality:
    """ADVICE r11 #1: decode_flac must be TOTAL over arbitrary bytes.
    A valid-CRC stream whose LPC recursion overflows int64 crashed the
    int16 conversion with OverflowError; one that overflows int16 but
    not int64 silently wrapped (numpy<2) / raises (numpy>=2)."""

    def test_int64_overflow_stream_returns_none(self):
        from map_reduce_framework_spark.operators.flac import decode_flac

        # s[i] = 127 * s[i-1] from 100: exceeds 2^63 after ~9 samples,
        # exceeds ANY fixed width by sample 64. Must reject, not raise.
        payload = _crafted_lpc_stream(warmup=100, coef=127, shift=0, bs=64)
        assert decode_flac(payload) is None

    def test_int16_overflow_stream_returns_none_not_wrapped(self):
        from map_reduce_framework_spark.operators.flac import decode_flac

        # s[i] = 2 * s[i-1] from 30000: past 32767 by sample 2, still
        # far inside int64 at bs=16 -- the silent-wrap regime.
        payload = _crafted_lpc_stream(warmup=30000, coef=2, shift=0, bs=16)
        assert decode_flac(payload) is None

    def test_in_range_crafted_stream_still_decodes(self):
        # the gate must not reject legitimate streams: coef 0 holds
        # every post-warmup sample at 0, all in range
        from map_reduce_framework_spark.operators.flac import decode_flac

        payload = _crafted_lpc_stream(warmup=1234, coef=0, shift=0, bs=16)
        got = decode_flac(payload)
        assert got is not None
        samples, rate, channels = got
        assert channels == 1 and rate == 8000
        assert samples[0] == 1234 and all(s == 0 for s in samples[1:])

    def test_roundtrip_unaffected(self):
        import numpy as np

        from map_reduce_framework_spark.operators.flac import (
            decode_flac,
            encode_flac,
        )

        rng = np.random.default_rng(12)
        samples = rng.integers(-32768, 32768, size=5000, dtype=np.int16)
        got = decode_flac(encode_flac(samples))
        assert got is not None
        assert np.array_equal(got[0], samples)


class TestFlacVariableBlocksizeRejected:
    """ADVICE r11 #3: the sync walk accepted the variable-blocksize
    strategy bit (0xF9) although the decoder implements fixed-blocksize
    semantics only (the coded number would be a sample number)."""

    FRAME_OFF = 4 + 4 + 34  # fLaC + metadata header + STREAMINFO

    def _valid_stream(self):
        from map_reduce_framework_spark.operators.flac import encode_flac

        return encode_flac([100, -200, 300, -400] * 64)

    def test_variable_strategy_bit_raises(self):
        import map_reduce_framework_spark.operators.flac as FL

        payload = bytearray(self._valid_stream())
        assert payload[self.FRAME_OFF + 1] == 0xF8
        payload[self.FRAME_OFF + 1] = 0xF9  # variable-blocksize strategy
        with pytest.raises(ValueError, match="sync"):
            FL._walk_frame_header(payload, self.FRAME_OFF, 8000)

    def test_reserved_bit_raises(self):
        import map_reduce_framework_spark.operators.flac as FL

        payload = bytearray(self._valid_stream())
        payload[self.FRAME_OFF + 1] = 0xFA  # reserved bit set
        with pytest.raises(ValueError, match="sync"):
            FL._walk_frame_header(payload, self.FRAME_OFF, 8000)

    def test_decode_and_classifier_reject_not_misread(self):
        from map_reduce_framework_spark.operators.flac import (
            decode_flac,
            flac_subframe_class,
        )

        payload = bytearray(self._valid_stream())
        payload[self.FRAME_OFF + 1] = 0xF9
        assert decode_flac(bytes(payload)) is None
        assert flac_subframe_class(bytes(payload)) is None


class TestWavBitsBoundaryGate:
    """ADVICE r11 #2: media_codec_class called any tag-1 WAV 'pcm'/
    supported and any tag-3 'float'/supported, but decode_wav only
    decodes (tag 1, 16-bit) and (tag 3, 32-bit). Depth must gate."""

    def _patched(self, payload: bytes, bits: int) -> bytes:
        from map_reduce_framework_spark.operators.multimodal import (
            _wav_fmt_tag_offset,
        )

        buf = bytearray(payload)
        off = _wav_fmt_tag_offset(buf)
        buf[off + 14 : off + 16] = bits.to_bytes(2, "little")
        return bytes(buf)

    def test_pcm16_and_float32_supported(self):
        from map_reduce_framework_spark.operators.audio import (
            encode_wav,
            encode_wav_float,
        )
        from map_reduce_framework_spark.operators.multimodal import (
            media_codec_class,
        )

        pcm = encode_wav([1, 2, 3, -4])
        assert media_codec_class(pcm) == ("wav", "pcm", True)
        flt = encode_wav_float([0.1, -0.2, 0.3])
        assert media_codec_class(flt) == ("wav", "float", True)

    def test_pcm24_unsupported(self):
        from map_reduce_framework_spark.operators.audio import (
            decode_wav,
            encode_wav,
        )
        from map_reduce_framework_spark.operators.multimodal import (
            media_codec_class,
        )

        p24 = self._patched(encode_wav([1, 2, 3, -4]), 24)
        # the classifier's 'supported' claim must match the decoder
        assert decode_wav(p24) is None
        assert media_codec_class(p24) == ("wav", "pcm24", False)

    def test_float64_unsupported(self):
        from map_reduce_framework_spark.operators.audio import (
            decode_wav,
            encode_wav_float,
        )
        from map_reduce_framework_spark.operators.multimodal import (
            media_codec_class,
        )

        f64 = self._patched(encode_wav_float([0.5, -0.5]), 64)
        assert decode_wav(f64) is None
        assert media_codec_class(f64) == ("wav", "float64", False)

    def test_mpeg_tag_still_classified(self):
        from map_reduce_framework_spark.operators.audio import encode_wav
        from map_reduce_framework_spark.operators.multimodal import (
            _wav_fmt_tag_offset,
            media_codec_class,
        )

        buf = bytearray(encode_wav([1, 2, 3, -4]))
        off = _wav_fmt_tag_offset(buf)
        buf[off : off + 2] = (0x55).to_bytes(2, "little")
        got = media_codec_class(bytes(buf))
        assert got is not None and got[0] == "wav" and got[1] == "mpeg"


# ---------------------------------------------------------------------------
# VERDICT r11 ask #1: MPEG-1 audio -- Layer I/II codec, raw-bitstream
# header walk, registered queries, cross-codec duplicate
# ---------------------------------------------------------------------------


class TestMpegCodec:
    def _clip(self, n=1024, seed=42):
        import numpy as np

        return list(
            np.random.default_rng(seed).integers(-32768, 32768, n)
        )

    def test_mp1_roundtrip_within_pinned_bounds(self):
        import numpy as np

        import map_reduce_framework_spark.operators.mpeg_audio as MA

        for seed in (0, 1, 2):
            clip = np.asarray(self._clip(seed=seed), dtype=np.int64)
            pay = MA.encode_mp1(list(clip) + [0] * MA.DELAY)
            samples, rate, nch = MA.decode_mpeg(pay)
            assert (rate, nch) == (32000, 1)
            err = samples[MA.DELAY : MA.DELAY + len(clip)].astype(
                np.int64
            ) - clip
            assert np.abs(err).max() <= MA.MP1_MAX_ERR
            assert float(np.std(err)) <= MA.MP1_RMS_ERR

    def test_mp2_roundtrip_within_pinned_bounds(self):
        import numpy as np

        import map_reduce_framework_spark.operators.mpeg_audio as MA

        for seed in (0, 1, 2):
            bl = np.asarray(
                MA.bandlimit_for_l2(self._clip(seed=seed)), dtype=np.int64
            )
            pay = MA.encode_mp2(list(bl) + [0] * MA.DELAY)
            samples, _, _ = MA.decode_mpeg(pay)
            err = samples[MA.DELAY : MA.DELAY + len(bl)].astype(
                np.int64
            ) - bl
            assert np.abs(err).max() <= MA.MP2_MAX_ERR
            assert float(np.std(err)) <= MA.MP2_RMS_ERR

    def test_mp2_stereo_roundtrip(self):
        import numpy as np

        import map_reduce_framework_spark.operators.mpeg_audio as MA

        left = np.asarray(MA.bandlimit_for_l2(self._clip()), dtype=np.int64)
        right = np.asarray(
            MA.bandlimit_for_l2(self._clip()[::-1]), dtype=np.int64
        )
        pay = MA.encode_mp2(
            list(left) + [0] * MA.DELAY, right=list(right) + [0] * MA.DELAY
        )
        samples, rate, nch = MA.decode_mpeg(pay)
        assert nch == 2
        err = samples[MA.DELAY : MA.DELAY + len(left)].astype(
            np.int64
        ) - left
        assert np.abs(err).max() <= MA.MP2_STEREO_MAX_ERR
        assert float(np.std(err)) <= MA.MP2_STEREO_RMS_ERR

    def test_filterbank_reconstruction_floor(self):
        """The frozen window pair must keep the -80 dB design floor
        (regression gate on mpeg_window.py; held-out noise, unquantized
        analysis->synthesis chain)."""
        import numpy as np

        import map_reduce_framework_spark.operators.mpeg_audio as MA

        rng = np.random.default_rng(1234)
        x = rng.uniform(-1, 1, 4096)
        S = MA._analyze(x)
        syn = MA._Synth()
        y = np.concatenate([syn.granule(S[t]) for t in range(S.shape[0])])
        err = y[MA.DELAY : MA.DELAY + 3000] - x[:3000]
        db = 20 * np.log10(np.std(err) / np.std(x[:3000]))
        assert db < -80

    def test_stream_info_version_layer_matrix(self):
        import map_reduce_framework_spark.operators.mpeg_audio as MA

        cases = [
            ((3, 3, 32, 32000, 3), ("1", 3, 32000, 32, 3, 1152)),
            ((2, 2, 8, 16000, 3), ("2", 2, 16000, 8, 3, 1152)),
            ((0, 3, 8, 8000, 3), ("2.5", 3, 8000, 8, 3, 576)),
            ((2, 1, 256, 24000, 2), ("2", 1, 24000, 256, 2, 384)),
        ]
        for args, (ver, layer, rate, br, frames, spf) in cases:
            info = MA.mpeg_stream_info(MA._plant_stream(*args))
            assert info["version"] == ver
            assert info["layer"] == layer
            assert info["sample_rate"] == rate
            assert info["bitrate_kbps"] == br
            assert info["n_frames"] == frames
            assert info["n_samples"] == frames * spf
            assert (
                info["duration_ms"] == frames * spf * 1000 // rate
            )

    def test_layer3_and_lsf_walked_not_decoded(self):
        import map_reduce_framework_spark.operators.mpeg_audio as MA

        l3 = MA._plant_stream(3, 3, 32, 32000, 2)
        assert MA.mpeg_stream_info(l3) is not None
        assert MA.decode_mpeg(l3) is None
        lsf = MA._plant_stream(2, 2, 8, 16000, 2)
        assert MA.mpeg_stream_info(lsf) is not None
        assert MA.decode_mpeg(lsf) is None

    def test_id3v2_skip_and_id3v1_trailer(self):
        import numpy as np

        import map_reduce_framework_spark.operators.mpeg_audio as MA

        clip = self._clip(256)
        pay = MA.encode_mp1(clip)
        tag2 = b"ID3\x04\x00\x00" + bytes((0, 0, 0, 30)) + b"\x00" * 30
        tag1 = b"TAG" + b"\x00" * 125
        wrapped = tag2 + pay + tag1
        info = MA.mpeg_stream_info(wrapped)
        assert info is not None and info["layer"] == 1
        a = MA.decode_mpeg(pay)
        b = MA.decode_mpeg(wrapped)
        assert b is not None
        assert np.array_equal(a[0], b[0])

    def test_truncated_and_garbage_return_none(self):
        import map_reduce_framework_spark.operators.mpeg_audio as MA

        pay = MA.encode_mp1(self._clip(256))
        assert MA.mpeg_stream_info(pay[: len(pay) - 7]) is None
        assert MA.decode_mpeg(pay[: len(pay) - 7]) is None
        assert MA.mpeg_stream_info(b"") is None
        assert MA.mpeg_stream_info(b"\xff\xfb") is None
        assert MA.decode_mpeg(bytes(range(256)) * 8) is None

    def test_crc_protected_frame_verifies_and_rejects(self):
        """Craft a protected Layer I frame: flip the protection bit,
        splice in the spec CRC-16 over header bits 16-31 + allocation
        -- must decode identically; corrupt the CRC -- must refuse."""
        import numpy as np

        import map_reduce_framework_spark.operators.mpeg_audio as MA

        clip = self._clip(256)
        pay = bytearray(MA.encode_mp1(clip))
        ref = MA.decode_mpeg(bytes(pay))
        # one frame at a time: rewrite each frame protected
        out = bytearray()
        pos = 0
        while pos < len(pay):
            h = MA._parse_header(
                pay[pos], pay[pos + 1], pay[pos + 2], pay[pos + 3]
            )
            frame = bytearray(pay[pos : pos + h["frame_len"]])
            frame[1] &= 0xFE  # protection bit 0: CRC present
            side_bits = 32 * 4  # Layer I mono allocation bits
            region = bytes(frame[2:4]) + bytes(
                frame[4 : 4 + (side_bits + 7) // 8]
            )
            crc = MA._crc16(region, 16 + side_bits)
            # frame grows by 2 CRC bytes; trailing pad shrinks by 2
            # (the encoder leaves >= 2 zero ancillary bytes -- assert)
            assert frame[-2:] == b"\x00\x00"
            new = (
                bytes(frame[:4])
                + crc.to_bytes(2, "big")
                + bytes(frame[4:-2])
            )
            assert len(new) == h["frame_len"]
            out += new
            pos += h["frame_len"]
        got = MA.decode_mpeg(bytes(out))
        assert got is not None
        assert np.array_equal(got[0], ref[0])
        bad = bytearray(out)
        bad[4] ^= 0xFF  # corrupt the first frame's CRC
        assert MA.decode_mpeg(bytes(bad)) is None

    def test_decode_total_over_mutations(self):
        import map_reduce_framework_spark.operators.mpeg_audio as MA

        pay = bytearray(MA.encode_mp2(self._clip(256)))
        import numpy as np

        rng = np.random.default_rng(9)
        for _ in range(60):
            mut = bytearray(pay)
            for _k in range(rng.integers(1, 6)):
                mut[rng.integers(0, len(mut))] = rng.integers(0, 256)
            MA.decode_mpeg(bytes(mut))  # must not raise, any return ok

    def test_free_format_and_reserved_codes_rejected(self):
        import map_reduce_framework_spark.operators.mpeg_audio as MA

        good = bytearray(MA.encode_mp1(self._clip(64)))
        free = bytearray(good)
        free[2] &= 0x0F  # bitrate index 0: free format
        assert MA.mpeg_stream_info(bytes(free)) is None
        bad_rate = bytearray(good)
        bad_rate[2] |= 0x0C  # rate index 3: reserved
        assert MA.mpeg_stream_info(bytes(bad_rate)) is None
        bad_layer = bytearray(good)
        bad_layer[1] &= 0xF9  # layer bits 00: reserved
        assert MA.mpeg_stream_info(bytes(bad_layer)) is None


class TestMpegCrossCodecDup:
    def test_wav_flac_mpeg_duplicate_caught_by_robust_pairs(self, spark):
        """The r12 'done' gate: a WAV, a FLAC and an MPEG encoding of
        the SAME clip land in one fingerprint space via decode_audio;
        the robust (energy-ratio) pair join catches all three pairs --
        the exact-fp join still catches only the lossless pair, which
        is precisely why the robust variant exists.  The MPEG copy is
        planted with a 15-zero lead-in so the decoder's 481-sample
        delay lands the clip on a chunk boundary (496 = 31*16): the
        fingerprint geometry is chunk-strided, so cross-codec matching
        requires chunk alignment -- same property as the WAV path's
        own embedded-clip matching, now stated by this test."""
        from pyspark.sql import functions as F

        from map_reduce_framework_spark.operators.audio import (
            AUDIO_FP_MIN,
            _doc_samples,
            audio_fingerprints_from_payloads,
            encode_wav,
        )
        from map_reduce_framework_spark.operators.flac import encode_flac
        from map_reduce_framework_spark.operators.mpeg_audio import (
            DELAY,
            encode_mp1,
        )

        toks = [f"tok{i}" for i in range(12)]
        clip = _doc_samples(toks)
        other = _doc_samples([f"else{i}" for i in range(12)])
        rows = [
            (1, bytearray(encode_wav(clip))),
            (2, bytearray(encode_flac(clip))),
            (3, bytearray(encode_mp1([0] * 15 + clip + [0] * DELAY))),
            (4, bytearray(encode_wav(other))),
            (5, bytearray(b"not audio at all")),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")

        def pairs(robust):
            name = "rfp" if robust else "fp"
            fps = audio_fingerprints_from_payloads(df, robust=robust)
            a, b = fps.alias("a"), fps.alias("b")
            got = (
                a.join(
                    b,
                    (F.col(f"a.{name}") == F.col(f"b.{name}"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")),
                )
                .select(
                    F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    f"a.{name}",
                )
                .distinct()
                .groupBy("doc_a", "doc_b")
                .count()
                .where(F.col("count") >= AUDIO_FP_MIN)
                .collect()
            )
            return {(r["doc_a"], r["doc_b"]) for r in got}

        assert pairs(robust=True) == {(1, 2), (1, 3), (2, 3)}
        assert pairs(robust=False) == {(1, 2)}

    def test_chunk_alignment_is_the_matching_condition(self):
        """State the alignment property the pair test relies on: the
        decoder's 481-sample delay is NOT a chunk multiple, so a bare
        MPEG copy shares zero robust fingerprints with its source
        (window grids disagree by one sample), while a 15-zero lead-in
        (clip at 496 = 31*16) shares every window.  Deterministic
        geometry, not luck -- and the documented limitation of any
        chunk-strided fingerprint."""
        from map_reduce_framework_spark.operators.audio import (
            _doc_samples,
            decode_audio,
            robust_window_fingerprints,
        )
        from map_reduce_framework_spark.operators.mpeg_audio import (
            DELAY,
            encode_mp1,
        )

        clip = _doc_samples([f"tok{i}" for i in range(12)])
        ref = {fp for _, fp in robust_window_fingerprints(clip)}
        aligned, _, _ = decode_audio(
            encode_mp1([0] * 15 + clip + [0] * DELAY)
        )
        got = {
            fp for _, fp in robust_window_fingerprints(list(aligned))
        }
        assert len(ref & got) == len(ref) > 3
        bare, _, _ = decode_audio(encode_mp1(clip + [0] * DELAY))
        off = {fp for _, fp in robust_window_fingerprints(list(bare))}
        assert not (ref & off)


# ---------------------------------------------------------------------------
# VERDICT r11 ask #2: video stream metadata for undecodable codecs
# ---------------------------------------------------------------------------


class TestVideoMeta:
    def test_sps_roundtrip_dimensions(self):
        from map_reduce_framework_spark.operators.video_meta import (
            build_sps,
            parse_sps_dims,
        )

        for w, h in [(320, 240), (1920, 1080), (354, 288), (16, 16),
                     (442, 308), (2, 2)]:
            assert parse_sps_dims(build_sps(w, h)) == (w, h)

    def test_sps_high_profile_and_scaling_boundary(self):
        from map_reduce_framework_spark.operators.video_meta import (
            _EgWriter,
            parse_sps_dims,
        )

        def high_profile_sps(scaling_present):
            w = _EgWriter()
            w.u(100, 8)  # profile high
            w.u(0, 8)
            w.u(40, 8)
            w.ue(0)  # sps id
            w.ue(1)  # chroma_format_idc 4:2:0
            w.ue(0)  # bit_depth_luma_minus8
            w.ue(0)  # bit_depth_chroma_minus8
            w.u(0, 1)  # qpprime
            w.u(1 if scaling_present else 0, 1)
            if scaling_present:
                return b"\x67" + w.bytes()  # truncated: parse must bail
            w.ue(4)  # log2_max_frame_num_minus4
            w.ue(0)  # poc type 0
            w.ue(4)  # log2_max_pic_order_cnt_lsb_minus4
            w.ue(1)
            w.u(0, 1)
            w.ue(120 - 1)  # 1920 / 16
            w.ue(68 - 1)  # 1088 / 16
            w.u(1, 1)  # frame_mbs_only
            w.u(0, 1)
            w.u(1, 1)  # cropping
            w.ue(0)
            w.ue(0)
            w.ue(0)
            w.ue(4)  # crop_bottom 4 * 2 = 8 -> 1080
            w.u(0, 1)
            return b"\x67" + w.bytes()

        assert parse_sps_dims(high_profile_sps(False)) == (1920, 1080)
        assert parse_sps_dims(high_profile_sps(True)) is None

    def test_emulation_prevention_stripped(self):
        from map_reduce_framework_spark.operators.video_meta import (
            _strip_emulation,
        )

        assert _strip_emulation(b"\x00\x00\x03\x01") == b"\x00\x00\x01"
        assert _strip_emulation(b"\x00\x00\x03\x03") == b"\x00\x00\x03"
        assert _strip_emulation(b"\x01\x00\x03\x00") == b"\x01\x00\x03\x00"

    def test_avc1_sps_overrides_entry_dims(self):
        from map_reduce_framework_spark.operators.video_meta import (
            _plant_mp4_video,
            mp4_video_meta,
        )

        p = _plant_mp4_video("avc1", 322, 242, 5, sps_dims=(320, 240))
        m = mp4_video_meta(p)
        assert (m["width"], m["height"]) == (320, 240)  # SPS, not entry
        assert (m["disp_width"], m["disp_height"]) == (322, 242)
        assert m["n_frames"] == 5 and m["duration_ms"] == 200

    def test_avc1_without_avcc_is_the_boundary(self):
        from map_reduce_framework_spark.operators.video_meta import (
            _plant_mp4_video,
            mp4_video_meta,
        )

        p = _plant_mp4_video("hev1", 100, 100, 2).replace(
            b"hev1", b"avc1", 1
        )
        assert mp4_video_meta(p) is None

    def test_version1_mdhd_parsed(self):
        # the planted builder emits a version-1 (64-bit) mdhd on
        # purpose; a hash-exact duration proves the v1 layout is read
        from map_reduce_framework_spark.operators.video_meta import (
            _plant_mp4_video,
            mp4_video_meta,
        )

        m = mp4_video_meta(_plant_mp4_video("vp09", 64, 64, 7))
        assert m["duration_ms"] == 7 * 40

    def test_real_writers_and_avi(self):
        from map_reduce_framework_spark.operators.multimodal import (
            _avi_vids_offsets,
            _md5_quad_frames,
            encode_avi,
            encode_mp4,
        )
        from map_reduce_framework_spark.operators.video_meta import (
            avi_video_meta,
            mp4_video_meta,
        )

        m = mp4_video_meta(encode_mp4(_md5_quad_frames("x"), codec="jpeg"))
        assert m == {
            "fmt": "jpeg", "width": 16, "height": 16,
            "disp_width": 16, "disp_height": 16,
            "n_frames": 4, "duration_ms": 160,
        }
        avi = encode_avi(_md5_quad_frames("x"), codec="MJPG")
        a = avi_video_meta(avi)
        assert a == {
            "fmt": "MJPG", "width": 16, "height": 16,
            "n_frames": 4, "duration_ms": 160,
        }
        buf = bytearray(avi)
        h_off, c_off = _avi_vids_offsets(buf)
        buf[h_off : h_off + 4] = b"XVID"
        buf[c_off : c_off + 4] = b"XVID"
        assert avi_video_meta(bytes(buf))["fmt"] == "XVID"
        assert mp4_video_meta(b"junk") is None
        assert avi_video_meta(b"junk") is None

    def test_stsd_entry_size_is_box_exact(self):
        """Regression for the round-12 writer fix: encode_mp4's stsd
        sample entry declared 4 bytes more than it contained, which a
        strict per-entry box walk rejects.  The entry must now parse
        as an exact child box."""
        from map_reduce_framework_spark.operators.multimodal import (
            _md5_quad_frames,
            _mp4_children,
            _mp4_find,
            _mp4_video_stbl,
            encode_mp4,
        )

        p = encode_mp4(_md5_quad_frames("x"), codec="jpeg")
        stbl = _mp4_video_stbl(p)
        stsd = _mp4_find(_mp4_children(p, *stbl), b"stsd")
        ents = _mp4_children(p, stsd[0] + 8, stsd[1])
        assert ents is not None and len(ents) == 1
        assert ents[0][0] == b"jpeg"

    def test_registered_report_oracle_parity(self, spark, sf_smoke):
        from map_reduce_framework_spark.registry import REGISTRY

        from .oracle_util import compare_to_oracle, duckdb_conn

        q = REGISTRY["video_meta_report"]
        with duckdb_conn(sf_smoke) as con:
            compare_to_oracle(q.fn(spark, sf_smoke), con, q.oracle)


# ---------------------------------------------------------------------------
# VERDICT r11 ask #3: epoch-dir retention -- probe-horizon GC of
# per-epoch index dirs once covered by a compaction generation
# ---------------------------------------------------------------------------

import json
import os


def _run_waves_retain(spark, scratch, waves, fanout, retain):
    import map_reduce_framework_spark.streaming.ops as ops

    from .test_round11_ops import _docs_df

    source = os.path.join(scratch, "source")
    work = os.path.join(scratch, "work")
    old = ops.EPOCH_INDEX_FANOUT
    survivors = []
    try:
        ops.EPOCH_INDEX_FANOUT = fanout
        for rows in waves:
            _docs_df(spark, rows).coalesce(1).write.mode(
                "append"
            ).parquet(source)
            d = ops.stream_ingest_epoch(
                spark, source, work, retain_epochs=retain
            )
            survivors.append(
                frozenset(
                    r["doc_id"]
                    for r in spark.read.parquet(
                        os.path.join(d, "input")
                    ).collect()
                )
                if d
                else frozenset()
            )
    finally:
        ops.EPOCH_INDEX_FANOUT = old
    return survivors


class TestEpochIndexRetention:
    def test_gc_active_preserves_drop_equivalence(self, spark, tmp_path):
        import map_reduce_framework_spark.streaming.ops as ops

        from .test_round11_ops import _planted_waves, _run_waves

        waves = _planted_waves(6)
        kept = _run_waves(
            spark, str(tmp_path / "keep"), waves, fanout=2
        )
        gcd = _run_waves_retain(
            spark, str(tmp_path / "gc"), waves, fanout=2, retain=2
        )
        assert kept == gcd  # identical survivors, epoch by epoch
        for k, s in enumerate(gcd[1:], 1):
            assert (100 + k) not in s and (200 + k) in s
        # GC actually fired: tombstones exist, their index dirs gone
        work = str(tmp_path / "gc" / "work")
        dirs = ops._committed_epoch_dirs(work)
        tombed = [
            d
            for d in dirs
            if os.path.exists(os.path.join(d, "index.tombstone"))
        ]
        assert tombed, "retention never collected anything"
        for d in tombed:
            assert not os.path.isdir(os.path.join(d, "index"))
        # the newest `retain` epochs keep their own index dirs
        for d in dirs[-2:]:
            assert not os.path.exists(
                os.path.join(d, "index.tombstone")
            )
        # full-corpus probe still resolves: accepted units cover all
        units = ops._live_index_units(work, dirs)
        cov: list = []
        for _, _, c, _ in units:
            cov.extend(c)
        assert sorted(cov) == sorted(os.path.basename(d) for d in dirs)

    def test_subset_probe_horizon_semantics(self, spark, tmp_path):
        import map_reduce_framework_spark.streaming.ops as ops

        from .test_round11_ops import _planted_waves

        _run_waves_retain(
            spark,
            str(tmp_path / "run"),
            _planted_waves(6),
            fanout=2,
            retain=2,
        )
        work = str(tmp_path / "run" / "work")
        dirs = ops._committed_epoch_dirs(work)
        tombed = [
            d
            for d in dirs
            if os.path.exists(os.path.join(d, "index.tombstone"))
        ]
        live = [
            d
            for d in dirs
            if not os.path.exists(os.path.join(d, "index.tombstone"))
            and os.path.isdir(os.path.join(d, "index", "bands"))
        ]
        assert tombed and live
        # inside the horizon: a subset of epochs with retained dirs
        # resolves from those dirs
        units = ops._live_index_units(work, live[-1:])
        assert units and all(not u[3] for u in units)
        # outside: a subset needing a GC'd epoch fails LOUDLY
        with pytest.raises(RuntimeError, match="probe horizon"):
            ops._live_index_units(work, tombed[:1])

    @pytest.mark.soak
    def test_torn_gc_tombstone_wins_then_converges(self, spark, tmp_path):
        import map_reduce_framework_spark.streaming.ops as ops

        from .test_round11_ops import _planted_waves, _run_waves

        _run_waves(
            spark, str(tmp_path / "run"), _planted_waves(5), fanout=2
        )
        work = str(tmp_path / "run" / "work")
        dirs = ops._committed_epoch_dirs(work)
        units = ops._live_index_units(work, dirs)
        gen_cov: set = set()
        for _, _, c, is_gen in units:
            if is_gen:
                gen_cov |= c
        victim = next(
            d for d in dirs if os.path.basename(d) in gen_cov
        )
        # simulate the torn window: tombstone committed, rmtree not run
        with open(
            os.path.join(victim, "index.tombstone"), "w"
        ) as fh:
            json.dump({"gc": "probe-horizon", "retain": 1}, fh)
        assert os.path.isdir(os.path.join(victim, "index"))
        # full probe: unaffected (the epoch is generation-covered)
        full = ops._live_index_units(work, dirs)
        assert victim + "/index" not in [u[0] for u in full]
        # subset probe: the tombstone wins even though the dir exists
        with pytest.raises(RuntimeError, match="probe horizon"):
            ops._live_index_units(work, [victim])
        # re-entry finishes the rmtree
        ops._retain_epoch_indexes(work, 1)
        assert not os.path.isdir(os.path.join(victim, "index"))

    @pytest.mark.soak
    def test_retain_none_is_prior_behavior(self, spark, tmp_path):
        import map_reduce_framework_spark.streaming.ops as ops

        from .test_round11_ops import _planted_waves, _run_waves

        _run_waves(
            spark, str(tmp_path / "run"), _planted_waves(5), fanout=2
        )
        work = str(tmp_path / "run" / "work")
        for d in ops._committed_epoch_dirs(work):
            assert os.path.isdir(os.path.join(d, "index", "bands"))
            assert not os.path.exists(
                os.path.join(d, "index.tombstone")
            )


# ---------------------------------------------------------------------------
# VERDICT r11 ask #4: lossless JPEG (SOF3) -- the last non-
# differential JPEG process
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


class TestJpegLossless:
    def test_all_predictors_sample_exact(self):
        import numpy as np

        from map_reduce_framework_spark.operators.jpeg_lossless import (
            decode_jpeg_lossless,
            encode_jpeg_lossless,
        )

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (17, 23), dtype=np.uint16)
        for pred in range(1, 8):
            s, p = decode_jpeg_lossless(
                encode_jpeg_lossless(img, predictor=pred)
            )
            assert p == 8 and np.array_equal(s[:, :, 0], img)

    def test_precisions_and_point_transform(self):
        import numpy as np

        from map_reduce_framework_spark.operators.jpeg_lossless import (
            decode_jpeg_lossless,
            encode_jpeg_lossless,
        )

        rng = np.random.default_rng(4)
        img16 = rng.integers(0, 65536, (9, 11), dtype=np.uint16)
        s, p = decode_jpeg_lossless(
            encode_jpeg_lossless(img16, precision=16)
        )
        assert p == 16 and np.array_equal(s[:, :, 0], img16)
        img12 = rng.integers(0, 4096, (8, 8), dtype=np.uint16)
        s, p = decode_jpeg_lossless(
            encode_jpeg_lossless(img12, precision=12, point_transform=2)
        )
        # Pt zeroes the low bits by spec; everything above is exact
        assert np.array_equal(s[:, :, 0], (img12 >> 2) << 2)

    def test_multi_component_interleaved(self):
        import numpy as np

        from map_reduce_framework_spark.operators.jpeg_lossless import (
            decode_jpeg_lossless,
            encode_jpeg_lossless,
        )

        rng = np.random.default_rng(5)
        rgb = rng.integers(0, 256, (6, 7, 3), dtype=np.uint16)
        s, _ = decode_jpeg_lossless(encode_jpeg_lossless(rgb))
        assert np.array_equal(s, rgb)

    def test_sharp_edges_exercise_category_16(self):
        # alternating extremes at 16-bit force the maximal difference
        # categories, including the SSSS=16 / DIFF=32768 special case
        import numpy as np

        from map_reduce_framework_spark.operators.jpeg_lossless import (
            decode_jpeg_lossless,
            encode_jpeg_lossless,
        )

        img = np.zeros((4, 16), dtype=np.uint16)
        img[:, 1::2] = 65535
        img[2, ::2] = 32768
        for pred in (1, 4, 7):
            s, _ = decode_jpeg_lossless(
                encode_jpeg_lossless(img, precision=16, predictor=pred)
            )
            assert np.array_equal(s[:, :, 0], img)

    def test_pixel_path_and_classifier(self):
        import numpy as np

        from map_reduce_framework_spark.operators.jpeg import (
            decode_jpeg_pixels,
        )
        from map_reduce_framework_spark.operators.jpeg_lossless import (
            encode_jpeg_lossless,
        )
        from map_reduce_framework_spark.operators.multimodal import (
            CODEC_REJECTED_CLASSES,
            decode_image,
            jpeg_codec_class,
        )

        img = (np.arange(256).reshape(16, 16) % 256).astype(np.uint16)
        pay = encode_jpeg_lossless(img)
        assert jpeg_codec_class(pay) == "lossless"
        assert "lossless" not in CODEC_REJECTED_CLASSES
        px = decode_jpeg_pixels(pay)
        assert np.array_equal(px[:, :, 0], img.astype(np.uint8))
        assert decode_image(pay).shape == (16, 16, 3)

    def test_totality(self):
        from map_reduce_framework_spark.operators.jpeg_lossless import (
            decode_jpeg_lossless,
            encode_jpeg_lossless,
        )

        assert decode_jpeg_lossless(b"") is None
        assert decode_jpeg_lossless(b"\xff\xd8\xff\xd9") is None
        pay = encode_jpeg_lossless([[1, 2], [3, 4]])
        for cut in (4, 10, 30, len(pay) - 3):
            decode_jpeg_lossless(pay[:cut])  # must not raise

    @settings(max_examples=40, deadline=None)
    @given(
        data=st.data(),
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        pred=st.integers(1, 7),
        precision=st.sampled_from([8, 12, 16]),
    )
    def test_fuzz_roundtrip(self, data, h, w, pred, precision):
        import numpy as np

        from map_reduce_framework_spark.operators.jpeg_lossless import (
            decode_jpeg_lossless,
            encode_jpeg_lossless,
        )

        lim = 1 << precision
        img = np.array(
            data.draw(
                st.lists(
                    st.lists(
                        st.integers(0, lim - 1), min_size=w, max_size=w
                    ),
                    min_size=h,
                    max_size=h,
                )
            ),
            dtype=np.uint32,
        )
        s, p = decode_jpeg_lossless(
            encode_jpeg_lossless(
                img, predictor=pred, precision=precision
            )
        )
        assert p == precision and np.array_equal(s[:, :, 0], img)

    @settings(max_examples=40, deadline=None)
    @given(st.binary(min_size=0, max_size=300))
    def test_fuzz_decode_total(self, blob):
        from map_reduce_framework_spark.operators.jpeg_lossless import (
            decode_jpeg_lossless,
        )

        decode_jpeg_lossless(b"\xff\xd8" + blob)  # any return, no raise

    def test_registered_roundtrip_oracle_parity(self, spark, sf_smoke):
        from map_reduce_framework_spark.registry import REGISTRY

        from .oracle_util import compare_to_oracle, duckdb_conn

        q = REGISTRY["jpeg_lossless_roundtrip"]
        with duckdb_conn(sf_smoke) as con:
            compare_to_oracle(q.fn(spark, sf_smoke), con, q.oracle)


class TestMpegQuantizerTwins:
    def test_vectorized_quantizer_bit_equal_to_scalar(self):
        """The encoder's vectorized quantizer must be bit-equal to the
        scalar spec formula (same IEEE doubles, same order) across
        every steps class, including out-of-range inputs (clamping)."""
        import numpy as np

        import map_reduce_framework_spark.operators.mpeg_audio as MA

        rng = np.random.default_rng(1)
        for steps in sorted(MA._QC):
            xs = rng.uniform(-1.3, 1.3, 400)
            vec = list(MA._quantize_vec(xs, steps))
            sc = [MA._quantize(float(v), steps) for v in xs]
            assert vec == sc, steps

    def test_deq_table_matches_dequant(self):
        import map_reduce_framework_spark.operators.mpeg_audio as MA

        for steps in (3, 5, 9, 31, 8191):
            t = MA._deq_table(steps)
            assert len(t) == steps
            assert all(
                float(t[c]) == MA._dequant(c, steps)
                for c in range(0, steps, max(1, steps // 7))
            )


class TestFlacVectorizedPathsBitEqual:
    """The optimization round's vectorized FLAC paths must be
    bit-identical to the scalar spec forms they replace (same pinning
    discipline as the MPEG _quantize_vec test above)."""

    def _clips(self):
        import hashlib

        clips = []
        for d in range(6):
            s = []
            for t in range(2 + 17 * d):
                s.extend(
                    (b - 128) * 256
                    for b in hashlib.md5(f"{d}:{t}".encode()).digest()
                )
            clips.append(s)
        clips.append([])  # empty clip
        clips.append([7] * 300)  # constant
        import numpy as np

        rng = np.random.default_rng(5)
        clips.append(list(rng.integers(-32768, 32768, 5000)))  # verbatim
        return clips

    def test_bitwriter_matches_per_bit_reference(self):
        import numpy as np

        import map_reduce_framework_spark.operators.flac as FL

        class RefWriter:
            def __init__(self):
                self.out, self.acc, self.nbits = bytearray(), 0, 0

            def write(self, value, nbits):
                for i in range(nbits - 1, -1, -1):
                    self.acc = (self.acc << 1) | ((value >> i) & 1)
                    self.nbits += 1
                    if self.nbits == 8:
                        self.out.append(self.acc)
                        self.acc, self.nbits = 0, 0

        rng = np.random.default_rng(9)
        w, ref = FL._BitWriter(), RefWriter()
        for _ in range(500):
            nbits = int(rng.integers(1, 40))
            v = int(rng.integers(0, 1 << nbits))
            w.write(v, nbits)
            ref.write(v, nbits)
        w.align()
        if ref.nbits:
            ref.write(0, 8 - ref.nbits)
        assert w.bytes() == bytes(ref.out)

    def test_decode_vector_equals_scalar_fallback(self, monkeypatch):
        import numpy as np

        import map_reduce_framework_spark.operators.flac as FL

        def force_scalar(*a, **k):
            raise FL._NeedExact

        for clip in self._clips():
            payloads = [
                FL.encode_flac(clip),
                FL.encode_flac(clip, mode="lpc"),
                FL.encode_flac_stereo(clip, list(clip)[::-1], mode="mid_side"),
                FL.encode_flac_stereo(clip, list(clip)[::-1], mode="left_side"),
                FL.encode_flac_stereo(
                    clip, list(clip)[::-1], mode="right_side"
                ),
            ]
            fast = [FL.decode_flac(p) for p in payloads]
            with pytest.MonkeyPatch.context() as mp:
                mp.setattr(FL, "_decode_subframe_np", force_scalar)
                slow = [FL.decode_flac(p) for p in payloads]
            for f, s in zip(fast, slow):
                assert (f is None) == (s is None)
                if f is not None:
                    assert np.array_equal(f[0], s[0]) and f[1:] == s[1:]

    def test_rice_bits_matches_per_code_writer(self):
        import numpy as np

        import map_reduce_framework_spark.operators.flac as FL

        rng = np.random.default_rng(3)
        res = [int(v) for v in rng.integers(-3000, 3000, 700)]
        for p in (0, 1, 5, 11):
            w_ref = FL._BitWriter()
            for v in res:
                u = FL._zigzag(v)
                w_ref.write_unary(u >> p)
                if p:
                    w_ref.write(u & ((1 << p) - 1), p)
            w_ref.align()
            w_vec = FL._BitWriter()
            w_vec.write_bits(FL._rice_bits(FL._zigzag_vec(res), p))
            w_vec.align()
            assert w_ref.bytes() == w_vec.bytes(), p


class TestAudioFingerprintVectorizedBitEqual:
    """r12 optimization: the vectorized Mersenne-modmul fingerprint
    kernels must match the scalar spec forms exactly (same pinning
    discipline as the FLAC/MPEG vectorizations)."""

    def test_window_fingerprints_match_scalar(self):
        import numpy as np

        import map_reduce_framework_spark.operators.audio as A

        rng = np.random.default_rng(23)
        for n in (0, 1, 15, 16, 63, 64, 65, 100, 1024, 1025, 2048):
            s = [int(v) for v in rng.integers(-32768, 32768, n)]
            quiet = [int(v) for v in rng.integers(-1500, 1500, n)]
            for clip in (s, quiet, [0] * n, [-32768] * n):
                for ds in (True, False):
                    assert A.window_fingerprints(
                        clip, drop_silent=ds
                    ) == A._window_fingerprints_scalar(clip, drop_silent=ds)
                assert A.robust_window_fingerprints(
                    clip
                ) == A._robust_window_fingerprints_scalar(clip)
