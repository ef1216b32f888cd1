"""Round-8 regression and operator tests.

ADVICE.md r7 fixes: GIF animation frame-count / cumulative-pixel cap,
LZW encoder EOI width at the 2^width registration boundary, JPEG
(h, w, 1) grayscale input, reliable-checkpoint cleanup conf.
"""

from __future__ import annotations

import numpy as np
import pytest

from map_reduce_framework_spark.operators import multimodal as mm
from map_reduce_framework_spark.operators.jpeg import (
    decode_jpeg_pixels,
    encode_jpeg,
)



def _pages(docs):
    """run_curation consumes raw crawl pages since round 10."""
    from map_reduce_framework_spark.operators.html_extract import synth_pages

    return synth_pages(docs)

# ---------------------------------------------------------------------------
# ADVICE #1: decode_gif_frames frame-count / cumulative-pixel caps
# ---------------------------------------------------------------------------


def _many_frame_gif(n_frames: int, w: int = 4, h: int = 4) -> bytes:
    frame = np.zeros((h, w), dtype=np.uint8)
    return mm.encode_gif([frame] * n_frames)


class TestGifFrameCaps:
    def test_frame_count_cap_refuses(self):
        payload = _many_frame_gif(mm.MAX_DECODE_FRAMES + 1)
        assert mm.decode_gif_frames(payload) is None

    def test_at_cap_decodes(self):
        payload = _many_frame_gif(mm.MAX_DECODE_FRAMES)
        frames = mm.decode_gif_frames(payload)
        assert frames is not None and len(frames) == mm.MAX_DECODE_FRAMES

    def test_cumulative_pixel_budget(self):
        # Each frame is one full-canvas RGB copy: a canvas that passes
        # the per-frame dims cap must still refuse once
        # n_frames * canvas exceeds the SHARED pixel budget. A real
        # near-64MP payload would be slow to LZW-encode in a unit test,
        # so exercise the guard with a small canvas and a temporarily
        # lowered budget.
        frame = np.zeros((16, 16), dtype=np.uint8)
        payload = mm.encode_gif([frame] * 3)
        orig = mm.MAX_DECODE_PIXELS
        try:
            mm.MAX_DECODE_PIXELS = 2 * 16 * 16  # budget: two frames
            assert mm.decode_gif_frames(payload) is None
            mm.MAX_DECODE_PIXELS = 3 * 16 * 16
            frames = mm.decode_gif_frames(payload)
            assert frames is not None and len(frames) == 3
        finally:
            mm.MAX_DECODE_PIXELS = orig


# ---------------------------------------------------------------------------
# ADVICE #3: LZW encoder must grow the code width BEFORE emitting EOI
# when the decoder's implied registration for the final data code lands
# exactly on a 2^width boundary. The in-repo decoder early-returns at
# max_pixels and cannot observe this; this STRICT decoder consumes the
# stream code-by-code per the GIF89a spec and raises on any misparse.
# ---------------------------------------------------------------------------


def _strict_lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Spec-conformant GIF LZW decoder: requires a well-formed EOI at
    the CURRENT width (including post-final-code growth) and raises on
    any invalid code -- the external-decoder-interop reading."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table = {i: bytes([i]) for i in range(clear)}
    width = min_code_size + 1
    next_code = eoi + 1
    out = bytearray()
    acc = nbits = 0
    prev = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = {i: bytes([i]) for i in range(clear)}
                width = min_code_size + 1
                next_code = eoi + 1
                prev = None
                continue
            if code == eoi:
                if acc != 0:
                    raise AssertionError("trailing bits after EOI")
                return bytes(out)
            if code in table:
                entry = table[code]
            elif code == next_code and prev is not None:
                entry = prev + prev[:1]
            else:
                raise AssertionError(
                    f"invalid code {code} at width {width} "
                    f"(next_code={next_code})"
                )
            out += entry
            if prev is not None and next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    raise AssertionError("stream ended without EOI")


class TestLzwEoiWidth:
    def test_boundary_case(self):
        # min_code_size=2: clear=4 eoi=5, width 3, decoder grows at
        # next_code==8. Stream [0,0,0,0,0] emits codes 0,6 then final 6;
        # the decoder's registration for the final code assigns 7 ->
        # next_code 8 == 2^3 -> EOI must be written at width 4.
        indices = bytes([0, 0, 0, 0, 0])
        data = mm._gif_lzw_encode(indices, 2)
        assert _strict_lzw_decode(data, 2) == indices
        # the in-repo decoder stays green too
        assert bytes(mm._gif_lzw_decode(data, 2, len(indices))) == indices

    def test_first_code_after_clear_no_growth(self):
        # a single-code stream has no implied registration: EOI stays
        # at the base width
        for mcs in (2, 4, 8):
            indices = bytes([1])
            data = mm._gif_lzw_encode(indices, mcs)
            assert _strict_lzw_decode(data, mcs) == indices

    @pytest.mark.parametrize("seed", range(8))
    def test_random_streams_strict(self, seed):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 2000))
        mcs = int(rng.integers(2, 9))
        indices = bytes(rng.integers(0, 1 << mcs, size=n, dtype=np.uint8))
        data = mm._gif_lzw_encode(indices, mcs)
        assert _strict_lzw_decode(data, mcs) == indices

    def test_boundary_sweep(self):
        # runs of a repeated symbol sweep the final-code registration
        # across every boundary offset for several widths
        for mcs in (2, 3):
            for n in range(1, 300):
                indices = bytes([0]) * n
                data = mm._gif_lzw_encode(indices, mcs)
                assert _strict_lzw_decode(data, mcs) == indices, (mcs, n)


# ---------------------------------------------------------------------------
# ADVICE #4: encode_jpeg on (h, w, 1) input
# ---------------------------------------------------------------------------


class TestJpegSingleChannel3D:
    def test_h_w_1_encodes_as_grayscale(self):
        rng = np.random.default_rng(0)
        px2 = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
        px3 = px2[:, :, None]
        out3 = encode_jpeg(px3)
        assert out3 == encode_jpeg(px2)
        dec = decode_jpeg_pixels(out3)
        assert dec is not None and dec.shape[:2] == (16, 16)

    def test_h_w_2_raises_clearly(self):
        px = np.zeros((8, 8, 2), dtype=np.uint8)
        with pytest.raises(ValueError, match="shape"):
            encode_jpeg(px)

    def test_1d_raises_clearly(self):
        with pytest.raises(ValueError, match="shape"):
            encode_jpeg(np.zeros(64, dtype=np.uint8))


# ---------------------------------------------------------------------------
# ADVICE #2: reliable-checkpoint cleanup conf is set by get_spark
# ---------------------------------------------------------------------------


def test_checkpoint_cleaner_conf(spark):
    assert (
        spark.sparkContext.getConf().get(
            "spark.cleaner.referenceTracking.cleanCheckpoints"
        )
        == "true"
    )


# ---------------------------------------------------------------------------
# Trained language identification (VERDICT r7 ask #1)
# ---------------------------------------------------------------------------


class TestLangid:
    def test_oracle_parity_smoke(self, spark, sf_smoke):
        from map_reduce_framework_spark.operators import langid as L
        from .oracle_util import compare_to_oracle, duckdb_conn

        docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
        con = duckdb_conn(sf_smoke)
        for name, df in [
            ("langid_train", L.langid_train(docs)),
            ("langid_scores", L.langid_scores(docs)),
            ("langid_accuracy", L.langid_accuracy(docs)),
        ]:
            compare_to_oracle(df, con, L.ORACLE_SQL[name])

    def test_loss_descends_monotonically_per_class(self, spark, sf_smoke):
        from map_reduce_framework_spark.operators import langid as L

        docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
        rows, _w = L.langid_train_trace(docs)
        by_lang: dict = {}
        for r in rows:
            by_lang.setdefault(r[1], []).append(r[2])
        assert set(by_lang) == set(L.LID_LANGS)
        for lang, losses in by_lang.items():
            assert all(a >= b for a, b in zip(losses, losses[1:])), (
                lang,
                losses,
            )
            assert losses[0] == pytest.approx(0.693147, abs=1e-5)

    def _signal_corpus(self, spark, n_per_lang=40, flip=()):
        """A corpus whose text DOES carry language signal: each doc is
        mostly its language's marker words (LANG_PROFILES) plus shared
        filler. ``flip`` re-labels those doc_ids to the next language
        WITHOUT changing the text (a planted mislabel)."""
        from map_reduce_framework_spark.operators.text_analysis import (
            LANG_PROFILES,
        )

        langs = sorted(LANG_PROFILES)
        rows = []
        doc_id = 0
        for li, lang in enumerate(langs):
            markers = LANG_PROFILES[lang]
            for k in range(n_per_lang):
                words = (markers * 4) + ["filler", f"shared{k % 3}"]
                # rotate word order per doc for variety
                rot = k % len(words)
                text = " ".join(words[rot:] + words[:rot])
                label = lang
                if doc_id in flip:
                    label = langs[(li + 1) % len(langs)]
                rows.append((doc_id, text, label, f"src{li}", len(text)))
                doc_id += 1
        return spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, "
            "source string, n_chars bigint"
        )

    def test_planted_signal_learns(self, spark):
        from map_reduce_framework_spark.operators import langid as L

        docs = self._signal_corpus(spark)
        scores = L.langid_scores(docs, iters=30).collect()
        n = len(scores)
        correct = sum(1 for r in scores if r.pred_lang == r.labeled_lang)
        assert correct / n >= 0.9, f"{correct}/{n}"

    def test_planted_mislabels_detected(self, spark):
        from map_reduce_framework_spark.operators import langid as L

        flip = {3, 47, 88, 123, 161}  # one per language block
        docs = self._signal_corpus(spark, flip=flip)
        scores = L.langid_scores(docs, iters=30).collect()
        detected = {r.doc_id for r in scores if r.pred_lang != r.labeled_lang}
        # every planted mislabel is flagged (the model trained on 97.5%
        # clean labels still learns the true text->lang mapping) ...
        assert flip <= detected, flip - detected
        # ... and the false-positive rate stays low
        assert len(detected - flip) <= len(scores) * 0.05

    def test_scores_plan_is_shuffle_free(self, spark, sf_smoke):
        from map_reduce_framework_spark.operators import langid as L

        docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
        df = L.langid_scores(docs)
        formatted = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        # the APPLY pass is one narrow projection: the only exchange is
        # the round-robin spread of the single-file test scan -- never a
        # hash/range shuffle (no key ever moves)
        assert "hashpartitioning" not in formatted, formatted
        assert "rangepartitioning" not in formatted, formatted
        assert formatted.count("Exchange (") <= 1, formatted


# ---------------------------------------------------------------------------
# Resumable end-to-end curation run (VERDICT r7 ask #2)
# ---------------------------------------------------------------------------


def _shard_file_bytes(out_dir):
    """{relative partition path: bytes of its single parquet file} for a
    committed shard dir (file NAMES embed task UUIDs, so identity is
    per-partition-directory content)."""
    import glob
    import os

    root = os.path.join(out_dir, "shards", "data")
    got = {}
    for path in glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True):
        rel = os.path.relpath(os.path.dirname(path), root)
        assert rel not in got, f"two files in partition {rel}"
        with open(path, "rb") as fh:
            got[rel] = fh.read()
    return got


class TestCurationRun:
    def _kill_and_resume(self, spark, sf_smoke, tmp_path, boundaries):
        from map_reduce_framework_spark import curation as C

        docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")

        # the uninterrupted reference run
        ref_dir = str(tmp_path / "ref")
        ref = C.run_curation(spark, _pages(docs), ref_dir)
        assert all(v == "computed" for v in ref["executed"].values())
        ref_bytes = _shard_file_bytes(ref_dir)
        assert ref_bytes, "reference run wrote no shards"

        for i, boundary in boundaries:
            out = str(tmp_path / f"kill_{boundary}")
            with pytest.raises(C.CurationInterrupted):
                C.run_curation(spark, _pages(docs), out, fail_after=boundary)
            res = C.run_curation(spark, _pages(docs), out)
            done = C.CURATION_STAGES[: i + 1]
            # completed stages do NOT re-execute ...
            assert all(res["executed"][s] == "skipped" for s in done), (
                boundary,
                res["executed"],
            )
            # ... the rest run exactly once on resume ...
            rest = C.CURATION_STAGES[i + 1 :]
            assert all(res["executed"][s] == "computed" for s in rest), (
                boundary,
                res["executed"],
            )
            # ... and the final ledger and shard BYTES match the
            # uninterrupted run exactly
            assert res["ledger"] == ref["ledger"], boundary
            assert _shard_file_bytes(out) == ref_bytes, boundary

    def test_kill_and_resume_sampled_stage_boundaries(
        self, spark, sf_smoke, tmp_path
    ):
        """Default-run sample of the boundary sweep (first, a middle,
        and the last pre-ledger boundary); the exhaustive
        every-boundary loop is the soak-marked twin below (VERDICT r12
        ask #1: the full 10-boundary sweep alone cost ~160 s of the
        driver's verify budget)."""
        from map_reduce_framework_spark import curation as C

        stages = C.CURATION_STAGES[:-1]
        picks = sorted({0, len(stages) // 2, len(stages) - 1})
        self._kill_and_resume(
            spark, sf_smoke, tmp_path, [(i, stages[i]) for i in picks]
        )

    @pytest.mark.soak
    def test_kill_and_resume_every_stage_boundary(
        self, spark, sf_smoke, tmp_path
    ):
        from map_reduce_framework_spark import curation as C

        self._kill_and_resume(
            spark,
            sf_smoke,
            tmp_path,
            list(enumerate(C.CURATION_STAGES[:-1])),
        )

    def test_ledger_oracle_parity(self, spark, sf_smoke, tmp_path):
        from map_reduce_framework_spark import curation as C
        from .oracle_util import compare_to_oracle, duckdb_conn

        docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
        ldf = C.curation_run_ledger(spark, docs, str(tmp_path / "run"))
        compare_to_oracle(
            ldf, duckdb_conn(sf_smoke), C.ORACLE_SQL["curation_run_ledger"]
        )

    def test_validate_run_catches_missing_stage(
        self, spark, sf_smoke, tmp_path
    ):
        import shutil

        from map_reduce_framework_spark import curation as C

        docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
        out = str(tmp_path / "run")
        C.run_curation(spark, _pages(docs), out)
        assert C.validate_run(spark, out)["phase"] == "done"
        shutil.rmtree(C._stage_dir(out, "decontaminate"))
        with pytest.raises(RuntimeError, match="decontaminate"):
            C.validate_run(spark, out)

    def test_crash_between_rename_and_mark_done_redoes(
        self, spark, sf_smoke, tmp_path
    ):
        """Committed stage data the manifest never recorded is redone
        deterministically (the one crash window the protocol resolves
        by recompute)."""
        import os

        from map_reduce_framework_spark import curation as C

        docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
        out = str(tmp_path / "run")
        with pytest.raises(C.CurationInterrupted):
            C.run_curation(spark, _pages(docs), out, fail_after="quality")
        # simulate the torn window: stage parquet exists, manifest entry
        # erased
        manifest_path = os.path.join(out, "manifest.json")
        import json

        state = json.load(open(manifest_path))
        del state["completed"]["quality"]
        json.dump(state, open(manifest_path, "w"))
        res = C.run_curation(spark, _pages(docs), out)
        assert res["executed"]["quality"] == "computed"
        assert C.validate_run(spark, out)["phase"] == "done"


# ---------------------------------------------------------------------------
# Audio: silence-skew guard (VERDICT r7 ask #3) and gain-invariant
# robust fingerprints (ask #4)
# ---------------------------------------------------------------------------


def _wav_docs(spark, clips):
    """(doc_id, payload) DataFrame from {doc_id: int16 sample list}."""
    from map_reduce_framework_spark.operators.audio import encode_wav

    rows = [(int(i), bytearray(encode_wav(s))) for i, s in clips.items()]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


class TestAudioSilenceSkew:
    def test_silent_windows_dropped_and_candidates_bounded(self, spark):
        """SCALE.md's knob as code: plant N mostly-silent clips (90%
        zero samples + a unique loud tail). Without the drop filter the
        shared all-zero windows form ONE fingerprint key holding every
        clip -- the pathological blocking failure; with it, per-key
        candidate counts stay bounded by true duplication."""
        from map_reduce_framework_spark.operators.audio import (
            CHUNK_SAMPLES,
            audio_fingerprints_from_payloads,
        )

        n = 50
        silent_part = [0] * (CHUNK_SAMPLES * 36)  # 36 silent chunks
        clips = {
            i: silent_part
            + [((i * 97 + k * 31) % 40) * 1000 - 20000 for k in range(64)]
            for i in range(n)
        }
        df = _wav_docs(spark, clips)

        undropped = audio_fingerprints_from_payloads(
            df, drop_silent=False
        )
        hot = (
            undropped.groupBy("fp").count().orderBy("count", ascending=False)
        ).first()
        # fixture really is adversarial: the all-zero window key holds
        # every silent window of every clip
        assert hot["count"] >= n * 30, hot

        dropped = audio_fingerprints_from_payloads(df)  # default: drop
        per_key = dropped.groupBy("fp").count().collect()
        # per-task candidate bound: no fingerprint key may hold more
        # rows than the true duplication (these tails are all distinct,
        # so every surviving key is near-unique)
        assert max(r["count"] for r in per_key) <= 4, sorted(
            (r["count"] for r in per_key), reverse=True
        )[:5]
        # and no surviving window is all-silent
        rows = dropped.collect()
        assert rows, "loud tails must fingerprint"
        silent_windows = 36 - 3  # windows fully inside the silent span
        assert all(r.window_idx >= silent_windows for r in rows)

    def test_hot_key_exactness_preserved(self, spark):
        """The r7 hot-key exactness property survives the silence
        filter (md5-generated clips never contain silent windows)."""
        from map_reduce_framework_spark.operators.audio import (
            audio_fingerprint_pairs,
        )

        t = "stone river maple cloud ember frost grain haven"
        rows = [(i, t, "en", "s", len(t)) for i in range(12)]
        docs = spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, "
            "n_chars int",
        )
        pairs = audio_fingerprint_pairs(docs).collect()
        assert len(pairs) == 12 * 11 // 2
        assert all(r.n_shared_fp == 5 for r in pairs)


class TestAudioRobustFingerprint:
    def test_planted_gain_change_exact_misses_robust_catches(self, spark):
        """A volume-halved copy of a clip: the exact sample-value
        fingerprint shares NOTHING with the original (every sample
        differs), while the energy-ratio fingerprint is bit-identical
        per window (even samples halve exactly, so every ratio is
        preserved). The test asserts BOTH directions."""
        from map_reduce_framework_spark.operators.audio import (
            AUDIO_FP_MIN,
            audio_fingerprints_from_payloads,
        )

        rng = np.random.default_rng(7)
        # even samples, loud enough that no window is silent
        base = [int(v) * 2 for v in rng.integers(2000, 16000, size=512)]
        halved = [v // 2 for v in base]
        other = [int(v) * 2 for v in rng.integers(2000, 16000, size=512)]
        df = _wav_docs(spark, {0: base, 1: halved, 2: other})

        exact = audio_fingerprints_from_payloads(df)
        e = {(r.doc_id, r.fp) for r in exact.collect()}
        shared_exact = {f for d, f in e if d == 0} & {
            f for d, f in e if d == 1
        }
        assert len(shared_exact) < AUDIO_FP_MIN  # exact fp MISSES it
        assert not shared_exact  # in fact nothing survives a gain change

        robust = audio_fingerprints_from_payloads(df, robust=True)
        r = {}
        for row in robust.collect():
            r.setdefault(row.doc_id, set()).add((row.window_idx, row.rfp))
        # robust fp CATCHES it: every window fingerprint identical
        assert r[0] == r[1]
        # and stays discriminative: the unrelated clip shares (almost)
        # nothing
        shared_other = {f for _i, f in r[0]} & {f for _i, f in r[2]}
        assert len(shared_other) < AUDIO_FP_MIN

    def test_registered_robust_queries_oracle_parity(self, spark, sf_smoke):
        from map_reduce_framework_spark.operators import audio as A
        from .oracle_util import compare_to_oracle, duckdb_conn

        docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
        con = duckdb_conn(sf_smoke)
        for name, df in [
            ("audio_fingerprints", A.audio_fingerprints(docs)),
            ("audio_fingerprints_robust", A.audio_fingerprints_robust(docs)),
            ("audio_robust_fp_pairs", A.audio_robust_fp_pairs(docs)),
        ]:
            compare_to_oracle(df, con, A.ORACLE_SQL[name])


# ---------------------------------------------------------------------------
# Frame-sampler registry (VERDICT r7 ask #5): GIF + concatenated-BMP
# containers through ONE seam
# ---------------------------------------------------------------------------


class TestFrameSamplerRegistry:
    def test_bmpseq_roundtrip_matches_gif(self):
        rng = np.random.default_rng(3)
        frames = [
            rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
            for _ in range(4)
        ]
        gif = mm.encode_gif(frames)
        seq = mm.encode_bmpseq(frames)
        assert mm.detect_container(gif) == "gif"
        assert mm.detect_container(seq) == "bmpseq"
        g = mm.sample_frames(gif)
        b = mm.sample_frames(seq)
        assert len(g) == len(b) == 4
        for fg, fb in zip(g, b):
            assert np.array_equal(fg, fb)

    def test_unknown_and_corrupt_payloads(self):
        assert mm.detect_container(b"\x00\x01\x02") is None
        assert mm.sample_frames(b"not a video") is None
        # truncated bmpseq
        seq = mm.encode_bmpseq([np.zeros((4, 4), dtype=np.uint8)])
        assert mm.decode_bmpseq_frames(seq[:-3]) is None
        # frame-count bomb header refused
        bomb = (
            mm._BMPSEQ_MAGIC
            + (mm.MAX_DECODE_FRAMES + 1).to_bytes(4, "little")
        )
        assert mm.decode_bmpseq_frames(bomb) is None

    def test_mixed_container_video_dedup_oracle_parity(
        self, spark, sf_smoke
    ):
        """The SAME registered query path now decodes a mixed-container
        corpus (doc_id % 3 routes GIF / BMPSEQ / AVI-DIB since round
        9); the pixel-math oracle certifies every round trip, and pair
        dedup stays green across container boundaries."""
        from .oracle_util import compare_to_oracle, duckdb_conn

        docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
        con = duckdb_conn(sf_smoke)
        compare_to_oracle(
            mm.video_frame_dhash(docs),
            con,
            mm.ORACLE_SQL["video_frame_dhash"],
        )
        compare_to_oracle(
            mm.video_dedup_pairs(docs),
            con,
            mm.ORACLE_SQL["video_dedup_pairs"],
        )

    def test_pair_dedup_across_mixed_containers(self, spark):
        """A planted duplicate clip pair that crosses the container
        boundary (doc 2 -> AVI-DIB, doc 3 -> GIF under the %3 routing)
        is still found -- the dedup semantics are container-blind."""
        t = "stone river maple cloud ember frost grain haven"
        docs = spark.createDataFrame(
            [
                (2, t, "en", "s", len(t)),   # AVI-DIB side
                (3, t, "en", "s", len(t)),   # GIF side
                (4, "totally different words here now ok", "en", "s", 30),
            ],
            "doc_id long, text string, lang string, source string, "
            "n_chars int",
        )
        pairs = mm.video_dedup_pairs(docs).collect()
        assert [(r.doc_a, r.doc_b) for r in pairs] == [(2, 3)]
        assert pairs[0].n_matched_frames == mm.VIDEO_N_FRAMES


# ---------------------------------------------------------------------------
# Mixture-aware shard loader (VERDICT r7 ask #6)
# ---------------------------------------------------------------------------


class TestShardLoader:
    def test_schedule_oracle_parity(self, spark, sf_smoke):
        from map_reduce_framework_spark.sources import shard_writer as SW
        from .oracle_util import compare_to_oracle, duckdb_conn

        docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
        compare_to_oracle(
            SW.shard_read_schedule(docs),
            duckdb_conn(sf_smoke),
            SW.ORACLE_SQL["shard_read_schedule"],
        )

    def test_manifest_schedule_matches_engine_schedule(
        self, spark, sf_smoke, tmp_path
    ):
        """The load-time (manifest-only) scheduler and the engine
        relation agree row for row -- a training job holding just the
        committed manifest reads in exactly the oracle-checked order."""
        from map_reduce_framework_spark.sources import shard_writer as SW

        docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
        out = str(tmp_path / "shards")
        assert SW.write_training_shards(spark, docs, out)
        manifest = SW.read_manifest(out)
        got = [
            (
                e["pos"], e["lang"], e["shard"], e["shard_file"],
                e["n_seqs"], e["n_tokens"], e["vt"], e["cum_tokens"],
            )
            for e in SW.schedule_from_manifest(manifest)
        ]
        want = [
            tuple(r)
            for r in SW.shard_read_schedule(docs).orderBy("pos").collect()
        ]
        assert got == want

    def test_schedule_interleaves_by_weight(self, spark, sf_smoke):
        """The dominant language may not run away with the head of the
        schedule: within any prefix, each language's share of scheduled
        files tracks its weight share (WFQ's bounded-lag property)."""
        from collections import Counter

        from map_reduce_framework_spark.sources import shard_writer as SW

        docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
        rows = SW.shard_read_schedule(docs).orderBy("pos").collect()
        langs = {r.lang for r in rows}
        assert len(langs) == 5
        # every language appears in the first |langs|+2 positions: the
        # interleave starts fair, not lang-block-sequential
        head = {r.lang for r in rows[: len(langs) + 2]}
        assert head == langs, head

    def test_mid_epoch_resume_no_skip_no_repeat(
        self, spark, sf_smoke, tmp_path
    ):
        """Consume k shards, checkpoint pos, resume: the concatenation
        of consumed + resumed streams equals one uninterrupted epoch
        exactly (every seq/token once), and the consumed-token
        accounting matches the schedule's cum_tokens."""
        from map_reduce_framework_spark.sources import shard_writer as SW

        docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
        out = str(tmp_path / "shards")
        SW.write_training_shards(spark, docs, out)

        full = [
            (e["pos"], [tuple(r) for r in df.collect()], e["n_tokens"])
            for e, df in SW.iter_training_shards(spark, out)
        ]
        k = len(full) // 2
        cursor = full[k - 1][0]
        consumed_tokens = sum(t for _p, _r, t in full[:k])
        sched = SW.schedule_from_manifest(SW.read_manifest(out))
        assert consumed_tokens == sched[k - 1]["cum_tokens"]

        resumed = [
            (e["pos"], [tuple(r) for r in df.collect()], e["n_tokens"])
            for e, df in SW.iter_training_shards(spark, out, cursor=cursor)
        ]
        assert full[:k] + resumed == full  # no skip, no repeat
        # token-level identity: every packed row exactly once
        all_rows = [r for _p, rows, _t in full for r in rows]
        assert len(all_rows) == len(set(all_rows))
        total = sum(t for _p, _r, t in full)
        assert total == sched[-1]["cum_tokens"]


class TestLangidStratifiedSample:
    def test_oracle_parity_and_quota_semantics(self, spark, sf_smoke):
        from map_reduce_framework_spark.operators import langid as L
        from map_reduce_framework_spark.operators.text_analysis import (
            SAMPLE_THRESHOLDS,
        )
        from .oracle_util import compare_to_oracle, duckdb_conn

        docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
        df = L.langid_stratified_sample(docs)
        compare_to_oracle(
            df, duckdb_conn(sf_smoke),
            L.ORACLE_SQL["langid_stratified_sample"],
        )
        rows = df.collect()
        # on the no-signal corpus the model predicts the majority class
        # everywhere, so every doc competes under the 'en' threshold --
        # the honest data-card story the docstring states
        assert {r.pred_lang for r in rows} == {"en"}
        assert all(r.sample_key < SAMPLE_THRESHOLDS["en"] for r in rows)

    def test_planted_signal_applies_per_lang_quotas(self, spark):
        """With real language signal, the computed strata reproduce the
        per-language quotas: each predicted lang's sample rate tracks
        its threshold."""
        from map_reduce_framework_spark.operators import langid as L

        docs = TestLangid._signal_corpus(None, spark, n_per_lang=60)
        sample = L.langid_stratified_sample(docs, iters=30).collect()
        by_pred = {}
        for r in sample:
            by_pred.setdefault(r.pred_lang, []).append(r)
        # en quota (0xc0/0x100 = 75%) must admit far more than the
        # default quota (0x20/0x100 = 12.5%) applied to de/zh
        assert len(by_pred.get("en", [])) > 2 * len(by_pred.get("de", []))


def test_langid_scores_stream_equals_batch(spark, sf_smoke):
    """Train offline, score the stream: the streaming twin's rows equal
    the batch scores under the same trained weights."""
    from map_reduce_framework_spark import registry
    from map_reduce_framework_spark.operators import langid as L

    stream_rows = sorted(
        tuple(r)
        for r in registry.REGISTRY["langid_scores_stream"]
        .fn(spark, sf_smoke)
        .collect()
    )
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    batch_rows = sorted(tuple(r) for r in L.langid_scores(docs).collect())
    assert stream_rows == batch_rows


def test_curation_orphan_staging_swept(spark, sf_smoke, tmp_path):
    """A crash BEFORE a stage's rename leaves an orphaned .staging-*
    dir; the next run sweeps it and completes normally."""
    import os

    from map_reduce_framework_spark import curation as C

    out = str(tmp_path / "run")
    orphan = os.path.join(out, "stages", "quality.staging-deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk"), "w") as fh:
        fh.write("partial write")
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    res = C.run_curation(spark, _pages(docs), out)
    assert not os.path.exists(orphan)
    assert all(v == "computed" for v in res["executed"].values())
    assert C.validate_run(spark, out)["phase"] == "done"
