#!/usr/bin/env python
"""Scaling-curve evidence for the 100 TB design claims: run one headline
query per operator family at sf0.001 / sf0.01 / sf0.1 (100x data spread)
and report wall-clock growth factors.

What "good" looks like on local[32], where small-SF times are dominated
by fixed per-job overhead: the 0.001->0.1 growth factor should sit FAR
below the 100x data growth (overhead amortizes), and the 0.01->0.1
factor (10x data) should approach but not exceed ~10x for the linear
operators. A factor much above the data growth would expose a
super-linear stage (an unblocked self-join, a driver-side loop) --
exactly what the plan gates are supposed to prevent; this experiment is
the end-to-end measurement backing them.

Writes experiments/scaling_results.json:
  {query: {sf: seconds, ..., "growth_001_to_01": f1, "growth_01_to_1": f2}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

#: One representative per family; all linear-ish by design.
QUERIES = [
    "wc",                   # A-surface: tokenize + agg
    "q3_top_orders",        # relational join + agg + top-k
    "minhash_lsh_pairs",    # dedup: shingle + sign + band join + verify
    "ann_lsh",              # similarity: bucket + probe + exact verify
    "part_pagerank",        # iterative graph
    "incremental_daily_agg",  # state merge
    "sequence_packing",     # Arrow groupwise packing
    # round-5 additions: the blocking/broadcast guarantees of the dedup
    # and retrieval families are exactly what a super-linear curve would
    # falsify, so measure them directly.
    "simhash_near_pairs",   # banded hamming blocking (never all-pairs)
    "chunk_dedup_clean",    # inverted-index co-count + hot-set broadcast
    "hybrid_retrieval_rrf_ann",  # BM25 + IVF-PQ fusion (no full scan)
    "unigram_logprob_scores",    # broadcast-capped LM scoring
    # round-5 selection/semantic-dedup additions: DSIR's broadcast-LM
    # scoring and SemDeDup's cluster-blocked pair stage carry the same
    # "never shuffle/pair the whole stream" claims as the rows above.
    "dsir_log_weights",     # Arrow features + broadcast bucket LM
    "semdedup",             # k-means-blocked within-cluster cosine
    "quality_classifier_scores",  # pure-Catalyst narrow projection
    # round-5 Gopher/ExactSubstr additions: rule filtering must stay
    # scan-bound map work, and coverage's shingle groupBy + dup-only
    # re-join must track the token stream linearly.
    "gopher_quality_filter",      # shuffle-free seven-rule projection
    "duplicated_ngram_coverage",  # shingle occ counts + dup-only re-join
    # round-5 tokenizer/split/decontamination additions: BPE must stay
    # train-small/apply-linear, the leakage-safe split adds only a doc_id
    # join over the dedup clustering, and the near-dup contamination
    # sweep shares minhash_lsh_pairs' banded blocking.
    "bpe_tokenize_corpus",        # driver-trained merges, Arrow apply
    "leakage_safe_split",         # cluster-representative hash split
    "eval_neardup_contamination", # banded eval-vs-train orientation
    # round-6: the span-removal transform shares coverage's shingle
    # budget plus one doc-keyed anti-join and a doc-local reassembly.
    "exact_substr_dedup",         # keep-first span removal, cleaned text
    # round-6 additions: the trainer is K scan-bound aggregate passes,
    # the mixture sample is one broadcast join + per-source prefix sum,
    # dhash pairs are band-blocked like SimHash, and the perplexity
    # terciles reuse the broadcast-LM scoring shape.
    "quality_classifier_trained_scores",  # K-pass logistic trainer + apply
    "data_mixture_sample",        # weighted allocation + prefix fill
    "image_dhash_pairs",          # real-codec dHash + banded hamming
    "perplexity_buckets",         # quantized LM + per-lang ntile
    # round-7 additions: video keyframes and audio fingerprints are
    # scan-bound codec map work + banded/equi pair joins (same claims
    # as image_dhash_pairs), the JPEG roundtrip is pure map work, the
    # shard accounting is one groupBy over the packing, and the
    # cross-modal clustering composes two banded pair plans + CC.
    "video_dedup_pairs",          # animated-GIF codec + banded frames
    "audio_fingerprint_pairs",    # WAV codec + window-fp equi join
    "jpeg_block_roundtrip",       # baseline-JPEG codec map
    "training_shard_accounting",  # packing + shard-file groupBy
    "cross_modal_dedup_clusters", # unioned pair edges + min-label CC
    # round-8 additions: langid is K scan-bound aggregate passes + one
    # narrow apply (the quality-classifier claim, multiclass), robust
    # audio fingerprints share the window-fp equi-join shape, and the
    # shard schedule is a shard-file-count-sized sort.
    "langid_scores",              # K-pass one-vs-rest trainer + apply
    "audio_robust_fp_pairs",      # energy-ratio fp equi join
    "shard_read_schedule",        # WFQ interleave over shard files
    # round-9 additions: extraction is a shuffle-free regex/HOF
    # projection (the rule-filter claim applied to markup), the
    # pred-lang mixture adds one doc-keyed join + per-stratum prefix
    # sum over the langid apply, and MJPEG-AVI is scan-bound codec map
    # work like jpeg_block_roundtrip.
    "extract_text",               # shuffle-free markup -> text
    "langid_mixture_sample",      # scores join + prefix-sum sample
    "mjpeg_avi_frame_dhash",      # RIFF walk + baseline JPEG map
    # round-10/11 additions (VERDICT r10 ask #7): the mp4 twin is the
    # same scan-bound stbl-walk + JPEG map as the AVI row (frames/doc
    # x docs), the boundary reports are header-walk classify + one
    # map-side-combined groupBy, the arithmetic roundtrip is QM-coder
    # map work (jpeg_block_roundtrip's claim, heavier per byte), and
    # the FLAC features row is Rice-codec map work like audio_features.
    # The cross-epoch probe's growing-INDEX curve lives in
    # experiments/epoch_dedup_cost.json (30 waves, compaction on/off).
    "mjpeg_mp4_frame_dhash",      # ISO-BMFF stbl walk + JPEG map
    "codec_boundary_report",      # JPEG header classify + groupBy
    "media_boundary_report",      # container header classify + groupBy
    "jpeg_arith_roundtrip",       # QM-coder encode/decode map
    "audio_features_flac",        # FLAC codec roundtrip + features
]

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    from map_reduce_framework_spark import registry
    from map_reduce_framework_spark.session import get_spark

    spark = get_spark("scaling-curves")
    # warm the session so sf0.001 doesn't absorb JVM/codegen startup
    registry.REGISTRY["wc"].fn(spark, SFS[0]).write.format("noop").mode(
        "overwrite"
    ).save()

    results: dict[str, dict] = {}
    for name in QUERIES:
        row: dict[str, float] = {}
        for sf_dir in SFS:
            sf = os.path.basename(sf_dir)
            best = None
            for _ in range(2):
                t0 = time.time()
                # noop sink, NOT count(): count() lets Catalyst prune
                # payload columns and even eliminate duplicate-free left
                # joins, silently measuring a cheaper plan than the one
                # a user materializes (bit part_triangle_counts in r4).
                registry.REGISTRY[name].fn(spark, sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            row[sf] = round(best, 3)
        row["growth_001_to_01"] = round(row["sf0.01"] / row["sf0.001"], 2)
        row["growth_01_to_1"] = round(row["sf0.1"] / row["sf0.01"], 2)
        results[name] = row
        print(name, row, flush=True)

    out = os.path.join(os.path.dirname(__file__), "scaling_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
