"""Round-7 additions: durable checkpointing for iterative/staged ops,
the video/audio modality completion, the training-shard writer, and the
cross-modal dedup union (VERDICT r6 asks #1-#5).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from map_reduce_framework_spark.sources.io import load_table


@pytest.fixture()
def checkpoint_dir(spark, tmp_path):
    """Temporarily configure a RELIABLE checkpoint dir on the shared
    session (reset afterward so other tests keep the local path)."""
    d = str(tmp_path / "ckpt")
    spark.sparkContext.setCheckpointDir(d)
    try:
        yield d
    finally:
        spark.sparkContext.setCheckpointDir(None)


def test_stage_checkpoint_is_reliable_when_dir_configured(
    spark, sf_smoke, checkpoint_dir
):
    """VERDICT r6 ask #4: part_kcore and training_run_manifest run their
    iteration/stage boundaries through reliable checkpoint() when the
    session has a checkpoint dir -- identical results to the local-mode
    run, with the checkpointed RDDs materialized in replicated storage
    (here: rdd-* dirs under the configured path), so an executor loss
    mid-loop recomputes nothing on a real cluster."""
    from map_reduce_framework_spark.operators.graph import part_kcore
    from map_reduce_framework_spark.operators.pipeline import (
        training_run_manifest,
    )

    li = load_table(spark, sf_smoke, "lineitem")
    docs = load_table(spark, sf_smoke, "documents")

    reliable_kcore = {tuple(r) for r in part_kcore(li).collect()}
    reliable_manifest = {
        tuple(r) for r in training_run_manifest(docs).collect()
    }
    ckpt_rdds = glob.glob(os.path.join(checkpoint_dir, "*", "rdd-*"))
    assert ckpt_rdds, "no reliable-checkpoint RDDs were written"

    # identical results without the checkpoint dir (local mode)
    spark.sparkContext.setCheckpointDir(None)
    local_kcore = {tuple(r) for r in part_kcore(li).collect()}
    local_manifest = {
        tuple(r) for r in training_run_manifest(docs).collect()
    }
    assert reliable_kcore == local_kcore
    assert reliable_manifest == local_manifest


def test_cross_modal_dedup_clusters_unions_both_detectors(spark):
    """VERDICT r6 ask #5: the union clustering joins an IMAGE-ONLY
    near-dup pair and a TEXT-ONLY near-dup pair each into one cluster
    with their partner -- recall neither detector has alone.

    * docs 0/1: token-wise md5-first-byte collisions (juliet~quebec,
      mike~dew, clay~fire) make their generated 16x16 images IDENTICAL
      (dHash hamming 0) while their shingle sets are disjoint (text
      Jaccard 0) -- only the image detector pairs them;
    * docs 2/3: 24 tokens vs the same 24 plus one (shingle Jaccard
      22/23 ~ 0.96) -- only the text detector pairs them (different
      token counts scramble the i-mod-n pixel layout, so their images
      are unrelated)."""
    from map_reduce_framework_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from map_reduce_framework_spark.operators.multimodal import (
        cross_modal_dedup_clusters,
        image_dhash_pairs,
    )

    w = [
        "stone", "river", "maple", "cloud", "ember", "frost", "grain",
        "haven", "ridge", "slate", "tulip", "vapor", "wheat", "zesty",
        "amber", "birch", "cedar", "dune", "fjord", "glade", "heron",
        "inlet", "jade", "knoll", "lark",
    ]
    a_txt, b_txt = " ".join(w[:24]), " ".join(w[:25])
    docs = spark.createDataFrame(
        [
            (0, "juliet mike clay", "en", "s", 16),
            (1, "quebec dew fire", "en", "s", 15),
            (2, a_txt, "en", "s", len(a_txt)),
            (3, b_txt, "en", "s", len(b_txt)),
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    # each detector finds exactly its own pair and not the other's
    img = {(r.doc_a, r.doc_b) for r in image_dhash_pairs(docs).collect()}
    txt = {
        (r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs, 0.7).collect()
    }
    assert img == {(0, 1)} and txt == {(2, 3)}
    clusters = {
        r.doc_id: (r.cluster_id, r.cluster_size, r.is_keeper)
        for r in cross_modal_dedup_clusters(docs).collect()
    }
    assert clusters == {
        0: (0, 2, True),
        1: (0, 2, False),
        2: (2, 2, True),
        3: (2, 2, False),
    }


def test_stage_checkpoint_truncates_lineage_both_modes(spark, tmp_path):
    """Both branches of stage_checkpoint cut the logical plan: the
    result's parsed plan no longer contains the upstream join."""
    from map_reduce_framework_spark.session import stage_checkpoint

    df = spark.range(100).alias("a").join(
        spark.range(100).alias("b"), "id"
    )
    local = stage_checkpoint(df, eager=True)
    assert "Join" not in local._jdf.queryExecution().analyzed().toString()
    spark.sparkContext.setCheckpointDir(str(tmp_path / "c"))
    try:
        durable = stage_checkpoint(df, eager=True)
        assert (
            "Join"
            not in durable._jdf.queryExecution().analyzed().toString()
        )
        assert glob.glob(str(tmp_path / "c" / "*" / "rdd-*"))
    finally:
        spark.sparkContext.setCheckpointDir(None)
    assert local.count() == 100 and durable.count() == 100
