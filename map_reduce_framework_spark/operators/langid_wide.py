"""Wide-DIM language-ID: the fastText-regime scale path (VERDICT r9
ask #4).

The registered langid operators (operators/langid.py) materialize the
hashed-char-3-gram features as DIM+1 *named columns* and train all
classes in one scalar aggregate -- the right shape at DIM=16, where
the whole model is ~85 scalars and the DuckDB oracle can replay the
training trajectory as unrolled CTEs. It is the WRONG shape at
fastText scale (DIM in the thousands to millions, r9's capacity
ladder showed DIM is the accuracy lever): a 5 x (DIM+1)-column scalar
aggregate at DIM=4096 is ~20k aggregate buffers per row, and the
SQL-literal weight vectors stop being printable.

This module re-expresses the SAME quantized trainer with vector-shaped
plumbing that scales in DIM instead of exploding in columns:

* features are ONE ``array<bigint>`` column (length DIM+1, 1e-6 fixed
  point, bucket rule and quantization IDENTICAL to ``_lid_features``:
  bucket = int(md5('lid:'||gram)[:15 hex],16) % DIM, share quantized
  ``floor((cnt/ng)*1e6+0.5)``), computed in ONE Arrow pass with a
  per-batch gram memo -- O(n_grams + DIM) per doc, not O(n_grams*DIM)
  like the per-bucket FILTER scan;
* each training iteration is ONE ``mapInPandas`` pass emitting
  per-partition integer gradient PARTIAL SUMS -- int64 matmuls over
  bounded chunks (``_MM_CHUNK`` rows, each chunk partial <= ~6.6e16,
  exact by construction) summed into Python-int accumulators that
  cannot wrap, flushed every ``_FLUSH_ROWS`` rows so every emitted
  LongType partial is provably < 2^63 on partitions of ANY size
  (ADVICE r10 #2) -- plus quantized NLL sums; the driver combines
  the bounded partial row-groups with exact Python-int arithmetic --
  the map-side-combine shape, with the collect bounded by MODEL size
  (|langs| x (DIM+1) ints per group), never data;
* the nonlinearities go through CPython ``math.exp`` / ``math.log``
  row-at-a-time on the partial-sum path (a few thousand calls per
  iteration) so the quantized trajectory is reproducible bit-for-bit
  by an independent pure-Python twin (tests/test_round10_ops.py pins
  it, the BPE pattern) -- and, at DIM=16, equals the JVM trainer's
  committed trace exactly (the cross-implementation pin).

Registered surface: ``langid_scores_wide`` (DIM={dim}) -- rows-only by
design: the unrolled-CTE oracle at this width would be megabytes of
SQL; the independent-Python pin plus the DIM=16 equality against the
hash-exact narrow trainer carry the correctness argument instead.
``experiments/langid_dim_scale.py`` measures per-iteration wall vs DIM
(1k/4k included); SCALE.md records the scaling rule.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .langid import LID_ITERS, LID_LANGS, LID_LR, LID_SEED, _S

#: The registered wide configuration -- 16x the oracle-exact DIM=16
#: twin, well out of the collision-starved regime the capacity ladder
#: mapped (accuracy saturates at 1.0 from DIM=8 on the planted corpus).
WIDE_DIM = 256

__doc__ = __doc__.format(dim=WIDE_DIM)


def _bucket(gram: str, dim: int) -> int:
    """The narrow path's bucket rule, verbatim: first 15 hex chars of
    md5('lid:'||gram) as an integer, mod dim (langid.py:_lid_features
    CONV(SUBSTRING(MD5(...),1,15),16,10))."""
    return int(
        hashlib.md5(f"{LID_SEED}:{gram}".encode()).hexdigest()[:15], 16
    ) % dim


def _features_row(text: str, dim: int, memo: dict, ngram: int = 3) -> list:
    """One doc's quantized feature vector [xq0..xq_dim]: xq0 = bias
    (1e6); xq_{j+1} = floor((cnt_j/ng)*1e6+0.5) -- float ops in the
    narrow path's exact order, so DIM=16 reproduces the JVM features
    bit-for-bit."""
    t = text or ""
    ng = max(len(t) - (ngram - 1), 0)
    counts = [0] * dim
    for i in range(ng):
        g = t[i : i + ngram]
        b = memo.get(g)
        if b is None:
            b = _bucket(g, dim)
            memo[g] = b
        counts[b] += 1
    row = [0] * (dim + 1)
    row[0] = _S
    if ng:
        for j, c in enumerate(counts):
            if c:
                row[j + 1] = math.floor((c / ng) * 1.0e6 + 0.5)
    return row


def wide_features(
    documents: DataFrame, dim: int = WIDE_DIM, ngram: int = 3
) -> DataFrame:
    """(doc_id, lang, xq array<bigint> of length dim+1): the feature
    relation as ONE vector column -- the shape that survives DIM=2M.
    One Arrow pass, per-batch gram memo, no shuffle beyond the
    single-file-scan spread."""
    import numpy as np  # noqa: F401  (documents the Arrow batch dep)

    from .text_analysis import _fan_out

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("xq", ArrayType(LongType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for pdf in batches:
            out = {"doc_id": [], "lang": [], "xq": []}
            for doc_id, lang, text in zip(
                pdf["doc_id"], pdf["lang"], pdf["text"]
            ):
                out["doc_id"].append(doc_id)
                out["lang"].append(lang)
                out["xq"].append(
                    _features_row(str(text) if text is not None else "",
                                  dim, memo, ngram)
                )
            yield pd.DataFrame(out)

    base = documents.select("doc_id", "lang", "text")
    return _fan_out(base).mapInPandas(
        run, schema=schema
    )


#: Rows per int64 matmul chunk: chunk partial <= _MM_CHUNK * 1e12
#: ~ 6.6e16, three orders of magnitude under 2^63 -- the matmul is
#: exact, overflow structurally impossible (ADVICE r10 #2).
_MM_CHUNK = 65536

#: Rows per emitted partial row-group: every LongType gradient value
#: leaving the executor is < _FLUSH_ROWS * 1e12 = 4e18 < 2^63, so a
#: partition of ANY size stays exact -- it just emits more groups.
_FLUSH_ROWS = 4_000_000


def _pq_from_dot(dot: int) -> int:
    """Quantized sigmoid under integer weights -- the narrow trainer's
    exact rule (z = dot/1e12 in double, pq = floor(1e6/(1+exp(-z)) +
    0.5)), evaluated by CPython libm."""
    z = float(dot) / 1.0e12
    return math.floor(float(_S) / (1.0 + math.exp(-z)) + 0.5)


def _nll_q(pq: int, is_y: bool) -> int:
    """Quantized per-row NLL -- the narrow trainer's rule verbatim."""
    pc = float(min(max(pq, 1), _S - 1)) / 1.0e6
    return math.floor(-math.log(pc if is_y else 1.0 - pc) * 1.0e6 + 0.5)


def wide_train_trace(
    documents: DataFrame,
    iters: int = LID_ITERS,
    lr: float = LID_LR,
    *,
    dim: int = WIDE_DIM,
    ngram: int = 3,
) -> tuple[list, dict]:
    """The one-vs-rest trainer at vector width: returns (trace_rows,
    weights) with the SAME quantized semantics as
    langid.langid_train_trace -- at dim=16 the two traces are equal
    bit-for-bit (pinned). Per iteration: one mapInPandas pass emits
    per-partition exact-integer gradient/NLL partials; the driver
    combine is |partitions| x |langs| rows of model-sized arrays."""
    import numpy as np

    feats = wide_features(documents, dim=dim, ngram=ngram)
    feats = feats.persist()
    feats.count()  # materialize the Arrow feature pass once
    try:
        w = {l: [0] * (dim + 1) for l in LID_LANGS}
        rows: list = []
        part_schema = StructType(
            [
                StructField("lang", StringType()),
                StructField("grad", ArrayType(LongType())),
                StructField("nll", LongType()),
                StructField("n", LongType()),
            ]
        )
        for t in range(1, iters + 1):
            w_mat = {
                l: np.asarray(w[l], dtype=np.int64) for l in LID_LANGS
            }

            def run(batches, _w=w_mat):
                # Map-side combine with EXACT integer accumulation
                # (ADVICE r10 #2): per-row terms |(pq-y)*xq| <= 1e12
                # bound a single row only -- a partition beyond ~9.2M
                # rows would silently wrap an int64 accumulator. So:
                # each int64 matmul covers <= _MM_CHUNK rows (bounded
                # exact: _MM_CHUNK * 1e12 << 2^63), chunk partials sum
                # into PYTHON-INT accumulators (arbitrary precision,
                # never wrap), and the partial row-set is flushed every
                # _FLUSH_ROWS rows so every emitted LongType value is
                # provably < _FLUSH_ROWS * 1e12 < 2^63. The driver sums
                # across row-groups exactly as across partitions --
                # integer sums are associative, trajectory unchanged.
                grads = {l: [0] * (dim + 1) for l in LID_LANGS}
                nlls = {l: 0 for l in LID_LANGS}
                n = 0

                def emit():
                    return pd.DataFrame(
                        {
                            "lang": list(LID_LANGS),
                            "grad": [list(grads[l]) for l in LID_LANGS],
                            "nll": [nlls[l] for l in LID_LANGS],
                            "n": [n] * len(LID_LANGS),
                        }
                    )

                for pdf in batches:
                    if not len(pdf):
                        continue
                    X = np.asarray(
                        [list(x) for x in pdf["xq"]], dtype=np.int64
                    )
                    labels = list(pdf["lang"])
                    n += len(labels)
                    for l in LID_LANGS:
                        gl = grads[l]
                        for s in range(0, len(X), _MM_CHUNK):
                            Xc = X[s : s + _MM_CHUNK]
                            labc = labels[s : s + _MM_CHUNK]
                            dots = Xc @ _w[l]
                            pqs = np.fromiter(
                                (_pq_from_dot(int(d)) for d in dots),
                                dtype=np.int64,
                                count=len(dots),
                            )
                            ys = np.fromiter(
                                ((_S if lab == l else 0) for lab in labc),
                                dtype=np.int64,
                                count=len(labc),
                            )
                            part = (pqs - ys) @ Xc
                            for j, v in enumerate(part):
                                gl[j] += int(v)
                            nlls[l] += sum(
                                _nll_q(int(pq), lab == l)
                                for pq, lab in zip(pqs, labc)
                            )
                    if n >= _FLUSH_ROWS:
                        yield emit()
                        grads = {l: [0] * (dim + 1) for l in LID_LANGS}
                        nlls = {l: 0 for l in LID_LANGS}
                        n = 0
                yield emit()

            partials = feats.mapInPandas(run, schema=part_schema).collect()
            n = sum(r["n"] for r in partials) // max(len(LID_LANGS), 1)
            if n == 0:
                break
            for l in LID_LANGS:
                g = [0] * (dim + 1)
                nll = 0
                for r in partials:
                    if r["lang"] != l:
                        continue
                    nll += int(r["nll"])
                    for j, v in enumerate(r["grad"]):
                        g[j] += int(v)
                w[l] = [
                    wq - math.floor(float(g[j]) * lr / (float(n) * 1e6) + 0.5)
                    for j, wq in enumerate(w[l])
                ]
                avg_loss = float(nll) / (float(n) * 1e6)
                rows.append(
                    (t, l, avg_loss, *[float(wq) / 1e6 for wq in w[l]])
                )
        return rows, w
    finally:
        feats.unpersist()


def langid_scores_wide(
    documents: DataFrame,
    iters: int = LID_ITERS,
    lr: float = LID_LR,
    *,
    dim: int = WIDE_DIM,
    _trained=None,
) -> DataFrame:
    """(doc_id, labeled_lang, pred_lang, confidence, margin_q6) under
    the wide model -- langid.langid_scores' exact output contract
    (argmax with lexicographic tie-break, quantized confidence,
    winner-minus-runner-up margin), scored in the same Arrow pass that
    computes the features. Registered rows-only (see module doc)."""
    import numpy as np

    _rows, w = _trained or wide_train_trace(documents, iters, lr, dim=dim)
    w_mat = {l: np.asarray(w[l], dtype=np.int64) for l in LID_LANGS}

    from .text_analysis import _fan_out

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("labeled_lang", StringType()),
            StructField("pred_lang", StringType()),
            StructField("confidence", DoubleType()),
            StructField("margin_q6", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for pdf in batches:
            out = {
                "doc_id": [],
                "labeled_lang": [],
                "pred_lang": [],
                "confidence": [],
                "margin_q6": [],
            }
            for doc_id, lang, text in zip(
                pdf["doc_id"], pdf["lang"], pdf["text"]
            ):
                x = np.asarray(
                    _features_row(
                        str(text) if text is not None else "", dim, memo
                    ),
                    dtype=np.int64,
                )
                pqs = {
                    l: _pq_from_dot(int(x @ w_mat[l])) for l in LID_LANGS
                }
                best = max(pqs.values())
                pred = next(l for l in LID_LANGS if pqs[l] == best)
                second = sorted(pqs.values(), reverse=True)[1]
                out["doc_id"].append(doc_id)
                out["labeled_lang"].append(lang)
                out["pred_lang"].append(pred)
                out["confidence"].append(float(best) / float(_S))
                out["margin_q6"].append(best - second)
            yield pd.DataFrame(out)

    base = documents.select("doc_id", "lang", "text")
    return _fan_out(base).mapInPandas(
        run, schema=schema
    )


#: Per-process memo of trained wide models, keyed like the narrow
#: trace cache: (sf_dir, parquet fingerprint, iters, lr, dim) under a
#: weakly-referenced session -- bench reps and sweep double-runs train
#: once.
import weakref

_WIDE_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def wide_trained_for_table(
    spark, sf_dir: str, iters: int = LID_ITERS, lr: float = LID_LR,
    dim: int = WIDE_DIM,
):
    from ..sources.io import load_table
    from .langid import _table_fingerprint

    per_session = _WIDE_CACHE.setdefault(spark, {})
    key = (sf_dir, _table_fingerprint(sf_dir), iters, lr, dim)
    if key not in per_session:
        per_session[key] = wide_train_trace(
            load_table(spark, sf_dir, "documents"), iters, lr, dim=dim
        )
    return per_session[key]
