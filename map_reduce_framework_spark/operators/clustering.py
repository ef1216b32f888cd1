"""K-means clustering over the embeddings table (Lloyd's algorithm).

The reference has no vector surface; a 100 TB training-data pipeline
clusters embeddings constantly (corpus bucketing, IVF codebook training,
semantic dedup prefiltering). This is Lloyd's algorithm (Lloyd, IEEE
Trans. Inf. Theory 1982) expressed as pure dataflow:

* assignment = broadcast cross join of the (tiny) centroid relation
  against the vector relation + one argmin window -- at scale this is a
  map-only stage (centroids broadcast), linear in |V|;
* update = posexplode to (cluster, pos, component) + one groupBy
  aggregate -- one shuffle of k*dim*parallelism partial sums, NOT the
  raw data (map-side combine does the heavy lifting);
* iterations chain symbolically in one DataFrame plan (no driver
  collect; the plan for ``iters`` rounds is ``iters`` joined subtrees).

Cross-engine determinism (the DuckDB oracle hash-matches exactly):

* input components are fixed-point quantized to 1e-6
  (``floor(x*1e6 + 0.5)/1e6``) -- floor avoids round()'s half-up-vs-
  half-even ambiguity between engines;
* cluster means are computed as exact BIGINT sums of the recovered
  integer mantissas divided once in IEEE double (``s / (n*1e6)``):
  sums < 2^53 stay exact, the single division is correctly rounded in
  both engines, so centroids are bit-identical doubles with no decimal
  casts anywhere;
* squared L2 distance is ``dot(v,v) - 2*dot(v,c) + dot(c,c)`` with the
  same sequential left-to-right dot both sides (see functions/vector.py);
  ties break on cluster id.

Empty clusters drop out (standard Lloyd's behavior) -- both engines
simply lose that centroid row, so the plans stay aligned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vector import as_double, dot

K = 8
ITERS = 2
DIM = 64
SCALE = 1_000_000


def _quantized(embeddings: DataFrame, n_parts: int) -> DataFrame:
    """(vec_id, v): components fixed-point quantized to 1/SCALE."""
    v = F.transform(
        as_double(F.col("embedding")),
        lambda x: F.floor(x * SCALE + F.lit(0.5)) / SCALE,
    )
    return embeddings.repartition(n_parts).select("vec_id", v.alias("v"))


def _assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest centroid per vector by squared L2; ties -> lowest cid."""
    dist = (
        dot(F.col("v"), F.col("v"))
        - 2 * dot(F.col("v"), F.col("cv"))
        + dot(F.col("cv"), F.col("cv"))
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    return (
        vectors.join(F.broadcast(centroids))
        .select("vec_id", "v", "cid", dist.alias("dist"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .drop("rnk")
    )


def _update(assigned: DataFrame) -> DataFrame:
    """New centroid relation (cid, cv) = component-wise mean per cluster,
    via exact integer sums (see module docstring)."""
    mantissa = F.floor(F.col("x") * SCALE + F.lit(0.5)).cast("bigint")
    sums = (
        assigned.select("vec_id", "cid", F.posexplode("v").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(F.sum(mantissa).alias("s"), F.count("*").alias("n"))
    )
    mean = F.col("s") / (F.col("n") * F.lit(float(SCALE)))
    return (
        sums.select("cid", "pos", mean.alias("m"))
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda st: st["m"],
            ).alias("cv")
        )
    )


def kmeans_lloyd(
    embeddings: DataFrame, k: int = K, iters: int = ITERS
) -> DataFrame:
    """``iters`` Lloyd rounds from deterministic seeds (vec_id < k), then
    a final assignment pass. Returns (vec_id, cluster, dist)."""
    try:
        n_parts = int(
            embeddings.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    except Exception:
        n_parts = 32
    vectors = _quantized(embeddings, n_parts)
    cents = vectors.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("v").alias("cv")
    )
    for _ in range(iters):
        cents = _update(_assign(vectors, cents))
    final = _assign(vectors, cents)
    return final.select(
        "vec_id", F.col("cid").alias("cluster"), F.col("dist").alias("dist")
    )


def kmeans_cluster_sizes(embeddings: DataFrame) -> DataFrame:
    """Cluster cardinality + mean squared distance (inertia per cluster) --
    the compact summary a codebook-training job reports."""
    a = kmeans_lloyd(embeddings)
    return (
        a.groupBy("cluster")
        .agg(
            F.count("*").alias("n_vectors"),
            (
                F.sum(F.floor(F.col("dist") * SCALE + F.lit(0.5)).cast("bigint"))
                / (F.count("*") * F.lit(float(SCALE)))
            ).alias("mean_sq_dist"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracles: the same computation unrolled as chained CTEs.
# ---------------------------------------------------------------------------

_E = f"""
        e AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> floor(x*{SCALE} + 0.5)/{SCALE}) AS v
            FROM embeddings
        )"""

_DIST = (
    "list_dot_product({v}, {v}) - 2*list_dot_product({v}, {c})"
    " + list_dot_product({c}, {c})"
)


def _assign_cte(name: str, cents: str) -> str:
    d = _DIST.format(v="e.v", c="c.cv")
    return f"""
        {name}_all AS (
            SELECT e.vec_id, e.v, c.cid, {d} AS dist,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {d}, c.cid
                   ) AS rnk
            FROM e CROSS JOIN {cents} c
        ),
        {name} AS (SELECT vec_id, v, cid, dist FROM {name}_all WHERE rnk = 1)"""


def _update_cte(name: str, assigned: str) -> str:
    return f"""
        {name}_sums AS (
            SELECT cid, pos, CAST(sum(xi) AS BIGINT) AS s, count(*) AS n
            FROM (
                SELECT cid,
                       unnest(list_transform(range(1, {DIM}+1),
                              i -> {{'pos': i,
                                     'xi': CAST(floor(v[i]*{SCALE} + 0.5) AS BIGINT)}}),
                              recursive := true)
                FROM {assigned}
            )
            GROUP BY cid, pos
        ),
        {name} AS (
            SELECT cid, list(s / (n * {SCALE}.0) ORDER BY pos) AS cv
            FROM {name}_sums GROUP BY cid
        )"""


def _kmeans_ctes() -> str:
    parts = [
        _E,
        "c0 AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv"
        f" FROM e WHERE vec_id < {K})",
    ]
    cents = "c0"
    for it in range(ITERS):
        parts.append(_assign_cte(f"a{it}", cents))
        parts.append(_update_cte(f"c{it + 1}", f"a{it}"))
        cents = f"c{it + 1}"
    parts.append(_assign_cte("afinal", cents))
    return "WITH " + ",".join(parts)


ORACLE_SQL: dict[str, str] = {
    "kmeans_clusters": f"""
        {_kmeans_ctes()}
        SELECT vec_id, cid AS cluster, dist FROM afinal
    """,
    "kmeans_cluster_sizes": f"""
        {_kmeans_ctes()}
        SELECT cid AS cluster, count(*) AS n_vectors,
               CAST(sum(CAST(floor(dist*{SCALE} + 0.5) AS BIGINT)) AS BIGINT)
                   / (count(*) * {SCALE}.0) AS mean_sq_dist
        FROM afinal GROUP BY cid
    """,
}
