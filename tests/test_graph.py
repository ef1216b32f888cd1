"""PageRank behavioral tests: differential against a NumPy power
iteration with the identical quantization discipline, plus structural
sanity (hubs outrank leaves, mass conservation)."""

from __future__ import annotations

import math

import numpy as np

from map_reduce_framework_spark.operators.graph import (
    PR_DAMPING,
    PR_ITERS,
    PR_SCALE,
    part_copurchase_edges,
    part_pagerank,
)


def _hub_lineitem(spark):
    """Orders shaped so part 0 is the hub: it appears in every order,
    each order pairs it with one satellite part."""
    rows = [(o, 0) for o in range(10)] + [(o, o + 1) for o in range(10)]
    return spark.createDataFrame(
        [(ok, pk, 1.0) for ok, pk in rows],
        "l_orderkey bigint, l_partkey bigint, l_quantity double",
    )


def test_pagerank_hub_dominates(spark):
    rows = {r.part: r for r in part_pagerank(_hub_lineitem(spark)).collect()}
    hub = rows[0]
    assert hub.out_degree == 10
    for p, r in rows.items():
        if p != 0:
            assert r.out_degree == 1
            assert hub.pagerank > r.pagerank
    # Teleport + damping conserve rank mass up to quantization (1e-12/node)
    total = sum(r.pagerank for r in rows.values())
    assert math.isclose(total, 1.0, abs_tol=1e-6)


def test_pagerank_matches_numpy_power_iteration(spark, sf_smoke):
    """Same quantized power iteration in NumPy over the same edge set
    must reproduce every rank bit-for-bit."""
    from map_reduce_framework_spark.sources.io import load_table

    li = load_table(spark, sf_smoke, "lineitem")
    edges = [(r.src, r.dst) for r in part_copurchase_edges(li).collect()]
    nodes = sorted({s for s, _ in edges})
    idx = {p: i for i, p in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n, dtype=np.int64)
    for s, _ in edges:
        deg[idx[s]] += 1

    def quant(x):
        return np.floor(x * PR_SCALE + 0.5) / PR_SCALE

    pr = quant(np.full(n, 1.0 / n))
    for _ in range(PR_ITERS):
        s = np.zeros(n, dtype=np.int64)
        for a, b in edges:
            s[idx[b]] += int(
                math.floor(pr[idx[a]] / deg[idx[a]] * PR_SCALE + 0.5)
            )
        pr = quant((1.0 - PR_DAMPING) / n + PR_DAMPING * (s / float(PR_SCALE)))
    got = {r.part: r.pagerank for r in part_pagerank(li).collect()}
    assert len(got) == n
    for p in nodes:
        assert got[p] == pr[idx[p]], f"part {p}: {got[p]} != {pr[idx[p]]}"


def test_pagerank_matches_independent_python(spark, sf_smoke):
    """Independent semantic check (the unrolled-CTE oracle mirrors the
    same expressions): a from-scratch Python power iteration with the
    same 1e-12 quantization over the collected edge list must reproduce
    every rank bit-for-bit."""
    from map_reduce_framework_spark.operators.graph import (
        PR_DAMPING,
        PR_ITERS,
        PR_SCALE,
        part_copurchase_edges,
        part_pagerank,
    )
    from map_reduce_framework_spark.sources.io import load_table

    li = load_table(spark, sf_smoke, "lineitem")
    edges = [
        (r.src, r.dst) for r in part_copurchase_edges(li).collect()
    ]
    got = {
        r.part: (r.out_degree, r.pagerank)
        for r in part_pagerank(li).collect()
    }

    import math

    def quant(x: float) -> float:
        return math.floor(x * PR_SCALE + 0.5) / PR_SCALE

    deg: dict[int, int] = {}
    out_edges: dict[int, list[int]] = {}
    for s, d in edges:
        deg[s] = deg.get(s, 0) + 1
        out_edges.setdefault(s, []).append(d)
    n = len(deg)
    pr = {v: quant(1.0 / n) for v in deg}
    for _ in range(PR_ITERS):
        contrib: dict[int, int] = {}
        for s, ds in out_edges.items():
            c = math.floor(pr[s] / deg[s] * PR_SCALE + 0.5)
            for d in ds:
                contrib[d] = contrib.get(d, 0) + c
        pr = {
            v: quant(
                (1.0 - PR_DAMPING) / n
                + PR_DAMPING * (contrib.get(v, 0) / float(PR_SCALE))
            )
            for v in deg
        }
    want = {v: (deg[v], pr[v]) for v in deg}
    assert got == want
