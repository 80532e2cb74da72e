"""Distributed page-level PageRank vs a sequential numpy reference
(identical semantics: dangling mass redistribution, multi-edges count)."""

import numpy as np
import pyarrow as pa
import ray

from bubing_ray.ops.graph import page_pagerank


def _ref(edges, iters=3, d=0.85):
    uni = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(uni)}
    n = len(uni)
    outd = np.zeros(n)
    for s, _ in edges:
        outd[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dang = r[outd == 0].sum()
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[idx[t]] += r[idx[s]] / outd[idx[s]]
        r = (1 - d) / n + d * dang / n + d * contrib
    return uni, idx, np.floor(1e7 * r).astype(np.int64)


def test_page_pagerank_matches_reference(ray_session):
    rng = np.random.default_rng(3)
    nodes = [f"http://n{i}.x/p" for i in range(40)]
    edges = [
        (nodes[rng.integers(40)], nodes[rng.integers(40)]) for _ in range(160)
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src_url": pa.array([a for a, _ in edges]),
                "dst_url": pa.array([b for _, b in edges]),
            }
        )
    )
    got = page_pagerank(ds, iters=3).to_pandas().set_index("url")["rank_bp"]
    uni, idx, exp = _ref(edges, iters=3)
    assert len(got) == len(uni)
    assert max(abs(got[u] - exp[idx[u]]) for u in uni) <= 1


def test_page_pagerank_empty(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"src_url": pa.array([], pa.string()),
                  "dst_url": pa.array([], pa.string())})
    )
    assert page_pagerank(ds).count() == 0
