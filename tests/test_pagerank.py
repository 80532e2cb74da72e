"""Distributed page-level PageRank vs a sequential integer reference.

The engine runs int64 fixed-point arithmetic (graph.PR_FP mass scale,
share = rank // outd, damping as pct * x // 100) whose sums are
order-independent, so parity with the sequential model is EXACT — the
same property the SQL oracle for the `page_pagerank` query relies on.
"""

import numpy as np
import pyarrow as pa
import ray

from bubing_ray.ops.graph import PR_FP, page_pagerank


def _ref(edges, iters=3, d_pct=85, rank_scale=10_000_000):
    uni = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(uni)}
    n = len(uni)
    outd = [0] * n
    for s, _ in edges:
        outd[idx[s]] += 1
    r = [PR_FP // n] * n
    for _ in range(iters):
        dang = sum(r[i] for i in range(n) if outd[i] == 0)
        contrib = [0] * n
        for s, t in edges:
            contrib[idx[t]] += r[idx[s]] // outd[idx[s]]
        base = ((100 - d_pct) * PR_FP) // (100 * n) + (d_pct * dang) // (100 * n)
        r = [base + (d_pct * c) // 100 for c in contrib]
    return uni, idx, [x // (PR_FP // rank_scale) for x in r]


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
    # int fixed-point arithmetic: EXACT parity, no float tolerance
    assert all(int(got[u]) == exp[idx[u]] for u in uni)


def test_page_pagerank_route_invariant(ray_session):
    """Identical output at different route counts (partial-sum grouping
    changes; integer arithmetic makes the result invariant)."""
    nodes = [f"http://m{i}.x/p" for i in range(12)]
    edges = [(nodes[i], nodes[(i * 5 + 1) % 12]) for i in range(12)] + [
        (nodes[0], nodes[7]), (nodes[3], nodes[7])
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src_url": pa.array([a for a, _ in edges]),
                "dst_url": pa.array([b for _, b in edges]),
            }
        )
    )
    a = page_pagerank(ds, iters=2, n_routes=2).to_pandas().sort_values("url")
    b = page_pagerank(ds, iters=2, n_routes=16).to_pandas().sort_values("url")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_page_pagerank_multiblock_dangling(ray_session):
    """Regression: dangling mass must be summed across ALL rank blocks.

    The per-block dangling partials are one-row tables that iter_batches
    coalesces into a single batch; the driver once read only row [0] and
    silently dropped every other block's dangling mass.  Dangling node
    urls here sort LAST (zz…) so after the sorted groupby they land in
    the final block, never the first."""
    nodes = [f"http://a{i:02d}.x/p" for i in range(30)]
    dangling = [f"http://zz{i:02d}.x/p" for i in range(10)]
    # every named node links to the next and to one dangling sink
    edges = [(nodes[i], nodes[(i + 1) % 30]) for i in range(30)] + [
        (nodes[i], dangling[i % 10]) for i in range(30)
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src_url": pa.array([a for a, _ in edges]),
                "dst_url": pa.array([b for _, b in edges]),
            }
        )
    ).repartition(8)
    got = page_pagerank(ds, iters=2).to_pandas().set_index("url")["rank_bp"]
    uni, idx, exp = _ref(edges, iters=2)
    assert len(got) == len(uni)
    assert all(int(got[u]) == exp[idx[u]] for u in uni)


def test_page_pagerank_empty(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"src_url": pa.array([], pa.string()),
                  "dst_url": pa.array([], pa.string())})
    )
    assert page_pagerank(ds).count() == 0


# ---------------------------------------------------- connected components

def test_connected_components_exact(ray_session):
    import pyarrow as pa
    import ray

    from bubing_ray.ops.graph import connected_components

    # two chains + an isolated self-loop + a diamond
    edges = [("a", "b"), ("b", "c"), ("c", "d"),     # comp a
             ("x", "y"), ("y", "z"),                 # comp x
             ("q", "q"),                             # comp q
             ("m", "n"), ("m", "o"), ("n", "p"), ("o", "p")]  # comp m
    tbl = pa.table({
        "src_host": pa.array([e[0] for e in edges]),
        "dst_host": pa.array([e[1] for e in edges]),
    })
    out = connected_components(ray.data.from_arrow(tbl)).to_pandas()
    got = dict(zip(out["node"], out["component"]))
    expect = {"a": "a", "b": "a", "c": "a", "d": "a",
              "x": "x", "y": "x", "z": "x", "q": "q",
              "m": "m", "n": "m", "o": "m", "p": "m"}
    assert got == expect


def test_connected_components_partition_invariant(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from bubing_ray.ops.graph import connected_components

    # ring of 40 nodes (diameter 20) exercises multi-iteration converge
    n = 40
    names = [f"h{i:03d}" for i in range(n)]
    tbl = pa.table({
        "src_host": pa.array(names),
        "dst_host": pa.array([names[(i + 1) % n] for i in range(n)]),
    })
    ds = ray.data.from_arrow(tbl)
    a = connected_components(ds).to_pandas().sort_values("node") \
        .reset_index(drop=True)
    b = connected_components(ds.repartition(7), n_routes=5).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert a.equals(b)
    assert set(a["component"]) == {"h000"}
    assert len(a) == n
