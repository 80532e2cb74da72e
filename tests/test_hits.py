"""Distributed HITS hubs/authorities vs a sequential integer reference.

The engine runs int64 fixed-point arithmetic (graph.HITS_FP mass
scale, L1 normalization as exact floor(raw * fp / total) via the
quotient/remainder split) whose sums are order-independent, so parity
with the sequential model is EXACT — the same property the SQL oracle
for the `hits_scores` query relies on (HUGEINT product there).
"""

import numpy as np
import pyarrow as pa
import ray

from bubing_ray.ops.graph import HITS_FP, _norm_fixed, hits_scores


def _ref(edges, iters=2, fp=HITS_FP):
    uni = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(uni)}
    n = len(uni)
    hub = [max(1, fp // n)] * n
    auth = [0] * n
    for _ in range(iters):
        raw_a = [0] * n
        for s, t in edges:
            raw_a[idx[t]] += hub[idx[s]]
        ta = sum(raw_a)
        if ta == 0:
            return uni, idx, [0] * n, [0] * n
        auth = [x * fp // ta for x in raw_a]
        raw_h = [0] * n
        for s, t in edges:
            raw_h[idx[s]] += auth[idx[t]]
        th = sum(raw_h)
        if th == 0:
            return uni, idx, auth, [0] * n
        hub = [x * fp // th for x in raw_h]
    return uni, idx, auth, hub


def test_norm_fixed_exact():
    """The overflow-safe split equals exact big-int floor(x*fp/t)."""
    rng = np.random.default_rng(7)
    fp = HITS_FP
    for t in (1, 3, 10**6, 9 * 10**12):
        x = rng.integers(0, t + 1, size=64, dtype=np.int64)
        got = _norm_fixed(x, int(t), fp)
        exp = [int(v) * fp // int(t) for v in x]
        assert [int(g) for g in got] == exp


def test_hits_matches_reference(ray_session):
    rng = np.random.default_rng(11)
    nodes = [f"http://h{i}.x/p" for i in range(30)]
    edges = [
        (nodes[rng.integers(30)], nodes[rng.integers(30)]) for _ in range(120)
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src_url": pa.array([a for a, _ in edges]),
                "dst_url": pa.array([b for _, b in edges]),
            }
        )
    )
    got = hits_scores(ds, iters=2).to_pandas().set_index("url")
    uni, idx, auth, hub = _ref(edges, iters=2)
    assert len(got) == len(uni)
    # int fixed-point arithmetic: EXACT parity, no float tolerance
    for u in uni:
        assert int(got.loc[u, "auth_fp"]) == auth[idx[u]]
        assert int(got.loc[u, "hub_fp"]) == hub[idx[u]]


def test_hits_route_invariant(ray_session):
    """Identical output at different route counts (partial-sum grouping
    changes; integer arithmetic makes the result invariant) — and
    sink/source-only nodes score 0 on the missing side."""
    nodes = [f"http://k{i}.x/p" for i in range(10)]
    edges = [(nodes[i], nodes[(i * 3 + 1) % 10]) for i in range(10)] + [
        (nodes[0], nodes[9]),
        (nodes[2], nodes[9]),
    ]
    tbl = pa.table(
        {
            "src_url": pa.array([a for a, _ in edges]),
            "dst_url": pa.array([b for _, b in edges]),
        }
    )
    outs = []
    for nr in (2, 7):
        ds = ray.data.from_arrow(tbl).repartition(nr)
        df = (hits_scores(ds, iters=2, n_routes=nr)
              .to_pandas().sort_values("url").reset_index(drop=True))
        outs.append(df)
    assert outs[0].equals(outs[1])
    uni, idx, auth, hub = _ref(edges, iters=2)
    got = outs[0].set_index("url")
    for u in uni:
        assert int(got.loc[u, "auth_fp"]) == auth[idx[u]]
        assert int(got.loc[u, "hub_fp"]) == hub[idx[u]]


def test_hits_no_edges(ray_session):
    """Edge table routed to an empty result: every score is 0 (guarded
    division) — exercised via a graph whose only edges self-contribute
    nothing after the first normalization is impossible, i.e. an empty
    edge list."""
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src_url": pa.array([], pa.string()),
                "dst_url": pa.array([], pa.string()),
            }
        )
    )
    out = hits_scores(ds, iters=2).to_pandas()
    assert len(out) == 0


def test_host_cocitation_guard_and_counts(ray_session):
    """Hand-checkable co-citation: s1 cites {a,b,c}, s2 cites {a,b},
    s3 cites {a,b} -> (a,b) cocited by 3 sources, (a,c)/(b,c) by 1
    (pruned at min_cocite=2); a portal past the out-degree cap is
    excluded entirely."""
    from bubing_ray.ops.graph import host_cocitation

    edges = []
    for s, dsts in (
        ("s1", ["a", "b", "c"]),
        ("s2", ["a", "b"]),
        ("s3", ["a", "b"]),
        # portal with out-degree 5 > max_out=4: contributes nothing
        ("portal", ["a", "b", "c", "d", "e"]),
    ):
        for d in dsts:
            edges.append((f"http://{s}.x/p", f"http://{d}.x/q"))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src_url": pa.array([a for a, _ in edges]),
                "dst_url": pa.array([b for _, b in edges]),
            }
        )
    )
    out = (host_cocitation(ds, max_out=4, min_cocite=2)
           .to_pandas().sort_values(["host_a", "host_b"])
           .reset_index(drop=True))
    assert len(out) == 1
    assert out.loc[0, "host_a"] == "a.x"
    assert out.loc[0, "host_b"] == "b.x"
    assert int(out.loc[0, "cocite"]) == 3


def test_host_cocitation_route_invariant(ray_session):
    from bubing_ray.ops.graph import host_cocitation

    rng = np.random.default_rng(5)
    edges = [
        (f"http://s{rng.integers(8)}.x/p", f"http://d{rng.integers(12)}.x/q")
        for _ in range(200)
    ]
    tbl = pa.table(
        {
            "src_url": pa.array([a for a, _ in edges]),
            "dst_url": pa.array([b for _, b in edges]),
        }
    )
    outs = []
    for nr in (2, 9):
        ds = ray.data.from_arrow(tbl).repartition(3)
        outs.append(
            host_cocitation(ds, max_out=16, min_cocite=2, n_routes=nr)
            .to_pandas().sort_values(["host_a", "host_b"])
            .reset_index(drop=True))
    assert outs[0].equals(outs[1])


def test_host_triangles_counts(ray_session):
    """K4 on {a,b,c,d} has 4 triangles, each host in 3 of them; an
    attached pendant edge adds no triangle; an over-cap center emits
    no wedges."""
    from bubing_ray.ops.graph import host_triangles

    hosts = ["a", "b", "c", "d"]
    edges = [(x, y) for x in hosts for y in hosts if x < y]
    edges += [("d", "e")]  # pendant
    urls = [(f"http://{s}.x/p", f"http://{t}.x/p") for s, t in edges]
    ds = ray.data.from_arrow(pa.table({
        "src_url": pa.array([a for a, _ in urls]),
        "dst_url": pa.array([b for _, b in urls]),
    }))
    out = (host_triangles(ds, max_deg=16).to_pandas()
           .set_index("host")["triangles"].to_dict())
    assert out == {"a.x": 3, "b.x": 3, "c.x": 3, "d.x": 3}
    # guard: cap below d's degree (4) removes d-centered triangles only
    out2 = (host_triangles(ds, max_deg=3).to_pandas()
            .set_index("host")["triangles"].to_dict())
    assert out2 == {"a.x": 3, "b.x": 3, "c.x": 3}


def test_host_triangles_route_invariant(ray_session):
    from bubing_ray.ops.graph import host_triangles

    rng = np.random.default_rng(23)
    urls = [
        (f"http://t{rng.integers(12)}.x/p", f"http://t{rng.integers(12)}.x/p")
        for _ in range(120)
    ]
    tbl = pa.table({
        "src_url": pa.array([a for a, _ in urls]),
        "dst_url": pa.array([b for _, b in urls]),
    })
    outs = []
    for nr in (2, 9):
        ds = ray.data.from_arrow(tbl).repartition(3)
        outs.append(host_triangles(ds, max_deg=16, n_routes=nr)
                    .to_pandas().sort_values("host")
                    .reset_index(drop=True))
    assert outs[0].equals(outs[1])


def test_hits_more_nodes_than_fp(ray_session):
    """fp smaller than the node count: the init floors to 1 (not 0),
    so scores are still meaningful — exact vs the same-armed reference."""
    nodes = [f"http://f{i}.x/p" for i in range(9)]
    edges = [(nodes[i], nodes[(i + 1) % 9]) for i in range(9)] + [
        (nodes[0], nodes[4]), (nodes[2], nodes[4])]
    ds = ray.data.from_arrow(pa.table({
        "src_url": pa.array([a for a, _ in edges]),
        "dst_url": pa.array([b for _, b in edges]),
    }))
    got = hits_scores(ds, iters=2, fp=4).to_pandas().set_index("url")
    uni, idx, auth, hub = _ref(edges, iters=2, fp=4)
    for u in uni:
        assert int(got.loc[u, "auth_fp"]) == auth[idx[u]]
        assert int(got.loc[u, "hub_fp"]) == hub[idx[u]]
    assert got["auth_fp"].sum() > 0  # not silently all-zero


def test_host_reciprocity_counts(ray_session):
    """a<->b reciprocated; a->c one-way; c->b one-way: a has 2
    out-neighbors 1 reciprocated (5000 bp), b 1/1 (10000), c 1/0."""
    from bubing_ray.ops.graph import host_reciprocity

    pairs = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "b")]
    urls = [(f"http://{s}.x/p", f"http://{t}.x/p") for s, t in pairs]
    ds = ray.data.from_arrow(pa.table({
        "src_url": pa.array([a for a, _ in urls]),
        "dst_url": pa.array([b for _, b in urls]),
    }))
    out = (host_reciprocity(ds).to_pandas()
           .set_index("host").to_dict("index"))
    assert out["a.x"] == {"n_out": 2, "n_recip": 1, "recip_bp": 5000}
    assert out["b.x"] == {"n_out": 1, "n_recip": 1, "recip_bp": 10000}
    assert out["c.x"] == {"n_out": 1, "n_recip": 0, "recip_bp": 0}
