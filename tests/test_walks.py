"""Deterministic random walks vs a sequential reference.

The walk selector is pure integer arithmetic over positional-byte-sum
URL seeds, so engine == sequential model == SQL oracle exactly.
"""

import numpy as np
import pyarrow as pa
import ray

from bubing_ray.ops.graph import WALK_STEP_MIX, _url_seed_col, random_walks


def _seed(u: str) -> int:
    return sum(c * (i + 1) for i, c in enumerate(u.encode()))


def _ref(edges, length=3):
    adj = {}
    for s, t in sorted(set(edges)):
        adj.setdefault(s, []).append(t)
    nodes = sorted({u for e in edges for u in e})
    rows = []
    for start in nodes:
        cur, ss = start, _seed(start)
        for t in range(1, length + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            cur = nbrs[(ss * 31 + _seed(cur) + t * WALK_STEP_MIX) % len(nbrs)]
            rows.append((start, t, cur))
    return sorted(rows)


def _run(edges, length=3, nr=None, parts=2):
    tbl = pa.table(
        {
            "src_url": pa.array([a for a, _ in edges]),
            "dst_url": pa.array([b for _, b in edges]),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(parts)
    df = random_walks(ds, length=length, n_routes=nr).to_pandas()
    return sorted(map(tuple, df[["start", "step", "url"]].itertuples(index=False)))


def test_walks_match_reference(ray_session):
    rng = np.random.default_rng(13)
    nodes = [f"http://w{i}.x/p{i % 3}" for i in range(25)]
    edges = [
        (nodes[rng.integers(25)], nodes[rng.integers(25)]) for _ in range(100)
    ]
    assert _run(edges) == _ref(edges)


def test_walks_route_invariant_and_sinks(ray_session):
    # chain into a sink: walks stop early at the sink
    nodes = [f"http://c{i}.x/p" for i in range(6)]
    edges = [(nodes[i], nodes[i + 1]) for i in range(5)]
    exp = _ref(edges, length=4)
    assert _run(edges, length=4, nr=2) == exp
    assert _run(edges, length=4, nr=7, parts=3) == exp
    # the sink node's walk emits no rows
    starts = {r[0] for r in exp}
    assert nodes[5] not in starts


def test_walks_multi_edges_collapse(ray_session):
    # parallel duplicate edges must not change the neighbor indexing
    e1 = [("http://a.x/p", "http://b.x/p"), ("http://a.x/p", "http://c.x/p")]
    e2 = e1 + e1 + e1
    assert _run(e1, length=2) == _run(e2, length=2) == _ref(e1, length=2)
