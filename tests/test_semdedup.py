"""SemDeDup tests: sequential-model equivalence, partitioning
invariance, and the keep/drop witness properties."""

import numpy as np
import pyarrow as pa
import ray

from bubing_ray.ops import dedup
from bubing_ray.ops.simsearch import kmeans_centroids


def _vecs(seed: int = 11, n: int = 60, dim: int = 8, n_groups: int = 5):
    """Clustered unit vectors: n_groups anchor directions, each vector a
    jittered copy of its group anchor (so near-dups exist per group)."""
    rng = np.random.RandomState(seed)
    anchors = rng.randn(n_groups, dim)
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    rows = []
    for i in range(n):
        g = i % n_groups
        jitter = 0.05 if i % 3 else 0.8  # every 3rd vector is far out
        v = anchors[g] + jitter * rng.randn(dim)
        rows.append(v / np.linalg.norm(v))
    return np.arange(n, dtype=np.int64), np.array(rows)


def _table(ids, mat):
    return pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1).astype(np.float32)), mat.shape[1]),
    })


def _run(ids, mat, parts, **kw):
    ds = ray.data.from_arrow(_table(ids, mat)).repartition(parts)
    out = {}
    for b in dedup.semdedup(ds, **kw).iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        for v, c, k in zip(t.column("vec_id").to_pylist(),
                           t.column("cluster").to_pylist(),
                           t.column("keep").to_pylist()):
            out[v] = (c, k)
    return out


def _model(ids, mat, cents, thr):
    """Sequential reference: assign to argmax-cosine centroid, then per
    cluster drop j when some i<j in the cluster has sim >= thr."""
    m = mat.astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    cid = np.argmax(m @ cents.T, axis=1)
    out = {}
    for c in np.unique(cid):
        members = ids[cid == c]
        vecs = m[cid == c]
        order = np.argsort(members)
        members, vecs = members[order], vecs[order]
        for j in range(len(members)):
            sim = vecs[j] @ vecs[:j].T if j else np.empty(0)
            out[int(members[j])] = (int(c), not np.any(sim >= thr))
    return out


def test_semdedup_matches_sequential_model(ray_session):
    ids, mat = _vecs()
    ds = ray.data.from_arrow(_table(ids, mat)).repartition(3)
    cents = kmeans_centroids(ds, n_lists=4, iters=3)
    got = _run(ids, mat, parts=3, threshold_bp=9000, n_clusters=4, iters=3)
    want = _model(ids, mat, cents, 0.9000)
    assert got == want
    assert sum(1 for _, k in got.values() if not k) > 0  # dups exist
    assert sum(1 for _, k in got.values() if k) > 0


def test_semdedup_partitioning_invariance(ray_session):
    ids, mat = _vecs(seed=7)
    a = _run(ids, mat, parts=1, threshold_bp=8500, n_clusters=4)
    b = _run(ids, mat, parts=5, threshold_bp=8500, n_clusters=4)
    assert a == b


def test_semdedup_witness_properties(ray_session):
    """Every dropped vector has an earlier same-cluster witness with
    cosine >= thr; every kept vector has none (exact recheck)."""
    ids, mat = _vecs(seed=23)
    thr = 0.88
    got = _run(ids, mat, parts=4,
               threshold_bp=int(thr * 10000), n_clusters=4)
    m = mat.astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    by_cluster = {}
    for v, (c, k) in got.items():
        by_cluster.setdefault(c, []).append(v)
    for v, (c, keep) in got.items():
        earlier = [u for u in by_cluster[c] if u < v]
        has = any(m[v] @ m[u] >= thr for u in earlier)
        assert keep == (not has), v


def test_semdedup_small_chunk_equals_large(ray_session):
    ids, mat = _vecs(seed=5, n=40)
    a = _run(ids, mat, parts=2, threshold_bp=9000, n_clusters=3, chunk=4)
    b = _run(ids, mat, parts=2, threshold_bp=9000, n_clusters=3, chunk=4096)
    assert a == b


def _fp_model(ids, mat, k, iters, thr_bp):
    """Sequential reference for semdedup_fixed: the same fixed-point
    arithmetic (floor(1000*e) int64, integer Lloyd, floor-double means,
    portable-float cosine) computed with plain loops."""
    q = np.floor(mat.astype(np.float64) * 1000.0).astype(np.int64)
    order = np.argsort(ids)
    cents = q[order[ids[order] < k]]

    def assign(cc):
        d2 = ((q * q).sum(1)[:, None] - 2 * (q @ cc.T)
              + (cc * cc).sum(1)[None, :])
        return np.argmin(d2, axis=1)

    for _ in range(iters):
        a = assign(cents)
        nxt = cents.copy()
        for c in range(len(cents)):
            sel = a == c
            if sel.any():
                nxt[c] = np.floor(q[sel].sum(0).astype(np.float64)
                                  / sel.sum()).astype(np.int64)
        cents = nxt
    a = assign(cents)
    out = {}
    ssq = (q * q).sum(1).astype(np.float64)
    rt = np.sqrt(ssq)
    for c in np.unique(a):
        members = ids[a == c]
        o = np.argsort(members)
        members = members[o]
        vecs = q[a == c][o]
        rts = rt[a == c][o]
        for j in range(len(members)):
            keep = 1
            for i in range(j):
                denom = rts[i] * rts[j]
                cos_bp = (0.0 if denom == 0.0 else
                          np.floor((10000.0 * float(vecs[j] @ vecs[i]))
                                   / denom))
                if cos_bp >= thr_bp:
                    keep = 0
                    break
            out[int(members[j])] = (int(c), keep)
    return out


def test_semdedup_fixed_matches_model_and_partitions(ray_session):
    ids, mat = _vecs(seed=4, n=50, dim=8, n_groups=4)
    want = _fp_model(ids, mat, k=6, iters=2, thr_bp=9000)
    outs = []
    for parts in (1, 4):
        ds = ray.data.from_arrow(_table(ids, mat)).repartition(parts)
        res = dedup.semdedup_fixed(ds, threshold_bp=9000, n_clusters=6,
                                   iters=2)
        got = {}
        for b in res.iter_batches(batch_format="pyarrow"):
            t = pa.table(b)
            for v, c, kp in zip(t.column("vec_id").to_pylist(),
                                t.column("cluster").to_pylist(),
                                t.column("keep").to_pylist()):
                got[v] = (c, kp)
        outs.append(got)
    assert outs[0] == want
    assert outs[1] == want  # partitioning-invariant


def test_semdedup_fixed_drops_near_duplicates(ray_session):
    ids, mat = _vecs(seed=7, n=40, dim=8, n_groups=3)
    mat[13] = mat[3]  # exact duplicate of an earlier vector
    ds = ray.data.from_arrow(_table(ids, mat)).repartition(3)
    res = dedup.semdedup_fixed(ds, threshold_bp=9900, n_clusters=4, iters=2)
    got = {r["vec_id"]: (r["cluster"], r["keep"])
           for b in res.iter_batches(batch_format="pyarrow")
           for r in pa.table(b).to_pylist()}
    assert got[3][1] == 1          # first copy wins
    assert got[13][1] == 0         # exact dup dropped
    assert got[3][0] == got[13][0]  # same cluster


def test_semdedup_fixed_non_unit_norm(ray_session):
    # regression (round-5 review): centroid init must quantize RAW
    # vectors — the normalized-matrix init diverged from the model, the
    # SQL oracle, and the assignment arithmetic whenever embeddings are
    # not unit-norm (only unit-norm testdata kept it green before)
    rng = np.random.default_rng(0)
    mat = 2.0 * rng.standard_normal((40, 8))
    ids = np.arange(40, dtype=np.int64)
    want = _fp_model(ids, mat, k=4, iters=2, thr_bp=9000)
    ds = ray.data.from_arrow(_table(ids, mat)).repartition(3)
    res = dedup.semdedup_fixed(ds, threshold_bp=9000, n_clusters=4, iters=2)
    got = {}
    for b in res.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        for v, c, kp in zip(t.column("vec_id").to_pylist(),
                            t.column("cluster").to_pylist(),
                            t.column("keep").to_pylist()):
            got[v] = (c, kp)
    assert got == want
