"""Fuzzy (MinHash) decontamination: sequential-model equivalence and
semantic properties (edited test copies flagged, unrelated docs not)."""

import numpy as np
import pyarrow as pa
import ray

from bubing_ray.ops import corpus
from bubing_ray.ops.dedup import (MINHASH_PERMS, _band_rows, minhash_batch)

BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the late afternoon sun")
OTHER = ("completely different content about distributed stream "
         "processing engines shuffling arrow record batches at scale")


def _docs():
    # doc 0 (test, 0 % 5 == 0): BASE; doc 7: light edit of BASE (near-dup
    # of the test doc); doc 3: unrelated; doc 5 (test): OTHER; doc 10
    # (test): short; doc 11: exact copy of OTHER (near-dup of test 5)
    rows = {
        0: BASE,
        3: "totally unrelated words about parquet files and object stores",
        5: OTHER,
        7: BASE.replace("lazy", "sleepy"),
        10: "tiny doc",
        11: OTHER,
        12: "another unrelated piece mentioning robots and politeness",
    }
    return pa.table({
        "doc_id": pa.array(sorted(rows), pa.int64()),
        "text": pa.array([rows[k] for k in sorted(rows)]),
    })


def _model(tbl, mod, bands, min_bp):
    """Sequential reference using the engine's own per-batch kernels on
    ONE batch (the distributed path must match regardless of split)."""
    rows = MINHASH_PERMS // bands
    sig_t = minhash_batch(tbl, 3, True)
    ids = sig_t.column("doc_id").to_numpy()
    sig = np.asarray(sig_t.column("sig").combine_chunks().flatten()
                     ).reshape(-1, MINHASH_PERMS)
    band = _band_rows(sig_t, bands, rows)
    bk = band.column("bucket").to_numpy().reshape(bands, len(ids))
    sentinel = sig[:, 0] == np.uint64(0xFFFFFFFFFFFFFFFF)
    out = {}
    for i, d in enumerate(ids):
        best = 0
        for j, t in enumerate(ids):
            # sentinel (empty-shingle) docs never act as test content
            if t % mod or t == d or sentinel[j]:
                continue
            if any(bk[b, i] == bk[b, j] for b in range(bands)):
                est = int((sig[i] == sig[j]).sum()) * 10_000 // MINHASH_PERMS
                best = max(best, est)
        out[int(d)] = (int(d % mod == 0), best, int(best >= min_bp))
    return out


def _run(tbl, parts, mod, min_bp):
    ds = ray.data.from_arrow(tbl).repartition(parts)
    res = corpus.decontaminate_fuzzy(ds, test_mod=mod, min_bp=min_bp,
                                     portable=True)
    out = {}
    for b in res.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        for d, it, mx, c in zip(t.column("doc_id").to_pylist(),
                                t.column("is_test").to_pylist(),
                                t.column("max_sim_bp").to_pylist(),
                                t.column("contaminated").to_pylist()):
            out[d] = (it, mx, c)
    return out


def test_fuzzy_decon_matches_model(ray_session):
    tbl = _docs()
    for parts in (1, 3):
        got = _run(tbl, parts, mod=5, min_bp=3000)
        want = _model(tbl, 5, 16, 3000)
        assert got == want, parts


def test_fuzzy_decon_flags_edited_copy(ray_session):
    got = _run(_docs(), 2, mod=5, min_bp=3000)
    assert got[7][2] == 1    # light edit of test doc 0
    assert got[11][2] == 1   # exact copy of test doc 5
    assert got[3][2] == 0    # unrelated
    assert got[12][2] == 0
    assert got[0][0] == 1 and got[5][0] == 1  # test flags
    # exact copy estimates full similarity
    assert got[11][1] == 10_000


def test_fuzzy_decon_no_tests_no_flags(ray_session):
    # shift ids so none is divisible by mod -> no test docs, no flags
    base = _docs()
    ids = [i + 1 for i in base.column("doc_id").to_pylist()]
    tbl = base.set_column(0, "doc_id", pa.array(ids, pa.int64()))
    mod = max(ids) + 100
    got = _run(tbl, 2, mod=mod, min_bp=3000)
    assert all(v == (0, 0, 0) for v in got.values())


def test_fuzzy_decon_sentinel_not_test_content(ray_session):
    """Round-4 ADVICE: two trivially short docs must not 'contaminate'
    each other via the all-0xFF sentinel signature."""
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),   # 0 is a test doc
        "text": pa.array(["hi there", "ok then", BASE]),
    })
    got = _run(tbl, 2, mod=5, min_bp=3000)
    assert got[1] == (0, 0, 0)   # short corpus doc: NOT flagged
    assert got[2] == (0, 0, 0)   # real doc, unrelated to any test doc
    assert got[0][0] == 1        # doc 0 is still reported as test


def test_fuzzy_decon_shuffled_path_equivalence(ray_session):
    """The size-guarded fallback (shuffled band join) must produce the
    exact same output as the broadcast path."""
    tbl = _docs()
    want = _run(tbl, 3, mod=5, min_bp=3000)
    ds = ray.data.from_arrow(tbl).repartition(3)
    res = corpus.decontaminate_fuzzy(ds, test_mod=5, min_bp=3000,
                                     portable=True, broadcast_limit=0)
    got = {}
    for b in res.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        for d, it, mx, c in zip(t.column("doc_id").to_pylist(),
                                t.column("is_test").to_pylist(),
                                t.column("max_sim_bp").to_pylist(),
                                t.column("contaminated").to_pylist()):
            got[d] = (it, mx, c)
    assert got == want
