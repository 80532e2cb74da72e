"""Regression tests for the round-5 second review pass over the ops
modules: edge-input value-exactness fixes in temporal (overlapping
as-of columns, degenerate intervals, null sliding timestamps),
simsearch (deterministic tie-break prune, offset id spaces, real
multiprobe), assoc (null target column), and stats (null HLL group
keys)."""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bubing_ray.ops.assoc import dsir_model
from bubing_ray.ops.simsearch import brute_topk, load_queries, lsh_topk
from bubing_ray.ops.stats import grouped_hll, hll_registers
from bubing_ray.ops.temporal import asof_join, range_join_agg, sliding_agg


def _pd(ds):
    return ds.to_pandas()


def _sorted(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


# ------------------------------------------------------------- temporal


def test_asof_join_overlapping_value_columns(ray_session):
    """Left and right sharing a non-key value column must not crash;
    the right copy is emitted as <name>_right."""
    import ray

    left = pa.table({
        "k": pa.array([1, 1, 2], type=pa.int64()),
        "t": pa.array([10, 20, 10], type=pa.int64()),
        "x": pa.array([100, 200, 300], type=pa.int64()),
    })
    right = pa.table({
        "k": pa.array([1, 1, 2], type=pa.int64()),
        "t": pa.array([5, 15, 50], type=pa.int64()),
        "x": pa.array([-1, -2, -3], type=pa.int64()),
        "rv": pa.array([7, 8, 9], type=pa.int64()),
    })
    out = _pd(asof_join(ray.data.from_arrow(left),
                        ray.data.from_arrow(right), "k", "t"))
    assert sorted(out.columns) == ["k", "rv", "t", "x", "x_right"]
    out = out.sort_values(["k", "t"]).reset_index(drop=True)
    # k=1 t=10 -> right t=5 (x=-1, rv=7); t=20 -> right t=15 (-2, 8);
    # k=2 t=10 -> no right row at or before -> nulls
    assert out["x"].tolist() == [100, 200, 300]  # left x untouched
    assert out["x_right"].fillna(0).tolist() == [-1, -2, 0]
    assert out["rv"].fillna(0).tolist() == [7, 8, 0]


def test_range_join_agg_degenerate_interval_is_zero(ray_session):
    """end <= start matches nothing in SQL: counts are 0, never the
    negative two-probe difference."""
    import ray

    intervals = pa.table({
        "k": pa.array([1, 1, 1], type=pa.int64()),
        "iid": pa.array([0, 1, 2], type=pa.int64()),
        "start": pa.array([10, 10, 0], type=pa.int64()),
        "end": pa.array([0, 10, 10], type=pa.int64()),  # inverted, empty, valid
    })
    points = pa.table({
        "k": pa.array([1] * 5, type=pa.int64()),
        "ts": pa.array([1, 3, 5, 7, 9], type=pa.int64()),
    })
    out = _pd(range_join_agg(
        ray.data.from_arrow(intervals), ray.data.from_arrow(points),
        "k", "start", "end", "ts",
    )).sort_values("iid").reset_index(drop=True)
    assert out["n_points"].tolist() == [0, 0, 5]
    assert out["sum_val"].tolist() == [0, 0, 0]


def test_sliding_agg_null_ts_dropped(ray_session):
    """A null ts belongs to no window; it must not NaN-poison the
    batch's w_start dtype."""
    import ray

    t = pa.table({
        "ts": pa.array([100, 250, None, 900, None], type=pa.int64()),
        "u": pa.array(["a", "a", "a", "b", "b"]),
    })
    t_clean = t.filter(pa.compute.is_valid(t.column("ts")))
    got = _sorted(_pd(sliding_agg(
        ray.data.from_arrow(t), "ts", window_us=200, slide_us=100, by="u")))
    want = _sorted(_pd(sliding_agg(
        ray.data.from_arrow(t_clean), "ts", window_us=200, slide_us=100,
        by="u")))
    pd.testing.assert_frame_equal(got, want)
    assert str(got["w_start"].dtype) == "int64"


# ------------------------------------------------------------ simsearch


def _emb_table(ids, mat):
    return pa.table({
        "vec_id": pa.array(np.asarray(ids, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              type=pa.list_(pa.float64())),
    })


def test_brute_topk_tie_break_is_lowest_id(ray_session):
    """Many candidates tied at the batch-local kth similarity: the
    per-batch prune must keep the LOWEST neighbor ids (the documented
    total order), not an argpartition-arbitrary subset."""
    import ray

    dim = 4
    q = np.zeros((1, dim))
    q[0, 0] = 1.0
    # id 0 is the query; ids 10..29 all share the query's direction
    ids = [0] + list(range(10, 30))
    mat = np.vstack([q] + [q] * 20)
    ds = ray.data.from_arrow(_emb_table(ids, mat))
    out = _pd(brute_topk(ds, n_queries=1, k=3)).sort_values("rank")
    assert out["neighbor_id"].tolist() == [0, 10, 11]


def test_load_queries_offset_id_space(ray_session):
    """'n lowest ids' must hold for id spaces that do not start at 0."""
    import ray

    rng = np.random.default_rng(3)
    ids = np.arange(1000, 1010)
    mat = rng.standard_normal((10, 8))
    ds = ray.data.from_arrow(_emb_table(ids, mat))
    qids, qmat = load_queries(ds, 4)
    assert qids.tolist() == [1000, 1001, 1002, 1003]
    assert qmat.shape == (4, 8)


def test_lsh_multiprobe_widens_recall(ray_session):
    """multiprobe=2 probes hamming<=2 buckets: recall vs brute-force is
    monotone in multiprobe (it was silently a no-op for values > 1)."""
    import ray

    rng = np.random.default_rng(11)
    n, dim, k = 300, 16, 5
    mat = rng.standard_normal((n, dim))
    tbl = _emb_table(np.arange(n), mat)

    def recall(mp):
        ds = ray.data.from_arrow(tbl)
        exact = _pd(brute_topk(ds, n_queries=4, k=k))
        approx = _pd(lsh_topk(ray.data.from_arrow(tbl), n_queries=4, k=k,
                              multiprobe=mp))
        e = set(map(tuple, exact[["query_id", "neighbor_id"]].values))
        a = set(map(tuple, approx[["query_id", "neighbor_id"]].values))
        return len(e & a) / len(e)

    r1, r2 = recall(1), recall(2)
    assert r2 >= r1


# ---------------------------------------------------------------- assoc


def test_dsir_model_null_target_col(ray_session):
    """A null target_col row is 'not the target' — it must not null the
    whole batch's group sums (the silent object-array corruption)."""
    import ray

    texts = ["the cat sat", "the dog ran", "a cat ran fast"]
    langs = ["en", None, "fr"]
    t = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                  "text": pa.array(texts), "lang": pa.array(langs)})
    # same rows with the null replaced by a non-target literal: the
    # model must be identical
    t2 = t.set_column(2, "lang", pa.array(["en", "zz", "fr"]))
    bt, br = dsir_model(ray.data.from_arrow(t))
    bt2, br2 = dsir_model(ray.data.from_arrow(t2))
    np.testing.assert_array_equal(bt, bt2)
    np.testing.assert_array_equal(br, br2)
    assert br.sum() > 0 and bt.sum() > 0


# ---------------------------------------------------------------- stats


def test_grouped_hll_keeps_null_key_group(ray_session):
    """SQL GROUP BY keeps a NULL-key group; its registers must equal
    the global sketch of that group's values."""
    import ray

    rng = np.random.default_rng(5)
    keys = pa.array(["a", "b", None, None, "a", None] * 50)
    vals = pa.array(rng.integers(0, 10_000, 300), type=pa.int64())
    t = pa.table({"k": keys, "v": vals})
    got = _pd(grouped_hll(ray.data.from_arrow(t), "k", "v"))
    null_rows = got[got["k"].isna()]
    assert len(null_rows) > 0
    null_vals = t.filter(pa.compute.is_null(t.column("k")))
    want = _pd(hll_registers(
        ray.data.from_arrow(null_vals), "v"))
    got_set = set(map(tuple, null_rows[["register", "rho"]].values))
    want_set = set(map(tuple, want[["register", "rho"]].values))
    assert got_set == want_set
