"""group_topk: per-key top-k rank window vs a sequential model."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from bubing_ray.ops import windows


def _tbl(seed=3, n=200, keys=7):
    rng = np.random.RandomState(seed)
    return pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "key": pa.array([f"k{rng.randint(keys)}" for _ in range(n)]),
        "v": pa.array(rng.randint(0, 20, n).astype(np.int64)),  # many ties
    })


def _model(tbl, k, descending=True):
    rows = sorted(
        zip(tbl.column("key").to_pylist(), tbl.column("v").to_pylist(),
            tbl.column("id").to_pylist()),
        key=lambda r: (r[0], -r[1] if descending else r[1], r[2]))
    out, seen = [], {}
    for key, v, i in rows:
        r = seen.get(key, 0) + 1
        seen[key] = r
        if r <= k:
            out.append((key, v, i, r))
    return sorted(out)


def _run(tbl, k, parts, descending=True):
    ds = ray.data.from_arrow(tbl).repartition(parts)
    res = windows.group_topk(ds, key="key", order_col="v", k=k,
                             descending=descending, tie_col="id")
    out = []
    for b in res.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        out += list(zip(t.column("key").to_pylist(),
                        t.column("v").to_pylist(),
                        t.column("id").to_pylist(),
                        t.column("rk").to_pylist()))
    return sorted(out)


def test_group_topk_matches_model(ray_session):
    tbl = _tbl()
    assert _run(tbl, 3, 4) == _model(tbl, 3)


def test_group_topk_partition_invariance(ray_session):
    tbl = _tbl(seed=9)
    assert _run(tbl, 5, 1) == _run(tbl, 5, 6)


def test_group_topk_ascending(ray_session):
    tbl = _tbl(seed=1, n=60, keys=3)
    assert _run(tbl, 2, 3, descending=False) == _model(
        tbl, 2, descending=False)


def test_group_topk_requires_tie_col(ray_session):
    ds = ray.data.from_arrow(_tbl(n=10))
    with pytest.raises(ValueError):
        windows.group_topk(ds, key="key", order_col="v", k=1, tie_col=None)


def _rank_model(tbl, descending=True):
    import pandas as pd

    df = tbl.to_pandas().sort_values(
        ["v", "tie"], ascending=[not descending, True]
    ).reset_index(drop=True)
    df["rank"] = np.arange(1, len(df) + 1)
    return df[["tie", "v", "rank"]].values.tolist()


def _rank_run(tbl, parts, n_buckets=None, descending=True):
    ds = ray.data.from_arrow(tbl).repartition(parts)
    out = windows.global_rank(ds, "v", "tie", descending=descending,
                              n_buckets=n_buckets)
    df = out.to_pandas().sort_values("rank").reset_index(drop=True)
    return df[["tie", "v", "rank"]].values.tolist()


def _rank_tbl(seed=5, n=400, vals=37):
    rng = np.random.default_rng(seed)
    tie = np.arange(n, dtype=np.int64)
    rng.shuffle(tie)
    return pa.table({
        "key": pa.array(np.zeros(n, np.int64)),
        "tie": pa.array(tie),
        "v": pa.array(rng.integers(0, vals, n).astype(np.int64)),
    })


def test_global_rank_matches_model(ray_session):
    tbl = _rank_tbl()
    assert _rank_run(tbl, 4) == _rank_model(tbl)


def test_global_rank_ascending_and_bucket_invariance(ray_session):
    tbl = _rank_tbl(seed=11)
    assert _rank_run(tbl, 3, descending=False) == _rank_model(
        tbl, descending=False)
    # result independent of bucket count and partitioning
    assert _rank_run(tbl, 1, n_buckets=2) == _rank_run(tbl, 8, n_buckets=64)


def _null_tbl(n=120, keys=5, null_every=7, seed=9):
    rng = np.random.RandomState(seed)
    v = rng.randint(0, 15, n).astype(np.float64)
    mask = np.arange(n) % null_every == 0
    return pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "key": pa.array([f"k{rng.randint(keys)}" for _ in range(n)]),
        "v": pa.array([None if m else float(x) for m, x in zip(mask, v)],
                      pa.float64()),
    })


@pytest.mark.parametrize("descending", [True, False])
def test_group_topk_nulls_match_duckdb(ray_session, descending):
    """ADVICE r4: polars sorts place nulls FIRST by default while DuckDB
    ORDER BY places them LAST — a nullable order column must rank like
    the oracle."""
    import duckdb

    tbl = _null_tbl()
    got = _run(tbl, 3, 4, descending=descending)
    d = "DESC" if descending else "ASC"
    exp = duckdb.sql(f"""
        SELECT key, v, id, rk FROM (
          SELECT key, v, id, row_number() OVER
            (PARTITION BY key ORDER BY v {d}, id) AS rk
          FROM tbl) WHERE rk <= 3
    """).fetchall()
    assert got == sorted((k, v, i, r) for k, v, i, r in exp)


@pytest.mark.parametrize("descending", [True, False])
def test_global_rank_nulls_match_duckdb(ray_session, descending):
    import duckdb

    tbl = _null_tbl()
    ds = ray.data.from_arrow(tbl).repartition(4)
    res = windows.global_rank(ds, order_col="v", tie_col="id",
                              descending=descending, n_buckets=3)
    got = sorted(
        (r["id"], r["rank"])
        for b in res.iter_batches(batch_format="pyarrow")
        for r in pa.table(b).to_pylist())
    d = "DESC" if descending else "ASC"
    exp = sorted(map(tuple, duckdb.sql(
        f"SELECT id, row_number() OVER (ORDER BY v {d}, id) FROM tbl"
    ).fetchall()))
    assert got == exp


@pytest.mark.parametrize("descending", [True, False])
def test_global_rank_string_nulls_match_duckdb(ray_session, descending):
    """Round-5 review: bucketize must not searchsorted raw object arrays
    — a STRING order column with nulls raised TypeError (None vs str)
    before the null-masked search."""
    import duckdb

    rng = np.random.default_rng(8)
    n = 120
    words = [None if rng.random() < 0.2 else f"w{rng.integers(30):02d}"
             for _ in range(n)]
    tbl = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "s": pa.array(words, pa.string()),
    })
    ds = ray.data.from_arrow(tbl).repartition(4)
    res = windows.global_rank(ds, order_col="s", tie_col="id",
                              descending=descending, n_buckets=3)
    got = sorted(
        (r["id"], r["rank"])
        for b in res.iter_batches(batch_format="pyarrow")
        for r in pa.table(b).to_pylist())
    d = "DESC" if descending else "ASC"
    exp = sorted(map(tuple, duckdb.sql(
        f"SELECT id, row_number() OVER (ORDER BY s {d}, id) FROM tbl"
    ).fetchall()))
    assert got == exp
