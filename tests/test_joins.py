"""General-purpose join operators: broadcast vs shuffle equivalence,
inner/left semantics, route invariance."""

import os
import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bubing_ray.ops.joins import broadcast_join, shuffle_join


@pytest.fixture(scope="module")
def tables(ray_session):
    import ray

    rng = np.random.default_rng(11)
    big = pa.table({
        "k": pa.array(rng.integers(0, 50, 2000), type=pa.int64()),
        "x": pa.array(np.arange(2000, dtype=np.int64)),
    })
    small = pa.table({
        "k": pa.array(np.arange(0, 40, dtype=np.int64)),   # 40..49 unmatched
        "y": pa.array(np.arange(100, 140, dtype=np.int64)),
    })
    return (ray.data.from_arrow(big).repartition(5),
            ray.data.from_arrow(small), big, small)


def _sorted(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_broadcast_equals_shuffle_equals_polars(tables):
    import polars as pl

    big_ds, small_ds, big, small = tables
    expect = (pl.from_arrow(big).join(pl.from_arrow(small), on="k")
              .to_pandas())
    a = broadcast_join(big_ds, small_ds, on="k").to_pandas()
    b = shuffle_join(big_ds, small_ds, on="k").to_pandas()
    assert _sorted(a).equals(_sorted(expect))
    assert _sorted(b)[sorted(b.columns)].equals(
        _sorted(expect)[sorted(expect.columns)])


def test_shuffle_join_left_semantics(tables):
    big_ds, small_ds, big, small = tables
    out = shuffle_join(big_ds, small_ds, on="k", how="left").to_pandas()
    assert len(out) == 2000  # every big row survives
    unmatched = out[out["k"] >= 40]
    assert unmatched["y"].isna().all()


def test_shuffle_join_route_invariance(tables):
    big_ds, small_ds, _, _ = tables
    a = shuffle_join(big_ds, small_ds, on="k").to_pandas()
    b = shuffle_join(big_ds, small_ds, on="k", n_routes=3).to_pandas()
    assert _sorted(a).equals(_sorted(b))


@pytest.fixture(scope="module")
def null_tables(ray_session):
    import ray

    left = pa.table({
        "k": pa.array([1, 2, None, 3, None, 4], type=pa.int64()),
        "x": pa.array([10, 20, 30, 40, 50, 60], type=pa.int64()),
    })
    right = pa.table({
        "k": pa.array([2, 3, None, 9], type=pa.int64()),
        "y": pa.array([200, 300, 400, 900], type=pa.int64()),
    })
    return ray.data.from_arrow(left).repartition(3), \
        ray.data.from_arrow(right), left, right


def _duck(left, right, how):
    import duckdb

    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    kw = {"inner": "JOIN", "left": "LEFT JOIN", "full": "FULL JOIN"}[how]
    return con.execute(
        f"SELECT coalesce(l.k, r.k) AS k, x, y FROM l {kw} r ON l.k = r.k"
    ).fetchdf()


@pytest.mark.parametrize("how", ["inner", "left", "full"])
def test_shuffle_join_null_keys_sql_semantics(null_tables, how):
    """NULL keys never match; left/full keep unmatched rows (ANSI SQL,
    checked value-for-value against DuckDB)."""
    lds, rds, left, right = null_tables
    got = shuffle_join(lds, rds, on="k", how=how).to_pandas()
    exp = _duck(left, right, how)
    cols = ["k", "x", "y"]
    assert _sorted(got[cols].astype("float64")).equals(
        _sorted(exp[cols].astype("float64")))


@pytest.mark.parametrize("how", ["inner", "left"])
def test_broadcast_join_null_keys_sql_semantics(null_tables, how):
    lds, rds, left, right = null_tables
    got = broadcast_join(lds, rds, on="k", how=how).to_pandas()
    exp = _duck(left, right, how)
    cols = ["k", "x", "y"]
    assert _sorted(got[cols].astype("float64")).equals(
        _sorted(exp[cols].astype("float64")))


def test_broadcast_join_guard_falls_back_to_shuffle(tables):
    """broadcast_limit=0 forces the shuffle path with identical output;
    how='full' must also route to shuffle."""
    big_ds, small_ds, big, small = tables
    a = broadcast_join(big_ds, small_ds, on="k").to_pandas()
    b = broadcast_join(big_ds, small_ds, on="k",
                       broadcast_limit=0).to_pandas()
    cols = sorted(a.columns)
    assert _sorted(a[cols]).equals(_sorted(b[cols]))
    full = broadcast_join(big_ds, small_ds, on="k", how="full").to_pandas()
    # every big row survives, plus any unmatched small rows
    assert len(full) >= 2000
    assert full[full["k"] >= 40]["y"].isna().all()
    with pytest.raises(ValueError):
        broadcast_join(big_ds, small_ds, on="k", how="cross")


def test_diff_tables_semantics(ray_session):
    """added/removed/changed/same with presence-vs-null distinction and
    duplicate-key rejection."""
    import pyarrow as pa
    import pytest
    import ray as _ray

    from bubing_ray.ops.joins import diff_tables

    left = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                     "v": pa.array(["a", "b", None, "d"])})
    right = pa.table({"k": pa.array([2, 3, 5, 4], pa.int64()),
                      "v": pa.array(["B", None, "e", "d"])})
    out = (diff_tables(_ray.data.from_arrow(left),
                       _ray.data.from_arrow(right), "k", "v")
           .to_pandas().set_index("k")["change"].to_dict())
    # k=3: present on both sides with NULL values -> same (IS NOT
    # DISTINCT FROM), never mistaken for added/removed
    assert out == {1: "removed", 2: "changed", 3: "same",
                   4: "same", 5: "added"}

    dup = pa.table({"k": pa.array([1, 1], pa.int64()),
                    "v": pa.array(["a", "b"])})
    with pytest.raises(Exception, match="duplicate"):
        diff_tables(_ray.data.from_arrow(dup),
                    _ray.data.from_arrow(right), "k", "v").to_pandas()
