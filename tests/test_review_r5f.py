"""Regression tests for the round-5 sixth review pass (temporal /
windows / stats / joins): SQL null semantics in running aggregates,
window validation, exchange sizing."""

import os
import sys

import polars as pl
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pd(ds):
    import pandas as pd

    if hasattr(ds, "to_pandas") and not isinstance(ds, pd.DataFrame):
        return ds.to_pandas()
    return ds


def test_range_join_agg_null_value_on_last_point(ray_session):
    """A null val_expr value on the last point before a probe must be
    IGNORED (SQL sum skips NULLs), not zero the running total."""
    import ray

    from bubing_ray.ops.temporal import range_join_agg

    intervals = ray.data.from_arrow(pa.table({
        "key": pa.array(["a"], pa.string()),
        "start": pa.array([0], pa.int64()),
        "end": pa.array([3], pa.int64()),
    }))
    points = ray.data.from_arrow(pa.table({
        "key": pa.array(["a", "a"], pa.string()),
        "ts": pa.array([1, 2], pa.int64()),
        "v": pa.array([5, None], pa.int64()),
    }))
    out = _pd(range_join_agg(intervals, points, "key", "start", "end",
                             "ts", val_expr=pl.col("v")))
    assert out["n_points"].tolist() == [2]
    assert out["sum_val"].tolist() == [5]


def test_running_agg_null_value_ignored(ray_session):
    """sum() OVER ignores NULL values; the running total must carry
    through a null row (and be NULL only before the first non-null)."""
    import ray

    from bubing_ray.ops.temporal import running_agg

    t = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([7, 7, 7], pa.int64()),
        "ts": pa.array([10, 20, 30], pa.int64()),
        "v": pa.array([None, 5, None], pa.int64()),
    })
    out = (_pd(running_agg(ray.data.from_arrow(t), key="user_id",
                           ts_col="ts", id_col="event_id",
                           val_expr=pl.col("v")))
           .sort_values("event_id").reset_index(drop=True))
    assert out["run_cnt"].tolist() == [1, 2, 3]
    # leading null -> NULL (SQL sum of zero non-null values), then 5, 5
    assert out["run_sum"].isna().tolist() == [True, False, False]
    assert out["run_sum"].dropna().tolist() == [5, 5]


def test_running_agg_null_ts_sorts_last(ray_session):
    """ORDER BY ts places NULLs LAST in DuckDB; run_cnt must agree."""
    import ray

    from bubing_ray.ops.temporal import running_agg

    t = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([7, 7], pa.int64()),
        "ts": pa.array([None, 5], pa.int64()),
    })
    out = (_pd(running_agg(ray.data.from_arrow(t), key="user_id",
                           ts_col="ts", id_col="event_id"))
           .sort_values("event_id").reset_index(drop=True))
    # null-ts event_id=1 ranks AFTER ts=5 event_id=2
    assert out["run_cnt"].tolist() == [2, 1]


def test_tumbling_agg_rejects_nonpositive_every_us(ray_session):
    import ray

    from bubing_ray.ops.temporal import tumbling_agg

    ds = ray.data.from_arrow(pa.table({
        "ts": pa.array([1, 2], pa.int64()),
        "host": pa.array(["h", "h"], pa.string()),
    }))
    with pytest.raises(ValueError, match="every_us"):
        tumbling_agg(ds, "ts", 0, "host")
    with pytest.raises(ValueError, match="every_us"):
        tumbling_agg(ds, "ts", -5, "host")


def test_co_route_sizes_to_larger_side(ray_session):
    """A tiny left side must not shrink the exchange width when the
    right side is large: nr derives from the max of both counts."""
    import ray

    from bubing_ray.hashing import routes_for
    from bubing_ray.ops.joins import co_route

    small = ray.data.from_arrow(pa.table({
        "k": pa.array([1], pa.int64())}))
    big = ray.data.range(5_000_000).map_batches(
        lambda b: pa.table({"k": b.column("id")}),
        batch_format="pyarrow")
    # range datasets expose a metadata count; the derived nr must match
    # routes_for(5M), not routes_for(1)
    _, _, _, nr = co_route(small, big, "k")
    assert nr == routes_for(5_000_000)
    _, _, _, nr2 = co_route(big, small, "k")
    assert nr2 == nr


def test_grouped_agg_still_matches_duckdb_after_route_shard(ray_session):
    import duckdb
    import ray

    from bubing_ray.ops.stats import grouped_agg

    sf = os.environ.get("GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    path = os.path.join(sf, "lineitem.parquet")
    ds = ray.data.read_parquet(
        path, columns=["l_returnflag", "l_linestatus", "l_quantity"])
    got = (_pd(grouped_agg(ds, ["l_returnflag", "l_linestatus"],
                           "l_quantity"))
           .sort_values(["l_returnflag", "l_linestatus"])
           .reset_index(drop=True))
    ref = duckdb.sql(f"""
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n_rows,
               sum(l_quantity) AS sum_l_quantity,
               min(l_quantity) AS min_l_quantity,
               max(l_quantity) AS max_l_quantity
        FROM read_parquet('{path}')
        GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    assert got["n_rows"].tolist() == ref["n_rows"].tolist()
    assert got["sum_l_quantity"].tolist() == \
        pytest.approx(ref["sum_l_quantity"].tolist())
