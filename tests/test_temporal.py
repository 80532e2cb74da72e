"""Temporal operators: as-of join, range-join aggregate, tumbling /
sliding windows, running aggregates, semi/anti joins — vs brute-force
pandas/duckdb models, with null keys, ties, and route invariance."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bubing_ray.ops.joins import semi_join
from bubing_ray.ops.temporal import (
    asof_join,
    range_join_agg,
    running_agg,
    sliding_agg,
    tumbling_agg,
)


def _sorted(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _pd(ds):
    return ds.to_pandas()


@pytest.fixture(scope="module")
def temporal_tables(ray_session):
    import ray

    rng = np.random.default_rng(7)
    n = 3000
    left = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "k": pa.array(rng.integers(0, 40, n), type=pa.int64()),
        "t": pa.array(rng.integers(0, 100_000, n), type=pa.int64()),
    })
    m = 400
    # right covers keys 0..35 plus 41..44: left keys 36..39 have NO right
    # rows (anti-join non-empty) and right keys 41..44 have no left rows
    rk = np.concatenate([rng.integers(0, 36, m - 4),
                         np.array([41, 42, 43, 44])])
    right = pa.table({
        "k": pa.array(rk, type=pa.int64()),
        "t": pa.array(rng.integers(0, 100_000, m), type=pa.int64()),
        "rid": pa.array(np.arange(m, dtype=np.int64)),
        "w": pa.array(rng.integers(0, 1000, m), type=pa.int64()),
    })
    return (ray.data.from_arrow(left).repartition(7),
            ray.data.from_arrow(right).repartition(3), left, right)


def _duck(sql, **frames):
    con = duckdb.connect()
    for name, df in frames.items():
        con.register(name, df)
    return con.execute(sql).fetchdf()


def test_asof_join_matches_duckdb(temporal_tables):
    lds, rds, left, right = temporal_tables
    got = _sorted(_pd(asof_join(lds, rds, key="k", ts_col="t",
                                tiebreak="rid")))
    exp = _duck("""
        WITH r1 AS (
          SELECT k, t, arg_max(rid, rid) AS rid, arg_max(w, rid) AS w
          FROM r GROUP BY k, t
        )
        SELECT l.id, l.k, l.t, r1.rid, r1.w
        FROM l ASOF LEFT JOIN r1 ON l.k = r1.k AND l.t >= r1.t
    """, l=left.to_pandas(), r=right.to_pandas())
    pd.testing.assert_frame_equal(
        got[["id", "k", "t", "rid", "w"]].pipe(_sorted),
        _sorted(exp), check_dtype=False)


def test_asof_join_forward(temporal_tables):
    lds, rds, left, right = temporal_tables
    got = _sorted(_pd(asof_join(lds, rds, key="k", ts_col="t",
                                strategy="forward", tiebreak="rid")))
    # forward: earliest right row with r.t >= l.t; polars forward picks
    # the FIRST match in t order — model it directly in polars
    r1 = (pl.from_arrow(right).sort(["k", "t", "rid"])
          .unique(subset=["k", "t"], keep="last", maintain_order=True))
    exp = (pl.from_arrow(left).sort("t")
           .join_asof(r1.sort("t"), on="t", by="k", strategy="forward")
           .select(["id", "k", "t", "rid", "w"]).to_pandas())
    pd.testing.assert_frame_equal(
        got[["id", "k", "t", "rid", "w"]].pipe(_sorted),
        _sorted(exp), check_dtype=False)


def test_asof_join_null_keys_kept_with_null_right(ray_session):
    import ray

    left = pa.table({
        "id": pa.array([1, 2, 3], type=pa.int64()),
        "k": pa.array([1, None, 1], type=pa.int64()),
        "t": pa.array([10, 10, None], type=pa.int64()),
    })
    right = pa.table({
        "k": pa.array([1, None], type=pa.int64()),
        "t": pa.array([5, 5], type=pa.int64()),
        "v": pa.array([100, 200], type=pa.int64()),
    })
    got = _pd(asof_join(ray.data.from_arrow(left),
                        ray.data.from_arrow(right),
                        key="k", ts_col="t")).set_index("id")
    assert got.loc[1, "v"] == 100          # normal match
    assert pd.isna(got.loc[2, "v"])        # null key never matches
    assert pd.isna(got.loc[3, "v"])        # null ts never matches
    assert len(got) == 3                   # left rows all survive


def test_asof_join_route_invariance(temporal_tables):
    lds, rds, left, right = temporal_tables
    a = _sorted(_pd(asof_join(lds, rds, key="k", ts_col="t",
                              tiebreak="rid", n_routes=2)))
    b = _sorted(_pd(asof_join(lds, rds, key="k", ts_col="t",
                              tiebreak="rid", n_routes=17)))
    pd.testing.assert_frame_equal(a, b)


def test_range_join_agg_matches_sql(temporal_tables):
    lds, rds, left, right = temporal_tables
    iv = left.append_column(
        "t_end", pa.compute.add(left.column("t"), 5_000))
    import ray

    ivds = ray.data.from_arrow(iv).repartition(4)
    got = _pd(range_join_agg(
        ivds, rds, key="k", start_col="t", end_col="t_end", ts_col="t",
        val_expr=pl.col("w").cast(pl.Int64)))
    exp = _duck("""
        SELECT i.id,
          count(r.t) AS n_points,
          CAST(coalesce(sum(r.w), 0) AS BIGINT) AS sum_val
        FROM i LEFT JOIN r
          ON r.k = i.k AND r.t >= i.t AND r.t < i.t_end
        GROUP BY i.id
    """, i=iv.to_pandas(), r=right.to_pandas())
    pd.testing.assert_frame_equal(
        _sorted(got[["id", "n_points", "sum_val"]]),
        _sorted(exp), check_dtype=False)


def test_range_join_agg_null_interval_zero(ray_session):
    import ray

    iv = pa.table({
        "id": pa.array([1, 2], type=pa.int64()),
        "k": pa.array([1, None], type=pa.int64()),
        "s": pa.array([0, 0], type=pa.int64()),
        "e": pa.array([10, 10], type=pa.int64()),
    })
    pts = pa.table({
        "k": pa.array([1], type=pa.int64()),
        "t": pa.array([5], type=pa.int64()),
    })
    got = _pd(range_join_agg(
        ray.data.from_arrow(iv), ray.data.from_arrow(pts),
        key="k", start_col="s", end_col="e", ts_col="t")).set_index("id")
    assert got.loc[1, "n_points"] == 1
    assert got.loc[2, "n_points"] == 0     # null key covers nothing


def test_range_join_boundary_semantics(ray_session):
    """start inclusive, end exclusive, duplicate point timestamps."""
    import ray

    iv = pa.table({
        "id": pa.array([1], type=pa.int64()),
        "k": pa.array([7], type=pa.int64()),
        "s": pa.array([10], type=pa.int64()),
        "e": pa.array([20], type=pa.int64()),
    })
    pts = pa.table({
        "k": pa.array([7] * 6, type=pa.int64()),
        "t": pa.array([9, 10, 10, 15, 19, 20], type=pa.int64()),
    })
    got = _pd(range_join_agg(
        ray.data.from_arrow(iv), ray.data.from_arrow(pts),
        key="k", start_col="s", end_col="e", ts_col="t"))
    assert got["n_points"].iloc[0] == 4    # 10,10,15,19 (not 9, not 20)


def test_tumbling_agg(temporal_tables):
    lds, _, left, _ = temporal_tables
    got = _pd(tumbling_agg(lds, "t", 1000, "k",
                           val_expr=pl.col("id") * 2))
    exp = _duck("""
        SELECT CAST(floor(t / 1000) AS BIGINT) AS w, k,
          count(*) AS n_events,
          CAST(sum(id * 2) AS BIGINT) AS sum_val
        FROM l GROUP BY 1, 2
    """, l=left.to_pandas())
    pd.testing.assert_frame_equal(
        _sorted(got), _sorted(exp), check_dtype=False)


def test_sliding_agg(temporal_tables):
    lds, _, left, _ = temporal_tables
    got = _pd(sliding_agg(lds, "t", 4000, 1000, "k"))
    exp = _duck("""
        SELECT (CAST(floor(t / 1000) AS BIGINT) - i.i) * 1000 AS w_start,
          k, count(*) AS n_events
        FROM l CROSS JOIN (VALUES (0), (1), (2), (3)) AS i(i)
        GROUP BY 1, 2
    """, l=left.to_pandas())
    pd.testing.assert_frame_equal(
        _sorted(got), _sorted(exp), check_dtype=False)
    # every row lands in exactly window/slide windows
    assert int(got["n_events"].sum()) == left.num_rows * 4


def test_running_agg(temporal_tables):
    lds, _, left, _ = temporal_tables
    got = _pd(running_agg(lds, key="k", ts_col="t", id_col="id",
                          val_expr=pl.col("id") + 1))
    exp = _duck("""
        SELECT id, k,
          CAST(count(*) OVER w AS BIGINT) AS run_cnt,
          CAST(sum(id + 1) OVER w AS BIGINT) AS run_sum
        FROM l WINDOW w AS (PARTITION BY k ORDER BY t, id
                            ROWS UNBOUNDED PRECEDING)
    """, l=left.to_pandas())
    pd.testing.assert_frame_equal(
        _sorted(got[["id", "k", "run_cnt", "run_sum"]]),
        _sorted(exp), check_dtype=False)


@pytest.mark.parametrize("anti", [False, True])
@pytest.mark.parametrize("limit", [5_000_000, 0])  # broadcast vs shuffle
def test_semi_anti_join(temporal_tables, anti, limit):
    lds, rds, left, right = temporal_tables
    got = _pd(semi_join(lds, rds, on="k", anti=anti,
                        broadcast_limit=limit))
    op = "NOT EXISTS" if anti else "EXISTS"
    exp = _duck(f"""
        SELECT * FROM l
        WHERE {op} (SELECT 1 FROM r WHERE r.k = l.k)
    """, l=left.to_pandas(), r=right.to_pandas())
    pd.testing.assert_frame_equal(
        _sorted(got), _sorted(exp), check_dtype=False)


@pytest.mark.parametrize("limit", [5_000_000, 0])
def test_semi_anti_join_null_keys(ray_session, limit):
    import ray

    left = pa.table({
        "k": pa.array([1, None, 9], type=pa.int64()),
        "x": pa.array([10, 20, 30], type=pa.int64()),
    })
    right = pa.table({"k": pa.array([1, None], type=pa.int64())})
    lds = ray.data.from_arrow(left)
    rds = ray.data.from_arrow(right)
    semi = _pd(semi_join(lds, rds, on="k", broadcast_limit=limit))
    anti = _pd(semi_join(lds, rds, on="k", anti=True,
                         broadcast_limit=limit))
    assert semi["x"].tolist() == [10]          # null key: EXISTS fails
    assert sorted(anti["x"].tolist()) == [20, 30]  # NOT EXISTS keeps null


def test_funnel_stages_semantics(ray_session):
    """Strict ordering: a click BEFORE the first view does not count;
    a later click does; keys with only non-step events land stage 0."""
    import pyarrow as pa
    import ray as _ray

    from bubing_ray.ops.temporal import funnel_stages

    us = pa.timestamp("us")
    rows = [
        # u1: click@1 (too early), view@2, click@3, purchase@4 -> 3
        (1, 1, "click"), (1, 2, "view"), (1, 3, "click"), (1, 4, "purchase"),
        # u2: view@5, purchase@6 (no click between) -> 1
        (2, 5, "view"), (2, 6, "purchase"),
        # u3: purchase@1, click@2, view@3 (reverse order) -> 1
        (3, 1, "purchase"), (3, 2, "click"), (3, 3, "view"),
        # u4: only signup events -> 0
        (4, 7, "signup"),
        # u5: view@1, click@1 (same ts: NOT strictly after) -> 1
        (5, 1, "view"), (5, 1, "click"),
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], us),
        "event_type": pa.array([r[2] for r in rows]),
    })
    expected = {1: 3, 2: 1, 3: 1, 4: 0, 5: 1}
    for nr in (1, 4):
        ds = _ray.data.from_arrow(tbl).repartition(3)
        out = (funnel_stages(ds, ["view", "click", "purchase"],
                             n_routes=nr)
               .to_pandas().set_index("user_id")["stage"].to_dict())
        assert out == expected


def test_cohort_retention_semantics(ray_session):
    """Hand-checkable triangle: u1 first-active week 0, active weeks
    {0,1,3}; u2 first week 0, active {0}; u3 first week 1, active
    {1,2}. Cells: (0,0)=2, (0,1)=1, (0,3)=1, (1,0)=1, (1,1)=1."""
    import pyarrow as pa
    import ray as _ray

    from bubing_ray.ops.temporal import WEEK_US, cohort_retention

    us = pa.timestamp("us")

    def t(week, off_us=0):
        return week * WEEK_US + off_us

    rows = [
        (1, t(0)), (1, t(0, 5)), (1, t(1)), (1, t(3)),
        (2, t(0, 99)),
        (3, t(1)), (3, t(2, WEEK_US - 1)),
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], us),
    })
    expected = {(0, 0): 2, (0, 1): 1, (0, 3): 1, (1, 0): 1, (1, 1): 1}
    for nr in (1, 4):
        ds = _ray.data.from_arrow(tbl).repartition(3)
        df = cohort_retention(ds, n_routes=nr).to_pandas()
        got = {(int(r.cohort_week), int(r.week_offset)): int(r.n_users)
               for r in df.itertuples()}
        assert got == expected


def test_cohort_retention_pre_epoch_floor(ray_session):
    """Week bucketing is FLOOR division: a pre-epoch event lands in
    week -1, not week 0 (truncation would merge it into week 0)."""
    import pyarrow as pa
    import ray as _ray

    from bubing_ray.ops.temporal import WEEK_US, cohort_retention

    us = pa.timestamp("us")
    tbl = pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([-1, WEEK_US // 2], us),  # week -1, then week 0
    })
    df = cohort_retention(_ray.data.from_arrow(tbl)).to_pandas()
    got = {(int(r.cohort_week), int(r.week_offset)): int(r.n_users)
           for r in df.itertuples()}
    assert got == {(-1, 0): 1, (-1, 1): 1}
