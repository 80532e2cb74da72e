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
