"""Aggregation / sketch operators — the counters & distribution stats
of the reference rebuilt as partial-combine pipelines.

BUbiNG keeps global atomic counters and `SummaryStats` distributions
(frontier/Frontier.java:343-392) plus a 40-bin log download-speed
histogram (frontier/StatsThread.java); here each becomes a
``map_batches`` partial (one small row per batch) followed by a driver
combine — the shuffle carries O(batches) rows, never O(data).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa


def _collect(ds) -> pa.Table:
    if isinstance(ds, pa.Table):
        return ds
    return pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )


def summary_stats(ds, col: str) -> dict:
    """count/sum/min/max/mean/variance of a numeric column — algebraic
    partials (count, sum, sum2, min, max) combined on the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        if len(x) == 0:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "s": pa.array([0.0]), "s2": pa.array([0.0]),
                             "mn": pa.array([np.inf]), "mx": pa.array([-np.inf])})
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "s": pa.array([float(x.sum())]),
                "s2": pa.array([float((x * x).sum())]),
                "mn": pa.array([float(x.min())]),
                "mx": pa.array([float(x.max())]),
            }
        )

    t = _collect(ds.map_batches(partial, batch_format="pyarrow"))
    n = int(pa.compute.sum(t.column("n")).as_py() or 0)
    if n == 0:
        return {"count": 0}
    s = float(pa.compute.sum(t.column("s")).as_py())
    s2 = float(pa.compute.sum(t.column("s2")).as_py())
    return {
        "count": n,
        "sum": s,
        "min": float(pa.compute.min(t.column("mn")).as_py()),
        "max": float(pa.compute.max(t.column("mx")).as_py()),
        "mean": s / n,
        "variance": max(0.0, s2 / n - (s / n) ** 2),
    }


def log2_histogram(ds, col: str):
    """Bucket counts of floor(log2(x)) for x > 0 (the speedDist
    analogue, Frontier.java:390-392). Returns a Dataset (bucket, n)."""

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[np.isfinite(x) & (x > 0)]
        b = np.floor(np.log2(x)).astype(np.int64)
        uniq, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(uniq), "n": pa.array(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n"))
    )
    return g.map_batches(
        lambda t: pa.table({"bucket": t.column("bucket"), "n": t.column("sum(n)")}),
        batch_format="pyarrow",
    )


def grouped_agg(ds, keys: list[str], col: str):
    """Q1-style wide aggregation: per key-combination count, sum, min,
    max of ``col`` — per-batch polars partials (count/sum/min/max are
    all algebraic), then a small groupby combine."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(keys + [col]))
        return (
            df.group_by(keys)
            .agg(
                pl.len().cast(pl.Int64).alias("pn"),
                pl.col(col).sum().alias("ps"),
                pl.col(col).min().alias("pmn"),
                pl.col(col).max().alias("pmx"),
            )
            .to_arrow()
        )

    def combine(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        out = df.group_by(keys).agg(
            pl.col("pn").sum().alias("n_rows"),
            pl.col("ps").sum().alias(f"sum_{col}"),
            pl.col("pmn").min().alias(f"min_{col}"),
            pl.col("pmx").max().alias(f"max_{col}"),
        )
        return out.to_arrow()

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .map_groups(combine, batch_format="pyarrow")
    )
