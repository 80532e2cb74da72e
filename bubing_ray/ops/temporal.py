"""Temporal operators Ray Data lacks natively: as-of join, range
(interval) join aggregation, tumbling / sliding windowed aggregates,
and per-key running (cumulative) aggregates.

The reference has no temporal relational operators (its only notion of
time is the politeness DelayQueue, frontier/Workbench.java:42-56);
these are the custom operators the rebuild spec calls for when Ray
Data lacks them, expressed with the repo's standard scale shape:

- Both sides of a temporal join co-shuffle ONCE on a coarse key route
  (``hash(key) % routes_for(n)``) and each route group runs ONE
  vectorized polars kernel covering all its keys.  The shuffle
  guarantee (all rows of a key share its route) makes per-group
  as-of / interval semantics globally correct; cost is ~n_routes
  Python calls, independent of key cardinality.
- Windowed aggregates never shuffle raw rows: each batch partially
  aggregates to (window, group) partial counts/sums, so the final
  ``groupby`` exchanges at most |windows| x |groups| rows per batch.
- The range join returns per-interval AGGREGATES (count / sum), not
  matched pairs: pair output is quadratic under hot keys, while the
  aggregate form is computed from two as-of probes against a per-key
  cumulative series and never materializes a pair.

Partitioning assumption (documented per the spec): one key's rows fit
one task.  Keys are users/hosts/sessions — bounded fan-in at 100 TB;
route width grows with input size via ``hashing.routes_for``.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from ..hashing import derive_routes, route_batch
from .joins import co_route as _co_route


def asof_join(left_ds, right_ds, key: str, ts_col: str,
              strategy: str = "backward",
              tiebreak: str | None = None,
              n_routes: int | None = None):
    """Distributed as-of join: for each left row, attach the columns of
    the single right row with the same ``key`` and the latest
    ``ts_col`` <= the left row's (``backward``; ``forward`` takes the
    earliest >=).  SQL equivalent: DuckDB ``ASOF LEFT JOIN`` on
    ``l.key = r.key AND l.ts >= r.ts``.

    Left rows with no match (or a null key/ts) survive with null right
    columns; right rows with null key/ts never match (ANSI semantics).
    ``tiebreak`` names a right column used to break equal-(key, ts)
    right rows deterministically (the max wins, matching
    ``arg_max(col, tiebreak)`` on a unique-ified SQL side); without it
    the right side must be unique per (key, ts).

    Scale shape: one co-shuffle on the key route, then one
    ``polars.join_asof(by=key)`` per route group — never a per-key
    Python call, never a driver materialization.
    """
    if strategy not in ("backward", "forward"):
        raise ValueError(f"strategy must be backward|forward: {strategy!r}")
    union, lcols, rcols, nr = _co_route(left_ds, right_ds, key, n_routes)
    rdata = [c for c in rcols if c not in (key, ts_col)]
    # Right data columns that collide with a left column are emitted as
    # ``<name>_right`` (the SQL aliasing a user would write); without the
    # rename the final select would ask for the same name twice and
    # polars raises DuplicateError.
    rrename = {c: f"{c}_right" for c in rdata if c in lcols}
    rdata_out = [rrename.get(c, c) for c in rdata]

    def per_route(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        left = df.filter(pl.col("side") == 0).select(lcols)
        right = (
            df.filter(pl.col("side") == 1)
            .select(rcols)
            .drop_nulls([key, ts_col])
            .rename(rrename)
        )
        if tiebreak is not None:
            right = right.sort(
                [key, ts_col, rrename.get(tiebreak, tiebreak)]
            ).unique(
                subset=[key, ts_col], keep="last", maintain_order=True
            )
        # null-key/ts left rows can never match: route them around the
        # join and re-append with null right columns (SQL LEFT semantics)
        matchable = left.drop_nulls([key, ts_col])
        unmatchable = left.filter(
            pl.col(key).is_null() | pl.col(ts_col).is_null()
        )
        out = matchable.sort(ts_col).join_asof(
            right.sort(ts_col),
            on=ts_col,
            by=key,
            strategy=strategy,
            coalesce=True,
        )
        if len(unmatchable):
            out = pl.concat([out, unmatchable.join(
                right.head(0), on=[key, ts_col], how="left")],
                how="vertical_relaxed")
        return out.select(lcols + rdata_out).to_arrow()

    return union.groupby("route").map_groups(per_route, batch_format="pyarrow")


def range_join_agg(intervals_ds, points_ds, key: str,
                   start_col: str, end_col: str, ts_col: str,
                   val_expr: "pl.Expr | None" = None,
                   n_routes: int | None = None):
    """Range (interval) join, aggregate form: for each interval row,
    count the points with the same ``key`` and ``start <= ts < end``,
    plus an optional int64 sum of ``val_expr`` over those points.

    SQL equivalent::

        SELECT i.*, count(p.ts) AS n_points, coalesce(sum(v), 0) AS sum_val
        FROM intervals i LEFT JOIN points p
          ON p.key = i.key AND p.ts >= i.start AND p.ts < i.end
        GROUP BY i.*

    Never materializes a matched pair: within each co-routed group the
    points build a per-key cumulative (count, sum) series and each
    interval makes two as-of probes (``start - 1us`` and ``end - 1us``)
    against it; the window aggregate is the difference.  Cost is two
    ``join_asof`` kernels per route group regardless of how many points
    each interval covers — the quadratic pair blow-up of a naive range
    join under hot keys never exists.

    Timestamps must be integer-representable (epoch-us timestamps or
    int64); ``val_expr`` must produce an exactly-representable integer
    (e.g. ``(pl.col("value") * 100).floor().cast(pl.Int64)``) so the
    cumulative differencing is exact.
    """
    union, icols, pcols, nr = _co_route(intervals_ds, points_ds, key, n_routes)

    def per_route(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        iv_all = df.filter(pl.col("side") == 0).select(icols)
        # null key/start/end intervals can never cover a point: route
        # them around the probes with zero aggregates (SQL LEFT + GROUP
        # BY keeps the interval row with count 0)
        iv = iv_all.drop_nulls([key, start_col, end_col])
        iv_null = iv_all.filter(
            pl.col(key).is_null()
            | pl.col(start_col).is_null()
            | pl.col(end_col).is_null()
        )
        pts = (
            df.filter(pl.col("side") == 1)
            .select(pcols)
            .drop_nulls([key, ts_col])
            .sort([key, ts_col])
        )
        # fill_null BEFORE cum_sum: SQL sum() ignores NULL values (the
        # oracle wraps coalesce(sum(v),0)), but polars cum_sum leaves
        # null at null positions — a null on the last point before a
        # probe would zero the whole running total via the probe's
        # fill_null(0)
        v = (val_expr if val_expr is not None
             else pl.lit(0, dtype=pl.Int64)).fill_null(0).alias("_v")
        cum = pts.with_columns(v).with_columns(
            pl.col(ts_col).cast(pl.Int64).alias("_t"),
            (pl.int_range(pl.len()).over(key) + 1).alias("_c"),
            pl.col("_v").cum_sum().over(key).alias("_s"),
        ).select([key, "_t", "_c", "_s"])
        # duplicate point timestamps within a key: keep the LAST row of
        # each (key, _t) so a probe at _t sees the full cumulative count
        cum = cum.unique(subset=[key, "_t"], keep="last",
                         maintain_order=True)

        def probe(frame: pl.DataFrame, at: pl.Expr, tagc: str, tags: str):
            q = frame.with_columns(at.cast(pl.Int64).alias("_t")).sort("_t")
            out = q.join_asof(
                cum.sort("_t"), on="_t", by=key, strategy="backward"
            )
            return out.with_columns(
                pl.col("_c").fill_null(0).alias(tagc),
                pl.col("_s").fill_null(0).alias(tags),
            ).drop(["_t", "_c", "_s"])

        # ts >= start  <=>  NOT(ts <= start-1);  ts < end  <=>  ts <= end-1
        out = probe(iv, pl.col(start_col).cast(pl.Int64) - 1, "_c0", "_s0")
        out = probe(out, pl.col(end_col).cast(pl.Int64) - 1, "_c1", "_s1")
        # degenerate intervals (end <= start) match nothing in the SQL
        # form; the two-probe difference would go NEGATIVE for
        # end < start, so gate on interval validity explicitly
        nonempty = (
            pl.col(end_col).cast(pl.Int64) > pl.col(start_col).cast(pl.Int64)
        )
        out = out.with_columns(
            pl.when(nonempty).then(pl.col("_c1") - pl.col("_c0"))
            .otherwise(0).alias("n_points"),
            pl.when(nonempty).then(pl.col("_s1") - pl.col("_s0"))
            .otherwise(0).alias("sum_val"),
        ).drop(["_c0", "_s0", "_c1", "_s1"])
        if len(iv_null):
            out = pl.concat([out, iv_null.with_columns(
                pl.lit(0, dtype=pl.Int64).alias("n_points"),
                pl.lit(0, dtype=pl.Int64).alias("sum_val"),
            )], how="vertical_relaxed")
        return out.to_arrow()

    return union.groupby("route").map_groups(per_route, batch_format="pyarrow")


def tumbling_agg(ds, ts_col: str, every_us: int, by: str,
                 val_expr: "pl.Expr | None" = None):
    """Tumbling-window aggregate: count (and optional exact int64 sum)
    per (window, ``by``); the window id is ``epoch_us // every_us``.

    Raw rows never shuffle: each batch pre-aggregates to its own
    (window, by) partials, then one small ``groupby`` sums partials —
    the exchange is at most |windows| x |groups| rows per batch.
    """
    from ray.data.aggregate import Sum

    if every_us <= 0:
        # polars integer // 0 yields null, which would silently collapse
        # every row into one w=null window — config error, fail loudly
        raise ValueError(f"every_us must be positive; got {every_us}")

    v = (val_expr if val_expr is not None
         else pl.lit(0, dtype=pl.Int64)).alias("_v")

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).with_columns(v)
        out = df.group_by(
            (pl.col(ts_col).cast(pl.Int64) // every_us).alias("w"),
            pl.col(by),
        ).agg(
            pl.len().cast(pl.Int64).alias("_n"),
            pl.col("_v").sum().alias("_sv"),
        )
        return out.to_arrow()

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["w", by])
        .aggregate(Sum("_n", alias_name="n_events"),
                   Sum("_sv", alias_name="sum_val"))
    )
    return agg


def sliding_agg(ds, ts_col: str, window_us: int, slide_us: int, by: str):
    """Sliding-window count per (window_start, ``by``): windows are
    ``[w, w + window_us)`` for every ``w`` that is a multiple of
    ``slide_us``.  ``window_us`` must be a multiple of ``slide_us``;
    each row lands in exactly ``window_us // slide_us`` windows.

    Expansion happens inside the batch (np.repeat) and immediately
    collapses to per-batch (window, by) partials, so the k-fold row
    blow-up never reaches the shuffle.
    """
    if window_us % slide_us:
        raise ValueError("window_us must be a multiple of slide_us")
    k = window_us // slide_us
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        # a null ts belongs to no window (no w_start is computable); it
        # must be dropped BEFORE to_numpy, which would otherwise promote
        # the int64 column to float64-with-NaN and drift the w_start
        # dtype between batches
        col = batch.column(ts_col)
        if col.null_count:
            import pyarrow.compute as pc

            batch = batch.filter(pc.is_valid(col))
        if batch.num_rows == 0:
            return (
                pl.from_arrow(batch.select([by]))
                .with_columns(
                    pl.lit(0, dtype=pl.Int64).alias("w_start"),
                    pl.lit(0, dtype=pl.Int64).alias("_n"),
                )
                .select(["w_start", by, "_n"])
                .to_arrow()
            )
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        base = (ts // slide_us) * slide_us
        starts = np.repeat(base, k) - np.tile(
            np.arange(k, dtype=np.int64) * slide_us, len(base)
        )
        groups = np.repeat(
            batch.column(by).to_numpy(zero_copy_only=False), k
        )
        out = pl.DataFrame(
            {"w_start": starts, by: groups}
        ).group_by(["w_start", by]).agg(
            pl.len().cast(pl.Int64).alias("_n")
        )
        return out.to_arrow()

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["w_start", by])
        .aggregate(Sum("_n", alias_name="n_events"))
    )


def running_agg(ds, key: str, ts_col: str, id_col: str,
                val_expr: "pl.Expr | None" = None,
                n_routes: int | None = None):
    """Per-key running (cumulative) aggregate: for each row, the count
    and exact int64 sum of all rows of the same ``key`` at or before it
    in (``ts_col``, ``id_col``) order — the SQL
    ``count(*)/sum(v) OVER (PARTITION BY key ORDER BY ts, id)`` window.

    One coarse-route shuffle, one vectorized ``cum_sum().over(key)``
    per route group (the sessionize shape, ops/windows.py).
    """
    nr = derive_routes(ds, n_routes)
    v = (val_expr if val_expr is not None
         else pl.lit(0, dtype=pl.Int64)).alias("_v")

    def route(batch: pa.Table) -> pa.Table:
        return route_batch(batch, key, nr)

    def per_route(group: pa.Table) -> pa.Table:
        # nulls_last matches the SQL window's default NULL ordering
        # (ORDER BY ts puts NULLs last in DuckDB); run_sum replicates
        # sum() OVER exactly: NULL values are ignored (fill_null before
        # cum_sum), and the total is NULL only while ZERO non-null
        # values have been seen in the partition
        df = (pl.from_arrow(group)
              .sort([key, ts_col, id_col], nulls_last=True)
              .with_columns(v))
        out = df.with_columns(
            (pl.int_range(pl.len()).over(key) + 1).alias("run_cnt"),
            pl.col("_v").fill_null(0).cum_sum().over(key).alias("_rs"),
            pl.col("_v").is_not_null().cast(pl.Int64).cum_sum().over(key)
            .alias("_nn"),
        ).with_columns(
            pl.when(pl.col("_nn") > 0).then(pl.col("_rs"))
            .otherwise(None).alias("run_sum"))
        return out.select([id_col, key, "run_cnt", "run_sum"]).to_arrow()

    return (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby("route")
        .map_groups(per_route, batch_format="pyarrow")
    )


def funnel_stages(ds, steps: list[str], key: str = "user_id",
                  ts_col: str = "ts", type_col: str = "event_type",
                  n_routes: int | None = None):
    """Per-key funnel analysis: how many of the ordered ``steps`` each
    key completed, where step ``i+1`` counts only STRICTLY after the
    completion time of step ``i`` (first-occurrence semantics — the
    classic product funnel over an event log).

    Scale shape: the per-batch prep keeps step-typed rows and collapses
    every other event to one key-existence marker per (batch, key), so
    the single coarse-route shuffle ships only funnel-relevant rows;
    each route group runs ``len(steps)`` vectorized polars join+min
    passes (no per-key Python).  The staged min-after-previous cannot
    use a partial per-batch min (a step-2 event before the key's step-1
    time must not win), which is why the step rows co-route raw — the
    same exactness argument as :func:`asof_join`.

    Returns a Dataset (``key``, ``stage``) with stage in 0..len(steps)
    over every key seen in the input.
    """
    nr = derive_routes(ds, n_routes)
    code_of = {s: i + 1 for i, s in enumerate(steps)}

    def prep(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([key, ts_col, type_col]))
        df = df.with_columns(
            pl.col(type_col).replace_strict(code_of, default=0,
                                            return_dtype=pl.Int8)
            .alias("_c")).drop(type_col)
        step_rows = df.filter(pl.col("_c") > 0)
        markers = (df.filter(pl.col("_c") == 0).unique(subset=[key])
                   .with_columns(pl.lit(None, dtype=df.schema[ts_col])
                                 .alias(ts_col)))
        return pl.concat([step_rows, markers]).to_arrow()

    def route(batch: pa.Table) -> pa.Table:
        return route_batch(batch, key, nr)

    def per_route(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        ts_dtype = df.schema[ts_col]
        cur = (df.select([key]).unique()
               .with_columns(pl.lit(None, dtype=ts_dtype).alias("_t"),
                             pl.lit(0, dtype=pl.Int64).alias("stage")))
        for i in range(1, len(steps) + 1):
            ev = df.filter(pl.col("_c") == i).select([key, ts_col])
            j = (ev.join(cur.select([key, "_t", "stage"]), on=key,
                         how="inner")
                 .filter((pl.col("stage") == i - 1)
                         & (pl.col("_t").is_null()
                            | (pl.col(ts_col) > pl.col("_t")))))
            nxt = j.group_by(key).agg(pl.col(ts_col).min().alias("_nt"))
            cur = (cur.join(nxt, on=key, how="left")
                   .with_columns(
                       pl.when(pl.col("_nt").is_not_null())
                       .then(pl.lit(i, dtype=pl.Int64))
                       .otherwise(pl.col("stage")).alias("stage"),
                       pl.when(pl.col("_nt").is_not_null())
                       .then(pl.col("_nt")).otherwise(pl.col("_t"))
                       .alias("_t"))
                   .drop("_nt"))
        return cur.select([key, "stage"]).to_arrow()

    return (ds.map_batches(prep, batch_format="pyarrow")
            .map_batches(route, batch_format="pyarrow")
            .groupby("route")
            .map_groups(per_route, batch_format="pyarrow"))


#: microseconds per week (cohort bucketing unit)
WEEK_US = 7 * 86_400 * 1_000_000


def cohort_retention(ds, key: str = "user_id", ts_col: str = "ts",
                     n_routes: int | None = None):
    """Cohort retention analysis: keys are bucketed by the week of
    their FIRST event (the cohort), and each (cohort_week,
    week_offset) cell counts how many distinct keys of that cohort
    were active ``offset`` weeks later — the classic retention
    triangle.

    Scale shape: keys co-route once (a key's whole history lands in
    one route group, so its first-event week and its distinct active
    weeks are exact within the group); each group emits pre-counted
    (cohort_week, week_offset, n) partials — key sets are DISJOINT
    across routes, so the final ``groupby.sum`` over the tiny
    (weeks x offsets) cell table is exact without a distinct pass.

    Returns a Dataset (cohort_week, week_offset, n_users), weeks as
    int64 epoch-week numbers (``epoch_us // WEEK_US``).
    """
    from ray.data.aggregate import Sum

    nr = derive_routes(ds, n_routes)

    def prep(batch: pa.Table) -> pa.Table:
        # per-batch shrink: one row per (key, week) — the shuffle
        # carries distinct activity weeks, not raw events
        df = (pl.from_arrow(batch.select([key, ts_col]))
              .with_columns((pl.col(ts_col).cast(pl.Int64) // WEEK_US)
                            .alias("wk")).drop(ts_col)
              .unique(subset=[key, "wk"]))
        return df.to_arrow()

    def route(batch: pa.Table) -> pa.Table:
        return route_batch(batch, key, nr)

    def per_route(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group).unique(subset=[key, "wk"])
        first = df.group_by(key).agg(pl.col("wk").min().alias("cw"))
        cells = (df.join(first, on=key)
                 .with_columns((pl.col("wk") - pl.col("cw"))
                               .alias("week_offset"))
                 .group_by(["cw", "week_offset"])
                 .agg(pl.len().cast(pl.Int64).alias("n")))
        return cells.rename({"cw": "cohort_week"}).to_arrow()

    out = (ds.map_batches(prep, batch_format="pyarrow")
           .map_batches(route, batch_format="pyarrow")
           .groupby("route").map_groups(per_route, batch_format="pyarrow")
           .groupby(["cohort_week", "week_offset"]).aggregate(Sum("n")))
    return out.map_batches(lambda t: pa.table({
        "cohort_week": t.column("cohort_week"),
        "week_offset": t.column("week_offset"),
        "n_users": t.column("sum(n)"),
    }), batch_format="pyarrow")
