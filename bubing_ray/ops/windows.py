"""Windowed / streaming-style operators over event tables.

The reference has no window operators (its streaming semantics are the
politeness rate limits, SURVEY §2.9); these are the custom operators
the rebuild spec calls for when Ray Data lacks them.

Scale shape: a ``groupby(key).map_groups`` costs one Python call per
key — billions at corpus scale.  Instead rows shuffle once on a COARSE
route (``hash(key) % n_routes``) and each route group runs ONE
vectorized polars window (`.over(key)`) covering all its keys; the
shuffle guarantee (all rows of a key share its route) makes the window
globally correct.  ~n_routes Python calls total, independent of key
cardinality.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from .stats import _collect

N_ROUTES = 256  # route-count FLOOR; operators derive the actual width
# from input size (hashing.routes_for) so one route group's rows stay
# bounded as the corpus grows


def _route_batch(batch: pa.Table, key: str,
                 n_routes: int = N_ROUTES) -> pa.Table:
    from ..hashing import route_batch

    return route_batch(batch, key, n_routes)


def sessionize(ds, gap_ms: int = 60_000, key: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               n_routes: int | None = None):
    """Gap-based sessionization: per key, events ordered by (ts, id);
    a new session starts when the gap to the previous event exceeds
    ``gap_ms``. Returns (id_col, key, session_id) with session ids
    numbered 1.. per key in time order.
    """

    def per_route(group: pa.Table) -> pa.Table:
        # nulls_last mirrors the SQL window's ORDER BY (DuckDB places
        # NULL ts last); without it a null-ts row would seed session 1
        df = pl.from_arrow(group).sort([key, ts_col, id_col],
                                       nulls_last=True)
        ts = (df[ts_col].cast(pl.Int64) // 1000).alias("_ts")  # us -> ms
        df = df.with_columns(ts)
        out = df.with_columns(
            ((pl.col("_ts") - pl.col("_ts").shift(1).over(key)) > gap_ms)
            .fill_null(True)
            .cast(pl.Int64)
            .cum_sum()
            .over(key)
            .alias("session_id")
        )
        return out.select([id_col, key, "session_id"]).to_arrow()

    from ..hashing import derive_routes

    nr = derive_routes(ds, n_routes)
    return (
        ds.map_batches(lambda b: _route_batch(b, key, nr), batch_format="pyarrow")
        .groupby("route")
        .map_groups(per_route, batch_format="pyarrow")
    )


def session_stats(ds, gap_ms: int = 60_000, key: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id",
                  n_routes: int | None = None):
    """Per-key session summary: number of sessions and the largest
    session length (event count)."""
    from ..hashing import derive_routes

    nr = derive_routes(ds, n_routes)
    sess = sessionize(ds, gap_ms, key, ts_col, id_col, n_routes=nr)

    def agg(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        out = df.group_by(key).agg(
            pl.col("session_id").max().alias("n_sessions"),
            pl.col("session_id").value_counts().struct.field("count").max()
            .cast(pl.Int64).alias("max_session_events"),
        )
        return out.to_arrow()

    return (
        sess.map_batches(lambda b: _route_batch(b, key, nr), batch_format="pyarrow")
        .groupby("route")
        .map_groups(agg, batch_format="pyarrow")
    )


def grouped_stats(ds, key: str, aggs, n_routes: int | None = None) -> "object":
    """Generic per-key vectorized aggregation via the coarse-route
    shuffle: ``aggs`` is a list of polars expressions evaluated in ONE
    ``group_by(key).agg`` per route group."""
    from ..hashing import derive_routes

    nr = derive_routes(ds, n_routes)

    def agg(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        return df.group_by(key).agg(*aggs).to_arrow()

    return (
        ds.map_batches(lambda b: _route_batch(b, key, nr), batch_format="pyarrow")
        .groupby("route")
        .map_groups(agg, batch_format="pyarrow")
    )


def group_topk(ds, key: str, order_col: str, k: int = 3,
               descending: bool = True, tie_col: str | None = None,
               n_routes: int | None = None):
    """Per-key top-k (the ``row_number() OVER (PARTITION BY key ORDER
    BY ...) <= k`` idiom): one coarse-route shuffle, then ONE vectorized
    polars rank window per route group — no per-key Python, and only a
    PARTIAL per-batch top-k pre-filter rides ahead of the shuffle so at
    most ``k`` rows per (batch, key) ever exchange.

    Deterministic: ties on ``order_col`` break by ``tie_col`` ascending
    (required — a nondeterministic top-k cannot be oracle-checked).
    Output = the input columns plus ``rk`` (1-based rank).
    """
    from ..hashing import derive_routes

    if tie_col is None:
        raise ValueError("group_topk needs tie_col for deterministic ties")
    nr = derive_routes(ds, n_routes)
    sort_cols = [order_col, tie_col]
    sort_desc = [descending, False]

    def local_prune(batch: pa.Table) -> pa.Table:
        # per-batch partial: keep at most k rows per key before the
        # shuffle (safe: a row outside its key's batch-local top-k can
        # never enter the global top-k).  nulls_last matches DuckDB's
        # ORDER BY null placement (NULLS LAST either direction).
        df = pl.from_arrow(batch)
        return (df.sort(sort_cols, descending=sort_desc, nulls_last=True)
                .group_by(key, maintain_order=True).head(k).to_arrow())

    def rank(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group).drop("route")
        out = (df.sort(sort_cols, descending=sort_desc, nulls_last=True)
               .with_columns(pl.int_range(1, pl.len() + 1)
                             .cast(pl.Int64).over(key).alias("rk"))
               .filter(pl.col("rk") <= k))
        return out.to_arrow()

    return (ds.map_batches(local_prune, batch_format="pyarrow")
            .map_batches(lambda b: _route_batch(b, key, nr),
                         batch_format="pyarrow")
            .groupby("route")
            .map_groups(rank, batch_format="pyarrow"))


def global_rank(ds, order_col: str, tie_col: str,
                descending: bool = True, n_buckets: int | None = None,
                samples_per_block: int = 64):
    """Distributed global ``row_number() OVER (ORDER BY order_col
    [DESC], tie_col)`` — a total ranking of the whole corpus without a
    single-node sort.

    Range-partition-and-offset (the classic distributed ORDER BY):

    1. SAMPLE: each block contributes <= ``samples_per_block`` evenly
       spaced key values; the driver turns the bounded sample into
       ``n_buckets - 1`` ascending split points (balance-only — splits
       never affect the result, only task sizes);
    2. BUCKET: every row gets ``bucket = searchsorted(splits, key)``
       per batch — equal keys always share a bucket, so per-bucket
       ordering by ``(order_col, tie_col)`` is globally correct;
    3. COUNT: one bounded ``groupby(bucket).count()`` (n_buckets rows)
       gives the driver the exclusive prefix-sum offsets, broadcast
       once via ``ray.put``;
    4. RANK: one shuffle co-locates each bucket; ONE vectorized polars
       sort per bucket group assigns ``rank = offset + row position``.

    The only all-to-all moves ``(tie_col, order_col)`` + carried
    columns exactly once; driver state is the sample and the
    n_buckets-row count table, both bounded at any corpus size.
    Output = input columns + ``rank`` (1-based int64).
    """
    import ray as _ray

    from ..hashing import routes_for

    def sample(batch: pa.Table) -> pa.Table:
        col = pl.from_arrow(batch.select([order_col]))[order_col]
        s = col.drop_nulls().sort()
        if s.len() == 0:
            return pa.table({order_col: pa.array([], batch.schema.field(order_col).type)})
        idx = np.linspace(0, s.len() - 1,
                          min(samples_per_block, s.len())).astype(np.int64)
        return pa.table({order_col: s.gather(idx).to_arrow()})

    samp = (pl.from_arrow(_collect(
        ds.map_batches(sample, batch_format="pyarrow"),
        promote_options="default"))[order_col].sort())
    if n_buckets is not None:
        nb = n_buckets
    else:
        try:  # metadata-only row count; None/raise -> route floor
            n = ds._meta_count()
        except Exception:
            n = None
        nb = routes_for(n or None)
    if samp.len() == 0:
        splits = samp.to_numpy()
    else:
        cuts = np.linspace(0, samp.len() - 1, nb + 1).astype(np.int64)[1:-1]
        splits = np.unique(samp.to_numpy()[cuts])

    def bucketize(batch: pa.Table) -> pa.Table:
        col = pl.from_arrow(batch.select([order_col]))[order_col]
        vals = col.to_numpy()
        nulls = col.is_null().to_numpy()
        if nulls.any():
            # search only the non-null values: for string/object columns
            # numpy cannot compare None against splits (TypeError), and
            # float NaNs would land in an arbitrary bucket
            b = np.empty(len(vals), np.int64)
            if (~nulls).any():
                b[~nulls] = np.searchsorted(splits, vals[~nulls],
                                            side="right")
            # DuckDB ORDER BY ranks NULLs LAST in either direction: the
            # lowest-ranked bucket, with nulls_last inside the bucket
            b[nulls] = 0 if descending else len(splits)
        else:
            b = np.searchsorted(splits, vals, side="right").astype(np.int64)
        return batch.append_column("bucket", pa.array(b))

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow").materialize()

    counts = pl.from_arrow(_collect(
        bucketed.groupby("bucket").count(),
        promote_options="default")).sort("bucket")
    n_total = len(splits) + 1
    cnt = np.zeros(n_total, np.int64)
    cnt[counts["bucket"].to_numpy()] = counts["count()"].to_numpy()
    if descending:
        # exclusive suffix sum: rows in HIGHER buckets rank first
        offs = np.concatenate([np.cumsum(cnt[::-1])[::-1][1:], [0]])
    else:
        offs = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    offs_ref = _ray.put(offs)

    def rank_bucket(group: pa.Table) -> pa.Table:
        offsets = _ray.get(offs_ref)
        b = int(group.column("bucket")[0].as_py())
        df = (pl.from_arrow(group).drop("bucket")
              .sort([order_col, tie_col], descending=[descending, False],
                    nulls_last=True))
        return (df.with_columns(
            (pl.int_range(1, pl.len() + 1, dtype=pl.Int64)
             + int(offsets[b])).alias("rank")).to_arrow())

    return (bucketed.groupby("bucket")
            .map_groups(rank_bucket, batch_format="pyarrow"))
