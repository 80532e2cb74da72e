"""General-purpose distributed joins: broadcast-hash and reduce-side
(shuffle) variants.

The reference's joins are specialized (fetch-ready x page content,
pageserver.py:116; signature attach, dedup.py:_attach_sig); these give
the same two scale shapes as reusable operators, mirroring the
reference's store-analytics needs on relational side tables:

- :func:`broadcast_join` — the small side is collected once and shipped
  via ``ray.put`` (one object-store read per actor task, never
  re-serialized per batch); the big side streams.  Use when one side
  fits comfortably in a worker heap (dimension tables, lookup maps).
  Guarded: above ``broadcast_limit`` rows it automatically becomes a
  :func:`shuffle_join` instead of collecting an unbounded table on the
  driver (same size-gate idiom as ``dedup.BROADCAST_SIG_LIMIT``).
- :func:`shuffle_join` — both sides route by ``hash(key) % n_routes``
  (size-derived), one vectorized polars join per route group.  Use
  when both sides are large; nothing materializes beyond one route
  group per task.

Join semantics are ANSI-SQL: NULL keys never match.  ``how`` may be
``inner`` (null-key rows dropped from the output), ``left`` (null-key
and unmatched left rows kept with null right columns) or ``full``
(both sides' unmatched rows kept, shuffle path only).

Both produce plain Arrow batches and preserve input column names (the
right side's key column is coalesced into the left's).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import ray

from ..hashing import derive_routes, route_of

BROADCAST_JOIN_LIMIT = 5_000_000  # small-side rows collected driver-side

_HOWS = ("inner", "left", "full")


def _collect_capped(ds, cap: int) -> "pa.Table | None":
    """Stream-collect ``ds`` into one Arrow table, giving up (None) the
    moment the row count exceeds ``cap`` — the caller falls back to a
    shuffle plan.  Replaces the ``ds.count()``-then-collect idiom,
    which executed the entire input pipeline TWICE (count() runs the
    full lazy plan, then the collect re-runs it from scratch)."""
    parts: list[pa.Table] = []
    n = 0
    for b in ds.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        n += t.num_rows
        if n > cap:
            return None
        parts.append(t)
    if not parts:
        return pa.schema(ds.schema().base_schema).empty_table()
    return pa.concat_tables(parts)


def broadcast_join(big_ds, small_ds, on: str, how: str = "inner",
                   broadcast_limit: int = BROADCAST_JOIN_LIMIT,
                   n_routes: int | None = None):
    """Join a streaming ``big_ds`` against a driver-collected
    ``small_ds`` (broadcast once via ``ray.put``).

    If the small side exceeds ``broadcast_limit`` rows the plan changes
    to :func:`shuffle_join` instead of OOMing the driver.  ``full``
    always takes the shuffle path (right-unmatched rows cannot be
    derived per streaming batch)."""
    if how not in _HOWS:
        raise ValueError(f"how must be one of {_HOWS}, got {how!r}")
    small_tbl = (None if how == "full"
                 else _collect_capped(small_ds, broadcast_limit))
    if small_tbl is None:
        return shuffle_join(big_ds, small_ds, on, how=how,
                            n_routes=n_routes)
    small = pl.from_arrow(small_tbl)
    if how == "inner":
        small = small.drop_nulls(on)  # null keys never match
    small_ref = ray.put(small)

    def join(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        if how == "inner":
            df = df.drop_nulls(on)
        return df.join(ray.get(small_ref), on=on, how=how).to_arrow()

    return big_ds.map_batches(join, batch_format="pyarrow")


def semi_join(left_ds, right_ds, on: str, anti: bool = False,
              broadcast_limit: int = BROADCAST_JOIN_LIMIT,
              n_routes: int | None = None):
    """Existence join: keep left rows whose key appears in ``right_ds``
    (semi) or does not (``anti=True``).  SQL semantics are
    ``EXISTS`` / ``NOT EXISTS``: a null left key matches nothing, so it
    is dropped by semi and KEPT by anti.

    The right side reduces to its distinct keys first (a per-batch
    ``unique`` partial, then a key-routed distinct), so the exchange
    carries distinct keys, not rows.  If the distinct-key count fits
    ``broadcast_limit`` the key set broadcasts once via ``ray.put`` and
    the left side streams through a vectorized ``is_in`` mask;
    otherwise both sides co-route by key and each route group runs one
    polars ``semi``/``anti`` join (nothing materializes on the driver).
    """
    import pyarrow.compute as pc

    how = "anti" if anti else "semi"

    def batch_unique(batch: pa.Table) -> pa.Table:
        col = batch.column(on)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table({on: col.drop_null().unique()})

    keys_ds = right_ds.select_columns([on]) \
        .map_batches(batch_unique, batch_format="pyarrow")
    nr = derive_routes(left_ds, n_routes)

    def route_unique(group: pa.Table) -> pa.Table:
        col = group.column(on)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table({on: col.unique()})

    def route(batch: pa.Table) -> pa.Table:
        return batch.append_column("route", route_of(batch.column(on), nr))

    distinct = keys_ds.map_batches(route, batch_format="pyarrow") \
        .groupby("route").map_groups(route_unique, batch_format="pyarrow")

    keys = _collect_capped(distinct, broadcast_limit)
    if keys is not None:
        key_arr = (keys.column(on).combine_chunks()
                   if keys.num_rows else None)
        keys_ref = ray.put(key_arr)

        def mask(batch: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            if ks is None:
                hit = pa.array(np.zeros(batch.num_rows, bool))
            else:
                hit = pc.is_in(batch.column(on), value_set=ks)
                hit = pc.fill_null(hit, False)  # null key: no match
            return batch.filter(hit if how == "semi" else pc.invert(hit))

        return left_ds.map_batches(mask, batch_format="pyarrow")

    # shuffle path: co-route left rows and distinct keys, one polars
    # semi/anti join per route group.  Null left keys route to a fixed
    # route; polars nulls_equal=False gives them no match there, which
    # is exactly EXISTS/NOT EXISTS.
    lcols = [f.name for f in left_ds.schema().base_schema]

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            return (batch
                    .append_column("route", route_of(batch.column(on), nr))
                    .append_column("side", pa.array(
                        np.full(batch.num_rows, side, np.int8))))
        return f

    kmiss = {f.name: f.type
             for f in left_ds.schema().base_schema if f.name != on}

    def pad_keys(batch: pa.Table) -> pa.Table:
        for name, typ in kmiss.items():
            batch = batch.append_column(name, pa.nulls(batch.num_rows, typ))
        return batch.select(lcols)  # match the left side's column order

    def join(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        left = df.filter(pl.col("side") == 0).select(lcols)
        right = df.filter(pl.col("side") == 1).select([on]).drop_nulls(on)
        return left.join(right, on=on, how=how).to_arrow()

    tagged_l = left_ds.map_batches(tag(0), batch_format="pyarrow")
    tagged_r = distinct.map_batches(pad_keys, batch_format="pyarrow") \
        .map_batches(tag(1), batch_format="pyarrow")
    return (tagged_l.union(tagged_r)
            .groupby("route")
            .map_groups(join, batch_format="pyarrow"))


def shuffle_join(left_ds, right_ds, on: str, how: str = "inner",
                 n_routes: int | None = None):
    """Reduce-side hash join: both inputs co-route by the join key, one
    vectorized polars join per route group.

    Null-key rows route to a fixed route and never match (polars
    default ``nulls_equal=False``); for ``left``/``full`` they survive
    into the output with the other side's columns null, matching SQL.
    Correct for any ``how`` because each key value lands in exactly one
    route group, so per-group joins partition the global join."""
    if how not in _HOWS:
        raise ValueError(f"how must be one of {_HOWS}, got {how!r}")
    nr = derive_routes(left_ds, n_routes)

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            return (batch
                    .append_column("route", route_of(batch.column(on), nr))
                    .append_column("side", pa.array(
                        np.full(batch.num_rows, side, np.int8))))
        return f

    lcols = [f.name for f in left_ds.schema().base_schema]
    rcols = [f.name for f in right_ds.schema().base_schema]

    def join(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        left = df.filter(pl.col("side") == 0).select(lcols)
        right = df.filter(pl.col("side") == 1).select(rcols)
        if how != "full":
            # inner/left: right null keys can never contribute a row
            right = right.drop_nulls(on)
            if how == "inner":
                left = left.drop_nulls(on)
        return left.join(right, on=on, how=how,
                         coalesce=True).to_arrow()

    # sides have different schemas; make the union schema-compatible by
    # padding each side with the other's missing columns as typed nulls
    # so blocks share one schema.
    rschema = right_ds.schema().base_schema
    lschema = left_ds.schema().base_schema

    def pad(missing: list, schema) -> dict:
        return {f.name: f.type for f in schema if f.name in missing}

    lmiss = pad([c for c in rcols if c not in lcols], rschema)
    rmiss = pad([c for c in lcols if c not in rcols], lschema)

    def pad_batch(miss: dict):
        def f(batch: pa.Table) -> pa.Table:
            for name, typ in miss.items():
                batch = batch.append_column(
                    name, pa.nulls(batch.num_rows, typ))
            return batch
        return f

    tagged_l = left_ds.map_batches(pad_batch(lmiss), batch_format="pyarrow") \
        .map_batches(tag(0), batch_format="pyarrow")
    tagged_r = right_ds.map_batches(pad_batch(rmiss), batch_format="pyarrow") \
        .map_batches(tag(1), batch_format="pyarrow")
    return (tagged_l.union(tagged_r)
            .groupby("route")
            .map_groups(join, batch_format="pyarrow"))
