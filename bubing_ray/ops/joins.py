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

from ..hashing import derive_routes, route_batch, route_of

BROADCAST_JOIN_LIMIT = 5_000_000  # small-side rows collected driver-side

_HOWS = ("inner", "left", "full")


def _pad_missing(cols_missing: dict):
    def f(batch: pa.Table) -> pa.Table:
        for name, typ in cols_missing.items():
            batch = batch.append_column(name, pa.nulls(batch.num_rows, typ))
        return batch

    return f


def _tag(side: int, key: str, nr: int):
    def f(batch: pa.Table) -> pa.Table:
        return (
            batch.append_column("route", route_of(batch.column(key), nr))
            .append_column(
                "side", pa.array(np.full(batch.num_rows, side, np.int8))
            )
        )

    return f


def co_route(left_ds, right_ds, key: str, n_routes: int | None = None):
    """The reduce-side exchange idiom, in ONE place: pad each side with
    the other's missing columns as typed nulls, align column order so
    every block shares one schema, tag side (0=left, 1=right) and the
    coarse ``hash(key) % nr`` route, and union.  Shared by
    :func:`shuffle_join`, :func:`semi_join`'s shuffle path, and the
    temporal joins (ops/temporal.py) — one owner, so null-key routing
    and schema alignment cannot drift between them.

    Returns ``(tagged_union, lcols, rcols, nr)``."""
    # size the exchange to the LARGER side: a 1k-row probe stream
    # co-routed with a billion-row history must not inherit the probe's
    # route count, or each route group holds millions of history rows
    if n_routes is not None:
        nr = int(n_routes)
    else:
        from ..hashing import routes_for

        counts = []
        for side in (left_ds, right_ds):
            try:
                c = side._meta_count()
            except Exception:
                c = None
            if c is not None:
                counts.append(c)
        nr = routes_for(max(counts) if counts else None)
    lschema = left_ds.schema().base_schema
    rschema = right_ds.schema().base_schema
    lcols = [f.name for f in lschema]
    rcols = [f.name for f in rschema]
    lmiss = {f.name: f.type for f in rschema if f.name not in lcols}
    rmiss = {f.name: f.type for f in lschema if f.name not in rcols}
    order = lcols + [c for c in rcols if c not in lcols]

    def reorder(batch: pa.Table) -> pa.Table:
        return batch.select(order)

    tagged_l = left_ds.map_batches(
        _pad_missing(lmiss), batch_format="pyarrow"
    ).map_batches(reorder, batch_format="pyarrow") \
        .map_batches(_tag(0, key, nr), batch_format="pyarrow")
    tagged_r = right_ds.map_batches(
        _pad_missing(rmiss), batch_format="pyarrow"
    ).map_batches(reorder, batch_format="pyarrow") \
        .map_batches(_tag(1, key, nr), batch_format="pyarrow")
    return tagged_l.union(tagged_r), lcols, rcols, nr


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
        return route_batch(batch, on, nr)

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
    union, lcols, _, _ = co_route(left_ds, distinct, on, nr)

    def join(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        left = df.filter(pl.col("side") == 0).select(lcols)
        right = df.filter(pl.col("side") == 1).select([on]).drop_nulls(on)
        return left.join(right, on=on, how=how).to_arrow()

    return union.groupby("route").map_groups(join, batch_format="pyarrow")


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
    union, lcols, rcols, nr = co_route(left_ds, right_ds, on, n_routes)

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

    return union.groupby("route").map_groups(join, batch_format="pyarrow")


def diff_tables(left_ds, right_ds, key: str, val_col: str,
                n_routes: int | None = None):
    """Snapshot diff (change-data-capture between two crawls / corpus
    versions): classify every key of either side as ``added`` (right
    only), ``removed`` (left only), ``changed`` (both, ``val_col``
    differs) or ``same`` — the recrawl-delta step of an incremental
    web pipeline (which pages appeared, vanished, or changed content
    between two stores).

    Requires ``key`` to be unique per side (a store is keyed by url);
    duplicate keys raise, because 'the' value of a duplicated key is
    undefined and a silent pick would be partitioning-dependent.

    ONE co-routed exchange (:func:`co_route` — both sides carry only
    ``key`` and ``val_col``) and one vectorized polars full join per
    route group.  Returns a Dataset (``key``, change).
    """
    l2 = left_ds.select_columns([key, val_col])
    r2 = right_ds.select_columns([key, val_col])
    union, _, _, nr = co_route(l2, r2, key, n_routes)

    def per_route(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        # explicit presence flags: a full join cannot otherwise tell a
        # key that is ABSENT from one side apart from a key PRESENT
        # with a NULL value
        lv = (df.filter(pl.col("side") == 0)
              .select([key, pl.col(val_col).alias("_lv")])
              .with_columns(pl.lit(True).alias("_lp")))
        rv = (df.filter(pl.col("side") == 1)
              .select([key, pl.col(val_col).alias("_rv")])
              .with_columns(pl.lit(True).alias("_rp")))
        for side_df, name in ((lv, "left"), (rv, "right")):
            if side_df.select(pl.col(key)).is_duplicated().any():
                raise ValueError(
                    f"diff_tables: duplicate {key!r} on the {name} side")
        j = lv.join(rv, on=key, how="full", coalesce=True)
        out = j.with_columns(
            pl.when(pl.col("_lp").is_null())
            .then(pl.lit("added"))
            .when(pl.col("_rp").is_null())
            .then(pl.lit("removed"))
            # NULL values inside present rows compare like SQL IS NOT
            # DISTINCT FROM: two nulls are 'same'
            .when(pl.col("_lv").eq_missing(pl.col("_rv")))
            .then(pl.lit("same"))
            .otherwise(pl.lit("changed")).alias("change"))
        return out.select([key, "change"]).to_arrow()

    return (union.groupby("route")
            .map_groups(per_route, batch_format="pyarrow"))
