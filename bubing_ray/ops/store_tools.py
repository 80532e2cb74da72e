"""Store post-processing — the rebuild of BUbiNG's offline tools.

- ``process_store``: the ParallelFilteredProcessorRunner analogue
  (warc/processors/ParallelFilteredProcessorRunner.java:64-137): read
  the store, filter, run processor column-extractors, write/return —
  literally ``read_parquet → filter → map_batches → write`` with
  Parquet row groups replacing the gzip-member archive and Ray's
  streaming executor replacing the reordering queue (order is restored
  by the ``fetch_seq`` sort only when asked, instead of always).
- ``repetition_set``: tool/BuildRepetitionSet.java:30-43 — URL-sorted
  triples -> positions of repeated fetches of the same URL.
- ``graph_map``: tool/GenerateGraphMap.java:33-46 — digest-grouped
  archetype election (first fetch of each digest is the archetype all
  duplicates map to).

Processors mirror warc/processors/: ResponseContentExtractor (body ->
text), WarcTargetUriExtractor (-> url), digest hex, fetch position.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import ray
from ray.data.aggregate import Count, Min

from .filters import Pred, apply_filter


def read_store(store_dir: str):
    """The crawl store (round=NNNNNN/part-*.parquet partitions)."""
    return ray.data.read_parquet(store_dir)


# ---------------------------------------------------------------- processors

def extract_text(batch: pa.Table) -> pa.Table:
    """ResponseContentExtractor: (url, text)."""
    return batch.select(["url", "text"])


def extract_uri(batch: pa.Table) -> pa.Table:
    """WarcTargetUriExtractor: urls only."""
    return batch.select(["url"])


def extract_digest_hex(batch: pa.Table) -> pa.Table:
    h = batch.column("digest64").cast(pa.uint64())
    hexes = np.char.mod("%016x", h.to_numpy().astype(np.uint64))
    return pa.table({"url": batch.column("url"), "digest_hex": pa.array(hexes.tolist())})


PROCESSORS = {
    "text": extract_text,
    "uri": extract_uri,
    "digest": extract_digest_hex,
}


def process_store(store_dir: str, pred: Pred | None = None,
                  processor: str = "text", out_dir: str | None = None,
                  preserve_order: bool = False):
    """Filter + process the store; write Parquet if out_dir given, else
    return the Dataset. ``preserve_order`` sorts by fetch_seq (the
    ReorderingBlockingQueue analogue — opt-in because it is a sort)."""
    ds = read_store(store_dir)
    if pred is not None:
        ds = apply_filter(ds, pred)
    fn = PROCESSORS[processor] if isinstance(processor, str) else processor
    if preserve_order:
        # the sort key rides along under a PRIVATE name and is dropped
        # after the sort, so the output schema is identical with
        # preserve_order on or off (and a processor that itself emits a
        # fetch_seq column keeps it as data, untouched)
        def with_seq(batch: pa.Table) -> pa.Table:
            return fn(batch).append_column(
                "_order_seq", batch.column("fetch_seq"))

        def strip_seq(batch: pa.Table) -> pa.Table:
            return batch.drop_columns(["_order_seq"])

        ds = (ds.map_batches(with_seq, batch_format="pyarrow")
              .sort("_order_seq")
              .map_batches(strip_seq, batch_format="pyarrow"))
    else:
        ds = ds.map_batches(fn, batch_format="pyarrow")
    if out_dir:
        ds.write_parquet(out_dir)
        return None
    return ds


# ------------------------------------------------------------- offline tools

def repetition_set(store_dir: str, n_routes: int | None = None):
    """(url, fetch_seq) of every re-fetch of an already-stored URL —
    i.e. rows whose fetch_seq is not the minimum for their url.

    Coarse-route + one vectorized polars window per route (the
    ``exact_dedup`` / ``grouped_stats`` pattern): rows route by
    ``hash(url) % routes_for(n)`` so all fetches of a URL co-locate,
    and each route group runs ONE ``min().over(url)`` window — not one
    Python call per distinct URL, which at 10^10 stored pages would be
    billions of interpreter invocations.  The reference equivalent is a
    sort-based streaming scan (tool/BuildRepetitionSet.java:30-43) for
    the same reason."""
    from ..hashing import derive_routes, hash64

    ds = read_store(store_dir).select_columns(["url", "fetch_seq"])
    nr = derive_routes(ds, n_routes)

    def route(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column("url"))
        return batch.append_column(
            "route", pa.array((h % np.uint64(nr)).astype(np.int64))
        )

    def non_first(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        return (df.filter(
                    pl.col("fetch_seq")
                    != pl.col("fetch_seq").min().over("url"))
                .drop("route").to_arrow())

    return (ds.map_batches(route, batch_format="pyarrow")
            .groupby("route")
            .map_groups(non_first, batch_format="pyarrow"))


def graph_map(store_dir: str, n_routes: int | None = None):
    """digest64 -> archetype url (url of the first fetch with that
    digest) for every stored row: (url, fetch_seq, archetype_url).

    Same coarse-route + single-window design as ``repetition_set``
    (reference: sort-based tool/GenerateGraphMap.java:33-46): each
    route group elects archetypes for ALL its digests in one vectorized
    ``sort + first().over(digest64)`` instead of one Python call per
    distinct digest."""
    from ..hashing import derive_routes

    ds = read_store(store_dir).select_columns(["url", "fetch_seq", "digest64"])
    nr = derive_routes(ds, n_routes)

    def route(batch: pa.Table) -> pa.Table:
        d = batch.column("digest64").to_numpy().astype(np.int64).view(np.uint64)
        return batch.append_column(
            "route", pa.array((d % np.uint64(nr)).astype(np.int64))
        )

    def elect(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group).sort("fetch_seq")
        return (df.with_columns(
                    pl.col("url").first().over("digest64")
                    .alias("archetype_url"))
                .drop("route").to_arrow())

    return (ds.map_batches(route, batch_format="pyarrow")
            .groupby("route")
            .map_groups(elect, batch_format="pyarrow"))


def store_stats(store_dir: str) -> dict:
    """Global counters over the store — the StatsThread analogue
    (frontier/StatsThread.java:37-63), computed as one aggregate pass."""
    ds = read_store(store_dir)
    n = ds.count()
    dup = ds.groupby("is_duplicate").aggregate(Count())
    dup_tbl = pa.concat_tables(
        [pa.table(b) for b in dup.iter_batches(batch_format="pyarrow")]
    )
    by_dup = dict(zip(dup_tbl.column("is_duplicate").to_pylist(),
                      dup_tbl.column("count()").to_pylist()))
    return {
        "stored": n,
        "archetypes": by_dup.get(False, 0),
        "duplicates": by_dup.get(True, 0),
    }
