"""Sandbox "fetcher": partitioned page servers over the synthetic web.

In production the fetch stage is an actor pool doing HTTP with
per-actor connection reuse (the reference's FetchingThread pool,
``frontier/FetchingThread.java``).  In this sandbox there is no network,
so fetching is a *lookup join* of the fetch-ready batch against the
``pages`` Parquet table — the same role the reference's
``NamedGraphServerHttpProxy`` plays for its load tests.  Each PageServer
actor holds the partition of pages whose host IP routes to its shard
(``ip % n_shards == shard_id``), indexed url -> row; a fetch is then
O(batch).  Ready batches are already produced per shard by the
co-partitioned HostShard, so routing is the identity — no per-round
shuffle.

Loading is a one-pass parallel scatter: one routing task per Parquet
file (columns pruned at the read) splits rows by shard with
``num_returns=n_shards``, and each server concatenates only its own
pieces — the web is read exactly once regardless of shard count, and
no page bytes ever pass through the driver.

A miss (URL outside the synthetic web, e.g. a robots.txt of a host
without one) behaves like a 404; pages with status 0 simulate a network
error and surface as ``error="socket_timeout"`` driving the retry table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray

FETCH_COLS = ("url", "warc_ts", "html", "status", "content_type", "location", "lang")


@ray.remote
def _route_pages_file(path: str, n_shards: int, dns_module: str, dns_name: str):
    """Read one parquet file (pruned columns) and split by host shard."""
    import importlib

    import polars as pl

    dns_fn = getattr(importlib.import_module(dns_module), dns_name)
    ds = pads.dataset(path)
    cols = [c for c in FETCH_COLS if c in ds.schema.names]
    tbl = ds.to_table(columns=cols)
    # same host extraction as the crawl side (burl.host_of / crawl.py):
    # userinfo is stripped, else user@host pages would route by the
    # wrong key and every fetch of them would miss its shard's index
    hosts = pl.from_arrow(tbl.column("url")).str.extract(
        r"^[a-z]+://(?:[^/@]*@)?([^/:?]+)", 1
    ).fill_null("")

    def _shard_of(h: str) -> int:
        # dns.py contract: a None result (NXDOMAIN) means unfetchable —
        # the crawl side never emits such a URL, so the page's shard
        # placement is arbitrary; park it (and regex misses) on shard 0
        # instead of crashing the load on None % n_shards
        ip = dns_fn(h) if h else None
        return 0 if ip is None else ip % n_shards

    shard_map = {h: _shard_of(h) for h in hosts.unique().to_list()}
    shards = hosts.replace_strict(shard_map, return_dtype=pl.Int64).to_numpy()
    order = np.argsort(shards, kind="stable")
    bounds = np.searchsorted(shards[order], np.arange(n_shards + 1))
    taken = tbl.take(pa.array(order))
    return tuple(
        taken.slice(bounds[s], bounds[s + 1] - bounds[s]) for s in range(n_shards)
    )


def load_page_servers(pages_dir: str, n_shards: int, dns_module: str, dns_name: str,
                      actor_options: list | None = None):
    """Create and load the PageServer pool (one parallel read pass).
    ``actor_options[s]`` (e.g. a placement-group scheduling strategy)
    co-locates server s with its paired host shard on one node."""
    files = sorted(
        f.path if hasattr(f, "path") else f
        for f in pads.dataset(pages_dir).files
    )
    routed = [
        _route_pages_file.options(num_returns=n_shards).remote(
            f, n_shards, dns_module, dns_name
        )
        for f in files
    ]
    if n_shards == 1:  # num_returns=1 yields a single ref to the tuple
        routed = [[r] for r in routed]
    servers = [
        (PageServer.options(**actor_options[s])
         if actor_options and actor_options[s] else PageServer).remote(s)
        for s in range(n_shards)
    ]
    acks = [
        servers[s].load.remote(*[routed[f][s] for f in range(len(files))])
        for s in range(n_shards)
    ]
    ray.get(acks)
    return servers


@ray.remote(num_cpus=0.05)
class PageServer:
    def __init__(self, shard_id: int):
        self.shard_id = shard_id
        self.tbl = None
        self.index: dict[str, int] = {}

    def load(self, *parts) -> int:
        """Receive this shard's page partitions (object refs, already
        dereferenced by Ray) and build the url index. Tables in the
        minimal input_hint shape (url, warc_ts, html, text, lang) get
        the optional columns defaulted (status=200, content_type
        text/html, no location)."""
        parts = [p[0] if isinstance(p, tuple) else p for p in parts]
        parts = [p for p in parts if p is not None and p.num_rows]
        if not parts:
            self.tbl = None
            return 0
        t = pa.concat_tables(parts).combine_chunks()
        n = t.num_rows
        if "status" not in t.column_names:
            t = t.append_column(
                "status", pa.array(np.full(n, 200, np.int32))
            )
        elif t.column("status").null_count:
            # nulls default to 200 like the absent column: fetch() reads
            # status via to_numpy, where nulls surface as NaN and would
            # pass the ok mask then astype(int32) into garbage codes
            t = t.set_column(
                t.schema.get_field_index("status"), "status",
                pc.fill_null(t.column("status").cast(pa.int32()), 200),
            )
        if "content_type" not in t.column_names:
            t = t.append_column(
                "content_type", pa.array(["text/html; charset=utf-8"] * n, pa.string())
            )
        if "location" not in t.column_names:
            t = t.append_column("location", pa.nulls(n, pa.string()))
        self.tbl = t
        self.index = {u: i for i, u in enumerate(t.column("url").to_pylist())}
        return n

    def fetch(self, ready: pa.Table) -> pa.Table | None:
        """Join the ready batch against the page partition (vectorized).

        Output: ready columns + html, status, content_type, location,
        warc_ts:int64(ms), lang, error."""
        if ready is None or ready.num_rows == 0:
            return None
        if self.tbl is None:
            empty = pa.nulls(ready.num_rows, pa.string())
            return (
                ready.append_column("html", pa.array([b""] * ready.num_rows, pa.binary()))
                .append_column("status", pa.array(np.full(ready.num_rows, 404, np.int32)))
                .append_column("content_type", empty)
                .append_column("location", empty)
                .append_column("warc_ts", pa.array(np.zeros(ready.num_rows, np.int64)))
                .append_column("lang", empty)
                .append_column("error", empty)
            )
        urls = ready.column("url").to_pylist()
        idx = np.fromiter((self.index.get(u, -1) for u in urls), dtype=np.int64, count=len(urls))
        found = idx >= 0
        sub = self.tbl.take(pa.array(np.where(found, idx, 0)))
        raw_status = sub.column("status").to_numpy(zero_copy_only=False)
        errored = found & (raw_status == 0)
        ok = found & (raw_status != 0)
        if ok.all():
            # common case (every URL hits a live page): the taken columns
            # ARE the result — skip the if_else passes, each of which
            # re-allocates the full (binary-heavy) column
            html = sub.column("html").combine_chunks()
            ctype = sub.column("content_type").combine_chunks()
            loc = sub.column("location").combine_chunks()
            lang = (
                sub.column("lang").combine_chunks()
                if "lang" in sub.column_names
                else pa.nulls(len(urls), pa.string())
            )
            status = raw_status.astype(np.int32)
            ts = sub.column("warc_ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            error = pa.nulls(len(urls), pa.string())
        else:
            ok_arr = pa.array(ok)
            status = np.where(found, raw_status, 404).astype(np.int32)
            html = pc.if_else(ok_arr, sub.column("html").combine_chunks(), pa.scalar(b"", pa.binary()))
            ctype = pc.if_else(ok_arr, sub.column("content_type").combine_chunks(), pa.scalar(None, pa.string()))
            loc = pc.if_else(ok_arr, sub.column("location").combine_chunks(), pa.scalar(None, pa.string()))
            lang = (
                pc.if_else(ok_arr, sub.column("lang").combine_chunks(), pa.scalar(None, pa.string()))
                if "lang" in sub.column_names
                else pa.nulls(len(urls), pa.string())
            )
            ts = np.where(ok, sub.column("warc_ts").cast(pa.int64()).to_numpy(zero_copy_only=False), 0)
            error = pc.if_else(
                pa.array(errored), pa.scalar("socket_timeout", pa.string()), pa.scalar(None, pa.string())
            )
        return (
            ready.append_column("html", html)
            .append_column("status", pa.array(status))
            .append_column("content_type", ctype)
            .append_column("location", loc)
            .append_column("warc_ts", pa.array(ts, pa.int64()))
            .append_column("lang", lang)
            .append_column("error", error)
        )

    def n_pages(self) -> int:
        return self.tbl.num_rows if self.tbl is not None else 0
