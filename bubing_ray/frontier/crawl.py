"""The crawl: a driver loop of rounds over sharded actor state.

Design (SURVEY.md §7): all long-lived state is sharded actors
(host/politeness shards keyed by IP, sieve shards keyed by url hash,
digest shards keyed by content digest) checkpointed to Parquet; each
round is a short pipeline of Arrow batches flowing shard-parallel
through object-store refs — the driver only ever touches the small
fetch-ready URL tables (the analogue of BUbiNG's todo queue) and scalar
counters, never page content or link tables.

Round t (logical clock ``now = t * round_ms`` — politeness is
virtual-time, so throughput is compute-bound, reproducible, and
independent of wall-clock scheduling jitter):

1. emit_ready on every host shard       (politeness + robots gate)
2. fetch on the co-partitioned page servers (sandbox join "fetch")
3. parse tasks per shard (text/digest/links; ref-to-ref, off-driver)
4. digest membership flush -> is_duplicate (first fetch_seq wins)
5. store write (partitioned Parquet, one dir per round = resumable)
6. link explosion -> filter -> hash -> routed enqueue into sieve shards
7. sieve flush -> novel URLs -> absorb into host shards (by IP)
8. report fetch outcomes -> politeness/retry updates
9. every k rounds: atomic checkpoint (all shard states + scalars)

Raw tasks/actors are used *only* for this stateful exchange — exactly
the case the Dataset API cannot express (a shared mutable membership
index with cross-round politeness state); the bulk operators around the
crawl (page generation, store post-processing, analytics) are ordinary
``ray.data`` pipelines.  Why not a Dataset per round: the per-round
streaming-executor spin-up costs more than an entire small round, and
rounds are already shard-parallel with no all-to-all exchange — links
route point-to-point to sieve shards, fresh URLs point-to-point to host
shards, both as object refs.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .. import burl
from ..hashing import hash64, hash_probe, HASH_IMPL
from ..html_parser import ParseHTMLBatch
from ..sieve import SieveService, route_by_hash
from .hosts import HostShard
from .pageserver import load_page_servers

MAX_LINKS_PER_PAGE = 4096  # discovery_seq = fetch_seq * MAX_LINKS + idx


@dataclass
class CrawlConfig:
    pages_dir: str = ""
    store_dir: str = "/tmp/bubing_store"
    seeds: list = field(default_factory=list)
    # politeness (defaults = the reference's test fixture,
    # data/.../bubing-test.properties)
    sa_delay_ms: int = 4000
    ip_delay_ms: int = 500
    round_ms: int = 1000
    keepalive: int = 2
    # keepAliveTime window (FetchingThread.java:296-298): caps a host's
    # batch at keepalive_time_ms of predicted wall time (EWMA-learned
    # per-fetch cost; prior before any observation). 0 = count-only.
    keepalive_time_ms: int = 0
    fetch_cost_prior_ms: int = 100
    # multi-agent ipDelay attenuation (StartupConfiguration.java:213-226)
    ip_delay_factor: float = 0.0
    n_agents: int = 1
    max_urls: int = 1 << 40
    max_urls_per_host: int = 1 << 30
    robots_expiration_ms: int = 24 * 3_600_000
    user_agent: str = "BUbiNG"
    retry_quantum_ms: int = 0  # coalesce retry wake-ups (0 = exact)
    # sharding
    n_host_shards: int = 4
    n_sieve_shards: int = 4
    n_digest_shards: int = 4
    # scheduling
    front_budget: int = 100_000  # max ready rows per round
    parse_chunk: int = 512  # fetch/parse task granularity (rows, host-aligned)
    max_rounds: int = 1 << 30
    checkpoint_every: int = 0  # 0 = only on stop
    checkpoint_dir: str = ""
    store_html: bool = True
    # max outstanding deferred store/robots parquet writes: each pins
    # one parsed chunk (<= parse_chunk pages, each <= the fetch body
    # cap) in the object store until its write lands — lower this when
    # pages are large relative to worker memory
    max_pending_sinks: int = 256
    # robots side-store (the robots.warc.gz analogue, Frontier.java:201-203):
    # "" = off; else a directory of per-round robots-response Parquet
    robots_store_dir: str = ""
    # workbench/virtualizer split: per-host in-RAM queue cap; overflow
    # spills to Parquet frontier segments under spill_dir (defaults to
    # <store_dir>/_spill when head_cap is set)
    head_cap: int = 1 << 30
    spill_dir: str = ""
    spill_segment_rows: int = 50_000
    # seen-set RAM budget per sieve shard; overflow merges into a
    # memory-mapped sorted disk run (Mercator's on-disk hash store)
    sieve_max_ram_hashes: int = 1 << 62
    sieve_spill_dir: str = ""
    # content-digest seen-set RAM budget (same spill machinery): at
    # 10^10 pages the digest store must not be RAM-only
    digest_max_ram_hashes: int = 1 << 62
    digest_spill_dir: str = ""
    # adaptive front (Frontier.java:824-835 / Distributor.java:249-257):
    # when a round fills the whole front budget the working set is the
    # limiting factor, so the budget grows by 25% up to front_budget_max
    front_budget_max: int = 2_000_000
    host_idle_expiry_ms: int = 0  # 0 = off; reference default is 1 day
    # IdentitySieve: URL dedup off; requires follow_filter="false"
    # (RuntimeConfiguration.java:459 guard) or the crawl never terminates
    identity_sieve: bool = False
    # sandbox DNS (module:function returning uint32 for a hostname)
    dns_module: str = "bubing_ray.pages"
    dns_name: str = "resolve_ip"
    # fetch transport: "pages" = sandbox lookup-join over pages_dir;
    # "http" = live HTTP FetchActor pool (frontier/fetcher.py — the
    # FetchingThread analogue: keep-alive per host, cookie jar,
    # optional pinned-IP connect)
    fetch_mode: str = "pages"
    # pace the logical clock against wall time so live hosts are never
    # fetched faster than sa_delay/ip_delay in REAL seconds (round-5
    # review: the virtual clock + event jumps otherwise hammer a live
    # site back-to-back).  None = on exactly when fetch_mode == "http";
    # the sandbox transport stays virtual-time (throughput measures the
    # engine, BASELINE.md protocol)
    wall_clock_politeness: bool | None = None
    fetch_timeout_s: float = 10.0
    fetch_pin_ip: bool = False
    fetch_max_body: int = 1 << 22
    # http-mode concurrency per shard: real-web latency (~1 s/fetch)
    # demands hundreds of in-flight fetches per agent (the reference
    # sizes fetching threads "in the hundreds or even thousands",
    # StartupConfiguration.java:169-176).  Threads sit in blocking reads,
    # so thread-per-host is cheap; total width = n_host_shards * threads.
    fetch_threads: int = 256
    fetch_max_hosts: int = 8192
    # content dedup scope: False = host-salted digests (reference default)
    cross_authority_duplicates: bool = False
    # filter mini-language expressions (ops/filter_lang; "" = TRUE) — the
    # reference's fetchFilter / scheduleFilter / followFilter / storeFilter
    # hooks (StartupConfiguration.java:179-196)
    fetch_filter: str = ""
    schedule_filter: str = ""
    follow_filter: str = ""
    store_filter: str = ""
    # startup host/IP blacklist (RuntimeConfiguration.java:150-156);
    # hosts match full scheme+authority or bare authority, IPs are the
    # resolver's uint32 values.  Crawler.add_blacklist() adds live.
    blacklist_hosts: tuple = ()
    blacklist_ips: tuple = ()
    # multi-node actor placement (single-node = no-op):
    #   "none"   — Ray's default scheduling (the tested single-node path)
    #   "spread" — SPREAD every shard actor across nodes (even load)
    #   "pair"   — a SPREAD placement group with one bundle per host
    #              shard; HostShard[p] and its co-partitioned fetch/page
    #              server land in bundle p (same node), so the
    #              emit->fetch->report hot path never crosses nodes —
    #              only sieve routing and store writes do.
    #              See docs/MULTINODE.md for the deployment story.
    placement: str = "none"


def parse_cfg_filter(expr: str):
    if not expr:
        return None
    from ..ops.filter_lang import parse_filter

    return parse_filter(expr)


def _dns(cfg: CrawlConfig):
    import importlib

    return getattr(importlib.import_module(cfg.dns_module), cfg.dns_name)


def _host_chunks(t: pa.Table, target: int) -> list[pa.Table]:
    """Split a ready batch into host-aligned chunks of ~target rows so
    fetch/parse parallelism tracks round size, not shard count, while a
    host's keep-alive batch (and thus its politeness report) never spans
    two tasks."""
    if t.num_rows <= target:
        return [t]
    sa = np.asarray(t.column("sa").to_numpy(zero_copy_only=False))
    bounds = np.flatnonzero(sa[1:] != sa[:-1]) + 1
    bounds = np.concatenate([[0], bounds, [len(sa)]])
    chunks = []
    start = 0
    for b in bounds[1:]:
        if b - start >= target:
            chunks.append(t.slice(start, b - start))
            start = b
    if start < len(sa):
        chunks.append(t.slice(start, len(sa) - start))
    return chunks


# ---------------------------------------------------------------- remote tasks

@ray.remote(num_returns=2)
def _parse_task(fetched: pa.Table, cross_authority: bool):
    """Parse non-robots rows: text, digest, links (robots rows pass the
    host shard directly; they are not parsed here).  Returns (parsed,
    digest_cols) as two object refs so the driver's tiny content-dedup
    input does not cost an extra task hop."""
    # single combined mask: each .filter() copies the (binary-heavy)
    # body column, so two passes cost a full extra allocation sweep
    t = fetched.filter(
        pc.and_(
            pc.invert(fetched.column("is_robots")),
            pc.is_null(fetched.column("error")),
        )
    )
    if t.num_rows == 0:
        return None, None
    parsed = ParseHTMLBatch(cross_authority_duplicates=cross_authority)(t)
    return parsed, parsed.select(["fetch_seq", "digest64"])


@ray.remote
def _store_task(parsed: pa.Table, novel_seqs: np.ndarray, path: str, store_html: bool,
                lineage: dict | None = None, store_filter: str = "") -> int:
    """Write this shard's store partition for the round (rows carry
    fetch_seq; the file carries round/shard lineage metadata so a
    resumed run can skip finished partitions)."""
    import json as _json

    import pyarrow.parquet as pq

    if parsed is None:
        return 0
    is_dup = pc.invert(
        pa.array(np.isin(parsed.column("fetch_seq").to_numpy(), novel_seqs))
    )
    t = parsed.append_column("is_duplicate", is_dup)
    pred = parse_cfg_filter(store_filter)
    if pred is not None:  # storeFilter gates what is persisted
        t = t.filter(pa.array(pred(t)))
    drop = ["links", "is_robots", "error", "robots_body"]
    if not store_html:
        drop.append("html")
    t = t.drop_columns([c for c in drop if c in t.column_names])
    if lineage:
        t = t.replace_schema_metadata({"bubing.lineage": _json.dumps(lineage)})
    pq.write_table(t, path)
    return t.num_rows


@ray.remote
def _robots_extract_task(fetched: pa.Table) -> pa.Table | None:
    """Project this chunk's robots.txt responses (url, sa, warc_ts,
    status, body) into a small standalone table.  Runs eagerly inside
    the round so the deferred write below pins only the few robots rows
    in the object store, never the whole (page-body-heavy) chunk."""
    t = fetched.filter(fetched.column("is_robots"))
    if t.num_rows == 0:
        return None
    return pa.table(
        {
            "url": t.column("url"),
            "sa": t.column("sa"),
            "warc_ts": t.column("warc_ts"),
            "status": t.column("status"),
            "body": t.column("html"),
        }
    )


@ray.remote
def _robots_store_task(robots: pa.Table | None, path: str) -> int:
    """Persist the extracted robots.txt rows — the separate robots WARC
    stream of the reference (Frontier.java:201-203, written at
    ParsingThread.java:323-325)."""
    import pyarrow.parquet as pq

    if robots is None or robots.num_rows == 0:
        return 0
    pq.write_table(robots, path)
    return robots.num_rows


@ray.remote
def _links_explode_task(
    parsed: pa.Table,
    max_url_len: int = 2048,
    follow_filter: str = "",
    schedule_filter: str = "",
) -> pa.Table | None:
    """Stage A of link handling: explode, filter and hash every link of
    every successfully parsed page — everything that does NOT depend on
    this round's content-dedup outcome — so it overlaps the digest
    barrier on the driver.  Returns the per-link table (sa, pq,
    url_hash, seq); ``_links_route_task`` (stage B) drops links of
    duplicate pages (seq encodes the page's fetch_seq), DNS-resolves the
    survivors, and routes them to the sieve shards.  DNS deliberately
    lives in stage B: with a live resolver, links of duplicate pages
    must never cost network traffic."""
    if parsed is None:
        return None
    t = parsed
    fpred = parse_cfg_filter(follow_filter)
    if fpred is not None:  # followFilter gates whose links are followed
        t = t.filter(pa.array(fpred(t)))
    if t.num_rows == 0:
        return None
    links = t.column("links")
    fseq = t.column("fetch_seq").to_numpy()
    flat = links.combine_chunks()
    values = flat.flatten()  # respects any slice offset
    offsets = flat.offsets.to_numpy()
    offsets = offsets - offsets[0]
    lens = np.diff(offsets)
    if int(lens.sum()) == 0:
        return None
    row_idx = np.repeat(np.arange(len(fseq)), lens)
    link_idx = np.arange(len(values)) - np.repeat(offsets[:-1], lens)
    ok = link_idx < MAX_LINKS_PER_PAGE
    values = values.filter(pa.array(ok))
    row_idx = row_idx[ok]
    link_idx = link_idx[ok]
    seq = fseq[row_idx] * MAX_LINKS_PER_PAGE + link_idx
    # schedule filter: http/https (anchored starts_with, not a regex),
    # bounded length (links are already canonical — resolve()
    # canonicalizes during extraction)
    urls = values
    mask = pc.and_(
        pc.or_(pc.starts_with(urls, "http://"), pc.starts_with(urls, "https://")),
        pc.less_equal(pc.utf8_length(urls), max_url_len),
    )
    spred = parse_cfg_filter(schedule_filter)
    if spred is not None:  # scheduleFilter on each extracted link
        mask = pc.and_(mask, pa.array(spred(pa.table({"url": urls}))))
    m = mask.to_numpy(zero_copy_only=False).astype(bool)
    urls = urls.filter(mask)
    seq = seq[m]
    if len(urls) == 0:
        return None
    sa, pq_ = burl.split_batch(urls)
    return pa.table(
        {
            "sa": sa,
            "pq": pq_,
            "url_hash": pa.array(hash64(urls), pa.uint64()),
            "seq": pa.array(seq, pa.int64()),
        }
    )


@ray.remote
def _links_route_task(
    linktbl: pa.Table | None,
    novel_seqs: np.ndarray,
    sieve_actors: list,
    n_sieve: int,
    dns_module: str,
    dns_name: str,
):
    """Stage B of link handling: drop links discovered on duplicate
    pages (duplicates' links are not followed — the page's fetch_seq is
    recoverable from the link seq), keep the first occurrence per
    url_hash, DNS-resolve the survivors, and enqueue into the sieve
    shards (point-to-point, never via the driver)."""
    import importlib

    import polars as pl

    if linktbl is None or linktbl.num_rows == 0:
        return 0, []
    page_seq = linktbl.column("seq").to_numpy() // MAX_LINKS_PER_PAGE
    keep = np.isin(page_seq, novel_seqs)
    if not keep.all():
        linktbl = linktbl.filter(pa.array(keep))
        if linktbl.num_rows == 0:
            return 0, []
    # in-task pre-dedup: keep first occurrence per url_hash (cuts sieve
    # traffic ~the way the reference's front-line URL cache does)
    df = pl.from_arrow(linktbl)
    df = df.sort("seq").unique(subset=["url_hash"], keep="first", maintain_order=True)
    # DNS after the novel filter + pre-dedup: one resolution per unique
    # surviving host, never for links of duplicate pages (equivalent to
    # resolving before dedup — url_hash determines the URL, hence the
    # host, hence the DNS result)
    dns_fn = getattr(importlib.import_module(dns_module), dns_name)
    hosts = df["sa"].str.extract(r"^[a-z]+://(?:[^/@]*@)?([^/:?]+)", 1)
    ip_map = {h: dns_fn(h) for h in hosts.unique().to_list()}
    ips_s = hosts.replace_strict(ip_map, return_dtype=pl.UInt32)
    # negative DNS (resolver returned None): the URL can never be
    # fetched and has no IP to route by — drop it (DNSThread's
    # unknown-host path applied at discovery time)
    df = df.with_columns(ips_s.alias("ip")).filter(pl.col("ip").is_not_null())
    if df.height == 0:
        return 0, []
    tbl = df.to_arrow()
    tbl = pa.table({n: tbl.column(n).cast(tp) for n, tp in
                    [("sa", pa.string()), ("pq", pa.string()), ("url_hash", pa.uint64()),
                     ("seq", pa.int64()), ("ip", pa.uint32())]})
    parts = route_by_hash(tbl, "url_hash", n_sieve)
    acks = [
        sieve_actors[s].enqueue.remote(parts[s])
        for s in range(n_sieve)
        if parts[s].num_rows
    ]
    # do NOT block on the acks here: a task blocked in ray.get pins a
    # worker slot (worker-pool explosion at low CPU counts); the driver
    # awaits the returned refs before flushing the sieve
    return tbl.num_rows, acks


@ray.remote
def _absorb_task(fresh: pa.Table, host_actors: list, n_hosts: int):
    """Route a sieve shard's novel URLs to host shards by IP. Returns
    (count, absorb ack refs) — the driver awaits the acks (blocking
    inside the task would pin a worker slot)."""
    from ..sieve import absorb_by_ip

    if fresh is None or fresh.num_rows == 0:
        return 0, []
    return fresh.num_rows, absorb_by_ip(fresh, host_actors, n_hosts)


# ------------------------------------------------------------------- crawler

class Crawler:
    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg
        self.dns = _dns(cfg)
        fetch_pred = parse_cfg_filter(cfg.fetch_filter)
        spill_dir = cfg.spill_dir or (
            os.path.join(cfg.store_dir, "_spill") if cfg.head_cap < (1 << 30) else ""
        )
        # -- multi-node placement (docs/MULTINODE.md) ---------------------
        self._pg = None
        host_opts: list[dict] = [{} for _ in range(cfg.n_host_shards)]
        pool_opts: dict = {}
        if cfg.placement == "spread":
            host_opts = [{"scheduling_strategy": "SPREAD"}] * cfg.n_host_shards
            pool_opts = {"scheduling_strategy": "SPREAD"}
        elif cfg.placement == "pair":
            from ray.util.placement_group import placement_group
            from ray.util.scheduling_strategies import (
                PlacementGroupSchedulingStrategy,
            )

            # one bundle per shard pair (HostShard + its server), spread
            # across nodes; tiny CPU reservations so bundles always fit
            self._pg = placement_group(
                [{"CPU": 0.2}] * cfg.n_host_shards, strategy="SPREAD"
            )
            ray.get(self._pg.ready())
            host_opts = [
                {
                    "scheduling_strategy": PlacementGroupSchedulingStrategy(
                        self._pg, placement_group_bundle_index=p
                    )
                }
                for p in range(cfg.n_host_shards)
            ]
            pool_opts = {"scheduling_strategy": "SPREAD"}
        self._host_opts = host_opts
        self.hosts = [
            (HostShard.options(**host_opts[p]) if host_opts[p] else HostShard).remote(
                p,
                fetch_filter=fetch_pred,
                head_cap=cfg.head_cap,
                spill_dir=spill_dir,
                spill_segment_rows=cfg.spill_segment_rows,
                host_idle_expiry_ms=cfg.host_idle_expiry_ms,
                sa_delay_ms=cfg.sa_delay_ms,
                ip_delay_ms=cfg.ip_delay_ms,
                keepalive=cfg.keepalive,
                keepalive_time_ms=cfg.keepalive_time_ms,
                fetch_cost_prior_ms=cfg.fetch_cost_prior_ms,
                ip_delay_factor=cfg.ip_delay_factor,
                n_agents=cfg.n_agents,
                max_urls_per_host=cfg.max_urls_per_host,
                robots_expiration_ms=cfg.robots_expiration_ms,
                user_agent=cfg.user_agent,
                retry_quantum_ms=cfg.retry_quantum_ms,
                real_clock=(cfg.fetch_mode == "http"),
                blacklist_hosts=cfg.blacklist_hosts,
                blacklist_ips=cfg.blacklist_ips,
            )
            for p in range(cfg.n_host_shards)
        ]
        # server p pairs with host shard p: in "pair" mode it shares
        # shard p's bundle so the hot path stays node-local
        server_opts = host_opts if cfg.placement == "pair" else (
            [pool_opts] * cfg.n_host_shards if pool_opts else None
        )
        if cfg.fetch_mode == "http":
            from .fetcher import load_fetch_actors

            self.servers = load_fetch_actors(
                cfg.n_host_shards, timeout=cfg.fetch_timeout_s,
                user_agent=cfg.user_agent, pin_ip=cfg.fetch_pin_ip,
                max_body=cfg.fetch_max_body,
                threads=cfg.fetch_threads, max_hosts=cfg.fetch_max_hosts,
                actor_options=server_opts,
            )
        else:
            self.servers = load_page_servers(
                cfg.pages_dir, cfg.n_host_shards, cfg.dns_module, cfg.dns_name,
                actor_options=server_opts,
            )
        sieve_spill = cfg.sieve_spill_dir or (
            os.path.join(cfg.store_dir, "_seen")
            if cfg.sieve_max_ram_hashes < (1 << 62) else ""
        )
        if cfg.identity_sieve and cfg.follow_filter.strip() != "false":
            raise ValueError(
                "identity_sieve requires follow_filter='false' "
                "(RuntimeConfiguration.java:459)"
            )
        self.sieve = SieveService(
            cfg.n_sieve_shards, spill_dir=sieve_spill,
            max_ram_hashes=cfg.sieve_max_ram_hashes,
            identity=cfg.identity_sieve,
            actor_options=pool_opts or None,
        )
        digest_spill = cfg.digest_spill_dir or (
            os.path.join(cfg.store_dir, "_digests_seen")
            if cfg.digest_max_ram_hashes < (1 << 62) else ""
        )
        self.digests = SieveService(
            cfg.n_digest_shards, spill_dir=digest_spill,
            max_ram_hashes=cfg.digest_max_ram_hashes,
            actor_options=pool_opts or None,
        )
        self.front_budget = cfg.front_budget
        self._paused = False
        self.round = 0
        self.seed_epoch = 0
        self.fetch_seq = 1
        self.total_fetched = 0
        self.total_stored = 0
        self.total_links = 0
        os.makedirs(cfg.store_dir, exist_ok=True)
        # per-round metrics stream (north rule: lineage + metrics); one
        # JSON line per executed round, append-only, survives resume
        self._metrics_path = os.path.join(cfg.store_dir, "_metrics.jsonl")
        self._round_t0 = None
        # store/robots writes are pure sinks: nothing inside a round
        # depends on the parquet landing, so the round loop launches
        # them and moves on (the reference's ParsingThread hands WARC
        # records to an async DiskHandler the same way,
        # ParsingThread.java:323-325).  Drained — and write errors
        # surfaced — at checkpoint(), end of run(), and shutdown().
        self._pending_sinks: list = []

    # -- seeds ---------------------------------------------------------------
    def add_seeds(self, seeds: list[str]):
        arr = burl.canonicalize_batch(pa.array(seeds, pa.string()))
        arr = arr.drop_null()
        if len(arr) == 0:
            return
        sa, pq_ = burl.split_batch(arr)
        # relative references canonicalize (by design, for link
        # resolution) but have no scheme+authority: skip them as seeds
        valid_sa = pa.compute.is_valid(sa)
        if not pa.compute.all(valid_sa).as_py():
            arr, sa, pq_ = (
                arr.filter(valid_sa), sa.filter(valid_sa), pq_.filter(valid_sa)
            )
            if len(arr) == 0:
                return
        import polars as pl

        hosts = pl.from_arrow(sa).str.extract(r"^[a-z]+://(?:[^/@]*@)?([^/:?]+)", 1)
        raw_ips = [self.dns(h) for h in hosts.to_list()]
        valid = np.array([ip is not None for ip in raw_ips], dtype=bool)
        if not valid.all():  # unresolvable seeds are skipped
            vm = pa.array(valid)
            arr, sa, pq_ = arr.filter(vm), sa.filter(vm), pq_.filter(vm)
            raw_ips = [ip for ip in raw_ips if ip is not None]
            if len(arr) == 0:
                return
        ips = np.array(raw_ips, dtype=np.uint32)
        tbl = pa.table(
            {
                "sa": sa,
                "pq": pq_,
                "url_hash": pa.array(hash64(arr), pa.uint64()),
                "seq": pa.array(np.arange(len(arr)), pa.int64()),
                "ip": pa.array(ips, pa.uint32()),
            }
        )
        fresh = self.sieve.check_and_add(tbl)
        _, acks = ray.get(_absorb_task.remote(fresh, self.hosts, self.cfg.n_host_shards))
        if acks:
            ray.get(acks)
        self.seed_epoch += 1

    # -- one round -----------------------------------------------------------
    def run_round(self, timing: dict | None = None) -> dict:
        def _t(key, t0):
            if timing is not None:
                timing[key] = timing.get(key, 0.0) + (time.perf_counter() - t0)
            return time.perf_counter()

        cfg = self.cfg
        now = self.round * cfg.round_ms
        round_t_start = time.perf_counter()
        t0 = round_t_start
        if self._paused:
            # paused (Agent.java:198-212): no emission, but pending
            # sieve flushes/absorbs still drain so discovered URLs land
            # on the workbench; self.round (the virtual clock) is frozen
            absorb_outs = ray.get(
                [sh.flush_to.remote(self.hosts, cfg.n_host_shards)
                 for sh in self.sieve.shards]
            )
            acks = [a for _, acks in absorb_outs for a in acks]
            if acks:
                ray.get(acks)
            return {"ready": 0, "paused": True, "idle": False,
                    "next_event": None,
                    "absorbed": sum(n for n, _ in absorb_outs)}
        budget = min(self.front_budget, max(0, cfg.max_urls - self.total_fetched) + cfg.n_host_shards)
        per_shard = max(1, budget // cfg.n_host_shards)
        emitted = ray.get(
            [h.emit_ready_ev.remote(now, per_shard) for h in self.hosts]
        )
        ready_tbls = [t for t, _, _ in emitted]
        next_evs = [ev for _, ev, _ in emitted if ev is not None]
        all_idle = all(i for _, _, i in emitted)
        t0 = _t("emit", t0)
        n_ready = sum(t.num_rows for t in ready_tbls)
        if any(t.num_rows >= per_shard for t in ready_tbls):
            # SOME shard filled its quota: the front clipped this round
            # (per-shard signal — under host->shard skew the hot shard
            # clips while others sit idle, and the global total would
            # never trip; Frontier.java:824-835 grows on starvation)
            self.front_budget = min(
                cfg.front_budget_max, int(self.front_budget * 1.25) + 1
            )
        if n_ready == 0:
            # exact while nothing was emitted: no reports/absorbs can
            # move events earlier this round
            return {"ready": 0, "next_event": min(next_evs) if next_evs else None,
                    "idle": all_idle}
        # assign global fetch_seq (deterministic: shard order, then row
        # order), then split into host-aligned chunks — the fetch/parse/
        # store/links unit — so task parallelism follows round size
        fetched_refs = []
        report_shards = []
        robots_counts = []
        for p, t in enumerate(ready_tbls):
            if t.num_rows == 0:
                continue
            t = t.append_column(
                "fetch_seq",
                pa.array(np.arange(self.fetch_seq, self.fetch_seq + t.num_rows), pa.int64()),
            )
            self.fetch_seq += t.num_rows
            for chunk in _host_chunks(t, cfg.parse_chunk):
                fetched_refs.append(self.servers[p].fetch.remote(chunk))
                report_shards.append(p)
                robots_counts.append(pc.sum(chunk.column("is_robots")).as_py() or 0)
        n_pages_fetched = sum(
            t.num_rows - pc.sum(t.column("is_robots")).as_py() for t in ready_tbls if t.num_rows
        )

        # parse (per shard, off-driver); second return = the tiny
        # (fetch_seq, digest64) table for content dedup
        parse_outs = [
            _parse_task.remote(fref, cfg.cross_authority_duplicates) for fref in fetched_refs
        ]
        parsed_refs = [o[0] for o in parse_outs]
        digest_refs = [o[1] for o in parse_outs]

        # link stage A launches NOW (depends only on parsed): explode/
        # filter/hash runs while the driver waits on the digest barrier
        # below; only the novel-filter + DNS + route (stage B) waits for
        # the round's content-dedup outcome
        linkA_refs = [
            _links_explode_task.remote(
                pref,
                2048,
                cfg.follow_filter,
                cfg.schedule_filter,
            )
            for pref in parsed_refs
        ]

        t0 = _t("launch", t0)
        digest_vals = ray.get(digest_refs)
        live = [i for i, t in enumerate(digest_vals) if t is not None]
        digest_tbls = [digest_vals[i] for i in live]
        t0 = _t("digest_cols", t0)
        novel_seqs = np.empty(0, dtype=np.int64)
        if digest_tbls:
            dt = pa.concat_tables(digest_tbls)
            dt = pa.table(
                {
                    "url_hash": dt.column("digest64"),
                    "seq": dt.column("fetch_seq"),
                }
            )
            novel = self.digests.check_and_add(dt)
            novel_seqs = novel.column("seq").to_numpy().astype(np.int64)
        novel_ref = ray.put(novel_seqs)
        t0 = _t("digest_check", t0)

        # store + links, per shard
        round_dir = os.path.join(cfg.store_dir, f"round={self.round:06d}")
        os.makedirs(round_dir, exist_ok=True)
        store_refs = [
            _store_task.remote(
                parsed_refs[i],
                novel_ref,
                os.path.join(round_dir, f"part-{i:04d}.parquet"),
                cfg.store_html,
                {"round": self.round, "host_shard": report_shards[i],
                 "seed_epoch": self.seed_epoch},
                cfg.store_filter,
            )
            for i in live
        ]
        link_refs = [
            _links_route_task.remote(
                linkA_refs[i],
                novel_ref,
                self.sieve.shards,
                cfg.n_sieve_shards,
                cfg.dns_module,
                cfg.dns_name,
            )
            for i in live
        ]
        # robots side-store (optional)
        robots_refs = []
        if cfg.robots_store_dir:
            rdir = os.path.join(cfg.robots_store_dir, f"round={self.round:06d}")
            made = False
            for i, t in enumerate(fetched_refs):
                # only chunks that actually carried a robots row
                if not robots_counts[i]:
                    continue
                if not made:
                    os.makedirs(rdir, exist_ok=True)
                    made = True
                robots_refs.append(
                    _robots_store_task.remote(
                        _robots_extract_task.remote(t),
                        os.path.join(rdir, f"part-{i:04d}.parquet"),
                    )
                )

        # report outcomes to host shards (politeness/retry) in parallel
        now_end = now + cfg.round_ms // 2
        report_acks = [
            self.hosts[report_shards[i]].report.remote(fetched_refs[i], now_end)
            for i in range(len(fetched_refs))
        ]

        if parse_cfg_filter(cfg.store_filter) is None:
            # no storeFilter: every parsed row is written, and the
            # per-chunk parsed row count is already on the driver (the
            # digest tables are parsed.select(...)), so the round does
            # not wait for the sink — writes overlap the next rounds'
            # fetch/parse and are drained at checkpoint/end-of-run.
            # Like the reference's async DiskHandler, "stored" counts
            # rows HANDED to the sink; checkpoints drain first, so
            # checkpointed counters never outrun the disk, but the
            # best-effort per-round metrics lines between checkpoints
            # can (a write error surfaces within max_pending_sinks
            # rounds, at the next drain point)
            stored = sum(t.num_rows for t in digest_tbls)
            self._pending_sinks.extend(store_refs)
            self._pending_sinks.extend(robots_refs)
            # backpressure: parsed tables stay pinned in the object
            # store while their write is outstanding — cap the backlog
            if len(self._pending_sinks) > cfg.max_pending_sinks:
                n_over = len(self._pending_sinks) - cfg.max_pending_sinks
                done, rest = ray.wait(self._pending_sinks, num_returns=n_over)
                # trim BEFORE get: if a write failed, the poisoned ref
                # must not stay in the list and re-raise on every later
                # drain (ray.wait returns completion order, so "done"
                # are simply the first finishers, not the oldest)
                self._pending_sinks = rest
                ray.get(done)  # surface write errors
        else:
            # a storeFilter changes the stored-row count, which gates
            # max_urls accounting — keep the exact (blocking) path
            stored = sum(ray.get(store_refs))
            if robots_refs:
                ray.get(robots_refs)
        t0 = _t("store", t0)
        link_outs = ray.get(link_refs)
        n_links = sum(n for n, _ in link_outs)
        enqueue_acks = [a for _, acks in link_outs for a in acks]
        if enqueue_acks:
            ray.get(enqueue_acks)  # all sieve enqueues landed before flush
        t0 = _t("links", t0)
        ray.get(report_acks)
        t0 = _t("report", t0)

        # sieve flush -> absorb fresh URLs (actor-to-actor routing)
        absorb_outs = ray.get(
            [sh.flush_to.remote(self.hosts, cfg.n_host_shards) for sh in self.sieve.shards]
        )
        absorbed = sum(n for n, _ in absorb_outs)
        absorb_acks = [a for _, acks in absorb_outs for a in acks]
        if absorb_acks:
            ray.get(absorb_acks)  # absorbs land before this round ends
        t0 = _t("absorb", t0)

        # per-round metrics line
        try:
            with open(self._metrics_path, "a") as mf:
                mf.write(json.dumps({
                    "round": self.round, "now_ms": now, "ready": n_ready,
                    "attempted": n_pages_fetched, "stored": stored,
                    "links": n_links, "absorbed": absorbed,
                    "total_fetched": self.total_fetched + stored,
                    "wall_s": round(time.perf_counter() - round_t_start, 4),
                }) + "\n")
        except OSError:
            pass  # metrics are best-effort

        # fetched = successfully parsed pages (non-robots, non-error) —
        # the same accounting the sequential model uses for max_urls
        self.total_fetched += stored
        self.total_stored += stored
        self.total_links += n_links
        self.round += 1
        if cfg.checkpoint_every and self.round % cfg.checkpoint_every == 0:
            self.checkpoint()
        return {
            "ready": n_ready,
            "attempted": n_pages_fetched,
            "fetched": stored,
            "links": n_links,
            "absorbed": absorbed,
        }

    # -- full loop -----------------------------------------------------------
    def run(self, verbose: bool = False) -> dict:
        t0 = time.time()
        idle_rounds = 0
        paused_drained = False  # pause pipeline fully drained: stop RPCs
        cfg = self.cfg
        pace = (cfg.wall_clock_politeness if cfg.wall_clock_politeness
                is not None else cfg.fetch_mode == "http")
        while self.round < self.cfg.max_rounds and self.total_fetched < self.cfg.max_urls:
            if self._paused and paused_drained:
                # everything in flight at pause time has landed and a
                # drain returned nothing — poll for resume without
                # hammering the sieve shards with empty flush RPCs
                # (add_seeds absorbs through its own path, so nothing
                # new can appear in the sieve buffers while paused)
                time.sleep(self.cfg.round_ms / 1000.0)
                continue
            round_before, iter_t0 = self.round, time.time()
            r = self.run_round()
            if verbose and self.round % 20 == 0:
                print(f"round={self.round} {r} total={self.total_fetched}")
            if r.get("paused"):
                # wait in real time for a resume (JMX-style control from
                # another thread); never counts toward idle detection
                paused_drained = r.get("absorbed", 0) == 0
                time.sleep(self.cfg.round_ms / 1000.0)
                continue
            paused_drained = False
            if r.get("ready", 0) == 0:
                idle_rounds += 1
                if r.get("idle", False):
                    break
                # hosts are backing off (politeness/retry): jump the
                # logical clock straight to the next host event — the
                # event times came back with the (empty) emission, so
                # the jump costs no extra actor round-trips
                ev = r.get("next_event")
                if ev is not None:
                    self.round = max(self.round, -(-ev // self.cfg.round_ms))
                elif idle_rounds > 4:
                    break  # only in-flight/absorb races remain; drain
            else:
                idle_rounds = 0
            if pace:
                # live transport: every logical ms this iteration
                # advanced (rounds fetched AND event jumps) must cost at
                # least as much wall time, so per-host wall separation
                # >= the logical sa/ip delays — the reference waits in
                # real time for the same reason (FetchingThread sleeps)
                lag = ((self.round - round_before) * cfg.round_ms / 1000.0
                       - (time.time() - iter_t0))
                if lag > 0:
                    time.sleep(lag)
        self._drain_sinks()  # run() returns only with the store on disk
        stats = self.stats()
        stats["wall_s"] = time.time() - t0
        return stats

    def idle(self) -> bool:
        return all(ray.get([h.idle.remote() for h in self.hosts]))

    def set_politeness(self, **kw) -> list[dict]:
        """Runtime control: broadcast new politeness settings to every
        host shard (the JMX runtime-attribute surface)."""
        return ray.get([h.set_politeness.remote(**kw) for h in self.hosts])

    def add_blacklist(self, hosts=None, ips=None) -> list[dict]:
        """Runtime control: broadcast a host/IP blacklist add to every
        host shard (Agent.java:221-232 addBlackListedHost /
        addBlackListedIPv4) — matching queued/spilled URLs drop NOW
        (dropped_blacklist counter), future absorbs drop at the gate."""
        return ray.get([h.add_blacklist.remote(hosts=hosts, ips=ips)
                        for h in self.hosts])

    def pause(self) -> None:
        """Runtime control (Agent.java:198-212 pause): stop emitting
        fetch batches without killing actors — paused rounds still
        drain pending sieve flushes and absorbs, and the virtual clock
        does not advance, so a resumed crawl continues exactly."""
        self._paused = True

    def resume(self) -> None:
        """Re-enter normal rounds after :meth:`pause` (Agent.java:198-212)."""
        self._paused = False

    def _drain_sinks(self):
        """Block until every deferred store/robots write has landed
        (raising the first write error, oldest first)."""
        if self._pending_sinks:
            pending, self._pending_sinks = self._pending_sinks, []
            ray.get(pending)

    def shutdown(self):
        """Kill this crawler's actors (tests create several crawlers in
        one Ray session; reservations would otherwise accumulate)."""
        try:
            self._drain_sinks()
        finally:
            # a failed deferred write must still surface, but never at
            # the cost of leaking every actor + the placement group
            for a in self.hosts + self.servers + self.sieve.shards + self.digests.shards:
                ray.kill(a)
            self.hosts, self.servers = [], []
            self.sieve.shards, self.digests.shards = [], []
            if self._pg is not None:
                from ray.util.placement_group import remove_placement_group

                remove_placement_group(self._pg)
                self._pg = None

    def stats(self) -> dict:
        host_stats = ray.get([h.stats.remote() for h in self.hosts])
        sieve_stats = self.sieve.stats()
        return {
            "rounds": self.round,
            "fetched": self.total_fetched,
            "stored": self.total_stored,
            "links": self.total_links,
            "urls_seen": sum(s["seen"] for s in sieve_stats),
            "hosts": sum(s["hosts"] for s in host_stats),
            "queued": sum(s["queued"] for s in host_stats),
            "spilled_queued": sum(s.get("spilled_queued", 0) for s in host_stats),
            "dropped_robots": sum(s["dropped_robots"] for s in host_stats),
            "purged_hosts": sum(s["purged_hosts"] for s in host_stats),
            "dropped_blacklist": sum(
                s.get("dropped_blacklist", 0) for s in host_stats),
        }

    # -- checkpoint / resume -------------------------------------------------
    def checkpoint(self) -> str:
        """Atomic checkpoint: write to a temp dir, fsync-rename into place
        (Frontier.snap analogue, Frontier.java:851-945 — but available at
        every round boundary, not only clean shutdown)."""
        # a checkpoint promises that every store partition up to this
        # round is on disk (restore skips finished partitions)
        self._drain_sinks()
        cfg = self.cfg
        base = cfg.checkpoint_dir or os.path.join(cfg.store_dir, "_ckpt")
        tmp = base + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        self.sieve.snapshot(os.path.join(tmp, "sieve"))
        os.makedirs(os.path.join(tmp, "digests"), exist_ok=True)
        # digest service shares the sieve implementation
        refs = [
            sh.snapshot.remote(os.path.join(tmp, "digests", f"sieve-{i:04d}.parquet"))
            for i, sh in enumerate(self.digests.shards)
        ]
        ray.get(refs)
        os.makedirs(os.path.join(tmp, "hosts"), exist_ok=True)
        ray.get(
            [
                h.snapshot.remote(os.path.join(tmp, "hosts", f"hosts-{p:04d}.parquet"))
                for p, h in enumerate(self.hosts)
            ]
        )
        if cfg.fetch_mode == "http":
            # cookie jars persist with the crawl (VisitState cookie slots)
            os.makedirs(os.path.join(tmp, "fetchers"), exist_ok=True)
            ray.get(
                [
                    s.snapshot.remote(
                        os.path.join(tmp, "fetchers", f"cookies-{p:04d}.parquet")
                    )
                    for p, s in enumerate(self.servers)
                ]
            )
        scalars = {
            "round": self.round,
            "front_budget": self.front_budget,
            "seed_epoch": self.seed_epoch,
            "fetch_seq": self.fetch_seq,
            "total_fetched": self.total_fetched,
            "total_stored": self.total_stored,
            "total_links": self.total_links,
            "hash_impl": HASH_IMPL,
            "hash_probe": hash_probe(),
            "n_host_shards": cfg.n_host_shards,
            "n_sieve_shards": cfg.n_sieve_shards,
            "n_digest_shards": cfg.n_digest_shards,
        }
        with open(os.path.join(tmp, "frontier.json"), "w") as f:
            json.dump(scalars, f)
        # never a window with ZERO checkpoints on disk: retire the old
        # one by rename (atomic), promote the new one by rename, and
        # only then delete the retired copy — a crash between the two
        # renames leaves base+'.old', which restore() falls back to
        old = base + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(base):
            os.rename(base, old)
        os.rename(tmp, base)
        shutil.rmtree(old, ignore_errors=True)
        return base

    def restore(self, ckpt_dir: str | None = None):
        base = ckpt_dir or self.cfg.checkpoint_dir or os.path.join(self.cfg.store_dir, "_ckpt")
        if not os.path.isdir(base) and os.path.isdir(base + ".old"):
            # crash landed between checkpoint()'s two renames: the
            # retired checkpoint is intact under base+'.old' — promote
            # it back (the half-written '.tmp' is abandoned)
            os.rename(base + ".old", base)
        with open(os.path.join(base, "frontier.json")) as f:
            sc = json.load(f)
        if sc["hash_impl"] != HASH_IMPL or sc["hash_probe"] != hash_probe():
            raise RuntimeError(
                "checkpoint hash implementation mismatch: "
                f"{sc['hash_impl']} vs {HASH_IMPL} — rebuild the frontier or set BUBING_PORTABLE_HASH"
            )
        assert sc["n_host_shards"] == self.cfg.n_host_shards
        self.round = sc["round"]
        # stale-store GC: round partitions at/after the checkpoint
        # belong to the abandoned pre-crash timeline — a resumed run
        # (nondeterministic in http mode) may emit different chunk
        # counts, leaving phantom part files with conflicting fetch_seq
        import glob as _glob

        for root in (self.cfg.store_dir, self.cfg.robots_store_dir):
            if not root:
                continue
            for d in _glob.glob(os.path.join(root, "round=*")):
                try:
                    if int(d.rsplit("=", 1)[1]) >= self.round:
                        shutil.rmtree(d)
                except ValueError:
                    continue
        self.front_budget = sc.get("front_budget", self.cfg.front_budget)
        self.seed_epoch = sc.get("seed_epoch", 1)
        self.fetch_seq = sc["fetch_seq"]
        self.total_fetched = sc["total_fetched"]
        self.total_stored = sc["total_stored"]
        self.total_links = sc["total_links"]
        self.sieve.restore(os.path.join(base, "sieve"))
        ray.get(
            [
                sh.restore.remote(os.path.join(base, "digests", f"sieve-{i:04d}.parquet"))
                for i, sh in enumerate(self.digests.shards)
            ]
        )
        ray.get(
            [
                h.restore.remote(os.path.join(base, "hosts", f"hosts-{p:04d}.parquet"))
                for p, h in enumerate(self.hosts)
            ]
        )
        if self.cfg.fetch_mode == "http" and os.path.isdir(
            os.path.join(base, "fetchers")
        ):
            ray.get(
                [
                    s.restore.remote(
                        os.path.join(base, "fetchers", f"cookies-{p:04d}.parquet")
                    )
                    for p, s in enumerate(self.servers)
                ]
            )


def crawl(cfg: CrawlConfig, resume: bool = False, verbose: bool = False) -> dict:
    c = Crawler(cfg)
    if resume:
        c.restore()
    else:
        c.add_seeds(cfg.seeds)
    out = c.run(verbose=verbose)
    c.checkpoint()
    return out
