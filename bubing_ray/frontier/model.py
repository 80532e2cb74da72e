"""Sequential reference model of the crawl semantics.

A single-threaded, Ray-free crawler composed from the same pure state
classes (HostShardState, _ShardState) and the same parse/canonicalize
functions, driven by the same logical clock.  It defines the *expected*
observable behavior the distributed engine must reproduce — the
well-defined invariants of the reference (SURVEY.md §7.4): the final
URL-seen set, the per-host fetch order (FIFO with robots first,
``VisitState.java:185-216``), politeness timing, content-dedup
archetype election, and byte-identical extracted text.  The e2e test
runs both over the same synthetic web and compares.

Shard counts may differ from the distributed run: absorb order is
committed by global discovery seq and digest archetypes are elected by
fetch seq within a host (host-salted digests), so per-host order and
all sets are shard-count-invariant; with matching shard counts the
global fetch order matches exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import burl
from ..hashing import hash64, fnv1a64
from ..html_parser import parse_html
from ..sieve import _ShardState
from .crawl import MAX_LINKS_PER_PAGE, CrawlConfig
from .hosts import HostShardState


class SequentialCrawler:
    def __init__(self, cfg: CrawlConfig, pages_table: pa.Table, n_shards: int = 1):
        self.cfg = cfg
        import importlib

        self.dns = getattr(importlib.import_module(cfg.dns_module), cfg.dns_name)
        self.n_shards = n_shards
        from .crawl import parse_cfg_filter

        self.fetch_pred = parse_cfg_filter(cfg.fetch_filter)
        self.store_pred = parse_cfg_filter(cfg.store_filter)
        self.follow_pred = parse_cfg_filter(cfg.follow_filter)
        self.schedule_pred = parse_cfg_filter(cfg.schedule_filter)
        import tempfile

        spill_dir = cfg.spill_dir or (
            tempfile.mkdtemp(prefix="bubing_model_spill_")
            if cfg.head_cap < (1 << 30) else ""
        )
        self.hosts = [
            HostShardState(
                p,
                fetch_filter=self.fetch_pred,
                head_cap=cfg.head_cap,
                spill_dir=(spill_dir + f"/m{p}") if spill_dir else "",
                spill_segment_rows=cfg.spill_segment_rows,
                sa_delay_ms=cfg.sa_delay_ms,
                ip_delay_ms=cfg.ip_delay_ms,
                keepalive=cfg.keepalive,
                max_urls_per_host=cfg.max_urls_per_host,
                robots_expiration_ms=cfg.robots_expiration_ms,
                user_agent=cfg.user_agent,
                retry_quantum_ms=cfg.retry_quantum_ms,
            )
            for p in range(n_shards)
        ]
        self.sieve = _ShardState()
        self.digests = _ShardState()
        self.pages = {}
        for row in pages_table.to_pylist():
            self.pages[row["url"]] = row
        self.round = 0
        self.fetch_seq = 1
        self.total_fetched = 0
        self.crawl_order: list[str] = []
        self.store: dict[str, dict] = {}
        self.url_seen: set[str] = set()

    def _mk_tbl(self, urls: list[str], seqs: list[int]) -> pa.Table:
        # drop relative references (no scheme+authority -> sa None) and
        # unresolvable hosts (resolver returned None) — the engine's
        # add_seeds/_links_explode_task guards, mirrored for parity
        arr0 = pa.array(urls, pa.string())
        sa0, pq0 = burl.split_batch(arr0)
        keep, ips = [], []
        for s in sa0.to_pylist():
            ip = self.dns(burl.host_of(s)) if s is not None else None
            keep.append(ip is not None)
            if ip is not None:
                ips.append(ip)
        km = pa.array(keep)
        arr, sa, pq_ = arr0.filter(km), sa0.filter(km), pq0.filter(km)
        seqs = [q for q, k in zip(seqs, keep) if k]
        return pa.table(
            {
                "sa": sa,
                "pq": pq_,
                "url_hash": pa.array(hash64(arr), pa.uint64()),
                "seq": pa.array(seqs, pa.int64()),
                "ip": pa.array(ips, pa.uint32()),
            }
        )

    def _absorb(self, fresh: pa.Table):
        for p in range(self.n_shards):
            ips = fresh.column("ip").to_numpy(zero_copy_only=False).astype(np.uint64)
            mask = (ips % np.uint64(self.n_shards)) == p
            sub = fresh.filter(pa.array(mask))
            if sub.num_rows:
                self.hosts[p].absorb(sub)
        for u, s in zip(fresh.column("sa").to_pylist(), fresh.column("pq").to_pylist()):
            self.url_seen.add(u + s)

    def add_seeds(self, seeds: list[str]):
        canon = [burl.parse(s) for s in seeds]
        canon = [c for c in canon if c]
        tbl = self._mk_tbl(canon, list(range(len(canon))))
        self.sieve.enqueue(tbl)
        fresh = self.sieve.flush()
        if fresh is not None and fresh.num_rows:
            self._absorb(fresh)

    def run(self):
        cfg = self.cfg
        idle_rounds = 0
        while self.round < cfg.max_rounds and self.total_fetched < cfg.max_urls:
            now = self.round * cfg.round_ms
            ready = []
            for p in range(self.n_shards):
                t = self.hosts[p].emit_ready(now, 1 << 30)
                if t.num_rows:
                    ready.append(t)
            if not ready:
                if all(h.idle() for h in self.hosts):
                    break
                evs = [e for e in (h.next_event() for h in self.hosts) if e is not None]
                if not evs:
                    idle_rounds += 1
                    if idle_rounds > 4:
                        break
                    self.round += 1
                    continue
                self.round = max(self.round + 1, -(-min(evs) // cfg.round_ms))
                continue
            idle_rounds = 0
            now_end = now + cfg.round_ms // 2
            links_urls: list[str] = []
            links_seqs: list[int] = []
            digest_rows: list[tuple[int, int, dict]] = []  # (digest64, fetch_seq, meta)
            for t in ready:
                report_cols = {
                    "sa": [], "pq": [], "seq": [], "is_robots": [], "status": [],
                    "error": [], "robots_body": [],
                }
                for row in t.to_pylist():
                    fs = self.fetch_seq
                    self.fetch_seq += 1
                    url = row["url"]
                    page = self.pages.get(url)
                    status = 404 if page is None else page["status"]
                    err = "socket_timeout" if (page is not None and status == 0) else None
                    body = b"" if page is None else (page["html"] or b"")
                    report_cols["sa"].append(row["sa"])
                    report_cols["pq"].append(row["pq"])
                    report_cols["seq"].append(row["seq"])
                    report_cols["is_robots"].append(row["is_robots"])
                    report_cols["status"].append(404 if page is None else status)
                    report_cols["error"].append(err)
                    report_cols["robots_body"].append(body if row["is_robots"] else None)
                    if row["is_robots"] or err is not None:
                        continue
                    self.total_fetched += 1
                    self.crawl_order.append(url)
                    pr = parse_html(
                        url,
                        body,
                        status=status if page is not None else 404,
                        content_type=page.get("content_type") if page else None,
                        location_header=page.get("location") if page else None,
                        cross_authority_duplicates=cfg.cross_authority_duplicates,
                    )
                    d64 = int.from_bytes(pr.digest[:8], "big")
                    digest_rows.append((d64, fs, {
                        "url": url, "text": pr.text, "digest": pr.digest,
                        "links": pr.links, "fetch_seq": fs,
                        "status": status if page is not None else 404,
                        "content_type": (page.get("content_type") if page else None),
                    }))
                rt = pa.table(
                    {
                        "sa": pa.array(report_cols["sa"], pa.string()),
                        "pq": pa.array(report_cols["pq"], pa.string()),
                        "seq": pa.array(report_cols["seq"], pa.int64()),
                        "is_robots": pa.array(report_cols["is_robots"], pa.bool_()),
                        "status": pa.array(report_cols["status"], pa.int32()),
                        "error": pa.array(report_cols["error"], pa.string()),
                        "robots_body": pa.array(report_cols["robots_body"], pa.binary()),
                    }
                )
                sa0 = rt.column("sa").to_pylist()
                # route report rows back to the owning shard (resolve
                # each host once, not once per shard)
                shards0 = [
                    self.dns(burl.host_of(s)) % self.n_shards for s in sa0
                ]
                for p in range(self.n_shards):
                    sub = rt.filter(pa.array([sh == p for sh in shards0]))
                    if sub.num_rows:
                        self.hosts[p].report(sub, now_end)
            # content dedup: first fetch_seq per digest64 wins
            if digest_rows:
                dt = pa.table(
                    {
                        "url_hash": pa.array([d for d, _, _ in digest_rows], pa.uint64()),
                        "seq": pa.array([s for _, s, _ in digest_rows], pa.int64()),
                    }
                )
                self.digests.enqueue(dt)
                novel = self.digests.flush()
                novel_seqs = set(novel.column("seq").to_pylist()) if novel is not None else set()
                for d64, fs, meta in digest_rows:
                    dup = fs not in novel_seqs
                    meta["is_duplicate"] = dup
                    row_tbl = pa.table(
                        {
                            "url": pa.array([meta["url"]], pa.string()),
                            "status": pa.array([meta["status"]], pa.int32()),
                            "content_type": pa.array([meta["content_type"]], pa.string()),
                            "is_duplicate": pa.array([dup]),
                        }
                    )
                    if self.store_pred is None or bool(self.store_pred(row_tbl)[0]):
                        self.store[meta["url"]] = meta
                    if not dup and (
                        self.follow_pred is None or bool(self.follow_pred(row_tbl)[0])
                    ):
                        for i, l in enumerate(meta["links"][:MAX_LINKS_PER_PAGE]):
                            if not l.startswith(("http://", "https://")) or len(l) > 2048:
                                continue
                            if self.schedule_pred is not None and not bool(
                                self.schedule_pred(pa.table({"url": pa.array([l])}))[0]
                            ):
                                continue
                            links_urls.append(l)
                            links_seqs.append(fs * MAX_LINKS_PER_PAGE + i)
            # sieve
            if links_urls:
                self.sieve.enqueue(self._mk_tbl(links_urls, links_seqs))
                fresh = self.sieve.flush()
                if fresh is not None and fresh.num_rows:
                    self._absorb(fresh)
            self.round += 1
        return {
            "fetched": self.total_fetched,
            "rounds": self.round,
            "urls_seen": len(self.url_seen),
            "stored": len(self.store),
        }

    def per_host_order(self) -> dict[str, list[str]]:
        out: dict[str, list[str]] = {}
        for u in self.crawl_order:
            out.setdefault(burl.scheme_authority(u), []).append(u)
        return out
