"""Sharded exact URL-seen sieve — actor-pool membership service.

Ray-native rebuild of the Mercator sieve (``sieve/MercatorSieve.java:40-60``,
contract ``sieve/AbstractSieve.java:40-93``): each shard owns the hashes
whose ``url_hash % n_shards`` equals its id, kept as a small list of
sorted uint64 runs (periodically compacted — the in-memory analogue of
Mercator's sorted on-disk hash store, sized so a 10^10-URL seen set
spreads across shards independent of cluster size).  Candidates are
*enqueued* in batches tagged with a global ``seq``; ``flush()`` merges
the pending bucket against the store and emits exactly the novel URLs,
sorted by first-enqueue ``seq`` — the reference's "new URLs are emitted
in original enqueue order" guarantee (``MercatorSieve.java:47-49``).

Exactness: membership is a sorted-array lookup, no Bloom false
positives; a front-line approximate cache (the reference's
``FastApproximateByteArrayCache``) is unnecessary because enqueue
batches are pre-deduped vectorized.  Idempotence for task retries: a
re-enqueued batch dedups against both the store and the pending bucket.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray


BLOOM_BITS_LOG2 = 24  # 16 Mi bits = 2 MiB/shard; sized per shard, not per cluster
_BLOOM_MIX = np.uint64(0x9E3779B97F4A7C15)


class _ShardState:
    """Pure-python shard logic (actor-free for tests and the sequential
    reference model).

    A Bloom front filter (the north star's bloom/cuckoo membership
    front) short-circuits the sorted-run search: candidates the filter
    has definitely never seen skip the binary searches entirely — with
    a ~75% duplicate link stream (the reference's URL-cache motivation,
    FastApproximateByteArrayCache.java:27-40) most *novel* URLs cost
    two bit probes. Exactness is preserved: Bloom positives still go
    through the exact sorted-run merge.
    """

    def __init__(self, shard_id: int = 0, spill_dir: str = "",
                 max_ram_hashes: int = 1 << 62, identity: bool = False):
        # identity=True = the IdentitySieve (sieve/IdentitySieve.java):
        # no dedup, everything passes through in enqueue order — only
        # legal with a FALSE follow filter (RuntimeConfiguration.java:459)
        self.identity = identity
        self.shard_id = shard_id
        self.runs: list[np.ndarray] = []  # sorted uint64 arrays (RAM)
        # the big run: a single sorted uint64 .npy, memory-mapped — the
        # on-disk hash store of the Mercator sieve (MercatorSieve.java:
        # 274-391); RAM holds only recent runs + the Bloom front, so a
        # 10^10-hash seen set costs ~80 GB of DISK spread across shards,
        # not RAM
        self.spill_dir = spill_dir
        self.max_ram_hashes = max_ram_hashes
        self._disk_run: np.ndarray | None = None  # np.memmap when spilled
        self._disk_gen = 0
        self.pending: list[pa.Table] = []
        self.n_seen = 0
        self._bloom = np.zeros((1 << BLOOM_BITS_LOG2) >> 6, dtype=np.uint64)

    # -- bloom front ---------------------------------------------------------
    def _bloom_positions(self, h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        # BOTH probes come from the multiplied hash: shard routing pins
        # h % n_shards, so a raw low-bits probe could only reach 1/n of
        # the positions under power-of-two shard counts (round-5 review)
        m = np.uint64((1 << BLOOM_BITS_LOG2) - 1)
        with np.errstate(over="ignore"):
            g = h * _BLOOM_MIX
        return ((g >> np.uint64(8)) & m, (g >> np.uint64(40)) & m)

    def _bloom_add(self, h: np.ndarray):
        for pos in self._bloom_positions(h):
            np.bitwise_or.at(
                self._bloom, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )

    def _bloom_maybe(self, h: np.ndarray) -> np.ndarray:
        out = np.ones(len(h), dtype=bool)
        for pos in self._bloom_positions(h):
            bits = self._bloom[(pos >> np.uint64(6)).astype(np.int64)]
            out &= (bits >> (pos & np.uint64(63))) & np.uint64(1) != 0
        return out

    # -- membership ----------------------------------------------------------
    def _contains(self, h: np.ndarray) -> np.ndarray:
        out = np.zeros(len(h), dtype=bool)
        maybe = self._bloom_maybe(h)
        if not maybe.any():
            return out
        hm = h[maybe]
        sub = np.zeros(len(hm), dtype=bool)
        all_runs = list(self.runs)
        if self._disk_run is not None:
            all_runs.append(self._disk_run)
        for run in all_runs:
            if not len(run):
                continue
            idx = np.searchsorted(run, hm)
            valid = idx < len(run)
            sub[valid] |= run[idx[valid]] == hm[valid]
        out[maybe] = sub
        return out

    def enqueue(self, tbl: pa.Table) -> int:
        """Append a candidate batch (columns must include url_hash:uint64,
        seq:int64)."""
        if tbl.num_rows:
            self.pending.append(tbl)
        return tbl.num_rows

    def flush(self) -> pa.Table:
        """Dedup pending against store + itself; admit & return novel rows
        sorted by seq (first-enqueue order)."""
        if not self.pending:
            return None
        tbl = pa.concat_tables(self.pending)
        self.pending = []
        if self.identity:
            order = np.argsort(tbl.column("seq").to_numpy(), kind="stable")
            self.n_seen += tbl.num_rows
            return tbl.take(pa.array(order))
        h = tbl.column("url_hash").to_numpy().astype(np.uint64, copy=False)
        seq = tbl.column("seq").to_numpy()
        # stable first-occurrence dedup within the batch, by seq order
        order = np.argsort(seq, kind="stable")
        h_ord = h[order]
        first = np.zeros(len(h_ord), dtype=bool)
        uniq, first_idx = np.unique(h_ord, return_index=True)
        first[first_idx] = True
        # drop already-seen; `order` is seq-sorted so `keep` stays in
        # first-enqueue order
        novel_mask = ~self._contains(h_ord) & first
        keep = order[novel_mask]
        new_hashes = np.sort(h[keep].astype(np.uint64))
        if len(new_hashes):
            self.runs.append(new_hashes)
            self._bloom_add(new_hashes)
            self.n_seen += len(new_hashes)
            if len(self.runs) > 8:
                self.runs = [np.sort(np.concatenate(self.runs))]
            self._maybe_spill()
        return tbl.take(pa.array(keep)) if len(keep) else tbl.slice(0, 0)

    def _maybe_spill(self):
        """Merge RAM runs into the memory-mapped disk run when over the
        RAM budget (Mercator's periodic store merge)."""
        if not self.spill_dir:
            return
        ram = sum(len(r) for r in self.runs)
        if ram < self.max_ram_hashes:
            return
        os.makedirs(self.spill_dir, exist_ok=True)
        parts = [r for r in self.runs if len(r)]
        if self._disk_run is not None and len(self._disk_run):
            parts.append(np.asarray(self._disk_run))
        merged = np.sort(np.concatenate(parts)) if parts else np.empty(0, np.uint64)
        self._disk_gen += 1
        path = os.path.join(
            self.spill_dir, f"seen-{self.shard_id:03d}-{self._disk_gen:06d}.npy"
        )
        np.save(path, merged)
        old = getattr(self, "_disk_path", None)
        self._disk_run = np.load(path, mmap_mode="r")
        self._disk_path = path
        self.runs = []
        if old and os.path.exists(old):
            os.remove(old)

    # -- checkpoint ----------------------------------------------------------
    def snapshot(self, path: str):
        parts = [r for r in self.runs if len(r)]
        if self._disk_run is not None and len(self._disk_run):
            parts.append(np.asarray(self._disk_run))
        allh = np.sort(np.concatenate(parts)) if parts else np.empty(0, np.uint64)
        if self._disk_run is None:
            self.runs = [allh] if len(allh) else []
        # lineage metadata: any shard file is self-describing (north
        # rule: per-partition lineage so a crawl resumes from any ckpt)
        t = pa.table({"h": pa.array(allh, pa.uint64())}).replace_schema_metadata(
            {"bubing.dedup_shard": str(self.shard_id), "bubing.n_seen": str(self.n_seen)}
        )
        pq.write_table(t, path)

    def restore(self, path: str):
        t = pq.read_table(path)
        h = t.column("h").to_numpy().astype(np.uint64, copy=False)
        self.runs = [h] if len(h) else []
        self._disk_run = None
        self.n_seen = len(h)
        self.pending = []
        self._bloom[:] = 0
        if len(h):
            self._bloom_add(h)
        self._maybe_spill()

    def stats(self) -> dict:
        return {"shard": self.shard_id, "seen": self.n_seen, "runs": len(self.runs), "pending": len(self.pending)}

    def all_hashes(self) -> np.ndarray:
        parts = [r for r in self.runs if len(r)]
        if self._disk_run is not None and len(self._disk_run):
            parts.append(np.asarray(self._disk_run))
        return np.sort(np.concatenate(parts)) if parts else np.empty(0, np.uint64)


@ray.remote(num_cpus=0.05)
class SieveShard:
    """One shard of the URL-seen membership service."""

    def __init__(self, shard_id: int, spill_dir: str = "", max_ram_hashes: int = 1 << 62,
                 identity: bool = False):
        self.s = _ShardState(shard_id, spill_dir=spill_dir,
                             max_ram_hashes=max_ram_hashes, identity=identity)

    def enqueue(self, tbl: pa.Table) -> int:
        return self.s.enqueue(tbl)

    def flush(self) -> pa.Table | None:
        return self.s.flush()

    def enqueue_flush(self, tbl: pa.Table) -> pa.Table | None:
        """One-call path: enqueue a pre-routed batch and flush immediately
        (used by the round loop — one RPC per shard per round)."""
        self.s.enqueue(tbl)
        return self.s.flush()

    def flush_to(self, host_actors: list, n_hosts: int):
        """Flush and route the novel URLs straight to the host shards by
        IP (actor-to-actor; returns (count, absorb ack refs) so the
        driver can await delivery without a middleman task)."""
        fresh = self.s.flush()
        if fresh is None or fresh.num_rows == 0:
            return 0, []
        return fresh.num_rows, absorb_by_ip(fresh, host_actors, n_hosts)

    def snapshot(self, path: str) -> dict:
        self.s.snapshot(path)
        return self.s.stats()

    def restore(self, path: str):
        self.s.restore(path)

    def stats(self) -> dict:
        return self.s.stats()

    def all_hashes(self) -> np.ndarray:
        return self.s.all_hashes()


def absorb_by_ip(tbl: pa.Table, host_actors: list, n_hosts: int) -> list:
    """Route a fresh-URL table to the host-shard actors by ``ip %
    n_hosts`` and return the absorb ack refs — the single home of the
    IP-dispatch invariant (used by SieveShard.flush_to and the crawl's
    _absorb_task)."""
    parts = route_by_hash(tbl, "ip", n_hosts)
    return [
        host_actors[p].absorb.remote(parts[p])
        for p in range(n_hosts)
        if parts[p].num_rows
    ]


def route_by_hash(tbl: pa.Table, col: str, n_shards: int) -> list[pa.Table]:
    """Split a table into n_shards sub-tables by ``col % n_shards``.

    Vectorized take; this is the in-round analogue of the reference's
    consistent-hash agent routing (``Frontier.java:622-638``)."""
    h = tbl.column(col).to_numpy().astype(np.uint64, copy=False)
    part = (h % np.uint64(n_shards)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    sorted_part = part[order]
    bounds = np.searchsorted(sorted_part, np.arange(n_shards + 1))
    out = []
    idx = pa.array(order)
    taken = tbl.take(idx)
    for s in range(n_shards):
        out.append(taken.slice(bounds[s], bounds[s + 1] - bounds[s]))
    return out


class SieveService:
    """Driver-side facade over the shard actors."""

    def __init__(self, n_shards: int = 8, name_prefix: str = "sieve",
                 spill_dir: str = "", max_ram_hashes: int = 1 << 62,
                 identity: bool = False, actor_options: dict | None = None):
        self.n_shards = n_shards
        cls = SieveShard.options(**actor_options) if actor_options else SieveShard
        self.shards = [
            cls.remote(i, spill_dir=spill_dir,
                       max_ram_hashes=max_ram_hashes, identity=identity)
            for i in range(n_shards)
        ]

    def check_and_add(self, tbl: pa.Table) -> pa.Table:
        """Route a candidate table, flush every shard, return the novel
        rows of this batch sorted by global seq."""
        parts = route_by_hash(tbl, "url_hash", self.n_shards)
        refs = [
            self.shards[s].enqueue_flush.remote(parts[s])
            for s in range(self.n_shards)
            if parts[s].num_rows
        ]
        outs = [t for t in ray.get(refs) if t is not None and t.num_rows]
        if not outs:
            return tbl.slice(0, 0)
        merged = pa.concat_tables(outs)
        order = pa.compute.sort_indices(merged, sort_keys=[("seq", "ascending")])
        return merged.take(order)

    def snapshot(self, ckpt_dir: str) -> list[dict]:
        os.makedirs(ckpt_dir, exist_ok=True)
        refs = [
            sh.snapshot.remote(os.path.join(ckpt_dir, f"sieve-{i:04d}.parquet"))
            for i, sh in enumerate(self.shards)
        ]
        stats = ray.get(refs)
        with open(os.path.join(ckpt_dir, "sieve.json"), "w") as f:
            json.dump({"n_shards": self.n_shards, "stats": stats}, f)
        return stats

    def restore(self, ckpt_dir: str):
        ray.get(
            [
                sh.restore.remote(os.path.join(ckpt_dir, f"sieve-{i:04d}.parquet"))
                for i, sh in enumerate(self.shards)
            ]
        )

    def stats(self) -> list[dict]:
        return ray.get([sh.stats.remote() for sh in self.shards])

    def all_hashes(self) -> np.ndarray:
        """Union of all shards' seen hashes (small-scale test helper)."""
        parts = ray.get([sh.all_hashes.remote() for sh in self.shards])
        return np.sort(np.concatenate(parts)) if parts else np.empty(0, np.uint64)
