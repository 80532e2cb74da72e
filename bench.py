#!/usr/bin/env python
"""Benchmark harness — headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "num_cpus": N,
   "crawl_urls_per_sec": ..., "crawl": {...}, "faults": [...]}

FAULT ISOLATION (round 5): the parent process never owns a Ray session.
Each crawl repeat runs in its own subprocess; the query batch runs in a
worker subprocess that streams one JSON line per query as it completes,
so a Ray core fault costs exactly one query (recorded in "faults"), not
the round's evidence — the parent relaunches a worker for the remainder
and ALWAYS emits a parseable final line.

--scaling runs the headline crawl twice in fresh processes
(num_cpus=4 and num_cpus=16 by default) on the same input and reports
throughput at both plus the scaling efficiency (the sandbox stand-in
for the north rule's N vs 4N cluster sizes).

This script (and its workers) OWN their Ray sessions, unlike
__ray_entry__.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# bench web sized by sf: sf0.1 -> 2000 hosts x 50 pages (~102k URLs) with
# Common-Crawl-ish ~10 KB bodies (body_blocks=64); politeness
# aggressive-but-on (delays are virtual-time, so throughput measures the
# engine, not sleeping)
BODY_BLOCKS = 64


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def bench_web(sf: float) -> tuple[str, int]:
    from bubing_ray.pages import write_pages

    n_hosts = max(20, int(20000 * sf))
    pages_per_host = 50
    web = f"/tmp/bubing_benchweb_{n_hosts}x{pages_per_host}b{BODY_BLOCKS}"
    if not os.path.exists(os.path.join(web, "_OK")):
        write_pages(web, n_hosts=n_hosts, pages_per_host=pages_per_host,
                    out_degree=8, seed=0, body_blocks=BODY_BLOCKS)
        open(os.path.join(web, "_OK"), "w").close()
    return web, n_hosts


def run_crawl(sf: float, num_cpus: int) -> dict:
    import shutil

    from bubing_ray.frontier.crawl import CrawlConfig, Crawler
    from bubing_ray.pages import seeds_for

    web, n_hosts = bench_web(sf)
    store = f"/tmp/bubing_benchstore_{num_cpus}"
    shutil.rmtree(store, ignore_errors=True)
    cfg = CrawlConfig(
        pages_dir=web,
        store_dir=store,
        seeds=seeds_for(n_hosts, max(8, n_hosts // 8)),
        sa_delay_ms=50,
        ip_delay_ms=50,
        round_ms=200,
        keepalive=32,
        n_host_shards=8,
        n_sieve_shards=8,
        n_digest_shards=4,
        store_html=True,
        retry_quantum_ms=600_000,
    )
    c = Crawler(cfg)
    c.add_seeds(cfg.seeds)
    t0 = time.time()
    st = c.run()
    dt = time.time() - t0
    c.shutdown()
    st["crawl_sec"] = round(dt, 2)
    st["urls_per_sec"] = round(st["fetched"] / dt, 1)
    return st


# query pipelines benchmarked besides the crawl (subset of __ray_entry__
# queries: the heavy data-parallel ones)
BENCH_QUERIES = [
    "extract_text",
    "warc_ingest",
    "text_quality",
    "quality_filter",
    "lang_id",
    "exact_dedup",
    "minhash_pairs",
    "simhash_neardup",
    "embedding_neardup",
    "ann_topk",
    "multimodal_meta",
    "events_topk",
    "sessionize_events",
    "dup_spans",
    "strip_dup_spans",
    "corpus_compose",
    "tfidf_search",
    "hll_users",
    "paragraph_dedup",
    "familiarity_buckets",
    "events_last_purchase",
    "purchase_window_stats",
    "events_hourly",
    "dsir_weights",
    "collocations",
    "decontaminate_fuzzy",
    "semdedup",
    "docs_topk_by_source",
    "docs_global_rank",
    "chunk_docs",
    "dedup_keep_best",
    "anchor_topk",
    # round-5 graph/temporal additions.  hits_scores / random_walks are
    # deliberately NOT benched: they chain 8-10 all-to-all plans whose
    # per-plan fixed overhead dominates at sf0.1 (~30s for 86k rows —
    # sandbox scheduling floor, not data cost), which would distort the
    # round-over-round headline sum; correctness is oracle-swept.
    "host_cocitation",
    "funnel_stages",
    "cohort_retention",
]


def consume(res) -> int:
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pa.Table):
        return res.num_rows
    if isinstance(res, pd.DataFrame):
        return len(res)
    n = 0
    for b in res.iter_batches(batch_format="pyarrow"):
        n += len(b[next(iter(b.keys()))]) if isinstance(b, dict) else b.num_rows
    return n


def _ray_init(num_cpus: int) -> None:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
    except Exception:
        pass


def _run_worker(args: list[str], timeout: float | None = None) -> tuple[int, list[dict]]:
    """Run `bench.py <args>` in a subprocess; return (rc, parsed JSON lines).

    Lines the worker printed before a crash are still parsed — that is the
    whole point of the streaming protocol.
    """
    env = dict(os.environ, RAY_DATA_DISABLE_PROGRESS_BARS="1")
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), *args],
            capture_output=True, text=True, env=env, timeout=timeout,
        )
        rc, out = p.returncode, p.stdout
    except subprocess.TimeoutExpired as e:
        out = e.stdout or ""
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        rc = -99
    lines = []
    for l in out.splitlines():
        l = l.strip()
        if l.startswith("{"):
            try:
                lines.append(json.loads(l))
            except json.JSONDecodeError:
                pass
    return rc, lines


# ---------------------------------------------------------------- workers


def worker_crawl() -> int:
    """One crawl in a fresh Ray session; prints one JSON line."""
    _ray_init(NUM_CPUS)
    st = run_crawl(_sf_of(SF_DIR), NUM_CPUS)
    import ray

    ray.shutdown()
    print(json.dumps({"kind": "crawl", **{k: st[k] for k in (
        "fetched", "urls_seen", "links", "hosts", "crawl_sec", "urls_per_sec")}}))
    return 0


def worker_queries(names: list[str]) -> int:
    """Run queries cold+warm, one streamed JSON line per query."""
    _ray_init(NUM_CPUS)
    from bubing_ray.pipelines import queries as Q

    for name in names:
        if name == os.environ.get("BENCH_CRASH_QUERY"):
            os._exit(73)  # test hook: simulate a hard Ray core fault
        try:
            fn = getattr(Q, name)
            t0 = time.time()
            consume(fn(SF_DIR))
            cold = round(time.time() - t0, 2)
            t0 = time.time()
            consume(fn(SF_DIR))
            warm = round(time.time() - t0, 2)
            print(json.dumps({"kind": "query", "q": name,
                              "cold": cold, "warm": warm}), flush=True)
        except Exception as e:  # soft failure: record, keep the session
            print(json.dumps({"kind": "query", "q": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
    import ray

    ray.shutdown()
    return 0


# ------------------------------------------------------------------ main


def soak_main() -> int:
    """10x-scale soak: ~1M-page web, virtualizer + sieve disk spill on."""
    import shutil

    import ray

    from bubing_ray.frontier.crawl import CrawlConfig, Crawler
    from bubing_ray.pages import seeds_for, write_pages

    _ray_init(NUM_CPUS)
    web = "/tmp/bubing_soakweb_20000x50"
    if not os.path.exists(web + "/_OK"):
        write_pages(web, n_hosts=20000, pages_per_host=50, out_degree=8, seed=0)
        open(web + "/_OK", "w").close()
    store = "/tmp/bubing_soakstore"
    shutil.rmtree(store, ignore_errors=True)
    cfg = CrawlConfig(
        pages_dir=web, store_dir=store, seeds=seeds_for(20000, 2048),
        sa_delay_ms=50, ip_delay_ms=50, round_ms=200, keepalive=32,
        n_host_shards=16, n_sieve_shards=8, n_digest_shards=8,
        store_html=False, retry_quantum_ms=600_000,
        head_cap=64, sieve_max_ram_hashes=50_000,
        digest_max_ram_hashes=50_000,  # digest seen-set spill engaged too
    )
    c = Crawler(cfg)
    c.add_seeds(cfg.seeds)
    t0 = time.time()
    st = c.run()
    dt = time.time() - t0
    c.shutdown()
    ray.shutdown()
    print(json.dumps({
        "metric": "soak frontier throughput (1M-page web, spill paths on)",
        "value": round(dt, 2), "unit": "sec",
        "queries": {"soak_crawl": round(dt, 2)},
        "sf": 1.0, "num_cpus": NUM_CPUS,
        "crawl_urls_per_sec": round(st["fetched"] / dt, 1),
        "crawl": {k: st[k] for k in ("fetched", "urls_seen", "links", "hosts")},
    }))
    return 0


def main() -> int:
    if "--worker-crawl" in sys.argv:
        return worker_crawl()
    if "--worker-queries" in sys.argv:
        i = sys.argv.index("--worker-queries")
        return worker_queries(sys.argv[i + 1].split(","))
    if "--scaling" in sys.argv:
        return scaling_main()
    if "--soak" in sys.argv:
        return soak_main()
    crawl_only = "--crawl-only" in sys.argv

    sf = _sf_of(SF_DIR)
    faults: list[str] = []
    queries_sec: dict[str, float] = {}
    queries_cold: dict[str, float] = {}

    # The first crawl worker generates the bench web before its timer
    # starts (subprocesses are sequential, so no race); the parent holds
    # no Ray session at all.

    # PINNED PROTOCOL (round 3+, apples-to-apples across rounds):
    # - crawl: best-of-CRAWL_REPEATS (default 3) by urls_per_sec, all
    #   runs recorded in protocol.crawl_runs_urls_per_sec;
    #   queries.crawl = the BEST single run's wall seconds (r1/r2
    #   recorded the total of all repeats — see protocol.note).
    # - each query: run twice; first = cold (fixture gen, import, JIT),
    #   second = warm; queries[name] = warm, protocol.queries_cold[name]
    #   = cold.  The sandbox's allocation throttle swings single runs by
    #   ±30%, hence best-of / warm-vs-cold are recorded explicitly.
    # Round 5: every phase in its own subprocess (fault isolation).
    crawl_runs: list[float] = []
    crawl_stats: dict | None = None
    for i in range(max(0, int(os.environ.get("CRAWL_REPEATS", "3")))):
        rc, lines = _run_worker(["--worker-crawl"], timeout=1800)
        crawls = [l for l in lines if l.get("kind") == "crawl"]
        if rc != 0 and not crawls:
            faults.append(f"crawl repeat {i}: worker rc={rc}")
            continue
        st = crawls[-1]
        st.pop("kind", None)
        crawl_runs.append(st["urls_per_sec"])
        if crawl_stats is None or st["urls_per_sec"] > crawl_stats["urls_per_sec"]:
            crawl_stats = st
    if crawl_stats is not None:
        queries_sec["crawl"] = crawl_stats["crawl_sec"]

    if not crawl_only:
        # BENCH_QUERY_LIST: test hook / targeted re-run (comma-separated)
        remaining = [q for q in os.environ.get(
            "BENCH_QUERY_LIST", ",".join(BENCH_QUERIES)).split(",") if q]
        attempts, max_attempts = 0, len(remaining) + 3
        while remaining and attempts < max_attempts:
            attempts += 1
            rc, lines = _run_worker(
                ["--worker-queries", ",".join(remaining)], timeout=3600)
            done = set()
            for l in lines:
                if l.get("kind") != "query":
                    continue
                done.add(l["q"])
                if "error" in l:
                    queries_sec[l["q"]] = -1.0
                    faults.append(f"{l['q']}: {l['error']}")
                else:
                    queries_cold[l["q"]] = l["cold"]
                    queries_sec[l["q"]] = l["warm"]
            remaining = [q for q in remaining if q not in done]
            if rc != 0 and remaining:
                # the first remaining query is the one that took the
                # session down — skip it, restart for the rest
                crashed = remaining.pop(0)
                queries_sec[crashed] = -1.0
                faults.append(f"{crashed}: worker crashed rc={rc}")
            elif rc == 0:
                for q in remaining:  # worker exited clean but skipped? record
                    queries_sec[q] = -1.0
                    faults.append(f"{q}: no result from clean worker")
                break
        for q in remaining:
            # attempts budget exhausted with queries still unrun (e.g.
            # every worker dies before emitting a line): the artifact
            # must account for EVERY query, not silently drop the tail
            if q not in queries_sec:
                queries_sec[q] = -1.0
                faults.append(f"{q}: unrun, attempts budget exhausted")

    out = {
        "metric": "frontier throughput (URLs/sec fetched+deduped) + headline pipeline seconds",
        "value": round(sum(v for v in queries_sec.values() if v > 0), 2),
        "unit": "sec",
        "queries": queries_sec,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "crawl_urls_per_sec": crawl_stats["urls_per_sec"] if crawl_stats else -1.0,
        "crawl": crawl_stats or {},
        "faults": faults,
        "protocol": {
            "crawl_repeats": len(crawl_runs),
            "crawl_policy": "best urls_per_sec; queries.crawl = best run's wall sec",
            "crawl_runs_urls_per_sec": crawl_runs,
            "query_policy": "2 runs/query; queries = warm (2nd), queries_cold = 1st",
            "queries_cold": queries_cold,
            "isolation": "r5+: each crawl repeat and the query batch run in "
                         "subprocesses; a Ray fault costs one entry (see faults), "
                         "not the artifact",
            "note": "r1/r2 queries.crawl was the TOTAL wall of all crawl repeats; "
                    "r3+ is the best single run",
        },
    }
    print(json.dumps(out))
    return 0


def scaling_main() -> int:
    """Same crawl at two parallelism levels in fresh processes."""
    lo = int(os.environ.get("SCALING_LO", "4"))
    hi = int(os.environ.get("SCALING_HI", "16"))
    faults: list[str] = []
    results: dict[int, dict] = {}
    # the first worker subprocess generates the web before its timer starts
    repeats = int(os.environ.get("SCALING_REPEATS", "2"))
    for n in (lo, hi):
        best = None
        runs = []
        for i in range(repeats):  # best-of-N: the sandbox is noisy
            env = dict(os.environ, RAY_GRAFT_CPUS=str(n),
                       RAY_DATA_DISABLE_PROGRESS_BARS="1")
            p = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"), "--worker-crawl"],
                capture_output=True, text=True, env=env,
            )
            cand = [l for l in p.stdout.splitlines() if l.strip().startswith("{")]
            if not cand:
                faults.append(f"scaling {n}cpu repeat {i}: rc={p.returncode}")
                continue
            r = json.loads(cand[-1])
            # per-round wall percentiles from the crawler's metrics file
            # (throttle noise vs engine regression are separable: a
            # machine-wide throttle lifts every percentile uniformly)
            rec = {"urls_per_sec": r["urls_per_sec"]}
            try:
                walls = sorted(
                    json.loads(l)["wall_s"]
                    for l in open(f"/tmp/bubing_benchstore_{n}/_metrics.jsonl"))
                rec["round_wall_p50"] = round(
                    walls[len(walls) // 2], 4)
                rec["round_wall_p95"] = round(
                    walls[min(len(walls) - 1, int(len(walls) * 0.95))], 4)
                rec["rounds"] = len(walls)
            except (OSError, ValueError, KeyError, IndexError):
                pass
            runs.append(rec)
            if best is None or r["urls_per_sec"] > best["urls_per_sec"]:
                best = r
        if best is None:
            print(json.dumps({
                "metric": f"scaling efficiency {lo}->{hi} cpus (crawl URLs/sec)",
                "value": -1.0, "unit": "efficiency", "faults": faults,
            }))
            return 1
        best["runs"] = runs
        results[n] = best
    tput_lo = results[lo]["urls_per_sec"]
    tput_hi = results[hi]["urls_per_sec"]
    eff = (tput_hi / tput_lo) / (hi / lo)
    out = {
        "metric": f"scaling efficiency {lo}->{hi} cpus (crawl URLs/sec)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": _sf_of(SF_DIR),
        "throughput": {str(lo): tput_lo, str(hi): tput_hi},
        "runs": {str(lo): results[lo]["runs"], str(hi): results[hi]["runs"]},
        "queries": {f"crawl_{lo}cpu": results[lo]["crawl_sec"],
                    f"crawl_{hi}cpu": results[hi]["crawl_sec"]},
        "num_cpus": hi,
        "faults": faults,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
