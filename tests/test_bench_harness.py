"""Fault isolation of the bench harness (VERDICT r4 'wrong' #2).

The round-4 driver bench was voided by a single Ray core-worker crash
because crawl + 29 queries shared one process.  bench.py now runs every
phase in a subprocess and streams per-query JSON lines, so a hard crash
costs exactly one entry.  This test injects a hard worker death
(BENCH_CRASH_QUERY -> os._exit(73)) mid-batch and asserts the parent
still emits a fully parseable artifact with the other queries measured
and the fault recorded.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_env):
    env = dict(
        os.environ,
        GRAFT_SF_DIR="/root/testdata/sf0.001",
        RAY_GRAFT_CPUS="4",
        CRAWL_REPEATS="0",
        RAY_DATA_DISABLE_PROGRESS_BARS="1",
        **extra_env,
    )
    # the bench workers own their Ray sessions — keep them out of the
    # pytest session's Ray by not inheriting RAY_ADDRESS beyond "local"
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=600,
    )
    lines = [l for l in p.stdout.splitlines() if l.strip().startswith("{")]
    assert lines, f"no JSON emitted (rc={p.returncode}):\n{p.stderr[-2000:]}"
    return p.returncode, json.loads(lines[-1])


def test_bench_survives_hard_worker_crash():
    rc, out = _run_bench({
        "BENCH_QUERY_LIST": "text_quality,lang_id,hll_users",
        "BENCH_CRASH_QUERY": "lang_id",
    })
    assert rc == 0
    q = out["queries"]
    # the queries around the crash are measured
    assert q["text_quality"] > 0
    assert q["hll_users"] > 0
    # the crashed one is recorded as a fault, not a missing artifact
    assert q["lang_id"] == -1.0
    assert any("lang_id" in f for f in out["faults"])
    # protocol block intact
    assert out["protocol"]["queries_cold"]["text_quality"] > 0


def test_bench_soft_error_is_one_fault():
    # an exception inside a query must not kill the worker session:
    # remaining queries run in the SAME worker (no restart needed)
    rc, out = _run_bench({
        "BENCH_QUERY_LIST": "nonexistent_query,text_quality",
    })
    assert rc == 0
    assert out["queries"]["nonexistent_query"] == -1.0
    assert out["queries"]["text_quality"] > 0
    assert any("nonexistent_query" in f for f in out["faults"])
