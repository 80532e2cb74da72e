"""Measure this machine's PURE-COMPUTE parallel scaling ceiling.

Scaling-efficiency numbers for the crawl are only meaningful relative
to what the hardware itself can do: on hosts where N advertised CPUs
are SMT siblings (or a hypervisor cap) over N/2 physical cores, even a
perfectly parallel Python loop stops scaling past the physical-core
count. This probe burns fixed CPU work in W processes and reports the
aggregate speedup per width, with no Ray, no allocation, no I/O — an
upper bound any distributed engine on this box is subject to.

Usage: python tools/cpu_ceiling.py  → one JSON line
"""
import json
import multiprocessing as mp
import sys
import time

WORK = 20_000_000


def _burn(_):
    t0 = time.perf_counter()
    x = 0
    for i in range(WORK):
        x += i
    return time.perf_counter() - t0


def main() -> int:
    single = _burn(0)
    out = {"single_task_sec": round(single, 3), "widths": {}}
    for workers in (4, 8, 16, 32):
        with mp.Pool(workers) as p:
            t0 = time.perf_counter()
            times = p.map(_burn, range(workers))
            wall = time.perf_counter() - t0
        out["widths"][str(workers)] = {
            "wall_sec": round(wall, 3),
            "aggregate_speedup": round(workers * single / wall, 2),
            "per_task_avg_sec": round(sum(times) / len(times), 3),
        }
    w = out["widths"]
    for lo, hi in ((4, 16), (8, 32), (16, 32)):
        eff = (w[str(hi)]["aggregate_speedup"]
               / w[str(lo)]["aggregate_speedup"]) / (hi / lo)
        out[f"pure_compute_eff_{lo}to{hi}"] = round(eff, 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
