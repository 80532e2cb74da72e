"""Local oracle sweep: every registered query vs its DuckDB oracle.

Replicates the driver's correctness gate so end-of-round evidence can be
recorded without the driver: for each ``__ray_entry__.queries()`` entry,
run the Ray pipeline AND the matching ``oracle_sql()`` string on the same
parquet tables, normalize both results (columns sorted by name, rows
sorted by every column), and record rows / schema / value matches.

Usage:
    python tools/oracle_sweep.py [--sf-dir /root/testdata/sf0.01] \
        [--out CORRECTNESS_LOCAL_r05.json] [--only q1,q2]

Owns its Ray session (the driver calls queries() itself; this tool is a
standalone CLI, so the init here does not violate the no-init contract
of __ray_entry__ / bubing_ray).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _normalize(df):
    """Driver-style normalization: column order by name, then row order
    by every column (stringified for mixed/unorderable dtypes)."""
    import pandas as pd

    df = df[sorted(df.columns)].reset_index(drop=True)
    if len(df):
        key = df.astype(str)
        order = key.sort_values(list(key.columns), kind="stable").index
        df = df.loc[order].reset_index(drop=True)
    return df


def _to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    raise TypeError(f"unexpected result type {type(res)}")


def _values_equal(a, b) -> bool:
    import numpy as np
    import pandas as pd

    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        va, vb = a[c], b[c]
        try:
            if pd.api.types.is_float_dtype(va) or pd.api.types.is_float_dtype(vb):
                fa = va.astype(float).to_numpy()
                fb = vb.astype(float).to_numpy()
                both_nan = np.isnan(fa) & np.isnan(fb)
                if not np.all(both_nan | (fa == fb)):
                    return False
                continue
        except (TypeError, ValueError):
            pass
        if not va.astype(str).equals(vb.astype(str)):
            return False
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "16")))
    args = ap.parse_args()

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")

    import __ray_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None,
               "sec": None}
        t0 = time.time()
        try:
            mine = _normalize(_to_pandas(fn(args.sf_dir)))
            rec["spark_rows"] = int(len(mine))
            sql = oracles.get(name)
            if sql is None:
                rec["err"] = "no_oracle"
            else:
                theirs = _normalize(con.execute(sql).fetchdf())
                rec["oracle_rows"] = int(len(theirs))
                rec["rows_match"] = len(mine) == len(theirs)
                rec["schema_match"] = list(mine.columns) == list(theirs.columns)
                rec["hash_match"] = bool(
                    rec["rows_match"] and rec["schema_match"]
                    and _values_equal(mine, theirs))
        except Exception as e:  # noqa: BLE001 — sweep must survive any query
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
        rec["sec"] = round(time.time() - t0, 1)
        results[name] = rec
        status = ("PASS" if rec["hash_match"]
                  else (rec["err"] or "MISMATCH"))
        print(f"{name}: {status} ({rec['sec']}s)", flush=True)

    n_pass = sum(1 for r in results.values() if r["hash_match"])
    n_nooracle = sum(1 for r in results.values() if r["err"] == "no_oracle")
    n_fail = len(results) - n_pass - n_nooracle
    print(f"== {n_pass} value-exact, {n_nooracle} no_oracle, "
          f"{n_fail} FAIL of {len(results)}", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    ray.shutdown()
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
