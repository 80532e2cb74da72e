"""Driver-style oracle check: run each queries() entry and its
oracle_sql() side-by-side, compare row-count + schema + sorted values.

Usage: python tests/oracle_check.py [sf_dir] [query ...]
Set ORACLE_CHECK_JSON=<path> to also write a driver-format row file
(rows_match/schema_match/hash_match per query) for the repo record.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import pyarrow as pa
import ray


def to_pandas(res):
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()  # ray Dataset


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    fails = []
    rows_out: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name}: RAY ERROR {type(e).__name__}: {e}")
            fails.append(name)
            rows_out[name] = {"rows_match": False, "schema_match": False,
                              "hash_match": False, "spark_rows": None,
                              "oracle_rows": None,
                              "err": f"{type(e).__name__}: {e}"}
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows-only {len(got)} rows ({dt:.1f}s) cols={list(got.columns)}")
            rows_out[name] = {"rows_match": None, "schema_match": None,
                              "hash_match": None, "spark_rows": len(got),
                              "oracle_rows": None, "err": "no_oracle",
                              "sec": round(dt, 1)}
            continue
        exp = con.execute(oracles[name]).fetchdf()
        ok = True
        if sorted(got.columns) != sorted(exp.columns):
            print(f"{name}: SCHEMA MISMATCH {sorted(got.columns)} vs {sorted(exp.columns)}")
            ok = False
        elif len(got) != len(exp):
            print(f"{name}: ROWCOUNT {len(got)} vs {len(exp)}")
            ok = False
        else:
            cols = sorted(got.columns)
            g = got[cols].sort_values(cols).reset_index(drop=True)
            x = exp[cols].sort_values(cols).reset_index(drop=True)
            for c in cols:
                gv, xv = g[c], x[c]
                try:
                    same = (gv.astype(xv.dtype) == xv) | (gv.isna() & xv.isna())
                except Exception:
                    same = gv.astype(str) == xv.astype(str)
                if not same.all():
                    i = (~same).idxmax()
                    print(f"{name}: VALUE MISMATCH col={c} row={i}: {gv[i]!r} vs {xv[i]!r}")
                    ok = False
                    break
        print(f"{name}: {'OK' if ok else 'FAIL'} {len(got)} rows ({dt:.1f}s)")
        rows_out[name] = {
            "rows_match": len(got) == len(exp),
            "schema_match": sorted(got.columns) == sorted(exp.columns),
            "hash_match": ok, "spark_rows": len(got),
            "oracle_rows": len(exp), "err": None, "sec": round(dt, 1),
        }
        if not ok:
            fails.append(name)
    print("FAILS:", fails if fails else "none")
    out = os.environ.get("ORACLE_CHECK_JSON")
    if out:
        import json

        with open(out, "w") as f:
            json.dump(rows_out, f, indent=1)
        print("wrote", out)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
