"""Randomized model-parity tests for the round-5 temporal/join ops:
the distributed result must equal a brute-force sequential model for
arbitrary inputs (several seeded draws, multiple route widths)."""

import numpy as np
import pyarrow as pa
import ray

from bubing_ray.ops.joins import diff_tables
from bubing_ray.ops.temporal import WEEK_US, cohort_retention, funnel_stages

US = pa.timestamp("us")
STEPS = ["view", "click", "purchase"]
TYPES = STEPS + ["signup", "error"]


def _funnel_model(rows):
    by_key = {}
    for u, ts, et in rows:
        by_key.setdefault(u, []).append((ts, et))
    out = {}
    for u, evs in by_key.items():
        stage, t = 0, None
        for step in STEPS:
            cands = [ts for ts, et in evs
                     if et == step and (t is None or ts > t)]
            if not cands:
                break
            t = min(cands)
            stage += 1
        out[u] = stage
    return out


def test_funnel_random_model_parity(ray_session):
    rng = np.random.default_rng(42)
    for trial in range(3):
        n = 400
        rows = [(int(rng.integers(0, 40)), int(rng.integers(0, 1000)),
                 TYPES[rng.integers(0, len(TYPES))]) for _ in range(n)]
        tbl = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], US),
            "event_type": pa.array([r[2] for r in rows]),
        })
        exp = _funnel_model(rows)
        ds = ray.data.from_arrow(tbl).repartition(4)
        got = (funnel_stages(ds, STEPS, n_routes=int(rng.integers(1, 9)))
               .to_pandas().set_index("user_id")["stage"].to_dict())
        assert got == exp, f"trial {trial}"


def _cohort_model(rows):
    weeks = {}
    for u, ts in rows:
        weeks.setdefault(u, set()).add(ts // WEEK_US)
    cells = {}
    for u, ws in weeks.items():
        c = min(ws)
        for w in ws:
            cells[(c, w - c)] = cells.get((c, w - c), 0) + 1
    return cells


def test_cohort_random_model_parity(ray_session):
    rng = np.random.default_rng(43)
    for trial in range(3):
        rows = [(int(rng.integers(0, 60)),
                 int(rng.integers(-2, 10)) * WEEK_US
                 + int(rng.integers(0, WEEK_US)))
                for _ in range(500)]
        tbl = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], US),
        })
        exp = _cohort_model(rows)
        ds = ray.data.from_arrow(tbl).repartition(5)
        df = cohort_retention(ds, n_routes=int(rng.integers(1, 9))).to_pandas()
        got = {(int(r.cohort_week), int(r.week_offset)): int(r.n_users)
               for r in df.itertuples()}
        assert got == exp, f"trial {trial}"


def _diff_model(lrows, rrows):
    lm, rm = dict(lrows), dict(rrows)
    out = {}
    for k in set(lm) | set(rm):
        if k not in lm:
            out[k] = "added"
        elif k not in rm:
            out[k] = "removed"
        elif lm[k] == rm[k] or (lm[k] is None and rm[k] is None):
            out[k] = "same"
        else:
            out[k] = "changed"
    return out


def test_diff_random_model_parity(ray_session):
    rng = np.random.default_rng(44)
    vals = ["a", "b", "c", None]
    for trial in range(3):
        lkeys = rng.choice(100, size=50, replace=False)
        rkeys = rng.choice(100, size=50, replace=False)
        lrows = [(int(k), vals[rng.integers(0, 4)]) for k in lkeys]
        rrows = [(int(k), vals[rng.integers(0, 4)]) for k in rkeys]
        lt = pa.table({"k": pa.array([r[0] for r in lrows], pa.int64()),
                       "v": pa.array([r[1] for r in lrows])})
        rt = pa.table({"k": pa.array([r[0] for r in rrows], pa.int64()),
                       "v": pa.array([r[1] for r in rrows])})
        exp = _diff_model(lrows, rrows)
        got = (diff_tables(ray.data.from_arrow(lt).repartition(3),
                           ray.data.from_arrow(rt).repartition(2),
                           "k", "v", n_routes=int(rng.integers(1, 9)))
               .to_pandas().set_index("k")["change"].to_dict())
        assert got == exp, f"trial {trial}"
