"""Aggregation / sketch operators — the counters & distribution stats
of the reference rebuilt as partial-combine pipelines.

BUbiNG keeps global atomic counters and `SummaryStats` distributions
(frontier/Frontier.java:343-392) plus a 40-bin log download-speed
histogram (frontier/StatsThread.java); here each becomes a
``map_batches`` partial (one small row per batch) followed by a driver
combine — the shuffle carries O(batches) rows, never O(data).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa


def _collect(ds, promote_options: str | None = None) -> pa.Table:
    """Driver-side collect of a SMALL (pre-reduced) dataset into one
    Arrow table — the single owner of the concat-iter_batches idiom
    (also used by ops/assoc.py, ops/windows.py, ops/graph.py)."""
    if isinstance(ds, pa.Table):
        return ds
    batches = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    if promote_options is not None:
        return pa.concat_tables(batches, promote_options=promote_options)
    return pa.concat_tables(batches)


def summary_stats(ds, col: str) -> dict:
    """count/sum/min/max/mean/variance of a numeric column — algebraic
    partials (count, sum, sum2, min, max) combined on the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        if len(x) == 0:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "s": pa.array([0.0]), "s2": pa.array([0.0]),
                             "mn": pa.array([np.inf]), "mx": pa.array([-np.inf])})
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "s": pa.array([float(x.sum())]),
                "s2": pa.array([float((x * x).sum())]),
                "mn": pa.array([float(x.min())]),
                "mx": pa.array([float(x.max())]),
            }
        )

    t = _collect(ds.map_batches(partial, batch_format="pyarrow"))
    n = int(pa.compute.sum(t.column("n")).as_py() or 0)
    if n == 0:
        return {"count": 0}
    s = float(pa.compute.sum(t.column("s")).as_py())
    s2 = float(pa.compute.sum(t.column("s2")).as_py())
    return {
        "count": n,
        "sum": s,
        "min": float(pa.compute.min(t.column("mn")).as_py()),
        "max": float(pa.compute.max(t.column("mx")).as_py()),
        "mean": s / n,
        "variance": max(0.0, s2 / n - (s / n) ** 2),
    }


def log2_histogram(ds, col: str):
    """Bucket counts of floor(log2(x)) for x > 0 (the speedDist
    analogue, Frontier.java:390-392). Returns a Dataset (bucket, n)."""

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[np.isfinite(x) & (x > 0)]
        b = np.floor(np.log2(x)).astype(np.int64)
        uniq, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(uniq), "n": pa.array(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n"))
    )
    return g.map_batches(
        lambda t: pa.table({"bucket": t.column("bucket"), "n": t.column("sum(n)")}),
        batch_format="pyarrow",
    )


def grouped_agg(ds, keys: list[str], col: str):
    """Q1-style wide aggregation: per key-combination count, sum, min,
    max of ``col`` — per-batch polars partials (count/sum/min/max are
    all algebraic), then a coarse-route shuffle with ONE vectorized
    ``group_by(keys)`` combine per route (not one Python ``map_groups``
    call per distinct key — billions at corpus scale).  Routing on
    ``keys[0]`` keeps every full key-combination in one group."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(keys + [col]))
        return (
            df.group_by(keys)
            .agg(
                pl.len().cast(pl.Int64).alias("pn"),
                pl.col(col).sum().alias("ps"),
                pl.col(col).min().alias("pmn"),
                pl.col(col).max().alias("pmx"),
            )
            .to_arrow()
        )

    def combine(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        out = df.group_by(keys).agg(
            pl.col("pn").sum().alias("n_rows"),
            pl.col("ps").sum().alias(f"sum_{col}"),
            pl.col("pmn").min().alias(f"min_{col}"),
            pl.col("pmx").max().alias(f"max_{col}"),
        )
        return out.to_arrow()

    from ..hashing import route_batch, routes_for

    nr = routes_for(None)  # partial row count unknown; 256-route floor

    def add_route(batch: pa.Table) -> pa.Table:
        return route_batch(batch, keys[0], nr)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_route, batch_format="pyarrow")
        .groupby("route")
        .map_groups(combine, batch_format="pyarrow")
    )


# ----------------------------------------------------------- HyperLogLog

HLL_P = 12  # 2^12 = 4096 registers (~1.6% standard error)


def hll_registers(ds, col: str, p: int = HLL_P):
    """Distributed HyperLogLog sketch of ``count distinct col``:
    returns the (register, rho) table — register index = top ``p`` bits
    of ``splitmix64(value)``, rho = leading-zero count of the remaining
    ``64-p`` bits + 1, maxed across all values.

    The registers are the mergeable sketch state (max is associative
    and commutative), so the whole reduction is one ``map_batches``
    partial (<= 2^p rows per batch) plus one tiny ``groupby(register)``
    max — a fixed-size exchange at any corpus scale.  Every arithmetic
    step is integer-on-splitmix64, so the register table (not just the
    estimate) is value-exact against a SQL oracle.  Integer columns
    hash directly; strings via the portable FNV-1a-64.
    """
    from ray.data.aggregate import Max

    from ..hashing import hash64, splitmix64

    if p < 11:
        raise ValueError("p >= 11 required (keeps 64-p <= 53 so the "
                         "frexp bit-length below is float-exact)")
    w_bits = 64 - p

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        if arr.null_count:
            # COUNT DISTINCT ignores NULLs (and a null int would NaN-
            # float through astype(uint64), corrupting a register)
            arr = arr.drop_null()
        if pa.types.is_integer(arr.type):
            h = splitmix64(
                arr.to_numpy(zero_copy_only=False).astype(np.uint64))
        else:
            h = splitmix64(hash64(arr, portable=True))
        reg = (h >> np.uint64(w_bits)).astype(np.int64)
        w = h & np.uint64((1 << w_bits) - 1)
        # rho = (64-p) - bit_length(w) + 1; bit_length(0) = 0 -> rho max.
        # bit_length via frexp's exponent: exact (no log rounding) since
        # w < 2^53 is exactly representable in float64.
        blen = np.frexp(w.astype(np.float64))[1].astype(np.int64)
        rho = (w_bits - blen + 1).astype(np.int64)
        df = pl.DataFrame({"register": reg, "rho": rho})
        return (df.group_by("register").agg(pl.col("rho").max())
                .to_arrow())

    g = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("register").aggregate(Max("rho")))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "register": batch.column("register"),
            "rho": batch.column("max(rho)"),
        })

    return g.map_batches(rename, batch_format="pyarrow")


def hll_estimate(registers: pa.Table, p: int = HLL_P) -> float:
    """Flajolet et al. 2007 estimate from a (register, rho) table
    (absent registers count as rho=0), with the standard small-range
    linear-counting correction."""
    m = 1 << p
    rho = np.zeros(m, dtype=np.int64)
    idx = registers.column("register").to_numpy(zero_copy_only=False)
    rho[idx] = registers.column("rho").to_numpy(zero_copy_only=False)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-rho.astype(np.float64)))
    zeros = int((rho == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


# ------------------------------------------------------- Count-Min sketch

CM_DEPTH = 4
CM_WIDTH = 2048


def cm_sketch(ds, col: str, depth: int = CM_DEPTH, width: int = CM_WIDTH):
    """Distributed Count-Min sketch (Cormode & Muthukrishnan 2005) of
    the ``col`` frequency distribution: a (row, slot, count) table with
    ``count = sum of occurrences hashing to (row, slot)``.

    Counter sums are plain integer aggregates — associative and
    commutative — so the whole sketch is one ``map_batches`` partial
    (<= depth*width rows per batch) plus one fixed-size
    ``groupby(row, slot)`` sum: a constant-width exchange regardless of
    corpus size, and value-exact against a SQL oracle.  Row ``r`` uses
    ``splitmix64(value_hash XOR r)`` (ints hash identity, strings via
    portable FNV), slot = that hash mod ``width``.
    """
    from ray.data.aggregate import Sum

    from ..hashing import hash64, splitmix64

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        if arr.null_count:
            arr = arr.drop_null()  # NULL contributes no occurrences
        if pa.types.is_integer(arr.type):
            base = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            base = hash64(arr, portable=True)
        rows, slots = [], []
        for r in range(depth):
            h = splitmix64(base ^ np.uint64(r))
            rows.append(np.full(len(base), r, np.int64))
            slots.append((h % np.uint64(width)).astype(np.int64))
        df = pl.DataFrame({
            "row": np.concatenate(rows),
            "slot": np.concatenate(slots),
        })
        return (df.group_by(["row", "slot"])
                .agg(pl.len().cast(pl.Int64).alias("count")).to_arrow())

    g = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["row", "slot"]).aggregate(Sum("count")))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "row": batch.column("row"),
            "slot": batch.column("slot"),
            "count": batch.column("sum(count)"),
        })

    return g.map_batches(rename, batch_format="pyarrow")


def cm_estimate(sketch: pa.Table, values, depth: int = CM_DEPTH,
                width: int = CM_WIDTH) -> dict:
    """Point-query the sketch: estimated count per value = min over
    rows of its (row, slot) counter (>= true count, whp close)."""
    from ..hashing import hash64, splitmix64

    tab = {}
    rows = sketch.column("row").to_numpy(zero_copy_only=False)
    slots = sketch.column("slot").to_numpy(zero_copy_only=False)
    counts = sketch.column("count").to_numpy(zero_copy_only=False)
    for r, s, c in zip(rows, slots, counts):
        tab[(int(r), int(s))] = int(c)
    out = {}
    for v in values:
        if isinstance(v, (int, np.integer)):
            base = np.uint64(int(v) & 0xFFFFFFFFFFFFFFFF)
        else:
            base = hash64([str(v)], portable=True)[0]
        # plain-int modulo: a python-int % np.uint64 would promote to
        # float64 and corrupt the slot for hashes >= 2^53
        out[v] = min(
            tab.get((r, int(splitmix64(np.uint64(base) ^ np.uint64(r)))
                     % width), 0)
            for r in range(depth)
        )
    return out


# -------------------------------------------------------- exact quantiles

def exact_quantiles(ds, col: str, qs_bp=(2500, 5000, 7500, 9000, 9900)):
    """EXACT quantiles of a low-cardinality numeric column via a
    distributed value histogram: per-batch (value, count) partials,
    one ``groupby(value)`` sum (shuffle size = distinct values, not
    rows), then a driver-side cumulative scan over the tiny histogram.

    Quantile rule (explicit, so the SQL oracle states the identical
    arithmetic rather than a builtin's unspecified interpolation):
    ``q_bp`` basis points selects the smallest value whose cumulative
    count exceeds ``floor((n - 1) * q_bp / 10000)``.

    Intended for quantized/discrete measures (status codes, sizes in
    buckets, ratings); for continuous high-cardinality columns compose
    with a rounding ``map_batches`` first — the histogram must stay
    driver-collectable.  Returns a pyarrow Table (q_bp, value).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([col])).drop_nulls(col)
        return (df.group_by(col).agg(pl.len().cast(pl.Int64).alias("c"))
                .to_arrow())

    hist = _collect(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(col).aggregate(Sum("c"))
    )
    df = pl.from_arrow(hist).sort(col)
    vals = df[col].to_numpy()
    cum = df["sum(c)"].to_numpy().cumsum()
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs_bp:
        if n == 0:
            continue
        r = (n - 1) * q // 10_000
        out_q.append(int(q))
        out_v.append(float(vals[np.searchsorted(cum, r, side="right")]))
    return pa.table({"q_bp": pa.array(out_q, pa.int64()),
                     "value": pa.array(out_v, pa.float64())})


# ------------------------------------------------ grouped sketch variants

def grouped_quantiles(ds, key: str, col: str,
                      qs_bp=(2500, 5000, 7500, 9000, 9900),
                      n_routes: int | None = None):
    """Per-key EXACT quantiles of a low-cardinality numeric column:
    (key, q_bp, value) — the grouped form of :func:`exact_quantiles`.

    Same quantile rule: ``q_bp`` selects the smallest value whose
    per-key cumulative count exceeds ``floor((n_key - 1) * q_bp /
    10000)``.

    Scale shape: per-batch (key, value, count) histogram partials, one
    ``groupby(key, value)`` sum (shuffle size = distinct pairs, not
    rows), then a key-routed vectorized cumulative scan — one polars
    window per route group covering all its keys; the driver never
    touches the histogram.
    """
    from ray.data.aggregate import Sum

    from ..hashing import derive_routes, route_batch

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([key, col])).drop_nulls(col)
        return (df.group_by([key, col])
                .agg(pl.len().cast(pl.Int64).alias("c")).to_arrow())

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([key, col]).aggregate(Sum("c", alias_name="c")))
    nr = derive_routes(hist, n_routes)

    def route(batch: pa.Table) -> pa.Table:
        return route_batch(batch, key, nr)

    qs = sorted(int(q) for q in qs_bp)

    def per_route(group: pa.Table) -> pa.Table:
        df = (pl.from_arrow(group).sort([key, col])
              .with_columns(
                  pl.col("c").cum_sum().over(key).alias("cum"),
                  pl.col("c").sum().over(key).alias("n")))
        outs = []
        for q in qs:
            thr = (pl.col("n") - 1) * q // 10_000
            sel = (df.filter(pl.col("cum") > thr)
                   .group_by(key, maintain_order=False)
                   .agg(pl.col(col).min().alias("value"))
                   .with_columns(pl.lit(q, dtype=pl.Int64).alias("q_bp")))
            outs.append(sel.select([key, "q_bp", "value"]))
        return pl.concat(outs).to_arrow()

    return (hist.map_batches(route, batch_format="pyarrow")
            .groupby("route").map_groups(per_route, batch_format="pyarrow"))


def grouped_hll(ds, key: str, col: str, p: int = HLL_P):
    """Per-key HyperLogLog registers: (key, register, rho) — the
    grouped form of :func:`hll_registers` (approximate distinct ``col``
    per ``key``, e.g. distinct users per domain at 100 TB).

    Registers stay mergeable per key (max is associative/commutative),
    so the exchange is at most ``keys x 2^p`` rows and each batch
    pre-collapses to its own (key, register) maxima first.  Same
    integer-exact splitmix64/FNV hash chain as the global sketch, so
    the register table is value-exact against a SQL oracle.
    """
    from ray.data.aggregate import Max

    from ..hashing import hash64, splitmix64

    if p < 11:
        raise ValueError("p >= 11 required (see hll_registers)")
    w_bits = 64 - p

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({key: batch.column(key), "_v": batch.column(col)})
        # COUNT DISTINCT skips NULL values, but SQL GROUP BY KEEPS a
        # NULL-key group — drop nulls on the value column only
        df = pl.from_arrow(t).drop_nulls(["_v"])
        if not len(df):
            return pa.table({key: pa.array([], t.schema.field(key).type),
                             "register": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        arr = df["_v"].to_arrow()
        if pa.types.is_integer(arr.type):
            h = splitmix64(
                arr.to_numpy(zero_copy_only=False).astype(np.uint64))
        else:
            h = splitmix64(hash64(arr, portable=True))
        reg = (h >> np.uint64(w_bits)).astype(np.int64)
        w = h & np.uint64((1 << w_bits) - 1)
        blen = np.frexp(w.astype(np.float64))[1].astype(np.int64)
        rho = (w_bits - blen + 1).astype(np.int64)
        out = df.with_columns(
            pl.Series("register", reg), pl.Series("rho", rho)
        ).group_by([key, "register"]).agg(pl.col("rho").max())
        return out.select([key, "register", "rho"]).to_arrow()

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .groupby([key, "register"]).aggregate(Max("rho", alias_name="rho")))
    return g
