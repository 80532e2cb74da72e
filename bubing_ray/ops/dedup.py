"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

The reference dedups two ways — exact URL-seen via the Mercator sieve
(sieve/MercatorSieve.java:40-60) and content near-dup via a Bloom
filter of page digests (frontier/Frontier.java:286-288) with
first-copy-wins archetypes (frontier/ParsingThread.java:407-410).
These operators generalize that to the dedup family a training-data
pipeline needs, expressed Ray-Data-first:

- exact:   per-batch partial combine (hash -> min id, count) then one
           small ``groupby`` — the shuffle moves one row per distinct
           key per batch, not one row per input row;
- minhash: shingle -> minhash signature (vectorized) -> band buckets ->
           ``groupby(band, bucket)`` -> candidate pairs -> signature-
           estimate verify (all distributed; pairs never hit the
           driver until they are near-dups);
- simhash: 64-bit simhash, 4x16-bit band bucketing for hamming<=3;
- ngram:   exact Jaccard over word n-gram sets by shingle-inverted-
           index self-join (groupby shingle hash);
- cosine:  block-wise matmul against a broadcast (ray.put) normalized
           matrix — the small side ships once per actor, not per batch.

All kernels are numpy/polars over Arrow batches; no Python row loops in
hot paths (per-doc numpy ops only where a ragged rolling kernel needs
them).
"""

from __future__ import annotations

import logging

import numpy as np
import polars as pl
import pyarrow as pa
import ray
from ray.data.aggregate import Count, Min, Sum

from ..hashing import derive_routes, hash64, route_of, routes_for

_LOG = logging.getLogger("bubing_ray.dedup")

# ------------------------------------------------- skew-cap drop accounting

_DROP_ACTOR_NAME = "bubing_dedup_drop_counter"


@ray.remote(num_cpus=0)
class _DropCounter:
    """Cluster-global accumulator for skew-cap drops: worker-side log
    warnings are invisible to driver callers, so `_cap_buckets` also
    reports here (fire-and-forget) and callers inspect via
    :func:`dropped_bucket_stats`."""

    def __init__(self):
        self.counts: dict[str, dict[str, int]] = {}

    def add(self, what: str, buckets: int, rows: int):
        d = self.counts.setdefault(what, {"buckets": 0, "rows": 0})
        d["buckets"] += buckets
        d["rows"] += rows

    def get(self) -> dict:
        return self.counts

    def reset(self):
        self.counts = {}


def _drop_actor_name() -> str:
    """Job-scoped actor name: unrelated jobs sharing one Ray cluster
    must not merge their drop counts into one counter."""
    try:
        return f"{_DROP_ACTOR_NAME}_{ray.get_runtime_context().get_job_id()}"
    except Exception:
        return _DROP_ACTOR_NAME


def _drop_counter():
    try:
        counter = _DropCounter.options(
            name=_drop_actor_name(), lifetime="detached", get_if_exists=True
        ).remote()
    except Exception:  # no ray runtime (pure-local unit test)
        return None
    _register_counter_cleanup()
    return counter


_CLEANUP_REGISTERED = False


def _register_counter_cleanup():
    """In the driver process only, kill this job's counter at interpreter
    exit: detached actors otherwise outlive the driver on a shared
    cluster (worker processes skip this — they can be reaped mid-job)."""
    global _CLEANUP_REGISTERED
    if _CLEANUP_REGISTERED:
        return
    try:
        if ray.get_runtime_context().worker.mode == ray.SCRIPT_MODE:
            import atexit

            atexit.register(shutdown_drop_counter)
            _CLEANUP_REGISTERED = True
    except Exception:
        pass


def shutdown_drop_counter() -> None:
    """Kill this job's drop-counter actor (idempotent)."""
    try:
        ray.kill(ray.get_actor(_drop_actor_name()))
    except Exception:
        pass


def dropped_bucket_stats(reset: bool = False) -> dict[str, dict[str, int]]:
    """Driver-side view of skew-cap drops since the last reset: maps op
    name -> {"buckets": n_buckets_dropped, "rows": n_rows_dropped}.
    Empty dict = every pair bucket was processed exactly."""
    a = _drop_counter()
    if a is None:
        return {}
    out = ray.get(a.get.remote())
    if reset:
        ray.get(a.reset.remote())
    return out


# ------------------------------------------------------------------ exact

def exact_dedup_groups(ds, key: str = "text", id_col: str = "doc_id"):
    """Distinct-by-``key``: one row per distinct value with the minimum
    ``id_col`` (first copy = archetype, as ParsingThread.java:407-410)
    and the duplicate count.

    Returns a Dataset with columns (``id_col``, dup_count), the kept
    representative per group. Partial-combines inside each batch before
    the global groupby so the shuffle carries distinct keys only.
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([id_col, key]))
        h = hash64(batch.column(key))
        df = df.with_columns(pl.Series("key_hash", h))
        agg = df.group_by("key_hash", key).agg(
            pl.col(id_col).min().alias("min_id"),
            pl.len().cast(pl.Int64).alias("cnt"),
        )
        return agg.to_arrow()

    # shuffle on the fixed-width hash, but re-group by the ACTUAL key
    # value inside each hash group — a 64-bit collision (expected a
    # few times at 10^10 docs) must yield two rows, not silently merge
    # two distinct texts (same guarantee the sibling exact_dedup
    # documents).  The exchange still carries one row per distinct key
    # per batch; the key value rides along like exact_dedup's window.
    def combine(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        out = df.group_by(key).agg(
            pl.col("min_id").min().alias(id_col),
            pl.col("cnt").sum().alias("dup_count"),
        )
        return out.select([id_col, "dup_count"]).to_arrow()

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key_hash")
        .map_groups(combine, batch_format="pyarrow")
    )


def exact_dedup(ds, key: str = "text", id_col: str = "doc_id",
                n_routes: int | None = None):
    """Keep-first exact dedup: rows whose ``id_col`` is the group min.

    One-shuffle broadcast-free design: rows route by ``hash(key) %
    n_routes`` (all copies of a value share its route), and each route
    group keeps ``id == min(id) over key`` in one vectorized polars
    window — no driver-side kept-id set, so the distinct-key count can
    exceed what any single process could hold.  The window compares the
    actual ``key`` values, so hash collisions cannot merge groups.
    ``n_routes`` defaults to a size-derived count (``routes_for``) so one
    route group's rows stay bounded as the corpus grows.
    """
    nr = derive_routes(ds, n_routes)

    def route(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column(key))
        return batch.append_column(
            "route", pa.array((h % np.uint64(nr)).astype(np.int64))
        )

    def keep_first(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        out = df.filter(
            pl.col(id_col) == pl.col(id_col).min().over(key)
        ).drop("route")
        return out.to_arrow()

    return (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby("route")
        .map_groups(keep_first, batch_format="pyarrow")
    )


def dedup_keep_best(ds, key: str = "norm_text", id_col: str = "doc_id",
                    score_col: str = "n_chars",
                    n_routes: int | None = None):
    """Duplicate-cluster representative selection: within each group of
    rows sharing ``key``, keep the row with the highest ``score_col``
    (ties broken by minimum ``id_col``) and report the group size.

    The curation counterpart of keep-first dedup: when near-identical
    variants differ in completeness (truncated mirrors, re-encoded
    copies), the kept representative should be the best variant, not the
    first-seen one.  Same one-shuffle shape as :func:`exact_dedup` —
    rows route by ``hash(key) % n_routes`` so every copy of a value
    lands in one route group, and each group resolves its winner in one
    vectorized polars pass over the ACTUAL key values (hash collisions
    cannot merge groups).  Returns (``id_col``, ``score_col``,
    dup_count), the kept row per group.
    """
    nr = derive_routes(ds, n_routes)

    def route(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column(key))
        return batch.append_column(
            "route", pa.array((h % np.uint64(nr)).astype(np.int64))
        )

    def keep_best(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        out = (
            df.sort([score_col, id_col], descending=[True, False])
            .group_by(key, maintain_order=True)
            .agg(
                pl.col(id_col).first(),
                pl.col(score_col).first(),
                pl.len().cast(pl.Int64).alias("dup_count"),
            )
            .select([id_col, score_col, "dup_count"])
        )
        return out.to_arrow()

    return (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby("route")
        .map_groups(keep_best, batch_format="pyarrow")
    )


# ----------------------------------------------------------------- shingles

def word_ngrams(texts: pl.Series, n: int = 3) -> pl.Series:
    """Word n-gram shingles per text (list<str>), lowercased."""
    toks = texts.str.to_lowercase().str.extract_all(r"\S+")
    if n == 1:
        return toks
    df = pl.DataFrame({"t": toks})
    # "w0 w1 .. w_{n-1}" via explode + per-row shifted concat
    out = (
        df.lazy()
        .with_row_index("rid")
        .explode("t")
        .with_columns(
            pl.concat_str(
                [pl.col("t").shift(-i).over("rid") for i in range(n)],
                separator=" ",
                ignore_nulls=False,
            ).alias("sh")
        )
        .group_by("rid", maintain_order=True)
        .agg(pl.col("sh").drop_nulls())
        .sort("rid")
        .collect()
    )
    # rows whose token list was empty disappear on explode of empty list?
    # polars keeps null row on explode of empty list -> sh null -> empty agg
    return out["sh"]


def shingle_hashes(texts: pl.Series, n: int = 3,
                   portable: bool | None = None) -> list[np.ndarray]:
    """Per-text arrays of distinct uint64 shingle hashes."""
    grams = word_ngrams(texts, n)
    flat = grams.explode()
    lens = grams.list.len().fill_null(0).to_numpy()
    h = hash64(flat.drop_nulls().to_arrow(), portable) if flat.drop_nulls().len() else np.empty(0, np.uint64)
    out = []
    pos = 0
    nn = lens.copy()
    # explode of an empty/null list yields one null row; drop_nulls removed it
    for ln in nn:
        out.append(np.unique(h[pos : pos + ln]))
        pos += ln
    return out


# ------------------------------------------------------------------ minhash

MINHASH_PERMS = 64
_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(k: int = MINHASH_PERMS, seed: int = 12345):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=k, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=k, dtype=np.uint64)
    return a, b


_PERM_A, _PERM_B = _perm_params()


def minhash_signature(sh: np.ndarray) -> np.ndarray:
    """k-perm minhash of a shingle-hash set (uint64[k])."""
    if len(sh) == 0:
        return np.full(MINHASH_PERMS, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    x = sh.astype(np.uint64) & _MERSENNE
    # (a*x+b) mod p for each perm: (k, n) matrix, min over n
    with np.errstate(over="ignore"):
        v = (_PERM_A[:, None] * x[None, :] + _PERM_B[:, None]) % _MERSENNE
    return v.min(axis=1)


def minhash_batch(batch: pa.Table, ngram: int = 3,
                  portable: bool | None = None) -> pa.Table:
    """(doc_id, text) -> (doc_id, sig: list<uint64>[k])."""
    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    sets = shingle_hashes(df["text"], n=ngram, portable=portable)
    sigs = np.stack([minhash_signature(s) for s in sets]) if sets else np.empty((0, MINHASH_PERMS), np.uint64)
    return pa.table(
        {
            "doc_id": df["doc_id"].to_arrow(),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1), pa.uint64()), MINHASH_PERMS
            ),
        }
    )


_SENTINEL_SIG = np.uint64(0xFFFFFFFFFFFFFFFF)


def _drop_sentinel_sigs(sigs: pa.Table, perms: int = MINHASH_PERMS) -> pa.Table:
    """Remove empty-shingle (sentinel) signatures: real sig values are
    < 2^61, the sentinel fills every slot with 2^64-1, so slot 0
    decides.  Docs shorter than the shingle width share the sentinel,
    which would make EVERY pair of them a 10000 bp "near-dup" — they
    must never enter an LSH candidate set (round-4 ADVICE
    false-positive, generalized from decontaminate_fuzzy to the whole
    minhash family)."""
    if sigs.num_rows == 0:
        return sigs
    first = np.asarray(
        sigs.column("sig").combine_chunks().flatten()
    ).reshape(-1, perms)[:, 0]
    return sigs.filter(pa.array(first != _SENTINEL_SIG))


def _band_width(bands: int) -> int:
    """Rows per band, validating ``bands`` against MINHASH_PERMS.

    bands > MINHASH_PERMS makes rows = 0 (every doc hashes to the one
    FNV-seed bucket per band — either all candidates are cap-dropped or
    the self-join goes quadratic), and a non-divisor silently ignores
    the tail permutations; both are config errors, not data states.
    """
    if not 1 <= bands <= MINHASH_PERMS or MINHASH_PERMS % bands:
        raise ValueError(
            f"bands must divide MINHASH_PERMS={MINHASH_PERMS} "
            f"(1..{MINHASH_PERMS}); got {bands}")
    return MINHASH_PERMS // bands


def _band_rows(batch: pa.Table, bands: int, rows: int) -> pa.Table:
    """Explode signatures into (band, bucket_hash, doc_id) rows."""
    sig = np.asarray(batch.column("sig").combine_chunks().flatten()).reshape(
        -1, MINHASH_PERMS
    )
    doc = batch.column("doc_id").to_numpy()
    outs = []
    for b in range(bands):
        seg = sig[:, b * rows : (b + 1) * rows]
        # mix the band rows into one 64-bit bucket key
        with np.errstate(over="ignore"):
            acc = np.full(len(seg), np.uint64(1469598103934665603), np.uint64)
            for r in range(rows):
                acc = (acc ^ seg[:, r]) * np.uint64(1099511628211)
        outs.append(
            pa.table(
                {
                    "band": pa.array(np.full(len(doc), b, np.int32)),
                    "bucket": pa.array(acc, pa.uint64()),
                    "doc_id": pa.array(doc),
                }
            )
        )
    return pa.concat_tables(outs)


N_COARSE = 256  # coarse routing floor: a groupby over millions of tiny
# LSH buckets would pay a Python map_groups call per bucket; routing
# bucket-hash % n_routes gives ~n_routes groups, each processed as ONE
# vectorized polars self-join.  256 is the FLOOR — operators derive the
# actual count from input size (hashing.routes_for) so a route group's
# rows stay bounded as the corpus grows.


def _route_coarse(batch: pa.Table, key_cols: list[str],
                  n_routes: int) -> pa.Table:
    # n_routes is required: every caller derives it from input size
    # (routes_for), N_COARSE is only their floor
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in key_cols:
            h = h * np.uint64(1099511628211) + batch.column(c).to_numpy().astype(
                np.uint64
            )
    return batch.append_column(
        "route", pa.array((h % np.uint64(n_routes)).astype(np.int64))
    )


def _cap_buckets(df: pl.DataFrame, key_cols: list[str], max_bucket: int | None,
                 what: str) -> pl.DataFrame:
    """Skew guard: drop exact buckets with more than ``max_bucket``
    members before a self-join (a degenerate bucket — boilerplate
    shingles, near-empty-doc band values — makes the join quadratic).
    All members of an exact bucket share its coarse route, so the cap is
    globally exact.  Dropped buckets are logged, never silent."""
    if max_bucket is None or len(df) <= max_bucket:
        return df
    sizes = df.group_by(key_cols).agg(pl.len().alias("_n"))
    big = sizes.filter(pl.col("_n") > max_bucket)
    if len(big) == 0:
        return df
    kept = df.join(big.select(key_cols), on=key_cols, how="anti")
    _LOG.warning(
        "%s: dropped %d oversized bucket(s) (> %d members, %d rows) in route group",
        what, len(big), max_bucket, len(df) - len(kept),
    )
    a = _drop_counter()
    if a is not None:  # fire-and-forget: never block the worker
        a.add.remote(what, len(big), len(df) - len(kept))
    return kept


def _bucket_pairs(group: pa.Table, key_cols: list[str],
                  max_bucket: int | None = None) -> pa.Table:
    """All doc pairs sharing the exact key columns, vectorized: one
    self-join over this coarse route's rows."""
    df = pl.from_arrow(group).unique(subset=key_cols + ["doc_id"])
    df = _cap_buckets(df, key_cols, max_bucket, "lsh_bucket_pairs")
    j = df.join(df, on=key_cols, suffix="_r")
    j = j.filter(pl.col("doc_id") < pl.col("doc_id_r")).unique(
        subset=["doc_id", "doc_id_r"]
    )
    return pa.table(
        {
            "a": j["doc_id"].to_arrow(),
            "b": j["doc_id_r"].to_arrow(),
        }
    )


# plain (non-fixed-size) list: polars rejects null-masked fixed-size
# lists, and the join ships null sig slots on the pair rows
_SIG_TYPE = pa.list_(pa.uint64())


def _attach_sig(pairs_ds, sigs_ds, key: str, out: str, carry: list[str],
                n_routes: int):
    """Distributed reduce-side hash-join: attach the signature of
    ``pairs[key]`` as column ``out`` — union both datasets with a coarse
    route on the join key, group by route, and run ONE vectorized polars
    join per route.  All postings of a doc_id land in the same group, so
    the join is globally correct with no driver-side signature
    materialization and no broadcast (each route group holds ~1/n_routes
    of the signature table, bounded when n_routes scales with size)."""

    def tag_sigs(b: pa.Table) -> pa.Table:
        doc = b.column("doc_id").to_numpy()
        n = b.num_rows
        cols = {
            "route": pa.array(
                (doc.astype(np.uint64) % np.uint64(n_routes)).astype(np.int64)
            ),
            "kind": pa.array(np.zeros(n, np.int8)),
            "k": pa.array(doc.astype(np.int64)),
            "sig": b.column("sig").cast(_SIG_TYPE),
            "a": pa.nulls(n, pa.int64()),
            "b": pa.nulls(n, pa.int64()),
        }
        for c in carry:
            cols[c] = pa.nulls(n, _SIG_TYPE if c.startswith("sig") else pa.int64())
        return pa.table(cols)

    def tag_pairs(b: pa.Table) -> pa.Table:
        kv = b.column(key).to_numpy()
        n = b.num_rows
        cols = {
            "route": pa.array(
                (kv.astype(np.uint64) % np.uint64(n_routes)).astype(np.int64)
            ),
            "kind": pa.array(np.ones(n, np.int8)),
            "k": pa.array(kv.astype(np.int64)),
            "sig": pa.nulls(n, _SIG_TYPE),
            "a": b.column("a").cast(pa.int64()),
            "b": b.column("b").cast(pa.int64()),
        }
        for c in carry:
            cols[c] = b.column(c).cast(_SIG_TYPE if c.startswith("sig") else pa.int64())
        return pa.table(cols)

    unioned = sigs_ds.map_batches(tag_sigs, batch_format="pyarrow").union(
        pairs_ds.map_batches(tag_pairs, batch_format="pyarrow")
    )

    def join(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g)
        sigs = df.filter(pl.col("kind") == 0).select(
            pl.col("k"), pl.col("sig").alias(out)
        )
        prs = df.filter(pl.col("kind") == 1).select(["k", "a", "b", *carry])
        j = prs.join(sigs, on="k", how="inner").drop("k")
        return j.to_arrow()

    return unioned.groupby("route").map_groups(join, batch_format="pyarrow")


# below this many documents the signature table (k*8 B/doc — 512 MB at
# the default) broadcasts to the verify tasks; above it, two reduce-side
# hash-joins shuffle the signatures instead (nothing signature-sized
# ever touches one process) — the standard broadcast-vs-shuffle join
# selection, here decided by the *known* signature row count
BROADCAST_SIG_LIMIT = 1_000_000


def minhash_lsh_pairs(ds, bands: int = 16, threshold: float = 0.5, ngram: int = 3,
                      max_bucket: int = 10_000,
                      broadcast_limit: int = BROADCAST_SIG_LIMIT,
                      n_routes: int | None = None,
                      portable: bool | None = None):
    """Near-dup candidate pairs via MinHash LSH, verified against the
    full-signature Jaccard estimate.

    Fully distributed at scale: banding buckets shuffle by (band,
    bucket); the verify stage attaches signatures either from a
    broadcast sorted array (small corpora, one ``ray.put`` read per
    actor) or via two reduce-side hash-joins (``_attach_sig``) once the
    corpus exceeds ``broadcast_limit`` docs — so the pipeline holds at
    10^10 docs with no driver-side signature materialization.
    ``max_bucket`` caps degenerate LSH buckets (e.g. near-empty docs
    sharing a band) to bound the per-bucket self-join; dropped buckets
    are logged.

    Returns Dataset (a, b, est_sim_bp) with a < b,
    est_sim_bp = floor(10000 * matching_perms / k) >= floor(10000*threshold).
    """
    rows = _band_width(bands)
    sigs = ds.map_batches(
        lambda b: _drop_sentinel_sigs(minhash_batch(b, ngram, portable)),
        batch_format="pyarrow",
    ).materialize()  # reused: banding + both join sides; sentinel
    # (sub-n-token) docs are excluded — they all share one signature
    # and would pair with each other at est_sim_bp=10000 despite
    # sharing zero content
    n_docs = sigs.count()
    if n_docs == 0:
        # every doc shorter than the shingle width (all-sentinel) or an
        # empty corpus: an empty pair set, not a concat_tables([]) crash
        # in the broadcast path below
        return ray.data.from_arrow(pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "est_sim_bp": pa.array([], pa.int64())}))
    # band rows explode x bands; route width scales with that row count
    nr = n_routes if n_routes is not None else routes_for(n_docs * bands)

    cand = (
        sigs.map_batches(
            lambda b: _route_coarse(
                _band_rows(b, bands, rows), ["band", "bucket"], nr
            ),
            batch_format="pyarrow",
        )
        .groupby("route")
        .map_groups(
            lambda g: _bucket_pairs(g, ["band", "bucket"], max_bucket=max_bucket),
            batch_format="pyarrow",
        )
    )

    min_bp = int(np.floor(10000.0 * threshold))

    def est_table(a, b, sa, sb) -> pa.Table:
        match = (sa == sb).sum(axis=1)
        est = np.floor(10000.0 * match / MINHASH_PERMS).astype(np.int64)
        keep = est >= min_bp
        return pa.table(
            {"a": pa.array(np.asarray(a)[keep]), "b": pa.array(np.asarray(b)[keep]),
             "est_sim_bp": pa.array(est[keep])}
        )

    _EMPTY = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "est_sim_bp": pa.array([], pa.int64())}
    )

    if n_docs <= broadcast_limit:
        # small side: ship the sorted signature matrix once per actor
        sig_tbl = pa.concat_tables(
            [pa.table(b) for b in sigs.iter_batches(batch_format="pyarrow")]
        )
        ids = sig_tbl.column("doc_id").to_numpy()
        mat = np.asarray(sig_tbl.column("sig").combine_chunks().flatten()).reshape(
            -1, MINHASH_PERMS
        )
        order = np.argsort(ids)
        lookup_ref = ray.put((ids[order], mat[order]))

        def verify_bc(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _EMPTY
            lids, lmat = ray.get(lookup_ref)
            df = pl.from_arrow(batch).unique(subset=["a", "b"])
            a = df["a"].to_numpy()
            b = df["b"].to_numpy()
            return est_table(a, b, lmat[np.searchsorted(lids, a)],
                             lmat[np.searchsorted(lids, b)])

        pairs = cand.map_batches(verify_bc, batch_format="pyarrow")
        # candidate pairs can surface in multiple bands -> global dedup
        return pairs.groupby(["a", "b"]).aggregate(Min("est_sim_bp")).map_batches(
            lambda t: pa.table(
                {"a": t.column("a"), "b": t.column("b"),
                 "est_sim_bp": t.column("min(est_sim_bp)")}
            ),
            batch_format="pyarrow",
        )

    # large side: dedup pairs across bands, then shuffle-join each side
    cand = cand.groupby(["a", "b"]).aggregate(Count()).select_columns(["a", "b"])
    sig_nr = n_routes if n_routes is not None else routes_for(n_docs)
    with_a = _attach_sig(cand, sigs, "a", "sig_a", carry=[], n_routes=sig_nr)
    with_ab = _attach_sig(with_a, sigs, "b", "sig_b", carry=["sig_a"],
                          n_routes=sig_nr)

    def verify_join(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY
        sa = np.asarray(batch.column("sig_a").combine_chunks().flatten()).reshape(
            -1, MINHASH_PERMS
        )
        sb = np.asarray(batch.column("sig_b").combine_chunks().flatten()).reshape(
            -1, MINHASH_PERMS
        )
        return est_table(batch.column("a").to_numpy(),
                         batch.column("b").to_numpy(), sa, sb)

    return with_ab.map_batches(verify_join, batch_format="pyarrow")


BROADCAST_DROP_LIMIT = 100_000_000  # ~800 MB of int64 ids
DRIVER_CLUSTER_LIMIT = 5_000_000  # pairs; two int64 arrays ~80 MB


def _drop_ids_numpy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Drop-set of a small pair list: vectorized min-label propagation
    with pointer jumping (no per-pair Python loop).  Returns the sorted
    doc_ids that are NOT the min of their connected component."""
    ids = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(ids, a)
    bi = np.searchsorted(ids, b)
    lab = np.arange(len(ids))
    while True:
        new = lab.copy()
        np.minimum.at(new, ai, lab[bi])
        np.minimum.at(new, bi, lab[ai])
        while True:  # pointer jumping: collapse chains to roots
            jumped = new[new]
            if np.array_equal(jumped, new):
                break
            new = jumped
        if np.array_equal(new, lab):
            break
        lab = new
    return ids[lab != np.arange(len(ids))]


def _drop_ds_distributed(pairs):
    """Drop-set of a LARGE pair list as a Dataset (doc_id) — distributed
    connected components (graph.connected_components: min-label +
    pointer jumping, exact fixpoint) over the pair edges.  doc_ids pad
    to 19-digit strings so the lexicographic min label IS the numeric
    min doc_id; a node is dropped iff it is not its own component."""
    from .graph import connected_components

    def pad(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(["a", "b"]))
        return pa.table({
            "a": df["a"].cast(pl.String).str.zfill(19).to_arrow(),
            "b": df["b"].cast(pl.String).str.zfill(19).to_arrow(),
        })

    cc = connected_components(
        pairs.map_batches(pad, batch_format="pyarrow"), "a", "b"
    )

    def extract(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).filter(pl.col("node") != pl.col("component"))
        return pa.table({"doc_id": df["node"].cast(pl.Int64).to_arrow()})

    return cc.map_batches(extract, batch_format="pyarrow")


def minhash_dedup_keep(ds, broadcast_drop_limit: int = BROADCAST_DROP_LIMIT,
                       driver_cluster_limit: int = DRIVER_CLUSTER_LIMIT,
                       **kw):
    """Kept doc_ids after MinHash near-dup clustering (connected
    components over the near-dup pair list, keep the min doc_id per
    cluster).

    Clustering is size-gated like every other broadcast in this module:
    at or below ``driver_cluster_limit`` pairs the components come from
    a VECTORIZED numpy min-label/pointer-jumping pass driver-side (a
    5M-pair list is ~80 MB and converges in a few O(E) numpy rounds —
    no per-pair Python loop); above it the pair list never leaves the
    cluster — :func:`graph.connected_components` (the same distributed
    min-label + pointer-jumping exchange used by ``host_components``)
    computes exact components and the drop-set is derived as a Dataset.
    Reference analogue: archetype election in
    tool/GenerateGraphMap.java:33-46 (first copy wins per digest).

    The resulting drop-set broadcasts (one sorted array per actor)
    while it fits; above ``broadcast_drop_limit`` ids it switches to a
    reduce-side ANTI-JOIN — drops and docs co-route by
    ``doc_id % n_routes`` and each route group filters against only its
    own slice, so no process ever holds the full drop-set (round-2
    VERDICT hardening #8).
    """
    pairs = minhash_lsh_pairs(ds, **kw).materialize()
    n_pairs = pairs.count()
    drop_ds = None
    if n_pairs <= driver_cluster_limit:
        batches = [pa.table(b)
                   for b in pairs.iter_batches(batch_format="pyarrow")]
        # concat_tables([]) raises; a clean corpus yields ZERO batches
        pair_tbl = pa.concat_tables(batches) if batches else None
        if pair_tbl is not None and pair_tbl.num_rows:
            drop = _drop_ids_numpy(pair_tbl.column("a").to_numpy(),
                                   pair_tbl.column("b").to_numpy())
        else:
            drop = np.array([], dtype=np.int64)
        if len(drop) > broadcast_drop_limit:
            drop_ds = ray.data.from_arrow([
                pa.table({"doc_id": pa.array(c, pa.int64())})
                for c in np.array_split(drop, max(1, len(drop) // 1_000_000))
            ])
    else:
        drop_ds = _drop_ds_distributed(pairs).materialize()
        n_drop = drop_ds.count()
        if n_drop <= broadcast_drop_limit:
            drop = np.sort(np.concatenate(
                [b["doc_id"].to_numpy() for b in
                 drop_ds.iter_batches(batch_format="pyarrow")]
                or [np.array([], dtype=np.int64)]
            ))
            drop_ds = None

    if drop_ds is None:
        drop_ref = ray.put(drop)

        def keep(batch: pa.Table) -> pa.Table:
            d = ray.get(drop_ref)  # sorted: searchsorted membership
            if len(d) == 0:  # clean corpus: nothing to drop
                return batch
            ids = batch.column("doc_id").to_numpy()
            pos = np.searchsorted(d, ids)
            hit = (pos < len(d)) & (d[np.minimum(pos, len(d) - 1)] == ids)
            return batch.filter(pa.array(~hit))

        return ds.map_batches(keep, batch_format="pyarrow")

    # anti-join path: route drops and docs together, filter per route
    nr = derive_routes(ds)
    schema = ds.schema()
    names = schema.names

    def tag_docs(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return b.append_column(
            "_kind", pa.array(np.ones(b.num_rows, np.int8))
        ).append_column(
            "route",
            pa.array((ids.astype(np.uint64) % np.uint64(nr)).astype(np.int64)),
        )

    def drops_block(b: pa.Table) -> pa.Table:
        arr = b.column("doc_id").to_numpy()
        cols = {}
        for nm, typ in zip(names, schema.types):
            if nm == "doc_id":
                cols[nm] = pa.array(arr, typ)
            else:
                cols[nm] = pa.nulls(len(arr), typ)
        cols["_kind"] = pa.array(np.zeros(len(arr), np.int8))
        cols["route"] = pa.array(
            (arr.astype(np.uint64) % np.uint64(nr)).astype(np.int64)
        )
        return pa.table(cols)

    drops_ds = drop_ds.map_batches(drops_block, batch_format="pyarrow")

    def filter_group(g: pa.Table) -> pa.Table:
        kind = g.column("_kind").to_numpy()
        ids = g.column("doc_id").to_numpy()
        local_drop = np.unique(ids[kind == 0])
        docs = g.filter(pa.array(kind == 1))
        dids = docs.column("doc_id").to_numpy()
        pos = np.searchsorted(local_drop, dids)
        hit = (pos < len(local_drop)) & (
            local_drop[np.minimum(pos, max(0, len(local_drop) - 1))] == dids
        ) if len(local_drop) else np.zeros(len(dids), bool)
        return docs.filter(pa.array(~hit)).drop_columns(["_kind", "route"])

    return (
        ds.map_batches(tag_docs, batch_format="pyarrow")
        .union(drops_ds)
        .groupby("route")
        .map_groups(filter_group, batch_format="pyarrow")
    )


# ------------------------------------------------------------------ simhash

def simhash_batch(batch: pa.Table,
                  portable: bool | None = None) -> pa.Table:
    """(doc_id, text) -> (doc_id, simhash: uint64) over token hashes."""
    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    toks = df.select(
        pl.col("doc_id"),
        pl.col("text").str.to_lowercase().str.extract_all(r"\S+").alias("t"),
    )
    lens = toks["t"].list.len().fill_null(0).to_numpy()
    flat = toks["t"].explode().drop_nulls()
    h = hash64(flat.to_arrow(), portable) if flat.len() else np.empty(0, np.uint64)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    ) * 2 - 1  # (n_tokens, 64) in {-1, +1}
    row = np.repeat(np.arange(len(lens)), lens)
    acc = np.zeros((len(lens), 64), dtype=np.int64)
    np.add.at(acc, row, bits)
    sim = ((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return pa.table(
        {"doc_id": toks["doc_id"].to_arrow(), "simhash": pa.array(sim, pa.uint64())}
    )


def simhash_pairs(ds, max_hamming: int = 3, max_bucket: int | None = 10_000,
                  n_routes: int | None = None,
                  portable: bool | None = None):
    """Near-dup pairs with hamming(simhash) <= max_hamming via 4x16-bit
    band bucketing (any pair within hamming 3 shares >=1 exact band).
    ``max_bucket`` caps degenerate band buckets (logged when hit)."""
    sigs = ds.map_batches(
        lambda b: simhash_batch(b, portable), batch_format="pyarrow"
    ).materialize()
    nr = n_routes if n_routes is not None else routes_for(sigs.count() * 4)

    def bands(batch: pa.Table) -> pa.Table:
        sim = batch.column("simhash").to_numpy()
        doc = batch.column("doc_id").to_numpy()
        outs = []
        for b in range(4):
            outs.append(
                pa.table(
                    {
                        "band": pa.array(np.full(len(doc), b, np.int32)),
                        "bucket": pa.array(
                            (sim >> np.uint64(16 * b)) & np.uint64(0xFFFF), pa.uint64()
                        ),
                        "doc_id": pa.array(doc),
                        "simhash": pa.array(sim, pa.uint64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    def route_pairs(group: pa.Table) -> pa.Table:
        # one vectorized self-join per coarse route, then popcount
        df = pl.from_arrow(group).unique(subset=["band", "bucket", "doc_id"])
        df = _cap_buckets(df, ["band", "bucket"], max_bucket, "simhash_pairs")
        j = df.join(df, on=["band", "bucket"], suffix="_r")
        j = j.filter(pl.col("doc_id") < pl.col("doc_id_r")).unique(
            subset=["doc_id", "doc_id_r"]
        )
        if len(j) == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "hamming": pa.array([], pa.int64())}
            )
        x = (j["simhash"].to_numpy() ^ j["simhash_r"].to_numpy()).astype(np.uint64)
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(
            axis=1
        ).astype(np.int64)
        keep = ham <= max_hamming
        return pa.table(
            {"a": j["doc_id"].to_numpy()[keep], "b": j["doc_id_r"].to_numpy()[keep],
             "hamming": pa.array(ham[keep])}
        )

    pairs = (
        sigs.map_batches(
            lambda b: _route_coarse(bands(b), ["band", "bucket"], nr),
            batch_format="pyarrow",
        )
        .groupby("route")
        .map_groups(route_pairs, batch_format="pyarrow")
    )
    return pairs.groupby(["a", "b"]).aggregate(Min("hamming")).map_batches(
        lambda t: pa.table(
            {"a": t.column("a"), "b": t.column("b"), "hamming": t.column("min(hamming)")}
        ),
        batch_format="pyarrow",
    )


# --------------------------------------------------- duplicate-span coverage

def dup_span_stats(ds, n: int = 5, n_routes: int | None = None,
                   hash_key: bool = False):
    """Exact corpus-global duplicate-span coverage per document
    (Lee et al. 2021, "Deduplicating Training Data Makes Language
    Models Better", simplified from suffix-array substrings to token
    n-gram positions): a shingle position is *duplicated* when its
    lowercase token ``n``-gram occurs more than once in the WHOLE
    corpus — within the same document or in any other.

    Returns (doc_id, n_pos, n_dup_pos, dup_frac_bp) for every document
    (``n_pos`` = token-count - n + 1 floor 0;
    ``dup_frac_bp`` = floor(10000 * n_dup_pos / max(n_pos, 1))).

    Scale shape: stage 1 pre-aggregates each batch to (doc_id, shingle,
    count) rows; stage 2 routes by shingle hash so every occurrence of a
    shingle lands in one route group, whose ONE vectorized polars
    groupby computes the exact global total and per-doc duplicated
    partials; stage 3 routes the tiny per-doc partial counts by doc_id
    and sums.  Both shuffles move pre-aggregated counts (never
    positions), and no task ever holds more than one route group.
    With ``hash_key=True`` shingles aggregate and route by their
    portable 64-bit hash instead of the string, so the wide exchange
    carries fixed-width ints (the 100 TB path, as in
    :func:`strip_dup_spans`; a collision can only over-count a
    duplicate at ~2^-64 per distinct-gram pair) — the default string
    key stays exact and is what the DuckDB oracle replays.
    """
    nr = derive_routes(ds, n_routes)

    def explode(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        tall = (pl.DataFrame({"doc_id": df["doc_id"],
                              "s": word_ngrams(df["text"], n)})
                .explode("s").drop_nulls("s"))
        if hash_key:
            # convert even a zero-row frame: an empty batch that keeps
            # 's' as string while others emit int64 poisons the shuffle
            # with mismatched block schemas
            h = (hash64(tall["s"].to_arrow(), portable=True)
                 .astype(np.int64) if tall.height else np.empty(0, np.int64))
            tall = tall.drop("s").with_columns(pl.Series("s", h))
        tall = tall.group_by(["doc_id", "s"]).agg(pl.len().alias("c"))
        t = tall.to_arrow()
        return t.append_column("route", route_of(t.column("s"), nr))

    def per_shingle(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        tot = df.group_by("s").agg(pl.col("c").sum().alias("tot"))
        df = df.join(tot, on="s")
        out = (df.group_by("doc_id")
               .agg(pl.col("c").sum().cast(pl.Int64).alias("n_pos"),
                    pl.col("c").filter(pl.col("tot") >= 2).sum()
                    .fill_null(0).cast(pl.Int64).alias("n_dup_pos")))
        return out.to_arrow()

    partials = (ds.map_batches(explode, batch_format="pyarrow")
                  .groupby("route")
                  .map_groups(per_shingle, batch_format="pyarrow"))

    def zeros(batch: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(batch.num_rows, np.int64))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_pos": z, "n_dup_pos": z})

    def route_doc(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "route", route_of(batch.column("doc_id"), nr))

    def reduce_doc(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group.drop_columns(["route"]))
        out = (df.group_by("doc_id")
               .agg(pl.col("n_pos").sum(), pl.col("n_dup_pos").sum())
               .with_columns(
                   (pl.lit(10_000) * pl.col("n_dup_pos")
                    // pl.max_horizontal(pl.col("n_pos"), pl.lit(1)))
                   .cast(pl.Int64).alias("dup_frac_bp")))
        return out.to_arrow()

    all_docs = ds.map_batches(zeros, batch_format="pyarrow")
    return (partials.union(all_docs)
            .map_batches(route_doc, batch_format="pyarrow")
            .groupby("route")
            .map_groups(reduce_doc, batch_format="pyarrow"))


def strip_dup_spans(ds, n: int = 5, n_routes: int | None = None,
                    hash_key: bool = False):
    """Exact-substring duplicate REMOVAL (Lee et al. 2021 ExactSubstr,
    simplified from suffix-array substrings to token ``n``-grams):
    rewrite every document with the tokens covered by any
    globally-duplicated ``n``-gram cut out.  ALL occurrences are
    removed (not all-but-first), so the result is independent of
    document order — deterministic and SQL-replayable.

    Returns one row per document: ``(doc_id, n_tok, n_kept,
    text_stripped)`` where ``text_stripped`` is the surviving
    LOWERCASED tokens joined by single spaces (``''`` when everything
    was removed; duplication is judged on lowercase n-grams, so the
    output text is normalized the same way).

    Scale shape (three exchanges, mirroring :func:`dup_span_stats`):

    1. gram rows ``(doc_id, pos, s)`` route by shingle, so every
       occurrence of a shingle lands in one route group whose ONE
       vectorized polars pass computes the exact global count and
       emits only the duplicated starts ``(doc_id, pos)``;
    2. duplicated starts route by ``doc_id`` together with the
       documents (tag + union, the module's anti-join layout) and one
       polars pass per route expands starts to covered token indexes,
       anti-joins the exploded token table, and reassembles the text.

    Unlike :func:`dup_span_stats` this op MUST move positions (the
    rewrite needs them), so the wide exchange is O(total tokens) gram
    rows.  With ``hash_key=True`` grams route and count by their
    portable 64-bit hash instead of the string — the exchange then
    carries fixed-width ints (the 100 TB path; a hash collision can
    only over-remove, at ~2^-64 per distinct-gram pair), while the
    default string key is exact and what the DuckDB oracle replays.
    Reference analogue: this generalizes BuildRepetitionSet's
    "repeated position set" (tool/BuildRepetitionSet.java:30-43) from
    whole-page duplicates to in-page token spans.
    """
    nr = derive_routes(ds, n_routes)

    def explode(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        tall = (pl.DataFrame({"doc_id": df["doc_id"],
                              "s": word_ngrams(df["text"], n)})
                .with_columns(pl.int_ranges(pl.col("s").list.len())
                              .alias("pos"))
                .explode(["s", "pos"])
                .drop_nulls("s"))
        if hash_key:
            h = (hash64(tall["s"].to_arrow(), portable=True)
                 .astype(np.int64) if tall.height else np.empty(0, np.int64))
            tall = tall.drop("s").with_columns(pl.Series("s", h))
        t = tall.select(["doc_id", "pos", "s"]).to_arrow()
        return t.append_column("route", route_of(t.column("s"), nr))

    def dup_starts(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        tot = df.group_by("s").agg(pl.len().alias("tot"))
        out = (df.join(tot.filter(pl.col("tot") >= 2), on="s", how="semi")
               .select(["doc_id", "pos"]))
        return out.to_arrow()

    starts = (ds.map_batches(explode, batch_format="pyarrow")
              .groupby("route")
              .map_groups(dup_starts, batch_format="pyarrow"))

    # ---- exchange 2: starts + docs co-routed by doc_id, one rewrite
    # pass per route.  Shared schema: (doc_id, text, pos, _kind, route).
    def tag_docs(b: pa.Table) -> pa.Table:
        t = pa.table({
            "doc_id": b.column("doc_id"),
            "text": b.column("text"),
            "pos": pa.nulls(b.num_rows, pa.int64()),
            "_kind": pa.array(np.ones(b.num_rows, np.int8)),
        })
        return t.append_column("route", route_of(b.column("doc_id"), nr))

    # the null filler must match the SOURCE text type (large_string for
    # anything that round-tripped through polars) or the union's two
    # arms emit mismatched block schemas
    text_type = ds.schema().base_schema.field("text").type

    def tag_starts(b: pa.Table) -> pa.Table:
        t = pa.table({
            "doc_id": b.column("doc_id"),
            "text": pa.nulls(b.num_rows, text_type),
            "pos": b.column("pos").cast(pa.int64()),
            "_kind": pa.array(np.zeros(b.num_rows, np.int8)),
        })
        return t.append_column("route", route_of(b.column("doc_id"), nr))

    def rewrite(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        docs = df.filter(pl.col("_kind") == 1).select(["doc_id", "text"])
        cov = (df.filter(pl.col("_kind") == 0)
               .select(["doc_id", "pos"])
               .join(pl.DataFrame({"off": np.arange(n, dtype=np.int64)}),
                     how="cross")
               .select(pl.col("doc_id"),
                       (pl.col("pos") + pl.col("off")).alias("tpos"))
               .unique())
        toks = docs.with_columns(
            pl.col("text").str.to_lowercase().str.extract_all(r"\S+")
            .alias("t")).drop("text")
        base = toks.select(pl.col("doc_id"),
                           pl.col("t").list.len().cast(pl.Int64)
                           .alias("n_tok"))
        tall = (toks.with_columns(pl.int_ranges(pl.col("t").list.len())
                                  .cast(pl.List(pl.Int64)).alias("tpos"))
                .explode(["t", "tpos"]).drop_nulls("t"))
        kept = (tall.join(cov, on=["doc_id", "tpos"], how="anti")
                .sort(["doc_id", "tpos"])
                .group_by("doc_id", maintain_order=True)
                .agg(pl.len().cast(pl.Int64).alias("n_kept"),
                     pl.col("t").str.join(" ").alias("text_stripped")))
        out = (base.join(kept, on="doc_id", how="left")
               .with_columns(pl.col("n_kept").fill_null(0),
                             pl.col("text_stripped").fill_null(""))
               .select(["doc_id", "n_tok", "n_kept", "text_stripped"]))
        return out.to_arrow()

    return (ds.map_batches(tag_docs, batch_format="pyarrow")
            .union(starts.map_batches(tag_starts, batch_format="pyarrow"))
            .groupby("route")
            .map_groups(rewrite, batch_format="pyarrow"))


# -------------------------------------------------------------- ngram jaccard

# above this many documents, ngram_jaccard_pairs turns its DF cap on by
# default (see the in-function warning); the cap value bounds any one
# posting list's self-join to ~NGRAM_AUTO_DF_CAP^2 pair rows
NGRAM_AUTO_DF_DOCS = 1_000_000
NGRAM_AUTO_DF_CAP = 10_000


def ngram_jaccard_pairs(ds, n: int = 3, min_sim_bp: int = 5000,
                        max_df: int | None | str = "auto",
                        n_routes: int | None = None):
    """EXACT word-n-gram Jaccard >= min_sim_bp/10000 over all pairs, via
    a shingle inverted index (no O(n^2) driver work):

    (doc_id, shingle_hash) -> groupby(shingle) -> co-occurring pairs ->
    sum matches per pair -> jaccard with per-doc set sizes.

    ``max_df`` drops shingles with document frequency above the cap
    before the self-join: boilerplate shingles on real web text make
    the posting-list join quadratic; with a cap the similarity becomes
    a LOWER BOUND and the dropped shingles are logged plus counted in
    :func:`dropped_bucket_stats`.  Three modes, chosen explicitly:

    - ``max_df="auto"`` (default): exact below ``NGRAM_AUTO_DF_DOCS``
      docs, capped at ``NGRAM_AUTO_DF_CAP`` above — the engagement is
      recorded under ``"ngram_jaccard_pairs:auto_max_df"`` in
      :func:`dropped_bucket_stats`, so callers can detect it
      programmatically, not just in a log line;
    - ``max_df=None``: always exact, at any corpus size (the caller
      owns the quadratic-boilerplate risk);
    - ``max_df=<int>``: explicit cap.

    All postings of one shingle share a coarse route, so the DF cut is
    globally exact.

    Output (a, b, sim_bp) with sim_bp = floor(10000*|A∩B|/|A∪B|).
    """

    def explode(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        sets = shingle_hashes(df["text"], n=n)
        doc = df["doc_id"].to_numpy()
        lens = np.array([len(s) for s in sets], dtype=np.int64)
        return pa.table(
            {
                "sh": pa.array(
                    np.concatenate(sets) if sets else np.empty(0, np.uint64), pa.uint64()
                ),
                "doc_id": pa.array(np.repeat(doc, lens)),
                "set_size": pa.array(np.repeat(lens, lens)),
            }
        )

    inv = ds.map_batches(explode, batch_format="pyarrow")
    # the inverted index explodes to ~tokens-per-doc rows per doc, so
    # route width derives from doc count at a much smaller docs/route
    # target (~2k docs ≈ 10^6 shingle rows per route group)
    nr = derive_routes(ds, n_routes, target_rows_per_route=2_000)
    if max_df == "auto":
        try:
            n_docs = ds._meta_count()
        except Exception:
            n_docs = None
        if n_docs is None or n_docs > NGRAM_AUTO_DF_DOCS:
            # real web text WILL contain boilerplate shingles whose
            # posting-list self-join is quadratic; above this corpus
            # size exactness-by-default is a footgun, so the DF cap
            # turns on.  An UNKNOWN count (dataset behind a transform,
            # no metadata) must engage the cap too — the large-pipeline
            # case is exactly where the count is unknown.  Pass
            # max_df=None for exact-at-any-size.
            max_df = NGRAM_AUTO_DF_CAP
            _LOG.warning(
                "ngram_jaccard_pairs: corpus has %s docs (cap %d); "
                "enabling max_df=%d (exact result needs max_df=None)",
                "unknown" if n_docs is None else n_docs,
                NGRAM_AUTO_DF_DOCS, max_df,
            )
            c = _drop_counter()
            if c is not None:  # programmatic signal of the decision
                c.add.remote("ngram_jaccard_pairs:auto_max_df", 0, 0)
        else:
            max_df = None
    elif isinstance(max_df, str):
        raise ValueError(f"max_df must be 'auto', None or int, got {max_df!r}")

    def co_pairs(group: pa.Table) -> pa.Table:
        # vectorized inverted-index self-join over this coarse route;
        # partial match counts per pair (summed globally downstream)
        df = pl.from_arrow(group).unique(subset=["sh", "doc_id"])
        df = _cap_buckets(df, ["sh"], max_df, "ngram_jaccard_pairs")
        j = df.join(df, on="sh", suffix="_r")
        j = j.filter(pl.col("doc_id") < pl.col("doc_id_r"))
        agg = j.group_by(["doc_id", "doc_id_r"]).agg(
            pl.len().cast(pl.Int64).alias("m"),
            pl.col("set_size").first().alias("sa"),
            pl.col("set_size_r").first().alias("sb"),
        )
        return pa.table(
            {"a": agg["doc_id"].to_arrow(), "b": agg["doc_id_r"].to_arrow(),
             "sa": agg["sa"].to_arrow(), "sb": agg["sb"].to_arrow(),
             "m": agg["m"].to_arrow()}
        )

    pairs = (
        inv.map_batches(
            lambda b: _route_coarse(b, ["sh"], nr), batch_format="pyarrow"
        )
        .groupby("route")
        .map_groups(co_pairs, batch_format="pyarrow")
    )
    agg = pairs.groupby(["a", "b"]).aggregate(Sum("m"), Min("sa"), Min("sb"))

    def finish(batch: pa.Table) -> pa.Table:
        m = batch.column("sum(m)").to_numpy().astype(np.float64)
        sa = batch.column("min(sa)").to_numpy().astype(np.float64)
        sb = batch.column("min(sb)").to_numpy().astype(np.float64)
        sim = np.floor(10000.0 * m / (sa + sb - m)).astype(np.int64)
        keep = sim >= min_sim_bp
        return pa.table(
            {
                "a": batch.column("a").filter(pa.array(keep)),
                "b": batch.column("b").filter(pa.array(keep)),
                "sim_bp": pa.array(sim[keep]),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def embedding_neardup_pairs_lsh(ds, threshold: float = 0.9,
                                id_col: str = "vec_id",
                                vec_col: str = "embedding",
                                n_planes: int | None = None,
                                multiprobe: int = 1,
                                max_bucket: int = 2_000,
                                target_bucket_rows: int = 64,
                                n_routes: int | None = None):
    """Scale path for embedding near-dup: random-hyperplane signatures
    partition the vectors, candidate pairs form only inside a bucket
    (each vector also probes its ``multiprobe``-bit-flip neighbor
    buckets), and the exact cosine verify runs INSIDE the route group on
    the co-shuffled vectors — no vector matrix is ever broadcast or
    materialized in one place.  Approximate: output ⊆ the exact pair set
    (high recall for high thresholds, where near-dups rarely straddle
    many hyperplanes).  ``max_bucket`` caps degenerate buckets (logged).

    ``n_planes`` defaults to ``log2(n / target_bucket_rows)`` so bucket
    population stays ~constant as the corpus grows — the self-join per
    bucket is then bounded and total work is O(n) buckets; the price is
    recall falling with corpus size at a FIXED low threshold, which is
    the honest LSH tradeoff (near-dup LSH is built for high thresholds).
    """
    from .simsearch import _planes

    n = ds.count()
    if n_planes is None:
        n_planes = min(24, max(4, int(np.ceil(np.log2(max(2, n / target_bucket_rows))))))
    # each vector emits 1 + probed-neighbor copies; route width scales
    # with those VECTOR-carrying rows (they are ~dim*8 B each, so the
    # per-route target is much smaller than for scalar rows)
    reps = 1 + (n_planes if multiprobe >= 1 else 0) + (
        n_planes * (n_planes - 1) // 2 if multiprobe >= 2 else 0
    )
    nr = n_routes if n_routes is not None else routes_for(
        n * reps, target_rows_per_route=100_000
    )

    _EMIT_EMPTY = pa.table(
        {
            "bucket": pa.array([], pa.uint64()),
            "doc_id": pa.array([], pa.int64()),
            "vec": pa.array([], pa.list_(pa.float64())),
            "route": pa.array([], pa.int64()),
        }
    )

    def emit(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMIT_EMPTY
        ids = batch.column(id_col).to_numpy()
        col = batch.column(vec_col).combine_chunks()
        dim = len(col[0])
        m = np.asarray(col.flatten()).reshape(-1, dim).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        # n-aware draw: _planes(n=...) extends the plane set for
        # n_planes > the simsearch default instead of silently
        # truncating to 12 (which crashed the bit-pack at ~262k+ rows)
        planes = _planes(dim, seed=555, n=n_planes)
        bits = (m @ planes.T) > 0
        base = (
            bits.astype(np.uint64)
            << np.arange(n_planes, dtype=np.uint64)[None, :]
        ).sum(axis=1, dtype=np.uint64)
        buckets = [base]
        if multiprobe >= 1:
            for p in range(n_planes):
                buckets.append(base ^ np.uint64(1 << p))
        if multiprobe >= 2:  # 2-bit flips: all plane pairs
            for p1 in range(n_planes):
                for p2 in range(p1 + 1, n_planes):
                    buckets.append(base ^ np.uint64((1 << p1) | (1 << p2)))
        reps = len(buckets)
        allb = np.concatenate(buckets)
        rid = np.tile(np.arange(len(ids)), reps)
        return pa.table(
            {
                "bucket": pa.array(allb, pa.uint64()),
                "doc_id": pa.array(ids[rid].astype(np.int64)),
                # plain list (not fixed-size) so empty blocks share the
                # schema exactly
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(m[rid].reshape(-1)), dim
                ).cast(pa.list_(pa.float64())),
                "route": pa.array(
                    (allb % np.uint64(nr)).astype(np.int64)
                ),
            }
        )

    def pairs_in_route(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group).unique(subset=["bucket", "doc_id"])
        df = _cap_buckets(df, ["bucket"], max_bucket, "embedding_neardup_lsh")
        j = df.join(df, on="bucket", suffix="_r")
        j = j.filter(pl.col("doc_id") < pl.col("doc_id_r")).unique(
            subset=["doc_id", "doc_id_r"]
        )
        if len(j) == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        va = np.stack(j["vec"].to_numpy())
        vb = np.stack(j["vec_r"].to_numpy())
        sim = np.einsum("ij,ij->i", va, vb)
        keep = sim > threshold
        return pa.table(
            {
                "a": j["doc_id"].to_numpy()[keep],
                "b": j["doc_id_r"].to_numpy()[keep],
            }
        )

    cand = (
        ds.map_batches(emit, batch_format="pyarrow")
        .groupby("route")
        .map_groups(pairs_in_route, batch_format="pyarrow")
    )
    # a pair can meet in several probed buckets -> global dedup
    return cand.groupby(["a", "b"]).aggregate(Count()).select_columns(["a", "b"])


# --------------------------------------------------------- embedding cosine

def embedding_neardup_pairs(ds, threshold: float = 0.9, id_col: str = "vec_id",
                            vec_col: str = "embedding"):
    """Pairs (a < b) with cosine similarity > threshold.

    The full normalized matrix is broadcast once via ``ray.put``; each
    batch does one float32 matmul against it (O(B*N*d) FLOPs, no pairs
    shuffle). At 100 TB scale the broadcast side becomes IVF/LSH
    buckets (see simsearch.lsh_ann) — this is the exact baseline.
    """
    tbl = pa.concat_tables(
        [pa.table(b) for b in ds.select_columns([id_col, vec_col])
         .iter_batches(batch_format="pyarrow")]
    )
    ids = tbl.column(id_col).to_numpy()
    dim = len(tbl.column(vec_col)[0])
    mat = np.asarray(tbl.column(vec_col).combine_chunks().flatten()).reshape(-1, dim).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    ref = ray.put((ids, mat))

    def find(batch: pa.Table) -> pa.Table:
        aids, amat = ray.get(ref)
        bids = batch.column(id_col).to_numpy()
        bm = np.asarray(batch.column(vec_col).combine_chunks().flatten()).reshape(-1, dim).astype(np.float64)
        bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-30)
        sims = bm @ amat.T
        bi, ai = np.nonzero(sims > threshold)
        a = bids[bi]
        b = aids[ai]
        keep = a < b  # dedup + drop self-pairs
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})

    return ds.map_batches(find, batch_format="pyarrow")


# ------------------------------------------------------------------ SemDeDup


def semdedup(ds, *, threshold_bp: int = 9000, n_clusters: int = 16,
             iters: int = 3, id_col: str = "vec_id",
             vec_col: str = "embedding", chunk: int = 1024):
    """SemDeDup (Abbas et al. 2023, public method): semantic dedup over
    an embedding column — distributed spherical k-means clusters the
    corpus, then WITHIN each cluster a vector is dropped when an
    earlier-id vector in the same cluster has cosine similarity >=
    ``threshold_bp / 10000`` (first-wins, the same archetype rule the
    digest dedup shards use).  Returns (vec_id, cluster, keep).

    Scale shape: centroids train via :func:`simsearch.kmeans_centroids`
    (O(k*d) reduce per batch, data never leaves the workers); assignment
    is a stateless streaming pass; the only all-to-all moves each vector
    once to its cluster's route (``groupby(cluster)`` over k bounded
    keys); the within-cluster prune is one vectorized numpy pass per
    cluster, row-chunked so memory stays O(chunk * cluster) while the
    exact O(cluster^2) dot products run as matmuls.  Pick ``n_clusters``
    ~ corpus / desired cluster size: the quadratic term is
    O(n^2 / k) total, the SemDeDup tradeoff.  Not SQL-expressible
    (iterative k-means) — pytest asserts equivalence to a sequential
    model plus partitioning invariance.
    """
    from .simsearch import _to_matrix, kmeans_centroids

    thr = threshold_bp / 10000.0
    cents = kmeans_centroids(ds, n_lists=n_clusters, iters=iters,
                             id_col=id_col, vec_col=vec_col)
    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        cc = ray.get(cref)
        bm = _to_matrix(batch, vec_col).astype(np.float64)
        bm = bm / np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-30)
        cid = np.argmax(bm @ cc.T, axis=1).astype(np.int64)
        dim = bm.shape[1]
        return pa.table({
            id_col: batch.column(id_col),
            "cluster": pa.array(cid),
            "_v": pa.FixedSizeListArray.from_arrays(
                pa.array(bm.reshape(-1)), dim),
        })

    def prune(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        dim = len(group.column("_v")[0])
        mat = np.asarray(group.column("_v").combine_chunks().flatten()
                         ).reshape(-1, dim)[order]
        n = len(ids)
        keep = np.ones(n, bool)
        # keep[j] = no i<j with sim >= thr: row-chunked upper-triangle max
        for lo in range(1, n, chunk):
            hi = min(lo + chunk, n)
            sims = mat[lo:hi] @ mat[:hi].T          # (hi-lo, hi)
            cols = np.arange(hi)
            rows = np.arange(lo, hi)
            sims[cols[None, :] >= rows[:, None]] = -2.0  # mask i >= j
            keep[lo:hi] = sims.max(axis=1) < thr
        cid = group.column("cluster")[0].as_py()
        return pa.table({
            id_col: pa.array(ids),
            "cluster": pa.array(np.full(n, cid, np.int64)),
            "keep": pa.array(keep),
        })

    return (ds.map_batches(assign, batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(prune, batch_format="pyarrow"))


SEMDEDUP_FP_SCALE = 1000  # fixed-point vector quantization: floor(1000*e)


def _quantize_fp(batch: pa.Table, vec_col: str) -> np.ndarray:
    from .simsearch import _to_matrix

    return np.floor(_to_matrix(batch, vec_col) * float(SEMDEDUP_FP_SCALE)
                    ).astype(np.int64)


def _assign_fp(q: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Integer squared-distance assignment; ties -> lowest cluster id
    (np.argmin first occurrence == SQL ORDER BY d2, c)."""
    d2 = ((q * q).sum(axis=1)[:, None]
          - 2 * (q @ cents.T)
          + (cents * cents).sum(axis=1)[None, :])
    return np.argmin(d2, axis=1).astype(np.int64)


def semdedup_fixed(ds, *, threshold_bp: int = 9000, n_clusters: int = 16,
                   iters: int = 2, id_col: str = "vec_id",
                   vec_col: str = "embedding", chunk: int = 1024):
    """SemDeDup with a VALUE-EXACT SQL oracle — the fixed-point sibling
    of :func:`semdedup` (whose float spherical k-means is honest
    rows-only at the driver).  Every step is either exact int64
    arithmetic or one correctly-rounded IEEE-double op, so DuckDB
    replays the whole chain bit-for-bit:

    - vectors quantize to ``floor(1000 * e)`` int64 (exact: one double
      multiply + floor, identical in numpy and DuckDB);
    - plain Lloyd k-means, init = the ``n_clusters`` lowest-id vectors,
      integer squared-distance assignment with ties to the lowest
      cluster id, centroid update ``floor(double(sum) / count)`` with
      empty clusters keeping their previous centroid (dot/ssq/sums stay
      exact below 2^53 for corpora to ~10^12 rows at this scale);
    - within-cluster first-wins prune on
      ``cos_bp = floor(10000.0 * dot / (sqrt(ssq_i) * sqrt(ssq_j)))``
      (integer dot/ssq exact; the float expression is the same op
      sequence in both engines), zero vectors define ``cos_bp = 0``.

    Scale shape identical to :func:`semdedup`: O(k*d) reduction per
    batch for k-means, ONE vector-moving groupby over k bounded keys,
    chunked O(n^2/k) prune.  Returns (vec_id, cluster, keep 0/1).
    """
    from .simsearch import _to_matrix, lowest_id_rows

    # init = the n_clusters lowest-id vectors, quantized RAW — NOT
    # load_queries, which L2-normalizes on top of the same row
    # selection: assignment, the sequential test model and the SQL
    # oracle all quantize raw vectors, and a normalized init diverges
    # on any non-unit-norm corpus.
    head = lowest_id_rows(ds, n_clusters, id_col, vec_col)
    cents = np.floor(_to_matrix(head, vec_col) * float(SEMDEDUP_FP_SCALE)
                     ).astype(np.int64)
    k, dim = cents.shape

    for _ in range(iters):
        ref = ray.put(cents)

        def part(batch: pa.Table) -> pa.Table:
            cc = ray.get(ref)
            q = _quantize_fp(batch, vec_col)
            a = _assign_fp(q, cc)
            sums = np.zeros((k, dim), np.int64)
            np.add.at(sums, a, q)
            cnt = np.bincount(a, minlength=k)
            return pa.table({
                "cid": pa.array(np.arange(k, dtype=np.int64)),
                "vsum": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.reshape(-1)), dim),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        partials = pa.concat_tables(
            [pa.table(b) for b in
             ds.map_batches(part, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")])
        cids = partials.column("cid").to_numpy()
        psums = np.asarray(partials.column("vsum").combine_chunks().flatten()
                           ).reshape(-1, dim)
        pcnt = partials.column("cnt").to_numpy()
        sums = np.zeros((k, dim), np.int64)
        np.add.at(sums, cids, psums)
        cnt = np.zeros(k, np.int64)
        np.add.at(cnt, cids, pcnt)
        upd = cnt > 0
        nxt = cents.copy()
        # floor of the correctly-rounded double quotient — the SQL
        # oracle computes floor(CAST(sum AS DOUBLE) / cnt) identically
        nxt[upd] = np.floor(sums[upd].astype(np.float64)
                            / cnt[upd, None]).astype(np.int64)
        cents = nxt

    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        cc = ray.get(cref)
        q = _quantize_fp(batch, vec_col)
        return pa.table({
            id_col: batch.column(id_col),
            "cluster": pa.array(_assign_fp(q, cc)),
            "_q": pa.FixedSizeListArray.from_arrays(
                pa.array(q.reshape(-1)), dim),
        })

    thr = float(threshold_bp)

    def prune(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        q = np.asarray(group.column("_q").combine_chunks().flatten()
                       ).reshape(-1, dim)[order]
        ssq = (q * q).sum(axis=1).astype(np.float64)
        rt = np.sqrt(ssq)
        n = len(ids)
        keep = np.ones(n, bool)
        for lo in range(1, n, chunk):
            hi = min(lo + chunk, n)
            dot = (q[lo:hi] @ q[:hi].T).astype(np.float64)
            denom = rt[lo:hi][:, None] * rt[:hi][None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos_bp = np.floor((10000.0 * dot) / denom)
            cos_bp = np.where(denom == 0.0, 0.0, cos_bp)
            cols = np.arange(hi)
            rows_ = np.arange(lo, hi)
            cos_bp[cols[None, :] >= rows_[:, None]] = -np.inf  # mask i >= j
            keep[lo:hi] = cos_bp.max(axis=1) < thr
        cid = group.column("cluster")[0].as_py()
        return pa.table({
            id_col: pa.array(ids.astype(np.int64)),
            "cluster": pa.array(np.full(n, cid, np.int64)),
            "keep": pa.array(keep.astype(np.int64)),
        })

    return (ds.map_batches(assign, batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(prune, batch_format="pyarrow"))
