"""Word-association and data-selection operators.

Collocation mining (PMI-style lift over adjacent word bigrams), top-k
word n-grams, and DSIR-style importance weights (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling", public
method): hashed-bigram counts under a *target* distribution vs the
*raw* corpus, scored per document as the sum of log-count-ratio
buckets.  These extend the text-analysis family (ops/text.py) with the
corpus-selection stages a 100 TB training-data pipeline runs between
crawling and training; the reference engine stops at spam term counts
(parser/SpamTextProcessor.java:36-106), so these are net-new surface.

Design notes for scale:
- tokenization / bigram formation is one vectorized polars/numpy pass
  per batch; the only exchanges are ``groupby`` sums whose width is
  bounded by the *distinct* bigram vocabulary (collocations) or the
  fixed 2^16 hash-bucket space (DSIR) — corpus rows never shuffle;
- the DSIR model is a dense 65,536-slot int64 array broadcast once via
  ``ray.put``; scoring is a stateless streaming pass;
- integer outputs throughout (floor-scaled lift, log2-bucket score
  sums) so the DuckDB oracles in ``__ray_entry__`` replay every value
  exactly (FNV-1a-64 string hashing via ``hashing.fnv1a64_sql``,
  log2 buckets via ``strlen(bin(c)) - 1``).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

from bubing_ray.hashing import hash64
from bubing_ray.ops.stats import _collect

DSIR_BUCKETS = 1 << 16  # hashed-bigram feature space (fixed width)


def _bigram_frame(batch: pa.Table, text_col: str = "text",
                  keep: tuple[str, ...] = ()) -> pl.DataFrame:
    """(doc_id, text, *keep) -> one row per adjacent lowercased-token
    bigram: (doc_row, w1, w2, *keep) with ``doc_row`` the position of
    the document inside the batch.  Fully vectorized: explode tokens,
    pair each token with its successor inside the same document."""
    df = pl.from_arrow(batch.select(["doc_id", text_col, *keep]))
    toks = (df.with_row_index("doc_row")
            .with_columns(pl.col(text_col).str.to_lowercase()
                          .str.extract_all(r"\S+").alias("t"))
            .drop(text_col)
            .explode("t")
            .drop_nulls("t"))
    if toks.height == 0:
        return pl.DataFrame({"doc_row": pl.Series([], dtype=pl.UInt32),
                             "w1": pl.Series([], dtype=pl.String),
                             "w2": pl.Series([], dtype=pl.String),
                             **{k: pl.Series([], dtype=df.schema[k])
                                for k in keep}})
    # adjacent pairs: shift within the exploded order, keep rows whose
    # successor belongs to the same document
    paired = toks.with_columns(
        pl.col("t").shift(-1).alias("w2"),
        pl.col("doc_row").shift(-1).alias("next_row"),
    ).filter(pl.col("doc_row") == pl.col("next_row"))
    return paired.rename({"t": "w1"}).select(["doc_row", "w1", "w2", *keep])


# --------------------------------------------------------------- collocations


def bigram_counts(ds, text_col: str = "text"):
    """Distributed adjacent-bigram frequency table (w1, w2, n_xy) —
    per-batch partial counts then one ``groupby`` sum; the exchange
    carries distinct bigrams, not corpus rows."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        bg = _bigram_frame(batch, text_col)
        return (bg.group_by(["w1", "w2"])
                .agg(pl.len().cast(pl.Int64).alias("n_xy")).to_arrow())

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["w1", "w2"]).aggregate(Sum("n_xy", alias_name="n_xy")))


def _local_topk(sort_cols: list[str], descending: list[bool], k: int):
    def f(batch: pa.Table) -> pa.Table:
        return (pl.from_arrow(batch)
                .sort(sort_cols, descending=descending).head(k).to_arrow())
    return f


def collocations(ds, k: int = 20, min_count: int = 3,
                 text_col: str = "text") -> pa.Table:
    """Top-k collocations by integer lift over adjacent word bigrams.

    ``lift_milli = floor(1000.0 * n_xy * N * N / (M * n_x * n_y))``
    (N = total tokens, M = total bigrams) — the PMI association ratio
    without the log, so ranking is identical and every value is an
    IEEE-double expression the SQL oracle replays bit-for-bit.

    Scale shape: ONE tokenize pass over the corpus emitting unigram and
    bigram partial counts together (round 5 — previously two full
    corpus reads), one bounded ``groupby`` sum over the combined
    distinct-key table (w2 = '' marks a unigram row; '' can never be a
    token since tokens match ``\\S+``), a ``min_count`` filter that
    shrinks the bigram table before any join, two size-guarded
    broadcast joins against the unigram vocabulary (auto-fallback to
    shuffle joins above ``BROADCAST_JOIN_LIMIT``), per-block top-k,
    then a k-per-block driver merge.  Nothing sorts the corpus.
    """
    from ray.data.aggregate import Sum

    from bubing_ray.ops.joins import broadcast_join

    def partial_both(batch: pa.Table) -> pa.Table:
        # one tokenization feeding both count tables — identical token
        # rule to text.word_counts (lowercase, \S+) and identical
        # pairing to _bigram_frame (successor within the same document)
        df = pl.from_arrow(batch.select([text_col]))
        toks = (df.with_row_index("doc_row")
                .with_columns(pl.col(text_col).str.to_lowercase()
                              .str.extract_all(r"\S+").alias("t"))
                .drop(text_col).explode("t").drop_nulls("t"))
        uni_p = (toks.group_by("t").agg(pl.len().cast(pl.Int64).alias("n"))
                 .select(pl.col("t").alias("w1"),
                         pl.lit("", dtype=pl.String).alias("w2"),
                         pl.col("n")))
        bi_p = (toks.with_columns(
                    pl.col("t").shift(-1).alias("w2"),
                    pl.col("doc_row").shift(-1).alias("next_row"))
                .filter(pl.col("doc_row") == pl.col("next_row"))
                .group_by(["t", "w2"]).agg(pl.len().cast(pl.Int64).alias("n"))
                .select(pl.col("t").alias("w1"), pl.col("w2"), pl.col("n")))
        return pl.concat([uni_p, bi_p]).to_arrow()

    counts = (ds.map_batches(partial_both, batch_format="pyarrow")
              .groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="n"))
              .materialize())  # bounded: vocabulary + distinct bigrams

    def _uni(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("w2"), pa.scalar("")))
        return pa.table({"word": t.column("w1"), "n": t.column("n")})

    def _bi(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.not_equal(batch.column("w2"), pa.scalar("")))
        return pa.table({"w1": t.column("w1"), "w2": t.column("w2"),
                         "n_xy": t.column("n")})

    uni = counts.map_batches(_uni, batch_format="pyarrow")
    bi = counts.map_batches(_bi, batch_format="pyarrow")
    n_tokens = int(uni.sum("n") or 0)
    n_bigrams = int(bi.sum("n_xy") or 0)
    if n_bigrams == 0:
        return pa.table({"w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string()),
                         "n_xy": pa.array([], pa.int64()),
                         "n_x": pa.array([], pa.int64()),
                         "n_y": pa.array([], pa.int64()),
                         "lift_milli": pa.array([], pa.int64())})

    def survivors(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.greater_equal(batch.column("n_xy"),
                                             pa.scalar(min_count)))

    surv = bi.map_batches(survivors, batch_format="pyarrow")
    j1 = broadcast_join(
        surv, uni.rename_columns({"word": "w1", "n": "n_x"}), on="w1")
    j2 = broadcast_join(
        j1, uni.rename_columns({"word": "w2", "n": "n_y"}), on="w2")

    def lift(batch: pa.Table) -> pa.Table:
        nxy = batch.column("n_xy").to_numpy(zero_copy_only=False).astype(np.float64)
        nx = batch.column("n_x").to_numpy(zero_copy_only=False).astype(np.float64)
        ny = batch.column("n_y").to_numpy(zero_copy_only=False).astype(np.float64)
        # left-assoc double chain, mirrored verbatim in the SQL oracle
        val = np.floor(1000.0 * nxy * float(n_tokens) * float(n_tokens)
                       / (float(n_bigrams) * nx * ny)).astype(np.int64)
        return batch.append_column("lift_milli", pa.array(val))

    ranked = j2.map_batches(lift, batch_format="pyarrow").map_batches(
        _local_topk(["lift_milli", "w1", "w2"], [True, False, False], k),
        batch_format="pyarrow")
    parts = _collect(ranked, promote_options="default")
    return (pl.from_arrow(parts)
            .sort(["lift_milli", "w1", "w2"], descending=[True, False, False])
            .head(k)
            .select(["w1", "w2", "n_xy", "n_x", "n_y", "lift_milli"])
            .to_arrow())


def ngram_topk(ds, n: int = 3, k: int = 20,
               text_col: str = "text") -> pa.Table:
    """Top-k word n-grams by corpus frequency (contamination /
    boilerplate analysis): per-batch partial counts, one ``groupby``
    sum over distinct n-grams, per-block top-k, driver merge of
    k-per-block.  Ties break on the gram string ascending."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["doc_id", text_col]))
        toks = (df.with_row_index("doc_row")
                .with_columns(pl.col(text_col).str.to_lowercase()
                              .str.extract_all(r"\S+").alias("t"))
                .explode("t").drop_nulls("t"))
        if toks.height == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        cols = [pl.col("t").alias("g0")]
        guards = []
        for i in range(1, n):
            cols.append(pl.col("t").shift(-i).alias(f"g{i}"))
            guards.append(pl.col("doc_row").shift(-i).alias(f"r{i}"))
        g = toks.with_columns(cols + guards)
        for i in range(1, n):
            g = g.filter(pl.col("doc_row") == pl.col(f"r{i}"))
        g = g.with_columns(pl.concat_str(
            [pl.col(f"g{i}") for i in range(n)], separator=" ").alias("gram"))
        return (g.group_by("gram")
                .agg(pl.len().cast(pl.Int64).alias("n")).to_arrow())

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("gram").aggregate(Sum("n", alias_name="n"))
              .map_batches(_local_topk(["n", "gram"], [True, False], k),
                           batch_format="pyarrow"))
    parts = _collect(counts, promote_options="default")
    return (pl.from_arrow(parts)
            .sort(["n", "gram"], descending=[True, False]).head(k)
            .select(["gram", "n"]).to_arrow())


# ------------------------------------------------------------------- DSIR


def _bigram_hashes(batch: pa.Table, text_col: str,
                   keep: tuple[str, ...] = ()) -> tuple[np.ndarray, pl.DataFrame]:
    """Per-batch hashed-bigram features: returns (h, frame) where ``h``
    is ``fnv1a64(w1 || ' ' || w2) % DSIR_BUCKETS`` (portable hash, so
    the SQL oracle replays it) aligned with ``frame``'s rows."""
    bg = _bigram_frame(batch, text_col, keep=keep)
    if bg.height == 0:
        return np.empty(0, np.int64), bg
    joined = bg.select(
        pl.concat_str([pl.col("w1"), pl.col("w2")], separator=" ")
        .alias("b")).to_series().to_arrow()
    h = (hash64(joined, portable=True)
         % np.uint64(DSIR_BUCKETS)).astype(np.int64)
    return h, bg


def dsir_model(ds, *, target_col: str = "lang", target_val: str = "en",
               text_col: str = "text") -> tuple[np.ndarray, np.ndarray]:
    """Train the DSIR importance model: log2-bucketed hashed-bigram
    counts under the target slice (rows where ``target_col ==
    target_val``) and under the raw corpus.

    Returns dense int64 arrays (bt, br) of length ``DSIR_BUCKETS`` with
    ``b* = floor(log2(count + 1))`` — the integer-exact stand-in for
    the log-probability ratio (same technique as
    :func:`bubing_ray.ops.text.lm_trigram_model`).  One streaming pass;
    the exchange is bounded by the 2^16 bucket space."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        h, bg = _bigram_hashes(batch, text_col, keep=(target_col,))
        if len(h) == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "ct": pa.array([], pa.int64()),
                             "cr": pa.array([], pa.int64())})
        # eq_missing: a null target_col is simply "not the target"
        # (False), never null — a plain == would yield a null that
        # round-trips to a numpy object array and nulls the ENTIRE
        # batch's group sums silently
        tgt = bg.get_column(target_col).eq_missing(target_val)
        df = pl.DataFrame({"h": h, "t": tgt})
        return (df.group_by("h")
                .agg(pl.col("t").sum().cast(pl.Int64).alias("ct"),
                     pl.len().cast(pl.Int64).alias("cr")).to_arrow())

    g = _collect(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("h").aggregate(Sum("ct", alias_name="ct"),
                                Sum("cr", alias_name="cr")),
        promote_options="default")
    bt = np.zeros(DSIR_BUCKETS, np.int64)
    br = np.zeros(DSIR_BUCKETS, np.int64)
    if g.num_rows:
        hh = g.column("h").to_numpy(zero_copy_only=False)
        ct = g.column("ct").to_numpy(zero_copy_only=False).astype(np.int64)
        cr = g.column("cr").to_numpy(zero_copy_only=False).astype(np.int64)
        # floor(log2(c + 1)) via frexp: exact for all int64 counts
        bt[hh] = np.frexp((ct + 1).astype(np.float64))[1] - 1
        br[hh] = np.frexp((cr + 1).astype(np.float64))[1] - 1
    return bt, br


def dsir_weights(ds, *, target_col: str = "lang", target_val: str = "en",
                 text_col: str = "text",
                 model: tuple[np.ndarray, np.ndarray] | None = None):
    """Score every document with the DSIR importance weight
    ``dsir_score = sum over hashed bigrams of (bt[h] - br[h])`` —
    positive = looks like the target slice, negative = off-target.
    Returns (doc_id, n_bi, dsir_score).

    The 2×65,536-slot model broadcasts once via ``ray.put``; scoring is
    a stateless streaming pass (hash + two gathers + bincount per
    batch).  Value-exact in SQL: FNV bigram hashes + ``strlen(bin(c+1))
    - 1`` buckets."""
    import ray as _ray

    if model is None:
        model = dsir_model(ds, target_col=target_col,
                           target_val=target_val, text_col=text_col)
    diff_ref = _ray.put((model[0] - model[1]).astype(np.int64))

    def score(batch: pa.Table) -> pa.Table:
        diff = _ray.get(diff_ref)
        h, bg = _bigram_hashes(batch, text_col)
        nrows = batch.num_rows
        n_bi = np.zeros(nrows, np.int64)
        tot = np.zeros(nrows, np.int64)
        if len(h):
            rows = bg.get_column("doc_row").to_numpy().astype(np.int64)
            n_bi = np.bincount(rows, minlength=nrows).astype(np.int64)
            # |diff| <= 63 and < 2^53 total: float64 bincount sum is exact
            tot = np.bincount(rows, weights=diff[h].astype(np.float64),
                              minlength=nrows).astype(np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_bi": pa.array(n_bi),
            "dsir_score": pa.array(tot),
        })

    return ds.map_batches(score, batch_format="pyarrow")
