"""Corpus-composition operators for training-data pipelines.

The reference engine stops at the WARC/Parquet store; these are the
LLM-training extensions the rebuild spec adds on top (sampling,
per-source caps, benchmark decontamination, PII redaction, sequence
packing).  Public-recipe provenance: stratified source mixing and
per-domain caps (Gopher / The Pile data recipes), token n-gram test-set
decontamination (GPT-3 appendix C's 13-gram filter — the synthetic
corpus is tiny, so the default here is 3-grams), and GPT-style stream
packing (concatenate documents in a fixed order, split into fixed-length
training chunks).

Every sampling decision is keyed on :func:`bubing_ray.hashing.splitmix64`
of the document id, which is exactly replicable in SQL
(``hashing.splitmix64_sql``) — so each operator has a value-exact DuckDB
oracle rather than a rows-only check.

Scale shape:
- sampling / redaction are stateless vectorized ``map_batches`` — they
  stream at any corpus size;
- the per-group cap uses the coarse-route shuffle (one vectorized
  polars window per route group, route count derived from input size);
- decontamination broadcasts the *test-set* shingles (benchmark suites
  are small and fixed) and streams the corpus against them;
- packing computes a distributed prefix sum: per-bucket token totals
  (one tiny aggregate), an exclusive scan over the bucket table on the
  driver (n_buckets rows — ~10^6 at 100 TB), then one routed window
  for intra-bucket offsets.  No stage materializes the corpus.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import derive_routes, route_of, splitmix64

SAMPLE_SEED = 0xB0B1_2025
#: tokens are maximal ``\S+`` runs — identical to DuckDB's
#: ``regexp_extract_all(text, '\S+')`` and polars' strip+split on ``\s+``.
TOKEN_RE = r"\S+"


# ------------------------------------------------------------- sampling

def sample_hash(doc_ids: np.ndarray, seed: int = SAMPLE_SEED) -> np.ndarray:
    """Per-doc sampling key: ``splitmix64(doc_id XOR seed)`` (uint64)."""
    return splitmix64(doc_ids.astype(np.uint64) ^ np.uint64(seed))


def stratified_sample(ds, rates_bp: dict[str, int], *,
                      strat_col: str = "lang", default_bp: int = 10_000,
                      seed: int = SAMPLE_SEED):
    """Deterministic stratified sampling: keep a document iff
    ``splitmix64(doc_id ^ seed) % 10000 < rates_bp[stratum]``.

    Stateless and hash-keyed, so the same document set is kept on every
    run, at any parallelism, independent of block boundaries — the
    property that makes the sample resumable and oracle-checkable.
    Returns (doc_id, stratum, bucket_bp) for the kept rows.
    """
    rates = dict(rates_bp)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        bucket = (sample_hash(ids, seed) % np.uint64(10_000)).astype(np.int64)
        strata = pl.from_arrow(batch.column(strat_col))
        if isinstance(strata, pl.DataFrame):  # pragma: no cover
            strata = strata.to_series()
        rate = strata.replace_strict(
            rates, default=default_bp, return_dtype=pl.Int64
        ).to_numpy()
        out = pa.table({
            "doc_id": batch.column("doc_id"),
            strat_col: batch.column(strat_col),
            "bucket_bp": pa.array(bucket),
        })
        return out.filter(pa.array(bucket < rate))

    return ds.map_batches(keep, batch_format="pyarrow")


def group_cap(ds, *, key: str = "source", cap: int = 8,
              seed: int = SAMPLE_SEED, n_routes: int | None = None,
              keep_cols: tuple[str, ...] = ()):
    """Per-group document cap: within each ``key`` group keep the
    ``cap`` documents ranked first by (splitmix64 sampling key, doc_id).

    The hash rank makes the survivors a uniform random-but-deterministic
    subset of each group (Gopher-style per-domain caps).  One coarse
    shuffle on ``key``; each route group ranks ALL its groups in one
    vectorized polars window.  Returns (doc_id, key, *keep_cols, rk)
    for survivors.
    """
    nr = derive_routes(ds, n_routes)
    extra = [c for c in keep_cols if c not in ("doc_id", key)]

    def route(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = sample_hash(ids, seed)
        cols = {"doc_id": batch.column("doc_id"), key: batch.column(key)}
        for c in extra:
            cols[c] = batch.column(c)
        cols["h"] = pa.array(h)
        t = pa.table(cols)
        return t.append_column("route", route_of(batch.column(key), nr))

    def rank(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group).sort([key, "h", "doc_id"])
        df = df.with_columns(
            pl.col("doc_id").cum_count().over(key).cast(pl.Int64).alias("rk")
        )
        return (df.filter(pl.col("rk") <= cap)
                  .select(["doc_id", key, *extra, "rk"]).to_arrow())

    return (ds.map_batches(route, batch_format="pyarrow")
              .groupby("route")
              .map_groups(rank, batch_format="pyarrow"))


# ------------------------------------------------------- decontamination

def _shingle_df(batch: pa.Table, n: int) -> pl.DataFrame:
    """Explode each doc into its lowercase token ``n``-gram strings
    (space-joined); docs with < n tokens produce no rows."""
    if batch.num_rows == 0:
        return pl.DataFrame(schema={"doc_id": pl.Int64, "s": pl.String})
    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    # \s+ tokenization: normalize all whitespace runs to single spaces
    # first so split(" ") matches regexp_split_to_array(text, '\s+').
    norm = (pl.col("text").str.to_lowercase()
            .str.replace_all(r"\s+", " ").str.strip_chars())
    df = df.with_columns(norm.str.split(" ").alias("t"))
    df = df.with_columns(pl.col("t").list.len().cast(pl.Int64).alias("n_tok"))
    sh = (df.filter(pl.col("n_tok") >= n)
            .with_columns(
                pl.int_ranges(0, pl.col("n_tok") - (n - 1)).alias("i"))
            .explode("i")
            .with_columns(
                pl.col("t").list.slice(pl.col("i"), n)
                .list.join(" ").alias("s")))
    return sh.select(["doc_id", "s"])


def test_shingles(ds, *, n: int = 3, test_mod: int = 97) -> list[str]:
    """Collect the distinct shingles of the held-out test slice
    (``doc_id % test_mod == 0``).  The test side of decontamination is
    a fixed benchmark suite — small by construction — so collecting it
    to the driver and broadcasting is the scale-correct shape."""
    def test_slice(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % test_mod == 0))
        return _shingle_df(sub, n).unique().to_arrow()

    tests = ds.map_batches(test_slice, batch_format="pyarrow")
    out: set[str] = set()
    for b in tests.iter_batches(batch_format="pyarrow"):
        out.update(pa.table(b).column("s").to_pylist())
    return sorted(out)


def decontaminate(ds, *, n: int = 3, test_mod: int = 97):
    """Benchmark decontamination: flag every document sharing any
    lowercase token ``n``-gram with the test slice.

    Returns (doc_id, is_test, n_shingles, n_hits, contaminated) for all
    docs.  ``n_hits`` counts shingle *positions* (with multiplicity)
    that appear in the test set.  The corpus streams; only the test-set
    shingles are held in memory (broadcast once per actor via
    ``ray.put`` — at real scale a hashed form would be broadcast, here
    the exact strings keep the oracle value-exact).
    """
    import ray

    ts_ref = ray.put(pl.Series("s", test_shingles(ds, n=n, test_mod=test_mod)))

    def flag(batch: pa.Table) -> pa.Table:
        tests = ray.get(ts_ref)  # local plasma read, cached per node
        sh = _shingle_df(batch, n)
        hits = (sh.with_columns(
                    pl.col("s").is_in(tests).cast(pl.Int64).alias("hit"))
                  .group_by("doc_id")
                  .agg(pl.len().cast(pl.Int64).alias("n_shingles"),
                       pl.col("hit").sum().alias("n_hits")))
        ids = pl.from_arrow(batch.select(["doc_id"]))
        out = (ids.join(hits, on="doc_id", how="left")
                  .with_columns(
                      pl.col("n_shingles").fill_null(0),
                      pl.col("n_hits").fill_null(0))
                  .with_columns(
                      ((pl.col("doc_id") % test_mod) == 0)
                      .cast(pl.Int64).alias("is_test"),
                      (pl.col("n_hits") > 0).cast(pl.Int64)
                      .alias("contaminated")))
        return out.select(["doc_id", "is_test", "n_shingles",
                           "n_hits", "contaminated"]).to_arrow()

    return ds.map_batches(flag, batch_format="pyarrow")


# --------------------------------------------------- composed corpus recipe

def compose_corpus(ds, *, tests: list[str], rates_bp: dict[str, int],
                   default_bp: int = 10_000, cap: int = 8, n: int = 3,
                   test_mod: int = 97, seed: int = SAMPLE_SEED,
                   n_routes: int | None = None):
    """The full composition recipe in one streaming pass: Gopher quality
    gate ∧ drop test docs ∧ drop benchmark-contaminated docs ∧
    stratified language sampling, then a per-source cap.

    All filters are batch-local (the test-shingle list broadcasts once);
    the only shuffle is the final cap's coarse route.  Returns
    (doc_id, source, lang, rk).
    """
    import ray

    from .text import gopher_quality_batch

    ts_ref = ray.put(pl.Series("s", tests))
    rates = dict(rates_bp)

    def filt(batch: pa.Table) -> pa.Table:
        flags = gopher_quality_batch(batch)
        keep = flags.column("keep").to_numpy(zero_copy_only=False).copy()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep &= (ids % test_mod) != 0  # held-out docs never train
        sub = batch.filter(pa.array(keep))
        if sub.num_rows:
            sh = _shingle_df(sub, n)
            dirty = (sh.filter(pl.col("s").is_in(ray.get(ts_ref)))
                     .get_column("doc_id").unique())
            sids = sub.column("doc_id").to_numpy(zero_copy_only=False)
            clean = ~np.isin(sids, dirty.to_numpy())
            bucket = (sample_hash(sids.astype(np.uint64), seed)
                      % np.uint64(10_000)).astype(np.int64)
            strata = pl.from_arrow(sub.column("lang"))
            if isinstance(strata, pl.DataFrame):  # pragma: no cover
                strata = strata.to_series()
            rate = strata.replace_strict(
                rates, default=default_bp, return_dtype=pl.Int64).to_numpy()
            sub = sub.filter(pa.array(clean & (bucket < rate)))
        return sub.select(["doc_id", "lang", "source"])

    surv = ds.map_batches(filt, batch_format="pyarrow")
    return group_cap(surv, key="source", cap=cap, seed=seed,
                     keep_cols=("lang",), n_routes=n_routes)


# ------------------------------------------------------- repetition filters

def repetition_stats(ds, *, top_n: int = 2, dup_n: int = 3):
    """Gopher-style within-document repetition signals.

    Per document: the position-fraction (basis points) of token
    ``top_n``-grams taken by the single most frequent one
    (``top{top_n}_frac_bp``; ties broken by lexicographically smallest
    gram) and the fraction of ``dup_n``-gram positions whose gram occurs
    more than once (``dup{dup_n}_frac_bp``).  High values mark
    boilerplate / template spam (Gopher repetition-removal rules,
    adapted to the corpus's single-line documents).

    Entirely batch-local — a document's n-grams never leave its batch —
    so the operator is a stateless streaming ``map_batches`` with no
    shuffle at any scale.
    """

    def stats(batch: pa.Table) -> pa.Table:
        ids = pl.from_arrow(batch.select(["doc_id"]))
        out = ids
        for n, kind in ((top_n, "top"), (dup_n, "dup")):
            sh = _shingle_df(batch, n)
            col = f"{kind}{n}_frac_bp"
            if sh.height == 0:
                out = out.with_columns(pl.lit(0, dtype=pl.Int64).alias(col))
                continue
            cnt = sh.group_by(["doc_id", "s"]).agg(pl.len().alias("c"))
            if kind == "top":
                # only the max COUNT matters, so gram-identity ties
                # need no break rule
                per = (cnt.group_by("doc_id")
                       .agg(pl.col("c").max().alias("hit"),
                            pl.col("c").sum().alias("tot")))
            else:
                per = (cnt.group_by("doc_id")
                       .agg(pl.col("c").filter(pl.col("c") > 1).sum()
                            .fill_null(0).alias("hit"),
                            pl.col("c").sum().alias("tot")))
            per = per.with_columns(
                (pl.lit(10_000) * pl.col("hit") // pl.col("tot"))
                .cast(pl.Int64).alias(col))
            out = (out.join(per.select(["doc_id", col]), on="doc_id",
                            how="left")
                   .with_columns(pl.col(col).fill_null(0)))
        return out.to_arrow()

    return ds.map_batches(stats, batch_format="pyarrow")


# ------------------------------------------------------------ PII redaction

#: RE2 patterns — evaluated by Arrow's RE2 on the engine side and
#: DuckDB's RE2 in the oracle, so semantics match bit-for-bit.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{6,}[0-9]", "<PHONE>"),
)


def pii_redact_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Redact emails, IPv4 addresses and phone-like digit runs.

    Patterns apply sequentially (each on the previous pass's output) and
    per-pattern match counts are taken on that same intermediate text —
    mirroring a nested ``regexp_replace`` oracle exactly.  Fully
    vectorized: Arrow RE2 kernels, no Python per row.
    """
    t = batch.column(text_col)
    cols: dict[str, pa.Array | pa.ChunkedArray] = {
        "doc_id": batch.column("doc_id")}
    for name, pat, rep in PII_PATTERNS:
        cols[f"n_{name}"] = pc.cast(pc.count_substring_regex(t, pat),
                                    pa.int64())
        t = pc.replace_substring_regex(t, pat, rep)
    cols["text_redacted"] = t
    return pa.table(cols)


def pii_redact(ds, *, text_col: str = "text"):
    return ds.map_batches(
        lambda b: pii_redact_batch(b, text_col=text_col),
        batch_format="pyarrow")


def inject_pii_batch(batch: pa.Table) -> pa.Table:
    """Deterministically append synthetic PII to a slice of documents —
    the sandbox corpus contains none, so the redaction path would
    otherwise never fire.  Closed-form in doc_id (mirrored verbatim by
    the SQL oracle): every 3rd doc gains an email, every 5th an IPv4,
    every 7th a phone number."""
    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    d = pl.col("doc_id")
    blank = pl.lit("")
    aug = (
        pl.col("text")
        + pl.when(d % 3 == 0).then(
            pl.format(" contact user{}@mail{}.example.com", d, d % 10)
        ).otherwise(blank)
        + pl.when(d % 5 == 0).then(
            pl.format(" from 10.{}.{}.{}",
                      (d // 7) % 256, d % 256, (d // 3) % 100)
        ).otherwise(blank)
        + pl.when(d % 7 == 0).then(
            pl.format(" tel +1 555-{}", 1000 + d % 9000)
        ).otherwise(blank)
    )
    return df.with_columns(aug.alias("text")).to_arrow()


# ---------------------------------------------------------- stream packing

def token_counts(ds, *, text_col: str = "text"):
    """(doc_id, n_tok): number of ``\\S+`` token runs per document."""
    def count(batch: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(
            batch.column(text_col), TOKEN_RE), pa.int64())
        return pa.table({"doc_id": batch.column("doc_id"), "n_tok": n})

    return ds.map_batches(count, batch_format="pyarrow")


def token_pack(ds, *, seq_len: int = 512, bucket: int = 4096,
               text_col: str = "text", n_routes: int | None = None):
    """GPT-style stream packing: concatenate all documents in doc_id
    order and split the token stream into fixed ``seq_len`` chunks;
    report each document's global token offset and chunk span.

    Distributed prefix sum, no global sort: token counts pre-aggregate
    into ``doc_id // bucket`` buckets (tiny table — one row per bucket),
    the driver runs an exclusive scan over the sorted bucket totals, and
    one coarse-routed polars window computes intra-bucket offsets (a
    route holds whole buckets, so the window is globally correct).  Only
    the bucket table (~corpus_rows / bucket entries) ever leaves the
    stream.  Returns (doc_id, n_tok, tok_offset, chunk_start, chunk_end,
    n_chunks).
    """
    counts = token_counts(ds, text_col=text_col)

    def to_bucket(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        part = (df.with_columns((pl.col("doc_id") // bucket).alias("b"))
                  .group_by("b").agg(pl.col("n_tok").sum().alias("s")))
        return part.to_arrow()

    # per-batch partial -> one small groupby; the result is one row per
    # bucket (corpus_rows / bucket entries) and is by construction the
    # only thing collected to the driver.
    bparts = counts.map_batches(to_bucket, batch_format="pyarrow") \
                   .groupby("b").sum("s")
    bdf = pl.from_arrow(pa.concat_tables(
        [pa.table(b) for b in bparts.iter_batches(batch_format="pyarrow")]
    )).sort("b")
    bids = bdf["b"].to_numpy().astype(np.int64)
    sums = bdf["sum(s)"].to_numpy().astype(np.int64)
    bases = np.concatenate(([0], np.cumsum(sums)[:-1]))
    # closure-captured (bids, bases) ship to workers once with the
    # function (Ray inlines the serialized fn via the object store); at
    # 100 TB this is ~10^6 buckets = 16 MB — broadcast-sized.

    nr = derive_routes(counts, n_routes)

    def route(batch: pa.Table) -> pa.Table:
        # FLOOR division, matching to_bucket's polars `//` — pc.divide
        # truncates toward zero, so a negative doc_id would be keyed
        # into one bucket by to_bucket and a DIFFERENT one here,
        # silently corrupting its offset
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        b = np.floor_divide(ids.astype(np.int64), bucket)
        t = batch.append_column("b", pa.array(b, pa.int64()))
        return t.append_column("route", route_of(t.column("b"), nr))

    def offsets(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group).sort("doc_id")
        df = df.with_columns(
            (pl.col("n_tok").cum_sum().over("b") - pl.col("n_tok"))
            .alias("intra"))
        b = df["b"].to_numpy()
        base = bases[np.searchsorted(bids, b)]
        off = base + df["intra"].to_numpy()
        n = df["n_tok"].to_numpy()
        start = off // seq_len
        end = np.where(n > 0, (off + np.maximum(n, 1) - 1) // seq_len, start)
        nchunks = np.where(n > 0, end - start + 1, 0)
        return pa.table({
            "doc_id": df["doc_id"].to_numpy(),
            "n_tok": n,
            "tok_offset": off,
            "chunk_start": start.astype(np.int64),
            "chunk_end": end.astype(np.int64),
            "n_chunks": nchunks.astype(np.int64),
        })

    return (counts.map_batches(route, batch_format="pyarrow")
            .groupby("route")
            .map_groups(offsets, batch_format="pyarrow"))


def lang_token_cap(ds, *, key: str = "lang", budget: int = 600,
                   seed: int = SAMPLE_SEED, text_col: str = "text",
                   n_routes: int | None = None):
    """Per-group TOKEN budget (the token-weighted sibling of
    :func:`group_cap`): rank each ``key`` group's documents by
    (splitmix64 sampling hash, doc_id) and keep the greedy prefix whose
    running token total BEFORE each document is still under ``budget``
    — so the document that crosses the boundary is the last one kept
    and every group fills its budget as exactly as whole documents
    allow (per-language token budgeting, the data-mixture knob in
    Gopher/Llama-style recipes).

    Tokens are ``\\S+`` runs (the corpus-wide convention).  One coarse
    shuffle on ``key``; each route group computes its cumulative sums in
    one vectorized polars window.  Returns (doc_id, ``key``, n_tok,
    tok_before) for survivors.
    """
    nr = derive_routes(ds, n_routes)

    def route(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = pc.cast(pc.count_substring_regex(
            batch.column(text_col), TOKEN_RE), pa.int64())
        t = pa.table({
            "doc_id": batch.column("doc_id"),
            key: batch.column(key),
            "n_tok": n,
            "h": pa.array(sample_hash(ids, seed)),
        })
        return t.append_column("route", route_of(t.column(key), nr))

    def fill(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group).sort([key, "h", "doc_id"])
        df = df.with_columns(
            (pl.col("n_tok").cum_sum().over(key) - pl.col("n_tok"))
            .alias("tok_before"))
        return (df.filter(pl.col("tok_before") < budget)
                  .select(["doc_id", key, "n_tok", "tok_before"])
                  .to_arrow())

    return (ds.map_batches(route, batch_format="pyarrow")
              .groupby("route")
              .map_groups(fill, batch_format="pyarrow"))


def sample_n(ds, *, n: int = 100, seed: int = SAMPLE_SEED,
             id_col: str = "doc_id", keep_cols: tuple[str, ...] = ()):
    """Fixed-size uniform deterministic sample: the ``n`` documents with
    the smallest (splitmix64 sampling hash, id) — a hash-rank reservoir,
    so the same ``n`` rows come back regardless of partitioning or
    scale (the fixed-size sibling of :func:`stratified_sample`'s rate
    sampling).

    Distributed shape: every block prunes to its local ``n`` smallest,
    then one bounded ``repartition(1)`` merge over ≤ n·blocks rows —
    the corpus itself never moves.  Returns (``id_col``, *keep_cols, h).
    """
    extra = [c for c in keep_cols if c != id_col]

    def prune(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        cols = {id_col: batch.column(id_col)}
        for c in extra:
            cols[c] = batch.column(c)
        cols["h"] = pa.array(sample_hash(ids, seed))
        df = pl.from_arrow(pa.table(cols)).sort(["h", id_col]).head(n)
        return df.to_arrow()

    def final(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).sort(["h", id_col]).head(n)
        return df.to_arrow()

    return (ds.map_batches(prune, batch_format="pyarrow")
              .repartition(1)
              .map_batches(final, batch_format="pyarrow", batch_size=None))


def chunk_docs(ds, *, chunk: int = 200, overlap: int = 50,
               id_col: str = "doc_id", text_col: str = "text"):
    """Context-window chunking: split each document into fixed-width
    character windows of ``chunk`` codepoints advancing by ``chunk -
    overlap`` (the standard overlapping-window prep for embedding /
    retrieval corpora).  Returns (``id_col``, chunk_id, chunk_text);
    every document yields at least one chunk (an empty text yields one
    empty chunk), and the last window is the remainder (shorter than
    ``chunk``, never padded).

    Stateless vectorized explode — no shuffle, streams at any corpus
    size; output row count is ~len/stride per doc, so block sizes grow
    by the same factor and the engine's dynamic block splitting keeps
    batches bounded.  Offsets count codepoints (polars ``str.slice``),
    matching DuckDB's ``substr`` exactly for the value-exact oracle.
    """
    if not (0 <= overlap < chunk):
        raise ValueError("need 0 <= overlap < chunk")
    stride = chunk - overlap

    def explode(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([id_col, text_col]))
        n = pl.col(text_col).str.len_chars().cast(pl.Int64)
        n_chunks = (
            pl.when(n <= chunk)
            .then(1)
            .otherwise(1 + (n - chunk + stride - 1) // stride)
        )
        out = (
            df.with_columns(n_chunks.alias("_nc"))
            .with_columns(
                pl.int_ranges(0, pl.col("_nc")).alias("chunk_id"))
            .explode("chunk_id")
            .with_columns(
                pl.col(text_col)
                .str.slice(pl.col("chunk_id") * stride, chunk)
                .alias("chunk_text"))
            .select([id_col, "chunk_id", "chunk_text"])
        )
        return out.to_arrow()

    return ds.map_batches(explode, batch_format="pyarrow")


# ------------------------------------------------- paragraph-level dedup

def paragraph_dedup(ds, *, id_col: str = "doc_id", text_col: str = "text",
                    n_routes: int | None = None):
    """Paragraph-level exact dedup (the C4 "three-sentence span" /
    RefinedWeb paragraph filter family): every paragraph (``\\n\\n``
    split) is kept only at its FIRST corpus occurrence — ordered by
    (doc_id, paragraph index) — and documents are reassembled from
    their surviving paragraphs (documents losing every paragraph drop).

    Two coarse-route shuffles, both with one vectorized polars window
    per route group:

    1. explode docs to (doc_id, pidx, par) rows, route by hash(par) so
       all copies of a paragraph co-locate, keep-first by the two-level
       window ``doc_id == min(doc_id) over par`` then
       ``pidx == min(pidx at that doc)`` (comparing the actual
       paragraph text, so hash collisions cannot merge groups);
    2. route survivors by doc_id and reassemble each document's text in
       paragraph order.

    Paragraph rows move exactly twice; nothing materializes beyond one
    route group per task, so the shape holds at any corpus size.
    """
    nr = derive_routes(ds, n_routes, target_rows_per_route=100_000)

    def explode(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([id_col, text_col]))
        df = (df.with_columns(
                  pl.col(text_col).str.split("\n\n").alias("_l"))
              .with_columns(
                  pl.int_ranges(1, pl.col("_l").list.len() + 1)
                  .alias("_ix"))
              .explode(["_l", "_ix"])
              .rename({"_l": "par", "_ix": "pidx"})
              .filter(pl.col("par").str.strip_chars(" ") != "")
              .select([id_col, "pidx", "par"]))
        out = df.to_arrow()
        return out.append_column(
            "route", route_of(out.column("par"), nr))

    def keep_first(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        df = df.with_columns(
            pl.col(id_col).min().over("par").alias("_md"))
        df = df.with_columns(
            pl.when(pl.col(id_col) == pl.col("_md"))
            .then(pl.col("pidx")).otherwise(None)
            .min().over("par").alias("_mp"))
        kept = df.filter((pl.col(id_col) == pl.col("_md"))
                         & (pl.col("pidx") == pl.col("_mp")))
        out = kept.select([id_col, "pidx", "par"]).to_arrow()
        return out.append_column("route", route_of(out.column(id_col), nr))

    def reassemble(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group).sort([id_col, "pidx"])
        out = (df.group_by(id_col, maintain_order=True)
               .agg(pl.col("par"))
               .with_columns(pl.col("par").list.join("\n\n")
                             .alias(text_col))
               .select([id_col, text_col]))
        return out.to_arrow()

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby("route")
            .map_groups(keep_first, batch_format="pyarrow")
            .groupby("route")
            .map_groups(reassemble, batch_format="pyarrow"))


# --------------------------------------------- source-level quality gating

def source_quality_gate(ds, *, min_keep_bp: int = 5000):
    """Domain-level quality gating (the RefinedWeb / CCNet source-filter
    family): aggregate each source's Gopher-gate pass rate, then keep
    only the individually-passing documents of sources whose rate
    clears ``min_keep_bp`` basis points.

    Scale shape: the per-source aggregate is a partial-combine
    ``groupby(source)`` whose width is the number of distinct sources,
    never the corpus size; the rate table (bounded, reduced) is
    materialized and joined back through the guarded
    :func:`~bubing_ray.ops.joins.broadcast_join`, which auto-switches
    to a shuffle join above its small-side limit.  Documents stream;
    the gate is a stateless vectorized kernel.

    Returns (doc_id, source, keep_rate_bp) for surviving documents.
    """
    from ray.data.aggregate import Sum

    from .joins import broadcast_join
    from .text import gopher_quality_batch

    def flag(batch: pa.Table) -> pa.Table:
        q = gopher_quality_batch(batch.select(["doc_id", "text"]))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "source": batch.column("source"),
            "keep": q.column("keep"),
        })

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return (df.group_by("source")
                .agg(pl.len().cast(pl.Int64).alias("n_docs"),
                     pl.col("keep").cast(pl.Int64).sum().alias("n_keep"))
                .to_arrow())

    flagged = ds.map_batches(flag, batch_format="pyarrow")

    def rate(batch: pa.Table) -> pa.Table:
        nd = batch.column("sum(n_docs)").to_numpy(zero_copy_only=False)
        nk = batch.column("sum(n_keep)").to_numpy(zero_copy_only=False)
        bp = ((10_000 * nk.astype(np.int64)) // nd.astype(np.int64))
        t = pa.table({"source": batch.column("source"),
                      "keep_rate_bp": pa.array(bp)})
        return t.filter(pc.greater_equal(t.column("keep_rate_bp"),
                                         min_keep_bp))

    # bounded by distinct sources — safe to materialize the reduced
    # table so the guarded join's count() doesn't re-run the aggregate
    rates = (flagged.map_batches(partial, batch_format="pyarrow")
             .groupby("source").aggregate(Sum("n_docs"), Sum("n_keep"))
             .map_batches(rate, batch_format="pyarrow")
             .materialize())

    def finish(batch: pa.Table) -> pa.Table:
        return (batch.filter(batch.column("keep"))
                .select(["doc_id", "source", "keep_rate_bp"]))

    return broadcast_join(flagged, rates, on="source").map_batches(
        finish, batch_format="pyarrow")


# broadcast guard for the fuzzy-decontamination test side: k-perm
# signatures are ~1 KB/doc, so 200k test docs ~= 200 MB on the driver —
# past that the plan flips to the shuffled band-join path
DECON_BROADCAST_LIMIT = 200_000

# the sentinel helpers moved to ops/dedup.py when the whole minhash
# family (not just decontamination) started excluding sentinel sigs
from .dedup import _SENTINEL_SIG, _drop_sentinel_sigs  # noqa: E402


def _decon_fuzzy_shuffled(ds, *, ngram: int, test_mod: int, bands: int,
                          min_bp: int, portable: bool | None):
    """Shuffled band-join fuzzy decontamination — the scale path when
    the test side exceeds :data:`DECON_BROADCAST_LIMIT` (round-4 ADVICE:
    a test side selected as ``doc_id %% test_mod == 0`` is
    corpus-proportional, so 'small by construction' cannot be assumed).

    Same output contract as the broadcast path: banding buckets shuffle
    by (band, bucket) with directed corpus-x-test pairs per route group,
    pairs dedup across bands with a count-only exchange, signatures
    attach via two reduce-side hash-joins (``_attach_sig`` — no driver
    materialization), and the per-doc max joins back with one co-routed
    left join.  Every exchange is bounded per route at any corpus size.
    """
    import ray.data  # noqa: F401 (Dataset ops below)
    from ray.data.aggregate import Count, Max

    from ..hashing import routes_for
    from .dedup import (MINHASH_PERMS, _attach_sig, _band_rows,
                        _band_width, _route_coarse, minhash_batch)
    from .joins import shuffle_join

    rows = _band_width(bands)
    sigs = ds.map_batches(
        lambda b: minhash_batch(b, ngram, portable), batch_format="pyarrow"
    ).materialize()  # reused: banding + both attach sides
    n_docs = sigs.count()
    nr = routes_for(n_docs * bands)

    def band_tag(b: pa.Table) -> pa.Table:
        br = _band_rows(b, bands, rows)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        first = np.asarray(
            b.column("sig").combine_chunks().flatten()
        ).reshape(-1, MINHASH_PERMS)[:, 0] if b.num_rows else np.empty(0, np.uint64)
        # _band_rows emits `bands` consecutive blocks of this batch's
        # docs, so the per-doc flag tiles across them
        is_t = np.tile((ids % test_mod == 0) & (first != _SENTINEL_SIG), bands)
        return _route_coarse(br.append_column("is_test", pa.array(is_t)),
                             ["band", "bucket"], nr)

    def directed_pairs(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g).unique(subset=["band", "bucket", "doc_id"])
        right = df.filter(pl.col("is_test"))
        j = df.join(right.select(["band", "bucket", "doc_id"]),
                    on=["band", "bucket"], suffix="_t")
        j = (j.filter(pl.col("doc_id") != pl.col("doc_id_t"))
             .unique(subset=["doc_id", "doc_id_t"]))
        return pa.table({"a": j["doc_id"].to_arrow(),
                         "b": j["doc_id_t"].to_arrow()})

    cand = (sigs.map_batches(band_tag, batch_format="pyarrow")
            .groupby("route")
            .map_groups(directed_pairs, batch_format="pyarrow"))
    # pairs surface in multiple bands: dedup with a count-only exchange
    cand = (cand.groupby(["a", "b"]).aggregate(Count())
            .select_columns(["a", "b"]))
    sig_nr = routes_for(n_docs)
    with_a = _attach_sig(cand, sigs, "a", "sig_a", carry=[], n_routes=sig_nr)
    with_ab = _attach_sig(with_a, sigs, "b", "sig_b", carry=["sig_a"],
                          n_routes=sig_nr)

    def est(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "est": pa.array([], pa.int64())})
        sa = np.asarray(batch.column("sig_a").combine_chunks().flatten()
                        ).reshape(-1, MINHASH_PERMS)
        sb = np.asarray(batch.column("sig_b").combine_chunks().flatten()
                        ).reshape(-1, MINHASH_PERMS)
        e = ((sa == sb).sum(axis=1) * 10_000 // MINHASH_PERMS).astype(np.int64)
        return pa.table({"doc_id": batch.column("a").cast(pa.int64()),
                         "est": pa.array(e)})

    dmx = (with_ab.map_batches(est, batch_format="pyarrow")
           .groupby("doc_id").aggregate(Max("est")))

    def finish(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        # unmatched left rows carry null -> float NaN -> 0
        mx = np.nan_to_num(
            batch.column("max(est)").to_numpy(zero_copy_only=False)
            .astype(np.float64)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64)),
            "is_test": pa.array((ids % test_mod == 0).astype(np.int64)),
            "max_sim_bp": pa.array(mx),
            "contaminated": pa.array((mx >= min_bp).astype(np.int64)),
        })

    all_ids = ds.map_batches(lambda b: b.select(["doc_id"]),
                             batch_format="pyarrow")
    return shuffle_join(all_ids, dmx, on="doc_id", how="left").map_batches(
        finish, batch_format="pyarrow")


def decontaminate_fuzzy(ds, *, ngram: int = 3, test_mod: int = 97,
                        bands: int = 16, min_bp: int = 5000,
                        broadcast_limit: int = DECON_BROADCAST_LIMIT,
                        portable: bool | None = None):
    """Fuzzy benchmark decontamination: flag every corpus document whose
    MinHash-estimated Jaccard similarity to ANY held-out test document
    (``doc_id % test_mod == 0``) reaches ``min_bp``/10000 — the
    near-duplicate analogue of :func:`decontaminate` (GPT-3-style exact
    n-gram overlap), catching lightly edited test copies.

    Returns (doc_id, is_test, max_sim_bp, contaminated) for ALL docs.
    A test doc never matches itself, but does match *other* test docs
    (duplicated benchmark items are themselves contamination).

    Scale shape: a test side that is a fixed benchmark suite — small by
    construction — collects its k-perm signatures AND per-band bucket
    tables once and broadcasts them via ``ray.put`` (the same shape as
    the exact variant's shingle broadcast); the corpus then streams
    through one stateless pass per batch: signature, per-band
    ``searchsorted`` probe into the broadcast buckets, full-signature
    verify of only the colliding candidates.  No corpus-side shuffle at
    all.  The collect is size-guarded (round-4 ADVICE): past
    ``broadcast_limit`` test docs the plan flips to
    :func:`_decon_fuzzy_shuffled` — a banded shuffle join with no
    driver-side materialization at all.  Empty-shingle (sentinel)
    signatures never enter the test model: trivially short docs are not
    benchmark content and would otherwise all 'match' each other at
    10000 bp.  With ``portable=True`` the whole chain (FNV shingle
    hash, k-perm sigs, band-bucket mix, candidate collisions, sig
    verify) replays value-exactly in the DuckDB oracle.
    """
    import ray

    from .dedup import (MINHASH_PERMS, _band_rows, _band_width,
                        minhash_batch)

    rows = _band_width(bands)

    def test_sigs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % test_mod == 0))
        return _drop_sentinel_sigs(
            minhash_batch(sub, ngram, portable), MINHASH_PERMS)

    tbatches = []
    n_test = 0
    for b in (ds.map_batches(test_sigs, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        t = pa.table(b)
        n_test += t.num_rows
        if n_test > broadcast_limit:
            # test side is corpus-proportional: broadcast would not be
            # 'small by construction' — switch to the shuffled plan
            return _decon_fuzzy_shuffled(
                ds, ngram=ngram, test_mod=test_mod, bands=bands,
                min_bp=min_bp, portable=portable)
        tbatches.append(t)
    tsig = pa.concat_tables(tbatches) if tbatches else pa.table({
        "doc_id": pa.array([], pa.int64()),
        "sig": pa.array([], pa.list_(pa.uint64(), MINHASH_PERMS)),
    })
    t_ids = tsig.column("doc_id").to_numpy(zero_copy_only=False)
    t_sig = np.asarray(tsig.column("sig").combine_chunks().flatten()
                       ).reshape(-1, MINHASH_PERMS)
    # per-band sorted bucket arrays (+ the sort permutation back to the
    # test-doc index) for O(log n_test) collision probes per band
    tband = _band_rows(tsig, bands, rows) if len(t_ids) else None
    band_sorted, band_perm = [], []
    for b in range(bands):
        if tband is None:
            band_sorted.append(np.empty(0, np.uint64))
            band_perm.append(np.empty(0, np.int64))
            continue
        sel = tband.filter(
            pa.compute.equal(tband.column("band"), pa.scalar(b, pa.int32())))
        bk = sel.column("bucket").to_numpy(zero_copy_only=False)
        perm = np.argsort(bk, kind="stable")
        band_sorted.append(bk[perm])
        band_perm.append(perm.astype(np.int64))
    model_ref = ray.put((t_ids, t_sig, band_sorted, band_perm))

    def flag(batch: pa.Table) -> pa.Table:
        tids, tsigm, bsort, bperm = ray.get(model_ref)
        dsig_t = minhash_batch(batch, ngram, portable)
        d_ids = dsig_t.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(d_ids)
        max_bp = np.zeros(n, np.int64)
        if n and len(tids):
            d_sig = np.asarray(dsig_t.column("sig").combine_chunks()
                               .flatten()).reshape(-1, MINHASH_PERMS)
            dband = _band_rows(dsig_t, bands, rows)
            dbuckets = dband.column("bucket").to_numpy(
                zero_copy_only=False).reshape(bands, n)
            xs_all, ts_all = [], []
            for b in range(bands):
                q = dbuckets[b]
                lo = np.searchsorted(bsort[b], q, "left")
                hi = np.searchsorted(bsort[b], q, "right")
                cnt = hi - lo
                total = int(cnt.sum())
                if total == 0:
                    continue
                xs = np.repeat(np.arange(n), cnt)
                starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
                offs = np.arange(total) - np.repeat(starts, cnt) \
                    + np.repeat(lo, cnt)
                xs_all.append(xs)
                ts_all.append(bperm[b][offs])
            if xs_all:
                xs = np.concatenate(xs_all)
                ts = np.concatenate(ts_all)
                pair = np.unique(xs.astype(np.int64) * len(tids) + ts)
                xs, ts = pair // len(tids), pair % len(tids)
                keep = d_ids[xs] != tids[ts]
                xs, ts = xs[keep], ts[keep]
                if len(xs):
                    est = ((d_sig[xs] == tsigm[ts]).sum(axis=1)
                           * 10_000 // MINHASH_PERMS).astype(np.int64)
                    np.maximum.at(max_bp, xs, est)
        return pa.table({
            "doc_id": dsig_t.column("doc_id"),
            "is_test": pa.array((d_ids % test_mod == 0).astype(np.int64)),
            "max_sim_bp": pa.array(max_bp),
            "contaminated": pa.array((max_bp >= min_bp).astype(np.int64)),
        })

    return ds.map_batches(flag, batch_format="pyarrow")
