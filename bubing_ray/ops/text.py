"""Text-analysis operators for training-data pipelines.

Language-ID (marker-word heuristic), quality scoring (length / punct /
stopword ratios), token counting, and winnowing document fingerprints —
each a vectorized ``map_batches`` stage over a ``documents``-shaped
table (``doc_id: int64, text: string``).

These extend the reference's text handling (BUbiNG only extracts and
digests text — parser/HTMLParser.java:152-299, spam term counting
parser/SpamTextProcessor.java:36-106) with the analysis stages a
100 TB training-data pipeline needs downstream of the crawl store.

Design notes for scale:
- every stage is a stateless ``map_batches`` over Arrow batches; the
  per-batch kernels are polars/numpy (no Python row loops);
- integer outputs (counts, floor-scaled ratios) so results are exactly
  reproducible across engines (the DuckDB oracles in __ray_entry__
  compute the same IEEE-double expressions);
- nothing materializes the dataset: callers chain more stages or
  ``write_parquet``.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

# single source of truth for the SQL oracles (see __ray_entry__.py)
STOPWORDS = (
    "the", "a", "an", "of", "to", "and", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "or", "this",
)

# marker words per language for the n-gram/marker heuristic language ID
LANG_MARKERS = {
    "en": ("the", "a", "of", "to", "and", "in", "is", "that", "for", "with"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "des", "est", "dans"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "es": ("el", "los", "las", "de", "y", "que", "en", "un", "una", "por"),
}
LANG_ORDER = ("en", "fr", "de", "es")  # deterministic tie-break priority

PUNCT_CLASS = r"[.,;:!?]"
# BPE-ish pre-tokenizer: letter runs / digit runs / single symbols —
# RE2- and rust-regex-compatible (no lookarounds) so the DuckDB oracle
# evaluates the identical pattern
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _tokens(col: pl.Expr) -> pl.Expr:
    return col.str.extract_all(r"\S+")


def token_quality_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> token/char counts + floor-scaled quality ratios.

    Ratios are ``floor(10000 * num / den)`` computed in IEEE double so
    the DuckDB oracle (same expression) matches bit-for-bit.
    """
    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    toks = _tokens(pl.col("text"))
    out = df.select(
        pl.col("doc_id"),
        pl.col("text").str.len_chars().cast(pl.Int64).alias("n_chars"),
        toks.list.len().cast(pl.Int64).alias("n_tokens"),
        pl.col("text").str.count_matches("[A-Za-z]").cast(pl.Int64).alias("n_alpha"),
        pl.col("text").str.count_matches(PUNCT_CLASS).cast(pl.Int64).alias("n_punct"),
        toks.list.eval(
            pl.element().str.to_lowercase().is_in(list(STOPWORDS))
        ).list.sum().fill_null(0).cast(pl.Int64).alias("n_stop"),
        pl.col("text").str.count_matches(BPE_PATTERN).cast(pl.Int64)
        .alias("n_tokens_bpe"),
    )
    n_chars = out["n_chars"].to_numpy().astype(np.float64)
    n_tokens = out["n_tokens"].to_numpy().astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        stop_r = np.floor(10000.0 * out["n_stop"].to_numpy() / n_tokens)
        alpha_r = np.floor(10000.0 * out["n_alpha"].to_numpy() / n_chars)
        punct_r = np.floor(10000.0 * out["n_punct"].to_numpy() / n_chars)
    for name, arr in [
        ("stopword_ratio_bp", stop_r),
        ("alpha_ratio_bp", alpha_r),
        ("punct_ratio_bp", punct_r),
    ]:
        out = out.with_columns(
            pl.Series(name, np.where(np.isfinite(arr), arr, 0).astype(np.int64))
        )
    return out.to_arrow()


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> pred_lang via marker-word counts.

    Scores = count of tokens in each language's marker set; 'zh' wins if
    any CJK codepoint appears; otherwise argmax with LANG_ORDER
    tie-break; all-zero -> 'unk'.
    """
    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    toks = _tokens(pl.col("text").str.to_lowercase())
    exprs = [pl.col("doc_id")]
    for lang in LANG_ORDER:
        exprs.append(
            toks.list.eval(pl.element().is_in(list(LANG_MARKERS[lang])))
            .list.sum().fill_null(0).cast(pl.Int64).alias(f"s_{lang}")
        )
    exprs.append(
        pl.col("text").str.count_matches(r"[一-鿿]").cast(pl.Int64).alias("s_zh")
    )
    sc = df.select(exprs)
    scores = np.stack([sc[f"s_{l}"].to_numpy() for l in LANG_ORDER], axis=1)
    best = np.argmax(scores, axis=1)  # first max wins = LANG_ORDER priority
    best_val = scores[np.arange(len(scores)), best]
    pred = np.array(LANG_ORDER, dtype=object)[best]
    pred = np.where(best_val <= 0, "unk", pred)
    pred = np.where(sc["s_zh"].to_numpy() > 0, "zh", pred)
    return pa.table(
        {"doc_id": sc["doc_id"].to_arrow(), "pred_lang": pa.array(pred.tolist(), pa.string())}
    )


# ------------------------------------------------------------- fingerprinting

FP_K = 8       # char k-gram length
FP_WINDOW = 16  # winnowing window
_FP_BASE = np.uint64(1000003)


def _winnow_one(data: bytes) -> np.ndarray:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    rolling polynomial hash of char k-grams, keep the minimum of each
    sliding window (rightmost min), dedup. Returns sorted uint64."""
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(b) - FP_K + 1
    if n <= 0:
        if len(b) == 0:
            return np.empty(0, dtype=np.uint64)
        h = np.uint64(0)
        for x in b:
            h = h * _FP_BASE + x
        return np.array([h], dtype=np.uint64)
    # rolling hash via cumulative trick: h[i] = sum b[i+j] * BASE^(K-1-j)
    with np.errstate(over="ignore"):
        h = np.zeros(n, dtype=np.uint64)
        for j in range(FP_K):  # K (=8) vectorized passes, not a per-char loop
            h = h * _FP_BASE + b[j : j + n]
    if n <= FP_WINDOW:
        return np.unique(h.min(keepdims=True))
    # sliding-window minimum via stride tricks (windows x FP_WINDOW view)
    win = np.lib.stride_tricks.sliding_window_view(h, FP_WINDOW)
    return np.unique(win.min(axis=1))


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, n_fp, fp_xor, fp_min) winnowing summary.

    ``fp_xor`` (xor of the fingerprint set) is an order-independent
    64-bit document fingerprint; two documents sharing most k-grams
    share most fingerprints (used by the near-dup tests).
    """
    doc_ids = batch.column("doc_id")
    texts = batch.column("text").to_pylist()
    n_fp = np.empty(len(texts), dtype=np.int64)
    fp_xor = np.empty(len(texts), dtype=np.uint64)
    fp_min = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        fps = _winnow_one(t.encode("utf-8") if t is not None else b"")
        n_fp[i] = len(fps)
        fp_xor[i] = np.bitwise_xor.reduce(fps) if len(fps) else np.uint64(0)
        fp_min[i] = fps.min() if len(fps) else np.uint64(0)
    return pa.table(
        {
            "doc_id": doc_ids,
            "n_fp": pa.array(n_fp),
            "fp_xor": pa.array(fp_xor, pa.uint64()),
            "fp_min": pa.array(fp_min, pa.uint64()),
        }
    )


def fingerprint_sets_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, fps: list<uint64>) full fingerprint sets."""
    doc_ids = batch.column("doc_id")
    texts = batch.column("text").to_pylist()
    sets = [
        _winnow_one((t or "").encode("utf-8")) for t in texts
    ]
    return pa.table(
        {
            "doc_id": doc_ids,
            "fps": pa.array([s.tolist() for s in sets], pa.list_(pa.uint64())),
        }
    )


# ---------------------------------------------------------- dataset wrappers

def token_quality(ds):
    """Dataset (doc_id, text, ...) -> quality/count columns."""
    return ds.map_batches(token_quality_batch, batch_format="pyarrow")


def lang_id(ds):
    return ds.map_batches(lang_id_batch, batch_format="pyarrow")


def fingerprints(ds):
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow")


# --------------------------------------------------- text normalization

# C0 control chars + DEL; RE2 class shared verbatim with the SQL oracle
CONTROL_CLASS = r"[\x00-\x1F\x7F]"


def normalize_text_batch(batch: pa.Table, *, id_col: str = "doc_id",
                         text_col: str = "text") -> pa.Table:
    """(doc_id, text) -> (doc_id, norm_text): Unicode NFC normalization,
    control chars -> space, whitespace runs collapsed to one space,
    ends trimmed.  NFC runs in polars (this build's
    pyarrow.compute.utf8_normalize returns decomposed output for every
    form — verified broken); the regex steps run as Arrow RE2 kernels,
    identical to DuckDB's regexp_replace (rust-regex's ``\\s`` is
    Unicode-wide and would NOT match RE2's), so the output is byte-exact
    against the ``nfc_normalize`` SQL oracle."""
    import pyarrow.compute as pc

    s = (pl.from_arrow(batch.column(text_col))
         .str.normalize("NFC").to_arrow())
    s = pc.replace_substring_regex(s, pattern=CONTROL_CLASS, replacement=" ")
    s = pc.replace_substring_regex(s, pattern=r"\s+", replacement=" ")
    # trim plain spaces only: after the collapse the ends can only hold
    # ' ' or non-RE2-\s codepoints (e.g. NBSP), and DuckDB's trim()
    # strips spaces only — keep the two engines byte-identical
    s = pc.utf8_trim(s, characters=" ")
    return pa.table({id_col: batch.column(id_col), "norm_text": s})


def normalize_text(ds):
    """Stateless streaming normalization pass — the cleanup stage every
    web-text corpus runs before dedup/tokenization (C4/RefinedWeb)."""
    return ds.map_batches(normalize_text_batch, batch_format="pyarrow")


# ------------------------------------------------- Gopher-style quality gate

# public heuristics from the Gopher paper (Rae et al. 2021, "Scaling
# Language Models: ... Gopher", appendix A — public knowledge): word
# count bounds, mean word length bounds, minimum alphabetic-word
# fraction, minimum stopword hits, symbol-to-word ratio cap
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN_CP = 300   # centi-chars: 3.0
GOPHER_MAX_MEAN_WORD_LEN_CP = 1000  # 10.0
GOPHER_MIN_ALPHA_WORD_BP = 8000     # 80% of words contain a letter
GOPHER_MIN_STOP_HITS = 2
GOPHER_MAX_SYMBOL_RATIO_BP = 1000   # (# + ellipsis) per word < 0.1


def gopher_quality_batch(batch: pa.Table, *, id_col: str = "doc_id",
                         min_words: int = GOPHER_MIN_WORDS,
                         max_words: int = GOPHER_MAX_WORDS,
                         min_mean_cp: int = GOPHER_MIN_MEAN_WORD_LEN_CP,
                         max_mean_cp: int = GOPHER_MAX_MEAN_WORD_LEN_CP,
                         min_alpha_bp: int = GOPHER_MIN_ALPHA_WORD_BP,
                         min_stop: int = GOPHER_MIN_STOP_HITS,
                         max_symbol_bp: int = GOPHER_MAX_SYMBOL_RATIO_BP) -> pa.Table:
    """(id, text) -> per-rule integers + the keep flag.

    All quantities are floor-scaled integers over IEEE doubles so the
    DuckDB oracle (same expressions) matches exactly.  Thresholds are
    parameters: corpora differ (the defaults are the published Gopher
    bounds for web text)."""
    df = pl.from_arrow(batch.select([id_col, "text"])).rename({id_col: "doc_id"})
    t = _tokens(pl.col("text"))
    out = df.select(
        pl.col("doc_id"),
        t.list.len().fill_null(0).cast(pl.Int64).alias("n_words"),
        t.list.eval(pl.element().str.len_chars()).list.sum().fill_null(0)
        .cast(pl.Int64).alias("n_word_chars"),
        t.list.eval(pl.element().str.contains(r"[A-Za-z]").cast(pl.Int64))
        .list.sum().fill_null(0).cast(pl.Int64).alias("n_alpha_words"),
        t.list.eval(
            pl.element().str.to_lowercase().is_in(list(STOPWORDS)).cast(pl.Int64)
        ).list.sum().fill_null(0).cast(pl.Int64).alias("n_stop_hits"),
        (
            (pl.col("text").str.len_chars()
             - pl.col("text").str.replace_all("#", "", literal=True).str.len_chars())
            + (pl.col("text").str.len_chars()
               - pl.col("text").str.replace_all("...", "", literal=True)
               .str.len_chars()) // 3
        ).cast(pl.Int64).alias("n_symbols"),
    )
    n = out["n_words"].to_numpy().astype(np.float64)
    nz = np.maximum(n, 1.0)
    mean_cp = np.floor(100.0 * out["n_word_chars"].to_numpy() / nz).astype(np.int64)
    alpha_bp = np.floor(10000.0 * out["n_alpha_words"].to_numpy() / nz).astype(np.int64)
    sym_bp = np.floor(10000.0 * out["n_symbols"].to_numpy() / nz).astype(np.int64)
    keep = (
        (out["n_words"].to_numpy() >= min_words)
        & (out["n_words"].to_numpy() <= max_words)
        & (mean_cp >= min_mean_cp)
        & (mean_cp <= max_mean_cp)
        & (alpha_bp >= min_alpha_bp)
        & (out["n_stop_hits"].to_numpy() >= min_stop)
        & (sym_bp < max_symbol_bp)
    )
    return pa.table(
        {
            id_col: out["doc_id"].to_arrow(),
            "n_words": out["n_words"].to_arrow(),
            "mean_word_len_cp": pa.array(mean_cp),
            "alpha_word_bp": pa.array(alpha_bp),
            "n_stop_hits": out["n_stop_hits"].to_arrow(),
            "symbol_ratio_bp": pa.array(sym_bp),
            "keep": pa.array(keep),
        }
    )


def gopher_quality(ds, **thresholds):
    import functools

    return ds.map_batches(
        functools.partial(gopher_quality_batch, **thresholds),
        batch_format="pyarrow",
    )


# ------------------------------------------------ char-trigram language ID

# distinctive character trigrams per language (public linguistic
# knowledge — high-frequency function-word fragments); the classifier
# counts literal occurrences and argmaxes, with the same zh short-cut
# as the marker-word variant.  Shared constant so the DuckDB oracle is
# generated from the identical table.
LANG_TRIGRAMS = {
    "en": (" th", "the", "ing", " an", "ion", " of", "nd ", " to"),
    "fr": (" le", "es ", " de", "ent", "que", " un", "ais", "eur"),
    "de": ("der", "sch", "ein", "ich", "und", " di", "cht", "gen"),
    "es": (" de", "los", " el", "que", "ión", " la", "ado", "nte"),
}


def lang_id_ngram_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> pred_lang via literal trigram counts (one
    vectorized count_matches pass per trigram; no row loops)."""
    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    low = pl.col("text").str.to_lowercase()
    score_exprs = []
    for lang in LANG_ORDER:
        parts = [
            low.str.count_matches(tri, literal=True).fill_null(0)
            for tri in LANG_TRIGRAMS[lang]
        ]
        acc = parts[0]
        for p in parts[1:]:
            acc = acc + p
        score_exprs.append(acc.cast(pl.Int64).alias(f"s_{lang}"))
    zh = (
        pl.col("text").str.count_matches(r"[一-鿿]").fill_null(0)
        .cast(pl.Int64).alias("s_zh")
    )
    sc = df.select(pl.col("doc_id"), *score_exprs, zh)
    s = {lang: sc[f"s_{lang}"].to_numpy() for lang in LANG_ORDER}
    szh = sc["s_zh"].to_numpy()
    n = len(sc)
    pred = np.full(n, "unk", dtype=object)
    best = np.zeros(n, dtype=np.int64)
    # LANG_ORDER priority on ties, like the marker-word variant
    for lang in reversed(LANG_ORDER):
        m = s[lang] >= best
        hit = m & (s[lang] > 0)
        pred[hit] = lang
        best = np.maximum(best, s[lang])
    pred[szh > 0] = "zh"
    return pa.table(
        {
            "doc_id": sc["doc_id"].to_arrow(),
            "pred_lang": pa.array(pred.tolist(), pa.string()),
        }
    )


def lang_id_ngram(ds):
    return ds.map_batches(lang_id_ngram_batch, batch_format="pyarrow")


# ------------------------------------------- corpus-trained LM familiarity

LM_BUCKET_CAP = 15


def _byte_rows(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Flatten a string array's UTF-8 value buffer -> (bytes, row_id)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64)
    off_dtype = (np.int64 if pa.types.is_large_string(arr.type)
                 or pa.types.is_large_binary(arr.type) else np.int32)
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset: arr.offset + n + 1].astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, np.uint8))
    lens = offsets[1:] - offsets[:-1]
    # row payloads are contiguous in the value buffer
    flat = data[offsets[0]:offsets[-1]]
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    return flat, rows


def _tri_codes(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Per-batch byte-trigram integer codes (b0<<16 | b1<<8 | b2) of the
    LOWERCASED text, with the doc row index of each code position."""
    low = pl.from_arrow(batch.column("text")).str.to_lowercase()
    arr = low.to_arrow()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat, rows = _byte_rows(arr)
    if len(flat) < 3:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    code = (flat[:-2].astype(np.int64) << 16) \
        | (flat[1:-1].astype(np.int64) << 8) | flat[2:].astype(np.int64)
    rows3 = rows[:-2]
    # drop trigrams straddling two documents
    keep = rows3 == rows[2:]
    return code[keep], rows3[keep]


def lm_trigram_model(ds) -> pa.Table:
    """Train the corpus byte-trigram model: (code, bucket) with
    ``bucket = min(floor(log2(global_count)), LM_BUCKET_CAP)``.

    One streaming pass of per-batch partial counts, one
    ``groupby(code)`` sum whose width is bounded by the 2^24 code space
    (in practice a few thousand rows) — the classic train-then-broadcast
    half of a perplexity-style quality filter."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        code, _ = _tri_codes(batch)
        df = pl.DataFrame({"code": code})
        return (df.group_by("code").agg(pl.len().cast(pl.Int64).alias("c"))
                .to_arrow())

    g = pa.concat_tables([
        pa.table(b) for b in
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("code").aggregate(Sum("c"))
        .iter_batches(batch_format="pyarrow")
    ])
    c = g.column("sum(c)").to_numpy(zero_copy_only=False)
    bucket = np.minimum(
        np.frexp(c.astype(np.float64))[1] - 1, LM_BUCKET_CAP
    ).astype(np.int64)
    return pa.table({
        "code": g.column("code"),
        "bucket": pa.array(bucket),
    }).sort_by("code")


def lm_score(ds, model: pa.Table | None = None):
    """Score every document against the corpus-trained byte-trigram
    model: ``familiarity_bp = (10000 * sum(bucket over positions)) //
    (LM_BUCKET_CAP * n_positions)`` — high = built from common corpus
    trigrams, low = out-of-distribution text (integer arithmetic
    mirror of a perplexity filter, value-exact in SQL).

    The model (small) broadcasts once via ``ray.put``; scoring is a
    stateless streaming pass (numpy searchsorted per batch).  Returns
    (doc_id, n_tri, familiarity_bp).
    """
    import ray as _ray

    if model is None:
        model = lm_trigram_model(ds)
    codes_ref = _ray.put(model.column("code").to_numpy(zero_copy_only=False))
    bucket_ref = _ray.put(model.column("bucket").to_numpy(zero_copy_only=False))

    def score(batch: pa.Table) -> pa.Table:
        codes = _ray.get(codes_ref)
        buckets = _ray.get(bucket_ref)
        code, rows = _tri_codes(batch)
        n = batch.num_rows
        if len(codes):
            # trained-on-same-corpus scoring always hits; the mask
            # guards cross-corpus use (unknown trigram -> bucket 0)
            idx = np.clip(np.searchsorted(codes, code), 0, len(codes) - 1)
            b = np.where(codes[idx] == code, buckets[idx], 0)
        else:
            b = np.zeros(len(code), np.int64)
        n_tri = np.bincount(rows, minlength=n).astype(np.int64)
        tot = np.bincount(rows, weights=b.astype(np.float64),
                          minlength=n).astype(np.int64)
        fam = np.zeros(n, dtype=np.int64)
        nz = n_tri > 0
        fam[nz] = (10_000 * tot[nz]) // (LM_BUCKET_CAP * n_tri[nz])
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tri": pa.array(n_tri),
            "familiarity_bp": pa.array(fam),
        })

    return ds.map_batches(score, batch_format="pyarrow")


# ----------------------------------------------- BPE merge-step pair counts

def bpe_pair_counts(ds, k: int = 20):
    """The first BPE tokenizer-training step, distributed: count
    adjacent byte pairs WITHIN whitespace tokens of the lowercased
    corpus and return the top-``k`` merge candidates by
    (count desc, pair_code asc).

    Per-batch partials are a bincount over the 2^16 pair-code space;
    the shuffle is a ``groupby(pair_code)`` sum bounded by 65536 rows
    regardless of corpus size, and the final top-k sorts that tiny
    table driver-side.  Integer counts with a total tie-break make the
    result value-exact in SQL.  Returns (pair_code, count).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        toks = (pl.from_arrow(batch.column("text"))
                .str.to_lowercase().str.extract_all(r"\S+")
                .explode().drop_nulls())
        arr = toks.to_arrow()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        flat, rows = _byte_rows(arr)
        if len(flat) < 2:
            return pa.table({"pair_code": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        code = (flat[:-1].astype(np.int64) << 8) | flat[1:].astype(np.int64)
        code = code[rows[:-1] == rows[1:]]  # no cross-token pairs
        cnt = np.bincount(code, minlength=1 << 16)
        nz = np.nonzero(cnt)[0]
        return pa.table({"pair_code": pa.array(nz.astype(np.int64)),
                         "c": pa.array(cnt[nz].astype(np.int64))})

    g = pa.concat_tables([
        pa.table(b) for b in
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("pair_code").aggregate(Sum("c"))
        .iter_batches(batch_format="pyarrow")
    ])
    df = (pl.from_arrow(g)
          .rename({"sum(c)": "count"})
          .sort(["count", "pair_code"], descending=[True, False])
          .head(k))
    return df.select(["pair_code", "count"]).to_arrow()


# -------------------------------------------- familiarity quantile buckets

def familiarity_buckets(ds, qs_bp=(2500, 5000, 7500)):
    """Perplexity-bucketing analogue (the data-selection step in
    DoReMi / DSIR-style recipes): bucket every document by where its
    LM-familiarity score falls among exact corpus quantiles.

    Three bounded passes, no full materialization:

    1. train the byte-trigram model once (``lm_trigram_model`` — one
       groupby over the 2^24 code space) and broadcast it;
    2. one scoring pass feeding ``stats.exact_quantiles`` — the shuffle
       and driver histogram are bounded by the 10001 distinct
       ``familiarity_bp`` values, never by corpus size;
    3. a second scoring pass (same broadcast model, no re-train)
       assigning ``bucket = #cutoffs strictly below the doc's score``
       — cutoffs kept per-quantile (duplicates count twice), so the
       rule replays exactly in SQL.

    Returns a Dataset of (doc_id, familiarity_bp, bucket).
    """
    from .stats import exact_quantiles

    model = lm_trigram_model(ds)
    scored = lm_score(ds, model=model)
    cuts_tbl = exact_quantiles(scored, "familiarity_bp", qs_bp)
    cuts = np.sort(cuts_tbl.column("value").to_numpy(zero_copy_only=False))

    def assign(batch: pa.Table) -> pa.Table:
        fam = batch.column("familiarity_bp").to_numpy(zero_copy_only=False)
        bucket = np.searchsorted(cuts, fam, side="left").astype(np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "familiarity_bp": batch.column("familiarity_bp"),
            "bucket": pa.array(bucket),
        })

    return lm_score(ds, model=model).map_batches(
        assign, batch_format="pyarrow")


# ------------------------------------------------- full BPE training loop

def _flat_syms(batch: pa.Table):
    """(syms list<str>, n int64) batch -> (values ndarray[object],
    word_id per value, counts ndarray)."""
    syms = batch.column("syms")
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    values = np.asarray(syms.values.to_pylist(), dtype=object)
    offs = syms.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offs)
    word_id = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    return values, word_id, offs, n


def _pair_partial(batch: pa.Table) -> pa.Table:
    """Adjacent-symbol pair counts within words, weighted by word
    frequency (every adjacent position counts, Sennrich get_stats)."""
    values, word_id, offs, n = _flat_syms(batch)
    if len(values) < 2:
        return pa.table({"left": pa.array([], pa.string()),
                         "right": pa.array([], pa.string()),
                         "c": pa.array([], pa.int64())})
    adj = word_id[:-1] == word_id[1:]
    li = np.flatnonzero(adj)
    df = pl.DataFrame({
        "left": pl.Series(values[li], dtype=pl.Utf8),
        "right": pl.Series(values[li + 1], dtype=pl.Utf8),
        "c": n[word_id[li]],
    })
    return (df.group_by(["left", "right"])
            .agg(pl.col("c").sum().cast(pl.Int64)).to_arrow())


def _apply_merge(left: str, right: str):
    """Batch fn: merge every leftmost-non-overlapping (left, right)
    adjacency inside each word's symbol list — vectorized numpy over
    the flattened symbol array (no per-word Python)."""

    def f(batch: pa.Table) -> pa.Table:
        values, word_id, offs, n = _flat_syms(batch)
        if len(values) < 2:
            return batch
        cand = np.flatnonzero(
            (word_id[:-1] == word_id[1:])
            & (values[:-1] == left) & (values[1:] == right))
        if not len(cand):
            return batch
        # leftmost non-overlapping within runs of consecutive candidate
        # positions (the "aaaa" case): keep alternate members of each run
        run_key = cand - np.arange(len(cand))
        _, run_start = np.unique(run_key, return_index=True)
        in_run = np.arange(len(cand)) - np.repeat(
            run_start, np.diff(np.append(run_start, len(cand))))
        merge_at = cand[in_run % 2 == 0]
        new_vals = values.copy()
        new_vals[merge_at] = np.char.add(
            values[merge_at].astype(str), values[merge_at + 1].astype(str)
        ).astype(object)
        keep = np.ones(len(values), dtype=bool)
        keep[merge_at + 1] = False
        kept = new_vals[keep]
        new_lens = np.bincount(word_id[keep], minlength=len(offs) - 1)
        new_offs = np.concatenate(
            [[0], np.cumsum(new_lens)]).astype(np.int64)
        syms = pa.LargeListArray.from_arrays(
            pa.array(new_offs, pa.int64()),
            pa.array(kept.tolist(), pa.large_string()))
        return pa.table({"syms": syms, "n": batch.column("n")})

    return f


def word_counts(ds, text_col: str = "text"):
    """Distributed word-frequency table (word, n) over lowercased
    whitespace tokens — per-batch partial counts then one
    ``groupby(word)`` sum (exchange = distinct words, not corpus rows)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        toks = (pl.from_arrow(batch.column(text_col))
                .str.to_lowercase().str.extract_all(r"\S+")
                .explode().drop_nulls().rename("word"))
        return (pl.DataFrame({"word": toks}).group_by("word")
                .agg(pl.len().cast(pl.Int64).alias("n")).to_arrow())

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("word").aggregate(Sum("n", alias_name="n")))


def bpe_train(ds, n_merges: int = 20, text_col: str = "text") -> pa.Table:
    """Full BPE tokenizer training (Sennrich et al. 2016, public
    algorithm), distributed: returns the merge table
    (rank, left, right, count) of the first ``n_merges`` merges.

    Shape per iteration: one vectorized pass over the WORD table
    (distinct words, not corpus rows) producing (left, right, count)
    partials, one bounded ``groupby`` sum, a driver-side top-1 by
    (count desc, left asc, right asc), then one vectorized merge-apply
    pass.  The corpus itself is read exactly once (the word-count
    reduction); everything after operates on the bounded vocabulary
    table, re-materialized per iteration so the k passes don't
    re-execute the whole chain.

    Determinism: exact integer counts + total tie-break make the merge
    sequence unique — pytest checks it against a sequential model.
    """
    from ray.data.aggregate import Sum

    def to_syms(batch: pa.Table) -> pa.Table:
        w = pl.from_arrow(batch.column("word"))
        syms = w.str.extract_all(r".").alias("syms")  # unicode chars
        return pl.DataFrame(
            {"syms": syms,
             "n": pl.from_arrow(batch.column("n"))}).to_arrow()

    words = word_counts(ds, text_col)
    table = words.map_batches(to_syms, batch_format="pyarrow").materialize()

    merges = []
    for rank in range(n_merges):
        pairs = (table.map_batches(_pair_partial, batch_format="pyarrow")
                 .groupby(["left", "right"])
                 .aggregate(Sum("c", alias_name="c")))
        tiny = pairs.sort(["c", "left", "right"],
                          descending=[True, False, False]) \
            .limit(1).take_all()
        if not tiny:
            break
        top = tiny[0]
        merges.append((rank, top["left"], top["right"], int(top["c"])))
        table = table.map_batches(
            _apply_merge(top["left"], top["right"]),
            batch_format="pyarrow").materialize()

    return pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "count": pa.array([m[3] for m in merges], pa.int64()),
    })


def bpe_encode(ds, merges: pa.Table, text_col: str = "text",
               id_col: str = "doc_id"):
    """Apply a trained BPE merge list to the corpus: (doc_id) ->
    (n_words, n_tokens) where ``n_tokens`` is the symbol count after
    replaying every merge in rank order within each word.

    The merge list is broadcast once via ``ray.put``; each batch
    flattens ALL its words into one symbol array and replays the k
    merges as k vectorized numpy passes (the `bpe_train` merge-apply
    kernel) — never a per-word or per-doc Python loop.
    """
    import ray as _ray

    pairs = list(zip(merges.column("left").to_pylist(),
                     merges.column("right").to_pylist()))
    pairs_ref = _ray.put(pairs)

    def encode(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(
            pa.table({id_col: batch.column(id_col),
                      "_t": batch.column(text_col)}))
        words = (df.with_columns(
            pl.col("_t").str.to_lowercase().str.extract_all(r"\S+")
            .alias("_w")).select([id_col, "_w"]))
        # fill_null BEFORE to_numpy: a null text row otherwise floats
        # the count array (NaN) and np.repeat raises; a null doc simply
        # has zero words/tokens
        n_words = (words["_w"].list.len().fill_null(0)
                   .cast(pl.Int64).to_numpy())
        exploded = words.explode("_w").drop_nulls("_w")
        chars = exploded.select(
            pl.col("_w").str.extract_all(r".").alias("_c"))["_c"]
        wlens = chars.list.len().cast(pl.Int64).to_numpy()
        values = np.asarray(
            chars.explode().to_list(), dtype=object)
        word_id = np.repeat(np.arange(len(wlens), dtype=np.int64), wlens)

        for left, right in _ray.get(pairs_ref):
            if len(values) < 2:
                break
            cand = np.flatnonzero(
                (word_id[:-1] == word_id[1:])
                & (values[:-1] == left) & (values[1:] == right))
            if not len(cand):
                continue
            run_key = cand - np.arange(len(cand))
            _, run_start = np.unique(run_key, return_index=True)
            in_run = np.arange(len(cand)) - np.repeat(
                run_start, np.diff(np.append(run_start, len(cand))))
            merge_at = cand[in_run % 2 == 0]
            values[merge_at] = np.char.add(
                values[merge_at].astype(str),
                values[merge_at + 1].astype(str)).astype(object)
            keep = np.ones(len(values), dtype=bool)
            keep[merge_at + 1] = False
            values = values[keep]
            word_id = word_id[keep]

        sym_per_word = np.bincount(word_id, minlength=len(wlens)) \
            .astype(np.int64)
        # per-doc totals: words are grouped by doc in explode order
        docs = df[id_col].to_numpy()
        doc_index = np.repeat(np.arange(len(docs), dtype=np.int64),
                              n_words)
        n_tokens = np.bincount(doc_index, weights=sym_per_word,
                               minlength=len(docs)).astype(np.int64)
        return pa.table({
            id_col: df[id_col].to_arrow(),
            "n_words": pa.array(n_words.astype(np.int64)),
            "n_tokens": pa.array(n_tokens),
        })

    return ds.map_batches(encode, batch_format="pyarrow")
