"""Named query pipelines — the `queries()` surface of __ray_entry__.

Each function takes ``sf_dir`` (a /root/testdata/sfX directory) and
returns a Ray Dataset / pyarrow Table. Functions here are the public
per-operator entry points covering SURVEY.md §2 plus the training-data
extensions (dedup family, similarity search, text analysis, multimodal)
— names here match the oracle SQL keys in __ray_entry__.oracle_sql().

None of these call ray.init(): the driver (or bench.py / the tests)
owns the Ray session.
"""

from __future__ import annotations

import os

import numpy as np
import polars as pl
import pyarrow as pa
import ray
from ray.data.aggregate import Count, Max, Min, Sum

from .. import burl, robots
from ..hashing import hash64
from ..ops import assoc, corpus, dedup, filters, multimodal, simsearch, spam, stats, text
from ..sieve import SieveService

EMB_NEARDUP_THRESHOLD = 0.45  # safe gap to data sims on both engines
ANN_QUERIES = 8
ANN_K = 5


def _docs(sf_dir: str):
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


def _collect(ds) -> pa.Table:
    if isinstance(ds, pa.Table):
        return ds
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    if not batches:
        return None
    return pa.concat_tables([pa.table(b) for b in batches])


# ------------------------------------------------------------ text analysis

def text_quality(sf_dir: str):
    return text.token_quality(_docs(sf_dir))


def lang_id(sf_dir: str):
    return text.lang_id(_docs(sf_dir))


def fingerprints(sf_dir: str):
    return text.fingerprints(_docs(sf_dir))


def lm_familiarity(sf_dir: str):
    """Corpus-trained byte-trigram LM familiarity score per document
    (integer perplexity-filter analogue: train -> broadcast -> score)."""
    return text.lm_score(_docs(sf_dir))


def bpe_pairs(sf_dir: str):
    """Top-20 BPE merge candidates: adjacent within-token byte-pair
    counts over the lowercased corpus (tokenizer-training step 1)."""
    return text.bpe_pair_counts(_docs(sf_dir))


def collocations(sf_dir: str):
    """Top-20 word collocations by integer PMI lift (min bigram count
    3): bounded count exchanges + size-guarded vocabulary joins; the
    corpus never shuffles or sorts."""
    return assoc.collocations(_docs(sf_dir), k=20, min_count=3)


def ngram_topk(sf_dir: str):
    """Top-20 word trigrams by corpus frequency (boilerplate /
    contamination analysis)."""
    return assoc.ngram_topk(_docs(sf_dir), n=3, k=20)


def dsir_weights(sf_dir: str):
    """DSIR importance weights (hashed-bigram log2-bucket count ratio,
    target = lang='en' docs vs the raw corpus): train -> broadcast
    2^16-slot model -> stateless streaming score."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"])
    return assoc.dsir_weights(ds)


def bpe_merges(sf_dir: str):
    """Full BPE tokenizer training (first 15 merges) over the documents
    corpus.  Iterative, but deterministic (exact counts + total
    tie-break), so the oracle unrolls the 15 merge steps textually in
    SQL (same trick as page_pagerank); also pytest-verified against a
    sequential model."""
    return text.bpe_train(_docs(sf_dir), n_merges=15)


def bpe_encode_counts(sf_dir: str):
    """Train 15 BPE merges then replay them over the corpus: per-doc
    (n_words, n_tokens) after merging — the tokenizer apply step
    (train -> encode -> token_pack completes the chain)."""
    ds = _docs(sf_dir)
    merges = text.bpe_train(ds, n_merges=15)
    return text.bpe_encode(ds, merges)


def familiarity_buckets(sf_dir: str):
    """Perplexity-bucketing analogue: exact quartile cutoffs of the
    corpus LM-familiarity score, then per-doc bucket assignment."""
    return text.familiarity_buckets(_docs(sf_dir))


MIN_SOURCE_KEEP_BP = 5000


def source_quality_gate(sf_dir: str):
    """Domain-level quality gate: drop every document of sources whose
    Gopher-gate pass rate is below MIN_SOURCE_KEEP_BP, and the
    individually-failing docs of surviving sources."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"])
    return corpus.source_quality_gate(ds, min_keep_bp=MIN_SOURCE_KEEP_BP)


def quality_filter(sf_dir: str):
    """Gopher-style quality gate: per-rule integers + keep flag."""
    return text.gopher_quality(_docs(sf_dir))


def lang_id_ngram(sf_dir: str):
    """Character-trigram language ID (literal count_matches per
    profile trigram; LANG_ORDER tie priority, zh short-cut)."""
    return text.lang_id_ngram(_docs(sf_dir))


# ----------------------------------------------------- corpus composition

#: per-language sampling rates (basis points) for the flagship mix:
#: downsample dominant English, halve Chinese, keep the rest.
SAMPLE_RATES_BP = {"en": 3000, "zh": 5000}
SOURCE_CAP = 8
DECON_NGRAM = 3     # production recipes use 13-grams; the synthetic
DECON_TEST_MOD = 97  # corpus is tiny, 3-grams exercise real overlap
PACK_SEQ_LEN = 512
DUPSPAN_NGRAM = 5
TFIDF_TERMS = ("data", "merge", "stream", "window")
TFIDF_K = 20
PACK_BUCKET = 64


def stratified_sample(sf_dir: str):
    """Deterministic per-language downsampling (splitmix64 threshold)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )
    return corpus.stratified_sample(ds, SAMPLE_RATES_BP)


def source_cap(sf_dir: str):
    """Per-source document cap: keep SOURCE_CAP docs per source, ranked
    by the splitmix64 sampling key (Gopher-style per-domain caps)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source"]
    )
    return corpus.group_cap(ds, key="source", cap=SOURCE_CAP)


def decontaminate(sf_dir: str):
    """Test-set n-gram decontamination flags over the documents table."""
    return corpus.decontaminate(
        _docs(sf_dir), n=DECON_NGRAM, test_mod=DECON_TEST_MOD)


def pii_redact(sf_dir: str):
    """PII redaction (emails / IPv4 / phones) over PII-injected docs."""
    ds = _docs(sf_dir).map_batches(
        corpus.inject_pii_batch, batch_format="pyarrow")
    return corpus.pii_redact(ds)


def token_pack(sf_dir: str):
    """GPT-style stream packing: global token offsets + chunk spans via
    a distributed prefix sum over doc_id-bucket token totals."""
    return corpus.token_pack(
        _docs(sf_dir), seq_len=PACK_SEQ_LEN, bucket=PACK_BUCKET)


def repetition_stats(sf_dir: str):
    """Gopher-style within-doc repetition: top-2-gram position fraction
    and duplicate-3-gram position fraction (basis points)."""
    return corpus.repetition_stats(_docs(sf_dir))


LANG_TOKEN_BUDGET = 600
SAMPLE_N = 100


def lang_token_cap(sf_dir: str):
    """Per-language token budget: greedy hash-ranked prefix per lang
    until the running token total crosses the budget (token-weighted
    data-mixture capping)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "text"])
    return corpus.lang_token_cap(ds, budget=LANG_TOKEN_BUDGET)


def sample_n(sf_dir: str):
    """Fixed-size deterministic uniform sample: the 100 docs with the
    smallest splitmix64 sampling hash — partitioning-invariant."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang"])
    return corpus.sample_n(
        ds, n=SAMPLE_N, keep_cols=("lang",)).select_columns(
        ["doc_id", "lang"])


CHUNK_CHARS, CHUNK_OVERLAP = 120, 30


def chunk_docs(sf_dir: str):
    """Context-window chunking: overlapping 120-codepoint windows with
    stride 90 per document (retrieval/embedding corpus prep); every doc
    yields >=1 chunk, offsets count codepoints (== DuckDB substr)."""
    return corpus.chunk_docs(
        _docs(sf_dir), chunk=CHUNK_CHARS, overlap=CHUNK_OVERLAP)


def dedup_keep_best(sf_dir: str):
    """Duplicate-cluster representative selection: cluster key = the
    first two whitespace tokens (a cheap deterministic stand-in for a
    near-dup cluster id — the op takes any key column), keep the longest
    variant per cluster (ties -> min doc_id) with the cluster size."""

    def keyed(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        df = df.with_columns(
            pl.col("text").str.extract_all(r"\S+")
            .list.slice(0, 2).list.join(" ").alias("ckey"),
            pl.col("text").str.len_chars().cast(pl.Int64).alias("n_chars"),
        )
        return df.select(["doc_id", "ckey", "n_chars"]).to_arrow()

    ds = _docs(sf_dir).map_batches(keyed, batch_format="pyarrow")
    return dedup.dedup_keep_best(ds, key="ckey", score_col="n_chars")


#: synthesize deterministic paragraph breaks (the synthetic docs are
#: single text blocks): every 3 words become a paragraph.  RE2 global
#: replace — byte-identical in pyarrow and DuckDB regexp_replace.
PARA_BREAK_RE = r"(\S+ \S+ \S+) "


def paragraph_dedup(sf_dir: str):
    """Paragraph-level exact dedup (C4 / RefinedWeb family): each
    paragraph survives only at its first corpus occurrence ordered by
    (doc_id, paragraph index); documents are reassembled from their
    surviving paragraphs and drop entirely when nothing survives."""
    import pyarrow.compute as pc

    def to_paras(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("text"), "text",
            pc.replace_substring_regex(
                batch.column("text"), pattern=PARA_BREAK_RE,
                replacement="\\1\n\n"))

    ds = _docs(sf_dir).map_batches(to_paras, batch_format="pyarrow")
    return corpus.paragraph_dedup(ds)


def corpus_compose(sf_dir: str):
    """Full composition recipe: quality gate ∧ decontaminate ∧
    stratified sample → per-source cap, in one streaming pass."""
    full = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )
    tests = corpus.test_shingles(
        _docs(sf_dir), n=DECON_NGRAM, test_mod=DECON_TEST_MOD)
    return corpus.compose_corpus(
        full, tests=tests, rates_bp=SAMPLE_RATES_BP, cap=SOURCE_CAP,
        n=DECON_NGRAM, test_mod=DECON_TEST_MOD)


# ------------------------------------------------------------------- dedup

def exact_dedup(sf_dir: str):
    return dedup.exact_dedup_groups(_docs(sf_dir))


def ngram_jaccard(sf_dir: str):
    return dedup.ngram_jaccard_pairs(_docs(sf_dir), n=3, min_sim_bp=2000)


def minhash_pairs(sf_dir: str):
    """Portable (FNV-1a-64) hashing so the full LSH chain — shingle
    hash, k-perm signatures, band-bucket mix, candidate pairs, sig
    verify — replays value-exactly in the DuckDB oracle."""
    return dedup.minhash_lsh_pairs(_docs(sf_dir), threshold=0.2,
                                   portable=True)


def minhash_dedup(sf_dir: str):
    return dedup.minhash_dedup_keep(
        _docs(sf_dir), threshold=0.5, portable=True
    ).select_columns(["doc_id"])


def docs_topk_by_source(sf_dir: str):
    """Per-key top-k: the 3 longest documents per source (rank window
    via the coarse-route shuffle + per-batch partial top-k prune)."""
    from bubing_ray.ops import windows

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "n_chars"])
    return windows.group_topk(ds, key="source", order_col="n_chars",
                              k=3, descending=True, tie_col="doc_id")


def docs_global_rank(sf_dir: str):
    """Total ordering of the corpus by document length — distributed
    ORDER BY + row_number (range-partition on sampled split points,
    bounded per-bucket offsets, one vectorized sort per bucket)."""
    from bubing_ray.ops import windows

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars"])
    return windows.global_rank(ds, "n_chars", "doc_id", descending=True)


def decontaminate_fuzzy(sf_dir: str):
    """MinHash-based fuzzy decontamination: flag docs near-duplicating
    any held-out test doc (doc_id % 29 == 0) at est. Jaccard >= 0.2.
    Test signatures + band buckets broadcast once; the corpus streams
    with zero corpus-side shuffle.  Portable hashing so the DuckDB
    oracle replays the whole chain value-exactly."""
    return corpus.decontaminate_fuzzy(_docs(sf_dir), test_mod=29,
                                      min_bp=2000, portable=True)


def tfidf_search(sf_dir: str):
    """Integer TF-IDF keyword ranking over the documents table: fixed
    query terms, top-20 by (score desc, doc_id)."""
    from bubing_ray.ops import simsearch

    return simsearch.tfidf_topk(_docs(sf_dir), list(TFIDF_TERMS), k=TFIDF_K)


def bm25_search(sf_dir: str):
    """Fixed-point BM25 ranking (k1=1.2, b=0.75) over the documents
    table — same query terms as tfidf_search, doc-length-normalized."""
    from bubing_ray.ops import simsearch

    return simsearch.bm25_topk(_docs(sf_dir), list(TFIDF_TERMS), k=TFIDF_K)


def text_normalize(sf_dir: str):
    """Unicode NFC + control-strip + whitespace-collapse normalization
    (the C4/RefinedWeb cleanup pass), byte-exact vs the SQL oracle."""
    return text.normalize_text(_docs(sf_dir))


def dup_spans(sf_dir: str):
    """Corpus-global exact duplicate n-gram span coverage per document
    (Lee et al. 2021 simplified to token n-gram positions)."""
    return dedup.dup_span_stats(_docs(sf_dir), n=DUPSPAN_NGRAM)


def strip_dup_spans(sf_dir: str):
    """Exact-substring duplicate removal: every token covered by a
    globally-duplicated n-gram is cut from the document text
    (Lee et al. 2021 ExactSubstr, token-n-gram simplification)."""
    return dedup.strip_dup_spans(_docs(sf_dir), n=DUPSPAN_NGRAM)


def simhash_sigs(sf_dir: str):
    return _docs(sf_dir).map_batches(
        lambda b: dedup.simhash_batch(b, portable=True),
        batch_format="pyarrow")


def simhash_neardup(sf_dir: str):
    return dedup.simhash_pairs(_docs(sf_dir), max_hamming=3, portable=True)


def embedding_neardup(sf_dir: str):
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                                columns=["vec_id", "embedding"])
    return dedup.embedding_neardup_pairs(ds, threshold=EMB_NEARDUP_THRESHOLD)


def embedding_neardup_lsh(sf_dir: str):
    """Bucketed (broadcast-free) cosine near-dup — the 100 TB path;
    approximate, so rows-only at the driver (pytest asserts pairs ⊆
    the exact set with bounded recall).  Plane count auto-scales with
    corpus size so per-bucket work stays bounded."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                                columns=["vec_id", "embedding"])
    return dedup.embedding_neardup_pairs_lsh(
        ds, threshold=EMB_NEARDUP_THRESHOLD, multiprobe=1
    )


# -------------------------------------------------------- similarity search

def ann_topk(sf_dir: str):
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                                columns=["vec_id", "embedding"])
    return simsearch.brute_topk(ds, n_queries=ANN_QUERIES, k=ANN_K)


def ann_lsh(sf_dir: str):
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                                columns=["vec_id", "embedding"])
    return simsearch.lsh_topk(ds, n_queries=ANN_QUERIES, k=ANN_K)


def ann_ivf(sf_dir: str):
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                                columns=["vec_id", "embedding"])
    return simsearch.ivf_topk(ds, n_queries=ANN_QUERIES, k=ANN_K)


def knn_graph(sf_dir: str):
    """Exact cosine kNN graph (every vector a query, self excluded);
    broadcast-guarded — the LSH/IVF variants are the past-guard path."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                                columns=["vec_id", "embedding"])
    return simsearch.knn_graph(ds, k=ANN_K)


def semdedup(sf_dir: str):
    """SemDeDup semantic dedup: spherical k-means clusters + first-wins
    within-cluster cosine prune — iterative k-means, so rows-only at
    the driver (pytest asserts sequential-model equivalence and
    partitioning invariance)."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
    return dedup.semdedup(ds, threshold_bp=4000, n_clusters=8)


SEMDEDUP_FIXED_KW = dict(threshold_bp=4000, n_clusters=8, iters=2)


def semdedup_fixed(sf_dir: str):
    """SemDeDup with fixed-point k-means + portable-float cosine — the
    value-exact-oracle sibling of ``semdedup`` (every step is exact
    int64 or one correctly-rounded double op that DuckDB replays
    bit-for-bit; see ops/dedup.semdedup_fixed)."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
    return dedup.semdedup_fixed(ds, **SEMDEDUP_FIXED_KW).sort("vec_id")


SESSION_GAP_MS = 3_600_000  # 1h gap


def hll_users(sf_dir: str):
    """HyperLogLog register table (mergeable sketch state) for distinct
    events.user_id — register maxima are integer-exact, so the sketch
    itself (not just its estimate) is oracle-checkable."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"])
    return stats.hll_registers(ds, "user_id")


def orders_by_nation(sf_dir: str):
    """Reduce-side shuffle join orders x customer, then per-nation
    order counts + integer-cent revenue (int sums stay order-invariant
    so the result is value-exact vs SQL)."""
    import numpy as np
    import polars as pl
    import pyarrow as pa

    from ray.data.aggregate import Sum

    from ..ops.joins import shuffle_join

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"],
    ).map_batches(
        lambda b: pa.table({
            "custkey": b.column("o_custkey"),
            "cents": pa.array(np.round(
                100.0 * b.column("o_totalprice").to_numpy(
                    zero_copy_only=False)).astype(np.int64)),
        }),
        batch_format="pyarrow")
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(
        lambda b: pa.table({
            "custkey": b.column("c_custkey"),
            "nation": b.column("c_nationkey").combine_chunks()
            .cast(pa.int64()),
        }),
        batch_format="pyarrow")
    joined = shuffle_join(orders, cust, on="custkey")

    def partial(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(["nation", "cents"]))
        return (df.group_by("nation")
                .agg(pl.len().cast(pl.Int64).alias("pn"),
                     pl.col("cents").sum().alias("pc")).to_arrow())

    return (joined.map_batches(partial, batch_format="pyarrow")
            .groupby("nation").aggregate(Sum("pn"), Sum("pc"))
            .map_batches(lambda b: pa.table({
                "nation": b.column("nation"),
                "n_orders": b.column("sum(pn)"),
                "sum_cents": b.column("sum(pc)"),
            }), batch_format="pyarrow"))


def lineitem_quantiles(sf_dir: str):
    """Exact quantiles of l_quantity via the distributed value
    histogram (shuffle carries distinct values, not rows)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_quantity"])
    return stats.exact_quantiles(ds, "l_quantity")


def lineitem_quantiles_by_flag(sf_dir: str):
    """Per-key exact quantiles (grouped form): l_quantity quantiles per
    l_returnflag via the distributed (key, value) histogram + key-routed
    cumulative windows — the driver never sees the histogram."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity"],
    )
    return stats.grouped_quantiles(ds, "l_returnflag", "l_quantity")


def events_type_user_hll(sf_dir: str):
    """Per-key HLL registers: approximate distinct users per event_type
    (the distinct-users-per-domain shape at 100 TB) — value-exact
    register table via the splitmix64 chain."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id"],
    )
    return stats.grouped_hll(ds, "event_type", "user_id")


def cm_events(sf_dir: str):
    """Count-Min sketch state (row, slot, count) of the
    events.event_type frequency distribution — integer counter sums,
    value-exact vs SQL."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type"])
    return stats.cm_sketch(ds, "event_type")


def sessionize_events(sf_dir: str):
    """Gap-based sessionization over the events stream (windowed op)."""
    from ..ops.windows import sessionize

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )
    return sessionize(ds, gap_ms=SESSION_GAP_MS)


def session_stats(sf_dir: str):
    """Per-user session summary (count + largest session) over the
    gap-sessionized stream."""
    from ..ops.windows import session_stats as _ss

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )
    return _ss(ds, gap_ms=SESSION_GAP_MS)


# ------------------------------------------------- temporal operators
# As-of join / range join / windowed + running aggregates — the custom
# operators the rebuild spec names as missing from Ray Data.  All use
# the co-routed coarse-shuffle shape (ops/temporal.py).

def _events_cols(sf_dir: str, cols):
    return ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=list(cols)
    )


_CENTS = (pl.col("value") * 100).floor().cast(pl.Int64)  # exact in both
# engines: IEEE double*100 then floor is bit-identical to DuckDB's
# floor(value*100), and int64 sums/differences are exact


def events_last_purchase(sf_dir: str):
    """As-of join: each event gets the same user's most recent
    purchase event at-or-before it (DuckDB ASOF LEFT JOIN oracle)."""
    from ..ops.temporal import asof_join
    import pyarrow.dataset as pads

    left = _events_cols(sf_dir, ["event_id", "user_id", "ts"])
    right = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
        filter=pads.field("event_type") == "purchase",
    ).map_batches(
        lambda b: b.rename_columns(
            ["purch_event_id", "user_id", "ts", "purch_value"]),
        batch_format="pyarrow",
    )
    out = asof_join(left, right, key="user_id", ts_col="ts",
                    tiebreak="purch_event_id")
    return out.select_columns(
        ["event_id", "user_id", "purch_event_id", "purch_value"])


def purchase_window_stats(sf_dir: str):
    """Range (interval) join aggregate: for each purchase event, the
    count and exact cent-sum of the same user's events in the hour
    starting at the purchase (inclusive) — computed from two as-of
    probes per interval, never materializing matched pairs."""
    from ..ops.temporal import range_join_agg
    import pyarrow.dataset as pads

    HOUR_US = 3_600_000_000

    def mk_interval(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        start = b.column("ts").cast(pa.int64())
        end = pc.add(start, HOUR_US)
        return pa.table({
            "purch_event_id": b.column("event_id"),
            "user_id": b.column("user_id"),
            "w_start": start,
            "w_end": end,
        })

    intervals = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
        filter=pads.field("event_type") == "purchase",
    ).map_batches(mk_interval, batch_format="pyarrow")
    points = _events_cols(sf_dir, ["user_id", "ts", "value"])
    out = range_join_agg(
        intervals, points, key="user_id",
        start_col="w_start", end_col="w_end", ts_col="ts",
        val_expr=_CENTS,
    )
    return out.select_columns(["purch_event_id", "n_points", "sum_val"])


def events_hourly(sf_dir: str):
    """Tumbling-window aggregate: per (hour, event_type) count + exact
    cent-sum; per-batch partials, tiny final shuffle."""
    from ..ops.temporal import tumbling_agg

    ds = _events_cols(sf_dir, ["ts", "event_type", "value"])
    return tumbling_agg(ds, "ts", 3_600_000_000, "event_type",
                        val_expr=_CENTS)


def events_sliding(sf_dir: str):
    """Sliding-window count: 1-hour windows sliding every 15 minutes,
    per event_type (each event lands in exactly 4 windows)."""
    from ..ops.temporal import sliding_agg

    ds = _events_cols(sf_dir, ["ts", "event_type"])
    return sliding_agg(ds, "ts", 3_600_000_000, 900_000_000, "event_type")


def events_running(sf_dir: str):
    """Per-user running count + exact cent-sum in (ts, event_id) order
    — the SQL PARTITION BY window, one cum_sum per route group."""
    from ..ops.temporal import running_agg

    ds = _events_cols(sf_dir, ["event_id", "user_id", "ts", "value"])
    out = running_agg(ds, key="user_id", ts_col="ts", id_col="event_id",
                      val_expr=_CENTS)
    return out.select_columns(["event_id", "user_id", "run_cnt", "run_sum"])


def funnel_stages(sf_dir: str):
    """view -> click -> purchase funnel per user (strictly ordered
    first occurrences); one coarse-route shuffle of step-typed rows."""
    from ..ops.temporal import funnel_stages as _funnel

    ds = _events_cols(sf_dir, ["user_id", "ts", "event_type"])
    return _funnel(ds, steps=["view", "click", "purchase"])


def store_diff(sf_dir: str):
    """Snapshot diff demo over two deterministic document views (old =
    even doc_ids, new = multiples of 3, with multiples of 12
    content-rewritten): added / removed / changed / same per key via
    ONE co-routed full join (ops/joins.py:diff_tables)."""
    import polars as pl

    from ..ops.joins import diff_tables

    path = os.path.join(sf_dir, "documents.parquet")

    def left_view(b):
        df = pl.from_arrow(b.select(["doc_id", "text"]))
        return df.filter(pl.col("doc_id") % 2 == 0).to_arrow()

    def right_view(b):
        df = pl.from_arrow(b.select(["doc_id", "text"]))
        return (df.filter(pl.col("doc_id") % 3 == 0)
                .with_columns(
                    pl.when(pl.col("doc_id") % 12 == 0)
                    .then(pl.col("text").str.to_uppercase())
                    .otherwise(pl.col("text")).alias("text"))
                .to_arrow())

    left = ray.data.read_parquet(path, columns=["doc_id", "text"]) \
        .map_batches(left_view, batch_format="pyarrow")
    right = ray.data.read_parquet(path, columns=["doc_id", "text"]) \
        .map_batches(right_view, batch_format="pyarrow")
    return diff_tables(left, right, key="doc_id", val_col="text")


def cohort_retention(sf_dir: str):
    """Retention triangle: distinct users active k weeks after their
    first-event (cohort) week; per-batch (user, week) shrink, one
    key-routed shuffle, one tiny cell-table reduce."""
    from ..ops.temporal import cohort_retention as _cohort

    ds = _events_cols(sf_dir, ["user_id", "ts"])
    return _cohort(ds)


def customers_no_urgent(sf_dir: str):
    """Anti join (NOT EXISTS): customers with no 1-URGENT order.  The
    right side reduces to distinct keys before a broadcast/shuffle
    existence check (ops/joins.py:semi_join)."""
    from ..ops.joins import semi_join
    import pyarrow.dataset as pads

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"],
    )
    urgent = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey"],
        filter=pads.field("o_orderpriority") == "1-URGENT",
    ).map_batches(lambda b: b.rename_columns(["c_custkey"]),
                  batch_format="pyarrow")
    return semi_join(cust, urgent, on="c_custkey", anti=True)


def customers_with_urgent(sf_dir: str):
    """Semi join (EXISTS): customers holding at least one 1-URGENT
    order (same distinct-key reduction, semi mask)."""
    from ..ops.joins import semi_join
    import pyarrow.dataset as pads

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"],
    )
    urgent = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey"],
        filter=pads.field("o_orderpriority") == "1-URGENT",
    ).map_batches(lambda b: b.rename_columns(["c_custkey"]),
                  batch_format="pyarrow")
    return semi_join(cust, urgent, on="c_custkey", anti=False)


# -------------------------------------------------------------- multimodal

def multimodal_meta(sf_dir: str):
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return multimodal.decode_meta(multimodal.attach_payload(ds))


def multimodal_resize(sf_dir: str):
    """Actor-pool nearest-neighbor resize over the fake-image payloads,
    re-decoded to metadata — output dimensions are a pure function of
    doc_id, so the stage is oracle-checkable end-to-end."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return multimodal.decode_meta(
        multimodal.resize_images(multimodal.attach_payload(ds), scale=0.5)
    )


def multimodal_frames(sf_dir: str):
    """Video frame sampling (every 2nd frame of the fake-video payload)
    exploded to (doc_id, frame_idx, n_bytes) rows."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    frames = multimodal.sample_frames(multimodal.attach_video(ds), stride=2)

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "frame_idx": b.column("frame_idx"),
                "n_bytes": pc.cast(pc.binary_length(b.column("frame")), pa.int64()),
            }
        )

    return frames.map_batches(project, batch_format="pyarrow")


def multimodal_features(sf_dir: str):
    """Byte-histogram feature extraction (the model-inference plumbing).
    Exact integer basis-point features (f0..f7) so the payload bytes —
    a closed-form function of (doc_id, text) — are SQL-oracle-checkable
    end to end; the float-vector variant of the same stage is
    pytest-covered."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return multimodal.attach_payload(ds).map_batches(
        multimodal.ExtractImageFeatures, batch_format="pyarrow",
        fn_constructor_kwargs={"exact_bp": True},
        concurrency=2, batch_size=256,
    ).sort("doc_id")


# ------------------------------------------------------------ aggregations

def source_stats(sf_dir: str):
    """Per-source counters (the per-host counter/stats analogue,
    util/ConcurrentCountingMap.java + frontier/StatsThread.java)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "n_chars"],
    )
    g = ds.groupby("source").aggregate(Count(), Sum("n_chars"), Min("doc_id"))

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": t.column("source"),
                "n_docs": t.column("count()"),
                "sum_chars": t.column("sum(n_chars)"),
                "min_doc_id": t.column("min(doc_id)"),
            }
        )

    return g.map_batches(rename, batch_format="pyarrow")


def events_user_stats(sf_dir: str):
    """Per-user event aggregate (count / distinct types / max value) —
    coarse-route shuffle + one vectorized polars agg per route (not one
    Python call per user)."""
    from ..ops.windows import grouped_stats

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type", "value"],
    )
    return grouped_stats(
        ds, "user_id",
        [
            pl.len().cast(pl.Int64).alias("n_events"),
            pl.col("event_type").n_unique().cast(pl.Int64).alias("n_types"),
            pl.col("value").max().alias("max_value"),
        ],
    )


def events_topk(sf_dir: str):
    """Top-3 events by value per type — the per-host top-k/refill
    pattern (VisitState.pathQueryLimit, VisitState.java:396-419)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "value"],
    )

    def topk(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group).sort(
            ["value", "event_id"], descending=[True, False]
        ).head(3)
        return pa.table(
            {
                "event_type": df["event_type"].to_arrow(),
                "event_id": df["event_id"].to_arrow(),
                "rnk": pa.array(np.arange(1, len(df) + 1, dtype=np.int64)),
            }
        )

    return ds.groupby("event_type").map_groups(topk, batch_format="pyarrow")


def spam_scores(sf_dir: str):
    """Spam term counting + actor-pool scoring per source (the
    SpamTextProcessor/SpamDetector pipeline, §2.2/§2.3)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "text"]
    )
    return spam.spam_scores(ds, key="source")


def events_value_hist(sf_dir: str):
    """log2 bucket histogram of events.value (the speedDist analogue)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["value"]
    )
    return stats.log2_histogram(ds, "value")


def lineitem_agg(sf_dir: str):
    """Wide grouped aggregation (partial-combine) over lineitem."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )
    return stats.grouped_agg(ds, ["l_returnflag", "l_linestatus"], "l_quantity")


# ------------------------------------------------- crawl-component queries

def _dirty_urls(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_numpy()
    dirty = [f"HTTP://HOST{d}.EXAMPLE.:80/p a/{d}%2f?x=1#f" for d in ids]
    return pa.table(
        {"doc_id": batch.column("doc_id"), "dirty": pa.array(dirty, pa.string())}
    )


def canonicalize(sf_dir: str):
    """BURL canonicalization (util/BURL.java:97-254) over constructed
    dirty URLs: case-folds scheme/host, strips trailing host dot and
    default port, %-encodes the space, uppercases hex escapes, drops
    the fragment — each rule SQL-checkable by construction."""
    ds = _docs(sf_dir).map_batches(_dirty_urls, batch_format="pyarrow")

    def canon(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "url": burl.canonicalize_batch(batch.column("dirty")),
            }
        )

    return ds.map_batches(canon, batch_format="pyarrow")


ROBOTS_FIXTURE = b"User-agent: *\nDisallow: /priv/\nDisallow: /tmp*\n"
_ROBOTS_PATHS = ["/priv/a", "/p/x", "/private", "/tmp/z", "/"]


def robots_gate(sf_dir: str):
    """robots.txt parse + prefix gate (util/URLRespectsRobots.java) over
    constructed paths; returns the allowed rows."""
    prefixes = robots.parse_robots(ROBOTS_FIXTURE)

    def gate(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        paths = [_ROBOTS_PATHS[d % 5] for d in ids]
        ok = robots.allowed_batch(prefixes, paths)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "path": pa.array(paths, pa.string()),
            }
        ).filter(pa.array(ok))

    return _docs(sf_dir).map_batches(gate, batch_format="pyarrow")


def url_dedup_first(sf_dir: str):
    """Exact URL-seen via the real sharded sieve actors
    (sieve/MercatorSieve.java semantics: first-enqueue wins, emission
    in enqueue order): constructed duplicate-heavy URLs from doc_ids."""
    tbl = _collect(_docs(sf_dir).select_columns(["doc_id"]))
    ids = tbl.column("doc_id").to_numpy()
    urls = pa.array(
        [f"http://h{d % 50}.example/p/{d % 100}" for d in ids], pa.string()
    )
    cand = pa.table(
        {
            "url": urls,
            "url_hash": pa.array(hash64(urls), pa.uint64()),
            "seq": pa.array(ids.astype(np.int64)),
            "ip": pa.array(np.zeros(len(ids), np.uint32)),
        }
    )
    svc = SieveService(4)
    try:
        fresh = svc.check_and_add(cand)
        return pa.table(
            {
                "url": fresh.column("url"),
                "first_seq": fresh.column("seq"),
            }
        )
    finally:
        for sh in svc.shards:
            ray.kill(sh)


def filter_atoms(sf_dir: str):
    """Composite filter over a constructed pages table — vectorized
    atoms from warc/filters/ (StatusCategory & ContentTypeStartsWith &
    PathEndsWithOneOf)."""

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "url": pa.array(
                    [
                        f"http://h{d % 7}.example/f/{d}"
                        + (".html" if d % 2 else ".jpg")
                        for d in ids
                    ]
                ),
                "status": pa.array(
                    np.where(ids % 5 != 0, 200, 404).astype(np.int32)
                ),
                "content_type": pa.array(
                    ["text/html" if d % 3 else "image/png" for d in ids]
                ),
            }
        )

    pred = (
        filters.StatusCategory(2)
        & filters.ContentTypeStartsWith("text/")
        & filters.PathEndsWithOneOf([".html"])
    )
    ds = _docs(sf_dir).map_batches(mk, batch_format="pyarrow")
    return filters.apply_filter(ds, pred).select_columns(["doc_id"])


def _textio_fixture(sf_dir: str, kind: str) -> str:
    """documents.parquet -> /tmp JSONL or CSV shard directory, written
    once per (sf, kind) with the warc_ingest fixture idiom (unique tmp
    dir + atomic rename, so concurrent query processes race safely)."""
    base = os.path.basename(sf_dir.rstrip("/"))
    out = f"/tmp/bubing_textio/{base}_{kind}"
    if not os.path.isdir(out):
        import pyarrow.parquet as pq

        df = pl.from_arrow(
            pq.read_table(os.path.join(sf_dir, "documents.parquet"))
        )
        tmp = f"{out}.tmp{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        n_shards = 4
        step = (df.height + n_shards - 1) // n_shards
        for i in range(n_shards):
            part = df.slice(i * step, step)
            if kind == "jsonl":
                part.write_ndjson(os.path.join(tmp, f"part-{i:02d}.json"))
            else:
                part.write_csv(os.path.join(tmp, f"part-{i:02d}.csv"))
        try:
            os.rename(tmp, out)
        except OSError:
            if not os.path.isdir(out):  # lost the race AND no winner
                raise
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return out


def jsonl_ingest(sf_dir: str):
    """JSONL corpus ingestion round-trip (the Dolma/RedPajama-style
    ndjson shard layout): documents -> ndjson shards -> streaming
    ``sources.textio.read_jsonl`` -> (doc_id, source, n_chars) with
    n_chars RECOMPUTED from the decoded text, so the oracle row (the
    source documents view) is value-exact only if every document
    survived the round trip character-for-character."""
    import pyarrow.compute as pc

    from ..sources import textio

    fix = _textio_fixture(sf_dir, "jsonl")
    ds = textio.read_jsonl(fix, columns=["doc_id", "source", "text"])

    def project(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "source": b.column("source"),
            "n_chars": pc.cast(pc.utf8_length(b.column("text")), pa.int64()),
        })

    return ds.map_batches(project, batch_format="pyarrow")


def csv_ingest(sf_dir: str):
    """CSV ingestion round-trip with quoted-newline text fields:
    documents -> CSV shards -> ``sources.textio.read_csv_text``
    (newlines_in_values on) -> (doc_id, lang, n_chars recomputed from
    the decoded text); oracle = the source documents view."""
    import pyarrow.compute as pc

    from ..sources import textio

    fix = _textio_fixture(sf_dir, "csv")
    ds = textio.read_csv_text(fix, columns=["doc_id", "lang", "text"])

    def project(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "lang": b.column("lang"),
            "n_chars": pc.cast(pc.utf8_length(b.column("text")), pa.int64()),
        })

    return ds.map_batches(project, batch_format="pyarrow")


def warc_ingest(sf_dir: str):
    """WARC ingestion round-trip (WarcReader/CompressedWarcReader
    semantics, warc/io/WarcReader.java:1): synthetic web pages ->
    .warc.gz fixture (one gzip member per record, RandomReadWritesTest
    write-then-read shape) -> read_warc streaming Datasource ->
    (url, status, n_bytes); the oracle compares against the source
    pages table the fixture was written from."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from ..sources.warc import read_warc, write_warc

    pages_dir, n_hosts, _ = synthetic_web(sf_dir)
    fixture = f"/tmp/bubing_warc/web_{n_hosts}x50.warc.gz"
    if not os.path.exists(fixture):
        os.makedirs(os.path.dirname(fixture), exist_ok=True)

        def _rows():
            # stream per record batch: the html column is the whole
            # synthetic web's body weight — never driver-resident at once
            for rb in pads.dataset(pages_dir).to_batches(
                columns=["url", "warc_ts", "html", "status",
                         "content_type", "location"],
                batch_size=2048,
            ):
                t = pa.Table.from_batches([rb])
                t = t.filter(pc.greater(t.column("status"), 0))
                cols = t.column_names
                lists = [t.column(c).to_pylist() for c in cols]
                yield from (dict(zip(cols, vals)) for vals in zip(*lists))

        # pid-unique tmp + atomic rename (the _textio_fixture idiom):
        # concurrent query processes must not interleave writes into a
        # shared '.tmp' inode or observe a half-written fixture
        tmp = f"{fixture}.tmp{os.getpid()}"
        write_warc(_rows(), tmp, compress=True)
        try:
            os.rename(tmp, fixture)
        except OSError:
            if not os.path.exists(fixture):  # lost the race AND no winner
                raise
            os.unlink(tmp)

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": b.column("url"),
                "status": b.column("status"),
                "n_bytes": pc.cast(pc.binary_length(b.column("html")), pa.int64()),
            }
        )

    return read_warc(fixture).map_batches(project, batch_format="pyarrow")


# ----------------------------------------------------------- crawl queries

def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.001


def synthetic_web(sf_dir: str, out_root: str = "/tmp/bubing_web") -> tuple[str, int, int]:
    """Deterministic pages table sized by sf (cached per size).

    Small webs are generated driver-side with plain pyarrow — the
    oracle SQL path (``__ray_entry__.oracle_sql``) must be able to
    materialize them before a Ray session exists."""
    sf = _sf_of(sf_dir)
    n_hosts = max(10, int(200 * sf * 10))
    pages_per_host = 50
    out = os.path.join(out_root, f"web_{n_hosts}x{pages_per_host}")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        # generate into a pid-unique dir, then one atomic rename: two
        # concurrent query processes would otherwise both write into
        # `out` (doubling every page row on the Ray path) or expose a
        # half-written part file to the winner's readers
        tmp = f"{out}.tmp{os.getpid()}"
        total = n_hosts * pages_per_host + n_hosts
        # driver-side only for the tiny driver-oracle webs (sf<=0.01);
        # anything bigger generates Ray-parallel into multiple files
        if total <= 2_000:
            import numpy as _np
            import pyarrow.parquet as _pq

            from ..pages import generate_table

            os.makedirs(tmp, exist_ok=True)
            _pq.write_table(
                generate_table(_np.arange(total), n_hosts, pages_per_host, 8, 0),
                os.path.join(tmp, "part-0.parquet"),
            )
        else:
            from ..pages import write_pages

            write_pages(tmp, n_hosts=n_hosts, pages_per_host=pages_per_host,
                        out_degree=8, seed=0)
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
        try:
            os.rename(tmp, out)
        except OSError:
            import shutil

            if os.path.exists(os.path.join(out, "_SUCCESS")):
                shutil.rmtree(tmp, ignore_errors=True)  # lost to a winner
            else:
                # a stale marker-less dir (crashed pre-rename run of an
                # older layout) blocks the rename: clear it and retry
                shutil.rmtree(out, ignore_errors=True)
                os.rename(tmp, out)
    return out, n_hosts, pages_per_host


def web_oracle(sf_dir: str, out_root: str = "/tmp/bubing_web"):
    """Synthetic web + its analytic oracle tables (meta/ + edges/).

    Returns (pages_dir, oracle_dir, n_hosts, pages_per_host).  The
    oracle tables are derived from the generator's closed form
    (pages.oracle_tables), NOT by running the crawl or the parser, so
    the driver-visible SQL checks on crawl_store / extract_text /
    link_graph_indegree compare two independent derivations."""
    from ..pages import write_oracle

    out, n_hosts, pph = synthetic_web(sf_dir, out_root)
    odir = out + "_oracle"
    write_oracle(odir, n_hosts, pph)
    return out, odir, n_hosts, pph


def crawl_store(sf_dir: str):
    """Flagship end-to-end crawl over the deterministic synthetic web —
    frontier + sieve + politeness + robots + parse + content-dedup —
    returning the store (url, status, digest64, is_duplicate, text)
    sorted by url. Crawl ordering + URL-seen equivalence vs the
    sequential reference model is pytest-verified (test_crawl_e2e)."""
    from ..frontier.crawl import CrawlConfig, Crawler
    from ..pages import seeds_for

    pages_dir, n_hosts, _ = synthetic_web(sf_dir)
    store_dir = f"/tmp/bubing_store_q_{n_hosts}"
    import shutil

    shutil.rmtree(store_dir, ignore_errors=True)
    # the robots side-store must be cleared with the store: round count
    # and part indices are timing-dependent, so a rerun that produces
    # fewer rounds would otherwise leave stale parts from the prior run
    # in the union read by robots_store()
    shutil.rmtree(store_dir + "_robots", ignore_errors=True)
    cfg = CrawlConfig(
        pages_dir=pages_dir,
        store_dir=store_dir,
        seeds=seeds_for(n_hosts, n_seeds=min(8, n_hosts)),
        sa_delay_ms=200,
        ip_delay_ms=100,
        round_ms=200,
        keepalive=8,
        retry_quantum_ms=60_000,
        store_html=False,
        robots_store_dir=store_dir + "_robots",
    )
    c = Crawler(cfg)
    c.add_seeds(cfg.seeds)
    c.run()
    c.shutdown()
    # completion marker: dependent queries (crawl_store_full, robots_store,
    # training_corpus, ...) must not trust a bare directory — a crawl
    # killed mid-run leaves a partial store that would silently feed them
    open(os.path.join(store_dir, "_CRAWL_OK"), "w").close()
    # driver-oracle surface: (url, status, text) — SQL-checkable against
    # the analytic reachability oracle (web_oracle meta/edges).  The
    # dup-flag/digest columns depend on crawl order and stay in
    # crawl_store_full (rows-only + pytest model-equivalence).
    ds = ray.data.read_parquet(store_dir, columns=["url", "status", "text"])
    return ds.sort("url")


# blacklist_gate rule: hosts with number % MOD == RESIDUE are
# blacklisted from the start (deterministic, SQL-replayable)
BLACKLIST_MOD, BLACKLIST_RESIDUE = 7, 3


def blacklist_gate(sf_dir: str):
    """Crawl with a static host blacklist (host number % 7 == 3): the
    absorb gate drops blacklisted URLs before they ever reach the
    workbench, so their pages are never fetched and their outlinks are
    never followed (FetchingThread.java:312-336 check;
    RuntimeConfiguration.java:150-156 sets).  Oracle: the crawl_store
    reachability CTE with blacklisted hosts removed from both the edge
    expansion and the final store."""
    from ..frontier.crawl import CrawlConfig, Crawler
    from ..pages import host_name, seeds_for

    pages_dir, n_hosts, _ = synthetic_web(sf_dir)
    store_dir = f"/tmp/bubing_store_bl_{n_hosts}"
    import shutil

    shutil.rmtree(store_dir, ignore_errors=True)
    cfg = CrawlConfig(
        pages_dir=pages_dir,
        store_dir=store_dir,
        seeds=seeds_for(n_hosts, n_seeds=min(8, n_hosts)),
        sa_delay_ms=200,
        ip_delay_ms=100,
        round_ms=200,
        keepalive=8,
        retry_quantum_ms=60_000,
        store_html=False,
        blacklist_hosts=tuple(
            host_name(h) for h in range(n_hosts)
            if h % BLACKLIST_MOD == BLACKLIST_RESIDUE
        ),
    )
    c = Crawler(cfg)
    c.add_seeds(cfg.seeds)
    c.run()
    c.shutdown()
    ds = ray.data.read_parquet(store_dir, columns=["url", "status", "text"])
    return ds.sort("url")


def crawl_store_full(sf_dir: str):
    """Full store schema (url, status, digest64, is_duplicate, text) —
    the flagship output with content-dedup flags; ordering-dependent
    columns make this rows-only at the driver (pytest asserts the
    sequential-model equivalence)."""
    _, n_hosts, _ = synthetic_web(sf_dir)
    store_dir = f"/tmp/bubing_store_q_{n_hosts}"
    if not os.path.exists(os.path.join(store_dir, "_CRAWL_OK")):
        crawl_store(sf_dir)
    ds = ray.data.read_parquet(
        store_dir, columns=["url", "status", "digest64", "is_duplicate", "text"]
    )
    return ds.sort("url")


def crawl_store_canon(sf_dir: str):
    """Canonical-order duplicate flags over the crawl store:
    ``is_duplicate_canon`` = this row's fetch_seq is not the minimum
    for its digest64.  Unlike the engine's first-copy-wins flag (which
    depends on parse-completion order and stays rows-only), the
    canonical rule is a pure function of the store's own
    (digest64, fetch_seq), so a SQL oracle can replay it from the same
    parquet — oracle coverage for the dup-flag derivation and the
    store's digest/seq integrity (round-3 VERDICT optional item).
    Route-by-digest + one vectorized window per route, the
    ``store_tools.graph_map`` pattern."""
    from ..hashing import derive_routes

    _, n_hosts, _ = synthetic_web(sf_dir)
    store_dir = f"/tmp/bubing_store_q_{n_hosts}"
    if not os.path.exists(os.path.join(store_dir, "_CRAWL_OK")):
        crawl_store(sf_dir)
    ds = ray.data.read_parquet(
        store_dir, columns=["url", "digest64", "fetch_seq"])
    nr = derive_routes(ds)

    def route(b: pa.Table) -> pa.Table:
        d = b.column("digest64").to_numpy().astype(np.int64).view(np.uint64)
        return b.append_column(
            "route", pa.array((d % np.uint64(nr)).astype(np.int64)))

    def flag(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g)
        return (df.with_columns(
                    (pl.col("fetch_seq")
                     != pl.col("fetch_seq").min().over("digest64"))
                    .alias("is_duplicate_canon"))
                .select(["url", "fetch_seq", "is_duplicate_canon"])
                .to_arrow())

    return (ds.map_batches(route, batch_format="pyarrow")
            .groupby("route")
            .map_groups(flag, batch_format="pyarrow")
            .sort("url"))


CORPUS_MIN_WORDS = 20
CORPUS_MIN_STOP = 0  # synthetic vocab carries no English stopwords


def corpus_from_store(store_dir: str, min_words: int, min_stop: int):
    """Store -> training corpus: 200-status pages -> Gopher-style
    quality gate -> broadcast-free exact keep-first dedup -> (url,
    text).  Shared by the training_corpus query and the CLI ``corpus``
    subcommand."""
    import functools

    import pyarrow.compute as pc

    from ..ops import text as text_ops

    ds = ray.data.read_parquet(store_dir, columns=["url", "status", "text"])

    def gate(b: pa.Table, min_words: int, min_stop: int) -> pa.Table:
        b = b.filter(pc.equal(b.column("status"), 200))
        if b.num_rows == 0:
            return b.select(["url", "text"])
        q = text_ops.gopher_quality_batch(
            b, id_col="url", min_words=min_words, min_stop=min_stop
        )
        return b.filter(q.column("keep")).select(["url", "text"])

    gated = ds.map_batches(
        functools.partial(gate, min_words=min_words, min_stop=min_stop),
        batch_format="pyarrow",
    )
    return dedup.exact_dedup(gated, key="text", id_col="url")


def training_corpus(sf_dir: str):
    """End-to-end training-corpus composition — the flagship pipeline a
    training-data user runs: crawl -> store -> 200-status pages ->
    Gopher-style quality gate -> exact keep-first dedup -> (url, text).
    Every stage streams; the whole chain is oracle-checked (reachability
    ∧ quality rules ∧ group-min dedup in one SQL)."""
    _, n_hosts, _ = synthetic_web(sf_dir)
    store_dir = f"/tmp/bubing_store_q_{n_hosts}"
    if not os.path.exists(os.path.join(store_dir, "_CRAWL_OK")):
        crawl_store(sf_dir)
    return corpus_from_store(
        store_dir, CORPUS_MIN_WORDS, CORPUS_MIN_STOP
    ).sort("url")


def robots_store(sf_dir: str):
    """The robots side-store (the robots.warc.gz analogue,
    Frontier.java:201-203): one row per robots.txt fetch of the crawl —
    every host holding a reachable URL fetches robots exactly once
    before any page (within TTL), so (url, status) is oracle-checkable
    from the reachability CTE."""
    _, n_hosts, _ = synthetic_web(sf_dir)
    store_dir = f"/tmp/bubing_store_q_{n_hosts}"
    rdir = store_dir + "_robots"
    if not os.path.exists(os.path.join(store_dir, "_CRAWL_OK")):
        crawl_store(sf_dir)
    ds = ray.data.read_parquet(rdir, columns=["url", "status"])
    return ds.sort("url")


def link_graph_indegree(sf_dir: str):
    """Link-graph in-degree per host over the synthetic web (link
    extraction -> host aggregation)."""
    from ..ops.graph import host_indegree, link_edges

    pages_dir, _, _ = synthetic_web(sf_dir)
    ds = ray.data.read_parquet(pages_dir, columns=list(PARSE_COLS))
    return host_indegree(link_edges(ds))


def host_link_weights(sf_dir: str):
    """Weighted host graph: (src_host, dst_host, weight) aggregated
    from per-page links (partial-combined before the shuffle)."""
    from ..ops.graph import host_edges, link_edges

    pages_dir, _, _ = synthetic_web(sf_dir)
    ds = ray.data.read_parquet(pages_dir, columns=list(PARSE_COLS))
    return host_edges(link_edges(ds))


def anchor_topk(sf_dir: str):
    """Anchor-text corpus: top-3 anchor strings per destination URL by
    observation count over the synthetic web's <a> tags (vectorized
    regex extraction + real BURL href resolution; one distinct-pair
    shuffle).  Oracle: the closed-form anchors table (web_oracle) —
    an independent derivation from the generator, not the extractor."""
    from ..ops.graph import anchor_topk as _anchor_topk

    pages_dir, _, _ = synthetic_web(sf_dir)
    ds = ray.data.read_parquet(pages_dir, columns=["url", "html"])
    return _anchor_topk(ds, k=3)


def host_components(sf_dir: str):
    """Connected components of the undirected host link graph —
    distributed min-label propagation to the exact fixpoint."""
    from ..ops.graph import connected_components, host_edges, link_edges

    pages_dir, _, _ = synthetic_web(sf_dir)
    ds = ray.data.read_parquet(pages_dir, columns=list(PARSE_COLS))
    return connected_components(host_edges(link_edges(ds)))


def page_pagerank(sf_dir: str):
    """PAGE-level PageRank, fully distributed (iterated reduce-side
    exchanges keyed by url hash) — the scale path host_pagerank's
    driver loop documents; iterative, so rows-only at the driver
    (pytest asserts exact parity with a sequential numpy reference)."""
    from ..ops.graph import link_edges
    from ..ops.graph import page_pagerank as _ppr

    pages_dir, _, _ = synthetic_web(sf_dir)
    ds = ray.data.read_parquet(pages_dir, columns=list(PARSE_COLS))
    return _ppr(link_edges(ds), iters=2)


def host_pagerank(sf_dir: str):
    """Host-level PageRank (iterative; rows-only check)."""
    from ..ops.graph import host_pagerank as _pr
    from ..ops.graph import link_edges

    pages_dir, _, _ = synthetic_web(sf_dir)
    ds = ray.data.read_parquet(pages_dir, columns=list(PARSE_COLS))
    return _pr(link_edges(ds))


def host_cocitation(sf_dir: str):
    """Host co-citation pairs (distinct sources citing both), with the
    documented out-degree skew guard mirrored in the SQL oracle."""
    from ..ops.graph import host_cocitation as _cc
    from ..ops.graph import link_edges

    pages_dir, _, _ = synthetic_web(sf_dir)
    ds = ray.data.read_parquet(pages_dir, columns=list(PARSE_COLS))
    return _cc(link_edges(ds))


def random_walks(sf_dir: str):
    """Deterministic DeepWalk-style walk corpus over the page link
    graph — iterated routed exchanges; integer walk selector unrolls
    exactly in SQL (adjacency row_number + per-byte URL seeds)."""
    from ..ops.graph import link_edges
    from ..ops.graph import random_walks as _rw

    pages_dir, _, _ = synthetic_web(sf_dir)
    ds = ray.data.read_parquet(pages_dir, columns=list(PARSE_COLS))
    return _rw(link_edges(ds), length=3)


def host_triangles(sf_dir: str):
    """Per-host triangle counts on the undirected host graph
    (center-guarded wedge enumeration, guard mirrored in SQL)."""
    from ..ops.graph import host_triangles as _tri
    from ..ops.graph import link_edges

    pages_dir, _, _ = synthetic_web(sf_dir)
    ds = ray.data.read_parquet(pages_dir, columns=list(PARSE_COLS))
    return _tri(link_edges(ds))


def host_reciprocity(sf_dir: str):
    """Per-host link reciprocity over distinct host pairs (unordered
    pair co-routing; exact basis points)."""
    from ..ops.graph import host_reciprocity as _rec
    from ..ops.graph import link_edges

    pages_dir, _, _ = synthetic_web(sf_dir)
    ds = ray.data.read_parquet(pages_dir, columns=list(PARSE_COLS))
    return _rec(link_edges(ds))


def hits_scores(sf_dir: str):
    """PAGE-level HITS hubs/authorities, fully distributed (iterated
    reduce-side exchanges keyed by url hash) — int64 fixed-point with
    driver-scalar L1 normalization, so the 2 iterations unroll exactly
    in SQL (HUGEINT) over the generator's closed-form edge list."""
    from ..ops.graph import hits_scores as _hits
    from ..ops.graph import link_edges

    pages_dir, _, _ = synthetic_web(sf_dir)
    ds = ray.data.read_parquet(pages_dir, columns=list(PARSE_COLS))
    return _hits(link_edges(ds), iters=2)


# parse-pipeline reads carry ONLY what the parser consumes — the
# synthetic table's oracle `text` and `lang` columns must not ride
# through the scan (at 100 TB an unpruned wide-binary scan is a
# first-order cost)
PARSE_COLS = ("url", "html", "status", "content_type", "location")

# the synthetic web's HTML content types (robots rows are text/plain,
# error rows NULL — both outside the parse surface)
HTML_CTYPES = ("text/html", "text/html; charset=utf-8")


def extract_text(sf_dir: str):
    """Streaming parse stage alone: read pages (pruned to the parser's
    input columns, HTML rows only via a pushed-down row filter) →
    ParseHTMLBatch → (url, text). The text is byte-identical to the
    generator's analytic expected text — the driver oracle reads that
    column straight from the pages parquet while this pipeline
    recomputes it from the raw HTML through the real parser."""
    import pyarrow.dataset as pads

    from ..html_parser import ParseHTMLBatch

    pages_dir, _, _ = synthetic_web(sf_dir)
    ds = ray.data.read_parquet(
        pages_dir,
        columns=list(PARSE_COLS),
        filter=pads.field("content_type").isin(list(HTML_CTYPES)),
    )
    # autoscaling pool (1..8): a fixed concurrency equal to the CPU
    # budget deadlocks actor creation on small ray.init sessions
    parsed = ds.map_batches(
        ParseHTMLBatch, batch_format="pyarrow", concurrency=(1, 8), batch_size=512
    )
    return parsed.select_columns(["url", "text"])
