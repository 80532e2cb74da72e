"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship crawl pipeline; ``queries()`` exposes one
callable per implemented operator/pipeline (SURVEY.md §2 + the
training-data extensions); ``oracle_sql()`` gives the DuckDB-equivalent
SQL for every SQL-expressible query (same column names, so the driver's
order-insensitive value-hash compare passes on exact equality).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in bubing_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from bubing_ray.ops import text as text_mod
from bubing_ray.ops.spam import SPAM_TERMS
from bubing_ray.ops.text import BPE_PATTERN, LANG_MARKERS, LANG_ORDER, STOPWORDS
from bubing_ray.pipelines import queries as Q

SF0 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: deterministic synthetic web -> full crawl (frontier,
    sieve dedup, politeness, robots, parse, content dedup) -> store ->
    quality gate -> exact dedup -> training corpus (url, text)."""
    return Q.training_corpus(SF0)


def queries() -> dict[str, Callable[[str], Any]]:
    # The driver sweeps in dict order and caps at 50 queries per round.
    # Rotation policy (round 5): every query WITHOUT a CORRECTNESS_r04
    # row (the 7 never-checked + the 26 last checked in r3) is listed
    # inside the cap, padded with north-rule-core r4-green rows, so no
    # registered query goes more than two rounds without a driver row.
    return {
        # -- never driver-checked before round 5 (VERDICT r4 "missing" #3)
        "strip_dup_spans": Q.strip_dup_spans,
        "bpe_merges": Q.bpe_merges,
        "bpe_encode_counts": Q.bpe_encode_counts,
        "collocations": Q.collocations,
        "ngram_topk": Q.ngram_topk,
        "dsir_weights": Q.dsir_weights,
        # (semdedup moved below the cap: its driver row is rows-only by
        # design, while its value-exact twin semdedup_fixed stays here —
        # the freed slot keeps the north-rule crawl_store driver-green)
        "semdedup_fixed": Q.semdedup_fixed,  # NEW r5: value-exact sibling
        # -- last driver row in r3 (displaced by the r4 rotation)
        "corpus_compose": Q.corpus_compose,
        "lang_id": Q.lang_id,
        "lang_id_ngram": Q.lang_id_ngram,
        "fingerprints": Q.fingerprints,
        "quality_filter": Q.quality_filter,
        "lm_familiarity": Q.lm_familiarity,
        "bpe_pairs": Q.bpe_pairs,
        "exact_dedup": Q.exact_dedup,
        "ngram_jaccard": Q.ngram_jaccard,
        "minhash_pairs": Q.minhash_pairs,
        "minhash_dedup": Q.minhash_dedup,
        "dup_spans": Q.dup_spans,
        "simhash_sigs": Q.simhash_sigs,
        "simhash_neardup": Q.simhash_neardup,
        "embedding_neardup": Q.embedding_neardup,
        "tfidf_search": Q.tfidf_search,
        "ann_topk": Q.ann_topk,
        "sessionize_events": Q.sessionize_events,
        "session_stats": Q.session_stats,
        "multimodal_meta": Q.multimodal_meta,
        "multimodal_resize": Q.multimodal_resize,
        "multimodal_frames": Q.multimodal_frames,
        # (crawl_store_full moved below the cap: rows-only by design —
        # its order-dependent flags have no oracle, while the canonical
        # value-exact variant crawl_store_canon stays in-cap)
        "embedding_neardup_lsh": Q.embedding_neardup_lsh,  # rows-only (approx)
        "ann_lsh": Q.ann_lsh,  # rows-only (approx)
        "ann_ivf": Q.ann_ivf,  # rows-only (approx)
        "knn_graph": Q.knn_graph,
        # -- new in round 5
        "blacklist_gate": Q.blacklist_gate,
        "jsonl_ingest": Q.jsonl_ingest,
        "csv_ingest": Q.csv_ingest,
        "chunk_docs": Q.chunk_docs,
        "dedup_keep_best": Q.dedup_keep_best,
        "anchor_topk": Q.anchor_topk,
        "lang_token_cap": Q.lang_token_cap,
        "sample_n": Q.sample_n,
        "hits_scores": Q.hits_scores,
        "host_cocitation": Q.host_cocitation,
        "host_triangles": Q.host_triangles,
        "host_reciprocity": Q.host_reciprocity,
        "random_walks": Q.random_walks,
        "funnel_stages": Q.funnel_stages,
        "cohort_retention": Q.cohort_retention,
        "store_diff": Q.store_diff,
        # -- r4-green padding to the cap: north-rule core, re-proven each round
        "crawl_store": Q.crawl_store,
        "semdedup": Q.semdedup,  # honest rows-only (float k-means)
        "crawl_store_full": Q.crawl_store_full,  # rows-only (order-dep flags)
        "crawl_store_canon": Q.crawl_store_canon,
        "robots_store": Q.robots_store,
        "training_corpus": Q.training_corpus,
        "warc_ingest": Q.warc_ingest,
        "extract_text": Q.extract_text,
        "canonicalize": Q.canonicalize,
        "robots_gate": Q.robots_gate,
        # ---------------- driver cap (50) falls here ----------------
        "url_dedup_first": Q.url_dedup_first,
        "filter_atoms": Q.filter_atoms,
        "spam_scores": Q.spam_scores,
        "orders_by_nation": Q.orders_by_nation,
        "bm25_search": Q.bm25_search,
        # everything below is r4-green (CORRECTNESS_r04.json) and keeps
        # its oracle for local sweeps + future rotations.
        "decontaminate_fuzzy": Q.decontaminate_fuzzy,
        "paragraph_dedup": Q.paragraph_dedup,
        "source_quality_gate": Q.source_quality_gate,
        "hll_users": Q.hll_users,
        "cm_events": Q.cm_events,
        "events_value_hist": Q.events_value_hist,
        "lineitem_agg": Q.lineitem_agg,
        "lineitem_quantiles": Q.lineitem_quantiles,
        "lineitem_quantiles_by_flag": Q.lineitem_quantiles_by_flag,
        "events_type_user_hll": Q.events_type_user_hll,
        "multimodal_features": Q.multimodal_features,
        "familiarity_buckets": Q.familiarity_buckets,
        "events_last_purchase": Q.events_last_purchase,
        "purchase_window_stats": Q.purchase_window_stats,
        "events_hourly": Q.events_hourly,
        "events_sliding": Q.events_sliding,
        "events_running": Q.events_running,
        "customers_no_urgent": Q.customers_no_urgent,
        "customers_with_urgent": Q.customers_with_urgent,
        "text_normalize": Q.text_normalize,
        "link_graph_indegree": Q.link_graph_indegree,
        "host_link_weights": Q.host_link_weights,
        "host_pagerank": Q.host_pagerank,
        "host_components": Q.host_components,
        "page_pagerank": Q.page_pagerank,
        "source_stats": Q.source_stats,
        "events_user_stats": Q.events_user_stats,
        "events_topk": Q.events_topk,
        "text_quality": Q.text_quality,
        "stratified_sample": Q.stratified_sample,
        "source_cap": Q.source_cap,
        "decontaminate": Q.decontaminate,
        "docs_topk_by_source": Q.docs_topk_by_source,
        "docs_global_rank": Q.docs_global_rank,
        "pii_redact": Q.pii_redact,
        "token_pack": Q.token_pack,
        "repetition_stats": Q.repetition_stats,
    }


def _sql_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


def spam_sql_counts() -> str:
    return ",\n    ".join(
        f"len(list_filter(t, x -> x = '{t}')) AS c_{t}" for t in SPAM_TERMS
    )


def spam_sql_sums() -> str:
    # CAST: DuckDB sum() yields hugeint; the pipelines emit int64
    return ",\n  ".join(f"CAST(sum(c_{t}) AS BIGINT) AS n_{t}" for t in SPAM_TERMS)


def spam_sql_total() -> str:
    return " + ".join(f"sum(c_{t})" for t in SPAM_TERMS)


def _toks(expr: str = "text") -> str:
    return rf"list_filter(regexp_split_to_array({expr}, '\s+'), x -> x <> '')"


def _gopher_sql() -> str:
    """Gopher-gate SELECT (doc_id, per-rule integers, keep) — shared by
    the quality_filter and source_quality_gate oracles.  No trailing
    ORDER BY so it embeds as a CTE."""
    stop = _sql_list(STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id, text, {_toks()} AS t FROM documents
), c AS (
  SELECT doc_id,
    len(t) AS n_words,
    CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS n_word_chars,
    len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha_words,
    len(list_filter(t, x -> lower(x) IN ({stop}))) AS n_stop_hits,
    CAST(length(text) - length(replace(text, '#', ''))
      + (length(text) - length(replace(text, '...', ''))) // 3
      AS BIGINT) AS n_symbols
  FROM base
), r AS (
  SELECT doc_id, n_words,
    CAST(floor(100.0 * n_word_chars / greatest(n_words, 1)) AS BIGINT)
      AS mean_word_len_cp,
    CAST(floor(10000.0 * n_alpha_words / greatest(n_words, 1)) AS BIGINT)
      AS alpha_word_bp,
    n_stop_hits,
    CAST(floor(10000.0 * n_symbols / greatest(n_words, 1)) AS BIGINT)
      AS symbol_ratio_bp
  FROM c
)
SELECT doc_id, n_words, mean_word_len_cp, alpha_word_bp, n_stop_hits,
  symbol_ratio_bp,
  (n_words BETWEEN {text_mod.GOPHER_MIN_WORDS} AND {text_mod.GOPHER_MAX_WORDS}
   AND mean_word_len_cp BETWEEN {text_mod.GOPHER_MIN_MEAN_WORD_LEN_CP}
                            AND {text_mod.GOPHER_MAX_MEAN_WORD_LEN_CP}
   AND alpha_word_bp >= {text_mod.GOPHER_MIN_ALPHA_WORD_BP}
   AND n_stop_hits >= {text_mod.GOPHER_MIN_STOP_HITS}
   AND symbol_ratio_bp < {text_mod.GOPHER_MAX_SYMBOL_RATIO_BP}) AS keep
FROM r"""


#: byte-trigram LM chain (lowercase -> bytes -> trigram codes -> global
#: counts -> log2 buckets -> per-doc familiarity), shared by the
#: lm_familiarity and familiarity_buckets oracles.  Ends at CTE ``lsc``
#: (doc_id, n_tri, familiarity_bp).
_LM_CHAIN_SQL = """llt AS (
  SELECT doc_id, lower(text) AS t FROM documents
), lbt AS (
  SELECT doc_id, hex(encode(t)) AS hx,
         CAST(octet_length(encode(t)) AS INT) AS nb
  FROM llt
), lby AS (
  SELECT doc_id, i,
    CAST(16 * (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1)
       + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) AS BIGINT) AS b
  FROM lbt, unnest(range(1, nb + 1)) AS u(i)
), ltri AS (
  SELECT a.doc_id, a.b * 65536 + c2.b * 256 + c3.b AS code
  FROM lby a
  JOIN lby c2 ON c2.doc_id = a.doc_id AND c2.i = a.i + 1
  JOIN lby c3 ON c3.doc_id = a.doc_id AND c3.i = a.i + 2
), lg AS (
  SELECT code, CAST(count(*) AS BIGINT) AS c FROM ltri GROUP BY code
), lbk AS (
  SELECT code, least(strlen(bin(c)) - 1, 15) AS bucket FROM lg
), lsc AS (
  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tri,
         CAST((10000 * sum(k.bucket)) // (15 * count(*)) AS BIGINT)
           AS familiarity_bp
  FROM ltri t JOIN lbk k USING (code) GROUP BY t.doc_id
)"""


def _page_pr_sql(edges: str, iters: int = 2, d_pct: int = 85,
                 fp: int = 10**12, rank_scale: int = 10_000_000) -> str:
    """Unroll ``iters`` int64 fixed-point PageRank steps in SQL —
    arithmetic mirror of ``bubing_ray.ops.graph.page_pagerank`` (int
    sums are order-independent, so SQL == distributed engine exactly)."""
    ctes = [
        f"e AS (SELECT src, dst FROM {edges})",
        """n0 AS (
  SELECT url, CAST(sum(o) AS BIGINT) AS outd FROM (
    SELECT src AS url, 1 AS o FROM e
    UNION ALL
    SELECT dst AS url, 0 AS o FROM e
  ) GROUP BY url
)""",
        "c0 AS (SELECT count(*) AS n FROM n0)",
        f"""r0 AS (
  SELECT url, outd, CAST({fp} // (SELECT n FROM c0) AS BIGINT) AS rank
  FROM n0
)""",
    ]
    for i in range(iters):
        p, q = i, i + 1
        ctes.append(
            f"d{p} AS (SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dang "
            f"FROM r{p} WHERE outd = 0)"
        )
        ctes.append(
            f"""s{q} AS (
  SELECT e.dst AS url, CAST(sum(r.rank // r.outd) AS BIGINT) AS contrib
  FROM e JOIN r{p} r ON r.url = e.src GROUP BY e.dst
)"""
        )
        ctes.append(
            f"""r{q} AS (
  SELECT n.url, n.outd,
    CAST(({100 - d_pct} * {fp}) // (100 * (SELECT n FROM c0))
       + ({d_pct} * (SELECT dang FROM d{p})) // (100 * (SELECT n FROM c0))
       + ({d_pct} * coalesce(s.contrib, 0)) // 100 AS BIGINT) AS rank
  FROM n0 n LEFT JOIN s{q} s ON s.url = n.url
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT url, rank // {fp // rank_scale} AS rank_bp "
        f"FROM r{iters} ORDER BY url"
    )


def _hits_sql(edges: str, iters: int = 2, fp: int = 10**6) -> str:
    """Unroll ``iters`` int64 fixed-point HITS iterations in SQL —
    arithmetic mirror of ``bubing_ray.ops.graph.hits_scores`` (integer
    sums are order-independent; the L1 normalization's product rides a
    HUGEINT here and an exact quotient/remainder split in the engine,
    so both sides compute floor(raw * fp / total) bit-exactly)."""
    ctes = [
        f"e AS (SELECT src, dst FROM {edges})",
        """n0 AS (
  SELECT DISTINCT url FROM (
    SELECT src AS url FROM e UNION ALL SELECT dst AS url FROM e
  )
)""",
        "c0 AS (SELECT count(*) AS n FROM n0)",
        f"""h0 AS (
  SELECT url, CAST(greatest({fp} // (SELECT n FROM c0), 1) AS BIGINT) AS s
  FROM n0
)""",
    ]
    for i in range(iters):
        p, q = i, i + 1
        ctes.append(
            f"""ar{q} AS (
  SELECT e.dst AS url, CAST(sum(h.s) AS BIGINT) AS raw
  FROM e JOIN h{p} h ON h.url = e.src GROUP BY e.dst
)"""
        )
        ctes.append(
            f"""a{q} AS (
  SELECT url, CAST(CAST(raw AS HUGEINT) * {fp}
    // (SELECT CAST(sum(raw) AS HUGEINT) FROM ar{q}) AS BIGINT) AS s
  FROM ar{q}
)"""
        )
        ctes.append(
            f"""hr{q} AS (
  SELECT e.src AS url, CAST(sum(a.s) AS BIGINT) AS raw
  FROM e JOIN a{q} a ON a.url = e.dst GROUP BY e.src
)"""
        )
        ctes.append(
            f"""h{q} AS (
  SELECT url, CAST(CAST(raw AS HUGEINT) * {fp}
    // (SELECT CAST(sum(raw) AS HUGEINT) FROM hr{q}) AS BIGINT) AS s
  FROM hr{q}
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT n.url, coalesce(a.s, 0) AS auth_fp, coalesce(h.s, 0) AS hub_fp
FROM n0 n
LEFT JOIN a{iters} a ON a.url = n.url
LEFT JOIN h{iters} h ON h.url = n.url
ORDER BY n.url"""
    )


def _walks_sql(edges: str, length: int = 3, mix: int = 40503) -> str:
    """Unroll ``length`` deterministic walk steps in SQL — arithmetic
    mirror of ``bubing_ray.ops.graph.random_walks``: adjacency index =
    ``row_number() - 1`` over the distinct edge list ordered by dst,
    per-node seed = positional byte sum (the per-byte unnest idiom the
    LM-chain oracle uses; URLs are pure ASCII so ascii() == byte)."""
    ctes = [
        f"e0 AS (SELECT DISTINCT src AS u, dst FROM {edges})",
        """adj AS (
  SELECT u, dst,
    CAST(row_number() OVER (PARTITION BY u ORDER BY dst) - 1 AS BIGINT) AS i,
    CAST(count(*) OVER (PARTITION BY u) AS BIGINT) AS outd
  FROM e0
)""",
        """n0 AS (
  SELECT DISTINCT url FROM (
    SELECT u AS url FROM e0 UNION ALL SELECT dst AS url FROM e0
  )
)""",
        """sd0 AS (
  SELECT url,
    CAST(sum(ascii(substr(url, CAST(i AS INT), 1)) * i) AS BIGINT) AS sd
  FROM n0, unnest(range(1, strlen(url) + 1)) AS r(i)
  GROUP BY url
)""",
        """sd AS (
  -- LEFT JOIN + coalesce: a zero-length node key gets seed 0 (the
  -- engine's _url_seed_col semantics) instead of silently vanishing
  -- from the per-byte unnest
  SELECT n.url, coalesce(s.sd, 0) AS sd FROM n0 n
  LEFT JOIN sd0 s ON s.url = n.url
)""",
        """w0 AS (
  SELECT n.url AS start, s.sd AS sstart, n.url AS cur
  FROM n0 n JOIN sd s ON s.url = n.url
)""",
    ]
    for t in range(1, length + 1):
        ctes.append(
            f"""w{t} AS (
  SELECT w.start, w.sstart, a.dst AS cur
  FROM w{t - 1} w
  JOIN sd sc ON sc.url = w.cur
  JOIN adj a ON a.u = w.cur
   AND a.i = (w.sstart * 31 + sc.sd + {t} * {mix}) % a.outd
)"""
        )
    selects = [
        f"SELECT start, CAST({t} AS BIGINT) AS step, cur AS url FROM w{t}"
        for t in range(1, length + 1)
    ]
    return ("WITH " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL ".join(selects)
            + "\nORDER BY start, step")


def _web_sql() -> dict[str, str]:
    """Oracles over the deterministic synthetic web at the driver's
    comparison scale (sf0.01).  The web + its analytic oracle tables
    (meta/edges, derived from the generator's closed form — not from
    the crawl or the parser) are materialized driver-side on first call;
    idempotent, no Ray needed."""
    from bubing_ray.pages import seeds_for
    from bubing_ray.pipelines.queries import HTML_CTYPES, web_oracle

    web, odir, n_hosts, _ = web_oracle("/root/testdata/sf0.01")
    pages = f"'{web}/*.parquet'"
    meta = f"'{odir}/meta/*.parquet'"
    edges = f"'{odir}/edges/*.parquet'"
    anchors = f"'{odir}/anchors/*.parquet'"
    seed_values = ", ".join(
        f"('{u}')" for u in seeds_for(n_hosts, min(8, n_hosts))
    )
    ctypes = ", ".join(f"'{c}'" for c in HTML_CTYPES)
    return {
        # WARC fixture round-trip vs the source-of-truth pages table
        "warc_ingest": f"""
SELECT url, status, CAST(octet_length(html) AS BIGINT) AS n_bytes
FROM {pages} WHERE status > 0 ORDER BY url
""",
        # the parse stage recomputes text from raw HTML; the oracle reads
        # the generator's analytic expected text (HtmlParserTest-style
        # byte identity, surfaced at the driver)
        "extract_text": f"""
SELECT url, text FROM {pages}
WHERE content_type IN ({ctypes}) ORDER BY url
""",
        # distinct-source in-degree per host over the analytic edge list
        "link_graph_indegree": f"""
SELECT dst_host AS host, count(DISTINCT src_host) AS indegree
FROM {edges} GROUP BY dst_host ORDER BY host
""",
        "anchor_topk": f"""
WITH a AS (
  SELECT dst, anchor, count(*) AS cnt
  FROM {anchors} GROUP BY dst, anchor
), r AS (
  SELECT dst, anchor, cnt,
    row_number() OVER (PARTITION BY dst
                       ORDER BY cnt DESC, anchor ASC) AS rnk
  FROM a
)
SELECT dst, anchor, cnt, rnk FROM r WHERE rnk <= 3 ORDER BY dst, rnk
""",
        "host_components": f"""
WITH RECURSIVE e0 AS (
  SELECT DISTINCT src_host AS a, dst_host AS b FROM {edges}
), und AS (
  SELECT a, b FROM e0 UNION SELECT b, a FROM e0
), reach(x, y) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.x, e.b FROM reach r JOIN und e ON r.y = e.a
)
SELECT x AS node, least(x, min(y)) AS component
FROM reach GROUP BY x ORDER BY node
""",
        "host_link_weights": f"""
SELECT src_host, dst_host, count(*) AS weight
FROM {edges} GROUP BY src_host, dst_host ORDER BY src_host, dst_host
""",
        # host PageRank against the analytic host_pr table: the oracle's
        # graph comes from the generator's closed-form edge list, the
        # engine's from parsing HTML — identical deterministic rank
        # arithmetic (graph.pr_ranks) applied to both
        "host_pagerank": f"""
SELECT host, rank_bp FROM '{odir}/host_pr/*.parquet' ORDER BY host
""",
        # page-level PageRank: the engine's distributed iteration is
        # int64 fixed-point (graph.PR_FP, share = rank // outd, damping
        # 85 * x // 100) so its sums are order-independent and the 2
        # iterations unroll EXACTLY in SQL over the closed-form edge
        # list — a value-exact oracle for a distributed iterative op
        "page_pagerank": _page_pr_sql(edges, iters=2),
        # page-level HITS: same unrolled-fixed-point trick (HUGEINT
        # carries the L1-normalization product on the SQL side)
        "hits_scores": _hits_sql(edges, iters=2),
        # deterministic walk corpus: 3 steps unrolled (walk selector =
        # integer arithmetic over byte-sum seeds, exact on both sides)
        "random_walks": _walks_sql(edges, length=3),
        # co-citation with the engine's skew guard (out-degree <= 64)
        # and tail prune (cocite >= 2) mirrored exactly
        "host_cocitation": f"""
WITH e AS (SELECT DISTINCT src_host, dst_host FROM {edges}),
ok AS (SELECT src_host FROM e GROUP BY src_host HAVING count(*) <= 64),
p AS (
  SELECT x.dst_host AS host_a, y.dst_host AS host_b
  FROM e x
  JOIN e y ON x.src_host = y.src_host AND x.dst_host < y.dst_host
  JOIN ok o ON o.src_host = x.src_host
)
SELECT host_a, host_b, count(*) AS cocite
FROM p GROUP BY host_a, host_b HAVING count(*) >= 2
ORDER BY host_a, host_b
""",
        # per-host reciprocity: distinct directed pairs, back-edge via
        # self left-join, exact integer basis points
        "host_reciprocity": f"""
WITH d AS (
  SELECT DISTINCT src_host AS a, dst_host AS b FROM {edges}
  WHERE src_host <> dst_host
), r AS (
  SELECT d.a, d.b,
    CASE WHEN x.a IS NOT NULL THEN 1 ELSE 0 END AS rec
  FROM d LEFT JOIN d x ON x.a = d.b AND x.b = d.a
)
SELECT a AS host, CAST(count(*) AS BIGINT) AS n_out,
  CAST(sum(rec) AS BIGINT) AS n_recip,
  CAST((10000 * sum(rec)) // count(*) AS BIGINT) AS recip_bp
FROM r GROUP BY a ORDER BY host
""",
        # per-host triangle counts, wedge centers guarded at degree 64
        # (the engine's max_deg default, mirrored here)
        "host_triangles": f"""
WITH d AS (
  SELECT DISTINCT src_host AS a, dst_host AS b FROM {edges}
  WHERE src_host <> dst_host
), und AS (
  SELECT a, b FROM d UNION SELECT b, a FROM d
), ok AS (
  SELECT a FROM und GROUP BY a HAVING count(*) <= 64
), w AS (
  SELECT x.b AS x, y.b AS y, x.a AS c
  FROM und x
  JOIN und y ON x.a = y.a AND x.b < y.b
  JOIN ok o ON o.a = x.a
), ep AS (SELECT a, b FROM und WHERE a < b)
SELECT w.c AS host, CAST(count(*) AS BIGINT) AS triangles
FROM w JOIN ep ON ep.a = w.x AND ep.b = w.y
GROUP BY w.c ORDER BY host
""",
        # crawl reachability: seeds ∪ links of allowed fetched pages
        # (meta.allowed = not robots-blocked; edges already carry the
        # Location edge of a 301 and nothing for 404/error pages); the
        # store keeps reachable allowed pages whose fetch didn't error
        "crawl_store": f"""
WITH RECURSIVE fe AS (
  SELECT e.src AS src, e.dst AS dst
  FROM {edges} e JOIN {meta} m ON m.url = e.src
  WHERE m.allowed
), reach AS (
  SELECT url FROM (VALUES {seed_values}) s(url)
  UNION
  SELECT fe.dst FROM reach JOIN fe ON fe.src = reach.url
)
SELECT m.url, m.status, m.text
FROM {meta} m JOIN reach r ON m.url = r.url
WHERE m.allowed AND m.status <> 0
ORDER BY m.url
""",
        # crawl with a static host blacklist (host number % 7 == 3):
        # blacklisted hosts leave both the edge expansion (their links
        # are never followed) and the final store (never fetched)
        "blacklist_gate": f"""
WITH RECURSIVE fe AS (
  SELECT e.src AS src, e.dst AS dst
  FROM {edges} e JOIN {meta} m ON m.url = e.src
  WHERE m.allowed
    AND CAST(regexp_extract(m.host, 'host(\\d+)', 1) AS INT)
        % {Q.BLACKLIST_MOD} <> {Q.BLACKLIST_RESIDUE}
), reach AS (
  SELECT url FROM (VALUES {seed_values}) s(url)
  UNION
  SELECT fe.dst FROM reach JOIN fe ON fe.src = reach.url
)
SELECT m.url, m.status, m.text
FROM {meta} m JOIN reach r ON m.url = r.url
WHERE m.allowed AND m.status <> 0
  AND CAST(regexp_extract(m.host, 'host(\\d+)', 1) AS INT)
      % {Q.BLACKLIST_MOD} <> {Q.BLACKLIST_RESIDUE}
ORDER BY m.url
""",
        # crawl -> 200-status pages -> Gopher-style quality gate ->
        # group-min dedup: the full training-corpus composition in SQL
        "training_corpus": f"""
WITH RECURSIVE fe AS (
  SELECT e.src AS src, e.dst AS dst
  FROM {edges} e JOIN {meta} m ON m.url = e.src
  WHERE m.allowed
), reach AS (
  SELECT url FROM (VALUES {seed_values}) s(url)
  UNION
  SELECT fe.dst FROM reach JOIN fe ON fe.src = reach.url
), store AS (
  SELECT m.url, m.text FROM {meta} m JOIN reach r ON m.url = r.url
  WHERE m.allowed AND m.status = 200
), tok AS (
  SELECT url, text, {_toks()} AS t FROM store
), c AS (
  SELECT url, text,
    len(t) AS n_words,
    CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS n_word_chars,
    len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha_words,
    len(list_filter(t, x -> lower(x) IN ({_sql_list(STOPWORDS)}))) AS n_stop_hits,
    CAST(length(text) - length(replace(text, '#', ''))
      + (length(text) - length(replace(text, '...', ''))) // 3
      AS BIGINT) AS n_symbols
  FROM tok
), r AS (
  SELECT url, text, n_words,
    CAST(floor(100.0 * n_word_chars / greatest(n_words, 1)) AS BIGINT) AS mean_cp,
    CAST(floor(10000.0 * n_alpha_words / greatest(n_words, 1)) AS BIGINT) AS alpha_bp,
    n_stop_hits,
    CAST(floor(10000.0 * n_symbols / greatest(n_words, 1)) AS BIGINT) AS sym_bp
  FROM c
), kept AS (
  SELECT url, text FROM r
  WHERE n_words BETWEEN {Q.CORPUS_MIN_WORDS} AND {text_mod.GOPHER_MAX_WORDS}
    AND mean_cp BETWEEN {text_mod.GOPHER_MIN_MEAN_WORD_LEN_CP}
                    AND {text_mod.GOPHER_MAX_MEAN_WORD_LEN_CP}
    AND alpha_bp >= {text_mod.GOPHER_MIN_ALPHA_WORD_BP}
    AND n_stop_hits >= {Q.CORPUS_MIN_STOP}
    AND sym_bp < {text_mod.GOPHER_MAX_SYMBOL_RATIO_BP}
)
SELECT min(url) AS url, text FROM kept GROUP BY text ORDER BY url
""",
        # canonical-order dup flags: pure function of the store's own
        # (digest64, fetch_seq) — the oracle replays the group-min rule
        # from the same parquet the Ray query reads (the engine's
        # first-copy-wins flag stays rows-only in crawl_store_full)
        "crawl_store_canon": f"""
SELECT url, fetch_seq,
  fetch_seq <> min(fetch_seq) OVER (PARTITION BY digest64)
    AS is_duplicate_canon
FROM '/tmp/bubing_store_q_{n_hosts}/*/*.parquet'
ORDER BY url
""",
        # robots side-store: every host holding a reachable URL fetches
        # robots exactly once (hosts h with h % 5 == 0 serve one; the
        # rest 404 -> allow-all)
        "robots_store": f"""
WITH RECURSIVE fe AS (
  SELECT e.src AS src, e.dst AS dst
  FROM {edges} e JOIN {meta} m ON m.url = e.src
  WHERE m.allowed
), reach AS (
  SELECT url FROM (VALUES {seed_values}) s(url)
  UNION
  SELECT fe.dst FROM reach JOIN fe ON fe.src = reach.url
)
SELECT DISTINCT 'http://' || m.host || '/robots.txt' AS url,
  CASE WHEN CAST(regexp_extract(m.host, 'host(\\d+)', 1) AS INT) % 5 = 0
       THEN 200 ELSE 404 END AS status
FROM {meta} m JOIN reach r ON m.url = r.url
ORDER BY url
""",
    }


def _trigram_count(tri: str) -> str:
    return (
        f"(length(lt) - length(replace(lt, '{tri}', ''))) // {len(tri)}"
    )


def _corpus_sql() -> dict[str, str]:
    """Oracles for the corpus-composition family — every sampling
    decision replays exactly in SQL because the engine keys it on
    splitmix64(doc_id ^ seed), which ``hashing.splitmix64_sql``
    expresses value-exactly in DuckDB (HUGEINT split-multiply
    arithmetic)."""
    from bubing_ray.hashing import splitmix64_sql
    from bubing_ray.ops.corpus import PII_PATTERNS, SAMPLE_SEED

    smx = splitmix64_sql(
        f"xor(CAST(doc_id AS UBIGINT), CAST({SAMPLE_SEED} AS UBIGINT))"
    )
    rate_case = "CASE lang " + " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(Q.SAMPLE_RATES_BP.items())
    ) + " ELSE 10000 END"

    n = Q.DECON_NGRAM
    nd = Q.DUPSPAN_NGRAM
    terms_sql = _sql_list(sorted(set(Q.TFIDF_TERMS)))
    smx_uid = splitmix64_sql("CAST(user_id AS UBIGINT)")
    from bubing_ray.hashing import fnv1a64_sql
    fnv_etype = fnv1a64_sql("event_type")
    smx_cm = splitmix64_sql("xor(base, CAST(gr.r AS UBIGINT))")
    mod = Q.DECON_TEST_MOD
    seq = Q.PACK_SEQ_LEN

    # nested sequential redaction: counts taken on each pass's input,
    # exactly like pii_redact_batch
    aug = r"""text
    || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@mail' || (doc_id % 10) || '.example.com' ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN ' from 10.' || ((doc_id // 7) % 256) || '.' || (doc_id % 256) || '.' || ((doc_id // 3) % 100) ELSE '' END
    || CASE WHEN doc_id % 7 = 0 THEN ' tel +1 555-' || (1000 + doc_id % 9000) ELSE '' END"""
    steps = [f"a AS (SELECT doc_id, {aug} AS t0 FROM documents)"]
    prev_counts = ""
    for i, (name, pat, rep) in enumerate(PII_PATTERNS):
        steps.append(
            f"r{i + 1} AS (SELECT doc_id{prev_counts}, "
            f"CAST(len(regexp_extract_all(t{i}, '{pat}')) AS BIGINT) AS n_{name}, "
            f"regexp_replace(t{i}, '{pat}', '{rep}', 'g') AS t{i + 1} "
            f"FROM r{i} )".replace("FROM r0", "FROM a")
        )
        prev_counts += f", n_{name}"
    last = len(PII_PATTERNS)
    carry = ", ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    pii_sql = (
        "WITH " + ",\n".join(steps)
        + f"\nSELECT doc_id, {carry}, t{last} AS text_redacted "
        f"FROM r{last} ORDER BY doc_id"
    )

    return {
        "paragraph_dedup": rf"""
WITH d AS (
  SELECT doc_id,
         string_split(regexp_replace(text, '{Q.PARA_BREAK_RE}',
                      '\1' || chr(10) || chr(10), 'g'),
                      chr(10) || chr(10)) AS l
  FROM documents
),
p AS (
  SELECT doc_id, l[i] AS par, i AS pidx
  FROM d, unnest(range(1, len(l) + 1)) AS u(i)
  WHERE trim(l[i], ' ') <> ''
),
m1 AS (SELECT *, min(doc_id) OVER (PARTITION BY par) AS md FROM p),
m2 AS (SELECT *, min(CASE WHEN doc_id = md THEN pidx END)
                 OVER (PARTITION BY par) AS mp FROM m1)
SELECT doc_id, string_agg(par, chr(10) || chr(10) ORDER BY pidx) AS text
FROM m2 WHERE doc_id = md AND pidx = mp
GROUP BY doc_id ORDER BY doc_id
""",
        "stratified_sample": f"""
WITH h AS (
  SELECT doc_id, lang, CAST(({smx}) % 10000 AS BIGINT) AS bucket_bp
  FROM documents
)
SELECT doc_id, lang, bucket_bp FROM h
WHERE bucket_bp < {rate_case}
ORDER BY doc_id
""",
        "lang_token_cap": f"""
WITH t AS (
  SELECT doc_id, lang,
    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                         x -> x <> '')) AS BIGINT) AS n_tok,
    ({smx}) AS hh
  FROM documents
), r AS (
  SELECT doc_id, lang, n_tok,
    CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY hh, doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tok
         AS BIGINT) AS tok_before
  FROM t
)
SELECT doc_id, lang, n_tok, tok_before FROM r
WHERE tok_before < {Q.LANG_TOKEN_BUDGET} ORDER BY doc_id
""",
        "sample_n": f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang, ({smx}) AS hh FROM documents
) ORDER BY hh, doc_id LIMIT {Q.SAMPLE_N}
""",
        "source_cap": f"""
WITH h AS (SELECT doc_id, source, ({smx}) AS hh FROM documents),
r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY hh, doc_id) AS rk
  FROM h
)
SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= {Q.SOURCE_CAP} ORDER BY doc_id
""",
        "decontaminate": rf"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
  FROM documents
), sh AS (
  SELECT doc_id, array_to_string(t[i:i+{n - 1}], ' ') AS s
  FROM base, unnest(range(1, greatest(len(t) - {n - 2}, 1))) AS u(i)
  WHERE len(t) >= {n}
), tests AS (SELECT DISTINCT s FROM sh WHERE doc_id % {mod} = 0),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN s IN (SELECT s FROM tests) THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
  FROM sh GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(d.doc_id % {mod} = 0 AS BIGINT) AS is_test,
  coalesce(a.n_shingles, 0) AS n_shingles,
  coalesce(a.n_hits, 0) AS n_hits,
  CAST(coalesce(a.n_hits, 0) > 0 AS BIGINT) AS contaminated
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
""",
        "pii_redact": pii_sql,
        "token_pack": rf"""
WITH c AS (
  SELECT doc_id, CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok
  FROM documents
), o AS (
  SELECT doc_id, n_tok,
         CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
  FROM c
)
SELECT doc_id, n_tok, tok_offset,
  CAST(tok_offset // {seq} AS BIGINT) AS chunk_start,
  CAST(CASE WHEN n_tok > 0 THEN (tok_offset + n_tok - 1) // {seq}
       ELSE tok_offset // {seq} END AS BIGINT) AS chunk_end,
  CAST(CASE WHEN n_tok > 0
       THEN (tok_offset + n_tok - 1) // {seq} - tok_offset // {seq} + 1
       ELSE 0 END AS BIGINT) AS n_chunks
FROM o ORDER BY doc_id
""",
        "dup_spans": rf"""
WITH lt AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
  FROM documents
), shd AS (
  SELECT doc_id, array_to_string(t[i:i+{nd - 1}], ' ') AS s
  FROM lt, unnest(range(1, greatest(len(t) - {nd - 2}, 1))) AS u(i)
  WHERE len(t) >= {nd}
), tcd AS (
  SELECT doc_id, s, CAST(count(*) AS BIGINT) AS c FROM shd GROUP BY doc_id, s
), tots AS (
  SELECT s, sum(c) AS tot FROM tcd GROUP BY s
), perdoc AS (
  SELECT tcd.doc_id, CAST(sum(tcd.c) AS BIGINT) AS n_pos,
         CAST(coalesce(sum(tcd.c) FILTER (WHERE tots.tot >= 2), 0) AS BIGINT)
           AS n_dup_pos
  FROM tcd JOIN tots USING (s) GROUP BY tcd.doc_id
)
SELECT d.doc_id, coalesce(p.n_pos, 0) AS n_pos,
  coalesce(p.n_dup_pos, 0) AS n_dup_pos,
  CAST(10000 * coalesce(p.n_dup_pos, 0)
       // greatest(coalesce(p.n_pos, 0), 1) AS BIGINT) AS dup_frac_bp
FROM documents d LEFT JOIN perdoc p USING (doc_id)
ORDER BY d.doc_id
""",
        "strip_dup_spans": rf"""
WITH lt AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
  FROM documents
), shs AS (
  SELECT doc_id, i, array_to_string(t[i:i+{nd - 1}], ' ') AS s
  FROM lt, unnest(range(1, greatest(len(t) - {nd - 2}, 1))) AS u(i)
  WHERE len(t) >= {nd}
), dups AS (
  SELECT s FROM shs GROUP BY s HAVING count(*) >= 2
), cov AS (
  SELECT DISTINCT shs.doc_id, shs.i + o.j AS tpos
  FROM shs JOIN dups USING (s), unnest(range(0, {nd})) AS o(j)
), toksx AS (
  SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS tpos FROM lt
), keptx AS (
  SELECT tk.doc_id, tk.tpos, tk.tok
  FROM toksx tk ANTI JOIN cov c ON tk.doc_id = c.doc_id AND tk.tpos = c.tpos
), aggx AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(tok, ' ' ORDER BY tpos) AS txt
  FROM keptx GROUP BY doc_id
)
SELECT l.doc_id, CAST(len(l.t) AS BIGINT) AS n_tok,
  coalesce(a.n_kept, 0) AS n_kept,
  coalesce(a.txt, '') AS text_stripped
FROM lt l LEFT JOIN aggx a USING (doc_id)
ORDER BY l.doc_id
""",
        "tfidf_search": rf"""
WITH tlx AS (
  SELECT doc_id,
    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                       x -> x <> '')) AS t
  FROM documents
), tfx AS (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
  FROM tlx WHERE t IN ({terms_sql}) GROUP BY doc_id, t
), dfx AS (
  SELECT t, count(DISTINCT doc_id) AS df FROM tfx GROUP BY t
), scx AS (
  SELECT tfx.doc_id,
    CAST(sum(tfx.tf * ((10000 * (SELECT count(*) FROM documents)) // dfx.df))
         AS BIGINT) AS score
  FROM tfx JOIN dfx USING (t) GROUP BY tfx.doc_id
)
SELECT doc_id, score FROM scx
ORDER BY score DESC, doc_id LIMIT {Q.TFIDF_K}
""",
        # fixed-point BM25 (k1=6/5, b=3/4): the rational per-term factor
        # multiplies through to pure int64 floor-divisions — see
        # ops/simsearch.py:bm25_topk for the derivation
        "bm25_search": rf"""
WITH tokx AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')
      AS toks
  FROM documents
), dlx AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tokx
), ax AS (
  SELECT (100 * CAST(sum(dl) AS BIGINT))
         // (SELECT count(*) FROM documents) AS A
  FROM dlx
), tlx AS (
  SELECT doc_id, unnest(toks) AS t FROM tokx
), tfx AS (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
  FROM tlx WHERE t IN ({terms_sql}) GROUP BY doc_id, t
), dfx AS (
  SELECT t, count(DISTINCT doc_id) AS df FROM tfx GROUP BY t
), scx AS (
  SELECT tfx.doc_id,
    CAST(sum(((10000 * (SELECT count(*) FROM documents)) // dfx.df)
             * ((44 * tfx.tf * ax.A * 10000)
                // (20 * tfx.tf * ax.A + 6 * ax.A + 1800 * dlx.dl)))
         AS BIGINT) AS score
  FROM tfx JOIN dfx USING (t) JOIN dlx USING (doc_id) CROSS JOIN ax
  GROUP BY tfx.doc_id
)
SELECT doc_id, score FROM scx
ORDER BY score DESC, doc_id LIMIT {Q.TFIDF_K}
""",
        "text_normalize": r"""
SELECT doc_id,
  trim(regexp_replace(
    regexp_replace(nfc_normalize(text), '[\x00-\x1F\x7F]', ' ', 'g'),
    '\s+', ' ', 'g'), ' ') AS norm_text
FROM documents ORDER BY doc_id
""",
        "hll_users": f"""
WITH hh AS (
  SELECT ({smx_uid}) AS h FROM events WHERE user_id IS NOT NULL
), rw AS (
  SELECT CAST(h >> 52 AS BIGINT) AS register,
         h & {(1 << 52) - 1} AS w
  FROM hh
)
SELECT register,
  CAST(max(52 - (CASE WHEN w = 0 THEN 0 ELSE strlen(bin(w)) END) + 1)
       AS BIGINT) AS rho
FROM rw GROUP BY register ORDER BY register
""",
        "cm_events": f"""
WITH cmh AS (
  SELECT ({fnv_etype}) AS base FROM events
), cmr AS (
  SELECT gr.r AS row, CAST(({smx_cm}) % {Q.stats.CM_WIDTH} AS BIGINT) AS slot
  FROM cmh CROSS JOIN (SELECT unnest(range(0, {Q.stats.CM_DEPTH})) AS r) gr
)
SELECT row, slot, CAST(count(*) AS BIGINT) AS count
FROM cmr GROUP BY row, slot ORDER BY row, slot
""",
        "lineitem_quantiles": """
WITH h AS (
  SELECT l_quantity AS v, CAST(count(*) AS BIGINT) AS c
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY l_quantity
), cum AS (
  SELECT v, sum(c) OVER (ORDER BY v) AS cum,
         (SELECT sum(c) FROM h) AS n
  FROM h
), qs(q_bp) AS (VALUES (2500), (5000), (7500), (9000), (9900))
SELECT CAST(q_bp AS BIGINT) AS q_bp, CAST(min(v) AS DOUBLE) AS value
FROM qs JOIN cum ON cum.cum > ((cum.n - 1) * q_bp) // 10000
GROUP BY q_bp ORDER BY q_bp
""",
        "lineitem_quantiles_by_flag": """
WITH h AS (
  SELECT l_returnflag, l_quantity AS v, CAST(count(*) AS BIGINT) AS c
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2
), cum AS (
  SELECT l_returnflag, v,
    CAST(sum(c) OVER (PARTITION BY l_returnflag ORDER BY v) AS BIGINT)
      AS cum,
    CAST(sum(c) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
  FROM h
), qs(q_bp) AS (VALUES (2500), (5000), (7500), (9000), (9900))
SELECT l_returnflag, CAST(q_bp AS BIGINT) AS q_bp, min(v) AS value
FROM qs JOIN cum ON cum.cum > ((cum.n - 1) * q_bp) // 10000
GROUP BY 1, 2 ORDER BY 1, 2
""",
        "events_type_user_hll": f"""
WITH hh AS (
  SELECT event_type, ({smx_uid}) AS h FROM events
  WHERE user_id IS NOT NULL
), rw AS (
  SELECT event_type, CAST(h >> 52 AS BIGINT) AS register,
         h & {(1 << 52) - 1} AS w
  FROM hh
)
SELECT event_type, register,
  CAST(max(52 - (CASE WHEN w = 0 THEN 0 ELSE strlen(bin(w)) END) + 1)
       AS BIGINT) AS rho
FROM rw GROUP BY 1, 2 ORDER BY 1, 2
""",
        "lm_familiarity": f"""
WITH {_LM_CHAIN_SQL}
SELECT d.doc_id, coalesce(s.n_tri, 0) AS n_tri,
  coalesce(s.familiarity_bp, 0) AS familiarity_bp
FROM documents d LEFT JOIN lsc s USING (doc_id)
ORDER BY d.doc_id
""",
        "familiarity_buckets": f"""
WITH {_LM_CHAIN_SQL},
fam AS (
  SELECT d.doc_id, coalesce(s.familiarity_bp, 0) AS familiarity_bp
  FROM documents d LEFT JOIN lsc s USING (doc_id)
), fh AS (
  SELECT familiarity_bp AS v, CAST(count(*) AS BIGINT) AS c
  FROM fam GROUP BY familiarity_bp
), fcum AS (
  SELECT v, sum(c) OVER (ORDER BY v) AS cum,
         (SELECT sum(c) FROM fh) AS n
  FROM fh
), fqs(q_bp) AS (VALUES (2500), (5000), (7500)),
fcuts AS (
  SELECT q_bp, min(v) AS cut
  FROM fqs JOIN fcum ON fcum.cum > ((fcum.n - 1) * q_bp) // 10000
  GROUP BY q_bp
)
SELECT f.doc_id, f.familiarity_bp,
  CAST((SELECT count(*) FROM fcuts WHERE f.familiarity_bp > fcuts.cut)
       AS BIGINT) AS bucket
FROM fam f ORDER BY f.doc_id
""",
        "bpe_pairs": """
WITH btk AS (
  SELECT row_number() OVER () AS tid, tok
  FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                  x -> x <> '')) AS tok
        FROM documents)
), btb AS (
  SELECT tid, i,
    CAST(16 * (strpos('0123456789ABCDEF', substr(hex(encode(tok)), 2*i-1, 1)) - 1)
       + (strpos('0123456789ABCDEF', substr(hex(encode(tok)), 2*i, 1)) - 1)
       AS BIGINT) AS b
  FROM btk,
       unnest(range(1, CAST(octet_length(encode(tok)) AS INT) + 1)) AS u(i)
), bpr AS (
  SELECT a.b * 256 + c.b AS pair_code
  FROM btb a JOIN btb c ON c.tid = a.tid AND c.i = a.i + 1
)
SELECT pair_code, CAST(count(*) AS BIGINT) AS count
FROM bpr GROUP BY pair_code
ORDER BY count DESC, pair_code LIMIT 20
""",
        # full BPE training loop + encode replay, SQL-unrolled like the
        # page_pagerank oracle (15 merge iterations as textual CTE steps)
        "bpe_merges": _bpe_merges_sql(15),
        "bpe_encode_counts": _bpe_encode_sql(15),
        # lift replays ops/assoc.collocations: same left-assoc IEEE-double
        # chain (1000.0 * n_xy * N * N) / ((M * n_x) * n_y) with N, M
        # converted to double once, exactly like the numpy kernel
        "collocations": rf"""
WITH ct AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
  FROM documents
), cu AS (
  SELECT u.tok AS word, CAST(count(*) AS BIGINT) AS n
  FROM ct, unnest(t) AS u(tok) GROUP BY u.tok
), cb AS (
  SELECT t[i] AS w1, t[i+1] AS w2
  FROM ct, unnest(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
), cbc AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_xy
  FROM cb GROUP BY w1, w2 HAVING count(*) >= 3
), tot AS (
  SELECT (SELECT CAST(sum(n) AS DOUBLE) FROM cu) AS nt,
         (SELECT CAST(count(*) AS DOUBLE) FROM cb) AS mb
)
SELECT c.w1, c.w2, c.n_xy, x.n AS n_x, y.n AS n_y,
  CAST(floor(1000.0 * c.n_xy * t.nt * t.nt / (t.mb * x.n * y.n)) AS BIGINT)
    AS lift_milli
FROM cbc c
JOIN cu x ON x.word = c.w1
JOIN cu y ON y.word = c.w2
CROSS JOIN tot t
ORDER BY lift_milli DESC, c.w1, c.w2 LIMIT 20
""",
        "ngram_topk": rf"""
WITH nt AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
  FROM documents
), ng AS (
  SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
  FROM nt, unnest(range(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 3
)
SELECT gram, CAST(count(*) AS BIGINT) AS n
FROM ng GROUP BY gram
ORDER BY n DESC, gram LIMIT 20
""",
        # replays ops/assoc.dsir_weights: FNV-1a-64 hashed bigrams mod 2^16,
        # log2(count+1) buckets via strlen(bin()), per-doc sum of
        # (target_bucket - raw_bucket); target slice = lang = 'en'
        "dsir_weights": rf"""
WITH dt AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
  FROM documents
), db AS (
  SELECT doc_id, lang, t[i] || ' ' || t[i+1] AS bg
  FROM dt, unnest(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
), dh AS (
  SELECT doc_id, lang,
         CAST(({fnv1a64_sql('bg')}) % 65536 AS BIGINT) AS h
  FROM db
), dc AS (
  SELECT h,
         CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS ctgt,
         CAST(count(*) AS BIGINT) AS craw
  FROM dh GROUP BY h
), dbk AS (
  SELECT h, CAST(strlen(bin(ctgt + 1)) - 1 AS BIGINT)
          - CAST(strlen(bin(craw + 1)) - 1 AS BIGINT) AS diff
  FROM dc
), dsc AS (
  SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_bi,
         CAST(sum(k.diff) AS BIGINT) AS dsir_score
  FROM dh s JOIN dbk k USING (h) GROUP BY s.doc_id
)
SELECT d.doc_id, CAST(coalesce(s.n_bi, 0) AS BIGINT) AS n_bi,
       CAST(coalesce(s.dsir_score, 0) AS BIGINT) AS dsir_score
FROM documents d LEFT JOIN dsc s USING (doc_id)
ORDER BY d.doc_id
""",
        "orders_by_nation": """
SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CAST(round(100 * o.o_totalprice) AS BIGINT)) AS BIGINT)
    AS sum_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY nation ORDER BY nation
""",
        "repetition_stats": rf"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
  FROM documents
), sh2 AS (
  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS s
  FROM base, unnest(range(1, greatest(len(t), 1))) AS u(i)
  WHERE len(t) >= 2
), sh3 AS (
  SELECT doc_id, array_to_string(t[i:i+2], ' ') AS s
  FROM base, unnest(range(1, greatest(len(t) - 1, 1))) AS u(i)
  WHERE len(t) >= 3
), c2 AS (
  SELECT doc_id, s, count(*) AS c FROM sh2 GROUP BY doc_id, s
), a2 AS (
  SELECT doc_id, CAST((10000 * max(c)) // sum(c) AS BIGINT) AS top2_frac_bp
  FROM c2 GROUP BY doc_id
), c3 AS (
  SELECT doc_id, s, count(*) AS c FROM sh3 GROUP BY doc_id, s
), a3 AS (
  SELECT doc_id,
    CAST((10000 * coalesce(sum(c) FILTER (WHERE c > 1), 0)) // sum(c)
         AS BIGINT) AS dup3_frac_bp
  FROM c3 GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(coalesce(a2.top2_frac_bp, 0) AS BIGINT) AS top2_frac_bp,
  CAST(coalesce(a3.dup3_frac_bp, 0) AS BIGINT) AS dup3_frac_bp
FROM documents d
LEFT JOIN a2 USING (doc_id) LEFT JOIN a3 USING (doc_id)
ORDER BY d.doc_id
""",
        "corpus_compose": rf"""
WITH qb AS (
  SELECT doc_id, text, {_toks()} AS t FROM documents
), qc AS (
  SELECT doc_id,
    len(t) AS n_words,
    CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS n_word_chars,
    len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha_words,
    len(list_filter(t, x -> lower(x) IN ({_sql_list(STOPWORDS)}))) AS n_stop_hits,
    CAST(length(text) - length(replace(text, '#', ''))
      + (length(text) - length(replace(text, '...', ''))) // 3
      AS BIGINT) AS n_symbols
  FROM qb
), qr AS (
  SELECT doc_id, n_words,
    CAST(floor(100.0 * n_word_chars / greatest(n_words, 1)) AS BIGINT) AS mwl,
    CAST(floor(10000.0 * n_alpha_words / greatest(n_words, 1)) AS BIGINT) AS awb,
    n_stop_hits,
    CAST(floor(10000.0 * n_symbols / greatest(n_words, 1)) AS BIGINT) AS srb
  FROM qc
), gate AS (
  SELECT doc_id FROM qr
  WHERE n_words BETWEEN {text_mod.GOPHER_MIN_WORDS} AND {text_mod.GOPHER_MAX_WORDS}
    AND mwl BETWEEN {text_mod.GOPHER_MIN_MEAN_WORD_LEN_CP}
                AND {text_mod.GOPHER_MAX_MEAN_WORD_LEN_CP}
    AND awb >= {text_mod.GOPHER_MIN_ALPHA_WORD_BP}
    AND n_stop_hits >= {text_mod.GOPHER_MIN_STOP_HITS}
    AND srb < {text_mod.GOPHER_MAX_SYMBOL_RATIO_BP}
    AND doc_id % {mod} <> 0
), lt AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
  FROM documents
), sh AS (
  SELECT doc_id, array_to_string(t[i:i+{n - 1}], ' ') AS s
  FROM lt, unnest(range(1, greatest(len(t) - {n - 2}, 1))) AS u(i)
  WHERE len(t) >= {n}
), tests AS (SELECT DISTINCT s FROM sh WHERE doc_id % {mod} = 0),
dirty AS (
  SELECT DISTINCT doc_id FROM sh WHERE s IN (SELECT s FROM tests)
), keep AS (
  SELECT d.doc_id, d.source, d.lang, ({smx}) AS hh
  FROM documents d JOIN gate USING (doc_id)
  WHERE d.doc_id NOT IN (SELECT doc_id FROM dirty)
    AND ({smx}) % 10000 < {rate_case}
), rk AS (
  SELECT doc_id, source, lang,
         row_number() OVER (PARTITION BY source ORDER BY hh, doc_id) AS rk
  FROM keep
)
SELECT doc_id, source, lang, CAST(rk AS BIGINT) AS rk
FROM rk WHERE rk <= {Q.SOURCE_CAP} ORDER BY doc_id
""",
    }


def _minhash_prefix_sql() -> str:
    """Shared CTE prefix replaying the MinHash chain (portable=True)
    value-exactly: FNV shingle hashes -> k-perm signatures
    (wrap-at-2^64 numpy semantics) -> per-band FNV bucket mix.  Ends at
    the ``bmix(doc_id, band, bucket)`` CTE (no leading WITH)."""
    from bubing_ray.hashing import fnv1a64_sql
    from bubing_ray.ops.dedup import MINHASH_PERMS, _perm_params

    a, b = _perm_params()
    perm_rows = ", ".join(
        f"({k}, {int(a[k])}, {int(b[k])})" for k in range(MINHASH_PERMS)
    )
    m64, m61, p61 = 1 << 64, 1 << 61, (1 << 61) - 1
    rows = MINHASH_PERMS // 16  # bands=16
    return rf"""lt AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
  FROM documents
), shm AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
  FROM lt, unnest(range(1, greatest(len(t) - 1, 1))) AS u(i)
  WHERE len(t) >= 3
), hs AS (
  SELECT DISTINCT doc_id, ({fnv1a64_sql('s')}) % {m61} AS x FROM shm
), perms(k, pa, pb) AS (VALUES {perm_rows}),
v AS (
  SELECT h.doc_id, p.k,
    min(CAST(((CAST(p.pa AS HUGEINT) * CAST(h.x AS HUGEINT)) % {m64}
              + p.pb) % {m64} % {p61} AS UBIGINT)) AS sig
  FROM hs h CROSS JOIN perms p GROUP BY h.doc_id, p.k
), sigf AS (
  SELECT d.doc_id, p.k,
         coalesce(v.sig, CAST({m64 - 1} AS UBIGINT)) AS sig
  FROM (SELECT doc_id FROM documents) d CROSS JOIN perms p
  LEFT JOIN v ON v.doc_id = d.doc_id AND v.k = p.k
), bmix AS (
  SELECT doc_id, CAST(k // {rows} AS INT) AS band,
    CAST(list_reduce(list_prepend(CAST(1469598103934665603 AS HUGEINT),
      list(CAST(sig AS HUGEINT) ORDER BY k)),
      (h, s) -> (CAST(xor(CAST(h AS UBIGINT), CAST(s AS UBIGINT)) AS HUGEINT)
                 * 1099511628211) % {m64}) AS UBIGINT) AS bucket
  FROM sigf GROUP BY doc_id, band
)"""


def _minhash_sql(min_bp: int) -> str:
    """Full MinHash pair chain: :func:`_minhash_prefix_sql` + the
    bucket-collision candidates + full-signature verify.  Returns the
    WITH body ending in ``match(a, b, est_sim_bp)`` (no leading WITH,
    no final SELECT)."""
    from bubing_ray.ops.dedup import MINHASH_PERMS

    return _minhash_prefix_sql() + f""", cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bmix x JOIN bmix y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
  -- empty-shingle (sentinel) docs never enter the candidate set: they
  -- all share one signature and would pair at 10000 bp with zero
  -- shared content (mirrors dedup._drop_sentinel_sigs)
  WHERE x.doc_id IN (SELECT DISTINCT doc_id FROM hs)
    AND y.doc_id IN (SELECT DISTINCT doc_id FROM hs)
), match AS (
  SELECT c.a, c.b,
    CAST(10000 * sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END)
         // {MINHASH_PERMS} AS BIGINT) AS est_sim_bp
  FROM cand c
  JOIN sigf sa ON sa.doc_id = c.a
  JOIN sigf sb ON sb.doc_id = c.b AND sb.k = sa.k
  GROUP BY c.a, c.b
  HAVING est_sim_bp >= {min_bp}
)"""


def _minhash_decon_sql(mod: int, min_bp: int) -> str:
    """Fuzzy-decontamination oracle: directed collisions (corpus doc x
    against test docs ``doc_id % mod = 0``, self excluded), per-doc max
    estimated similarity, contaminated flag."""
    from bubing_ray.ops.dedup import MINHASH_PERMS

    return "WITH " + _minhash_prefix_sql() + f""", dcand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bmix x JOIN bmix y
    ON x.band = y.band AND x.bucket = y.bucket
  WHERE y.doc_id % {mod} = 0 AND x.doc_id <> y.doc_id
    -- empty-shingle (sentinel) docs never act as test-side content
    AND y.doc_id IN (SELECT DISTINCT doc_id FROM hs)
), dsim AS (
  SELECT c.a,
    CAST(10000 * sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END)
         // {MINHASH_PERMS} AS BIGINT) AS est
  FROM dcand c
  JOIN sigf sa ON sa.doc_id = c.a
  JOIN sigf sb ON sb.doc_id = c.b AND sb.k = sa.k
  GROUP BY c.a, c.b
), dmx AS (
  SELECT a AS doc_id, max(est) AS mx FROM dsim GROUP BY a
)
SELECT d.doc_id,
  CAST(CASE WHEN d.doc_id % {mod} = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_test,
  CAST(coalesce(m.mx, 0) AS BIGINT) AS max_sim_bp,
  CAST(CASE WHEN coalesce(m.mx, 0) >= {min_bp} THEN 1 ELSE 0 END AS BIGINT)
    AS contaminated
FROM documents d LEFT JOIN dmx m USING (doc_id)
ORDER BY d.doc_id
"""


def _semdedup_fixed_sql(k: int, iters: int, thr_bp: int) -> str:
    """Value-exact replay of ops/dedup.semdedup_fixed: fixed-point
    quantization, ``iters`` unrolled Lloyd iterations (integer squared
    distance, ties to lowest cluster, floor-double centroid means,
    empty clusters keep their previous centroid), then the
    within-cluster first-wins cosine prune.  MATERIALIZED CTEs keep the
    doubly-referenced chain from inlining exponentially (the BPE-oracle
    lesson)."""
    from bubing_ray.ops.dedup import SEMDEDUP_FP_SCALE

    s = SEMDEDUP_FP_SCALE
    ctes = [f"""qv AS MATERIALIZED (
  SELECT vec_id, i,
    CAST(floor({s}.0 * CAST(embedding[i] AS DOUBLE)) AS BIGINT) AS q
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
)""", """ssq AS MATERIALIZED (
  SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS s FROM qv GROUP BY vec_id
)""", f"""c0 AS MATERIALIZED (
  -- seeds = the k lowest ids wherever the id space starts, labelled
  -- 0..k-1 in id order (matches the engine's centroid row indices;
  -- `vec_id < k` broke on non-0-based id spaces)
  SELECT CAST(dense_rank() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS c, i, q
  FROM qv WHERE vec_id IN (
    SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
)"""]
    prev = "c0"
    for t in range(1, iters + 1):
        ctes.append(f"""a{t} AS (
  SELECT vec_id, c FROM (
    SELECT v.vec_id, c.c,
      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        sum((v.q - c.q) * (v.q - c.q)), c.c) AS rn
    FROM qv v JOIN {prev} c ON c.i = v.i GROUP BY v.vec_id, c.c
  ) WHERE rn = 1
)""")
        ctes.append(f"""s{t} AS (
  SELECT a.c, v.i,
    CAST(floor(CAST(sum(v.q) AS DOUBLE) / count(*)) AS BIGINT) AS q
  FROM a{t} a JOIN qv v ON v.vec_id = a.vec_id GROUP BY a.c, v.i
)""")
        ctes.append(f"""c{t} AS MATERIALIZED (
  SELECT p.c, p.i, coalesce(s.q, p.q) AS q
  FROM {prev} p LEFT JOIN s{t} s ON s.c = p.c AND s.i = p.i
)""")
        prev = f"c{t}"
    ctes.append(f"""af AS MATERIALIZED (
  SELECT vec_id, c FROM (
    SELECT v.vec_id, c.c,
      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        sum((v.q - c.q) * (v.q - c.q)), c.c) AS rn
    FROM qv v JOIN {prev} c ON c.i = v.i GROUP BY v.vec_id, c.c
  ) WHERE rn = 1
)""")
    ctes.append("""dotp AS (
  SELECT fa.vec_id AS a, fb.vec_id AS b,
    CAST(sum(ax.q * bx.q) AS BIGINT) AS dot
  FROM af fa JOIN af fb ON fa.c = fb.c AND fa.vec_id < fb.vec_id
  JOIN qv ax ON ax.vec_id = fa.vec_id
  JOIN qv bx ON bx.vec_id = fb.vec_id AND bx.i = ax.i
  GROUP BY fa.vec_id, fb.vec_id
)""")
    ctes.append(f"""dropped AS (
  SELECT DISTINCT d.b AS vec_id
  FROM dotp d JOIN ssq sa ON sa.vec_id = d.a
  JOIN ssq sb ON sb.vec_id = d.b
  WHERE CASE WHEN sa.s = 0 OR sb.s = 0 THEN 0
        ELSE CAST(floor(10000.0 * d.dot
             / (sqrt(CAST(sa.s AS DOUBLE)) * sqrt(CAST(sb.s AS DOUBLE))))
             AS BIGINT) END >= {thr_bp}
)""")
    return ("WITH " + ",\n".join(ctes) + """
SELECT q.vec_id, a.c AS cluster,
  CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM (SELECT DISTINCT vec_id FROM qv) q
JOIN af a USING (vec_id)
LEFT JOIN dropped d USING (vec_id)
ORDER BY q.vec_id
""")


def _simhash_sql() -> str:
    """CTE chain replaying simhash_batch(portable=True): token FNV
    hashes, signed per-bit majority over token multiplicity.  Ends in
    ``simsig(doc_id, simhash)`` covering every document (tokenless ->
    0), no leading WITH."""
    from bubing_ray.hashing import fnv1a64_sql

    pw_rows = ", ".join(f"({bit}, {1 << bit})" for bit in range(64))
    return rf"""stok AS (
  SELECT doc_id,
    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                       x -> x <> '')) AS tok
  FROM documents
), stc AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
  FROM stok GROUP BY doc_id, tok
), sth AS (
  SELECT doc_id, ({fnv1a64_sql('tok')}) AS h, c FROM stc
), spw(bit, pv) AS (VALUES {pw_rows}),
sbits AS (
  SELECT doc_id, spw.bit AS bit, spw.pv AS pv,
    sum(CASE WHEN ((h >> spw.bit) & 1) = 1 THEN c ELSE -c END) AS acc
  FROM sth CROSS JOIN spw GROUP BY doc_id, spw.bit, spw.pv
), ssig AS (
  SELECT doc_id,
    CAST(coalesce(sum(CASE WHEN acc > 0 THEN CAST(pv AS HUGEINT) END), 0)
         AS UBIGINT) AS simhash
  FROM sbits GROUP BY doc_id
), simsig AS (
  SELECT d.doc_id, coalesce(s.simhash, CAST(0 AS UBIGINT)) AS simhash
  FROM documents d LEFT JOIN ssig s USING (doc_id)
)"""


def _hashchain_sql() -> dict[str, str]:
    """Oracles for the hash-chain family (minhash / simhash / winnowing
    fingerprints).  The engine-side queries run with ``portable=True``
    (FNV-1a-64 string hashing, :func:`bubing_ray.hashing.fnv1a64_sql`),
    so every downstream integer is value-exact in DuckDB."""
    from bubing_ray.ops.text import _FP_BASE, FP_K, FP_WINDOW

    m64 = 1 << 64
    fp_pw = ", ".join(
        f"({j}, {pow(int(_FP_BASE), FP_K - 1 - j, m64)})" for j in range(FP_K)
    )
    return {
        "minhash_pairs": (
            "WITH " + _minhash_sql(min_bp=2000)
            + "\nSELECT a, b, est_sim_bp FROM match ORDER BY a, b"
        ),
        "decontaminate_fuzzy": _minhash_decon_sql(mod=29, min_bp=2000),
        "docs_topk_by_source": """
SELECT doc_id, source, n_chars, rk FROM (
  SELECT doc_id, source, n_chars,
         CAST(row_number() OVER (PARTITION BY source
                                 ORDER BY n_chars DESC, doc_id) AS BIGINT)
           AS rk
  FROM documents
) WHERE rk <= 3 ORDER BY source, rk
""",
        "docs_global_rank": """
SELECT doc_id, n_chars,
       CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT)
         AS rank
FROM documents ORDER BY doc_id
""",
        "minhash_dedup": (
            "WITH RECURSIVE " + _minhash_sql(min_bp=5000)
            + """,
e2 AS (SELECT a AS x, b AS y FROM match UNION ALL SELECT b, a FROM match),
reach(x, y) AS (
  SELECT x, y FROM e2
  UNION
  SELECT r.x, e.y FROM reach r JOIN e2 e ON r.y = e.x WHERE e.y <> r.x
), root AS (
  SELECT x AS doc_id, least(x, min(y)) AS root FROM reach GROUP BY x
)
SELECT d.doc_id FROM documents d LEFT JOIN root r USING (doc_id)
WHERE r.root IS NULL OR r.root = d.doc_id
ORDER BY d.doc_id"""
        ),
        # fixed-point SemDeDup: the full iterative k-means + cosine
        # prune unrolled in SQL (the float variant stays rows-only)
        "semdedup_fixed": _semdedup_fixed_sql(
            k=Q.SEMDEDUP_FIXED_KW["n_clusters"],
            iters=Q.SEMDEDUP_FIXED_KW["iters"],
            thr_bp=Q.SEMDEDUP_FIXED_KW["threshold_bp"],
        ),
        "simhash_sigs": (
            "WITH " + _simhash_sql()
            + "\nSELECT doc_id, simhash FROM simsig ORDER BY doc_id"
        ),
        "simhash_neardup": (
            "WITH " + _simhash_sql()
            + """,
sbands AS (
  SELECT s.doc_id, s.simhash, gb.b AS band,
         (s.simhash >> (16 * gb.b)) & 65535 AS bucket
  FROM simsig s CROSS JOIN (SELECT unnest(range(0, 4)) AS b) gb
), spr AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         x.simhash AS sa, y.simhash AS sb
  FROM sbands x JOIN sbands y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
)
SELECT a, b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM spr WHERE bit_count(xor(sa, sb)) <= 3 ORDER BY a, b"""
        ),
        "fingerprints": rf"""
WITH bt AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         CAST(octet_length(encode(text)) AS INT) AS nb
  FROM documents
), bytes AS (
  SELECT doc_id, i,
    CAST(16 * (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1)
       + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) AS HUGEINT)
      AS byte,
    nb
  FROM bt, unnest(range(1, nb + 1)) AS u(i)
), fpw(j, p) AS (VALUES {fp_pw}),
kh AS (
  SELECT s.doc_id, s.i,
    CAST(sum(b2.byte * CAST(fpw.p AS HUGEINT)) % {m64} AS UBIGINT) AS h
  FROM (SELECT doc_id, i, nb FROM bytes WHERE i <= nb - {FP_K - 1}) s
  JOIN bytes b2 ON b2.doc_id = s.doc_id
               AND b2.i BETWEEN s.i AND s.i + {FP_K - 1}
  JOIN fpw ON fpw.j = b2.i - s.i
  GROUP BY s.doc_id, s.i
), wm AS (
  SELECT doc_id, i,
    min(h) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN CURRENT ROW AND {FP_WINDOW - 1} FOLLOWING)
      AS wmin,
    max(i) OVER (PARTITION BY doc_id) AS maxi
  FROM kh
), sel AS (
  SELECT DISTINCT doc_id, wmin FROM wm
  WHERE i <= greatest(maxi - {FP_WINDOW - 1}, 1)
), fagg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
         bit_xor(wmin) AS fp_xor, min(wmin) AS fp_min
  FROM sel GROUP BY doc_id
)
SELECT d.doc_id, coalesce(a.n_fp, 0) AS n_fp,
  coalesce(a.fp_xor, CAST(0 AS UBIGINT)) AS fp_xor,
  coalesce(a.fp_min, CAST(0 AS UBIGINT)) AS fp_min
FROM documents d LEFT JOIN fagg a USING (doc_id)
ORDER BY d.doc_id
""",
    }


def _bpe_chain_sql(n_merges: int) -> str:
    """Shared CTE chain replaying `ops/text.bpe_train` in pure SQL
    (the page_pagerank trick: unroll the fixed-point loop textually).

    Each word is a space-joined symbol string.  Per step k: exact
    adjacency pair counts weighted by word frequency (every adjacent
    position, Sennrich get_stats), top-1 by (count DESC, left, right),
    then the merge applied via non-overlapping left-to-right
    `replace()` over a doubled-space rendering — ' l  r ' occurrences
    can't share a delimiter, and replace() scans the ORIGINAL string
    left-to-right without backtracking, which is exactly the numpy
    kernel's alternate-in-run semantics (`_apply_merge`).  CTEs are
    MATERIALIZED: each bs{{k}} is referenced twice and naive inlining
    would double the scan count per step (2^n plans)."""
    parts = [
        """WITH bwc AS MATERIALIZED (
  SELECT tok AS word, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                  x -> x <> '')) AS tok
        FROM documents)
  GROUP BY tok
), bs0 AS MATERIALIZED (
  SELECT word, array_to_string(regexp_split_to_array(word, ''), ' ') AS t, n
  FROM bwc
)"""
    ]
    for k in range(n_merges):
        parts.append(f""", bp{k} AS MATERIALIZED (
  SELECT l[i] AS "left", l[i+1] AS "right", CAST(sum(n) AS BIGINT) AS c
  FROM (SELECT string_split(t, ' ') AS l, n FROM bs{k}),
       unnest(range(1, len(l))) AS u(i)
  GROUP BY 1, 2
), bm{k} AS MATERIALIZED (
  SELECT CAST({k} AS BIGINT) AS rank, "left", "right", c AS count
  FROM bp{k} ORDER BY c DESC, "left", "right" LIMIT 1
), bs{k + 1} AS MATERIALIZED (
  SELECT s.word, trim(regexp_replace(
           replace(' ' || replace(s.t, ' ', '  ') || ' ',
                   ' ' || m."left" || '  ' || m."right" || ' ',
                   ' ' || m."left" || m."right" || ' '),
           ' +', ' ', 'g')) AS t, s.n
  FROM bs{k} s, bm{k} m
)""")
    return "".join(parts)


def _bpe_merges_sql(n_merges: int) -> str:
    union = " UNION ALL ".join(f"SELECT * FROM bm{k}" for k in range(n_merges))
    return (_bpe_chain_sql(n_merges)
            + f'\nSELECT rank, "left", "right", count FROM ({union}) '
            "ORDER BY rank")


def _bpe_encode_sql(n_merges: int) -> str:
    """bpe_encode_counts oracle: final per-word symbol count from the
    merge chain's last rewrite, joined back to per-doc token lists
    (zero-word docs kept with 0/0)."""
    return (_bpe_chain_sql(n_merges) + f""", bfin AS (
  SELECT word, CAST(len(string_split(t, ' ')) AS BIGINT) AS n_syms
  FROM bs{n_merges}
), bdw AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            x -> x <> '')) AS tok
  FROM documents
), bcnt AS (
  SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(f.n_syms) AS BIGINT) AS n_tokens
  FROM bdw w JOIN bfin f ON f.word = w.tok
  GROUP BY w.doc_id
)
SELECT d.doc_id, coalesce(c.n_words, 0) AS n_words,
       coalesce(c.n_tokens, 0) AS n_tokens
FROM documents d LEFT JOIN bcnt c USING (doc_id)
ORDER BY d.doc_id""")


def oracle_sql() -> dict[str, str]:
    stop = _sql_list(STOPWORDS)
    lang_score = ",\n    ".join(
        f"len(list_filter(t, x -> x IN ({_sql_list(LANG_MARKERS[lang])}))) AS s_{lang}"
        for lang in LANG_ORDER
    )
    tri_score = ",\n    ".join(
        "CAST("
        + " + ".join(_trigram_count(tri) for tri in text_mod.LANG_TRIGRAMS[lang])
        + f" AS BIGINT) AS s_{lang}"
        for lang in LANG_ORDER
    )
    return {
        **_web_sql(),
        # corpus interchange round-trips: the Ray side recomputes
        # n_chars from the text AFTER a JSONL/CSV write+read cycle, so
        # a value-exact match against the source view proves the text
        # survived the format round trip character-for-character
        "jsonl_ingest": """
SELECT doc_id, source, CAST(length(text) AS BIGINT) AS n_chars
FROM documents ORDER BY doc_id
""",
        "csv_ingest": """
SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars
FROM documents ORDER BY doc_id
""",
        "text_quality": f"""
WITH base AS (
  SELECT doc_id, text, {_toks()} AS t FROM documents
), c AS (
  SELECT doc_id,
    length(text) AS n_chars,
    len(t) AS n_tokens,
    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
    length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
    len(list_filter(t, x -> lower(x) IN ({stop}))) AS n_stop,
    len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_tokens_bpe
  FROM base
)
SELECT doc_id, n_chars, n_tokens, n_alpha, n_punct, n_stop, n_tokens_bpe,
  CASE WHEN n_tokens = 0 THEN 0
       ELSE CAST(floor(10000.0 * n_stop / n_tokens) AS BIGINT) END AS stopword_ratio_bp,
  CASE WHEN n_chars = 0 THEN 0
       ELSE CAST(floor(10000.0 * n_alpha / n_chars) AS BIGINT) END AS alpha_ratio_bp,
  CASE WHEN n_chars = 0 THEN 0
       ELSE CAST(floor(10000.0 * n_punct / n_chars) AS BIGINT) END AS punct_ratio_bp
FROM c ORDER BY doc_id
""",
        **_corpus_sql(),
        **_hashchain_sql(),
        "lang_id": f"""
WITH base AS (
  SELECT doc_id, text, {_toks("lower(text)")} AS t FROM documents
), s AS (
  SELECT doc_id,
    {lang_score},
    length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS s_zh
  FROM base
)
SELECT doc_id,
  CASE WHEN s_zh > 0 THEN 'zh'
       WHEN s_en = 0 AND s_fr = 0 AND s_de = 0 AND s_es = 0 THEN 'unk'
       WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
       WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
       WHEN s_de >= s_es THEN 'de'
       ELSE 'es' END AS pred_lang
FROM s ORDER BY doc_id
""",
        "lang_id_ngram": f"""
WITH base AS (
  SELECT doc_id, text, lower(text) AS lt FROM documents
), s AS (
  SELECT doc_id,
    {tri_score},
    length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS s_zh
  FROM base
)
SELECT doc_id,
  CASE WHEN s_zh > 0 THEN 'zh'
       WHEN s_en = 0 AND s_fr = 0 AND s_de = 0 AND s_es = 0 THEN 'unk'
       WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
       WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
       WHEN s_de >= s_es THEN 'de'
       ELSE 'es' END AS pred_lang
FROM s ORDER BY doc_id
""",
        "exact_dedup": """
SELECT min(doc_id) AS doc_id, count(*) AS dup_count
FROM documents GROUP BY text ORDER BY doc_id
""",
        "dedup_keep_best": r"""
WITH t AS (
  SELECT doc_id, length(text) AS n_chars,
    array_to_string(
      (list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))[1:2],
      ' ') AS ckey
  FROM documents
), g AS (
  SELECT doc_id, n_chars,
    row_number() OVER (PARTITION BY ckey
                       ORDER BY n_chars DESC, doc_id ASC) AS rn,
    count(*) OVER (PARTITION BY ckey) AS dup_count
  FROM t
)
SELECT doc_id, n_chars, dup_count FROM g WHERE rn = 1 ORDER BY doc_id
""",
        "chunk_docs": """
WITH c AS (
  SELECT doc_id, text, length(text) AS n,
    CASE WHEN length(text) <= 120 THEN 1
         ELSE 1 + (length(text) - 120 + 89) // 90 END AS n_chunks
  FROM documents
), e AS (
  SELECT doc_id, text,
         unnest(generate_series(0, n_chunks - 1)) AS chunk_id
  FROM c
)
SELECT doc_id, chunk_id,
       substr(text, 1 + chunk_id * 90, 120) AS chunk_text
FROM e ORDER BY doc_id, chunk_id
""",
        "quality_filter": f"{_gopher_sql()}\nORDER BY doc_id\n",
        "source_quality_gate": f"""
WITH q AS (
{_gopher_sql()}
), dq AS (
  SELECT d.doc_id, d.source, q.keep
  FROM documents d JOIN q USING (doc_id)
), sagg AS (
  SELECT source,
    CAST((10000 * sum(CASE WHEN keep THEN 1 ELSE 0 END)) // count(*)
         AS BIGINT) AS keep_rate_bp
  FROM dq GROUP BY source
)
SELECT dq.doc_id, dq.source, sagg.keep_rate_bp
FROM dq JOIN sagg USING (source)
WHERE sagg.keep_rate_bp >= {Q.MIN_SOURCE_KEEP_BP} AND dq.keep
ORDER BY dq.doc_id
""",
        "ngram_jaccard": f"""
WITH toks AS (
  SELECT doc_id, {_toks("lower(text)")} AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 3
), sz AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS m
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
), sim AS (
  SELECT a, b,
    CAST(floor(10000.0 * m / (za.n + zb.n - m)) AS BIGINT) AS sim_bp
  FROM inter
  JOIN sz za ON za.doc_id = a
  JOIN sz zb ON zb.doc_id = b
)
SELECT a, b, sim_bp FROM sim WHERE sim_bp >= 2000 ORDER BY a, b
""",
        "embedding_neardup": f"""
SELECT x.vec_id AS a, y.vec_id AS b
FROM embeddings x
JOIN embeddings y ON x.vec_id < y.vec_id
WHERE list_cosine_similarity(x.embedding, y.embedding) > {Q.EMB_NEARDUP_THRESHOLD}
ORDER BY a, b
""",
        "ann_topk": f"""
SELECT query_id, neighbor_id, "rank" FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
    row_number() OVER (
      PARTITION BY q.vec_id
      ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id
    ) AS "rank"
  FROM embeddings q, embeddings e
  WHERE q.vec_id < {Q.ANN_QUERIES}
) WHERE "rank" <= {Q.ANN_K} ORDER BY query_id, "rank"
""",
        # exact kNN graph: every vector a query, self excluded; same
        # float64 cosine + (sim DESC, id ASC) total order as ann_topk
        "knn_graph": f"""
SELECT vec_id, neighbor_id, "rank" FROM (
  SELECT q.vec_id, e.vec_id AS neighbor_id,
    row_number() OVER (
      PARTITION BY q.vec_id
      ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id
    ) AS "rank"
  FROM embeddings q, embeddings e
  WHERE q.vec_id <> e.vec_id
) WHERE "rank" <= {Q.ANN_K} ORDER BY vec_id, "rank"
""",
        "multimodal_meta": """
SELECT doc_id,
  (doc_id * 37) % 1024 + 16 AS width,
  (doc_id * 53) % 768 + 16 AS height,
  least(strlen(text), ((doc_id * 37) % 1024 + 16) * ((doc_id * 53) % 768 + 16)) AS n_bytes,
  TRUE AS valid
FROM documents ORDER BY doc_id
""",
        # byte-histogram features of the closed-form payload: body =
        # utf-8 text clipped to w*h bytes (ASCII corpus, so char ==
        # byte); f_k = (10000 * count of bytes with b%8==k) // n_bytes,
        # exact integer arithmetic on both sides
        "multimodal_features": """
WITH clipped AS (
  SELECT doc_id,
    substr(text, 1,
      least(strlen(text),
            ((doc_id * 37) % 1024 + 16) * ((doc_id * 53) % 768 + 16))) AS s
  FROM documents
), counts AS (
  SELECT doc_id, ascii(substr(s, CAST(i AS INT), 1)) % 8 AS k, count(*) AS c
  FROM clipped, unnest(range(1, strlen(s) + 1)) u(i)
  GROUP BY doc_id, k
), grid AS (
  SELECT cl.doc_id, b.k, strlen(cl.s) AS n, coalesce(c.c, 0) AS c
  FROM clipped cl
  CROSS JOIN (SELECT unnest(range(8)) AS k) b
  LEFT JOIN counts c ON c.doc_id = cl.doc_id AND c.k = b.k
)
SELECT doc_id,
  max(CASE WHEN k = 0 THEN (10000 * c) // greatest(n, 1) END) AS f0,
  max(CASE WHEN k = 1 THEN (10000 * c) // greatest(n, 1) END) AS f1,
  max(CASE WHEN k = 2 THEN (10000 * c) // greatest(n, 1) END) AS f2,
  max(CASE WHEN k = 3 THEN (10000 * c) // greatest(n, 1) END) AS f3,
  max(CASE WHEN k = 4 THEN (10000 * c) // greatest(n, 1) END) AS f4,
  max(CASE WHEN k = 5 THEN (10000 * c) // greatest(n, 1) END) AS f5,
  max(CASE WHEN k = 6 THEN (10000 * c) // greatest(n, 1) END) AS f6,
  max(CASE WHEN k = 7 THEN (10000 * c) // greatest(n, 1) END) AS f7
FROM grid GROUP BY doc_id ORDER BY doc_id
""",
        # post-resize dims are pure functions of doc_id; resized payloads
        # always carry exactly out_w*out_h pixel bytes
        "multimodal_resize": """
SELECT doc_id,
  greatest(1, CAST(floor(((doc_id * 37) % 1024 + 16) * 0.5) AS BIGINT)) AS width,
  greatest(1, CAST(floor(((doc_id * 53) % 768 + 16) * 0.5) AS BIGINT)) AS height,
  greatest(1, CAST(floor(((doc_id * 37) % 1024 + 16) * 0.5) AS BIGINT))
    * greatest(1, CAST(floor(((doc_id * 53) % 768 + 16) * 0.5) AS BIGINT)) AS n_bytes,
  TRUE AS valid
FROM documents ORDER BY doc_id
""",
        # every 2nd frame of (doc_id%7)+1 frames; each frame is w*h bytes
        "multimodal_frames": """
SELECT doc_id, 2 * i AS frame_idx,
  ((doc_id % 13) + 4) * ((doc_id % 11) + 4) AS n_bytes
FROM documents,
  unnest(range(CAST(floor(((doc_id % 7) + 2) / 2.0) AS BIGINT))) u(i)
ORDER BY doc_id, frame_idx
""",
        "source_stats": """
SELECT source, count(*) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
  min(doc_id) AS min_doc_id
FROM documents GROUP BY source ORDER BY source
""",
        "events_user_stats": """
SELECT user_id, count(*) AS n_events,
  count(DISTINCT event_type) AS n_types, max(value) AS max_value
FROM events GROUP BY user_id ORDER BY user_id
""",
        "events_topk": """
SELECT event_type, event_id, rnk FROM (
  SELECT event_type, event_id,
    row_number() OVER (
      PARTITION BY event_type ORDER BY value DESC, event_id
    ) AS rnk
  FROM events
) WHERE rnk <= 3 ORDER BY event_type, rnk
""",
        "spam_scores": f"""
WITH base AS (
  SELECT source, {_toks("lower(text)")} AS t, length(text) AS nc FROM documents
), c AS (
  SELECT source,
    {spam_sql_counts()},
    nc
  FROM base
)
SELECT source,
  {spam_sql_sums()},
  CAST(sum(nc) AS BIGINT) AS n_chars,
  CAST(floor(10000.0 * ({spam_sql_total()}) / sum(nc)) AS BIGINT) AS spam_score_bp
FROM c GROUP BY source ORDER BY source
""",
        "sessionize_events": f"""
SELECT event_id, user_id,
  CAST(sum(new_sess) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS UNBOUNDED PRECEDING
  ) AS BIGINT) AS session_id
FROM (
  SELECT event_id, user_id, ts,
    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              IS NULL THEN 1
         WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER (
              PARTITION BY user_id ORDER BY ts, event_id)) > {Q.SESSION_GAP_MS}
         THEN 1 ELSE 0 END AS new_sess
  FROM events
) ORDER BY user_id, session_id, event_id
""",
        "session_stats": f"""
WITH sess AS (
  SELECT event_id, user_id,
    CAST(sum(new_sess) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING
    ) AS BIGINT) AS session_id
  FROM (
    SELECT event_id, user_id, ts,
      CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                IS NULL THEN 1
           WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)) > {Q.SESSION_GAP_MS}
           THEN 1 ELSE 0 END AS new_sess
    FROM events
  )
), per_sess AS (
  SELECT user_id, session_id, count(*) AS n FROM sess
  GROUP BY user_id, session_id
)
SELECT user_id, max(session_id) AS n_sessions,
  CAST(max(n) AS BIGINT) AS max_session_events
FROM per_sess GROUP BY user_id ORDER BY user_id
""",
        "events_value_hist": """
SELECT CAST(floor(log2(value)) AS BIGINT) AS bucket, count(*) AS n
FROM events WHERE value > 0 GROUP BY 1 ORDER BY bucket
""",
        "lineitem_agg": """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
  sum(l_quantity) AS sum_l_quantity,
  min(l_quantity) AS min_l_quantity,
  max(l_quantity) AS max_l_quantity
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
        "canonicalize": """
SELECT doc_id,
  'http://host' || doc_id || '.example/p%20a/' || doc_id || '%2F?x=1' AS url
FROM documents ORDER BY doc_id
""",
        "robots_gate": """
SELECT doc_id,
  CASE doc_id % 5
    WHEN 1 THEN '/p/x' WHEN 2 THEN '/private' WHEN 4 THEN '/' END AS path
FROM documents WHERE doc_id % 5 IN (1, 2, 4) ORDER BY doc_id
""",
        "url_dedup_first": """
SELECT 'http://h' || (doc_id % 50) || '.example/p/' || (doc_id % 100) AS url,
  min(doc_id) AS first_seq
FROM documents GROUP BY doc_id % 50, doc_id % 100 ORDER BY first_seq
""",
        "filter_atoms": """
SELECT doc_id FROM documents
WHERE doc_id % 5 <> 0        -- StatusCategory(2): status 200
  AND doc_id % 3 <> 0        -- ContentTypeStartsWith('text/')
  AND doc_id % 2 <> 0        -- PathEndsWithOneOf(['.html'])
ORDER BY doc_id
""",
        # --- temporal operators (ops/temporal.py, ops/joins.py) ---
        "events_last_purchase": """
WITH p AS (
  SELECT user_id, ts, event_id AS purch_event_id, value AS purch_value
  FROM events WHERE event_type = 'purchase'
)
SELECT e.event_id, e.user_id, p.purch_event_id, p.purch_value
FROM events e ASOF LEFT JOIN p
  ON e.user_id = p.user_id AND e.ts >= p.ts
ORDER BY e.event_id
""",
        "purchase_window_stats": """
WITH p AS (
  SELECT event_id AS purch_event_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.purch_event_id,
  count(e.ts) AS n_points,
  CAST(coalesce(sum(CAST(floor(e.value * 100) AS BIGINT)), 0) AS BIGINT)
    AS sum_val
FROM p LEFT JOIN events e
  ON e.user_id = p.user_id
 AND e.ts >= p.ts AND e.ts < p.ts + INTERVAL 1 HOUR
GROUP BY p.purch_event_id ORDER BY p.purch_event_id
""",
        "events_hourly": """
SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS w,
  event_type,
  count(*) AS n_events,
  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_val
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
        "events_sliding": """
SELECT (CAST(floor(epoch_us(ts) / 900000000) AS BIGINT) - i.i) * 900000000
    AS w_start,
  event_type,
  count(*) AS n_events
FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS i(i)
GROUP BY 1, 2 ORDER BY 1, 2
""",
        "events_running": """
SELECT event_id, user_id,
  CAST(count(*) OVER w AS BIGINT) AS run_cnt,
  CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT) AS run_sum
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)
ORDER BY event_id
""",
        # funnel: first view, first click strictly after it, first
        # purchase strictly after that — stage = steps completed
        "funnel_stages": """
WITH t1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN t1 ON t1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN t2 ON t2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t GROUP BY e.user_id
), u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id,
  CAST(CASE WHEN t3.t IS NOT NULL THEN 3
            WHEN t2.t IS NOT NULL THEN 2
            WHEN t1.t IS NOT NULL THEN 1
            ELSE 0 END AS BIGINT) AS stage
FROM u
LEFT JOIN t1 ON t1.user_id = u.user_id
LEFT JOIN t2 ON t2.user_id = u.user_id
LEFT JOIN t3 ON t3.user_id = u.user_id
ORDER BY u.user_id
""",
        # snapshot diff: FULL OUTER JOIN with IS NOT DISTINCT FROM value
        # comparison, mirroring diff_tables' presence-flag semantics
        "store_diff": """
WITH l AS (
  SELECT doc_id, text AS v FROM documents WHERE doc_id % 2 = 0
), r AS (
  SELECT doc_id,
    CASE WHEN doc_id % 12 = 0 THEN upper(text) ELSE text END AS v
  FROM documents WHERE doc_id % 3 = 0
)
SELECT coalesce(l.doc_id, r.doc_id) AS doc_id,
  CASE WHEN l.doc_id IS NULL THEN 'added'
       WHEN r.doc_id IS NULL THEN 'removed'
       WHEN l.v IS NOT DISTINCT FROM r.v THEN 'same'
       ELSE 'changed' END AS change
FROM l FULL OUTER JOIN r ON l.doc_id = r.doc_id
ORDER BY doc_id
""",
        # retention triangle: cohort = epoch-week of the key's first
        # event; a cell counts distinct keys active offset weeks later
        "cohort_retention": """
WITH a AS (
  -- exact FLOOR division (matching polars //): DuckDB's integer //
  -- truncates toward zero, so subtract the sign-safe positive
  -- remainder first (differs only for pre-epoch timestamps)
  SELECT DISTINCT user_id,
    CAST((epoch_us(ts)
          - ((epoch_us(ts) % 604800000000) + 604800000000) % 604800000000)
         // 604800000000 AS BIGINT) AS wk
  FROM events
), f AS (
  SELECT user_id, min(wk) AS cw FROM a GROUP BY user_id
)
SELECT f.cw AS cohort_week, a.wk - f.cw AS week_offset,
  CAST(count(*) AS BIGINT) AS n_users
FROM a JOIN f ON f.user_id = a.user_id
GROUP BY f.cw, a.wk - f.cw
ORDER BY cohort_week, week_offset
""",
        "customers_no_urgent": """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
) ORDER BY c_custkey
""",
        "customers_with_urgent": """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
) ORDER BY c_custkey
""",
    }
