"""Link-graph analytics over crawled pages.

The reference models links as (source, target) pairs fed to the
schedule filter (util/Link.java) and ships offline graph tools
(tool/GenerateGraphMap.java); this module adds the graph analytics a
web corpus needs:

- ``link_edges``: pages -> (src_url, dst_url) edge Dataset (streaming
  parse + explode; at 100 TB the edge table is written partitioned by
  ``hash(src_host)``);
- ``host_edges``: edges aggregated to (src_host, dst_host, weight) —
  partial-combined per batch so the shuffle carries distinct pairs;
- ``host_indegree``: in-degree counts per host;
- ``host_pagerank``: PageRank on the host graph — the host graph is
  orders of magnitude smaller than the page graph (the small side), so
  iterations run on the driver over the aggregated edges while the
  page->host aggregation stays distributed. Page-level PageRank at
  100 TB swaps the driver loop for iterated hash-join rounds keyed by
  ``dst_host`` — same aggregation stages.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import ray
from ray.data.aggregate import Sum

from .. import burl
from ..html_parser import ParseHTMLBatch
from .stats import _collect


def link_edges(pages_ds):
    """Pages (url, html, ...) -> edge Dataset (src_url, dst_url)."""

    def explode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        parsed = ParseHTMLBatch()(batch)
        links = parsed.column("links").combine_chunks()
        src = parsed.column("url").combine_chunks()
        lens = pc.list_value_length(links).to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.repeat(np.arange(len(lens)), lens)
        return pa.table(
            {
                "src_url": src.take(pa.array(idx)),
                "dst_url": links.flatten(),
            }
        )

    return pages_ds.map_batches(explode, batch_format="pyarrow")


#: one <a> tag: href attribute + inner text (the generator emits this
#: exact shape; a real-web variant would run the full parser instead)
_ANCHOR_TAG_RE = r'(?s)<a\s[^>]*href="[^"]*"[^>]*>.*?</a>'
_HREF_RE = r'href="([^"]*)"'
_TEXT_RE = r">([^<]*)</a>"


def anchor_edges(pages_ds):
    """Pages (url, html, ...) -> anchor-text edge Dataset (src_url,
    dst_url, anchor): one row per rendered ``<a>`` tag (no dedup — the
    same target linked twice contributes two anchor observations).

    The extraction is a vectorized polars regex pass over the HTML;
    hrefs then resolve against the page URL through the real BURL
    resolver (relative refs, messy casing and dot-segments all
    canonicalize — HTMLParser.java:538-602 semantics), deduped to
    unique (src, href) pairs first since nav hrefs repeat heavily.
    Unresolvable hrefs drop, like the parser drops malformed links.
    """

    def explode(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame(
            {
                "src_url": pl.from_arrow(batch.column("url").combine_chunks()),
                "_html": pl.from_arrow(
                    batch.column("html").combine_chunks()
                ).cast(pl.String),
            }
        )
        tags = (
            df.with_columns(
                pl.col("_html").str.extract_all(_ANCHOR_TAG_RE).alias("_tag"))
            .drop("_html")
            .explode("_tag")
            .drop_nulls("_tag")
            .with_columns(
                pl.col("_tag").str.extract(_HREF_RE, 1).alias("_href"),
                pl.col("_tag").str.extract(_TEXT_RE, 1).alias("anchor"),
            )
            .drop("_tag")
            .drop_nulls(["_href", "anchor"])
        )
        pairs = tags.select(["src_url", "_href"]).unique()
        resolved = [
            burl.resolve(s, h)
            for s, h in zip(pairs["src_url"], pairs["_href"])
        ]
        out = tags.join(
            pairs.with_columns(pl.Series("dst_url", resolved, pl.String)),
            on=["src_url", "_href"],
            how="left",
        ).drop_nulls("dst_url").select(["src_url", "dst_url", "anchor"])
        return out.to_arrow()

    return pages_ds.map_batches(explode, batch_format="pyarrow")


def anchor_topk(pages_ds, k: int = 3, n_routes: int | None = None):
    """Per-target anchor-text aggregation: the top-``k`` anchor strings
    per destination URL by observation count (ties broken by anchor
    ascending), with the count and rank — the anchor-text corpus step of
    a web pipeline (anchors are a strong relevance/label signal for the
    linked page).

    Scale shape: per-batch partial combine to distinct (dst, anchor)
    counts, ONE shuffle routed by ``hash(dst)`` carrying only the
    distinct pairs, then a vectorized rank window per route group.
    Returns (dst, anchor, cnt, rnk) with rnk in 1..k.
    """
    from ..hashing import derive_routes, hash64

    edges = anchor_edges(pages_ds)

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["dst_url", "anchor"]))
        agg = df.group_by(["dst_url", "anchor"]).agg(
            pl.len().cast(pl.Int64).alias("cnt"))
        return agg.to_arrow()

    part = edges.map_batches(partial, batch_format="pyarrow")
    nr = derive_routes(part, n_routes)

    def route(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column("dst_url"))
        return batch.append_column(
            "route", pa.array((h % np.uint64(nr)).astype(np.int64)))

    def topk(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        out = (
            df.group_by(["dst_url", "anchor"])
            .agg(pl.col("cnt").sum())
            .sort(["dst_url", "cnt", "anchor"],
                  descending=[False, True, False])
            .with_columns(
                (pl.col("anchor").cum_count().over("dst_url"))
                .cast(pl.Int64).alias("rnk"))
            .filter(pl.col("rnk") <= k)
            .rename({"dst_url": "dst"})
            .select(["dst", "anchor", "cnt", "rnk"])
        )
        return out.to_arrow()

    return (
        part.map_batches(route, batch_format="pyarrow")
        .groupby("route")
        .map_groups(topk, batch_format="pyarrow")
    )


def _host_of_col(arr: pa.Array) -> pl.Series:
    return pl.from_arrow(arr).str.extract(r"^[a-z]+://(?:[^/@]*@)?([^/:?#]+)", 1)


def host_edges(edges_ds):
    """(src_url, dst_url) -> (src_host, dst_host, weight), pre-combined
    per batch before the global groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame(
            {
                "src_host": _host_of_col(batch.column("src_url").combine_chunks()),
                "dst_host": _host_of_col(batch.column("dst_url").combine_chunks()),
            }
        )
        agg = df.group_by(["src_host", "dst_host"]).agg(
            pl.len().cast(pl.Int64).alias("w")
        )
        return agg.to_arrow()

    g = (
        edges_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["src_host", "dst_host"])
        .aggregate(Sum("w"))
    )
    return g.map_batches(
        lambda t: pa.table(
            {"src_host": t.column("src_host"), "dst_host": t.column("dst_host"),
             "weight": t.column("sum(w)")}
        ),
        batch_format="pyarrow",
    )


def host_indegree(edges_ds):
    """Distinct-source in-degree per destination host."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame(
            {
                "src_host": _host_of_col(batch.column("src_url").combine_chunks()),
                "dst_host": _host_of_col(batch.column("dst_url").combine_chunks()),
            }
        ).unique()
        return df.to_arrow()

    from ray.data.aggregate import Count

    uniq = (
        edges_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["src_host", "dst_host"])
        .aggregate(Count())  # distinct pairs (count discarded)
    )

    def count(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).group_by("dst_host").agg(
            pl.len().cast(pl.Int64).alias("pn")
        )
        return df.to_arrow()

    g = uniq.map_batches(count, batch_format="pyarrow").groupby("dst_host").aggregate(
        Sum("pn")
    )
    return g.map_batches(
        lambda t: pa.table(
            {"host": t.column("dst_host"), "indegree": t.column("sum(pn)")}
        ),
        batch_format="pyarrow",
    )


N_PR_ROUTES = 256  # route-count FLOOR; page_pagerank derives the actual
# width from the edge count (hashing.routes_for) so a route group's rows
# stay bounded as the graph grows


def _route_str(arr: pa.Array, n_routes: int = N_PR_ROUTES) -> pa.Array:
    from ..hashing import route_of

    return route_of(arr, n_routes)


#: fixed-point scale for page_pagerank rank mass (total mass == PR_FP).
PR_FP = 10**12


def page_pagerank(edges_ds, damping_pct: int = 85, iters: int = 3,
                  rank_scale: int = 10_000_000,
                  n_routes: int | None = None):
    """PAGE-level PageRank, fully distributed — the documented scale
    swap for :func:`host_pagerank`'s driver loop: every iteration is
    two reduce-side exchanges keyed by url hash (the union + coarse
    route + one vectorized polars join per group pattern), so the rank
    vector and the edge list stay sharded; the driver only ever holds
    scalars (node count, dangling mass).

    DETERMINISM: all arithmetic is int64 fixed-point (total mass
    ``PR_FP``; per-edge share = ``rank // outd``; damping applied as
    ``damping_pct * x // 100``).  Integer addition is associative, so
    the result is a pure function of the graph regardless of block
    order / partial-sum grouping — which is what lets an
    independently-derived edge list (the synthetic-web generator's
    closed-form table, unrolled in SQL) serve as a value-exact oracle.
    Mass lost to floors is < n_edges ulps of 1e-12 per iteration.

    Returns a Dataset (url, rank_bp) with rank floor-scaled to int64
    (``rank_bp = rank_fp // (PR_FP // rank_scale)``).
    """
    from ray.data.aggregate import Sum

    edges = edges_ds.materialize()  # reused every iteration
    from ..hashing import routes_for

    nr = n_routes if n_routes is not None else routes_for(edges.count())

    # out-degree + node universe (sources ∪ destinations)
    def nodes_batch(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        src = b.column("src_url").combine_chunks()
        dst = b.column("dst_url").combine_chunks()
        urls = pa.concat_arrays([src, dst])
        out = pa.concat_arrays(
            [pa.array(np.ones(len(src), np.int64)),
             pa.array(np.zeros(len(dst), np.int64))]
        )
        t = pa.table({"url": urls, "outd": out})
        df = pl.from_arrow(t).group_by("url").agg(pl.col("outd").sum())
        return df.to_arrow()

    nodes = (
        edges.map_batches(nodes_batch, batch_format="pyarrow")
        .groupby("url")
        .aggregate(Sum("outd"))
        .map_batches(
            lambda t: pa.table(
                {"url": t.column("url"), "outd": t.column("sum(outd)")}
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table({"url": pa.array([], pa.string()),
                      "rank_bp": pa.array([], pa.int64())})
        )

    # ranks: (url, rank, outd); rank starts uniform (int64 fixed-point)
    r0 = PR_FP // n_nodes
    ranks = nodes.map_batches(
        lambda t: t.append_column(
            "rank", pa.array(np.full(t.num_rows, r0, np.int64))
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        # dangling mass: one tiny aggregate (int — order-independent)
        def dang(b: pa.Table) -> pa.Table:
            m = b.column("outd").to_numpy() == 0
            return pa.table(
                {"d": pa.array([int(b.column("rank").to_numpy()[m].sum())])}
            )

        # iter_batches may coalesce the one-row-per-block outputs into a
        # single batch — sum EVERY row, not row [0] of each batch
        dangling = sum(
            x
            for t in ranks.map_batches(dang, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
            for x in t.column("d").to_pylist()
        )

        # exchange 1: ship each page's rank/outd to its edges (key=src)
        def tag_ranks(b: pa.Table) -> pa.Table:
            u = b.column("url").combine_chunks()
            return pa.table(
                {"route": _route_str(u, nr), "kind": pa.array(np.zeros(b.num_rows, np.int8)),
                 "k": u, "rank": b.column("rank"),
                 "outd": b.column("outd"), "dst": pa.nulls(b.num_rows, pa.string())}
            )

        def tag_edges(b: pa.Table) -> pa.Table:
            s = b.column("src_url").combine_chunks()
            return pa.table(
                {"route": _route_str(s, nr), "kind": pa.array(np.ones(b.num_rows, np.int8)),
                 "k": s, "rank": pa.nulls(b.num_rows, pa.int64()),
                 "outd": pa.nulls(b.num_rows, pa.int64()),
                 "dst": b.column("dst_url")}
            )

        def share_join(g: pa.Table) -> pa.Table:
            df = pl.from_arrow(g)
            r = df.filter(pl.col("kind") == 0).select(
                ["k", "rank", "outd"]
            )
            e = df.filter(pl.col("kind") == 1).select(["k", "dst"])
            j = e.join(r, on="k", how="inner")
            j = j.with_columns(
                (pl.col("rank") // pl.col("outd")).alias("share")
            )
            return j.select(["dst", "share"]).to_arrow()

        shares = (
            ranks.map_batches(tag_ranks, batch_format="pyarrow")
            .union(edges.map_batches(tag_edges, batch_format="pyarrow"))
            .groupby("route")
            .map_groups(share_join, batch_format="pyarrow")
        )

        # exchange 2: sum shares per destination, then fold into ranks
        def part_sum(b: pa.Table) -> pa.Table:
            df = pl.from_arrow(b).group_by("dst").agg(pl.col("share").sum())
            return df.to_arrow()

        def tag_contrib(b: pa.Table) -> pa.Table:
            u = b.column("dst").combine_chunks()
            return pa.table(
                {"route": _route_str(u, nr), "kind": pa.array(np.ones(b.num_rows, np.int8)),
                 "k": u, "contrib": b.column("share"),
                 "outd": pa.nulls(b.num_rows, pa.int64())}
            )

        def tag_nodes(b: pa.Table) -> pa.Table:
            u = b.column("url").combine_chunks()
            return pa.table(
                {"route": _route_str(u, nr), "kind": pa.array(np.zeros(b.num_rows, np.int8)),
                 "k": u, "contrib": pa.nulls(b.num_rows, pa.int64()),
                 "outd": b.column("outd")}
            )

        base = ((100 - damping_pct) * PR_FP) // (100 * n_nodes) + (
            damping_pct * dangling
        ) // (100 * n_nodes)

        def fold(g: pa.Table) -> pa.Table:
            df = pl.from_arrow(g)
            nn = df.filter(pl.col("kind") == 0).select(["k", "outd"])
            cc = (
                df.filter(pl.col("kind") == 1)
                .group_by("k")
                .agg(pl.col("contrib").sum())
            )
            j = nn.join(cc, on="k", how="left").with_columns(
                (pl.lit(base, pl.Int64)
                 + (damping_pct * pl.col("contrib").fill_null(0)) // 100
                 ).alias("rank")
            )
            return j.select(["k", "outd", "rank"]).rename({"k": "url"}).to_arrow()

        ranks = (
            nodes.map_batches(tag_nodes, batch_format="pyarrow")
            .union(
                shares.map_batches(part_sum, batch_format="pyarrow").map_batches(
                    tag_contrib, batch_format="pyarrow"
                )
            )
            .groupby("route")
            .map_groups(fold, batch_format="pyarrow")
        ).materialize()

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": b.column("url"),
                "rank_bp": pa.array(
                    b.column("rank").to_numpy() // (PR_FP // rank_scale)
                ),
            }
        )

    return ranks.map_batches(finish, batch_format="pyarrow")


def pr_ranks(src: np.ndarray, dst: np.ndarray, w: np.ndarray, n: int,
             damping: float = 0.85, iters: int = 20) -> np.ndarray:
    """Weighted-PageRank power iteration over an indexed edge list.

    DETERMINISM CONTRACT: callers pass edges sorted by (src, dst) so
    the ``np.add.at`` accumulation order — and therefore every floating
    bit of the result — is a pure function of the graph.  This is what
    lets an independently-derived graph (e.g. the synthetic-web
    generator's closed-form edge table) serve as a value-exact oracle
    for the crawl/parse-derived one."""
    w = w.astype(np.float64)
    out_w = np.zeros(n)
    np.add.at(out_w, src, w)
    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        share = np.where(out_w[src] > 0, rank[src] * w / out_w[src], 0.0)
        np.add.at(contrib, dst, share)
        dangling = rank[out_w == 0].sum() / n
        rank = (1 - damping) / n + damping * (contrib + dangling)
    return rank


def host_pagerank(edges_ds, damping: float = 0.85, iters: int = 20) -> pa.Table:
    """PageRank over the aggregated host graph.

    The host graph (one row per (src_host, dst_host) after the
    distributed aggregation) is tiny relative to the page graph, so the
    iteration runs driver-side; edges are sorted before the power
    iteration per the :func:`pr_ranks` determinism contract, making the
    output value-comparable against the generator's closed-form oracle
    (``pages.write_oracle`` host_pr table).

    Returns (host, rank_bp) with rank floor-scaled to int."""
    ht = _collect(host_edges(edges_ds))
    df = pl.from_arrow(ht).drop_nulls().sort(["src_host", "dst_host"])
    return host_pr_table(df["src_host"].to_list(), df["dst_host"].to_list(),
                         df["weight"].to_numpy(), damping, iters)


def host_pr_table(src_hosts: list[str], dst_hosts: list[str], w: np.ndarray,
                  damping: float = 0.85, iters: int = 20) -> pa.Table:
    """(sorted (src_host, dst_host, weight) triples) -> (host, rank_bp)
    table, hosts sorted.  Shared by the engine path and the analytic
    oracle writer so both sides apply the identical deterministic
    arithmetic to their independently-derived graphs."""
    hosts = sorted(set(src_hosts) | set(dst_hosts))
    n = len(hosts)
    if n == 0:
        return pa.table({"host": pa.array([], pa.string()),
                         "rank_bp": pa.array([], pa.int64())})
    idx = {h: i for i, h in enumerate(hosts)}
    src = np.array([idx[h] for h in src_hosts])
    dst = np.array([idx[h] for h in dst_hosts])
    rank = pr_ranks(src, dst, w, n, damping, iters)
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "rank_bp": pa.array(np.floor(1e7 * rank).astype(np.int64)),
        }
    )


# ---------------------------------------------------- connected components

def connected_components(edges_ds, src_col: str = "src_host",
                         dst_col: str = "dst_host",
                         max_iters: int = 64,
                         n_routes: int | None = None):
    """Distributed connected components of the undirected graph given by
    (``src_col``, ``dst_col``) edges: iterated min-label propagation to
    the exact fixpoint, where a node's final ``component`` is the
    lexicographically smallest node id reachable from it.

    Every iteration is two reduce-side exchanges (the union + coarse
    route + one vectorized polars join per group pattern shared with
    :func:`page_pagerank`), moving O(edges) pre-joined label rows — the
    label vector and edge list stay sharded at any graph size.  The
    driver holds only the per-iteration changed-count scalar and stops
    at 0 (or ``max_iters``, bounding worst-case chains).  The fixpoint
    is unique, so the result is order/partitioning-invariant and
    value-exact against a recursive-CTE SQL oracle.

    Returns a Dataset (node, component).
    """
    from ray.data.aggregate import Sum

    from ..hashing import routes_for

    und = edges_ds.map_batches(
        lambda b: pa.table({
            "a": pa.concat_arrays([
                b.column(src_col).combine_chunks().cast(pa.large_string()),
                b.column(dst_col).combine_chunks().cast(pa.large_string()),
            ]),
            "b": pa.concat_arrays([
                b.column(dst_col).combine_chunks().cast(pa.large_string()),
                b.column(src_col).combine_chunks().cast(pa.large_string()),
            ]),
        }),
        batch_format="pyarrow",
    ).materialize()  # reused every iteration
    # low route floor: CC runs O(log diameter) chained groupbys, so the
    # usual 256-route floor would pay 256 tiny blocks per exchange per
    # iteration on small graphs; at scale routes still grow to hold
    # ~1M rows per group.
    nr = n_routes if n_routes is not None else routes_for(und.count(), lo=8)

    def init_labels(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).unique(subset=["a"])
        return pa.table({
            "node": df["a"].to_arrow(),
            "label": df["a"].to_arrow(),
        })

    # per-batch unique then one route-reduce gives the node universe
    def dedup_nodes(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g).unique(subset=["node"])
        return df.select(["node", "label"]).to_arrow()

    labels = (und.map_batches(init_labels, batch_format="pyarrow")
              .map_batches(lambda b: b.append_column(
                  "route", _route_str(b.column("node"), nr)),
                  batch_format="pyarrow")
              .groupby("route").map_groups(dedup_nodes,
                                           batch_format="pyarrow")
              .materialize())

    def tag_labels_src(b: pa.Table) -> pa.Table:
        return pa.table({
            "route": _route_str(b.column("node"), nr),
            "kind": pa.array(np.zeros(b.num_rows, np.int8)),
            "k": b.column("node").combine_chunks().cast(pa.large_string()),
            "v": b.column("label").combine_chunks().cast(pa.large_string()),
        })

    def tag_edges(b: pa.Table) -> pa.Table:
        return pa.table({
            "route": _route_str(b.column("a"), nr),
            "kind": pa.array(np.ones(b.num_rows, np.int8)),
            "k": b.column("a").combine_chunks().cast(pa.large_string()),
            "v": b.column("b").combine_chunks().cast(pa.large_string()),
        })

    def neighbor_labels(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g)
        lab = (df.filter(pl.col("kind") == 0)
               .select(pl.col("k").alias("a"), pl.col("v").alias("lab")))
        edg = (df.filter(pl.col("kind") == 1)
               .select(pl.col("k").alias("a"), pl.col("v").alias("b")))
        out = (edg.join(lab, on="a")
               .select(pl.col("b").alias("node"),
                       pl.col("lab").alias("label")))
        # pre-combine: one candidate row per (dst, label) pair
        return out.unique().to_arrow()

    def tag_candidates(b: pa.Table) -> pa.Table:
        return pa.table({
            "route": _route_str(b.column("node"), nr),
            "kind": pa.array(np.ones(b.num_rows, np.int8)),
            "k": b.column("node").combine_chunks().cast(pa.large_string()),
            "v": b.column("label").combine_chunks().cast(pa.large_string()),
        })

    def min_label(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g)
        old = (df.filter(pl.col("kind") == 0)
               .select(pl.col("k").alias("node"), pl.col("v").alias("old")))
        allc = df.select(pl.col("k").alias("node"), pl.col("v").alias("c"))
        new = allc.group_by("node").agg(pl.col("c").min().alias("label"))
        out = old.join(new, on="node")
        return (out.with_columns(
                    (pl.col("label") != pl.col("old"))
                    .cast(pl.Int64).alias("changed"))
                .select(["node", "label", "changed"]).to_arrow())

    def tag_label_edges(b: pa.Table) -> pa.Table:
        # pointer-jumping shortcut edges node<->label (hash-to-min):
        # label(v) is always inside v's component, so these edges never
        # merge components — they only square path lengths, turning the
        # O(diameter) chain worst case into O(log diameter) iterations
        node = b.column("node").combine_chunks().cast(pa.large_string())
        lab = b.column("label").combine_chunks().cast(pa.large_string())
        k = pa.concat_arrays([node, lab])
        v = pa.concat_arrays([lab, node])
        return pa.table({
            "route": _route_str(k, nr),
            "kind": pa.array(np.ones(len(k), np.int8)),
            "k": k,
            "v": v,
        })

    for _ in range(max_iters):
        cand = (labels.map_batches(tag_labels_src, batch_format="pyarrow")
                .union(und.map_batches(tag_edges, batch_format="pyarrow"))
                .union(labels.map_batches(tag_label_edges,
                                          batch_format="pyarrow"))
                .groupby("route")
                .map_groups(neighbor_labels, batch_format="pyarrow"))
        nxt = (labels.map_batches(tag_labels_src, batch_format="pyarrow")
               .union(cand.map_batches(tag_candidates,
                                       batch_format="pyarrow"))
               .groupby("route")
               .map_groups(min_label, batch_format="pyarrow")
               .materialize())
        changed = nxt.sum("changed")
        # block hygiene: without the repartition every union+groupby
        # round multiplies block count, so task-scheduling overhead
        # compounds per iteration even though row counts are flat
        labels = nxt.map_batches(
            lambda b: b.select(["node", "label"]), batch_format="pyarrow"
        ).repartition(nr).materialize()
        if not changed:
            break

    return labels.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "component": b.column("label")}),
        batch_format="pyarrow",
    )


# ------------------------------------------------------------------- HITS

#: fixed-point mass per HITS side.  Deliberately SMALLER than PR_FP:
#: the L1 normalization multiplies raw sums by the scale before the
#: floor-divide, and the exact-split trick below keeps every product in
#: int64 only while ``total * HITS_FP < 2**63`` — with 10**6 that holds
#: up to ~9.2e12 raw mass, i.e. max in/out-degree ~9e6 at full mass,
#: comfortably past any real host/page graph's degree cap.
HITS_FP = 10**6


def _norm_fixed(x: np.ndarray, total: int, fp: int) -> np.ndarray:
    """Exact ``floor(x * fp / total)`` elementwise without int64
    overflow: with ``x = q*total + r`` (``r < total``) the result is
    ``q*fp + (r*fp)//total`` — the only product is ``r*fp < total*fp``,
    inside int64 under the :data:`HITS_FP` bound."""
    q, r = np.divmod(x.astype(np.int64), total)
    return q * fp + (r * fp) // total


def _node_universe(edges_ds, src_col: str, dst_col: str, nr: int):
    """Distinct node universe of an edge Dataset: per-batch unique of
    src ∪ dst, ONE route-keyed exchange, per-group unique.  Shared by
    :func:`hits_scores` and :func:`random_walks`
    (:func:`page_pagerank`'s variant also folds out-degrees into the
    same pass, so it stays fused with its aggregation)."""

    def node_batch(b: pa.Table) -> pa.Table:
        u = pa.concat_arrays([
            b.column(src_col).combine_chunks().cast(pa.large_string()),
            b.column(dst_col).combine_chunks().cast(pa.large_string()),
        ])
        return pa.table({"url": pl.Series(u).unique().to_arrow()})

    def dedup_nodes(g: pa.Table) -> pa.Table:
        return (pl.from_arrow(g).unique(subset=["url"])
                .select(["url"]).to_arrow())

    return (edges_ds.map_batches(node_batch, batch_format="pyarrow")
            .map_batches(lambda b: b.append_column(
                "route", _route_str(b.column("url"), nr)),
                batch_format="pyarrow")
            .groupby("route").map_groups(dedup_nodes,
                                         batch_format="pyarrow"))


def hits_scores(edges_ds, iters: int = 2, fp: int = HITS_FP,
                n_routes: int | None = None):
    """Distributed HITS (Kleinberg hubs/authorities) over a
    (``src_url``, ``dst_url``) edge Dataset — the companion centrality
    to :func:`page_pagerank`, built from the same iterated reduce-side
    exchange idiom so the score vectors and the edge list stay sharded
    at any graph size.

    Each iteration is two half-steps; each half-step is ONE route-keyed
    union+join exchange (ship scores to edges) and ONE Ray-native
    ``groupby(url).aggregate(Sum)`` (sum contributions), followed by a
    driver-scalar L1 normalization:

    - ``auth_raw(v) = sum over edges (u,v) of hub(u)``, then
      ``auth = floor(auth_raw * fp / sum(auth_raw))``;
    - ``hub_raw(u)  = sum over edges (u,v) of auth(v)``, then
      ``hub  = floor(hub_raw  * fp / sum(hub_raw))``.

    DETERMINISM: all arithmetic is int64 fixed-point; integer sums are
    associative, so the result is a pure function of the multigraph
    (parallel edges weight doubly, matching the raw link list) no
    matter how blocks are split.  That lets the fixed iteration count
    unroll EXACTLY in SQL (DuckDB HUGEINT carries the normalization
    product) as a value-exact oracle — the same trick
    :func:`page_pagerank` documents.

    Returns a Dataset (url, auth_fp, hub_fp) over the node universe
    (sources and destinations); nodes with no in-edges score auth 0,
    no out-edges hub 0.
    """
    from ..hashing import routes_for

    edges = edges_ds.materialize()  # reused 2*iters times
    # low route floor, like connected_components: HITS chains
    # 4*iters+2 route-keyed groupbys, so the usual 256-route floor
    # pays hundreds of tiny tasks per exchange on small graphs; at
    # scale routes still grow to hold ~1M rows per group
    nr = n_routes if n_routes is not None else routes_for(edges.count(), lo=8)

    nodes = _node_universe(edges, "src_url", "dst_url", nr).materialize()
    n_nodes = nodes.count()
    empty = pa.table({"url": pa.array([], pa.large_string()),
                      "auth_fp": pa.array([], pa.int64()),
                      "hub_fp": pa.array([], pa.int64())})
    if n_nodes == 0:
        return ray.data.from_arrow(empty)

    def tag_scores(score_col):
        def tag(b: pa.Table) -> pa.Table:
            u = b.column("url").combine_chunks().cast(pa.large_string())
            return pa.table({
                "route": _route_str(u, nr),
                "kind": pa.array(np.zeros(b.num_rows, np.int8)),
                "k": u,
                "s": b.column(score_col),
                "to": pa.nulls(b.num_rows, pa.large_string()),
            })
        return tag

    def tag_edges(from_col: str, to_col: str):
        def tag(b: pa.Table) -> pa.Table:
            s = b.column(from_col).combine_chunks().cast(pa.large_string())
            return pa.table({
                "route": _route_str(s, nr),
                "kind": pa.array(np.ones(b.num_rows, np.int8)),
                "k": s,
                "s": pa.nulls(b.num_rows, pa.int64()),
                "to": b.column(to_col).combine_chunks().cast(pa.large_string()),
            })
        return tag

    # the tagged edge tables are loop-invariant: materialize each
    # direction ONCE (each is reused ``iters`` times below) instead of
    # re-tagging the edge list every half-step
    edges_fwd = edges.map_batches(tag_edges("src_url", "dst_url"),
                                  batch_format="pyarrow").materialize()
    edges_rev = edges.map_batches(tag_edges("dst_url", "src_url"),
                                  batch_format="pyarrow").materialize()

    def push_join(g: pa.Table) -> pa.Table:
        # per route group: join scores onto edges, pre-aggregate by
        # destination so the second exchange carries one row per
        # (route, to) instead of one per edge
        df = pl.from_arrow(g)
        sc = df.filter(pl.col("kind") == 0).select(["k", "s"])
        ed = df.filter(pl.col("kind") == 1).select(["k", "to"])
        out = (ed.join(sc, on="k", how="inner")
               .group_by("to").agg(pl.col("s").sum().alias("raw")))
        return out.rename({"to": "url"}).to_arrow()

    def sum_group(g: pa.Table) -> pa.Table:
        return (pl.from_arrow(g).group_by("url")
                .agg(pl.col("raw").sum()).to_arrow())

    def half_step(scores, tagged_edges, in_col: str, out_col: str):
        """One HITS half-step: push ``in_col`` of ``scores`` along the
        pre-tagged edge direction, sum per target, L1-normalize to
        ``fp`` total with a driver scalar.  Both exchanges are
        int-route-keyed (a string-key ``groupby.aggregate`` shuffle
        measured ~10x slower here).  Returns (url, ``out_col``) for
        targets with non-zero mass only (absent == 0)."""
        raw = (scores.map_batches(tag_scores(in_col),
                                  batch_format="pyarrow")
               .union(tagged_edges)
               .groupby("route").map_groups(push_join,
                                            batch_format="pyarrow")
               .map_batches(lambda b: b.append_column(
                   "route", _route_str(b.column("url"), nr)),
                   batch_format="pyarrow")
               .groupby("route").map_groups(sum_group,
                                            batch_format="pyarrow")
               .materialize())
        total = raw.sum("raw") or 0
        if not total:
            return None
        return raw.map_batches(lambda b: pa.table({
            "url": b.column("url"),
            out_col: pa.array(_norm_fixed(
                b.column("raw").to_numpy(), int(total), fp)),
        }), batch_format="pyarrow").materialize()

    # initial hub mass floors to >= 1 so graphs with more than ``fp``
    # nodes don't silently start (and end) at all-zero; the first
    # normalization rescales total mass to ``fp`` regardless (classic
    # HITS starts from any positive uniform vector).  SQL mirror:
    # greatest(fp // n, 1).
    h0 = max(1, fp // n_nodes)
    hub = nodes.map_batches(
        lambda t: t.append_column(
            "hub", pa.array(np.full(t.num_rows, h0, np.int64))),
        batch_format="pyarrow").materialize()
    auth = None
    # zero flags mirror the SQL oracle's division-by-NULL -> coalesce-0
    # semantics: once a half-step's total mass is 0, that side (and
    # everything derived from it in LATER iterations) is exactly 0 —
    # never a stale previous-iteration vector
    auth_zero = hub_zero = True
    for it in range(iters):
        auth = half_step(hub, edges_fwd, "hub", "auth")
        if auth is None:  # no in-mass anywhere: auth == 0 everywhere
            auth_zero = hub_zero = True
            break
        auth_zero = False
        nxt = half_step(auth, edges_rev, "auth", "hub")
        if nxt is None:  # hub == 0; later iterations would zero auth too
            hub_zero = True
            if it < iters - 1:
                auth_zero = True
            break
        hub, hub_zero = nxt, False

    if auth_zero and hub_zero:
        return nodes.map_batches(lambda b: pa.table({
            "url": b.column("url").combine_chunks().cast(pa.large_string()),
            "auth_fp": pa.array(np.zeros(b.num_rows, np.int64)),
            "hub_fp": pa.array(np.zeros(b.num_rows, np.int64)),
        }), batch_format="pyarrow")

    # final fold: nodes LEFT JOIN auth LEFT JOIN hub (absent -> 0),
    # one route-keyed exchange
    def tag_kv(kind: int, val_col: str | None):
        def tag(b: pa.Table) -> pa.Table:
            u = b.column("url").combine_chunks().cast(pa.large_string())
            v = (b.column(val_col) if val_col
                 else pa.nulls(b.num_rows, pa.int64()))
            return pa.table({
                "route": _route_str(u, nr),
                "kind": pa.array(np.full(b.num_rows, kind, np.int8)),
                "k": u,
                "v": v,
            })
        return tag

    def fold(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g)
        nn = df.filter(pl.col("kind") == 0).select(pl.col("k").alias("url"))
        aa = df.filter(pl.col("kind") == 1).select(
            pl.col("k").alias("url"), pl.col("v").alias("auth_fp"))
        hh = df.filter(pl.col("kind") == 2).select(
            pl.col("k").alias("url"), pl.col("v").alias("hub_fp"))
        out = (nn.join(aa, on="url", how="left")
               .join(hh, on="url", how="left")
               .with_columns(pl.col("auth_fp").fill_null(0),
                             pl.col("hub_fp").fill_null(0)))
        return out.to_arrow()

    tagged = nodes.map_batches(tag_kv(0, None), batch_format="pyarrow")
    if not auth_zero:
        tagged = tagged.union(auth.map_batches(tag_kv(1, "auth"),
                                               batch_format="pyarrow"))
    if not hub_zero:
        tagged = tagged.union(hub.map_batches(tag_kv(2, "hub"),
                                              batch_format="pyarrow"))
    return tagged.groupby("route").map_groups(fold, batch_format="pyarrow")


# ------------------------------------------------------------ co-citation

def host_cocitation(edges_ds, max_out: int = 64, min_cocite: int = 2,
                    n_routes: int | None = None):
    """Host co-citation: pairs of hosts linked by the same source host,
    weighted by how many distinct sources cite both — the classic
    related-sites signal over the link graph.

    Scale shape: pair expansion is quadratic in a source's out-degree,
    so sources with more than ``max_out`` distinct destinations are
    EXCLUDED (a documented skew guard, mirrored in the SQL oracle — a
    portal linking to 10k hosts would otherwise emit 5*10^7 pairs).
    Within the guard each source emits <= ``max_out**2/2`` pairs:

    1. distinct (src_host, dst_host) via :func:`host_edges` (partial
       per-batch combine, one bounded groupby);
    2. route by ``hash(src_host)`` — every pair of one source forms
       inside a single group; ONE vectorized polars self-join per
       route group expands pairs and pre-counts them per (a, b);
    3. one final ``groupby(a, b)`` sums the per-route partials; pairs
       below ``min_cocite`` are dropped (prunes the long tail before
       it leaves the reduce).

    Returns a Dataset (host_a, host_b, cocite) with host_a < host_b.
    """
    from ..hashing import routes_for

    eh = (host_edges(edges_ds)
          .map_batches(lambda t: pa.table(
              {"src_host": t.column("src_host"),
               "dst_host": t.column("dst_host")}),
              batch_format="pyarrow")
          .materialize())
    nr = n_routes if n_routes is not None else routes_for(eh.count(), lo=8)

    def expand(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g)
        # skew guard: drop sources past the out-degree cap
        ok = (df.group_by("src_host").agg(pl.len().alias("d"))
              .filter(pl.col("d") <= max_out).select(["src_host"]))
        df = df.join(ok, on="src_host", how="inner")
        pairs = (df.join(df, on="src_host", how="inner")
                 .filter(pl.col("dst_host") < pl.col("dst_host_right"))
                 .rename({"dst_host": "host_a",
                          "dst_host_right": "host_b"}))
        # per-route partial count (distinct srcs == rows: edges are
        # distinct pairs, so one row per (src, a, b))
        return (pairs.group_by(["host_a", "host_b"])
                .agg(pl.len().cast(pl.Int64).alias("c")).to_arrow())

    pairs = (eh.map_batches(lambda b: b.append_column(
                 "route", _route_str(b.column("src_host"), nr)),
                 batch_format="pyarrow")
             .groupby("route").map_groups(expand, batch_format="pyarrow")
             .groupby(["host_a", "host_b"]).aggregate(Sum("c")))

    def finish(t: pa.Table) -> pa.Table:
        out = pa.table({"host_a": t.column("host_a"),
                        "host_b": t.column("host_b"),
                        "cocite": t.column("sum(c)")})
        import pyarrow.compute as pc
        return out.filter(pc.greater_equal(out.column("cocite"),
                                           pa.scalar(min_cocite)))

    return pairs.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------------------ random walks

#: step-mixing constant for the deterministic walk selector (any odd
#: constant works; value shared verbatim with the SQL oracle)
WALK_STEP_MIX = 40503


def _url_seed_col(col) -> np.ndarray:
    """Per-string deterministic seed: ``sum over i of byte(i) * i``
    with 1-based positions — computable vectorized here (prefix sums
    over the Arrow values buffer) and in SQL via the per-byte unnest
    idiom the LM-chain oracle already uses.  URLs are pure ASCII
    (BURL), so char codes == bytes on both sides.

    Deliberately a WEAK mixer: the oracle constraint (exact SQL
    mirror) drives the choice; a production walk corpus would swap in
    a 64-bit mixer behind the same interface.
    """
    if isinstance(col, pa.Array):
        col = pa.chunked_array([col])
    out = np.empty(len(col), np.int64)
    pos = 0
    for chunk in col.cast(pa.large_string()).chunks:
        n = len(chunk)
        if n == 0:
            continue
        # string arrays expose offsets only through raw buffers
        # (buffers()[1] = int64 offsets for large_string, honoring the
        # array's slice offset); buffers()[2] = the values bytes
        o = np.frombuffer(chunk.buffers()[1], np.int64)[
            chunk.offset:chunk.offset + n + 1].astype(np.int64)
        v = np.frombuffer(chunk.buffers()[2], np.uint8)
        d = v[o[0]:o[-1]].astype(np.int64)
        g = np.arange(o[0], o[-1], dtype=np.int64)
        c1 = np.concatenate([[0], np.cumsum(d)])
        c2 = np.concatenate([[0], np.cumsum(g * d)])
        rel = o - o[0]
        tot_w = c2[rel[1:]] - c2[rel[:-1]]        # sum g*b over span
        tot_b = c1[rel[1:]] - c1[rel[:-1]]        # sum b over span
        # local 1-based position weight: (g - o_i + 1)
        out[pos:pos + n] = tot_w - (o[:-1] - 1) * tot_b
        pos += n
    return out[:pos] if pos != len(out) else out


def random_walks(edges_ds, length: int = 3, n_routes: int | None = None):
    """Deterministic graph walks over (``src_url``, ``dst_url``) edges —
    the corpus-generation step of DeepWalk/node2vec-style graph
    embedding training, expressed as iterated reduce-side exchanges so
    the frontier, adjacency and seed tables stay sharded at any size.

    One walk starts at every node; at step ``t`` a walk at node ``u``
    moves to the ``idx``-th distinct out-neighbor of ``u`` in ascending
    ``dst_url`` order, where

        ``idx = (seed(start)*31 + seed(u) + t*WALK_STEP_MIX) % outdeg(u)``

    and ``seed`` is the positional byte sum of :func:`_url_seed_col`.
    Walks at sink nodes stop early.  Everything is integer arithmetic
    on values derivable from the URL bytes, so a fixed ``length``
    unrolls EXACTLY in SQL (adjacency = ``row_number() - 1`` over the
    distinct edge list; seeds = per-byte unnest) — a value-exact oracle
    for a distributed iterative traversal.

    Scale shape: the adjacency (one row per distinct edge, with index
    and out-degree) and node seeds are built once with one routed
    exchange each and re-read per step; each step is ONE route-keyed
    union+join exchange moving the live frontier.  The driver holds
    nothing but the step counter.

    Returns a Dataset (start, step, url): the node visited at each
    step 1..``length`` of each surviving walk.
    """
    from ..hashing import routes_for

    eh = (edges_ds.map_batches(lambda b: pa.table({
              "u": b.column("src_url").combine_chunks().cast(pa.large_string()),
              "dst": b.column("dst_url").combine_chunks().cast(pa.large_string()),
          }), batch_format="pyarrow")
          .materialize())
    nr = n_routes if n_routes is not None else routes_for(eh.count(), lo=8)

    # adjacency sharded by hash(u): per-route dedup, then index + degree
    # windows inside the route group (all edges of one u share a group)
    def adj_group(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g).unique(subset=["u", "dst"])
              .sort(["u", "dst"]))
        return (df.with_columns(
                    (pl.col("dst").cum_count().over("u") - 1)
                    .cast(pl.Int64).alias("i"),
                    pl.len().over("u").cast(pl.Int64).alias("outd"))
                .to_arrow())

    adj = (eh.map_batches(lambda b: b.append_column(
               "route", _route_str(b.column("u"), nr)),
               batch_format="pyarrow")
           .groupby("route").map_groups(adj_group, batch_format="pyarrow")
           .materialize())

    # node universe (shared routed-dedup exchange) + per-row seeds
    def add_seed(b: pa.Table) -> pa.Table:
        u = b.column("url").combine_chunks()
        return pa.table({"url": u, "sd": pa.array(_url_seed_col(u))})

    nodes = (_node_universe(eh, "u", "dst", nr)
             .map_batches(add_seed, batch_format="pyarrow")
             .materialize())

    # frontier_0: every node starts a walk at itself
    frontier = nodes.map_batches(lambda b: pa.table({
        "start": b.column("url"),
        "sstart": b.column("sd"),
        "cur": b.column("url"),
    }), batch_format="pyarrow").materialize()

    def tag_frontier(b: pa.Table) -> pa.Table:
        cur = b.column("cur").combine_chunks().cast(pa.large_string())
        return pa.table({
            "route": _route_str(cur, nr),
            "kind": pa.array(np.zeros(b.num_rows, np.int8)),
            "k": cur,
            "start": b.column("start").combine_chunks().cast(pa.large_string()),
            "sstart": b.column("sstart"),
            "i": pa.nulls(b.num_rows, pa.int64()),
            "outd": pa.nulls(b.num_rows, pa.int64()),
            "dst": pa.nulls(b.num_rows, pa.large_string()),
            "sd": pa.nulls(b.num_rows, pa.int64()),
        })

    def tag_adj(b: pa.Table) -> pa.Table:
        u = b.column("u").combine_chunks().cast(pa.large_string())
        return pa.table({
            "route": b.column("route"),
            "kind": pa.array(np.ones(b.num_rows, np.int8)),
            "k": u,
            "start": pa.nulls(b.num_rows, pa.large_string()),
            "sstart": pa.nulls(b.num_rows, pa.int64()),
            "i": b.column("i"),
            "outd": b.column("outd"),
            "dst": b.column("dst").combine_chunks().cast(pa.large_string()),
            "sd": pa.nulls(b.num_rows, pa.int64()),
        })

    def tag_seeds(b: pa.Table) -> pa.Table:
        u = b.column("url").combine_chunks().cast(pa.large_string())
        return pa.table({
            "route": _route_str(u, nr),
            "kind": pa.array(np.full(b.num_rows, 2, np.int8)),
            "k": u,
            "start": pa.nulls(b.num_rows, pa.large_string()),
            "sstart": pa.nulls(b.num_rows, pa.int64()),
            "i": pa.nulls(b.num_rows, pa.int64()),
            "outd": pa.nulls(b.num_rows, pa.int64()),
            "dst": pa.nulls(b.num_rows, pa.large_string()),
            "sd": b.column("sd"),
        })

    # the tagged adjacency and seed tables are loop-invariant:
    # materialize them once and union the SAME blocks into every step's
    # exchange instead of re-tagging per step
    adj_tagged = adj.map_batches(tag_adj, batch_format="pyarrow").materialize()
    seeds_tagged = nodes.map_batches(tag_seeds,
                                     batch_format="pyarrow").materialize()

    outputs = []
    for t in range(1, length + 1):
        def step(g: pa.Table, _t=t) -> pa.Table:
            df = pl.from_arrow(g)
            fr = (df.filter(pl.col("kind") == 0)
                  .select(pl.col("k").alias("cur"), "start", "sstart"))
            ad = (df.filter(pl.col("kind") == 1)
                  .select(pl.col("k").alias("cur"), "i", "outd", "dst"))
            sd = (df.filter(pl.col("kind") == 2)
                  .select(pl.col("k").alias("cur"), "sd"))
            j = (fr.join(sd, on="cur", how="inner")
                 .join(ad.select(["cur", "outd"]).unique(), on="cur",
                       how="inner")
                 .with_columns(
                     ((pl.col("sstart") * 31 + pl.col("sd")
                       + _t * WALK_STEP_MIX) % pl.col("outd")).alias("i")))
            nxt = (j.join(ad, on=["cur", "i", "outd"], how="inner")
                   .select("start", "sstart",
                           pl.col("dst").alias("cur")))
            return nxt.to_arrow()

        frontier = (frontier.map_batches(tag_frontier,
                                         batch_format="pyarrow")
                    .union(adj_tagged)
                    .union(seeds_tagged)
                    .groupby("route").map_groups(step,
                                                 batch_format="pyarrow")
                    .materialize())
        outputs.append(frontier.map_batches(lambda b, _t=t: pa.table({
            "start": b.column("start"),
            "step": pa.array(np.full(b.num_rows, _t, np.int64)),
            "url": b.column("cur"),
        }), batch_format="pyarrow"))

    out = outputs[0]
    for o in outputs[1:]:
        out = out.union(o)
    return out


# ---------------------------------------------------------------- triangles

def host_triangles(edges_ds, max_deg: int = 64, n_routes: int | None = None):
    """Per-host triangle counts over the UNDIRECTED distinct host
    graph (self-loops dropped): ``triangles(h)`` = number of triangles
    whose wedge CENTER is ``h`` — for a fully guard-free graph that
    equals the number of triangles containing ``h``.

    Skew guard (documented, mirrored in the SQL oracle): wedges are
    only generated at centers with degree <= ``max_deg``, bounding the
    wedge volume at ``max_deg`` x edges — a hub with 10^5 neighbors
    would otherwise emit 5*10^9 wedge rows.  Triangles whose all three
    wedge centers are over-cap vanish; centers under the cap keep
    exact counts.

    Shape: one routed exchange builds per-center neighbor groups
    (every (a, *) row of a center co-locates), ONE vectorized polars
    self-join per group emits wedges; wedges then co-route with the
    (a < b) edge probe table on the wedge's first leg, ONE join per
    group confirms closure; a final bounded ``groupby(host).sum``
    folds the partials.  Returns a Dataset (host, triangles).
    """
    from ..hashing import routes_for

    d = (host_edges(edges_ds)
         .map_batches(lambda t: pa.table(
             {"a": t.column("src_host"), "b": t.column("dst_host")}),
             batch_format="pyarrow")
         .materialize())
    nr = n_routes if n_routes is not None else routes_for(d.count(), lo=8)

    def und_batch(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).filter(pl.col("a") != pl.col("b"))
        both = pl.concat([df, df.rename({"a": "b", "b": "a"})
                          .select(["a", "b"])]).unique()
        return both.to_arrow()

    # route by the center column so each group holds every neighbor of
    # its centers; dedup inside the group (batch-level unique above is
    # only a shrink)
    und = (d.map_batches(und_batch, batch_format="pyarrow")
           .map_batches(lambda b: b.append_column(
               "route", _route_str(b.column("a"), nr)),
               batch_format="pyarrow")
           .materialize())

    def wedges(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g).unique(subset=["a", "b"])
        ok = (df.group_by("a").agg(pl.len().alias("dg"))
              .filter(pl.col("dg") <= max_deg).select(["a"]))
        df = df.join(ok, on="a", how="inner")
        w = (df.join(df, on="a", how="inner")
             .filter(pl.col("b") < pl.col("b_right"))
             .select(pl.col("b").alias("x"),
                     pl.col("b_right").alias("y"),
                     pl.col("a").alias("c")))
        return w.to_arrow()

    wedge_ds = (und.groupby("route")
                .map_groups(wedges, batch_format="pyarrow"))

    def tag_wedge(b: pa.Table) -> pa.Table:
        return pa.table({
            "route": _route_str(b.column("x"), nr),
            "kind": pa.array(np.zeros(b.num_rows, np.int8)),
            "x": b.column("x").combine_chunks().cast(pa.large_string()),
            "y": b.column("y").combine_chunks().cast(pa.large_string()),
            "c": b.column("c").combine_chunks().cast(pa.large_string()),
        })

    def tag_edge(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).filter(pl.col("a") < pl.col("b"))
        t = df.to_arrow()
        return pa.table({
            "route": _route_str(t.column("a"), nr),
            "kind": pa.array(np.ones(t.num_rows, np.int8)),
            "x": t.column("a").combine_chunks().cast(pa.large_string()),
            "y": t.column("b").combine_chunks().cast(pa.large_string()),
            "c": pa.nulls(t.num_rows, pa.large_string()),
        })

    def close(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g)
        w = df.filter(pl.col("kind") == 0).select(["x", "y", "c"])
        e = (df.filter(pl.col("kind") == 1).select(["x", "y"])
             .unique())
        hit = w.join(e, on=["x", "y"], how="inner")
        return (hit.group_by("c").agg(pl.len().cast(pl.Int64).alias("t"))
                .to_arrow())

    out = (wedge_ds.map_batches(tag_wedge, batch_format="pyarrow")
           .union(und.map_batches(tag_edge, batch_format="pyarrow"))
           .groupby("route").map_groups(close, batch_format="pyarrow")
           .groupby("c").aggregate(Sum("t")))
    return out.map_batches(lambda t: pa.table({
        "host": t.column("c"),
        "triangles": t.column("sum(t)"),
    }), batch_format="pyarrow")


# -------------------------------------------------------------- reciprocity

def host_reciprocity(edges_ds, n_routes: int | None = None):
    """Per-host link reciprocity: of a host's distinct out-neighbors,
    how many link back — (host, n_out, n_recip, recip_bp) with
    ``recip_bp = 10000 * n_recip // n_out`` (exact basis points).
    Self-loops are excluded.

    Shape: distinct directed host pairs route by their UNORDERED pair
    key, so both directions of any pair land in one group — ONE
    vectorized self-join per group marks reciprocated edges; the
    per-host fold is a second bounded route exchange.  No row ever
    meets more than its own pair, so skew is capped by pair
    multiplicity (2), not degree.
    """
    from ..hashing import routes_for

    d = (host_edges(edges_ds)
         .map_batches(lambda t: pa.table(
             {"a": t.column("src_host"), "b": t.column("dst_host")}),
             batch_format="pyarrow")
         .materialize())
    nr = n_routes if n_routes is not None else routes_for(d.count(), lo=8)

    def tag_pair(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).filter(pl.col("a") != pl.col("b"))
        df = df.with_columns(
            pl.min_horizontal("a", "b").alias("_lo"),
            pl.max_horizontal("a", "b").alias("_hi"))
        t = df.to_arrow()
        import pyarrow.compute as pc
        ukey = pc.binary_join_element_wise(
            t.column("_lo").cast(pa.large_string()),
            t.column("_hi").cast(pa.large_string()),
            pa.scalar("|", pa.large_string()))
        return pa.table({
            "route": _route_str(ukey, nr),
            "a": t.column("a"), "b": t.column("b"),
        })

    def mark(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g).unique(subset=["a", "b"])
        rev = df.select(pl.col("b").alias("a"), pl.col("a").alias("b"),
                        pl.lit(1, dtype=pl.Int64).alias("rec"))
        out = (df.join(rev, on=["a", "b"], how="left")
               .with_columns(pl.col("rec").fill_null(0)))
        return out.select(["a", "rec"]).to_arrow()

    def fold(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g)
        agg = (df.group_by("a")
               .agg(pl.len().cast(pl.Int64).alias("n_out"),
                    pl.col("rec").sum().alias("n_recip")))
        agg = agg.with_columns(
            (10000 * pl.col("n_recip") // pl.col("n_out"))
            .alias("recip_bp"))
        return agg.rename({"a": "host"}).to_arrow()

    return (d.map_batches(tag_pair, batch_format="pyarrow")
            .groupby("route").map_groups(mark, batch_format="pyarrow")
            .map_batches(lambda b: b.append_column(
                "route", _route_str(b.column("a"), nr)),
                batch_format="pyarrow")
            .groupby("route").map_groups(fold, batch_format="pyarrow"))
