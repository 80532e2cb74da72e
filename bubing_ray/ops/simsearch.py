"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k as the exact baseline — per-batch numpy
matmul against a broadcast query matrix (``ray.put`` once, read per
actor task, never re-shipped per batch) with partial top-k inside each
batch and a tiny (Q*k per batch) groupby merge — plus an LSH-bucketed
approximate variant as the scale path (signatures partition both sides;
only same-bucket work happens).

No counterpart exists in the reference (BUbiNG has no vector ops);
these are the training-data-pipeline extensions the rebuild spec calls
for.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import ray


def _to_matrix(tbl: pa.Table, vec_col: str) -> np.ndarray:
    col = tbl.column(vec_col).combine_chunks()
    dim = len(col[0])
    return np.asarray(col.flatten()).reshape(-1, dim).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def lowest_id_rows(ds, n: int, id_col: str, vec_col: str) -> pa.Table:
    """The ``n`` rows with the lowest (non-null) ids, sorted by id —
    regardless of where the id space starts.  Each batch keeps only its
    own n lowest rows, so at most n rows per block reach the driver-side
    merge.  Shared by :func:`load_queries` (which L2-normalizes on top)
    and ``dedup.semdedup_fixed`` (which quantizes the raw vectors)."""
    def head_filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch.column(id_col)
        if col.null_count:
            batch = batch.filter(pc.is_valid(col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) > n:
            sel = np.argpartition(ids, n - 1)[:n]
            batch = batch.take(pa.array(np.sort(sel)))
        return batch

    q = ds.select_columns([id_col, vec_col]).map_batches(
        head_filter, batch_format="pyarrow"
    )
    batches = [pa.table(b) for b in q.iter_batches(batch_format="pyarrow")]
    if not batches or not (tbl := pa.concat_tables(batches)
                           .sort_by(id_col).slice(0, n)).num_rows:
        raise ValueError(f"lowest_id_rows: no rows with a non-null {id_col!r}")
    return tbl


def load_queries(ds, n_queries: int, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Deterministic query set: the n_queries lowest (non-null) ids,
    L2-normalized (see :func:`lowest_id_rows` for the scale shape)."""
    tbl = lowest_id_rows(ds, n_queries, id_col, vec_col)
    ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
    mat = _normalize(_to_matrix(tbl, vec_col))
    return ids, mat


def brute_topk(ds, n_queries: int = 8, k: int = 5, id_col: str = "vec_id",
               vec_col: str = "embedding"):
    """Exact cosine top-k: (query_id, neighbor_id, rank), rank 1..k,
    ties broken by lower neighbor_id (total deterministic order).

    Per-batch partials carry only (query, candidate, sim) for the batch
    top-k, merged by a groupby over query_id — the full similarity
    matrix never exists anywhere.
    """
    qids, qmat = load_queries(ds, n_queries, id_col, vec_col)
    qref = ray.put((qids, qmat))

    def partial(batch: pa.Table) -> pa.Table:
        ids, qm = ray.get(qref)
        bids = batch.column(id_col).to_numpy()
        bm = _normalize(_to_matrix(batch, vec_col))
        sims = qm @ bm.T  # (Q, B)
        kk = min(k, sims.shape[1])
        # per-query top-k inside the batch.  The prune must use the SAME
        # total order as the final merge — (sim desc, neighbor_id asc) —
        # or a tied candidate with a lower id can be dropped here and
        # the documented deterministic tie-break silently breaks.
        # lexsort per query row (Q is small) instead of argpartition.
        idx = np.empty((len(ids), kk), dtype=np.int64)
        for qi in range(len(ids)):
            idx[qi] = np.lexsort((bids, -sims[qi]))[:kk]
        rows = np.repeat(np.arange(len(ids)), kk)
        cols = idx.reshape(-1)
        return pa.table(
            {
                "query_id": pa.array(ids[rows]),
                "neighbor_id": pa.array(bids[cols]),
                "sim": pa.array(sims[rows, cols]),
            }
        )

    # merge the tiny (Q*k per batch) partials on the driver: a groupby
    # shuffle here would cost more than the whole result is large
    partials = pa.concat_tables(
        [
            pa.table(b)
            for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        ]
    )
    return _final_topk(partials, k)


def _final_topk(partials: pa.Table, k: int) -> pa.Table:
    df = (
        pl.from_arrow(partials)
        .sort(["query_id", "sim", "neighbor_id"], descending=[False, True, False])
        .group_by("query_id", maintain_order=True)
        .head(k)
        .with_columns(
            pl.col("neighbor_id").cum_count().over("query_id").alias("rank")
        )
    )
    return pa.table(
        {
            "query_id": df["query_id"].to_arrow(),
            "neighbor_id": df["neighbor_id"].to_arrow(),
            "rank": df["rank"].cast(pl.Int64).to_arrow(),
        }
    )


# ------------------------------------------------------------------- LSH ANN

N_PLANES = 12  # 4096 buckets


def _planes(dim: int, seed: int = 777, n: int = N_PLANES) -> np.ndarray:
    # n rows drawn in C order: the first k rows are identical for any
    # n >= k with the same seed, so callers asking for more planes
    # extend the set rather than reshuffling it
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, dim))


def _bucket_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    return (bits.astype(np.uint32) << np.arange(N_PLANES, dtype=np.uint32)[None, :]).sum(
        axis=1, dtype=np.uint32
    )


def lsh_topk(ds, n_queries: int = 8, k: int = 5, id_col: str = "vec_id",
             vec_col: str = "embedding", multiprobe: int = 1):
    """Approximate top-k: random-hyperplane buckets; each vector is
    scored only against queries whose (multi-probed) bucket set
    contains its bucket. Same output schema as brute_topk; recall < 1.

    Scale path: the bucket id is a shuffle key — at 100 TB both sides
    hash-partition by bucket and only same-bucket blocks meet.
    """
    qids, qmat = load_queries(ds, n_queries, id_col, vec_col)
    planes = _planes(qmat.shape[1])
    qb = _bucket_of(qmat, planes)
    # multiprobe: also accept buckets within hamming distance
    # <=multiprobe of the query's own bucket.  Cost is
    # sum(C(N_PLANES, h) for h<=multiprobe) buckets per query — fine for
    # the intended 1-2, combinatorial beyond that, so cap at N_PLANES.
    from itertools import combinations

    probe: dict[int, list[int]] = {}  # bucket -> query idxs probing it
    for qi, b in enumerate(qb):
        cands = {int(b)}
        for h in range(1, min(multiprobe, N_PLANES) + 1):
            for bits in combinations(range(N_PLANES), h):
                mask = 0
                for p in bits:
                    mask |= 1 << p
                cands.add(int(b) ^ mask)
        for c in sorted(cands):
            probe.setdefault(c, []).append(qi)
    qref = ray.put((qids, qmat, probe))

    def partial(batch: pa.Table) -> pa.Table:
        ids, qm, pr = ray.get(qref)
        bids = batch.column(id_col).to_numpy()
        bm = _normalize(_to_matrix(batch, vec_col))
        bb = _bucket_of(bm, planes)
        out_q, out_n, out_s = [], [], []
        # group batch rows by bucket, score each bucket's rows against
        # its probing queries only
        order = np.argsort(bb, kind="stable")
        bounds = np.flatnonzero(np.diff(bb[order], prepend=-1, append=1 << 30))
        for s, e in zip(bounds[:-1], bounds[1:]):
            rows = order[s:e]
            qs = pr.get(int(bb[rows[0]]), None)
            if not qs:
                continue
            sims = qm[qs] @ bm[rows].T
            out_q.append(np.repeat(ids[qs], len(rows)))
            out_n.append(np.tile(bids[rows], len(qs)))
            out_s.append(sims.reshape(-1))
        if not out_q:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "neighbor_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    partials = pa.concat_tables(
        [
            pa.table(b)
            for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        ]
    )
    dedup = pl.from_arrow(partials).unique(subset=["query_id", "neighbor_id"])
    return _final_topk(dedup.to_arrow(), k)


# ------------------------------------------------------------------- IVF ANN

IVF_LISTS = 16   # inverted lists (deterministic "centroids")
IVF_PROBES = 4   # lists probed per query


def _centroids(ds, id_col: str, vec_col: str) -> np.ndarray:
    """Deterministic centroid INIT: the IVF_LISTS lowest-id vectors
    (k-means++ style seeding is unnecessary for a deterministic
    pipeline; pass ``train_iters>0`` to ivf_topk, or call
    :func:`kmeans_centroids`, to Lloyd-refine them)."""
    ids, mat = load_queries(ds, IVF_LISTS, id_col, vec_col)
    return mat


def kmeans_centroids(ds, n_lists: int = IVF_LISTS, iters: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     init: np.ndarray | None = None) -> np.ndarray:
    """Distributed Lloyd k-means on the unit sphere (spherical k-means):
    each iteration broadcasts the centroid matrix (tiny), every batch
    emits per-centroid partial sums + counts (k rows per batch), and the
    driver reduces them — the data never leaves the workers, the
    reduction payload is O(k*d) per batch regardless of corpus size.
    Deterministic: init = lowest-id vectors, fixed iteration count."""
    cents = _normalize(init if init is not None else _centroids(ds, id_col, vec_col))
    # tiny corpora can yield fewer init vectors than requested lists
    n_lists = min(n_lists, cents.shape[0])
    cents = cents[:n_lists]
    dim = cents.shape[1]
    for _ in range(iters):
        ref = ray.put(cents)

        def part(batch: pa.Table) -> pa.Table:
            cc = ray.get(ref)
            bm = _normalize(_to_matrix(batch, vec_col))
            assign = np.argmax(bm @ cc.T, axis=1)
            sums = np.zeros((len(cc), dim))
            np.add.at(sums, assign, bm)
            cnt = np.bincount(assign, minlength=len(cc))
            return pa.table(
                {
                    "cid": pa.array(np.arange(len(cc), dtype=np.int64)),
                    "vsum": pa.FixedSizeListArray.from_arrays(
                        pa.array(sums.reshape(-1)), dim
                    ),
                    "cnt": pa.array(cnt.astype(np.int64)),
                }
            )

        partials = pa.concat_tables(
            [
                pa.table(b)
                for b in ds.map_batches(part, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow"
                )
            ]
        )
        cids = partials.column("cid").to_numpy()
        sums = np.asarray(
            partials.column("vsum").combine_chunks().flatten()
        ).reshape(-1, dim)
        cnts = partials.column("cnt").to_numpy()
        tot = np.zeros((n_lists, dim))
        np.add.at(tot, cids, sums)
        n = np.zeros(n_lists)
        np.add.at(n, cids, cnts)
        # empty lists keep their previous centroid
        nz = n > 0
        cents = cents.copy()
        cents[nz] = tot[nz] / n[nz, None]
        cents = _normalize(cents)
    return cents


def ivf_topk(ds, n_queries: int = 8, k: int = 5, id_col: str = "vec_id",
             vec_col: str = "embedding", train_iters: int = 0):
    """IVF-bucketed approximate top-k: vectors assign to their nearest
    inverted list; each query scores only vectors in its IVF_PROBES
    nearest lists. Same output schema as brute_topk; recall < 1.

    Scale path: list id is the shuffle key — both sides hash-partition
    by list and only same-list blocks meet (the centroid matrix is the
    broadcast small side).
    """
    cents = _centroids(ds, id_col, vec_col)
    if train_iters > 0:
        cents = kmeans_centroids(
            ds, IVF_LISTS, train_iters, id_col, vec_col, init=cents
        )
    qids, qmat = load_queries(ds, n_queries, id_col, vec_col)
    qsims = qmat @ cents.T
    # per query: the IVF_PROBES nearest lists
    probes = np.argsort(-qsims, axis=1)[:, :IVF_PROBES]
    list_to_q: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for l in probes[qi]:
            list_to_q.setdefault(int(l), []).append(qi)
    qref = ray.put((qids, qmat, list_to_q, cents))

    def partial(batch: pa.Table) -> pa.Table:
        ids, qm, l2q, cc = ray.get(qref)
        bids = batch.column(id_col).to_numpy()
        bm = _normalize(_to_matrix(batch, vec_col))
        assign = np.argmax(bm @ cc.T, axis=1)
        out_q, out_n, out_s = [], [], []
        order = np.argsort(assign, kind="stable")
        bounds = np.flatnonzero(
            np.diff(assign[order], prepend=-1, append=1 << 30)
        )
        for s_, e_ in zip(bounds[:-1], bounds[1:]):
            rows = order[s_:e_]
            qs = l2q.get(int(assign[rows[0]]))
            if not qs:
                continue
            sims = qm[qs] @ bm[rows].T
            out_q.append(np.repeat(ids[qs], len(rows)))
            out_n.append(np.tile(bids[rows], len(qs)))
            out_s.append(sims.reshape(-1))
        if not out_q:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "neighbor_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    partials = pa.concat_tables(
        [
            pa.table(b)
            for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        ]
    )
    dedup = pl.from_arrow(partials).unique(subset=["query_id", "neighbor_id"])
    return _final_topk(dedup.to_arrow(), k)


# ------------------------------------------------------------ lexical search

def tfidf_topk(ds, terms: list[str], k: int = 20, scale: int = 10_000,
               n_routes: int | None = None):
    """Integer TF-IDF keyword ranking: score(doc) = sum over query
    ``terms`` of ``tf(doc, term) * ((scale * n_docs) // df(term))``,
    top-``k`` by (score desc, doc_id asc).

    All arithmetic is integer (floor-div idf), so the ranking is
    value-exact against a SQL oracle.  Scale shape: one streaming pass
    filters token streams to the (broadcast, tiny) query-term set and
    pre-aggregates tf per (doc, term); the term document frequencies are
    one ≤len(terms)-row aggregate; per-doc scores reduce by doc route;
    the global top-k runs as per-route partial top-k then one final
    k*n_routes-row merge — no stage ever sorts the corpus.
    """
    from ..hashing import derive_routes, route_of

    # corpus tokens are lowercased below — normalize the query side the
    # same way or an uppercase term silently matches nothing
    term_list = sorted({t.lower() for t in terms})
    tset = ray.put(pl.Series("q", term_list))
    nr = derive_routes(ds, n_routes)
    n_docs = ds.count()

    def tf_batch(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        tall = (df.with_columns(pl.col("text").str.to_lowercase()
                                .str.extract_all(r"\S+").alias("t"))
                .select(["doc_id", "t"]).explode("t")
                .filter(pl.col("t").is_in(ray.get(tset)))
                .group_by(["doc_id", "t"])
                .agg(pl.len().cast(pl.Int64).alias("tf")))
        return tall.to_arrow()

    tf_rows = ds.map_batches(tf_batch, batch_format="pyarrow").materialize()

    # df per query term: tiny aggregate (<= len(terms) rows; tf rows are
    # already one row per (doc, term))
    from ray.data.aggregate import Count

    df_batches = [
        pa.table(b) for b in tf_rows.groupby("t").aggregate(Count())
        .iter_batches(batch_format="pyarrow")
    ]
    if not df_batches:
        # no query term occurs anywhere in the corpus: an empty ranking,
        # not a concat_tables([]) crash
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.int64())}))
    df_tbl = pa.concat_tables(df_batches)
    idf = {
        t: (scale * n_docs) // int(c)
        for t, c in zip(df_tbl.column("t").to_pylist(),
                        df_tbl.column("count()").to_pylist())
    }
    idf_ref = ray.put(pl.DataFrame({
        "t": list(idf.keys()),
        "idf": pl.Series(list(idf.values()), dtype=pl.Int64),
    }))

    def score_route(batch: pa.Table) -> pa.Table:
        df = (pl.from_arrow(batch)
              .join(ray.get(idf_ref), on="t")
              .with_columns((pl.col("tf") * pl.col("idf")).alias("part"))
              .group_by("doc_id")
              .agg(pl.col("part").sum().cast(pl.Int64).alias("score")))
        t = df.to_arrow()
        return t.append_column("route", route_of(t.column("doc_id"), nr))

    def route_topk(group: pa.Table) -> pa.Table:
        df = (pl.from_arrow(group)
              .group_by("doc_id").agg(pl.col("score").sum())
              .sort(["score", "doc_id"], descending=[True, False])
              .head(k))
        return df.select(["doc_id", "score"]).to_arrow()

    def final_topk(batch: pa.Table) -> pa.Table:
        df = (pl.from_arrow(batch)
              .sort(["score", "doc_id"], descending=[True, False])
              .head(k))
        return df.to_arrow()

    return (tf_rows.map_batches(score_route, batch_format="pyarrow")
            .groupby("route")
            .map_groups(route_topk, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final_topk, batch_format="pyarrow"))


def bm25_topk(ds, terms: list[str], k: int = 20, scale: int = 10_000,
              n_routes: int | None = None):
    """Integer fixed-point BM25 ranking (k1=1.2, b=0.75), top-``k`` by
    (score desc, doc_id asc).

    BM25's per-term contribution ``idf * tf*(k1+1) / (tf + k1*(1-b +
    b*dl/avgdl))`` is evaluated as an exact integer rational: with
    k1=6/5, b=3/4 and ``A = (100*total_tokens) // n_docs`` (centi-token
    average doc length) the fraction multiplies through to

        part = (44*tf*A*scale) // (20*tf*A + 6*A + 1800*dl)
        score(doc) = sum_t ((scale*n_docs)//df(t)) * part(t, doc)

    — every step is int64 (floor-div), so the ranking is value-exact
    against a SQL oracle at any parallelism.  Bounds: exact while
    ``44*tf*A*scale < 2^63`` (tf ≤ ~1e4 tokens of one term per doc at
    A ≤ 2e5, i.e. 2000-token average docs) — far beyond web text.

    Scale shape mirrors :func:`tfidf_topk`: one streaming tokenization
    pass emits per-(doc, query-term) tf rows carrying the doc length,
    plus one corpus-token-count partial per batch (the avgdl input —
    never a second corpus pass); df is a ≤len(terms)-row aggregate; the
    global top-k is per-route partial top-k then one k*n_routes merge.
    """
    from ..hashing import derive_routes, route_of

    # corpus tokens are lowercased below — normalize the query side the
    # same way or an uppercase term silently matches nothing
    term_list = sorted({t.lower() for t in terms})
    tset = ray.put(pl.Series("q", term_list))
    nr = derive_routes(ds, n_routes)
    n_docs = ds.count()

    def tf_batch(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        toks = (df.with_columns(pl.col("text").str.to_lowercase()
                                .str.extract_all(r"\S+").alias("t"))
                .with_columns(pl.col("t").list.len()
                              .cast(pl.Int64).alias("dl"))
                .select(["doc_id", "t", "dl"]))
        tall = (toks.explode("t")
                .filter(pl.col("t").is_in(ray.get(tset)))
                .group_by(["doc_id", "t"])
                .agg(pl.len().cast(pl.Int64).alias("tf"),
                     pl.col("dl").first()))
        # sentinel row: this batch's total token count (the avgdl
        # numerator), folded into the same pass — no second corpus scan
        total = int(toks["dl"].sum()) if len(toks) else 0
        sent = pl.DataFrame({
            "doc_id": pl.Series([-1], dtype=pl.Int64),
            "t": pl.Series([""], dtype=pl.Utf8),
            "tf": pl.Series([total], dtype=pl.Int64),
            "dl": pl.Series([0], dtype=pl.Int64),
        })
        return pl.concat([tall.select(["doc_id", "t", "tf", "dl"]), sent]) \
            .to_arrow()

    tf_rows = ds.map_batches(tf_batch, batch_format="pyarrow").materialize()

    # distributed reductions — only the ≤len(terms)-row df table and the
    # scalar token total ever reach the driver (tf rows themselves may be
    # corpus-sized for common terms and stay in the object store)
    def keep_sentinel(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return b.filter(pc.equal(b.column("doc_id"), -1))

    def drop_sentinel(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return b.filter(pc.not_equal(b.column("doc_id"), -1))

    total_tokens = int(
        tf_rows.map_batches(keep_sentinel, batch_format="pyarrow")
        .sum("tf") or 0)
    A = (100 * total_tokens) // n_docs  # centi-token average doc length

    from ray.data.aggregate import Count

    df_batches = [
        pa.table(b)
        for b in tf_rows.map_batches(drop_sentinel, batch_format="pyarrow")
        .groupby("t").aggregate(Count())
        .iter_batches(batch_format="pyarrow")
    ]
    if not df_batches:
        # no query term occurs anywhere in the corpus: an empty ranking,
        # not a concat_tables([]) crash
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.int64())}))
    df_tbl = pa.concat_tables(df_batches)
    idf = pl.DataFrame({
        "t": df_tbl.column("t").to_pylist(),
        "idf": pl.Series(
            [(scale * n_docs) // int(c)
             for c in df_tbl.column("count()").to_pylist()],
            dtype=pl.Int64),
    })
    idf_ref = ray.put(idf)

    def score_route(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).filter(pl.col("doc_id") != -1)
        if not len(df):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.int64()),
                             "route": pa.array([], pa.int64())})
        df = (df.join(ray.get(idf_ref), on="t")
              .with_columns(
                  ((pl.lit(44, dtype=pl.Int64) * pl.col("tf") * A * scale)
                   // (pl.lit(20, dtype=pl.Int64) * pl.col("tf") * A
                       + 6 * A + 1800 * pl.col("dl"))).alias("part"))
              .with_columns((pl.col("idf") * pl.col("part")).alias("sc"))
              .group_by("doc_id")
              .agg(pl.col("sc").sum().cast(pl.Int64).alias("score")))
        t = df.to_arrow()
        return t.append_column("route", route_of(t.column("doc_id"), nr))

    def route_topk(group: pa.Table) -> pa.Table:
        df = (pl.from_arrow(group)
              .group_by("doc_id").agg(pl.col("score").sum())
              .sort(["score", "doc_id"], descending=[True, False])
              .head(k))
        return df.select(["doc_id", "score"]).to_arrow()

    def final_topk(batch: pa.Table) -> pa.Table:
        df = (pl.from_arrow(batch)
              .sort(["score", "doc_id"], descending=[True, False])
              .head(k))
        return df.to_arrow()

    return (tf_rows.map_batches(score_route, batch_format="pyarrow")
            .groupby("route")
            .map_groups(route_topk, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final_topk, batch_format="pyarrow"))


# ----------------------------------------------------------------- kNN graph

#: size guard for the exact kNN graph's broadcast candidate matrix
#: (rows x dim float64 must fit each worker's heap; past this, use the
#: IVF/LSH bucketed paths, which never materialize the full matrix)
KNN_BROADCAST_LIMIT = 2_000_000


def knn_graph(ds, k: int = 5, id_col: str = "vec_id",
              vec_col: str = "embedding",
              broadcast_limit: int = KNN_BROADCAST_LIMIT):
    """Exact cosine k-nearest-neighbor GRAPH: every vector is a query;
    output (vec_id, neighbor_id, rank) with rank 1..k, self excluded,
    ties broken by lower neighbor_id — the dense baseline for
    embedding-space analysis (SemDeDup-style pruning, graph-based
    retrieval indexes).

    Shape: the candidate side is L2-normalized once into a single
    matrix broadcast via ``ray.put`` (read per actor task, never
    re-shipped per batch); each batch computes one (B x N) matmul and
    keeps its rows' top-k.  The matrix is SIZE-GUARDED at
    ``broadcast_limit`` rows — the exact graph is O(n^2) work by
    definition, so past the guard this op raises and the caller picks
    the bucketed approximations (:func:`lsh_topk` / :func:`ivf_topk`
    shapes) that trade recall for never holding the full matrix.
    """
    mat_tbl = None  # assembled driver-side from bounded per-batch prunes
    cnt = ds.count()
    if cnt > broadcast_limit:
        raise ValueError(
            f"knn_graph: {cnt} vectors exceed broadcast_limit="
            f"{broadcast_limit}; use the LSH/IVF bucketed variants")
    batches = [pa.table(b) for b in
               ds.select_columns([id_col, vec_col])
               .iter_batches(batch_format="pyarrow")]
    mat_tbl = pa.concat_tables(batches)
    cids = mat_tbl.column(id_col).to_numpy(zero_copy_only=False)
    cmat = _normalize(_to_matrix(mat_tbl, vec_col))
    cref = ray.put((cids, cmat))

    def partial(batch: pa.Table) -> pa.Table:
        ids, cm = ray.get(cref)
        bids = batch.column(id_col).to_numpy()
        bm = _normalize(_to_matrix(batch, vec_col))
        sims = bm @ cm.T  # (B, N)
        # exclude self-matches by id (not by position: the broadcast
        # table's row order is independent of the batch's)
        self_mask = bids[:, None] == ids[None, :]
        sims[self_mask] = -np.inf
        kk = min(k, sims.shape[1] - 1) if sims.shape[1] > 1 else 0
        if kk <= 0:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
            })
        # per-row top-k with the documented total order
        # (sim desc, neighbor_id asc)
        idx = np.empty((len(bids), kk), dtype=np.int64)
        for qi in range(len(bids)):
            idx[qi] = np.lexsort((ids, -sims[qi]))[:kk]
        rows = np.repeat(np.arange(len(bids)), kk)
        cols = idx.reshape(-1)
        return pa.table({
            "vec_id": pa.array(bids[rows]),
            "neighbor_id": pa.array(ids[cols]),
            "rank": pa.array(np.tile(np.arange(1, kk + 1), len(bids))),
        })

    return ds.map_batches(partial, batch_format="pyarrow")
