"""Round-5 additions: context-window chunking, keep-best dedup,
anchor-text aggregation.  Value-exact DuckDB comparison runs in
tools/oracle_sweep.py / the driver; here we test the properties the
oracles can't — reconstruction, winner semantics, closed-form anchor
equivalence, route-count invariance."""

import os
import sys

import numpy as np
import polars as pl
import pyarrow as pa
import pytest
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bubing_ray.ops import corpus, dedup
from bubing_ray.ops.graph import anchor_edges, anchor_topk


def _collect(ds) -> pa.Table:
    batches = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    return pa.concat_tables(batches) if batches else pa.table({})


# ------------------------------------------------------------- chunk_docs

def _chunk_table():
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "",                      # empty -> one empty chunk
            "short",                 # shorter than chunk -> one chunk
            "x" * 10,                # exactly chunk -> one chunk
            "abcdefghijklmnop",      # 16 chars -> chunks at stride 7
            "中文字符测试七八九十八个字",  # multibyte: codepoint offsets
        ]),
    })


def test_chunk_docs_reconstruction(ray_session):
    ds = ray.data.from_arrow(_chunk_table())
    out = _collect(corpus.chunk_docs(ds, chunk=10, overlap=3)) \
        .sort_by([("doc_id", "ascending"), ("chunk_id", "ascending")])
    df = pl.from_arrow(out)
    src = pl.from_arrow(_chunk_table())
    stride = 7
    for doc_id, text in zip(src["doc_id"], src["text"]):
        chunks = df.filter(pl.col("doc_id") == doc_id)["chunk_text"].to_list()
        n = len(text)
        want = 1 if n <= 10 else 1 + -(-(n - 10) // stride)
        assert len(chunks) == want, (doc_id, chunks)
        # stitching chunk[i][:stride] + last chunk reconstructs the text
        rebuilt = "".join(c[:stride] for c in chunks[:-1]) + chunks[-1]
        assert rebuilt == text, (doc_id, rebuilt)
        # every chunk except the last is exactly `chunk` long
        assert all(len(c) == 10 for c in chunks[:-1])


def test_chunk_docs_rejects_bad_overlap(ray_session):
    ds = ray.data.from_arrow(_chunk_table())
    with pytest.raises(ValueError):
        corpus.chunk_docs(ds, chunk=10, overlap=10)
    with pytest.raises(ValueError):
        corpus.chunk_docs(ds, chunk=10, overlap=-1)


# -------------------------------------------------------- dedup_keep_best

def test_dedup_keep_best_winner_semantics(ray_session):
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "k": pa.array(["a", "a", "a", "b", "b", "c"]),
        "score": pa.array([5, 9, 9, 1, 1, 7], pa.int64()),
    })
    out = _collect(dedup.dedup_keep_best(
        ray.data.from_arrow(t), key="k", score_col="score"))
    df = pl.from_arrow(out).sort("doc_id")
    # group a: max score 9 held by ids 2 and 3 -> min id 2 wins
    # group b: tie at 1 -> id 4; group c: singleton id 6
    assert df["doc_id"].to_list() == [2, 4, 6]
    assert df["score"].to_list() == [9, 1, 7]
    assert df["dup_count"].to_list() == [3, 2, 1]


def test_dedup_keep_best_route_invariance(ray_session):
    rng = np.random.default_rng(11)
    n = 500
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "k": pa.array([f"g{v}" for v in rng.integers(0, 60, n)]),
        "score": pa.array(rng.integers(0, 8, n), pa.int64()),
    })
    outs = []
    for nr in (1, 7):
        out = _collect(dedup.dedup_keep_best(
            ray.data.from_arrow(t), key="k", score_col="score",
            n_routes=nr)).sort_by([("doc_id", "ascending")])
        outs.append(out)
    assert outs[0].equals(outs[1])


# ------------------------------------------------------------ anchor ops

def test_anchor_edges_match_closed_form(ray_session, tmp_path):
    from bubing_ray.pages import expected_anchors, page_url, write_pages

    pages_dir = write_pages(str(tmp_path / "web"), n_hosts=6,
                            pages_per_host=12)
    ds = ray.data.read_parquet(pages_dir, columns=["url", "html"])
    got = pl.from_arrow(_collect(anchor_edges(ds))) \
        .sort(["src_url", "dst_url", "anchor"])
    rows = []
    for h in range(6):
        for i in range(12):
            src = page_url(h, i)
            for dst, txt in expected_anchors(h, i, 6, 12, 8, 0):
                rows.append((src, dst, txt))
    want = pl.DataFrame(
        {"src_url": [r[0] for r in rows],
         "dst_url": [r[1] for r in rows],
         "anchor": [r[2] for r in rows]},
    ).sort(["src_url", "dst_url", "anchor"])
    assert got.equals(want)


def test_anchor_topk_rank_contract(ray_session, tmp_path):
    from bubing_ray.pages import write_pages

    pages_dir = write_pages(str(tmp_path / "web"), n_hosts=6,
                            pages_per_host=12)
    ds = ray.data.read_parquet(pages_dir, columns=["url", "html"])
    edges = pl.from_arrow(_collect(anchor_edges(ds)))
    got = pl.from_arrow(_collect(anchor_topk(ds, k=3))) \
        .sort(["dst", "rnk"])
    # independent model: full count table -> per-dst rank
    want = (
        edges.group_by(["dst_url", "anchor"]).agg(pl.len().cast(pl.Int64).alias("cnt"))
        .sort(["dst_url", "cnt", "anchor"], descending=[False, True, False])
        .with_columns(pl.col("anchor").cum_count().over("dst_url")
                      .cast(pl.Int64).alias("rnk"))
        .filter(pl.col("rnk") <= 3)
        .rename({"dst_url": "dst"})
        .select(["dst", "anchor", "cnt", "rnk"])
        .sort(["dst", "rnk"])
    )
    assert got.equals(want)
    assert got["rnk"].max() <= 3
    # route invariance
    got1 = pl.from_arrow(_collect(anchor_topk(ds, k=3, n_routes=1))) \
        .sort(["dst", "rnk"])
    assert got1.equals(got)


# --------------------------------------------------------- lang_token_cap

def test_lang_token_cap_boundary_semantics(ray_session):
    # hand-built group: ordering is by sample_hash, so rank docs by it
    from bubing_ray.ops.corpus import sample_hash

    ids = np.arange(6, dtype=np.int64)
    texts = ["a b c", "d e", "f", "g h i j", "k", "l m"]  # 3,2,1,4,1,2 toks
    t = pa.table({
        "doc_id": pa.array(ids),
        "lang": pa.array(["en"] * 6),
        "text": pa.array(texts),
    })
    out = pl.from_arrow(_collect(corpus.lang_token_cap(
        ray.data.from_arrow(t), budget=5))).sort("tok_before")
    # model: sort by (hash, id), keep while tok_before < 5
    order = np.lexsort((ids, sample_hash(ids)))
    cum, want = 0, []
    for j in order:
        if cum < 5:
            want.append((int(ids[j]), cum))
        cum += len(texts[j].split())
    assert list(zip(out["doc_id"].to_list(),
                    out["tok_before"].to_list())) == want
    # the crossing doc IS kept: last kept row may end past the budget
    assert out["tok_before"].max() < 5


def test_lang_token_cap_route_invariance(ray_session):
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "lang", "text"])
    outs = []
    for nr in (1, 5):
        out = _collect(corpus.lang_token_cap(
            ray.data.from_arrow(t), budget=200, n_routes=nr))
        outs.append(pl.from_arrow(out).sort("doc_id"))
    assert outs[0].equals(outs[1])


# --------------------------------------------------------------- sample_n

def test_sample_n_partitioning_invariance(ray_session):
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "lang"])
    a = pl.from_arrow(_collect(corpus.sample_n(
        ray.data.from_arrow(t), n=20, keep_cols=("lang",)))).sort("doc_id")
    # same rows regardless of block structure
    b = pl.from_arrow(_collect(corpus.sample_n(
        ray.data.from_arrow(t).repartition(7), n=20,
        keep_cols=("lang",)))).sort("doc_id")
    assert a.equals(b)
    assert a.height == 20
    # model: global smallest (hash, id)
    from bubing_ray.ops.corpus import sample_hash
    ids = t.column("doc_id").to_numpy()
    order = np.lexsort((ids, sample_hash(ids)))[:20]
    assert sorted(a["doc_id"].to_list()) == sorted(ids[order].tolist())
