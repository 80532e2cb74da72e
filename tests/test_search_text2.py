"""BM25 fixed-point ranking and text normalization vs DuckDB models."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bubing_ray.ops.simsearch import bm25_topk
from bubing_ray.ops.text import normalize_text

WORDS = ["data", "merge", "stream", "window", "alpha", "beta", "gamma",
         "delta", "epsilon", "zeta"]


@pytest.fixture(scope="module")
def docs(ray_session):
    import ray

    rng = np.random.default_rng(3)
    texts = [
        " ".join(rng.choice(WORDS, size=rng.integers(3, 60)))
        for _ in range(300)
    ]
    t = pa.table({
        "doc_id": pa.array(np.arange(300, dtype=np.int64)),
        "text": pa.array(texts),
    })
    return ray.data.from_arrow(t).repartition(5), t


def test_bm25_matches_sql_model(docs):
    ds, t = docs
    terms = ["data", "merge", "stream", "window"]
    got = ds and bm25_topk(ds, terms, k=15).to_pandas()
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    terms_sql = ", ".join(f"'{w}'" for w in sorted(set(terms)))
    exp = con.execute(rf"""
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
), tlx AS (SELECT doc_id, unnest(toks) AS t FROM tokx
), tfx AS (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
  FROM tlx WHERE t IN ({terms_sql}) GROUP BY doc_id, t
), dfx AS (SELECT t, count(DISTINCT doc_id) AS df FROM tfx GROUP BY t
), scx AS (
  SELECT tfx.doc_id,
    CAST(sum(((10000 * (SELECT count(*) FROM documents)) // dfx.df)
             * ((44 * tfx.tf * ax.A * 10000)
                // (20 * tfx.tf * ax.A + 6 * ax.A + 1800 * dlx.dl)))
         AS BIGINT) AS score
  FROM tfx JOIN dfx USING (t) JOIN dlx USING (doc_id) CROSS JOIN ax
  GROUP BY tfx.doc_id
)
SELECT doc_id, score FROM scx ORDER BY score DESC, doc_id LIMIT 15
""").fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp, check_dtype=False)


def test_bm25_length_normalization(ray_session):
    """Same tf: the shorter doc must score higher (the property BM25
    adds over TF-IDF)."""
    import ray

    t = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array([
            "data data",  # short
            "data data " + " ".join(["filler"] * 50),  # long, same tf
        ]),
    })
    got = bm25_topk(ray.data.from_arrow(t), ["data"], k=2).to_pandas()
    assert got["doc_id"].tolist() == [1, 2]
    assert got["score"].iloc[0] > got["score"].iloc[1]


def test_normalize_text_matches_duckdb(ray_session):
    import ray

    texts = [
        "école  du\trenard",        # NFD -> NFC composition
        "  leading and trailing   ",
        "ctrl\x00chars\x1fhere\x7f!",
        "nbsp stays",                 # NBSP is not RE2 \s
        "",
        "tabs\t\tand\nnewlines\r\n",
    ]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    })
    got = normalize_text(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    exp = con.execute(r"""
SELECT doc_id,
  trim(regexp_replace(
    regexp_replace(nfc_normalize(text), '[\x00-\x1F\x7F]', ' ', 'g'),
    '\s+', ' ', 'g'), ' ') AS norm_text
FROM documents ORDER BY doc_id
""").fetchdf()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got.loc[0, "norm_text"].startswith("école")
    assert got.loc[3, "norm_text"] == "nbsp stays"


def test_knn_graph_exact_and_guard(ray_session):
    """kNN graph: self excluded, (sim desc, id asc) tie-break, exact
    vs a numpy reference; past the broadcast guard it refuses."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray as _ray

    from bubing_ray.ops.simsearch import knn_graph

    rng = np.random.default_rng(31)
    n, d, k = 40, 8, 4
    vecs = rng.standard_normal((n, d))
    vecs[7] = vecs[3]  # exact duplicate: tie broken by lower id
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n)),
        "embedding": pa.array([v.astype(np.float32).tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })
    ds = _ray.data.from_arrow(tbl).repartition(3)
    out = (knn_graph(ds, k=k).to_pandas()
           .sort_values(["vec_id", "rank"]).reset_index(drop=True))
    # numpy reference with identical float32->float64 path + total order
    m = vecs.astype(np.float32).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    np.fill_diagonal(sims, -np.inf)
    for q in range(n):
        order = np.lexsort((np.arange(n), -sims[q]))[:k]
        sub = out[out.vec_id == q]
        assert list(sub.neighbor_id) == list(order)
        assert list(sub["rank"]) == [1, 2, 3, 4]
        assert q not in set(sub.neighbor_id)
    # duplicate vectors rank each other first
    assert out[(out.vec_id == 7) & (out["rank"] == 1)].neighbor_id.iloc[0] == 3
    with pytest.raises(ValueError, match="broadcast_limit"):
        knn_graph(ds, k=k, broadcast_limit=10)
