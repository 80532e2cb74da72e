"""Regression tests for the round-5 third review pass (dedup, corpus,
text, multimodal): clean-corpus crash, LSH plane truncation, sentinel
short-doc false positives (engine AND oracle), offset id spaces,
null-text encode, degenerate payloads, floor-vs-truncate bucketing."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bubing_ray.ops import dedup, multimodal
from bubing_ray.ops.corpus import token_pack
from bubing_ray.ops.text import bpe_encode


def _pd(ds):
    return ds.to_pandas()


def _docs_ds(texts, ids=None):
    import ray

    ids = list(range(len(texts))) if ids is None else ids
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array(texts),
    }))


def test_minhash_dedup_keep_clean_corpus(ray_session):
    """Zero near-dup pairs (the most common corpus!) must keep every
    doc, not IndexError on the empty drop array."""
    texts = [f"completely unique document number {i} with words "
             f"alpha{i} beta{i} gamma{i} delta{i}" for i in range(30)]
    out = _pd(dedup.minhash_dedup_keep(_docs_ds(texts)))
    assert sorted(out["doc_id"]) == list(range(30))


def test_embedding_lsh_explicit_planes_above_default(ray_session):
    """n_planes > the simsearch default (12) used to slice a 12-row
    plane matrix and crash the bit-pack broadcast."""
    import ray

    rng = np.random.default_rng(9)
    n, dim = 400, 8
    mat = rng.standard_normal((n, dim))
    mat[1] = mat[0]  # one exact dup pair
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              type=pa.list_(pa.float64())),
    })
    out = _pd(dedup.embedding_neardup_pairs_lsh(
        ray.data.from_arrow(t), threshold=0.95, n_planes=14))
    assert {(0, 1)} <= set(map(tuple, out[["a", "b"]].values))


def test_minhash_short_docs_never_pair(ray_session):
    """Two DISTINCT sub-ngram docs share the sentinel signature; they
    must not appear as a 10000 bp pair, and minhash_dedup_keep must
    keep both."""
    texts = [
        "the quick brown fox jumps over the lazy dog repeatedly",
        "the quick brown fox jumps over the lazy dog repeatedly",
        "hi there",            # 2 tokens < ngram=3 -> sentinel
        "totally unrelated",   # 2 tokens < ngram=3 -> sentinel
    ]
    pairs = _pd(dedup.minhash_lsh_pairs(_docs_ds(texts), threshold=0.5))
    got = set(map(tuple, pairs[["a", "b"]].values))
    assert (2, 3) not in got
    assert (0, 1) in got
    kept = _pd(dedup.minhash_dedup_keep(_docs_ds(texts)))
    assert {2, 3} <= set(kept["doc_id"])


def test_minhash_pairs_short_docs_oracle_parity(ray_session, tmp_path):
    """Engine and SQL oracle must agree on a corpus CONTAINING
    sub-ngram docs (the sweep's testdata has none)."""
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",
        "hi there",
        "totally unrelated",
        "one",
        "alpha beta gamma delta epsilon zeta eta theta",
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s0"] * len(texts)),
        "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
    })
    sf = tmp_path / "sfmini"
    sf.mkdir()
    pq.write_table(t, str(sf / "documents.parquet"))
    got = e.queries()["minhash_pairs"](str(sf))
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got.to_pandas())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(e.oracle_sql()["minhash_pairs"]).df()
    g = got.sort_values(["a", "b"]).reset_index(drop=True)
    w = want.sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g[["a", "b", "est_sim_bp"]],
                                  w[["a", "b", "est_sim_bp"]],
                                  check_dtype=False)
    assert not ((g["a"].isin([2, 3, 4])) & (g["b"].isin([2, 3, 4]))).any()


def test_semdedup_fixed_offset_id_space(ray_session):
    """1000-based vec_ids used to produce an EMPTY seed set (IndexError);
    shifting all ids must not change the clustering/keep decisions."""
    import ray

    rng = np.random.default_rng(21)
    n, dim = 120, 6
    mat = rng.standard_normal((n, dim)) * 3.0
    mat[5] = mat[4] + 1e-9  # a near-dup pair

    def run(ids):
        t = pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat],
                                  type=pa.list_(pa.float64())),
        })
        df = _pd(dedup.semdedup_fixed(
            ray.data.from_arrow(t), n_clusters=8, iters=2))
        return df.sort_values("vec_id").reset_index(drop=True)

    base = run(np.arange(n))
    shifted = run(np.arange(n) + 1000)
    assert (shifted["vec_id"].to_numpy() ==
            base["vec_id"].to_numpy() + 1000).all()
    pd.testing.assert_frame_equal(shifted[["cluster", "keep"]],
                                  base[["cluster", "keep"]])


def test_exact_dedup_groups_model(ray_session):
    """Archetype + dup_count per distinct text vs a plain pandas model
    (guards the hash-group -> value-group rewrite)."""
    texts = ["aa", "bb", "aa", "cc", "bb", "aa"]
    out = _pd(dedup.exact_dedup_groups(_docs_ds(texts))) \
        .sort_values("doc_id").reset_index(drop=True)
    model = (pd.DataFrame({"doc_id": range(6), "text": texts})
             .groupby("text")
             .agg(doc_id=("doc_id", "min"), dup_count=("doc_id", "size"))
             .reset_index(drop=True)
             .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out[["doc_id", "dup_count"]],
                                  model[["doc_id", "dup_count"]],
                                  check_dtype=False)


def test_bpe_encode_null_text(ray_session):
    """A null text row encodes to zero words/tokens instead of killing
    the batch with a NaN repeat count."""
    import ray

    merges = pa.table({"left": pa.array(["a"]), "right": pa.array(["b"])})
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["ab ab", None, "ab"]),
    })
    out = _pd(bpe_encode(ray.data.from_arrow(t), merges)) \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["n_words"].tolist() == [2, 0, 1]
    assert out["n_tokens"].tolist() == [2, 0, 1]


def test_multimodal_degenerate_payloads():
    """Zero-dim headers resize to b'' (like invalid magic); sub-header
    payloads report n_bytes 0, never negative."""
    import struct

    rz = multimodal.ResizeImage(scale=0.5)
    bad = multimodal.MAGIC + struct.pack("<HH", 0, 5)
    ok = multimodal.MAGIC + struct.pack("<HH", 4, 4) + bytes(range(16))
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "payload": pa.array([bad, ok, b""], pa.binary()),
    })
    out = rz(batch)
    pay = out.column("payload").to_pylist()
    assert pay[0] == b"" and pay[2] == b"" and len(pay[1]) > 8

    meta = multimodal.DecodeImageMeta()(batch)
    nb = meta.column("n_bytes").to_pylist()
    assert nb[0] == 0 and nb[2] == 0 and min(nb) >= 0


def test_token_pack_negative_doc_ids(ray_session):
    """Floor-vs-truncate bucket keying: with negative ids the packed
    offsets must still be the exclusive cumsum in doc_id order."""
    texts = ["one two three", "four five", "six", "seven eight nine ten"]
    ids = [-3, -1, 2, 5]
    out = _pd(token_pack(_docs_ds(texts, ids), seq_len=4)) \
        .sort_values("doc_id").reset_index(drop=True)
    n = out["n_tok"].to_numpy()
    want_off = np.concatenate(([0], np.cumsum(n)[:-1]))
    assert (out["tok_offset"].to_numpy() == want_off).all()


def test_ngram_jaccard_auto_caps_unknown_count(ray_session):
    """max_df='auto' with an unknown row count engages the DF cap
    (the silent exact fall-through was the 10M-doc footgun)."""
    import ray

    texts = [f"w{i} w{i+1} w{i+2} w{i+3} shared shared shared"
             for i in range(20)]
    ds = _docs_ds(texts).map_batches(lambda b: b, batch_format="pyarrow")
    try:
        n = ds._meta_count()
    except Exception:
        n = None
    assert n is None, "precondition: count unknown behind a transform"
    out = dedup.ngram_jaccard_pairs(ds, n=3, min_sim_bp=1000)
    _ = _pd(out)  # runs with the cap engaged, no crash
