"""Regression tests for the round-5 fifth review pass (ops analytics):
empty-match crashes, query-term normalization, bands validation, block
schema consistency for empty/large_string inputs."""

import os
import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _docs(texts, start_id=0):
    import ray

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(start_id, start_id + len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def _pd(ds):
    import pandas as pd

    if hasattr(ds, "to_pandas") and not isinstance(ds, pd.DataFrame):
        return ds.to_pandas()
    return ds


def test_tfidf_topk_no_term_in_corpus_returns_empty(ray_session):
    """A query set matching nothing must yield an empty ranking, not an
    ArrowInvalid from pa.concat_tables([])."""
    from bubing_ray.ops.simsearch import tfidf_topk

    out = tfidf_topk(_docs(["alpha beta", "beta gamma"]), ["zzzmissing"])
    assert out.count() == 0
    assert sorted(out.schema().names) == ["doc_id", "score"]


def test_bm25_topk_no_term_in_corpus_returns_empty(ray_session):
    from bubing_ray.ops.simsearch import bm25_topk

    out = bm25_topk(_docs(["alpha beta", "beta gamma"]), ["zzzmissing"])
    assert out.count() == 0
    assert sorted(out.schema().names) == ["doc_id", "score"]


def test_tfidf_topk_uppercase_query_term_matches(ray_session):
    """Corpus tokens are lowercased; the query side must be too, or
    'Alpha' silently matches nothing."""
    from bubing_ray.ops.simsearch import tfidf_topk

    docs = _docs(["Alpha alpha beta", "beta gamma"])
    up = _pd(tfidf_topk(docs, ["Alpha"]))
    lo = _pd(tfidf_topk(docs, ["alpha"]))
    assert len(up) == 1 and up.iloc[0]["doc_id"] == 0
    assert up.values.tolist() == lo.values.tolist()


def test_bm25_topk_uppercase_query_term_matches(ray_session):
    from bubing_ray.ops.simsearch import bm25_topk

    out = _pd(bm25_topk(_docs(["Alpha alpha beta", "beta gamma"]),
                        ["ALPHA"]))
    assert len(out) == 1 and out.iloc[0]["doc_id"] == 0


def test_minhash_lsh_pairs_all_short_docs_empty(ray_session):
    """Every doc shorter than the shingle width => all signatures are
    sentinels => empty pair set, not a concat_tables([]) crash in the
    broadcast path."""
    from bubing_ray.ops.dedup import minhash_lsh_pairs

    out = minhash_lsh_pairs(_docs(["a b", "c", "d e", ""]), ngram=3)
    assert out.count() == 0
    assert sorted(out.schema().names) == ["a", "b", "est_sim_bp"]


def test_minhash_dedup_keep_all_short_docs_keeps_all(ray_session):
    from bubing_ray.ops.dedup import minhash_dedup_keep

    out = _pd(minhash_dedup_keep(_docs(["a b", "c", "d e"]), ngram=3))
    assert len(out) == 3


def test_bands_validation_rejects_bad_values(ray_session):
    from bubing_ray.ops.dedup import minhash_lsh_pairs

    ds = _docs(["one two three four five"])
    with pytest.raises(ValueError, match="bands"):
        minhash_lsh_pairs(ds, bands=128)
    with pytest.raises(ValueError, match="bands"):
        minhash_lsh_pairs(ds, bands=7)  # not a divisor of 64
    with pytest.raises(ValueError, match="bands"):
        minhash_lsh_pairs(ds, bands=0)


def test_decontaminate_fuzzy_bands_validated(ray_session):
    from bubing_ray.ops.corpus import decontaminate_fuzzy

    with pytest.raises(ValueError, match="bands"):
        decontaminate_fuzzy(_docs(["one two three four"]), bands=100)


def test_dup_span_stats_hash_key_empty_block_schema(ray_session):
    """A block whose docs are all shorter than n must emit 's' as int64
    like every other block (not a leftover string column), or the
    shuffle sees mismatched schemas."""
    import ray

    from bubing_ray.ops.dedup import dup_span_stats

    long = "w0 w1 w2 w3 w4 w5 w0 w1 w2 w3 w4 w5"
    a = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([long, long], pa.string())}))
    b = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([2], pa.int64()),
        "text": pa.array(["too short"], pa.string())}))
    out = _pd(dup_span_stats(a.union(b), n=5, hash_key=True)
              ).sort_values("doc_id").reset_index(drop=True)
    ref = _pd(dup_span_stats(a.union(b), n=5, hash_key=False)
              ).sort_values("doc_id").reset_index(drop=True)
    assert out.values.tolist() == ref.values.tolist()
    assert len(out) == 3  # the short doc keeps its zero row
    assert out.loc[out.doc_id == 2, "n_pos"].item() == 0


def test_strip_dup_spans_large_string_text(ray_session):
    """A large_string text column (any polars round-trip emits one) must
    not produce mismatched union schemas between the docs and starts
    arms."""
    import ray

    from bubing_ray.ops.dedup import strip_dup_spans

    dup = "d0 d1 d2 d3 d4"
    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([f"{dup} xx", f"yy {dup}"], pa.large_string()),
    })
    out = _pd(strip_dup_spans(ray.data.from_arrow(t), n=5)
              ).sort_values("doc_id").reset_index(drop=True)
    assert out["n_tok"].tolist() == [6, 6]
    assert out["n_kept"].tolist() == [1, 1]
    assert out["text_stripped"].tolist() == ["xx", "yy"]


def test_lowest_id_rows_shared_helper(ray_session):
    """load_queries and semdedup_fixed share one lowest-id row
    selector; check the helper's contract directly."""
    import ray

    from bubing_ray.ops.simsearch import lowest_id_rows

    t = pa.table({
        "vec_id": pa.array([1005, None, 1001, 1003], pa.int64()),
        "embedding": pa.array(
            [[1.0, 0.0], [0.0, 1.0], [3.0, 4.0], [0.5, 0.5]],
            pa.list_(pa.float32(), 2)),
    })
    head = lowest_id_rows(ray.data.from_arrow(t), 2, "vec_id", "embedding")
    assert head.column("vec_id").to_pylist() == [1001, 1003]
    with pytest.raises(ValueError, match="non-null"):
        lowest_id_rows(ray.data.from_arrow(pa.table({
            "vec_id": pa.array([None], pa.int64()),
            "embedding": pa.array([None], pa.list_(pa.float32(), 2)),
        })), 2, "vec_id", "embedding")


def test_semdedup_fixed_still_exact_after_helper_extraction(ray_session):
    """semdedup_fixed must keep quantizing RAW vectors (not normalized)
    after switching to the shared helper."""
    import ray

    from bubing_ray.ops.dedup import semdedup_fixed

    rng = np.random.default_rng(7)
    vecs = (rng.normal(size=(40, 8)) * rng.uniform(0.2, 5.0, (40, 1)))
    t = pa.table({
        "vec_id": pa.array(range(40), pa.int64()),
        "embedding": pa.array(vecs.astype(np.float32).tolist(),
                              pa.list_(pa.float32(), 8)),
    })
    out = _pd(semdedup_fixed(ray.data.from_arrow(t), n_clusters=4))
    assert len(out) == 40
    assert set(out["keep"].unique()) <= {0, 1}
    assert out["cluster"].nunique() <= 4
