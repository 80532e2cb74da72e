"""Tests for ops/assoc.py: collocations, n-gram top-k, DSIR weights —
each distributed result checked against a sequential Python model."""

import collections
import math

import numpy as np
import pyarrow as pa
import pytest
import ray

from bubing_ray.hashing import fnv1a64
from bubing_ray.ops import assoc

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "en"),
    (1, "the quick brown fox is quick and brown", "en"),
    (2, "le chat noir dort sur le tapis rouge", "fr"),
    (3, "New York New York so good they named it twice", "en"),
    (4, "le chat noir et le chien blanc", "fr"),
    (5, "quick brown quick brown quick brown", "en"),
    (6, "", "en"),
    (7, "single", "fr"),
]


def _ds():
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d[0] for d in DOCS], pa.int64()),
        "text": pa.array([d[1] for d in DOCS]),
        "lang": pa.array([d[2] for d in DOCS]),
    })).repartition(3)


def _model_tokens():
    return {d[0]: d[1].lower().split() for d in DOCS}


def _model_bigrams():
    out = []
    for did, toks in _model_tokens().items():
        out += [(did, toks[i], toks[i + 1]) for i in range(len(toks) - 1)]
    return out


def test_bigram_counts_matches_model(ray_session):
    got = {}
    for b in assoc.bigram_counts(_ds()).iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        for w1, w2, n in zip(t.column("w1").to_pylist(),
                             t.column("w2").to_pylist(),
                             t.column("n_xy").to_pylist()):
            got[(w1, w2)] = n
    want = collections.Counter((w1, w2) for _, w1, w2 in _model_bigrams())
    assert got == dict(want)


def test_collocations_matches_model(ray_session):
    k, min_count = 5, 2
    res = assoc.collocations(_ds(), k=k, min_count=min_count)
    uni = collections.Counter(
        t for toks in _model_tokens().values() for t in toks)
    bi = collections.Counter((w1, w2) for _, w1, w2 in _model_bigrams())
    n_tok, n_bi = sum(uni.values()), sum(bi.values())
    want = []
    for (w1, w2), nxy in bi.items():
        if nxy < min_count:
            continue
        lift = math.floor(1000.0 * nxy * float(n_tok) * float(n_tok)
                          / (float(n_bi) * uni[w1] * uni[w2]))
        want.append((lift, w1, w2, nxy, uni[w1], uni[w2]))
    want.sort(key=lambda r: (-r[0], r[1], r[2]))
    want = want[:k]
    got = [(r["lift_milli"], r["w1"], r["w2"], r["n_xy"], r["n_x"], r["n_y"])
           for r in res.to_pylist()]
    assert got == want


def test_collocations_empty_corpus(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }))
    res = assoc.collocations(ds)
    assert res.num_rows == 0
    assert res.column_names == ["w1", "w2", "n_xy", "n_x", "n_y",
                                "lift_milli"]


def test_ngram_topk_matches_model(ray_session):
    res = assoc.ngram_topk(_ds(), n=3, k=4)
    want = collections.Counter()
    for toks in _model_tokens().values():
        for i in range(len(toks) - 2):
            want[" ".join(toks[i:i + 3])] += 1
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    got = list(zip(res.column("gram").to_pylist(),
                   res.column("n").to_pylist()))
    assert got == ranked


def test_dsir_weights_matches_model(ray_session):
    res = {}
    for b in assoc.dsir_weights(_ds()).iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        for did, nb, sc in zip(t.column("doc_id").to_pylist(),
                               t.column("n_bi").to_pylist(),
                               t.column("dsir_score").to_pylist()):
            res[did] = (nb, sc)

    langs = {d[0]: d[2] for d in DOCS}
    ct = collections.Counter()
    cr = collections.Counter()
    feats = collections.defaultdict(list)
    for did, w1, w2 in _model_bigrams():
        h = fnv1a64(f"{w1} {w2}") % assoc.DSIR_BUCKETS
        cr[h] += 1
        if langs[did] == "en":
            ct[h] += 1
        feats[did].append(h)
    for did, _, _ in DOCS:
        want_n = len(feats[did])
        want_s = sum(
            (math.floor(math.log2(ct[h] + 1))
             - math.floor(math.log2(cr[h] + 1))) for h in feats[did])
        assert res[did] == (want_n, want_s), did


def test_dsir_separates_target_from_offtarget(ray_session):
    # English docs repeat English bigrams (target-heavy); French docs'
    # bigrams never appear in the target slice, so their buckets have
    # bt=0 while br>0 -> strictly negative scores.
    scores = {}
    for b in assoc.dsir_weights(_ds()).iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        for did, sc in zip(t.column("doc_id").to_pylist(),
                           t.column("dsir_score").to_pylist()):
            scores[did] = sc
    assert scores[2] < 0 and scores[4] < 0
    assert scores[5] >= 0
    assert scores[6] == 0  # empty doc: no bigrams


def test_ngram_topk_two_partitionings_agree(ray_session):
    a = assoc.ngram_topk(_ds(), n=2, k=10)
    ds2 = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d[0] for d in DOCS], pa.int64()),
        "text": pa.array([d[1] for d in DOCS]),
    })).repartition(1)
    b = assoc.ngram_topk(ds2, n=2, k=10)
    assert a.to_pylist() == b.to_pylist()
