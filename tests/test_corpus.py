"""Corpus-composition operators (sampling, caps, decontamination,
PII redaction, stream packing) — unit + invariance tests.  The
value-exact DuckDB comparison runs in tests/oracle_check.py / the
driver; here we test the properties the oracles can't (parallelism
invariance, route-count invariance, bucket-size invariance)."""

import os
import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bubing_ray.hashing import splitmix64, splitmix64_sql
from bubing_ray.ops import corpus

SF = "/root/testdata/sf0.001"


def _collect(ds) -> pa.Table:
    batches = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    return pa.concat_tables(batches) if batches else pa.table({})


def _sorted(t: pa.Table, keys) -> pa.Table:
    return t.sort_by([(k, "ascending") for k in keys])


# ------------------------------------------------------------- splitmix64

def test_splitmix64_sql_matches_numpy():
    import duckdb

    rng = np.random.default_rng(7)
    vals = np.concatenate([
        np.array([0, 1, 2**31, 2**63 - 1, 2**64 - 1], dtype=np.uint64),
        rng.integers(0, 2**63, 40).astype(np.uint64),
    ])
    con = duckdb.connect()
    expr = splitmix64_sql("x")
    lst = ",".join(str(int(v)) for v in vals)
    rows = con.sql(
        f"SELECT x, {expr} AS h FROM (SELECT unnest([{lst}]::HUGEINT[]) AS x)"
    ).fetchall()
    for x, h in rows:
        assert int(h) == int(splitmix64(int(x))), x


def test_splitmix64_scalar_and_vector_agree():
    v = np.array([3, 99, 12345], dtype=np.uint64)
    out = splitmix64(v)
    for x, h in zip(v, out):
        assert splitmix64(int(x)) == int(h)


# --------------------------------------------------------------- sampling

@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray

    return ray.data.read_parquet(
        os.path.join(SF, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )


def test_stratified_sample_deterministic_across_block_layout(docs_ds):
    rates = {"en": 3000, "zh": 5000}
    a = _collect(corpus.stratified_sample(docs_ds, rates))
    b = _collect(corpus.stratified_sample(docs_ds.repartition(7), rates))
    assert _sorted(a, ["doc_id"]).equals(_sorted(b, ["doc_id"]))
    # kept fraction per stratum tracks its rate (loose: hash uniformity)
    import collections

    langs = collections.Counter(a.column("lang").to_pylist())
    assert langs["en"] > 0 and a.num_rows < 500


def test_stratified_sample_threshold_exact(docs_ds):
    rates = {"en": 3000, "zh": 5000}
    t = _collect(corpus.stratified_sample(docs_ds, rates))
    ids = np.array(t.column("doc_id").to_pylist(), dtype=np.uint64)
    bucket = np.array(t.column("bucket_bp").to_pylist())
    expect = (corpus.sample_hash(ids) % np.uint64(10_000)).astype(np.int64)
    assert (bucket == expect).all()
    for lang, bp in (("en", 3000), ("zh", 5000)):
        sel = np.array([l == lang for l in t.column("lang").to_pylist()])
        if sel.any():
            assert bucket[sel].max() < bp


def test_group_cap_respects_cap_and_routes(docs_ds):
    a = _collect(corpus.group_cap(docs_ds, key="source", cap=3))
    b = _collect(corpus.group_cap(docs_ds, key="source", cap=3, n_routes=17))
    assert _sorted(a, ["doc_id"]).equals(_sorted(b, ["doc_id"]))
    import collections

    per = collections.Counter(a.column("source").to_pylist())
    assert max(per.values()) <= 3
    assert a.column("rk").to_pylist() and max(a.column("rk").to_pylist()) <= 3


def test_group_cap_survivors_are_hash_minima(docs_ds):
    full = _collect(docs_ds.map_batches(
        lambda t: t.select(["doc_id", "source"]), batch_format="pyarrow"))
    capped = _collect(corpus.group_cap(docs_ds, key="source", cap=2))
    ids = np.array(full.column("doc_id").to_pylist(), dtype=np.uint64)
    src = np.array(full.column("source").to_pylist())
    h = corpus.sample_hash(ids)
    kept = set(capped.column("doc_id").to_pylist())
    for s in np.unique(src):
        sel = src == s
        order = np.lexsort((ids[sel], h[sel]))
        expect = {int(i) for i in ids[sel][order][:2]}
        got = {int(i) for i in ids[sel] if int(i) in kept}
        assert got == expect, s


# -------------------------------------------------------- decontamination

def test_decontaminate_flags(ray_session):
    import ray

    rows = {
        "doc_id": [0, 1, 2, 3],
        "text": [
            "alpha beta gamma delta",      # test doc (0 % 2 == 0... mod=4)
            "alpha beta gamma epsilon",    # shares 'alpha beta gamma'
            "zeta eta theta iota",         # clean
            "one two",                     # < 3 tokens -> no shingles
        ],
    }
    ds = ray.data.from_arrow(pa.table(rows))
    out = _sorted(_collect(corpus.decontaminate(ds, n=3, test_mod=4)),
                  ["doc_id"])
    d = {r["doc_id"]: r for r in out.to_pylist()}
    assert d[0]["is_test"] == 1 and d[0]["contaminated"] == 1
    assert d[1]["contaminated"] == 1 and d[1]["n_hits"] == 1
    assert d[2]["contaminated"] == 0
    assert d[3]["n_shingles"] == 0 and d[3]["contaminated"] == 0


def test_decontaminate_whitespace_normalization(ray_session):
    import ray

    # tabs/newlines/multiple spaces tokenize like single spaces
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [0, 5],
        "text": ["a  b\tc", "A b\nc extra"],
    }))
    out = _collect(corpus.decontaminate(ds, n=3, test_mod=7))
    d = {r["doc_id"]: r for r in out.to_pylist()}
    assert d[5]["n_hits"] == 1  # 'a b c' matches despite case/whitespace


# ----------------------------------------------------------- PII redaction

def test_pii_redact_batch_counts_and_text():
    t = pa.table({
        "doc_id": [1, 2, 3],
        "text": [
            "mail a@b.io and c.d+x@e-f.org now",
            "host 192.168.0.1 port: call +1 (555) 123-4567",
            "clean text only",
        ],
    })
    out = corpus.pii_redact_batch(t)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows[1]["n_email"] == 2
    assert "<EMAIL>" in rows[1]["text_redacted"]
    assert "a@b.io" not in rows[1]["text_redacted"]
    assert rows[2]["n_ip"] == 1 and rows[2]["n_phone"] == 1
    assert "<IP>" in rows[2]["text_redacted"]
    assert "<PHONE>" in rows[2]["text_redacted"]
    assert rows[3]["n_email"] == rows[3]["n_ip"] == rows[3]["n_phone"] == 0
    assert rows[3]["text_redacted"] == "clean text only"


def test_inject_pii_then_redact_round_trip(docs_ds):
    injected = docs_ds.map_batches(corpus.inject_pii_batch,
                                   batch_format="pyarrow")
    out = _collect(corpus.pii_redact(injected))
    d = {r["doc_id"]: r for r in out.to_pylist()}
    # every 3rd doc gained exactly one (injected) email
    for i in (0, 3, 6, 9):
        assert d[i]["n_email"] >= 1
    assert all("@mail" not in r["text_redacted"] for r in d.values())


# ----------------------------------------------------------- stream packing

def test_token_pack_matches_sequential_model(docs_ds):
    out = _sorted(_collect(corpus.token_pack(
        docs_ds, seq_len=64, bucket=16)), ["doc_id"])
    n = np.array(out.column("n_tok").to_pylist())
    off = np.array(out.column("tok_offset").to_pylist())
    # sequential model: exclusive cumsum in doc_id order
    assert (off == np.concatenate(([0], np.cumsum(n)[:-1]))).all()
    start = np.array(out.column("chunk_start").to_pylist())
    end = np.array(out.column("chunk_end").to_pylist())
    nc = np.array(out.column("n_chunks").to_pylist())
    assert (start == off // 64).all()
    nz = n > 0
    assert (end[nz] == (off[nz] + n[nz] - 1) // 64).all()
    assert (nc[nz] == end[nz] - start[nz] + 1).all()
    assert (nc[~nz] == 0).all()


def test_token_pack_bucket_invariance(docs_ds):
    a = _sorted(_collect(corpus.token_pack(docs_ds, seq_len=64, bucket=16)),
                ["doc_id"])
    b = _sorted(_collect(corpus.token_pack(docs_ds, seq_len=64, bucket=128)),
                ["doc_id"])
    assert a.equals(b)


# ------------------------------------------------------- repetition stats

def test_repetition_stats_sequential_model(ray_session):
    import ray

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": [
            "a a a a",      # one bigram repeated 3x; trigram 2/2 dup
            "a b c d",      # all distinct
            "x",            # too short for any n-gram
            "a b a b a",    # top bigram 2/4; trigram dup 2/3
        ],
    })
    out = _sorted(_collect(corpus.repetition_stats(
        ray.data.from_arrow(docs))), ["doc_id"])
    assert out.column("top2_frac_bp").to_pylist() == [
        10_000, 10_000 * 1 // 3, 0, 5_000]
    assert out.column("dup3_frac_bp").to_pylist() == [
        10_000, 0, 0, 10_000 * 2 // 3]


def test_repetition_stats_corpus_bounds(docs_ds):
    out = _collect(corpus.repetition_stats(docs_ds))
    assert out.num_rows == 500
    for col in ("top2_frac_bp", "dup3_frac_bp"):
        vals = np.array(out.column(col).to_pylist())
        assert ((vals >= 0) & (vals <= 10_000)).all()


# ------------------------------------------------- composed corpus recipe

def test_compose_corpus_equals_stagewise(docs_ds):
    """compose_corpus (one streaming pass) must keep exactly the docs
    that survive quality ∧ non-test ∧ decontaminate ∧ stratified sample,
    with the same per-source ranks as group_cap over that survivor set."""
    from bubing_ray.ops.text import gopher_quality_batch

    rates = {"en": 3000, "zh": 5000}
    n, mod, cap = 3, 11, 4

    full = _collect(docs_ds)
    ids = np.array(full.column("doc_id").to_pylist(), dtype=np.uint64)
    quality = np.array(
        gopher_quality_batch(full).column("keep").to_pylist())
    non_test = (ids % np.uint64(mod)) != 0
    decon = _sorted(_collect(corpus.decontaminate(
        docs_ds, n=n, test_mod=mod)), ["doc_id"])
    clean = ~np.array(decon.column("contaminated").to_pylist(), dtype=bool)
    bucket = corpus.sample_hash(ids) % np.uint64(10_000)
    import polars as pl

    rate = pl.Series([str(s) for s in full.column("lang").to_pylist()]) \
        .replace_strict(rates, default=10_000, return_dtype=pl.Int64) \
        .to_numpy()
    keep = quality & non_test & clean & (bucket.astype(np.int64) < rate)
    expect_ids = set(int(i) for i in ids[keep])

    survivors = docs_ds.map_batches(
        lambda t, k=frozenset(expect_ids): t.filter(pa.array(
            np.isin(t.column("doc_id").to_numpy(zero_copy_only=False),
                    list(k)))),
        batch_format="pyarrow")
    expect = _sorted(_collect(corpus.group_cap(
        survivors, key="source", cap=cap, keep_cols=("lang",))), ["doc_id"])

    tests = corpus.test_shingles(docs_ds, n=n, test_mod=mod)
    got = _sorted(_collect(corpus.compose_corpus(
        docs_ds, tests=tests, rates_bp=rates, cap=cap, n=n,
        test_mod=mod)), ["doc_id"])
    assert set(got.column("doc_id").to_pylist()) <= expect_ids
    assert got.select(["doc_id", "source", "lang", "rk"]).equals(
        expect.select(["doc_id", "source", "lang", "rk"]))


# ------------------------------------------------------- paragraph dedup

def _para_dedup_model(docs: list[tuple[int, str]]) -> dict[int, str]:
    """Sequential reference: first (doc_id, pidx) occurrence wins."""
    seen: dict[str, tuple[int, int]] = {}
    for doc_id, text in sorted(docs):
        for pidx, par in enumerate(text.split("\n\n"), start=1):
            if par.strip(" ") == "":
                continue
            cur = seen.get(par)
            if cur is None or (doc_id, pidx) < cur:
                seen[par] = (doc_id, pidx)
    out: dict[int, list[tuple[int, str]]] = {}
    for par, (doc_id, pidx) in seen.items():
        out.setdefault(doc_id, []).append((pidx, par))
    return {d: "\n\n".join(p for _, p in sorted(ps))
            for d, ps in out.items()}


def test_paragraph_dedup_matches_model_and_routes(ray_session):
    import ray

    docs = [
        (3, "alpha beta\n\nshared one\n\ngamma"),
        (1, "shared one\n\nunique one\n\nshared two"),
        (2, "shared two\n\nshared one\n\n  \n\ndelta"),
        (4, "shared one"),                      # drops entirely
        (5, "shared one\n\nshared one\n\nepsilon"),  # in-doc repeat
    ]
    expect = _para_dedup_model(docs)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": [t for _, t in docs],
    })).repartition(3)
    for nr in (1, 4):
        got = _sorted(_collect(corpus.paragraph_dedup(ds, n_routes=nr)),
                      ["doc_id"])
        assert dict(zip(got.column("doc_id").to_pylist(),
                        got.column("text").to_pylist())) == expect


# -------------------------------------------------- source quality gate

def test_source_quality_gate_matches_model(docs_ds):
    import collections

    from bubing_ray.ops.text import gopher_quality_batch

    full = _collect(docs_ds)
    keep = dict(zip(
        full.column("doc_id").to_pylist(),
        gopher_quality_batch(full).column("keep").to_pylist()))
    src = dict(zip(full.column("doc_id").to_pylist(),
                   full.column("source").to_pylist()))
    n = collections.Counter(src.values())
    k = collections.Counter(s for d, s in src.items() if keep[d])
    rate = {s: (10_000 * k[s]) // n[s] for s in n}
    min_bp = 5000
    expect = {(d, s, rate[s]) for d, s in src.items()
              if keep[d] and rate[s] >= min_bp}

    got = _collect(corpus.source_quality_gate(docs_ds, min_keep_bp=min_bp))
    rows = set(zip(got.column("doc_id").to_pylist(),
                   got.column("source").to_pylist(),
                   got.column("keep_rate_bp").to_pylist()))
    assert rows == expect
    assert len(expect) > 0
    # at least one source must actually be gated out for the test to bite
    assert any(r < min_bp for r in rate.values())
