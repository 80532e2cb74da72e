"""Tests for the training-data operators (bubing_ray.ops.*)."""

import numpy as np
import polars as pl
import pyarrow as pa
import pytest

from bubing_ray.ops import dedup, filters, multimodal, simsearch, text

SF = "/root/testdata/sf0.001"


def _docs_tbl(rows):
    return pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array(rows, pa.string()),
        }
    )


# ------------------------------------------------------------------- text

def test_token_quality_counts():
    t = text.token_quality_batch(_docs_tbl(["the cat, the hat!", "", "  a  b  "]))
    d = t.to_pydict()
    assert d["n_tokens"] == [4, 0, 2]
    assert d["n_stop"] == [2, 0, 1]
    assert d["n_punct"] == [2, 0, 0]
    assert d["stopword_ratio_bp"][0] == 5000
    assert d["stopword_ratio_bp"][1] == 0  # guarded division


def test_token_quality_matches_duckdb_expression():
    """The floor-scaled ratios must equal DuckDB's evaluation of the
    same expression (the oracle contract in __ray_entry__)."""
    import duckdb

    from __ray_entry__ import oracle_sql, queries

    ours = queries()["text_quality"](SF)
    got = pl.from_arrow(_collect(ours)).sort("doc_id")
    exp = pl.from_arrow(duckdb.sql(
        oracle_sql()["text_quality"].replace(
            "documents", f"'{SF}/documents.parquet'"
        )
    ).arrow()).sort("doc_id")
    assert got.columns == sorted(got.columns) or set(got.columns) == set(exp.columns)
    for c in exp.columns:
        assert got[c].to_list() == exp[c].to_list(), c


def test_lang_id():
    t = text.lang_id_batch(
        _docs_tbl(
            [
                "the quick brown fox and the dog",
                "le chat et la souris dans une maison",
                "der hund und die katze ist nicht da",
                "el perro y el gato en una casa",
                "xyzzy plugh qwerty",
                "浣犲ソ涓栫晫 hello",
            ]
        )
    )
    assert t.column("pred_lang").to_pylist() == ["en", "fr", "de", "es", "unk", "zh"]


def test_fingerprints_near_dup_share_fps():
    a = "the quick brown fox jumps over the lazy dog " * 20
    b = a.replace("lazy", "sleepy", 1)  # one edit
    c = "completely different content with other words " * 20
    t = text.fingerprint_sets_batch(_docs_tbl([a, b, c]))
    fps = [set(x) for x in t.column("fps").to_pylist()]
    jac_ab = len(fps[0] & fps[1]) / len(fps[0] | fps[1])
    jac_ac = len(fps[0] & fps[2]) / len(fps[0] | fps[2])
    assert jac_ab > 0.6
    assert jac_ac < 0.05


# ------------------------------------------------------------------- dedup

def _collect(ds) -> pa.Table:
    if isinstance(ds, pa.Table):
        return ds
    return pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )


@pytest.fixture()
def dup_docs(ray_session):
    import ray

    rows = []
    for i in range(40):
        # distinct vocabulary per doc so only the planted pairs are near
        rows.append(" ".join(f"w{i}x{j}" for j in range(30)))
    rows[10] = rows[3]      # exact dup
    rows[20] = rows[3]      # exact dup
    rows[30] = rows[7]      # exact dup
    rows[35] = rows[5] + " tailword"  # near dup
    return ray.data.from_arrow(_docs_tbl(rows))


def test_exact_dedup(dup_docs):
    groups = _collect(dedup.exact_dedup_groups(dup_docs))
    df = pl.from_arrow(groups).sort("doc_id")
    assert len(df) == 37
    counts = dict(zip(df["doc_id"].to_list(), df["dup_count"].to_list()))
    assert counts[3] == 3 and counts[7] == 2
    assert 10 not in counts and 20 not in counts
    kept = _collect(dedup.exact_dedup(dup_docs))
    assert sorted(kept.column("doc_id").to_pylist()) == df["doc_id"].to_list()


def test_minhash_lsh_finds_near_dups(dup_docs):
    pairs = pl.from_arrow(_collect(dedup.minhash_lsh_pairs(dup_docs, threshold=0.5)))
    got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    assert (3, 10) in got and (3, 20) in got and (10, 20) in got
    assert (5, 35) in got  # near dup
    # exact dups estimate 1.0
    row = pairs.filter((pl.col("a") == 3) & (pl.col("b") == 10))
    assert row["est_sim_bp"][0] == 10000


def test_minhash_dedup_keep(dup_docs):
    kept = _collect(dedup.minhash_dedup_keep(dup_docs, threshold=0.5))
    ids = set(kept.column("doc_id").to_pylist())
    assert 3 in ids and 10 not in ids and 20 not in ids
    assert 5 in ids and 35 not in ids


def test_simhash_pairs(dup_docs):
    sigs = dedup.simhash_batch(_docs_tbl(["same words here", "same words here", "other"]))
    s = sigs.column("simhash").to_pylist()
    assert s[0] == s[1] != s[2]
    pairs = pl.from_arrow(_collect(dedup.simhash_pairs(dup_docs, max_hamming=3)))
    got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    assert (3, 10) in got and (3, 20) in got


def test_ngram_jaccard_exact(dup_docs):
    pairs = pl.from_arrow(_collect(dedup.ngram_jaccard_pairs(dup_docs, min_sim_bp=5000)))
    got = {(a, b): s for a, b, s in zip(pairs["a"], pairs["b"], pairs["sim_bp"])}
    assert got[(3, 10)] == 10000
    assert (5, 35) in got and got[(5, 35)] < 10000


def test_embedding_neardup(ray_session):
    import ray

    rng = np.random.default_rng(7)
    m = rng.standard_normal((50, 16)).astype(np.float32)
    m[10] = m[3] + 0.01 * rng.standard_normal(16).astype(np.float32)
    m[20] = m[3] + 0.01 * rng.standard_normal(16).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(50), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.reshape(-1)), 16
            ).cast(pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    pairs = pl.from_arrow(_collect(dedup.embedding_neardup_pairs(ds, threshold=0.95)))
    got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    assert got == {(3, 10), (3, 20), (10, 20)}


# ---------------------------------------------------------------- simsearch

def test_brute_topk_matches_numpy(ray_session):
    import ray

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    out = pl.from_arrow(_collect(simsearch.brute_topk(ds, n_queries=4, k=5)))
    tbl = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    ids = tbl.column("vec_id").to_numpy()
    mat = np.asarray(tbl.column("embedding").combine_chunks().flatten()).reshape(
        len(ids), -1
    ).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    sims = mat[:4] @ mat.T
    for q in range(4):
        want = ids[np.lexsort((ids, -sims[q]))[:5]].tolist()
        got = (
            out.filter(pl.col("query_id") == q)
            .sort("rank")["neighbor_id"]
            .to_list()
        )
        assert got == want, q


def test_lsh_topk_recall(ray_session):
    import ray

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    exact = pl.from_arrow(_collect(simsearch.brute_topk(ds, n_queries=8, k=5)))
    approx = pl.from_arrow(_collect(simsearch.lsh_topk(ds, n_queries=8, k=5)))
    # every query answers; rank-1 self hit always found (query in own bucket)
    hits = 0
    for q in range(8):
        e = set(exact.filter(pl.col("query_id") == q)["neighbor_id"].to_list())
        a = set(approx.filter(pl.col("query_id") == q)["neighbor_id"].to_list())
        assert q in a  # self-match survives bucketing
        hits += len(e & a)
    assert hits >= 8  # recall>0 beyond chance; exactness not required


# --------------------------------------------------------------- multimodal

def test_multimodal_roundtrip(ray_session):
    import ray

    ds = ray.data.read_parquet(f"{SF}/documents.parquet")
    meta = _collect(multimodal.decode_meta(multimodal.attach_payload(ds)))
    df = pl.from_arrow(meta).sort("doc_id")
    assert df["valid"].all()
    doc = df["doc_id"].to_numpy()
    assert (df["width"].to_numpy() == multimodal.fake_width(doc)).all()
    assert (df["height"].to_numpy() == multimodal.fake_height(doc)).all()
    assert (df["n_bytes"].to_numpy() >= 0).all()


def test_multimodal_decode_pixels_is_stubbed():
    if multimodal.HAVE_PIL:
        pytest.skip("PIL present; stub path not applicable")
    with pytest.raises(NotImplementedError):
        multimodal.DecodeImageMeta(decode_pixels=True)


def test_image_features(ray_session):
    import ray

    ds = ray.data.read_parquet(f"{SF}/documents.parquet")
    feats = _collect(
        multimodal.attach_payload(ds).map_batches(
            multimodal.ExtractImageFeatures, batch_format="pyarrow", concurrency=2
        )
    )
    assert feats.num_rows == 500
    f0 = np.asarray(feats.column("features")[0].as_py())
    assert abs(f0.sum() - 1.0) < 1e-5


# ------------------------------------------------------------------ filters

def _pages_tbl():
    return pa.table(
        {
            "url": pa.array(
                [
                    "http://a.example/p/1",
                    "https://b.example/img/x.JPG",
                    "http://sub.a.example/a/a/a/a/b",
                    "http://c.other/path?q=1",
                ]
            ),
            "status": pa.array([200, 404, 301, 200], pa.int32()),
            "content_type": pa.array(["text/html", "image/jpeg", None, "text/plain"]),
            "html": pa.array([b"hello", b"\x00\x00\x00\x00binary", b"", b"find needle here"], pa.binary()),
        }
    )


def test_filter_atoms():
    t = _pages_tbl()
    assert filters.SchemeEquals("https")(t).tolist() == [False, True, False, False]
    assert filters.StatusCategory(2)(t).tolist() == [True, False, False, True]
    assert filters.ContentTypeStartsWith("text/")(t).tolist() == [True, False, False, True]
    assert filters.HostEquals("a.example")(t).tolist() == [True, False, False, False]
    assert filters.HostEndsWith("a.example")(t).tolist() == [True, False, True, False]
    assert filters.PathEndsWithOneOf([".jpg", ".png"])(t).tolist() == [False, True, False, False]
    assert filters.URLShorterThan(21)(t).tolist() == [True, False, False, False]
    assert filters.URLMatchesRegex("img")(t).tolist() == [False, True, False, False]
    assert filters.IsProbablyBinary()(t).tolist() == [False, True, False, False]
    assert filters.ResponseMatches("needle")(t).tolist() == [False, False, False, True]
    assert filters.DuplicateSegmentsLessThan(3)(t).tolist() == [True, True, False, True]
    assert filters.URLEquals("http://a.example/p/1")(t).tolist() == [True, False, False, False]
    combo = filters.StatusCategory(2) & ~filters.IsProbablyBinary()
    assert combo(t).tolist() == [True, False, False, True]
    assert (filters.TRUE | filters.FALSE)(t).tolist() == [True] * 4


def test_same_host():
    t = pa.table(
        {
            "src_url": pa.array(["http://a.x/1", "http://a.x/1"]),
            "dst_url": pa.array(["http://a.x/2", "http://b.x/2"]),
        }
    )
    assert filters.SameHost()(t).tolist() == [True, False]


def test_apply_filter_dataset(ray_session):
    import ray

    ds = ray.data.from_arrow(_pages_tbl())
    out = _collect(filters.apply_filter(ds, filters.StatusCategory(2)))
    assert out.num_rows == 2


def test_ops_empty_inputs(ray_session):
    """Ops degrade gracefully on empty tables (no crashes, empty out)."""
    import ray

    empty_docs = pa.table({"doc_id": pa.array([], pa.int64()),
                           "text": pa.array([], pa.string())})
    assert text.token_quality_batch(empty_docs).num_rows == 0
    assert text.lang_id_batch(empty_docs).num_rows == 0
    assert text.fingerprint_batch(empty_docs).num_rows == 0
    assert dedup.simhash_batch(empty_docs).num_rows == 0
    assert dedup.minhash_batch(empty_docs).num_rows == 0
    ds = ray.data.from_arrow(empty_docs)
    batches = list(
        dedup.exact_dedup_groups(ds).iter_batches(batch_format="pyarrow")
    )
    assert sum(b.num_rows for b in (pa.table(x) for x in batches)) == 0


def test_lang_id_ngram_on_real_sentences(ray_session):
    import pyarrow as pa
    import ray

    from bubing_ray.ops.text import lang_id_ngram

    samples = [
        ("the quick brown fox jumps over the lazy dog and runs along", "en"),
        ("le chat est sur la table et les oiseaux chantent dans le jardin", "fr"),
        ("der hund ist nicht in der schule und ich gehe nach hause", "de"),
        ("los gatos y los perros de la casa que juegan en el jardín", "es"),
        ("这是一个中文句子", "zh"),
        ("12345 67890 !!!", "unk"),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(samples)), pa.int64()),
                "text": pa.array([s for s, _ in samples], pa.string()),
            }
        )
    )
    out = lang_id_ngram(ds).to_pandas().sort_values("doc_id")
    assert list(out["pred_lang"]) == [l for _, l in samples]


def test_duplicate_segments_full_reference_vectors():
    """Complete vector set of FiltersTest.testDuplicateSegments
    (test/.../warc/filters/FiltersTest.java:163-193) for
    DuplicateSegmentsLessThan(3)."""
    import pyarrow as pa

    from bubing_ray.ops import filters

    vectors = [
        ("http://example.com/a/a/a/a/a", False),
        ("http://example.com/b/a/b/a/b/a/-", False),
        ("http://example.com/a/b/a/a/a", False),
        ("http://example.com/bbb/bbba/f/e", True),
        ("http://example.com/l/lc/i/c/l/lc/p/i/c/l/lc/p/l/lc/i/c/l/lc/p/i/c/l/lc/p/i/c/l/lc/p/", False),
        ("http://example.com/b/d/b/c/b/e", True),
        ("http://example.com/b/b/b", False),
        ("http://example.com/b/a/b/a/b/a/", False),
        ("http://example.com/foo/bar/foo/bar/foo/bar", False),
        ("http://example.com/b/a/b/a/b/c/b/a/", True),
        ("http://example.com/b/a/b/a/b/b/a/", True),
        ("http://example.com/b/b", True),
        ("http://a/", True),
        ("http://example.com/", True),
        ("http://example.com/b", True),
        ("http://example.com/b/", True),
        ("http://example.com/b/b/", True),
        ("http://example.com/a/b/b/b", False),
        ("http://example.com/a/b/a/c/a/c/a/c", False),
        ("http://example.com/b/b/b/a", False),
        ("http://example.com/b/a/d/b/a/d/b/a/d", False),
        ("http://example.com/b/a/d/b/a/d/b/a/d/z", False),
        ("http://example.com/b/b/a/b/b/a/b/a", True),
        ("http://example.com/c/b/b/b", False),
    ]
    t = pa.table({"url": pa.array([u for u, _ in vectors], pa.string())})
    got = filters.DuplicateSegmentsLessThan(3)(t).tolist()
    for (u, exp), g in zip(vectors, got):
        assert g == exp, u


def test_bpe_merges_matches_unrolled_sql_oracle():
    """The bpe_merges / bpe_encode_counts oracles unroll the 15-step
    training loop textually in SQL; lock engine == oracle at sf0.001 so
    a kernel change that shifts merge order or tie-break fails here
    before the driver sweep."""
    import duckdb

    from __ray_entry__ import oracle_sql, queries

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    qs, osql = queries(), oracle_sql()
    for q in ("bpe_merges", "bpe_encode_counts"):
        got = pl.from_arrow(_collect(qs[q](SF)))
        exp = pl.from_arrow(con.execute(osql[q]).arrow())
        got = got.sort(got.columns)
        exp = exp.sort(exp.columns)
        assert got.columns == exp.columns, q
        for c in exp.columns:
            assert got[c].to_list() == exp[c].to_list(), (q, c)
