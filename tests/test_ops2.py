"""Tests for seeds source, spam scoring, stats sketches, binary parser,
and the CLI."""

import json
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from bubing_ray.html_parser import ParseHTMLBatch, parse_binary
from bubing_ray.ops import spam, stats
from bubing_ray.sources.seeds import read_seeds, seed_dataset

SF = "/root/testdata/sf0.001"


def _collect(ds):
    if isinstance(ds, pa.Table):
        return ds
    return pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])


# ------------------------------------------------------------------- seeds

def test_read_seeds_file(tmp_path):
    f = tmp_path / "seeds.txt"
    f.write_text(
        "# comment\n"
        "HTTP://Example.COM:80/a\n"
        "not a url\n"
        "http://example.com/a\n"   # dup after canonicalization? no: different path case
        "relative/path\n"
        "https://ok.org/x#frag\n"
        "\n"
    )
    out = read_seeds(str(f))
    assert "http://example.com/a" in out
    assert "https://ok.org/x" in out
    assert all(u.startswith("http") for u in out)
    assert len(out) == len(set(out))


def test_read_seeds_literals():
    out = read_seeds(["http://a.x/1", "http://a.x/1", "::bad::"])
    assert out == ["http://a.x/1"]


def test_seed_dataset(ray_session, tmp_path):
    f = tmp_path / "s.txt"
    f.write_text("http://h1.example/p/0\n#c\nHTTP://H2.EXAMPLE/\n")
    t = _collect(seed_dataset(str(f)))
    assert set(t.column("url").to_pylist()) == {
        "http://h1.example/p/0", "http://h2.example/",
    }


# -------------------------------------------------------------------- spam

def test_term_count_batch():
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["data JOIN data slow datafast"])})
    out = spam.term_count_batch(t).to_pydict()
    assert out["n_data"] == [2]      # token equality, not substring
    assert out["n_join"] == [1]      # lowercased
    assert out["n_fast"] == [0]


def test_spam_scores_pipeline(ray_session):
    import ray

    ds = ray.data.read_parquet(f"{SF}/documents.parquet")
    out = _collect(spam.spam_scores(ds, key="source"))
    assert out.num_rows == 20
    assert "spam_score_bp" in out.column_names
    assert all(s >= 0 for s in out.column("spam_score_bp").to_pylist())


# ------------------------------------------------------------------- stats

def test_summary_stats(ray_session):
    import ray

    rng = np.random.default_rng(3)
    x = rng.standard_normal(5000)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(x)}))
    st = stats.summary_stats(ds, "v")
    assert st["count"] == 5000
    assert abs(st["mean"] - x.mean()) < 1e-9
    assert abs(st["variance"] - x.var()) < 1e-6
    assert st["min"] == x.min() and st["max"] == x.max()


def test_log2_histogram(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({"v": pa.array([0.5, 1.0, 2.0, 3.0, 4.0, -1.0, 0.0])}))
    t = _collect(stats.log2_histogram(ds, "v"))
    d = dict(zip(t.column("bucket").to_pylist(), t.column("n").to_pylist()))
    assert d == {-1: 1, 0: 1, 1: 2, 2: 1}  # negatives/zeros dropped


def test_grouped_agg_matches_duckdb(ray_session):
    import duckdb
    import ray

    ds = ray.data.read_parquet(f"{SF}/lineitem.parquet")
    got = _collect(stats.grouped_agg(ds, ["l_returnflag"], "l_quantity"))
    exp = duckdb.sql(
        f"""SELECT l_returnflag, count(*) n_rows, sum(l_quantity) s,
            min(l_quantity) mn, max(l_quantity) mx
            FROM '{SF}/lineitem.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    import polars as pl

    g = pl.from_arrow(got).sort("l_returnflag")
    for i, (flag, n, s, mn, mx) in enumerate(exp):
        assert g["l_returnflag"][i] == flag
        assert g["n_rows"][i] == n
        assert g["sum_l_quantity"][i] == s
        assert g["min_l_quantity"][i] == mn and g["max_l_quantity"][i] == mx


# ----------------------------------------------------------- binary parser

def test_binary_parser_fallback():
    t = pa.table({
        "url": pa.array(["http://a.x/i.png", "http://a.x/p.html"]),
        "html": pa.array([b"\x00\x01PNG", b"<html><body>hi</body></html>"], pa.binary()),
        "status": pa.array([200, 200], pa.int32()),
        "content_type": pa.array(["image/png", "text/html"]),
    })
    out = ParseHTMLBatch()(t)
    assert out.column("text").to_pylist()[0] == ""
    assert out.column("n_links").to_pylist()[0] == 0
    assert out.column("text").to_pylist()[1] == "hi"
    # host-salted digest (BinaryParser.java:86-92 semantics)
    a = parse_binary("http://a.x/i.png", b"\x00\x01PNG")
    b = parse_binary("http://b.x/i.png", b"\x00\x01PNG")
    assert a.digest == out.column("digest").to_pylist()[0]
    assert a.digest != b.digest


# --------------------------------------------------------------------- CLI

def test_cli_genweb_crawl_stats(tmp_path):
    env = {"RAY_DATA_DISABLE_PROGRESS_BARS": "1", "PATH": "/usr/bin:/bin",
           "HOME": "/root", "PYTHONPATH": "/root/repo"}
    web = str(tmp_path / "web")
    store = str(tmp_path / "store")
    seeds = tmp_path / "seeds.txt"
    r = subprocess.run(
        [sys.executable, "-m", "bubing_ray", "genweb", "--out", web,
         "--hosts", "4", "--pages", "5"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    seeds.write_text("http://host0.example/p/0\nhttp://host2.example/p/0\n")
    r = subprocess.run(
        [sys.executable, "-m", "bubing_ray", "crawl", "--pages-dir", web,
         "--store-dir", store, "--seeds-file", str(seeds),
         "--sa-delay-ms", "200", "--ip-delay-ms", "100", "--round-ms", "200",
         "--host-shards", "2", "--sieve-shards", "2", "--retry-quantum-ms", "60000"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    crawl_out = json.loads(r.stdout.strip().splitlines()[-1])
    assert crawl_out["fetched"] > 0
    r = subprocess.run(
        [sys.executable, "-m", "bubing_ray", "stats", "--store-dir", store],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    st = json.loads(r.stdout.strip().splitlines()[-1])
    assert st["stored"] == crawl_out["fetched"]


# ----------------------------------------------------------------- windows

def test_sessionize(ray_session):
    import ray

    from bubing_ray.ops.windows import session_stats, sessionize

    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "user_id": pa.array([7, 7, 7, 8, 8, 8], pa.int64()),
        "ts": pa.array([0, 50_000, 200_000, 0, 10_000, 20_000],
                       pa.int64()).cast(pa.timestamp("us")),
    })
    # us timestamps: 0, 0.05s, 0.2s ... with gap 100ms: user7 events at
    # 0ms/0.05ms/0.2ms in ms = 0, 0, 0 — use bigger numbers
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "user_id": pa.array([7, 7, 7, 8, 8, 8], pa.int64()),
        "ts": pa.array([0, 50_000_000, 200_000_000, 0, 10_000_000, 20_000_000],
                       pa.int64()).cast(pa.timestamp("us")),
    })
    ds = ray.data.from_arrow(t)
    out = pa.concat_tables([pa.table(b) for b in sessionize(
        ds, gap_ms=100_000).iter_batches(batch_format="pyarrow")])
    import polars as pl

    df = pl.from_arrow(out).sort(["user_id", "event_id"])
    # user7: 0s, 50s (gap 50s <= 100s -> same), 200s (gap 150s -> new)
    assert df.filter(pl.col("user_id") == 7)["session_id"].to_list() == [1, 1, 2]
    assert df.filter(pl.col("user_id") == 8)["session_id"].to_list() == [1, 1, 1]
    st = pa.concat_tables([pa.table(b) for b in session_stats(
        ds, gap_ms=100_000).iter_batches(batch_format="pyarrow")])
    sdf = pl.from_arrow(st).sort("user_id")
    assert sdf["n_sessions"].to_list() == [2, 1]
    assert sdf["max_session_events"].to_list() == [2, 3]


def test_ivf_topk(ray_session):
    import ray

    from bubing_ray.ops import simsearch

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    r = simsearch.ivf_topk(ds, n_queries=8, k=5)
    import polars as pl

    df = pl.from_arrow(r)
    assert df["query_id"].n_unique() == 8
    for q in range(8):
        sub = df.filter(pl.col("query_id") == q)
        assert q in sub["neighbor_id"].to_list()  # self survives (own list)
        assert sub["rank"].to_list() == list(range(1, len(sub) + 1))


# ------------------------------------------------------------------- graph

def test_link_graph(ray_session, tmp_path):
    import ray

    from bubing_ray import pages
    from bubing_ray.ops.graph import host_edges, host_indegree, host_pagerank, link_edges

    web = str(tmp_path / "webg")
    pages.write_pages(web, n_hosts=6, pages_per_host=10, out_degree=5, seed=4)
    ds = ray.data.read_parquet(web)
    edges = link_edges(ds)
    e = _collect(edges)
    assert e.num_rows > 50
    assert all(u.startswith("http") for u in e.column("dst_url").to_pylist()[:20])
    he = _collect(host_edges(link_edges(ds)))
    assert he.num_rows <= 36  # at most 6x6 host pairs
    ind = _collect(host_indegree(link_edges(ds)))
    assert 1 <= ind.num_rows <= 6
    assert all(0 < d <= 6 for d in ind.column("indegree").to_pylist())
    pr = host_pagerank(link_edges(ds), iters=30)
    ranks = pr.column("rank_bp").to_pylist()
    assert len(ranks) <= 6 and sum(ranks) > 0
    # rank is a probability-ish distribution: sums to ~1e7
    assert abs(sum(ranks) - 1e7) < 1e5
    # deterministic across runs
    pr2 = host_pagerank(link_edges(ds), iters=30)
    assert pr.equals(pr2)


# ----------------------------------------------------------- spam model

def test_logistic_model_train_serialize_score(tmp_path, ray_session):
    """Train the SpamDetector-analogue on synthetic labels, round-trip
    it through JSON, and score through the actor-pool stage."""
    import numpy as np
    import pyarrow as pa
    import ray

    from bubing_ray.ops.spam import SPAM_TERMS, LogisticModel, spam_scores

    rng = np.random.default_rng(11)
    n = 400
    chars = rng.integers(500, 2000, size=n)
    spam = rng.integers(0, 2, size=n).astype(bool)
    # spammy rows are term-dense, ham rows nearly term-free
    counts = np.where(
        spam[:, None],
        rng.integers(5, 30, size=(n, len(SPAM_TERMS))),
        rng.integers(0, 2, size=(n, len(SPAM_TERMS))),
    )
    X = LogisticModel.features(counts, chars)
    m = LogisticModel.train(X, spam)
    p = m.predict_proba(X)
    acc = ((p > 0.5) == spam).mean()
    assert acc > 0.95, acc

    path = str(tmp_path / "model.json")
    m.save(path)
    m2 = LogisticModel.load(path)
    assert np.allclose(m2.predict_proba(X), p)

    # actor-pool scoring over a docs table: spammy source scores higher
    texts, sources = [], []
    for i in range(60):
        is_spam = i % 2 == 0
        words = (list(SPAM_TERMS) * 12) if is_spam else (["hello", "world"] * 30)
        texts.append(" ".join(words))
        sources.append("spamhost" if is_spam else "hamhost")
    ds = ray.data.from_arrow(
        pa.table({"source": pa.array(sources), "text": pa.array(texts)})
    )
    out = spam_scores(ds, key="source", model_path=path).to_pandas()
    out = out.set_index("source")
    assert out.loc["spamhost", "spam_prob_bp"] > out.loc["hamhost", "spam_prob_bp"]
    assert out.loc["spamhost", "spam_prob_bp"] > 5000
    assert out.loc["hamhost", "spam_prob_bp"] < 5000


# ------------------------------------------------- multimodal resize/frames

def test_resize_image_pixels_exact():
    import struct

    import numpy as np
    import pyarrow as pa

    from bubing_ray.ops import multimodal as M

    w, h = 10, 6
    px = np.arange(w * h, dtype=np.uint8)
    payload = M.MAGIC + struct.pack("<HH", w, h) + px.tobytes()
    batch = pa.table({"doc_id": pa.array([5], pa.int64()),
                      "payload": pa.array([payload], pa.binary())})
    out = M.ResizeImage(scale=0.5)(batch)
    p2 = out.column("payload")[0].as_py()
    ow, oh = struct.unpack("<HH", p2[4:8])
    assert (ow, oh) == (5, 3)
    got = np.frombuffer(p2[M.HEADER_LEN:], dtype=np.uint8).reshape(oh, ow)
    ix = (np.arange(ow) * w // ow)
    iy = (np.arange(oh) * h // oh)
    exp = px.reshape(h, w)[np.ix_(iy, ix)]
    assert (got == exp).all()
    # truncated source grid reads as zero-padded
    short = M.MAGIC + struct.pack("<HH", w, h) + px[: 7].tobytes()
    out2 = M.ResizeImage(scale=0.5)(
        pa.table({"doc_id": pa.array([1], pa.int64()),
                  "payload": pa.array([short], pa.binary())})
    )
    p3 = out2.column("payload")[0].as_py()
    assert len(p3) == M.HEADER_LEN + 5 * 3


def test_sample_frames_bytes_exact():
    import struct

    import numpy as np
    import pyarrow as pa

    from bubing_ray.ops import multimodal as M

    batch = pa.table({"doc_id": pa.array([8], pa.int64()),
                      "text": pa.array(["abcdefgh"], pa.string())})
    vid = M.attach_video_batch(batch)
    p = vid.column("payload")[0].as_py()
    n, w, h = struct.unpack("<HHH", p[4:10])
    assert n == (8 % 7) + 1 and w == (8 % 13) + 4 and h == (8 % 11) + 4
    out = M.SampleFrames(stride=2)(vid)
    idxs = out.column("frame_idx").to_pylist()
    assert idxs == list(range(0, n, 2))
    body = p[M.VIDEO_HEADER_LEN:]
    for row, fi in enumerate(idxs):
        assert out.column("frame")[row].as_py() == body[fi * w * h:(fi + 1) * w * h]


# ------------------------------------------------------------ HyperLogLog

def test_hll_registers_partition_invariant_and_estimate(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from bubing_ray.ops.stats import hll_estimate, hll_registers

    n = 20_000
    ids = pa.table({"v": pa.array(np.arange(n, dtype=np.int64) % 3000)})
    ds = ray.data.from_arrow(ids)
    a = hll_registers(ds, "v").to_pandas().sort_values("register") \
        .reset_index(drop=True)
    b = hll_registers(ds.repartition(13), "v").to_pandas() \
        .sort_values("register").reset_index(drop=True)
    # sketch state is merge-order invariant (max is associative)
    assert a.equals(b)
    est = hll_estimate(pa.table(
        {"register": pa.array(a["register"]), "rho": pa.array(a["rho"])}))
    assert abs(est - 3000) / 3000 < 0.05  # ~1.6% std error at p=12


def test_hll_registers_string_column(ray_session):
    import pyarrow as pa
    import ray

    from bubing_ray.ops.stats import hll_estimate, hll_registers

    tbl = pa.table({"s": pa.array([f"user-{i % 500}" for i in range(5000)])})
    regs = hll_registers(ray.data.from_arrow(tbl), "s").to_pandas()
    est = hll_estimate(pa.table(
        {"register": pa.array(regs["register"]),
         "rho": pa.array(regs["rho"])}))
    assert abs(est - 500) / 500 < 0.10


def test_hll_cm_null_values_ignored(ray_session):
    """NULLs contribute nothing to either sketch (SQL COUNT semantics);
    a null int must not NaN-float its way into a register/slot."""
    import numpy as np
    import pyarrow as pa
    import ray

    from bubing_ray.ops.stats import cm_sketch, hll_registers

    vals = list(range(200)) * 3
    clean = pa.table({"v": pa.array(vals, pa.int64())})
    dirty = pa.table({"v": pa.array(
        [v if i % 5 else None for i, v in enumerate([None] * 10 + vals)],
        pa.int64())})
    # rebuild clean to match exactly the non-null values of dirty
    kept = [v for i, v in enumerate([None] * 10 + vals)
            if i % 5 and v is not None]
    clean = pa.table({"v": pa.array(kept, pa.int64())})

    def regs(tbl):
        return hll_registers(ray.data.from_arrow(tbl), "v").to_pandas() \
            .sort_values("register").reset_index(drop=True)

    assert regs(clean).equals(regs(dirty))

    def cm(tbl):
        return cm_sketch(ray.data.from_arrow(tbl), "v").to_pandas() \
            .sort_values(["row", "slot"]).reset_index(drop=True)

    assert cm(clean).equals(cm(dirty))


def test_cm_sketch_partition_invariant_and_estimates(ray_session):
    import collections

    import pyarrow as pa
    import ray

    from bubing_ray.ops.stats import cm_estimate, cm_sketch

    vals = [f"k{i % 37}" for i in range(7400)] + ["hot"] * 600
    tbl = pa.table({"v": pa.array(vals)})
    ds = ray.data.from_arrow(tbl)
    a = cm_sketch(ds, "v").to_pandas().sort_values(["row", "slot"]) \
        .reset_index(drop=True)
    b = cm_sketch(ds.repartition(11), "v").to_pandas() \
        .sort_values(["row", "slot"]).reset_index(drop=True)
    assert a.equals(b)  # counter sums merge-order invariant
    sk = pa.table({c: pa.array(a[c]) for c in ("row", "slot", "count")})
    true = collections.Counter(vals)
    est = cm_estimate(sk, ["hot", "k0", "absent"])
    # CM estimates overcount only, and with 37 keys vs 4x2048 counters
    # collisions are essentially absent
    assert est["hot"] == true["hot"]
    assert est["k0"] >= true["k0"]
    assert est["absent"] <= 2  # tiny collision mass at most


def test_exact_quantiles_sequential_model(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from bubing_ray.ops.stats import exact_quantiles

    rng = np.random.default_rng(3)
    x = rng.integers(0, 40, 9973).astype(np.float64)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(x)}))
    out = exact_quantiles(ds, "v", qs_bp=(0, 2500, 5000, 9900, 10000))
    s = np.sort(x)
    n = len(x)
    for q, v in zip(out.column("q_bp").to_pylist(),
                    out.column("value").to_pylist()):
        r = (n - 1) * q // 10_000
        # smallest value with cumulative count > r == sorted[r]
        assert v == s[r], q


# ---------------------------------------- LM familiarity + BPE pair counts

def test_lm_score_sequential_model(ray_session):
    import collections

    import pyarrow as pa
    import ray

    from bubing_ray.ops.text import LM_BUCKET_CAP, lm_score

    texts = ["abcabcabc", "abcxyz", "zzzzz"]
    docs = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                     "text": texts})
    out = lm_score(ray.data.from_arrow(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # sequential model
    cnt = collections.Counter(
        t[i:i+3] for t in texts for i in range(len(t) - 2))
    for i, t in enumerate(texts):
        tris = [t[j:j+3] for j in range(len(t) - 2)]
        buckets = [min(cnt[x].bit_length() - 1, LM_BUCKET_CAP)
                   for x in tris]
        assert out["n_tri"][i] == len(tris)
        assert out["familiarity_bp"][i] == \
            (10_000 * sum(buckets)) // (LM_BUCKET_CAP * len(tris))


def test_lm_score_partition_invariant(ray_session):
    import ray

    from bubing_ray.ops.text import lm_score

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"])
    a = lm_score(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    b = lm_score(ds.repartition(9)).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert a.equals(b)
    assert (a["familiarity_bp"] > 0).all()  # self-trained: never OOD


def test_bpe_pair_counts_sequential_model(ray_session):
    import collections

    import pyarrow as pa
    import ray

    from bubing_ray.ops.text import bpe_pair_counts

    texts = ["aa ab aa", "ba aa"]
    docs = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                     "text": texts})
    out = bpe_pair_counts(ray.data.from_arrow(docs), k=5)
    cnt = collections.Counter()
    for t in texts:
        for tok in t.split():
            for x, y in zip(tok, tok[1:]):
                cnt[(ord(x) << 8) | ord(y)] += 1
    expect = sorted(cnt.items(), key=lambda p: (-p[1], p[0]))[:5]
    got = list(zip(out.column("pair_code").to_pylist(),
                   out.column("count").to_pylist()))
    assert got == expect


def test_familiarity_buckets_sequential_model(ray_session):
    import numpy as np
    import ray

    from bubing_ray.ops.text import familiarity_buckets, lm_score

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"])
    qs = (2500, 5000, 7500)
    out = familiarity_buckets(ds, qs_bp=qs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    scored = lm_score(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert out["familiarity_bp"].equals(scored["familiarity_bp"])

    # sequential cutoff model: smallest value whose cumulative count
    # exceeds floor((n-1)*q/10000), duplicates kept per quantile
    fam = np.sort(scored["familiarity_bp"].to_numpy())
    n = len(fam)
    cuts = np.sort([fam[np.searchsorted(
        np.arange(1, n + 1), (n - 1) * q // 10_000, side="right")]
        for q in qs])
    expect = np.searchsorted(cuts, out["familiarity_bp"].to_numpy(),
                             side="left")
    assert (out["bucket"].to_numpy() == expect).all()
    assert set(out["bucket"]) <= set(range(len(qs) + 1))


def test_grouped_quantiles_matches_per_group_model(ray_session):
    import ray

    from bubing_ray.ops.stats import exact_quantiles, grouped_quantiles

    rng = np.random.default_rng(5)
    t = pa.table({
        "g": pa.array(rng.integers(0, 6, 4000), type=pa.int64()),
        "v": pa.array(rng.integers(1, 50, 4000).astype(np.float64)),
    })
    ds = ray.data.from_arrow(t).repartition(9)
    got = grouped_quantiles(ds, "g", "v").to_pandas() \
        .sort_values(["g", "q_bp"]).reset_index(drop=True)
    # model: run the (oracle-green) global exact_quantiles per group
    import polars as pl

    frames = []
    for g in sorted(set(t.column("g").to_pylist())):
        sub = pa.table({"v": pl.from_arrow(t).filter(
            pl.col("g") == g)["v"].to_arrow()})
        q = exact_quantiles(ray.data.from_arrow(sub), "v").to_pandas()
        q.insert(0, "g", g)
        frames.append(q)
    exp = pd.concat(frames).sort_values(["g", "q_bp"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # route invariance
    alt = grouped_quantiles(ds, "g", "v", n_routes=3).to_pandas() \
        .sort_values(["g", "q_bp"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, alt)


def test_grouped_hll_matches_global_per_group(ray_session):
    import ray

    from bubing_ray.ops.stats import grouped_hll, hll_registers

    rng = np.random.default_rng(6)
    t = pa.table({
        "g": pa.array(rng.integers(0, 4, 5000), type=pa.int64()),
        "v": pa.array(rng.integers(0, 800, 5000), type=pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(8)
    got = grouped_hll(ds, "g", "v").to_pandas() \
        .sort_values(["g", "register"]).reset_index(drop=True)
    import polars as pl

    frames = []
    for g in range(4):
        sub = pa.table({"v": pl.from_arrow(t).filter(
            pl.col("g") == g)["v"].to_arrow()})
        r = hll_registers(ray.data.from_arrow(sub), "v").to_pandas()
        r.insert(0, "g", g)
        frames.append(r)
    exp = pd.concat(frames).sort_values(["g", "register"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def _seq_bpe(word_counts, k):
    """Sequential Sennrich BPE reference: overlapping pair counts,
    leftmost-non-overlapping merge application, (count desc, pair asc)
    tie-break."""
    vocab = {}
    for w, c in word_counts.items():
        t = tuple(w)
        vocab[t] = vocab.get(t, 0) + c
    merges = []
    for rank in range(k):
        pairs = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (a, b), cnt = sorted(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append((rank, a, b, cnt))
        newv = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            newv[t] = newv.get(t, 0) + c
        vocab = newv
    return merges


def test_bpe_train_matches_sequential_model(ray_session):
    import ray

    from bubing_ray.ops.text import bpe_train

    rng = np.random.default_rng(9)
    words = ["low", "lower", "lowest", "new", "newer", "aaaa", "aaa",
             "banana", "bandana", "ab", "ba", "abba"]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(2, 12)))
        for _ in range(60)
    ]
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(texts)})).repartition(5)
    got = bpe_train(ds, n_merges=12).to_pandas()

    wc = {}
    for t in texts:
        for w in t.lower().split():
            wc[w] = wc.get(w, 0) + 1
    exp = pd.DataFrame(_seq_bpe(wc, 12),
                       columns=["rank", "left", "right", "count"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_bpe_train_overlapping_runs(ray_session):
    """'aaaa' counts 3 overlapping (a,a) pairs but merges to [aa, aa]."""
    import ray

    from bubing_ray.ops.text import bpe_train

    ds = ray.data.from_arrow(pa.table({"text": pa.array(["aaaa"])}))
    got = bpe_train(ds, n_merges=2).to_pandas()
    assert got.loc[0, ["left", "right", "count"]].tolist() == ["a", "a", 3]
    assert got.loc[1, ["left", "right", "count"]].tolist() == ["aa", "aa", 1]


def _seq_encode(text, merges):
    total = 0
    for w in text.lower().split():
        syms = list(w)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        total += len(syms)
    return total


def test_bpe_encode_matches_sequential_model(ray_session):
    import ray

    from bubing_ray.ops.text import bpe_encode, bpe_train

    rng = np.random.default_rng(12)
    words = ["low", "lower", "aaaa", "banana", "abba", "newest"]
    texts = [" ".join(rng.choice(words, size=rng.integers(1, 10)))
             for _ in range(40)]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    merges = bpe_train(ds, n_merges=6)
    got = bpe_encode(ds, merges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pairs = list(zip(merges.column("left").to_pylist(),
                     merges.column("right").to_pylist()))
    for i, text in enumerate(texts):
        assert got.loc[i, "n_words"] == len(text.split())
        assert got.loc[i, "n_tokens"] == _seq_encode(text, pairs), text
