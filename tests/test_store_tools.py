"""Store post-processing tools over a real crawl store."""

import pyarrow as pa
import pytest

from bubing_ray import pages
from bubing_ray.frontier.crawl import CrawlConfig, Crawler
from bubing_ray.ops import filters, store_tools


@pytest.fixture(scope="module")
def store_dir(tmp_path_factory, ray_session):
    web = str(tmp_path_factory.mktemp("web_st"))
    pages.write_pages(web, n_hosts=6, pages_per_host=8, out_degree=4, seed=1)
    store = str(tmp_path_factory.mktemp("store_st"))
    cfg = CrawlConfig(
        pages_dir=web, store_dir=store, seeds=pages.seeds_for(6),
        n_host_shards=2, n_sieve_shards=2, n_digest_shards=2,
        sa_delay_ms=200, ip_delay_ms=100, round_ms=200,
        retry_quantum_ms=60_000, store_html=True,
    )
    c = Crawler(cfg)
    c.add_seeds(cfg.seeds)
    c.run()
    c.shutdown()
    return store


def _collect(ds):
    return pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])


def test_process_store_text(store_dir):
    out = _collect(store_tools.process_store(store_dir, processor="text"))
    assert set(out.column_names) == {"url", "text"}
    assert out.num_rows > 10


def test_process_store_filtered(store_dir):
    pred = filters.StatusCategory(2) & filters.URLMatchesRegex(r"/p/")
    out = _collect(store_tools.process_store(store_dir, pred=pred, processor="uri"))
    assert out.num_rows > 0
    assert all("/p/" in u or "/priv/" in u for u in out.column("url").to_pylist())


def test_process_store_preserve_order(store_dir):
    out = _collect(
        store_tools.process_store(store_dir, processor="text", preserve_order=True)
    )
    # the sort key must NOT leak: same schema as preserve_order=False
    assert out.column_names == ["url", "text"]
    # row order = store fetch order (correlate via url)
    store = _collect(store_tools.read_store(store_dir))
    want = (store.sort_by("fetch_seq").column("url").to_pylist())
    assert out.column("url").to_pylist() == want


def test_digest_hex_processor(store_dir):
    out = _collect(store_tools.process_store(store_dir, processor="digest"))
    h = out.column("digest_hex")[0].as_py()
    assert len(h) == 16 and int(h, 16) >= 0


def test_repetition_set_empty(store_dir):
    # the sieve guarantees each URL fetched at most once -> no repeats
    out = store_tools.repetition_set(store_dir)
    assert _collect(out).num_rows if out.count() else True
    assert out.count() == 0


@pytest.fixture(scope="module")
def repeat_store(tmp_path_factory):
    """Synthetic store parquet with genuine URL re-fetches and shared
    digests, to exercise the non-empty paths of the offline tools."""
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("store_rep")
    urls, seqs, digs = [], [], []
    seq = 0
    for u in range(30):
        for rep in range(1 + (u % 3)):  # urls 0 mod 3 fetched once, etc
            urls.append(f"http://h{u % 5}.example/p/{u}")
            seqs.append(seq)
            digs.append((u % 7) - 3)  # shared digests, incl. negatives
            seq += 1
    pq.write_table(
        pa.table({"url": pa.array(urls),
                  "fetch_seq": pa.array(seqs, pa.int64()),
                  "digest64": pa.array(digs, pa.int64())}),
        str(d / "part-0.parquet"),
    )
    return str(d)


def test_repetition_set_repeats_route_invariant(repeat_store, ray_session):
    """Non-first fetches only, identical at two route counts."""
    def rows(nr):
        t = _collect(store_tools.repetition_set(repeat_store, n_routes=nr))
        return sorted(zip(t.column("url").to_pylist(),
                          t.column("fetch_seq").to_pylist()))

    r4, r17 = rows(4), rows(17)
    assert r4 == r17
    # model: every (url, seq) where seq != min(seq) of that url
    import collections
    first = {}
    all_rows = []
    t = _collect(store_tools.process_store(repeat_store, processor=lambda b: b))
    for u, s in zip(t.column("url").to_pylist(),
                    t.column("fetch_seq").to_pylist()):
        first.setdefault(u, s)
        all_rows.append((u, s))
    model = sorted((u, s) for u, s in all_rows if s != first[u])
    assert r4 == model and len(model) > 0


def test_graph_map_route_invariant(repeat_store, ray_session):
    import polars as pl

    def rows(nr):
        t = _collect(store_tools.graph_map(repeat_store, n_routes=nr))
        return pl.from_arrow(t).sort(["fetch_seq"])

    g4, g16 = rows(4), rows(16)
    assert g4.equals(g16)
    for _key, grp in g4.group_by("digest64"):
        first = grp.sort("fetch_seq")["url"][0]
        assert (grp["archetype_url"] == first).all()


def test_graph_map(store_dir):
    out = _collect(store_tools.graph_map(store_dir))
    stats = store_tools.store_stats(store_dir)
    assert out.num_rows == stats["stored"]
    # every duplicate maps to an archetype url with the same digest64
    # and the archetype is the earliest fetch of its digest
    import polars as pl

    df = pl.from_arrow(out)
    for key, grp in df.group_by("digest64"):
        first = grp.sort("fetch_seq")["url"][0]
        assert (grp["archetype_url"] == first).all()
    assert stats["archetypes"] + stats["duplicates"] == stats["stored"]
