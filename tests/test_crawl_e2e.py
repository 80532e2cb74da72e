"""End-to-end crawl equivalence: distributed engine vs sequential model
(FIXTURES.md §6): URL-seen set, per-host crawl order (FIFO, robots
first), byte-identical extracted text, digest/is_duplicate parity, and
checkpoint/resume equivalence."""

import shutil

import numpy as np
import pyarrow.dataset as pads
import pytest

from bubing_ray import burl, pages
from bubing_ray.frontier.crawl import CrawlConfig, Crawler
from bubing_ray.frontier.model import SequentialCrawler

H, P, DEG, SEED = 8, 10, 4, 0


@pytest.fixture(scope="module")
def web_dir(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("web")
    pages.write_pages(str(d), n_hosts=H, pages_per_host=P, out_degree=DEG, seed=SEED)
    return str(d)


@pytest.fixture(scope="module")
def pages_tbl(web_dir):
    return pads.dataset(web_dir).to_table()


def mk_cfg(web_dir, store_dir, **kw):
    base = dict(
        pages_dir=web_dir,
        store_dir=store_dir,
        seeds=pages.seeds_for(H),
        n_host_shards=2,
        n_sieve_shards=2,
        n_digest_shards=2,
        front_budget=10_000,
        max_rounds=3000,
    )
    base.update(kw)
    return CrawlConfig(**base)


def read_store(store_dir):
    ds = pads.dataset(store_dir, partitioning="hive")
    t = ds.to_table()
    import pyarrow.compute as pc

    return t.take(pc.sort_indices(t, sort_keys=[("fetch_seq", "ascending")]))


@pytest.fixture(scope="module")
def dist_run(web_dir, ray_session, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("store"))
    shutil.rmtree(store, ignore_errors=True)
    cfg = mk_cfg(web_dir, store)
    c = Crawler(cfg)
    c.add_seeds(cfg.seeds)
    stats = c.run()
    return c, stats, read_store(store)


@pytest.fixture(scope="module")
def model_run(pages_tbl, web_dir):
    cfg = mk_cfg(web_dir, "/tmp/unused_model_store")
    m = SequentialCrawler(cfg, pages_tbl, n_shards=2)
    m.add_seeds(cfg.seeds)
    stats = m.run()
    return m, stats


def test_url_seen_set_matches(dist_run, model_run):
    c, _, _ = dist_run
    m, _ = model_run
    dist_hashes = set(c.sieve.all_hashes().tolist())
    model_hashes = set(m.sieve.all_hashes().tolist())
    assert dist_hashes == model_hashes
    assert len(dist_hashes) == len(m.url_seen)


def test_fetched_sets_and_counts_match(dist_run, model_run):
    _, dstats, store = dist_run
    m, mstats = model_run
    assert dstats["fetched"] == mstats["fetched"]
    assert set(store.column("url").to_pylist()) == set(m.store.keys())


def test_global_crawl_order_matches_with_same_shards(dist_run, model_run):
    # same shard count (2) on both sides -> identical global fetch order
    _, _, store = dist_run
    m, _ = model_run
    assert store.column("url").to_pylist() == m.crawl_order


def test_per_host_fifo_order(dist_run, model_run):
    _, _, store = dist_run
    m, _ = model_run
    got: dict[str, list[str]] = {}
    for u in store.column("url").to_pylist():
        got.setdefault(burl.scheme_authority(u), []).append(u)
    assert got == m.per_host_order()


def test_text_and_digest_byte_identical(dist_run, model_run, pages_tbl):
    _, _, store = dist_run
    m, _ = model_run
    oracle = {r["url"]: r["text"] for r in pages_tbl.to_pylist() if r["status"] == 200}
    rows = store.to_pylist()
    checked = 0
    for r in rows:
        mr = m.store[r["url"]]
        assert r["text"] == mr["text"]
        assert r["digest"] == mr["digest"]
        assert bool(r["is_duplicate"]) == mr["is_duplicate"]
        if r["url"] in oracle and r["status"] == 200:
            assert r["text"] == oracle[r["url"]], f"text oracle mismatch for {r['url']}"
            checked += 1
    assert checked > 30


def test_robots_respected(dist_run):
    _, _, store = dist_run
    # /priv/ paths of robots-bearing hosts must never be fetched
    for u in store.column("url").to_pylist():
        h = int(burl.host_of(burl.scheme_authority(u))[4:].split(".")[0])
        if pages.has_robots(h):
            assert "/priv/" not in u


def test_checkpoint_resume_equivalence(web_dir, ray_session, dist_run, tmp_path_factory):
    _, full_stats, full_store = dist_run
    store2 = str(tmp_path_factory.mktemp("store_resume"))
    cfg = mk_cfg(web_dir, store2, max_rounds=25)
    c1 = Crawler(cfg)
    c1.add_seeds(cfg.seeds)
    c1.run()
    c1.checkpoint()
    assert c1.round >= 25
    c1.shutdown()
    # fresh actors, restore, continue to completion
    cfg2 = mk_cfg(web_dir, store2, max_rounds=3000)
    c2 = Crawler(cfg2)
    c2.restore()
    c2.run()
    resumed_hashes = set(c2.sieve.all_hashes().tolist())
    c2.shutdown()
    resumed_store = read_store(store2)
    assert resumed_store.column("url").to_pylist() == full_store.column("url").to_pylist()
    assert (
        resumed_store.column("digest").to_pylist() == full_store.column("digest").to_pylist()
    )
    assert resumed_hashes == set(dist_run[0].sieve.all_hashes().tolist())


def test_shard_count_invariance(web_dir, ray_session, tmp_path):
    """Partitioning correctness: the crawl result is independent of the
    shard layout (1x1x1 vs 4x4x4 shards over the same web + seeds) —
    the property that makes shard counts a pure scale knob (north rule:
    partitioning/shuffle handled explicitly, no semantic coupling)."""
    import pyarrow.dataset as pads2

    results = []
    for n, chunk in ((1, 512), (4, 512), (2, 3)):
        store = str(tmp_path / f"st_{n}_{chunk}")
        cfg = mk_cfg(web_dir, store, n_host_shards=n, n_sieve_shards=n,
                     n_digest_shards=n, store_html=False,
                     sa_delay_ms=200, ip_delay_ms=100, round_ms=200,
                     retry_quantum_ms=60_000, parse_chunk=chunk)
        c = Crawler(cfg)
        c.add_seeds(cfg.seeds)
        c.run()
        c.shutdown()
        t = pads2.dataset(store, partitioning="hive").to_table()
        results.append({
            u: (s, d, txt) for u, s, d, txt in zip(
                t.column("url").to_pylist(), t.column("status").to_pylist(),
                t.column("digest64").to_pylist(), t.column("text").to_pylist())
        })
    for other in results[1:]:
        assert set(results[0]) == set(other)
        for u in results[0]:
            assert results[0][u] == other[u], u


def test_placement_modes_same_store(web_dir, ray_session, tmp_path):
    """placement="spread"/"pair" change only WHERE actors run (no-op on
    one node) — the store contents must match the default exactly, and
    the pair placement group must be created and cleaned up."""
    import pyarrow.dataset as pads
    stores = {}
    for mode in ("none", "pair"):
        store = str(tmp_path / f"store_{mode}")
        cfg = CrawlConfig(
            pages_dir=web_dir, store_dir=store,
            seeds=pages.seeds_for(H, 4), sa_delay_ms=200, ip_delay_ms=100,
            round_ms=200, retry_quantum_ms=60_000, store_html=False,
            n_host_shards=2, n_sieve_shards=2, n_digest_shards=2,
            placement=mode,
        )
        c = Crawler(cfg)
        if mode == "pair":
            assert c._pg is not None
        c.add_seeds(cfg.seeds)
        c.run()
        c.shutdown()
        assert c._pg is None
        t = pads.dataset(store, partitioning="hive").to_table()
        stores[mode] = sorted(t.column("url").to_pylist())
    assert stores["none"] == stores["pair"] and len(stores["none"]) > 0
