"""Adaptive front sizing (Frontier.java:824-835 analogue) and
content-digest seen-set disk spill."""

import glob
import os

import pyarrow.dataset as pads
import pytest

from bubing_ray import pages
from bubing_ray.frontier.crawl import CrawlConfig, Crawler

H, P = 12, 10


@pytest.fixture(scope="module")
def web_dir(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("webfd")
    pages.write_pages(str(d), n_hosts=H, pages_per_host=P, out_degree=4, seed=0)
    return str(d)


def _crawl(web_dir, store, **kw):
    cfg = CrawlConfig(
        pages_dir=web_dir, store_dir=store, seeds=pages.seeds_for(H, 6),
        n_host_shards=2, n_sieve_shards=2, n_digest_shards=2,
        sa_delay_ms=200, ip_delay_ms=100, round_ms=200, keepalive=8,
        retry_quantum_ms=60_000, store_html=False, **kw,
    )
    c = Crawler(cfg)
    c.add_seeds(cfg.seeds)
    c.run()
    return c, cfg


def _store_urls(store):
    t = pads.dataset(store, partitioning="hive").to_table()
    return sorted(t.column("url").to_pylist())


def test_adaptive_front_grows_under_clipping(web_dir, ray_session, tmp_path):
    """A front budget smaller than the eligible work per round must grow
    (starvation rule) and the crawl must still fetch the same URL set as
    an unconstrained run."""
    store_small = str(tmp_path / "small")
    c1, cfg1 = _crawl(web_dir, store_small, front_budget=4, front_budget_max=1000)
    assert c1.front_budget > cfg1.front_budget  # grew
    c1.shutdown()

    store_big = str(tmp_path / "big")
    c2, _ = _crawl(web_dir, store_big)
    c2.shutdown()
    assert _store_urls(store_small) == _store_urls(store_big)


def test_front_budget_survives_checkpoint(web_dir, ray_session, tmp_path):
    store = str(tmp_path / "ck")
    c, cfg = _crawl(web_dir, store, front_budget=4, front_budget_max=1000)
    grown = c.front_budget
    assert grown > 4
    c.checkpoint()
    c.shutdown()
    c2 = Crawler(cfg)
    c2.restore()
    assert c2.front_budget == grown
    c2.shutdown()


def test_digest_spill_engaged_and_flags_unchanged(web_dir, ray_session, tmp_path):
    """With a tiny digest RAM budget the digest shards must spill to
    disk runs, and the duplicate flags must match the RAM-only run."""
    store_a = str(tmp_path / "nospill")
    ca, _ = _crawl(web_dir, store_a)
    ca.shutdown()

    store_b = str(tmp_path / "spill")
    cb, _ = _crawl(web_dir, store_b, digest_max_ram_hashes=8)
    spill_files = glob.glob(os.path.join(store_b, "_digests_seen", "*.npy"))
    assert spill_files, "digest shards never spilled"
    cb.shutdown()

    def dup_map(store):
        t = pads.dataset(store, partitioning="hive").to_table()
        return dict(zip(t.column("url").to_pylist(),
                        t.column("is_duplicate").to_pylist()))

    assert dup_map(store_a) == dup_map(store_b)
