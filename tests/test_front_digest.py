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


def test_spill_tail_survives_checkpoint_segment_deletion(tmp_path):
    """The checkpoint must own the virtualizer tail: live segment files
    are deleted/rewritten by later refill cycles, so a snapshot that
    merely referenced them by path would lose spilled URLs on restore
    (and lose the RAM buffer entirely when spill_dir is unset)."""
    import glob as _glob
    import os as _os

    import numpy as np
    import pyarrow as pa

    from bubing_ray.frontier.hosts import HostShardState

    spdir = str(tmp_path / "sp")
    kw = dict(sa_delay_ms=10, ip_delay_ms=10, keepalive=4, head_cap=2,
              spill_dir=spdir, spill_segment_rows=2)
    s = HostShardState(0, **kw)
    n = 12
    s.absorb(pa.table({
        "sa": pa.array(["http://h.example"] * n, pa.string()),
        "pq": pa.array([f"/p/{i}" for i in range(n)], pa.string()),
        "seq": pa.array(np.arange(n, dtype=np.int64)),
        "ip": pa.array(np.full(n, 1, np.uint32)),
    }))
    s.commit_absorb()
    assert s.hosts["http://h.example"].spilled == n - 2
    ckpt = str(tmp_path / "shard.parquet")
    s.snapshot(ckpt)
    # simulate post-checkpoint refill cycles destroying the live files
    for seg in _glob.glob(_os.path.join(spdir, "seg-*")):
        _os.remove(seg)

    s2 = HostShardState(0, **kw)
    s2.restore(ckpt)
    h = s2.hosts["http://h.example"]
    assert len(h.queue) + h.spilled == n
    # drain: robots first, then every URL in FIFO order
    t = s2.emit_ready(0, 100)
    assert t.column("is_robots").to_pylist() == [True]
    s2.report(pa.table({
        "sa": pa.array(["http://h.example"]), "is_robots": pa.array([True]),
        "status": pa.array(np.array([404], np.int32)),
        "error": pa.array([None], pa.string()),
        "html": pa.array([b""], pa.binary()),
        "pq": pa.array(["/robots.txt"]), "seq": pa.array([-1], pa.int64()),
    }), 1)
    got = []
    now = 100
    while True:
        t = s2.emit_ready(now, 100)
        if t.num_rows == 0:
            if s2.idle():
                break
            now += 100
            continue
        got.extend(t.column("pq").to_pylist())
        s2.report(pa.table({
            "sa": t.column("sa"), "is_robots": t.column("is_robots"),
            "status": pa.array(np.full(t.num_rows, 200, np.int32)),
            "error": pa.array([None] * t.num_rows, pa.string()),
            "html": pa.array([b""] * t.num_rows, pa.binary()),
            "pq": t.column("pq"), "seq": t.column("seq"),
        }), now + 10)
        now += 100
    assert got == [f"/p/{i}" for i in range(n)]
