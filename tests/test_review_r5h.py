"""Round-5 review fixes, batch h: deferred-sink error paths.

Covers the post-deferred-sink findings: shutdown() must not leak actors
when draining a failed write raises; a poisoned pending-sink ref must
surface exactly once (the backpressure/drain trims the list before
ray.get); the robots side-store extract must pin only robots rows."""

import pytest
import ray

from bubing_ray import pages
from bubing_ray.frontier.crawl import CrawlConfig, Crawler


@ray.remote
def _failing_sink() -> int:
    raise OSError("disk full (injected)")


@pytest.fixture()
def small_crawler(tmp_path, ray_session):
    web = tmp_path / "web"
    pages.write_pages(str(web), n_hosts=2, pages_per_host=3, out_degree=2, seed=0)
    cfg = CrawlConfig(
        pages_dir=str(web),
        store_dir=str(tmp_path / "store"),
        seeds=pages.seeds_for(2),
        n_host_shards=1,
        n_sieve_shards=1,
        n_digest_shards=1,
        max_rounds=50,
    )
    c = Crawler(cfg)
    yield c
    # idempotent: the tests themselves call shutdown()
    try:
        c.shutdown()
    except Exception:
        pass


def test_shutdown_kills_actors_even_when_drain_raises(small_crawler):
    c = small_crawler
    hosts = list(c.hosts)
    c._pending_sinks.append(_failing_sink.remote())
    with pytest.raises(Exception, match="disk full"):
        c.shutdown()
    # the failed drain surfaced, but the actors were still killed and
    # the handle lists cleared (no leak for the rest of the session)
    assert c.hosts == [] and c.servers == []
    for h in hosts:
        with pytest.raises(Exception):
            ray.get(h.idle.remote())


def test_poisoned_sink_ref_surfaces_once(small_crawler):
    c = small_crawler
    c._pending_sinks.append(_failing_sink.remote())
    with pytest.raises(Exception, match="disk full"):
        c._drain_sinks()
    # the poisoned ref was trimmed with the drain: a second drain is
    # clean, it must not re-raise the same stale error forever
    c._drain_sinks()
    assert c._pending_sinks == []


def test_robots_extract_projects_only_robots_rows(ray_session):
    import numpy as np
    import pyarrow as pa

    from bubing_ray.frontier.crawl import _robots_extract_task

    fetched = pa.table(
        {
            "url": ["http://h/robots.txt", "http://h/a", "http://h/b"],
            "sa": ["http://h"] * 3,
            "warc_ts": pa.array([1, 2, 3], pa.int64()),
            "status": pa.array([200, 200, 200], pa.int32()),
            "html": pa.array([b"User-agent: *", b"<html>a", b"<html>b"], pa.binary()),
            "is_robots": pa.array([True, False, False]),
        }
    )
    out = ray.get(_robots_extract_task.remote(fetched))
    assert out.num_rows == 1
    assert out.column_names == ["url", "sa", "warc_ts", "status", "body"]
    assert out.column("body").to_pylist() == [b"User-agent: *"]
    # all-page chunk -> None (the deferred write is a no-op)
    no_robots = fetched.filter(pa.array([False, True, True]))
    assert ray.get(_robots_extract_task.remote(no_robots)) is None
