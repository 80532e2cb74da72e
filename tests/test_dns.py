"""DNS caching resolver (TTL / negative TTL / LRU) and the
unknown-host drop path in the link stage."""

import numpy as np
import pyarrow as pa
import ray

from bubing_ray.frontier.dns import CachingResolver


class CountingFn:
    def __init__(self, mapping):
        self.mapping = mapping
        self.calls = 0

    def __call__(self, host):
        self.calls += 1
        return self.mapping.get(host)


def test_positive_ttl():
    fn = CountingFn({"a.example": 7})
    r = CachingResolver(fn, ttl_ms=1000, neg_ttl_ms=100)
    assert r.resolve("a.example", now_ms=0) == 7
    assert r.resolve("a.example", now_ms=999) == 7
    assert fn.calls == 1  # served from cache
    assert r.resolve("a.example", now_ms=1001) == 7
    assert fn.calls == 2  # expired -> re-resolved
    assert r.stats()["hits"] == 1 and r.stats()["misses"] == 2


def test_negative_ttl_shorter():
    fn = CountingFn({})  # everything NXDOMAIN
    r = CachingResolver(fn, ttl_ms=10_000, neg_ttl_ms=100)
    assert r.resolve("gone.example", now_ms=0) is None
    assert r.resolve("gone.example", now_ms=50) is None
    assert fn.calls == 1  # negative answer cached
    assert r.resolve("gone.example", now_ms=150) is None
    assert fn.calls == 2  # negative TTL elapsed -> retried


def test_lru_cap():
    fn = CountingFn({f"h{i}": i for i in range(10)})
    r = CachingResolver(fn, ttl_ms=10_000, max_entries=3)
    for i in range(5):
        r.resolve(f"h{i}", now_ms=0)
    assert r.stats()["entries"] == 3
    r.resolve("h4", now_ms=1)  # newest still cached
    assert fn.calls == 5
    r.resolve("h0", now_ms=1)  # evicted -> re-resolved
    assert fn.calls == 6


def test_links_task_drops_unresolvable(ray_session):
    """The link stage must drop links whose host returns None from DNS
    (DNSThread's unknown-host path at discovery time)."""
    from bubing_ray.frontier.crawl import _links_explode_task, _links_route_task
    from bubing_ray.sieve import SieveShard

    parsed = pa.table(
        {
            "fetch_seq": pa.array([1], pa.int64()),
            "links": pa.array(
                [["http://nodns.example/x", "http://host1.example/y"]],
                pa.list_(pa.string()),
            ),
        }
    )
    shard = SieveShard.remote(0)
    linktbl = _links_explode_task.remote(parsed)
    n, acks = ray.get(
        _links_route_task.remote(
            linktbl, np.array([1], dtype=np.int64), [shard], 1,
            "bubing_ray.frontier.dns", "fake_resolve_nodns",
        )
    )
    ray.get(acks)
    assert n == 1  # nodns link dropped
    fresh = ray.get(shard.flush.remote())
    assert fresh.column("sa").to_pylist() == ["http://host1.example"]
    ray.kill(shard)
