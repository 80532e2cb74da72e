"""DNS resolution with TTL and negative caching.

The reference resolves hosts on dedicated DNS threads through a caching
resolver (``frontier/dns/DnsJavaResolver.java:1``,
``frontier/DNSThread.java:62-126``): successful lookups are cached with
a positive TTL, failures with a shorter negative TTL (so a flapping or
dead zone does not hammer the resolver), and unknown hosts put the
VisitState on the retry path (``unknown_host`` in the retry table).

Here the same contract is a pure-python cache around a pluggable
resolve function returning a uint32 IPv4 (or ``None`` for NXDOMAIN):

- :class:`CachingResolver` — TTL/negative-TTL/LRU-capped cache, virtual
  -clock friendly (pass ``now_ms``) so politeness tests stay
  deterministic;
- :func:`system_resolve` — the real resolver (``socket.gethostbyname``);
- :func:`resolve_cached` — module-level cached system resolver usable as
  ``CrawlConfig.dns_module="bubing_ray.frontier.dns"`` /
  ``dns_name="resolve_cached"`` (per worker process, which matches the
  reference's per-agent resolver cache);
- :func:`fake_resolve` — re-export of the sandbox hash resolver.

A ``None`` result means the host does not resolve: the link stage drops
such URLs (they could never be fetched and have no IP to route by).
"""

from __future__ import annotations

import socket
import struct
import time


def system_resolve(host: str) -> int | None:
    """Real lookup -> uint32 IPv4, None on NXDOMAIN/timeout."""
    try:
        return struct.unpack("!I", socket.inet_aton(socket.gethostbyname(host)))[0]
    except (socket.gaierror, OSError):
        return None


def fake_resolve(host: str) -> int:
    from ..pages import resolve_ip

    return resolve_ip(host)


class CachingResolver:
    """TTL + negative-TTL + LRU cap around a resolve function."""

    def __init__(self, resolve_fn=system_resolve, *, ttl_ms: int = 3_600_000,
                 neg_ttl_ms: int = 60_000, max_entries: int = 1 << 20):
        self.fn = resolve_fn
        self.ttl = ttl_ms
        self.neg_ttl = neg_ttl_ms
        self.max_entries = max_entries
        # host -> (ip | None, expires_at_ms); dict order doubles as LRU
        self._cache: dict[str, tuple[int | None, int]] = {}
        self.hits = 0
        self.misses = 0

    def resolve(self, host: str, now_ms: int | None = None) -> int | None:
        now = int(time.time() * 1000) if now_ms is None else now_ms
        hit = self._cache.get(host)
        if hit is not None and hit[1] > now:
            self.hits += 1
            self._cache[host] = self._cache.pop(host)  # LRU touch
            return hit[0]
        self.misses += 1
        ip = self.fn(host)
        self._cache.pop(host, None)
        self._cache[host] = (ip, now + (self.ttl if ip is not None else self.neg_ttl))
        while len(self._cache) > self.max_entries:
            self._cache.pop(next(iter(self._cache)))
        return ip

    def resolve_batch(self, hosts, now_ms: int | None = None) -> dict:
        return {h: self.resolve(h, now_ms) for h in hosts}

    def stats(self) -> dict:
        return {"entries": len(self._cache), "hits": self.hits,
                "misses": self.misses}


def fake_resolve_nodns(host: str) -> int | None:
    """Sandbox resolver with an NXDOMAIN zone: hosts prefixed ``nodns``
    fail to resolve (exercises the negative-DNS drop path end-to-end)."""
    if host.startswith("nodns"):
        return None
    return fake_resolve(host)


_GLOBAL = CachingResolver()


def resolve_cached(host: str) -> int | None:
    """Process-global cached system resolver (the DNSThread shared-cache
    shape: one cache per worker process)."""
    return _GLOBAL.resolve(host)
