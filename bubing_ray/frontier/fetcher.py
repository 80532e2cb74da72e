"""Real HTTP fetch stage — the FetchingThread analogue, behind a flag.

Implements the PageServer ``fetch`` output contract (url, sa, pq,
is_robots, ip, seq -> + html, status, content_type, location,
warc_ts:int64 ms, lang, error) over live HTTP, so the crawler swaps
transports without touching the round pipeline
(``CrawlConfig.fetch_mode="http"``).

Semantics ported from the reference (as behavior, not code):

- one connection per host, kept alive across the keep-alive batch and
  across rounds (``FetchingThread.java:296-298`` — a VisitState's URLs
  reuse the connection; we cache it per scheme+authority with an LRU
  cap);
- per-host cookie jar: ``Set-Cookie`` responses are captured and
  replayed on later requests to the same host, bounded by count and
  total length (``VisitState.java:105-106``, ``FetchingThread.java:
  157-184`` limits + overflow drop);
- pinned-IP connect: the socket dials the frontier's resolved IP while
  the Host header (and TLS SNI) carries the hostname
  (``FetchData.java:280-346`` binds the request to the VisitState's
  WorkbenchEntry IP) — optional, off when the sandbox DNS is fake;
- cookie jars checkpoint with the crawl: ``FetchPool.snapshot`` writes
  (sa, cookie name/value pairs) to Parquet and ``restore`` rebuilds the
  per-host jars (the VisitState cookie persistence of the reference);
  connections themselves are never checkpointed — they re-dial lazily;
- errors map to the retry-table classes of ``hosts.RETRY_TABLE``
  (connect_timeout / socket_timeout / unknown_host /
  connection_closed / ssl / generic), driving the same backoff and
  host-purge behavior as the sandbox transport;
- response bodies are truncated at ``max_body`` bytes (the reference's
  response body limit, ``RuntimeConfiguration.responseBodyMaxByteSize``).

Within one actor, distinct hosts fetch in parallel on a small thread
pool while each host's rows stay sequential in emission order (the
per-host politeness contract); across the cluster, parallelism is the
actor pool, one per host shard (co-partitioned, so no shuffle).

Stdlib-only (this container has no aiohttp); https is supported via
``ssl`` when a test or deployment provides it.
"""

from __future__ import annotations

import http.client
import socket
import ssl as ssl_mod
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pyarrow as pa
import ray

MAX_COOKIES_PER_HOST = 16
MAX_COOKIE_BYTES = 4096


def classify_error(exc: Exception) -> str:
    """Exception -> retry-table class (hosts.RETRY_TABLE keys)."""
    if isinstance(exc, socket.gaierror):
        return "unknown_host"
    if isinstance(exc, socket.timeout) or isinstance(exc, TimeoutError):
        return "socket_timeout"
    if isinstance(exc, ConnectionRefusedError):
        return "connect_timeout"
    if isinstance(exc, (http.client.RemoteDisconnected, ConnectionResetError,
                        BrokenPipeError, http.client.BadStatusLine)):
        return "connection_closed"
    if isinstance(exc, ssl_mod.SSLError):
        return "ssl"
    if isinstance(exc, OSError):
        return "connect_timeout"
    return "generic"


class _PinnedHTTPSConnection(http.client.HTTPSConnection):
    """HTTPS over a pinned-IP dial with TLS SNI + hostname verification
    against the REAL hostname (FetchData.java:280-346 semantics: the
    socket goes to the WorkbenchEntry IP, the TLS layer sees the name).
    """

    def __init__(self, ip: str, port: int, sni_host: str, *, timeout, context):
        super().__init__(ip, port, timeout=timeout, context=context)
        self._sni_host = sni_host

    def connect(self):
        sock = socket.create_connection(
            (self.host, self.port), self.timeout
        )
        if self._tunnel_host:
            self.sock = sock
            self._tunnel()
        self.sock = self._context.wrap_socket(
            sock, server_hostname=self._sni_host
        )


def _split_sa(sa: str) -> tuple[str, str, int]:
    """scheme+authority -> (scheme, host, port)."""
    scheme, _, rest = sa.partition("://")
    host, _, port = rest.partition(":")
    if port:
        return scheme, host, int(port)
    return scheme, host, 443 if scheme == "https" else 80


class HostFetcher:
    """Pure-python per-host HTTP state: one kept-alive connection plus
    the cookie jar (actor-free for unit tests)."""

    def __init__(self, sa: str, *, timeout: float = 10.0, user_agent: str = "BUbiNG",
                 pin_ip: int | None = None, max_body: int = 1 << 22,
                 ssl_context: "ssl_mod.SSLContext | None" = None):
        self.sa = sa
        self.scheme, self.host, self.port = _split_sa(sa)
        self.timeout = timeout
        self.user_agent = user_agent
        self.pin_ip = pin_ip
        self.max_body = max_body
        # custom TLS context (private CA bundles; tests inject a
        # self-signed CA here) — None = the platform default trust store
        self.ssl_context = ssl_context
        self.cookies: dict[str, str] = {}  # name -> value, insertion order
        self._conn: http.client.HTTPConnection | None = None

    # -- connection -----------------------------------------------------------
    def _connect(self) -> http.client.HTTPConnection:
        if self._conn is not None:
            return self._conn
        dial = self.host
        if self.pin_ip is not None:
            dial = socket.inet_ntoa(int(self.pin_ip).to_bytes(4, "big"))
        if self.scheme == "https":
            ctx = self.ssl_context or ssl_mod.create_default_context()
            if dial != self.host:
                # pinned-IP dial: SNI and certificate verification must
                # still see the hostname
                conn = _PinnedHTTPSConnection(
                    dial, self.port, self.host, timeout=self.timeout, context=ctx
                )
            else:
                conn = http.client.HTTPSConnection(
                    dial, self.port, timeout=self.timeout, context=ctx
                )
        else:
            conn = http.client.HTTPConnection(dial, self.port, timeout=self.timeout)
        self._conn = conn
        return conn

    def close(self):
        if self._conn is not None:
            try:
                self._conn.close()
            except Exception:
                pass
            self._conn = None

    # -- cookies --------------------------------------------------------------
    def _capture_cookies(self, resp):
        for sc in resp.headers.get_all("Set-Cookie") or []:
            first = sc.split(";", 1)[0].strip()
            if "=" not in first:
                continue
            name, value = first.split("=", 1)
            self.cookies[name.strip()] = value
        # bounded jar: drop oldest beyond the count cap, drop entirely
        # beyond the byte cap (the reference's overflow behavior)
        while len(self.cookies) > MAX_COOKIES_PER_HOST:
            self.cookies.pop(next(iter(self.cookies)))
        if sum(len(k) + len(v) + 3 for k, v in self.cookies.items()) > MAX_COOKIE_BYTES:
            self.cookies.clear()

    def _cookie_header(self) -> str | None:
        if not self.cookies:
            return None
        return "; ".join(f"{k}={v}" for k, v in self.cookies.items())

    # -- one URL --------------------------------------------------------------
    def fetch_one(self, pq: str) -> dict:
        """GET one path+query; returns the fetch-row dict (html, status,
        content_type, location, warc_ts, error). Retries once through a
        fresh connection when the kept-alive socket died (stale
        keep-alive is not a crawl error)."""
        for attempt in (0, 1):
            conn = self._connect()
            try:
                headers = {
                    # RFC 9110 §7.2: omit the port only when it is the
                    # SCHEME's default — http://host:443 must still send
                    # "Host: host:443"
                    "Host": self.host
                    if self.port == (443 if self.scheme == "https" else 80)
                    else f"{self.host}:{self.port}",
                    "User-Agent": self.user_agent,
                    "Accept": "*/*",
                }
                ck = self._cookie_header()
                if ck:
                    headers["Cookie"] = ck
                conn.request("GET", pq or "/", headers=headers)
                resp = conn.getresponse()
                body = resp.read(self.max_body)
                # drain a bounded remainder so the connection stays
                # reusable; past the cap (crawler trap / huge file) it is
                # cheaper to drop the connection than keep downloading
                drained = 0
                while drained <= (1 << 20):
                    chunk = resp.read(1 << 16)
                    if not chunk:
                        break
                    drained += len(chunk)
                else:
                    self.close()
                self._capture_cookies(resp)
                return {
                    "html": body,
                    "status": int(resp.status),
                    "content_type": resp.headers.get("Content-Type"),
                    "location": resp.headers.get("Location"),
                    "warc_ts": int(time.time() * 1000),
                    "error": None,
                }
            except Exception as e:
                self.close()
                kind = classify_error(e)
                if attempt == 0 and kind == "connection_closed":
                    continue  # stale keep-alive: one silent reconnect
                return {
                    "html": b"",
                    "status": 0,
                    "content_type": None,
                    "location": None,
                    "warc_ts": int(time.time() * 1000),
                    "error": kind,
                }
        raise AssertionError("unreachable")


class FetchPool:
    """Per-shard fetch state: HostFetcher cache (LRU-capped) + a thread
    pool running distinct hosts of a ready batch concurrently."""

    def __init__(self, *, timeout: float = 10.0, user_agent: str = "BUbiNG",
                 pin_ip: bool = False, max_body: int = 1 << 22,
                 max_hosts: int = 8192, threads: int = 256):
        # threads default O(hundreds): real-web fetches block ~1 s each,
        # so concurrency, not CPU, sets throughput (the reference sizes
        # fetching threads in the hundreds/thousands,
        # StartupConfiguration.java:169-176).  ThreadPoolExecutor spawns
        # workers lazily, so idle width costs nothing.
        self.timeout = timeout
        self.user_agent = user_agent
        self.pin_ip = pin_ip
        self.max_body = max_body
        self.max_hosts = max_hosts
        self.hosts: dict[str, HostFetcher] = {}
        self.pool = ThreadPoolExecutor(max_workers=threads)

    def _host(self, sa: str, ip: int | None) -> HostFetcher:
        """Resolve (or create) the per-host fetcher.  ONLY called from
        the driver thread (fetch() resolves every group's fetcher before
        submitting work), so dict mutation and LRU eviction never race
        the pool threads.  ``ip=None`` creates the host unpinned even in
        a pinning pool (checkpoints taken unpinned restore unpinned)."""
        hf = self.hosts.get(sa)
        if hf is None:
            hf = HostFetcher(
                sa, timeout=self.timeout, user_agent=self.user_agent,
                pin_ip=ip if (self.pin_ip and ip is not None) else None,
                max_body=self.max_body,
            )
            self.hosts[sa] = hf
        else:
            # LRU touch
            self.hosts[sa] = self.hosts.pop(sa)
        return hf

    def _evict_lru(self, protect: set[str]):
        """Close least-recently-used fetchers beyond the cap; fetchers
        used by the current batch are protected (closing one mid-fetch
        would fail its in-flight request and open a second connection
        to the host, breaking the one-connection politeness contract)."""
        excess = len(self.hosts) - self.max_hosts
        if excess <= 0:
            return
        for sa in [s for s in self.hosts if s not in protect][:excess]:
            self.hosts.pop(sa).close()

    def fetch(self, ready: pa.Table) -> pa.Table | None:
        """PageServer.fetch contract over live HTTP: per-host rows run
        sequentially in order on one connection; hosts run in parallel."""
        if ready is None or ready.num_rows == 0:
            return None
        sas = ready.column("sa").to_pylist()
        pqs = ready.column("pq").to_pylist()
        ips = ready.column("ip").to_pylist()
        groups: dict[str, list[int]] = {}
        for i, sa in enumerate(sas):
            groups.setdefault(sa, []).append(i)

        results: list[dict | None] = [None] * len(sas)

        def run_host(hf: HostFetcher, idxs: list[int]):
            for i in idxs:
                results[i] = hf.fetch_one(pqs[i])

        # resolve every fetcher in THIS thread before any work starts
        fetchers = {sa: self._host(sa, ips[idxs[0]]) for sa, idxs in groups.items()}
        futs = [
            self.pool.submit(run_host, fetchers[sa], idxs)
            for sa, idxs in groups.items()
        ]
        for f in futs:
            f.result()
        self._evict_lru(protect=set(groups))

        n = len(sas)
        return (
            ready.append_column(
                "html", pa.array([r["html"] for r in results], pa.binary())
            )
            .append_column(
                "status",
                pa.array(np.array([r["status"] for r in results], np.int32)),
            )
            .append_column(
                "content_type",
                pa.array([r["content_type"] for r in results], pa.string()),
            )
            .append_column(
                "location", pa.array([r["location"] for r in results], pa.string())
            )
            .append_column(
                "warc_ts",
                pa.array(np.array([r["warc_ts"] for r in results], np.int64)),
            )
            .append_column("lang", pa.nulls(n, pa.string()))
            .append_column(
                "error", pa.array([r["error"] for r in results], pa.string())
            )
        )

    def close(self):
        for hf in self.hosts.values():
            hf.close()
        self.pool.shutdown(wait=False)

    # -- checkpoint (VisitState cookie persistence) ---------------------------
    def snapshot(self, path: str):
        import pyarrow.parquet as pq

        sas, names, values, ips = [], [], [], []
        for sa, hf in self.hosts.items():
            for k, v in hf.cookies.items():
                sas.append(sa)
                names.append(k)
                values.append(v)
                # -1 = unpinned sentinel (0 is a valid pinned 0.0.0.x ip;
                # `or 0` also mangled pin_ip=None into a 0.0.0.0 dial on
                # restore into a pinning pool — round-2 ADVICE)
                ips.append(-1 if hf.pin_ip is None else int(hf.pin_ip))
        pq.write_table(
            pa.table(
                {
                    "sa": pa.array(sas, pa.string()),
                    "name": pa.array(names, pa.string()),
                    "value": pa.array(values, pa.string()),
                    "ip": pa.array(np.array(ips, np.int64)),
                }
            ),
            path,
        )

    def restore(self, path: str):
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        for sa, k, v, ip in zip(
            t.column("sa").to_pylist(),
            t.column("name").to_pylist(),
            t.column("value").to_pylist(),
            t.column("ip").to_pylist(),
        ):
            self._host(sa, None if ip < 0 else ip).cookies[k] = v


@ray.remote(num_cpus=0.05)
class FetchActor:
    """Actor wrapper with the PageServer interface (drop-in for the
    crawler's ``self.servers``)."""

    def __init__(self, shard_id: int, **kw):
        self.shard_id = shard_id
        self.p = FetchPool(**kw)

    def fetch(self, ready: pa.Table) -> pa.Table | None:
        return self.p.fetch(ready)

    def snapshot(self, path: str) -> bool:
        self.p.snapshot(path)
        return True

    def restore(self, path: str) -> bool:
        self.p.restore(path)
        return True

    def cookies_of(self, sa: str) -> dict:
        hf = self.p.hosts.get(sa)
        return dict(hf.cookies) if hf else {}

    def n_pages(self) -> int:
        return len(self.p.hosts)


def load_fetch_actors(n_shards: int, actor_options: list | None = None,
                      **kw) -> list:
    """``actor_options[s]`` (e.g. a placement-group scheduling
    strategy) co-locates fetch shard s with its host shard."""
    return [
        (FetchActor.options(**actor_options[s])
         if actor_options and actor_options[s] else FetchActor).remote(s, **kw)
        for s in range(n_shards)
    ]
