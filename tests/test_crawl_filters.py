"""Filter mini-language + pluggable crawl filters (fetch/schedule/
follow/store): parser behavior and engine-vs-model equivalence with
filters active."""

import pyarrow as pa
import pyarrow.dataset as pads
import pytest

from bubing_ray import pages
from bubing_ray.frontier.crawl import CrawlConfig, Crawler
from bubing_ray.frontier.model import SequentialCrawler
from bubing_ray.ops.filter_lang import FilterParseError, parse_filter

H, P = 6, 8


def test_parse_filter_basic():
    t = pa.table({
        "url": pa.array(["http://a.com/x.html", "https://b.org/y.jpg"]),
        "status": pa.array([200, 301], pa.int32()),
        "content_type": pa.array(["text/html", "image/jpeg"]),
    })
    assert parse_filter("StatusCategory(2)")(t).tolist() == [True, False]
    assert parse_filter("not StatusCategory(2)")(t).tolist() == [False, True]
    assert parse_filter(
        "StatusCategory(2) or PathEndsWithOneOf(.jpg)"
    )(t).tolist() == [True, True]
    assert parse_filter(
        "(SchemeEquals(https) and StatusCategory(3)) or URLEquals(http://a.com/x.html)"
    )(t).tolist() == [True, True]
    assert parse_filter("true")(t).tolist() == [True, True]
    with pytest.raises(FilterParseError):
        parse_filter("NoSuchAtom(1)")
    with pytest.raises(FilterParseError):
        parse_filter("StatusCategory(2) extra")


@pytest.fixture(scope="module")
def web(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("web_f"))
    pages.write_pages(d, n_hosts=H, pages_per_host=P, out_degree=4, seed=2)
    return d


FILTERS = dict(
    fetch_filter="not URLMatchesRegex(/p/5$)",        # never fetch page 5
    schedule_filter="not URLMatchesRegex(/p/6$)",     # never enqueue page 6
    store_filter="StatusCategory(2)",                  # store only 2xx
    follow_filter="not URLMatchesRegex(/p/1$)",       # don't follow links of page 1
)


def _run_engine(web, store):
    cfg = CrawlConfig(
        pages_dir=web, store_dir=store, seeds=pages.seeds_for(H),
        n_host_shards=2, n_sieve_shards=2, n_digest_shards=2,
        sa_delay_ms=200, ip_delay_ms=100, round_ms=200,
        retry_quantum_ms=60_000, store_html=False, **FILTERS,
    )
    c = Crawler(cfg)
    c.add_seeds(cfg.seeds)
    c.run()
    c.shutdown()
    t = pads.dataset(store, partitioning="hive").to_table()
    return t


def _run_model(web):
    cfg = CrawlConfig(
        pages_dir=web, seeds=pages.seeds_for(H),
        sa_delay_ms=200, ip_delay_ms=100, round_ms=200,
        retry_quantum_ms=60_000, **FILTERS,
    )
    tbl = pads.dataset(web).to_table()
    m = SequentialCrawler(cfg, tbl, n_shards=2)
    m.add_seeds(cfg.seeds)
    m.run()
    return m


def test_filtered_crawl_equivalence(web, ray_session, tmp_path):
    store = str(tmp_path / "store")
    t = _run_engine(web, store)
    m = _run_model(web)
    got_urls = set(t.column("url").to_pylist())
    want_urls = set(m.store.keys())
    assert got_urls == want_urls
    # filter semantics visible in the result
    assert not any(u.endswith("/p/5") for u in got_urls)   # fetch filter
    assert not any(u.endswith("/p/6") for u in got_urls)   # schedule filter
    sts = t.column("status").to_pylist()
    assert all(200 <= s < 300 for s in sts)                # store filter
    # text parity per url on the filtered store
    texts = dict(zip(t.column("url").to_pylist(), t.column("text").to_pylist()))
    for u, meta in m.store.items():
        assert texts[u] == meta["text"], u


def test_robots_side_store(web, ray_session, tmp_path):
    import pyarrow.dataset as pads2

    store = str(tmp_path / "store_r")
    robots_dir = str(tmp_path / "robots")
    cfg = CrawlConfig(
        pages_dir=web, store_dir=store, seeds=pages.seeds_for(H),
        n_host_shards=2, n_sieve_shards=2, n_digest_shards=2,
        sa_delay_ms=200, ip_delay_ms=100, round_ms=200,
        retry_quantum_ms=60_000, store_html=False,
        robots_store_dir=robots_dir,
    )
    c = Crawler(cfg)
    c.add_seeds(cfg.seeds)
    c.run()
    c.shutdown()
    t = pads2.dataset(robots_dir, partitioning="hive").to_table()
    assert t.num_rows >= H  # every crawled host fetches robots.txt once
    assert set(t.column_names) >= {"url", "sa", "status", "body"}
    assert all(u.endswith("/robots.txt") for u in t.column("url").to_pylist())
    # hosts with a real robots file stored its exact bytes
    bodies = {s: b for s, b in zip(t.column("sa").to_pylist(), t.column("body").to_pylist())}
    for h in range(H):
        sa = f"http://{pages.host_name(h)}"
        if pages.has_robots(h):
            assert bodies[sa] == pages.ROBOTS_BODY


def test_adaptive_keepalive_equivalence(web, ray_session, tmp_path):
    """keepalive=0 = adaptive pathQueryLimit (VisitState.java:396-419);
    engine and sequential model share the formula, so the URL-seen set
    and store agree."""
    store = str(tmp_path / "store_a")
    kw = dict(sa_delay_ms=200, ip_delay_ms=100, round_ms=200,
              keepalive=0, retry_quantum_ms=60_000)
    cfg = CrawlConfig(pages_dir=web, store_dir=store, seeds=pages.seeds_for(H),
                      n_host_shards=2, n_sieve_shards=2, n_digest_shards=2,
                      store_html=False, **kw)
    c = Crawler(cfg)
    c.add_seeds(cfg.seeds)
    st = c.run()
    c.shutdown()
    assert st["fetched"] > 0
    mcfg = CrawlConfig(pages_dir=web, seeds=pages.seeds_for(H), **kw)
    tbl = pads.dataset(web).to_table()
    m = SequentialCrawler(mcfg, tbl, n_shards=2)
    m.add_seeds(mcfg.seeds)
    m.run()
    t = pads.dataset(store, partitioning="hive").to_table()
    assert set(t.column("url").to_pylist()) == set(m.store.keys())


def test_minimal_input_hint_schema(ray_session, tmp_path):
    """A pages table in EXACTLY the input_hint shape (url, warc_ts,
    html, text, lang — BASELINE.json) crawls fine: optional columns
    default (status 200, text/html)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bubing_ray.pages import build_page

    rows = [build_page(h, i, 3, 4, 3, 0) for h in range(3) for i in range(4)]
    tbl = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.int64()).cast(pa.timestamp("ms")),
        "html": pa.array([r[2] for r in rows], pa.binary()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "lang": pa.array([r[4] for r in rows], pa.string()),
    })
    web = str(tmp_path / "hintweb")
    import os

    os.makedirs(web)
    pq.write_table(tbl, web + "/pages.parquet")
    store = str(tmp_path / "hintstore")
    cfg = CrawlConfig(
        pages_dir=web, store_dir=store,
        seeds=["http://host0.example/p/0", "http://host1.example/p/0"],
        n_host_shards=2, n_sieve_shards=2, n_digest_shards=2,
        sa_delay_ms=200, ip_delay_ms=100, round_ms=200,
        retry_quantum_ms=60_000, store_html=False,
    )
    c = Crawler(cfg)
    c.add_seeds(cfg.seeds)
    st = c.run()
    c.shutdown()
    assert st["fetched"] > 2
    t = pads.dataset(store, partitioning="hive").to_table()
    texts = dict(zip(t.column("url").to_pylist(), t.column("text").to_pylist()))
    expect = {r[0]: r[3] for r in rows}
    for u, txt in texts.items():
        if u in expect and expect[u]:
            assert txt == expect[u], u  # byte-identical per-url invariant


def test_round_metrics_stream(web, ray_session, tmp_path):
    import json as J

    store = str(tmp_path / "store_m")
    cfg = CrawlConfig(pages_dir=web, store_dir=store, seeds=pages.seeds_for(H),
                      n_host_shards=2, n_sieve_shards=2, n_digest_shards=2,
                      sa_delay_ms=200, ip_delay_ms=100, round_ms=200,
                      retry_quantum_ms=60_000, store_html=False)
    c = Crawler(cfg)
    c.add_seeds(cfg.seeds)
    st = c.run()
    c.shutdown()
    lines = [J.loads(l) for l in open(store + "/_metrics.jsonl")]
    assert len(lines) >= 3
    assert lines[-1]["total_fetched"] == st["fetched"]
    assert sum(l["stored"] for l in lines) == st["fetched"]
    assert all(l["wall_s"] >= 0 for l in lines)
