"""Synthetic web generator: text oracle byte-identity + link closure."""

import numpy as np

from bubing_ray import pages
from bubing_ray.html_parser import ParseHTMLBatch, parse_html


def test_text_byte_identical_through_parser():
    H, P = 6, 8
    t = pages.generate_table(np.arange(H * P), H, P, out_degree=4, seed=0)
    out = ParseHTMLBatch()(t.select(["url", "html", "status", "content_type", "location"]))
    got = out.column("text").to_pylist()
    want = t.column("text").to_pylist()
    urls = t.column("url").to_pylist()
    for u, g, w in zip(urls, got, want):
        assert g == w, f"text mismatch for {u!r}: {g!r} != {w!r}"


def test_links_resolve_to_existing_pages():
    H, P = 6, 8
    t = pages.generate_table(np.arange(H * P + H), H, P, out_degree=4, seed=0)
    all_urls = set(t.column("url").to_pylist())
    out = ParseHTMLBatch()(t.select(["url", "html", "status", "content_type", "location"]))
    n_checked = 0
    for links, status in zip(out.column("links").to_pylist(), t.column("status").to_pylist()):
        if status != 200:
            continue
        for l in links:
            assert l in all_urls, f"dangling link {l}"
            n_checked += 1
    assert n_checked > 50


def test_redirects_and_errors_present():
    H, P = 10, 30
    t = pages.generate_table(np.arange(H * P), H, P, seed=0)
    statuses = set(t.column("status").to_pylist())
    assert 301 in statuses and 404 in statuses and 0 in statuses
    # redirect location resolves to a real page url
    import pyarrow.compute as pc

    red = t.filter(pc.equal(t["status"], 301))
    urls = set(t.column("url").to_pylist())
    for loc in red.column("location").to_pylist():
        assert loc in urls


def test_determinism_and_ip_groups():
    H, P = 4, 4
    a = pages.generate_table(np.arange(H * P), H, P, seed=0)
    b = pages.generate_table(np.arange(H * P), H, P, seed=0)
    assert a.equals(b)
    assert pages.resolve_ip("host0.example") == pages.resolve_ip("host1.example")
    assert pages.resolve_ip("host0.example") != pages.resolve_ip("host3.example")


def test_robots_pages_and_priv_paths():
    H, P = 10, 22
    ids = np.arange(H * P + H)
    t = pages.generate_table(ids, H, P, seed=0)
    urls = t.column("url").to_pylist()
    assert any(u.endswith("/robots.txt") for u in urls)
    assert any("/priv/" in u for u in urls)
    r = parse_html("http://host0.example/robots.txt", pages.ROBOTS_BODY)
    assert r  # parses without error
