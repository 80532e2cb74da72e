"""Regression tests for the round-5 fourth review pass (crawl-adjacent
I/O): robots.txt RFC 9309 group handling, hostile-href port parsing,
resume marker validation."""

import os
import sys

import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bubing_ray import burl
from bubing_ray.robots import allowed, parse_robots


def test_robots_ua_line_after_rules_starts_new_group():
    """RFC 9309 groups need no blank-line separator: a later agent's
    rules must not merge into ours."""
    f = parse_robots(
        "User-agent: BUbiNG\nDisallow: /private\n"
        "User-agent: Googlebot\nDisallow: /\n"
    )
    assert f == ("/private",)
    assert allowed(f, "/anything")
    assert not allowed(f, "/private/x")


def test_robots_no_space_after_colon():
    """'Disallow:/secret' (no space) is valid per RFC 9309 and common
    in the wild — ignoring it fetches explicitly disallowed URLs."""
    f = parse_robots("User-agent: *\nDisallow:/secret\n")
    assert f == ("/secret",)
    assert not allowed(f, "/secret")


def test_robots_sibling_ua_lines_accumulate():
    """A non-matching User-agent line inside the same group must not
    clear a match made by a sibling line."""
    assert parse_robots(
        "User-agent: *\nUser-agent: Googlebot\nDisallow: /x\n"
    ) == ("/x",)
    assert parse_robots(
        "User-agent: Googlebot\nUser-agent: BUbiNG\nDisallow: /y\n"
    ) == ("/y",)


def test_robots_sitemap_does_not_split_group():
    f = parse_robots(
        "User-agent: *\nSitemap: http://x/s.xml\nDisallow: /a\n"
    )
    assert f == ("/a",)


def test_burl_hostile_ports_null_not_crash():
    """Non-ASCII digits pass str.isdigit() but break int(): one hostile
    href must null one URL, never raise out of the batch."""
    assert burl.parse("http://a:\u00b2/x") is None
    assert burl.parse("http://a:\u0662\u0662/x") is None  # Arabic-Indic '22'
    arr = pa.array(["http://ok.example/a", "http://a:\u00b2/x", None])
    out = burl.canonicalize_batch(arr).to_pylist()
    assert out == ["http://ok.example/a", None, None]


def test_burl_ipv6_literals_rejected_by_spec():
    """Brackets are percent-substituted before parsing (the reference's
    BURL.java:77-85 bad-char table), so IPv6 literal hosts are rejected
    — explicitly, not via a dead branch."""
    assert burl.parse("http://[2001:db8::1]/x") is None
    assert burl.parse("http://[::1]:8080/") is None


def test_resume_reruns_shard_when_file_list_changes(ray_session, tmp_path):
    """A .done marker only skips the EXACT file list it recorded: new
    files sorted into a finished shard's slice must be processed."""
    import pyarrow.parquet as pq
    import ray

    from bubing_ray.pipelines.resume import resumable_write

    def mk(name, ids):
        p = str(tmp_path / name)
        pq.write_table(pa.table({"x": pa.array(ids, type=pa.int64())}), p)
        return p

    f_b = mk("b.parquet", [1, 2])
    f_c = mk("c.parquet", [3])
    out = str(tmp_path / "out")
    r1 = resumable_write([f_b, f_c], out, lambda d: d, shard_size=2)
    assert r1 == {"shards": 1, "ran": 1, "skipped": 0}
    # unchanged input: skipped
    r2 = resumable_write([f_b, f_c], out, lambda d: d, shard_size=2)
    assert r2["skipped"] == 1 and r2["ran"] == 0
    # a new file sorts FIRST into shard 0: marker must be invalidated
    f_a = mk("a.parquet", [9, 10])
    r3 = resumable_write([f_a, f_b, f_c], out, lambda d: d, shard_size=2)
    assert r3["ran"] == 2 and r3["skipped"] == 0
    got = sorted(
        v for i in range(2)
        for v in pq.read_table(os.path.join(out, f"shard-{i:05d}"))
        .column("x").to_pylist()
    )
    assert got == [1, 2, 3, 9, 10]
