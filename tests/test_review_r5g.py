"""Regression tests for the round-5 seventh review pass (sources /
parser / filters / multimodal): media-type casing, wide Arrow offsets,
empty payload buffers, path-only filter semantics, escaped parens,
naive-UTC WARC dates."""

import os
import sys
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bubing_ray.html_parser import ParseHTMLBatch, parse_html
from bubing_ray.ops import filters
from bubing_ray.ops.filter_lang import parse_filter


def test_uppercase_content_type_routes_to_html_parser():
    body = b"<html><body>hello world</body></html>"
    t = pa.table({
        "url": pa.array(["http://h.example/a", "http://h.example/b"]),
        "html": pa.array([body, body], pa.binary()),
        "status": pa.array([200, 200], pa.int32()),
        "content_type": pa.array(["Text/HTML; charset=utf-8",
                                  "text/html; charset=utf-8"]),
    })
    out = ParseHTMLBatch()(t)
    texts = out.column("text").to_pylist()
    assert texts[0] == texts[1]
    assert "hello world" in texts[0]


def test_parse_html_str_body_charset_is_label_not_media_type():
    r = parse_html("http://h/x", "<html><body>x</body></html>",
                   content_type="text/html; charset=utf-8")
    assert r.charset == "utf-8"
    r2 = parse_html("http://h/x", "<html></html>", content_type=None)
    assert r2.charset == "ISO-8859-1"


def test_is_probably_binary_large_binary_offsets():
    """large_binary columns use int64 offsets; reading them as int32
    inverted the mask."""
    t_small = pa.table({"html": pa.array(
        [b"\x00\x00\x00abc", b"no nulls here"], pa.binary())})
    t_large = pa.table({"html": pa.array(
        [b"\x00\x00\x00abc", b"no nulls here"], pa.large_binary())})
    f = filters.IsProbablyBinary()
    assert f(t_small).tolist() == [True, False]
    assert f(t_large).tolist() == [True, False]


def test_decode_image_meta_all_empty_payload_batch():
    from bubing_ray.ops.multimodal import DecodeImageMeta

    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([b"", b""], pa.binary()),
    })
    out = DecodeImageMeta()(t)
    assert out.column("valid").to_pylist() == [False, False]
    assert out.column("n_bytes").to_pylist() == [0, 0]


def test_decode_image_meta_large_binary_payload():
    import struct

    from bubing_ray.ops.multimodal import MAGIC, DecodeImageMeta

    payload = MAGIC + struct.pack("<HH", 3, 2) + b"abcdef"
    t = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "payload": pa.array([payload], pa.large_binary()),
    })
    out = DecodeImageMeta()(t)
    assert out.column("valid").to_pylist() == [True]
    assert out.column("width").to_pylist() == [3]
    assert out.column("height").to_pylist() == [2]


def test_path_ends_with_matches_path_not_host():
    t = pa.table({"url": pa.array([
        "http://files.jpg",            # host ends in .jpg, NO path
        "http://h.example/pic.jpg",    # path ends in .jpg
        "http://h.example/pic.jpg?x=1",
        "http://h.example/page.html",
    ])})
    got = filters.PathEndsWithOneOf([".jpg"])(t).tolist()
    assert got == [False, True, True, False]


def test_duplicate_segments_ignores_query_and_fragment():
    t = pa.table({"url": pa.array([
        "http://h?x=/a/a/a/a",      # repeats only in the query
        "http://h#/a/a/a/a",        # repeats only in the fragment
        "http://h/a/a/a/a",         # real crawler trap
        "http://h/a/b?y=/c/c/c/c",  # clean path, repeating query
    ])})
    got = filters.DuplicateSegmentsLessThan(3)(t).tolist()
    assert got == [True, True, False, True]


def test_filter_lang_escaped_paren_in_regex():
    f = parse_filter(r"URLMatchesRegex(.*login\).*)")
    t = pa.table({"url": pa.array(["http://h/login)x", "http://h/other"])})
    assert f(t).tolist() == [True, False]


def test_write_warc_naive_ts_is_utc(tmp_path):
    from bubing_ray.sources.warc import write_warc

    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    import time as _time

    _time.tzset()
    try:
        from bubing_ray.sources import warc as W

        path = str(tmp_path / "out.warc.gz")
        naive = datetime(2026, 1, 1, 0, 0, 0)  # naive == UTC by contract
        write_warc([{
            "url": "http://h.example/a",
            "status": 200,
            "content_type": "text/html",
            "html": b"<html></html>",
            "warc_ts": naive,
        }], path)
        with open(path, "rb") as f:
            recs = list(W.iter_warc_records(W._maybe_gzip(f)))
        dates = [r["headers"]["warc-date"] for r in recs
                 if "warc-date" in r["headers"]]
        assert dates, "no dated records read back"
        assert all(d == "2026-01-01T00:00:00Z" for d in dates), dates
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        _time.tzset()
