"""Digest/text/link semantics — the pair table mirrors the reference's
HtmlParserTest (test/.../parser/HtmlParserTest.java:44-366); the
implementation (bubing_ray/html_parser.py) is ours."""

import pyarrow as pa
import pytest

from bubing_ray.html_parser import ParseHTMLBatch, parse_html

U = "http://example.com/"
U2 = "http://example2.com/"


def dig(doc, url=U, **kw):
    return parse_html(url, doc.encode("utf-8") if isinstance(doc, str) else doc, **kw).digest


# (doc_a, doc_b, same_digest) — same URL unless noted
PAIRS = [
    # attribute changes irrelevant
    ("<a b>x</a>", "<a c>x</a>", True),
    ("<i a=1>x</i>", "<i b=2>x</i>", True),
    # unknown tags canonical: <foo> == <bar>
    ("<foo>x</foo>", "<bar>x</bar>", True),
    # tag case irrelevant
    ("<i>x</i>", "<I>x</I>", True),
    # start != end tag
    ("<foo>", "</foo>", False),
    # known start != unknown start
    ("<i>x", "<foo>x", False),
    # whitespace runs coalesce
    ("dog cat", "dog      cat", True),
    ("dog \t\n cat", "dog cat", True),
    # digits == whitespace
    ("dog cat", "dog434123cat", True),
    ("dog cat", "dog 434 123 cat", True),
    # but existence matters
    ("dog cat", "dogcat", False),
    (" dog cat", "dog cat", False),
    # script/style content ignored
    ("<script>ma</script> jong", "<script>quit</script> jong", True),
    ("<style>a{}</style>x", "<style>b{}</style>x", True),
    # ...but presence of script element matters vs none
    ("<script>x</script>y", "y", False),
    # frame/iframe src participates
    ('<frame src="a">', '<frame src="b">', False),
    ('<iframe src="a">', '<iframe src="b">', False),
    # img src does not
    ('<img src="a">', '<img src="b">', True),
    # text changes relevant
    ("hello world", "hello there", False),
    # comments ignored
    ("a<!-- zap -->b", "a<!-- pow -->b", True),
]


@pytest.mark.parametrize("a,b,same", PAIRS)
def test_digest_pairs(a, b, same):
    assert (dig(a) == dig(b)) is same


def test_host_salt():
    assert dig("x", url=U) != dig("x", url=U2)
    assert dig("x", url=U, cross_authority_duplicates=True) == dig(
        "x", url=U2, cross_authority_duplicates=True
    )


def test_3xx_salted_by_location():
    a = parse_html(U, b"moved", status=301, location_header="http://a/1").digest
    b = parse_html(U, b"moved", status=301, location_header="http://a/2").digest
    c = parse_html(U, b"moved", status=200, location_header=None).digest
    assert a != b and a != c


def test_text_extraction():
    r = parse_html(U, b"<html><body>dog 434 cat</body></html>")
    assert r.text == "dog cat"
    r2 = parse_html(U, b"<p>a</p><script>zap()</script><p>b</p>")
    assert r2.text == "ab"
    r3 = parse_html(U, b"ent: &amp; &lt;x&gt; &#65;")
    # &#65; = 'A'
    assert r3.text == "ent: & <x> A"


def test_long_doc_digests():
    big = ("word " * 100000).encode()  # ~500KB, beyond reference's 128Ki buffer
    r = parse_html(U, big)
    assert len(r.digest) == 16
    assert r.text.startswith("word word")


def test_links_basic():
    doc = b"""
    <base href="http://b.example/dir/">
    <a href="page1">one</a>
    <a href="/abs">two</a>
    <a href="http://c.example/x">three</a>
    <a rel=nofollow href="hidden">no</a>
    <img src="img.png"><script src="s.js"></script>
    <iframe src="fr.html"></iframe>
    <link href="style.css"><area href="a.html">
    <object data="o.dat"></object>
    <meta http-equiv="refresh" content="0;URL=refresh.html">
    """
    r = parse_html("http://a.example/start", doc)
    assert "http://b.example/dir/page1" in r.links
    assert "http://b.example/abs" in r.links
    assert "http://c.example/x" in r.links
    assert not any("hidden" in l for l in r.links)
    assert "http://b.example/dir/img.png" in r.links
    assert "http://b.example/dir/s.js" in r.links
    assert "http://b.example/dir/fr.html" in r.links
    assert "http://b.example/dir/style.css" in r.links
    assert "http://b.example/dir/a.html" in r.links
    assert "http://b.example/dir/o.dat" in r.links
    assert "http://b.example/dir/refresh.html" in r.links


def test_nofollow_followed_when_configured():
    doc = b'<a rel=nofollow href="hidden">x</a>'
    r = parse_html(U, doc, follow_nofollow=True)
    assert any("hidden" in l for l in r.links)


def test_meta_location():
    doc = b'<meta http-equiv="location" content="http://z.example/tgt">'
    r = parse_html(U, doc)
    assert r.meta_location == "http://z.example/tgt"
    assert "http://z.example/tgt" in r.links


def test_charset_guess():
    assert parse_html(U, b"x", content_type="text/html; charset=utf-8").charset == "utf-8"
    r = parse_html(U, b'<meta charset="UTF-8"><p>\xc3\xa9</p>')
    assert r.charset.lower() == "utf-8"
    assert "\xe9" in r.text
    # fallback: latin-1
    r2 = parse_html(U, b"<p>\xe9</p>")
    assert r2.charset == "ISO-8859-1"
    assert "\xe9" in r2.text


def test_batch_stage():
    t = pa.table(
        {
            "url": ["http://a/1", "http://a/2"],
            "html": [b"<a href='/x'>l</a> dog 1 cat", b"same <i>text</i>"],
        }
    )
    out = ParseHTMLBatch()(t)
    assert out.column("text").to_pylist() == ["l dog cat", "same text"]
    assert out.column("n_links").to_pylist() == [1, 0]
    assert out.column("links").to_pylist()[0] == ["http://a/x"]
    assert len(out.column("digest")[0].as_py()) == 16
