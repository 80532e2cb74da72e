"""URL canonicalization tests — the table mirrors the reference's
observable behavior (test/.../util/BURLTest.java:43-125); implementation
is ours (bubing_ray/burl.py)."""

import pyarrow as pa
import pytest

from bubing_ray import burl

CASES = [
    # (input, expected-or-None)
    ("a%00", None),
    ("htt%00p://a", None),
    ("http://a%00b/", None),
    ("http://a/%00b", None),
    ("http://a/b?%00b", None),
    ("http://a b/", None),
    ("http://a/ b/", "http://a/%20b/"),
    ("http://a/b c/", "http://a/b%20c/"),
    ("http://a/b?%20c", "http://a/b?%20c"),
    ("http://a/\tb/", "http://a/%09b/"),
    ("http:\\\\a\\b\\", "http://a/b/"),
    ("http://a/\nb/", None),
    ("http://a/\rb/", None),
    ("http://a\tb/", None),
    ("http://a/b+c/", "http://a/b+c/"),
    ("http://a/b?c?d", "http://a/b?c?d"),
    ("http://a/b?c/d", "http://a/b?c/d"),
    ("http://a/b=b;b=b=b/c?c=d", "http://a/b=b;b=b=b/c?c=d"),
    ("http://a/b;c/", "http://a/b;c/"),
    ("http://a/b;c=d;d=e;=/", "http://a/b;c=d;d=e;=/"),
    (
        "http://example.com/:@-._~!$&'()*+,=;:@-._~!$&'()*+,=:@-._~!$&'()*+,==?/?:@-._~!$'()*+,;=/?:@-._~!$'()*+,;==#/?:@-._~!$&'()*+,;=",
        "http://example.com/:@-._~!$&'()*+,=;:@-._~!$&'()*+,=:@-._~!$&'()*+,==?/?:@-._~!$'()*+,;=/?:@-._~!$'()*+,;==",
    ),
    ("http://a/\u00a0b/", None),
    ("/Top/World/Espa\u00f1ol/", "/Top/World/Espa%C3%B1ol/"),
    ("http://foo/Top/World/Espa\u00f1ol/", "http://foo/Top/World/Espa%C3%B1ol/"),
    ("http://a.b", "http://a.b/"),
    ("#frag", ""),
    ("http://a.b/c/../a", "http://a.b/a"),
    ("./a", "a"),
    ("HTTP://A/", "http://a/"),
    ("HTTP://A/B", "http://a/B"),
    (":a))/", None),
    # default ports dropped; others kept (BURL.java:240)
    ("http://a:80/x", "http://a/x"),
    ("https://a:443/x", "https://a/x"),
    ("http://a:8080/x", "http://a:8080/x"),
    ("https://a:80/x", "https://a:80/x"),
    # trailing host dot removed, host lowercased
    ("http://Ab.Cd./x", "http://ab.cd/x"),
    # fragment stripped
    ("http://a/b#frag", "http://a/b"),
    # stray percent fixed, hex uppercased
    ("http://a/b%zz", "http://a/b%25zz"),
    ("http://a/b%2f", "http://a/b%2F"),
    # opaque / no-authority rejected
    ("mailto:foo@example.com", None),
    ("http:", None),
    # whitespace trim
    ("  http://a/  ", "http://a/"),
]


@pytest.mark.parametrize("spec,expected", CASES)
def test_parse(spec, expected):
    assert burl.parse(spec) == expected


def test_resolution():
    assert burl.resolve("http://a/", "/b") == "http://a/b"
    assert burl.resolve("http://example.com/a/", "../b") == "http://example.com/b"
    assert burl.resolve("http://a/", "http://b/c") == "http://b/c"
    assert burl.resolve("http://example.com/", "//foo.com") == "http://foo.com/"
    assert burl.resolve("http://a/b/c", "d") == "http://a/b/d"
    assert burl.resolve("http://a/b/c/", "d") == "http://a/b/c/d"
    assert burl.resolve("http://a/b/c", "?q=1") == "http://a/b/c?q=1"
    assert burl.resolve("http://a/b/c", "") == "http://a/b/c"
    assert burl.resolve("http://a/b", "#x") == "http://a/b"


def test_split():
    u = "http://a.b:8080/c/d?e=f"
    assert burl.scheme_authority(u) == "http://a.b:8080"
    assert burl.path_query(u) == "/c/d?e=f"
    assert burl.host_of("http://u:p@a.b:8080") == "a.b"
    assert burl.host_of("http://a.b") == "a.b"
    assert burl.scheme_authority("http://a.b") == "http://a.b"
    assert burl.path_query("http://a.b") == "/"


def test_canonicalize_batch_matches_scalar():
    specs = [c[0] for c in CASES] + [
        "http://host1.example/page/3",
        "https://x.y/path?q=1",
        None,
    ]
    out = burl.canonicalize_batch(pa.array(specs, type=pa.string())).to_pylist()
    expected = [burl.parse(s) if s is not None else None for s in specs]
    assert out == expected


def test_fast_path_is_canonical_fixpoint():
    # anything surviving the fast path must equal its own slow-path parse
    urls = [
        "http://host%d.example/p/%d" % (i, i) for i in range(50)
    ] + ["https://a.b/x/y?q=a&r=b", "http://a/b;c=d/e"]
    out = burl.canonicalize_batch(pa.array(urls)).to_pylist()
    assert out == [burl.parse(u) for u in urls]
    assert out == urls  # already canonical


def test_split_batch():
    urls = pa.array(
        ["http://a.b/c?d", "https://x.y:81/", "http://h.i", "http://q.r/s/t/u"]
    )
    sa, pq = burl.split_batch(urls)
    assert sa.to_pylist() == ["http://a.b", "https://x.y:81", "http://h.i", "http://q.r"]
    assert pq.to_pylist() == ["/c?d", "/", "/", "/s/t/u"]
