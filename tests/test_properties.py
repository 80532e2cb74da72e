"""Property-based tests (hypothesis): WARC round-trip over arbitrary
records (the randomized spirit of RandomReadWritesTest.java), BURL
canonicalization idempotence, and robots prefix-filter coherence."""

import io

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from bubing_ray import burl, robots
from bubing_ray.sources import warc

# printable-host-safe URL pieces
_host = st.from_regex(r"[a-z][a-z0-9-]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._~%!$&'()*+,;=:@-]{0,12}){0,4}", fullmatch=True)
_query = st.one_of(st.none(), st.from_regex(r"[A-Za-z0-9=&_-]{0,20}", fullmatch=True))


@st.composite
def urls(draw):
    h = draw(_host)
    p = draw(_path)
    q = draw(_query)
    u = f"http://{h}{p or '/'}"
    if q:
        u += f"?{q}"
    return u


@settings(max_examples=200, deadline=None)
@given(urls())
def test_burl_canonicalize_idempotent(u):
    c1 = burl.parse(u)
    if c1 is None:
        return
    c2 = burl.parse(c1)
    assert c2 == c1, (u, c1, c2)


@settings(max_examples=200, deadline=None)
@given(urls())
def test_burl_split_rejoins(u):
    c = burl.parse(u)
    if c is None:
        return
    sa, pq = burl.split_batch(pa.array([c]))
    assert sa[0].as_py() + pq[0].as_py() == c


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            urls(),
            st.binary(max_size=2048),
            st.sampled_from([200, 301, 404, 500]),
            st.one_of(st.none(), st.sampled_from(
                ["text/html", "text/plain", "application/octet-stream"])),
            st.integers(min_value=0, max_value=(1 << 41) - 1),
        ),
        min_size=1,
        max_size=12,
    ),
    st.booleans(),
)
def test_warc_roundtrip_arbitrary_records(rows, compress):
    buf = io.BytesIO()
    recs = []
    for u, body, status, ctype, ts in rows:
        rec = warc.build_response_record(
            u, body, status=status, content_type=ctype, ts_ms=ts
        )
        if compress:
            import gzip as _gz

            b = io.BytesIO()
            with _gz.GzipFile(fileobj=b, mode="wb", mtime=0) as gz:
                gz.write(rec)
            rec = b.getvalue()
        recs.append(rec)
        buf.write(rec)
    buf.seek(0)
    out = warc.records_to_table(
        list(warc.iter_warc_records(warc._maybe_gzip(io.BufferedReader(buf))))
    )
    assert out.num_rows == len(rows)
    for i, (u, body, status, ctype, ts) in enumerate(rows):
        assert out.column("url")[i].as_py() == u
        assert out.column("html")[i].as_py() == body
        assert out.column("status")[i].as_py() == status
        assert out.column("content_type")[i].as_py() == ctype
        assert out.column("warc_ts")[i].as_py() == ts


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.from_regex(r"/[a-z0-9/]{0,10}", fullmatch=True), max_size=8),
    st.from_regex(r"/[a-z0-9/]{0,12}", fullmatch=True),
)
def test_robots_filter_coherent(disallows, probe):
    body = ("User-agent: *\n" + "".join(f"Disallow: {d}\n" for d in disallows)).encode()
    f = robots.parse_robots(body)
    allowed = robots.allowed(f, probe)
    # ground truth: allowed iff no disallow line is a prefix of the path
    expected = not any(d and probe.startswith(d) for d in disallows)
    assert allowed == expected, (disallows, probe, f)
# -- filter mini-language: random expression trees rendered to the
#    language, parsed back, and evaluated — must equal direct
#    combinator evaluation on a random pages batch

import numpy as np

from bubing_ray.ops import filters
from bubing_ray.ops.filter_lang import parse_filter

ATOMS = [
    ("StatusCategory(2)", lambda: filters.StatusCategory(2)),
    ("StatusCategory(4)", lambda: filters.StatusCategory(4)),
    ("SchemeEquals(http)", lambda: filters.SchemeEquals("http")),
    ("HostEndsWithOneOf(.com,.org)",
     lambda: filters.HostEndsWithOneOf([".com", ".org"])),
    ("PathEndsWithOneOf(.html)", lambda: filters.PathEndsWithOneOf([".html"])),
    ("URLShorterThan(40)", lambda: filters.URLShorterThan(40)),
    ("ContentTypeStartsWith(text/)",
     lambda: filters.ContentTypeStartsWith("text/")),
    ("true", lambda: filters.TRUE),
    ("false", lambda: filters.FALSE),
]


@st.composite
def expr_tree(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        s, mk = draw(st.sampled_from(ATOMS))
        return s, mk()
    kind = draw(st.sampled_from(["and", "or", "not"]))
    if kind == "not":
        s, f = draw(expr_tree(depth + 1))
        return f"not ({s})", ~f
    ls, lf = draw(expr_tree(depth + 1))
    rs, rf = draw(expr_tree(depth + 1))
    if kind == "and":
        return f"({ls}) and ({rs})", lf & rf
    return f"({ls}) or ({rs})", lf | rf


def _batch(seed):
    rng = np.random.default_rng(seed)
    n = 40
    hosts = rng.choice(["a.com", "b.org", "c.net", "d.io"], size=n)
    paths = rng.choice(["/x.html", "/y.jpg", "/idx", "/a/b/c.html"], size=n)
    schemes = rng.choice(["http", "https"], size=n)
    urls = [f"{s}://{h}{p}" for s, h, p in zip(schemes, hosts, paths)]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "status": pa.array(
                rng.choice([200, 301, 404, 500], size=n).astype(np.int32)
            ),
            "content_type": pa.array(
                rng.choice(["text/html", "image/png"], size=n)
            ),
        }
    )


@settings(max_examples=150, deadline=None)
@given(expr_tree(), st.integers(min_value=0, max_value=1000))
def test_parse_matches_direct_combinators(tree, seed):
    s, direct = tree
    parsed = parse_filter(s)
    t = _batch(seed)
    assert parsed(t).tolist() == direct(t).tolist(), s
