"""BUbiNG-style URL canonicalization ("BURL"), reimplemented from scratch.

Semantics follow the reference's documented behavior (BUbiNG
``util/BURL.java:97-254`` and its test table ``test/.../util/BURLTest.java:43-125``)
but the implementation is new, Python/Arrow-native, and vectorized where it
matters: a single RE2 regex (via ``pyarrow.compute``) detects URLs that are
*already canonical* and passes them through zero-copy; only the (few) messy
URLs take the per-string slow path.

A canonical BUbiNG URL is a pure-ASCII string: fragment stripped, scheme and
host lowercased, trailing host dot removed, bad characters percent-escaped,
``%XX`` escapes uppercased, dot-segments removed, empty path replaced by
``/``, default ports (80/http, 443/https) dropped, non-ASCII characters
%-encoded as UTF-8.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --- character classes -------------------------------------------------------

# Characters whose presence rejects the spec outright (BURL.java:72).
_FORBIDDEN = ("\n", "\r")

# Bad characters substituted before parsing (BURL.java:77-85): backslash
# becomes a slash, the rest become their uppercase percent escape.
_BAD_CHAR_SUB = {"\\": "/"}
for _c in " \t[]\"|{}^<>`":
    _BAD_CHAR_SUB[_c] = "%%%02X" % ord(_c)

_HEX = "0123456789abcdefABCDEF"

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*):")

# RFC 3986 pchar plus "/" (path) and additionally "?" (query).  Java's URI
# accepts non-ASCII "other" characters too; those are checked separately.
_PATH_OK = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    "-._~!$&'()*+,;=:@/%"
)
_QUERY_OK = _PATH_OK | {"?"}
# no bracket alternative: IPv6 literals are rejected by the bad-char
# substitution above, as in the reference (see the port-split comment)
_HOST_RE = re.compile(r"^[A-Za-z0-9._~-]+$")
_USERINFO_OK = _PATH_OK - {"/", "@"}

# Fast path: a URL matching this is already in canonical form and is passed
# through untouched.  Deliberately conservative: plain lowercase http(s) host,
# no escapes, no dot segments, no default/explicit port, ASCII path/query from
# the unreserved+sub-delims set.
_CANONICAL_FAST_RE = (
    r"^https?://"
    r"[a-z0-9]([a-z0-9.-]*[a-z0-9])?"
    r"/(?:[A-Za-z0-9\-_~!$&'()*+,;=:@/]|\.[A-Za-z0-9\-_~!$&'()*+,;=:@/])*"
    r"(?:\?[A-Za-z0-9\-_~!$&'()*+,;=:@/?]*)?$"
)


def _java_trim(s: str) -> str:
    """Trim characters <= U+0020 from both ends (Java ``String.trim`` rule)."""
    i, j = 0, len(s)
    while i < j and s[i] <= " ":
        i += 1
    while j > i and s[j - 1] <= " ":
        j -= 1
    return s[i:j]


def _fix_percents(s: str) -> str:
    """Turn stray ``%`` into ``%25``; uppercase valid ``%XX`` escapes."""
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%":
            if i + 2 < n and s[i + 1] in _HEX and s[i + 2] in _HEX:
                out.append("%" + s[i + 1].upper() + s[i + 2].upper())
                i += 3
            else:
                out.append("%25")
                i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _char_ok(c: str, allowed: set) -> bool:
    if c in allowed:
        return True
    o = ord(c)
    if o < 0x80:
        return False
    # Java URI's "other" category: non-ASCII characters that are neither
    # ISO control characters nor space characters are accepted (and later
    # %-encoded as UTF-8 by sanitize).
    cat = unicodedata.category(c)
    return not (cat in ("Cc", "Cf", "Zs", "Zl", "Zp"))


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 dot-segment removal.

    For relative paths, leading ``..`` segments are preserved (Java
    ``URI.normalize`` behavior) and a lone ``./a`` becomes ``a``.
    """
    if not path or ("." not in path):
        return path
    absolute = path.startswith("/")
    segs = path.split("/")
    if absolute:
        segs = segs[1:]  # drop the empty segment before the leading '/'
    out: list[str] = []
    lead: list[str] = []  # preserved leading '..' of relative paths
    last = len(segs) - 1
    for i, seg in enumerate(segs):
        if seg == ".":
            if i == last:
                out.append("")  # trailing '/.' keeps the trailing slash
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if i == last:
                    out.append("")
            elif out and out[-1] == "":
                # e.g. 'a//..' — pop the empty segment too
                out.pop()
                if i == last:
                    out.append("")
            elif not absolute:
                lead.append("..")
            elif i == last:
                out.append("")
            continue
        out.append(seg)
    if absolute:
        return "/" + "/".join(out)
    return "/".join(lead + out)


def _pct_decode_has_nul(s: str) -> bool:
    return "%00" in s.upper()


def _sanitize(s: str) -> str:
    """%-encode non-ASCII characters as UTF-8 byte escapes (BURL.java:209-229)."""
    if s.isascii():
        return s
    out = []
    for c in s:
        if ord(c) < 0x80:
            out.append(c)
        else:
            out.extend("%%%02X" % b for b in c.encode("utf-8"))
    return "".join(out)


# scalar fast paths: already-canonical absolute URLs / plain relative paths
_FAST_ABS_SCALAR_RE = re.compile(_CANONICAL_FAST_RE)
_FAST_REL_SCALAR_RE = re.compile(
    r"^/?[A-Za-z0-9\-_~!$&'()*+,;=:@](?:[A-Za-z0-9\-_~!$&'()*+,;=:@/]|\.[A-Za-z0-9\-_~!$&'()*+,;=:@/])*"
    r"(?:\?[A-Za-z0-9\-_~!$&'()*+,;=:@/?]*)?$"
)
_DOTSEG_RE = re.compile(r"(^|/)\.{1,2}(/|$)|//")


def parse(spec: str) -> str | None:
    """Canonicalize one URL spec; return None if malformed (BURL.parse).

    Returns the canonical ASCII string form.  Relative references are
    allowed and canonicalized as relative (used during link resolution).
    """
    if spec is None:
        return None
    # fast path: already canonical (link extraction calls this per href)
    if _FAST_ABS_SCALAR_RE.match(spec):
        if not _DOTSEG_RE.search(spec, spec.find("/", 8)):
            return spec
    elif _FAST_REL_SCALAR_RE.match(spec) and ":" not in spec.split("?", 1)[0]:
        if not _DOTSEG_RE.search(spec):
            return spec
    s = _java_trim(spec)
    for c in _FORBIDDEN:
        if c in s:
            return None
    # bad-char substitution
    if any(c in s for c in _BAD_CHAR_SUB):
        s = "".join(_BAD_CHAR_SUB.get(c, c) for c in s)
    s = _fix_percents(s)

    # strip fragment
    h = s.find("#")
    if h >= 0:
        s = s[:h]

    m = _SCHEME_RE.match(s)
    scheme = None
    rest = s
    if m:
        scheme = m.group(1).lower()
        rest = s[m.end():]
        if not rest.startswith("/"):
            # opaque URI (mailto:..., etc.) — not a crawlable URL
            return None
    elif s.startswith(":"):
        return None

    userinfo = host = None
    port = -1
    if rest.startswith("//"):
        rest2 = rest[2:]
        end = len(rest2)
        for i, c in enumerate(rest2):
            if c in "/?":
                end = i
                break
        authority = rest2[:end]
        rest = rest2[end:]
        if not authority:
            return None
        if "@" in authority:
            userinfo, hostport = authority.rsplit("@", 1)
            for c in userinfo:
                if not _char_ok(c, _USERINFO_OK):
                    return None
            if _pct_decode_has_nul(userinfo):
                return None
        else:
            hostport = authority
        # port split.  No bracket (IPv6-literal) branch on purpose: the
        # bad-char substitution above escapes '[' and ']' exactly like
        # the reference (BURL.java:77-85), so a bracketed host reaches
        # this point as %5B...%5D and is rejected below ('%' in host) —
        # IPv6 literal hosts are rejected BY SPEC, in the reference and
        # here.
        if ":" in hostport:
            host, pstr = hostport.rsplit(":", 1)
            # isascii() guard: str.isdigit() accepts non-ASCII digit
            # characters that int() rejects (e.g. '²' raises) or
            # silently misparses (Arabic-Indic digits) — one hostile
            # href must null ONE url, never crash the batch task
            if pstr and not (pstr.isascii() and pstr.isdigit()):
                return None
            port = int(pstr) if pstr else -1
        else:
            host = hostport
        if not host or not _HOST_RE.match(host):
            return None
        host = host.lower()
        if host.endswith(".") and len(host) > 1:
            host = host[:-1]
    elif scheme is not None:
        # absolute URL without authority (file:///... has empty authority)
        return None

    # split path / query
    q = rest.find("?")
    if q >= 0:
        path, query = rest[:q], rest[q + 1:]
    else:
        path, query = rest, None

    for c in path:
        if not _char_ok(c, _PATH_OK):
            return None
    if query is not None:
        for c in query:
            if not _char_ok(c, _QUERY_OK):
                return None
    if _pct_decode_has_nul(path) or (query is not None and _pct_decode_has_nul(query)):
        return None
    if host is not None and "%" in host:
        return None

    path = _remove_dot_segments(path)
    if host is not None and path == "":
        path = "/"

    # drop default ports
    if scheme == "http" and port == 80:
        port = -1
    if scheme == "https" and port == 443:
        port = -1

    out = []
    if scheme is not None:
        out.append(scheme + ":")
    if host is not None:
        out.append("//")
        if userinfo is not None:
            out.append(_sanitize(userinfo) + "@")
        out.append(_sanitize(host))
        if port != -1:
            out.append(":%d" % port)
    out.append(_sanitize(path))
    if query is not None:
        out.append("?" + _sanitize(query))
    return "".join(out)


# --- RFC 3986 reference resolution (for link extraction) ---------------------

def _split(url: str):
    """Split a *canonical* URL into (scheme, authority, path, query)."""
    m = _SCHEME_RE.match(url)
    scheme = authority = query = None
    rest = url
    if m and (url[m.end():].startswith("/") or ":" not in url[: m.end()]):
        scheme = m.group(1)
        rest = url[m.end():]
    if rest.startswith("//"):
        r = rest[2:]
        end = len(r)
        for i, c in enumerate(r):
            if c in "/?":
                end = i
                break
        authority, rest = r[:end], r[end:]
    qi = rest.find("?")
    if qi >= 0:
        rest, query = rest[:qi], rest[qi + 1:]
    return scheme, authority, rest, query


import functools


@functools.lru_cache(maxsize=1 << 16)
def resolve(base: str, ref: str) -> str | None:
    """Resolve ``ref`` against canonical ``base`` (RFC 3986 §5.3) and
    canonicalize the result.  Returns None for malformed refs.

    Mirrors the reference's link resolution (``HTMLParser.java:538-602``
    resolves extracted hrefs against the page/base URL via ``URI.resolve``).
    Memoized: nav links repeat heavily across a host's pages.
    """
    r = parse(ref)
    if r is None:
        return None
    rs, ra, rp, rq = _split(r)
    if rs is not None:
        return r
    bs, ba, bp, bq = _split(base)
    if ra is not None:
        out_a, out_p, out_q = ra, rp or "/", rq
    elif rp == "":
        out_a, out_p = ba, bp
        out_q = rq if rq is not None else bq
    else:
        out_a = ba
        if rp.startswith("/"):
            out_p = rp
        else:
            # merge (RFC 3986 §5.3): base path up to last '/'
            merged = bp[: bp.rfind("/") + 1] + rp if "/" in bp else "/" + rp
            out_p = _remove_dot_segments(merged)
        out_q = rq
    out = (bs + ":" if bs else "") + ("//" + out_a if out_a is not None else "")
    out = out + out_p + ("?" + out_q if out_q is not None else "")
    return parse(out)


# --- host / path-query split (BURL.java:382-464) -----------------------------

def scheme_authority(url: str) -> str:
    """Prefix of a canonical URL up to (not incl.) the 3rd slash."""
    i = url.find("/", url.find("//") + 2)
    return url if i < 0 else url[:i]


def path_query(url: str) -> str:
    i = url.find("/", url.find("//") + 2)
    return "/" if i < 0 else url[i:]


def host_of(scheme_auth: str) -> str:
    """Host part of a scheme+authority (drop scheme://, userinfo@, :port)."""
    h = scheme_auth[scheme_auth.find("//") + 2:]
    at = h.rfind("@")
    if at >= 0:
        h = h[at + 1:]
    # no bracket branch: canonical URLs never carry an IPv6 literal
    # (parse() rejects them, matching BURL.java's bad-char substitution)
    c = h.rfind(":")
    if c >= 0 and h[c + 1:].isascii() and h[c + 1:].isdigit():
        h = h[:c]
    return h


# --- vectorized batch canonicalization ---------------------------------------

def canonicalize_batch(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Canonicalize a string column; malformed entries become null.

    Fast path: URLs already canonical (matched by one RE2 regex) are kept
    as-is; only the rest go through the per-string parser.  On synthetic
    and real web data the fast path covers the overwhelming majority of
    extracted links, so the per-batch cost is one vectorized regex match.
    """
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    ok = pc.match_substring_regex(urls, _CANONICAL_FAST_RE)
    # fast path excludes any '//' inside the path and any dot segments —
    # including one IMMEDIATELY after the authority (the alternation must
    # see the first path slash, so nothing between authority and tail)
    tail = pc.match_substring_regex(urls, r"//[^/]*.*(//|/\./|/\.\./|/\.$|/\.\.$)")
    fast = pc.fill_null(pc.and_kleene(ok, pc.invert(tail)), False)
    fast_np = fast.to_numpy(zero_copy_only=False).astype(bool)
    if fast_np.all() and urls.null_count == 0:
        return urls
    # patch ONLY the slow rows: one messy href must not force a Python
    # materialization of the whole batch.  The fast rows stay in the
    # original Arrow buffer; replace_with_mask splices the few parsed
    # replacements (and nulls) in native code.
    slow_idx = np.flatnonzero(~fast_np)
    slow_vals = urls.take(pa.array(slow_idx)).to_pylist()
    repl = [parse(u) if u is not None else None for u in slow_vals]
    mask = pa.array(~fast_np)
    return pc.replace_with_mask(
        urls.cast(pa.string()), mask, pa.array(repl, type=pa.string())
    )


_SA_PREFIX_RE = r"^[a-z][a-z0-9+.\-]*://[^/?]*"


def split_batch(urls: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, pa.Array]:
    """Vectorized (scheme_authority, path_query) split of canonical URLs.

    One RE2 extract + one RE2 strip over the batch, both in native code
    (BURL stores frontier entries as this pair — "compression by prefix
    omission", Frontier.java:118-124).
    """
    import polars as pl

    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    df = (
        pl.from_arrow(pa.table({"u": urls}))
        .select(
            sa=pl.col("u").str.extract(f"({_SA_PREFIX_RE})", 1),
            pq=pl.col("u").str.replace(_SA_PREFIX_RE, "").replace("", "/"),
        )
        .to_arrow()
    )
    return (
        df.column("sa").combine_chunks().cast(pa.string()),
        df.column("pq").combine_chunks().cast(pa.string()),
    )
