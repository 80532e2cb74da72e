"""robots.txt parsing and prefix-filter checks.

Reimplements the reference's observable semantics
(``util/URLRespectsRobots.java:78-227``): a tokenizer-style line scan
collecting ``Disallow:`` path prefixes for the most specific matching
section (our user agent matched by *prefix*, else the ``*`` section);
trailing ``*`` in a prefix is stripped; an empty ``Disallow:`` clears
the section's set; the result is a sorted, prefix-free list of path
prefixes.  A 4xx/5xx robots response means allow-all (empty filter);
other non-2xx/3xx statuses mean "purge the host" (None).  Checks are a
binary search of the URL's path+query against the sorted prefixes.
"""

from __future__ import annotations

import re

import numpy as np

from . import burl

EMPTY_FILTER: tuple[str, ...] = ()

# A full URL starts with a scheme (RFC 3986 3.1); a path+query never does.
# Substring heuristics (e.g. "//" in s) are wrong for paths containing
# double slashes, which are common on the real web.
_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")


def _to_path_query(url_or_pq: str) -> str:
    return burl.path_query(url_or_pq) if _SCHEME_RE.match(url_or_pq) else url_or_pq


def _prefix_free_sorted(prefixes: set[str]) -> tuple[str, ...]:
    out: list[str] = []
    for p in sorted(prefixes):
        if not out or not p.startswith(out[-1]):
            out.append(p)
    return tuple(out)


def parse_robots(body: bytes | str, user_agent: str = "BUbiNG") -> tuple[str, ...]:
    """Parse a robots.txt body into a sorted prefix-free disallow filter."""
    if isinstance(body, bytes):
        if body[:3] == b"\xef\xbb\xbf":  # UTF-8 BOM
            body = body[3:]
        elif body[:2] in (b"\xff\xfe", b"\xfe\xff"):
            body = body[2:]
        text = body.decode("utf-8", errors="replace")
    else:
        text = body
    ours: set[str] = set()
    star: set[str] = set()
    matters = False  # current group names our agent
    specific = False
    generic = False
    star_section = False  # current group names '*'
    rules_seen = False  # a rule line has occurred in the current group
    ua_lower = user_agent.lower()
    for raw in text.splitlines():
        line = raw.strip()
        if not line:
            # blank line: new group
            matters = False
            star_section = False
            rules_seen = False
            continue
        if line.startswith("#"):
            continue
        # tokenizer: field up to the FIRST colon (RFC 9309 makes the
        # space after it optional — 'Disallow:/secret' is valid and
        # common), value = first token after it, inline comments and
        # any trailing words dropped
        field, colon, rest = line.partition(":")
        if not colon:
            continue
        field = field.strip().lower()
        toks = rest.split()
        value = toks[0] if toks and not toks[0].startswith("#") else None
        if field == "user-agent":
            if rules_seen:
                # a User-agent line AFTER rules starts a NEW group
                # (RFC 9309 groups need no blank-line separator);
                # without this reset a later agent's Disallow rules
                # merge into ours
                matters = False
                star_section = False
                rules_seen = False
            # consecutive User-agent lines accumulate into one group;
            # a non-matching agent name never clears a match already
            # made by a sibling line of the same group
            if value is not None:
                if ua_lower.startswith(value.lower()):
                    matters = True
                    specific = True
                elif value == "*":
                    star_section = True
                    generic = True
        else:
            if field in ("disallow", "allow", "crawl-delay"):
                # rule lines end the group's User-agent sequence;
                # non-group lines (sitemap etc.) MUST be ignored and do
                # not split a group
                rules_seen = True
            if field == "disallow":
                if value is None:
                    if matters:
                        ours.clear()
                    elif star_section:
                        star.clear()
                else:
                    p = value[:-1] if value.endswith("*") else value
                    if matters:
                        ours.add(p)
                    elif star_section:
                        star.add(p)
    if specific:
        return _prefix_free_sorted(ours)
    if generic:
        return _prefix_free_sorted(star)
    return _prefix_free_sorted(ours)


def parse_robots_response(
    status: int, body: bytes | None, user_agent: str = "BUbiNG"
) -> tuple[str, ...] | None:
    """Status-aware robots parse: 4xx/5xx -> allow all; 2xx/3xx -> parse
    body; anything else -> None (host purge)."""
    klass = status // 100
    if klass in (4, 5):
        return EMPTY_FILTER
    if klass in (2, 3):
        return parse_robots(body or b"", user_agent)
    return None


def allowed(filter_prefixes: tuple[str, ...], url_or_pq: str) -> bool:
    """True iff the URL's path+query is not covered by a disallow prefix.

    Accepts either a full URL (detected by scheme prefix) or a bare
    path+query; shares one code path with :func:`allowed_batch`.
    """
    if not filter_prefixes:
        return True
    return bool(allowed_batch(filter_prefixes, [_to_path_query(url_or_pq)])[0])


def allowed_batch(filter_prefixes: tuple[str, ...], pqs: list[str]) -> np.ndarray:
    """Vectorized-ish check of many path+queries against one filter.

    Inputs must already be path+query strings (use :func:`allowed` for
    single full URLs); the binary-search-then-prefix check mirrors the
    reference's sorted prefix-free filter probe
    (``util/URLRespectsRobots.java:214-227``).
    """
    if not filter_prefixes:
        return np.ones(len(pqs), dtype=bool)
    arr = np.array(filter_prefixes)
    idx = np.searchsorted(arr, np.array(pqs, dtype=object).astype(str), side="right")
    out = np.ones(len(pqs), dtype=bool)
    nz = idx > 0
    for j in np.nonzero(nz)[0]:
        out[j] = not pqs[j].startswith(arr[idx[j] - 1])
    return out
