"""Golden-value lock on parse_html semantics.

The parse hot loop gets performance work (round 5 rewrote digest
buffering, tag-byte tables, raw-text skip); these fixtures pin the
exact (text, digest, links) for adversarial inputs — unterminated and
self-closing raw-text elements, nofollow rel lists, base/meta
redirects, unknown tags, non-ASCII digit/whitespace runs, 3xx salting
— so any future "optimization" that shifts a byte fails here, not at
the driver's extract_text byte-identity oracle.

Generated from the engine itself after a 9,000-comparison differential
check against the pre-optimization implementation (zero mismatches);
reference semantics per HTMLParser.java:537 (digest salt) and
HTMLParser.java:636-643 (3xx salt).
"""
import json
import os

from bubing_ray.html_parser import parse_html

_DATA = os.path.join(os.path.dirname(__file__), "data_parser_golden.json")


def test_parser_golden_values():
    cases = json.load(open(_DATA))
    assert len(cases) == 48
    for html, mode, text, digest_hex, links in cases:
        if mode == "3xx":
            r = parse_html("http://host1.example/p/1", html, status=301,
                           location_header="http://h.example/moved")
        else:
            r = parse_html("http://host1.example/p/1", html, status=200,
                           cross_authority_duplicates=mode)
        assert r.text == text, html
        assert r.digest.hex() == digest_hex, html
        assert r.links == links, html


def test_golden_covers_raw_text_edges():
    # the fixture set must keep exercising the paths the optimization
    # touched: self-closing script, unterminated script, spaced end tag
    cases = json.load(open(_DATA))
    sources = {c[0] for c in cases}
    assert any("/>" in s and "script" in s for s in sources)
    assert any("never closed" in s for s in sources)
    assert any("</SCRIPT >" in s for s in sources)
