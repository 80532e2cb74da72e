"""robots.txt cases mirroring test/.../util/URLRespectsRobotsTest.java:67-209."""

from bubing_ray.robots import EMPTY_FILTER, allowed, allowed_batch, parse_robots, parse_robots_response


def test_star_section():
    f = parse_robots(b"User-agent: *\nDisallow: /a\n", "BUbiNG")
    assert f == ("/a",)
    assert not allowed(f, "/a/b")
    assert not allowed(f, "/a")
    assert allowed(f, "/b")


def test_agent_specific_overrides_star():
    body = b"User-agent: *\nDisallow: /x\n\nUser-agent: BUbiNG\nDisallow: /y\n"
    f = parse_robots(body, "BUbiNG")
    assert f == ("/y",)
    assert allowed(f, "/x/1")
    assert not allowed(f, "/y/1")


def test_agent_matched_by_prefix_of_our_ua():
    # section named "BUb" matches agent "BUbiNG" (prefix match)
    body = b"User-agent: BUb\nDisallow: /z\n"
    f = parse_robots(body, "BUbiNG")
    assert f == ("/z",)
    # section named "BUbiNGX" does not
    f2 = parse_robots(b"User-agent: BUbiNGX\nDisallow: /z\n", "BUbiNG")
    assert f2 == ()


def test_empty_disallow_clears():
    body = b"User-agent: *\nDisallow: /a\nDisallow:\n"
    f = parse_robots(body, "BUbiNG")
    assert f == ()


def test_trailing_star_stripped():
    f = parse_robots(b"User-agent: *\nDisallow: /a*\n", "BUbiNG")
    assert f == ("/a",)


def test_prefix_free():
    # /c disallowed blocks /c/d, and /c/e via prefix-freeness
    f = parse_robots(b"User-agent: *\nDisallow: /c\nDisallow: /c/d\n", "BUbiNG")
    assert f == ("/c",)
    assert not allowed(f, "/c/d")
    assert not allowed(f, "/c/e")


def test_status_classes():
    assert parse_robots_response(404, None) == EMPTY_FILTER
    assert parse_robots_response(500, b"User-agent: *\nDisallow: /\n") == EMPTY_FILTER
    assert parse_robots_response(200, b"User-agent: *\nDisallow: /\n") == ("/",)
    assert parse_robots_response(302, b"User-agent: *\nDisallow: /q\n") == ("/q",)
    assert parse_robots_response(0, b"") is None  # purge host


def test_full_url_and_batch():
    f = parse_robots(b"User-agent: *\nDisallow: /priv/\n", "BUbiNG")
    assert not allowed(f, "http://h.example/priv/3")
    assert allowed(f, "http://h.example/p/3")
    mask = allowed_batch(f, ["/priv/1", "/p/1", "/privx", "/priv/"])
    assert list(mask) == [False, True, True, False]


def test_bom_and_comments():
    body = b"\xef\xbb\xbf# comment line\nUser-agent: *\nDisallow: /a # inline\n"
    f = parse_robots(body, "BUbiNG")
    assert f == ("/a",)


def test_double_slash_paths():
    # Regression (round-2 VERDICT #1): paths containing "//" must not be
    # mistaken for full URLs; reference does a pure prefix match on
    # path+query (util/URLRespectsRobots.java:214-227).
    f = parse_robots(b"User-agent: *\nDisallow: /a//\n", "BUbiNG")
    assert not allowed(f, "/a//b")
    assert not allowed(f, "/a//")
    assert allowed(f, "/a/b")
    assert list(allowed_batch(f, ["/a//b", "/a/b"])) == [False, True]

    # hypothesis counterexample: Disallow: //, probe //
    f2 = parse_robots(b"User-agent: *\nDisallow: //\n", "BUbiNG")
    assert not allowed(f2, "//")
    assert not allowed(f2, "//x")
    assert allowed(f2, "/x")
    assert list(allowed_batch(f2, ["//", "//x", "/x"])) == [False, False, True]

    # full URLs (scheme present) still get path+query extracted
    f3 = parse_robots(b"User-agent: *\nDisallow: /p//q\n", "BUbiNG")
    assert not allowed(f3, "http://h.example/p//q/1")
    assert allowed(f3, "http://h.example/p/q")
