"""Round-5 review-i fixes: stale-shard GC in resumable_write, page-server
routing edge cases (userinfo URLs, NXDOMAIN resolvers, null statuses),
and the fixture-generation race/staleness guards."""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bubing_ray.pipelines.resume import resumable_write


def _write_inputs(tmp_path, n_files, rows=10):
    files = []
    for f in range(n_files):
        t = pa.table({
            "doc_id": pa.array(range(f * rows, (f + 1) * rows), pa.int64()),
            "text": [f"doc {f}-{i} body" for i in range(rows)],
        })
        p = str(tmp_path / f"in-{f}.parquet")
        pq.write_table(t, p)
        files.append(p)
    return files


def test_resumable_write_clears_stale_higher_shards(ray_session, tmp_path):
    """A rerun over a SHRUNKEN input must not leave the dropped files'
    rows in the output union (review r5i: stale shard-00001 survived)."""
    import ray

    (tmp_path / "in").mkdir()
    files = _write_inputs(tmp_path / "in", 4)
    out = str(tmp_path / "out")
    ident = lambda ds: ds  # noqa: E731
    st = resumable_write(files, out, ident, shard_size=2)
    assert st["shards"] == 2 and st["ran"] == 2
    # rerun with only the first shard's files
    st2 = resumable_write(files[:2], out, ident, shard_size=2)
    assert st2["shards"] == 1 and st2["skipped"] == 1
    got = ray.data.read_parquet(out).count()
    assert got == 20  # 2 files x 10 rows — shard-00001 rows are gone
    assert not os.path.isdir(os.path.join(out, "shard-00001"))
    assert not os.path.exists(
        os.path.join(out, "_markers", "shard-00001.done"))


def test_route_pages_userinfo_and_nodns(ray_session, tmp_path):
    """Userinfo URLs route by the stripped host (matching burl.host_of)
    and an NXDOMAIN resolver parks the page instead of crashing load."""
    import ray

    from bubing_ray.frontier.dns import fake_resolve
    from bubing_ray.frontier.pageserver import _route_pages_file

    urls = [
        "http://user@host3.example/p/1",   # userinfo: strip before routing
        "http://nodnshost.example/p/2",    # NXDOMAIN zone: must not crash
        "http://host5.example/p/3",
        "relative/no/scheme",              # regex miss: must not crash
    ]
    t = pa.table({
        "url": urls,
        "warc_ts": pa.array([0] * 4, pa.int64()),
        "html": pa.array([b"<html></html>"] * 4, pa.binary()),
        "text": [""] * 4,
        "lang": ["en"] * 4,
    })
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    n_shards = 4
    parts = ray.get(_route_pages_file.options(num_returns=n_shards).remote(
        p, n_shards, "bubing_ray.frontier.dns", "fake_resolve_nodns"))
    by_url = {}
    for s, part in enumerate(parts):
        for u in part.column("url").to_pylist():
            by_url[u] = s
    assert len(by_url) == 4  # every row landed exactly once
    # userinfo stripped: same shard as the bare host would get
    assert by_url["http://user@host3.example/p/1"] == \
        fake_resolve("host3.example") % n_shards
    # NXDOMAIN host and regex miss park on shard 0
    assert by_url["http://nodnshost.example/p/2"] == 0
    assert by_url["relative/no/scheme"] == 0


def test_pageserver_null_status_defaults_200(ray_session, tmp_path):
    """A user pages table with a nullable status column: nulls behave
    like the absent-column default (200), not NaN->int32 garbage."""
    import ray

    from bubing_ray.frontier.pageserver import load_page_servers

    t = pa.table({
        "url": ["http://host1.example/a", "http://host1.example/b"],
        "warc_ts": pa.array([0, 0], pa.int64()),
        "html": pa.array([b"<html>x</html>", b"<html>y</html>"], pa.binary()),
        "status": pa.array([None, 0], pa.int32()),  # null + error sentinel
    })
    d = tmp_path / "pages"
    d.mkdir()
    pq.write_table(t, str(d / "part-0.parquet"))
    servers = load_page_servers(
        str(d), 1, "bubing_ray.frontier.dns", "fake_resolve")
    ready = pa.table({"url": ["http://host1.example/a",
                              "http://host1.example/b"]})
    out = ray.get(servers[0].fetch.remote(ready))
    status = dict(zip(out.column("url").to_pylist(),
                      out.column("status").to_pylist()))
    assert status["http://host1.example/a"] == 200  # null -> default
    assert status["http://host1.example/b"] == 0    # sentinel stays error
    err = dict(zip(out.column("url").to_pylist(),
                   out.column("error").to_pylist()))
    assert err["http://host1.example/a"] is None
    assert err["http://host1.example/b"] is not None
    for a in servers:
        ray.kill(a)


def test_synthetic_web_recovers_from_stale_markerless_dir(tmp_path):
    """A marker-less web dir (crashed pre-rename run) is cleared and
    regenerated instead of blocking generation forever."""
    from bubing_ray.pipelines.queries import synthetic_web

    root = str(tmp_path / "web")
    stale = os.path.join(root, "web_10x50")
    os.makedirs(stale)
    open(os.path.join(stale, "garbage.parquet"), "w").write("not parquet")
    out, n_hosts, pph = synthetic_web("/root/testdata/sf0.001", root)
    assert out == stale and n_hosts == 10 and pph == 50
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not os.path.exists(os.path.join(out, "garbage.parquet"))
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert files  # regenerated content is present


def test_write_oracle_atomic_staging(tmp_path):
    """write_oracle stages into a pid-unique dir and renames once: the
    final dir appears only complete (with _SUCCESS), and a stale
    marker-less dir is replaced."""
    from bubing_ray.pages import write_oracle

    out = str(tmp_path / "oracle")
    os.makedirs(out)  # stale marker-less dir
    write_oracle(out, n_hosts=10, pages_per_host=5)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert os.path.isdir(os.path.join(out, "meta"))
    assert os.path.isdir(os.path.join(out, "edges"))
    # no staging leftovers beside it
    parent = os.path.dirname(out)
    assert [d for d in os.listdir(parent) if ".tmp" in d] == []
