"""WARC reader/writer round-trip tests — the write-then-read shape of
the reference's warc/io/RandomReadWritesTest.java:30-45, over both the
plain and per-record-gzip-member forms (CompressedWarcReader.java:1)."""

import gzip
import io
import os

import numpy as np
import pyarrow as pa
import pytest

from bubing_ray.sources import warc


def _fixture_table(n=50, seed=3):
    rng = np.random.default_rng(seed)
    urls, ts, html, status, ctype, loc = [], [], [], [], [], []
    for i in range(n):
        urls.append(f"http://w{i % 7}.example/doc/{i}")
        ts.append(1_700_000_000_000 + int(rng.integers(0, 10_000_000)))
        body = bytes(rng.integers(0, 256, size=int(rng.integers(0, 4096)), dtype=np.uint8))
        html.append(body)
        st = int(rng.choice([200, 200, 200, 301, 404]))
        status.append(st)
        ctype.append("text/html; charset=utf-8" if st != 301 else "text/html")
        loc.append(f"http://w0.example/doc/{i+1}" if st == 301 else None)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.int64()),
            "html": pa.array(html, pa.binary()),
            "status": pa.array(np.array(status, np.int32)),
            "content_type": pa.array(ctype, pa.string()),
            "location": pa.array(loc, pa.string()),
        }
    )


def _read_all(path):
    with open(path, "rb") as f:
        return warc.records_to_table(list(warc.iter_warc_records(warc._maybe_gzip(f))))


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip(tmp_path, compress):
    t = _fixture_table()
    path = str(tmp_path / ("a.warc.gz" if compress else "a.warc"))
    n = warc.write_warc(t, path, compress=compress)
    assert n == t.num_rows
    out = _read_all(path)
    assert out.num_rows == t.num_rows
    for col in ("url", "warc_ts", "html", "status", "content_type", "location"):
        assert out.column(col).to_pylist() == t.column(col).to_pylist(), col


def test_gzip_members_are_per_record(tmp_path):
    """Each record must be its own gzip member (the reader contract that
    lets archives split at member boundaries)."""
    t = _fixture_table(n=5)
    path = str(tmp_path / "m.warc.gz")
    warc.write_warc(t, path, compress=True)
    raw = open(path, "rb").read()
    assert raw.count(b"\x1f\x8b\x08") >= 5  # one magic per member
    # decompressing ONLY the first member yields exactly one record
    first = gzip.GzipFile(fileobj=io.BytesIO(raw)).read()  # reads all members
    one = warc.records_to_table(
        [next(warc.iter_warc_records(io.BufferedReader(io.BytesIO(first))))]
    )
    assert one.column("url")[0].as_py() == t.column("url")[0].as_py()


def test_non_response_records_skipped(tmp_path):
    body = b"software: test"
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"WARC-Record-ID: <urn:uuid:x>\r\n"
        b"WARC-Date: 2023-01-01T00:00:00Z\r\n"
        b"Content-Type: application/warc-fields\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
        + body
        + b"\r\n\r\n"
    )
    t = _fixture_table(n=3)
    path = str(tmp_path / "w.warc")
    with open(path, "wb") as f:
        f.write(rec)  # leading warcinfo, like real Common Crawl files
    with open(path, "ab") as f:
        for i in range(t.num_rows):
            f.write(
                warc.build_response_record(
                    t.column("url")[i].as_py(),
                    t.column("html")[i].as_py(),
                    status=t.column("status")[i].as_py(),
                    content_type=t.column("content_type")[i].as_py(),
                    location=t.column("location")[i].as_py(),
                    ts_ms=t.column("warc_ts")[i].as_py(),
                )
            )
    out = _read_all(path)
    assert out.num_rows == 3
    assert out.column("url").to_pylist() == t.column("url").to_pylist()


def test_gz_index_and_random_access(tmp_path):
    """GZIP-archive index: every member addressable by (offset, length);
    random reads return the exact record (the RandomReadWritesTest
    random-read sequence, here in shuffled order)."""
    t = _fixture_table(n=30)
    path = str(tmp_path / "idx.warc.gz")
    warc.write_warc(t, path, compress=True)
    idx = warc.index_warc_gz(path)
    assert idx.num_rows == 30
    assert idx.column("url").to_pylist() == t.column("url").to_pylist()
    assert idx.column("warc_type").to_pylist() == ["response"] * 30
    # offsets tile the file exactly
    offs = idx.column("offset").to_pylist()
    lens = idx.column("length").to_pylist()
    assert offs[0] == 0
    for i in range(1, 30):
        assert offs[i] == offs[i - 1] + lens[i - 1]
    assert offs[-1] + lens[-1] == os.path.getsize(path)
    order = np.random.default_rng(0).permutation(30)
    for i in order:
        rec = warc.read_record_at(path, offs[i], lens[i])
        assert rec["headers"]["warc-target-uri"] == t.column("url")[i].as_py()
        _, _, _, body = warc.parse_http_response(rec["block"])
        assert body == t.column("html")[i].as_py()


def test_read_warc_dataset(tmp_path, ray_session):
    """read_warc over two files = union of their records, pages schema."""
    t = _fixture_table(n=40)
    p1 = str(tmp_path / "p1.warc.gz")
    p2 = str(tmp_path / "p2.warc")
    warc.write_warc(t.slice(0, 25), p1)
    warc.write_warc(t.slice(25), p2)
    ds = warc.read_warc([p1, p2], rows_per_block=8)
    got = ds.to_pandas().sort_values("url").reset_index(drop=True)
    exp = t.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(got) == len(exp)
    assert list(got["url"]) == list(exp["url"])
    assert list(got["status"]) == list(exp["status"])
    assert [len(b) for b in got["html"]] == [len(b) for b in exp["html"]]


def test_status_zero_survives_roundtrip(tmp_path):
    """Regression (round-2 ADVICE): status 0 (the engine's fetch-error
    sentinel) must not be coerced to 200 on export."""
    t = pa.table(
        {
            "url": pa.array(["http://h.example/err"], pa.string()),
            "warc_ts": pa.array([1_700_000_000_000], pa.int64()),
            "html": pa.array([b""], pa.binary()),
            "status": pa.array(np.array([0], np.int32)),
            "content_type": pa.array([None], pa.string()),
            "location": pa.array([None], pa.string()),
        }
    )
    path = str(tmp_path / "err.warc")
    warc.write_warc(t, path)
    out = _read_all(path)
    assert out.column("status").to_pylist() == [0]


def test_full_fidelity_roundtrip(tmp_path):
    """warcinfo + request + response records with the BUbiNG store
    headers (WarcHeader.java:43-75, WarcStore.java:67-75): records
    written with warcinfo/requests on read back with the extension
    headers intact; plain ingestion still sees only the responses."""
    rows = [
        {
            "url": "http://h0.example/p/0", "warc_ts": 1_700_000_001_000,
            "html": b"<html>x</html>", "status": 200,
            "content_type": "text/html; charset=utf-8", "location": None,
            "digest64": 0x1122334455667788, "is_duplicate": False,
            "charset": "UTF-8",
        },
        {
            "url": "http://h0.example/p/1", "warc_ts": 1_700_000_002_000,
            "html": b"<html>x</html>", "status": 200,
            "content_type": "text/html", "location": None,
            "digest64": 0x1122334455667788, "is_duplicate": True,
            "charset": "ISO-8859-1",
        },
    ]
    path = str(tmp_path / "full.warc.gz")
    n = warc.write_warc(rows, path, warcinfo=True, requests=True)
    assert n == 2
    with open(path, "rb") as f:
        recs = list(warc.iter_warc_records(warc._maybe_gzip(f)))
    types = [r["headers"]["warc-type"] for r in recs]
    assert types == ["warcinfo", "request", "response", "request", "response"]
    # warcinfo: warc-fields block + filename
    wi = recs[0]
    assert wi["headers"]["content-type"] == "application/warc-fields"
    assert wi["headers"]["warc-filename"] == "full.warc.gz"
    assert b"software: bubing_ray" in wi["block"]
    # request links to its response via WARC-Concurrent-To
    req, resp = recs[1], recs[2]
    assert req["headers"]["content-type"] == "application/http;msgtype=request"
    assert req["headers"]["warc-concurrent-to"] == resp["headers"]["warc-record-id"]
    assert req["block"].startswith(b"GET /p/0 HTTP/1.1\r\nHost: h0.example\r\n")
    # BUbiNG extension headers on the responses
    assert resp["headers"]["warc-payload-digest"] == "bubing:1122334455667788"
    assert resp["headers"]["bubing-guessed-charset"] == "UTF-8"
    assert "bubing-is-duplicate" not in resp["headers"]  # only when dup
    resp2 = recs[4]
    assert resp2["headers"]["bubing-is-duplicate"] == "true"
    # extended table surfaces them; plain table = responses only
    ext = warc.records_to_table(recs, extended=True)
    assert ext.num_rows == 2
    assert ext.column("payload_digest").to_pylist() == ["1122334455667788"] * 2
    assert ext.column("is_duplicate").to_pylist() == [False, True]
    assert ext.column("charset").to_pylist() == ["UTF-8", "ISO-8859-1"]
    plain = warc.records_to_table(recs)
    assert plain.num_rows == 2 and "payload_digest" not in plain.column_names


# ------------------------------------------------- foreign-fixture interop

def _foreign_warc_bytes(lf_only: bool) -> bytes:
    """A WARC stream this repo's writer did NOT produce: header order
    shuffled, warcinfo + request records interleaved with responses,
    optional LF-only line endings (real-world archives are not CRLF-
    strict).  Reference analogue: the hand-built fixtures read by
    test/.../warc/io/RandomReadWritesTest.java:30-45."""
    nl = b"\n" if lf_only else b"\r\n"

    def rec(headers: list[tuple[bytes, bytes]], block: bytes) -> bytes:
        out = b"WARC/1.0" + nl
        for k, v in headers:
            out += k + b": " + v + nl
        out += b"Content-Length: " + str(len(block)).encode() + nl
        return out + nl + block + nl + nl

    info = b"software: somebody-elses-crawler 1.2\n"
    body1 = (b"HTTP/1.1 200 OK" + nl
             + b"Content-Type: text/html; charset=utf-8" + nl
             + b"Server: foreign/0.1" + nl + nl
             + b"<html><body>alpha</body></html>")
    body2 = (b"HTTP/1.1 301 Moved Permanently" + nl
             + b"Location: http://f.example/new" + nl
             + b"Content-Type: text/html" + nl + nl)
    req = (b"GET /a HTTP/1.1" + nl + b"Host: f.example" + nl + nl)
    return (
        rec([(b"WARC-Type", b"warcinfo"),
             (b"WARC-Date", b"2024-01-02T03:04:05Z"),
             (b"Content-Type", b"application/warc-fields"),
             (b"WARC-Record-ID", b"<urn:uuid:00000000-0000-0000-0000-000000000001>")],
            info)
        # request record BEFORE its response, headers in odd order
        + rec([(b"Content-Type", b"application/http;msgtype=request"),
               (b"WARC-Target-URI", b"http://f.example/a"),
               (b"WARC-Record-ID", b"<urn:uuid:00000000-0000-0000-0000-000000000002>"),
               (b"WARC-Date", b"2024-01-02T03:04:06Z"),
               (b"WARC-Type", b"request")],
              req)
        + rec([(b"WARC-Record-ID", b"<urn:uuid:00000000-0000-0000-0000-000000000003>"),
               (b"WARC-Type", b"response"),
               (b"Content-Type", b"application/http;msgtype=response"),
               (b"WARC-Date", b"2024-01-02T03:04:06Z"),
               (b"WARC-Target-URI", b"http://f.example/a")],
              body1)
        + rec([(b"WARC-Type", b"metadata"),
               (b"WARC-Date", b"2024-01-02T03:04:07Z"),
               (b"WARC-Record-ID", b"<urn:uuid:00000000-0000-0000-0000-000000000004>")],
              b"via: nowhere\n")
        + rec([(b"WARC-Target-URI", b"http://f.example/old"),
               (b"WARC-Date", b"2024-01-02T03:04:08Z"),
               (b"WARC-Type", b"response"),
               (b"Content-Type", b"application/http;msgtype=response"),
               (b"WARC-Record-ID", b"<urn:uuid:00000000-0000-0000-0000-000000000005>")],
              body2)
    )


@pytest.mark.parametrize("lf_only", [False, True])
@pytest.mark.parametrize("container", ["plain", "one_member_gz"])
def test_foreign_warc_fixture(tmp_path, ray_session, lf_only, container):
    """read_warc over an independently-constructed archive: exactly the
    response records come back with correct url/status/ctype/body —
    including a single-gzip-member container (foreign archives rarely
    use BUbiNG's per-record members) and LF-only line endings."""
    raw = _foreign_warc_bytes(lf_only)
    if container == "plain":
        p = str(tmp_path / f"foreign_{lf_only}.warc")
        with open(p, "wb") as f:
            f.write(raw)
    else:
        p = str(tmp_path / f"foreign_{lf_only}.warc.gz")
        with open(p, "wb") as f:
            f.write(gzip.compress(raw))
    t = (warc.read_warc([p]).to_pandas()
         .sort_values("url").reset_index(drop=True))
    assert list(t["url"]) == ["http://f.example/a", "http://f.example/old"]
    assert list(t["status"]) == [200, 301]
    assert t["content_type"][0].startswith("text/html")
    assert bytes(t["html"][0]) == b"<html><body>alpha</body></html>"
    assert t["location"][1] == "http://f.example/new"
    assert bytes(t["html"][1]) == b""
    # both records carry the archive's own timestamps
    assert (t["warc_ts"] > 1_600_000_000_000).all()
