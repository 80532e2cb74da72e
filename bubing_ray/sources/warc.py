"""WARC 1.0 reader/writer — Common-Crawl-style ingestion for the engine.

From-scratch implementation of the public ISO 28500 / WARC 1.0 record
format (the reference reads and writes this format via
``warc/io/WarcReader.java:1`` / ``CompressedWarcReader.java:1`` /
``WarcWriter.java``; round-trip semantics are modeled on its
``RandomReadWritesTest.java:30-45`` write-then-read tests):

- a record is ``WARC/1.0 CRLF``, named headers, blank line, a content
  block of exactly ``Content-Length`` bytes, then ``CRLF CRLF``;
- ``response`` records carry a full HTTP response (status line, HTTP
  headers, body) as their block;
- a ``.warc.gz`` stores EACH RECORD AS ITS OWN GZIP MEMBER so readers
  can split archives at member boundaries (the CompressedWarcReader
  contract).  Python's ``gzip`` handles multi-member streams
  transparently, so sequential reading needs no index.

The Ray-facing surface is :func:`read_warc` — a streaming
``FileBasedDatasource`` (one read task per file, records buffered into
Arrow blocks of ``rows_per_block``) yielding the engine's ``pages``
schema: url, warc_ts(ms), html(binary), status, content_type, location.
At 100 TB the unit of parallelism is the WARC file (Common Crawl ships
~1 GB segments); blocks stream out of each file with backpressure, so a
task never holds a whole archive decompressed in memory.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa

CRLF = b"\r\n"

# Reason phrases for the fixture writer (anything is legal in HTTP;
# readers must not depend on them)
_REASONS = {200: "OK", 301: "Moved Permanently", 404: "Not Found"}


def _warc_date(ts_ms: int) -> str:
    dt = datetime.fromtimestamp(ts_ms / 1000.0, tz=timezone.utc)
    if ts_ms % 1000:  # WARC 1.1-style fractional seconds, ms precision
        return dt.strftime("%Y-%m-%dT%H:%M:%S.") + f"{ts_ms % 1000:03d}Z"
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def _parse_warc_date(s: str) -> int:
    s = s.strip()
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in s else "%Y-%m-%dT%H:%M:%SZ"
    dt = datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)
    return int(round(dt.timestamp() * 1000))


def _record_id(url: str, ts_ms: int) -> str:
    """Deterministic urn:uuid (hash-derived) — reproducible fixtures."""
    h = hashlib.md5(f"{url}@{ts_ms}".encode()).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def build_response_record(
    url: str,
    body: bytes,
    status: int = 200,
    content_type: str | None = None,
    location: str | None = None,
    ts_ms: int = 0,
    payload_digest: bytes | str | None = None,
    is_duplicate: bool = False,
    guessed_charset: str | None = None,
) -> bytes:
    """One uncompressed WARC response record (bytes).

    The three optional extras are the reference's store headers
    (``store/WarcStore.java:67-75``): ``WARC-Payload-Digest`` in the
    ``bubing:<hex>`` scheme, ``BUbiNG-Is-Duplicate: true`` only when
    duplicate, and ``BUbiNG-Guessed-Charset``
    (``warc/records/WarcHeader.java:43-75``)."""
    http = [f"HTTP/1.1 {status} {_REASONS.get(status, 'X')}".encode()]
    if content_type:
        http.append(b"Content-Type: " + content_type.encode("latin-1"))
    if location:
        http.append(b"Location: " + location.encode("latin-1"))
    http.append(b"Content-Length: " + str(len(body)).encode())
    block = CRLF.join(http) + CRLF + CRLF + body
    headers = [
        b"WARC/1.0",
        b"WARC-Type: response",
        b"WARC-Record-ID: " + _record_id(url, ts_ms).encode(),
        b"WARC-Date: " + _warc_date(ts_ms).encode(),
        b"WARC-Target-URI: " + url.encode("latin-1"),
        b"Content-Type: application/http;msgtype=response",
    ]
    if payload_digest is not None:
        hexd = (
            payload_digest.hex()
            if isinstance(payload_digest, (bytes, bytearray))
            else str(payload_digest)
        )
        headers.append(b"WARC-Payload-Digest: bubing:" + hexd.encode("latin-1"))
    if guessed_charset:
        headers.append(
            b"BUbiNG-Guessed-Charset: " + guessed_charset.encode("latin-1")
        )
    if is_duplicate:
        headers.append(b"BUbiNG-Is-Duplicate: true")
    headers.append(b"Content-Length: " + str(len(block)).encode())
    return CRLF.join(headers) + CRLF + CRLF + block + CRLF + CRLF


def build_request_record(url: str, ts_ms: int = 0,
                         concurrent_to: str | None = None,
                         user_agent: str = "BUbiNG") -> bytes:
    """The ``request`` record paired with a response (the reference's
    HttpRequestWarcRecord): an ``application/http;msgtype=request``
    block holding the GET, linked to its response via
    ``WARC-Concurrent-To``."""
    scheme, _, rest = url.partition("://")
    host, slash, pq = rest.partition("/")
    req = (
        f"GET /{pq} HTTP/1.1".encode()
        + CRLF + b"Host: " + host.encode("latin-1")
        + CRLF + b"User-Agent: " + user_agent.encode("latin-1")
        + CRLF + CRLF
    )
    headers = [
        b"WARC/1.0",
        b"WARC-Type: request",
        b"WARC-Record-ID: " + _record_id("req:" + url, ts_ms).encode(),
        b"WARC-Date: " + _warc_date(ts_ms).encode(),
        b"WARC-Target-URI: " + url.encode("latin-1"),
        b"Content-Type: application/http;msgtype=request",
    ]
    if concurrent_to:
        headers.append(b"WARC-Concurrent-To: " + concurrent_to.encode("latin-1"))
    headers.append(b"Content-Length: " + str(len(req)).encode())
    return CRLF.join(headers) + CRLF + CRLF + req + CRLF + CRLF


def build_warcinfo_record(filename: str, ts_ms: int = 0,
                          fields: dict[str, str] | None = None) -> bytes:
    """Archive-leading ``warcinfo`` record (``application/warc-fields``
    block + ``WARC-Filename``), as WARC writers emit at file start."""
    f = {"software": "bubing_ray", "format": "WARC File Format 1.0"}
    if fields:
        f.update(fields)
    block = b"".join(
        k.encode("latin-1") + b": " + v.encode("latin-1") + CRLF
        for k, v in f.items()
    )
    headers = [
        b"WARC/1.0",
        b"WARC-Type: warcinfo",
        b"WARC-Record-ID: " + _record_id("warcinfo:" + filename, ts_ms).encode(),
        b"WARC-Date: " + _warc_date(ts_ms).encode(),
        b"WARC-Filename: " + filename.encode("latin-1"),
        b"Content-Type: application/warc-fields",
        b"Content-Length: " + str(len(block)).encode(),
    ]
    return CRLF.join(headers) + CRLF + CRLF + block + CRLF + CRLF


def write_warc(rows, path: str, compress: bool | None = None,
               warcinfo: bool = False, requests: bool = False,
               user_agent: str = "BUbiNG") -> int:
    """Write rows to a WARC file; ``rows`` is an Arrow table (or
    iterable of dicts) with url, html, status, content_type, location,
    warc_ts columns — plus, when present, the store's ``digest64`` /
    ``digest`` (-> WARC-Payload-Digest), ``is_duplicate`` and
    ``charset`` (-> the BUbiNG extension headers).  ``.gz`` paths get
    one gzip member per record.  ``warcinfo=True`` leads the archive
    with a warcinfo record; ``requests=True`` writes the paired request
    record (WARC-Concurrent-To its response) before each response, as
    full-fidelity WARC tools do.  Returns the number of RESPONSE
    records written."""
    import os as _os

    if compress is None:
        compress = path.endswith(".gz")
    if isinstance(rows, pa.Table):
        cols = rows.column_names
        lists = [rows.column(c).to_pylist() for c in cols]  # columnar, no
        # per-cell Arrow scalar boxing
        it = (dict(zip(cols, vals)) for vals in zip(*lists))
    else:
        it = iter(rows)
    n = 0

    def emit(f, rec: bytes):
        if compress:
            # mtime=0: byte-reproducible members
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(rec)
            f.write(buf.getvalue())
        else:
            f.write(rec)

    with open(path, "wb") as f:
        if warcinfo:
            emit(f, build_warcinfo_record(_os.path.basename(path)))
        for r in it:
            ts = r.get("warc_ts") or 0
            if hasattr(ts, "timestamp"):
                # Arrow timestamps without a timezone surface as NAIVE
                # datetimes; .timestamp() would read them in the local
                # zone, shifting WARC-Date by the UTC offset on non-UTC
                # machines — treat naive as UTC for reproducible exports
                if ts.tzinfo is None:
                    from datetime import timezone as _tz

                    ts = ts.replace(tzinfo=_tz.utc)
                ts = int(ts.timestamp() * 1000)
            # `or 200` would coerce status 0 (the engine's fetch-error
            # sentinel) into HTTP 200 and corrupt export/ingest round
            # trips; only a missing status defaults to 200
            s = r.get("status")
            digest = r.get("digest")
            if digest is None and r.get("digest64") is not None:
                digest = int(r["digest64"]).to_bytes(8, "big")
            if requests:
                emit(f, build_request_record(
                    r["url"], ts_ms=int(ts),
                    concurrent_to=_record_id(r["url"], int(ts)),
                    user_agent=user_agent,
                ))
            rec = build_response_record(
                r["url"],
                r.get("html") or b"",
                status=int(s) if s is not None else 200,
                content_type=r.get("content_type"),
                location=r.get("location"),
                ts_ms=int(ts),
                payload_digest=digest,
                is_duplicate=bool(r.get("is_duplicate")),
                guessed_charset=r.get("charset"),
            )
            emit(f, rec)
            n += 1
    return n


# --------------------------------------------------------------- record parse

def _read_exact(f, n: int) -> bytes:
    out = f.read(n)
    while out is not None and len(out) < n:
        more = f.read(n - len(out))
        if not more:
            break
        out += more
    return out or b""


def _read_line(f) -> bytes:
    """Read one CRLF-terminated line from a binary stream lacking
    readline (pyarrow NativeFile); byte-at-a-time is fine — header
    lines are tiny next to the content blocks."""
    if hasattr(f, "readline"):
        return f.readline()
    out = bytearray()
    while True:
        c = f.read(1)
        if not c:
            break
        out += c
        if c == b"\n":
            break
    return bytes(out)


def iter_warc_records(stream):
    """Yield dicts (warc headers + ``block`` bytes) from an uncompressed
    WARC byte stream.  Tolerates leading blank lines between records."""
    while True:
        line = _read_line(stream)
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line: {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            line = _read_line(stream)
            if not line or line.strip() == b"":
                break
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.decode("latin-1").strip().lower()] = v.decode(
                    "latin-1"
                ).strip()
        length = int(headers.get("content-length", "0"))
        block = _read_exact(stream, length)
        yield {"headers": headers, "block": block}


def parse_http_response(block: bytes):
    """(status, content_type, location, body) from an HTTP response
    block; non-HTTP blocks come back as (None, None, None, block).
    Tolerates LF-only heads (foreign archives are not always CRLF-
    strict, cf. the reference's lenient line reader in
    warc/io/BufferedWarcReader semantics)."""
    if not block.startswith(b"HTTP/"):
        return None, None, None, block
    head, sep, body = block.partition(CRLF + CRLF)
    if not sep:  # LF-only head
        head, sep, body = block.partition(b"\n\n")
        if not sep:
            body = b""
    lines = [ln.rstrip(b"\r") for ln in head.replace(CRLF, b"\n").split(b"\n")]
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = 0
    ctype = None
    location = None
    for ln in lines[1:]:
        if b":" not in ln:
            continue
        k, v = ln.split(b":", 1)
        kl = k.strip().lower()
        if kl == b"content-type":
            ctype = v.decode("latin-1").strip()
        elif kl == b"location":
            location = v.decode("latin-1").strip()
    return status, ctype, location, body


PAGES_OUT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.int64()),
        ("html", pa.binary()),
        ("status", pa.int32()),
        ("content_type", pa.string()),
        ("location", pa.string()),
    ]
)


def records_to_table(records: list[dict], extended: bool = False) -> pa.Table:
    """Response records -> pages-schema table (warcinfo/request/other
    types are skipped).  ``extended=True`` also surfaces the BUbiNG
    store headers (payload_digest hex, is_duplicate, charset) so store
    exports round-trip losslessly."""
    url, ts, html, status, ctype, loc = [], [], [], [], [], []
    digs, dups, chars = [], [], []
    for r in records:
        h = r["headers"]
        if h.get("warc-type") != "response":
            continue
        s, ct, lo, body = parse_http_response(r["block"])
        url.append(h.get("warc-target-uri", ""))
        try:
            ts.append(_parse_warc_date(h.get("warc-date", "")))
        except ValueError:
            ts.append(0)
        html.append(body)
        status.append(s if s is not None else 0)
        ctype.append(ct)
        loc.append(lo)
        if extended:
            d = h.get("warc-payload-digest")
            digs.append(d.split(":", 1)[1] if d and ":" in d else d)
            dups.append(h.get("bubing-is-duplicate") == "true")
            chars.append(h.get("bubing-guessed-charset"))
    cols = {
        "url": pa.array(url, pa.string()),
        "warc_ts": pa.array(np.array(ts, np.int64)),
        "html": pa.array(html, pa.binary()),
        "status": pa.array(np.array(status, np.int32)),
        "content_type": pa.array(ctype, pa.string()),
        "location": pa.array(loc, pa.string()),
    }
    if extended:
        cols["payload_digest"] = pa.array(digs, pa.string())
        cols["is_duplicate"] = pa.array(dups, pa.bool_())
        cols["charset"] = pa.array(chars, pa.string())
    return pa.table(cols)


# ------------------------------------------------------- gzip archive index

def index_warc_gz(path: str, chunk: int = 1 << 20) -> pa.Table:
    """Index a per-record-gzip-member archive: one row per member with
    its compressed (offset, length) plus the record's URL and type —
    the GZIP-archive indexer of the reference (``warc/io/gzarc``
    GZIPArchive/GZIPIndexer semantics): an index makes any record
    randomly accessible without scanning the archive.

    Streams the file once with a raw zlib decompressor, using
    ``unused_data`` to find member boundaries."""
    import zlib

    offs, lens, urls, types = [], [], [], []
    with open(path, "rb") as f:
        carry = b""  # compressed bytes after the previous member's end
        pos = 0  # absolute offset of the current member's first byte
        while True:
            d = zlib.decompressobj(wbits=31)
            out = bytearray()
            fed = 0  # compressed bytes fed to this member's decompressor
            while not d.eof:
                if carry:
                    data, carry = carry, b""
                else:
                    data = f.read(chunk)
                    if not data:
                        break
                fed += len(data)
                out += d.decompress(data)
            if not d.eof:
                break  # EOF mid-member (empty tail) — done
            member_len = fed - len(d.unused_data)
            carry = d.unused_data
            rec = next(
                iter_warc_records(io.BufferedReader(io.BytesIO(bytes(out)))), None
            )
            offs.append(pos)
            lens.append(member_len)
            urls.append(rec["headers"].get("warc-target-uri", "") if rec else "")
            types.append(rec["headers"].get("warc-type", "") if rec else "")
            pos += member_len
    return pa.table(
        {
            "offset": pa.array(np.array(offs, np.int64)),
            "length": pa.array(np.array(lens, np.int64)),
            "url": pa.array(urls, pa.string()),
            "warc_type": pa.array(types, pa.string()),
        }
    )


def read_record_at(path: str, offset: int, length: int | None = None) -> dict:
    """Random access: decompress ONE gzip member at ``offset`` and parse
    its record (the RandomReadWritesTest random-read path)."""
    with open(path, "rb") as f:
        f.seek(offset)
        data = f.read(length) if length else f.read()
    rec = next(
        iter_warc_records(
            io.BufferedReader(io.BytesIO(gzip.decompress(data)))
        )
    )
    return rec


# --------------------------------------------------------------- Ray data src

def _maybe_gzip(f):
    """Wrap a stream in multi-member gzip decompression when the magic
    matches (CompressedWarcReader auto-detection)."""
    head = f.read(2)
    try:
        f.seek(0)
        raw = f
    except (OSError, AttributeError, io.UnsupportedOperation):
        # non-seekable (e.g. a pyarrow input stream): re-chain the bytes
        raw = _Chain(head, f)
    if head[:2] == b"\x1f\x8b":
        return gzip.GzipFile(fileobj=raw, mode="rb")
    # only genuine io streams expose a working readline (pyarrow
    # NativeFile HAS the attribute but raises UnsupportedOperation)
    if isinstance(raw, io.IOBase):
        return raw
    return io.BufferedReader(_RawAdapter(raw))


class _Chain(io.RawIOBase):
    def __init__(self, head: bytes, f):
        self._head = head
        self._f = f

    def readable(self):
        return True

    def readinto(self, b):
        if self._head:
            n = min(len(b), len(self._head))
            b[:n] = self._head[:n]
            self._head = self._head[n:]
            return n
        chunk = self._f.read(len(b))
        if not chunk:
            return 0
        b[: len(chunk)] = chunk
        return len(chunk)


class _RawAdapter(io.RawIOBase):
    def __init__(self, f):
        self._f = f

    def readable(self):
        return True

    def readinto(self, b):
        chunk = self._f.read(len(b))
        if not chunk:
            return 0
        b[: len(chunk)] = chunk
        return len(chunk)


def read_warc(paths, rows_per_block: int = 512, **kwargs):
    """Ray Dataset over WARC file(s) in the ``pages`` schema.

    One streaming read task per file; records accumulate into Arrow
    blocks of ``rows_per_block`` rows, so archives stream through the
    object store with backpressure instead of materializing per file.
    """
    import ray
    from ray.data.datasource import FileBasedDatasource

    class WarcDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["warc", "warc.gz"]

        def __init__(self, paths, **ds_kwargs):
            super().__init__(paths, **ds_kwargs)
            self._rows_per_block = rows_per_block

        def _read_stream(self, f, path: str):
            stream = _maybe_gzip(f)
            buf: list[dict] = []
            for rec in iter_warc_records(stream):
                buf.append(rec)
                if len(buf) >= self._rows_per_block:
                    yield records_to_table(buf)
                    buf = []
            if buf:
                yield records_to_table(buf)

    return ray.data.read_datasource(WarcDatasource(paths), **kwargs)
