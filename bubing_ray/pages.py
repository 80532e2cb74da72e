"""Deterministic synthetic web — the sandbox stand-in for live HTTP.

Mirrors the role of the reference's test harness
(``test/RandomNamedGraphServer`` + ``NamedGraphServerHttpProxy``: a
deterministic pseudo-random web graph of H hosts served as link-only
HTML, with ``FakeResolver`` hash-based DNS): a Parquet ``pages`` table
with columns ``(url, warc_ts, html, text, lang, status, content_type,
location)`` whose ``html`` embeds the link graph and whose ``text`` is
the *expected extracted text* (the byte-identical per-URL oracle of
BASELINE.json's input_hint).

Everything is a pure function of (n_hosts, pages_per_host, out_degree,
seed, page id) — no RNG state — so generation parallelizes as
``map_batches`` over ``ray.data.range`` and any subset of rows can be
regenerated independently.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .hashing import fnv1a64
from .html_parser import normalize_text

VOCAB = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega lorem ipsum dolor "
    "sit amet consectetur adipiscing elit sed do eiusmod tempor incididunt"
).split()

LANGS = ["en", "en", "en", "en", "en", "en", "fr", "de", "es", "zh"]

BASE_TS_MS = 1_700_000_000_000  # fixed epoch for warc_ts determinism


def host_name(h: int) -> str:
    return f"host{h}.example"


def page_url(h: int, i: int) -> str:
    # every 11th page (i % 11 == 3) lives under the robots-disallowed
    # /priv/ prefix, exercising the robots gate
    if i % 11 == 3:
        return f"http://{host_name(h)}/priv/{i}"
    return f"http://{host_name(h)}/p/{i}"


def has_robots(h: int) -> bool:
    return h % 5 == 0


def robots_url(h: int) -> str:
    return f"http://{host_name(h)}/robots.txt"


ROBOTS_BODY = b"User-agent: *\nDisallow: /priv/\n"


def resolve_ip(host: str) -> int:
    """Sandbox DNS: deterministic host -> IP; every 3 consecutive host
    ids share one IP (exercises per-IP politeness, like the reference's
    FakeResolver-driven tests)."""
    if host.startswith("host") and host.endswith(".example"):
        try:
            k = int(host[4: -len(".example")])
            return fnv1a64(f"ipgroup{k - (k % 3)}") & 0xFFFFFFFF
        except ValueError:
            pass
    return fnv1a64(host) & 0xFFFFFFFF


def _rnd(seed: int, *parts: int) -> int:
    x = seed ^ 0x9E3779B97F4A7C15
    for p in parts:
        x = fnv1a64(f"{x}:{p}")
    return x


def page_status(h: int, i: int, seed: int) -> int:
    """200 mostly; 2% 301 redirect, 2% 404, 1% network-error sentinel 0."""
    r = _rnd(seed, h, i, 7) % 100
    if r < 2:
        return 301
    if r < 4:
        return 404
    if r < 5:
        return 0
    return 200


def out_links(h: int, i: int, n_hosts: int, pages_per_host: int, out_degree: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic link targets: ~70% same host, 30% cross host."""
    links = []
    for j in range(out_degree):
        r = _rnd(seed, h, i, j)
        if r % 10 < 7:
            th = h
        else:
            th = (r >> 8) % n_hosts
        ti = (r >> 24) % pages_per_host
        links.append((th, ti))
    return links


def _words(r: int, n: int) -> str:
    return " ".join(VOCAB[(r >> (k * 5)) % len(VOCAB)] for k in range(n))


def build_page(h: int, i: int, n_hosts: int, pages_per_host: int, out_degree: int, seed: int, body_blocks: int = 1):
    """Build one page row; returns (url, ts, html, text, lang, status,
    content_type, location).  ``text`` is computed analytically with the
    same normalization state machine the parser implements, so the crawl
    e2e test asserts byte-identical extraction through the real
    tokenizer path."""
    url = page_url(h, i)
    status = page_status(h, i, seed)
    ts = BASE_TS_MS + (h * pages_per_host + i) * 1000
    lang = LANGS[_rnd(seed, h, i, 13) % len(LANGS)]

    if status == 404:
        return (url, ts, b"<html><body>not found</body></html>", "not found", lang, status, "text/html", None)
    if status == 0:
        return (url, ts, b"", "", lang, status, None, None)
    if status == 301:
        r = _rnd(seed, h, i, 21)
        th, ti = (r % n_hosts), ((r >> 16) % pages_per_host)
        loc = page_url(th, ti)
        return (url, ts, b"<html><body>moved</body></html>", "moved", lang, status, "text/html", loc)

    title = _words(_rnd(seed, h, i, 1), 4)
    # body_blocks scales page weight (Common-Crawl-ish bodies for the
    # bench web) without touching the default small-test pages
    paras = [_words(_rnd(seed, h, i, 2 + 41 * j), 24) for j in range(body_blocks)]
    targets = out_links(h, i, n_hosts, pages_per_host, out_degree, seed)

    html_parts = [f"<html><head><title>{title}</title></head><body>"]
    html_parts += [f"<p>{para}</p>" for para in paras]
    # expected text via the shared normalization state machine: tags reset
    # the space-run state and contribute nothing to text
    text_parts = []
    last = False
    t, last = normalize_text(title, last)
    text_parts.append(t)
    for para in paras:
        last = False  # tags between blocks reset the space-run state
        t, last = normalize_text(para, last)
        text_parts.append(t)
    last = False  # </p> resets
    for k, (th, ti) in enumerate(targets):
        tgt = page_url(th, ti)
        if k == 0:
            # messy form exercising canonicalization: uppercase scheme+host,
            # dot segment — canonicalizes back to tgt
            messy = tgt.replace("http://host", "HTTP://Host").replace("/p/", "/p/./").replace("/priv/", "/priv/./")
            href = messy
        elif k == 1 and th == h:
            href = tgt[len(f"http://{host_name(h)}"):]  # relative
        else:
            href = tgt
        anchor = VOCAB[_rnd(seed, h, i, 100 + k) % len(VOCAB)]
        html_parts.append(f'<a href="{href}">{anchor}</a>')
        t, last = normalize_text(anchor, False)
        text_parts.append(t)
    html_parts.append("</body></html>")
    return (
        url,
        ts,
        "".join(html_parts).encode("utf-8"),
        "".join(text_parts),
        lang,
        status,
        "text/html; charset=utf-8",
        None,
    )


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("ms")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("status", pa.int32()),
        ("content_type", pa.string()),
        ("location", pa.string()),
    ]
)


def generate_table(ids: np.ndarray, n_hosts: int, pages_per_host: int, out_degree: int = 8, seed: int = 0, body_blocks: int = 1) -> pa.Table:
    """Rows for the given global page ids (id = h*pages_per_host + i).

    Ids >= n_hosts*pages_per_host map to robots.txt rows of hosts that
    have one (id - N == robots slot)."""
    n = n_hosts * pages_per_host
    cols = {k: [] for k in ("url", "warc_ts", "html", "text", "lang", "status", "content_type", "location")}
    for gid in ids:
        gid = int(gid)
        if gid < n:
            h, i = divmod(gid, pages_per_host)
            row = build_page(h, i, n_hosts, pages_per_host, out_degree, seed, body_blocks)
        else:
            h = gid - n
            if not has_robots(h):
                continue
            row = (robots_url(h), BASE_TS_MS + gid, ROBOTS_BODY, "", "en", 200, "text/plain", None)
        for k, v in zip(cols, row):
            cols[k].append(v)
    arrs = [
        pa.array(cols["url"], pa.string()),
        pa.array(cols["warc_ts"], pa.timestamp("ms")),
        pa.array(cols["html"], pa.binary()),
        pa.array(cols["text"], pa.string()),
        pa.array(cols["lang"], pa.string()),
        pa.array(cols["status"], pa.int32()),
        pa.array(cols["content_type"], pa.string()),
        pa.array(cols["location"], pa.string()),
    ]
    return pa.Table.from_arrays(arrs, schema=PAGES_SCHEMA)


def write_pages(
    out_dir: str,
    n_hosts: int,
    pages_per_host: int,
    out_degree: int = 8,
    seed: int = 0,
    parallelism: int | None = None,
    body_blocks: int = 1,
) -> str:
    """Generate the pages table as partitioned Parquet via Ray Data.

    Streaming: rd.range -> map_batches(generate) -> write_parquet; no
    driver-side materialization, so it scales to bench sizes."""
    import ray.data as rd

    total = n_hosts * pages_per_host + n_hosts  # + robots slots
    ds = rd.range(total, override_num_blocks=parallelism or max(4, total // 50_000))

    def gen(batch: pa.Table) -> pa.Table:
        return generate_table(
            batch.column("id").to_numpy(), n_hosts, pages_per_host, out_degree, seed,
            body_blocks,
        )

    ds.map_batches(gen, batch_format="pyarrow").write_parquet(out_dir)
    return out_dir


# ----------------------------------------------------- analytic oracle tables

def expected_links(h: int, i: int, n_hosts: int, pages_per_host: int,
                   out_degree: int, seed: int) -> list[str]:
    """Unique canonical link targets of page (h, i) in first-occurrence
    order — what the parser emits, derived analytically from the
    generator (NOT by running the parser), so the exported tables are an
    independent oracle for link extraction and crawl reachability."""
    status = page_status(h, i, seed)
    if status == 301:
        r = _rnd(seed, h, i, 21)
        return [page_url(r % n_hosts, (r >> 16) % pages_per_host)]
    if status != 200:
        return []
    seen: set[str] = set()
    out: list[str] = []
    for th, ti in out_links(h, i, n_hosts, pages_per_host, out_degree, seed):
        u = page_url(th, ti)
        if u not in seen:
            seen.add(u)
            out.append(u)
    return out


def expected_anchors(h: int, i: int, n_hosts: int, pages_per_host: int,
                     out_degree: int, seed: int) -> list[tuple[str, str]]:
    """(dst_url, anchor_text) pairs of page (h, i)'s ``<a>`` tags, in
    tag order and WITHOUT dedup — one pair per rendered tag, exactly
    what anchor-text extraction over the HTML sees.  Derived
    analytically from the generator (the messy/relative href forms all
    resolve back to the canonical target by construction), so the
    exported anchors table is an independent oracle for anchor-text
    aggregation.  Non-200 pages render no ``<a>`` tags."""
    if page_status(h, i, seed) != 200:
        return []
    targets = out_links(h, i, n_hosts, pages_per_host, out_degree, seed)
    return [
        (page_url(th, ti), VOCAB[_rnd(seed, h, i, 100 + k) % len(VOCAB)])
        for k, (th, ti) in enumerate(targets)
    ]


def anchors_table(ids: np.ndarray, n_hosts: int, pages_per_host: int,
                  out_degree: int = 8, seed: int = 0) -> pa.Table:
    """Closed-form (src, dst, anchor) table for the given page ids."""
    a_src, a_dst, a_txt = [], [], []
    n = n_hosts * pages_per_host
    for gid in ids:
        gid = int(gid)
        if gid >= n:
            continue
        h, i = divmod(gid, pages_per_host)
        src = page_url(h, i)
        for dst, txt in expected_anchors(
            h, i, n_hosts, pages_per_host, out_degree, seed
        ):
            a_src.append(src)
            a_dst.append(dst)
            a_txt.append(txt)
    return pa.table(
        {
            "src": pa.array(a_src, pa.string()),
            "dst": pa.array(a_dst, pa.string()),
            "anchor": pa.array(a_txt, pa.string()),
        }
    )


def oracle_tables(ids: np.ndarray, n_hosts: int, pages_per_host: int,
                  out_degree: int = 8, seed: int = 0, body_blocks: int = 1):
    """(meta, edges) Arrow tables for the given page ids.

    meta:  url, host, status, location, allowed, text — one row per page
           (robots slots excluded); ``allowed`` = not robots-blocked.
    edges: src, dst, src_host, dst_host — the parser's per-page unique
           links (including the Location of a 301, which the parser
           appends to the link list).
    """
    m_url, m_host, m_status, m_loc, m_allowed, m_text = [], [], [], [], [], []
    e_src, e_dst, e_sh, e_dh = [], [], [], []
    n = n_hosts * pages_per_host
    for gid in ids:
        gid = int(gid)
        if gid >= n:
            continue  # robots slots carry no meta/edges
        h, i = divmod(gid, pages_per_host)
        url, _, _, text, _, status, _, loc = build_page(
            h, i, n_hosts, pages_per_host, out_degree, seed, body_blocks
        )
        m_url.append(url)
        m_host.append(host_name(h))
        m_status.append(status)
        m_loc.append(loc)
        m_allowed.append(not (has_robots(h) and "/priv/" in url))
        m_text.append(text)
        for dst in expected_links(h, i, n_hosts, pages_per_host, out_degree, seed):
            e_src.append(url)
            e_dst.append(dst)
            e_sh.append(host_name(h))
            e_dh.append(dst.split("://", 1)[1].split("/", 1)[0])
    meta = pa.table(
        {
            "url": pa.array(m_url, pa.string()),
            "host": pa.array(m_host, pa.string()),
            "status": pa.array(m_status, pa.int32()),
            "location": pa.array(m_loc, pa.string()),
            "allowed": pa.array(m_allowed, pa.bool_()),
            "text": pa.array(m_text, pa.string()),
        }
    )
    edges = pa.table(
        {
            "src": pa.array(e_src, pa.string()),
            "dst": pa.array(e_dst, pa.string()),
            "src_host": pa.array(e_sh, pa.string()),
            "dst_host": pa.array(e_dh, pa.string()),
        }
    )
    return meta, edges


def write_oracle(out_dir: str, n_hosts: int, pages_per_host: int,
                 out_degree: int = 8, seed: int = 0, body_blocks: int = 1,
                 use_ray: bool | None = None) -> str:
    """Write meta/ and edges/ Parquet dirs under ``out_dir`` (idempotent
    via _SUCCESS).  Small webs are generated driver-side (no Ray — the
    oracle SQL path must work before/without a Ray session); large webs
    go through Ray Data."""
    import pyarrow.parquet as _pq

    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        _write_host_pr(out_dir)  # backfill for pre-existing oracle dirs
        _write_anchors(out_dir, n_hosts, pages_per_host, out_degree, seed)
        return out_dir
    total = n_hosts * pages_per_host
    if use_ray is None:
        use_ray = total > 200_000
    # pid-unique staging dir + one atomic rename: two concurrent query
    # processes must not both write into out_dir (the Ray path would
    # union-double every row; the driver path would expose half-written
    # part files to the winner's readers)
    tmp_dir = f"{out_dir}.tmp{os.getpid()}"
    os.makedirs(os.path.join(tmp_dir, "meta"), exist_ok=True)
    os.makedirs(os.path.join(tmp_dir, "edges"), exist_ok=True)
    if not use_ray:
        meta, edges = oracle_tables(
            np.arange(total), n_hosts, pages_per_host, out_degree, seed, body_blocks
        )
        _pq.write_table(meta, os.path.join(tmp_dir, "meta", "part-0.parquet"))
        _pq.write_table(edges, os.path.join(tmp_dir, "edges", "part-0.parquet"))
    else:
        import ray.data as rd

        ds = rd.range(total, override_num_blocks=max(4, total // 50_000))

        def gen_meta(batch: pa.Table) -> pa.Table:
            return oracle_tables(batch.column("id").to_numpy(), n_hosts,
                                 pages_per_host, out_degree, seed, body_blocks)[0]

        def gen_edges(batch: pa.Table) -> pa.Table:
            return oracle_tables(batch.column("id").to_numpy(), n_hosts,
                                 pages_per_host, out_degree, seed, body_blocks)[1]

        ds.map_batches(gen_meta, batch_format="pyarrow").write_parquet(
            os.path.join(tmp_dir, "meta")
        )
        ds.map_batches(gen_edges, batch_format="pyarrow").write_parquet(
            os.path.join(tmp_dir, "edges")
        )
    _write_host_pr(tmp_dir)
    _write_anchors(tmp_dir, n_hosts, pages_per_host, out_degree, seed)
    open(os.path.join(tmp_dir, "_SUCCESS"), "w").close()
    try:
        os.rename(tmp_dir, out_dir)
    except OSError:
        import shutil

        if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
            shutil.rmtree(tmp_dir, ignore_errors=True)  # lost to a winner
        else:
            # stale marker-less dir from a crashed pre-rename run
            shutil.rmtree(out_dir, ignore_errors=True)
            os.rename(tmp_dir, out_dir)
    return out_dir


def _write_anchors(out_dir: str, n_hosts: int, pages_per_host: int,
                   out_degree: int = 8, seed: int = 0):
    """Closed-form anchors table (src, dst, anchor) under ``anchors/``
    — idempotent (skips if present) so pre-existing oracle dirs
    backfill on the next web_oracle call, like ``_write_host_pr``.
    Generated in bounded id chunks driver-side: the oracle dirs exist
    only at comparison scale (sf0.01), where the table is
    out_degree × pages rows."""
    import pyarrow.parquet as _pq

    dest = os.path.join(out_dir, "anchors")
    if os.path.exists(os.path.join(dest, "part-0.parquet")):
        return
    total = n_hosts * pages_per_host
    parts = [
        anchors_table(np.arange(lo, min(lo + 100_000, total)),
                      n_hosts, pages_per_host, out_degree, seed)
        for lo in range(0, total, 100_000)
    ]
    os.makedirs(dest, exist_ok=True)
    _pq.write_table(pa.concat_tables(parts),
                    os.path.join(dest, "part-0.parquet"))


def _write_host_pr(out_dir: str):
    """Analytic host-PageRank table (host, rank_bp) derived from the
    closed-form edges table — an independent derivation of the graph
    the engine builds by parsing HTML (ops.graph.host_pagerank), with
    the identical deterministic rank arithmetic applied to both
    (graph.pr_ranks determinism contract)."""
    import pyarrow.parquet as _pq

    dest = os.path.join(out_dir, "host_pr")
    if os.path.exists(os.path.join(dest, "part-0.parquet")):
        return
    import pyarrow.dataset as _pds

    from .ops.graph import host_pr_table

    edges = _pds.dataset(os.path.join(out_dir, "edges")).to_table(
        columns=["src_host", "dst_host"]
    )
    import polars as _pl

    df = (
        _pl.from_arrow(edges)
        .group_by(["src_host", "dst_host"])
        .agg(_pl.len().cast(_pl.Int64).alias("weight"))
        .sort(["src_host", "dst_host"])
    )
    t = host_pr_table(df["src_host"].to_list(), df["dst_host"].to_list(),
                      df["weight"].to_numpy())
    os.makedirs(dest, exist_ok=True)
    _pq.write_table(t, os.path.join(dest, "part-0.parquet"))


def seeds_for(n_hosts: int, n_seeds: int = 4) -> list[str]:
    """Deterministic seed list: page 0 of evenly spaced hosts."""
    step = max(1, n_hosts // n_seeds)
    return [page_url(h, 0) for h in range(0, n_hosts, step)][:n_seeds]
