"""Seed reader — RuntimeConfiguration's seed iterator rebuilt.

The reference accepts seed URLs as config literals or ``file:`` line
files, silently skipping invalid/relative entries
(RuntimeConfiguration.java:285-293,402-427; consumed at
Agent.java:123-127). Here a seed source is a list of literals, a local
text file (one URL per line, '#' comments), or a directory of such
files; parsing + canonicalization is the vectorized BURL batch kernel.

For web-scale seed lists (billions of URLs) use ``seed_dataset`` — a
streaming ``ray.data.read_text -> map_batches(canonicalize)`` pipeline
whose output feeds the sieve shards directly without ever collecting
to the driver.
"""

from __future__ import annotations

import os

import pyarrow as pa

from .. import burl


def _absolute_only(urls: pa.Array) -> pa.Array:
    """Drop relative results — the reference skips seeds whose parse is
    not an absolute URI (RuntimeConfiguration.java:420-424)."""
    import pyarrow.compute as pc

    m = pc.match_substring_regex(pc.fill_null(urls, ""), r"^[a-z][a-z0-9+.-]*://")
    return urls.filter(m)


def _canonicalize_lines(batch: pa.Table) -> pa.Table:
    lines = batch.column("text")
    import pyarrow.compute as pc

    keep = pc.invert(pc.starts_with(pc.utf8_trim_whitespace(lines), "#"))
    urls = burl.canonicalize_batch(lines.filter(keep))
    return pa.table({"url": _absolute_only(urls)}).drop_null()


def read_seeds(source: str | list[str]) -> list[str]:
    """Canonical seed URLs from literals, a file, or a directory.

    Invalid entries are dropped (the reference logs-and-skips,
    RuntimeConfiguration.java:420-424). Driver-side list — seed configs
    are small; use seed_dataset for bulk injection.
    """
    if isinstance(source, list):
        lines = source
    elif os.path.isdir(source):
        lines = []
        for f in sorted(os.listdir(source)):
            with open(os.path.join(source, f)) as fh:
                lines.extend(fh.read().splitlines())
    else:
        with open(source) as fh:
            lines = fh.read().splitlines()
    lines = [l.strip() for l in lines if l.strip() and not l.strip().startswith("#")]
    if not lines:
        return []
    urls = _absolute_only(
        burl.canonicalize_batch(pa.array(lines, pa.string())).drop_null()
    )
    out, seen = [], set()
    for u in urls.to_pylist():
        if u not in seen:
            seen.add(u)
            out.append(u)
    return out


def seed_dataset(paths: str | list[str]):
    """Streaming seed pipeline for bulk lists: Dataset of canonical
    ``url`` rows (invalid lines dropped), never materialized on the
    driver."""
    import ray

    ds = ray.data.read_text(paths)

    def canon(batch: pa.Table) -> pa.Table:
        return _canonicalize_lines(batch)

    return ds.map_batches(canon, batch_format="pyarrow")
