"""JSONL / CSV corpus interchange readers and writers.

Newline-delimited JSON is the wire format of the public web-text
corpora a training-data pipeline ingests (Dolma, RedPajama, the
Common-Crawl derivative dumps all ship ``.jsonl[.gz]`` shards); CSV
covers relational side tables.  The reference's only interchange is
its own WARC variant (warc/io/WarcReader.java:1 — covered by
sources/warc.py); these wrappers close the gap a user switching a
real pipeline onto this repo hits first.

Scale shape:

- Reads stream per-file Arrow blocks — Ray parallelizes across files,
  and a 100 TB dump is tens of thousands of shard files, so file-level
  parallelism is the right grain.  Unlike Parquet, JSON/CSV cannot
  prune columns inside the read task, so ``columns=`` projects
  immediately after parse: only the asked-for columns ever enter the
  object store.
- Writes shard one file per block (``Dataset.write_json`` /
  ``write_csv``) — resumable partitioned output, never one giant file.
- CSV text fields may legally contain quoted newlines (web text does);
  ``read_csv_text`` turns on ``newlines_in_values`` so a document with
  paragraph breaks round-trips instead of shearing the parse.
"""

from __future__ import annotations

import ray


def read_jsonl(paths, *, columns: list[str] | None = None, **ray_args):
    """Stream newline-delimited JSON shard files into a Dataset.

    ``columns`` projects right after the parse (JSON has no read-side
    pruning); extra ``ray_args`` pass through to
    :func:`ray.data.read_json` (e.g. ``override_num_blocks``).
    """
    ds = ray.data.read_json(paths, **ray_args)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_jsonl(ds, path: str, **ray_args) -> None:
    """Shard ``ds`` into one ``.json`` (ndjson) file per block under
    ``path`` — the resumable partitioned layout every sink in this repo
    uses."""
    ds.write_json(path, **ray_args)


def read_csv_text(paths, *, columns: list[str] | None = None,
                  newlines_in_values: bool = True, **ray_args):
    """Stream CSV shard files into a Dataset, safe for text columns.

    ``newlines_in_values=True`` lets quoted fields carry embedded
    newlines (multi-paragraph documents) — without it the Arrow parser
    shears the file mid-record.  ``columns`` projects after parse.
    """
    from pyarrow import csv as pacsv

    parse_options = pacsv.ParseOptions(newlines_in_values=newlines_in_values)
    ds = ray.data.read_csv(paths, parse_options=parse_options, **ray_args)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_csv(ds, path: str, **ray_args) -> None:
    """Shard ``ds`` into one ``.csv`` file per block under ``path``
    (Arrow writer: fields with delimiters/newlines/quotes are
    quoted, so text round-trips byte-exactly)."""
    ds.write_csv(path, **ray_args)
