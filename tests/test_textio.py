"""JSONL / CSV interchange: round-trip fidelity on adversarial text
(embedded newlines, quotes, delimiters, unicode), column projection,
and the fixture-backed ingest queries."""

import os
import sys

import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bubing_ray.sources import textio

NASTY = [
    "plain ascii",
    "two\nlines\nof text",
    'quo"ted and, comma; semi',
    "tab\tseparated\tfields",
    "unicodé — ünïcode ✓ 中文 🎉",
    "",
    'all of it: "a,b"\n\t— ok',
    "trailing newline\n",
]


def _table():
    return pa.table({
        "doc_id": pa.array(range(len(NASTY)), type=pa.int64()),
        "text": pa.array(NASTY),
        "n": pa.array([len(t) for t in NASTY], type=pa.int64()),
    })


def _roundtrip(ray_session, tmp_path, write, read):
    import ray

    src = _table()
    out = str(tmp_path / "shards")
    write(ray.data.from_arrow(src).repartition(3), out)
    got = read(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = src.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["doc_id", "text", "n"]],
                                  want[["doc_id", "text", "n"]])


def test_jsonl_roundtrip_nasty_text(ray_session, tmp_path):
    _roundtrip(ray_session, tmp_path, textio.write_jsonl, textio.read_jsonl)


def test_csv_roundtrip_nasty_text(ray_session, tmp_path):
    """Quoted newlines/quotes/commas in text fields must survive the
    CSV cycle (newlines_in_values on the read side)."""
    _roundtrip(ray_session, tmp_path, textio.write_csv, textio.read_csv_text)


def test_read_projection(ray_session, tmp_path):
    import ray

    out = str(tmp_path / "p")
    textio.write_jsonl(ray.data.from_arrow(_table()), out)
    ds = textio.read_jsonl(out, columns=["doc_id", "n"])
    assert set(ds.schema().names) == {"doc_id", "n"}
    assert ds.count() == len(NASTY)


def test_ingest_queries_match_documents(ray_session):
    """jsonl_ingest / csv_ingest recompute n_chars from the decoded
    text; both must equal the source parquet's own n_chars column."""
    import pyarrow.parquet as pq

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    src = pq.read_table(os.path.join(sf, "documents.parquet")).to_pandas()
    want = src[["doc_id", "n_chars"]].sort_values("doc_id").reset_index(drop=True)
    for name in ("jsonl_ingest", "csv_ingest"):
        got = (e.queries()[name](sf).to_pandas()
               [["doc_id", "n_chars"]]
               .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
