"""Shard-resumable pipeline writer: crash -> rerun resumes, output
equals the single-pass result, finished shards are not recomputed."""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bubing_ray.pipelines.resume import resumable_write, shard_files


def _write_inputs(tmp_path, n_files=6, rows=40):
    files = []
    for f in range(n_files):
        t = pa.table({
            "doc_id": pa.array(range(f * rows, (f + 1) * rows),
                               type=pa.int64()),
            "text": [f"doc {f}-{i} body words" for i in range(rows)],
        })
        p = str(tmp_path / f"in-{f}.parquet")
        pq.write_table(t, p)
        files.append(p)
    return files


def _transform(ds):
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda b: b.append_column(
            "n_chars", pc.utf8_length(b.column("text"))),
        batch_format="pyarrow")


def test_resumable_write_crash_then_resume(ray_session, tmp_path):
    import ray

    files = _write_inputs(tmp_path)
    out = str(tmp_path / "out")

    calls = {"n": 0}

    def failing_transform(ds):
        calls["n"] += 1
        if calls["n"] == 2:  # crash while running the second shard
            raise RuntimeError("injected crash")
        return _transform(ds)

    with pytest.raises(RuntimeError):
        resumable_write(files, out, failing_transform, shard_size=2)
    done = os.listdir(os.path.join(out, "_markers"))
    assert len(done) == 1  # only shard 0 completed

    # resume: shard 0 skipped, shards 1-2 run
    st = resumable_write(files, out, _transform, shard_size=2)
    assert st == {"shards": 3, "ran": 2, "skipped": 1}

    got = (ray.data.read_parquet(out)
        .to_pandas().sort_values("doc_id").reset_index(drop=True))
    expect = (_transform(ray.data.read_parquet(files))
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got.equals(expect)

    # idempotent: everything skips on a third run
    st2 = resumable_write(files, out, _transform, shard_size=2)
    assert st2 == {"shards": 3, "ran": 0, "skipped": 3}


def test_shard_files_deterministic():
    s = shard_files(["c", "a", "b", "d", "e"], 2)
    assert s == [["a", "b"], ["c", "d"], ["e"]]
