"""Shard-resumable pipeline runner: the "resumable output" leg of the
100 TB design (BUbiNG's store is per-round-dir resumable —
frontier/crawl.py:19 — this gives every corpus pipeline the same
property).

Input parquet files are grouped into shards; each shard runs
``read_parquet(shard files) -> transform(ds) -> write_parquet(
out_dir/shard-<i>)`` and then atomically drops a marker file (tmp file
+ ``os.rename``, so a crash mid-marker-write never leaves a marker
that claims a finished shard).  A rerun skips marked shards, so a
failed multi-hour job resumes at shard granularity instead of
restarting; a crash mid-shard leaves no marker and the partial shard
directory is cleared before the rewrite.  Output is plain partitioned
parquet — ``ray.data.read_parquet(out_dir)`` reads the union: markers
live in ``out_dir/_markers``, which the parquet glob skips because
pyarrow/Ray ignore underscore-prefixed paths (the same convention that
hides ``_metadata``/``_SUCCESS`` files).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable, Sequence


def shard_files(files: Sequence[str], shard_size: int) -> list[list[str]]:
    """Deterministic grouping: sorted input, ``shard_size`` files per
    shard (the last may be short)."""
    fs = sorted(files)
    return [list(fs[i:i + shard_size]) for i in range(0, len(fs), shard_size)]


def resumable_write(files: Sequence[str], out_dir: str,
                    transform: Callable, *, shard_size: int = 16,
                    columns: Sequence[str] | None = None) -> dict:
    """Run ``transform(ray.data.Dataset) -> ray.data.Dataset`` over the
    input parquet ``files`` shard-by-shard with skip-finished resume.

    Returns {"shards": total, "ran": n_executed, "skipped": n_skipped}.
    """
    import ray

    shards = shard_files(files, shard_size)
    marker_dir = os.path.join(out_dir, "_markers")
    os.makedirs(marker_dir, exist_ok=True)
    ran = skipped = 0
    for i, shard in enumerate(shards):
        marker = os.path.join(marker_dir, f"shard-{i:05d}.done")
        shard_out = os.path.join(out_dir, f"shard-{i:05d}")
        if os.path.exists(marker):
            # a marker is only valid for the EXACT file list it
            # recorded: if the input set changed (new files sorted into
            # this shard's slice), skipping by index would silently
            # drop them — re-run the shard instead
            with open(marker) as f:
                recorded = [ln for ln in f.read().splitlines() if ln]
            if recorded == list(shard):
                skipped += 1
                continue
            os.remove(marker)
        # no marker => any existing output is a partial write; clear it
        shutil.rmtree(shard_out, ignore_errors=True)
        ds = ray.data.read_parquet(
            shard, **({"columns": list(columns)} if columns else {}))
        transform(ds).write_parquet(shard_out)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(shard))
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, marker)  # atomic: marker exists only if complete
        ran += 1
    # a shrunken input enumerates fewer shards than a prior run wrote:
    # stale higher-index outputs (and their markers) would otherwise
    # stay in the union that read_parquet(out_dir) returns
    stale = len(shards)
    while True:
        marker = os.path.join(marker_dir, f"shard-{stale:05d}.done")
        shard_out = os.path.join(out_dir, f"shard-{stale:05d}")
        if not os.path.exists(marker) and not os.path.isdir(shard_out):
            break
        if os.path.exists(marker):
            os.remove(marker)
        shutil.rmtree(shard_out, ignore_errors=True)
        stale += 1
    return {"shards": len(shards), "ran": ran, "skipped": skipped}
