"""Windowed / streaming-style operators over event tables.

The reference has no window operators (its streaming semantics are the
politeness rate limits, SURVEY §2.9); these are the custom operators
the rebuild spec calls for when Ray Data lacks them: expressed as
``groupby(key).map_groups`` over per-key sorted groups — the partition
assumption (all rows of one key in one group) is exactly Ray's hash
shuffle guarantee.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa


def sessionize(ds, gap_ms: int = 60_000, key: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id"):
    """Gap-based sessionization: per key, events ordered by (ts, id);
    a new session starts when the gap to the previous event exceeds
    ``gap_ms``. Returns (id_col, key, session_id) with session ids
    numbered 1.. per key in time order.
    """

    def per_key(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group).sort([ts_col, id_col])
        ts = df[ts_col].cast(pl.Int64).to_numpy() // 1000  # us -> ms
        new = np.ones(len(ts), dtype=np.int64)
        if len(ts) > 1:
            new[1:] = (np.diff(ts) > gap_ms).astype(np.int64)
        sess = np.cumsum(new)
        return pa.table(
            {
                id_col: df[id_col].to_arrow(),
                key: df[key].to_arrow(),
                "session_id": pa.array(sess),
            }
        )

    return ds.groupby(key).map_groups(per_key, batch_format="pyarrow")


def session_stats(ds, gap_ms: int = 60_000, key: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id"):
    """Per-key session summary: number of sessions and the largest
    session length (event count)."""
    sess = sessionize(ds, gap_ms, key, ts_col, id_col)

    def agg(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        out = df.group_by(key).agg(
            pl.col("session_id").max().alias("n_sessions"),
            pl.col("session_id").value_counts().struct.field("count").max()
            .cast(pl.Int64).alias("max_session_events"),
        )
        return out.to_arrow()

    return sess.groupby(key).map_groups(agg, batch_format="pyarrow")
