"""Spam term counting + model scoring — the SpamTextProcessor /
SpamDetector rebuild.

The reference counts occurrences of a fixed term->id map over extracted
text, accumulates counts per scheme+authority, and periodically scores
the host with a serialized model (parser/SpamTextProcessor.java:36-106,
frontier/VisitState.java:440-452, spam/SpamDetector.java). Here:

- term counting is a vectorized ``map_batches`` (polars token match);
- per-key accumulation is a ``groupby`` over pre-combined partials;
- scoring is an actor-pool stage (model "loaded" once per actor in
  ``__init__`` — the classic stateful-stage shape; the model here is a
  deterministic logistic stub, the plumbing is the real thing).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

# fixed term -> id map (TermMap analogue); single source of truth for
# the SQL oracle in __ray_entry__
SPAM_TERMS = ("data", "join", "query", "slow", "fast")


def term_count_batch(batch: pa.Table, key: str = "doc_id") -> pa.Table:
    """(key, text) -> per-row counts of each spam term (token-equality,
    lowercased — SpamTextProcessor matches whole terms)."""
    df = pl.from_arrow(batch.select([key, "text"]))
    toks = pl.col("text").str.to_lowercase().str.extract_all(r"\S+")
    exprs = [pl.col(key)]
    for t in SPAM_TERMS:
        exprs.append(
            toks.list.eval(pl.element() == t).list.sum().fill_null(0)
            .cast(pl.Int64).alias(f"n_{t}")
        )
    exprs.append(pl.col("text").str.len_chars().cast(pl.Int64).alias("n_chars"))
    return df.select(exprs).to_arrow()


def host_term_counts(ds, key: str = "source"):
    """Accumulate term counts per key (the per-VisitState
    Short2ShortOpenHashMap accumulation, VisitState.java:440-452)."""
    from ray.data.aggregate import Sum

    cols = [f"n_{t}" for t in SPAM_TERMS] + ["n_chars"]
    g = (
        ds.map_batches(lambda b: term_count_batch(b, key), batch_format="pyarrow")
        .groupby(key)
        .aggregate(*[Sum(c) for c in cols])
    )

    def rename(t: pa.Table) -> pa.Table:
        out = {key: t.column(key)}
        for c in cols:
            out[c] = t.column(f"sum({c})")
        return pa.table(out)

    return g.map_batches(rename, batch_format="pyarrow")


class SpamScorer:
    """Actor-pool scoring stage: model weights load once per actor.

    Score = floor(10000 * total_term_hits / total_chars) — a
    deterministic, SQL-checkable stand-in for SpamDetector.estimate();
    swap ``self.weights`` for a real serialized model in production.
    """

    def __init__(self):
        # per-actor init: deserialize the model once (RuntimeConfiguration
        # .java:392-397 loads the SpamDetector from a URI at startup)
        self.weights = {t: 1.0 for t in SPAM_TERMS}

    def __call__(self, batch: pa.Table) -> pa.Table:
        hits = np.zeros(batch.num_rows, dtype=np.float64)
        for t in SPAM_TERMS:
            hits += self.weights[t] * batch.column(f"n_{t}").to_numpy()
        chars = batch.column("n_chars").to_numpy().astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            score = np.floor(10000.0 * hits / chars)
        score = np.where(np.isfinite(score), score, 0).astype(np.int64)
        return batch.append_column("spam_score_bp", pa.array(score))


def spam_scores(ds, key: str = "source", concurrency: int = 2):
    """Full pipeline: count -> accumulate per key -> score (actor pool)."""
    return host_term_counts(ds, key).map_batches(
        SpamScorer, batch_format="pyarrow", concurrency=concurrency
    )
