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


class LogisticModel:
    """Serializable linear model over term-density features — the
    SpamDetector analogue (spam/SpamDetector.java: a linear classifier
    over the term-frequency vector, deserialized once at startup).

    Features: per-term counts normalized by character count.  Training
    is plain batch gradient descent (numpy) — enough to fit real labels
    offline and ship the weights as JSON.
    """

    def __init__(self, weights: np.ndarray, bias: float = 0.0,
                 terms: tuple = SPAM_TERMS):
        self.terms = tuple(terms)
        self.w = np.asarray(weights, dtype=np.float64)
        self.b = float(bias)
        assert len(self.w) == len(self.terms)

    # -- inference -----------------------------------------------------------
    @staticmethod
    def features(counts: np.ndarray, chars: np.ndarray) -> np.ndarray:
        """counts (n, k) + chars (n,) -> density features (n, k)."""
        denom = np.maximum(chars.astype(np.float64), 1.0)[:, None]
        return 1000.0 * counts.astype(np.float64) / denom

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        z = X @ self.w + self.b
        return 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))

    # -- training ------------------------------------------------------------
    @classmethod
    def train(cls, X: np.ndarray, y: np.ndarray, *, lr: float = 0.1,
              iters: int = 2000, l2: float = 1e-4,
              terms: tuple = SPAM_TERMS) -> "LogisticModel":
        w = np.zeros(X.shape[1])
        b = 0.0
        yf = y.astype(np.float64)
        for _ in range(iters):
            p = 1.0 / (1.0 + np.exp(-np.clip(X @ w + b, -30, 30)))
            g = p - yf
            w -= lr * (X.T @ g / len(yf) + l2 * w)
            b -= lr * float(g.mean())
        return cls(w, b, terms)

    # -- serialization (the model-from-URI load path) ------------------------
    def to_json(self) -> str:
        import json

        return json.dumps(
            {"terms": list(self.terms), "weights": self.w.tolist(), "bias": self.b}
        )

    @classmethod
    def from_json(cls, s: str) -> "LogisticModel":
        import json

        d = json.loads(s)
        return cls(np.array(d["weights"]), d["bias"], tuple(d["terms"]))

    def save(self, path: str):
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "LogisticModel":
        with open(path) as f:
            return cls.from_json(f.read())


class SpamScorer:
    """Actor-pool scoring stage: the model loads ONCE per actor in
    ``__init__`` (RuntimeConfiguration.java:392-397 deserializes the
    SpamDetector from a URI at startup), work happens per batch.

    Always emits the SQL-checkable density ratio ``spam_score_bp`` =
    floor(10000 * total_term_hits / total_chars); when constructed with
    a model path it additionally emits ``spam_prob_bp`` =
    floor(10000 * P(spam)) from the logistic model.
    """

    def __init__(self, model_path: str | None = None):
        self.weights = {t: 1.0 for t in SPAM_TERMS}
        self.model = LogisticModel.load(model_path) if model_path else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = np.stack(
            [batch.column(f"n_{t}").to_numpy() for t in SPAM_TERMS], axis=1
        )
        hits = counts.astype(np.float64) @ np.array(
            [self.weights[t] for t in SPAM_TERMS]
        )
        chars = batch.column("n_chars").to_numpy().astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            score = np.floor(10000.0 * hits / chars)
        score = np.where(np.isfinite(score), score, 0).astype(np.int64)
        out = batch.append_column("spam_score_bp", pa.array(score))
        if self.model is not None:
            p = self.model.predict_proba(
                LogisticModel.features(counts, chars)
            )
            out = out.append_column(
                "spam_prob_bp", pa.array(np.floor(10000.0 * p).astype(np.int64))
            )
        return out


def spam_scores(ds, key: str = "source", concurrency: int = 2,
                model_path: str | None = None):
    """Full pipeline: count -> accumulate per key -> score (actor pool)."""
    return host_term_counts(ds, key).map_batches(
        SpamScorer, fn_constructor_args=(model_path,),
        batch_format="pyarrow", concurrency=concurrency,
    )
