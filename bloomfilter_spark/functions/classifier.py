"""Hashed linear text classifier scoring — the fastText-shaped quality
gate of Common-Crawl pipelines (CCNet / GPT-3 / LLaMA data work), as a
map-only Catalyst plan.

Model: logit = (Σ_tokens W[h(token) mod dim]) / (n_tokens · S) — a hashed
bag-of-words linear model with mean pooling.  The scoring plumbing (the
part that must scale to 100 TB) is pure whole-stage-codegen: tokenize →
transform() each token through the weight lookup → aggregate() the array.
No shuffle, no Python, filters push down around it.

Weights are INTEGER (quantized to S = 2^20 steps) and summed exactly in
int64, so the score is independent of summation order and an external SQL
engine replays it bit-for-bit — float dot products would differ in the
last ulp across engines.  21 bits/weight × 10⁴-token docs stays far from
int64 overflow (needs > 2^43 tokens/doc).

Two weight sources:
- default: pseudo-weights derived per bucket from the library's md5 rule
  (`W[j] = md5_60("w:<salt>:<j>") mod 2^21 − 2^20`) — a deterministic
  stand-in with the exact production plan shape; a trained model drops in
  by quantizing its weights the same way;
- explicit: a python list of int weights (≤ ~4k dims as an array literal;
  larger models should broadcast-join a (bucket, weight) table instead —
  same topology as the BM25 stats sidecar).

Reference analog: none (out of the reference's sketch scope) — part of
the training-data pipeline surface the driver brief mandates, built on
the cross-engine hash rule of functions/hashing.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from bloomfilter_spark.functions.hashing import md5_hash60
from bloomfilter_spark.functions.textstats import tokens_nonempty

_SCALE = 1 << 20  # weight quantization: values in [-2^20, 2^20)
_WSPACE = 1 << 21


def _pseudo_weight(bucket: Column, salt: str) -> Column:
    key = F.concat(F.lit(f"w:{salt}:"), bucket.cast("string"))
    return F.pmod(md5_hash60(key), F.lit(_WSPACE)) - F.lit(_SCALE)


def classifier_scores(
    df: DataFrame,
    text_col: str,
    dim: int = 1024,
    weights: list[int] | None = None,
    salt: str = "0",
    threshold: float = 0.0,
) -> DataFrame:
    """Append `n_tokens`, `logit`, `keep` columns.

    `weights`: optional explicit int weights (len == dim, each in
    [-2^20, 2^20)); default is the deterministic md5 pseudo-model.
    `keep` ⇔ logit > threshold, decided on the EXACT integer sum
    (threshold re-scaled into integer space), so the gate never flips on
    float rounding.
    """
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    if weights is not None:
        if len(weights) != dim:
            raise ValueError(f"weights has {len(weights)} entries, dim is {dim}")
        if any(not (-_SCALE <= w < _SCALE) for w in weights):
            raise ValueError(f"weights must lie in [-{_SCALE}, {_SCALE})")

    toks = tokens_nonempty(F.col(text_col))
    bucket = lambda t: F.pmod(md5_hash60(t), F.lit(dim))  # noqa: E731
    if weights is None:
        wq = lambda t: _pseudo_weight(bucket(t), salt)  # noqa: E731
    else:
        warr = F.array(*[F.lit(int(w)).cast("long") for w in weights])
        wq = lambda t: F.element_at(warr, (bucket(t) + 1).cast("int"))  # noqa: E731

    raw = F.aggregate(
        F.transform(toks, wq), F.lit(0).cast("long"), lambda a, x: a + x
    )
    # NULL text → NULL token array under ANSI semantics; a null-text doc
    # scores like an empty one (n=0, logit 0, keep false), matching the
    # SQL oracle's COALESCE
    n = F.coalesce(F.size(toks), F.lit(0))
    out = df.withColumn("__n", n).withColumn("__raw", raw)
    logit = F.when(
        F.col("__n") > 0,
        F.col("__raw").cast("double") / (F.col("__n") * F.lit(float(_SCALE))),
    ).otherwise(F.lit(0.0))
    # integer-exact gate: logit > thr  ⇔  raw > thr·n·S
    keep = F.when(F.col("__n") > 0, F.col("__raw") > F.col("__n") * F.lit(threshold * _SCALE)).otherwise(F.lit(False))
    return (
        out.withColumn("n_tokens", F.col("__n"))
        .withColumn("logit", logit)
        .withColumn("keep", keep)
        .drop("__n", "__raw")
    )
