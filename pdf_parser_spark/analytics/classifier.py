"""Model-based quality classification (fastText/DCLM-style).

Modern pretraining pipelines (CCNet, DCLM, FineWeb) filter web text with
a FAST linear classifier over hashed n-gram features — cheap enough to
score every page of a crawl, trained to imitate a more expensive quality
signal. This module scores documents with such a model whose weights are
committed in ``quality_weights.txt`` (trained deterministically by
``tools/train_quality_clf.py`` against the repo's own heuristic
quality_score as the teacher).

Scoring is a PURE PROJECTION — tokenize, hash unigrams+bigrams into
NBUCKETS buckets, sum the bucket weights, one division — zero shuffles,
zero Python UDFs, and the whole thing pushes through a single
whole-stage-codegen-adjacent select. Weights are integer micro-units so
the feature sum is an exact int64 fold (order-free), making the rounded
logit bit-identical between Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _md5_int, tokens

NBUCKETS = 256

_WEIGHTS_PATH = Path(__file__).with_name("quality_weights.txt")


def load_weights() -> tuple[int, list[int]]:
    """(bias_micro, weights_micro[NBUCKETS]) from the committed table."""
    vals = [int(x) for x in _WEIGHTS_PATH.read_text().split()]
    bias, w = vals[0], vals[1:]
    if len(w) != NBUCKETS:
        raise ValueError(
            f"quality_weights.txt has {len(w)} weights, expected {NBUCKETS}")
    return bias, w


def quality_classifier(docs: DataFrame,
                       text_col: str = "text") -> DataFrame:
    """Score documents with the committed hashed-ngram linear model.

    Output per doc: ``n_features`` (unigrams + bigrams), ``logit``
    (6-dp; bias + mean feature weight, micro-units scaled back), and
    ``label`` (logit > 0 — "keep" under the median-split teacher).

    Plan shape for 100 TB: the model IS the query literal — no join, no
    broadcast table, no shuffle; every row is scored map-side in one
    pass. The weight array is materialized once per row into its own
    column so the fold lambda only touches attributes (interpreted HOFs
    re-evaluate referenced EXPRESSIONS per element — see the dedup
    module's PERF invariants)."""
    bias, w = load_weights()
    df = docs.withColumn("_tk", tokens(F.col(text_col)))
    m = F.size("_tk") - 1
    bg = F.when(m >= 1, F.zip_with(
        F.slice("_tk", 1, F.greatest(m, F.lit(1))),
        F.slice("_tk", 2, F.greatest(m, F.lit(1))),
        lambda a, b: F.concat(a, F.lit(" "), b))) \
        .otherwise(F.array().cast("array<string>"))
    df = df.withColumn("_bg", bg)
    df = df.withColumn("_feat", F.concat("_tk", "_bg"))
    df = df.withColumn(
        "_hb", F.transform(
            "_feat", lambda t: (_md5_int(t) % NBUCKETS).cast("int")))
    df = df.withColumn(
        "_w", F.array(*[F.lit(int(x)).cast("long") for x in w]))
    s = F.aggregate(
        "_hb", F.lit(0).cast("long"),
        lambda acc, h: acc + F.element_at(F.col("_w"), h + 1))
    df = df.withColumn("_s", s).withColumn("_n", F.size("_feat"))
    logit = F.round(
        (F.lit(float(bias)) + F.col("_s") / F.col("_n")) / 1e6, 6)
    return df.select(
        "doc_id",
        F.col("_n").cast("long").alias("n_features"),
        logit.alias("logit"),
        (logit > 0).alias("label"))
