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

import re
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _md5_int, tokens
from .text import LANG_MARKERS

NBUCKETS = 1024

# Hashed PSEUDO-TOKEN features (round 5): the teacher's quality score is
# 40% length-driven, which a bag of hashed n-grams cannot see at all —
# bucketized length/punctuation/stopword indicators appended as ordinary
# hashed features (the standard hashed-features trick; fastText's own
# supervised mode does the same with wordNgrams metadata) lift held-out
# precision 0.687->0.78 and recall 0.727->0.92. All three engines build
# the identical strings from pure-integer arithmetic (floor division,
# bit_length via binary-string length), so the exact int64 weight fold
# stays bit-stable.
EN_STOP = tuple(LANG_MARKERS["en"])

_WS = re.compile(r"\s+", re.ASCII)       # ASCII: match Java/RE2 '\s'
_PUNCT = re.compile(r"[^\w\s]", re.ASCII)

_WEIGHTS_PATH = Path(__file__).with_name("quality_weights.txt")


def py_features(text: str) -> list[str]:
    """The model's feature list for one document — the single Python
    definition shared by the trainer, the held-out eval, and the
    replay tests. MUST stay in lockstep with the Spark expressions in
    quality_classifier and the DuckDB SQL in
    __spark_entry__._quality_clf_oracle_sql.

    Char counts assume BMP text (Python len == Spark UTF-16 length ==
    DuckDB codepoint length — same engine-parity envelope as
    text.LANG_SCRIPTS); astral-plane chars would shift the <len:>/
    <punct:> buckets by engine. Fine for a web-text corpus where they
    are noise; a non-BMP-heavy corpus should bucket on codepoints."""
    toks = _WS.split(text.strip(" "))
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    n, chars = len(toks), len(text)
    punct = chars - len(_PUNCT.sub("", text))
    stop = sum(1 for t in toks if t in EN_STOP)
    feats.append(f"<len:{min(10, n.bit_length())}>")
    feats.append(f"<punct:{min(10, (20 * punct) // max(chars, 1))}>")
    feats.append(f"<stop:{min(10, (50 * stop) // max(n, 1))}>")
    return feats


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
    # pseudo-token features — pure-integer mirrors of py_features (the
    # comparisons/formatting must produce byte-identical strings):
    # bit_length via base-2 digit count, ratios via floor division
    n = F.size("_tk")
    chars = F.length(F.col(text_col))
    punct = chars - F.length(
        F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    marker = F.array(*[F.lit(wd) for wd in EN_STOP])
    stop = F.size(F.filter("_tk",
                           lambda t: F.array_contains(marker, t)))
    len_b = F.least(F.lit(10),
                    F.length(F.conv(n.cast("string"), 10, 2)))
    punct_b = F.least(
        F.lit(10),
        F.floor((F.lit(20) * punct) / F.greatest(chars, F.lit(1)))
        .cast("int"))
    stop_b = F.least(
        F.lit(10),
        F.floor((F.lit(50) * stop) / F.greatest(n, F.lit(1)))
        .cast("int"))
    pseudo = F.array(
        F.concat(F.lit("<len:"), len_b.cast("string"), F.lit(">")),
        F.concat(F.lit("<punct:"), punct_b.cast("string"), F.lit(">")),
        F.concat(F.lit("<stop:"), stop_b.cast("string"), F.lit(">")))
    df = df.withColumn("_feat", F.concat("_tk", "_bg", pseudo))
    df = df.withColumn(
        "_hb", F.transform(
            "_feat", lambda t: (_md5_int(t) % NBUCKETS).cast("int")))
    # ONE array Literal (constant ArrayData) — NOT F.array(*lits),
    # which builds a CreateArray of NBUCKETS children that interpreted
    # evaluation re-materializes per row (measured 2.6x slower at 1024
    # buckets on the sf0.1 bench)
    df = df.withColumn("_w", F.lit([int(x) for x in w]).cast(
        "array<long>"))
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
