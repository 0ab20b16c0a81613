"""Text analysis over (doc_id, text): language-ID features, quality
scoring, token counting, document fingerprinting. All JVM-side built-ins,
all DuckDB-expressible for the oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens, with_shingle_hashes

# Marker stopwords per language (tiny n-gram-free heuristic: function-word
# hit counts; deterministic and SQL-portable).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],  # romanized placeholders
}

# BPE-ish word/punct token regex (word runs OR single non-space symbol).
BPE_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def _hits(text_col, words: list[str]):
    marker = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(text_col),
                           lambda t: F.array_contains(marker, t)))


def lang_hit_exprs(text_col) -> dict[str, "F.Column"]:
    """Per-language marker-word hit-count expressions (pure
    projections — composable into a single select with other
    features)."""
    return {f"hits_{lang}": _hits(text_col, words)
            for lang, words in LANG_MARKERS.items()}


def lang_guess_expr(hit_cols: dict[str, "F.Column"]):
    """Argmax language over hit-count expressions (deterministic
    tie-break: alphabetical language order)."""
    best = F.greatest(*hit_cols.values())
    guess = None
    for lang in sorted(LANG_MARKERS):
        cond = hit_cols[f"hits_{lang}"] == best
        guess = F.when(cond, F.lit(lang)) if guess is None \
            else guess.when(cond, F.lit(lang))
    return guess


def lang_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc marker-word hit counts + argmax language guess."""
    hit_cols = lang_hit_exprs(F.col(text_col))
    out = docs.select("doc_id", *[c.alias(n) for n, c in hit_cols.items()])
    named = {n: F.col(n) for n in hit_cols}
    return out.select("doc_id", *named,
                      lang_guess_expr(named).alias("lang_guess"))


def quality_exprs(text_col) -> dict[str, "F.Column"]:
    """Quality-feature expressions (pure projections): token/char/
    stopword/punctuation counts, mean token length, composite score in
    [0,1] — composable into one select (single text pass)."""
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    stop = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    punct = n_chars - F.length(F.regexp_replace(text_col, r"[^\w\s]", ""))
    mean_tok = (n_chars - (n_tokens - 1)) / n_tokens
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_hits / F.greatest(n_tokens, F.lit(1)) * 10.0,
                  F.lit(1.0)) * 0.3
        + (1.0 - F.least(punct / F.greatest(n_chars, F.lit(1)) * 5.0,
                         F.lit(1.0))) * 0.3
    )
    return {
        "n_tokens": n_tokens,
        "stopword_hits": stop_hits,
        "punct_chars": punct,
        "mean_token_len": F.round(mean_tok, 6),
        "quality_score": F.round(score, 6),
    }


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / mean-token-length features and a
    composite score in [0,1] (web-corpus quality filtering)."""
    exprs = quality_exprs(F.col(text_col))
    return docs.select(
        "doc_id", *[c.alias(n) for n, c in exprs.items()])


def bpe_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish regex token counts."""
    return docs.select(
        "doc_id",
        F.size(tokens(F.col(text_col))).alias("ws_tokens"),
        F.size(F.regexp_extract_all(
            F.col(text_col), F.lit(BPE_RE), 0)).alias("bpe_tokens"),
    )


def repetition_features(docs: DataFrame,
                        text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals, fully expression-level
    (zero shuffles — every value comes from one projection):

    * top_bigram_frac — occurrences of the most frequent token bigram /
      total bigrams. The per-doc mode is computed WITHOUT a groupBy:
      sort the bigram array, then a single fold tracks the longest
      equal-run (run length in a sorted array == occurrence count).
    * dup_bigram_frac — 1 - distinct/total bigrams.
    * dup_trigram_frac — same over the rolling 3-gram shingle hashes.

    Docs too short for an n-gram get 0.0 for that feature."""
    toks = tokens(F.col(text_col))
    df = docs.withColumn("_tk", toks)
    m = F.size("_tk") - 1
    bg = F.when(m >= 1, F.zip_with(
        F.slice("_tk", 1, F.greatest(m, F.lit(1))),
        F.slice("_tk", 2, F.greatest(m, F.lit(1))),
        lambda a, b: F.concat(a, F.lit(" "), b))) \
        .otherwise(F.array().cast("array<string>"))
    df = df.withColumn("_bg", bg)          # multi-referenced: own column
    df = df.withColumn("_sbg", F.array_sort("_bg"))
    run = F.aggregate(
        "_sbg",
        F.struct(F.lit("\x00").alias("prev"), F.lit(0).alias("run"),
                 F.lit(0).alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1)).alias("run"),
            F.greatest(acc["best"],
                       F.when(x == acc["prev"], acc["run"] + 1)
                       .otherwise(F.lit(1))).alias("best")),
        lambda acc: acc["best"])
    total = F.size("_bg")
    top_frac = F.when(total > 0, run / total).otherwise(F.lit(0.0))
    dup_bg = F.when(
        total > 0,
        1.0 - F.size(F.array_distinct("_bg")) / total).otherwise(F.lit(0.0))
    df = with_shingle_hashes(df, text_col)   # 'sh': 3-gram hashes
    n_tok = F.size("_tk")
    tri_total = F.size("sh")
    dup_tri = F.when(
        n_tok >= 3,
        1.0 - F.size(F.array_distinct("sh")) / tri_total) \
        .otherwise(F.lit(0.0))
    return df.select(
        "doc_id",
        F.round(top_frac, 6).alias("top_bigram_frac"),
        F.round(dup_bg, 6).alias("dup_bigram_frac"),
        F.round(dup_tri, 6).alias("dup_trigram_frac"),
    )


def chunk_documents(docs: DataFrame, text_col: str = "text",
                    chunk_tokens: int = 128) -> DataFrame:
    """Training-data chunking: split each document into consecutive
    ``chunk_tokens``-token windows (no overlap), one output row per
    chunk. Pure per-row explode — no shuffle; chunk boundaries are
    deterministic functions of the token sequence."""
    k = chunk_tokens
    df = (docs.withColumn("_tk", tokens(F.col(text_col)))
          .withColumn("_n", F.size("_tk")))
    nchunks = F.floor((F.col("_n") + k - 1) / k).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nchunks - 1),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.array_join(F.slice("_tk", i * k + 1, k), " ")
            .alias("chunk_text"),
            F.least(F.lit(k), F.col("_n") - i * k).alias("n_tokens")))
    return (df.select("doc_id", F.explode(chunks).alias("c"))
            .select("doc_id",
                    F.col("c.chunk_idx").cast("long").alias("chunk_idx"),
                    "c.chunk_text",
                    F.col("c.n_tokens").cast("long").alias("n_tokens")))


def fingerprints(docs: DataFrame, text_col: str = "text",
                 n: int = 8) -> DataFrame:
    """Rolling shingle fingerprint: min/max rolling-hash over token
    8-grams — a winnowing-style content fingerprint, join-friendly for
    clustering."""
    df = with_shingle_hashes(docs, text_col, n=n)
    return df.select(
        "doc_id",
        F.array_min("sh").alias("fp_min"),
        F.array_max("sh").alias("fp_max"),
    )
