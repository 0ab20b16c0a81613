"""Real byte-pair-encoding tokenization for corpus sizing.

Algorithm: character-level BPE (Sennrich et al. 2016) — repeatedly merge
the lowest-rank adjacent symbol pair of each whitespace word until no
learned pair remains. The merges table ships with the package
(``bpe_merges.txt``, public merges.txt line format, trained
deterministically by ``tools/train_bpe.py``); words outside the training
distribution simply stop merging early and come out as more, shorter
subword tokens — character-level symbols mean there is no OOV.

The merge loop runs ONE leftmost occurrence of the best pair per step.
That is provably equivalent to the textbook all-occurrences-per-step
variant (any pair created by a merge contains the new symbol, and every
pair containing a symbol learned at rank r was itself learned after r —
so the best-rank pair cannot change until all its occurrences are gone)
and is exactly replayable as a DuckDB recursive CTE, which is what the
driver's value oracle does (``__spark_entry__.oracle_sql()['bpe_token_
counts']`` re-runs the same merges table in pure SQL).

Spark shape: a scan-only projection — one Arrow hop, per-row work only,
zero shuffles. Token counting is word-cache-friendly (a crawl's word
frequency is Zipfian), so the kernel encodes each DISTINCT word once
per batch via an lru_cache shared across batches.
"""
from __future__ import annotations

import functools
import importlib.resources as _resources
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ASCII-only: the DuckDB oracle's RE2 '\s+' and Spark's Java '\s+' split
# on ASCII whitespace only, while Python's Unicode '\s' also matches
# U+00A0/U+2028 etc. — re.ASCII keeps all three engines agreeing on word
# boundaries (a doc containing 'a\xa0b' must encode identically).
_WS = re.compile(r"\s+", re.ASCII)


@functools.lru_cache(maxsize=1)
def load_merges() -> tuple[tuple[str, str], ...]:
    """The committed merges table, rank = position."""
    text = (_resources.files("pdf_parser_spark.analytics")
            .joinpath("bpe_merges.txt").read_text(encoding="utf-8"))
    out = []
    for i, line in enumerate(text.splitlines()):
        # merges.txt format: ONLY the first line is a header — '#' is a
        # legal symbol, so a later line like '# t' is a learned merge
        if (i == 0 and line.startswith("#")) or not line.strip():
            continue
        a, b = line.split(" ")
        out.append((a, b))
    return tuple(out)


@functools.lru_cache(maxsize=1)
def _ranks() -> dict[tuple[str, str], int]:
    return {m: i for i, m in enumerate(load_merges())}


@functools.lru_cache(maxsize=65536)
def encode_word(word: str) -> tuple[str, ...]:
    """Greedy BPE merge loop over one word's character symbols."""
    ranks = _ranks()
    syms = list(word)
    while len(syms) > 1:
        best = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best, best_i = r, i
        if best is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return tuple(syms)


def count_tokens(text: str) -> int:
    # .strip(" ") not .strip(): Spark's F.trim and DuckDB's trim() remove
    # only space characters, and Python's default strip would also eat
    # \xa0/\t at the edges — all three engines must see identical words.
    if not text:
        return 0
    return sum(len(encode_word(w)) for w in _WS.split(text.strip(" ")))


def bpe_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token counts: ``bpe_tokens`` from the REAL merge
    loop above, ``ws_tokens`` (whitespace) and ``regex_tokens`` (the old
    GPT-2-style pre-tokenizer regex, kept as the cheap JVM-side proxy)
    alongside for comparison."""
    from .text import BPE_RE, tokens

    @F.pandas_udf("long")
    def n_bpe(col: pd.Series) -> pd.Series:
        return col.map(lambda t: count_tokens(t or ""))

    return docs.select(
        "doc_id",
        F.size(tokens(F.col(text_col))).alias("ws_tokens"),
        n_bpe(F.col(text_col)).alias("bpe_tokens"),
        F.size(F.regexp_extract_all(
            F.col(text_col), F.lit(BPE_RE), 0)).alias("regex_tokens"),
    )


def oracle_merge_sql(table: str = "documents",
                     text_col: str = "text") -> str:
    """DuckDB SQL replaying the SAME committed merges table with a
    recursive CTE — an independent engine executing the same algorithm,
    not a precomputed answer key. Merge keys are ``a || ' ' || b``:
    symbols come from whitespace words, so they can never contain a
    space themselves."""
    keys = ", ".join("'{} {}'".format(a.replace("'", "''"),
                                      b.replace("'", "''"))
                     for a, b in load_merges())
    # rank(pair) = list_position in the rank-ordered key list (1-based,
    # NULL when the pair was never learned)
    rk = (f"list_transform(range(1, len(syms)), "
          f"i -> list_position([{keys}], syms[i] || ' ' || syms[i+1]))")
    return f"""
WITH RECURSIVE
wordlist AS (
  SELECT doc_id, string_split(regexp_replace(trim({text_col}, ' '),
                                             '\\s+', ' ', 'g'), ' ') AS ws
  FROM {table}),
words AS (SELECT DISTINCT unnest(ws) AS w FROM wordlist),
enc AS (
  SELECT w, list_transform(range(1, length(w) + 1), i -> w[i]) AS syms
  FROM words
  UNION ALL
  SELECT w, list_concat(list_concat(
           syms[1:k-1],
           [syms[k] || syms[k+1]]),
           syms[k+2:len(syms)]) AS syms
  FROM (SELECT w, syms, list_position(pr, best) AS k
        FROM (SELECT w, syms, pr,
                     list_min(list_filter(pr, x -> x > 0)) AS best
              FROM (SELECT w, syms, {rk} AS pr FROM enc))
        WHERE best IS NOT NULL)),
final AS (
  SELECT w, len(syms) AS n_tok
  FROM (SELECT w, syms, {rk} AS pr FROM enc)
  WHERE len(list_filter(pr, x -> x > 0)) = 0),
per_doc AS (
  SELECT l.doc_id, sum(f.n_tok) AS bpe_tokens
  FROM (SELECT doc_id, unnest(ws) AS w FROM wordlist) l
  JOIN final f ON l.w = f.w
  GROUP BY l.doc_id)
SELECT d.doc_id,
       len(string_split_regex(trim(d.{text_col}, ' '), '\\s+')) AS ws_tokens,
       CAST(COALESCE(p.bpe_tokens, 0) AS BIGINT) AS bpe_tokens,
       len(regexp_extract_all(d.{text_col},
           '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS regex_tokens
FROM {table} d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""
