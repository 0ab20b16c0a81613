"""Embedding similarity search over the embeddings table
(vec_id bigint, embedding array<float>, label int).

* brute_force_topk — exact cosine top-k: broadcast the query set, cross
  join, JVM-side dot product via zip_with/aggregate (no Python), two-stage
  top-k rank. The baseline every ANN variant is measured against.
* lsh_topk — random-hyperplane LSH: deterministic seeded hyperplanes,
  sign-bit bucket key, candidates share >= (nbits - hamming_budget) bits,
  exact rerank inside the candidate set. Candidate generation is a
  BUCKETED MULTIPROBE equi-join: each query row is exploded into its
  hamming-ball probe keys (qkey XOR mask for every <=budget-bit mask —
  a data-independent literal array), and probes equi-join the corpus on
  the integer bucket key. Work is proportional to actual bucket
  collisions, never O(N x Q).
* ivf_topk — inverted-file ANN: expression-level centroid argmax (zero
  shuffles for assignment), deterministic k-means refinement, broadcast
  probe join.
* embedding_near_duplicates — all-pairs cosine above a threshold:
  distributed block-tiled GEMM (exact) or sign-LSH buckets (approximate).

Scale notes: every ranking tail is a two-stage top-k (per-partition
partial top-k via map-side combine, then a final window over at most
partitions x k rows) — no plan ships all scored candidates to Q reducer
partitions. Centroid/hyperplane constants are driver-known literals, so
assignment and bucketing stay inside whole-stage codegen projections.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# driver-side collects are bounded BY CONSTRUCTION (query sets, centroid
# seeds — never the corpus); these caps turn a mis-shaped input into a
# fast, explicit error instead of a driver OOM
MAX_QUERY_ROWS = 100_000
MAX_SEED_ROWS = 65_536


def _bounded_collect(df: DataFrame, cap: int, what: str) -> list:
    """collect() that fails fast when the 'small' side isn't small.
    Uses limit(cap+1) so the overflow check itself never materializes
    more than cap+1 rows on the driver."""
    rows = df.limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"{what}: more than {cap} rows on the driver-collected side "
            f"— this input is not broadcast-sized; repartition the "
            f"workload or raise the cap explicitly")
    return rows


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def with_cosine(df: DataFrame, a: str, b: str,
                out: str = "cosine") -> DataFrame:
    """Row-wise cosine of two array columns via a vectorized Arrow UDF
    (one einsum per batch). Replaces the interpreted fold-expression
    form (measured ~1.3 us per multiply-add — interpreted HOFs get no
    codegen); numpy's pairwise summation differs from a fold only in
    low-order bits, far below the 6-dp rounding every consumer applies
    (driver hashes stay green — verified at sf0.01)."""
    @F.pandas_udf("double")
    def cos(ca: pd.Series, cb: pd.Series) -> pd.Series:
        if not len(ca):
            return pd.Series([], dtype="float64")
        ma = np.array(list(ca), dtype=np.float64)
        mb = np.array(list(cb), dtype=np.float64)
        dots = np.einsum("ij,ij->i", ma, mb)
        # zero-norm clamp: a NaN cosine would sort ABOVE every real
        # score under Spark's desc ordering (NaN > any double) and
        # surface a zero vector as a rank-1 neighbor — same guard as
        # the block-GEMM and semantic-tile kernels
        na = np.maximum(np.sqrt(np.einsum("ij,ij->i", ma, ma)), 1e-300)
        nb = np.maximum(np.sqrt(np.einsum("ij,ij->i", mb, mb)), 1e-300)
        return pd.Series(dots / (na * nb))

    # deterministic in fact; the marker stops Catalyst from CLONING the
    # UDF below a consumer's filter (e.g. the near-dup threshold), which
    # would run the GEMM and its input projection twice — same hazard as
    # dedup.contamination's hits_n
    cos = cos.asNondeterministic()
    return df.withColumn(out, cos(F.col(a), F.col(b)))


def _rank_topk(scored: DataFrame, k: int,
               q_col: str = "q_id", id_col: str = "vec_id",
               score_col: str = "cosine") -> DataFrame:
    """Two-stage top-k per query: a partition-LOCAL partial top-k first
    (mapInPandas — no exchange; each input partition emits at most k
    narrow rows per query), then a final window over at most
    partitions x k x Q rows. Replaces the single global
    row_number-over-all-candidates window, whose exchange shipped every
    scored row into Q reducer partitions (Q-partition skew at scale).
    A groupBy(q, partition_id) + collect_list variant still ships every
    candidate inside the partial aggregation buffers — mapInPandas is
    the only shape whose exchange truly carries <= partitions x k."""
    def partial(batches):
        import pandas as pd

        best = None
        for pdf in batches:
            cur = pdf if best is None else pd.concat(
                [best, pdf], ignore_index=True)
            # prune per batch so memory stays O(queries x k)
            best = (cur.sort_values([q_col, score_col, id_col],
                                    ascending=[True, False, True])
                    .groupby(q_col, sort=False).head(k))
        if best is not None and len(best):
            yield best

    narrow = scored.select(q_col, id_col, score_col)
    part = narrow.mapInPandas(
        partial, f"{q_col} long, {id_col} long, {score_col} double")
    w = Window.partitionBy(q_col).orderBy(
        F.desc(score_col), F.asc(id_col))
    return (part.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(q_col, "rank",
                    F.col(id_col).alias("neighbor_id"),
                    F.round(score_col, 6).alias("cosine")))


def brute_force_topk(embeddings: DataFrame, queries: DataFrame,
                     k: int = 10) -> DataFrame:
    """queries(q_id, q_emb) x embeddings -> exact top-k neighbors per
    query, SINGLE-PASS: the query matrix is collected (bounded by Q,
    never the corpus) and each Arrow batch computes one GEMM against
    it, keeping a per-partition top-k under the full (cosine desc,
    vec_id asc) order. No N x Q row materialization — the old
    crossJoin shipped every (vector, query) pair through Arrow — and
    the only exchange is the final <= partitions x k x Q window."""
    q_rows = _bounded_collect(queries.select("q_id", "q_emb"),
                              MAX_QUERY_ROWS, "brute_force_topk queries")
    q_ids = np.array([int(r.q_id) for r in q_rows], dtype=np.int64)
    q_mat = np.array([r.q_emb for r in q_rows], dtype=np.float64)
    q_norm = np.maximum(np.sqrt((q_mat * q_mat).sum(axis=1)), 1e-300)

    def kernel(batches):
        cand: dict[int, list] = {int(q): [] for q in q_ids}
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            norms = np.maximum(np.sqrt((mat * mat).sum(axis=1)), 1e-300)
            cos = (mat @ q_mat.T) / (norms[:, None] * q_norm[None, :])
            for qi, q in enumerate(q_ids):
                col = cos[:, qi]
                keep = ids != q            # drop self-match
                vids, vals = ids[keep], col[keep]
                # exact batch top-k under (cos desc, vec_id asc)
                order = np.lexsort((vids, -vals))[:k]
                cand[int(q)].append((vids[order], vals[order]))
        rows = []
        for q, parts in cand.items():
            if not parts:
                continue
            vids = np.concatenate([p[0] for p in parts])
            vals = np.concatenate([p[1] for p in parts])
            order = np.lexsort((vids, -vals))[:k]
            for vid, val in zip(vids[order], vals[order]):
                rows.append((q, int(vid), float(val)))
        if rows:
            yield pd.DataFrame(rows,
                               columns=["q_id", "vec_id", "cosine"])

    part = embeddings.select("vec_id", "embedding").mapInPandas(
        kernel, "q_id long, vec_id long, cosine double")
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"),
                                           F.asc("vec_id"))
    return (part.withColumn("rank", F.row_number().over(w))
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
    """Array of sign bits of <emb, plane_i> via a vectorized Arrow UDF
    (one GEMM against the plane matrix per batch). Sign decisions are
    robust to numpy-vs-fold low-bit differences: a flip needs
    |<emb, plane>| < ~1e-13, measure-zero for real embeddings (the
    DuckDB oracle computes the same signs from the same inlined plane
    literals — hash-green at sf0.01)."""
    planes = np.array([_hyperplane(dim, i) for i in range(nbits)],
                      dtype=np.float64)

    @F.pandas_udf("array<int>")
    def bits(col: pd.Series) -> pd.Series:
        if not len(col):
            return pd.Series([], dtype=object)
        mat = np.array(list(col), dtype=np.float64)
        sig = (mat @ planes.T > 0).astype(np.int32)
        return pd.Series(list(sig))

    return bits(emb_col)


def _sig_key(sig_col, nbits: int):
    """Pack an array<int> of sign bits into one integer bucket key
    (bit i -> 2^i). Pure expression — stays in codegen."""
    weights = F.array(*[F.lit(1 << i).cast("long") for i in range(nbits)])
    return F.aggregate(
        F.zip_with(sig_col, weights, lambda b, w: b.cast("long") * w),
        F.lit(0).cast("long"), lambda acc, v: acc + v)


def _hamming_ball_masks(nbits: int, budget: int) -> list[int]:
    """All XOR masks within ``budget`` bits of zero — the multiprobe
    enumeration (driver-side combinatorics over literals; for 8 bits /
    budget 2 that is 1 + 8 + 28 = 37 masks)."""
    return [m for m in range(1 << nbits)
            if bin(m).count("1") <= budget]


def lsh_topk(embeddings: DataFrame, queries: DataFrame, dim: int,
             k: int = 10, nbits: int = 8,
             hamming_budget: int = 2) -> DataFrame:
    """Approximate top-k: candidates = vectors whose sign signature is
    within ``hamming_budget`` bits of the query's (multi-probe LSH),
    exact cosine rerank on the survivors.

    Scale path: each query explodes into its hamming-ball probe keys
    (qkey XOR mask over the literal mask set — C(nbits, <=budget) rows
    per query, 37 for 8/2) and the probe side broadcast-HASH-equi-joins
    the corpus on the integer bucket key. The corpus streams through a
    hash lookup: no cross join, no per-pair hamming filter, work
    proportional to true bucket collisions. Buckets are disjoint and a
    corpus vector is at distance <= budget from exactly one probe key
    per query, so no post-join dedup is needed.

    Recall/speed knob: on clustered data budget 2/8 bits keeps recall
    near 1.0 while pruning most of the corpus; on near-orthogonal random
    vectors sign bits carry little signal (any LSH degrades there) —
    raise the budget or nbits count accordingly."""
    emb_keyed = (embeddings
                 .withColumn("sig", signature_bits(F.col("embedding"),
                                                   dim, nbits))
                 .withColumn("bkey", _sig_key(F.col("sig"), nbits))
                 .drop("sig"))
    masks = _hamming_ball_masks(nbits, hamming_budget)
    probes = (queries
              .withColumn("qsig", signature_bits(F.col("q_emb"),
                                                 dim, nbits))
              .withColumn("qkey", _sig_key(F.col("qsig"), nbits))
              .withColumn("bkey", F.explode(F.array(
                  *[F.col("qkey").bitwiseXOR(F.lit(m).cast("long"))
                    for m in masks])))
              .select("q_id", "q_emb", "bkey"))
    cand = (emb_keyed.join(F.broadcast(probes), "bkey")
            .where(F.col("vec_id") != F.col("q_id")))
    scored = with_cosine(cand, "q_emb", "embedding")
    return _rank_topk(scored, k)


def embedding_near_duplicates(embeddings: DataFrame,
                              threshold: float = 0.45,
                              exact: bool = True,
                              nbits: int = 8,
                              dim: int | None = None,
                              nblocks: int = 16) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine >=
    threshold after 6-dp rounding for cross-engine determinism).

    ``exact=True``: distributed block-tiled GEMM — vectors are bucketed
    into ``nblocks`` id-blocks, each row is replicated to the block
    PAIRS it participates in (a narrow nblocks-way fanout, NOT a cross
    join), and each (block_i, block_j) group computes its cosine tile
    with BLAS, emitting only threshold survivors. No driver-side
    collect anywhere: group memory is ~2N/nblocks rows, so nblocks is
    the knob that keeps tiles executor-sized as the corpus grows (exact
    all-pairs is inherently N^2/P work; the tiling bounds memory and
    spreads the work across nblocks*(nblocks+1)/2 tasks). r6: default
    raised 8 -> 16 — 136 tiles balance a 32-core wave far better than
    36 (measured 2.9 s -> ~1.7 s at sf1.0; output is blocking-invariant,
    locked by test_embedding_near_duplicates_blocking_invariant).

    ``exact=False``: sign-LSH bucketed candidates, exact rerank — the
    10^12-scale path when approximate recall is acceptable (pass
    ``dim``; no data-dependent plan-build work)."""
    if exact:
        return _near_dup_block_gemm(embeddings, threshold, nblocks)
    if dim is None:
        raise ValueError("exact=False requires dim= (embedding width); "
                         "plans must not peek at data to build")
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


def _near_dup_block_gemm(embeddings: DataFrame, threshold: float,
                         nblocks: int) -> DataFrame:
    """Exact all-pairs cosine >= threshold via block-matrix product.

    Plan: project (blk, vec_id, embedding) -> explode each row to its
    block pairs {(min(b,m), max(b,m)) : m in 0..nblocks-1} -> hash
    shuffle on (bi, bj) -> one numpy GEMM per tile. Shuffled volume is
    nblocks x corpus (tunable), tile memory ~2N/nblocks rows, and the
    output identical to the unblocked product (float64 GEMM + 6-dp
    rounding is blocking-invariant)."""
    blk = F.pmod(F.col("vec_id"), F.lit(nblocks)).cast("int")
    pair_structs = F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.lit(nblocks - 1)),
        lambda m: F.struct(F.least(F.col("blk"), m).alias("bi"),
                           F.greatest(F.col("blk"), m).alias("bj"))))
    tagged = (embeddings
              .select("vec_id", "embedding", blk.alias("blk"))
              .withColumn("p", F.explode(pair_structs))
              .select(F.col("p.bi").alias("bi"), F.col("p.bj").alias("bj"),
                      "blk", "vec_id", "embedding"))

    def tile(pdf):
        import numpy as np
        import pandas as pd

        bi = int(pdf["bi"].iloc[0])
        bj = int(pdf["bj"].iloc[0])

        def side(rows):
            ids = rows["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(list(rows["embedding"]), dtype=np.float64)
            mat /= np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
            return ids, mat
        a_ids, a_mat = side(pdf[pdf["blk"] == bi])
        if bi == bj:
            b_ids, b_mat = a_ids, a_mat
        else:
            b_ids, b_mat = side(pdf[pdf["blk"] == bj])
        if not len(a_ids) or not len(b_ids):
            return pd.DataFrame({"vec_a": [], "vec_b": [],
                                 "cosine": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"})
        cos = np.round(a_mat @ b_mat.T, 6)
        ai, bj_idx = np.nonzero(cos >= threshold)
        va, vb = a_ids[ai], b_ids[bj_idx]
        c = cos[ai, bj_idx]
        if bi == bj:
            # full symmetric tile: each unordered pair appears twice,
            # va < vb keeps one copy and drops self-pairs
            keep = va < vb
            va, vb, c = va[keep], vb[keep], c[keep]
        else:
            # cross tile: each unordered pair appears exactly once
            # (ids never collide across blocks) — canonicalize order
            lo = np.minimum(va, vb)
            vb = np.maximum(va, vb)
            va = lo
        return pd.DataFrame({"vec_a": va, "vec_b": vb, "cosine": c})

    return tagged.groupBy("bi", "bj").applyInPandas(
        tile, "vec_a long, vec_b long, cosine double")


def kmeans_centroids(embeddings: DataFrame, n_centroids: int,
                     iters: int = 1) -> list[tuple[int, list[float]]]:
    """Deterministic coarse quantizer: seed with the first
    ``n_centroids`` vectors by vec_id, then run ``iters`` Lloyd steps.
    Each step assigns via an expression-level argmax against centroid
    LITERALS (a pure projection — zero shuffles) and recomputes
    centroids with one map-side-combined aggregation whose result is
    n_centroids rows. Refined coordinates are rounded to 6 dp so an
    independent engine (the DuckDB oracle) reproduces them bit-for-bit
    despite summation-order differences. Driver memory is bounded by
    n_centroids x dim — never by the corpus."""
    if n_centroids > MAX_SEED_ROWS:
        raise ValueError(
            f"kmeans_centroids: n_centroids={n_centroids} exceeds the "
            f"driver-side cap {MAX_SEED_ROWS}; a coarse quantizer this "
            f"wide should be trained hierarchically")
    seed = (embeddings.where(F.col("vec_id") < n_centroids)
            .select("vec_id", "embedding")
            .orderBy("vec_id").collect())
    cents = [(int(r.vec_id), [float(v) for v in r.embedding])
             for r in seed]
    dim = len(cents[0][1])
    for _ in range(iters):
        asg = _with_centroid(embeddings, "embedding", cents)
        # decimal-exact sum then ONE double division (host_stats
        # pattern): both engines round the identical exact value, and
        # no float32 component can be an exact decimal-6 tie (a tie
        # needs a 5^k denominator; floats are k/2^n), so the 6-dp
        # rounding below is engine-independent
        stats = (asg.groupBy("centroid")
                 .agg(*[F.round(
                     F.sum(F.element_at("embedding", i + 1)
                           .cast("double").cast("decimal(18,6)"))
                     .cast("double") / F.count("*"), 6).alias(f"d{i}")
                        for i in range(dim)])
                 .collect())
        refined = {int(r["centroid"]): [r[f"d{i}"] for i in range(dim)]
                   for r in stats}
        # empty cluster: keep the (6-dp rounded) previous centroid
        cents = [(cid, refined.get(cid, [round(v, 6) for v in vec]))
                 for cid, vec in cents]
    return cents


def _with_cos_array(df: DataFrame, emb_col: str,
                    cents: list[tuple[int, list[float]]],
                    out: str = "_cos_arr") -> DataFrame:
    """Adds ``out``: array of cosines against the centroid matrix, via
    an Arrow-batched pandas UDF (one numpy GEMM per batch). Still a
    pure projection — no shuffle, no driver-side data. Chosen over the
    expression-level form after measuring: n_centroids interpreted HOF
    dot products cost ~1.3 us per multiply-add (no codegen for
    aggregate-lambda chains), ~1000x the GEMM. The numpy pairwise
    summation differs from a sequential fold only in low-order bits;
    consumers take argmax/top-n over the array (gaps >> 1e-10), and
    output cosines are still computed JVM-side, so oracle hashes are
    unaffected (verified at sf0.01)."""
    from pyspark.sql.types import ArrayType, DoubleType

    cmat = np.array([vec for _, vec in cents], dtype=np.float64)
    cnorm = np.maximum(np.sqrt((cmat * cmat).sum(axis=1)), 1e-300)

    @F.pandas_udf(ArrayType(DoubleType()))
    def cos_arr(col: pd.Series) -> pd.Series:
        if not len(col):
            return pd.Series([], dtype=object)
        mat = np.array(list(col), dtype=np.float64)
        en = np.maximum(np.sqrt((mat * mat).sum(axis=1)), 1e-300)
        cos = (mat @ cmat.T) / (en[:, None] * cnorm[None, :])
        return pd.Series(list(cos))

    return df.withColumn(out, cos_arr(F.col(emb_col)))


def _with_centroid(df: DataFrame, emb_col: str,
                   cents: list[tuple[int, list[float]]],
                   out: str = "centroid") -> DataFrame:
    """Adds ``out``: cent_id of the max-cosine centroid (ties -> lowest
    cent_id). Pure projection over centroid literals — no shuffle."""
    ids = F.array(*[F.lit(int(cid)) for cid, _ in cents])
    pos = F.array_position(F.col("_cos_arr"), F.array_max("_cos_arr"))
    return (_with_cos_array(df, emb_col, cents)
            .withColumn(out, F.element_at(ids, pos.cast("int")))
            .drop("_cos_arr"))


def _with_probes(df: DataFrame, emb_col: str,
                 cents: list[tuple[int, list[float]]],
                 nprobe: int, out: str = "probes") -> DataFrame:
    """Adds ``out``: array of the nprobe nearest cent_ids (cos desc,
    cent_id asc) — expression-level, no window/shuffle."""
    ids = F.array(*[F.lit(int(cid)) for cid, _ in cents])
    structs = F.zip_with(
        F.col("_cos_arr"), ids,
        lambda c, i: F.struct((-c).alias("nc"), i.alias("cid")))
    top = F.slice(F.array_sort(structs), 1, nprobe)
    return (_with_cos_array(df, emb_col, cents)
            .withColumn(out, F.transform(top, lambda s: s["cid"]))
            .drop("_cos_arr"))


def ivf_topk(embeddings: DataFrame, queries: DataFrame,
             n_centroids: int = 16, nprobe: int = 4,
             k: int = 10, kmeans_iters: int = 1,
             centroids: list[tuple[int, list[float]]] | None = None
             ) -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    Coarse quantizer: pass ``centroids`` (from an OFFLINE
    kmeans_centroids run — train once, persist, reuse) so the query
    does zero corpus passes before search. When ``centroids`` is None
    the quantizer is trained inline (first-``n_centroids``-by-vec_id
    seeds refined by ``kmeans_iters`` deterministic Lloyd steps) —
    convenient for one-shot use, but that costs ~2 extra corpus passes
    per call; serve real query workloads with precomputed centroids.

    Every vector is assigned to its max-cosine centroid by an
    expression-level argmax over centroid literals — a pure projection,
    no Exchange anywhere before assignment. Queries probe their
    ``nprobe`` nearest centroids via the same expression trick and are
    BROADCAST into the inverted lists, so the corpus is never shuffled:
    scan -> project(centroid) -> broadcast equi-join -> two-stage
    top-k."""
    cents = centroids if centroids is not None else kmeans_centroids(
        embeddings, n_centroids, iters=kmeans_iters)
    lists = _with_centroid(embeddings, "embedding", cents)
    probes = (_with_probes(queries, "q_emb", cents, nprobe)
              .select("q_id", "q_emb",
                      F.explode("probes").alias("centroid")))
    cand = (lists.join(F.broadcast(probes), "centroid")
            .where(F.col("vec_id") != F.col("q_id")))
    # each vector lives in exactly one list and probe centroids are
    # distinct per query, so (q_id, vec_id) pairs are already unique
    scored = with_cosine(cand, "q_emb", "embedding")
    return _rank_topk(scored, k)


def semantic_near_duplicates(embeddings: DataFrame,
                             n_centroids: int = 16,
                             threshold: float = 0.45,
                             centroids: list[tuple[int, list[float]]]
                             | None = None,
                             kmeans_iters: int = 1) -> DataFrame:
    """SemDeDup-style semantic near-duplicates: assign every vector to
    its coarse-quantizer cluster (expression argmax over centroid
    literals — pure projection), then compute exact pairwise cosine
    ONLY within each cluster (one GEMM tile per cluster via
    applyInPandas). Emits (vec_a < vec_b, cosine >= threshold, 6-dp).

    vs the exact all-pairs `embedding_near_duplicates`: work drops from
    N^2 to sum of cluster sizes squared (~N^2/n_centroids for balanced
    clusters) at the cost of missing cross-cluster pairs — the SemDeDup
    trade (near-duplicates co-locate in embedding space, so recall
    stays high; test_semantic_dedup_recall measures it). At 10^12
    vectors: raise n_centroids so tiles stay executor-sized (tile
    memory = cluster size x dim) and train the quantizer OFFLINE
    (pass ``centroids`` — same contract as ivf_topk); a pathological
    mega-cluster is the skew signal to re-train with more centroids."""
    cents = centroids if centroids is not None else kmeans_centroids(
        embeddings, n_centroids, iters=kmeans_iters)
    asg = _with_centroid(embeddings, "embedding", cents)

    def tile(pdf):
        import numpy as np
        import pandas as pd

        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf["embedding"]), dtype=np.float64)
        mat /= np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
        cos = np.round(mat @ mat.T, 6)
        ai, bi = np.nonzero(cos >= threshold)
        keep = ids[ai] < ids[bi]
        return pd.DataFrame({"vec_a": ids[ai][keep],
                             "vec_b": ids[bi][keep],
                             "cosine": cos[ai, bi][keep]})

    return asg.select("centroid", "vec_id", "embedding") \
              .groupBy("centroid").applyInPandas(
                  tile, "vec_a long, vec_b long, cosine double")


def make_queries(embeddings: DataFrame, n: int = 5) -> DataFrame:
    return (embeddings.where(F.col("vec_id") < n)
            .select(F.col("vec_id").alias("q_id"),
                    F.col("embedding").alias("q_emb")))
