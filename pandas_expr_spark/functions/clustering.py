"""Distributed k-means over embedding columns — semantic clustering for
data curation (cluster-balanced sampling, semantic dedup, topic buckets).

Lloyd's algorithm with the natural Spark split of state:

* **centroids live on the driver** (k × dim doubles — KBs even at k=10⁴),
  entering each iteration's plan as ONE nested array literal;
* **assignment is pure JVM**: a let-bound per-centroid squared-distance
  array + ``array_position(array_min)`` argmin (the chained-``when``
  alternative re-evaluates every distance HOF without CSE — measured ~16×
  slower; see ``similarity.ivf_topk``);
* **the update is one aggregation pass**: ``posexplode`` the vectors →
  groupBy (cluster, dimension) → avg — a single map-side-combined shuffle
  of k·dim cells per iteration, never a collect of data rows.

Init is deterministic greedy farthest-point over a bounded driver sample —
with well-separated clusters it lands one seed per cluster, making results
reproducible (no RNG in the iteration path).

The reference engine (pandas-expr) has no clustering operator; this extends
the LLM-pipeline battery like ``dedup``/``similarity`` do.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame as SparkDF, functions as F

__all__ = ["kmeans_assign", "nearest_centroid", "assign_nearest"]


def _centroid_lit(centroids: np.ndarray) -> Column:
    """Nested array literal via ONE parsed SQL string — building it as a
    Column object tree costs ~1 s of py4j round trips per call at
    8×64 doubles (and k-means pays it every iteration)."""
    rows = ", ".join(
        "array(" + ", ".join(f"{float(x)!r}D" for x in c) + ")"
        for c in centroids)
    return F.expr(f"array({rows})")


def nearest_centroid(vec_col: Column | str, centroids: np.ndarray) -> Column:
    """0-based index of the nearest centroid (squared-L2), JVM-side."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    cents_lit = _centroid_lit(centroids)
    dists = F.transform(
        cents_lit,
        lambda c: F.aggregate(F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
                              F.lit(0.0), lambda acc, d: acc + d))
    return F.element_at(
        F.transform(F.array(dists),
                    lambda d: (F.array_position(d, F.array_min(d)) - 1)
                    .cast("int")), 1)


_ARROW_ASSIGN_MIN_K = 64


def assign_nearest(sdf: SparkDF, vec_col: str, centroids: np.ndarray,
                   out: str = "cluster") -> SparkDF:
    """Nearest-centroid assignment, path chosen by k:

    * small k (< 64): the pure-JVM literal distance chain — zero Python,
      plan-visible, the right shape for the exact-oracle gates (k=8/16);
    * large k: ONE BLAS matmul per Arrow batch (``argmin(|c|² − 2vCᵀ)``).
      The JVM HOF chain is interpreted per (row, centroid, dim) and
      becomes the quadratic term once k scales with the corpus — the
      SemDeDup k ∝ n contract.  Measured at 200 k × 64-dim, k=800:
      ~10 min interpreted vs seconds vectorized (SCALING.md r7)."""
    if len(centroids) < _ARROW_ASSIGN_MIN_K:
        return sdf.withColumn(out, nearest_centroid(vec_col, centroids))
    from pyspark.sql import types as T
    C = np.asarray(centroids, dtype=np.float64)
    c2 = (C * C).sum(1)
    dim = C.shape[1]
    # REPLACE an existing `out` field instead of appending a duplicate,
    # and keep it nullable — null/ragged vectors assign null, matching
    # the k<64 JVM path (r7 advice: the paths diverged exactly when k
    # crossed 64 on the same data)
    fields = [f for f in sdf.schema.fields if f.name != out] + \
             [T.StructField(out, T.IntegerType(), True)]
    schema = T.StructType(fields)

    def _fn(batches):
        import pandas as pd
        for pdf in batches:
            pdf = pdf.copy()
            res = pd.array([None] * len(pdf), dtype="Int32")
            if len(pdf):
                vecs = pdf[vec_col].tolist()
                ok = [i for i, v in enumerate(vecs)
                      if v is not None and len(v) == dim
                      and not any(x is None for x in v)]
                if ok:
                    V = np.asarray([vecs[i] for i in ok], dtype=np.float64)
                    res[ok] = (-2.0 * (V @ C.T) + c2).argmin(1).astype("int32")
            pdf[out] = res
            # schema order (out last) — an input that already carried
            # `out` has it at its original position
            yield pdf[[f.name for f in schema.fields]]

    return sdf.mapInPandas(_fn, schema)


def _farthest_point_init(sample: np.ndarray, k: int) -> np.ndarray:
    """Deterministic greedy k-center seeding: start at the first sample
    row (caller orders the sample deterministically), repeatedly add the
    point farthest from the chosen set."""
    chosen = [0]
    d = ((sample - sample[0]) ** 2).sum(1)
    for _ in range(k - 1):
        nxt = int(d.argmax())
        chosen.append(nxt)
        d = np.minimum(d, ((sample - sample[nxt]) ** 2).sum(1))
    return sample[chosen].astype(float)


def kmeans_assign(sdf: SparkDF, vec_col: str = "embedding",
                  id_col: str = "vec_id", k: int = 8, max_iter: int = 10,
                  tol: float = 1e-6, sample_size: int = 4096) -> SparkDF:
    """Cluster every vector; returns the input plus an int ``cluster``
    column (labels are arbitrary — canonicalize downstream, e.g. relabel
    by min id per cluster, if stable identities matter).

    Scale: each iteration = one narrow assignment map + one
    (cluster, dim)-grouped aggregation shuffle of k·dim cells.  The input
    is MATERIALIZED once up front (localCheckpoint, made effective by the
    init-sample collect): the iterations
    would otherwise re-execute the upstream plan ``max_iter`` times, and —
    worse — any expression-derived vector column gets inlined into every
    per-centroid ``zip_with``, multiplying its cost k-fold per row
    (measured 9 s/iteration on a derived column vs 0.5 s materialized).
    The explicit repartition matters on narrow inputs: a single-row-group
    parquet scan is ONE indivisible partition, which would run every
    Lloyd's iteration single-task (measured 2× end-to-end on the sf0.1
    gate); checkpointing preserves partitioning, so widen first.
    """
    par = sdf.sparkSession.sparkContext.defaultParallelism
    if sdf.rdd.getNumPartitions() < par:
        sdf = sdf.repartition(par)
    # LAZY checkpoint (optimization r8): the init-sample collect right
    # below is the materializing action — a TakeOrdered that computes
    # every partition — so the input is still cached exactly once before
    # the iterations, without paying a dedicated materialization job.
    sdf = sdf.localCheckpoint(eager=False)
    ordered = sdf.orderBy(id_col).select(vec_col)
    sample = np.array([r[0] for r in ordered.limit(sample_size).collect()],
                      dtype=float)
    if len(sample) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(sample)}")
    centroids = _farthest_point_init(sample, k)

    dim = centroids.shape[1]
    for _ in range(max_iter):
        assigned = assign_nearest(sdf, vec_col, centroids, "__cluster__")
        # element-wise centroid means as ONE wide hash aggregate: k rows ×
        # dim avg columns.  NOT posexplode — a column projected next to a
        # generator is re-evaluated per EXPLODED row, so the k-centroid
        # distance ran dim× per vector (measured 9 s/iter vs 0.6 s here).
        rows = (assigned.select("__cluster__",
                                F.col(vec_col).alias("__v__"))
                .groupBy("__cluster__")
                .agg(*[F.avg(F.element_at("__v__", i + 1)).alias(f"m{i}")
                       for i in range(dim)])
                .collect())
        new = centroids.copy()
        for r in rows:
            new[r["__cluster__"]] = [r[f"m{i}"] for i in range(dim)]
        shift = float(((new - centroids) ** 2).sum())
        centroids = new
        if shift <= tol:
            break

    return assign_nearest(sdf, vec_col, centroids, "cluster")


def semantic_dedup(sdf: SparkDF, vec_col: str = "embedding",
                   id_col: str = "vec_id", k: int = 8,
                   threshold: float = 0.98, max_iter: int = 5,
                   bands: int | None = None) -> SparkDF:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster the
    embeddings, then WITHIN each cluster drop every vector that has a
    lower-id cosine neighbor above ``threshold`` — keeping one canonical
    representative (the smallest id) per semantic near-dup group.

    Why clustering first: global near-dup search is O(n²); restricting
    candidate pairs to same-cluster members bounds the quadratic to
    Σᵢ cᵢ² — THE SemDeDup design point.  At 100 TB you pick k so the
    largest cluster's pair count stays tractable (k ≈ n / desired
    cluster size); skewed clusters are visible in the (cluster, count)
    histogram before the join runs.

    Plan: one k-means pass (see ``kmeans_assign``), one unit-normalize
    projection (persisted — BOTH self-join sides reuse it, otherwise the
    normalization and the k-means assignment recompute per side), one
    cluster-keyed equi self-join with ``id <`` + JVM dot-product filter,
    one left-anti join back.  No UDFs anywhere.

    ``bands`` (optimization r9, guide §2.5): the pair join's equi key is
    the cluster id, so ONE mega-cluster lands its entire O(c²) pair work
    in ONE task — AQE's skew-join splitting cannot help because a single
    key cannot be split.  Banding fixes it inside the plan: each row
    gets ``band = pmod(xxhash64(id), bands)``; the probe side explodes
    to all ``bands`` target bands and the join key becomes
    (cluster, band), so a cluster's quadratic work spreads over
    ``bands`` tasks.  The pair SET is unchanged (every (a, b) pair meets
    exactly once, in b's band) — band choice cannot alter the cosine or
    the id order, so results are bit-identical.  Default: ceil(available
    parallelism / k), ≥1 — at toy scale that keeps the explode factor
    tiny; at 100 TB pick bands ≈ largest-cluster-pairs / target-task-
    pairs.

    Returns the input rows that SURVIVE dedup (with their ``cluster``).
    """
    clustered = kmeans_assign(sdf, vec_col=vec_col, id_col=id_col, k=k,
                              max_iter=max_iter)
    norm = F.sqrt(F.aggregate(F.transform(F.col(vec_col), lambda x: x * x),
                              F.lit(0.0), lambda a, x: a + x))
    # zero vectors normalize to the zero vector (cos 0 with everything —
    # never a near-dup) instead of an ANSI divide-by-zero
    unit = (clustered
            .withColumn("__u__", F.transform(F.col(vec_col),
                                             lambda x: F.when(
                                                 norm > 0, x / norm)
                                             .otherwise(F.lit(0.0))))
            .localCheckpoint(eager=False))

    if bands is None:
        par = sdf.sparkSession.sparkContext.defaultParallelism
        bands = max(1, -(-par // max(k, 1)))
    a = (unit.select(F.col(id_col).alias("__ida__"), "cluster",
                     F.col("__u__").alias("__ua__"))
         .withColumn("__band__", F.explode(F.sequence(
             F.lit(0), F.lit(bands - 1)))))
    b = (unit.select(F.col(id_col).alias("__idb__"), "cluster",
                     F.col("__u__").alias("__ub__"))
         .withColumn("__band__", F.pmod(F.xxhash64(F.col("__idb__")),
                                        F.lit(bands)).cast("int")))
    cos = F.aggregate(F.zip_with("__ua__", "__ub__", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, d: acc + d)
    dup_ids = (a.join(b, ["cluster", "__band__"])
               .filter(F.col("__ida__") < F.col("__idb__"))
               .filter(cos >= threshold)
               .select(F.col("__idb__").alias(id_col))
               .distinct())
    return (unit.join(dup_ids, id_col, "left_anti")
            .drop("__u__"))


__all__ += ["semantic_dedup"]
