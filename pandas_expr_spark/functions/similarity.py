"""Similarity search over embedding columns (``array<float>``).

* ``cosine_topk`` — brute-force exact top-k: one narrow map (JVM-side dot
  product via ``F.aggregate``/``zip_with``) + distributed TopK
  (TakeOrderedAndProject).  O(n·d) with no shuffle of the vectors — the
  right baseline even at scale.
* ``lsh_topk`` — random-hyperplane LSH: probe only the query's bucket
  (plus optional multi-probe neighbors).  Turns full scans into
  partition-pruned bucket reads when the table is written bucketed/
  partitioned by signature.
* ``ivf_topk`` — IVF-style: k-means-ish coarse centroids (sampled, driver
  -side), assign each vector to nearest centroid once, probe the closest
  ``nprobe`` centroid cells per query.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame as SparkDF, functions as F

__all__ = ["cosine_topk", "brute_force_pairs", "lsh_topk", "ivf_topk", "knn_join",
           "random_hyperplane_bucket"]


def _dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _cosine(dot: Column, na: Column, nb: Column) -> Column:
    """dot/(na*nb) with the zero-vector guard: cosine against a zero
    vector is undefined → null (pandas/np convention is NaN; ANSI division
    would hard-error the whole query on one bad row)."""
    d = na * nb
    return F.when(d > 0, dot / d)


def _lit_vec(vec) -> Column:
    # ONE py4j call for the whole array literal — per-element F.lit would
    # cost a JVM round trip each (measured: ~2.5 s of driver-side analysis
    # for 32 hyperplanes × 64 dims in the banded-LSH plan)
    return F.lit([float(v) for v in vec])


def cosine_topk(sdf: SparkDF, query_vec, k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id",
                round_to: int | None = 6) -> SparkDF:
    """Exact brute-force cosine top-k against a literal query vector.

    Plan shape: Scan → Project(cosine) → TakeOrderedAndProject — no shuffle,
    map-side top-k per partition then a driver merge of k·partitions rows.
    """
    q = _lit_vec(query_vec)
    cos = _cosine(_dot(vec_col, q), _norm(vec_col), _norm(q))
    out = (sdf.select(F.col(id_col), cos.alias("cosine"))
           .orderBy(F.desc("cosine"), F.asc(id_col))
           .limit(k))
    if round_to is not None:
        out = out.withColumn("cosine", F.round(F.col("cosine"), round_to))
    return out


def brute_force_pairs(sdf: SparkDF, cosine_threshold: float = 0.95,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      round_to: int | None = None,
                      max_vectors: int = 200_000) -> SparkDF:
    """All-pairs cosine similarity join (id_a < id_b) — the exact baseline
    the LSH/IVF paths approximate.  O(n²): correct at any scale but only
    *fast* up to ~10⁵ vectors; beyond that use ``embedding_near_dup_pairs``
    (random-hyperplane LSH) or ``ivf_topk``.

    ``max_vectors`` is a hard size guard: above it the n² plan would run
    for days on a real corpus, so the call REFUSES (one cheap count)
    rather than silently launching it.  Raise the bound explicitly (or
    pass ``max_vectors=None``) only for a deliberate exact baseline run.

    Norms are precomputed once and the (id, vec, norm) projection persisted
    so the self-join reads it from memory instead of re-deriving per side.
    """
    if max_vectors is not None:
        n = sdf.count()
        if n > max_vectors:
            raise ValueError(
                f"brute_force_pairs: {n} vectors exceeds the O(n²) guard "
                f"({max_vectors}); use embedding_near_dup_pairs (banded "
                f"LSH) or ivf_topk, or pass max_vectors=None for a "
                f"deliberate exact baseline run")
    # spread the O(n²) compare work across the cluster even when the
    # source is a single parquet split
    npart = sdf.sparkSession.sparkContext.defaultParallelism
    e = (sdf.repartition(npart, id_col)
         .select(F.col(id_col), F.col(vec_col),
                 _norm(vec_col).alias("__n__")).persist())
    a = e.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va__"),
                 F.col("__n__").alias("__na__"))
    b = e.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb__"),
                 F.col("__n__").alias("__nb__"))
    cos = _cosine(_dot("__va__", "__vb__"), F.col("__na__"), F.col("__nb__"))
    out = (a.crossJoin(b)
           .filter(F.col("id_a") < F.col("id_b"))
           .withColumn("cosine", cos)
           .filter(F.col("cosine") >= cosine_threshold)
           .select("id_a", "id_b", "cosine"))
    if round_to is not None:
        out = out.withColumn("cosine", F.round(F.col("cosine"), round_to))
    return out


def random_hyperplane_bucket(vec_col: Column | str, num_planes: int = 8,
                             dim: int = 64, seed: int = 42) -> Column:
    """Pack sign(v·r_i) bits into one long — the LSH bucket id.  The random
    hyperplanes are deterministic literals (seeded), so the same bucket
    function is reproducible across runs/queries.

    Built as ONE ``F.expr`` SQL string when given a column name: the
    Column-object alternative (per-plane ``F.when`` chains over
    ``F.aggregate`` Python lambdas) costs ~70 ms of py4j round trips PER
    PLANE at build time — measured 2.2 s of driver-side plan construction
    for the 32-plane banded-LSH query before this rewrite."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((num_planes, dim))
    if isinstance(vec_col, str):
        terms = []
        for i in range(num_planes):
            vals = ", ".join(f"{float(v)!r}d" for v in planes[i])
            dot = (f"aggregate(zip_with(`{vec_col}`, array({vals}), "
                   f"(x, y) -> x * y), 0.0d, (acc, v) -> acc + v)")
            terms.append(f"if({dot} >= 0.0d, {1 << i}L, 0L)")
        return F.expr(" + ".join(terms))
    bucket = F.lit(0).cast("long")
    for i in range(num_planes):
        bit = F.when(_dot(vec_col, _lit_vec(planes[i])) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + (bit.cast("long") * F.lit(1 << i).cast("long"))
    return bucket


def lsh_topk(sdf: SparkDF, query_vec, k: int = 10, vec_col: str = "embedding",
             id_col: str = "vec_id", num_planes: int = 8, seed: int = 42,
             multiprobe: int = 1) -> SparkDF:
    """ANN top-k: probe the query's hyperplane bucket (± single-bit-flip
    neighbors when ``multiprobe`` > 0), exact cosine rerank inside.

    At 100 TB: write the corpus partitioned by ``bucket`` → the probe becomes
    partition pruning; only ~1/2^planes of the data is read.
    """
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((num_planes, len(query_vec)))
    qsig = 0
    qv = np.asarray(query_vec, dtype=float)
    for i in range(num_planes):
        if float(qv @ planes[i]) >= 0:
            qsig |= (1 << i)
    # probe every bucket within Hamming distance `multiprobe` of the
    # query's signature (mp=1 → single-bit flips, mp=2 adds two-bit, …)
    probes = {qsig}
    frontier = {qsig}
    for _ in range(max(0, int(multiprobe))):
        frontier = {s ^ (1 << i) for s in frontier
                    for i in range(num_planes)} - probes
        probes |= frontier
    bucket = random_hyperplane_bucket(vec_col, num_planes, len(query_vec), seed)
    candidates = sdf.withColumn("__bkt__", bucket).filter(
        F.col("__bkt__").isin([int(p) for p in probes]))
    return cosine_topk(candidates, query_vec, k, vec_col, id_col)


def ivf_topk(sdf: SparkDF, query_vec, k: int = 10, vec_col: str = "embedding",
             id_col: str = "vec_id", n_cells: int = 16, nprobe: int = 4,
             seed: int = 42, sample_frac: float = 0.2) -> SparkDF:
    """IVF-flat ANN: coarse centroids from a driver-side sample (one pass of
    Lloyd's on ≤ a few thousand sampled vectors), cell assignment JVM-side,
    probe the ``nprobe`` nearest cells.

    The cell-assignment column is computed once; at scale you persist it (or
    bucket the table by it) so each query touches nprobe/n_cells of the data.
    """
    sample = np.array(
        [r[0] for r in
         sdf.select(vec_col).sample(fraction=sample_frac, seed=seed)
            .limit(4000).collect()],
        dtype=float)
    if len(sample) < n_cells:
        return cosine_topk(sdf, query_vec, k, vec_col, id_col)
    rng = np.random.RandomState(seed)
    centroids = sample[rng.choice(len(sample), n_cells, replace=False)]
    for _ in range(5):  # few Lloyd iterations are enough for coarse cells
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(n_cells):
            pts = sample[assign == c]
            if len(pts):
                centroids[c] = pts.mean(0)

    # JVM-side nearest-centroid assignment: ONE nested-literal centroid
    # array + a let-bound distance vector (argmin via array_position).
    # The chained-when alternative evaluates each cell's sqdist HOF twice
    # per row without CSE — measured ~16× slower at 100k vectors.
    cents_lit = F.lit([[float(v) for v in c] for c in centroids])
    dists = F.transform(
        cents_lit,
        lambda c: F.aggregate(F.zip_with(F.col(vec_col), c,
                                         lambda x, y: (x - y) * (x - y)),
                              F.lit(0.0), lambda acc, v: acc + v))
    best_cell = F.element_at(
        F.transform(F.array(dists),
                    lambda d: (F.array_position(d, F.array_min(d)) - 1)
                    .cast("int")), 1)

    qv = np.asarray(query_vec, dtype=float)
    cell_d = ((centroids - qv) ** 2).sum(1)
    probe_cells = [int(c) for c in np.argsort(cell_d)[:nprobe]]
    if n_cells >= 64:
        # large cell counts: the interpreted HOF distance chain is the
        # quadratic term once n_cells scales with the corpus — one BLAS
        # matmul per Arrow batch instead (see clustering.assign_nearest
        # and SCALING.md r7)
        from .clustering import assign_nearest
        assigned = assign_nearest(sdf, vec_col, centroids, "__cell__")
    else:
        assigned = sdf.withColumn("__cell__", best_cell)
    candidates = assigned.filter(F.col("__cell__").isin(probe_cells))
    return cosine_topk(candidates, query_vec, k, vec_col, id_col)


def _train_cells(sdf: SparkDF, vec_col: str, n_cells: int, seed: int,
                 sample_frac: float) -> np.ndarray | None:
    """Coarse IVF centroids from a driver-side sample (shared by
    ``ivf_topk`` and ``knn_join``)."""
    sample = np.array(
        [r[0] for r in
         sdf.select(vec_col).sample(fraction=sample_frac, seed=seed)
            .limit(4000).collect()],
        dtype=float)
    if len(sample) < n_cells:
        return None
    rng = np.random.RandomState(seed)
    centroids = sample[rng.choice(len(sample), n_cells, replace=False)]
    for _ in range(5):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(n_cells):
            pts = sample[assign == c]
            if len(pts):
                centroids[c] = pts.mean(0)
    return centroids


def _cell_dists(vec_col: Column | str, centroids: np.ndarray) -> Column:
    """array<double> of squared distances to every centroid — ONE nested
    literal + let-bound HOF (the chained-when form re-evaluates each
    cell's distance twice per row; measured ~16× slower)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    cents_lit = F.lit([[float(x) for x in c] for c in centroids])
    return F.transform(
        cents_lit,
        lambda c: F.aggregate(F.zip_with(v, c,
                                         lambda x, y: (x - y) * (x - y)),
                              F.lit(0.0), lambda acc, val: acc + val))


def knn_join(queries: SparkDF, corpus: SparkDF, k: int = 10,
             vec_col: str = "embedding", query_id: str = "vec_id",
             corpus_id: str = "vec_id", method: str = "exact",
             n_cells: int = 16, nprobe: int = 4, seed: int = 42,
             sample_frac: float = 0.2, max_pairs: int = 50_000_000,
             round_to: int | None = None) -> SparkDF:
    """Batch k-nearest-neighbor join: for EVERY query row, the ``k``
    corpus rows with the highest cosine similarity — the production shape
    of RAG retrieval / hard-negative mining over an embedding corpus.

    * ``method='exact'``: corpus streams once through a
      broadcast-nested-loop against the (broadcast) query table; only the
      narrow (query, corpus, score) triples shuffle into the per-query
      top-k (a window partitioned BY QUERY — thousands of partitions, not
      a global sort).  Guarded by ``max_pairs`` (queries × corpus) like
      ``brute_force_pairs`` — exact is the oracle baseline, IVF the
      scale path.
    * ``method='ivf'``: coarse centroids from a corpus sample (driver
      Lloyd's on ≤4k vectors); corpus rows get ONE JVM cell assignment,
      each query probes its ``nprobe`` nearest cells, candidates come
      from a cell EQUI-join (each query touches ~nprobe/n_cells of the
      corpus), then the same per-query top-k.

    Returns (query_id, corpus_id aliased ``neighbor_id``, cosine).
    """
    qid, cid = "__qid__", "neighbor_id"
    q = queries.select(F.col(query_id).alias(qid),
                       F.col(vec_col).alias("__qv__"))
    c = corpus.select(F.col(corpus_id).alias(cid),
                      F.col(vec_col).alias("__cv__"))
    if method == "exact":
        if max_pairs is not None:
            # ONE guard job, not two (optimization r8): both 1-row counts
            # cross-join into a single collected row
            row = (q.agg(F.count(F.lit(1)).alias("__nq__"))
                   .crossJoin(c.agg(F.count(F.lit(1)).alias("__nc__")))
                   .collect()[0])
            npairs = int(row["__nq__"]) * int(row["__nc__"])
            if npairs > max_pairs:
                raise ValueError(
                    f"knn_join: {npairs} query×corpus pairs exceeds the "
                    f"exact-path guard ({max_pairs}); use method='ivf' "
                    f"or pass max_pairs=None deliberately")
        pairs = c.crossJoin(F.broadcast(q))
    elif method == "ivf":
        centroids = _train_cells(c, "__cv__", n_cells, seed, sample_frac)
        if centroids is None:
            return knn_join(queries, corpus, k, vec_col, query_id,
                            corpus_id, "exact", max_pairs=None,
                            round_to=round_to)
        if len(centroids) >= 64:
            from .clustering import assign_nearest
            c_cells = assign_nearest(c, "__cv__", centroids, "__cell__")
        else:
            cd = _cell_dists("__cv__", centroids)
            best = (F.array_position(cd, F.array_min(cd)) - 1).cast("int")
            c_cells = c.withColumn("__cell__", best)
        qd = _cell_dists("__qv__", centroids)
        idxs = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
        probe = F.transform(
            F.slice(F.array_sort(F.arrays_zip(qd, idxs.cast("array<double>"))),
                    1, nprobe),
            lambda s: s["1"].cast("int"))
        q_probe = q.withColumn("__cell__", F.explode(probe))
        pairs = c_cells.join(F.broadcast(q_probe), "__cell__")
    else:
        raise ValueError(f"knn_join method {method!r}")
    cos = _cosine(_dot("__cv__", F.col("__qv__")),
                  _norm("__cv__"), _norm(F.col("__qv__")))
    scored = pairs.select(qid, cid, cos.alias("cosine"))
    from pyspark.sql import Window
    w = Window.partitionBy(qid).orderBy(F.desc("cosine"), F.asc(cid))
    out = (scored.withColumn("__rn__", F.row_number().over(w))
           .filter(F.col("__rn__") <= k).drop("__rn__")
           .withColumnRenamed(qid, query_id))
    if round_to is not None:
        out = out.withColumn("cosine", F.round(F.col("cosine"), round_to))
    return out
