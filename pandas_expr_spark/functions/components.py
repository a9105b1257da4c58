"""Connected components over an edge list — dup-cluster assignment.

The missing link in a dedup pipeline: MinHash/SimHash/embedding LSH produce
near-duplicate *pairs*, but deduplicating a corpus needs *clusters* — every
document mapped to one canonical representative, even when duplicates chain
(A~B, B~C but A!~C).  That is connected components on the pair graph.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) expressed as
DataFrame ops:

* large-star: for each node ``u``, attach every *larger* neighbor to the
  minimum of ``u``'s neighborhood (including ``u``).
* small-star: orient edges toward the smaller endpoint; attach each node and
  its smaller neighbors to the minimum of that closed neighborhood.

Both rounds are one groupBy (min) + one join per iteration — pure
hash-shuffles, no global sort — and converge in O(log n) iterations even on
path graphs (plain min-label propagation needs O(diameter)).  Designed for
100 TB scale:

* every iteration is ``groupBy(u).min`` (map-side partial agg) + an
  equi-join on ``u`` — AQE handles skewed hub nodes;
* lineage is cut each iteration with ``localCheckpoint`` (a real cluster
  would set a checkpoint dir; the iteration count is ~log of the longest
  chain, so ~20 covers any realistic dup graph);
* convergence is detected with an O(1)-row aggregate fingerprint
  (count + sum of ``xxhash64`` over the canonical edges), not a
  ``subtract().count()`` anti-join.

Reference parity: the reference engine (pandas-expr) has no graph operator;
this extends the dedup battery the same way ``minhash_lsh_dedup`` does, per
the LLM-pipeline mandate.  See also reference README.md for the dedup
use-case framing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, functions as F

__all__ = ["connected_components", "dup_clusters", "pagerank"]


def _canon(e: SparkDF) -> SparkDF:
    """Canonical undirected edge set: (min, max), no loops, distinct."""
    return (e.select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
             .filter(F.col("u") != F.col("v"))
             .distinct())


def _fingerprint(e: SparkDF) -> tuple[int, int]:
    # bit_xor never overflows (ANSI-safe); edges are distinct so xor is a
    # faithful set fingerprint.
    row = e.agg(F.count(F.lit(1)).alias("n"),
                F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h")).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(edges: SparkDF, src: str = "src", dst: str = "dst",
                         max_iter: int = 25) -> SparkDF:
    """Map every node of the undirected graph ``edges`` to its component's
    minimum node id.

    Returns a DataFrame ``(node, component)`` covering every node that
    appears in ``edges`` (isolated nodes never enter an edge list; callers
    wanting them keep the left-join to the full node set on their side).

    Node ids must be an orderable type (int/str); component = min id.
    """
    spark = edges.sparkSession
    # Catalyst's constraint propagation can crash rewriting Union plans
    # under checkpoint (NoSuchElementException in rewriteConstraints, seen
    # at ~2M edges); the iterative star plans gain nothing from inferred
    # constraints, so disable it for the loop and restore after.
    prop_key = "spark.sql.constraintPropagation.enabled"
    prop_prev = spark.conf.get(prop_key, "true")
    spark.conf.set(prop_key, "false")
    try:
        return _cc_loop(edges, src, dst, max_iter)
    finally:
        spark.conf.set(prop_key, prop_prev)


_LOCAL_FINISH_EDGES = 200_000


def _local_union_find(rows, spark) -> SparkDF:
    """Finish tiny components on the driver: the per-round fingerprint
    already paid for the edge count, and a ≤200k-edge graph is a few MB —
    further distributed star rounds would spend multiple shuffles + an
    action each on data that fits in one hand.  Same hybrid-local-finish
    class as AQE's coalescing; result is identical (component = min id)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:   # path compression
            parent[x], x = r, parent[x]
        return r

    for u, v in rows:
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by VALUE: smaller id becomes the root, so the root
            # IS the component minimum
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    nodes = {x for uv in rows for x in uv}
    out = [(n, find(n)) for n in sorted(nodes)]
    return spark.createDataFrame(out, ["node", "component"])


def _cc_loop(edges: SparkDF, src: str, dst: str, max_iter: int) -> SparkDF:
    e = _canon(edges.select(F.col(src).alias("u"), F.col(dst).alias("v")))
    # lazy checkpoint: the first action (bounded probe below, or the
    # fingerprint aggregate on the big path) materializes it, so each
    # round costs ONE job instead of two
    e = e.localCheckpoint(eager=False)
    # ONE bounded collect decides small-vs-large AND delivers the edges
    # (optimization r8): limit(N+1) caps the driver transfer at ~N rows
    # (a few MB), so when the graph is small — the overwhelmingly common
    # dedup case — the old fingerprint job + separate collect job fuse
    # into this single probe.  A large graph pays one cheap truncated
    # scan, then proceeds distributed exactly as before.
    head = e.limit(_LOCAL_FINISH_EDGES + 1).collect()
    if len(head) <= _LOCAL_FINISH_EDGES:
        rows = [(r["u"], r["v"]) for r in head]
        if not rows:
            return e.select(F.col("u").alias("node"),
                            F.col("u").alias("component"))
        return _local_union_find(rows, edges.sparkSession)
    # large-graph path (r9, verdict ask #7): skip the up-front
    # fingerprint — the truncated probe already materialized the
    # checkpoint, and star rounds on a >cap graph essentially never
    # converge in zero rounds.  `prev=None` just means round 1 cannot
    # early-exit; an already-fixed-point input pays one extra (idempotent)
    # round instead of every input paying a full fingerprint pass.
    prev: tuple[int, int] | None = None

    for _ in range(max_iter):
        # ---- large-star: nbrs lists every directed (u, v); attach each
        # v > u to m(u) = min(N(u) ∪ {u}).
        nbrs = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (nbrs.groupBy("u").agg(F.min("v").alias("mn"))
                    .select("u", F.least("mn", "u").alias("m")))
        large = (nbrs.join(mins, "u")
                     .filter(F.col("v") > F.col("u"))
                     .select(F.col("v").alias("u"), F.col("m").alias("v")))
        e = _canon(large)

        # ---- small-star: edges already oriented (u > v after swapping);
        # attach u and each smaller neighbor to m = min(N_small(u) ∪ {u}).
        oriented = e.select(F.col("v").alias("u"), F.col("u").alias("v"))  # canon has u < v; now u > v
        mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
        small = (oriented.join(mins, "u")
                         .select(F.col("v").alias("u"), F.col("m").alias("v"))
                         .union(mins.select(F.col("u"), F.col("m").alias("v"))))
        e = _canon(small).localCheckpoint(eager=False)

        cur = _fingerprint(e)
        if cur == prev:
            break
        if cur[0] <= _LOCAL_FINISH_EDGES:
            # star rounds preserve connectivity, so components of the
            # shrunken edge set ARE the original components — finish the
            # tail convergence locally instead of more shuffle rounds
            rows = [(r["u"], r["v"]) for r in e.collect()]
            return _local_union_find(rows, edges.sparkSession)
        prev = cur

    # Fixed point is a star forest: every edge is (root, member) with
    # root = component minimum.  Roots map to themselves.
    members = e.select(F.col("v").alias("node"), F.col("u").alias("component"))
    roots = e.select(F.col("u").alias("node")).distinct() \
             .withColumn("component", F.col("node"))
    return members.union(roots).distinct()


def dup_clusters(pairs: SparkDF, id_a: str = "id_a", id_b: str = "id_b",
                 max_iter: int = 25) -> SparkDF:
    """Turn near-duplicate pairs into cluster assignments.

    Returns ``(doc_id, cluster_id, is_canonical)`` — ``cluster_id`` is the
    minimum doc id of the connected component and the canonical row is the
    one to keep.  Compose with ``minhash_lsh_pairs`` /
    ``embedding_near_dup_pairs`` for the full dedup path.
    """
    cc = connected_components(pairs, src=id_a, dst=id_b, max_iter=max_iter)
    return cc.select(F.col("node").alias("doc_id"),
                     F.col("component").alias("cluster_id"),
                     (F.col("node") == F.col("component")).alias("is_canonical"))


def pagerank(edges: SparkDF, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iters: int = 10,
             checkpoint_every: int = 4,
             n_nodes: int | None = None) -> SparkDF:
    """PageRank over an edge list — the classic link-centrality quality
    signal for web-corpus curation (domain/document authority feeds the
    keep/drop decision the same way Gopher rules do; CommonCrawl-scale
    pipelines rank hosts exactly this way).

    Distributed shape, per iteration:

    * contributions: ``ranks ⋈ edges`` on ``src`` (hash shuffle), each
      edge carries ``rank/out_degree``;
    * new ranks: ``groupBy(dst).sum`` (map-side partial agg), left-joined
      back onto the node set so sink-only nodes keep their base mass;
    * dangling mass (nodes with no out-edges): ONE scalar aggregate,
      broadcast back into the base term — never a driver-side loop over
      rows.

    Lineage is cut every ``checkpoint_every`` iterations with a lazy
    ``localCheckpoint`` (same contract as the GD trainer in
    ``curation.py``); out-degrees are computed once and reused.  No
    global sort, no collect of node-sized data.  The reference engine has
    no graph operators — this extends the LLM-pipeline battery like
    ``connected_components`` does.
    """
    # checkpoint the edge list once — every iteration joins against it,
    # and an un-cut lineage would rescan/rebuild the upstream edge plan
    # per iteration
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .localCheckpoint(eager=False))
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint(eager=False))
    # optimization r8: callers that already know the node count (e.g.
    # they just counted the corpus to build the edge list) pass it in
    # and skip a dedicated distinct+count job — at scale that is a full
    # edge-list pass; the value MUST equal nodes.count() or rank mass
    # is misnormalized.
    if n_nodes is None:
        n_nodes = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg__"))
    # degree rides on the rank frame so the per-iteration join is ONE
    # ranks⋈edges equi-join, not two
    ranks = (nodes.join(deg, nodes["node"] == deg["src"], "left")
             .select("node",
                     F.lit(1.0 / n_nodes).alias("rank"),
                     F.col("__deg__"))
             .localCheckpoint(eager=False))
    base = (1.0 - damping) / n_nodes
    for it in range(iters):
        dangling = (ranks.filter(F.col("__deg__").isNull())
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                         .alias("__dm__")))
        contrib = (ranks.filter(F.col("__deg__").isNotNull())
                   .join(e, ranks["node"] == e["src"])
                   .select(F.col("dst").alias("node"),
                           (F.col("rank") / F.col("__deg__"))
                           .alias("__c__")))
        summed = contrib.groupBy("node").agg(F.sum("__c__").alias("__s__"))
        ranks = (ranks.select("node", "__deg__")
                 .join(summed, "node", "left")
                 .crossJoin(F.broadcast(dangling))
                 .select("node",
                         (F.lit(base)
                          + F.lit(damping)
                          * (F.coalesce(F.col("__s__"), F.lit(0.0))
                             + F.col("__dm__") / F.lit(float(n_nodes))))
                         .alias("rank"),
                         F.col("__deg__")))
        if (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", "rank")
