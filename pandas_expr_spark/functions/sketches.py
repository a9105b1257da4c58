"""Mergeable-sketch analytics (Apache DataSketches via Spark 4 built-ins).

Nothing like this exists in the reference (its only approximation surface is
the dead ``nunique_approx`` API, ``_collection.py:282-283``).  At 100 TB,
sketches are the difference between "one shuffle of a few KB per group" and
"a full repartition of the raw column":

* every sketch here is an ASSOCIATIVE, MERGEABLE aggregate — Spark computes
  partial sketches map-side and merges the (KB-sized) states in the reduce,
  so network traffic is O(groups × sketch_size), independent of row count;
* sketch states can be persisted (binary column) and re-merged later —
  incremental daily rollups without reprocessing history.

Exact heavy-hitters is included too: Spark's TopK (TakeOrderedAndProject)
after a count is already distributed-partial; it stays exact and
oracle-checkable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame as SparkDF, functions as F

from .text import word_tokens

__all__ = ["top_tokens", "kll_quantiles", "theta_distinct",
           "audience_overlap", "cms_token_counts"]


def top_tokens(sdf: SparkDF, text_col: str = "text", k: int = 20,
               min_len: int = 1) -> SparkDF:
    """Exact top-k tokens by document frequency-weighted count:
    explode(tokens) → groupBy(token).count() → distributed TopK.
    The explode is narrow; the count is one partial+final agg on the token;
    the top-k never sorts globally (TakeOrderedAndProject)."""
    toks = (sdf.select(F.explode(word_tokens(text_col)).alias("token"))
            .filter(F.length("token") >= min_len))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(k)


def kll_quantiles(sdf: SparkDF, value_col: str, probs: Sequence[float],
                  by: Sequence[str] | str | None = None,
                  k: int = 200) -> SparkDF:
    """Per-group quantiles from a KLL sketch (``kll_sketch_agg_double``):
    one pass, mergeable state ~KBs per group regardless of group size —
    the scale path where exact ``percentile`` would shuffle every value.
    ``k`` trades size for accuracy (~1.7%% rank error at k=200)."""
    by = [by] if isinstance(by, str) else list(by or [])
    sk = F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k))
    g = sdf.groupBy(*by) if by else sdf.groupBy()
    out = g.agg(sk.alias("__sk__"))
    cols = [F.kll_sketch_get_quantile_double(F.col("__sk__"), F.lit(p))
            .alias(f"q{int(p * 100)}") for p in probs]
    return out.select(*by, *cols)


def theta_distinct(sdf: SparkDF, value_col: str,
                   by: Sequence[str] | str | None = None) -> SparkDF:
    """Approximate distinct count per group via a theta sketch — like HLL
    but the states also support set INTERSECTION/DIFFERENCE (see
    ``audience_overlap``)."""
    by = [by] if isinstance(by, str) else list(by or [])
    g = sdf.groupBy(*by) if by else sdf.groupBy()
    out = g.agg(F.theta_sketch_agg(F.col(value_col)).alias("__sk__"))
    return out.select(*by, F.theta_sketch_estimate(F.col("__sk__"))
                      .cast("long").alias("n_distinct"))


def audience_overlap(sdf: SparkDF, id_col: str, seg_col: str) -> SparkDF:
    """Pairwise audience overlap between segments (e.g. users per
    event_type): build ONE theta sketch per segment (tiny), then intersect
    sketch states pairwise driver-side via SQL set ops — the raw-data cost
    is a single pass; the pairwise work touches only KB-sized states.
    Returns (seg_a, seg_b, n_a, n_b, n_overlap)."""
    sk = (sdf.groupBy(seg_col)
          .agg(F.theta_sketch_agg(F.col(id_col)).alias("sk"),
               F.theta_sketch_estimate(
                   F.theta_sketch_agg(F.col(id_col))).cast("long").alias("n")))
    a = sk.select(F.col(seg_col).alias("seg_a"), F.col("sk").alias("sk_a"),
                  F.col("n").alias("n_a"))
    b = sk.select(F.col(seg_col).alias("seg_b"), F.col("sk").alias("sk_b"),
                  F.col("n").alias("n_b"))
    pairs = a.join(b, F.col("seg_a") < F.col("seg_b"))  # sketches are tiny
    est = F.expr("theta_sketch_estimate(theta_intersection(sk_a, sk_b))")
    return pairs.select("seg_a", "seg_b", "n_a", "n_b",
                        est.cast("long").alias("n_overlap"))


def cms_token_counts(sdf: SparkDF, text_col: str,
                     candidates: Sequence[str],
                     eps: float = 0.0001, conf: float = 0.99,
                     seed: int = 42) -> SparkDF:
    """Count-min-sketch frequencies for a candidate token list: ONE
    mergeable sketch over the exploded tokens, then point queries against
    the state.  Never exact-counts the long tail — the right shape when the
    vocabulary is huge but only known candidates matter."""
    toks = sdf.select(F.explode(word_tokens(text_col)).alias("token"))
    cms = toks.agg(F.count_min_sketch(
        F.col("token"), F.lit(eps), F.lit(conf), F.lit(seed)).alias("sk"))
    # The distributed work ends with ONE merged KB-sized state; point
    # queries read it via Spark's public sketch API (the SQL estimator
    # function is not in every build).
    state = bytes(cms.collect()[0]["sk"])
    spark = sdf.sparkSession
    jvm = spark._jvm
    bais = jvm.java.io.ByteArrayInputStream(state)
    jcms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bais)
    rows = [(t, int(jcms.estimateCount(t))) for t in candidates]
    return spark.createDataFrame(rows, "token string, est_count long")
