"""Prototype: explode-based MinHash signatures vs the HOF-lambda approach.

Hypothesis (NOTES_r1.md): HOF lambdas (transform/array_min) are
CodegenFallback — interpreted.  Exploding shingle hashes to rows and taking
32 min-aggs per doc stays in whole-stage codegen + partial agg, at the cost
of one shuffle on doc_id.  Measure both at sf0.1.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import build_session
from pandas_expr_spark.functions.dedup import (
    _MERSENNE, _perm_params, minhash_signature, _banded)
from pandas_expr_spark.sources.tables import load_table


def minhash_signature_exploded(sdf, text_col="text", id_col="doc_id",
                               num_perm=32, shingle_n=3, seed=42):
    """(id, sig array<long>) via explode + groupBy min-aggs (codegen path)."""
    c = F.col(text_col)
    toks = F.split(F.trim(c), r"\s+")
    th = F.transform(toks, lambda t: F.abs(F.xxhash64(t)) % _MERSENNE)
    if shingle_n <= 1:
        base = th
    else:
        idx = F.sequence(F.lit(0), F.greatest(F.size(th) - shingle_n, F.lit(0)))
        mixers = [1000003, 999983, 999979, 999961, 999959][:shingle_n - 1]

        def one(i):
            h = F.element_at(th, i + shingle_n)
            for j, m in enumerate(mixers):
                h = h + F.element_at(th, i + 1 + j) * m
            return h % _MERSENNE

        base = F.transform(idx, one)
    params = _perm_params(num_perm, seed)
    exploded = sdf.select(F.col(id_col), F.explode(base).alias("__h__"))
    aggs = [F.min((F.col("__h__") * a + b) % _MERSENNE).alias(f"s{i}")
            for i, (a, b) in enumerate(params)]
    g = exploded.groupBy(id_col).agg(*aggs)
    return g.select(id_col, F.array(*[f"s{i}" for i in range(num_perm)])
                    .alias("__sig__"))


def run(spark, sf_dir, which):
    docs = load_table(spark, sf_dir, "documents")
    if which == "hof":
        sig = docs.select("doc_id", minhash_signature("text").alias("__sig__"))
    else:
        sig = minhash_signature_exploded(docs)
    bb = _banded(sig, "doc_id", "__sig__", 8, 4).persist()
    a = bb.select(F.col("doc_id").alias("id_a"), "band", "bucket")
    b = bb.select(F.col("doc_id").alias("id_b"), "band", "bucket")
    pairs = (a.join(b, ["band", "bucket"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b").distinct())
    t0 = time.perf_counter()
    n = pairs.count()
    dt = time.perf_counter() - t0
    bb.unpersist()
    return n, dt


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up
    run(spark, "/root/testdata/sf0.001", "hof")
    run(spark, "/root/testdata/sf0.001", "exploded")
    for which in ("hof", "exploded", "hof", "exploded"):
        n, dt = run(spark, sf_dir, which)
        print(f"{which:9s}: pairs={n}  {dt:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
