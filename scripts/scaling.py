"""Measured scaling curves (r6 verdict ask #2): run the most expensive
gates at sf0.1 and at an isomorphic 10x corpus, record wall times and the
observed scaling exponent  e = log(T10 / T1) / log(10)  (e=1 linear,
e<1 sublinear fixed-overhead amortization, e>1 superlinear — a flag).

The 10x corpus preserves workload STRUCTURE instead of naively
replicating rows (which would plant 10 exact dups of every document and
quadratically inflate dedup candidate pairs):

- documents x10: copy k rewrites every word token w -> w + "q<k>"
  (disjoint vocabulary per copy) and offsets doc_id — each copy is an
  isomorphic corpus; within-copy near-dup/ngram/BPE structure is exactly
  preserved, cross-copy similarity is zero.
- embeddings x10: copy k multiplies each dimension by a seeded +-1 sign
  pattern — norms and ALL within-copy cosines are exactly preserved,
  cross-copy cosines are randomized; vec_id offset per copy.
- lineitem/orders x10: key-offset copies (l_orderkey/o_orderkey shifted
  per copy); dimension tables stay 1x, as dims do at real scale.

Usage: python scripts/scaling.py [--skip-gen] [gate ...]
Writes /tmp/pes_scale/x10/*.parquet and prints one JSON line per gate;
the committed summary lives in SCALING.md.
"""
from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
COPIES = int(os.environ.get("PES_SCALE_COPIES", "10"))
DST = f"/tmp/pes_scale/x{COPIES}"

GATES = [
    "doc_dedup_pipeline",
    "minhash_verified_dups",
    "semdedup_embeddings",
    "embedding_kmeans",
    "dsir_select_docs",
    "trained_quality_scorer",
    "knn_join_embeddings",
    "doc_link_pagerank",
    "bpe_learn_documents",
    "training_mix_pipeline",
    # TPC-H anchors: scan+agg and multi-join shapes
    "q1_pricing_summary",
    "q3_topk_revenue",
    # r8 additions (VERDICT r7 #3): the measured-coverage gaps
    "bpe_encode_documents",
    "doc_incremental_dedup",
    "fuzzy_dup_pairs_edit",
    "streaming_hourly_events",
    # r9 additions: the scan-family summary fold (orders/events scale)
    "rolling_minmax_orders",
    "ffill_global_events",
    "window_lag_cumsum_orders",
    "doc_line_dedup",
]

UNSCALED = ["region", "nation", "customer", "supplier", "part"]


def build_session():
    from pyspark.sql import SparkSession
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return (SparkSession.builder.master(f"local[{cpus}]")
            .appName("pes-scaling")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.shuffle.partitions", str(cpus))
            .config("spark.locality.wait", "0")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.driver.memory",
                    os.environ.get("PES_DRIVER_MEM", "24g"))
            .getOrCreate())


def generate(spark):
    from pyspark.sql import functions as F
    os.makedirs(DST, exist_ok=True)
    for t in UNSCALED:
        dst = f"{DST}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copy(f"{SRC}/{t}.parquet", dst)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    max_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    parts = []
    for k in range(COPIES):
        d = docs
        if k > 0:
            # disjoint vocabulary per copy: every word token gets a
            # per-copy suffix; similarity structure WITHIN the copy is
            # exactly preserved, ACROSS copies destroyed
            d = d.withColumn(
                "text", F.regexp_replace("text", r"(\w+)", rf"$1q{k}"))
        d = (d.withColumn("doc_id", F.col("doc_id") + F.lit(k * max_doc))
             .withColumn("n_chars", F.length("text").cast("long")))
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite") \
        .parquet(f"{DST}/documents.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    max_vec = emb.agg(F.max("vec_id")).first()[0] + 1
    parts = []
    for k in range(COPIES):
        e = emb
        if k > 0:
            # seeded +-1 sign pattern per (copy, dimension): an isometry,
            # so norms and within-copy cosines are EXACT; cross-copy
            # cosines randomized
            e = e.withColumn(
                "embedding",
                F.expr(f"transform(embedding, (x, i) -> x * "
                       f"(2.0 * pmod(hash({k} * 10007 + i), 2) - 1.0))")
                .cast("array<float>"))
        e = e.withColumn("vec_id", F.col("vec_id") + F.lit(k * max_vec))
        parts.append(e)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(16).write.mode("overwrite") \
        .parquet(f"{DST}/embeddings.parquet")

    # events xk (r8: the streaming gate joins the measured set): copy j
    # offsets event_id/user_id — timestamps identical, so the hourly
    # window COUNT of state rows stays constant while per-window volume
    # scales xk (the realistic shape: more traffic, same time span)
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    mx_e = ev.agg(F.max("event_id")).first()[0] + 1
    mx_u = ev.agg(F.max("user_id")).first()[0] + 1
    parts = [ev.withColumn("event_id", F.col("event_id") + F.lit(k * mx_e))
               .withColumn("user_id", F.col("user_id") + F.lit(k * mx_u))
             for k in range(COPIES)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # SINGLE FILE like the driver's sf layout — the streaming gate's
    # pathGlobFilter matches the leaf filename "events.parquet"
    import glob as _glob
    tmp = f"{DST}/_events_tmp"
    out.repartition(1).write.mode("overwrite").parquet(tmp)
    part = _glob.glob(f"{tmp}/part-*.parquet")[0]
    if os.path.isdir(f"{DST}/events.parquet"):
        shutil.rmtree(f"{DST}/events.parquet")
    shutil.move(part, f"{DST}/events.parquet")
    shutil.rmtree(tmp)

    for t, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        sdf = spark.read.parquet(f"{SRC}/{t}.parquet")
        mx = sdf.agg(F.max(key)).first()[0] + 1
        parts = [sdf.withColumn(key, F.col(key) + F.lit(k * mx))
                 for k in range(COPIES)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite") \
            .parquet(f"{DST}/{t}.parquet")
    print(json.dumps({"generated": DST, "copies": COPIES}))


def time_gate(spark, fn, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skip_gen = "--skip-gen" in sys.argv
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    if not skip_gen:
        generate(spark)
    import __spark_entry__ as entry
    qs = entry.queries()
    gates = args or GATES
    results = {}
    for g in gates:
        fn = qs[g]
        t1 = time_gate(spark, fn, SRC)
        t10 = time_gate(spark, fn, DST)
        exp = round(math.log(max(t10, 1e-9) / max(t1, 1e-9)) / math.log(COPIES), 3)
        results[g] = {"t_sf0.1": t1, f"t_x{COPIES}": t10,
                      "exponent": exp}
        print(json.dumps({g: results[g]}), flush=True)
    print(json.dumps({"scaling": results}))
    spark.stop()


if __name__ == "__main__":
    main()
