"""Prototype: doc_quality perf — translate-based punct count (char map, no
regex) + let-bound token array for stopword ratio, vs current regex path."""
from __future__ import annotations

import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import build_session
from pandas_expr_spark.functions import text
from pandas_expr_spark.sources.tables import load_table

# exactly the chars matched by Java regex [A-Za-z0-9\s]
_ALNUM_WS = string.ascii_letters + string.digits + " \t\n\x0b\f\r"


def punct_ratio_translate(col):
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    p = F.length(F.translate(c, _ALNUM_WS, ""))
    return F.when(n > 0, p / n).otherwise(F.lit(0.0))


def stopword_ratio_bound(col, stopwords=None):
    sw = stopwords or text._STOPWORDS
    toks = text.word_tokens(col)

    def ratio(t):
        hits = F.size(F.filter(t, lambda x: F.lower(x).isin(sw)))
        return F.when(F.size(t) > 0, hits / F.size(t)).otherwise(F.lit(0.0))

    return F.element_at(F.transform(F.array(toks), ratio), 1)


def run(spark, sf_dir, which):
    docs = load_table(spark, sf_dir, "documents")
    if which == "current":
        pr, sr = text.punct_ratio("text"), text.stopword_ratio("text")
    else:
        pr, sr = punct_ratio_translate("text"), stopword_ratio_bound("text")
    q = (docs.withColumn("pr", pr).withColumn("sr", sr)
         .groupBy("source")
         .agg(F.count(F.lit(1)).alias("n"),
              F.round(F.avg("pr"), 4).alias("avg_punct_ratio"),
              F.round(F.avg("sr"), 4).alias("avg_stopword_ratio")))
    t0 = time.perf_counter()
    rows = sorted(map(tuple, q.collect()))
    return rows, time.perf_counter() - t0


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, "/root/testdata/sf0.001", "current")
    run(spark, "/root/testdata/sf0.001", "new")
    base = None
    for which in ("current", "new", "current", "new"):
        rows, dt = run(spark, sf_dir, which)
        if base is None:
            base = rows
        print(f"{which:8s}: {dt:.3f}s  match={rows == base}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
