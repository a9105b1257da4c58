"""Sequence packing for training shards (LLM-pipeline extension).

Pretraining consumes fixed-length token windows; the standard prep step is
**concat-and-chop packing**: concatenate the (tokenized) documents into a
stream and cut every ``budget`` tokens.  Each document's pack assignment is
then a pure function of the running token offset — no greedy bin state, so
it distributes:

* documents are hash-bucketed (md5 — bit-identical across engines, stable
  under repartitioning, same helper as ``splits.hash_bucket``) so each
  bucket's stream is bounded and independent → the window below is
  PARTITIONED, never a global window;
* within a bucket, documents are ordered by id (deterministic), the
  running token count is one partitioned window cumsum, and
  ``bin = floor(prev_cumsum / budget)``, ``offset = prev_cumsum % budget``.

One shuffle on the bucket key; every bin except a bucket's last is exactly
``budget`` tokens full (documents spanning a cut belong to the bin where
their first token lands).  At 100 TB: buckets ≈ shard files; write the
result partitioned by ``(bucket, bin)`` and each training shard is one
partition-pruned read.

The whole computation is SQL-expressible, so the driver gate
(``pack_sequences_documents``) is an EXACT DuckDB oracle check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, Window, functions as F

from .splits import hash_bucket

__all__ = ["pack_documents"]


def pack_documents(sdf: SparkDF, budget: int = 512, n_buckets: int = 16,
                   id_col: str = "doc_id", text_col: str = "text",
                   salt: str = "") -> SparkDF:
    """Assign every document a ``(bucket, bin_id, offset)`` pack position.

    ``n_tokens`` is the whitespace token count (swap in a real tokenizer's
    count column upstream if available — the packing math is unchanged).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    bucket = (hash_bucket(id_col, salt) % n_buckets).alias("bucket")
    base = sdf.select(F.col(id_col), bucket, toks.alias("n_tokens"))
    w = (Window.partitionBy("bucket").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("n_tokens").over(w)
    prev = (cum - F.col("n_tokens")).alias("__prev__")
    out = base.select(id_col, "bucket", "n_tokens", prev)
    return out.select(
        id_col, "bucket", "n_tokens",
        F.floor(F.col("__prev__") / budget).cast("bigint").alias("bin_id"),
        (F.col("__prev__") % budget).cast("bigint").alias("offset"))


def write_training_shards(sdf: SparkDF, path: str, budget: int = 512,
                          n_buckets: int = 16, id_col: str = "doc_id",
                          text_col: str = "text", salt: str = "",
                          mode: str = "overwrite") -> SparkDF:
    """Materialize the training corpus as shard files + return a MANIFEST.

    Pipeline: ``pack_documents`` assigns every doc a ``(bucket, bin_id)``
    pack position → the corpus is written ``partitionBy(bucket)`` (one
    directory per shard family; a training loader partition-prunes its
    shard without touching the rest) → the manifest is ONE distributed
    aggregation over the written files: per (bucket, bin) doc count,
    token total, and id range.  Everything stays distributed — no file
    listing on the driver, no collect.

    Returns the manifest DataFrame (also written to ``{path}/_manifest``).
    """
    packed = pack_documents(sdf, budget, n_buckets, id_col, text_col, salt)
    full = packed.join(sdf, id_col)
    (full.repartition("bucket")
         .write.partitionBy("bucket").mode(mode).parquet(path))
    spark = sdf.sparkSession
    manifest = (spark.read.parquet(path)
                .groupBy("bucket", "bin_id")
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum("n_tokens").alias("n_tokens"),
                     F.min(id_col).alias("min_id"),
                     F.max(id_col).alias("max_id"))
                .orderBy("bucket", "bin_id"))
    manifest.write.mode(mode).parquet(f"{path}/_manifest")
    return manifest


__all__ += ["write_training_shards"]
