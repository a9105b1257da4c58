"""User-defined table functions (SURVEY §2.10 — the one UDF-family row the
reference leaves empty; ``pyspark.sql.udtf`` is the Spark 4 surface).

LLM-pipeline use case: document chunking — one document row explodes into
N overlapping-or-not chunk rows with positional metadata, the standard
pre-tokenization step before embedding/training-shard writes.

Two implementations with identical semantics:

* ``chunk_expr`` — JVM-side (``F.split`` + ``F.transform`` over a
  ``F.sequence`` of chunk starts, then ``posexplode``): whole-stage
  codegen, no Python — the one to run over 100 TB.
* ``ChunkDocuments`` — a real Python UDTF (``@udtf`` + lateral join):
  exercises the UDTF API surface itself.  Python-per-row is the slow path
  by design here; the class exists to provide the *API*, the hot path is
  ``chunk_expr``.

Both are exact-gated against the same DuckDB oracle
(``__spark_entry__.oracle_sql()['udtf_chunk_documents']``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, functions as F
from pyspark.sql.functions import udtf

__all__ = ["ChunkDocuments", "chunk_expr", "chunk_documents",
           "register_chunk_udtf"]


@udtf(returnType="chunk_id: int, chunk_text: string, n_chunk_tokens: int")
class ChunkDocuments:
    """``LATERAL chunk_documents(text, chunk_size)`` — whitespace-token
    chunks with id + token count."""

    def eval(self, text: str, chunk_size: int):
        toks = (text or "").split()
        for j, i in enumerate(range(0, len(toks), chunk_size)):
            part = toks[i:i + chunk_size]
            yield j, " ".join(part), len(part)


def register_chunk_udtf(spark, name: str = "chunk_documents") -> str:
    spark.udtf.register(name, ChunkDocuments)
    return name


def chunk_expr(sdf: SparkDF, text_col: str = "text", chunk_size: int = 50,
               out_prefix: str = "chunk") -> SparkDF:
    """JVM-side equivalent of the UDTF: split → sequence of chunk starts →
    slice+join per chunk → posexplode.  One narrow map stage."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    starts = F.sequence(F.lit(0),
                        F.floor((n - 1) / chunk_size).cast("int"))
    chunks = F.transform(
        starts,
        lambda j: F.struct(
            F.array_join(F.slice(toks, j * chunk_size + 1, chunk_size), " ")
            .alias("text"),
            F.least(F.lit(chunk_size), n - j * chunk_size).alias("n")))
    out = sdf.withColumn("__chunks__", chunks).select(
        "*", F.posexplode("__chunks__").alias(f"{out_prefix}_id", "__c__"))
    return (out
            .withColumn(f"{out_prefix}_text", F.col("__c__.text"))
            .withColumn(f"n_{out_prefix}_tokens",
                        F.col("__c__.n").cast("int"))
            .drop("__chunks__", "__c__"))


def chunk_documents(sdf: SparkDF, id_col: str = "doc_id",
                    text_col: str = "text", chunk_size: int = 50,
                    use_udtf: bool = False) -> SparkDF:
    """Chunk every document; ``use_udtf=True`` routes through the Python
    UDTF lateral join (API surface), else the JVM expression (hot path)."""
    if use_udtf:
        spark = sdf.sparkSession
        register_chunk_udtf(spark)
        sdf.select(id_col, text_col).createOrReplaceTempView("__docs_to_chunk__")
        return spark.sql(f"""
            SELECT d.{id_col}, c.chunk_id, c.chunk_text, c.n_chunk_tokens
            FROM __docs_to_chunk__ d,
                 LATERAL chunk_documents(d.{text_col}, {int(chunk_size)}) c
        """)
    out = chunk_expr(sdf.select(id_col, text_col), text_col, chunk_size)
    return out.select(id_col, F.col("chunk_id"), F.col("chunk_text"),
                      F.col("n_chunk_tokens"))
