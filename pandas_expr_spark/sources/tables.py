"""Test-table loading with nanosecond-timestamp normalization.

Spark has no nanosecond timestamp type and rejects TIMESTAMP(NANOS) parquet
columns.  With ``spark.sql.legacy.parquet.nanosAsLong=true`` (set in
``_session``) they arrive as ``long`` nanos; this helper detects ns columns
from the parquet footer (driver-side, metadata only — no data read) and
converts them to microsecond timestamps.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame as SparkDF, SparkSession, functions as F

__all__ = ["load_table", "ns_timestamp_columns"]

_NS_COLS_CACHE: dict[str, list[str]] = {}


def ns_timestamp_columns(path: str) -> list[str]:
    """Columns stored as TIMESTAMP(NANOS) — from the parquet footer."""
    if path in _NS_COLS_CACHE:
        return _NS_COLS_CACHE[path]
    import pyarrow.parquet as pq
    import pyarrow as pa
    f = path
    if os.path.isdir(path):
        parts = glob.glob(os.path.join(path, "*.parquet"))
        if not parts:
            _NS_COLS_CACHE[path] = []
            return []
        f = parts[0]
    schema = pq.read_schema(f)
    cols = [name for name, typ in zip(schema.names, schema.types)
            if pa.types.is_timestamp(typ) and typ.unit == "ns"]
    _NS_COLS_CACHE[path] = cols
    return cols


def load_table(spark: SparkSession, sf_dir: str, name: str) -> SparkDF:
    """Read ``{sf_dir}/{name}.parquet`` with ns→µs timestamp normalization."""
    path = f"{sf_dir}/{name}.parquet"
    try:
        # required for TIMESTAMP(NANOS) columns; runtime-settable
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    sdf = spark.read.parquet(path)
    for c in ns_timestamp_columns(path):
        # integer `div` — double division loses precision above 2^53
        # (epoch-ns ≈ 1.7e18), which would skew µs values by ±128 ns
        sdf = sdf.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return sdf
