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

__all__ = ["load_table", "ns_timestamp_columns", "normalize_ts"]

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


def _require_utc(spark: SparkSession) -> None:
    """The NTZ→LTZ cast is value-preserving ONLY under a UTC session
    timezone (``_session.py`` pins it; don't rely on that by convention —
    a non-UTC caller would silently shift every event time)."""
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00"):
        raise ValueError(
            f"timestamp normalization requires a UTC session timezone "
            f"(spark.sql.session.timeZone={tz!r}); set it to 'UTC' or "
            f"convert with to_utc_timestamp explicitly")


def normalize_ts(sdf: SparkDF, col: str = "ts") -> SparkDF:
    """Normalize an event-time column to TIMESTAMP (LTZ) whatever the source
    layout: int64 **epoch-nanoseconds** (legacy nanosAsLong reads — a plain
    long column holding anything else, e.g. epoch-millis or an id, would be
    misconverted, so only pass true ns-epoch columns), TIMESTAMP_NTZ (µs
    parquet without tz under Spark 4's inferTimestampNTZ), or already-LTZ.
    Works on batch AND streaming DataFrames (type dispatch is on the
    analyzed schema, no data read).  Watermarks/windows require LTZ; the
    session timezone must be UTC so the NTZ cast is value-preserving
    (checked)."""
    from pyspark.sql import types as T
    if col not in sdf.columns:
        raise ValueError(f"normalize_ts: column {col!r} not in schema "
                         f"{sdf.columns}")
    dt = sdf.schema[col].dataType
    if isinstance(dt, T.LongType):
        # integer `div` — double division loses precision above 2^53
        return sdf.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        _require_utc(sdf.sparkSession)
        return sdf.withColumn(col, F.col(col).cast("timestamp"))
    return sdf


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
    # µs parquet timestamps without a timezone arrive as TIMESTAMP_NTZ under
    # Spark 4's inferTimestampNTZ.  Normalize to TIMESTAMP (LTZ): the session
    # timezone is pinned to UTC (_session.py) so the cast is value-preserving,
    # and event-time features (withWatermark, streaming windows) require LTZ.
    from pyspark.sql import types as T
    ntz = [f.name for f in sdf.schema.fields
           if isinstance(f.dataType, T.TimestampNTZType)]
    if ntz:
        _require_utc(spark)
        sdf = sdf.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return sdf
