"""pandas dtype ⇄ Spark DataType mapping.

The reference supports whatever pandas 2.x supports (SURVEY §1.4;
``pyproject.toml:25-29``).  This table covers every type family its tests
exercise plus the Spark-native extras (decimal/map/struct/array) we get free.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

_PANDAS_TO_SPARK: dict[str, T.DataType] = {
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "int": T.LongType(),
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.LongType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "float": T.DoubleType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "object": T.StringType(),
    "str": T.StringType(),
    "string": T.StringType(),
    "datetime64[ns]": T.TimestampType(),
    "datetime64[us]": T.TimestampType(),
    "datetime64[ms]": T.TimestampType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
}

_SPARK_TO_PANDAS: dict[type, str] = {
    T.ByteType: "int8",
    T.ShortType: "int16",
    T.IntegerType: "int32",
    T.LongType: "int64",
    T.FloatType: "float32",
    T.DoubleType: "float64",
    T.BooleanType: "bool",
    T.StringType: "object",
    T.TimestampType: "datetime64[ns]",
    T.TimestampNTZType: "datetime64[ns]",
    T.DateType: "object",
    T.BinaryType: "object",
}


def to_spark_type(dtype: Any) -> T.DataType:
    """Convert a pandas/numpy dtype (or its string name) to a Spark type."""
    if isinstance(dtype, T.DataType):
        return dtype
    name = getattr(dtype, "name", None) or str(dtype)
    # numpy dtype objects / np.int64 classes
    if hasattr(dtype, "__name__"):
        name = dtype.__name__
    name = name.lower()
    if name in _PANDAS_TO_SPARK:
        return _PANDAS_TO_SPARK[name]
    if name.startswith("decimal"):
        import re
        m = re.match(r"decimal\((\d+),\s*(\d+)\)", name)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        return T.DecimalType(38, 18)
    raise TypeError(f"Unsupported dtype for Spark conversion: {dtype!r}")


def to_pandas_dtype(dt: T.DataType):
    """pandas dtype OBJECT for a Spark type (used by ``.dtype``/
    ``.dtypes``).  A real ``np.dtype`` — pandas exposes ``.kind``/
    ``.itemsize`` on it and user code relies on that; ``np.dtype ==
    "int64"`` string comparisons still hold."""
    import numpy as np
    for cls, name in _SPARK_TO_PANDAS.items():
        if isinstance(dt, cls):
            return np.dtype(name)
    return np.dtype("object")


def is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, T.NumericType)
