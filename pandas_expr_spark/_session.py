"""SparkSession management and engine-level configuration.

Defaults are tuned for the driver's local[32] harness but chosen to be the
settings you would also want on a 1000-executor cluster reading ~100 TB:

* AQE on (runtime partition coalescing, skew-join splitting, dynamic
  broadcast) — replaces hand-tuned shuffle partition counts at scale.
* Arrow on — every ``.compute()``/pandas-UDF crossing is Arrow-batched.
* ``spark.sql.shuffle.partitions`` defaults to a modest local value; AQE
  coalesces down and, on a real cluster, splits skewed partitions up.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # Keep scans well-sized: 128 MiB splits are the right default at 100 TB.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # NOTE: do NOT add spark.sql.files.minPartitionNum/openCostInBytes
    # split hints here.  They pad small scans with empty slices, which
    # perturbs the rowid/self-join position machinery (zipWithIndex over
    # the scan RDD) into duplicating rows — observed as 3 window gates
    # returning partition-dependent rowcounts.  Small single-row-group
    # files can't split anyway; operators that need width repartition
    # explicitly (minhash/decontaminate/cleaning pattern).
    "spark.ui.enabled": "false",
    # read TIMESTAMP(NANOS) parquet columns as long (Spark has no ns type);
    # sources.load_table converts them to microsecond timestamps
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(app_name: str = "pandas-expr-spark") -> SparkSession:
    """Get (or create) the engine's SparkSession.

    Respects an already-active session (e.g. the driver's) and only applies
    defaults when building a fresh one.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    for k, v in _DEFAULT_CONFS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
