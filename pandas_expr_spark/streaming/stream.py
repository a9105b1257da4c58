"""Structured-Streaming slice (SURVEY §2.9 — greenfield; nothing exists in
the reference, whose only ordered structure is the single-partition index).

Batch/stream unification: every windowed aggregation here takes and returns
plain Spark DataFrames, so the *same* helper works on a batch frame (unit
tests, backfills) and a ``readStream`` frame (production) — the Structured
Streaming contract.

Late-data policy is explicit: ``withWatermark`` bounds state; at 100 TB/day
the watermark is what keeps the shuffle-state store finite.  Stateful custom
logic uses Arrow-batched ``applyInPandasWithState``.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Callable

from pyspark.sql import Column, DataFrame as SparkDF, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .._session import get_spark

__all__ = ["read_stream", "tumbling_window_agg", "sliding_window_agg",
           "session_window_agg", "stream_stream_join",
           "stateful_running_agg",
           "stateful_running_agg_tws", "stateful_stream_dedup",
           "stateful_stream_dedup_tws", "write_stream", "to_memory_sink",
           "state_partitions"]


@contextmanager
def state_partitions(n: int):
    """Scope ``spark.sql.shuffle.partitions`` around a stream START.

    A streaming aggregation's state store is hash-partitioned by the
    shuffle-partition count IN EFFECT WHEN THE QUERY FIRST STARTS, and that
    count is then pinned in the checkpoint for the query's lifetime — so it
    must be sized to the stream's key cardinality/volume deliberately, not
    inherited from whatever the session happens to use for batch joins.
    Low-volume streams with few keys waste a fixed per-microbatch task cost
    on every idle partition (measured ~2-3.5 s/batch at 64 partitions vs
    ~0.3 s at 8 on the events table); a 100 TB/day stream wants hundreds.
    """
    spark = get_spark()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def read_stream(format: str = "parquet", path: str | None = None,
                schema: T.StructType | str | None = None,
                max_files_per_trigger: int | None = None,
                options: dict | None = None) -> SparkDF:
    """``spark.readStream`` with the file-source knobs that matter at scale
    (``maxFilesPerTrigger`` caps per-microbatch work)."""
    spark = get_spark()
    r = spark.readStream.format(format)
    if schema is not None:
        r = r.schema(schema)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    for k, v in (options or {}).items():
        r = r.option(k, v)
    return r.load(path) if path else r.load()


def _agg_cols(aggs: dict[str, tuple[str, str]]) -> list[Column]:
    fns = {"sum": F.sum, "count": F.count, "avg": F.avg, "mean": F.avg,
           "min": F.min, "max": F.max,
           "approx_nunique": F.approx_count_distinct}
    return [fns[fn](col).alias(out) for out, (col, fn) in aggs.items()]


def tumbling_window_agg(sdf: SparkDF, ts_col: str, window: str,
                        aggs: dict[str, tuple[str, str]],
                        keys: list[str] | None = None,
                        watermark: str | None = None) -> SparkDF:
    """Fixed windows: ``F.window(ts, '10 minutes')`` + optional watermark.
    Works identically on batch and streaming frames."""
    if watermark and sdf.isStreaming:
        sdf = sdf.withWatermark(ts_col, watermark)
    gb = [F.window(F.col(ts_col), window).alias("window")] + [
        F.col(k) for k in (keys or [])]
    return (sdf.groupBy(*gb).agg(*_agg_cols(aggs))
            .select(F.col("window.start").alias("window_start"),
                    F.col("window.end").alias("window_end"),
                    *[F.col(k) for k in (keys or [])],
                    *[F.col(o) for o in aggs]))


def sliding_window_agg(sdf: SparkDF, ts_col: str, window: str, slide: str,
                       aggs: dict[str, tuple[str, str]],
                       keys: list[str] | None = None,
                       watermark: str | None = None) -> SparkDF:
    if watermark and sdf.isStreaming:
        sdf = sdf.withWatermark(ts_col, watermark)
    gb = [F.window(F.col(ts_col), window, slide).alias("window")] + [
        F.col(k) for k in (keys or [])]
    return (sdf.groupBy(*gb).agg(*_agg_cols(aggs))
            .select(F.col("window.start").alias("window_start"),
                    F.col("window.end").alias("window_end"),
                    *[F.col(k) for k in (keys or [])],
                    *[F.col(o) for o in aggs]))


def session_window_agg(sdf: SparkDF, ts_col: str, gap: str,
                       aggs: dict[str, tuple[str, str]],
                       keys: list[str] | None = None,
                       watermark: str | None = None) -> SparkDF:
    """Session windows (``F.session_window``): gap-based, merged at agg time."""
    if watermark and sdf.isStreaming:
        sdf = sdf.withWatermark(ts_col, watermark)
    gb = [F.session_window(F.col(ts_col), gap).alias("session")] + [
        F.col(k) for k in (keys or [])]
    return (sdf.groupBy(*gb).agg(*_agg_cols(aggs))
            .select(F.col("session.start").alias("session_start"),
                    F.col("session.end").alias("session_end"),
                    *[F.col(k) for k in (keys or [])],
                    *[F.col(o) for o in aggs]))


def stream_stream_join(left: SparkDF, right: SparkDF, keys: list[str],
                       left_ts: str, right_ts: str, within: str = "1 hour",
                       watermark: str | None = None,
                       how: str = "inner") -> SparkDF:
    """Watermarked stream-stream join (SURVEY §2.9 — greenfield; the
    reference has no streams at all): right rows match left rows sharing
    ``keys`` with ``right_ts`` in ``[left_ts, left_ts + within]``.

    The time-range predicate is not just semantics — it is what lets Spark
    BOUND the join state: each side's buffered rows are evicted once the
    other side's watermark passes ``left_ts + within``.  An equi-only
    stream-stream join keeps state forever — the 100 TB/day failure mode.
    Watermarks (default = ``within``) are applied per streaming side only,
    so the SAME call works on batch frames (identical equi+range join) for
    tests and backfills.

    Sides must use distinct timestamp/payload column names; ``keys`` may
    share names (output keeps the left copy accessible via alias ``l``).
    """
    wm = watermark or within
    l = (left.withWatermark(left_ts, wm) if left.isStreaming else left).alias("l")
    r = (right.withWatermark(right_ts, wm) if right.isStreaming else right).alias("r")
    cond = None
    for k in keys:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else cond & c
    cond = (cond
            & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
            & (F.col(f"r.{right_ts}")
               <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}")))
    return l.join(r, cond, how)


def stateful_running_agg(sdf: SparkDF, keys: list[str], value_col: str,
                         timeout: str = "NoTimeout") -> SparkDF:
    """Custom stateful operator: per-key running (count, sum) maintained in
    Arrow-batched group state (``applyInPandasWithState``) — the template for
    operators windowed aggs can't express."""
    import pandas as pd

    out_schema = T.StructType(
        [T.StructField(k, sdf.schema[k].dataType) for k in keys] +
        [T.StructField("running_count", T.LongType()),
         T.StructField("running_sum", T.DoubleType())])
    state_schema = T.StructType([T.StructField("cnt", T.LongType()),
                                 T.StructField("s", T.DoubleType())])

    def fn(key, pdfs, state: GroupState):
        cnt, s = (state.get if state.exists else (0, 0.0))
        for pdf in pdfs:
            cnt += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((cnt, s))
        yield pd.DataFrame({**{k: [key[i]] for i, k in enumerate(keys)},
                            "running_count": [cnt], "running_sum": [s]})

    return (sdf.groupBy(*keys)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


def _require_tws() -> None:
    """``transformWithState`` talks to the state store through a
    protobuf-based API client — unavailable without ``google.protobuf``
    (not shipped in every runtime; gate, don't crash mid-query)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithState requires the 'protobuf' package "
            "(pip install protobuf); falling back to "
            "applyInPandasWithState-based operators is equivalent for "
            "value-state logic") from e


def stateful_running_agg_tws(sdf: SparkDF, keys: list[str],
                             value_col: str) -> SparkDF:
    """Per-key running (count, sum) on the ``transformWithState`` API —
    Spark 4's successor to ``applyInPandasWithState``: typed per-key state
    primitives (value/list/map), optional TTL, and timers.  Same semantics
    as :func:`stateful_running_agg`; kept side-by-side as the migration
    template for custom stateful operators.
    """
    _require_tws()
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    out_schema = T.StructType(
        [T.StructField(k, sdf.schema[k].dataType) for k in keys] +
        [T.StructField("running_count", T.LongType()),
         T.StructField("running_sum", T.DoubleType())])

    class _Running(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "cnt long, s double")

        def handleInputRows(self, key, rows, timer_values):
            cnt, s = self._agg.get() if self._agg.exists() else (0, 0.0)
            for pdf in rows:
                cnt += len(pdf)
                s += float(pdf[value_col].sum())
            self._agg.update((cnt, s))
            yield pd.DataFrame({**{k: [key[i]] for i, k in enumerate(keys)},
                                "running_count": [cnt], "running_sum": [s]})

        def close(self) -> None:
            pass

    return (sdf.groupBy(*keys)
            .transformWithStateInPandas(_Running(), out_schema,
                                        "Update", "None"))


def stateful_stream_dedup(sdf: SparkDF, id_col: str) -> SparkDF:
    """Streaming exact-dedup at ingest: emit only the FIRST row per
    ``id_col`` across all micro-batches (LLM-pipeline dedup for a
    continuously arriving corpus — pair with ``text.fingerprint`` to dedup
    by content hash).

    Per-id group state marks ids already seen (``applyInPandasWithState``,
    Arrow-batched).  State is hash-partitioned by id, so the operator scales
    horizontally with no global coordination; state size is one boolean per
    distinct id — bound it with a retention policy on the checkpoint when
    the id space is unbounded.
    """
    import pandas as pd

    out_schema = sdf.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            for _ in pdfs:
                pass
            return
        first = None
        for pdf in pdfs:
            if first is None and len(pdf):
                first = pdf.iloc[:1]
        state.update((True,))
        if first is not None:
            yield first

    return (sdf.groupBy(id_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def stateful_stream_dedup_tws(sdf: SparkDF, id_col: str,
                              ttl_ms: int | None = None) -> SparkDF:
    """:func:`stateful_stream_dedup` on the ``transformWithState`` API
    (Spark 4 typed state).  ``ttl_ms`` bounds state for unbounded id spaces
    (expired ids may re-emit — pick the TTL to match the re-crawl horizon).
    Requires ``google.protobuf`` (state API client)."""
    _require_tws()
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    out_schema = sdf.schema

    class _Dedup(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState("seen", "seen boolean", ttl_ms)

        def handleInputRows(self, key, rows, timer_values):
            if self._seen.exists():
                for _ in rows:
                    pass
                return
            first = None
            for pdf in rows:
                if first is None and len(pdf):
                    first = pdf.iloc[:1]
            self._seen.update((True,))
            if first is not None:
                yield first

        def close(self) -> None:
            pass

    return (sdf.groupBy(id_col)
            .transformWithStateInPandas(_Dedup(), out_schema,
                                        "Append", "None"))


def write_stream(sdf: SparkDF, path: str, checkpoint: str,
                 format: str = "parquet", output_mode: str = "append",
                 trigger_once: bool = True):
    """File sink with checkpointing (exactly-once for file sinks)."""
    w = (sdf.writeStream.format(format).option("path", path)
         .option("checkpointLocation", checkpoint).outputMode(output_mode))
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def to_memory_sink(sdf: SparkDF, name: str, output_mode: str = "complete"):
    """Memory sink for tests/debug: query results visible as table ``name``."""
    return (sdf.writeStream.format("memory").queryName(name)
            .outputMode(output_mode).trigger(availableNow=True).start())


def foreach_batch_sink(sdf: SparkDF, fn, checkpoint: str,
                       output_mode: str = "update",
                       trigger_once: bool = True):
    """``foreachBatch`` sink — the escape hatch for per-micro-batch custom
    writes (idempotent upserts, multi-sink fan-out, JDBC merges).  ``fn``
    receives ``(batch_df, batch_id)``; Spark guarantees the pair is
    replayed with the SAME batch_id after a failure, so an
    idempotent-by-batch-id ``fn`` gives exactly-once end to end."""
    w = (sdf.writeStream.foreachBatch(fn)
         .option("checkpointLocation", checkpoint)
         .outputMode(output_mode))
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
