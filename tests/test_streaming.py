"""Streaming tests: the same window helpers on batch frames (unification
contract) and end-to-end micro-batch runs over the events table."""

from __future__ import annotations

import shutil
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_expr_spark import streaming as st

SF = "/root/testdata/sf0.001"
EVENTS = f"{SF}/events.parquet"


@pytest.fixture(scope="module")
def events(spark):
    from pandas_expr_spark.sources.tables import load_table
    return load_table(spark, SF, "events")


def test_tumbling_batch_matches_sql(spark, events):
    got = st.tumbling_window_agg(
        events, "ts", "1 hour",
        {"n": ("event_id", "count"), "total": ("value", "sum")},
        keys=["event_type"]).toPandas()
    exp = (events.groupBy(F.window("ts", "1 hour"), "event_type")
           .agg(F.count("event_id").alias("n"), F.sum("value").alias("total"))
           .toPandas())
    assert len(got) == len(exp)
    assert got["n"].sum() == events.count()


def test_sliding_window_batch(spark, events):
    got = st.sliding_window_agg(
        events, "ts", "2 hours", "1 hour", {"n": ("event_id", "count")}).toPandas()
    # every event lands in exactly 2 sliding windows
    assert got["n"].sum() == 2 * events.count()


def test_session_window_batch(spark, events):
    got = st.session_window_agg(
        events, "ts", "30 minutes", {"n": ("event_id", "count")},
        keys=["user_id"]).toPandas()
    assert got["n"].sum() == events.count()
    assert (pd.to_datetime(got["session_end"]) >
            pd.to_datetime(got["session_start"])).all()


def test_streaming_end_to_end(spark, events):
    """File-source stream → watermarked tumbling agg → memory sink; result
    must equal the batch computation."""
    d = tempfile.mkdtemp()
    try:
        events.write.mode("overwrite").parquet(f"{d}/in")
        stream = st.read_stream("parquet", f"{d}/in", schema=events.schema,
                                max_files_per_trigger=4)
        assert stream.isStreaming
        agg = st.tumbling_window_agg(
            stream, "ts", "1 hour", {"n": ("event_id", "count")},
            keys=["event_type"], watermark="2 hours")
        q = st.to_memory_sink(agg, "win_counts", output_mode="complete")
        q.awaitTermination(120)
        got = spark.sql("select * from win_counts").toPandas()
        exp = st.tumbling_window_agg(
            events, "ts", "1 hour", {"n": ("event_id", "count")},
            keys=["event_type"]).toPandas()
        m = got.merge(exp, on=["window_start", "window_end", "event_type"],
                      suffixes=("_s", "_b"))
        assert len(m) == len(exp)
        assert (m["n_s"] == m["n_b"]).all()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stateful_running_agg_stream(spark, events):
    d = tempfile.mkdtemp()
    try:
        events.limit(200).write.mode("overwrite").parquet(f"{d}/in")
        stream = st.read_stream("parquet", f"{d}/in", schema=events.schema)
        out = st.stateful_running_agg(stream, ["event_type"], "value")
        q = st.to_memory_sink(out, "running", output_mode="update")
        q.awaitTermination(120)
        got = spark.sql(
            "select event_type, max(running_count) c from running group by 1"
        ).toPandas()
        exp = (spark.read.parquet(f"{d}/in").groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("c")).toPandas())
        m = got.merge(exp, on="event_type", suffixes=("_s", "_b"))
        assert (m["c_s"] == m["c_b"]).all()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_write_stream_file_sink(spark, events):
    d = tempfile.mkdtemp()
    try:
        events.write.mode("overwrite").parquet(f"{d}/in")
        stream = st.read_stream("parquet", f"{d}/in", schema=events.schema)
        filtered = stream.filter(F.col("event_type") == "click")
        q = st.write_stream(filtered, f"{d}/out", f"{d}/ckpt")
        q.awaitTermination(120)
        got = spark.read.parquet(f"{d}/out")
        exp = events.filter(F.col("event_type") == "click")
        assert got.count() == exp.count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


_needs_tws = pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState needs google.protobuf (state API client)")


@_needs_tws
def test_transform_with_state_running_agg(spark, events):
    """transformWithState (Spark 4 typed-state API) must match the
    applyInPandasWithState running agg."""
    d = tempfile.mkdtemp()
    try:
        events.limit(200).write.mode("overwrite").parquet(f"{d}/in")
        stream = st.read_stream("parquet", f"{d}/in", schema=events.schema)
        out = st.stateful_running_agg_tws(stream, ["event_type"], "value")
        q = st.to_memory_sink(out, "running_tws", output_mode="update")
        q.awaitTermination(120)
        got = spark.sql(
            "select event_type, max(running_count) c from running_tws group by 1"
        ).toPandas()
        exp = (spark.read.parquet(f"{d}/in").groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("c")).toPandas())
        m = got.merge(exp, on="event_type", suffixes=("_s", "_b"))
        assert len(m) == len(exp)
        assert (m["c_s"] == m["c_b"]).all()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stateful_stream_dedup(spark, events):
    """Cross-micro-batch first-occurrence dedup: duplicated input collapses
    to exactly one row per id."""
    d = tempfile.mkdtemp()
    try:
        ev = spark.read.parquet(EVENTS).limit(100)
        # write the same 100 events twice -> two files, forced into separate
        # micro-batches to prove state carries across batches
        ev.write.mode("overwrite").parquet(f"{d}/in")
        ev.write.mode("append").parquet(f"{d}/in")
        stream = st.read_stream("parquet", f"{d}/in", schema=ev.schema,
                                max_files_per_trigger=1)
        out = st.stateful_stream_dedup(stream, "event_id")
        q = st.to_memory_sink(out, "dedup_tws", output_mode="append")
        q.awaitTermination(120)
        got = spark.sql("select event_id from dedup_tws").toPandas()
        assert len(got) == 100
        assert got["event_id"].is_unique
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_tws_gate_raises_without_protobuf(spark, events):
    """The transformWithState variants must fail fast with a clear message
    when google.protobuf is absent (instead of crashing mid-query)."""
    if _has_protobuf():
        pytest.skip("protobuf present; gate not exercised")
    with pytest.raises(ImportError, match="protobuf"):
        st.stateful_stream_dedup_tws(events, "event_id")


def test_stream_stream_join_batch_unification(spark, events):
    """stream_stream_join on BATCH frames == plain equi+range join; the
    same helper is what the streaming gate query runs on real streams."""
    views = (events.filter(F.col("event_type") == "view")
             .select("user_id", F.col("ts").alias("view_ts"),
                     F.col("event_id").alias("view_id")))
    buys = (events.filter(F.col("event_type") == "purchase")
            .select("user_id", F.col("ts").alias("buy_ts"),
                    F.col("event_id").alias("purchase_id")))
    got = (st.stream_stream_join(views, buys, ["user_id"],
                                 "view_ts", "buy_ts", within="1 hour")
           .select("view_id", "purchase_id").toPandas()
           .sort_values(["view_id", "purchase_id"]).reset_index(drop=True))
    exp = (views.join(buys, "user_id")
           .filter((F.col("buy_ts") >= F.col("view_ts"))
                   & (F.col("buy_ts") <= F.col("view_ts")
                      + F.expr("INTERVAL 1 hour")))
           .select("view_id", "purchase_id").toPandas()
           .sort_values(["view_id", "purchase_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) > 0


def test_stream_stream_join_left_outer(spark, events):
    """Left-outer keeps unmatched left rows with null right columns."""
    views = (events.filter(F.col("event_type") == "view")
             .select("user_id", F.col("ts").alias("view_ts"),
                     F.col("event_id").alias("view_id")))
    buys = (events.filter(F.col("event_type") == "purchase")
            .select("user_id", F.col("ts").alias("buy_ts"),
                    F.col("event_id").alias("purchase_id")))
    out = st.stream_stream_join(views, buys, ["user_id"],
                                "view_ts", "buy_ts", within="1 hour",
                                how="left_outer")
    pdf = out.toPandas()
    assert len(pdf) >= views.count()
    assert pdf["purchase_id"].isna().any()


def test_checkpoint_restart_exactly_once(spark, events):
    """Exactly-once across restarts: a second run from the SAME checkpoint
    must process only files added after the first run — no reprocessing,
    no duplicates in the file sink."""
    d = tempfile.mkdtemp()
    try:
        first = events.filter(F.col("event_id") % 2 == 0)
        second = events.filter(F.col("event_id") % 2 == 1)
        first.write.mode("overwrite").parquet(f"{d}/in")
        stream = st.read_stream("parquet", f"{d}/in", schema=events.schema)
        q = st.write_stream(stream.select("event_id"), f"{d}/out", f"{d}/ckpt")
        q.awaitTermination(120)
        n1 = spark.read.parquet(f"{d}/out").count()
        assert n1 == first.count()
        # append new files, restart from the same checkpoint
        second.write.mode("append").parquet(f"{d}/in")
        stream2 = st.read_stream("parquet", f"{d}/in", schema=events.schema)
        q2 = st.write_stream(stream2.select("event_id"), f"{d}/out",
                             f"{d}/ckpt")
        q2.awaitTermination(120)
        out = spark.read.parquet(f"{d}/out")
        assert out.count() == events.count()          # union, no dups
        assert out.distinct().count() == events.count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_foreach_batch_sink(spark, tmp_path):
    from pandas_expr_spark.streaming import stream as st
    src = st.read_stream(
        "parquet", "/root/testdata/sf0.001",
        schema=spark.read.parquet(
            "/root/testdata/sf0.001/nation.parquet").schema,
        options={"pathGlobFilter": "nation.parquet"})
    out_dir = str(tmp_path / "batches")
    seen = []

    def fn(batch_df, batch_id):
        seen.append(batch_id)
        (batch_df.write.mode("append")
         .parquet(f"{out_dir}/b{batch_id}"))

    q = st.foreach_batch_sink(src, fn, str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert seen, "no batch delivered"
    total = sum(spark.read.parquet(f"{out_dir}/b{b}").count() for b in seen)
    assert total == 25
