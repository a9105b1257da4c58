"""Differential tests (vs pandas) for ewm and stack/unstack.

ewm is absent in the reference (SURVEY §2.7 — no rolling/expanding/ewm at
all); semantics target pandas ``ewm(alpha, adjust=True).mean()``.  The
global variant is a distributed segment scan (functions/timeseries.py) and
must agree with pandas' sequential recurrence to fp tolerance regardless of
how many range partitions the series is split into.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from conftest import assert_frame_eq


@pytest.fixture()
def ewm_pdf():
    rng = np.random.RandomState(11)
    n = 500
    return pd.DataFrame({
        "k": np.arange(n, dtype="int64"),
        "g": [f"g{i % 7}" for i in range(n)],
        "x": rng.randn(n) * 100.0,
    })


def test_ewm_global_segment_scan(spark, ewm_pdf):
    from pandas_expr_spark import from_pandas
    for n_parts in (1, 4, 13):
        df = from_pandas(ewm_pdf).with_ewm(
            "ewm", "x", order_by="k", alpha=0.3, num_partitions=n_parts)
        got = df.compute().sort_values("k").reset_index(drop=True)
        exp = ewm_pdf.sort_values("k").reset_index(drop=True)
        exp["ewm"] = exp["x"].ewm(alpha=0.3, adjust=True).mean()
        np.testing.assert_allclose(got["ewm"].to_numpy(),
                                   exp["ewm"].to_numpy(), rtol=1e-12)


def test_ewm_grouped_matches_pandas(spark, ewm_pdf):
    from pandas_expr_spark import from_pandas
    df = from_pandas(ewm_pdf).with_ewm(
        "ewm", "x", order_by="k", partition_by="g", alpha=0.5)
    got = df.compute().sort_values("k").reset_index(drop=True)
    exp = ewm_pdf.sort_values("k").reset_index(drop=True)
    exp["ewm"] = exp.groupby("g")["x"].transform(
        lambda s: s.ewm(alpha=0.5, adjust=True).mean())
    np.testing.assert_allclose(got["ewm"].to_numpy(),
                               exp["ewm"].to_numpy(), rtol=1e-12)


def test_groupby_ewm_mean(spark, ewm_pdf):
    from pandas_expr_spark import from_pandas
    out = (from_pandas(ewm_pdf).set_index("k")
           .groupby("g").ewm_mean("x", alpha=0.2))
    got = out.compute().sort_index()
    exp = ewm_pdf.set_index("k").sort_index()
    exp["x_ewm"] = exp.groupby("g")["x"].transform(
        lambda s: s.ewm(alpha=0.2, adjust=True).mean())
    np.testing.assert_allclose(got["x_ewm"].to_numpy(),
                               exp["x_ewm"].to_numpy(), rtol=1e-12)


def test_ewm_adjust_false_grouped(spark, ewm_pdf):
    from pandas_expr_spark import from_pandas
    df = from_pandas(ewm_pdf).with_ewm(
        "ewm", "x", order_by="k", partition_by="g", alpha=0.4, adjust=False)
    got = df.compute().sort_values("k").reset_index(drop=True)
    exp = ewm_pdf.sort_values("k").reset_index(drop=True)
    exp["ewm"] = exp.groupby("g")["x"].transform(
        lambda s: s.ewm(alpha=0.4, adjust=False).mean())
    np.testing.assert_allclose(got["ewm"].to_numpy(),
                               exp["ewm"].to_numpy(), rtol=1e-12)


# -- stack / unstack ---------------------------------------------------

def test_unstack_round_trips_melt(spark):
    from pandas_expr_spark import from_pandas
    pdf = pd.DataFrame({
        "id": [1, 1, 2, 2, 3],
        "metric": ["a", "b", "a", "b", "a"],
        "val": [10.0, 20.0, 30.0, 40.0, 50.0],
    })
    wide = from_pandas(pdf).unstack("id", "metric", "val",
                                    pivot_values=["a", "b"])
    got = wide.compute().sort_values("id").reset_index(drop=True)
    exp = (pdf.pivot(index="id", columns="metric", values="val")
           .reset_index())
    exp.columns.name = None
    assert got["id"].tolist() == exp["id"].tolist()
    assert got["a"].tolist() == exp["a"].tolist()
    # id=3 has no 'b' → null, matching pandas NaN
    assert got["b"].fillna(-1).tolist() == exp["b"].fillna(-1).tolist()


def test_stack_drops_nulls(spark):
    from pandas_expr_spark import from_pandas
    pdf = pd.DataFrame({
        "id": [1, 2, 3],
        "a": [1.0, None, 3.0],
        "b": [4.0, 5.0, None],
    })
    long = from_pandas(pdf).stack("id", ["a", "b"])
    got = long.compute().sort_values(["id", "variable"]).reset_index(drop=True)
    exp = (pdf.set_index("id").stack().rename("value").reset_index()
           .rename(columns={"level_1": "variable"})
           .sort_values(["id", "variable"]).reset_index(drop=True))
    assert got["id"].tolist() == exp["id"].tolist()
    assert got["variable"].tolist() == exp["variable"].tolist()
    assert got["value"].tolist() == exp["value"].tolist()

    kept = from_pandas(pdf).stack("id", ["a", "b"], dropna=False)
    assert len(kept.compute()) == 6


# -- resample fill_empty (pandas materializes empty bins) -------------------
@pytest.fixture()
def sparse_ts_pdf():
    # hourly-ish events with multi-hour gaps → resample('h') has empty bins
    ts = pd.to_datetime([
        "2024-01-01 00:05", "2024-01-01 00:40", "2024-01-01 03:10",
        "2024-01-01 07:59", "2024-01-01 08:01", "2024-01-02 01:30",
    ])
    return pd.DataFrame({"ts": ts, "v": [1.0, 2.0, 4.0, 8.0, 16.0, 32.0]})


def test_resample_fill_empty_matches_pandas(spark, sparse_ts_pdf):
    from pandas_expr_spark import from_pandas
    df = from_pandas(sparse_ts_pdf)
    got = (df.resample("h", on="ts", fill_empty=True)
           .agg(n=("v", "count"), total=("v", "sum"))
           .reset_index().to_spark().toPandas()
           .sort_values("ts").reset_index(drop=True))
    exp = (sparse_ts_pdf.resample("h", on="ts").agg(
        n=("v", "count"), total=("v", "sum")).reset_index())
    # r4: exact pandas parity — empty bins fill count=0 AND sum=0.0
    assert len(got) == len(exp) == 26
    assert got["ts"].tolist() == exp["ts"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()
    assert got["total"].tolist() == exp["total"].tolist()


def test_resample_no_fill_skips_empty_bins(spark, sparse_ts_pdf):
    from pandas_expr_spark import from_pandas
    df = from_pandas(sparse_ts_pdf)
    # fill_empty=False is the explicit sparse-output opt-out (the
    # default is pandas' filled grid since r4)
    got = (df.resample("h", on="ts", fill_empty=False)
           .agg(n=("v", "count"))
           .reset_index().to_spark().toPandas())
    assert len(got) == 5  # only non-empty buckets


def test_resample_fill_empty_single_agg_count(spark, sparse_ts_pdf):
    from pandas_expr_spark import from_pandas
    df = from_pandas(sparse_ts_pdf)
    got = (df.resample("h", on="ts", fill_empty=True)["v"].count()
           .to_frame("v").reset_index().to_spark().toPandas()
           .sort_values("ts").reset_index(drop=True))
    exp = sparse_ts_pdf.resample("h", on="ts")["v"].count().reset_index()
    assert got["v"].tolist() == exp["v"].tolist()


# --------------------------------------------------------------------------
# Period / to_timestamp (SURVEY §1.4; reference ToTimestamp
# _expr.py:1159-1168, reference tests/test_collection.py:251-256)
# --------------------------------------------------------------------------
@pytest.mark.parametrize("how", ["start", "end"])
@pytest.mark.parametrize("freq", ["D", "M", "h"])
def test_to_timestamp_differential(spark, how, freq):
    import pandas_expr_spark as pes
    pdf = pd.DataFrame({"x": range(12), "y": [float(i) for i in range(12)]})
    pdf.index = pd.period_range("2019-12-31", freq=freq, periods=len(pdf))
    df = pes.from_pandas(pdf)
    got = df.to_timestamp(how=how).compute().sort_index()
    exp = pdf.to_timestamp(how=how)
    # pandas period-end is ns-precision (…999999999); Spark is µs — the
    # µs cast floors both to the same value
    exp_idx = exp.index.values.astype("datetime64[us]")
    assert (got.index.values.astype("datetime64[us]") == exp_idx).all()
    assert (got["x"].values == exp["x"].values).all()
    # series form converts the index identically
    gs = df.x.to_timestamp(how=how).compute().sort_index()
    es = pdf.x.to_timestamp(how=how)
    assert (gs.index.values.astype("datetime64[us]")
            == es.index.values.astype("datetime64[us]")).all()
    assert (gs.values == es.values).all()


def test_period_roundtrip_and_to_period(spark):
    import pandas_expr_spark as pes
    pdf = pd.DataFrame({"x": range(5)},
                       index=pd.period_range("2023-01", freq="M", periods=5))
    df = pes.from_pandas(pdf)
    rt = df.compute().sort_index()
    assert isinstance(rt.index, pd.PeriodIndex)
    assert rt.index.equals(pdf.index)
    # dt.to_period on a timestamp column, pandas-differential
    ts = pd.DataFrame({"t": pd.date_range("2024-01-15", periods=10, freq="7D"),
                       "v": range(10)})
    d2 = pes.from_pandas(ts)
    got = d2.assign(p=d2.t.dt.to_period("M")).compute()["p"]
    exp = ts["t"].dt.to_period("M")
    assert str(got.dtype) == "period[M]"
    assert (got.sort_index().values == exp.values).all()


# -- wave 10: dt round/ceil/normalize/tz, timedelta accessor, shift(freq),
#    interpolate, asfreq ------------------------------------------------------

def _ts_pdf():
    ts = pd.to_datetime([
        "2024-01-01 00:00:30", "2024-01-01 00:01:30", "2024-01-01 00:02:45",
        "2024-03-05 11:59:59.5", "2024-03-05 12:00:00.5", "2024-07-31 23:30:00",
    ], format="mixed")
    return pd.DataFrame({"ts": ts, "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]})


def test_dt_round_ceil_normalize(spark):
    import pandas_expr_spark as pes
    pdf = _ts_pdf()
    df = pes.from_pandas(pdf)
    for freq in ("min", "h", "D", "2min", "30s"):
        got = df["ts"].dt.round(freq).compute()
        exp = pdf["ts"].dt.round(freq)
        assert list(got) == list(exp), f"round {freq}"
        gotc = df["ts"].dt.ceil(freq).compute()
        expc = pdf["ts"].dt.ceil(freq)
        assert list(gotc) == list(expc), f"ceil {freq}"
    got_n = df["ts"].dt.normalize().compute()
    assert list(got_n) == list(pdf["ts"].dt.normalize())


def test_dt_tz_localize_convert(spark):
    import pandas_expr_spark as pes
    pdf = _ts_pdf()
    df = pes.from_pandas(pdf)
    tz = "America/New_York"
    # since r5 compute() re-attaches tz-awareness via boundary metadata
    got = df["ts"].dt.tz_localize(tz).compute()
    exp = pdf["ts"].dt.tz_localize(tz, ambiguous="NaT")
    assert list(got) == list(exp.dropna()) or list(got) == list(exp)
    got2 = df["ts"].dt.tz_convert(tz).compute()
    # engine extension: naive values are UTC instants (pandas raises on
    # naive tz_convert), so the result is the aware tz rendering
    exp2 = pdf["ts"].dt.tz_localize("UTC").dt.tz_convert(tz)
    assert list(got2) == list(exp2)


def test_timedelta_accessor(spark):
    import pandas_expr_spark as pes
    pdf = pd.DataFrame({
        "a": pd.to_datetime(["2024-01-03 05:00:00.25", "2024-01-01 00:00:01",
                             "2023-12-31 23:59:00"], format="mixed"),
        "b": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:00:00",
                             "2024-01-01 00:00:00"]),
    })
    df = pes.from_pandas(pdf)
    d = df["a"] - df["b"]
    exp = pdf["a"] - pdf["b"]
    assert list(d.dt.total_seconds().compute()) == pytest.approx(
        list(exp.dt.total_seconds()))
    assert list(d.dt.days.compute()) == list(exp.dt.days)
    assert list(d.dt.seconds.compute()) == list(exp.dt.seconds)
    assert list(d.dt.microseconds.compute()) == list(exp.dt.microseconds)


def test_shift_freq(spark):
    import pandas_expr_spark as pes
    pdf = _ts_pdf()
    df = pes.from_pandas(pdf)
    # freq="M" deviates deliberately: the engine adds a calendar month
    # (make_interval), pandas' to_offset("M") snaps to month END
    for periods, freq in ((1, "D"), (2, "h"), (-3, "min"), (2, "D")):
        got = df["ts"].shift(periods, freq=freq).compute()
        exp = pdf["ts"] + periods * pd.tseries.frequencies.to_offset(freq)
        assert list(got) == list(exp), (periods, freq)


@pytest.mark.parametrize("method", ["linear", "pad"])
def test_interpolate_matches_pandas(spark, method):
    import pandas_expr_spark as pes
    pdf = pd.DataFrame({"v": [None, 1.0, None, None, 4.0, None, 10.0, None,
                              None]},
                       index=pd.Index(range(9), name="i"))
    df = pes.from_pandas(pdf)
    got = df["v"].interpolate(method=method).compute().sort_index()
    exp = pdf["v"].interpolate(method=method)
    pd.testing.assert_series_equal(got, exp, check_dtype=False,
                                   check_names=False, check_index_type=False)


def test_interpolate_limit(spark):
    import pandas_expr_spark as pes
    pdf = pd.DataFrame({"v": [1.0, None, None, None, 5.0]},
                       index=pd.Index(range(5), name="i"))
    df = pes.from_pandas(pdf)
    got = df["v"].interpolate(limit=2).compute().sort_index()
    exp = pdf["v"].interpolate(limit=2)
    pd.testing.assert_series_equal(got, exp, check_dtype=False,
                                   check_names=False, check_index_type=False)


def test_asfreq(spark):
    import pandas_expr_spark as pes
    ts = pd.to_datetime(["2024-01-01 00:00", "2024-01-01 02:00",
                         "2024-01-01 05:00"])
    pdf = pd.DataFrame({"ts": ts, "v": [1.0, 2.0, 3.0]})
    df = pes.from_pandas(pdf)
    got = df.asfreq("h", on="ts").compute().sort_values("ts").reset_index(drop=True)
    exp = (pdf.set_index("ts").asfreq("h").reset_index())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    gotp = df.asfreq("h", on="ts", method="pad").compute() \
        .sort_values("ts").reset_index(drop=True)
    expp = pdf.set_index("ts").asfreq("h", method="pad").reset_index()
    pd.testing.assert_frame_equal(gotp, expp, check_dtype=False)


def test_grouped_resample_matches_pandas(spark):
    import numpy as np
    import pandas as pd
    import pandas_expr_spark as pes

    ts = pd.date_range("2024-01-01", periods=60, freq="7h")
    pdf = pd.DataFrame({"k": [i % 3 for i in range(60)], "ts": ts,
                        "v": np.arange(60.0)})
    got = (pes.from_pandas(pdf).groupby("k").resample("D", on="ts")
           .agg(s=("v", "sum"), n=("v", "count")).reset_index().compute()
           .sort_values(["k", "ts"]).reset_index(drop=True))
    exp = (pdf.set_index("ts").groupby("k").v.resample("D")
           .agg(["sum", "count"]).reset_index())
    # engine (documented) does not materialize empty per-group bins
    exp = (exp[exp["count"] > 0].sort_values(["k", "ts"])
           .reset_index(drop=True))
    assert got.k.tolist() == exp.k.tolist()
    assert got.ts.tolist() == exp.ts.tolist()
    assert got.s.tolist() == exp["sum"].tolist()
    assert got.n.tolist() == exp["count"].tolist()
