"""Round-5 hunt wave F pins: groupby transform/apply/named-agg edges,
timezone boundary metadata, query index references.

Before the fixes:
- ``transform("nunique")`` on a non-numeric slice SILENTLY RETURNED THE
  RAW COLUMN (numeric_only filtering left no columns to transform) and
  the window lowering used the unsupported ``count(DISTINCT) OVER`` —
  now ``size(collect_set() OVER)``;
- ``gb[["x","y"]].apply(f)`` leaked EVERY column into ``f`` (pandas
  passes only the sliced columns);
- ``gb["x"].agg(mn="min")`` crashed unpacking the named-agg kwarg
  (pandas: bare fn names on a SeriesGroupBy);
- ``dt.tz_convert``/``tz_localize`` results computed to tz-NAIVE
  timestamps (JVM wall-clock storage) — the tz now rides as boundary
  metadata and ``compute()`` re-attaches pandas tz-awareness;
- ``query("index > 4")`` could not reference the index by its pandas
  keyword name.

Documented divergence probed and NOT pinned: filters/query on
default-index frames renumber positionally (pandas keeps original
labels).  Preserving labels would require a rowid pass BEFORE the
filter, killing parquet predicate pushdown — the same positional
contract as pandas-on-Spark's default index.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pandas_expr_spark as pes


@pytest.fixture
def gdf5():
    rng = np.random.RandomState(777)
    n = 24
    return pd.DataFrame({
        "g": rng.choice(list("ab"), n),
        "x": rng.randn(n).round(2),
        "y": rng.randint(1, 9, n).astype("int64"),
        "s": rng.choice(["foo bar", "baz  qux", "hello"], n),
        "t": pd.Timestamp("2024-06-01 10:00", tz="UTC")
             + pd.to_timedelta(np.arange(n) * 37, unit="min"),
    })


def _series(got, exp):
    pd.testing.assert_series_equal(
        got.sort_index(), exp.sort_index(), check_dtype=False,
        check_index_type=False, check_names=False, check_freq=False,
        rtol=1e-9)


def _frames(got, exp):
    pd.testing.assert_frame_equal(
        got.sort_index(), exp.sort_index(), check_dtype=False,
        check_index_type=False, check_names=False,
        check_column_type=False, rtol=1e-9)


def test_transform_nunique_string_slice(gdf5, spark):
    _series(pes.from_pandas(gdf5).groupby("g")["s"]
            .transform("nunique").compute(),
            gdf5.groupby("g")["s"].transform("nunique"))


def test_transform_nunique_frame(gdf5, spark):
    got = pes.from_pandas(gdf5).groupby("g")[["s", "y"]] \
        .transform("nunique").compute()
    exp = gdf5.groupby("g")[["s", "y"]].transform("nunique")
    _frames(got, exp)


def test_apply_respects_column_slice(gdf5, spark):
    fe = pes.from_pandas(gdf5).groupby("g")[["x", "y"]].apply(
        lambda d: d.assign(cx=d["x"].cumsum())).compute()
    fp = gdf5.groupby("g")[["x", "y"]].apply(
        lambda d: d.assign(cx=d["x"].cumsum()))
    assert sorted(fe.columns) == sorted(fp.columns)  # no leaked s/t/g
    _frames(fe.sort_values(["x", "y"]).reset_index(drop=True),
            fp.sort_values(["x", "y"]).reset_index(drop=True))


def test_series_groupby_named_agg(gdf5, spark):
    _frames(pes.from_pandas(gdf5).groupby("g")["x"]
            .agg(mn="min", mx="max").compute(),
            gdf5.groupby("g")["x"].agg(mn="min", mx="max"))


def test_tz_convert_compute_is_aware(gdf5, spark):
    got = pes.from_pandas(gdf5)["t"].dt.tz_convert("US/Eastern").compute()
    exp = gdf5["t"].dt.tz_convert("US/Eastern")
    assert str(got.dtype).endswith("US/Eastern]")
    _series(got, exp)


def test_tz_localize_compute_is_aware(gdf5, spark):
    naive = gdf5["t"].dt.tz_localize(None)
    en = pes.from_pandas(naive.to_frame("t"))["t"]
    got = en.dt.tz_localize("UTC").compute()
    exp = naive.dt.tz_localize("UTC")
    assert str(got.dtype).endswith("UTC]")
    _series(got, exp)


def test_query_index_keyword(gdf5, spark):
    _frames(pes.from_pandas(gdf5).set_index("y").query("index > 4").compute(),
            gdf5.set_index("y").query("index > 4"))


def test_series_explode_repeats_source_labels(spark):
    pdf = pd.DataFrame({"lst": [[1, 2], [], [3]]})
    got = pes.from_pandas(pdf)["lst"].explode().compute()
    exp = pdf["lst"].explode()
    assert got.index.tolist() == exp.index.tolist()
    assert got.fillna(-1).tolist() == exp.fillna(-1).tolist()


def test_period_plus_int_advances_periods(spark):
    s = pd.Series(pd.to_datetime(["2024-01-15", "2024-05-02"]))
    es = pes.from_pandas(s.to_frame("t"))["t"]
    for freq in ("M", "Q", "D"):
        got = (es.dt.to_period(freq) + 1).astype(str).compute()
        exp = (s.dt.to_period(freq) + 1).astype(str)
        assert got.tolist() == exp.tolist(), freq
        got2 = (es.dt.to_period(freq) - 2).astype(str).compute()
        exp2 = (s.dt.to_period(freq) - 2).astype(str)
        assert got2.tolist() == exp2.tolist(), freq


def test_resample_pandas22_end_aliases(gdf5, spark):
    naive = gdf5.assign(t=gdf5["t"].dt.tz_localize(None))
    e = pes.from_pandas(naive).set_index("t")["x"]
    p = naive.set_index("t")["x"]
    for freq in ("ME", "QE", "W"):
        _series(e.resample(freq).sum().compute(), p.resample(freq).sum())


def test_grouper_month_end_labels(gdf5, spark):
    naive = gdf5.assign(t=gdf5["t"].dt.tz_localize(None))
    got = pes.from_pandas(naive).groupby(
        [pd.Grouper(key="t", freq="ME"), "g"])["x"].sum().compute()
    exp = naive.groupby([pd.Grouper(key="t", freq="ME"), "g"])["x"].sum()
    _series(got, exp.loc[got.index])


def test_shift_freq_moves_index(gdf5, spark):
    naive = gdf5.assign(t=gdf5["t"].dt.tz_localize(None))
    e = pes.from_pandas(naive).set_index("t")["x"]
    p = naive.set_index("t")["x"]
    got = e.shift(freq="1D").compute()
    exp = p.shift(freq="1D")
    _series(got, exp)
