"""Round-5 hunt wave A pins: compositions of the r4 semantic changes.

Before the fixes:
- df ∘ eager ``pd.Series`` fell through to ``F.lit(series)`` → a HashMap
  literal → SparkRuntimeException at compute (the r4 columns-axis
  broadcast only handled the LAZY Series other);
- df ∘ 1-d list/ndarray crashed the same way (pandas coerces positionally
  to a Series aligned with the columns);
- ``reset_index`` named unnamed MultiIndex levels ``index`` (pandas:
  ``level_{i}``; only a single unnamed index is named ``index``), so
  grouped-rolling → reset_index → merge chains KeyError'd on ``level_1``;
- ``groupby/resample .agg`` with a list (or dict-of-list) spec returned
  flat ``col_fn`` columns where pandas returns MultiIndex ``(col, fn)``;
- ``assign`` with a foreign Series raised instead of aligning on the
  index (pandas alignment; default-index frames align positionally).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pandas_expr_spark as pes


@pytest.fixture
def kdf():
    rng = np.random.RandomState(42)
    n = 40
    return pd.DataFrame({
        "k": rng.choice(list("xyz"), n),
        "t": pd.Timestamp("2024-05-01") + pd.to_timedelta(
            np.sort(rng.choice(range(0, 20000), n, replace=False)),
            unit="min"),
        "a": rng.randn(n).round(3),
        "b": rng.randint(0, 10, n),
    })


def _frames(got, exp):
    pd.testing.assert_frame_equal(
        got.sort_index(), exp.sort_index(), check_dtype=False,
        check_index_type=False, check_names=False, check_freq=False,
        check_column_type=False, rtol=1e-9)


def _series(got, exp):
    pd.testing.assert_series_equal(
        got.sort_index(), exp.sort_index(), check_dtype=False,
        check_index_type=False, check_names=False, check_freq=False,
        rtol=1e-9)


# ---- eager pandas Series / sequence others on the columns axis ----

def test_frame_plus_eager_series(spark):
    f = pd.DataFrame({"x": [1.0, 2, 3], "y": [4.0, 5, 6]})
    s = pd.Series({"x": 10.0, "y": 100.0})
    _frames((pes.from_pandas(f) + s).compute(), f + s)


def test_frame_eager_series_nan_union(spark):
    f = pd.DataFrame({"x": [1.0, 2], "y": [3.0, 4]})
    s = pd.Series({"x": 1.0, "z": 2.0})
    _frames((pes.from_pandas(f) + s).compute(), f + s)
    _frames((pes.from_pandas(f) * s).compute(), f * s)
    _frames(pes.from_pandas(f).div(s).compute(), f / s)


def test_frame_eager_series_keeps_column_order_when_equal(spark):
    f = pd.DataFrame({"y": [1.0], "x": [2.0]})
    s = pd.Series({"y": 1.0, "x": 2.0})
    got = (pes.from_pandas(f) + s).compute()
    assert list(got.columns) == ["y", "x"]  # pandas Index.union fast path


def test_frame_eager_series_dup_labels_raise(spark):
    f = pd.DataFrame({"x": [1.0], "y": [2.0]})
    with pytest.raises(ValueError):
        (pes.from_pandas(f) + pd.Series([1.0, 2.0], index=["x", "x"]))


def test_frame_plus_list_positional(spark):
    f = pd.DataFrame({"y": [1.0, 2], "x": [3.0, 4]})
    _frames((pes.from_pandas(f) + [10, 20]).compute(), f + [10, 20])
    with pytest.raises(ValueError, match="length must be 2: given 3"):
        pes.from_pandas(f) + [1, 2, 3]


def test_frame_eq_eager_series(spark):
    f = pd.DataFrame({"x": [1.0, 2], "y": [3.0, 4]})
    s = pd.Series({"x": 1.0, "y": 4.0})
    _frames((pes.from_pandas(f) == s).compute(), f == s)


def test_frame_bool_lift_eager_series(spark):
    f = pd.DataFrame({"x": [1, 2], "y": [3, 4]})
    s = pd.Series({"x": True, "y": False})
    _frames((pes.from_pandas(f) + s).compute(), f + s)


# ---- reset_index MultiIndex level naming ----

def test_grouped_rolling_reset_index_level_names(kdf, spark):
    e = pes.from_pandas(kdf)
    got = e.groupby("k")["a"].rolling(3).mean().reset_index().compute()
    exp = kdf.groupby("k")["a"].rolling(3).mean().reset_index()
    assert list(got.columns) == list(exp.columns)  # ['k', 'level_1', 'a']
    _frames(got.sort_values(["k", "level_1"]).reset_index(drop=True),
            exp.sort_values(["k", "level_1"]).reset_index(drop=True))


def test_grouped_rolling_merge_back(kdf, spark):
    e = pes.from_pandas(kdf)
    ge = e.groupby("k")["a"].rolling(3).sum().reset_index()
    me = ge.merge(e.groupby("k").agg(tot=("a", "sum")).reset_index(), on="k")
    gp = kdf.groupby("k")["a"].rolling(3).sum().reset_index()
    mp = gp.merge(kdf.groupby("k").agg(tot=("a", "sum")).reset_index(),
                  on="k")
    _frames(me.compute().sort_values(["k", "level_1"]).reset_index(drop=True),
            mp.sort_values(["k", "level_1"]).reset_index(drop=True))


def test_single_unnamed_index_still_resets_to_index_column(spark):
    f = pd.DataFrame({"a": [1, 2]}, index=pd.Index([10, 20]))
    got = pes.from_pandas(f).reset_index().compute()
    assert list(got.columns) == ["index", "a"]


# ---- agg list/dict-of-list specs restore pandas MultiIndex columns ----

def test_groupby_agg_list_multiindex_columns(kdf, spark):
    got = pes.from_pandas(kdf).groupby("k").agg({"a": ["sum", "mean"],
                                                 "b": "count"}).compute()
    exp = kdf.groupby("k").agg({"a": ["sum", "mean"], "b": "count"})
    assert isinstance(got.columns, pd.MultiIndex)
    _frames(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_groupby_agg_list_spec_multiindex(kdf, spark):
    got = pes.from_pandas(kdf)[["k", "a"]].groupby("k").agg(
        ["sum", "max"]).compute()
    exp = kdf[["k", "a"]].groupby("k").agg(["sum", "max"])
    assert isinstance(got.columns, pd.MultiIndex)
    _frames(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_resample_agg_dict_list_multiindex(kdf, spark):
    e = pes.from_pandas(kdf).set_index("t")
    got = e.resample("12h").agg({"a": ["sum", "mean"], "b": "count"}).compute()
    exp = kdf.set_index("t").resample("12h").agg({"a": ["sum", "mean"],
                                                  "b": "count"})
    assert isinstance(got.columns, pd.MultiIndex)
    _frames(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_resample_agg_empty_bins_identity_fill_mi(kdf, spark):
    sparse = kdf.iloc[:6]
    e = pes.from_pandas(sparse).set_index("t")
    got = e.resample("2h").agg({"a": ["sum", "count", "min"]}).compute()
    exp = sparse.set_index("t").resample("2h").agg(
        {"a": ["sum", "count", "min"]})
    _frames(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_series_groupby_agg_list_stays_flat(kdf, spark):
    got = pes.from_pandas(kdf).groupby("k")["a"].agg(["sum", "mean"]).compute()
    exp = kdf.groupby("k")["a"].agg(["sum", "mean"])
    assert not isinstance(got.columns, pd.MultiIndex)
    _frames(got, exp)


def test_groupby_agg_dict_scalar_stays_flat(kdf, spark):
    got = pes.from_pandas(kdf).groupby("k").agg({"a": "sum"}).compute()
    exp = kdf.groupby("k").agg({"a": "sum"})
    assert not isinstance(got.columns, pd.MultiIndex)
    _frames(got, exp)


# ---- assign with a foreign Series aligns like pandas ----

def test_assign_foreign_series_positional(spark):
    f = pd.DataFrame({"g": list("aab"), "x": [1.0, 2, 3]})
    ef = pes.from_pandas(f)
    derived = (ef[["x"]] * pd.Series({"x": 2.0}))["x"]
    got = ef.assign(x2=derived).compute()
    exp = f.assign(x2=(f[["x"]] * pd.Series({"x": 2.0}))["x"])
    _frames(got, exp)


def test_assign_foreign_series_indexed(spark):
    f = pd.DataFrame({"x": [1.0, 2, 3]}, index=pd.Index([5, 6, 7], name="i"))
    other = pd.DataFrame({"v": [10.0, 30.0]},
                         index=pd.Index([5, 7], name="i"))
    got = pes.from_pandas(f).assign(v=pes.from_pandas(other)["v"]).compute()
    exp = f.assign(v=other["v"])
    _frames(got, exp)


def test_broadcast_then_groupby_composition(spark):
    f = pd.DataFrame({"g": list("aab"), "x": [1.0, 2, 3], "y": [4.0, 5, 6]})
    s = pd.Series({"x": 2.0, "y": 0.5})
    ef = pes.from_pandas(f)
    got = (ef[["x", "y"]] * s).assign(g=ef["g"]).groupby("g").sum().compute()
    exp = (f[["x", "y"]] * s).assign(g=f["g"]).groupby("g").sum()
    _frames(got, exp)


def test_frame_bool_lift_lazy_series(spark):
    f = pd.DataFrame({"x": [1, 2], "y": [3, 4]})
    s = pd.Series({"x": True, "y": False})
    lazy = pes.from_pandas(s.to_frame("v"))["v"]
    _frames((pes.from_pandas(f) + lazy).compute(), f + s)


def test_frame_groupby_ohlc_multiindex(kdf, spark):
    got = pes.from_pandas(kdf).groupby("k")[["a", "b"]].ohlc().compute()
    exp = kdf.groupby("k")[["a", "b"]].ohlc()
    assert isinstance(got.columns, pd.MultiIndex)
    _frames(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_frame_resample_ohlc_multiindex(kdf, spark):
    got = pes.from_pandas(kdf).set_index("t")[["a", "b"]] \
        .resample("6h").ohlc().compute()
    exp = kdf.set_index("t")[["a", "b"]].resample("6h").ohlc()
    assert isinstance(got.columns, pd.MultiIndex)
    _frames(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_series_resample_ohlc_stays_bare(kdf, spark):
    got = pes.from_pandas(kdf).set_index("t")["a"].resample("6h") \
        .ohlc().compute()
    exp = kdf.set_index("t")["a"].resample("6h").ohlc()
    assert not isinstance(got.columns, pd.MultiIndex)
    assert list(got.columns) == list(exp.columns)


def test_assign_cumsum_foreign_scan_series(spark):
    # cumsum/rank scan outputs carry a rowid-backed positional index;
    # assigning one onto its default-index parent aligns positionally
    f = pd.DataFrame({"g": list("aab"), "x": [1.0, 2, 3]})
    ef = pes.from_pandas(f)
    got = ef.assign(cx=ef["x"].cumsum()).compute()
    _frames(got, f.assign(cx=f["x"].cumsum()))
