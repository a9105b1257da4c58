"""Differential parity sweep 9 — seams not covered by earlier batches:
many-to-many merges, concat dtype promotion, explode edge shapes, qcut
duplicate edges, unstack missing combos, duplicated(keep=False), groupby
dropna=False, global rolling var/std, pct_change over nulls."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pandas_expr_spark as pes


def _eq(got: pd.DataFrame, exp: pd.DataFrame, sort_by=None, **kw):
    if sort_by:
        got = got.sort_values(sort_by).reset_index(drop=True)
        exp = exp.sort_values(sort_by).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, **kw)


def test_merge_many_to_many_suffixes(spark):
    l = pd.DataFrame({"k": [1, 1, 2, 3], "v": [10, 11, 12, 13]})
    r = pd.DataFrame({"k": [1, 1, 2, 4], "v": [20, 21, 22, 23]})
    exp = l.merge(r, on="k", suffixes=("_a", "_b"))
    got = (pes.from_pandas(l).merge(pes.from_pandas(r), on="k",
                                    suffixes=("_a", "_b"))
           .compute().reset_index(drop=True))
    _eq(got, exp, sort_by=["k", "v_a", "v_b"])


def test_concat_outer_promotes_and_fills(spark):
    a = pd.DataFrame({"x": [1, 2], "y": [1.5, 2.5]})
    b = pd.DataFrame({"x": [3.0, 4.5], "z": ["p", "q"]})
    exp = pd.concat([a, b], ignore_index=True)
    got = (pes.concat([pes.from_pandas(a), pes.from_pandas(b)],
                      ignore_index=True).compute().reset_index(drop=True))
    _eq(got, exp, sort_by=["x"], check_dtype=False)


def test_explode_empty_and_null_lists(spark):
    pdf = pd.DataFrame({"id": [1, 2, 3, 4],
                        "xs": [[1, 2], [], None, [3]]})
    exp = pdf.explode("xs").reset_index(drop=True)
    got = (pes.from_pandas(pdf).explode("xs").compute()
           .reset_index(drop=True))
    _eq(got, exp, sort_by=["id"], check_dtype=False)


def test_qcut_duplicate_edges_drop(spark):
    pdf = pd.DataFrame({"v": [1.0] * 8 + [2.0, 3.0]})
    with pytest.raises(ValueError, match="duplicates"):
        pes.from_pandas(pdf).v.qcut(4).compute()   # pandas raises too
    exp = pd.qcut(pdf.v, 4, duplicates="drop")
    got = pes.from_pandas(pdf).v.qcut(4, duplicates="drop").compute()
    # same partition into bins (label formatting differs: engine uses raw
    # float repr, pandas rounds) — compare bin counts
    assert sorted(got.value_counts().tolist()) \
        == sorted(exp.value_counts().tolist())
    assert got.notna().all()


def test_unstack_missing_combo_nan(spark):
    pdf = pd.DataFrame({"a": ["x", "x", "y"], "b": ["p", "q", "p"],
                        "v": [1.0, 2.0, 3.0]})
    exp = pdf.set_index(["a", "b"]).v.unstack()
    got = (pes.from_pandas(pdf).set_index(["a", "b"]).v.unstack()
           .compute())
    pd.testing.assert_frame_equal(got.sort_index(), exp.sort_index(),
                                  check_dtype=False, check_names=False)


def test_duplicated_keep_false(spark):
    pdf = pd.DataFrame({"k": [1, 1, 2, 3, 3, 3], "v": list("aabbcc")})
    exp = pdf[~pdf.duplicated(subset=["k"], keep=False)]
    got = (pes.from_pandas(pdf)
           .drop_duplicates(subset=["k"], keep=False).compute())
    _eq(got.reset_index(drop=True), exp.reset_index(drop=True),
        sort_by=["k"])


def test_groupby_dropna_false_nan_key(spark):
    pdf = pd.DataFrame({"k": [1.0, np.nan, 1.0, np.nan, 2.0],
                        "v": [1, 2, 3, 4, 5]})
    exp = (pdf.groupby("k", dropna=False).v.sum()
           .reset_index().rename(columns={"v": "s"}))
    got = (pes.from_pandas(pdf).groupby("k", dropna=False)
           .agg(s=("v", "sum")).reset_index().compute()
           .reset_index(drop=True))
    _eq(got, exp, sort_by=["k"], check_dtype=False)


def test_global_rolling_var_std(spark):
    pdf = pd.DataFrame({"v": [1.0, np.nan, 2.0, 4.0, 8.0, np.nan, 16.0]})
    for agg in ("var", "std"):
        exp = getattr(pdf.v.rolling(3, min_periods=2), agg)()
        got = getattr(pes.from_pandas(pdf).v.rolling(3, min_periods=2),
                      agg)().compute()
        np.testing.assert_allclose(got.to_numpy(), exp.to_numpy(),
                                   rtol=1e-12, equal_nan=True)


def test_pct_change_over_nulls(spark):
    pdf = pd.DataFrame({"v": [1.0, np.nan, 2.0, np.nan, np.nan, 4.0]})
    exp = pdf.v.pct_change()
    got = pes.from_pandas(pdf).v.pct_change().compute()
    np.testing.assert_allclose(got.to_numpy(), exp.to_numpy(),
                               rtol=1e-12, equal_nan=True)


def test_grouped_pct_change_pad_default(spark):
    pdf = pd.DataFrame({"k": [1, 1, 1, 2, 2, 2],
                        "v": [1.0, np.nan, 2.0, 4.0, np.nan, np.nan]})
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", FutureWarning)
        exp = pdf.groupby("k").v.pct_change()
    got = (pes.from_pandas(pdf).groupby("k").pct_change()
           .compute()["v"].sort_index())
    np.testing.assert_allclose(got.to_numpy(), exp.to_numpy(),
                               rtol=1e-12, equal_nan=True)


def test_nsmallest_ties(spark):
    pdf = pd.DataFrame({"v": [3, 1, 1, 2, 2, 5]})
    exp = sorted(pdf.v.nsmallest(3).tolist())
    got = sorted(pes.from_pandas(pdf).v.nsmallest(3).compute().tolist())
    assert got == exp


def test_value_counts_dropna_false(spark):
    pdf = pd.DataFrame({"v": ["a", None, "a", "b", None, None]})
    exp = pdf.v.value_counts(dropna=False)
    got = pes.from_pandas(pdf).v.value_counts(dropna=False).compute()
    assert sorted(got.tolist()) == sorted(exp.tolist())
    assert len(got) == 3


def test_mean_axis1_with_nulls(spark):
    pdf = pd.DataFrame({"a": [1.0, np.nan, 3.0],
                        "b": [np.nan, np.nan, 5.0],
                        "c": [2.0, 4.0, np.nan]})
    exp = pdf.mean(axis=1)
    got = pes.from_pandas(pdf).mean(axis=1).compute()
    np.testing.assert_allclose(got.to_numpy(), exp.to_numpy(),
                               rtol=1e-12, equal_nan=True)


@pytest.mark.parametrize("w,mp", [(3, None), (4, 2), (5, 1), (2, 1)])
def test_rolling_center_sum_family(spark, w, mp):
    rng = np.random.RandomState(7)
    v = rng.rand(60)
    v[rng.rand(60) < 0.2] = np.nan
    pdf = pd.DataFrame({"v": v})
    df = pes.from_pandas(pdf)
    for agg in ("sum", "mean", "count", "var", "std"):
        exp = getattr(pdf.v.rolling(w, min_periods=mp, center=True), agg)()
        got = getattr(df.v.rolling(w, min_periods=mp, center=True),
                      agg)().compute().sort_index()
        np.testing.assert_allclose(got.to_numpy(), exp.to_numpy(),
                                   rtol=1e-9, equal_nan=True,
                                   err_msg=f"{agg} w={w} mp={mp}")


@pytest.mark.parametrize("w,mp", [(3, None), (4, 2), (7, 1)])
def test_rolling_center_minmax(spark, w, mp):
    rng = np.random.RandomState(11)
    v = rng.randint(-50, 50, 60).astype(float)
    v[rng.rand(60) < 0.25] = np.nan
    pdf = pd.DataFrame({"v": v})
    df = pes.from_pandas(pdf)
    for agg in ("min", "max"):
        exp = getattr(pdf.v.rolling(w, min_periods=mp, center=True), agg)()
        got = getattr(df.v.rolling(w, min_periods=mp, center=True),
                      agg)().compute().sort_index()
        np.testing.assert_allclose(got.to_numpy(), exp.to_numpy(),
                                   rtol=0, equal_nan=True,
                                   err_msg=f"{agg} w={w} mp={mp}")


@pytest.mark.parametrize("limit", [1, 2, 5])
def test_ffill_bfill_limit_global(spark, limit):
    rng = np.random.RandomState(3)
    v = rng.rand(80)
    v[rng.rand(80) < 0.6] = np.nan   # long null runs to cross partitions
    pdf = pd.DataFrame({"v": v})
    df = pes.from_pandas(pdf)
    for meth in ("ffill", "bfill"):
        exp = getattr(pdf.v, meth)(limit=limit)
        got = getattr(df.v, meth)(limit=limit).compute().sort_index()
        np.testing.assert_allclose(got.to_numpy(), exp.to_numpy(),
                                   rtol=0, equal_nan=True,
                                   err_msg=f"{meth} limit={limit}")


def test_frame_ffill_limit(spark):
    pdf = pd.DataFrame({
        "a": [1.0] + [np.nan] * 6 + [2.0, np.nan, np.nan],
        "b": [np.nan, np.nan, 3.0] + [np.nan] * 7,
    })
    exp = pdf.ffill(limit=2)
    got = pes.from_pandas(pdf).ffill(limit=2).compute().sort_index()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_names=False)


def test_grouped_ffill_limit(spark):
    pdf = pd.DataFrame({
        "k": [1, 1, 1, 1, 2, 2, 2, 2],
        "v": [1.0, np.nan, np.nan, np.nan, np.nan, 5.0, np.nan, np.nan],
    })
    exp = pdf.groupby("k").v.ffill(limit=1)
    got = (pes.from_pandas(pdf).groupby("k").ffill(limit=1)
           .compute()["v"].sort_index())
    np.testing.assert_allclose(got.to_numpy(), exp.to_numpy(),
                               rtol=0, equal_nan=True)


def test_grouped_rolling_center(spark):
    pdf = pd.DataFrame({
        "k": [1, 1, 1, 1, 1, 2, 2, 2],
        "v": [1.0, 2.0, np.nan, 4.0, 5.0, 10.0, 20.0, 30.0],
    })
    exp = (pdf.groupby("k").rolling(3, min_periods=1, center=True)
           .v.mean().reset_index(drop=True))
    got = (pes.from_pandas(pdf).groupby("k")
           .rolling(3, min_periods=1, center=True).mean()
           .compute()["v"].sort_index().reset_index(drop=True))
    np.testing.assert_allclose(got.to_numpy(), exp.to_numpy(),
                               rtol=1e-12, equal_nan=True)
