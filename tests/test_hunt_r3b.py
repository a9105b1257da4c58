"""Second round-3 differential-hunt battery, pinned as regression tests.

Silent divergences found by randomized probing: shift(fill_value=)
filling data NaNs (not just the boundary), str.split regex defaults,
str.replace literal-by-default (pandas >=2.0), str.contains(case=/na=),
rank(na_option=), concat(sort=) and the private-index-column leak in
mixed-index outer concat.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pandas_expr_spark as pes


def _sorted(vals):
    return sorted(vals, key=lambda x: (pd.isna(x), x))


@pytest.fixture()
def pdf():
    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "k": rng.randint(0, 4, 20),
        "v": rng.randn(20).round(3),
        "s": [f"item_{i % 5}.x" for i in range(20)],
    })
    df.loc[3, "v"] = np.nan
    df.loc[7, "v"] = np.nan
    return df


class TestShiftFillValue:
    def test_series_fill_only_boundary(self, spark, pdf):
        # two data NaNs must STAY NaN; only the 2 shifted-in head slots fill
        got = pes.from_pandas(pdf)["v"].shift(2, fill_value=-1.0).compute()
        want = pdf["v"].shift(2, fill_value=-1.0)
        assert got.tolist().count(-1.0) == 2
        assert np.allclose(_sorted(got.tolist()), _sorted(want.tolist()),
                           equal_nan=True)

    def test_frame_fill_value(self, spark, pdf):
        got = pes.from_pandas(pdf)[["v"]].shift(1, fill_value=9.9).compute()
        want = pdf[["v"]].shift(1, fill_value=9.9)
        assert np.allclose(_sorted(got["v"].tolist()),
                           _sorted(want["v"].tolist()), equal_nan=True)


class TestRankNaOption:
    @pytest.mark.parametrize("na", ["top", "bottom"])
    @pytest.mark.parametrize("method",
                             ["average", "min", "max", "dense", "first"])
    @pytest.mark.parametrize("pct", [False, True])
    def test_matches_pandas(self, spark, pdf, na, method, pct):
        got = pes.from_pandas(pdf)["v"].rank(
            method=method, na_option=na, pct=pct).compute().tolist()
        want = pdf["v"].rank(method=method, na_option=na, pct=pct).tolist()
        assert np.allclose(_sorted(got), _sorted(want))

    def test_keep_unchanged(self, spark, pdf):
        got = pes.from_pandas(pdf)["v"].rank(na_option="keep").compute()
        want = pdf["v"].rank()
        assert np.allclose(_sorted(got.tolist()), _sorted(want.tolist()),
                           equal_nan=True)

    def test_no_nulls_top_is_noop(self, spark):
        s = pd.Series([3.0, 1.0, 2.0, 1.0])
        got = pes.from_pandas(s.to_frame("v"))["v"].rank(
            method="dense", na_option="top").compute().tolist()
        assert _sorted(got) == _sorted(s.rank(method="dense").tolist())

    def test_bad_option_raises(self, spark, pdf):
        with pytest.raises(ValueError):
            pes.from_pandas(pdf)["v"].rank(na_option="nope")


class TestStrDefaults:
    def test_split_single_char_is_literal(self, spark, pdf):
        got = pes.from_pandas(pdf)["s"].str.split(".").compute()
        want = pdf["s"].str.split(".")
        assert sorted(map(list, got)) == sorted(map(list, want))

    def test_split_multi_char_is_regex(self, spark):
        s = pd.Series(["a1b22c", "x3y"])
        got = pes.from_pandas(s.to_frame("s"))["s"].str.split(
            r"\d+").compute()
        assert sorted(map(list, got)) == sorted(
            map(list, s.str.split(r"\d+")))

    def test_replace_literal_by_default(self, spark):
        s = pd.Series(["a.b", "axb"])
        got = pes.from_pandas(s.to_frame("s"))["s"].str.replace(
            ".", "_").compute()
        assert sorted(got) == sorted(s.str.replace(".", "_"))  # axb intact

    def test_contains_case_and_na(self, spark, pdf):
        s = pdf["s"].copy()
        s.iloc[0] = None
        got = pes.from_pandas(s.to_frame("s"))["s"].str.contains(
            "ITEM_1", case=False, na=False).compute()
        want = s.str.contains("ITEM_1", case=False, na=False)
        assert sorted(got.tolist()) == sorted(want.tolist())


class TestConcatSort:
    def test_sort_alphabetizes_columns(self, spark, pdf):
        c1, c2 = pdf[["k", "v"]].head(5), pdf[["s", "k"]].tail(5)
        got = pes.concat([pes.from_pandas(c1), pes.from_pandas(c2)],
                         sort=True).compute()
        want = pd.concat([c1, c2], sort=True)
        assert list(got.columns) == list(want.columns)
        assert sorted(got["k"].tolist()) == sorted(want["k"].tolist())

    def test_mixed_index_no_private_column_leak(self, spark, pdf):
        # head() has a trivial range index, tail() a shifted one — the
        # private engine index column must not appear as data
        c1, c2 = pdf[["k", "v"]].head(5), pdf[["s", "k"]].tail(5)
        got = pes.concat([pes.from_pandas(c1), pes.from_pandas(c2)])
        assert all(not c.startswith("__index") for c in got.columns)

    def test_shared_index_still_kept(self, spark):
        a = pd.DataFrame({"x": [1, 2]}, index=[10, 11])
        b = pd.DataFrame({"x": [3]}, index=[12])
        got = pes.concat([pes.from_pandas(a), pes.from_pandas(b)]).compute()
        assert sorted(got.index.tolist()) == [10, 11, 12]


class TestBatch2Fixes:
    def test_between_null_is_false(self, spark, pdf):
        for inc in ("both", "neither", "left", "right"):
            got = pes.from_pandas(pdf)["v"].between(
                -0.5, 0.5, inclusive=inc).compute()
            want = pdf["v"].between(-0.5, 0.5, inclusive=inc)
            assert sorted(got.tolist()) == sorted(want.tolist()), inc

    def test_grouped_sum_min_count(self, spark, pdf):
        got = pes.from_pandas(pdf).groupby("k")["v"].sum(
            min_count=3).compute().sort_index().tolist()
        want = pdf.groupby("k")["v"].sum(min_count=3).sort_index().tolist()
        assert all((pd.isna(a) and pd.isna(b)) or abs(a - b) < 1e-9
                   for a, b in zip(got, want))

    def test_transform_positional_names(self, spark, pdf):
        for fn in ("rank", "cumsum"):
            got = pes.from_pandas(pdf).groupby("k")["v"].transform(
                fn).compute()
            gv = got["v"] if hasattr(got, "columns") else got
            want = pdf.groupby("k")["v"].transform(fn)
            assert np.allclose(
                _sorted([x for x in gv.tolist() if not pd.isna(x)]),
                _sorted([x for x in want.tolist() if not pd.isna(x)]))

    def test_empty_frame_aggregations(self, spark):
        emp = pd.DataFrame({"v": pd.Series([], dtype="float64"),
                            "s": pd.Series([], dtype="object")})
        e = pes.from_pandas(emp)
        assert e["v"].sum().compute() == 0.0
        assert e["v"].prod().compute() == 1.0
        assert pd.isna(e["v"].mean().compute())
        assert list(e.compute().columns) == ["v", "s"]

    def test_merge_left_on_right_index(self, spark):
        a = pd.DataFrame({"k": [1, 2, 1], "v": [10, 20, 30]},
                         index=[100, 101, 102])
        b = pd.DataFrame({"w": [7, 8]}, index=pd.Index([1, 2], name="k"))
        got = pes.from_pandas(a).merge(
            pes.from_pandas(b), left_on="k", right_index=True).compute()
        want = a.merge(b, left_on="k", right_index=True)
        assert list(got.columns) == list(want.columns)
        assert sorted(got.index.tolist()) == sorted(want.index.tolist())
        assert sorted(map(tuple, got.values.tolist())) == \
               sorted(map(tuple, want.values.tolist()))

    def test_merge_left_index_right_on(self, spark):
        b = pd.DataFrame({"w": [7, 8]}, index=pd.Index([1, 2], name="k"))
        c = pd.DataFrame({"k": [1, 2], "w2": [7, 8]}, index=[5, 6])
        got = pes.from_pandas(b).merge(
            pes.from_pandas(c), left_index=True, right_on="k").compute()
        want = b.merge(c, left_index=True, right_on="k")
        assert list(got.columns) == list(want.columns)
        assert sorted(got.index.tolist()) == sorted(want.index.tolist())


class TestBatch3Fixes:
    def test_bool_cumsum_casts_to_int(self, spark):
        s = pd.Series([True, False, True, True])
        got = pes.from_pandas(s.to_frame("b"))["b"].cumsum().compute()
        assert got.dtype == np.int64
        assert got.tolist() == s.cumsum().tolist()

    def test_int_cumulative_dtypes_preserved(self, spark):
        p = pd.DataFrame({"i": [3, 1, 4, 1, 5]})
        e = pes.from_pandas(p)
        for op in ("cumsum", "cumprod", "cummax", "cummin"):
            got = getattr(e["i"], op)().compute()
            want = getattr(p["i"], op)()
            assert got.dtype == want.dtype == np.int64, op
            assert got.tolist() == want.tolist(), op

    def test_str_cat_na_rep(self, spark):
        s = pd.Series(["a", None, "c"])
        e = pes.from_pandas(s.to_frame("s"))["s"]
        assert e.str.cat(sep="|", na_rep="?").compute() == \
               s.str.cat(sep="|", na_rep="?")
        got = e.str.cat(e, sep="+", na_rep="?").compute()
        assert sorted(got) == sorted(s.str.cat(s, sep="+", na_rep="?"))

    def test_partition_integer_column_key(self, spark):
        s = pd.Series(["a-b", "c", "d-e"])
        p = pes.from_pandas(s.to_frame("s"))["s"].str.partition("-")
        assert sorted(p[0].compute().tolist()) == \
               sorted(s.str.partition("-")[0].tolist())

    def test_where_mask_foreign_other_aligns(self, spark):
        p = pd.DataFrame({"v": [1.0, 2.0, 3.0, -4.0]})
        e1, e2 = pes.from_pandas(p), pes.from_pandas(p)
        got = e1["v"].where(e1["v"] > 0, other=-e2["v"]).compute()
        want = p["v"].where(p["v"] > 0, other=-p["v"])
        assert sorted(got.tolist()) == sorted(want.tolist())
        got = e1["v"].mask(e1["v"] > 0, other=e2["v"] * 10).compute()
        want = p["v"].mask(p["v"] > 0, other=p["v"] * 10)
        assert sorted(got.tolist()) == sorted(want.tolist())


class TestBatch4Fixes:
    def test_rolling_corr_cov(self, spark):
        rng = np.random.RandomState(3)
        p = pd.DataFrame({"v": rng.randn(30).round(2),
                          "w": rng.rand(30).round(2)})
        p.loc[4, "v"] = np.nan
        p.loc[9, "w"] = np.nan
        e = pes.from_pandas(p)
        for op, kw in (("corr", {}), ("cov", {}),
                       ("cov", {"ddof": 0})):
            got = getattr(e["v"].rolling(5), op)(e["w"], **kw).compute()
            want = getattr(p["v"].rolling(5), op)(p["w"], **kw)
            assert got.isna().sum() == want.isna().sum()
            assert np.allclose(sorted(got.dropna().round(8)),
                               sorted(want.dropna().round(8))), (op, kw)

    def test_rolling_corr_min_periods(self, spark):
        rng = np.random.RandomState(4)
        p = pd.DataFrame({"v": rng.randn(20), "w": rng.randn(20)})
        e = pes.from_pandas(p)
        got = e["v"].rolling(8, min_periods=3).cov(e["w"]).compute()
        want = p["v"].rolling(8, min_periods=3).cov(p["w"])
        assert got.isna().sum() == want.isna().sum()
        assert np.allclose(sorted(got.dropna().round(8)),
                           sorted(want.dropna().round(8)))

    def test_resample_label_closed(self, spark):
        rng = np.random.RandomState(5)
        p = pd.DataFrame({
            "v": rng.randn(18).round(2),
            "t": pd.date_range("2024-03-01", periods=18, freq="9h31min")})
        ev = p.set_index("t")
        e = pes.from_pandas(p).set_index("t")
        for kw in ({"label": "right"}, {"closed": "right"},
                   {"label": "right", "closed": "right"}):
            got = e.resample("12h", **kw)["v"].sum().compute().sort_index()
            want = ev.resample("12h", **kw)["v"].sum().sort_index()
            want = want[want != 0]  # engine omits empty bins (documented)
            assert list(got.index) == list(want.index), kw
            assert np.allclose(got.values, want.values), kw

    def test_grouped_describe_slice_names(self, spark):
        p = pd.DataFrame({"k": [0, 0, 1, 1, 2], "v": [1., 2., 3., 4., 5.]})
        got = pes.from_pandas(p).groupby("k")["v"].describe().compute()
        want = p.groupby("k")["v"].describe()
        assert list(got.columns) == list(want.columns)
        got_full = pes.from_pandas(p).groupby("k").describe().compute()
        # unsliced frame describe: pandas MultiIndex (col, stat) since r5
        assert ("v", "mean") in got_full.columns


class TestFloordivDtypes:
    def test_float_floordiv_stays_float_and_survives_range(self, spark):
        p = pd.DataFrame({"v": [5.5, -2.5, 1e300,
                                2.225073858507203e-309]})
        e = pes.from_pandas(p)
        got = (e["v"] // 2).compute()
        want = p["v"] // 2
        assert got.dtype == np.float64
        assert np.allclose(got.tolist(), want.tolist())  # 5e299 intact

    def test_rfloordiv_subnormal_to_inf(self, spark):
        # hypothesis find: 1.0 // 2.2e-309 overflows float64 → pandas inf;
        # Spark's long-typed floor saturated at int64 max instead
        p = pd.DataFrame({"v": [2.225073858507203e-309]})
        got = pes.from_pandas(p)["v"].rfloordiv(1.0).compute()
        assert np.isinf(got.iloc[0])

    def test_int_floordiv_stays_int(self, spark):
        p = pd.DataFrame({"n": [7, -8, 9]})
        got = (pes.from_pandas(p)["n"] // 2).compute()
        assert got.dtype == np.int64
        assert got.tolist() == (p["n"] // 2).tolist()

    def test_frame_mixed_dtype_floordiv(self, spark):
        m = pd.DataFrame({"a": [7, -8, 9], "b": [5.5, -2.5, 1e300]})
        got = (pes.from_pandas(m) // 2).compute()
        want = m // 2
        assert dict(got.dtypes) == dict(want.dtypes)
        assert np.allclose(got["b"], want["b"])
        assert got["a"].tolist() == want["a"].tolist()


class TestExpandingPairwise:
    def test_expanding_corr_cov(self, spark):
        rng = np.random.RandomState(8)
        p = pd.DataFrame({"v": rng.randn(25).round(2),
                          "w": rng.rand(25).round(2)})
        p.loc[3, "v"] = np.nan
        p.loc[11, "w"] = np.nan
        e = pes.from_pandas(p)
        for op in ("corr", "cov"):
            got = getattr(e["v"].expanding(), op)(e["w"]).compute()
            want = getattr(p["v"].expanding(), op)(p["w"])
            assert got.isna().sum() == want.isna().sum(), op
            assert np.allclose(sorted(got.dropna().round(8)),
                               sorted(want.dropna().round(8))), op

    def test_expanding_cov_min_periods(self, spark):
        rng = np.random.RandomState(9)
        p = pd.DataFrame({"v": rng.randn(15), "w": rng.randn(15)})
        e = pes.from_pandas(p)
        got = e["v"].expanding(min_periods=5).cov(e["w"]).compute()
        want = p["v"].expanding(min_periods=5).cov(p["w"])
        assert got.isna().sum() == want.isna().sum()
        assert np.allclose(sorted(got.dropna().round(8)),
                           sorted(want.dropna().round(8)))


class TestBatch5Fixes:
    def test_numpy_ufunc_protocol(self, spark):
        p = pd.DataFrame({"v": [0.5, 1.5, 2.5], "w": [0.1, 0.2, 0.3]})
        e = pes.from_pandas(p)
        for uf in (np.sqrt, np.log, np.exp, np.sin, np.floor, np.square):
            got = uf(e["v"]).compute().sort_values().reset_index(drop=True)
            want = uf(p["v"]).sort_values().reset_index(drop=True)
            assert np.allclose(got, want) and got.dtype == want.dtype, uf
        got = np.maximum(e["v"], 1.0).compute()
        assert sorted(got) == sorted(np.maximum(p["v"], 1.0))
        got = np.arctan2(e["v"], e["w"]).compute()
        assert np.allclose(sorted(got), sorted(np.arctan2(p["v"], p["w"])))

    def test_clip_foreign_series_bounds(self, spark):
        p = pd.DataFrame({"v": [1.0, 5.0, 3.0], "lo": [2.0, 2.0, 2.0],
                          "hi": [4.0, 4.0, 4.0]})
        e1, e2, e3 = (pes.from_pandas(p) for _ in range(3))
        got = e1["v"].clip(lower=e2["lo"], upper=e3["hi"]).compute()
        want = p["v"].clip(lower=p["lo"], upper=p["hi"])
        assert sorted(got.tolist()) == sorted(want.tolist())

    def test_round_dict(self, spark):
        p = pd.DataFrame({"v": [1.2345, 2.3456], "w": [3.4567, 4.5678]})
        got = pes.from_pandas(p).round({"v": 1, "w": 2}).compute()
        want = p.round({"v": 1, "w": 2})
        assert np.allclose(sorted(got["v"]), sorted(want["v"]))
        assert np.allclose(sorted(got["w"]), sorted(want["w"]))

    def test_merge_validate(self, spark):
        a = pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]})
        b = pd.DataFrame({"k": [1, 2], "w": [3.0, 4.0]})
        dup = pd.DataFrame({"k": [1, 1], "v": [1.0, 2.0]})
        got = pes.from_pandas(a).merge(pes.from_pandas(b), on="k",
                                       validate="1:1").compute()
        assert len(got) == 2
        with pytest.raises(ValueError, match="not unique in left"):
            pes.from_pandas(dup).merge(pes.from_pandas(b), on="k",
                                       validate="1:1")
        with pytest.raises(ValueError, match="not unique in right"):
            pes.from_pandas(a).merge(pes.from_pandas(dup), on="k",
                                     validate="m:1")
        # m:m never raises
        pes.from_pandas(dup).merge(pes.from_pandas(dup), on="k",
                                   validate="m:m")

    def test_corr_min_periods(self, spark):
        p = pd.DataFrame({"v": np.arange(10.0),
                          "w": np.arange(10.0) * 2})
        p.loc[0:7, "w"] = np.nan
        got = pes.from_pandas(p).corr(min_periods=5).compute()
        want = p.corr(min_periods=5)
        assert (got.isna().values == want.isna().values).all()


class TestBatch6Fixes:
    def test_frame_ntop_drops_nulls(self, spark):
        p = pd.DataFrame({"v": [1., np.nan, 3., np.nan, 0.5],
                          "w": [5, 4, 3, 2, 1]})
        e = pes.from_pandas(p)
        assert e.nsmallest(3, "v").compute()["v"].tolist() == \
               p.nsmallest(3, "v")["v"].tolist()
        # overshooting n appends the NaN rows at the END like pandas
        got = e.nsmallest(10, "v").compute()["v"]
        assert got.notna().tolist() == [True, True, True, False, False]
        assert e.nlargest(2, "v").compute()["v"].tolist() == \
               p.nlargest(2, "v")["v"].tolist()

    def test_assign_chaining(self, spark):
        p = pd.DataFrame({"v": [1.0, 2.0, 3.0]})
        got = pes.from_pandas(p).assign(
            z=lambda d: d["v"] * 2, y=lambda d: d["z"] + 1).compute()
        want = p.assign(z=lambda d: d["v"] * 2, y=lambda d: d["z"] + 1)
        assert sorted(got["y"]) == sorted(want["y"])

    def test_sample_with_replacement_exceeds_population(self, spark):
        p = pd.DataFrame({"v": range(5)})
        got = pes.from_pandas(p).sample(n=20, replace=True,
                                        random_state=7).compute()
        assert len(got) == 20
        assert set(got["v"]) <= set(range(5))  # only population values


class TestBatch7Fixes:
    def test_frame_where_mask_with_boolean_frame(self, spark):
        p = pd.DataFrame({"v": [1.0, -2.0, 3.0], "w": [-0.5, 0.5, -1.5]})
        e = pes.from_pandas(p)
        sub = e[["v", "w"]]
        got = sub.where(sub > 0).compute().fillna(-9)
        want = p.where(p > 0).fillna(-9)
        assert np.allclose(np.sort(got.values.ravel()),
                           np.sort(want.values.ravel()))
        got = sub.mask(sub > 0, other=0.0).compute()
        want = p.mask(p > 0, other=0.0)
        assert np.allclose(np.sort(got.values.ravel()),
                           np.sort(want.values.ravel()))

    def test_frame_where_foreign_bool_frame_aligns(self, spark):
        p = pd.DataFrame({"v": [1.0, -2.0, 3.0]}, index=[10, 11, 12])
        e = pes.from_pandas(p)
        cond = pes.from_pandas(p > 0)
        got = e.where(cond).compute().fillna(-9)
        want = p.where(p > 0).fillna(-9)
        assert sorted(got["v"]) == sorted(want["v"])

    def test_pivot_table_fill_value(self, spark):
        p = pd.DataFrame({"k": [0, 0, 1], "j": ["x", "y", "x"],
                          "v": [1.0, 2.0, 3.0]})
        got = pes.from_pandas(p).pivot_table(
            index="k", columns="j", values="v", aggfunc="count",
            fill_value=0).compute().sort_index()
        want = p.pivot_table(index="k", columns="j", values="v",
                             aggfunc="count", fill_value=0).sort_index()
        assert np.allclose(np.sort(got.values.astype(float).ravel()),
                           np.sort(want.values.astype(float).ravel()))


class TestGroupedIdxExtremePositional:
    def test_positional_index_materializes(self, spark):
        rng = np.random.RandomState(19)
        p = pd.DataFrame({"k": rng.randint(0, 3, 14),
                          "v": rng.randn(14).round(2)})
        p.loc[4, "v"] = np.nan
        e = pes.from_pandas(p)
        got = e.groupby("k")["v"].idxmax().compute().sort_index().tolist()
        want = p.groupby("k")["v"].idxmax().sort_index().tolist()
        assert got == want
        got = e.groupby("k")["v"].idxmin().compute().sort_index().tolist()
        want = p.groupby("k")["v"].idxmin().sort_index().tolist()
        assert got == want


class TestGroupbyCallableTransformAgg:
    def test_transform_callable_matches_pandas(self, spark):
        rng = np.random.RandomState(23)
        p = pd.DataFrame({"k": rng.randint(0, 3, 12),
                          "v": rng.randn(12).round(2)})
        e = pes.from_pandas(p)
        for fn in (lambda s: s - s.mean(), lambda s: s.cumsum()):
            got = e.groupby("k")["v"].transform(fn).compute()
            gv = got["v"] if hasattr(got, "columns") else got
            want = p.groupby("k")["v"].transform(fn)
            assert np.allclose(sorted(gv.round(8)), sorted(want.round(8)))

    def test_agg_name_fn_tuples(self, spark):
        p = pd.DataFrame({"k": [0, 0, 1, 1], "v": [1.0, 3.0, 2.0, 8.0]})
        got = pes.from_pandas(p).groupby("k")["v"].agg(
            [("spread", lambda s: s.max() - s.min()),
             ("avg", "mean")]).compute().sort_index()
        want = p.groupby("k")["v"].agg(
            [("spread", lambda s: s.max() - s.min()),
             ("avg", "mean")]).sort_index()
        assert list(got.columns) == list(want.columns)
        assert np.allclose(got.values, want.values)


class TestModuleLevelAdditions:
    def test_date_range_distributed(self, spark):
        got = pes.date_range("2024-01-01", periods=5, freq="6h").compute()
        want = pd.date_range("2024-01-01", periods=5, freq="6h")
        assert list(got) == list(want)
        got = pes.date_range("2024-01-01", end="2024-01-03",
                             freq="D").compute()
        assert list(got) == list(pd.date_range("2024-01-01", "2024-01-03"))

    def test_to_timedelta_series(self, spark):
        s = pes.from_pandas(pd.DataFrame({"n": [1.5, 2.0, None]}))["n"]
        got = pes.to_timedelta(s, unit="h").compute()
        want = pd.to_timedelta(pd.Series([1.5, 2.0, None]), unit="h")
        assert [str(x) for x in got] == [str(x) for x in want]

    def test_named_agg(self, spark):
        p = pd.DataFrame({"k": [0, 0, 1], "v": [1.0, 2.0, 3.0]})
        got = pes.from_pandas(p).groupby("k").agg(
            total=pes.NamedAgg("v", "sum")).compute().sort_index()
        want = p.groupby("k").agg(
            total=pd.NamedAgg("v", "sum")).sort_index()
        assert got["total"].tolist() == want["total"].tolist()

    def test_scalar_reexports(self, spark):
        assert pes.NaT is pd.NaT and pes.NA is pd.NA
        assert pes.Timestamp("2024-01-01") == pd.Timestamp("2024-01-01")


class TestLocSliceAndMapDefault:
    def test_loc_label_slice_inclusive(self, spark):
        p = pd.DataFrame({"v": [1.0, 2.0, 3.0, 4.0]},
                         index=pd.Index([10, 20, 30, 40], name="i"))
        e = pes.from_pandas(p)
        got = e.loc[20:30].compute()["v"].tolist()
        assert got == p.loc[20:30]["v"].tolist()  # both ends inclusive
        assert e.loc[:20].compute()["v"].tolist() == \
               p.loc[:20]["v"].tolist()
        assert e.loc[30:].compute()["v"].tolist() == \
               p.loc[30:]["v"].tolist()

    def test_map_defaultdict_supplies_misses(self, spark):
        from collections import defaultdict
        m = pd.Series([1, 2, 3])
        got = pes.from_pandas(m.to_frame("v"))["v"].map(
            defaultdict(lambda: -1, {1: 10})).compute().sort_values()
        want = m.map(defaultdict(lambda: -1, {1: 10})).sort_values()
        assert got.tolist() == want.tolist()
