"""Round-3 differential-hunt findings, pinned as regression tests.

Each class covers a silent semantic divergence from pandas found by the
randomized probe battery: C-style modulo, HALF_UP rounding, grouped
positional/transform slices leaking extra columns, cut(labels=False),
qcut label formatting, where/mask alignment with a parent-frame cond,
and unnamed-result conventions.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pandas_expr_spark as pes


class TestModuloSign:
    def test_negative_dividend(self, spark):
        pdf = pd.DataFrame({"v": [-2.119, 0.189, -2.809, 7.5, -7.5]})
        want = (pdf["v"] % 3).tolist()
        got = (pes.from_pandas(pdf)["v"] % 3).compute().tolist()
        assert np.allclose(got, want)

    def test_negative_divisor(self, spark):
        pdf = pd.DataFrame({"v": [5.0, -5.0, 2.5]})
        want = (pdf["v"] % -3).tolist()
        got = (pes.from_pandas(pdf)["v"] % -3).compute().tolist()
        assert np.allclose(got, want)


class TestBankersRounding:
    def test_half_even(self, spark):
        pdf = pd.DataFrame({"v": [0.25, 0.35, 2.5, 3.5, -0.25]})
        want = pdf["v"].round(1).tolist()
        got = pes.from_pandas(pdf)["v"].round(1).compute().tolist()
        assert got == want  # 0.25→0.2, 0.35→0.35? numpy: banker's

    def test_frame_round(self, spark):
        rng = np.random.RandomState(3)
        pdf = pd.DataFrame({"v": np.round(rng.rand(50) * 10, 4)})
        want = pdf.round(1)["v"].tolist()
        got = (pes.from_pandas(pdf).round(1).compute()
               .sort_index()["v"].tolist())
        assert np.allclose(got, want)


class TestGroupedSlice:
    PDF = pd.DataFrame({"k": [1, 1, 2, 2], "i": range(4),
                        "v": [1.0, 2.0, 3.0, 4.0],
                        "w": [10.0, 20.0, 30.0, 40.0]})

    def test_cumsum_slice(self, spark):
        got = (pes.from_pandas(self.PDF).set_index("i")
               .groupby("k")[["v"]].cumsum().compute().sort_index())
        want = self.PDF.set_index("i").groupby("k")[["v"]].cumsum()
        assert list(got.columns) == ["v"]
        assert got["v"].tolist() == want["v"].tolist()

    def test_shift_slice(self, spark):
        got = (pes.from_pandas(self.PDF).set_index("i")
               .groupby("k")[["v"]].shift(1).compute().sort_index())
        want = self.PDF.set_index("i").groupby("k")[["v"]].shift(1)
        assert list(got.columns) == ["v"]
        assert got["v"].fillna(-1).tolist() == want["v"].fillna(-1).tolist()

    def test_transform_slice(self, spark):
        got = (pes.from_pandas(self.PDF).set_index("i")
               .groupby("k")[["v"]].transform("mean").compute().sort_index())
        want = self.PDF.set_index("i").groupby("k")[["v"]].transform("mean")
        assert list(got.columns) == ["v"]
        assert got["v"].tolist() == want["v"].tolist()


class TestCutLabels:
    def test_labels_false_codes(self, spark):
        pdf = pd.DataFrame({"w": [5.0, 30.0, 55.0, 80.0, 101.0]})
        want = pd.cut(pdf["w"], [0, 25, 50, 75, 100], labels=False)
        got = (pes.from_pandas(pdf)["w"]
               .cut([0, 25, 50, 75, 100], labels=False).compute())
        assert got.fillna(-1).tolist() == want.fillna(-1).tolist()

    def test_qcut_label_format_matches_pandas(self, spark):
        rng = np.random.RandomState(42)
        pdf = pd.DataFrame({"w": np.round(rng.rand(60) * 100, 2)})
        want = pd.qcut(pdf["w"], 4).astype(str).tolist()
        got = pes.from_pandas(pdf)["w"].qcut(4).compute().tolist()
        assert got == want

    def test_int_bins_keep_int_labels(self, spark):
        pdf = pd.DataFrame({"v": [0.5, 1.5]})
        got = pes.from_pandas(pdf)["v"].cut([0, 1, 2]).compute().tolist()
        assert got == ["(0, 1]", "(1, 2]"]


class TestWhereMaskAligned:
    def test_where_parent_cond(self, spark):
        pdf = pd.DataFrame({"i": range(5),
                            "v": [1.0, -2.0, None, 4.0, -5.0]})
        d = pes.from_pandas(pdf).set_index("i")
        got = d[["v"]].where(d["v"] > 0, 0.0).compute().sort_index()
        want = pdf.set_index("i")[["v"]].where(pdf.set_index("i")["v"] > 0,
                                               0.0)
        assert np.allclose(got["v"], want["v"], equal_nan=True)

    def test_mask_null_cond_keeps_row(self, spark):
        pdf = pd.DataFrame({"i": range(4), "v": [1.0, None, -3.0, 4.0]})
        d = pes.from_pandas(pdf).set_index("i")
        got = d[["v"]].mask(d["v"] > 0, 0.0).compute().sort_index()
        want = pdf.set_index("i")[["v"]].mask(
            pdf.set_index("i")["v"] > 0, 0.0)
        assert np.allclose(got["v"], want["v"], equal_nan=True)


class TestNamingConventions:
    def test_binop_differing_names_drop(self, spark):
        pdf = pd.DataFrame({"a": [1.0], "b": [2.0]})
        d = pes.from_pandas(pdf)
        assert (d["a"] - d["b"]).name is None
        assert (d["a"] + d["a"]).name == "a"

    def test_duplicated_unnamed(self, spark):
        pdf = pd.DataFrame({"k": [1, 1, 2]})
        assert pes.from_pandas(pdf).duplicated(subset=["k"]).name is None


class TestFrameArithmetic:
    def test_scalar_ops_match_pandas(self, spark):
        pdf = pd.DataFrame({"i": [0, 1], "a": [-7.0, 5.0],
                            "b": [2.0, -3.0]})
        d = pes.from_pandas(pdf).set_index("i")
        p = pdf.set_index("i")
        for op in ("__add__", "__sub__", "__mul__", "__truediv__",
                   "__floordiv__", "__mod__", "__pow__"):
            g = getattr(d, op)(3).compute().sort_index()
            w = getattr(p, op)(3)
            assert np.allclose(g.to_numpy(), w.to_numpy(),
                               equal_nan=True), op
        assert np.allclose((10 - d).compute().sort_index().to_numpy(),
                           (10 - p).to_numpy())
        assert np.allclose((-d).compute().sort_index().to_numpy(),
                           (-p).to_numpy())

    def test_named_methods_fill_value_and_cmp(self, spark):
        A = pd.DataFrame({"i": [0, 1, 2], "v": [1.0, None, 3.0]})
        B = pd.DataFrame({"i": [1, 2, 3], "v": [10.0, None, 30.0]})
        sa = pes.from_pandas(A).set_index("i")["v"]
        sb = pes.from_pandas(B).set_index("i")["v"]
        got = sa.add(sb, fill_value=0.0).compute().sort_index().to_numpy()
        want = (A.set_index("i")["v"]
                .add(B.set_index("i")["v"], fill_value=0.0).to_numpy())
        assert np.allclose(got, want, equal_nan=True)
        # method comparisons materialize pandas null→False
        assert sa.eq(1.0).compute().sort_index().tolist() == [True, False,
                                                              False]
        assert sa.ne(1.0).compute().sort_index().tolist() == [False, True,
                                                              True]
        d = pes.from_pandas(A).set_index("i")
        assert (d.gt(1.0).compute().sort_index()["v"].tolist()
                == [False, False, True])

    def test_frame_positional_family(self, spark):
        pdf = pd.DataFrame({"i": range(6),
                            "a": [1.0, 2.0, 4.0, 8.0, 16.0, 32.0],
                            "b": [1.0, 1.0, 2.0, 3.0, 5.0, 8.0]})
        d = pes.from_pandas(pdf).set_index("i")
        p = pdf.set_index("i")
        for op, kw in [("shift", {}), ("diff", {}), ("pct_change", {}),
                       ("shift", {"periods": -2}), ("diff", {"periods": 2})]:
            g = getattr(d, op)(**kw).compute().sort_index().to_numpy()
            w = getattr(p, op)(**kw).to_numpy()
            assert np.allclose(g, w, equal_nan=True), (op, kw)

    def test_filter_pushdown_survives_dunder(self, spark):
        import contextlib
        import io
        import re
        li = pes.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
        f = li[li.l_quantity > 40][["l_returnflag"]]
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            f.explain()
        m = re.search(r"PushedFilters: \[(.*?)\]", buf.getvalue())
        assert m and "GreaterThan(l_quantity" in m.group(1)

    def test_frame_frame_aligns(self, spark):
        A = pd.DataFrame({"i": [0, 1], "a": [1.0, 2.0], "b": [3.0, 4.0]})
        B = pd.DataFrame({"i": [1, 2], "a": [10.0, 20.0], "c": [9.0, 9.0]})
        g = ((pes.from_pandas(A).set_index("i")
              + pes.from_pandas(B).set_index("i"))
             .compute().sort_index())
        w = (A.set_index("i") + B.set_index("i")).sort_index()
        assert list(g.columns) == list(w.columns)
        assert np.allclose(g.to_numpy(), w.to_numpy(), equal_nan=True)


class TestSeriesCombineFirst:
    def test_aligned_overlay(self, spark):
        A = pd.DataFrame({"i": [0, 1, 2], "v": [1.0, None, 3.0]})
        B = pd.DataFrame({"i": [1, 2, 3], "v": [20.0, 30.0, 40.0]})
        got = (pes.from_pandas(A).set_index("i")["v"]
               .combine_first(pes.from_pandas(B).set_index("i")["v"])
               .compute().sort_index())
        want = (A.set_index("i")["v"]
                .combine_first(B.set_index("i")["v"]))
        assert np.allclose(got.to_numpy(), want.to_numpy(), equal_nan=True)


class TestAccessorEdges:
    def test_dt_flags_nat_false(self, spark):
        pdf = pd.DataFrame({"i": range(3),
                            "t": pd.to_datetime(["2024-01-31", None,
                                                 "2024-12-31"])})
        d = pes.from_pandas(pdf).set_index("i")
        p = pdf.set_index("i")
        for flag in ("is_month_start", "is_month_end", "is_quarter_end",
                     "is_year_end", "is_year_start", "is_leap_year"):
            got = getattr(d["t"].dt, flag).compute().sort_index().tolist()
            want = getattr(p["t"].dt, flag).tolist()
            assert got == want, flag

    def test_str_get_out_of_range_nan(self, spark):
        pdf = pd.DataFrame({"s": ["ab", "", None, "x"]})
        got = pes.from_pandas(pdf)["s"].str.get(1).compute().tolist()
        want = pd.Series(["ab", "", None, "x"]).str.get(1).tolist()
        assert [g if isinstance(g, str) else None for g in got] == \
            [w if isinstance(w, str) else None for w in want]

    def test_extract_single_group_expands(self, spark):
        pdf = pd.DataFrame({"s": ["x_a", "nope", None]})
        got = pes.from_pandas(pdf)["s"].str.extract(r"x_([a-z])").compute()
        assert 0 in got.columns  # pandas int label for unnamed group
        assert got[0].tolist()[0] == "a"
        # expand=False keeps the Series form
        s = pes.from_pandas(pdf)["s"].str.extract(r"x_([a-z])",
                                                  expand=False)
        assert s.compute().tolist()[0] == "a"


class TestPandasStyleWrappers:
    def test_pivot_table_index(self, spark):
        P = pd.DataFrame({"r": ["a", "a", "b"], "c": ["x", "y", "x"],
                          "v": [1.0, 2.0, 3.0]})
        got = (pes.from_pandas(P)
               .pivot_table(index="r", columns="c", values="v",
                            aggfunc="mean").compute().sort_index())
        want = P.pivot_table(index="r", columns="c", values="v",
                             aggfunc="mean")
        assert got.index.tolist() == want.index.tolist()
        assert np.allclose(got["x"], want["x"], equal_nan=True)

    def test_get_dummies_series(self, spark):
        P = pd.DataFrame({"c": ["x", "y", "x"]})
        got = pes.get_dummies(pes.from_pandas(P)["c"]).compute()
        assert sorted(c.split("_")[-1] for c in got.columns) == ["x", "y"]

    def test_crosstab_two_series(self, spark):
        P = pd.DataFrame({"r": ["a", "a", "b"], "c": ["x", "y", "x"]})
        d = pes.from_pandas(P)
        got = pes.crosstab(d["r"], d["c"]).compute()
        want = pd.crosstab(P["r"], P["c"])
        assert sorted(got.columns[-2:]) == sorted(map(str, want.columns))


class TestHuntBatch7:
    """Hunt batch 7: merge indicator with matched-null keys, pandas API
    parameters (fillna limit, replace regex, nlargest keep, value_counts
    bins, concat keys, astype-str null repr, Series.dot)."""

    def test_merge_indicator_null_keys(self, spark):
        A = pd.DataFrame({"k": [1, 2, 2, None], "v": [10.0, 20.0, 21.0, 40.0]})
        B = pd.DataFrame({"k": [2, 3, None], "w": [200.0, 300.0, 400.0]})
        got = pes.from_pandas(A).merge(pes.from_pandas(B), on="k",
                                       how="outer", indicator=True).compute()
        want = A.merge(B, on="k", how="outer", indicator=True)
        assert (sorted(got["_merge"].astype(str))
                == sorted(want["_merge"].astype(str)))

    def test_fillna_limit(self, spark):
        pdf = pd.DataFrame({"i": range(5), "v": [None, None, 3.0, None, 5.0]})
        d = pes.from_pandas(pdf).set_index("i")["v"]
        got = d.fillna(0.0, limit=2).compute().sort_index().tolist()
        want = pdf.set_index("i")["v"].fillna(0.0, limit=2).tolist()
        assert str(got) == str(want)

    def test_replace_regex(self, spark):
        s = pd.Series(["foo123", "bar", None])
        d = pes.from_pandas(s.to_frame("v"))
        got = d["v"].replace(r"\d+", "", regex=True).compute().tolist()
        want = s.replace(r"\d+", "", regex=True).tolist()
        assert [x if isinstance(x, str) else None for x in got] == \
            [x if isinstance(x, str) else None for x in want]
        gotf = d.replace(r"\d+", "", regex=True).compute()["v"].tolist()
        assert [x if isinstance(x, str) else None for x in gotf] == \
            [x if isinstance(x, str) else None for x in got]

    def test_nlargest_nsmallest_keep(self, spark):
        pdf = pd.DataFrame({"i": range(4), "v": [3.0, 3.0, 2.0, None]})
        d = pes.from_pandas(pdf).set_index("i")["v"]
        assert sorted(d.nlargest(2, keep="all").compute().tolist()) == [3.0, 3.0]
        assert d.nlargest(1, keep="first").compute().index.tolist() == [0]
        assert d.nlargest(1, keep="last").compute().index.tolist() == [1]
        # pandas drops nulls entirely
        assert sorted(d.nlargest(4).compute().tolist()) == [2.0, 3.0, 3.0]
        assert sorted(d.nsmallest(1, keep="all").compute().tolist()) == [2.0]

    def test_value_counts_bins_pandas_labels(self, spark):
        s = pd.Series([1.0, 1.0, 9.0])
        d = pes.from_pandas(s.to_frame("v"))["v"]
        got = d.value_counts(bins=3).compute()
        want = s.value_counts(bins=3)
        assert got.tolist() == want.tolist()          # zero bin emitted
        assert got.index.tolist() == [str(i) for i in want.index.tolist()]

    def test_concat_keys(self, spark):
        A = pd.DataFrame({"v": [1.0, 2.0]})
        B = pd.DataFrame({"v": [3.0]})
        got = pes.concat([pes.from_pandas(A), pes.from_pandas(B)],
                         keys=["a", "b"]).compute()
        assert sorted(got["v"].tolist()) == [1.0, 2.0, 3.0]
        keys = [i[0] if isinstance(i, tuple) else i for i in got.index]
        assert sorted(keys) == ["a", "a", "b"]

    def test_astype_str_null_repr(self, spark):
        s = pd.Series([1.5, None])
        d = pes.from_pandas(s.to_frame("v"))["v"]
        assert sorted(d.astype(str).compute().tolist()) == ["1.5", "nan"]

    def test_series_dot(self, spark):
        pdf = pd.DataFrame({"i": range(3), "a": [1.0, 2.0, 3.0],
                            "b": [4.0, 5.0, 6.0]})
        d = pes.from_pandas(pdf).set_index("i")
        assert float(d["a"].dot(d["b"]).compute()) == 32.0


class TestHuntBatch8:
    """Hunt batch 8: groupby(Series)/value_counts/quantile-list, in-place
    update, where/mask Series other, isin(Series), resample on index,
    rolling(on=), explode multi-column, pivot_table margins, axis=1
    count/any/all, cov min_periods, to_datetime unit, str.partition."""

    def test_groupby_series_key(self, spark):
        P = pd.DataFrame({"g": ["a", "a", "b"], "v": [1.0, 2.0, 4.0]})
        d = pes.from_pandas(P)
        got = d.groupby(d["g"])["v"].sum().compute().sort_index().tolist()
        assert got == P.groupby(P["g"])["v"].sum().tolist()
        # derived expression key
        got2 = (d.groupby((d["v"] > 1.5).rename("big"))["v"].sum()
                .compute().sort_index().tolist())
        assert got2 == P.groupby(P["v"] > 1.5)["v"].sum().tolist()

    def test_grouped_value_counts_series_shape(self, spark):
        P = pd.DataFrame({"g": ["a", "a", "b", "b", "b"],
                          "h": [1, 2, 1, 1, 2]})
        got = pes.from_pandas(P).groupby("g")["h"].value_counts().compute()
        want = P.groupby("g")["h"].value_counts()
        assert sorted(got.tolist()) == sorted(want.tolist())
        assert got.index.nlevels == 2

    def test_grouped_quantile_list(self, spark):
        P = pd.DataFrame({"g": ["a", "a", "b", "b"],
                          "w": [10.0, 20.0, 30.0, 50.0]})
        got = (pes.from_pandas(P).groupby("g")["w"].quantile([0.25, 0.75])
               .compute().sort_index())
        want = P.groupby("g")["w"].quantile([0.25, 0.75]).sort_index()
        assert np.allclose(got.tolist(), want.tolist())

    def test_update_in_place(self, spark):
        A = pd.DataFrame({"i": [0, 1, 2], "v": [1.0, 2.0, 3.0]})
        B = pd.DataFrame({"i": [1, 2], "v": [20.0, None]})
        da = pes.from_pandas(A).set_index("i")
        da.update(pes.from_pandas(B).set_index("i"))
        wa = A.set_index("i"); wa.update(B.set_index("i"))
        assert da.compute().sort_index()["v"].tolist() == wa["v"].tolist()

    def test_where_series_other(self, spark):
        pdf = pd.DataFrame({"i": range(3), "v": [1.0, 5.0, 2.0],
                            "o": [0.1, 0.2, 0.3]})
        d = pes.from_pandas(pdf).set_index("i")
        got = d["v"].where(d["v"] > 2, d["o"]).compute().sort_index().tolist()
        p = pdf.set_index("i")
        assert got == p["v"].where(p["v"] > 2, p["o"]).tolist()

    def test_isin_series(self, spark):
        pdf = pd.DataFrame({"i": range(3), "v": [1.0, 2.0, None],
                            "u": [1.0, None, 9.0]})
        d = pes.from_pandas(pdf).set_index("i")
        got = d["v"].isin(d["u"]).compute().sort_index().tolist()
        assert got == pdf["v"].isin(pdf["u"]).tolist()

    def test_resample_on_index(self, spark):
        E = pd.DataFrame({"ts": pd.to_datetime(
            ["2024-01-01", "2024-01-15", "2024-02-03"]),
            "v": [1.0, 2.0, 4.0]})
        d = pes.from_pandas(E).set_index("ts")
        got = d.resample("MS")["v"].sum().compute().sort_index()
        want = E.set_index("ts").resample("MS")["v"].sum()
        assert got.tolist() == want.tolist()

    def test_rolling_on_column(self, spark):
        pdf = pd.DataFrame({"t": [1, 2, 3, 4], "v": [1.0, 2.0, 3.0, 4.0]})
        d = pes.from_pandas(pdf)
        got = sorted(d.rolling(2, on="t")["v"].sum().compute()
                     .dropna().tolist())
        want = sorted(pdf.rolling(2, on="t")["v"].sum().dropna().tolist())
        assert got == want

    def test_explode_multi_column(self, spark):
        pdf = pd.DataFrame({"a": [[1, 2], [3]], "b": [["x", "y"], ["z"]]})
        got = pes.from_pandas(pdf).explode(["a", "b"]).compute()
        want = pdf.explode(["a", "b"])
        assert sorted(zip(got["a"], got["b"])) == sorted(
            zip(want["a"], want["b"]))

    def test_pivot_table_margins(self, spark):
        P = pd.DataFrame({"g": ["a", "a", "b"], "h": [1, 2, 1],
                          "w": [10.0, 20.0, 70.0]})
        got = (pes.from_pandas(P)
               .pivot_table(index="g", columns="h", values="w",
                            aggfunc="mean", margins=True)
               .compute().sort_index())
        want = P.pivot_table(index="g", columns="h", values="w",
                             aggfunc="mean", margins=True)
        want.index = want.index.map(str)
        assert np.allclose(got["All"].sort_index().tolist(),
                           want["All"].sort_index().tolist())
        assert sorted(got.index) == sorted(want.index)

    def test_axis1_count_any_all(self, spark):
        pdf = pd.DataFrame({"a": [1.0, None], "b": [3.0, 4.0]})
        d = pes.from_pandas(pdf)
        assert sorted(d.count(axis=1).compute().tolist()) == \
            sorted(pdf.count(axis=1).tolist())
        bdf = pd.DataFrame({"a": [True, False], "b": [True, True]})
        bd = pes.from_pandas(bdf)
        assert sorted(bd.any(axis=1).compute().tolist()) == \
            sorted(bdf.any(axis=1).tolist())
        assert sorted(bd.all(axis=1).compute().tolist()) == \
            sorted(bdf.all(axis=1).tolist())

    def test_cov_min_periods(self, spark):
        pdf = pd.DataFrame({"a": [1.0, None, 3.0], "b": [2.0, 4.0, 6.0]})
        got = pes.from_pandas(pdf).cov(min_periods=3).compute()
        want = pdf.cov(min_periods=3)
        assert np.allclose(got.to_numpy(), want.to_numpy(), equal_nan=True)

    def test_to_datetime_unit(self, spark):
        pdf = pd.DataFrame({"e": [1700000000, 1700086400]})
        d = pes.from_pandas(pdf)
        got = pes.to_datetime(d["e"], unit="s").compute().astype(str).tolist()
        assert got == pd.to_datetime(pdf["e"], unit="s").astype(str).tolist()

    def test_str_partition(self, spark):
        s = pd.Series(["a_b_c", "xy", None])
        d = pes.from_pandas(s.to_frame("v"))["v"]
        got = d.str.partition("_").compute()
        want = s.str.partition("_")
        assert got.fillna("~").values.tolist() == \
            want.fillna("~").values.tolist()


class TestHuntBatch9:
    """Hunt batch 9: frame axis binops, row-wise idx extremes, grouped
    positional shapes (cumcount/ngroup Series, nth, negative head/tail),
    query @vars, Series combine/argmax/is_unique, equals, accessor tails."""

    def test_frame_sub_series_axis0(self, spark):
        P = pd.DataFrame({"i": range(3), "v": [1.0, 2.0, 4.0],
                          "w": [10.0, 20.0, 30.0]})
        d = pes.from_pandas(P).set_index("i")
        got = d[["v", "w"]].sub(d["v"], axis=0).compute().sort_index()
        want = P.set_index("i")[["v", "w"]].sub(P.set_index("i")["v"],
                                                axis=0)
        assert np.allclose(got.to_numpy(), want.to_numpy())

    def test_idxmax_axis1(self, spark):
        pdf = pd.DataFrame({"a": [1.0, 9.0, None], "b": [5.0, 2.0, None]})
        d = pes.from_pandas(pdf)
        got = sorted(d.idxmax(axis=1).compute().dropna().tolist())
        want = sorted(pdf.idxmax(axis=1).dropna().tolist())
        assert got == want
        got2 = sorted(d.idxmin(axis=1).compute().dropna().tolist())
        assert got2 == sorted(pdf.idxmin(axis=1).dropna().tolist())

    def test_groupby_cumcount_ngroup_series(self, spark):
        P = pd.DataFrame({"g": ["a", "a", "b"], "i": range(3),
                          "v": [1.0, 2.0, 3.0]})
        d = pes.from_pandas(P).set_index("i")
        p = P.set_index("i")
        assert (d.groupby("g").cumcount().compute().sort_index().tolist()
                == p.groupby("g").cumcount().tolist())
        assert (d.groupby("g").ngroup().compute().sort_index().tolist()
                == p.groupby("g").ngroup().tolist())

    def test_groupby_nth_and_negative_head(self, spark):
        P = pd.DataFrame({"g": ["a", "a", "b", "b", "b"], "i": range(5),
                          "v": [1.0, 3.0, 2.0, 8.0, 4.0]})
        d = pes.from_pandas(P).set_index("i")
        p = P.set_index("i")
        assert sorted(d.groupby("g").nth(1).compute()["v"]) == \
            sorted(p.groupby("g").nth(1)["v"])
        assert sorted(d.groupby("g").nth(-1).compute()["v"]) == \
            sorted(p.groupby("g").nth(-1)["v"])
        assert sorted(d.groupby("g").head(-1).compute()["v"]) == \
            sorted(p.groupby("g").head(-1)["v"])
        assert sorted(d.groupby("g").tail(-1).compute()["v"]) == \
            sorted(p.groupby("g").tail(-1)["v"])

    def test_frame_head_tail_negative(self, spark):
        P = pd.DataFrame({"i": range(5), "v": [1.0, 3.0, 2.0, 8.0, 4.0]})
        d = pes.from_pandas(P).set_index("i")
        p = P.set_index("i")
        assert sorted(d.head(-2).compute()["v"]) == sorted(p.head(-2)["v"])
        assert sorted(d.tail(-2).compute()["v"]) == sorted(p.tail(-2)["v"])

    def test_query_at_variable(self, spark):
        P = pd.DataFrame({"v": [1.0, 3.0, 8.0]})
        d = pes.from_pandas(P)
        thr = 2.0
        got = sorted(d.query("v > @thr").compute()["v"].tolist())
        assert got == sorted(P.query("v > @thr")["v"].tolist())
        got2 = sorted(d.query("v > @t", local_dict={"t": 3.0})
                      .compute()["v"].tolist())
        assert got2 == [8.0]

    def test_series_combine_argmax_is_unique(self, spark):
        P = pd.DataFrame({"i": range(3), "a": [1.0, 5.0, 2.0],
                          "b": [3.0, 1.0, 9.0]})
        d = pes.from_pandas(P).set_index("i")
        assert d["a"].combine(d["b"], max).compute().sort_index().tolist() \
            == P.set_index("i")["a"].combine(P.set_index("i")["b"],
                                             max).tolist()
        assert d["a"].argmax() == 1
        assert d["a"].argmin() == 0
        assert d["a"].is_unique
        assert not pes.from_pandas(
            pd.DataFrame({"v": [1.0, 1.0]}))["v"].is_unique

    def test_frame_equals(self, spark):
        P = pd.DataFrame({"v": [1.0, 2.0]})
        assert pes.from_pandas(P).equals(pes.from_pandas(P))
        assert not pes.from_pandas(P).equals(
            pes.from_pandas(P.assign(v=[1.0, 3.0])))

    def test_str_extractall_and_isocalendar(self, spark):
        s = pd.Series(["a1b2", "c3"])
        d = pes.from_pandas(s.to_frame("v"))["v"]
        got = d.str.extractall(r"(\d)").compute()
        want = s.str.extractall(r"(\d)")
        assert sorted(got[got.columns[-1]]) == sorted(want[0])
        E = pd.Series(pd.to_datetime(["2024-02-15", "2023-12-31"]))
        de = pes.from_pandas(E.to_frame("ts"))["ts"]
        gic = de.dt.isocalendar().compute()
        wic = E.dt.isocalendar()
        assert sorted(map(tuple, gic[["year", "week", "day"]].to_numpy()
                          .tolist())) == \
            sorted(map(tuple, wic.astype("int64").to_numpy().tolist()))
