"""Round-3 parameter-guard lifts (VERDICT r2 'what's missing' #2).

Each test covers an operation that previously raised NotImplementedError:
DataFrame.mode, negative/stepped iloc, corrwith(method='spearman'),
reindex(index=), set_axis(axis=0), grouped expanding().apply, and
grouped resample(fill_empty=True).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pandas_expr_spark import from_pandas


class TestFrameMode:
    def test_matches_pandas(self, spark):
        pdf = pd.DataFrame({"a": [1, 2, 2, 3, 3],
                            "b": ["x", "x", "y", "y", "z"],
                            "c": [1.0, 1.0, 1.0, None, 2.0]})
        want = pdf.mode()
        got = from_pandas(pdf).mode().compute().sort_index()
        assert got.shape == want.shape
        assert got["a"].fillna(-9).tolist() == want["a"].fillna(-9).tolist()
        assert got["b"].fillna("-").tolist() == want["b"].fillna("-").tolist()
        assert got["c"].fillna(-9).tolist() == want["c"].fillna(-9).tolist()

    def test_numeric_only(self, spark):
        pdf = pd.DataFrame({"a": [5, 5, 7], "b": ["u", "v", "v"]})
        want = pdf.mode(numeric_only=True)
        got = from_pandas(pdf).mode(numeric_only=True).compute().sort_index()
        assert list(got.columns) == list(want.columns)
        assert got["a"].tolist() == want["a"].tolist()


class TestIlocExtended:
    @pytest.mark.parametrize("sl", [slice(-5, None), slice(None, -3),
                                    slice(2, -2), slice(1, 15, 3),
                                    slice(None, None, 4), slice(-8, -2, 2)])
    def test_slices_match_pandas(self, spark, sl):
        pdf = pd.DataFrame({"i": range(20),
                            "v": np.arange(20) * 2.0}).set_index("i")
        df = from_pandas(pdf.reset_index()).set_index("i")
        got = df.iloc[sl].compute().sort_index()
        assert got["v"].tolist() == pdf.iloc[sl]["v"].tolist()

    def test_negative_step_reverses(self, spark):
        # implemented in r5 (was a NotImplementedError guard): reversal
        # via the distributed position pass + presentation-rowid anchor
        df = from_pandas(pd.DataFrame({"v": [1, 2, 3]}))
        assert df.iloc[::-1].compute()["v"].tolist() == [3, 2, 1]
        with pytest.raises(ValueError):
            df.iloc[::0]


class TestCorrwithSpearman:
    def test_matches_rank_pearson(self, spark):
        rng = np.random.RandomState(0)
        a = pd.DataFrame({"i": range(50), "x": rng.randn(50),
                          "y": rng.randn(50)}).set_index("i")
        b = pd.DataFrame({"i": range(50), "x": rng.randn(50) ** 2,
                          "y": rng.randn(50)}).set_index("i")
        # pandas corrwith(spearman) needs scipy (absent in this env);
        # the oracle is the definition: pearson on average-tie ranks
        want = {c: np.corrcoef(a[c].rank(), b[c].rank())[0, 1]
                for c in ("x", "y")}
        da = from_pandas(a.reset_index()).set_index("i")
        db = from_pandas(b.reset_index()).set_index("i")
        got = da.corrwith(db, method="spearman").compute()
        for c in ("x", "y"):
            assert abs(got[c] - want[c]) < 1e-9


class TestReindexRows:
    def test_aligns_and_fills(self, spark):
        pdf = pd.DataFrame({"k": [1, 2, 4],
                            "v": [10.0, 20.0, 40.0]}).set_index("k")
        want = pdf.reindex(index=[4, 1, 3]).sort_index()
        got = (from_pandas(pdf.reset_index()).set_index("k")
               .reindex(index=[4, 1, 3]).compute().sort_index())
        assert got["v"].fillna(-1).tolist() == want["v"].fillna(-1).tolist()

    def test_columns_still_works(self, spark):
        pdf = pd.DataFrame({"a": [1], "b": [2]})
        got = from_pandas(pdf).reindex(columns=["b", "z"]).compute()
        assert list(got.columns) == ["b", "z"]
        assert got["z"].isna().all()


class TestSetAxisRows:
    def test_relabels_positionally(self, spark):
        pdf = pd.DataFrame({"i": [0, 1, 2], "v": [1.0, 2.0, 3.0]})
        want = pdf.set_index("i").set_axis(["x", "y", "z"],
                                           axis=0).sort_index()
        got = (from_pandas(pdf).set_index("i")
               .set_axis(["x", "y", "z"], axis=0).compute().sort_index())
        assert got["v"].tolist() == want["v"].tolist()
        assert got.index.tolist() == want.index.tolist()

    def test_length_mismatch_raises(self, spark):
        df = from_pandas(pd.DataFrame({"v": [1, 2, 3]}))
        with pytest.raises(ValueError):
            df.set_axis(["a", "b"], axis=0)


class TestGroupedExpandingApply:
    def test_matches_pandas(self, spark):
        pdf = pd.DataFrame({"g": [1, 1, 1, 2, 2], "i": [0, 1, 2, 0, 1],
                            "v": [1.0, 2.0, 3.0, 10.0, 20.0]})
        want = (pdf.sort_values(["g", "i"]).groupby("g")["v"]
                .expanding().apply(lambda s: s.sum(), raw=True)
                .reset_index(drop=True).to_numpy())
        got = (from_pandas(pdf).set_index("i").groupby("g").expanding()
               .apply(lambda s: s.sum(), raw=True)
               .compute().sort_values(["g", "i"])["v"].to_numpy())
        assert np.allclose(got, want, equal_nan=True)


class TestGroupedResampleFillEmpty:
    def test_per_group_spine(self, spark):
        ts = pd.to_datetime(["2024-01-01", "2024-01-03",
                             "2024-01-01", "2024-01-05"])
        pdf = pd.DataFrame({"g": ["a", "a", "b", "b"], "t": ts,
                            "v": [1.0, 2.0, 3.0, 4.0]})
        got = (from_pandas(pdf).groupby("g")
               .resample("D", "t", fill_empty=True)
               .agg({"v": "sum"}).compute().reset_index())
        # group a spans 3 daily bins, group b spans 5 → 8 rows total
        assert len(got) == 8
        assert (got.groupby("g").size().sort_index().tolist() == [3, 5])
        # empty bins are NaN for sum (pandas semantics: 0.0 only for
        # count-like aggs)
        a_mid = got[(got["g"] == "a")].sort_values("t")["v"].tolist()
        assert a_mid[0] == 1.0 and a_mid[2] == 2.0
