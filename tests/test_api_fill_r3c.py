"""Round-3 continuation-8 API fill: groupby.sample, pd.wide_to_long,
pd.json_normalize — differential vs pandas where semantics are shared
(reshape, flatten), invariant-based for the deterministic hash sample
(the draw itself is engine-defined, pandas uses an RNG)."""

from __future__ import annotations

import pandas as pd
import pandas.testing as tm
import pytest

import pandas_expr_spark as pes


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return (pdf.reset_index()
            .sort_values(list(pdf.reset_index().columns))
            .reset_index(drop=True))


# ---------------------------------------------------------------- sample
@pytest.fixture()
def grp_pdf():
    return pd.DataFrame({
        "g": ["a"] * 40 + ["b"] * 7 + ["c"] * 1,
        "v": range(48),
    })


def test_groupby_sample_n(spark, grp_pdf):
    f = pes.from_pandas(grp_pdf)
    out = f.groupby("g").sample(n=5).compute()
    counts = out["g"].value_counts().to_dict()
    # capped at group size (engine divergence: no raise for small groups)
    assert counts == {"a": 5, "b": 5, "c": 1}
    # sampled rows are genuine rows of the input
    assert set(out["v"]).issubset(set(grp_pdf["v"]))
    # row labels survive: each sampled v sits at its original label
    assert (out["v"].to_numpy() == out.index.to_numpy()).all()


def test_groupby_sample_deterministic_and_seeded(spark, grp_pdf):
    f = pes.from_pandas(grp_pdf)
    a = sorted(f.groupby("g").sample(n=3).compute()["v"])
    b = sorted(f.groupby("g").sample(n=3).compute()["v"])
    assert a == b  # same draw every run
    c = sorted(f.groupby("g").sample(n=3, random_state=7).compute()["v"])
    d = sorted(f.groupby("g").sample(n=3, random_state=7).compute()["v"])
    assert c == d
    assert a != c  # different seed -> different draw (overwhelmingly)


def test_groupby_sample_frac_quota(spark, grp_pdf):
    f = pes.from_pandas(grp_pdf)
    out = f.groupby("g").sample(frac=0.5).compute()
    counts = out["g"].value_counts().to_dict()
    # round(frac*size): round(20.0)=20, round(3.5)=4 (banker's -> 4),
    # round(0.5)=0 (banker's)
    assert counts.get("a", 0) == 20
    assert counts.get("b", 0) == round(3.5)
    assert counts.get("c", 0) == round(0.5)


def test_groupby_sample_slice_and_guards(spark, grp_pdf):
    f = pes.from_pandas(grp_pdf)
    out = f.groupby("g")[["v"]].sample(n=2).compute()
    assert list(out.columns) == ["v"]
    with pytest.raises(NotImplementedError):
        f.groupby("g").sample(n=2, replace=True)
    with pytest.raises(ValueError):
        f.groupby("g").sample()
    with pytest.raises(ValueError):
        f.groupby("g").sample(n=2, frac=0.5)


def test_groupby_sample_dropna_excludes_null_groups(spark):
    pdf = pd.DataFrame({"g": ["a", "a", None, None], "v": [1, 2, 3, 4]})
    f = pes.from_pandas(pdf)
    out = f.groupby("g").sample(n=2).compute()
    assert set(out["g"]) == {"a"}


# ---------------------------------------------------------- wide_to_long
@pytest.fixture()
def wide_pdf():
    return pd.DataFrame({
        "famid": [1, 1, 2, 2, 3, 3],
        "birth": [1, 2, 1, 2, 1, 2],
        "ht1": [2.8, 2.9, 2.2, 2.0, 2.2, 2.3],
        "ht2": [3.4, 3.8, 2.9, 3.2, 2.9, 3.0],
        "age": [10, 11, 12, 13, 14, 15],
    })


def test_wide_to_long_matches_pandas(spark, wide_pdf):
    exp = pd.wide_to_long(wide_pdf, "ht", i=["famid", "birth"], j="year")
    got = pes.wide_to_long(pes.from_pandas(wide_pdf), "ht",
                           i=["famid", "birth"], j="year").compute()
    tm.assert_frame_equal(_sorted(got), _sorted(exp), check_dtype=False)


def test_wide_to_long_two_stubs_missing_suffix(spark):
    pdf = pd.DataFrame({
        "id": [1, 2],
        "A1": [1.0, 2.0], "A2": [3.0, 4.0],
        "B1": [5.0, 6.0],          # B2 missing -> nulls for suffix 2
        "other": ["x", "y"],
    })
    exp = pd.wide_to_long(pdf, ["A", "B"], i="id", j="t")
    got = pes.wide_to_long(pes.from_pandas(pdf), ["A", "B"],
                           i="id", j="t").compute()
    tm.assert_frame_equal(_sorted(got), _sorted(exp), check_dtype=False)


def test_wide_to_long_sep_and_string_suffix(spark):
    pdf = pd.DataFrame({
        "id": [1, 2],
        "x_one": [1, 2], "x_two": [3, 4],
    })
    exp = pd.wide_to_long(pdf, "x", i="id", j="k", sep="_", suffix=r"\w+")
    got = pes.wide_to_long(pes.from_pandas(pdf), "x", i="id", j="k",
                           sep="_", suffix=r"\w+").compute()
    tm.assert_frame_equal(_sorted(got), _sorted(exp), check_dtype=False)


def test_wide_to_long_no_match_raises(spark, wide_pdf):
    with pytest.raises(ValueError):
        pes.wide_to_long(pes.from_pandas(wide_pdf), "zz", i="famid", j="t")


# --------------------------------------------------------- json_normalize
def test_json_normalize_flat_and_nested(spark):
    data = [
        {"id": 1, "info": {"a": 10, "b": {"c": "x"}}},
        {"id": 2, "info": {"a": 20}},
    ]
    exp = pd.json_normalize(data)
    got = pes.json_normalize(data).compute()
    tm.assert_frame_equal(
        got.sort_values("id").reset_index(drop=True),
        exp.sort_values("id").reset_index(drop=True),
        check_dtype=False)


def test_json_normalize_record_path_meta(spark):
    data = [
        {"state": "FL", "counties": [{"name": "Dade", "pop": 12},
                                     {"name": "Broward", "pop": 40}]},
        {"state": "OH", "counties": [{"name": "Summit", "pop": 12}]},
    ]
    exp = pd.json_normalize(data, record_path="counties", meta=["state"])
    got = pes.json_normalize(data, record_path="counties",
                             meta=["state"]).compute()
    tm.assert_frame_equal(
        got.sort_values(["state", "name"]).reset_index(drop=True),
        exp.sort_values(["state", "name"]).reset_index(drop=True),
        check_dtype=False)


# ----------------------------------------------- cap_per_group frac path
def test_cap_per_group_frac_matches_window_oracle(spark):
    from pandas_expr_spark.functions.urls import cap_per_group
    import pyspark.sql.functions as F
    rows = ([("big", i) for i in range(1000)]
            + [("mid", i) for i in range(37)]
            + [("one", 0)])
    sdf = spark.createDataFrame(rows, ["g", "k"]).repartition(8)
    got = cap_per_group(sdf, None, "g", "k", frac=0.25, n_buckets=64)
    oracle = spark.sql("""
        SELECT g, k FROM (
          SELECT g, k,
                 ROW_NUMBER() OVER (PARTITION BY g
                     ORDER BY md5(CAST(k AS STRING)), k) rn,
                 BROUND(COUNT(*) OVER (PARTITION BY g) * 0.25, 0) cap
          FROM {t}) WHERE rn <= cap
    """, t=sdf)
    assert sorted((r["g"], r["k"]) for r in got.collect()) == \
           sorted((r["g"], r["k"]) for r in oracle.collect())


def test_bdate_timedelta_period_ranges(spark):
    import pandas as pd
    import pandas_expr_spark as pes
    br = pes.bdate_range("2024-01-01", periods=10).compute()
    pr = pd.bdate_range("2024-01-01", periods=10)
    assert sorted(str(x)[:10] for x in br) == \
        sorted(str(x)[:10] for x in pr)
    br2 = pes.bdate_range("2024-01-01", end="2024-01-14").compute()
    pr2 = pd.bdate_range("2024-01-01", "2024-01-14")
    assert sorted(str(x)[:10] for x in br2) == \
        sorted(str(x)[:10] for x in pr2)
    tr = pes.timedelta_range("1 day", periods=4, freq="12h").compute()
    pt = pd.timedelta_range("1 day", periods=4, freq="12h")
    assert sorted(map(str, tr)) == sorted(map(str, pt))
    pq = pes.period_range("2024Q1", periods=3, freq="Q").compute()
    pp = pd.period_range("2024Q1", periods=3, freq="Q")
    # r6: compute() restores PeriodDtype for period-valued series (the
    # r3 contract exposed the stored start timestamps)
    assert sorted(map(str, pq)) == sorted(map(str, pp))


def test_grouper_freq_key(spark):
    import pandas as pd
    import pandas_expr_spark as pes
    pdf = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 05:00", "2024-01-01 09:00",
                              "2024-01-02 01:00", "2024-02-03 00:00"]),
        "v": [1.0, 2.0, 3.0, 4.0]})
    f = pes.from_pandas(pdf)
    g = f.groupby(pes.Grouper(key="ts", freq="D"))["v"].sum() \
        .compute().sort_index()
    e = pdf.groupby(pd.Grouper(key="ts", freq="D"))["v"].sum()
    assert list(g) == [x for x in e if x > 0]  # engine emits no empty bins
    gm = f.groupby(pes.Grouper(key="ts", freq="M"))["v"].sum() \
        .compute().sort_index()
    em = pdf.groupby(pd.Grouper(key="ts", freq="M"))["v"].sum()
    assert list(gm) == [x for x in em if x > 0]
