"""Round-3 accessor additions: ``.list`` / ``.struct`` (pandas 2.x
ArrowDtype accessor parity) and the full-strftime ``dt.strftime``."""
import pandas as pd
import pytest

import pandas_expr_spark as pes


@pytest.fixture(scope="module")
def lists_frame(spark):
    sdf = spark.createDataFrame(
        [(1, [10, 20, 30], ("a", 1.5)),
         (2, [40], ("b", 2.5)),
         (3, None, ("c", 3.5))],
        "id int, xs array<int>, st struct<name:string,score:double>")
    return pes.from_spark(sdf)


def test_list_len_getitem(lists_frame):
    f = lists_frame
    got = f["xs"].list.len().compute()
    assert list(got.fillna(-1)) == [3, 1, -1]
    first = f["xs"].list[0].compute()
    assert list(first.fillna(-1)) == [10, 40, -1]
    last = f["xs"].list[-1].compute()
    assert list(last.fillna(-1)) == [30, 40, -1]
    # out-of-range position → null, not error
    third = f["xs"].list[2].compute()
    assert list(third.fillna(-1)) == [30, -1, -1]


def test_list_slice_flatten(spark, lists_frame):
    f = lists_frame
    sl = f["xs"].list[0:2].compute()
    assert [list(v) for v in sl.dropna()] == [[10, 20], [40]]
    nested = spark.createDataFrame(
        [(1, [[1, 2], [3]])], "id int, ys array<array<int>>")
    g = pes.from_spark(nested)
    flat = g["ys"].list.flatten().compute()
    assert [list(v) for v in flat] == [[1, 2, 3]]


def test_struct_field_explode_dtypes(lists_frame):
    f = lists_frame
    names = f["st"].struct.field("name").compute()
    assert list(names) == ["a", "b", "c"]
    by_pos = f["st"].struct.field(1).compute()
    assert list(by_pos) == [1.5, 2.5, 3.5]
    ex = f["st"].struct.explode().compute()
    assert list(ex.columns) == ["name", "score"]
    assert list(ex["score"]) == [1.5, 2.5, 3.5]
    dt = f["st"].struct.dtypes
    assert list(dt.index) == ["name", "score"]


def test_accessor_type_guard(lists_frame):
    with pytest.raises(AttributeError):
        lists_frame["id"].list
    with pytest.raises(AttributeError):
        lists_frame["id"].struct


def test_dt_strftime_full_directives(spark):
    pdf = pd.DataFrame(
        {"ts": pd.to_datetime(["2024-03-05 07:08:09", "2025-12-31 23:59:59"])})
    f = pes.from_pandas(pdf)
    got = f["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S").compute()
    exp = pdf["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S")
    assert list(got) == list(exp)
    got2 = f["ts"].dt.strftime("%b %d, %Y").compute()
    exp2 = pdf["ts"].dt.strftime("%b %d, %Y")
    assert list(got2) == list(exp2)


def test_str_rpartition_matches_pandas(spark):
    pdf = pd.DataFrame({"s": ["a-b-c", "nodash", "-lead", "trail-", None]})
    f = pes.from_pandas(pdf)
    got = f["s"].str.rpartition("-").compute()
    exp = pdf["s"].str.rpartition("-")
    for i in range(3):
        assert list(got[i].fillna("<n>")) == list(exp[i].fillna("<n>")), i


def test_str_join_wrap_encode(spark):
    pdf = pd.DataFrame({"s": ["the quick brown fox jumps over it", None]})
    f = pes.from_pandas(pdf)
    lst = f["s"].str.split()
    got = lst.str.join("_").compute()
    exp = pdf["s"].str.split().str.join("_")
    assert list(got.fillna("<n>")) == list(exp.fillna("<n>"))
    gw = f["s"].str.wrap(12).compute()
    ew = pdf["s"].str.wrap(12)
    assert list(gw.fillna("<n>")) == list(ew.fillna("<n>"))
    enc = f["s"].str.encode("utf-8").compute()
    assert bytes(enc.iloc[0]) == pdf["s"].iloc[0].encode()


def test_str_get_dummies_matches_pandas(spark):
    pdf = pd.DataFrame({"s": ["a|b", "b|c", "a", "c|a"]})
    f = pes.from_pandas(pdf)
    got = f["s"].str.get_dummies().compute().sort_index()
    exp = pdf["s"].str.get_dummies()
    assert list(got.columns) == list(exp.columns)
    for c in exp.columns:
        assert list(got[c]) == list(exp[c]), c


def test_str_index_guard(spark):
    f = pes.from_pandas(pd.DataFrame({"s": ["ab"]}))
    with pytest.raises(NotImplementedError):
        f["s"].str.index("a")
    with pytest.raises(NotImplementedError):
        f["s"].str.rindex("a")


def test_dt_alias_and_subsecond(spark):
    ts = pd.to_datetime(["2024-03-05 07:08:09.123456",
                         "2025-12-31 23:59:59.000000"])
    pdf = pd.DataFrame({"t": ts})
    f = pes.from_pandas(pdf)
    assert list(f["t"].dt.day_of_week.compute()) == list(pdf["t"].dt.day_of_week)
    assert list(f["t"].dt.day_of_year.compute()) == list(pdf["t"].dt.day_of_year)
    assert list(f["t"].dt.daysinmonth.compute()) == list(pdf["t"].dt.daysinmonth)
    assert list(f["t"].dt.microsecond.compute()) == list(pdf["t"].dt.microsecond)
    assert list(f["t"].dt.nanosecond.compute()) == [0, 0]


def test_str_center_odd_pad_and_get_negative(spark):
    vals = ["hello", "", "a", None, "xy", "12345"]
    pdf = pd.DataFrame({"s": vals})
    f = pes.from_pandas(pdf)
    got = f["s"].str.center(9, "-").compute().sort_index()
    exp = pdf["s"].str.center(9, "-")
    assert list(got.fillna("<n>")) == list(exp.fillna("<n>"))
    g2 = f["s"].str.get(-1).compute().sort_index()
    e2 = pdf["s"].str.get(-1)
    assert list(g2.fillna("<n>")) == list(e2.fillna("<n>"))
    g3 = f["s"].str.get(-3).compute().sort_index()
    e3 = pdf["s"].str.get(-3)
    assert list(g3.fillna("<n>")) == list(e3.fillna("<n>"))
