"""Differential tests for merge_asof and rollup/cube (pandas oracle,
SURVEY §5 pattern)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from conftest import assert_frame_eq


@pytest.fixture()
def trades_quotes():
    rng = np.random.RandomState(7)
    trades = pd.DataFrame({
        "tid": range(60),
        "sym": [["A", "B", "C"][i % 3] for i in range(60)],
        "t": np.sort(rng.randint(0, 1000, 60)).astype("int64"),
    })
    quotes = pd.DataFrame({
        "sym": [["A", "B", "C"][i % 3] for i in range(90)],
        "t": np.sort(rng.randint(0, 1000, 90)).astype("int64"),
        "px": rng.rand(90) * 100,
    })
    # dedup (sym, t) so the picked row is unique → deterministic comparison
    quotes = quotes.drop_duplicates(["sym", "t"], keep="last")
    trades = trades.drop_duplicates(["sym", "t"], keep="last")
    return trades, quotes


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("exact", [True, False])
def test_merge_asof_matches_pandas(spark, trades_quotes, direction, exact):
    import pandas_expr_spark as pes

    trades, quotes = trades_quotes
    want = pd.merge_asof(
        trades.sort_values("t"), quotes.sort_values("t"),
        on="t", by="sym", direction=direction, allow_exact_matches=exact)

    lt = pes.from_pandas(trades)
    rq = pes.from_pandas(quotes)
    got = pes.merge_asof(lt, rq, on="t", by="sym", direction=direction,
                         allow_exact_matches=exact)
    assert_frame_eq(got, want[["tid", "sym", "t", "px"]], sort_by=["tid"])


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("exact", [True, False])
def test_merge_asof_no_by_matches_pandas(spark, direction, exact):
    """No-`by` asof takes the distributed last_scan path (no global
    window) — differential vs pandas with values spanning many range
    partitions so cross-partition carries are exercised."""
    import pandas_expr_spark as pes

    rng = np.random.RandomState(11)
    trades = pd.DataFrame({
        "tid": range(300),
        "t": np.sort(rng.randint(0, 5000, 300)).astype("int64"),
    }).drop_duplicates("t", keep="last")
    quotes = pd.DataFrame({
        "t": np.sort(rng.randint(0, 5000, 200)).astype("int64"),
        "px": rng.rand(200) * 100,
    }).drop_duplicates("t", keep="last")
    want = pd.merge_asof(trades, quotes, on="t", direction=direction,
                         allow_exact_matches=exact)
    got = pes.merge_asof(pes.from_pandas(trades), pes.from_pandas(quotes),
                         on="t", direction=direction,
                         allow_exact_matches=exact)
    assert_frame_eq(got, want[["tid", "t", "px"]], sort_by=["tid"])


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tol", [5, 50])
def test_merge_asof_tolerance(spark, trades_quotes, direction, tol):
    import pandas_expr_spark as pes

    trades, quotes = trades_quotes
    want = pd.merge_asof(
        trades.sort_values("t"), quotes.sort_values("t"),
        on="t", by="sym", direction=direction, tolerance=tol)
    got = pes.merge_asof(pes.from_pandas(trades), pes.from_pandas(quotes),
                         on="t", by="sym", direction=direction,
                         tolerance=tol)
    assert_frame_eq(got, want[["tid", "sym", "t", "px"]], sort_by=["tid"])


def test_merge_asof_tolerance_timedelta(spark, trades_quotes):
    import pandas_expr_spark as pes

    trades, quotes = trades_quotes
    trades = trades.assign(t=pd.to_datetime(trades["t"], unit="m"))
    quotes = quotes.assign(t=pd.to_datetime(quotes["t"], unit="m"))
    want = pd.merge_asof(
        trades.sort_values("t"), quotes.sort_values("t"),
        on="t", by="sym", tolerance=pd.Timedelta("30min"))
    got = pes.merge_asof(pes.from_pandas(trades), pes.from_pandas(quotes),
                         on="t", by="sym", tolerance=pd.Timedelta("30min"))
    assert_frame_eq(got, want[["tid", "sym", "t", "px"]], sort_by=["tid"])


def test_merge_asof_direction_validation(spark, trades_quotes):
    import pandas_expr_spark as pes
    trades, quotes = trades_quotes
    with pytest.raises(ValueError):
        pes.merge_asof(pes.from_pandas(trades), pes.from_pandas(quotes),
                       on="t", by="sym", direction="sideways")


def test_rollup_matches_pandas_concat(spark, gdf, groupby_pdf):
    got = gdf.rollup(["x"]).agg(n=("y", "count"), s=("y", "sum")).compute()
    # pandas oracle: per-group + grand total
    per = groupby_pdf.groupby("x").agg(n=("y", "count"), s=("y", "sum")).reset_index()
    total = pd.DataFrame({"x": [np.nan], "n": [len(groupby_pdf)],
                          "s": [groupby_pdf["y"].sum()]})
    want = pd.concat([per, total], ignore_index=True)
    assert_frame_eq(got, want, sort_by=["n", "s"])


def test_cube_two_keys_row_count(spark):
    import pandas_expr_spark as pes
    pdf = pd.DataFrame({"a": ["p", "p", "q"], "b": ["u", "v", "u"],
                        "v": [1, 2, 3]})
    got = pes.from_pandas(pdf).cube(["a", "b"]).agg(n=("v", "count")).compute()
    # grouping sets: (a,b)=3 distinct, (a)=2, (b)=2, ()=1
    assert len(got) == 8
    grand = got[got["a"].isna() & got["b"].isna()]
    assert grand["n"].iloc[0] == 3


def test_series_floor_ceil(spark, base):
    got = base.assign(f=(base.y / 3).floor(), c=(base.y / 3).ceil()).compute()
    assert (got["f"] == np.floor(got["y"] / 3)).all()
    assert (got["c"] == np.ceil(got["y"] / 3)).all()
    assert got["f"].dtype == np.int64
