"""Round-5 hunt wave C pins: indexing / accessor / reshape parity.

Before the fixes:
- ``loc`` datetime label slices treated a partial-string stop bound as
  midnight ("2024-02-27" excluded all of Feb 27; pandas includes the
  whole period) and a partial-string scalar key KeyError'd instead of
  selecting its period;
- bare ``stack()`` returned the engine's melt-shaped frame (pandas: a
  Series on the (row, column) MultiIndex);
- ``s.str[...]`` was not subscriptable (pandas: positional getitem on
  strings and split() arrays) and ``str.slice`` rejected a step;
- period-valued ``astype(str)`` printed the stored period-start
  timestamp ("2024-01-01 00:00:00") instead of pandas' Period label
  ("2024Q1");
- ``pes.crosstab(s1, s2)`` required both Series to share one frame
  (pandas inner-aligns on the index) and left the row key as a data
  column (pandas indexes on it).

Probe artifact kept OUT of the pins: tie ORDER after ``sort_index`` on
duplicate keys — pandas' default quicksort is itself unstable, so tie
order is not a parity contract.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pandas_expr_spark as pes


@pytest.fixture
def tdf():
    rng = np.random.RandomState(99)
    n = 30
    return pd.DataFrame({
        "k": rng.choice(list("pq"), n),
        "c": rng.choice(list("uvw"), n),
        "s": [f"Ab-{i % 7} xY_{i}" for i in range(n)],
        "t": pd.Timestamp("2024-02-25") + pd.to_timedelta(
            np.sort(rng.choice(range(0, 9000), n, replace=False)),
            unit="min"),
        "v": rng.randn(n).round(3),
    })


def _series(got, exp):
    pd.testing.assert_series_equal(
        got.sort_index(), exp.sort_index(), check_dtype=False,
        check_index_type=False, check_names=False, check_freq=False,
        rtol=1e-9)


def test_loc_partial_string_slice_end_inclusive(tdf, spark):
    e = pes.from_pandas(tdf).set_index("t")
    p = tdf.set_index("t")
    _series(e.loc["2024-02-25":"2024-02-27"]["v"].compute(),
            p.loc["2024-02-25":"2024-02-27"]["v"])
    _series(e.loc[:"2024-02-26"]["v"].compute(), p.loc[:"2024-02-26"]["v"])


def test_loc_partial_string_scalar_selects_period(tdf, spark):
    e = pes.from_pandas(tdf).set_index("t")
    p = tdf.set_index("t")
    _series(e.loc["2024-02-26"]["v"].compute(), p.loc["2024-02-26"]["v"])


def test_bare_stack_returns_series_on_multiindex(spark):
    pdf = pd.DataFrame({"x": [1.0, None], "y": [None, 2.0]})
    got = pes.from_pandas(pdf).stack().compute().sort_index()
    exp = pdf.stack().sort_index()
    pd.testing.assert_series_equal(got, exp, check_dtype=False,
                                   check_names=False,
                                   check_index_type=False)


def test_unstack_stack_roundtrip(tdf, spark):
    e = pes.from_pandas(tdf).groupby(["k", "c"])["v"].sum().unstack()
    p = tdf.groupby(["k", "c"])["v"].sum().unstack()
    _series(e.stack().compute(), p.stack())


def test_str_getitem_int_and_slice(tdf, spark):
    e, p = pes.from_pandas(tdf), tdf
    _series(e["s"].str[2].compute(), p["s"].str[2])
    _series(e["s"].str[-1].compute(), p["s"].str[-1])
    _series(e["s"].str[1:4].compute(), p["s"].str[1:4])
    _series(e["s"].str[::2].compute(), p["s"].str[::2])


def test_str_split_then_getitem(tdf, spark):
    e, p = pes.from_pandas(tdf), tdf
    _series(e["s"].str.split(" ").str[1].compute(),
            p["s"].str.split(" ").str[1])
    _series(e["s"].str.split(" ").str[-1].compute(),
            p["s"].str.split(" ").str[-1])
    _series(e["s"].str.split(" ").str.get(0).compute(),
            p["s"].str.split(" ").str.get(0))


def test_period_astype_str_labels(tdf, spark):
    e, p = pes.from_pandas(tdf), tdf
    for freq in ("Y", "Q", "M", "D", "h", "min"):
        _series(e["t"].dt.to_period(freq).astype(str).compute(),
                p["t"].dt.to_period(freq).astype(str))


def test_crosstab_foreign_series_and_index(tdf, spark):
    got = pes.crosstab(pes.from_pandas(tdf)["k"],
                       pes.from_pandas(tdf)["c"]).compute().sort_index()
    exp = pd.crosstab(tdf["k"], tdf["c"]).sort_index()
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)],
                                  check_dtype=False, check_names=False)


def test_frame_crosstab_indexes_on_row_key(tdf, spark):
    got = pes.from_pandas(tdf).crosstab("k", "c").compute().sort_index()
    exp = pd.crosstab(tdf["k"], tdf["c"]).sort_index()
    assert got.index.name == "k"
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)],
                                  check_dtype=False, check_names=False)
