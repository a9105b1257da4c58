"""Round-5 hunt wave R2 pins: comparison null semantics, order-stamp
propagation through to_frame/groupby/merge/concat, drop_duplicates
pandas default, dict-fillna missing keys."""
from __future__ import annotations

import numpy as np
import pandas as pd

import pandas_expr_spark as pes

D = pd.DataFrame({"g": list("abcabc"),
                  "v": [1.0, 5.0, 3.0, np.nan, 2.0, 4.0],
                  "k": [10, 20, 30, 40, 50, 60]})


def test_ne_keeps_nan_rows():
    # numpy: NaN != 3 is True — SQL's null-propagating != silently
    # dropped the NaN row from the filter
    e = pes.from_pandas(D)
    want = D[D["v"] != 3]
    got = e[e["v"] != 3].compute()
    assert len(got) == len(want) == 5
    assert got["v"].isna().sum() == 1
    # query() spelling too
    got = e.query("v != 3").compute()
    assert len(got) == 5
    # eq/gt masks are bool-dtype False at NaN (and ~mask flips to True)
    s = pes.from_pandas(pd.Series([1.0, np.nan, 3.0]))
    assert (s == 3.0).compute().tolist() == [False, False, True]
    assert (~(s > 2)).compute().tolist() == [True, True, False]


def test_grouped_cumsum_follows_sorted_order():
    e = pes.from_pandas(D)
    want = D.sort_values("v").assign(
        cs=lambda d: d.groupby("g")["v"].cumsum())
    got = e.sort_values("v").assign(
        cs=lambda d: d.groupby("g")["v"].cumsum()).compute()
    assert np.allclose(got["cs"], want["cs"], equal_nan=True)
    assert got["k"].tolist() == want["k"].tolist()


def test_concat_then_positional_ops_no_row_explosion():
    # duplicate rowid labels after a self-concat: positional assigns must
    # align on the unique order stamp, not explode on the rowid join
    e = pes.from_pandas(D)
    c = pes.concat([e, e])
    want = pd.concat([D, D])
    want = want.assign(df_=want["v"].diff())
    got = c.assign(df_=c["v"].diff()).compute()
    assert len(got) == len(want) == 12
    assert np.allclose(got["df_"], want["df_"], equal_nan=True)
    # grouped too
    want2 = pd.concat([D, D])
    want2 = want2.assign(cs=want2.groupby("g")["v"].cumsum())
    got2 = c.assign(cs=c.groupby("g")["v"].cumsum()).compute()
    assert len(got2) == 12
    assert np.allclose(got2["cs"], want2["cs"], equal_nan=True)


def test_drop_duplicates_defaults_to_first_in_presented_order():
    e = pes.from_pandas(D)
    want = D.sort_values("v").drop_duplicates(subset="g")
    got = e.sort_values("v").drop_duplicates(subset="g").compute()
    assert sorted(got["k"]) == sorted(want["k"])
    want = D.sort_values("v").drop_duplicates(subset="g", keep="last")
    got = e.sort_values("v").drop_duplicates(subset="g",
                                             keep="last").compute()
    assert sorted(got["k"]) == sorted(want["k"])


def test_merge_keeps_left_order_stamp():
    aux = pd.DataFrame({"g": list("abc"), "w": [100.0, 200.0, 300.0]})
    e = pes.from_pandas(D)
    ea = pes.from_pandas(aux)
    want = D.sort_values("v").merge(aux, on="g", how="left").head(4)
    got = (e.sort_values("v").merge(ea, on="g", how="left").head(4)
           .compute())
    assert got["k"].tolist() == want["k"].tolist()


def test_fillna_dict_ignores_missing_keys():
    e = pes.from_pandas(D)
    agg = e.groupby("g", as_index=False).agg(mx=("v", "max"))
    out = agg.fillna({"v": 0.0}).compute()   # no 'v' column → no-op
    assert sorted(out.columns) == ["g", "mx"]


def test_boolean_logic_with_null_operands():
    # composition insurance for the comparison-null work: &, |, ^, ~ over
    # masks whose operands include NaN all match pandas bool semantics
    D2 = pd.DataFrame({"v": [1.0, np.nan, 3.0, 4.0],
                       "u": [np.nan, 2.0, 1.0, 5.0]})
    e2 = pes.from_pandas(D2)
    assert ((e2.v > 2) & (e2.u > 2)).compute().tolist() == \
        ((D2.v > 2) & (D2.u > 2)).tolist()
    assert ((e2.v > 2) | (e2.u > 2)).compute().tolist() == \
        ((D2.v > 2) | (D2.u > 2)).tolist()
    assert ((e2.v != 3) & (e2.u > 2)).compute().tolist() == \
        ((D2.v != 3) & (D2.u > 2)).tolist()
    assert (~((e2.v > 2) | (e2.u > 2))).compute().tolist() == \
        (~((D2.v > 2) | (D2.u > 2))).tolist()
    assert list(e2[(e2.v > 2) | (e2.u > 2)].compute()["v"]) == \
        list(D2[(D2.v > 2) | (D2.u > 2)]["v"])
