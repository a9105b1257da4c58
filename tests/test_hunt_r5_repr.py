"""Round-5 hunt wave B pins: signed-zero / repr-level parity.

The r4 signed-zero driver failure generalized into a property wave that
compares STRINGIFIED engine output against pandas (value-compare hunts
treat ``-0.0 == 0.0`` and ``'1.0E-5' != '1e-05'`` as equal).  ~25 probes;
one real bug found and fixed:

- ``Series.astype(str)`` on floats used Spark's JVM cast, which formats
  with Java's ``Double.toString`` rules (``1.0E-5``, ``1.0E20``) where
  pandas produces Python repr (``1e-05``, ``1e+20``) — silently different
  strings for identical values.  Now an Arrow pandas_udf on exactly that
  cast path (NaN → ``'nan'`` like pandas).

Documented non-bugs from the same wave (deliberately NOT pinned to
pandas):
- engine ``Series.floor()`` returns int64 (no pandas counterpart —
  engine extension used for cents-exact oracles);
- distributed sums can differ from numpy's pairwise summation in the
  last ulp (``mean([0.1]*10)``) — inherent to any partitioned engine.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

import pandas_expr_spark as pes


def _reprs(x):
    return [repr(float(v)) for v in x]


def test_astype_str_python_repr(spark):
    s = pd.Series([-0.0, 0.0, 1e-5, -4.31e-05, 1e20, 0.0001, 123.456])
    got = pes.from_pandas(s.to_frame("v"))["v"].astype(str).compute().tolist()
    assert got == s.astype(str).tolist()


def test_astype_str_nan_formats_like_pandas(spark):
    s = pd.Series([1.5, np.nan, -2.0])
    got = pes.from_pandas(s.to_frame("v"))["v"].astype(str).compute().tolist()
    assert got == s.astype(str).tolist()  # ['1.5', 'nan', '-2.0']


def test_frame_astype_str_python_repr(spark):
    f = pd.DataFrame({"v": [1e-5, 2.5]})
    got = pes.from_pandas(f).astype(str).compute()
    assert got["v"].tolist() == f.astype(str)["v"].tolist()


def test_round_preserves_signed_zero(spark):
    s = pd.Series([-4.31e-05, 4.31e-05, -0.0, 0.0])
    e = pes.from_pandas(s.to_frame("v"))["v"].round(4).compute()
    assert _reprs(e) == _reprs(s.round(4))  # ['-0.0', '0.0', '-0.0', '0.0']


def test_arith_signed_zero_stringified(spark):
    f = pd.DataFrame({"a": [-1.0, 0.0, 1.0], "b": [0.0, -0.0, -0.0]})
    ef = pes.from_pandas(f)
    assert _reprs((ef["a"] * ef["b"]).compute()) == _reprs(f["a"] * f["b"])
    assert _reprs((ef["a"] + ef["b"]).compute()) == _reprs(f["a"] + f["b"])


def test_abs_clip_signed_zero(spark):
    s = pd.Series([-0.0, 0.0, -1.0])
    e = pes.from_pandas(s.to_frame("v"))["v"]
    assert _reprs(e.abs().compute()) == _reprs(s.abs())
    assert _reprs(e.clip(lower=0.0).compute()) == _reprs(s.clip(lower=0.0))


def test_compare_with_nan_literal_all_false(spark):
    # Spark treats NaN = NaN as TRUE; pandas comparisons with a NaN
    # literal are all False (True for !=)
    s = pd.Series([1.0, np.nan, 3.0])
    es = pes.from_pandas(s.to_frame("v"))["v"]
    assert (es == np.nan).compute().tolist() == [False, False, False]
    assert (es != np.nan).compute().tolist() == [True, True, True]
    assert (es > np.nan).compute().tolist() == [False, False, False]
