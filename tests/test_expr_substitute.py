"""Expr tree rewriting: substitute / substitute_parameters (reference
pandas_expr/_expr.py:621-686) and the reflected xor dunder."""
from __future__ import annotations

import pandas as pd

import pandas_expr_spark as pes
from pandas_expr_spark._expr import Node


def test_substitute_literals_and_subtrees():
    d = pes.from_pandas(pd.DataFrame({"a": [1, 2], "b": [3, 4]}))
    t = d[d["a"] > 1]._expr
    leaf = list(t.walk())[-1]
    t2 = t.substitute({leaf: Node("other_leaf", {})})
    assert any(n.op == "other_leaf" for n in t2.walk())
    assert t2._name != t._name          # identity tracks the rewrite
    assert t.substitute({}) is t        # no-op returns self


def test_substitute_parameters_by_key():
    leaf = Node("scan", {"path": "x"})
    n = Node("filter", {"predicate": "a > 1"}, leaf)
    n2 = n.substitute_parameters({"predicate": "a > 5"})
    assert n2.params["predicate"] == "a > 5"
    assert n2._name != n._name
    assert n.substitute_parameters({"unknown": 1}) is n
    # dependencies survive the rewrite
    assert [c.op for c in n2.dependencies] == ["scan"]


def test_reflected_xor():
    s = pes.from_pandas(pd.Series([True, False, True]))
    assert (True ^ s).compute().tolist() == [False, True, False]
    assert (False ^ s).compute().tolist() == [True, False, True]
