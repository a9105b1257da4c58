"""Round-8 ADVICE/verdict regression pins.

1. (verdict #1) unnamed-Series ``value_counts()`` must not leak the
   internal ``__v__`` placeholder as the result index name — pandas
   reports ``None`` (and ``reset_index`` then names the column "index").
2. (advice medium) multi-file parquet label maps must survive
   URI-encoding-hostile paths (space / UTF-8 / '+' / literal '%20' in
   basenames) — exact pandas label parity, or clean renumber degrade,
   never null labels or an ANSI map-key crash.
3. (advice low) ``assign_nearest``'s Arrow path (k >= 64) must tolerate
   null and ragged vectors like the JVM path, and must REPLACE an
   existing ``out`` column instead of appending a duplicate field.
4. (advice low) ``_PUBLIC_TWIN`` is a bounded LRU, not an unbounded
   id-keyed leak.
"""
import os

import numpy as np
import pandas as pd
import pytest

import pandas_expr_spark as pes
from pandas_expr_spark import from_pandas, read_parquet


# ---------------------------------------------------------------- names
def test_unnamed_value_counts_index_name_is_none():
    s = pd.Series(["x", "x", None, "y"])
    got = from_pandas(s).value_counts().compute()
    exp = s.value_counts()
    assert got.index.name is None
    assert got.name == exp.name == "count"
    assert got.sort_index().to_dict() == exp.sort_index().to_dict()


def test_unnamed_value_counts_reset_index_column():
    s = pd.Series(["x", "x", "y"])
    got = from_pandas(s).value_counts().reset_index().compute()
    exp = s.value_counts().reset_index()
    assert list(got.columns) == list(exp.columns) == ["index", "count"]


def test_named_value_counts_keeps_name():
    s = pd.Series(["a", "b", "a"], name="z")
    got = from_pandas(s).value_counts().compute()
    assert got.index.name == "z"


def test_user_series_literally_named_placeholder():
    # a user series named "__v__" is an accepted edge: the boundary scrub
    # reports None (the placeholder is reserved, documented behavior)
    s = pd.Series([1, 2], name="__v__")
    got = from_pandas(s).compute()
    assert got.name is None


# ------------------------------------------------------- label-map paths
@pytest.mark.parametrize("names", [
    ("part-000.parquet", "part-001.parquet"),
    ("aa part é.parquet", "bb part+plus.parquet"),
    ("a%20b.parquet", "c d.parquet"),
])
def test_multifile_label_parity_hostile_basenames(tmp_path, names):
    d = tmp_path / "lbl test é"
    d.mkdir()
    pdf = pd.DataFrame({"a": range(60), "b": np.arange(60) % 5})
    pdf.iloc[:30].to_parquet(str(d / names[0]))
    pdf.iloc[30:].to_parquet(str(d / names[1]))
    e = read_parquet(str(d))
    got = e[e["b"] == 2].compute().sort_index()
    ref = pd.read_parquet(str(d))
    exp = ref[ref["b"] == 2]
    assert list(got.index) == list(exp.index)
    assert (got["a"].values == exp["a"].values).all()


def test_multifile_label_no_nulls_ever(tmp_path):
    # whatever the path encoding, a user-visible index must never be null
    d = tmp_path / "odd % dir"
    d.mkdir()
    pdf = pd.DataFrame({"a": range(40)})
    pdf.iloc[:20].to_parquet(str(d / "x 1.parquet"))
    pdf.iloc[20:].to_parquet(str(d / "x%201.parquet"))
    e = read_parquet(str(d))
    got = e[e["a"] >= 10].compute()
    assert got.index.notna().all()


# --------------------------------------------------------- assign_nearest
def test_assign_nearest_arrow_nulls_ragged_and_replace():
    from pyspark.sql import functions as F
    from pandas_expr_spark.functions.clustering import (
        assign_nearest, nearest_centroid)
    spark = from_pandas(pd.DataFrame({"x": [1]}))._sdf.sparkSession
    rng = np.random.default_rng(0)
    k, dim, n = 80, 6, 200
    C = rng.normal(size=(k, dim))
    rows = [(i, rng.normal(size=dim).tolist()) for i in range(n)]
    rows += [(n, None), (n + 1, [1.0, 2.0])]
    sdf = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "v"]))
    arrow = assign_nearest(sdf, "v", C).toPandas().set_index("id")
    jvm = (sdf.withColumn("cluster", nearest_centroid("v", C))
           .toPandas().set_index("id"))
    valid = list(range(n))
    assert (arrow.loc[valid, "cluster"].astype(int).values
            == jvm.loc[valid, "cluster"].astype(int).values).all()
    assert pd.isna(arrow.loc[n, "cluster"])
    assert pd.isna(arrow.loc[n + 1, "cluster"])
    # replace-not-append on a pre-existing out column
    pre = sdf.withColumn("cluster", F.lit(99))
    out2 = assign_nearest(pre, "v", C)
    assert [f.name for f in out2.schema.fields].count("cluster") == 1
    assert int(out2.filter("id = 0").toPandas()["cluster"][0]) \
        == int(jvm.loc[0, "cluster"])


# ------------------------------------------------------------- twin LRU
def test_public_twin_bounded():
    from pandas_expr_spark import _collection as C
    before = len(C._PUBLIC_TWIN)
    f = from_pandas(pd.DataFrame({"a": [1, 2, 3]}))
    for i in range(C._PUBLIC_TWIN_CAP + 40):
        f.assign(b=f["a"] + i).to_spark()
    assert len(C._PUBLIC_TWIN) <= C._PUBLIC_TWIN_CAP
    # identity still stable for a live plan (scan-sharing CSE contract)
    g = f.assign(b=f["a"] * 2)
    assert g.to_spark() is g.to_spark()
    assert before <= C._PUBLIC_TWIN_CAP


# ------------------------------------------------------ explode object dtype
def test_explode_object_dtype_parity():
    # pandas explode ALWAYS yields object dtype, with int objects (not
    # floats) even when empty lists inject NaN — boundary-only metadata,
    # the Spark column stays typed (r8 dtype hunt)
    pdf = pd.DataFrame({"v": [3.0, 1.0, 2.0],
                        "L": [[1, 2], [], [3]],
                        "S": [["a"], ["b", "c"], []]})
    e = from_pandas(pdf)
    g = e.explode("L").compute()
    x = pdf.explode("L")
    assert g["L"].dtype == object
    assert [str(a) for a in g["L"].tolist()] == [str(a) for a in x["L"].tolist()]
    assert e.explode("S").compute()["S"].dtype == object
    assert e["L"].explode().compute().dtype == object
    pdf2 = pd.DataFrame({"A": [[1, 2], [3]], "B": [[4, 5], [6]]})
    gm = from_pandas(pdf2).explode(["A", "B"]).compute()
    assert list(map(str, gm.dtypes)) == ["object", "object"]
