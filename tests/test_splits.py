"""Tests for deterministic hash-based splitting/sampling
(``functions/splits.py``) — the training-pipeline alternative to the
reference's RNG ``Sample`` (``_expr.py:1055-1070``)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    from pandas_expr_spark.sources.tables import load_table
    return load_table(spark, SF_DIR, "documents").cache()


def test_hash_split_partition_of_rows(docs):
    from pandas_expr_spark.functions import splits
    s = splits.hash_split(docs, "doc_id")
    total = docs.count()
    by = dict(s.groupBy("split").count().collect())
    assert sum(by.values()) == total                      # partition
    assert set(by) <= {"train", "val", "test"}
    assert by["train"] > by.get("val", 0)                 # roughly 80/10/10


def test_hash_split_deterministic_and_stable_under_repartition(docs):
    from pandas_expr_spark.functions import splits
    a = set(r.doc_id for r in splits.hash_split(docs, "doc_id")
            .filter(F.col("split") == "val").select("doc_id").collect())
    b = set(r.doc_id for r in splits.hash_split(docs.repartition(17), "doc_id")
            .filter(F.col("split") == "val").select("doc_id").collect())
    assert a == b  # assignment is a pure function of the key


def test_hash_split_salt_gives_independent_split(docs):
    from pandas_expr_spark.functions import splits
    a = set(r.doc_id for r in splits.hash_split(docs, "doc_id")
            .filter(F.col("split") == "val").select("doc_id").collect())
    c = set(r.doc_id for r in splits.hash_split(docs, "doc_id", salt="v2")
            .filter(F.col("split") == "val").select("doc_id").collect())
    assert a != c


def test_hash_sample_nests(docs):
    from pandas_expr_spark.functions import splits
    small = set(r.doc_id for r in
                splits.hash_sample(docs, "doc_id", 0.05).select("doc_id").collect())
    big = set(r.doc_id for r in
              splits.hash_sample(docs, "doc_id", 0.3).select("doc_id").collect())
    assert small <= big            # progressive subsets nest
    assert 0 < len(small) < len(big) < docs.count()


def test_hash_split_fraction_validation(docs):
    from pandas_expr_spark.functions import splits
    with pytest.raises(ValueError):
        splits.hash_split(docs, "doc_id", {"a": 0.9, "b": 0.3})


def test_stratified_downsample_cap_and_determinism(docs):
    from pandas_expr_spark.functions import splits
    out = splits.stratified_downsample(docs, "lang", "doc_id", 10)
    counts = dict(out.groupBy("lang").count().collect())
    orig = dict(docs.groupBy("lang").count().collect())
    for lang, n in counts.items():
        assert n == min(10, orig[lang])
    # deterministic choice: same ids both runs
    ids1 = sorted(r.doc_id for r in out.select("doc_id").collect())
    ids2 = sorted(r.doc_id for r in
                  splits.stratified_downsample(docs.repartition(13), "lang",
                                               "doc_id", 10)
                  .select("doc_id").collect())
    assert ids1 == ids2


def test_hash_split_plan_is_projection_only(docs):
    # scale regression: split assignment must not introduce a shuffle
    from pandas_expr_spark.functions import splits
    plan = splits.hash_split(docs, "doc_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_documents_invariants(spark):
    """Concat-and-chop packing: offsets are consistent with token counts,
    and every document's position is a pure function of (bucket, doc_id
    order) — stable under repartitioning."""
    from pandas_expr_spark.functions import packing
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = packing.pack_documents(docs, budget=256, n_buckets=4).toPandas()
    assert len(out) == docs.count()
    for (_b), grp in out.groupby("bucket"):
        grp = grp.sort_values("doc_id").reset_index(drop=True)
        prev = 0
        for _, r in grp.iterrows():
            assert r["bin_id"] == prev // 256
            assert r["offset"] == prev % 256
            prev += r["n_tokens"]
    # repartition stability
    out2 = packing.pack_documents(docs.repartition(13), budget=256,
                                  n_buckets=4).toPandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert (a[["bucket", "bin_id", "offset"]].values
            == b[["bucket", "bin_id", "offset"]].values).all()


def test_pack_documents_rejects_bad_budget(spark):
    from pandas_expr_spark.functions import packing
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with pytest.raises(ValueError, match="budget"):
        packing.pack_documents(docs, budget=0)
