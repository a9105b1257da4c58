"""Batch kNN join (similarity.knn_join) — exact path vs numpy, IVF
recall, and the pair-count guard."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from pandas_expr_spark.functions import similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double")))


def _numpy_knn(emb_pdf, qids, k):
    ids = list(emb_pdf["vec_id"])
    M = np.array([np.array(v) for v in emb_pdf["embedding"]])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    out = {}
    for qi in qids:
        sims = Mn @ Mn[ids.index(qi)]
        order = sorted(range(len(ids)), key=lambda j: (-sims[j], ids[j]))[:k]
        out[qi] = [ids[j] for j in order]
    return out


def test_exact_matches_numpy(emb):
    q = emb.filter(F.col("vec_id") < 10)
    got = similarity.knn_join(q, emb, k=4).toPandas()
    ref = _numpy_knn(emb.toPandas(), range(10), 4)
    for qi in range(10):
        g = got[got.vec_id == qi].sort_values("cosine", ascending=False)
        assert list(g["neighbor_id"]) == ref[qi], qi
    # self is always the nearest neighbor at cosine 1
    tops = got.sort_values("cosine", ascending=False).groupby("vec_id").head(1)
    assert (tops["vec_id"] == tops["neighbor_id"]).all()


def test_ivf_recall_and_fallback(emb):
    q = emb.filter(F.col("vec_id") < 10)
    exact = similarity.knn_join(q, emb, k=4).toPandas()
    ivf = similarity.knn_join(q, emb, k=4, method="ivf", n_cells=4,
                              nprobe=4, sample_frac=1.0).toPandas()
    # probing ALL cells makes IVF exhaustive -> recall 1.0
    for qi in range(10):
        e = set(exact[exact.vec_id == qi]["neighbor_id"])
        i = set(ivf[ivf.vec_id == qi]["neighbor_id"])
        assert e == i, qi
    # tiny corpus (< n_cells after sampling) falls back to exact
    few = emb.limit(3)
    fb = similarity.knn_join(q, few, k=2, method="ivf", n_cells=64)
    assert fb.count() == 20


def test_exact_guard(emb):
    q = emb.filter(F.col("vec_id") < 10)
    with pytest.raises(ValueError, match="guard"):
        similarity.knn_join(q, emb, k=4, max_pairs=10)
