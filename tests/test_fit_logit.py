"""Distributed logistic-regression training (curation.fit_logit) —
differential vs an identical numpy batch-GD, plus separation sanity."""
import numpy as np
import pytest

from pandas_expr_spark.functions import curation


def _numpy_gd(X, y, lr, iters, l2=0.0):
    w = np.zeros(X.shape[1])
    b = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        err = p - y
        b -= lr * err.mean()
        w -= lr * ((X * err[:, None]).mean(axis=0) + l2 * w)
    return b, w


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.RandomState(7)
    n = 400
    X = rng.standard_normal((n, 3))
    logits = 1.5 * X[:, 0] - 2.0 * X[:, 1] + 0.3
    y = (1.0 / (1.0 + np.exp(-logits)) > rng.rand(n)).astype(float)
    rows = [(float(y[i]), float(X[i, 0]), float(X[i, 1]), float(X[i, 2]))
            for i in range(n)]
    sdf = spark.createDataFrame(
        rows, "label double, f1 double, f2 double, f3 double")
    return sdf, X, y


def test_fit_logit_matches_numpy(data):
    sdf, X, y = data
    w = curation.fit_logit(sdf, "label", ["f1", "f2", "f3"],
                           lr=0.5, iters=30)
    b_np, w_np = _numpy_gd(X, y, lr=0.5, iters=30)
    assert w["bias"] == pytest.approx(b_np, abs=1e-8)
    for i, c in enumerate(["f1", "f2", "f3"]):
        assert w[c] == pytest.approx(w_np[i], abs=1e-8), c
    # recovered signs match the generative model
    assert w["f1"] > 0.5 and w["f2"] < -0.5 and abs(w["f3"]) < 0.5


def test_logit_score_separates(data, spark):
    from pyspark.sql import functions as F
    sdf, _X, _y = data
    w = curation.fit_logit(sdf, "label", ["f1", "f2", "f3"],
                           lr=0.5, iters=60)
    scored = sdf.withColumn("p", curation.logit_score(w, ["f1", "f2", "f3"]))
    m = (scored.groupBy("label").agg(F.avg("p").alias("mp"))
         .orderBy("label").collect())
    assert m[1]["mp"] - m[0]["mp"] > 0.3  # positives score higher


def test_fit_logit_l2_shrinks(data):
    sdf, _X, _y = data
    w0 = curation.fit_logit(sdf, "label", ["f1", "f2"], lr=0.5, iters=30)
    w1 = curation.fit_logit(sdf, "label", ["f1", "f2"], lr=0.5, iters=30,
                            l2=1.0)
    assert abs(w1["f1"]) < abs(w0["f1"])
