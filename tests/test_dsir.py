"""DSIR importance resampling (curation.dsir_*) — differential tests vs a
pure-Python reimplementation of the same hashed-ngram / LLR / Gumbel math."""
import hashlib
import math

import pandas as pd
import pytest

import pandas_expr_spark as pes
from pandas_expr_spark.functions import curation

BUCKETS = 64


def _bkt(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % BUCKETS


def _feats(text: str, bigrams: bool = True) -> dict:
    toks = text.strip().split() if text.strip() else [""]
    grams = list(toks)
    if bigrams:
        grams += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    out = {}
    for g in grams:
        b = _bkt(g)
        out[b] = out.get(b, 0) + 1
    return out


def _py_dsir(raw_texts, tgt_texts, smoothing=1.0, bigrams=True):
    q, p = {}, {}
    per_doc = []
    for t in raw_texts:
        f = _feats(t, bigrams)
        per_doc.append(f)
        for b, c in f.items():
            q[b] = q.get(b, 0) + c
    for t in tgt_texts:
        for b, c in _feats(t, bigrams).items():
            p[b] = p.get(b, 0) + c
    qn, pn = sum(q.values()), sum(p.values())
    qd, pd_ = qn + smoothing * BUCKETS, pn + smoothing * BUCKETS
    weights = []
    for f in per_doc:
        w = sum(c * (math.log((p.get(b, 0) + smoothing) / pd_)
                     - math.log((q.get(b, 0) + smoothing) / qd))
                for b, c in f.items())
        weights.append(w)
    return weights


RAW = ["the cat sat on the mat", "quantum flux capacitor energy",
       "the dog ran in the park", "stochastic gradient descent converges",
       "a cat and a dog play", "eigenvalues of the hessian matrix",
       "", "the the the the the"]
TGT = ["the cat chased the dog", "a dog and a cat in the park",
       "the mat was sat on"]


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(
        [(i, t) for i, t in enumerate(RAW)], "doc_id long, text string")
    tgt = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TGT)], "doc_id long, text string")
    return raw, tgt


def test_dsir_logweights_match_python(frames):
    raw, tgt = frames
    got = (curation.dsir_logweights(raw, tgt, buckets=BUCKETS)
           .toPandas().set_index("doc_id")["logweight"].sort_index())
    exp = _py_dsir(RAW, TGT)
    for i, e in enumerate(exp):
        assert got[i] == pytest.approx(e, rel=1e-12), f"doc {i}"


def test_dsir_unigrams_only(frames):
    raw, tgt = frames
    got = (curation.dsir_logweights(raw, tgt, buckets=BUCKETS,
                                    bigrams=False)
           .toPandas().set_index("doc_id")["logweight"].sort_index())
    exp = _py_dsir(RAW, TGT, bigrams=False)
    for i, e in enumerate(exp):
        assert got[i] == pytest.approx(e, rel=1e-12)


def test_dsir_select_topk_targetlike(frames):
    raw, tgt = frames
    out = curation.dsir_select(raw, tgt, k=3, buckets=BUCKETS).toPandas()
    assert len(out) == 3
    assert set(out.columns) == {"doc_id", "text", "logweight"}
    # target-like docs (cat/dog/the) must outrank the jargon docs
    exp = _py_dsir(RAW, TGT)
    want = sorted(range(len(RAW)), key=lambda i: (-exp[i], i))[:3]
    assert sorted(out["doc_id"]) == sorted(want)


def test_dsir_select_gumbel_deterministic(frames):
    raw, tgt = frames
    a = curation.dsir_select(raw, tgt, k=4, buckets=BUCKETS,
                             seed=7).toPandas()
    b = curation.dsir_select(raw, tgt, k=4, buckets=BUCKETS,
                             seed=7).toPandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    c = curation.dsir_select(raw.repartition(5), tgt, k=4, buckets=BUCKETS,
                             seed=7).toPandas()
    assert sorted(a["doc_id"]) == sorted(c["doc_id"])
    # replicate the Gumbel key in python
    exp = _py_dsir(RAW, TGT)
    keys = []
    for i, w in enumerate(exp):
        h = hashlib.md5(f"{i}|dsir7".encode()).hexdigest()
        u = (int(h[:8], 16) + 0.5) / float(1 << 32)
        keys.append(w + (-math.log(-math.log(u))))
    want = sorted(range(len(RAW)), key=lambda i: (-keys[i], i))[:4]
    assert sorted(a["doc_id"]) == sorted(want)


def test_dsir_target_filter_one_pass_equals_two_pass(frames, spark):
    from pyspark.sql import functions as F
    raw, _tgt = frames
    # target = docs containing "the" — subset of raw
    pred = F.col("text").contains("the")
    two = (curation.dsir_logweights(raw, raw.filter(pred), buckets=BUCKETS)
           .toPandas().set_index("doc_id")["logweight"].sort_index())
    one = (curation.dsir_logweights(raw, None, buckets=BUCKETS,
                                    target_filter=pred)
           .toPandas().set_index("doc_id")["logweight"].sort_index())
    assert list(one.index) == list(two.index)
    for a, b in zip(one, two):
        assert a == pytest.approx(b, rel=1e-12)
