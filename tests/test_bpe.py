"""Distributed BPE trainer — differential tests vs the canonical
single-machine algorithm (same tie-break), plus encode parity."""
from __future__ import annotations

import pandas as pd
import pytest

from pandas_expr_spark.functions import bpe


CORPUS = ["low lower lowest low low", "new newer newest new",
          "wide wider widest", "the the the low new",
          "lower lower newest", "a ab abc abcd a ab"]


def _word_freq(lines):
    wf = {}
    for line in lines:
        for w in line.lower().split():
            wf[w] = wf.get(w, 0) + 1
    return wf


def _encode_py(text, merges):
    out = []
    for w in text.lower().split():
        syms = list(w) + [bpe.END_OF_WORD]
        for a, b, *_ in merges:
            syms = bpe.merge_word_py(syms, a, b)
        out.extend(syms)
    return out


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(pd.DataFrame({"text": CORPUS}))


def test_learn_matches_reference(corpus_df):
    merges, words = bpe.learn_bpe(corpus_df, "text", n_merges=15)
    ref = bpe.learn_bpe_py(_word_freq(CORPUS), 15)
    assert merges == ref
    # final vocab symbols also match the reference fold
    got = {r["word"]: r["syms"] for r in words.collect()}
    for w in _word_freq(CORPUS):
        syms = list(w) + [bpe.END_OF_WORD]
        for a, b, _ in ref:
            syms = bpe.merge_word_py(syms, a, b)
        assert got[w] == syms


def test_learn_partition_invariant(corpus_df):
    m1, _ = bpe.learn_bpe(corpus_df, "text", n_merges=8)
    m2, _ = bpe.learn_bpe(corpus_df.repartition(13), "text", n_merges=8)
    assert m1 == m2


def test_min_pair_count_stops(spark):
    sdf = spark.createDataFrame(pd.DataFrame({"text": ["x y z"]}))
    merges, _ = bpe.learn_bpe(sdf, "text", n_merges=10, min_pair_count=2)
    assert merges == []  # every pair occurs once


def test_encode_matches_reference(corpus_df):
    merges, _ = bpe.learn_bpe(corpus_df, "text", n_merges=10)
    got = (bpe.encode_bpe(corpus_df, "text", merges)
           .select("text", "tokens").collect())
    for r in got:
        assert list(r["tokens"]) == _encode_py(r["text"], merges)


def test_apply_merges_expr_matches_python_fold(corpus_df):
    merges, _ = bpe.learn_bpe(corpus_df, "text", n_merges=6)
    wtab = bpe.with_symbols(bpe.word_histogram(corpus_df, "text"))
    applied = {r["word"]: r["syms"]
               for r in bpe.apply_merges_expr(
                   wtab, [(a, b) for a, b, _ in merges]).collect()}
    for w in _word_freq(CORPUS):
        syms = list(w) + [bpe.END_OF_WORD]
        for a, b, _ in merges:
            syms = bpe.merge_word_py(syms, a, b)
        assert applied[w] == syms


def test_merge_word_overlapping_runs():
    # left-to-right non-overlapping: aaaa + (a,a) -> aa aa
    assert bpe.merge_word_py(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert bpe.merge_word_py(list("aaa"), "a", "a") == ["aa", "a"]


def test_fold_handles_quotes_and_backslash(spark):
    # symbols containing SQL-sensitive characters survive the compiled fold
    sdf = spark.createDataFrame(
        pd.DataFrame({"text": ["d'o d'o d'o c\\c c\\c"]}))
    merges, _ = bpe.learn_bpe(sdf, "text", n_merges=4)
    ref = bpe.learn_bpe_py(_word_freq(["d'o d'o d'o c\\c c\\c"]), 4)
    assert merges == ref


def test_merges_to_df(spark, corpus_df):
    merges, _ = bpe.learn_bpe(corpus_df, "text", n_merges=5)
    tab = bpe.merges_to_df(spark, merges).collect()
    assert [(r["left"], r["right"], r["pair_count"]) for r in tab] == merges
    assert [r["rank"] for r in tab] == list(range(len(merges)))
    assert all(r["merged"] == r["left"] + r["right"] for r in tab)
