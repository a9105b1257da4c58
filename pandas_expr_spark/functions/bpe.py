"""Distributed byte-pair-encoding (BPE) tokenizer training.

Implements Sennrich et al. 2016 ("Neural Machine Translation of Rare
Words with Subword Units") on Spark:

1. ONE pass over the corpus builds the word-frequency histogram — after
   that, the 100 TB corpus is never touched again; every merge iteration
   operates on the vocabulary table (orders of magnitude smaller, still
   distributed).
2. Per merge iteration: adjacent symbol pairs are counted with an
   exploded equi-shuffle weighted by word frequency (map-side partial
   aggregation applies), the argmax pair is ONE collected row
   (deterministic tie-break: count desc, then pair lexicographic), and
   the merge is applied to every word's symbol array by a single JVM
   ``aggregate`` fold compiled as ONE SQL string (no py4j literal
   chatter, no Python in the loop).
3. The symbol table is ``localCheckpoint``-ed each iteration to cut the
   growing lineage — the same pattern as the k-means/connected-components
   iterators (``clustering.py`` / ``components.py``).

Scale: n_merges shuffles over the vocab table is the inherent cost of
BPE (merges are sequential by definition); corpus-sized data moves once.

Encoding applies learned merges either as the same JVM fold (small merge
lists) or as an Arrow-batched pandas UDF with a rank-priority dict (the
practical path for 32k+ vocabularies).

Reference parity model: pandas-expr has no tokenizer ops (this extends
the LLM-curation battery); semantics match the canonical learn_bpe
reference implementation, differential-tested in tests/test_bpe.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame as SparkDF, functions as F
from pyspark.sql import types as T

__all__ = ["word_histogram", "with_symbols", "pair_counts", "learn_bpe",
           "merges_to_df", "apply_merges_expr", "encode_bpe",
           "merge_word_py", "learn_bpe_py"]

END_OF_WORD = "</w>"


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def word_histogram(sdf: SparkDF, text_col: str = "text",
                   lowercase: bool = True) -> SparkDF:
    """Corpus → (word, freq).  The only corpus-sized job in BPE training."""
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    w = F.explode(F.split(txt, r"\s+")).alias("word")
    return (sdf.select(w).filter(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def with_symbols(words: SparkDF, end_of_word: str = END_OF_WORD) -> SparkDF:
    """word → initial symbol array: characters + end-of-word marker."""
    syms = F.concat(F.split(F.col("word"), ""),
                    F.array(F.lit(end_of_word)))
    return words.withColumn("syms", syms)


def pair_counts(words: SparkDF) -> SparkDF:
    """Adjacent-symbol pair counts weighted by word frequency.
    slice+arrays_zip avoids posexplode-adjacent re-evaluation."""
    n = F.size("syms")
    zipped = F.expr("arrays_zip(slice(syms, 1, size(syms) - 1), "
                    "slice(syms, 2, size(syms) - 1))")
    pair = F.explode(zipped).alias("p")
    return (words.filter(n >= 2)
            .select(F.col("freq"), pair)
            .select("freq", F.col("p.`0`").alias("left"),
                    F.col("p.`1`").alias("right"))
            .groupBy("left", "right")
            .agg(F.sum("freq").alias("pair_count")))


def _merge_fold_sql(left: str, right: str, merged: str,
                    col: str = "syms") -> str:
    """ONE-string SQL fold applying a single merge left-to-right,
    non-overlapping — exactly the canonical merge loop (greedy scan;
    a just-merged token can never re-match as ``left`` because merged
    strings are strictly longer than their parts)."""
    a, b, ab = _sql_quote(left), _sql_quote(right), _sql_quote(merged)
    return (
        f"aggregate({col}, CAST(array() AS array<string>), (acc, x) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = {a} "
        f"AND x = {b} "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array({ab})) "
        f"ELSE concat(acc, array(x)) END)"
    )


def apply_merges_expr(sdf: SparkDF, merges: list[tuple[str, str]],
                      col: str = "syms") -> SparkDF:
    """Apply a (small) ordered merge list as chained JVM folds — the
    zero-Python path.  For 32k-scale merge lists use ``encode_bpe``."""
    out = sdf
    for a, b in merges:
        out = out.withColumn(col, F.expr(_merge_fold_sql(a, b, a + b, col)))
    return out


def learn_bpe(sdf: SparkDF, text_col: str = "text", n_merges: int = 10,
              min_pair_count: int = 2, lowercase: bool = True,
              end_of_word: str = END_OF_WORD,
              checkpoint_every: int = 8,
              batch_k: int = 8,
              ) -> tuple[list[tuple[str, str, int]], SparkDF]:
    """Learn ``n_merges`` BPE merges over a corpus.

    Returns ``(merges, words)`` where ``merges`` is an ordered list of
    ``(left, right, pair_count)`` and ``words`` the final (word, freq,
    syms) vocabulary table.  Deterministic: ties broken by
    (count desc, left asc, right asc), independent of partitioning.

    Cost shape (optimization r8 + r9): the word histogram is checkpointed
    LAZILY (the first iteration's TakeOrdered materializes it); merge
    folds chain LAZILY into the next iteration's plan; every
    ``checkpoint_every`` merges the symbol table is checkpointed (lazily,
    at the top of the loop) to bound lineage depth.

    **Batched argmax (r9, ``batch_k``):** each pair-count shuffle
    collects the top ``batch_k`` pairs instead of 1 and greedily accepts
    a PREFIX of them whose sequence provably equals the one-merge-at-a-
    time sequence — measured 24 merges in 17 shuffles on the bench
    corpus, byte-identical to the reference.  Soundness of accepting a
    stale candidate ``(c, d)`` with stale count ``n`` after earlier
    in-batch merges with blocked symbols ``S`` (each merge ``(a, b)``
    contributes ``{a, b, a+b}``):

    * existing pair counts only DECREASE under a merge, and only pairs
      overlapping ``S`` change at all — so any listed pair overlapping
      ``S`` with stale count ≥ n, or an unlisted one (≤ the K-th listed
      count, the ``floor``), could still tie/beat ``(c, d)``: reject
      unless n is strictly above both;
    * merging ``(a, b)`` creates NEW pairs only of the forms
      ``(x, a+b)`` / ``(a+b, y)`` / ``(a+b, a+b)``, each occurrence
      consuming a stale ``(x, a)`` / ``(b, y)`` / ``(b, a)`` adjacency —
      so every new pair's count is bounded by a stale OVERLAPPING pair's
      count, which the two checks above already dominate — UNLESS
      ``a+b`` collided with an already-existing symbol (then a
      pre-existing pair's count and a new pair's gain could ADD).
      Merged symbols are ≥2 chars, initial symbols are single chars plus
      ``end_of_word``, so collisions only arise from earlier merges (or
      the marker) — tracked in ``created``; a collision simply ends the
      batch (the next recount is exact).

    Ties among unchanged pairs keep the stale list's (count desc, left,
    right) order, which IS the true tie-break, so the accepted prefix
    equals the sequential argmax sequence exactly.  ``batch_k=1``
    reproduces the pre-r9 loop verbatim.
    """
    spark = sdf.sparkSession
    words = with_symbols(
        word_histogram(sdf, text_col, lowercase=lowercase), end_of_word)
    # LAZY checkpoint (optimization r8): the first iteration's TakeOrdered
    # pair-count collect computes every partition, so it materializes the
    # histogram cache exactly once — no dedicated up-front job (same
    # pattern as kmeans_assign / fit_logit).
    words = words.repartition(
        spark.sparkContext.defaultParallelism).localCheckpoint(eager=False)

    merges: list[tuple[str, str, int]] = []
    created = {end_of_word}
    pending = 0
    while len(merges) < n_merges:
        if pending >= checkpoint_every:
            # lazy: this iteration's TakeOrdered pair-count collect is the
            # materializing action — the lineage cut lands without a
            # dedicated job (same pattern as the up-front checkpoint)
            words = words.localCheckpoint(eager=False)
            pending = 0
        top = (pair_counts(words)
               .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
               .limit(batch_k).collect())
        if not top or top[0]["pair_count"] < min_pair_count:
            break
        floor = top[-1]["pair_count"] if len(top) == batch_k else 0
        blocked: set[str] = set()
        collided = False
        for i, row in enumerate(top):
            if len(merges) >= n_merges:
                break
            a, b = row["left"], row["right"]
            cnt = int(row["pair_count"])
            if cnt < min_pair_count:
                break
            if i > 0:
                if collided or ({a, b} & blocked) or cnt <= floor:
                    break
                if any(int(t["pair_count"]) >= cnt
                       and ({t["left"], t["right"]} & blocked)
                       for t in top[i + 1:]):
                    break
            merges.append((a, b, cnt))
            words = words.withColumn(
                "syms", F.expr(_merge_fold_sql(a, b, a + b)))
            pending += 1
            blocked |= {a, b, a + b}
            if (a + b) in created:
                collided = True
            created.add(a + b)
    return merges, words


def merges_to_df(spark, merges: list[tuple[str, str, int]]) -> SparkDF:
    """Merge list → (rank, left, right, merged, pair_count) DataFrame."""
    schema = T.StructType([
        T.StructField("rank", T.LongType()),
        T.StructField("left", T.StringType()),
        T.StructField("right", T.StringType()),
        T.StructField("merged", T.StringType()),
        T.StructField("pair_count", T.LongType()),
    ])
    rows = [(i, a, b, a + b, c) for i, (a, b, c) in enumerate(merges)]
    return spark.createDataFrame(rows, schema)


def encode_bpe(sdf: SparkDF, text_col: str,
               merges: list[tuple[str, str]] | list[tuple[str, str, int]],
               lowercase: bool = True,
               end_of_word: str = END_OF_WORD,
               out_col: str = "tokens") -> SparkDF:
    """Tokenize text with a learned merge list — Arrow-batched pandas UDF
    applying merges in rank order per word (the practical path for large
    merge tables; per-word memo dict keeps repeated words cheap)."""
    from pyspark.sql.functions import pandas_udf

    ranked = [(m[0], m[1]) for m in merges]

    @pandas_udf(T.ArrayType(T.StringType()))
    def _enc(s: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                syms = list(w) + [end_of_word]
                for a, b in ranked:
                    syms = merge_word_py(syms, a, b)
                memo[w] = got = syms
            return got

        def enc(text: str) -> list[str]:
            if text is None:
                return None
            t = text.lower() if lowercase else text
            out: list[str] = []
            for w in t.split():
                out.extend(enc_word(w))
            return out

        return s.map(enc)

    return sdf.withColumn(out_col, _enc(F.col(text_col)))


# ---------------------------------------------------------------------------
# Canonical single-machine reference (for differential tests and the
# encode UDF) — the classic learn_bpe algorithm, same tie-break.
# ---------------------------------------------------------------------------
def merge_word_py(syms: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def learn_bpe_py(word_freq: dict[str, int], n_merges: int,
                 min_pair_count: int = 2,
                 end_of_word: str = END_OF_WORD
                 ) -> list[tuple[str, str, int]]:
    vocab = {tuple(list(w) + [end_of_word]): f for w, f in word_freq.items()}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (a, b), cnt = min(counts.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < min_pair_count:
            break
        merges.append((a, b, cnt))
        vocab = {tuple(merge_word_py(list(s), a, b)): f
                 for s, f in vocab.items()}
    return merges
