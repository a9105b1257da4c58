"""Deterministic dataset splitting & sampling for training-data pipelines.

The reference (phofl/pandas-expr) has only seeded random ``Sample``
(``_expr.py:1055-1070``) — per-partition RNG state, unstable under
repartitioning.  At 100 TB the production technique is HASH-based
assignment: a row's split is a pure function of its key, so the split is

* reproducible across runs, engines and cluster sizes,
* stable under re-partitioning / incremental re-processing (a re-ingested
  document lands in the same split), and
* leakage-free for near-duplicate handling (same key → same side).

Everything here is a pure JVM-side projection (md5 → first 8 hex chars →
int) — no shuffle, no RNG, no UDF; md5 is bit-identical across engines,
which also makes every op exactly oracle-checkable in DuckDB.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame as SparkDF, functions as F

__all__ = ["hash_bucket", "hash_split", "hash_sample",
           "stratified_downsample"]

# 8 hex chars = 32 bits — plenty of resolution for per-mille fractions
_BUCKETS = 1_000_000


def hash_bucket(key: Column | str, salt: str = "") -> Column:
    """Uniform bucket in [0, 1e6) from md5 of the key (+ optional salt —
    change the salt to draw an independent split)."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(c.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % _BUCKETS


def hash_split(sdf: SparkDF, key: str,
               fractions: Mapping[str, float] | None = None,
               salt: str = "", out_col: str = "split") -> SparkDF:
    """Assign each row a named split (train/val/test by default) by hashed
    key.  Fractions must sum to ≤ 1; remainder falls into the LAST split."""
    fractions = dict(fractions or {"train": 0.8, "val": 0.1, "test": 0.1})
    if sum(fractions.values()) > 1.0 + 1e-9:
        raise ValueError("split fractions sum to > 1")
    b = hash_bucket(key, salt)
    expr = None
    hi = 0
    names = list(fractions)
    for name in names[:-1]:
        hi += int(fractions[name] * _BUCKETS)
        cond = b < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return sdf.withColumn(out_col, expr)


def hash_sample(sdf: SparkDF, key: str, fraction: float,
                salt: str = "") -> SparkDF:
    """Deterministic ~``fraction`` sample: keep rows whose hash bucket falls
    below the threshold.  Unlike ``df.sample`` this is stable across runs
    and partitionings, and two samples with the same salt NEST (a 1%
    sample is a subset of a 10% sample) — the property you want for
    progressively-larger training subsets."""
    return sdf.filter(hash_bucket(key, salt) < int(fraction * _BUCKETS))


def stratified_downsample(sdf: SparkDF, strata: Sequence[str] | str,
                          key: str, n_per_stratum: int) -> SparkDF:
    """Balance a skewed corpus: keep at most ``n_per_stratum`` rows per
    stratum (e.g. per language / per source), chosen by hash order of the
    key — deterministic, engine-portable.  The standard class-rebalancing
    step before training-data mixing.

    Delegates to ``urls.cap_per_group`` (md5-PREFIX-bucket two-phase
    histogram) so a mega-stratum never sorts in a single task: whole
    hash buckets are kept via a broadcast semi join and only the one
    boundary bucket per stratum gets an exact window — result-identical
    to the plain per-stratum ``row_number`` over (md5(key), key)."""
    from .urls import cap_per_group
    strata = [strata] if isinstance(strata, str) else list(strata)
    return cap_per_group(sdf, n_per_stratum, strata, key)
