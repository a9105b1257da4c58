"""Time-series smoothing: exponentially weighted means at scale.

pandas ``ewm`` is inherently sequential (each output depends on every prior
row), which Spark's window functions cannot express without numeric overflow
(the ``pow(1-a, -rownum)`` rescaling trick leaves IEEE range after a few
hundred rows).  Two scale-aware implementations:

* **Grouped** (``groupby(k).ewm(alpha).mean()``): groups must fit one
  executor task *anyway* for any partitioned window, so Arrow-batched
  ``applyInPandas`` running pandas' exact ``ewm`` per group is both honest
  and as scalable as the window family — one shuffle on the keys.

* **Global** (one huge ordered series): a distributed **segment scan**.
  With ``d = 1 - alpha`` and ``adjust=True`` semantics,

      num_i = sum_{j<=i} d^(i-j) x_j      y_i = num_i / den_i
      den_i = sum_{j<=i} d^(i-j)

  both satisfy the linear recurrence ``s_i = x_i + d * s_{i-1}``.  We
  range-partition by the ordering key (partitions are then globally ordered
  and ``spark_partition_id`` is monotone), run the recurrence *locally* per
  partition from a zero carry, reduce each partition to a 1-row summary
  ``(last_num, last_den, d^n_rows)``, fold the tiny summary table into
  exclusive prefix carries (single small task — thousands of rows at 100 TB,
  never the data itself), broadcast-join the carries back, and patch:

      num_i = local_num_i + carry_num * d^(local_pos_i + 1)

  ``d^(pos+1)`` underflows to 0 deep inside a partition — mathematically
  negligible exactly when it happens.  Total cost: one range shuffle + one
  tiny reduction, independent of series length per executor.

The reference has no time-series ops at all (SURVEY §2.7: no rolling /
expanding / ewm); this is part of the Spark-native superset.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["ewm_mean_global", "ewm_mean_global_multi", "ewm_mean_grouped",
           "period_start_col", "period_to_timestamp_col"]


def ewm_mean_grouped(sdf: SparkDF, by: list[str], col: str, order_by: list[str],
                     alpha: float, name: str = "ewm",
                     adjust: bool = True) -> SparkDF:
    """Exact pandas ``ewm(alpha).mean()`` per group via ``applyInPandas``.

    One shuffle on the group keys; each group is computed by pandas itself
    (identical semantics, Arrow transfer).  Same memory contract as any
    partitioned window: a group must fit an executor task.
    """
    fields = list(sdf.schema.fields) + [T.StructField(name, T.DoubleType())]
    schema = T.StructType(fields)

    def _one_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_by, kind="mergesort")
        pdf[name] = pdf[col].ewm(alpha=alpha, adjust=adjust).mean()
        return pdf

    return sdf.groupBy(*by).applyInPandas(_one_group, schema)


def ewm_mean_global(sdf: SparkDF, col: str, order_by: str, alpha: float,
                    name: str = "ewm", num_partitions: int | None = None,
                    adjust: bool = True) -> SparkDF:
    """Distributed segment-scan EWM over one globally ordered series.
    ``order_by`` must be unique (it defines the order).

    Three stages, none of which materializes the series on fewer executors
    than the input occupies:

    1. ``repartitionByRange(order_by)`` + local sort → globally ordered
       partitions; local recurrence per partition via ``mapInPandas``
       (state carried across Arrow batches inside one partition).
    2. 1-row-per-partition summary → exclusive prefix carries, folded in a
       single tiny task (the only sequential step, O(#partitions)).
    3. Broadcast-join carries back; patch local values with the decayed
       carry.

    ``adjust=False`` (pandas' recursive form) dispatches to the affine
    segment scan (`_ewm_noadjust_multi`): pandas resets the old weight to
    1 after every observation, so the state is not linear in (num, den),
    but each row's value IS affine in the partition's first blended
    observation — see that function's docstring.
    Nulls follow pandas ``ignore_na=False``: weights keep decaying, no
    new observation is added, and the prior mean carries through.
    """
    if not adjust:
        staged = sdf.withColumn(name, F.col(col).cast("double"))
        return _ewm_noadjust_multi(staged, [name], order_by, alpha,
                                   num_partitions)
    d = 1.0 - alpha
    n_parts = num_partitions or sdf.sparkSession.sparkContext.defaultParallelism
    part = (sdf.repartitionByRange(n_parts, F.col(order_by))
            .sortWithinPartitions(order_by)
            .withColumn("__pid", F.spark_partition_id()))

    fields = list(part.schema.fields) + [
        T.StructField("__num", T.DoubleType()),
        T.StructField("__den", T.DoubleType()),
        T.StructField("__pos", T.LongType()),
    ]
    local_schema = T.StructType(fields)

    def _local_scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # mapInPandas sees ONE partition as a stream of Arrow batches:
        # carry the recurrence state across batches.
        num = 0.0
        den = 0.0
        pos = -1
        for pdf in batches:
            x = pdf[col].to_numpy(dtype="float64")
            nums = [0.0] * len(x)
            dens = [0.0] * len(x)
            positions = [0] * len(x)
            for i, xi in enumerate(x):
                pos += 1
                if xi == xi:          # non-NaN observation
                    num = xi + d * num
                    den = 1.0 + d * den
                else:                 # pandas ignore_na=False: weights
                    num = d * num     # keep decaying, no new observation;
                    den = d * den     # num/den carries the prior mean
                nums[i] = num
                dens[i] = den
                positions[i] = pos
            pdf = pdf.copy()
            pdf["__num"] = nums
            pdf["__den"] = dens
            pdf["__pos"] = positions
            yield pdf

    # read twice (summary + final join): persist so the scan runs once
    local = part.mapInPandas(_local_scan, local_schema).persist()

    # one row per partition: final state + total decay d^n
    summary = (local.groupBy("__pid")
               .agg(F.max_by("__num", "__pos").alias("last_num"),
                    F.max_by("__den", "__pos").alias("last_den"),
                    F.pow(F.lit(d), F.count(F.lit(1))).alias("decay")))

    carry_schema = T.StructType([
        T.StructField("__pid", T.IntegerType()),
        T.StructField("carry_num", T.DoubleType()),
        T.StructField("carry_den", T.DoubleType()),
    ])

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        # exclusive prefix over the (tiny) partition summaries:
        # G_p = last_p + decay_p * G_{p-1}; carry for p is G_{p-1}
        pdf = pdf.sort_values("__pid")
        carries, g_num, g_den = [], 0.0, 0.0
        for _, row in pdf.iterrows():
            carries.append((int(row["__pid"]), g_num, g_den))
            g_num = row["last_num"] + row["decay"] * g_num
            g_den = row["last_den"] + row["decay"] * g_den
        return pd.DataFrame(carries,
                            columns=["__pid", "carry_num", "carry_den"])

    carries = (summary.withColumn("__one", F.lit(1)).groupBy("__one")
               .applyInPandas(lambda pdf: _fold(pdf), carry_schema))

    scale = F.pow(F.lit(d), F.col("__pos") + 1)
    num_t = F.col("__num") + F.coalesce(F.col("carry_num"), F.lit(0.0)) * scale
    den_t = F.col("__den") + F.coalesce(F.col("carry_den"), F.lit(0.0)) * scale
    out = (local.join(F.broadcast(carries), "__pid", "left")
           .withColumn(name,
                       # den == 0 ⇔ no observation seen yet (leading NaNs)
                       F.when(den_t > 0, num_t / den_t))
           .drop("__pid", "__num", "__den", "__pos",
                 "carry_num", "carry_den"))
    return out


def _ewm_noadjust_multi(sdf: SparkDF, cols: list[str], order_by: str,
                        alpha: float,
                        num_partitions: int | None = None) -> SparkDF:
    """pandas ``ewm(alpha, adjust=False).mean()`` (ignore_na=False) as a
    distributed segment scan, overwriting ``cols`` in place.

    pandas' recursion (per its Cython kernel) keeps a carried mean y and
    an old-weight w: every row after the first observation decays
    ``w *= 1-α``; an observation then blends ``y = (w·y + α·x)/(w + α)``
    and RESETS ``w = 1``.  The reset makes (num, den) non-linear, but
    within a partition every row's value is AFFINE in y1 — the blended
    value at the partition's FIRST local observation:

        y_row = A_row · y1 + B_row

    with (A, B) computed locally (A multiplies by w/(w+α) at each later
    observation; w evolves locally because it resets at each obs).  Only
    y1 depends on upstream state, through the carried (y_in, w_in):
    ``w1 = w_in · d^(p_first+1)``, ``y1 = (w1·y_in + α·x_first)/(w1+α)``
    — or ``y1 = x_first`` when no observation precedes the partition.
    The tiny driver fold walks partition summaries computing (y_in, y1)
    per partition; a broadcast join patches rows.  Same cost envelope as
    the adjusted scan: one range shuffle + one O(#partitions) fold.
    Rows before the partition's first observation output the carried
    mean y_in (null before the global first observation).
    """
    d = 1.0 - alpha
    n_parts = num_partitions or sdf.sparkSession.sparkContext.defaultParallelism
    part = (sdf.repartitionByRange(n_parts, F.col(order_by))
            .sortWithinPartitions(order_by)
            .withColumn("__pid", F.spark_partition_id()))

    fields = [T.StructField(f.name, T.DoubleType() if f.name in cols
                            else f.dataType, True)
              for f in part.schema.fields]
    for c in cols:
        fields += [T.StructField(f"__a_{c}", T.DoubleType()),
                   T.StructField(f"__b_{c}", T.DoubleType()),
                   T.StructField(f"__bf_{c}", T.BooleanType()),
                   # per-partition constants replicated per row; reduced
                   # via max_by(__pos) in the summary
                   T.StructField(f"__fp_{c}", T.LongType()),
                   T.StructField(f"__fx_{c}", T.DoubleType()),
                   T.StructField(f"__w_{c}", T.DoubleType())]
    fields.append(T.StructField("__pos", T.LongType()))
    local_schema = T.StructType(fields)
    names = [f.name for f in fields]

    def _local_scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per column: (a, b) affine coeffs vs y1, w old-weight,
        # first-obs (pos, x); state persists across Arrow batches
        st = {c: {"a": 1.0, "b": 0.0, "w": 1.0,
                  "fp": -1, "fx": float("nan")} for c in cols}
        pos = -1
        for pdf in batches:
            pdf = pdf.copy()
            n = len(pdf)
            for c in cols:
                x = pdf[c].to_numpy(dtype="float64")
                s = st[c]
                a_l = [0.0] * n
                b_l = [0.0] * n
                bf_l = [False] * n
                for i in range(n):
                    xi = x[i]
                    if s["fp"] < 0:
                        if xi == xi:
                            s["fp"], s["fx"] = pos + 1 + i, float(xi)
                            s["a"], s["b"], s["w"] = 1.0, 0.0, 1.0
                            bf_l[i] = False
                        else:
                            bf_l[i] = True
                    else:
                        s["w"] *= d
                        if xi == xi:
                            denom = s["w"] + alpha
                            s["a"] = s["a"] * (s["w"] / denom)
                            s["b"] = (s["w"] * s["b"] + alpha * xi) / denom
                            s["w"] = 1.0
                    a_l[i] = s["a"]
                    b_l[i] = s["b"]
                pdf[f"__a_{c}"] = a_l
                pdf[f"__b_{c}"] = b_l
                pdf[f"__bf_{c}"] = bf_l
                pdf[f"__fp_{c}"] = s["fp"]
                pdf[f"__fx_{c}"] = s["fx"]
                pdf[f"__w_{c}"] = s["w"]
            pdf["__pos"] = range(pos + 1, pos + 1 + n)
            pos += n
            yield pdf[names]

    local = part.mapInPandas(_local_scan, local_schema).persist()

    summary = (local.groupBy("__pid")
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    *[a for c in cols for a in
                      (F.max_by(f"__a_{c}", "__pos").alias(f"la_{c}"),
                       F.max_by(f"__b_{c}", "__pos").alias(f"lb_{c}"),
                       F.max_by(f"__fp_{c}", "__pos").alias(f"fp_{c}"),
                       F.max_by(f"__fx_{c}", "__pos").alias(f"fx_{c}"),
                       F.max_by(f"__w_{c}", "__pos").alias(f"lw_{c}"))]))

    carry_fields = [T.StructField("__pid", T.IntegerType())]
    for c in cols:
        carry_fields += [T.StructField(f"cy_{c}", T.DoubleType()),
                         T.StructField(f"cy1_{c}", T.DoubleType())]
    carry_schema = T.StructType(carry_fields)

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__pid")
        g = {c: (float("nan"), 1.0) for c in cols}   # (y, w) entering
        rows = []
        for _, row in pdf.iterrows():
            r = {"__pid": int(row["__pid"])}
            for c in cols:
                y_in, w_in = g[c]
                r[f"cy_{c}"] = y_in
                fp = int(row[f"fp_{c}"])
                if fp >= 0:                       # partition observed
                    if y_in != y_in:              # global first obs here
                        y1 = float(row[f"fx_{c}"])
                    else:
                        w1 = w_in * d ** (fp + 1)
                        y1 = ((w1 * y_in + alpha * row[f"fx_{c}"])
                              / (w1 + alpha))
                    r[f"cy1_{c}"] = y1
                    g[c] = (row[f"la_{c}"] * y1 + row[f"lb_{c}"],
                            float(row[f"lw_{c}"]))
                else:
                    r[f"cy1_{c}"] = float("nan")
                    g[c] = (y_in, w_in * d ** int(row["n_rows"]))
            rows.append(r)
        return pd.DataFrame(rows, columns=[f.name for f in carry_fields])

    carries = (summary.withColumn("__one", F.lit(1)).groupBy("__one")
               .applyInPandas(lambda pdf: _fold(pdf), carry_schema))

    out = local.join(F.broadcast(carries), "__pid", "left")
    updates, drop = {}, ["__pid", "__pos"]
    for c in cols:
        val = F.when(F.col(f"__bf_{c}"),
                     # before the first local obs → carried mean (NaN →
                     # null before the global first observation)
                     F.when(F.col(f"cy_{c}") == F.col(f"cy_{c}"),
                            F.col(f"cy_{c}"))) \
            .otherwise(F.col(f"__a_{c}") * F.col(f"cy1_{c}")
                       + F.col(f"__b_{c}"))
        updates[c] = val
        drop += [f"__a_{c}", f"__b_{c}", f"__bf_{c}", f"__fp_{c}",
                 f"__fx_{c}", f"__w_{c}", f"cy_{c}", f"cy1_{c}"]
    return out.withColumns(updates).drop(*drop)


# --------------------------------------------------------------------------
# Period representation (SURVEY §1.4; reference ToTimestamp _expr.py:1159-1168)
#
# Spark has no PeriodDtype.  A pandas period is represented as its
# **start timestamp** plus driver-side freq metadata carried on the
# collection wrapper; ``to_timestamp(how="start")`` is then the identity
# and ``how="end"`` is ``start + <one period> - 1 microsecond`` (pandas'
# nanosecond period-end floors to the same microsecond, so differential
# tests agree after the ns→µs cast).  Pure column arithmetic — stays in
# whole-stage codegen, no shuffle, scale-free.
# --------------------------------------------------------------------------

# pandas freqstr → (Spark INTERVAL literal, date_trunc unit)
_PERIOD_FREQ = {
    "D": ("1 DAY", "day"),
    "W": ("7 DAY", "week"),
    "M": ("1 MONTH", "month"),
    "ME": ("1 MONTH", "month"),
    "MS": ("1 MONTH", "month"),
    "Q": ("3 MONTH", "quarter"),
    "QE": ("3 MONTH", "quarter"),
    "Y": ("1 YEAR", "year"),
    "YE": ("1 YEAR", "year"),
    "A": ("1 YEAR", "year"),
    "H": ("1 HOUR", "hour"),
    "T": ("1 MINUTE", "minute"),
    "MIN": ("1 MINUTE", "minute"),
    "S": ("1 SECOND", "second"),
}


def _norm_freq(freq: str) -> tuple[str, str]:
    """Normalize a pandas freqstr ('D', 'M', 'Q-DEC', 'W-SUN', 'min', …)."""
    key = str(freq).split("-")[0].upper()
    if key not in _PERIOD_FREQ:
        raise ValueError(f"unsupported period freq: {freq!r}")
    return _PERIOD_FREQ[key]


def period_start_col(col, freq: str):
    """Truncate a timestamp column to its containing period's start
    (``Series.dt.to_period``)."""
    _, unit = _norm_freq(freq)
    return F.date_trunc(unit, col)


def period_label_col(col, freq: str):
    """Format a stored period-start timestamp as pandas' Period STRING
    label ('2024', '2024Q1', '2024-02', '2024-02-25', '2024-02-25 05:00')
    — pure JVM date_format/concat, used by ``astype(str)`` on
    period-valued series (r5 hunt pin: the raw timestamp cast printed
    '2024-01-01 00:00:00' where pandas prints '2024Q1')."""
    key = str(freq).split("-")[0].upper()
    if key in ("A", "Y"):
        return F.date_format(col, "yyyy")
    if key == "Q":
        return F.concat(F.date_format(col, "yyyy"), F.lit("Q"),
                        F.quarter(col).cast("string"))
    if key == "M":
        return F.date_format(col, "yyyy-MM")
    if key == "W":
        # pandas week label is 'start/end' of the week period
        end = F.date_add(col.cast("date"), 6)
        return F.concat(F.date_format(col, "yyyy-MM-dd"), F.lit("/"),
                        F.date_format(end, "yyyy-MM-dd"))
    if key == "D":
        return F.date_format(col, "yyyy-MM-dd")
    if key in ("H", "HOUR"):
        return F.date_format(col, "yyyy-MM-dd HH:00")
    if key in ("T", "MIN"):
        return F.date_format(col, "yyyy-MM-dd HH:mm")
    if key in ("S", "SEC"):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col.cast("string")


def period_to_timestamp_col(col, freq: str, how: str = "start"):
    """Convert a stored period-start column per pandas ``to_timestamp``."""
    if how in ("start", "s", "begin"):
        return col
    if how in ("end", "e", "finish"):
        interval, _ = _norm_freq(freq)
        return (col + F.expr(f"INTERVAL {interval}")
                - F.expr("INTERVAL 1 MICROSECOND"))
    raise ValueError(f"how must be 'start' or 'end', got {how!r}")


def ewm_var_global(sdf: SparkDF, col: str, order_by: str, alpha: float,
                   name: str = "ewm_var", bias: bool = False,
                   num_partitions: int | None = None) -> SparkDF:
    """Distributed ``ewm(adjust=True).var()`` — same three-stage segment
    scan as :func:`ewm_mean_global`, with a 5-tuple linear state
    ``(Σw·x, Σw·x², Σw, Σw², nobs)``: w decays by d = 1−α per row, w² by
    d².  pandas' debiased variance is then a pure column expression:
    ``(Σw² ⁄ ((Σw)² − Σw²)) · (Σw·x² − (Σw·x)²/Σw)`` (bias=False), null
    until the second observation.  Nulls follow pandas ``ignore_na=False``
    (weights decay, no observation added)."""
    d = 1.0 - alpha
    d2 = d * d
    n_parts = num_partitions or sdf.sparkSession.sparkContext.defaultParallelism
    part = (sdf.repartitionByRange(n_parts, F.col(order_by))
            .sortWithinPartitions(order_by)
            .withColumn("__pid", F.spark_partition_id()))

    state_cols = ["__sx", "__sx2", "__sw", "__sw2", "__nob"]
    fields = list(part.schema.fields) + [
        T.StructField(c, T.DoubleType()) for c in state_cols
    ] + [T.StructField("__pos", T.LongType())]
    local_schema = T.StructType(fields)

    def _local_scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sx = sx2 = sw = sw2 = nob = 0.0
        pos = -1
        for pdf in batches:
            x = pdf[col].to_numpy(dtype="float64")
            n = len(x)
            outs = {c: [0.0] * n for c in state_cols}
            positions = [0] * n
            for i, xi in enumerate(x):
                pos += 1
                if xi == xi:
                    sx = xi + d * sx
                    sx2 = xi * xi + d * sx2
                    sw = 1.0 + d * sw
                    sw2 = 1.0 + d2 * sw2
                    nob += 1.0
                else:
                    sx, sx2, sw, sw2 = d * sx, d * sx2, d * sw, d2 * sw2
                outs["__sx"][i], outs["__sx2"][i] = sx, sx2
                outs["__sw"][i], outs["__sw2"][i] = sw, sw2
                outs["__nob"][i] = nob
                positions[i] = pos
            pdf = pdf.copy()
            for c in state_cols:
                pdf[c] = outs[c]
            pdf["__pos"] = positions
            yield pdf

    local = part.mapInPandas(_local_scan, local_schema).persist()

    summary = (local.groupBy("__pid")
               .agg(*[F.max_by(c, "__pos").alias("last" + c)
                      for c in state_cols],
                    F.pow(F.lit(d), F.count(F.lit(1))).alias("decay"),
                    F.pow(F.lit(d2), F.count(F.lit(1))).alias("decay2")))

    carry_schema = T.StructType(
        [T.StructField("__pid", T.IntegerType())] +
        [T.StructField("carry" + c, T.DoubleType()) for c in state_cols])

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__pid")
        carries = []
        g = {c: 0.0 for c in state_cols}
        for _, row in pdf.iterrows():
            carries.append((int(row["__pid"]), *[g[c] for c in state_cols]))
            dk, dk2 = row["decay"], row["decay2"]
            g["__sx"] = row["last__sx"] + dk * g["__sx"]
            g["__sx2"] = row["last__sx2"] + dk * g["__sx2"]
            g["__sw"] = row["last__sw"] + dk * g["__sw"]
            g["__sw2"] = row["last__sw2"] + dk2 * g["__sw2"]
            g["__nob"] = row["last__nob"] + g["__nob"]
        return pd.DataFrame(
            carries, columns=["__pid"] + ["carry" + c for c in state_cols])

    carries = (summary.withColumn("__one", F.lit(1)).groupBy("__one")
               .applyInPandas(lambda pdf: _fold(pdf), carry_schema))

    scale = F.pow(F.lit(d), F.col("__pos") + 1)
    scale2 = F.pow(F.lit(d2), F.col("__pos") + 1)
    cz = lambda c: F.coalesce(F.col("carry" + c), F.lit(0.0))  # noqa: E731
    sx_t = F.col("__sx") + cz("__sx") * scale
    sx2_t = F.col("__sx2") + cz("__sx2") * scale
    sw_t = F.col("__sw") + cz("__sw") * scale
    sw2_t = F.col("__sw2") + cz("__sw2") * scale2
    nob_t = F.col("__nob") + cz("__nob")
    mean = sx_t / sw_t
    biased = sx2_t / sw_t - mean * mean
    if bias:
        var = biased
    else:
        var = biased * (sw_t * sw_t) / (sw_t * sw_t - sw2_t)
    out = (local.join(F.broadcast(carries), "__pid", "left")
           .withColumn(name,
                       F.when(nob_t >= 2, F.greatest(var, F.lit(0.0))))
           .drop("__pid", *state_cols, "__pos",
                 *["carry" + c for c in state_cols]))
    return out


def ewm_mean_ignore_na(sdf: SparkDF, cols: list[str], order_by: str,
                       alpha: float, adjust: bool = True,
                       num_partitions: int | None = None) -> SparkDF:
    """pandas ``ewm(..., ignore_na=True).mean()``: NaN rows neither decay
    the weights nor add observations — the EWM runs over each column's
    NON-NULL subsequence, and gap rows output the prior mean.

    Per column: split on null, run the shared segment-scan kernel over
    the observation subsequence (which stays range-partitioned — no
    single-task stage), union the gap rows back with a null result, and
    one ``last_scan`` forward-fill patches them with the prior mean.
    Columns with distinct null patterns cannot share one scan (their
    observation clocks differ), so this is one pass per column — the
    ``ignore_na=False`` default keeps the shared multi-column pass."""
    from .scan import last_scan
    out = sdf
    for c in cols:
        is_f = isinstance(out.schema[c].dataType, (T.DoubleType, T.FloatType))
        null_c = F.col(c).isNull() | (F.isnan(c) if is_f else F.lit(False))
        obs = out.filter(~null_c)
        gaps = out.filter(null_c).withColumn(c, F.lit(None).cast("double"))
        scanned = ewm_mean_global(obs, c, order_by, alpha, name=c,
                                  num_partitions=num_partitions,
                                  adjust=adjust)
        out = last_scan(scanned.unionByName(gaps), [c], [order_by],
                        num_partitions=num_partitions)
    return out


def ewm_mean_global_multi(sdf: SparkDF, cols: list[str], order_by: str,
                          alpha: float,
                          num_partitions: int | None = None,
                          adjust: bool = True) -> SparkDF:
    """``ewm_mean_global`` for SEVERAL columns in ONE ranged pass: the
    per-partition recurrence carries (num, den) state per column through
    the same Arrow stream, the partition-summary fold carries one
    (num, den) pair per column, and a single broadcast join patches all
    columns at once.  Results overwrite ``cols`` in place.
    ``adjust=False`` dispatches to the affine scan
    (``_ewm_noadjust_multi`` — see its docstring)."""
    if not adjust:
        return _ewm_noadjust_multi(sdf, cols, order_by, alpha,
                                   num_partitions)
    d = 1.0 - alpha
    n_parts = num_partitions or sdf.sparkSession.sparkContext.defaultParallelism
    part = (sdf.repartitionByRange(n_parts, F.col(order_by))
            .sortWithinPartitions(order_by)
            .withColumn("__pid", F.spark_partition_id()))

    fields = [T.StructField(f.name, T.DoubleType() if f.name in cols
                            else f.dataType, True)
              for f in part.schema.fields]
    for c in cols:
        fields += [T.StructField(f"__num_{c}", T.DoubleType()),
                   T.StructField(f"__den_{c}", T.DoubleType())]
    fields.append(T.StructField("__pos", T.LongType()))
    local_schema = T.StructType(fields)
    names = [f.name for f in fields]

    def _local_scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state = {c: (0.0, 0.0) for c in cols}
        pos = -1
        for pdf in batches:
            pdf = pdf.copy()
            n = len(pdf)
            for c in cols:
                x = pdf[c].to_numpy(dtype="float64")
                num, den = state[c]
                nums, dens = [0.0] * n, [0.0] * n
                for i in range(n):
                    xi = x[i]
                    if xi == xi:      # non-NaN (pandas ignore_na=False)
                        num = xi + d * num
                        den = 1.0 + d * den
                    else:
                        num = d * num
                        den = d * den
                    nums[i] = num
                    dens[i] = den
                state[c] = (num, den)
                pdf[f"__num_{c}"] = nums
                pdf[f"__den_{c}"] = dens
            pdf["__pos"] = range(pos + 1, pos + 1 + n)
            pos += n
            yield pdf[names]

    local = part.mapInPandas(_local_scan, local_schema).persist()
    summary = (local.groupBy("__pid")
               .agg(F.pow(F.lit(d), F.count(F.lit(1))).alias("decay"),
                    *[a for c in cols for a in
                      (F.max_by(f"__num_{c}", "__pos").alias(f"ln_{c}"),
                       F.max_by(f"__den_{c}", "__pos").alias(f"ld_{c}"))]))

    carry_fields = [T.StructField("__pid", T.IntegerType())]
    for c in cols:
        carry_fields += [T.StructField(f"cn_{c}", T.DoubleType()),
                         T.StructField(f"cd_{c}", T.DoubleType())]
    carry_schema = T.StructType(carry_fields)

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__pid")
        g = {c: (0.0, 0.0) for c in cols}
        rows = []
        for _, row in pdf.iterrows():
            r = {"__pid": int(row["__pid"])}
            for c in cols:
                gn, gd = g[c]
                r[f"cn_{c}"], r[f"cd_{c}"] = gn, gd
                g[c] = (row[f"ln_{c}"] + row["decay"] * gn,
                        row[f"ld_{c}"] + row["decay"] * gd)
            rows.append(r)
        return pd.DataFrame(rows, columns=[f.name for f in carry_fields])

    carries = (summary.withColumn("__one", F.lit(1)).groupBy("__one")
               .applyInPandas(lambda pdf: _fold(pdf), carry_schema))

    scale = F.pow(F.lit(d), F.col("__pos") + 1)
    out = local.join(F.broadcast(carries), "__pid", "left")
    updates, drop = {}, ["__pid", "__pos"]
    for c in cols:
        num_t = (F.col(f"__num_{c}")
                 + F.coalesce(F.col(f"cn_{c}"), F.lit(0.0)) * scale)
        den_t = (F.col(f"__den_{c}")
                 + F.coalesce(F.col(f"cd_{c}"), F.lit(0.0)) * scale)
        updates[c] = F.when(den_t > 0, num_t / den_t)
        drop += [f"__num_{c}", f"__den_{c}", f"cn_{c}", f"cd_{c}"]
    return out.withColumns(updates).drop(*drop)


def time_rolling(sdf: SparkDF, rid_cols: list[str], ts_col: str,
                 value_cols: list[str], window_micros: int,
                 agg: str, min_periods: int = 1,
                 by: list[str] | None = None,
                 closed: str = "right",
                 pos_col: str | None = None) -> SparkDF:
    """Time-offset rolling aggregate (pandas ``rolling("3D")``): for each
    row, aggregate rows whose timestamp lies in ``(t - W, t]``
    (``closed='right'``, the pandas default for offset windows; 'both'
    makes the left edge inclusive).

    Scale shape — NO global window (the classic single-task killer):
    bucket each row into a time block of width W; a row's window can only
    reach its own and the previous block, so the contributing side is
    duplicated into (block, block+1) with one generator and the pair is
    an EQUI-join on block (+ group keys), filtered to the exact time
    range, then one hash aggregation keyed by the left row id.  Cost is
    O(Σ window occupancy) — the output size of the semantics itself —
    with every stage partitioned by (keys, block).
    """
    from pyspark.sql import types as T
    if agg not in ("sum", "mean", "count", "min", "max", "var", "std"):
        raise NotImplementedError(f"time rolling agg {agg!r}")
    by = list(by or [])
    ts = F.col(ts_col)
    dt = sdf.schema[ts_col].dataType
    mic = (F.unix_micros(ts.cast("timestamp"))
           if isinstance(dt, T.TimestampNTZType) else F.unix_micros(ts))
    base = sdf.withColumn("__mic__", mic) \
              .withColumn("__blk__", F.floor(F.col("__mic__")
                                             / F.lit(window_micros)))
    lpos = [F.col(pos_col).alias("__lp__")] if pos_col else []
    lhs = base.select(*rid_cols, *by, *lpos,
                      F.col("__mic__").alias("__lm__"),
                      F.col("__blk__").alias("__lb__"))
    rpos = [F.col(pos_col).alias("__rp__")] if pos_col else []
    rhs = base.select(
        *[F.col(b).alias(f"__r_{b}__") for b in by], *rpos,
        F.col("__mic__").alias("__rm__"),
        *[F.col(c).alias(f"__rv_{c}__") for c in value_cols],
        F.explode(F.array(F.col("__blk__"), F.col("__blk__") + 1))
        .alias("__rb__"))
    cond = F.col("__lb__") == F.col("__rb__")
    for b in by:
        cond = cond & F.col(b).eqNullSafe(F.col(f"__r_{b}__"))
    left_edge = (F.col("__rm__") >= F.col("__lm__") - F.lit(window_micros)
                 if closed == "both"
                 else F.col("__rm__") > F.col("__lm__") - F.lit(window_micros))
    # pandas walks rows in POSITION order: at a tied timestamp only rows
    # up to the current position are in the window
    right_edge = (F.col("__rm__") < F.col("__lm__")) | \
                 ((F.col("__rm__") == F.col("__lm__"))
                  & (F.col("__rp__") <= F.col("__lp__"))) \
        if pos_col else (F.col("__rm__") <= F.col("__lm__"))
    pairs = lhs.join(rhs, cond & left_edge & right_edge)
    aggs = []
    for c in value_cols:
        v = F.col(f"__rv_{c}__")
        n = F.count(v)
        if agg in ("var", "std"):
            # sample variance from (n, Σx, Σx²) in the SAME aggregation
            # pass; ddof=1 (pandas default), n==1 → null like pandas
            s1, s2 = F.sum(v), F.sum(v * v)
            var = (s2 - s1 * s1 / n) / (n - 1)
            out = F.when(n >= F.greatest(F.lit(min_periods), F.lit(2)),
                         F.sqrt(var) if agg == "std" else var)
        else:
            fn = {"sum": F.sum, "mean": F.avg, "count": F.count,
                  "min": F.min, "max": F.max}[agg]
            # pandas rolling count is float64-valued
            out = fn(v).cast("double") if agg == "count" else fn(v)
            out = F.when(n >= min_periods, out)
        aggs.append(out.alias(c))
    return pairs.groupBy(*rid_cols, *by).agg(*aggs)
