"""Emulates the driver's correctness gate: run every __spark_entry__ query
on Spark AND its oracle_sql on DuckDB at the given SF, compare row count,
column names, and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _cell_str(v) -> str:
    """Stringify one cell the way the driver's value hash sees it.

    The driver hashes STRINGIFIED values, so `-0.0` vs `0.0`, `1e-05`
    formatting, and int-vs-float reprs are all hash mismatches even when
    numerically equal.  `repr(float)` preserves every one of those
    distinctions; numeric closeness is deliberately NOT consulted here
    (it hid the r4 signed-zero driver failure — see VERDICT r4 #2)."""
    if v is None or (isinstance(v, float) and v != v):
        return "<null>"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").map(_cell_str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].map(_cell_str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"rowcount {len(spark_df)} vs {len(oracle_df)}")
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        problems.append(f"columns {sc} vs {oc}")
        return problems
    # The driver hashes stringified values, so int64 `4743` vs float64
    # `4743.0` is a hash MISMATCH even though numerically equal.  Emulate
    # that strictly: flag any int-vs-float kind divergence.
    for c in sc:
        ka = "f" if pd.api.types.is_float_dtype(spark_df[c]) else (
            "i" if pd.api.types.is_integer_dtype(spark_df[c]) else "o")
        kb = "f" if pd.api.types.is_float_dtype(oracle_df[c]) else (
            "i" if pd.api.types.is_integer_dtype(oracle_df[c]) else "o")
        if ka != kb:
            problems.append(
                f"col {c}: dtype kind mismatch spark={spark_df[c].dtype} "
                f"oracle={oracle_df[c].dtype} (driver hash would differ)")
    # Driver-style compare: every cell stringified (normalize() already
    # repr()s floats), then exact string equality.  A numeric diff is
    # appended as a secondary diagnostic so a FAIL line says whether the
    # divergence is a real value bug or repr-level (signed zero, 1e-05).
    a, b = normalize(spark_df), normalize(oracle_df)
    if len(a) == len(b):
        an, bn = normalize_numeric(spark_df), normalize_numeric(oracle_df)
        for c in a.columns:
            neq = a[c].fillna("<null>") != b[c].fillna("<null>")
            if neq.any():
                msg = f"col {c}: {int(neq.sum())} string mismatches"
                if pd.api.types.is_float_dtype(an[c]):
                    diff = np.abs(an[c].fillna(0) - bn[c].fillna(0))
                    msg += (f" (max numeric diff {np.max(diff):.3g}"
                            f"{' — repr-level only' if np.max(diff) == 0 else ''})")
                i = int(np.argmax(neq.to_numpy()))
                msg += f"; first: {a[c].iloc[i]!r} vs {b[c].iloc[i]!r}"
                problems.append(msg)
    return problems


def normalize_numeric(df: pd.DataFrame) -> pd.DataFrame:
    """Secondary diagnostic frame: floats kept numeric, same row order as
    normalize() (sorted by the stringified columns)."""
    s = normalize(df)
    out = df.copy()[sorted(df.columns)]
    # re-sort numerically-kept frame in the same order normalize chose
    order = df.copy()[sorted(df.columns)]
    for c in order.columns:
        if pd.api.types.is_datetime64_any_dtype(order[c]):
            order[c] = order[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(order[c]):
            order[c] = order[c].astype("float64").map(_cell_str)
        elif pd.api.types.is_integer_dtype(order[c]):
            order[c] = order[c].astype("int64")
        elif order[c].dtype == object:
            order[c] = order[c].map(_cell_str)
    idx = order.sort_values(list(order.columns)).index
    out = out.loc[idx].reset_index(drop=True)
    assert len(out) == len(s)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from pandas_expr_spark import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: SPARK ERROR {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_pdf)} rows (rows-only check) "
                  f"[{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: ORACLE SQL ERROR {str(e)[:200]}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"ok    {name}: {len(spark_pdf)} rows match [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} FAIL")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
