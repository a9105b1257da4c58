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


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
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
    a, b = normalize(spark_df), normalize(oracle_df)
    if len(a) == len(b):
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]):
                if not np.allclose(a[c].fillna(-9e99), b[c].fillna(-9e99),
                                   rtol=0, atol=0):
                    mism = (a[c].fillna(-9e99) != b[c].fillna(-9e99)).sum()
                    problems.append(f"col {c}: {mism} float mismatches "
                                    f"(max diff {np.max(np.abs(a[c].fillna(0) - b[c].fillna(0)))})")
            else:
                if not (a[c].fillna("<null>") == b[c].fillna("<null>")).all():
                    mism = (a[c].fillna("<null>") != b[c].fillna("<null>")).sum()
                    problems.append(f"col {c}: {mism} value mismatches")
    return problems


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
