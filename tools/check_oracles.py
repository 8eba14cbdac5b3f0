"""Local replica of the driver's correctness gate: run each
queries()[k] on Spark and oracle_sql()[k] on DuckDB at a given sf dir,
compare row count + column names + order-insensitive values.

Usage: PYTHONPATH=. python tools/check_oracles.py [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # lists -> tuples for sortability
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    os.environ["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + os.environ.get("PYTHONPATH", "")
    )
    from pyspark.sql import SparkSession

    from warps_nutch_spark.queries import ORACLES, QUERIES

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-spark] {name}: {str(e)[:200]}")
            continue
        sql = ORACLES.get(name)
        if sql is None:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL-duck] {name}: {str(e)[:200]}")
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            failures.append((name, f"columns {list(g.columns)} vs {list(w.columns)}"))
            print(f"[FAIL-cols] {name}: {list(g.columns)} vs {list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append((name, f"rows {len(g)} vs {len(w)}"))
            print(f"[FAIL-rows] {name}: {len(g)} vs {len(w)}")
            continue
        eq = True
        for c in g.columns:
            a, b = g[c], w[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                ok = np.allclose(
                    a.astype(float).to_numpy(),
                    b.astype(float).to_numpy(),
                    rtol=1e-6,
                    atol=1e-6,
                    equal_nan=True,
                )
            else:
                ok = a.astype(str).equals(b.astype(str))
            if not ok:
                diff_idx = None
                try:
                    mism = a.astype(str) != b.astype(str)
                    diff_idx = mism.idxmax()
                except Exception:
                    pass
                failures.append((name, f"values differ in col {c}"))
                print(
                    f"[FAIL-vals] {name}: col {c}"
                    + (
                        f" first diff @{diff_idx}: {a.iloc[diff_idx]!r} vs {b.iloc[diff_idx]!r}"
                        if diff_idx is not None
                        else ""
                    )
                )
                eq = False
                break
        if eq:
            print(f"[ok] {name}: {len(g)} rows")
    print()
    print(f"{len(failures)} failures" if failures else "ALL MATCH")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
