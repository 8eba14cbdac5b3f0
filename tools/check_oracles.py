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

# the driver's known table set; extended at runtime by whatever
# *.parquet actually exists in the sf dir, so a driver-side table
# addition can't silently drift this twin (VERDICT r4 "what's wrong")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def tables_for(sf_dir: str) -> list[str]:
    import glob

    on_disk = {
        os.path.splitext(os.path.basename(p))[0]
        for p in glob.glob(os.path.join(sf_dir, "*.parquet"))
    }
    return sorted(set(TABLES) | on_disk)


def _kind(dtype) -> str:
    """Collapse numpy dtype kinds the way the driver's value-hash does:
    integer widths hash alike, but int vs float vs bool vs string differ."""
    k = np.dtype(dtype).kind if dtype != object else "O"
    return {"i": "i", "u": "i", "f": "f", "b": "b", "M": "M"}.get(k, "s")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror of the driver's canonicalizer: sort columns by name, sort
    rows by all columns, NO value coercion. The driver sorts in pandas
    and dies on unhashable cells, so any non-scalar output column is a
    hard error here too (r2's index_documents miss); and it hashes raw
    values, so int64 vs float64 or 3 vs 3.0 must FAIL, not be rounded
    away (r2's slow_host_eviction miss)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            sample = df[c].dropna()
            if len(sample) and isinstance(
                sample.iloc[0], (list, tuple, set, dict, np.ndarray)
            ):
                raise TypeError(
                    f"non-scalar output column {c!r} "
                    f"({type(sample.iloc[0]).__name__}) — the driver's canon "
                    "sorts columns in pandas and rejects unhashable cells; "
                    "flatten to a scalar (e.g. array_join(array_sort(...)))"
                )
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
    for t in tables_for(sf_dir):
        if not os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            continue
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
        try:
            g, w = normalize(got), normalize(want)
        except TypeError as e:
            failures.append((name, f"CANON ERROR: {e}"))
            print(f"[FAIL-canon] {name}: {str(e)[:200]}")
            continue
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
            # dtype-kind mismatch is a hash mismatch at the driver
            # (DuckDB HUGEINT sums land as float64 in pandas: 3.0 != 3).
            # Entirely-null columns are exempt: None (object) vs NaN
            # (float64) hash alike at the driver (r2 retry_gone_schedule
            # was green with a bare SQL NULL column).
            if a.isna().all() and b.isna().all():
                continue
            if _kind(a.dtype) != _kind(b.dtype):
                failures.append(
                    (name, f"dtype kind mismatch col {c}: {a.dtype} vs {b.dtype}")
                )
                print(f"[FAIL-dtype] {name}: col {c} {a.dtype} vs {b.dtype}")
                eq = False
                break
            if pd.api.types.is_float_dtype(a):
                # the driver hashes values — floats must be bit-exact
                ok = np.array_equal(
                    a.to_numpy(dtype=float), b.to_numpy(dtype=float), equal_nan=True
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
