"""Self-check harness mimicking the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet tables; compare row count, schema (column names), and an
order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(df) -> str:
    """Order-insensitive: sort columns by name, sort rows, hash repr with
    floats rounded."""
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.md5(
        df.to_csv(index=False).encode("utf-8")).hexdigest()


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from pdf_parser_spark.engine.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        spark_pdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name:32s} rows={len(spark_pdf)} (rows-only check)")
            continue
        duck_pdf = con.execute(oracles[name]).fetchdf()
        rows_ok = len(spark_pdf) == len(duck_pdf)
        cols_ok = sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
        hash_ok = (value_hash(spark_pdf) == value_hash(duck_pdf)
                   if rows_ok and cols_ok else False)
        status = "OK" if (rows_ok and cols_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{name:32s} {status}  rows {len(spark_pdf)}/{len(duck_pdf)} "
              f"cols_ok={cols_ok} hash_ok={hash_ok}")
        if status == "FAIL" and rows_ok and cols_ok:
            # show first divergent row for debugging
            a = spark_pdf[sorted(spark_pdf.columns)].copy()
            b = duck_pdf[sorted(duck_pdf.columns)].copy()
            for c in a.columns:
                a[c] = a[c].astype(str)
                b[c] = b[c].astype(str)
            a = a.sort_values(list(a.columns)).reset_index(drop=True)
            b = b.sort_values(list(b.columns)).reset_index(drop=True)
            neq = (a != b).any(axis=1)
            if neq.any():
                i = int(neq.idxmax())
                print("  spark:", a.iloc[i].to_dict())
                print("  duck :", b.iloc[i].to_dict())
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
