"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf dir and
compares against oracle_sql() via DuckDB: row count, column names,
and an order-insensitive value comparison (sorted columns + rows,
NaN-safe). Prints one line per query.

Usage: python scripts/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str:
    if sorted(a.columns) != sorted(b.columns):
        return f"SCHEMA columns differ: {sorted(a.columns)} vs {sorted(b.columns)}"
    if len(a) != len(b):
        return f"ROWS {len(a)} vs {len(b)}"
    na, nb = normalize(a), normalize(b)
    for c in na.columns:
        ca, cb = na[c], nb[c]
        if ca.dtype.kind == "f" or cb.dtype.kind == "f":
            ca = pd.to_numeric(ca, errors="coerce").astype(float).round(9)
            cb = pd.to_numeric(cb, errors="coerce").astype(float).round(9)
            if not ((ca.isna() & cb.isna()) | (ca == cb)).all():
                bad = (~((ca.isna() & cb.isna()) | (ca == cb))).idxmax()
                return f"VALUES col {c} row {bad}: {ca[bad]!r} vs {cb[bad]!r}"
        else:
            if not (ca.astype(str) == cb.astype(str)).all():
                bad = (ca.astype(str) != cb.astype(str)).idxmax()
                return f"VALUES col {c} row {bad}: {ca[bad]!r} vs {cb[bad]!r}"
    return "OK"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    from equi7grid_spark.session import get_spark

    spark = get_spark(app_name="oracle_check", master="local[8]", shuffle_partitions=8)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_ok = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:28s} SPARK-ERROR {exc}")
            n_fail += 1
            continue
        if name in oracles:
            try:
                odf = con.execute(oracles[name]).fetchdf()
            except Exception as exc:  # noqa: BLE001
                print(f"{name:28s} ORACLE-ERROR {exc}")
                n_fail += 1
                continue
            verdict = compare(sdf, odf)
        else:
            verdict = f"rows-only ({len(sdf)} rows)"
        status = "OK" if verdict.startswith(("OK", "rows-only")) else "FAIL"
        n_ok += status == "OK"
        n_fail += status != "OK"
        print(f"{name:28s} {verdict}   [{time.time()-t0:.1f}s]")
    print(f"\n{n_ok} ok, {n_fail} failed")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
