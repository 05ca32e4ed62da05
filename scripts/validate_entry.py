"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares against
``oracle_sql()`` via DuckDB: row count, sorted column names, and an
order-insensitive value comparison. Rows-only entries are just executed.

Usage: python scripts/validate_entry.py [sf_dir] [only_query_name]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as E  # noqa: E402
from newscrawler_spark.session import get_spark  # noqa: E402


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.10g}"
    if hasattr(v, "isoformat"):
        return v.isoformat(sep=" ")
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = get_spark(cores=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in E.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows, {dt:.1f}s (rows-only)")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error {ex}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if sorted(cols) != sorted(ocols):
            ok = False
            msgs.append(f"schema {sorted(cols)} vs {sorted(ocols)}")
        if len(rows) != len(orows):
            ok = False
            msgs.append(f"rowcount {len(rows)} vs {len(orows)}")
        if ok:
            a = norm_rows(cols, rows)
            b = norm_rows(ocols, orows)
            if a != b:
                ok = False
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                msgs.append(f"values differ, first diffs: {diff}")
        if ok:
            print(f"PASS  {name}: {len(rows)} rows, {dt:.1f}s")
            n_pass += 1
        else:
            print(f"FAIL  {name}: {'; '.join(msgs)}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
