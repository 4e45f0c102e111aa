"""Local stand-in for the driver's correctness harness: run each
__spark_entry__ query on Spark AND its DuckDB oracle at sf0.01, compare row
count, column names, and order-insensitive values.

Usage: python tools/compare_oracle.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from ultragendataset_datachecker_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main():
    only = set(sys.argv[1:])
    spark = get_spark(app_name="oracle-compare", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_cnt = len(srows) == len(drows)
        ok_vals = False
        if ok_cols and ok_cnt:
            sv = norm_rows(scols, [[r[c] for c in scols] for r in srows])
            dv = norm_rows(dcols, drows)
            ok_vals = sv == dv
            if not ok_vals:
                diff = [(a, b) for a, b in zip(sv, dv) if a != b][:3]
                print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
                failures += 1
                continue
        if not ok_cols:
            print(f"FAIL  {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            failures += 1
        elif not ok_cnt:
            print(f"FAIL  {name}: rows spark={len(srows)} duck={len(drows)}")
            failures += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
