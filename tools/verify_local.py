"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at sf0.01, then compares row count, column names, and an
order-insensitive value comparison (sorted rows, NaN==NaN, float
tolerance 1e-9 relative).  Exit code 1 on any mismatch.

Usage: python tools/verify_local.py [query_id ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01")

import duckdb  # noqa: E402

from aws_datalake_framework_api_spark.queries_all import ORACLE, QUERIES  # noqa: E402
from aws_datalake_framework_api_spark.session import get_spark  # noqa: E402
from aws_datalake_framework_api_spark.sources.readers import TABLE_NAMES  # noqa: E402


def duck_con():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def normalize_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def rows_key(rows):
    out = []
    for r in rows:
        out.append(tuple(normalize_cell(c) for c in r))
    return sorted(out, key=lambda t: tuple((x is None, str(type(x)), x) if not isinstance(x, (int, float)) or isinstance(x, bool) else (x is None, "num", x) for x in t))


def cells_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        # exact: the driver compares value-hashes, so any bit difference fails
        return fa == fb
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    return str(a) == str(b)


def compare(name, spark_df, duck_rel) -> list[str]:
    errs = []
    s_cols = [c.lower() for c in spark_df.columns]
    d_cols = [c.lower() for c in duck_rel.columns]
    if sorted(s_cols) != sorted(d_cols):
        errs.append(f"columns differ: spark={s_cols} duck={d_cols}")
        return errs
    # align column order by name; fetchall preserves NULL as None
    # (.df() would coerce to NaN/NaT and create false diffs)
    s_rows = [tuple(row[c] for c in s_cols) for row in
              (r.asDict() for r in spark_df.collect())]
    d_idx = [d_cols.index(c) for c in s_cols]
    d_rows = [tuple(r[i] for i in d_idx) for r in duck_rel.fetchall()]
    if len(s_rows) != len(d_rows):
        errs.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
        return errs
    sk = rows_key(s_rows)
    dk = rows_key(d_rows)
    n_bad = 0
    for i, (a, b) in enumerate(zip(sk, dk)):
        if not all(cells_equal(x, y) for x, y in zip(a, b)):
            if n_bad < 3:
                errs.append(f"row {i} differs:\n  spark={a}\n  duck ={b}")
            n_bad += 1
    if n_bad:
        errs.append(f"{n_bad}/{len(sk)} rows differ")
    return errs


def main():
    only = set(sys.argv[1:])
    spark = get_spark("verify-local")
    con = duck_con()
    failed, passed, rows_only = [], [], []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            if name not in ORACLE:
                n = df.count()
                rows_only.append(name)
                print(f"  ROWS-ONLY {name}: {n} rows [{time.time()-t0:.1f}s]")
                continue
            rel = con.sql(ORACLE[name])
            errs = compare(name, df, rel)
        except Exception as e:  # noqa: BLE001
            errs = [f"EXCEPTION: {type(e).__name__}: {e}"]
        if errs:
            failed.append(name)
            print(f"  FAIL {name} [{time.time()-t0:.1f}s]")
            for e in errs:
                print(f"       {e}")
        else:
            passed.append(name)
            print(f"  ok   {name} [{time.time()-t0:.1f}s]")
    print(f"\n{len(passed)} passed, {len(failed)} failed, {len(rows_only)} rows-only")
    if failed:
        print("failed:", " ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
