"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at sf0.01, then compares row count, column names, and a
VALUE HASH computed the way the driver computes it: both results are
canonicalized through pandas (columns sorted by name, then
``sort_values`` over every column — list-typed cells raise TypeError
exactly as the driver's canonicalizer did on ``b_fn_array`` in
CORRECTNESS_r01), and the hash covers full-precision float reprs, so
any cross-engine bit difference fails (the ``b_llm_textstats`` class
of bug).  This gate is deliberately at-least-as-strict as the driver:
"0 failures locally" must imply "0 failures in CORRECTNESS_r{N}".

Usage: python tools/verify_local.py [query_id ...]
       python tools/verify_local.py --window N   # first N queries() entries
       python tools/verify_local.py --json PATH  # also write per-id results
       python tools/verify_local.py --selftest   # prove the gate catches
                                                 # array cols + float ulps
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01")


def duck_con():
    import duckdb

    from aws_datalake_framework_api_spark.sources.readers import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


# ---------------------------------------------------------------- canonicalize


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-shaped canonicalization: lowercase + sort columns by name,
    then pandas ``sort_values`` over ALL columns.  Object columns go
    through pandas' Categorical lexsort — a list/array cell raises
    ``TypeError: unhashable type`` here, exactly like the driver."""
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    if len(df.columns) and len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _cell_str(x) -> str:
    """Canonical string for one cell.  Floats use full-precision
    float64 repr — a one-ulp cross-engine difference changes the hash."""
    if x is None:
        return "∅"
    if isinstance(x, (float, np.floating)):
        v = float(np.float64(x))
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(x, (bool, np.bool_)):
        return "T" if x else "F"
    if isinstance(x, (int, np.integer)):
        return repr(int(x))
    if isinstance(x, decimal.Decimal):
        return repr(float(x))
    if isinstance(x, (bytes, bytearray)):
        return "0x" + bytes(x).hex()
    if isinstance(x, pd.Timestamp):
        if x is pd.NaT:
            return "∅"
        s = x.isoformat(sep=" ")
        return s[:-9] if s.endswith(" 00:00:00") else s
    if isinstance(x, datetime.datetime):
        s = x.isoformat(sep=" ")
        return s[:-9] if s.endswith(" 00:00:00") else s
    if isinstance(x, datetime.date):
        return x.isoformat()
    try:
        if pd.isna(x):
            return "∅"
    except (TypeError, ValueError):
        pass
    return str(x)


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    cdf = canon(df)
    for row in cdf.itertuples(index=False, name=None):
        h.update("\x1f".join(_cell_str(c) for c in row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


# ---------------------------------------------------------------- compare


def _spark_to_pandas(spark_df) -> pd.DataFrame:
    # Row-by-row build (not toPandas) so NULLs stay None in object
    # columns and array columns surface as Python lists — the shape the
    # driver's canonicalizer sees.
    cols = spark_df.columns
    data = [tuple(r[c] for c in cols) for r in spark_df.collect()]
    return pd.DataFrame(data, columns=cols)


def check_rows_only(spark_df) -> tuple[int, str | None]:
    """Gate for queries WITHOUT an oracle.  The driver canonicalizes
    the Spark result even when there is nothing to compare against
    (CORRECTNESS_r03: ``b_llm_emb_quant`` crashed with
    ``spark_rows=null``) — so a rows-only query must survive
    ``value_hash`` too, not just ``count()``.  Returns (row_count,
    error-or-None)."""
    sp = _spark_to_pandas(spark_df)
    try:
        value_hash(sp)
    except Exception as e:  # noqa: BLE001 — canonicalizer crash IS a failure
        return len(sp), (
            "rows-only canonicalization crashed (driver would FAIL): "
            f"{type(e).__name__}: {e}"
        )
    return len(sp), None


def compare(name: str, spark_df, duck_rel) -> list[str]:
    errs: list[str] = []
    sp = _spark_to_pandas(spark_df)
    dp = duck_rel.fetchdf()
    s_cols, d_cols = sorted(c.lower() for c in sp.columns), sorted(
        c.lower() for c in dp.columns
    )
    if s_cols != d_cols:
        return [f"columns differ: spark={s_cols} duck={d_cols}"]
    if len(sp) != len(dp):
        return [f"row count differs: spark={len(sp)} duck={len(dp)}"]
    try:
        sh = value_hash(sp)
    except Exception as e:  # noqa: BLE001 — canonicalizer crash IS a failure
        return [f"spark canonicalization crashed (driver would FAIL): {type(e).__name__}: {e}"]
    try:
        dh = value_hash(dp)
    except Exception as e:  # noqa: BLE001
        return [f"oracle canonicalization crashed (driver would FAIL): {type(e).__name__}: {e}"]
    if sh != dh:
        errs.append(f"value hash differs: spark={sh[:16]} duck={dh[:16]}")
        # diagnostic: first few differing canonical rows
        sc, dc = canon(sp), canon(dp)
        shown = 0
        for i in range(len(sc)):
            a = tuple(_cell_str(c) for c in sc.iloc[i])
            b = tuple(_cell_str(c) for c in dc.iloc[i])
            if a != b:
                errs.append(f"  row {i}:\n    spark={a}\n    duck ={b}")
                shown += 1
                if shown >= 3:
                    break
    return errs


# ---------------------------------------------------------------- selftest


def selftest() -> None:
    """The gate must FAIL on (a) array-typed columns and (b) a float
    difference below 1e-6 — the two CORRECTNESS_r01 escape classes."""
    # (a) list cells must crash canonicalization
    arr = pd.DataFrame({"k": [2, 1], "v": [[1.0, 2.0], [3.0]]})
    try:
        value_hash(arr)
        raise SystemExit("selftest FAILED: array column hashed without error")
    except TypeError:
        print("  ok: array column raises TypeError (driver-faithful)")
    # (b) one-ulp float difference must change the hash
    a = pd.DataFrame({"x": [123.456789]})
    b = pd.DataFrame({"x": [np.nextafter(123.456789, 200.0)]})
    if value_hash(a) == value_hash(b):
        raise SystemExit("selftest FAILED: ulp float diff not detected")
    print("  ok: one-ulp float difference changes the hash")
    # (c) half-even vs half-up rounding boundary (textstats class)
    c1 = pd.DataFrame({"x": [round(2.5)]})  # python: banker's -> 2
    c2 = pd.DataFrame({"x": [3]})  # HALF_UP -> 3
    if value_hash(c1) == value_hash(c2):
        raise SystemExit("selftest FAILED: rounding-boundary diff not detected")
    print("  ok: half-even/half-up boundary detected")
    # (a2) the ROWS-ONLY sweep path must reject an array-returning
    # probe query too — the exact CORRECTNESS_r03 b_llm_emb_quant
    # escape: verify_local passed it as rows-only, the driver crashed.
    class _FakeArrayDF:
        columns = ["vec_id", "codes"]

        @staticmethod
        def collect():
            return [
                {"vec_id": 1, "codes": [1, 2, 3]},
                {"vec_id": 2, "codes": [4, 5]},
            ]

    n, err = check_rows_only(_FakeArrayDF())
    if err is None:
        raise SystemExit("selftest FAILED: rows-only path passed an array column")
    print(f"  ok: rows-only path rejects array columns ({n} rows, driver-faithful)")
    # (d) identical frames in different row/column order hash equal
    d1 = pd.DataFrame({"b": [1, 2], "a": ["x", "y"]})
    d2 = pd.DataFrame({"a": ["y", "x"], "b": [2, 1]})
    if value_hash(d1) != value_hash(d2):
        raise SystemExit("selftest FAILED: order-insensitivity broken")
    print("  ok: row/column order insensitive")
    print("selftest passed")


# ---------------------------------------------------------------- main


def main():
    if "--selftest" in sys.argv:
        selftest()
        return
    from aws_datalake_framework_api_spark.queries_all import ORACLE, QUERIES
    from aws_datalake_framework_api_spark.session import get_spark

    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i : i + 2]
    window_n = None
    if "--window" in argv:
        i = argv.index("--window")
        window_n = int(argv[i + 1])
        del argv[i : i + 2]
    only = set(argv)
    spark = get_spark("verify-local")
    con = duck_con()
    failed, passed, rows_only = [], [], []
    results = {}
    for pos, (name, fn) in enumerate(QUERIES.items()):
        if window_n is not None and pos >= window_n:
            break
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            if name not in ORACLE:
                n, err = check_rows_only(df)
                if err is not None:
                    failed.append(name)
                    results[name] = {"status": "fail", "err": err,
                                     "secs": round(time.time() - t0, 2)}
                    print(f"  FAIL {name} [{time.time()-t0:.1f}s]")
                    print(f"       {err}")
                    continue
                rows_only.append(name)
                results[name] = {"status": "rows_only", "spark_rows": n,
                                 "secs": round(time.time() - t0, 2)}
                print(f"  ROWS-ONLY {name}: {n} rows [{time.time()-t0:.1f}s]")
                continue
            rel = con.sql(ORACLE[name])
            errs = compare(name, df, rel)
        except Exception as e:  # noqa: BLE001
            errs = [f"EXCEPTION: {type(e).__name__}: {e}"]
        if errs:
            failed.append(name)
            results[name] = {"status": "fail", "err": errs[0],
                             "secs": round(time.time() - t0, 2)}
            print(f"  FAIL {name} [{time.time()-t0:.1f}s]")
            for e in errs:
                print(f"       {e}")
        else:
            passed.append(name)
            results[name] = {"status": "pass",
                             "secs": round(time.time() - t0, 2)}
            print(f"  ok   {name} [{time.time()-t0:.1f}s]")
    print(f"\n{len(passed)} passed, {len(failed)} failed, {len(rows_only)} rows-only")
    if json_path:
        import json as _json

        with open(json_path, "w") as fh:
            _json.dump(
                {
                    "sf_dir": SF_DIR,
                    "n_pass": len(passed),
                    "n_fail": len(failed),
                    "n_rows_only": len(rows_only),
                    "results": results,
                },
                fh,
                indent=1,
            )
        print(f"wrote {json_path}")
    if failed:
        print("failed:", " ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
