"""Local differential harness — runs every registry op's Spark query AND its
DuckDB oracle at a given sf dir and compares row count, column names, and an
order-insensitive value comparison (exact for ints/strings/bools/timestamps,
bit-exact for doubles — matching the driver's value-hash gate).

Usage: python tools/check_oracle.py [sf_dir] [op_id ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or v is pd.NaT or (isinstance(v, float) and np.isnan(v)):
            return "∅"
        if isinstance(v, (np.floating, float)):
            return repr(float(v))
        if isinstance(v, (np.integer, int)):
            return str(int(v))
        if isinstance(v, (pd.Timestamp,)):
            return v.isoformat()
        if isinstance(v, (list, np.ndarray)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)

    out = df.map(cell)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from sparkmerge.queries import registry
    from sparkmerge.session import get_spark

    spark = get_spark("check_oracle")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    reg = registry()
    failures, passed, rows_only = [], 0, 0
    for op_id, spec in sorted(reg.items()):
        if only and op_id not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception:
            failures.append((op_id, "SPARK ERROR:\n" + traceback.format_exc(limit=8)))
            continue
        if spec.oracle is None:
            rows_only += 1
            print(f"  ~ {op_id:28s} rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(spec.oracle).df()
        except Exception:
            failures.append((op_id, "ORACLE ERROR:\n" + traceback.format_exc(limit=4)))
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"row count: spark={len(sdf)} duckdb={len(odf)}")
        s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
        if s_cols != o_cols:
            problems.append(f"columns: spark={s_cols} duckdb={o_cols}")
        if not problems:
            cs, co = canon(sdf), canon(odf)
            if not cs.equals(co):
                neq = (cs != co).any(axis=1)
                diff_rows = cs[neq].head(3)
                odiff = co[neq].head(3)
                problems.append(
                    f"values differ in {int(neq.sum())}/{len(cs)} rows\n"
                    f"  spark:  {diff_rows.to_dict('records')}\n"
                    f"  duckdb: {odiff.to_dict('records')}"
                )
        if problems:
            failures.append((op_id, "; ".join(problems)))
            print(f"  ✗ {op_id:28s} MISMATCH ({time.time()-t0:.1f}s)")
        else:
            passed += 1
            print(f"  ✓ {op_id:28s} ok ({len(sdf)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{passed} hash-match, {rows_only} rows-only, {len(failures)} failures / {len(reg)} ops")
    for op_id, msg in failures:
        print(f"\n--- {op_id} ---\n{msg[:2000]}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
