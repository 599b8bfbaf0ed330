"""Determinism harness — run every registry op TWICE and compare canonical
result hashes.  The DuckDB differential can't catch run-to-run
nondeterminism (arbitrary tiebreaks, partition-order-dependent survivors,
wall-clock columns); this can.

Rows-only ops are included: they skip the DuckDB comparison, not the
determinism requirement (the driver records their row counts per round, and
flapping results would look like regressions).

Usage: PYTHONPATH=/root/repo python tools/check_determinism.py [sf_dir] [op ...]
"""

from __future__ import annotations

import hashlib
import sys

import numpy as np
import pandas as pd


def canon_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or v is pd.NaT or (isinstance(v, float) and np.isnan(v)):
            return "∅"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (list, np.ndarray)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    rows = sorted(",".join(cell(v) for v in row) for row in df.itertuples(index=False))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from sparkmerge.queries import registry
    from sparkmerge.session import get_spark

    spark = get_spark("determinism", input_bytes=100)
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()

    # ops whose OUTPUT is wall-clock- or run-scoped by design (timestamps in
    # the audit record / merge SQL text include none — list stays empty; keep
    # the hook for future ops that genuinely can't be run-stable)
    expected_unstable: set[str] = set()

    failures = []
    for op_id in sorted(reg):
        if only and op_id not in only:
            continue
        spec = reg[op_id]
        try:
            h1 = canon_hash(spec.fn(spark, sf_dir).toPandas())
            h2 = canon_hash(spec.fn(spark, sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001
            failures.append(op_id)
            print(f"  ✗ {op_id:28s} ERROR {type(e).__name__}: {str(e)[:100]}")
            continue
        if h1 == h2:
            print(f"  ✓ {op_id:28s} stable {h1}")
        elif op_id in expected_unstable:
            print(f"  ~ {op_id:28s} unstable (expected)")
        else:
            failures.append(op_id)
            print(f"  ✗ {op_id:28s} NONDETERMINISTIC {h1} != {h2}")

    print(f"\n{len(failures)} nondeterministic/error ops" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
