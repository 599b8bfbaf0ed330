"""Soak run — the full merge cycle at bench scale, end to end through storage.

Exercises the heaviest single flow the engine supports: a 600k-row
composite-key badKey merge with audit and threshold at sf0.1, then verifies
convergence and audit consistency.  (The corpus's lineitem key
(l_orderkey, l_linenumber) is ~23% non-unique at every SF — real badKey
territory, see tests/test_golden_merge.py::test_badkey_on_real_corpus_duplicates.)

Usage: PYTHONPATH=/root/repo python tools/soak.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from sparkmerge.merge import simple_merge
    from sparkmerge.queries.fixtures import lineitem_source
    from sparkmerge.session import get_spark
    from sparkmerge.table import SnapshotTable

    spark = get_spark("soak", input_bytes=100)
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    d = tempfile.mkdtemp(prefix="soak_")
    try:
        t0 = time.perf_counter()
        tbl = SnapshotTable.create(spark, os.path.join(d, "t"), li)
        src = lineitem_source(spark, sf_dir)
        res = simple_merge(
            spark, tbl, src, ["l_orderkey", "l_linenumber"],
            bad_key=True, bad_key_order=li.columns,
            audit_path=os.path.join(d, "audit"), threshold="90%",
        )
        t1 = time.perf_counter()
        final = tbl.read(spark)
        conv = final.exceptAll(src).count() == 0 and src.exceptAll(final).count() == 0
        audit_n = spark.read.parquet(os.path.join(d, "audit")).count()
        ok = conv and audit_n == res.changed_rows
        print(
            f"soak rows={li.count()} changed={res.changed_rows} audit={audit_n} "
            f"merge={t1 - t0:.1f}s convergence={conv}"
        )
        print("PASS" if ok else "FAIL")
        sys.exit(0 if ok else 1)
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
