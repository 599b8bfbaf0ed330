"""Decompose the per-op sf0.1 bench floor: construction vs execution.

bench.py times construction+noop-write per rep (the honest protocol —
Catalyst analysis is a real per-query cost).  This tool splits each rep
into its parts so optimization effort lands where the time actually goes:

- ``construct``: registry fn() call — py4j round-trips + Catalyst ANALYSIS
  (DataFrame creation analyzes eagerly); fixture derivation happens here.
- ``exec``: the noop write — optimization + physical planning + codegen +
  the actual jobs.
- ``jobs``: Spark job count consumed by one rep (scheduler floor ≈ 15-30 ms
  per job under the lean profile; a 10-job op pays it 10×).

Usage: python tools/floor_profile.py [sf_dir] op [op ...]
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.1"
    ops = [a for a in sys.argv[1:] if not os.path.isdir(a)]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from sparkmerge.queries import registry, table_path
    from sparkmerge.session import get_spark

    input_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    )
    spark = get_spark("floor-profile", input_bytes=input_bytes)
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        table_path(sf_dir, t)
    # session warmup outside all timings (bench.py pre-warm discipline)
    reg["tpch_q6"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    st = spark.sparkContext.statusTracker()
    print(f"{'op':34s} {'construct':>9s} {'exec':>8s} {'total':>8s} {'jobs':>5s}")
    for op in ops:
        spec = reg[op]
        # discovery rep (untimed) so codegen/JIT for this plan shape settles
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cons, exes, jobs = [], [], []
        for _ in range(5):
            j0 = len(st.getJobIdsForGroup(None) or []) or 0
            ids0 = set(st.getJobIdsForGroup())
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            ids1 = set(st.getJobIdsForGroup())
            cons.append(t1 - t0)
            exes.append(t2 - t1)
            jobs.append(len(ids1 - ids0))
        cons.sort(); exes.sort(); jobs.sort()
        print(
            f"{op:34s} {cons[2]:9.3f} {exes[2]:8.3f} "
            f"{cons[2]+exes[2]:8.3f} {jobs[2]:5d}"
        )


if __name__ == "__main__":
    main()
