"""Scale-profile runner for bench.py's sf10 leg (one JSON line on stdout).

bench.py's own session is built with the LEAN profile (its sf0.1 input
hint): shuffle/broadcast compression OFF — core confs, fixed at session
start, that the leg's dynamic SQL-conf flip cannot reach.  At sf10 the
shuffle payload is GBs, and uncompressed shuffle I/O degraded
dedup_minhash 13 s → 214 s in the in-process leg.  This runner builds a
fresh SCALE-profile session (no input hint: AQE on, compression on,
32 shuffle partitions) and runs the same budgeted protocol, so the
committed artifact measures the posture a real sf10 job would run.

Three sub-blocks (r8 verdict ask #4 made breadth a committed BENCH
artifact, not a SCALING.md-only story), ordered cheap-first so budget
exhaustion only ever costs the heavy tail's later rows:

- ``breadth``: ~8 scale-safe ops spanning merge/agg/window/graph/text —
  the ~1× amortization story;
- ``levers``: the registered 100 TB parameter surfaces (the two
  ``blocking='lsh'`` set-similarity routes) — Spark-only rows (the lever
  paths are xxhash64-based; their DEFAULT paths remain the oracle
  surface, measured in the tail);
- ``tail``: the heavy exact shapes (SF10_OPS), budget-guarded entry.

Usage: PYTHONPATH=/root/repo python tools/bench_sf10_runner.py [sf10_dir]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

import duckdb


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench  # SF10_OPS / SF10_BREADTH / SF10_ORACLE_SKIP / TABLES are the contract

    from sparkmerge.queries import registry, table_path
    from sparkmerge.session import get_spark

    sf10_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkmerge_sf10"
    # Per-BLOCK budgets, each measured from its own block start (r9 verdict
    # ask #2: the r9 global budget spent itself on throttled breadth+levers
    # runs and silently dropped 8 tail ops including merge_full/tpch_q5 —
    # the merge-at-scale evidence.  A protected tail slice means a bad host
    # day costs breadth rows, never the headline merge story).
    breadth_budget = float(os.environ.get("SPARK_GRAFT_SF10_BREADTH_BUDGET", "360"))
    levers_budget = float(os.environ.get("SPARK_GRAFT_SF10_LEVERS_BUDGET", "300"))
    tail_budget = float(os.environ.get("SPARK_GRAFT_SF10_TAIL_BUDGET", "1800"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    spark = get_spark("bench-sf10")  # scale profile: AQE on, compression on
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={cpus}")
    # cap DuckDB spill so a runaway oracle errors fast (caught per-op)
    # instead of ENOSPC-ing the host — the pre-r8-fix failure mode
    con.execute("SET temp_directory='/tmp/duckdb_sf10_tmp'")
    con.execute("SET max_temp_directory_size='40GiB'")
    for t in bench.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf10_dir}/{t}.parquet')"
        )
    for t in bench.TABLES:  # pre-warm read-optimized rewrites outside timings
        table_path(sf10_dir, t)

    # UNTIMED session warmup (r12, the merge_sparse_patch artifact
    # contradiction): the first job of a fresh session pays ~10 s of pure
    # warmup on this host (JIT/codegen compile, parquet + noop sink
    # classloading, shuffle infra init, page-cache first touch) — measured
    # 11.4 s for a trivial scan+agg+noop job vs sub-second steady-state.
    # Under the old protocol that cost landed entirely in the FIRST op's
    # row, and because a >=10 s first reading was returned un-repeated,
    # merge_sparse_patch (first in breadth) committed 20-25 s cold against
    # a 3.7-3.9 s steady state.  One representative untimed job absorbs
    # the session-generic share before any timed row.
    from pyspark.sql import functions as F

    (
        spark.read.parquet(table_path(sf10_dir, "orders"))
        .groupBy((F.col("o_orderkey") % 64).alias("b"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    gc.collect()
    spark.sparkContext._jvm.System.gc()

    def timed(run, pre=None) -> float:
        # pre() runs OUTSIDE every timer — Spark runs release leftover
        # localCheckpoint blocks here (bench._release_checkpoint_blocks,
        # r12 measurement-hygiene fix; the gc.collect() between ops only
        # releases blocks ASYNCHRONOUSLY via the ContextCleaner)
        if pre is not None:
            pre()
        t0 = time.perf_counter()
        run()
        warm = time.perf_counter() - t0
        if warm >= 60:
            # genuinely heavy: one rep — per-plan warmup share is noise at
            # this magnitude, and a second rep would blow the block budget
            return warm
        n = 1 if warm >= 10 else 3 if warm >= 2 else 5
        if n == 1:
            # 10-60 s band: the first reading still carries the op's OWN
            # cold costs (whole-stage-codegen compile for this plan shape,
            # first touch of its input files) even after session warmup —
            # the r11 committed artifact read merge_sparse_patch at 24.8 s
            # against a 3.7 s steady state this way.  One more rep; min is
            # the steady-state estimator when one sample is cold-biased.
            if pre is not None:
                pre()
            t0 = time.perf_counter()
            run()
            return min(warm, time.perf_counter() - t0)
        times = []
        for _ in range(n):
            if pre is not None:
                pre()
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        return sorted(times)[n // 2]

    reg = registry()

    def measure(entries, block_budget: float) -> dict:
        """One leg block.  ``entries``: list of (label, op_id, fn_kwargs);
        oracle runs for kwargs-free entries only (a kwargs variant is a
        Spark-side lever whose default path carries the oracle).  The
        budget window is BLOCK-LOCAL (guards entry, not duration)."""
        t_start = time.perf_counter()

        def over_budget() -> bool:
            return time.perf_counter() - t_start > block_budget

        spark_times: dict[str, float] = {}
        duck_times: dict[str, float] = {}
        skipped: list[str] = []
        oracle_skipped: list[str] = []
        errors: dict[str, str] = {}
        for label, op_id, kwargs in entries:
            if over_budget():
                skipped.append(label)
                continue
            spec = reg[op_id]
            # failure-isolated per op AND per side: one runaway query costs
            # its own row, never the whole leg
            try:
                spark_times[label] = round(
                    timed(
                        lambda: spec.fn(spark, sf10_dir, **kwargs)
                        .write.format("noop")
                        .mode("overwrite")
                        .save(),
                        pre=lambda: bench._release_checkpoint_blocks(spark),
                    ),
                    4,
                )
            except Exception as e:  # noqa: BLE001 — recorded, not hidden
                errors[label] = f"spark: {type(e).__name__}: {e}"[:200]
                continue
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            if kwargs or op_id in bench.SF10_ORACLE_SKIP:
                oracle_skipped.append(label)
            elif spec.oracle is not None and not over_budget():
                try:
                    duck_times[label] = round(
                        timed(lambda: con.sql(spec.oracle).arrow()), 4
                    )
                except Exception as e:  # noqa: BLE001
                    errors[label] = f"duckdb: {type(e).__name__}: {e}"[:200]
        comparable = sum(spark_times[k] for k in duck_times)
        duck_total = sum(duck_times.values())
        block = {
            "queries": spark_times,
            "duckdb": duck_times,
            "ratio_vs_duckdb": round(comparable / duck_total, 3) if duck_total else None,
            "skipped": skipped,
            "oracle_skipped": oracle_skipped,
        }
        if errors:
            block["errors"] = errors
        return block

    out = {
        "sf": 10,
        "budget_sec": {
            "breadth": breadth_budget,
            "levers": levers_budget,
            "tail": tail_budget,
        },
        # cheap-first ordering retained, but every block now has its OWN
        # protected budget window — breadth/levers overruns can no longer
        # starve the tail (the merge-at-scale evidence)
        "breadth": measure([(op, op, {}) for op in bench.SF10_BREADTH], breadth_budget),
        "levers": measure(
            [
                (f"{op}[lsh]", op, {"blocking": "lsh"})
                for op in ("dedup_ngram_jaccard", "dedup_containment")
            ],
            levers_budget,
        ),
        "tail": measure([(op, op, {}) for op in bench.SF10_OPS], tail_budget),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
