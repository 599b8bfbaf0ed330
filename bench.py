"""bench.py — engine throughput vs the DuckDB baseline (BASELINE.md protocol).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "headline_query_wall_clock", "value": <total sec>,
     "unit": "sec", "queries": {<op_id>: sec, ...}, "sf": <sf>,
     "duckdb": {<op_id>: sec, ...}, "ratio_vs_duckdb": <total ratio>}

Per query: one untimed warm-up run then one timed run, identically for both
engines.  Spark materialization uses the noop sink (full execution, no
driver-side row transfer); DuckDB fetches arrow (its native materialization).
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

HEADLINE = [
    "merge_full",
    "softdelete_unmatched",  # full merge apply incl. soft-delete branch
    "badkey_rank",
    "output_audit",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "dedup_exact",
    "dedup_minhash",
    "join_asof",
    "topk_similarity",
    "text_stats",
    "text_fingerprint",
    "pipeline_training_mix",
    "json_extract_props",
    "window_tumbling",
    "window_session",
    "text_repetition",
    "pipeline_sequence_pack",
    "pipeline_quality_filter",
    "tpch_q9_style",
    "tpch_q21_style",
    # set-similarity joins: Spark runs prefix-filtered candidate generation,
    # the DuckDB oracle runs the quadratic all-pairs formulation — identical
    # output, and the algorithmic win is the point of the engine at scale
    "dedup_ngram_jaccard",
    "dedup_containment",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from sparkmerge.queries import registry
    from sparkmerge.session import get_spark

    input_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    )
    spark = get_spark("sparkmerge-bench", input_bytes=input_bytes)
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()

    def run_spark(op_id: str) -> float:
        reg[op_id].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm-up
        times = []
        for _ in range(5):
            df = reg[op_id].fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        return sorted(times)[2]  # median of 5 (codegen/JIT settles after run 1)

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    def run_duck(op_id: str) -> float | None:
        sql = reg[op_id].oracle
        if sql is None:
            return None
        con.sql(sql).arrow()  # warm-up
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            con.sql(sql).arrow()
            times.append(time.perf_counter() - t0)
        return sorted(times)[2]

    spark_times: dict[str, float] = {}
    duck_times: dict[str, float] = {}
    for op_id in HEADLINE:
        spark_times[op_id] = round(run_spark(op_id), 4)
        d = run_duck(op_id)
        if d is not None:
            duck_times[op_id] = round(d, 4)

    total = round(sum(spark_times.values()), 4)
    duck_total = sum(duck_times.values())
    comparable = sum(spark_times[k] for k in duck_times)
    out = {
        "metric": "headline_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": spark_times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "duckdb": duck_times,
        "ratio_vs_duckdb": round(comparable / duck_total, 3) if duck_total else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
