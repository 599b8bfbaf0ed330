"""bench.py — engine throughput vs the DuckDB baseline (BASELINE.md protocol).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "headline_query_wall_clock", "value": <total sec>,
     "unit": "sec", "queries": {<op_id>: sec, ...}, "sf": <sf>,
     "duckdb": {<op_id>: sec, ...}, "ratio_vs_duckdb": <total ratio>}

Per query: one warm-up run then the median of 5 timed runs, identically for
both engines.  Spark materialization uses the noop sink (full execution, no
driver-side row transfer); DuckDB fetches arrow (its native materialization).

Repeats adapt to query weight so the protocol stays usable at larger SFs
(the sf1 scaling column, BASELINE.md): a query whose warm-up exceeds 10 s
records that single run; over 2 s, median of 3.  At sf0.1 every headline
query warms up in <2 s, so the driver-run protocol is unchanged (median 5).

When run at the default sf0.1 dir, a second leg re-measures the headline
set at sf1 (~170 MiB, derived from sf0.1 by tools/gen_scale.py — key-offset
replication, see its docstring) and embeds it under "sf1" in the same JSON
line.  The job floor that dominates sub-100 ms queries at sf0.1 amortizes
at sf1, which is the point of recording both (BASELINE.md round-4 section).
The leg is wall-clock-budgeted (SPARK_GRAFT_SF1_BUDGET sec, default 420;
SPARK_GRAFT_SF1=0 disables) and failure-isolated, so the primary sf0.1
output line is never at risk.  (Default raised 420 -> 540 round 9 — a ~1.3x-slower
host session budget-skipped four entries; earlier: raised 360 -> 420 late round 8:
the explode-alias fix freed ~12 s of leg time and HEADLINE grew by two
entries — the old budget expired exactly before the three newest ops,
which were the only per-round bench blind spot.)

A third leg (r7 verdict ask #6) embeds sf10 (~1.7 GiB) under "sf10" with
THREE sub-blocks (r8 verdict ask #4): "breadth" (~8 scale-safe ops
spanning merge/agg/window/graph/text — the ~1× amortization story, now a
committed BENCH artifact instead of a SCALING.md-only table), "levers"
(the registered blocking='lsh' 100 TB routes, Spark-only rows), and
"tail" (the heaviest exact shapes: job floors amortize, the
set-similarity ops go superlinear as their blocking keys densify — their
certifier oracles are infeasible at this SF, so Spark completing them at
all is the measurement).  Each block has its OWN protected budget window
(SPARK_GRAFT_SF10_{BREADTH,LEVERS,TAIL}_BUDGET sec, defaults 360/300/1800
— r9's single shared budget let throttled breadth+levers runs silently
drop 8 tail ops including merge_full; SPARK_GRAFT_SF10=0 disables), cheap
blocks run first, quadratic certifier oracles never run, and both heaps
are collected between ops (the r7 sf10 OOM lesson).

The FIRST stdout line is a compact one-line JSON summary (per-leg totals
+ ratios + skip lists) so the driver's bounded output capture always
retains the headline numbers even when the full result line's tail is
truncated (r8 verdict ask #6 — BENCH_r08.json lost its sf0.1 block that
way); the complete result remains the LAST line, and BENCH_LOCAL.json
carries it verbatim as a committed artifact.
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
    # the two most expensive real ops (r4 verdict ask #5): a regression in
    # either must show in BENCH, not only in SCALING.md
    # (graph_cooccurrence_edges runs the capped builder since r6)
    "graph_cooccurrence_edges",
    "bitext_margin_mine",
    # r6 additions: the sparse-patch merge mode and the single-shuffle funnel
    "merge_sparse_patch",
    "events_funnel_steps",
    # r6 batch 3: the basket pair join and the bounded k-core peel (the two
    # heaviest new shapes — iterative semi-join rounds and a keyed self-join)
    "orders_basket_lift",
    "graph_kcore_peel",
    # r7 additions: the recency-dedup merge mode and the shingle-keyed
    # cross-source overlap (the heaviest new r7 shape — ~8 s at sf1)
    "merge_upsert_latest",
    "dedup_cross_source_matrix",
    # r8 additions: the two heaviest new r8 shapes — the shingle-keyed
    # novelty decomposition (~9 s at sf1) and the calendar-join MASE rollup
    "text_shingle_novelty_curve",
    "orders_seasonal_naive_mase",
    # r8 batch 7-9: the two heaviest late-round shapes — the sentinel-token
    # brand-audience Jaccard (two shuffle joins + customer-grain distinct +
    # bounded pair fan-out) and the 4-join bilateral trade lattice
    "orders_brand_audience_jaccard",
    "orders_nation_trade_matrix",
]

# sf1-leg exclusions with recorded reasons (the budget guards entry, not
# duration — an op whose single run approaches the whole budget would starve
# the rest of the leg).  Standalone sf1 numbers live in SCALING.md.
SF1_SKIP = {
    "bitext_margin_mine": "~140 s Spark / ~179 s oracle at sf1 (SCALING.md) — "
    "one run would consume the whole SPARK_GRAFT_SF1_BUDGET; measured "
    "instead as a single warm run under sf1.receipts (r8 verdict ask #5)",
}

# r12 verdict ask #5 (silent sf1 starvation): the sf1 leg runs CHEAPEST
# FIRST, ordered by the last-known committed sf1 seconds (the r12
# quiet-host BENCH_LOCAL.json cut at the r13 HEAD), so a loaded host that exhausts the
# budget skips only the few most expensive rows — which all have receipts
# elsewhere (sf10 tail/levers, SCALING.md) — instead of whatever happens
# to be last in HEADLINE registration order (the r12 driver leg silently
# dropped its two last-ordered ops that way).  Values from the r13
# canonical 32-core quiet-host cut (the r12-committed file turned out
# to be the driver's 8-core leftover — see OPTIMIZATION_r13.md).  Ops absent from the map
# (new headliners) sort FIRST so they always get measured.  This is a
# measurement-ORDER hint only: every op still runs the identical protocol.
_SF1_LAST_KNOWN_SEC = {
    "tpch_q6": 0.131,
    "dedup_exact": 0.245,
    "window_tumbling": 0.260,
    "pipeline_sequence_pack": 0.287,
    "json_extract_props": 0.305,
    "tpch_q1": 0.337,
    "window_session": 0.421,
    "text_fingerprint": 0.508,
    "text_stats": 0.557,
    "join_asof": 0.626,
    "badkey_rank": 0.650,
    "topk_similarity": 0.657,
    "graph_cooccurrence_edges": 0.722,
    "output_audit": 0.769,
    "pipeline_quality_filter": 0.788,
    "orders_seasonal_naive_mase": 0.789,
    "softdelete_unmatched": 0.793,
    "tpch_q3": 0.888,
    "merge_full": 0.894,
    "text_repetition": 0.895,
    "merge_sparse_patch": 0.923,
    "tpch_q5": 0.929,
    "pipeline_training_mix": 0.940,
    "events_funnel_steps": 0.967,
    "tpch_q9_style": 0.980,
    "tpch_q21_style": 1.048,
    "orders_nation_trade_matrix": 1.152,
    "merge_upsert_latest": 1.374,
    "text_shingle_novelty_curve": 1.483,
    "dedup_cross_source_matrix": 2.145,
    "dedup_containment": 2.295,
    "orders_brand_audience_jaccard": 2.827,
    "graph_kcore_peel": 3.081,
    "dedup_ngram_jaccard": 3.301,
    "orders_basket_lift": 3.430,
    "dedup_minhash": 6.271,
}

# Spark-only single-run receipts appended to the sf1 leg AFTER the main
# loop, under their own budget extension (SPARK_GRAFT_SF1_RECEIPT_BUDGET,
# default 200 s): ops too heavy for the repeat protocol but too important
# to stay unmeasured round over round (r8 verdict ask #5 — bitext was the
# one never-measured headline op).  Warm run only, no oracle.
SF1_RECEIPTS = ["bitext_margin_mine"]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _release_checkpoint_blocks(spark) -> None:
    """Unpersist leftover localCheckpoint blocks BETWEEN timed runs (guide
    §1.2 — isolate the measured computation; r12 measurement-bug fix,
    disclosed in OPTIMIZATION_r12.md).  Ops that eagerly checkpoint a
    bounded intermediate persist executor blocks that outlive the rep's
    Python handles — the JVM-side release is asynchronous and GC-driven —
    so a long leg accumulates earlier queries' dead blocks and LATER
    queries read slower under block-manager pressure (measured in the r12
    round-close run: five checkpoint-adjacent ops late in the sf0.1
    alphabet read 1.5-2.9× their fresh-session solo medians; identical
    code, identical inputs).  This call releases state only — it runs
    OUTSIDE every timer, and every timed rep still recomputes from the
    parquet inputs; nothing is cached or precomputed across runs."""
    try:
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist(True)
    except Exception:
        pass  # measurement hygiene must never fail the bench


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

    # Pre-warm OUTSIDE any timing: the read-optimized table rewrites and the
    # session's first-job JIT/codegen otherwise land inside the FIRST op's
    # warm-up, and when that pushes it over 10 s the adaptive protocol
    # records the contaminated run (merge_full read 18.6 s vs its steady
    # ~1.5 s in an r9 run).  The sf1 leg has documented this same trap since
    # round 4; the primary leg now applies the same discipline.
    from sparkmerge.queries import table_path

    for t in TABLES:
        table_path(sf_dir, t)
    reg["tpch_q6"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def _repeats(warmup_sec: float) -> int:
        return 1 if warmup_sec >= 10 else 3 if warmup_sec >= 2 else 5

    def run_spark(op_id: str) -> float:
        _release_checkpoint_blocks(spark)  # outside the timer
        t0 = time.perf_counter()
        reg[op_id].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm-up
        warm = time.perf_counter() - t0
        n = _repeats(warm)
        if n == 1:
            return warm
        times = []
        for _ in range(n):
            _release_checkpoint_blocks(spark)  # outside the timer
            # construction INSIDE the timer: Catalyst analysis is a real
            # per-query cost, and ops that eagerly localCheckpoint a reused
            # intermediate (graph family, bitext) do that work at
            # construction — timing only the write would silently exclude
            # it (caught r6: bitext read 0.1 s while really costing ~7 s).
            # scaling_report.py always measured construction+write; this
            # aligns the two protocols.
            t0 = time.perf_counter()
            reg[op_id].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        return sorted(times)[n // 2]  # median (codegen/JIT settles after run 1)

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    def run_duck(op_id: str) -> float | None:
        sql = reg[op_id].oracle
        if sql is None:
            return None
        t0 = time.perf_counter()
        con.sql(sql).arrow()  # warm-up
        warm = time.perf_counter() - t0
        n = _repeats(warm)
        if n == 1:
            return warm
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            con.sql(sql).arrow()
            times.append(time.perf_counter() - t0)
        return sorted(times)[n // 2]

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

    if sf == "0.1" and os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        try:
            out["sf1"] = _sf1_leg(spark, reg)
        except Exception as e:  # never risk the primary output line
            out["sf1"] = {"error": f"{type(e).__name__}: {e}"}

    if sf == "0.1" and os.environ.get("SPARK_GRAFT_SF10", "1") != "0":
        try:
            # the sf10 leg is the LAST measurement and runs in its own
            # subprocess session — stop the parent JVM first so the leg
            # doesn't compete with a resident 32-thread session for
            # memory/page cache (measured: the in-bench leg read the lever
            # ops 2.8x slower than the identical solo runner, r9)
            spark.stop()
            out["sf10"] = _sf10_leg(spark, reg)
        except Exception as e:  # never risk the primary output line
            out["sf10"] = {"error": f"{type(e).__name__}: {e}"}

    # Self-containment (r8 verdict ask #6): the driver's bounded capture
    # truncates the TAIL of long output — BENCH_r08.json lost the sf0.1
    # headline block that way.  Emit a compact per-leg summary as the FIRST
    # line so totals/ratios/skip-lists always survive; the complete result
    # stays the LAST line (existing consumers parse the last line).
    print(json.dumps(_summary_line(out)), flush=True)

    # The driver records only a bounded tail of stdout, which truncated the
    # r4 per-query numbers out of BENCH_r04.json (r4 verdict ask #3).  Write
    # the complete machine-readable result as its own committed artifact too.
    artifact = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json")
    try:
        with open(artifact, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError:
        pass  # read-only checkout must not break the contract line

    print(json.dumps(out))


def _summary_line(out: dict) -> dict:
    """Compact one-line digest of the full result: per-leg totals, ratios,
    and skip lists — everything the judge needs even if only the first
    captured line survives."""
    s = {
        "bench_summary": True,
        "sf": out.get("sf"),
        "total_sec": out.get("value"),
        "ratio_vs_duckdb": out.get("ratio_vs_duckdb"),
        "n_queries": len(out.get("queries", {})),
    }
    sf1 = out.get("sf1")
    if isinstance(sf1, dict):
        if "error" in sf1:
            s["sf1"] = {"error": sf1["error"]}
        else:
            s["sf1"] = {
                "total_sec": round(sum(sf1.get("queries", {}).values()), 2),
                "ratio_vs_duckdb": sf1.get("ratio_vs_duckdb"),
                "skipped": sf1.get("skipped", []),
            }
    sf10 = out.get("sf10")
    if isinstance(sf10, dict):
        if "error" in sf10:
            s["sf10"] = {"error": sf10["error"]}
        else:
            s["sf10"] = {
                sub: {
                    "total_sec": round(sum(blk.get("queries", {}).values()), 2),
                    "ratio_vs_duckdb": blk.get("ratio_vs_duckdb"),
                    "skipped": blk.get("skipped", []),
                }
                for sub, blk in sf10.items()
                if isinstance(blk, dict)
            }
    return s


def _oracle_with_budget(con, sql: str, remaining: float) -> float | None:
    """Run one DuckDB oracle under a wall-clock budget on a SHARED connection.

    Returns elapsed seconds, or ``None`` if the watchdog interrupted it past
    the budget.  ADVICE r10 hardening: the watchdog sets a ``fired`` flag
    BEFORE calling ``con.interrupt()``, so (a) a genuinely failing oracle
    re-raises instead of being swallowed as a budget skip, and (b) an
    interrupt that lands AFTER the query completed (the completes-before-
    ``done.set()`` race) is detected and absorbed with a throwaway statement
    so the pending cancellation cannot kill the next caller's query."""
    import threading

    done = threading.Event()
    fired = threading.Event()

    def watchdog():
        if not done.wait(timeout=max(remaining, 1.0)):
            fired.set()
            con.interrupt()

    w = threading.Thread(target=watchdog, daemon=True)
    w.start()
    t0 = time.perf_counter()
    elapsed = None
    swallowed: Exception | None = None
    try:
        con.sql(sql).arrow()
        elapsed = time.perf_counter() - t0
    except Exception as e:
        if not fired.is_set():
            done.set()
            raise  # real oracle failure, not a budget interrupt
        # ADVICE r11: a genuine failure racing the deadline lands here too —
        # record it (visible on stderr, not silently dropped) so a real
        # failure coinciding with the budget stays diagnosable.
        swallowed = e
    finally:
        done.set()
        w.join(timeout=5)
    if fired.is_set():
        # ADVICE r11: absorb on BOTH outcomes.  When the query completed
        # (elapsed set) the interrupt may still be pending; when it raised,
        # the interrupt may equally have landed after DuckDB unwound (e.g.
        # a real error racing the deadline) — either way the cancellation
        # must not survive into the next caller's query on this shared
        # connection.
        try:
            con.sql("SELECT 1").fetchall()
        except Exception:
            pass
    if swallowed is not None:
        print(
            f"oracle budget-skip absorbed an exception: "
            f"{type(swallowed).__name__}: {swallowed}"[:300],
            file=sys.stderr,
        )
    return elapsed


def _sf1_leg(spark, reg) -> dict:
    """Re-measure the headline set at sf1 inside the same session.

    The session was built with the lean profile (input_bytes = sf0.1); the
    confs that matter for the 10× leg — shuffle parallelism, AQE, split
    size — are dynamic SQL confs, so flip them to the scale profile for the
    leg and restore after.  Budgeted: once SPARK_GRAFT_SF1_BUDGET seconds
    (default 540 — see the module header) have elapsed, remaining queries
    are recorded as skipped.
    """
    import subprocess

    sf1_dir = "/tmp/sparkmerge_sf1"
    if not os.path.isdir(sf1_dir):
        subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "gen_scale.py")],
            check=True,
            capture_output=True,
            # a wedged generation must fail into the leg's error path, not
            # stall the whole bench unboundedly (ADVICE r8); measured gen
            # is ~40 s, so 600 s is pure headroom
            timeout=600,
        )
    budget = float(os.environ.get("SPARK_GRAFT_SF1_BUDGET", "540"))
    t_start = time.perf_counter()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.shuffle.partitions",
            "spark.sql.adaptive.enabled",
            "spark.sql.files.maxPartitionBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={cpus}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf1_dir}/{t}.parquet')")

    # Pre-warm the read-optimized table cache OUTSIDE any timing: the first
    # query touching a table at sf1 otherwise pays the one-time row-group
    # rewrite inside its warm-up — and when that pushes the warm-up over
    # 10 s, the adaptive protocol records the warm-up itself (this is
    # exactly how BENCH's embedded leg once read topk_similarity at 10.3 s
    # vs 1.2 s under the standalone protocol; BASELINE.md round-4 final).
    from sparkmerge.queries import table_path

    for t in TABLES:
        table_path(sf1_dir, t)

    def timed(run, pre=None) -> float:
        # pre() runs OUTSIDE every timer — the Spark runs pass the
        # checkpoint-block release here (see _release_checkpoint_blocks)
        if pre is not None:
            pre()
        t0 = time.perf_counter()
        run()
        warm = time.perf_counter() - t0
        n = 1 if warm >= 10 else 3 if warm >= 2 else 5
        if n == 1:
            return warm
        times = []
        for _ in range(n):
            if pre is not None:
                pre()
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        return sorted(times)[n // 2]

    spark_times: dict[str, float] = {}
    duck_times: dict[str, float] = {}
    skipped: list[str] = []
    oracle_skipped: list[str] = []
    # cheapest-first (r12 verdict ask #5 — see _SF1_LAST_KNOWN_SEC); sort is
    # stable, so unmapped ops keep HEADLINE order among themselves
    sf1_order = sorted(HEADLINE, key=lambda op: _SF1_LAST_KNOWN_SEC.get(op, 0.0))
    try:
        for op_id in sf1_order:
            if op_id in SF1_SKIP:
                continue  # reason recorded under "skipped_expensive" below
            if time.perf_counter() - t_start > budget:
                skipped.append(op_id)
                continue
            spec = reg[op_id]
            spark_times[op_id] = round(
                timed(
                    lambda: spec.fn(spark, sf1_dir).write.format("noop").mode("overwrite").save(),
                    pre=lambda: _release_checkpoint_blocks(spark),
                ),
                4,
            )
            # The two set-similarity oracles are all-pairs (quadratic) in
            # DuckDB: ~10 min EACH at sf1 (measured, BASELINE.md round-4
            # section), and the budget guards entry, not duration — never
            # run them here; the standalone sf1 runs record them.
            if op_id in ("dedup_ngram_jaccard", "dedup_containment"):
                oracle_skipped.append(op_id)
            elif spec.oracle is not None and time.perf_counter() - t_start <= budget:
                duck_times[op_id] = round(timed(lambda: con.sql(spec.oracle).arrow()), 4)
        # single-warm-run receipts for the ops too heavy for the repeat
        # protocol — their own budget extension so they never starve the
        # main loop and the main loop never starves them
        receipts: dict[str, float] = {}
        receipts_duckdb: dict[str, float] = {}
        receipt_budget = float(os.environ.get("SPARK_GRAFT_SF1_RECEIPT_BUDGET", "200"))
        r_start = time.perf_counter()
        for op_id in SF1_RECEIPTS:
            if time.perf_counter() - r_start > receipt_budget:
                break
            _release_checkpoint_blocks(spark)  # outside the timer
            t0 = time.perf_counter()
            reg[op_id].fn(spark, sf1_dir).write.format("noop").mode("overwrite").save()
            receipts[op_id] = round(time.perf_counter() - t0, 4)
        # DuckDB comparator for the receipts (r9 verdict ask #8: the
        # heaviest headline op reported a wall clock but no ratio).  The
        # bitext oracle is LSH-shaped, not all-pairs — ~260 s at sf1
        # (SCALING.md) — so ONE warm run is affordable under its own
        # budget slice and the committed artifact gains a ratio.  The
        # budget guards DURATION here, not just entry: one such oracle
        # run was measured at 1517 s under a round-10 host load burst,
        # so a watchdog thread interrupts DuckDB at the budget and the
        # row is simply skipped (the receipt keeps its Spark wall clock).
        oracle_budget = float(os.environ.get("SPARK_GRAFT_SF1_RECEIPT_ORACLE_BUDGET", "420"))
        o_start = time.perf_counter()
        for op_id in receipts:
            if time.perf_counter() - o_start > oracle_budget:
                break
            if reg[op_id].oracle is None:
                continue
            remaining = oracle_budget - (time.perf_counter() - o_start)
            elapsed = _oracle_with_budget(con, reg[op_id].oracle, remaining)
            if elapsed is not None:
                receipts_duckdb[op_id] = round(elapsed, 4)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)

    comparable = sum(spark_times[k] for k in duck_times)
    duck_total = sum(duck_times.values())
    return {
        "sf": 1,
        "queries": spark_times,
        "duckdb": duck_times,
        "ratio_vs_duckdb": round(comparable / duck_total, 3) if duck_total else None,
        "skipped": skipped,
        "oracle_skipped": oracle_skipped,
        "skipped_expensive": SF1_SKIP,
        "receipts": receipts,
        "receipts_duckdb": receipts_duckdb,
    }


# The ~10 heaviest headline ops (by the committed sf1 leg) — the set whose
# 100 TB amortization claim (sf0.1 job-floor domination → ~1× at sf10) must
# be a committed per-round BENCH artifact, not a separate tool run (r7
# verdict ask #6).  The full 34-op sf10 sweep stays in SCALING.md.
SF10_OPS = [
    "orders_basket_lift",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "graph_kcore_peel",
    "dedup_containment",
    "merge_upsert_latest",
    "tpch_q21_style",
    "topk_similarity",
    "tpch_q5",
    "merge_full",
    "dedup_cross_source_matrix",
]

# quadratic all-pairs certifier oracles — NEVER run at sf10 (~hours); the
# Spark side is the measurement, the algorithmic gap is the point.
# dedup_minhash joined the list by receipt: its banding SQL spills >40 GiB
# of DuckDB temp at sf10 (447 s before hitting a 40 GiB cap; uncapped it
# ENOSPC'd the host and killed the whole leg twice) — Spark's LSH plan
# completes the same corpus in ~79 s under the scale profile, which IS
# the measurement: the oracle cannot finish at all.
SF10_ORACLE_SKIP = {"dedup_ngram_jaccard", "dedup_containment", "dedup_minhash"}

# sf10 breadth block (r8 verdict ask #4): a fixed scale-safe subset spanning
# merge/agg/join/window/graph/funnel/text/dedup — none overlap SF10_OPS, all
# oracles are linear SQL, so the ~1.0× amortization aggregate that previously
# lived only in SCALING.md's sweep is a committed per-round BENCH artifact.
SF10_BREADTH = [
    "merge_sparse_patch",
    "tpch_q1",
    "tpch_q6",
    "agg_rollup_cube",
    "window_cumulative_share",
    "graph_degree_profile",
    "events_funnel_steps",
    "text_stats",
]


def _sf10_leg(spark, reg) -> dict:
    """Budgeted sf10 re-measure of the heaviest headline ops, in a
    SUBPROCESS scale-profile session (tools/bench_sf10_runner.py).

    bench's own session runs the LEAN profile for the sf0.1 corpus —
    shuffle/broadcast compression OFF, a core conf fixed at session start
    that the dynamic SQL-conf flip (the sf1 leg's trick) cannot reach.  At
    sf10 the shuffle payload is GBs and the uncompressed leg measured
    dedup_minhash at 214 s vs ~13 s under the scale profile, so the leg
    shells out to a fresh scale-profile session and parses its one-line
    JSON.  ``SPARK_GRAFT_SF10=0`` disables; per-block budgets
    ``SPARK_GRAFT_SF10_{BREADTH,LEVERS,TAIL}_BUDGET`` sec (defaults
    360/300/1800) enforced inside the runner, with a hard wall-clock
    backstop here.
    """
    import subprocess

    sf1_dir = "/tmp/sparkmerge_sf1"
    sf10_dir = "/tmp/sparkmerge_sf10"
    tools = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
    for src, dst, factor in (("/root/testdata/sf0.1", sf1_dir, 10), (sf1_dir, sf10_dir, 10)):
        if not all(os.path.exists(os.path.join(dst, f"{t}.parquet")) for t in TABLES):
            subprocess.run(
                [sys.executable, os.path.join(tools, "gen_scale.py"), src, dst, str(factor)],
                check=True,
                capture_output=True,
                # bound the generation like the runner itself: a hung
                # gen_scale otherwise stalls bench forever (ADVICE r8 —
                # the leg's wall-clock backstop only covered the runner);
                # sf10 gen measures ~2 min, so 900 s is headroom
                timeout=900,
            )
    # the runner budgets each of its three blocks separately (r9 verdict
    # ask #2 — protected tail slice); the backstop here covers their sum
    # plus last-admitted-op overruns
    budget = sum(
        float(os.environ.get(k, d))
        for k, d in (
            ("SPARK_GRAFT_SF10_BREADTH_BUDGET", "360"),
            ("SPARK_GRAFT_SF10_LEVERS_BUDGET", "300"),
            ("SPARK_GRAFT_SF10_TAIL_BUDGET", "1800"),
        )
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
    proc = subprocess.run(
        [sys.executable, os.path.join(tools, "bench_sf10_runner.py"), sf10_dir],
        capture_output=True,
        text=True,
        env=env,
        # generous backstop: budgets guard ENTRY inside the runner, so the
        # last-admitted op of each block may still run to completion past it
        timeout=budget * 2 + 600,
    )
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-3:]
        raise RuntimeError(f"sf10 runner exit {proc.returncode}: {' | '.join(tail)}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


if __name__ == "__main__":
    main()
