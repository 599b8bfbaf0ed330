"""Session-aging probe (r12 verdict ask #4): run a long op sequence in ONE
session and record per-op JVM state, to NAME the mechanism behind the
embedded-vs-solo slowdown (r12: basket's collect_set build read 24-27 s in
an aged session vs 9-11 s warm-solo; storage pool, heap size and page cache
were ruled out by measurement; "session aging" was the residual label).

Candidate mechanisms this instruments directly:
- GC pressure: per-collector collection count/time deltas per op;
- JIT code cache exhaustion: CodeHeap pool usage (a full code cache
  disables the compiler — the classic long-session slowdown for codegen-
  heavy Spark sessions: every new whole-stage-codegen class competes for
  the 240 MB default ReservedCodeCacheSize);
- Metaspace / loaded-class growth (generated classes accumulate);
- direct/mapped buffer pools (off-heap accumulation);
- thread count (leaked pools).

Usage: python tools/aging_probe.py <sf_dir> op[:k=v,...] [op ...]
Prints one JSON line per op run: {"op":..., "sec":..., "jvm": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def jvm_state(spark) -> dict:
    jvm = spark._jvm
    mf = jvm.java.lang.management.ManagementFactory
    out: dict = {}
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    out["heap_used_mb"] = heap.getUsed() // (1024 * 1024)
    out["heap_committed_mb"] = heap.getCommitted() // (1024 * 1024)
    gc_count, gc_ms = 0, 0
    for b in mf.getGarbageCollectorMXBeans():
        gc_count += b.getCollectionCount()
        gc_ms += b.getCollectionTime()
    out["gc_count"] = gc_count
    out["gc_time_ms"] = gc_ms
    for pool in mf.getMemoryPoolMXBeans():
        name = pool.getName()
        if "CodeHeap" in name or name in ("Metaspace", "Compressed Class Space"):
            u = pool.getUsage()
            key = name.replace("CodeHeap '", "code_").replace("'", "").replace(
                " ", "_"
            ).lower()
            out[f"{key}_used_mb"] = round(u.getUsed() / (1024 * 1024), 1)
            out[f"{key}_max_mb"] = round(u.getMax() / (1024 * 1024), 1)
    cls = mf.getClassLoadingMXBean()
    out["classes_loaded"] = cls.getLoadedClassCount()
    out["threads"] = mf.getThreadMXBean().getThreadCount()
    for bp in mf.getPlatformMXBeans(
        jvm.java.lang.Class.forName("java.lang.management.BufferPoolMXBean")
    ):
        out[f"buf_{bp.getName()}_mb"] = bp.getMemoryUsed() // (1024 * 1024)
    comp = mf.getCompilationMXBean()
    out["jit_total_ms"] = comp.getTotalCompilationTime()
    return out


def main() -> None:
    sf_dir = sys.argv[1]
    specs = []
    for arg in sys.argv[2:]:
        if ":" in arg:
            op, kv = arg.split(":", 1)
            kwargs = dict(p.split("=", 1) for p in kv.split(","))
        else:
            op, kwargs = arg, {}
        specs.append((arg, op, kwargs))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from sparkmerge.queries import registry, table_path
    from sparkmerge.session import get_spark

    input_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    )
    spark = get_spark("aging-probe", input_bytes=input_bytes)
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        table_path(sf_dir, t)

    def release(spark):
        try:
            for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                jrdd.unpersist(True)
        except Exception:
            pass

    print(json.dumps({"op": "__session_start__", "jvm": jvm_state(spark)}), flush=True)
    for label, op, kwargs in specs:
        release(spark)
        spark.sparkContext.setJobDescription(f"aging-probe: {label}")
        t0 = time.perf_counter()
        reg[op].fn(spark, sf_dir, **kwargs).write.format("noop").mode(
            "overwrite"
        ).save()
        sec = time.perf_counter() - t0
        print(
            json.dumps({"op": label, "sec": round(sec, 3), "jvm": jvm_state(spark)}),
            flush=True,
        )


if __name__ == "__main__":
    main()
