"""SparkSession builder with scale-oriented defaults.

Tuned for the driver's local[32] container but with settings that carry to a
real cluster: AQE on (runtime partition coalescing + skew-join splitting —
matters for badkey_rank windows over skewed keys), shuffle partitions sized to
the parallelism, Arrow enabled for the few pandas_udf paths (MinHash).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


# Below this input size the lean profile (8 partitions, AQE off) wins: every
# shuffle fits one task's memory and AQE's query-stage barriers plus idle-core
# scheduling cost more than they save (measured at sf0.1 ≈ 17 MiB).  Above it
# the work per task dominates the barrier cost and undersized parallelism
# throttles the box — measured at sf1 ≈ 177 MiB, where the lean profile pinned
# exactly 8 of 32 cores on the set-similarity joins.
_SMALL_INPUT_BYTES = 64 * 1024**2


def get_spark(
    app_name: str = "sparkmerge",
    *,
    shuffle_partitions: int | None = None,
    input_bytes: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    At 100 TB scale ``shuffle_partitions`` should be ~2-3x total executor
    cores; AQE coalesces the excess at runtime, so we set the static number
    from the local parallelism and let AQE do the rest.

    ``input_bytes`` (when the caller knows the workload size, e.g. bench.py
    sums its scale dir) switches a sub-``_SMALL_INPUT_BYTES`` workload to a
    lean profile: 8 shuffle partitions, AQE off.  AQE's per-query-stage
    materialization barrier costs more than it saves when every shuffle fits
    in one task's memory — measured 2× end-to-end at sf0.1 (BASELINE.md).
    The default (no hint) keeps the scale posture: AQE on.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    small = input_bytes is not None and input_bytes < _SMALL_INPUT_BYTES
    if shuffle_partitions is None:
        shuffle_partitions = 8 if small else cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "false" if small else "true")
        # Lean-profile scheduler trims (measured ~30 ms/job → ~15 ms/job on
        # trivial jobs): locality wait is meaningless in local mode, and
        # compressing KB-sized shuffle/broadcast payloads costs more than the
        # bytes saved.  At real scale both defaults are correct — compression
        # pays for itself on network-bound shuffles — so the big profile
        # keeps them.
        .config("spark.locality.wait", "0" if small else "3s")
        .config("spark.shuffle.compress", "false" if small else "true")
        .config("spark.broadcast.compress", "false" if small else "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # keep catalog-table data (bucketed tables) out of the repo cwd
        .config("spark.sql.warehouse.dir", "/tmp/sparkmerge_warehouse")
        # r13: default 8g → 16g.  The basket build peaks 5.5-6.7 GB on both
        # variants (OPTIMIZATION_r13.md #1), and an 8g ceiling left so
        # little margin that the r13 session-6 bench cut lost a task to a
        # heap OOM in the sf10 tail (orders_basket_lift, first tail op
        # after the two lsh levers) while the identical run passed minutes
        # later — a coin-flip failure mode, not a perf knob.  The sandbox
        # has 128 GiB; sizing the one local JVM to its host is the guide
        # §5/§9 posture ("size to your workers"), stays env-overridable,
        # and changes no plan (broadcast/split thresholds are separate).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # Broadcast threshold: under the lean profile every table in a
        # <64 MiB corpus is dimension-sized, so broadcasting everything is
        # right.  At scale keep Spark's 10 MiB default — measured at sf1
        # (BASELINE.md round-4): 64 MiB made the planner broadcast the
        # 1.5M-row orders table (single-threaded driver hash build), tripling
        # tpch_q3/q5; the same mistake at 100 TB would OOM the driver.  AQE
        # still upgrades shuffle joins to broadcast from runtime stats.
        .config(
            "spark.sql.autoBroadcastJoinThreshold",
            str(64 * 1024 * 1024 if small else 10 * 1024 * 1024),
        )
        # Split size governs scan parallelism.  The local corpus is ~MBs per
        # table, so the 128 MB default would put every file on one task; 4 MB
        # (1 MB under the lean profile) gives the 32 cores work.  A real
        # cluster reading 100 TB overrides this back up via the env var (row
        # groups there are >=128 MB anyway).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get(
                "SPARK_GRAFT_MAX_PARTITION_BYTES",
                str(1024 * 1024 if small else 4 * 1024 * 1024),
            ),
        )
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
    )
    return builder.getOrCreate()
