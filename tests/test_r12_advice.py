"""Round-12 ADVICE-fix + verdict-ask regression tests (ADVICE r11 items).

1. bench._oracle_with_budget: a genuine failure racing the watchdog
   deadline no longer leaves a pending interrupt on the shared connection
   — the throwaway absorption runs on the exception path too, and the
   swallowed exception is logged to stderr instead of silently dropped.
2. _write_lease releases this process's lease on a SUPERSEDED content
   generation of the same source path when leasing the new one (the prune
   liveness rule is /proc/<pid>, so without this a long-lived session
   pinned every generation it ever opened until exit).
3. text_cross_lang_length_ratio computes ratio_vs_en via decimal(38,0)
   cross-products: an int64-wrapping product (past ~sf300 corpus sizes)
   now yields the exact ratio instead of silently wrapping with ANSI off.
4. merge_upsert_latest plan-shape pin (r11 verdict ask #3): exactly THREE
   hashpartitioning exchanges (rank window + both null-safe join sides),
   ONE full-outer SortMergeJoin, and the rank-limit pushdown
   (WindowGroupLimit) present.  A 4th exchange — e.g. a regression that
   breaks the window-before-join placement — fails loudly.
"""

from __future__ import annotations

import os
import threading
import time

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- item 1


class _RacingCon:
    """Fake DuckDB connection: the query blocks until the watchdog fires,
    then raises a REAL error (not an interrupt) — the deadline race."""

    def __init__(self, fired_evt: threading.Event):
        self._fired = fired_evt
        self.absorbed = False
        self.interrupted = False

    def interrupt(self):
        self.interrupted = True
        self._fired.set()

    def sql(self, q):
        if q == "SELECT 1":
            self.absorbed = True

            class _R:
                def fetchall(self):
                    return [(1,)]

            return _R()
        # the oracle query: wait for the watchdog, then fail for a real
        # reason at the same moment
        self._fired.wait(timeout=10)

        class _Q:
            def arrow(self):
                raise RuntimeError("disk I/O error")  # genuine failure

        return _Q()


def test_advice1_race_absorbs_and_logs(capsys):
    import bench

    evt = threading.Event()
    con = _RacingCon(evt)
    t0 = time.perf_counter()
    out = bench._oracle_with_budget(con, "SELECT slow", remaining=0.1)
    assert out is None  # recorded as budget skip, not crash
    assert con.interrupted
    # the absorption throwaway MUST have run even though the query raised
    assert con.absorbed, "pending interrupt left on the shared connection"
    err = capsys.readouterr().err
    assert "disk I/O error" in err, "swallowed exception must be logged"
    assert time.perf_counter() - t0 < 8


def test_advice1_real_failure_still_raises():
    import duckdb

    import bench

    con = duckdb.connect()
    with pytest.raises(Exception):
        bench._oracle_with_budget(con, "SELECT * FROM no_such_table", 30.0)
    # connection unpoisoned
    assert con.sql("SELECT 2").fetchall() == [(2,)]


# ---------------------------------------------------------------- item 2


def test_advice2_superseded_generation_lease_released(tmp_path):
    from sparkmerge.queries import _MY_LEASES, _write_lease

    base = tmp_path / "cache"
    gen_a = base / "deadbeef-11111111"
    gen_b = base / "deadbeef-22222222"  # same path-hash, new content
    other = base / "cafecafe-33333333"  # a DIFFERENT source path
    for d in (gen_a, gen_b, other):
        d.mkdir(parents=True)
    pid = os.getpid()
    _write_lease(str(gen_a))
    _write_lease(str(other))
    assert (gen_a / f".lease.{pid}").exists()
    _write_lease(str(gen_b))
    # superseded generation of the SAME path: released while alive
    assert not (gen_a / f".lease.{pid}").exists()
    assert (gen_b / f".lease.{pid}").exists()
    # unrelated path: untouched
    assert (other / f".lease.{pid}").exists()
    for p in list(_MY_LEASES):
        if str(tmp_path) in p:
            _MY_LEASES.discard(p)


# ---------------------------------------------------------------- item 3


def test_advice3_ratio_exact_past_int64(spark, tmp_path):
    """sum_chars * en_docs = 5e18 * 10 wraps int64; decimal must not."""
    rows = [("s", "de", 5_000_000_000_000_000_000)] + [
        ("s", "en", 100) for _ in range(10)
    ]
    df = spark.createDataFrame(rows, "source string, lang string, n_chars long")
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    df.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    from sparkmerge.queries import registry

    out = registry()["text_cross_lang_length_ratio"].fn(spark, sf_dir)
    de = {r["lang"]: r for r in out.collect()}["de"]
    # exact: (5e18 * 10) / (1000 * 1) = 5e16 — representable in double
    assert de["ratio_vs_en"] == 5.0e16


# ---------------------------------------------------------------- item 4


def test_upsert_latest_plan_shape(spark):
    from sparkmerge.queries import registry

    df = registry()["merge_upsert_latest"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 3, f"expected 3 exchanges, got {n_exchange}:\n{plan}"
    assert plan.count("SortMergeJoin") == 1
    assert "FullOuter" in plan
    # rank-limit pushdown: the latest-per-key window must prune to the
    # winner before/while shuffling, not materialize all versions
    assert "WindowGroupLimit" in plan
