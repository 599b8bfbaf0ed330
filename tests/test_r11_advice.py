"""Round-11 ADVICE-fix regression tests (ADVICE r10 items).

1. tpch_q1's sum_qty/sum_base_price/sum_disc_price now use the same
   single-rounding conversion as sum_charge: exact long sum → exact
   decimal(38,0) cast → exact scale shift → ONE double cast.  The old
   ``cast(long as double) / 10^s`` path rounds TWICE once the integer
   total crosses 2^53 (scale-4 disc totals get there near sf33) and can
   drift a ulp from the oracle's single decimal→double rounding.
2. bench._oracle_with_budget: a genuinely failing oracle RAISES (it was
   swallowed as if it were a budget skip), and a budget interrupt returns
   None without poisoning the shared connection for the next caller.
3. Dead-pid ``.lease.*`` sentinels are swept during prune even when the
   dir is kept, and a process removes its own leases at exit.
4. window_cumulative_share on an EMPTY orders input returns the empty
   frame with the contract schema instead of failing on F.lit([]) /
   dividing by zero.
"""

from __future__ import annotations

import os
from decimal import Decimal

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- item 1


def _single_rounded(total: int, scale: int) -> float:
    # CPython float(Decimal) is correctly rounded: ONE rounding step
    return float(Decimal(total).scaleb(-scale))


def _double_rounded(total: int, scale: int) -> float:
    # the pre-fix path: long → double (rounds), then / 10^scale (rounds)
    return float(total) / float(10**scale)


TOTAL_PAST_2_53 = 9007199254741001  # odd, > 2^53: the two paths disagree


def test_advice1_shift_is_single_rounded(spark):
    # the fixture total must actually distinguish the two paths, or this
    # test has no teeth
    assert _single_rounded(TOTAL_PAST_2_53, 4) != _double_rounded(
        TOTAL_PAST_2_53, 4
    )
    df = spark.createDataFrame([(TOTAL_PAST_2_53,)], ["t"])
    shifted = (
        F.col("t").cast("decimal(38,0)") * F.lit(Decimal("1E-4"))
    ).cast("double")
    got = df.select(shifted.alias("v")).collect()[0]["v"]
    assert got == _single_rounded(TOTAL_PAST_2_53, 4)


def test_advice1_q1_sums_route_through_decimal(spark):
    """Plan-shape pin: every sum_* output of tpch_q1 converts via
    decimal(38,0), never via a bare long→double cast + double division."""
    from sparkmerge.queries import registry

    df = registry()["tpch_q1"].fn(spark, "/root/testdata/sf0.001")
    plan = df.queryExecution().analyzed.toString() if hasattr(
        df, "queryExecution"
    ) else df._jdf.queryExecution().analyzed().toString()
    for col in ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"):
        assert col in plan
    # the old double-division constants must be gone from the conversion
    # of the sum_* columns (avg_* divide by count(double) — that's fine)
    assert "/ 10000.0) AS sum_disc_price" not in plan
    assert "/ 100.0) AS sum_qty" not in plan
    assert plan.count("decimal(38,0)") >= 4  # qty, base, disc4, charge hi/lo


# ---------------------------------------------------------------- item 2


def _fixture_con():
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT range AS x FROM range(1000)")
    return con


def test_advice2_real_oracle_failure_raises():
    import bench

    con = _fixture_con()
    with pytest.raises(Exception):
        bench._oracle_with_budget(con, "SELECT * FROM missing_table", 30.0)
    # the connection stays usable afterwards
    assert con.sql("SELECT count(*) FROM t").fetchone()[0] == 1000


def test_advice2_budget_interrupt_returns_none_and_connection_survives():
    import bench

    con = _fixture_con()
    # a cross join big enough to outlive a 1 s budget on any host
    slow = """
    SELECT count(*) FROM range(100000) a, range(100000) b
    WHERE (a.range * b.range) % 7 = 3
    """
    got = bench._oracle_with_budget(con, slow, 0.0)  # clamped to 1 s inside
    assert got is None
    # next caller's query on the SHARED connection is unaffected
    assert bench._oracle_with_budget(con, "SELECT count(*) FROM t", 30.0) is not None


# ---------------------------------------------------------------- item 3


def test_advice3_dead_pid_leases_swept_on_prune(tmp_path):
    from sparkmerge.queries import prune_stale_siblings

    base = tmp_path / "cache"
    live = base / "aaaa-bbbb"
    live.mkdir(parents=True)
    dead_pid = 4194304  # above default pid_max: never alive
    (live / f".lease.{dead_pid}").touch()
    (live / f".lease.{os.getpid()}").touch()
    prune_stale_siblings(str(base), "aaaa-bbbb")
    assert live.exists()  # the live generation is never age-pruned
    assert not (live / f".lease.{dead_pid}").exists(), "dead lease kept"
    assert (live / f".lease.{os.getpid()}").exists(), "live lease removed"


def test_advice3_own_leases_removed_at_exit(tmp_path):
    import sparkmerge.queries as q

    d = tmp_path / "gen"
    d.mkdir()
    q._write_lease(str(d))
    lease = d / f".lease.{os.getpid()}"
    assert lease.exists()
    q._drop_my_leases()  # what atexit runs
    assert not lease.exists()
    assert str(lease) not in q._MY_LEASES


# ---------------------------------------------------------------- item 4


def test_advice4_cumulative_share_empty_input(spark, tmp_path):
    import pyarrow.parquet as pq

    from sparkmerge.queries import registry

    src = pq.read_table("/root/testdata/sf0.001/orders.parquet")
    empty_dir = tmp_path / "sf_empty"
    empty_dir.mkdir()
    pq.write_table(src.slice(0, 0), str(empty_dir / "orders.parquet"))
    df = registry()["window_cumulative_share"].fn(spark, str(empty_dir))
    assert df.columns == ["o_custkey", "rev_cents", "cum_share", "abc_class"]
    assert df.count() == 0
