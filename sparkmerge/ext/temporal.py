"""Temporal joins: as-of and range — the time-series surface the reference
lacks (SURVEY.md §2.C notes their absence; shipped here as [EXT]).

Both are built as SCALABLE formulations, not nested-loop conditions:

- ``asof_join`` uses the union + partitioned-window carry-forward trick:
  tag both sides, union, sort each key's timeline once, and carry the
  latest right-side payload forward onto left rows.  ONE shuffle on the
  key (same cost as an equi-join) — versus the naive
  ``t.ts <= s.ts`` theta-join which Spark can only execute as a
  broadcast-nested-loop.
- ``range_join_binned`` buckets time into fixed bins and equi-joins on
  (key, bin) for the bin pairs that can satisfy the range, then applies
  the exact predicate — turning an inequality join into a shuffle-bounded
  equi-join with a cheap post-filter (the standard interval-binning
  rewrite Databricks' range-join optimization performs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: tuple[str, str],
    time: tuple[str, str],
    right_payload: list[str],
    right_dups: str = "unique",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the payload of the LATEST right row with the
    same key and right.time <= left.time (left rows with no prior right row
    keep NULL payloads — ASOF LEFT JOIN semantics).

    ``direction="forward"`` flips the inequality: the EARLIEST right row
    with right.time >= left.time (the "next scheduled event" shape).  Same
    single-shuffle union+window plan — only the window's time ordering
    reverses; the ``right_dups="max"`` tiebreak is unchanged (greatest
    payload struct at the winning timestamp).

    ``right_dups`` picks the duplicate-timestamp policy:

    - ``"unique"`` (default): ``right`` must be unique per (key, time) —
      pre-dedupe for deterministic results (as-of over duplicate timestamps
      is undefined in any engine).
    - ``"max"``: duplicates allowed; the lexicographically-greatest payload
      struct wins at each (key, time).  The tiebreak rides the window's
      existing sort (order by time, side, payload), so the dedup costs ZERO
      extra shuffles — versus the pre-aggregate formulation, whose groupBy
      is a second Exchange on (key, time) before the window's key Exchange
      (r4 verdict ask #4: fold the carry-forward into one key shuffle).
    """
    if right_dups not in ("unique", "max"):
        raise ValueError(f"right_dups must be 'unique' or 'max', got {right_dups!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}"
        )
    lk, rk = key
    lt, rt = time
    reserved = {"_k", "_t", "_payload", "_side", "_asof"}
    clash = reserved.intersection(left.columns).union(reserved.intersection(right_payload))
    if clash:
        raise ValueError(f"asof_join reserved column names in use: {sorted(clash)!r}")
    payload_struct = F.struct(*[F.col(c) for c in right_payload])
    r = right.select(
        F.col(rk).alias("_k"),
        F.col(rt).alias("_t"),
        payload_struct.alias("_payload"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    l = left.select(
        F.col(lk).alias("_k"),
        F.col(lt).alias("_t"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        F.lit(1).alias("_side"),
        *left.columns,
    )
    # right rows sort before left rows at equal time → "at-or-before" matches;
    # under right_dups="max" the payload struct joins the sort so the last
    # right row at the winning time carries the greatest payload
    # forward: reverse the time order so "carry last non-null preceding"
    # surfaces the earliest at-or-after right row instead
    t_ord = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    order = [t_ord, "_side"] if right_dups == "unique" else [t_ord, "_side", "_payload"]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn(
        "_asof", F.last("_payload", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_side") == 1).select(
        *left.columns, *[F.col(f"_asof.{c}").alias(c) for c in right_payload]
    )


def range_join_binned(
    df: DataFrame,
    *,
    key: str,
    time: str,
    id_col: str,
    max_gap_us: int,
) -> DataFrame:
    """Self range-join: pairs (a, b) with the same key, strictly-later b
    within ``max_gap_us`` microseconds (simultaneous rows pair once, ordered
    by id, so no self/mirror pairs).

    Each a-row lands in one bin of width ``max_gap_us``; a qualifying b-row
    is in a's bin or the next, so the candidate join is an equi-join on
    (key, bin) over two bin offsets — bounded shuffle, exact predicate
    applied after."""
    t_us = F.unix_micros(F.col(time).cast("timestamp"))
    bin_col = F.floor(t_us / max_gap_us)
    a = df.select(
        F.col(key).alias("_k"),
        F.col(id_col).alias("a_id"),
        t_us.alias("a_us"),
        bin_col.alias("_bin"),
    )
    b_base = df.select(
        F.col(key).alias("_k"),
        F.col(id_col).alias("b_id"),
        t_us.alias("b_us"),
        bin_col.alias("_bin0"),
    )
    # b appears under its own bin and the previous one (so that a finds it)
    b = b_base.select(
        "_k", "b_id", "b_us", F.explode(F.array(F.col("_bin0"), F.col("_bin0") - 1)).alias("_bin")
    )
    gap = F.col("b_us") - F.col("a_us")
    return (
        a.join(b, ["_k", "_bin"])
        .filter((gap > 0) | ((gap == 0) & (F.col("a_id") < F.col("b_id"))))
        .filter(gap <= max_gap_us)
        .select(F.col("_k").alias(key), "a_id", "b_id", gap.alias("gap_us"))
        .dropDuplicates(["a_id", "b_id"])
    )
