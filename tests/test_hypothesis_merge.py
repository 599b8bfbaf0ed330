"""Hypothesis-driven metamorphic merge properties (SURVEY.md §5.3).

Random (target, source) pairs — nullable keys, null values, disjoint and
overlapping key ranges — must satisfy the MERGE invariants for EVERY input,
not just the golden fixtures:

- convergence: delete='YES' ⇒ final state ≡ source (on source columns)
- idempotence: re-merging the converged state produces zero non-KEEP actions
- keep-mode conservation: delete='NO' ⇒ final ≡ source ∪ unmatched target
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sparkmerge.changeset import ACTION_KEEP, build_changeset
from sparkmerge.merge import merge_preview

# rows: (key, value) — keys may be NULL (null-safe join must treat NULL=NULL
# as a match), values may be NULL (change detection must be null-safe)
_key = st.one_of(st.none(), st.integers(min_value=0, max_value=6))
_val = st.one_of(st.none(), st.integers(min_value=0, max_value=3))


@st.composite
def _pair(draw):
    return draw(st.lists(st.tuples(_key, _val), min_size=0, max_size=8)), draw(
        st.lists(st.tuples(_key, _val), min_size=0, max_size=8)
    )


def _dedupe(rows):
    seen, uniq = set(), []
    for k, v in rows:
        if k not in seen:
            seen.add(k)
            uniq.append((k, v))
    return uniq


def _same(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pair=_pair())
def test_merge_invariants_hold_for_random_tables(spark, pair):
    t_rows, s_rows = (_dedupe(r) for r in pair)
    target = spark.createDataFrame(t_rows, "k int, v int")
    source = spark.createDataFrame(s_rows, "k int, v int")

    # convergence under hard delete
    merged = merge_preview(target, source, "k", delete="YES")
    assert _same(merged, source)

    # idempotence: merging the converged state again changes nothing
    cs2 = build_changeset(merged, source, "k")
    non_keep = cs2.df.filter(F.col("_action") != ACTION_KEEP).count()
    assert non_keep == 0

    # keep-mode conservation: final = source rows + unmatched target rows
    kept = merge_preview(target, source, "k", delete="NO")
    unmatched = target.join(source, target.k.eqNullSafe(source.k), "left_anti")
    assert _same(kept, source.unionByName(unmatched))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_pair())
def test_scd2_history_invariants_hold_for_any_extract(spark, pair):
    """For ANY (initial dim, extract) pair: exactly one current row per key,
    closed rows end exactly where a successor begins, and the current image
    equals the plain-merge (keep-unmatched) result on data columns."""
    from sparkmerge.merge import scd2_merge

    tgt_rows, src_rows = _dedupe(pair[0]), _dedupe(pair[1])
    # SCD2 keys identify dimension members — NULL keys are a badKey concern,
    # not an SCD2 one; drop them (null-safe matching is covered above)
    tgt_rows = [(k, v) for k, v in tgt_rows if k is not None]
    src_rows = [(k, v) for k, v in src_rows if k is not None]
    target = spark.createDataFrame(tgt_rows, "k int, v int").select(
        "*",
        F.lit("2024-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    source = spark.createDataFrame(src_rows, "k int, v int")
    load_ts = F.lit("2024-06-01").cast("timestamp")
    hist = scd2_merge(target, source, "k", load_ts=load_ts).collect()

    by_key: dict[int, list] = {}
    for r in hist:
        by_key.setdefault(r.k, []).append(r)
    tgt_map, src_map = dict(tgt_rows), dict(src_rows)
    for k, versions in by_key.items():
        current = [r for r in versions if r.is_current]
        closed = [r for r in versions if not r.is_current]
        assert len(current) == 1 and current[0].valid_to is None
        for c in closed:
            assert c.valid_to == current[0].valid_from
        # current image: source wins when present, else the open target row
        expect = src_map.get(k, tgt_map.get(k))
        assert current[0].v == expect, (k, current[0].v, expect)
        # a closed version exists iff the key existed and actually changed
        should_close = k in tgt_map and k in src_map and tgt_map[k] != src_map[k]
        assert bool(closed) == should_close, (k, closed)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pair=_pair())
def test_broadcast_strategy_equals_shuffle_for_random_tables(spark, pair):
    """For ANY (target, source) pair — including NULL keys on both sides and
    duplicate source keys — the broadcast decomposition must produce the
    same changeset multiset as the full-outer shuffle join, per delete
    mode.  Physical strategy can never change merge content."""
    t_rows, s_rows = pair  # deliberately NOT deduped: dup keys must agree too
    target = spark.createDataFrame(t_rows, "k int, v int")
    source = spark.createDataFrame(s_rows, "k int, v int")
    from tests.conftest import changeset_flat

    for delete in ("YES", "NO"):
        a = build_changeset(target, source, "k", delete=delete, strategy="shuffle").df
        b = build_changeset(target, source, "k", delete=delete, strategy="broadcast").df
        assert changeset_flat(a) == changeset_flat(b)
