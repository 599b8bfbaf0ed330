"""Round-8 registered 100 TB levers:

- dedup_cross_source_matrix(shingle_key='hash') — xxhash64 compacts the
  ~30-byte shingle string to an 8-byte shuffle key before the groupBy;
- window_rolling_distinct(mode='hll') — per-day sketch + trailing union,
  replacing the presences×7 contribution-explode shuffle.
"""

import pytest

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"


def test_shingle_hash_agrees_with_raw_at_two_sfs(spark):
    """The hash path must produce the IDENTICAL matrix at test scale: a
    64-bit collision among ~10^5 shingles has probability ~10^-10, so any
    difference is a bug, not sketch error."""
    fn = registry()["dedup_cross_source_matrix"].fn
    for sf in (SF_SMALL, SF_DIR):
        raw = {
            (r["source_a"], r["source_b"]): r["n_shared_shingles"]
            for r in fn(spark, sf).collect()
        }
        hashed = {
            (r["source_a"], r["source_b"]): r["n_shared_shingles"]
            for r in fn(spark, sf, shingle_key="hash").collect()
        }
        assert raw == hashed, sf
        assert raw  # non-vacuous: shingle overlap is dense at every SF


def test_shingle_hash_plan_shuffles_8_byte_key(spark):
    """The content-keyed Exchange must carry the xxhash64 LONG, not the
    shingle string: the hash is applied map-side BEFORE the groupBy."""
    fn = registry()["dedup_cross_source_matrix"].fn
    plan_hash = (
        fn(spark, SF_SMALL, shingle_key="hash")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    plan_raw = fn(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan_hash
    assert "xxhash64" not in plan_raw
    # the shuffle key is the hashed column: hashpartitioning on a bigint
    # column named h — its exprId line must trace to the xxhash64 project.
    # Cheap structural check: the hash plan's exchange partitions on h#N
    # where h#N is produced by xxhash64 (both appear; the raw plan's h is
    # the array_join string instead).
    assert "hashpartitioning(h#" in plan_hash
    with pytest.raises(ValueError):
        fn(spark, SF_SMALL, shingle_key="md5")


def test_rolling_distinct_hll_tracks_exact_within_sketch_error(spark):
    fn = registry()["window_rolling_distinct"].fn
    exact = {r["d"]: r["n_active_7d"] for r in fn(spark, SF_DIR).collect()}
    hll = {
        r["d"]: r["n_active_7d"]
        for r in fn(spark, SF_DIR, mode="hll").collect()
    }
    assert set(exact) == set(hll)
    for d, ev in exact.items():
        # default datasketches lgK=12 → relative error ~1.6 %; allow 5 %
        assert abs(hll[d] - ev) <= max(3, 0.05 * ev), d


def test_rolling_distinct_hll_plan_has_no_presence_level_fanout(spark):
    fn = registry()["window_rolling_distinct"].fn
    plan_exact = (
        fn(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    )
    plan_hll = (
        fn(spark, SF_SMALL, mode="hll")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "count(distinct" in plan_exact.lower()
    assert "hll_union_agg" in plan_hll
    # the ×7 Generate fans out the day-level sketch table (columns
    # [d, sk]), never the presence relation (no user_id at the explode)
    gen_lines = [l for l in plan_hll.splitlines() if "Generate explode" in l]
    assert gen_lines and all(
        "sk#" in l and "user_id" not in l for l in gen_lines
    )
    with pytest.raises(ValueError):
        fn(spark, SF_SMALL, mode="bogus")
