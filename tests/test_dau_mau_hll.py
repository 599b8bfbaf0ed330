"""window_dau_mau_stickiness mau='hll' — the registered 100 TB lever:
per-day datasketches-HLL of actives + trailing union over the day-level
sketch table, replacing the presences×28 shuffle of the exact path."""

import pytest

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.01"


def test_hll_mau_tracks_exact_within_sketch_error(spark):
    fn = registry()["window_dau_mau_stickiness"].fn
    exact = {r["d"]: r for r in fn(spark, SF_DIR).collect()}
    hll = {r["d"]: r for r in fn(spark, SF_DIR, mau="hll").collect()}
    assert set(exact) == set(hll)
    for d, er in exact.items():
        hr = hll[d]
        assert hr["dau"] == er["dau"]  # DAU stays exact in both modes
        # default datasketches lgK=12 → relative error ~1.6 %; allow 5 %
        assert abs(hr["mau_28"] - er["mau_28"]) <= max(3, 0.05 * er["mau_28"]), d
        assert hr["stickiness"] == hr["dau"] / hr["mau_28"]


def test_hll_plan_has_no_presence_level_fanout(spark):
    fn = registry()["window_dau_mau_stickiness"].fn
    sf = "/root/testdata/sf0.001"
    plan_exact = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
    plan_hll = (
        fn(spark, sf, mau="hll")._jdf.queryExecution().executedPlan().toString()
    )
    assert "count(distinct" in plan_exact.lower()
    assert "hll_union_agg" in plan_hll
    # the ×28 Generate fans out the day-level sketch table (columns
    # [d, sk]), never the presence relation (no user_id at the explode)
    gen_lines = [l for l in plan_hll.splitlines() if "Generate explode" in l]
    assert gen_lines and all("sk#" in l and "user_id" not in l for l in gen_lines)
    with pytest.raises(ValueError):
        fn(spark, sf, mau="bogus")
