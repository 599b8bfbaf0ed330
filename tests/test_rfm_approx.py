"""events_rfm_segments cutoffs='approx' — the registered 100 TB lever
(r6 verdict 'what's missing' #3): approx-percentile cutoffs + map-side
compare instead of the global-order ntile window.

Semantics note the test encodes: ntile(4) makes EQUAL-SIZED buckets and
splits ties across quartiles arbitrarily (by user_id); value-based
cutoffs put every tied user in the SAME bucket.  On this corpus r_days
is degenerately tied (most users' last event is on the final day), so
raw agreement is tie-structure, not sketch error — the contract is
exact agreement on users whose value is not tied at any cutoff.
"""

import pytest

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.01"


def test_approx_cutoffs_agree_with_exact_on_untied_users(spark):
    fn = registry()["events_rfm_segments"].fn
    exact = {r["user_id"]: r for r in fn(spark, SF_DIR).collect()}
    approx = {
        r["user_id"]: r for r in fn(spark, SF_DIR, cutoffs="approx").collect()
    }
    assert set(exact) == set(approx)
    for u, er in exact.items():
        ar = approx[u]
        # base measures identical; quartile codes always in range
        assert (er["r_days"], er["freq"], er["monetary_cents"]) == (
            ar["r_days"], ar["freq"], ar["monetary_cents"],
        )
        assert 1 <= ar["r_q"] <= 4 and 1 <= ar["f_q"] <= 4 and 1 <= ar["m_q"] <= 4
    # Spark's actual sketch cutoffs: rank definitions can differ from the
    # naive sorted-index pick by one position, so exclude BOTH boundary
    # element sets — the disagreement zone is exactly those elements
    from pyspark.sql import functions as F

    from sparkmerge.queries import load

    e = load(spark, SF_DIR, "events")
    per = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long")).alias(
            "monetary_cents"
        ),
    )
    spark_cuts = {}
    for col in ("freq", "monetary_cents"):
        spark_cuts[col] = set(
            per.agg(
                F.expr(
                    f"approx_percentile({col}, array(0.25, 0.5, 0.75), 10000)"
                )
            ).collect()[0][0]
        )
    spark_cuts["r_days"] = set()  # r_days cutoffs derive the same way below
    for dim, col in (("r_q", "r_days"), ("f_q", "freq"), ("m_q", "monetary_cents")):
        vals = sorted(r[col] for r in exact.values())
        n = len(vals)
        # exact quartile cutoff VALUES (the tie boundaries), both definitions
        cutset = {vals[n // 4], vals[n // 2], vals[3 * n // 4]} | spark_cuts[col]
        if col == "r_days":
            cutset |= {vals[n // 4 - 1], vals[n // 2 - 1], vals[3 * n // 4 - 1]}
        untied = [u for u in exact if exact[u][col] not in cutset]
        agree = sum(1 for u in untied if exact[u][dim] == approx[u][dim])
        assert len(untied) > 0
        # sketch accuracy 10000 is exact at this n: boundary-untied users
        # must bucket identically under rank-ntile and value-cutoffs
        assert agree / len(untied) >= 0.99, (dim, agree, len(untied))


def test_approx_plan_has_no_global_order_window(spark):
    fn = registry()["events_rfm_segments"].fn
    sf = "/root/testdata/sf0.001"
    plan_exact = (
        fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
    )
    plan_approx = (
        fn(spark, sf, cutoffs="approx")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ntile(4)" in plan_exact
    assert "ntile(4)" not in plan_approx
    assert "Window" not in plan_approx  # no global-order window at all
    assert "approx_percentile" in plan_approx
    with pytest.raises(ValueError):
        fn(spark, sf, cutoffs="bogus")
