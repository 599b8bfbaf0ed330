"""orders_basket_lift r7 rewrite: basket-array plan shape and the opt-in
Apriori prune's output equivalence (r6 verdict ask #5)."""

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r["part_a"], r["part_b"], r["pair_n"], r["n_a"], r["n_b"],
         r["confidence"], r["lift"])
        for r in df.collect()
    )


def test_apriori_prune_is_output_identical(spark):
    fn = registry()["orders_basket_lift"].fn
    base = _rows(fn(spark, SF_DIR))
    pruned = _rows(fn(spark, SF_DIR, apriori_prune=True))
    assert base == pruned
    assert len(base) > 0


def test_basket_plan_shape(spark):
    fn = registry()["orders_basket_lift"].fn
    plan = (
        fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    )
    # no lambda HOFs in the pair expansion (they fall out of codegen)
    assert "lambdafunction" not in plan.lower()
    # basket-array shape holds the exchange budget at 7 (old self-join
    # formulation needed 8: distinct + both join legs re-shuffled)
    assert plan.count("Exchange hashpartitioning") <= 7
    # default (no prune) carries no broadcast semi-join on the pair stream
    assert "LeftSemi" not in plan
    pruned_plan = (
        fn(spark, SF_DIR, apriori_prune=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # prune=True applies both frequent-set semi-joins as broadcasts
    assert pruned_plan.count("LeftSemi") == 2
    assert "BroadcastHashJoin" in pruned_plan
