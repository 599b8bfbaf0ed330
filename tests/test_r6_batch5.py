"""Semantic tests for the round-6 batch-5 operators (brute-force Python
ground truth at sf0.001, independent of the DuckDB oracle)."""

import math
import re
from collections import defaultdict

from pyspark.sql import functions as F

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def test_sorted_neighborhood_matches_bruteforce(spark):
    from sparkmerge.queries.ext_dedup import _SN_BLOCK, _SN_PREFIX, _SN_WINDOW

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "lang", "text")
        .collect()
    )
    blocks = defaultdict(list)
    for r in docs:
        norm = r["text"].lower()
        toks = frozenset(t for t in re.split(r"\s+", norm) if t != "")
        blocks[(r["lang"], norm[:_SN_BLOCK])].append(
            (norm[:_SN_PREFIX], r["doc_id"], toks)
        )
    want = {}
    for rows in blocks.values():
        rows.sort(key=lambda t: (t[0], t[1]))
        for i, (_, aid, ta) in enumerate(rows):
            for k in range(1, _SN_WINDOW + 1):
                if i + k >= len(rows):
                    break
                _, bid, tb = rows[i + k]
                inter = len(ta & tb)
                uni = len(ta | tb)
                if inter >= 1 and 2 * inter >= uni:
                    want[(min(aid, bid), max(aid, bid))] = (inter, uni)
    out = {
        (r["a_id"], r["b_id"]): r
        for r in registry()["dedup_sorted_neighborhood"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(want)
    for pair, (inter, uni) in want.items():
        assert out[pair]["inter"] == inter
        assert out[pair]["uni"] == uni
        assert out[pair]["jacc"] == inter / uni


def test_cohort_ltv_matches_bruteforce(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    first = {}
    for o in orders:
        k = o["o_custkey"]
        if k not in first or o["o_orderdate"] < first[k]:
            first[k] = o["o_orderdate"]
    cells = defaultdict(lambda: [set(), 0])
    for o in orders:
        f = first[o["o_custkey"]]
        cohort = f.strftime("%Y-%m-01")
        age = (o["o_orderdate"].year * 12 + o["o_orderdate"].month) - (
            f.year * 12 + f.month
        )
        cell = cells[(cohort, age)]
        cell[0].add(o["o_custkey"])
        cell[1] += int(math.floor(o["o_totalprice"] * 100.0 + 0.5))
    cum = {}
    by_cohort = defaultdict(list)
    for (cohort, age), (cust, cents) in cells.items():
        by_cohort[cohort].append((age, cents))
    for cohort, ages in by_cohort.items():
        ages.sort()
        run = 0
        for age, cents in ages:
            run += cents
            cum[(cohort, age)] = run
    out = registry()["orders_cohort_ltv"].fn(spark, SF_DIR).collect()
    assert len(out) == len(cells)
    for r in out:
        cust, cents = cells[(r["cohort_month"], r["age_months"])]
        assert r["n_active"] == len(cust)
        assert r["revenue_cents"] == cents
        assert r["cum_revenue_cents"] == cum[(r["cohort_month"], r["age_months"])]


def test_argminmax_matches_bruteforce(spark):
    events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", "event_id", "value")
        .collect()
    )
    per = defaultdict(list)
    for r in events:
        per[r["event_type"]].append((r["value"], r["event_id"]))
    out = {
        r["event_type"]: r
        for r in registry()["fn_agg_argminmax"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(per)
    for ty, vals in per.items():
        mx, mn = max(vals), min(vals)
        assert out[ty]["argmax_event_id"] == mx[1]
        assert out[ty]["max_value"] == mx[0]
        assert out[ty]["argmin_event_id"] == mn[1]
        assert out[ty]["min_value"] == mn[0]
        assert out[ty]["n"] == len(vals)
