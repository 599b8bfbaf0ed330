"""Semantic tests for the round-8 batch-9 operators (brute-force Python
ground truth at sf0.001, independent of the DuckDB oracle)."""

import math
import re
from collections import Counter, defaultdict

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


# --- audit_fk_orphans ---------------------------------------------------------


def test_fk_orphans_matches_bruteforce(spark):
    order_keys = {
        r["o_orderkey"]
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    line_counts = Counter(
        r["l_orderkey"]
        for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    )
    expect = defaultdict(lambda: [0, 0])
    for k in order_keys | set(line_counts):
        if k not in order_keys:
            cls = "line_without_order"
        elif k not in line_counts:
            cls = "order_without_lines"
        else:
            cls = "matched"
        expect[cls][0] += 1
        expect[cls][1] += line_counts.get(k, 0)

    out = {
        r["fk_class"]: r
        for r in registry()["audit_fk_orphans"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(expect)
    for cls, (nk, nl) in expect.items():
        assert out[cls]["n_keys"] == nk
        assert out[cls]["n_lines"] == nl
    # this corpus ships orders with zero lineitems — the audit must see them
    assert "order_without_lines" in out
    assert out["matched"]["n_lines"] == sum(line_counts.values())


# --- orders_brand_audience_jaccard --------------------------------------------


def test_brand_audience_jaccard_matches_bruteforce(spark):
    o_cust = {
        r["o_orderkey"]: r["o_custkey"]
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    p_brand = {
        r["p_partkey"]: r["p_brand"]
        for r in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    }
    buyers = defaultdict(set)
    for r in (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .collect()
    ):
        buyers[p_brand[r["l_partkey"]]].add(o_cust[r["l_orderkey"]])

    brands = sorted(buyers)
    expect = {}
    for i, a in enumerate(brands):
        for b in brands[i + 1 :]:
            both = len(buyers[a] & buyers[b])
            if both:
                expect[(a, b)] = (both, len(buyers[a]), len(buyers[b]))

    out = {
        (r["brand_a"], r["brand_b"]): r
        for r in registry()["orders_brand_audience_jaccard"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(expect)
    for k, (both, na, nb) in expect.items():
        r = out[k]
        assert r["n_both"] == both
        assert r["n_a"] == na
        assert r["n_b"] == nb
        assert r["jaccard"] == both / (na + nb - both)


# --- customer_balance_activity_grid -------------------------------------------


def test_balance_activity_grid_matches_bruteforce(spark):
    n_orders = Counter(
        r["o_custkey"]
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    )
    grid = defaultdict(lambda: [0, 0])
    saw_negative = False
    for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect():
        cents = math.floor(r["c_acctbal"] * 100.0 + 0.5)
        saw_negative = saw_negative or cents < 0
        band = (cents + 100000) // 100000
        n = n_orders.get(r["c_custkey"], 0)
        bucket = 0 if n == 0 else len(bin(n)) - 2  # bit length
        g = grid[(band, bucket)]
        g[0] += 1
        g[1] += n

    out = {
        (r["bal_band"], r["act_bucket"]): r
        for r in registry()["customer_balance_activity_grid"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(grid)
    for k, (nc, no) in grid.items():
        assert out[k]["n_customers"] == nc
        assert out[k]["n_orders"] == no
    # the corpus has negative balances — the shifted band must absorb them
    assert saw_negative
    assert min(k[0] for k in grid) == 0


# --- text_word_length_profile -------------------------------------------------


def test_word_length_profile_matches_bruteforce(spark):
    cnt = Counter()
    for r in (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("lang", "text")
        .collect()
    ):
        for tok in re.split(r"\s+", r["text"]):
            if tok:
                cnt[(r["lang"], len(tok))] += 1
    totals = Counter()
    for (lang, _), n in cnt.items():
        totals[lang] += n

    out = {
        (r["lang"], r["word_len"]): r
        for r in registry()["text_word_length_profile"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(cnt)
    for k, n in cnt.items():
        assert out[k]["n"] == n
        assert out[k]["share_pm"] == (1000 * n) // totals[k[0]]
    assert len(totals) == 5  # all five corpus languages present
