"""Semantic tests for the round-10 batch-1 operators (brute-force Python
ground truth at sf0.001, independent of the DuckDB oracle)."""

import math
import re
from collections import Counter, defaultdict

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def _sla_ground_truth(spark):
    orders = {
        r["o_orderkey"]: r
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    lines = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate"
    ).collect()
    n_lines = Counter()
    order_sets = defaultdict(set)
    for r in lines:
        o = orders.get(r["l_orderkey"])
        if o is None:
            continue
        gap = (r["l_shipdate"].date() - o["o_orderdate"].date()).days
        band = (
            "d000_030" if gap <= 30
            else "d031_060" if gap <= 60
            else "d061_090" if gap <= 90
            else "d091_plus"
        )
        key = (o["o_orderpriority"], band)
        n_lines[key] += 1
        order_sets[key].add(r["l_orderkey"])
    return n_lines, order_sets


# --- orders_priority_sla_breach ----------------------------------------------


def test_priority_sla_breach_matches_bruteforce(spark):
    n_lines, order_sets = _sla_ground_truth(spark)
    prio_tot = Counter()
    for (p, _), c in n_lines.items():
        prio_tot[p] += c

    out = {
        (r["priority"], r["band"]): r
        for r in registry()["orders_priority_sla_breach"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(n_lines)
    for k in n_lines:
        assert out[k]["n_lines"] == n_lines[k]
        assert out[k]["n_orders"] == len(order_sets[k])
        assert out[k]["share_pm"] == (1000 * n_lines[k]) // prio_tot[k[0]]
    # per-mille shares of one priority sum to ~1000 (integer DIV truncation)
    for p in prio_tot:
        s = sum(out[k]["share_pm"] for k in out if k[0] == p)
        assert 1000 - 4 <= s <= 1000


# --- events_user_type_entropy -------------------------------------------------


def _q_entropy(cnts, n):
    """The op's DEFINED metric: entropy of the per-mille-TRUNCATED share
    vector via the shared −p·ln(p) literal table (bit-exact ground truth:
    same table construction as the op)."""
    lut = [0.0] + [
        -(s / 1000.0) * math.log(s / 1000.0) for s in range(1, 1000)
    ] + [0.0]
    types = ["click", "error", "purchase", "signup", "view"]
    h = 0.0
    for t in types:
        h = h + lut[(1000 * cnts.get(t, 0)) // n]
    return h


def test_user_type_entropy_matches_bruteforce(spark):
    rows = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", "event_type"
    ).collect()
    per_user = defaultdict(Counter)
    for r in rows:
        per_user[r["user_id"]][r["event_type"]] += 1

    out = {
        r["user_id"]: r
        for r in registry()["events_user_type_entropy"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(per_user)
    for u, cnts in per_user.items():
        n = sum(cnts.values())
        assert out[u]["n"] == n
        assert out[u]["n_types"] == len(cnts)
        # bit-exact vs the defined quantized metric (shared literal table)
        assert out[u]["entropy_q_nats"] == _q_entropy(cnts, n)
        # and within quantization distance of TRUE Shannon entropy
        h = math.log(n) - sum(c * math.log(c) for c in cnts.values() if c > 1) / n
        assert abs(out[u]["entropy_q_nats"] - h) < 0.04
        assert -1e-12 <= out[u]["entropy_q_nats"] <= math.log(5) + 1e-12


def test_entropy_degenerate_single_type(spark):
    df = spark.createDataFrame(
        [(1, "click"), (1, "click"), (2, "view")], ["user_id", "event_type"]
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = {
            r["user_id"]: r
            for r in registry()["events_user_type_entropy"].fn(spark, d).collect()
        }
    assert out[1]["entropy_q_nats"] == 0.0 and out[1]["n_types"] == 1
    assert out[2]["entropy_q_nats"] == 0.0 and out[2]["n_types"] == 1


# --- text_zipf_rank_profile ---------------------------------------------------


def test_zipf_rank_profile_matches_bruteforce(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "source", "text"
    ).collect()
    cnt = Counter()
    for r in docs:
        for t in re.split(r"\s+", r["text"].lower()):
            if t:
                cnt[(r["source"], t)] += 1
    by_src = defaultdict(list)
    for (s, t), c in cnt.items():
        by_src[s].append((c, t))

    def band(rnk):
        for lo, name in (
            (1024, "r1024_plus"), (256, "r0256_1023"), (128, "r0128_0255"),
            (64, "r0064_0127"), (32, "r0032_0063"), (16, "r0016_0031"),
            (8, "r0008_0015"), (4, "r0004_0007"), (2, "r0002_0003"),
        ):
            if rnk >= lo:
                return name
        return "r0001"

    truth = defaultdict(lambda: [0, 0])  # (source, band) -> [n_tokens, occ]
    src_tot = Counter()
    for s, lst in by_src.items():
        lst.sort(key=lambda x: (-x[0], x[1]))
        for i, (c, _) in enumerate(lst, start=1):
            cell = truth[(s, band(i))]
            cell[0] += 1
            cell[1] += c
            src_tot[s] += c

    out = {
        (r["source"], r["rank_band"]): r
        for r in registry()["text_zipf_rank_profile"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(truth)
    for k, (nt, occ) in truth.items():
        assert out[k]["n_tokens"] == nt
        assert out[k]["occurrences"] == occ
        assert out[k]["share_pm"] == (1000 * occ) // src_tot[k[0]]


# --- supplier_lead_time_trend -------------------------------------------------


def test_supplier_lead_time_trend_matches_bruteforce(spark):
    orders = {
        r["o_orderkey"]: r
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    supp = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect()
    }
    nation = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    }
    agg = defaultdict(lambda: [0, 0])  # (nation, yyyymm) -> [n, gap_sum]
    for r in (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .collect()
    ):
        o = orders.get(r["l_orderkey"])
        nk = supp.get(r["l_suppkey"])
        if o is None or nk is None:
            continue
        nm = nation[nk]
        ym = o["o_orderdate"].year * 100 + o["o_orderdate"].month
        gap = (r["l_shipdate"].date() - o["o_orderdate"].date()).days
        cell = agg[(nm, ym)]
        cell[0] += 1
        cell[1] += gap

    out = {
        (r["nation"], r["yyyymm"]): r
        for r in registry()["supplier_lead_time_trend"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(agg)
    months = defaultdict(list)
    for nm, ym in agg:
        months[nm].append(ym)
    for k, (n, s) in agg.items():
        assert out[k]["n_lines"] == n
        mean = s / n
        assert out[k]["mean_gap_days"] == mean  # one IEEE division both sides
    for nm, ms in months.items():
        ms.sort()
        assert out[(nm, ms[0])]["delta_mom"] is None
        for prev, cur in zip(ms, ms[1:]):
            want = (agg[(nm, cur)][1] / agg[(nm, cur)][0]) - (
                agg[(nm, prev)][1] / agg[(nm, prev)][0]
            )
            assert out[(nm, cur)]["delta_mom"] == want
