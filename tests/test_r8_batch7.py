"""Semantic tests for the round-8 batch-7 operators (brute-force Python
ground truth at sf0.001, independent of the DuckDB oracle)."""

import math
from collections import Counter, defaultdict

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


# --- supplier_part_coverage_profile -------------------------------------------


def test_supplier_part_coverage_matches_bruteforce(spark):
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_suppkey", "l_partkey")
        .collect()
    )
    pairs = {(r["l_suppkey"], r["l_partkey"]) for r in li}
    parts_per_sup = Counter()
    sups_per_part = Counter()
    for s, p in pairs:
        parts_per_sup[s] += 1
        sups_per_part[p] += 1
    expect = Counter(
        ("parts_per_supplier", c) for c in parts_per_sup.values()
    ) + Counter(("suppliers_per_part", c) for c in sups_per_part.values())

    out = registry()["supplier_part_coverage_profile"].fn(spark, SF_DIR).collect()
    got = {(r["side"], r["coverage"]): r["n_keys"] for r in out}
    assert got == dict(expect)
    # both directions must be present and the histogram must not be trivial
    assert any(k[0] == "parts_per_supplier" for k in got)
    assert any(k[0] == "suppliers_per_part" for k in got)


# --- events_value_percentile_bands --------------------------------------------


def test_value_percentile_bands_matches_bruteforce(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type", "value"
    ).collect()
    by_type = defaultdict(list)
    for r in ev:
        by_type[r["event_type"]].append(math.floor(r["value"] * 100.0 + 0.5))

    def nearest_rank(sorted_vals, p):
        n = len(sorted_vals)
        idx = (p * n + 99) // 100  # 1-indexed ceil
        return sorted_vals[idx - 1]

    out = {
        r["event_type"]: r
        for r in registry()["events_value_percentile_bands"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(by_type)
    for t, vals in by_type.items():
        vals.sort()
        r = out[t]
        assert r["n"] == len(vals)
        assert r["min_cents"] == vals[0]
        assert r["max_cents"] == vals[-1]
        for p in (25, 50, 75, 95):
            assert r[f"p{p}_cents"] == nearest_rank(vals, p), (t, p)
        assert r["mean_cents"] == sum(vals) / len(vals)


# --- supplier_workload_skew ---------------------------------------------------


def test_supplier_workload_skew_matches_bruteforce(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_suppkey", "l_extendedprice"
    ).collect()
    agg = defaultdict(lambda: [0, 0])
    for r in li:
        a = agg[r["l_suppkey"]]
        a[0] += 1
        a[1] += math.floor(r["l_extendedprice"] * 100.0 + 0.5)

    order = sorted(agg.items(), key=lambda kv: (-kv[1][1], kv[0]))
    total = sum(v[1] for v in agg.values())
    n_sup = len(order)
    expect = {}
    cum = 0
    for i, (sk, (n_lines, rev)) in enumerate(order, start=1):
        cum += rev
        expect[sk] = {
            "n_lines": n_lines,
            "rev_cents": rev,
            "rnk": i,
            "cum_share_pm": (1000 * cum) // total,
            "decile": ((i - 1) * 10) // n_sup + 1,
        }

    out = {
        r["l_suppkey"]: r
        for r in registry()["supplier_workload_skew"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(expect)
    for sk, e in expect.items():
        r = out[sk]
        for k, v in e.items():
            assert r[k] == v, (sk, k)
    # Pareto sanity: the last-ranked supplier closes the curve at 1000 pm
    last = max(expect.values(), key=lambda e: e["rnk"])
    assert last["cum_share_pm"] == 1000
    assert {e["decile"] for e in expect.values()} == set(range(1, 11))


# --- text_char_class_profile --------------------------------------------------


def test_char_class_profile_matches_bruteforce(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "source", "text"
    ).collect()
    agg = defaultdict(lambda: [0, 0, 0, 0, 0])  # docs, chars, letters, digits, spaces
    for r in docs:
        a = agg[r["source"]]
        t = r["text"]
        a[0] += 1
        a[1] += len(t)
        a[2] += sum(1 for ch in t if ("a" <= ch <= "z") or ("A" <= ch <= "Z"))
        a[3] += sum(1 for ch in t if "0" <= ch <= "9")
        a[4] += sum(1 for ch in t if ch in " \t\n\r")

    out = {
        r["source"]: r
        for r in registry()["text_char_class_profile"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(agg)
    for src, (n_docs, chars, letters, digits, spaces) in agg.items():
        r = out[src]
        assert r["n_docs"] == n_docs
        assert r["chars"] == chars
        assert r["letters"] == letters
        assert r["digits"] == digits
        assert r["spaces"] == spaces
        assert r["other"] == chars - letters - digits - spaces
        assert r["letters_pm"] == (1000 * letters) // chars
        assert r["digits_pm"] == (1000 * digits) // chars
        assert r["spaces_pm"] == (1000 * spaces) // chars
    # prose corpus sanity: letters dominate every source
    assert all(r["letters_pm"] > 500 for r in out.values())
