"""Semantic tests for the round-8 batch-5 operators (brute-force Python
ground truth at sf0.001, independent of the DuckDB oracle)."""

import math
from collections import Counter, defaultdict

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


# --- orders_order_size_distribution ------------------------------------------


def test_order_size_distribution_matches_bruteforce(spark):
    lines = Counter(
        r["l_orderkey"]
        for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey")
        .collect()
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    agg = defaultdict(lambda: [0, 0])  # (priority, n_lines) -> n_orders, cents
    prio_totals = Counter()
    n_zero_line = 0
    for r in orders:
        nl = lines.get(r["o_orderkey"], 0)
        if nl == 0:
            n_zero_line += 1
            continue  # inner join excludes line-less orders
        a = agg[(r["o_orderpriority"], nl)]
        a[0] += 1
        a[1] += math.floor(r["o_totalprice"] * 100.0 + 0.5)
        prio_totals[r["o_orderpriority"]] += 1

    out = {
        (r["o_orderpriority"], r["n_lines"]): r
        for r in registry()["orders_order_size_distribution"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(agg)
    for key, (n, cents) in agg.items():
        r = out[key]
        assert r["n_orders"] == n
        assert r["total_cents"] == cents
        assert r["share_of_priority"] == n / prio_totals[key[0]]


# --- events_weekday_hour_heatmap ---------------------------------------------


def _us_epoch(ts):
    import datetime

    d = ts - datetime.datetime(1970, 1, 1)
    return d.days * 86_400_000_000 + d.seconds * 1_000_000 + d.microseconds


def test_weekday_hour_heatmap_matches_bruteforce(spark):
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", "ts", "user_id")
        .collect()
    )
    cells = defaultdict(set)
    counts = Counter()
    type_totals = Counter()
    for r in ev:
        us = _us_epoch(r["ts"])
        dow = (us // 86_400_000_000 + 4) % 7
        hod = (us // 3_600_000_000) % 24
        # cross-check the integer dow against the calendar (0 = Sunday)
        assert dow == (r["ts"].weekday() + 1) % 7
        key = (r["event_type"], dow, hod)
        counts[key] += 1
        cells[key].add(r["user_id"])
        type_totals[r["event_type"]] += 1

    out = {
        (r["event_type"], r["dow"], r["hod"]): r
        for r in registry()["events_weekday_hour_heatmap"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(counts)
    for key, n in counts.items():
        r = out[key]
        assert r["n_events"] == n
        assert r["n_users"] == len(cells[key])
        assert r["share_of_type"] == n / type_totals[key[0]]
        assert 0 <= r["dow"] <= 6 and 0 <= r["hod"] <= 23


# --- window_first_last_touch -------------------------------------------------


def test_first_last_touch_matches_bruteforce(spark):
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect()
    )
    seqs = defaultdict(list)
    for r in ev:
        seqs[r["user_id"]].append(
            (_us_epoch(r["ts"]), r["event_id"], r["event_type"], r["value"])
        )
    out = {
        r["user_id"]: r
        for r in registry()["window_first_last_touch"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(seqs)
    for u, items in seqs.items():
        items.sort(key=lambda t: (t[0], t[1]))  # the (ts, event_id) struct key
        first, last = items[0], items[-1]
        r = out[u]
        assert r["n_events"] == len(items)
        assert r["first_us"] == first[0]
        assert r["last_us"] == last[0]
        assert r["span_s"] == (last[0] - first[0]) // 1_000_000
        assert r["first_type"] == first[2]
        assert r["first_cents"] == math.floor(first[3] * 100.0 + 0.5)
        assert r["last_type"] == last[2]
        assert r["last_cents"] == math.floor(last[3] * 100.0 + 0.5)


# --- text_stopword_profile ---------------------------------------------------


def test_stopword_profile_matches_bruteforce(spark):
    from sparkmerge.ext.text import LANG_MARKERS

    vocab = {w for ws in LANG_MARKERS.values() for w in ws}
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    totals = Counter()
    hits = Counter()
    for r in docs:
        toks = [t for t in r["text"].lower().split() if t]
        totals[r["source"]] += len(toks)
        for t in toks:
            if t in vocab:
                hits[(r["source"], t)] += 1

    out = {
        (r["source"], r["marker"]): r
        for r in registry()["text_stopword_profile"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(hits)
    assert out, "marker hits must be non-empty for the test to bite"
    for key, n in hits.items():
        r = out[key]
        assert r["n_hits"] == n
        assert r["total_tokens"] == totals[key[0]]
        assert r["hit_rate"] == n / totals[key[0]]
