"""Semantic tests for the round-8 batch-6 operators (brute-force Python
ground truth at sf0.001, independent of the DuckDB oracle)."""

import datetime
import math
import re
from collections import Counter, defaultdict

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"

_GAP_US = 30 * 60 * 1_000_000


def _us(ts):
    d = ts - datetime.datetime(1970, 1, 1)
    return d.days * 86_400_000_000 + d.seconds * 1_000_000 + d.microseconds


# --- orders_returnflag_priority_matrix ---------------------------------------


def test_returnflag_priority_matrix_matches_bruteforce(spark):
    prio = {
        r["o_orderkey"]: r["o_orderpriority"]
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_returnflag", "l_extendedprice")
        .collect()
    )
    agg = defaultdict(lambda: [0, 0])
    flag_tot, prio_tot = Counter(), Counter()
    for r in li:
        p = prio[r["l_orderkey"]]
        a = agg[(r["l_returnflag"], p)]
        a[0] += 1
        a[1] += math.floor(r["l_extendedprice"] * 100.0 + 0.5)
        flag_tot[r["l_returnflag"]] += 1
        prio_tot[p] += 1

    out = {
        (r["l_returnflag"], r["o_orderpriority"]): r
        for r in registry()["orders_returnflag_priority_matrix"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(agg)
    for (fl, p), (n, cents) in agg.items():
        r = out[(fl, p)]
        assert r["n_lines"] == n
        assert r["revenue_cents"] == cents
        assert r["share_of_flag"] == n / flag_tot[fl]
        assert r["share_of_priority"] == n / prio_tot[p]


# --- events_session_duration_profile -----------------------------------------


def test_session_duration_profile_matches_bruteforce(spark):
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    seqs = defaultdict(list)
    for r in ev:
        seqs[r["user_id"]].append((_us(r["ts"]), r["event_id"]))
    expect = {}
    multi_session_users = 0
    for u, items in seqs.items():
        items.sort()
        sessions = [[items[0]]]
        for prev, cur in zip(items, items[1:]):
            if cur[0] - prev[0] <= _GAP_US:
                sessions[-1].append(cur)
            else:
                sessions.append([cur])
        if len(sessions) > 1:
            multi_session_users += 1
        durs = [s[-1][0] - s[0][0] for s in sessions]
        expect[u] = {
            "n_sessions": len(sessions),
            "n_events": len(items),
            "total_duration_s": sum(durs) // 1_000_000,
            "longest_session_s": max(durs) // 1_000_000,
            "max_session_events": max(len(s) for s in sessions),
            "mean_session_duration_s": sum(durs) / len(sessions) / 1_000_000.0,
        }
    assert multi_session_users, "corpus must sessionize non-trivially"

    out = {
        r["user_id"]: r
        for r in registry()["events_session_duration_profile"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(expect)
    for u, e in expect.items():
        r = out[u]
        for k, v in e.items():
            assert r[k] == v, (u, k, r[k], v)


# --- text_length_vs_quality_grid ---------------------------------------------


def test_length_quality_grid_matches_bruteforce(spark):
    from sparkmerge.ext.text import LANG_MARKERS

    stops = set(LANG_MARKERS["en"])
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("text").collect()
    agg = defaultdict(lambda: [0, 0])
    bucket_tot = Counter()
    for r in docs:
        text = r["text"]
        toks = [t for t in text.split() if t]
        n_tokens = len(toks)
        n_punct = len(re.findall(r"[.,;:!?'\"()\[\]{}-]", text))
        n_chars = max(len(text), 1)
        n_stop = sum(1 for t in text.lower().split() if t in stops)
        q = (
            (4 if 5 <= n_tokens <= 100000 else 0)
            + (2 if 5 * n_punct <= n_chars else 0)
            + (1 if n_stop > 0 else 0)
        )
        bucket = n_tokens.bit_length() if n_tokens > 0 else 1
        a = agg[(bucket, q)]
        a[0] += 1
        a[1] += n_tokens
        bucket_tot[bucket] += 1

    out = {
        (r["len_bucket"], r["qclass"]): r
        for r in registry()["text_length_vs_quality_grid"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(agg)
    assert len({q for (_b, q) in out}) > 1, "quality classes must vary"
    for key, (n, tot) in agg.items():
        r = out[key]
        assert r["n_docs"] == n
        assert r["total_tokens"] == tot
        assert r["share_of_bucket"] == n / bucket_tot[key[0]]


# --- graph_edge_weight_histogram ---------------------------------------------


def test_edge_weight_histogram_matches_bruteforce(spark):
    from sparkmerge.queries.ext_graph import _edges

    ws = [r["w"] for r in _edges(spark, SF_DIR).collect()]
    assert ws, "edge builder must be non-empty at sf0.001"
    hist = Counter(ws)
    all_edges = len(ws)
    all_weight = sum(ws)

    out = {
        r["w"]: r
        for r in registry()["graph_edge_weight_histogram"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(hist)
    for w, n in hist.items():
        r = out[w]
        assert r["n_edges"] == n
        assert r["total_weight"] == w * n
        assert r["surviving_edges"] == sum(c for v, c in hist.items() if v >= w)
        assert r["edge_share"] == n / all_edges
        assert r["weight_share"] == (w * n) / all_weight
    # the full histogram mass reconciles
    assert sum(r["n_edges"] for r in out.values()) == all_edges
