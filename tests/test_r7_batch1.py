"""Semantic tests for the round-7 batch-1 operators (brute-force Python
ground truth at sf0.001, independent of the DuckDB oracle)."""

import re
from collections import defaultdict
from datetime import timedelta

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def test_dau_mau_stickiness_matches_bruteforce(spark):
    events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts")
        .collect()
    )
    pres = {(r["user_id"], r["ts"].date()) for r in events}
    days = sorted({d for _, d in pres})
    dayset = set(days)
    dau = defaultdict(int)
    for _, d in pres:
        dau[d] += 1
    out = {
        r["d"]: r
        for r in registry()["window_dau_mau_stickiness"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == {d.isoformat() for d in days}
    for d in days:
        mau = len(
            {
                u
                for (u, pd) in pres
                if pd <= d and (d - pd) <= timedelta(days=27)
            }
        )
        row = out[d.isoformat()]
        assert row["dau"] == dau[d]
        assert row["mau_28"] == mau
        assert row["stickiness"] == dau[d] / mau
        assert 0.0 < row["stickiness"] <= 1.0
    # every presence end-day outside the observed calendar is dropped
    assert all(r["d"] in {d.isoformat() for d in dayset} for r in out.values())


def test_reorder_interval_matches_bruteforce(spark):
    orders = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_custkey", "o_orderdate", "o_orderkey")
        .collect()
    )
    per = defaultdict(list)
    for r in orders:
        per[r["o_custkey"]].append((r["o_orderdate"], r["o_orderkey"]))
    out = {
        r["o_custkey"]: r
        for r in registry()["orders_reorder_interval"].fn(spark, SF_DIR).collect()
    }
    expect_keys = {ck for ck, os in per.items() if len(os) >= 2}
    assert set(out) == expect_keys
    for ck in expect_keys:
        os = sorted(per[ck])
        gaps = [(b[0] - a[0]).days for a, b in zip(os, os[1:])]
        gaps_sorted = sorted(gaps)
        n = len(gaps)
        row = out[ck]
        assert row["n_reorders"] == n
        assert row["min_gap_d"] == min(gaps)
        assert row["max_gap_d"] == max(gaps)
        assert row["total_gap_d"] == sum(gaps)
        # nearest-rank (ceil(q*n), 1-based) — the engine's (q*n + q) DIV 1 form
        assert row["p50_gap_d"] == gaps_sorted[(5 * n + 5) // 10 - 1]
        assert row["p90_gap_d"] == gaps_sorted[(9 * n + 9) // 10 - 1]


def test_vocab_growth_matches_bruteforce(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    stride = 8
    toks = {
        r["doc_id"]: [t for t in re.split(r"\s+", r["text"].lower()) if t]
        for r in docs
    }
    out = sorted(
        registry()["text_vocab_growth"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["ckpt"],
    )
    seen = set()
    cum_tokens = 0
    rows = {}
    per_ckpt = defaultdict(lambda: [0, 0, 0])  # n_docs, n_tokens, new_types
    for doc_id in sorted(toks):
        ck = doc_id // stride
        per_ckpt[ck][0] += 1
        per_ckpt[ck][1] += len(toks[doc_id])
    first_seen = {}
    for doc_id in sorted(toks):
        for t in toks[doc_id]:
            if t not in first_seen:
                first_seen[t] = doc_id
    for t, doc_id in first_seen.items():
        per_ckpt[doc_id // stride][2] += 1
    vocab = 0
    for ck in sorted(per_ckpt):
        n_docs, n_tok, new = per_ckpt[ck]
        vocab += new
        cum_tokens += n_tok
        rows[ck] = (n_docs, new, vocab, cum_tokens)
    assert [r["ckpt"] for r in out] == sorted(per_ckpt)
    for r in out:
        n_docs, new, vocab, cum = rows[r["ckpt"]]
        assert r["n_docs"] == n_docs
        assert r["new_types"] == new
        assert r["vocab_size"] == vocab
        assert r["cum_tokens"] == cum
    # curve invariants: V and N strictly non-decreasing, V(final) = |vocab|
    assert out[-1]["vocab_size"] == len(first_seen)
    assert out[-1]["cum_tokens"] == sum(len(v) for v in toks.values())


def test_seasonal_strength_matches_bruteforce(spark):
    events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", "ts", "value")
        .collect()
    )
    cells = defaultdict(lambda: [0, 0, 0])  # n, s, q per (type, how)
    import math

    for r in events:
        c = int(math.floor(r["value"] * 100.0 + 0.5))
        how = (int(r["ts"].timestamp()) // 3600) % 168
        cell = cells[(r["event_type"], how)]
        cell[0] += 1
        cell[1] += c
        cell[2] += c * c
    per_type = defaultdict(lambda: [0, 0, 0, 0])  # n, s, q, ssw
    for (ty, _), (n_g, s_g, q_g) in cells.items():
        mhat = (2 * s_g + n_g) // (2 * n_g)
        p = per_type[ty]
        p[0] += n_g
        p[1] += s_g
        p[2] += q_g
        p[3] += q_g - 2 * mhat * s_g + n_g * mhat * mhat
    out = {
        r["event_type"]: r
        for r in registry()["timeseries_seasonal_strength"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(per_type)
    for ty, (n, s, q, ssw) in per_type.items():
        mh = (2 * s + n) // (2 * n)
        sst = q - 2 * mh * s + n * mh * mh
        row = out[ty]
        assert row["n"] == n
        assert row["ssw"] == ssw
        assert row["sst"] == sst
        expect = 0.0 if sst <= 0 else (sst - ssw) / sst
        assert row["seasonal_strength"] == expect
        # seasonal SSW never exceeds total SS by more than rounding slack
        assert row["seasonal_strength"] >= -1e-9
        assert row["seasonal_strength"] <= 1.0
