"""Semantic tests for the round-8 batch-3 operators (brute-force Python
ground truth at sf0.001, independent of the DuckDB oracle)."""

import math
import re
from collections import Counter, defaultdict

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"

_P = 1048573
_GRID = 1024


def _xc(event_id):
    return (((event_id % _P) * 2654435761) % 4294967296) % _GRID


def _yc(user_id, event_id):
    return ((((user_id % _P) * 40503 + (event_id % _P)) % _P) * 2246822519) % 4294967296 % _GRID


def test_density_smooth_matches_bruteforce(spark):
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "user_id")
        .collect()
    )
    cells = Counter()
    for r in ev:
        cells[(_xc(r["event_id"]) // 8, _yc(r["user_id"], r["event_id"]) // 8)] += 1
    lim = 1024 // 8 - 1
    num = Counter()
    for (cx, cy), n in cells.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                tx, ty = cx + dx, cy + dy
                if 0 <= tx <= lim and 0 <= ty <= lim:
                    num[(tx, ty)] += n * (2 - abs(dx)) * (2 - abs(dy))

    out = {
        (r["cx"], r["cy"]): r
        for r in registry()["spatial_density_smooth"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(num)
    for (cx, cy), r in out.items():
        assert r["n_raw"] == cells.get((cx, cy), 0)
        assert r["smooth_num"] == num[(cx, cy)]
        mx = 4 if 0 < cx < lim else 3
        my = 4 if 0 < cy < lim else 3
        assert r["kernel_mass"] == mx * my  # positional in-grid mass
    # total smoothed mass conservation: sum(n·w) == sum over cells of
    # n·(kernel mass that stayed in grid)
    assert sum(r["smooth_num"] for r in out.values()) == sum(num.values())


def test_type_lift_matrix_matches_bruteforce(spark):
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_type")
        .collect()
    )
    buckets = defaultdict(set)
    for r in ev:
        buckets[(r["user_id"], r["ts"].replace(minute=0, second=0, microsecond=0))].add(
            r["event_type"]
        )
    N = len(buckets)
    marg = Counter()
    pair = Counter()
    for types in buckets.values():
        ts = sorted(types)
        for t in ts:
            marg[t] += 1
        for i, a in enumerate(ts):
            for b in ts[i + 1:]:
                pair[(a, b)] += 1

    out = {
        (r["type_a"], r["type_b"]): r
        for r in registry()["events_type_lift_matrix"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(pair)
    for (a, b), r in out.items():
        assert r["n_a"] == marg[a]
        assert r["n_b"] == marg[b]
        assert r["n_ab"] == pair[(a, b)]
        assert r["lift"] == (pair[(a, b)] * N) / (marg[a] * marg[b])


def test_trigram_cosine_matches_bruteforce(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    cnt = defaultdict(Counter)
    for r in docs:
        s = re.sub(r"[^a-z ]", "", r["text"].lower())
        for i in range(len(s) - 2):
            cnt[r["source"]][s[i : i + 3]] += 1
    q = {}
    for src, c in cnt.items():
        tot = sum(c.values())
        q[src] = {t: (v * 100000) // tot for t, v in c.items()}
    n2 = {src: sum(v * v for v in p.values()) for src, p in q.items()}

    out = {
        (r["source_a"], r["source_b"]): r
        for r in registry()["text_source_trigram_cosine"].fn(spark, SF_DIR).collect()
    }
    srcs = sorted(q)
    expect_pairs = set()
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            dot = sum(q[a][t] * q[b][t] for t in q[a] if t in q[b])
            if dot:  # zero-dot pairs drop out of the inner join agg
                expect_pairs.add((a, b))
                r = out[(a, b)]
                assert r["dot"] == dot
                assert r["n2_a"] == n2[a]
                assert r["n2_b"] == n2[b]
                assert r["cosine"] == dot / (math.sqrt(n2[a]) * math.sqrt(n2[b]))
                assert 0.0 < r["cosine"] <= 1.0
    assert set(out) == expect_pairs
    assert len(out) == 190  # C(20, 2) — every source pair shares trigrams


def test_pattern_match_counts_matches_bruteforce(spark):
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    seqs = defaultdict(list)
    for r in ev:
        seqs[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"][0]))
    out = {
        r["user_id"]: r
        for r in registry()["events_pattern_match_counts"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(seqs)
    for u, items in seqs.items():
        s = "".join(i for (_t, _e, i) in sorted(items))
        r = out[u]
        assert r["n_events"] == len(s)
        # re.findall is left-to-right non-overlapping — the semantics both
        # engines implement for these backreference-free patterns
        assert r["n_vcp"] == len(re.findall("vcp", s))
        assert r["n_view_error"] == len(re.findall("ve", s))
        assert r["n_error_runs"] == len(re.findall("ee", s))
