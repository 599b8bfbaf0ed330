"""Semantic tests for the round-7 batch-2 operators (brute-force Python
ground truth at sf0.001, independent of the DuckDB oracle)."""

import hashlib
import re
from collections import defaultdict
from datetime import timedelta

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def test_interval_stabbing_matches_bruteforce(spark):
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_shipdate", "l_partkey")
        .collect()
    )
    deltas = defaultdict(int)
    for r in li:
        d0 = r["l_shipdate"].date()
        deltas[d0] += 1
        deltas[d0 + timedelta(days=1 + r["l_partkey"] % 28)] -= 1
    out = sorted(
        registry()["window_interval_stabbing"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["d"],
    )
    assert [r["d"] for r in out] == [d.isoformat() for d in sorted(deltas)]
    run = 0
    for r, d in zip(out, sorted(deltas)):
        run += deltas[d]
        assert r["day_delta"] == deltas[d]
        assert r["open_count"] == run
    # every interval eventually closes: the final running count is 0
    assert out[-1]["open_count"] == 0
    assert max(r["open_count"] for r in out) > 0


def test_code_detect_matches_bruteforce(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    out = {
        r["doc_id"]: r
        for r in registry()["text_code_detect"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == {r["doc_id"] for r in docs}
    sym_re = re.compile(r"[{}();=<>\[\]#]")
    ind_re = re.compile(r"(?:^|\n)(?:  |\t)")
    for r in docs:
        t = r["text"]
        row = out[r["doc_id"]]
        n_sym = len(sym_re.findall(t))
        assert row["n_chars"] == len(t)
        assert row["n_sym"] == n_sym
        assert row["n_indent"] == len(ind_re.findall(t))
        assert row["n_lines"] == 1 + t.count("\n")
        assert row["label"] == (
            "code" if len(t) > 0 and n_sym * 25 >= len(t) else "prose"
        )
        if len(t):
            assert row["sym_share"] == n_sym / len(t)


def test_cadence_cv_matches_bruteforce(spark):
    import math

    events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    per = defaultdict(list)
    for r in events:
        per[r["user_id"]].append((r["ts"], r["event_id"]))
    out = {
        r["user_id"]: r
        for r in registry()["events_user_cadence_cv"].fn(spark, SF_DIR).collect()
    }
    expect = {}
    for u, evs in per.items():
        evs.sort()
        gaps = [
            int((b[0] - a[0]).total_seconds() * 1_000_000) // 1_000_000
            for a, b in zip(evs, evs[1:])
        ]
        if len(gaps) < 2:
            continue
        n, s1 = len(gaps), sum(gaps)
        s2 = sum(g * g for g in gaps)
        expect[u] = (n, s1, s2)
    assert set(out) == set(expect)
    for u, (n, s1, s2) in expect.items():
        row = out[u]
        var_num = n * s2 - s1 * s1
        assert (row["n_gaps"], row["s1"], row["s2"]) == (n, s1, s2)
        if s1 == 0:
            assert row["cv_scaled"] is None and row["cadence_class"] == "degenerate"
        else:
            assert row["cv_scaled"] == math.sqrt(var_num) / s1
            if 4 * var_num < s1 * s1:
                assert row["cadence_class"] == "regular"
            elif var_num > 4 * s1 * s1:
                assert row["cadence_class"] == "bursty"
            else:
                assert row["cadence_class"] == "mixed"


def test_cross_source_matrix_matches_bruteforce(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    per_shingle = defaultdict(set)
    for r in docs:
        toks = [t for t in re.split(r"\s+", r["text"].lower()) if t]
        for i in range(len(toks) - 4):
            h = hashlib.md5(" ".join(toks[i : i + 5]).encode()).hexdigest()
            per_shingle[h].add(r["source"])
    expect = defaultdict(int)
    for sources in per_shingle.values():
        ss = sorted(sources)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                expect[(ss[i], ss[j])] += 1
    out = {
        (r["source_a"], r["source_b"]): r["n_shared_shingles"]
        for r in registry()["dedup_cross_source_matrix"].fn(spark, SF_DIR).collect()
    }
    assert out == dict(expect)
    assert len(out) > 0


def test_calendar_densify_matches_bruteforce(spark):
    import math
    from datetime import timedelta as _td

    events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", "ts", "value")
        .collect()
    )
    per = defaultdict(lambda: [0, 0])
    for r in events:
        cell = per[(r["event_type"], r["ts"].date())]
        cell[0] += 1
        cell[1] += int(math.floor(r["value"] * 100.0 + 0.5))
    spans = {}
    for (ty, d) in per:
        lo, hi = spans.get(ty, (d, d))
        spans[ty] = (min(lo, d), max(hi, d))
    out = {
        (r["event_type"], r["d"]): r
        for r in registry()["window_calendar_densify"].fn(spark, SF_DIR).collect()
    }
    expect_keys = set()
    for ty, (lo, hi) in spans.items():
        d = lo
        while d <= hi:
            expect_keys.add((ty, d.isoformat()))
            d += _td(days=1)
    assert set(out) == expect_keys
    n_gaps = 0
    for (ty, ds), row in out.items():
        from datetime import date
        key = (ty, date.fromisoformat(ds))
        if key in per:
            assert (row["n"], row["cents"], row["is_gap"]) == (
                per[key][0], per[key][1], False,
            )
        else:
            assert (row["n"], row["cents"], row["is_gap"]) == (0, 0, True)
            n_gaps += 1
    # the invariant that motivates the op: spans are contiguous in output
    # even when the raw data has gap days
    assert len(out) >= len(per)
