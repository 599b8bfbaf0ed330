"""Behavior + plan-shape tests for the round-4 ext_timeseries and
ext_features operators, with brute-force Python ground truth at sf0.001."""

from collections import defaultdict
from datetime import timedelta

from pyspark.sql import functions as F

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _events(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "event_id", "ts", "event_type", "value")
        .collect()
    )


# --- timeseries ---------------------------------------------------------


def test_resample_ffill_grid_and_carry(spark):
    rows = registry()["timeseries_resample_ffill"].fn(spark, SF_DIR).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    obs = defaultdict(list)
    for e in _events(spark):
        obs[e["user_id"]].append((e["ts"], e["value"]))
    for u, ticks in by_user.items():
        ticks.sort(key=lambda r: r["hour_ts"])
        series = sorted(obs[u])
        lo = series[0][0].replace(minute=0, second=0, microsecond=0)
        hi = series[-1][0].replace(minute=0, second=0, microsecond=0)
        # contiguous hourly grid from trunc(min) to trunc(max)
        assert ticks[0]["hour_ts"] == lo
        assert ticks[-1]["hour_ts"] == hi
        for a, b in zip(ticks, ticks[1:]):
            assert b["hour_ts"] - a["hour_ts"] == timedelta(hours=1)
        # forward fill = max value among obs at the latest ts <= tick
        for t in ticks:
            past = [(ts, v) for ts, v in series if ts <= t["hour_ts"]]
            if not past:
                assert t["value_ffill"] is None
            else:
                last_ts = max(ts for ts, _ in past)
                expect = max(v for ts, v in past if ts == last_ts)
                assert t["value_ffill"] == expect


def test_gap_islands_partition_user_history(spark):
    rows = registry()["events_gap_islands"].fn(spark, SF_DIR).collect()
    ev = defaultdict(list)
    for e in _events(spark):
        ev[e["user_id"]].append(e)
    for u in ev:
        ev[u].sort(key=lambda e: (e["ts"], e["event_id"]))
    got = defaultdict(list)
    for r in rows:
        got[r["user_id"]].append(r)
    for u, seq in ev.items():
        # brute-force islands: maximal same-type runs
        runs = []
        for e in seq:
            if runs and runs[-1][0] == e["event_type"]:
                runs[-1][1].append(e)
            else:
                runs.append([e["event_type"], [e]])
        expect = sorted(
            (t, es[0]["ts"], es[-1]["ts"], len(es)) for t, es in runs
        )
        actual = sorted(
            (r["event_type"], r["island_start"], r["island_end"], r["n_events"])
            for r in got[u]
        )
        assert actual == expect


def test_ewma_lagchain_formula(spark):
    rows = registry()["events_ewma_lagchain"].fn(spark, SF_DIR).collect()
    ev = defaultdict(list)
    for e in _events(spark):
        ev[e["user_id"]].append(e)
    expect = {}
    for u, seq in ev.items():
        seq.sort(key=lambda e: (e["ts"], e["event_id"]))
        for i, e in enumerate(seq):
            lags = [seq[i - k]["value"] if i - k >= 0 else 0.0 for k in (1, 2, 3)]
            expect[e["event_id"]] = (
                (((e["value"] * 8.0) + (lags[0] * 4.0)) + (lags[1] * 2.0)) + lags[2]
            ) / 15.0
    for r in rows:
        assert r["ewma"] == expect[r["event_id"]]


def test_ewma_single_window_shuffle(spark):
    plan = plan_of(registry()["events_ewma_lagchain"].fn(spark, SF_DIR))
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 1, plan


# --- features -----------------------------------------------------------


def _tokens(spark):
    out = {}
    for r in (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ):
        out[r["doc_id"]] = [t for t in r["text"].split() if t]
    return out


def test_feature_hash_buckets_conserve_tokens(spark):
    rows = registry()["feature_hash_bucket"].fn(spark, SF_DIR).collect()
    toks = _tokens(spark)
    per_doc = defaultdict(int)
    for r in rows:
        assert 0 <= r["bucket"] < 256
        per_doc[r["doc_id"]] += r["n"]
    assert per_doc == {d: len(t) for d, t in toks.items() if t}


def test_feature_hash_same_token_same_bucket(spark):
    # identical tokens land in identical buckets: bucket count per doc
    # never exceeds distinct-token count
    rows = registry()["feature_hash_bucket"].fn(spark, SF_DIR).collect()
    toks = _tokens(spark)
    n_buckets = defaultdict(int)
    for r in rows:
        n_buckets[r["doc_id"]] += 1
    for d, n in n_buckets.items():
        assert n <= len(set(toks[d]))


def test_vocab_coverage_bruteforce(spark):
    toks = _tokens(spark)
    counts = defaultdict(int)
    for ts in toks.values():
        for t in ts:
            counts[t] += 1
    vocab = set(
        t for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:256]
    )
    got = registry()["tokenizer_vocab_coverage"].fn(spark, SF_DIR).collect()
    for r in got:
        ts = toks[r["doc_id"]]
        oov = sum(1 for t in ts if t not in vocab)
        assert (r["n_tokens"], r["n_oov"]) == (len(ts), oov)
        assert r["oov_frac"] == oov / len(ts)


def test_embedding_projection_bruteforce(spark):
    import math

    embs = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .limit(20)
        .collect()
    }
    got = {
        r["vec_id"]: r
        for r in registry()["embedding_normalize_project"].fn(spark, SF_DIR).collect()
    }
    for vid, e in embs.items():
        acc = 0.0
        for x in e:
            acc += float(x) * float(x)
        assert got[vid]["norm"] == math.sqrt(acc)
        for j in range(8):
            p = 0.0
            for i, x in enumerate(e):
                s = -1.0 if ((i * 8 + j) * 2654435761) % 4294967296 >= 2147483648 else 1.0
                p += float(x) * s
            assert got[vid][f"p{j}"] == p / math.sqrt(acc)


def test_embedding_projection_is_shuffle_free(spark):
    plan = plan_of(registry()["embedding_normalize_project"].fn(spark, SF_DIR))
    assert "Exchange" not in plan, plan


def test_syllable_profile_bruteforce(spark):
    import re

    rows = registry()["text_syllable_profile"].fn(spark, SF_DIR).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    pat = re.compile(r"[aeiouy]+")
    for r in rows:
        text = docs[r["doc_id"]]
        words = [t for t in text.split() if t]
        n_syll = len(pat.findall(text))
        n_complex = sum(1 for w in words if len(pat.findall(w)) >= 3)
        assert r["n_words"] == len(words)
        assert r["n_syllables"] == n_syll
        assert r["n_complex"] == n_complex
        if words:
            assert r["complex_frac"] == n_complex / len(words)
            assert r["syll_per_word"] == n_syll / len(words)


def test_interleave_positions_are_strided_and_unique(spark):
    rows = registry()["pipeline_interleave_sources"].fn(spark, SF_DIR).collect()
    pos = [r["global_pos"] for r in rows]
    assert len(pos) == len(set(pos))
    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r["global_pos"])
    n_src = len(by_src)
    for src, ps in by_src.items():
        ps.sort()
        # within a source: same residue, stride n_src
        assert len({p % n_src for p in ps}) == 1
        for a, b in zip(ps, ps[1:]):
            assert b - a == n_src


def test_interleave_is_deterministic(spark):
    fn = registry()["pipeline_interleave_sources"].fn
    a = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    b = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    assert a == b


def test_scan_text_lines_roundtrip(spark):
    got = sorted(
        r["value"] for r in registry()["scan_text_lines"].fn(spark, SF_DIR).collect()
    )
    expect = sorted(
        r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    )
    assert got == expect
