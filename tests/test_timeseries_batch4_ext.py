"""Behavior tests for the round-4 batch-4 operators: last-touch
attribution, linear interpolation, soft-dedup weights, and the streaming
SCD2 sink's history invariants."""

from collections import defaultdict

from pyspark.sql import functions as F

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "event_id", "ts", "event_type", "value")
        .collect()
    )


def test_attribution_lasttouch_bruteforce(spark):
    rows = registry()["events_attribution_lasttouch"].fn(spark, SF_DIR).collect()
    ev = defaultdict(list)
    for e in _events(spark):
        ev[e["user_id"]].append(e)
    def us(td):
        return td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds

    expect = {}
    for u, seq in ev.items():
        seq.sort(key=lambda e: (e["ts"], e["event_id"]))
        last_click = None
        for e in seq:
            if e["event_type"] == "purchase":
                if (
                    last_click is not None
                    and us(e["ts"] - last_click["ts"]) <= 72 * 3600 * 1_000_000
                ):
                    gap = us(e["ts"] - last_click["ts"])
                    expect[e["event_id"]] = (last_click["event_id"], gap)
                else:
                    expect[e["event_id"]] = (None, None)
            if e["event_type"] == "click":
                last_click = e
    got = {r["event_id"]: (r["click_event_id"], r["gap_us"]) for r in rows}
    assert got == expect


def test_interpolate_linear_bruteforce(spark):
    rows = registry()["timeseries_interpolate_linear"].fn(spark, SF_DIR).collect()
    obs = defaultdict(list)
    for e in _events(spark):
        obs[e["user_id"]].append((e["ts"], e["value"]))
    got = defaultdict(dict)
    for r in rows:
        got[r["user_id"]][r["hour_ts"]] = r["value_interp"]
    for u, series in obs.items():
        series.sort()
        for tick, v in got[u].items():
            past = [(t, x) for t, x in series if t <= tick]
            future = [(t, x) for t, x in series if t > tick]
            if not past:
                expect = future[0][1]
            elif not future:
                expect = past[-1][1]
            else:
                pt, pv = past[-1]
                nt, nv = future[0]

                def us(td):
                    # exact integer microseconds (float total_seconds()
                    # would not round-trip)
                    return (
                        td.days * 86_400_000_000
                        + td.seconds * 1_000_000
                        + td.microseconds
                    )

                frac = float(us(tick - pt)) / float(us(nt - pt))
                expect = pv + ((nv - pv) * frac)
            assert v == expect, (u, tick, v, expect)


def test_soft_weights_conserve_cluster_mass(spark):
    rows = registry()["dedup_soft_weights"].fn(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(rows) == n_docs  # nothing dropped
    by_fp = defaultdict(list)
    for r in rows:
        by_fp[r["fp"]].append(r)
    for fp, rs in by_fp.items():
        n = len(rs)
        for r in rs:
            assert r["n_dups"] == n
            assert r["weight"] == 1.0 / n
        assert abs(sum(r["weight"] for r in rs) - 1.0) < 1e-9


def test_stream_scd2_history_invariants(spark):
    hist = registry()["stream_scd2_foreachbatch"].fn(spark, SF_DIR).collect()
    by_key = defaultdict(list)
    for r in hist:
        by_key[r["c_custkey"]].append(r)
    for key, rs in by_key.items():
        current = [r for r in rs if r["is_current"]]
        assert len(current) == 1  # exactly one open row per key
        assert current[0]["valid_to"] is None
        closed = sorted(
            (r for r in rs if not r["is_current"]), key=lambda r: r["valid_from"]
        )
        # contiguous validity: each closed row ends where the next begins
        chain = closed + current
        for a, b in zip(chain, chain[1:]):
            assert a["valid_to"] == b["valid_from"], (key, a, b)
    # keys changed twice (%14==3) must carry a 2-deep chain (both loads hit)
    twice = [k for k in by_key if k % 14 == 3]
    assert twice and all(len(by_key[k]) == 2 for k in twice)
