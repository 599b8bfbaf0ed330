"""Behavior + plan-shape tests for the ext_retrieval operators (BM25
retrieval, BPE pair counts, event transition matrix)."""

import os
import tempfile

from pyspark.sql import functions as F

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _write_docs(spark, td, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
    return td


def test_bm25_ranks_term_dense_doc_first(spark):
    rows = [
        (1, "merge merge merge hash", "en", "s", 22),
        (2, "merge table", "en", "s", 11),
        (3, "nothing relevant at all here today", "en", "s", 34),
        (4, "window window hash", "en", "s", 18),
    ]
    with tempfile.TemporaryDirectory() as td:
        got = registry()["text_bm25_topk"].fn(spark, _write_docs(spark, td, rows))
        out = sorted(got.collect(), key=lambda r: r.rank)
    ids = [r.doc_id for r in out]
    assert 3 not in ids, "doc with zero query terms must not be retrieved"
    assert ids[0] in (1, 4), out  # the term-dense docs win
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(r.score > 0 for r in out)


def test_bm25_scale_plan_shape(spark):
    # the corpus-stats row must come back via broadcast (never a shuffle
    # join), and the global top-k must be TakeOrderedAndProject (distributed
    # partial top-k), not a single-partition sort window over the corpus
    df = registry()["text_bm25_topk"].fn(spark, SF_DIR)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # only the per-doc tf aggregation may shuffle on a data-sized key
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_bpe_pair_counts_hand_corpus(spark):
    rows = [
        (1, "a b a b", "en", "s", 7),
        (2, "a b", "en", "s", 3),
        (3, "x", "en", "s", 1),  # single token: no pairs, must not error
    ]
    with tempfile.TemporaryDirectory() as td:
        got = registry()["bpe_pair_counts"].fn(spark, _write_docs(spark, td, rows))
        counts = {r.pair: r.cnt for r in got.collect()}
    assert counts == {"a b": 3, "b a": 1}


def test_range_frame_trailing_hour_boundary(spark):
    """RANGE frame must include a row exactly 1h back (inclusive bound) and
    exclude one a microsecond older; peers with equal t_us share a frame."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0 - dt.timedelta(hours=1, microseconds=1), 5, "a", 1.00, "{}"),
        (2, t0 - dt.timedelta(hours=1), 5, "a", 2.00, "{}"),
        (3, t0, 5, "a", 4.00, "{}"),
        (4, t0, 5, "a", 8.00, "{}"),  # peer of event 3: same frame
    ]
    with tempfile.TemporaryDirectory() as td:
        df = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        df.coalesce(1).write.parquet(os.path.join(td, "events.parquet"))
        got = {
            r.event_id: r
            for r in registry()["fn_window_range_frame"].fn(spark, td).collect()
        }
    assert got[1].n_1h == 1 and got[1].cents_1h == 100
    assert got[2].n_1h == 2 and got[2].cents_1h == 300  # 1h-older row included
    # events 3 and 4 are peers: both frames hold {2, 3, 4}, not {1}
    for eid in (3, 4):
        assert got[eid].n_1h == 3 and got[eid].cents_1h == 1400


def test_train_split_partitions_and_determinism(spark):
    got = registry()["pipeline_train_split"].fn(spark, SF_DIR)
    rows = got.collect()
    splits = {r.split for r in rows}
    assert splits <= {"train", "val", "test"} and "train" in splits
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    assert sum(r.n_docs for r in rows) == n_docs


def test_bloom_prefilter_contract(spark):
    """Bloom guarantees: zero false negatives (every true match passes),
    bounded false-positive rate, and real scan reduction on the corpus."""
    r = registry()["join_bloom_prefilter"].fn(spark, "/root/testdata/sf0.01").collect()[0]
    assert r.n_false_neg == 0
    assert r.n_pass >= r.n_true
    non_members = r.n_probe - r.n_true
    assert r.n_false_pos / non_members < 0.10, r
    assert r.n_pass < r.n_probe * 0.5, "filter must actually cut the probe side"


def test_hll_native_linear_counting_accuracy(spark):
    """The op returns raw_est + zero_regs; at low cardinality the documented
    consumer-side linear-counting correction m*ln(m/V) must land within 15%
    of the exact distinct count for every group."""
    import math

    rows = registry()["agg_hll_native"].fn(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) > 0
    m = 256
    for r in rows:
        est = m * math.log(m / r.zero_regs) if 0 < r.zero_regs and r.raw_est <= 2.5 * m else r.raw_est
        err = abs(est - r.exact_distinct) / r.exact_distinct
        assert err < 0.15, (r.event_type, est, r.exact_distinct)
        assert r.raw_est > 0


def test_transition_counts_hand_stream(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "view", 0.0, "{}"),
        (2, t0 + dt.timedelta(seconds=1), 7, "click", 0.0, "{}"),
        (3, t0 + dt.timedelta(seconds=2), 7, "buy", 0.0, "{}"),
        (4, t0, 8, "view", 0.0, "{}"),
        (5, t0 + dt.timedelta(seconds=1), 8, "click", 0.0, "{}"),
        # user 9 has one event: contributes no transition
        (6, t0, 9, "view", 0.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as td:
        df = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        df.coalesce(1).write.parquet(os.path.join(td, "events.parquet"))
        got = registry()["events_transition_counts"].fn(spark, td)
        trans = {(r.prev_type, r.next_type): r.n for r in got.collect()}
    assert trans == {("view", "click"): 2, ("click", "buy"): 1}


def test_bpe_replace_encoding_matches_greedy_fold(spark):
    """The pipe-wrapped string encoding must make leftmost-nonoverlapping
    replace() identical to the greedy left-to-right BPE merge fold — the
    property bpe_train_rounds rests on — including adversarial same-symbol
    runs and boundary-collision symbols."""
    from pyspark.sql import functions as F

    def fold(syms, p1, p2):
        out = []
        for s in syms:
            if out and out[-1] == p1 and s == p2:
                out[-1] = p1 + p2
            else:
                out.append(s)
        return out

    def enc(syms):
        return "".join(f"|{s}|" for s in syms).replace("||", "| |")

    cases = [
        (["a", "a", "a", "a"], "a", "a"),     # even run -> two merges
        (["a", "a", "a"], "a", "a"),          # odd run -> tail survives
        (["a", "b", "a", "b"], "a", "b"),     # adjacent pattern repeats
        (["ab", "c", "b", "c"], "b", "c"),    # 'b c' must not match inside 'ab c'
        (["x", "ab", "b"], "ab", "b"),        # merged symbol as left element
        (["t", "h", "e"], "t", "h"),
    ]
    rows = [(enc(s), f"|{p1}| |{p2}|", f"|{p1}{p2}|", enc(fold(s, p1, p2)))
            for s, p1, p2 in cases]
    df = spark.createDataFrame(rows, "syms string, pat string, rep string, want string")
    got = df.select(
        F.replace(F.col("syms"), F.col("pat"), F.col("rep")).alias("got"), "want"
    ).collect()
    for r in got:
        assert r["got"] == r["want"], (r["got"], r["want"])


def test_bpe_train_rounds_monotone_counts(spark):
    """Merge-pair counts must be non-increasing across rounds (each round
    removes the most frequent pair) and pairs must be distinct."""
    from sparkmerge.queries import registry

    rows = sorted(
        registry()["bpe_train_rounds"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["round"],
    )  # union child order is not contractual — sort before asserting
    assert [r["round"] for r in rows] == [1, 2, 3]
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert len({r["merged_pair"] for r in rows}) == 3
