"""Property tests for the round-2 training-pipeline operators (SURVEY.md §2.D
r2 rows): invariants the DuckDB oracle can't naturally express — packing
contiguity, scrub completeness, incremental-dedup set identities."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from sparkmerge.queries import registry
from tests.conftest import SF_DIR


def _run(spark, op):
    return registry()[op].fn(spark, SF_DIR)


def test_sequence_pack_contiguity(spark):
    rows = _run(spark, "pipeline_sequence_pack").collect()
    assert rows, "empty packing"
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r.doc_id)
        pos = 0
        for r in docs:
            # each doc starts exactly where the previous one ended (contiguous
            # layout), lands in the window its first token falls into, and the
            # in-window offset is the residue
            assert r.seq_id == pos // 2048, (shard, r)
            assert r.seq_offset == pos % 2048, (shard, r)
            pos += r.n_tokens


def test_repetition_fractions_bounded(spark):
    rows = _run(spark, "text_repetition").collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.dup_word_frac <= 1.0
        assert 0.0 <= r.top_bigram_frac <= 1.0
        # a doc with any repeated word has a positive dup fraction and a
        # bigram can never cover more than all bigrams
        if r.n_tokens >= 2:
            assert r.top_bigram_frac > 0.0


def test_pii_scrub_removes_all_pii(spark):
    rows = _run(spark, "text_pii_scrub").collect()
    assert rows
    ip = re.compile(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}")
    for r in rows:
        assert r.n_emails >= 1 and r.n_ips >= 1  # planted payload was seen
        assert "@" not in r.scrubbed
        assert not ip.search(r.scrubbed)
        assert "<EMAIL>" in r.scrubbed and "<IP>" in r.scrubbed


def test_quality_filter_keep_is_conjunction(spark):
    df = _run(spark, "pipeline_quality_filter")
    bad = df.filter(
        F.col("keep")
        != (
            F.col("pass_min_tokens")
            & F.col("pass_max_tokens")
            & F.col("pass_word_len")
            & F.col("pass_punct")
            & F.col("pass_stopwords")
        )
    ).count()
    assert bad == 0


def test_dedup_incremental_set_identity(spark):
    surviving = {r.doc_id for r in _run(spark, "dedup_incremental").collect()}
    # planted exact copies (doc_id+10000) must ALL be dropped; novel docs
    # (doc_id+20000, text suffixed) must ALL survive
    assert all(i >= 20000 for i in surviving), sorted(surviving)[:5]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    novel_expected = {
        r.doc_id + 20000 for r in docs.filter(F.col("doc_id") % 11 == 0).collect()
    }
    assert surviving == novel_expected


def test_scd2_version_chain_invariants(spark):
    rows = _run(spark, "merge_scd2").collect()
    assert rows
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.c_custkey, []).append(r)
    for key, versions in by_key.items():
        current = [r for r in versions if r.is_current]
        closed = [r for r in versions if not r.is_current]
        # exactly one open version per key; closed versions end where the
        # current one begins (contiguous history, no gap or overlap)
        assert len(current) == 1, key
        assert current[0].valid_to is None, key
        for c in closed:
            assert c.valid_to == current[0].valid_from, key
        if key % 7 == 3 and key <= 1000000:
            assert len(closed) == 1, key  # changed keys carry their history
        else:
            assert not closed, key


def test_decontaminate_flags_only_nonbenchmark_docs(spark):
    rows = _run(spark, "text_decontaminate").collect()
    assert rows
    for r in rows:
        assert r.doc_id % 97 != 0, "benchmark doc flagged against itself"
        assert r.n_hit_ngrams >= 1


def test_outlier_rank_is_top_fraction(spark):
    rows = _run(spark, "agg_outlier_rank").collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, flagged in by_type.items():
        ranks = sorted(r.rn for r in flagged)
        assert ranks == list(range(1, len(ranks) + 1)), t  # a prefix of the ranking
