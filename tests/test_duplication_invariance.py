"""Metamorphic duplication-invariance tests for the percentile / per-mille
recipe family (r8 batches 7+).

Doubling every input row is a pure frequency scaling: nearest-rank
percentiles are EXACTLY invariant (idx' = (p·2n+99) DIV 100 lands on the
same value because ceil(ceil(2x)/2) = ceil(x)), integer per-mille shares
are exactly invariant ((1000·2a) DIV (2b) = (1000a) DIV b), ranks and
deciles are order-statistics of unchanged per-key ratios, and plain
counts double.  A formulation that secretly depended on row identity,
partitioning, or FP accumulation order would break one of these.
"""

import os
import shutil

import pyarrow.parquet as pq
import pyarrow as pa
import pytest

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def doubled_dirs(tmp_path_factory):
    """One temp sf_dir per doubled table: symlinks for every table except
    the target, which is written back duplicated (every row twice)."""
    base = tmp_path_factory.mktemp("dupinv")
    dirs = {}
    for target in ("events", "lineitem", "documents"):
        d = base / target
        d.mkdir()
        for t in TABLES:
            src = f"{SF_DIR}/{t}.parquet"
            dst = str(d / f"{t}.parquet")
            if t == target:
                tab = pq.read_table(src)
                pq.write_table(pa.concat_tables([tab, tab]), dst)
            else:
                os.symlink(src, dst)
        dirs[target] = str(d)
    yield dirs
    shutil.rmtree(str(base), ignore_errors=True)


def _rows(spark, op, sf_dir, key_cols):
    return {
        tuple(r[k] for k in key_cols): r.asDict()
        for r in registry()[op].fn(spark, sf_dir).collect()
    }


def test_value_percentile_bands_duplication_invariant(spark, doubled_dirs):
    orig = _rows(spark, "events_value_percentile_bands", SF_DIR, ["event_type"])
    dup = _rows(
        spark, "events_value_percentile_bands", doubled_dirs["events"], ["event_type"]
    )
    assert set(orig) == set(dup)
    for k, o in orig.items():
        dd = dup[k]
        assert dd["n"] == 2 * o["n"]
        for c in ("min_cents", "max_cents", "p25_cents", "p50_cents",
                  "p75_cents", "p95_cents", "mean_cents"):
            assert dd[c] == o[c], (k, c)


def test_supplier_workload_skew_duplication_invariant(spark, doubled_dirs):
    orig = _rows(spark, "supplier_workload_skew", SF_DIR, ["l_suppkey"])
    dup = _rows(
        spark, "supplier_workload_skew", doubled_dirs["lineitem"], ["l_suppkey"]
    )
    assert set(orig) == set(dup)
    for k, o in orig.items():
        dd = dup[k]
        assert dd["n_lines"] == 2 * o["n_lines"]
        assert dd["rev_cents"] == 2 * o["rev_cents"]
        for c in ("rnk", "cum_share_pm", "decile"):
            assert dd[c] == o[c], (k, c)


def test_char_class_profile_duplication_invariant(spark, doubled_dirs):
    orig = _rows(spark, "text_char_class_profile", SF_DIR, ["source"])
    dup = _rows(
        spark, "text_char_class_profile", doubled_dirs["documents"], ["source"]
    )
    assert set(orig) == set(dup)
    for k, o in orig.items():
        dd = dup[k]
        for c in ("n_docs", "chars", "letters", "digits", "spaces", "other"):
            assert dd[c] == 2 * o[c], (k, c)
        for c in ("letters_pm", "digits_pm", "spaces_pm"):
            assert dd[c] == o[c], (k, c)


def test_fulfillment_latency_duplication_invariant(spark, doubled_dirs):
    # the original bounded-domain percentile op the r8 family reuses
    orig = _rows(spark, "orders_fulfillment_latency", SF_DIR, ["priority"])
    dup = _rows(
        spark, "orders_fulfillment_latency", doubled_dirs["lineitem"], ["priority"]
    )
    assert set(orig) == set(dup)
    for k, o in orig.items():
        dd = dup[k]
        assert dd["n"] == 2 * o["n"]
        for c in ("min_days", "max_days", "p50_days", "p90_days", "p99_days",
                  "mean_days"):
            assert dd[c] == o[c], (k, c)
