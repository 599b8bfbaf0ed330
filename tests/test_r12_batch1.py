"""Semantic tests for the round-12 batch-1 operators (brute-force Python
ground truth at sf0.001, independent of the DuckDB oracle)."""

import math
import re
from collections import defaultdict

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def _cents(x: float) -> int:
    return math.floor(x * 100 + 0.5)


# --- part_size_type_price_matrix --------------------------------------------


def test_size_type_price_matrix_matches_bruteforce(spark):
    parts = spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    cells = defaultdict(list)
    for r in parts:
        cells[(r["p_size"], r["p_type"])].append(_cents(r["p_retailprice"]))
    type_totals = defaultdict(int)
    for (sz, ty), vals in cells.items():
        type_totals[ty] += len(vals)

    out = {
        (r["p_size"], r["p_type"]): r
        for r in registry()["part_size_type_price_matrix"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(cells)
    for key, vals in cells.items():
        row = out[key]
        assert row["n_parts"] == len(vals)
        assert row["sum_price_cents"] == sum(vals)
        assert row["min_price_cents"] == min(vals)
        assert row["max_price_cents"] == max(vals)
        assert row["avg_price"] == sum(vals) / (len(vals) * 100)
        assert row["share_permille_in_type"] == (1000 * len(vals)) // type_totals[
            key[1]
        ]


# --- events_value_type_quantile_bands ---------------------------------------


def test_value_quantile_bands_matches_bruteforce(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_type = defaultdict(list)
    for r in events:
        by_type[r["event_type"]].append(_cents(r["value"]))

    def cut(vals, p):
        # nearest-rank on the sorted values: smallest v whose cumulative
        # count reaches ceil(p*n/100)
        n = len(vals)
        k = (p * n + 99) // 100
        return sorted(vals)[k - 1]

    expect = defaultdict(lambda: [0, 0, None, None])  # n, sum, min, max
    for ty, vals in by_type.items():
        q25, q50, q75 = cut(vals, 25), cut(vals, 50), cut(vals, 75)
        for v in vals:
            band = 1 + (v > q25) + (v > q50) + (v > q75)
            e = expect[(ty, band)]
            e[0] += 1
            e[1] += v
            e[2] = v if e[2] is None else min(e[2], v)
            e[3] = v if e[3] is None else max(e[3], v)

    out = {
        (r["event_type"], r["band"]): r
        for r in registry()["events_value_type_quantile_bands"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert set(out) == set(expect)
    for key, (n, s, lo, hi) in expect.items():
        row = out[key]
        assert row["n_events"] == n
        assert row["sum_cents"] == s
        assert row["min_cents"] == lo
        assert row["max_cents"] == hi
    # banding is total: per type the band counts sum to the type count
    for ty, vals in by_type.items():
        assert sum(r["n_events"] for (t, _), r in out.items() if t == ty) == len(vals)


# --- supplier_balance_band_mix ----------------------------------------------


def test_balance_band_mix_matches_bruteforce(spark):
    sups = spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect()
    nations = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    }
    cells = defaultdict(list)
    for r in sups:
        c = _cents(r["s_acctbal"])
        band = -1 if c < 0 else c // 100000
        cells[(nations[r["s_nationkey"]], band)].append(c)
    nation_totals = defaultdict(int)
    for (nn, band), vals in cells.items():
        nation_totals[nn] += len(vals)

    out = {
        (r["n_name"], r["band"]): r
        for r in registry()["supplier_balance_band_mix"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(cells)
    for key, vals in cells.items():
        row = out[key]
        assert row["n_suppliers"] == len(vals)
        assert row["sum_acctbal_cents"] == sum(vals)
        assert row["share_permille_in_nation"] == (1000 * len(vals)) // nation_totals[
            key[0]
        ]


def test_balance_band_negative_handling(spark):
    """Negatives pool at band -1: a -0.01 balance must not land in band 0
    (truncating integer division would put it there)."""
    rows = registry()["supplier_balance_band_mix"].fn(spark, SF_DIR).collect()
    for r in rows:
        if r["band"] == -1:
            assert r["sum_acctbal_cents"] < 0
        if r["band"] >= 0:
            assert r["min_cents"] >= 0 if "min_cents" in r else True


# --- documents_quality_length_curve -----------------------------------------

_WS = re.compile(r"\s+")
_PUNCT = re.compile(r"[.,;:!?'\"()\[\]{}\-]")
_STOP = {"the", "and", "of", "to", "in"}


def _score(text: str) -> int:
    toks = [t for t in _WS.split(text) if t]
    n_tokens = len(toks)
    n_alpha = len(text.replace(" ", ""))
    mean_wl = n_alpha / max(n_tokens, 1)
    pr = len(_PUNCT.findall(text)) / max(len(text), 1)
    low = [t for t in _WS.split(text.lower()) if t]
    n_stop = sum(1 for t in low if t in _STOP)
    return (
        (n_tokens >= 10)
        + (n_tokens <= 5000)
        + (2.0 <= mean_wl <= 12.0)
        + (pr <= 0.2)
        + (n_stop > 0)
    )


def test_quality_length_curve_matches_bruteforce(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    cells = defaultdict(list)
    for r in docs:
        cells[_score(r["text"])].append(r["n_chars"])
    total = sum(len(v) for v in cells.values())

    out = {
        r["quality_score"]: r
        for r in registry()["documents_quality_length_curve"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert set(out) == set(cells)
    for score, lens in cells.items():
        row = out[score]
        assert row["n_docs"] == len(lens)
        assert row["sum_chars"] == sum(lens)
        assert row["min_chars"] == min(lens)
        assert row["max_chars"] == max(lens)
        assert row["mean_chars"] == sum(lens) / len(lens)
        assert row["share_permille"] == (1000 * len(lens)) // total
