"""Semantic tests for the round-11 batch-1 operators (brute-force Python
ground truth at sf0.001, independent of the DuckDB oracle)."""

import math
from collections import defaultdict
from decimal import Decimal

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def _cents(x: float, scale: int = 2) -> int:
    return math.floor(x * 10**scale + 0.5)


# --- part_brand_price_position ----------------------------------------------


def _kth_smallest(vals, k):
    return sorted(vals)[k - 1]


def test_brand_price_position_matches_bruteforce(spark):
    parts = spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    by_cell = defaultdict(list)
    by_type = defaultdict(list)
    for r in parts:
        c = _cents(r["p_retailprice"])
        by_cell[(r["p_brand"], r["p_type"])].append((c, r["p_partkey"]))
        by_type[r["p_type"]].append((c, r["p_partkey"]))

    def kth(pairs, num, den):
        n = len(pairs)
        k = (num * n + den - 1) // den  # ceil(num*n/den)
        return sorted(pairs)[k - 1][0]

    out = {
        (r["p_brand"], r["p_type"]): r
        for r in registry()["part_brand_price_position"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(by_cell)
    for key, pairs in by_cell.items():
        row = out[key]
        assert row["n_parts"] == len(pairs)
        assert row["p25_cents"] == kth(pairs, 1, 4)
        assert row["p50_cents"] == kth(pairs, 1, 2)
        assert row["p75_cents"] == kth(pairs, 3, 4)
        tmed = kth(by_type[key[1]], 1, 2)
        assert row["type_median_cents"] == tmed
        assert row["delta_vs_type_cents"] == kth(pairs, 1, 2) - tmed


# --- customer_segment_nation_matrix -----------------------------------------


def test_segment_nation_matrix_matches_bruteforce(spark):
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    nations = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    }
    cells = defaultdict(list)
    for r in cust:
        cells[(r["c_mktsegment"], nations[r["c_nationkey"]])].append(
            _cents(r["c_acctbal"])
        )
    total = sum(len(v) for v in cells.values())

    out = {
        (r["c_mktsegment"], r["n_name"]): r
        for r in registry()["customer_segment_nation_matrix"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(cells)
    for key, vals in cells.items():
        row = out[key]
        assert row["n_customers"] == len(vals)
        assert row["sum_acctbal_cents"] == sum(vals)
        assert row["min_acctbal_cents"] == min(vals)
        assert row["max_acctbal_cents"] == max(vals)
        assert row["avg_acctbal"] == float(sum(vals)) / float(len(vals) * 100)
        assert row["share_permille"] == (1000 * len(vals)) // total


# --- embedding_label_centroid_spread ----------------------------------------

_QS = 1 << 20
_QOFF = 1 << 21


def test_centroid_spread_matches_bruteforce(spark):
    rows = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    by_label = defaultdict(list)
    for r in rows:
        by_label[r["label"]].append([float(x) for x in r["embedding"]])

    out = {
        r["label"]: r
        for r in registry()["embedding_label_centroid_spread"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(by_label)
    for label, vecs in by_label.items():
        # fixed-point centroid: quantize, integer mean, exact dyadic back
        dim = len(vecs[0])
        q = [[math.floor(x * _QS + 0.5) + _QOFF for x in v] for v in vecs]
        cd = [
            (sum(col) // len(vecs) - _QOFF) / _QS
            for col in zip(*q)
        ]
        cosines = []
        nc = math.sqrt(_fold([c * c for c in cd]))
        for v in vecs:
            dot = _fold([a * b for a, b in zip(v, cd)])
            nm = math.sqrt(_fold([a * a for a in v]))
            cosines.append(dot / (nm * nc))
        micro = [math.floor(c * 1e6 + 0.5) for c in cosines]
        row = out[label]
        assert row["n_members"] == len(vecs)
        assert row["mean_cos"] == float(sum(micro)) / float(len(vecs) * 1000000)
        assert row["min_cos"] == min(cosines)
        assert row["max_cos"] == max(cosines)
        # sanity: members of one label should cohere more than -1
        assert row["mean_cos"] > -1.0


def _fold(terms):
    acc = 0.0
    for t in terms:
        acc = acc + t
    return acc


# --- text_cross_lang_length_ratio -------------------------------------------


def test_cross_lang_length_ratio_matches_bruteforce(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    g = defaultdict(lambda: [0, 0])  # (source, lang) -> [n, sum_chars]
    for r in docs:
        cell = g[(r["source"], r["lang"])]
        cell[0] += 1
        cell[1] += r["n_chars"]

    out = {
        (r["source"], r["lang"]): r
        for r in registry()["text_cross_lang_length_ratio"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(g)
    for (source, lang), (n, s) in g.items():
        row = out[(source, lang)]
        assert row["n_docs"] == n
        assert row["sum_chars"] == s
        assert row["mean_chars"] == float(s) / float(n)
        en_n, en_s = g[(source, "en")]
        assert row["ratio_vs_en"] == float(s * en_n) / float(en_s * n)
        if lang == "en":
            assert row["ratio_vs_en"] == 1.0  # exact: a/a of exact ints
