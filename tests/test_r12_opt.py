"""Round-12 optimization regression tests.

The r12 optimization round restructured the set-similarity internals
(sparkmerge/ext/dedup.py): both exact prefix paths went class-grain
(collapse to distinct token-set classes → pair the representatives →
map-side member expansion), gained the PPJoin positional filter and
xxhash64 candidate join keys, and learned a ``probe`` pruning hint that
mirrors the registered ops' ``a_id % 20`` sampling.  These are all
output-IDENTICAL transformations — this file pins that with brute-force
ground truth on a corpus engineered to hit the new machinery's edges:
duplicate token sets (multi-member classes, including across the sampling
boundary), empty/whitespace docs, multiple groups, and containment's
small-in-big asymmetry.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sparkmerge.ext.dedup import containment_pairs, ngram_jaccard_pairs


def _corpus(spark):
    rows = [
        # class of three identical token sets (reordered/duplicated words),
        # member ids straddling the %20 sampling boundary (0, 21, 40)
        Row(doc_id=0, text="alpha beta gamma delta", lang="en"),
        Row(doc_id=21, text="delta gamma beta alpha", lang="en"),
        Row(doc_id=40, text="alpha alpha beta gamma delta delta", lang="en"),
        # near-dup of the class above (3/5 overlap at J = 0.6)
        Row(doc_id=3, text="alpha beta gamma epsilon zeta", lang="en"),
        # a small doc contained in a bigger one (containment 1, low J)
        Row(doc_id=20, text="alpha beta", lang="en"),
        Row(doc_id=5, text="alpha beta gamma delta epsilon zeta eta theta", lang="en"),
        # same token set, different group: must never pair cross-group
        Row(doc_id=6, text="alpha beta gamma delta", lang="de"),
        Row(doc_id=7, text="beta alpha gamma delta", lang="de"),
        # empty / whitespace-only docs: no pairs ever
        Row(doc_id=8, text="", lang="en"),
        Row(doc_id=9, text="   ", lang="de"),
        # singletons
        Row(doc_id=10, text="omicron pi rho", lang="en"),
        Row(doc_id=11, text="sigma tau upsilon phi", lang="de"),
    ]
    return spark.createDataFrame(rows)


def _token_sets(rows):
    out = {}
    for r in rows:
        toks = frozenset(t for t in r.text.lower().split() if t)
        out[r.doc_id] = (r.lang, toks)
    return out


def _brute_jaccard(rows, threshold):
    ts = _token_sets(rows)
    got = {}
    for a, b in itertools.combinations(sorted(ts), 2):
        la, sa = ts[a]
        lb, sb = ts[b]
        if la != lb or not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            got[(a, b)] = j
    return got


def _brute_containment(rows, threshold):
    ts = _token_sets(rows)
    got = {}
    for a, b in itertools.permutations(sorted(ts), 2):
        la, sa = ts[a]
        lb, sb = ts[b]
        if la != lb or not sa or not sb:
            continue
        c = len(sa & sb) / len(sa)
        if c >= threshold:
            got[(a, b)] = c
    return got


@pytest.mark.parametrize("threshold", [0.5, 0.6, 0.9, 1.0])
def test_class_grain_jaccard_matches_brute_force(spark, threshold):
    docs = _corpus(spark)
    rows = docs.collect()
    got = {
        (r.a_id, r.b_id): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", "lang", threshold=threshold
        ).collect()
    }
    assert got == _brute_jaccard(rows, threshold)


@pytest.mark.parametrize("threshold", [0.5, 0.9, 0.95, 1.0])
def test_class_grain_containment_matches_brute_force(spark, threshold):
    docs = _corpus(spark)
    rows = docs.collect()
    got = {
        (r.a_id, r.b_id): r.containment
        for r in containment_pairs(
            docs, "doc_id", "text", "lang", threshold=threshold
        ).collect()
    }
    assert got == _brute_containment(rows, threshold)


def test_probe_hint_is_output_identical_after_sampling_filter(spark):
    """The probe hint prunes candidate generation, never output: the
    registered ops' shape — probe + the a_id sampling filter — must equal
    the unhinted path + the same filter.  The corpus plants a class whose
    members straddle the boundary (least member sampled via doc_id 0 and
    20) AND pairs whose only sampled endpoint is the greater id (dropped
    by the filter on both paths)."""
    docs = _corpus(spark)
    mod = lambda c: c % 20 == 0  # noqa: E731

    for fn, val in ((ngram_jaccard_pairs, "jaccard"), (containment_pairs, "containment")):
        thr = 0.5 if fn is ngram_jaccard_pairs else 0.9
        plain = {
            (r.a_id, r.b_id): r[val]
            for r in fn(docs, "doc_id", "text", "lang", threshold=thr)
            .filter(F.col("a_id") % 20 == 0)
            .collect()
        }
        probed = {
            (r.a_id, r.b_id): r[val]
            for r in fn(docs, "doc_id", "text", "lang", threshold=thr, probe=mod)
            .filter(F.col("a_id") % 20 == 0)
            .collect()
        }
        assert probed == plain, f"{fn.__name__} probe hint changed output"
        assert plain, f"{fn.__name__} sampled fixture surfaced no pairs"


def test_lsh_blocking_still_subset_of_exact(spark):
    """Lever contract after the class-grain refactor: lsh output ⊆ exact
    output with identical values on the shared pairs (the candidate router
    is the only difference)."""
    docs = _corpus(spark)
    exact = {
        (r.a_id, r.b_id): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", "lang", threshold=0.5
        ).collect()
    }
    lever = {
        (r.a_id, r.b_id): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", "lang", threshold=0.5, blocking="lsh"
        ).collect()
    }
    assert set(lever) <= set(exact)
    assert all(exact[k] == v for k, v in lever.items())
