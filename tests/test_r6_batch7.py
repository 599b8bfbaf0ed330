"""Semantic tests for the round-6 batch-7 operators (brute-force Python
ground truth, independent of the DuckDB oracle)."""

import re
from collections import Counter, defaultdict

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_01 = "/root/testdata/sf0.01"  # sparse subgraph is empty at sf0.001


def test_readability_fk_matches_bruteforce(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    out = {
        r["doc_id"]: r
        for r in registry()["text_readability_fk"].fn(spark, SF_DIR).collect()
    }
    for d in docs:
        w = len([t for t in re.split(r"\s+", d["text"]) if t != ""])
        s = max(len(re.findall(r"[.!?]+", d["text"])), 1)
        y = len(re.findall(r"[aeiouy]+", d["text"]))
        row = out[d["doc_id"]]
        assert row["n_words"] == w
        assert row["n_sentences"] == s
        assert row["n_syllables"] == y
        if w:
            assert row["fk_grade"] == (0.39 * (w / s) + 11.8 * (y / w)) - 15.59
        else:
            assert row["fk_grade"] is None


def _edges(spark, sf_dir):
    return [
        (r["u"], r["v"], r["w"])
        for r in registry()["graph_cooccurrence_edges"].fn(spark, sf_dir).collect()
    ]


def test_assortativity_matches_bruteforce(spark):
    edges = _edges(spark, SF_DIR)
    deg = Counter()
    for u, v, _ in edges:
        deg[u] += 1
        deg[v] += 1
    pairs = [(deg[u], deg[v]) for u, v, _ in edges]
    pairs += [(k, j) for j, k in pairs]
    m2 = len(pairs)
    s_j = sum(j for j, _ in pairs)
    s_jj = sum(j * j for j, _ in pairs)
    s_jk = sum(j * k for j, k in pairs)
    mu = s_j / m2
    want = (s_jk / m2 - mu * mu) / (s_jj / m2 - mu * mu)
    row = registry()["graph_assortativity"].fn(spark, SF_DIR).collect()[0]
    assert row["m2"] == m2
    assert row["s_j"] == s_j
    assert row["s_jj"] == s_jj
    assert row["s_jk"] == s_jk
    assert abs(row["assortativity"] - want) < 1e-12


def test_modularity_matches_bruteforce(spark):
    edges = [
        (u, v)
        for u, v, w in _edges(spark, SF_DIR_01)
        if w >= 4 and u % 3 == 0 and v % 3 == 0
    ]
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    comp = {}
    for start in adj:
        if start in comp:
            continue
        stack, members = [start], []
        seen = {start}
        while stack:
            n = stack.pop()
            members.append(n)
            for nb in adj[n]:
                if nb not in seen:
                    seen.add(nb)
                    stack.append(nb)
        label = min(members)
        for n in members:
            comp[n] = label
    m = len(edges)
    m_c, d_c = Counter(), Counter()
    for u, v in edges:
        if comp[u] == comp[v]:
            m_c[comp[u]] += 1
        d_c[comp[u]] += 1
        d_c[comp[v]] += 1
    q_num = sum(4 * m * m_c.get(c, 0) - d_c[c] * d_c[c] for c in d_c)
    row = registry()["graph_modularity_score"].fn(spark, SF_DIR_01).collect()[0]
    assert row["n_edges"] == m
    assert row["n_communities"] == len(d_c)
    assert row["q_num"] == q_num
    assert row["q_den"] == 4 * m * m
    assert row["modularity"] == q_num / (4 * m * m)
