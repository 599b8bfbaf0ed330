"""Behavior + plan-shape tests for the round-4 ext_curation operators
(chunking, up-sampling, curriculum order, reservoir sample, markup strip,
range search, correlation pairs, TF-IDF keywords)."""


import re

from pyspark.sql import functions as F

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_chunk_split_covers_every_token(spark):
    # chunk windows tile each doc: starts every 48 tokens, each chunk
    # <=64 tokens, the last chunk is the only short one
    df = registry()["pipeline_chunk_split"].fn(spark, SF_DIR)
    rows = df.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    toks = {
        r["doc_id"]: r["n"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", F.size(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("n"))
        .collect()
    }
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        n = toks[doc]
        assert len(chunks) == len(range(0, n, 48))
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        for i, c in enumerate(chunks):
            start = i * 48
            assert c["n_chunk_tokens"] == min(64, n - start)
            assert len(c["chunk_text"].split(" ")) == c["n_chunk_tokens"]


def test_chunk_split_is_shuffle_free(spark):
    plan = plan_of(registry()["pipeline_chunk_split"].fn(spark, SF_DIR))
    assert "Exchange" not in plan, plan


def test_repeat_upsample_matches_weights(spark):
    df = registry()["pipeline_repeat_upsample"].fn(spark, SF_DIR)
    rows = df.collect()
    # every (doc, copy) unique; copies run 1..n_rep
    seen = set()
    per_doc = {}
    for r in rows:
        key = (r["doc_id"], r["copy_id"])
        assert key not in seen
        seen.add(key)
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rs in per_doc.items():
        n_rep = rs[0]["n_rep"]
        assert sorted(r["copy_id"] for r in rs) == list(range(1, n_rep + 1))
        src = rs[0]["source"]
        lo = 2 if src in {f"src{i}" for i in range(5)} else (
            1 if src in {f"src{i}" for i in range(5, 10)} else 1
        )
        hi = 3 if src in {f"src{i}" for i in range(5)} else (
            2 if src in {f"src{i}" for i in range(5, 10)} else 1
        )
        assert lo <= n_rep <= hi, (src, n_rep)
    # aggregate repeat factor approximates the fractional weights
    n_docs = len(per_doc)
    assert len(rows) > n_docs  # upsampling actually upsampled


def test_curriculum_stages_are_ordered_by_length(spark):
    df = registry()["pipeline_curriculum_order"].fn(spark, SF_DIR)
    rows = df.collect()
    assert {r["stage"] for r in rows} <= {0, 1, 2}
    # positions are dense 1..k within each (stage, shard)
    groups = {}
    for r in rows:
        groups.setdefault((r["stage"], r["shard"]), []).append(r["pos"])
    for key, ps in groups.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), key


def test_reservoir_sample_is_k_per_stratum_and_stable(spark):
    df = registry()["agg_reservoir_sample"].fn(spark, SF_DIR)
    rows = df.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    for lang, ids in by_lang.items():
        assert len(ids) <= 20
        assert len(set(ids)) == len(ids)
    # rerun picks the identical sample (hash-based, no RNG)
    again = {(r["lang"], r["doc_id"]) for r in registry()["agg_reservoir_sample"].fn(spark, SF_DIR).collect()}
    assert {(r["lang"], r["doc_id"]) for r in rows} == again


def test_markup_strip_removes_all_tags_and_entities(spark):
    df = registry()["text_markup_strip"].fn(spark, SF_DIR)
    rows = df.collect()
    for r in rows:
        assert "<" not in r["cleaned"] and ">" not in r["cleaned"]
        assert "&amp;" not in r["cleaned"] and "&nbsp;" not in r["cleaned"]
        assert "src & more" in r["cleaned"]
        assert not re.search(r"\s\s", r["cleaned"])  # whitespace normalized
        assert r["n_tags"] >= 7  # wrapper injects 7 tags minimum
        assert r["n_entities"] >= 2


def test_range_search_matches_brute_force_and_stays_mapside(spark):
    df = registry()["ann_range_search"].fn(spark, SF_DIR)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["sim"] >= 0.25 and r["q_id"] != r["n_id"]
    # no shuffle: broadcast + filter only (radius search never windows)
    plan = plan_of(df)
    assert "Exchange" not in plan.replace("BroadcastExchange", ""), plan


def test_corr_pairs_values_are_sane(spark):
    df = registry()["agg_corr_pairs"].fn(spark, SF_DIR)
    rows = {r["pair"]: r["corr"] for r in df.collect()}
    assert set(rows) == {
        "quantity_extendedprice",
        "quantity_discount",
        "extendedprice_tax",
    }
    for pair, c in rows.items():
        assert -1.0 <= c <= 1.0, (pair, c)
    # the fixed-association integer formula must agree with an independent
    # float recomputation to float precision (the corpus columns are drawn
    # independently, so the values themselves are near zero)
    import numpy as np

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_quantity", "l_extendedprice"
    ).toPandas()
    q = li["l_quantity"].to_numpy().astype("int64")
    e = np.round(li["l_extendedprice"].to_numpy()).astype("int64")
    expect = np.corrcoef(q, e)[0, 1]
    # numpy mean-centers with float accumulation; agreement to ~1e-6 is the
    # cross-implementation bound (bit-exactness is asserted vs the ORACLE,
    # which replays the identical fixed-association formula)
    assert abs(rows["quantity_extendedprice"] - expect) < 1e-6


def test_tfidf_rare_tokens_outscore_common(spark):
    df = registry()["text_keyword_tfidf"].fn(spark, SF_DIR)
    rows = df.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rs in by_doc.items():
        assert len(rs) <= 3
        rs.sort(key=lambda r: r["rk"])
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
    # df table and corpus stats stay broadcast — the token stream shuffles
    # only for its own aggregations, never for the stats join
    plan = plan_of(df)
    assert "BroadcastExchange" in plan
