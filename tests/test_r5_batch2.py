"""Semantic tests for the r5 batch-2 operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkmerge.queries import registry

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bpe_apply_is_shuffle_free_and_monotone(spark):
    df = registry()["pipeline_bpe_apply"].fn(spark, SF_DIR)
    assert "Exchange" not in plan_of(df), "merges.txt replay must be map-side"
    rows = df.collect()
    assert rows
    for r in rows:
        # merges only ever shrink the symbol stream, never below word count
        assert r["n_symbols"] >= r["n_words"] >= 0


def test_bpe_apply_merges_compose(spark):
    # "the" must collapse t+h then th+e into ONE symbol
    from sparkmerge.queries.ext_corpus import _BPE_MERGES

    assert ("t", "h") in _BPE_MERGES and ("th", "e") in _BPE_MERGES
    df = spark.createDataFrame([(1, "the the")], "doc_id long, text string")
    import sparkmerge.queries.ext_corpus as ec

    # the registered fn loads from sf_dir; apply the same expression inline
    words = F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")

    def apply_merges(w):
        s = F.concat(F.lit("|"), F.array_join(F.split(w, ""), "| |"), F.lit("|"))
        for a, b in ec._BPE_MERGES:
            s = F.replace(s, F.lit(f"|{a}| |{b}|"), F.lit(f"|{a}{b}|"))
        return s

    merged = df.select(F.transform(words, apply_merges).alias("m")).first()["m"]
    assert merged == ["|the|", "|the|"]


def test_phonetic_key_blocks_similar_words(spark):
    from sparkmerge.queries.ext_dedup import _phonetic_col

    df = spark.createDataFrame(
        [("robert",), ("rupert",), ("smith",), ("smyth",), ("alpha",)], "w string"
    )
    keys = {r["w"]: r["k"] for r in df.select("w", _phonetic_col(F.col("w")).alias("k")).collect()}
    assert keys["robert"] == keys["rupert"]  # classic soundex pair
    assert keys["smith"] == keys["smyth"]
    assert keys["alpha"] != keys["smith"]
    assert all(len(k) == 4 for k in keys.values())


def test_temperature_mix_bounds(spark):
    rows = registry()["pipeline_mix_temperature"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r["rel_weight"] <= 1.0
        assert r["upsample_rate"] >= 1.0
        # alpha=0.5 identity: rel_weight * upsample_rate == 1 (same two
        # sqrt values, inverse ratio)
        assert abs(r["rel_weight"] * r["upsample_rate"] - 1.0) < 1e-12


def test_binary_files_roundtrip_content(spark):
    rows = registry()["scan_binary_files"].fn(spark, SF_DIR).collect()
    assert rows and all(r["n_bytes"] > 0 for r in rows)
    # every 5th doc id present exactly once
    ids = sorted(r["doc_id"] for r in rows)
    assert ids == sorted(set(ids)) and all(i % 5 == 0 for i in ids)


def test_outer_stream_join_null_rows_exist_and_match_batch(spark):
    df = registry()["stream_outer_join_watermark"].fn(spark, SF_DIR)
    rows = df.collect()
    nulls = [r for r in rows if r["purchase_id"] is None]
    matched = [r for r in rows if r["purchase_id"] is not None]
    assert nulls and matched, "outer join must emit both padded and matched rows"
    # every matched purchase follows its click within 30 min (batch check)
    from sparkmerge.queries import load

    ev = {r["event_id"]: r for r in load(spark, SF_DIR, "events").collect()}
    for r in matched[:100]:
        c, p = ev[r["click_id"]], ev[r["purchase_id"]]
        assert p["user_id"] == c["user_id"]
        gap = (p["ts"] - c["ts"]).total_seconds()
        assert 0 < gap <= 1800


def test_abtest_lift_counts_are_consistent(spark):
    r = registry()["events_abtest_lift"].fn(spark, SF_DIR).first()
    assert r["treat_conv"] <= r["treat_users"]
    assert r["ctrl_conv"] <= r["ctrl_users"]
    assert r["lift_ratio"] > 0


def test_substring_dup_spans_detects_copied_passage(spark):
    from sparkmerge.queries.ext_corpus import _SS_STRIDE, _SS_W  # noqa: F401

    passage = "the quick brown fox jumps over the lazy dog and keeps running onward" * 2
    docs = spark.createDataFrame(
        [
            (1, "unique alpha text " + "a" * 120),
            (2, "prefix one " + passage + " suffix one"),
            (3, "prefix two " + passage + " suffix two"),
        ],
        "doc_id long, text string",
    )
    from pyspark.sql import functions as F

    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text") - F.lit(_SS_W - 1), F.lit(1)), F.lit(_SS_STRIDE)
    )
    pos = docs.select("doc_id", F.explode(starts).alias("p"), "text").select(
        "doc_id", F.expr(f"substr(text, p, {_SS_W})").alias("sh")
    )
    rep = pos.groupBy("sh").agg(F.countDistinct("doc_id").alias("nd")).filter("nd >= 2")
    hits = (
        pos.join(rep.select("sh"), "sh")
        .groupBy("doc_id").count().collect()
    )
    by_doc = {r["doc_id"]: r["count"] for r in hits}
    assert 1 not in by_doc            # unique doc has no cross-doc shingle
    assert by_doc.get(2, 0) > 0 and by_doc.get(3, 0) > 0


def test_listagg_ordering_is_balance_desc(spark):
    rows = registry()["agg_listagg_ordered"].fn(spark, SF_DIR).collect()
    assert rows
    from sparkmerge.queries import load

    c = {r["c_custkey"]: r["c_acctbal"] for r in load(spark, SF_DIR, "customer").collect()}
    for r in rows:
        keys = [int(k) for k in r["top_keys"].split(",")]
        bals = [c[k] for k in keys]
        # strict check: (bal desc, key asc)
        enc = [(-b, k) for b, k in zip(bals, keys)]
        assert enc == sorted(enc)


def test_xpath_roundtrip_handles_all_priorities(spark):
    rows = registry()["fn_xml_xpath"].fn(spark, SF_DIR).collect()
    assert rows and all(r["prio"] and r["status"] for r in rows)
