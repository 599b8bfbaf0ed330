"""[EXT] retrieval & sequence-statistics operators (SURVEY.md §2.D additions):
BM25 keyword retrieval, the BPE pair-count kernel, and user-journey
transition counts.

FP discipline: BM25's usual ln() idf is a transcendental whose last bit is
not guaranteed to agree across engines, so the score here keeps the idf as
the exact odds ratio (2N-2df+1)/(2df+1) and folds each term's contribution
into ONE integer-exact numerator and denominator; the only floating-point
operations are a single IEEE division per term and the same left-fold sum
the cosine ops use — bit-identical in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparkmerge.queries import load, register

_WS = r"\s+"
_TOKS = f"list_filter(string_split_regex(lower(text), '{_WS}'), x -> x <> '')"

# fixed benchmark query; k1 = 6/5, b = 3/4 folded into the integer formula
_BM25_TERMS = ["merge", "hash", "window"]
_BM25_K = 10


def _bm25_term_sql(i: int) -> str:
    # A = (2N - 2df + 1) * 44 * T * tf ;  B = (2df + 1) * (20*T*tf + 6*T + 18*dl*N)
    a = f"((2 * g.n - 2 * g.df{i} + 1) * 44 * g.t * p.tf{i})"
    b = f"((2 * g.df{i} + 1) * (20 * g.t * p.tf{i} + 6 * g.t + 18 * p.dl * g.n))"
    return f"(CAST({a} AS DOUBLE) / CAST({b} AS DOUBLE))"


def _bm25_ranked_cte() -> str:
    """Shared CTE chain ending in ``ranked(doc_id, dl, score, rank)`` —
    used by both the bm25 oracle and the NDCG eval oracle."""
    tf_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN w = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    score = "0.0"
    for i in range(len(_BM25_TERMS)):
        score = f"({score} + {_bm25_term_sql(i)})"
    any_tf = " + ".join(f"p.tf{i}" for i in range(len(_BM25_TERMS)))
    return f"""words AS (SELECT doc_id, unnest({_TOKS}) AS w FROM documents),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl,
         {tf_cols}
    FROM words GROUP BY doc_id),
g AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         CAST(sum(dl) AS BIGINT) AS t,
         {df_cols}
    FROM per),
ranked AS (
  SELECT p.doc_id, p.dl, {score} AS score,
         row_number() OVER (ORDER BY {score} DESC, p.doc_id) AS rank
    FROM per p CROSS JOIN g
   WHERE {any_tf} > 0)"""


def _bm25_oracle_sql() -> str:
    return f"""
WITH {_bm25_ranked_cte()}
SELECT doc_id, dl, score, CAST(rank AS INT) AS rank FROM ranked
 WHERE rank <= {_BM25_K}
"""


@register(
    "text_bm25_topk",
    oracle=_bm25_oracle_sql(),
    description="BM25 keyword retrieval (k1=1.2, b=0.75) for a fixed query, "
    "top-10 by score: one explode+aggregate pass builds per-doc tf/dl with "
    "map-side combine, the corpus stats row (N, total tokens, per-term df) is "
    "broadcast back, scoring is map-side; idf kept as an exact odds ratio so "
    "the whole score is integer math plus one IEEE division per term — "
    "bit-reproducible against DuckDB with no transcendentals",
)
def text_bm25_topk(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), _WS), lambda x: x != "")
    words = d.select("doc_id", F.explode(toks).alias("w"))
    per = words.groupBy("doc_id").agg(
        F.count("*").alias("dl"),
        *[
            F.sum(F.when(F.col("w") == t, 1).otherwise(0)).alias(f"tf{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    )
    g = per.agg(
        F.sum("dl").alias("t"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    ).crossJoin(F.broadcast(d.agg(F.count("*").alias("n"))))
    score = F.lit(0.0)
    for i in range(len(_BM25_TERMS)):
        a = (2 * F.col("n") - 2 * F.col(f"df{i}") + 1) * 44 * F.col("t") * F.col(f"tf{i}")
        b = (2 * F.col(f"df{i}") + 1) * (
            20 * F.col("t") * F.col(f"tf{i}") + 6 * F.col("t") + 18 * F.col("dl") * F.col("n")
        )
        score = score + a.cast("double") / b.cast("double")
    any_tf = sum(F.col(f"tf{i}") for i in range(len(_BM25_TERMS)))
    scored = (
        per.crossJoin(F.broadcast(g))
        .filter(any_tf > 0)
        .select("doc_id", "dl", score.alias("score"))
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _BM25_K)
        .select("doc_id", "dl", "score", F.col("rank").cast("int").alias("rank"))
    )


@register(
    "bpe_pair_counts",
    oracle=f"""
WITH toks AS (SELECT {_TOKS} AS t FROM documents),
idx AS (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks),
pairs AS (SELECT t[i] || ' ' || t[i + 1] AS pair FROM idx)
SELECT pair, cnt FROM (
  SELECT pair, CAST(count(*) AS BIGINT) AS cnt,
         row_number() OVER (ORDER BY count(*) DESC, pair) AS rk
    FROM pairs GROUP BY pair) x
 WHERE rk <= 20
""",
    description="the BPE merge-learning kernel: count adjacent token pairs "
    "across the corpus and return the 20 most frequent (the pair a BPE "
    "trainer would merge next, iterated).  Token arrays are materialized "
    "once per row behind the Generate barrier — the index-transform lambda "
    "reads the array attribute, not a re-evaluated split — then one "
    "explode + map-side-combined count; top-20 via TakeOrdered-shaped rank",
)
def bpe_pair_counts(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), _WS), lambda x: x != "")
    tokd = d.select(toks.alias("tok"))
    # Spark's sequence(1, 0) is DESCENDING [1, 0], not empty — guard short docs
    idxs = F.when(
        F.size("tok") >= 2, F.sequence(F.lit(1), F.size("tok") - 1)
    ).otherwise(F.array().cast("array<int>"))
    pair_arr = F.transform(
        idxs,
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("tok"), i), F.element_at(F.col("tok"), i + 1)
        ),
    )
    pairs = tokd.select(F.explode(pair_arr).alias("pair"))
    counts = pairs.groupBy("pair").agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), F.asc("pair"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("pair", "cnt")
    )


@register(
    "events_transition_counts",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events)
SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
 GROUP BY prev_type, event_type
""",
    description="user-journey Markov transition matrix: per-user event "
    "streams ordered by (ts, event_id), lag() pairs each event with its "
    "predecessor, then a global (prev, next) count.  One shuffle for the "
    "per-user window (keyed on user_id — the natural even partitioning) and "
    "a map-side-combined count over a type-squared-sized result",
)
def events_transition_counts(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    return seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n")
    )


# --- bpe_train_rounds: the iterative BPE trainer (k fixed merge rounds) ---

_BPE_ROUNDS = 3
_BPE_TOPW = 2000

# Symbol-sequence encoding that makes plain leftmost-nonoverlapping string
# replace() EXACTLY the greedy left-to-right BPE merge in BOTH engines:
# every symbol is wrapped in '|' (alphabet is [a-z]+, so '|' never occurs
# inside a symbol) and symbols are joined by one space -- "the" becomes
# "|t| |h| |e|".  The wrapping pipes give every match a hard boundary on
# both sides (pattern "|b| |c|" cannot match inside "|ab| |c|"), and runs
# resolve greedily exactly like the per-word fold: "|a| |a| |a| |a|" under
# pattern "|a| |a|" -> "|aa| |aa|"; odd runs leave the tail symbol.


def _bpe_words_sql() -> str:
    return f"""
  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
    FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
            FROM documents)
   GROUP BY w
   ORDER BY freq DESC, word
   LIMIT {_BPE_TOPW}
""".strip()


def _bpe_round_sql(r: int) -> str:
    """CTEs for round r: pair counts over s{r-1}, the winning pair, s{r}."""
    return f"""
pr{r} AS (
  SELECT l[i] || ' ' || l[i + 1] AS pat, CAST(sum(freq) AS BIGINT) AS cnt
    FROM (SELECT l, freq, unnest(generate_series(1, len(l) - 1)) AS i
            FROM (SELECT string_split(syms, ' ') AS l, freq FROM s{r - 1}))
   GROUP BY 1),
win{r} AS (
  SELECT pat, '|' || replace(replace(pat, '|', ''), ' ', '') || '|' AS rep, cnt
    FROM pr{r} ORDER BY cnt DESC, pat LIMIT 1),
s{r} AS (
  SELECT replace(s.syms, w.pat, w.rep) AS syms, s.freq
    FROM s{r - 1} s CROSS JOIN win{r} w)
""".strip()


def _bpe_oracle_sql() -> str:
    rounds = ",\n".join(_bpe_round_sql(r) for r in range(1, _BPE_ROUNDS + 1))
    selects = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, replace(pat, '|', '') AS merged_pair, "
        f"cnt AS pair_count FROM win{r}"
        for r in range(1, _BPE_ROUNDS + 1)
    )
    return f"""
WITH w0 AS ({_bpe_words_sql()}),
s0 AS (
  SELECT '|' || array_to_string(string_split(word, ''), '| |') || '|' AS syms,
         freq
    FROM w0),
{rounds}
{selects}
""".strip()


@register(
    "bpe_train_rounds",
    oracle=_bpe_oracle_sql(),
    description=f"iterative BPE training, {_BPE_ROUNDS} merge rounds over the "
    f"top-{_BPE_TOPW} word types: per round, frequency-weighted adjacent-pair "
    "counts pick a deterministic winner ((count desc, pair asc) -- the merge a "
    "BPE trainer learns next), and the merge is applied to every word via ONE "
    "boundary-safe string replace (pipe-wrapped symbols make leftmost-"
    "nonoverlapping replace equal the greedy per-word fold, identically in "
    "both engines).  The winner joins back by broadcast cross-join -- fully "
    "declarative, no driver-side collect; per round: one agg shuffle + one "
    "map-side merge, the fixed-point family shape (kmeans/pagerank)",
)
def bpe_train_rounds(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    words = (
        d.select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("w"))
        .limit(_BPE_TOPW)
    )
    # "the" -> "|t| |h| |e|": wrap every char, join with one space
    syms0 = F.concat(
        F.lit("|"), F.array_join(F.split(F.col("w"), ""), "| |"), F.lit("|")
    )
    state = words.select(syms0.alias("syms"), "freq")

    outs = []
    for r in range(1, _BPE_ROUNDS + 1):
        toks = F.split(F.col("syms"), " ")
        arr = state.select(toks.alias("l"), "freq")
        idxs = F.when(
            F.size(F.col("l")) >= 2, F.sequence(F.lit(1), F.size(F.col("l")) - 1)
        ).otherwise(F.array().cast("array<int>"))
        pair_arr = F.transform(
            idxs,
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("l"), i), F.element_at(F.col("l"), i + 1)
            ),
        )
        pairs = arr.select(F.explode(pair_arr).alias("pat"), "freq")
        counts = pairs.groupBy("pat").agg(F.sum("freq").alias("cnt"))
        win = (
            counts.orderBy(F.desc("cnt"), F.asc("pat"))
            .limit(1)
            .select(
                "pat",
                F.concat(
                    F.lit("|"),
                    F.translate(F.col("pat"), "| ", ""),
                    F.lit("|"),
                ).alias("rep"),
                "cnt",
            )
        )
        outs.append(
            win.select(
                F.lit(r).alias("round"),
                F.translate(F.col("pat"), "|", "").alias("merged_pair"),
                F.col("cnt").alias("pair_count"),
            )
        )
        state = state.crossJoin(F.broadcast(win)).select(
            F.replace(F.col("syms"), F.col("pat"), F.col("rep")).alias("syms"),
            "freq",
        )

    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# --- retrieval_ndcg_curve ------------------------------------------------

# rank-discount weights: floor(1e9 / log2(rank+1)) — precomputed integer
# constants so DCG stays exact int64 (the transcendental is evaluated once
# at authoring time, never per-engine)
import math as _math

_NDCG_W = [int(1_000_000_000 // _math.log2(i + 1)) for i in range(1, _BM25_K + 1)]
_REL_P = 1048573  # bounded integer mix (same prime family as ext_spatial)


def _w_case(col: str) -> str:
    whens = " ".join(
        f"WHEN {i} THEN {w}" for i, w in enumerate(_NDCG_W, start=1)
    )
    return f"CASE {col} {whens} END"


@register(
    "retrieval_ndcg_curve",
    oracle=f"""
WITH {_bm25_ranked_cte()},
top AS (SELECT doc_id, CAST(rank AS INT) AS k FROM ranked
         WHERE rank <= {_BM25_K}),
relg AS (
  SELECT doc_id, k,
         CAST((((doc_id % {_REL_P}) * 2654435761) % 4294967296) % 4
              AS BIGINT) AS rel
    FROM top),
gains AS (
  SELECT doc_id, k, rel,
         rel * {_w_case('k')} AS gain,
         CAST(row_number() OVER (ORDER BY rel DESC, doc_id) AS INT) AS ik
    FROM relg),
dcg AS (
  SELECT doc_id, k, rel,
         CAST(sum(gain) OVER (ORDER BY k) AS BIGINT) AS dcg_scaled
    FROM gains),
idcg AS (
  SELECT ik,
         CAST(sum(rel * {_w_case('ik')}) OVER (ORDER BY ik) AS BIGINT)
           AS idcg_scaled
    FROM gains)
SELECT d.k, d.doc_id, d.rel, d.dcg_scaled, i.idcg_scaled,
       CASE WHEN i.idcg_scaled = 0 THEN 0.0
            ELSE CAST(d.dcg_scaled AS DOUBLE) / CAST(i.idcg_scaled AS DOUBLE)
       END AS ndcg
  FROM dcg d JOIN idcg i ON i.ik = d.k
""",
    description="ranking-quality evaluation of the BM25 top-10: NDCG@k for "
    "every k — graded relevance from a deterministic integer mix of "
    "doc_id, DCG with PRECOMPUTED integer rank-discount weights "
    "(floor(1e9/log2(r+1)) — no per-engine transcendentals), ideal "
    "ordering via one rank window over the same 10 rows, NDCG as ONE "
    "IEEE division of two exact int64 cumulative sums; everything after "
    "the (already-bounded) retrieval runs on k rows — cost is the "
    "retrieval itself",
)
def retrieval_ndcg_curve(spark, sf_dir):
    top = text_bm25_topk(spark, sf_dir).select(
        "doc_id", F.col("rank").cast("int").alias("k")
    )
    rel = (((F.col("doc_id") % _REL_P) * 2654435761) % 4294967296) % 4
    relg = top.select("doc_id", "k", rel.cast("long").alias("rel"))

    def wexpr(col):
        e = F.when(F.col(col) == 1, F.lit(_NDCG_W[0]))
        for i, w in enumerate(_NDCG_W[1:], start=2):
            e = e.when(F.col(col) == i, F.lit(w))
        return e

    gains = relg.select(
        "doc_id",
        "k",
        "rel",
        (F.col("rel") * wexpr("k")).alias("gain"),
        F.row_number()
        .over(Window.orderBy(F.desc("rel"), F.asc("doc_id")))
        .cast("int")
        .alias("ik"),
    )
    dcg = gains.select(
        "doc_id",
        "k",
        "rel",
        F.sum("gain").over(Window.orderBy("k")).alias("dcg_scaled"),
    )
    idcg = gains.select(
        "ik",
        F.sum(F.col("rel") * wexpr("ik"))
        .over(Window.orderBy("ik"))
        .alias("idcg_scaled"),
    )
    return (
        dcg.join(idcg, dcg["k"] == idcg["ik"])
        .select(
            "k",
            "doc_id",
            "rel",
            "dcg_scaled",
            "idcg_scaled",
            F.when(F.col("idcg_scaled") == 0, F.lit(0.0))
            .otherwise(
                F.col("dcg_scaled").cast("double")
                / F.col("idcg_scaled").cast("double")
            )
            .alias("ndcg"),
        )
    )
