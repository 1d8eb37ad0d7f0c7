r"""Corpus/statistics analysis entries: TF-IDF, heavy-hitter terms,
and table column profiling.

Extends the text-analysis surface (SURVEY §7 LLM-data scope: quality
scoring, token counting already in operators/text.py) with the two
classic corpus statistics a training-data pipeline computes — TF-IDF
term weighting and document-frequency heavy hitters — plus the
data-profiling introspection an engine needs for ANALYZE-style stats
(the reference's only profiling is row-count monitoring,
README.md:240, 271-278; SURVEY §2.1 S8).

Scale notes (100 TB):
- TF-IDF: term frequencies aggregate per (doc, term) FIRST (map-side
  combine on the tokenizer output), document frequencies per term
  second; the corpus size N is a 1-row broadcast.  The only big
  shuffle is term-keyed — skew from stopword terms is the known
  hazard, and AQE skew-join handles it (or pre-filter stopwords).
- Heavy hitters: exact two-phase agg; the support threshold is a
  1-row broadcast, never a driver-side collect.
- Profiling: one pass over the table computing every column's
  null/distinct/min/max simultaneously; multiple exact
  countDistincts expand the input (one projection per distinct agg) —
  at 100 TB swap to approx_count_distinct, same plan otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from nyc_taxi_data_clickhouse_spark.operators.text import tokens
from nyc_taxi_data_clickhouse_spark.suite import load_table, register


@register(
    "text_tfidf_topk",
    r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) AS raw,
             row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) DESC, tf.term
             ) AS rn
      FROM tf JOIN df USING (term) CROSS JOIN n)
    SELECT doc_id, term, round(raw, 4) AS tfidf
    FROM scored WHERE rn <= 3
    """,
    doc="TF-IDF term weighting: top-3 terms per document by "
    "tf*ln(N/df) with a lexicographic tie-break; per-(doc,term) tf "
    "aggregates first, corpus size N is a 1-row broadcast — the only "
    "big shuffle is term-keyed (stopword skew -> AQE skew join)",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n"))
    raw = F.col("tf") * F.log(F.col("n").cast("double") / F.col("df"))
    w = W.partitionBy("doc_id").orderBy(raw.desc(), "term")
    return (
        tf.join(df_, "term")
        .crossJoin(broadcast(n))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 3)
        .select("doc_id", "term", F.round(raw, 4).alias("tfidf"))
    )


@register(
    "heavy_hitter_terms",
    r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) AS term
      FROM documents),
    df AS (SELECT term, count(DISTINCT doc_id) AS n_docs FROM tok GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents)
    SELECT term, n_docs
    FROM df CROSS JOIN n
    WHERE n_docs > 0.25 * n
    ORDER BY n_docs DESC, term
    """,
    doc="document-frequency heavy hitters: terms present in >25% of "
    "documents — exact two-phase distinct agg; the support threshold "
    "is a 1-row broadcast (at extreme cardinality, swap the exact df "
    "agg for a count-min sketch, same downstream shape)",
)
def heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    df_ = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("n_docs"))
    n = docs.agg(F.count("*").alias("n"))
    return (
        df_.crossJoin(broadcast(n))
        .filter(F.col("n_docs") > 0.25 * F.col("n"))
        .select("term", "n_docs")
        .orderBy(F.col("n_docs").desc(), "term")
    )


#: columns profiled by profile_columns (orders table)
_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderpriority",
)


def _profile_oracle() -> str:
    parts = [
        f"""
        SELECT '{c}' AS col,
               count(*) - count({c}) AS n_nulls,
               count(DISTINCT {c}) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_val,
               CAST(max({c}) AS VARCHAR) AS max_val
        FROM orders
        """
        for c in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts)


@register(
    "profile_columns",
    _profile_oracle(),
    doc="ANALYZE-style column profiling (SURVEY §2.1 S8 extension): "
    "null count, exact distinct count, min/max per column, computed "
    "in ONE scan (all aggregates in a single agg node) and unpivoted "
    "with stack(); at 100 TB swap exact distinct for "
    "approx_count_distinct",
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one_row = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return one_row.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(col, n_nulls, n_distinct, min_val, max_val)"
        )
    )


@register(
    "chunk_documents",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS toks
      FROM documents),
    s AS (
      SELECT doc_id, toks,
             unnest(generate_series(1, greatest(len(toks), 1), 40)) AS start
      FROM t)
    SELECT doc_id,
           (start - 1) // 40 AS chunk_id,
           array_to_string(toks[start:start+49], ' ') AS chunk_text,
           CAST(len(toks[start:start+49]) AS BIGINT) AS n_tokens
    FROM s
    """,
    doc="document chunking for training/RAG pipelines: overlapping "
    "50-token windows at stride 40, entirely JVM-side "
    "(sequence -> explode -> slice -> array_join, no Python worker); "
    "map-only, so it scales as a pure narrow transform — chunk "
    "explosion multiplies rows ~len/stride, which partition sizing "
    "must budget for",
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    window, stride = 50, 40
    toked = docs.select("doc_id", tokens("text").alias("toks"))
    return (
        toked.select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.size("toks"), F.lit(1)),
                    F.lit(stride),
                )
            ).alias("start"),
        )
        .select(
            "doc_id",
            F.floor((F.col("start") - 1) / stride).alias("chunk_id"),
            F.array_join(F.slice("toks", F.col("start"), window), " ").alias(
                "chunk_text"
            ),
            F.size(F.slice("toks", F.col("start"), window))
            .cast("long")
            .alias("n_tokens"),
        )
    )


@register(
    "unigram_surprisal",
    r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) AS term
      FROM documents),
    cf AS (SELECT term, count(*) AS tf FROM tok GROUP BY term),
    tot AS (SELECT count(*) AS n FROM tok)
    SELECT doc_id,
           round(avg(-ln(CAST(tf AS DOUBLE) / n)), 6) AS surprisal
    FROM tok JOIN cf USING (term) CROSS JOIN tot
    GROUP BY doc_id
    """,
    doc="corpus-unigram surprisal (perplexity proxy for quality "
    "filtering): mean -ln p(term) per document under the corpus "
    "unigram model — the model is a (term, tf) relation joined back "
    "term-keyed (broadcast when vocab fits, AQE skew-join for "
    "stopword skew); total token count is a 1-row broadcast",
)
def unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    cf = tok.groupBy("term").agg(F.count("*").alias("tf"))
    tot = tok.agg(F.count("*").alias("n"))
    return (
        tok.join(cf, "term")
        .crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.avg(-F.log(F.col("tf").cast("double") / F.col("n"))), 6
            ).alias("surprisal")
        )
    )


@register(
    "text_repetition",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+') AS t,
             (CASE WHEN trim(text)='' THEN 0
                   ELSE len(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) END) AS n
      FROM documents),
    uni AS (SELECT doc_id, unnest(t) AS tok FROM toks WHERE n > 0),
    uc AS (SELECT doc_id, tok, count(*) AS c FROM uni GROUP BY 1, 2),
    us AS (SELECT doc_id, max(c) AS top_uni FROM uc GROUP BY 1),
    bi AS (SELECT doc_id,
                  unnest(list_transform(generate_series(1, len(t) - 1),
                         i -> t[i] || ' ' || t[i+1])) AS bg
           FROM toks WHERE n >= 2),
    bc AS (SELECT doc_id, bg, count(*) AS c FROM bi GROUP BY 1, 2),
    bs AS (SELECT doc_id, max(c) AS top_bi FROM bc GROUP BY 1)
    SELECT t.doc_id, t.n AS n_tokens,
           round(us.top_uni * 1.0 / t.n, 6) AS top_unigram_frac,
           round(bs.top_bi * 1.0 / (t.n - 1), 6) AS top_bigram_frac,
           t.n >= 5 AND (coalesce(us.top_uni * 1.0 / t.n > 0.3, FALSE)
             OR coalesce(bs.top_bi * 1.0 / (t.n - 1) > 0.2, FALSE)) AS repetitive
    FROM toks t LEFT JOIN us USING (doc_id) LEFT JOIN bs USING (doc_id)
    """,
    doc="§7 quality: Gopher/C4-style repetition signals — top-unigram "
    "and top-bigram fraction per document plus the composite "
    "'repetitive' gate (>0.3 / >0.2 thresholds, applied only at "
    "n_tokens >= 5 — fraction thresholds are meaningless on tiny "
    "docs, the Gopher length-floor convention).  Boilerplate- and "
    "template-spam detection: the single strongest cheap filter for "
    "web-scale corpora after exact dedup.  Shape: explode -> two-level "
    "hash agg, both keyed by (doc_id, gram) then doc_id — partial "
    "combine collapses within-doc repeats map-side, so the shuffle "
    "carries at most the distinct grams per doc; no windows, no "
    "driver state.  Blank docs keep n_tokens=0 with NULL fractions "
    "(token_count parity)",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    nonblank = docs.filter(F.trim("text") != "")
    tok = nonblank.select("doc_id", F.explode(tokens("text")).alias("tok"))
    us = (
        tok.groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("__top_uni"))
    )
    bg = (
        nonblank.withColumn("__t", tokens("text"))
        .filter(F.size("__t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(__t) - 2), "
                    "i -> concat(__t[i], ' ', __t[i+1]))"
                )
            ).alias("bg"),
        )
    )
    bs = (
        bg.groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("__top_bi"))
    )
    from nyc_taxi_data_clickhouse_spark.operators.text import token_count

    n = F.col("n_tokens")
    uni_frac = F.col("__top_uni") / n
    bi_frac = F.col("__top_bi") / (n - 1)
    return (
        docs.select("doc_id", token_count("text").alias("n_tokens"))
        .join(us, "doc_id", "left")
        .join(bs, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(uni_frac, 6).alias("top_unigram_frac"),
            F.round(bi_frac, 6).alias("top_bigram_frac"),
            (
                (n >= 5)
                & (
                    F.coalesce(uni_frac > 0.3, F.lit(False))
                    | F.coalesce(bi_frac > 0.2, F.lit(False))
                )
            ).alias("repetitive"),
        )
    )


@register(
    "text_bm25_topk",
    r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) AS term
      FROM documents),
    dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT avg(dl) AS avgdl, CAST(count(*) AS DOUBLE) AS n FROM dl),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
      FROM tok WHERE term IN ('table', 'scan', 'join')
      GROUP BY doc_id, term),
    df AS (
      SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
      FROM tok WHERE term IN ('table', 'scan', 'join')
      GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             sum(round(
               ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * (1.2 + 1)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)),
               6)) AS score
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
      GROUP BY tf.doc_id)
    SELECT doc_id, round(score, 4) AS bm25
    FROM scored ORDER BY score DESC, doc_id LIMIT 20
    """,
    doc="Okapi BM25 ranking (Robertson-Sparck Jones; k1=1.2, b=0.75) "
    "for a fixed 3-term query over the documents table: per-term "
    "contributions idf * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) with "
    "idf = ln(1+(N-df+0.5)/(df+0.5)), summed per doc, global top-20 "
    "with a doc_id tie-break.  Per-term scores are rounded to 6 dp "
    "before the cross-term sum so both engines add identical doubles "
    "regardless of aggregation order.  Scale shape: the only big "
    "shuffles are term-keyed tf and doc-keyed dl aggs; N/avgdl/df are "
    "1-row / 3-row broadcasts and the final global top-k is "
    "TakeOrderedAndProject, never a full sort.",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    query_terms = ("table", "scan", "join")
    k1, b = 1.2, 0.75
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    dl = tok.groupBy("doc_id").agg(F.count("*").cast("double").alias("dl"))
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count("*").cast("double").alias("n")
    )
    matched = tok.filter(F.col("term").isin(*query_terms))
    tf = matched.groupBy("doc_id", "term").agg(
        F.count("*").cast("double").alias("tf")
    )
    df_ = matched.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    contrib = F.round(
        F.log(1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        6,
    )
    scored = (
        tf.join(broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(contrib).alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
        .select("doc_id", F.round("score", 4).alias("bm25"))
    )


@register(
    "vocab_oov_rate",
    r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '[ \t\n\x0B\f\r]+')) AS term
      FROM documents),
    vocab AS (
      SELECT term FROM (
        SELECT term, count(*) AS cnt FROM tok GROUP BY term
        ORDER BY cnt DESC, term LIMIT 40) v),
    flagged AS (
      SELECT tok.doc_id,
             CASE WHEN vocab.term IS NULL THEN 1 ELSE 0 END AS oov
      FROM tok LEFT JOIN vocab USING (term))
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(oov) AS BIGINT) AS n_oov,
           round(sum(oov) * 1.0 / count(*), 4) AS oov_rate
    FROM flagged GROUP BY doc_id
    """,
    doc="tokenizer-style vocabulary induction + per-document OOV rate: "
    "the corpus' top-40 terms by frequency (count desc, lexicographic "
    "tie-break — deterministic) form the vocabulary; each document "
    "reports its token count and the fraction falling outside it — "
    "the signal a tokenizer-budget or domain-shift filter cuts on.  "
    "Scale shape: one term-keyed count agg (map-side combine absorbs "
    "hot terms), the vocabulary is a TakeOrderedAndProject whose "
    "result BROADCASTS to the membership join (the stream side never "
    "shuffles), then one doc-keyed agg.  At real vocab sizes (50k) "
    "the broadcast is still KBs.",
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    vocab = (
        tok.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "term")
        .limit(40)
        .select("term")
    )
    flagged = tok.join(
        broadcast(vocab.withColumn("__in", F.lit(1))), "term", "left"
    ).select("doc_id", F.when(F.col("__in").isNull(), 1).otherwise(0).alias("oov"))
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum("oov").alias("n_oov"),
        F.round(F.sum("oov") / F.count("*"), 4).alias("oov_rate"),
    )
