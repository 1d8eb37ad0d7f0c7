"""Suite registrations for the extension operators (SURVEY §7).

Each entry binds an operator from ``operators/`` to the driver's
documents/embeddings testdata and pairs it with a DuckDB oracle that
re-states the SAME deterministic definition in ANSI SQL.  Operators
whose definition depends on xxhash64 (simhash, LSH internals) or on
Python-side decoding (media features) get rows-only entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_data_clickhouse_spark.suite import load_table, register
from nyc_taxi_data_clickhouse_spark.operators import dedup, similarity, text
from nyc_taxi_data_clickhouse_spark.operators.text import LANG_MARKERS

# shared SQL fragments (DuckDB dialect) mirroring operators/text.py
_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"
_WC = rf"(CASE WHEN trim(text)='' THEN 0 ELSE len({_TOKS}) END)"


def _sql_list(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _hits(lang: str) -> str:
    return (
        f"len(list_filter({_TOKS}, t -> list_contains({_sql_list(LANG_MARKERS[lang])}, t)))"
    )


# ===========================================================================
# text analysis
# ===========================================================================

@register(
    "text_tokens",
    f"SELECT doc_id, {_WC} AS token_count FROM documents",
    doc="§7 text: whitespace token counting (JVM split/size, no UDF)",
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", text.token_count("text"))


@register(
    "text_quality",
    f"""
    SELECT doc_id,
           length(text) AS n_chars,
           {_WC} AS word_count,
           len(regexp_extract_all(text, '[.!?,;:]')) AS punct_count,
           round(CASE WHEN {_WC} > 0 THEN {_hits('en')} * 1.0 / {_WC} ELSE 0.0 END, 4)
               AS stopword_ratio,
           round(CASE WHEN {_WC} > 0
                 THEN length(regexp_replace(trim(text), '\\s+', '', 'g')) * 1.0 / {_WC}
                 ELSE 0.0 END, 4) AS mean_word_len,
           CAST(
             least({_WC}, 100) * 5
             + (CASE WHEN {_WC} > 0
                THEN least(({_hits('en')} * 1500) // {_WC}, 300) ELSE 0 END)
             + (CASE WHEN (CASE WHEN {_WC} > 0
                      THEN length(regexp_replace(trim(text), '\\s+', '', 'g')) * 1.0 / {_WC}
                      ELSE 0.0 END) BETWEEN 3 AND 10 THEN 200 ELSE 0 END)
             AS BIGINT) AS quality_score
    FROM documents
    """,
    doc="§7 text: quality scoring (length/punct/stopword features + composite)",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pre = docs.withColumn("__toks", text.tokens("text"))
    return pre.select("doc_id", *text.quality_features("text", toks=F.col("__toks")))


@register(
    "text_langid",
    f"""
    WITH h AS (
      SELECT doc_id,
             {_hits('en')} AS c_en, {_hits('de')} AS c_de,
             {_hits('es')} AS c_es, {_hits('fr')} AS c_fr
      FROM documents)
    SELECT doc_id,
           CASE WHEN greatest(c_en, c_de, c_es, c_fr) <= 0 THEN 'und'
                WHEN c_en = greatest(c_en, c_de, c_es, c_fr) THEN 'en'
                WHEN c_de = greatest(c_en, c_de, c_es, c_fr) THEN 'de'
                WHEN c_es = greatest(c_en, c_de, c_es, c_fr) THEN 'es'
                WHEN c_fr = greatest(c_en, c_de, c_es, c_fr) THEN 'fr'
                ELSE 'und' END AS lang_pred
    FROM h
    """,
    doc="§7 text: marker-word language ID with fixed tie-break priority",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pre = docs.withColumn("__toks", text.tokens("text"))
    return pre.select("doc_id", text.lang_id("text", toks=F.col("__toks")))


@register(
    "text_fingerprint",
    f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform({_TOKS}, t -> CAST(ascii(t) + length(t) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
    FROM documents
    """,
    doc="§7 text: order-sensitive polynomial rolling-hash fingerprint",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", text.fingerprint("text"))


@register(
    "text_subword_tokens",
    r"SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) "
    "AS subword_count FROM documents",
    doc="§7 text: BPE-ish regex subword counting (token-budget estimate)",
)
def text_subword_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", text.subword_token_count("text"))


@register(
    "ann_ivf_topk",
    None,  # KMeans cells are engine-specific; recall floor in pytest
    doc="§7 similarity: IVF (KMeans coarse quantizer, n_probe cells) "
    "approximate top-5 (rows-only; recall vs brute force in pytest)",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.ivf_topk(emb, queries, k=5)


# ===========================================================================
# dedup family
# ===========================================================================

@register(
    "dedup_exact",
    r"""
    SELECT min(doc_id) AS keep_id, count(*) AS group_size
    FROM documents
    GROUP BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
    """,
    doc="§7 dedup: exact (normalized-text hash groupBy, keep lowest id)",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.dedup_exact(docs)


_JACCARD_ORACLE = r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 2, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
      FROM toks),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b, round(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE i * 1.0 / (sa.n + sb.n - i) >= {thr}
"""


@register(
    "dedup_ngram_jaccard",
    _JACCARD_ORACLE.format(thr="0.8"),
    doc="§7 dedup: exact 3-gram Jaccard pairs >= 0.8 via shared-shingle "
    "equi-join (no N² cross join)",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, threshold=0.8)


@register(
    "dedup_minhash_lsh",
    _JACCARD_ORACLE.format(thr="0.9"),
    doc="§7 dedup: MinHash(64) + LSH(16 bands) candidates, exact-Jaccard "
    "verified at 0.9 — oracle is the exact pair set (LSH miss prob ~4e-8)",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, threshold=0.9)


@register(
    "dedup_simhash",
    None,  # simhash depends on xxhash64 — not reproducible in DuckDB
    doc="§7 dedup: 64-bit SimHash, hamming<=3 pairs via pigeonhole chunk "
    "joins (rows-only check)",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_pairs(docs, max_hamming=3)


@register(
    "dedup_embedding_cosine",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.45
    """,
    doc="§7 dedup: embedding-cosine near-dup pairs (exact all-pairs "
    "baseline; LSH bucketing is the scale path)",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_near_dup_pairs(emb, threshold=0.45)


# ===========================================================================
# similarity search
# ===========================================================================

@register(
    "ann_topk_cosine",
    """
    SELECT query_id, neighbor_id, round(c, 4) AS cos, CAST(rn AS INT) AS rank
    FROM (
      SELECT query_id, neighbor_id, c,
             row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rn
      FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])) AS c
        FROM embeddings a JOIN embeddings b ON b.vec_id != a.vec_id
        WHERE a.vec_id < 10))
    WHERE rn <= 5
    """,
    doc="§7 similarity: brute-force cosine top-5 for 10 query vectors "
    "(broadcast queries x corpus scan; deterministic id tie-break)",
)
def ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.brute_force_topk(emb, queries, k=5)


@register(
    "ann_lsh_topk",
    None,  # approximate by construction — verified against brute force in tests
    doc="§7 similarity: hyperplane-LSH bucketed approximate top-5 "
    "(rows-only; recall vs brute force asserted in pytest)",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.lsh_topk(emb, queries, dim=64, k=5)


# ===========================================================================
# multimodal plumbing
# ===========================================================================

@register(
    "multimodal_featurize",
    """
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha256
    FROM documents
    """,
    doc="§7 multimodal: binary payload plumbing via Arrow mapInPandas "
    "(byte length + sha256 oracle-checked; decode step stubbed)",
)
def multimodal_featurize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        featurize_media,
        pack_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = pack_media(
        docs.select(F.col("doc_id").alias("media_id"), F.encode("text", "utf-8").alias("payload")),
        "payload",
        "text/plain",
    )
    return featurize_media(media, fake=True).select("media_id", "n_bytes", "sha256")


# ===========================================================================
# events sessionization (gap-based, window functions over event time)
# ===========================================================================

@register(
    "events_sessionize",
    """
    SELECT event_id, user_id, CAST(session_id AS BIGINT) AS session_id
    FROM (
      SELECT event_id, user_id,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM (
        SELECT event_id, user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL THEN 1
                    WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE THEN 1
                    ELSE 0 END AS is_new
        FROM events))
    """,
    doc="§2.9/§7: gap-based sessionization (30-min inactivity) via lag + "
    "running sum — the batch twin of the streaming session operator",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from nyc_taxi_data_clickhouse_spark.suite import load_events

    e = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    is_new = F.when(
        F.lag("ts").over(w).isNull()
        | (
            F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")
            > 30 * 60
        ),
        1,
    ).otherwise(0)
    run = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(is_new).over(run).alias("session_id"),
    )
