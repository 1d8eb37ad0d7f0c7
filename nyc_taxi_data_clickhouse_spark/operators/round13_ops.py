"""Round-13 surface extensions — two corpus-statistics primitives a
100 TB tokenizer/curation pipeline runs constantly, both expressed so
the ONLY corpus-scale work is a single hash aggregation and everything
downstream operates on the (many-orders-smaller) vocabulary:

- ``countmin_heavy_hitters``: Count-Min sketch (Cormode & Muthu-
  krishnan 2005) heavy-hitter estimation with DETERMINISTIC hashes, so
  the sketch — normally a streaming/mergeable approximation — is exact
  enough to be byte-restated by the SQL oracle.  Per depth row ``j``,
  ``bucket_j(term) = ((fp + j*P) * KNUTH) mod 2^32 mod W`` where ``fp``
  is a char-level polynomial hash < 2^30 (so the int64 product cannot
  overflow: (2^30 + 3P) * KNUTH < 2^62).  The sketch itself is
  ``depth x width`` = 192 counters whatever the corpus size — the
  mergeable shape you keep per shard and ``+`` across 1000 executors;
  the estimate is ``min_j counter[j][bucket_j]``, which can only
  OVER-estimate (the entry emits the ``over_ok`` invariant per term).
  Scale path: one corpus-scale token hash-agg; the per-(j,bucket)
  re-agg and the estimate join-back are vocabulary-scale, and the
  192-row sketch is broadcast.
- ``bpe_pair_merge``: the inner step of byte-pair-encoding tokenizer
  training — count adjacent symbol pairs across the corpus and rank
  the merge candidates.  The trick every real BPE trainer uses, made
  Spark-native: aggregate the corpus to DISTINCT-word counts FIRST
  (the only corpus-scale shuffle), then explode each distinct word's
  ``len-1`` adjacent char pairs weighted by its count — the explosion
  is vocabulary-scale, independent of corpus size, so growing the
  corpus 100x grows only the first hash-agg.  Top-k candidates via
  row_number with a total tiebreak (count desc, pair asc).

Reference: no analog (the reference is a 4-query taxi benchmark —
SURVEY §0); both entries are DuckDB-oracle-gated with the oracle
restating the identical arithmetic, and both tokenize with the
repo-wide explicit whitespace class ``[ \\t\\n\\x0B\\f\\r]`` (the Java
and RE2 shorthand whitespace classes disagree on \\x0B — the ADVICE
r10 contract requires spelling the class out).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_data_clickhouse_spark.operators.text import tokens
from nyc_taxi_data_clickhouse_spark.suite import load_table, register

#: explicit cross-engine whitespace class (ADVICE r10 contract) — the
#: SQL restatement of operators/text.py:tokens, which the Spark side
#: reuses directly so the contract has exactly one Spark spelling
_WS = r"[ \t\n\x0B\f\r]"

#: char-level polynomial hash modulus — keeps fp < 2^30 so the bucket
#: product below stays far inside int64
_FP_MOD = 1_000_000_007

#: Knuth multiplicative constant (2^32/phi, odd) — same family as the
#: A-ES sampler's hash; here fp < 2^30 bounds the product < 2^62, so
#: the naive int64 multiply is exact (no split-halves needed)
_KNUTH = 2_654_435_761

CMS_WIDTH = 64
CMS_DEPTH = 3
CMS_SEED_STRIDE = 1_000_003
_TOP_K = 20

_TOKS_SQL = f"string_split_regex(lower(trim(text)), '{_WS}+')"

#: char-level polynomial fingerprint of a term, SQL form (DuckDB)
_FP_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split(term, ''), "
    "c -> CAST(ascii(c) AS BIGINT))), "
    f"(a, b) -> (a * 31 + b) % {_FP_MOD})"
)


def term_fingerprint(col: Column | str) -> Column:
    """Char-level polynomial rolling hash of a term, mod 1e9+7 —
    < 2^30 by construction, deterministic, identical in DuckDB via
    list_reduce (same fold as operators/text.py:fingerprint but over
    characters of one token rather than tokens of one document)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: (acc * 31 + v) % F.lit(_FP_MOD),
    )


def cms_bucket(fp: Column, j: Column) -> Column:
    """Depth-row ``j``'s bucket for a term fingerprint: one Knuth
    multiply then fold to [0, CMS_WIDTH).  fp < 2^30 and j < depth
    bound the product below 2^62 — exact int64 in both engines."""
    return (
        ((fp + j * F.lit(CMS_SEED_STRIDE)) * F.lit(_KNUTH))
        % F.lit(2**32)
        % F.lit(CMS_WIDTH)
    )


def term_counts(docs: DataFrame) -> DataFrame:
    """Exact per-term counts — the single corpus-scale shuffle both
    round-13 entries reduce to.  Tokenization is
    operators/text.py:tokens, the repo-wide whitespace contract."""
    toks = docs.filter(F.length(F.trim("text")) > 0).select(
        F.explode(tokens("text")).alias("term")
    )
    return (
        toks.filter(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )


def countmin_sketch(counts: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(keyed rows, sketch): the per-(term, depth-row) bucket rows and
    the aggregated (j, bucket, counter) Count-Min sketch — the sketch
    is CMS_DEPTH x CMS_WIDTH rows total, whatever the corpus."""
    rows = counts.select(
        "term",
        "cnt",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("j"),
        term_fingerprint("term").alias("fp"),
    ).withColumn("bucket", cms_bucket(F.col("fp"), F.col("j")))
    return rows, rows.groupBy("j", "bucket").agg(F.sum("cnt").alias("counter"))


@register(
    "countmin_heavy_hitters",
    f"""
    WITH toks AS (
      SELECT t AS term
      FROM documents, UNNEST({_TOKS_SQL}) AS u(t)
      WHERE length(trim(text)) > 0 AND length(t) > 0),
    counts AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
    keyed AS (SELECT term, cnt, {_FP_SQL} AS fp FROM counts),
    rows_ AS (
      SELECT term, cnt, j,
             ((fp + j * {CMS_SEED_STRIDE}) * {_KNUTH})
               % 4294967296 % {CMS_WIDTH} AS bucket
      FROM keyed, UNNEST([{", ".join(map(str, range(CMS_DEPTH)))}]) AS g(j)),
    sketch AS (
      SELECT j, bucket, CAST(sum(cnt) AS BIGINT) AS counter
      FROM rows_ GROUP BY j, bucket),
    est AS (
      SELECT term, cnt, min(counter) AS cms_estimate
      FROM rows_ JOIN sketch USING (j, bucket) GROUP BY term, cnt)
    SELECT rank, term, exact_cnt, cms_estimate, over_ok FROM (
      SELECT row_number() OVER (ORDER BY cnt DESC, term) AS rank,
             term, cnt AS exact_cnt, cms_estimate,
             cms_estimate >= cnt AS over_ok
      FROM est)
    WHERE rank <= {_TOP_K}
    """,
    doc="§7 sketch: Count-Min heavy hitters (depth 3 x width 64, "
    "deterministic Knuth-hash buckets over a <2^30 char-poly term "
    "fingerprint, so the oracle restates the sketch exactly).  The "
    "sketch is 192 counters whatever the corpus size — the mergeable "
    "per-shard shape at 1000 executors; estimates can only OVER-count "
    "(emitted as the over_ok invariant).  One corpus-scale shuffle "
    "(term hash-agg); sketch re-agg and estimate join-back are "
    "vocabulary-scale; the sketch side of the join is broadcast; "
    "top-k via orderBy().limit(k) = TakeOrderedAndProject, never an "
    "unpartitioned window over the vocabulary.",
)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = term_counts(docs)
    rows, sketch = countmin_sketch(counts)
    est = (
        rows.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("term", "cnt")
        .agg(F.min("counter").alias("cms_estimate"))
    )
    # top-k as orderBy().limit(k) = TakeOrderedAndProject (per-partition
    # k-heaps + driver merge), NOT an unpartitioned row_number window over
    # the full vocabulary — at 100 TB the distinct-token vocabulary is
    # billions of rows and a global window funnels them through ONE task.
    # Same shape as weighted_sample_topk; the window below ranks only the
    # k survivors.  (VERDICT r13 #2.)
    w = Window.orderBy(F.col("cnt").desc(), "term")
    top = est.orderBy(F.col("cnt").desc(), "term").limit(_TOP_K)
    return top.select(
        F.row_number().over(w).alias("rank"),
        "term",
        F.col("cnt").alias("exact_cnt"),
        "cms_estimate",
        (F.col("cms_estimate") >= F.col("cnt")).alias("over_ok"),
    )


@register(
    "bpe_pair_merge",
    f"""
    WITH words AS (
      SELECT t AS word, count(*) AS wcnt
      FROM documents, UNNEST({_TOKS_SQL}) AS u(t)
      WHERE length(trim(text)) > 0 AND length(t) >= 2
      GROUP BY t),
    pairs AS (
      SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, wcnt
      FROM words, UNNEST(range(1, length(word))) AS g(i)),
    pc AS (SELECT pair, CAST(sum(wcnt) AS BIGINT) AS cnt
           FROM pairs GROUP BY pair)
    SELECT rank, pair, cnt FROM (
      SELECT row_number() OVER (ORDER BY cnt DESC, pair) AS rank,
             pair, cnt
      FROM pc)
    WHERE rank <= {_TOP_K}
    """,
    doc="§7 tokenizer: BPE merge-candidate counting — top adjacent "
    "char pairs weighted by word frequency, the inner step of BPE "
    "tokenizer training.  Corpus is aggregated to DISTINCT-word "
    "counts FIRST (the only corpus-scale shuffle); the pair explosion "
    "runs over the vocabulary (corpus-size-independent), exactly how "
    "production BPE trainers count.  Top-k via orderBy().limit(k) = "
    "TakeOrderedAndProject (per-partition heaps), with a total "
    "(cnt desc, pair) tiebreak; row_number ranks only the k survivors.",
)
def bpe_pair_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # same corpus-scale agg as countmin (term_counts); the length>=2
    # word filter commutes with the per-term count, so it runs on the
    # vocabulary after the shuffle
    words = (
        term_counts(docs)
        .filter(F.length("term") >= 2)
        .select(F.col("term").alias("word"), F.col("cnt").alias("wcnt"))
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(word)-1), "
                   "i -> substring(word, i, 2))")
        ).alias("pair"),
        "wcnt",
    )
    pc = pairs.groupBy("pair").agg(F.sum("wcnt").alias("cnt"))
    # pair cardinality is charset²-bounded (corpus-independent), but use
    # the same TakeOrderedAndProject top-k shape as countmin for
    # consistency: limit first, rank only the k survivors (VERDICT r13 #2)
    w = Window.orderBy(F.col("cnt").desc(), "pair")
    top = pc.orderBy(F.col("cnt").desc(), "pair").limit(_TOP_K)
    return top.select(
        F.row_number().over(w).alias("rank"), "pair", "cnt"
    )
