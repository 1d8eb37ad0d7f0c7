"""Semantics tests for the cross-corpus curation operators
(operators/corpus_ops.py) on planted fixtures — the oracle replica in
test_suite_oracle.py checks engine parity; these check the operator
definitions themselves."""

import math

from pyspark.sql import functions as F

from nyc_taxi_data_clickhouse_spark.operators.dedup import normalize_text
from nyc_taxi_data_clickhouse_spark.plans.scale import salted_join


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_incremental_dedup_drops_known_keeps_novel(spark):
    docs = _docs(
        spark,
        [
            (0, "alpha beta gamma", "en"),      # corpus
            (1, "delta epsilon zeta", "en"),    # corpus
            (4, "ALPHA   beta GAMMA", "en"),    # batch: dup of 0 after norm
            (9, "totally new content", "en"),   # batch: novel
        ],
    )
    fp = F.md5(normalize_text("text")).alias("__fp")
    corpus = docs.filter(F.col("doc_id") % 5 != 4).select(fp)
    batch = docs.filter(F.col("doc_id") % 5 == 4).select("doc_id", fp)
    kept = [r.doc_id for r in batch.join(corpus, "__fp", "left_anti").collect()]
    assert kept == [9]


def test_boilerplate_df_planted_shared_ngram(spark):
    from nyc_taxi_data_clickhouse_spark.operators.corpus_ops import (
        boilerplate_ngram_df,
    )
    import tempfile

    docs = _docs(
        spark,
        [
            # docs 1 and 2 share the 3-gram "all rights reserved"
            (1, "one two all rights reserved", "en"),
            (2, "all rights reserved four five", "en"),
            (3, "completely unrelated text here", "en"),
            (4, "ab", "en"),  # under 3 tokens -> 0 grams, NULL frac
        ],
    )
    with tempfile.TemporaryDirectory() as d:
        docs.withColumn("source", F.lit("s")).withColumn(
            "n_chars", F.length("text")
        ).write.parquet(f"{d}/documents.parquet")
        out = {r.doc_id: r for r in boilerplate_ngram_df(spark, d).collect()}
    assert out[1].shared_frac > 0 and out[2].shared_frac > 0
    assert out[3].shared_frac == 0.0
    assert out[4].n_grams == 0 and out[4].shared_frac is None
    # doc 1 has 3 distinct 3-grams, exactly one shared
    assert out[1].n_grams == 3
    assert abs(out[1].shared_frac - round(1 / 3, 4)) < 1e-9


def test_stratified_sample_membership_stable_under_growth(spark):
    """Adding documents never flips an existing doc's keep decision —
    the property randomSplit/sampleBy lack."""
    bucket = ((F.col("doc_id") % 1000003) * F.lit(2654435761)) % 100
    small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    kept_small = {
        r.doc_id for r in small.filter(bucket < 40).collect()
    }
    kept_big_first500 = {
        r.doc_id
        for r in big.filter((bucket < 40) & (F.col("doc_id") < 500)).collect()
    }
    assert kept_small == kept_big_first500
    # and the realized rate is near the nominal 40%
    assert abs(len(kept_small) / 500 - 0.40) < 0.08


def test_char_entropy_known_values(spark):
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, "abcd")], "doc_id long, text string"
    )
    cc = (
        docs.select("doc_id", F.explode(F.split("text", "")).alias("c"))
        .groupBy("doc_id", "c")
        .agg(F.count("*").alias("n"))
    )
    ent = {
        r.doc_id: r.entropy
        for r in cc.groupBy("doc_id")
        .agg(
            F.round(
                F.log(F.sum("n")) - F.sum(F.col("n") * F.log("n")) / F.sum("n"),
                4,
            ).alias("entropy")
        )
        .collect()
    }
    assert ent[1] == 0.0
    assert abs(ent[2] - round(math.log(2), 4)) < 1e-9
    assert abs(ent[3] - round(math.log(4), 4)) < 1e-9


def test_salted_join_equals_plain_join_on_skewed_key(spark):
    """90% of fact rows share one hot key; salted result must equal the
    plain inner join exactly."""
    fact = spark.range(0, 1000).select(
        F.when(F.col("id") < 900, 7).otherwise(F.col("id") % 10).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(10)], "k long, name string"
    )
    salted = salted_join(fact, dim, "k", salt_buckets=8)
    plain = fact.join(dim, "k")
    assert (
        salted.select("k", "v", "name").exceptAll(
            plain.select("k", "v", "name")
        ).count()
        == 0
    )
    assert salted.count() == plain.count() == 1000


def test_cogroup_zero_fills_one_sided_keys(spark):
    from nyc_taxi_data_clickhouse_spark.operators.corpus_ops import (
        cogroup_orders_events,
    )
    import tempfile

    orders = spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 7.0)],
        "o_custkey long, o_totalprice double",
    )
    events = spark.createDataFrame(
        [(2, 100, 1.5, "c", "{}"), (3, 101, 2.5, "c", "{}")],
        "user_id long, event_id long, value double, event_type string, props string",
    ).withColumn("ts", F.timestamp_micros(F.lit(0)))
    with tempfile.TemporaryDirectory() as d:
        orders.write.parquet(f"{d}/orders.parquet")
        events.write.parquet(f"{d}/events.parquet")
        out = {r.custkey: r for r in cogroup_orders_events(spark, d).collect()}
    assert out[1].n_orders == 2 and out[1].n_events == 0
    assert out[1].order_total == 15.0 and out[1].event_value == 0.0
    assert out[2].n_orders == 1 and out[2].n_events == 1
    assert out[3].n_orders == 0 and out[3].n_events == 1


def test_domain_mix_temperature_semantics(spark):
    """Temperature mixing: the smallest domain keeps 100%, rates fall
    with domain size as floor(100*sqrt(n_min/n)), membership is the
    growth-stable doc-id hash (adding docs to OTHER domains never
    changes a domain's kept set)."""
    import tempfile

    from nyc_taxi_data_clickhouse_spark.operators.corpus_ops import (
        domain_mix_temperature,
    )

    def mk(rows):
        return spark.createDataFrame(
            [(i, "t", lang, "s", 1) for i, lang in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        )

    # 40 'big' docs (ids 0..39), 10 'small' (ids 100..109)
    rows = [(i, "big") for i in range(40)] + [(100 + i, "small") for i in range(10)]
    with tempfile.TemporaryDirectory() as d:
        mk(rows).write.parquet(f"{d}/documents.parquet")
        out = {r["lang"]: r for r in domain_mix_temperature(spark, d).collect()}
    assert out["small"]["rate"] == 100 and out["small"]["n_kept"] == 10
    assert out["big"]["rate"] == math.floor(100 * math.sqrt(10 / 40))  # 50
    assert 0 < out["big"]["n_kept"] < 40

    # growth stability: tripling the small domain only RAISES big's
    # rate (n_min unchanged here: small stays the min? no - small grew,
    # so min moved to... big=40 vs small=30: min=30), and every doc big
    # kept before at the OLD rate is still kept at any rate >= old
    # (bucket < rate is monotone in rate)
    rows2 = rows + [(200 + i, "small") for i in range(20)]
    with tempfile.TemporaryDirectory() as d:
        mk(rows2).write.parquet(f"{d}/documents.parquet")
        out2 = {r["lang"]: r for r in domain_mix_temperature(spark, d).collect()}
    assert out2["big"]["rate"] == math.floor(100 * math.sqrt(30 / 40))  # 86
    assert out2["big"]["rate"] > out["big"]["rate"]
    assert out2["big"]["n_kept"] >= out["big"]["n_kept"]


def test_token_budget_packing_matches_naive_prefix_sum(spark):
    """The two-phase distributed prefix sum (r15 reshape of the
    corpus-wide unpartitioned window, VERDICT r14 item 1) must be
    byte-identical to a naively computed global running sum — checked
    here against an INDEPENDENT Python reimplementation on the smoke
    corpus (the DuckDB oracle checks engine parity; this pins the
    sharded decomposition itself: shard cuts on the leading key only,
    duplicate ids co-sharded, offsets exact)."""
    from nyc_taxi_data_clickhouse_spark.suite import registry

    from tests.conftest import SF_SMOKE

    got = sorted(
        map(tuple, registry()["token_budget_packing"].spark(spark, SF_SMOKE).collect())
    )

    rows = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    toks = sorted(
        (r["doc_id"], len(r["text"]) - len(r["text"].replace(" ", "")) + 1)
        for r in rows
    )
    bins: dict[int, tuple[int, int]] = {}
    prior = 0
    for _, t in toks:
        b = prior // 2048
        n, s = bins.get(b, (0, 0))
        bins[b] = (n + 1, s + t)
        prior += t
    want = sorted((b, n, s) for b, (n, s) in bins.items())
    assert got == want
