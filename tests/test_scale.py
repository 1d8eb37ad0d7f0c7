"""Scale-technique tests: bucketed joins skip the shuffle; salted
joins produce identical results to plain joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_clickhouse_spark.plans.scale import (
    explain_has_shuffle,
    salted_join,
    write_bucketed,
)
from tests.conftest import SF_SMOKE


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")

    write_bucketed(li, "li_bucketed", "l_orderkey", 8, path=str(tmp_path / "li"))
    write_bucketed(o, "o_bucketed", "o_orderkey", 8, path=str(tmp_path / "o"))

    lb = spark.table("li_bucketed")
    ob = spark.table("o_bucketed")
    # disable broadcast so the join would otherwise be a shuffle join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        assert not explain_has_shuffle(joined), (
            "bucketed-to-bucketed equi-join must not shuffle"
        )
        plain = li.join(o, li.l_orderkey == o.o_orderkey)
        assert explain_has_shuffle(plain)
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_agg_skips_shuffle(spark, tmp_path):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    write_bucketed(li, "li_bucketed_agg", "l_orderkey", 8, path=str(tmp_path / "li2"))
    try:
        agg = spark.table("li_bucketed_agg").groupBy("l_orderkey").count()
        assert not explain_has_shuffle(agg), "agg on the bucket key must not shuffle"
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed_agg")


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain(spark, how):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(o, "l_orderkey", how)
    salted = salted_join(li, o, "l_orderkey", salt_buckets=8, how=how)
    assert salted.count() == plain.count()
    key = lambda r: (r["l_orderkey"], r["l_linenumber"], r["o_totalprice"])
    assert {key(r) for r in salted.collect()} == {key(r) for r in plain.collect()}
