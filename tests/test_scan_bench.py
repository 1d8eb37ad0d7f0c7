"""Scan-bound bench support (bench.py "scan" section / VERDICT r1 #5):
the replicated table must be a faithful ×factor copy so the measured
shapes are the reference's shapes at honest entropy."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from pyspark.sql import functions as F

from nyc_taxi_data_clickhouse_spark import scan_bench
from tests.conftest import SF_SMOKE


def test_materialize_replicates_exactly(spark):
    scratch = tempfile.mkdtemp(prefix="scan_bench_test_")
    try:
        path, rows = scan_bench.materialize_big_lineitem(
            spark, SF_SMOKE, factor=3, scratch_root=scratch, files=4
        )
        orig = spark.read.parquet(str(Path(SF_SMOKE) / "lineitem.parquet"))
        assert rows == orig.count() * 3

        # group-key distributions replicate exactly: q1 counts are
        # factor x the originals (jitter only touches the measure col)
        big = spark.read.parquet(path)
        base = {
            r["key"]: r["cnt"]
            for r in scan_bench.SCAN_SHAPES["q1"](orig).collect()
        }
        rep = {
            r["key"]: r["cnt"]
            for r in scan_bench.SCAN_SHAPES["q1"](big).collect()
        }
        assert rep == {k: v * 3 for k, v in base.items()}

        # the jitter de-dictionaries the measure column: far more
        # distinct prices than a naive fan-out (which would keep
        # exactly the original distinct count)
        n_orig = orig.select("l_extendedprice").distinct().count()
        n_big = big.select("l_extendedprice").distinct().count()
        assert n_big > 2 * n_orig

        # idempotent: second call reuses the materialization
        path2, rows2 = scan_bench.materialize_big_lineitem(
            spark, SF_SMOKE, factor=3, scratch_root=scratch, files=4
        )
        assert path2 == path and rows2 == rows
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def test_shapes_run_on_plain_lineitem(spark):
    li = spark.read.parquet(str(Path(SF_SMOKE) / "lineitem.parquet"))
    for name, shape in scan_bench.SCAN_SHAPES.items():
        df = shape(li)
        assert df.count() >= 0, name

    # q4 ordering contract: year asc, cnt desc within year
    rows = scan_bench.SCAN_SHAPES["q4"](li).collect()
    years = [r["year"] for r in rows]
    assert years == sorted(years)
    for i in range(1, len(rows)):
        if rows[i]["year"] == rows[i - 1]["year"]:
            assert rows[i]["cnt"] <= rows[i - 1]["cnt"]


def test_coded_layout_results_identical_to_string_form(spark):
    """The v3 enum/int-coded materialization must be invisible in query
    results: every scan shape on the coded table returns exactly the
    rows the same shape returns on the raw string/double-typed lineitem
    (same replication, same jitter).  This is the correctness contract
    behind quoting the coded-layout walls against BASELINE.md."""
    scratch = tempfile.mkdtemp(prefix="scan_bench_eq_")
    try:
        path, _ = scan_bench.materialize_big_lineitem(
            spark, SF_SMOKE, factor=3, scratch_root=scratch, files=2
        )
        coded = spark.read.parquet(path)

        raw = (
            spark.read.parquet(str(Path(SF_SMOKE) / "lineitem.parquet"))
            .withColumn("l_shipdate", F.to_date("l_shipdate"))
        )
        reps = F.broadcast(spark.range(3).select(F.col("id").alias("__rep")))
        plain = (
            raw.crossJoin(reps)
            .withColumn(
                "l_extendedprice",
                F.col("l_extendedprice") + F.col("__rep") * F.lit(0.01),
            )
            .drop("__rep")
        )

        for name, shape in scan_bench.SCAN_SHAPES.items():
            got = sorted(tuple(r) for r in shape(coded).collect())
            want = sorted(tuple(r) for r in shape(plain).collect())
            assert got == want, f"{name}: coded layout changed results"
            assert (
                shape(coded).schema == shape(plain).schema
            ), f"{name}: coded layout changed schema"
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def test_materialize_documents_unique_ids_and_entropy(spark):
    """Curation scan table (VERDICT r9 item 6): ×factor replication with
    globally unique doc_ids (the PII injection derives from them) and
    de-dictionaried text; the scrub shape runs on it and reports one
    row per replicated doc."""
    scratch = tempfile.mkdtemp(prefix="scan_bench_docs_")
    try:
        path, rows = scan_bench.materialize_big_documents(
            spark, SF_SMOKE, factor=3, scratch_root=scratch, files=2
        )
        orig = spark.read.parquet(str(Path(SF_SMOKE) / "documents.parquet"))
        big = spark.read.parquet(path)
        assert rows == orig.count() * 3
        assert big.select("doc_id").distinct().count() == rows
        # per-replica suffix de-dictionaries the text column
        assert big.select("text").distinct().count() == rows
        out = scan_bench.CURATION_SHAPES["pii_scrub"](big)
        assert out.count() == rows
        # every replicated doc carries exactly one injected arm of each
        # new kind
        agg = out.agg(
            F.sum("n_ipv6").alias("a"),
            F.sum("n_cc").alias("b"),
            F.sum("n_iban").alias("c"),
        ).collect()[0]
        assert agg["a"] == rows and agg["b"] == rows and agg["c"] == rows
        # idempotent reuse
        path2, rows2 = scan_bench.materialize_big_documents(
            spark, SF_SMOKE, factor=3, scratch_root=scratch, files=2
        )
        assert path2 == path and rows2 == rows
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
