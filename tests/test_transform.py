"""Unit tests for the curation transform — one probe per quirk in the
SURVEY §7 register (Z1-Z7) plus the FIXTURES.md §4 golden probes."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_clickhouse_spark.plans.transform import curate_trips
from nyc_taxi_data_clickhouse_spark.schema import TRIPS_CURATED_COLUMNS

EPOCH = dt.datetime(1970, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def curated(trips_staging):
    return curate_trips(trips_staging).cache()


def test_output_columns_exact(curated):
    # 45 columns, exact names and order of the CTAS (README.md:549-594),
    # incl. the payment_type_ trailing underscore (Z4) and NO weather (Z3)
    assert curated.columns == TRIPS_CURATED_COLUMNS
    assert "precipitation" not in curated.columns


def test_row_count_preserved(trips_staging, curated):
    # reconciliation (SURVEY §5 #1): transform is a pure projection
    assert curated.count() == trips_staging.count()


def test_z1_assume_not_null_defaults(trips_staging, curated):
    # numeric NULLs -> 0
    n_null = trips_staging.filter(F.col("passenger_count").isNull()).count()
    assert n_null > 0, "fixture must exercise the NULL path"
    assert curated.filter(F.col("passenger_count").isNull()).count() == 0
    # string NULLs -> ''
    assert curated.filter(F.col("pickup_ntaname").isNull()).count() == 0
    # datetime NULLs -> epoch (F7)
    n_null_drop = trips_staging.filter(F.col("dropoff_datetime").isNull()).count()
    assert n_null_drop > 0
    assert (
        curated.filter(F.col("dropoff_datetime") == F.lit(EPOCH)).count() == n_null_drop
    )


def test_dropoff_date_stays_nullable(trips_staging, curated):
    # toDate(Nullable) keeps NULL (README.md:554) — the single nullable
    # column of the curated table
    n_null = trips_staging.filter(F.col("dropoff_datetime").isNull()).count()
    assert curated.filter(F.col("dropoff_date").isNull()).count() == n_null


def test_z2_boroname_under_ct2010(trips_staging, curated):
    # bug-compat: pickup_ct2010 holds BOROUGH NAMES (README.md:580)
    vals = {r[0] for r in curated.select("pickup_ct2010").distinct().collect()}
    boros = {"Manhattan", "Bronx", "Brooklyn", "Queens", "Staten Island", ""}
    assert vals <= boros
    assert len(vals) > 1


def test_z4_payment_type_normalization(curated):
    vals = {r[0] for r in curated.select("payment_type_").distinct().collect()}
    assert vals <= {"CSH", "CRE", "NOC", "DIS", "UNK"}
    # fixture contains 'foo' and NULL payment types -> UNK non-empty
    assert curated.filter(F.col("payment_type_") == "UNK").count() > 0


def test_f10_store_and_fwd_flag(trips_staging, curated):
    expected = trips_staging.filter(
        F.coalesce("store_and_fwd_flag", F.lit("")).isin("Y", "1", "2")
    ).count()
    got = curated.filter(F.col("store_and_fwd_flag") == 1).count()
    assert got == expected
    assert dict(curated.dtypes)["store_and_fwd_flag"] == "int"


def test_f12_fixed_string_padding(curated):
    # toFixedString(..., 4) / (..., 7): exact width, '0'-padded defaults
    rows = curated.select(
        F.min(F.length("pickup_ntacode")).alias("mn4"),
        F.max(F.length("pickup_ntacode")).alias("mx4"),
        F.min(F.length("pickup_boroct2010")).alias("mn7"),
        F.max(F.length("pickup_boroct2010")).alias("mx7"),
    ).collect()[0]
    assert (rows["mn4"], rows["mx4"]) == (4, 4)
    assert (rows["mn7"], rows["mx7"]) == (7, 7)
    # NULL input -> all-zeros default (README.md:581-583)
    assert curated.filter(F.col("pickup_ntacode") == "0000").count() > 0


def test_types_match_survey_mapping(curated):
    d = dict(curated.dtypes)
    assert d["trip_id"] == "bigint"          # UInt32 -> long (Z5)
    assert d["fare_amount"] == "float"       # Float32 parity (Z6)
    assert d["trip_distance"] == "double"
    assert d["pickup_date"] == "date"
    assert d["pickup_ctlabel"] == "float"    # toFloat32 (F11)
    assert d["pickup_puma"] == "int"         # toUInt16 (F13)


def test_z7_strict_enum_raises(spark, trips_staging):
    # strict mode mirrors CH CAST-throws on unmapped vendor codes
    import pyspark.errors

    dirty = trips_staging.withColumn("vendor_id", F.lit("XXX"))
    strict = curate_trips(dirty, strict_enums=True)
    with pytest.raises(pyspark.errors.exceptions.base.PySparkException):
        strict.select("vendor_id").collect()
    # permissive mode: unmapped -> NULL, job survives
    permissive = curate_trips(dirty, strict_enums=False)
    assert permissive.filter(F.col("vendor_id").isNull()).count() == dirty.count()


def test_round_half_away_from_zero_including_negatives(spark):
    """SURVEY §2.8 F3: ClickHouse round() is half-away-from-zero;
    Spark round() is HALF_UP on the decimal value, which matches for
    both signs — verified here so Q4's round(trip_distance) grouping
    keys agree with the reference."""
    df = spark.createDataFrame(
        [(2.5,), (-2.5,), (0.5,), (-0.5,), (1.49,), (-1.49,)], "x double"
    )
    got = [r[0] for r in df.select(F.round("x", 0).alias("r")).collect()]
    assert got == [3.0, -3.0, 1.0, -1.0, 1.0, -1.0]


def test_observed_curation_reports_reconciliation_metrics(trips_staging):
    """SURVEY §5.1 upgraded: observe() delivers stage-boundary audit
    counts on the same pass as the curation action — rows_in must
    reconcile with rows_out, and the null scrub counts must match
    independently computed aggregates."""
    from nyc_taxi_data_clickhouse_spark.plans.transform import (
        curate_trips_observed,
    )

    curated, obs = curate_trips_observed(trips_staging)
    rows_out = curated.count()  # the action that flushes the metrics
    m = obs.get
    assert m["rows_in"] == rows_out, "curation is a pure projection"
    want_null_pc = trips_staging.filter(F.col("passenger_count").isNull()).count()
    want_null_dd = trips_staging.filter(F.col("dropoff_datetime").isNull()).count()
    assert m["null_passenger_count_in"] == want_null_pc
    assert m["null_dropoff_datetime_in"] == want_null_dd
    assert want_null_pc > 0, "fixture must exercise the null path"
