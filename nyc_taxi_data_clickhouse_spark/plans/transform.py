"""The curation transform: staging ``trips`` -> curated 45-column fact
table (SURVEY §2.2 P2, E3).

Faithful re-expression of the reference CTAS
(/root/reference/README.md:547-596) as ONE ``select()`` of built-in
column expressions — pure, unit-testable, and entirely inside
whole-stage codegen (no Python UDFs).

Quirks reproduced intentionally (SURVEY §7 quirk register):
- Z1  ``assumeNotNull`` NULL -> explicit type default (0 / '' / epoch)
- Z2  ``assumeNotNull(pickup_boroname) AS pickup_ct2010`` — the
      reference stores *borough names* under the ct2010 columns
      (README.md:580, 589); bug-compat preserved
- Z3  all 6 weather columns silently dropped (51 -> 45 cols)
- Z4  ``payment_type_`` trailing-underscore output name (README.md:572)
- Z6  money stays FloatType (Float32 parity)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyc_taxi_data_clickhouse_spark.functions.scalars import (
    CAB_TYPE_ENUM,
    VENDOR_ENUM,
    assume_not_null,
    enum8,
    if_null,
    in_list_flag,
    normalize_payment_type,
    to_fixed_string,
)

def _epoch() -> Column:
    """toDateTime(0) constant (F7); lazy — needs an active session."""
    return F.lit("1970-01-01 00:00:00").cast("timestamp")


def curation_expressions(strict_enums: bool = False) -> list[Column]:
    """The 45 cleanup expressions, in the CTAS's column order.

    ``strict_enums=True`` mirrors ClickHouse CAST-throws-on-unmapped
    (Z7) for vendor_id / cab_type; default is permissive (NULL through)
    so dirty data surfaces as NULLs instead of job failure — at 100 TB a
    single bad row must not kill a 1000-executor job.
    """
    an = assume_not_null
    return [
        F.col("trip_id"),
        # README.md:551: CAST(vendor_id AS Enum8(12 codes))
        enum8("vendor_id", VENDOR_ENUM, strict=strict_enums).alias("vendor_id"),
        # README.md:552-555
        F.to_date("pickup_datetime").alias("pickup_date"),
        if_null("pickup_datetime", _epoch()).alias("pickup_datetime"),
        F.to_date("dropoff_datetime").alias("dropoff_date"),  # stays nullable
        if_null("dropoff_datetime", _epoch()).alias("dropoff_datetime"),
        # README.md:556: IN-list -> UInt8 flag (F10)
        in_list_flag("store_and_fwd_flag", ("Y", "1", "2")).alias("store_and_fwd_flag"),
        an("rate_code_id", "int").alias("rate_code_id"),
        an("pickup_longitude", "double").alias("pickup_longitude"),
        an("pickup_latitude", "double").alias("pickup_latitude"),
        an("dropoff_longitude", "double").alias("dropoff_longitude"),
        an("dropoff_latitude", "double").alias("dropoff_latitude"),
        an("passenger_count", "int").alias("passenger_count"),
        an("trip_distance", "double").alias("trip_distance"),
        an("fare_amount", "float").alias("fare_amount"),
        an("extra", "float").alias("extra"),
        an("mta_tax", "float").alias("mta_tax"),
        an("tip_amount", "float").alias("tip_amount"),
        an("tolls_amount", "float").alias("tolls_amount"),
        an("ehail_fee", "float").alias("ehail_fee"),
        an("improvement_surcharge", "float").alias("improvement_surcharge"),
        an("total_amount", "float").alias("total_amount"),
        # README.md:572: nested ternary spelling normalization (F9/Z4)
        normalize_payment_type(F.coalesce(F.col("payment_type"), F.lit(""))).alias(
            "payment_type_"
        ),
        an("trip_type", "int").alias("trip_type"),
        an("pickup", "long").alias("pickup"),
        an("dropoff", "long").alias("dropoff"),
        # README.md:576
        enum8(
            F.coalesce(F.col("cab_type"), F.lit("")), CAB_TYPE_ENUM, strict=strict_enums
        ).alias("cab_type"),
        # pickup census-tract block (README.md:577-585)
        an("pickup_nyct2010_gid", "int").alias("pickup_nyct2010_gid"),
        if_null("pickup_ctlabel", "0").cast("float").alias("pickup_ctlabel"),
        an("pickup_borocode", "int").alias("pickup_borocode"),
        an("pickup_boroname", "string").alias("pickup_ct2010"),  # Z2 bug-compat
        to_fixed_string("pickup_boroct2010", 7).alias("pickup_boroct2010"),
        if_null("pickup_cdeligibil", " ").alias("pickup_cdeligibil"),
        to_fixed_string("pickup_ntacode", 4).alias("pickup_ntacode"),
        an("pickup_ntaname", "string").alias("pickup_ntaname"),
        if_null("pickup_puma", "0").cast("int").alias("pickup_puma"),
        # dropoff census-tract block (README.md:586-594)
        an("dropoff_nyct2010_gid", "int").alias("dropoff_nyct2010_gid"),
        if_null("dropoff_ctlabel", "0").cast("float").alias("dropoff_ctlabel"),
        an("dropoff_borocode", "int").alias("dropoff_borocode"),
        an("dropoff_boroname", "string").alias("dropoff_ct2010"),  # Z2
        to_fixed_string("dropoff_boroct2010", 7).alias("dropoff_boroct2010"),
        if_null("dropoff_cdeligibil", " ").alias("dropoff_cdeligibil"),
        to_fixed_string("dropoff_ntacode", 4).alias("dropoff_ntacode"),
        an("dropoff_ntaname", "string").alias("dropoff_ntaname"),
        if_null("dropoff_puma", "0").cast("int").alias("dropoff_puma"),
    ]


def curate_trips(staging: DataFrame, strict_enums: bool = False) -> DataFrame:
    """Apply the full curation projection (E3's transform step).

    One narrow ``select`` — no shuffle; Catalyst fuses it with the scan
    and with whatever follows (partitioned write, aggregation).
    """
    return staging.select(*curation_expressions(strict_enums=strict_enums))


def curate_trips_observed(staging: DataFrame, strict_enums: bool = False):
    """Curation with in-flight reconciliation metrics attached.

    The reference's correctness practice is stage-boundary row-count
    reconciliation — live counts during import and a post-attach
    count(*) (README.md:240, 271-278, 902; SURVEY §5.1).  Those are
    extra queries over the data; Spark's ``observe`` collects the same
    audit numbers on the SAME pass as the curation action: zero
    additional scans, metrics available once any sink action (write,
    count) completes.

    Returns ``(curated_df, observation)``; after running an action on
    the returned DataFrame, ``observation.get`` yields rows_in and
    the pre-scrub null counts to reconcile against the sink's own
    row count.
    """
    from pyspark.sql import Observation

    obs = Observation("curation_audit")
    observed = staging.observe(
        obs,
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(F.col("passenger_count").isNull().cast("long")).alias(
            "null_passenger_count_in"
        ),
        F.sum(F.col("dropoff_datetime").isNull().cast("long")).alias(
            "null_dropoff_datetime_in"
        ),
    )
    return curate_trips(observed, strict_enums=strict_enums), obs
