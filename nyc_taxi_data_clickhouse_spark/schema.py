"""Explicit schemas for the taxi pipeline (SURVEY §1).

The reference declares both table schemas as hand-written DDL
(reference README.md:448-506 staging ``trips``; README.md:547-596
curated ``trips_mergetree``).  Type mapping follows SURVEY §1.2:
unsigned 32-bit ids -> LongType, UInt8/UInt16 codes -> IntegerType,
Float32 money/weather -> FloatType, Float64 coords -> DoubleType,
Enum8 -> StringType (parquet dictionary-encodes automatically),
FixedString(n) -> StringType with enforced padding.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


# ---------------------------------------------------------------------------
# Staging table: 51 columns, all-nullable except the first three
# (reference README.md:448-506; column order == the PG export CSV,
# README.md:311-365).
# ---------------------------------------------------------------------------
TRIPS_STAGING_SCHEMA = T.StructType(
    [
        _f("trip_id", T.LongType(), False),            # UInt32 -> long (Z5)
        _f("vendor_id", T.StringType(), False),
        _f("pickup_datetime", T.TimestampType(), False),
        _f("dropoff_datetime", T.TimestampType()),
        _f("store_and_fwd_flag", T.StringType()),       # FixedString(1)
        _f("rate_code_id", T.IntegerType()),            # UInt8
        _f("pickup_longitude", T.DoubleType()),
        _f("pickup_latitude", T.DoubleType()),
        _f("dropoff_longitude", T.DoubleType()),
        _f("dropoff_latitude", T.DoubleType()),
        _f("passenger_count", T.IntegerType()),         # UInt8
        _f("trip_distance", T.DoubleType()),
        _f("fare_amount", T.FloatType()),               # Float32 money
        _f("extra", T.FloatType()),
        _f("mta_tax", T.FloatType()),
        _f("tip_amount", T.FloatType()),
        _f("tolls_amount", T.FloatType()),
        _f("ehail_fee", T.FloatType()),
        _f("improvement_surcharge", T.FloatType()),
        _f("total_amount", T.FloatType()),
        _f("payment_type", T.StringType()),
        _f("trip_type", T.IntegerType()),               # UInt8
        _f("pickup", T.LongType()),                     # UInt32 location id
        _f("dropoff", T.LongType()),
        _f("cab_type", T.StringType()),                 # Enum8 yellow/green/uber
        # -- weather (dropped by curation, Z3) ------------------------------
        _f("precipitation", T.FloatType()),
        _f("snow_depth", T.FloatType()),
        _f("snowfall", T.FloatType()),
        _f("max_temperature", T.IntegerType()),         # Int8
        _f("min_temperature", T.IntegerType()),
        _f("average_wind_speed", T.FloatType()),
        # -- pickup census-tract attributes ---------------------------------
        _f("pickup_nyct2010_gid", T.IntegerType()),     # Int8 (Z5 asymmetry)
        _f("pickup_ctlabel", T.StringType()),
        _f("pickup_borocode", T.IntegerType()),
        _f("pickup_boroname", T.StringType()),
        _f("pickup_ct2010", T.StringType()),
        _f("pickup_boroct2010", T.StringType()),
        _f("pickup_cdeligibil", T.StringType()),        # FixedString(1)
        _f("pickup_ntacode", T.StringType()),           # FixedString(4)
        _f("pickup_ntaname", T.StringType()),
        _f("pickup_puma", T.StringType()),
        # -- dropoff census-tract attributes --------------------------------
        _f("dropoff_nyct2010_gid", T.IntegerType()),    # UInt8 in reference
        _f("dropoff_ctlabel", T.StringType()),
        _f("dropoff_borocode", T.IntegerType()),
        _f("dropoff_boroname", T.StringType()),
        _f("dropoff_ct2010", T.StringType()),
        _f("dropoff_boroct2010", T.StringType()),
        _f("dropoff_cdeligibil", T.StringType()),
        _f("dropoff_ntacode", T.StringType()),
        _f("dropoff_ntaname", T.StringType()),
        _f("dropoff_puma", T.StringType()),
    ]
)

# Curated fact table: the 45 column names of the CTAS, in DDL order
# (reference README.md:549-594).  Quirks preserved: trailing-underscore
# ``payment_type_`` (Z4); boroname stored under *_ct2010 (Z2); weather
# columns absent (Z3); only dropoff_date stays nullable (FIXTURES §3).
TRIPS_CURATED_COLUMNS: list[str] = [
    "trip_id", "vendor_id", "pickup_date", "pickup_datetime",
    "dropoff_date", "dropoff_datetime", "store_and_fwd_flag",
    "rate_code_id", "pickup_longitude", "pickup_latitude",
    "dropoff_longitude", "dropoff_latitude", "passenger_count",
    "trip_distance", "fare_amount", "extra", "mta_tax", "tip_amount",
    "tolls_amount", "ehail_fee", "improvement_surcharge", "total_amount",
    "payment_type_", "trip_type", "pickup", "dropoff", "cab_type",
    "pickup_nyct2010_gid", "pickup_ctlabel", "pickup_borocode",
    "pickup_ct2010", "pickup_boroct2010", "pickup_cdeligibil",
    "pickup_ntacode", "pickup_ntaname", "pickup_puma",
    "dropoff_nyct2010_gid", "dropoff_ctlabel", "dropoff_borocode",
    "dropoff_ct2010", "dropoff_boroct2010", "dropoff_cdeligibil",
    "dropoff_ntacode", "dropoff_ntaname", "dropoff_puma",
]

# ---------------------------------------------------------------------------
# Dimension tables for the denormalizing join stage
# (reference README.md:366-374; FIXTURES §2).
# ---------------------------------------------------------------------------
CAB_TYPES_SCHEMA = T.StructType(
    [_f("id", T.IntegerType(), False), _f("type", T.StringType(), False)]
)

WEATHER_SCHEMA = T.StructType(
    [
        _f("date", T.DateType(), False),
        _f("precipitation", T.FloatType()),
        _f("snow_depth", T.FloatType()),
        _f("snowfall", T.FloatType()),
        _f("max_temperature", T.IntegerType()),
        _f("min_temperature", T.IntegerType()),
        _f("average_wind_speed", T.FloatType()),
    ]
)

NYCT2010_SCHEMA = T.StructType(
    [
        _f("gid", T.IntegerType(), False),
        _f("ctlabel", T.StringType()),
        _f("borocode", T.IntegerType()),
        _f("boroname", T.StringType()),
        _f("ct2010", T.StringType()),
        _f("boroct2010", T.StringType()),
        _f("cdeligibil", T.StringType()),
        _f("ntacode", T.StringType()),
        _f("ntaname", T.StringType()),
        _f("puma", T.StringType()),
    ]
)

# TPC-H-ish driver test tables (TESTDATA.md), used by the extended query
# surface and the LLM-data operators.
TESTDATA_TABLES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
