"""Scalar expression library (SURVEY §2.8, F1-F15)."""

from nyc_taxi_data_clickhouse_spark.functions.scalars import (
    assume_not_null,
    enum8,
    if_null,
    in_list_flag,
    normalize_payment_type,
    to_fixed_string,
)

__all__ = [
    "assume_not_null",
    "enum8",
    "if_null",
    "in_list_flag",
    "normalize_payment_type",
    "to_fixed_string",
]
