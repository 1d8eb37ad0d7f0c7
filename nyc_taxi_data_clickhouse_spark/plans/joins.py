"""Denormalizing dimension joins (SURVEY §2.3, J1-J3b).

The reference pre-joins the fact table against three small dimensions
inside PostgreSQL once, at export time (reference README.md:310-378),
so the benchmark queries are join-free.  We keep that design decision —
denormalize once into the gold table — but run the joins in Spark.

All three dims are broadcast-sized (3 / ~3.7K / ~2.2K rows vs a 1.1B
fact), so every join is an explicit ``broadcast()`` left join: zero
shuffle of the fact table, which is the only plan that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def join_dims(
    trips: DataFrame,
    cab_types: DataFrame,
    weather: DataFrame,
    nyct: DataFrame,
) -> DataFrame:
    """Reproduce the export join of README.md:366-374.

    - J1: ``LEFT JOIN cab_types ON trips.cab_type_id = cab_types.id``
    - J2: ``LEFT JOIN weather ON weather.date = trips.pickup_datetime::date``
      (join key is a cast expression — computed inline, README.md:370)
    - J3a/J3b: ``nyct2010`` joined twice under aliases pick_up/drop_off
      on the two gid columns (self-aliased second join, README.md:371-374)

    Expects ``trips`` to carry the pre-join columns ``cab_type_id``,
    ``pickup_nyct2010_gid``, ``dropoff_nyct2010_gid``; emits the joined
    attributes under the export-CSV names (README.md:311-365), i.e. the
    staging-schema shape.
    """
    pu = nyct.alias("pick_up")
    do = nyct.alias("drop_off")

    joined = (
        trips.alias("t")
        .join(broadcast(cab_types.alias("ct")), F.col("t.cab_type_id") == F.col("ct.id"), "left")
        .join(
            broadcast(weather.alias("w")),
            F.col("w.date") == F.to_date(F.col("t.pickup_datetime")),
            "left",
        )
        .join(broadcast(pu), F.col("pick_up.gid") == F.col("t.pickup_nyct2010_gid"), "left")
        .join(broadcast(do), F.col("drop_off.gid") == F.col("t.dropoff_nyct2010_gid"), "left")
    )

    nyct_attrs = [
        "ctlabel", "borocode", "boroname", "ct2010", "boroct2010",
        "cdeligibil", "ntacode", "ntaname", "puma",
    ]
    weather_attrs = [
        "precipitation", "snow_depth", "snowfall",
        "max_temperature", "min_temperature", "average_wind_speed",
    ]
    return joined.select(
        F.col("t.*"),
        F.col("ct.type").alias("cab_type"),
        *[F.col(f"w.{c}").alias(c) for c in weather_attrs],
        *[F.col(f"pick_up.{c}").alias(f"pickup_{c}") for c in nyct_attrs],
        *[F.col(f"drop_off.{c}").alias(f"dropoff_{c}") for c in nyct_attrs],
    )
