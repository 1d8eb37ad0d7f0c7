"""Q1-Q4 on the curated trips fixture: DataFrame form == SQL form ==
DuckDB oracle (the reference's cross-system-agreement practice,
SURVEY §5 #2, automated)."""

from __future__ import annotations

import pytest

from nyc_taxi_data_clickhouse_spark.plans import queries as Q
from nyc_taxi_data_clickhouse_spark.plans.transform import curate_trips
from tests.oracle_util import _hash_rows  # reuse the normalizing hasher

import duckdb


@pytest.fixture(scope="module")
def curated(spark, trips_staging, tmp_path_factory):
    df = curate_trips(trips_staging)
    path = str(tmp_path_factory.mktemp("curated") / "trips.parquet")
    df.write.mode("overwrite").parquet(path)
    out = spark.read.parquet(path)
    out.createOrReplaceTempView("trips_curated")
    return out, path


DF_FORMS = {"q1": Q.q1, "q2": Q.q2, "q3": Q.q3, "q4": Q.q4, "total_count": Q.total_count}


@pytest.mark.parametrize("name", list(DF_FORMS))
def test_df_equals_sql_equals_duckdb(spark, curated, name):
    df_curated, path = curated
    df_result = DF_FORMS[name](df_curated)
    sql_result = spark.sql(Q.SQL_FORMS[name].format(t="trips_curated"))

    cols = df_result.columns
    h_df = _hash_rows(cols, [tuple(r) for r in df_result.collect()])
    h_sql = _hash_rows(sql_result.columns, [tuple(r) for r in sql_result.collect()])
    assert h_df == h_sql, f"{name}: DataFrame vs spark.sql mismatch"

    duck = duckdb.connect()
    duck.execute(
        f"CREATE VIEW trips_curated AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    pdf = duck.execute(Q.SQL_FORMS[name].format(t="trips_curated")).fetch_df()
    import math

    orows = [
        tuple(None if isinstance(x, float) and math.isnan(x) else x for x in r)
        for r in pdf.itertuples(index=False, name=None)
    ]
    h_duck = _hash_rows(list(pdf.columns), orows)
    assert h_df == h_duck, f"{name}: spark vs duckdb oracle mismatch"
