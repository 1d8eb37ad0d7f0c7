"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Runs a suite query in Spark and its oracle SQL in DuckDB on the same
parquet, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name — the driver's
documented compare).  Floats are rounded to 6 decimals before hashing
to absorb representation noise; suite queries are expected to round
aggregates themselves (Z6 policy).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import duckdb

from nyc_taxi_data_clickhouse_spark.schema import TESTDATA_TABLES


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetch_df()


def _norm_cell(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # + 0.0 collapses IEEE negative zero: a mean of -4e-8 rounds
        # to -0.0 on one engine and +0.0 on the other (observed at
        # sf0.1 in embedding_centroids), and "%.6f" would format them
        # as distinct strings for numerically-equal values
        return f"{round(v, 6) + 0.0:.6f}"
    if isinstance(v, dt.datetime):
        # duckdb's pandas bridge widens DATE to midnight Timestamp;
        # collapse midnight datetimes to the date so both sides agree
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


def _hash_rows(colnames, rows) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x01".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    srows = spark_df.collect()
    scols = spark_df.columns
    pdf = duckdb_run(oracle_sql, sf_dir)
    ocols = list(pdf.columns)
    orows = [tuple(None if (isinstance(x, float) and math.isnan(x)) or x is None
                   else x for x in row)
             for row in pdf.itertuples(index=False, name=None)]
    # pandas returns numpy scalars / Timestamps; normalize via str() in hash
    result = {
        "rows_spark": len(srows),
        "rows_oracle": len(orows),
        "cols_spark": sorted(scols),
        "cols_oracle": sorted(ocols),
        "hash_spark": _hash_rows(scols, [tuple(r) for r in srows]),
        "hash_oracle": _hash_rows(ocols, orows),
    }
    result["match"] = (
        result["rows_spark"] == result["rows_oracle"]
        and result["cols_spark"] == result["cols_oracle"]
        and result["hash_spark"] == result["hash_oracle"]
    )
    return result
