"""Arrow-vectorized Python UDF surface (SURVEY §2.10).

The reference's only UDF is ``trans.py`` — an out-of-process
row-at-a-time Python filter glued in with Unix pipes
(src/trans.py:1-9, invoked README.md:527-533).  The engine's
sanctioned escape hatch for custom Python logic is the pandas UDF:
batches cross the JVM/Python boundary as Arrow columns and the
function body runs vectorized pandas ops, ~10-100x the row-at-a-time
path.  This module holds that pattern with an oracle-checkable
function so the driver gate proves the Arrow path end-to-end, not
just that it runs.

Scale notes: a pandas UDF is a narrow map — no shuffle, and it
pipelines with the surrounding JVM operators per Arrow batch
(spark.sql.execution.arrow.maxRecordsPerBatch).  It is still the slow
path relative to built-ins; use only where no builtin expresses the
logic.  Here the same semantics ARE expressible as builtins — that is
exactly what makes the entry oracle-checkable.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from nyc_taxi_data_clickhouse_spark.suite import load_table, register


def vowel_ratio_udf():
    """Vowels-per-character pandas UDF, built lazily: decorating with a
    DDL-string return type parses it through the active SparkContext,
    so the decorator cannot run at import time (the driver imports
    this module before it creates its session)."""

    @pandas_udf("double")
    def vowel_ratio(text: pd.Series) -> pd.Series:
        n = text.str.len()
        vowels = text.str.count(r"[aeiou]")
        # NULL for empty text, matching the SQL oracle's
        # vowels/nullif(length,0) — a 0.0 here would silently diverge
        # from any engine that does division-by-zero -> NULL
        return (vowels / n).where(n > 0, None)

    return vowel_ratio


@register(
    "pandas_udf_vectorized",
    """
    SELECT doc_id,
           round(CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))
                 AS DOUBLE) / nullif(length(text), 0), 6) AS vowel_share
    FROM documents
    """,
    doc="Arrow-vectorized pandas UDF (SURVEY §2.10 — the engine's "
    "replacement for the reference's pipe-glued row-at-a-time "
    "trans.py): per-document vowel share computed in vectorized "
    "pandas over Arrow batches, oracle-checked against the pure-SQL "
    "equivalent so the gate verifies the Python<->JVM Arrow transfer "
    "produces bit-identical results, not merely that the UDF runs.  "
    "Narrow map, no shuffle; batch size governed by "
    "spark.sql.execution.arrow.maxRecordsPerBatch",
)
def pandas_udf_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.round(vowel_ratio_udf()("text"), 6).alias("vowel_share")
    )


@register(
    "apply_in_pandas_zscore",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag AS flag,
           round((l_extendedprice - avg(l_extendedprice)
                    OVER (PARTITION BY l_returnflag))
                 / stddev_samp(l_extendedprice)
                    OVER (PARTITION BY l_returnflag), 4) AS z
    FROM lineitem
    """,
    doc="grouped-map applyInPandas (SURVEY §2.10): per-return-flag "
    "z-score of extended price computed in a pandas function that "
    "receives each group as ONE DataFrame, oracle-checked against the "
    "window-function equivalent.  The grouped-map contract is the "
    "scale caveat the doc must state: the whole group materializes in "
    "one Python worker's memory, so it only fits when groups are "
    "bounded (here 3 flags — fine at sf0.1, NOT at 100 TB with "
    "billions per flag); for unbounded groups express the same "
    "semantics with window aggregates (the oracle's form) or "
    "mapInPandas over pre-joined group stats.  ddof=1 std matches "
    "stddev_samp on both engines",
)
def apply_in_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["l_extendedprice"]
        z = (x - x.mean()) / x.std(ddof=1)
        return pd.DataFrame(
            {
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "flag": pdf["l_returnflag"],
                "z": z.round(4),
            }
        )

    return li.groupBy("l_returnflag").applyInPandas(
        zscore, schema="l_orderkey long, l_linenumber int, flag string, z double"
    )
