"""JSON-lines source/sink (SURVEY §2.1 extension).

The reference ingests only CSV (README.md:527-533); a complete engine
also speaks JSONL, the lingua franca of LLM training corpora.  Same
design rule as the CSV source: always pass an explicit schema —
schema inference costs an extra full scan of 100 TB and can drift
between runs (a column that happens to be all-null in one shard
infers as string in one run, long in another).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str = "gzip",
    max_records_per_file: int = 20_000_000,
) -> None:
    """Write gzipped JSON-lines shards, mirroring the reference's
    20M-row csv.gz export shards (README.md:376)."""
    (
        df.write.mode("overwrite")
        .option("compression", compression)
        .option("maxRecordsPerFile", max_records_per_file)
        .json(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """Read JSONL with a mandatory explicit schema; corrupt records
    are quarantined rather than failing the job (PERMISSIVE + the
    standard rescue column would be the audit path in production)."""
    return spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)
