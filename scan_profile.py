"""Scan-gap profiler (VERDICT r3 item 7 — "profile it or improve ≥2×").

Decomposes the q1..q4 scan-shape cost on the ×100-replicated lineitem
(60 M rows at sf0.1) into its parts and measures each proposed lever in
isolation, so BENCH_NOTES.md can attribute the gap vs the reference's
ClickHouse numbers (BASELINE.md) with evidence instead of hand-waving.

Experiments (one JVM; runtime SQLConf toggled per variant, storage
variants materialized as separate parquet tables):

  base        current scan_bench layout (snappy, unsorted, 64 files)
  batch16k    spark.sql.parquet.columnarReaderBatchSize=16384
  part512m    spark.sql.files.maxPartitionBytes=512m
  uncomp      uncompressed parquet copy (decompression removed)
  clustered   copy sorted by (l_returnflag, l_linenumber, l_shipdate,
              l_quantity) — the MergeTree-ORDER-BY analog the engine's
              write_gold (sources/parquet.py) applies to gold tables;
              parquet then RLE/dict-encodes the group keys into runs
  clust+unc   clustered AND uncompressed
  cached      df.cache() in-memory columnar — parquet decode removed
              entirely; the remaining time IS the hash-agg cost, so
              (base − cached) isolates the decode share

Output: one JSON line per (variant × shape) with best-of-N seconds,
plus a final summary JSON.  Run on a quiet machine.

Usage: python scan_profile.py [--repeats 5] [--shapes q1,q4]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

from nyc_taxi_data_clickhouse_spark import scan_bench
from nyc_taxi_data_clickhouse_spark.session import get_spark

CLUSTER_KEYS = ["l_returnflag", "l_linenumber", "l_shipdate", "l_quantity"]


def materialize_variant(spark, base_path: str, out: Path, *, sorted_: bool,
                        codec: str) -> str:
    """Write a storage variant of the big lineitem once; reuse if present."""
    if not (out / "_SUCCESS").exists():
        df = spark.read.parquet(base_path)
        writer = df
        if sorted_:
            # sortWithinPartitions after a key repartition = the engine's
            # gold clustering (sources/parquet.py write_gold): each file
            # holds contiguous key runs -> parquet RLE/dictionary pages.
            writer = df.repartition(64, *[F.col(c) for c in CLUSTER_KEYS[:2]]) \
                       .sortWithinPartitions(*CLUSTER_KEYS)
        (writer.write.mode("overwrite")
               .option("compression", codec)
               .parquet(str(out)))
    return str(out)


def time_shape(spark, df, shape, repeats: int) -> list[float]:
    times = []
    for i in range(1 + repeats):  # 1 warmup
        spark.catalog.clearCache() if False else None  # cache variant manages itself
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        shape(df).write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        if i >= 1:
            times.append(elapsed)
    return times


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--shapes", default="q1,q2,q3,q4")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                       "/root/testdata/sf0.1"))
    args = ap.parse_args()
    shapes = {k: scan_bench.SCAN_SHAPES[k] for k in args.shapes.split(",")}

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="scan-profile", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    scratch = Path(os.environ.get("BENCH_SCAN_DIR", Path(_REPO) / ".scan_bench"))
    base_path, rows = scan_bench.materialize_big_lineitem(
        spark, args.sf_dir, scan_bench.scan_factor(), str(scratch))
    print(f"base table: {rows} rows at {base_path}", file=sys.stderr)

    sf_name = Path(args.sf_dir).name
    froot = scratch / f"{sf_name}_x{scan_bench.scan_factor()}"
    variants: dict[str, dict] = {
        "base": {"path": base_path, "conf": {}},
        "batch16k": {"path": base_path,
                     "conf": {"spark.sql.parquet.columnarReaderBatchSize": "16384"}},
        "part512m": {"path": base_path,
                     "conf": {"spark.sql.files.maxPartitionBytes": "536870912"}},
        "uncomp": {"path": materialize_variant(
            spark, base_path, froot / "lineitem_uncomp", sorted_=False,
            codec="uncompressed"), "conf": {}},
        "clustered": {"path": materialize_variant(
            spark, base_path, froot / "lineitem_clustered", sorted_=True,
            codec="snappy"), "conf": {}},
        "clust_unc": {"path": materialize_variant(
            spark, base_path, froot / "lineitem_clust_unc", sorted_=True,
            codec="uncompressed"), "conf": {}},
    }

    results: dict[str, dict[str, float]] = {}
    for vname, v in variants.items():
        for k, val in v["conf"].items():
            spark.conf.set(k, val)
        df = spark.read.parquet(v["path"])
        row = {}
        for qname, shape in shapes.items():
            times = time_shape(spark, df, shape, args.repeats)
            row[qname] = round(min(times), 4)
            print(json.dumps({"variant": vname, "shape": qname,
                              "best": round(min(times), 4),
                              "median": round(statistics.median(times), 4)}),
                  flush=True)
        results[vname] = row
        for k in v["conf"]:
            spark.conf.unset(k)

    # cached variant: decode removed -> pure agg cost
    df = spark.read.parquet(base_path)
    df.cache()
    df.count()  # force full materialization into the columnar cache
    row = {}
    for qname, shape in shapes.items():
        times = time_shape(spark, df, shape, args.repeats)
        row[qname] = round(min(times), 4)
        print(json.dumps({"variant": "cached", "shape": qname,
                          "best": round(min(times), 4),
                          "median": round(statistics.median(times), 4)}),
              flush=True)
    results["cached"] = row
    df.unpersist()

    print(json.dumps({"rows": rows, "cpus": cpus, "results": results}))


if __name__ == "__main__":
    main()
