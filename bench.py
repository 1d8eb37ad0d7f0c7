#!/usr/bin/env python
"""Benchmark harness (SURVEY §2.11 H1-H5).

Reproduces the reference's protocol (src/benchmark_clickhouse.sh:19-26:
N repeats, mean±std) with Spark-specific hygiene: JVM/codegen warm-up
runs excluded from steady-state stats, caches cleared between queries,
results forced with a noop sink (no driver collect).

Prints ONE JSON line:
  {"metric": "suite_mean_sec", "value": N, "unit": "sec",
   "queries": {...per-query mean sec...}, "sf": 0.1}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), BENCH_REPEATS (default 3),
     BENCH_QUERIES (comma-list override).

The output also carries a scan-bound section ("scan" key +
top-level "rows_per_sec_per_core"): the reference's four benchmark
shapes plus TPC-H Q1/Q6 run against a factor-replicated lineitem
(default ×100 → 60 M rows at sf0.1, materialized once under
.scan_bench/ and reused), giving a per-core scan throughput that is
comparable to BASELINE.md's 1.1 B-row numbers instead of being
dominated by the ~0.2-0.3 s scheduler floor.  Knobs: BENCH_SCAN=0
disables, BENCH_SCAN_FACTOR (default 100), BENCH_SCAN_REPEATS
(default max(BENCH_REPEATS, 5)), BENCH_SCAN_DIR.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from nyc_taxi_data_clickhouse_spark import scan_bench, suite
from nyc_taxi_data_clickhouse_spark.session import get_spark

#: headline queries: the four reference benchmark shapes + the
#: denormalizing join + the extension operators' heavy hitters
DEFAULT_QUERIES = [
    "q1_group_count",
    "q2_avg_by_key",
    "q3_two_key_derived",
    "q4_three_key_sorted",
    "denormalize_join",
    "window_rank",
    "events_hourly_agg",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "text_quality",
    "ann_topk_cosine",
    "asof_join",
    "tpch_q1_pricing_summary",
    "tpch_q5_local_supplier_volume",
    "tpch_q10_returned_items",
    "window_running_total",
    "contamination_ngram",
    "near_dup_components",
    "tpch_q9_product_profit",
    "tpch_q13_customer_distribution",
    "tpch_q21_waiting_supplier",
    "window_range_frame",
    "text_tfidf_topk",
    "full_outer_join",
    "scd2_dimension",
    "regression_agg",
    "pandas_udf_vectorized",
    "near_dup_components_star",
    "text_repetition",
]


def force(df) -> None:
    """Materialize the full result without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()


def quiesce(spark) -> None:
    """Benchmark hygiene between timed runs (SURVEY §4 X10 / §2.11 H3):
    drop cached data, then force a JVM GC so that the garbage of the
    PREVIOUS queries (shuffle buffers, broadcast blocks, checkpoint
    RDDs) is collected outside the timed region.  Without this, a
    multi-minute suite accumulates heap until a major GC lands inside
    whichever query runs late — observed as 3 s -> 16-35 s outliers
    with ±15 s std on an otherwise idle machine."""
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()


def bench_query(spark, name: str, sf_dir: str, repeats: int, warmups: int = 1):
    spec = suite.registry()[name]
    times = []
    for i in range(warmups + repeats):
        quiesce(spark)
        t0 = time.perf_counter()
        force(spec.spark(spark, sf_dir))
        elapsed = time.perf_counter() - t0
        if i >= warmups:
            times.append(elapsed)
    return {
        "mean": statistics.mean(times),
        "std": statistics.stdev(times) if len(times) > 1 else 0.0,
    }


def bench_scan(spark, sf_dir: str, cpus: int, repeats: int) -> dict:
    """Scan-bound measurement (VERDICT r1 #5): run the reference's
    benchmark shapes on a factor-replicated lineitem so the per-core
    scan throughput — not the scheduler floor — is what's measured.
    Returns a dict for the "scan" key of the output JSON."""
    factor = scan_bench.scan_factor()
    scratch = os.environ.get(
        "BENCH_SCAN_DIR", str(Path(__file__).resolve().parent / ".scan_bench")
    )
    path, rows = scan_bench.materialize_big_lineitem(spark, sf_dir, factor, scratch)
    li = spark.read.parquet(path)
    # best-of-N for the throughput figure: the timed runs land on a
    # shared host whose background load injects multi-second outliers
    # (observed bimodal 1-3 s vs 15-50 s on identical plans); min is
    # the machine-capability number, median/spread are reported so the
    # noise is visible rather than hidden
    scan_repeats = int(os.environ.get("BENCH_SCAN_REPEATS", str(max(repeats, 5))))
    best: dict[str, float] = {}
    medians: dict[str, float] = {}
    spreads: dict[str, float] = {}
    throughput: dict[str, float] = {}
    for name, shape in scan_bench.SCAN_SHAPES.items():
        times = []
        for i in range(1 + scan_repeats):  # 1 warmup
            quiesce(spark)
            t0 = time.perf_counter()
            force(shape(li))
            elapsed = time.perf_counter() - t0
            if i >= 1:
                times.append(elapsed)
        best[name] = round(min(times), 4)
        medians[name] = round(statistics.median(times), 4)
        spreads[name] = round(max(times) - min(times), 4)
        throughput[name] = round(rows / min(times) / cpus, 1)
    return {
        "rows": rows,
        "factor": factor,
        "repeats": scan_repeats,
        "query_best_sec": best,
        "query_median_sec": medians,
        "query_spread_sec": spreads,
        "rows_per_sec_per_core": throughput,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    names = [
        n for n in os.environ.get("BENCH_QUERIES", ",".join(DEFAULT_QUERIES)).split(",")
        if n in suite.registry()
    ]
    try:
        sf = float(Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        sf = -1.0

    spark = get_spark(app_name=f"bench-{Path(sf_dir).name}", master=f"local[{cpus}]")
    per_query: dict[str, float] = {}
    stds: dict[str, float] = {}
    for name in names:
        r = bench_query(spark, name, sf_dir, repeats)
        per_query[name] = round(r["mean"], 4)
        stds[name] = round(r["std"], 4)

    out = {
        "metric": "suite_mean_sec",
        "value": round(sum(per_query.values()), 4),
        "unit": "sec",
        "queries": per_query,
        "stds": stds,
        "sf": sf,
        "repeats": repeats,
        "cpus": int(cpus),
    }
    if scan_bench.scan_enabled():
        scan = bench_scan(spark, sf_dir, int(cpus), repeats)
        out["scan"] = scan
        # headline per-core scan throughput: median across the six
        # scan-bound reference shapes (rows/s/core, machine-comparable)
        out["rows_per_sec_per_core"] = statistics.median(
            scan["rows_per_sec_per_core"].values()
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
