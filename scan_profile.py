"""Scan-gap profiler (VERDICT r3 item 7 — "profile it or improve ≥2×").

Decomposes the q1..q4 scan-shape cost on the ×100-replicated lineitem
(60 M rows at sf0.1) into its parts and measures each proposed lever in
isolation, so BENCH_NOTES.md can attribute the gap vs the reference's
ClickHouse numbers (BASELINE.md) with evidence instead of hand-waving.

Measurement hygiene (learned the hard way, twice): every variant is
timed in its OWN fresh JVM via subprocess — timing inside the JVM that
just wrote the variant tables reproduces the exact heap-bloat failure
VERDICT r2 #4 diagnosed (q4 24 s best-of-5 in the writer JVM vs 1.26 s
in a fresh one, re-confirmed this round).

Variants:

  base        current scan_bench layout (snappy, unsorted, 64 files)
  batch16k    spark.sql.parquet.columnarReaderBatchSize=16384
  part512m    spark.sql.files.maxPartitionBytes=512m
  uncomp      uncompressed parquet copy (decompression removed)
  clustered   copy sorted by (l_returnflag, l_linenumber, l_shipdate,
              l_quantity) — the MergeTree-ORDER-BY analog the engine's
              write_gold (sources/parquet.py) applies to gold tables;
              parquet then RLE/dict-encodes the group keys into runs
  clust_unc   clustered AND uncompressed
  cached      df.cache() in-memory columnar — parquet decode removed
              entirely; the remaining time IS the hash-agg cost, so
              (base − cached) isolates the decode share

Usage:
  python scan_profile.py prepare            # materialize variant tables
  python scan_profile.py time VARIANT       # one fresh-JVM measurement
  python scan_profile.py all [--repeats 7]  # prepare + all variants
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

CLUSTER_KEYS = ["l_returnflag", "l_linenumber", "l_shipdate", "l_quantity"]
VARIANTS = ["base", "batch16k", "part512m", "uncomp", "clustered",
            "clust_unc", "cached"]


def _scratch() -> Path:
    return Path(os.environ.get("BENCH_SCAN_DIR", Path(_REPO) / ".scan_bench"))


def _froot() -> Path:
    from nyc_taxi_data_clickhouse_spark import scan_bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    return _scratch() / f"{Path(sf_dir).name}_x{scan_bench.scan_factor()}_v2"


def variant_spec(name: str) -> dict:
    froot = _froot()
    return {
        "base": {"path": froot / "lineitem", "conf": {}},
        "batch16k": {"path": froot / "lineitem",
                     "conf": {"spark.sql.parquet.columnarReaderBatchSize": "16384"}},
        "part512m": {"path": froot / "lineitem",
                     "conf": {"spark.sql.files.maxPartitionBytes": "536870912"}},
        "uncomp": {"path": froot / "lineitem_uncomp", "conf": {}},
        "clustered": {"path": froot / "lineitem_clustered", "conf": {}},
        "clust_unc": {"path": froot / "lineitem_clust_unc", "conf": {}},
        "cached": {"path": froot / "lineitem", "conf": {}},
    }[name]


def prepare() -> None:
    """Materialize the base table + storage variants, then exit (the
    writer JVM is never used for timing)."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_clickhouse_spark import scan_bench
    from nyc_taxi_data_clickhouse_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="scan-profile-prepare", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    base_path, rows = scan_bench.materialize_big_lineitem(
        spark, sf_dir, scan_bench.scan_factor(), str(_scratch()))
    froot = _froot()
    for out, sorted_, codec in [
        (froot / "lineitem_uncomp", False, "uncompressed"),
        (froot / "lineitem_clustered", True, "snappy"),
        (froot / "lineitem_clust_unc", True, "uncompressed"),
    ]:
        if (out / "_SUCCESS").exists():
            continue
        df = spark.read.parquet(base_path)
        if sorted_:
            # sortWithinPartitions after a key repartition = the engine's
            # gold clustering (sources/parquet.py write_gold): contiguous
            # key runs per file -> parquet RLE/dictionary pages.
            df = df.repartition(64, *[F.col(c) for c in CLUSTER_KEYS[:2]]) \
                   .sortWithinPartitions(*CLUSTER_KEYS)
        df.write.mode("overwrite").option("compression", codec).parquet(str(out))
        print(f"materialized {out.name}", file=sys.stderr)
    print(json.dumps({"rows": rows}))


def time_variant(name: str, shapes: str, repeats: int) -> None:
    """Fresh-JVM timing of one variant; prints one JSON line."""
    from nyc_taxi_data_clickhouse_spark import scan_bench
    from nyc_taxi_data_clickhouse_spark.session import get_spark

    spec = variant_spec(name)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name=f"scan-profile-{name}",
                      master=f"local[{cpus}]",
                      extra_conf={k: str(v) for k, v in spec["conf"].items()})
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(str(spec["path"]))
    if name == "cached":
        df = df.cache()
        df.count()  # force full materialization into the columnar cache
    out: dict[str, dict] = {}
    for qname in shapes.split(","):
        shape = scan_bench.SCAN_SHAPES[qname]
        times = []
        for i in range(1 + repeats):  # 1 warmup
            if name != "cached":
                spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            shape(df).write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - t0
            if i >= 1:
                times.append(elapsed)
        out[qname] = {"best": round(min(times), 4),
                      "median": round(statistics.median(times), 4)}
    print(json.dumps({"variant": name, "shapes": out}))


def run_all(shapes: str, repeats: int, variants: list[str]) -> None:
    env = dict(os.environ)
    proc = subprocess.run([sys.executable, __file__, "prepare"],
                         capture_output=True, text=True, cwd=_REPO, env=env,
                         timeout=3600)
    if proc.returncode != 0:
        print(proc.stderr[-2000:], file=sys.stderr)
        sys.exit(1)
    print(f"prepare: {proc.stdout.strip().splitlines()[-1]}", file=sys.stderr)
    results = {}
    for v in variants:
        proc = subprocess.run(
            [sys.executable, __file__, "time", v, "--shapes", shapes,
             "--repeats", str(repeats)],
            capture_output=True, text=True, cwd=_REPO, env=env, timeout=3600)
        line = next((ln for ln in reversed(proc.stdout.strip().splitlines())
                     if ln.startswith("{")), None)
        if line is None:
            print(f"{v}: FAILED {proc.stderr.strip()[-500:]}", file=sys.stderr)
            continue
        payload = json.loads(line)
        results[v] = payload["shapes"]
        print(line, flush=True)
    print(json.dumps({"summary": results}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["prepare", "time", "all"])
    ap.add_argument("variant", nargs="?", choices=VARIANTS)
    ap.add_argument("--shapes", default="q1,q2,q3,q4")
    ap.add_argument("--repeats", type=int, default=7)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()
    if args.cmd == "prepare":
        prepare()
    elif args.cmd == "time":
        time_variant(args.variant, args.shapes, args.repeats)
    else:
        run_all(args.shapes, args.repeats, args.variants.split(","))


if __name__ == "__main__":
    main()
