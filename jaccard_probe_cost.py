#!/usr/bin/env python
"""Measured cost of the jaccard live calibration probe (VERDICT r10
item 7): ``_calibrated_jaccard_partitions`` adds one column-pruned
count plus one hash-spread sampled tokenize when the static gate
engages; this harness times the probe ALONE against the full pipeline
at an ENGAGED factor and writes the split into the round's
``SCALING_CPU_r{N}_jaccard.json`` (``calibration_probe`` section), so
the "probe is ~free" claim is a number.

Reuses corpus_scale_bench's factor cache (run it first, or this builds
the factor dir itself).  Env: PROBE_FACTOR (default 256),
PROBE_REPEATS (default 3, min-of-k), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from corpus_scale_bench import materialize, round_no
from nyc_taxi_data_clickhouse_spark.operators import dedup
from nyc_taxi_data_clickhouse_spark.session import get_spark


def main() -> None:
    factor = int(os.environ.get("PROBE_FACTOR", "256"))
    repeats = int(os.environ.get("PROBE_REPEATS", "3"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    base = os.environ.get("SCALE_BASE", "/root/testdata/sf0.1")
    spark = get_spark(app_name="jaccard-probe-cost", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = materialize(spark, base, factor)["salted"]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # one untimed warmup of each side (cold-JIT discipline, BENCH_NOTES)
    width = dedup._calibrated_jaccard_partitions(docs, "text", "doc_id", 3)
    assert width is not None, (
        f"factor {factor} did not engage the calibration gate — probe "
        "cost at a disengaged factor is 0 by construction; raise "
        "PROBE_FACTOR"
    )
    probe_walls = []
    for _ in range(repeats):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        dedup._calibrated_jaccard_partitions(docs, "text", "doc_id", 3)
        probe_walls.append(time.perf_counter() - t0)

    def run_pipeline():
        dedup.ngram_jaccard_pairs(docs, threshold=0.8).write.format(
            "noop"
        ).mode("overwrite").save()

    run_pipeline()  # warmup
    pipe_walls = []
    for _ in range(repeats):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        run_pipeline()
        pipe_walls.append(time.perf_counter() - t0)

    probe, pipe = min(probe_walls), min(pipe_walls)
    row = {
        "factor": factor,
        "derived_width": width,
        "probe_wall_sec": round(probe, 3),
        "pipeline_wall_sec": round(pipe, 3),
        "probe_fraction": round(probe / pipe, 4),
        "repeats": repeats,
        "note": "probe = one column-pruned count + one hash-spread "
        "sampled tokenize agg; pipeline includes the probe (it runs "
        "inside ngram_jaccard_pairs when shuffle_partitions=None)",
    }
    out = Path(__file__).resolve().parent / (
        f"SCALING_CPU_r{round_no():02d}_jaccard.json"
    )
    payload = json.loads(out.read_text()) if out.exists() else {}
    payload["calibration_probe"] = row
    out.write_text(json.dumps(payload, indent=2) + "\n")
    print(json.dumps(row))
    print(f"merged -> {out.name}", file=sys.stderr)


if __name__ == "__main__":
    main()
