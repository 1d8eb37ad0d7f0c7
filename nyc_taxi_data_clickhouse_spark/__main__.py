"""Pipeline CLI — the reference's end-to-end flow as one command each
(reference README.md walks the same stages by hand: import CSV ->
create trips -> CTAS trips_mergetree -> run benchmark queries).

  python -m nyc_taxi_data_clickhouse_spark ingest  --input RAW_CSV_GLOB --bronze DIR
  python -m nyc_taxi_data_clickhouse_spark curate  --bronze DIR --gold DIR [--strict-enums]
  python -m nyc_taxi_data_clickhouse_spark query   --gold DIR (--id q1|q2|q3|q4|total_count | --sql "SELECT ...")
  python -m nyc_taxi_data_clickhouse_spark export  --gold DIR --out DIR   (gzipped CSV shards)

The gold table registers as ``trips`` for --sql (E1 SQL entry point).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="nyc_taxi_data_clickhouse_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_ingest = sub.add_parser("ingest", help="raw CSV shards -> bronze parquet (S1-S4)")
    p_ingest.add_argument("--input", required=True)
    p_ingest.add_argument("--bronze", required=True)

    p_curate = sub.add_parser("curate", help="bronze -> curated gold table (E3, S5)")
    p_curate.add_argument("--bronze", required=True)
    p_curate.add_argument("--gold", required=True)
    p_curate.add_argument("--strict-enums", action="store_true")

    p_query = sub.add_parser("query", help="run a benchmark query or SQL on gold (E1)")
    p_query.add_argument("--gold", required=True)
    p_query.add_argument("--id", choices=["q1", "q2", "q3", "q4", "total_count"])
    p_query.add_argument("--sql")

    p_export = sub.add_parser("export", help="gold -> gzipped CSV shards (S3)")
    p_export.add_argument("--gold", required=True)
    p_export.add_argument("--out", required=True)

    p_suite = sub.add_parser(
        "suite",
        help="run (or explain) any suite-registry entry on a testdata dir",
    )
    p_suite.add_argument("--entry", help="entry name (omit with --list)")
    p_suite.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_suite.add_argument(
        "--explain", action="store_true",
        help="print the formatted physical plan instead of rows",
    )
    p_suite.add_argument("--list", action="store_true", help="list entries")

    args = parser.parse_args(argv)

    from nyc_taxi_data_clickhouse_spark.session import get_spark

    spark = get_spark(app_name=f"pipeline-{args.cmd}")
    t0 = time.perf_counter()

    if args.cmd == "ingest":
        from nyc_taxi_data_clickhouse_spark.sources.csv import read_trips_csv
        from nyc_taxi_data_clickhouse_spark.sources.parquet import write_bronze

        df = read_trips_csv(spark, args.input)
        write_bronze(df, args.bronze, mode="overwrite")
        n = spark.read.parquet(args.bronze).count()
        print(f"ingested {n} rows -> {args.bronze} in {time.perf_counter()-t0:.1f}s")

    elif args.cmd == "curate":
        from nyc_taxi_data_clickhouse_spark.plans.transform import curate_trips
        from nyc_taxi_data_clickhouse_spark.sources.parquet import write_gold

        bronze = spark.read.parquet(args.bronze)
        write_gold(curate_trips(bronze, strict_enums=args.strict_enums), args.gold)
        n = spark.read.parquet(args.gold).count()
        print(f"curated {n} rows -> {args.gold} in {time.perf_counter()-t0:.1f}s")

    elif args.cmd == "query":
        from nyc_taxi_data_clickhouse_spark.plans import queries as Q
        from nyc_taxi_data_clickhouse_spark.sources.parquet import attach_gold

        gold = attach_gold(spark, args.gold, table="trips")
        if args.sql:
            result = spark.sql(args.sql)
        elif args.id:
            fn = {"q1": Q.q1, "q2": Q.q2, "q3": Q.q3, "q4": Q.q4,
                  "total_count": Q.total_count}[args.id]
            result = fn(gold)
        else:
            parser.error("query needs --id or --sql")
        result.show(50, truncate=False)
        print(f"elapsed {time.perf_counter()-t0:.2f}s")

    elif args.cmd == "suite":
        from nyc_taxi_data_clickhouse_spark import suite as S

        reg = S.registry()
        if args.list:
            for name, spec in sorted(reg.items()):
                gate = "oracle" if spec.oracle else "rows-only"
                print(f"{name}  [{gate}]  {spec.doc.splitlines()[0] if spec.doc else ''}")
            return 0
        if not args.entry or args.entry not in reg:
            parser.error(f"--entry must be one of {len(reg)} registry names (see --list)")
        df = reg[args.entry].spark(spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        else:
            df.show(50, truncate=False)
            print(f"elapsed {time.perf_counter()-t0:.2f}s")

    elif args.cmd == "export":
        from nyc_taxi_data_clickhouse_spark.sources.csv import write_csv_shards

        gold = spark.read.parquet(args.gold)
        write_csv_shards(gold, args.out)
        print(f"exported -> {args.out} in {time.perf_counter()-t0:.1f}s")

    return 0


if __name__ == "__main__":
    sys.exit(main())
