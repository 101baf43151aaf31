"""spark-submit entrypoint.

Ships per the north rule as::

    spark-submit --py-files $(python -c 'from spel_spark.session import \
        package_zip; print(package_zip())') -m spel_spark.cli \
        run --input /path/transcripts --output /path/out

(in local dev simply ``python -m spel_spark.cli ...``).

Subcommands:
  run        full ER pipeline over a transcripts parquet/Iceberg path with
             checkpointed stages + resume (default) under --output
  bench      alias for bench.py default mode
  lineage    print the lineage table of a checkpoint store
"""

from __future__ import annotations

import argparse
import sys


def _cmd_run(args: argparse.Namespace) -> int:
    from spel_spark.io import CheckpointStore
    from spel_spark.pipeline import PipelineConfig, run_pipeline
    from spel_spark.session import get_spark

    spark = get_spark(app_name="spel_spark_run")
    transcripts = spark.read.parquet(args.input)
    redirects = spark.read.parquet(args.redirects) if args.redirects else None
    store = CheckpointStore(spark, args.output)
    cfg = PipelineConfig(
        threshold=args.threshold,
        exact_pairs=args.exact_pairs,
    )
    clusters = run_pipeline(
        spark, transcripts, store, redirects=redirects, config=cfg,
        resume=not args.no_resume,
    )
    n = clusters.count()
    k = clusters.select("cluster_id").distinct().count()
    print(f"clusters: {n} mentions in {k} clusters -> {args.output}/clusters")
    return 0


def _cmd_lineage(args: argparse.Namespace) -> int:
    from spel_spark.io import CheckpointStore
    from spel_spark.session import get_spark

    spark = get_spark(app_name="spel_spark_lineage")
    store = CheckpointStore(spark, args.output)
    store.read_lineage().orderBy("wall_ts").show(200, truncate=False)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="spel_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="run the ER pipeline")
    r.add_argument("--input", required=True, help="transcripts parquet path")
    r.add_argument("--output", required=True, help="checkpoint store dir")
    r.add_argument("--redirects", default=None, help="redirects parquet path")
    r.add_argument("--threshold", type=float, default=0.60)
    r.add_argument("--exact-pairs", action="store_true",
                   help="exact all-pairs blocking (default: anchor-sparsified)")
    r.add_argument("--no-resume", action="store_true",
                   help="recompute every stage even if checkpointed")
    r.set_defaults(fn=_cmd_run)

    li = sub.add_parser("lineage", help="show per-stage lineage rows")
    li.add_argument("--output", required=True)
    li.set_defaults(fn=_cmd_lineage)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
