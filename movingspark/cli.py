"""spark-submit entrypoints (north rule: 'ships via spark-submit
--py-files to a multi-executor cluster').

Usage on a cluster:

    python tools/package.py
    spark-submit --py-files dist/movingspark.zip -m movingspark.cli \\
        pipeline --input <iceberg-or-parquet docs table> \\
                 --checkpoints <path> --res 8 --aoi "x0,y0,x1,y1"

Subcommands:
- pipeline: the north-rule job — docs -> explode -> spatial join +
  tiling -> reassembly invariant, checkpointed per stage with
  per-partition lineage (resume by re-running with the same
  --checkpoints path).
- kinematics: derive D1-D6 columns for a point table.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def build_session(app: str) -> SparkSession:
    from movingspark.session import tune_builder

    return tune_builder(SparkSession.builder.appName(app)).getOrCreate()


def cmd_pipeline(args) -> int:
    from movingspark import ingest, joins
    from movingspark.checkpoint import Checkpointer

    spark = build_session("movingspark-pipeline")
    ck = Checkpointer(spark, args.checkpoints)

    if args.input:
        from movingspark.catalog import read_table
        docs = read_table(spark, args.input)
    else:
        docs = ingest.synth_interleaved_docs(spark, args.synth_docs)

    x0, y0, x1, y1 = (float(v) for v in args.aoi.split(","))
    aoi = [(x0, y1), (x1, y1), (x1, y0), (x0, y0)]

    pts = ck.stage("points", lambda: ingest.explode_doc_points(docs))
    joined = ck.stage(
        "spatial_join",
        lambda: joins.point_in_polygon_join(pts, [("aoi", aoi)], res=args.res),
    )
    tiles = ck.stage("tiles", lambda: joins.tile_rollup(pts, res=args.res, n_salt=args.salt))
    bad = ingest.span_invariant_violations(docs)
    n_bad = bad.count()
    summary = {
        "join_rows": joined.count(),
        "tiles": tiles.count(),
        "span_invariant_violations": n_bad,
        "stages": ck.log,
    }
    print(json.dumps(summary))
    return 1 if n_bad else 0


def cmd_kinematics(args) -> int:
    from movingspark import derive

    spark = build_session("movingspark-kinematics")
    from movingspark.catalog import read_table
    df = read_table(spark, args.input)
    out = derive.add_all_kinematics(df, latlon=args.latlon)
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"rows": spark.read.parquet(args.output).count()}))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="movingspark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("pipeline")
    p.add_argument("--input", default=None, help="docs table path (parquet/iceberg)")
    p.add_argument("--synth-docs", type=int, default=100_000, help="synthesize docs when no --input")
    p.add_argument("--checkpoints", required=True)
    p.add_argument("--res", type=int, default=8)
    p.add_argument("--salt", type=int, default=0)
    p.add_argument("--aoi", default="-60,-60,60,60")
    p.set_defaults(fn=cmd_pipeline)

    k = sub.add_parser("kinematics")
    k.add_argument("--input", required=True)
    k.add_argument("--output", required=True)
    k.add_argument("--latlon", action="store_true")
    k.set_defaults(fn=cmd_kinematics)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
