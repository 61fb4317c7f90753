#!/usr/bin/env python
"""Production entry point for spark-submit.

Example (cluster):
    python scripts/build_pyfiles.py
    spark-submit --py-files dist/a5spark.zip \
        --conf spark.sql.shuffle.partitions=4096 \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.adaptive.skewJoin.enabled=true \
        scripts/submit_pipeline.py \
        --input <iceberg-table-or-parquet-path> --output /data/out \
        --resolution 9 --n-parts 1024

Runs the flagship cell-assignment + density pipeline with per-partition
checkpoint manifests (resumable: re-running skips committed partitions).
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None, help="parquet/iceberg path of the images table")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="testdata dir when no --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--resolution", type=int, default=9)
    ap.add_argument("--n-parts", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("a5spark-pipeline").getOrCreate()

    from a5spark.operators.spatial import assign_cells_multi
    from a5spark.pipeline.checkpoint import run_partitioned
    from a5spark.sources.images import images_from_sf_dir

    if args.input:
        images = spark.read.parquet(args.input)
    else:
        images = images_from_sf_dir(spark, args.sf_dir)

    assigned = assign_cells_multi(images, [args.resolution // 2, args.resolution])
    stats = run_partitioned(
        assigned, args.output, n_parts=args.n_parts, key="image_id"
    )
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
