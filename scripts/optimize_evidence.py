#!/usr/bin/env python
"""Measured evidence for the layout OPTIMIZE op (operators/layout.py).

The small-file problem this op exists for: an incrementally-written cell
layout accretes many under-sized files, and every scan then pays per-file
open/schedule cost while row-group pruning degenerates (one tiny group per
file). This script writes the res-9 assignment table at
$SPARK_GRAFT_SF_DIR scale as a deliberately fragmented layout (many small
files), measures a cover scan and a full-table aggregate, runs
optimize_cell_layout, and measures both again on the SAME rows. Reports
best-of-N walls, files/tasks touched both ways, and the one-time optimize
cost (the amortization denominator).

Usage: [SPARK_GRAFT_SF_DIR=...] python scripts/optimize_evidence.py
Defaults to the 10x-replicated sf1 lineitem if present (1.5M rows), else
sf0.1.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DEFAULT = "/tmp/a5spark_sf1" if os.path.isdir("/tmp/a5spark_sf1") else "/root/testdata/sf0.1"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", _DEFAULT)
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
FRAGMENTED_FILES = int(os.environ.get("SPARK_GRAFT_FRAG_FILES", "256"))
LAYOUT = "/tmp/a5spark_optimize_evidence/layout"


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def main():
    from pyspark.sql import functions as F

    from a5spark.entry_queries import _LAYOUT_COVER, _spark_cell9
    from a5spark.operators import layout
    from a5spark.session import get_spark

    spark = get_spark("a5spark-optimize-evidence", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    df = _spark_cell9(li).select("cell", "l_quantity")
    t_write, manifest = timed(
        lambda: layout.write_cell_layout(
            df, LAYOUT, cell="cell", n_files=FRAGMENTED_FILES
        )
    )
    total_bytes = sum(e["bytes"] for e in manifest["files"])
    total_rows = sum(e["rows"] for e in manifest["files"])

    def cover_scan():
        scanned, stats = layout.scan_cell_layout(spark, LAYOUT, _LAYOUT_COVER)
        n = scanned.groupBy().agg(
            F.count(F.lit(1)), F.sum("l_quantity")
        ).collect()[0][0]
        return n, stats

    def full_scan():
        m = layout.read_manifest(spark, LAYOUT)
        frame = spark.read.parquet(*[f"{LAYOUT}/{e['file']}" for e in m["files"]])
        return frame.groupBy().agg(
            F.count(F.lit(1)), F.sum("l_quantity")
        ).collect()[0][0]

    def sample(fn):
        walls, val = [], None
        for _ in range(N_RUNS):
            t, v = timed(fn)
            walls.append(round(t, 3))
            val = v
        return min(walls), walls, val

    results = {}
    for phase in ("fragmented", "optimized"):
        if phase == "optimized":
            t_opt, stats = timed(
                lambda: layout.optimize_cell_layout(
                    spark, LAYOUT, target_file_bytes=max(total_bytes // 16, 1)
                )
            )
            results["optimize_sec"] = round(t_opt, 3)
            results["optimize_stats"] = stats
        cw, cws, (cn, cstats) = sample(cover_scan)
        fw, fws, fn_ = sample(full_scan)
        results[phase] = {
            "files": len(layout.read_manifest(spark, LAYOUT)["files"]),
            "cover_wall_best": cw,
            "cover_walls": cws,
            "cover_rows": cn,
            "cover_files_opened": cstats["files_selected"],
            "full_wall_best": fw,
            "full_walls": fws,
            "full_rows": fn_,
        }
    assert results["fragmented"]["cover_rows"] == results["optimized"]["cover_rows"]
    assert results["fragmented"]["full_rows"] == results["optimized"]["full_rows"] == total_rows

    out = {
        "sf_dir": SF_DIR,
        "rows": total_rows,
        "layout_bytes": total_bytes,
        "fragmented_files": FRAGMENTED_FILES,
        "initial_write_sec": round(t_write, 3),
        **results,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
