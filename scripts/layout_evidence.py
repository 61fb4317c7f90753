#!/usr/bin/env python
"""Scan-cost evidence for the cell-clustered layout (VERDICT r4 item 1).

Writes the res-9 assignment table twice at $SPARK_GRAFT_SF_DIR scale —
(a) cell-clustered (sorted by shifted key + manifest) and (b) hash-
distributed (what a naive pipeline writes) — then runs the same res-4
cover aggregate through both:

  * layout path: manifest file prune + pushed BETWEEN ranges;
  * baseline path: full scan + the same filter.

Prints one JSON line with files/rows/bytes touched and best-of-N wall
times. The FRACTIONS are the 100 TB story: files_selected/files_total and
rows_in_selected_files/rows_total are scale-invariant properties of the
sorted layout, while the baseline always touches every file.
"""

import json
import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LAYOUT = "/tmp/a5spark_layout_evidence/clustered"
BASELINE = "/tmp/a5spark_layout_evidence/hashed"
N = 5


def main():
    from pyspark.sql import functions as F

    from a5spark.entry_queries import _LAYOUT_COVER, _spark_cell9
    from a5spark.functions import native
    from a5spark.operators import layout
    from a5spark.session import get_spark

    spark = get_spark("a5spark-layout-evidence", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    df = _spark_cell9(li).select("cell", "l_quantity")
    manifest = layout.write_cell_layout(df, LAYOUT, cell="cell", n_files=32)
    (
        df.withColumn("cell_key", native.shifted_key(F.col("cell")))
        .repartition(32)
        .write.mode("overwrite")
        .parquet(BASELINE)
    )

    ranges = layout.cover_key_ranges(_LAYOUT_COVER)
    pred = reduce(
        lambda a, b: a | b,
        [F.col("cell_key").between(lo, hi) for lo, hi in ranges],
    )

    def agg(frame):
        return (
            frame.groupBy(native.cell_to_parent(F.col("cell"), 4).alias("p"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
            .collect()
        )

    def best(fn):
        times = []
        for _ in range(N):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        return round(min(times), 3), [round(t, 3) for t in times]

    scanned, stats = layout.scan_cell_layout(spark, LAYOUT, _LAYOUT_COVER)
    sel_files = set(os.path.basename(f) for f in scanned.inputFiles())
    byte_sel = sum(
        os.path.getsize(os.path.join(LAYOUT, f)) for f in sel_files
    )
    byte_tot = sum(
        os.path.getsize(os.path.join(LAYOUT, e["file"]))
        for e in manifest["files"]
    )

    t_layout, s_layout = best(
        lambda: agg(layout.scan_cell_layout(spark, LAYOUT, _LAYOUT_COVER)[0])
    )
    t_base, s_base = best(lambda: agg(spark.read.parquet(BASELINE).filter(pred)))

    n_match = scanned.count()
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "stats": stats,
                "bytes_selected": byte_sel,
                "bytes_total": byte_tot,
                "rows_matched": n_match,
                "layout_scan_sec_best": t_layout,
                "layout_samples": s_layout,
                "baseline_fullscan_sec_best": t_base,
                "baseline_samples": s_base,
                "file_fraction": round(
                    stats["files_selected"] / stats["files_total"], 4
                ),
                "row_fraction": round(
                    stats["rows_in_selected_files"] / stats["rows_total"], 4
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
