#!/usr/bin/env python
"""Layout pruned-scan vs full-scan WALL-TIME evidence at a large scale
factor.

Round 5 recorded the pruned fraction (9.4% of files / 9.1% of bytes for a
res-4 cover) at small sf, where fixed overheads hide the wall-time win; this
script measures the same cover-restricted aggregation two ways over an
EXISTING cell layout (write one first, e.g. by running the
`cell_layout_scan` registry query against a replicated sf dir — see
scripts/bench_sf1.py):

  pruned      : scan_cell_layout (manifest file pruning + pushed BETWEEN
                row-group pruning) -> parent rollup
  clustered   : read ALL layout parquet + the same BETWEEN predicate ->
                rollup. NOT a strawman-free baseline: the layout is
                globally sorted, so even without the manifest the parquet
                row-group min/max stats are tight and skip almost
                everything — this isolates the manifest's own overhead.
  unclustered : the same rows written in NATURAL (ingest) order + the same
                predicate — the true layout-unaware baseline: every
                row-group straddles the key space, min/max stats prune
                nothing, the scan decodes the whole table.

All run best-of-N (bursty microVM) and must agree row-for-row.

Usage: python scripts/layout_scan_evidence.py [layout_path] [reps]
       python scripts/layout_scan_evidence.py --wide [n_rows] [reps]

The narrow three-way (first form) shows pruning does NOT buy wall time when
the query touches only narrow compressible columns — parquet decodes 60M
such rows sub-second regardless (recorded honestly in BASELINE.md). The
--wide form is the images-table shape (a ~0.5 KB payload column the query
must read, like `bytes` feeding a decode kernel): there scan cost is
payload I/O and the pruned fraction converts ~1:1 into wall time.
"""

import json
import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDE = "--wide" in sys.argv
_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
if WIDE:
    PATH = "/tmp/a5spark_layout_wide"
    N_ROWS = int(_pos[0]) if _pos else 6_000_000
    REPS = int(_pos[1]) if len(_pos) > 1 else 3
else:
    PATH = _pos[0] if _pos else "/tmp/a5spark_oracle/cell_layout_r9"
    REPS = int(_pos[1]) if len(_pos) > 1 else 3


def build_wide(spark):
    """Images-shaped layout: (cell, l_quantity, payload ~0.5 KB). Payload is
    deterministic filler the query must READ (sum of lengths after a
    substring touch — forces full column materialization)."""
    from pyspark.sql import functions as F

    from a5spark.operators import layout
    from a5spark.operators.spatial import assign_cells
    from a5spark.sources.images import synthesize_images

    if os.path.isdir(os.path.join(PATH, "_versions")):
        return
    img = assign_cells(synthesize_images(spark, N_ROWS, with_bytes=False), 9)
    df = img.select(
        "cell",
        (F.col("k") % 50).alias("l_quantity"),
        F.repeat(F.sha2(F.col("image_id"), 256), 8).alias("payload"),
    )
    layout.write_cell_layout(df, PATH, cell="cell", n_files=32)


def main():
    from pyspark.sql import functions as F

    from a5spark.entry_queries import _LAYOUT_COVER
    from a5spark.functions import native
    from a5spark.operators import layout
    from a5spark.session import get_spark

    spark = get_spark("a5spark-layout-evidence", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    if WIDE:
        build_wide(spark)
    man = layout.read_manifest(spark, PATH)
    key_col = man["key_col"]
    if WIDE:
        # cover = 3 populated res-4 parents (data-derived — the wide table's
        # spatial distribution differs from the lineitem fixture cover)
        cover = [
            r["p"]
            for r in spark.read.parquet(f"{PATH}/*.parquet")
            .select(native.cell_to_parent(F.col("cell"), 4).alias("p"))
            .distinct()
            .orderBy("p")
            .limit(3)
            .collect()
        ]
        touch = F.sum(
            F.length(F.substring(F.col("payload"), 2, 1 << 20))
        ).alias("s")
    else:
        cover = _LAYOUT_COVER
        touch = F.sum("l_quantity").alias("s")
    ranges = layout.cover_key_ranges(cover)
    rollup = lambda df: (
        df.groupBy(native.cell_to_parent(F.col("cell"), 4).alias("p"))
        .agg(F.count(F.lit(1)).alias("n"), touch)
    )

    def pruned():
        scanned, stats = layout.scan_cell_layout(spark, PATH, cover)
        return rollup(scanned), stats

    pred = reduce(
        lambda a, b: a | b,
        [F.col(key_col).between(lo, hi) for lo, hi in ranges],
    )

    def clustered():
        return rollup(spark.read.parquet(f"{PATH}/*.parquet").filter(pred)), None

    # unclustered baseline: same rows, natural (hash-of-nothing) order —
    # repartition() round-robins rows so every file/row-group spans the key
    # space and parquet stats cannot prune
    unc = PATH.rstrip("/") + "_unclustered"
    if not os.path.isdir(unc):
        spark.read.parquet(f"{PATH}/*.parquet").repartition(
            len(man["files"])
        ).write.mode("overwrite").parquet(unc)

    def unclustered():
        return rollup(spark.read.parquet(unc).filter(pred)), None

    # warm (JVM + committed-file listing)
    pruned()[0].count()
    clustered()[0].count()
    unclustered()[0].count()

    out = {"path": PATH, "files_total": len(man["files"]),
           "rows_total": sum(e["rows"] for e in man["files"])}
    for name, fn in (
        ("pruned", pruned), ("clustered", clustered), ("unclustered", unclustered)
    ):
        best, samples = None, []
        for _ in range(REPS):
            t0 = time.time()
            df, stats = fn()
            n = df.count()
            dt = time.time() - t0
            samples.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        out[name] = {"sec": round(best, 3), "samples": samples, "groups": n}
        if name == "pruned" and stats:
            out["pruned_stats"] = {
                k: stats[k]
                for k in ("files_selected", "files_total", "rows_in_selected_files",
                          "rows_total", "strategy")
            }
    a = sorted(map(tuple, pruned()[0].collect()))
    b = sorted(map(tuple, clustered()[0].collect()))
    c = sorted(map(tuple, unclustered()[0].collect()))
    out["parity"] = a == b == c
    out["speedup_vs_unclustered"] = round(
        out["unclustered"]["sec"] / out["pruned"]["sec"], 2
    )
    out["speedup_vs_clustered"] = round(
        out["clustered"]["sec"] / out["pruned"]["sec"], 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
