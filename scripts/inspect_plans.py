#!/usr/bin/env python
"""Physical-plan audit: prints formatted plans for the headline operators and
flags anti-patterns (nested-loop joins, cartesian products, missing
broadcasts, unpruned scans). Output is committed as PLANS.md."""

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("A5_TEST_SF_DIR", "/root/testdata/sf0.01")

AUDIT = [
    "hier_parent_rollup",
    "hier_child_join",
    "cell_density_r7",
    "multires_rollup",
    "radius_join",
    "knn_images",
    "pip_join",
    "minhash_lsh",
    "ann_quantized",
    "ann_lsh",
    "ann_ivf",
    "compact_cover",
    "cover_set_ops",
    "tile_pyramid",
    "line_trace",
    "hex_roundtrip",
    "simhash_neardup",
    "embed_neardup",
    "focal_smoothing",
    "hot_region_vectorize",
    "image_checksums",
    "image_stats",
    "image_resize",
    "grid_disk",
    "skewed_density",
    "crossmodal_neardup",
    "doc_quality",
]


def main():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from a5spark.entry_queries import QUERIES
    from a5spark.session import get_spark

    spark = get_spark("a5spark-plans")
    spark.sparkContext.setLogLevel("ERROR")

    lines = ["# Physical plan audit", ""]
    verdicts = []
    for name in AUDIT:
        df = QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        flags = []
        if "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan:
            flags.append("NESTED-LOOP/CARTESIAN JOIN PRESENT")
        if "BroadcastHashJoin" in plan:
            flags.append("broadcast hash join")
        if "SortMergeJoin" in plan:
            flags.append("sort-merge join")
        if "HashAggregate" in plan:
            flags.append("two-phase hash agg")
        if "PushedFilters: [" in plan and "PushedFilters: []" not in plan:
            flags.append("filters pushed to scan")
        verdicts.append((name, flags))
        lines.append(f"## {name}")
        lines.append("")
        lines.append("flags: " + (", ".join(flags) if flags else "(none)"))
        lines.append("")
        lines.append("```")
        # keep the plan tree, drop the verbose node details
        tree_end = plan.find("\n\n(1)")
        lines.append(plan[: tree_end if tree_end > 0 else 4000].rstrip())
        lines.append("```")
        lines.append("")

    spark.stop()
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(out)
    for name, flags in verdicts:
        print(f"{name}: {', '.join(flags) if flags else '-'}")


if __name__ == "__main__":
    main()
