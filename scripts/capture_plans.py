#!/usr/bin/env python
"""Capture .explain('formatted') output for named registry queries into
plans/<tag>/<query>_<suffix>.txt (the optimization-round evidence files).

Usage: python scripts/capture_plans.py TAG SUFFIX q1 q2 ...
"""

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(outdir, exist_ok=True)

    from a5spark import cache
    from a5spark.entry_queries import QUERIES
    from a5spark.session import get_spark

    # engine-only mode: plans should show the computation, not the oracle
    # snapshot round-trip
    os.environ["SPARK_GRAFT_SKIP_SNAPSHOT"] = "1"
    spark = get_spark("a5spark-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        for name in names:
            df = QUERIES[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            cache.release_persisted()
            print(path)
    finally:
        os.environ.pop("SPARK_GRAFT_SKIP_SNAPSHOT", None)
        spark.stop()


if __name__ == "__main__":
    main()
