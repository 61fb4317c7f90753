#!/usr/bin/env python
"""Best-of-N wall-time profile for a subset of the query registry — the
bisect tool for adjudicating bench regressions on this steal-prone host.

Usage: python scripts/profile_queries.py q1 q2 ... [--n 5] [--sf DIR]
Prints one JSON line {query: best_sec} plus per-run samples on stderr.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--n":
            n = int(argv[i + 1])
            args.remove(argv[i + 1])
        if a == "--sf":
            sf_dir = argv[i + 1]
            args.remove(argv[i + 1])

    from a5spark import cache
    from a5spark.entry_queries import QUERIES
    from a5spark.session import get_spark

    spark = get_spark("a5spark-profile", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    # warm workers once
    QUERIES["image_checksums"](spark, sf_dir).count()
    cache.release_persisted()

    out = {}
    for name in args:
        fn = QUERIES[name]
        samples = []
        for _ in range(n):
            t0 = time.time()
            fn(spark, sf_dir).count()
            samples.append(round(time.time() - t0, 3))
            cache.release_persisted()
        print(f"{name}: {samples}", file=sys.stderr)
        out[name] = min(samples)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
