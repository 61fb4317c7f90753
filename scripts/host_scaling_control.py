#!/usr/bin/env python
"""Spark-free host-scaling control: raw multiprocessing encode throughput at
several process counts. Separates the ENGINE's scaling (Spark job) from the
HOST's achievable ceiling (this microVM throttles and steals CPU, so Spark
efficiency numbers are only meaningful relative to this control measured at
the same time). Prints one JSON line."""

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PER_PROC = 200_000
ROUNDS = 3


def _worker(n):
    import numpy as np

    from a5spark.kernels.cell import lonlat_to_cell

    k = np.arange(n, dtype=np.int64)
    lon = (k % 1048576) * 9973.0 % 360000 / 1000.0 - 180.0
    lat = np.degrees(np.arcsin(((k % 1048576) * 104729.0 + 54321) % 2000001 / 1000000.0 - 1.0))
    t0 = time.time()
    lonlat_to_cell(lon, lat, 9)
    return n / (time.time() - t0)


def measure(procs):
    best = 0.0
    for _ in range(ROUNDS):
        with mp.get_context("spawn").Pool(procs) as pool:
            pool.map(_worker, [N_PER_PROC // 4] * procs)  # warm pages
            t0 = time.time()
            pool.map(_worker, [N_PER_PROC] * procs)
            agg = procs * N_PER_PROC / (time.time() - t0)
        best = max(best, agg)
    return best


def main():
    out = {}
    levels = [int(x) for x in os.environ.get("LEVELS", "2,8,32").split(",")]
    for p in levels:
        out[f"procs_{p}"] = round(measure(p), 1)
    for lo, hi in zip(levels, levels[1:]):
        out[f"ceiling_efficiency_{lo}_to_{hi}"] = round(
            (out[f"procs_{hi}"] / out[f"procs_{lo}"]) / (hi / lo), 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
