#!/usr/bin/env python
"""Kernel microbenchmarks mirroring the reference's pytest-benchmark suite
(BASELINE.md table) for direct comparison. Best-of-N timing (this host has
pathological first-touch page faults; see BASELINE.md caveat)."""

import json
import math
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from a5spark.kernels import cell as kcell
from a5spark.kernels import compact as kcompact
from a5spark.kernels import polyfill as kpoly
from a5spark.kernels import serialization as kser
from a5spark.kernels import traversal as ktrav
from a5spark.kernels.line import line_string_to_cells


def best_of(fn, n=5):
    best = math.inf
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def sphere_points(n, seed=42):
    rng = np.random.default_rng(seed)
    u = rng.uniform(-1, 1, n)
    t = rng.uniform(0, 2 * np.pi, n)
    return np.degrees(t) - 180, np.degrees(np.arcsin(u))


def main():
    out = {}
    lon, lat = sphere_points(256)
    lon_big, lat_big = sphere_points(100_000)

    kcell.lonlat_to_cell(lon, lat, 30)
    sec = best_of(lambda: kcell.lonlat_to_cell(lon, lat, 30), 3)
    out["lonlat_to_cell res 30 (256 pts)"] = {
        "sec": round(sec, 6), "per_op_us": round(sec / 256 * 1e6, 2)
    }
    for res in (5, 15):
        kcell.lonlat_to_cell(lon, lat, res)
        sec = best_of(lambda: kcell.lonlat_to_cell(lon, lat, res))
        out[f"lonlat_to_cell res {res} (256 pts)"] = {
            "sec": round(sec, 6), "per_op_us": round(sec / 256 * 1e6, 2)
        }
        kcell.lonlat_to_cell(lon_big, lat_big, res)
        sec = best_of(lambda: kcell.lonlat_to_cell(lon_big, lat_big, res), 2)
        out[f"lonlat_to_cell res {res} (100k pts)"] = {
            "sec": round(sec, 4), "rows_per_sec": round(100_000 / sec)
        }

    cells15 = kcell.lonlat_to_cell(lon, lat, 15)
    kcell.cell_to_lonlat(cells15)
    sec = best_of(lambda: kcell.cell_to_lonlat(cells15))
    out["cell_to_lonlat res 15 (256)"] = {"per_op_us": round(sec / 256 * 1e6, 2)}
    sec = best_of(lambda: kcell.cell_to_boundary(cells15))
    out["cell_to_boundary res 15 (256, auto segs)"] = {
        "per_op_us": round(sec / 256 * 1e6, 2)
    }
    sec = best_of(lambda: kser.cell_to_parent(cells15, 14))
    out["cell_to_parent 15->14 (256)"] = {"per_op_ns": round(sec / 256 * 1e9)}

    c9 = kcell.lonlat_to_cell(lon[:32], lat[:32], 9)
    for k in (1, 5):
        ktrav.grid_disk_batch(c9, k)
        sec = best_of(lambda: ktrav.grid_disk_batch(c9, k), 3)
        out[f"grid_disk k={k} (batch 32)"] = {"per_disk_ms": round(sec / 32 * 1e3, 2)}
    for radius in (10_000.0, 100_000.0):
        sec = best_of(lambda: ktrav.spherical_cap_batch(c9, radius), 3)
        out[f"spherical_cap res 9 r={int(radius/1000)}km (batch 32)"] = {
            "per_cap_ms": round(sec / 32 * 1e3, 2)
        }

    uk = [[[-8.0, 50.0], [2.0, 50.0], [2.0, 59.0], [-8.0, 59.0]]]
    sec = best_of(lambda: kpoly.polygon_to_cells(uk, 7), 5)
    out["polygon_to_cells uk_box res 7"] = {"ms": round(sec * 1e3, 1)}
    cover = kpoly.polygon_to_cells(uk, 10)
    sec = best_of(lambda: kcompact.compact(kcompact.uncompact(cover, 10)))
    out["compact uk_box res 10"] = {"ms": round(sec * 1e3, 1)}
    sec = best_of(lambda: kcompact.uncompact(cover, 12), 3)
    out["uncompact uk_box 10->12"] = {"ms": round(sec * 1e3, 1)}

    sec = best_of(
        lambda: line_string_to_cells([(-0.1276, 51.5074), (2.3522, 48.8566)], 9), 3
    )
    out["line_string London-Paris res 9"] = {"ms": round(sec * 1e3, 1)}

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
