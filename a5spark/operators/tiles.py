"""Raster tile pyramid keyed by A5 pentagon cell.

Emits one raster tile per (resolution, cell): images falling in the cell are
rasterized as a density grid over the cell's lonlat bounding box (numpy-only
renderer — a codec-free stand-in for real image mosaicking).

Scale design — JVM pixel binning + bounded assembly, no all-rows-into-one-task
shuffle and no per-row Python:

  1. each tile cell's georeference (boundary ring + bbox) is computed once per
     DISTINCT cell (batched kernel UDF) and broadcast;
  2. the pixel index is a pure Catalyst expression over (lon, lat, bbox) — the
     hot path stays inside whole-stage codegen;
  3. hit counts aggregate by (cell, pixel): a two-phase hash agg whose shuffle
     volume is bounded by #cells * px^2 REGARDLESS of input rows (map-side
     combine absorbs hot cells);
  4. tile assembly collapses each cell's <= px^2 count rows into paired
     (pixel, count) arrays JVM-side (sorted collect_list) and one Arrow-batched
     UDF scatters THOUSANDS of tiles per batch with a single vectorized numpy
     pass — no per-group pandas overhead; the non-linear log/normalize finish
     runs once per tile.

Integer hit counts are associative, so the result is bit-identical to a
single-pass render (asserted in tests/test_pipeline.py).
"""

import json
from typing import List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from a5spark.functions import native

_GEOREF_SCHEMA = StructType(
    [
        StructField("bounds_json", StringType()),
        StructField("lon_min", DoubleType()),
        StructField("lat_min", DoubleType()),
        StructField("lon_max", DoubleType()),
        StructField("lat_max", DoubleType()),
    ]
)


@F.pandas_udf(_GEOREF_SCHEMA)
def _a5_tile_georef(cell: pd.Series) -> pd.DataFrame:
    """Batched georeference per cell: boundary ring JSON + lonlat bbox."""
    from a5spark.kernels.cell import cell_to_boundary
    from a5spark.kernels.serialization import from_signed, get_resolution

    cells = from_signed(cell.to_numpy(np.int64))
    n = len(cells)
    bjson = [None] * n
    mins = np.zeros((n, 2))
    maxs = np.zeros((n, 2))
    res = get_resolution(cells)
    for r in np.unique(res):
        idx = np.where(res == r)[0]
        rings = cell_to_boundary(cells[idx])
        for j, i in enumerate(idx):
            bjson[i] = json.dumps(rings[j].tolist())
            mins[i] = rings[j].min(axis=0)
            maxs[i] = rings[j].max(axis=0)
    return pd.DataFrame(
        {
            "bounds_json": bjson,
            "lon_min": mins[:, 0],
            "lat_min": mins[:, 1],
            "lon_max": maxs[:, 0],
            "lat_max": maxs[:, 1],
        }
    )


TILE_SCHEMA = StructType(
    [
        StructField("cell", LongType()),
        StructField("resolution", IntegerType()),
        StructField("n_images", LongType()),
        StructField("tile_px", IntegerType()),
        StructField("tile", BinaryType()),
        StructField("bounds_json", StringType()),
    ]
)

def _make_tile_assembler(px: int):
    """Vectorized tile assembly: one numpy scatter + log/normalize pass over
    ALL tiles in an Arrow batch (pix/cnt are each cell's paired hit arrays)."""

    # bound the dense scratch grids to ~64 MB per chunk regardless of the
    # Arrow batch size (10k tiles x 64^2 px would otherwise peak ~0.7 GB)
    chunk_rows = max(1, (64 << 20) // (8 * px * px))

    @F.pandas_udf(BinaryType())
    def assemble(pix: pd.Series, cnt: pd.Series) -> pd.Series:
        n_rows = len(pix)
        if n_rows == 0:
            return pd.Series([], dtype=object)
        out = []
        for lo in range(0, n_rows, chunk_rows):
            p_chunk = pix.iloc[lo : lo + chunk_rows]
            c_chunk = cnt.iloc[lo : lo + chunk_rows]
            g = len(p_chunk)
            lens = np.fromiter((len(p) for p in p_chunk), dtype=np.int64, count=g)
            row_idx = np.repeat(np.arange(g, dtype=np.int64), lens)
            flat_pix = np.concatenate([np.asarray(p, dtype=np.int64) for p in p_chunk])
            flat_cnt = np.concatenate([np.asarray(c, dtype=np.int64) for c in c_chunk])
            grids = np.zeros((g, px * px), dtype=np.int64)
            grids[row_idx, flat_pix] = flat_cnt
            scaled = np.log1p(grids.astype(np.float64))
            mx = scaled.max(axis=1)
            mx[mx == 0.0] = 1.0
            tiles = (scaled / mx[:, None] * 255.0).astype(np.uint8)
            out.extend(t.tobytes() for t in tiles)
        return pd.Series(out)

    return assemble


def hit_grid(lon: np.ndarray, lat: np.ndarray, ring: np.ndarray, px: int) -> np.ndarray:
    """Integer hit counts of points binned over the cell's bbox (additive).

    Boundary rings come UNWRAPPED from cell_to_boundary (an antimeridian-
    straddling cell can span e.g. [176.7, 181.1]), while point longitudes are
    normalized to [-180, 180) — shift each point into the ring's frame first,
    or every western-hemisphere point of a straddling cell collapses into
    pixel column 0."""
    lon_min, lat_min = ring.min(axis=0)
    lon_max, lat_max = ring.max(axis=0)
    lon = lon + 360.0 * (lon_min - lon > 180.0) - 360.0 * (lon - lon_max > 180.0)
    dx = (lon_max - lon_min) or 1.0
    dy = (lat_max - lat_min) or 1.0
    xi = np.clip(((lon - lon_min) / dx * px).astype(np.int64), 0, px - 1)
    yi = np.clip(((lat - lat_min) / dy * px).astype(np.int64), 0, px - 1)
    grid = np.zeros((px, px), dtype=np.int64)
    np.add.at(grid, (yi, xi), 1)
    return grid


def finalize_tile(grid: np.ndarray) -> np.ndarray:
    """Non-linear finish applied once per tile: log scale + 0..255 normalize."""
    scaled = np.log1p(grid.astype(np.float64))
    mx = scaled.max() or 1.0
    return (scaled / mx * 255.0).astype(np.uint8)


def render_tile(lon: np.ndarray, lat: np.ndarray, ring: np.ndarray, px: int) -> np.ndarray:
    """Single-pass render (reference form for tests / verification)."""
    return finalize_tile(hit_grid(lon, lat, ring, px))


def _pixel_index(lon, lat, px: int):
    """Catalyst twin of hit_grid's binning: truncate-toward-zero cast + clip,
    identical IEEE op order to the numpy renderer ((v - min) / d * px),
    including the antimeridian unwrap of the point longitude into the ring
    frame (same +-360.0 adds, same 180 threshold)."""
    lon = (
        lon
        + F.when(F.col("lon_min") - lon > 180.0, F.lit(360.0)).otherwise(F.lit(0.0))
        - F.when(lon - F.col("lon_max") > 180.0, F.lit(360.0)).otherwise(F.lit(0.0))
    )
    dx = F.when(F.col("lon_max") == F.col("lon_min"), F.lit(1.0)).otherwise(
        F.col("lon_max") - F.col("lon_min")
    )
    dy = F.when(F.col("lat_max") == F.col("lat_min"), F.lit(1.0)).otherwise(
        F.col("lat_max") - F.col("lat_min")
    )
    xi = ((lon - F.col("lon_min")) / dx * px).cast("long")
    yi = ((lat - F.col("lat_min")) / dy * px).cast("long")
    xi = F.least(F.lit(px - 1), F.greatest(F.lit(0), xi))
    yi = F.least(F.lit(px - 1), F.greatest(F.lit(0), yi))
    return yi * px + xi


def tile_pyramid(
    assigned: DataFrame,
    resolutions: List[int],
    fine_cell: str = "cell",
    tile_px: int = 64,
) -> DataFrame:
    """Tile DataFrame for every requested level. `assigned` must carry
    (lon, lat, <fine_cell>) at a resolution >= max(resolutions).
    `resolutions` must be distinct (one tile per (resolution, cell)).

    All levels run as ONE pipeline (optimization round 8): a per-row
    explode attaches every level's parent cell, so the input is scanned
    once and the georef UDF / pixel-count / tile-assembly stages each run
    once over the (level, cell)-keyed relation instead of once per level —
    the per-level union paid the full stage chain (two shuffles + two
    Python stages) times len(resolutions). Shuffle volume is unchanged
    (same (level, cell, pixel) partial-agg bound); results are identical
    (same per-level binning, same deterministic assembly)."""
    from a5spark import cache

    px = int(tile_px)
    assemble = _make_tile_assembler(px)

    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(res).cast("int").alias("res"),
                    native.cell_to_parent(F.col(fine_cell), res).alias("tc"),
                )
                for res in resolutions
            ]
        )
    ).alias("__rp")
    level = assigned.select(pairs, "lon", "lat").select(
        F.col("__rp.res").alias("__res"),
        F.col("__rp.tc").alias("__tc"),
        "lon",
        "lat",
    )
    # georeference every DISTINCT tile cell (all levels together) in one
    # batched boundary pass; persisted because it feeds both the bbox
    # broadcast and the final bounds_json attach (caller releases via
    # cache.release_persisted)
    georef = cache.persist(
        level.select("__res", "__tc")
        .distinct()
        .withColumn("__g", _a5_tile_georef(F.col("__tc")))
        .select("__res", "__tc", "__g.*")
    )
    staged = level.join(
        F.broadcast(georef.drop("bounds_json")), ["__res", "__tc"]
    ).withColumn("pix", _pixel_index(F.col("lon"), F.col("lat"), px))
    counts = staged.groupBy("__res", "__tc", "pix").agg(
        F.count(F.lit(1)).alias("n")
    )
    hits = counts.groupBy("__res", "__tc").agg(
        F.sort_array(F.collect_list(F.struct("pix", "n"))).alias("hits"),
        F.sum("n").alias("n_images"),
    )
    return (
        hits.withColumn(
            "tile",
            assemble(
                F.transform(F.col("hits"), lambda x: x["pix"]),
                F.transform(F.col("hits"), lambda x: x["n"]),
            ),
        )
        .drop("hits")
        .join(
            F.broadcast(georef.select("__res", "__tc", "bounds_json")),
            ["__res", "__tc"],
        )
        .select(
            F.col("__tc").alias("cell"),
            F.col("__res").alias("resolution"),
            "n_images",
            F.lit(px).cast("int").alias("tile_px"),
            "tile",
            "bounds_json",
        )
    )


def verify_tiles(tiles_df: DataFrame, assigned: DataFrame, resolutions, tile_px=64) -> float:
    """Re-render and compare: returns the minimum PSNR across tiles (inf when
    bit-identical, as expected from the deterministic renderer). Verification
    helper only — it materializes both tile sets on the driver."""
    from a5spark.operators.multimodal import psnr

    re_rendered = tile_pyramid(assigned, resolutions, tile_px=tile_px)
    a = {(r["cell"], r["resolution"]): r["tile"] for r in tiles_df.collect()}
    b = {(r["cell"], r["resolution"]): r["tile"] for r in re_rendered.collect()}
    assert set(a) == set(b), "tile key sets differ"
    worst = float("inf")
    for k in a:
        pa = np.frombuffer(a[k], dtype=np.uint8).astype(np.float64)
        pb = np.frombuffer(b[k], dtype=np.uint8).astype(np.float64)
        worst = min(worst, psnr(pa, pb))
    return worst
