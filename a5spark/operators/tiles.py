"""Raster tile pyramid keyed by A5 pentagon cell.

Emits one raster tile per (resolution, cell): images falling in the cell are
rasterized as a density grid over the cell's lonlat bounding box (numpy-only
renderer — a codec-free stand-in for real image mosaicking, with the Spark
topology identical: groupBy(parent_cell).applyInPandas(render)).

The pyramid is produced level by level from the finest assignment with
JVM-side parent rollups, so the image table is encoded exactly once.
Tiles carry their georeference (cell boundary ring) and verify by re-render
PSNR (>= 40 dB gate; the renderer is deterministic so PSNR is inf).
"""

import json
from typing import List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from a5spark.functions import native


@F.pandas_udf(StringType())
def _a5_boundary_json(cell: pd.Series) -> pd.Series:
    """Batched cell boundary rings as JSON (georeference for tiles)."""
    from a5spark.kernels.cell import cell_to_boundary
    from a5spark.kernels.serialization import from_signed, get_resolution

    cells = from_signed(cell.to_numpy(np.int64))
    out = [None] * len(cells)
    res = get_resolution(cells)
    for r in np.unique(res):
        idx = np.where(res == r)[0]
        rings = cell_to_boundary(cells[idx])
        for j, i in enumerate(idx):
            out[i] = json.dumps(rings[j].tolist())
    return pd.Series(out)


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


def render_tile(lon: np.ndarray, lat: np.ndarray, ring: np.ndarray, px: int) -> np.ndarray:
    """Density raster of points in the cell's bbox: log-scaled hit counts."""
    lon_min, lat_min = ring.min(axis=0)
    lon_max, lat_max = ring.max(axis=0)
    dx = (lon_max - lon_min) or 1.0
    dy = (lat_max - lat_min) or 1.0
    xi = np.clip(((lon - lon_min) / dx * px).astype(np.int64), 0, px - 1)
    yi = np.clip(((lat - lat_min) / dy * px).astype(np.int64), 0, px - 1)
    grid = np.zeros((px, px), dtype=np.float64)
    np.add.at(grid, (yi, xi), 1.0)
    scaled = np.log1p(grid)
    mx = scaled.max() or 1.0
    return (scaled / mx * 255.0).astype(np.uint8)


def tile_pyramid(
    assigned: DataFrame,
    resolutions: List[int],
    fine_cell: str = "cell",
    tile_px: int = 64,
) -> DataFrame:
    """Tile DataFrame for every requested level. `assigned` must carry
    (lon, lat, <fine_cell>) at a resolution >= max(resolutions)."""

    def render(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cell_signed = int(pdf["__tile_cell"].iloc[0])
        res = int(pdf["__tile_res"].iloc[0])
        ring = np.array(json.loads(pdf["__bounds"].iloc[0]))
        tile = render_tile(
            pdf["lon"].to_numpy(np.float64), pdf["lat"].to_numpy(np.float64), ring, tile_px
        )
        return pd.DataFrame(
            {
                "cell": [cell_signed],
                "resolution": [res],
                "n_images": [len(pdf)],
                "tile_px": [tile_px],
                "tile": [tile.tobytes()],
                "bounds_json": [pdf["__bounds"].iloc[0]],
            }
        )

    out = None
    for res in resolutions:
        level = assigned.withColumn(
            "__tile_cell", native.cell_to_parent(F.col(fine_cell), res)
        ).withColumn("__tile_res", F.lit(res))
        # georeference every DISTINCT tile cell in one batched boundary pass,
        # then broadcast the bounds to the render groups — the boundary kernel
        # amortizes across the whole level instead of running once per group
        bounds = (
            level.select("__tile_cell")
            .distinct()
            .withColumn("__bounds", _a5_boundary_json(F.col("__tile_cell")))
        )
        staged = level.join(F.broadcast(bounds), "__tile_cell")
        tiles = staged.groupBy("__tile_cell").applyInPandas(render, TILE_SCHEMA)
        out = tiles if out is None else out.unionByName(tiles)
    return out


def verify_tiles(tiles_df: DataFrame, assigned: DataFrame, resolutions, tile_px=64) -> float:
    """Re-render and compare: returns the minimum PSNR across tiles (inf when
    bit-identical, as expected from the deterministic renderer)."""
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
