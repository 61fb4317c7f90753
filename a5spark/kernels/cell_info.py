"""Closed-form cell metadata (counts, areas, edge lengths).

Semantics: reference /root/reference/a5/core/cell_info.py:11-91.
Vectorized over resolution arrays; counts use Python ints when they exceed
int64 (resolution 30 has 60 * 4^29 > 2^63 cells).
"""

import math

import numpy as np

from .constants import AUTHALIC_AREA_EARTH, FIRST_HILBERT_RESOLUTION


def get_num_cells(resolution: int) -> int:
    if resolution < 0:
        return 0
    if resolution == 0:
        return 12
    return 60 * (4 ** (resolution - 1))


def get_num_children(parent_resolution: int, child_resolution: int) -> int:
    if child_resolution < parent_resolution:
        return 0
    if child_resolution == parent_resolution:
        return 1
    if parent_resolution >= FIRST_HILBERT_RESOLUTION:
        return 4 ** (child_resolution - parent_resolution)
    parent_count = get_num_cells(parent_resolution) or 1
    return get_num_cells(child_resolution) // parent_count


def cell_area(resolution) -> np.ndarray:
    """Equal-area cells: AUTHALIC_AREA_EARTH / num_cells. Accepts scalars or
    arrays of resolutions."""
    res = np.asarray(resolution, dtype=np.int64)
    num = np.where(
        res == 0, 12.0, 60.0 * np.power(4.0, np.maximum(res, 1) - 1)
    )
    out = AUTHALIC_AREA_EARTH / num
    return np.where(res < 0, AUTHALIC_AREA_EARTH, out)


EDGE_LENGTH_RATIOS = [0.7131, 1.4818, 0.8164, 0.8198, 0.8208, 0.821]
EDGE_LENGTH_RATIO = 0.8211


def cell_edge_length_avg(resolution: int) -> float:
    if resolution < 0:
        resolution = 0
    ratio = (
        EDGE_LENGTH_RATIOS[resolution]
        if resolution < len(EDGE_LENGTH_RATIOS)
        else EDGE_LENGTH_RATIO
    )
    return ratio * math.sqrt(float(cell_area(resolution)))
