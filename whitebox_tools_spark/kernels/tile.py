"""LidarTile grid arithmetic — the per-document tile assignment.

Parity contract (src/tools/lidar_analysis/lidar_tile.rs:257-282, 314-319):

    start_x_grid = floor((min_x - origin_x) / width)
    end_x_grid   = ceil((max_x - origin_x) / width)     (same for y)
    cols = |end_x_grid - start_x_grid|
    col  = floor((x - origin_x)/width  - start_x_grid)   # grid-relative!
    row  = floor((y - origin_y)/height - start_y_grid)
    tile = row * cols + col
    keep tile iff count(tile) > min_points, min_points clamped >= 2
"""

from __future__ import annotations

import math

import numpy as np


def tile_grid(min_x, max_x, min_y, max_y, origin_x, origin_y, width, height):
    """(start_x_grid, start_y_grid, cols, rows) for the dataset extent."""
    start_x = math.floor((min_x - origin_x) / width)
    end_x = math.ceil((max_x - origin_x) / width)
    start_y = math.floor((min_y - origin_y) / height)
    end_y = math.ceil((max_y - origin_y) / height)
    return start_x, start_y, abs(end_x - start_x), abs(end_y - start_y)


def tile_assign(
    x: np.ndarray,
    y: np.ndarray,
    origin_x: float,
    origin_y: float,
    width: float,
    height: float,
) -> tuple[np.ndarray, int, int]:
    """Per-point tile ids + (cols, rows); extent taken from the data."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    sx, sy, cols, rows = tile_grid(
        x.min(), x.max(), y.min(), y.max(), origin_x, origin_y, width, height
    )
    col = np.floor((x - origin_x) / width - sx).astype(np.int64)
    row = np.floor((y - origin_y) / height - sy).astype(np.int64)
    return row * cols + col, cols, rows


def surviving_tiles(tiles: np.ndarray, min_points: int) -> np.ndarray:
    """Tile ids kept by the population filter (count > clamp(min_points, 2))."""
    min_points = max(min_points, 2)
    ids, counts = np.unique(np.asarray(tiles), return_counts=True)
    return ids[counts > min_points]
