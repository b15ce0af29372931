"""Raster cell-center georeferencing transforms.

The single most load-bearing formulas for tile/row parity
(reference src/raster/mod.rs:620-642):

    x = west + res_x/2 + col * res_x
    y = north - res_y/2 - row * res_y
    col = floor((x - west) / res_x)
    row = floor((north - y) / res_y)

Provided as numpy functions here and mirrored as Spark Column expressions
in operators (same arithmetic, so float behaviour is identical).
"""

from __future__ import annotations

import numpy as np


def x_from_col(col, west: float, res_x: float):
    return west + res_x / 2.0 + np.asarray(col, dtype=np.float64) * res_x


def y_from_row(row, north: float, res_y: float):
    return north - res_y / 2.0 - np.asarray(row, dtype=np.float64) * res_y


def col_from_x(x, west: float, res_x: float):
    return np.floor((np.asarray(x, dtype=np.float64) - west) / res_x).astype(np.int64)


def row_from_y(y, north: float, res_y: float):
    return np.floor((north - np.asarray(y, dtype=np.float64)) / res_y).astype(np.int64)
