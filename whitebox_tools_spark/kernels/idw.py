"""IDW weighting kernel.

Parity contract (src/tools/gis_analysis/idw_interpolation.rs:572-599):
given neighbour (z, dist) pairs with Euclidean (non-squared) distances:

- if any dist == 0: the cell takes that z directly (first zero in
  iteration order; ties on different z are order-dependent upstream, so
  fixtures use distinct values)
- else value = sum(z / d^w) / sum(1 / d^w)
- if fewer than min_points neighbours even after the kNN fallback the
  cell stays NoData (None here).
"""

from __future__ import annotations

import numpy as np


def idw_value(z: np.ndarray, dist: np.ndarray, weight: float, min_points: int):
    z = np.asarray(z, dtype=np.float64)
    dist = np.asarray(dist, dtype=np.float64)
    if len(z) < min_points or len(z) == 0:
        return None
    zero = dist == 0.0
    if zero.any():
        return float(z[np.argmax(zero)])
    w = 1.0 / dist**weight
    return float(np.sum(z * w) / np.sum(w))
