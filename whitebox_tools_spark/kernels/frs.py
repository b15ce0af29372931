"""Fixed-radius-search oracle (hash-grid radius & kNN semantics).

Parity contract: src/structures/fixed_radius_search.rs
- bucket id = floor(coord / (radius/2))  (inv_r = 1/(r*0.5), :66,85-88)
- radius search probes the 5x5 neighbour buckets (:72-79,100-133) and
  keeps squared distance <= radius^2 (inclusive, :119)
- kNN search (:134-218) starts from the 3x3 block, then expands square
  SHELLS (chebyshev ring 2, 3, ...) until >= k candidates have been seen;
  the answer is the k smallest squared distances among all candidates of
  the shells examined so far (this is *approximate* by design — a closer
  point in a not-yet-examined shell is missed; we replicate that).
- Euclidean metric returns sqrt(distance); Squared returns squared.

These run inside the engine's tests as the oracle for the Spark cell-join
implementations; they are vectorized per-query over candidate arrays.
"""

from __future__ import annotations

import numpy as np


def _cells(coord: np.ndarray, radius: float) -> np.ndarray:
    inv_r = 1.0 / (radius * 0.5)
    return np.floor(np.asarray(coord, dtype=np.float64) * inv_r).astype(np.int64)


def frs_radius_search(
    px: np.ndarray,
    py: np.ndarray,
    pval: np.ndarray,
    qx: float,
    qy: float,
    radius: float,
    squared: bool = False,
) -> list[tuple]:
    """All (value, dist) with dist <= radius, 5x5-bucket-probe semantics.

    Because the 5x5 probe provably covers every point within ``radius`` of
    the query, the result set equals a plain distance filter; we still
    apply the bucket test to mirror the reference exactly.
    """
    ci, cj = _cells(px, radius), _cells(py, radius)
    qi = int(np.floor(qx / (radius * 0.5)))
    qj = int(np.floor(qy / (radius * 0.5)))
    in_probe = (np.abs(ci - qi) <= 2) & (np.abs(cj - qj) <= 2)
    d2 = (qx - np.asarray(px, dtype=np.float64)) ** 2 + (
        qy - np.asarray(py, dtype=np.float64)
    ) ** 2
    keep = in_probe & (d2 <= radius * radius)
    d = d2[keep] if squared else np.sqrt(d2[keep])
    vals = np.asarray(pval)[keep]
    order = np.argsort(d, kind="stable")
    return [(vals[k], float(d[k])) for k in order]


def frs_knn_search(
    px: np.ndarray,
    py: np.ndarray,
    pval: np.ndarray,
    qx: float,
    qy: float,
    k: int,
    radius: float,
    squared: bool = False,
) -> list[tuple]:
    """Approximate kNN with the reference's shell-expansion stopping rule."""
    n = len(px)
    k = min(k, n)
    if k == 0:
        return frs_radius_search(px, py, pval, qx, qy, radius, squared)
    ci, cj = _cells(px, radius), _cells(py, radius)
    qi = int(np.floor(qx / (radius * 0.5)))
    qj = int(np.floor(qy / (radius * 0.5)))
    cheb = np.maximum(np.abs(ci - qi), np.abs(cj - qj))
    # shell index: the 3x3 start block is shells <= 1; each while-loop pass
    # adds chebyshev ring s for s = 2, 3, ...
    shell = np.maximum(cheb, 1)

    # smallest S such that #candidates with shell <= S is >= k
    order_shells = np.sort(shell)
    s_stop = int(order_shells[k - 1])
    cand = shell <= s_stop
    d2 = (qx - np.asarray(px, dtype=np.float64)) ** 2 + (
        qy - np.asarray(py, dtype=np.float64)
    ) ** 2
    d2c = d2[cand]
    vals = np.asarray(pval)[cand]
    idx = np.argsort(d2c, kind="stable")[:k]
    d = d2c[idx] if squared else np.sqrt(d2c[idx])
    return [(vals[i], float(dd)) for i, dd in zip(idx, d)]
