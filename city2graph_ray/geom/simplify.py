"""Polyline simplification (Ramer–Douglas–Peucker, public algorithm).

The reference keeps full-resolution segment geometries everywhere; a
100-TB street corpus wants a resolution ladder — simplified geometry
for coarse tiles, full geometry only at the finest zoom (the same
reason map stacks pre-simplify per zoom level).  Deterministic:
farthest point wins, first index on ties, strictly-greater-than-tol
splits — so outputs are layout-independent and reproducible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def simplify_polyline(coords: np.ndarray, tol: float) -> np.ndarray:
    """RDP-simplify one flat [x0,y0,x1,y1,...] polyline.  Iterative
    stack (no recursion-depth limit); the per-span perpendicular
    distances are one vectorized expression.  Endpoints always kept;
    zero-length chords fall back to point distance."""
    pts = np.asarray(coords, np.float64).reshape(-1, 2)
    n = len(pts)
    if n <= 2:
        return pts.ravel()
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        seg = pts[a + 1:b]
        d = pts[b] - pts[a]
        L2 = d @ d
        if L2 == 0.0:
            dist = np.hypot(seg[:, 0] - pts[a, 0], seg[:, 1] - pts[a, 1])
        else:
            # |cross((p - a), d)| / |d|
            rel = seg - pts[a]
            dist = np.abs(rel[:, 0] * d[1] - rel[:, 1] * d[0]) / np.sqrt(L2)
        i = int(np.argmax(dist))
        if dist[i] > tol:
            m = a + 1 + i
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return pts[keep].ravel()


def simplify_segments(segments: ray.data.Dataset, tol: float,
                      coords_col: str = "coords") -> ray.data.Dataset:
    """Per-row RDP over a segment table's flat coords column, appending
    ``n_pts_in`` / ``n_pts_out``.  The outer loop is per geometry (the
    split recursion is inherently sequential per line); every distance
    evaluation inside is vectorized."""

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        simp = [simplify_polyline(np.asarray(c, np.float64), tol)
                for c in b[coords_col]]
        out["n_pts_in"] = [len(c) // 2 for c in b[coords_col]]
        out[coords_col] = simp
        out["n_pts_out"] = [len(c) // 2 for c in simp]
        return out

    return segments.map_batches(fn, batch_format="pandas")
