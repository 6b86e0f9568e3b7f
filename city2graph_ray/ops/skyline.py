"""2-D Pareto frontier (skyline) over a Dataset.

A row is on the skyline iff no other row is at-least-as-good on both
dimensions and strictly better on one (the classic NOT-EXISTS
dominance definition, Börzsönyi et al., "The Skyline Operator",
ICDE 2001 — public literature).  Exact duplicates of a frontier point
all survive (neither dominates the other).

The reference engine (yu-ta-sato/city2graph) has no skyline operator;
this belongs to the large-scale analytics extension layer alongside
the window/rank ops.

Exactness rests on an order-free characterisation instead of a global
ordered scan: with both dimensions minimised, a row ``(x, y)`` is on
the frontier **iff**

    y == min{y' : x' <= x}   AND   x == min{x' : y' <= y}

(if some ``j`` dominated ``i``, the first equality forces
``y_j == y_i`` and the second ``x_j == x_i`` — no strict edge left;
conversely a violated equality exhibits a dominator).  Each equality
is a prefix-min under a lexsort, so the per-block kernel is two
``np.lexsort`` + ``np.minimum.accumulate`` passes — no Python rows.

Distribution: dominance inside a block implies global dominance, so
the global frontier is a subset of the union of per-block frontiers.
One streaming local-skyline pass prunes the corpus (for
independently-distributed dimensions a block's frontier is O(log n)
of it), then a single-block final pass resolves cross-block dominance
exactly.  Worst case (perfectly anti-correlated dimensions) the
frontier IS the data and the final pass degenerates — but then the
*answer* is O(n) and no engine avoids materialising it; documented
rather than hidden.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

__all__ = ["skyline2d"]


def _key(col: pd.Series, direction: str) -> np.ndarray:
    """Comparison-key array: minimised as-is; maximised by negation
    (datetimes go through their int64 view so both directions work)."""
    a = col.to_numpy()
    if a.dtype.kind in ("M", "m"):
        a = a.view("i8")
    if direction == "max":
        a = -a.astype(np.float64) if a.dtype.kind == "f" else -a
    return a


def _local_skyline(df: pd.DataFrame, x: str, y: str,
                   x_dir: str, y_dir: str) -> pd.DataFrame:
    if df.empty:
        return df
    xa = _key(df[x], x_dir)
    ya = _key(df[y], y_dir)
    n = len(df)
    o1 = np.lexsort((ya, xa))
    k1 = np.empty(n, bool)
    k1[o1] = ya[o1] <= np.minimum.accumulate(ya[o1])
    o2 = np.lexsort((xa, ya))
    k2 = np.empty(n, bool)
    k2[o2] = xa[o2] <= np.minimum.accumulate(xa[o2])
    return df[k1 & k2]


def skyline2d(ds: ray.data.Dataset, x: str, y: str,
              x_dir: str = "min", y_dir: str = "min") -> ray.data.Dataset:
    """Rows of ``ds`` on the 2-D Pareto frontier of ``(x, y)``.

    ``x_dir`` / ``y_dir`` pick the preferred direction per dimension
    (``"min"`` or ``"max"``).  All input columns pass through.  See
    the module docstring for exactness and the scale contract.
    """
    for d in (x_dir, y_dir):
        if d not in ("min", "max"):
            raise ValueError(f"direction must be 'min' or 'max', got {d!r}")

    def kernel(b: pd.DataFrame) -> pd.DataFrame:
        return _local_skyline(b, x, y, x_dir, y_dir)

    partial = ds.map_batches(kernel, batch_format="pandas")
    return partial.repartition(1).map_batches(kernel,
                                              batch_format="pandas")
