"""Geometry validation stage — the reference's ``validate_gdf``
(/root/reference/city2graph/base.py:512-587): whitelist expected
geometry kinds, drop invalid / empty / NaN geometries, surface drop
counts as side metrics (the reference warns; the engine counts)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def validate_points(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Drop rows with non-finite x/y; adds nothing, removes garbage."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        m = np.isfinite(batch["x"].to_numpy()) & np.isfinite(batch["y"].to_numpy())
        return batch[m]

    return ds.map_batches(fn, batch_format="pandas")


def validate_coords(ds: ray.data.Dataset, kind: str = "linestring",
                    repair: bool = False) -> ray.data.Dataset:
    """Validate a ``coords`` table: drop empty geometries, geometries
    with NaN vertices, and under-length rings/lines (LineString needs ≥2
    points, Polygon ring ≥3 — reference geometry-type whitelists,
    morphology.py:1871-1888).  ``repair=True`` additionally closes open
    polygon rings (the engine analogue of buffer(0) repair for the
    fixture corpus's simple footprints, morphology.py:2194-2264)."""
    min_pts = 2 if kind == "linestring" else 3

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        keep, fixed = [], []
        for c in batch["coords"]:
            c = np.asarray(c, np.float64)
            ok = (len(c) >= 2 * min_pts and len(c) % 2 == 0
                  and np.isfinite(c).all())
            if ok and repair and kind == "polygon":
                r = c.reshape(-1, 2)
                if not (r[0] == r[-1]).all():
                    c = np.concatenate([c, c[:2]])
            keep.append(ok)
            fixed.append(c)
        out = batch.copy()
        out["coords"] = fixed
        return out[np.asarray(keep)]

    return ds.map_batches(fn, batch_format="pandas")


def drop_count(before: ray.data.Dataset, after: ray.data.Dataset) -> int:
    """Side metric: rows dropped by a validation stage (the reference's
    warning counters, base.py:572-580)."""
    return before.count() - after.count()
