"""CRS handling: explicit reproject stage + auto-harmonization.

The reference silently reprojects the second layer to the first's CRS
with a warning (/root/reference/city2graph/base.py:827-889
``ensure_crs_consistency`` path).  The engine mirrors that as an
explicit vectorized ``map_batches`` stage: the supported closed-form
pairs are EPSG:4326 ↔ EPSG:3857 (spherical web-mercator, public
formulas) and any user-supplied affine; pyproj is not in this
container, so arbitrary datum transforms raise with a clear message.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import ray.data

logger = logging.getLogger(__name__)

_R = 6378137.0  # WGS84 / web-mercator sphere radius


def _lonlat_to_mercator(x: np.ndarray, y: np.ndarray):
    mx = np.radians(x) * _R
    my = _R * np.log(np.tan(np.pi / 4.0 + np.radians(y) / 2.0))
    return mx, my


def _mercator_to_lonlat(x: np.ndarray, y: np.ndarray):
    lon = np.degrees(x / _R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / _R)) - np.pi / 2.0)
    return lon, lat


_TRANSFORMS = {
    ("EPSG:4326", "EPSG:3857"): _lonlat_to_mercator,
    ("EPSG:3857", "EPSG:4326"): _mercator_to_lonlat,
}


def reproject(ds: ray.data.Dataset, src_crs: str, dst_crs: str,
              coords_col: str | None = None) -> ray.data.Dataset:
    """Reproject point columns (x, y) — or a ragged ``coords`` column —
    from ``src_crs`` to ``dst_crs``.  No-op when equal; closed-form for
    4326↔3857; anything else raises (no pyproj in this environment)."""
    if src_crs == dst_crs:
        return ds
    key = (src_crs.upper(), dst_crs.upper())
    if key not in _TRANSFORMS:
        raise ValueError(
            f"unsupported reprojection {src_crs} → {dst_crs}: only "
            "EPSG:4326↔EPSG:3857 have closed forms in this environment")
    xform = _TRANSFORMS[key]

    if coords_col is None:
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch.copy()
            out["x"], out["y"] = xform(batch["x"].to_numpy(),
                                       batch["y"].to_numpy())
            return out
    else:
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch.copy()
            fixed = []
            for c in batch[coords_col]:
                c = np.asarray(c, np.float64).copy()
                c[0::2], c[1::2] = xform(c[0::2], c[1::2])
                fixed.append(c)
            out[coords_col] = fixed
            return out

    return ds.map_batches(fn, batch_format="pandas")


def harmonize_crs(primary_manifest, ds: ray.data.Dataset, manifest,
                  coords_col: str | None = None) -> ray.data.Dataset:
    """Auto-reproject ``ds`` to the primary layer's CRS with a warning
    (the reference's silent-reproject-and-warn, base.py:827-889).
    Returns ``ds`` unchanged when CRSs already match or are unset;
    mutates ``manifest.crs`` to the primary CRS on success."""
    if primary_manifest.crs is None or manifest.crs is None \
            or primary_manifest.crs == manifest.crs:
        return ds
    logger.warning("CRS mismatch: reprojecting layer from %s to %s",
                   manifest.crs, primary_manifest.crs)
    out = reproject(ds, manifest.crs, primary_manifest.crs, coords_col)
    manifest.crs = primary_manifest.crs
    return out


def affine_transform(ds: ray.data.Dataset, a: float, b: float, c: float,
                     d: float, e: float, f: float) -> ray.data.Dataset:
    """x' = a*x + b*y + c; y' = d*x + e*y + f (six-parameter affine) on
    (x, y) point columns — the escape hatch for projected↔projected
    shifts that don't need a datum transform."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        out["x"] = a * x + b * y + c
        out["y"] = d * x + e * y + f
        return out

    return ds.map_batches(fn, batch_format="pandas")
