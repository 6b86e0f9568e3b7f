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
    polygon rings and runs the buffer(0) analogue on self-intersecting
    rings (reference morphology.py:2194-2264): a bowtie ring explodes
    into one row per repaired positive face.

    The common (non-repair) path is a zero-copy Arrow mask over the
    list offsets — no per-row Python; the repair path loops only to
    probe each ring's self-crossings (inherently per-ring O(n²)) and
    assembles its output with one batched ``take``."""
    min_pts = 2 if kind == "linestring" else 3

    if not (repair and kind == "polygon"):
        import pyarrow as pa

        def fa(tb: "pa.Table") -> "pa.Table":
            if tb.num_rows == 0:
                return tb
            la = tb.column("coords").combine_chunks()
            valid = la.is_valid().to_numpy(zero_copy_only=False)
            if isinstance(la, pa.ExtensionArray):
                # Ray's variable-shaped tensor extension: storage is a
                # struct whose field 0 is the large_list<double> data.
                la = la.storage.field(0)
            if pa.types.is_list(la.type) or pa.types.is_large_list(la.type):
                offs = np.asarray(la.offsets)
                lens = offs[1:] - offs[:-1]
                vals = la.values.to_numpy(zero_copy_only=False)
                badc = np.concatenate(
                    [[0], np.cumsum(~np.isfinite(vals), dtype=np.int64)])
                ok = (badc[offs[1:]] - badc[offs[:-1]] == 0)
            else:  # fixed-size lists / unknown layout: per-row probe
                rows = la.to_pylist()
                lens = np.fromiter(
                    (0 if c is None else len(c) for c in rows),
                    np.int64, len(rows))
                ok = np.fromiter(
                    (c is not None
                     and np.isfinite(np.asarray(c, np.float64)).all()
                     for c in rows), bool, len(rows))
            ok &= (lens >= 2 * min_pts) & (lens % 2 == 0) & valid
            return tb.filter(pa.array(ok))

        return ds.map_batches(fa, batch_format="pyarrow")

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        coords = batch["coords"].to_numpy()
        take_idx: list[int] = []
        faces: list[np.ndarray] = []
        for i, raw in enumerate(coords):
            c = np.asarray(raw, np.float64)
            if not (len(c) >= 2 * min_pts and len(c) % 2 == 0
                    and np.isfinite(c).all()):
                continue
            for face in repair_ring(c):
                take_idx.append(i)
                faces.append(np.concatenate([face, face[:2]]))
        if not take_idx:
            return batch.iloc[:0]
        out = batch.iloc[take_idx].reset_index(drop=True)
        out["coords"] = pd.Series(faces, dtype=object)
        return out

    return ds.map_batches(fn, batch_format="pandas")


def _ring_self_intersections(r: np.ndarray) -> list[tuple[int, float, np.ndarray]]:
    """Proper crossings between non-adjacent edges of an open ring:
    (edge_index, t_along_edge, point) per crossing, both edges listed."""
    n = len(r)
    a = r
    b = np.roll(r, -1, axis=0)
    out: list[tuple[int, float, np.ndarray]] = []
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue  # adjacent around the wrap
            p, q = a[i], b[i]
            s, t_ = a[j], b[j]
            d1 = q - p
            d2 = t_ - s
            denom = d1[0] * d2[1] - d1[1] * d2[0]
            if abs(denom) < 1e-15:
                continue
            w = s - p
            u = (w[0] * d2[1] - w[1] * d2[0]) / denom
            v = (w[0] * d1[1] - w[1] * d1[0]) / denom
            if 1e-12 < u < 1 - 1e-12 and 1e-12 < v < 1 - 1e-12:
                pt = p + u * d1
                out.append((i, u, pt))
                out.append((j, v, pt))
    return out


def repair_ring(coords: np.ndarray) -> list[np.ndarray]:
    """buffer(0) analogue for self-intersecting rings (the reference's
    invalid-building repair, morphology.py:2194-2264): node the ring at
    its proper self-crossings, re-polygonize the noded arrangement, and
    return the positive-area faces (a bowtie square becomes its two
    triangles).  Rings without self-intersections return unchanged."""
    r = np.asarray(coords, np.float64).reshape(-1, 2)
    # drop consecutive duplicates and a closing vertex
    keep = np.ones(len(r), dtype=bool)
    keep[1:] = (np.abs(np.diff(r, axis=0)) > 1e-15).any(axis=1)
    r = r[keep]
    if len(r) > 1 and (np.abs(r[0] - r[-1]) < 1e-15).all():
        r = r[:-1]
    if len(r) < 3:
        return []
    crossings = _ring_self_intersections(r)
    if not crossings:
        return [r.reshape(-1)]
    # split each edge at its crossing points (sorted by t)
    splits: dict[int, list[tuple[float, np.ndarray]]] = {}
    for i, t, pt in crossings:
        splits.setdefault(i, []).append((t, pt))
    pieces = []
    n = len(r)
    for i in range(n):
        pts = [r[i]]
        for _, pt in sorted(splits.get(i, []), key=lambda x: x[0]):
            pts.append(pt)
        pts.append(r[(i + 1) % n])
        for a_, b_ in zip(pts[:-1], pts[1:]):
            if (np.abs(a_ - b_) > 1e-15).any():
                pieces.append(np.array([a_[0], a_[1], b_[0], b_[1]]))
    from city2graph_ray.ops.morphology import polygonize_faces
    faces = polygonize_faces(pd.DataFrame({
        "seg_id": np.arange(len(pieces)), "coords": pieces}))
    return [f for f, _ in faces]


def drop_count(before: ray.data.Dataset, after: ray.data.Dataset) -> int:
    """Side metric: rows dropped by a validation stage (the reference's
    warning counters, base.py:572-580)."""
    return before.count() - after.count()
