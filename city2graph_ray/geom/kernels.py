"""Vectorized geometry kernels over the flat-coords representation.

All functions take either per-row flat coord arrays (``[x0,y0,x1,y1,…]``)
or ragged batches expressed as Arrow-list layout ``(values, offsets)``:
``values`` is the concatenated flat coords of all rows, ``offsets[i] ..
offsets[i+1]`` delimits row *i* (offsets count *doubles*, i.e. 2 per
vertex).  This is exactly ``pyarrow.ListArray`` internals → zero-copy.

Semantics mirror the reference's shapely usage (see SURVEY.md §2.9):
length, centroid (of linestrings: length-weighted; of polygons:
area-weighted), bbox, point-in-polygon (even-odd ray cast with boundary
tolerance), point↔segment distance, substring (shapely.ops.substring of
a linestring between two arc-length positions), interpolate.
"""

from __future__ import annotations

import numpy as np


def as_ragged(values: np.ndarray, offsets: np.ndarray):
    """Iterate (i, flat_coords) over a ragged batch. Python loop — use only
    for per-row algorithms (substring, PIP refine) on already-bucketed data."""
    for i in range(len(offsets) - 1):
        yield i, values[offsets[i]: offsets[i + 1]]


# ---------------------------------------------------------------- lengths

def linestring_lengths(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Length per ragged linestring, fully vectorized (no per-row loop)."""
    v = np.asarray(values, np.float64)
    xs, ys = v[0::2], v[1::2]
    dx = np.diff(xs)
    dy = np.diff(ys)
    seg = np.hypot(dx, dy)  # includes bogus inter-row segments
    npts = (np.diff(offsets) // 2).astype(np.int64)
    starts_pt = (offsets[:-1] // 2).astype(np.int64)
    # zero out the segment that crosses a row boundary
    bogus = starts_pt[1:] - 1
    if len(bogus):
        seg[bogus] = 0.0
    csum = np.concatenate(([0.0], np.cumsum(seg)))
    ends_pt = starts_pt + npts
    return csum[np.maximum(ends_pt - 1, starts_pt)] - csum[starts_pt]


def linestring_length(coords: np.ndarray) -> float:
    c = np.asarray(coords, np.float64).reshape(-1, 2)
    if len(c) < 2:
        return 0.0
    return float(np.hypot(np.diff(c[:, 0]), np.diff(c[:, 1])).sum())


# ---------------------------------------------------------------- centroids

def linestring_centroids(values: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Length-weighted centroid per linestring (matches shapely.centroid)."""
    v = np.asarray(values, np.float64)
    xs, ys = v[0::2], v[1::2]
    mx = (xs[:-1] + xs[1:]) * 0.5
    my = (ys[:-1] + ys[1:]) * 0.5
    seg = np.hypot(np.diff(xs), np.diff(ys))
    npts = (np.diff(offsets) // 2).astype(np.int64)
    starts_pt = (offsets[:-1] // 2).astype(np.int64)
    bogus = starts_pt[1:] - 1
    if len(bogus):
        seg[bogus] = 0.0
    wx = np.concatenate(([0.0], np.cumsum(mx * seg)))
    wy = np.concatenate(([0.0], np.cumsum(my * seg)))
    wl = np.concatenate(([0.0], np.cumsum(seg)))
    ends = starts_pt + npts
    hi = np.maximum(ends - 1, starts_pt)
    sx = wx[hi] - wx[starts_pt]
    sy = wy[hi] - wy[starts_pt]
    sl = wl[hi] - wl[starts_pt]
    # degenerate (single-point / zero-length): fall back to mean of vertices
    cx = np.where(sl > 0, sx / np.where(sl > 0, sl, 1.0), xs[starts_pt])
    cy = np.where(sl > 0, sy / np.where(sl > 0, sl, 1.0), ys[starts_pt])
    return cx, cy


def polygon_area_centroid(coords: np.ndarray) -> tuple[float, float, float]:
    """(signed_area, cx, cy) of one exterior ring via the shoelace formula."""
    c = np.asarray(coords, np.float64).reshape(-1, 2)
    if len(c) and (c[0] == c[-1]).all():
        c = c[:-1]
    if len(c) < 3:
        return 0.0, float(c[:, 0].mean()) if len(c) else np.nan, float(c[:, 1].mean()) if len(c) else np.nan
    x, y = c[:, 0], c[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    cross = x * yn - xn * y
    a2 = cross.sum()
    if a2 == 0.0:
        return 0.0, float(x.mean()), float(y.mean())
    cx = ((x + xn) * cross).sum() / (3.0 * a2)
    cy = ((y + yn) * cross).sum() / (3.0 * a2)
    return a2 * 0.5, float(cx), float(cy)


def polygon_area_centroids(values: np.ndarray, offsets: np.ndarray
                           ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(signed_area, cx, cy) per ragged exterior ring — the vectorized
    batch form of :func:`polygon_area_centroid` (same shoelace edge
    order, closed-or-open rings both handled: the duplicated closing
    vertex contributes a zero-cross edge).  Degenerate rings (shoelace
    area 0 or <3 points) get NaN centroids — callers route those few
    rows through the scalar fallback."""
    v = np.asarray(values, np.float64)
    xs, ys = v[0::2], v[1::2]
    starts_pt = (offsets[:-1] // 2).astype(np.int64)
    npts = (np.diff(offsets) // 2).astype(np.int64)
    ends = starts_pt + npts
    hi = np.maximum(ends - 1, starts_pt)
    cross = xs[:-1] * ys[1:] - xs[1:] * ys[:-1]
    wx = (xs[:-1] + xs[1:]) * cross
    wy = (ys[:-1] + ys[1:]) * cross
    bogus = starts_pt[1:] - 1  # inter-row edges
    if len(bogus):
        cross = cross.copy(); cross[bogus] = 0.0
        wx = wx.copy(); wx[bogus] = 0.0
        wy = wy.copy(); wy[bogus] = 0.0
    ccs = np.concatenate(([0.0], np.cumsum(cross)))
    cwx = np.concatenate(([0.0], np.cumsum(wx)))
    cwy = np.concatenate(([0.0], np.cumsum(wy)))
    a2 = ccs[hi] - ccs[starts_pt]
    sx = cwx[hi] - cwx[starts_pt]
    sy = cwy[hi] - cwy[starts_pt]
    # closing edge last→first (zero when the ring repeats its first pt)
    lx, ly = xs[hi], ys[hi]
    fx, fy = xs[starts_pt], ys[starts_pt]
    cc = lx * fy - fx * ly
    a2 = a2 + cc
    sx = sx + (lx + fx) * cc
    sy = sy + (ly + fy) * cc
    with np.errstate(divide="ignore", invalid="ignore"):
        cx = sx / (3.0 * a2)
        cy = sy / (3.0 * a2)
    bad = (a2 == 0.0) | (npts < 3)
    cx = np.where(bad, np.nan, cx)
    cy = np.where(bad, np.nan, cy)
    return a2 * 0.5, cx, cy


def polygon_areas(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """|shoelace| area per ragged exterior ring (vectorized)."""
    v = np.asarray(values, np.float64)
    xs, ys = v[0::2], v[1::2]
    cross = xs[:-1] * ys[1:] - xs[1:] * ys[:-1]
    starts_pt = (offsets[:-1] // 2).astype(np.int64)
    npts = (np.diff(offsets) // 2).astype(np.int64)
    bogus = starts_pt[1:] - 1
    if len(bogus):
        cross_b = cross.copy()
        cross_b[bogus] = 0.0
    else:
        cross_b = cross
    csum = np.concatenate(([0.0], np.cumsum(cross_b)))
    ends = starts_pt + npts
    hi = np.maximum(ends - 1, starts_pt)
    partial = csum[hi] - csum[starts_pt]
    # add the closing segment (last→first) when ring isn't explicitly closed
    lx, ly = xs[hi], ys[hi]
    fx, fy = xs[starts_pt], ys[starts_pt]
    closing = lx * fy - fx * ly
    return np.abs(partial + closing) * 0.5


# ---------------------------------------------------------------- bbox

def linestring_bboxes(values: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, ...]:
    """(minx, miny, maxx, maxy) per ragged geometry, vectorized via reduceat."""
    v = np.asarray(values, np.float64)
    xs, ys = v[0::2], v[1::2]
    starts_pt = (offsets[:-1] // 2).astype(np.int64)
    minx = np.minimum.reduceat(xs, starts_pt)
    maxx = np.maximum.reduceat(xs, starts_pt)
    miny = np.minimum.reduceat(ys, starts_pt)
    maxy = np.maximum.reduceat(ys, starts_pt)
    return minx, miny, maxx, maxy


# ---------------------------------------------------------------- predicates

def points_in_polygon(px: np.ndarray, py: np.ndarray, ring: np.ndarray,
                      boundary: bool = True) -> np.ndarray:
    """Even-odd ray-cast PIP of many points vs one exterior ring.

    ``boundary=True`` counts points exactly on an edge as inside
    (matching shapely's ``covered_by``, the reference's default predicate
    for group_nodes, proximity.py:2409-2427).
    """
    c = np.asarray(ring, np.float64).reshape(-1, 2)
    if len(c) and (c[0] == c[-1]).all():
        c = c[:-1]
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    n = len(c)
    inside = np.zeros(len(px), dtype=bool)
    on_edge = np.zeros(len(px), dtype=bool)
    x1, y1 = c[:, 0], c[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    for i in range(n):
        ax, ay, bx, by = x1[i], y1[i], x2[i], y2[i]
        # crossing test (half-open to avoid double-count at vertices)
        cond = (ay > py) != (by > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = ax + (py - ay) * (bx - ax) / (by - ay)
        inside ^= cond & (px < xint)
        if boundary:
            # on-segment: cross ≈ 0 and within bbox
            cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
            within = (np.minimum(ax, bx) - 1e-12 <= px) & (px <= np.maximum(ax, bx) + 1e-12) & \
                     (np.minimum(ay, by) - 1e-12 <= py) & (py <= np.maximum(ay, by) + 1e-12)
            on_edge |= (np.abs(cross) <= 1e-9) & within
    return inside | on_edge if boundary else inside


def point_segment_dist2(px, py, ax, ay, bx, by):
    """Squared distance point→segment, broadcasting numpy arrays."""
    dx, dy = bx - ax, by - ay
    ll = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - ax) * dx + (py - ay) * dy) / np.where(ll > 0, ll, 1.0)
    t = np.clip(np.where(ll > 0, t, 0.0), 0.0, 1.0)
    cx, cy = ax + t * dx, ay + t * dy
    return (px - cx) ** 2 + (py - cy) ** 2


# ---------------------------------------------------------------- substring

def substring(coords: np.ndarray, start: float, end: float) -> np.ndarray:
    """shapely.ops.substring semantics on one linestring: the sub-line
    between arc-length positions start..end (clamped).  Used by the
    split-at-connectors and barrier-interval operators
    (reference data.py:664,963)."""
    c = np.asarray(coords, np.float64).reshape(-1, 2)
    seg = np.hypot(np.diff(c[:, 0]), np.diff(c[:, 1]))
    cum = np.concatenate(([0.0], np.cumsum(seg)))
    total = cum[-1]
    start = min(max(start, 0.0), total)
    end = min(max(end, 0.0), total)
    if end < start:
        start, end = end, start

    def interp(d):
        j = int(np.searchsorted(cum, d, side="right") - 1)
        j = min(j, len(seg) - 1)
        t = 0.0 if seg[j] == 0 else (d - cum[j]) / seg[j]
        return c[j] + t * (c[j + 1] - c[j])

    first = interp(start)
    last = interp(end)
    mid_mask = (cum > start) & (cum < end)
    mids = c[mid_mask]
    pts = [first, *mids, last]
    out = [pts[0]]
    for p in pts[1:]:
        if not np.allclose(p, out[-1]):
            out.append(p)
    if len(out) == 1:
        out.append(out[0])
    return np.asarray(out, np.float64).reshape(-1)


def interpolate(coords: np.ndarray, d: float) -> tuple[float, float]:
    """Point at arc length d along a linestring (shapely .interpolate)."""
    c = np.asarray(coords, np.float64).reshape(-1, 2)
    seg = np.hypot(np.diff(c[:, 0]), np.diff(c[:, 1]))
    cum = np.concatenate(([0.0], np.cumsum(seg)))
    d = min(max(d, 0.0), cum[-1])
    j = int(np.searchsorted(cum, d, side="right") - 1)
    j = min(j, max(len(seg) - 1, 0))
    if len(seg) == 0 or seg[j] == 0:
        return float(c[j, 0]), float(c[j, 1])
    t = (d - cum[j]) / seg[j]
    p = c[j] + t * (c[j + 1] - c[j])
    return float(p[0]), float(p[1])
