"""Bounded Voronoi cells from the Delaunay dual — pure numpy.

The reference's tessellation delegates to ``momepy.enclosed_tessellation``
(shapely.voronoi_polygons under the hood); this module provides the
equivalent geometric primitives without GEOS: Voronoi cell polygons via
the Delaunator halfedge dual (with a distant ghost frame so every real
seed is interior and its cell closed), Sutherland–Hodgman clipping to
the enclosure, ring densification (momepy's ``segment``) and convex
inward offset (momepy's ``shrink``).

Reference semantics: /root/reference/city2graph/utils/spatial.py:2085-3024.
"""

from __future__ import annotations

import numpy as np

from city2graph_ray.geom.delaunay import Delaunator

_EPS = 1e-12


def _next_he(e: int) -> int:
    return e - 2 if e % 3 == 2 else e + 1


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area of an (n,2) ring (CCW positive). The ring
    need not repeat its first vertex."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def is_convex(ring: np.ndarray) -> bool:
    """True when every turn of the (open) ring has the same sign."""
    a = ring
    b = np.roll(ring, -1, axis=0)
    c = np.roll(ring, -2, axis=0)
    cross = ((b[:, 0] - a[:, 0]) * (c[:, 1] - b[:, 1])
             - (b[:, 1] - a[:, 1]) * (c[:, 0] - b[:, 0]))
    return bool((cross >= -_EPS).all() or (cross <= _EPS).all())


def ensure_ccw(ring: np.ndarray) -> np.ndarray:
    return ring if ring_area(ring) >= 0 else ring[::-1]


def densify_ring(ring: np.ndarray, segment: float) -> np.ndarray:
    """Points along the ring boundary at most ``segment`` apart
    (momepy's ``segment`` discretization; vectorized interpolation)."""
    a = ring
    b = np.roll(ring, -1, axis=0)
    seg_len = np.hypot(b[:, 0] - a[:, 0], b[:, 1] - a[:, 1])
    n = np.maximum(np.ceil(seg_len / max(segment, _EPS)).astype(np.int64), 1)
    total = int(n.sum())
    edge_idx = np.repeat(np.arange(len(ring)), n)
    starts = np.concatenate(([0], np.cumsum(n)[:-1]))
    t = (np.arange(total) - starts[edge_idx]) / n[edge_idx]
    return a[edge_idx] + t[:, None] * (b[edge_idx] - a[edge_idx])


def inward_offset_convex(ring: np.ndarray, d: float) -> np.ndarray | None:
    """Offset a CONVEX CCW ring inward by ``d`` (momepy ``shrink``):
    intersect the half-planes of each edge moved inward.  Returns None
    when the polygon collapses (offset exceeds inradius)."""
    src = ensure_ccw(np.asarray(ring, np.float64))
    out = src
    a = src
    b = np.roll(src, -1, axis=0)
    ex, ey = b[:, 0] - a[:, 0], b[:, 1] - a[:, 1]
    ln = np.hypot(ex, ey)
    valid = ln > _EPS
    # inward normal for a CCW ring is the left normal (-ey, ex)/|e|
    for i in np.nonzero(valid)[0]:
        nx, ny = -ey[i] / ln[i], ex[i] / ln[i]
        ca = a[i] + d * np.array([nx, ny])
        cb = b[i] + d * np.array([nx, ny])
        out = clip_halfplane(out, ca, cb)
        if len(out) < 3:
            return None
    if abs(ring_area(out)) < _EPS:
        return None
    return out


def clip_halfplane(subject: np.ndarray, a: np.ndarray,
                   b: np.ndarray) -> np.ndarray:
    """Keep the part of ``subject`` left of directed line a→b
    (one Sutherland–Hodgman step, vectorized crossing construction)."""
    if len(subject) == 0:
        return subject
    x, y = subject[:, 0], subject[:, 1]
    side = (b[0] - a[0]) * (y - a[1]) - (b[1] - a[1]) * (x - a[0])
    keep = side >= -_EPS
    nxt = np.roll(np.arange(len(subject)), -1)
    cross = keep != keep[nxt]
    if keep.all():
        return subject
    if not keep.any():
        return subject[:0]
    # build output: for each vertex emit it if kept, then the edge
    # crossing point if the edge changes side
    denom = side - side[nxt]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(np.abs(denom) > _EPS, side / np.where(denom == 0, 1, denom), 0.0)
    inter = subject + t[:, None] * (subject[nxt] - subject)
    pieces = []
    for i in range(len(subject)):
        if keep[i]:
            pieces.append(subject[i])
        if cross[i]:
            pieces.append(inter[i])
    return np.asarray(pieces)


def clip_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip an arbitrary ring by a CONVEX CCW ring."""
    out = np.asarray(subject, np.float64)
    c = ensure_ccw(np.asarray(clip, np.float64))
    m = len(c)
    for i in range(m):
        out = clip_halfplane(out, c[i], c[(i + 1) % m])
        if len(out) < 3:
            return out[:0]
    return out


def voronoi_cells(pts: np.ndarray, frame_factor: float = 64.0,
                  ) -> list[np.ndarray | None]:
    """Closed Voronoi cell polygon (CCW, (k,2)) per input point.

    A 4-point ghost frame at ``frame_factor``× the extent makes every
    real seed interior, so its halfedge walk closes; ghost-adjacent
    Voronoi vertices land far outside any enclosure and are removed by
    the enclosure clip.  Returns None per point when the triangulation
    is degenerate (collinear seeds)."""
    pts = np.asarray(pts, np.float64).reshape(-1, 2)
    n = len(pts)
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    c = (lo + hi) / 2
    ext = max(hi[0] - lo[0], hi[1] - lo[1], 1.0)
    r = frame_factor * ext
    ghosts = np.array([[c[0] - r, c[1] - r], [c[0] + r, c[1] - r],
                       [c[0] + r, c[1] + r], [c[0] - r, c[1] + r]])
    allp = np.vstack([pts, ghosts])
    d = Delaunator(allp)
    tri = d.triangles.reshape(-1, 3)
    if len(tri) == 0:
        return [None] * n
    he = d.halfedges
    t3 = d.triangles
    # vectorized circumcenters
    ax, ay = allp[tri[:, 0], 0], allp[tri[:, 0], 1]
    dx, dy = allp[tri[:, 1], 0] - ax, allp[tri[:, 1], 1] - ay
    ex, ey = allp[tri[:, 2], 0] - ax, allp[tri[:, 2], 1] - ay
    bl = dx * dx + dy * dy
    cl = ex * ex + ey * ey
    denom = dx * ey - dy * ex
    with np.errstate(divide="ignore", invalid="ignore"):
        half = np.where(denom != 0, 0.5 / denom, np.inf)
    ccx = ax + (ey * bl - dy * cl) * half
    ccy = ay + (dx * cl - ex * bl) * half
    # one incoming halfedge per point (prefer hull-adjacent so interior
    # walks still close; ghosts make all real points interior anyway)
    inedge = np.full(len(allp), -1, np.int64)
    for e in range(len(t3)):
        p = t3[_next_he(e)]
        if inedge[p] == -1 or he[e] == -1:
            inedge[p] = e
    cells: list[np.ndarray | None] = []
    for p in range(n):
        e0 = int(inedge[p])
        if e0 == -1:
            cells.append(None)
            continue
        verts = []
        e = e0
        ok = True
        for _ in range(256):
            verts.append(e // 3)
            e = he[_next_he(e)]
            if e == int(e0):
                break
            if e == -1:
                ok = False
                break
        else:
            ok = False
        if not ok or len(verts) < 3:
            cells.append(None)
            continue
        ring = np.column_stack([ccx[verts], ccy[verts]])
        if not np.isfinite(ring).all():
            cells.append(None)
            continue
        cells.append(ensure_ccw(ring))
    return cells
