"""Hull / buffer geometry for isochrones, from scratch.

Reference create_isochrone methods (/root/reference/city2graph/utils/
spatial.py:162-2082): convex (ops/spatial.convex_hull), alpha
(alpha_shape_edges), **buffer** (union of node discs) and
**concave-knn** (Moreira & Santos 2007 k-nearest-neighbour hull, the
reference's retry-escalating default, :1067-1070 caps retries at 50).

Without a polygon-union library, the buffer union is computed on a
raster: mark cells whose center lies within ``radius`` of any point,
then extract the boundary with a marching-squares edge walk — this is
the raster side of the engine's raster↔vector repertoire.
"""

from __future__ import annotations

import numpy as np


# ------------------------------------------------------------- raster buffer

def raster_buffer_rings(points: np.ndarray, radius: float,
                        resolution: float | None = None) -> list[np.ndarray]:
    """Union-of-discs boundary as closed rings (flat coords).

    Grid cells whose center is within ``radius`` of any input point are
    inside; boundary segments between inside/outside cells are chained
    into rings (marching squares on the binary field).  ``resolution``
    defaults to radius/4."""
    pts = np.asarray(points, np.float64).reshape(-1, 2)
    if len(pts) == 0:
        return []
    res = resolution or radius / 4.0
    x0 = pts[:, 0].min() - radius - res
    y0 = pts[:, 1].min() - radius - res
    x1 = pts[:, 0].max() + radius + res
    y1 = pts[:, 1].max() + radius + res
    nx = int(np.ceil((x1 - x0) / res)) + 1
    ny = int(np.ceil((y1 - y0) / res)) + 1
    cx = x0 + (np.arange(nx) + 0.5) * res
    cy = y0 + (np.arange(ny) + 0.5) * res
    inside = np.zeros((ny, nx), dtype=bool)
    r2 = radius * radius
    # mark per point: only the local window of cells (bounded work)
    w = int(np.ceil(radius / res)) + 1
    for px, py in pts:
        i0 = max(int((px - x0) / res) - w, 0)
        i1 = min(int((px - x0) / res) + w + 1, nx)
        j0 = max(int((py - y0) / res) - w, 0)
        j1 = min(int((py - y0) / res) + w + 1, ny)
        dx = cx[i0:i1] - px
        dy = cy[j0:j1] - py
        inside[j0:j1, i0:i1] |= (dx[None, :] ** 2 + dy[:, None] ** 2) <= r2

    # boundary edges between inside cell and outside neighbor, as
    # directed segments keeping the inside on the LEFT → rings chain CCW
    segs: dict[tuple[float, float], tuple[float, float]] = {}

    def corner(i, j):
        return (x0 + i * res, y0 + j * res)

    ins = np.zeros((ny + 2, nx + 2), dtype=bool)
    ins[1:-1, 1:-1] = inside
    for j in range(ny):
        for i in range(nx):
            if not inside[j, i]:
                continue
            jj, ii = j + 1, i + 1
            if not ins[jj - 1, ii]:   # south edge, west→east
                segs[corner(i, j)] = corner(i + 1, j)
            if not ins[jj, ii + 1]:   # east edge, south→north
                segs[corner(i + 1, j)] = corner(i + 1, j + 1)
            if not ins[jj + 1, ii]:   # north edge, east→west
                segs[corner(i + 1, j + 1)] = corner(i, j + 1)
            if not ins[jj, ii - 1]:   # west edge, north→south
                segs[corner(i, j + 1)] = corner(i, j)

    rings = []
    while segs:
        start, nxt = next(iter(segs.items()))
        ring = [start]
        cur = start
        while True:
            nx_pt = segs.pop(cur, None)
            if nx_pt is None or nx_pt == start:
                break
            ring.append(nx_pt)
            cur = nx_pt
        if len(ring) >= 3:
            rings.append(np.asarray(ring, np.float64).reshape(-1))
    return rings


# --------------------------------------------------------- concave kNN hull

def _ccw(a, b, c):
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])


def _segments_intersect(p1, p2, p3, p4) -> bool:
    d1 = _ccw(p3, p4, p1)
    d2 = _ccw(p3, p4, p2)
    d3 = _ccw(p1, p2, p3)
    d4 = _ccw(p1, p2, p4)
    return ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0))


def concave_hull_knn(points: np.ndarray, k: int = 3,
                     max_attempts: int = 50) -> np.ndarray:
    """Moreira & Santos (2007) k-nearest-neighbours concave hull with
    the reference's k-escalation retry cap (utils/spatial.py:50,
    1067-1070).  Returns a closed ring (flat coords); falls back to the
    convex hull when escalation exhausts."""
    from city2graph_ray.ops.spatial import convex_hull

    pts = np.unique(np.asarray(points, np.float64).reshape(-1, 2), axis=0)
    n = len(pts)
    if n < 3:
        return pts.reshape(-1)
    k = max(3, min(k, n - 1))

    for attempt in range(max_attempts):
        kk = min(k + attempt, n - 1)
        hull = _concave_attempt(pts, kk)
        if hull is not None:
            return hull
    return convex_hull(pts)


def _concave_attempt(pts: np.ndarray, k: int) -> np.ndarray | None:
    n = len(pts)
    start = int(np.lexsort((pts[:, 0], pts[:, 1]))[0])  # lowest y
    hull = [start]
    removed = np.zeros(n, dtype=bool)
    removed[start] = True
    cur = start
    prev_angle = np.pi
    for step in range(2, 4 * n):
        if step == 5:
            removed[start] = False  # the start becomes reachable again
        d2 = ((pts - pts[cur]) ** 2).sum(1)
        d2[removed] = np.inf
        d2[cur] = np.inf
        cand = np.argsort(d2)[:k]
        cand = cand[np.isfinite(d2[cand])]
        if len(cand) == 0:
            return None
        heading = np.arctan2(pts[cand, 1] - pts[cur, 1],
                             pts[cand, 0] - pts[cur, 0])
        # largest LEFT-hand turn first (empirically validated variant of
        # the paper's clockwise sort for a lowest-y CCW start)
        turn = (heading - prev_angle) % (2 * np.pi)
        order = cand[np.argsort(-turn)]
        chosen = None
        for c in order:
            ok = True
            for h in range(len(hull) - 2):
                if _segments_intersect(pts[cur], pts[c],
                                       pts[hull[h]], pts[hull[h + 1]]):
                    ok = False
                    break
            if ok:
                chosen = int(c)
                break
        if chosen is None:
            return None
        prev_angle = np.arctan2(pts[cur, 1] - pts[chosen, 1],
                                pts[cur, 0] - pts[chosen, 0])
        hull.append(chosen)
        if chosen == start:
            break
        removed[chosen] = True
        cur = chosen
    else:
        return None
    if hull[-1] != start:
        return None
    ring = pts[hull[:-1]].reshape(-1)
    from city2graph_ray.geom.kernels import points_in_polygon
    if not points_in_polygon(pts[:, 0], pts[:, 1], ring).all():
        return None
    return ring
