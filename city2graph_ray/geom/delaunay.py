"""Delaunay triangulation from scratch (scipy is not available here).

Implementation of the sweep-circle / incremental algorithm popularized
by the public-domain *delaunator* library (Mapbox, ISC license; the
algorithm itself is published in Sinclair, "S-hull: a fast radial sweep
hull routine for Delaunay triangulation", arXiv:1604.01428).  Pure
numpy + Python port written for this engine; O(n log n) in practice.

Used by ``delaunay_graph`` / ``gabriel_graph`` /
``relative_neighborhood_graph`` / ``euclidean_minimum_spanning_tree``
(reference semantics at /root/reference/city2graph/proximity.py:890-1300),
both as the per-tile kernel of the distributed builders and as the exact
single-group oracle.
"""

from __future__ import annotations

import numpy as np

EPS = 2.0 ** -52


def _circumradius2(ax, ay, bx, by, cx, cy):
    dx, dy = bx - ax, by - ay
    ex, ey = cx - ax, cy - ay
    bl = dx * dx + dy * dy
    cl = ex * ex + ey * ey
    d = 0.5 / (dx * ey - dy * ex) if (dx * ey - dy * ex) != 0 else np.inf
    x = (ey * bl - dy * cl) * d
    y = (dx * cl - ex * bl) * d
    return x * x + y * y


def _circumcenter(ax, ay, bx, by, cx, cy):
    dx, dy = bx - ax, by - ay
    ex, ey = cx - ax, cy - ay
    bl = dx * dx + dy * dy
    cl = ex * ex + ey * ey
    denom = dx * ey - dy * ex
    d = 0.5 / denom if denom != 0 else np.inf
    return ax + (ey * bl - dy * cl) * d, ay + (dx * cl - ex * bl) * d


def _orient(px, py, qx, qy, rx, ry):
    return (qy - py) * (rx - qx) - (qx - px) * (ry - qy)


def _in_circle(ax, ay, bx, by, cx, cy, px, py):
    dx, dy = ax - px, ay - py
    ex, ey = bx - px, by - py
    fx, fy = cx - px, cy - py
    ap = dx * dx + dy * dy
    bp = ex * ex + ey * ey
    cp = fx * fx + fy * fy
    return (dx * (ey * cp - bp * fy)
            - dy * (ex * cp - bp * fx)
            + ap * (ex * fy - ey * fx)) < 0


class Delaunator:
    """Triangulate points[:, 2]. Exposes .triangles (3t int array) and
    .halfedges like the reference delaunator API.

    Coincident points: exactly one of an exactly-duplicated (x, y)
    pair participates in the triangulation; the other is silently
    skipped (the mapbox/delaunator contract).  Which one survives is
    deterministic for a given input ORDER (insertion order is the
    stable argsort by distance-to-circumcenter, index tie-break), so
    callers that need run-to-run stability must pass points in a
    deterministic order (the proximity ops sort by id) — relevant at
    scale, where exact coordinate collisions are expected (~11 pairs
    at sf0.1 in the 10^5-slot synth space; r5 tessellation lesson)."""

    def __init__(self, coords: np.ndarray):
        pts = np.asarray(coords, np.float64).reshape(-1, 2)
        n = len(pts)
        self.coords = pts
        self.triangles = np.empty(0, np.int64)
        self.halfedges = np.empty(0, np.int64)
        self.hull = np.empty(0, np.int64)
        if n < 3:
            return

        x, y = pts[:, 0], pts[:, 1]
        max_tri = max(2 * n - 5, 0)
        self._triangles = np.zeros(max_tri * 3, np.int64)
        self._halfedges = np.full(max_tri * 3, -1, np.int64)
        self.hash_size = int(np.ceil(np.sqrt(n)))
        self.hull_prev = np.zeros(n, np.int64)
        self.hull_next = np.zeros(n, np.int64)
        self.hull_tri = np.zeros(n, np.int64)
        self.hull_hash = np.full(self.hash_size, -1, np.int64)
        self.edge_stack = []

        # seed: point closest to the centroid
        cx, cy = x.mean(), y.mean()
        d0 = (x - cx) ** 2 + (y - cy) ** 2
        i0 = int(np.argmin(d0))
        d1 = (x - x[i0]) ** 2 + (y - y[i0]) ** 2
        d1[i0] = np.inf
        i1 = int(np.argmin(d1))
        # third point minimizing circumradius with i0, i1
        r2 = np.array([_circumradius2(x[i0], y[i0], x[i1], y[i1], x[j], y[j])
                       if j not in (i0, i1) else np.inf for j in range(n)])
        i2 = int(np.argmin(r2))
        if not np.isfinite(r2[i2]):
            # collinear input: no triangulation
            self.triangles = np.empty(0, np.int64)
            self.halfedges = np.empty(0, np.int64)
            order = np.lexsort((y, x))
            self.hull = order
            return

        if _orient(x[i0], y[i0], x[i1], y[i1], x[i2], y[i2]) < 0:
            i1, i2 = i2, i1

        self._cx, self._cy = _circumcenter(x[i0], y[i0], x[i1], y[i1], x[i2], y[i2])
        dists = (x - self._cx) ** 2 + (y - self._cy) ** 2
        ids = np.argsort(dists, kind="stable")

        self.hull_start = i0
        hull_size = 3
        self.hull_next[i0] = self.hull_prev[i2] = i1
        self.hull_next[i1] = self.hull_prev[i0] = i2
        self.hull_next[i2] = self.hull_prev[i1] = i0
        self.hull_tri[i0] = 0
        self.hull_tri[i1] = 1
        self.hull_tri[i2] = 2
        self.hull_hash[:] = -1
        self.hull_hash[self._hash_key(x[i0], y[i0])] = i0
        self.hull_hash[self._hash_key(x[i1], y[i1])] = i1
        self.hull_hash[self._hash_key(x[i2], y[i2])] = i2

        self.n_tri = 0
        self._add_triangle(i0, i1, i2, -1, -1, -1)

        xp = yp = np.nan
        for k in range(len(ids)):
            i = int(ids[k])
            if i in (i0, i1, i2):
                continue
            xi, yi = x[i], y[i]
            if xi == xp and yi == yp:  # duplicate point — skip
                continue
            xp, yp = xi, yi

            start = 0
            key = self._hash_key(xi, yi)
            for j in range(self.hash_size):
                start = int(self.hull_hash[(key + j) % self.hash_size])
                if start != -1 and start != int(self.hull_next[start]):
                    break
            start = int(self.hull_prev[start])
            e = start
            while True:
                q = int(self.hull_next[e])
                if _orient(xi, yi, x[e], y[e], x[q], y[q]) < 0:
                    break
                e = q
                if e == start:
                    e = -1
                    break
            if e == -1:
                continue  # near-duplicate

            t = self._add_triangle(e, i, int(self.hull_next[e]), -1, -1, int(self.hull_tri[e]))
            self.hull_tri[i] = self._legalize(t + 2)
            self.hull_tri[e] = t
            hull_size += 1

            nxt = int(self.hull_next[e])
            q = int(self.hull_next[nxt])
            while _orient(xi, yi, x[nxt], y[nxt], x[q], y[q]) < 0:
                t = self._add_triangle(nxt, i, q, int(self.hull_tri[i]), -1, int(self.hull_tri[nxt]))
                self.hull_tri[i] = self._legalize(t + 2)
                self.hull_next[nxt] = nxt  # removed
                hull_size -= 1
                nxt = q
                q = int(self.hull_next[nxt])

            if e == start:
                q = int(self.hull_prev[e])
                while _orient(xi, yi, x[q], y[q], x[e], y[e]) < 0:
                    t = self._add_triangle(q, i, e, -1, int(self.hull_tri[e]), int(self.hull_tri[q]))
                    self._legalize(t + 2)
                    self.hull_tri[q] = t
                    self.hull_next[e] = e  # removed
                    hull_size -= 1
                    e = q
                    q = int(self.hull_prev[e])

            self.hull_start = e
            self.hull_prev[i] = e
            self.hull_next[e] = i
            self.hull_prev[nxt] = i
            self.hull_next[i] = nxt
            self.hull_hash[self._hash_key(xi, yi)] = i
            self.hull_hash[self._hash_key(x[e], y[e])] = e

        hull = []
        e = self.hull_start
        for _ in range(hull_size):
            hull.append(e)
            e = int(self.hull_next[e])
        self.hull = np.array(hull, np.int64)
        self.triangles = self._triangles[: self.n_tri * 3].copy()
        self.halfedges = self._halfedges[: self.n_tri * 3].copy()

    def _hash_key(self, px, py):
        dx = px - self._cx
        dy = py - self._cy
        # pseudo-angle in [0,1)
        p = dx / (abs(dx) + abs(dy)) if (dx or dy) else 0.0
        a = (3.0 - p) / 4.0 if dy > 0 else (1.0 + p) / 4.0
        return int(np.floor(a * self.hash_size)) % self.hash_size

    def _add_triangle(self, i0, i1, i2, a, b, c):
        t = self.n_tri * 3
        if t + 3 > len(self._triangles):
            self._triangles = np.concatenate([self._triangles, np.zeros(max(len(self._triangles), 9), np.int64)])
            self._halfedges = np.concatenate([self._halfedges, np.full(max(len(self._halfedges), 9), -1, np.int64)])
        self._triangles[t] = i0
        self._triangles[t + 1] = i1
        self._triangles[t + 2] = i2
        self._link(t, a)
        self._link(t + 1, b)
        self._link(t + 2, c)
        self.n_tri += 1
        return t

    def _link(self, a, b):
        self._halfedges[a] = b
        if b != -1:
            self._halfedges[b] = a

    def _legalize(self, a):
        x = self.coords[:, 0]
        y = self.coords[:, 1]
        stack = self.edge_stack
        stack.clear()
        ar = 0
        while True:
            b = int(self._halfedges[a])
            a0 = a - a % 3
            ar = a0 + (a + 2) % 3
            if b == -1:
                if not stack:
                    break
                a = stack.pop()
                continue
            b0 = b - b % 3
            al = a0 + (a + 1) % 3
            bl = b0 + (b + 2) % 3
            p0 = int(self._triangles[ar])
            pr = int(self._triangles[a])
            pl = int(self._triangles[al])
            p1 = int(self._triangles[bl])
            illegal = _in_circle(x[p0], y[p0], x[pr], y[pr], x[pl], y[pl], x[p1], y[p1])
            if illegal:
                self._triangles[a] = p1
                self._triangles[b] = p0
                hbl = int(self._halfedges[bl])
                if hbl == -1:
                    e = self.hull_start
                    while True:
                        if int(self.hull_tri[e]) == bl:
                            self.hull_tri[e] = a
                            break
                        e = int(self.hull_prev[e])
                        if e == self.hull_start:
                            break
                self._link(a, hbl)
                self._link(b, int(self._halfedges[ar]))
                self._link(ar, bl)
                br = b0 + (b + 1) % 3
                stack.append(br)
            else:
                if not stack:
                    break
                a = stack.pop()
        return ar


def delaunay_edges(coords: np.ndarray) -> np.ndarray:
    """Unique undirected Delaunay edges (m, 2) int64 with u < v.

    Collinear / degenerate inputs (no triangulation) fall back to the
    chain of consecutive points in lexicographic order, matching scipy's
    behavior of connecting collinear points along the line.
    """
    pts = np.asarray(coords, np.float64).reshape(-1, 2)
    n = len(pts)
    if n < 2:
        return np.empty((0, 2), np.int64)
    if n == 2:
        return np.array([[0, 1]], np.int64)
    d = Delaunator(pts)
    if len(d.triangles) == 0:
        order = np.lexsort((pts[:, 1], pts[:, 0]))
        e = np.stack([order[:-1], order[1:]], axis=1)
        e.sort(axis=1)
        return np.unique(e, axis=0)
    t = d.triangles
    e = np.concatenate([
        np.stack([t[0::3], t[1::3]], axis=1),
        np.stack([t[1::3], t[2::3]], axis=1),
        np.stack([t[2::3], t[0::3]], axis=1),
    ])
    e.sort(axis=1)
    return np.unique(e, axis=0)
