"""Matplotlib-free graph plotting (SVG backend).

The reference's ``plot_graph`` (/root/reference/city2graph/utils/
spatial.py:3027-3279) is a unified styling wrapper over
GeoDataFrame.plot: homogeneous or heterogeneous node/edge tables, a
black-background figure, scalar / column-name / per-type-dict styling,
a legend for hetero inputs, and an optional subplot grid.  matplotlib
is not installed in this environment, so this module implements the
same surface as a self-contained SVG renderer: the semantics (input
resolution, styling dispatch, hetero handling, legend, subplot grid)
are real; only the raster backend differs (SVG text instead of an
``Axes``).  The return value is the SVG document string (and the file
path when ``path=`` is given) rather than a matplotlib Axes.

Coordinates are taken from ``x``/``y`` columns or a ``geometry`` WKT
column (``POINT``/``LINESTRING``); edges without geometry resolve
endpoint coordinates through the node table by ``src``/``dst`` id.
Small-result driver op — inputs are materialized like the reference's
in-memory GeoDataFrames.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np
import pandas as pd

from city2graph_ray.geom import wkt as _wkt

# Default categorical palette (Okabe-Ito, public domain; readable on
# the reference's default black background).
_PALETTE = ["#56B4E9", "#E69F00", "#009E73", "#F0E442",
            "#0072B2", "#D55E00", "#CC79A7", "#999999"]
_DPI = 72.0
_MARGIN = 0.05


def _to_df(obj) -> pd.DataFrame:
    import ray.data
    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pd.DataFrame):
        return obj
    raise TypeError(f"unsupported table type: {type(obj).__name__}")


def _node_xy(df: pd.DataFrame) -> np.ndarray:
    if "x" in df.columns and "y" in df.columns:
        return np.column_stack([df["x"].to_numpy(np.float64),
                                df["y"].to_numpy(np.float64)])
    if "geometry" in df.columns:
        pts = [_wkt.parse(g)[1][:2] for g in df["geometry"]]
        return np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    raise TypeError("node table needs x/y columns or a geometry column")


def _edge_paths(df: pd.DataFrame, node_pos: Mapping[Any, tuple] | None
                ) -> list[np.ndarray]:
    if "geometry" in df.columns:
        return [_wkt.parse(g)[1].reshape(-1, 2) for g in df["geometry"]]
    if node_pos is not None and "src" in df.columns and "dst" in df.columns:
        out = []
        for u, v in zip(df["src"], df["dst"]):
            if u in node_pos and v in node_pos:
                out.append(np.array([node_pos[u], node_pos[v]], float))
        return out
    raise TypeError("edge table needs a geometry column or src/dst ids "
                    "resolvable against the node table")


def _style(value, df: pd.DataFrame, default):
    """Reference styling dispatch (spatial.py docstring): scalar applies
    uniformly; a string naming a column maps that column's values to
    palette colors / numeric sizes; a Series gives per-row values."""
    n = len(df)
    if value is None:
        return [default] * n
    if isinstance(value, pd.Series):
        return list(value.reindex(df.index, fill_value=default))
    if isinstance(value, str) and value in df.columns:
        col = df[value]
        if isinstance(default, (int, float)) and pd.api.types.is_numeric_dtype(col):
            return list(col.astype(float))
        codes, _ = pd.factorize(col)
        return [_PALETTE[c % len(_PALETTE)] for c in codes]
    return [value] * n


class _Svg:
    def __init__(self, width: float, height: float, bgcolor: str):
        self.w, self.h = width, height
        self.parts = [
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{width:g}" '
            f'height="{height:g}" viewBox="0 0 {width:g} {height:g}">',
            f'<rect width="100%" height="100%" fill="{bgcolor}"/>']

    def polyline(self, pts: np.ndarray, color: str, width: float,
                 alpha: float) -> None:
        s = " ".join(f"{x:.2f},{y:.2f}" for x, y in pts)
        self.parts.append(
            f'<polyline points="{s}" fill="none" stroke="{color}" '
            f'stroke-width="{width:g}" stroke-opacity="{alpha:g}"/>')

    def circle(self, x: float, y: float, r: float, fill: str,
               alpha: float, edgecolor: str | None) -> None:
        stroke = f' stroke="{edgecolor}"' if edgecolor else ""
        self.parts.append(
            f'<circle cx="{x:.2f}" cy="{y:.2f}" r="{r:g}" fill="{fill}" '
            f'fill-opacity="{alpha:g}"{stroke}/>')

    def text(self, x: float, y: float, s: str, color: str,
             size: float = 12.0) -> None:
        self.parts.append(
            f'<text x="{x:.2f}" y="{y:.2f}" fill="{color}" '
            f'font-size="{size:g}" font-family="sans-serif">{s}</text>')

    def to_string(self) -> str:
        return "\n".join(self.parts + ["</svg>"])


def _project(coords_list: list[np.ndarray], w: float, h: float):
    """Fit-all affine data→pixel transform (y flipped, equal margins)."""
    allc = np.concatenate([c for c in coords_list if len(c)]) \
        if any(len(c) for c in coords_list) else np.zeros((1, 2))
    lo, hi = allc.min(axis=0), allc.max(axis=0)
    span = np.where(hi - lo > 0, hi - lo, 1.0)
    scale = min(w * (1 - 2 * _MARGIN) / span[0],
                h * (1 - 2 * _MARGIN) / span[1])
    off = np.array([w, h]) / 2.0 - scale * (lo + hi) / 2.0 * [1, -1]

    def fn(c: np.ndarray) -> np.ndarray:
        out = c * scale
        out[:, 1] = -out[:, 1]
        return out + off
    return fn


def plot_graph(graph=None, nodes=None, edges=None, *, path: str | None = None,
               bgcolor: str = "#000000", figsize: tuple = (12, 12),
               subplots: bool = True, ncols: int | None = None,
               legend_position: str | None = "upper left",
               labelcolor: str = "white",
               node_color=None, node_alpha=None, node_edgecolor=None,
               markersize=None, edge_color=None, edge_linewidth=None,
               edge_alpha=None, **_kwargs) -> str:
    """Render node/edge tables to SVG (reference spatial.py:3027).

    Accepts a networkx graph, a single nodes/edges table pair, or
    hetero dicts keyed by node-type / (src, rel, dst).  Styling values
    may be scalars, column names, pandas Series, or per-type dicts.
    Returns the SVG string; when ``path`` is given the document is also
    written there and the path returned.
    """
    if graph is None and nodes is None and edges is None:
        raise ValueError("provide graph=, nodes= or edges=")
    if graph is not None and nodes is None and edges is None:
        from city2graph_ray.convert import from_networkx
        ndf, edf = from_networkx(graph)
        pos = dict(graph.nodes(data="pos"))
        if all(v is not None for v in pos.values()) and len(pos):
            ndf["x"] = [pos[i][0] for i in ndf["node_id"]]
            ndf["y"] = [pos[i][1] for i in ndf["node_id"]]
        nodes, edges = ndf, (edf if len(edf) else None)

    node_map = nodes if isinstance(nodes, dict) else (
        {} if nodes is None else {"node": nodes})
    edge_map = edges if isinstance(edges, dict) else (
        {} if edges is None else {("node", "edge", "node"): edges})
    node_map = {k: _to_df(v) for k, v in node_map.items()}
    edge_map = {k: _to_df(v) for k, v in edge_map.items()}
    hetero = len(node_map) > 1 or len(edge_map) > 1

    def per_type(style, key, default):
        return style.get(key, default) if isinstance(style, dict) else style

    # Resolve coordinates once, shared transform across subplots (the
    # reference shares data extent across the grid too).
    node_xy = {k: _node_xy(v) for k, v in node_map.items()}
    pos_lookup: dict[Any, tuple] = {}
    for k, df in node_map.items():
        ids = df["node_id"] if "node_id" in df.columns else (
            df["id"] if "id" in df.columns else df.index)
        for i, p in zip(ids, node_xy[k]):
            pos_lookup[i] = (p[0], p[1])
    edge_pts = {k: _edge_paths(v, pos_lookup) for k, v in edge_map.items()}

    w, h = figsize[0] * _DPI, figsize[1] * _DPI
    panels: list[tuple[str, list, list]] = []   # (title, node keys, edge keys)
    if hetero and subplots:
        keys = list(edge_map) or [None]
        for ek in keys:
            nk = [t for t in (ek[0], ek[2]) if t in node_map] if ek else \
                list(node_map)
            panels.append((f"{ek[0]}-{ek[1]}-{ek[2]}" if ek else "nodes",
                           nk, [ek] if ek else []))
        cols = ncols or min(3, len(panels))
    else:
        panels = [("", list(node_map), list(edge_map))]
        cols = 1
    rows = -(-len(panels) // cols)
    svg = _Svg(w * cols, h * rows, bgcolor)
    proj = _project(list(node_xy.values()) +
                    [p for ps in edge_pts.values() for p in ps], w, h)

    for idx, (title, nks, eks) in enumerate(panels):
        ox, oy = (idx % cols) * w, (idx // cols) * h
        for i, ek in enumerate(eks):
            df = edge_map[ek]
            ec = _style(per_type(edge_color, ek, None), df,
                        _PALETTE[i % len(_PALETTE)])
            lw = _style(per_type(edge_linewidth, ek, None), df, 1.0)
            ea = _style(per_type(edge_alpha, ek, None), df, 1.0)
            for pts, c, l, a in zip(edge_pts[ek], ec, lw, ea):
                svg.polyline(proj(pts.copy()) + [ox, oy], c, float(l),
                             float(a))
        for i, nk in enumerate(nks):
            df = node_map[nk]
            nc = _style(per_type(node_color, nk, None), df,
                        _PALETTE[i % len(_PALETTE)])
            ms = _style(per_type(markersize, nk, None), df, 3.0)
            na = _style(per_type(node_alpha, nk, None), df, 1.0)
            ne = per_type(node_edgecolor, nk, None)
            for p, c, m, a in zip(proj(node_xy[nk].copy()) + [ox, oy],
                                  nc, ms, na):
                svg.circle(p[0], p[1], float(m), c, float(a), ne)
        if title:
            svg.text(ox + 10, oy + 20, title, labelcolor)
    if hetero and legend_position:
        y0 = 40 if legend_position.startswith("upper") else svg.h - 20 * (
            len(node_map) + len(edge_map)) - 10
        x0 = 10 if legend_position.endswith("left") else svg.w - 160
        y = y0
        for i, nk in enumerate(node_map):
            svg.circle(x0 + 6, y - 4, 4, _PALETTE[i % len(_PALETTE)], 1.0,
                       None)
            svg.text(x0 + 16, y, str(nk), labelcolor)
            y += 20
        for i, ek in enumerate(edge_map):
            svg.polyline(np.array([[x0, y - 4], [x0 + 12, y - 4]]),
                         _PALETTE[i % len(_PALETTE)], 2.0, 1.0)
            svg.text(x0 + 16, y, "-".join(map(str, ek)), labelcolor)
            y += 20
    doc = svg.to_string()
    if path is not None:
        with open(path, "w") as f:
            f.write(doc)
        return path
    return doc
