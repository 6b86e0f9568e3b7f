"""Torch-free PyG tensor-layout exporter / reconstructor.

The reference converts GeoDataFrames to PyTorch-Geometric ``Data`` /
``HeteroData`` (graph.py:2612-2876 via the GraphConverter internals:
_create_node_id_mapping :1050, _create_edge_indices :1080,
_create_features :2385, _create_node_positions :2433,
_symmetrize_edges :960-1014) and back (pyg_to_gdf, graph.py:2784).
torch is absent in this environment, so this module emits the exact
tensor LAYOUT as numpy arrays — same shapes, dtypes, id-mapping rules,
feature-column selection, undirected symmetrization and drop rules —
plus the metadata needed for a lossless round trip.  ``convert.to_pyg``
stays a stub for the actual torch objects; everything testable without
torch lives here.

Layout rules mirrored from the reference:

- node ids → dense 0..n-1 positions in node-table order; duplicate ids
  resolve to their LAST occurrence (_get_last_occurrence_indexer,
  graph.py:133-163);
- ``x`` / ``y`` / ``edge_attr``: float32 matrices over the NUMERIC
  subset of the requested columns, in request order; no request →
  shape (n, 0);
- ``pos``: float32 (n, 2) from the node x/y columns (the engine's
  tables carry derived coords, the analogue of the reference's
  geometry centroids); absent columns → None;
- ``edge_index``: int64 (2, E); edges touching unknown node ids are
  dropped (reference valid_edges_mask);
- undirected same-type edges are symmetrized: reversed non-self-loop
  pairs appended, attributes duplicated; the original edge count is
  kept in metadata so reconstruction can slice the mirror back off.

Exporters materialize — small results only, like ``convert.py``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
import ray.data


def _to_df(obj) -> pd.DataFrame:
    return obj.to_pandas() if isinstance(obj, ray.data.Dataset) else obj


@dataclass
class PyGLayout:
    """Homogeneous ``Data`` layout as numpy arrays."""

    x: np.ndarray                      # (n, f) float32
    edge_index: np.ndarray             # (2, E) int64
    edge_attr: np.ndarray              # (E, g) float32
    y: np.ndarray | None               # (n, l) float32 or None
    pos: np.ndarray | None             # (n, 2) float32 or None
    metadata: dict[str, Any] = field(default_factory=dict)

    @property
    def num_nodes(self) -> int:
        return int(self.x.shape[0])

    @property
    def num_edges(self) -> int:
        return int(self.edge_index.shape[1])


@dataclass
class HeteroPyGLayout:
    """Heterogeneous ``HeteroData`` layout: per-type node arrays and
    per-(src_type, rel, dst_type) edge arrays."""

    node_types: dict[str, dict[str, Any]]
    edge_types: dict[tuple[str, str, str], dict[str, Any]]
    metadata: dict[str, Any] = field(default_factory=dict)


def _id_col(df: pd.DataFrame) -> str:
    for c in ("node_id", "id"):
        if c in df.columns:
            return c
    raise ValueError("node table needs a node_id or id column")


def _last_occurrence_indexer(ids: np.ndarray, lookup: np.ndarray) -> np.ndarray:
    """Positions of ``lookup`` values in ``ids`` (last occurrence wins,
    -1 = absent) — reference _get_last_occurrence_indexer semantics."""
    s = pd.Series(np.arange(len(ids), dtype=np.int64), index=ids)
    s = s[~s.index.duplicated(keep="last")]
    out = s.reindex(lookup).to_numpy()
    return np.where(np.isnan(out), -1, out).astype(np.int64)


def _features(df: pd.DataFrame, cols: list[str] | None) -> np.ndarray:
    """float32 matrix over the numeric subset of ``cols`` in request
    order; (n, 0) when nothing usable (reference _create_features)."""
    if not cols:
        return np.zeros((len(df), 0), dtype=np.float32)
    valid = [c for c in cols if c in df.columns
             and pd.api.types.is_numeric_dtype(df[c])]
    if not valid:
        return np.zeros((len(df), 0), dtype=np.float32)
    return df[valid].to_numpy().astype(np.float32)


def _feature_names(df: pd.DataFrame, cols: list[str] | None) -> list[str]:
    if not cols:
        return []
    return [c for c in cols if c in df.columns
            and pd.api.types.is_numeric_dtype(df[c])]


def _positions(df: pd.DataFrame) -> np.ndarray | None:
    if "x" in df.columns and "y" in df.columns:
        return np.column_stack([df["x"].to_numpy(np.float64),
                                df["y"].to_numpy(np.float64)]).astype(np.float32)
    return None


def _build_edges(edges: pd.DataFrame, src_ids: np.ndarray,
                 dst_ids: np.ndarray, feature_cols: list[str] | None,
                 *, directed: bool, same_type: bool,
                 src: str = "src", dst: str = "dst",
                 ) -> tuple[np.ndarray, np.ndarray, int, list[str]]:
    """(edge_index, edge_attr, n_original, attr_names) — unknown
    endpoints dropped; undirected same-type symmetrized."""
    fi = _last_occurrence_indexer(src_ids, edges[src].to_numpy())
    ti = _last_occurrence_indexer(dst_ids, edges[dst].to_numpy())
    ok = (fi >= 0) & (ti >= 0)
    ei = np.stack([fi[ok], ti[ok]]).astype(np.int64)
    names = _feature_names(edges, feature_cols)
    ea = _features(edges.loc[ok], feature_cols)
    n_orig = ei.shape[1]
    if not directed and same_type and n_orig:
        mask = ei[0] != ei[1]
        rev = np.stack([ei[1, mask], ei[0, mask]])
        ei = np.concatenate([ei, rev], axis=1)
        ea = (np.concatenate([ea, ea[mask]], axis=0) if ea.shape[1]
              else np.zeros((ei.shape[1], 0), dtype=np.float32))
    return ei, ea, n_orig, names


def to_pyg_layout(nodes, edges=None,
                  node_feature_cols: list[str] | None = None,
                  node_label_cols: list[str] | None = None,
                  edge_feature_cols: list[str] | None = None,
                  directed: bool = True) -> PyGLayout:
    """Node/edge tables → homogeneous PyG ``Data`` layout
    (reference gdf_to_pyg homogeneous path, graph.py:2612-2783)."""
    n = _to_df(nodes)
    idc = _id_col(n)
    ids = n[idc].to_numpy()
    x = _features(n, node_feature_cols)
    y = _features(n, node_label_cols) if node_label_cols else None
    pos = _positions(n)
    meta: dict[str, Any] = {
        "id_col": idc,
        "original_ids": ids.copy(),
        "node_feature_names": _feature_names(n, node_feature_cols),
        "node_label_names": (_feature_names(n, node_label_cols)
                             if node_label_cols else []),
        "directed": directed,
    }
    if edges is None:
        ei = np.zeros((2, 0), dtype=np.int64)
        ea = np.zeros((0, 0), dtype=np.float32)
        meta["n_original_edges"] = 0
        meta["edge_feature_names"] = []
    else:
        e = _to_df(edges)
        ei, ea, n_orig, names = _build_edges(
            e, ids, ids, edge_feature_cols,
            directed=directed, same_type=True)
        meta["n_original_edges"] = n_orig
        meta["edge_feature_names"] = names
    return PyGLayout(x=x, edge_index=ei, edge_attr=ea, y=y, pos=pos,
                     metadata=meta)


def from_pyg_layout(layout: PyGLayout) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Layout → (nodes_df, edges_df) (reference pyg_to_gdf,
    graph.py:2784-2876): original ids restored, feature/label columns
    re-expanded by name, symmetrization mirror sliced off."""
    m = layout.metadata
    ids = np.asarray(m["original_ids"])
    nodes = pd.DataFrame({m.get("id_col", "node_id"): ids})
    for j, c in enumerate(m.get("node_feature_names", [])):
        nodes[c] = layout.x[:, j]
    if layout.y is not None:
        for j, c in enumerate(m.get("node_label_names", [])):
            nodes[c] = layout.y[:, j]
    if layout.pos is not None:
        nodes["x"] = layout.pos[:, 0]
        nodes["y"] = layout.pos[:, 1]
    n_orig = int(m.get("n_original_edges", layout.edge_index.shape[1]))
    ei = layout.edge_index[:, :n_orig]
    edges = pd.DataFrame({"src": ids[ei[0]], "dst": ids[ei[1]]})
    for j, c in enumerate(m.get("edge_feature_names", [])):
        edges[c] = layout.edge_attr[:n_orig, j]
    return nodes, edges


def to_hetero_pyg_layout(nodes: dict[str, Any],
                         edges: dict[tuple[str, str, str], Any] | None = None,
                         node_feature_cols: dict[str, list[str]] | None = None,
                         node_label_cols: dict[str, list[str]] | None = None,
                         edge_feature_cols: dict[tuple[str, str, str],
                                                 list[str]] | None = None,
                         directed: bool = True) -> HeteroPyGLayout:
    """Typed node/edge table dicts → ``HeteroData`` layout (reference
    hetero path, graph.py:744-931)."""
    nf = node_feature_cols or {}
    nl = node_label_cols or {}
    ef = edge_feature_cols or {}
    ntypes: dict[str, dict[str, Any]] = {}
    ids_by_type: dict[str, np.ndarray] = {}
    for t, tbl in nodes.items():
        df = _to_df(tbl)
        idc = _id_col(df)
        ids = df[idc].to_numpy()
        ids_by_type[t] = ids
        ntypes[t] = {
            "x": _features(df, nf.get(t)),
            "y": _features(df, nl[t]) if t in nl else None,
            "pos": _positions(df),
            "id_col": idc,
            "original_ids": ids.copy(),
            "node_feature_names": _feature_names(df, nf.get(t)),
            "node_label_names": _feature_names(df, nl.get(t)) if t in nl else [],
        }
    etypes: dict[tuple[str, str, str], dict[str, Any]] = {}
    for key, tbl in (edges or {}).items():
        st, rel, dt = key
        if st not in ids_by_type or dt not in ids_by_type:
            raise KeyError(f"edge type {key} references unknown node type")
        e = _to_df(tbl)
        ei, ea, n_orig, names = _build_edges(
            e, ids_by_type[st], ids_by_type[dt], ef.get(key),
            directed=directed, same_type=st == dt)
        etypes[key] = {"edge_index": ei, "edge_attr": ea,
                       "n_original_edges": n_orig,
                       "edge_feature_names": names}
    return HeteroPyGLayout(node_types=ntypes, edge_types=etypes,
                           metadata={"directed": directed})


def from_hetero_pyg_layout(layout: HeteroPyGLayout,
                           ) -> tuple[dict[str, pd.DataFrame],
                                      dict[tuple[str, str, str], pd.DataFrame]]:
    """Hetero layout → typed (nodes, edges) table dicts."""
    nodes: dict[str, pd.DataFrame] = {}
    for t, d in layout.node_types.items():
        df = pd.DataFrame({d["id_col"]: np.asarray(d["original_ids"])})
        for j, c in enumerate(d["node_feature_names"]):
            df[c] = d["x"][:, j]
        if d["y"] is not None:
            for j, c in enumerate(d["node_label_names"]):
                df[c] = d["y"][:, j]
        if d["pos"] is not None:
            df["x"] = d["pos"][:, 0]
            df["y"] = d["pos"][:, 1]
        nodes[t] = df
    edges: dict[tuple[str, str, str], pd.DataFrame] = {}
    for key, d in layout.edge_types.items():
        st, _, dt = key
        sids = np.asarray(layout.node_types[st]["original_ids"])
        dids = np.asarray(layout.node_types[dt]["original_ids"])
        n_orig = int(d["n_original_edges"])
        ei = d["edge_index"][:, :n_orig]
        df = pd.DataFrame({"src": sids[ei[0]], "dst": dids[ei[1]]})
        for j, c in enumerate(d["edge_feature_names"]):
            df[c] = d["edge_attr"][:n_orig, j]
        edges[key] = df
    return nodes, edges
