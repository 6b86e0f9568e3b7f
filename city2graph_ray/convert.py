"""Small-result converters to other graph ecosystems.

The reference round-trips GDF↔NetworkX↔PyG↔rustworkx
(/root/reference/city2graph/utils/conversion.py:1759-2318,
graph.py:2612-3006).  The distributed core's outputs are edge-list /
node-table Datasets; these exporters materialize SMALL results (the
only sane place for an in-memory graph object — a 10^12-doc graph does
not fit networkx) and round-trip losslessly via the manifest.
PyG / rustworkx are not in this environment — import-gated stubs keep
the API surface while failing with a clear message.
"""

from __future__ import annotations

import pandas as pd
import ray.data


def _to_df(obj) -> pd.DataFrame:
    return obj.to_pandas() if isinstance(obj, ray.data.Dataset) else obj


def to_networkx(edges, nodes=None, src: str = "src", dst: str = "dst",
                directed: bool = False, edge_attrs: tuple[str, ...] = (),
                node_attrs: tuple[str, ...] = ()):
    """Edge/node tables → networkx graph (reference gdf_to_nx,
    utils/conversion.py:1759-1871). Materializes — small results only."""
    import networkx as nx
    e = _to_df(edges)
    g = nx.DiGraph() if directed else nx.Graph()
    if nodes is not None:
        n = _to_df(nodes)
        id_col = "node_id" if "node_id" in n.columns else "id"
        for r in n.itertuples(index=False):
            d = r._asdict()
            g.add_node(d[id_col], **{a: d[a] for a in node_attrs if a in d})
    for r in e.itertuples(index=False):
        d = r._asdict()
        g.add_edge(d[src], d[dst], **{a: d[a] for a in edge_attrs if a in d})
    return g


def from_networkx(g) -> tuple[pd.DataFrame, pd.DataFrame]:
    """networkx → (nodes_df, edges_df) (reference nx_to_gdf,
    utils/conversion.py:1874-1990)."""
    nodes = pd.DataFrame({"node_id": list(g.nodes)})
    rows = [{"src": u, "dst": v, **d} for u, v, d in g.edges(data=True)]
    edges = pd.DataFrame(rows) if rows else pd.DataFrame(
        {"src": pd.Series(dtype=object), "dst": pd.Series(dtype=object)})
    return nodes, edges


def to_pyg(*args, **kwargs):  # pragma: no cover - env without torch
    """Actual torch Data/HeteroData objects need torch; the tensor
    LAYOUT (shapes, dtypes, id mapping, symmetrization, round-trip) is
    fully implemented torch-free in :mod:`city2graph_ray.pyg_layout` —
    use ``to_pyg_layout`` / ``to_hetero_pyg_layout``."""
    try:
        import torch  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "torch/PyG are not available in this environment; use "
            "city2graph_ray.pyg_layout.to_pyg_layout for the torch-free "
            "tensor layout (reference graph.py:2612-2876)") from exc
    from city2graph_ray.pyg_layout import to_pyg_layout
    return to_pyg_layout(*args, **kwargs)


def to_rustworkx(*_args, **_kwargs):  # pragma: no cover
    raise NotImplementedError(
        "rustworkx is not available in this environment "
        "(utils/conversion.py:2178-2318 parity deferred)")
