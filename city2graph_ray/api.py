"""Reference-compatible API façade.

One import surface with the REFERENCE's public names
(/root/reference/city2graph/__init__.py exports), so a city2graph user
can switch engines by swapping the import.  Signatures are
Ray-Data-shaped (Datasets with Arrow-native geometry columns instead of
GeoDataFrames; see README "Layout") but every operator the reference
exports has a same-named entry point here.

    from city2graph_ray import api as c2g
    edges = c2g.knn_graph(points_ds, k=5)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

# --- proximity (reference proximity.py) ---------------------------------
from city2graph_ray.ops.proximity import (  # noqa: F401
    bridge_nodes,
    contiguity_graph,
    delaunay_graph,
    euclidean_minimum_spanning_tree,
    fixed_radius_graph,
    gabriel_graph,
    group_nodes,
    knn_graph,
    relative_neighborhood_graph,
    waxman_graph,
)

# --- network metric (reference DistanceMetric network) ------------------
from city2graph_ray.ops.network import (  # noqa: F401
    network_fixed_radius_graph,
    network_knn_graph,
)

# --- morphology (reference morphology.py) -------------------------------
from city2graph_ray.ops.morphology import (  # noqa: F401
    enclosed_tessellation,
    enclosures_from_barriers,
    morphological_graph,
    morphological_graphs,
    place_to_movement_edges as place_to_movement_graph,
    place_to_place_edges as place_to_place_graph,
    zonal_tessellation,
)


def create_tessellation(geometry, primary_barriers=None, shrink: float = 0.4,
                        segment: float = 0.5, **kwargs):
    """Reference create_tessellation (utils/spatial.py:2085-2196) over
    Ray Datasets: with ``primary_barriers`` → enclosed tessellation
    (barrier polygonization → per-enclosure Voronoi, vector cells);
    without → morphological tessellation clipped to the buildings'
    bounding box (the reference's clip="bounding_box",
    utils/spatial.py:3016-3022) — one bbox enclosure; tile with halos
    for corpus-scale morphological runs."""
    import numpy as np
    import pandas as pd

    from city2graph_ray.ops.morphology import (
        enclosed_tessellation as _enc_tess,
        enclosures_from_barriers as _enc_from_barriers,
    )

    if primary_barriers is not None:
        bar = (primary_barriers.to_pandas()
               if hasattr(primary_barriers, "to_pandas") else primary_barriers)
        enc = _enc_from_barriers(bar)
        return _enc_tess(geometry, enc, shrink=shrink, segment=segment,
                         **kwargs)
    from ray.data.aggregate import Max, Min
    pts = geometry
    if "x" not in pts.schema().names:
        raise ValueError("morphological tessellation needs point buildings "
                         "(id, x, y) in this engine")
    row = pts.aggregate(Min("x"), Max("x"), Min("y"), Max("y"))
    x0, x1 = row["min(x)"], row["max(x)"]
    y0, y1 = row["min(y)"], row["max(y)"]
    pad = max(x1 - x0, y1 - y0, 1.0) * 0.05
    ring = np.array([x0 - pad, y0 - pad, x1 + pad, y0 - pad,
                     x1 + pad, y1 + pad, x0 - pad, y1 + pad])
    enc = pd.DataFrame({"enclosure_index": [0], "coords": [ring]})
    return _enc_tess(geometry, enc, shrink=shrink, segment=segment, **kwargs)

# --- topology (reference utils/topology.py, morphology.py) --------------
from city2graph_ray.ops.topology import (  # noqa: F401
    canonicalize_edges,
    clip_graph,
    dual_graph,
    largest_component_filter as remove_isolated_components,
    segments_to_graph,
    symmetrize_edges,
)

# --- data / Overture segments (reference data.py) -----------------------
from city2graph_ray.ops.segments import (  # noqa: F401
    process_overture_segments,
)

# --- spatial utils (reference utils/spatial.py) -------------------------
from city2graph_ray.ops.spatial import (  # noqa: F401
    create_isochrone,
    filter_graph_by_distance,
)

# --- transportation (reference transportation.py) -----------------------
from city2graph_ray.ops.transport import (  # noqa: F401
    get_od_pairs,
    travel_summary_graph,
)
from city2graph_ray.sources.gtfs import (  # noqa: F401
    load_gbfs_dir as load_gbfs,
    load_gtfs_dir as load_gtfs,
)

# --- metapaths (reference metapath.py) ----------------------------------
from city2graph_ray.ops.metapath import (  # noqa: F401
    add_metapaths,
    add_metapaths_by_weight,
)

# --- converters (reference utils/conversion.py, graph.py) ---------------
from city2graph_ray.convert import (  # noqa: F401
    from_networkx as nx_to_gdf,
    to_networkx as gdf_to_nx,
    to_pyg as gdf_to_pyg,
    to_rustworkx as nx_to_rx,
)


# --- mobility (reference mobility.py) -----------------------------------

def od_matrix_to_graph(od, zone_ids=None, weight_cols=("weight",),
                       threshold: float = 0.0, undirected: bool = False,
                       keep_self_loops: bool = False,
                       matrix_zone_ids=None) -> ray.data.Dataset:
    """Reference od_matrix_to_graph (mobility.py:54-191): accepts an
    edgelist Dataset/DataFrame OR a square numpy adjacency matrix (with
    ``matrix_zone_ids``); dispatches to the distributed OD pipeline."""
    from city2graph_ray.ops.mobility import adjacency_to_edgelist, od_graph
    if isinstance(od, np.ndarray):
        if matrix_zone_ids is None:
            raise ValueError("matrix input needs matrix_zone_ids")
        od = adjacency_to_edgelist(od, matrix_zone_ids)
    if isinstance(od, pd.DataFrame):
        od = ray.data.from_pandas(od)
    return od_graph(od, zone_ids=zone_ids, weight_cols=tuple(weight_cols),
                    threshold=threshold, undirected=undirected,
                    keep_self_loops=keep_self_loops)


# --- data sources (reference data.py) -----------------------------------

def load_overture_data(area=None, types=None, path: str | None = None,
                       **_kwargs):
    """Reference load_overture_data (data.py:69-237).  The reference
    shells out to the ``overturemaps`` CLI over the network; this
    sandbox has no network, so only LOCAL mode is supported: ``path``
    is a directory holding one parquet file per requested type
    (``{path}/{type}.parquet``) → dict[type, Dataset].  The production
    ingress for this engine is the interleaved-document table
    (sources/interleaved.py) per BASELINE.json.

    Remote-mode plan (when a networked deployment enables it): split
    ``area``'s bbox into a grid of fetch tiles sized so one tile ≈ one
    Ray Data block (~128 MB), build the tile list as a small Dataset,
    and run the Overture S3 GeoParquet reads as an actor-pool
    ``map_batches`` stage (one boto/pyarrow S3 filesystem per actor in
    ``__init__``; per-tile predicate pushdown via the release's
    bbox-partitioned layout, ``columns=`` pruning at the read).  Tiles
    stream straight into the same validate → clip → explode chain the
    local mode uses; per-tile lineage rows (state/lineage.py) make the
    fetch resumable so a failed crawl skips finished tiles.  No
    driver-side download, no shelling out to the ``overturemaps`` CLI
    (reference data.py:501-513) — the CLI's GeoJSON hop is the
    single-process bottleneck this engine exists to avoid."""
    if path is None:
        raise NotImplementedError(
            "network fetch is unavailable in this environment; pass "
            "path= pointing at local per-type parquet dumps, or ingest "
            "via sources.interleaved")
    import os
    out = {}
    for t in (types or []):
        f = os.path.join(path, f"{t}.parquet")
        if os.path.exists(f):
            out[t] = ray.data.read_parquet(f)
    return out


def get_boundaries(*_args, **_kwargs):
    """Reference get_boundaries (data.py:240-293) geocodes via
    Nominatim — network-bound, unavailable here."""
    raise NotImplementedError(
        "Nominatim geocoding needs network access; supply the boundary "
        "polygon ring directly to the clipping ops instead")


# --- validation (reference base.py validate_gdf / utils validate_nx) ----

def validate_gdf(nodes=None, edges=None, kind: str = "point"):
    """Reference validate_gdf (base.py:512-587 / utils/conversion.py:1993):
    returns the validated Datasets (invalid/empty geometry rows
    dropped)."""
    from city2graph_ray.ops.validate import validate_coords, validate_points
    out_nodes = out_edges = None
    if nodes is not None:
        out_nodes = (validate_points(nodes) if kind == "point"
                     else validate_coords(nodes, kind))
    if edges is not None:
        out_edges = validate_coords(edges, "linestring")             if "coords" in edges.schema().names else edges
    return out_nodes, out_edges


def validate_nx(graph):
    """Reference validate_nx: structural sanity of a networkx graph."""
    import networkx as nx
    if not isinstance(graph, (nx.Graph, nx.DiGraph, nx.MultiGraph,
                              nx.MultiDiGraph)):
        raise TypeError("expected a networkx graph")
    return graph


def is_torch_available() -> bool:
    """Reference is_torch_available (graph.py): torch is absent here."""
    try:
        import torch  # noqa: F401
        return True
    except ImportError:
        return False


def plot_graph(*args, **kwargs):
    """Unified graph plotting (reference utils/spatial.py:3027-3279).

    matplotlib is absent in this environment, so the renderer is the
    self-contained SVG backend in :mod:`city2graph_ray.plot` — same
    styling surface (scalar / column-name / Series / per-type dicts,
    hetero subplot grid, legend), SVG string instead of an Axes."""
    from city2graph_ray.plot import plot_graph as _pg
    return _pg(*args, **kwargs)


def pyg_to_gdf(*_a, **_k):  # pragma: no cover
    raise NotImplementedError("torch/PyG are not available here")


def pyg_to_nx(*_a, **_k):  # pragma: no cover
    raise NotImplementedError("torch/PyG are not available here")


def nx_to_pyg(*_a, **_k):  # pragma: no cover
    raise NotImplementedError("torch/PyG are not available here")


def rx_to_nx(*_a, **_k):  # pragma: no cover
    raise NotImplementedError("rustworkx is not available here")


def movement_to_movement_graph(segments: ray.data.Dataset) -> ray.data.Dataset:
    """Reference movement_to_movement_graph (morphology.py:1427-1537):
    dual graph of the street-segment graph keyed by segment id."""
    from city2graph_ray.ops.topology import dual_graph as _dual
    from city2graph_ray.ops.topology import segments_to_graph as _s2g
    _, edges = _s2g(segments)
    e = edges.map_batches(
        lambda b: pd.DataFrame({"edge_id": b["seg_id"], "src": b["src"],
                                "dst": b["dst"]}), batch_format="pandas")
    return _dual(e)


# deprecated reference aliases (private=place, public=movement renames)
private_to_private_graph = place_to_place_graph
private_to_public_graph = place_to_movement_graph


def public_to_public_graph(segments: ray.data.Dataset) -> ray.data.Dataset:
    """Deprecated reference alias for movement_to_movement_graph."""
    return movement_to_movement_graph(segments)


__all__ = [
    # proximity
    "knn_graph", "fixed_radius_graph", "delaunay_graph", "gabriel_graph",
    "relative_neighborhood_graph", "euclidean_minimum_spanning_tree",
    "waxman_graph", "contiguity_graph", "bridge_nodes", "group_nodes",
    "network_knn_graph", "network_fixed_radius_graph",
    # morphology
    "morphological_graph", "morphological_graphs", "create_tessellation",
    "place_to_place_graph", "place_to_movement_graph",
    "movement_to_movement_graph",
    # topology
    "segments_to_graph", "dual_graph", "canonicalize_edges",
    "symmetrize_edges", "remove_isolated_components", "clip_graph",
    # data / spatial
    "process_overture_segments", "filter_graph_by_distance",
    "create_isochrone",
    # transportation
    "load_gtfs", "load_gbfs", "travel_summary_graph", "get_od_pairs",
    # mobility / metapath
    "od_matrix_to_graph", "add_metapaths", "add_metapaths_by_weight",
    # converters / validation / misc
    "gdf_to_nx", "nx_to_gdf", "gdf_to_pyg", "nx_to_rx",
    "pyg_to_gdf", "pyg_to_nx", "nx_to_pyg", "rx_to_nx",
    "validate_gdf", "validate_nx", "is_torch_available", "plot_graph",
    "load_overture_data", "get_boundaries",
    "private_to_private_graph", "private_to_public_graph",
    "public_to_public_graph",
]
