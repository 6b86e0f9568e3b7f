"""Network-distance proximity builders (the reference's third metric).

Reference: DistanceMetric network paths
(/root/reference/city2graph/proximity.py:137-197 metric dispatch,
:252-293 cached network support, :313-362 per-snapped-node Dijkstra
rows, :861-884 argsort top-k, :1413 radius cutoff).

Engine shape: the network (node/edge lists) is the SMALL side —
broadcast once via ``ray.put``; each actor builds the adjacency once in
``__init__`` and runs per-batch Dijkstra.  Points snap to their nearest
network node by euclidean distance (reference snap, utils/spatial.py:
404-427); co-snapped points are network-distance 0 apart.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from city2graph_ray import shuffle


def snap_to_nodes(points: ray.data.Dataset, nodes: pd.DataFrame,
                  ) -> ray.data.Dataset:
    """Add ``node_id`` = nearest network node (euclidean; broadcast
    node table, chunked argmin per batch)."""
    ref = ray.put((nodes["node_id"].to_numpy(), nodes["x"].to_numpy(),
                   nodes["y"].to_numpy()))

    class Snap:
        def __init__(self):
            self.nid, self.nx, self.ny = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            px = batch["x"].to_numpy()
            py = batch["y"].to_numpy()
            out = batch.copy()
            best = np.empty(len(batch), np.int64)
            for lo in range(0, len(batch), 2048):
                hi = min(lo + 2048, len(batch))
                d = ((px[lo:hi, None] - self.nx[None, :]) ** 2
                     + (py[lo:hi, None] - self.ny[None, :]) ** 2)
                best[lo:hi] = self.nid[np.argmin(d, axis=1)]
            out["node_id"] = best
            return out

    return points.map_batches(Snap, batch_format="pandas", concurrency=(1, 8))


def _network_distances(snapped: ray.data.Dataset, edges: pd.DataFrame,
                       weight_col: str, cutoff: float | None,
                       node_to_points_ref) -> ray.data.Dataset:
    """Per source point: (src point id, dst point id, network distance)
    candidate rows via per-batch Dijkstra from each distinct snapped
    node (actor pool; adjacency built once per actor)."""
    eref = ray.put(edges[["src", "dst", weight_col]])

    class Dijkstra:
        def __init__(self):
            import networkx as nx
            e = ray.get(eref)
            self.g = nx.Graph()
            for s, d, w in e.itertuples(index=False):
                self.g.add_edge(int(s), int(d), weight=float(w))
            self.node_pts = ray.get(node_to_points_ref)  # node -> [(pid)...]

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            import networkx as nx
            outs = []
            # one Dijkstra per DISTINCT snapped node in the batch
            for node, sub in batch.groupby("node_id", sort=False):
                if node not in self.g:
                    continue
                lengths = nx.single_source_dijkstra_path_length(
                    self.g, int(node), cutoff=cutoff, weight="weight")
                dst_pids, dst_d = [], []
                for tgt, cost in lengths.items():
                    for pid in self.node_pts.get(int(tgt), ()):
                        dst_pids.append(pid)
                        dst_d.append(cost)
                if not dst_pids:
                    continue
                dst_pids = np.asarray(dst_pids, np.int64)
                dst_d = np.asarray(dst_d, np.float64)
                for pid in sub["id"]:
                    keep = dst_pids != pid  # exclude self
                    outs.append(pd.DataFrame({
                        "src": np.int64(pid), "dst": dst_pids[keep],
                        "distance": dst_d[keep]}))
            return (pd.concat(outs) if outs else
                    pd.DataFrame({"src": pd.Series(dtype=np.int64),
                                  "dst": pd.Series(dtype=np.int64),
                                  "distance": pd.Series(dtype=np.float64)}))

    return snapped.map_batches(Dijkstra, batch_format="pandas",
                               batch_size=1024, concurrency=(1, 8))


def _node_points_map(snapped_df: pd.DataFrame):
    m: dict[int, list[int]] = {}
    for pid, node in zip(snapped_df["id"], snapped_df["node_id"]):
        m.setdefault(int(node), []).append(int(pid))
    return ray.put(m)


def network_knn_graph(points: ray.data.Dataset, nodes: pd.DataFrame,
                      edges: pd.DataFrame, k: int,
                      weight_col: str = "length",
                      max_rounds: int = 4) -> ray.data.Dataset:
    """k nearest points by network distance (reference
    proximity.py:861-873): snap → bounded Dijkstra → top-k per source,
    ties by (distance, dst id).

    An UNBOUNDED Dijkstra per source explores the whole graph; instead
    the cutoff starts near the expected k-neighborhood radius and
    escalates ×4 for sources that found fewer than k points within it
    (a source with ≥ k hits inside the cutoff is exact — its true k
    nearest all lie within).  The final round is unbounded for the
    stragglers."""
    snapped = snap_to_nodes(points, nodes).materialize()
    sdf = snapped.to_pandas()
    npref = _node_points_map(sdf)
    mean_w = float(edges[weight_col].mean()) if len(edges) else 1.0
    cutoff = mean_w * 2.0 * np.sqrt(max(k, 1))
    remaining = snapped
    parts = []
    resolved_all: set = set()
    for rnd in range(max_rounds):
        final = rnd == max_rounds - 1
        cand = _network_distances(remaining, edges, weight_col,
                                  None if final else cutoff, npref)
        cand = cand.materialize()
        cdf = cand.to_pandas()
        if cdf.empty or "src" not in cdf.columns:
            if final:
                break
            cutoff *= 4.0
            continue
        counts = cdf.groupby("src").size()
        ok_src = (set(counts[counts >= k].index) if not final
                  else set(counts.index))
        done = cdf[cdf["src"].isin(ok_src)]
        if len(done):
            parts.append(ray.data.from_pandas(done.reset_index(drop=True)))
        resolved_all |= ok_src  # cumulative — never re-run solved sources
        rem_df = sdf[~sdf["id"].isin(resolved_all)]
        if rem_df.empty or final:
            break
        remaining = ray.data.from_pandas(rem_df.reset_index(drop=True))
        cutoff *= 4.0
    if not parts:
        return ray.data.from_pandas(
            pd.DataFrame({"src": pd.Series(dtype=np.int64),
                          "dst": pd.Series(dtype=np.int64),
                          "distance": pd.Series(dtype=np.float64)}))
    out = parts[0]
    for p_ in parts[1:]:
        out = out.union(p_)
    return shuffle.topk_in_group(out, ["src"], k,
                                 ["distance", "dst"], [True, True])


def network_fixed_radius_graph(points: ray.data.Dataset, nodes: pd.DataFrame,
                               edges: pd.DataFrame, radius: float,
                               weight_col: str = "length") -> ray.data.Dataset:
    """All point pairs within network distance ``radius`` (reference
    Dijkstra cutoff=radius, proximity.py:1413); undirected canonical
    src < dst."""
    snapped = snap_to_nodes(points, nodes).materialize()
    npref = _node_points_map(snapped.to_pandas())
    cand = _network_distances(snapped, edges, weight_col, radius, npref)

    def canon(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["distance"] <= radius]
        m = b["src"] < b["dst"]
        return b[m]

    return shuffle.distinct(cand.map_batches(canon, batch_format="pandas"),
                            ["src", "dst"])
