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


def _node_distances(src_nodes: ray.data.Dataset, edges: pd.DataFrame,
                    weight_col: str, cutoff: float | None,
                    ) -> ray.data.Dataset:
    """Per distinct source NODE: (src_node, dst_node, distance) rows via
    per-batch Dijkstra (actor pool; adjacency built once per actor).
    The network edge list is the broadcast small side — point tables
    never are."""
    eref = ray.put(edges[["src", "dst", weight_col]])

    class Dijkstra:
        def __init__(self):
            import networkx as nx
            e = ray.get(eref)
            self.g = nx.Graph()
            for s, d, w in e.itertuples(index=False):
                self.g.add_edge(int(s), int(d), weight=float(w))

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            import networkx as nx
            outs = []
            for node in batch["node_id"]:
                if node not in self.g:
                    continue
                lengths = nx.single_source_dijkstra_path_length(
                    self.g, int(node), cutoff=cutoff, weight="weight")
                tgt = np.fromiter(lengths.keys(), np.int64, len(lengths))
                cost = np.fromiter(lengths.values(), np.float64, len(lengths))
                outs.append(pd.DataFrame({
                    "src_node": np.int64(node), "dst_node": tgt,
                    "distance": cost}))
            return (pd.concat(outs) if outs else
                    pd.DataFrame({"src_node": pd.Series(dtype=np.int64),
                                  "dst_node": pd.Series(dtype=np.int64),
                                  "distance": pd.Series(dtype=np.float64)}))

    return src_nodes.map_batches(Dijkstra, batch_format="pandas",
                                 batch_size=256, concurrency=(1, 8))


def _expand_node_pairs(cand_nodes: ray.data.Dataset,
                       snapped: ray.data.Dataset) -> ray.data.Dataset:
    """(src_node, dst_node, distance) → (src, dst, distance) point pairs
    via two bucketed hash joins against the snapped point table —
    co-snapped points expand combinatorially in the join, never in a
    broadcast node→points map."""
    import pyarrow as pa
    from city2graph_ray.joins import bucketed_join

    def rn(node_col, id_col):
        def fn(t: pa.Table) -> pa.Table:
            return t.select(["node_id", "id"]).rename_columns(
                [node_col, id_col])
        return fn

    e = bucketed_join(cand_nodes,
                      snapped.map_batches(rn("src_node", "src"),
                                          batch_format="pyarrow"),
                      on="src_node")
    e = bucketed_join(e,
                      snapped.map_batches(rn("dst_node", "dst"),
                                          batch_format="pyarrow"),
                      on="dst_node")
    return e.map_batches(
        lambda b: b.loc[b["src"] != b["dst"], ["src", "dst", "distance"]],
        batch_format="pandas")


def network_knn_graph(points: ray.data.Dataset, nodes: pd.DataFrame,
                      edges: pd.DataFrame, k: int,
                      weight_col: str = "length",
                      max_rounds: int = 4) -> ray.data.Dataset:
    """k nearest points by network distance (reference
    proximity.py:861-873): snap → count-bounded Dijkstra → top-k per
    source, ties by (distance, dst id).

    r4 redesign: the former escalating-cutoff rounds re-explored every
    unresolved source at each ×4 cutoff and the final UNBOUNDED round
    materialized a full |component| row set per straggler — measured
    60 GB of object-store spill at sf0.1.  Now each distinct snapped
    node runs ONE early-stopping Dijkstra that pops in distance order
    and halts as soon as ≥ k+1 points have been seen AND the next heap
    distance exceeds the (k+1)-th point distance (so exact ties at the
    boundary are kept).  The settled prefix provably contains every
    top-k candidate; output is ≤ points-at-(k+1)-nodes rows per source
    — no escalation rounds, no reach aggregation, no spill.

    The graph CSR and the node→point-count map are the broadcast small
    side (``ray.put`` once, built per actor in ``__init__``); Dijkstra
    distances remain the same left-associated prefix sums, so results
    are bit-identical to the unbounded form (SQL-twinned at the
    gate)."""
    snapped = snap_to_nodes(points, nodes).materialize()
    pts_per_node = shuffle.group_agg(
        snapped, ["node_id"], {"n_pts": ("id", "size")}).to_pandas()
    src_nodes = ray.data.from_pandas(
        pts_per_node[["node_id"]].copy())

    # CSR over the (renumbered) undirected edge list
    net_ref = ray.put((edges["src"].to_numpy(np.int64),
                       edges["dst"].to_numpy(np.int64),
                       edges[weight_col].to_numpy(np.float64)))
    cnt_ref = ray.put((pts_per_node["node_id"].to_numpy(np.int64),
                       pts_per_node["n_pts"].to_numpy(np.int64)))

    class CountBoundedDijkstra:
        def __init__(self):
            s, d, w = ray.get(net_ref)
            cn, cc = ray.get(cnt_ref)
            # dense renumbering of node ids → CSR
            self.ids = np.unique(np.concatenate([s, d, cn]))
            n = len(self.ids)
            si = np.searchsorted(self.ids, np.concatenate([s, d]))
            di = np.searchsorted(self.ids, np.concatenate([d, s]))
            ww = np.concatenate([w, w])
            order = np.argsort(si, kind="stable")
            self.adj_dst = di[order]
            self.adj_w = ww[order]
            self.indptr = np.searchsorted(si[order],
                                          np.arange(n + 1))
            self.npts = np.zeros(n, np.int64)
            self.npts[np.searchsorted(self.ids, cn)] = cc

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            import heapq
            need = k + 1
            out_s, out_d, out_w = [], [], []
            for node in batch["node_id"]:
                s0 = int(np.searchsorted(self.ids, node))
                if s0 >= len(self.ids) or self.ids[s0] != node:
                    continue
                dist = {s0: 0.0}
                settled = set()
                heap = [(0.0, s0)]
                seen_pts = 0
                stop_d = np.inf
                while heap:
                    d0, u = heapq.heappop(heap)
                    if u in settled:
                        continue
                    if d0 > stop_d:
                        break
                    settled.add(u)
                    if self.npts[u]:
                        out_s.append(node)
                        out_d.append(self.ids[u])
                        out_w.append(d0)
                        seen_pts += self.npts[u]
                        if seen_pts >= need and stop_d == np.inf:
                            stop_d = d0
                    for ei in range(self.indptr[u], self.indptr[u + 1]):
                        v = self.adj_dst[ei]
                        nd = d0 + self.adj_w[ei]
                        if nd <= stop_d and (v not in dist
                                             or nd < dist[v]):
                            dist[v] = nd
                            heapq.heappush(heap, (nd, v))
            return pd.DataFrame({
                "src_node": np.array(out_s, np.int64),
                "dst_node": np.array(out_d, np.int64),
                "distance": np.array(out_w, np.float64)})

    cand_nodes = src_nodes.map_batches(
        CountBoundedDijkstra, batch_format="pandas", batch_size=256,
        concurrency=(1, 8))
    out = _expand_node_pairs(cand_nodes, snapped)
    return shuffle.topk_in_group(out, ["src"], k,
                                 ["distance", "dst"], [True, True])


def attach_network_path_geometry(edges: ray.data.Dataset,
                                 points: ray.data.Dataset,
                                 nodes: pd.DataFrame,
                                 net_edges: pd.DataFrame,
                                 weight_col: str = "length",
                                 cutoff: float | None = None,
                                 ) -> ray.data.Dataset:
    """Shortest-path polyline + network distance per point-graph edge
    (reference _compute_network_edge_data, proximity.py:630-690):
    endpoints snap to their nearest network node, each edge's geometry
    is the LINESTRING through the network-node positions on the
    shortest path, straight (p1, p2) fallback when the path has < 2
    nodes (co-snapped endpoints) or no path exists (distance inf).

    Engine shape: the pair table is grouped by snapped source node so
    one Dijkstra serves every edge sharing a source (reference
    edges_by_src_nn grouping); the network is the broadcast small side
    (``ray.put`` once, adjacency built per actor in ``__init__``);
    path rows rejoin the edge stream through a bucketed hash join —
    no candidate row lands on the driver."""
    from city2graph_ray.joins import bucketed_join
    from city2graph_ray.ops.proximity import _joined_endpoint_coords

    keep = list(edges.schema().names)
    snapped = snap_to_nodes(points, nodes).materialize()

    def side(node_col: str, id_col: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({id_col: b["id"].to_numpy(),
                                 node_col: b["node_id"].to_numpy(np.int64)})
        return fn

    withxy = _joined_endpoint_coords(edges, points)
    e2 = bucketed_join(withxy, snapped.map_batches(side("src_node", "src"),
                                                   batch_format="pandas"),
                       on="src")
    e2 = bucketed_join(e2, snapped.map_batches(side("dst_node", "dst"),
                                               batch_format="pandas"),
                       on="dst").materialize()

    pairs = shuffle.distinct(
        e2.map_batches(lambda b: b[["src_node", "dst_node"]],
                       batch_format="pandas"),
        ["src_node", "dst_node"],
        # distinct's bucket kernel keeps each src_node's pairs in ONE
        # output block, so the actor stage runs one Dijkstra per source
        # per block, not per batch fragment
    )

    nref = ray.put((nodes["node_id"].to_numpy(np.int64),
                    nodes["x"].to_numpy(np.float64),
                    nodes["y"].to_numpy(np.float64)))
    eref = ray.put(net_edges[["src", "dst", weight_col]])

    class PathTrace:
        """Early-terminating CSR Dijkstra per source group (r4): the
        former per-source ``nx.single_source_dijkstra`` explored the
        WHOLE graph even when the group needed 3 targets; now the heap
        stops once every requested target is settled.  Distances are
        the same left-associated prefix sums; among equal-cost
        shortest paths the witness may differ from networkx's
        (heap tie order), which the op's contract allows — distance
        exactness is what the tests pin."""

        def __init__(self):
            nid, nx_, ny_ = ray.get(nref)
            self.pos = {int(n): (float(a), float(b))
                        for n, a, b in zip(nid, nx_, ny_)}
            e = ray.get(eref)
            s = e["src"].to_numpy(np.int64)
            d = e["dst"].to_numpy(np.int64)
            w = e[weight_col].to_numpy(np.float64)
            self.ids = np.unique(np.concatenate([s, d]))
            n = len(self.ids)
            si = np.searchsorted(self.ids, np.concatenate([s, d]))
            di = np.searchsorted(self.ids, np.concatenate([d, s]))
            ww = np.concatenate([w, w])
            order = np.argsort(si, kind="stable")
            self.adj = di[order]
            self.wts = ww[order]
            self.indptr = np.searchsorted(si[order], np.arange(n + 1))

        def _trace(self, src: int, targets: np.ndarray):
            import heapq
            s0 = int(np.searchsorted(self.ids, src))
            if s0 >= len(self.ids) or self.ids[s0] != src:
                return {}, {}
            tset = set()
            for t in targets:
                ti = int(np.searchsorted(self.ids, t))
                if ti < len(self.ids) and self.ids[ti] == t:
                    tset.add(ti)
            dist = {s0: 0.0}
            pred = {s0: -1}
            settled: set = set()
            heap = [(0.0, s0)]
            while heap and tset:
                d0, u = heapq.heappop(heap)
                if u in settled:
                    continue
                if cutoff is not None and d0 > cutoff:
                    break
                settled.add(u)
                tset.discard(u)
                for ei in range(self.indptr[u], self.indptr[u + 1]):
                    v = int(self.adj[ei])
                    nd = d0 + self.wts[ei]
                    if v not in dist or nd < dist[v]:
                        dist[v] = nd
                        pred[v] = u
                        heapq.heappush(heap, (nd, v))
            dists, paths = {}, {}
            for t in targets:
                ti = int(np.searchsorted(self.ids, t))
                if (ti >= len(self.ids) or self.ids[ti] != t
                        or ti not in settled):
                    continue
                dists[int(t)] = dist[ti]
                p = []
                cur = ti
                while cur != -1:
                    p.append(int(self.ids[cur]))
                    cur = pred[cur]
                paths[int(t)] = p[::-1]
            return dists, paths

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out_s, out_d, out_w, out_g = [], [], [], []
            for src, grp in batch.groupby("src_node", sort=False):
                src = int(src)
                tgts = grp["dst_node"].to_numpy(np.int64)
                dists, paths = self._trace(src, tgts)
                for dst in tgts:
                    dst = int(dst)
                    out_s.append(src)
                    out_d.append(dst)
                    out_w.append(dists.get(dst, float("inf")))
                    p = paths.get(dst)
                    if p and len(p) >= 2:
                        out_g.append("LINESTRING (" + ", ".join(
                            f"{self.pos[q][0]} {self.pos[q][1]}"
                            for q in p) + ")")
                    else:
                        out_g.append(None)   # straight fallback downstream
            return pd.DataFrame({"src_node": np.array(out_s, np.int64),
                                 "dst_node": np.array(out_d, np.int64),
                                 "network_distance": np.array(out_w),
                                 "path_wkt": pd.array(out_g, dtype=object)})

    traced = pairs.map_batches(PathTrace, batch_format="pandas",
                               batch_size=4096, concurrency=(1, 8))

    joined = bucketed_join(e2, traced, on=["src_node", "dst_node"])

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        out = b[keep].copy()
        straight = [f"LINESTRING ({a} {c}, {e} {f})"
                    for a, c, e, f in zip(b["ux"], b["uy"], b["vx"], b["vy"])]
        wkt = [p if isinstance(p, str) else s
               for p, s in zip(b["path_wkt"], straight)]
        out["network_distance"] = b["network_distance"].to_numpy(np.float64)
        out["geometry"] = wkt
        return out

    return joined.map_batches(emit, batch_format="pandas")


def bounded_hop_paths(edges: ray.data.Dataset,
                      sources: ray.data.Dataset,
                      hops: int,
                      weight_col: str = "weight",
                      num_buckets: int = 64) -> ray.data.Dataset:
    """Distributed bounded-hop single-source shortest paths (iterative
    Bellman-Ford relaxation) — the fully-shuffled alternative to the
    broadcast-Dijkstra actor when the network itself is too large to
    ship to every worker (reference computes the same distances via
    NetworkX Dijkstra, proximity.py:313-362; the hop bound makes the
    semantics exactly SQL-expressible for the driver oracle).

    ``edges``: directed (src, dst, weight) rows — callers double rows
    for undirected graphs.  ``sources``: (node_id) rows.  Returns one
    row per (src, dst) reachable within ``hops`` edges with
    ``distance`` = min over ≤hops-edge paths of the left-to-right float
    sum of weights.  Per round: one bucketed hash join (frontier ×
    edges) + one partial-aggregated group-min — distances never touch
    the driver, object-store-resident throughout.  d(s,·) tables halve
    nothing but grow only with the reachable neighborhood, so total
    bytes ∝ sum of |B_hops(s)| over sources."""
    from city2graph_ray.joins import bucketed_join

    eds = edges.map_batches(
        lambda b, w=weight_col: pd.DataFrame({
            "mid": b["src"].to_numpy(np.int64),
            "ndst": b["dst"].to_numpy(np.int64),
            "w": b[w].to_numpy(np.float64)}),
        batch_format="pandas").materialize()

    dist = sources.map_batches(
        lambda b: pd.DataFrame({
            "src": b["node_id"].to_numpy(np.int64),
            "dst": b["node_id"].to_numpy(np.int64),
            "distance": np.zeros(len(b), np.float64)}),
        batch_format="pandas").materialize()

    if dist.count() == 0:
        return ray.data.from_pandas(
            pd.DataFrame({"src": pd.Series(dtype=np.int64),
                          "dst": pd.Series(dtype=np.int64),
                          "distance": pd.Series(dtype=np.float64)}))

    for _ in range(max(int(hops), 0)):
        frontier = dist.map_batches(
            lambda b: pd.DataFrame({
                "src": b["src"].to_numpy(np.int64),
                "mid": b["dst"].to_numpy(np.int64),
                "distance": b["distance"].to_numpy(np.float64)}),
            batch_format="pandas")
        relaxed = bucketed_join(frontier, eds, on="mid",
                                num_buckets=num_buckets).map_batches(
            lambda b: pd.DataFrame({
                "src": b["src"].to_numpy(np.int64),
                "dst": b["ndst"].to_numpy(np.int64),
                "distance": (b["distance"].to_numpy(np.float64)
                             + b["w"].to_numpy(np.float64))}),
            batch_format="pandas")
        # coalesce: without this the union + map_groups block count
        # compounds per round (32→992 blocks in 4 rounds on the gate
        # fixture) and the sort-shuffle cost tracks blocks, not rows
        dist = shuffle.group_agg(dist.union(relaxed), ["src", "dst"],
                                 {"distance": ("distance", "min")},
                                 num_buckets=num_buckets).repartition(
            max(num_buckets // 4, 8)).materialize()
    return dist


def network_fixed_radius_graph(points: ray.data.Dataset, nodes: pd.DataFrame,
                               edges: pd.DataFrame, radius: float,
                               weight_col: str = "length") -> ray.data.Dataset:
    """All point pairs within network distance ``radius`` (reference
    Dijkstra cutoff=radius, proximity.py:1413); undirected canonical
    src < dst."""
    snapped = snap_to_nodes(points, nodes).materialize()
    src_nodes = shuffle.distinct(
        snapped.select_columns(["node_id"]), ["node_id"])
    cand = _expand_node_pairs(
        _node_distances(src_nodes, edges, weight_col, radius), snapped)

    def canon(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["distance"] <= radius]
        m = b["src"] < b["dst"]
        return b[m]

    return shuffle.distinct(cand.map_batches(canon, batch_format="pandas"),
                            ["src", "dst"])


def bounded_hop_path_geometry(edges: ray.data.Dataset,
                              sources: ray.data.Dataset,
                              nodes: ray.data.Dataset,
                              hops: int,
                              weight_col: str = "weight",
                              num_buckets: int = 64) -> ray.data.Dataset:
    """Bounded-hop shortest paths WITH their polyline geometry — the
    bit-exact-oracle-able companion of ``attach_network_path_geometry``
    (which runs unbounded Dijkstra; a hop bound makes the recurrence
    exactly SQL-expressible, same trade as ``bounded_hop_paths``).

    The per-(src, dst) state carries ``pts`` — the path's coordinate
    string ``"x y,x y,..."`` with ``%.10g`` floats (printf-identical in
    numpy and DuckDB) — built incrementally at relax time, so the final
    WKT needs NO path-reconstruction joins.  Each round keeps, per
    (src, dst), the argmin by ``(distance, pts)``: min float distance,
    ties broken by the lexicographically smallest coordinate string —
    a total order both engines reproduce bit-for-bit.

    Scale shape: identical to ``bounded_hop_paths`` (per round one
    frontier×edges bucketed join + one keyed argmin; state never
    touches the driver) plus ~25 bytes/hop of string per state row.
    ``nodes`` (node_id, x, y) joins the edge table ONCE up front
    (distributed bucketed join — the network is not broadcast).

    Returns (src, dst, distance, path_wkt) for src ≠ dst reachable
    within ``hops`` edges.
    """
    from city2graph_ray.joins import bucketed_join

    def fmt_xy(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        return np.char.add(np.char.add(
            np.char.mod("%.10g", x), " "), np.char.mod("%.10g", y))

    nd = nodes.map_batches(
        lambda b: pd.DataFrame({
            "node_id": b["node_id"].to_numpy(np.int64),
            "_nx": b["x"].to_numpy(np.float64),
            "_ny": b["y"].to_numpy(np.float64)}),
        batch_format="pandas")

    eds = bucketed_join(
        edges.map_batches(
            lambda b, w=weight_col: pd.DataFrame({
                "mid": b["src"].to_numpy(np.int64),
                "node_id": b["dst"].to_numpy(np.int64),
                "w": b[w].to_numpy(np.float64)}),
            batch_format="pandas"),
        nd, on="node_id", num_buckets=num_buckets).map_batches(
        lambda b: pd.DataFrame({
            "mid": b["mid"].to_numpy(np.int64),
            "ndst": b["node_id"].to_numpy(np.int64),
            "w": b["w"].to_numpy(np.float64),
            "npts": fmt_xy(b["_nx"].to_numpy(np.float64),
                           b["_ny"].to_numpy(np.float64))}),
        batch_format="pandas").materialize()

    empty_pre = pd.DataFrame({"src": pd.Series(dtype=np.int64),
                              "dst": pd.Series(dtype=np.int64),
                              "distance": pd.Series(dtype=np.float64),
                              "path_wkt": pd.Series(dtype=object)})
    srcs = sources.map_batches(
        lambda b: pd.DataFrame({
            "node_id": b["node_id"].to_numpy(np.int64)}),
        batch_format="pandas").materialize()
    if srcs.count() == 0:  # Ray drops schemas through maps over
        return ray.data.from_pandas(empty_pre)  # all-empty datasets

    state = bucketed_join(
        srcs, nd, on="node_id", num_buckets=num_buckets).map_batches(
        lambda b: pd.DataFrame({
            "src": b["node_id"].to_numpy(np.int64),
            "dst": b["node_id"].to_numpy(np.int64),
            "distance": np.zeros(len(b), np.float64),
            "pts": fmt_xy(b["_nx"].to_numpy(np.float64),
                          b["_ny"].to_numpy(np.float64))}),
        batch_format="pandas").materialize()

    empty = pd.DataFrame({"src": pd.Series(dtype=np.int64),
                          "dst": pd.Series(dtype=np.int64),
                          "distance": pd.Series(dtype=np.float64),
                          "path_wkt": pd.Series(dtype=object)})
    if state.count() == 0:
        return ray.data.from_pandas(empty)

    for _ in range(max(int(hops), 0)):
        frontier = state.map_batches(
            lambda b: pd.DataFrame({
                "src": b["src"].to_numpy(np.int64),
                "mid": b["dst"].to_numpy(np.int64),
                "distance": b["distance"].to_numpy(np.float64),
                "pts": b["pts"].astype(str)}),
            batch_format="pandas")
        relaxed = bucketed_join(frontier, eds, on="mid",
                                num_buckets=num_buckets).map_batches(
            lambda b: pd.DataFrame({
                "src": b["src"].to_numpy(np.int64),
                "dst": b["ndst"].to_numpy(np.int64),
                "distance": (b["distance"].to_numpy(np.float64)
                             + b["w"].to_numpy(np.float64)),
                "pts": (b["pts"].astype(str) + ","
                        + b["npts"].astype(str))}),
            batch_format="pandas")
        # local per-batch argmin first (combiner): shuffle rows ∝
        # distinct (src, dst) per batch, not relaxation fan-out
        def local_argmin(b: pd.DataFrame) -> pd.DataFrame:
            return (b.sort_values(["distance", "pts"], kind="stable")
                    .groupby(["src", "dst"], sort=False).head(1))

        state = shuffle.topk_in_group(
            state.union(relaxed).map_batches(local_argmin,
                                             batch_format="pandas"),
            ["src", "dst"], 1, ["distance", "pts"], [True, True],
            num_buckets=num_buckets).repartition(
            max(num_buckets // 4, 8)).materialize()

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["src"] != b["dst"]]
        if len(b) == 0:
            return empty
        return pd.DataFrame({
            "src": b["src"].to_numpy(np.int64),
            "dst": b["dst"].to_numpy(np.int64),
            "distance": b["distance"].to_numpy(np.float64),
            "path_wkt": "LINESTRING(" + b["pts"].astype(str) + ")"})

    return state.map_batches(finish, batch_format="pandas")
