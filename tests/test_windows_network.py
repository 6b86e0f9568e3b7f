"""Windows, network-metric builders, manhattan metric, metapath extras."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def small_events() -> pd.DataFrame:
    ts = pd.to_datetime([
        "2024-01-01 00:00:05", "2024-01-01 00:00:55", "2024-01-01 00:01:10",
        "2024-01-01 00:03:20", "2024-01-01 00:03:30"])
    return pd.DataFrame({"event_id": np.arange(5, dtype=np.int64),
                         "ts": ts,
                         "user_id": [1, 1, 1, 2, 2],
                         "event_type": ["a", "a", "b", "a", "a"],
                         "value": [1.0, 2.0, 3.0, 4.0, 5.0]})


def test_tumbling_window(small_events):
    from city2graph_ray.ops.windows import tumbling_window
    out = tumbling_window(rd.from_pandas(small_events), 60.0).to_pandas()
    out = out.set_index(["event_type", "window_start_sec"]).sort_index()
    base = pd.Timestamp("2024-01-01").value // 10 ** 9
    assert out.loc[("a", base), "n"] == 2          # 00:00:05, 00:00:55
    assert out.loc[("a", base), "sum_value"] == 3.0
    assert out.loc[("b", base + 60), "n"] == 1
    assert out.loc[("a", base + 180), "n"] == 2


def test_sliding_window(small_events):
    from city2graph_ray.ops.windows import sliding_window
    out = sliding_window(rd.from_pandas(small_events), 120.0, 60.0).to_pandas()
    base = pd.Timestamp("2024-01-01").value // 10 ** 9
    a = out[out["event_type"] == "a"].set_index("window_start_sec")
    # windows [base-60, base+60) and [base, base+120) each hold both
    # minute-0 'a' events (00:00:05 and 00:00:55)
    assert a.loc[base, "n"] == 2
    assert a.loc[base - 60, "n"] == 2
    # the 03:xx events never share a window with minute 0
    assert a.loc[base + 180, "n"] == 2
    with pytest.raises(ValueError):
        sliding_window(rd.from_pandas(small_events), 100.0, 33.0)


def test_sessionize(small_events):
    from city2graph_ray.ops.windows import sessionize
    out = sessionize(rd.from_pandas(small_events), gap_sec=60.0).to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("session_id")
    # gaps: 50s (same), 15s (same) → one session of 3 for user 1
    assert list(u1["n_events"]) == [3]
    u2 = out[out["user_id"] == 2]
    assert list(u2["n_events"]) == [2]


def test_manhattan_metric(customer_points):
    from city2graph_ray.ops.proximity import fixed_radius_graph, knn_graph
    pts = customer_points
    x = pts["x"].to_numpy()
    y = pts["y"].to_numpy()
    ids = pts["id"].to_numpy()
    d = np.abs(x[:, None] - x[None, :]) + np.abs(y[:, None] - y[None, :])
    r = 50.0
    got = fixed_radius_graph(rd.from_pandas(pts), r,
                             metric="manhattan").to_pandas()
    ii, jj = np.nonzero((d <= r) & (ids[:, None] < ids[None, :]))
    assert len(got) == len(ii)
    assert set(map(tuple, got[["src", "dst"]].to_numpy())) == set(
        zip(ids[ii], ids[jj]))

    k = 3
    gk = knn_graph(rd.from_pandas(pts), k, metric="manhattan").to_pandas()
    rows = []
    for i in range(len(pts)):
        dd = d[i].copy()
        dd[i] = np.inf
        for j in np.lexsort((ids, dd))[:k]:
            rows.append((ids[i], ids[j]))
    assert set(map(tuple, gk[["src", "dst"]].to_numpy())) == set(rows)


@pytest.fixture(scope="module")
def net():
    """Chain network 0-1-2-3-4 at x=0,10,20,30,40 with unit-per-length
    weights, plus points snapped near the nodes."""
    nodes = pd.DataFrame({"node_id": np.arange(5, dtype=np.int64),
                          "x": np.arange(5) * 10.0, "y": np.zeros(5)})
    edges = pd.DataFrame({"src": [0, 1, 2, 3], "dst": [1, 2, 3, 4],
                          "length": [10.0] * 4})
    points = pd.DataFrame({"id": np.array([100, 101, 102, 103], np.int64),
                           "x": [1.0, 11.0, 21.0, 41.0],
                           "y": [0.0, 0.0, 0.0, 0.0]})
    return nodes, edges, points


def test_network_knn(net):
    from city2graph_ray.ops.network import network_knn_graph
    nodes, edges, points = net
    got = network_knn_graph(rd.from_pandas(points), nodes, edges,
                            k=2).to_pandas()
    m = {(r.src, r.dst): r.distance for r in got.itertuples()}
    # point 100 snaps to node 0: neighbors 101 (10), 102 (20)
    assert m[(100, 101)] == 10.0 and m[(100, 102)] == 20.0
    assert (100, 103) not in m  # k=2 cuts the 40-cost one
    # point 103 snaps to node 4: nearest 102 (20), 101 (30)
    assert m[(103, 102)] == 20.0 and m[(103, 101)] == 30.0


def test_network_fixed_radius(net):
    from city2graph_ray.ops.network import network_fixed_radius_graph
    nodes, edges, points = net
    got = network_fixed_radius_graph(rd.from_pandas(points), nodes, edges,
                                     radius=20.0).to_pandas()
    pairs = set(map(tuple, got[["src", "dst"]].to_numpy()))
    assert pairs == {(100, 101), (100, 102), (101, 102), (102, 103)}


def test_network_path_geometry(net):
    """Path polylines + network distances vs the NetworkX oracle:
    multi-hop paths trace node positions, co-snapped endpoints fall
    back to the straight segment with distance 0, disconnected
    components get inf + straight fallback."""
    import networkx as nx
    from city2graph_ray.ops.network import attach_network_path_geometry
    nodes, edges, points = net
    # isolated node 5 + a point snapping to it (disconnected case)
    nodes = pd.concat([nodes, pd.DataFrame(
        {"node_id": [5], "x": [500.0], "y": [0.0]})], ignore_index=True)
    points = pd.concat([points, pd.DataFrame(
        {"id": np.array([104, 105], np.int64),
         "x": [499.0, 2.0], "y": [0.0, 0.0]})], ignore_index=True)
    pe = pd.DataFrame({"src": np.array([100, 100, 100, 100], np.int64),
                       "dst": np.array([102, 103, 104, 105], np.int64)})
    got = attach_network_path_geometry(
        rd.from_pandas(pe), rd.from_pandas(points), nodes, edges,
    ).to_pandas().set_index("dst")

    g = nx.Graph()
    for s, d, w in edges.itertuples(index=False):
        g.add_edge(int(s), int(d), weight=float(w))
    pos = {int(r.node_id): (r.x, r.y) for r in nodes.itertuples()}
    # 100 snaps to node 0, 102 to node 2: path 0-1-2, dist 20
    assert got.loc[102, "network_distance"] == 20.0
    want = "LINESTRING (" + ", ".join(
        f"{pos[q][0]} {pos[q][1]}" for q in nx.dijkstra_path(g, 0, 2)) + ")"
    assert got.loc[102, "geometry"] == want
    assert got.loc[103, "network_distance"] == 40.0
    # 104 snaps to isolated node 5: unreachable -> inf + straight
    assert np.isinf(got.loc[104, "network_distance"])
    assert got.loc[104, "geometry"] == "LINESTRING (1.0 0.0, 499.0 0.0)"
    # 105 co-snaps with 100 to node 0: distance 0, straight fallback
    assert got.loc[105, "network_distance"] == 0.0
    assert got.loc[105, "geometry"] == "LINESTRING (1.0 0.0, 2.0 0.0)"


def test_bounded_hop_paths(net):
    """Distributed Bellman-Ford vs a dense numpy min-plus recurrence —
    identical (src, dst, distance) sets at every hop bound, plus the
    0-hop and empty-source degenerate cases."""
    from city2graph_ray.ops.network import bounded_hop_paths
    nodes, edges, _ = net
    rng = np.random.default_rng(5)
    extra = pd.DataFrame({"src": [0, 1], "dst": [3, 4],
                          "length": [7.5, 33.0]})
    e = pd.concat([edges, extra], ignore_index=True)
    dedges = pd.DataFrame({
        "src": np.concatenate([e["src"], e["dst"]]).astype(np.int64),
        "dst": np.concatenate([e["dst"], e["src"]]).astype(np.int64),
        "weight": np.tile(e["length"].to_numpy(np.float64), 2)})
    n = 5
    w = np.full((n, n), np.inf)
    for s, d, ww in dedges.itertuples(index=False):
        w[s, d] = min(w[s, d], ww)
    srcs = pd.DataFrame({"node_id": np.array([0, 2], np.int64)})
    for hops in (0, 1, 2, 3):
        dist = np.full((n, n), np.inf)
        dist[np.arange(n), np.arange(n)] = 0.0
        for _ in range(hops):
            dist = np.minimum(dist, (dist[:, :, None] + w[None, :, :]).min(1))
        got = bounded_hop_paths(
            rd.from_pandas(dedges), rd.from_pandas(srcs), hops).to_pandas()
        want = {(s, d): dist[s, d] for s in (0, 2) for d in range(n)
                if np.isfinite(dist[s, d])}
        assert {(r.src, r.dst): r.distance
                for r in got.itertuples()} == want, hops
    empty = bounded_hop_paths(
        rd.from_pandas(dedges),
        rd.from_pandas(pd.DataFrame({"node_id": pd.Series(dtype=np.int64)})),
        2).to_pandas()
    assert len(empty) == 0


def test_metapath_undirected_and_callable():
    from city2graph_ray.ops.metapath import add_metapaths
    # 1-10-2 and 2-10-1 are the same undirected path → dedup to one
    h1 = pd.DataFrame({"src": [1, 2], "dst": [10, 10], "w": [1.0, 2.0]})
    h2 = pd.DataFrame({"src": [10, 10], "dst": [2, 1], "w": [4.0, 8.0]})
    und = add_metapaths([rd.from_pandas(h1), rd.from_pandas(h2)],
                        attr_cols=("w",), undirected=True).to_pandas()
    # 4 directed paths; 1-10-2 ≡ 2-10-1 collapse → 3 (incl. two loops)
    assert len(und) == 3
    r = und[(und["src"] == 1) & (und["dst"] == 2)].iloc[0]
    assert r.weight == 1 and r.w_sum == 5.0  # deterministic winner (min w)
    # directed: all 4 paths distinct → 4 terminal pairs
    dire = add_metapaths([rd.from_pandas(h1), rd.from_pandas(h2)],
                         attr_cols=("w",)).to_pandas()
    assert len(dire) == 4

    # custom callable reducer (max of per-path sums)
    def pmax(v):
        return float(np.max(v))

    out = add_metapaths([rd.from_pandas(h1), rd.from_pandas(h2)],
                        attr_cols=("w",), agg=pmax).to_pandas()
    got = {(r.src, r.dst): r.w_pmax for r in out.itertuples()}
    assert got[(1, 2)] == 1.0 + 4.0  # path 1-10-2: w sums to 5
    assert got[(2, 1)] == 2.0 + 8.0


def test_bounded_hop_path_geometry(net):
    """Path-carrying Bellman-Ford vs brute enumeration of every
    <=hops-edge path with the same (distance, pts) argmin — distances
    AND polylines identical, including the tie-broken diamond."""
    from city2graph_ray.ops.network import bounded_hop_path_geometry
    nodes, edges, _ = net
    # add a diamond: 0->5->4 and the chain 0..4, plus an equal-cost
    # alternative route 0->6->2 tying with 0->1->2 (20.0 either way)
    nodes2 = pd.concat([nodes, pd.DataFrame({
        "node_id": np.array([5, 6], np.int64),
        "x": [15.0, 5.0], "y": [25.0, -10.0]})], ignore_index=True)
    e = pd.concat([edges, pd.DataFrame({
        "src": [0, 5, 0, 6], "dst": [5, 4, 6, 2],
        "length": [12.0, 11.0, 8.0, 12.0]})], ignore_index=True)
    dedges = pd.DataFrame({
        "src": np.concatenate([e["src"], e["dst"]]).astype(np.int64),
        "dst": np.concatenate([e["dst"], e["src"]]).astype(np.int64),
        "weight": np.tile(e["length"].to_numpy(np.float64), 2)})

    xy = {int(r.node_id): (r.x, r.y) for r in nodes2.itertuples()}

    def fmt(nid):
        return "%.10g %.10g" % xy[nid]

    adj: dict[int, list[tuple[int, float]]] = {}
    for r in dedges.itertuples(index=False):
        adj.setdefault(int(r.src), []).append((int(r.dst), float(r.weight)))

    def brute(srcs, hops):
        best: dict[tuple[int, int], tuple[float, str]] = {}
        for s in srcs:
            stack = [(s, 0.0, fmt(s), 0)]
            while stack:
                v, d, pts, k = stack.pop()
                cur = best.get((s, v))
                if cur is None or (d, pts) < cur:
                    best[(s, v)] = (d, pts)
                if k == hops:
                    continue
                for u, w in adj.get(v, ()):
                    stack.append((u, d + w, pts + "," + fmt(u), k + 1))
        return {(s, v): ("LINESTRING(%s)" % p, d)
                for (s, v), (d, p) in best.items() if s != v}

    srcs = pd.DataFrame({"node_id": np.array([0, 2], np.int64)})
    for hops in (1, 2, 4):
        got = bounded_hop_path_geometry(
            rd.from_pandas(dedges), rd.from_pandas(srcs),
            rd.from_pandas(nodes2), hops, num_buckets=4).to_pandas()
        want = brute([0, 2], hops)
        assert {(r.src, r.dst): (r.path_wkt, r.distance)
                for r in got.itertuples()} == want, hops


def test_bounded_hop_path_geometry_empty_sources(net):
    from city2graph_ray.ops.network import bounded_hop_path_geometry
    nodes, edges, _ = net
    dedges = pd.DataFrame({
        "src": edges["src"].to_numpy(np.int64),
        "dst": edges["dst"].to_numpy(np.int64),
        "weight": edges["length"].to_numpy(np.float64)})
    out = bounded_hop_path_geometry(
        rd.from_pandas(dedges),
        rd.from_pandas(pd.DataFrame({"node_id": pd.Series(dtype=np.int64)})),
        rd.from_pandas(nodes), 2, num_buckets=2)
    assert out.count() == 0


def test_grouped_running_sum_exact():
    import ray.data as rd
    from city2graph_ray.ops.windows import grouped_running_sum
    df = pd.DataFrame({"k": [1, 1, 1, 2, 2],
                       "o": [3, 1, 2, 1, 2],
                       "v": [0.1, 0.2, 0.3, 5.0, 0.05]})
    out = (grouped_running_sum(rd.from_pandas(df), ["k"], ["o"], "v")
           .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    # k=1 ordered by o: 0.2, 0.2+0.3, 0.2+0.3+0.1 — int-cent exact
    assert out["running"].tolist() == [0.2, 0.5, 0.6, 5.0, 5.05]


def test_zscore_filter_flags_outlier():
    import ray.data as rd
    from city2graph_ray.ops.stats import zscore_filter
    df = pd.DataFrame({"g": ["a"] * 10 + ["b"] * 3,
                       "id": range(13),
                       "v": [1.0] * 9 + [100.0] + [2.0, 2.0, 2.0]})
    out = zscore_filter(rd.from_pandas(df), ["g"], "v",
                        threshold=2.0).to_pandas()
    # only the 100.0 row stands out; group b has var 0 → emits nothing
    assert out["id"].tolist() == [9]
    assert out["z"].iloc[0] > 2.0


def test_pivot_counts_wide():
    import ray.data as rd
    from city2graph_ray import shuffle
    df = pd.DataFrame({"u": [1, 1, 2, 2, 2],
                       "t": ["x", "y", "x", "x", "zz"]})
    out = (shuffle.pivot_counts(rd.from_pandas(df), ["u"], "t",
                                ["x", "y"])
           .to_pandas().sort_values("u").reset_index(drop=True))
    assert out["n_x"].tolist() == [1, 2]
    assert out["n_y"].tolist() == [1, 0]       # 'zz' not listed → ignored
    assert out["n_x"].dtype == np.int64


def test_network_knn_k_exceeds_point_count():
    """Reference tests/test_proximity.py:1338: k larger than the
    reachable point count emits what exists, no error."""
    import ray.data as rd

    from city2graph_ray.ops.network import network_knn_graph

    nodes = pd.DataFrame({"node_id": np.arange(4, dtype=np.int64),
                          "x": [0.0, 1.0, 2.0, 3.0],
                          "y": [0.0, 0.0, 0.0, 0.0]})
    edges = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 3],
                          "length": [1.0, 1.0, 1.0]})
    pts = rd.from_pandas(pd.DataFrame({
        "id": np.array([10, 11, 12], np.int64),
        "x": [0.0, 1.0, 3.0], "y": [0.0, 0.0, 0.0]}))
    out = (network_knn_graph(pts, nodes, edges, k=10)
           .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True))
    # every point sees both others (chain is connected): 3*2 pairs
    assert len(out) == 6
    got = out[(out["src"] == 10) & (out["dst"] == 12)]["distance"].iloc[0]
    assert got == 3.0


def test_network_fixed_radius_matches_bruteforce():
    """Reference tests/test_proximity.py:1324: cutoff Dijkstra radius
    pairs equal the brute-force all-pairs network distances."""
    import networkx as nx
    import ray.data as rd

    from city2graph_ray.ops.network import network_fixed_radius_graph

    rng = np.random.default_rng(2)
    n = 12
    nodes = pd.DataFrame({"node_id": np.arange(n, dtype=np.int64),
                          "x": rng.uniform(0, 10, n),
                          "y": rng.uniform(0, 10, n)})
    edges = pd.DataFrame({
        "src": rng.integers(0, n, 20), "dst": rng.integers(0, n, 20)})
    edges = (edges[edges["src"] != edges["dst"]]
             .drop_duplicates(["src", "dst"]))
    edges["length"] = rng.uniform(0.5, 2.0, len(edges))
    pts = rd.from_pandas(nodes.rename(columns={"node_id": "id"}))

    R = 3.0
    out = network_fixed_radius_graph(pts, nodes, edges, R).to_pandas()
    got = set(map(tuple, out[["src", "dst"]].to_numpy()))

    g = nx.Graph()
    for s, d, w in edges.itertuples(index=False):
        g.add_edge(int(s), int(d), weight=float(w))
    want = set()
    lens = dict(nx.all_pairs_dijkstra_path_length(g, weight="weight"))
    for u in lens:
        for v, dd in lens[u].items():
            if u < v and dd <= R:
                want.add((u, v))
    assert got == want
