"""Multi-distance morphology, place↔movement dwithin+fallback,
duplicate policy, bridge_nodes dict, OD adjacency form."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture(scope="module")
def grid():
    segs = []
    sid = 0
    for v in (0.0, 30.0, 60.0):
        for a, b in [((v, 0.0), (v, 30.0)), ((v, 30.0), (v, 60.0)),
                     ((0.0, v), (30.0, v)), ((30.0, v), (60.0, v))]:
            segs.append((sid, np.array([a[0], a[1], b[0], b[1]])))
            sid += 1
    streets = pd.DataFrame(segs, columns=["seg_id", "coords"])
    blds = pd.DataFrame({"id": np.array([1, 2, 3], np.int64),
                         "x": [8.0, 22.0, 45.0], "y": [8.0, 22.0, 45.0]})
    return streets, blds


def test_place_to_movement_dwithin_fallback(grid):
    from city2graph_ray.ops.morphology import place_to_movement_edges
    streets, _ = grid
    places = pd.DataFrame({"id": np.array([10, 11], np.int64),
                           "x": [0.0, 15.0],    # 10 sits ON a street
                           "y": [15.0, 15.0]})  # 11 is 15 away from two
    out = place_to_movement_edges(rd.from_pandas(places),
                                  rd.from_pandas(streets),
                                  tolerance=1e-6,
                                  max_connection_distance=20.0).to_pandas()
    by10 = out[out["id"] == 10]
    assert (by10["matched_by"] == "dwithin").all() and len(by10) >= 1
    by11 = out[out["id"] == 11]
    assert list(by11["matched_by"]) == ["nearest"] and len(by11) == 1
    assert by11["distance"].iloc[0] == 15.0


def test_morphological_graphs_shared(grid):
    from city2graph_ray.ops.morphology import morphological_graphs
    streets, blds = grid
    out = morphological_graphs(rd.from_pandas(blds), rd.from_pandas(streets),
                               center=(0.0, 0.0), distances=[60.0, 200.0],
                               resolution=3.0)
    assert set(out) == {60.0, 200.0}
    # smaller distance keeps fewer (or equal) segments
    n60 = out[60.0]["segment_edges"].count()
    n200 = out[200.0]["segment_edges"].count()
    assert n60 <= n200
    # the tessellation is computed once at max distance, then filtered
    # per distance (reference _create_and_filter_tessellation): the
    # smaller budget keeps a subset of the max-distance place cells
    t60 = out[60.0]["tessellation"].to_pandas()
    t200 = out[200.0]["tessellation"].to_pandas()
    assert len(t60) <= len(t200)
    assert set(t60["tess_id"]).issubset(set(t200["tess_id"]))
    assert out[200.0]["movement_movement"].count() > 0


def test_segments_duplicate_error():
    from city2graph_ray.ops.topology import segments_to_graph
    segs = pd.DataFrame({
        "seg_id": np.array([1, 2], np.int64),
        "coords": [np.array([0.0, 0.0, 1.0, 0.0]),
                   np.array([0.0, 0.0, 1.0, 0.0])]})  # duplicate pair
    with pytest.raises(Exception):
        _, e = segments_to_graph(rd.from_pandas(segs), multigraph=False,
                                 on_duplicate="error")
        e.to_pandas()


def test_bridge_nodes_dict(customer_points):
    from city2graph_ray.ops.proximity import bridge_nodes
    a = rd.from_pandas(customer_points.iloc[:40].reset_index(drop=True))
    b = rd.from_pandas(customer_points.iloc[40:80].reset_index(drop=True))
    out = bridge_nodes({"poi": a, "stop": b}, method="knn", k=1)
    assert set(out) == {("poi", "is_nearby", "stop"),
                        ("stop", "is_nearby", "poi")}
    assert out[("poi", "is_nearby", "stop")].count() == 40
    assert out[("stop", "is_nearby", "poi")].count() == 40


def test_od_adjacency_form():
    from city2graph_ray.ops.mobility import adjacency_to_edgelist, od_graph
    m = np.array([[0.0, 5.0, 0.0],
                  [2.0, 0.0, 1.0],
                  [0.0, 0.0, 3.0]])
    el = adjacency_to_edgelist(m, ["a", "b", "c"])
    assert len(el) == 4  # zeros dropped
    out = od_graph(rd.from_pandas(el), undirected=True,
                   threshold=2.0).to_pandas()
    got = {(r.source, r.target): r.weight for r in out.itertuples()}
    # a↔b: 5+2=7 kept; b↔c: 1 < 2 dropped; c-c self-loop dropped
    assert got == {("a", "b"): 7.0}
