"""Torch-free PyG-layout round trips — port of the reference
round-trip assertions that don't need torch ops
(reference tests/test_graph.py:121-250, 304-414)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from city2graph_ray.pyg_layout import (from_hetero_pyg_layout,
                                       from_pyg_layout,
                                       to_hetero_pyg_layout, to_pyg_layout)


@pytest.fixture()
def nodes_df() -> pd.DataFrame:
    return pd.DataFrame({"node_id": np.array([10, 20, 30, 40], np.int64),
                         "x": [0.0, 1.0, 2.0, 3.0],
                         "y": [0.0, 0.5, 1.5, 3.5],
                         "height": [5.0, 7.0, 9.0, 11.0],
                         "kind": ["a", "b", "a", "b"],   # non-numeric
                         "label": [0.0, 1.0, 0.0, 1.0]})


@pytest.fixture()
def edges_df() -> pd.DataFrame:
    return pd.DataFrame({"src": np.array([10, 20, 30, 30], np.int64),
                         "dst": np.array([20, 30, 40, 30], np.int64),
                         "w": [1.0, 2.0, 3.0, 4.0]})


def test_homogeneous_basic(nodes_df, edges_df):
    # reference test_homogeneous_gdf_to_pyg_basic: shapes and dtypes
    lay = to_pyg_layout(nodes_df, edges_df)
    assert lay.num_nodes == 4
    assert lay.edge_index.shape == (2, 4) and lay.edge_index.dtype == np.int64
    assert lay.x.shape == (4, 0) and lay.x.dtype == np.float32
    assert lay.edge_attr.shape == (4, 0)
    assert lay.pos.shape == (4, 2) and lay.pos.dtype == np.float32
    # id mapping: positions, not raw ids
    assert lay.edge_index[:, 0].tolist() == [0, 1]


def test_homogeneous_features_and_labels(nodes_df, edges_df):
    # reference test_homogeneous_gdf_to_pyg_with_features: non-numeric
    # requested columns are skipped, order follows the request
    lay = to_pyg_layout(nodes_df, edges_df,
                        node_feature_cols=["height", "kind"],
                        node_label_cols=["label"],
                        edge_feature_cols=["w"])
    assert lay.x.shape == (4, 1)
    np.testing.assert_allclose(lay.x[:, 0], [5, 7, 9, 11])
    assert lay.y.shape == (4, 1)
    assert lay.edge_attr.shape == (4, 1)
    np.testing.assert_allclose(lay.edge_attr[:, 0], [1, 2, 3, 4])


def test_homogeneous_round_trip(nodes_df, edges_df):
    # reference test_homogeneous_round_trip_conversion
    lay = to_pyg_layout(nodes_df, edges_df,
                        node_feature_cols=["height"],
                        node_label_cols=["label"],
                        edge_feature_cols=["w"])
    n2, e2 = from_pyg_layout(lay)
    assert n2["node_id"].tolist() == [10, 20, 30, 40]
    np.testing.assert_allclose(n2["height"], nodes_df["height"])
    np.testing.assert_allclose(n2["label"], nodes_df["label"])
    np.testing.assert_allclose(n2["x"], nodes_df["x"])
    assert e2[["src", "dst"]].to_numpy().tolist() == \
        edges_df[["src", "dst"]].to_numpy().tolist()
    np.testing.assert_allclose(e2["w"], edges_df["w"])


def test_undirected_symmetrization(nodes_df, edges_df):
    # reference _symmetrize_edges: reverses non-self-loops, duplicates
    # attrs; round trip slices the mirror off
    lay = to_pyg_layout(nodes_df, edges_df, edge_feature_cols=["w"],
                        directed=False)
    # 4 original edges, one is a self-loop (30,30) -> 3 mirrors
    assert lay.edge_index.shape == (2, 7)
    assert lay.edge_attr.shape == (7, 1)
    assert lay.metadata["n_original_edges"] == 4
    fwd = set(map(tuple, lay.edge_index[:, :4].T.tolist()))
    rev = set(map(tuple, lay.edge_index[:, 4:].T.tolist()))
    assert rev == {(b, a) for a, b in fwd if a != b}
    _, e2 = from_pyg_layout(lay)
    assert len(e2) == 4


def test_duplicate_node_id_last_occurrence():
    # reference test_homogeneous_duplicate_node_index_maps_last_occurrence
    nodes = pd.DataFrame({"node_id": np.array([1, 2, 1], np.int64),
                          "x": [0.0, 1.0, 2.0], "y": [0.0, 0.0, 0.0]})
    edges = pd.DataFrame({"src": [1], "dst": [2]})
    lay = to_pyg_layout(nodes, edges)
    assert lay.edge_index[:, 0].tolist() == [2, 1]


def test_unknown_endpoints_dropped(nodes_df):
    edges = pd.DataFrame({"src": [10, 99], "dst": [20, 10]})
    lay = to_pyg_layout(nodes_df, edges)
    assert lay.edge_index.shape == (2, 1)


def test_empty_inputs(nodes_df):
    # reference test_empty_inputs / test_heterogeneous_empty_edges
    lay = to_pyg_layout(nodes_df, None)
    assert lay.edge_index.shape == (2, 0)
    n2, e2 = from_pyg_layout(lay)
    assert len(n2) == 4 and len(e2) == 0


def test_dataset_inputs(nodes_df, edges_df):
    lay = to_pyg_layout(rd.from_pandas(nodes_df), rd.from_pandas(edges_df),
                        node_feature_cols=["height"])
    assert lay.num_nodes == 4 and lay.num_edges == 4


def test_hetero_round_trip():
    # reference test_heterogeneous_round_trip_conversion
    cust = pd.DataFrame({"id": np.array([1, 2], np.int64),
                         "x": [0.0, 1.0], "y": [0.0, 1.0],
                         "spend": [10.0, 20.0]})
    supp = pd.DataFrame({"id": np.array([7, 8, 9], np.int64),
                         "x": [5.0, 6.0, 7.0], "y": [0.0, 0.0, 0.0]})
    buys = pd.DataFrame({"src": np.array([1, 2, 2], np.int64),
                         "dst": np.array([7, 8, 9], np.int64),
                         "qty": [1.0, 2.0, 3.0]})
    lay = to_hetero_pyg_layout(
        {"customer": cust, "supplier": supp},
        {("customer", "buys", "supplier"): buys},
        node_feature_cols={"customer": ["spend"]},
        edge_feature_cols={("customer", "buys", "supplier"): ["qty"]})
    ct = lay.node_types["customer"]
    assert ct["x"].shape == (2, 1)
    et = lay.edge_types[("customer", "buys", "supplier")]
    assert et["edge_index"].shape == (2, 3)
    assert et["edge_index"][1].tolist() == [0, 1, 2]   # supplier positions
    n2, e2 = from_hetero_pyg_layout(lay)
    assert n2["customer"]["id"].tolist() == [1, 2]
    np.testing.assert_allclose(n2["customer"]["spend"], [10, 20])
    got = e2[("customer", "buys", "supplier")]
    assert got[["src", "dst"]].to_numpy().tolist() == \
        buys[["src", "dst"]].to_numpy().tolist()
    np.testing.assert_allclose(got["qty"], buys["qty"])


def test_hetero_cross_type_not_symmetrized():
    # cross-type undirected edges must NOT mirror (reference same_type
    # guard in _build_edge_tensors)
    a = pd.DataFrame({"id": np.array([1], np.int64), "x": [0.], "y": [0.]})
    b = pd.DataFrame({"id": np.array([2], np.int64), "x": [1.], "y": [0.]})
    e = pd.DataFrame({"src": [1], "dst": [2]})
    lay = to_hetero_pyg_layout({"a": a, "b": b}, {("a", "r", "b"): e},
                               directed=False)
    assert lay.edge_types[("a", "r", "b")]["edge_index"].shape == (2, 1)
    same = to_hetero_pyg_layout(
        {"a": pd.DataFrame({"id": np.array([1, 2], np.int64),
                            "x": [0., 1.], "y": [0., 0.]})},
        {("a", "r", "a"): e}, directed=False)
    assert same.edge_types[("a", "r", "a")]["edge_index"].shape == (2, 2)


def test_unknown_node_type_raises():
    a = pd.DataFrame({"id": np.array([1], np.int64)})
    e = pd.DataFrame({"src": [1], "dst": [1]})
    with pytest.raises(KeyError):
        to_hetero_pyg_layout({"a": a}, {("a", "r", "zzz"): e})
