"""SVG plot_graph backend (reference utils/spatial.py:3027-3279).

The reference wraps matplotlib; this environment has none, so
city2graph_ray.plot renders the same surface to SVG.  Assertions are
structural: element counts, styling dispatch, hetero grid + legend.
"""

import numpy as np
import pandas as pd
import pytest

from city2graph_ray.plot import plot_graph


@pytest.fixture()
def tables():
    nodes = pd.DataFrame({"node_id": [0, 1, 2, 3],
                          "x": [0.0, 1.0, 1.0, 0.0],
                          "y": [0.0, 0.0, 1.0, 1.0],
                          "kind": ["a", "a", "b", "b"]})
    edges = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 3],
                          "w": [1.0, 2.0, 3.0]})
    return nodes, edges


def test_homogeneous_counts(tables):
    nodes, edges = tables
    svg = plot_graph(nodes=nodes, edges=edges)
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert svg.count("<circle") == 4
    assert svg.count("<polyline") == 3
    assert 'fill="#000000"' in svg  # default black background


def test_styling_dispatch(tables):
    nodes, edges = tables
    svg = plot_graph(nodes=nodes, edges=edges, node_color="kind",
                     edge_linewidth="w", markersize=5.0,
                     edge_color="#ff0000")
    # column-name node_color -> two distinct palette fills
    fills = {line.split('fill="')[1].split('"')[0]
             for line in svg.splitlines() if line.startswith("<circle")}
    assert len(fills) == 2
    assert svg.count('r="5"') == 4
    widths = [line.split('stroke-width="')[1].split('"')[0]
              for line in svg.splitlines() if line.startswith("<polyline")]
    assert widths == ["1", "2", "3"]
    assert svg.count('stroke="#ff0000"') == 3


def test_series_and_alpha(tables):
    nodes, edges = tables
    svg = plot_graph(nodes=nodes, edges=edges,
                     node_alpha=pd.Series([0.5] * 4, index=nodes.index),
                     edge_alpha=0.25)
    assert svg.count('fill-opacity="0.5"') == 4
    assert svg.count('stroke-opacity="0.25"') == 3


def test_edge_geometry_column():
    edges = pd.DataFrame(
        {"geometry": ["LINESTRING (0 0, 1 0, 1 1)", "LINESTRING (1 1, 0 1)"]})
    svg = plot_graph(edges=edges)
    assert svg.count("<polyline") == 2
    # three-vertex polyline kept intact
    assert any(line.count(",") >= 3 for line in svg.splitlines()
               if line.startswith("<polyline"))


def test_hetero_grid_and_legend(tables):
    nodes, edges = tables
    place = nodes[nodes["kind"] == "a"].reset_index(drop=True)
    movement = nodes[nodes["kind"] == "b"].reset_index(drop=True)
    svg = plot_graph(
        nodes={"place": place, "movement": movement},
        edges={("place", "touches", "place"): edges.iloc[:1],
               ("place", "faces", "movement"): edges.iloc[1:]})
    # two subplot panels side by side -> doubled width
    assert 'width="1728"' in svg.splitlines()[0]
    assert "place-touches-place" in svg and "place-faces-movement" in svg
    # legend entries for 2 node types + 2 edge types
    assert svg.count("<text") >= 6
    svg2 = plot_graph(nodes={"place": place, "movement": movement},
                      edges={("place", "touches", "place"): edges.iloc[:1]},
                      legend_position=None, subplots=False)
    assert "touches" not in svg2  # no legend, no panel titles


def test_networkx_input():
    nx = pytest.importorskip("networkx")
    g = nx.Graph()
    g.add_node(0, pos=(0.0, 0.0))
    g.add_node(1, pos=(1.0, 1.0))
    g.add_edge(0, 1)
    svg = plot_graph(graph=g)
    assert svg.count("<circle") == 2 and svg.count("<polyline") == 1


def test_file_output(tables, tmp_path):
    nodes, _ = tables
    p = str(tmp_path / "g.svg")
    assert plot_graph(nodes=nodes, path=p) == p
    assert open(p).read().startswith("<svg")


def test_errors(tables):
    nodes, _ = tables
    with pytest.raises(ValueError):
        plot_graph()
    with pytest.raises(TypeError):
        plot_graph(nodes=pd.DataFrame({"node_id": [1]}))  # no coords
    with pytest.raises(TypeError):
        plot_graph(nodes=[1, 2, 3])
