"""Manifest / validation / converter layer."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from city2graph_ray.context import (
    CrsMismatch,
    GraphManifest,
    TableManifest,
    ensure_crs_consistency,
)
from city2graph_ray.convert import from_networkx, to_networkx, to_pyg
from city2graph_ray.ops.validate import drop_count, validate_coords, validate_points


def test_manifest_roundtrip():
    m = GraphManifest(crs="EPSG:27700")
    m.nodes["place"] = TableManifest(crs="EPSG:27700", id_col="place_id",
                                     geom_role="point")
    m.edges["place|touched_to|place"] = TableManifest(crs="EPSG:27700")
    m.directed["place|touched_to|place"] = False
    m.symmetrized["place|touched_to|place"] = True
    back = GraphManifest.from_json(m.to_json())
    assert back.crs == "EPSG:27700"
    assert back.nodes["place"].id_col == "place_id"
    assert back.symmetrized["place|touched_to|place"] is True


def test_crs_consistency():
    a = TableManifest(crs="EPSG:27700")
    b = TableManifest(crs="EPSG:27700")
    c = TableManifest(crs="EPSG:4326")
    assert ensure_crs_consistency(a, b) == "EPSG:27700"
    with pytest.raises(CrsMismatch):
        ensure_crs_consistency(a, c)
    assert ensure_crs_consistency(TableManifest(), TableManifest()) is None


def test_validate_points_and_coords():
    pts = pd.DataFrame({"id": [1, 2, 3],
                        "x": [0.0, np.nan, 2.0],
                        "y": [0.0, 1.0, np.inf]})
    ds = rd.from_pandas(pts)
    ok = validate_points(ds)
    assert list(ok.to_pandas()["id"]) == [1]
    assert drop_count(ds, ok) == 2

    lines = pd.DataFrame({"id": [1, 2, 3, 4], "coords": [
        np.array([0.0, 0.0, 1.0, 1.0]),
        np.array([0.0, 0.0]),              # single point → dropped
        np.array([0.0, np.nan, 1.0, 1.0]),  # NaN vertex → dropped
        np.array([])]})                     # empty → dropped
    keep = validate_coords(rd.from_pandas(lines), "linestring").to_pandas()
    assert list(keep["id"]) == [1]

    polys = pd.DataFrame({"id": [1], "coords": [
        np.array([0.0, 0.0, 1.0, 0.0, 1.0, 1.0])]})  # open ring
    rep = validate_coords(rd.from_pandas(polys), "polygon",
                          repair=True).to_pandas()
    c = np.asarray(rep["coords"].iloc[0]).reshape(-1, 2)
    assert (c[0] == c[-1]).all()  # closed


def test_networkx_roundtrip():
    e = pd.DataFrame({"src": [1, 2], "dst": [2, 3], "distance": [1.0, 2.0]})
    g = to_networkx(e, edge_attrs=("distance",))
    assert g.number_of_edges() == 2
    assert g[1][2]["distance"] == 1.0
    nodes, edges = from_networkx(g)
    assert set(nodes["node_id"]) == {1, 2, 3}
    assert len(edges) == 2
    with pytest.raises(NotImplementedError):
        to_pyg()


def test_api_facade_exports():
    """Every reference-named export resolves and the dispatchers work."""
    from city2graph_ray import api

    for name in api.__all__:
        assert callable(getattr(api, name)), name

    # od_matrix_to_graph matrix dispatch
    m = np.array([[0.0, 4.0], [1.0, 0.0]])
    out = api.od_matrix_to_graph(m, matrix_zone_ids=["a", "b"],
                                 undirected=True).to_pandas()
    assert {(r.source, r.target): r.weight for r in out.itertuples()} == \
        {("a", "b"): 5.0}

    # movement_to_movement_graph over a tiny street pair
    segs = pd.DataFrame({"seg_id": np.array([1, 2], np.int64),
                         "coords": [np.array([0.0, 0.0, 1.0, 0.0]),
                                    np.array([1.0, 0.0, 2.0, 0.0])]})
    mm = api.movement_to_movement_graph(rd.from_pandas(segs)).to_pandas()
    assert set(map(tuple, mm[["src", "dst"]].to_numpy())) == {(1, 2)}


def test_repair_ring_bowtie():
    """buffer(0) analogue: a bowtie ring splits into its two positive
    faces (reference invalid-building repair, morphology.py:2194-2264)."""
    from city2graph_ray.geom.voronoi import ring_area
    from city2graph_ray.ops.validate import repair_ring
    faces = repair_ring(np.array([0.0, 0, 1, 1, 1, 0, 0, 1]))
    assert len(faces) == 2
    areas = sorted(abs(ring_area(f.reshape(-1, 2))) for f in faces)
    assert np.allclose(areas, [0.25, 0.25])
    # a valid ring passes through unchanged
    ok = repair_ring(np.array([0.0, 0, 1, 0, 1, 1, 0, 1]))
    assert len(ok) == 1


def test_validate_coords_repair_explodes_bowtie():
    from city2graph_ray.ops.validate import validate_coords
    polys = pd.DataFrame({
        "id": np.array([1, 2], dtype=np.int64),
        "coords": [np.array([0.0, 0, 1, 1, 1, 0, 0, 1]),     # bowtie
                   np.array([0.0, 0, 2, 0, 2, 2, 0, 2])]})   # valid
    out = validate_coords(rd.from_pandas(polys), "polygon",
                          repair=True).to_pandas()
    assert len(out) == 3  # bowtie exploded into 2 faces + valid square
    assert sorted(out["id"]) == [1, 1, 2]


def test_reproject_roundtrip_and_harmonize():
    from city2graph_ray.context import TableManifest
    from city2graph_ray.ops.crs import harmonize_crs, reproject
    pts = pd.DataFrame({"id": [0, 1], "x": [0.0, 10.0], "y": [0.0, 45.0]})
    ds = rd.from_pandas(pts)
    merc = reproject(ds, "EPSG:4326", "EPSG:3857").to_pandas()
    assert abs(merc.loc[1, "x"] - 1113194.9079327357) < 1e-6  # 10° lon
    back = reproject(rd.from_pandas(merc), "EPSG:3857",
                     "EPSG:4326").to_pandas()
    assert np.allclose(back[["x", "y"]], pts[["x", "y"]], atol=1e-9)
    # auto-harmonize mutates the manifest and reprojects
    prim = TableManifest(crs="EPSG:3857")
    sec = TableManifest(crs="EPSG:4326")
    out = harmonize_crs(prim, ds, sec).to_pandas()
    assert sec.crs == "EPSG:3857"
    assert abs(out.loc[1, "x"] - 1113194.9079327357) < 1e-6
