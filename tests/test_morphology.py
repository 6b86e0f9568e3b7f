"""Morphology pipeline: enclosures, zonal tessellation, layer edges."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from city2graph_ray.ops.morphology import (
    enclosures_from_barriers,
    filter_segments_by_cost,
    morphological_graph,
    nearest_segments,
    place_to_place_edges,
    polygonize_faces,
    reachability_costs,
    zonal_tessellation,
)


@pytest.fixture(scope="module")
def street_grid() -> pd.DataFrame:
    """3×3 street grid (lines at 0, 30, 60) → 4 square enclosures."""
    segs = []
    sid = 0
    for v in (0.0, 30.0, 60.0):
        for a, b in [((v, 0.0), (v, 30.0)), ((v, 30.0), (v, 60.0)),
                     ((0.0, v), (30.0, v)), ((30.0, v), (60.0, v))]:
            segs.append((sid, np.array([a[0], a[1], b[0], b[1]])))
            sid += 1
    return pd.DataFrame(segs, columns=["seg_id", "coords"])


@pytest.fixture(scope="module")
def grid_buildings() -> pd.DataFrame:
    """Buildings: two in the SW enclosure, one in NE, none in NW/SE."""
    return pd.DataFrame({
        "id": np.array([1, 2, 3], dtype=np.int64),
        "x": [8.0, 22.0, 45.0],
        "y": [8.0, 22.0, 45.0]})


def test_enclosures(street_grid):
    enc = enclosures_from_barriers(street_grid[["seg_id", "coords"]])
    assert len(enc) == 4
    areas = []
    for ring in enc["coords"]:
        c = np.asarray(ring).reshape(-1, 2)
        areas.append((c[:, 0].max() - c[:, 0].min()) * (c[:, 1].max() - c[:, 1].min()))
    assert all(abs(a - 900.0) < 1e-9 for a in areas)


def test_zonal_tessellation(street_grid, grid_buildings):
    enc = enclosures_from_barriers(street_grid[["seg_id", "coords"]])
    tess = zonal_tessellation(rd.from_pandas(grid_buildings), enc,
                              resolution=3.0).to_pandas()
    # only enclosures containing buildings emit assignments
    assert set(tess["bldg_id"]) == {1, 2, 3}
    # SW enclosure split between buildings 1 and 2; cells near (8,8) → 1
    sw = tess[tess["bldg_id"].isin([1, 2])]
    assert sw["tess_id"].nunique() == 2
    near1 = sw[(sw["cell_ix"] == 2) & (sw["cell_iy"] == 2)]  # cell center (7.5,7.5)
    assert (near1["bldg_id"] == 1).all()
    # every interior cell of an occupied enclosure is assigned exactly once
    assert not tess.duplicated(["enclosure_index", "cell_ix", "cell_iy"]).any()
    # tess_id format "{enclosure}_{rank}"
    assert tess["tess_id"].str.match(r"^\d+_\d+$").all()
    # nearest-seed correctness on a sample
    for _, r in tess.sample(20, random_state=0).iterrows():
        cx, cy = (r.cell_ix + 0.5) * 3.0, (r.cell_iy + 0.5) * 3.0
        d = (grid_buildings["x"] - cx) ** 2 + (grid_buildings["y"] - cy) ** 2
        enc_b = grid_buildings[
            grid_buildings["id"].isin(tess[tess["enclosure_index"]
                                           == r.enclosure_index]["bldg_id"])]
        dd = (enc_b["x"] - cx) ** 2 + (enc_b["y"] - cy) ** 2
        assert enc_b.loc[dd.idxmin(), "id"] == r.bldg_id


def test_place_to_place(street_grid, grid_buildings):
    enc = enclosures_from_barriers(street_grid[["seg_id", "coords"]])
    tess = zonal_tessellation(rd.from_pandas(grid_buildings), enc,
                              resolution=3.0)
    pp = place_to_place_edges(tess).to_pandas()
    # exactly one adjacency: the two places sharing the SW enclosure
    assert len(pp) == 1
    assert (pp["src"] < pp["dst"]).all()


def test_nearest_segments(street_grid):
    pts = pd.DataFrame({"id": np.array([10, 11], np.int64),
                        "x": [5.0, 29.0], "y": [3.0, 45.0]})
    got = nearest_segments(rd.from_pandas(pts), rd.from_pandas(street_grid),
                           max_distance=10.0, k=1).to_pandas()
    got = got.set_index("id")
    # brute force
    from city2graph_ray.geom.kernels import point_segment_dist2
    for _, p in pts.iterrows():
        best, bid = np.inf, None
        for _, s in street_grid.iterrows():
            c = np.asarray(s.coords).reshape(-1, 2)
            for a, b in zip(c[:-1], c[1:]):
                d = float(np.sqrt(point_segment_dist2(
                    np.array([p.x]), np.array([p.y]), a[0], a[1], b[0], b[1])[0]))
                if d < best or (d == best and s.seg_id < bid):
                    best, bid = d, s.seg_id
        assert got.loc[p.id, "seg_id"] == bid
        assert abs(got.loc[p.id, "distance"] - best) < 1e-9


def test_reachability_filter(street_grid):
    from city2graph_ray.geom.kernels import linestring_length
    from city2graph_ray.ops.topology import segments_to_graph
    nodes, edges = segments_to_graph(rd.from_pandas(street_grid))
    edf = edges.to_pandas()
    edf["length"] = [linestring_length(np.asarray(c)) for c in edf["coords"]]
    costs = reachability_costs(edf, (0.0, 0.0), nodes.to_pandas())
    assert costs[min(costs)] == 0.0
    kept = filter_segments_by_cost(
        rd.from_pandas(edf[["seg_id", "src", "dst"]]), costs, 30.0).to_pandas()
    # from corner (0,0) with budget 30: only segments touching a node
    # within cost 30 (the two incident + their continuations at cost 30)
    assert 0 < len(kept) < len(edf)
    kmin = [min(costs[s], costs[d]) for s, d in kept[["src", "dst"]].to_numpy()]
    assert max(kmin) <= 30.0


def test_morphological_graph_composition(street_grid, grid_buildings):
    out = morphological_graph(rd.from_pandas(grid_buildings),
                              rd.from_pandas(street_grid),
                              resolution=3.0, pm_max_distance=20.0)
    tess = out["tessellation"].to_pandas()
    assert len(tess) > 0
    pp = out["place_place"].to_pandas()
    assert len(pp) == 1
    mm = out["movement_movement"].to_pandas()
    assert len(mm) > 0 and (mm["src"] < mm["dst"]).all()
    pm = out["place_movement"].to_pandas()
    assert set(pm["id"]) == {1, 2, 3}  # every building finds a street
