"""Cell index, halo assignment, hot-cell salting, skewed-input behavior."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from city2graph_ray import cells


def test_cell_roundtrip():
    x = np.array([-100.0, 0.0, 55.5, 999.9])
    y = np.array([3.2, -7.0, 0.0, 1234.5])
    c = cells.cell_id(x, y, 10.0)
    ix, iy = cells.cell_xy(c)
    np.testing.assert_array_equal(ix, np.floor(x / 10.0))
    np.testing.assert_array_equal(iy, np.floor(y / 10.0))
    np.testing.assert_array_equal(cells.pack(ix, iy), c)


def test_halo_assignments_cover_radius():
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 100, 500)
    y = rng.uniform(0, 100, 500)
    cs, halo = 20.0, 7.0
    rows, cell, is_halo = cells.halo_assignments(x, y, cs, halo)
    # every point within `halo` of a neighboring cell is duplicated there
    for i in range(0, 500, 37):
        home = cells.cell_id(np.array([x[i]]), np.array([y[i]]), cs)[0]
        assigned = set(cell[rows == i].tolist())
        assert home in assigned
        # check the 4-neighbor duplication rule directly
        ix, iy = int(np.floor(x[i] / cs)), int(np.floor(y[i] / cs))
        if x[i] - ix * cs < halo:
            assert int(cells.pack(np.array([ix - 1]), np.array([iy]))[0]) in assigned
        if (ix + 1) * cs - x[i] <= halo:
            assert int(cells.pack(np.array([ix + 1]), np.array([iy]))[0]) in assigned


def test_covering_cells():
    rows, cc = cells.covering_cells(np.array([5.0]), np.array([5.0]),
                                    np.array([25.0]), np.array([15.0]), 10.0)
    assert len(cc) == 3 * 2  # x cells 0,1,2 × y cells 0,1
    assert (rows == 0).all()


def test_hot_cell_salting():
    counts = {1: 100, 2: 5000, 3: 20}
    hot = cells.hot_cells(counts, threshold=1000)
    assert hot == {2}
    cell = np.array([1, 2, 2, 2, 3], dtype=np.int64)
    h = np.array([10, 11, 12, 13, 14], dtype=np.uint64)
    salt = cells.salt_for(cell, h, hot, k=4)
    assert salt[0] == 0 and salt[4] == 0          # cold cells unsalted
    assert set(salt[1:4]) <= {0, 1, 2, 3}          # hot rows spread over k
    assert len(set(salt[1:4])) > 1


def test_fixed_radius_on_skewed_cluster():
    """Zipfian hot spot: 1500 points in a 5×5 box + 500 uniform.
    Correctness must hold regardless of the skew (the hot cell is just
    a bigger tile kernel)."""
    from city2graph_ray.ops.proximity import fixed_radius_graph
    rng = np.random.default_rng(9)
    hot = rng.uniform(0, 5, (1500, 2))
    cold = rng.uniform(0, 500, (500, 2))
    pts = np.vstack([hot, cold])
    df = pd.DataFrame({"id": np.arange(len(pts), dtype=np.int64),
                       "x": pts[:, 0], "y": pts[:, 1]})
    r = 2.0
    got = fixed_radius_graph(rd.from_pandas(df), r).to_pandas()
    d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
    ii, jj = np.nonzero((d <= r) & (np.arange(len(pts))[:, None]
                                    < np.arange(len(pts))[None, :]))
    assert len(got) == len(ii)
    got_set = set(map(tuple, got[["src", "dst"]].to_numpy()))
    assert got_set == set(zip(ii, jj))


def test_fixed_radius_auto_skew_exact():
    """auto_skew shrinks the grid for a Zipfian hot spot but results
    stay exact."""
    from city2graph_ray.ops.proximity import fixed_radius_graph
    rng = np.random.default_rng(11)
    hot = rng.uniform(0, 4, (1200, 2))
    cold = rng.uniform(0, 400, (300, 2))
    pts = np.vstack([hot, cold])
    df = pd.DataFrame({"id": np.arange(len(pts), dtype=np.int64),
                       "x": pts[:, 0], "y": pts[:, 1]})
    r = 1.5
    got = fixed_radius_graph(rd.from_pandas(df), r, auto_skew=True,
                             hot_cell_threshold=200).to_pandas()
    d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
    ii, jj = np.nonzero((d <= r) & (np.arange(len(pts))[:, None]
                                    < np.arange(len(pts))[None, :]))
    assert len(got) == len(ii)


def test_shuffle_primitives_last_and_count_distinct():
    from city2graph_ray import shuffle
    df = pd.DataFrame({"k": [1, 1, 1, 2, 2],
                       "v": ["a", "b", "a", "c", "c"],
                       "seq": [0, 1, 2, 3, 4]})
    ds = rd.from_pandas(df)
    last = shuffle.last_by(ds, ["k"], "seq").to_pandas()
    got = dict(zip(last["k"], last["seq"]))
    assert got == {1: 2, 2: 4}
    cd = shuffle.count_distinct(ds, ["k"], "v", out_col="n").to_pandas()
    got = dict(zip(cd["k"], cd["n"]))
    assert got == {1: 2, 2: 1}
