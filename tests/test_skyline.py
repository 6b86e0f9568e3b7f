"""skyline2d vs brute-force O(n^2) dominance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from city2graph_ray.ops.skyline import skyline2d


def brute(df, x, y, x_dir, y_dir):
    sx = -1 if x_dir == "max" else 1
    sy = -1 if y_dir == "max" else 1
    xa = df[x].to_numpy()
    ya = df[y].to_numpy()
    if xa.dtype.kind == "M":
        xa = xa.view("i8")
    if ya.dtype.kind == "M":
        ya = ya.view("i8")
    xa, ya = sx * xa, sy * ya
    keep = []
    for i in range(len(df)):
        dominated = np.any((xa <= xa[i]) & (ya <= ya[i])
                           & ((xa < xa[i]) | (ya < ya[i])))
        keep.append(not dominated)
    return df[np.array(keep)]


@pytest.mark.parametrize("x_dir,y_dir", [("min", "min"), ("min", "max"),
                                         ("max", "max")])
def test_skyline_matches_bruteforce(x_dir, y_dir):
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "id": np.arange(500),
        "x": rng.integers(0, 60, 500).astype(np.int64),
        "y": np.round(rng.normal(0, 10, 500), 2)})
    got = skyline2d(rd.from_pandas(df).repartition(7), "x", "y",
                    x_dir, y_dir).to_pandas()
    want = brute(df, "x", "y", x_dir, y_dir)
    assert sorted(got["id"]) == sorted(want["id"])


def test_skyline_duplicates_and_datetime():
    # duplicate frontier points all survive; datetime dimension works
    ts = pd.to_datetime(["2024-01-01", "2024-01-01", "2024-01-03",
                         "2024-01-02", "2024-01-04"])
    df = pd.DataFrame({"id": [1, 2, 3, 4, 5],
                       "ts": ts,
                       "v": [5.0, 5.0, 1.0, 9.0, 0.5]})
    got = skyline2d(rd.from_pandas(df).repartition(3), "ts", "v"
                    ).to_pandas()
    want = brute(df, "ts", "v", "min", "min")
    assert sorted(got["id"]) == sorted(want["id"])
    assert {1, 2}.issubset(set(got["id"]))


def test_skyline_empty_and_single():
    df = pd.DataFrame({"x": pd.Series(dtype=np.int64),
                       "y": pd.Series(dtype=np.float64)})
    out = skyline2d(rd.from_pandas(df), "x", "y")
    assert out.count() == 0
    one = pd.DataFrame({"x": [3], "y": [4.0]})
    assert skyline2d(rd.from_pandas(one), "x", "y").count() == 1
    with pytest.raises(ValueError):
        skyline2d(rd.from_pandas(one), "x", "y", x_dir="up")
