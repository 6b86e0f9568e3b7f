"""segment_intersections: proper-crossing join vs brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from city2graph_ray.ops.segments import segment_intersections


def _brute(df: pd.DataFrame) -> pd.DataFrame:
    P = df[["ax", "ay", "bx", "by"]].to_numpy(np.float64)
    ids = df["seg_id"].to_numpy(np.int64)
    rows = []
    for i in range(len(df)):
        for j in range(i + 1, len(df)):
            ax, ay, bx, by = P[i]
            cx, cy, dx, dy = P[j]
            d1 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            d2 = (bx - ax) * (dy - ay) - (by - ay) * (dx - ax)
            d3 = (dx - cx) * (ay - cy) - (dy - cy) * (ax - cx)
            d4 = (dx - cx) * (by - cy) - (dy - cy) * (bx - cx)
            if d1 * d2 < 0 and d3 * d4 < 0:
                t = ((cx - ax) * (dy - cy) - (cy - ay) * (dx - cx)) / \
                    ((bx - ax) * (dy - cy) - (by - ay) * (dx - cx))
                a, b = sorted((ids[i], ids[j]))
                rows.append((a, b, ax + t * (bx - ax), ay + t * (by - ay)))
    return (pd.DataFrame(rows, columns=["seg_a", "seg_b", "px", "py"])
            .sort_values(["seg_a", "seg_b"]).reset_index(drop=True))


def _run(df: pd.DataFrame, cell_size: float) -> pd.DataFrame:
    ds = ray.data.from_pandas(df).repartition(5)
    out = segment_intersections(ds, cell_size, num_buckets=4).to_pandas()
    return out.sort_values(["seg_a", "seg_b"]).reset_index(drop=True)


def _random_segs(n: int, seed: int, span: float = 8.0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    mid = rng.uniform(0, 100, (n, 2))
    d = rng.uniform(-span, span, (n, 2))
    return pd.DataFrame({
        "seg_id": np.arange(n, dtype=np.int64),
        "ax": mid[:, 0] - d[:, 0], "ay": mid[:, 1] - d[:, 1],
        "bx": mid[:, 0] + d[:, 0], "by": mid[:, 1] + d[:, 1]})


def test_matches_bruteforce_across_cell_sizes():
    df = _random_segs(180, seed=7)
    want = _brute(df)
    assert len(want) > 20  # fixture must actually cross
    for cs in (2.0, 7.5, 40.0, 1000.0):  # smaller AND larger than segs
        got = _run(df, cs)
        assert got["seg_a"].tolist() == want["seg_a"].tolist(), cs
        assert got["seg_b"].tolist() == want["seg_b"].tolist(), cs
        assert np.array_equal(got["px"].to_numpy(), want["px"].to_numpy())
        assert np.array_equal(got["py"].to_numpy(), want["py"].to_numpy())


def test_touches_and_collinear_excluded():
    df = pd.DataFrame({
        "seg_id": np.arange(7, dtype=np.int64),
        #      X-cross      shared-endpt  T-touch      collinear overlap
        "ax": [0.0, 0.0,    10.0, 12.0,   20.0, 21.0,  30.0],
        "ay": [0.0, 2.0,    10.0, 12.0,   20.0, 20.0,  30.0],
        "bx": [2.0, 2.0,    12.0, 14.0,   22.0, 21.0,  34.0],
        "by": [2.0, 0.0,    12.0, 10.0,   20.0, 22.0,  30.0],
    })
    # collinear partner overlapping seg 6
    df = pd.concat([df, pd.DataFrame({
        "seg_id": [7], "ax": [32.0], "ay": [30.0],
        "bx": [36.0], "by": [30.0]})], ignore_index=True)
    out = _run(df, 5.0)
    assert out[["seg_a", "seg_b"]].values.tolist() == [[0, 1]]
    # crossing point of the X is (1,1)
    assert out["px"].iloc[0] == 1.0 and out["py"].iloc[0] == 1.0


def test_empty_and_single_inputs():
    empty = pd.DataFrame({"seg_id": pd.Series(dtype=np.int64),
                          "ax": pd.Series(dtype=np.float64),
                          "ay": pd.Series(dtype=np.float64),
                          "bx": pd.Series(dtype=np.float64),
                          "by": pd.Series(dtype=np.float64)})
    out = segment_intersections(ray.data.from_pandas(empty), 5.0,
                                num_buckets=2)
    assert out.count() == 0
    one = pd.DataFrame({"seg_id": [1], "ax": [0.0], "ay": [0.0],
                        "bx": [1.0], "by": [1.0]})
    out1 = segment_intersections(ray.data.from_pandas(one), 5.0,
                                 num_buckets=2)
    assert out1.count() == 0


def test_densify_segments_geometry():
    import ray.data as rd
    from city2graph_ray.ops.segments import densify_segments
    segs = pd.DataFrame({
        "seg_id": np.array([1, 2, 3], np.int64),
        "ax": [0.0, 5.0, 2.0], "ay": [0.0, 5.0, 3.0],
        "bx": [10.0, 5.0, 2.0], "by": [0.0, 9.0, 3.0]})
    out = (densify_segments(rd.from_pandas(segs), 2.0)
           .to_pandas().sort_values(["seg_id", "i"]).reset_index(drop=True))
    # seg 1: len 10, spacing 2 -> i=0..5, x = 0,2,..,10
    s1 = out[out["seg_id"] == 1]
    assert s1["i"].tolist() == list(range(6))
    assert np.allclose(s1["px"], [0, 2, 4, 6, 8, 10])
    assert np.allclose(s1["py"], 0.0)
    # seg 2: vertical len 4 -> i=0..2 at y=5,7,9
    s2 = out[out["seg_id"] == 2]
    assert np.allclose(s2["py"], [5, 7, 9]) and np.allclose(s2["px"], 5.0)
    # seg 3: zero length -> single point i=0
    s3 = out[out["seg_id"] == 3]
    assert len(s3) == 1 and s3["i"].iloc[0] == 0
    assert s3["px"].iloc[0] == 2.0 and s3["py"].iloc[0] == 3.0


def test_densify_segments_guard():
    import pytest as _pytest
    import ray.data as rd
    from city2graph_ray.ops.segments import densify_segments
    segs = pd.DataFrame({
        "seg_id": np.array([1], np.int64),
        "ax": [0.0], "ay": [0.0], "bx": [1e9], "by": [0.0]})
    with _pytest.raises(Exception):
        densify_segments(rd.from_pandas(segs), 1.0,
                         max_points_per_seg=100).to_pandas()


def test_orientation_histogram_boundaries():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from city2graph_ray.ops.segments import orientation_histogram

    # one segment per boundary/interior angle + a zero-length row
    segs = pd.DataFrame({
        "sx": [0.0] * 9, "sy": [0.0] * 9,
        "dx_": [1.0, 2.0, 1.0, 0.5, 0.0, -0.5, -1.0, -2.0, 0.0],
        "dy_": [0.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.0]})
    # angles: 0(b0), ~26(b0), 45(b1), ~63(b1), 90(b2), ~117(b2),
    # 135(b3), ~153(b3), degenerate (dropped)
    out = (orientation_histogram(rd.from_pandas(segs), num_buckets=2)
           .to_pandas().sort_values("bin").reset_index(drop=True))
    assert out["bin"].tolist() == [0, 1, 2, 3]
    assert out["n"].tolist() == [2, 2, 2, 2]

    # reversed segments land in the same undirected bin
    rev = segs.copy()
    rev[["sx", "dx_"]] = segs[["dx_", "sx"]].to_numpy()
    rev[["sy", "dy_"]] = segs[["dy_", "sy"]].to_numpy()
    out2 = (orientation_histogram(rd.from_pandas(rev), num_buckets=2)
            .to_pandas().sort_values("bin").reset_index(drop=True))
    assert out2["n"].tolist() == out["n"].tolist()


def test_strokes_chain_and_branch():
    import ray.data as rd

    from city2graph_ray.ops.segments import strokes
    # collinear chain 1-2-3 (merges into one stroke) plus a
    # perpendicular spur at the middle node (stays separate), and an
    # isolated far-away segment (self-stroke)
    segs = pd.DataFrame({
        "seg_id": np.array([10, 20, 30, 40, 50], np.int64),
        "ax": np.array([0, 100, 200, 100, 900], np.int64),
        "ay": np.array([0, 0, 0, 0, 900], np.int64),
        "bx": np.array([100, 200, 300, 100, 950], np.int64),
        "by": np.array([0, 0, 0, 80, 990], np.int64)})
    out = (strokes(rd.from_pandas(segs).repartition(2), num_buckets=4)
           .to_pandas().set_index("seg_id")["stroke"])
    assert out.loc[10] == out.loc[20] == out.loc[30] == 10
    assert out.loc[40] == 40
    assert out.loc[50] == 50


def test_strokes_best_continuation_picks_straightest():
    import ray.data as rd

    from city2graph_ray.ops.segments import strokes
    # two continuations at a node: nearly straight (wins) vs 40-degree
    segs = pd.DataFrame({
        "seg_id": np.array([1, 2, 3], np.int64),
        "ax": np.array([0, 100, 100], np.int64),
        "ay": np.array([0, 0, 0], np.int64),
        "bx": np.array([100, 200, 180], np.int64),
        "by": np.array([0, 5, 70], np.int64)})
    out = (strokes(rd.from_pandas(segs), num_buckets=4)
           .to_pandas().set_index("seg_id")["stroke"])
    assert out.loc[1] == out.loc[2] == 1
    assert out.loc[3] == 3


def test_strokes_negative_and_huge_coords():
    """ADVICE r3: packed node keys collided for negative / >=2^20
    coords; the pair-keyed grouping must treat such nodes as distinct.
    Chain crossing the origin merges; a distinct far node whose packed
    key would collide with (0,0) under nx*(1<<20)+ny stays separate."""
    import ray.data as rd

    from city2graph_ray.ops.segments import strokes

    big = np.int64(1) << 21
    segs = pd.DataFrame({
        "seg_id": np.array([1, 2, 3, 4], np.int64),
        "ax": np.array([-100, 0, big, big + 100], np.int64),
        "ay": np.array([-100, 0, -big * (1 << 20), 0], np.int64),
        "bx": np.array([0, 100, big + 100, big + 200], np.int64),
        "by": np.array([0, 100, 0, -100], np.int64)})
    # node (big+100, 0): segs 3-4 meet at ~135 deg -> no continuation
    # (dot>0 for seg3 reversed? ensure simple: they meet but bend 90)
    out = (strokes(rd.from_pandas(segs).repartition(2), num_buckets=4)
           .to_pandas().set_index("seg_id")["stroke"].sort_index())
    # diagonal chain through origin merges
    assert out.loc[1] == out.loc[2] == 1
    # segs 3/4 share node (big+100, 0) and continue straight-ish?
    # seg3 dir (100, big*2^20) is near-vertical; seg4 dir (100,-100):
    # deflection > 45 deg, so no merge — each self-labels
    assert out.loc[3] == 3
    assert out.loc[4] == 4
