"""dwithin_point_segment_join vs brute clamped-foot distances."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from city2graph_ray.ops.proximity import dwithin_point_segment_join


def _brute(pts: pd.DataFrame, segs: pd.DataFrame, d: float) -> pd.DataFrame:
    rows = []
    for p in pts.itertuples(index=False):
        for s in segs.itertuples(index=False):
            ll = (s.bx - s.ax) ** 2 + (s.by - s.ay) ** 2
            t = ((p.x - s.ax) * (s.bx - s.ax)
                 + (p.y - s.ay) * (s.by - s.ay)) / ll
            t = min(max(t, 0.0), 1.0)
            fx, fy = s.ax + t * (s.bx - s.ax), s.ay + t * (s.by - s.ay)
            dist = np.sqrt((p.x - fx) ** 2 + (p.y - fy) ** 2)
            if dist <= d:
                rows.append((p.id, s.seg_id, dist))
    return (pd.DataFrame(rows, columns=["id", "seg_id", "distance"])
            .sort_values(["id", "seg_id"]).reset_index(drop=True))


def test_matches_bruteforce_across_cell_sizes():
    rng = np.random.default_rng(11)
    n = 150
    pts = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                        "x": rng.uniform(0, 80, n),
                        "y": rng.uniform(0, 80, n)})
    m = 120
    ax = rng.uniform(0, 80, m)
    ay = rng.uniform(0, 80, m)
    segs = pd.DataFrame({"seg_id": np.arange(m, dtype=np.int64),
                         "ax": ax, "ay": ay,
                         "bx": ax + rng.uniform(0.5, 6, m),
                         "by": ay + rng.uniform(-6, 6, m)})
    want = _brute(pts, segs, 3.0)
    assert len(want) > 30
    for cs in (2.0, 12.0, 500.0):
        got = dwithin_point_segment_join(
            ray.data.from_pandas(pts).repartition(4),
            ray.data.from_pandas(segs).repartition(3),
            3.0, cell_size=cs, num_buckets=4).to_pandas()
        got = got.sort_values(["id", "seg_id"]).reset_index(drop=True)
        assert got["id"].tolist() == want["id"].tolist(), cs
        assert got["seg_id"].tolist() == want["seg_id"].tolist(), cs
        assert np.array_equal(got["distance"].to_numpy(),
                              want["distance"].to_numpy()), cs


def test_endpoint_clamp_and_empty():
    # point beyond the segment end: distance is to the endpoint
    pts = pd.DataFrame({"id": np.array([1], np.int64),
                        "x": [13.0], "y": [4.0]})
    segs = pd.DataFrame({"seg_id": np.array([7], np.int64),
                         "ax": [0.0], "ay": [0.0],
                         "bx": [10.0], "by": [0.0]})
    out = dwithin_point_segment_join(
        ray.data.from_pandas(pts), ray.data.from_pandas(segs),
        6.0, num_buckets=2).to_pandas()
    assert len(out) == 1
    assert out["distance"].iloc[0] == 5.0  # hypot(3, 4)
    far = dwithin_point_segment_join(
        ray.data.from_pandas(pts), ray.data.from_pandas(segs),
        1.0, num_buckets=2)
    assert far.count() == 0
