"""HyperLogLog: error bound vs exact, determinism across block layouts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def _data(n=20000, groups=4, card=3000, seed=5):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "g": rng.integers(0, groups, n).astype(np.int64),
        "v": rng.integers(0, card, n).astype(np.int64)})


def test_hll_error_bound():
    from city2graph_ray.ops.sketch import hll_count_distinct
    df = _data()
    out = (hll_count_distinct(rd.from_pandas(df), ["g"], "v",
                              precision=12).to_pandas()
           .set_index("g")["approx_distinct"])
    exact = df.groupby("g")["v"].nunique()
    for g in exact.index:
        rel = abs(out[g] - exact[g]) / exact[g]
        assert rel < 0.05, (g, out[g], exact[g])  # 3× the 1.6% std err


def test_hll_deterministic_across_layouts():
    from city2graph_ray.ops.sketch import hll_count_distinct
    df = _data()
    a = (hll_count_distinct(rd.from_pandas(df).repartition(2),
                            ["g"], "v").to_pandas()
         .sort_values("g").reset_index(drop=True))
    b = (hll_count_distinct(rd.from_pandas(df).repartition(13),
                            ["g"], "v").to_pandas()
         .sort_values("g").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_hll_string_values_and_small_range():
    from city2graph_ray.ops.sketch import hll_count_distinct
    df = pd.DataFrame({"g": np.zeros(100, dtype=np.int64),
                       "v": [f"user_{i % 7}" for i in range(100)]})
    out = hll_count_distinct(rd.from_pandas(df), ["g"], "v").to_pandas()
    # linear-counting regime: tiny cardinalities are near-exact
    assert int(out["approx_distinct"].iloc[0]) == 7


def test_count_min_heavy_hitters():
    """CM top-k matches the exact top-k on a zipf-ish corpus and is
    deterministic across block layouts; estimates upper-bound truth."""
    from city2graph_ray.ops.sketch import count_min_heavy_hitters
    rng = np.random.default_rng(9)
    vals = rng.zipf(1.5, 30000)
    vals = vals[vals < 1000].astype(np.int64)
    df = pd.DataFrame({"v": vals})
    out = count_min_heavy_hitters(rd.from_pandas(df).repartition(7),
                                  "v", k=10)
    exact = df["v"].value_counts()
    assert list(out["value"].astype(int)) == list(exact.head(10).index)
    for _, r in out.iterrows():
        true = int(exact[int(r["value"])])
        assert true <= r["approx_count"] <= true * 1.02
    out2 = count_min_heavy_hitters(rd.from_pandas(df).repartition(3),
                                   "v", k=10)
    pd.testing.assert_frame_equal(out, out2)


def test_quantile_sketch_rank_error_bound():
    import ray.data as rd

    from city2graph_ray.ops.sketch import quantile_sketch
    rng = np.random.default_rng(53)
    vals = np.round(rng.lognormal(3, 1, 40_000), 2)
    df = pd.DataFrame({"v": vals})
    out = quantile_sketch(rd.from_pandas(df).repartition(16), "v",
                          qs=(0.1, 0.5, 0.9), k=256)
    sorted_vals = np.sort(np.floor(vals * 100 + 0.5)) / 100
    n = len(sorted_vals)
    for _, r in out.iterrows():
        got = r["value"]
        # rank of the returned value must be within 2% of target
        lo = np.searchsorted(sorted_vals, got, side="left")
        hi = np.searchsorted(sorted_vals, got, side="right")
        target = r["q"] * n
        assert lo - 0.02 * n <= target <= hi + 0.02 * n


def test_quantile_sketch_exact_when_small():
    import ray.data as rd

    from city2graph_ray.ops.sketch import quantile_sketch
    vals = np.arange(1, 101, dtype=np.float64)
    out = quantile_sketch(
        rd.from_pandas(pd.DataFrame({"v": vals})).repartition(3), "v",
        qs=(0.5,), k=256)
    # below 2k items nothing compacts: the sketch is exact
    assert abs(out["value"].iloc[0] - 50.0) <= 1.0


def test_quantile_sketch_deterministic_same_layout():
    import ray.data as rd

    from city2graph_ray.ops.sketch import quantile_sketch
    rng = np.random.default_rng(7)
    df = pd.DataFrame({"v": rng.normal(100, 20, 20_000)})
    a = quantile_sketch(rd.from_pandas(df).repartition(8), "v", k=128)
    b = quantile_sketch(rd.from_pandas(df).repartition(8), "v", k=128)
    pd.testing.assert_frame_equal(a, b)
