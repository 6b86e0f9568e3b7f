"""Moran's I vs the textbook formula (brute-force loops)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _brute(df: pd.DataFrame) -> tuple:
    cells = list(zip(df["c"], df["r"], df["v"]))
    n = len(cells)
    mean = sum(v for _, _, v in cells) / n
    num = w = 0.0
    for (c1, r1, v1) in cells:
        for (c2, r2, v2) in cells:
            if (c1, r1) != (c2, r2) and abs(c1 - c2) <= 1 \
                    and abs(r1 - r2) <= 1:
                num += (v1 - mean) * (v2 - mean)
                w += 1
    den = sum((v - mean) ** 2 for _, _, v in cells)
    return n, int(w), (n * num) / (w * den)


def test_morans_i_bruteforce_random():
    from city2graph_ray.ops.stats import morans_i
    rng = np.random.default_rng(13)
    cs, rs = np.meshgrid(np.arange(7), np.arange(6))
    df = pd.DataFrame({"c": cs.ravel().astype(np.int64),
                       "r": rs.ravel().astype(np.int64),
                       "v": rng.integers(0, 50, 42).astype(np.int64)})
    # drop some cells -> sparse raster with ragged borders
    df = df[rng.random(42) > 0.2].reset_index(drop=True)
    got = morans_i(rd.from_pandas(df), num_buckets=4)
    n, w, i = _brute(df)
    assert got["n_cells"].iloc[0] == n
    assert got["w_sum"].iloc[0] == w
    assert got["moran_i"].iloc[0] == pytest.approx(i, rel=1e-12)


def test_morans_i_checkerboard_negative_gradient_positive():
    from city2graph_ray.ops.stats import morans_i
    cs, rs = np.meshgrid(np.arange(8), np.arange(8))
    c, r = cs.ravel().astype(np.int64), rs.ravel().astype(np.int64)
    # stripes: under QUEEN weights 6 of 8 interior neighbors disagree
    # (a checkerboard is only weakly negative — diagonals agree)
    stripes = pd.DataFrame({"c": c, "r": r, "v": (c % 2) * 10})
    grad = pd.DataFrame({"c": c, "r": r, "v": c + r})
    i_neg = morans_i(rd.from_pandas(stripes))["moran_i"].iloc[0]
    i_pos = morans_i(rd.from_pandas(grad))["moran_i"].iloc[0]
    assert i_neg < -0.3 and i_pos > 0.3


def test_morans_i_rejects_degenerate():
    from city2graph_ray.ops.stats import morans_i
    df = pd.DataFrame({"c": [0], "r": [0], "v": [5]})
    with pytest.raises(ValueError):
        morans_i(rd.from_pandas(df))


def test_local_morans_i_bruteforce():
    from city2graph_ray.ops.stats import local_morans_i
    rng = np.random.default_rng(29)
    cs, rs = np.meshgrid(np.arange(6), np.arange(5))
    df = pd.DataFrame({"c": cs.ravel().astype(np.int64),
                       "r": rs.ravel().astype(np.int64),
                       "v": rng.integers(0, 40, 30).astype(np.int64)})
    df = df[rng.random(30) > 0.15].reset_index(drop=True)
    got = (local_morans_i(rd.from_pandas(df), num_buckets=4)
           .to_pandas().sort_values(["c", "r"]).reset_index(drop=True))
    n = len(df)
    mean = df["v"].sum() / n
    m2 = ((df["v"] - mean) ** 2).sum() / n
    cells = {(c, r): v for c, r, v in zip(df["c"], df["r"], df["v"])}
    assert len(got) == n
    for _, row in got.iterrows():
        c, r = row["c"], row["r"]
        lag = sum((cells[(c + dc, r + dr)] - mean)
                  for dc in (-1, 0, 1) for dr in (-1, 0, 1)
                  if (dc, dr) != (0, 0) and (c + dc, r + dr) in cells)
        want = (cells[(c, r)] - mean) * lag / m2
        assert row["lisa"] == pytest.approx(want, rel=1e-10, abs=1e-12)


def test_local_morans_i_isolated_cell_zero_lag():
    from city2graph_ray.ops.stats import local_morans_i
    df = pd.DataFrame({"c": np.array([0, 10], np.int64),
                       "r": np.array([0, 10], np.int64),
                       "v": np.array([3, 9], np.int64)})
    got = local_morans_i(rd.from_pandas(df)).to_pandas()
    assert len(got) == 2
    assert (got["lag_z"] == 0).all() and (got["lisa"] == 0).all()


def _brute_geary(df: pd.DataFrame) -> tuple:
    cells = list(zip(df["c"], df["r"], df["v"]))
    n = len(cells)
    mean = sum(v for _, _, v in cells) / n
    num = w = 0.0
    for (c1, r1, v1) in cells:
        for (c2, r2, v2) in cells:
            if (c1, r1) != (c2, r2) and abs(c1 - c2) <= 1 \
                    and abs(r1 - r2) <= 1:
                num += (v1 - v2) ** 2
                w += 1
    den = sum((v - mean) ** 2 for _, _, v in cells)
    return n, int(w), ((n - 1) * num) / (2 * w * den)


def test_gearys_c_bruteforce_random():
    from city2graph_ray.ops.stats import gearys_c
    rng = np.random.default_rng(47)
    cs, rs = np.meshgrid(np.arange(7), np.arange(6))
    df = pd.DataFrame({"c": cs.ravel().astype(np.int64),
                       "r": rs.ravel().astype(np.int64),
                       "v": rng.integers(0, 50, 42).astype(np.int64)})
    df = df[rng.random(42) > 0.2].reset_index(drop=True)
    got = gearys_c(rd.from_pandas(df), num_buckets=4)
    n, w, c_exp = _brute_geary(df)
    assert got["n_cells"].iloc[0] == n
    assert got["w_sum"].iloc[0] == w
    assert got["geary_c"].iloc[0] == pytest.approx(c_exp, rel=1e-12)


def test_gearys_c_gradient_below_one_stripes_above():
    from city2graph_ray.ops.stats import gearys_c
    cs, rs = np.meshgrid(np.arange(8), np.arange(8))
    c, r = cs.ravel().astype(np.int64), rs.ravel().astype(np.int64)
    grad = pd.DataFrame({"c": c, "r": r, "v": c + r})
    stripes = pd.DataFrame({"c": c, "r": r, "v": (c % 2) * 10})
    c_grad = gearys_c(rd.from_pandas(grad))["geary_c"].iloc[0]
    c_str = gearys_c(rd.from_pandas(stripes))["geary_c"].iloc[0]
    assert c_grad < 0.7 and c_str > 1.2


def test_join_counts_bruteforce():
    from city2graph_ray.ops.stats import join_counts
    rng = np.random.default_rng(11)
    cs, rs = np.meshgrid(np.arange(8), np.arange(7))
    df = pd.DataFrame({"c": cs.ravel().astype(np.int64),
                       "r": rs.ravel().astype(np.int64),
                       "v": rng.integers(0, 2, 56).astype(np.int64)})
    df = df[rng.random(56) > 0.2].reset_index(drop=True)
    got = join_counts(rd.from_pandas(df), num_buckets=4)
    cells = list(zip(df["c"], df["r"], df["v"]))
    bb = ww = bw = w = 0
    for i, (c1, r1, v1) in enumerate(cells):
        for (c2, r2, v2) in cells[i + 1:]:
            if abs(c1 - c2) <= 1 and abs(r1 - r2) <= 1:
                w += 1
                if v1 and v2:
                    bb += 1
                elif not v1 and not v2:
                    ww += 1
                else:
                    bw += 1
    row = got.iloc[0]
    assert row["n_cells"] == len(cells)
    assert row["n_black"] == df["v"].sum()
    assert (row["w_pairs"], row["bb"], row["ww"], row["bw"]) == (w, bb, ww, bw)
    assert row["bb"] + row["ww"] + row["bw"] == row["w_pairs"]


def test_join_counts_rejects_nonbinary():
    from city2graph_ray.ops.stats import join_counts
    df = pd.DataFrame({"c": np.array([0, 1], np.int64),
                       "r": np.array([0, 0], np.int64),
                       "v": np.array([0, 2], np.int64)})
    with pytest.raises(Exception):
        join_counts(rd.from_pandas(df))


def test_general_g_bruteforce():
    from city2graph_ray.ops.stats import general_g
    rng = np.random.default_rng(53)
    cs, rs = np.meshgrid(np.arange(7), np.arange(6))
    df = pd.DataFrame({"c": cs.ravel().astype(np.int64),
                       "r": rs.ravel().astype(np.int64),
                       "v": rng.integers(0, 30, 42).astype(np.int64)})
    df = df[rng.random(42) > 0.2].reset_index(drop=True)
    got = general_g(rd.from_pandas(df), num_buckets=4)
    cells = list(zip(df["c"], df["r"], df["v"]))
    num = w = 0
    for (c1, r1, v1) in cells:
        for (c2, r2, v2) in cells:
            if (c1, r1) != (c2, r2) and abs(c1 - c2) <= 1 \
                    and abs(r1 - r2) <= 1:
                num += v1 * v2
                w += 1
    sx = sum(v for _, _, v in cells)
    den = sx * sx - sum(v * v for _, _, v in cells)
    row = got.iloc[0]
    assert (row["n_cells"], row["w_sum"]) == (len(cells), w)
    assert (row["g_num"], row["g_den"]) == (num, den)
    assert row["general_g"] == pytest.approx(num / den, rel=1e-15)


def test_bivariate_morans_bruteforce():
    import ray.data as rd

    from city2graph_ray.ops.stats import bivariate_morans
    rng = np.random.default_rng(47)
    cells = sorted({(int(rng.integers(0, 8)), int(rng.integers(0, 8)))
                    for _ in range(40)})
    vx = rng.integers(0, 50, len(cells))
    vy = rng.integers(0, 50, len(cells))
    df = pd.DataFrame({"c": [c for c, _ in cells],
                       "r": [r for _, r in cells],
                       "vx": vx, "vy": vy})
    out = bivariate_morans(rd.from_pandas(df).repartition(3))
    n = len(df)
    zx = n * vx - vx.sum()
    zy = n * vy - vy.sum()
    num = w = 0
    for i, (ci, ri) in enumerate(cells):
        for j, (cj, rj) in enumerate(cells):
            if i != j and abs(ci - cj) <= 1 and abs(ri - rj) <= 1:
                num += int(zx[i]) * int(zy[j])
                w += 1
    want = (n * num) / (w * np.sqrt(float((zx.astype(object)**2).sum())
                                    * float((zy.astype(object)**2)
                                            .sum())))
    assert int(out["n_cells"].iloc[0]) == n
    assert int(out["w_sum"].iloc[0]) == w
    assert abs(out["moran_xy"].iloc[0] - want) < 1e-9
