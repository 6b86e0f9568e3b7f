"""Cell hierarchy (parent / k-ring) and the ring-density operator."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from city2graph_ray import cells
from tests.conftest import SF_DIR


def test_parent_cell_matches_floor_division():
    rng = np.random.default_rng(3)
    ix = rng.integers(-5000, 5000, 500)
    iy = rng.integers(-5000, 5000, 500)
    cell = cells.pack(ix, iy)
    for f in (2, 4, 64):
        got_ix, got_iy = cells.cell_xy(cells.parent_cell(cell, f))
        assert (got_ix == ix // f).all()  # numpy floor-div reference
        assert (got_iy == iy // f).all()


def test_parent_cell_rejects_non_divisor():
    import pytest
    with pytest.raises(ValueError):
        cells.parent_cell(np.array([0]), 3)


def test_ring_cells_covers_chebyshev_ball():
    cell = cells.pack(np.array([10, -7]), np.array([-2, 30]))
    for k in (1, 2):
        idx, members = cells.ring_cells(cell, k)
        assert len(members) == 2 * (2 * k + 1) ** 2
        d = cells.cell_chebyshev(cell[idx], members)
        assert (d <= k).all()
        # each ring is exactly the distinct Chebyshev ball
        for i in (0, 1):
            ring_i = set(members[idx == i].tolist())
            assert len(ring_i) == (2 * k + 1) ** 2


def test_cell_ring_density_matches_brute_force():
    from city2graph_ray.ops.tiling import cell_ring_density
    from city2graph_ray.pipelines.tables import customer_points

    out = (cell_ring_density(customer_points(SF_DIR), 64.0, k=1,
                             factor=4, num_buckets=8)
           .to_pandas().sort_values("id").reset_index(drop=True))
    pts = customer_points(SF_DIR).to_pandas()
    cell = cells.cell_id(pts["x"].to_numpy(), pts["y"].to_numpy(), 64.0)
    counts = pd.Series(cell).value_counts()
    ix, iy = cells.cell_xy(cell)
    want_ring = np.zeros(len(pts), np.int64)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            nb = cells.pack(ix + dx, iy + dy)
            want_ring += counts.reindex(nb).fillna(0).to_numpy(np.int64)
    want = pd.DataFrame({"id": pts["id"].to_numpy(np.int64),
                         "cell": cell,
                         "parent": cells.parent_cell(cell, 4),
                         "ring_n": want_ring}).sort_values("id")
    assert len(out) == len(pts)
    for c in ["id", "cell", "parent", "ring_n"]:
        assert out[c].tolist() == want[c].tolist(), c


def test_bucketed_join_padded_bigint_survives_exchange():
    """Regression: null-padded int64 columns used to roundtrip through
    pandas inside Ray's groupby exchange, promoting to float64 and
    rounding values above 2^53 (packed cell ids).  Padding is now
    typed zeros; big ids must survive bit-exact through a join whose
    other side lacks the column."""
    from city2graph_ray.joins import bucketed_join

    base = np.int64(2305843009213693952)  # 2^61
    k = np.arange(2000, dtype=np.int64)
    left = pd.DataFrame({"big": base + k, "key": k % 97})
    right = pd.DataFrame({"key": np.arange(97, dtype=np.int64),
                          "v": np.arange(97, dtype=np.int64)})
    j = bucketed_join(
        rd.from_pandas(left).repartition(8),
        rd.from_pandas(right).repartition(4),
        on="key", num_buckets=16,
        left_schema=pa.schema([("big", pa.int64()),
                               ("key", pa.int64())]),
        right_schema=pa.schema([("key", pa.int64()),
                                ("v", pa.int64())])).to_pandas()
    assert len(j) == 2000
    assert set(j["big"]) == set((base + k).tolist())
