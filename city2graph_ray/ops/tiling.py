"""Cell-hierarchy operators over the packed grid index — the engine's
H3/S2 parent / k-ring surface (reference has no tiling at all; this is
the scale layer the north rule asks for).

`cell_ring_density` gives every point the total population of its
cell's k-ring: the building block for density screens, hot-core
detection and ring-buffered candidate pruning.  Distributed shape:
one per-cell count (partial-combined keyed sum over ~distinct-cell
rows), a (2k+1)²-way ring explode over the DISTINCT cells only (not
the points), one bucketed join of ring members against the counts,
a per-center re-sum, and one join back to the points on their cell.
Nothing ever shuffles point payloads more than once."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from city2graph_ray import cells, shuffle
from city2graph_ray.joins import bucketed_join


def assign_cells(points: ray.data.Dataset, cell_size: float,
                 x: str = "x", y: str = "y") -> ray.data.Dataset:
    """Append the packed grid ``cell`` id to a point table."""
    def fn(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["cell"] = cells.cell_id(b[x].to_numpy(np.float64),
                                  b[y].to_numpy(np.float64), cell_size)
        return b
    return points.map_batches(fn, batch_format="pandas")


def cell_ring_density(points: ray.data.Dataset, cell_size: float,
                      k: int = 1, factor: int = 4,
                      x: str = "x", y: str = "y", id_col: str = "id",
                      num_buckets: int = shuffle.DEFAULT_BUCKETS,
                      ) -> ray.data.Dataset:
    """Per point: its cell, the ``factor``-coarser parent cell, and the
    total point count within Chebyshev distance ``k`` of its cell
    (including its own).  Output (id, cell, parent, ring_n)."""
    pts = assign_cells(points, cell_size, x=x, y=y).map_batches(
        lambda b: b[[id_col, "cell"]], batch_format="pandas"
    ).materialize()

    counts = shuffle.group_agg(
        pts, ["cell"], {"n": ("cell", "size")},
        num_buckets=num_buckets)

    # SCATTER each occupied cell's count to every cell in its ring
    # (Chebyshev distance is symmetric, so summing received
    # contributions per center equals gathering the center's ring) —
    # one keyed sum instead of a ring⋈counts join plus a re-sum
    def scatter_ring(b: pd.DataFrame) -> pd.DataFrame:
        idx, member = cells.ring_cells(b["cell"].to_numpy(np.int64), k)
        return pd.DataFrame({
            "cell": member,
            "n": b["n"].to_numpy(np.int64)[idx]})

    per_center = shuffle.group_agg(
        counts.map_batches(scatter_ring, batch_format="pandas"),
        ["cell"], {"ring_n": ("n", "sum")}, num_buckets=num_buckets)

    out = bucketed_join(
        pts, per_center, on="cell", num_buckets=num_buckets,
        left_schema=pa.schema([(id_col, pa.int64()),
                               ("cell", pa.int64())]),
        right_schema=pa.schema([("cell", pa.int64()),
                                ("ring_n", pa.int64())]))

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        cell = b["cell"].to_numpy(np.int64)
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(np.int64),
            "cell": cell,
            "parent": cells.parent_cell(cell, factor),
            "ring_n": b["ring_n"].to_numpy(np.int64)})

    return out.map_batches(finish, batch_format="pandas")
