"""Fused halo-assignment + hash-partition exchange for cell-keyed
spatial kernels.

``Dataset.groupby(cell).map_groups(kernel)`` expresses the semantics,
but Ray Data's sort-based shuffle costs a sample pass + global sort and
is latency-bound at interactive sizes (BASELINE.md).  This module is
the measured fast path (×1.5–2 at both 8 and 32 CPUs on the radius
suite, identical outputs): a classic two-stage map/reduce exchange as
plain Ray tasks —

  map:    per input block, halo-assign rows to cells and hash-split
          into P shards (fused: the expanded table never exists whole),
  reduce: per partition, concatenate its shards and run the per-cell
          kernel; results re-enter Ray Data via ``from_arrow_refs``.

Pure tasks, no shared mutable state: lineage-based fault tolerance and
object-store spilling still apply.  The Dataset groupby path remains
available on every operator (``strategy="groupby"``) and is what the
correctness tests cross-check against.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from city2graph_ray import cells


def _num_partitions() -> int:
    try:
        return max(8, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 16


@ray.remote
def _split_halo(tbl: pa.Table, cell_size: float, halo: float,
                num_partitions: int, extra_cols: tuple) -> list:
    df = tbl.to_pandas()
    rows, cell, is_halo = cells.halo_assignments(
        df["x"].to_numpy(), df["y"].to_numpy(), cell_size, halo)
    out = pd.DataFrame({"id": df["id"].to_numpy()[rows],
                        "x": df["x"].to_numpy()[rows],
                        "y": df["y"].to_numpy()[rows]})
    for c in extra_cols:
        out[c] = df[c].to_numpy()[rows]
    out["cell"] = cell
    out["is_halo"] = is_halo
    part = ((cell.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            >> np.uint64(40)).astype(np.int64) % num_partitions
    return [pa.Table.from_pandas(out[part == p], preserve_index=False)
            for p in range(num_partitions)]


@ray.remote
def _reduce_cells(kernel: Callable, *shards) -> pa.Table:
    df = pa.concat_tables(shards).to_pandas()
    outs = []
    for _, g in df.groupby("cell", sort=False):
        r = kernel(g)
        if r is not None and len(r):
            outs.append(r)
    if not outs:
        return pa.Table.from_pandas(kernel(df.iloc[0:0]),
                                    preserve_index=False)
    return pa.Table.from_pandas(pd.concat(outs), preserve_index=False)


def cell_halo_exchange(
    points: ray.data.Dataset,
    cell_size: float,
    halo: float,
    kernel: Callable[[pd.DataFrame], pd.DataFrame],
    extra_cols: tuple = (),
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Run ``kernel`` over every cell group of the halo-expanded points.

    Exactly equivalent to
    ``expand_halo(points, cell_size, halo).groupby("cell").map_groups(kernel)``
    (the kernel sees one cell's rows: id, x, y, *extra_cols, cell,
    is_halo), executed as the fused map/reduce exchange."""
    P = num_partitions or _num_partitions()
    refs = points.to_arrow_refs()
    split = _split_halo.options(num_returns=P)
    shard_lists = [split.remote(r, cell_size, halo, P, tuple(extra_cols))
                   for r in refs]
    out_refs = [_reduce_cells.remote(kernel, *[s[p] for s in shard_lists])
                for p in range(P)]
    return ray.data.from_arrow_refs(out_refs)
