"""Fused halo-assignment + hash-partition exchange for cell-keyed
spatial kernels.

``Dataset.groupby(cell).map_groups(kernel)`` expresses the semantics,
but Ray Data's sort-based shuffle costs a sample pass + global sort and
is latency-bound at interactive sizes (BASELINE.md).  This module is
the measured fast path (×1.5–2 at both 8 and 32 CPUs on the radius
suite, identical outputs): a classic two-stage map/reduce exchange as
plain Ray tasks —

  map:    per input block, halo-assign rows to cells and hash-split
          into P shards — all Arrow: one ``take`` for the halo
          replication, then a stable partition sort + zero-copy
          ``slice`` per shard (the expanded table is never copied
          per shard),
  reduce: per partition, ``pa.concat_tables`` its shards (zero-copy
          chunked concat), one stable sort by cell, then zero-copy
          per-cell slices feed the kernel; kernel outputs concat as
          Arrow chunks — the big pair dumps are never re-copied into
          one pandas frame.  Results re-enter Ray Data via
          ``from_arrow_refs``.

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
    # 2× the CPU count: each reduce task's peak memory is dominated by
    # its OUTPUT table (pair dumps run 100×+ the input bytes), and one
    # wave of cpu-count tasks each holding a ~GB output thrashes the
    # page cache (measured at 9.6M pts / 955M pairs on 32 CPUs:
    # P=32 → 81 s, P=64 → 13 s, P=128 → 17 s).  Finer partitions also
    # shorten the straggler tail of the last wave.
    try:
        return max(16, 2 * int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 16


@ray.remote
def _split_halo(tbl: pa.Table, cell_size: float, halo: float,
                num_partitions: int, extra_cols: tuple) -> list:
    if tbl.num_rows == 0 or "x" not in tbl.schema.names:
        # schema-less empty block (filtered-out upstream): typed shards
        empty = pa.table({
            "id": pa.array([], pa.int64()),
            "x": pa.array([], pa.float64()),
            "y": pa.array([], pa.float64()),
            **{c: pa.array([], pa.float64()) for c in extra_cols},
            "cell": pa.array([], pa.int64()),
            "is_halo": pa.array([], pa.bool_())})
        return [empty] * num_partitions
    x = tbl.column("x").to_numpy(zero_copy_only=False)
    y = tbl.column("y").to_numpy(zero_copy_only=False)
    rows, cell, is_halo = cells.halo_assignments(x, y, cell_size, halo)
    part = ((cell.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            >> np.uint64(40)).astype(np.int64) % num_partitions
    order = np.argsort(part, kind="stable")
    rows_o, cell_o, halo_o = rows[order], cell[order], is_halo[order]
    sorted_part = part[order]
    starts = np.searchsorted(sorted_part, np.arange(num_partitions))
    ends = np.concatenate([starts[1:], [len(sorted_part)]])
    # each shard is a fresh `take` of the source block: Arrow pickles a
    # *sliced* table with its FULL parent buffers (measured: a 1k-row
    # slice of a 1M-row block serializes all 24 MB), so returning
    # zero-copy slice views here would ship P copies of every block
    # into the object store.  Per-shard take copies each row exactly
    # once in total — same bytes as the logical shuffle.
    sel = tbl.select(["id", "x", "y", *extra_cols])
    out = []
    for lo, hi in zip(starts, ends):
        sh = sel.take(pa.array(rows_o[int(lo):int(hi)]))
        sh = sh.append_column("cell", pa.array(cell_o[int(lo):int(hi)]))
        sh = sh.append_column("is_halo", pa.array(halo_o[int(lo):int(hi)]))
        out.append(sh)
    return out


@ray.remote
def _reduce_whole(kernel: Callable, *shards) -> pa.Table:
    """Reduce for multi-cell-aware kernels: one kernel call on the
    whole cell-sorted partition.  Amortizes the per-call overhead that
    dominates when cells are small (measured: 45k cells/task × ~0.3 ms
    slice+to_pandas+kernel overhead = 14 s of a 17 s reduce)."""
    t = pa.concat_tables([s for s in shards if s.num_rows],
                         promote_options="default") \
        if any(s.num_rows for s in shards) else shards[0]
    if t.num_rows == 0:
        empty = kernel(t.to_pandas().iloc[0:0])
        return pa.Table.from_pandas(empty, preserve_index=False)
    cellcol = t.column("cell").to_numpy(zero_copy_only=False)
    order = np.argsort(cellcol, kind="stable")
    r = kernel(t.take(pa.array(order)).to_pandas())
    return pa.Table.from_pandas(r, preserve_index=False)


@ray.remote
def _reduce_cells(kernel: Callable, *shards) -> pa.Table:
    t = pa.concat_tables([s for s in shards if s.num_rows],
                         promote_options="default") \
        if any(s.num_rows for s in shards) else shards[0]
    if t.num_rows == 0:
        empty = kernel(t.to_pandas().iloc[0:0])
        return pa.Table.from_pandas(empty, preserve_index=False)
    cellcol = t.column("cell").to_numpy(zero_copy_only=False)
    order = np.argsort(cellcol, kind="stable")
    t2 = t.take(pa.array(order))
    cc = cellcol[order]
    bounds = np.flatnonzero(np.diff(cc)) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(cc)]])
    outs = []
    for lo, hi in zip(starts, ends):
        r = kernel(t2.slice(int(lo), int(hi - lo)).to_pandas())
        if r is not None and len(r):
            outs.append(pa.Table.from_pandas(r, preserve_index=False))
    if not outs:
        return pa.Table.from_pandas(kernel(t2.slice(0, 0).to_pandas()),
                                    preserve_index=False)
    # chunked zero-copy concat — no single giant pandas frame
    return pa.concat_tables(outs, promote_options="default")


def cell_halo_exchange(
    points: ray.data.Dataset,
    cell_size: float,
    halo: float,
    kernel: Callable[[pd.DataFrame], pd.DataFrame],
    extra_cols: tuple = (),
    num_partitions: int | None = None,
    per_cell: bool = True,
) -> ray.data.Dataset:
    """Run ``kernel`` over every cell group of the halo-expanded points.

    Exactly equivalent to
    ``expand_halo(points, cell_size, halo).groupby("cell").map_groups(kernel)``
    (the kernel sees one cell's rows: id, x, y, *extra_cols, cell,
    is_halo), executed as the fused map/reduce exchange.

    ``per_cell=False`` declares the kernel multi-cell-aware: it is
    called ONCE per partition with the partition's rows sorted by
    ``cell`` and must restrict pairing to equal cells itself.  Use for
    kernels whose per-cell call overhead would dominate at fine grids."""
    P = num_partitions or _num_partitions()
    refs = points.to_arrow_refs()
    if not refs:  # empty input: fall back to the equivalent Dataset plan
        from city2graph_ray.ops.proximity import expand_halo
        return (expand_halo(points, cell_size, halo, extra_cols)
                .groupby("cell").map_groups(kernel, batch_format="pandas"))
    split = _split_halo.options(num_returns=P)
    shard_lists = [split.remote(r, cell_size, halo, P, tuple(extra_cols))
                   for r in refs]
    reducer = _reduce_cells if per_cell else _reduce_whole
    out_refs = [reducer.remote(kernel, *[s[p] for s in shard_lists])
                for p in range(P)]
    return ray.data.from_arrow_refs(out_refs)
