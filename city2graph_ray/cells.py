"""Grid cell index — the engine's H3/S2 stand-in.

Every geometry row gets a ``cell`` id: a uint64 packing the integer grid
coordinates ``(ix, iy)`` of an axis-aligned square tile of side
``cell_size`` in the table's (projected) CRS.  All "which rows are near
each other" operators key their shuffles on this column; cross-tile
correctness comes from *halo duplication* (a row within ``halo`` of a
tile border is duplicated into the neighboring tiles, flagged
``is_halo``), mirroring distributed spatial-join practice.

The reference (single-process) has no spatial partitioning at all — its
cKDTree / STRtree indexes (``proximity.py:313-316``,
``morphology.py:2996`` in /root/reference/city2graph) see every row.
Cell bucketing + halo reproduces those operators' outputs exactly as
long as the query radius ≤ ``halo``.

Skew: urban cores make cell populations Zipfian.  ``salt_hot_cells``
appends a ``cell_salt`` column (``hash(row) % k`` for cells whose row
count exceeds a threshold) so a hot cell's work splits across k
reducers; callers that need geometric closure (per-tile algorithms)
must instead split by *sub-cells* — see ``subdivide``.
"""

from __future__ import annotations

import numpy as np

# 31-bit fields with a 2^30 offset: packed id = (iy+OFF) << 31 | (ix+OFF)
# stays < 2^62, safely inside int64 (a 32-bit field would set bit 63 for
# iy ≥ 0 and overflow).  Grid-coord range ±2^30 cells per axis.
_OFFSET = np.int64(1) << np.int64(30)
_SHIFT = np.int64(31)
_MASK = np.int64((1 << 31) - 1)


def cell_id(x: np.ndarray, y: np.ndarray, cell_size: float) -> np.ndarray:
    """Vectorized cell id for point coords. Returns int64 (packed ix,iy)."""
    ix = np.floor(np.asarray(x, dtype=np.float64) / cell_size).astype(np.int64) + _OFFSET
    iy = np.floor(np.asarray(y, dtype=np.float64) / cell_size).astype(np.int64) + _OFFSET
    return (iy << _SHIFT) | (ix & _MASK)


def cell_xy(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`cell_id` → integer grid coords (ix, iy)."""
    cell = np.asarray(cell, dtype=np.int64)
    ix = (cell & _MASK) - _OFFSET
    iy = (cell >> _SHIFT) - _OFFSET
    return ix, iy


def pack(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    ix = np.asarray(ix, dtype=np.int64) + _OFFSET
    iy = np.asarray(iy, dtype=np.int64) + _OFFSET
    return (iy << _SHIFT) | (ix & _MASK)


def halo_assignments(
    x: np.ndarray, y: np.ndarray, cell_size: float, halo: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All (row, cell, is_halo) assignments for points with halo duplication.

    A point is assigned to its home cell (``is_halo=False``) and to every
    neighboring cell whose square lies within ``halo`` of the point
    (``is_halo=True``).  ``halo`` must be ≤ ``cell_size`` (one ring).

    Returns (row_idx, cell, is_halo) arrays; ``row_idx`` indexes the
    input points and repeats for duplicated rows.
    """
    if halo > cell_size:
        raise ValueError(f"halo {halo} exceeds cell_size {cell_size}; use a coarser grid")
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x)
    fx = x / cell_size
    fy = y / cell_size
    ix = np.floor(fx).astype(np.int64)
    iy = np.floor(fy).astype(np.int64)
    # Fractional position inside the cell, in units of cell_size.
    rx = fx - ix
    ry = fy - iy
    h = halo / cell_size

    rows = [np.arange(n)]
    cells = [pack(ix, iy)]
    halos = [np.zeros(n, dtype=bool)]

    near_w = rx < h
    near_e = rx >= 1.0 - h
    near_s = ry < h
    near_n = ry >= 1.0 - h
    for mask, dx, dy in (
        (near_w, -1, 0),
        (near_e, 1, 0),
        (near_s, 0, -1),
        (near_n, 0, 1),
        (near_w & near_s, -1, -1),
        (near_w & near_n, -1, 1),
        (near_e & near_s, 1, -1),
        (near_e & near_n, 1, 1),
    ):
        idx = np.nonzero(mask)[0]
        if len(idx):
            rows.append(idx)
            cells.append(pack(ix[idx] + dx, iy[idx] + dy))
            halos.append(np.ones(len(idx), dtype=bool))
    return np.concatenate(rows), np.concatenate(cells), np.concatenate(halos)


def covering_cells(
    minx: np.ndarray, miny: np.ndarray, maxx: np.ndarray, maxy: np.ndarray, cell_size: float
) -> tuple[np.ndarray, np.ndarray]:
    """Cells covered by each bbox (for polygons / linestrings).

    Returns (row_idx, cell); a row repeats once per covered cell.
    Vectorized over rows with a Python loop only over the (small) set of
    distinct bbox spans.
    """
    ix0 = np.floor(np.asarray(minx, np.float64) / cell_size).astype(np.int64)
    iy0 = np.floor(np.asarray(miny, np.float64) / cell_size).astype(np.int64)
    ix1 = np.floor(np.asarray(maxx, np.float64) / cell_size).astype(np.int64)
    iy1 = np.floor(np.asarray(maxy, np.float64) / cell_size).astype(np.int64)
    nx = ix1 - ix0 + 1
    ny = iy1 - iy0 + 1
    counts = nx * ny
    total = int(counts.sum())
    row_out = np.repeat(np.arange(len(counts)), counts)
    # within-row enumeration 0..counts[i]-1
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    seq = np.arange(total) - np.repeat(starts, counts)
    dx = seq % np.repeat(nx, counts)
    dy = seq // np.repeat(nx, counts)
    cells = pack(np.repeat(ix0, counts) + dx, np.repeat(iy0, counts) + dy)
    return row_out, cells


def hot_cells(cell_counts: dict[int, int] | None, threshold: int) -> set[int]:
    """Cells whose population exceeds threshold (from a cheap pre-count)."""
    if not cell_counts:
        return set()
    return {c for c, n in cell_counts.items() if n > threshold}


def salt_for(cell: np.ndarray, row_hash: np.ndarray, hot: set[int], k: int) -> np.ndarray:
    """``cell_salt`` column: hash(row) % k for hot cells, 0 elsewhere."""
    salt = np.zeros(len(cell), dtype=np.int32)
    if hot:
        mask = np.isin(np.asarray(cell, np.int64), np.fromiter(hot, dtype=np.int64))
        salt[mask] = (np.asarray(row_hash, np.uint64)[mask] % np.uint64(k)).astype(np.int32)
    return salt


def parent_cell(cell: np.ndarray, factor: int) -> np.ndarray:
    """Packed id of the coarser-resolution tile containing ``cell``
    (grid side multiplied by ``factor``) — the H3/S2 parent analogue.

    ``factor`` must divide the 2^30 offset (any power of two ≤ 2^30):
    floor division then commutes with the offset
    (``(i+OFF)//f == i//f + OFF//f``), so the same non-negative
    truncating division works in plain SQL (DuckDB ``//`` truncates
    toward zero, which equals floor only for non-negative operands —
    offset space guarantees that)."""
    if (1 << 30) % factor:
        raise ValueError("factor must divide 2^30")
    cell = np.asarray(cell, dtype=np.int64)
    ixo = cell & _MASK
    iyo = cell >> _SHIFT
    off_f = _OFFSET // np.int64(factor)
    pix = ixo // np.int64(factor) - off_f
    piy = iyo // np.int64(factor) - off_f
    return pack(pix, piy)


def ring_cells(cell: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """All (2k+1)² cell ids within Chebyshev distance ``k`` of each
    input cell (the H3 k-ring analogue on the square grid).  Returns
    ``(row_index, neighbor_cell)`` — row i of the input explodes to
    (2k+1)² consecutive entries."""
    cell = np.asarray(cell, dtype=np.int64)
    ix, iy = cell_xy(cell)
    offs = np.arange(-k, k + 1, dtype=np.int64)
    dx = np.tile(offs, 2 * k + 1)
    dy = np.repeat(offs, 2 * k + 1)
    nx_ = (ix[:, None] + dx[None, :]).ravel()
    ny_ = (iy[:, None] + dy[None, :]).ravel()
    idx = np.repeat(np.arange(len(cell), dtype=np.int64),
                    (2 * k + 1) ** 2)
    return idx, pack(nx_, ny_)


def cell_chebyshev(cell_a: np.ndarray, cell_b: np.ndarray) -> np.ndarray:
    """Chebyshev (ring) distance between two packed cell ids."""
    ax, ay = cell_xy(np.asarray(cell_a, dtype=np.int64))
    bx, by = cell_xy(np.asarray(cell_b, dtype=np.int64))
    return np.maximum(np.abs(ax - bx), np.abs(ay - by))


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Interleave-ready bit spread: each of the low 31 bits of ``v``
    moves to an even position (magic-number spreading, the public
    Morton-code construction).  uint64 throughout."""
    v = np.asarray(v).astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def morton_key(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """Z-order (Morton) key of offset grid coords: interleaves the low
    31 bits of ``ix`` (even positions) and ``iy`` (odd) into one int64
    < 2^62.  Adjacent keys are spatially adjacent cells, so a range
    partition on this key yields spatially coherent blocks — the
    locality layout that makes halo joins and per-tile stages cheap
    (the same reason Delta/Iceberg Z-ORDER their geo tables)."""
    return (_spread_bits(ix) | (_spread_bits(iy) << np.uint64(1))).astype(
        np.int64)
