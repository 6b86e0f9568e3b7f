"""Deterministic geometry derivation from the TPC-H-ish testdata keys.

The driver's correctness gate runs each Ray pipeline AND an equivalent
DuckDB SQL oracle over the same parquet tables.  The testdata has no
geometry columns, so geometry is *derived* from integer keys with pure
integer arithmetic followed by one float division — computed
identically (same IEEE ops, same order) in numpy here and in SQL (see
the matching ``SQL_*`` fragments), so float results compare bit-exact.

Derived world: a 1000×1000 plane.

- ``customer`` → points (one per customer), Lehmer-style mixing.
- ``part``     → an axis-aligned grid of 25×25 squares (zones /
  polygons / tessellation stand-ins).
- ``orders``   → segments from the order's own derived point to its
  customer's derived point (shared endpoints → real coord dedup).

These same derivations feed the interleaved-document synthesizer
(:mod:`city2graph_ray.sources.interleaved`), so the span-table ingress
path and the SQL oracles describe the same geometry.
"""

from __future__ import annotations

import numpy as np

MOD = 100_000
QX, AX, BX = 3931, 48271, 11
QY, AY, BY = 2713, 69621, 7
SCALE = 100.0  # divide by → coords in [0, 1000)

GRID_COLS = 40
GRID_SIZE = 25.0


def key_to_xy(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Derived point for any integer key column. Matches sql_x/sql_y.

    Quadratic congruential mix — a pure linear (Lehmer) map puts the
    points on a rank-1 lattice (min pairwise distance ~34 at sf0.001,
    killing every radius/knn test); the k² term breaks the lattice.
    All intermediate values stay < 2^63 for keys up to ~10^8.
    """
    k = np.asarray(key, dtype=np.int64)
    x = ((k * k * QX + k * AX + BX) % MOD).astype(np.float64) / SCALE
    y = ((k * k * QY + k * AY + BY) % MOD).astype(np.float64) / SCALE
    return x, y


def sql_x(col: str) -> str:
    return f"((({col} * {col} * {QX} + {col} * {AX} + {BX}) % {MOD}) / {SCALE})"


def sql_y(col: str) -> str:
    return f"((({col} * {col} * {QY} + {col} * {AY} + {BY}) % {MOD}) / {SCALE})"


def part_grid_cell(p_partkey: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(col, row) of the part's grid square. Matches SQL_GCOL/SQL_GROW."""
    k = np.asarray(p_partkey, dtype=np.int64)
    return k % GRID_COLS, k // GRID_COLS


def sql_gcol(col: str) -> str:
    return f"({col} % {GRID_COLS})"


def sql_grow(col: str) -> str:
    return f"(({col} // {GRID_COLS}))"


def grid_square_ring(col: np.ndarray, row: np.ndarray) -> np.ndarray:
    """Exterior-ring flat coords (5 pts, closed) of each grid square.
    Returns (n, 10) array."""
    x0 = np.asarray(col, np.float64) * GRID_SIZE
    y0 = np.asarray(row, np.float64) * GRID_SIZE
    x1 = x0 + GRID_SIZE
    y1 = y0 + GRID_SIZE
    return np.stack([x0, y0, x1, y0, x1, y1, x0, y1, x0, y0], axis=1)
