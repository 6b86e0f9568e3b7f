"""Distributed join helpers.

Two strategies, chosen explicitly by the caller (SURVEY.md §2.4):

- ``broadcast_join`` — small side pinned once in the object store via
  ``ray.put`` and merged per batch inside ``map_batches`` (no shuffle).
  This is the engine's default for dimension-table lookups (stops
  geometry, zone-id sets, node-id maps after dedup).
- ``bucketed_join`` — both sides large: add ``__bucket = hash(key) % B``
  to each side, tag provenance, union, ``groupby(__bucket)`` and merge
  the two sides per bucket in ``map_groups``.  An explicit partitioned
  hash join; B and hot-key salting are the caller's knobs.

``ray.data.Dataset.join`` exists in newer releases; the explicit forms
here keep the shuffle strategy visible and version-independent.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import ray
import ray.data


def broadcast_join(
    ds: ray.data.Dataset,
    small_df: pd.DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    batch_size: int | None = None,
) -> ray.data.Dataset:
    """Merge a small pandas side into every batch. Small side shipped to
    the object store ONCE (ray.put), read per actor/task, never per batch."""
    ref = ray.put(small_df)

    class _Merge:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.small, on=on, how=how)

    return ds.map_batches(_Merge, batch_format="pandas", batch_size=batch_size,
                          concurrency=(1, 8))


def semi_filter(
    ds: ray.data.Dataset,
    keys: np.ndarray | set,
    column: str,
    keep: bool = True,
) -> ray.data.Dataset:
    """Semi (keep=True) / anti (keep=False) join against a broadcast key set."""
    arr = np.asarray(sorted(keys)) if isinstance(keys, set) else np.unique(np.asarray(keys))
    ref = ray.put(arr)

    class _Filter:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            mask = np.isin(batch[column].to_numpy(), self.keys)
            return batch[mask if keep else ~mask]

    return ds.map_batches(_Filter, batch_format="pandas", concurrency=(1, 8))


def bucketed_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | Sequence[str],
    num_buckets: int = 64,
    how: str = "inner",
    suffixes: tuple[str, str] = ("", "_r"),
    left_schema=None,
    right_schema=None,
) -> ray.data.Dataset:
    """Partitioned hash join of two large Datasets on equality key(s).

    Both sides get ``__bucket = hash(key) % B``; the union is grouped by
    bucket and each group merged with pandas.  One shuffle total.

    The padded union stays in Arrow end-to-end: missing columns are
    ``pa.nulls(n, typed)`` so int64 ids survive the exchange, and each
    side is projected to its REAL columns before the pandas merge —
    the padding nulls never reach pandas, so no int→float degradation.

    ``left_schema`` / ``right_schema``: optional ``pyarrow.Schema``
    hints used when a side's schema cannot be derived — Ray Data loses
    block schemas whenever a map stage outputs only empty blocks, so a
    pipeline whose intermediate can legitimately be EMPTY (filters,
    anti-joins, gram explodes over short docs) must declare the shape
    it would have had.  With the hint the join degrades gracefully to
    its typed empty result instead of raising.
    """
    import pyarrow as pa

    keys = [on] if isinstance(on, str) else list(on)

    def _hash_key(t: pa.Table) -> np.ndarray:
        h = np.zeros(t.num_rows, dtype=np.uint64)
        for k in keys:
            col = t.column(k)
            if pa.types.is_integer(col.type):
                v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
                v = (v ^ (v >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
            else:
                v = pd.util.hash_array(
                    np.asarray(col.to_pandas()), categorize=False
                ).astype(np.uint64)
            h = h * np.uint64(1099511628211) ^ v
        return (h % np.uint64(num_buckets)).astype(np.int64)

    def _arrow_types(schema) -> dict[str, pa.DataType]:
        out = {}
        for name, typ in zip(schema.names, schema.types):
            if isinstance(typ, pa.DataType):
                out[name] = typ
            else:
                try:
                    out[name] = pa.from_numpy_dtype(np.dtype(typ))
                except (pa.ArrowNotImplementedError, TypeError):
                    out[name] = pa.string()
        return out

    def _schema_of(ds, hint):
        if hint is not None:
            # Trust the hint WITHOUT touching ds.schema(): for an
            # un-materialized upstream ending in an all-to-all stage
            # (groupby/sort), fetch_if_missing executes the ENTIRE
            # upstream just to read the first block's schema — and the
            # join then re-executes it again for real.  A caller-
            # supplied schema makes that probe pure waste (measured 3×
            # wedge-pipeline re-execution in clustering_coefficient).
            return ds, hint  # pa.Schema: same .names/.types surface
        s = ds.schema(fetch_if_missing=True)
        if s is None:  # seen under heavy sessions: force execution once
            ds = ds.materialize()
            s = ds.schema()
        if s is None:
            raise ValueError("bucketed_join: side has no derivable schema "
                             "(empty dataset with unknown columns); pass "
                             "left_schema/right_schema when the side can "
                             "be legitimately empty")
        return ds, s

    left, lschema = _schema_of(left, left_schema)
    right, rschema = _schema_of(right, right_schema)
    lcols, rcols = list(lschema.names), list(rschema.names)
    # union requires aligned schemas: pad each side with typed nulls
    pad_cols = lcols + [c for c in rcols if c not in lcols]
    types = _arrow_types(rschema)
    types.update(_arrow_types(lschema))

    def _pad(n: int, typ: pa.DataType) -> pa.Array:
        # Pad with ZEROS, not nulls, for pandas-lossy types: Ray's
        # groupby/sort exchange may roundtrip blocks through pandas,
        # where int64-with-nulls promotes to float64 — silently
        # rounding values above 2^53 (packed cell ids!).  The padded
        # values are never read (_merge splits by __side and selects
        # each side's real columns first), so any valid value works.
        if pa.types.is_integer(typ) or pa.types.is_floating(typ):
            return pa.array(np.zeros(n, np.int64), typ)
        if pa.types.is_boolean(typ):
            return pa.array(np.zeros(n, bool), typ)
        return pa.nulls(n, typ)

    def _tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            arrays = [
                t.column(c).cast(types[c]) if c in t.column_names
                else _pad(t.num_rows, types[c])
                for c in pad_cols
            ]
            arrays.append(pa.array(_hash_key(t), pa.int64()))
            arrays.append(pa.array(np.full(t.num_rows, side, np.int8)))
            return pa.Table.from_arrays(arrays, pad_cols + ["__bucket", "__side"])
        return fn

    tagged = left.map_batches(_tag(0), batch_format="pyarrow").union(
        right.map_batches(_tag(1), batch_format="pyarrow"))

    # deterministic output schema (stable across groups — empty groups
    # and pandas' int→float promotion on non-inner joins otherwise make
    # per-block schemas drift, which Ray's schema dedup chokes on)
    shared = [c for c in lcols if c in rcols and c not in keys]
    out_fields: list[tuple[str, pa.DataType]] = []
    for c in lcols:
        nm = c + suffixes[0] if c in shared else c
        t = types[c]
        if how in ("right", "outer") and pa.types.is_integer(t) and c not in keys:
            t = pa.float64()
        out_fields.append((nm, t))
    for c in rcols:
        if c in keys:
            continue
        nm = c + suffixes[1] if c in shared else c
        t = types[c]
        if how in ("left", "outer") and pa.types.is_integer(t):
            t = pa.float64()
        out_fields.append((nm, t))
    out_schema = pa.schema(out_fields)

    def _merge(group: pa.Table) -> pa.Table:
        side = group.column("__side").to_numpy(zero_copy_only=False)
        l = group.filter(pa.array(side == 0)).select(lcols).to_pandas()
        r = group.filter(pa.array(side == 1)).select(rcols).to_pandas()
        out = l.merge(r, on=keys, how=how, suffixes=suffixes)
        arrays = [pa.array(out[f.name], type=f.type, from_pandas=True)
                  for f in out_schema]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    joined = tagged.groupby("__bucket").map_groups(
        _merge, batch_format="pyarrow")
    # schema anchor: an all-empty input produces zero groups, which
    # leaves the result with no derivable schema and breaks any further
    # join/union over it; one empty typed block keeps it schema-stable
    return joined.union(ray.data.from_arrow(out_schema.empty_table()))
