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
) -> ray.data.Dataset:
    """Partitioned hash join of two large Datasets on equality key(s).

    Both sides get ``__bucket = hash(key) % B``; the union is grouped by
    bucket and each group merged with pandas.  One shuffle total.
    """
    keys = [on] if isinstance(on, str) else list(on)

    def _hash_key(df: pd.DataFrame) -> np.ndarray:
        h = np.zeros(len(df), dtype=np.uint64)
        for k in keys:
            col = df[k]
            if col.dtype.kind in "iu":
                v = col.to_numpy().astype(np.uint64)
            else:
                v = pd.util.hash_array(col.to_numpy(), categorize=False).astype(np.uint64)
            h = h * np.uint64(1099511628211) + v
        return (h % np.uint64(num_buckets)).astype(np.int64)

    def _tag(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__bucket"] = _hash_key(df)
            df["__side"] = np.int8(side)
            return df
        return fn

    lcols = [c for c in left.schema().names]
    rcols = [c for c in right.schema().names]
    # union requires aligned schemas: pad each side with the other's columns
    all_cols = lcols + [c for c in rcols if c not in lcols] + ["__bucket", "__side"]

    def _pad(fn):
        def padded(df: pd.DataFrame) -> pd.DataFrame:
            return fn(df).reindex(columns=all_cols)
        return padded

    tagged = left.map_batches(_pad(_tag(0)), batch_format="pandas").union(
        right.map_batches(_pad(_tag(1)), batch_format="pandas"))

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["__side"] == 0][lcols]
        r = group[group["__side"] == 1][rcols]
        out = l.merge(r, on=keys, how=how, suffixes=suffixes)
        return out

    return tagged.groupby("__bucket").map_groups(_merge, batch_format="pandas")
