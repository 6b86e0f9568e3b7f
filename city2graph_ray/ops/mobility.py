"""OD (origin-destination) graph operators.

Reference semantics (/root/reference/city2graph/mobility.py):
``od_matrix_to_graph`` :54-191 — edgelist or adjacency-matrix input,
multi-weight columns :103-111, duplicate-flow aggregation :809-838,
zone semi-join (drop edges whose endpoints aren't zones) :1196-1250,
undirected canonicalize-sum-**then**-threshold :385-429/:1333-1379,
threshold uses ``>=`` :80-83, self-loop policy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from city2graph_ray import shuffle
from city2graph_ray.joins import semi_filter


def od_graph(
    flows: ray.data.Dataset,
    zone_ids: np.ndarray | set | None = None,
    weight_cols: tuple[str, ...] = ("weight",),
    threshold: float = 0.0,
    undirected: bool = False,
    keep_self_loops: bool = False,
    src_col: str = "source",
    dst_col: str = "target",
    round_to: int = 6,
) -> ray.data.Dataset:
    """OD edgelist → aggregated zone graph.

    Pipeline: semi-join both endpoints against the broadcast zone-id
    set → optional self-loop drop → optional unordered canonicalization
    → partial per-batch sums → final groupby sum → threshold on the
    FIRST weight column applied AFTER summation (the reference's
    documented quirk).  Output: (source, target, <weight_cols> summed)."""
    ds = flows
    if zone_ids is not None:
        ds = semi_filter(ds, zone_ids, src_col)
        ds = semi_filter(ds, zone_ids, dst_col)

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch
        if not keep_self_loops:
            out = out[out[src_col] != out[dst_col]]
        if undirected:
            a = out[src_col].to_numpy()
            b = out[dst_col].to_numpy()
            swap = a > b
            out = out.copy()
            out[src_col] = np.where(swap, b, a)
            out[dst_col] = np.where(swap, a, b)
        # partial aggregation: one row per pair per batch
        return (out.groupby([src_col, dst_col], sort=False)[list(weight_cols)]
                .sum().reset_index())

    partials = ds.map_batches(prep, batch_format="pandas")
    summed = shuffle.group_agg(partials, [src_col, dst_col],
                               {w: (w, "sum") for w in weight_cols},
                               partial=False)

    def post(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        for w in weight_cols:
            out[w] = np.round(out[w].to_numpy(), round_to)
        return out[out[weight_cols[0]] >= threshold]

    return summed.map_batches(post, batch_format="pandas")


def adjacency_to_edgelist(matrix: np.ndarray, zone_ids: list) -> pd.DataFrame:
    """Square adjacency (+ndarray) form → edgelist melt
    (reference mobility.py adjacency path); zeros dropped.  NaNs are
    treated as 0 and negatives kept, each with a warning — the
    reference's documented data-quality policy (mobility.py:542-568)."""
    import warnings

    m = np.asarray(matrix, np.float64)
    n_nans = int(np.isnan(m).sum())
    if n_nans:
        warnings.warn(f"Adjacency contains {n_nans} NaN values; "
                      "treating as 0", stacklevel=2)
        m = np.nan_to_num(m, nan=0.0)
    if (m < 0).any():
        warnings.warn("Adjacency contains negative weights; keeping "
                      "values", stacklevel=2)
    ii, jj = np.nonzero(m)
    ids = np.asarray(zone_ids)
    return pd.DataFrame({"source": ids[ii], "target": ids[jj],
                         "weight": m[ii, jj]})
