"""Distributed exact order statistics.

``group_quantiles`` computes EXACT linear-interpolated quantiles
(numpy ``quantile(..., method="linear")`` / SQL ``quantile_cont``
semantics) per group without ever sorting or collecting a group's
values: a histogram pass locates the order statistics' bins, a second
targeted pass collects only the values inside those bins (expected
``n / n_bins`` rows per group), and the driver interpolates from the
handful of candidates.  Two streaming passes over the data, shuffle
bytes ∝ groups × bins — scale-safe for any group size.

No reference counterpart (the reference has no quantile op); this is
an engine-added analytics primitive for training-data curation
(quality-score cutoffs, length percentiles).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import ray
import ray.data

from city2graph_ray import shuffle


def group_quantiles(ds: ray.data.Dataset, keys: Sequence[str],
                    value_col: str, qs: Sequence[float] = (0.5, 0.9, 0.99),
                    n_bins: int = 1024, round_to: int | None = 6,
                    ) -> ray.data.Dataset:
    """Per-``keys`` exact quantiles of ``value_col``.

    Output: one row per group with columns ``keys + [f"q{q}" ...]``
    (e.g. ``q0.5``); values interpolated as ``x_k + frac·(x_{k+1}−x_k)``
    at ``pos = (n−1)·q`` — bit-equal to ``numpy.quantile`` (linear) and
    SQL's manual row_number construction on the same doubles.

    Passes: (1) per-group n/min/max (`group_agg`), (2) per-group bin
    histogram over [min, max] (`group_agg` over (group, bin) —
    per-batch partials keep shuffle bytes ∝ distinct (group, bin) per
    batch), (3) a filtered collect of ONLY the bins holding the needed
    order statistics.  Degenerate bins (heavy ties) just mean the
    targeted pass returns more rows for that bin — exactness is
    unaffected.
    """
    keys = list(keys)
    qs = list(qs)

    # ---- pass 1: group extents ------------------------------------
    stats = shuffle.group_agg(
        ds, keys, {"n": (value_col, "size"), "lo": (value_col, "min"),
                   "hi": (value_col, "max")}).to_pandas()
    if not len(stats):
        return ray.data.from_pandas(
            pd.DataFrame(columns=keys + [f"q{q}" for q in qs]))
    stats = stats.set_index(keys if len(keys) > 1 else keys[0])
    ext = {g: (int(r["n"]), float(r["lo"]), float(r["hi"]))
           for g, r in stats.iterrows()}
    ext_ref = ray.put(ext)

    def _bin_of(vals: np.ndarray, lo: float, hi: float) -> np.ndarray:
        span = hi - lo
        if span <= 0:
            return np.zeros(len(vals), dtype=np.int64)
        b = np.floor((vals - lo) / span * n_bins).astype(np.int64)
        return np.clip(b, 0, n_bins - 1)

    # ---- pass 2: per-(group, bin) counts --------------------------
    def hist(batch: pd.DataFrame) -> pd.DataFrame:
        e = ray.get(ext_ref)
        gk = (batch[keys[0]] if len(keys) == 1
              else list(zip(*[batch[k] for k in keys])))
        out = pd.DataFrame({k: batch[k] for k in keys})
        v = batch[value_col].to_numpy(np.float64)
        bins = np.empty(len(batch), dtype=np.int64)
        gvals = pd.Series(gk)
        for g, idx in gvals.groupby(gvals, sort=False).groups.items():
            _, lo, hi = e[g]
            ii = np.asarray(idx)
            bins[ii] = _bin_of(v[ii], lo, hi)
        out["bin"] = bins
        return (out.groupby(keys + ["bin"], sort=False).size()
                .rename("cnt").reset_index())

    counts = shuffle.group_agg(
        ds.map_batches(hist, batch_format="pandas"), keys + ["bin"],
        {"cnt": ("cnt", "sum")}, partial=False).to_pandas()

    # ---- locate the bins holding order stats k and k+1 ------------
    need: dict = {}          # group -> set of bins
    ranks: dict = {}         # group -> {order_index}
    for g, sub in counts.groupby(keys if len(keys) > 1 else keys[0]):
        n, lo, hi = ext[g]
        sub = sub.sort_values("bin")
        cum = np.concatenate([[0], np.cumsum(sub["cnt"].to_numpy())])
        bins_arr = sub["bin"].to_numpy()
        want = set()
        for q in qs:
            pos = (n - 1) * float(q)
            k = int(np.floor(pos))
            want.update((k, min(k + 1, n - 1)))
        ranks[g] = want
        bset = set()
        for k in want:
            j = int(np.searchsorted(cum, k, side="right")) - 1
            bset.add(int(bins_arr[min(j, len(bins_arr) - 1)]))
        need[g] = bset
    need_ref = ray.put(need)

    # ---- pass 3: targeted value collect ---------------------------
    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        e = ray.get(ext_ref)
        nd = ray.get(need_ref)
        v = batch[value_col].to_numpy(np.float64)
        gk = (batch[keys[0]] if len(keys) == 1
              else list(zip(*[batch[k] for k in keys])))
        gvals = pd.Series(gk)
        mask = np.zeros(len(batch), dtype=bool)
        for g, idx in gvals.groupby(gvals, sort=False).groups.items():
            _, lo, hi = e[g]
            ii = np.asarray(idx)
            mask[ii] = np.isin(_bin_of(v[ii], lo, hi),
                               list(nd.get(g, ())))
        out = pd.DataFrame({k: batch[k][mask] for k in keys})
        out["v"] = v[mask]
        return out

    cand = ds.map_batches(pick, batch_format="pandas").to_pandas()

    # ---- exact interpolation on the tiny candidate set ------------
    rows = []
    counts_idx = counts.set_index(keys + ["bin"])["cnt"]
    for g, _ in ext.items():
        n, lo, hi = ext[g]
        gk = g if isinstance(g, tuple) else (g,)
        sub = cand[np.logical_and.reduce(
            [cand[k].to_numpy() == gv for k, gv in zip(keys, gk)])]
        vals = np.sort(sub["v"].to_numpy())
        # rank of the first collected value = total count in bins
        # BELOW the smallest needed bin
        gsub = counts[np.logical_and.reduce(
            [counts[k].to_numpy() == gv for k, gv in zip(keys, gk)])]
        gsub = gsub.sort_values("bin")
        # collected vals = union of the needed bins, sorted.  A value of
        # global rank k lives in the needed bin whose global start rank
        # covers k, at (k − that bin's global start) within the bin's
        # slice of the collected array.
        bins_sorted = sorted(need[g])
        bin_cnt = {int(b): int(counts_idx.get(tuple(list(gk) + [b]), 0))
                   for b in bins_sorted}
        # global start rank of each needed bin
        start_rank = {}
        for b in bins_sorted:
            start_rank[b] = int(gsub[gsub["bin"] < b]["cnt"].sum())
        # collected start index of each needed bin
        coll_start = {}
        acc = 0
        for b in bins_sorted:
            coll_start[b] = acc
            acc += bin_cnt[b]

        def value_at(k: int) -> float:
            j = int(np.searchsorted(
                [start_rank[b] for b in bins_sorted], k, "right")) - 1
            b = bins_sorted[j]
            return float(vals[coll_start[b] + (k - start_rank[b])])

        row = dict(zip(keys, gk))
        for q in qs:
            pos = (n - 1) * float(q)
            k = int(np.floor(pos))
            frac = pos - k
            x0 = value_at(k)
            x1 = value_at(min(k + 1, n - 1))
            val = x0 + frac * (x1 - x0)
            row[f"q{q}"] = (round(val, round_to)
                            if round_to is not None else val)
        rows.append(row)
    return ray.data.from_pandas(
        pd.DataFrame(rows).sort_values(keys).reset_index(drop=True))


def global_quantile(ds: ray.data.Dataset, value_col: str, q: float,
                    n_bins: int = 1024, round_to: int | None = None,
                    ) -> float:
    """EXACT corpus-wide ``quantile_cont`` of one column as a scalar —
    :func:`group_quantiles` under a constant key (two streaming passes,
    shuffle bytes ∝ bins).  The natural input to a percentile cutoff
    filter (e.g. "drop documents below the global p90 length")."""
    tagged = ds.map_batches(
        lambda b: pd.DataFrame({"__k": np.zeros(len(b), np.int64),
                                value_col: b[value_col].to_numpy()}),
        batch_format="pandas")
    out = group_quantiles(tagged, ["__k"], value_col, [q],
                          n_bins=n_bins, round_to=round_to).to_pandas()
    return float(out[f"q{q}"].iloc[0])


def quantile_threshold_filter(ds: ray.data.Dataset, value_col: str,
                              q: float, keep: str = "above",
                              round_to: int | None = 6,
                              ) -> ray.data.Dataset:
    """Keep rows strictly above (``keep="above"``) or ≤ (``"below"``)
    the exact global ``q``-quantile of ``value_col`` — the
    percentile-cutoff curation filter.  The threshold is ONE scalar
    (driver-held, closure-captured); the filter itself streams."""
    thr = global_quantile(ds, value_col, q, round_to=round_to)
    if keep == "above":
        return ds.map_batches(lambda b: b[b[value_col].to_numpy() > thr],
                              batch_format="pandas")
    return ds.map_batches(lambda b: b[b[value_col].to_numpy() <= thr],
                          batch_format="pandas")
