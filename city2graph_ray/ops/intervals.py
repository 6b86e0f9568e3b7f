"""Interval overlap join — the temporal sibling of the spatial
fixed-radius join, with the same exactly-once emission discipline.

Every interval is duplicated into the fixed-width time buckets it
covers; a pair is emitted ONLY by the bucket containing the overlap
start ``max(ls, rs)``, so no dedup shuffle is ever needed (mirrors the
crossing-point ownership rule in ops/segments.py).  Partitioning
assumption: bucket width should be on the order of the typical
interval length — an interval covering B buckets is shipped B times,
and a bucket holding n_l × n_r rows does candidate expansion bounded
by the true-overlap density at that width (candidates are pruned to
``rs < le`` by a searchsorted cut before the exact filter)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from city2graph_ray import shuffle


def _cover(ids: np.ndarray, s: np.ndarray, e: np.ndarray,
           w: int, side: int) -> pd.DataFrame:
    """Explode (id, start, end) into one row per covered bucket."""
    lo = s // w
    hi = np.maximum((e - 1) // w, lo)  # end-exclusive intervals
    n = (hi - lo + 1).astype(np.int64)
    idx = np.repeat(np.arange(len(ids), dtype=np.int64), n)
    step = np.arange(int(n.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(n) - n, n)
    return pd.DataFrame({
        "bucket": lo[idx] + step,
        "iid": ids[idx], "s": s[idx], "e": e[idx],
        "side": np.full(len(idx), side, np.int8)})


def interval_overlap_join(left: ray.data.Dataset,
                          right: ray.data.Dataset,
                          bucket_width: int,
                          id_col: str = "id", start: str = "s",
                          end: str = "e",
                          num_buckets: int = shuffle.DEFAULT_BUCKETS,
                          ) -> ray.data.Dataset:
    """All (a_id, b_id, overlap) pairs with ``a.s < b.e AND b.s < a.e``
    (end-exclusive overlap), where ``overlap = min(ae, be) −
    max(as, bs)``.  Columns are int64 (e.g. epoch microseconds)."""
    w = int(bucket_width)

    def prep(side: int):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            return _cover(b[id_col].to_numpy(np.int64),
                          b[start].to_numpy(np.int64),
                          b[end].to_numpy(np.int64), w, side)
        return fn

    both = left.map_batches(prep(0), batch_format="pandas").union(
        right.map_batches(prep(1), batch_format="pandas"))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "a_id": pd.Series([], dtype=np.int64),
            "b_id": pd.Series([], dtype=np.int64),
            "overlap": pd.Series([], dtype=np.int64)})
        out = [empty]
        for bucket, grp in g.groupby("bucket", sort=False):
            sidev = grp["side"].to_numpy(np.int8)
            a = grp.loc[sidev == 0]
            b = grp.loc[sidev == 1].sort_values("s", kind="stable")
            if a.empty or b.empty:
                continue
            ls = a["s"].to_numpy(np.int64)
            le = a["e"].to_numpy(np.int64)
            lid = a["iid"].to_numpy(np.int64)
            rs = b["s"].to_numpy(np.int64)
            re_ = b["e"].to_numpy(np.int64)
            rid = b["iid"].to_numpy(np.int64)
            # candidates: every b with rs < le (sorted cut), then the
            # exact second bound + exactly-once bucket ownership
            cut = np.searchsorted(rs, le, side="left")
            ai = np.repeat(np.arange(len(ls), dtype=np.int64), cut)
            bi = np.arange(int(cut.sum()), dtype=np.int64) - np.repeat(
                np.cumsum(cut) - cut, cut)
            keep = re_[bi] > ls[ai]
            os_ = np.maximum(ls[ai], rs[bi])
            keep &= (os_ // w) == bucket
            ai, bi = ai[keep], bi[keep]
            out.append(pd.DataFrame({
                "a_id": lid[ai], "b_id": rid[bi],
                "overlap": np.minimum(le[ai], re_[bi])
                - np.maximum(ls[ai], rs[bi])}))
        return pd.concat(out, ignore_index=True)

    return shuffle.grouped_transform(both, ["bucket"], kernel,
                                     num_buckets=num_buckets)


def interval_coverage(ds: ray.data.Dataset, key_col: str = "id",
                      start: str = "s", end: str = "e",
                      num_buckets: int = shuffle.DEFAULT_BUCKETS,
                      ) -> ray.data.Dataset:
    """Merged-interval union per key (the gaps-and-islands sweep):
    sort each key's half-open [s, e) intervals by (s, e), merge an
    interval into the current island unless its start strictly exceeds
    the running max of prior ends (touching intervals merge), then
    report per key::

        n_intervals, n_islands, covered (sum of merged lengths),
        span (max e − min s)

    Zero-length intervals are kept (they can form 0-length islands);
    ends must be ≥ starts.  All int64 (e.g. epoch microseconds).
    One shuffle on the key; the sweep is the SQL cumulative-max island
    construction, fully vectorized (groupby cummax + shift).
    Scale note: per-key interval counts must fit a worker batch — keys
    are hash-bucketed, never collected on the driver."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        d = g[[key_col, start, end]].sort_values(
            [key_col, start, end], kind="stable")
        cm = d.groupby(key_col, sort=False)[end].cummax()
        pmax = cm.groupby(d[key_col], sort=False).shift(1)
        new_island = pmax.isna() | (d[start] > pmax)
        d = d.assign(island=new_island.cumsum())
        isl = d.groupby([key_col, "island"], sort=False).agg(
            is_=(start, "min"), ie=(end, "max"),
            n=(start, "size")).reset_index()
        isl["length"] = isl["ie"] - isl["is_"]
        out = isl.groupby(key_col, sort=False).agg(
            n_intervals=("n", "sum"), n_islands=("n", "size"),
            covered=("length", "sum"), is_min=("is_", "min"),
            ie_max=("ie", "max")).reset_index()
        return pd.DataFrame({
            key_col: out[key_col].to_numpy(np.int64),
            "n_intervals": out["n_intervals"].to_numpy(np.int64),
            "n_islands": out["n_islands"].to_numpy(np.int64),
            "covered": out["covered"].to_numpy(np.int64),
            "span": (out["ie_max"] - out["is_min"]).to_numpy(np.int64)})

    return shuffle.grouped_transform(ds, [key_col], kernel,
                                     num_buckets=num_buckets)


def interval_max_nonoverlap(ds: ray.data.Dataset, key_col: str = "id",
                            s_col: str = "s", e_col: str = "e",
                            num_buckets: int = 16) -> ray.data.Dataset:
    """Per key, the size of the MAXIMUM set of pairwise non-overlapping
    intervals (touching endpoints allowed: next.start ≥ prev.end) —
    activity selection, solved exactly by the classic earliest-end
    greedy.  Distributed shape: one key-bucketed shuffle, then a
    vectorized sweep per key (sort by end, numpy scan — the greedy is
    inherently sequential per key but keys parallelize; a single key's
    intervals fit a worker by the same contract as every
    gaps-and-islands kernel here).  Ties on end time don't change the
    count (any earliest-end witness works).  Output (key, n_selected,
    n_intervals).
    """
    from city2graph_ray import shuffle

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for k, gg in g.groupby(key_col, sort=False):
            s = gg[s_col].to_numpy(np.int64)
            e = gg[e_col].to_numpy(np.int64)
            order = np.lexsort((s, e))
            s, e = s[order], e[order]
            cnt, cur = 0, np.iinfo(np.int64).min
            for i in range(len(s)):
                if s[i] >= cur:
                    cnt += 1
                    cur = e[i]
            outs.append((k, cnt, len(s)))
        return pd.DataFrame(outs, columns=[key_col, "n_selected",
                                           "n_intervals"])

    return shuffle.grouped_transform(ds, [key_col], kernel,
                                     num_buckets=num_buckets)


def allen_relation_census(ds: ray.data.Dataset, key_col: str,
                          start_col: str, end_col: str, id_col: str,
                          num_buckets: int = shuffle.DEFAULT_BUCKETS,
                          ) -> ray.data.Dataset:
    """Allen interval-algebra relation census (Allen 1983, public
    literature) per key: every pair of intervals, taken in
    (start, id) order so the 13 relations collapse to the 8 forward
    forms, is classified and counted.  Output
    ``(key, relation, n)`` with relation ∈ {before, meets, overlaps,
    finished_by, contains, starts, started_by, equal}.  All
    comparisons are int64, so the ordered self-join CASE twin is
    bit-exact.  Pair volume is C(n,2) per key — the Mann-Kendall /
    Knox bound; keys are bounded-history entities.
    """
    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, start_col, id_col], kind="stable")
        kk = g[key_col].to_numpy()
        ss = g[start_col].to_numpy(np.int64)
        ee = g[end_col].to_numpy(np.int64)
        _, starts, sizes = np.unique(kk, return_index=True,
                                     return_counts=True)
        pos = np.arange(len(kk)) - np.repeat(starts, sizes)
        reps = np.repeat(sizes, sizes) - 1 - pos
        total = int(reps.sum())
        if not total:
            return pd.DataFrame({key_col: kk[:0],
                                 "relation": np.array([], object),
                                 "n": np.zeros(0, np.int64)})
        i = np.repeat(np.arange(len(kk)), reps)
        j = i + (np.arange(total)
                 - np.repeat(np.cumsum(reps) - reps, reps) + 1)
        si, ei, sj, ej = ss[i], ee[i], ss[j], ee[j]
        rel = np.where(
            si == sj,
            np.where(ei == ej, "equal",
                     np.where(ei < ej, "starts", "started_by")),
            np.where(ei < sj, "before",
                     np.where(ei == sj, "meets",
                              np.where(ei == ej, "finished_by",
                                       np.where(ej < ei, "contains",
                                                "overlaps")))))
        out = (pd.DataFrame({key_col: kk[i], "relation": rel})
               .groupby([key_col, "relation"], sort=False).size()
               .rename("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    return shuffle.grouped_transform(ds, [key_col], kernel,
                                     num_buckets=num_buckets)
