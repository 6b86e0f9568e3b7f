"""Distributed as-of and range (interval) joins.

Ray Data has no native as-of join; this composes one from a
range-bucketed exchange plus a per-bucket vectorized pandas
``merge_asof``:

- Both sides are bucketed on the time axis by shared uniform bin
  edges (ONE shuffle total).
- The right side additionally contributes per-(key, bucket) "seed"
  rows — the last right row before each later bucket for
  ``direction='backward'``, the first after each earlier bucket for
  ``'forward'``, both for ``'nearest'`` — so every bucket merges
  independently with exact global semantics.  Several time bins may
  hash into one shuffle group; that is still correct for as-of
  (every left row's true best candidate is co-located via its own
  bin's rows/seeds, and merge_asof picks the optimum among a
  superset of valid candidates).
- The seed table is at most ``|keys| × num_buckets`` rows; it is
  reduced distributedly (per-(key,bucket) last/first via the bucketed
  shuffle) and only the reduced table is collected for the range
  expansion.  Documented assumption: keys × buckets ≪ rows.  If key
  cardinality approaches the row count, lower ``num_buckets`` or
  pre-reduce the right side — the expansion stays O(keys × buckets).

``range_join`` replicates each interval to every time bin it overlaps
while points land in exactly one bin; the per-group merge equi-joins
on the bin id too, so each (interval, point) match is emitted exactly
once even when distinct bins share a shuffle group.

The reference has no temporal joins; these are engine-added operators
for the large-scale pipeline surface (as-of / interval joins named in
the build brief).  Semantics match DuckDB ``ASOF JOIN`` (backward:
greatest right time <= left time, per key) and a BETWEEN inequality
join respectively — both oracled in ``__ray_entry__``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import ray.data

from .. import shuffle

_NB = 32


def _as_i8(s: pd.Series) -> np.ndarray:
    """Time column → int64 (ns for datetimes, raw for numerics)."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return s.astype("datetime64[ns]").to_numpy().view("i8")
    return s.to_numpy().astype(np.int64, copy=False)


def _min_max(ds: ray.data.Dataset, col: str) -> tuple[int, int]:
    """Distributed min/max of a time column as int64 (one pass,
    per-batch partials → tiny driver reduce)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = _as_i8(df[col])
        if len(v) == 0:
            return pd.DataFrame({"lo": [], "hi": []})
        return pd.DataFrame({"lo": [v.min()], "hi": [v.max()]})

    mm = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if len(mm) == 0:
        return 0, 1
    return int(mm["lo"].min()), int(mm["hi"].max())


def _bucket_of(t: np.ndarray, lo: int, hi: int, nb: int) -> np.ndarray:
    """Uniform time bin, clamped to [0, nb-1]."""
    span = max(hi - lo, 1)
    b = ((t.astype(np.float64) - lo) * nb / span).astype(np.int64)
    return np.clip(b, 0, nb - 1)


def _pad_fn(all_cols: list[str], dtypes: dict[str, object]):
    """Union-compatible padding: every part gets every column, absent
    ones as TYPED nulls (NaT for datetimes, nullable Int64 for ints —
    Arrow carries int-with-null natively, so int ids never degrade to
    float in the exchange)."""
    def pad(df: pd.DataFrame) -> pd.DataFrame:
        out = {}
        n = len(df)
        for c in all_cols + ["__tb", "__side"]:
            dt = dtypes.get(c, np.float64)
            if c in df.columns:
                col = df[c]
                if pd.api.types.is_integer_dtype(dt) and col.dtype != "Int64":
                    col = col.astype("Int64")
                out[c] = col.reset_index(drop=True)
            elif pd.api.types.is_datetime64_any_dtype(dt):
                out[c] = pd.Series(np.full(n, np.datetime64("NaT", "ns")),
                                   dtype="datetime64[ns]")
            elif pd.api.types.is_integer_dtype(dt):
                out[c] = pd.Series(pd.array([pd.NA] * n, dtype="Int64"))
            elif pd.api.types.is_float_dtype(dt):
                out[c] = pd.Series(np.full(n, np.nan))
            else:
                out[c] = pd.Series([None] * n, dtype=object)
        return pd.DataFrame(out)
    return pad


def _denull(df: pd.DataFrame, cols: Sequence[str],
            to_float: Sequence[str] = ()) -> pd.DataFrame:
    """Undo the Int64 padding inside a merge kernel: columns fully
    present on this side go back to int64; ``to_float`` ones (right
    values that may be unmatched downstream) go to float64."""
    df = df.copy()
    for c in cols:
        if str(df[c].dtype) == "Int64":
            df[c] = df[c].astype(np.float64 if c in to_float else np.int64)
    return df


def _dtype_map(schema, rename: dict | None = None) -> dict[str, object]:
    import pyarrow as pa
    out = {}
    for name, typ in zip(schema.names, schema.types):
        key = rename.get(name, name) if rename else name
        try:
            out[key] = (typ.to_pandas_dtype() if isinstance(typ, pa.DataType)
                        else np.dtype(typ))
        except (TypeError, NotImplementedError):
            out[key] = object
    return out


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    by: str | Sequence[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    num_buckets: int = _NB,
    suffixes: tuple[str, str] = ("", "_r"),
    pin: bool = True,
) -> ray.data.Dataset:
    """Distributed left as-of join (DuckDB ``ASOF LEFT JOIN`` /
    ``pd.merge_asof`` semantics, exact matches allowed).

    For deterministic output the right side must be unique per
    (by, on) — pre-reduce with :func:`shuffle.last_by` otherwise
    (duplicate right timestamps make every as-of engine's pick
    order-dependent, including DuckDB's).  Right value columns come
    back float64/NaT-nullable (left-join misses).

    ``pin=True`` (default) materializes both inputs once so the
    min-max pass, the schema probe and the join read cached blocks
    instead of re-executing the upstream lineage three times (the
    ``_pairs_with_texts`` lesson).  Pass ``pin=False`` when an input
    is larger than the object store and must stream: the join still
    works, at the cost of re-running its upstream per consumer —
    same trade as :func:`text.dedup.jaccard_join_exact`.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"bad direction {direction!r}")
    by = [by] if isinstance(by, str) else list(by or [])

    if pin:
        left = left.materialize()
        right = right.materialize()
    lo, hi = _min_max(left, on)
    lschema = left.schema(fetch_if_missing=True)
    rschema = right.schema(fetch_if_missing=True)
    lcols = list(lschema.names)
    # right columns renamed on clash (except the by keys, which merge)
    ren = {c: (c + suffixes[1] if (c in lcols and c not in by) else c)
           for c in rschema.names}
    ron = ren[on]
    rcols = [ren[c] for c in rschema.names]
    dtypes = _dtype_map(rschema, ren)
    dtypes.update(_dtype_map(lschema))
    dtypes["__tb"] = np.int64
    dtypes["__side"] = np.int8

    def tag(side: int, time_col: str, rename: dict | None):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            if rename:
                df = df.rename(columns=rename)
            df = df.copy()
            df["__tb"] = _bucket_of(_as_i8(df[time_col]), lo, hi, num_buckets)
            df["__side"] = np.int8(side)
            return df
        return fn

    lt = left.map_batches(tag(0, on, None), batch_format="pandas")
    rt = right.map_batches(tag(1, ron, ren), batch_format="pandas")

    # distributed seed reduction: per (by, bucket) last and/or first,
    # then a driver-side O(keys × buckets) range expansion
    seed_parts = []
    if direction in ("backward", "nearest"):
        seed_parts.append((shuffle.last_by(rt, [*by, "__tb"], ron,
                                           num_buckets).to_pandas(), False))
    if direction in ("forward", "nearest"):
        seed_parts.append((shuffle.first_by(rt, [*by, "__tb"], ron,
                                            num_buckets).to_pandas(), True))
    seeds = pd.concat(
        [_expand_seeds(df, num_buckets, by, fwd) for df, fwd in seed_parts],
        ignore_index=True)

    all_cols = lcols + [c for c in rcols if c not in lcols]
    pad = _pad_fn(all_cols, dtypes)
    unioned = lt.map_batches(pad, batch_format="pandas").union(
        rt.map_batches(pad, batch_format="pandas"))
    if len(seeds):
        unioned = unioned.union(
            ray.data.from_pandas(pad(seeds)).map_batches(
                lambda d: d, batch_format="pandas"))

    rval = [c for c in rcols if c not in by]
    out_cols = lcols + rval

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = _denull(g[g["__side"] == 0][lcols], lcols)
        # ron must stay integer here when the left key is integer:
        # merge_asof requires identical key dtypes (int64 time columns
        # crashed with MergeError when ron was pre-floated)
        r = _denull(g[g["__side"] == 1][[*by, *rval]], [*by, *rval],
                    to_float=[c for c in rval if c != ron])
        if (l[on].dtype != r[ron].dtype
                and pd.api.types.is_numeric_dtype(l[on])
                and pd.api.types.is_numeric_dtype(r[ron])):
            l[on] = l[on].astype(np.float64)
            r[ron] = r[ron].astype(np.float64)
        l = l.sort_values(on, kind="stable")
        r = r.sort_values(ron, kind="stable")
        out = pd.merge_asof(l, r, left_on=on, right_on=ron,
                            by=by or None, direction=direction,
                            tolerance=tolerance, allow_exact_matches=True)
        out = out[out_cols]
        for c in rval:  # stable schema on unmatched rows (incl. ron)
            if pd.api.types.is_numeric_dtype(out[c]):
                out[c] = out[c].astype(np.float64)
        return out

    return shuffle.grouped_transform(unioned, ["__tb"], merge,
                                     num_buckets=num_buckets)


def _expand_seeds(seeds: pd.DataFrame, nb: int, by: list[str],
                  forward: bool) -> pd.DataFrame:
    """Driver-side range expansion of the reduced per-(key,bucket)
    seed rows.  Backward: the last row of bucket b stays the best
    earlier-candidate for buckets (b, next_filled_bucket]; forward
    mirrors.  Output size <= keys × nb."""
    if len(seeds) == 0:
        return seeds
    s = seeds.sort_values([*by, "__tb"] if by else ["__tb"],
                          kind="stable").reset_index(drop=True)
    b = s["__tb"].to_numpy(np.int64)
    if by:
        key_codes = (pd.MultiIndex.from_frame(s[by]).factorize()[0]
                     if len(by) > 1 else s[by[0]].factorize()[0])
    else:
        key_codes = np.zeros(len(s), dtype=np.int64)
    if forward:
        prv = np.empty(len(s), dtype=np.int64)
        same_prev = np.zeros(len(s), dtype=bool)
        same_prev[1:] = key_codes[1:] == key_codes[:-1]
        prv[1:] = b[:-1]
        prv[~same_prev] = -1
        start, stop = prv, b  # seeds buckets [prv, b-1]
    else:
        nxt = np.empty(len(s), dtype=np.int64)
        same_next = np.zeros(len(s), dtype=bool)
        same_next[:-1] = key_codes[:-1] == key_codes[1:]
        nxt[:-1] = b[1:]
        nxt[~same_next] = nb
        start, stop = b + 1, nxt + 1  # seeds buckets [b+1, nxt]
    counts = np.maximum(stop - start, 0)
    rep = s.loc[s.index.repeat(counts)].reset_index(drop=True)
    offs = (np.concatenate([np.arange(c) for c in counts])
            if counts.sum() else np.zeros(0, dtype=np.int64))
    rep["__tb"] = np.repeat(start, counts) + offs
    return rep[rep["__tb"].between(0, nb - 1)].reset_index(drop=True)


def range_join(
    intervals: ray.data.Dataset,
    points: ray.data.Dataset,
    start_col: str,
    end_col: str,
    t_col: str,
    by: str | Sequence[str] | None = None,
    num_buckets: int = _NB,
    suffixes: tuple[str, str] = ("", "_r"),
    pin: bool = True,
) -> ray.data.Dataset:
    """Inner interval join: pairs where ``start <= t <= end`` (and the
    optional ``by`` keys match).  Intervals are replicated to every time
    bin they overlap; points live in one bin; the per-group merge joins
    on the bin id too, so each matching pair appears exactly once.
    Worst-case duplication = interval span / bin width; choose
    ``num_buckets`` so typical spans cover O(1) bins.

    ``pin=True`` caches both inputs once (three consumers each:
    min-max, schema probe, join); ``pin=False`` keeps them streaming
    for larger-than-object-store inputs at re-execution cost — see
    :func:`asof_join`."""
    by = [by] if isinstance(by, str) else list(by or [])

    if pin:
        intervals = intervals.materialize()
        points = points.materialize()
    ilo, ihi = _min_max(intervals, start_col)
    plo, phi = _min_max(points, t_col)
    lo, hi = min(ilo, plo), max(ihi, phi)

    ischema = intervals.schema(fetch_if_missing=True)
    pschema = points.schema(fetch_if_missing=True)
    icols = list(ischema.names)
    ren = {c: (c + suffixes[1] if (c in icols and c not in by) else c)
           for c in pschema.names}
    rt_col = ren[t_col]
    pcols = [ren[c] for c in pschema.names]
    dtypes = _dtype_map(pschema, ren)
    dtypes.update(_dtype_map(ischema))
    dtypes["__tb"] = np.int64
    dtypes["__side"] = np.int8

    def tag_intervals(df: pd.DataFrame) -> pd.DataFrame:
        b0 = _bucket_of(_as_i8(df[start_col]), lo, hi, num_buckets)
        b1 = _bucket_of(_as_i8(df[end_col]), lo, hi, num_buckets)
        counts = np.maximum(b1 - b0 + 1, 0)
        rep = df.loc[df.index.repeat(counts)].reset_index(drop=True)
        offs = (np.concatenate([np.arange(c) for c in counts])
                if counts.sum() else np.zeros(0, dtype=np.int64))
        rep["__tb"] = np.repeat(b0, counts) + offs
        rep["__side"] = np.int8(0)
        return rep

    def tag_points(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns=ren).copy()
        df["__tb"] = _bucket_of(_as_i8(df[rt_col]), lo, hi, num_buckets)
        df["__side"] = np.int8(1)
        return df

    pad = _pad_fn(icols + [c for c in pcols if c not in icols], dtypes)
    unioned = intervals.map_batches(tag_intervals, batch_format="pandas") \
        .map_batches(pad, batch_format="pandas").union(
            points.map_batches(tag_points, batch_format="pandas")
            .map_batches(pad, batch_format="pandas"))

    pval = [c for c in pcols if c not in by]
    out_cols = icols + pval

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = _denull(g[g["__side"] == 0][[*icols, "__tb"]], icols)
        r = _denull(g[g["__side"] == 1][[*by, *pval, "__tb"]], [*by, *pval])
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype=np.int64 if str(g[c].dtype) == "Int64"
                              else g[c].dtype) for c in out_cols})
        out = l.merge(r, on=[*by, "__tb"], how="inner")
        t = _as_i8(out[rt_col])
        keep = (_as_i8(out[start_col]) <= t) & (t <= _as_i8(out[end_col]))
        return out.loc[keep, out_cols]

    return shuffle.grouped_transform(unioned, ["__tb"], merge,
                                     num_buckets=num_buckets)
