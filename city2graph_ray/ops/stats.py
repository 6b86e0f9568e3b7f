"""Distributed exact order statistics.

``group_quantiles`` computes EXACT linear-interpolated quantiles
(numpy ``quantile(..., method="linear")`` / SQL ``quantile_cont``
semantics) per group without ever sorting or collecting a group's
values: a histogram pass locates the order statistics' bins, hot bins
are recursively re-histogrammed (each round narrows a needed bin to
its rows' actual [min, max] range — ties collapse to min==max and
resolve with NO collect), and a final targeted pass collects only
segments below a fixed row cap.  Driver memory is therefore bounded by
``groups × ranks × collect_cap`` regardless of the tie structure; each
refinement round is one streaming pass shuffling ∝ groups × bins
counter rows.

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


def _bin_of(vals: np.ndarray, lo: float, hi: float, n_bins: int) -> np.ndarray:
    span = hi - lo
    if span <= 0:
        return np.zeros(len(vals), dtype=np.int64)
    b = np.floor((vals - lo) / span * n_bins).astype(np.int64)
    return np.clip(b, 0, n_bins - 1)


class _Seg:
    """One needed order-statistic segment: the set of rows matching a
    bin path (level i = bin ``b`` of the ``n_bins`` histogram over that
    level's [lo, hi] value range).  ``start_rank`` = number of group
    rows strictly below the segment; ``vmin``/``vmax`` = actual value
    extent of the member rows (drives the next refinement — and when
    they coincide every member IS that value)."""

    __slots__ = ("levels", "start_rank", "count", "vmin", "vmax")

    def __init__(self, levels, start_rank, count, vmin, vmax):
        self.levels = levels          # tuple of (lo, hi, bin)
        self.start_rank = int(start_rank)
        self.count = int(count)
        self.vmin = float(vmin)
        self.vmax = float(vmax)

    def member_mask(self, v: np.ndarray, n_bins: int) -> np.ndarray:
        m = np.ones(len(v), dtype=bool)
        for lo, hi, b in self.levels:
            m &= _bin_of(v, lo, hi, n_bins) == b
        return m


def group_quantiles(ds: ray.data.Dataset, keys: Sequence[str],
                    value_col: str, qs: Sequence[float] = (0.5, 0.9, 0.99),
                    n_bins: int = 1024, round_to: int | None = 6,
                    collect_cap: int = 8192) -> ray.data.Dataset:
    """Per-``keys`` exact quantiles of ``value_col``.

    Output: one row per group with columns ``keys + [f"q{q}" ...]``
    (e.g. ``q0.5``); values interpolated as ``x_k + frac·(x_{k+1}−x_k)``
    at ``pos = (n−1)·q`` — bit-equal to ``numpy.quantile`` (linear) and
    SQL's manual row_number construction on the same doubles.

    Passes: (1) per-group n/min/max (`group_agg`), (2) per-group bin
    histogram over [min, max] with per-bin value extents, (2b) zero or
    more refinement passes re-histogramming any needed bin whose row
    count exceeds ``collect_cap`` (a bin of identical values resolves
    immediately via vmin == vmax), (3) a filtered collect of ONLY the
    sub-cap segments holding the needed order statistics.
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

    def _group_series(batch: pd.DataFrame) -> pd.Series:
        gk = (batch[keys[0]] if len(keys) == 1
              else list(zip(*[batch[k] for k in keys])))
        return pd.Series(gk)

    # needed global ranks per group (k and k+1 around each q position)
    ranks: dict = {}
    for g, (n, _, _) in ext.items():
        want = set()
        for q in qs:
            pos = (n - 1) * float(q)
            k = int(np.floor(pos))
            want.update((k, min(k + 1, n - 1)))
        ranks[g] = sorted(want)

    # ---- pass 2 + refinement rounds --------------------------------
    # seg_for[(g, k)] -> _Seg ; refinement re-histograms any open seg
    # with count > collect_cap and vmin < vmax.
    seg_for: dict = {}

    def _hist_pass(targets: dict) -> pd.DataFrame:
        """targets: group -> list[(seg_id, levels, (rlo, rhi))]; one
        streaming pass emitting exact (group, seg_id, bin) counters
        with per-bin value extents."""
        t_ref = ray.put(targets)

        def hist(batch: pd.DataFrame) -> pd.DataFrame:
            tg = ray.get(t_ref)
            v = batch[value_col].to_numpy(np.float64)
            gvals = _group_series(batch)
            frames = []
            for g, idx in gvals.groupby(gvals, sort=False).groups.items():
                specs = tg.get(g)
                if not specs:
                    continue
                ii = np.asarray(idx)
                vv = v[ii]
                for seg_id, levels, (rlo, rhi) in specs:
                    m = np.ones(len(vv), dtype=bool)
                    for lo, hi, b in levels:
                        m &= _bin_of(vv, lo, hi, n_bins) == b
                    if not m.any():
                        continue
                    sel = vv[m]
                    sub = _bin_of(sel, rlo, rhi, n_bins)
                    df = pd.DataFrame({"__seg": seg_id, "bin": sub,
                                       "v": sel})
                    part = (df.groupby(["__seg", "bin"], sort=False)["v"]
                            .agg(cnt="size", vmin="min", vmax="max")
                            .reset_index())
                    for k_, gv in zip(keys, g if isinstance(g, tuple)
                                      else (g,)):
                        part[k_] = gv
                    frames.append(part)
            cols = keys + ["__seg", "bin", "cnt", "vmin", "vmax"]
            if not frames:
                return pd.DataFrame({**{k_: pd.Series(dtype=batch[k_].dtype)
                                         for k_ in keys},
                                     "__seg": pd.Series(dtype=np.int64),
                                     "bin": pd.Series(dtype=np.int64),
                                     "cnt": pd.Series(dtype=np.int64),
                                     "vmin": pd.Series(dtype=np.float64),
                                     "vmax": pd.Series(dtype=np.float64)})
            return pd.concat(frames, ignore_index=True)[cols]

        return shuffle.group_agg(
            ds.map_batches(hist, batch_format="pandas"),
            keys + ["__seg", "bin"],
            {"cnt": ("cnt", "sum"), "vmin": ("vmin", "min"),
             "vmax": ("vmax", "max")}, partial=False).to_pandas()

    # round 0: whole-group histograms (seg_id 0 per group, no levels)
    targets = {g: [(0, (), (lo, hi))] for g, (_, lo, hi) in ext.items()}
    seg_meta = {g: {0: ((), 0)} for g in ext}  # seg_id -> (levels, start)
    rounds = 0
    while targets:
        hist_df = _hist_pass(targets)
        gcol = (hist_df[keys[0]] if len(keys) == 1
                else list(zip(*[hist_df[k] for k in keys])))
        hist_df = hist_df.assign(__g=pd.Series(gcol, index=hist_df.index))
        next_targets: dict = {}
        next_meta: dict = {}
        next_id = 0
        for g, specs in targets.items():
            sub_all = hist_df[hist_df["__g"] == g] if len(hist_df) else \
                hist_df
            for seg_id, levels, (rlo, rhi) in specs:
                parent_levels, parent_start = seg_meta[g][seg_id]
                sub = sub_all[sub_all["__seg"] == seg_id].sort_values("bin")
                bins_arr = sub["bin"].to_numpy()
                cnts = sub["cnt"].to_numpy()
                vmins = sub["vmin"].to_numpy()
                vmaxs = sub["vmax"].to_numpy()
                cum = np.concatenate([[0], np.cumsum(cnts)])
                # which needed ranks live inside this segment?
                seg_count = int(cum[-1])
                for k in ranks[g]:
                    lk = k - parent_start
                    if not (0 <= lk < seg_count):
                        continue
                    j = int(np.searchsorted(cum, lk, side="right")) - 1
                    b = int(bins_arr[j])
                    child = _Seg(parent_levels + ((rlo, rhi, b),),
                                 parent_start + int(cum[j]), int(cnts[j]),
                                 float(vmins[j]), float(vmaxs[j]))
                    seg_for[(g, k)] = child
                    if child.count > collect_cap and child.vmin < child.vmax:
                        key2 = (g, child.levels)
                        # one refinement target per distinct child seg
                        existing = next_meta.get(key2)
                        if existing is None:
                            sid = next_id
                            next_id += 1
                            next_meta[key2] = (sid, child)
                            next_targets.setdefault(g, []).append(
                                (sid, child.levels,
                                 (child.vmin, child.vmax)))
        targets = next_targets
        seg_meta = {}
        for (g, _levels), (sid, child) in next_meta.items():
            seg_meta.setdefault(g, {})[sid] = (child.levels,
                                               child.start_rank)
        rounds += 1
        if rounds > 64:      # 1024^64 rows — unreachable safety valve
            raise RuntimeError("group_quantiles failed to converge")

    # ---- pass 3: targeted value collect (sub-cap segments only) ----
    open_segs: dict = {}      # group -> list[(sid, _Seg)]
    seg_sid: dict = {}        # (g, levels) -> sid
    sid_counter = 0
    for (g, k), seg in seg_for.items():
        if seg.vmin >= seg.vmax:      # constant segment — no collect
            continue
        key2 = (g, seg.levels)
        if key2 not in seg_sid:
            seg_sid[key2] = sid_counter
            open_segs.setdefault(g, []).append((sid_counter, seg))
            sid_counter += 1
    coll: dict = {}           # (g, sid) -> sorted np.ndarray of values
    if open_segs:
        o_ref = ray.put(open_segs)

        def pick(batch: pd.DataFrame) -> pd.DataFrame:
            og = ray.get(o_ref)
            v = batch[value_col].to_numpy(np.float64)
            gvals = _group_series(batch)
            frames = []
            for g, idx in gvals.groupby(gvals, sort=False).groups.items():
                specs = og.get(g)
                if not specs:
                    continue
                ii = np.asarray(idx)
                vv = v[ii]
                for sid, seg in specs:
                    sel = vv[seg.member_mask(vv, n_bins)]
                    if not len(sel):
                        continue
                    part = pd.DataFrame({"__sid": sid, "v": sel})
                    for k_, gv in zip(keys, g if isinstance(g, tuple)
                                      else (g,)):
                        part[k_] = gv
                    frames.append(part)
            if not frames:
                return pd.DataFrame({**{k_: pd.Series(dtype=batch[k_].dtype)
                                         for k_ in keys},
                                     "__sid": pd.Series(dtype=np.int64),
                                     "v": pd.Series(dtype=np.float64)})
            return pd.concat(frames, ignore_index=True)[keys + ["__sid",
                                                                "v"]]

        cand = ds.map_batches(pick, batch_format="pandas").to_pandas()
        gcol = (cand[keys[0]] if len(keys) == 1
                else list(zip(*[cand[k] for k in keys])))
        cand = cand.assign(__g=pd.Series(gcol, index=cand.index))
        for (g, sid), sub in cand.groupby(["__g", "__sid"], sort=False):
            coll[(g, sid)] = np.sort(sub["v"].to_numpy())

    # ---- exact interpolation from resolved segments ----------------
    def value_at(g, k: int) -> float:
        seg = seg_for[(g, k)]
        if seg.vmin >= seg.vmax:
            return seg.vmin
        vals = coll[(g, seg_sid[(g, seg.levels)])]
        return float(vals[k - seg.start_rank])

    rows = []
    for g, (n, lo, hi) in ext.items():
        gk = g if isinstance(g, tuple) else (g,)
        row = dict(zip(keys, gk))
        for q in qs:
            pos = (n - 1) * float(q)
            k = int(np.floor(pos))
            frac = pos - k
            x0 = value_at(g, k)
            x1 = value_at(g, min(k + 1, n - 1))
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


def group_variance(ds: ray.data.Dataset, keys, value_col: str,
                   scale: int = 100,
                   num_buckets: int = shuffle.DEFAULT_BUCKETS,
                   ) -> ray.data.Dataset:
    """Per-key count / mean / POPULATION variance of a fixed-precision
    numeric column, bit-exact across any block layout: values are
    quantized once to integer units (``floor(x*scale + 0.5)`` — the
    engine's established round-mode-neutral expression), the shuffled
    aggregates are INT64 sums of units and squared units (immune to
    float addition order), and the two float expressions that produce
    mean/var are evaluated in one fixed order shared with the SQL twin
    (``(s/scale)/n`` and ``(ss/scale²)/n − mean²``).

    Unit sums must stay under 2⁵³ for the final exact float cast —
    fine for 2-dp metrics up to ~10¹² rows per group; beyond that,
    shard groups by a salt and merge, or accept float partials.
    Output ``(keys…, n, mean, var)``."""
    keys = list(keys)
    fs = float(scale)

    def to_units(b: pd.DataFrame) -> pd.DataFrame:
        u = np.floor(b[value_col].to_numpy(np.float64) * fs + 0.5
                     ).astype(np.int64)
        out = b[keys].copy()
        out["__u"] = u
        out["__u2"] = u * u
        return out

    agg = shuffle.group_agg(
        ds.map_batches(to_units, batch_format="pandas"), keys,
        {"n": ("__u", "size"), "s": ("__u", "sum"),
         "ss": ("__u2", "sum")}, num_buckets=num_buckets)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n"].to_numpy(np.int64)
        s = b["s"].to_numpy(np.int64)
        ss = b["ss"].to_numpy(np.int64)
        mean = (s / fs) / n
        var = (ss / (fs * fs)) / n - mean * mean
        out = b[keys].copy()
        out["n"] = n
        out["mean"] = mean
        out["var"] = var
        return out

    return agg.map_batches(finish, batch_format="pandas")


def group_linreg(ds: ray.data.Dataset, keys, x_col: str, y_col: str,
                 x_scale: int = 1, y_scale: int = 100,
                 num_buckets: int = shuffle.DEFAULT_BUCKETS,
                 ) -> ray.data.Dataset:
    """Per-key ordinary-least-squares fit ``y = slope·x + intercept``,
    bit-exact across any block layout: both columns quantize once to
    integer units (``floor(v·scale + 0.5)``), the five shuffled
    moments (n, Σx, Σy, Σxy, Σx²) are exact int64 sums, and the final
    slope/intercept expressions are evaluated in ONE fixed order
    shared with the SQL twin:

        num   = n·Σxy − Σx·Σy          (int64, exact)
        den   = n·Σx² − Σx·Σx          (int64, exact)
        slope = (num / den) · (x_scale / y_scale)   [as written]
        intercept = (Σy/y_scale − slope·(Σx/x_scale)·y?) — see below

    implemented as ``slope_u = num/den`` (exact-int division → the
    identical double), then ``slope = slope_u * (x_scale/y_scale)``
    and ``intercept = (sy/(n·y_scale)) − slope·(sx/(n·x_scale))``.
    Caller must pick scales so every moment stays below 2⁵³ (e.g. x in
    hours-since-window, y in cents) — documented contract, same as
    `group_variance`.  Groups with zero x-variance emit NaN slope.
    Output ``(keys…, n, slope, intercept)``."""
    keys = list(keys)
    fx, fy = float(x_scale), float(y_scale)

    def to_units(b: pd.DataFrame) -> pd.DataFrame:
        xu = np.floor(b[x_col].to_numpy(np.float64) * fx + 0.5
                      ).astype(np.int64)
        yu = np.floor(b[y_col].to_numpy(np.float64) * fy + 0.5
                      ).astype(np.int64)
        out = b[keys].copy()
        out["__x"] = xu
        out["__y"] = yu
        out["__xy"] = xu * yu
        out["__xx"] = xu * xu
        return out

    agg = shuffle.group_agg(
        ds.map_batches(to_units, batch_format="pandas"), keys,
        {"n": ("__x", "size"), "sx": ("__x", "sum"),
         "sy": ("__y", "sum"), "sxy": ("__xy", "sum"),
         "sxx": ("__xx", "sum")}, num_buckets=num_buckets)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n"].to_numpy(np.int64)
        sx = b["sx"].to_numpy(np.int64)
        sy = b["sy"].to_numpy(np.int64)
        sxy = b["sxy"].to_numpy(np.int64)
        sxx = b["sxx"].to_numpy(np.int64)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        with np.errstate(divide="ignore", invalid="ignore"):
            slope_u = np.where(den != 0, num / np.where(den != 0, den,
                                                        1), np.nan)
        slope = slope_u * (fx / fy)
        intercept = (sy / (n * fy)) - slope * (sx / (n * fx))
        out = b[keys].copy()
        out["n"] = n
        out["slope"] = slope
        out["intercept"] = intercept
        return out

    return agg.map_batches(finish, batch_format="pandas")


def zscore_filter(ds: ray.data.Dataset, keys, value_col: str,
                  threshold: float = 2.0, scale: int = 100,
                  num_buckets: int = shuffle.DEFAULT_BUCKETS,
                  ) -> ray.data.Dataset:
    """Per-key z-score outlier screen: keep rows with
    ``|value - mean_key| / sqrt(var_key) > threshold``, appending the
    score as ``z``.  Bit-exact: the per-key moments come from
    :func:`group_variance` (int64 unit sums, fixed-order float
    finish), and z is the same three-op float expression in both
    engines; sqrt of an identical double is identical.

    The moment table is one row per key — it broadcasts to every
    filter task via the object store (``ray.put`` once, zero-copy
    reads), so the corpus itself streams with NO second shuffle.
    Degenerate keys (var == 0) emit nothing, matching the SQL twin's
    NULL-comparison semantics.
    """
    import ray

    keys = list(keys)
    stats = group_variance(ds, keys, value_col, scale=scale,
                           num_buckets=num_buckets).to_pandas()
    stats["__std"] = np.sqrt(stats["var"].to_numpy(np.float64))
    lookup_ref = ray.put(stats.set_index(keys)[["mean", "__std"]])

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(lookup_ref)
        m = b.join(lookup, on=keys)
        v = b[value_col].to_numpy(np.float64)
        std = m["__std"].to_numpy(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (v - m["mean"].to_numpy(np.float64)) / std
        keep = (std > 0) & (np.abs(z) > threshold)
        out = b[keep].copy()
        out["z"] = z[keep]
        return out

    return ds.map_batches(fn, batch_format="pandas")


def group_corr(ds: ray.data.Dataset, keys, x_col: str, y_col: str,
               scale_x: int = 100, scale_y: int = 100,
               num_buckets: int = shuffle.DEFAULT_BUCKETS,
               ) -> ray.data.Dataset:
    """Per-key Pearson correlation of two fixed-precision columns,
    bit-exact across layouts and engines: both columns quantize to
    integer units, five int64 moment sums shuffle (order-immune), and
    the correlation is ONE fixed-order float expression
    ``((n·sxy) − (sx·sy)) / (sqrt((n·sxx) − sx²) · sqrt((n·syy) − sy²))``
    with every operand an int64→double cast (deterministic nearest).
    Affine quantization cancels in Pearson r up to that quantization,
    so pick scales that keep ``sum(unit²)`` inside int64 — e.g.
    integral columns at scale 1 (see the squared-sum bound note on
    :func:`group_variance`).  Keys with zero variance in either column
    yield NaN, matching SQL NULL semantics only if filtered — callers
    wanting SQL-twin parity should drop those keys or accept NaN rows.
    Output ``(keys…, n, corr)``."""
    keys = list(keys)
    fx, fy = float(scale_x), float(scale_y)

    def to_units(b: pd.DataFrame) -> pd.DataFrame:
        ux = np.floor(b[x_col].to_numpy(np.float64) * fx + 0.5
                      ).astype(np.int64)
        uy = np.floor(b[y_col].to_numpy(np.float64) * fy + 0.5
                      ).astype(np.int64)
        out = b[keys].copy()
        out["__x"] = ux
        out["__y"] = uy
        out["__xx"] = ux * ux
        out["__yy"] = uy * uy
        out["__xy"] = ux * uy
        return out

    agg = shuffle.group_agg(
        ds.map_batches(to_units, batch_format="pandas"), keys,
        {"n": ("__x", "size"), "sx": ("__x", "sum"),
         "sy": ("__y", "sum"), "sxx": ("__xx", "sum"),
         "syy": ("__yy", "sum"), "sxy": ("__xy", "sum")},
        num_buckets=num_buckets)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n"].to_numpy(np.int64).astype(np.float64)
        sx = b["sx"].to_numpy(np.int64).astype(np.float64)
        sy = b["sy"].to_numpy(np.int64).astype(np.float64)
        sxx = b["sxx"].to_numpy(np.int64).astype(np.float64)
        syy = b["syy"].to_numpy(np.int64).astype(np.float64)
        sxy = b["sxy"].to_numpy(np.int64).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = ((n * sxy) - (sx * sy)) / (
                np.sqrt((n * sxx) - (sx * sx))
                * np.sqrt((n * syy) - (sy * sy)))
        out = b[keys].copy()
        out["n"] = b["n"].to_numpy(np.int64)
        out["corr"] = corr
        return out

    return agg.map_batches(finish, batch_format="pandas")


def morans_i(grid: ray.data.Dataset, col_c: str = "c", col_r: str = "r",
             val: str = "v", num_buckets: int = 16) -> pd.DataFrame:
    """Global Moran's I under binary queen contiguity over a sparse
    integer raster — THE spatial-autocorrelation statistic (Moran
    1950; the PySAL ``esda.Moran`` analogue, binary unstandardized
    weights)::

        I = (n · Σ_{i adj j} z_i z_j) / (W · Σ_i z_i²),  z_i = v_i − v̄

    All moments are integer cross-multiplied (``z·n = n·v_i − Σv``, the
    n² cancels in the ratio), so both engines sum exact int64 partials
    and perform ONE identical double division at the end — bit-exact.
    Inputs must be int64 with ``n·|v|`` within int64.

    Distributed shape: two driver scalars (n, Σv), one 8-neighbor ring
    scatter FROM existing cells plus a self marker row, one keyed sum
    per cell (phantom centers — scatter targets that aren't real cells
    — are dropped by the marker), one global partial-sum reduce.  No
    joins, no adjacency materialization beyond the scatter.
    Returns a one-row DataFrame (n_cells, w_sum, moran_i).
    """
    g = grid.map_batches(
        lambda b: pd.DataFrame({
            "c": b[col_c].to_numpy(np.int64),
            "r": b[col_r].to_numpy(np.int64),
            "v": b[val].to_numpy(np.int64)}),
        batch_format="pandas").materialize()
    n = g.count()
    if n < 2:
        raise ValueError("Moran's I needs >= 2 cells")
    sv = g.sum("v")
    n64, sv64 = np.int64(n), np.int64(sv)
    off = np.array([(dc, dr) for dc in (-1, 0, 1) for dr in (-1, 0, 1)
                    if not (dc == 0 and dr == 0)], np.int64)

    def scatter(b: pd.DataFrame) -> pd.DataFrame:
        c = b["c"].to_numpy(np.int64)
        r = b["r"].to_numpy(np.int64)
        z = n64 * b["v"].to_numpy(np.int64) - sv64
        m = len(b)
        return pd.DataFrame({
            "c": np.concatenate([np.repeat(c, 8) + np.tile(off[:, 0], m), c]),
            "r": np.concatenate([np.repeat(r, 8) + np.tile(off[:, 1], m), r]),
            "zn": np.concatenate([np.repeat(z, 8), np.zeros(m, np.int64)]),
            "wn": np.concatenate([np.ones(8 * m, np.int64),
                                  np.zeros(m, np.int64)]),
            "own": np.concatenate([np.zeros(8 * m, np.int64),
                                   np.ones(m, np.int64)]),
            "zown": np.concatenate([np.zeros(8 * m, np.int64), z])})

    percell = shuffle.group_agg(
        g.map_batches(scatter, batch_format="pandas"),
        ["c", "r"], {"zn": ("zn", "sum"), "wn": ("wn", "sum"),
                     "own": ("own", "sum"), "zown": ("zown", "sum")},
        num_buckets=num_buckets)

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        keep = b["own"].to_numpy(np.int64) == 1
        zc = b["zown"].to_numpy(np.int64)[keep]
        zn = b["zn"].to_numpy(np.int64)[keep]
        wn = b["wn"].to_numpy(np.int64)[keep]
        return pd.DataFrame({"num": [int((zc * zn).sum())],
                             "w": [int(wn.sum())],
                             "den": [int((zc * zc).sum())]})

    p = percell.map_batches(partials, batch_format="pandas").to_pandas()
    num, w, den = (int(p["num"].sum()), int(p["w"].sum()),
                   int(p["den"].sum()))
    moran = ((np.float64(n) * np.float64(num))
             / (np.float64(w) * np.float64(den)))
    return pd.DataFrame({"n_cells": np.array([n], np.int64),
                         "w_sum": np.array([w], np.int64),
                         "moran_i": np.array([moran], np.float64)})


def local_morans_i(grid: ray.data.Dataset, col_c: str = "c",
                   col_r: str = "r", val: str = "v",
                   num_buckets: int = 16) -> ray.data.Dataset:
    """Local Moran's I (Anselin 1995 LISA) per cell under binary queen
    weights::

        I_i = (n · z_i · Σ_{j adj i} z_j) / Σ_k z_k²

    with the same n-scaled integer z as :func:`morans_i` (the global
    n² cancels against one n in the classic m2 normalizer).  Every
    numerator is exact int64; the single shared denominator is an
    exact int64 driver scalar; each row does ONE identical double
    division — bit-exact.  Output (c, r, v, lag_z, lisa) for every
    cell, streaming (no driver rows): unlike :func:`morans_i` the
    result is per-cell, so the reduce stays distributed.
    """
    g = grid.map_batches(
        lambda b: pd.DataFrame({
            "c": b[col_c].to_numpy(np.int64),
            "r": b[col_r].to_numpy(np.int64),
            "v": b[val].to_numpy(np.int64)}),
        batch_format="pandas").materialize()
    n = g.count()
    if n < 2:
        raise ValueError("local Moran's I needs >= 2 cells")
    sv = g.sum("v")
    n64, sv64 = np.int64(n), np.int64(sv)
    off = np.array([(dc, dr) for dc in (-1, 0, 1) for dr in (-1, 0, 1)
                    if not (dc == 0 and dr == 0)], np.int64)

    def scatter(b: pd.DataFrame) -> pd.DataFrame:
        c = b["c"].to_numpy(np.int64)
        r = b["r"].to_numpy(np.int64)
        v = b["v"].to_numpy(np.int64)
        z = n64 * v - sv64
        m = len(b)
        return pd.DataFrame({
            "c": np.concatenate([np.repeat(c, 8) + np.tile(off[:, 0], m), c]),
            "r": np.concatenate([np.repeat(r, 8) + np.tile(off[:, 1], m), r]),
            "zn": np.concatenate([np.repeat(z, 8), np.zeros(m, np.int64)]),
            "own": np.concatenate([np.zeros(8 * m, np.int64),
                                   np.ones(m, np.int64)]),
            "vown": np.concatenate([np.zeros(8 * m, np.int64), v])})

    percell = shuffle.group_agg(
        g.map_batches(scatter, batch_format="pandas"),
        ["c", "r"], {"zn": ("zn", "sum"), "own": ("own", "sum"),
                     "vown": ("vown", "sum")},
        num_buckets=num_buckets)

    # shared denominator Σ z² as one exact scalar (two tiny passes)
    den = int(g.map_batches(
        lambda b: pd.DataFrame({"d": [int(((n64 * b["v"].to_numpy(np.int64)
                                            - sv64).astype(object) ** 2
                                           ).sum())]}),
        batch_format="pandas").to_pandas()["d"].sum())

    dden = np.float64(den)
    dn = np.float64(n)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        keep = b["own"].to_numpy(np.int64) == 1
        c = b["c"].to_numpy(np.int64)[keep]
        r = b["r"].to_numpy(np.int64)[keep]
        v = b["vown"].to_numpy(np.int64)[keep]
        zn = b["zn"].to_numpy(np.int64)[keep]
        z = n64 * v - sv64
        return pd.DataFrame({
            "c": c, "r": r, "v": v, "lag_z": zn,
            "lisa": (dn * (z.astype(np.float64)
                           * zn.astype(np.float64))) / dden})

    return percell.map_batches(finish, batch_format="pandas")


def gearys_c(grid: ray.data.Dataset, col_c: str = "c", col_r: str = "r",
             val: str = "v", num_buckets: int = 16) -> pd.DataFrame:
    """Geary's C under binary queen contiguity — the local-contrast
    complement of :func:`morans_i` (C < 1 clustered, > 1 dispersed)::

        C = ((n−1) · Σ_{i adj j} (v_i − v_j)²) / (2W · Σ_i (v_i − v̄)²)

    Integer path: Σ(v_i−v_j)² per center expands to
    ``deg·v_i² − 2·v_i·Σ_j v_j + Σ_j v_j²`` — three exact int64 ring
    sums; the variance denominator reuses the n-scaled z (so it is
    ``Σz²/n²``, and the n² joins the numerator).  Final statistic is
    one mirrored chain of double products/divides.  Returns one row
    (n_cells, w_sum, geary_c).
    """
    g = grid.map_batches(
        lambda b: pd.DataFrame({
            "c": b[col_c].to_numpy(np.int64),
            "r": b[col_r].to_numpy(np.int64),
            "v": b[val].to_numpy(np.int64)}),
        batch_format="pandas").materialize()
    n = g.count()
    if n < 2:
        raise ValueError("Geary's C needs >= 2 cells")
    sv = g.sum("v")
    n64, sv64 = np.int64(n), np.int64(sv)
    off = np.array([(dc, dr) for dc in (-1, 0, 1) for dr in (-1, 0, 1)
                    if not (dc == 0 and dr == 0)], np.int64)

    def scatter(b: pd.DataFrame) -> pd.DataFrame:
        c = b["c"].to_numpy(np.int64)
        r = b["r"].to_numpy(np.int64)
        v = b["v"].to_numpy(np.int64)
        m = len(b)
        return pd.DataFrame({
            "c": np.concatenate([np.repeat(c, 8) + np.tile(off[:, 0], m), c]),
            "r": np.concatenate([np.repeat(r, 8) + np.tile(off[:, 1], m), r]),
            "sv1": np.concatenate([np.repeat(v, 8), np.zeros(m, np.int64)]),
            "sv2": np.concatenate([np.repeat(v * v, 8),
                                   np.zeros(m, np.int64)]),
            "wn": np.concatenate([np.ones(8 * m, np.int64),
                                  np.zeros(m, np.int64)]),
            "own": np.concatenate([np.zeros(8 * m, np.int64),
                                   np.ones(m, np.int64)]),
            "vown": np.concatenate([np.zeros(8 * m, np.int64), v])})

    percell = shuffle.group_agg(
        g.map_batches(scatter, batch_format="pandas"),
        ["c", "r"], {"sv1": ("sv1", "sum"), "sv2": ("sv2", "sum"),
                     "wn": ("wn", "sum"), "own": ("own", "sum"),
                     "vown": ("vown", "sum")},
        num_buckets=num_buckets)

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        keep = b["own"].to_numpy(np.int64) == 1
        v = b["vown"].to_numpy(np.int64)[keep]
        s1 = b["sv1"].to_numpy(np.int64)[keep]
        s2 = b["sv2"].to_numpy(np.int64)[keep]
        wn = b["wn"].to_numpy(np.int64)[keep]
        z = n64 * v - sv64
        return pd.DataFrame({
            "num": [int((wn * v * v - 2 * v * s1 + s2).sum())],
            "w": [int(wn.sum())],
            "den": [int((z.astype(object) ** 2).sum())]})

    p = percell.map_batches(partials, batch_format="pandas").to_pandas()
    num, w, den = (int(p["num"].sum()), int(p["w"].sum()),
                   int(p["den"].sum()))
    c_stat = ((np.float64(n - 1) * (np.float64(n) * np.float64(n))
               * np.float64(num))
              / (np.float64(2 * w) * np.float64(den)))
    return pd.DataFrame({"n_cells": np.array([n], np.int64),
                         "w_sum": np.array([w], np.int64),
                         "geary_c": np.array([c_stat], np.float64)})


def join_counts(grid: ray.data.Dataset, col_c: str = "c",
                col_r: str = "r", val: str = "v",
                num_buckets: int = 16) -> pd.DataFrame:
    """Join-count statistics (Cliff & Ord) for a BINARY cell attribute
    under queen contiguity — the categorical sibling of
    :func:`morans_i`: counts of Black-Black, White-White and
    Black-White neighbor pairs (each unordered pair once).  All-int64
    pipeline: one 8-way ring scatter of (1, v) per cell, one keyed
    sum, then per-center pair counts

        bb2_i = v_i · nb_black_i          (BB pairs, counted twice)
        ww2_i = (1−v_i) · (nb_i − nb_black_i)
        bw2_i = v_i·(nb_i − nb_black_i) + (1−v_i)·nb_black_i

    summed and halved on the driver.  ``val`` must be 0/1.  Returns
    one row (n_cells, n_black, w_pairs, bb, ww, bw).
    """
    off = np.array([(dc, dr) for dc in (-1, 0, 1) for dr in (-1, 0, 1)
                    if not (dc == 0 and dr == 0)], np.int64)

    def scatter(b: pd.DataFrame) -> pd.DataFrame:
        c = b[col_c].to_numpy(np.int64)
        r = b[col_r].to_numpy(np.int64)
        v = b[val].to_numpy(np.int64)
        if len(v) and not np.isin(v, (0, 1)).all():
            raise ValueError("join_counts needs a 0/1 attribute")
        m = len(b)
        return pd.DataFrame({
            "c": np.concatenate([np.repeat(c, 8) + np.tile(off[:, 0], m), c]),
            "r": np.concatenate([np.repeat(r, 8) + np.tile(off[:, 1], m), r]),
            "nb": np.concatenate([np.ones(8 * m, np.int64),
                                  np.zeros(m, np.int64)]),
            "nbb": np.concatenate([np.repeat(v, 8), np.zeros(m, np.int64)]),
            "own": np.concatenate([np.zeros(8 * m, np.int64),
                                   np.ones(m, np.int64)]),
            "vown": np.concatenate([np.zeros(8 * m, np.int64), v])})

    percell = shuffle.group_agg(
        grid.map_batches(scatter, batch_format="pandas"),
        ["c", "r"], {"nb": ("nb", "sum"), "nbb": ("nbb", "sum"),
                     "own": ("own", "sum"), "vown": ("vown", "sum")},
        num_buckets=num_buckets)

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        keep = b["own"].to_numpy(np.int64) == 1
        v = b["vown"].to_numpy(np.int64)[keep]
        nb = b["nb"].to_numpy(np.int64)[keep]
        nbb = b["nbb"].to_numpy(np.int64)[keep]
        return pd.DataFrame({
            "n": [int(keep.sum())], "blk": [int(v.sum())],
            "w2": [int(nb.sum())],
            "bb2": [int((v * nbb).sum())],
            "ww2": [int(((1 - v) * (nb - nbb)).sum())],
            "bw2": [int((v * (nb - nbb) + (1 - v) * nbb).sum())]})

    p = percell.map_batches(partials, batch_format="pandas").to_pandas()
    return pd.DataFrame({
        "n_cells": np.array([p["n"].sum()], np.int64),
        "n_black": np.array([p["blk"].sum()], np.int64),
        "w_pairs": np.array([p["w2"].sum() // 2], np.int64),
        "bb": np.array([p["bb2"].sum() // 2], np.int64),
        "ww": np.array([p["ww2"].sum() // 2], np.int64),
        "bw": np.array([p["bw2"].sum() // 2], np.int64)})


def general_g(grid: ray.data.Dataset, col_c: str = "c", col_r: str = "r",
              val: str = "v", num_buckets: int = 16) -> pd.DataFrame:
    """Getis–Ord General G statistic under binary queen contiguity —
    the global hot-spot concentration measure::

        G = Σ_{i adj j} x_i·x_j  /  Σ_{i≠j} x_i·x_j

    (``x ≥ 0`` required, as in the original definition).  Numerator by
    one 8-way ring scatter + keyed sum (Σ x_i · ringsum_i); the
    denominator is ``(Σx)² − Σx²`` — two streamed scalars.  All int64,
    one final division.  Returns one row
    (n_cells, w_sum, g_num, g_den, general_g).
    """
    off = np.array([(dc, dr) for dc in (-1, 0, 1) for dr in (-1, 0, 1)
                    if not (dc == 0 and dr == 0)], np.int64)

    def scatter(b: pd.DataFrame) -> pd.DataFrame:
        c = b[col_c].to_numpy(np.int64)
        r = b[col_r].to_numpy(np.int64)
        v = b[val].to_numpy(np.int64)
        if len(v) and v.min() < 0:
            raise ValueError("general_g needs nonnegative values")
        m = len(b)
        return pd.DataFrame({
            "c": np.concatenate([np.repeat(c, 8) + np.tile(off[:, 0], m), c]),
            "r": np.concatenate([np.repeat(r, 8) + np.tile(off[:, 1], m), r]),
            "sv": np.concatenate([np.repeat(v, 8), np.zeros(m, np.int64)]),
            "wn": np.concatenate([np.ones(8 * m, np.int64),
                                  np.zeros(m, np.int64)]),
            "own": np.concatenate([np.zeros(8 * m, np.int64),
                                   np.ones(m, np.int64)]),
            "vown": np.concatenate([np.zeros(8 * m, np.int64), v])})

    percell = shuffle.group_agg(
        grid.map_batches(scatter, batch_format="pandas"),
        ["c", "r"], {"sv": ("sv", "sum"), "wn": ("wn", "sum"),
                     "own": ("own", "sum"), "vown": ("vown", "sum")},
        num_buckets=num_buckets)

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        keep = b["own"].to_numpy(np.int64) == 1
        v = b["vown"].to_numpy(np.int64)[keep]
        sv = b["sv"].to_numpy(np.int64)[keep]
        wn = b["wn"].to_numpy(np.int64)[keep]
        return pd.DataFrame({
            "n": [int(keep.sum())], "w": [int(wn.sum())],
            "num": [int((v * sv).sum())],
            "sx": [int(v.sum())], "sx2": [int((v * v).sum())]})

    p = percell.map_batches(partials, batch_format="pandas").to_pandas()
    n, w = int(p["n"].sum()), int(p["w"].sum())
    num = int(p["num"].sum())
    sx, sx2 = int(p["sx"].sum()), int(p["sx2"].sum())
    den = sx * sx - sx2
    if den == 0:
        raise ValueError("General G undefined: all-pairs sum is zero")
    return pd.DataFrame({
        "n_cells": np.array([n], np.int64),
        "w_sum": np.array([w], np.int64),
        "g_num": np.array([num], np.int64),
        "g_den": np.array([den], np.int64),
        "general_g": np.array([np.float64(num) / np.float64(den)],
                              np.float64)})


def gini_moments(ds: ray.data.Dataset, value_col: str, id_col: str,
                 scale: int = 100) -> ray.data.Dataset:
    """Exact Gini-coefficient raw moments over a fixed-precision
    column: one row ``(n, sum_units, rank_weighted_sum)`` — all int64
    — from which ``G = (2·RWS - (n+1)·SU) / (n·SU)`` is a client-side
    float.  Values quantize once to units (floor(v·scale+0.5));
    the global ascending rank (ties broken by ``id_col``) comes from
    :func:`shuffle.global_row_number` (range sort + per-block offset
    stamp, no driver rows); the three sums are per-block partials plus
    a 1-row reduce.  int64 bound: RWS ≤ n²·max_units — fine through
    ~10^8 rows of 10^6-unit values, document beyond.
    """
    from city2graph_ray import shuffle

    def to_units(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "u": np.floor(b[value_col].to_numpy(np.float64)
                          * scale + 0.5).astype(np.int64),
            "i": b[id_col].to_numpy(np.int64)})

    ranked = shuffle.global_row_number(
        ds.map_batches(to_units, batch_format="pandas"), ["u", "i"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        u = b["u"].to_numpy(np.int64)
        rn = b["rn"].to_numpy(np.int64)
        return pd.DataFrame({"k": np.zeros(1, np.int64),
                             "n": [len(b)],
                             "su": [int(u.sum())],
                             "rws": [int((rn * u).sum())]})

    out = shuffle.group_agg(
        ranked.map_batches(partial, batch_format="pandas"),
        ["k"], {"n": ("n", "sum"), "sum_units": ("su", "sum"),
                "rank_weighted_sum": ("rws", "sum")}, num_buckets=1)
    return out.map_batches(
        lambda b: b[["n", "sum_units", "rank_weighted_sum"]],
        batch_format="pandas")


def benford_profile(ds: ray.data.Dataset, value_col: str,
                    scale: int = 100) -> ray.data.Dataset:
    """Benford first-digit profile (Newcomb 1881 / Benford 1938,
    public literature) of a fixed-precision positive column: count per
    leading digit 1–9 of the integer units (floor(v·scale+0.5) > 0).
    Output rows ``(digit, n)`` int64 sorted by digit — the expected
    log10(1+1/d) comparison is a client-side constant.  Per-block
    partial counts (digit extracted from the decimal string — exact,
    no float log10 edge cases), one ≤9-row keyed sum.
    """
    from city2graph_ray import shuffle

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        u = np.floor(b[value_col].to_numpy(np.float64)
                     * scale + 0.5).astype(np.int64)
        u = u[u > 0]
        if len(u) == 0:
            return pd.DataFrame({"digit": np.array([], np.int64),
                                 "n": np.array([], np.int64)})
        d = pd.Series(u).astype(str).str[0].astype(np.int64)
        vc = d.value_counts()
        return pd.DataFrame({"digit": vc.index.to_numpy(np.int64),
                             "n": vc.to_numpy(np.int64)})

    out = shuffle.group_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["digit"], {"n": ("n", "sum")}, num_buckets=1)
    return out.map_batches(
        lambda b: b.sort_values("digit")[["digit", "n"]],
        batch_format="pandas")


def group_dispersion_moments(ds: ray.data.Dataset, keys,
                             x_col: str, y_col: str,
                             num_buckets: int = shuffle.DEFAULT_BUCKETS,
                             ) -> ray.data.Dataset:
    """Per-key bivariate dispersion raw moments over INTEGER coords —
    the exact substrate of the standard-deviational-ellipse / spatial
    dispersion statistics (Lefever 1926, public literature): per key
    ``(n, sx, sy, sxx, syy, sxy)`` all int64, from which mean center,
    axis variances and ellipse rotation are client-side floats.

    One partial-aggregated keyed sum: the six products are computed
    per batch (int64, overflow bound n·max² documented at call sites)
    and combine associatively, so blocks pre-reduce before the
    shuffle.
    """
    from city2graph_ray import shuffle

    keys = list(keys)

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        x = b[x_col].to_numpy(np.int64)
        y = b[y_col].to_numpy(np.int64)
        out = b[keys].copy()
        out["sx"], out["sy"] = x, y
        out["sxx"], out["syy"], out["sxy"] = x * x, y * y, x * y
        out["n"] = np.ones(len(b), np.int64)
        return out

    return shuffle.group_agg(
        ds.map_batches(pre, batch_format="pandas"), keys,
        {"n": ("n", "sum"), "sx": ("sx", "sum"), "sy": ("sy", "sum"),
         "sxx": ("sxx", "sum"), "syy": ("syy", "sum"),
         "sxy": ("sxy", "sum")}, num_buckets=num_buckets)


def lag_autocorr(ds: ray.data.Dataset, key_col: str, ts_col: str,
                 value_col: str, tiebreak_col: str, lag: int = 1,
                 scale: int = 100, ndigits: int = 6,
                 num_buckets: int = shuffle.DEFAULT_BUCKETS,
                 ) -> ray.data.Dataset:
    """Per-key lag-``lag`` Pearson autocorrelation of ``value_col`` in
    (``ts_col``, ``tiebreak_col``) order, bit-exact across any block
    layout: values quantize once to integer units, each key's
    consecutive (x, y=x₊lag) pairs contribute SIX exact int64 moments
    (n, Σx, Σy, Σxy, Σx², Σy²), and the final

        r = (n·Σxy − Σx·Σy) / (√(n·Σx²−Σx²) · √(n·Σy²−Σy²))

    is evaluated in that one fixed order and rounded, so a SQL LEAD
    twin reproduces it bit-for-bit.  Keys with < lag+1 rows or zero
    variance on either side are dropped (their r is undefined).  One
    keyed shuffle; per-key rows co-locate in a bucket (documented
    assumption: single-key history ≪ bucket memory — same contract as
    sessionize/grouped_ewma above).  Output (key, n_pairs, autocorr)."""
    f = float(scale)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, tiebreak_col], kind="stable")
        v = np.floor(g[value_col].to_numpy(np.float64) * f + 0.5
                     ).astype(np.int64)
        keys = g[key_col].to_numpy()
        same = np.zeros(len(g), dtype=bool)
        if len(g) > lag:
            same[:-lag] = keys[:-lag] == keys[lag:]
        x = v[:-lag][same[:-lag]] if len(g) > lag else v[:0]
        y = v[lag:][same[:-lag]] if len(g) > lag else v[:0]
        k = keys[:-lag][same[:-lag]] if len(g) > lag else keys[:0]
        pairs = pd.DataFrame({key_col: k, "__x": x, "__y": y,
                              "__xy": x * y, "__xx": x * x,
                              "__yy": y * y})
        m = pairs.groupby(key_col, sort=False).agg(
            n_pairs=("__x", "size"), sx=("__x", "sum"),
            sy=("__y", "sum"), sxy=("__xy", "sum"),
            sxx=("__xx", "sum"), syy=("__yy", "sum")).reset_index()
        n = m["n_pairs"].to_numpy(np.int64)
        sx = m["sx"].to_numpy(np.int64)
        sy = m["sy"].to_numpy(np.int64)
        num = n * m["sxy"].to_numpy(np.int64) - sx * sy
        dx = n * m["sxx"].to_numpy(np.int64) - sx * sx
        dy = n * m["syy"].to_numpy(np.int64) - sy * sy
        ok = (dx > 0) & (dy > 0)
        m = m.loc[ok, [key_col, "n_pairs"]].reset_index(drop=True)
        with np.errstate(invalid="ignore"):
            r = num[ok] / (np.sqrt(dx[ok].astype(np.float64))
                           * np.sqrt(dy[ok].astype(np.float64)))
        m["autocorr"] = np.round(r, ndigits)
        return m

    return shuffle.grouped_transform(ds, [key_col], kernel,
                                     num_buckets=num_buckets)


def contingency_chi2(ds: ray.data.Dataset, row_col: str, col_col: str,
                     ) -> ray.data.Dataset:
    """Pearson χ² contingency table over two integer category columns
    (Pearson 1900, public literature) — the seasonality / independence
    screen (e.g. weekday × hour of an event stream).

    Distributed shape: per-block partial ``(row, col) → count`` maps
    shrink each block to ≤ |rows|×|cols| counter rows, ONE small keyed
    sum merges them, and the finish (marginals + per-cell term) runs
    over the category-cardinality-sized table on the driver — bounded
    by the number of distinct cells, never by data size.

    Exactness: every count and marginal is an int64; the only floats
    are ONE cross-multiplied divide per cell, evaluated in a fixed
    order shared with the SQL twin:
    ``chi2_term = round(double(N·O − R·C)² / (double(N)·R·C), 6)``.
    Output rows ``(row_cat, col_cat, n_obs, row_tot, col_tot, n_total,
    chi2_term)``; the statistic is ``sum(chi2_term)`` client-side.
    """
    from city2graph_ray import shuffle

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby([row_col, col_col], sort=False)
              .size().reset_index(name="n_obs"))
        return pd.DataFrame({
            "row_cat": g[row_col].to_numpy(np.int64),
            "col_cat": g[col_col].to_numpy(np.int64),
            "n_obs": g["n_obs"].to_numpy(np.int64)})

    cells = shuffle.group_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["row_cat", "col_cat"], {"n_obs": ("n_obs", "sum")},
        num_buckets=1).to_pandas()
    if len(cells) == 0:
        z = np.array([], np.int64)
        return ray.data.from_pandas(pd.DataFrame({
            "row_cat": z, "col_cat": z, "n_obs": z, "row_tot": z,
            "col_tot": z, "n_total": z,
            "chi2_term": np.array([], np.float64)}))
    o = cells["n_obs"].to_numpy(np.int64)
    r = cells.groupby("row_cat")["n_obs"].transform("sum").to_numpy(np.int64)
    c = cells.groupby("col_cat")["n_obs"].transform("sum").to_numpy(np.int64)
    n = np.int64(o.sum())
    num = (n * o - r * c).astype(np.float64)
    den = n.astype(np.float64) * r.astype(np.float64) * c.astype(np.float64)
    out = cells.assign(row_tot=r, col_tot=c, n_total=n,
                       chi2_term=np.round(num * num / den, 6))
    return ray.data.from_pandas(
        out.sort_values(["row_cat", "col_cat"]).reset_index(drop=True))


def hhi_concentration(ds: ray.data.Dataset, market_col: str,
                      firm_col: str, value_col: str,
                      scale: float = 100.0) -> ray.data.Dataset:
    """Herfindahl–Hirschman concentration index per market (Hirschman
    1945 / Herfindahl 1950, public literature): ``HHI = Σ_i s_i²``
    over firm shares ``s_i = v_i / Σv`` — the standard market- (or
    source-/domain-) concentration screen.

    Distributed shape: values quantize ONCE to integer ``scale``-ths,
    per-block partial ``(market, firm)`` sums collapse each block,
    ONE keyed sum finishes firm totals, a second market-keyed fold
    (Σq, Σq², n_firms — all int64) reduces to the markets-sized table,
    and the index is ONE fixed-form divide per market:
    ``hhi = round(double(Σq²) / (double(Σq)·Σq), 6)``.
    Output ``(market, n_firms, total_q, hhi)``; markets whose total
    quantized value is 0 are excluded (share undefined).
    """
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        q = np.floor(b[value_col].to_numpy(np.float64) * scale
                     + 0.5).astype(np.int64)
        g = (pd.DataFrame({"market": b[market_col].to_numpy(np.int64),
                           "firm": b[firm_col].to_numpy(np.int64),
                           "q": q})
             .groupby(["market", "firm"], sort=False)["q"].sum()
             .reset_index())
        return g

    firm_tot = shuffle.group_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["market", "firm"], {"q": ("q", "sum")})

    def market_partial(b: pd.DataFrame) -> pd.DataFrame:
        q = b["q"].to_numpy(np.int64)
        return pd.DataFrame({"market": b["market"].to_numpy(np.int64),
                             "total_q": q, "sq2": q * q,
                             "n_firms": np.ones(len(q), np.int64)})

    mk = shuffle.group_agg(
        firm_tot.map_batches(market_partial, batch_format="pandas"),
        ["market"], {"total_q": ("total_q", "sum"),
                     "sq2": ("sq2", "sum"),
                     "n_firms": ("n_firms", "sum")},
        num_buckets=1).to_pandas()
    if len(mk) == 0 or "market" not in mk.columns:
        z = np.array([], np.int64)
        return ray.data.from_pandas(pd.DataFrame({
            "market": z, "n_firms": z, "total_q": z,
            "hhi": np.array([], np.float64)}))
    mk = mk[mk["total_q"].to_numpy(np.int64) > 0]
    t = mk["total_q"].to_numpy(np.int64)
    out = pd.DataFrame({
        "market": mk["market"].to_numpy(np.int64),
        "n_firms": mk["n_firms"].to_numpy(np.int64),
        "total_q": t,
        "hhi": np.round(mk["sq2"].to_numpy(np.float64)
                        / (t.astype(np.float64) * t), 6)})
    return ray.data.from_pandas(
        out.sort_values("market").reset_index(drop=True))


def lorenz_deciles(ds: ray.data.Dataset, value_col: str, id_col: str,
                   k: int = 10, scale: float = 100.0,
                   ) -> ray.data.Dataset:
    """Lorenz-curve tile points (Lorenz 1905, public literature):
    cumulative value share of the population sorted poorest-first,
    evaluated at k equal-population tiles — the inequality profile
    that pairs with the Gini moments op.

    Distributed shape: values quantize once to int64 ``scale``-ths,
    one :func:`~city2graph_ray.shuffle.global_ntile` pass (ties break
    on ``id_col``), per-block partial per-tile sums, ONE ≤k-row keyed
    sum, driver cumsum over the k-row table.  Exactness: tile sums and
    cumulative sums are int64; the share is ONE fixed-form divide per
    tile: ``round(double(cum)/total, 6)``.
    Output ``(tile, n, tile_q, cum_q, cum_share)``.
    """
    def quant(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "id": b[id_col].to_numpy(np.int64),
            "q": np.floor(b[value_col].to_numpy(np.float64) * scale
                          + 0.5).astype(np.int64)})

    tiled = shuffle.global_ntile(
        ds.map_batches(quant, batch_format="pandas"), ["q", "id"], k,
        rn_col="__rn", out_col="tile")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby("tile", sort=False)
             .agg(n=("tile", "size"), tile_q=("q", "sum"))
             .reset_index())
        return pd.DataFrame({"tile": g["tile"].to_numpy(np.int64),
                             "n": g["n"].to_numpy(np.int64),
                             "tile_q": g["tile_q"].to_numpy(np.int64)})

    tiles = shuffle.group_agg(
        tiled.map_batches(partial, batch_format="pandas"), ["tile"],
        {"n": ("n", "sum"), "tile_q": ("tile_q", "sum")},
        num_buckets=1).to_pandas()
    if len(tiles) == 0 or "tile" not in tiles.columns:
        z = np.array([], np.int64)
        return ray.data.from_pandas(pd.DataFrame({
            "tile": z, "n": z, "tile_q": z, "cum_q": z,
            "cum_share": np.array([], np.float64)}))
    tiles = tiles.sort_values("tile").reset_index(drop=True)
    cum = tiles["tile_q"].to_numpy(np.int64).cumsum()
    total = np.int64(cum[-1])
    share = (np.round(cum.astype(np.float64) / total, 6)
             if total != 0 else np.full(len(cum), np.nan))
    return ray.data.from_pandas(tiles.assign(cum_q=cum,
                                             cum_share=share))


def rank_auc(ds: ray.data.Dataset, label_col: str, score_col: str,
             scale: float = 100.0) -> ray.data.Dataset:
    """Exact ROC-AUC / Mann–Whitney U (Mann & Whitney 1947; AUC
    equivalence per Hanley & McNeil 1982, public literature) of a
    binary label against a score column, with textbook tie handling
    (average ranks) — the ranking metric every model-quality pipeline
    needs at corpus scale.

    Distributed shape: scores quantize once to integer ``scale``-ths;
    the global rank pass is the two-pass
    :func:`~city2graph_ray.shuffle.global_row_number` (range sort +
    per-block offsets, no driver rows); per-score tie blocks reduce
    through ONE keyed agg (min rank, max rank, positives, count); the
    finish folds four int64 scalars.  Tie-averaged rank sums stay
    integral by working in DOUBLED ranks: ``2·avg_rank = min_rn +
    max_rn``.  Exactness: n_pos, n_neg, ``r1_x2 = Σ np·(min+max)``,
    ``u_x2 = r1_x2 − n_pos·(n_pos+1)`` and ``tie_sum = Σ(t³−t)`` are
    all int64; ``auc = round(double(u_x2)/(2·n_pos·n_neg), 6)`` is ONE
    fixed-form divide.  Output: ONE row ``(n_pos, n_neg, r1_x2, u_x2,
    tie_sum, auc)`` (empty when either class is absent).
    """
    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "qs": np.floor(b[score_col].to_numpy(np.float64) * scale
                           + 0.5).astype(np.int64),
            "lab": b[label_col].to_numpy(np.int64),
            "one": np.ones(len(b), np.int64)})

    rows = ds.map_batches(prep, batch_format="pandas")
    rn = shuffle.global_row_number(rows, ["qs"])
    per_score = shuffle.group_agg(
        rn, ["qs"], {"min_rn": ("rn", "min"), "max_rn": ("rn", "max"),
                     "np": ("lab", "sum"), "n": ("one", "sum")})

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        npos = b["np"].to_numpy(np.int64)
        n = b["n"].to_numpy(np.int64)
        mm = (b["min_rn"].to_numpy(np.int64)
              + b["max_rn"].to_numpy(np.int64))
        return pd.DataFrame({
            "n_pos": [npos.sum()], "n_all": [n.sum()],
            "r1_x2": [(npos * mm).sum()],
            "tie_sum": [(n ** 3 - n).sum()]})

    parts = per_score.map_batches(fold,
                                  batch_format="pandas").to_pandas()
    n_pos = int(parts["n_pos"].sum()) if "n_pos" in parts.columns else 0
    n_all = int(parts["n_all"].sum()) if "n_all" in parts.columns else 0
    n_neg = n_all - n_pos
    if n_pos == 0 or n_neg == 0:
        z = np.array([], np.int64)
        return ray.data.from_pandas(pd.DataFrame({
            "n_pos": z, "n_neg": z, "r1_x2": z, "u_x2": z,
            "tie_sum": z, "auc": np.array([], np.float64)}))
    r1_x2 = int(parts["r1_x2"].sum())
    tie_sum = int(parts["tie_sum"].sum())
    u_x2 = r1_x2 - n_pos * (n_pos + 1)
    auc = np.round(np.float64(u_x2) / (2 * n_pos * n_neg), 6)
    return ray.data.from_pandas(pd.DataFrame({
        "n_pos": [np.int64(n_pos)], "n_neg": [np.int64(n_neg)],
        "r1_x2": [np.int64(r1_x2)], "u_x2": [np.int64(u_x2)],
        "tie_sum": [np.int64(tie_sum)], "auc": [auc]}))


def mann_kendall(ds: ray.data.Dataset, key_col: str, ts_col: str,
                 id_col: str, value_col: str, scale: int = 100,
                 num_buckets: int = shuffle.DEFAULT_BUCKETS,
                 ) -> ray.data.Dataset:
    """Per-key Mann-Kendall trend test statistic (Mann 1945 /
    Kendall 1975, public literature) over (ts, id)-ordered integer
    units ``u = floor(value*scale+0.5)``:

      ``S = sum_{i<j} sign(u_j - u_i)``   (i, j in time order)

    plus the exact integer variance numerator with the textbook tie
    correction ``var_num = n(n-1)(2n+5) - sum_t t(t-1)(2t+5)``
    (``Var(S) = var_num/18``).  Everything int64, so the self-join SQL
    twin is bit-exact.  Output one row per key:
    ``(key, n, s_stat, var_num)``.

    Distributed shape: ONE shuffle keyed by ``key_col``; the kernel
    sorts a bucket once and expands each key's C(n,2) time-ordered
    pairs with the ragged vectorized triu used by the wedge operators.
    Pair volume is inherently quadratic in the per-key event count —
    same documented bound as the Knox test; keys are users/sensors
    with bounded history, not the corpus axis.
    """
    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            key_col: b[key_col],
            "__ts": b[ts_col], "__id": b[id_col],
            "__u": np.floor(b[value_col].to_numpy(np.float64) * scale
                            + 0.5).astype(np.int64)})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "__ts", "__id"], kind="stable")
        kk = g[key_col].to_numpy()
        uu = g["__u"].to_numpy(np.int64)
        keys_u, starts, sizes = np.unique(kk, return_index=True,
                                          return_counts=True)
        # ragged triu: all (earlier, later) pairs within each key
        pos = np.arange(len(kk)) - np.repeat(starts, sizes)
        reps = np.repeat(sizes, sizes) - 1 - pos
        total = int(reps.sum())
        if total:
            i_idx = np.repeat(np.arange(len(kk)), reps)
            j_off = (np.arange(total)
                     - np.repeat(np.cumsum(reps) - reps, reps) + 1)
            j_idx = i_idx + j_off
            sgn = np.sign(uu[j_idx] - uu[i_idx]).astype(np.int64)
            s_stat = np.bincount(
                np.searchsorted(starts, i_idx, side="right") - 1,
                weights=sgn, minlength=len(keys_u)).astype(np.int64)
        else:
            s_stat = np.zeros(len(keys_u), np.int64)
        n = sizes.astype(np.int64)
        # tie term: per (key, value) run counts on the value-sorted view
        tt = pd.DataFrame({"k": kk, "u": uu}).groupby(
            ["k", "u"], sort=False).size()
        t = tt.to_numpy(np.int64)
        tie = pd.Series(t * (t - 1) * (2 * t + 5),
                        index=tt.index.get_level_values("k"))
        tie_per_key = tie.groupby(level=0, sort=True).sum()
        tie_arr = tie_per_key.reindex(keys_u).to_numpy(np.int64)
        return pd.DataFrame({
            key_col: keys_u, "n": n, "s_stat": s_stat,
            "var_num": n * (n - 1) * (2 * n + 5) - tie_arr})

    rows = ds.map_batches(prep, batch_format="pandas")
    return shuffle.grouped_transform(rows, [key_col], kernel,
                                     num_buckets=num_buckets)


def theil_sen(ds: ray.data.Dataset, key_col: str, t_col: str,
              v_col: str, round_to: int = 9,
              num_buckets: int = shuffle.DEFAULT_BUCKETS,
              ) -> ray.data.Dataset:
    """Per-key Theil–Sen trend estimator (Theil 1950 / Sen 1968,
    public literature): the median of all pairwise slopes
    ``(v_j - v_i) / (t_j - t_i)`` over pairs with distinct t, plus
    the pair count.  Output ``(key, n_pairs, slope)``; slope rounds
    to ``round_to``.  Each slope is ONE double division of identical
    int64 operands in both engines and the median interpolation is
    the same (sorted, linear midpoint), so the self-join +
    ``median()`` twin hashes bit-exact.  C(n,2) per key — the
    documented Mann-Kendall bound.
    """
    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, t_col], kind="stable")
        kk = g[key_col].to_numpy()
        tt = g[t_col].to_numpy(np.int64)
        vv = g[v_col].to_numpy(np.int64)
        keys_u, starts, sizes = np.unique(kk, return_index=True,
                                          return_counts=True)
        pos = np.arange(len(kk)) - np.repeat(starts, sizes)
        reps = np.repeat(sizes, sizes) - 1 - pos
        total = int(reps.sum())
        if not total:
            return pd.DataFrame({
                key_col: keys_u[:0],
                "n_pairs": np.zeros(0, np.int64),
                "slope": np.zeros(0, np.float64)})
        i = np.repeat(np.arange(len(kk)), reps)
        j = i + (np.arange(total)
                 - np.repeat(np.cumsum(reps) - reps, reps) + 1)
        dt = tt[j] - tt[i]
        ok = dt != 0
        seg = np.searchsorted(starts, i[ok], side="right") - 1
        sl = (vv[j][ok] - vv[i][ok]).astype(np.float64) / dt[ok]
        out = pd.DataFrame({"seg": seg, "sl": sl})
        med = out.groupby("seg", sort=True)["sl"].median()
        cnt = out.groupby("seg", sort=True)["sl"].size()
        # keys with zero distinct-t pairs are omitted (twin: INNER
        # join against the pair aggregate)
        return pd.DataFrame({
            key_col: keys_u[med.index.to_numpy()],
            "n_pairs": cnt.to_numpy(np.int64),
            "slope": np.round(med.to_numpy(), round_to)})

    return shuffle.grouped_transform(ds, [key_col], kernel,
                                     num_buckets=num_buckets)


def group_entropy(ds: ray.data.Dataset, key_col: str, cat_col: str,
                  round_to: int = 6,
                  num_buckets: int = shuffle.DEFAULT_BUCKETS,
                  ) -> ray.data.Dataset:
    """Per-key Shannon entropy of a categorical column:
    ``H = -Σ_c (n_c/n)·ln(n_c/n)`` over the key's category counts.
    Output ``(key, n, n_cats, entropy)`` with entropy rounded to
    ``round_to``.  Counts reduce exactly (one keyed sum of per-block
    partials); the ≤|categories| ln/division terms are identical
    doubles in the SQL twin — only the final few-term sum is float,
    rounded well above accumulation noise (the doc_ppl_buckets
    precedent).
    """
    partial = ds.map_batches(
        lambda b: (b.groupby([key_col, cat_col], sort=False).size()
                   .rename("__cnt").reset_index()),
        batch_format="pandas")
    counts = shuffle.group_agg(partial, [key_col, cat_col],
                               {"__cnt": ("__cnt", "sum")},
                               num_buckets=num_buckets)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, cat_col], kind="stable")
        tot = g.groupby(key_col, sort=False)["__cnt"].transform("sum")
        p = g["__cnt"].to_numpy(np.int64) / tot.to_numpy(np.int64)
        term = pd.Series(p * np.log(p), index=g.index)
        agg = (pd.DataFrame({key_col: g[key_col],
                             "t": term, "c": g["__cnt"]})
               .groupby(key_col, sort=False)
               .agg(n=("c", "sum"), n_cats=("c", "size"),
                    s=("t", "sum")).reset_index())
        return pd.DataFrame({
            key_col: agg[key_col],
            "n": agg["n"].astype(np.int64),
            "n_cats": agg["n_cats"].astype(np.int64),
            "entropy": np.round(-agg["s"].to_numpy(), round_to) + 0.0})

    return shuffle.grouped_transform(counts, [key_col], finish,
                                     num_buckets=num_buckets)


def bivariate_morans(grid: ray.data.Dataset, col_c: str = "c",
                     col_r: str = "r", val_x: str = "vx",
                     val_y: str = "vy",
                     num_buckets: int = 16) -> pd.DataFrame:
    """Bivariate Moran's I (Wartenberg 1985 cross-variable form,
    binary queen weights)::

        I_xy = (n · Σ_{i adj j} zx_i · zy_j)
               / (W · sqrt(Σ zx² · Σ zy²))

    — does variable X cluster where neighbouring Y is high.  Same
    integer cross-multiplied exactness as :func:`morans_i`: zx/zy are
    exact int64, the adjacency cross-sum and both second moments
    reduce as int64, and the finish is one fixed-form double
    expression (the sqrt argument is a product of two < 2^53 ints in
    DOUBLE).  Same 8-neighbour scatter shape — carries the NEIGHBOUR
    zy mass to each cell, one keyed sum, no joins.
    Returns one row (n_cells, w_sum, moran_xy).
    """
    g = grid.map_batches(
        lambda b: pd.DataFrame({
            "c": b[col_c].to_numpy(np.int64),
            "r": b[col_r].to_numpy(np.int64),
            "vx": b[val_x].to_numpy(np.int64),
            "vy": b[val_y].to_numpy(np.int64)}),
        batch_format="pandas").materialize()
    n = g.count()
    if n < 2:
        raise ValueError("bivariate Moran's I needs >= 2 cells")
    svx, svy = np.int64(g.sum("vx")), np.int64(g.sum("vy"))
    n64 = np.int64(n)
    off = np.array([(dc, dr) for dc in (-1, 0, 1) for dr in (-1, 0, 1)
                    if not (dc == 0 and dr == 0)], np.int64)

    def scatter(b: pd.DataFrame) -> pd.DataFrame:
        c = b["c"].to_numpy(np.int64)
        r = b["r"].to_numpy(np.int64)
        zx = n64 * b["vx"].to_numpy(np.int64) - svx
        zy = n64 * b["vy"].to_numpy(np.int64) - svy
        m = len(b)
        return pd.DataFrame({
            "c": np.concatenate([np.repeat(c, 8)
                                 + np.tile(off[:, 0], m), c]),
            "r": np.concatenate([np.repeat(r, 8)
                                 + np.tile(off[:, 1], m), r]),
            "zyn": np.concatenate([np.repeat(zy, 8),
                                   np.zeros(m, np.int64)]),
            "wn": np.concatenate([np.ones(8 * m, np.int64),
                                  np.zeros(m, np.int64)]),
            "own": np.concatenate([np.zeros(8 * m, np.int64),
                                   np.ones(m, np.int64)]),
            "zxo": np.concatenate([np.zeros(8 * m, np.int64), zx]),
            "zyo": np.concatenate([np.zeros(8 * m, np.int64), zy])})

    percell = shuffle.group_agg(
        g.map_batches(scatter, batch_format="pandas"),
        ["c", "r"], {"zyn": ("zyn", "sum"), "wn": ("wn", "sum"),
                     "own": ("own", "sum"), "zxo": ("zxo", "sum"),
                     "zyo": ("zyo", "sum")},
        num_buckets=num_buckets)

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        keep = b["own"].to_numpy(np.int64) == 1
        zx = b["zxo"].to_numpy(np.int64)[keep]
        zy = b["zyo"].to_numpy(np.int64)[keep]
        zyn = b["zyn"].to_numpy(np.int64)[keep]
        wn = b["wn"].to_numpy(np.int64)[keep]
        return pd.DataFrame({"num": [int((zx * zyn).sum())],
                             "w": [int(wn.sum())],
                             "dx": [int((zx * zx).sum())],
                             "dy": [int((zy * zy).sum())]})

    p = percell.map_batches(partials,
                            batch_format="pandas").to_pandas()
    num, w = int(p["num"].sum()), int(p["w"].sum())
    dx, dy = int(p["dx"].sum()), int(p["dy"].sum())
    moran = ((np.float64(n) * np.float64(num))
             / (np.float64(w)
                * np.sqrt(np.float64(dx) * np.float64(dy))))
    return pd.DataFrame({"n_cells": np.array([n], np.int64),
                         "w_sum": np.array([w], np.int64),
                         "moran_xy": np.array([moran], np.float64)})


def psi_drift(ds: ray.data.Dataset, value_col: str, split_col: str,
              n_bins: int = 10, scale: int = 100, round_to: int = 6,
              num_buckets: int = shuffle.DEFAULT_BUCKETS,
              ) -> pd.DataFrame:
    """Population Stability Index (the standard ML-monitoring drift
    score) between the reference population (``split_col == 0``) and
    the current one (``split_col == 1``): bin edges are the reference
    deciles (max integer unit per ntile — deterministic even under
    boundary ties, since the sorted tile's max is tie-invariant),
    BOTH populations re-bin through the same strict-less edge rule,
    and ``PSI = Σ (p_c − p_r)·ln(p_c/p_r)`` with add-one smoothing on
    the counts.  Counts are exact int64; the ≤ ``n_bins`` ln terms
    and the final sum are the only floats (rounded to ``round_to``).
    Output one row per bin ``(bin, n_ref, n_cur)`` plus the psi value
    repeated (single-table gate shape).

    Distributed shape: one global-ntile pass over the reference (the
    engine's range-sort row_number), a bins-sized edge table
    broadcast by closure, one streaming re-bin pass per population,
    exact keyed counts."""
    units = ds.map_batches(
        lambda b: pd.DataFrame({
            "u": np.floor(b[value_col].to_numpy(np.float64) * scale
                          + 0.5).astype(np.int64),
            "cur": b[split_col].to_numpy(np.int64)}),
        batch_format="pandas").materialize()
    ref = units.filter(lambda r: r["cur"] == 0)
    tiled = shuffle.global_ntile(ref, ["u"], n_bins)
    edges_df = shuffle.group_agg(
        tiled.map_batches(
            lambda b: pd.DataFrame({"tile": b["tile"],
                                    "mx": b["u"]}),
            batch_format="pandas"),
        ["tile"], {"mx": ("mx", "max")}, num_buckets=1).to_pandas()
    edges = np.sort(edges_df[edges_df["tile"] < n_bins]["mx"]
                    .to_numpy(np.int64))

    def binned(b: pd.DataFrame) -> pd.DataFrame:
        bin_ = np.searchsorted(edges, b["u"].to_numpy(np.int64),
                               side="left")
        # strict-less rule: value lands past every edge < it; ties on
        # an edge fall INTO that edge's bin (side='left')
        g = (pd.DataFrame({"bin": bin_.astype(np.int64),
                           "cur": b["cur"].to_numpy(np.int64)})
             .groupby(["bin", "cur"], sort=False).size()
             .rename("n").reset_index())
        return g

    counts = shuffle.group_agg(
        units.map_batches(binned, batch_format="pandas"),
        ["bin", "cur"], {"n": ("n", "sum")},
        num_buckets=4).to_pandas()
    out = pd.DataFrame({"bin": np.arange(n_bins, dtype=np.int64)})
    for cur, col in ((0, "n_ref"), (1, "n_cur")):
        m = counts[counts["cur"] == cur].set_index("bin")["n"]
        out[col] = (out["bin"].map(m).fillna(0).astype(np.int64))
    nr = out["n_ref"].to_numpy(np.int64) + 1
    nc = out["n_cur"].to_numpy(np.int64) + 1
    pr = nr / nr.sum()
    pc = nc / nc.sum()
    psi = round(float(((pc - pr) * np.log(pc / pr)).sum()), round_to)
    out["psi"] = psi
    return out
