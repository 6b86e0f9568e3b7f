"""Mergeable sketches for approximate analytics at corpus scale.

HyperLogLog count-distinct: the canonical 100-TB primitive when exact
``count_distinct`` (one shuffle of every distinct (key, value) pair)
is too expensive.  Per-batch partial register arrays are elementwise-
max-merged through ONE keyed shuffle of fixed-size byte blobs — bytes
moved ∝ groups × 2^precision, independent of row count.  The estimate
is deterministic (splitmix64 value hash, associative max merge), so
results are reproducible across block layouts — tested, along with the
standard error bound (≈1.04/√m), in tests/test_sketch.py.

Public algorithm (Flajolet et al. 2007; bias constants from the
paper); no reference counterpart — engine-added.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import ray.data

from city2graph_ray import shuffle


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _hash_values(vals: pd.Series) -> np.ndarray:
    if np.issubdtype(vals.dtype, np.integer):
        return _splitmix64(vals.to_numpy(np.uint64))
    # strings/objects: factorize once per batch, hash the uniques
    codes, uniq = pd.factorize(vals)
    uh = _splitmix64(pd.util.hash_array(np.asarray(uniq, dtype=object))
                     .astype(np.uint64))
    return uh[codes]


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _estimate(reg: np.ndarray) -> float:
    m = len(reg)
    est = _alpha(m) * m * m / np.sum(np.power(2.0, -reg.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(reg == 0))
        if zeros:
            return m * np.log(m / zeros)  # linear counting
    return est


def _cm_rows(h: np.ndarray, seeds: np.ndarray, width: int) -> list:
    return [((h ^ s) * np.uint64(0x9FB21C651E98DF25)
             >> np.uint64(40)) % np.uint64(width) for s in seeds]


def count_min_heavy_hitters(ds: ray.data.Dataset, value_col: str,
                            k: int = 20, width: int = 1 << 14,
                            depth: int = 4,
                            ) -> pd.DataFrame:
    """Approximate top-``k`` heavy hitters via a Count-Min sketch
    (Cormode & Muthukrishnan 2005), two streaming passes.

    Pass 1: each block emits its (depth × width) counter partial; the
    driver sums the fixed-size arrays (bytes ∝ blocks × depth·width·8,
    independent of rows — an associative, layout-independent merge).
    Pass 2: the merged sketch is broadcast (``ray.put`` once) and each
    block scores its DISTINCT values against it, emitting its local
    top-k by (estimate desc, value asc).  Because a value's CM
    estimate is a pure function of the merged sketch, a global top-k
    value can be outranked by at most k-1 values inside any block that
    contains it, so it always survives its block's local top-k — the
    driver-side merge of ≤ blocks×k rows is therefore EXACT top-k by
    CM estimate, independent of block layout (the one-pass local
    value_counts candidate scheme this replaces could miss a heavy
    hitter spread thinly across many blocks).  CM estimates
    upper-bound true counts and are exact for heavy hitters w.h.p.
    Output: pandas (value, approx_count) sorted desc — k rows."""
    import ray

    seeds = np.arange(1, depth + 1, dtype=np.uint64) * np.uint64(
        0xA24BAED4963EE407)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = _hash_values(batch[value_col])
        cm = np.zeros((depth, width), dtype=np.int64)
        for d, idx in enumerate(_cm_rows(h, seeds, width)):
            np.add.at(cm[d], idx.astype(np.int64), 1)
        return pd.DataFrame({"cm": [cm.tobytes()]})

    cm = np.zeros((depth, width), dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pandas").iter_batches(
            batch_size=None, batch_format="pandas"):
        for blob in b["cm"]:
            cm += np.frombuffer(blob, dtype=np.int64).reshape(depth, width)

    cm_ref = ray.put(cm)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        cmv = ray.get(cm_ref)  # zero-copy plasma read
        uniq = batch[value_col].drop_duplicates().reset_index(drop=True)
        if len(uniq) == 0:
            return pd.DataFrame({"value": uniq, "approx_count":
                                 pd.Series(dtype=np.int64)})
        h = _hash_values(uniq)
        est = np.full(len(uniq), np.iinfo(np.int64).max)
        for d, idx in enumerate(_cm_rows(h, seeds, width)):
            est = np.minimum(est, cmv[d, idx.astype(np.int64)])
        out = pd.DataFrame({"value": uniq, "approx_count": est})
        return (out.sort_values(["approx_count", "value"],
                                ascending=[False, True]).head(k))

    scored = ds.map_batches(score, batch_format="pandas").to_pandas()
    return (scored.drop_duplicates("value")
            .sort_values(["approx_count", "value"],
                         ascending=[False, True])
            .head(k).reset_index(drop=True))


def hll_count_distinct(ds: ray.data.Dataset, keys: Sequence[str],
                       value_col: str, precision: int = 12,
                       num_buckets: int = shuffle.DEFAULT_BUCKETS,
                       ) -> ray.data.Dataset:
    """Approximate ``COUNT(DISTINCT value_col)`` per key group.

    Output (keys..., approx_distinct:int64).  Relative error
    ≈ 1.04/√(2^precision) (1.6% at the default p=12; 4 KiB of
    registers per group in flight)."""
    keys = list(keys)
    m = 1 << precision
    shift = np.uint64(64 - precision)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = _hash_values(batch[value_col])
        idx = (h >> shift).astype(np.int64)
        rest = h << np.uint64(precision)
        # rho = leading zero count of `rest` + 1 (capped at 64-p+1);
        # vectorized via float64 exponent extraction is unsafe past 2^53,
        # so use a bit-length ladder
        rho = np.full(len(h), np.uint8(64 - precision + 1))
        nz = rest != 0
        bl = np.zeros(len(h), dtype=np.int64)
        r = rest[nz]
        acc = np.zeros(r.shape, dtype=np.int64)
        for s in (32, 16, 8, 4, 2, 1):
            big = r >= (np.uint64(1) << np.uint64(s))
            acc[big] += s
            r = np.where(big, r >> np.uint64(s), r)
        bl[nz] = acc + 1
        rho[nz] = (64 - bl[nz] + 1).astype(np.uint8)

        gcodes, guniq = pd.factorize(
            pd.Series(list(zip(*(batch[k] for k in keys))))
            if len(keys) > 1 else batch[keys[0]])
        flat = gcodes.astype(np.int64) * m + idx
        regs = np.zeros(len(guniq) * m, dtype=np.uint8)
        np.maximum.at(regs, flat, rho)
        regs = regs.reshape(len(guniq), m)
        if len(keys) > 1:
            kf = pd.DataFrame(list(guniq), columns=keys)
        else:
            kf = pd.DataFrame({keys[0]: guniq})
        kf["__reg"] = [r.tobytes() for r in regs]
        return kf

    partials = ds.map_batches(partial, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for kv, sub in g.groupby(keys, sort=False):
            reg = np.zeros(m, dtype=np.uint8)
            for b in sub["__reg"]:
                np.maximum(reg, np.frombuffer(b, dtype=np.uint8), out=reg)
            row = dict(zip(keys, kv if isinstance(kv, tuple) else (kv,)))
            row["approx_distinct"] = np.int64(round(_estimate(reg)))
            out.append(row)
        return pd.DataFrame(out)

    return shuffle.grouped_transform(partials, keys, merge,
                                     num_buckets=num_buckets)


def _mrl_compact(levels: "list[np.ndarray]", k: int) -> "list[np.ndarray]":
    """Deterministic MRL/KLL-style compaction: whenever a level holds
    ≥ 2k items, sort it and promote the EVEN-ranked half to the next
    level (deterministic offset 0 — reproducible across merges of the
    same multiset in the same order)."""
    lv = 0
    while lv < len(levels):
        if len(levels[lv]) >= 2 * k:
            arr = np.sort(levels[lv], kind="stable")
            # compact an even count so total weight is preserved; an
            # odd straggler stays at this level
            body = arr[:len(arr) - len(arr) % 2]
            promote = body[::2]  # even ranks survive at double weight
            levels[lv] = arr[len(body):]
            if lv + 1 == len(levels):
                levels.append(np.empty(0, arr.dtype))
            levels[lv + 1] = np.concatenate([levels[lv + 1], promote])
        lv += 1
    return levels


def quantile_sketch(ds: ray.data.Dataset, value_col: str,
                    qs: Sequence[float] = (0.25, 0.5, 0.75),
                    k: int = 256, scale: int = 100,
                    ) -> pd.DataFrame:
    """Mergeable MRL-family quantile sketch (Manku, Rajagopalan &
    Lindsay 1998 / the KLL compactor structure, public literature) —
    the fixed-memory alternative to the engine's exact
    ``group_quantiles`` when a pass-efficient approximation is enough
    at 100 TB.  Deterministic: values quantize to integer
    ``scale``-ths, every compaction promotes the even-ranked half of
    a sorted buffer, and per-block partial sketches merge in block
    order — reproducible across runs on the same layout, tested with
    a rank-error bound vs the exact quantiles (the HLL/CMS testing
    contract; approximate ops are pytest-oracled, not SQL-twinned).

    Distributed shape: one pass of per-block partial sketches (each
    ≤ k·log(n/k) ints, weight = 2^level per level), collected and
    merged on the driver — bytes ∝ blocks × k·log n, never rows.
    Output: one row per requested quantile (q, value).
    """
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        u = np.floor(b[value_col].to_numpy(np.float64) * scale
                     + 0.5).astype(np.int64)
        levels: list[np.ndarray] = [u]
        levels = _mrl_compact(levels, k)
        rows = []
        for lv, arr in enumerate(levels):
            if len(arr):
                rows.append(pd.DataFrame({"lv": lv, "v": arr}))
        if not rows:
            return pd.DataFrame({"lv": np.zeros(0, np.int64),
                                 "v": np.zeros(0, np.int64)})
        return pd.concat(rows, ignore_index=True)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    levels: list[np.ndarray] = []
    for lv, g in parts.groupby("lv", sort=True):
        while len(levels) <= lv:
            levels.append(np.empty(0, np.int64))
        levels[lv] = np.concatenate([levels[lv],
                                     g["v"].to_numpy(np.int64)])
    levels = _mrl_compact(levels, k)
    items = np.concatenate([a for a in levels if len(a)]
                           ) if any(len(a) for a in levels) \
        else np.zeros(0, np.int64)
    weights = np.concatenate(
        [np.full(len(a), 1 << lv, np.int64)
         for lv, a in enumerate(levels) if len(a)]
    ) if len(items) else np.zeros(0, np.int64)
    order = np.argsort(items, kind="stable")
    items, weights = items[order], weights[order]
    cum = np.cumsum(weights)
    total = int(cum[-1]) if len(cum) else 0
    out = []
    for q in qs:
        if not total:
            out.append((q, np.nan))
            continue
        target = q * total
        idx = int(np.searchsorted(cum, target, side="left"))
        idx = min(idx, len(items) - 1)
        out.append((q, items[idx] / scale))
    return pd.DataFrame(out, columns=["q", "value"])
