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
from city2graph_ray.joins import bucketed_join, semi_filter


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


def gravity_model(pts: ray.data.Dataset, zone_col: str = "zone",
                  qx_col: str = "qx", qy_col: str = "qy",
                  ) -> ray.data.Dataset:
    """Unconstrained gravity-model interaction surface (Zipf 1946 /
    Wilson 1967, public literature): predicted flow between zone
    centroids ``G_ij = n_i · n_j / d²_ij`` over INTEGER pre-scale
    coordinates.

    Distributed shape: per-block partial ``(zone → n, Σqx, Σqy)``
    triples, ONE zone-cardinality keyed sum, then the pair finish runs
    on the zones-sized table (|Z|² pairs, |Z| ≪ data) on the driver.
    Exactness: masses/sums int64, centroid = floor-div (both sides
    positive), d² int64, ONE float divide per pair in fixed form:
    ``gravity = round(double(n_i·n_j) / d², 6)``.  Zero-distance pairs
    (coincident quantized centroids) are excluded.  Output rows
    ``(src, dst, n_src, n_dst, d2, gravity)`` with ``src < dst``.
    """
    zones = _zone_mass_centroids(pts, zone_col, qx_col, qy_col)
    cols = ["src", "dst", "n_src", "n_dst", "d2", "gravity"]
    if len(zones) < 2:
        z = np.array([], np.int64)
        return ray.data.from_pandas(pd.DataFrame(
            {c: (z if c != "gravity" else np.array([], np.float64))
             for c in cols}))
    zid = zones["zone"].to_numpy(np.int64)
    n = zones["n"].to_numpy(np.int64)
    cx = zones["cx"].to_numpy(np.int64)
    cy = zones["cy"].to_numpy(np.int64)
    i, j = np.triu_indices(len(zones), k=1)
    d2 = (cx[i] - cx[j]) ** 2 + (cy[i] - cy[j]) ** 2
    keep = d2 > 0
    i, j, d2 = i[keep], j[keep], d2[keep]
    grav = np.round((n[i] * n[j]).astype(np.float64)
                    / d2.astype(np.float64), 6)
    return ray.data.from_pandas(pd.DataFrame({
        "src": zid[i], "dst": zid[j], "n_src": n[i], "n_dst": n[j],
        "d2": d2, "gravity": grav}))


def _zone_mass_centroids(pts: ray.data.Dataset, zone_col: str,
                         qx_col: str, qy_col: str) -> pd.DataFrame:
    """Shared finish input for the interaction models: per-block
    partial ``(zone → n, Σqx, Σqy)`` triples, ONE zone-cardinality
    keyed sum, int64 floor-div centroids.  Returns the zones-sized
    pandas table sorted by zone (|Z| ≪ data by construction)."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(zone_col, sort=False)
        agg = g.agg(n=(zone_col, "size"), sx=(qx_col, "sum"),
                    sy=(qy_col, "sum")).reset_index()
        return pd.DataFrame({
            "zone": agg[zone_col].to_numpy(np.int64),
            "n": agg["n"].to_numpy(np.int64),
            "sx": agg["sx"].to_numpy(np.int64),
            "sy": agg["sy"].to_numpy(np.int64)})

    zones = shuffle.group_agg(
        pts.map_batches(partial, batch_format="pandas"),
        ["zone"], {"n": ("n", "sum"), "sx": ("sx", "sum"),
                   "sy": ("sy", "sum")}, num_buckets=1).to_pandas()
    zones = zones.sort_values("zone").reset_index(drop=True)
    zones["cx"] = zones["sx"].to_numpy(np.int64) // zones["n"].to_numpy(np.int64)
    zones["cy"] = zones["sy"].to_numpy(np.int64) // zones["n"].to_numpy(np.int64)
    return zones


def radiation_model(pts: ray.data.Dataset, zone_col: str = "zone",
                    qx_col: str = "qx", qy_col: str = "qy",
                    ) -> ray.data.Dataset:
    """Radiation-model interaction surface (Simini et al., Nature
    2012, public literature): ``T_ij = m_i·m_j / ((m_i + s_ij)·(m_i +
    m_j + s_ij))`` where ``s_ij`` is the total mass of zones STRICTLY
    closer to i than j (excluding i and j themselves).

    Same distributed shape as :func:`gravity_model` (per-block
    partials, one tiny keyed sum, |Z|-bounded driver finish; the
    intervening-mass scan is |Z|³ on zone cardinality, never data).
    Exactness: masses, d² and s_ij are int64; ONE float divide per
    directed pair: ``round(double(m_i·m_j) / ((m_i+s)·(m_i+m_j+s)),
    6)``.  Coincident-centroid pairs (d²=0) are excluded.  Output
    ``(src, dst, n_src, n_dst, d2, s_ij, radiation)``, src ≠ dst.
    """
    zones = _zone_mass_centroids(pts, zone_col, qx_col, qy_col)
    cols = ["src", "dst", "n_src", "n_dst", "d2", "s_ij", "radiation"]
    if len(zones) < 2:
        z = np.array([], np.int64)
        return ray.data.from_pandas(pd.DataFrame(
            {c: (z if c != "radiation" else np.array([], np.float64))
             for c in cols}))
    zid = zones["zone"].to_numpy(np.int64)
    n = zones["n"].to_numpy(np.int64)
    cx, cy = zones["cx"].to_numpy(np.int64), zones["cy"].to_numpy(np.int64)
    d2 = (cx[:, None] - cx[None, :]) ** 2 + (cy[:, None] - cy[None, :]) ** 2
    # s[i,j] = sum_k m_k [d2[i,k] < d2[i,j]] minus m_i (k=i always
    # qualifies via d2=0 when d2[i,j] > 0), j never qualifies (d2 equal)
    closer = d2[:, None, :] < d2[:, :, None]
    s = (closer * n[None, None, :]).sum(axis=2, dtype=np.int64) - n[:, None]
    i, j = np.nonzero((d2 > 0) & ~np.eye(len(zid), dtype=bool))
    num = (n[i] * n[j]).astype(np.float64)
    den = ((n[i] + s[i, j]) * (n[i] + n[j] + s[i, j])).astype(np.float64)
    return ray.data.from_pandas(pd.DataFrame({
        "src": zid[i], "dst": zid[j], "n_src": n[i], "n_dst": n[j],
        "d2": d2[i, j], "s_ij": s[i, j],
        "radiation": np.round(num / den, 6)}))


def ipf_balance(od: ray.data.Dataset, row_target: float,
                col_target: float, rounds: int = 2,
                o_col: str = "o", d_col: str = "d",
                flow_col: str = "flow", round_to: int = 6,
                num_buckets: int = shuffle.DEFAULT_BUCKETS,
                ) -> ray.data.Dataset:
    """Iterative proportional fitting / Furness balancing (Deming &
    Stephan 1940, the doubly-constrained OD-matrix workhorse): each
    round scales every flow so its row sums to ``row_target`` then
    its column to ``col_target``.

    Exactness: flows are carried as int64 NANO-UNITS, so every margin
    is an exact integer sum (no float association order anywhere);
    each scaling is the single fixed-form expression
    ``floor(u·T/S·1e9 + 0.5)`` over identical doubles in both engines
    — the SQL twin is bit-exact with no per-iteration rounding tricks
    needed.  int64 bound: units ≤ target·1e9 per cell after the first
    scaling (1e12 at T=1000), margins ≤ cells-per-margin × that —
    document targets so margins stay < 2^53 for double exactness.
    Input flows must be integral (counts); output ``(o, d, flow)``
    rounds the final units to ``round_to`` decimals.

    Distributed shape per half-round: one partial-aggregated keyed
    int sum over the margin + one bucketed join of the flow stream
    against the margin-sized sum table; the matrix never collects."""
    cur = od.map_batches(
        lambda b: pd.DataFrame({
            "o": b[o_col].to_numpy(np.int64),
            "d": b[d_col].to_numpy(np.int64),
            "u": b[flow_col].to_numpy(np.int64) * 1_000_000_000}),
        batch_format="pandas").materialize()

    def half(cur, key, target):
        sums = shuffle.group_agg(
            cur.map_batches(lambda b: pd.DataFrame(
                {key: b[key], "s": b["u"]}), batch_format="pandas"),
            [key], {"s": ("s", "sum")}, num_buckets=num_buckets)

        def scale(b: pd.DataFrame) -> pd.DataFrame:
            u = b["u"].to_numpy(np.int64).astype(np.float64)
            s = b["s"].to_numpy(np.int64).astype(np.float64)
            # new nano-units = (u/1e9)·T/(s/1e9) · 1e9 = u·T/s·1e9,
            # fixed left-to-right form mirrored in the SQL twin.
            # s == 0 (all-zero margin) leaves the row untouched — u is
            # necessarily 0 there; without the guard 0·T/0 is NaN and
            # the int64 cast is undefined garbage (ADVICE r3)
            with np.errstate(divide="ignore", invalid="ignore"):
                scaled = np.floor(u * target / s * 1e9 + 0.5)
            return pd.DataFrame({
                "o": b["o"].to_numpy(np.int64),
                "d": b["d"].to_numpy(np.int64),
                "u": np.where(s == 0.0, u, scaled).astype(np.int64)})

        return (bucketed_join(cur, sums, key,
                              num_buckets=num_buckets)
                .map_batches(scale, batch_format="pandas")
                .repartition(min(num_buckets, 16)).materialize())

    for _ in range(rounds):
        cur = half(cur, "o", row_target)
        cur = half(cur, "d", col_target)
    return cur.map_batches(
        lambda b: pd.DataFrame({
            "o": b["o"].to_numpy(np.int64),
            "d": b["d"].to_numpy(np.int64),
            "flow": np.round(b["u"].to_numpy(np.int64) / 1e9,
                             round_to)}),
        batch_format="pandas")
