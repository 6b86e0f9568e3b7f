"""Bounded event-time windows over stream-shaped tables.

The reference's only window is LEAD-per-trip (transportation.py:798,
1066-1080 — covered by ops/transport.consecutive_legs).  These are the
engine-added aggregate windows a training-data pipeline needs over an
ordered, partitioned log (ray_guide: "treat the input as an ordered,
partitioned log"): tumbling and sliding event-time windows as
partial+final aggregations — no watermarks (batch semantics; Ray Data
has no event-time streaming).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from city2graph_ray import shuffle


def _epoch_sec(ts: pd.Series) -> np.ndarray:
    """Epoch seconds with DuckDB's exact float rounding: ``epoch(ts)``
    divides the microsecond tick count by 1e6 (timestamps are µs
    internally), so we truncate to µs first — ``ns/1e9`` rounds the
    last float bit differently and breaks bit-exact oracle hashes."""
    return (ts.to_numpy().astype("datetime64[us]")
            .astype(np.int64) / 1e6)


def tumbling_window(events: ray.data.Dataset, size_sec: float,
                    key_col: str = "event_type", ts_col: str = "ts",
                    value_col: str = "value", round_to: int = 4,
                    ) -> ray.data.Dataset:
    """Per (key, floor(epoch/size)) window: count + sum + min + max.
    Output: (key, window_start_sec, n, sum_value, min_value, max_value).
    SQL mirror: GROUP BY key, floor(epoch(ts)/size)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        epoch = _epoch_sec(batch[ts_col])
        win = np.floor(epoch / size_sec).astype(np.int64)
        out = pd.DataFrame({key_col: batch[key_col], "win": win,
                            "v": batch[value_col].to_numpy(np.float64)})
        return (out.groupby([key_col, "win"], sort=False)
                .agg(n=("v", "size"), sum_v=("v", "sum"),
                     min_v=("v", "min"), max_v=("v", "max")).reset_index())

    partials = events.map_batches(partial, batch_format="pandas")
    summed = shuffle.group_agg(partials, [key_col, "win"],
                               {"n": ("n", "sum"), "sum_v": ("sum_v", "sum"),
                                "min_v": ("min_v", "min"),
                                "max_v": ("max_v", "max")}, partial=False)

    def post(batch: pd.DataFrame) -> pd.DataFrame:
        win = batch["win"].to_numpy(np.int64)
        # fractional sizes need the float product (win * int(size) would
        # collapse e.g. size 0.5 to 0); integral sizes keep int64 starts
        starts = (win * np.int64(size_sec) if float(size_sec).is_integer()
                  else np.round(win.astype(np.float64) * size_sec, 9))
        return pd.DataFrame({
            key_col: batch[key_col],
            "window_start_sec": starts,
            "n": batch["n"].astype(np.int64),
            "sum_value": np.round(batch["sum_v"].to_numpy(), round_to),
            "min_value": np.round(batch["min_v"].to_numpy(), round_to),
            "max_value": np.round(batch["max_v"].to_numpy(), round_to)})

    return summed.map_batches(post, batch_format="pandas")


def sliding_window(events: ray.data.Dataset, size_sec: float, step_sec: float,
                   key_col: str = "event_type", ts_col: str = "ts",
                   value_col: str = "value", round_to: int = 4,
                   ) -> ray.data.Dataset:
    """Sliding windows as replicated tumbling: each event lands in
    size/step windows (flat-map), then the same partial+final reduce.
    ``size`` must be a multiple of ``step``."""
    reps = int(round(size_sec / step_sec))
    if abs(reps * step_sec - size_sec) > 1e-9:
        raise ValueError("size_sec must be a multiple of step_sec")

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        epoch = _epoch_sec(batch[ts_col])
        base = np.floor(epoch / step_sec).astype(np.int64)
        rows = np.repeat(np.arange(len(batch)), reps)
        offs = np.tile(np.arange(reps, dtype=np.int64), len(batch))
        win = base[rows] - offs  # window index in step units
        out = pd.DataFrame({key_col: batch[key_col].to_numpy()[rows],
                            "win": win,
                            "v": batch[value_col].to_numpy(np.float64)[rows]})
        return (out.groupby([key_col, "win"], sort=False)
                .agg(n=("v", "size"), sum_v=("v", "sum")).reset_index())

    partials = events.map_batches(explode, batch_format="pandas")
    summed = shuffle.group_agg(partials, [key_col, "win"],
                               {"n": ("n", "sum"), "sum_v": ("sum_v", "sum")},
                               partial=False)

    def post(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            key_col: batch[key_col],
            "window_start_sec": np.round(batch["win"].to_numpy(np.int64)
                                         * step_sec, 6),
            "n": batch["n"].astype(np.int64),
            "sum_value": np.round(batch["sum_v"].to_numpy(), round_to)})

    return summed.map_batches(post, batch_format="pandas")


def sessionize(events: ray.data.Dataset, gap_sec: float,
               key_col: str = "user_id", ts_col: str = "ts",
               ) -> ray.data.Dataset:
    """Session windows per key: a new session starts when the gap to
    the previous event exceeds ``gap_sec``.  Output: (key, session_id,
    session_start_sec, session_end_sec, n_events).  Per-key sort inside
    a bucketed group (ordering assumption: one key fits one group)."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for key, sub in g.groupby(key_col, sort=False):
            sub = sub.sort_values([ts_col, "event_id"], kind="stable")
            epoch = _epoch_sec(sub[ts_col])
            new = np.concatenate(([True], np.diff(epoch) > gap_sec))
            sid = np.cumsum(new) - 1
            df = pd.DataFrame({key_col: key, "session_id": sid, "e": epoch})
            agg = (df.groupby("session_id")
                   .agg(session_start_sec=("e", "min"),
                        session_end_sec=("e", "max"),
                        n_events=("e", "size")).reset_index())
            agg[key_col] = key
            outs.append(agg[[key_col, "session_id", "session_start_sec",
                             "session_end_sec", "n_events"]])
        return pd.concat(outs) if outs else pd.DataFrame(
            {key_col: [], "session_id": [], "session_start_sec": [],
             "session_end_sec": [], "n_events": []})

    return shuffle.grouped_transform(events, [key_col], kernel)


def grouped_running_sum(ds: ray.data.Dataset, keys, order_cols,
                        value_col: str, scale: int = 100,
                        out_col: str = "running",
                        num_buckets: int = shuffle.DEFAULT_BUCKETS,
                        ) -> ray.data.Dataset:
    """Per-key running total of a fixed-precision numeric column —
    ``sum(value) OVER (PARTITION BY keys ORDER BY order_cols ROWS
    UNBOUNDED PRECEDING)`` — bit-exact across engines and layouts:
    values quantize once to integer units (floor(x*scale+0.5)), the
    cumulative sum runs in int64 (immune to float association order —
    DuckDB's segment-tree window sum would NOT be bit-stable on raw
    doubles), and one final division by ``scale`` yields the double.

    One shuffle keyed by ``keys``; per-key state never leaves its
    bucket, so 10^12 rows spread across keys stream through.  Include
    a unique id as the last order col for determinism.  Output = input
    columns + ``out_col``.
    """
    keys = list(keys)
    order_cols = list(order_cols)
    fs = float(scale)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(keys + order_cols, kind="stable")
        u = np.floor(g[value_col].to_numpy(np.float64) * fs + 0.5
                     ).astype(np.int64)
        g[out_col] = pd.Series(u, index=g.index).groupby(
            [g[k] for k in keys], sort=False).cumsum() / fs
        return g

    return shuffle.grouped_transform(ds, keys, kernel,
                                     num_buckets=num_buckets)


def percent_rank_cume(ds: ray.data.Dataset, value_col: str,
                      id_col: str,
                      num_buckets: int = shuffle.DEFAULT_BUCKETS,
                      ) -> ray.data.Dataset:
    """Distributed ``percent_rank()`` and ``cume_dist()`` OVER
    (ORDER BY value) with full SQL tie semantics — ties share the min
    rank and the max cumulative count.  Output = input columns +
    ``pct_rank`` + ``cume``.

    Exact across engines: one global row_number pass (range sort +
    per-block offset stamp, no driver rows), then a keyed
    grouped-transform on the VALUE collapses each tie class to its
    min/max row number; ``(rmin-1)/(n-1)`` and ``rmax/n`` are int64 →
    double divisions, bit-identical to the SQL window functions.  The
    only driver state is the total count scalar."""
    rn = shuffle.global_row_number(ds, [value_col, id_col])
    n = rn.count()
    denom = float(n - 1) if n > 1 else 1.0

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby(value_col, sort=False)["rn"]
        rmin = grp.transform("min").to_numpy(np.int64)
        rmax = grp.transform("max").to_numpy(np.int64)
        g = g.drop(columns=["rn"])
        g["pct_rank"] = (rmin - 1) / denom
        g["cume"] = rmax / float(n)
        return g

    return shuffle.grouped_transform(rn, [value_col], kernel,
                                     num_buckets=num_buckets)


def resample_ffill(ds: ray.data.Dataset, key_col: str, ts_col: str,
                   value_col: str, id_col: str, origin_us: int,
                   n_steps: int, step_us: int,
                   num_buckets: int = shuffle.DEFAULT_BUCKETS,
                   ) -> ray.data.Dataset:
    """Per-key resampling onto a fixed global timestamp grid with
    forward fill (last observation carried forward) — the time-series
    regularization step in front of windowed feature pipelines.
    Output ``(key, grid_ts_us, value, src_ts_us)``; grid points before
    a key's first observation are dropped (ASOF-inner semantics, the
    SQL twin is ``grid ASOF JOIN obs``).  At equal-timestamp
    observations the max-``id_col`` row wins (deterministic).

    One shuffle keyed by ``key_col``; the grid is closed-form
    (``origin + i·step``), never a table, so bytes moved = the
    observations.  Inside a bucket each key resolves with one
    ``np.searchsorted`` of the 0..n_steps grid against its sorted
    observation times — vectorized over the grid, loop only over keys.
    """
    grid = origin_us + np.arange(n_steps, dtype=np.int64) * step_us

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="stable")
        ts = g[ts_col].to_numpy()
        if ts.dtype.kind == "M":
            ts = ts.astype("datetime64[us]").view("i8")
        key = g[key_col].to_numpy()
        val = g[value_col].to_numpy()
        # last-wins dedup at equal (key, ts): keep the final row of
        # each run (max id after the stable sort)
        last = np.ones(len(g), bool)
        last[:-1] = (key[:-1] != key[1:]) | (ts[:-1] != ts[1:])
        key, ts, val = key[last], ts[last], val[last]
        out_k, out_g, out_v, out_t = [], [], [], []
        starts = np.flatnonzero(
            np.concatenate(([True], key[1:] != key[:-1])))
        bounds = np.append(starts, len(key))
        for i, lo in enumerate(starts):
            hi = bounds[i + 1]
            idx = np.searchsorted(ts[lo:hi], grid, side="right") - 1
            keep = idx >= 0
            out_k.append(np.full(int(keep.sum()), key[lo]))
            out_g.append(grid[keep])
            out_v.append(val[lo:hi][idx[keep]])
            out_t.append(ts[lo:hi][idx[keep]])
        if not out_k:
            return pd.DataFrame({key_col: key[:0],
                                 "grid_ts_us": ts[:0],
                                 "value": val[:0],
                                 "src_ts_us": ts[:0]})
        return pd.DataFrame({
            key_col: np.concatenate(out_k),
            "grid_ts_us": np.concatenate(out_g),
            "value": np.concatenate(out_v),
            "src_ts_us": np.concatenate(out_t)})

    return shuffle.grouped_transform(ds, [key_col], kernel,
                                     num_buckets=num_buckets)


def grouped_ewma(ds: ray.data.Dataset, key_col: str, order_cols: "list[str]",
                 value_col: str, alpha: float = 0.5,
                 round_to: "int | None" = 10,
                 num_buckets: int = shuffle.DEFAULT_BUCKETS,
                 ) -> ray.data.Dataset:
    """Per-key exponentially weighted moving average along the key's
    event order: ``ewma_1 = v_1``; ``ewma_i = alpha·v_i +
    (1-alpha)·ewma_{i-1}`` (pandas ``ewm(adjust=False)``).

    One keyed shuffle; inside each bucket the recurrence is vectorized
    ACROSS keys (one numpy pass per step index, never per row): rows
    are ranked within key, and step ``i`` updates every key's state at
    once, so the Python loop length is max-events-per-key, not rows.

    ``round_to`` rounds each step's result (the per-iteration-rounding
    discipline from pagerank) to bound drift across layouts.  NOTE:
    numpy and SQL ``round`` can differ in the last ULP at large
    magnitudes, so for a bit-exact SQL twin use
    :func:`grouped_ewma_int`.  Output: key, order cols, value,
    ``ewma``.
    """
    a = float(alpha)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, *order_cols], kind="stable")
        k = g[key_col].to_numpy()
        v = g[value_col].to_numpy(np.float64)
        n = len(v)
        out = np.empty(n, np.float64)
        if n:
            new_key = np.concatenate(([True], k[1:] != k[:-1]))
            starts = np.nonzero(new_key)[0]
            # rank of each row within its key
            rank = np.arange(n) - np.repeat(starts, np.diff(
                np.concatenate([starts, [n]])))
            max_rank = int(rank.max())
            state = v[starts].copy()
            if round_to is not None:
                state = np.round(state, round_to)
            out[starts] = state
            for r in range(1, max_rank + 1):
                rows = starts + r
                live = rows < n
                rows = rows[live]
                rows = rows[rank[rows] == r]
                sel = np.searchsorted(starts, rows, side="right") - 1
                nxt = a * v[rows] + (1.0 - a) * state[sel]
                if round_to is not None:
                    nxt = np.round(nxt, round_to)
                state[sel] = nxt
                out[rows] = nxt
        res = g[[key_col, *order_cols, value_col]].copy()
        res["ewma"] = out
        return res

    return shuffle.grouped_transform(ds, [key_col], kernel,
                                     num_buckets=num_buckets)


def grouped_ewma_int(ds: ray.data.Dataset, key_col: str,
                     order_cols: "list[str]", value_col: str,
                     num: int = 1, den: int = 2, scale: int = 1024,
                     num_buckets: int = shuffle.DEFAULT_BUCKETS,
                     ) -> ray.data.Dataset:
    """All-integer EWMA (alpha = num/den): state ``s_1 = v_1·scale``;
    ``s_i = (num·v_i·scale + (den-num)·s_{i-1} + den//2) // den``
    (round-half-up) — the bit-exact sibling of :func:`grouped_ewma`
    (float round-to-k-dp differs from SQL ``round`` in the last ULP;
    integer recurrences are the engine's exactness discipline, same as
    the k-means update).  ``value_col`` must be int64 and non-negative
    (floor division == the SQL ``//`` for non-negatives).  Output adds
    ``ewma_scaled`` (int64, in value·scale units).  Same across-key
    vectorization as the float form: one numpy pass per step index.
    """
    num_i, den_i, sc = np.int64(num), np.int64(den), np.int64(scale)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, *order_cols], kind="stable")
        k = g[key_col].to_numpy()
        v = g[value_col].to_numpy(np.int64)
        n = len(v)
        out = np.empty(n, np.int64)
        if n:
            new_key = np.concatenate(([True], k[1:] != k[:-1]))
            starts = np.nonzero(new_key)[0]
            rank = np.arange(n) - np.repeat(starts, np.diff(
                np.concatenate([starts, [n]])))
            state = v[starts] * sc
            out[starts] = state
            for r in range(1, int(rank.max()) + 1):
                rows = starts + r
                rows = rows[rows < n]
                rows = rows[rank[rows] == r]
                sel = np.searchsorted(starts, rows, side="right") - 1
                nxt = (num_i * v[rows] * sc
                       + (den_i - num_i) * state[sel]
                       + den_i // np.int64(2)) // den_i
                state[sel] = nxt
                out[rows] = nxt
        res = g[[key_col, *order_cols, value_col]].copy()
        res["ewma_scaled"] = out
        return res

    return shuffle.grouped_transform(ds, [key_col], kernel,
                                     num_buckets=num_buckets)


def cusum_max(ds: ray.data.Dataset, key_col: str, ts_col: str,
              id_col: str, value_col: str, scale: int = 100,
              num_buckets: int = shuffle.DEFAULT_BUCKETS,
              ) -> ray.data.Dataset:
    """Per-key CUSUM changepoint screen (Page 1954, public
    literature), all-integer so the SQL twin is bit-exact: with the
    GLOBAL total count ``n`` and unit sum ``S`` (units =
    floor(value*scale+0.5)), each event's cross-multiplied deviation
    is ``n*u_i - S`` and the CUSUM is its running sum in
    (ts, id) order within the key.  Emits one row per key:
    ``(key, max_abs_cusum, at_id)`` where ``at_id`` is the id of the
    FIRST event attaining the max |CUSUM| (ties broken by order).

    Two passes: a per-block partial + 1-row sum for (n, S) — the pair
    broadcasts as two ints — then ONE shuffle keyed by ``key_col``
    with a vectorized per-key cumsum kernel.  int64 bound: the CUSUM
    magnitude is ≤ n·S, document the scale ceiling at ingest
    (n·S < 2^63 holds through ~10^9 rows of 10^4-unit values).
    """
    glob = shuffle.group_agg(
        ds.map_batches(
            lambda b: pd.DataFrame({
                "k": np.zeros(1, np.int64),
                "n": [len(b)],
                "s": [int(np.floor(b[value_col].to_numpy(np.float64)
                                   * scale + 0.5).astype(np.int64).sum())]}),
            batch_format="pandas"),
        ["k"], {"n": ("n", "sum"), "s": ("s", "sum")},
        num_buckets=1).to_pandas()
    n_tot = int(glob["n"].iloc[0])
    s_tot = int(glob["s"].iloc[0])

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="stable")
        u = np.floor(g[value_col].to_numpy(np.float64) * scale + 0.5
                     ).astype(np.int64)
        dev = pd.Series(n_tot * u - s_tot, index=g.index)
        cus = dev.groupby(g[key_col], sort=False).cumsum().to_numpy()
        tmp = pd.DataFrame({key_col: g[key_col].to_numpy(),
                            "__abs": np.abs(cus),
                            "__ts": g[ts_col].to_numpy(),
                            "__id": g[id_col].to_numpy()})
        # first row (in (ts, id) order) attaining the per-key max
        top = tmp.sort_values([key_col, "__abs", "__ts", "__id"],
                              ascending=[True, False, True, True],
                              kind="stable").groupby(
            key_col, sort=False).head(1)
        return pd.DataFrame({key_col: top[key_col].to_numpy(),
                             "max_abs_cusum": top["__abs"]
                             .to_numpy(np.int64),
                             "at_id": top["__id"].to_numpy()})

    return shuffle.grouped_transform(ds, [key_col], kernel,
                                     num_buckets=num_buckets)


def grouped_rolling_mean(ds: ray.data.Dataset, keys, order_cols,
                         value_col: str, window: int,
                         scale: int = 100, out_col: str = "rmean",
                         num_buckets: int = shuffle.DEFAULT_BUCKETS,
                         ) -> ray.data.Dataset:
    """Per-key trailing-window mean — ``avg(value) OVER (PARTITION BY
    keys ORDER BY order_cols ROWS window-1 PRECEDING)`` — bit-exact:
    the rolling SUM runs on int64 units (floor(v·scale+0.5)), and the
    one float op is the final ``sum_units / (rows_in_window · scale)``
    mirrored verbatim in SQL (a raw-double windowed avg would NOT be
    association-order-stable).  One shuffle keyed by ``keys``; output
    = input columns + ``out_col``."""
    keys = list(keys)
    order_cols = list(order_cols)
    fs = float(scale)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(keys + order_cols, kind="stable")
        u = pd.Series(
            np.floor(g[value_col].to_numpy(np.float64) * fs + 0.5
                     ).astype(np.int64), index=g.index)
        grp = u.groupby([g[k] for k in keys], sort=False)
        su = grp.rolling(window, min_periods=1).sum() \
            .reset_index(drop=True).to_numpy(np.int64)
        cn = grp.rolling(window, min_periods=1).count() \
            .reset_index(drop=True).to_numpy(np.int64)
        g[out_col] = su.astype(np.float64) / (cn * fs)
        return g

    return shuffle.grouped_transform(ds, keys, kernel,
                                     num_buckets=num_buckets)


def cohort_retention(ds: ray.data.Dataset, user_col: str, ts_col: str,
                     period_s: int = 604800) -> ray.data.Dataset:
    """Cohort retention matrix — the standard product-analytics view:
    users are cohorted by their FIRST active period (floor(epoch /
    period)), and each later period contributes a distinct-active
    count at offset ``p − p0``.

    Distributed shape: one ``(user, period)`` distinct shuffle; the
    per-user first period is a keyed int64 min over it; the offset
    explode joins first periods back by user through the bucketed hash
    join (no user-map broadcast); cell counts fold through ONE small
    keyed sum and the cohort-size denominator joins on the
    cohorts-sized table at the finish.  Exactness: every count is an
    int64; the retention rate is ONE rounded divide per cell:
    ``round(double(n_active)/n_cohort, 6)``.  Output
    ``(cohort, offset, n_active, n_cohort, rate)``.
    """
    from city2graph_ray import shuffle
    from city2graph_ray.joins import bucketed_join

    def periods(b: pd.DataFrame) -> pd.DataFrame:
        s = (b[ts_col].astype("datetime64[us]").astype(np.int64)
             // 1_000_000)
        return pd.DataFrame({"user": b[user_col].to_numpy(np.int64),
                             "p": s // period_s})

    import pyarrow as pa

    up = shuffle.distinct(
        ds.map_batches(periods, batch_format="pandas"), ["user", "p"])
    first = shuffle.group_agg(up, ["user"], {"p0": ("p", "min")})
    # an empty event stream leaves both sides legitimately empty
    up_schema = pa.schema([("user", pa.int64()), ("p", pa.int64())])
    first_schema = pa.schema([("user", pa.int64()), ("p0", pa.int64())])
    joined = bucketed_join(up, first, on="user",
                           left_schema=up_schema,
                           right_schema=first_schema)

    def cell_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cohort": b["p0"].to_numpy(np.int64),
            "offset": b["p"].to_numpy(np.int64)
            - b["p0"].to_numpy(np.int64),
            "n_active": np.ones(len(b), np.int64)})

    cells = shuffle.group_agg(
        joined.map_batches(cell_partial, batch_format="pandas"),
        ["cohort", "offset"], {"n_active": ("n_active", "sum")},
        num_buckets=1).to_pandas()
    if len(cells) == 0 or "cohort" not in cells.columns:
        z = np.array([], np.int64)
        return ray.data.from_pandas(pd.DataFrame({
            "cohort": z, "offset": z, "n_active": z, "n_cohort": z,
            "rate": np.array([], np.float64)}))
    base = (cells[cells["offset"] == 0].set_index("cohort")["n_active"])
    n0 = base.reindex(cells["cohort"]).to_numpy(np.int64)
    na = cells["n_active"].to_numpy(np.int64)
    out = cells.assign(
        n_cohort=n0,
        rate=np.round(na.astype(np.float64) / n0.astype(np.float64), 6))
    return ray.data.from_pandas(
        out.sort_values(["cohort", "offset"]).reset_index(drop=True))


def km_risk_table(ds: ray.data.Dataset, duration_col: str,
                  event_col: str) -> ray.data.Dataset:
    """Kaplan–Meier risk table (Kaplan & Meier 1958, public
    literature): for each distinct duration, the number at risk,
    events (deaths) and censorings, plus the per-step survival factor
    ``1 − d/n`` — the exact ingredients of the product-limit curve
    (the cumulative product is a trivial client-side fold over this
    small table; emitting factors keeps every row bit-exact instead of
    an order-dependent float product).

    Distributed shape: per-block partial ``(duration → d, c)`` counts,
    ONE keyed sum onto the distinct-durations-sized table, driver
    cumsum for the at-risk ladder (bounded by distinct durations, not
    subjects).  ``event_col`` is 1 = event observed, 0 = censored.
    Exactness: all counts int64; ``km_factor = round(1 −
    double(d)/n_risk, 6)`` is ONE fixed-form divide per row.
    Output ``(duration, n_risk, d_events, n_censored, km_factor)``
    sorted by duration.
    """
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ev = b[event_col].to_numpy(np.int64)
        g = (pd.DataFrame({"duration": b[duration_col]
                           .to_numpy(np.int64),
                           "d_events": ev, "n_censored": 1 - ev})
             .groupby("duration", sort=False).sum().reset_index())
        return g

    tab = shuffle.group_agg(
        ds.map_batches(partial, batch_format="pandas"), ["duration"],
        {"d_events": ("d_events", "sum"),
         "n_censored": ("n_censored", "sum")},
        num_buckets=1).to_pandas()
    if len(tab) == 0 or "duration" not in tab.columns:
        z = np.array([], np.int64)
        return ray.data.from_pandas(pd.DataFrame({
            "duration": z, "n_risk": z, "d_events": z,
            "n_censored": z,
            "km_factor": np.array([], np.float64)}))
    tab = tab.sort_values("duration").reset_index(drop=True)
    leaving = (tab["d_events"].to_numpy(np.int64)
               + tab["n_censored"].to_numpy(np.int64))
    total = leaving.sum()
    n_risk = total - np.concatenate(([0], leaving.cumsum()[:-1]))
    d = tab["d_events"].to_numpy(np.int64)
    return ray.data.from_pandas(pd.DataFrame({
        "duration": tab["duration"].to_numpy(np.int64),
        "n_risk": n_risk, "d_events": d,
        "n_censored": tab["n_censored"].to_numpy(np.int64),
        "km_factor": np.round(
            1.0 - d.astype(np.float64) / n_risk.astype(np.float64),
            6)}))


def scd2_intervals(ds: ray.data.Dataset, key_col: str, ts_col: str,
                   id_col: str, attr_col: str,
                   num_buckets: int = shuffle.DEFAULT_BUCKETS,
                   ) -> ray.data.Dataset:
    """Slowly-changing-dimension type-2 snapshot construction: per key
    (ordered by ``(ts, id)``) collapse consecutive runs of an equal
    tracked attribute into validity intervals —
    ``(key, attr, start_us, end_us, n_events)`` where ``end_us`` is
    the NEXT run's start (NULL on the key's current/open run).  The
    standard event-log → dimension-table op every warehouse load
    performs; the SQL twin is the lag-change + running-sum island
    construction with a LEAD over run starts.

    ONE shuffle keyed by ``key_col``; the kernel is a vectorized
    change-flag cumsum (no per-row loop).  Timestamps are int64 µs so
    the twin hashes bit-exact; ``end_us`` is nullable int64 (Arrow
    keeps the type through the None padding).
    """
    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            key_col: b[key_col],
            "__us": b[ts_col].to_numpy().astype("datetime64[us]")
            .view("i8"),
            "__id": b[id_col], "__attr": b[attr_col]})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "__us", "__id"], kind="stable")
        kk = g[key_col].to_numpy()
        us = g["__us"].to_numpy(np.int64)
        at = g["__attr"].to_numpy()
        new_key = np.concatenate(([True], kk[1:] != kk[:-1]))
        chg = np.concatenate(([True], at[1:] != at[:-1]))
        run_start = new_key | chg
        run_id = np.cumsum(run_start)
        agg = (pd.DataFrame({"k": kk, "run": run_id, "us": us,
                             "attr": at})
               .groupby(["k", "run"], sort=False)
               .agg(attr=("attr", "first"), start_us=("us", "min"),
                    n_events=("us", "size")).reset_index())
        # runs arrive in (key, time) order: next run's start within key
        nxt = agg.groupby("k", sort=False)["start_us"].shift(-1)
        return pd.DataFrame({
            key_col: agg["k"].to_numpy(),
            "attr": agg["attr"].to_numpy(),
            "start_us": agg["start_us"].to_numpy(np.int64),
            "end_us": pd.array(nxt, dtype="Int64"),
            "n_events": agg["n_events"].to_numpy(np.int64)})

    rows = ds.map_batches(prep, batch_format="pandas")
    return shuffle.grouped_transform(rows, [key_col], kernel,
                                     num_buckets=num_buckets)
