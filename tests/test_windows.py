"""Window-op unit tests."""

import numpy as np
import pandas as pd


def test_percent_rank_cume_ties():
    import ray.data as rd
    from city2graph_ray.ops.windows import percent_rank_cume
    df = pd.DataFrame({"id": np.arange(6, dtype=np.int64),
                       "v": [3.0, 1.0, 3.0, 2.0, 1.0, 3.0]})
    out = (percent_rank_cume(rd.from_pandas(df).repartition(3), "v",
                             "id", num_buckets=4)
           .to_pandas().sort_values("id").reset_index(drop=True))
    # SQL semantics: pct = (rank-1)/(n-1); cume = #(<= v)/n
    want_pct = {1.0: 0.0, 2.0: 2 / 5, 3.0: 3 / 5}
    want_cume = {1.0: 2 / 6, 2.0: 3 / 6, 3.0: 1.0}
    for _, r in out.iterrows():
        assert r["pct_rank"] == want_pct[r["v"]]
        assert r["cume"] == want_cume[r["v"]]


def test_percent_rank_single_row():
    import ray.data as rd
    from city2graph_ray.ops.windows import percent_rank_cume
    df = pd.DataFrame({"id": [1], "v": [5.0]})
    out = percent_rank_cume(rd.from_pandas(df), "v", "id").to_pandas()
    assert out["pct_rank"].iloc[0] == 0.0 and out["cume"].iloc[0] == 1.0


def test_resample_ffill_bruteforce():
    import ray.data as rd
    from city2graph_ray.ops.windows import resample_ffill
    rng = np.random.default_rng(3)
    n = 120
    ts = rng.integers(0, 1000, n) * 1_000_000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 5, n).astype(np.int64),
        "ts": ts.astype("datetime64[us]"),
        "value": np.round(rng.normal(0, 5, n), 2)})
    # duplicate-timestamp rows to exercise max-id tie-break
    dup = df.iloc[:10].copy()
    dup["event_id"] += 1000
    dup["value"] += 7.0
    df = pd.concat([df, dup], ignore_index=True)
    origin, step, k = 50_000_000, 100_000_000, 12
    out = resample_ffill(rd.from_pandas(df).repartition(4), "user_id",
                         "ts", "value", "event_id", origin, k, step,
                         num_buckets=4).to_pandas()
    got = {(int(r.user_id), int(r.grid_ts_us)):
           (r.value, int(r.src_ts_us)) for r in out.itertuples()}
    want = {}
    for u, grp in df.groupby("user_id"):
        grp = grp.sort_values(["ts", "event_id"])
        for i in range(k):
            g = origin + i * step
            prior = grp[grp["ts"].astype("datetime64[us]")
                        .astype(np.int64) <= g]
            if len(prior):
                last = prior.iloc[-1]
                want[(int(u), g)] = (
                    last["value"],
                    int(pd.Timestamp(last["ts"]).value // 1000))
    assert got == want


def test_grouped_ewma_matches_pandas_ewm():
    import ray.data as rd
    from city2graph_ray.ops.windows import grouped_ewma
    rng = np.random.default_rng(17)
    n = 500
    df = pd.DataFrame({
        "k": rng.integers(0, 20, n).astype(np.int64),
        "o": np.arange(n, dtype=np.int64),
        "v": rng.uniform(0, 100, n)})
    got = (grouped_ewma(rd.from_pandas(df), "k", ["o"], "v",
                        alpha=0.3, round_to=None, num_buckets=8)
           .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    want = (df.sort_values(["k", "o"])
            .groupby("k")["v"]
            .transform(lambda s: s.ewm(alpha=0.3, adjust=False).mean())
            .reset_index(drop=True))
    assert np.allclose(got["ewma"].to_numpy(), want.to_numpy(),
                       rtol=1e-12)


def test_grouped_ewma_int_bruteforce():
    import ray.data as rd
    from city2graph_ray.ops.windows import grouped_ewma_int
    rng = np.random.default_rng(23)
    n = 300
    df = pd.DataFrame({
        "k": rng.integers(0, 9, n).astype(np.int64),
        "o": np.arange(n, dtype=np.int64),
        "v": rng.integers(0, 10_000, n).astype(np.int64)})
    got = (grouped_ewma_int(rd.from_pandas(df), "k", ["o"], "v",
                            num=1, den=4, scale=256, num_buckets=4)
           .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    state: dict = {}
    want = []
    for _, r in df.sort_values(["k", "o"]).iterrows():
        k, v = r["k"], r["v"]
        if k not in state:
            state[k] = v * 256
        else:
            state[k] = (1 * v * 256 + 3 * state[k] + 2) // 4
        want.append(state[k])
    assert got["ewma_scaled"].tolist() == want


def test_scd2_intervals_bruteforce():
    import ray.data as rd
    from city2graph_ray.ops.windows import scd2_intervals
    rng = np.random.default_rng(11)
    n = 200
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 7, n),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "attr": rng.choice(["a", "b", "c"], n)})
    out = (scd2_intervals(rd.from_pandas(df).repartition(5), "k", "ts",
                          "id", "attr", num_buckets=4)
           .to_pandas().sort_values(["k", "start_us"])
           .reset_index(drop=True))
    # brute force per key
    rows = []
    for k, g in df.sort_values(["k", "ts", "id"]).groupby("k"):
        runs = []
        for _, r in g.iterrows():
            us = int(np.int64(r["ts"].value) // 1000)
            if runs and runs[-1][0] == r["attr"]:
                runs[-1][2] += 1
            else:
                runs.append([r["attr"], us, 1])
        for i, (a, s, c) in enumerate(runs):
            e = runs[i + 1][1] if i + 1 < len(runs) else None
            rows.append((k, a, s, e, c))
    want = pd.DataFrame(rows, columns=["k", "attr", "start_us",
                                       "end_us", "n_events"])
    want = want.sort_values(["k", "start_us"]).reset_index(drop=True)
    assert len(out) == len(want)
    assert (out["attr"].to_numpy() == want["attr"].to_numpy()).all()
    assert (out["start_us"].to_numpy(np.int64)
            == want["start_us"].to_numpy(np.int64)).all()
    assert (out["n_events"].to_numpy(np.int64)
            == want["n_events"].to_numpy(np.int64)).all()
    got_end = out["end_us"].astype("Int64")
    want_end = want["end_us"].astype("Int64")
    assert got_end.isna().equals(want_end.isna())
    assert (got_end.dropna().to_numpy(np.int64)
            == want_end.dropna().to_numpy(np.int64)).all()


def test_scd2_single_and_empty_key_behaviour():
    import ray.data as rd
    from city2graph_ray.ops.windows import scd2_intervals
    df = pd.DataFrame({"id": [1], "k": [0],
                       "ts": pd.to_datetime(["2024-01-01"]),
                       "attr": ["x"]})
    out = scd2_intervals(rd.from_pandas(df), "k", "ts", "id",
                         "attr").to_pandas()
    assert len(out) == 1
    assert out["n_events"].iloc[0] == 1
    assert pd.isna(out["end_us"].iloc[0])
