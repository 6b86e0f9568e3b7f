"""Funnel / retention-cohort / token-budget / weighted-sample ops vs
brute-force oracles and edge cases."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def _events() -> pd.DataFrame:
    base = np.datetime64("2024-01-01T00:00:00")
    rows = [
        # user 1 completes view -> click -> purchase in order
        (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
        # user 2: click BEFORE view, then no click after -> stops at view
        (2, 0, "click"), (2, 10, "view"), (2, 20, "purchase"),
        # user 3: view then click, purchase missing
        (3, 5, "view"), (3, 6, "click"),
        # user 4: same-timestamp view/click (strict > excludes click)
        (4, 7, "view"), (4, 7, "click"),
        # user 5: no view at all
        (5, 1, "purchase"),
        # user 6: two views; click after the FIRST view counts
        (6, 0, "view"), (6, 100, "view"), (6, 50, "click"),
        (6, 60, "purchase"),
    ]
    return pd.DataFrame({
        "user_id": np.int64([r[0] for r in rows]),
        "ts": [base + np.timedelta64(r[1], "s") for r in rows],
        "event_type": [r[2] for r in rows]})


def test_funnel_strict_order():
    from city2graph_ray.ops.funnel import funnel
    out = (funnel(rd.from_pandas(_events()),
                  ["view", "click", "purchase"], num_buckets=3)
           .to_pandas().sort_values("step_idx").reset_index(drop=True))
    # step1: users 1,2,3,4,6 have a view -> 5
    # step2: click strictly after first view: 1,3,6 -> 3
    # step3: purchase after that click: 1,6 -> 2
    assert list(out["n_users"]) == [5, 3, 2]
    assert list(out["step"]) == ["view", "click", "purchase"]


def test_funnel_empty_and_missing_step():
    from city2graph_ray.ops.funnel import funnel
    ev = _events()
    out = funnel(rd.from_pandas(ev), ["signup", "view"],
                 num_buckets=2).to_pandas()
    assert list(out["n_users"]) == [0, 0]


def test_retention_cohorts():
    from city2graph_ray.ops.funnel import retention_cohorts
    base = np.datetime64("2024-01-01T12:00:00")
    day = np.timedelta64(1, "D")
    df = pd.DataFrame({
        "user_id": np.int64([1, 1, 1, 2, 2, 3]),
        "ts": [base, base + day, base + 3 * day,  # u1: offsets 0,1,3
               base + day, base + day,            # u2: cohort day1, off 0
               base],                             # u3: cohort day0, off 0
    })
    out = retention_cohorts(rd.from_pandas(df), num_buckets=2).to_pandas()
    got = {(int(r["cohort_day"]), int(r["day_offset"])): int(r["n_users"])
           for _, r in out.iterrows()}
    d0 = int((base.astype("datetime64[D]")).astype(np.int64))
    assert got == {(d0, 0): 2, (d0, 1): 1, (d0, 3): 1, (d0 + 1, 0): 1}


def test_token_budget_selection():
    from city2graph_ray.text.packing import select_by_token_budget
    docs = pd.DataFrame({
        "doc_id": np.int64([1, 2, 3, 4]),
        "text": ["a b c", "a b c d e", "a", "a b"],
        "n_chars": np.int64([30, 50, 10, 20])})
    # order: doc2 (5 tok), doc1 (3), doc4 (2), doc3 (1); cum 5,8,10,11
    out = (select_by_token_budget(rd.from_pandas(docs), 10)
           .to_pandas().sort_values("cum_tokens").reset_index(drop=True))
    assert list(out["doc_id"]) == [2, 1, 4]
    assert list(out["cum_tokens"]) == [5, 8, 10]  # boundary doc included
    # budget below first doc -> empty; huge budget -> all
    assert select_by_token_budget(rd.from_pandas(docs), 4).count() == 0
    assert select_by_token_budget(rd.from_pandas(docs), 10 ** 6).count() == 4


def test_weighted_sample_deterministic_and_weighted():
    from city2graph_ray.text.analysis import weighted_sample
    rng = np.random.default_rng(0)
    docs = pd.DataFrame({
        "doc_id": np.arange(400, dtype=np.int64),
        "n_chars": np.where(np.arange(400) < 40, 1000, 1).astype(np.int64)})
    out = weighted_sample(rd.from_pandas(docs), k=30).to_pandas()
    # reshard-stable: same result from a different block layout
    out2 = weighted_sample(
        rd.from_pandas(docs).repartition(7), k=30).to_pandas()
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  out2.reset_index(drop=True))
    # heavy docs (10% of rows, 1000x weight) must dominate the sample
    heavy = (out["doc_id"] < 40).sum()
    assert heavy >= 25
    assert list(out["rank"]) == list(range(1, 31))
    # k > n returns everything
    assert weighted_sample(rd.from_pandas(docs.head(5)), k=50).count() == 5


def test_rrf_fuse():
    from city2graph_ray.pipelines.retrieval import rrf_fuse
    bm = pd.DataFrame({"doc_id": np.int64([10, 20, 30]),
                       "rank": np.int64([1, 2, 3])})
    ann = pd.DataFrame({"doc_id": np.int64([20, 40]),
                        "rank": np.int64([1, 2])})
    out = rrf_fuse([bm, ann], c=60, k=10)
    got = dict(zip(out["doc_id"].astype(int), out["rrf"]))
    assert abs(got[20] - (1 / 62 + 1 / 61)) < 1e-15  # both lists
    assert abs(got[10] - 1 / 61) < 1e-15             # lexical only
    assert abs(got[40] - 1 / 62) < 1e-15             # vector only
    # fused order: 20 first, then 10 (1/61), then 40 vs 30 (1/62 vs 1/63)
    assert list(out["doc_id"]) == [20, 10, 40, 30]
    assert list(out["rank"]) == [1, 2, 3, 4]
    # equal scores tie-break by id: two docs each only-rank-1
    a = pd.DataFrame({"doc_id": np.int64([7]), "rank": np.int64([1])})
    b = pd.DataFrame({"doc_id": np.int64([3]), "rank": np.int64([1])})
    t = rrf_fuse([a, b], k=2)
    assert list(t["doc_id"]) == [3, 7]


def test_global_row_number():
    from city2graph_ray import shuffle
    rng = np.random.default_rng(1)
    df = pd.DataFrame({"id": np.arange(500, dtype=np.int64),
                       "v": rng.integers(0, 50, 500).astype(np.int64)})
    out = shuffle.global_row_number(
        rd.from_pandas(df).repartition(9), ["v", "id"],
        descending=[True, False]).to_pandas()
    want = (df.sort_values(["v", "id"], ascending=[False, True])
            .reset_index(drop=True))
    got = out.sort_values("rn").reset_index(drop=True)
    assert list(got["id"]) == list(want["id"])
    assert list(got["rn"]) == list(range(1, 501))
    # empty input stays empty
    assert shuffle.global_row_number(
        rd.from_pandas(df.head(0)), ["v"]).count() == 0


def test_cooccurrence_graph():
    from city2graph_ray.ops.graph_algos import cooccurrence_graph
    df = pd.DataFrame({
        "u": np.int64([1, 1, 1, 2, 2, 3, 3, 3, 3]),
        "t": ["a", "b", "b", "b", "c", "a", "b", "c", "a"]})
    out = cooccurrence_graph(rd.from_pandas(df), "u", "t",
                             num_buckets=3).to_pandas()
    got = {(r["item_a"], r["item_b"]): int(r["n_keys"])
           for _, r in out.iterrows()}
    # u1: {a,b}; u2: {b,c}; u3: {a,b,c} (duplicates collapse)
    assert got == {("a", "b"): 2, ("b", "c"): 2, ("a", "c"): 1}
    # single-item keys contribute nothing
    solo = pd.DataFrame({"u": np.int64([9]), "t": ["z"]})
    assert cooccurrence_graph(rd.from_pandas(solo), "u", "t",
                              num_buckets=2).count() == 0


def test_group_variance_exact_and_layout_stable():
    from city2graph_ray.ops.stats import group_variance
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "g": rng.integers(0, 4, 1000).astype(np.int64),
        "v": np.round(rng.uniform(0, 100, 1000), 2)})
    out = (group_variance(rd.from_pandas(df), ["g"], "v")
           .to_pandas().sort_values("g").reset_index(drop=True))
    out2 = (group_variance(rd.from_pandas(df).repartition(13), ["g"], "v")
            .to_pandas().sort_values("g").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out2)  # bit-identical layouts
    for _, r in out.iterrows():
        sub = df.loc[df["g"] == r["g"], "v"]
        assert int(r["n"]) == len(sub)
        assert abs(r["mean"] - sub.mean()) < 1e-9
        assert abs(r["var"] - sub.var(ddof=0)) < 1e-6
    # single-value group has zero variance, exactly
    one = pd.DataFrame({"g": np.int64([1, 1, 1]), "v": [2.5, 2.5, 2.5]})
    o = group_variance(rd.from_pandas(one), ["g"], "v").to_pandas()
    assert o["var"].iloc[0] == 0.0 and o["mean"].iloc[0] == 2.5


def test_funnel_retention_empty_input():
    from city2graph_ray.ops.funnel import funnel, retention_cohorts
    empty = pd.DataFrame({
        "user_id": pd.Series([], dtype=np.int64),
        "ts": pd.Series([], dtype="datetime64[ns]"),
        "event_type": pd.Series([], dtype=object)})
    out = funnel(rd.from_pandas(empty), ["a", "b"],
                 num_buckets=2).to_pandas()
    assert list(out["n_users"]) == [0, 0]
    assert retention_cohorts(rd.from_pandas(empty),
                             num_buckets=2).count() == 0


def test_global_ntile_sql_remainder_semantics():
    from city2graph_ray import shuffle
    # n=10, k=3 -> tile sizes 4,3,3 (first n%k tiles get ceil(n/k))
    df = pd.DataFrame({"v": np.arange(10, dtype=np.int64)})
    out = shuffle.global_ntile(rd.from_pandas(df).repartition(3),
                               ["v"], 3).to_pandas().sort_values("v")
    assert out["tile"].tolist() == [1, 1, 1, 1, 2, 2, 2, 3, 3, 3]
    # n < k: each of the n rows gets its own tile 1..n
    small = pd.DataFrame({"v": np.arange(4, dtype=np.int64)})
    got = shuffle.global_ntile(rd.from_pandas(small),
                               ["v"], 10).to_pandas().sort_values("v")
    assert got["tile"].tolist() == [1, 2, 3, 4]
    # empty passes through
    empty = pd.DataFrame({"v": pd.Series([], dtype=np.int64)})
    assert shuffle.global_ntile(rd.from_pandas(empty),
                                ["v"], 5).count() == 0


def test_group_linreg_exact_and_layout_stable():
    from city2graph_ray.ops.stats import group_linreg
    rng = np.random.default_rng(23)
    n = 2000
    df = pd.DataFrame({
        "g": rng.integers(0, 4, n),
        "x": rng.integers(0, 500, n).astype(np.float64),
        "y": np.round(rng.uniform(0, 100, n), 2)})
    outs = []
    for parts in (1, 7):
        ds = rd.from_pandas(df).repartition(parts)
        o = (group_linreg(ds, ["g"], "x", "y", x_scale=1, y_scale=100,
                          num_buckets=8)
             .to_pandas().sort_values("g").reset_index(drop=True))
        outs.append(o)
    # layout-stable: bit-identical across block layouts
    assert outs[0]["slope"].tolist() == outs[1]["slope"].tolist()
    assert outs[0]["intercept"].tolist() == outs[1]["intercept"].tolist()
    # matches a plain least-squares fit on quantized units
    for _, r in outs[0].iterrows():
        sub = df[df["g"] == r["g"]]
        xu = np.floor(sub["x"].to_numpy() + 0.5)
        yu = np.floor(sub["y"].to_numpy() * 100 + 0.5) / 100.0
        m, c = np.polyfit(xu, yu, 1)
        assert abs(r["slope"] - m) < 1e-9
        assert abs(r["intercept"] - c) < 1e-7


def test_group_linreg_degenerate_x():
    from city2graph_ray.ops.stats import group_linreg
    df = pd.DataFrame({"g": np.int64([1, 1, 1]),
                       "x": [5.0, 5.0, 5.0],
                       "y": [1.0, 2.0, 3.0]})
    out = group_linreg(rd.from_pandas(df), ["g"], "x", "y",
                       num_buckets=4).to_pandas()
    assert np.isnan(out["slope"].iloc[0])  # zero x-variance


def test_sequence_pattern_count_bruteforce():
    import re

    import ray.data as rd

    from city2graph_ray.ops.funnel import sequence_pattern_count
    rng = np.random.default_rng(59)
    n = 300
    df = pd.DataFrame({
        "user_id": rng.integers(0, 8, n),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "event_type": rng.choice(["view", "click", "purchase",
                                  "error"], n)})
    out = (sequence_pattern_count(rd.from_pandas(df).repartition(4),
                                  r"v+c+p", num_buckets=4)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        seq = "".join(t[0] for t in g["event_type"])
        row = out[out["user_id"] == uid].iloc[0]
        assert int(row["seq_len"]) == len(seq)
        assert int(row["n_matches"]) == len(re.findall(r"v+c+p", seq))
