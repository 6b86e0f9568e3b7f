"""Interval overlap join (exactly-once bucket ownership) and ordered
user-path aggregation."""

import numpy as np
import pandas as pd
import ray.data as rd


def _brute(left: pd.DataFrame, right: pd.DataFrame) -> set:
    out = set()
    for _, a in left.iterrows():
        for _, b in right.iterrows():
            if a["s"] < b["e"] and b["s"] < a["e"]:
                out.add((a["id"], b["id"],
                         min(a["e"], b["e"]) - max(a["s"], b["s"])))
    return out


def test_interval_overlap_matches_brute_force():
    from city2graph_ray.ops.intervals import interval_overlap_join
    rng = np.random.default_rng(11)
    n = 300
    ls = rng.integers(0, 100_000, n)
    rs = rng.integers(0, 100_000, n)
    left = pd.DataFrame({"id": np.arange(n, dtype=np.int64), "s": ls,
                         "e": ls + rng.integers(1, 5000, n)})
    right = pd.DataFrame({"id": np.arange(n, dtype=np.int64) + 1000,
                          "s": rs,
                          "e": rs + rng.integers(1, 5000, n)})
    for w in (1000, 3000, 50_000):  # narrower AND wider than intervals
        got = interval_overlap_join(
            rd.from_pandas(left).repartition(4),
            rd.from_pandas(right).repartition(4),
            bucket_width=w, num_buckets=8).to_pandas()
        pairs = set(zip(got["a_id"], got["b_id"], got["overlap"]))
        assert len(got) == len(pairs)  # exactly-once: no dup emission
        assert pairs == _brute(left, right), w


def test_interval_overlap_long_interval_and_empty():
    from city2graph_ray.ops.intervals import interval_overlap_join
    # one interval spanning many buckets, counted once per partner
    left = pd.DataFrame({"id": np.int64([1]), "s": np.int64([0]),
                         "e": np.int64([100_000])})
    right = pd.DataFrame({"id": np.int64([2, 3, 4]),
                          "s": np.int64([500, 50_000, 100_000]),
                          "e": np.int64([600, 50_100, 100_001])})
    got = interval_overlap_join(rd.from_pandas(left),
                                rd.from_pandas(right),
                                bucket_width=1000,
                                num_buckets=4).to_pandas()
    # id=4 starts exactly at left's end (end-exclusive): no overlap
    assert sorted(got["b_id"]) == [2, 3]
    empty = pd.DataFrame({"id": pd.Series([], dtype=np.int64),
                          "s": pd.Series([], dtype=np.int64),
                          "e": pd.Series([], dtype=np.int64)})
    assert interval_overlap_join(rd.from_pandas(empty),
                                 rd.from_pandas(right),
                                 bucket_width=1000,
                                 num_buckets=4).count() == 0


def test_user_paths_matches_pandas():
    from city2graph_ray.ops.funnel import user_paths
    rng = np.random.default_rng(5)
    n = 500
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 20, n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 86_400, n), unit="s"),
        "event_type": rng.choice(["a", "b", "c"], n)})
    got = (user_paths(rd.from_pandas(ev), max_steps=5, num_buckets=8)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    want = (ev.sort_values(["user_id", "ts", "event_id"])
            .groupby("user_id").head(5)
            .groupby("user_id")
            .agg(path=("event_type", "|".join),
                 n_steps=("event_type", "size")).reset_index())
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["path"].tolist() == want["path"].tolist()
    assert got["n_steps"].tolist() == want["n_steps"].tolist()


def test_transition_counts_matches_pandas():
    from city2graph_ray.ops.funnel import transition_counts
    rng = np.random.default_rng(11)
    n = 600
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 25, n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 3600, n), unit="s"),
        "event_type": rng.choice(["a", "b", "c", "d"], n)})
    got = (transition_counts(rd.from_pandas(ev), num_buckets=8)
           .to_pandas().sort_values(["src_type", "dst_type"])
           .reset_index(drop=True))
    s = ev.sort_values(["user_id", "ts", "event_id"])
    same = s["user_id"].to_numpy()[:-1] == s["user_id"].to_numpy()[1:]
    want = pd.DataFrame({
        "src_type": s["event_type"].to_numpy()[:-1][same],
        "dst_type": s["event_type"].to_numpy()[1:][same]}) \
        .groupby(["src_type", "dst_type"]).size().rename("n") \
        .reset_index()
    pd.testing.assert_frame_equal(
        got, want.astype({"n": np.int64}), check_dtype=False)


def test_interval_coverage_bruteforce():
    from city2graph_ray.ops.intervals import interval_coverage
    rng = np.random.default_rng(5)
    n = 800
    s = rng.integers(0, 10_000, n)
    iv = pd.DataFrame({
        "id": rng.integers(0, 30, n).astype(np.int64),
        "s": s.astype(np.int64),
        "e": (s + rng.integers(0, 500, n)).astype(np.int64)})
    got = (interval_coverage(rd.from_pandas(iv), key_col="id",
                             num_buckets=8)
           .to_pandas().sort_values("id").reset_index(drop=True))

    def brute(g):
        rows = sorted(zip(g["s"], g["e"]))
        islands = []
        for st, en in rows:
            if islands and st <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], en)
                islands[-1][2] += 1
            else:
                islands.append([st, en, 1])
        return (len(rows), len(islands),
                sum(e - s for s, e, _ in islands),
                max(e for _, e, _ in islands) - min(s for s, _, _ in islands))

    for _, r in got.iterrows():
        g = iv[iv["id"] == r["id"]]
        ni, nisl, cov, span = brute(g)
        assert (r["n_intervals"], r["n_islands"], r["covered"],
                r["span"]) == (ni, nisl, cov, span)
    assert set(got["id"]) == set(iv["id"])


def test_interval_coverage_edges():
    from city2graph_ray.ops.intervals import interval_coverage
    # touching intervals merge; zero-length interval inside an island
    iv = pd.DataFrame({
        "id": np.array([1, 1, 1, 2], np.int64),
        "s": np.array([0, 10, 5, 7], np.int64),
        "e": np.array([10, 20, 5, 7], np.int64)})
    got = (interval_coverage(rd.from_pandas(iv), key_col="id",
                             num_buckets=4)
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert got.loc[0, "n_islands"] == 1 and got.loc[0, "covered"] == 20
    assert got.loc[1, "n_islands"] == 1 and got.loc[1, "covered"] == 0


def test_interval_max_nonoverlap_bruteforce():
    import itertools

    import numpy as np
    import pandas as pd
    import ray.data as rd
    from city2graph_ray.ops.intervals import interval_max_nonoverlap

    rng = np.random.default_rng(61)
    rows = []
    for k in range(5):
        n = rng.integers(3, 9)
        s = rng.integers(0, 40, n)
        rows.append(pd.DataFrame({"id": k, "s": s,
                                  "e": s + rng.integers(1, 15, n)}))
    df = pd.concat(rows, ignore_index=True).astype(np.int64)
    got = (interval_max_nonoverlap(rd.from_pandas(df), num_buckets=2)
           .to_pandas().set_index("id").sort_index())
    for k, g in df.groupby("id"):
        iv = list(zip(g["s"], g["e"]))
        best = 0
        for m in range(len(iv), 0, -1):
            for combo in itertools.combinations(iv, m):
                cs = sorted(combo)
                if all(cs[i + 1][0] >= cs[i][1] for i in range(m - 1)):
                    best = m
                    break
            if best:
                break
        assert got.loc[k, "n_selected"] == best, k
        assert got.loc[k, "n_intervals"] == len(iv)


def test_interval_max_nonoverlap_touching_allowed():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from city2graph_ray.ops.intervals import interval_max_nonoverlap

    df = pd.DataFrame({"id": [1, 1, 1], "s": [0, 10, 20],
                       "e": [10, 20, 30]}).astype(np.int64)
    got = interval_max_nonoverlap(rd.from_pandas(df)).to_pandas()
    assert got["n_selected"].iloc[0] == 3


def test_allen_relation_census_bruteforce():
    import ray.data as rd

    from city2graph_ray.ops.intervals import allen_relation_census
    rng = np.random.default_rng(17)
    n = 150
    s = rng.integers(0, 50, n)
    df = pd.DataFrame({"k": rng.integers(0, 5, n),
                       "id": np.arange(n, dtype=np.int64),
                       "s": s, "e": s + rng.integers(1, 30, n)})
    out = (allen_relation_census(rd.from_pandas(df).repartition(4),
                                 "k", "s", "e", "id", num_buckets=4)
           .to_pandas())

    def rel(si, ei, sj, ej):
        if si == sj:
            return ("equal" if ei == ej
                    else "starts" if ei < ej else "started_by")
        if ei < sj:
            return "before"
        if ei == sj:
            return "meets"
        if ei == ej:
            return "finished_by"
        if ej < ei:
            return "contains"
        return "overlaps"

    from collections import Counter
    want = Counter()
    for k, g in df.groupby("k"):
        g = g.sort_values(["s", "id"])
        rows = g[["s", "e"]].to_numpy()
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                want[(k, rel(rows[i][0], rows[i][1],
                             rows[j][0], rows[j][1]))] += 1
    got = {(r["k"], r["relation"]): r["n"]
           for _, r in out.iterrows()}
    assert got == dict(want)


def test_theil_sen_bruteforce():
    import ray.data as rd

    from city2graph_ray.ops.stats import theil_sen
    rng = np.random.default_rng(19)
    n = 120
    df = pd.DataFrame({"k": rng.integers(0, 6, n),
                       "t": rng.integers(0, 40, n),
                       "v": rng.integers(-50, 50, n)})
    out = (theil_sen(rd.from_pandas(df).repartition(3), "k", "t", "v",
                     num_buckets=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    for k, g in df.groupby("k"):
        sls = []
        rows = g[["t", "v"]].to_numpy()
        for i in range(len(rows)):
            for j in range(len(rows)):
                if rows[i][0] < rows[j][0]:
                    sls.append((rows[j][1] - rows[i][1])
                               / (rows[j][0] - rows[i][0]))
        row = out[out["k"] == k]
        if not sls:
            assert row.empty
            continue
        assert int(row["n_pairs"].iloc[0]) == len(sls)
        assert row["slope"].iloc[0] == round(float(np.median(sls)), 9)
