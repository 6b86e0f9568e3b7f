"""Dyad census, rich club, CUSUM, Gini moments, readability counts and
semivariogram vs brute-force numpy/pandas oracles."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data as rd

from city2graph_ray.ops.graph_algos import dyad_census, rich_club
from city2graph_ray.ops.spatial import semivariogram
from city2graph_ray.ops.stats import gini_moments
from city2graph_ray.ops.windows import cusum_max
from city2graph_ray.text.analysis import readability_counts


def test_dyad_census_known():
    df = pd.DataFrame({
        "src": np.array([1, 2, 1, 4, 1], np.int64),
        "dst": np.array([2, 1, 3, 1, 1], np.int64)})  # 1->1 self dropped
    out = dyad_census(rd.from_pandas(df)).to_pandas().iloc[0]
    assert out["n_nodes"] == 4
    assert out["n_mutual"] == 1        # 1<->2
    assert out["n_asym"] == 2          # 1->3, 4->1
    assert out["n_null"] == 6 - 3      # C(4,2) - mutual - asym


def test_dyad_census_random_vs_brute():
    rng = np.random.default_rng(11)
    df = pd.DataFrame({"src": rng.integers(0, 20, 300).astype(np.int64),
                       "dst": rng.integers(0, 20, 300).astype(np.int64)})
    arcs = {(s, d) for s, d in zip(df["src"], df["dst"]) if s != d}
    nodes = {v for e in arcs for v in e}
    pairs = {}
    for s, d in arcs:
        pairs[(min(s, d), max(s, d))] = pairs.get((min(s, d), max(s, d)),
                                                  0) + 1
    mut = sum(1 for c in pairs.values() if c == 2)
    asym = sum(1 for c in pairs.values() if c == 1)
    out = dyad_census(rd.from_pandas(df)).to_pandas().iloc[0]
    assert out["n_nodes"] == len(nodes)
    assert out["n_mutual"] == mut
    assert out["n_asym"] == asym
    assert out["n_null"] == len(nodes) * (len(nodes) - 1) // 2 - mut - asym


def test_rich_club_known():
    # K4 on {1..4} plus pendant 5-1: degrees 1:4, 2-4:3, 5:1
    e = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 1)]
    df = pd.DataFrame({"src": [a for a, _ in e],
                       "dst": [b for _, b in e]}).astype(np.int64)
    out = rich_club(rd.from_pandas(df), [1, 2, 3]).to_pandas()
    out = out.set_index("k")
    assert out.loc[1, "n_nodes"] == 4 and out.loc[1, "n_edges"] == 6
    assert out.loc[2, "n_nodes"] == 4 and out.loc[2, "n_edges"] == 6
    assert out.loc[3, "n_nodes"] == 1 and out.loc[3, "n_edges"] == 0


def test_cusum_max_vs_brute():
    rng = np.random.default_rng(5)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10_000, n), unit="s"),
        "user_id": rng.integers(0, 7, n).astype(np.int64),
        "value": np.round(rng.normal(50, 20, n), 2)})
    out = cusum_max(rd.from_pandas(df), "user_id", "ts", "event_id",
                    "value").to_pandas().set_index("user_id")

    u = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    n_tot, s_tot = len(df), int(u.sum())
    for uid, g in df.assign(u=u).groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        cus = np.cumsum(n_tot * g["u"].to_numpy(np.int64) - s_tot)
        k = int(np.argmax(np.abs(cus)))  # first max in order
        assert out.loc[uid, "max_abs_cusum"] == abs(cus[k])
        assert out.loc[uid, "at_id"] == g["event_id"].iloc[k]


def test_gini_moments_vs_brute():
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "id": np.arange(500, dtype=np.int64),
        "v": np.round(rng.exponential(100, 500), 2)})
    out = gini_moments(rd.from_pandas(df), "v", "id").to_pandas().iloc[0]
    u = np.floor(df["v"].to_numpy() * 100 + 0.5).astype(np.int64)
    order = np.lexsort((df["id"].to_numpy(), u))
    su = u[order]
    rn = np.arange(1, len(su) + 1, dtype=np.int64)
    assert out["n"] == len(su)
    assert out["sum_units"] == int(su.sum())
    assert out["rank_weighted_sum"] == int((rn * su).sum())
    # Gini of the constant distribution is 0
    cdf = pd.DataFrame({"id": np.arange(10, dtype=np.int64),
                        "v": np.full(10, 7.5)})
    m = gini_moments(rd.from_pandas(cdf), "v", "id").to_pandas().iloc[0]
    g = (2 * m["rank_weighted_sum"] - (m["n"] + 1) * m["sum_units"]) \
        / (m["n"] * m["sum_units"])
    assert g == 0.0


def test_readability_counts_vs_re():
    texts = ["Hello world. This is great! Right?",
             "", "aaa", "supercalifragilistic expialidocious!!",
             "No punctuation here just seven letters absolutely"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    out = readability_counts(rd.from_pandas(df)).to_pandas() \
        .set_index("doc_id")
    for i, t in enumerate(texts):
        assert out.loc[i, "n_words"] == len(re.findall(r"[A-Za-z0-9]+", t))
        assert out.loc[i, "n_sentences"] == len(re.findall(r"[.!?]+", t))
        assert out.loc[i, "n_vowel_groups"] == len(
            re.findall(r"[aeiou]+", t.lower()))
        assert out.loc[i, "n_long_words"] == len(
            re.findall(r"[A-Za-z0-9]{7,}", t))


def test_semivariogram_vs_brute():
    rng = np.random.default_rng(9)
    n = 200
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "x": np.round(rng.uniform(0, 60, n), 2),
        "y": np.round(rng.uniform(0, 60, n), 2),
        "v": rng.integers(0, 50, n).astype(np.int64)})
    edges = [25, 100, 225]
    out = semivariogram(rd.from_pandas(df), 20.0, edges,
                        num_buckets=8).to_pandas().set_index("band")

    x, y, v = (df["x"].to_numpy(), df["y"].to_numpy(),
               df["v"].to_numpy(np.int64))
    exp_n = {}
    exp_s = {}
    for i in range(n):
        for j in range(i + 1, n):
            dx, dy = x[i] - x[j], y[i] - y[j]
            d2 = dx * dx + dy * dy
            if np.sqrt(d2) <= 20.0:
                band = sum(1 for e in edges if e <= d2)
                exp_n[band] = exp_n.get(band, 0) + 1
                exp_s[band] = exp_s.get(band, 0) + int(v[i] - v[j]) ** 2
    assert set(out.index) == set(exp_n)
    for b in exp_n:
        assert out.loc[b, "n_pairs"] == exp_n[b]
        assert out.loc[b, "sum_sqdiff"] == exp_s[b]


def test_attack_robustness_known():
    from city2graph_ray.ops.graph_algos import attack_robustness
    # two triangles joined through hub 0; removing the hub (deg 4)
    # leaves two 2-cliques -> giant 2, components 2
    e = [(0, 1), (0, 2), (1, 2), (0, 3), (0, 4), (3, 4)]
    df = pd.DataFrame({"src": [a for a, _ in e],
                       "dst": [b for _, b in e]}).astype(np.int64)
    out = attack_robustness(rd.from_pandas(df), 1).to_pandas().iloc[0]
    assert out["n_removed"] == 1
    assert out["giant_size"] == 2
    assert out["n_components"] == 2
    # removing hub + one triangle node leaves a 2-path and a singleton
    out2 = attack_robustness(rd.from_pandas(df), 2).to_pandas().iloc[0]
    assert out2["n_removed"] == 2
    assert out2["giant_size"] == 2
    assert out2["n_components"] == 2


def test_zipf_fit_exact_power_law():
    from city2graph_ray.text.analysis import zipf_fit
    # corpus where token t_r appears floor(1000/r) times: near-ideal
    # Zipf -> slope close to -1
    toks = []
    for r in range(1, 40):
        toks += [f"tok{r:03d}"] * (1000 // r)
    rng = np.random.default_rng(2)
    rng.shuffle(toks)
    docs = pd.DataFrame({
        "doc_id": np.arange(20, dtype=np.int64),
        "text": [" ".join(toks[i::20]) for i in range(20)]})
    out = zipf_fit(rd.from_pandas(docs), top_r=39).to_pandas().iloc[0]
    assert out["n_terms"] == 39
    assert -1.1 < out["slope"] < -0.9
    # intercept ~ ln(1000)
    assert 6.0 < out["intercept"] < 8.0


def test_benford_profile_vs_brute():
    from city2graph_ray.ops.stats import benford_profile
    rng = np.random.default_rng(17)
    v = np.round(rng.lognormal(3, 2, 2000), 2)
    df = pd.DataFrame({"value": v})
    out = benford_profile(rd.from_pandas(df), "value").to_pandas() \
        .set_index("digit")["n"]
    u = np.floor(v * 100 + 0.5).astype(np.int64)
    u = u[u > 0]
    first = np.array([int(str(x)[0]) for x in u])
    for d in range(1, 10):
        exp = int((first == d).sum())
        got = int(out.get(d, 0))
        assert got == exp


def test_condensation_edges_known():
    from city2graph_ray.ops.graph_algos import condensation_edges
    # cycle {1,2,3} -> 4 -> cycle {5,6}; plus 3->5
    e = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 5),
         (3, 5)]
    df = pd.DataFrame({"src": [a for a, _ in e],
                       "dst": [b for _, b in e]}).astype(np.int64)
    out = condensation_edges(rd.from_pandas(df)).to_pandas()
    got = {(r.scc_src, r.scc_dst) for r in out.itertuples()}
    # scc ids are min member: {1,2,3}->1, {4}->4, {5,6}->5
    assert got == {(1, 4), (4, 5), (1, 5)}


def test_group_dispersion_moments_vs_brute():
    from city2graph_ray.ops.stats import group_dispersion_moments
    rng = np.random.default_rng(21)
    df = pd.DataFrame({
        "zone": rng.integers(0, 5, 300).astype(np.int64),
        "mx": rng.integers(0, 1000, 300).astype(np.int64),
        "my": rng.integers(0, 1000, 300).astype(np.int64)})
    out = group_dispersion_moments(rd.from_pandas(df), ["zone"],
                                   "mx", "my").to_pandas() \
        .set_index("zone")
    for z, g in df.groupby("zone"):
        x, y = g["mx"].to_numpy(np.int64), g["my"].to_numpy(np.int64)
        assert out.loc[z, "n"] == len(g)
        assert out.loc[z, "sx"] == x.sum()
        assert out.loc[z, "sy"] == y.sum()
        assert out.loc[z, "sxx"] == (x * x).sum()
        assert out.loc[z, "syy"] == (y * y).sum()
        assert out.loc[z, "sxy"] == (x * y).sum()


def test_jsonl_source_roundtrip(tmp_path):
    import json

    from city2graph_ray.sources.text_files import (load_jsonl_docs,
                                                   write_jsonl)
    p = tmp_path / "shard0.jsonl"
    rows = [{"doc_id": 7, "text": "hello world", "lang": "en"},
            {"doc_id": 8, "text": "", "lang": "fr"},
            {"doc_id": 9, "text": "third doc", "lang": "en"}]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    ds = load_jsonl_docs(str(p), keep_cols=["lang"])
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(df["doc_id"]) == [7, 8, 9]
    assert list(df["text"]) == ["hello world", "", "third doc"]
    assert list(df["lang"]) == ["en", "fr", "en"]
    assert df["doc_id"].dtype == np.int64

    # id-less shard gets stable synthesized ids
    q = tmp_path / "noid.jsonl"
    q.write_text("\n".join(json.dumps({"text": f"t{i}"})
                           for i in range(5)) + "\n")
    d2 = load_jsonl_docs(str(q)).to_pandas().sort_values("doc_id")
    assert list(d2["doc_id"]) == [0, 1, 2, 3, 4]
    assert list(d2["text"]) == [f"t{i}" for i in range(5)]

    # sharded export: valid jsonl lines, re-readable
    outd = tmp_path / "out"
    write_jsonl(ds, str(outd))
    back = load_jsonl_docs(str(outd), keep_cols=["lang"]).to_pandas()
    assert sorted(back["doc_id"]) == [7, 8, 9]


def test_mixture_sample_quota_and_determinism():
    from city2graph_ray.text.analysis import mixture_sample
    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "doc_id": np.arange(200, dtype=np.int64),
        "source": [f"s{i % 4}" for i in range(200)]})
    quotas = pd.DataFrame({"source": ["s0", "s1", "s2"],
                           "quota": [5, 10, 0]})
    out = mixture_sample(rd.from_pandas(df), quotas).to_pandas()
    got = out.groupby("source").size().to_dict()
    assert got.get("s0", 0) == 5
    assert got.get("s1", 0) == 10
    assert "s2" not in got and "s3" not in got
    # reshard-stable: same draw from a shuffled layout
    df2 = df.sample(frac=1.0, random_state=1).reset_index(drop=True)
    out2 = mixture_sample(
        rd.from_pandas(df2).repartition(7), quotas).to_pandas()
    a = sorted(map(tuple, out[["source", "doc_id"]].to_numpy()))
    b = sorted(map(tuple, out2[["source", "doc_id"]].to_numpy()))
    assert a == b


def test_grouped_rolling_mean_vs_pandas():
    from city2graph_ray.ops.windows import grouped_rolling_mean
    rng = np.random.default_rng(31)
    n = 300
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 5000, n), unit="s"),
        "user_id": rng.integers(0, 6, n).astype(np.int64),
        "value": np.round(rng.uniform(0, 100, n), 2)})
    out = grouped_rolling_mean(rd.from_pandas(df), ["user_id"],
                               ["ts", "event_id"], "value", 3) \
        .to_pandas().set_index("event_id")["rmean"]
    u = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    exp = df.assign(u=u).sort_values(["user_id", "ts", "event_id"])
    for uid, g in exp.groupby("user_id"):
        su = g["u"].rolling(3, min_periods=1).sum().to_numpy()
        cn = g["u"].rolling(3, min_periods=1).count().to_numpy()
        want = su / (cn * 100.0)
        for eid, w in zip(g["event_id"], want):
            assert out.loc[eid] == w


def test_lag_autocorr_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from city2graph_ray.ops.stats import lag_autocorr

    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame({
        "k": rng.integers(0, 6, n).astype(np.int64),
        "ts": rng.permutation(n).astype(np.int64),
        "tb": np.arange(n, dtype=np.int64),
        "v": np.round(rng.normal(50, 10, n), 2)})
    got = (lag_autocorr(rd.from_pandas(df), "k", "ts", "v", "tb",
                        num_buckets=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    rows = []
    for k, g in df.sort_values(["ts", "tb"]).groupby("k"):
        v = np.floor(g["v"].to_numpy() * 100 + 0.5).astype(np.int64)
        x, y = v[:-1], v[1:]
        nn = len(x)
        dx = nn * (x * x).sum() - x.sum() ** 2
        dy = nn * (y * y).sum() - y.sum() ** 2
        if dx <= 0 or dy <= 0:
            continue
        r = (nn * (x * y).sum() - x.sum() * y.sum()) / (
            np.sqrt(float(dx)) * np.sqrt(float(dy)))
        rows.append((k, nn, round(r, 6)))
    want = pd.DataFrame(rows, columns=["k", "n_pairs", "autocorr"])
    assert got["k"].tolist() == want["k"].tolist()
    assert got["n_pairs"].tolist() == want["n_pairs"].tolist()
    assert got["autocorr"].tolist() == want["autocorr"].tolist()


def test_lag_autocorr_lag2_and_degenerate():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from city2graph_ray.ops.stats import lag_autocorr

    # key 0: constant (zero variance -> dropped); key 1: 5-pt series
    df = pd.DataFrame({
        "k": np.array([0, 0, 0, 1, 1, 1, 1, 1], np.int64),
        "ts": np.arange(8, dtype=np.int64),
        "tb": np.arange(8, dtype=np.int64),
        "v": [5.0, 5.0, 5.0, 1.0, 3.0, 2.0, 5.0, 4.0]})
    out = (lag_autocorr(rd.from_pandas(df), "k", "ts", "v", "tb",
                        lag=2, num_buckets=2).to_pandas())
    assert out["k"].tolist() == [1]
    assert out["n_pairs"].tolist() == [3]


def test_contingency_chi2_vs_scipy_free_brute():
    from city2graph_ray.ops.stats import contingency_chi2
    rng = np.random.default_rng(7)
    df = pd.DataFrame({"r": rng.integers(0, 4, 500),
                       "c": rng.integers(0, 6, 500)})
    out = (contingency_chi2(rd.from_pandas(df).repartition(7), "r", "c")
           .to_pandas())
    # brute-force expected counts
    piv = df.groupby(["r", "c"]).size()
    n = len(df)
    chi2 = 0.0
    for (r, c), o in piv.items():
        rt = (df["r"] == r).sum()
        ct = (df["c"] == c).sum()
        e = rt * ct / n
        chi2 += (o - e) ** 2 / e
    assert len(out) == len(piv)
    assert out["n_total"].iloc[0] == n
    assert abs(out["chi2_term"].sum() - chi2) < 1e-3
    # marginals are exact ints
    row = out[out["row_cat"] == 0]["row_tot"].iloc[0]
    assert row == (df["r"] == 0).sum()


def test_contingency_chi2_empty_and_single_cell():
    from city2graph_ray.ops.stats import contingency_chi2
    empty = pd.DataFrame({"r": pd.Series([], dtype=np.int64),
                          "c": pd.Series([], dtype=np.int64)})
    out = contingency_chi2(rd.from_pandas(empty), "r", "c").to_pandas()
    assert len(out) == 0
    one = pd.DataFrame({"r": [3, 3, 3], "c": [5, 5, 5]})
    out1 = contingency_chi2(rd.from_pandas(one), "r", "c").to_pandas()
    # one cell: O == E exactly, term is 0
    assert len(out1) == 1 and out1["chi2_term"].iloc[0] == 0.0
    assert out1["n_obs"].iloc[0] == 3 and out1["n_total"].iloc[0] == 3


def test_gravity_model_brute_and_degenerate():
    from city2graph_ray.ops.mobility import gravity_model
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"zone": rng.integers(0, 5, 200),
                       "qx": rng.integers(0, 1000, 200),
                       "qy": rng.integers(0, 1000, 200)})
    out = (gravity_model(rd.from_pandas(df).repartition(5))
           .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True))
    g = df.groupby("zone").agg(n=("zone", "size"), sx=("qx", "sum"),
                               sy=("qy", "sum"))
    cx, cy = g["sx"] // g["n"], g["sy"] // g["n"]
    rows = []
    zs = sorted(g.index)
    for a in range(len(zs)):
        for b in range(a + 1, len(zs)):
            i, j = zs[a], zs[b]
            d2 = (cx[i] - cx[j]) ** 2 + (cy[i] - cy[j]) ** 2
            if d2 > 0:
                rows.append((i, j, g["n"][i], g["n"][j], d2,
                             round(g["n"][i] * g["n"][j] / d2, 6)))
    exp = pd.DataFrame(rows, columns=["src", "dst", "n_src", "n_dst",
                                      "d2", "gravity"])
    pd.testing.assert_frame_equal(out.astype({"gravity": float}),
                                  exp.astype(out.dtypes.to_dict()))
    # degenerate: single zone -> empty with the right columns
    one = gravity_model(rd.from_pandas(
        pd.DataFrame({"zone": [1, 1], "qx": [5, 7], "qy": [2, 4]})))
    odf = one.to_pandas()
    assert len(odf) == 0


def test_radiation_model_brute_and_degenerate():
    from city2graph_ray.ops.mobility import radiation_model
    rng = np.random.default_rng(11)
    df = pd.DataFrame({"zone": rng.integers(0, 6, 300),
                       "qx": rng.integers(0, 2000, 300),
                       "qy": rng.integers(0, 2000, 300)})
    out = (radiation_model(rd.from_pandas(df).repartition(4))
           .to_pandas().set_index(["src", "dst"]))
    g = df.groupby("zone").agg(n=("zone", "size"), sx=("qx", "sum"),
                               sy=("qy", "sum"))
    cx, cy = g["sx"] // g["n"], g["sy"] // g["n"]
    zs = sorted(g.index)
    cnt = 0
    for i in zs:
        for j in zs:
            if i == j:
                continue
            d2 = (cx[i] - cx[j]) ** 2 + (cy[i] - cy[j]) ** 2
            if d2 == 0:
                continue
            s = sum(g["n"][k] for k in zs if k not in (i, j)
                    and (cx[i] - cx[k]) ** 2 + (cy[i] - cy[k]) ** 2 < d2)
            row = out.loc[(i, j)]
            assert row["s_ij"] == s and row["d2"] == d2
            exp = round(g["n"][i] * g["n"][j]
                        / ((g["n"][i] + s) * (g["n"][i] + g["n"][j] + s)), 6)
            assert row["radiation"] == exp
            cnt += 1
    assert len(out) == cnt
    # degenerate: all zones coincident -> every pair dropped
    co = pd.DataFrame({"zone": [0, 1, 2], "qx": [5, 5, 5], "qy": [9, 9, 9]})
    assert len(radiation_model(rd.from_pandas(co)).to_pandas()) == 0


def test_knn_outlier_scores_brute_and_tiny():
    from city2graph_ray.ops.spatial import knn_outlier_scores
    rng = np.random.default_rng(5)
    pts = pd.DataFrame({"id": np.arange(120, dtype=np.int64),
                        "x": rng.uniform(0, 100, 120),
                        "y": rng.uniform(0, 100, 120)})
    # plant two outliers far away
    pts.loc[0, ["x", "y"]] = [900.0, 900.0]
    pts.loc[1, ["x", "y"]] = [-800.0, 500.0]
    out = knn_outlier_scores(rd.from_pandas(pts).repartition(3),
                             k=3, top_n=10).to_pandas()
    xy = pts[["x", "y"]].to_numpy()
    d = np.sqrt(((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1))
    np.fill_diagonal(d, np.inf)
    kth = np.sort(d, axis=1)[:, 2]
    qk = np.floor(kth * 100 + 0.5).astype(np.int64)
    order = np.lexsort((pts["id"].to_numpy(), -qk))[:10]
    assert list(out["id"]) == list(pts["id"].to_numpy()[order])
    assert (out["qdist"].to_numpy() == qk[order]).all()
    assert (out["n_nbrs"] == 3).all()
    # tiny input: n-1 < k -> fewer neighbours, still scores
    tiny = pd.DataFrame({"id": [1, 2], "x": [0.0, 3.0], "y": [0.0, 4.0]})
    t = knn_outlier_scores(rd.from_pandas(tiny), k=5, top_n=5).to_pandas()
    assert len(t) == 2 and (t["qdist"] == 500).all() and (t["n_nbrs"] == 1).all()


def test_association_rules_brute_and_edges():
    from city2graph_ray.ops.baskets import association_rules
    df = pd.DataFrame({
        "basket": [1, 1, 1, 2, 2, 3, 3, 3, 3, 4, 4],
        "item":   [10, 20, 30, 10, 20, 10, 20, 30, 30, 40, 40]})
    out = (association_rules(rd.from_pandas(df).repartition(3),
                             "basket", "item", min_support=2)
           .to_pandas().set_index(["item_a", "item_b"]))
    # baskets: {10,20,30},{10,20},{10,20,30},{40}; dup items collapse
    assert set(out.index) == {(10, 20), (10, 30), (20, 30)}
    r = out.loc[(10, 20)]
    assert r["supp_ab"] == 3 and r["supp_a"] == 3 and r["supp_b"] == 3
    assert r["n_baskets"] == 4
    assert r["conf_ab"] == 1.0 and r["lift"] == round(4 * 3 / 9, 6)
    r2 = out.loc[(10, 30)]
    assert r2["supp_ab"] == 2 and r2["supp_b"] == 2
    assert r2["conf_ab"] == round(2 / 3, 6) and r2["conf_ba"] == 1.0
    # min_support filters everything -> empty with full schema
    none = association_rules(rd.from_pandas(df), "basket", "item",
                             min_support=99).to_pandas()
    assert len(none) == 0
    # single-item baskets only -> no pairs
    solo = pd.DataFrame({"basket": [1, 2], "item": [5, 6]})
    assert len(association_rules(rd.from_pandas(solo), "basket",
                                 "item").to_pandas()) == 0


def test_cohort_retention_brute_and_empty():
    from city2graph_ray.ops.windows import cohort_retention
    base = pd.Timestamp("2024-01-01")
    rows = [(1, 0), (1, 1), (1, 3), (2, 0), (2, 1), (3, 1), (3, 2),
            (3, 1)]  # (user, day); user 3 starts day 1; dup collapses
    df = pd.DataFrame({
        "user_id": [u for u, _ in rows],
        "ts": [base + pd.Timedelta(days=d, hours=5) for _, d in rows]})
    out = (cohort_retention(rd.from_pandas(df).repartition(3),
                            "user_id", "ts", period_s=86400)
           .to_pandas().set_index(["cohort", "offset"]))
    d0 = 19723  # 2024-01-01 epoch days
    assert out.loc[(d0, 0)]["n_active"] == 2      # users 1,2 day0
    assert out.loc[(d0, 0)]["n_cohort"] == 2
    assert out.loc[(d0, 1)]["n_active"] == 2      # users 1,2 day1
    assert out.loc[(d0, 1)]["rate"] == 1.0
    assert out.loc[(d0, 3)]["n_active"] == 1      # user 1 day3
    assert out.loc[(d0, 3)]["rate"] == 0.5
    assert out.loc[(d0 + 1, 0)]["n_active"] == 1  # user 3 cohort day1
    assert out.loc[(d0 + 1, 1)]["n_active"] == 1
    assert len(out) == 5
    empty = pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                          "ts": pd.Series([], dtype="datetime64[us]")})
    assert len(cohort_retention(rd.from_pandas(empty), "user_id",
                                "ts").to_pandas()) == 0


def test_hhi_concentration_brute_and_edges():
    from city2graph_ray.ops.stats import hhi_concentration
    df = pd.DataFrame({
        "market": [1, 1, 1, 2, 2, 3],
        "firm":   [10, 20, 10, 10, 30, 40],
        "value":  [2.0, 2.0, 2.0, 1.0, 3.0, 0.0]})
    out = (hhi_concentration(rd.from_pandas(df).repartition(3),
                             "market", "firm", "value")
           .to_pandas().set_index("market"))
    # market 1: firm10=400c, firm20=200c -> (400^2+200^2)/600^2
    assert out.loc[1]["hhi"] == round((400**2 + 200**2) / 600**2, 6)
    assert out.loc[1]["n_firms"] == 2 and out.loc[1]["total_q"] == 600
    # market 2: shares 1/4, 3/4
    assert out.loc[2]["hhi"] == round((100**2 + 300**2) / 400**2, 6)
    # market 3: zero total -> excluded
    assert 3 not in out.index
    # monopoly -> HHI exactly 1
    mono = pd.DataFrame({"market": [9], "firm": [1], "value": [5.0]})
    m = hhi_concentration(rd.from_pandas(mono), "market", "firm",
                          "value").to_pandas()
    assert m["hhi"].iloc[0] == 1.0
    empty = df.iloc[:0]
    assert len(hhi_concentration(rd.from_pandas(empty), "market",
                                 "firm", "value").to_pandas()) == 0


def test_rfm_segments_sf0001_invariants():
    from city2graph_ray.pipelines.relational import rfm_segments
    out = rfm_segments("/root/testdata/sf0.001", k=4).to_pandas()
    assert len(out) == out["cust"].nunique()
    for c in ("r_tile", "f_tile", "m_tile"):
        assert out[c].between(1, 4).all()
        # SQL ntile: tile sizes differ by at most one
        sizes = out[c].value_counts()
        assert sizes.max() - sizes.min() <= 1
    assert (out["rfm"] == 100 * out["r_tile"] + 10 * out["f_tile"]
            + out["m_tile"]).all()
    # the most recent customer (ties on cust) is in r_tile 1
    top = out.sort_values(["last_us", "cust"],
                          ascending=[False, True]).iloc[0]
    assert top["r_tile"] == 1


def test_lorenz_deciles_brute_and_empty():
    from city2graph_ray.ops.stats import lorenz_deciles
    rng = np.random.default_rng(9)
    df = pd.DataFrame({"id": np.arange(57, dtype=np.int64),
                       "v": rng.uniform(0, 500, 57)})
    out = (lorenz_deciles(rd.from_pandas(df).repartition(4), "v", "id",
                          k=4).to_pandas())
    q = np.floor(df["v"].to_numpy() * 100 + 0.5).astype(np.int64)
    order = np.lexsort((df["id"].to_numpy(), q))
    qs = q[order]
    # ntile(4) over 57 rows: first 57%4=1 tile gets 15, rest 14
    sizes = [15, 14, 14, 14]
    exp_cum, pos = [], 0
    for s in sizes:
        exp_cum.append(qs[pos:pos + s].sum())
        pos += s
    exp_cum = np.cumsum(exp_cum)
    assert list(out["n"]) == sizes
    assert (out["cum_q"].to_numpy() == exp_cum).all()
    assert out["cum_share"].iloc[-1] == 1.0
    assert (out["cum_share"].diff().dropna() >= 0).all()
    empty = df.iloc[:0]
    assert len(lorenz_deciles(rd.from_pandas(empty), "v",
                              "id").to_pandas()) == 0


def test_knox_test_brute_and_boundaries():
    from city2graph_ray.ops.spatial import knox_test
    rng = np.random.default_rng(21)
    n = 80
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "x": rng.uniform(0, 50, n),
                       "y": rng.uniform(0, 50, n),
                       "t": rng.integers(0, 1000, n)})
    # force an exact dt == tau boundary pair
    df.loc[0, "t"] = 100
    df.loc[1, "t"] = 100 + 37
    out = knox_test(rd.from_pandas(df).repartition(4), radius=10.0,
                    tau=37).to_pandas().iloc[0]
    xy = df[["x", "y"]].to_numpy()
    d = np.sqrt(((xy[:, None] - xy[None]) ** 2).sum(-1))
    t = df["t"].to_numpy(np.int64)
    dt = np.abs(t[:, None] - t[None])
    iu = np.triu_indices(n, 1)
    sp = d[iu] <= 10.0
    tp = dt[iu] <= 37
    assert out["total_pairs"] == n * (n - 1) // 2
    assert out["s_pairs"] == sp.sum()
    assert out["t_pairs"] == tp.sum()
    assert out["st_pairs"] == (sp & tp).sum()
    exp = round(sp.sum() * tp.sum() / (n * (n - 1) // 2), 6)
    assert out["expected_st"] == exp
    # degenerate: single point -> empty result
    single = df.iloc[:1]
    assert len(knox_test(rd.from_pandas(single), 10.0, 37)
               .to_pandas()) == 0


def test_areal_interpolation_brute_and_edges():
    from city2graph_ray.ops.spatial import areal_interpolation
    # rect straddling cell borders + rect inside one cell + rect
    # exactly on a boundary
    df = pd.DataFrame({
        "id": [1, 2, 3],
        "x0": [6, 1, 8], "y0": [6, 1, 0],
        "w": [4, 2, 8], "h": [4, 2, 8],
        "value": [1000, 77, 64]})
    out = (areal_interpolation(rd.from_pandas(df).repartition(2),
                               cell=8).to_pandas()
           .sort_values(["src", "gx", "gy"]).reset_index(drop=True))
    r1 = out[out["src"] == 1]
    # rect 1 spans x 6..9, y 6..9 over 8-cells -> 4 pieces 2x2,2x2...
    assert len(r1) == 4
    assert sorted(r1["overlap_area"]) == [4, 4, 4, 4]
    assert (r1["src_area"] == 16).all()
    assert (r1["alloc"] == 250.0).all()
    assert r1["alloc"].sum() == 1000.0
    r2 = out[out["src"] == 2]
    assert len(r2) == 1 and r2["overlap_area"].iloc[0] == 4
    assert r2["alloc"].iloc[0] == 77.0
    r3 = out[out["src"] == 3]  # aligned exactly to cell 1 in x
    assert len(r3) == 1 and (r3["gx"] == 1).all()
    assert r3["overlap_area"].iloc[0] == 64
    # mass conservation over a random batch
    rng = np.random.default_rng(2)
    big = pd.DataFrame({
        "id": np.arange(50, dtype=np.int64),
        "x0": rng.integers(0, 200, 50), "y0": rng.integers(0, 200, 50),
        "w": rng.integers(1, 20, 50), "h": rng.integers(1, 20, 50),
        "value": rng.integers(1, 10**6, 50)})
    o = areal_interpolation(rd.from_pandas(big), cell=16).to_pandas()
    per_src = o.groupby("src").agg(a=("overlap_area", "sum"),
                                   s=("src_area", "first"))
    assert (per_src["a"] == per_src["s"]).all()


def test_last_touch_attribution_brute():
    from city2graph_ray.pipelines.relational import (
        last_touch_attribution)
    base = pd.Timestamp("2024-03-01")
    rows = [
        # user 1: view@0, click@5, purchase@6 (-> click), purchase@2
        # (-> view)
        (1, 1, "view", 0, 0.0), (2, 1, "click", 5, 0.0),
        (3, 1, "purchase", 6, 10.0), (4, 1, "purchase", 2, 20.0),
        # user 2: purchase with no prior touch -> none; later touch
        # at the SAME ts as a purchase -> attributed (exact match)
        (5, 2, "purchase", 1, 5.0), (6, 2, "view", 3, 0.0),
        (7, 2, "purchase", 3, 7.0),
        # user 2: two touches at the same ts -> larger event_id wins
        (8, 2, "click", 4, 0.0), (9, 2, "signup", 4, 0.0),
        (10, 2, "purchase", 4, 1.0),
    ]
    df = pd.DataFrame({
        "event_id": [r[0] for r in rows],
        "user_id": [r[1] for r in rows],
        "event_type": [r[2] for r in rows],
        "ts": [base + pd.Timedelta(seconds=r[3]) for r in rows],
        "value": [r[4] for r in rows]})
    out = (last_touch_attribution(rd.from_pandas(df).repartition(3))
           .to_pandas().set_index("touch_type"))
    assert out.loc["click"]["total_cents"] == 1000
    assert out.loc["view"]["total_cents"] == 2000 + 700
    assert out.loc["none"]["total_cents"] == 500
    assert out.loc["signup"]["total_cents"] == 100  # id 9 > id 8
    assert out["n_conversions"].sum() == 5


def test_km_risk_table_brute_and_empty():
    from city2graph_ray.ops.windows import km_risk_table
    # durations: 2,2,3,5(cens),5,7(cens)
    df = pd.DataFrame({"duration": [2, 2, 3, 5, 5, 7],
                       "event":    [1, 1, 1, 0, 1, 0]})
    out = (km_risk_table(rd.from_pandas(df).repartition(3),
                         "duration", "event").to_pandas()
           .set_index("duration"))
    assert list(out.index) == [2, 3, 5, 7]
    assert list(out["n_risk"]) == [6, 4, 3, 1]
    assert list(out["d_events"]) == [2, 1, 1, 0]
    assert list(out["n_censored"]) == [0, 0, 1, 1]
    assert out.loc[2]["km_factor"] == round(1 - 2 / 6, 6)
    assert out.loc[5]["km_factor"] == round(1 - 1 / 3, 6)
    assert out.loc[7]["km_factor"] == 1.0
    empty = df.iloc[:0]
    assert len(km_risk_table(rd.from_pandas(empty), "duration",
                             "event").to_pandas()) == 0


def test_rank_auc_vs_brute_with_ties():
    from city2graph_ray.ops.stats import rank_auc
    rng = np.random.default_rng(31)
    # heavy ties: scores on a small lattice
    df = pd.DataFrame({"label": rng.integers(0, 2, 400),
                       "score": rng.integers(0, 20, 400) / 4.0})
    out = rank_auc(rd.from_pandas(df).repartition(5), "label",
                   "score").to_pandas().iloc[0]
    # brute AUC with tie-average ranks (scipy-free)
    q = np.floor(df["score"].to_numpy() * 100 + 0.5).astype(np.int64)
    lab = df["label"].to_numpy()
    order = np.argsort(q, kind="stable")
    ranks = np.empty(len(q), np.float64)
    sq = q[order]
    i = 0
    while i < len(sq):
        j = i
        while j < len(sq) and sq[j] == sq[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    n1 = int(lab.sum()); n0 = len(lab) - n1
    u = ranks[lab == 1].sum() - n1 * (n1 + 1) / 2
    assert out["n_pos"] == n1 and out["n_neg"] == n0
    assert out["u_x2"] == int(round(2 * u))
    assert out["auc"] == round(u / (n1 * n0), 6)
    # perfect separation -> AUC 1; single-class -> empty
    sep = pd.DataFrame({"label": [0, 0, 1, 1],
                        "score": [1.0, 2.0, 3.0, 4.0]})
    assert rank_auc(rd.from_pandas(sep), "label",
                    "score").to_pandas()["auc"].iloc[0] == 1.0
    one = pd.DataFrame({"label": [1, 1], "score": [1.0, 2.0]})
    assert len(rank_auc(rd.from_pandas(one), "label",
                        "score").to_pandas()) == 0


def test_mann_kendall_bruteforce():
    import ray.data as rd

    from city2graph_ray.ops.stats import mann_kendall
    rng = np.random.default_rng(5)
    n = 300
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 9, n),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "v": np.round(rng.normal(5, 2, n), 2)})
    out = (mann_kendall(rd.from_pandas(df).repartition(6), "k", "ts",
                        "id", "v", num_buckets=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    for k, g in df.groupby("k"):
        g = g.sort_values(["ts", "id"])
        u = np.floor(g["v"].to_numpy() * 100 + 0.5).astype(np.int64)
        s = sum(int(np.sign(u[j] - u[i]))
                for i in range(len(u)) for j in range(i + 1, len(u)))
        nn = len(u)
        _, cnt = np.unique(u, return_counts=True)
        tie = int((cnt * (cnt - 1) * (2 * cnt + 5)).sum())
        row = out[out["k"] == k].iloc[0]
        assert int(row["n"]) == nn
        assert int(row["s_stat"]) == s
        assert int(row["var_num"]) == nn*(nn-1)*(2*nn+5) - tie


def test_mann_kendall_single_event_key():
    import ray.data as rd

    from city2graph_ray.ops.stats import mann_kendall
    df = pd.DataFrame({"id": [1], "k": [3],
                       "ts": pd.to_datetime(["2024-01-01"]),
                       "v": [1.5]})
    out = mann_kendall(rd.from_pandas(df), "k", "ts", "id",
                       "v").to_pandas()
    assert len(out) == 1
    assert int(out["s_stat"].iloc[0]) == 0
    assert int(out["var_num"].iloc[0]) == 0


def test_group_entropy_bruteforce():
    import ray.data as rd

    from city2graph_ray.ops.stats import group_entropy
    rng = np.random.default_rng(29)
    df = pd.DataFrame({"k": rng.integers(0, 5, 200),
                       "c": rng.choice(list("abcd"), 200)})
    out = (group_entropy(rd.from_pandas(df).repartition(4), "k", "c",
                         num_buckets=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    for k, g in df.groupby("k"):
        vc = g["c"].value_counts()
        p = vc.to_numpy() / len(g)
        want = round(float(-(p * np.log(p)).sum()), 6)
        row = out[out["k"] == k].iloc[0]
        assert int(row["n"]) == len(g)
        assert int(row["n_cats"]) == len(vc)
        assert abs(row["entropy"] - want) <= 2e-6


def test_ipf_balance_converges_to_margins():
    import ray.data as rd

    from city2graph_ray.ops.mobility import ipf_balance
    rng = np.random.default_rng(37)
    rows = []
    for o in range(6):
        for d in range(5):
            rows.append((o, d, int(rng.integers(1, 50))))
    df = pd.DataFrame(rows, columns=["o", "d", "flow"])
    out = (ipf_balance(rd.from_pandas(df).repartition(3), 100.0,
                       120.0, rounds=6, num_buckets=4)
           .to_pandas())
    col_sums = out.groupby("d")["flow"].sum()
    # after the final column scaling, column margins hit the target
    assert np.allclose(col_sums.to_numpy(), 120.0, atol=1e-3)
    # row margins approach the row target as rounds increase
    row_sums = out.groupby("o")["flow"].sum()
    assert np.allclose(row_sums.to_numpy(), 100.0, rtol=0.2)


def test_psi_drift_detects_shift_and_null_case():
    import ray.data as rd

    from city2graph_ray.ops.stats import psi_drift
    rng = np.random.default_rng(67)
    same = pd.DataFrame({
        "v": np.concatenate([rng.normal(50, 5, 4000),
                             rng.normal(50, 5, 4000)]),
        "half": np.concatenate([np.zeros(4000, np.int64),
                                np.ones(4000, np.int64)])})
    shifted = pd.DataFrame({
        "v": np.concatenate([rng.normal(50, 5, 4000),
                             rng.normal(70, 5, 4000)]),
        "half": np.concatenate([np.zeros(4000, np.int64),
                                np.ones(4000, np.int64)])})
    p0 = psi_drift(rd.from_pandas(same).repartition(4), "v", "half")
    p1 = psi_drift(rd.from_pandas(shifted).repartition(4), "v",
                   "half")
    assert p0["psi"].iloc[0] < 0.1      # textbook "no drift" band
    assert p1["psi"].iloc[0] > 0.25     # textbook "action" threshold
    assert (p0["n_ref"].sum(), p0["n_cur"].sum()) == (4000, 4000)
