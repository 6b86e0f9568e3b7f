"""kmeans_quantized vs a straight-line local integer reference."""

import numpy as np
import pandas as pd
import ray.data as rd

from city2graph_ray.vector.kmeans import kmeans_quantized


def local_ref(vecs, ids, k, iters, scale=10_000.0, offset=100_000):
    q = (np.floor(np.asarray(vecs, np.float64) * scale + 0.5)
         .astype(np.int64) + offset)
    seed_rows = np.argsort(ids)[:k]
    cents = q[seed_rows]
    labels = np.arange(k)
    for _ in range(iters):
        d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        row = np.argmin(d, axis=1)
        cid = labels[row]
        new, nl = [], []
        for c in sorted(set(cid.tolist())):
            sel = q[cid == c]
            s = sel.sum(axis=0)
            n = len(sel)
            new.append((2 * s + n) // (2 * n))
            nl.append(c)
        cents = np.stack(new)
        labels = np.asarray(nl)
    d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    row = np.argmin(d, axis=1)
    return {int(i): (int(labels[r]), int(d[j, r]))
            for j, (i, r) in enumerate(zip(ids, row))}


def test_kmeans_matches_local_reference():
    rng = np.random.default_rng(5)
    n, dim, k = 200, 8, 3
    centers = rng.normal(0, 1, (k, dim))
    vecs = (centers[rng.integers(0, k, n)]
            + rng.normal(0, 0.3, (n, dim))).astype(np.float32)
    ids = rng.permutation(n).astype(np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    out = kmeans_quantized(rd.from_pandas(df).repartition(6), k=k,
                           num_iters=3, num_buckets=8).to_pandas()
    want = local_ref(vecs, ids, k, 3)
    got = {int(r.vec_id): (int(r.cid), int(r.dist))
           for r in out.itertuples()}
    assert got == want
    # clusters should be non-trivial
    assert len(set(c for c, _ in got.values())) == k


def test_kmeans_duplicate_points_and_k1():
    vecs = np.tile(np.float32([0.1, -0.2]), (10, 1))
    df = pd.DataFrame({"vec_id": np.arange(10, dtype=np.int64),
                       "embedding": list(vecs)})
    out = kmeans_quantized(rd.from_pandas(df), k=1,
                           num_iters=2).to_pandas()
    assert set(out["cid"]) == {0} and set(out["dist"]) == {0}


def test_silhouette_matches_local_reference():
    from city2graph_ray.vector.kmeans import kmeans_silhouette
    rng = np.random.default_rng(7)
    n, dim, k = 150, 6, 3
    centers = rng.normal(0, 1, (k, dim))
    vecs = (centers[rng.integers(0, k, n)]
            + rng.normal(0, 0.2, (n, dim))).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    out = (kmeans_silhouette(rd.from_pandas(df).repartition(5), k=k,
                             num_iters=2, num_buckets=8)
           .to_pandas().set_index("vec_id").sort_index())

    # straight-line reference: quantize, assign via local_ref's rules,
    # then O(n^2) pairwise squared distances
    assigns = local_ref(vecs, ids, k, 2)
    q = (np.floor(np.asarray(vecs, np.float64) * 10_000 + 0.5)
         .astype(np.int64) + 100_000)
    cid = np.array([assigns[i][0] for i in ids])
    d2 = ((q[:, None, :] - q[None, :, :]) ** 2).sum(axis=2)
    for i in ids:
        own = cid == cid[i]
        a = d2[i][own].sum() / (own.sum() - 1) if own.sum() > 1 else None
        bs = [d2[i][cid == c].sum() / (cid == c).sum()
              for c in sorted(set(cid)) if c != cid[i]]
        b = min(bs) if bs else None
        r = out.loc[i]
        assert int(r["cid"]) == cid[i]
        if a is None or b is None:
            assert r["sil"] == 0.0
        else:
            assert r["a"] == a and r["b"] == b
            assert r["sil"] == (b - a) / max(a, b)


def test_silhouette_singleton_cluster():
    from city2graph_ray.vector.kmeans import kmeans_silhouette
    # one far outlier becomes its own cluster -> a NaN, sil 0
    vecs = np.float32([[0.0, 0.0], [0.01, 0.0], [0.0, 0.01],
                       [5.0, 5.0]]) * 0.05
    df = pd.DataFrame({"vec_id": np.arange(4, dtype=np.int64),
                       "embedding": list(vecs)})
    out = (kmeans_silhouette(rd.from_pandas(df), k=2, num_iters=2)
           .to_pandas().set_index("vec_id"))
    lone = out[out["a"].isna()]
    assert len(lone) == 1 and lone["sil"].iloc[0] == 0.0


def test_pq_codes_match_per_subvector_kmeans():
    from city2graph_ray.vector.kmeans import pq_codes, kmeans_quantized
    rng = np.random.default_rng(21)
    n, dim, m, k = 120, 16, 4, 3
    vecs = rng.normal(0, 0.4, (n, dim)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    out = (pq_codes(rd.from_pandas(df).repartition(4), m=m, k=k,
                    num_iters=2, num_buckets=4)
           .to_pandas().set_index("vec_id").sort_index())
    sub = dim // m
    total = np.zeros(n, np.int64)
    for j in range(m):
        sdf = pd.DataFrame({"vec_id": ids,
                            "embedding": list(vecs[:, j*sub:(j+1)*sub])})
        ref = (kmeans_quantized(rd.from_pandas(sdf), k=k, num_iters=2)
               .to_pandas().set_index("vec_id").sort_index())
        assert (out[f"c{j}"].to_numpy() == ref["cid"].to_numpy()).all(), j
        total += ref["dist"].to_numpy(np.int64)
    assert (out["dist"].to_numpy(np.int64) == total).all()


def test_pq_codes_bad_m():
    from city2graph_ray.vector.kmeans import pq_codes
    df = pd.DataFrame({"vec_id": [1], "embedding": [np.float32([1, 2, 3])]})
    import pytest as _pt
    with _pt.raises(ValueError):
        pq_codes(rd.from_pandas(df), m=2).to_pandas()


def test_hard_negatives_bruteforce():
    from city2graph_ray.vector.kmeans import hard_negatives
    rng = np.random.default_rng(33)
    n, dim, k = 90, 6, 3
    centers = rng.normal(0, 1, (k, dim))
    vecs = (centers[rng.integers(0, k, n)]
            + rng.normal(0, 0.25, (n, dim))).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    out = (hard_negatives(rd.from_pandas(df).repartition(4), k=k,
                          num_iters=2).to_pandas()
           .set_index("vec_id").sort_index())
    assigns = local_ref(vecs, ids, k, 2)
    q = (np.floor(np.asarray(vecs, np.float64) * 10_000 + 0.5)
         .astype(np.int64) + 100_000)
    cid = np.array([assigns[i][0] for i in ids])
    d2 = ((q[:, None, :] - q[None, :, :]) ** 2).sum(axis=2)
    for i in ids:
        dd = d2[i].copy()
        dd[cid == cid[i]] = np.iinfo(np.int64).max
        j = int(np.argmin(dd))  # ids ascending -> min-id tie-break
        r = out.loc[i]
        assert int(r["cid"]) == cid[i]
        assert int(r["neg_id"]) == j and int(r["neg_dist"]) == dd[j]
        assert int(r["neg_cid"]) == cid[j]


def test_hard_negatives_single_cluster():
    from city2graph_ray.vector.kmeans import hard_negatives
    vecs = np.tile(np.float32([0.1, 0.2]), (6, 1))
    df = pd.DataFrame({"vec_id": np.arange(6, dtype=np.int64),
                       "embedding": list(vecs)})
    out = hard_negatives(rd.from_pandas(df), k=2, num_iters=1)
    assert out.count() == 0


def test_sq8_codes_range_and_extremes(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from city2graph_ray.vector.kmeans import sq8_codes
    rng = np.random.RandomState(7)
    vecs = rng.uniform(-1, 1, size=(40, 8))
    vecs[:, 3] = 0.25           # constant dim → code 0 everywhere
    vecs[0] = vecs.min(axis=0)  # holds per-dim minima → all codes 0
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(40), "embedding": list(vecs)}))
    out = sq8_codes(ds).to_pandas().sort_values("vec_id")
    assert (out["code_min"] >= 0).all() and (out["code_max"] <= 255).all()
    row0 = out.iloc[0]
    assert row0["code_sum"] == 0 and row0["code_max"] == 0
    # per-dim max vector codes to 255 on every non-constant dim
    q = np.floor(vecs * 10_000.0 + 0.5).astype(np.int64) + 100_000
    mn, mx = q.min(axis=0), q.max(axis=0)
    rng_ = mx - mn
    code = np.where(rng_ > 0, (q - mn) * 255 // np.where(rng_ > 0, rng_, 1), 0)
    exp_err = np.abs(q * 255 - (mn * 255 + code * rng_)).sum(axis=1)
    got = out.set_index("vec_id")
    assert (got["err255"].to_numpy() ==
            exp_err[got.index.to_numpy()]).all()
    # quantization step bound: residual per dim < rng (×255 scale)
    assert (got["err255"].to_numpy() < rng_.sum()).all()


def test_kcenter_matches_bruteforce_greedy(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from city2graph_ray.vector.kmeans import kcenter_select
    rng = np.random.RandomState(3)
    vecs = rng.uniform(-1, 1, size=(60, 6))
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(100, 160), "embedding": list(vecs)}))
    out = kcenter_select(ds, k=5).to_pandas().sort_values("sel_rank")

    # brute-force greedy on the same integer quantization
    q = np.floor(vecs * 10_000.0 + 0.5).astype(np.int64) + 100_000
    ids = np.arange(100, 160)
    sel = [0]  # min id = 100 at index 0
    dists = [0]
    md = ((q - q[0]) ** 2).sum(axis=1)
    for _ in range(4):
        best = np.lexsort((ids, -md))[0]
        sel.append(best)
        dists.append(int(md[best]))
        md = np.minimum(md, ((q - q[best]) ** 2).sum(axis=1))
    assert out["vec_id"].tolist() == ids[sel].tolist()
    assert out["dist"].tolist() == dists
    # greedy k-center invariant: selection distances are non-increasing
    d = out["dist"].to_numpy()[1:]
    assert (d[:-1] >= d[1:]).all()


def test_mmr_select_vs_brute(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from city2graph_ray.vector.kmeans import mmr_select
    rng = np.random.default_rng(8)
    n, d, k = 60, 6, 4
    X = rng.normal(size=(n, d)).astype(np.float32)
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64), "embedding": list(X)}))
    got = mmr_select(ds, k=k).to_pandas()

    q = np.floor(X.astype(np.float64) * 10_000 + 0.5).astype(np.int64) \
        + 100_000
    qv = q[0]  # min id is the query
    d2q = ((q - qv) ** 2).sum(1)
    # pick 1: most relevant, excluding query
    cands = np.arange(1, n)
    first = cands[np.lexsort((cands, d2q[1:]))[0]]
    sel, scores = [first], [-int(d2q[first])]
    for _ in range(k - 1):
        best = None
        for x in range(1, n):
            if x in sel:
                continue
            m = min(int(((q[x] - q[s]) ** 2).sum()) for s in sel) \
                - int(d2q[x])
            if best is None or m > best[0] or (m == best[0]
                                               and x < best[1]):
                best = (m, x)
        sel.append(best[1])
        scores.append(best[0])
    assert got["vec_id"].tolist() == sel
    assert got["mmr2"].tolist() == scores
