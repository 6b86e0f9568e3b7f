"""Distributed embedding covariance / PCA vs numpy."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from city2graph_ray.vector.stats import (embedding_covariance,
                                         pca_components, pca_project)


def _corpus(n: int = 300, d: int = 8, seed: int = 3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    # anisotropic: two dominant directions so PCA is well-separated
    basis = rng.normal(size=(d, d))
    scales = np.array([10.0, 5.0] + [0.5] * (d - 2))
    X = rng.normal(size=(n, d)) * scales @ basis.T + rng.normal(size=d)
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                         "embedding": list(X.astype(np.float32))})


def test_covariance_matches_numpy():
    df = _corpus()
    ds = ray.data.from_pandas(df).repartition(7)
    got = embedding_covariance(ds, round_to=None, num_buckets=4)
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    want = np.cov(X, rowvar=False, ddof=0)
    d = X.shape[1]
    G = got.sort_values(["i", "j"])["cov"].to_numpy().reshape(d, d)
    assert np.allclose(G, want, atol=1e-8)


def test_covariance_reshard_deterministic():
    df = _corpus(n=200)
    outs = []
    for parts in (1, 11):
        ds = ray.data.from_pandas(df).repartition(parts)
        out = embedding_covariance(ds, round_to=6, num_buckets=4)
        outs.append(out.sort_values(["i", "j"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_pca_projection_matches_numpy():
    df = _corpus()
    ds = ray.data.from_pandas(df).repartition(5)
    cov = embedding_covariance(ds, round_to=None, num_buckets=4)
    vals, vecs = pca_components(cov, k=2)
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    C = np.cov(X, rowvar=False, ddof=0)
    evals, evecs = np.linalg.eigh(C)
    order = np.argsort(evals)[::-1][:2]
    assert np.allclose(vals, evals[order], rtol=1e-6)
    for c in range(2):
        w = evecs[:, order[c]]
        if w[np.argmax(np.abs(w))] < 0:
            w = -w
        assert np.allclose(vecs[:, c], w, atol=1e-6)

    mean = X.mean(0)
    proj = pca_project(ds, mean, vecs).to_pandas()
    proj = proj.sort_values("vec_id").reset_index(drop=True)
    P = np.stack(proj["pc"].to_numpy())
    want = (X - mean) @ vecs
    assert np.allclose(P, want, atol=1e-6)
    # top-2 PCs of a 2-dominant-direction corpus explain most variance
    assert vals.sum() / np.trace(C) > 0.9


def test_covariance_single_row():
    df = pd.DataFrame({"vec_id": np.array([7], np.int64),
                       "embedding": [np.ones(4, np.float32)]})
    out = embedding_covariance(ray.data.from_pandas(df), round_to=6,
                               num_buckets=2)
    assert (out["cov"].to_numpy() == 0.0).all()
    assert len(out) == 16


def test_signed_projection_matches_numpy(ray_session):
    import hashlib
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from city2graph_ray.vector.stats import signed_projection
    rng = np.random.default_rng(4)
    X = rng.normal(size=(40, 16)).astype(np.float32)
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(40, dtype=np.int64),
        "embedding": list(X)}))
    out = signed_projection(ds, out_dims=4).to_pandas() \
        .sort_values(["vec_id", "j"]).reset_index(drop=True)
    sgn = np.empty((16, 4), np.int64)
    for i in range(16):
        for j in range(4):
            h = int.from_bytes(
                hashlib.md5(f"{i+1}:{j}".encode()).digest()[8:16],
                "little")
            sgn[i, j] = 1 if h & 1 else -1
    q = np.floor(X.astype(np.float64) * 10_000 + 0.5).astype(np.int64) \
        + 100_000
    want = (q @ sgn).ravel()
    assert np.array_equal(out["proj"].to_numpy(), want)


def test_signed_projection_empty(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from city2graph_ray.vector.stats import signed_projection
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": pd.Series(dtype=np.int64),
        "embedding": pd.Series(dtype=object)}))
    assert signed_projection(ds).count() == 0


def test_distance_histogram_bruteforce():
    import ray.data as rd

    from city2graph_ray.vector.stats import distance_histogram
    rng = np.random.default_rng(41)
    n, d = 60, 8
    vecs = rng.normal(0, 1, (n, d)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(vecs)})
    out = (distance_histogram(rd.from_pandas(df).repartition(3),
                              sample_mod=2, scale=100,
                              bucket_width=10000)
           .to_pandas().sort_values("bucket").reset_index(drop=True))
    q = np.floor(vecs.astype(np.float64) * 100 + 0.5).astype(np.int64)
    from collections import Counter
    want = Counter()
    ids = np.arange(n)
    keep = ids % 2 == 0
    qs, qi = q[keep], ids[keep]
    for a in range(len(qi)):
        for b in range(a + 1, len(qi)):
            d2 = int(((qs[a] - qs[b]) ** 2).sum())
            want[d2 // 10000] += 1
    assert dict(zip(out["bucket"], out["n_pairs"])) == dict(want)


def test_maxsim_topk_bruteforce():
    import ray.data as rd

    from city2graph_ray.vector.stats import maxsim_topk
    rng = np.random.default_rng(71)
    n, d = 60, 8
    vecs = rng.normal(0, 1, (n, d)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(vecs)})
    out = maxsim_topk(rd.from_pandas(df).repartition(3), [1, 5],
                      group_div=6, k=4, scale=100)
    q = np.floor(vecs.astype(np.float64) * 100 + 0.5).astype(np.int64)
    scores = {}
    for doc in range(10):
        rows = q[doc * 6:(doc + 1) * 6]
        s = 0
        for qi in (1, 5):
            s += int((rows @ q[qi]).max())
        scores[doc] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    assert list(zip(out["doc_id"], out["score"])) == want
