"""Distributed embedding statistics: covariance / PCA — the whitening
and dimensionality-reduction stage of embedding-dedup / ANN pipelines
(engine-added; no reference counterpart).

Scale shape: ONE streaming pass over the corpus computes fused
per-batch second-moment partials (Gram matrix XᵀX, column sums, row
count — all emitted as exploded (i, j, g) rows from the same batch so
the corpus is scanned once, never twice); one keyed merge reduces them
to a d²-sized table.  Everything after that point is
dimension-bounded, not corpus-bounded: the covariance finish and the
eigendecomposition run on d×d numpy (d ≤ a few thousand), and the
projection stage broadcasts the (d, k) component matrix into a
stateless vectorized ``map_batches`` matmul.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from city2graph_ray import shuffle


def _moment_partials(col: str):
    def fn(b: pd.DataFrame) -> pd.DataFrame:
        X = np.stack([np.asarray(v, np.float64) for v in b[col]])
        d = X.shape[1]
        G = X.T @ X
        i, j = np.meshgrid(np.arange(d, dtype=np.int64),
                           np.arange(d, dtype=np.int64), indexing="ij")
        # piggyback the column sums (j = -1) and the row count
        # (i = j = -1) onto the Gram rows: one corpus pass, one merge
        return pd.DataFrame({
            "i": np.concatenate([i.ravel(),
                                 np.arange(d, dtype=np.int64), [-1]]),
            "j": np.concatenate([j.ravel(),
                                 np.full(d, -1, np.int64), [-1]]),
            "g": np.concatenate([G.ravel(), X.sum(0), [float(len(X))]]),
        })
    return fn


def embedding_covariance(ds: ray.data.Dataset, col: str = "embedding",
                         round_to: int | None = 6,
                         num_buckets: int | None = None) -> pd.DataFrame:
    """Covariance matrix of an embedding column as (i, j, cov) rows,
    cov = E[x_i x_j] − E[x_i]E[x_j] (population, ddof=0), rounded to
    ``round_to`` so summation order can't flip the value hash vs the
    SQL twin.  Returns pandas — the result is d²-sized (dimension-,
    not corpus-, bounded), the same driver-size rationale as the
    quantile and sketch finishes."""
    parts = ds.map_batches(_moment_partials(col), batch_format="pandas")
    agg = shuffle.group_agg(
        parts, ["i", "j"], {"g": ("g", "sum")},
        num_buckets=num_buckets or shuffle.DEFAULT_BUCKETS).to_pandas()
    n = float(agg.loc[(agg["i"] == -1) & (agg["j"] == -1), "g"].iloc[0])
    s = (agg[(agg["j"] == -1) & (agg["i"] >= 0)]
         .sort_values("i")["g"].to_numpy())
    gm = agg[(agg["i"] >= 0) & (agg["j"] >= 0)].sort_values(["i", "j"])
    d = len(s)
    G = gm["g"].to_numpy().reshape(d, d)
    mean = s / n
    cov = G / n - np.outer(mean, mean)
    if round_to is not None:
        cov = np.round(cov, round_to)
    i, j = np.meshgrid(np.arange(d, dtype=np.int64),
                       np.arange(d, dtype=np.int64), indexing="ij")
    return pd.DataFrame({"i": i.ravel(), "j": j.ravel(),
                         "cov": cov.ravel()})


def pca_components(cov_df: pd.DataFrame, k: int,
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Top-``k`` eigenpairs of an (i, j, cov) covariance table —
    deterministic sign convention (largest-|coeff| entry positive, ties
    to the lower index).  d×d numpy on the driver."""
    d = int(cov_df["i"].max()) + 1
    C = np.zeros((d, d))
    C[cov_df["i"].to_numpy(np.int64), cov_df["j"].to_numpy(np.int64)] = \
        cov_df["cov"].to_numpy(np.float64)
    vals, vecs = np.linalg.eigh((C + C.T) / 2.0)
    order = np.argsort(vals)[::-1][:k]
    vals, vecs = vals[order], vecs[:, order]
    for c in range(vecs.shape[1]):
        a = np.abs(vecs[:, c])
        top = np.argmax(a)  # first max → deterministic tie-break
        if vecs[top, c] < 0:
            vecs[:, c] = -vecs[:, c]
    return vals, vecs


def pca_project(ds: ray.data.Dataset, mean: np.ndarray,
                components: np.ndarray, col: str = "embedding",
                id_col: str = "vec_id",
                out_col: str = "pc") -> ray.data.Dataset:
    """Project embeddings onto PCA components: (X − mean) @ components.
    The (d, k) matrix rides in the task closure (kilobytes — broadcast
    once per worker by Ray's closure store, never per batch); the
    per-batch work is one numpy matmul."""
    mean = np.asarray(mean, np.float64)
    comps = np.asarray(components, np.float64)

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        X = np.stack([np.asarray(v, np.float64) for v in b[col]])
        P = (X - mean) @ comps
        return pd.DataFrame({id_col: b[id_col].to_numpy(),
                             out_col: list(P)})

    return ds.map_batches(fn, batch_format="pandas")


def signed_projection(ds: ray.data.Dataset, out_dims: int = 8,
                      col: str = "embedding", id_col: str = "vec_id",
                      scale: float = 10_000.0, offset: int = 100_000,
                      ) -> ray.data.Dataset:
    """Johnson–Lindenstrauss-style ±1 random projection (Achlioptas
    2001, public construction) made BIT-EXACT: embeddings are first
    quantized to integers (``floor(v·scale + 0.5) + offset`` — the
    engine's SQ8 convention), the sign matrix entries are the md5
    parity of ``"i:j"`` (DuckDB ``md5_number_lower`` convention, i
    1-based like SQL array subscripts), and each output coordinate is
    an all-integer signed sum, so the SQL twin reproduces it exactly.

    The sign matrix is a few KB built once on the driver and captured
    by the map closure — no shuffle anywhere; the corpus streams
    through one vectorized int64 matmul per batch.  Output long-form
    (id, j, proj) with j in [0, out_dims)."""
    import hashlib

    first = ds.take(1)
    if not first:
        return ray.data.from_pandas(pd.DataFrame(
            {id_col: pd.Series(dtype=np.int64),
             "j": pd.Series(dtype=np.int64),
             "proj": pd.Series(dtype=np.int64)}))
    d = len(first[0][col])
    sgn = np.empty((d, out_dims), dtype=np.int64)
    for i in range(d):
        for j in range(out_dims):
            h = int.from_bytes(
                hashlib.md5(f"{i + 1}:{j}".encode()).digest()[8:16],
                "little")
            sgn[i, j] = 1 if (h & 1) else -1

    def project(b: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(b[col].to_numpy()).astype(np.float64)
        q = np.floor(X * scale + 0.5).astype(np.int64) + offset
        P = q @ sgn
        n = len(b)
        return pd.DataFrame({
            id_col: np.repeat(b[id_col].to_numpy(np.int64), out_dims),
            "j": np.tile(np.arange(out_dims, dtype=np.int64), n),
            "proj": P.ravel()})

    return ds.map_batches(project, batch_format="pandas")


def distance_histogram(ds: ray.data.Dataset, sample_mod: int = 20,
                       scale: int = 1000, bucket_width: int = 10**7,
                       id_col: str = "vec_id",
                       col: str = "embedding") -> ray.data.Dataset:
    """Pairwise-distance profile of the embedding space — the
    standard diagnostic before choosing ANN/dedup thresholds: exact
    int64 squared distances between quantized sampled vectors
    (``vec_id % sample_mod == 0``), bucketed by
    ``sqdist // bucket_width``.  Output ``(bucket, n_pairs)`` over
    unordered distinct pairs — all-integer, so the self-join twin is
    bit-exact.

    Distributed shape: the sample matrix broadcasts once via
    ``ray.put`` (size bounded by the sample rate — pick ``sample_mod``
    so it fits a worker heap); the same sample then STREAMS through
    map_batches computing a (batch × sample) block of distances
    vectorized and reducing to histogram partials in-task — only
    bucket counters cross the exchange, never pairs."""
    import ray

    from city2graph_ray import shuffle

    def q(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy(np.int64)
        keep = ids % sample_mod == 0
        if not keep.any():
            return pd.DataFrame({id_col: ids[:0], col: []})
        return pd.DataFrame({id_col: ids[keep],
                             col: list(b[col].to_numpy()[keep])})

    sample = ds.map_batches(q, batch_format="pandas")
    sdf = sample.to_pandas()
    if not len(sdf):
        return ray.data.from_pandas(pd.DataFrame(
            {"bucket": np.zeros(0, np.int64),
             "n_pairs": np.zeros(0, np.int64)}))
    sids = sdf[id_col].to_numpy(np.int64)
    smat = np.floor(np.stack(
        [np.asarray(v, np.float64) for v in sdf[col]]) * scale
        + 0.5).astype(np.int64)
    ref = ray.put((sids, smat))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rids, rmat = ray.get(ref)
        ids = b[id_col].to_numpy(np.int64)
        qm = np.floor(np.stack(
            [np.asarray(v, np.float64) for v in b[col]]) * scale
            + 0.5).astype(np.int64)
        # exact int64 squared distances batch × sample
        d2 = ((qm[:, None, :] - rmat[None, :, :]) ** 2).sum(axis=2)
        mask = ids[:, None] < rids[None, :]  # unordered pairs once
        buckets = d2[mask] // bucket_width
        if not len(buckets):
            return pd.DataFrame({"bucket": np.zeros(0, np.int64),
                                 "n_pairs": np.zeros(0, np.int64)})
        u, c = np.unique(buckets, return_counts=True)
        return pd.DataFrame({"bucket": u.astype(np.int64),
                             "n_pairs": c.astype(np.int64)})

    return shuffle.group_agg(
        sample.map_batches(partial, batch_format="pandas",
                           batch_size=256),
        ["bucket"], {"n_pairs": ("n_pairs", "sum")}, num_buckets=8)


def maxsim_topk(ds: ray.data.Dataset, query_ids, group_div: int = 10,
                k: int = 10, scale: int = 1000,
                id_col: str = "vec_id",
                col: str = "embedding") -> pd.DataFrame:
    """ColBERT-style late-interaction retrieval scoring (Khattab &
    Zaharia 2020 semantics, public literature): multi-vector "docs"
    are groups of ``group_div`` consecutive vectors; the query is the
    vector set at ``query_ids``; a doc's score is
    ``Σ_q max_{v∈doc} <q, v>`` over integer-quantized embeddings —
    exact int64, so the self-join twin is bit-exact.  Returns the
    top-``k`` ``(doc_id, score)`` by (score DESC, doc_id).

    Distributed shape: the quantized query matrix broadcasts by
    closure (|Q|×d ints); the corpus STREAMS through one matmul
    map_batches emitting per-(doc, q) partial maxima; ONE keyed max
    + a doc-level sum reduce; only k rows reach the driver beyond
    the final merge."""
    from city2graph_ray import shuffle

    qdf = (ds.filter(lambda r: r[id_col] in set(query_ids))
           .to_pandas().sort_values(id_col))
    qmat = np.floor(np.stack(
        [np.asarray(v, np.float64) for v in qdf[col]]) * scale
        + 0.5).astype(np.int64)
    n_q = len(qmat)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy(np.int64)
        m = np.floor(np.stack(
            [np.asarray(v, np.float64) for v in b[col]]) * scale
            + 0.5).astype(np.int64)
        dots = m @ qmat.T  # (batch × n_q) exact int64
        doc = ids // group_div
        out = pd.DataFrame({
            "doc_id": np.repeat(doc, n_q),
            "q": np.tile(np.arange(n_q, dtype=np.int64), len(doc)),
            "dot": dots.reshape(-1)})
        return (out.groupby(["doc_id", "q"], sort=False)["dot"]
                .max().rename("mx").reset_index())

    mx = shuffle.group_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["doc_id", "q"], {"mx": ("mx", "max")}, num_buckets=8)
    scores = shuffle.group_agg(
        mx.map_batches(
            lambda b: pd.DataFrame({"doc_id": b["doc_id"],
                                    "score": b["mx"]}),
            batch_format="pandas"),
        ["doc_id"], {"score": ("score", "sum")}, num_buckets=8)

    def block_topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["score", "doc_id"],
                             ascending=[False, True]).head(k)

    top = (scores.map_batches(block_topk, batch_format="pandas")
           .to_pandas()
           .sort_values(["score", "doc_id"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    top["doc_id"] = top["doc_id"].astype(np.int64)
    top["score"] = top["score"].astype(np.int64)
    return top
