"""Hybrid retrieval: lexical (BM25) + vector (exact cosine) rankings
fused with Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009,
public literature) — the standard "hybrid search" composition of a
training-data / RAG stack.

Scale shape: both rankers are streaming corpus passes that reduce to
k-sized rank lists (BM25's two-pass scoring, ANN's broadcast-query
partial top-k merge); the fusion itself therefore operates on
2·k driver rows — intentionally driver-side, like every other k-sized
final merge in the engine (bm25/ann/weighted_sample).

Exactness: each RRF term is ``1/(c + rank)`` with integer rank and the
two-term sum evaluated in a fixed order (lexical + vector, matching
the SQL twin's ``coalesce(bm,0) + coalesce(ann,0)``), so the fused
score is bit-reproducible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from city2graph_ray.text.analysis import bm25_topk
from city2graph_ray.vector.ann import ann_topk


def rrf_fuse(rankings: list[pd.DataFrame], id_col: str = "doc_id",
             c: int = 60, k: int = 20) -> pd.DataFrame:
    """Fuse rank lists (each with columns ``(id_col, rank)``) into the
    top-``k`` by ``Σ 1/(c + rank)``, ties broken by id.  Terms are
    added in the given list order (deterministic float sum)."""
    scores: dict = {}
    for r in rankings:
        for i, rk in zip(r[id_col].to_numpy(), r["rank"].to_numpy()):
            scores[i] = scores.get(i, 0.0) + 1.0 / (c + int(rk))
    out = pd.DataFrame({id_col: list(scores), "rrf": list(scores.values())})
    out = out.sort_values(["rrf", id_col],
                          ascending=[False, True]).head(k)
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return out.reset_index(drop=True)


def hybrid_rrf(docs: ray.data.Dataset, emb: ray.data.Dataset,
               terms: list[str], query_vec_id: int = 0,
               k_each: int = 50, k_out: int = 20, c: int = 60,
               id_col: str = "doc_id") -> ray.data.Dataset:
    """BM25 top-``k_each`` + exact-cosine top-``k_each`` (query = the
    embedding row ``query_vec_id``), RRF-fused to ``k_out``.  Assumes
    ``emb.vec_id`` aligns with ``docs.doc_id``.  Output
    ``(rank, doc_id, rrf)``."""
    bm = bm25_topk(docs, terms, k=k_each,
                   id_col=id_col).to_pandas()[[id_col, "rank"]]

    qdf = (emb.filter(lambda r, q=query_vec_id: r["vec_id"] == q)
           .to_pandas().rename(columns={"vec_id": "query_id"}))
    ann = ann_topk(emb, qdf, k=k_each).to_pandas()
    ann = ann.sort_values(["cosine", "vec_id"],
                          ascending=[False, True]).reset_index(drop=True)
    ann = pd.DataFrame({
        id_col: ann["vec_id"].to_numpy(np.int64),
        "rank": np.arange(1, len(ann) + 1, dtype=np.int64)})

    fused = rrf_fuse([bm, ann], id_col=id_col, c=c, k=k_out)
    fused[id_col] = fused[id_col].astype(np.int64)
    return ray.data.from_pandas(fused)
