"""Empty/tiny-input robustness across op families (reference edge-case
parity: empty frames return empty results, singletons cluster to
themselves, no crashes or schema errors)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def _pts(**cols):
    return rd.from_pandas(pd.DataFrame(cols))


def test_knn_radius_empty_points():
    from city2graph_ray.ops.proximity import fixed_radius_graph, knn_graph
    empty = _pts(id=pd.Series(dtype=np.int64),
                 x=pd.Series(dtype=np.float64),
                 y=pd.Series(dtype=np.float64))
    assert knn_graph(empty, 3).count() == 0
    assert fixed_radius_graph(empty, 1.0).count() == 0


def test_minhash_singleton_corpus():
    from city2graph_ray.text.dedup import minhash_dedup, ngram_jaccard_pairs
    one = _pts(doc_id=np.array([1], dtype=np.int64), text=["hello world"])
    out = minhash_dedup(one).to_pandas()
    assert out.to_dict("records") == [{"doc_id": 1, "cluster_id": 1}]
    assert ngram_jaccard_pairs(one).count() == 0


def test_misc_tiny_inputs():
    from city2graph_ray.ops.graph_algos import pagerank
    from city2graph_ray.ops.proximity import (delaunay_graph,
                                              euclidean_minimum_spanning_tree,
                                              waxman_graph)
    from city2graph_ray.text.dedup import exact_dedup, simhash_pairs
    single = _pts(id=np.array([0], dtype=np.int64), x=[0.0], y=[0.0])
    two = _pts(id=np.array([0, 1], dtype=np.int64), x=[0.0, 1.0],
               y=[0.0, 0.0])
    assert delaunay_graph(single).count() == 0
    assert euclidean_minimum_spanning_tree(two).count() == 1
    assert waxman_graph(single, beta=0.5, r0=1.0).count() == 0
    one_doc = _pts(doc_id=np.array([1], dtype=np.int64), text=["a b"])
    assert exact_dedup(one_doc).count() == 1
    assert simhash_pairs(one_doc).count() == 0
    e1 = _pts(src=np.array([0], dtype=np.int64),
              dst=np.array([1], dtype=np.int64))
    assert pagerank(e1, num_iters=2).count() == 2


def test_connected_components_empty_edges():
    from city2graph_ray.ops.topology import connected_components
    empty = rd.from_pandas(pd.DataFrame(
        {"src": pd.Series(dtype=np.int64),
         "dst": pd.Series(dtype=np.int64)}))
    assert connected_components(empty).count() == 0
