"""PageRank / degree-histogram / bloom-blocklist vs brute-force and
cross-strategy oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def _edges(n_edges: int = 60, n_nodes: int = 15,
           seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "src": rng.integers(0, n_nodes, n_edges).astype(np.int64),
        "dst": rng.integers(0, n_nodes, n_edges).astype(np.int64)})
    return df.drop_duplicates().reset_index(drop=True)


def _pagerank_numpy(df: pd.DataFrame, iters: int = 5, d: float = 0.85,
                    q: int = 10) -> dict[int, float]:
    nodes = np.unique(np.concatenate([df["src"], df["dst"]]))
    n = len(nodes)
    pos = {v: i for i, v in enumerate(nodes)}
    deg = np.zeros(n)
    for s in df["src"]:
        deg[pos[s]] += 1
    r = np.full(n, round(1.0 / n, q))
    for _ in range(iters):
        s = np.zeros(n)
        for a, b in zip(df["src"], df["dst"]):
            s[pos[b]] += r[pos[a]] / deg[pos[a]]
        r = np.round(0.15 / n + d * s, q)
    return {int(v): round(float(r[pos[v]]), 6) for v in nodes}


def test_pagerank_broadcast_matches_numpy():
    from city2graph_ray.ops.graph_algos import pagerank
    df = _edges()
    out = pagerank(rd.from_pandas(df), num_iters=5).to_pandas()
    got = dict(zip(out["node"].astype(int), out["rank"]))
    want = _pagerank_numpy(df)
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k


def test_pagerank_join_strategy_agrees():
    from city2graph_ray.ops.graph_algos import pagerank
    df = _edges(40, 10)
    a = (pagerank(rd.from_pandas(df), num_iters=3,
                  strategy="broadcast").to_pandas()
         .sort_values("node").reset_index(drop=True))
    b = (pagerank(rd.from_pandas(df), num_iters=3, strategy="join",
                  num_buckets=2).to_pandas()
         .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_degree_histogram():
    from city2graph_ray.ops.graph_algos import degree_histogram
    df = _edges()
    out = degree_histogram(rd.from_pandas(df)).to_pandas()
    ends = pd.concat([df["src"], df["dst"]])
    want = ends.value_counts().value_counts().sort_index()
    got = dict(zip(out["degree"].astype(int), out["n_nodes"].astype(int)))
    assert got == dict(zip(want.index.astype(int), want.astype(int)))


def test_blocklist_filter_exact_despite_bloom():
    from city2graph_ray.text.blocklist import blocklist_filter
    docs = pd.DataFrame({"doc_id": np.arange(500, dtype=np.int64),
                         "v": np.arange(500) * 2})
    blocked = pd.DataFrame({"doc_id": np.arange(0, 500, 7,
                                                dtype=np.int64)})
    # tiny bloom (64 bits) → false positives guaranteed; the exact
    # confirm join must still produce the precise anti-join result
    out = blocklist_filter(rd.from_pandas(docs), rd.from_pandas(blocked),
                           num_bits=64, num_hashes=2).to_pandas()
    want = docs[~docs["doc_id"].isin(blocked["doc_id"])]
    assert sorted(out["doc_id"]) == sorted(want["doc_id"])
    assert sorted(out.columns) == ["doc_id", "v"]


def _tri_brute(edges: pd.DataFrame) -> int:
    es = {(min(a, b), max(a, b))
          for a, b in zip(edges["src"], edges["dst"]) if a != b}
    nodes = sorted({n for e in es for n in e})
    return sum((a, b) in es and (b, c) in es and (a, c) in es
               for i, a in enumerate(nodes)
               for j, b in enumerate(nodes[i + 1:], i + 1)
               for c in nodes[j + 1:])


def test_triangle_count_bruteforce():
    from city2graph_ray.ops.graph_algos import triangle_count
    rng = np.random.default_rng(9)
    df = pd.DataFrame({"src": rng.integers(0, 25, 300),
                       "dst": rng.integers(0, 25, 300)})
    out = triangle_count(rd.from_pandas(df), num_buckets=8).to_pandas()
    assert int(out["n_triangles"].iloc[0]) == _tri_brute(df)
    # direction / multiplicity ignored: reversed duplicate edges
    df2 = pd.concat([df, df.rename(columns={"src": "dst", "dst": "src"})])
    out2 = triangle_count(rd.from_pandas(df2), num_buckets=8).to_pandas()
    assert int(out2["n_triangles"].iloc[0]) == _tri_brute(df)


def test_triangle_count_edges():
    from city2graph_ray.ops.graph_algos import triangle_count
    # no triangles: a path; self-loops only; single triangle
    path = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 3]})
    assert int(triangle_count(rd.from_pandas(path), num_buckets=4)
               .to_pandas()["n_triangles"].iloc[0]) == 0
    loops = pd.DataFrame({"src": [0, 1], "dst": [0, 1]})
    assert int(triangle_count(rd.from_pandas(loops), num_buckets=4)
               .to_pandas()["n_triangles"].iloc[0]) == 0
    tri = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 0]})
    assert int(triangle_count(rd.from_pandas(tri), num_buckets=4)
               .to_pandas()["n_triangles"].iloc[0]) == 1
