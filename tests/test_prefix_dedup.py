"""prefix_dedup vs brute-force NOT-EXISTS dominance."""

import numpy as np
import pandas as pd
import ray.data as rd

from city2graph_ray.text.dedup import prefix_dedup


def brute(df):
    keep = []
    rows = list(df.itertuples())
    for r in rows:
        dominated = any(
            o.doc_id != r.doc_id and o.text.startswith(r.text)
            and (len(o.text) > len(r.text) or o.doc_id < r.doc_id)
            for o in rows)
        if not dominated:
            keep.append((r.doc_id, len(r.text)))
    return sorted(keep)


def run(df, **kw):
    out = prefix_dedup(rd.from_pandas(df).repartition(4), **kw).to_pandas()
    return sorted(zip(out["doc_id"].astype(int), out["n_chars"].astype(int)))


def test_prefix_dedup_handbuilt():
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6, 7, 8],
        "text": ["hello world", "hello", "hello world, more",
                 "goodbye", "hello", "zebra", "zebra", "go"]})
    assert run(df) == brute(df)


def test_prefix_dedup_random_truncations():
    rng = np.random.default_rng(11)
    base = ["".join(rng.choice(list("abc"), rng.integers(2, 12)))
            for _ in range(80)]
    texts = list(base)
    for t in base[:40]:  # truncated rescrapes + exact dups
        texts.append(t[: max(1, len(t) // 2)])
        texts.append(t)
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    assert run(df) == brute(df)


def test_prefix_dedup_short_and_empty_docs():
    # 1-char docs with and without long extensions, plus empties
    df = pd.DataFrame({
        "doc_id": [10, 11, 12, 13, 14, 15, 16],
        "text": ["a", "apple", "z", "", "", "z", "b"]})
    assert run(df) == brute(df)
    # all-empty corpus: min-id empty survives
    allempty = pd.DataFrame({"doc_id": [5, 3, 9], "text": ["", "", ""]})
    assert run(allempty) == [(3, 0)]
    # single doc
    one = pd.DataFrame({"doc_id": [7], "text": ["q"]})
    assert run(one) == [(7, 1)]


def test_containment_join_bruteforce():
    from city2graph_ray.text.dedup import containment_join, char_shingles
    rng = np.random.default_rng(9)
    base = ["".join(rng.choice(list("abcdef "), 60)) for _ in range(25)]
    texts = list(base) + [t[:20] for t in base[:12]] + base[:5]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    out = containment_join(rd.from_pandas(df).repartition(3),
                           threshold=0.8, num_buckets=8).to_pandas()
    got = {(int(r.a), int(r.b)): r.containment for r in out.itertuples()}
    want = {}
    sets = {i: char_shingles(t, 5) for i, t in enumerate(texts)}
    for a in sets:
        for b in sets:
            if a == b:
                continue
            c = len(sets[a] & sets[b]) / max(len(sets[a]), 1)
            if c >= 0.8:
                want[(a, b)] = round(c, 6)
    assert got == want and len(want) >= 12
