"""Repetition-score features vs a brute-force Python oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def _brute(text: str, n: int = 2):
    t = text.split(" ")
    grams = [" ".join(t[i:i + n]) for i in range(len(t) - n + 1)]
    if not grams:
        return 0, 0.0, 0.0
    vc = pd.Series(grams).value_counts()
    total = len(grams)
    return (total, round((total - len(vc)) / total, 6),
            round(int(vc.iloc[0]) / total, 6))


def test_repetition_scores_bruteforce():
    from city2graph_ray.text.analysis import repetition_scores
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["a b a b a b", "x y z", "a a a a", "q",
                 "one two one two three one", "p q p"]})
    out = (repetition_scores(rd.from_pandas(docs), n=2).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    for i, r in out.iterrows():
        total, dup, top = _brute(docs["text"].iloc[i])
        assert r["n_grams"] == total, docs["text"].iloc[i]
        assert r["dup_gram_frac"] == dup
        assert r["top_gram_frac"] == top


def test_ngram_novelty_bruteforce():
    import ray.data as rd

    from city2graph_ray.text.decontam import ngram_novelty
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["a b c d e f",          # all novel (first doc)
                 "a b c d x y",          # shares 'a b c d' gram
                 "completely new words here now",
                 "a b c d e f"]})        # full dup of doc 0
    out = (ngram_novelty(rd.from_pandas(docs).repartition(2), n=4,
                         num_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    def grams(t):
        w = t.split(" ")
        return {" ".join(w[i:i + 4]) for i in range(len(w) - 3)}

    seen = {}
    for i, t in enumerate(docs["text"]):
        for g in grams(t):
            seen.setdefault(g, i)
    for _, r in out.iterrows():
        gs = grams(docs["text"][r["doc_id"]])
        n_seen = sum(1 for g in gs if seen[g] < r["doc_id"])
        assert int(r["n_grams"]) == len(gs)
        assert int(r["n_seen"]) == n_seen
        assert r["novelty"] == round(1.0 - n_seen / len(gs), 6)
