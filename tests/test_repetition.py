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
