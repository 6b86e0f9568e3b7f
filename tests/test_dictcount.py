"""DictionaryCounter vs replace-length arithmetic (the SQL twin)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _replace_count(text: str, term: str) -> int:
    return (len(text) - len(text.replace(term, ""))) // len(term)


def test_dictionary_count_matches_replace_trick():
    from city2graph_ray.text.blocklist import dictionary_count
    texts = ["aaa b aaa", "window window window", "xyx yxy xyx",
             "", "ab ab ab ab", "no hits here at all q"]
    terms = ["aa", "window window", "xyx", "ab ab", "b a"]
    docs = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                         "text": texts})
    got = dictionary_count(rd.from_pandas(docs), terms,
                           concurrency=1).to_pandas()
    want = {(i, t): _replace_count(s, t)
            for i, s in enumerate(texts) for t in terms
            if _replace_count(s, t) > 0}
    assert {(r["doc_id"], r["term"]): r["n"]
            for _, r in got.iterrows()} == want
    # bordered pattern sanity: "aaa" has ONE non-overlapping "aa"
    assert want[(0, "aa")] == 2  # two "aaa" words -> one each


def test_dictionary_count_validates_terms():
    from city2graph_ray.text.blocklist import DictionaryCounter
    with pytest.raises(ValueError):
        DictionaryCounter([])
    with pytest.raises(ValueError):
        DictionaryCounter(["a", "a"])
