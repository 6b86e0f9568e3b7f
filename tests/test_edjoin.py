"""PassJoin edit-distance similarity join: kernel vs classic DP, and
the distributed join vs a brute-force oracle (incl. short/empty
strings that exercise the dedicated short bucket)."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import ray.data as rd


def _ref_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        nd = [i] + [0] * lb
        for j in range(1, lb + 1):
            nd[j] = min(d[j] + 1, nd[j - 1] + 1,
                        d[j - 1] + (a[i - 1] != b[j - 1]))
        d = nd
    return d[lb]


def test_levenshtein_row_kernel():
    from city2graph_ray.text.edjoin import levenshtein_row
    rng = np.random.default_rng(3)
    strs = ["".join(rng.choice(list("abc"), size=rng.integers(0, 12)))
            for _ in range(40)]
    for a, b in itertools.combinations(strs, 2):
        assert levenshtein_row(a, b) == _ref_lev(a, b)
    assert levenshtein_row("", "") == 0
    assert levenshtein_row("abc", "") == 3


def test_edit_distance_join_exact_vs_brute():
    from city2graph_ray.text.edjoin import edit_distance_join
    rng = np.random.default_rng(42)
    strs = ["".join(rng.choice(list("abcd"), size=rng.integers(0, 15)))
            for _ in range(80)]
    df = pd.DataFrame({"doc_id": range(len(strs)), "k": strs})
    for tau in (1, 3):
        got = edit_distance_join(rd.from_pandas(df), tau).to_pandas()
        got_set = set(zip(got.a, got.b, got.dist))
        want = {(i, j, _ref_lev(strs[i], strs[j]))
                for i, j in itertools.combinations(range(len(strs)), 2)
                if _ref_lev(strs[i], strs[j]) <= tau}
        assert got_set == want
