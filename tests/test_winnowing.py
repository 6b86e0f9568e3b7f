"""Winnowing fingerprint selection vs a brute-force oracle and the
SIGMOD'03 guarantee property."""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pandas as pd
import ray.data as rd


def _brute(text: str, k: int, window: int, md5: bool) -> set:
    n = max(len(text) - k + 1, 1)
    grams = ([text[i:i + k] for i in range(n)]
             if len(text) >= k else [text])
    if md5:
        h = [int.from_bytes(hashlib.md5(g.encode()).digest()[8:16],
                            "little") for g in grams]
    else:
        h = [int.from_bytes(g.encode().ljust(k, b"\0")[:k], "big")
             if len(text) >= k else
             int.from_bytes(hashlib.md5(g.encode()).digest()[8:16],
                            "little")
             for g in grams]
    sel = set()
    w = min(window, n)
    for j in range(n - w + 1):
        win = h[j:j + w]
        m = min(win)
        idx = max(i for i in range(w) if win[i] == m)
        sel.add((j + idx + 1, h[j + idx]))
    return sel


def _run(texts, k, window, hash_fn):
    from city2graph_ray.text.analysis import winnowing_fingerprints
    docs = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                         "text": texts})
    out = winnowing_fingerprints(rd.from_pandas(docs), k=k, window=window,
                                 hash_fn=hash_fn).to_pandas()
    return {
        did: {(int(p), int(f)) for p, f in
              zip(g["pos"], g["fp"])}
        for did, g in out.groupby("doc_id")
    }


def test_winnowing_bruteforce_md5():
    random.seed(7)
    texts = ["".join(random.choice("abc ") for _ in range(random.randint(0, 50)))
             for _ in range(30)]
    got = _run(texts, k=4, window=5, hash_fn="md5")
    for i, t in enumerate(texts):
        assert got[i] == _brute(t, 4, 5, md5=True), (i, t)


def test_winnowing_bruteforce_uni():
    # uni mode byte-packs the gram — brute emulates the packing for
    # full-length grams (short docs fall back to md5 in both)
    random.seed(11)
    texts = ["".join(random.choice("xyzw") for _ in range(random.randint(4, 60)))
             for _ in range(30)]
    got = _run(texts, k=4, window=3, hash_fn="uni")
    for i, t in enumerate(texts):
        assert got[i] == _brute(t, 4, 3, md5=False), (i, t)


def test_winnowing_guarantee_and_density():
    # any shared substring of length window+k-1 shares a fingerprint
    random.seed(3)
    k, window = 4, 9
    for _ in range(20):
        core = "".join(random.choice("abcd") for _ in range(k + window - 1))
        t1 = "".join(random.choice("pqr") for _ in range(12)) + core
        t2 = core + "".join(random.choice("uvw") for _ in range(12))
        got = _run([t1, t2], k=k, window=window, hash_fn="uni")
        f1 = {f for _, f in got[0]}
        f2 = {f for _, f in got[1]}
        assert f1 & f2
    # density: far fewer fingerprints than grams
    long = "".join(random.choice("abcdefgh") for _ in range(2000))
    got = _run([long], k=5, window=8, hash_fn="uni")
    assert len(got[0]) < (2000 - 4) * 0.5


def test_winnowing_edge_cases():
    got = _run(["", "ab", "aaaaaaaa"], k=5, window=4, hash_fn="md5")
    # short docs: one whole-text fingerprint at pos 1
    assert len(got[0]) == 1 and next(iter(got[0]))[0] == 1
    assert len(got[1]) == 1
    # all-equal hashes: rightmost min per window -> last pos of each window
    h = int.from_bytes(hashlib.md5(b"aaaaa").digest()[8:16], "little")
    assert got[2] == {(4, h)}
