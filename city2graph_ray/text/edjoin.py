"""Exact edit-distance similarity self-join (PassJoin).

Implements the partition-based exact algorithm of Li, Deng & Feng,
"PassJoin: A Partition-based Method for Similarity Joins" (PVLDB 2011,
public literature): every string of length ``l`` is evenly partitioned
into ``tau+1`` segments; any string within edit distance ``tau`` of it
must contain one of those segments VERBATIM at a start position inside
the multi-match-aware window, so segment hashes are a complete (no
false negatives) candidate filter.  Candidates are verified with an
exact Levenshtein kernel.

The reference repo has no string-similarity machinery at all (closest:
the grid-snap endpoint clustering, /root/reference/city2graph/data.py:735);
this is one of the training-data near-dup operators the engine adds as
first-class components.

Distributed shape (10^12 rows): index emissions are ``tau+1`` rows per
string and probe emissions O(tau^2) rows per string — both keyed by
``(l, i, segment-hash)`` and candidate-matched inside one
grouped-transform shuffle; texts for verification re-attach to the
PAIR stream via two bucketed hash joins (the dedup family's
``_pairs_with_texts`` shape) — the corpus itself never broadcasts and
never shuffles more than once per side.  Both emission stages group
rows by string LENGTH inside each batch so every substring slice is a
vectorized column operation, not a per-row loop (real corpora have a
few hundred distinct lengths per batch; each group slices in C).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from city2graph_ray import shuffle
from city2graph_ray.text.dedup import _md5_64, _pairs_with_texts


def _segment_bounds(l: int, tau: int) -> list[tuple[int, int]]:
    """Even partition of a length-``l`` string into ``tau+1`` segments:
    the first ``(tau+1) - (l % (tau+1))`` segments get ``l//(tau+1)``
    chars, the rest one more.  Returns [(start, seg_len), ...]."""
    k = tau + 1
    q, r = divmod(l, k)
    bounds = []
    pos = 0
    for i in range(k):
        seg = q + (1 if i >= k - r else 0)
        bounds.append((pos, seg))
        pos += seg
    return bounds


def levenshtein_row(a: str, b: str) -> int:
    """Exact Levenshtein via vectorized row DP: the in-row left
    dependency resolves in closed form with a running minimum
    (``row[j] = min_k<=j (t[k] - k) + j``), so each row is O(|b|)
    numpy ops — no per-cell Python loop."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return max(la, lb)
    barr = np.frombuffer(b.encode("latin-1", "replace"), dtype=np.uint8)
    ar = np.arange(lb + 1, dtype=np.int64)
    prev = ar.copy()
    abytes = a.encode("latin-1", "replace")
    for i in range(1, la + 1):
        sub = prev[:-1] + (barr != abytes[i - 1])
        t = np.minimum(sub, prev[1:] + 1)
        t = np.concatenate(([np.int64(i)], t))
        prev = np.minimum.accumulate(t - ar) + ar
    return int(prev[-1])


def _probe_window(p: int, i: int, delta: int, tau: int) -> tuple[int, int]:
    """Multi-match-aware start-position window (PassJoin Lemma 3) for
    segment ``i`` starting at ``p`` in the indexed string, probing a
    string longer by ``delta`` (0 <= delta <= tau)."""
    lo = max(p - i, p + delta - (tau - i))
    hi = min(p + i, p + delta + (tau - i))
    return lo, hi


def edit_distance_join(strings: ray.data.Dataset, tau: int,
                       key_col: str = "k", id_col: str = "doc_id",
                       num_buckets: int = shuffle.DEFAULT_BUCKETS,
                       pin: bool = False) -> ray.data.Dataset:
    """All pairs ``(a, b, dist)`` with ``levenshtein <= tau`` and
    ``a < b`` over a string table — exact (PassJoin candidates are
    complete; every candidate is verified).  Strings shorter than
    ``tau + 1`` chars brute-force inside a dedicated bucket (the
    pigeonhole needs tau+1 non-empty segments).  Ids must be >= 0
    (-1 is the internal side sentinel).  Output ``(a, b, dist)``.

    ``strings`` is consumed FOUR times (index emit, probe emit, and
    both sides of the verify text join); with the default
    ``pin=False`` each consumer re-executes the upstream pipeline —
    correct at any scale (re-reading beats materializing a corpus).
    Pass ``pin=True`` when the string table is small enough to hold
    in the object store and upstream re-execution dominates."""
    if pin:
        strings = strings.materialize()

    cols = ["l", "i", "h", "sid", "sl", "rid", "rl"]

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in cols})

    def _rows(l, i, h, sid, sl, rid, rl) -> dict:
        # both emission sides share one int64 schema; the absent side's
        # id is a -1 sentinel (typed padding survives the exchange).
        # Plain array dict — ONE DataFrame materializes per batch, not
        # one per (length, l, i, pos) combo.
        n = len(h)
        fill = lambda v: np.full(n, v, dtype=np.int64)  # noqa: E731
        return {
            "l": fill(l), "i": fill(i), "h": h.view(np.int64),
            "sid": sid if sid is not None else fill(-1),
            "sl": fill(sl), "rid": rid if rid is not None else fill(-1),
            "rl": fill(rl)}

    def _concat(parts: list[dict]) -> pd.DataFrame:
        return pd.DataFrame({c: np.concatenate([p[c] for p in parts])
                             for c in cols})

    def index_emit(b: pd.DataFrame) -> pd.DataFrame:
        s = b[key_col].astype(str)
        lens = s.str.len().to_numpy(np.int64)
        out = []
        for l in np.unique(lens):
            m = lens == l
            grp = s[m]
            ids = b[id_col].to_numpy(np.int64)[m]
            if l <= tau:
                # pigeonhole degenerates below tau+1 non-empty segments:
                # short strings brute-force inside one dedicated bucket
                out.append(_rows(-1, -1, np.zeros(len(ids), np.uint64),
                                 ids, int(l), None, -1))
                continue
            for i, (pos, seg) in enumerate(_segment_bounds(int(l), tau)):
                segs = grp.str.slice(pos, pos + seg)
                out.append(_rows(int(l), i, _md5_64(segs), ids, int(l),
                                 None, -1))
        return _concat(out) if out else _empty()

    def probe_emit(b: pd.DataFrame) -> pd.DataFrame:
        s = b[key_col].astype(str)
        lens = s.str.len().to_numpy(np.int64)
        out = []
        for m_ in np.unique(lens):
            m_ = int(m_)
            msk = lens == m_
            grp = s[msk]
            ids = b[id_col].to_numpy(np.int64)[msk]
            if m_ <= 2 * tau:
                # partner for the short-string bucket
                out.append(_rows(-1, -1, np.zeros(len(ids), np.uint64),
                                 None, -1, ids, m_))
            for l in range(max(tau + 1, m_ - tau), m_ + 1):
                delta = m_ - l
                for i, (pos, seg) in enumerate(_segment_bounds(l, tau)):
                    lo, hi = _probe_window(pos, i, delta, tau)
                    lo = max(lo, 0)
                    hi = min(hi, m_ - seg)
                    for start in range(lo, hi + 1):
                        subs = grp.str.slice(start, start + seg)
                        out.append(_rows(l, i, _md5_64(subs), None, -1,
                                         ids, m_))
        return _concat(out) if out else _empty()

    # explicit batch_size: emission cost has a fixed per-(length,l,i,pos)
    # combo component, so Ray must coalesce small upstream blocks —
    # a 500-row read split into 200 blocks would otherwise pay the
    # combo overhead 200x (measured 15x slowdown at the gate)
    idx = strings.map_batches(index_emit, batch_format="pandas",
                              batch_size=8192)
    prb = strings.map_batches(probe_emit, batch_format="pandas",
                              batch_size=8192)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["sid"] >= 0][["l", "i", "h", "sid", "sl"]]
        right = g[g["rid"] >= 0][["l", "i", "h", "rid", "rl"]]
        if left.empty or right.empty:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        m = left.merge(right, on=["l", "i", "h"])
        # equal lengths meet twice (each probes the other) — keep one
        # orientation; unequal lengths only meet shorter-indexed
        keep = np.where(m["sl"].to_numpy() == m["rl"].to_numpy(),
                        m["sid"].to_numpy() < m["rid"].to_numpy(),
                        m["sid"].to_numpy() != m["rid"].to_numpy())
        m = m[keep]
        a = np.minimum(m["sid"].to_numpy(np.int64),
                       m["rid"].to_numpy(np.int64))
        bb = np.maximum(m["sid"].to_numpy(np.int64),
                        m["rid"].to_numpy(np.int64))
        return pd.DataFrame({"a": a, "b": bb}).drop_duplicates()

    both = idx.union(prb)
    cand = shuffle.distinct(
        shuffle.grouped_transform(both, ["l", "i", "h"], pairs,
                                  num_buckets=num_buckets),
        ["a", "b"], num_buckets=num_buckets)

    withtexts = _pairs_with_texts(cand, strings, key_col, id_col,
                                  num_buckets=num_buckets)

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64),
                                 "dist": pd.Series(dtype=np.int64)})
        dist = np.fromiter(
            (levenshtein_row(x, y)
             for x, y in zip(b["__text_a"], b["__text_b"])),
            np.int64, len(b))
        keep = dist <= tau
        return pd.DataFrame({"a": b["a"].to_numpy(np.int64)[keep],
                             "b": b["b"].to_numpy(np.int64)[keep],
                             "dist": dist[keep]})

    return withtexts.map_batches(verify, batch_format="pandas")
