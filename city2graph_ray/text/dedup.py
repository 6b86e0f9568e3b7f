"""Deduplication operators over the ``documents`` table.

The reference has no text near-dedup (its closest analogue is the
grid-snap endpoint clustering, /root/reference/city2graph/data.py:735);
these are the training-data-pipeline operators the engine adds as
first-class components:

- exact dedup (content hash → hash-partitioned first-wins),
- bag-of-words fingerprint dedup (normalize → exact),
- MinHash + LSH near-dedup (shingle → signature → banded buckets →
  candidate pairs → exact-Jaccard verify → min-label components),
- SimHash near-dedup (64-bit signature, banded hamming buckets).

All content hashing is md5 (process-stable; Python ``hash`` is salted
per process and MUST NOT key a shuffle).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray
import ray.data

from city2graph_ray import shuffle

_MERSENNE = (1 << 61) - 1


def _md5_64(texts) -> np.ndarray:
    return np.fromiter(
        (int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big") for t in texts),
        np.uint64, len(texts))


def exact_dedup(docs: ray.data.Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """Keep the min-id row per distinct text. Output (doc_id, group_size).

    Shuffle is keyed on the 64-bit content hash, not the text (bytes
    moved per row = 8, not the document); exact texts compared only
    within a hash bucket (collision-safe)."""

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "h": _md5_64(batch[text_col]),
            id_col: batch[id_col].to_numpy(),
            text_col: batch[text_col]})

    hashed = docs.map_batches(add_hash, batch_format="pandas")

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(text_col, sort=False)
                .agg(doc_id=(id_col, "min"), group_size=(id_col, "size"))
                .reset_index(drop=True))

    return shuffle.grouped_transform(hashed, ["h"], reduce)


def fingerprint(texts) -> list[str]:
    """Bag-of-words fingerprint: sorted distinct space-tokens, joined.
    SQL mirror: array_to_string(list_sort(list_distinct(
    string_split(text, ' '))), ' ')."""
    return [" ".join(sorted(set(t.split(" ")))) for t in texts]


def fingerprint_dedup(docs: ray.data.Dataset, text_col: str = "text",
                      id_col: str = "doc_id") -> ray.data.Dataset:
    """Exact dedup on the bag-of-words fingerprint (document
    fingerprinting: same token set ⇒ same cluster).
    Output (doc_id, group_size) — doc_id = min id of the cluster."""

    def add_fp(batch: pd.DataFrame) -> pd.DataFrame:
        fp = fingerprint(batch[text_col])
        return pd.DataFrame({"h": _md5_64(fp), "fp": fp,
                             id_col: batch[id_col].to_numpy()})

    hashed = docs.map_batches(add_fp, batch_format="pandas")

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("fp", sort=False)
                .agg(doc_id=(id_col, "min"), group_size=(id_col, "size"))
                .reset_index(drop=True))

    return shuffle.grouped_transform(hashed, ["h"], reduce)


# ------------------------------------------------------------------ shingles / jaccard

def char_shingles(text: str, k: int = 5) -> set[int]:
    """k-byte shingle ids, vectorized: each window's bytes packed into
    one integer (injective for k ≤ 8 — not a hash at all, so Jaccard
    over ids == Jaccard over the shingle strings exactly)."""
    b = np.frombuffer(text.encode(), dtype=np.uint8)
    if len(b) < k:
        return {int.from_bytes(hashlib.md5(text.encode()).digest()[:8], "big")}
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    powers = (np.uint64(256) ** np.arange(k - 1, -1, -1, dtype=np.uint64))
    ids = (win * powers[None, :]).sum(axis=1)
    return set(np.unique(ids).tolist())


def _shingle_id_array(text: str, k: int = 5) -> np.ndarray:
    """Unique shingle ids as a uint64 array (no Python set)."""
    b = np.frombuffer(text.encode(), dtype=np.uint8)
    if len(b) < k:
        return np.array([int.from_bytes(hashlib.md5(text.encode()).digest()[:8],
                                        "big")], dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    powers = (np.uint64(256) ** np.arange(k - 1, -1, -1, dtype=np.uint64))
    return np.unique((win * powers[None, :]).sum(axis=1))


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


# ------------------------------------------------------------------ MinHash LSH

class MinHasher:
    """Stateful per-actor minhash: permutation params generated once."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.k = shingle_k
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_id_array(text, self.k)
        # (a*x + b) mod p over all shingles; min per permutation
        vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)


def minhash_lsh_candidates(docs: ray.data.Dataset, num_perm: int = 64,
                           bands: int = 16, shingle_k: int = 5,
                           text_col: str = "text", id_col: str = "doc_id",
                           ) -> ray.data.Dataset:
    """(band_id, band_hash) bucket groupby → candidate pairs (a < b).

    MinHasher is a callable-class actor stage (permutations built once
    per actor, not per batch)."""
    rows_per_band = num_perm // bands

    class Stage:
        def __init__(self):
            self.mh = MinHasher(num_perm, shingle_k)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids, band_ids, band_hashes = [], [], []
            for did, text in zip(batch[id_col], batch[text_col]):
                sig = self.mh.signature(text)
                for b in range(bands):
                    chunk = sig[b * rows_per_band:(b + 1) * rows_per_band]
                    h = hashlib.md5(chunk.tobytes()).digest()[:8]
                    ids.append(did)
                    band_ids.append(b)
                    band_hashes.append(int.from_bytes(h, "big") >> 1)
            return pd.DataFrame({id_col: ids, "band_id": band_ids,
                                 "band_hash": band_hashes})

    banded = docs.map_batches(Stage, batch_format="pandas", concurrency=(1, 8))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on=["band_id", "band_hash"])
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        return pd.DataFrame({"a": m[f"{id_col}_x"].to_numpy(),
                             "b": m[f"{id_col}_y"].to_numpy()}).drop_duplicates()

    cand = shuffle.grouped_transform(banded, ["band_id", "band_hash"], pairs)
    return shuffle.distinct(cand, ["a", "b"])


def ngram_jaccard_pairs(docs: ray.data.Dataset, threshold: float = 0.5,
                        num_perm: int = 64, bands: int = 16,
                        shingle_k: int = 5, text_col: str = "text",
                        id_col: str = "doc_id", round_to: int = 6,
                        ) -> ray.data.Dataset:
    """Verified near-duplicate pairs with their exact character-n-gram
    Jaccard (a < b, jaccard ≥ threshold).  Candidates come from the
    MinHash-LSH banding; the exact Jaccard verification runs per
    candidate pair against a broadcast id→text map."""
    cand = minhash_lsh_candidates(docs, num_perm, bands, shingle_k,
                                  text_col, id_col)
    texts_df = docs.select_columns([id_col, text_col]).to_pandas()
    ref = ray.put(dict(zip(texts_df[id_col], texts_df[text_col])))

    class Verify:
        def __init__(self):
            self.texts = ray.get(ref)
            self.cache: dict[int, set] = {}

        def sh(self, i) -> set:
            if i not in self.cache:
                self.cache[i] = char_shingles(self.texts[i], shingle_k)
            return self.cache[i]

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            jac = np.fromiter(
                (jaccard(self.sh(a), self.sh(b))
                 for a, b in zip(batch["a"], batch["b"])),
                np.float64, len(batch))
            out = batch.copy()
            out["jaccard"] = np.round(jac, round_to)
            return out[out["jaccard"] >= threshold]

    return cand.map_batches(Verify, batch_format="pandas", concurrency=(1, 8))


def minhash_dedup(docs: ray.data.Dataset, threshold: float = 0.5,
                  num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                  text_col: str = "text", id_col: str = "doc_id",
                  ) -> ray.data.Dataset:
    """Near-dup clusters: LSH candidates → exact-Jaccard verify →
    connected components.  Output (doc_id, cluster_id); cluster_id =
    min doc_id of the near-dup cluster (singletons map to themselves).

    The verify stage re-reads the two texts via a broadcast id→text map
    (documents small-side here; becomes a bucketed join at corpus
    scale — the candidate pair set, not the corpus, is the stream)."""
    cand = minhash_lsh_candidates(docs, num_perm, bands, shingle_k,
                                  text_col, id_col)
    texts_df = docs.select_columns([id_col, text_col]).to_pandas()
    ref = ray.put(dict(zip(texts_df[id_col], texts_df[text_col])))

    class Verify:
        def __init__(self):
            self.texts = ray.get(ref)
            self.cache: dict[int, set] = {}

        def sh(self, i) -> set:
            if i not in self.cache:
                self.cache[i] = char_shingles(self.texts[i], shingle_k)
            return self.cache[i]

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            jac = np.fromiter(
                (jaccard(self.sh(a), self.sh(b))
                 for a, b in zip(batch["a"], batch["b"])),
                np.float64, len(batch))
            out = batch.copy()
            out["jaccard"] = jac
            return out[out["jaccard"] >= threshold]

    verified = cand.map_batches(Verify, batch_format="pandas", concurrency=(1, 8))

    edges = verified.map_batches(
        lambda b: b.rename(columns={"a": "src", "b": "dst"})[["src", "dst"]],
        batch_format="pandas")
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        comp = pd.DataFrame({"node_id": pd.Series(dtype=np.int64),
                             "component": pd.Series(dtype=np.int64)})
    elif n_edges <= 1_000_000:
        # near-dup candidate sets are tiny relative to the corpus:
        # driver union-find beats iterated label-propagation shuffles
        edf = edges.to_pandas()
        parent: dict[int, int] = {}

        def find(a: int) -> int:
            while parent.setdefault(a, a) != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for u, v in edf.itertuples(index=False):
            ru, rv = find(int(u)), find(int(v))
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        comp = pd.DataFrame({"node_id": list(parent),
                             "component": [find(k) for k in parent]})
    else:
        from city2graph_ray.ops.topology import connected_components
        comp = connected_components(edges).to_pandas()
    cref = ray.put(dict(zip(comp["node_id"], comp["component"])))

    class Assign:
        def __init__(self):
            self.cmap = ray.get(cref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch[id_col].to_numpy()
            cluster = np.fromiter((self.cmap.get(i, i) for i in ids),
                                  np.int64, len(ids))
            return pd.DataFrame({id_col: ids, "cluster_id": cluster})

    return docs.map_batches(Assign, batch_format="pandas", concurrency=(1, 8))


# ------------------------------------------------------------------ SimHash

class SimHasher:
    """64-bit simhash over space-tokens (token md5 bit votes)."""

    def __init__(self):
        self.bit_cols = np.arange(64, dtype=np.uint64)

    def signature(self, text: str) -> np.uint64:
        votes = np.zeros(64, dtype=np.int64)
        for tok in text.split(" "):
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            bits = (np.uint64(h) >> self.bit_cols) & np.uint64(1)
            votes += np.where(bits.astype(bool), 1, -1)
        sig = np.uint64(0)
        for i in range(64):
            if votes[i] > 0:
                sig |= np.uint64(1) << np.uint64(i)
        return sig


def simhash_pairs(docs: ray.data.Dataset, max_hamming: int = 8,
                  bands: int = 4, text_col: str = "text",
                  id_col: str = "doc_id") -> ray.data.Dataset:
    """Near-dup pairs by simhash: band the 64-bit signature into
    ``bands`` 16-bit keys (a pair within hamming ≤ bands-1 ... shares at
    least one exact band by pigeonhole when max_hamming < bands);
    verify hamming ≤ max_hamming on candidates.
    Output (a, b, hamming)."""

    class Stage:
        def __init__(self):
            self.sh = SimHasher()

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids, band_ids, keys, sigs = [], [], [], []
            width = 64 // bands
            mask = np.uint64((1 << width) - 1)
            for did, text in zip(batch[id_col], batch[text_col]):
                sig = self.sh.signature(text)
                for b in range(bands):
                    ids.append(did)
                    band_ids.append(b)
                    keys.append(int((sig >> np.uint64(b * width)) & mask))
                    sigs.append(int(sig) >> 1)  # int64-safe
            return pd.DataFrame({id_col: ids, "band_id": band_ids,
                                 "key": keys, "sig": sigs})

    banded = docs.map_batches(Stage, batch_format="pandas", concurrency=(1, 8))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on=["band_id", "key"])
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]].drop_duplicates(
            [f"{id_col}_x", f"{id_col}_y"])
        x = m["sig_x"].to_numpy().astype(np.uint64) ^ \
            m["sig_y"].to_numpy().astype(np.uint64)
        ham = np.zeros(len(m), dtype=np.int64)
        for b in range(63):  # top bit dropped in banding shift
            ham += ((x >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
        keep = ham <= max_hamming
        return pd.DataFrame({"a": m[f"{id_col}_x"].to_numpy()[keep],
                             "b": m[f"{id_col}_y"].to_numpy()[keep],
                             "hamming": ham[keep]})

    cand = shuffle.grouped_transform(banded, ["band_id", "key"], pairs)
    return shuffle.distinct(cand, ["a", "b"])
