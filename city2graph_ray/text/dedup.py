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
                id_col: str = "doc_id",
                emit: str = "ids") -> ray.data.Dataset:
    """Keep the min-id row per distinct text.  ``emit="ids"`` (default)
    outputs (doc_id, group_size); ``emit="rows"`` outputs the surviving
    input rows with ALL their columns — the composable-pipeline form
    that saves downstream callers a survivor join.

    Shuffle is keyed on the 64-bit content hash, not the text (bytes
    moved per row = 8 + payload); exact texts compared only within a
    hash bucket (collision-safe)."""
    if emit not in ("ids", "rows"):
        raise ValueError(f"unknown emit mode {emit!r}")

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        if emit == "rows":
            out = batch.copy()
            out["__h"] = _md5_64(batch[text_col]).view(np.int64)
            return out
        return pd.DataFrame({
            "h": _md5_64(batch[text_col]),
            id_col: batch[id_col].to_numpy(),
            text_col: batch[text_col]})

    hashed = docs.map_batches(add_hash, batch_format="pandas")

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(text_col, sort=False)
                .agg(doc_id=(id_col, "min"), group_size=(id_col, "size"))
                .reset_index(drop=True))

    def reduce_rows(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.loc[g.groupby(text_col, sort=False)[id_col].transform(
            "min") == g[id_col]]
        return keep[[c for c in keep.columns if c != "__h"]]

    if emit == "rows":
        return shuffle.grouped_transform(hashed, ["__h"], reduce_rows)
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


def char_window_shingles(text: str, k: int = 5) -> set[str]:
    """Unique character k-gram STRINGS — the SQL-twin shingle form
    (DuckDB ``substr(text, i, k)`` for i in 1..max(len-k+1, 1); one
    whole-text shingle when len(text) < k).  For ASCII text the Jaccard
    over these equals the byte-packed :func:`char_shingles` Jaccard."""
    n = len(text) - k + 1
    if n < 1:
        return {text}
    return {text[i:i + k] for i in range(n)}


def _md5_lower64(strings) -> np.ndarray:
    """Bytes 8..16 of each md5 digest, little-endian — exactly DuckDB's
    ``md5_number_lower`` (the convention :class:`SimHasher` md5 mode
    established)."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")
         for s in strings), dtype=np.uint64)


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


# ------------------------------------------------------------------ MinHash LSH

def _mulmod_mersenne61(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """(a*x) mod (2^61-1) without 128-bit overflow: split both factors
    into 32-bit halves, fold partial products with 2^61 ≡ 1.  All inputs
    uint64 with a < 2^61, x < 2^64; broadcasting shapes allowed."""
    p = np.uint64(_MERSENNE)
    a_hi, a_lo = a >> np.uint64(32), a & np.uint64(0xFFFFFFFF)
    x_hi, x_lo = x >> np.uint64(32), x & np.uint64(0xFFFFFFFF)
    # a*x = a_hi*x_hi*2^64 + (a_hi*x_lo + a_lo*x_hi)*2^32 + a_lo*x_lo
    # 2^64 ≡ 8 (mod p); each partial product fits in uint64
    t1 = (a_hi * x_hi) << np.uint64(3)          # < 2^64 (a_hi<2^29, x_hi<2^32)
    t1 = (t1 & p) + (t1 >> np.uint64(61))
    mid2 = a_lo * x_hi                          # < 2^64, fold before summing
    mid2 = (mid2 & p) + (mid2 >> np.uint64(61))
    mid = a_hi * x_lo + mid2                    # < 2^61 + 2^61 + 8
    mid = (mid & p) + (mid >> np.uint64(61))    # < 2^61 + 4
    # mid*2^32: split mid at bit 29 so both pieces stay < 2^64 after shift
    m_hi, m_lo = mid >> np.uint64(29), mid & np.uint64((1 << 29) - 1)
    t2 = m_hi + (m_lo << np.uint64(32))         # mid*2^32 ≡ m_hi + m_lo*2^32
    t3 = a_lo * x_lo                            # < 2^64
    t3 = (t3 & p) + (t3 >> np.uint64(61))
    s = t1 + t2 + t3                            # < 4*2^61 < 2^64
    s = (s & p) + (s >> np.uint64(61))
    s = (s & p) + (s >> np.uint64(61))
    return np.where(s >= p, s - p, s)


class MinHasher:
    """Stateful per-actor minhash: permutation params generated once.

    The hash family is a true universal (a*x + b) mod (2^61-1) — the
    multiply is folded via :func:`_mulmod_mersenne61`, not wrapped mod
    2^64, so bucket quality matches the num_perm/bands math.

    ``hash_fn`` picks the shingle BASE hash feeding the permutations:
    ``'uni'`` (default, the scale path) byte-packs each k-gram into an
    injective uint64 fully vectorized; ``'md5'`` hashes the k-gram
    STRING via md5 lower-64 (DuckDB ``md5_number_lower``) — a
    vocabulary-sized Python loop per doc, but every downstream value
    (permutation minima, band keys) becomes SQL-reproducible, which is
    what makes the driver's bit-exact DuckDB twin possible
    (``(a*md5(s) + b) % (2^61-1)`` is plain HUGEINT arithmetic)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 7,
                 hash_fn: str = "uni"):
        if hash_fn not in ("uni", "md5"):
            raise ValueError(f"bad hash_fn {hash_fn!r}")
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.k = shingle_k
        self.num_perm = num_perm
        self.hash_fn = hash_fn

    def _base_ids(self, text: str) -> np.ndarray:
        if self.hash_fn == "uni":
            return _shingle_id_array(text, self.k)
        return _md5_lower64(char_window_shingles(text, self.k))

    def signature(self, text: str) -> np.ndarray:
        sh = self._base_ids(text)
        p = np.uint64(_MERSENNE)
        vals = _mulmod_mersenne61(self.a[:, None], sh[None, :]) + self.b[:, None]
        vals = np.where(vals >= p, vals - p, vals)
        return vals.min(axis=1)


def minhash_lsh_candidates(docs: ray.data.Dataset, num_perm: int = 64,
                           bands: int = 16, shingle_k: int = 5,
                           text_col: str = "text", id_col: str = "doc_id",
                           hash_fn: str = "uni") -> ray.data.Dataset:
    """(band_id, band_hash) bucket groupby → candidate pairs (a < b).

    MinHasher is a callable-class actor stage (permutations built once
    per actor, not per batch).  ``hash_fn='md5'`` (see
    :class:`MinHasher`) also switches the band key from the uint64
    FNV mix to the comma-joined decimal minima string — byte-for-byte
    DuckDB's ``string_agg(m::VARCHAR, ',' ORDER BY i)``, so the SQL
    twin reproduces the exact candidate set."""
    rows_per_band = num_perm // bands

    class Stage:
        def __init__(self):
            self.mh = MinHasher(num_perm, shingle_k, hash_fn=hash_fn)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            n = len(batch)
            sigs = np.empty((n, num_perm), dtype=np.uint64)
            for i, text in enumerate(batch[text_col]):
                sigs[i] = self.mh.signature(text)
            if hash_fn == "md5":
                # SQL-reproducible band key: decimal minima joined by ','
                ss = sigs.astype("U20")
                cols = []
                for b in range(bands):
                    col = ss[:, b * rows_per_band]
                    for j in range(1, rows_per_band):
                        col = np.char.add(np.char.add(col, ","),
                                          ss[:, b * rows_per_band + j])
                    cols.append(col)
                kh = (np.stack(cols, axis=1).reshape(-1).astype(object)
                      if n else np.empty(0, dtype=object))
                return pd.DataFrame({
                    id_col: np.repeat(batch[id_col].to_numpy(), bands),
                    "band_id": np.tile(np.arange(bands, dtype=np.int64), n),
                    "band_hash": kh})
            # vectorized band key: murmur-mix each signature column,
            # FNV-combine within the band (one uint64 key per doc/band)
            bh = np.empty((n, bands), dtype=np.uint64)
            for b in range(bands):
                h = np.zeros(n, dtype=np.uint64)
                for j in range(rows_per_band):
                    v = sigs[:, b * rows_per_band + j]
                    v = (v ^ (v >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
                    v = v ^ (v >> np.uint64(29))
                    h = h * np.uint64(1099511628211) ^ v
                bh[:, b] = h >> np.uint64(1)  # int64-safe
            return pd.DataFrame({
                id_col: np.repeat(batch[id_col].to_numpy(), bands),
                "band_id": np.tile(np.arange(bands, dtype=np.int64), n),
                "band_hash": bh.reshape(-1).astype(np.int64)})

    banded = docs.map_batches(Stage, batch_format="pandas", concurrency=(1, 8))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on=["band_id", "band_hash"])
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        return pd.DataFrame({"a": m[f"{id_col}_x"].to_numpy(),
                             "b": m[f"{id_col}_y"].to_numpy()}).drop_duplicates()

    cand = shuffle.grouped_transform(banded, ["band_id", "band_hash"], pairs)
    return shuffle.distinct(cand, ["a", "b"])


def _pairs_with_texts(cand: ray.data.Dataset, docs: ray.data.Dataset,
                      text_col: str, id_col: str,
                      num_buckets: int = shuffle.DEFAULT_BUCKETS,
                      ) -> ray.data.Dataset:
    """Attach both texts to a (a, b) candidate-pair stream via two
    bucketed hash joins against ``documents`` — the pair stream, not
    the corpus, is what moves through memory.  No driver collect, no
    corpus broadcast: this is the 100-TB-shaped verify input."""
    from city2graph_ray.joins import bucketed_join
    import pyarrow as pa

    # pin the pair stream ONCE: it is the natural shuffle boundary,
    # and an unpinned chain would re-execute the whole candidate
    # pipeline per schema probe + per join (the r3 bucketed_join
    # hint-trust lesson; measured ~3x re-execution here)
    cand = cand.materialize()
    cs = cand.schema()
    if cs is None:
        # zero candidates (tiny corpus / no LSH collisions): Ray drops
        # the schema of all-empty datasets, which the join rejects —
        # substitute a typed empty pair stream
        cand = ray.data.from_pandas(pd.DataFrame(
            {"a": pd.Series(dtype=np.int64),
             "b": pd.Series(dtype=np.int64)}))
        cs = cand.schema()

    def _pa(t):
        if isinstance(t, pa.DataType):
            return t
        try:
            dt = np.dtype(t)
            return pa.string() if dt == object else pa.from_numpy_dtype(dt)
        except TypeError:
            return pa.string()

    cand_fields = [(n, _pa(t)) for n, t in zip(cs.names, cs.types)]
    types = dict(cand_fields)
    txt = pa.string()

    def side(pair_col: str, out_text: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.select([id_col, text_col]).rename_columns(
                [pair_col, out_text])
        return fn

    ta = docs.map_batches(side("a", "__text_a"), batch_format="pyarrow")
    tb = docs.map_batches(side("b", "__text_b"), batch_format="pyarrow")
    j = bucketed_join(cand, ta, on="a", num_buckets=num_buckets,
                      left_schema=pa.schema(cand_fields),
                      right_schema=pa.schema([("a", types["a"]),
                                              ("__text_a", txt)]))
    return bucketed_join(
        j, tb, on="b", num_buckets=num_buckets,
        left_schema=pa.schema([*cand_fields, ("__text_a", txt)]),
        right_schema=pa.schema([("b", types["b"]), ("__text_b", txt)]))


class _JaccardVerify:
    """Exact character-shingle Jaccard per pair; texts arrive in the
    batch (joined upstream), shingle sets cached per batch by doc id.
    ``mode='char'`` shingles by character windows (the SQL-twin form —
    identical Jaccard for ASCII text, and exactly DuckDB's substr
    windows otherwise)."""

    def __init__(self, shingle_k: int, threshold: float,
                 round_to: int | None = None, mode: str = "byte"):
        self.k = shingle_k
        self.threshold = threshold
        self.round_to = round_to
        self.mode = mode

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        cache: dict = {}
        mk = char_shingles if self.mode == "byte" else char_window_shingles

        def sh(i, text) -> set:
            if i not in cache:
                cache[i] = mk(text, self.k)
            return cache[i]

        jac = np.fromiter(
            (jaccard(sh(a, ta), sh(b, tb))
             for a, b, ta, tb in zip(batch["a"], batch["b"],
                                     batch["__text_a"], batch["__text_b"])),
            np.float64, len(batch))
        if self.round_to is not None:
            jac = np.round(jac, self.round_to)
        out = pd.DataFrame({"a": batch["a"].to_numpy(),
                            "b": batch["b"].to_numpy(), "jaccard": jac})
        return out[out["jaccard"] >= self.threshold]


def ngram_jaccard_pairs(docs: ray.data.Dataset, threshold: float = 0.5,
                        num_perm: int = 64, bands: int = 16,
                        shingle_k: int = 5, text_col: str = "text",
                        id_col: str = "doc_id", round_to: int | None = 6,
                        hash_fn: str = "uni") -> ray.data.Dataset:
    """Verified near-duplicate pairs with their exact character-n-gram
    Jaccard (a < b, jaccard ≥ threshold).  Candidates come from the
    MinHash-LSH banding; texts are joined back onto the pair stream
    (bucketed hash joins), then the exact Jaccard check runs batch-wise.

    ``hash_fn='md5'`` makes candidates AND jaccard values bit-exactly
    DuckDB-reproducible (md5 base hash, string band keys, char-window
    verify, single-division jaccard — pass ``round_to=None`` so the
    raw IEEE quotient is compared)."""
    cand = minhash_lsh_candidates(docs, num_perm, bands, shingle_k,
                                  text_col, id_col, hash_fn=hash_fn)
    withtext = _pairs_with_texts(cand, docs, text_col, id_col)
    mode = "byte" if hash_fn == "uni" else "char"
    return withtext.map_batches(
        _JaccardVerify,
        fn_constructor_args=(shingle_k, threshold, round_to, mode),
        batch_format="pandas", concurrency=(1, 8))


def minhash_dedup(docs: ray.data.Dataset, threshold: float = 0.5,
                  num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                  text_col: str = "text", id_col: str = "doc_id",
                  hash_fn: str = "uni") -> ray.data.Dataset:
    """Near-dup clusters: LSH candidates → exact-Jaccard verify →
    connected components.  Output (doc_id, cluster_id); cluster_id =
    min doc_id of the near-dup cluster (singletons map to themselves).

    The verify stage joins the two texts onto the candidate-pair stream
    with bucketed hash joins (no corpus broadcast, no driver collect) —
    the candidate pair set, not the corpus, is the stream.
    ``hash_fn='md5'`` (see :class:`MinHasher`) makes the whole chain
    SQL-twin-able for the driver's bit-exact gate."""
    cand = minhash_lsh_candidates(docs, num_perm, bands, shingle_k,
                                  text_col, id_col, hash_fn=hash_fn)
    withtext = _pairs_with_texts(cand, docs, text_col, id_col)
    mode = "byte" if hash_fn == "uni" else "char"
    verified = withtext.map_batches(
        _JaccardVerify, fn_constructor_args=(shingle_k, threshold, None, mode),
        batch_format="pandas", concurrency=(1, 8))
    return _clusters_from_pairs(verified, docs, id_col)


# ------------------------------------------------------------------ exact set-similarity join

def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _explode_shingles(batch: pd.DataFrame, shingle_k: int, text_col: str,
                      id_col: str) -> pd.DataFrame:
    """Vectorized batch shingle explode → (doc_id, s, n) with DISTINCT
    shingles per doc.  All docs' bytes are concatenated once; windows
    crossing doc boundaries are masked out; per-doc dedup is one lexsort
    over (doc_idx, shingle)."""
    texts = batch[text_col].to_numpy(dtype=object)
    ids = batch[id_col].to_numpy()
    bs = [t.encode() for t in texts]
    lens = np.fromiter((len(b) for b in bs), np.int64, len(bs))
    long = lens >= shingle_k
    out_ids: list[np.ndarray] = []
    out_s: list[np.ndarray] = []
    if long.any():
        flat = np.frombuffer(b"".join(bs), dtype=np.uint8)
        offs = np.zeros(len(bs) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        # Horner's rule over k shifted views: no (len×k) intermediate
        n_flat_win = len(flat) - shingle_k + 1
        sid = np.zeros(n_flat_win, dtype=np.uint64)
        for j in range(shingle_k):
            sid = sid * np.uint64(256) + flat[j:j + n_flat_win]
        # window start w belongs to doc d iff offs[d] <= w <= offs[d+1]-k
        n_win = lens - shingle_k + 1
        starts = np.repeat(offs[:-1][long], n_win[long])
        within = np.concatenate(
            [np.arange(c) for c in n_win[long]]) if long.any() else \
            np.zeros(0, np.int64)
        doc_idx = np.repeat(np.flatnonzero(long), n_win[long])
        sids = sid[starts + within]
        # distinct (doc, shingle)
        order = np.lexsort((sids, doc_idx))
        doc_idx, sids = doc_idx[order], sids[order]
        keep = np.ones(len(sids), dtype=bool)
        keep[1:] = (doc_idx[1:] != doc_idx[:-1]) | (sids[1:] != sids[:-1])
        out_ids.append(ids[doc_idx[keep]])
        out_s.append(sids[keep].astype(np.int64))
    for i in np.flatnonzero(~long):
        out_ids.append(ids[i:i + 1])
        out_s.append(np.array([int.from_bytes(
            hashlib.md5(bs[i]).digest()[:8], "big") >> 1], dtype=np.int64))
    sid_all = np.concatenate(out_s) if out_s else np.zeros(0, np.int64)
    id_all = np.concatenate(out_ids) if out_ids else ids[:0]
    df = pd.DataFrame({id_col: id_all, "s": sid_all})
    df["n"] = df.groupby(id_col, sort=False)["s"].transform("size")
    return df


def jaccard_join_exact(docs: ray.data.Dataset, threshold: float = 0.6,
                       shingle_k: int = 5, text_col: str = "text",
                       id_col: str = "doc_id", round_to: int = 6,
                       order: str = "df",
                       num_buckets: int = shuffle.DEFAULT_BUCKETS,
                       pin: bool = False) -> ray.data.Dataset:
    """EXACT set-similarity self-join: ALL pairs (a < b) whose
    character-``shingle_k``-gram Jaccard is ≥ ``threshold`` — the
    deterministic companion to the probabilistic MinHash-LSH path
    (no recall loss).  Output (a, b, jaccard).

    Algorithm is the public AllPairs/PPJoin prefix filter (Bayardo et
    al. WWW'07; Xiao et al. WWW'08): under ANY global total order on
    shingles, a pair with Jaccard ≥ t shares its minimal common shingle
    within BOTH docs' prefixes of length ``n - ceil(t*n) + 1`` (the i
    common shingles all sit at order-positions ≥ that of the minimal
    one, so it cannot be deeper than ``n - i ≤ n - ceil(t*n)``).  Only
    prefix shingles are posted to the inverted index, so bucket fan-out
    is bounded by rare-shingle document frequency, not corpus size.

    ``order="df"`` sorts prefixes by global shingle document frequency
    (rare first — smallest buckets; one extra groupby+join shuffle);
    ``order="hash"`` uses a doc-independent splitmix64 order, computing
    prefixes inline with NO extra shuffle (one inverted-index shuffle
    total).  Both are exact.

    Scale shape: shingle ids are packed bytes (injective for
    shingle_k ≤ 7 — int64-safe), the inverted index moves
    (8B key, 8B id, 8B n) per posting, candidates carry ids only, and
    texts are joined back onto the verified-candidate stream with
    bucketed hash joins (`_pairs_with_texts`) — never broadcast."""
    if shingle_k > 7:
        raise ValueError("jaccard_join_exact: shingle_k must be ≤ 7 "
                         "(packed shingle ids must stay int64-safe)")

    if pin:
        # docs is consumed 3x (shingles + both text join-backs) and the
        # shingle explode 2x (df counts + postings); without pin each
        # consumer re-executes the upstream pipeline (lazy lineage).
        # Pin when the corpus fits the object store (the edjoin
        # contract); leave False at scale and let the pruned re-read
        # stream.
        docs = docs.materialize()

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        return _explode_shingles(batch, shingle_k, text_col, id_col)

    sh = docs.map_batches(explode, batch_format="pandas")
    if pin:
        sh = sh.materialize()

    def _prefix(g: pd.DataFrame, order_cols: list[str]) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="stable")
        grp = g.groupby(id_col, sort=False)
        n = g["n"].to_numpy()
        pos = grp.cumcount().to_numpy()
        plen = n - np.ceil(threshold * n).astype(np.int64) + 1
        return g[pos < plen][[id_col, "s", "n"]]

    if order == "df":
        dfs = shuffle.group_agg(sh, ["s"], {"df": (id_col, "size")},
                                num_buckets=num_buckets)
        from city2graph_ray.joins import bucketed_join
        sh_df = bucketed_join(sh, dfs, on="s", num_buckets=num_buckets)
        posted = shuffle.grouped_transform(
            sh_df, [id_col], lambda g: _prefix(g, ["df", "s"]),
            num_buckets=num_buckets)
    elif order == "hash":
        def inline_prefix(batch: pd.DataFrame) -> pd.DataFrame:
            g = explode(batch)
            g["hs"] = _splitmix64(g["s"].to_numpy().astype(np.uint64)
                                  ).astype(np.int64)
            out = _prefix(g.assign(df=g["hs"]), ["df", "s"])
            return out
        posted = docs.map_batches(inline_prefix, batch_format="pandas")
    else:
        raise ValueError(f"unknown order {order!r}")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="s")
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        lo = np.minimum(m["n_x"].to_numpy(), m["n_y"].to_numpy())
        hi = np.maximum(m["n_x"].to_numpy(), m["n_y"].to_numpy())
        m = m[lo >= threshold * hi]  # J >= t needs |A∩B| >= t*max >= ...
        return pd.DataFrame({"a": m[f"{id_col}_x"].to_numpy(),
                             "b": m[f"{id_col}_y"].to_numpy()}
                            ).drop_duplicates()

    cand = shuffle.grouped_transform(posted, ["s"], pairs,
                                     num_buckets=num_buckets)
    cand = shuffle.distinct(cand, ["a", "b"], num_buckets=num_buckets)
    withtext = _pairs_with_texts(cand, docs, text_col, id_col, num_buckets)
    return withtext.map_batches(
        _JaccardVerify, fn_constructor_args=(shingle_k, threshold, round_to),
        batch_format="pandas", concurrency=(1, 8))


class _CosineVerify:
    """Exact binary-cosine per candidate pair: accept iff
    i²·q² ≥ p²·na·nb with threshold t = p/q — ALL-INTEGER, so the cut
    is bit-identical to the SQL twin's integer cross-multiply; the
    reported cosine = round(i / sqrt(na·nb), round_to) is one IEEE
    sqrt + divide, shared with the twin."""

    def __init__(self, shingle_k: int, p: int, q: int,
                 round_to: int | None = None):
        self.k = shingle_k
        self.p = p
        self.q = q
        self.round_to = round_to

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        cache: dict = {}

        def sh(i, text) -> set:
            if i not in cache:
                cache[i] = char_shingles(text, self.k)
            return cache[i]

        rows_a, rows_b, cos = [], [], []
        p2, q2 = self.p * self.p, self.q * self.q
        for a, b, ta, tb in zip(batch["a"], batch["b"],
                                batch["__text_a"], batch["__text_b"]):
            sa, sb = sh(a, ta), sh(b, tb)
            na, nb = len(sa), len(sb)
            if na == 0 or nb == 0:
                continue
            i = len(sa & sb)
            if i * i * q2 >= p2 * na * nb:
                rows_a.append(a)
                rows_b.append(b)
                cos.append(i / np.sqrt(float(na) * float(nb)))
        c = np.asarray(cos, np.float64)
        if self.round_to is not None:
            c = np.round(c, self.round_to)
        return pd.DataFrame({"a": rows_a, "b": rows_b, "cosine": c})


def cosine_join_exact(docs: ray.data.Dataset, threshold: float = 0.7,
                      shingle_k: int = 5, text_col: str = "text",
                      id_col: str = "doc_id", round_to: int = 6,
                      num_buckets: int = shuffle.DEFAULT_BUCKETS,
                      pin: bool = False) -> ray.data.Dataset:
    """EXACT binary-cosine set-similarity self-join: all pairs (a < b)
    with cos(A, B) = |A∩B| / √(|A|·|B|) ≥ ``threshold`` over distinct
    character ``shingle_k``-gram sets.  Output (a, b, cosine).

    Same AllPairs prefix-filter shape as :func:`jaccard_join_exact`
    (Bayardo et al. WWW'07), with the cosine bounds: a qualifying pair
    needs overlap i ≥ t·√(na·nb), partners satisfy nb ≥ t²·na, so the
    unindexed suffix of a doc with n shingles is ⌈t²·n⌉ − 1 long —
    prefix length n − ⌈t²·n⌉ + 1 (integer ceil via p²/q² with
    t = p/q, so the prefix cut is exact, never lossy).  Only prefix
    shingles are posted; candidates carry ids only; texts join back
    via bucketed hash joins; verification is the all-integer
    cross-multiply i²·q² ≥ p²·na·nb (no float boundary anywhere).
    """
    from fractions import Fraction

    frac = Fraction(str(threshold))
    p, q = frac.numerator, frac.denominator
    p2, q2 = p * p, q * q

    if pin:  # see jaccard_join_exact: 3x docs / 2x shingle consumers
        docs = docs.materialize()

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        return _explode_shingles(batch, shingle_k, text_col, id_col)

    sh = docs.map_batches(explode, batch_format="pandas")
    if pin:
        sh = sh.materialize()
    dfs = shuffle.group_agg(sh, ["s"], {"df": (id_col, "size")},
                            num_buckets=num_buckets)
    from city2graph_ray.joins import bucketed_join
    sh_df = bucketed_join(sh, dfs, on="s", num_buckets=num_buckets)

    def prefix(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["df", "s"], kind="stable")
        grp = g.groupby(id_col, sort=False)
        n = g["n"].to_numpy(np.int64)
        pos = grp.cumcount().to_numpy()
        # ceil(p²·n / q²) with integers
        ceil_t2n = (p2 * n + q2 - 1) // q2
        plen = n - ceil_t2n + 1
        return g[pos < plen][[id_col, "s", "n"]]

    posted = shuffle.grouped_transform(sh_df, [id_col], prefix,
                                       num_buckets=num_buckets)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="s")
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        lo = np.minimum(m["n_x"].to_numpy(np.int64),
                        m["n_y"].to_numpy(np.int64))
        hi = np.maximum(m["n_x"].to_numpy(np.int64),
                        m["n_y"].to_numpy(np.int64))
        m = m[lo * q2 >= p2 * hi]  # cos ≥ t ⇒ min ≥ t²·max (integer)
        return pd.DataFrame({"a": m[f"{id_col}_x"].to_numpy(),
                             "b": m[f"{id_col}_y"].to_numpy()}
                            ).drop_duplicates()

    cand = shuffle.grouped_transform(posted, ["s"], pairs,
                                     num_buckets=num_buckets)
    cand = shuffle.distinct(cand, ["a", "b"], num_buckets=num_buckets)
    withtext = _pairs_with_texts(cand, docs, text_col, id_col, num_buckets)
    return withtext.map_batches(
        _CosineVerify, fn_constructor_args=(shingle_k, p, q, round_to),
        batch_format="pandas", concurrency=(1, 8))


def _clusters_from_pairs(pairs: ray.data.Dataset, docs: ray.data.Dataset,
                         id_col: str = "doc_id") -> ray.data.Dataset:
    """(a, b) pair stream → (doc_id, cluster_id) over the WHOLE corpus;
    cluster_id = min doc id of the connected component, singletons map
    to themselves.  Small edge sets use driver union-find; big ones the
    distributed large-star/small-star components.  Assignment is a
    bucketed LEFT join — no component-map broadcast."""
    edges = pairs.map_batches(
        lambda b: b.rename(columns={"a": "src", "b": "dst"})[["src", "dst"]],
        batch_format="pandas")
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        comp = ray.data.from_pandas(
            pd.DataFrame({"node_id": pd.Series(dtype=np.int64),
                          "component": pd.Series(dtype=np.int64)}))
    elif n_edges <= 1_000_000:
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
        comp = ray.data.from_pandas(
            pd.DataFrame({"node_id": np.asarray(list(parent), dtype=np.int64),
                          "component": np.asarray([find(k) for k in parent],
                                                  dtype=np.int64)}))
    else:
        from city2graph_ray.ops.topology import connected_components
        comp = connected_components(edges)

    from city2graph_ray.joins import bucketed_join

    ids = docs.map_batches(lambda t: t.select([id_col]),
                           batch_format="pyarrow")
    comp = comp.map_batches(
        lambda t: t.rename_columns([id_col, "cluster_id"]),
        batch_format="pyarrow")
    if comp.schema(fetch_if_missing=True) is None:
        # no near-dup pairs at all → every doc is its own cluster;
        # all-empty datasets lose their schema, which the join rejects
        comp = ray.data.from_pandas(pd.DataFrame(
            {id_col: pd.Series(dtype=np.int64),
             "cluster_id": pd.Series(dtype=np.int64)}))
    joined = bucketed_join(ids, comp, on=id_col, how="left")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        ids_np = b[id_col].to_numpy()
        cl = b["cluster_id"].to_numpy(dtype=np.float64, na_value=np.nan)
        cl = np.where(np.isnan(cl), ids_np.astype(np.float64), cl)
        return pd.DataFrame({id_col: ids_np,
                             "cluster_id": cl.astype(np.int64)})

    return joined.map_batches(finish, batch_format="pandas")


def neardup_clusters_exact(docs: ray.data.Dataset, threshold: float = 0.6,
                           shingle_k: int = 5, text_col: str = "text",
                           id_col: str = "doc_id", order: str = "df",
                           num_buckets: int = shuffle.DEFAULT_BUCKETS,
                           pin: bool = False) -> ray.data.Dataset:
    """Deterministic near-dup clusters: exact prefix-filtered similarity
    join (:func:`jaccard_join_exact`) → connected components → min-id
    cluster per doc.  Unlike :func:`minhash_dedup` this has NO
    probabilistic recall term, so it is bit-exactly SQL-oracle-able."""
    pairs = jaccard_join_exact(docs, threshold, shingle_k, text_col,
                               id_col, order=order,
                               num_buckets=num_buckets, pin=pin)
    return _clusters_from_pairs(pairs, docs, id_col)


# ------------------------------------------------------------------ SimHash

class SimHasher:
    """64-bit simhash over space-tokens (token-hash bit votes).

    Fully vectorized: the whole batch's tokens are exploded to one flat
    array, hashed in one call, and per-doc bit votes are
    ``np.add.reduceat`` segments — no per-token Python (VERDICT r1
    item 9).  ``hash_fn='sip'`` (default) uses ``pd.util.hash_array``
    (C siphash); ``'md5'`` hashes each UNIQUE token (vocabulary-sized
    loop, not row-sized) as bytes 8..16 of its md5 digest
    little-endian — exactly DuckDB's ``md5_number_lower``, which makes
    the signature SQL-reproducible for the bit-exact oracle."""

    def __init__(self, hash_fn: str = "sip"):
        if hash_fn not in ("sip", "md5"):
            raise ValueError(f"bad hash_fn {hash_fn!r}")
        self.hash_fn = hash_fn

    def signatures(self, texts) -> np.ndarray:
        s = pd.Series(list(texts), dtype=object)
        if len(s) == 0:
            return np.zeros(0, dtype=np.uint64)
        toks = s.str.split(" ")
        counts = toks.str.len().to_numpy(np.int64)
        flat = toks.explode().to_numpy(dtype=object)
        if self.hash_fn == "md5":
            codes, uniq = pd.factorize(flat)
            uh = np.fromiter(
                (int.from_bytes(
                    hashlib.md5(str(u).encode()).digest()[8:16], "little")
                 for u in uniq),
                dtype=np.uint64, count=len(uniq))
            h = uh[codes]
        else:
            h = pd.util.hash_array(flat, categorize=True)
        starts = np.zeros(len(s), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        sig = np.zeros(len(s), dtype=np.uint64)
        for b in range(64):
            bit = ((h >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
            votes = np.add.reduceat(2 * bit - 1, starts)
            sig |= (votes > 0).astype(np.uint64) << np.uint64(b)
        return sig

    def signature(self, text: str) -> np.uint64:
        return self.signatures([text])[0]


def simhash_pairs(docs: ray.data.Dataset, max_hamming: int = 8,
                  bands: int = 4, text_col: str = "text",
                  id_col: str = "doc_id",
                  hash_fn: str = "sip") -> ray.data.Dataset:
    """Near-dup pairs by simhash: band the 64-bit signature into
    ``bands`` equal-width keys (a pair within hamming ≤ bands-1 shares
    at least one exact band by pigeonhole); verify EXACT 64-bit hamming
    ≤ max_hamming on candidates.  With ``max_hamming < bands`` the
    output is the complete exact pair set; beyond that, banding is a
    recall-documented approximation.  ``hash_fn='md5'`` makes the
    signature DuckDB-reproducible (see :class:`SimHasher`).
    Output (a, b, hamming)."""

    class Stage:
        def __init__(self):
            self.sh = SimHasher(hash_fn)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            width = 64 // bands
            mask = np.uint64((1 << width) - 1)
            sig = self.sh.signatures(batch[text_col])
            n = len(sig)
            band_arr = np.tile(np.arange(bands, dtype=np.int64), n)
            sig_rep = np.repeat(sig, bands)
            keys = ((sig_rep >> (band_arr.astype(np.uint64)
                                 * np.uint64(width))) & mask).astype(np.int64)
            return pd.DataFrame({
                id_col: np.repeat(batch[id_col].to_numpy(), bands),
                "band_id": band_arr,
                "key": keys,
                "sig": sig_rep.view(np.int64)})  # bit-exact reinterpret

    banded = docs.map_batches(Stage, batch_format="pandas", concurrency=(1, 8))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on=["band_id", "key"])
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]].drop_duplicates(
            [f"{id_col}_x", f"{id_col}_y"])
        x = m["sig_x"].to_numpy().view(np.uint64) ^ \
            m["sig_y"].to_numpy().view(np.uint64)
        ham = np.zeros(len(m), dtype=np.int64)
        for b in range(64):
            ham += ((x >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
        keep = ham <= max_hamming
        return pd.DataFrame({"a": m[f"{id_col}_x"].to_numpy()[keep],
                             "b": m[f"{id_col}_y"].to_numpy()[keep],
                             "hamming": ham[keep]})

    cand = shuffle.grouped_transform(banded, ["band_id", "key"], pairs)
    return shuffle.distinct(cand, ["a", "b"])


def split_lines(docs: ray.data.Dataset, words_per_line: int = 4,
                text_col: str = "text",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """Explode each document into fixed-width "lines" of
    ``words_per_line`` whitespace-separated words (the last line of a
    doc may be shorter).  Output ``(id_col, line_no, line)``.

    The chunking is a single vectorized C-regex pass — every Nth space
    becomes a newline, then one split — no per-row Python loop.
    Assumes single-space tokenization with no embedded newlines (the
    documents table's shape); the SQL twin is
    ``array_to_string(ts[i:i+N-1], ' ')`` over
    ``generate_series(1, len(ts), N)``.
    """
    pat = r"((?:\S+ ){%d}\S+) " % (words_per_line - 1)

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        lines = (b[text_col].astype(str)
                 .str.replace(pat, r"\1\n", regex=True).str.split("\n"))
        out = pd.DataFrame({id_col: b[id_col].to_numpy(),
                            "line": lines}).explode("line",
                                                    ignore_index=True)
        out["line_no"] = out.groupby(id_col, sort=False).cumcount()
        return out[[id_col, "line_no", "line"]]

    return docs.map_batches(fn, batch_format="pandas")


def line_dedup(docs: ray.data.Dataset, words_per_line: int = 4,
               max_count: int = 1, text_col: str = "text",
               id_col: str = "doc_id") -> ray.data.Dataset:
    """CCNet / RefinedWeb-style corpus-level line deduplication: drop
    every line whose corpus-wide occurrence count exceeds ``max_count``
    (boilerplate screen), reassemble each doc from its surviving lines
    in order.  Output ``(doc_id, text_clean, n_kept, n_dropped)`` —
    one row per input doc (docs losing every line keep an empty
    ``text_clean``).

    Scale shape (10^12 docs): line counting is a partial-aggregated
    keyed count — hot boilerplate lines (exactly the ones this op
    removes) collapse to one row per input batch before the shuffle,
    so the exchange is bounded by DISTINCT lines per batch.  Counts
    re-attach via one bucketed hash join on the line string, and doc
    reassembly is one shuffle keyed by ``id_col``.  No stage holds the
    corpus; the count table is bounded by distinct lines, not rows.
    """
    from city2graph_ray.joins import bucketed_join

    lines = split_lines(docs, words_per_line, text_col, id_col)
    counts = shuffle.group_agg(lines, ["line"], {"n": ("line", "size")})
    flagged = bucketed_join(lines, counts, on="line")

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "line_no"], kind="stable")
        keep = (g["n"] <= max_count).to_numpy()
        kept_line = g["line"].where(keep, None)
        out = pd.DataFrame({
            "text_clean": kept_line.groupby(g[id_col], sort=False).agg(
                lambda s: "\n".join(x for x in s if x is not None)),
            "n_kept": pd.Series(keep.astype(np.int64),
                                index=g.index).groupby(
                                    g[id_col], sort=False).sum(),
        })
        out["n_dropped"] = (g.groupby(id_col, sort=False).size()
                            - out["n_kept"])
        return out.reset_index().rename(columns={"index": id_col})

    return shuffle.grouped_transform(flagged, [id_col], kernel)


_MAXCHAR = "\U0010ffff"


def _prefix_scan(g: pd.DataFrame, key_col: str, text_col: str,
                 id_col: str) -> pd.DataFrame:
    """Sorted-neighbor prefix scan within a bucket of whole key
    groups: sort by (key, text asc, id desc); strings sharing a prefix
    are contiguous under the text order, so a row is dominated iff its
    IMMEDIATE successor (same key) extends-or-equals it.  The ragged
    per-row startswith collapses to one vectorized string comparison
    via the prefix-range trick: ``s.startswith(p)  ⟺  p <= s <
    p + U+10FFFF`` (texts containing U+10FFFF excluded, documented).
    id-desc ordering makes the min-id duplicate the run's last row, so
    the same successor test applies the first-wins rule for free."""
    g = g.sort_values([key_col, text_col, id_col],
                      ascending=[True, True, False])
    t = g[text_col].to_numpy()
    k = g[key_col].to_numpy()
    nxt = np.roll(t, -1)
    same_key = np.empty(len(g), bool)
    same_key[:-1] = k[:-1] == k[1:]
    same_key[-1] = False
    hi = (g[text_col] + _MAXCHAR).to_numpy()
    dominated = same_key & (nxt >= t) & (nxt < hi)
    out = g.loc[~dominated, [id_col, text_col]]
    return pd.DataFrame({id_col: out[id_col].to_numpy(),
                         "n_chars": out[text_col].str.len().to_numpy(
                             np.int64)})


def prefix_dedup(docs: ray.data.Dataset, text_col: str = "text",
                 id_col: str = "doc_id",
                 num_buckets: int = shuffle.DEFAULT_BUCKETS,
                 ) -> ray.data.Dataset:
    """Prefix dedup — drop every document whose text is a strict
    PREFIX of another document's text (truncation artifacts: partial
    crawls, cut-off re-scrapes), and among exact duplicates keep the
    min id.  Output ``(doc_id, n_chars)`` of the survivors.

    The reference has no text dedup at all (closest analogue:
    grid-snap endpoint clustering, /root/reference/city2graph/
    data.py:735); this extends the dedup family (exact / fingerprint /
    minhash / line / media) with the containment-by-truncation case
    none of them catch.

    Scale plan: a strict-prefix pair shares the prefix's first TWO
    characters whenever the prefix has ≥2 chars, so docs of length ≥2
    shuffle once keyed by their first two characters (fan-out bounded
    by alphabet²; hot 2-grams like ``th`` are real but each bucket
    does an O(m log m) local sort, not a quadratic join) and resolve
    with the sorted-neighbor scan above.  Length-<2 docs (empty or
    1-char — prefixes of entire first-char ranges) cannot be resolved
    inside a 2-char bucket; they are a vanishing sliver of any real
    corpus, so they collect to the driver and resolve against a
    ≤alphabet-sized per-first-char existence aggregate (no corpus
    broadcast, no second corpus pass).
    """

    def route(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col].astype(str)
        return pd.DataFrame({"k2": t.str.slice(0, 2),
                             id_col: b[id_col].to_numpy(),
                             text_col: t,
                             "__len": t.str.len().to_numpy(np.int64)})

    routed = docs.map_batches(route, batch_format="pandas").materialize()
    long_docs = routed.filter(expr="__len >= 2")

    survivors = shuffle.grouped_transform(
        long_docs, ["k2"],
        lambda g: _prefix_scan(g, "k2", text_col, id_col),
        num_buckets=num_buckets)

    shorts = routed.filter(expr="__len < 2").to_pandas()
    if len(shorts) == 0:
        return survivors

    # tiny sidecar: per-first-char existence of >=2-char docs (bounded
    # by the distinct first characters, not the corpus)
    first = long_docs.map_batches(
        lambda b: pd.DataFrame({"c": b[text_col].str.slice(0, 1)}),
        batch_format="pandas")
    counts = shuffle.group_agg(first, ["c"], {"n": ("c", "size")},
                               num_buckets=num_buckets).to_pandas()
    # empty Datasets drop pandas column names (Ray quirk) — guard
    n_long = int(counts["n"].sum()) if len(counts) else 0
    extended = set(counts["c"]) if len(counts) else set()

    keep_rows = []
    for txt, grp in shorts.groupby(text_col, sort=False):
        min_id = int(grp[id_col].min())
        if txt == "":
            # the empty text is a prefix of every non-empty doc: its
            # min-id copy survives only in an all-empty corpus
            if n_long == 0 and (shorts[text_col] == "").all():
                keep_rows.append((min_id, 0))
        elif txt not in extended:
            # a 1-char doc is dominated only by a >=2-char extension
            # (no other short can strictly extend it)
            keep_rows.append((min_id, len(txt)))
    if not keep_rows:
        return survivors
    extra = pd.DataFrame(keep_rows, columns=[id_col, "n_chars"])
    extra["n_chars"] = extra["n_chars"].astype(np.int64)
    return survivors.union(ray.data.from_pandas(extra))


class _ContainVerify:
    """Exact shingle containment |A∩B| / |A| per DIRECTED pair; texts
    arrive in the batch (joined upstream).  The shingle-array cache is
    ACTOR-persistent (docs recur across thousands of pair batches —
    a per-batch cache re-shingled every text ~400× and dominated the
    stage; measured 20 s → ~2 s), bounded by ``cache_cap`` entries.
    Intersections are sorted-unique numpy merges, not Python sets."""

    def __init__(self, shingle_k: int, threshold: float,
                 round_to: int | None = None,
                 cache_cap: int = 200_000):
        self.k = shingle_k
        self.threshold = threshold
        self.round_to = round_to
        self.cache: dict = {}
        self.cache_cap = cache_cap

    def _sh(self, i, text) -> np.ndarray:
        arr = self.cache.get(i)
        if arr is None:
            if len(self.cache) >= self.cache_cap:
                self.cache.clear()
            arr = _shingle_id_array(text, self.k)
            self.cache[i] = arr
        return arr

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        con = np.fromiter(
            (len(np.intersect1d(self._sh(a, ta), self._sh(b, tb),
                                assume_unique=True))
             / max(len(self._sh(a, ta)), 1)
             for a, b, ta, tb in zip(batch["a"], batch["b"],
                                     batch["__text_a"],
                                     batch["__text_b"])),
            np.float64, len(batch))
        keep = con >= self.threshold
        out = pd.DataFrame({"a": batch["a"].to_numpy(),
                            "b": batch["b"].to_numpy(),
                            "containment": (np.round(con, self.round_to)
                                            if self.round_to is not None
                                            else con)})
        return out[keep]


def containment_join(docs: ray.data.Dataset, threshold: float = 0.8,
                     shingle_k: int = 5, text_col: str = "text",
                     id_col: str = "doc_id", round_to: int = 6,
                     order: str = "df",
                     num_buckets: int = shuffle.DEFAULT_BUCKETS,
                     pin: bool = False) -> ray.data.Dataset:
    """EXACT directed containment self-join: all pairs (a ≠ b) with
    ``|shingles(a) ∩ shingles(b)| / |shingles(a)| ≥ threshold`` — the
    near-CONTAINMENT screen (quotes, truncations, wrapper pages) that
    Jaccard misses when the container is much larger than the
    contained doc.  Output (a, b, containment), directed.

    Prefix filter, containment form: if C(a→b) ≥ t, the ≥ ceil(t·|a|)
    common shingles cannot all hide in the last ceil(t·|a|)−1
    positions of a's global-order sort, so a's PREFIX of length
    ``|a| − ceil(t·|a|) + 1`` must hit b's FULL posting list — only
    probe prefixes are exploded against the index, and candidates are
    pre-filtered by the size bound ``|b| ≥ t·|a|``.  Verification
    joins texts onto the candidate stream (`_pairs_with_texts`) and
    runs the exact set intersection in an actor pool.

    ``order="df"`` (default) sorts each probe's shingles by global
    document frequency so the prefix holds its RAREST shingles —
    measured 16.2M → ~10⁴ raw candidates on the templated bench
    corpus (common shingles have huge posting lists; for containment
    the index side must stay full, so the probe prefix is the only
    lever).  ``order="hash"`` (splitmix64, no extra shuffle) remains
    for corpora without heavy shingle skew.  Both are exact.
    """
    if pin:  # docs also feeds both text join-backs
        docs = docs.materialize()

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        return _explode_shingles(batch, shingle_k, text_col, id_col)

    # pinned at the fan-out: the shingle table feeds the DF count, the
    # DF join AND the index side — unpinned, Ray re-executes the
    # explode once per consumer (no common-subexpression elimination)
    full = docs.map_batches(explode, batch_format="pandas").materialize()

    def _prefix(g: pd.DataFrame, order_cols: list) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="stable")
        grp = g.groupby(id_col, sort=False)
        n = g["n"].to_numpy()
        pos = grp.cumcount().to_numpy()
        plen = n - np.ceil(threshold * n).astype(np.int64) + 1
        return g[pos < plen][[id_col, "s", "n"]].rename(
            columns={id_col: "a", "n": "n_a"})

    from city2graph_ray.joins import bucketed_join

    if order == "df":
        dfs = shuffle.group_agg(full, ["s"], {"df": (id_col, "size")},
                                num_buckets=num_buckets)
        sh_df = bucketed_join(full, dfs, on="s",
                              num_buckets=num_buckets)
        probe = shuffle.grouped_transform(
            sh_df, [id_col], lambda g: _prefix(g, ["df", "s"]),
            num_buckets=num_buckets)
    elif order == "hash":
        def inline_prefix(batch: pd.DataFrame) -> pd.DataFrame:
            g = explode(batch)
            g["hs"] = _splitmix64(g["s"].to_numpy().astype(np.uint64)
                                  ).astype(np.int64)
            return _prefix(g.assign(df=g["hs"]), ["df", "s"])

        probe = docs.map_batches(inline_prefix, batch_format="pandas")
    else:
        raise ValueError(f"unknown order {order!r}")
    index = full.map_batches(
        lambda b: b.rename(columns={id_col: "b", "n": "n_b"}),
        batch_format="pandas")
    import pyarrow as pa
    cand = bucketed_join(
        probe, index, on="s", num_buckets=num_buckets,
        left_schema=pa.schema([("a", pa.int64()), ("s", pa.int64()),
                               ("n_a", pa.int64())]),
        right_schema=pa.schema([("b", pa.int64()), ("s", pa.int64()),
                                ("n_b", pa.int64())]))

    def screen(b: pd.DataFrame) -> pd.DataFrame:
        keep = ((b["a"].to_numpy() != b["b"].to_numpy())
                & (b["n_b"].to_numpy() >= threshold
                   * b["n_a"].to_numpy()))
        return b.loc[keep, ["a", "b"]].drop_duplicates()

    # pin the id-only pair stream: _pairs_with_texts fetches its
    # schema, and an unpinned all-to-all upstream would re-execute the
    # whole candidate chain once for the fetch and once for the join
    cand = shuffle.distinct(
        cand.map_batches(screen, batch_format="pandas"), ["a", "b"],
        num_buckets=num_buckets).materialize()
    withtext = _pairs_with_texts(cand, docs, text_col, id_col,
                                 num_buckets)
    return withtext.map_batches(
        _ContainVerify, fn_constructor_args=(shingle_k, threshold,
                                             round_to),
        batch_format="pandas", batch_size=8192, concurrency=(1, 8))
