"""Text analysis stages: token counting, quality scoring, language ID,
rolling-hash fingerprints.  All are vectorized ``map_batches`` stages;
the heuristics are deliberately SQL-mirrorable (substring-count based)
so the DuckDB oracle can reproduce them bit-for-bit.
"""

from __future__ import annotations


import hashlib
from collections.abc import Sequence

import numpy as np
import pandas as pd
import ray
import ray.data

from city2graph_ray import shuffle

# language → marker stopwords (counted as padded substrings, a
# deterministic heuristic mirrorable in SQL with replace-length counts)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "fr": ("le", "la", "et"),
    "de": ("der", "die", "und"),
    "es": ("el", "los", "y"),
}


def token_counts(docs: ray.data.Dataset, text_col: str = "text",
                 id_col: str = "doc_id") -> ray.data.Dataset:
    """Per-doc whitespace token count + distinct-token count.
    SQL mirror: len(string_split(text, ' ')) — single-space split,
    empty strings kept, exactly Python's str.split(' ')."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        toks = [t.split(" ") for t in batch[text_col]]
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "n_tokens": np.fromiter((len(t) for t in toks), np.int64, len(toks)),
            "n_distinct": np.fromiter((len(set(t)) for t in toks), np.int64, len(toks)),
        })

    return docs.map_batches(fn, batch_format="pandas")


def quality_scores(docs: ray.data.Dataset, text_col: str = "text",
                   id_col: str = "doc_id") -> ray.data.Dataset:
    """Quality features: char length, token count, mean token length,
    space ratio — rounded to 6dp so engine and SQL oracle agree.
    SQL mirror uses length() and replace-count arithmetic."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        texts = list(batch[text_col])
        n_chars = np.fromiter((len(t) for t in texts), np.int64, len(texts))
        n_spaces = np.fromiter((t.count(" ") for t in texts), np.int64, len(texts))
        n_tokens = n_spaces + 1
        mean_tok = np.round((n_chars - n_spaces) / n_tokens, 6)
        space_ratio = np.round(n_spaces / np.maximum(n_chars, 1), 6)
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "n_chars": n_chars, "n_tokens": n_tokens,
            "mean_token_len": mean_tok, "space_ratio": space_ratio})

    return docs.map_batches(fn, batch_format="pandas")


def _count_padded(text: str, word: str) -> int:
    """Occurrences of word as a standalone token — count of ' word '
    inside ' text ' (the replace-length trick, identical in SQL)."""
    padded = f" {text} "
    needle = f" {word} "
    return (len(padded) - len(padded.replace(needle, ""))) // len(needle)


def lang_id(docs: ray.data.Dataset, text_col: str = "text",
            id_col: str = "doc_id") -> ray.data.Dataset:
    """n-gram-heuristic language ID: argmax of per-language marker-word
    hit counts; ties break on language code order; zero hits → 'und'.
    Output (doc_id, lang_pred, hits)."""
    langs = sorted(LANG_MARKERS)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        preds, hits = [], []
        for t in batch[text_col]:
            best_lang, best = "und", 0
            for lg in langs:
                c = sum(_count_padded(t, w) for w in LANG_MARKERS[lg])
                if c > best:
                    best, best_lang = c, lg
            preds.append(best_lang)
            hits.append(best)
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             "lang_pred": preds,
                             "hits": np.asarray(hits, np.int64)})

    return docs.map_batches(fn, batch_format="pandas")


def rolling_fingerprints(docs: ray.data.Dataset, window: int = 16,
                         text_col: str = "text", id_col: str = "doc_id",
                         ) -> ray.data.Dataset:
    """Winnowing-style document fingerprint: min 64-bit rolling-window
    hash (content-defined; robust to token reorder at window scale).
    Output (doc_id, fp)."""

    # polynomial window hash, one vectorized pass per doc: bytes →
    # sliding windows → dot with base powers (uint64 wraparound) →
    # splitmix64 finalizer → min.  No per-offset Python/md5 loop.
    powers = (np.uint64(1099511628211)
              ** np.arange(window - 1, -1, -1, dtype=np.uint64))

    def mix(h: np.ndarray) -> np.ndarray:
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return h ^ (h >> np.uint64(31))

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        fps = np.empty(len(batch), np.int64)
        for i, t in enumerate(batch[text_col]):
            data = np.frombuffer(t.encode(), dtype=np.uint8)
            if len(data) <= window:
                h = mix(np.array([np.uint64(len(data))
                                  + (data.astype(np.uint64) * powers[-len(data):]
                                     ).sum() if len(data) else np.uint64(0)]))
                fps[i] = int(h[0] >> np.uint64(1))
                continue
            win = np.lib.stride_tricks.sliding_window_view(
                data, window).astype(np.uint64)
            h = mix((win * powers[None, :]).sum(axis=1))
            fps[i] = int(h.min() >> np.uint64(1))
        return pd.DataFrame({id_col: batch[id_col].to_numpy(), "fp": fps})

    return docs.map_batches(fn, batch_format="pandas")


def winnowing_fingerprints(docs: ray.data.Dataset, k: int = 5,
                           window: int = 4, hash_fn: str = "uni",
                           text_col: str = "text", id_col: str = "doc_id",
                           ) -> ray.data.Dataset:
    """Winnowing fingerprint SELECTION (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every character ``k``-gram,
    then in each sliding window of ``window`` consecutive hashes keep
    the minimum (ties → RIGHTMOST, the paper's deterministic rule).
    Output is the distinct selected (doc_id, pos, fp) fingerprints —
    pos is the 1-based gram offset, matching SQL ``substr``.

    Guarantee: any two documents sharing a substring of length
    ``window + k - 1`` or more share at least one selected fingerprint,
    while only ~2/(window+1) of all grams are kept — the standard
    plagiarism/near-dup index at corpus scale (fingerprints are tiny,
    so the downstream self-join shuffles a fraction of the gram count).

    ``hash_fn='uni'`` (scale path) byte-packs each k-gram into an
    injective uint64, fully vectorized per doc; ``'md5'`` hashes the
    gram string via md5 lower-64 — DuckDB ``md5_number_lower``'s exact
    value, which is what makes the bit-exact SQL twin possible
    (the MinHasher md5-mode convention).  Selection positions are
    identical between the two modes only when hashes order the same
    way, so the oracle runs md5 mode.

    Docs shorter than ``k`` contribute one whole-text gram at pos 1.
    Reference analogue: city2graph has no fingerprint op; this extends
    the dedup family (SURVEY §2 extensions) like rolling_fingerprints.
    """
    from city2graph_ray.text.dedup import _md5_lower64

    if window < 1 or k < 1:
        raise ValueError("k and window must be >= 1")
    powers = (np.uint64(256) ** np.arange(k - 1, -1, -1, dtype=np.uint64))

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out_id: list[np.ndarray] = []
        out_pos: list[np.ndarray] = []
        out_fp: list[np.ndarray] = []
        for did, text in zip(batch[id_col].to_numpy(np.int64),
                             batch[text_col]):
            n = len(text) - k + 1
            if n < 1:
                h = _md5_lower64([text]) if hash_fn == "md5" else np.array(
                    [int.from_bytes(
                        hashlib.md5(text.encode()).digest()[8:16], "little")],
                    dtype=np.uint64)
                n = 1
            elif hash_fn == "md5":
                h = _md5_lower64(text[i:i + k] for i in range(n))
            else:
                b = np.frombuffer(text.encode(), dtype=np.uint8)
                win = np.lib.stride_tricks.sliding_window_view(
                    b, k).astype(np.uint64)
                h = (win * powers[None, :]).sum(axis=1)
            w = min(window, n)
            sw = np.lib.stride_tricks.sliding_window_view(h, w)
            # rightmost min: argmin over the reversed window is the
            # offset from the right end
            rev = sw[:, ::-1].argmin(axis=1)
            sel = np.unique(np.arange(n - w + 1) + (w - 1 - rev))
            out_id.append(np.full(len(sel), did, np.int64))
            out_pos.append(sel.astype(np.int64) + 1)
            out_fp.append(h[sel])
        if not out_id:
            return pd.DataFrame({id_col: np.array([], np.int64),
                                 "pos": np.array([], np.int64),
                                 "fp": np.array([], np.uint64)})
        return pd.DataFrame({id_col: np.concatenate(out_id),
                             "pos": np.concatenate(out_pos),
                             "fp": np.concatenate(out_fp)})

    return docs.map_batches(fn, batch_format="pandas")


# ------------------------------------------------------------------ vocabulary / TF-IDF / sampling

def _explode_tokens(batch: pd.DataFrame, text_col: str,
                    id_col: str) -> pd.DataFrame:
    """(doc_id, token, tf): lowercase whitespace-run tokens with per-doc
    term frequency.  SQL mirror: unnest(regexp_split_to_array(lower(text),
    '\\s+')) with empty tokens dropped — identical to Python
    ``str.lower().split()``."""
    toks = batch[text_col].str.lower().str.split()
    ex = pd.DataFrame({id_col: batch[id_col].to_numpy()}).join(
        toks.rename("token").reset_index(drop=True)).explode("token")
    ex = ex[ex["token"].notna() & (ex["token"] != "")]
    tf = (ex.groupby([id_col, "token"], sort=False).size()
          .rename("tf").reset_index())
    return tf


def token_topk(docs: ray.data.Dataset, k: int = 20,
               text_col: str = "text", id_col: str = "doc_id",
               ) -> ray.data.Dataset:
    """Corpus-wide heavy hitters: the ``k`` most frequent tokens,
    deterministic tie-break (count DESC, token ASC).  Output
    (token, cnt).

    Scale shape: per-batch partial counts (bytes moved ∝ distinct
    tokens per batch, not corpus tokens) → keyed ``group_agg`` sum →
    per-block top-k partials → one tiny global merge.  No vocabulary
    materialization on the driver beyond k rows."""
    from city2graph_ray import shuffle

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].str.lower().str.split().explode()
        toks = toks[toks.notna() & (toks != "")]
        vc = toks.value_counts()
        return pd.DataFrame({"token": vc.index.to_numpy(dtype=object),
                             "cnt": vc.to_numpy(dtype=np.int64)})

    counts = shuffle.group_agg(docs.map_batches(partial,
                                                batch_format="pandas"),
                               ["token"], {"cnt": ("cnt", "sum")},
                               partial=False)

    def block_topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["cnt", "token"],
                             ascending=[False, True]).head(k)

    merged = (counts.map_batches(block_topk, batch_format="pandas")
              .to_pandas()
              .sort_values(["cnt", "token"], ascending=[False, True])
              .head(k).reset_index(drop=True))
    return ray.data.from_pandas(merged)


def tfidf_top_terms(docs: ray.data.Dataset, m: int = 3,
                    text_col: str = "text", id_col: str = "doc_id",
                    round_to: int = 6,
                    num_buckets: int | None = None) -> ray.data.Dataset:
    """Per-document top-``m`` TF-IDF terms (smoothed sklearn-style
    idf = ln((N+1)/(df+1)) + 1; score = tf·idf), deterministic
    tie-break (score DESC, token ASC).  Output (doc_id, token, score)
    with score rounded to ``round_to``.

    Scale shape: token explode with per-doc tf (one pass), document
    frequency via keyed ``group_agg`` (no vocabulary broadcast), idf
    joined back by token with a bucketed hash join, per-doc top-m via
    the distributed ``topk_in_group`` — every stage streams."""
    from city2graph_ray import shuffle
    from city2graph_ray.joins import bucketed_join

    nb = num_buckets or shuffle.DEFAULT_BUCKETS
    n_docs = docs.count()

    tok = docs.map_batches(
        lambda b: _explode_tokens(b, text_col, id_col),
        batch_format="pandas")
    dfreq = shuffle.group_agg(tok, ["token"], {"df": (id_col, "size")},
                              num_buckets=nb)
    joined = bucketed_join(tok, dfreq, on="token", num_buckets=nb)

    def score_fn(b: pd.DataFrame) -> pd.DataFrame:
        s = b["tf"].to_numpy(np.float64) * (
            np.log((n_docs + 1.0) / (b["df"].to_numpy(np.float64) + 1.0))
            + 1.0)
        out = b[[id_col, "token"]].copy()
        out["score"] = s
        return out

    scored = joined.map_batches(score_fn, batch_format="pandas")
    top = shuffle.topk_in_group(scored, [id_col], m,
                                order_cols=["score", "token"],
                                ascending=[False, True],
                                num_buckets=nb)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["score"] = np.round(b["score"].to_numpy(np.float64), round_to)
        return b

    return top.map_batches(finish, batch_format="pandas")


def hash_sample(docs: ray.data.Dataset, rate: float = 0.1,
                id_col: str = "doc_id") -> ray.data.Dataset:
    """Deterministic id-keyed sample: keeps a row iff
    ``((id % P) * A % P) % 10000 < rate * 10000`` with P = 1e9+7,
    A = 2654435761 — overflow-free in int64 for any id, reproducible
    bit-for-bit in ANSI SQL (the oracle runs the same arithmetic), and
    stable under resharding/restarts (pure function of the id).  The
    SQL-friendly alternative to ``Dataset.random_sample``."""
    P = np.int64(1_000_000_007)
    A = np.int64(2_654_435_761 % 1_000_000_007)
    thresh = np.int64(int(round(rate * 10000)))

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy().astype(np.int64)
        h = ((ids % P) * A) % P % np.int64(10000)
        return batch[h < thresh]

    return docs.map_batches(fn, batch_format="pandas")


def repetition_scores(docs: ray.data.Dataset, n: int = 2,
                      text_col: str = "text", id_col: str = "doc_id",
                      round_to: int = 6) -> ray.data.Dataset:
    """Within-document repetition features over word-``n``-grams (the
    Gopher/MassiveText repetition filters): per doc,

    - ``n_grams``       — total n-gram occurrences,
    - ``dup_gram_frac`` — 1 − distinct/total (fraction of occurrences
      that repeat an earlier gram),
    - ``top_gram_frac`` — occurrences of the most frequent gram / total.

    Docs shorter than ``n`` tokens emit zeros with ``n_grams = 0``.
    Row-local (no shuffle); gram counting is one lexsort + run-length
    pass over the batch's flat token array — no per-row Python.  Both
    fractions round to ``round_to`` so the SQL twin (exploded
    ``array_to_string(ts[i:i+n-1], ' ')`` + count distinct / max
    count) matches bit-for-bit."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].str.split(" ")
        counts = toks.str.len().to_numpy(np.int64)
        flat = pd.Series(toks.explode().to_numpy(dtype=object))
        doc_idx = np.repeat(np.arange(len(batch)), counts)
        gram = flat.copy()
        for j in range(1, n):
            gram = gram + (" " + flat.shift(-j))
        m = len(flat) - (n - 1)
        ok = (doc_idx[:m] == doc_idx[n - 1:]) if m > 0 else \
            np.zeros(0, bool)
        gidx = np.flatnonzero(ok)
        g_doc = doc_idx[gidx]
        codes, _ = pd.factorize(gram.to_numpy(dtype=object)[gidx])
        total = np.bincount(g_doc, minlength=len(batch)).astype(np.int64)
        # run-length stats per (doc, gram)
        order = np.lexsort((codes, g_doc))
        gd, gc = g_doc[order], codes[order]
        new_run = np.ones(len(gd), dtype=bool)
        new_run[1:] = (gd[1:] != gd[:-1]) | (gc[1:] != gc[:-1])
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        run_doc = gd[new_run]
        distinct = np.bincount(run_doc, minlength=len(batch)).astype(np.int64)
        top = np.zeros(len(batch), dtype=np.int64)
        np.maximum.at(top, run_doc, run_len)
        tot_f = np.maximum(total, 1).astype(np.float64)
        dup = np.round((total - distinct) / tot_f, round_to)
        topf = np.round(np.where(total > 0, top, 0) / tot_f, round_to)
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             "n_grams": total,
                             "dup_gram_frac": dup,
                             "top_gram_frac": topf})

    return docs.map_batches(fn, batch_format="pandas")


def unigram_logprob(docs: ray.data.Dataset, text_col: str = "text",
                    id_col: str = "doc_id",
                    round_to: int = 6) -> ray.data.Dataset:
    """Per-doc mean unigram log-likelihood under the corpus's own
    unigram distribution (the classic LM-quality proxy used by CCNet /
    Gopher-style filters, with the corpus itself as the model).

    Two passes over the stream:

    1. corpus token counts — per-batch ``factorize`` + ``bincount``
       partials merged by a keyed :func:`shuffle.group_agg` (shuffle
       bytes ∝ vocabulary per block, not corpus size);
    2. the vocabulary table (small by Heaps' law even at 100 TB) is
       broadcast once via ``ray.put`` and each batch scores its docs
       with one vectorized ``Index.get_indexer`` lookup + segmented
       mean.

    Output (id_col, n_tokens, logprob) with ``logprob = avg(ln(c/s))``
    rounded to ``round_to`` — exactly the DuckDB twin's
    ``round(avg(ln(c / s)), 6)``."""
    from city2graph_ray import shuffle

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].str.split(" ")
        flat = toks.explode().to_numpy(dtype=object)
        codes, uniq = pd.factorize(flat)
        return pd.DataFrame({"token": uniq.astype(object),
                             "c": np.bincount(codes).astype(np.int64)})

    vocab = shuffle.group_agg(
        docs.map_batches(partial_counts, batch_format="pandas"),
        ["token"], {"c": ("c", "sum")}).to_pandas()
    total = float(vocab["c"].sum())
    logp = np.log(vocab["c"].to_numpy(np.float64) / total)
    vocab_ref = ray.put((pd.Index(vocab["token"]), logp))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        index, lp = ray.get(vocab_ref)
        toks = batch[text_col].str.split(" ")
        counts = toks.str.len().to_numpy(np.int64)
        flat = toks.explode().to_numpy(dtype=object)
        doc_idx = np.repeat(np.arange(len(batch)), counts)
        pos = index.get_indexer(flat)
        sums = np.bincount(doc_idx, weights=lp[pos], minlength=len(batch))
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "n_tokens": counts,
            "logprob": np.round(sums / np.maximum(counts, 1), round_to)})

    return docs.map_batches(score, batch_format="pandas")


DEFAULT_BLOCKLIST: tuple[str, ...] = ("spark",)


def heuristic_filter(docs: ray.data.Dataset,
                     min_words: int = 20, max_words: int = 10_000,
                     min_mwl: float = 2.0, max_mwl: float = 12.0,
                     blocklist: Sequence[str] = DEFAULT_BLOCKLIST,
                     text_col: str = "text", id_col: str = "doc_id",
                     emit: str = "features") -> ray.data.Dataset:
    """C4-style heuristic quality gate: word-count bounds, mean-word-
    length bounds and a bad-word blocklist (padded-substring match, so
    the SQL twin is ``position(' w ' IN ' ' || text || ' ')``).
    Row-local, fully vectorized.  With ``emit="features"`` (default)
    emits every doc with its features and the boolean verdict —
    (id_col, n_words, mean_word_len, blocked, kept) — so downstream
    stages can filter on ``kept`` or audit the reasons; with
    ``emit="docs"`` emits the SURVIVING input rows unchanged (the
    composable-pipeline form)."""
    if emit not in ("features", "docs"):
        raise ValueError(f"unknown emit mode {emit!r}")

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col]
        n_chars = texts.str.len().to_numpy(np.int64)
        n_spaces = texts.str.count(" ").to_numpy(np.int64)
        n_words = n_spaces + 1
        mwl = np.round((n_chars - n_spaces) / n_words, 6)
        padded = " " + texts + " "
        blocked = np.zeros(len(batch), dtype=bool)
        for w in blocklist:
            blocked |= padded.str.contains(f" {w} ", regex=False).to_numpy()
        kept = ((n_words >= min_words) & (n_words <= max_words)
                & (mwl >= min_mwl) & (mwl <= max_mwl) & ~blocked)
        if emit == "docs":
            return batch.loc[kept]
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             "n_words": n_words, "mean_word_len": mwl,
                             "blocked": blocked, "kept": kept})

    return docs.map_batches(fn, batch_format="pandas")


def stratified_sample(docs: ray.data.Dataset, strata: Sequence[str],
                      n: int, id_col: str = "doc_id",
                      num_buckets: int | None = None) -> ray.data.Dataset:
    """Deterministic per-stratum sample: for each distinct ``strata``
    key, the ``n`` rows whose md5 rank-hash of the id is smallest
    (tie-broken by id).  Output (strata..., id_col) — a uniform,
    reshard-stable, bit-reproducible sample per group, the stratified
    companion to :func:`hash_sample`.

    The rank hash is DuckDB ``md5_number_lower(CAST(id AS VARCHAR))``
    bit-for-bit, so the operator is exactly SQL-oracle-able
    (``row_number() OVER (PARTITION BY strata ORDER BY hash, id)``).

    Scale shape: each batch pre-prunes to its LOCAL per-stratum top-n
    (shuffle bytes ∝ strata × n per batch, not corpus size), then one
    keyed ``topk_in_group`` merge."""
    import hashlib

    from city2graph_ray import shuffle

    strata = list(strata)
    nb = num_buckets or shuffle.DEFAULT_BUCKETS
    cols = strata + [id_col]

    def rank(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:16],
                            "little") for i in ids),
            dtype=np.uint64, count=len(ids))
        out = batch[cols].copy()
        # uint64 order == int64 order after flipping the sign bit
        out["__h"] = (h ^ np.uint64(1 << 63)).view(np.int64)
        out = out.sort_values(["__h", id_col], kind="stable")
        return out.groupby(strata, sort=False).head(n)

    pruned = docs.map_batches(rank, batch_format="pandas")
    top = shuffle.topk_in_group(pruned, strata, n,
                                order_cols=["__h", id_col],
                                ascending=[True, True], num_buckets=nb)
    return top.map_batches(lambda b: b[cols], batch_format="pandas")


def bm25_topk(docs: ray.data.Dataset, terms: "list[str]", k: int = 20,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id",
              round_to: int = 6) -> ray.data.Dataset:
    """Global BM25 ranked retrieval: score every document against a
    small query-term set and return the top-``k``.  Lucene-form IDF
    ``ln((N - df + 0.5)/(df + 0.5) + 1)`` (always positive) with the
    standard tf saturation ``tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl))``
    (Robertson & Zaragoza 2009 — public literature).

    Two streaming passes:

    1. corpus statistics — per-batch partials for N, Σdl and per-term
       document frequency (|terms| rows per block, merged on the
       driver: the only driver state is ~|terms| scalars);
    2. scoring — the (terms → idf, avgdl) table is a handful of
       floats broadcast in the task closure; each batch computes its
       doc×term tf matrix with one factorized bincount and emits
       (id, score) for docs matching ≥1 term.

    Scores round to ``round_to`` BEFORE ranking, so the global top-k —
    per-block partial top-k, then a k·blocks-row driver merge, never a
    global sort — breaks ties on (score DESC, id ASC) exactly like the
    DuckDB twin's QUALIFY row_number().  Output (rank, id, score).
    """
    terms = list(terms)
    t_index = pd.Index(terms)
    nt = len(terms)

    def stat_partials(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].str.split(" ")
        counts = toks.str.len().to_numpy(np.int64)
        flat = toks.explode().to_numpy(dtype=object)
        doc_idx = np.repeat(np.arange(len(batch)), counts)
        pos = t_index.get_indexer(flat)
        m = pos >= 0
        df_p = np.zeros(nt, np.int64)
        if m.any():
            hit = np.unique(doc_idx[m] * nt + pos[m])
            df_p = np.bincount(hit % nt, minlength=nt).astype(np.int64)
        return pd.DataFrame({
            "i": np.arange(nt + 1, dtype=np.int64),
            "v1": np.concatenate([[np.int64(len(batch))], df_p]),
            "v2": np.concatenate([[counts.sum()],
                                  np.zeros(nt, np.int64)])})

    st = (docs.map_batches(stat_partials, batch_format="pandas")
          .to_pandas().groupby("i", sort=True).sum())
    n_docs = int(st.loc[0, "v1"])
    avgdl = float(st.loc[0, "v2"]) / n_docs
    df = st["v1"].to_numpy(np.int64)[1:]
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].str.split(" ")
        counts = toks.str.len().to_numpy(np.int64)
        flat = toks.explode().to_numpy(dtype=object)
        doc_idx = np.repeat(np.arange(len(batch)), counts)
        pos = t_index.get_indexer(flat)
        m = pos >= 0
        tf = np.bincount(doc_idx[m] * nt + pos[m],
                         minlength=len(batch) * nt
                         ).reshape(len(batch), nt).astype(np.float64)
        dl = counts.astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * (dl / avgdl))[:, None]
        contrib = idf[None, :] * tf * (k1 + 1.0) / denom
        s = np.round(contrib.sum(axis=1), round_to)
        hitdoc = tf.sum(axis=1) > 0
        return (pd.DataFrame({id_col: batch[id_col].to_numpy(),
                              "score": s})[hitdoc]
                .sort_values(["score", id_col], ascending=[False, True])
                .head(k))

    top = (docs.map_batches(score, batch_format="pandas").to_pandas()
           .sort_values(["score", id_col], ascending=[False, True])
           .head(k).reset_index(drop=True))
    top.insert(0, "rank", np.arange(1, len(top) + 1, dtype=np.int64))
    return ray.data.from_pandas(top)


def weighted_sample(docs: ray.data.Dataset, k: int,
                    weight_col: str = "n_chars",
                    id_col: str = "doc_id") -> ray.data.Dataset:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006, public literature): each row gets the
    exponential key ``-ln(u)/w`` with ``u`` derived from the md5
    rank-hash of the id (same ``md5_number_lower`` convention as
    :func:`stratified_sample`, shifted by +0.5 so u ∈ (0,1)), and the
    ``k`` SMALLEST keys win — a reshard-stable, bit-reproducible
    weighted sample (inclusion probability ∝ ``weight_col``).  Output
    ``(rank, id, w)``.

    Scale shape: each batch prunes to its local k smallest keys
    (shuffle bytes ∝ k per block), the driver merges k×blocks rows —
    the same partial-top-k merge as bm25/ann.  The SQL twin replays
    the identical arithmetic (`-ln((md5_number_lower+0.5)/2^64)/w`)
    under ``QUALIFY row_number()``."""
    import hashlib

    if k <= 0:
        raise ValueError("k must be positive")

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:16],
                            "little") for i in ids),
            dtype=np.uint64, count=len(ids))
        w = batch[weight_col].to_numpy(np.float64)
        u = (h.astype(np.float64) + 0.5) / 18446744073709551616.0
        key = -np.log(u) / w
        return (pd.DataFrame({id_col: ids, "w": batch[weight_col]
                              .to_numpy(), "__key": key})
                .sort_values(["__key", id_col]).head(k))

    top = (docs.map_batches(score, batch_format="pandas").to_pandas()
           .sort_values(["__key", id_col]).head(k)
           .reset_index(drop=True))
    out = top[[id_col, "w"]].copy()
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return ray.data.from_pandas(out)


def bigram_lift(docs: ray.data.Dataset, k: int = 50, min_count: int = 5,
                text_col: str = "text", id_col: str = "doc_id",
                ) -> ray.data.Dataset:
    """Collocation mining: the ``k`` adjacent-token bigrams with the
    highest pointwise lift  ``p(x,y) / (p(x) p(y))  =
    (c_xy · N_uni²) / (N_big · c_x · c_y)``, with ``c_xy ≥ min_count``.
    Output ``(w1, w2, cxy, lift)``, ordered (lift DESC, w1, w2).

    Bit-exact: every count is an int64 keyed sum; the lift is ONE
    fixed-order float expression — ``((cxy·Nu)·Nu) / ((Nb·cx)·cy)``
    with each operand an exactly-representable integer — identical in
    IEEE terms to the SQL twin's parenthesized form.

    Scale shape: bigram and unigram counting are partial-aggregated
    keyed sums (bytes ∝ distinct grams per batch); the two corpus
    totals are single scalars; unigram counts re-attach to the bigram
    table via two bucketed hash joins on the word; final top-k is a
    native sort over the (already vocabulary-sized) bigram-count
    table.  The corpus text never shuffles.
    """
    from city2graph_ray.joins import bucketed_join

    def grams(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].str.lower().str.split()
        lens = toks.str.len().to_numpy(np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"w1": pd.Series([], dtype=object),
                                 "w2": pd.Series([], dtype=object)})
        flat = np.concatenate([np.asarray(t, dtype=object)
                               for t in toks.to_numpy()])
        doc_ix = np.repeat(np.arange(len(lens)), lens)
        same = doc_ix[:-1] == doc_ix[1:]
        return pd.DataFrame({"w1": flat[:-1][same], "w2": flat[1:][same]})

    def unis(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].str.lower().str.split()
        lens = toks.str.len().to_numpy(np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"w": pd.Series([], dtype=object)})
        return pd.DataFrame({"w": np.concatenate(
            [np.asarray(t, dtype=object) for t in toks.to_numpy()])})

    big = docs.map_batches(grams, batch_format="pandas")
    uni = docs.map_batches(unis, batch_format="pandas")
    # both count tables fan out (scalar total + join) — pin them once;
    # they are vocabulary-sized, not corpus-sized
    bcnt = shuffle.group_agg(big, ["w1", "w2"],
                             {"cxy": ("w1", "size")}).materialize()
    ucnt = shuffle.group_agg(uni, ["w"], {"c": ("w", "size")}).materialize()

    totals = ucnt.map_batches(
        lambda b: pd.DataFrame({"nu": [b["c"].sum()]}),
        batch_format="pandas").to_pandas()
    nu = float(totals["nu"].sum())
    nb_tbl = bcnt.map_batches(
        lambda b: pd.DataFrame({"nb": [b["cxy"].sum()]}),
        batch_format="pandas").to_pandas()
    nb = float(nb_tbl["nb"].sum())

    cand = bcnt.filter(expr=f"cxy >= {int(min_count)}")
    j1 = bucketed_join(
        cand, ucnt.map_batches(
            lambda b: b.rename(columns={"w": "w1", "c": "c1"}),
            batch_format="pandas"), on="w1")
    j2 = bucketed_join(
        j1, ucnt.map_batches(
            lambda b: b.rename(columns={"w": "w2", "c": "c2"}),
            batch_format="pandas"), on="w2")

    def score(b: pd.DataFrame) -> pd.DataFrame:
        cxy = b["cxy"].to_numpy(np.float64)
        c1 = b["c1"].to_numpy(np.float64)
        c2 = b["c2"].to_numpy(np.float64)
        out = b[["w1", "w2", "cxy"]].copy()
        out["lift"] = ((cxy * nu) * nu) / ((nb * c1) * c2)
        return out

    scored = j2.map_batches(score, batch_format="pandas")
    top = scored.sort(["lift", "w1", "w2"],
                      descending=[True, False, False]).limit(k)
    return top


def dsir_logratio(docs: ray.data.Dataset, target: ray.data.Dataset,
                  text_col: str = "text", id_col: str = "doc_id",
                  round_to: int = 6) -> ray.data.Dataset:
    """Data-Selection-with-Importance-Resampling weights (Xie et al.,
    "Data Selection for Language Models via Importance Resampling",
    NeurIPS 2023 — unigram variant): per doc the mean token
    log-importance-ratio  ``ln( p_target(w) / p_raw(w) )`` with
    add-one smoothing on the target LM over the RAW vocabulary
    (every raw token has c_raw ≥ 1 by construction).  Docs scoring
    high look like the target distribution — feed the output to
    ``weighted_sample`` / ``quantile_threshold_filter`` to finish the
    resampling step.

    Same scale shape as :func:`unigram_logprob`: two partial-combined
    keyed count passes (bytes ∝ vocabulary per block), one merged
    vocab table broadcast via ``ray.put`` (Heaps-law small), corpus
    scored streaming with a vectorized indexer lookup.  Output
    ``(id_col, n_tokens, dsir_logratio)`` rounded to ``round_to`` —
    the documented tolerance that absorbs float summation-order noise
    exactly like the SQL twin's ``round(avg(...), 6)``."""
    from city2graph_ray import shuffle

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].str.split(" ")
        flat = toks.explode().to_numpy(dtype=object)
        codes, uniq = pd.factorize(flat)
        return pd.DataFrame({"token": uniq.astype(object),
                             "c": np.bincount(codes).astype(np.int64)})

    raw = shuffle.group_agg(
        docs.map_batches(partial_counts, batch_format="pandas"),
        ["token"], {"c": ("c", "sum")}).to_pandas()
    tgt = shuffle.group_agg(
        target.map_batches(partial_counts, batch_format="pandas"),
        ["token"], {"c": ("c", "sum")}).to_pandas()

    sr = float(raw["c"].sum())
    st = float(tgt["c"].sum())
    v = float(len(raw))
    merged = raw.merge(tgt.rename(columns={"c": "ct"}), on="token",
                       how="left")
    cr = merged["c"].to_numpy(np.float64)
    ct = merged["ct"].fillna(0).to_numpy(np.float64)
    lr = np.log(((ct + 1.0) / (st + v)) / (cr / sr))
    vocab_ref = ray.put((pd.Index(merged["token"]), lr))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        index, w = ray.get(vocab_ref)
        toks = batch[text_col].str.split(" ")
        counts = toks.str.len().to_numpy(np.int64)
        flat = toks.explode().to_numpy(dtype=object)
        doc_idx = np.repeat(np.arange(len(batch)), counts)
        pos = index.get_indexer(flat)
        sums = np.bincount(doc_idx, weights=w[pos], minlength=len(batch))
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "n_tokens": counts,
            "dsir_logratio": np.round(sums / np.maximum(counts, 1),
                                      round_to)})

    return docs.map_batches(score, batch_format="pandas")


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_counts(docs: ray.data.Dataset, text_col: str = "text",
                     id_col: str = "doc_id") -> ray.data.Dataset:
    """BPE-ish pre-tokenizer counts: letter runs, digit runs and
    punctuation runs (the ASCII skeleton of the GPT-2 pre-tokenizer
    regex, kept lookaround-free so RE2/DuckDB reproduce it verbatim).
    One vectorized ``str.count`` per batch.  Output
    ``(id_col, n_bpe_tokens)`` — SQL twin
    ``len(regexp_extract_all(text, pattern))``."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "n_bpe_tokens": batch[text_col].astype(str)
                .str.count(BPE_ISH_PATTERN).to_numpy(np.int64)})

    return docs.map_batches(fn, batch_format="pandas")


def inverted_index(docs: ray.data.Dataset, min_df: int = 1,
                   text_col: str = "text", id_col: str = "doc_id",
                   num_buckets: int = shuffle.DEFAULT_BUCKETS,
                   ) -> ray.data.Dataset:
    """Inverted index: per term, its document frequency and the
    ascending-id postings list (comma-joined string — a stable,
    engine-portable surface for the list).  ``min_df`` prunes the
    hapax tail.  Tokenization = single-space split (the module's
    shared convention, SQL mirror ``string_split(text, ' ')``).

    Scale shape: per-doc DISTINCT terms emit (term, doc_id) pairs —
    one shuffle keyed by term; a Zipfian head term concentrates its
    postings in one group, which is inherent to the output (its
    postings list IS that large) — cap consumers should filter by
    ``n_docs`` upstream of any driver collect."""
    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        toks = [sorted(set(t.split(" "))) for t in b[text_col]]
        counts = np.fromiter((len(t) for t in toks), np.int64,
                             len(toks))
        return pd.DataFrame({
            "term": np.concatenate(toks) if len(toks) else
            np.array([], object),
            id_col: np.repeat(b[id_col].to_numpy(), counts)})

    pair_ds = docs.map_batches(pairs, batch_format="pandas")

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", id_col], kind="stable")
        agg = g.groupby("term", sort=False)[id_col].agg(
            n_docs="size",
            postings=lambda s: ",".join(map(str, s)))
        agg = agg.reset_index()
        agg["n_docs"] = agg["n_docs"].astype(np.int64)
        return agg[agg["n_docs"] >= min_df]

    return shuffle.grouped_transform(pair_ds, ["term"], kernel,
                                     num_buckets=num_buckets)


def readability_counts(docs: ray.data.Dataset, text_col: str = "text",
                       long_len: int = 7) -> ray.data.Dataset:
    """Flesch-style readability RAW COUNTS per document: words
    (``[A-Za-z0-9]+`` runs), sentences (``[.!?]+`` runs), vowel groups
    (``[aeiou]+`` runs over the lowercased text — the standard cheap
    syllable proxy) and long words (alnum runs of ≥ ``long_len``
    chars).  All int64 so the gate twin (DuckDB
    ``len(regexp_extract_all(...))``) is bit-exact; the float
    Flesch/LIX score is a trivial client-side formula over these
    counts.

    Embarrassingly parallel: one vectorized ``str.count`` pass per
    batch (compiled RE2-compatible patterns, non-overlapping match
    semantics in both engines), no shuffle.
    """
    word_re = r"[A-Za-z0-9]+"
    sent_re = r"[.!?]+"
    vowel_re = r"[aeiou]+"
    long_re = r"[A-Za-z0-9]{%d,}" % long_len

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].astype(str)
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(np.int64),
            "n_words": t.str.count(word_re).to_numpy(np.int64),
            "n_sentences": t.str.count(sent_re).to_numpy(np.int64),
            "n_vowel_groups":
                t.str.lower().str.count(vowel_re).to_numpy(np.int64),
            "n_long_words": t.str.count(long_re).to_numpy(np.int64)})

    return docs.map_batches(fn, batch_format="pandas")


def zipf_fit(docs: ray.data.Dataset, top_r: int = 1000,
             quant: int = 100_000, text_col: str = "text",
             num_buckets: int = shuffle.DEFAULT_BUCKETS,
             ) -> ray.data.Dataset:
    """Zipf's-law head fit (Zipf 1949, public literature): OLS of
    ln(frequency) on ln(rank) over the ``top_r`` most frequent tokens
    (whitespace tokenization, count DESC / token ASC rank order).
    Output: one row ``(n_terms, slope, intercept)``.

    Bit-exactness: both logs are quantized ONCE per term to the int64
    ``floor(ln(v)·quant + 0.5)`` (the same libm-parity contract the
    bm25 / adamic-adar twins rely on), the five OLS moments are int64
    sums over ≤ ``top_r`` rows, and slope/intercept are a fixed two-op
    float expression over the moments — mirrored verbatim in SQL.

    Scale: per-batch partial token counts → keyed sum (bytes ∝
    distinct tokens per batch); the global (count, token) rank is
    :func:`shuffle.global_row_number` over the VOCABULARY (≪ corpus);
    only the head survives into the moment partials.
    """
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].str.lower().str.split().explode()
        toks = toks[toks.notna() & (toks != "")]
        vc = toks.value_counts()
        return pd.DataFrame({"token": vc.index.to_numpy(dtype=object),
                             "cnt": vc.to_numpy(dtype=np.int64)})

    counts = shuffle.group_agg(
        docs.map_batches(partial, batch_format="pandas"),
        ["token"], {"cnt": ("cnt", "sum")}, partial=False,
        num_buckets=num_buckets)
    ranked = shuffle.global_row_number(counts, ["cnt", "token"],
                                       descending=[True, False])

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["rn"].to_numpy(np.int64) <= top_r]
        li = np.floor(np.log(b["rn"].to_numpy(np.float64))
                      * quant + 0.5).astype(np.int64)
        ci = np.floor(np.log(b["cnt"].to_numpy(np.float64))
                      * quant + 0.5).astype(np.int64)
        return pd.DataFrame({
            "k": np.zeros(1, np.int64), "n": [len(b)],
            "sl": [int(li.sum())], "sc": [int(ci.sum())],
            "sll": [int((li * li).sum())],
            "slc": [int((li * ci).sum())]})

    m = shuffle.group_agg(
        ranked.map_batches(moments, batch_format="pandas"),
        ["k"], {"n": ("n", "sum"), "sl": ("sl", "sum"),
                "sc": ("sc", "sum"), "sll": ("sll", "sum"),
                "slc": ("slc", "sum")}, num_buckets=1).to_pandas()
    n = int(m["n"].iloc[0])
    sl, sc = int(m["sl"].iloc[0]), int(m["sc"].iloc[0])
    sll, slc = int(m["sll"].iloc[0]), int(m["slc"].iloc[0])
    slope = float(n * slc - sl * sc) / float(n * sll - sl * sl)
    intercept = (float(sc) - slope * float(sl)) / n / quant
    return ray.data.from_pandas(pd.DataFrame({
        "n_terms": np.array([n], np.int64),
        "slope": [slope], "intercept": [intercept]}))


def mixture_sample(docs: ray.data.Dataset, quotas: pd.DataFrame,
                   source_col: str = "source", id_col: str = "doc_id",
                   num_buckets: int | None = None) -> ray.data.Dataset:
    """Data-mixing sampler (the static form of DoReMi/Pile-style
    source reweighting, public literature): per source, keep the
    ``quota`` rows whose md5 rank-hash of the id is smallest (ties by
    id) — a deterministic, reshard-stable draw toward a target source
    mixture.  ``quotas``: DataFrame (source_col, quota); sources
    absent from it are dropped.  Output (source_col, id_col).

    Same rank-hash contract as :func:`stratified_sample`
    (DuckDB ``md5_number_lower(CAST(id AS VARCHAR))`` bit-for-bit).
    Scale: the quota table is mixture-weights-sized and broadcasts via
    ``ray.put``; each batch pre-prunes to its LOCAL per-source
    head(quota) so shuffle bytes ∝ sources × quota per batch, then one
    keyed per-source merge."""
    import hashlib

    from city2graph_ray import shuffle

    nb = num_buckets or shuffle.DEFAULT_BUCKETS
    qref = ray.put(quotas.set_index(source_col)["quota"])
    max_q = int(quotas["quota"].max()) if len(quotas) else 0

    def rank(batch: pd.DataFrame) -> pd.DataFrame:
        qmap = ray.get(qref)
        b = batch[batch[source_col].isin(qmap.index)]
        ids = b[id_col].to_numpy()
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:16],
                            "little") for i in ids),
            dtype=np.uint64, count=len(ids))
        out = b[[source_col, id_col]].copy()
        out["__h"] = (h ^ np.uint64(1 << 63)).view(np.int64)
        out = out.sort_values(["__h", id_col], kind="stable")
        return out.groupby(source_col, sort=False).head(max_q)

    pruned = docs.map_batches(rank, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        qmap = ray.get(qref)
        g = g.sort_values(["__h", id_col], kind="stable")
        g = g.groupby(source_col, sort=False, group_keys=False).apply(
            lambda s: s.head(int(qmap[s.name])))
        return g[[source_col, id_col]]

    return shuffle.grouped_transform(pruned, [source_col], merge,
                                     num_buckets=nb)


def lexical_diversity(docs: ray.data.Dataset, text_col: str = "text",
                      id_col: str = "doc_id") -> ray.data.Dataset:
    """Per-doc lexical diversity from within-doc token frequencies
    (single-space split, same tokenizer as :func:`token_counts`):
    hapax-legomenon count and Simpson's repeat rate
    ``Σ f_i(f_i−1) / (N(N−1))`` — the numerator and denominator are
    exact integers, the one division is rounded to 6dp, so the
    unnest+GROUP BY SQL twin is bit-exact.  Docs with < 2 tokens are
    dropped (the rate is undefined).  Pure map stage: token frequency
    is per document, so no shuffle — the explode+groupby runs
    vectorized inside each batch."""
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].str.split(" ")
        ex = pd.DataFrame({
            "__row": np.repeat(np.arange(len(batch)),
                               toks.str.len().to_numpy()),
            "__tok": list(__import__("itertools").chain.from_iterable(
                toks.tolist()))})
        f = (ex.groupby(["__row", "__tok"], sort=False).size()
             .rename("c").reset_index())
        c = f["c"].to_numpy(np.int64)
        f["__num"] = c * (c - 1)
        f["__hap"] = (c == 1).astype(np.int64)
        a = f.groupby("__row", sort=False).agg(
            n=("c", "sum"), num=("__num", "sum"),
            n_hapax=("__hap", "sum"))
        a = a.reindex(np.arange(len(batch)), fill_value=0)
        n = a["n"].to_numpy(np.int64)
        keep = n > 1
        num = a["num"].to_numpy(np.int64)[keep]
        nn = n[keep]
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy()[keep],
            "n_tokens": nn,
            "n_hapax": a["n_hapax"].to_numpy(np.int64)[keep],
            "repeat_rate": np.round(num / (nn * (nn - 1)), 6)})

    return docs.map_batches(fn, batch_format="pandas")


def chunk_documents(docs: ray.data.Dataset, size: int = 200,
                    stride: int = 150, text_col: str = "text",
                    id_col: str = "doc_id") -> ray.data.Dataset:
    """RAG-style overlapping character chunking: each non-empty doc
    emits chunks ``text[p:p+size]`` at ``p = 0, stride, 2*stride, …``
    while ``p < len(text)`` — ``(doc_id, chunk_id, chunk_pos,
    chunk)``.  Code-point slicing on both sides (DuckDB ``substr`` is
    character-addressed on UTF-8 VARCHAR, Python slices code points),
    so the generate_series twin is bit-exact.

    Embarrassingly parallel map_batches: chunk counts, repeat indices
    and offsets are vectorized; the variable-position substring
    extraction itself is a per-chunk comprehension (Arrow's
    ``utf8_slice_codeunits`` only takes scalar bounds) whose cost IS
    the output bytes — the stage stays data-bound, not Python-bound.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        texts = b[text_col].astype(str).to_numpy(object)
        ids = b[id_col].to_numpy()
        lens = np.fromiter((len(t) for t in texts), np.int64,
                           count=len(texts))
        n_chunks = np.where(lens > 0, (lens - 1) // stride + 1, 0)
        doc_idx = np.repeat(np.arange(len(texts)), n_chunks)
        total = int(n_chunks.sum())
        chunk_id = (np.arange(total)
                    - np.repeat(np.cumsum(n_chunks) - n_chunks,
                                n_chunks))
        pos = chunk_id * stride
        chunks = [texts[d][p:p + size]
                  for d, p in zip(doc_idx, pos)]
        return pd.DataFrame({
            id_col: ids[doc_idx],
            "chunk_id": chunk_id.astype(np.int64),
            "chunk_pos": pos.astype(np.int64),
            "chunk": pd.array(chunks, dtype="string")})

    return docs.map_batches(fn, batch_format="pandas")


def textrank_terms(docs: ray.data.Dataset, k: int = 20,
                   num_iters: int = 5, text_col: str = "text",
                   id_col: str = "doc_id",
                   num_buckets: int = 64) -> ray.data.Dataset:
    """TextRank keyword extraction (Mihalcea & Tarau 2004, public
    literature): PageRank over the corpus-wide token co-occurrence
    graph (adjacent lowercase whitespace tokens, both directions,
    DISTINCT pairs — the unweighted window-2 variant), top-``k``
    terms by rank with (rank DESC, term ASC) tie-break.  Node ids are
    ``md5_lower64(token) >> 1`` (DuckDB ``md5_number_lower // 2``), so
    the whole chain — explode, adjacency, the per-iteration-rounded
    PageRank, the final join-back — has a bit-exact SQL twin.

    Scale shape: adjacency explode is one vectorized map over the
    corpus; DISTINCT is one pair shuffle; PageRank reuses
    :func:`~city2graph_ray.ops.graph_algos.pagerank` (vocabulary-sized
    rank table, edge stream); the term join-back is one bucketed hash
    join and only ``k`` rows ever reach the driver."""
    from city2graph_ray import shuffle
    from city2graph_ray.joins import bucketed_join
    from city2graph_ray.ops.graph_algos import pagerank
    from city2graph_ray.text.decontam import _md5_lower64

    def explode(batch: pd.DataFrame):
        toks = batch[text_col].str.lower().str.split().explode()
        toks = toks[toks.notna()]
        return (toks.index.to_numpy(), toks.to_numpy(dtype=object))

    def adjacency(batch: pd.DataFrame) -> pd.DataFrame:
        di, tok = explode(batch)
        if len(tok) < 2:
            z = np.zeros(0, np.int64)
            return pd.DataFrame({"src": z, "dst": z})
        same = di[1:] == di[:-1]
        t1, t2 = tok[:-1][same], tok[1:][same]
        u = (_md5_lower64(t1) >> np.uint64(1)).astype(np.int64)
        v = (_md5_lower64(t2) >> np.uint64(1)).astype(np.int64)
        return pd.DataFrame({"src": np.concatenate([u, v]),
                             "dst": np.concatenate([v, u])})

    def term_map(batch: pd.DataFrame) -> pd.DataFrame:
        _, tok = explode(batch)
        uniq = pd.unique(tok)
        return pd.DataFrame({
            "node": (_md5_lower64(uniq) >> np.uint64(1))
            .astype(np.int64),
            "term": uniq.astype(object)})

    edges = shuffle.distinct(
        docs.map_batches(adjacency, batch_format="pandas"),
        ["src", "dst"], num_buckets=num_buckets).materialize()
    if edges.count() == 0:   # no co-occurrence graph at all
        return ray.data.from_pandas(pd.DataFrame(
            {"term": pd.Series(dtype=str),
             "rank": pd.Series(dtype=np.float64)}))
    ranks = pagerank(edges, num_iters=num_iters, round_to=9,
                     num_buckets=num_buckets)
    terms = shuffle.distinct(
        docs.map_batches(term_map, batch_format="pandas"),
        ["node", "term"], num_buckets=num_buckets)
    joined = bucketed_join(ranks, terms, "node",
                           num_buckets=num_buckets)

    def block_topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["rank", "term"],
                             ascending=[False, True]).head(k)

    top = (joined.map_batches(block_topk, batch_format="pandas")
           .to_pandas()
           .sort_values(["rank", "term"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    return ray.data.from_pandas(top[["term", "rank"]])


def oov_rate(docs: ray.data.Dataset, vocab_k: int = 100,
             text_col: str = "text", id_col: str = "doc_id",
             ) -> ray.data.Dataset:
    """Tokenizer-coverage screen: per-doc out-of-vocabulary rate
    against the corpus top-``vocab_k`` tokens (count DESC, token ASC
    tie-break — the :func:`token_topk` cutoff).  Output
    ``(doc_id, n_tokens, n_oov, oov_rate)``; token-less docs emit
    nothing.  Counts are exact ints, the rate is one division —
    bit-exact vs the LEFT-JOIN twin.

    Two passes: the vocabulary pass reduces to ``k`` rows (broadcast
    by closure capture), then one streaming membership map — the
    standard coverage audit before committing to a tokenizer at
    corpus scale."""
    vocab = set(token_topk(docs, vocab_k, text_col=text_col,
                           id_col=id_col).to_pandas()["token"])

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        toks = b[text_col].str.lower().str.split().explode()
        toks = toks[toks.notna() & (toks != "")]
        ids = b[id_col].to_numpy()[toks.index.to_numpy()]
        oov = (~toks.isin(vocab)).to_numpy(np.int64)
        agg = (pd.DataFrame({id_col: ids, "oov": oov})
               .groupby(id_col, sort=False)
               .agg(n_tokens=("oov", "size"), n_oov=("oov", "sum"))
               .reset_index())
        return pd.DataFrame({
            id_col: agg[id_col],
            "n_tokens": agg["n_tokens"].astype(np.int64),
            "n_oov": agg["n_oov"].astype(np.int64),
            "oov_rate": np.round(
                agg["n_oov"].to_numpy(np.int64)
                / agg["n_tokens"].to_numpy(np.int64), 6)})

    return docs.map_batches(fn, batch_format="pandas")


def cdc_chunks(docs: ray.data.Dataset, w: int = 8, div: int = 32,
               text_col: str = "text", id_col: str = "doc_id",
               ) -> ray.data.Dataset:
    """Content-defined chunking (the rolling-hash boundary scheme of
    LBFS/FastCDC, public literature): a chunk boundary opens at every
    position whose ``w``-char window hashes to ``0 (mod div)`` —
    insert/delete edits only reshuffle NEIGHBORING chunks, which is
    what makes CDC the storage/dedup chunker (vs fixed-stride
    :func:`chunk_documents`).  Hashes are ``md5_lower64`` (DuckDB
    ``md5_number_lower``), so boundaries AND per-chunk content hashes
    are bit-exact vs the SQL twin.  Output ``(doc_id, chunk_id,
    start_pos, chunk_len, chunk_h)`` — start_pos 1-based (SQL
    ``substr``), ``chunk_h = md5_lower64(chunk) // 2`` int64.
    Empty docs emit nothing; docs shorter than ``w`` are one chunk.

    Embarrassingly parallel map_batches; per-doc window hashing is
    the dominant (and inherent) cost, the same per-doc shape as
    winnowing_fingerprints."""
    import hashlib  # noqa: F401  (parity with winnowing's md5 path)

    from city2graph_ray.text.dedup import _md5_lower64

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_id": [], "chunk_id": [], "start_pos": [],
               "chunk_len": [], "chunk_h": []}
        for did, text in zip(batch[id_col].to_numpy(np.int64),
                             batch[text_col]):
            L = len(text)
            if L == 0:
                continue
            n = L - w + 1
            if n >= 2:
                h = _md5_lower64(text[i:i + w] for i in range(1, n))
                bounds = (np.where(h % np.uint64(div) == 0)[0]
                          + 1).tolist()
            else:
                bounds = []
            starts = [0] + bounds
            ends = bounds + [L]
            chunks = [text[s:e] for s, e in zip(starts, ends)]
            ch = (_md5_lower64(np.array(chunks, object))
                  >> np.uint64(1)).astype(np.int64)
            k = len(starts)
            out["doc_id"].append(np.full(k, did, np.int64))
            out["chunk_id"].append(np.arange(k, dtype=np.int64))
            out["start_pos"].append(np.asarray(starts, np.int64) + 1)
            out["chunk_len"].append(np.asarray(ends, np.int64)
                                    - np.asarray(starts, np.int64))
            out["chunk_h"].append(ch)
        if not out["doc_id"]:
            return pd.DataFrame({c: np.array([], np.int64)
                                 for c in out})
        return pd.DataFrame({c: np.concatenate(v)
                             for c, v in out.items()})

    return docs.map_batches(fn, batch_format="pandas")


def bigram_logprob(docs: ray.data.Dataset, text_col: str = "text",
                   id_col: str = "doc_id", round_to: int = 6,
                   num_buckets: int = 64) -> ray.data.Dataset:
    """Per-doc mean bigram log-likelihood under the add-one-smoothed
    corpus bigram LM: ``mean over positions of ln((c2(prev,w)+1) /
    (c1(prev)+V))`` — the KenLM-shaped quality score one level above
    :func:`unigram_logprob`.  Output ``(doc_id, n_bigrams, logprob)``;
    docs with <2 tokens emit nothing.

    Scale shape: the bigram count table is NOT broadcast (it grows
    with the corpus) — doc bigrams rejoin their counts through two
    bucketed hash joins keyed by the gram, so every stage shards by
    gram hash; only the scalar vocabulary size V crosses as a
    broadcast.  Twin: tokenize + self-join counts + avg(ln) with the
    doc_ppl rounding convention."""
    from city2graph_ray import shuffle
    from city2graph_ray.joins import bucketed_join

    def explode_bigrams(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].str.lower().str.split().explode()
        toks = toks[toks.notna()]
        di = toks.index.to_numpy()
        tok = toks.to_numpy(dtype=object)
        if len(tok) < 2:
            return pd.DataFrame({id_col: np.zeros(0, np.int64),
                                 "prev": np.array([], object),
                                 "w": np.array([], object)})
        same = di[1:] == di[:-1]
        ids = b[id_col].to_numpy(np.int64)[di[1:][same]]
        return pd.DataFrame({id_col: ids, "prev": tok[:-1][same],
                             "w": tok[1:][same]})

    def b_reset(b: pd.DataFrame) -> pd.DataFrame:
        return explode_bigrams(b.reset_index(drop=True))

    bigrams = docs.map_batches(b_reset,
                               batch_format="pandas").materialize()
    c2 = shuffle.group_agg(
        bigrams.map_batches(
            lambda b: pd.DataFrame({"prev": b["prev"], "w": b["w"],
                                    "n": np.ones(len(b), np.int64)}),
            batch_format="pandas"),
        ["prev", "w"], {"c2": ("n", "sum")}, num_buckets=num_buckets)
    c1 = shuffle.group_agg(
        bigrams.map_batches(
            lambda b: pd.DataFrame({"prev": b["prev"],
                                    "n": np.ones(len(b), np.int64)}),
            batch_format="pandas"),
        ["prev"], {"c1": ("n", "sum")}, num_buckets=num_buckets)
    # V = distinct tokens anywhere (prev or w positions = all tokens)
    vocab = shuffle.distinct(
        docs.map_batches(
            lambda b: pd.DataFrame({
                "t": b[text_col].str.lower().str.split().explode()
                .dropna().unique()}),
            batch_format="pandas"),
        ["t"], num_buckets=num_buckets)
    v = vocab.count()

    j2 = bucketed_join(bigrams, c2, ["prev", "w"],
                       num_buckets=num_buckets)
    j1 = bucketed_join(j2, c1, "prev", num_buckets=num_buckets)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        lp = np.log((b["c2"].to_numpy(np.int64) + 1)
                    / (b["c1"].to_numpy(np.int64)
                       + np.float64(v)))
        return (pd.DataFrame({id_col: b[id_col], "lp": lp,
                              "n": np.ones(len(b), np.int64)})
                .groupby(id_col, sort=False)
                .agg(s=("lp", "sum"), n=("n", "sum")).reset_index())

    agg = shuffle.group_agg(
        j1.map_batches(partial, batch_format="pandas"),
        [id_col], {"s": ("s", "sum"), "n": ("n", "sum")},
        num_buckets=num_buckets)
    return agg.map_batches(
        lambda b: pd.DataFrame({
            id_col: b[id_col].to_numpy(np.int64),
            "n_bigrams": b["n"].to_numpy(np.int64),
            "logprob": np.round(b["s"].to_numpy(np.float64)
                                / b["n"].to_numpy(np.int64),
                                round_to)}),
        batch_format="pandas")
