"""Text analysis stages: token counting, quality scoring, language ID,
rolling-hash fingerprints.  All are vectorized ``map_batches`` stages;
the heuristics are deliberately SQL-mirrorable (substring-count based)
so the DuckDB oracle can reproduce them bit-for-bit.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import ray.data

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
