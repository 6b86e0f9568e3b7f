"""PII masking — a standard LLM-training-data curation stage.

Engine-added operator (no reference counterpart; the reference is a
spatial library).  Masks personally-identifying substrings (emails,
IPv4 addresses, phone-like digit runs) with typed tokens and counts
matches per document.

Scale shape: a stateless vectorized ``map_batches`` — patterns compile
once per worker process at module import, each batch is masked with
pandas' vectorized ``str.replace``/``str.count`` (C-level regex loop,
no per-row Python).  Nothing shuffles; output bytes ≈ input bytes.

The patterns deliberately avoid lookaround and unicode classes so the
same pattern strings run identically under Python ``re`` and DuckDB's
RE2 — that is what makes the driver query bit-exact against its
``regexp_replace``/``regexp_extract_all`` SQL twin.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data

# (kind, pattern, token) — applied IN ORDER, each kind counted on the
# text state left by the previous kind's replacement (the SQL twin
# nests its regexp_replace calls in the same order).
DEFAULT_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\-\s]{7,}\d", "<PHONE>"),
)

_COMPILED = {p: re.compile(p) for _, p, _ in DEFAULT_PATTERNS}


def mask_pii(docs: ray.data.Dataset, text_col: str = "text",
             patterns: tuple[tuple[str, str, str], ...] = DEFAULT_PATTERNS,
             ) -> ray.data.Dataset:
    """Mask PII in ``text_col``; adds ``{text_col}_masked`` plus an
    int64 ``n_<kind>`` match count per kind.  Original columns pass
    through untouched."""
    compiled = [(kind, _COMPILED.get(pat) or re.compile(pat), tok)
                for kind, pat, tok in patterns]

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        s = b[text_col].astype(str)
        for kind, rx, tok in compiled:
            out[f"n_{kind}"] = s.str.count(rx).to_numpy(np.int64)
            s = s.str.replace(rx, tok, regex=True)
        out[f"{text_col}_masked"] = s
        return out

    return docs.map_batches(fn, batch_format="pandas")
