"""Text normalization — the dedup-key / tokenizer pre-pass of every
corpus pipeline (C4, RefinedWeb, Gopher all normalize before hashing).

Engine-added operator (the reference is a spatial library).  Rules are
deliberately RE2-portable and SQL-mirrorable so the driver query is
bit-exact against a lower/regexp_replace/trim DuckDB twin:

- lowercase,
- whitespace runs (space, tab, CR, LF) collapse to one space,
- leading/trailing whitespace stripped,
- optional control-character removal (ASCII < 0x20 except the
  whitespace handled above).

Scale shape: stateless vectorized ``map_batches`` — pandas
``str.lower``/``str.replace`` C-regex kernels, no per-row Python, no
shuffle; output bytes ≤ input bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

WS_RX = r"[ \t\r\n]+"
CTRL_RX = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"


def normalize_text(docs: ray.data.Dataset, text_col: str = "text",
                   drop_controls: bool = True) -> ray.data.Dataset:
    """Add ``{text_col}_norm`` (normalized text) and ``norm_len``
    (its char length, int64); other columns pass through."""

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        s = b[text_col].astype(str).str.lower()
        if drop_controls:
            s = s.str.replace(CTRL_RX, "", regex=True)
        s = (s.str.replace(WS_RX, " ", regex=True)
             .str.strip(" "))
        out[f"{text_col}_norm"] = s
        out["norm_len"] = s.str.len().to_numpy(np.int64)
        return out

    return docs.map_batches(fn, batch_format="pandas")
