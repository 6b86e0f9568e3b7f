"""Concat-and-chunk sequence packing for LLM training data.

The classic GPT-style packing: concatenate every document's tokens in
a fixed global order, slice the stream into fixed-size training
windows, and record which window(s) each document lands in.  Output is
one row per (doc, pack) overlap — ``pack_id``, ``pack_offset`` (token
offset of the doc inside the window) and ``n_tokens`` (how many of the
doc's tokens fall in that window) — enough for a loader to assemble
windows without re-reading neighbours.

Engine shape — the distributed prefix-sum (scan) pattern:

1. per-doc token counts in one vectorized pass;
2. a range sort on the id column fixes the global order (skippable for
   already-ordered input via ``assume_sorted``);
3. pass 1 reduces each ordered block to ONE partial sum (the driver
   holds #blocks integers, never rows);
4. exclusive prefix offsets over those partials are shipped back and
   pass 2 emits each block's pack spans with fully vectorized
   arithmetic (cumsum, floor-div, ragged repeat).

Token convention matches the engine's quality/token-stats ops (and
their DuckDB twins): ``n_tokens = count(' ') + 1`` ==
``len(string_split(text, ' '))``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _empty_spans(id_col: str) -> pa.Table:
    return pa.table({id_col: pa.array([], pa.int64()),
                     "pack_id": pa.array([], pa.int64()),
                     "pack_offset": pa.array([], pa.int64()),
                     "n_tokens": pa.array([], pa.int64())})


@ray.remote
def _block_sum(tbl: pa.Table, col: str) -> int:
    import pyarrow.compute as pc
    if tbl.num_rows == 0 or col not in tbl.schema.names:
        return 0
    return int(pc.sum(tbl[col]).as_py() or 0)


@ray.remote
def _emit_spans(tbl: pa.Table, offset: int, chunk: int,
                id_col: str) -> pa.Table:
    if tbl.num_rows == 0 or "__n_tokens" not in tbl.schema.names:
        return _empty_spans(id_col)
    n = tbl["__n_tokens"].to_numpy().astype(np.int64)
    ids = tbl[id_col].to_numpy()
    ends = offset + np.cumsum(n)
    starts = ends - n
    p0 = starts // chunk
    p1 = (ends - 1) // chunk
    nspan = (p1 - p0 + 1).astype(np.int64)
    ridx = np.repeat(np.arange(len(n)), nspan)
    # pack index within each doc's span run: 0..nspan-1
    runoff = np.arange(int(nspan.sum())) - np.repeat(
        np.concatenate(([0], np.cumsum(nspan)))[:-1], nspan)
    packs = p0[ridx] + runoff
    lo = np.maximum(starts[ridx], packs * chunk)
    hi = np.minimum(ends[ridx], (packs + 1) * chunk)
    return pa.table({
        id_col: pa.array(ids[ridx]),
        "pack_id": pa.array(packs.astype(np.int64)),
        "pack_offset": pa.array((lo - packs * chunk).astype(np.int64)),
        "n_tokens": pa.array((hi - lo).astype(np.int64))})


def concat_chunk_packing(docs: ray.data.Dataset, chunk_tokens: int,
                         text_col: str = "text", id_col: str = "doc_id",
                         assume_sorted: bool = False) -> ray.data.Dataset:
    """(doc_id, pack_id, pack_offset, n_tokens) spans of the
    concatenated token stream sliced into ``chunk_tokens`` windows.
    Global order = ascending ``id_col``."""
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")

    def counts(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col].astype(str)
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "__n_tokens": (t.str.count(" ") + 1).to_numpy(np.int64)})

    c = docs.map_batches(counts, batch_format="pandas")
    if not assume_sorted:
        c = c.sort(id_col)
    refs = c.to_arrow_refs()
    if not refs:
        return ray.data.from_arrow(_empty_spans(id_col))
    partials = ray.get([_block_sum.remote(r, "__n_tokens") for r in refs])
    offsets = np.concatenate(([0], np.cumsum(partials)))[:-1]
    out = [_emit_spans.remote(r, int(o), int(chunk_tokens), id_col)
           for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out)


@ray.remote
def _emit_budget(tbl: pa.Table, offset: int, budget: int,
                 id_col: str) -> pa.Table:
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "n_tokens": pa.array([], pa.int64()),
                      "cum_tokens": pa.array([], pa.int64())})
    if tbl.num_rows == 0 or "__n_tokens" not in tbl.schema.names:
        return empty
    n = tbl["__n_tokens"].to_numpy().astype(np.int64)
    cum = offset + np.cumsum(n)
    keep = cum <= budget
    if not keep.any():
        return empty
    return pa.table({
        id_col: pa.array(tbl[id_col].to_numpy()[keep]),
        "n_tokens": pa.array(n[keep]),
        "cum_tokens": pa.array(cum[keep])})


def select_by_token_budget(docs: ray.data.Dataset, budget_tokens: int,
                           order_cols=("n_chars",), order_desc=(True,),
                           text_col: str = "text",
                           id_col: str = "doc_id") -> ray.data.Dataset:
    """Deterministic token-budget curation: rank the corpus by
    ``order_cols`` (quality proxy, default ``n_chars`` descending, id
    tie-break) and keep the maximal prefix whose cumulative whitespace
    token count stays ≤ ``budget_tokens`` — the "take the best docs
    until the training budget is full" selection every mixture recipe
    needs.  Output ``(id, n_tokens, cum_tokens)``.

    Same distributed scan shape as :func:`concat_chunk_packing`: range
    sort on the rank key, per-block partial sums (driver holds #blocks
    integers), exclusive offsets shipped back, per-block vectorized
    cumsum + threshold mask.  Blocks past the budget emit nothing, so
    the output stream stops where the budget does.  SQL twin: a window
    ``sum() OVER (ORDER BY rank)`` with ``cum <= B``.
    """
    if budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0")

    keep_cols = list(dict.fromkeys(list(order_cols) + [id_col]))

    def counts(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col].astype(str)
        out = b[keep_cols].copy()
        out["__n_tokens"] = (t.str.count(" ") + 1).to_numpy(np.int64)
        return out

    c = docs.map_batches(counts, batch_format="pandas").sort(
        list(order_cols) + [id_col],
        descending=list(order_desc) + [False])
    refs = c.to_arrow_refs()
    if not refs:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "cum_tokens": pa.array([], pa.int64())}))
    partials = ray.get([_block_sum.remote(r, "__n_tokens") for r in refs])
    offsets = np.concatenate(([0], np.cumsum(partials)))[:-1]
    out = [_emit_budget.remote(r, int(o), int(budget_tokens), id_col)
           for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out)
