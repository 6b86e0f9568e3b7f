"""Concat-and-chunk sequence packing vs a straight-line reference."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from city2graph_ray.text.packing import concat_chunk_packing


def _reference(docs: pd.DataFrame, chunk: int) -> list[tuple]:
    rows = []
    pos = 0
    for r in docs.sort_values("doc_id").itertuples():
        n = r.text.count(" ") + 1
        start, end = pos, pos + n
        for p in range(start // chunk, (end - 1) // chunk + 1):
            lo, hi = max(start, p * chunk), min(end, (p + 1) * chunk)
            rows.append((r.doc_id, p, lo - p * chunk, hi - lo))
        pos = end
    return rows


@pytest.fixture()
def docs() -> pd.DataFrame:
    rng = np.random.default_rng(11)
    texts = [" ".join(["w"] * int(k)) for k in rng.integers(1, 40, size=60)]
    texts[7] = " ".join(["w"] * 300)       # spans many packs
    texts[20] = ""                          # empty text -> 1 token
    return pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                         "text": texts})


def test_packing_matches_reference(docs):
    for chunk in (16, 64, 1024):
        got = concat_chunk_packing(
            rd.from_pandas(docs), chunk).to_pandas()
        got_rows = list(map(tuple, got[["doc_id", "pack_id", "pack_offset",
                                        "n_tokens"]].to_numpy()))
        assert sorted(got_rows) == sorted(_reference(docs, chunk)), chunk
        # stream conservation: every token lands in exactly one window
        assert got["n_tokens"].sum() == sum(
            t.count(" ") + 1 for t in docs["text"])
        # no window overflows
        per_pack = got.groupby("pack_id")["n_tokens"].sum()
        assert (per_pack <= chunk).all()
        # within-window layout: offsets + lengths tile without overlap
        for _, g in got.groupby("pack_id"):
            g = g.sort_values("pack_offset")
            ends = (g["pack_offset"] + g["n_tokens"]).to_numpy()
            assert (g["pack_offset"].to_numpy()[1:] == ends[:-1]).all()


def test_packing_unsorted_input_and_blocks(docs):
    shuffled = docs.sample(frac=1.0, random_state=3).reset_index(drop=True)
    got = concat_chunk_packing(
        rd.from_pandas(shuffled).repartition(7), 32).to_pandas()
    want = _reference(docs, 32)
    assert sorted(map(tuple, got[["doc_id", "pack_id", "pack_offset",
                                  "n_tokens"]].to_numpy())) == sorted(want)


def test_packing_edge_cases():
    empty = concat_chunk_packing(
        rd.from_pandas(pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                     "text": pd.Series(dtype=str)})),
        16).to_pandas()
    assert len(empty) == 0
    one = concat_chunk_packing(
        rd.from_pandas(pd.DataFrame({"doc_id": [5], "text": ["a b c"]})),
        2).to_pandas()
    assert len(one) == 2           # 3 tokens over chunk=2 -> two windows
    with pytest.raises(ValueError):
        concat_chunk_packing(rd.from_pandas(pd.DataFrame(
            {"doc_id": [1], "text": ["x"]})), 0)
