"""Benchmark decontamination: word-n-gram overlap screening.

The standard training-data hygiene step (see e.g. GPT-3 App. C /
Dolma §4): a training document is *contaminated* when it shares any
word n-gram with a held-out benchmark corpus.  No reference
counterpart (the reference is a geospatial engine); this is one of the
engine-added LLM-pipeline first-class operators.

Scale shape: grams never leave a worker as strings — each distinct
gram is reduced to the 8-byte lower half of its md5 digest (the exact
value DuckDB's ``md5_number_lower`` computes, so the whole operator is
bit-exactly SQL-oracle-able), the benchmark side is reduced to its
DISTINCT gram hashes, and the two sides meet in a bucketed hash join
on the 8-byte key.  Bytes shuffled ∝ distinct (doc, gram) pairs × 16,
independent of document length; nothing is broadcast or collected.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray
import ray.data

from city2graph_ray import shuffle


def _md5_lower64(strs: np.ndarray) -> np.ndarray:
    """uint64 md5 lower-half (bytes 8..16, little-endian) per string —
    DuckDB ``md5_number_lower`` bit-for-bit.  Hashes each UNIQUE value
    once (vocabulary-sized loop, not row-sized)."""
    codes, uniq = pd.factorize(strs)
    uh = np.fromiter(
        (int.from_bytes(hashlib.md5(str(u).encode()).digest()[8:16],
                        "little") for u in uniq),
        dtype=np.uint64, count=len(uniq))
    return uh[codes] if len(codes) else np.zeros(0, np.uint64)


def word_ngram_hashes(batch: pd.DataFrame, n: int, text_col: str,
                      id_col: str) -> pd.DataFrame:
    """DISTINCT word-``n``-gram hashes per doc → (id, g:int64).

    Grams are space-joined runs of ``n`` consecutive space-split
    tokens (SQL mirror: ``array_to_string(ts[i:i+n-1], ' ')``).  The
    whole batch's tokens are exploded to one flat array; windows
    crossing doc boundaries are masked by doc index equality — no
    per-row Python."""
    toks = batch[text_col].str.split(" ")
    counts = toks.str.len().to_numpy(np.int64)
    flat = pd.Series(toks.explode().to_numpy(dtype=object))
    doc_idx = np.repeat(np.arange(len(batch)), counts)
    gram = flat.copy()
    for j in range(1, n):
        gram = gram + (" " + flat.shift(-j))
    m = len(flat) - (n - 1)
    ok = (doc_idx[:m] == doc_idx[n - 1:]) if m > 0 else np.zeros(0, bool)
    gidx = np.flatnonzero(np.concatenate(
        [ok, np.zeros(n - 1, dtype=bool)])) if m > 0 else np.zeros(0, np.int64)
    g = _md5_lower64(gram.to_numpy(dtype=object)[gidx])
    ids = batch[id_col].to_numpy()[doc_idx[gidx]]
    out = pd.DataFrame({id_col: ids, "g": g.view(np.int64)})
    return out.drop_duplicates()


def ngram_overlap(docs: ray.data.Dataset, benchmark: ray.data.Dataset,
                  n: int = 3, text_col: str = "text",
                  id_col: str = "doc_id",
                  num_buckets: int = shuffle.DEFAULT_BUCKETS,
                  ) -> ray.data.Dataset:
    """Per-doc count of DISTINCT word-``n``-grams shared with the
    ``benchmark`` corpus.  Output (id_col, hits) — docs with zero
    overlap are absent (inner join; LEFT-join zero rows back with
    :func:`city2graph_ray.joins.bucketed_join` if needed).

    Both sides stream: doc grams are (id, 8-byte hash) rows, the
    benchmark reduces to its distinct gram hashes, candidates meet in
    one bucketed hash join, and the per-doc count is a keyed
    ``group_agg``."""
    def explode(b: pd.DataFrame) -> pd.DataFrame:
        return word_ngram_hashes(b, n, text_col, id_col)

    doc_grams = docs.map_batches(explode, batch_format="pandas")
    bench_grams = shuffle.distinct(
        benchmark.map_batches(explode, batch_format="pandas")
        .map_batches(lambda b: b[["g"]], batch_format="pandas"),
        ["g"], num_buckets=num_buckets)

    from city2graph_ray.joins import bucketed_join
    hits = bucketed_join(doc_grams, bench_grams, on="g",
                         num_buckets=num_buckets)
    return shuffle.group_agg(hits, [id_col], {"hits": ("g", "size")},
                             num_buckets=num_buckets)


def self_overlap(docs: ray.data.Dataset, n: int = 4,
                 text_col: str = "text", id_col: str = "doc_id",
                 num_buckets: int = shuffle.DEFAULT_BUCKETS,
                 ) -> ray.data.Dataset:
    """Cross-document duplicated-span detection (the candidate stage of
    ExactSubstr-style dedup, Lee et al. 2022): per doc, the number of
    its DISTINCT word-``n``-grams that also occur in at least one
    OTHER document.  Output (id_col, shared_grams); docs with no
    shared span are absent (inner join — LEFT-join zeros back if the
    caller needs every doc).

    Scale shape: one explode to (id, 8-byte gram hash) rows, then ONE
    gram-keyed shuffle whose kernel keeps exactly the rows of grams
    seen in ≥2 docs (the per-gram doc count and the "join back" fuse
    into the same bucket pass — doc_grams is already distinct per
    (doc, gram) from :func:`word_ngram_hashes`), then one keyed count
    per doc.  Nothing is broadcast; bytes shuffled ∝ distinct
    (doc, gram) pairs × 16."""
    def explode(b: pd.DataFrame) -> pd.DataFrame:
        return word_ngram_hashes(b, n, text_col, id_col)

    doc_grams = docs.map_batches(explode, batch_format="pandas")

    def dup_hits(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("g", sort=False)["g"].transform("size")
        return g.loc[c >= 2, [id_col, "g"]]

    hits = shuffle.grouped_transform(doc_grams, ["g"], dup_hits,
                                     num_buckets=num_buckets)
    return shuffle.group_agg(hits, [id_col],
                             {"shared_grams": ("g", "size")},
                             num_buckets=num_buckets)


def word_ngram_pos_hashes(batch: pd.DataFrame, n: int, text_col: str,
                          id_col: str) -> pd.DataFrame:
    """Every word-``n``-gram OCCURRENCE per doc → (id, pos, g:int64),
    ``pos`` 1-based (the SQL mirror's ``generate_series`` index).  Same
    flat-explode construction as :func:`word_ngram_hashes`, but keeps
    positions and does not dedup."""
    toks = batch[text_col].str.split(" ")
    counts = toks.str.len().to_numpy(np.int64)
    flat = pd.Series(toks.explode().to_numpy(dtype=object))
    doc_idx = np.repeat(np.arange(len(batch)), counts)
    gram = flat.copy()
    for j in range(1, n):
        gram = gram + (" " + flat.shift(-j))
    m = len(flat) - (n - 1)
    ok = (doc_idx[:m] == doc_idx[n - 1:]) if m > 0 else np.zeros(0, bool)
    gidx = np.flatnonzero(np.concatenate(
        [ok, np.zeros(n - 1, dtype=bool)])) if m > 0 else np.zeros(0, np.int64)
    g = _md5_lower64(gram.to_numpy(dtype=object)[gidx])
    offs = np.concatenate([[0], np.cumsum(counts)])
    pos = gidx - offs[doc_idx[gidx]] + 1  # 1-based within doc
    ids = batch[id_col].to_numpy()[doc_idx[gidx]]
    return pd.DataFrame({id_col: ids, "pos": pos.astype(np.int64),
                         "g": g.view(np.int64)})


def remove_duplicated_spans(docs: ray.data.Dataset, n: int = 4,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            num_buckets: int = shuffle.DEFAULT_BUCKETS,
                            ) -> ray.data.Dataset:
    """ExactSubstr-style duplicated-span REMOVAL (the rewrite stage of
    Lee et al. 2022, word-granular): a word-``n``-gram occurring in two
    or more documents is owned by the smallest ``id`` containing it;
    every token covered by a non-owner occurrence is deleted from its
    document.  Output (id, text_clean, n_removed) for EVERY input doc
    (text unchanged and n_removed=0 when nothing was duplicated).

    Scale shape: one explode to (id, pos, 8-byte gram hash) occurrence
    rows; one gram-keyed shuffle for the per-gram min-id owner
    (partial-aggregated, bytes ∝ distinct grams per batch); one
    bucketed hash join occurrence⨝owner; then one id-keyed shuffle
    where the per-doc rewrite runs fully vectorized (flat token
    explode, difference-array coverage, reduceat counts) — the only
    per-doc Python is the final ``' '.join``.  Removable-start rows
    replicate the doc text through the rewrite join, so bytes there
    scale with text × removable-starts-per-doc (duplication-heavy
    corpora pay proportionally, never quadratically)."""
    import pyarrow as pa

    from city2graph_ray.joins import bucketed_join

    # schema hints: every intermediate below can be LEGITIMATELY empty
    # (corpus of docs all shorter than n words), and Ray loses block
    # schemas through maps that output only empty blocks
    id_type = None
    for name, typ in zip(docs.schema().names, docs.schema().types):
        if name == id_col:
            id_type = typ if isinstance(typ, pa.DataType) else pa.int64()
    occ_schema = pa.schema([(id_col, id_type), ("pos", pa.int64()),
                            ("g", pa.int64())])
    own_schema = pa.schema([("g", pa.int64()), ("own", id_type)])
    rem_schema = pa.schema([(id_col, id_type), ("pos", pa.int64())])

    occ = docs.map_batches(
        lambda b: word_ngram_pos_hashes(b, n, text_col, id_col),
        batch_format="pandas")
    owners = shuffle.group_agg(occ, ["g"], {"own": (id_col, "min")},
                               num_buckets=num_buckets)
    matched = bucketed_join(occ, owners, on="g",
                            num_buckets=num_buckets,
                            left_schema=occ_schema,
                            right_schema=own_schema)

    def rem_fn(b: pd.DataFrame) -> pd.DataFrame:
        keep = b[id_col].to_numpy() > b["own"].to_numpy()
        return b.loc[keep, [id_col, "pos"]].drop_duplicates()

    rem = matched.map_batches(rem_fn, batch_format="pandas")
    base = docs.map_batches(lambda b: b[[id_col, text_col]],
                            batch_format="pandas")
    joined = bucketed_join(base, rem, on=id_col, how="left",
                           num_buckets=num_buckets,
                           right_schema=rem_schema)

    def rewrite(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates(id_col)[[id_col, text_col]]
        toks = u[text_col].str.split(" ")
        counts = toks.str.len().to_numpy(np.int64)
        offs = np.concatenate([[0], np.cumsum(counts)])
        total = int(offs[-1])
        r = g.dropna(subset=["pos"])
        row_of = pd.Series(np.arange(len(u)),
                           index=u[id_col].to_numpy())
        starts = (offs[row_of[r[id_col].to_numpy()].to_numpy()]
                  + r["pos"].to_numpy(np.int64) - 1)
        diff = np.zeros(total + 1, np.int64)
        np.add.at(diff, starts, 1)
        np.add.at(diff, starts + n, -1)  # gram fits its doc by construction
        cov = np.cumsum(diff[:-1]) > 0
        flat = toks.explode().to_numpy(dtype=object)
        doc_idx = np.repeat(np.arange(len(u)), counts)
        kept = pd.DataFrame({"d": doc_idx[~cov], "w": flat[~cov]})
        texts = kept.groupby("d", sort=True)["w"].agg(" ".join)
        n_rm = np.add.reduceat(cov.astype(np.int64), offs[:-1]) \
            if total else np.zeros(len(u), np.int64)
        n_rm[counts == 0] = 0  # reduceat repeats on empty slices
        out = pd.DataFrame({
            id_col: u[id_col].to_numpy(),
            "text_clean": texts.reindex(np.arange(len(u)),
                                        fill_value="").to_numpy(),
            "n_removed": n_rm})
        return out

    return shuffle.grouped_transform(joined, [id_col], rewrite,
                                     num_buckets=num_buckets)


def ngram_novelty(docs: ray.data.Dataset, n: int = 4,
                  text_col: str = "text", id_col: str = "doc_id",
                  num_buckets: int = 64) -> ray.data.Dataset:
    """Per-doc n-gram novelty against everything EARLIER in the corpus
    (doc-id order): the fraction of a doc's distinct word ``n``-grams
    whose first corpus occurrence is an earlier doc — the
    diminishing-returns signal curation pipelines use to stop
    ingesting a crawled source.  Output ``(doc_id, n_grams, n_seen,
    novelty)`` with ``novelty = round(1 - n_seen/n_grams, 6)``;
    gram-less docs emit nothing.  All-integer counts over md5 gram
    keys — bit-exact vs the min-first-occurrence twin.

    Distributed shape: distinct grams per doc (one gram-hash
    shuffle), a keyed MIN for each gram's first doc, one bucketed
    join back, one keyed count — no gram table ever collects."""
    from city2graph_ray import shuffle
    from city2graph_ray.joins import bucketed_join

    # word_ngram_hashes is already DISTINCT per doc and each doc is
    # one row of one batch — no cross-batch dedup shuffle needed
    dg = docs.map_batches(
        lambda b: word_ngram_hashes(b, n, text_col, id_col),
        batch_format="pandas")
    firsts = shuffle.group_agg(
        dg.map_batches(
            lambda b: pd.DataFrame({"g": b["g"],
                                    "fd": b[id_col]}),
            batch_format="pandas"),
        ["g"], {"fd": ("fd", "min")}, num_buckets=num_buckets)
    import pyarrow as pa
    i64 = pa.int64()
    joined = bucketed_join(
        dg, firsts, "g", num_buckets=num_buckets,
        left_schema=pa.schema([(id_col, i64), ("g", i64)]),
        right_schema=pa.schema([("g", i64), ("fd", i64)]))
    per_doc = shuffle.group_agg(
        joined.map_batches(
            lambda b: pd.DataFrame({
                id_col: b[id_col],
                "n_grams": np.ones(len(b), np.int64),
                "n_seen": (b["fd"].to_numpy(np.int64)
                           < b[id_col].to_numpy(np.int64))
                .astype(np.int64)}),
            batch_format="pandas"),
        [id_col], {"n_grams": ("n_grams", "sum"),
                   "n_seen": ("n_seen", "sum")},
        num_buckets=num_buckets)
    return per_doc.map_batches(
        lambda b: pd.DataFrame({
            id_col: b[id_col].to_numpy(np.int64),
            "n_grams": b["n_grams"].to_numpy(np.int64),
            "n_seen": b["n_seen"].to_numpy(np.int64),
            "novelty": np.round(
                1.0 - b["n_seen"].to_numpy(np.int64)
                / b["n_grams"].to_numpy(np.int64), 6)}),
        batch_format="pandas")
