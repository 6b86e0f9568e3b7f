"""JSONL / CSV document ingestion and sharded JSONL export.

The reference ingests tabular files via GeoPandas/pandas readers
(`data.py` local mode); a training-data pipeline's equivalent bulk
format is JSON-Lines.  These are thin, schema-disciplined wrappers
over the Ray Data native readers — the point is the contract (typed
columns out, sharded resumable files in/out), not the parsing, which
stays in Arrow.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def load_jsonl_docs(paths: "str | list[str]",
                    id_col: str = "doc_id", text_col: str = "text",
                    keep_cols: "list[str] | None" = None,
                    ) -> ray.data.Dataset:
    """Documents from JSON-Lines shards: one JSON object per line.

    Normalizes to the engine's document contract: ``doc_id`` int64
    (synthesized as a stable row number when absent — same offset
    stamping as ``shuffle.global_row_number``'s pass 2, keyed by block
    order so re-reads are deterministic for a fixed shard list),
    ``text`` string, plus ``keep_cols`` passed through.  Lines missing
    ``text`` become empty strings rather than nulls so downstream
    vectorized str kernels never branch.

    Scale: ``ray.data.read_json`` streams per-file blocks; pass a
    directory or glob so shard parallelism matches the file count.
    """
    ds = ray.data.read_json(paths)
    names = ds.schema().names
    extra = [c for c in (keep_cols or []) if c in names]
    has_id = id_col in names

    if has_id:
        def norm(b: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "doc_id": b[id_col].to_numpy(np.int64),
                "text": b[text_col].fillna("").astype(str)
                if text_col in b else ""})
            for c in extra:
                out[c] = b[c].to_numpy()
            return out

        return ds.map_batches(norm, batch_format="pandas")

    # no id column: stamp a stable global row number per block
    import ray as _ray

    refs = ds.to_arrow_refs()

    @_ray.remote
    def _n(t: pa.Table) -> int:
        return t.num_rows

    @_ray.remote
    def _stamp(t: pa.Table, off: int) -> pa.Table:
        df = t.to_pandas()
        out = pd.DataFrame({
            "doc_id": off + np.arange(len(df), dtype=np.int64),
            "text": df[text_col].fillna("").astype(str)
            if text_col in df else ""})
        for c in extra:
            out[c] = df[c].to_numpy()
        return pa.Table.from_pandas(out, preserve_index=False)

    counts = _ray.get([_n.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(counts)))[:-1]
    return ray.data.from_arrow_refs(
        [_stamp.remote(r, int(o)) for r, o in zip(refs, offsets)])


def write_jsonl(ds: ray.data.Dataset, out_dir: str) -> None:
    """Sharded JSON-Lines export: one file per block under
    ``out_dir`` (Ray Data's native writer), so a downstream consumer
    resumes per shard and no single giant file is ever produced."""
    ds.write_json(out_dir)
