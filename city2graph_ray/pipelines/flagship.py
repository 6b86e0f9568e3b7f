"""The flagship end-to-end pipeline with resumable checkpointed sinks.

Interleaved docs → span-geometry extraction → typed tables → the
morphological + proximity suite → per-partition parquet checkpoints
with lineage manifests (state/lineage).  A rerun with the same
fingerprint skips completed partitions — the north rule's "resumable
from checkpoint with per-partition lineage + metrics" made concrete.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from city2graph_ray.state.lineage import checkpointed_write


def _with_partition(ds: ray.data.Dataset, col: str, num: int = 64) -> ray.data.Dataset:
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["partition"] = (batch[col].to_numpy().astype(np.int64) % num)
        return out
    return ds.map_batches(fn, batch_format="pandas")


def run_flagship(sf_dir: str, out_root: str,
                 fingerprint: str | None = None) -> dict[str, dict]:
    """Run the suite and checkpoint each stage's edges, partitioned by
    src-id hash (the same key a rerun would skip on).  Returns
    per-stage lineage summaries."""
    from city2graph_ray.ops.proximity import (contiguity_graph,
                                              fixed_radius_graph, group_nodes,
                                              knn_graph)
    from city2graph_ray.sources.interleaved import (doc_points,
                                                    extract_geometry_spans,
                                                    synthesize_documents)

    fingerprint = fingerprint or sf_dir
    docs = synthesize_documents(sf_dir)
    geoms = extract_geometry_spans(docs).materialize()
    pts = doc_points(docs).materialize()

    def to_polys(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["kind"] == "geom_building"]
        return pd.DataFrame({
            "id": [int(d.rsplit("-", 1)[1]) for d in b["doc_id"]],
            "coords": [np.asarray(c, np.float64) for c in b["coords"]]})

    polys = geoms.map_batches(to_polys, batch_format="pandas").materialize()

    summaries = {}
    stages = {
        "knn_edges": _with_partition(knn_graph(pts, 4), "src"),
        "radius_edges": _with_partition(fixed_radius_graph(pts, 40.0), "src"),
        "contiguity_edges": _with_partition(contiguity_graph(polys, "queen"),
                                            "src"),
        "pip_assignments": _with_partition(group_nodes(polys, pts), "poly_id"),
    }
    for stage_id, ds in stages.items():
        summaries[stage_id] = checkpointed_write(
            ds, out_root, stage_id, "partition", fingerprint=fingerprint)
    return summaries
