"""Flagship pipeline end-to-end with resumable sinks."""

from __future__ import annotations

from city2graph_ray.pipelines.flagship import run_flagship
from tests.conftest import SF_DIR


def test_flagship_resumable(tmp_path):
    root = str(tmp_path)
    s1 = run_flagship(SF_DIR, root, fingerprint="r1")
    assert set(s1) == {"knn_edges", "radius_edges", "contiguity_edges",
                       "pip_assignments"}
    assert all(v["rows"] > 0 for v in s1.values())
    assert all(v["skipped"] == 0 for v in s1.values())
    # resume: same fingerprint → every partition skipped, rows identical
    s2 = run_flagship(SF_DIR, root, fingerprint="r1")
    for k in s1:
        assert s2[k]["skipped"] == s2[k]["partitions"]
        assert s2[k]["rows"] == s1[k]["rows"]
    # outputs load back
    from city2graph_ray.state.lineage import load_checkpoint
    knn = load_checkpoint(root, "knn_edges").to_pandas()
    assert len(knn) == s1["knn_edges"]["rows"]
    assert {"src", "dst", "distance"} <= set(knn.columns)
