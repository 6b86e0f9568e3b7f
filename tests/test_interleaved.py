"""Interleaved-document ingress: span-sequence equality is the per-row
invariant (BASELINE.json input_hint) — geometry extraction must never
rewrite the spans column, and extracted geometry must round-trip."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from city2graph_ray.geom import wkt
from city2graph_ray.sources.interleaved import (
    doc_points,
    extract_geometry_spans,
    synthesize_documents,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs():
    return synthesize_documents(SF_DIR).materialize()


def test_span_sequence_preserved(docs):
    """Running extraction does not alter the source table's spans; the
    span sequence (kind, text, media_ref, order) compares equal before
    and after the pipeline."""
    before = docs.to_pandas().set_index("doc_id")["spans"].to_dict()
    _ = extract_geometry_spans(docs).materialize()
    after = docs.to_pandas().set_index("doc_id")["spans"].to_dict()
    assert before.keys() == after.keys()
    for k in before:
        sa = [(s["kind"], s["text"], s["media_ref"]) for s in before[k]]
        sb = [(s["kind"], s["text"], s["media_ref"]) for s in after[k]]
        assert sa == sb


def test_extraction_roundtrip(docs):
    """Extracted coords re-emit to the exact WKT text of the source span."""
    g = extract_geometry_spans(docs).to_pandas()
    src = docs.to_pandas().set_index("doc_id")["spans"].to_dict()
    assert len(g) > 0
    for _, r in g.sample(n=min(200, len(g)), random_state=0).iterrows():
        span = src[r.doc_id][r.span_idx]
        assert span["kind"] == r.kind
        coords = np.asarray(r.coords)
        if r.kind == "geom_point":
            out = wkt.emit_point(coords[0], coords[1])
        elif r.kind == "geom_segment":
            out = wkt.emit_linestring(coords)
        else:
            out = wkt.emit_polygon(coords)
        assert out == span["text"]


def test_doc_points_match_key_derivation(docs):
    """Points recovered through the interleaved span path equal the
    direct key derivation (the SQL-oracle view of the same geometry)."""
    import pyarrow.parquet as pq
    from city2graph_ray.synth import key_to_xy

    got = doc_points(docs).to_pandas().sort_values("id").reset_index(drop=True)
    keys = pq.read_table(f"{SF_DIR}/customer.parquet",
                         columns=["c_custkey"])["c_custkey"].to_numpy()
    x, y = key_to_xy(keys)
    exp = pd.DataFrame({"id": np.sort(keys).astype(np.int64)})
    order = np.argsort(keys)
    exp["x"] = x[order]
    exp["y"] = y[order]
    pd.testing.assert_frame_equal(got, exp, atol=1e-9)


def test_rejoin_spans_preserves_sequences(docs):
    """Wide-row pattern: spans projected out, result joined back by
    doc_id — the re-attached span sequence equals the source exactly."""
    from city2graph_ray.sources.interleaved import doc_points, rejoin_spans

    pts = doc_points(docs)
    derived = pts.map_batches(
        lambda b: pd.DataFrame({"doc_id": [f"cust-{i}" for i in b["id"]],
                                "score": b["x"] + b["y"]}),
        batch_format="pandas")
    joined = rejoin_spans(docs, derived).to_pandas()
    src = docs.to_pandas().set_index("doc_id")["spans"].to_dict()
    assert len(joined) == pts.count()
    for _, r in joined.sample(n=min(50, len(joined)), random_state=1).iterrows():
        sa = [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
        sb = [(s["kind"], s["text"], s["media_ref"]) for s in src[r["doc_id"]]]
        assert sa == sb
