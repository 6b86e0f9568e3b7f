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


def test_extraction_slow_path_parity():
    """Batches mixing multi-ring polygons, degenerate rings, and
    malformed WKT route through the per-row fallback and still agree
    with the scalar parser row-for-row (vectorized fast path must not
    change semantics)."""
    import pyarrow as pa
    import ray.data as rd

    from city2graph_ray.geom.kernels import polygon_area_centroid
    from city2graph_ray.sources.interleaved import DOC_SCHEMA

    texts = [
        "POINT (1.25 -3.5)",
        "LINESTRING (0 0, 2 0, 2 2)",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
        # hole → slow path (exterior ring only, reference-fixture rule)
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 3 2, 3 3, 2 2))",
        # degenerate ring (zero area) → scalar fallback
        "POLYGON ((0 0, 1 1, 2 2, 0 0))",
        "POINT (1e3 2.5e-2)",
    ]
    kinds = ["geom_point", "geom_segment", "geom_building",
             "geom_building", "geom_building", "geom_point"]
    spans = [[{"kind": k, "text": t, "media_ref": "", "offset": 0},
              {"kind": "text", "text": "filler", "media_ref": "", "offset": 9}]
             for k, t in zip(kinds, texts)]
    tbl = pa.Table.from_arrays(
        [pa.array([f"doc-{i}" for i in range(len(texts))], pa.string()),
         pa.array(spans, DOC_SCHEMA.field("spans").type)], schema=DOC_SCHEMA)
    got = (extract_geometry_spans(rd.from_arrow(tbl))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(got) == len(texts)
    assert (got["span_idx"] == 0).all()
    for _, r in got.iterrows():
        i = int(r.doc_id.split("-")[1])
        gkind, coords = wkt.parse(texts[i])
        assert list(r.coords) == list(coords)
        if gkind == "POINT":
            ex, ey = coords[0], coords[1]
        elif gkind == "LINESTRING":
            c = coords.reshape(-1, 2)
            ex, ey = c[:, 0].mean(), c[:, 1].mean()
        else:
            _, ex, ey = polygon_area_centroid(coords)
        assert r.x == pytest.approx(ex, abs=1e-12)
        assert r.y == pytest.approx(ey, abs=1e-12)


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


def test_read_documents_parquet_roundtrip(tmp_path, docs):
    """read_documents (the Lance-gated corpus reader) on its Parquet
    path: write the synthesized corpus, read it back, span sequences
    identical."""
    from city2graph_ray.sources.interleaved import read_documents

    out = str(tmp_path / "corpus")
    docs.write_parquet(out)
    back = read_documents(out)  # format="auto" → parquet
    a = docs.to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = back.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(a["doc_id"]) == list(b["doc_id"])
    for sa, sb in zip(a["spans"], b["spans"]):
        la = [(s["kind"], s["text"], s["media_ref"]) for s in sa]
        lb = [(s["kind"], s["text"], s["media_ref"]) for s in sb]
        assert la == lb


def test_read_documents_lance_gated():
    from city2graph_ray.sources.interleaved import read_documents
    with pytest.raises(ImportError, match="lance"):
        read_documents("/data/corpus.lance")
    with pytest.raises(ValueError, match="unknown format"):
        read_documents("/data/x", format="orc")


def test_media_spans_flatten_preserves_index():
    import pyarrow as pa
    import ray.data as rd
    from city2graph_ray.sources.interleaved import SPAN_TYPE, media_spans
    tbl = pa.Table.from_arrays(
        [pa.array(["d1", "d2"]),
         pa.array([
             [{"kind": "text", "text": "t", "media_ref": "", "offset": 0},
              {"kind": "media", "text": "", "media_ref": "blob://img/7.png",
               "offset": 1},
              {"kind": "media", "text": "", "media_ref": "blob://img/9.png",
               "offset": 2}],
             [{"kind": "text", "text": "u", "media_ref": "", "offset": 0}],
         ], SPAN_TYPE)],
        names=["doc_id", "spans"])
    out = media_spans(rd.from_arrow(tbl)).to_pandas()
    assert out["doc_id"].tolist() == ["d1", "d1"]
    assert out["span_idx"].tolist() == [1, 2]
    assert out["media_ref"].tolist() == ["blob://img/7.png",
                                         "blob://img/9.png"]


def test_caption_align_nearest_preceding_text():
    import pyarrow as pa
    import ray.data as rd
    from city2graph_ray.sources.interleaved import SPAN_TYPE, caption_align
    tbl = pa.Table.from_arrays(
        [pa.array(["d1", "d2", "d3"]),
         pa.array([
             # media before any text → dropped; later media pairs with
             # the nearest preceding text (idx 1), not the first
             [{"kind": "media", "text": "", "media_ref": "m0", "offset": 0},
              {"kind": "text", "text": "alpha", "media_ref": "", "offset": 0},
              {"kind": "text", "text": "beta", "media_ref": "", "offset": 5},
              {"kind": "media", "text": "", "media_ref": "m1", "offset": 9},
              {"kind": "media", "text": "", "media_ref": "m2", "offset": 9}],
             [{"kind": "text", "text": "gamma", "media_ref": "", "offset": 0}],
             [{"kind": "geom_point", "text": "POINT (1 2)", "media_ref": "",
               "offset": 0},
              {"kind": "media", "text": "", "media_ref": "m3", "offset": 0}],
         ], SPAN_TYPE)],
        names=["doc_id", "spans"])
    out = caption_align(rd.from_arrow(tbl)).to_pandas() \
        .sort_values(["doc_id", "media_idx"]).reset_index(drop=True)
    # d1: m0 has no preceding text (dropped); m1, m2 → "beta" (idx 2)
    # d2: no media; d3: media preceded only by a geom span (dropped)
    assert out["media_ref"].tolist() == ["m1", "m2"]
    assert out["caption_idx"].tolist() == [2, 2]
    assert out["caption_text"].tolist() == ["beta", "beta"]
    assert out["media_idx"].tolist() == [3, 4]


def test_caption_corpus_cross_item_alignment(sf_dir="/root/testdata/sf0.001"):
    from city2graph_ray.sources.interleaved import (caption_align,
                                                    synthesize_caption_docs)
    out = caption_align(synthesize_caption_docs(sf_dir)).to_pandas()
    assert len(out) > 0
    # ln%6==3 media spans caption from an EARLIER lineitem: item number
    # in the caption differs from the media's own lineitem for some rows
    import re
    cap_ln = out["caption_text"].str.extract(r"item (\d+)")[0].astype(int)
    assert (out["caption_idx"] < out["media_idx"]).all()
    # every caption is a text span: idx strictly before the media span
    # and at least one cross-item pairing exists (caption_idx < media_idx - 1)
    assert (out["media_idx"] - out["caption_idx"] > 1).any()
