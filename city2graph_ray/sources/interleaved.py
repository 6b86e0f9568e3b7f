"""Interleaved text+media document ingress (BASELINE.json ``input_hint``).

The engine's authoritative ingress is a table of interleaved documents::

    doc_id: string
    spans:  list<struct<kind: string, text: string,
                        media_ref: string, offset: int32>>

Geometry-bearing spans carry WKT in ``text`` (kind ∈ {geom_point,
geom_segment, geom_building}); ``media`` spans carry an opaque URI in
``media_ref``.  The per-row invariant: the span sequence (kind, text,
media_ref, order) must survive every pipeline — so geometry is
*extracted into sibling tables* keyed (doc_id, span_idx) and the spans
column is never rewritten (SURVEY.md §1.3).

``synthesize_documents`` derives a deterministic corpus from the
TPC-H-ish testdata (city2graph_ray.synth derivations — the same
geometry the SQL oracles describe), standing in for
``ray.data.read_lance`` of the production corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from city2graph_ray import synth
from city2graph_ray.geom import wkt

SPAN_TYPE = pa.list_(pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
]))

DOC_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", SPAN_TYPE)])


def _doc_batch(doc_ids: list[str], span_lists: list[list[dict]]) -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array(doc_ids, pa.string()), pa.array(span_lists, SPAN_TYPE)],
        schema=DOC_SCHEMA)


def synthesize_documents(sf_dir: str) -> ray.data.Dataset:
    """Deterministic interleaved-doc corpus from the testdata tables.

    - customer rows → docs with a text span + a geom_point span (the
      customer's derived point) + a media span on every 3rd doc,
    - orders rows → docs with a text span + a geom_segment span (order
      point → customer point),
    - part rows → docs with a text span + a geom_building span (grid
      square polygon).
    """
    # single-file reads default to ONE block → the (python-heavy) doc
    # builders would run serially; force enough blocks to parallelize
    nb = 16
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"],
                                 override_num_blocks=nb)
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"],
                                   override_num_blocks=nb)
    part = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                 columns=["p_partkey", "p_type"],
                                 override_num_blocks=nb)

    def cust_docs(batch: pa.Table) -> pa.Table:
        keys = batch["c_custkey"].to_numpy()
        seg = batch["c_mktsegment"].to_pylist()
        x, y = synth.key_to_xy(keys)
        ids, spans = [], []
        for i, k in enumerate(keys):
            txt = f"customer {k} segment {seg[i]}"
            s = [{"kind": "text", "text": txt, "media_ref": "", "offset": 0}]
            off = len(txt)
            g = wkt.emit_point(x[i], y[i])
            s.append({"kind": "geom_point", "text": g, "media_ref": "", "offset": off})
            off += len(g)
            if k % 3 == 0:
                s.append({"kind": "media", "text": "",
                          "media_ref": f"blob://img/{k}.png", "offset": off})
            ids.append(f"cust-{k}")
            spans.append(s)
        return _doc_batch(ids, spans)

    def order_docs(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy()
        ck = batch["o_custkey"].to_numpy()
        ax, ay = synth.key_to_xy(ok)
        bx, by = synth.key_to_xy(ck)
        ids, spans = [], []
        for i, k in enumerate(ok):
            txt = f"order {k} by customer {ck[i]}"
            g = wkt.emit_linestring(np.array([ax[i], ay[i], bx[i], by[i]]))
            ids.append(f"ord-{k}")
            spans.append([
                {"kind": "text", "text": txt, "media_ref": "", "offset": 0},
                {"kind": "geom_segment", "text": g, "media_ref": "", "offset": len(txt)},
            ])
        return _doc_batch(ids, spans)

    def part_docs(batch: pa.Table) -> pa.Table:
        keys = batch["p_partkey"].to_numpy()
        ptype = batch["p_type"].to_pylist()
        col, row = synth.part_grid_cell(keys)
        rings = synth.grid_square_ring(col, row)
        ids, spans = [], []
        for i, k in enumerate(keys):
            txt = f"building {k} type {ptype[i]}"
            g = wkt.emit_polygon(rings[i])
            ids.append(f"part-{k}")
            spans.append([
                {"kind": "text", "text": txt, "media_ref": "", "offset": 0},
                {"kind": "geom_building", "text": g, "media_ref": "", "offset": len(txt)},
            ])
        return _doc_batch(ids, spans)

    return (cust.map_batches(cust_docs, batch_format="pyarrow")
            .union(orders.map_batches(order_docs, batch_format="pyarrow"))
            .union(part.map_batches(part_docs, batch_format="pyarrow")))


GEOM_KINDS = ("geom_point", "geom_segment", "geom_building")


def extract_geometry_spans(docs: ray.data.Dataset) -> ray.data.Dataset:
    """The foundational ingest op (SURVEY.md §2.2 last row): decode each
    document's geometry spans into a typed sibling table keyed
    (doc_id, span_idx), leaving the spans column of the source table
    untouched.  Output columns: doc_id, span_idx, kind, coords
    (list<double> flat), x, y (centroid — the point itself for
    geom_point), zero-copy Arrow in/out."""

    def extract(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        out_doc, out_idx, out_kind, out_coords, out_x, out_y = [], [], [], [], [], []
        for did, spans in zip(doc_ids, spans_col):
            for idx, sp in enumerate(spans):
                if sp["kind"] not in GEOM_KINDS:
                    continue
                gkind, coords = wkt.parse(sp["text"])
                c = coords.reshape(-1, 2)
                if gkind == "POINT":
                    cx, cy = float(c[0, 0]), float(c[0, 1])
                elif gkind == "LINESTRING":
                    cx, cy = float(c[:, 0].mean()), float(c[:, 1].mean())
                else:
                    from city2graph_ray.geom.kernels import polygon_area_centroid
                    _, cx, cy = polygon_area_centroid(coords)
                out_doc.append(did)
                out_idx.append(idx)
                out_kind.append(sp["kind"])
                out_coords.append(coords.tolist())
                out_x.append(cx)
                out_y.append(cy)
        return pa.table({
            "doc_id": pa.array(out_doc, pa.string()),
            "span_idx": pa.array(out_idx, pa.int32()),
            "kind": pa.array(out_kind, pa.string()),
            "coords": pa.array(out_coords, pa.list_(pa.float64())),
            "x": pa.array(out_x, pa.float64()),
            "y": pa.array(out_y, pa.float64()),
        })

    return docs.map_batches(extract, batch_format="pyarrow")


def doc_points(docs: ray.data.Dataset, kind: str = "geom_point") -> ray.data.Dataset:
    """Geometry spans of one kind → a points Dataset (id, x, y) where id
    is the integer suffix of doc_id (deterministic; used so pipelines
    fed from the interleaved corpus are comparable to the SQL oracles
    that derive the same points from the raw keys)."""
    g = extract_geometry_spans(docs)

    def to_points(batch: pa.Table) -> pa.Table:
        mask = pa.compute.equal(batch["kind"], kind)
        t = batch.filter(mask)
        ids = [int(d.rsplit("-", 1)[1]) for d in t["doc_id"].to_pylist()]
        return pa.table({"id": pa.array(ids, pa.int64()),
                         "x": t["x"], "y": t["y"]})

    return g.map_batches(to_points, batch_format="pyarrow")


def rejoin_spans(docs: ray.data.Dataset, results: ray.data.Dataset,
                 on: str = "doc_id") -> ray.data.Dataset:
    """Re-attach the untouched ``spans`` column to a derived result
    table (SURVEY.md §2 "wide rows": media-heavy span payloads are
    projected OUT before heavy shuffles and joined back by ``doc_id``
    at the end, so span bytes never ride through a shuffle).

    One bucketed hash join on doc_id; span-sequence equality of the
    joined rows is asserted by tests/test_interleaved.py."""
    from city2graph_ray.joins import bucketed_join
    spans_side = docs.select_columns([on, "spans"])
    return bucketed_join(results, spans_side, on=on)
