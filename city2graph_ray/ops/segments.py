"""Overture street-segment processing.

Reference: /root/reference/city2graph/data.py —
``process_overture_segments`` :296-378 orchestrates
``_split_segments_at_connectors`` :577-702 (per-row substring splits,
ids suffixed ``{id}_{part}``), ``_parse_connector_records`` /
``_parse_level_rules`` :705-732/:866-918 (permissive JSON),
``_generate_barrier_geometries`` :806-1014 (passable sub-linestrings =
complement of barrier intervals), ``_cluster_segment_endpoints``
:735-803 (grid-bin mean snap — the one non-row-local step: a global
groupby on the bin key, then a join back).

All row-local ops are stateless map_batches (flat-map shape for the
splitter); endpoint clustering is the engine's grid-snap aggregate
archetype.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import ray
import ray.data

from city2graph_ray import shuffle
from city2graph_ray.geom.kernels import linestring_length, substring


def parse_json_permissive(s) -> list:
    """Reference's permissive JSON repair (data.py:727,901):
    single quotes → double, None → null; failures → []."""
    if s is None or (isinstance(s, float) and np.isnan(s)):
        return []
    if isinstance(s, (list, tuple)):
        return list(s)
    try:
        return json.loads(str(s).replace("'", '"').replace("None", "null"))
    except (json.JSONDecodeError, TypeError):
        return []


def split_segments_at_connectors(segments: ray.data.Dataset,
                                 id_col: str = "seg_id") -> ray.data.Dataset:
    """One row → k rows: split each LineString at its connectors'
    fractional positions (``at`` ∈ [0,1] of arc length); part ids are
    ``f"{id}_{part}"`` when a split happens, the original id otherwise
    (reference data.py:577-702, suffix :691-694).  Purely row-local."""

    def splitter(batch: pd.DataFrame) -> pd.DataFrame:
        # per-row work is irreducible (JSON parse + arc substring), but
        # row replication is vectorized: collect (row_idx, piece, id,
        # part) then one .iloc fancy-index instead of per-column appends
        ids = batch[id_col].tolist()
        conns = (batch["connectors"].tolist() if "connectors" in batch
                 else [None] * len(batch))
        row_idx, parts, pieces, new_ids = [], [], [], []
        for i, (cid, coords, conn) in enumerate(
                zip(ids, batch["coords"], conns)):
            coords = np.asarray(coords, np.float64)
            total = linestring_length(coords)
            ats = sorted({float(c.get("at", 0.0))
                          for c in parse_json_permissive(conn)
                          if isinstance(c, dict)} - {0.0, 1.0})
            cuts = [0.0, *[a * total for a in ats], total]
            multi = len(cuts) > 2
            for p in range(len(cuts) - 1):
                row_idx.append(i)
                parts.append(p)
                pieces.append(substring(coords, cuts[p], cuts[p + 1]))
                new_ids.append(f"{cid}_{p}" if multi else str(cid))
        out = batch.iloc[row_idx].reset_index(drop=True)
        out["coords"] = pieces
        out[id_col] = new_ids
        out["split_part"] = np.asarray(parts, dtype=np.int64)
        return out

    return segments.map_batches(splitter, batch_format="pandas")


def barrier_geometries(segments: ray.data.Dataset) -> ray.data.Dataset:
    """``barrier_geometry`` per row: the passable sub-linestrings —
    the complement of level_rules barrier intervals (reference
    data.py:806-1014).  Rules: [] → whole geometry passable;
    a rule with value≠0 and no ``between`` → fully impassable (None);
    value≠0 with ``between=[a,b]`` → remove that arc fraction.
    Output adds ``barrier_coords`` (list of flat coord arrays, possibly
    empty) and ``is_fully_barrier``."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        passable_list, fully = [], []
        rules_col = (batch["level_rules"].tolist() if "level_rules" in batch
                     else [None] * len(batch))
        for coords, rules_raw in zip(batch["coords"], rules_col):
            coords = np.asarray(coords, np.float64)
            total = linestring_length(coords)
            rules = parse_json_permissive(rules_raw)
            intervals = []
            full_block = False
            for r in rules:
                if not isinstance(r, dict) or not r.get("value"):
                    continue
                between = r.get("between")
                if between is None:
                    full_block = True
                    break
                a, b = sorted((float(between[0]), float(between[1])))
                intervals.append((max(a, 0.0) * total, min(b, 1.0) * total))
            if full_block:
                passable_list.append([])
                fully.append(True)
                continue
            if not intervals:
                passable_list.append([coords])
                fully.append(False)
                continue
            intervals.sort()
            merged = [list(intervals[0])]
            for a, b in intervals[1:]:
                if a <= merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], b)
                else:
                    merged.append([a, b])
            pieces = []
            pos = 0.0
            for a, b in merged:
                if a - pos > 1e-9:
                    pieces.append(substring(coords, pos, a))
                pos = b
            if total - pos > 1e-9:
                pieces.append(substring(coords, pos, total))
            passable_list.append(pieces)
            fully.append(False)
        out = batch.copy()
        out["barrier_coords"] = passable_list
        out["is_fully_barrier"] = fully
        return out

    return segments.map_batches(fn, batch_format="pandas")


def cluster_segment_endpoints(segments: ray.data.Dataset, threshold: float,
                              id_col: str = "seg_id") -> ray.data.Dataset:
    """Snap endpoints to the mean of their grid bin (bin =
    floor(coord/threshold + 0.5) — floor-plus-half, NOT banker's
    rounding, so the SQL oracle reproduces it); the reference's
    groupby-transform
    (data.py:780-787) becomes: endpoints → group_agg(bin) mean →
    broadcast bin→centroid map → rewrite endpoint coords in
    map_batches.  Interior vertices are untouched."""

    def eps(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {"bx": [], "by": [], "x": [], "y": []}
        for c in batch["coords"]:
            c = np.asarray(c, np.float64)
            for px, py in ((c[0], c[1]), (c[-2], c[-1])):
                rows["bx"].append(int(np.floor(px / threshold + 0.5)))
                rows["by"].append(int(np.floor(py / threshold + 0.5)))
                rows["x"].append(px)
                rows["y"].append(py)
        return pd.DataFrame(rows)

    sums = shuffle.group_agg(
        segments.map_batches(eps, batch_format="pandas"), ["bx", "by"],
        {"sx": ("x", "sum"), "sy": ("y", "sum"), "n": ("x", "size")})
    cent = sums.to_pandas()
    cent["cx"] = cent["sx"] / cent["n"]
    cent["cy"] = cent["sy"] / cent["n"]
    cmap = {(int(r.bx), int(r.by)): (r.cx, r.cy) for r in cent.itertuples()}
    ref = ray.put(cmap)

    class Snap:
        def __init__(self):
            self.cmap = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out_coords = []
            for c in batch["coords"]:
                c = np.asarray(c, np.float64).copy()
                for i0, i1 in ((0, 1), (len(c) - 2, len(c) - 1)):
                    key = (int(np.floor(c[i0] / threshold + 0.5)),
                           int(np.floor(c[i1] / threshold + 0.5)))
                    if key in self.cmap:
                        c[i0], c[i1] = self.cmap[key]
                out_coords.append(c)
            out = batch.copy()
            out["coords"] = out_coords
            return out

    return segments.map_batches(Snap, batch_format="pandas", concurrency=(1, 8))


def deterministic_jitter(segments: ray.data.Dataset, magnitude: float = 1e-3,
                         salt: int = 0) -> ray.data.Dataset:
    """Deterministic hash-based sub-unit vertex jitter (reference
    utils/spatial.py:2282-2366): offset is a pure function of the
    coordinate + salt, so shared vertices (party walls) move
    identically on every worker — the property the tessellation retry
    ladder depends on."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out_coords = []
        for c in batch["coords"]:
            c = np.asarray(c, np.float64).reshape(-1, 2).copy()
            hx = np.sin(c[:, 0] * 12.9898 + c[:, 1] * 78.233 + salt) * 43758.5453
            hy = np.sin(c[:, 0] * 39.3468 + c[:, 1] * 11.135 + salt) * 24634.6345
            c[:, 0] += (hx - np.floor(hx) - 0.5) * 2 * magnitude
            c[:, 1] += (hy - np.floor(hy) - 0.5) * 2 * magnitude
            out_coords.append(c.reshape(-1))
        out = batch.copy()
        out["coords"] = out_coords
        return out

    return segments.map_batches(fn, batch_format="pandas")


def process_overture_segments(segments: ray.data.Dataset,
                              connector_threshold: float | None = None,
                              id_col: str = "seg_id") -> ray.data.Dataset:
    """The composed pipeline (reference process_overture_segments
    data.py:296-378): split at connectors → optional endpoint
    clustering → barrier geometries → length column."""
    out = split_segments_at_connectors(segments, id_col=id_col)
    if connector_threshold:
        out = cluster_segment_endpoints(out, connector_threshold, id_col=id_col)
    out = barrier_geometries(out)

    def lengths(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["length"] = [linestring_length(np.asarray(c))
                           for c in batch["coords"]]
        return batch

    return out.map_batches(lengths, batch_format="pandas")


def prepare_barriers(segments: ray.data.Dataset,
                     id_col: str = "seg_id") -> ray.data.Dataset:
    """Reference _prepare_barriers (morphology.py:2513-2563): prefer the
    alternative barrier geometry (the passable pieces from
    ``barrier_geometries``) over the raw geometry, drop empty /
    fully-impassable rows, explode multi-piece rows (ids suffixed
    ``_p{i}``).  Output: (seg_id, coords) ready for enclosure
    polygonization."""
    has_barrier = "barrier_coords" in segments.schema().names

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out_ids, out_coords = [], []
        ids = batch[id_col].tolist()
        if has_barrier:
            piece_col = batch["barrier_coords"].tolist()
            full_col = batch["is_fully_barrier"].tolist()
        else:
            piece_col = [[c] for c in batch["coords"]]
            full_col = [False] * len(batch)
        for rid, pieces, full in zip(ids, piece_col, full_col):
            if full or pieces is None or len(pieces) == 0:
                continue
            multi = len(pieces) > 1
            for i, piece in enumerate(pieces):
                piece = np.asarray(piece, np.float64)
                if len(piece) < 4:
                    continue
                out_ids.append(f"{rid}_p{i}" if multi else str(rid))
                out_coords.append(piece)
        return pd.DataFrame({id_col: out_ids, "coords": out_coords})

    return segments.map_batches(fn, batch_format="pandas")
