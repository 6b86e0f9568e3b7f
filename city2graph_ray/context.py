"""Dataset manifest — the engine's ``GraphMetadata`` equivalent.

The reference carries a dynamic schema object alongside its frames
(/root/reference/city2graph/base.py:30-219: crs, hetero-ness, node/edge
types, index names, geometry columns, per-type directedness).  In the
engine, a Dataset is plain Arrow columns; the manifest is a small
sidecar dict (JSON-serializable, broadcastable) that plays the same
role, plus CRS consistency checks at join boundaries
(base.py:685-738 ``ensure_crs_consistency``).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field


@dataclass
class TableManifest:
    """Schema roles for one logical table."""
    crs: str | None = None                 # e.g. "EPSG:27700"
    id_col: str = "id"
    geom_role: str | None = None           # point | linestring | polygon
    geom_cols: tuple[str, ...] = ("x", "y")  # or ("coords",)
    extra_geom_cols: tuple[str, ...] = ()  # barrier_geometry-style siblings


@dataclass
class GraphManifest:
    """Hetero-graph container manifest (reference base.py:86-148):
    node/edge table manifests keyed by type, per-edge-type directedness
    and whether symmetrization happened."""
    crs: str | None = None
    nodes: dict = field(default_factory=dict)       # type -> TableManifest
    edges: dict = field(default_factory=dict)       # (src,rel,dst) str -> TableManifest
    directed: dict = field(default_factory=dict)    # edge type -> bool
    symmetrized: dict = field(default_factory=dict)  # edge type -> bool

    def to_json(self) -> str:
        def enc(o):
            if isinstance(o, TableManifest):
                return asdict(o)
            raise TypeError(o)
        return json.dumps(asdict(self), default=enc)

    @classmethod
    def from_json(cls, s: str) -> "GraphManifest":
        d = json.loads(s)
        m = cls(crs=d.get("crs"))
        m.nodes = {k: TableManifest(**v) for k, v in d.get("nodes", {}).items()}
        m.edges = {k: TableManifest(**v) for k, v in d.get("edges", {}).items()}
        m.directed = d.get("directed", {})
        m.symmetrized = d.get("symmetrized", {})
        return m


class CrsMismatch(ValueError):
    pass


def ensure_crs_consistency(*manifests: TableManifest | GraphManifest) -> str | None:
    """Assert all tables share one CRS (reference base.py:685-738 —
    the engine asserts instead of silently reprojecting; reprojection
    is an explicit map_batches stage the caller opts into)."""
    crss = {m.crs for m in manifests if m.crs is not None}
    if len(crss) > 1:
        raise CrsMismatch(f"mixed CRS at join boundary: {sorted(crss)}")
    return next(iter(crss), None)
