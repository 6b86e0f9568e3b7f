"""Minimal WKT parse/emit for POINT / LINESTRING / POLYGON.

The interleaved-document ingress (FIXTURES.md §0) carries geometry as
WKT inside span ``text``; this module converts those to the engine's
flat-coords representation.  Only the subset the reference's fixtures
exercise is supported: 2-D POINT, LINESTRING, POLYGON (exterior ring +
optional holes; holes are parsed but the engine's round-1 operators use
exterior rings only, matching the reference test corpus of simple
Overture footprints).
"""

from __future__ import annotations

import re

import numpy as np

_NUM = r"[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?"
_PAIR_RE = re.compile(rf"({_NUM})\s+({_NUM})")
_HEAD_RE = re.compile(r"^\s*(POINT|LINESTRING|POLYGON)\s*", re.I)


def parse(text: str) -> tuple[str, np.ndarray]:
    """Parse one WKT string → (kind, coords) with coords flat [x0,y0,...].

    For POLYGON only the exterior ring is returned (first paren group).
    """
    m = _HEAD_RE.match(text)
    if not m:
        raise ValueError(f"unsupported WKT: {text[:40]!r}")
    kind = m.group(1).upper()
    body = text[m.end():]
    if kind == "POLYGON":
        # exterior ring = first '(...)' inside the outer parens
        inner = body[body.index("(") + 1:]
        ring = inner[inner.index("(") + 1: inner.index(")")]
        body = ring
    pairs = _PAIR_RE.findall(body)
    coords = np.array(pairs, dtype=np.float64).reshape(-1) if pairs else np.empty(0)
    return kind, coords


def emit_point(x: float, y: float) -> str:
    return f"POINT ({x:.10g} {y:.10g})"


def emit_linestring(coords: np.ndarray) -> str:
    c = np.asarray(coords, np.float64).reshape(-1, 2)
    body = ", ".join(f"{x:.10g} {y:.10g}" for x, y in c)
    return f"LINESTRING ({body})"


def emit_polygon(coords: np.ndarray) -> str:
    c = np.asarray(coords, np.float64).reshape(-1, 2)
    if len(c) and not (c[0] == c[-1]).all():
        c = np.vstack([c, c[:1]])
    body = ", ".join(f"{x:.10g} {y:.10g}" for x, y in c)
    return f"POLYGON (({body}))"
