"""Property-based tests (hypothesis) for the pure kernels every
distributed operator leans on: cell packing, covering cells, URL query
canonicalization, WKT round trip, GTFS time parsing."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

COORD = st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False)


@settings(max_examples=200, deadline=None)
@given(x=COORD, y=COORD,
       cs=st.floats(min_value=0.01, max_value=1e4))
def test_cell_id_roundtrip(x, y, cs):
    from city2graph_ray.cells import cell_id, cell_xy
    cell = cell_id(np.array([x]), np.array([y]), cs)
    ix, iy = cell_xy(cell)
    assert ix[0] == np.floor(x / cs)
    assert iy[0] == np.floor(y / cs)


@settings(max_examples=100, deadline=None)
@given(x0=COORD, y0=COORD,
       w=st.floats(min_value=0.0, max_value=500.0),
       h=st.floats(min_value=0.0, max_value=500.0),
       cs=st.floats(min_value=0.5, max_value=100.0),
       px=st.floats(min_value=0.0, max_value=1.0),
       py=st.floats(min_value=0.0, max_value=1.0))
def test_covering_cells_contains_interior_points(x0, y0, w, h, cs,
                                                 px, py):
    """Any point inside a bbox has its cell among the bbox's covering
    cells — the invariant the exactly-once spatial joins rely on."""
    from city2graph_ray.cells import cell_id, covering_cells
    x1, y1 = x0 + w, y0 + h
    _, cl = covering_cells(np.array([x0]), np.array([y0]),
                           np.array([x1]), np.array([y1]), cs)
    qx, qy = x0 + px * w, y0 + py * h
    c = cell_id(np.array([qx]), np.array([qy]), cs)[0]
    assert c in set(cl.tolist())


PARAM = st.text(alphabet="abz=123&u_", min_size=0, max_size=12)


@settings(max_examples=200, deadline=None)
@given(params=st.lists(st.text(alphabet="abz=123u_", min_size=0,
                               max_size=8), max_size=6))
def test_canon_query_idempotent_and_order_invariant(params):
    import random

    from city2graph_ray.text.urls import _canon_query
    q = "&".join(params)
    once = _canon_query(q)
    assert _canon_query(once) == once
    shuffled = params[:]
    random.Random(0).shuffle(shuffled)
    assert _canon_query("&".join(shuffled)) == once


@settings(max_examples=200, deadline=None)
@given(coords=st.lists(
    st.tuples(st.floats(min_value=-1e5, max_value=1e5,
                        allow_nan=False).map(lambda v: round(v, 6)),
              st.floats(min_value=-1e5, max_value=1e5,
                        allow_nan=False).map(lambda v: round(v, 6))),
    min_size=2, max_size=8))
def test_wkt_linestring_roundtrip(coords):
    from city2graph_ray.geom import wkt
    flat = np.array([v for xy in coords for v in xy], np.float64)
    text = wkt.emit_linestring(flat)
    kind, back = wkt.parse(text)
    assert kind == "LINESTRING"
    # %.10g keeps 10 significant digits — exact for these magnitudes
    assert np.allclose(back, flat, rtol=0, atol=1e-4)


@settings(max_examples=200, deadline=None)
@given(s=st.integers(min_value=0, max_value=48 * 3600 - 1))
def test_time_to_seconds_roundtrip(s):
    from city2graph_ray.ops.transport import time_to_seconds
    hms = f"{s // 3600:02d}:{s % 3600 // 60:02d}:{s % 60:02d}"
    assert time_to_seconds(hms) == float(s)
