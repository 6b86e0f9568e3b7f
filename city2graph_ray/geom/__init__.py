"""Pure-numpy geometry layer (shapely is not available in this environment).

In-engine representation is Arrow-native:

- points → ``x``/``y`` float64 columns,
- linestrings / polygon exterior rings → ``coords`` ``list<double>``
  columns holding interleaved ``[x0, y0, x1, y1, ...]``,

which is zero-copy into numpy (Arrow ListArray = flat values + offsets).
WKT/WKB exist only at the ingress/egress boundary (interleaved document
spans carry WKT per FIXTURES.md §0).
"""

from city2graph_ray.geom import kernels, wkt  # noqa: F401
