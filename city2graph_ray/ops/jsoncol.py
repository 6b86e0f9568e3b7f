"""JSON-column field extraction — the semi-structured ingestion stage
(event props, API payloads).  Engine-added; pairs with the permissive
JSON parsing the segment pipeline does for Overture attributes
(reference data.py:705-732), generalized to any string column.

Scale shape: ONE vectorized C-regex pass per batch extracts the scalar
for flat ``"field": value`` objects (the overwhelmingly common case);
only rows the regex misses fall back to a real ``json.loads`` — the
same fast/slow split as the interleaved WKT ingest.  Row-local, no
shuffle.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd
import ray.data


def _pattern(field: str) -> str:
    f = re.escape(field)
    return (rf'"{f}"\s*:\s*("(?:[^"\\]|\\.)*"'
            rf'|-?[0-9][0-9.eE+\-]*|true|false|null)')


def extract_json_field(ds: ray.data.Dataset, col: str, field: str,
                       out_col: str | None = None) -> ray.data.Dataset:
    """Add ``out_col`` (default ``{field}``) with the string form of
    ``$.field`` from the JSON in ``col`` — numbers keep their literal
    form, strings are unquoted, absent/null fields give ``''`` (the
    DuckDB ``json_extract_string`` convention, so the driver oracle is
    bit-exact).  Cast downstream as needed."""
    out_col = out_col or field
    rx = _pattern(field)

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        s = b[col].astype(str)
        tok = s.str.extract(rx, expand=False)
        # the regex would match a NESTED "field" first; only flat
        # single-object rows ride the fast path ($.field is top-level)
        miss = tok.isna() | (s.str.count("{") > 1)
        vals = tok.fillna("")
        # strip quotes on string scalars; JSON-unescape via json.loads
        quoted = vals.str.startswith('"')
        if quoted.any():
            vals[quoted] = [json.loads(v) for v in vals[quoted]]
        if miss.any():  # nested / exotic rows: real parse
            def slow(txt: str) -> str:
                try:
                    v = json.loads(txt).get(field)
                except (ValueError, AttributeError):
                    return ""
                if v is None:
                    return ""
                if isinstance(v, bool):
                    return "true" if v else "false"
                return str(v)
            vals[miss] = [slow(t) for t in s[miss]]
        vals[vals == "null"] = ""
        out[out_col] = vals
        return out

    return ds.map_batches(fn, batch_format="pandas")
