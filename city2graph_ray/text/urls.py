"""URL canonicalization + registered-domain extraction — the standard
web-corpus curation stage (C4 / RefinedWeb dedup-key normalization).

Engine-added operator (no reference counterpart; the reference is a
spatial library).  ``canonicalize_urls`` rewrites a URL column into a
stable dedup/grouping key:

- scheme and host lowercased,
- default ports stripped (``:80`` for http, ``:443`` for https);
  non-default ports kept in ``url_canon`` but never in ``host``,
- fragment dropped,
- tracking query params dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``ref``), remaining params sorted lexicographically,
- trailing path slashes collapsed (empty path → ``/``),

and derives ``host`` and the registered domain (last two host labels,
or last three when the suffix is a known second-level public suffix
such as ``co.uk``) — the key a per-domain cap / per-domain stats stage
groups on.

Scale shape: a stateless vectorized ``map_batches`` — the URL split is
ONE pandas ``str.extract`` (C regex) per batch, the host/port/path
rules are vectorized string kernels, and only rows that actually carry
a query string (``?``) take the per-row param-sort path (bounded by
the count of '?' rows, not corpus size).  Nothing shuffles.

Every rule is deliberately mirrorable in ANSI-ish SQL (DuckDB
``regexp_extract`` groups + ``list_sort``/``list_filter`` lambdas),
which is what makes the driver queries bit-exact against their twins.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data

# split once: scheme :// authority path ?query #fragment
URL_RX = (r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)"
          r"(?:\?([^#]*))?(?:#(.*))?$")

# param names dropped from the query string (RE2-portable, no
# lookaround — identical under Python re and DuckDB regexp_matches)
TRACKING_RX = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="

# second-level public suffixes where the registered domain keeps THREE
# labels (deliberately small + explicit so the SQL twin can inline it)
SECOND_LEVEL_SUFFIXES: tuple[str, ...] = (
    "co.uk", "ac.uk", "gov.uk", "com.au", "co.jp", "com.br",
    "co.in", "co.nz", "com.cn",
)

_TRACKING = re.compile(TRACKING_RX)


def _canon_query(q: str) -> str:
    """Drop tracking params, drop empties, sort the rest (codepoint
    order == DuckDB list_sort on ASCII), rejoin with '&'."""
    keep = sorted(p for p in q.split("&")
                  if p and not _TRACKING.match(p))
    return "&".join(keep)


def canonicalize_urls(docs: ray.data.Dataset, url_col: str = "url",
                      ) -> ray.data.Dataset:
    """Add ``url_canon``, ``host`` and ``domain`` columns derived from
    ``url_col``; other columns pass through.  Rows whose URL does not
    match ``scheme://...`` get empty-string outputs (kept, flagged by
    ``url_canon == ''`` — a filter stage decides their fate)."""

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        s = b[url_col].astype(str)
        parts = s.str.extract(URL_RX)  # 0 scheme 1 auth 2 path 3 q 4 frag
        ok = parts[0].notna()
        scheme = parts[0].fillna("").str.lower()
        auth = parts[1].fillna("").str.lower()
        port = auth.str.extract(r":(\d+)$")[0].fillna("")
        host = auth.str.replace(r":\d+$", "", regex=True)
        # default ports vanish; others survive in the canon URL only
        default_port = ((scheme == "http") & (port == "80")) | \
                       ((scheme == "https") & (port == "443"))
        portpart = pd.Series(
            np.where((port != "") & ~default_port, ":" + port, ""),
            index=b.index)
        path = parts[2].fillna("").str.replace(r"/+$", "", regex=True)
        path = pd.Series(np.where(path == "", "/", path), index=b.index)
        q = parts[3].fillna("")
        has_q = q != ""
        if has_q.any():  # per-row sort only for rows that carry params
            q = q.copy()
            q[has_q] = [_canon_query(v) for v in q[has_q]]
        qpart = pd.Series(np.where(q != "", "?" + q, ""), index=b.index)
        canon = scheme + "://" + host + portpart + path + qpart

        last2 = host.str.extract(r"([^.]+\.[^.]+)$")[0]
        last3 = host.str.extract(r"([^.]+\.[^.]+\.[^.]+)$")[0]
        domain = pd.Series(
            np.where(last2.isin(SECOND_LEVEL_SUFFIXES) & last3.notna(),
                     last3.fillna(""),
                     np.where(last2.notna(), last2.fillna(""), host)),
            index=b.index)

        out["url_canon"] = canon.where(ok, "")
        out["host"] = host.where(ok, "")
        out["domain"] = domain.where(ok, "")
        return out

    return docs.map_batches(fn, batch_format="pandas")


def per_domain_cap(docs: ray.data.Dataset, cap: int,
                   domain_col: str = "domain", id_col: str = "doc_id",
                   num_buckets: int | None = None) -> ray.data.Dataset:
    """RefinedWeb-style per-domain document cap: keep at most ``cap``
    docs per registered domain, chosen by the deterministic md5
    rank-hash of the id (reshard-stable, bit-reproducible).  Output
    (domain_col, id_col).  This is :func:`stratified_sample` keyed on
    the domain — shuffle bytes ∝ domains × cap per batch."""
    from city2graph_ray.text.analysis import stratified_sample
    return stratified_sample(docs, [domain_col], cap, id_col=id_col,
                             num_buckets=num_buckets)
