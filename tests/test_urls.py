"""URL canonicalization / registered-domain / per-domain cap."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
import ray.data

from city2graph_ray.text.urls import canonicalize_urls, per_domain_cap

CASES = [
    # (raw, canon, host, domain)
    ("HTTP://Sub.Example.CO.UK:80/a/b/?b=2&utm_source=x&a=1#frag",
     "http://sub.example.co.uk/a/b?a=1&b=2",
     "sub.example.co.uk", "example.co.uk"),
    ("https://WWW.Site.com:443",
     "https://www.site.com/", "www.site.com", "site.com"),
    ("https://site.io:8080/x//",
     "https://site.io:8080/x", "site.io", "site.io"),
    ("ftp://Files.Example.com:21/data",
     "ftp://files.example.com:21/data",
     "files.example.com", "example.com"),
    ("https://a.b.c.com/p?gclid=1&fbclid=2&ref=x",
     "https://a.b.c.com/p", "a.b.c.com", "c.com"),
    ("https://localhost/x", "https://localhost/x",
     "localhost", "localhost"),
    ("notaurl", "", "", ""),
    ("https://x.com/p?z=1&y=2&y=1",
     "https://x.com/p?y=1&y=2&z=1", "x.com", "x.com"),
]


def _run(urls: list[str]) -> pd.DataFrame:
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(urls), dtype=np.int64), "url": urls}))
    return canonicalize_urls(ds).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)


def test_canonicalize_cases():
    out = _run([c[0] for c in CASES])
    for i, (_, canon, host, domain) in enumerate(CASES):
        assert out.loc[i, "url_canon"] == canon, CASES[i][0]
        assert out.loc[i, "host"] == host, CASES[i][0]
        assert out.loc[i, "domain"] == domain, CASES[i][0]


def test_canonicalize_idempotent():
    first = _run([c[0] for c in CASES if c[1]])
    again = _run(list(first["url_canon"]))
    assert list(again["url_canon"]) == list(first["url_canon"])
    assert list(again["host"]) == list(first["host"])
    assert list(again["domain"]) == list(first["domain"])


def test_passthrough_columns():
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "url": ["https://a.com/x"] * 3,
        "extra": ["p", "q", "r"]}))
    out = canonicalize_urls(ds).to_pandas()
    assert list(out["extra"]) == ["p", "q", "r"]
    assert "url" in out.columns


def _md5_rank(i: int) -> int:
    return int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:16],
                          "little")


def test_per_domain_cap_matches_bruteforce():
    n = 200
    doms = [f"d{i % 5}.com" for i in range(n)]
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "domain": doms})).repartition(7)
    got = per_domain_cap(ds, 3, num_buckets=4).to_pandas()
    got = got.sort_values(["domain", "doc_id"]).reset_index(drop=True)

    df = pd.DataFrame({"doc_id": np.arange(n), "domain": doms})
    df["h"] = [_md5_rank(i) for i in df["doc_id"]]
    want = (df.sort_values(["h", "doc_id"]).groupby("domain").head(3)
            [["domain", "doc_id"]]
            .sort_values(["domain", "doc_id"]).reset_index(drop=True))
    assert got["domain"].tolist() == want["domain"].tolist()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got.groupby("domain").size().max() <= 3


def test_per_domain_cap_reshard_stable():
    n = 120
    doms = [f"d{i % 3}.org" for i in range(n)]
    base = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "domain": doms})
    outs = []
    for parts in (1, 9):
        ds = ray.data.from_pandas(base).repartition(parts)
        out = per_domain_cap(ds, 4, num_buckets=2).to_pandas()
        outs.append(out.sort_values(["domain", "doc_id"])
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_normalize_text_rules():
    from city2graph_ray.text.normalize import normalize_text
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["  Hello\t\tWORLD \n", "a\x07b", "", "x  y"]}))
    out = (normalize_text(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["text_norm"].tolist() == ["hello world", "ab", "", "x y"]
    assert out["norm_len"].tolist() == [11, 2, 0, 3]
    # idempotent
    again = normalize_text(ray.data.from_pandas(
        pd.DataFrame({"doc_id": out["doc_id"],
                      "text": out["text_norm"]}))).to_pandas()
    assert sorted(again["text_norm"]) == sorted(out["text_norm"])


def test_canonicalize_empty_corpus():
    empty = pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                          "url": pd.Series(dtype=object)})
    out = canonicalize_urls(ray.data.from_pandas(empty))
    assert out.count() == 0
