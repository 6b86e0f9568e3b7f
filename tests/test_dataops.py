"""Training-data ops: dedup family, ANN, text analysis, mobility,
metapaths, media stages."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs_with_dups() -> pd.DataFrame:
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs for the party tonight",
        "how vexingly quick daft zebras jump over fences in the garden",
        "completely different content about the distributed data processing",
    ]
    rows = []
    i = 0
    for t in base:
        rows.append((i, t)); i += 1
        rows.append((i, t)); i += 1                       # exact dup
        rows.append((i, t.replace("the", "a")), ); i += 1  # near dup
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_exact_dedup(docs_with_dups):
    from city2graph_ray.text.dedup import exact_dedup
    out = exact_dedup(rd.from_pandas(docs_with_dups)).to_pandas()
    assert len(out) == 8  # 4 texts ×2 variants; exact pairs collapse
    assert out["group_size"].sum() == len(docs_with_dups)
    assert (out[out["group_size"] == 2]["doc_id"] % 3 == 0).all()  # min id wins


def test_minhash_dedup(docs_with_dups):
    from city2graph_ray.text.dedup import minhash_dedup
    out = minhash_dedup(rd.from_pandas(docs_with_dups),
                        threshold=0.4).to_pandas()
    cmap = dict(zip(out["doc_id"], out["cluster_id"]))
    # exact + near dup of the same base text cluster together
    for base in range(4):
        a, b, c = base * 3, base * 3 + 1, base * 3 + 2
        assert cmap[a] == cmap[b] == cmap[c] == a
    # different base texts stay apart
    assert len(set(cmap.values())) == 4


def test_minhash_dedup_md5_family(docs_with_dups):
    """The SQL-twin-able md5 hash family clusters the same fixture the
    same way as the default 'uni' family, and char-window shingles give
    the identical Jaccard as byte-packed shingles on ASCII text."""
    from city2graph_ray.text.dedup import (char_shingles,
                                           char_window_shingles, jaccard,
                                           minhash_dedup)
    out = minhash_dedup(rd.from_pandas(docs_with_dups), threshold=0.4,
                        hash_fn="md5").to_pandas()
    cmap = dict(zip(out["doc_id"], out["cluster_id"]))
    for base in range(4):
        a, b, c = base * 3, base * 3 + 1, base * 3 + 2
        assert cmap[a] == cmap[b] == cmap[c] == a
    assert len(set(cmap.values())) == 4
    for t, u in [("the quick brown fox", "the quick brown fix"),
                 ("ab", "ab"), ("abcd", "wxyz abcd")]:
        assert jaccard(char_shingles(t, 5), char_shingles(u, 5)) == \
            jaccard(char_window_shingles(t, 5), char_window_shingles(u, 5))


@pytest.mark.parametrize("order", ["df", "hash"])
def test_jaccard_join_exact_vs_brute(order):
    from city2graph_ray.text.dedup import (jaccard_join_exact, char_shingles,
                                           jaccard)
    rng = np.random.default_rng(3)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    texts = [" ".join(rng.choice(vocab, rng.integers(8, 30)))
             for _ in range(120)]
    texts += [texts[i] + " extra" for i in range(0, 30, 3)]  # near dups
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    out = (jaccard_join_exact(rd.from_pandas(df).repartition(6),
                              threshold=0.5, round_to=6, order=order)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    sh = [char_shingles(t, 5) for t in texts]
    brute = [(a, b, round(jaccard(sh[a], sh[b]), 6))
             for a in range(len(texts)) for b in range(a + 1, len(texts))
             if round(jaccard(sh[a], sh[b]), 6) >= 0.5]
    bdf = pd.DataFrame(brute, columns=["a", "b", "jaccard"])
    assert len(out) == len(bdf) and len(bdf) > 0
    pd.testing.assert_frame_equal(out, bdf, check_dtype=False)


def test_cosine_join_exact_vs_brute():
    from city2graph_ray.text.dedup import cosine_join_exact, char_shingles
    rng = np.random.default_rng(9)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    texts = [" ".join(rng.choice(vocab, rng.integers(8, 30)))
             for _ in range(120)]
    texts += [texts[i] + " extra" for i in range(0, 30, 3)]  # near dups
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    out = (cosine_join_exact(rd.from_pandas(df).repartition(6),
                             threshold=0.7, round_to=6, num_buckets=16)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    sh = [char_shingles(t, 5) for t in texts]
    brute = []
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            na, nb = len(sh[a]), len(sh[b])
            i = len(sh[a] & sh[b])
            if i * i * 100 >= 49 * na * nb:  # t = 7/10, all-integer
                brute.append((a, b, round(i / np.sqrt(float(na) * nb), 6)))
    bdf = pd.DataFrame(brute, columns=["a", "b", "cosine"])
    assert len(out) == len(bdf) and len(bdf) > 0
    pd.testing.assert_frame_equal(out, bdf, check_dtype=False)


def test_neardup_clusters_exact():
    from city2graph_ray.text.dedup import neardup_clusters_exact
    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["the quick brown fox jumps over the lazy dog tonight",
                 "the quick brown fox jumps over the lazy dog tonight!",
                 "a quick brown fox jumps over the lazy dog tonight",
                 "pack my box with five dozen liquor jugs right now ok",
                 "pack my box with five dozen liquor jugs right now ok",
                 "completely unrelated text about data processing engines"]})
    out = (neardup_clusters_exact(rd.from_pandas(df).repartition(3),
                                  threshold=0.6)
           .to_pandas().set_index("doc_id")["cluster_id"])
    assert out.loc[0] == out.loc[1] == out.loc[2] == 0   # transitive chain
    assert out.loc[3] == out.loc[4] == 3
    assert out.loc[5] == 5                               # singleton


def test_simhash_pairs(docs_with_dups):
    from city2graph_ray.text.dedup import simhash_pairs
    out = simhash_pairs(rd.from_pandas(docs_with_dups),
                        max_hamming=10).to_pandas()
    got = set(map(tuple, out[["a", "b"]].to_numpy()))
    for base in range(4):  # exact dups are hamming 0 → always found
        assert (base * 3, base * 3 + 1) in got


def test_jaccard_and_fingerprint():
    from city2graph_ray.text.dedup import char_shingles, jaccard
    a = char_shingles("abcdefgh", 3)
    assert jaccard(a, a) == 1.0
    assert jaccard(a, char_shingles("zzzzzzzz", 3)) == 0.0


def test_token_topk_tfidf_hash_sample():
    from city2graph_ray.text.analysis import (hash_sample, tfidf_top_terms,
                                              token_topk)
    rng = np.random.default_rng(7)
    vocab = ["Apple", "banana", "Cherry", "date", "egg", "fig", "grape"]
    texts = ["  ".join(rng.choice(vocab, rng.integers(5, 40))) + " "
             for _ in range(150)]
    df = pd.DataFrame({"doc_id": np.arange(150, dtype=np.int64),
                       "text": texts})
    docs = rd.from_pandas(df).repartition(5)

    allt = df.text.str.lower().str.split().explode()
    vc = allt.value_counts().reset_index()
    vc.columns = ["token", "cnt"]
    brute = (vc.sort_values(["cnt", "token"], ascending=[False, True])
             .head(5).reset_index(drop=True))
    out = token_topk(docs, k=5).to_pandas().reset_index(drop=True)
    assert (out.token.to_numpy() == brute.token.to_numpy()).all()
    assert (out.cnt.to_numpy() == brute.cnt.to_numpy()).all()

    N = len(df)
    tok = df.assign(token=df.text.str.lower().str.split()).explode("token")
    tf = tok.groupby(["doc_id", "token"]).size().rename("tf").reset_index()
    dfreq = tf.groupby("token").size().rename("df").reset_index()
    j = tf.merge(dfreq, on="token")
    j["score"] = j.tf * (np.log((N + 1.0) / (j.df + 1.0)) + 1.0)
    j = j.sort_values(["doc_id", "score", "token"],
                      ascending=[True, False, True], kind="stable")
    bt = j.groupby("doc_id").head(2)[["doc_id", "token", "score"]]
    bt = bt.assign(score=bt.score.round(6)).sort_values(
        ["doc_id", "token"]).reset_index(drop=True)
    out2 = (tfidf_top_terms(docs, m=2).to_pandas()
            .sort_values(["doc_id", "token"]).reset_index(drop=True))
    assert (out2.token.to_numpy() == bt.token.to_numpy()).all()
    assert np.allclose(out2.score, bt.score)

    out3 = hash_sample(docs, 0.3).to_pandas()
    ids = df.doc_id.to_numpy()
    keep = ((ids % 1000000007) * (2654435761 % 1000000007)) \
        % 1000000007 % 10000 < 3000
    assert set(out3.doc_id) == set(ids[keep]) and 0 < len(out3) < len(df)


def test_group_quantiles_exact():
    from city2graph_ray.ops.stats import group_quantiles
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"g": rng.choice(["a", "b", "c"], 5000),
                       "v": np.concatenate([rng.normal(0, 1, 2500),
                                            rng.exponential(2, 2500)])})
    df.loc[df.index[:500], "v"] = 7.0     # heavy ties in one bin
    out = (group_quantiles(rd.from_pandas(df).repartition(6), ["g"], "v",
                           qs=[0.5, 0.9, 0.99]).to_pandas()
           .set_index("g"))
    for g in ("a", "b", "c"):
        vals = df[df.g == g].v.to_numpy()
        for q in (0.5, 0.9, 0.99):
            want = round(float(np.quantile(vals, q, method="linear")), 6)
            assert out.loc[g, f"q{q}"] == want


def test_group_quantiles_bounded_collect():
    """Heavy-tie and hot-bin distributions: the recursive refinement
    must (a) resolve all-equal bins with NO value collect (vmin==vmax)
    and (b) re-histogram hot bins until each collected segment is under
    collect_cap, staying bit-equal to numpy throughout."""
    from city2graph_ray.ops.stats import group_quantiles
    rng = np.random.default_rng(11)
    # group "tie": 1 distinct value x 50k rows — zero rows may be
    # collected with a tiny cap; group "hot": 50k rows crammed into a
    # hair-width slice of the value range so round-0 puts nearly all of
    # them in one bin and refinement MUST recurse.
    hot = np.concatenate([rng.uniform(0.0, 1e-6, 49_999), [1000.0]])
    df = pd.DataFrame({
        "g": np.repeat(["tie", "hot"], 50_000),
        "v": np.concatenate([np.full(50_000, 3.25), hot])})
    out = (group_quantiles(rd.from_pandas(df).repartition(8), ["g"], "v",
                           qs=[0.5, 0.99], collect_cap=256,
                           round_to=None).to_pandas().set_index("g"))
    for g in ("tie", "hot"):
        vals = df[df.g == g].v.to_numpy()
        for q in (0.5, 0.99):
            assert out.loc[g, f"q{q}"] == float(
                np.quantile(vals, q, method="linear"))


def test_langid_markers():
    from city2graph_ray.text.analysis import lang_id
    df = pd.DataFrame({"doc_id": [0, 1, 2, 3],
                       "text": ["the cat and the dog of it",
                                "le chat et la maison",
                                "der hund und die katze",
                                "xyz qrs tuv"]})
    out = lang_id(rd.from_pandas(df)).to_pandas().set_index("doc_id")
    assert out.loc[0, "lang_pred"] == "en"
    assert out.loc[1, "lang_pred"] == "fr"
    assert out.loc[2, "lang_pred"] == "de"
    assert out.loc[3, "lang_pred"] == "und"


def test_rolling_fingerprint_shift_invariance():
    from city2graph_ray.text.analysis import rolling_fingerprints
    t = "shared long content body that stays identical across documents"
    df = pd.DataFrame({"doc_id": [0, 1], "text": [t, "PREFIX " + t]})
    out = rolling_fingerprints(rd.from_pandas(df)).to_pandas()
    # min-window hash is content-defined: surviving window usually shared
    assert len(out) == 2 and out["fp"].nunique() <= 2


def test_ann_exact_and_ivf_recall():
    from city2graph_ray.pipelines.tables import embeddings
    from city2graph_ray.vector.ann import ann_topk, ivf_topk
    emb = embeddings(SF_DIR)
    qdf = (emb.filter(lambda r: r["vec_id"] < 5).to_pandas()
           .rename(columns={"vec_id": "query_id"}))
    exact = ann_topk(emb, qdf, k=10).to_pandas()
    assert len(exact) == 50
    # self-match ranks first with cosine 1.0
    for q in range(5):
        top = exact[exact["query_id"] == q].sort_values(
            ["cosine", "vec_id"], ascending=[False, True]).iloc[0]
        assert top["vec_id"] == q and top["cosine"] == 1.0
    approx = ivf_topk(emb, qdf, k=10, n_centroids=8, nprobe=3).to_pandas()
    # recall@10 of the bucketed variant vs exact
    rec = []
    for q in range(5):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        rec.append(len(e & a) / len(e))
    assert np.mean(rec) >= 0.5


def test_lsh_topk_exact_config_and_recall():
    from city2graph_ray.pipelines.tables import embeddings
    from city2graph_ray.vector.ann import ann_topk, lsh_topk
    emb = embeddings(SF_DIR)
    qdf = (emb.filter(lambda r: r["vec_id"] < 5).to_pandas()
           .rename(columns={"vec_id": "query_id"}))
    exact = ann_topk(emb, qdf, k=10).to_pandas().sort_values(
        ["query_id", "cosine", "vec_id"],
        ascending=[True, False, True]).reset_index(drop=True)
    # probe-all configuration is bit-exact vs brute force
    full = lsh_topk(emb, qdf, k=10, nbits=3, nprobe=8).to_pandas().sort_values(
        ["query_id", "cosine", "vec_id"],
        ascending=[True, False, True]).reset_index(drop=True)
    pd.testing.assert_frame_equal(full, exact)
    # self-match survives multi-probe (query's own bucket always probed)
    approx = lsh_topk(emb, qdf, k=10, nbits=8, nprobe=8).to_pandas()
    for q in range(5):
        mine = approx[approx["query_id"] == q]
        assert q in set(mine["vec_id"])


def test_lsh_topk_neardup_recall():
    """The SRP-LSH contract: HIGH-similarity pairs collide with high
    probability (collision prob per bit = 1 - θ/π).  Queries are small
    perturbations of corpus rows; the source row must surface in the
    multi-probe top-10 for nearly all queries.  (Recall on mutually
    near-orthogonal random vectors is ≈ the probed-bucket fraction by
    design — not asserted.)"""
    from city2graph_ray.vector.ann import lsh_topk
    rng = np.random.default_rng(11)
    corpus_m = rng.normal(size=(400, 32))
    df = pd.DataFrame({"vec_id": np.arange(400, dtype=np.int64),
                       "embedding": [v.tolist() for v in corpus_m]})
    nq = 40
    qm = corpus_m[:nq] + rng.normal(scale=0.02, size=(nq, 32))
    qdf = pd.DataFrame({"query_id": np.arange(nq, dtype=np.int64),
                        "embedding": [v.tolist() for v in qm]})
    out = lsh_topk(rd.from_pandas(df), qdf, k=10, nbits=8,
                   nprobe=8).to_pandas()
    hits = sum(q in set(out[out["query_id"] == q]["vec_id"])
               for q in range(nq))
    assert hits / nq >= 0.9


def test_lsh_topk_validation():
    from city2graph_ray.vector.ann import lsh_topk
    with pytest.raises(ValueError):
        lsh_topk(None, None, nbits=0)
    with pytest.raises(ValueError):
        lsh_topk(None, None, nbits=63)


def test_embedding_neardup_exact():
    from city2graph_ray.vector.ann import embedding_neardup
    rng = np.random.default_rng(3)
    base = rng.normal(size=(20, 16))
    vecs = np.vstack([base, base[:3] + rng.normal(scale=1e-3, size=(3, 16))])
    df = pd.DataFrame({"vec_id": np.arange(len(vecs), dtype=np.int64),
                       "embedding": [v.tolist() for v in vecs]})
    out = embedding_neardup(rd.from_pandas(df), threshold=0.99,
                            n_centroids=1).to_pandas()
    got = set(map(tuple, out[["a", "b"]].to_numpy()))
    assert {(0, 20), (1, 21), (2, 22)} <= got


def test_od_graph_semantics():
    from city2graph_ray.ops.mobility import od_graph
    flows = pd.DataFrame({
        "source": [1, 2, 1, 3, 3, 9, 4],
        "target": [2, 1, 2, 3, 4, 1, 3],
        "weight": [5.0, 3.0, 2.0, 9.0, 1.0, 7.0, 2.0]})
    out = od_graph(rd.from_pandas(flows), zone_ids={1, 2, 3, 4},
                   threshold=3.0, undirected=True).to_pandas()
    got = {(r.source, r.target): r.weight for r in out.itertuples()}
    # 9→1 dropped (unknown zone), 3→3 self-loop dropped,
    # 1↔2 sums 5+3+2=10; 3↔4 sums 1+2=3 (>= threshold AFTER sum)
    assert got == {(1, 2): 10.0, (3, 4): 3.0}


def test_metapath_2hop():
    from city2graph_ray.ops.metapath import add_metapaths
    h1 = pd.DataFrame({"src": [1, 1, 2], "dst": [10, 11, 10],
                       "w1": [1.0, 2.0, 4.0]})
    h2 = pd.DataFrame({"src": [10, 10, 11], "dst": [100, 200, 100],
                       "w2": [10.0, 20.0, 40.0]})
    out = add_metapaths([rd.from_pandas(h1), rd.from_pandas(h2)],
                        attr_cols=("w1", "w2")).to_pandas()
    got = {(r.src, r.dst): (r.weight, r.w1_sum, r.w2_sum)
           for r in out.itertuples()}
    # paths 1→10→100, 1→10→200, 1→11→100, 2→10→100, 2→10→200
    assert got[(1, 100)] == (2, 3.0, 50.0)   # via 10 and via 11
    assert got[(1, 200)] == (1, 1.0, 20.0)
    assert got[(2, 100)] == (1, 4.0, 10.0)
    assert got[(2, 200)] == (1, 4.0, 20.0)


def test_metapath_by_weight():
    from city2graph_ray.ops.metapath import add_metapaths_by_weight
    edges = pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 4],
                          "weight": [1.0, 1.0, 1.0]})
    nodes = pd.DataFrame({"id": [1, 2, 3, 4]})
    out = add_metapaths_by_weight(rd.from_pandas(nodes), edges,
                                  min_cost=2.0, max_cost=2.5).to_pandas()
    got = set(map(tuple, out[["src", "dst"]].to_numpy()))
    assert got == {(1, 3), (3, 1), (2, 4), (4, 2)}


def test_media_stages():
    from city2graph_ray.media.stages import (FrameSampler, ImageFeatures,
                                             media_features)
    media = pd.DataFrame({"media_id": [1, 2],
                          "payload": [b"\x01" * 100, b"\x02" * 64]})
    feats = media_features(rd.from_pandas(media)).to_pandas()
    assert len(feats) == 2
    assert all(len(f) == 16 for f in feats["feature"])
    # deterministic: same payload → same features
    again = media_features(rd.from_pandas(media)).to_pandas()
    assert feats.sort_values("media_id")["feature"].tolist() == \
        again.sort_values("media_id")["feature"].tolist()
    with pytest.raises(NotImplementedError):
        ImageFeatures(use_stub=False)
    frames = rd.from_pandas(media).map_batches(
        FrameSampler(every_k=2, frame_bytes=16), batch_format="pandas",
        batch_size=1).to_pandas()
    assert (frames[frames["media_id"] == 1]["frame_idx"].tolist()
            == [0, 2, 4])  # 100//16 = 6 frames, every 2nd


def test_adjacency_nan_negative_policy():
    """Reference mobility data-quality policy (mobility.py:542-568 and
    tests/test_mobility.py:292): NaN → 0 with a warning, negatives
    kept with a warning; undirected self-loops survive when kept."""
    import warnings

    from city2graph_ray.ops.mobility import adjacency_to_edgelist, od_graph
    m = np.array([[1.0, np.nan], [-2.0, 3.0]])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        el = adjacency_to_edgelist(m, ["a", "b"])
    assert len(w) == 2
    assert sorted(el["weight"]) == [-2.0, 1.0, 3.0]  # NaN cell dropped as 0

    flows = pd.DataFrame({"source": [1, 1], "target": [1, 2],
                          "weight": [5.0, 1.0]})
    out = od_graph(rd.from_pandas(flows), undirected=True,
                   keep_self_loops=True).to_pandas()
    loop = out[(out["source"] == 1) & (out["target"] == 1)]
    assert len(loop) == 1 and loop["weight"].iloc[0] == 5.0


def test_extract_json_field_paths():
    """Fast-regex and loads-fallback rows: numbers, quoted strings
    with escapes, bool/null, nested objects, malformed JSON."""
    import ray.data as rd

    from city2graph_ray.ops.jsoncol import extract_json_field
    df = pd.DataFrame({
        "id": np.arange(8, dtype=np.int64),
        "props": [
            '{"k": 69}',
            '{"k": -3.5, "z": 1}',
            '{"k": "he\\"y"}',
            '{"k": true}',
            '{"k": null}',
            '{"a": {"k": "inner"}, "k": 7}',
            '{"other": 1}',
            'not json',
        ]})
    out = (extract_json_field(rd.from_pandas(df), "props", "k")
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert out["k"].tolist() == [
        "69", "-3.5", 'he"y', "true", "", "7", "", ""]


def test_line_dedup_corpus():
    from city2graph_ray.text.dedup import line_dedup
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "a b c d e f g h unique tail zero",   # lines: "a b c d","e f g h",...
            "a b c d x y z w",                    # shares "a b c d"
            "e f g h",                            # single line, duplicated
            "solo",                               # shorter than one line
        ],
    })
    out = (line_dedup(rd.from_pandas(docs), words_per_line=4, max_count=1)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out.columns) == ["doc_id", "text_clean", "n_kept", "n_dropped"]
    # "a b c d" (docs 0,1) and "e f g h" (docs 0,2) are corpus-duplicated
    assert out.loc[0, "text_clean"] == "unique tail zero"
    assert out.loc[0, "n_kept"] == 1 and out.loc[0, "n_dropped"] == 2
    assert out.loc[1, "text_clean"] == "x y z w"
    assert out.loc[2, "text_clean"] == "" and out.loc[2, "n_kept"] == 0
    assert out.loc[3, "text_clean"] == "solo"
    assert out["n_kept"].dtype == np.int64


def test_split_lines_order_and_tail():
    from city2graph_ray.text.dedup import split_lines
    docs = pd.DataFrame({"doc_id": [7], "text": ["w1 w2 w3 w4 w5 w6 w7"]})
    out = (split_lines(rd.from_pandas(docs), words_per_line=3)
           .to_pandas().sort_values("line_no"))
    assert out["line"].tolist() == ["w1 w2 w3", "w4 w5 w6", "w7"]
    assert out["line_no"].tolist() == [0, 1, 2]


def test_bigram_lift_exact():
    from city2graph_ray.text.analysis import bigram_lift
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a b a b x", "a b y", "c c c"],
    })
    out = (bigram_lift(rd.from_pandas(docs), k=10, min_count=2)
           .to_pandas())
    # bigrams: (a,b)x3, (b,a)x1, (b,x)... only (a,b) and (c,c) reach 2
    # unigrams: a=3 b=3 x=1 y=1 c=3; N_uni=11; N_big=8
    got = dict(zip(zip(out.w1, out.w2), out.cxy))
    assert got == {("a", "b"): 3, ("c", "c"): 2}
    ab = out[(out.w1 == "a") & (out.w2 == "b")]["lift"].iloc[0]
    assert ab == ((3.0 * 11) * 11) / ((8.0 * 3) * 3)


def test_group_corr_exact():
    from city2graph_ray.ops.stats import group_corr
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 100, 200).round(2)
    y = (2 * x + rng.normal(0, 10, 200)).round(2)
    df = pd.DataFrame({"g": np.repeat(["a", "b"], 100), "x": x, "y": y})
    out = (group_corr(rd.from_pandas(df), ["g"], "x", "y")
           .to_pandas().sort_values("g").reset_index(drop=True))
    for i, g in enumerate(["a", "b"]):
        sub = df[df.g == g]
        ux = np.floor(sub.x.to_numpy() * 100 + 0.5)
        uy = np.floor(sub.y.to_numpy() * 100 + 0.5)
        want = np.corrcoef(ux, uy)[0, 1]
        assert abs(out.loc[i, "corr"] - want) < 1e-9
        assert out.loc[i, "n"] == 100


def test_melt_roundtrip():
    from city2graph_ray import shuffle
    df = pd.DataFrame({"id": [1, 2], "a": [10, 20], "b": [30, 40]})
    out = (shuffle.melt(rd.from_pandas(df), ["id"], ["a", "b"])
           .to_pandas().sort_values(["id", "metric"]).reset_index(drop=True))
    assert out["value"].tolist() == [10, 30, 20, 40]
    assert out["metric"].tolist() == ["a", "b", "a", "b"]


def test_dsir_logratio_prefers_target_like_docs():
    from city2graph_ray.text.analysis import dsir_logratio
    docs = pd.DataFrame({
        "doc_id": range(6),
        "text": ["apple banana apple", "apple apple banana",
                 "zebra yak zebra", "zebra zebra yak",
                 "apple zebra banana", "yak apple zebra"],
    })
    target = docs.iloc[:2]  # target distribution = fruit docs
    out = dsir_logratio(rd.from_pandas(docs),
                        rd.from_pandas(target)).to_pandas()
    out = out.set_index("doc_id")["dsir_logratio"]
    # fruit docs must outscore zebra docs under the fruit target LM
    assert min(out[0], out[1]) > max(out[2], out[3])


def test_lexical_diversity_hand_fixture():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from city2graph_ray.text.analysis import lexical_diversity

    docs = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 4], np.int64),
        "text": ["a b a b a",          # f={a:3,b:2} num=6+2=8 den=20
                 "x y z",              # all hapax num=0
                 "solo",               # 1 token -> dropped
                 "t t"]})              # f={t:2} num=2 den=2
    out = (lexical_diversity(rd.from_pandas(docs))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 2, 4]
    assert out["n_tokens"].tolist() == [5, 3, 2]
    assert out["n_hapax"].tolist() == [0, 3, 0]
    assert out["repeat_rate"].tolist() == [0.4, 0.0, 1.0]


def test_chunk_documents_bruteforce():
    import ray.data as rd

    from city2graph_ray.text.analysis import chunk_documents
    texts = ["", "short", "x" * 150, "y" * 151, "z" * 450,
             "héllo wörld " * 30]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    out = (chunk_documents(rd.from_pandas(df).repartition(3),
                           size=200, stride=150)
           .to_pandas().sort_values(["doc_id", "chunk_id"])
           .reset_index(drop=True))
    rows = []
    for i, t in enumerate(texts):
        p = 0
        c = 0
        while p < len(t):
            rows.append((i, c, p, t[p:p + 200]))
            p += 150
            c += 1
    assert len(out) == len(rows)
    for (i, c, p, ch), (_, r) in zip(rows, out.iterrows()):
        assert (r["doc_id"], r["chunk_id"], r["chunk_pos"]) == (i, c, p)
        assert r["chunk"] == ch


def test_chunk_documents_rejects_bad_params():
    import pytest
    import ray.data as rd

    from city2graph_ray.text.analysis import chunk_documents
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["a"]}))
    with pytest.raises(ValueError):
        chunk_documents(ds, size=0)
    with pytest.raises(ValueError):
        chunk_documents(ds, stride=-1)


def test_textrank_terms_bruteforce():
    import hashlib

    from city2graph_ray.text.analysis import textrank_terms
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["the cat sat on the mat",
                 "the dog sat on the log",
                 "cat and dog play",
                 "mat and log float"]})
    out = textrank_terms(rd.from_pandas(docs).repartition(2), k=5,
                         num_iters=3, num_buckets=4).to_pandas()

    def h(t):
        return int.from_bytes(hashlib.md5(t.encode()).digest()[8:16],
                              "little") >> 1

    # brute-force: build distinct bidirectional adjacency, 3 rounded
    # pagerank iterations, top-5
    pairs = set()
    id2term = {}
    for t in docs["text"]:
        toks = t.lower().split()
        for w in toks:
            id2term[h(w)] = w
        for a, b in zip(toks, toks[1:]):
            pairs.add((h(a), h(b)))
            pairs.add((h(b), h(a)))
    nodes = sorted({u for u, _ in pairs} | {v for _, v in pairs})
    n = float(len(nodes))
    deg = {}
    for u, _ in pairs:
        deg[u] = deg.get(u, 0) + 1
    r = {v: round(1.0 / n, 10) for v in nodes}
    for _ in range(3):
        s = {}
        for u, v in pairs:
            s[v] = s.get(v, 0.0) + r[u] / deg[u]
        r = {v: round(0.15 / n + 0.85 * s.get(v, 0.0), 10)
             for v in nodes}
    want = sorted(((round(r[v], 9), id2term[v]) for v in nodes),
                  key=lambda x: (-x[0], x[1]))[:5]
    # ranks can sit on a half-way 10-dp decimal where the 9-dp finish
    # differs by 1e-9 across summation orders — the bit-exact check
    # is the SQL twin (same order both sides); here assert tolerance
    assert set(out["term"]) == {t for _, t in want}
    got = dict(zip(out["term"], out["rank"]))
    for rk, t in want:
        assert abs(got[t] - rk) <= 2e-9


def test_oov_rate_bruteforce():
    from city2graph_ray.text.analysis import oov_rate
    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": ["a a a b", "b c", "d e f", "a b c d", ""]})
    out = (oov_rate(rd.from_pandas(docs).repartition(2), vocab_k=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # vocab: counts a=5,b=3 → top2 = {a, b}
    want = {0: (4, 0), 1: (2, 1), 2: (3, 3), 3: (4, 2)}
    assert out["doc_id"].tolist() == sorted(want)
    for _, r in out.iterrows():
        n, o = want[r["doc_id"]]
        assert (r["n_tokens"], r["n_oov"]) == (n, o)
        assert r["oov_rate"] == round(o / n, 6)


def test_cdc_chunks_edit_stability_and_coverage():
    import hashlib

    from city2graph_ray.text.analysis import cdc_chunks
    rng = np.random.default_rng(43)
    base = "".join(rng.choice(list("abcdefgh "), 400))
    edited = base[:200] + "XYZ" + base[200:]   # one insert mid-doc
    docs = pd.DataFrame({"doc_id": np.array([0, 1], np.int64),
                         "text": [base, edited]})
    out = (cdc_chunks(rd.from_pandas(docs), w=8, div=32)
           .to_pandas().sort_values(["doc_id", "chunk_id"])
           .reset_index(drop=True))
    # chunks tile each doc exactly
    for did, t in zip(docs["doc_id"], docs["text"]):
        g = out[out["doc_id"] == did]
        assert g["start_pos"].iloc[0] == 1
        assert int(g["chunk_len"].sum()) == len(t)
        assert (g["start_pos"].to_numpy()[1:]
                == (g["start_pos"] + g["chunk_len"])
                .to_numpy()[:-1]).all()

    # content-defined: most chunks survive an edit (shared hashes)
    def hset(did):
        return set(out[out["doc_id"] == did]["chunk_h"])

    shared = hset(0) & hset(1)
    assert len(shared) >= max(1, len(hset(0)) - 3)

    # chunk hash convention matches md5 lower-64 // 2
    g0 = out[out["doc_id"] == 0].iloc[0]
    chunk = base[:int(g0["chunk_len"])]
    want = int.from_bytes(hashlib.md5(chunk.encode()).digest()[8:16],
                          "little") >> 1
    assert int(g0["chunk_h"]) == want


def test_bigram_logprob_bruteforce():
    import math

    from city2graph_ray.text.analysis import bigram_logprob
    docs = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["the cat sat", "the cat ran fast", "solo"]})
    out = (bigram_logprob(rd.from_pandas(docs).repartition(2),
                          num_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    toks = [t.lower().split() for t in docs["text"]]
    bg = [(w[i], w[i + 1]) for w in toks for i in range(len(w) - 1)]
    from collections import Counter
    c2 = Counter(bg)
    c1 = Counter(p for p, _ in bg)
    vocab = {w for t in toks for w in t}
    v = float(len(vocab))
    assert out["doc_id"].tolist() == [0, 1]   # 'solo' has no bigrams
    for _, r in out.iterrows():
        w = toks[int(r["doc_id"])]
        lps = [math.log((c2[(a, b)] + 1) / (c1[a] + v))
               for a, b in zip(w, w[1:])]
        assert int(r["n_bigrams"]) == len(lps)
        assert abs(r["logprob"] - round(sum(lps) / len(lps), 6)) \
            <= 2e-9
