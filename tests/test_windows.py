"""Window-op unit tests."""

import numpy as np
import pandas as pd


def test_percent_rank_cume_ties():
    import ray.data as rd
    from city2graph_ray.ops.windows import percent_rank_cume
    df = pd.DataFrame({"id": np.arange(6, dtype=np.int64),
                       "v": [3.0, 1.0, 3.0, 2.0, 1.0, 3.0]})
    out = (percent_rank_cume(rd.from_pandas(df).repartition(3), "v",
                             "id", num_buckets=4)
           .to_pandas().sort_values("id").reset_index(drop=True))
    # SQL semantics: pct = (rank-1)/(n-1); cume = #(<= v)/n
    want_pct = {1.0: 0.0, 2.0: 2 / 5, 3.0: 3 / 5}
    want_cume = {1.0: 2 / 6, 2.0: 3 / 6, 3.0: 1.0}
    for _, r in out.iterrows():
        assert r["pct_rank"] == want_pct[r["v"]]
        assert r["cume"] == want_cume[r["v"]]


def test_percent_rank_single_row():
    import ray.data as rd
    from city2graph_ray.ops.windows import percent_rank_cume
    df = pd.DataFrame({"id": [1], "v": [5.0]})
    out = percent_rank_cume(rd.from_pandas(df), "v", "id").to_pandas()
    assert out["pct_rank"].iloc[0] == 0.0 and out["cume"].iloc[0] == 1.0
