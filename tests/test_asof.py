"""as-of and range (interval) joins vs driver-side pandas oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _mk(seed: int, n_left: int, n_right: int, n_users: int):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01").value
    left = pd.DataFrame({
        "event_id": np.arange(n_left, dtype=np.int64),
        "ts": pd.to_datetime(base + rng.integers(0, 10 ** 9 * 86400, n_left)),
        "user_id": rng.integers(0, n_users, n_left).astype(np.int64),
        "amount": rng.random(n_left).round(3),
    })
    right = pd.DataFrame({
        "ref_id": np.arange(n_right, dtype=np.int64) + 10_000,
        "ts": pd.to_datetime(base + rng.integers(0, 10 ** 9 * 86400, n_right)),
        "user_id": rng.integers(0, n_users, n_right).astype(np.int64),
        "score": rng.random(n_right).round(3),
    })
    # unique (user, ts) on the right: as-of with duplicate right keys is
    # order-dependent in every engine
    right = right.drop_duplicates(["user_id", "ts"]).reset_index(drop=True)
    return left, right


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (df.sort_values(list(df.columns))
            .reset_index(drop=True)
            .astype({c: np.float64 for c in df.columns
                     if pd.api.types.is_numeric_dtype(df[c])}))


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("nb", [1, 7])
def test_asof_join_matches_pandas(direction, nb):
    from city2graph_ray.ops.asof import asof_join
    left, right = _mk(1, 400, 300, 12)
    got = asof_join(rd.from_pandas(left), rd.from_pandas(right), on="ts",
                    by="user_id", direction=direction,
                    num_buckets=nb).to_pandas()
    exp = pd.merge_asof(left.sort_values("ts"), right.sort_values("ts"),
                        on="ts", by="user_id", direction=direction,
                        suffixes=("", "_r"))
    exp = exp.rename(columns={"ts": "ts"})
    got = got[["event_id", "user_id", "amount", "ref_id", "score"]]
    exp = exp[["event_id", "user_id", "amount", "ref_id", "score"]]
    pd.testing.assert_frame_equal(_norm(got), _norm(exp))


def test_asof_join_no_by_and_tolerance():
    from city2graph_ray.ops.asof import asof_join
    left, right = _mk(2, 200, 50, 1)
    right = right.drop_duplicates("ts")
    tol = pd.Timedelta("4h")
    got = asof_join(rd.from_pandas(left), rd.from_pandas(right), on="ts",
                    tolerance=tol, num_buckets=5).to_pandas()
    exp = pd.merge_asof(left.sort_values("ts"), right.sort_values("ts"),
                        on="ts", tolerance=tol, suffixes=("", "_r"))
    cols = ["event_id", "amount", "ref_id", "score"]
    pd.testing.assert_frame_equal(_norm(got[cols]), _norm(exp[cols]))


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_join_integer_times(direction):
    """int64 time columns (epoch seconds) must work, not just datetimes
    (regression: Int64 padding restored left=int64 / right=float64 and
    merge_asof raised MergeError)."""
    from city2graph_ray.ops.asof import asof_join
    rng = np.random.default_rng(11)
    left = pd.DataFrame({
        "event_id": np.arange(300, dtype=np.int64),
        "ts": rng.integers(0, 100_000, 300).astype(np.int64),
        "user_id": rng.integers(0, 8, 300).astype(np.int64),
    })
    right = pd.DataFrame({
        "ref_id": np.arange(200, dtype=np.int64) + 10_000,
        "ts": rng.integers(0, 100_000, 200).astype(np.int64),
        "user_id": rng.integers(0, 8, 200).astype(np.int64),
        "score": rng.random(200).round(3),
    }).drop_duplicates(["user_id", "ts"]).reset_index(drop=True)
    got = asof_join(rd.from_pandas(left), rd.from_pandas(right), on="ts",
                    by="user_id", direction=direction,
                    num_buckets=6).to_pandas()
    exp = pd.merge_asof(left.sort_values("ts"), right.sort_values("ts"),
                        on="ts", by="user_id", direction=direction,
                        suffixes=("", "_r"))
    cols = ["event_id", "user_id", "ref_id", "score"]
    pd.testing.assert_frame_equal(_norm(got[cols]), _norm(exp[cols]))


def test_asof_join_empty_right():
    from city2graph_ray.ops.asof import asof_join
    left, right = _mk(3, 50, 10, 3)
    got = asof_join(rd.from_pandas(left),
                    rd.from_pandas(right.iloc[0:0]), on="ts",
                    by="user_id", num_buckets=3).to_pandas()
    assert len(got) == 50
    assert got["score"].isna().all()


@pytest.mark.parametrize("nb", [1, 9])
def test_range_join_matches_bruteforce(nb):
    from city2graph_ray.ops.asof import range_join
    rng = np.random.default_rng(7)
    base = pd.Timestamp("2024-03-01").value
    iv = pd.DataFrame({
        "iv_id": np.arange(120, dtype=np.int64),
        "user_id": rng.integers(0, 6, 120).astype(np.int64),
        "t0": pd.to_datetime(base + rng.integers(0, 10 ** 9 * 3600, 120)),
    })
    iv["t1"] = iv["t0"] + pd.to_timedelta(rng.integers(0, 1200, 120), "s")
    pt = pd.DataFrame({
        "pt_id": np.arange(500, dtype=np.int64) + 900,
        "user_id": rng.integers(0, 6, 500).astype(np.int64),
        "ts": pd.to_datetime(base + rng.integers(0, 10 ** 9 * 3600, 500)),
    })
    got = range_join(rd.from_pandas(iv), rd.from_pandas(pt),
                     "t0", "t1", "ts", by="user_id",
                     num_buckets=nb).to_pandas()
    exp = iv.merge(pt, on="user_id")
    exp = exp[(exp["t0"] <= exp["ts"]) & (exp["ts"] <= exp["t1"])]
    a = got[["iv_id", "pt_id"]].sort_values(["iv_id", "pt_id"]).reset_index(drop=True)
    b = exp[["iv_id", "pt_id"]].sort_values(["iv_id", "pt_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_range_join_no_by_cross():
    from city2graph_ray.ops.asof import range_join
    iv = pd.DataFrame({"iv_id": np.int64([0, 1]),
                       "t0": pd.to_datetime(["2024-01-01", "2024-01-03"]),
                       "t1": pd.to_datetime(["2024-01-02", "2024-01-05"])})
    pt = pd.DataFrame({"pt_id": np.int64([10, 11, 12]),
                       "ts": pd.to_datetime(["2024-01-01 12:00:00",
                                             "2024-01-04 00:00:00",
                                             "2024-01-10 00:00:00"])})
    got = range_join(rd.from_pandas(iv), rd.from_pandas(pt),
                     "t0", "t1", "ts", num_buckets=4).to_pandas()
    pairs = set(zip(got["iv_id"], got["pt_id"]))
    assert pairs == {(0, 10), (1, 11)}


def test_asof_and_range_join_pin_false_parity():
    """ADVICE r4: pin=False keeps both inputs streaming (re-execution
    instead of materialize) and must produce identical rows to the
    pinned default on both joins."""
    from city2graph_ray.ops.asof import asof_join, range_join

    rng = np.random.default_rng(7)
    left = pd.DataFrame({
        "k": rng.integers(0, 4, 60).astype(np.int64),
        "t": rng.integers(0, 1000, 60).astype(np.int64)})
    right = (pd.DataFrame({
        "k": rng.integers(0, 4, 25).astype(np.int64),
        "t": rng.integers(0, 1000, 25).astype(np.int64),
        "v": rng.normal(size=25)})
        .drop_duplicates(["k", "t"]))

    def canon(df):
        return (df.sort_values(list(df.columns))
                .reset_index(drop=True))

    a = canon(asof_join(rd.from_pandas(left), rd.from_pandas(right),
                        on="t", by="k", num_buckets=4).to_pandas())
    b = canon(asof_join(rd.from_pandas(left), rd.from_pandas(right),
                        on="t", by="k", num_buckets=4,
                        pin=False).to_pandas())
    pd.testing.assert_frame_equal(a, b)

    iv = pd.DataFrame({"iv_id": np.arange(10, dtype=np.int64),
                       "t0": rng.integers(0, 500, 10).astype(np.int64)})
    iv["t1"] = iv["t0"] + rng.integers(10, 200, 10).astype(np.int64)
    pt = pd.DataFrame({"pt_id": np.arange(40, dtype=np.int64),
                       "ts": rng.integers(0, 700, 40).astype(np.int64)})
    c = canon(range_join(rd.from_pandas(iv), rd.from_pandas(pt),
                         "t0", "t1", "ts", num_buckets=4).to_pandas())
    d = canon(range_join(rd.from_pandas(iv), rd.from_pandas(pt),
                         "t0", "t1", "ts", num_buckets=4,
                         pin=False).to_pandas())
    pd.testing.assert_frame_equal(c, d)
