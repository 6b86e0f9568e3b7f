"""GTFS semantics: time parsing, calendar expansion, frequency
multipliers, travel summary (mirrors the reference's synthetic-zip
fixtures, tests/conftest.py:136-257 in /root/reference)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from city2graph_ray.ops.transport import (
    expand_service_days,
    frequency_multipliers,
    get_od_pairs,
    time_to_seconds,
    travel_summary_graph,
)


def test_time_to_seconds():
    assert time_to_seconds("08:30:15") == 8 * 3600 + 30 * 60 + 15
    assert time_to_seconds("25:10:00") == 25 * 3600 + 600  # >24h extended
    assert np.isnan(time_to_seconds(""))
    assert np.isnan(time_to_seconds("nan"))
    assert np.isnan(time_to_seconds("8:30"))
    assert time_to_seconds(None) == 0.0  # reference: None → 0.0
    assert time_to_seconds(float("nan")) == 0.0  # reference pd.isna guard


@pytest.fixture(scope="module")
def gtfs():
    calendar = pd.DataFrame({
        "service_id": ["WD", "WE"],
        "monday": ["1", "0"], "tuesday": ["1", "0"], "wednesday": ["1", "0"],
        "thursday": ["1", "0"], "friday": ["1", "0"],
        "saturday": ["0", "1"], "sunday": ["0", "1"],
        "start_date": ["20240101", "20240101"],
        "end_date": ["20240114", "20240114"]})
    calendar_dates = pd.DataFrame({
        "service_id": ["WD", "WE"],
        "date": ["20240115", "20240106"],
        "exception_type": ["1", "2"]})  # add one WD day, remove one WE day
    trips = pd.DataFrame({
        "trip_id": ["t1", "t2", "t3"],
        "route_id": ["r1", "r1", "r2"],
        "service_id": ["WD", "WD", "WE"]})
    stop_times = pd.DataFrame({
        "trip_id": ["t1"] * 3 + ["t2"] * 3 + ["t3"] * 2,
        "stop_id": ["A", "B", "C", "A", "B", "C", "B", "C"],
        "stop_sequence": ["1", "2", "3", "1", "2", "x", "1", "2"],
        "arrival_time": ["08:00:00", "08:10:00", "08:25:00",
                         "09:00:00", "09:12:00", "09:30:00",
                         "10:00:00", "10:20:00"],
        "departure_time": ["08:00:00", "08:11:00", "08:25:00",
                           "09:00:00", "09:13:00", "09:30:00",
                           "10:00:00", "10:20:00"]})
    frequencies = pd.DataFrame({
        "trip_id": ["t1", "bad"],
        "start_time": ["07:00:00", "07:00:00"],
        "end_time": ["09:00:00", "08:00:00"],
        "headway_secs": ["1800", "0"]})  # t1 ×4; headway 0 dropped
    return calendar, calendar_dates, trips, stop_times, frequencies


def test_expand_service_days(gtfs):
    calendar, calendar_dates, *_ = gtfs
    active = expand_service_days(calendar, calendar_dates)
    wd = active[active["service_id"] == "WD"]["date"].tolist()
    we = active[active["service_id"] == "WE"]["date"].tolist()
    # Jan 1-14 2024: 10 weekdays + 1 added = 11; 4 weekend days - 1 removed = 3
    assert len(wd) == 11 and "20240115" in wd
    assert len(we) == 3 and "20240106" not in we


def test_frequency_multipliers(gtfs):
    *_, frequencies = gtfs
    m = frequency_multipliers(frequencies)
    assert dict(zip(m["trip_id"], m["multiplier"])) == {"t1": 4}


def test_travel_summary_graph(gtfs):
    calendar, calendar_dates, trips, stop_times, frequencies = gtfs
    out = travel_summary_graph(rd.from_pandas(stop_times), trips, calendar,
                               calendar_dates, frequencies).to_pandas()
    out = out.set_index(["from_stop_id", "to_stop_id"])
    # service counts: t1 = 11 days × 4 (freq) = 44; t2 = 11; t3 = 3
    # A→B legs: t1 (600s, sc44) + t2 (720s, sc11) → wmean = (600*44+720*11)/55
    ab = out.loc[("A", "B")]
    assert ab["frequency"] == 55
    assert abs(ab["mean_travel_time"] - (600 * 44 + 720 * 11) / 55) < 1e-6
    # B→C: t2's leg dropped (stop_sequence 'x' non-numeric) → only t1 + t3
    bc = out.loc[("B", "C")]
    assert bc["frequency"] == 44 + 3
    assert abs(bc["mean_travel_time"] - (840 * 44 + 1200 * 3) / 47) < 1e-6


def test_travel_summary_time_filter_and_undirected(gtfs):
    calendar, calendar_dates, trips, stop_times, frequencies = gtfs
    out = travel_summary_graph(rd.from_pandas(stop_times), trips, calendar,
                               calendar_dates, frequencies,
                               start_time="09:00:00").to_pandas()
    # only t2 (09:xx) and t3 (10:xx) legs survive the departure filter
    assert set(map(tuple, out[["from_stop_id", "to_stop_id"]].to_numpy())) == \
        {("A", "B"), ("B", "C")}
    und = travel_summary_graph(rd.from_pandas(stop_times), trips, calendar,
                               calendar_dates, frequencies,
                               directed=False).to_pandas()
    assert (und["from_stop_id"] <= und["to_stop_id"]).all()


def test_get_od_pairs(gtfs):
    calendar, calendar_dates, trips, stop_times, _ = gtfs
    od = get_od_pairs(rd.from_pandas(stop_times), trips, calendar,
                      calendar_dates, directed=True).to_pandas()
    # t1: 2 legs × 11 dates; t2: 1 valid leg × 11; t3: 1 leg × 3 dates
    assert len(od) == 2 * 11 + 11 + 3
    assert {"trip_id", "service_id", "date", "orig_stop_id",
            "dest_stop_id", "departure_ts", "arrival_ts",
            "travel_time_sec", "from_stop_id",
            "to_stop_id"} <= set(od.columns)
    # reference parity: '%Y-%m-%d' date, timestamps = date + GTFS secs
    r0 = od.sort_values(["trip_id", "date",
                         "departure_ts"]).iloc[0]
    assert r0["departure_ts"].date().strftime("%Y-%m-%d") == r0["date"]
    assert (r0["arrival_ts"] - r0["departure_ts"]).total_seconds() \
        == r0["travel_time_sec"]


def test_get_od_pairs_undirected_default(gtfs):
    """directed=False (reference default) canonicalizes
    orig<=dest, swapping the timestamps but not travel_time_sec
    (reference transportation.py:858-866)."""
    calendar, calendar_dates, trips, _, _ = gtfs
    # return trip C→B→A so the swap path is exercised
    stop_times = pd.DataFrame({
        "trip_id": ["t1"] * 3,
        "stop_id": ["C", "B", "A"],
        "stop_sequence": ["1", "2", "3"],
        "arrival_time": ["08:00:00", "08:10:00", "08:25:00"],
        "departure_time": ["08:00:00", "08:11:00", "08:25:00"]})
    und = get_od_pairs(rd.from_pandas(stop_times), trips, calendar,
                       calendar_dates).to_pandas()
    drc = get_od_pairs(rd.from_pandas(stop_times), trips, calendar,
                       calendar_dates, directed=True).to_pandas()
    assert len(und) == len(drc)
    assert (und["orig_stop_id"] <= und["dest_stop_id"]).all()
    swapped = drc[drc["orig_stop_id"] > drc["dest_stop_id"]]
    assert len(swapped) > 0  # fixture must exercise the swap path
    key = ["trip_id", "date", "travel_time_sec"]
    m = swapped.merge(und, on=key, suffixes=("_d", "_u"))
    assert (m["departure_ts_u"] == m["arrival_ts_d"]).all()
    assert (m["arrival_ts_u"] == m["departure_ts_d"]).all()


def test_get_od_pairs_date_range(gtfs):
    """start_date/end_date bound the expanded calendar (reference
    tests/test_transportation.py:217-224)."""
    calendar, calendar_dates, trips, stop_times, _ = gtfs
    od = get_od_pairs(rd.from_pandas(stop_times), trips, calendar,
                      calendar_dates, start_date="20240101",
                      end_date="20240102").to_pandas()
    assert len(od) > 0
    assert od["date"].min() >= "2024-01-01"
    assert od["date"].max() <= "2024-01-02"



def test_gtfs_one_call_facade(gtfs, tmp_path):
    """travel_summary_from_gtfs(zip) — the reference's one-call flow —
    matches the manual table plumbing end-to-end."""
    import zipfile

    from city2graph_ray.sources.gtfs import travel_summary_from_gtfs
    calendar, calendar_dates, trips, stop_times, frequencies = gtfs
    stops = pd.DataFrame({
        "stop_id": ["A", "B", "C"],
        "stop_lon": ["0.0", "1.0", "2.0"],
        "stop_lat": ["0.0", "0.5", "1.0"]})
    zpath = tmp_path / "feed.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for name, df in [("stops", stops), ("calendar", calendar),
                         ("calendar_dates", calendar_dates),
                         ("trips", trips), ("stop_times", stop_times),
                         ("frequencies", frequencies)]:
            z.writestr(f"{name}.txt", df.to_csv(index=False))
    out = travel_summary_from_gtfs(str(zpath))
    nodes, edges = out["nodes"], out["edges"].to_pandas()
    assert set(nodes["stop_id"]) == {"A", "B", "C"}
    e = edges.set_index(["from_stop_id", "to_stop_id"])
    assert e.loc[("A", "B"), "frequency"] == 55
    manual = travel_summary_graph(rd.from_pandas(stop_times), trips,
                                  calendar, calendar_dates,
                                  frequencies).to_pandas()
    pd.testing.assert_frame_equal(
        edges.sort_values(["from_stop_id", "to_stop_id"]).reset_index(drop=True),
        manual.sort_values(["from_stop_id", "to_stop_id"]).reset_index(drop=True))


def test_gbfs_station_graph(tmp_path):
    import json

    from city2graph_ray.sources.gtfs import gbfs_station_graph
    feed = {"data": {"stations": [
        {"station_id": "s1", "lon": 0.0, "lat": 0.0},
        {"station_id": "s2", "lon": 0.5, "lat": 0.0},
        {"station_id": "s3", "lon": 5.0, "lat": 5.0}]}}
    (tmp_path / "station_information.json").write_text(json.dumps(feed))
    out = gbfs_station_graph(str(tmp_path), radius=1.0)
    e = out["edges"].to_pandas()
    assert len(e) == 1  # only s1–s2 within radius
    assert {int(e["src"].iloc[0]), int(e["dst"].iloc[0])} == {0, 1}


def test_gbfs_feed_shapes(tmp_path):
    """Reference load_gbfs flattens stations/bikes/vehicle_types/feeds
    and falls back to the data object (transportation.py:597-615)."""
    import json

    from city2graph_ray.sources.gtfs import load_gbfs_dir
    (tmp_path / "free_bike_status.json").write_text(json.dumps(
        {"data": {"bikes": [{"bike_id": "b1", "lon": 1.0, "lat": 2.0}]}}))
    (tmp_path / "vehicle-types.json").write_text(json.dumps(
        {"data": {"vehicle_types": [{"vehicle_type_id": "v1"}]}}))
    (tmp_path / "system_information.json").write_text(json.dumps(
        {"data": {"system_id": "sys", "name": "demo"}}))
    (tmp_path / "empty.json").write_text(json.dumps(
        {"data": {"stations": []}}))
    out = load_gbfs_dir(str(tmp_path))
    assert set(out) == {"free_bike_status", "vehicle_types",
                        "system_information"}
    assert out["free_bike_status"]["x"].iloc[0] == 1.0
    assert out["vehicle_types"]["vehicle_type_id"].iloc[0] == "v1"
    assert out["system_information"]["system_id"].iloc[0] == "sys"


def test_load_overture_local_mode(tmp_path):
    """load_overture_data local mode: one parquet per type → Datasets;
    missing types skipped; no path → NotImplementedError."""
    import pytest

    from city2graph_ray.api import load_overture_data
    pd.DataFrame({"id": [1, 2], "kind": ["a", "b"]}).to_parquet(
        tmp_path / "segment.parquet")
    out = load_overture_data(types=["segment", "building"],
                             path=str(tmp_path))
    assert set(out) == {"segment"}
    assert out["segment"].count() == 2
    with pytest.raises(NotImplementedError):
        load_overture_data(types=["segment"])


def test_time_to_seconds_reference_parity():
    """Reference _time_to_seconds semantics
    (tests/test_transportation.py:81-107): float pass-through, None →
    0.0, HH:MM:SS incl. extended hours, invalid strings raise in
    strict mode / NaN in streaming mode."""
    import pytest

    from city2graph_ray.ops.transport import time_to_seconds
    assert time_to_seconds(3600.0) == 3600.0
    assert time_to_seconds(None) == 0.0
    assert time_to_seconds("08:30:00") == 30600.0
    assert time_to_seconds("25:30:00") == 91800.0
    for bad in ("3600.0", "", "nan", "None"):
        assert np.isnan(time_to_seconds(bad))
        with pytest.raises(ValueError, match="Expected HH:MM:SS"):
            time_to_seconds(bad, strict=True)


def test_stop_transfers_window_and_self_exclusion():
    from city2graph_ray.ops.transport import stop_transfers
    st = pd.DataFrame({
        "trip_id": ["a", "b", "c", "a", "d"],
        "stop_id": ["s1", "s1", "s1", "s2", "s2"],
        "arrival_time": ["08:00:00", "08:05:00", "09:00:00",
                         "08:00:00", "08:10:00"],
        "departure_time": ["08:01:00", "08:06:00", "09:01:00",
                           "08:01:00", "08:11:00"]})
    out = (stop_transfers(rd.from_pandas(st), min_wait=60,
                          max_wait=1800, num_buckets=4)
           .to_pandas().sort_values(["stop_id", "from_trip",
                                     "to_trip"]).reset_index(drop=True))
    # s1: a->b (360 s) feasible; a->c (3660 s) too late; b->c too late;
    #     self-transfers excluded.  s2: a->d (660 s) feasible.
    got = list(zip(out["stop_id"], out["from_trip"], out["to_trip"],
                   out["wait_secs"]))
    assert got == [("s1", "a", "b", 360.0), ("s2", "a", "d", 660.0)]


def test_stop_transfers_empty():
    from city2graph_ray.ops.transport import stop_transfers
    empty = pd.DataFrame({
        "trip_id": pd.Series([], dtype=str),
        "stop_id": pd.Series([], dtype=str),
        "arrival_time": pd.Series([], dtype=str),
        "departure_time": pd.Series([], dtype=str)})
    assert stop_transfers(rd.from_pandas(empty),
                          num_buckets=4).count() == 0


def test_stop_headways_brute_force():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from city2graph_ray.ops.transport import stop_headways

    st = pd.DataFrame({
        "trip_id": ["t1"] * 4 + ["t2"] * 3 + ["t3"],
        "stop_id": ["a", "b", "a", "c", "a", "b", "c", "z"],
        "departure_time": ["06:00:00", "06:05:00", "06:30:00",
                           "07:00:00", "08:00:30", "06:20:00",
                           "07:10:00", "09:00:00"]})
    out = (stop_headways(rd.from_pandas(st), num_buckets=2)
           .to_pandas().sort_values("stop_id").reset_index(drop=True))
    # a: 21600, 23400, 28830 -> gaps 1800, 5430
    # b: 22500, 23400 -> gap 900 ; c: 25200, 25800 -> gap 600
    # z: single departure -> dropped
    assert out["stop_id"].tolist() == ["a", "b", "c"]
    assert out["n_departures"].tolist() == [3, 2, 2]
    assert out["min_headway_sec"].tolist() == [1800, 900, 600]
    assert out["mean_headway_sec"].tolist() == [3615.0, 900.0, 600.0]


def test_earliest_arrival_bruteforce():
    import ray.data as rd

    from city2graph_ray.ops.transport import earliest_arrival

    rng = np.random.default_rng(13)
    rows = []
    for t in range(25):
        stops = rng.permutation(8)[:4]
        base = int(rng.integers(0, 5000))
        for i, s in enumerate(stops):
            dep = base + i * 400
            rows.append({"trip_id": f"t{t}", "stop_sequence": str(i),
                         "stop_id": f"s{s}",
                         "arrival_time": float(dep - 60),
                         "departure_time": float(dep)})
    st = pd.DataFrame(rows)
    out = earliest_arrival(rd.from_pandas(st).repartition(4), "s0", 0,
                           rounds=8)
    # brute-force bounded-round relaxation
    conns = []
    for t, g in st.groupby("trip_id"):
        g = g.sort_values("stop_sequence")
        for a, b in zip(g.itertuples(), list(g.itertuples())[1:]):
            conns.append((a.stop_id, b.stop_id,
                          int(a.departure_time), int(b.arrival_time)))
    ea = {"s0": 0}
    for _ in range(8):
        snap = dict(ea)
        for fs, ts, d, a in conns:
            if fs in snap and d >= snap[fs]:
                if a < ea.get(ts, 1 << 60):
                    ea[ts] = a
    want = pd.DataFrame(sorted(ea.items()),
                        columns=["stop_id", "ea_sec"])
    assert out["stop_id"].tolist() == want["stop_id"].tolist()
    assert out["ea_sec"].tolist() == want["ea_sec"].tolist()


def test_times_to_seconds_vectorized_parity():
    """Column parser ≡ scalar parser on every edge shape (VERDICT r3 #5)."""
    import numpy as np
    from city2graph_ray.ops.transport import time_to_seconds, times_to_seconds

    col = pd.Series([
        "08:30:00", "26:05:59", "7:05:03", "123:45:06", " 09:01:02 ",
        None, np.nan, 3600.0, 42, "bad:row", "1:2:3", "::", "",
        "08:30", "-1:00:00", "08:60:99", "x08:30:00",
    ], dtype=object)
    expect = col.map(time_to_seconds).to_numpy(np.float64)
    got = times_to_seconds(col)
    np.testing.assert_array_equal(np.isnan(expect), np.isnan(got))
    m = ~np.isnan(expect)
    np.testing.assert_array_equal(expect[m], got[m])
    # numeric dtype column pass-through
    num = pd.Series([1.0, np.nan, 7200.0])
    np.testing.assert_array_equal(times_to_seconds(num),
                                  np.array([1.0, 0.0, 7200.0]))
    assert times_to_seconds(pd.Series([], dtype=object)).shape == (0,)


def test_travel_summary_no_calendar_falls_back_to_trip_counts():
    """Reference :560/:573/:640/:728 parity: no calendar → each trip
    counts once; calendar_dates-only feeds still expand; inverted time
    window raises; instant window returns empty (zero-duration legs
    dropped)."""
    import pytest
    import ray.data as rd

    from city2graph_ray.ops.transport import travel_summary_graph

    st = pd.DataFrame({
        "trip_id": ["t1", "t1", "t2", "t2"],
        "stop_id": ["A", "B", "A", "B"],
        "stop_sequence": [1, 2, 1, 2],
        "arrival_time": ["08:00:00", "08:10:00", "09:00:00", "09:10:00"],
        "departure_time": ["08:00:00", "08:10:00", "09:00:00", "09:10:00"]})
    trips = pd.DataFrame({"trip_id": ["t1", "t2"],
                          "service_id": ["s1", "s1"]})
    empty_cal = pd.DataFrame(columns=[
        "service_id", "start_date", "end_date", "monday", "tuesday",
        "wednesday", "thursday", "friday", "saturday", "sunday"])

    out = travel_summary_graph(rd.from_pandas(st), trips,
                               empty_cal).to_pandas()
    assert len(out) == 1
    assert out["frequency"].iloc[0] == 2  # one per trip
    assert out["mean_travel_time"].iloc[0] == 600.0

    # calendar_dates-only feed: service active on 2 exception days
    cd = pd.DataFrame({"service_id": ["s1", "s1"],
                       "date": ["20240101", "20240102"],
                       "exception_type": [1, 1]})
    out2 = travel_summary_graph(rd.from_pandas(st), trips, empty_cal,
                                calendar_dates=cd).to_pandas()
    assert out2["frequency"].iloc[0] == 4  # 2 days x 2 trips

    with pytest.raises(ValueError, match="after end_time"):
        travel_summary_graph(rd.from_pandas(st), trips, empty_cal,
                             start_time="10:00:00", end_time="08:00:00")

    inst = travel_summary_graph(rd.from_pandas(st), trips, empty_cal,
                                start_time="08:00:00",
                                end_time="08:00:00")
    assert inst.count() == 0
