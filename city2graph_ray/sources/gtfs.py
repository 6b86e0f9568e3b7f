"""GTFS / GBFS loaders.

Reference: load_gtfs (/root/reference/city2graph/transportation.py:510-570
— zip members → all-varchar tables, stops geometry from lon/lat) and
load_gbfs (:573-646 — station_information JSON → lon/lat points).

Engine: one Dataset per member file via ray.data.read_csv (all columns
read as strings to match the reference's all_varchar=True), stop_times
as the big streaming table; the small tables (stops, trips, calendar,
calendar_dates, frequencies) come back as pandas for broadcast into
city2graph_ray.ops.transport.
"""

from __future__ import annotations

import io
import os
import zipfile

import pandas as pd
import ray.data

GTFS_FILES = ("stops", "trips", "stop_times", "calendar", "calendar_dates",
              "frequencies")


def load_gtfs_dir(path: str) -> dict[str, ray.data.Dataset | pd.DataFrame]:
    """GTFS directory (or .zip) → {'stop_times': Dataset (streams),
    others: pandas (broadcast side)}.  All columns string-typed."""
    members: dict[str, str | bytes] = {}
    if path.endswith(".zip"):
        with zipfile.ZipFile(path) as z:
            for name in z.namelist():
                base = os.path.basename(name).replace(".txt", "")
                if base in GTFS_FILES:
                    members[base] = z.read(name)
    else:
        for f in os.listdir(path):
            base = f.replace(".txt", "").replace(".csv", "")
            if base in GTFS_FILES:
                members[base] = os.path.join(path, f)

    out: dict[str, ray.data.Dataset | pd.DataFrame] = {}
    for base, src in members.items():
        df = (pd.read_csv(io.BytesIO(src), dtype=str)
              if isinstance(src, bytes) else pd.read_csv(src, dtype=str))
        if base == "stop_times":
            out[base] = ray.data.from_pandas(df)
        else:
            out[base] = df
    return out


def stops_with_geometry(stops: pd.DataFrame) -> pd.DataFrame:
    """stops → (stop_id, x, y); rows with blank/invalid lat/lon dropped
    with the reference's guard (transportation.py:294-310)."""
    s = stops.copy()
    s["x"] = pd.to_numeric(s["stop_lon"], errors="coerce")
    s["y"] = pd.to_numeric(s["stop_lat"], errors="coerce")
    return s[s["x"].notna() & s["y"].notna()][["stop_id", "x", "y"]]


def load_gbfs_dir(path: str) -> dict[str, pd.DataFrame]:
    """GBFS JSON directory → {feed_name: DataFrame}.  Mirrors the
    reference's feed flattening (transportation.py:573-646): rows come
    from the first of ``stations`` / ``bikes`` / ``vehicles`` /
    ``vehicle_types`` / ``feeds`` under ``data``, falling back to the
    ``data`` object itself; any table with lon/lat gets numeric x/y
    (invalid coordinates → NaN, as the reference's try_cast)."""
    import json
    out = {}
    for f in sorted(os.listdir(path)):
        if not f.endswith(".json"):
            continue
        raw = json.load(open(os.path.join(path, f)))
        data = raw.get("data", {}) or {}
        rows = None
        for key in ("stations", "bikes", "vehicles", "vehicle_types",
                    "feeds"):
            if key in data:
                rows = data[key]
                break
        if rows is None:
            rows = [data]
        if not rows:
            continue
        df = pd.DataFrame(rows)
        if {"lon", "lat"} <= set(df.columns):
            df["x"] = pd.to_numeric(df["lon"], errors="coerce")
            df["y"] = pd.to_numeric(df["lat"], errors="coerce")
        out[f[:-5].replace("-", "_").lower()] = df
    return out


def travel_summary_from_gtfs(path: str, **kwargs):
    """One-call facade mirroring the reference's
    ``travel_summary_graph(load_gtfs(zip))`` flow
    (transportation.py:510-570 → 1197-1296): load the feed (zip or
    directory), plumb the tables, return
    {'nodes': stops (stop_id, x, y), 'edges': Dataset}."""
    from city2graph_ray.ops.transport import travel_summary_graph
    g = load_gtfs_dir(path)
    edges = travel_summary_graph(
        g["stop_times"], g["trips"], g["calendar"],
        g.get("calendar_dates"), g.get("frequencies"), **kwargs)
    nodes = (stops_with_geometry(g["stops"])
             if "stops" in g else pd.DataFrame(
                 columns=["stop_id", "x", "y"]))
    return {"nodes": nodes, "edges": edges}


def gbfs_station_graph(path: str, radius: float,
                       feed: str = "station_information"):
    """GBFS consumer (the loader previously had none): station points
    within ``radius`` become an undirected proximity graph
    (station_information semantics, reference
    transportation.py:573-646; edges via fixed_radius_graph)."""
    import numpy as np

    from city2graph_ray.ops.proximity import fixed_radius_graph
    feeds = load_gbfs_dir(path)
    if feed not in feeds:
        raise ValueError(f"GBFS feed {feed!r} not found in {path}")
    df = feeds[feed]
    pts = pd.DataFrame({
        "id": np.arange(len(df), dtype=np.int64),
        "x": df["x"].to_numpy(np.float64),
        "y": df["y"].to_numpy(np.float64)}).dropna()
    nodes = df.assign(id=pts["id"])
    return {"nodes": nodes,
            "edges": fixed_radius_graph(ray.data.from_pandas(pts), radius)}
