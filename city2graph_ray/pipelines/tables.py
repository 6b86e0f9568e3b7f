"""Typed-table loaders over the testdata parquet (column-pruned reads)
and the derived-geometry views shared with the SQL oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from city2graph_ray import synth


def customer_points(sf_dir: str) -> ray.data.Dataset:
    """Points (id, x, y) derived from customer keys — reads ONLY the key
    column; geometry derived in map_batches (synth.key_to_xy)."""
    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])

    def fn(batch: pa.Table) -> pa.Table:
        k = batch["c_custkey"].to_numpy()
        x, y = synth.key_to_xy(k)
        return pa.table({"id": pa.array(k.astype(np.int64)),
                         "x": pa.array(x), "y": pa.array(y)})

    return ds.map_batches(fn, batch_format="pyarrow")


def part_polygons(sf_dir: str) -> ray.data.Dataset:
    """Grid-square polygons (id, coords) derived from part keys."""
    ds = ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch["p_partkey"].to_numpy().astype(np.int64)
        col, row = synth.part_grid_cell(k)
        rings = synth.grid_square_ring(col, row)
        return pd.DataFrame({"id": k, "coords": list(rings)})

    return ds.map_batches(fn, batch_format="pandas")


def order_segments(sf_dir: str) -> ray.data.Dataset:
    """LineString segments (seg_id, coords) from each order's derived
    point to its customer's derived point — shared customer endpoints
    make the coordinate dedup real."""
    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey", "o_custkey"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ok = batch["o_orderkey"].to_numpy().astype(np.int64)
        ck = batch["o_custkey"].to_numpy().astype(np.int64)
        ax, ay = synth.key_to_xy(ok)
        bx, by = synth.key_to_xy(ck)
        coords = [np.array([a, b, c, d]) for a, b, c, d in zip(ax, ay, bx, by)]
        return pd.DataFrame({"seg_id": ok, "coords": coords})

    return ds.map_batches(fn, batch_format="pandas")


def documents(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=columns or ["doc_id", "text"])


def embeddings(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


def events(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                 columns=["event_id", "ts", "user_id",
                                          "event_type", "value"])
