"""10× stress audit (VERDICT r4 #3): run the most expensive gate ops
at sf0.1 (10× the gate's sf0.01) in one 32-CPU session, recording per
query wall time, output rows, host-load stamps and OBJECT-STORE SPILL
delta — the telemetry that exposed the r4 network_knn 60 GB spill
bomb.  Prints one JSON line per query plus a summary line; non-zero
spill or a superlinear wall is a finding, not a pass.

Usage: python scripts/stress_audit.py [sf_dir] [name ...]
"""

from __future__ import annotations

import json
import logging
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "zone_adamic_adar", "zone_adamic_adar_capped", "zone_clustering",
    "zone_clustering_capped", "zone_jaccard_capped",
    "network_path_geom", "dual_edges", "raster_regions",
    "morph_graph_e2e", "ssjoin_jaccard", "neardup_clusters",
    "event_retention", "tpch_q8_mktshare", "zone_hash_walks",
]


def spilled_mb() -> float:
    """Cumulative spilled MiB this session, from Ray's memory summary."""
    try:
        from ray._private.internal_api import memory_summary
        txt = memory_summary(stats_only=True)
        m = re.search(r"Spilled (\d+) MiB", txt)
        return float(m.group(1)) if m else 0.0
    except Exception:
        return -1.0


def main() -> None:
    import ray

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:] or DEFAULT

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import pandas as pd

    import __ray_entry__ as entrymod
    qs = entrymod.queries()

    results = []
    for name in names:
        if name not in qs:
            print(json.dumps({"query": name, "err": "unknown"}))
            continue
        load0 = os.getloadavg()[0]
        sp0 = spilled_mb()
        t0 = time.time()
        try:
            res = qs[name](sf_dir)
            import ray.data
            n = (res.count() if isinstance(res, ray.data.Dataset)
                 else len(res))
            err = None
        except Exception as exc:           # keep auditing the rest
            n, err = -1, f"{type(exc).__name__}: {exc}"[:200]
        row = {"query": name, "sf": sf_dir,
               "sec": round(time.time() - t0, 2), "rows": int(n),
               "spilled_mb_delta": round(spilled_mb() - sp0, 1),
               "load_before": round(load0, 2),
               "load_after": round(os.getloadavg()[0], 2), "err": err}
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({
        "summary": "stress_audit",
        "total_sec": round(sum(r["sec"] for r in results), 1),
        "total_spilled_mb": round(sum(max(r["spilled_mb_delta"], 0)
                                      for r in results), 1),
        "failures": [r["query"] for r in results if r["err"]]}))
    ray.shutdown()


if __name__ == "__main__":
    main()
