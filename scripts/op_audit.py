"""Per-op scale audit with host-load telemetry (VERDICT r3 #6).

Runs named ``queries()`` entries over a testdata dir (default sf0.1)
``--reps`` times each and prints ONE JSON line per op carrying the
same adjudication stamps as bench.py — per-rep walls, best wall, row
count, 1-minute load before/after, cpu count — so per-op regressions
in BASELINE.md are attributable to code vs host, not guessed.

Usage: python scripts/op_audit.py [--reps 2] [sf_dir] name [name ...]
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

import ray

sys.path.insert(0, "/root/repo")


def to_len(res) -> int:
    import pandas as pd
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.count()
    if isinstance(res, (pa.Table, pd.DataFrame)):
        return len(res)
    return -1


def main() -> None:
    argv = sys.argv[1:]
    reps = 2
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i:i + 2]
    sf_dir = argv[0] if argv and os.path.isdir(argv[0]) else "/root/testdata/sf0.1"
    names = argv[1:] if argv and os.path.isdir(argv[0]) else argv

    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as entrymod
    qs = entrymod.queries()

    for name in names:
        if name not in qs:
            print(json.dumps({"op": name, "error": "unknown"}))
            continue
        lb = os.getloadavg()[0]
        walls, rows = [], -1
        for _ in range(reps):
            t0 = time.time()
            rows = to_len(qs[name](sf_dir))
            walls.append(round(time.time() - t0, 2))
        print(json.dumps({
            "op": name, "walls": walls, "best": min(walls), "rows": rows,
            "sf": sf_dir, "num_cpus": cpus,
            "host_load_1m_before": round(lb, 2),
            "host_load_1m_after": round(os.getloadavg()[0], 2)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
