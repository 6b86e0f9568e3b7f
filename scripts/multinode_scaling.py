"""N→4N CLUSTER-SIZE scaling measurement on simulated multi-node Ray
(VERDICT r4 #1 + the north rule's two-cluster-size criterion).

Unlike ``bench.py --scaling`` (one local session at 8 vs 32 CPUs),
this runs the headline suite against two REAL clusters built with
``ray start``:

* lo: 1 raylet × 8 CPUs, raylet + driver pinned to cores 0-7
* hi: 4 raylets × 8 CPUs, each raylet pinned to its OWN 8-core set
  (0-7 / 8-15 / 16-23 / 24-31) — four object stores, cross-node
  object transfer over the object-manager path, i.e. the closest
  sandbox approximation of four hosts.

Same input, same stage config as ``bench.py --scaling`` (each stage
compute-dominated at 32 CPUs).  Prints one JSON line with both
throughputs, the cluster-size scaling efficiency, and the same-window
pure-CPU hardware ceiling (the shared host's vCPUs throttle under
concurrency, so engine efficiency must be read against it).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS_PER_NODE = 8
OBJ_BYTES = 6 * 1024 ** 3
PORT = 6379
SPATIAL = ["knn", "fixed_radius", "contiguity_queen", "pip_group_nodes"]


def sh(cmd: list[str], env=None) -> None:
    subprocess.run(cmd, check=True, capture_output=True, env=env)


def stop() -> None:
    subprocess.run(["ray", "stop", "--force"], capture_output=True)


def start_cluster(n_nodes: int) -> None:
    env = dict(os.environ, PYTHONPATH=REPO)
    head = ["taskset", "-c", f"0-{CPUS_PER_NODE - 1}",
            "ray", "start", "--head", f"--num-cpus={CPUS_PER_NODE}",
            f"--port={PORT}", f"--object-store-memory={OBJ_BYTES}",
            "--include-dashboard=false"]
    sh(head, env=env)
    for i in range(1, n_nodes):
        lo, hi = i * CPUS_PER_NODE, (i + 1) * CPUS_PER_NODE - 1
        sh(["taskset", "-c", f"{lo}-{hi}",
            "ray", "start", f"--address=127.0.0.1:{PORT}",
            f"--num-cpus={CPUS_PER_NODE}",
            f"--object-store-memory={OBJ_BYTES}"], env=env)
    time.sleep(2)


def run_suite(n_nodes: int) -> dict:
    total = n_nodes * CPUS_PER_NODE
    env = dict(os.environ,
               PYTHONPATH=REPO,
               RAY_ADDRESS=f"127.0.0.1:{PORT}",
               RAY_GRAFT_ADDRESS=f"127.0.0.1:{PORT}",
               RAY_GRAFT_CPUS=str(total),
               GRAFT_BENCH_REPS=os.environ.get("GRAFT_BENCH_REPS", "2"),
               GRAFT_BENCH_KNN_PER_ROW="8",
               GRAFT_BENCH_POLY_REP="16")
    # pin the DRIVER to the cluster's core set too (it owns read
    # planning + small collects; an unpinned driver would borrow
    # cores the lo cluster doesn't have)
    cmd = ["taskset", "-c", f"0-{n_nodes * CPUS_PER_NODE - 1}",
           sys.executable, os.path.join(REPO, "bench.py")]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         check=True, cwd=REPO)
    return json.loads(out.stdout.strip().splitlines()[-1])


def thr(r: dict) -> float:
    return r["edge_rows"] / sum(r["queries"][s] for s in SPATIAL)


def main() -> None:
    from bench import _cpu_ceiling

    rounds = int(os.environ.get("GRAFT_SCALE_ROUNDS", "2"))
    lo_nodes = int(os.environ.get("GRAFT_MN_LO", "1"))
    hi_nodes = int(os.environ.get("GRAFT_MN_HI", "4"))
    load_before = os.getloadavg()
    ceiling = _cpu_ceiling(lo_nodes * CPUS_PER_NODE,
                           hi_nodes * CPUS_PER_NODE)

    rs = {lo_nodes: [], hi_nodes: []}
    for n in (lo_nodes, hi_nodes):
        stop()
        start_cluster(n)
        try:
            for _ in range(rounds):
                rs[n].append(run_suite(n))
        finally:
            stop()
    r_lo = max(rs[lo_nodes], key=thr)
    r_hi = max(rs[hi_nodes], key=thr)
    t_lo, t_hi = thr(r_lo), thr(r_hi)
    eff = (t_hi / t_lo) / (hi_nodes / lo_nodes)
    print(json.dumps({
        "mode": "cluster-size scaling (ray start, pinned raylets)",
        "nodes_lo": lo_nodes, "nodes_hi": hi_nodes,
        "cpus_per_node": CPUS_PER_NODE,
        "sec_lo": r_lo["value"], "sec_hi": r_hi["value"],
        "edge_rows_per_sec_lo": round(t_lo, 1),
        "edge_rows_per_sec_hi": round(t_hi, 1),
        "scaling_efficiency": round(eff, 3),
        "hardware_ceiling": ceiling,
        "efficiency_vs_ceiling": round(eff / ceiling, 3) if ceiling else None,
        "counts_match": r_lo["counts"] == r_hi["counts"],
        "host_load_1m_before": round(load_before[0], 2),
        "host_load_1m_after": round(os.getloadavg()[0], 2),
        "rows_per_sec_lo_rounds": [round(thr(r), 1) for r in rs[lo_nodes]],
        "rows_per_sec_hi_rounds": [round(thr(r), 1) for r in rs[hi_nodes]],
        "queries_lo": r_lo["queries"], "queries_hi": r_hi["queries"],
    }))


if __name__ == "__main__":
    main()
