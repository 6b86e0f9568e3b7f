"""Measure the sandbox host's intrinsic parallel-scaling ceiling.

The two-cluster-size criterion is evidenced on one machine at two
``num_cpus`` levels; the host's vCPUs throttle under concurrency, so
even a perfectly-scaling engine cannot exceed the ratio measured here.
Pure-python CPU burns (no Ray, no shuffle): wave time at W-way
concurrency → effective cores → ceiling(lo→hi) =
(eff_hi / eff_lo) / (hi / lo).  Reported alongside the engine numbers
in BASELINE.md.
"""

from __future__ import annotations

import json
import time
from concurrent.futures import ProcessPoolExecutor


def burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i % 7
    return s


def main():
    res = {}
    for workers in (1, 2, 4, 8, 16, 32):
        with ProcessPoolExecutor(workers) as ex:
            list(ex.map(burn, [100_000] * workers))  # spawn + warm
            times = []
            for _ in range(3):
                t0 = time.time()
                list(ex.map(burn, [5_000_000] * workers))
                times.append(time.time() - t0)
            res[workers] = min(times)
    eff = {w: w * res[1] / t for w, t in res.items()}
    ceilings = {f"{lo}->{hi}": round((eff[hi] / eff[lo]) / (hi / lo), 3)
                for lo, hi in [(2, 8), (4, 16), (8, 32)]}
    print(json.dumps({"wave_sec": {str(k): round(v, 3) for k, v in res.items()},
                      "effective_cores": {str(k): round(v, 1) for k, v in eff.items()},
                      "hardware_ceiling": ceilings}))


if __name__ == "__main__":
    main()
