"""Host-contention probe: parallel CPU scaling efficiency + steal rate.

This container's 32 vCPUs are backed by a shared host; neighbor load
shows up as (a) /proc/stat steal time and (b) sub-linear scaling of a
32-way CPU-bound pool. Bench records are only comparable across runs
taken at similar efficiency, so every official record this round is
stamped with this probe's output (r12/r13 adjudicated several
"regressions" as exactly this host state, after the fact — now it is
measured up front).

Usage: python tools/host_probe.py  → one JSON line
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def probe(n: int = 5_000_000) -> dict:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    steal0, t0 = int(parts[8]), time.perf_counter()
    t = time.perf_counter()
    _burn(n)
    serial = time.perf_counter() - t
    t = time.perf_counter()
    with mp.Pool(32) as p:
        p.map(_burn, [n] * 32)
    par = time.perf_counter() - t
    with open("/proc/stat") as f:
        parts = f.readline().split()
    steal1, t1 = int(parts[8]), time.perf_counter()
    return {
        "serial_s": round(serial, 3),
        "par32_s": round(par, 3),
        "scaling_eff_pct": round(serial / par * 100),
        "steal_cores": round((steal1 - steal0) / 100.0 / (t1 - t0), 2),
        "load1": round(os.getloadavg()[0], 2),
    }


if __name__ == "__main__":
    print(json.dumps(probe()))
