"""Spark-free host-contention probe: the scaling ceiling this shared
VM imposes on ANY P->4P thread scale-up, measured with pure Python
busy loops (no I/O, no Arrow, no JVM).

Runs K iterations of a fixed arithmetic loop in P pinned worker
processes, reports aggregate loops/sec at P and 4P and the implied
ceiling efficiency (tp_4P / tp_P) / 4. A reading well below 1.0 with
no Spark involved attributes the same shortfall in scaling_bench.py
to the host, not the engine (the attribution the BASELINE.md protocol
cites). Usage: python tools/host_probe.py [P] [loops_k]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def _burn(k: int) -> int:
    acc = 0
    for i in range(k * 1000):
        acc = (acc * 31 + i) & 0xFFFFFFFF
    return acc


def level(procs: int, k: int, rounds: int = 3) -> float:
    best = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        with mp.Pool(procs) as pool:
            pool.map(_burn, [k] * procs)
        dt = time.perf_counter() - t0
        tp = procs * k / dt
        best = tp if best is None or tp > best else best
    return best


def main() -> None:
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    tp_low = level(p, k)
    tp_high = level(4 * p, k)
    print(
        json.dumps(
            {
                "procs_low": p,
                "procs_high": 4 * p,
                "kloops_per_sec_low": round(tp_low, 1),
                "kloops_per_sec_high": round(tp_high, 1),
                "host_ceiling_efficiency": round((tp_high / tp_low) / 4, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
