"""Hardware scaling-ceiling probe (no Spark).

Embarrassingly parallel NumPy work via multiprocessing at 2/8/32 workers.
If the *hardware* cannot deliver 4x between two core counts (SMT vCPUs,
host oversubscription), no job measured there can either; this probe
documents the regime in which the N vs 4N comparison is meaningful.
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np


def work(n: int) -> float:
    rng = np.random.default_rng(n)
    a = rng.integers(0, 3000, size=(512, 512)).astype(np.uint16)
    acc = 0.0
    for _ in range(30):
        b = a.astype(np.float64)
        b = np.sin(b / 700.0) * np.cos(b / 300.0)
        acc += float(b.mean())
    return acc


def main() -> None:
    tasks = list(range(128))
    times = {}
    for procs in (2, 8, 32):
        with mp.Pool(procs) as p:
            t0 = time.perf_counter()
            p.map(work, tasks)
            times[procs] = time.perf_counter() - t0
    out = {
        "t2_s": round(times[2], 2),
        "t8_s": round(times[8], 2),
        "t32_s": round(times[32], 2),
        "speedup_2_8": round(times[2] / times[8], 2),
        "speedup_8_32": round(times[8] / times[32], 2),
        "eff_2_8": round(times[2] / (4 * times[8]), 3),
        "eff_8_32": round(times[8] / (4 * times[32]), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
