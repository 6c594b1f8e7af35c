"""Measure this box's same-socket scaling envelope WITHOUT Spark.

Any N -> 4N-cores-on-one-socket efficiency reading is bounded above by
how much per-core throughput the hardware itself loses as occupancy
rises (frequency scaling, shared LLC, shared DRAM channels). This probe
quantifies that bound for the two extremes:

- alu: fixed pure-Python integer loop per process (cache-resident ALU) —
  the best case any job can hope for.
- mem: 200 MB NumPy copy+mutate per process (DRAM-streaming) — the
  envelope for bandwidth-bound jobs (regex chains over strings, wide
  scans).

Per-process wall time at K concurrent processes, identical work each;
the ratio t(2)/t(8) is the hardware's own 2->8 per-core retention. A
Spark job measuring efficiency E at 2->8 cores on this box has true
plan efficiency ~E / retention. Results feed
BENCH/webcorpus_scaling_latest.md's envelope section.

Usage: python scripts/hw_envelope_probe.py [procs ...]  (default 2 8)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _alu(q):
    t0 = time.monotonic()
    x = 0
    for i in range(30_000_000):
        x += i & 7
    q.put(time.monotonic() - t0)


def _mem(q):
    import numpy as np

    a = np.random.default_rng(1).integers(
        0, 255, 200_000_000, dtype=np.uint8
    )
    b = np.empty_like(a)
    t0 = time.monotonic()
    for _ in range(5):
        np.copyto(b, a)
        a[::2] += 1
    q.put(time.monotonic() - t0)


def run(target, n: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=target, args=(q,)) for _ in range(n)]
    for p in ps:
        p.start()
    ts = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(ts) / len(ts)


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [2, 8]
    out: dict[str, dict] = {}
    for name, target in (("alu", _alu), ("mem", _mem)):
        per = {
            n: round(min(run(target, n) for _ in range(2)), 3)
            for n in levels
        }
        lo, hi = min(levels), max(levels)
        out[name] = {
            "per_proc_secs": {str(n): per[n] for n in levels},
            f"retention_{lo}to{hi}": round(per[lo] / per[hi], 3),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
