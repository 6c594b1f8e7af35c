"""Single-core kernel microbenchmark: add_batch / merge / quantile
throughput of the pure-NumPy DDSketch. Prints one JSON line."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ddsketch_ruby_spark.kernel import DDSketch


def main() -> None:
    rng = np.random.default_rng(42)
    n = 2_000_000
    vals = rng.lognormal(0, 1, n) * 100

    s = DDSketch.collapsing_lowest(0.01, 2048)
    s.add_batch(vals[:1000])  # warm
    t0 = time.perf_counter()
    s.add_batch(vals)
    add_dt = time.perf_counter() - t0

    # batched adds (the executor shape: 64k Arrow batches)
    s2 = DDSketch.collapsing_lowest(0.01, 2048)
    t0 = time.perf_counter()
    for i in range(0, n, 65536):
        s2.add_batch(vals[i : i + 65536])
    add_batched_dt = time.perf_counter() - t0

    parts = []
    for chunk in np.array_split(vals, 200):
        p = DDSketch.collapsing_lowest(0.01, 2048)
        p.add_batch(chunk)
        parts.append(p)
    t0 = time.perf_counter()
    m = DDSketch.collapsing_lowest(0.01, 2048)
    for p in parts:
        m.merge(p)
    merge_dt = time.perf_counter() - t0

    t0 = time.perf_counter()
    for q in np.linspace(0.001, 0.999, 1000):
        m.get_quantile_value(float(q))
    q_dt = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "values_per_sec_one_batch": round(n / add_dt, 0),
                "values_per_sec_64k_batches": round(n / add_batched_dt, 0),
                "merges_per_sec": round(200 / merge_dt, 1),
                "quantile_queries_per_sec": round(1000 / q_dt, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
