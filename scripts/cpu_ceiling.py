"""Calibrates this sandbox's raw CPU scaling ceiling: the same vectorized
NumPy kernel run in N independent processes, N in {2,4,8,16,32}. The
reported efficiency of any Spark job at N->4N cores is only meaningful
relative to this hardware ceiling.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np


def burn(seed: int) -> int:
    rng = np.random.default_rng(seed)
    a = rng.random(200_000)
    t0 = time.time()
    it = 0
    while time.time() - t0 < 2.0:
        b = np.log2(np.abs(a) + 1.0)
        np.ceil(b * 7.3)
        it += 1
    return it


def main() -> None:
    out = {}
    for n in (2, 4, 8, 16, 32):
        with mp.Pool(n) as p:
            res = p.map(burn, range(n))
        out[n] = sum(res)
    eff = {
        f"{n}->{4*n}": round((out[4 * n] / out[n]) / 4.0, 3)
        for n in (2, 4, 8)
    }
    print(json.dumps({"total_iters": out, "efficiency_Nto4N": eff}))


if __name__ == "__main__":
    main()
