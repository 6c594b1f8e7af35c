"""Scaling-efficiency evidence for the corpus-hygiene scan family:
benchmark decontamination (operators/dedup.py decontaminate) over the
deterministic web_pages table at two parallelism levels, for BOTH gram
engines — grams="string" (JVM array expressions; per-gram allocation on
the one shared local-JVM heap) and grams="hashed" (the Arrow rolling-hash
kernels; grams leave per-core Python worker PROCESSES as 8-byte longs).
Same methodology as scripts/scaling_bench.py / pq_scaling_bench.py
(interleaved levels, best-of per level, clean JVM per run, 2->8 cores).

Usage:
  python scripts/text_scaling_bench.py                 # both modes + report
  python scripts/text_scaling_bench.py --run 8 hashed  # child: one timed run
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("TEXT_SCALING_ROWS", "4000000"))
DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".bench",
    f"web_pages_{ROWS}.parquet",
)
CORES = tuple(
    int(c) for c in os.environ.get("TEXT_SCALING_CORES", "2,8").split(",")
)
NGRAM = int(os.environ.get("TEXT_SCALING_N", "4"))
MODES = os.environ.get("TEXT_SCALING_GRAMS", "string,hashed").split(",")
BENCH_DATA = DATA.replace("web_pages_", "web_bench_")


def run_child(cores: int, grams: str) -> None:
    from pyspark.sql import functions as F

    from ddsketch_ruby_spark.operators.dedup import decontaminate
    from ddsketch_ruby_spark.sources.session import get_spark

    spark = get_spark(
        f"text-scaling-{cores}-{grams}", cpus=cores, shuffle_partitions=cores
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(DATA).select("url", "text")
    n = df.count()
    # benchmarks are SMALL separate tables in production — staged once at
    # generation time (building the broadcast side from a filter over the
    # full corpus would serially rescan 100% of the data on the driver
    # and measure that artifact, not the operator)
    bench = spark.read.parquet(BENCH_DATA)

    def job():
        out = decontaminate(df, bench, "text", "url", n=NGRAM, grams=grams)
        return out.agg(
            F.sum(F.col("contaminated").cast("long")).alias("hits")
        ).collect()[0]["hits"]

    job_warm = decontaminate(
        df.limit(2000), bench.limit(100), "text", "url", n=NGRAM, grams=grams
    )
    job_warm.count()
    best, hits = float("inf"), None
    for _ in range(int(os.environ.get("TEXT_SCALING_RUNS", "2"))):
        t0 = time.monotonic()
        hits = job()
        best = min(best, time.monotonic() - t0)
    print(
        json.dumps(
            {
                "cores": cores,
                "grams": grams,
                "rows": n,
                "secs": round(best, 3),
                "docs_per_sec": round(n / best, 1),
                "contaminated": int(hits),
            }
        )
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        run_child(int(sys.argv[2]), sys.argv[3] if len(sys.argv) > 3 else "string")
        return

    if not os.path.exists(DATA):
        from ddsketch_ruby_spark.sources.session import get_spark
        from ddsketch_ruby_spark.sources.webpages import web_pages

        spark = get_spark("text-scaling-gen", cpus=32)
        spark.sparkContext.setLogLevel("ERROR")
        web_pages(spark, ROWS, dist="lognormal", partitions=64).write.mode(
            "overwrite"
        ).parquet(DATA)
        spark.stop()

    if not os.path.exists(BENCH_DATA):
        from pyspark.sql import functions as F

        from ddsketch_ruby_spark.sources.session import get_spark

        spark = get_spark("text-scaling-bench-gen", cpus=32)
        spark.sparkContext.setLogLevel("ERROR")
        spark.read.parquet(DATA).filter(
            F.xxhash64("url") % 101 == 0
        ).select("text").coalesce(1).write.mode("overwrite").parquet(
            BENCH_DATA
        )
        spark.stop()

    results: dict[str, dict[int, dict]] = {m: {} for m in MODES}
    for _ in range(int(os.environ.get("TEXT_SCALING_PASSES", "2"))):
        for grams in MODES:
            for cores in CORES:
                out = subprocess.run(
                    [
                        sys.executable,
                        os.path.abspath(__file__),
                        "--run",
                        str(cores),
                        grams,
                    ],
                    capture_output=True,
                    text=True,
                    check=True,
                )
                r = json.loads(out.stdout.strip().splitlines()[-1])
                prev = results[grams].get(cores)
                if prev is not None and prev["contaminated"] != r["contaminated"]:
                    raise AssertionError(
                        f"non-deterministic result: {prev} vs {r}"
                    )
                if prev is None or r["docs_per_sec"] > prev["docs_per_sec"]:
                    results[grams][cores] = r

    # the two gram engines must agree on the ANSWER, not just scale
    hits = {m: {r["contaminated"] for r in results[m].values()} for m in MODES}
    flat = {h for s in hits.values() for h in s}
    if len(flat) != 1:
        raise AssertionError(f"gram engines disagree: {hits}")

    lo, hi = CORES
    report = {
        "job": f"decontaminate (n={NGRAM}, ~1% benchmark slice, broadcast)",
        "rows": ROWS,
        "modes": {},
    }
    for grams in MODES:
        rs = results[grams]
        eff = (rs[hi]["docs_per_sec"] / rs[lo]["docs_per_sec"]) / (hi / lo)
        report["modes"][grams] = {"levels": rs, "efficiency": round(eff, 3)}
    print(json.dumps(report, indent=2))
    with open(
        os.path.join(
            os.path.dirname(DATA), os.pardir, "BENCH",
            "text_scaling_latest.md",
        ),
        "w",
    ) as f:
        f.write(
            "# Decontaminate scan scaling (autogenerated by "
            "scripts/text_scaling_bench.py)\n\n```json\n"
            + json.dumps(report, indent=2)
            + "\n```\n"
        )


if __name__ == "__main__":
    main()
