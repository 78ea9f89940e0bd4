"""Benchmark runner: executes the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints exactly ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Timing is end-to-end per query: plan + execute + count (count forces full
execution without driver-side result transfer costs dominating).

Each query runs ``$SPARK_GRAFT_BENCH_RUNS`` times (default 3) and the
MINIMUM is reported: this sandbox shows ~60% run-to-run variance
(VERDICT r01), and min-of-N is the standard way to separate the query's
actual cost from scheduler/GC noise so round-over-round regressions are
real signal.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_revenue_delta",
    "q10_top_customers_per_nation",
    "q16_events_hourly",
    "q17_sessionize",
    "q24_dedup_exact",
    "q26_minhash_lsh",
    "q28_similarity_topk",
    "q46_similarity_ivf",
    "q48_salted_agg",
    "q49_pandas_tokenize",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from postgresimporter_spark.plans import registry
    from postgresimporter_spark.session import get_spark

    spark = get_spark(app_name="bench")
    reg = registry()

    # warm up the JVM + parquet footers with one tiny action
    spark.range(1).count()

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = reg[name]
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
