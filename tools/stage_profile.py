"""Per-stage breakdown for one registry query or bench guard (guide
§1.1 empirical loop, headless): run the target once with the UI
enabled, then dump every stage's wall time, executor-run time, task
count and input / shuffle bytes from the status REST API so the
expensive stage is identifiable without a browser.

Usage: SF=/root/testdata/sf0.1 python tools/stage_profile.py <name>
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

HERE = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(HERE))


def main() -> None:
    name = sys.argv[1]
    sf = os.environ.get("SF", "/root/testdata/sf0.1")

    import bench
    from postgresimporter_spark.plans import registry
    from postgresimporter_spark.session import get_spark

    import tools.opt_measure as om

    spark = get_spark(
        app_name=f"profile:{name}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"},
    )
    spark.range(1).count()  # warm up

    if name in om.GUARDS:
        df = om.GUARDS[name](bench, spark, sf)
    else:
        df = registry()[name].fn(spark, sf)

    spark.sparkContext.setJobDescription(f"profile:{name}")
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4050/api/v1/applications/{app_id}"
    stages = json.load(
        urllib.request.urlopen(f"{base}/stages?status=complete")
    )

    def ts(x):
        return (
            time.mktime(time.strptime(x.split(".")[0], "%Y-%m-%dT%H:%M:%S"))
            if x
            else 0.0
        )

    for s in stages:
        first, comp = s.get("firstTaskLaunchedTime"), s.get("completionTime")
        s["_wall"] = (ts(comp) - ts(first)) if first and comp else 0.0
    stages.sort(key=lambda s: -s["_wall"])
    print(f"\n== {name}: wall {wall:.2f}s, {len(stages)} stages ==")
    print(
        f"{'stage':>5} {'wall_s':>7} {'xrun_s':>7} {'tasks':>5} "
        f"{'in_MB':>8} {'sh_r_MB':>8} {'sh_w_MB':>8}  name"
    )
    for s in stages[:22]:
        print(
            f"{s['stageId']:>5} {s['_wall']:>7.2f} "
            f"{(s.get('executorRunTime') or 0)/1000.0:>7.2f} "
            f"{s['numCompleteTasks']:>5} "
            f"{(s.get('inputBytes') or 0)/1e6:>8.1f} "
            f"{(s.get('shuffleReadBytes') or 0)/1e6:>8.1f} "
            f"{(s.get('shuffleWriteBytes') or 0)/1e6:>8.1f}  "
            f"{(s.get('name') or '')[:58]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
