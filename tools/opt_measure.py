"""Round-13 optimization measurement helper (guide §1).

Usage:
    python tools/opt_measure.py <query_or_guard> [more...]

For each name: builds the DataFrame (registry query at $SF, default
/root/testdata/sf0.1, or a bench guard via bench.py's builder), writes
``plans/r13/<name>_<TAG>.txt`` ($TAG, default "before") with the
``explain("formatted")`` output, and times min-of-$RUNS (default 3)
with BOTH the bench's action (``count()``) and the noop sink
(``df.write.format("noop")``) so computation is separable from the
count's column pruning (guide §1.4). Guards that are full pipelines
(ingest) time end-to-end like the bench does.

Jobs are labelled with setJobDescription for UI traceability.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(HERE))

GUARDS = {
    "wmh_dup4": lambda bench, spark, sf: bench._wmh_dup(spark, sf),
    "align_static": lambda bench, spark, sf: bench._align_static(spark),
    "sessionize_hot": lambda bench, spark, sf: bench._sessionize_hot(spark),
    "asof_hot": lambda bench, spark, sf: bench._asof_hot(spark),
    "quantile_hot": lambda bench, spark, sf: bench._quantile_hot(spark),
    "interval_mixed": lambda bench, spark, sf: bench._interval_mixed(spark),
    "winnow_giant64": lambda bench, spark, sf: bench._winnow_giant(
        spark, bench._ensure_winnow_giant(spark)
    ),
    "img_neardup": lambda bench, spark, sf: bench._img_neardup(
        spark, bench._ensure_media(spark)
    ),
    "video_neardup": lambda bench, spark, sf: bench._video_neardup(
        spark, bench._ensure_video(spark)
    ),
}


def main() -> None:
    sf = os.environ.get("SF", "/root/testdata/sf0.1")
    runs = int(os.environ.get("RUNS", "3"))
    tag = os.environ.get("TAG", "before")
    noop = os.environ.get("NOOP", "1") != "0"

    import bench
    from postgresimporter_spark.plans import registry
    from postgresimporter_spark.session import get_spark

    spark = get_spark(app_name="opt_measure")
    spark.range(1).count()  # warm up
    reg = registry()
    outdir = HERE / "plans" / "r13"
    outdir.mkdir(parents=True, exist_ok=True)

    for name in sys.argv[1:]:
        if name in GUARDS:
            build = lambda: GUARDS[name](bench, spark, sf)  # noqa: E731
        elif name == "ingest":
            csv_dir = bench._ensure_ingest_csv(spark, sf)
            best = min(
                _timed(lambda: bench._ingest(spark, csv_dir, tag="_opt"))
                for _ in range(runs)
            )
            print(f"{name}: end-to-end min-of-{runs} {best:.3f}s")
            continue
        else:
            q = reg[name]
            build = lambda q=q: q.fn(spark, sf)  # noqa: E731

        df = build()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (outdir / f"{name}_{tag}.txt").write_text(buf.getvalue())

        spark.sparkContext.setJobDescription(f"{name} [{tag}] count")
        t_count = min(
            _timed(lambda: build().count()) for _ in range(runs)
        )
        t_noop = None
        if noop:
            spark.sparkContext.setJobDescription(f"{name} [{tag}] noop")
            t_noop = min(
                _timed(
                    lambda: build()
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )
                for _ in range(runs)
            )
        spark.sparkContext.setJobDescription(None)
        extra = f" noop {t_noop:.3f}s" if t_noop is not None else ""
        print(f"{name}: count min-of-{runs} {t_count:.3f}s{extra}")


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
