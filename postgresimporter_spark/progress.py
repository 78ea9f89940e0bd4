"""Job progress reporting (reference R4/R7: pgfutter stdout scraping +
aggregated progress bar, main.py:56-120 — replaced by Spark's native
status tracker)."""

from __future__ import annotations

import contextlib
import threading
import time

from pyspark.sql import SparkSession


@contextlib.contextmanager
def report_progress(spark: SparkSession, interval_s: float = 0.5, sink=print):
    """Poll the status tracker while the body runs, emitting
    ``active stages / total tasks done`` lines (the reference polled its
    subprocess queue every 0.5 s, main.py:91)."""
    tracker = spark.sparkContext.statusTracker()
    stop = threading.Event()

    def _poll():
        while not stop.is_set():
            stage_ids = tracker.getActiveStageIds()
            done = active = 0
            for sid in stage_ids:
                info = tracker.getStageInfo(sid)
                if info:
                    done += info.numCompletedTasks
                    active += info.numActiveTasks
            if stage_ids:
                sink(
                    f"[progress] stages={list(stage_ids)} "
                    f"tasks done={done} active={active}"
                )
            stop.wait(interval_s)

    t = threading.Thread(target=_poll, daemon=True)
    t.start()
    try:
        yield
    finally:
        stop.set()
        t.join(timeout=2)


__all__ = ["report_progress"]
