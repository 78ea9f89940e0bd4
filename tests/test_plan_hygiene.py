"""Repo-wide plan hygiene: EVERY registry query's physical plan is
checked for the two global scale invariants —

1. no row-at-a-time Python UDFs (BatchEvalPython) anywhere; Arrow
   (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) is the only
   sanctioned Python surface;
2. no unpartitioned windows (the one-reducer global sort), except a
   short allowlist of queries whose window input is PROVABLY bounded
   (documented per entry below).

This is the lint that keeps a future query from quietly reintroducing
the q41/q99 class of scale-killer: any new registry entry is covered
automatically.
"""

from __future__ import annotations

import pytest

from postgresimporter_spark.operators.bucketing import physical_plan
from postgresimporter_spark.plans import registry
from test_plans import unpartitioned_windows

SF = "/root/testdata/sf0.001"

# name -> why a global window is acceptable there (input provably tiny)
GLOBAL_WINDOW_ALLOWLIST: dict[str, str] = {
    "q77_hybrid_retrieval": (
        "rank window runs AFTER .limit(20): input is exactly the 20 "
        "surviving rows (TakeOrderedAndProject does the heavy top-k)"
    ),
    "q182_rrf_fusion": (
        "rank window runs over bm25_topk's top-50 (TakeOrderedAndProject "
        "does the heavy cut); fusion input is two <=50-row lists"
    ),
}


@pytest.fixture(scope="module")
def reg():
    return registry()


def test_no_rowwise_python_udf_and_no_global_window_anywhere(spark, reg):
    failures = []
    for name, q in reg.items():
        try:
            plan = physical_plan(q.fn(spark, SF))
        except Exception as e:  # noqa: BLE001 - surface as a failure
            failures.append(f"{name}: plan build failed: {e}")
            continue
        if "BatchEvalPython" in plan:
            failures.append(f"{name}: row-at-a-time Python UDF in plan")
        if name not in GLOBAL_WINDOW_ALLOWLIST and unpartitioned_windows(
            plan
        ):
            failures.append(f"{name}: unpartitioned window in plan")
    assert not failures, "\n".join(failures)
