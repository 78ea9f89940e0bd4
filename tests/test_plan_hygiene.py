"""Repo-wide plan hygiene: EVERY registry query's physical plan is
checked for the two global scale invariants —

1. no row-at-a-time Python UDFs (BatchEvalPython) anywhere; Arrow
   (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) is the only
   sanctioned Python surface;
2. no unpartitioned windows (the one-reducer global sort), except a
   short allowlist of queries whose window input is PROVABLY bounded
   (documented per entry below);
3. no CartesianProduct nodes, except an allowlist of joins whose BOTH
   sides are provably bounded (documented per entry below) — a
   non-equi join that silently plans as a cartesian over table-sized
   inputs is the classic hidden scale-killer.

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

# name -> why a CartesianProduct node is acceptable there (both join
# sides provably bounded)
CARTESIAN_ALLOWLIST: dict[str, str] = {
    "q195_gini_lorenz": (
        "the d' <= d cumulative self-join runs over the 10-row decile "
        "aggregate — 10x10 by construction, chosen INSTEAD of a global "
        "window"
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
        if (
            name not in CARTESIAN_ALLOWLIST
            and "CartesianProduct" in plan
        ):
            failures.append(f"{name}: CartesianProduct in plan")
    assert not failures, "\n".join(failures)
