"""Round-8 property tests (hypothesis): the type-inference rules and
the quantile-normalization mapping against independent Python models
over generated inputs."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from postgresimporter_spark.operators.typeinfer import TYPE_RULES

_PY_RULES = [(name, re.compile(rx)) for name, rx in TYPE_RULES]


def _py_infer(values: list[str | None]) -> str:
    present = [v for v in values if v is not None and v != ""]
    if not present:
        return "text"
    for name, rx in _PY_RULES:
        if all(rx.match(v) for v in present):
            return name
    return "text"


_VALUE = st.one_of(
    st.integers(-10**12, 10**12).map(str),
    st.floats(
        allow_nan=False, allow_infinity=False, width=32
    ).map(lambda x: repr(float(x))),
    st.dates().map(lambda d: d.isoformat()),
    st.datetimes().map(lambda d: d.strftime("%Y-%m-%d %H:%M:%S")),
    st.sampled_from(["true", "False", "T", "f", "0", "1"]),
    st.text(
        alphabet="abz0. -e$", min_size=0, max_size=12
    ),
    st.none(),
)


@settings(max_examples=30, deadline=None)
@given(st.lists(_VALUE, min_size=1, max_size=8))
def test_type_inference_matches_python_model(spark, values):
    """Spark's rlike-based inference equals the Python re model for
    arbitrary generated value mixes (same anchored patterns, same
    NULL/empty exclusion, same precedence)."""
    from postgresimporter_spark.operators.typeinfer import (
        infer_column_types,
    )

    df = spark.createDataFrame([(v,) for v in values], "c string")
    got = infer_column_types(df).collect()[0]
    assert got.inferred_type == _py_infer(values)
    n_present = sum(1 for v in values if v is not None and v != "")
    assert got.n_values == n_present


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000)),
        min_size=2,
        max_size=24,
        unique_by=lambda t: t,
    )
)
def test_quantile_normalize_matches_python_model(spark, rows):
    """The integer rank-to-pooled-rank mapping equals a sequential
    Python replay for arbitrary generated (group, score) sets."""
    from postgresimporter_spark.operators.curation import (
        quantile_normalize,
    )

    data = [(i, f"g{g}", s) for i, (g, s) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "doc_id long, source string, n_chars long"
    )
    got = {
        r.doc_id: r.norm_score
        for r in quantile_normalize(
            df, "source", "n_chars", "doc_id"
        ).collect()
    }

    pooled = sorted(data, key=lambda t: (t[2], t[0]))
    N = len(pooled)
    by_group: dict[str, list[tuple[int, int]]] = {}
    for i, g, s in data:
        by_group.setdefault(g, []).append((s, i))
    want = {}
    for g, members in by_group.items():
        members.sort()
        n_s = len(members)
        for rank0, (_s, i) in enumerate(members):
            if n_s == 1:
                target = 1 + (N - 1) // 2
            else:
                target = 1 + (rank0 * (N - 1)) // (n_s - 1)
            want[i] = pooled[target - 1][2]
    assert got == want
