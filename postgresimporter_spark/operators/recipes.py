"""Config-driven curation recipes: the corpus-build pipeline as data.

``run_recipe(docs, recipe)`` chains the engine's oracle-checked
curation operators from a JSON-friendly stage list — the way a data
team actually operates a corpus build (a reviewed config in the repo,
not a bespoke script per run):

    recipe = [
        {"stage": "exact_dedup"},
        {"stage": "quality_gates"},
        {"stage": "source_quota", "max_per_group": 20},
        {"stage": "mixture", "weights": {"src0": 250, "src1": 100}},
    ]
    out = run_recipe(docs, recipe)

Every stage delegates to an existing operator (each differentially
tested on its own); the runner adds composition mechanics only:
schema threading (doc_id/text/source in, same out), a lineage-capping
``localCheckpoint`` between stages (invariant 6/7 — several operators
read their input twice internally), and fail-fast validation of stage
names and parameters. ``tests/test_recipes.py`` pins the runner
against q138's hand-written composition — byte-equal output.

Scale posture is inherited from the stages; the runner itself adds no
shuffle, no driver data path, and no Python row work.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _stage_exact_dedup(docs: DataFrame, **kw: Any) -> DataFrame:
    from .dedup import exact_dedup

    surv = exact_dedup(docs, **kw).select("doc_id")
    return docs.join(surv, on="doc_id")


def _stage_minhash_dedup(
    docs: DataFrame, threshold: float = 0.8, **kw: Any
) -> DataFrame:
    from .components import connected_components
    from .dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs, threshold=threshold, **kw)
    labels = connected_components(pairs)
    # survivors: cluster minimum plus every unclustered doc
    losers = labels.where(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    return docs.join(losers, on="doc_id", how="left_anti")


def _stage_quality_gates(docs: DataFrame, **kw: Any) -> DataFrame:
    from .curation import quality_gates
    from .textstats import quality_features

    passed = (
        quality_gates(quality_features(docs), **kw)
        .where(F.col("passes"))
        .select("doc_id")
    )
    return docs.join(passed, on="doc_id")


def _stage_line_filter(
    docs: DataFrame, min_words: int = 5, **kw: Any
) -> DataFrame:
    from .textclean import filter_lines, rebuild

    kept = filter_lines(
        F.split(F.col("text"), "\n"), min_words=min_words, **kw
    )
    return docs.withColumn("text", rebuild(kept))


def _stage_pii_redact(docs: DataFrame, **kw: Any) -> DataFrame:
    from .curation import redact_text

    redacted = redact_text(docs, "text", out_col="_redacted", **kw)
    keep = [c for c in docs.columns if c != "text"]
    return redacted.select(
        *keep, F.col("_redacted").alias("text")
    )


def _stage_source_quota(
    docs: DataFrame, max_per_group: int = 20, **kw: Any
) -> DataFrame:
    from .curation import source_quota

    capped = source_quota(
        docs.select("doc_id", "source"), max_per_group=max_per_group, **kw
    ).select("doc_id")
    return docs.join(capped, on="doc_id")


def _stage_mixture(docs: DataFrame, weights: dict, **kw: Any) -> DataFrame:
    from .curation import mixture_upsample

    return mixture_upsample(
        docs.select("doc_id", "source"), weights, **kw
    ).select("doc_id", "source", F.col("epoch").cast("long").alias("epoch"))


STAGES: dict[str, Callable[..., DataFrame]] = {
    "exact_dedup": _stage_exact_dedup,
    "minhash_dedup": _stage_minhash_dedup,
    "quality_gates": _stage_quality_gates,
    "line_filter": _stage_line_filter,
    "pii_redact": _stage_pii_redact,
    "source_quota": _stage_source_quota,
    "mixture": _stage_mixture,
}


def run_recipe(docs: DataFrame, recipe: list[dict]) -> DataFrame:
    """Apply the stage list in order (see module docstring). Raises
    ValueError on an unknown stage name or a non-terminal ``mixture``
    (mixture changes the schema to the epoch plan, so it must be
    last)."""
    if not recipe:
        raise ValueError("recipe must contain at least one stage")
    out = docs
    for i, step in enumerate(recipe):
        step = dict(step)
        name = step.pop("stage", None)
        fn = STAGES.get(name)
        if fn is None:
            raise ValueError(
                f"unknown stage {name!r}; available: {sorted(STAGES)}"
            )
        if name == "mixture" and i != len(recipe) - 1:
            raise ValueError("'mixture' must be the final stage")
        out = fn(out, **step)
        if name != "mixture":
            # cap lineage between stages: several operators read their
            # input twice internally (invariant 7)
            out = out.localCheckpoint(eager=False)
    return out


__all__ = ["run_recipe", "STAGES"]
