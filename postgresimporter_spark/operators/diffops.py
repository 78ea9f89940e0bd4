"""Snapshot diff (CDC-style) and data-quality validation operators.

Net-new engine surface (the reference delegates all query work to
Postgres — ``/root/reference/postgresimporter/main.py``); these cover
the table-maintenance side of a large-scale pipeline: "what changed
between yesterday's snapshot and today's?" and "does the loaded data
satisfy its contract?".

Scale design:

* ``snapshot_diff`` compares ROW HASHES, not rows: each side reduces to
  (key, xxhash64(struct(compare_cols))) before the join, so the shuffle
  carries 16 bytes of payload per row no matter how wide the table is,
  and the change classification is one co-partitioned full-outer
  equi-join on the key — a single shuffle of both sides.  With
  ``include_payload`` the changed rows' payloads ride along (wide
  shuffle, opt-in).  A 64-bit hash collision makes a changed row look
  unchanged with p ≈ n·2^-64 — acceptable for monitoring; pass
  ``hash_bits=128`` (two-column hash) where it isn't.
* ``check_constraints`` evaluates every rule as an aggregate over ONE
  shared scan where possible (null/range/set/unique rules fold into a
  single pass); referential rules are broadcast anti-joins when the
  parent side is dim-sized.  Output is metadata-scale (one row per
  rule), never row-level — the row-level drill-down is a filter the
  caller can apply selectively.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_COL = "change_type"


def _row_hash(df: DataFrame, cols: Sequence[str], bits: int) -> F.Column:
    s = F.struct(*[F.col(c) for c in cols])
    if bits == 64:
        return F.xxhash64(s)
    # 128-bit: two independent 64-bit hashes (seeded by column order flip)
    return F.concat_ws(
        ":",
        F.xxhash64(s).cast("string"),
        F.xxhash64(F.struct(*[F.col(c) for c in reversed(list(cols))])).cast(
            "string"
        ),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    include_payload: bool = False,
    hash_bits: int = 64,
) -> DataFrame:
    """Classify every key as ``added`` / ``removed`` / ``changed`` /
    ``unchanged`` between two snapshots.

    Output: key columns + ``change_type``.  With ``include_payload``,
    also ``old_<c>`` / ``new_<c>`` for each compared column.
    """
    if hash_bits not in (64, 128):
        raise ValueError(f"hash_bits must be 64 or 128: {hash_bits}")
    keys = list(keys)
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]
    compare_cols = list(compare_cols)

    def _side(df: DataFrame, tag: str) -> DataFrame:
        cols = [F.col(k) for k in keys] + [
            _row_hash(df, compare_cols, hash_bits).alias(f"_h_{tag}")
        ]
        if include_payload:
            cols += [
                F.col(c).alias(f"{tag}_{c}") for c in compare_cols
            ]
        return df.select(*cols)

    joined = _side(old, "old").join(_side(new, "new"), on=keys, how="full")
    change = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") == F.col("_h_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out_cols = keys + [change.alias(CHANGE_COL)]
    if include_payload:
        out_cols += [
            F.col(f"{t}_{c}")
            for c in compare_cols
            for t in ("old", "new")
        ]
    return joined.select(*out_cols)


def profile_table(
    df: DataFrame, cols: Sequence[str] | None = None, exact_distinct: bool = True
) -> DataFrame:
    """Single-pass column profile: per column — null count, distinct
    count, min and max (as strings, so heterogeneous types stack into
    one report table).

    One aggregate job produces every column's stats (Spark plans the
    multi-``count_distinct`` via a single Expand), then a driver-free
    ``stack`` unpivots to one row per column.  At 100 TB exact distinct
    per column is the expensive part — ``exact_distinct=False`` swaps in
    ``approx_count_distinct`` (HLL, one pass, no Expand blow-up).
    """
    cols = list(cols) if cols is not None else list(df.columns)
    ndv = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}"),
            ndv(F.col(c)).cast("long").alias(f"_ndv_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nulls_{c}, _ndv_{c}, _min_{c}, _max_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_nulls, n_distinct, min_value, max_value)",
        "_n AS n_rows",
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


# -- constraint validation ----------------------------------------------------


def rule_not_null(name: str, col: str) -> dict:
    return {"rule": name, "kind": "not_null", "col": col}


def rule_unique(name: str, cols: Sequence[str]) -> dict:
    return {"rule": name, "kind": "unique", "cols": list(cols)}


def rule_in_set(name: str, col: str, values: Sequence) -> dict:
    return {"rule": name, "kind": "in_set", "col": col, "values": list(values)}


def rule_range(name: str, col, low=None, high=None) -> dict:
    return {"rule": name, "kind": "range", "col": col, "low": low, "high": high}


def rule_foreign_key(
    name: str, cols: Sequence[str], parent: DataFrame, parent_cols: Sequence[str]
) -> dict:
    return {
        "rule": name,
        "kind": "foreign_key",
        "cols": list(cols),
        "parent": parent,
        "parent_cols": list(parent_cols),
    }


def check_constraints(df: DataFrame, rules: Sequence[dict]) -> DataFrame:
    """Evaluate expectation rules -> one row per rule:
    (rule, violations).  A clean table is all-zeros.

    Scan-folding: every not_null / in_set / range rule becomes a
    conditional-count aggregate in ONE pass over the table; unique
    rules need a distinct count (same pass, Expand); foreign-key rules
    are separate anti-join counts with the parent side broadcast when
    small (dim tables), unioned in lazily — one plan, no driver loop.
    """
    spark = df.sparkSession
    scan_aggs: list = []
    scan_names: list[str] = []
    parts: list[DataFrame] = []
    n_rows = F.count(F.lit(1))
    for r in rules:
        kind = r["kind"]
        if kind == "not_null":
            scan_aggs.append(F.sum(F.col(r["col"]).isNull().cast("long")))
            scan_names.append(r["rule"])
        elif kind == "in_set":
            bad = ~F.col(r["col"]).isin(*r["values"]) | F.col(r["col"]).isNull()
            scan_aggs.append(F.sum(bad.cast("long")))
            scan_names.append(r["rule"])
        elif kind == "range":
            cond = F.lit(False)
            if r["low"] is not None:
                cond = cond | (F.col(r["col"]) < F.lit(r["low"]))
            if r["high"] is not None:
                cond = cond | (F.col(r["col"]) > F.lit(r["high"]))
            cond = cond | F.col(r["col"]).isNull()
            scan_aggs.append(F.sum(cond.cast("long")))
            scan_names.append(r["rule"])
        elif kind == "unique":
            # duplicates = rows - distinct keys (null-keyed rows count
            # via the distinct's null group, matching SQL COUNT(DISTINCT))
            scan_aggs.append(
                n_rows - F.count_distinct(*[F.col(c) for c in r["cols"]])
            )
            scan_names.append(r["rule"])
        elif kind == "foreign_key":
            child = df.select(*r["cols"]).where(
                reduce(
                    lambda a, b: a & b,
                    [F.col(c).isNotNull() for c in r["cols"]],
                )
            )
            parent = r["parent"].select(
                *[
                    F.col(pc).alias(c)
                    for c, pc in zip(r["cols"], r["parent_cols"])
                ]
            )
            orphans = child.join(
                F.broadcast(parent), on=r["cols"], how="left_anti"
            )
            parts.append(
                orphans.agg(
                    F.lit(r["rule"]).alias("rule"),
                    F.count(F.lit(1)).cast("long").alias("violations"),
                ).select("rule", "violations")
            )
        else:
            raise ValueError(f"unknown rule kind: {kind}")

    if scan_aggs:
        wide = df.agg(*[a.cast("long").alias(f"_v{i}") for i, a in enumerate(scan_aggs)])
        stack_args = ", ".join(
            f"'{name}', _v{i}" for i, name in enumerate(scan_names)
        )
        parts.insert(
            0,
            wide.selectExpr(
                f"stack({len(scan_names)}, {stack_args}) AS (rule, violations)"
            ),
        )
    if not parts:
        return spark.createDataFrame([], "rule string, violations long")
    return reduce(DataFrame.unionByName, parts)


def bucket_row_hash(key_col: str, payload_cols: Sequence[str]):
    """The NULL-safe md5 row hash shared by the batch
    (``bucket_fingerprints``) and streaming
    (``streaming.pipeline.stream_bucket_fingerprints``) faces, so the
    two produce comparable fingerprints by contract.

    concat_ws silently DROPS nulls (and their separator), which would
    both hide cross-column value swaps and diverge from the SQL
    replay (NULL || x = NULL there). Every column INCLUDING the key
    therefore encodes as 'v:<value>' or the literal 'null' —
    positional and replayable as COALESCE('v:' || x, 'null') in SQL.
    (A NULL key previously fell through concat_ws's null-dropping and
    hashed as if the key column didn't exist, diverging from the SQL
    replay where '0:' || NULL is NULL; encoding the key closes that.)
    (String payloads containing ':' should be pre-escaped by the
    caller if cross-column ambiguity matters.)
    """
    from .dedup import _md5_long

    enc = [
        F.coalesce(
            F.concat(F.lit("v:"), F.col(c).cast("string")), F.lit("null")
        )
        for c in (key_col, *payload_cols)
    ]
    return _md5_long(F.concat_ws(":", *enc), 0)


def bucket_fingerprints(
    df: DataFrame,
    key_col: str,
    payload_cols: Sequence[str],
    n_buckets: int = 64,
) -> DataFrame:
    """Merkle-style bucket summary of a table: hash-partition rows by
    primary key into ``n_buckets`` buckets and reduce each bucket to
    (row count, XOR of a 60-bit md5 row hash). XOR is commutative /
    associative / self-inverse, so the fingerprint is independent of
    row order and partitioning, and two snapshots can be compared
    bucket-by-bucket with O(n_buckets) rows — the anti-entropy
    handshake replication systems use (Merkle 1987; Dynamo's sync
    trees): at 100 TB you ship 64 tiny rows, not the table, and only
    buckets whose (count, xor) differ need a row-level diff
    (``snapshot_diff`` scoped to that bucket's key range).

    The row hash covers key + payload separated by ':' so column
    drift changes the fingerprint; both legs are engine-replayable
    md5 math. The bucket is derived from the null-encoded key
    ('v:<key>' / 'null') so NULL-keyed rows land in a real bucket
    instead of propagating a NULL bucket.
    """
    from .dedup import hash_bucket

    key = F.coalesce(
        F.concat(F.lit("v:"), F.col(key_col).cast("string")), F.lit("null")
    )
    return (
        df.select(
            hash_bucket(key, n_buckets).alias("bucket"),
            bucket_row_hash(key_col, payload_cols).alias("_h"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.expr("bit_xor(_h)").cast("long").alias("xor_fp"),
        )
    )


def bucket_diff(base: DataFrame, new: DataFrame) -> DataFrame:
    """Compare two ``bucket_fingerprints`` summaries: the buckets whose
    fingerprints disagree (changed / added / removed rows live there).
    Full outer join on O(n_buckets) rows — metadata-scale."""
    b = base.select(
        "bucket",
        F.col("n_rows").alias("n_base"),
        F.col("xor_fp").alias("fp_base"),
    )
    n = new.select(
        "bucket",
        F.col("n_rows").alias("n_new"),
        F.col("xor_fp").alias("fp_new"),
    )
    j = b.join(n, on="bucket", how="full_outer")
    changed = (
        F.coalesce(F.col("n_base"), F.lit(-1))
        != F.coalesce(F.col("n_new"), F.lit(-1))
    ) | (
        F.coalesce(F.col("fp_base"), F.lit(0))
        != F.coalesce(F.col("fp_new"), F.lit(0))
    )
    return j.where(changed).select(
        "bucket", "n_base", "n_new", "fp_base", "fp_new"
    )
