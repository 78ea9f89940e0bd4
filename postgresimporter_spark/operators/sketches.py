"""Mergeable cardinality sketches (Apache DataSketches HLL, built into
Spark 3.5+/4 as ``hll_sketch_agg`` / ``hll_union_agg``).

Why sketches at 100 TB: an exact ``countDistinct`` over a high-
cardinality key shuffles every distinct value once per grouping you
ever ask for. A sketch is computed ONCE per fine-grained cell (say,
per day × source), stored as a few-KB binary, and any coarser rollup
(per month, per source, global) is a cheap merge of the stored
sketches — no rescan, no re-shuffle of raw data. The binary is the
standard DataSketches format, so other engines (Druid, Hive, BigQuery)
can merge the same bytes.

No DuckDB oracle applies to the DataSketches binaries (approximate,
engine-specific estimates), so those ship as operators with property
tests (estimate within the HLL error envelope of exact; merged ==
global) rather than catalog queries. ``hll_portable`` below is the
oracle-checkable counterpart: the registers themselves are md5-derived
and the accumulator is exact integer arithmetic, so ANY engine
replays the sketch bit-for-bit (q175).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# lgConfigK=12 -> 4 KB sketches, ~1.6% relative standard error: the
# DataSketches default and the right size/accuracy trade for rollups.
DEFAULT_LG_K = 12


def distinct_sketch(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lg_k: int = DEFAULT_LG_K,
    sketch_col: str = "sketch",
    estimate_col: str = "n_distinct_est",
) -> DataFrame:
    """Per-group HLL sketch + its estimate for ``value_col``.

    One shuffle on the grouping key with map-side partial sketches
    (sketches are commutative monoids — Spark plans a partial_merge).
    Keep ``key_cols`` at the finest grain you'll ever roll up from.
    """
    sk = F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(sketch_col)
    out = df.groupBy(*key_cols).agg(sk)
    return out.withColumn(
        estimate_col, F.hll_sketch_estimate(F.col(sketch_col)).cast("long")
    )


def rollup_sketches(
    sketches: DataFrame,
    key_cols: list[str],
    sketch_col: str = "sketch",
    estimate_col: str = "n_distinct_est",
) -> DataFrame:
    """Merge stored sketches up to a coarser key (possibly ``[]`` for a
    global estimate) WITHOUT touching raw data — the whole point of
    persisting the binary column."""
    merged = F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    grouped = (
        sketches.groupBy(*key_cols).agg(merged)
        if key_cols
        else sketches.agg(merged)
    )
    return grouped.withColumn(
        estimate_col, F.hll_sketch_estimate(F.col(sketch_col)).cast("long")
    )


def approx_distinct(
    df: DataFrame, key_cols: list[str], value_col: str, rsd: float = 0.016
) -> Column | DataFrame:
    """Plain HyperLogLog++ estimate (no reusable binary) — cheaper when
    the rollup-merge property isn't needed."""
    agg = F.approx_count_distinct(value_col, rsd).alias("n_distinct_est")
    return df.groupBy(*key_cols).agg(agg) if key_cols else df.agg(agg)


# --------------------------------------------------------------------------
# Portable (engine-replayable) HyperLogLog — Flajolet et al. 2007
# --------------------------------------------------------------------------

# alpha_m bias constant for m = 64 registers (the m >= 64 formula
# 0.7213 / (1 + 1.079 / m) applies from m = 128; the published m = 64
# constant is 0.709).
HLL_ALPHA_64 = 0.709
HLL_M = 64  # register count (p = 6 index bits)
_RHO_SCALE = 56  # unit 2^(56 - rho): max Z = 64 * 2^56 = 2^62 fits BIGINT


def _hll_rho(tail_hex: Column) -> Column:
    """HLL rank of a 13-nibble (52-bit) hex suffix: leading zero BITS
    + 1, computed from hex nibbles so both engines agree exactly —
    zero nibbles count via a ``^0*`` regex, the first non-zero nibble
    contributes its own 0-3 leading zero bits via a 4-way CASE. An
    all-zero suffix gets the maximal rank 53. No float log anywhere.
    """
    zn = F.length(F.regexp_extract(tail_hex, "^0*", 0))
    first = F.conv(
        F.substr(tail_hex, zn + 1, F.lit(1)), 16, 10
    ).cast("int")
    extra = (
        F.when(first >= 8, 0)
        .when(first >= 4, 1)
        .when(first >= 2, 2)
        .otherwise(3)
    )
    return F.when(zn >= 13, F.lit(53)).otherwise(zn * 4 + extra + 1)


def hll_register_rho(value_col: str) -> tuple[Column, Column]:
    """The (register index, rank) column pair every portable-HLL face
    derives from one md5: first byte mod 64 indexes the register, the
    next 52 bits' leading-zero count + 1 is the rank. Shared by the
    batch operator (``hll_portable``) and the streaming register
    maintainer (``streaming.pipeline.stream_hll``) so the two can
    never drift — their register tables are comparable by contract."""
    h = F.md5(F.col(value_col).cast("string"))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % HLL_M
    rho = _hll_rho(F.substring(h, 3, 13))
    return reg, rho


def hll_portable(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    estimate_col: str = "est_distinct",
) -> DataFrame:
    """Per-group HyperLogLog with engine-replayable determinism: the
    register index is the first md5 byte mod 64, the rank is the
    leading-zero count of the next 52 bits, and the harmonic-mean
    accumulator Z = Σ 2^-M_j runs as Σ 2^(56-M_j) in exact BIGINT
    (max 64·2^56 = 2^62, inside signed-64) — so a SQL oracle
    reproduces the registers AND the
    accumulator bit-for-bit, and the one double division at the end is
    deterministic (identical IEEE inputs both engines).

    Shape: two bounded shuffles — (key, register) max-rank with
    map-side partials, then a 64-rows-per-key rollup. Register state
    is O(|keys| x 64) regardless of input size: the 100 TB
    count-distinct answer. No small-range (linear counting) correction
    is applied — callers in the n >> m regime (the intended one) don't
    need it, and the raw estimate keeps the oracle formula exact.

    Returns key_cols + (hit_registers, z_scaled BIGINT,
    ``estimate_col`` DOUBLE rounded to 4).

    NULL values are excluded before hashing (COUNT DISTINCT
    semantics): md5(NULL) would otherwise emit a NULL register row
    per key, inflating hit_registers (even past HLL_M) and dropping
    one genuinely-empty register's 2^56 term from Z.
    """
    reg, rho = hll_register_rho(value_col)
    regs = (
        df.where(F.col(value_col).isNotNull())
        .select(*key_cols, reg.alias("_reg"), rho.alias("_rho"))
        .groupBy(*key_cols, "_reg")
        .agg(F.max("_rho").alias("_mrho"))
    )
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_RHO_SCALE} - _mrho)")
    per_key = regs.groupBy(*key_cols).agg(
        F.count("*").cast("long").alias("hit_registers"),
        F.sum(term).cast("long").alias("_zhit"),
    )
    empties = (F.lit(HLL_M) - F.col("hit_registers")).cast("long") * F.lit(
        1 << _RHO_SCALE
    ).cast("long")
    z = (F.col("_zhit") + empties).cast("long")
    # alpha * m^2 * 2^56 folded to ONE Python double literal; a single
    # division by the exactly-reconstructed Z keeps the double math to
    # one deterministic operation
    numer = HLL_ALPHA_64 * HLL_M * HLL_M * float(1 << _RHO_SCALE)
    return per_key.select(
        *key_cols,
        "hit_registers",
        z.alias("z_scaled"),
        F.round(F.lit(numer) / z.cast("double"), 4).alias(estimate_col),
    )


def hll_portable_sql(
    table_expr: str, key_sql: str, value_sql: str, estimate_col: str = "est_distinct"
) -> str:
    """The DuckDB replay of ``hll_portable`` — kept beside the operator
    so query oracles can't drift from the Spark constants."""
    numer = HLL_ALPHA_64 * HLL_M * HLL_M * float(1 << _RHO_SCALE)
    return f"""
hashed AS (
  SELECT {key_sql} AS k, md5(CAST({value_sql} AS VARCHAR)) AS h
  FROM {table_expr} WHERE {value_sql} IS NOT NULL),
ranked AS (
  SELECT k,
    ('0x' || substr(h, 1, 2))::BIGINT % {HLL_M} AS reg,
    CASE WHEN length(regexp_extract(substr(h, 3, 13), '^0*')) >= 13
         THEN 53
         ELSE length(regexp_extract(substr(h, 3, 13), '^0*')) * 4
              + (CASE
                   WHEN ('0x' || substr(substr(h, 3, 13),
                     length(regexp_extract(substr(h, 3, 13), '^0*')) + 1,
                     1))::BIGINT >= 8 THEN 0
                   WHEN ('0x' || substr(substr(h, 3, 13),
                     length(regexp_extract(substr(h, 3, 13), '^0*')) + 1,
                     1))::BIGINT >= 4 THEN 1
                   WHEN ('0x' || substr(substr(h, 3, 13),
                     length(regexp_extract(substr(h, 3, 13), '^0*')) + 1,
                     1))::BIGINT >= 2 THEN 2
                   ELSE 3 END) + 1 END AS rho
  FROM hashed),
regs AS (
  SELECT k, reg, MAX(rho) AS mrho FROM ranked GROUP BY k, reg),
perkey AS (
  SELECT k,
    CAST(COUNT(*) AS BIGINT) AS hit_registers,
    CAST(SUM(1::BIGINT << ({_RHO_SCALE} - mrho))
         + ({HLL_M} - COUNT(*)) * (1::BIGINT << {_RHO_SCALE})
         AS BIGINT) AS z_scaled
  FROM regs GROUP BY k)
SELECT k, hit_registers, z_scaled,
       round({numer!r} / CAST(z_scaled AS DOUBLE), 4) AS {estimate_col}
FROM perkey
"""


def hll_rollup(
    df: DataFrame,
    key_col: str,
    value_col: str,
    all_key: str = "ALL",
    estimate_col: str = "est_distinct",
) -> DataFrame:
    """Per-key portable-HLL estimates PLUS a global row MERGED from
    the per-key register table (max rank per register across keys) —
    HLL's mergeability contract made observable: the global estimate
    is derived from the O(|keys| x 64) sketch state, never by
    rescanning raw values, which is exactly how a 100 TB rollup
    (or a union of per-shard sketches) has to work. Same register/rank
    derivation and finalization as ``hll_portable``; the SQL twin is
    ``hll_rollup_sql``. Returns (scope, hit_registers, z_scaled,
    ``estimate_col``), scope = key value or ``all_key``."""
    reg, rho = hll_register_rho(value_col)
    regs = (
        df.where(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).cast("string").alias("scope"),
            reg.alias("_reg"),
            rho.alias("_rho"),
        )
        .groupBy("scope", "_reg")
        .agg(F.max("_rho").alias("_mrho"))
        .localCheckpoint(eager=False)
    )
    merged = (
        regs.groupBy("_reg")
        .agg(F.max("_mrho").alias("_mrho"))
        .select(F.lit(all_key).alias("scope"), "_reg", "_mrho")
    )
    both = regs.unionByName(merged)
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_RHO_SCALE} - _mrho)")
    per_key = both.groupBy("scope").agg(
        F.count("*").cast("long").alias("hit_registers"),
        F.sum(term).cast("long").alias("_zhit"),
    )
    empties = (F.lit(HLL_M) - F.col("hit_registers")).cast("long") * F.lit(
        1 << _RHO_SCALE
    ).cast("long")
    z = (F.col("_zhit") + empties).cast("long")
    numer = HLL_ALPHA_64 * HLL_M * HLL_M * float(1 << _RHO_SCALE)
    return per_key.select(
        "scope",
        "hit_registers",
        z.alias("z_scaled"),
        F.round(F.lit(numer) / z.cast("double"), 4).alias(estimate_col),
    )


def hll_rollup_sql(
    table_expr: str,
    key_sql: str,
    value_sql: str,
    all_key: str = "ALL",
    estimate_col: str = "est_distinct",
) -> str:
    """The DuckDB replay of ``hll_rollup`` — per-key registers plus
    the merged global registers, finalized identically. Kept beside
    the operator so oracles can't drift from the Spark constants."""
    numer = HLL_ALPHA_64 * HLL_M * HLL_M * float(1 << _RHO_SCALE)
    return f"""
hashed AS (
  SELECT CAST({key_sql} AS VARCHAR) AS scope,
         md5(CAST({value_sql} AS VARCHAR)) AS h
  FROM {table_expr} WHERE {value_sql} IS NOT NULL),
ranked AS (
  SELECT scope,
    ('0x' || substr(h, 1, 2))::BIGINT % {HLL_M} AS reg,
    CASE WHEN length(regexp_extract(substr(h, 3, 13), '^0*')) >= 13
         THEN 53
         ELSE length(regexp_extract(substr(h, 3, 13), '^0*')) * 4
              + (CASE
                   WHEN ('0x' || substr(substr(h, 3, 13),
                     length(regexp_extract(substr(h, 3, 13), '^0*')) + 1,
                     1))::BIGINT >= 8 THEN 0
                   WHEN ('0x' || substr(substr(h, 3, 13),
                     length(regexp_extract(substr(h, 3, 13), '^0*')) + 1,
                     1))::BIGINT >= 4 THEN 1
                   WHEN ('0x' || substr(substr(h, 3, 13),
                     length(regexp_extract(substr(h, 3, 13), '^0*')) + 1,
                     1))::BIGINT >= 2 THEN 2
                   ELSE 3 END) + 1 END AS rho
  FROM hashed),
hregs AS (
  SELECT scope, reg, MAX(rho) AS mrho FROM ranked GROUP BY scope, reg),
allregs AS (
  SELECT '{all_key}' AS scope, reg, MAX(mrho) AS mrho
  FROM hregs GROUP BY reg),
bothregs AS (
  SELECT * FROM hregs UNION ALL SELECT * FROM allregs),
perscope AS (
  SELECT scope,
    CAST(COUNT(*) AS BIGINT) AS hit_registers,
    CAST(SUM(1::BIGINT << ({_RHO_SCALE} - mrho))
         + ({HLL_M} - COUNT(*)) * (1::BIGINT << {_RHO_SCALE})
         AS BIGINT) AS z_scaled
  FROM bothregs GROUP BY scope)
SELECT scope, hit_registers, z_scaled,
       round({numer!r} / CAST(z_scaled AS DOUBLE), 4) AS {estimate_col}
FROM perscope
"""


__all__ = [
    "distinct_sketch",
    "rollup_sketches",
    "approx_distinct",
    "hll_portable",
    "hll_portable_sql",
    "hll_register_rho",
    "hll_rollup",
    "hll_rollup_sql",
    "DEFAULT_LG_K",
    "HLL_ALPHA_64",
    "HLL_M",
]
