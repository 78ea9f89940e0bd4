"""Batch 62: reference-parity row-level naming and pointer-jumping
chain resolution.

- q296 naming parity — the reference's ``to_filename`` /
  ``table_name_for_path`` contract (reference ``utils.py:69-88``,
  goldens ``tests/test_load.py:38-71``) as a ROW-LEVEL Catalyst
  expression chain (``naming.to_filename_col`` — umlaut
  transliteration, dot mapping, non-word strip, run collapse; stays
  inside codegen, no UDF). SURVEY §2.6 maps the driver-side helper to
  exactly this column form for distributed path handling; this query
  puts that surface under the external oracle. Inputs stay inside the
  documented approximation domain (ASCII + lowercase German) where
  the column chain equals the reference's NFKD fold.
- q297 redirect chains — alias/redirect resolution over a functional
  forest derived deterministically from doc_ids (parent = doc_id − 1
  except at multiples of 7): ``graph.pointer_jump_roots`` resolves
  root + depth in ceil(log2(depth)) = 3 path-doubling rounds instead
  of 6 sequential steps; the oracle walks the same chains with a
  recursive CTE. The log-round shape is what makes million-deep
  chains tractable at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..naming import table_name_for_path_col, to_filename_col
from ..sources.parquet import load_tables
from .catalog import QueryDef

# q296: row-level naming parity ------------------------------------------------


def _dirty(name: F.Column) -> F.Column:
    k = F.col("c_custkey") % 5
    return (
        F.when(k == 0, F.concat(F.lit("straße "), name))
        .when(k == 1, F.concat(F.lit("ärger."), name))
        .when(k == 2, F.concat(name, F.lit(" älter-öde")))
        .when(k == 3, F.concat(F.lit("über  "), name, F.lit("!!")))
        .otherwise(name)
    )


def q296_naming_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sanitized filename + combined-table name for deterministic
    dirty inputs built from customer names — the reference naming
    contract as pure Catalyst column expressions."""
    c = load_tables(spark, sf_dir, ["customer"])["customer"]
    dirty = _dirty(F.col("c_name"))
    path = F.concat(
        F.lit("/data/"),
        dirty,
        F.lit("_"),
        (F.col("c_custkey") % 3).cast("string"),
        F.lit(".csv"),
    )
    return c.where(F.col("c_custkey") <= 400).select(
        "c_custkey",
        dirty.alias("dirty"),
        to_filename_col(dirty).alias("filename"),
        table_name_for_path_col(path).alias("table_name"),
    )


_SQL_DIRTY = """CASE c_custkey % 5
    WHEN 0 THEN 'straße ' || c_name
    WHEN 1 THEN 'ärger.' || c_name
    WHEN 2 THEN c_name || ' älter-öde'
    WHEN 3 THEN 'über  ' || c_name || '!!'
    ELSE c_name END"""

# the reference chain: umlaut map -> '.'->'_' -> strip non-word
# (ASCII \\w, matching Java/RE2) -> trim -> collapse [-\\s]+ runs
_SQL_CLEAN = (
    "regexp_replace(trim(regexp_replace(replace(replace(replace(replace("
    "replace({x}, 'ß', 'ss'), 'ä', 'ae'), 'ö', 'oe'), 'ü', 'ue'), "
    "'.', '_'), '[^\\w\\s-]', '', 'g')), '[-\\s]+', '_', 'g')"
)

ORACLE_Q296 = f"""
WITH d AS (
  SELECT c_custkey, {_SQL_DIRTY} AS dirty
  FROM customer WHERE c_custkey <= 400),
p AS (
  SELECT c_custkey, dirty,
         dirty || '_' || CAST(c_custkey % 3 AS VARCHAR) AS stem
  FROM d)
SELECT c_custkey, dirty,
       {_SQL_CLEAN.format(x="dirty")} AS filename,
       split_part({_SQL_CLEAN.format(x="stem")}, '_', 1) AS table_name
FROM p
"""


# q297: redirect-chain resolution via pointer jumping ---------------------------

CHAIN_MOD = 7
JUMP_ROUNDS = 3  # 2^3 = 8 >= the max chain depth of 6


def q297_redirect_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve every doc's redirect chain (parent = doc_id − 1 except
    at multiples of 7) to its root + depth with 3 path-doubling
    rounds (graph.pointer_jump_roots)."""
    from ..operators.graph import pointer_jump_roots

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    parents = docs.select(
        F.col("doc_id").alias("node"),
        F.when(F.col("doc_id") % CHAIN_MOD == 0, F.col("doc_id"))
        .otherwise(F.col("doc_id") - 1)
        .alias("parent"),
    )
    out = pointer_jump_roots(parents, rounds=JUMP_ROUNDS)
    return out.select(
        F.col("node").alias("doc_id"),
        F.col("root").alias("root_id"),
        "depth",
    )


ORACLE_Q297 = f"""
WITH RECURSIVE w(doc_id, cur, d) AS (
  SELECT doc_id, doc_id, 0 FROM documents
  UNION ALL
  SELECT doc_id, cur - 1, d + 1 FROM w WHERE cur % {CHAIN_MOD} != 0
)
SELECT doc_id, CAST(cur AS BIGINT) AS root_id, CAST(d AS BIGINT) AS depth
FROM w WHERE cur % {CHAIN_MOD} = 0
"""


# q298: deterministic random walks ----------------------------------------------

WALK_LEN = 4


def q298_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """node2vec/DeepWalk sampling over the co-purchase graph: one
    4-step hash-seeded walk per node (graph.random_walks), summarized
    per step as (step, n_walks, n_distinct_nodes, node_sum) so the
    result stays bounded while pinning every walk position exactly
    (node_sum is an exact integer checksum of all walker positions)."""
    from ..operators.graph import random_walks
    from .catalog_batch18 import _edges

    walks = random_walks(_edges(spark, sf_dir), length=WALK_LEN)
    return walks.groupBy("step").agg(
        F.count("*").cast("long").alias("n_walks"),
        F.count_distinct("node").cast("long").alias("n_distinct_nodes"),
        F.sum("node").cast("long").alias("node_sum"),
    )


def _walk_oracle() -> str:
    from .catalog_batch18 import _EDGES_SQL

    score = (
        "('0x' || substr(md5('walk:' || s{p}.walk_id || ':{t}:' || e.dst),"
        " 1, 15))::BIGINT"
    )
    steps = []
    prev = "s0"
    for t in range(1, WALK_LEN + 1):
        sc = score.format(p=t - 1, t=t)
        steps.append(
            f"""s{t} AS (
  SELECT walk_id, dst AS cur FROM (
    SELECT s{t - 1}.walk_id, e.dst,
           ROW_NUMBER() OVER (PARTITION BY s{t - 1}.walk_id
                              ORDER BY {sc}, e.dst) AS rn
    FROM s{t - 1} JOIN sym e ON s{t - 1}.cur = e.src) r WHERE rn = 1)"""
        )
        prev = f"s{t}"
    all_steps = ",\n".join(steps)
    unions = "\nUNION ALL ".join(
        f"SELECT walk_id, {t} AS step, cur AS node FROM s{t}"
        for t in range(0, WALK_LEN + 1)
    )
    return f"""
WITH {_EDGES_SQL},
sym AS (SELECT src, dst FROM edges
        UNION ALL SELECT dst AS src, src AS dst FROM edges),
s0 AS (SELECT DISTINCT src AS walk_id, src AS cur FROM sym),
{all_steps},
walks AS ({unions})
SELECT CAST(step AS BIGINT) AS step,
       CAST(COUNT(*) AS BIGINT) AS n_walks,
       CAST(COUNT(DISTINCT node) AS BIGINT) AS n_distinct_nodes,
       CAST(SUM(node) AS BIGINT) AS node_sum
FROM walks GROUP BY step
"""


ORACLE_Q298 = None  # built lazily in batch62_registry (imports batch18)


def batch62_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q296_naming_parity",
            q296_naming_parity,
            ORACLE_Q296,
            "reference to_filename/table-name contract as row-level Catalyst",
        ),
        QueryDef(
            "q297_redirect_chains",
            q297_redirect_chains,
            ORACLE_Q297,
            "pointer-jumping chain resolution vs recursive-CTE walk",
        ),
        QueryDef(
            "q298_random_walks",
            q298_random_walks,
            _walk_oracle(),
            "deterministic hash-seeded node2vec walks vs unrolled SQL steps",
        ),
    ]
