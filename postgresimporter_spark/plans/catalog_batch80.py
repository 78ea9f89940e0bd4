"""Batch 80: alignment-keyed exact Hamming join (the static-video
shape).

Round-10 maintenance-rule trigger (b), scale-failure repro (the same
duplicated/concentrated-input probe program as q321-q324): the video
near-dup caller filtered timeline alignment AFTER
``dedup.hamming_pairs_mih`` — so the expansion join for near-match
(non-equal) fingerprint values keyed on ``fp_b`` ALONE, with the
frame-offset equality left as a residual join condition. Two
corpus-wide hot near-match values (two families of static videos —
near-black intros, color bars, slide decks) then enumerated
|family_a| x |family_b| rows inside ONE sort-merge key group on one
task: measured 505.6s -> 9.3s (54x, identical 4,950-pair output) on a
100-video x 1,000-frame two-family corpus once the offset moved into
the join key (``hamming_pairs_mih(align_cols=[...])``; the
equal-value branch was already implicitly keyed — Catalyst derived
the offset equi-key through the old ``substring_index`` fid parse —
but the near-match expansion was not, and relying on optimizer
constraint derivation for the scale property was brittle either way).

q325 pins the align-keyed join externally on the catalog's standard
duplicated-documents corpus, reshaped into the static-video form:
every document becomes a 6-slot "video" whose per-slot fingerprint is
the document SimHash, with one bit flipped per slot for every 4th
document so slot matches drop in and out of the Hamming budget and
``n_matched`` varies — a drifted align key (dropped, duplicated, or
misaligned slot pairs) shifts pair counts the oracle's brute-force
slot-equality join catches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from .catalog import QueryDef
from .catalog_batch8 import HAMMING_BITS, _simhash_cte
from .catalog_northstar import _duped_docs

ALIGN_SLOTS = 6
ALIGN_MAX_HAMMING = 6
ALIGN_MIN_MATCHED = 2


def q325_hamming_aligned_static(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Aligned-slot Hamming pairs over a synthetic static-video corpus
    derived from the duplicated documents: 6 slots per document, the
    document's 32-bit SimHash as every slot's fingerprint, bit ``slot``
    flipped for every 4th document. Pairs must agree on the slot
    (``align_cols``) and land within Hamming 6; output is the per-pair
    count of matched slots — the video near-dup aggregate shape."""
    fps = D.simhash(_duped_docs(spark, sf_dir), bits=HAMMING_BITS)
    frames = fps.select(
        "id",
        F.explode(
            F.array(*[F.lit(j) for j in range(ALIGN_SLOTS)])
        ).alias("slot"),
        "simhash",
    )
    flip = F.when(
        F.col("id") % 4 == 0,
        F.expr("shiftleft(CAST(1 AS BIGINT), slot)"),
    ).otherwise(F.lit(0).cast("long"))
    frames = frames.select(
        "id", "slot", F.col("simhash").bitwiseXOR(flip).alias("simhash")
    )
    pairs = D.hamming_pairs_mih(
        frames,
        bits=HAMMING_BITS,
        blocks=4,
        max_hamming=ALIGN_MAX_HAMMING,
        align_cols=["slot"],
    )
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count_distinct("slot").cast("long").alias("n_matched"))
        .where(F.col("n_matched") >= ALIGN_MIN_MATCHED)
    )


ORACLE_Q325 = f"""
WITH {_simhash_cte()},
frames AS (
  SELECT id, j AS slot,
         xor(simhash,
             CASE WHEN id % 4 = 0 THEN CAST(1 << j AS BIGINT)
                  ELSE 0 END) AS fp
  FROM sh, (SELECT unnest(range({ALIGN_SLOTS})) AS j)),
m AS (
  SELECT a.id AS id_a, b.id AS id_b, a.slot
  FROM frames a JOIN frames b ON a.slot = b.slot AND a.id < b.id
  WHERE bit_count(xor(a.fp, b.fp)) <= {ALIGN_MAX_HAMMING})
SELECT id_a, id_b, CAST(COUNT(DISTINCT slot) AS BIGINT) AS n_matched
FROM m GROUP BY 1, 2
HAVING COUNT(DISTINCT slot) >= {ALIGN_MIN_MATCHED}
"""


def batch80_registry() -> list[QueryDef]:
    return [
        QueryDef(
            "q325_hamming_aligned_static",
            q325_hamming_aligned_static,
            ORACLE_Q325,
            "alignment-keyed MIH Hamming join on the static-video shape",
        ),
    ]
