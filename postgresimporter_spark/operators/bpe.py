"""BPE merge learning: tokenizer training as an iterative Spark job.

Byte-pair encoding (Sennrich et al. 2016) drives every modern LLM
tokenizer; training it over a 100 TB corpus is a canonical "big
aggregation, tiny state" job: ONE corpus-scale shuffle builds the
word-frequency table (vocabulary-sized, ≪ corpus), and every merge
round after that touches only the vocabulary.  Each round collects
exactly one row (the argmax pair) to the driver — the same
metadata-scale collect discipline as k-means centroids
(``kmeans.py``).

The trick that keeps both the engine and the DuckDB oracle in pure
relational code (no per-row Python, no recursion) is the *wrapped
string* encoding of a symbol sequence::

    [h, e, y, </w>]   ⇢   ␟h␟␟e␟␟y␟␟</w>␟        (␟ = U+001F)

Every symbol is individually wrapped, so applying merge (a, b) is a
single SQL ``replace(s, '␟a␟␟b␟', '␟ab␟')`` — and because SQL
``replace`` substitutes non-overlapping occurrences left-to-right,
continuing *after* each replacement, it implements exactly the greedy
single-pass merge of the reference BPE algorithm ("aaa" + merge(a,a)
→ [aa, a], not [aa, aa]).  Both Spark's ``replace`` and DuckDB's
``replace`` share this semantic, which is what makes the differential
oracle exact.

Scale posture: rounds run over the vocabulary only; pair counting is a
groupBy on (left, right) bounded by Σ word lengths over the vocab; the
driver holds one (left, right, count) row per round.  At web scale the
vocab table is a few GB — trivially shuffleable — while the corpus is
read exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

SEP = "\x1f"

MERGE_SCHEMA = StructType(
    [
        StructField("merge_round", LongType(), False),
        StructField("merge_left", StringType(), False),
        StructField("merge_right", StringType(), False),
        StructField("pair_count", LongType(), False),
    ]
)


def wrapped_symbols(word: Column) -> Column:
    """Initial wrapped-string encoding: characters + ``</w>`` end mark.

    The separator char itself (U+001F) is stripped from the word first
    — ``\\s`` tokenization can let it through in crawl text, and an
    embedded separator would corrupt the wrapped encoding.  The DuckDB
    oracles apply the same ``replace(word, chr(31), '')``."""
    cleaned = F.replace(word, F.lit(SEP), F.lit(""))
    chars = F.regexp_extract_all(cleaned, F.lit("."), 0)
    syms = F.concat(chars, F.array(F.lit("</w>")))
    return F.concat(
        F.lit(SEP), F.array_join(syms, SEP + SEP), F.lit(SEP)
    )


def learn_bpe_merges(
    words: DataFrame,
    rounds: int = 6,
    word_col: str = "word",
    freq_col: str = "freq",
) -> DataFrame:
    """Learn ``rounds`` BPE merges from a word-frequency table.

    Returns (merge_round, merge_left, merge_right, pair_count) — one row
    per learned merge, ties broken (count desc, left asc, right asc) for
    bit-reproducibility.  Only the per-round argmax row is collected;
    the vocabulary itself never leaves the cluster.
    """
    return learn_bpe(words, rounds, word_col, freq_col)[0]


def learn_bpe(
    words: DataFrame,
    rounds: int = 6,
    word_col: str = "word",
    freq_col: str = "freq",
) -> tuple[DataFrame, DataFrame]:
    """Full BPE training state: (merge table, final encoded vocabulary).

    The second element is the word-frequency table with its wrapped
    symbol string after all merges — ``(freq, s)`` — i.e. the trained
    tokenizer applied to every vocabulary word.  Encoding a corpus is
    then a vocab-sized join (or, for out-of-vocabulary words at serving
    time, re-applying the merge table's ``rounds`` replaces in order).
    """
    spark = words.sparkSession
    vocab = words.select(
        F.col(freq_col).cast("long").alias("freq"),
        wrapped_symbols(F.col(word_col)).alias("s"),
    )
    # The vocab is re-read every round; checkpoint ONCE up front so each
    # round's job starts from the materialized table, not the corpus
    # scan (BUILD_NOTES invariant #6).
    vocab = vocab.localCheckpoint(eager=True)

    out: list[tuple[int, str, str, int]] = []
    for rnd in range(1, rounds + 1):
        syms = F.split(
            F.expr("substring(s, 2, length(s) - 2)"), SEP + SEP
        )
        n = F.size(syms)
        idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
            F.array().cast("array<int>")
        )
        pairs = vocab.select(
            "freq",
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.element_at(syms, i).alias("l"),
                        F.element_at(syms, i + 1).alias("r"),
                    ),
                )
            ).alias("p"),
        ).select("freq", "p.l", "p.r")
        top = (
            pairs.groupBy("l", "r")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, count = top[0]["l"], top[0]["r"], int(top[0]["c"])
        out.append((rnd, left, right, count))
        pattern = SEP + left + SEP + SEP + right + SEP
        repl = SEP + left + right + SEP
        # no per-round checkpoint (r14): each round's vocab is a chain
        # of cheap literal string replaces over the ONE up-front
        # checkpoint, so round r recomputes r replaces of a vocab-sized
        # projection — O(rounds^2) string passes total, which is far
        # cheaper than a materialization job + plan compile per round
        # (the eager checkpoint chain dominated q142's local reading:
        # ~3s of build-time dispatch over ~0.3s of data work). Replaces
        # are deterministic literals, so lineage recompute cannot
        # diverge; plan depth grows linearly in rounds.
        vocab = vocab.select(
            "freq", F.replace("s", F.lit(pattern), F.lit(repl)).alias("s")
        )
    return spark.createDataFrame(out, MERGE_SCHEMA), vocab


def encoded_tokens(final_vocab: DataFrame) -> DataFrame:
    """Explode a trained vocabulary's wrapped symbol strings into
    (token, n_occurrences): the corpus token-frequency table under the
    learned tokenizer.  One explode + one groupBy — vocabulary-sized."""
    syms = F.split(F.expr("substring(s, 2, length(s) - 2)"), SEP + SEP)
    return (
        final_vocab.select("freq", F.explode(syms).alias("token"))
        .groupBy("token")
        .agg(F.sum("freq").cast("long").alias("n_occurrences"))
    )
