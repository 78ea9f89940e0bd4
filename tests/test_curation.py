"""Micro-fixture tests for the curation operators (decontamination,
repetition scoring, mixture upsampling); q87-q89 cover fixture scale."""

from __future__ import annotations

from postgresimporter_spark.operators import curation as C


def test_contamination_counts_shared_ngrams(spark):
    ev = spark.createDataFrame([(0, "a b c d e")], ["doc_id", "text"])
    tr = spark.createDataFrame(
        [
            (10, "a b c d zz"),     # shares 'a b c d'
            (11, "b c d e f g"),    # shares 'b c d e'
            (12, "zz yy xx ww vv"),  # clean
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.n_shared_ngrams
        for r in C.ngram_contamination(tr, ev, n=4).collect()
    }
    assert got == {10: 1, 11: 1}  # clean doc absent, not zero


def test_repetition_ratio_extremes(spark):
    df = spark.createDataFrame(
        [(1, "x x x x"), (2, "a b c d")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in C.repetition_ratio(df, ns=(2,)).collect()}
    assert rows[1].n_2grams == 3 and rows[1].n_distinct_2grams == 1
    assert abs(rows[1].dup2_ratio - (1 - 1 / 3)) < 1e-6
    assert rows[2].dup2_ratio == 0.0


def test_mixture_upsample_epochs_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "s0", "t") for i in range(100)]
        + [(i + 100, "s1", "t") for i in range(100)]
        + [(900, "dropped_source", "t")],
        ["doc_id", "source", "text"],
    )
    out = C.mixture_upsample(df, {"s0": 200, "s1": 50}).cache()
    per_source = {
        r.source: r.n
        for r in out.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    # s0: exactly 2 copies of all 100 docs; s1: ~50% of 100 docs, one copy
    assert per_source["s0"] == 200
    assert 20 <= per_source["s1"] <= 80
    assert "dropped_source" not in per_source  # not in the mix -> dropped
    # epochs are 1..n_full per doc for integral weights
    epochs = sorted(
        r.epoch for r in out.where("source = 's0' AND doc_id = 0").collect()
    )
    assert epochs == [1, 2]
    # deterministic: second run picks the identical fractional sample
    again = C.mixture_upsample(df, {"s0": 200, "s1": 50})
    a = sorted((r.doc_id, r.epoch) for r in out.collect())
    b = sorted((r.doc_id, r.epoch) for r in again.collect())
    assert a == b
    out.unpersist()


def test_mixture_upsample_zero_weight_drops(spark):
    df = spark.createDataFrame([(1, "s0", "t")], ["doc_id", "source", "text"])
    assert C.mixture_upsample(df, {"s0": 0}).count() == 0


def test_pack_sequences_straddle_semantics(spark):
    # budget 10; docs of 4,4,4 tokens: cum starts 0,4,8 -> seqs 0,0,0? no:
    # starts are 0,4,8 -> floor(0/10)=0, floor(4/10)=0, floor(8/10)=0;
    # fourth doc starts at 12 -> seq 1
    rows = [(i, "s", " ".join(["w"] * 4)) for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = {r.doc_id: (r.seq_idx, r.seq_offset) for r in
           C.pack_sequences(df, budget_tokens=10).collect()}
    assert got == {0: (0, 0), 1: (0, 4), 2: (0, 8), 3: (1, 2)}


def test_pack_sequences_shards_independent(spark):
    rows = [(1, "a", "w w w"), (2, "b", "w w w")]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = {r.doc_id: r.seq_idx for r in
           C.pack_sequences(df, budget_tokens=2).collect()}
    assert got == {1: 0, 2: 0}  # each shard starts its own stream


def test_chunk_documents_windows_and_tail(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(5)))], ["doc_id", "text"]
    )
    got = sorted(
        (r.chunk_idx, r.chunk_text, r.n_chunk_tokens)
        for r in C.chunk_documents(df, chunk_tokens=3, stride=2).collect()
    )
    assert got == [
        (0, "t0 t1 t2", 3),
        (1, "t2 t3 t4", 3),
        (2, "t4", 1),  # tail chunk truncates, never pads
    ]


def test_redact_text_sequential_masking(spark):
    df = spark.createDataFrame(
        [(1, "mail bob@x.com from 10.1.2.3 code 42"), (2, "clean text")],
        ["id", "note"],
    )
    rows = {r.id: r for r in C.redact_text(df, "note").collect()}
    assert rows[1].redacted == "mail <EMAIL> from <IP> code <NUM>"
    assert (rows[1].n_email, rows[1].n_ipv4, rows[1].n_number) == (1, 1, 1)
    assert rows[2].redacted == "clean text"
    assert (rows[2].n_email, rows[2].n_ipv4, rows[2].n_number) == (0, 0, 0)


def test_redact_counts_after_earlier_passes(spark):
    # the email's digits are masked before the number pass runs, so
    # n_number counts only the standalone run
    df = spark.createDataFrame([(1, "a1@b.co 7")], ["id", "note"])
    r = C.redact_text(df, "note").collect()[0]
    assert r.n_email == 1 and r.n_number == 1
    assert r.redacted == "<EMAIL> <NUM>"


def test_dup_ngram_fraction_cross_document(spark):
    shared = "p q r s t"          # one shared 5-gram between docs 1 and 2
    df = spark.createDataFrame(
        [
            (1, shared + " u v"),  # 3 shingles, 1 duplicated
            (2, shared),           # 1 shingle, duplicated
            (3, "a b c d e f"),    # 2 shingles, unique
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.n_shingles, r.n_dup_shingles, r.dup_frac)
        for r in C.dup_ngram_fraction(df, n=5).collect()
    }
    assert got[1] == (3, 1, round(1 / 3, 6))
    assert got[2] == (1, 1, 1.0)
    assert got[3] == (2, 0, 0.0)


def test_quality_gates_flags_and_conjunction(spark):
    from postgresimporter_spark.operators.textstats import quality_features

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog sat on to the mat"),  # passes all
            (2, "x y"),                                    # too few tokens
            (3, ""),                                       # degenerate
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in C.quality_gates(quality_features(df)).collect()}
    assert got[1].passes
    assert not got[2].gate_n_tokens and not got[2].passes
    assert not got[3].passes


def test_redact_text_stays_in_codegen(spark):
    # scan-shaped: no shuffle exchange, no Python eval in the plan
    df = spark.createDataFrame([(1, "a 1")], ["id", "note"])
    plan = C.redact_text(df, "note")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_quantile_normalize_hand_mapping(spark):
    """Pooled sorted scores [5,10,20,30,100,200]: group a's ranks map
    to pooled ranks 1/3/6, the 2-element group to the extremes, and a
    singleton group to the pooled median."""
    from postgresimporter_spark.operators.curation import (
        quantile_normalize,
    )

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 30),
         (4, "b", 100), (5, "b", 200), (6, "c", 5)],
        "doc_id long, source string, n_chars long",
    )
    got = {
        r.doc_id: r.norm_score
        for r in quantile_normalize(
            df, "source", "n_chars", "doc_id"
        ).collect()
    }
    assert got == {1: 5, 2: 20, 3: 200, 4: 5, 5: 200, 6: 20}


def test_quantile_normalize_rejects_fractional_scores(spark):
    """The integer-arithmetic contract is enforced (ADVICE r8): a double
    score column raises instead of silently truncating via cast('long')
    (0.4 and 0.6 would both rank as 0, merging distinct values); an
    explicit caller-side quantization restores the path."""
    import pytest

    from postgresimporter_spark.operators.curation import (
        quantile_normalize,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a", 0.4), (2, "a", 0.6), (3, "b", 0.5)],
        "doc_id long, source string, score double",
    )
    with pytest.raises(TypeError, match="integral type"):
        quantile_normalize(df, "source", "score", "doc_id")

    quantized = df.withColumn(
        "score_q", F.round(F.col("score") * 1000).cast("long")
    )
    rows = quantile_normalize(
        quantized, "source", "score_q", "doc_id"
    ).collect()
    assert len(rows) == 3  # distinct values survive quantization
    assert len({r.norm_score for r in rows if r[1] == "a"}) == 2


def test_quantile_normalize_range_ranked_equals_plain(spark):
    """range_ranked=True (the r10 hot-group path: within-group rank
    recovered from the global (group, score, id) ranking) must equal
    the plain per-group window row for row — including a dominant
    group, tied scores resolved by id, and single-row groups (pooled
    median rule). Rank-stage A/B on an 8M-row hot group measured
    22-27s plain vs 6.6-8.5s ranged, identical ranks."""
    import random

    from postgresimporter_spark.operators.curation import (
        quantile_normalize,
    )

    rnd = random.Random(5)
    rows = [(i, "web", rnd.randint(0, 40)) for i in range(900)]
    rows += [(1000 + i, f"s{i % 7}", rnd.randint(0, 40)) for i in range(140)]
    rows.append((5000, "lonely", 13))  # single-row group
    df = spark.createDataFrame(rows, "doc_id long, src string, score long")
    plain = {
        r.doc_id: (r.score, r.norm_score)
        for r in quantile_normalize(df, "src", "score", "doc_id").collect()
    }
    ranged = {
        r.doc_id: (r.score, r.norm_score)
        for r in quantile_normalize(
            df, "src", "score", "doc_id", range_ranked=True
        ).collect()
    }
    assert ranged == plain
    assert len(plain) == len(rows)


def test_quantile_normalize_range_ranked_keeps_null_group(spark):
    """A null group is a real window partition in the plain path; the
    range_ranked group-info join is null-safe so those rows normalize
    identically instead of silently dropping (r10 review fix)."""
    from postgresimporter_spark.operators.curation import (
        quantile_normalize,
    )

    rows = [(i, "web", i % 17) for i in range(60)]
    rows += [(100 + i, None, (i * 3) % 17) for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, src string, score long")
    plain = {
        r.doc_id: (r.src, r.norm_score)
        for r in quantile_normalize(df, "src", "score", "doc_id").collect()
    }
    ranged = {
        r.doc_id: (r.src, r.norm_score)
        for r in quantile_normalize(
            df, "src", "score", "doc_id", range_ranked=True
        ).collect()
    }
    assert ranged == plain
    assert sum(1 for s, _ in plain.values() if s is None) == 9
