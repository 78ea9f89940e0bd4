"""Structured Streaming: incremental ingest + watermarked windows
verified against their batch counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from postgresimporter_spark.sources.parquet import load_tables
from postgresimporter_spark.streaming.pipeline import (
    run_to_memory,
    stream_csv_ingest,
    stream_hourly_rollup,
    stream_sessionize,
)

SF = "/root/testdata/sf0.001"


def test_stream_csv_ingest(spark, tmp_path):
    (tmp_path / "animals_1.csv").write_text("name,height\nGrizzly,220\n")
    (tmp_path / "animals_2.csv").write_text("name,height\nGiraffe,600\n")
    schema = StructType(
        [StructField("name", StringType()), StructField("height", StringType())]
    )
    stream = stream_csv_ingest(spark, str(tmp_path), schema)
    assert stream.isStreaming
    run_to_memory(stream, "ingested", output_mode="append")
    rows = {tuple(r) for r in spark.table("ingested").collect()}
    assert rows == {("Grizzly", "220"), ("Giraffe", "600")}


def test_stream_header_drift_errors_like_batch(spark, tmp_path):
    """r12 (VERDICT r11 #4): a drifted-header file fails LOUDLY in both
    ingest modes — the batch combine's driver-side LIKE-first check
    raises, and the streaming source's scan-time header validation
    (enforceSchema=false) fails the micro-batch — never a silent
    positional merge (reference LIKE-first strictness, main.py:229,247).
    """
    import pytest

    from postgresimporter_spark.sources.csv import read_csv_group

    good = tmp_path / "animals_1.csv"
    drifted = tmp_path / "animals_2.csv"
    good.write_text("name,height\nGrizzly,220\n")
    drifted.write_text("height,name\n600,Giraffe\n")  # permuted

    # batch: loud ValueError from the pre-scan header check
    with pytest.raises(ValueError, match="schema mismatch"):
        read_csv_group(spark, [good, drifted])

    # streaming: the scan-time header check fails the micro-batch
    schema = StructType(
        [StructField("name", StringType()), StructField("height", StringType())]
    )
    stream = stream_csv_ingest(spark, str(tmp_path), schema)
    with pytest.raises(Exception, match="(?i)header|conform"):
        run_to_memory(stream, "drift_ingested", output_mode="append")

    # verify_headers=False restores the documented positional-merge
    # escape hatch for frozen rename contracts
    stream2 = stream_csv_ingest(
        spark, str(tmp_path), schema, verify_headers=False
    )
    run_to_memory(stream2, "drift_positional", output_mode="append")
    assert spark.table("drift_positional").count() == 2


def test_stream_schema_seed_likefirst_loudness(spark, tmp_path):
    """r13 (VERDICT r12 #3, streaming side): the stream's schema can be
    seeded from a LIKE-first file's header, and an UNREADABLE seed
    header raises loudly — the schema is the stream's only drift guard
    for its lifetime, so guessing one would let every later file merge
    positionally unverified."""
    import pytest

    from postgresimporter_spark.streaming import stream_schema_for

    src = tmp_path / "src"
    src.mkdir()
    (src / "f_1.csv").write_text("k,v\n1,2\n2,3\n")

    schema = stream_schema_for(spark, str(src / "f_1.csv"))
    assert [f.name for f in schema.fields] == ["k", "v"]
    assert all(f.dataType.typeName() == "string" for f in schema.fields)

    # seeded end-to-end ingest: schema omitted, derived from the seed
    stream = stream_csv_ingest(
        spark, str(src), seed_file=str(src / "f_1.csv")
    )
    run_to_memory(stream, "seeded_ingest", output_mode="append")
    assert spark.table("seeded_ingest").count() == 2

    # unreadable seed: loud, never a guessed schema
    with pytest.raises(ValueError, match="seed header unreadable"):
        stream_schema_for(spark, str(tmp_path / "nope.csv"))
    # neither schema nor seed: loud
    with pytest.raises(ValueError, match="schema or a seed_file"):
        stream_csv_ingest(spark, str(src))


def _streaming_events(spark):
    # re-read the batch events fixture through a streaming parquet source
    df = load_tables(spark, SF, ["events"])["events"]
    path = "/tmp/stream_events_parquet"
    df.write.mode("overwrite").parquet(path)
    return spark.readStream.schema(df.schema).parquet(path)


def test_stream_hourly_matches_batch(spark):
    from postgresimporter_spark.operators.sessionize import hourly_rollup

    events = load_tables(spark, SF, ["events"])["events"]
    batch = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in hourly_rollup(events).collect()
    }

    stream = stream_hourly_rollup(_streaming_events(spark))
    run_to_memory(stream, "hourly_stream", output_mode="complete")
    got = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("hourly_stream").collect()
    }
    assert got == batch


def test_stream_sessionize_matches_batch(spark):
    from postgresimporter_spark.operators.sessionize import session_stats

    events = load_tables(spark, SF, ["events"])["events"]
    batch = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in session_stats(events, gap_minutes=30).collect()
    }

    stream = stream_sessionize(_streaming_events(spark), gap_minutes=30)
    run_to_memory(stream, "session_stream", output_mode="complete")
    rows = spark.table("session_stream").collect()
    got = {(r.user_id, r.session_start): (r.n_events,) for r in rows}
    # session_window end = last_event + gap (exclusive bound) vs batch
    # max(ts); compare session identity (user, start) and event counts
    assert {(u, s) for u, s in got} == {(u, s) for u, s in batch}
    for key, (n_events,) in got.items():
        assert batch[key][1] == n_events


def test_stateful_running_user_stats(spark):
    """applyInPandasWithState custom operator: running per-user stats
    across micro-batches match a batch groupBy."""
    from pyspark.sql import functions as F

    from postgresimporter_spark.streaming.stateful import running_user_stats

    events = load_tables(spark, SF, ["events"])["events"]
    batch = {
        r.user_id: (r.n, round(r.tv, 6))
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.round(F.col("value") * 1_000_000).cast("long"))
                / 1_000_000
            ).alias("tv"),
        )
        .collect()
    }

    stream = running_user_stats(_streaming_events(spark))
    q = (
        stream.writeStream.format("memory")
        .queryName("user_stats_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode: keep the last emitted row per user
    rows = spark.table("user_stats_stream").collect()
    got = {}
    for r in rows:
        prev = got.get(r.user_id)
        if prev is None or r.n_events >= prev[0]:
            got[r.user_id] = (r.n_events, round(r.total_value, 6))
    assert got == batch


def test_foreachbatch_sink_and_checkpoint_resume(spark, tmp_path):
    """foreachBatch parquet sink with checkpoint: a second run over the
    same source processes nothing new (exactly-once file tracking)."""
    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    (src / "a_1.csv").write_text("k,v\n1,x\n2,y\n")

    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [StructField("k", StringType()), StructField("v", StringType())]
    )

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("header", "true")
            .csv(str(src))
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, epoch: df.write.mode("append").parquet(str(out))
            )
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert spark.read.parquet(str(out)).count() == 2
    # restart with no new files: nothing re-processed
    run_once()
    assert spark.read.parquet(str(out)).count() == 2
    # add a file, restart: only the new rows appended
    (src / "a_2.csv").write_text("k,v\n3,z\n")
    run_once()
    assert spark.read.parquet(str(out)).count() == 3


def test_stateful_stats_with_rocksdb_state_store(spark):
    """Same stream==batch contract as test_stateful_running_user_stats,
    but with the RocksDB state store provider (the production posture
    for large state) — results must be identical to the default
    HDFS-backed provider."""
    from pyspark.sql import functions as F

    from postgresimporter_spark.streaming.pipeline import (
        ROCKSDB_PROVIDER,
        enable_rocksdb_state_store,
        reset_state_store_provider,
    )
    from postgresimporter_spark.streaming.stateful import running_user_stats

    events = load_tables(spark, SF, ["events"])["events"]
    batch = {
        r.user_id: (r.n, round(r.tv, 6))
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.round(F.col("value") * 1_000_000).cast("long"))
                / 1_000_000
            ).alias("tv"),
        )
        .collect()
    }

    enable_rocksdb_state_store(spark)
    try:
        assert (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass")
            == ROCKSDB_PROVIDER
        )
        stream = running_user_stats(_streaming_events(spark))
        q = (
            stream.writeStream.format("memory")
            .queryName("user_stats_rocksdb")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        reset_state_store_provider(spark)
    got = {}
    for r in spark.table("user_stats_rocksdb").collect():
        prev = got.get(r.user_id)
        if prev is None or r.n_events >= prev[0]:
            got[r.user_id] = (r.n_events, round(r.total_value, 6))
    assert got == batch


def test_stream_ingest_max_bytes_per_trigger(spark, tmp_path):
    """maxBytesPerTrigger splits a multi-file backlog into multiple
    micro-batches instead of one giant batch."""
    from pyspark.sql.types import StringType, StructField, StructType

    from postgresimporter_spark.streaming.pipeline import stream_csv_ingest

    src = tmp_path / "src"
    src.mkdir()
    for i in range(4):
        (src / f"f_{i}.csv").write_text(
            "k,v\n" + "".join(f"{j},{'x' * 50}\n" for j in range(100))
        )
    schema = StructType(
        [StructField("k", StringType()), StructField("v", StringType())]
    )
    stream = stream_csv_ingest(
        spark, str(src), schema, max_bytes_per_trigger="1000"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_limited")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table("rate_limited").count() == 400
    # >1 micro-batch ran (each ~one file under the 1k byte cap)
    assert len(q.recentProgress) >= 2


def test_stream_dedup_matches_batch(spark, tmp_path):
    """stream_dedup (all-history mode) keeps exactly one row per
    distinct text — same survivor count as the batch exact_dedup."""
    from postgresimporter_spark.streaming.pipeline import stream_dedup

    docs = load_tables(spark, SF, ["documents"])["documents"].select(
        "doc_id", "text", F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts")
    )
    duped = docs.unionByName(
        docs.where(F.col("doc_id") < 50).withColumn(
            "doc_id", F.col("doc_id") + 10000
        )
    )
    path = str(tmp_path / "docs_parquet")
    duped.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(duped.schema).parquet(path)

    out = stream_dedup(stream, within_watermark=False)
    run_to_memory(out, "dedup_stream", output_mode="append")
    got = spark.table("dedup_stream")
    n_batch_distinct = duped.select("text").distinct().count()
    assert got.count() == n_batch_distinct
    # one row per content hash, never two
    assert got.groupBy("content_hash").count().where("count > 1").count() == 0


def test_stream_dedup_within_watermark_drops_replay(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a replayed row inside the
    watermark horizon is dropped; survivors carry the first arrival."""
    import datetime as dt

    from postgresimporter_spark.streaming.pipeline import stream_dedup

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, "same text", t0),
        (2, "same text", t0 + dt.timedelta(minutes=5)),  # replay
        (3, "other", t0 + dt.timedelta(minutes=6)),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "ts"])
    path = str(tmp_path / "replay_parquet")
    df.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)

    out = stream_dedup(stream, watermark="1 hour", within_watermark=True)
    run_to_memory(out, "dedup_wm_stream", output_mode="append")
    got = {r.doc_id for r in spark.table("dedup_wm_stream").collect()}
    assert 3 in got and len(got) == 2 and (1 in got or 2 in got)


def test_stream_interval_join_matches_batch(spark):
    """Stream-stream interval join == the same join run in batch: click
    events paired with purchases of the same user within 1 hour."""
    from postgresimporter_spark.streaming.pipeline import stream_interval_join

    events = load_tables(spark, SF, ["events"])["events"]
    clicks = events.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    buys = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    batch = {
        (r.l_event_id, r.r_event_id)
        for r in clicks.alias("l")
        .join(
            buys.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") >= F.col("l.ts"))
            & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 1 hour")),
        )
        .select(
            F.col("l.event_id").alias("l_event_id"),
            F.col("r.event_id").alias("r_event_id"),
        )
        .collect()
    }
    assert batch  # fixture must actually exercise the join

    base = "/tmp/stream_ij_parquet"
    clicks.write.mode("overwrite").parquet(base + "/l")
    buys.write.mode("overwrite").parquet(base + "/r")
    ls = spark.readStream.schema(clicks.schema).parquet(base + "/l")
    rs = spark.readStream.schema(buys.schema).parquet(base + "/r")
    out = stream_interval_join(ls, rs, upper="1 hour")
    run_to_memory(out, "ij_stream", output_mode="append")
    got = {
        (r.l_event_id, r.r_event_id)
        for r in spark.table("ij_stream").collect()
    }
    assert got == batch


def test_stream_enrich_matches_batch(spark):
    """Stream-static broadcast enrichment == the same join in batch:
    events enriched with their user's nation via a dim lookup."""
    from postgresimporter_spark.streaming.pipeline import stream_enrich

    events = load_tables(spark, SF, ["events"])["events"].select(
        "event_id", "user_id"
    )
    dim = (
        events.select("user_id").distinct()
        .withColumn("segment", F.col("user_id") % 5)
    )
    batch = {
        (r.event_id, r.segment)
        for r in events.join(dim, "user_id").collect()
    }

    path = "/tmp/stream_enrich_parquet"
    events.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(events.schema).parquet(path)
    out = stream_enrich(stream, dim, on=["user_id"])
    run_to_memory(out, "enrich_stream", output_mode="append")
    got = {
        (r.event_id, r.segment)
        for r in spark.table("enrich_stream").collect()
    }
    assert got == batch


def test_stream_match_history_matches_batch(spark, tmp_path):
    """stream_match_history over two micro-batches finds exactly the
    pairs the batch-mode minhash_match_index finds on the full batch —
    the index is static, so per-batch matching is embarrassingly
    incremental and stream==batch holds exactly."""
    from postgresimporter_spark.operators.dedup import (
        minhash_band_index,
        minhash_match_index,
    )
    from postgresimporter_spark.streaming.pipeline import (
        stream_match_history,
    )

    docs = load_tables(spark, SF, ["documents"])["documents"].select(
        "doc_id", "text"
    )
    hist = docs.where(F.col("doc_id") < 400)
    index = minhash_band_index(hist).localCheckpoint()
    # new arrivals: near-dups of history (one appended token) + novel
    new = docs.where(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" streamed")).alias("text"),
    ).unionByName(
        docs.where(F.col("doc_id").between(400, 430)).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    path = str(tmp_path / "arrivals")
    # two files -> two micro-batches with maxFilesPerTrigger=1
    new.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        path + "/f0"
    )
    new.where(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        path + "/f1"
    )
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path + "/*")
    )

    got: list[tuple] = []
    epochs: list[int] = []

    def sink(matches, epoch_id):
        epochs.append(epoch_id)
        got.extend(
            (r.new_id, r.hist_id, r.est_jaccard) for r in matches.collect()
        )

    q = stream_match_history(
        stream, index, str(tmp_path / "ckpt"), sink
    )
    q.awaitTermination()

    expected = {
        (r.new_id, r.hist_id, r.est_jaccard)
        for r in minhash_match_index(index, new).collect()
    }
    assert len(epochs) >= 2  # actually incremental
    assert set(got) == expected
    assert len(got) == len(set(got))  # no pair reported twice


def test_stream_merge_topk_matches_batch(spark, tmp_path):
    """After draining all micro-batches, the streamed running top-k
    equals a from-scratch brute-force top-k over history + all
    arrivals — the merge identity, maintained incrementally."""
    from postgresimporter_spark.operators.similarity import (
        brute_force_topk,
    )
    from postgresimporter_spark.streaming.pipeline import (
        stream_merge_topk,
    )

    emb = load_tables(spark, SF, ["embeddings"])["embeddings"].select(
        "vec_id", "embedding"
    )
    hist = emb.where(F.col("vec_id") >= 100)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    arrivals = emb.where(F.col("vec_id") < 80).select(
        (F.col("vec_id") + 50000).alias("vec_id"), "embedding"
    )
    path = str(tmp_path / "vec_arrivals")
    arrivals.where(F.col("vec_id") % 2 == 0).coalesce(1).write.parquet(
        path + "/f0"
    )
    arrivals.where(F.col("vec_id") % 2 == 1).coalesce(1).write.parquet(
        path + "/f1"
    )
    stream = (
        spark.readStream.schema(arrivals.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path + "/*")
    )

    k = 10
    seen = {}

    def sink(topk, epoch_id):
        seen["final"] = topk

    q = stream_merge_topk(
        stream,
        queries,
        brute_force_topk(hist, queries, k=k),
        str(tmp_path / "ckpt_topk"),
        sink,
        k=k,
    )
    q.awaitTermination()

    got = sorted(map(tuple, seen["final"].collect()))
    want = sorted(
        map(
            tuple,
            brute_force_topk(
                hist.unionByName(arrivals), queries, k=k
            ).collect(),
        )
    )
    assert got == want


def test_stream_url_dedup_canonical_variants_collapse(spark, tmp_path):
    """Messy variants of the same page (case, www, default port,
    tracking params, fragment) are ONE canonical key in the stream;
    distinct pages survive. Stream survivors == batch canonical count."""
    import datetime as dt

    from postgresimporter_spark.functions.urls import with_canonical
    from postgresimporter_spark.streaming.pipeline import stream_url_dedup

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, "HTTP://WWW.Ex.com:80/a/?utm_source=x&b=1#f", t0),
        (2, "http://ex.com/a?b=1", t0 + dt.timedelta(minutes=1)),  # same
        (3, "http://ex.com/a?b=2", t0 + dt.timedelta(minutes=2)),  # new
        (4, "https://ex.com/a?b=1", t0 + dt.timedelta(minutes=3)),  # new scheme
        (5, "not a url", t0 + dt.timedelta(minutes=4)),  # malformed: filtered
    ]
    df = spark.createDataFrame(rows, ["id", "url", "ts"])
    path = str(tmp_path / "urls_parquet")
    df.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)

    out = stream_url_dedup(stream, watermark="1 hour")
    run_to_memory(out, "url_dedup_stream", output_mode="append")
    got = spark.table("url_dedup_stream")
    n_batch = (
        with_canonical(df, "url")
        .where(F.col("canonical_url").isNotNull())
        .select("canonical_url")
        .distinct()
        .count()
    )
    assert got.count() == n_batch == 3
    # the (1,2) pair collapsed to a single survivor; the malformed
    # record is filtered (NULL canonical keys must never dedup together)
    ids = {r.id for r in got.collect()}
    assert {3, 4} <= ids and len(ids & {1, 2}) == 1 and 5 not in ids


def test_stream_countmin_matches_batch(spark):
    """The CMS grid is additive across microbatches, so the streamed
    sketch must equal the batch sketch cell-for-cell; its state is
    bounded by construction (depth x width groups)."""
    from postgresimporter_spark.streaming.pipeline import stream_countmin

    docs = load_tables(spark, SF, ["documents"])["documents"]
    batch = {
        (r.r, r.bucket): r.cell_cnt
        for r in stream_countmin(docs.select("text")).collect()
    }

    path = "/tmp/stream_docs_parquet"
    docs.select("text").write.mode("overwrite").parquet(path)
    stream_src = spark.readStream.schema("text string").parquet(path)
    run_to_memory(
        stream_countmin(stream_src), "cms_stream", output_mode="complete"
    )
    got = {
        (r.r, r.bucket): r.cell_cnt
        for r in spark.table("cms_stream").collect()
    }
    assert got == batch and len(got) > 0


def test_stream_attribution_matches_batch(spark):
    """Streaming last-touch attribution == the batch as-of match
    restricted to attributed purchases (the streaming op emits only
    matches; q165's batch report covers the unattributed)."""
    from postgresimporter_spark.operators.temporal import asof_join
    from postgresimporter_spark.streaming.pipeline import (
        reduce_last_touch,
        stream_attribution,
    )

    ev = load_tables(spark, SF, ["events"])["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts"
    )
    m = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=[], strict=True,
    )
    lat = F.expr("(unix_micros(ts) - unix_micros(asof_ts)) div 1000000")
    batch = {
        (r["event_id"], r["asof_ts"])
        for r in m.where(
            F.col("asof_ts").isNotNull() & (lat <= 1800)
        ).collect()
    }

    base = "/tmp/stream_attr_parquet"
    purchases.write.mode("overwrite").parquet(base + "/p")
    clicks.write.mode("overwrite").parquet(base + "/c")
    ps = spark.readStream.schema(purchases.schema).parquet(base + "/p")
    cs = spark.readStream.schema(clicks.schema).parquet(base + "/c")
    out = stream_attribution(ps, cs)
    run_to_memory(out, "attr_stream", output_mode="append")
    # consumer-side reduction over the landed matches (foreachBatch
    # pattern): latest candidate click per purchase == the as-of match
    reduced = reduce_last_touch(spark.table("attr_stream"))
    got = {
        (r["event_id"], r["click_ts"]) for r in reduced.collect()
    }
    assert got == batch and len(got) > 0


def test_stream_hll_matches_batch(spark):
    """HLL registers are max-monotone, so the streamed register table
    must equal the batch one register-for-register; state is bounded
    by construction (|keys| x 64 groups)."""
    from postgresimporter_spark.streaming.pipeline import stream_hll

    ev = load_tables(spark, SF, ["events"])["events"]
    batch = {
        (r.event_type, r.reg): r.max_rho
        for r in stream_hll(ev, ["event_type"], "event_id").collect()
    }

    path = "/tmp/stream_hll_parquet"
    ev.select("event_type", "event_id").write.mode("overwrite").parquet(path)
    stream_src = spark.readStream.schema(
        "event_type string, event_id long"
    ).parquet(path)
    run_to_memory(
        stream_hll(stream_src, ["event_type"], "event_id"),
        "hll_stream",
        output_mode="complete",
    )
    got = {
        (r.event_type, r.reg): r.max_rho
        for r in spark.table("hll_stream").collect()
    }
    assert got == batch and len(got) > 0


def test_stream_bucket_fingerprints_matches_batch(spark):
    """COUNT is additive and XOR self-inverse, so the streamed bucket
    fingerprints must equal the batch summary bucket-for-bucket;
    state is bounded by construction (n_buckets groups)."""
    from postgresimporter_spark.operators.diffops import (
        bucket_fingerprints,
    )
    from postgresimporter_spark.streaming.pipeline import (
        stream_bucket_fingerprints,
    )

    o = load_tables(spark, SF, ["orders"])["orders"].select(
        "o_orderkey", "o_totalprice"
    )
    batch = {
        r.bucket: (r.n_rows, r.xor_fp)
        for r in bucket_fingerprints(
            o, "o_orderkey", ["o_totalprice"], n_buckets=16
        ).collect()
    }
    stream_view = {
        r.bucket: (r.n_rows, r.xor_fp)
        for r in stream_bucket_fingerprints(
            o, "o_orderkey", ["o_totalprice"], n_buckets=16
        ).collect()
    }
    assert stream_view == batch and len(batch) > 0

    path = "/tmp/stream_bfp_parquet"
    o.write.mode("overwrite").parquet(path)
    src = spark.readStream.schema(
        "o_orderkey long, o_totalprice double"
    ).parquet(path)
    run_to_memory(
        stream_bucket_fingerprints(
            src, "o_orderkey", ["o_totalprice"], n_buckets=16
        ),
        "bfp_stream",
        output_mode="complete",
    )
    got = {
        r.bucket: (r.n_rows, r.xor_fp)
        for r in spark.table("bfp_stream").collect()
    }
    assert got == batch


def test_stream_token_buckets_matches_batch_and_js_drift(spark):
    """The bucketed token histogram is additive, so stream == batch
    cell-for-cell; JS drift is exactly 0 against itself, positive
    against a different source mix, and matches an independent
    Python model (picounit accumulation)."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from postgresimporter_spark.streaming.pipeline import (
        js_drift_from_buckets,
        stream_token_buckets,
    )

    docs = load_tables(spark, SF, ["documents"])["documents"]
    a_srcs = [f"src{i}" for i in range(10)]
    cur_df = docs.where(F.col("source").isin(a_srcs))
    ref_df = docs.where(~F.col("source").isin(a_srcs))

    batch = {
        r.bucket: r.cnt
        for r in stream_token_buckets(cur_df.select("text")).collect()
    }
    # independent Python model of the bucketed histogram
    want: dict = {}
    for r in cur_df.select("text").collect():
        for t in r.text.strip().split():
            b = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % 1024
            want[b] = want.get(b, 0) + 1
    assert batch == want

    path = "/tmp/stream_drift_parquet"
    cur_df.select("text").write.mode("overwrite").parquet(path)
    stream_src = spark.readStream.schema("text string").parquet(path)
    run_to_memory(
        stream_token_buckets(stream_src), "drift_stream",
        output_mode="complete",
    )
    got = {r.bucket: r.cnt for r in spark.table("drift_stream").collect()}
    assert got == batch and len(got) > 0

    cur = stream_token_buckets(cur_df.select("text"))
    ref = stream_token_buckets(ref_df.select("text"))
    self_row = js_drift_from_buckets(cur, cur).collect()[0]
    assert self_row.js_nats == 0.0
    drift_row = js_drift_from_buckets(cur, ref).collect()[0]
    assert 0 < drift_row.js_nats <= math.log(2) + 1e-9

    # picounit model of the drift number itself
    ref_counts: dict = {}
    for r in ref_df.select("text").collect():
        for t in r.text.strip().split():
            b = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % 1024
            ref_counts[b] = ref_counts.get(b, 0) + 1
    NA, NB = sum(want.values()), sum(ref_counts.values())
    s = 0
    for b in set(want) | set(ref_counts):
        p, q = want.get(b, 0) / NA, ref_counts.get(b, 0) / NB
        m = (p + q) / 2
        c = 0.0
        if p > 0:
            c += p * math.log(p / m)
        if q > 0:
            c += q * math.log(q / m)
        s += int(round(c * 0.5 * 1e12))
    assert drift_row.js_nats == round(s / 1e12, 6) + 0.0
    assert (drift_row.tokens_cur, drift_row.tokens_ref) == (NA, NB)


def test_stream_hamming_match_matches_batch(spark, tmp_path):
    """stream_hamming_match over two micro-batches finds exactly the
    pairs the batch-mode mih_match_index finds on the full batch — the
    MIH index is static, so per-batch probing is embarrassingly
    incremental and stream==batch holds exactly."""
    from postgresimporter_spark.operators.dedup import (
        mih_block_index,
        mih_match_index,
        simhash,
    )
    from postgresimporter_spark.streaming.pipeline import (
        stream_hamming_match,
    )

    docs = load_tables(spark, SF, ["documents"])["documents"].select(
        "doc_id", "text"
    )
    hist_fps = simhash(docs.where(F.col("doc_id") < 400), bits=32)
    index = mih_block_index(hist_fps, bits=32, blocks=2).localCheckpoint()
    new = docs.where(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" streamed")).alias("text"),
    ).unionByName(
        docs.where(F.col("doc_id").between(400, 430)).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    new_fps = simhash(new, bits=32).localCheckpoint()
    path = str(tmp_path / "fp_arrivals")
    new_fps.where(F.col("id") % 2 == 0).coalesce(1).write.parquet(
        path + "/f0"
    )
    new_fps.where(F.col("id") % 2 == 1).coalesce(1).write.parquet(
        path + "/f1"
    )
    stream = (
        spark.readStream.schema(new_fps.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path + "/*")
    )

    got: list[tuple] = []
    epochs: list[int] = []

    def sink(matches, epoch_id):
        epochs.append(epoch_id)
        got.extend(
            (r.new_id, r.hist_id, r.hamming) for r in matches.collect()
        )

    q = stream_hamming_match(
        stream, index, str(tmp_path / "hckpt"), sink,
        bits=32, blocks=2, max_hamming=3,
    )
    q.awaitTermination()

    expected = {
        (r.new_id, r.hist_id, r.hamming)
        for r in mih_match_index(
            index, new_fps, bits=32, blocks=2, max_hamming=3
        ).collect()
    }
    assert len(epochs) >= 2
    assert set(got) == expected and expected
    assert len(got) == len(set(got))
