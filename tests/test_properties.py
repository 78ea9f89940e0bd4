"""Property-based tests (hypothesis) for the naming and function
libraries — the reference pins these with a handful of goldens; we
additionally pin them against independent Python models over generated
corpora (one Spark job per example batch)."""

from __future__ import annotations

import datetime as dt
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from postgresimporter_spark.functions.text import STRIP_PATTERN, strip_col
from postgresimporter_spark.functions.timestamps import (
    parse_date_col,
    parse_timestamp_col,
)
from postgresimporter_spark.naming import table_name_for_path, to_filename

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

name_text = st.text(
    alphabet="abcXYZ012 .-_äöüß!#/", min_size=0, max_size=30
)
dirty_text = st.text(
    alphabet='abc XYZ\n\r"\'0,;ü', min_size=0, max_size=40
)


@SETTINGS
@given(st.lists(name_text, min_size=1, max_size=30))
def test_to_filename_idempotent_and_safe(titles):
    for t in titles:
        out = to_filename(t)
        assert re.fullmatch(r"[\w]*", out), out
        assert to_filename(out) == out  # idempotent


@SETTINGS
@given(st.lists(name_text, min_size=1, max_size=30))
def test_table_name_has_no_separator(titles):
    for t in titles:
        assert "_" not in table_name_for_path(f"{t}.csv")


def _python_strip(s):
    """Independent model of the reference strip() (functions.sql:1-5)."""
    if s is None:
        return None
    out = re.sub(STRIP_PATTERN, "", s)
    return out or None


@SETTINGS
@given(st.lists(dirty_text | st.none(), min_size=1, max_size=50))
def test_strip_matches_python_model(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    got = [r[0] for r in df.select(strip_col(F.col("raw"))).collect()]
    assert got == [_python_strip(v) for v in values]


@SETTINGS
@given(
    st.lists(
        st.dates(dt.date(1970, 1, 1), dt.date(2069, 12, 31)),
        min_size=1,
        max_size=50,
    )
)
def test_parse_date_roundtrip(spark, dates):
    raws = [d.strftime("%d-%b-%y").upper() for d in dates]
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    got = [r[0] for r in df.select(parse_date_col(F.col("raw"))).collect()]
    assert got == list(dates)


ts_strategy = st.datetimes(
    dt.datetime(1970, 1, 2), dt.datetime(2069, 12, 30)
).map(lambda d: d.replace(microsecond=0))
offset_strategy = st.integers(-14 * 60, 14 * 60)


@SETTINGS
@given(
    st.lists(
        st.tuples(ts_strategy, offset_strategy), min_size=1, max_size=40
    )
)
def test_parse_timestamp_offset_roundtrip(spark, pairs):
    """wall-clock + arbitrary offset -> parse -> UTC instant matches
    Python's own arithmetic."""
    raws, expected = [], []
    for wall, off_min in pairs:
        sign = "+" if off_min >= 0 else "-"
        hh, mm = divmod(abs(off_min), 60)
        raw = (
            wall.strftime("%d-%b-%y %I.%M.%S").upper()
            + wall.strftime(" %p")
            + f" {sign}{hh:02d}:{mm:02d}"
        )
        raws.append(raw)
        expected.append(wall - dt.timedelta(minutes=off_min))
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    got = [
        r[0] for r in df.select(parse_timestamp_col(F.col("raw"))).collect()
    ]
    assert got == expected


@SETTINGS
@given(st.lists(ts_strategy, min_size=1, max_size=40))
def test_parse_timestamp_compact_roundtrip(spark, stamps):
    raws = [t.strftime("%Y%m%d%H%M%S") + "+0000" for t in stamps]
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    got = [
        r[0] for r in df.select(parse_timestamp_col(F.col("raw"))).collect()
    ]
    assert got == stamps


# temporal operators vs independent Python models ---------------------------

event_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # key
        st.integers(min_value=0, max_value=50),  # minute offset
        st.integers(min_value=0, max_value=99),  # value
    ),
    min_size=0,
    max_size=12,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=event_rows, right=event_rows)
def test_asof_join_matches_python_model(spark, left, right):
    from postgresimporter_spark.operators.temporal import asof_join

    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, f"k{k}", base + dt.timedelta(minutes=m), float(v))
        for i, (k, m, v) in enumerate(left)
    ]
    # unique (key, ts) on the right: the operator documents ties as
    # caller-resolved, so the model assumes none
    seen, rrows = set(), []
    for k, m, v in right:
        if (k, m) not in seen:
            seen.add((k, m))
            rrows.append((f"k{k}", base + dt.timedelta(minutes=m), float(v)))
    ldf = spark.createDataFrame(lrows, ["id", "k", "ts", "v"]) if lrows else None
    if ldf is None:
        return
    rdf = spark.createDataFrame(rrows, ["k", "ts", "v"]) if rrows else (
        spark.createDataFrame([], "k string, ts timestamp, v double")
    )
    got = {
        r.id: (r.asof_v, r.asof_ts)
        for r in asof_join(
            ldf, rdf, on="k", left_ts="ts", right_ts="ts", value_cols=["v"]
        ).collect()
    }
    for i, k, ts, _ in lrows:
        prior = [(rts, rv) for rk, rts, rv in rrows if rk == k and rts < ts]
        want = max(prior) if prior else None
        assert got[i] == ((want[1], want[0]) if want else (None, None)), (
            i, got[i], want)


interval_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),  # start minute
        st.integers(min_value=1, max_value=30),  # duration minutes
    ),
    min_size=0,
    max_size=8,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    points=st.lists(st.integers(min_value=0, max_value=90), max_size=15),
    intervals=interval_rows,
    gran=st.sampled_from([60, 300, 600]),
)
def test_interval_join_matches_python_model(spark, points, intervals, gran):
    from postgresimporter_spark.operators.temporal import interval_join

    base = dt.datetime(2024, 1, 1)
    prows = [(i, base + dt.timedelta(minutes=m)) for i, m in enumerate(points)]
    irows = [
        (j, base + dt.timedelta(minutes=s), base + dt.timedelta(minutes=s + d))
        for j, (s, d) in enumerate(intervals)
    ]
    if not prows or not irows:
        return
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(
            spark.createDataFrame(prows, ["pid", "ts"]),
            spark.createDataFrame(irows, ["iid", "start_ts", "end_ts"]),
            "ts", "start_ts", "end_ts", granularity_s=gran,
        ).collect()
    )
    want = sorted(
        (pid, iid)
        for pid, ts in prows
        for iid, s, e in irows
        if s <= ts < e
    )
    assert got == want


# --- corpus-lifecycle operator properties (r3) ------------------------------

word = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
doc_text = st.lists(word, min_size=0, max_size=12).map(" ".join)


@SETTINGS
@given(st.lists(doc_text, min_size=1, max_size=10), st.integers(2, 4))
def test_remove_duplicate_spans_invariants(spark, texts, span):
    """Model-free invariants: kept text is a subsequence of the
    original tokens, counts reconcile, and raising min_docs above the
    corpus size removes nothing."""
    from postgresimporter_spark.operators.curation import (
        remove_duplicate_spans,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    out = {
        r.doc_id: r
        for r in remove_duplicate_spans(df, span=span, min_docs=2).collect()
    }
    for i, t in enumerate(texts):
        r = out[i]
        if not t.strip():
            # tokenization of blank text is [''], which rejoins to '' —
            # nothing removable, nothing removed
            assert r.n_removed == 0
            continue
        assert r.n_tokens == len(t.split(" "))
        kept = r.clean_text.split(" ") if r.clean_text else []
        # kept tokens are a subsequence of the originals
        it = iter(t.split(" "))
        assert all(any(k == x for x in it) for k in kept)
        assert r.n_removed == r.n_tokens - len(kept)
        assert 0 <= r.n_removed <= r.n_tokens
    # min_docs beyond corpus size: identity transform
    untouched = {
        r.doc_id: r
        for r in remove_duplicate_spans(
            df, span=span, min_docs=len(texts) + 1
        ).collect()
    }
    for i, t in enumerate(texts):
        assert untouched[i].n_removed == 0


@SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 99), st.sampled_from(["s0", "s1", "s2"])),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 5),
)
def test_source_quota_properties(spark, rows, k):
    from postgresimporter_spark.operators.curation import source_quota

    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = source_quota(df, max_per_group=k)
    got = out.collect()
    per: dict[str, int] = {}
    for r in got:
        per[r.source] = per.get(r.source, 0) + 1
    counts = {s: sum(1 for d, src in rows if src == s) for s in per}
    for s, n in per.items():
        assert n == min(k, counts[s])
    # deterministic: identical kept set on re-run
    again = sorted(r.doc_id for r in source_quota(df, k).collect())
    assert again == sorted(r.doc_id for r in got)


# --- URL canonicalization (batch 22) ---------------------------------------

url_scheme = st.sampled_from(["http", "HTTP", "https", "HTTPS"])
url_host = st.builds(
    lambda www, labels, suf: (www + ".".join(labels) + suf),
    st.sampled_from(["", "www.", "WWW."]),
    st.lists(
        st.text(alphabet="abXZ09", min_size=1, max_size=5),
        min_size=1,
        max_size=3,
    ),
    st.sampled_from([".com", ".co.uk", ".io", ".Co.JP"]),
)
url_port = st.sampled_from(["", ":80", ":443", ":8080"])
url_path = st.sampled_from(
    ["", "/", "/a", "/a/", "/A/b9", "/a/b/", "/a//", "//", "/a/b//"]
)
url_query = st.sampled_from(
    ["", "?a=1", "?utm_source=x", "?b=2&a=1&utm_medium=m", "?z=9&fbclid=f"]
)
url_frag = st.sampled_from(["", "#x", "#frag-2", "#f?z=1", "#a&b=2"])


@SETTINGS
@given(
    st.lists(
        st.builds(
            lambda s, h, po, pa, q, f: f"{s}://{h}{po}{pa}{q}{f}",
            url_scheme, url_host, url_port, url_path, url_query, url_frag,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_url_canonicalization_idempotent(spark, urls):
    """canonical(canonical(u)) == canonical(u): the canonical form is a
    fixed point, so re-ingesting already-canonical URLs never reshuffles
    dedup keys."""
    from postgresimporter_spark.functions.urls import with_canonical

    df = spark.createDataFrame([(u,) for u in urls], "raw_url string")
    once = with_canonical(df, "raw_url").select(
        F.col("canonical_url").alias("c1")
    )
    twice = with_canonical(once, "c1").select(
        "c1", F.col("canonical_url").alias("c2")
    )
    for r in twice.collect():
        assert r.c1 == r.c2
        # canonical invariants
        assert r.c1 == r.c1.split("://")[0].lower() + "://" + r.c1.split("://", 1)[1]
        host = r.c1.split("://")[1].split("/")[0]
        assert not host.startswith("www.")
        assert "#" not in r.c1
        assert "utm_" not in r.c1 and "fbclid" not in r.c1


# --- compaction planning (driver-side, no Spark needed) --------------------


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abc09/", min_size=1, max_size=8),
            st.integers(min_value=1, max_value=10_000),
        ),
        min_size=0,
        max_size=40,
        unique_by=lambda f: f[0],
    ),
    st.integers(min_value=100, max_value=20_000),
)
def test_compaction_plan_invariants(files, target):
    """Every group fits the target, only small files are planned, no
    file appears twice, and the plan is deterministic."""
    from postgresimporter_spark.operators.compaction import plan_compaction

    groups = plan_compaction(files, target_bytes=target)
    sizes = dict(files)
    seen = set()
    for g in groups:
        assert g.total_bytes <= target
        assert len(g.files) > 1
        for f in g.files:
            assert sizes[f] < 0.75 * target
            assert f not in seen
            seen.add(f)
        assert g.total_bytes == sum(sizes[f] for f in g.files)
    assert plan_compaction(files, target_bytes=target) == groups


# --- BPE merge learning vs an independent Python model ---------------------


def _ref_bpe(words: dict, rounds: int):
    """Classic BPE (Sennrich et al.) in direct Python: pair counts over
    the vocabulary, argmax with (count desc, left asc, right asc), and
    an explicit greedy left-to-right single-pass merge — no string
    replace trick, so it cannot share a bug with the engine's path."""
    vocab = {w: list(w) + ["</w>"] for w in words}
    merges = []
    for _ in range(rounds):
        counts = {}
        for w, f in words.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + f
        if not counts:
            break
        (left, right), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, c))
        for w in vocab:
            syms, out, i = vocab[w], [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


@SETTINGS
@given(
    st.dictionaries(
        st.text(alphabet="abcde", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=5),
)
def test_bpe_matches_python_model(spark, words, rounds):
    from postgresimporter_spark.operators.bpe import encoded_tokens, learn_bpe

    vocab_df = spark.createDataFrame(
        list(words.items()), "word string, freq long"
    )
    merges_df, final = learn_bpe(vocab_df, rounds=rounds)
    got = [
        (r.merge_left, r.merge_right, r.pair_count)
        for r in merges_df.orderBy("merge_round").collect()
    ]
    exp_merges, exp_vocab = _ref_bpe(words, rounds)
    assert got == exp_merges

    # final token frequencies match the model's encoded vocabulary
    exp_counts = {}
    for w, f in words.items():
        for s in exp_vocab[w]:
            exp_counts[s] = exp_counts.get(s, 0) + f
    got_counts = {
        r.token: r.n_occurrences for r in encoded_tokens(final).collect()
    }
    assert got_counts == exp_counts
