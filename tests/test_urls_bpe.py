"""Web-curation tier: URL canonicalization edge cases and BPE greedy
merge semantics (batch 22)."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresimporter_spark.functions import urls as U
from postgresimporter_spark.operators.bpe import learn_bpe_merges


def _canon(spark, url: str) -> dict:
    df = spark.createDataFrame([(url,)], "raw_url string")
    return U.with_canonical(df, "raw_url").collect()[0].asDict()


def test_canonical_full_noise(spark):
    r = _canon(
        spark,
        "HTTP://WWW.Ex.COM:80/a/b/?utm_source=x&z=1&a=2&fbclid=f#frag",
    )
    assert r["canonical_url"] == "http://ex.com/a/b?a=2&z=1"
    assert r["host"] == "ex.com"
    assert r["registered_domain"] == "ex.com"


def test_canonical_default_port_only_for_matching_scheme(spark):
    # :443 is NOT default for http — must be kept
    assert (
        _canon(spark, "http://a.com:443/x")["canonical_url"]
        == "http://a.com:443/x"
    )
    assert (
        _canon(spark, "https://a.com:443/x")["canonical_url"]
        == "https://a.com/x"
    )
    assert (
        _canon(spark, "https://a.com:8080/x")["canonical_url"]
        == "https://a.com:8080/x"
    )


def test_canonical_empty_path_and_root(spark):
    assert _canon(spark, "https://a.com")["canonical_url"] == "https://a.com/"
    assert _canon(spark, "https://a.com/")["canonical_url"] == "https://a.com/"


def test_registered_domain_public_suffix(spark):
    assert (
        _canon(spark, "https://www.news.bbc.co.uk/x")["registered_domain"]
        == "bbc.co.uk"
    )
    assert (
        _canon(spark, "https://deep.sub.host.com/x")["registered_domain"]
        == "host.com"
    )
    # a host that IS exactly a two-label suffix + one label
    assert (
        _canon(spark, "https://only.co.jp/x")["registered_domain"]
        == "only.co.jp"
    )


def test_canonical_fixed_point_on_multi_slash_and_fragment_query(spark):
    # '/a//' and '/a/' must key identically (all trailing slashes cut)
    assert _canon(spark, "http://x.com/a//")["canonical_url"] == "http://x.com/a"
    assert _canon(spark, "http://x.com/a/")["canonical_url"] == "http://x.com/a"
    assert _canon(spark, "http://x.com////")["canonical_url"] == "http://x.com/"
    # a '?' inside the fragment is fragment content, not a query
    assert (
        _canon(spark, "http://x.com/a#f?z=1")["canonical_url"]
        == "http://x.com/a"
    )


def test_canonical_malformed_is_null(spark):
    # no scheme / no authority -> NULL canonical key (never invent one)
    assert _canon(spark, "not a url")["canonical_url"] is None
    assert _canon(spark, "example.com/a")["canonical_url"] is None
    assert _canon(spark, "https:///path-only")["canonical_url"] is None


def test_bpe_greedy_single_pass(spark):
    # "aaaa" with merge (a,a) must yield [aa, aa]; "aaa" yields [aa, a]:
    # SQL replace's continue-after-replacement semantics == greedy BPE.
    vocab = spark.createDataFrame(
        [("aaaa", 10)], "word string, freq long"
    )
    m = learn_bpe_merges(vocab, rounds=2).collect()
    assert (m[0]["merge_left"], m[0]["merge_right"]) == ("a", "a")
    # round 1: 10 words x 3 adjacent (a,a) pairs = 30
    assert m[0]["pair_count"] == 30
    # after greedy merge: [aa, aa, </w>] -> (aa,aa) and (aa,</w>) tie at
    # 10; bytewise tiebreak picks '</w>' ('<' 0x3C sorts before 'a')
    assert (m[1]["merge_left"], m[1]["merge_right"]) == ("aa", "</w>")
    assert m[1]["pair_count"] == 10


def test_bpe_frequency_weighting_and_tiebreak(spark):
    vocab = spark.createDataFrame(
        [("he", 3), ("she", 2), ("hem", 1)], "word string, freq long"
    )
    m = learn_bpe_merges(vocab, rounds=1).collect()[0]
    # (h,e) appears in all three words: 3+2+1=6, beats (e,</w>)=5
    assert (m["merge_left"], m["merge_right"]) == ("h", "e")
    assert m["pair_count"] == 6


def test_bpe_empty_vocab(spark):
    vocab = spark.createDataFrame([], "word string, freq long")
    assert learn_bpe_merges(vocab, rounds=3).count() == 0


def test_bpe_separator_char_in_word_is_stripped(spark):
    # a token containing U+001F (the wrapped-string separator) must not
    # corrupt the encoding: 'a\x1fb' trains exactly like 'ab'
    vocab = spark.createDataFrame(
        [("a\x1fb", 3)], "word string, freq long"
    )
    m = learn_bpe_merges(vocab, rounds=1).collect()[0]
    assert (m["merge_left"], m["merge_right"]) == ("a", "b")
    assert m["pair_count"] == 3


def test_bpe_encode_roundtrip_token_mass(spark):
    # encoding must conserve total symbol mass per word: after any
    # number of merges, sum(freq * len(word)+1 end-marks) splits across
    # tokens whose concatenation rebuilds each word
    from postgresimporter_spark.operators.bpe import encoded_tokens, learn_bpe

    vocab = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        "word string, freq long",
    )
    merges, final = learn_bpe(vocab, rounds=4)
    assert merges.count() == 4
    toks = encoded_tokens(final)
    # total character mass (excluding </w>) is conserved
    rows = toks.collect()
    char_mass = sum(
        (len(r["token"]) - (4 if r["token"].endswith("</w>") else 0))
        * r["n_occurrences"]
        for r in rows
    )
    word_mass = 5 * 3 + 2 * 5 + 6 * 6 + 3 * 6
    assert char_mass == word_mass
    # every word carries exactly one end-mark (merged or bare)
    end_mass = sum(
        r["n_occurrences"] for r in rows if r["token"].endswith("</w>")
    )
    assert end_mass == 5 + 2 + 6 + 3


def test_dsir_prefers_target_like_docs(spark):
    from postgresimporter_spark.operators.mining import dsir_importance

    df = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta", "tgt"),
            (2, "alpha beta beta alpha", "tgt"),
            (3, "gamma delta gamma delta", "other"),
            (4, "alpha beta gamma delta", "other"),
        ],
        "doc_id long, text string, source string",
    )
    scored = dsir_importance(df, F.col("source") == "tgt").collect()
    w = {r["doc_id"]: r["dsir_weight"] for r in scored}
    # docs made of target-domain tokens outweigh off-domain docs
    assert w[1] > w[3] and w[2] > w[3]
    # the mixed doc sits between
    assert w[3] < w[4] < w[1]


def test_new_tier_null_robustness(spark):
    """Null text/word/url rows pass through or drop — never crash."""
    from postgresimporter_spark.operators.bpe import encoded_tokens, learn_bpe
    from postgresimporter_spark.operators.curation import (
        duplicate_span_extents,
    )
    from postgresimporter_spark.operators.mining import dsir_importance

    urls = spark.createDataFrame(
        [(None,), ("https://a.com/x",)], "raw_url string"
    )
    got = U.with_canonical(urls, "raw_url").select("canonical_url").collect()
    assert {r.canonical_url for r in got} == {None, "https://a.com/x"}

    vocab = spark.createDataFrame(
        [(None, 1), ("ab", 2)], "word string, freq long"
    )
    merges, final = learn_bpe(vocab, rounds=1)
    assert [(r.merge_left, r.merge_right) for r in merges.collect()] == [
        ("a", "b")
    ]
    # null word contributes no tokens
    assert {r.token for r in encoded_tokens(final).collect()} == {
        "ab",
        "</w>",
    }

    docs = spark.createDataFrame(
        [(1, None, "a"), (2, "x y", "b")],
        "doc_id long, text string, source string",
    )
    assert [
        r.doc_id
        for r in dsir_importance(docs, F.col("source") == "a").collect()
    ] == [2]
    assert [
        r.id
        for r in duplicate_span_extents(
            docs.select("doc_id", "text"), span=2, min_docs=1
        ).collect()
    ] == [2]
