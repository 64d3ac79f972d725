"""Pins for the r5 training-pipeline additions: Gopher-style
repetition fractions, benchmark-contamination overlap, deterministic
stratified sampling. Gate parity vs DuckDB is covered by
__spark_entry__ (txt_repetition / txt_contamination /
op_sample_stratified); these tests pin the semantics on crafted docs
and the properties (determinism, layout-independence, rate fidelity)
the gates can't see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hunt_spark.operators import textops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# ---------------------------------------------------------------------------
# repetition_stats
# ---------------------------------------------------------------------------


def test_repetition_fractions_pinned(spark):
    docs = _docs(
        spark,
        [
            # grams: ab ba ab ba ab -> top "a b"=3/5, dup=(3+2)/5
            (1, "a b a b a b", "en"),
            # grams: ab bc -> no dup, top 1/2
            (2, "a b c", "en"),
            # single token: no grams, NO row
            (3, "solo", "en"),
            (4, "", "en"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in textops.repetition_stats(docs, n=2).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["n_grams"] == 5
    assert out[1]["top_gram_frac_x1e4"] == 6000
    assert out[1]["dup_gram_frac_x1e4"] == 10000
    assert out[2]["n_grams"] == 2
    assert out[2]["top_gram_frac_x1e4"] == 5000
    assert out[2]["dup_gram_frac_x1e4"] == 0


def test_repetition_trigram_window(spark):
    # n=3 over 4 tokens -> grams "x y x", "y x y": all distinct
    docs = _docs(spark, [(1, "x y x y", "en")])
    row = textops.repetition_stats(docs, n=3).collect()[0]
    assert row["n_grams"] == 2
    assert row["dup_gram_frac_x1e4"] == 0


# ---------------------------------------------------------------------------
# contamination
# ---------------------------------------------------------------------------


def test_contamination_counts_distinct_gram_hits(spark):
    bench = _docs(spark, [(100, "q w e r", "en")])  # grams: qwe, wer
    docs = _docs(
        spark,
        [
            # distinct grams: "q w e" (planted twice, counted once), "w e q", "e q w"
            (1, "q w e q w e", "en"),
            (2, "z z z z", "en"),  # zzz x2 -> 1 distinct, clean
            (3, "a b", "en"),  # <3 tokens -> NO row
        ],
    )
    out = {
        r["doc_id"]: r
        for r in textops.contamination(docs, bench, n=3).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["n_distinct_grams"] == 3
    assert out[1]["n_contaminated"] == 1  # only "q w e" is in bench
    assert out[1]["contaminated_frac_x1e4"] == 3333
    assert out[2]["n_contaminated"] == 0
    assert out[2]["contaminated_frac_x1e4"] == 0


def test_contamination_full_overlap(spark):
    bench = _docs(spark, [(100, "a b c d", "en")])
    docs = _docs(spark, [(1, "a b c", "en")])
    row = textops.contamination(docs, bench, n=3).collect()[0]
    assert row["n_contaminated"] == 1
    assert row["contaminated_frac_x1e4"] == 10000


# ---------------------------------------------------------------------------
# sample_stratified
# ---------------------------------------------------------------------------


def _sample_keys(spark, rates, default, n=4000, parts=4):
    docs = (
        spark.range(n)
        .withColumn("doc_id", F.col("id"))
        .withColumn(
            "lang",
            F.when(F.col("id") % 3 == 0, "en")
            .when(F.col("id") % 3 == 1, "zh")
            .otherwise("de"),
        )
        .repartition(parts)
    )
    return sorted(
        r["doc_id"]
        for r in textops.sample_stratified(docs, rates, default).collect()
    )


def test_sample_matches_pure_python_hash(spark):
    kept = _sample_keys(spark, {"en": 0.5, "zh": 0.1}, 0.25, n=1000)
    thr = {"en": 1 << 31, "zh": round(0.1 * (1 << 32)), "de": 1 << 30}
    langs = {0: "en", 1: "zh", 2: "de"}
    expected = sorted(
        i
        for i in range(1000)
        if (i * 2654435761) % (1 << 32) < thr[langs[i % 3]]
    )
    assert kept == expected


def test_sample_deterministic_and_layout_independent(spark):
    a = _sample_keys(spark, {"en": 0.5}, 0.25, parts=2)
    b = _sample_keys(spark, {"en": 0.5}, 0.25, parts=16)
    assert a == b  # unlike df.sample, layout cannot change membership


def test_sample_rate_fidelity_per_stratum(spark):
    kept = _sample_keys(spark, {"en": 0.5, "zh": 0.1}, 0.25, n=9000)
    by_lang = {"en": 0, "zh": 0, "de": 0}
    langs = {0: "en", 1: "zh", 2: "de"}
    for k in kept:
        by_lang[langs[k % 3]] += 1
    # 3000 keys per stratum; multiplicative hash is uniform enough
    # for +-15% relative at this n
    assert by_lang["en"] == pytest.approx(1500, rel=0.15)
    assert by_lang["zh"] == pytest.approx(300, rel=0.15)
    assert by_lang["de"] == pytest.approx(750, rel=0.15)


def test_sample_rate_bounds(spark):
    assert _sample_keys(spark, {}, 0.0, n=500) == []
    assert len(_sample_keys(spark, {}, 1.0, n=500)) == 500


# ---------------------------------------------------------------------------
# composed pipeline (pipeline_kept gate's Spark side)
# ---------------------------------------------------------------------------


def test_pipeline_kept_invariants(spark):
    """The composed curation chain only ever narrows, and every kept
    doc individually satisfies every stage's predicate (oracle parity
    is the pipeline_kept gate / test_entry_contract)."""
    import __spark_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = entrymod._pipeline_kept(spark, sf_dir).collect()
    assert 0 < len(kept) < docs.count()
    ids = [r["doc_id"] for r in kept]
    assert len(ids) == len(set(ids))

    q = {
        r["doc_id"]: r
        for r in textops.quality_stats(docs).collect()
    }
    rep = {
        r["doc_id"]: r
        for r in textops.repetition_stats(docs, n=2).collect()
    }
    lid = {r["doc_id"]: r["pred_lang"] for r in textops.langid(docs).collect()}
    canon = {
        r["keep_doc_id"] for r in textops.dedup_exact(docs).collect()
    }
    for r in kept:
        d = r["doc_id"]
        assert q[d]["n_tokens"] >= 30 and r["n_tokens"] == q[d]["n_tokens"]
        assert rep[d]["dup_gram_frac_x1e4"] <= 1500
        assert lid[d] != "de"
        assert d in canon
        assert (d * 2654435761) % (1 << 32) < {
            "en": 1 << 31, "zh": round(0.1 * (1 << 32))
        }.get(r["lang"], 1 << 30)


# ---------------------------------------------------------------------------
# sample_weighted (epoch upsampling)
# ---------------------------------------------------------------------------


def test_weighted_matches_pure_python(spark):
    docs = (
        spark.range(600)
        .withColumn("doc_id", F.col("id"))
        .withColumn(
            "lang",
            F.when(F.col("id") % 3 == 0, "en")
            .when(F.col("id") % 3 == 1, "zh")
            .otherwise("de"),
        )
        .repartition(5)
    )
    out = sorted(
        (r["doc_id"], r["copy_idx"])
        for r in textops.sample_weighted(
            docs, {"en": 2.5, "zh": 0.5}, 1.25
        ).collect()
    )
    langs = {0: "en", 1: "zh", 2: "de"}
    conf = {"en": (2, 1 << 31), "zh": (0, 1 << 31), "de": (1, 1 << 30)}
    expected = []
    for i in range(600):
        base, thr = conf[langs[i % 3]]
        n = base + (1 if (i * 2654435761) % (1 << 32) < thr else 0)
        expected += [(i, c) for c in range(1, n + 1)]
    assert out == sorted(expected)


def test_weighted_expected_copies(spark):
    # rate 2.5 over 3000 keys -> ~7500 rows out
    docs = spark.range(3000).withColumn("doc_id", F.col("id")).withColumn(
        "lang", F.lit("en")
    )
    n = textops.sample_weighted(docs, {"en": 2.5}, 1.0).count()
    assert n == pytest.approx(7500, rel=0.05)


def test_weighted_integer_rate_is_exact_replication(spark):
    docs = spark.range(100).withColumn("doc_id", F.col("id")).withColumn(
        "lang", F.lit("en")
    )
    out = textops.sample_weighted(docs, {"en": 3.0}, 1.0).collect()
    assert len(out) == 300
    assert {r["copy_idx"] for r in out} == {1, 2, 3}


def test_weighted_zero_rate_drops_all(spark):
    docs = spark.range(50).withColumn("doc_id", F.col("id")).withColumn(
        "lang", F.lit("en")
    )
    assert textops.sample_weighted(docs, {"en": 0.0}, 1.0).count() == 0


def test_sample_hash_safe_at_full_long_range(spark):
    """Real doc_ids are xxhash64 values (full signed-long range). The
    naive key*MULT hash overflows int64 there — ANSI job kill or
    sign-biased keep-everything. Pin the split-multiply form against
    exact python big-int arithmetic at the extremes."""
    keys = [
        0, 1, 3_470_000_000, -1, -(1 << 62), (1 << 63) - 1,
        -9_223_372_036_854_775_808, 1234567890123456789,
        -3735928559123456789,
    ]
    docs = spark.createDataFrame(
        [(k, "en") for k in keys], "doc_id long, lang string"
    )
    kept = {
        r["doc_id"]
        for r in textops.sample_stratified(docs, {}, 0.5).collect()
    }
    expected = {
        k for k in keys if (k * 2654435761) % (1 << 32) < (1 << 31)
    }
    assert kept == expected
    # weighted path shares the hash
    w = {
        r["doc_id"]
        for r in textops.sample_weighted(docs, {}, 0.5).collect()
    }
    assert w == expected


# ---------------------------------------------------------------------------
# clean_text (unicode + whitespace normalization)
# ---------------------------------------------------------------------------


def test_clean_text_pins(spark):
    import unicodedata

    from hunt_spark.operators.textops import clean_text

    rows = [
        # DECOMPOSED e + combining acute (U+0301): NFC composes it and
        # the whitespace runs collapse
        (1, "Cafe\u0301  du\tmonde\r\n ok"),
        (2, "a\x00b\x07c\x7fd"),            # control chars stripped
        (3, "  x\x0b\x0cy  "),               # \x0b\x0c stripped BEFORE
                                             # ws collapse -> 'xy'
        (4, "nai\u0308ve"),                   # combining diaeresis
        (5, ""),
    ]
    got = {
        r["doc_id"]: r["text_clean"]
        for r in clean_text(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert got[1] == "Caf\u00e9 du monde ok"  # composed form, single spaces
    assert got[1] == unicodedata.normalize("NFC", "Cafe\u0301") + " du monde ok"
    assert got[2] == "abcd"
    assert got[3] == "xy"
    assert got[4] == "na\u00efve" and len(got[4]) == 5  # 5 chars: composed
    assert got[5] == ""


def test_clean_text_nfkc_form(spark):
    from hunt_spark.operators.textops import clean_text

    rows = [(1, "ﬁle ①")]  # fi-ligature + circled one
    got = clean_text(
        spark.createDataFrame(rows, "doc_id long, text string"), form="NFKC"
    ).collect()[0]["text_clean"]
    assert got == "file 1"


# ---------------------------------------------------------------------------
# dup_spans (exact duplicated-substring detection, Lee et al. seed-grams)
# ---------------------------------------------------------------------------


def test_dup_spans_cross_doc_boilerplate(spark):
    from hunt_spark.operators.textops import dup_spans

    boiler = "q w e r t y u i"  # 8 shared tokens
    rows = [
        (1, f"a1 b1 c1 {boiler} d1 e1"),
        (2, f"a2 {boiler} b2"),
        (3, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"),  # no dup grams
    ]
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in dup_spans(
            spark.createDataFrame(rows, "doc_id long, text string"), k=8
        ).collect()
    }
    # doc1: boiler at tokens 4..11; doc2: at 2..9; doc3 none
    assert got == {(1, 4, 11, 8), (2, 2, 9, 8)}


def test_dup_spans_merges_overlapping_windows(spark):
    from hunt_spark.operators.textops import dup_spans

    # two docs share a 6-token run -> with k=4, windows at 3 positions
    # overlap and must merge into ONE maximal span
    rows = [(1, "x p q r s t u y"), (2, "m p q r s t u n")]
    got = dup_spans(
        spark.createDataFrame(rows, "doc_id long, text string"), k=4
    ).collect()
    spans = {(r["doc_id"], r["span_start"], r["span_end"]) for r in got}
    assert spans == {(1, 2, 7), (2, 2, 7)}


def test_dup_spans_within_doc_repeat_counts(spark):
    from hunt_spark.operators.textops import dup_spans

    # the SAME doc repeats a 5-gram twice: count >= 2 within one doc
    rows = [(1, "a b c d e zz a b c d e")]
    got = dup_spans(
        spark.createDataFrame(rows, "doc_id long, text string"), k=5
    ).collect()
    spans = sorted((r["span_start"], r["span_end"]) for r in got)
    assert spans == [(1, 5), (7, 11)]


def test_dup_spans_distinct_islands_not_bridged(spark):
    from hunt_spark.operators.textops import dup_spans

    # two shared runs separated by unique middles must stay two spans
    rows = [
        (1, "p q r s AA1 AA2 AA3 AA4 AA5 t u v w"),
        (2, "p q r s BB1 BB2 BB3 BB4 BB5 t u v w"),
    ]
    got = dup_spans(
        spark.createDataFrame(rows, "doc_id long, text string"), k=4
    ).collect()
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"]) for r in got
    )
    assert spans == [(1, 1, 4), (1, 10, 13), (2, 1, 4), (2, 10, 13)]


def test_dup_span_stats_fraction_and_zero(spark):
    from hunt_spark.operators.textops import dup_span_stats

    boiler = "q w e r t"
    rows = [
        (1, f"a1 b1 {boiler} c1 d1 e1"),   # 5 of 10 tokens duplicated
        (2, f"x1 {boiler} y1"),             # 5 of 7
        (3, "u1 u2 u3 u4 u5 u6"),           # none
    ]
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_frac_x1e4"])
        for r in dup_span_stats(
            spark.createDataFrame(rows, "doc_id long, text string"), k=5
        ).collect()
    }
    assert got[1] == (10, 5, 5000)
    assert got[2] == (7, 5, 7143)
    assert got[3] == (6, 0, 0)


def test_strip_spans_removes_exact_tokens(spark):
    from hunt_spark.operators.textops import dup_spans, strip_spans

    boiler = "q w e r t"
    rows = [
        (1, f"a1 b1 {boiler} c1 d1"),
        (2, f"x1 {boiler} y1"),
        (3, "u1 u2 u3"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = dup_spans(docs, k=5)
    got = {
        r["doc_id"]: r["text_stripped"]
        for r in strip_spans(docs, spans).collect()
    }
    assert got[1] == "a1 b1 c1 d1"
    assert got[2] == "x1 y1"
    assert got[3] == "u1 u2 u3"  # span-free doc passes through


def test_strip_spans_explicit_span_frame(spark):
    from hunt_spark.operators.textops import strip_spans

    docs = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5 t6")], "doc_id long, text string"
    )
    spans = spark.createDataFrame(
        [(1, 2, 3), (1, 5, 5)],
        "doc_id long, span_start long, span_end long",
    )
    got = strip_spans(docs, spans).collect()[0]["text_stripped"]
    assert got == "t1 t4 t6"


def test_quality_stats_unicode_only_and_empty_docs(spark):
    """The cheap rlike('(?U)\\w') row filter must keep exactly the docs
    the (?U)\\w+ tokenizer finds tokens in: a doc of only non-ASCII
    word chars emits a row; punctuation-only and empty docs emit none
    (r6 optimization: the filter replaced size(tokenize(..)) > 0)."""
    from hunt_spark.operators.textops import quality_stats

    docs = spark.createDataFrame(
        [(1, "日本語 テスト"), (2, "...!!!"), (3, ""), (4, "plain words")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["n_tokens"] for r in quality_stats(docs).collect()}
    assert rows == {1: 2, 4: 2}
