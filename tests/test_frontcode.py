"""Front-coded term dictionary: codec round-trips, ascending block
invariants, block-pruned prefix lookup parity with term_stats
(reference format: TermInfos.hs:237-255 front-coding + IO/Write.hs
varints)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hunt_spark.functions.frontcode import (
    frontcode_decode,
    frontcode_encode,
    lookup_prefix,
)


@given(st.lists(st.text(min_size=0, max_size=30), min_size=0, max_size=200))
@settings(max_examples=200, deadline=None)
def test_frontcode_roundtrip(terms):
    s = sorted(set(terms))
    assert frontcode_decode(frontcode_encode(s)) == s


def test_frontcode_compresses_shared_prefixes():
    terms = sorted(f"prefixsharedlongrun{i:04d}" for i in range(1000))
    fc = frontcode_encode(terms)
    raw = sum(len(t) for t in terms)
    assert len(fc) < raw * 0.4  # shared 19-char prefix collapses


@pytest.fixture(scope="module")
def term_dict(spark, engine):
    return engine.catalog.read(spark, "term_dict")


def test_term_dict_blocks_ascending(term_dict):
    rows = term_dict.collect()
    assert rows
    for r in rows:
        terms = frontcode_decode(bytes(r["terms_fc"]))
        assert len(terms) == r["n_terms"]
        assert terms[0] == r["first_term"]
        assert terms == sorted(terms)


def test_term_dict_covers_term_stats(spark, engine, term_dict):
    want = {
        (r["context"], r["term_lc"])
        for r in engine.catalog.read(spark, "term_stats")
        .select("context", "term_lc").collect()
    }
    got = set()
    for r in term_dict.collect():
        for t in frontcode_decode(bytes(r["terms_fc"])):
            got.add((r["context"], t))
    assert got == want


def test_lookup_prefix_matches_term_stats(spark, engine, term_dict):
    got = {
        (r["context"], r["term_lc"])
        for r in lookup_prefix(term_dict, "bra").collect()
    }
    want = {
        (r["context"], r["term_lc"])
        for r in engine.catalog.read(spark, "term_stats")
        .filter(F.col("term_lc").startswith("bra"))
        .select("context", "term_lc").collect()
    }
    assert got == want and got


def test_lookup_prefix_lower_bound_pruning(spark, engine, term_dict):
    """A late-alphabet prefix must prune blocks lying entirely before
    it (last_term bound) and still return the exact term set."""
    from hunt_spark.functions.frontcode import lookup_prefix

    assert "last_term" in term_dict.columns
    got = {r["term_lc"] for r in lookup_prefix(term_dict, "z").collect()}
    want = {
        r["term_lc"]
        for r in engine.catalog.read(spark, "term_stats")
        .filter("term_lc like 'z%'")
        .select("term_lc").distinct().collect()
    }
    assert got == want
    # the pruning predicate actually excludes early-alphabet blocks
    kept = term_dict.filter(
        (F.substring(F.col("first_term"), 1, 1) <= "z")
        & (F.col("last_term") >= "z")
    ).count()
    assert kept < term_dict.count()


def test_lookup_prefix_upper_bound_pruning(spark, engine, term_dict):
    """Regression (ADVICE r5 low): last_term was written per block but
    never read — an early-alphabet prefix decoded every block of
    'b'..'z'. The two-sided bound (first_term[:L] <= prefix <=
    last_term[:L]) must strictly tighten the candidate set while
    returning the exact term set."""
    prefix = "ab"
    got = {
        (r["context"], r["term_lc"])
        for r in lookup_prefix(term_dict, prefix).collect()
    }
    want = {
        (r["context"], r["term_lc"])
        for r in engine.catalog.read(spark, "term_stats")
        .filter(F.col("term_lc").startswith(prefix))
        .select("context", "term_lc").collect()
    }
    assert got == want
    # strict-pruning evidence on a deterministic layout: one block per
    # letter — a 'dm' scan must keep exactly the 'd' block. The one-
    # sided first_term bound kept 'a'..'d' (4 blocks); the last_term
    # upper bound cuts that to 1. Correctness on the candidate set is
    # checked through lookup_prefix itself.
    letters = "abcdefghijklmnopqrstuvwxyz"
    blocks = spark.createDataFrame(
        [
            (
                "text", 0, f"{c}aa", f"{c}zz", 3,
                frontcode_encode([f"{c}aa", f"{c}mm", f"{c}zz"]),
            )
            for c in letters
        ],
        "context string, shard int, first_term string, last_term string, "
        "n_terms int, terms_fc binary",
    )
    assert {r["term_lc"] for r in lookup_prefix(blocks, "dm").collect()} == {
        "dmm"
    }
    L = 2
    one_sided = blocks.filter(
        F.substring(F.col("first_term"), 1, L) <= "dm"
    ).count()
    two_sided = blocks.filter(
        (F.substring(F.col("first_term"), 1, L) <= "dm")
        & (F.substring(F.col("last_term"), 1, L) >= "dm")
    ).count()
    assert (one_sided, two_sided) == (4, 1)


def test_lookup_prefix_null_last_term_block_stays_candidate(spark):
    """A legacy block row without last_term (pre-column snapshot read
    as null) must not be pruned by the upper bound."""
    blocks = spark.createDataFrame(
        [
            ("text", 0, "apple", None, 2, frontcode_encode(["apple", "apricot"])),
            ("text", 0, "zebra", None, 1, frontcode_encode(["zebra"])),
        ],
        "context string, shard int, first_term string, last_term string, "
        "n_terms int, terms_fc binary",
    )
    got = {r["term_lc"] for r in lookup_prefix(blocks, "ap").collect()}
    assert got == {"apple", "apricot"}
