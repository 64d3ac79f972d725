"""Fuzzy expansion (Q10): exact port of Hunt/Query/Fuzzy.hs arithmetic
(hand-traced pins), default tables, and the opt-in engine resolution.
The DEFAULT behavior stays the live evaluator's: QFuzzy == NoCase."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hunt_spark.engine import HuntEngine
from hunt_spark.operators.build import BuildConfig
from hunt_spark.plans.fuzzy import (
    ENGLISH_REPLACEMENTS,
    GERMAN_REPLACEMENTS,
    FuzzyConfig,
    fuzz,
    fuzz_list,
    replace_first,
)


def test_replace_first_semantics():
    # Fuzzy.hs replaceFirst, incl. its exact ys-consumption behavior
    assert replace_first("", "x", "abc") == "xabc"
    assert replace_first("a", "b", "aa") == "ba"
    assert replace_first("b", "a", "aa") == "aa"  # no match -> unchanged
    assert replace_first("ab", "xy", "abc") == "xyc"
    assert replace_first("a", "", "abc") == "bc"
    assert replace_first("abc", "x", "ab") == "ab"  # not a prefix -> unchanged


def test_swap_only_pinned():
    # word "abc", swaps only: positions 0 and 1 swap adjacent chars,
    # weight (3-pos)/3 => {"bac": 1.0, "acb": 2/3}; score-doubled
    # recursion exceeds maxFuzziness 1.0 and stops; original removed
    cfg = FuzzyConfig(apply_replacements=False)
    got = fuzz(cfg, "abc")
    assert set(got) == {"bac", "acb"}
    assert math.isclose(got["bac"], 1.0)
    assert math.isclose(got["acb"], 2.0 / 3.0)


def test_replacement_pinned():
    # single replacement (a<->b, 0.5), no swaps, word "aa":
    # "" + replace(a->b, "aa") = "ba" @ 1.0 ; "a" + replace(a->b, "a")
    # = "ab" @ 0.5 ; level-2 candidates all exceed th=1.0
    cfg = FuzzyConfig(
        apply_replacements=True,
        apply_swappings=False,
        replacements=[(("a", "b"), 0.5)],
    )
    got = fuzz(cfg, "aa")
    assert set(got) == {"ba", "ab"}
    assert math.isclose(got["ba"], 1.0)
    assert math.isclose(got["ab"], 0.5)


def test_default_tables_shapes():
    assert len(ENGLISH_REPLACEMENTS) == 16  # Fuzzy.hs:91-110
    assert len(GERMAN_REPLACEMENTS) == 18   # Fuzzy.hs:112-135
    # umlaut folding appears among the cheapest variants (0.1 class,
    # position-weighted — end-of-word letter doublings score lower)
    cfg = FuzzyConfig(replacements=list(GERMAN_REPLACEMENTS),
                      apply_swappings=False)
    got = fuzz_list(cfg, "müller")
    assert "mueller" in dict(got)
    assert dict(got)["mueller"] == pytest.approx((0.1 / 0.4) * (5 / 6))


def test_fuzz_list_ascending_and_capped():
    cfg = FuzzyConfig(max_set_size=8)
    lst = fuzz_list(cfg, "house")
    scores = [s for _w, s in lst]
    assert scores == sorted(scores)
    assert all(s <= cfg.max_fuzziness for s in scores)


def test_engine_fuzzy_resolution(spark, tmp_path_factory):
    docs = spark.createDataFrame(
        [("u1", "the mueller report"), ("u2", "unrelated words")],
        "url string, text string",
    )
    root = str(tmp_path_factory.mktemp("fuzzy_idx"))
    base = HuntEngine(spark, root, BuildConfig(n_shards=2, salt_buckets=1))
    base.build(docs, {"text": F.col("text")}, build_id="f")

    # default: QFuzzy evaluates as NoCase (live-evaluator behavior) —
    # "müller" matches nothing
    assert base.search("~müller", k=5, use_wand=False).count() == 0

    fz = HuntEngine(
        spark, root, BuildConfig(n_shards=2, salt_buckets=1),
        fuzzy_config=FuzzyConfig(replacements=list(GERMAN_REPLACEMENTS)),
    )
    hits = fz.search("~müller", k=5, use_wand=False).collect()
    assert [r["url"] for r in hits] == ["u1"]
    # a word that matches exactly is NOT fuzzed away
    assert fz.search("~mueller", k=5, use_wand=False).count() == 1
