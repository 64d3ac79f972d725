"""Physical-plan regression guards: the properties that make the
engine viable at 100 TB must be visible in the executed plan, not
assumed — predicate pushdown to the parquet scan, partition pruning on
the shard layout, column pruning of positions for non-positional
queries, broadcast of the stats side (SURVEY.md §4.3)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_term_lookup_pushdown_and_partition_pruning(engine):
    c = engine.compiler()
    df = c.eval(engine._ast("'brain'"))
    plan = _plan(df)
    scan = plan[plan.index("Scan parquet"):]
    # filter reaches the parquet reader (row-group min/max on sorted term_lc)
    assert "PushedFilters" in scan
    assert "term_lc" in scan.split("PushedFilters")[1].split("\n")[0]
    # shard equality constant-folds into partition pruning
    assert "PartitionFilters" in scan
    pf = scan.split("PartitionFilters")[1].split("\n")[0]
    assert "shard" in pf


def test_nonpositional_query_prunes_positions_column(engine):
    c = engine.compiler()
    plan = _plan(c.eval(engine._ast("'brain'")))
    scan = plan[plan.index("Scan parquet"):]
    schema_line = scan.split("ReadSchema:")[1].split("\n")[0]
    assert "positions" not in schema_line
    # positional query DOES read positions
    plan2 = _plan(c.eval(engine._ast('"pinky and the brain"'), raw=True))
    assert "positions" in plan2.split("ReadSchema:")[1].split("\n")[0]


def test_stats_join_is_broadcast(engine):
    c = engine.compiler()
    plan = _plan(c.eval(engine._ast("'brain'")))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_no_python_in_query_hot_path(engine):
    # scoring is JVM expressions end-to-end; Python appears only in the
    # build (tokenize) and WAND decode kernels
    for q in ("'brain'", "new york", '"pinky and the brain"', "bra"):
        plan = _plan(engine.search(q, k=10, use_wand=False))
        assert "EvalPython" not in plan, q
        assert "PythonUDF" not in plan, q


def test_whole_stage_codegen_covers_scoring(engine):
    # AQE's pre-execution formatted plan hides codegen; inspect the
    # executed plan after an action
    c = engine.compiler()
    df = c.eval(engine._ast("'brain'"))
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark whole-stage-codegen stages in the executed
    # plan string; partial_max shows map-side combine before the shuffle
    assert "*(" in executed
    assert "partial_max" in executed


def test_topk_uses_take_ordered(engine):
    plan = _plan(engine.search("brain", k=10))
    assert "TakeOrderedAndProject" in plan
