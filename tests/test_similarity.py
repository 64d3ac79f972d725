"""Embedding similarity search: exact top-k is ground truth; the two
ANN scale paths (hyperplane LSH, IVF-Flat multi-probe) must be
deterministic, return only true cosines, and reach useful recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hunt_spark.operators.similarity import (
    cosine_topk,
    ivf_ann_topk,
    lsh_ann_topk,
)

SF = "/root/testdata/sf0.01"
PROBES = [0, 1, 2, 3, 4]
K = 5


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def exact(emb):
    return {
        (r["probe_id"], r["neighbor_id"]): r["cosine_x1e4"]
        for r in cosine_topk(emb, PROBES, k=K).collect()
    }


def _recall(ann_rows, exact_pairs):
    hits = sum(
        1 for r in ann_rows if (r["probe_id"], r["neighbor_id"]) in exact_pairs
    )
    return hits / len(exact_pairs)


def test_ivf_ann_recall_and_true_cosines(emb, exact):
    got = ivf_ann_topk(emb, PROBES, k=K, n_cells=16, n_probe=4, dim=64).collect()
    assert len(got) == len(PROBES) * K
    # every returned cosine is the true cosine (exact rerank): any pair
    # that IS in the exact top-k must carry the identical score
    for r in got:
        key = (r["probe_id"], r["neighbor_id"])
        if key in exact:
            assert r["cosine_x1e4"] == exact[key]
    # near-uniform random embeddings are ANN's worst case (true
    # neighbors barely closer than noise, spread across cells) — the
    # floor just guards against a broken join; the strong checks are
    # exact-rerank score identity above and monotone/exhaustive below
    assert _recall(got, exact) >= 0.2  # 4/16 cells probed


def test_ivf_more_probes_monotone_recall(emb, exact):
    r4 = _recall(
        ivf_ann_topk(emb, PROBES, k=K, n_cells=16, n_probe=4, dim=64).collect(),
        exact,
    )
    r16 = _recall(
        ivf_ann_topk(emb, PROBES, k=K, n_cells=16, n_probe=16, dim=64).collect(),
        exact,
    )
    assert r16 >= r4
    assert r16 == 1.0  # probing every cell == exhaustive search


def test_lsh_ann_recall(emb, exact):
    # 8 planes = 256 buckets over 500 near-uniform vectors with 1-bit
    # probing: candidates are ~2% of the corpus, so recall on this
    # worst-case data is low by construction — the floor only guards a
    # broken bucket join. IVF (n_probe knob) is the tunable-recall path.
    got = lsh_ann_topk(emb, PROBES, k=K, dim=64).collect()
    assert _recall(got, exact) >= 0.04
    # fewer planes => bigger buckets => recall must not get worse
    got4 = lsh_ann_topk(emb, PROBES, k=K, dim=64, n_planes=4).collect()
    assert _recall(got4, exact) >= _recall(got, exact)


def test_udf_strategy_matches_expr(emb):
    # the broadcast-matrix pandas-UDF scale path must reproduce the
    # literal-expression path exactly at the small config
    e = sorted(map(tuple, ivf_ann_topk(
        emb, PROBES, k=K, dim=64, strategy="expr").collect()))
    u = sorted(map(tuple, ivf_ann_topk(
        emb, PROBES, k=K, dim=64, strategy="udf").collect()))
    assert e == u
    el = sorted(map(tuple, lsh_ann_topk(
        emb, PROBES, k=K, dim=64, strategy="expr").collect()))
    ul = sorted(map(tuple, lsh_ann_topk(
        emb, PROBES, k=K, dim=64, strategy="udf").collect()))
    assert el == ul


def test_udf_strategy_smoke_at_production_config(spark):
    # 256 cells x 256 dims = 65k literals — over EXPR_LITERAL_LIMIT, so
    # auto must route to the UDF path and the plan must still execute
    import numpy as np

    from hunt_spark.operators.similarity import EXPR_LITERAL_LIMIT

    assert 256 * 256 > EXPR_LITERAL_LIMIT
    rng = np.random.Generator(np.random.Philox(key=[1, 2]))
    rows = [(i, rng.normal(size=256).astype("float32").tolist())
            for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = ivf_ann_topk(
        df, [0, 1], k=3, n_cells=256, n_probe=64, dim=256
    ).collect()
    assert {r["probe_id"] for r in got} == {0, 1}
    assert all(r["rank"] <= 3 for r in got)


def test_ivf_deterministic_across_partitioning(spark, emb, exact):
    a = sorted(map(tuple, ivf_ann_topk(emb, PROBES, k=K, dim=64).collect()))
    b = sorted(
        map(
            tuple,
            ivf_ann_topk(emb.repartition(7), PROBES, k=K, dim=64).collect(),
        )
    )
    assert a == b
