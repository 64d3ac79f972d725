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


# --- embedding-cosine near-dup (banded SRP-LSH + exact cosine) ---

def _brute_pairs(emb, thr_x1e4):
    from hunt_spark.operators.similarity import with_cosine

    a = emb.select(
        F.col("vec_id").alias("vec_id_a"), F.col("embedding").alias("emb_a")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_id_b"), F.col("embedding").alias("emb_b")
    )
    pairs = with_cosine(
        a.crossJoin(b).filter(F.col("vec_id_a") < F.col("vec_id_b"))
    ).withColumn("cosine_x1e4", F.round(F.col("cosine") * 10000).cast("long"))
    return {
        (r["vec_id_a"], r["vec_id_b"]): r["cosine_x1e4"]
        for r in pairs.filter(F.col("cosine_x1e4") >= thr_x1e4).collect()
    }


def test_near_dup_pairs_true_cosines_ordered_and_high_recall(emb):
    from hunt_spark.operators.similarity import embedding_near_dup_pairs

    rows = embedding_near_dup_pairs(
        emb, threshold=0.45, n_planes=16, n_bands=8, dim=64
    ).collect()
    assert rows, "gate corpus must yield near-dup pairs at 0.45"
    truth = _brute_pairs(emb, 4500)
    for r in rows:
        key = (r["vec_id_a"], r["vec_id_b"])
        assert r["vec_id_a"] < r["vec_id_b"]
        # every emitted pair is a TRUE pair with its exact cosine:
        # LSH may lose recall, never precision
        assert truth[key] == r["cosine_x1e4"]
    # 2-bit bands at cosine>=0.45: per-band collision ~0.42, any-of-8
    # ~0.99 — demand most of the truth set, not a lucky subset
    assert len(rows) >= 0.8 * len(truth)


def test_near_dup_udf_strategy_matches_expr(emb):
    from hunt_spark.operators.similarity import embedding_near_dup_pairs

    def key(rows):
        return sorted(
            (r["vec_id_a"], r["vec_id_b"], r["cosine_x1e4"]) for r in rows
        )

    ex = embedding_near_dup_pairs(
        emb, threshold=0.45, dim=64, strategy="expr"
    ).collect()
    ud = embedding_near_dup_pairs(
        emb, threshold=0.45, dim=64, strategy="udf"
    ).collect()
    assert key(ex) == key(ud)


def test_near_dup_empty_and_bad_bands(spark, emb):
    from hunt_spark.operators.similarity import embedding_near_dup_pairs

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert embedding_near_dup_pairs(empty).count() == 0
    with pytest.raises(ValueError):
        embedding_near_dup_pairs(emb, n_planes=10, n_bands=4)


def test_near_dup_null_first_vector_does_not_degenerate(spark, emb):
    """dim-sniff used .first(): a NULL embedding in row one returned an
    EMPTY pairs frame for the whole table. Nulls must be skipped for
    sniffing and must flow through both signature strategies as
    null (dropped by the band join), not crash the Arrow kernel."""
    from hunt_spark.operators.similarity import embedding_near_dup_pairs

    nulled = spark.createDataFrame(
        [(10**9, None)], "vec_id long, embedding array<float>"
    ).unionByName(emb.select("vec_id", "embedding").orderBy("vec_id"))
    base = set(
        (r["vec_id_a"], r["vec_id_b"])
        for r in embedding_near_dup_pairs(emb, threshold=0.45).collect()
    )
    for strat in ("expr", "udf"):
        got = set(
            (r["vec_id_a"], r["vec_id_b"])
            for r in embedding_near_dup_pairs(
                nulled, threshold=0.45, strategy=strat, dim=None
            ).collect()
        )
        assert got == base


def test_cosine_topk_null_and_zero_vectors(spark):
    """Kernel scoring must keep with_cosine's degenerate-vector
    semantics: a null or zero-norm corpus vector scores cosine 0
    (ranked last), never NaN/error (r6 optimization: scoring moved
    into a sequential-fold-preserving Arrow kernel)."""
    from hunt_spark.operators.similarity import cosine_topk

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, None),
        (3, [0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["probe_id"], r["neighbor_id"]): r["cosine_x1e4"]
        for r in cosine_topk(emb, [0], k=5).collect()
    }
    assert got[(0, 2)] == 0 and got[(0, 3)] == 0
    assert got[(0, 1)] > 9000
