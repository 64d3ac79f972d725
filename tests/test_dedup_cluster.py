"""Near-duplicate clustering: connected components (alternating
large-star/small-star, Kiveris et al. SoCC'14) + canonical-doc
selection. Pinned against a driver-independent union-find reference on
adversarial graph shapes — long chains (worst case for naive min-label
propagation), cliques, random graphs, parallel chains — and against
full-long-range node ids (doc_id = xxhash64(url) spans ±2^63, which
overflows naive integer checksums)."""

from __future__ import annotations

import random

import pytest

from hunt_spark.operators.textops import connected_components, near_dup_clusters


def _uf_components(edges: set[tuple[int, int]]) -> dict[int, int]:
    nodes = {x for e in edges for x in e}
    parent = {n: n for n in nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _check(spark, edges: set[tuple[int, int]]) -> None:
    exp = _uf_components(edges)
    df = spark.createDataFrame(
        list(edges), "doc_id_a long, doc_id_b long"
    )
    got = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    assert got == exp


def test_long_chain(spark):
    # a 60-node path: naive propagation needs 60 rounds; star
    # contraction must finish well inside max_iter
    _check(spark, {(i, i + 1) for i in range(1, 60)})


def test_cliques(spark):
    edges = set()
    for base in (1, 21, 41):
        for i in range(base, base + 10):
            for j in range(i + 1, base + 10):
                edges.add((i, j))
    _check(spark, edges)


def test_random_graph(spark):
    rng = random.Random(11)
    edges = {
        (rng.randint(1, 120), rng.randint(1, 120)) for _ in range(140)
    }
    edges = {(a, b) for a, b in edges if a != b}
    _check(spark, edges)


def test_full_long_range_ids(spark):
    # xxhash64 doc_ids span the whole signed-long range; sums used in
    # the convergence checksum must not overflow (ANSI mode throws)
    big = 2**62
    edges = {(-big, big), (big, big - 7), (-big, -big + 3)}
    _check(spark, edges)


def test_near_dup_clusters_keep_flags(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_id_a long, doc_id_b long"
    )
    rows = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["keep"])
        for r in near_dup_clusters(docs, pairs).collect()
    }
    assert rows == {
        1: (1, 3, 1),
        2: (1, 3, 0),
        3: (1, 3, 0),
        4: (4, 1, 1),   # singleton: its own canonical
        5: (5, 2, 1),
        6: (5, 2, 0),
        7: (7, 1, 1),
    }


def test_empty_pairs(spark):
    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    pairs = spark.createDataFrame([], "doc_id_a long, doc_id_b long")
    rows = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in near_dup_clusters(docs, pairs).collect()
    }
    assert rows == {1: (1, 1), 2: (2, 1)}
