"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k neighbors for a probe set —
  broadcast the probes, JVM-side zip_with/aggregate dot products, no
  Python in the hot path. The baseline and the verifier for the ANN
  path.
- ``lsh_ann_topk``: random-hyperplane LSH bucketing — probes only join
  candidates sharing a hyperplane signature band, the scale path when
  the corpus side is 10^9+ vectors.

All math in float64 with a fixed fold order (array index order) for
cross-engine reproducibility.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Above this many scalar literals (n_cells x dim / n_planes x dim) the
# expression-tree path is off the table: Catalyst would have to compile
# millions of literal nodes (4k cells x 768 dims ~ 3M), so cell/
# signature assignment switches to an Arrow-batched pandas UDF over a
# broadcast numpy matrix — one BLAS matmul per batch.
EXPR_LITERAL_LIMIT = 16_384


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def with_cosine(pairs: DataFrame, va: str = "emb_a", vb: str = "emb_b") -> DataFrame:
    # nullif guards the zero-norm vector (missing/padded embeddings are
    # routine at corpus scale): under ANSI mode (Spark 4 default) a bare
    # division would throw DIVIDE_BY_ZERO and kill the whole job; a
    # degenerate vector instead scores cosine 0 (similar-to-nothing)
    den = F.nullif(_norm(F.col(va)) * _norm(F.col(vb)), F.lit(0.0))
    cos = F.coalesce(_dot(F.col(va), F.col(vb)) / den, F.lit(0.0))
    return pairs.withColumn("cosine", cos)


def cosine_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe (excluding self).

    Probes are a tiny broadcast side; the corpus scan is one pass.
    Ranked deterministically by (rounded score desc, neighbor id asc).
    Returns (probe_id, neighbor_id, cosine_x1e4, rank).
    """
    # Score in an Arrow-batched kernel against the broadcast probe
    # matrix (guide §4.2): the expression form paid an interpreted
    # higher-order fold per pair per dimension. The kernel preserves
    # the EXACT IEEE result by folding sequentially over dimensions
    # (one numpy op per dimension, vectorized over rows) — the same
    # ((0+x1)+x2)+... association the Catalyst aggregate uses for dot
    # products and norms — so cosine, rounding and ranking are
    # bit-identical. Probes are a bounded driver-side collect (the
    # probe_ids list), exactly what the broadcast join shipped before.
    probe_rows = (
        embeddings.filter(F.col(id_col).isin(probe_ids))
        .select(F.col(id_col).cast("long"), vec_col)
        .collect()
    )
    spark = embeddings.sparkSession

    def _seq_dot(m: np.ndarray, v: np.ndarray) -> np.ndarray:
        acc = np.zeros(m.shape[0], dtype=np.float64)
        for d in range(m.shape[1]):
            acc = acc + m[:, d] * v[d]
        return acc

    def _seq_norm(m: np.ndarray) -> np.ndarray:
        acc = np.zeros(m.shape[0], dtype=np.float64)
        for d in range(m.shape[1]):
            acc = acc + m[:, d] * m[:, d]
        return np.sqrt(acc)

    p_ids = [int(r[0]) for r in probe_rows]
    p_vecs = [
        None if r[1] is None else np.asarray(r[1], dtype=np.float64)
        for r in probe_rows
    ]
    bc = spark.sparkContext.broadcast((p_ids, p_vecs))
    corpus = embeddings.select(
        F.col(id_col).cast("long").alias("neighbor_id"), F.col(vec_col).alias("emb_b")
    )

    def score(batches):
        import pandas as pd

        ids, vecs = bc.value
        p_norm = {
            i: (float(_seq_norm(v[None, :])[0]) if v is not None else None)
            for i, v in zip(ids, vecs)
        }
        for pdf in batches:
            if len(pdf) == 0:
                continue
            nid = pdf["neighbor_id"].to_numpy()
            raw = pdf["emb_b"].to_numpy()
            ok = np.array([v is not None for v in raw])
            m = (
                np.stack([np.asarray(v, dtype=np.float64) for v in raw[ok]])
                if ok.any()
                else np.empty((0, 0))
            )
            nb = np.zeros(len(pdf), dtype=np.float64)
            if ok.any():
                nb[ok] = _seq_norm(m)
            out_pid, out_nid, out_cos = [], [], []
            for pid, pv in zip(ids, vecs):
                sel = nid != pid
                cos = np.zeros(len(pdf), dtype=np.float64)
                na = p_norm[pid]
                if pv is not None and na is not None and ok.any():
                    den = na * nb[ok]
                    dot = _seq_dot(m, pv)
                    with np.errstate(invalid="ignore", divide="ignore"):
                        c = np.where(den != 0.0, dot / den, 0.0)
                    cos[ok] = c
                out_pid.append(np.full(sel.sum(), pid, dtype=np.int64))
                out_nid.append(nid[sel])
                out_cos.append(cos[sel])
            yield pd.DataFrame(
                {
                    "probe_id": np.concatenate(out_pid),
                    "neighbor_id": np.concatenate(out_nid),
                    "cosine": np.concatenate(out_cos),
                }
            )

    scored = corpus.mapInPandas(
        score, schema="probe_id long, neighbor_id long, cosine double"
    ).withColumn(
        "cosine_x1e4", F.round(F.col("cosine") * 10000).cast("long")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine_x1e4"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine_x1e4", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    return rng.normal(size=(n_planes, dim))


def lsh_signature_col(vec, planes: np.ndarray):
    """Sign bits of hyperplane projections, packed to a long — pure
    column expressions over literal plane arrays."""
    bits = []
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(x)) for x in plane]),
                lambda x, p: x.cast("double") * p,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("long")


def ivf_centroids(dim: int, n_cells: int, seed: int = 7) -> np.ndarray:
    """Deterministic unit-norm cell centroids (Philox stream). A real
    deployment would train them with k-means over a corpus sample; the
    fixed pseudo-centroids keep the operator reproducible (and SQL-
    oracle-able) while exercising the identical distributed plan —
    coarse cell assignment, inverted cell lists, multi-probe rerank."""
    rng = np.random.Generator(np.random.Philox(key=[seed, dim * 100003 + n_cells]))
    c = rng.normal(size=(n_cells, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _cell_dots(vec, centroids: np.ndarray) -> list:
    return [
        F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(x)) for x in c]),
                lambda x, p: x.cast("double") * p,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for c in centroids
    ]


def ivf_cell_col(vec, centroids: np.ndarray):
    """1-based nearest-centroid id: argmax of the centroid dot products
    (centroids are unit vectors, so max dot == max cosine)."""
    dots = F.array(*_cell_dots(vec, centroids))
    return F.array_position(dots, F.array_max(dots)).cast("int")


def _bcast_matrix(df: DataFrame, m: np.ndarray):
    """Ship the centroid/plane matrix to executors ONCE via a Spark
    broadcast (capturing it raw would re-serialize it into every task)."""
    return df.sparkSession.sparkContext.broadcast(
        np.ascontiguousarray(m, dtype=np.float64)
    )


def ivf_cell_udf(embeddings: DataFrame, vec_col: str, centroids: np.ndarray):
    """Scale path for cell assignment: one float64 BLAS matmul per Arrow
    batch against the broadcast centroid matrix; argmax tie-break =
    first (lowest) cell index, identical to the expression path's
    array_position-of-max."""
    bc = _bcast_matrix(embeddings, centroids)

    @F.pandas_udf("int")
    def cell_of(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        return pd.Series((m @ bc.value.T).argmax(axis=1) + 1, dtype="int32")

    return cell_of(F.col(vec_col))


def ivf_probe_cells_udf(
    embeddings: DataFrame, vec_col: str, centroids: np.ndarray, n_probe: int
):
    """Top-``n_probe`` cells per probe on the scale path; stable argsort
    on -dot keeps the (dot DESC, cell ASC) order of the expression path."""
    bc = _bcast_matrix(embeddings, centroids)

    @F.pandas_udf("array<int>")
    def cells_of(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        order = np.argsort(-(m @ bc.value.T), axis=1, kind="stable")
        return pd.Series(list((order[:, :n_probe] + 1).astype(np.int32)))

    return cells_of(F.col(vec_col))


def lsh_signature_udf(embeddings: DataFrame, vec_col: str, planes: np.ndarray):
    """Scale path for LSH signatures: sign bits of one matmul packed to
    a long (bit i set iff projection on plane i >= 0 — the same
    convention as lsh_signature_col)."""
    bc = _bcast_matrix(embeddings, planes)
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))

    @F.pandas_udf("long")
    def sig_of(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        bits = (m @ bc.value.T) >= 0
        return pd.Series(bits @ weights, dtype="int64")

    return sig_of(F.col(vec_col))


def banded_signature_udf(
    embeddings: DataFrame, vec_col: str, planes: np.ndarray, n_bands: int
):
    """All band signatures in one Arrow UDF: a single (batch x dim) @
    (dim x n_planes) matmul, bits reshaped (n, n_bands, per) and packed
    per band — value-identical to banded_signature_exprs and to calling
    lsh_signature_udf per band slice, at 1/n_bands the Python-worker
    cost. Null vectors yield a null signature array (the equality join
    drops them, matching the expr path's null semantics)."""
    bc = _bcast_matrix(embeddings, planes)
    n_planes = planes.shape[0]
    per = n_planes // n_bands
    weights = 1 << np.arange(per, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def sigs_of(v: pd.Series) -> pd.Series:
        out = [None] * len(v)
        vals = v.to_numpy()
        idx = [i for i, x in enumerate(vals) if x is not None]
        if idx:
            m = np.stack([vals[i] for i in idx]).astype(np.float64)
            bits = (m @ bc.value.T) >= 0
            sigs = bits.reshape(len(idx), n_bands, per) @ weights
            for j, i in enumerate(idx):
                out[i] = sigs[j].tolist()
        return pd.Series(out)

    return sigs_of(F.col(vec_col))


def ivf_ann_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    strategy: str = "auto",
) -> DataFrame:
    """IVF approximate top-k: the corpus is inverted into coarse cells
    (nearest deterministic centroid); each probe visits its ``n_probe``
    closest cells and reranks those cells' vectors by exact cosine —
    the classic IVF-Flat plan. At 10^9+ vectors the cell column is the
    partition key, so a query touches n_probe/n_cells of the data.
    Same output schema as cosine_topk/lsh_ann_topk.

    ``strategy``: "expr" (literal centroid expressions, whole-stage
    codegen — small configs), "udf" (broadcast matrix + Arrow-batched
    matmul — production n_cells x dim), or "auto" (by literal count)."""
    cents = ivf_centroids(dim, n_cells)
    if strategy == "auto":
        strategy = "expr" if cents.size <= EXPR_LITERAL_LIMIT else "udf"
    if strategy == "udf":
        cell = ivf_cell_udf(embeddings, vec_col, cents)
        probe_cells = ivf_probe_cells_udf(embeddings, vec_col, cents, n_probe)
    else:
        cell = ivf_cell_col(F.col(vec_col), cents)
        # probe side: top-n_probe cells by (dot DESC, cell ASC)
        dots = _cell_dots(F.col(vec_col), cents)
        cells_ranked = F.array_sort(
            F.array(*[
                F.struct((-d).alias("nd"), F.lit(i + 1).alias("i"))
                for i, d in enumerate(dots)
            ])
        )
        probe_cells = F.transform(
            F.slice(cells_ranked, 1, n_probe), lambda s: s["i"]
        )
    tagged = embeddings.withColumn("cell", cell)
    probes = embeddings.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("emb_a"),
        F.explode(probe_cells).alias("cell"),
    )
    corpus = tagged.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("emb_b"), "cell"
    )
    cand = (
        F.broadcast(probes)
        .join(corpus, "cell")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .dropDuplicates(["probe_id", "neighbor_id"])
    )
    scored = with_cosine(cand).withColumn(
        "cosine_x1e4", F.round(F.col("cosine") * 10000).cast("long")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine_x1e4"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine_x1e4", "rank")
    )


def lsh_ann_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """Approximate top-k: candidates limited to vectors sharing the
    probe's LSH signature (plus 1-bit-flip neighbor buckets for
    recall), exact cosine on candidates. Same output schema as
    cosine_topk. ``strategy`` as in ivf_ann_topk."""
    if dim is None:
        # sniff from a NON-NULL row: .first() landing on a null vector
        # must not degenerate the whole table to an empty result
        row = embeddings.select(vec_col).filter(
            F.col(vec_col).isNotNull()
        ).first()
        if row is None or row[0] is None:  # empty frame / null probe
            return embeddings.sparkSession.createDataFrame(
                [],
                "probe_id long, neighbor_id long, cosine_x1e4 long, rank int",
            )
        dim = len(row[0])
    planes = _hyperplanes(dim, n_planes)
    if strategy == "auto":
        strategy = "expr" if planes.size <= EXPR_LITERAL_LIMIT else "udf"
    if strategy == "udf":
        sig = lsh_signature_udf(embeddings, vec_col, planes)
    else:
        sig = lsh_signature_col(F.col(vec_col), planes)
    tagged = embeddings.withColumn("sig", sig)
    probes = tagged.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("emb_a"),
        F.explode(
            F.array(F.col("sig"), *[
                F.col("sig").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)
            ])
        ).alias("sig"),
    )
    corpus = tagged.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("emb_b"), "sig"
    )
    cand = (
        F.broadcast(probes)
        .join(corpus, "sig")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .dropDuplicates(["probe_id", "neighbor_id"])
    )
    scored = with_cosine(cand).withColumn(
        "cosine_x1e4", F.round(F.col("cosine") * 10000).cast("long")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine_x1e4"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine_x1e4", "rank")
    )


def banded_signature_exprs(vec, planes: np.ndarray, n_bands: int) -> list:
    """Split ``planes`` into ``n_bands`` contiguous slices and pack each
    slice's sign bits into its own long (bit i = plane i WITHIN the
    band, the lsh_signature_col convention)."""
    per = planes.shape[0] // n_bands
    return [
        lsh_signature_col(vec, planes[j * per:(j + 1) * per])
        for j in range(n_bands)
    ]


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.45,
    n_planes: int = 16,
    n_bands: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs over a corpus embedding
    table — the vector-space member of the dedup family (exact hash /
    n-gram Jaccard / MinHash / SimHash in textops, decoded-feature
    near-dup in multimodal).

    Banded sign-random-projection LSH: ``n_planes`` sign bits split
    into ``n_bands`` bands; two vectors are candidates iff ANY band's
    packed bits agree (the MinHash band trick transplanted to SRP, so
    recall at a given cosine is 1-(1-p^r)^b with p = 1-acos(c)/pi).
    Exact cosine (float64, fixed fold order — with_cosine) runs on
    candidates only, and a pair qualifies when round(cosine*1e4) >=
    round(threshold*1e4): the integer comparison keeps the threshold
    boundary engine-stable for the DuckDB oracle.

    Scale shape: candidate generation is ONE equality-keyed self-join
    on the exploded (band_idx, band_sig) key — never an all-pairs
    cross join. Band width (n_planes/n_bands) is the knob that trades
    candidate rate for recall as the corpus grows: at 10^9 vectors and
    near-dup thresholds (>= 0.9) you widen bands to 16-32 bits so a
    bucket holds only true near-neighbors; the defaults here are sized
    for the synthetic gate corpus, whose most-similar pairs sit near
    cosine 0.5. Signatures come from column expressions below
    EXPR_LITERAL_LIMIT literals, else from the Arrow-batched matmul UDF
    (both use the >= 0 sign convention, so the plans are equivalent).

    Returns (vec_id_a, vec_id_b, cosine_x1e4) with vec_id_a < vec_id_b.
    """
    if n_planes % n_bands:
        raise ValueError("n_bands must divide n_planes")
    if dim is None:
        # sniff from a NON-NULL row: .first() landing on a null vector
        # must not degenerate the whole table to an empty result
        row = embeddings.select(vec_col).filter(
            F.col(vec_col).isNotNull()
        ).first()
        if row is None or row[0] is None:
            return embeddings.sparkSession.createDataFrame(
                [], "vec_id_a long, vec_id_b long, cosine_x1e4 long"
            )
        dim = len(row[0])
    planes = _hyperplanes(dim, n_planes)
    if strategy == "auto":
        strategy = "expr" if planes.size <= EXPR_LITERAL_LIMIT else "udf"
    if strategy == "udf":
        # ONE Arrow UDF evaluation and ONE matmul per batch, all bands
        # sliced from the same bit matrix — n_bands separate per-band
        # UDFs would pay the Python-worker + BLAS cost n_bands times on
        # exactly the path that only runs at scale
        bands_col = banded_signature_udf(embeddings, vec_col, planes, n_bands)
    else:
        bands_col = F.array(
            *banded_signature_exprs(F.col(vec_col), planes, n_bands)
        )
    tagged = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.posexplode(bands_col).alias("band_idx", "band_sig"),
    )
    a, b = tagged.alias("a"), tagged.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("vec_id_a"),
            F.col("b.vid").alias("vec_id_b"),
            F.col("a.vec").alias("emb_a"),
            F.col("b.vec").alias("emb_b"),
        )
        .dropDuplicates(["vec_id_a", "vec_id_b"])
    )
    scored = with_cosine(cand).withColumn(
        "cosine_x1e4", F.round(F.col("cosine") * 10000).cast("long")
    )
    return scored.filter(
        F.col("cosine_x1e4") >= int(round(threshold * 10000))
    ).select("vec_id_a", "vec_id_b", "cosine_x1e4")
