"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force cosine top-k, pure Spark SQL
  (``F.zip_with`` + ``F.aggregate`` run JVM-side inside codegen; no
  Python in the hot path). The exactness baseline.
- :func:`lsh_bucket_topk` — random-hyperplane LSH variant: a seeded,
  deterministic plane matrix (numpy) produces a b-bit signature per
  vector inside one Arrow-batched pandas UDF (a single matmul per
  batch); candidates = vectors whose signature matches the query's in
  at least one band; exact cosine re-rank on candidates only. The
  100 TB scale path: the full scan is replaced by an equi-join on band
  keys against a pre-computed (and persistable) signature table.
- :func:`embedding_near_dups` — all-pairs near-duplicate detection by
  cosine >= threshold, LSH-bucketed to avoid the cross join.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = [
    "cosine_topk",
    "lsh_signatures",
    "lsh_bucket_topk",
    "embedding_near_dups",
    "ivf_assign",
    "ivf_topk",
    "ivf_quantize",
    "ivf_quantized_topk",
    "pq_train",
    "pq_encode",
    "pq_topk",
    "ivf_pq_topk",
    "semdedup",
]


def _cosine_parts(vec_col, qvec: Sequence[float]):
    """(dot, ||a||, ||q||) vs a literal query vector, JVM-side, in
    double precision — the one place the cosine expression is built so
    the strict and zero-norm-safe variants can't drift apart."""
    q = F.array(*[F.lit(float(x)) for x in qvec])
    dot = F.aggregate(
        F.zip_with(vec_col, q, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    nq = float(np.sqrt(np.sum(np.asarray(qvec, dtype=np.float64) ** 2)))
    return dot, na, nq


def _cosine_col(vec_col, qvec: Sequence[float]):
    """Cosine similarity column: dot / (||a|| * ||q||)."""
    dot, na, nq = _cosine_parts(vec_col, qvec)
    return dot / (na * F.lit(nq))


def _cosine_col_safe(vec_col, qvec: Sequence[float]):
    """:func:`_cosine_col` tolerant of zero-norm vectors: NULL instead
    of an ANSI divide-by-zero (callers coalesce to their sentinel).
    Kept separate so the exact gates keep the strict expression."""
    dot, na, nq = _cosine_parts(vec_col, qvec)
    return F.try_divide(dot, na * F.lit(nq))


def cosine_topk(
    df: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k: (id, cos) ordered desc, id asc."""
    return (
        df.select(
            F.col(id_col).alias("vec_id"),
            _cosine_col(F.col(vec_col), qvec).alias("_raw"),
        )
        .orderBy(F.col("_raw").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", F.round("_raw", 6).alias("cos"))
    )


def _plane_matrix(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((dim, n_bits)).astype(np.float32)


def lsh_signatures(
    df: DataFrame,
    dim: int,
    n_bits: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, sig int) random-hyperplane signature; one matmul per batch."""
    planes = _plane_matrix(dim, n_bits, seed)

    @F.pandas_udf(T.IntegerType())
    def sig_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            mat = np.stack(s.values).astype(np.float32)  # (batch, dim)
            bits = (mat @ planes) > 0  # (batch, n_bits)
            vals = np.zeros(len(s), dtype=np.int32)
            for j in range(planes.shape[1]):
                vals = (vals << 1) | bits[:, j].astype(np.int32)
            yield pd.Series(vals)

    return df.select(F.col(id_col).alias("vec_id"), F.col(vec_col), sig_udf(F.col(vec_col)).alias("sig"))


def lsh_bucket_topk(
    df: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    n_bits: int = 16,
    bands: int = 4,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k: LSH band match → exact cosine re-rank on candidates.

    Approximate (recall measured in tests vs :func:`cosine_topk`); at
    scale the signature table is computed once and reused per query.
    """
    dim = len(qvec)
    assert n_bits % bands == 0
    bits_per_band = n_bits // bands
    sigs = lsh_signatures(df, dim, n_bits=n_bits, seed=seed, vec_col=vec_col, id_col=id_col)
    planes = _plane_matrix(dim, n_bits, seed)
    qbits = (np.asarray(qvec, dtype=np.float32) @ planes) > 0
    qsig = 0
    for j in range(n_bits):
        qsig = (qsig << 1) | int(qbits[j])
    mask = (1 << bits_per_band) - 1
    band_match = None
    for b in range(bands):
        shift = b * bits_per_band
        cond = F.shiftright("sig", shift).bitwiseAND(F.lit(mask)) == ((qsig >> shift) & mask)
        band_match = cond if band_match is None else (band_match | cond)
    cand = sigs.filter(band_match)
    return (
        cand.select("vec_id", _cosine_col(F.col(vec_col), qvec).alias("_raw"))
        .orderBy(F.col("_raw").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", F.round("_raw", 6).alias("cos"))
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    n_bits: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Near-duplicate vector pairs (cos >= threshold), LSH-bucketed.

    Highly similar vectors agree on most hyperplane signs; bucketing on
    8-bit signature bands keeps the self-join from going quadratic.
    """
    sigs = lsh_signatures(df, dim=None or _infer_dim(df, vec_col), n_bits=n_bits, seed=seed, vec_col=vec_col, id_col=id_col)
    bands, bpb = 2, n_bits // 2
    mask = (1 << bpb) - 1
    banded = sigs.select(
        "vec_id",
        vec_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sig", b * bpb).bitwiseAND(F.lit(mask)).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", vec_col, "bk.band", "bk.key")
    a, b_ = banded.alias("a"), banded.alias("b")
    dot = F.aggregate(
        F.zip_with(
            F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda side: F.sqrt(
        F.aggregate(
            F.col(f"{side}.{vec_col}"), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    return (
        a.join(b_, ["band", "key"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(dot / (norm("a") * norm("b")), 6).alias("cos"),
        )
        .distinct()
        .filter(F.col("cos") >= threshold)
    )


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(vec_col).alias("d")).limit(1).collect()
    return int(row[0]["d"]) if row else 0


# --- IVF (inverted-file) ANN -----------------------------------------------


def ivf_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    n_lists: int = 16,
    seed: int = 42,
    sample_fraction: float = 0.2,
    kmeans_iters: int = 5,
    max_train_rows: int = 200_000,
) -> tuple:
    """Train IVF centroids (mini k-means on a deterministic sample) and
    assign every vector to its nearest list.

    The IVF index structure of FAISS-style ANN re-expressed Spark-first:
    centroids live on the driver (tiny), training is numpy over a
    sampled Arrow collect, assignment is one Arrow-batched pandas UDF
    (a single matmul per batch). Returns (assigned_df, centroids) where
    assigned_df = df + ``ivf_list`` column — at scale you'd write it
    partitioned by ``ivf_list`` so probes prune partitions.
    """
    dim = _infer_dim(df, vec_col)
    # cap the driver-side training collect: a bare fraction scales with
    # the table (20% of 10^9 vectors OOMs the driver); k-means quality
    # saturates long before max_train_rows anyway
    sample = np.array(
        df.sample(fraction=sample_fraction, seed=seed)
        .select(vec_col)
        .limit(max_train_rows)
        .toPandas()[vec_col]
        .tolist(),
        dtype=np.float32,
    )
    if len(sample) < n_lists:
        sample = np.array(
            df.select(vec_col).limit(max_train_rows).toPandas()[vec_col].tolist(),
            dtype=np.float32,
        )
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=n_lists, replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(sample @ cent.T, axis=1)  # cosine on unit vectors
        for c in range(n_lists):
            m = sample[assign == c]
            if len(m):
                v = m.mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)

    bc = df.sparkSession.sparkContext.broadcast(cent)

    @F.pandas_udf(T.IntegerType())
    def assign_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        c = bc.value
        for s in it:
            v = np.array(s.tolist(), dtype=np.float32)
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            yield pd.Series(np.argmax(v @ c.T, axis=1).astype(np.int32))

    return df.withColumn("ivf_list", assign_udf(F.col(vec_col))), cent


def ivf_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    qvec: Sequence[float],
    k: int = 10,
    n_probes: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search: probe the n_probes nearest lists, exact cosine
    re-rank inside them. The list filter prunes the scan (partition
    pruning when assigned is written partitioned by ivf_list)."""
    q = np.asarray(qvec, dtype=np.float32)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = np.argsort(-(centroids @ qn))[:n_probes].tolist()
    cand = assigned.filter(F.col("ivf_list").isin([int(p) for p in probes]))
    return (
        cand.select(id_col, _cosine_col(F.col(vec_col), qvec).alias("cos"))
        .withColumn("cos", F.round(F.col("cos"), 6))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_quantize(
    assigned: DataFrame,
    vec_col: str = "embedding",
    confidence: float | None = None,
    seed: int = 42,
    max_sample_rows: int = 200_000,
) -> tuple:
    """Scalar int8 quantization for the IVF lists
    (`codecs/lucene99/Lucene99ScalarQuantizedVectorsFormat.java:34`
    semantics applied to the IVF layout): confidence-interval affine
    bounds over the NORMALIZED component distribution (default ci =
    1 - 1/(dim+1)), codes in [0, 127], one byte per component.

    Bounds are estimated on a row-capped deterministic sample (the
    same driver-budget discipline as the k-means training collect) and
    broadcast; the codes column is produced by one Arrow-batched
    matvec-free UDF. Returns (df + ``qcode: binary``, (lo, hi)). At
    100 TB the qcode column is the one the probes scan — 4× less IO
    than the float32 vectors, which are only touched by the top-R
    refine.
    """
    from lucene_spark.search.hnsw import _quantize_segment

    sample = np.array(
        assigned.sample(fraction=0.2, seed=seed)
        .select(vec_col)
        .limit(max_sample_rows)
        .toPandas()[vec_col]
        .tolist(),
        dtype=np.float32,
    )
    if not len(sample):
        sample = np.array(
            assigned.select(vec_col).limit(max_sample_rows).toPandas()[vec_col].tolist(),
            dtype=np.float32,
        )
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    _, lo, hi = _quantize_segment(sample, confidence)
    delta = (hi - lo) / 127.0

    @F.pandas_udf(T.BinaryType())
    def code_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            v = np.array(s.tolist(), dtype=np.float32)
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            codes = np.clip(np.floor((v - lo) / delta + 0.5), 0, 127).astype(
                np.int8
            )
            yield pd.Series([c.tobytes() for c in codes])

    return assigned.withColumn("qcode", code_udf(F.col(vec_col))), (lo, hi)


def ivf_quantized_topk(
    assigned_q: DataFrame,
    centroids: np.ndarray,
    bounds,
    qvec: Sequence[float],
    k: int = 10,
    n_probes: int = 4,
    refine: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search over int8 codes: probe the nearest lists, rank by the
    QUANTIZED dot product (one int8 matmul per Arrow batch — the scan
    reads the 1-byte codes, not the floats), keep the top ``k*refine``,
    then exact float64 cosine re-rank of those candidates only (the
    float column is touched for ≤ k·refine rows)."""
    lo, hi = bounds
    delta = (hi - lo) / 127.0
    q = np.asarray(qvec, dtype=np.float32)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = np.argsort(-(centroids @ qn))[:n_probes].tolist()
    qcodes = np.clip(np.floor((qn - lo) / delta + 0.5), 0, 127).astype(np.int8)
    # dequantized-query form: score ordering identical to Lucene's
    # int-dot-plus-corrections (see search/hnsw.py quantization notes)
    qd = (lo + qcodes.astype(np.float32) * np.float32(delta)).astype(np.float32)

    @F.pandas_udf(T.FloatType())
    def qscore(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            codes = np.frombuffer(
                b"".join(s.tolist()), dtype=np.int8
            ).reshape(len(s), -1)
            deq = (lo + codes.astype(np.float32) * np.float32(delta))
            yield pd.Series(deq @ qd)

    cand = (
        assigned_q.filter(F.col("ivf_list").isin([int(p) for p in probes]))
        .withColumn("_qs", qscore(F.col("qcode")))
        .orderBy(F.col("_qs").desc(), F.col(id_col).asc())
        .limit(int(k * refine))
    )
    return (
        cand.select(id_col, _cosine_col(F.col(vec_col), qvec).alias("cos"))
        .withColumn("cos", F.round(F.col("cos"), 6))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ)
# ---------------------------------------------------------------------------

def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 32,
    seed: int = 42,
    kmeans_iters: int = 10,
    sample_fraction: float = 0.2,
    max_train_rows: int = 200_000,
) -> np.ndarray:
    """Train product-quantization codebooks (Jegou, Douze, Schmid,
    "Product Quantization for Nearest Neighbor Search", TPAMI 2011 —
    the `PQ{m}` leg of the faiss index-factory strings the sandbox
    codec accepts, `sandbox/codecs/faiss/FaissKnnVectorsFormat.java:59`).

    The dimension is split into ``m`` contiguous subspaces; each
    subspace gets its own ``ksub``-centroid k-means codebook trained
    on a deterministic row-capped sample (the same driver-budget
    discipline as :func:`ivf_assign`'s coarse training). Vectors are
    L2-normalized first, so the quantized inner product approximates
    cosine. Returns ``codebooks`` of shape (m, ksub, dim // m),
    float32 — a few KB, broadcast to every encode/search task.
    """
    dim = _infer_dim(df, vec_col)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    sample = np.array(
        df.sample(fraction=sample_fraction, seed=seed)
        .select(vec_col)
        .limit(max_train_rows)
        .toPandas()[vec_col]
        .tolist(),
        dtype=np.float32,
    )
    if len(sample) < ksub:
        sample = np.array(
            df.select(vec_col).limit(max_train_rows).toPandas()[vec_col].tolist(),
            dtype=np.float32,
        )
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float32)
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        cent = sub[rng.choice(len(sub), size=min(ksub, len(sub)), replace=False)]
        if len(cent) < ksub:  # degenerate tiny input: repeat rows
            cent = np.resize(cent, (ksub, dsub))
        for _ in range(kmeans_iters):
            # squared-L2 assignment (classic PQ trains in L2 space)
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ksub):
                mask = assign == c
                if mask.any():
                    cent[c] = sub[mask].mean(axis=0)
        books[j] = cent
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Encode every vector to ``m`` one-byte subspace codes.

    One Arrow-batched pandas UDF; per batch the work is m small
    (batch x ksub) distance matrices — no per-row Python. At 100 TB
    the code column is what the probes scan: m bytes per vector
    (dim/ m-fold less IO than float32), while the float column is only
    touched by the final re-rank of <= k*refine rows.
    """
    m, ksub, dsub = codebooks.shape
    if ksub > 256:
        raise ValueError("ksub > 256 does not fit one byte per subspace")
    bc = df.sparkSession.sparkContext.broadcast(codebooks)

    @F.pandas_udf(T.BinaryType())
    def code_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        books = bc.value
        for s in it:
            v = np.array(s.tolist(), dtype=np.float32)
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(v), m), dtype=np.uint8)
            for j in range(m):
                sub = v[:, j * dsub : (j + 1) * dsub]
                cent = books[j]
                # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; row-constant
                # ||x||^2 does not change the argmin
                d2 = (cent**2).sum(axis=1)[None, :] - 2.0 * (sub @ cent.T)
                codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
            yield pd.Series([c.tobytes() for c in codes])

    return df.withColumn(code_col, code_udf(F.col(vec_col)))


def pq_topk(
    coded: DataFrame,
    codebooks: np.ndarray,
    qvec: Sequence[float],
    k: int = 10,
    refine: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes + exact re-rank.

    The query stays float: per subspace, a (ksub,) lookup table of
    ``<q_sub, centroid>`` inner products is built once on the driver
    and broadcast; each vector's approximate cosine is the sum of m
    table lookups (one fancy-index + reduce per Arrow batch). The top
    ``k * refine`` by ADC score are re-ranked with the exact float64
    cosine — only those rows ever read the float column.
    """
    m, ksub, dsub = codebooks.shape
    q = np.asarray(qvec, dtype=np.float32)
    qn = q / max(np.linalg.norm(q), 1e-12)
    # ADC lookup tables: table[j, c] = <q_sub_j, codebook[j][c]>
    tables = np.einsum(
        "jd,jcd->jc", qn.reshape(m, dsub), codebooks.astype(np.float32)
    ).astype(np.float32)
    sc = coded.sparkSession.sparkContext
    bt = sc.broadcast(tables)

    @F.pandas_udf(T.FloatType())
    def adc_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        t = bt.value
        for s in it:
            codes = np.frombuffer(b"".join(s.tolist()), dtype=np.uint8).reshape(
                len(s), m
            )
            yield pd.Series(t[np.arange(m)[None, :], codes].sum(axis=1))

    cand = (
        coded.withColumn("_adc", adc_udf(F.col(code_col)))
        .orderBy(F.col("_adc").desc(), F.col(id_col).asc())
        .limit(int(k * refine))
    )
    return (
        cand.select(id_col, _cosine_col(F.col(vec_col), qvec).alias("cos"))
        .withColumn("cos", F.round(F.col("cos"), 6))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_pq_topk(
    assigned_coded: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    qvec: Sequence[float],
    k: int = 10,
    n_probes: int = 4,
    refine: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """IVF-PQ search (the faiss ``IVF{n},PQ{m}`` factory string): probe
    the ``n_probes`` nearest coarse lists (partition pruning when the
    table is written partitioned by ``ivf_list``), ADC-rank the codes
    inside them, exact re-rank of the top ``k * refine``."""
    q = np.asarray(qvec, dtype=np.float32)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = np.argsort(-(centroids @ qn))[:n_probes].tolist()
    cand = assigned_coded.filter(
        F.col("ivf_list").isin([int(p) for p in probes])
    )
    return pq_topk(
        cand,
        codebooks,
        qvec,
        k=k,
        refine=refine,
        vec_col=vec_col,
        id_col=id_col,
        code_col=code_col,
    )


def semdedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_lists: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): k-means cluster the
    embedding space, compare pairs ONLY within a cluster (semantic
    duplicates land together), connected-component the >= threshold
    pairs, keep one representative (min id) per component.

    Returns (id, cluster_id, keep): ``cluster_id`` is the duplicate
    component's representative (itself for non-duplicates), ``keep``
    marks the row a dedup pass retains. The pairwise leg is an
    equi-join on the cluster id — never all-pairs across the corpus —
    so cost is Σ|cluster|², bounded by raising ``n_lists`` (the paper
    uses ~11k clusters for LAION); the cosine is a JVM HOF, the
    component fold is the same min-label propagation as the text
    near-dup clusters. ``n_lists=1`` degenerates to exact all-pairs
    (the oracle regime; clustering then has no effect on the result,
    only on cost)."""
    from .dedup import duplicate_clusters

    assigned, _ = ivf_assign(
        df.select(id_col, vec_col), vec_col=vec_col, n_lists=n_lists, seed=seed
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    dot = F.aggregate(
        F.zip_with(
            F.col(f"a.{vec_col}"),
            F.col(f"b.{vec_col}"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda side: F.sqrt(
        F.aggregate(
            F.col(f"{side}.{vec_col}"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    pairs = (
        a.join(b, "ivf_list")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            F.round(dot / (norm("a") * norm("b")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b")
    )
    comps = duplicate_clusters(pairs, a_col="vec_a", b_col="vec_b")
    return (
        df.select(F.col(id_col))
        .join(
            comps.select(
                F.col("doc_id").alias(id_col), F.col("cluster_id")
            ),
            id_col,
            "left_outer",
        )
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
            (F.coalesce("cluster_id", F.col(id_col)) == F.col(id_col)).alias(
                "keep"
            ),
        )
    )
