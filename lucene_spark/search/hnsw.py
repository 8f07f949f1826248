"""Per-segment HNSW graphs for ANN vector search.

Lucene's KNN path builds one HNSW graph PER SEGMENT
(`core/src/java/org/apache/lucene/util/hnsw/HnswGraphBuilder.java`,
persisted by `codecs/lucene99/Lucene99HnswVectorsWriter.java`) and
`KnnFloatVectorQuery` searches every segment's graph, merging the
per-segment top-k. That is exactly the Spark-shaped decomposition:

- **build** = one `applyInPandas` kernel per segment (bounded rows per
  graph, so the O(n·log n·M·ef) insert loop stays cache-local and the
  build parallelizes across segments with no shuffle beyond the
  segment grouping);
- **search** = `mapInPandas` over the (few, small) serialized graph
  rows producing per-segment candidates, then ONE global
  TakeOrderedAndProject merge — identical to Lucene's per-leaf search
  + `TopDocs.merge`.

The graph algorithm is the published HNSW construction (Malkov &
Yashunin, "Efficient and robust approximate nearest neighbor search
using Hierarchical Navigable Small World graphs", 2016), with Lucene's
parameter conventions: ``m`` connections per node on upper levels and
``2m`` on level 0, ``beam_width`` (efConstruction) candidates during
insert, level assignment ``floor(-ln(U) · mL)`` with ``mL = 1/ln(m)``,
and the diversity neighbor-selection heuristic
(`HnswGraphBuilder.java` `findWorstNonDiverse`): a candidate joins the
neighbor list only if it is closer to the new node than to every
already-selected neighbor.

Similarity is cosine, traversed in float32 over pre-normalized vectors
(dot product); final scores are recomputed with the same float64
expression as :func:`lucene_spark.pipeline.similarity.cosine_topk`, so
with a generous ``ef`` the result is value-identical to the
brute-force oracle (recall is property-tested; exactness at small n is
gate-tested).

Randomness is derived deterministically from (seed, segment, ordinal)
so builds are reproducible across runs and partition layouts.
"""

from __future__ import annotations

import math
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

__all__ = ["build_hnsw_segments", "hnsw_topk"]


# --------------------------------------------------------------------------
# in-kernel graph construction (one segment's vectors)


def _search_layer(vecs, neighbors, q, entry_points, ef, level,
                  patience=None, stats=None):
    """Best-first beam search on one layer (Algorithm 2 of the paper).

    Returns (ids, sims) of up to ef nearest, sims = dot(normalized).

    ``patience`` enables the PatienceKnnVectorQuery analog
    (`search/PatienceKnnVectorQuery.java` /
    `HnswQueueSaturationCollector.java`): after that many CONSECUTIVE
    candidate expansions in which the result queue saturates (no
    update), the search stops early.  ``stats`` (a dict) receives
    ``visited`` / ``saturated`` counters for instrumentation.
    """
    import heapq

    visited = set(entry_points)
    # max-heap of candidates by sim (store negative for heapq min-heap)
    cand = [(-float(vecs[e] @ q), e) for e in entry_points]
    heapq.heapify(cand)
    # min-heap of current best ef results
    best = [(float(vecs[e] @ q), e) for e in entry_points]
    heapq.heapify(best)
    while len(best) > ef:
        heapq.heappop(best)
    stale = 0
    while cand:
        negs, c = heapq.heappop(cand)
        if best and -negs < best[0][0] and len(best) >= ef:
            break
        updated = False
        for nb in neighbors[level].get(c, ()):  # neighbor list of c
            if nb in visited:
                continue
            visited.add(nb)
            s = float(vecs[nb] @ q)
            if len(best) < ef or s > best[0][0]:
                heapq.heappush(cand, (-s, nb))
                heapq.heappush(best, (s, nb))
                updated = True
                if len(best) > ef:
                    heapq.heappop(best)
        if patience is not None:
            stale = 0 if updated else stale + 1
            if stale >= patience:
                if stats is not None:
                    stats["saturated"] = stats.get("saturated", 0) + 1
                break
    if stats is not None:
        stats["visited"] = stats.get("visited", 0) + len(visited)
    out = sorted(best, reverse=True)
    return [i for _, i in out], [s for s, _ in out]


def _select_diverse(vecs, node, cand_ids, cand_sims, m):
    """Diversity heuristic (`HnswGraphBuilder` neighbor selection): keep
    a candidate only if it is closer to `node` than to every
    already-kept neighbor; stop at m."""
    kept: List[int] = []
    for cid, csim in zip(cand_ids, cand_sims):
        ok = True
        for kid in kept:
            if float(vecs[cid] @ vecs[kid]) > csim:
                ok = False
                break
        if ok:
            kept.append(cid)
            if len(kept) >= m:
                break
    return kept


def _build_graph(vecs: np.ndarray, m: int, beam_width: int, seed: int):
    """Insert all rows (paper Algorithm 1). vecs are L2-normalized
    float32; returns (levels, neighbors, entry, top_level)."""
    n = len(vecs)
    ml = 1.0 if m == 1 else 1.0 / math.log(m)
    rng = np.random.default_rng(seed)
    levels = np.floor(-np.log(rng.random(n)) * ml).astype(np.int64)
    max_level = int(levels.max()) if n else 0
    # neighbors[level][node] -> list of node ids
    neighbors = [dict() for _ in range(max_level + 1)]
    entry, top = 0, int(levels[0])
    for i in range(1, n):
        q = vecs[i]
        lvl = int(levels[i])
        eps = [entry]
        # zoom down through levels above lvl with greedy (ef=1) search
        for level in range(top, lvl, -1):
            ids, _ = _search_layer(vecs, neighbors, q, eps, 1, level)
            eps = ids[:1] or eps
        # insert on levels min(top, lvl)..0 with beam search
        for level in range(min(top, lvl), -1, -1):
            max_conn = m * 2 if level == 0 else m
            ids, sims = _search_layer(vecs, neighbors, q, eps, beam_width, level)
            sel = _select_diverse(vecs, i, ids, sims, m)
            lv = neighbors[level]
            lv[i] = list(sel)
            for s_id in sel:
                lst = lv.setdefault(s_id, [])
                lst.append(i)
                if len(lst) > max_conn:
                    # re-select a diverse max_conn subset for the
                    # overflowing node (the builder's shrink step)
                    sims_b = [float(vecs[x] @ vecs[s_id]) for x in lst]
                    order = np.argsort(sims_b)[::-1]
                    lv[s_id] = _select_diverse(
                        vecs,
                        s_id,
                        [lst[o] for o in order],
                        [sims_b[o] for o in order],
                        max_conn,
                    )
            eps = ids or eps
        if lvl > top:
            entry, top = i, lvl
    return levels, neighbors, entry, top


_GRAPH_MAGIC = 0x48475331  # "HGS1" — packed-HNSW-graph format tag


def _pack_graph(neighbors, entry: int, top: int) -> bytes:
    """Serialize the per-level adjacency as typed int32 CSR arrays.

    Layout (little-endian int32 throughout):
      [top, entry, n_levels] then per level:
      [n_nodes] node_ids[n_nodes] indptr[n_nodes+1] flat[indptr[-1]]

    A plain-binary format like the posting blocks: loading an index
    directory from an untrusted source stays data, not code (pickle
    here would be an arbitrary-code-execution hole). A leading magic
    word tags the format so a blob from any other serialization
    (e.g. the removed pickle layout) fails fast instead of being
    silently misparsed into a garbage graph."""
    parts = [np.array([_GRAPH_MAGIC, top, entry, len(neighbors)], dtype=np.int32)]
    for lv in neighbors:
        node_ids = np.fromiter(lv.keys(), dtype=np.int32, count=len(lv))
        counts = np.fromiter(
            (len(v) for v in lv.values()), dtype=np.int32, count=len(lv)
        )
        indptr = np.zeros(len(lv) + 1, dtype=np.int32)
        np.cumsum(counts, out=indptr[1:])
        flat = (
            np.concatenate([np.asarray(v, dtype=np.int32) for v in lv.values()])
            if len(lv)
            else np.empty(0, dtype=np.int32)
        )
        parts += [np.array([len(lv)], dtype=np.int32), node_ids, indptr, flat]
    return b"".join(p.tobytes() for p in parts)


def _unpack_graph(blob: bytes):
    """Inverse of :func:`_pack_graph` → (neighbors, entry, top)."""
    a = np.frombuffer(blob, dtype=np.int32)
    if len(a) < 4 or int(a[0]) != _GRAPH_MAGIC:
        raise ValueError(
            "not a packed HNSW graph (bad magic): the row was written "
            "by an incompatible serialization — rebuild the graph "
            "segments with build_hnsw_segments()"
        )
    top, entry, n_levels = int(a[1]), int(a[2]), int(a[3])
    off = 4
    neighbors = []
    for _ in range(n_levels):
        n_nodes = int(a[off]); off += 1
        node_ids = a[off : off + n_nodes]; off += n_nodes
        indptr = a[off : off + n_nodes + 1]; off += n_nodes + 1
        total = int(indptr[-1]) if n_nodes else 0
        flat = a[off : off + total]; off += total
        neighbors.append(
            {
                int(node_ids[i]): flat[indptr[i] : indptr[i + 1]]
                for i in range(n_nodes)
            }
        )
    return neighbors, entry, top


# --- scalar quantization (round 4) -----------------------------------------
#
# `Lucene99ScalarQuantizedVectorsFormat.java:34` semantics: per-segment
# affine int8 quantization of the (cosine: pre-normalized) vectors with
# a confidence-interval clip — quantiles at (1±ci)/2 over all component
# values, default ci = 1 - 1/(dim+1) — codes in [0, 127], so traversal
# storage is 1 byte/dim instead of 4 (plus the two float64 bounds per
# segment). Lucene evaluates similarity as an integer dot product plus
# per-vector correction constants; algebraically that equals the dot
# product of the DEQUANTIZED vectors (x̂ = lo + δ·code, δ = (hi-lo)/127)
# — the kernel reconstructs x̂ once per batch (vectorized) and reuses
# the float32 traversal path, like Lucene's SIMD widening of int8
# lanes. Raw float32 vectors stay in the row (Lucene keeps .vec on
# disk alongside .veq) for the exact float64 re-rank of the ef
# candidates, so top-k VALUES are exact whenever ef covers the true
# neighbors — only the traversal is quantized.


def _quantize_segment(normed: np.ndarray, confidence: Optional[float]):
    """→ (codes uint8∈[0,127] as int8 bytes-compatible array, lo, hi)."""
    d = normed.shape[1]
    ci = confidence if confidence is not None else 1.0 - 1.0 / (d + 1)
    vals = normed.ravel()
    lo = float(np.quantile(vals, (1.0 - ci) / 2.0))
    hi = float(np.quantile(vals, 1.0 - (1.0 - ci) / 2.0))
    if hi <= lo:  # degenerate (constant components): one bucket
        hi = lo + 1e-6
    delta = (hi - lo) / 127.0
    codes = np.clip(np.floor((normed - lo) / delta + 0.5), 0, 127)
    return codes.astype(np.int8), lo, hi


def _dequantize(codes: np.ndarray, lo: float, hi: float) -> np.ndarray:
    delta = (hi - lo) / 127.0
    return (lo + codes.astype(np.float32) * np.float32(delta)).astype(np.float32)


_GRAPH_SCHEMA = T.StructType(
    [
        T.StructField("segment_id", T.LongType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("ids", T.BinaryType(), False),
        T.StructField("vecs", T.BinaryType(), False),
        T.StructField("graph", T.BinaryType(), False),
    ]
)

# quantized variant: int8 codes replace float32 vecs for traversal;
# raw vecs retained for exact re-rank (see _quantize_segment)
_GRAPH_SCHEMA_Q = T.StructType(
    _GRAPH_SCHEMA.fields
    + [
        T.StructField("qvecs", T.BinaryType(), False),
        T.StructField("q_lo", T.DoubleType(), False),
        T.StructField("q_hi", T.DoubleType(), False),
    ]
)


def build_hnsw_segments(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rows_per_segment: int = 1 << 17,
    m: int = 16,
    beam_width: int = 100,
    seed: int = 42,
    quantize: bool = False,
    confidence: Optional[float] = None,
) -> DataFrame:
    """One HNSW graph per id-range segment → DataFrame of serialized
    graph rows (persistable as parquet like posting blocks). The
    segment bound caps graph memory and insert time; at 100 TB the
    graphs build in parallel, one kernel call each, exactly like the
    posting-block kernels."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["_id"].values, kind="stable")
        ids = pdf["_id"].values[order].astype(np.int64)
        vecs = np.stack(pdf["_vec"].values[order]).astype(np.float32)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        normed = vecs / norms
        seg = int(pdf["_seg"].iloc[0])
        row = {
            "segment_id": seg,
            "n": len(ids),
            "ids": ids.tobytes(),
            # store RAW vectors; normalization is re-derived at
            # search time so exact float64 cosine can be
            # recomputed for final scores
            "vecs": vecs.tobytes(),
        }
        if quantize:
            codes, lo, hi = _quantize_segment(normed, confidence)
            # graph edges chosen under the SAME similarity the search
            # traverses (the quantized one), as Lucene's quantized
            # HNSW writer builds the graph over quantized scores
            traverse = _dequantize(codes, lo, hi)
            row.update(qvecs=codes.tobytes(), q_lo=lo, q_hi=hi)
        else:
            traverse = normed
        levels, neighbors, entry, top = _build_graph(
            traverse, m, beam_width, seed + seg
        )
        row["graph"] = _pack_graph(neighbors, entry, top)
        return pd.DataFrame([row])

    src = emb.select(
        F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_vec")
    ).withColumn("_seg", (F.col("_id") / F.lit(rows_per_segment)).cast("long"))
    return src.groupBy("_seg").applyInPandas(
        kernel, _GRAPH_SCHEMA_Q if quantize else _GRAPH_SCHEMA
    )


_TOPK_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("cos", T.DoubleType(), False),
    ]
)


def hnsw_topk(
    graphs: DataFrame,
    query_vec,
    k: int = 10,
    ef: Optional[int] = None,
    seed_ids=None,
    patience: Optional[int] = None,
) -> DataFrame:
    """KnnFloatVectorQuery analog: search every segment graph
    (mapInPandas over the graph rows), then merge with one global
    top-k. Final scores are exact float64 cosine of the RAW vectors —
    the same expression as the brute-force path — so the only
    approximation is which candidates the beam visits.

    ``seed_ids`` — SeededKnnVectorQuery (`core/search/
    SeededKnnVectorQuery.java:36`): vec_ids from a seed query become
    the layer-0 entry points in the segments that contain them,
    skipping the hierarchy descent (the reference's seeded entry
    points from `seedWeight`); segments with no seed fall back to the
    normal descent.  The seed set is k-bounded and ships in the task
    closure — no extra job or shuffle.

    ``patience`` — PatienceKnnVectorQuery analog: early-terminate each
    segment beam after that many consecutive saturated expansions (see
    :func:`_search_layer`).
    """
    ef = max(k, ef if ef is not None else k * 4)
    seed_set = frozenset(int(x) for x in seed_ids) if seed_ids is not None else None
    q64 = np.asarray(list(query_vec), dtype=np.float64)
    qn = np.linalg.norm(q64)
    q32 = (q64 / (qn or 1.0)).astype(np.float32)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            quantized = "qvecs" in pdf.columns
            outs = []
            for i in range(len(pdf)):
                n = int(pdf["n"].values[i])
                ids = np.frombuffer(bytes(pdf["ids"].values[i]), dtype=np.int64)
                raw = np.frombuffer(
                    bytes(pdf["vecs"].values[i]), dtype=np.float32
                ).reshape(n, -1)
                nbrs, entry, top = _unpack_graph(bytes(pdf["graph"].values[i]))
                if quantized:
                    lo = float(pdf["q_lo"].values[i])
                    hi = float(pdf["q_hi"].values[i])
                    codes = np.frombuffer(
                        bytes(pdf["qvecs"].values[i]), dtype=np.int8
                    ).reshape(n, -1)
                    normed = _dequantize(codes, lo, hi)
                    # the query is quantized with the segment's bounds
                    # too (Lucene99ScalarQuantizedVectorsScorer
                    # quantizes the query per-segment)
                    qcodes = np.clip(
                        np.floor((q32 - lo) / ((hi - lo) / 127.0) + 0.5),
                        0,
                        127,
                    ).astype(np.int8)
                    qt = _dequantize(qcodes, lo, hi)
                else:
                    nrm = np.linalg.norm(raw, axis=1, keepdims=True)
                    nrm[nrm == 0] = 1.0
                    normed = raw / nrm
                    qt = q32
                eps = None
                if seed_set is not None:
                    local = np.nonzero(
                        np.isin(ids, np.fromiter(seed_set, dtype=np.int64))
                    )[0].tolist()
                    if local:
                        eps = local  # seeded entry: skip the descent
                if eps is None:
                    eps = [entry]
                    for level in range(top, 0, -1):
                        got, _ = _search_layer(normed, nbrs, qt, eps, 1, level)
                        eps = got[:1] or eps
                cand, _ = _search_layer(
                    normed, nbrs, qt, eps, ef, 0, patience=patience
                )
                cand = np.asarray(cand[: max(ef, k)], dtype=np.int64)
                # exact float64 cosine over raw vectors for the merge;
                # zero-norm vectors (or query) score 0, never NaN —
                # Spark orders NaN above every double, which would
                # rank a zero vector first
                v64 = raw[cand].astype(np.float64)
                den = np.linalg.norm(v64, axis=1) * qn
                dots = v64 @ q64
                cos = np.divide(
                    dots, den, out=np.zeros_like(dots), where=den != 0
                )
                outs.append(pd.DataFrame({"vec_id": ids[cand], "cos": cos}))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    per_seg = graphs.mapInPandas(fn, _TOPK_SCHEMA)
    return (
        per_seg.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", F.round("cos", 6).alias("cos"))
    )
