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
import pickle
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

__all__ = ["build_hnsw_segments", "hnsw_topk"]


# --------------------------------------------------------------------------
# in-kernel graph construction (one segment's vectors)


def _search_layer(vecs, neighbors, q, entry_points, ef, level):
    """Best-first beam search on one layer (Algorithm 2 of the paper).

    Returns (ids, sims) of up to ef nearest, sims = dot(normalized)."""
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
    while cand:
        negs, c = heapq.heappop(cand)
        if best and -negs < best[0][0] and len(best) >= ef:
            break
        for nb in neighbors[level].get(c, ()):  # neighbor list of c
            if nb in visited:
                continue
            visited.add(nb)
            s = float(vecs[nb] @ q)
            if len(best) < ef or s > best[0][0]:
                heapq.heappush(cand, (-s, nb))
                heapq.heappush(best, (s, nb))
                if len(best) > ef:
                    heapq.heappop(best)
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


_GRAPH_SCHEMA = T.StructType(
    [
        T.StructField("segment_id", T.LongType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("ids", T.BinaryType(), False),
        T.StructField("vecs", T.BinaryType(), False),
        T.StructField("graph", T.BinaryType(), False),
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
        levels, neighbors, entry, top = _build_graph(
            normed, m, beam_width, seed + seg
        )
        blob = pickle.dumps(
            {
                "levels": levels,
                "neighbors": neighbors,
                "entry": entry,
                "top": top,
            },
            protocol=4,
        )
        return pd.DataFrame(
            [
                {
                    "segment_id": seg,
                    "n": len(ids),
                    "ids": ids.tobytes(),
                    # store RAW vectors; normalization is re-derived at
                    # search time so exact float64 cosine can be
                    # recomputed for final scores
                    "vecs": vecs.tobytes(),
                    "graph": blob,
                }
            ]
        )

    src = emb.select(
        F.col(id_col).cast("long").alias("_id"), F.col(vec_col).alias("_vec")
    ).withColumn("_seg", (F.col("_id") / F.lit(rows_per_segment)).cast("long"))
    return src.groupBy("_seg").applyInPandas(kernel, _GRAPH_SCHEMA)


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
) -> DataFrame:
    """KnnFloatVectorQuery analog: search every segment graph
    (mapInPandas over the graph rows), then merge with one global
    top-k. Final scores are exact float64 cosine of the RAW vectors —
    the same expression as the brute-force path — so the only
    approximation is which candidates the beam visits."""
    ef = max(k, ef if ef is not None else k * 4)
    q64 = np.asarray(list(query_vec), dtype=np.float64)
    qn = np.linalg.norm(q64)
    q32 = (q64 / (qn or 1.0)).astype(np.float32)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for i in range(len(pdf)):
                n = int(pdf["n"].values[i])
                ids = np.frombuffer(bytes(pdf["ids"].values[i]), dtype=np.int64)
                raw = np.frombuffer(
                    bytes(pdf["vecs"].values[i]), dtype=np.float32
                ).reshape(n, -1)
                g = pickle.loads(bytes(pdf["graph"].values[i]))
                nrm = np.linalg.norm(raw, axis=1, keepdims=True)
                nrm[nrm == 0] = 1.0
                normed = raw / nrm
                eps = [g["entry"]]
                for level in range(g["top"], 0, -1):
                    got, _ = _search_layer(normed, g["neighbors"], q32, eps, 1, level)
                    eps = got[:1] or eps
                cand, _ = _search_layer(
                    normed, g["neighbors"], q32, eps, ef, 0
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
