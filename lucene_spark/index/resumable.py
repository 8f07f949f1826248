"""Resumable bulk index build: batched commits + lineage manifest.

The north-rule requirement: builds at 10^12-document scale must be
resumable from checkpoints with per-partition lineage manifests. The
Spark shape (mirroring `IndexWriter.commit`'s two-phase segments_N
protocol, `index/IndexWriter.java:181-186,277-284`):

- the docID space is split into **batches** (contiguous segment
  ranges); each batch is indexed by one Spark job and written to
  ``<dir>/blocks/batch=<id>/`` (parquet, partitioned directory);
- after a batch lands, the **manifest** (`manifest.json`) is rewritten
  atomically (tmp + rename) recording per-batch lineage: doc range,
  row counts, stats, payload bytes, wall time, and completion marker —
  the analog of a segments_N commit point plus per-partition lineage
  rows;
- on restart, completed batches are skipped (their lineage rows are
  trusted; the parquet is already durable) and indexing resumes at the
  first incomplete batch. Because docIDs are deterministic functions
  of the data, a re-run of a half-written batch overwrites it
  idempotently (dynamic partition overwrite of that batch directory).

The final index is byte-equivalent to a single-shot build: blocks are
per (segment, term) and segments never span batches.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_spark.index.builder import InvertedIndex, NORMS_TERM

__all__ = ["resumable_build", "load_resumable"]


def _read_manifest(index_dir: str) -> dict:
    p = os.path.join(index_dir, "manifest.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"format": "lucene_spark.resumable.v1", "batches": {}}


def _write_manifest(index_dir: str, manifest: dict) -> None:
    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, "_manifest.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, "manifest.json"))  # atomic commit


def resumable_build(
    corpus: DataFrame,
    index_dir: str,
    total_docs: int,
    batch_docs: int = 1 << 20,
    docs_per_segment: int = 1 << 14,
    analyzer: str = "simple",
    positions: bool = False,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    on_batch: Optional[Callable[[int, dict], None]] = None,
) -> dict:
    """Index `corpus` into `index_dir` in resumable batches.

    Re-invoking with the same arguments after a crash resumes at the
    first incomplete batch. Returns the final manifest.
    """
    if batch_docs % docs_per_segment:
        raise ValueError("batch_docs must be a multiple of docs_per_segment")
    spark = corpus.sparkSession
    manifest = _read_manifest(index_dir)
    manifest.update(
        {
            "docs_per_segment": docs_per_segment,
            "analyzer": analyzer,
            "has_positions": positions,
            "total_docs": total_docs,
            "batch_docs": batch_docs,
        }
    )
    n_batches = (total_docs + batch_docs - 1) // batch_docs
    blocks_root = os.path.join(index_dir, "blocks")

    for b in range(n_batches):
        key = str(b)
        if manifest["batches"].get(key, {}).get("complete"):
            continue  # resume: batch already durable
        lo, hi = b * batch_docs, min((b + 1) * batch_docs, total_docs)
        t0 = time.time()
        batch_corpus = corpus.filter(
            (F.col(doc_id_col) >= lo) & (F.col(doc_id_col) < hi)
        )
        idx = InvertedIndex.build(
            batch_corpus,
            text_col=text_col,
            doc_id_col=doc_id_col,
            analyzer=analyzer,
            docs_per_segment=docs_per_segment,
            positions=positions,
        )
        # batch directory write; overwrite makes half-written batches
        # idempotent on retry (deterministic docIDs => identical bytes)
        out = os.path.join(blocks_root, f"batch={b}")
        idx.blocks.write.mode("overwrite").parquet(out)
        idx.norms.write.mode("overwrite").parquet(
            os.path.join(index_dir, "norms", f"batch={b}")
        )
        lineage = {
            "complete": True,
            "doc_lo": lo,
            "doc_hi": hi,
            "doc_count": idx.doc_count,
            "sum_total_term_freq": idx.sum_total_term_freq,
            "num_segments": idx.num_segments,
            "num_blocks": idx.metrics.get("num_blocks"),
            "payload_bytes": idx.metrics.get("payload_bytes"),
            "build_secs": round(time.time() - t0, 3),
            "committed_at": time.time(),
        }
        manifest["batches"][key] = lineage
        _write_manifest(index_dir, manifest)  # checkpoint after each batch
        if on_batch:
            on_batch(b, lineage)
    return manifest


def load_resumable(spark: SparkSession, index_dir: str) -> InvertedIndex:
    """Open a resumable-build index for searching (all complete batches)."""
    manifest = _read_manifest(index_dir)
    batches = [b for b, m in manifest["batches"].items() if m.get("complete")]
    if not batches:
        raise ValueError(f"no complete batches in {index_dir}")
    blocks = spark.read.parquet(
        *[os.path.join(index_dir, "blocks", f"batch={b}") for b in batches]
    )
    norms = spark.read.parquet(
        *[os.path.join(index_dir, "norms", f"batch={b}") for b in batches]
    )
    doc_count = sum(m["doc_count"] for m in manifest["batches"].values() if m.get("complete"))
    sttf = sum(
        m["sum_total_term_freq"] for m in manifest["batches"].values() if m.get("complete")
    )
    terms = blocks.groupBy("term").agg(
        F.sum("num_docs").cast("long").alias("doc_freq"),
        F.sum("sum_freq").cast("long").alias("total_term_freq"),
    )
    return InvertedIndex(
        spark=spark,
        blocks=blocks,
        terms=terms,
        norms=norms,
        doc_count=doc_count,
        sum_total_term_freq=sttf,
        docs_per_segment=manifest["docs_per_segment"],
        num_segments=sum(
            m["num_segments"] for m in manifest["batches"].values() if m.get("complete")
        ),
        metrics={"resumable": True, "n_batches": len(batches)},
        has_positions=manifest.get("has_positions", False),
    )
