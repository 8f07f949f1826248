"""Distributed inverted-index build: per-segment compressed posting blocks.

Spark-first re-expression of Lucene's write path
(`lucene/core/src/java/org/apache/lucene/index/IndexingChain.java:553-1175`,
`codecs/lucene103/Lucene103PostingsWriter.java:256-432`):

- **docIDs** are dense longs assigned deterministically from the data
  (rank over a stable key), never from partition layout — the Spark
  analog of DWPT arrival order + docBase
  (`index/DocumentsWriterPerThread.java:132`, `index/DocIDMerger.java:32-43`),
  made deterministic so checkpoint-resume is idempotent.
- **segments** are contiguous docID ranges (``segment_id = doc_id //
  docs_per_segment``). One build task produces one segment's posting
  lists — Lucene's "one DWPT flush = one segment". Because segments
  partition the docID space, *heavy terms are automatically split
  across segments* (the heavy-hitter posting-list splitting the north
  rule asks for), and merging never re-sorts: segment doc ranges are
  disjoint and ordered.
- **posting blocks**: per (segment, term), docIDs sorted ascending are
  chunked into 128-doc blocks (`Lucene103PostingsFormat.java:343`),
  delta+FOR-packed; freqs PFor-packed (≤7 exceptions); per-block skip
  metadata (``first_doc``/``max_doc`` = the two-level skip list's
  block pointers, `Lucene103PostingsFormat.java:60-63`) and block-max
  impacts (pareto frontier of (freq↑, norm↓) pairs,
  `codecs/CompetitiveImpactAccumulator.java:27-107`).
- **norms**: one byte per doc = SmallFloat.intToByte4(#surviving tokens)
  (`search/similarities/Similarity.java:153-162`); stored both as a
  columnar norms table and inline per posting (so scoring never joins a
  trillion-row norms table).
- **collection/term statistics** via plain DataFrame aggregations
  (docCount, sumTotalTermFreq, per-term docFreq/totalTermFreq —
  `search/CollectionStatistics.java:27-38`); map-side partial
  aggregation absorbs term skew.

No per-row Python anywhere: tokenization and block encoding run in
Arrow-batched pandas UDFs; everything else is DataFrame expressions.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucene_spark.analysis import standard_analyzer_udf, tokens_simple_col
from lucene_spark.functions.forutil import (
    BLOCK_SIZE,
    delta_encode,
    for_encode,
    pfor_encode,
)
from lucene_spark.functions.smallfloat import int_to_byte4

__all__ = ["InvertedIndex", "assign_doc_ids", "BLOCKS_SCHEMA"]


# One row per (segment, term, block). `docs_packed` is delta+FOR,
# `freqs_packed` is PFor, `norms_raw` is one byte per posting (inline
# norms), impacts are the competitive (freq, norm) pareto frontier.
BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("segment_id", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("block_ord", T.IntegerType(), False),
        T.StructField("num_docs", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("max_doc", T.LongType(), False),
        T.StructField("docs_packed", T.BinaryType(), False),
        T.StructField("freqs_packed", T.BinaryType(), False),
        T.StructField("norms_raw", T.BinaryType(), False),
        T.StructField("impact_freqs", T.ArrayType(T.IntegerType()), False),
        T.StructField("impact_norms", T.ArrayType(T.IntegerType()), False),
        T.StructField("max_freq", T.IntegerType(), False),
    ]
)


def assign_doc_ids(
    df: DataFrame,
    order_cols: List[str],
    bucket_col: Optional[str] = None,
    num_buckets: int = 256,
) -> DataFrame:
    """Deterministic dense docIDs = rank over a stable total order.

    Scalable two-pass pattern: (1) derive a deterministic range bucket
    from the leading order column, (2) per-bucket window rank + global
    prefix-sum of bucket counts (tiny driver-side collect of
    ``num_buckets`` rows). Unlike ``row_number`` over an empty window
    this never funnels the table through one partition, and unlike
    ``monotonically_increasing_id`` the result is independent of
    partition layout (checkpoint/resume-idempotent; SURVEY §7.3.3).
    """
    lead = order_cols[0]
    if bucket_col is None:
        # deterministic equi-width buckets on the leading sort column
        bounds = df.agg(
            F.min(F.col(lead).cast("double")).alias("lo"),
            F.max(F.col(lead).cast("double")).alias("hi"),
        ).collect()[0]
        lo, hi = bounds["lo"], bounds["hi"]
        span = (hi - lo) or 1.0
        bucket = F.least(
            F.lit(num_buckets - 1),
            F.floor((F.col(lead).cast("double") - F.lit(lo)) / F.lit(span) * num_buckets),
        ).cast("long")
        df = df.withColumn("_bucket", bucket)
    else:
        df = df.withColumn("_bucket", F.col(bucket_col).cast("long"))

    counts = {
        r["_bucket"]: r["cnt"]
        for r in df.groupBy("_bucket").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(b), int(o)) for b, o in offsets.items()], "_bucket long, _offset long"
        )
    )
    w = Window.partitionBy("_bucket").orderBy(*[F.col(c) for c in order_cols])
    return (
        df.join(off_df, "_bucket")
        .withColumn("doc_id", F.row_number().over(w) + F.col("_offset") - 1)
        .drop("_bucket", "_offset")
    )


def _encode_term_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel: one (segment, term) group → block rows."""
    seg = int(pdf["segment_id"].iloc[0])
    term = pdf["term"].iloc[0]
    order = np.argsort(pdf["doc_id"].values, kind="stable")
    docs = pdf["doc_id"].values[order].astype(np.int64)
    freqs = pdf["freq"].values[order].astype(np.int64)
    norms = pdf["norm"].values[order].astype(np.uint8)
    rows = []
    for ord_, start in enumerate(range(0, len(docs), BLOCK_SIZE)):
        d = docs[start : start + BLOCK_SIZE]
        f = freqs[start : start + BLOCK_SIZE]
        nb = norms[start : start + BLOCK_SIZE]
        # competitive impacts: pareto frontier of (freq desc, norm asc)
        # — a pair dominates if freq >= and norm <= (CompetitiveImpactAccumulator)
        imp = _pareto_impacts(f, nb)
        rows.append(
            {
                "segment_id": seg,
                "term": term,
                "block_ord": ord_,
                "num_docs": int(len(d)),
                "first_doc": int(d[0]),
                "max_doc": int(d[-1]),
                "docs_packed": for_encode(delta_encode(d)),
                "freqs_packed": pfor_encode(f),
                "norms_raw": nb.tobytes(),
                "impact_freqs": [int(x) for x, _ in imp],
                "impact_norms": [int(y) for _, y in imp],
                "max_freq": int(f.max()),
            }
        )
    return pd.DataFrame(rows)


def _pareto_impacts(freqs: np.ndarray, norms: np.ndarray) -> list:
    """Competitive (freq, norm) pairs: max freq per distinct norm, then
    keep only pairs not dominated by a lower-norm pair with >= freq
    (`codecs/CompetitiveImpactAccumulator.java:65-107`)."""
    df = {}
    for f, n in zip(freqs.tolist(), norms.tolist()):
        if n not in df or f > df[n]:
            df[n] = f
    out, best = [], -1
    for n in sorted(df):
        if df[n] > best:
            out.append((df[n], n))
            best = df[n]
    return out


@dataclass
class InvertedIndex:
    """An index = blocks + terms + norms DataFrames + collection stats.

    The Spark analog of ``SegmentInfos`` + per-segment postings/norms
    files; `save`/`load` persist to parquet with a JSON manifest
    (commit point, `index/IndexWriter.java:181-186,277-284`).
    """

    spark: SparkSession
    blocks: DataFrame
    terms: DataFrame
    norms: DataFrame
    doc_count: int
    sum_total_term_freq: int
    docs_per_segment: int
    num_segments: int
    metrics: dict

    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        text_col: str = "text",
        doc_id_col: str = "doc_id",
        analyzer: str = "simple",
        docs_per_segment: int = 1 << 14,
        shuffle_partitions: Optional[int] = None,
    ) -> "InvertedIndex":
        """Build posting blocks from a corpus DataFrame.

        analyzer='standard' runs the full Lucene-equivalent chain
        (pandas UDF); 'simple' splits on single spaces JVM-side (for
        space-normalized corpora and DuckDB-oracle parity).
        """
        spark = corpus.sparkSession
        t0 = time.time()
        doc_id = F.col(doc_id_col).cast("long").alias("doc_id")

        if analyzer == "standard":
            toks = corpus.select(
                doc_id,
                F.explode(standard_analyzer_udf()(F.col(text_col))).alias("tok"),
            ).select("doc_id", F.col("tok.term").alias("term"))
        elif analyzer == "simple":
            toks = corpus.select(
                doc_id, F.explode(tokens_simple_col(F.col(text_col))).alias("term")
            ).filter(F.col("term") != "")
        else:
            raise ValueError(f"unknown analyzer {analyzer!r}")

        # (doc, term) → freq. Map-side partial agg absorbs term skew;
        # the composite key is skew-free.
        freqs = toks.groupBy("doc_id", "term").agg(
            F.count(F.lit(1)).cast("int").alias("freq")
        )
        freqs = freqs.persist()

        # field length (# surviving tokens) → 1-byte norm
        dl = freqs.groupBy("doc_id").agg(F.sum("freq").cast("long").alias("dl"))

        @F.pandas_udf(T.IntegerType())
        def norm_byte(s: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for batch in s:
                yield pd.Series(
                    int_to_byte4(batch.values.astype(np.int64)).astype(np.int32)
                )

        norms = dl.withColumn("norm", norm_byte(F.col("dl"))).persist()

        stats_row = norms.agg(
            F.count(F.lit(1)).alias("doc_count"), F.sum("dl").alias("sttf")
        ).collect()[0]
        doc_count = int(stats_row["doc_count"])
        sttf = int(stats_row["sttf"] or 0)

        terms = freqs.groupBy("term").agg(
            F.count(F.lit(1)).cast("long").alias("doc_freq"),
            F.sum("freq").cast("long").alias("total_term_freq"),
        )

        # postings with inline norms, grouped per (segment, term)
        pf = (
            freqs.join(norms.select("doc_id", "norm"), "doc_id")
            .withColumn(
                "segment_id", (F.col("doc_id") / F.lit(docs_per_segment)).cast("long")
            )
        )
        blocks = pf.groupBy("segment_id", "term").applyInPandas(
            _encode_term_group, BLOCKS_SCHEMA
        )
        # cache blocks for interactive search sessions
        blocks = blocks.persist()
        n_blocks = blocks.count()  # materialize (also: build-time metric)
        num_segments = (doc_count + docs_per_segment - 1) // docs_per_segment
        build_secs = time.time() - t0
        n_postings = sttf  # one posting per (doc, term) occurrence ≈ sum freq
        metrics = {
            "build_secs": round(build_secs, 3),
            "doc_count": doc_count,
            "num_blocks": int(n_blocks),
            "docs_per_sec": round(doc_count / build_secs, 1) if build_secs else None,
            "postings_per_sec": round(n_postings / build_secs, 1) if build_secs else None,
        }
        freqs.unpersist()
        return cls(
            spark=spark,
            blocks=blocks,
            terms=terms.persist(),
            norms=norms,
            doc_count=doc_count,
            sum_total_term_freq=sttf,
            docs_per_segment=docs_per_segment,
            num_segments=num_segments,
            metrics=metrics,
        )

    # ------------------------------------------------------------------
    def save(self, index_dir: str) -> None:
        """Persist index to parquet + JSON manifest (commit point).

        Blocks are written partitioned-sorted by term so parquet
        row-group min/max statistics give term-seek pruning (the role
        of Lucene's FST term dictionary, SURVEY §2.2).
        """
        (
            self.blocks.repartition(
                max(self.spark.sparkContext.defaultParallelism, 4), "term"
            )
            .sortWithinPartitions("term", "segment_id", "block_ord")
            .write.mode("overwrite")
            .parquet(os.path.join(index_dir, "blocks"))
        )
        self.terms.write.mode("overwrite").parquet(os.path.join(index_dir, "terms"))
        self.norms.write.mode("overwrite").parquet(os.path.join(index_dir, "norms"))
        manifest = {
            "format": "lucene_spark.v1",
            "doc_count": self.doc_count,
            "sum_total_term_freq": self.sum_total_term_freq,
            "docs_per_segment": self.docs_per_segment,
            "num_segments": self.num_segments,
            "metrics": self.metrics,
            "committed_at": time.time(),
        }
        os.makedirs(index_dir, exist_ok=True)
        tmp = os.path.join(index_dir, "_manifest.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, os.path.join(index_dir, "manifest.json"))  # atomic commit

    @classmethod
    def load(cls, spark: SparkSession, index_dir: str) -> "InvertedIndex":
        with open(os.path.join(index_dir, "manifest.json")) as f:
            m = json.load(f)
        return cls(
            spark=spark,
            blocks=spark.read.parquet(os.path.join(index_dir, "blocks")),
            terms=spark.read.parquet(os.path.join(index_dir, "terms")),
            norms=spark.read.parquet(os.path.join(index_dir, "norms")),
            doc_count=m["doc_count"],
            sum_total_term_freq=m["sum_total_term_freq"],
            docs_per_segment=m["docs_per_segment"],
            num_segments=m["num_segments"],
            metrics=m.get("metrics", {}),
        )
