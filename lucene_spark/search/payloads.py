"""Payload decoding and PayloadScoreQuery-style scoring.

Lucene attaches per-position byte payloads via the analysis chain's
PayloadAttribute, stores them in the postings' .pay file, surfaces
them through `index/PostingsEnum.java` (`getPayload()`, flag
`PostingsEnum.PAYLOADS`), and scores them with
`queries/src/java/org/apache/lucene/queries/payloads/PayloadScoreQuery.java`
composing a `PayloadFunction` (`MinPayloadFunction` /
`MaxPayloadFunction` / `AveragePayloadFunction` /
`SumPayloadFunction`) over the payloads at the matching positions,
decoded by a `PayloadDecoder` (the float decoder in practice).

Spark re-expression: the build stores one float32 per position
(``payloads_packed``, see BLOCKS_SCHEMA_PAY). :func:`decode_payloads`
is the PostingsEnum.PAYLOADS read path — one Arrow-batched decode over
the term's posting blocks (parquet/metadata pruning applies before any
Python runs). :func:`payload_score_topk` is PayloadScoreQuery for a
term with ``includeSpanScore=false``: the payload function runs as a
JVM higher-order function (`aggregate`/`array_min`/`array_max`) over
the decoded arrays — no per-payload Python — then top-k via
TakeOrderedAndProject. At scale the plan reads only the one term's
blocks, decodes them once, and aggregates per doc with no shuffle
beyond the top-k reduction.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from lucene_spark.functions.forutil import (
    delta_decode,
    for_decode,
    for_decode_stream,
    pfor_decode,
)
from lucene_spark.index.builder import InvertedIndex

__all__ = ["decode_payloads", "payload_score_topk"]

_PAY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("freq", T.IntegerType(), False),
        T.StructField("norm", T.IntegerType(), False),
        T.StructField("positions", T.ArrayType(T.IntegerType()), False),
        T.StructField("payloads", T.ArrayType(T.FloatType()), False),
    ]
)


def decode_payloads(
    index: InvertedIndex, terms: List[str], doc_range=None
) -> DataFrame:
    """Decode (doc_id, term, freq, norm, positions, payloads) rows for
    the given terms — `PostingsEnum` advanced with the PAYLOADS flag.

    ``doc_range=(lo, hi)`` prunes posting blocks on block skip
    metadata before the Python decode, like
    :func:`~lucene_spark.search.positional.decode_positions`.
    """
    if not index.has_payloads:
        raise ValueError("index was built without payloads=True")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for term, docs_b, freqs_b, norms_b, pos_b, pay_b in zip(
                pdf["term"].values,
                pdf["docs_packed"].values,
                pdf["freqs_packed"].values,
                pdf["norms_raw"].values,
                pdf["positions_packed"].values,
                pdf["payloads_packed"].values,
            ):
                docs = delta_decode(for_decode(bytes(docs_b)))
                freqs = pfor_decode(bytes(freqs_b))
                norms = np.frombuffer(bytes(norms_b), dtype=np.uint8).astype(np.int32)
                stream = for_decode_stream(bytes(pos_b))
                bounds = np.cumsum(freqs)[:-1]
                positions = [
                    np.cumsum(chunk).astype(np.int32)
                    for chunk in np.split(stream, bounds)
                ]
                pay = np.frombuffer(bytes(pay_b), dtype=np.float32)
                payloads = list(np.split(pay, bounds))
                outs.append(
                    pd.DataFrame(
                        {
                            "doc_id": docs,
                            "term": term,
                            "freq": freqs.astype(np.int32),
                            "norm": norms,
                            "positions": positions,
                            "payloads": payloads,
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    blocks = index.blocks.filter(F.col("term").isin(list(set(terms))))
    if doc_range is not None:
        lo, hi = doc_range
        blocks = blocks.filter(
            (F.col("max_doc") >= int(lo)) & (F.col("first_doc") <= int(hi))
        )
    decoded = blocks.select(
        "term",
        "docs_packed",
        "freqs_packed",
        "norms_raw",
        "positions_packed",
        "payloads_packed",
    ).mapInPandas(fn, _PAY_SCHEMA)
    if doc_range is not None:
        decoded = decoded.filter(
            (F.col("doc_id") >= int(lo)) & (F.col("doc_id") <= int(hi))
        )
    return decoded


def payload_score_topk(
    index: InvertedIndex,
    term: str,
    func: str = "avg",
    k: int = 10,
) -> DataFrame:
    """Top-k docs by payload score of `term` — PayloadScoreQuery with
    ``includeSpanScore=false`` over a SpanTermQuery
    (`queries/payloads/PayloadScoreQuery.java:47-60`,
    `payloads/PayloadFunction.java` subclasses).

    func ∈ {'min', 'max', 'avg', 'sum'}. Aggregation runs in float64
    (payloads are stored float32, widened once) as a JVM expression
    over the decoded payload array; docs hidden by tombstones or soft
    deletes are excluded. Returns (doc_id, score) ordered score desc,
    doc_id asc.
    """
    rows = decode_payloads(index, [term]).select("doc_id", "payloads")
    pay = F.col("payloads")
    total = F.aggregate(
        pay, F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    if func == "sum":
        score = total
    elif func == "avg":
        score = total / F.size(pay)
    elif func == "min":
        score = F.array_min(pay).cast("double")
    elif func == "max":
        score = F.array_max(pay).cast("double")
    else:
        raise ValueError(f"unknown payload function {func!r}")
    scored = rows.select("doc_id", score.alias("score"))
    hidden = index.hidden_docs
    if hidden is not None:
        scored = scored.join(hidden, "doc_id", "left_anti")
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
