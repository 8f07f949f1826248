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
is :func:`lucene_spark.search.positional.decode_positions` with the
PAYLOADS flag — ONE shared posting-block read path, so block-format
changes touch one decoder. :func:`payload_score_topk` is
PayloadScoreQuery for a term with ``includeSpanScore=false``: the
payload function runs as a JVM higher-order function
(`aggregate`/`array_min`/`array_max`) over the decoded arrays — no
per-payload Python — then top-k via TakeOrderedAndProject. At scale
the plan reads only the one term's blocks, decodes them once, and
aggregates per doc with no shuffle beyond the top-k reduction.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, functions as F

from lucene_spark.index.builder import InvertedIndex
from lucene_spark.search.positional import decode_positions

__all__ = [
    "decode_payloads",
    "payload_score_topk",
    "span_payload_check",
    "payloads_for_query",
]


def decode_payloads(
    index: InvertedIndex, terms: List[str], doc_range=None
) -> DataFrame:
    """(doc_id, term, freq, norm, positions, payloads) rows for the
    given terms — `PostingsEnum` advanced with the PAYLOADS flag.
    Delegates to the shared positional decoder."""
    return decode_positions(index, terms, doc_range=doc_range, with_payloads=True)


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

    func in {'min', 'max', 'avg', 'sum'}. Aggregation runs in float64
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


_OPS = {
    "eq": lambda p, v: p == v,
    "lt": lambda p, v: p < v,
    "lte": lambda p, v: p <= v,
    "gt": lambda p, v: p > v,
    "gte": lambda p, v: p >= v,
}


def span_payload_check(
    index: InvertedIndex,
    term: str,
    op: str = "eq",
    value: float = 0.0,
) -> DataFrame:
    """SpanPayloadCheckQuery (`queries/payloads/SpanPayloadCheckQuery.java:54`
    + `PayloadMatcherFactory.java` MatchOperation EQ/LT/LTE/GT/GTE): a
    span term matches only at positions whose payload satisfies the
    predicate; a doc matches when at least one position survives.
    Returns (doc_id, n_matching, positions) for the surviving docs,
    doc_id asc — the surviving-position count and list mirror the
    reference's per-span verification.

    Same one-term block decode as every payload operator (shared
    `decode_positions` path); the predicate runs as a JVM
    higher-order filter over the (positions, payloads) arrays — no
    per-payload Python, no shuffle at all (doc-local projection)."""
    if op not in _OPS:
        raise ValueError(f"op must be one of {sorted(_OPS)}")
    pred = _OPS[op]
    d = decode_payloads(index, [term])
    surviving = F.filter(
        F.zip_with(
            "positions",
            "payloads",
            lambda pos, pay: F.struct(pos.alias("pos"), pay.alias("pay")),
        ),
        lambda s: pred(s["pay"].cast("double"), F.lit(float(value))),
    )
    return (
        d.withColumn("_surv", surviving)
        .filter(F.size("_surv") > 0)
        .select(
            "doc_id",
            F.size("_surv").cast("long").alias("n_matching"),
            F.concat_ws(
                ",",
                F.transform("_surv", lambda s: s["pos"].cast("string")),
            ).alias("positions"),
        )
        .orderBy("doc_id")
    )


def _term_payload_rows(index: InvertedIndex, terms: List[str]) -> DataFrame:
    """(doc_id, term, pos, payload) — one row per posting position."""
    d = decode_payloads(index, list(dict.fromkeys(terms)))
    return d.select(
        "doc_id",
        "term",
        F.explode(
            F.zip_with(
                "positions",
                "payloads",
                lambda p, y: F.struct(p.alias("pos"), y.alias("pay")),
            )
        ).alias("s"),
    ).select("doc_id", "term", F.col("s.pos").alias("pos"), F.col("s.pay").alias("payload"))


def payloads_for_query(index: InvertedIndex, spec) -> DataFrame:
    """PayloadSpanUtil.getPayloadsForQuery
    (`sandbox/payloads/PayloadSpanUtil.java:37,44`): collect the
    payloads at every position a query matches.

    ``spec`` mirrors the reference's query-to-span rewrite:
      - ``{"term": t}`` — every position of t (SpanTermQuery);
      - ``{"or": [spec, ...]}`` — union (BooleanQuery SHOULD /
        DisjunctionMax / MultiPhrase term sets all reduce to this);
      - ``{"bool": [(spec, prohibited), ...]}`` — union of the
        non-prohibited clauses (PayloadSpanUtil.java:44 skips
        ``clause.isProhibited()``);
      - ``{"phrase": [t1, ...], "slop": s}`` — SpanNear rewrite with
        the reference's quirk ``inorder = (slop == 0)``
        (PayloadSpanUtil.java:61); collected payloads are those of the
        clause terms at their matched positions inside each window.

    Returns (doc_id, term, pos, payload) rows, one per collected
    payload.  Plan shape: per-term block decode (posting pushdown) +
    for phrases a doc_id equi-join of positions against match windows
    — the payload arrays never leave the JVM.
    """
    if "term" in spec:
        return _term_payload_rows(index, [spec["term"]])
    if "or" in spec:
        frames = [payloads_for_query(index, s) for s in spec["or"]]
        out = frames[0]
        for fdf in frames[1:]:
            out = out.unionByName(fdf)
        return out.distinct()
    if "bool" in spec:
        frames = [
            payloads_for_query(index, s)
            for s, prohibited in spec["bool"]
            if not prohibited
        ]
        if not frames:
            return index.spark.createDataFrame(
                [], "doc_id long, term string, pos int, payload float"
            )
        out = frames[0]
        for fdf in frames[1:]:
            out = out.unionByName(fdf)
        return out.distinct()
    if "phrase" in spec:
        from lucene_spark.search.spans import _near_match_windows

        terms = list(spec["phrase"])
        slop = int(spec.get("slop", 0))
        in_order = slop == 0  # PayloadSpanUtil.java:61
        win = _near_match_windows(index, [[t] for t in terms], slop, in_order)
        if win is None:
            return index.spark.createDataFrame(
                [], "doc_id long, term string, pos int, payload float"
            )
        win = win.withColumnRenamed("doc_id", "w_doc").distinct()
        rows = _term_payload_rows(index, terms)
        cond = (
            (F.col("w_doc") == F.col("doc_id"))
            & (F.col("pos") >= F.col("start"))
            & (F.col("pos") < F.col("end"))
        )
        return (
            rows.join(win, cond, "left_semi")
            .distinct()
        )
    raise ValueError(f"unsupported payload query spec: {spec!r}")
