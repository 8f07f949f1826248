"""Passage highlighting (UnifiedHighlighter analog).

`highlighter/src/java/org/apache/lucene/search/uhighlight/UnifiedHighlighter.java`
selects, per document, the best-scoring passages for a query and marks
the match offsets. Its `PassageScorer` weights each matching term by
an idf-like weight and picks top passages by summed weight.

Spark re-expression (all JVM, one shuffle):

- passages = tumbling windows of `window` tokens (the corpus is
  space-normalized synthetic text with no sentence structure, so fixed
  token windows replace the reference's BreakIterator sentence
  segmentation — a documented simplification);
- passage score = Σ over matching token occurrences of
  ``ln(1 + (N - df + 0.5)/(df + 0.5))`` (the same idf the scorer
  family uses), computed as posexplode → window-ordinal → partial-agg
  groupBy — term df comes from one tiny aggregation broadcast to the
  scan;
- best passage per doc = max score, ties to the earliest passage
  (`Passage.compareTo`), via a metadata-only window function — the
  passage TEXT is sliced only for the winners (fetch-winner-payload
  rule: never shuffle payloads through a rank window).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["best_passages", "fvh_best_passages"]


def best_passages(
    docs: DataFrame,
    terms: Sequence[str],
    window: int = 8,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    quantize: int | None = None,
    n_passages: int = 1,
) -> DataFrame:
    """(doc_id, passage_start, passage_score, passage) — the best
    `window`-token passage per matching doc; `passage_start` is the
    1-based token ordinal of the window, score desc ties earliest.
    Docs with no matching term are absent (UnifiedHighlighter returns
    no highlight for non-matching docs).

    ``n_passages > 1`` returns the reference's maxPassages shape
    (`UnifiedHighlighter.java` highlightFields(..., maxPassages)): up
    to N ranked windows per doc with an extra ``passage_rank`` column
    (single-passage callers keep the original 4-column schema).

    ``quantize=q`` sums term weights as integers in 10^-q units
    instead of doubles: float addition is order-dependent, and a
    distributed partial aggregation does not fix summation order the
    way the reference's single-threaded passage loop does — integer
    quantization makes the ranking reproducible across engines (used
    by the oracle-checked gate).
    """
    terms = list(dict.fromkeys(terms))
    toks = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.filter(F.split(F.col(text_col), " "), lambda t: t != "").alias("l"),
    ).persist()

    n_docs = toks.count()
    # per-term df: one tiny agg, broadcast back (TermStates analog)
    df_rows = (
        toks.select("doc_id", F.explode(F.array_distinct("l")).alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    import math

    idf = {
        r["term"]: math.log(1.0 + (n_docs - r["df"] + 0.5) / (r["df"] + 0.5))
        for r in df_rows.collect()
    }
    if not idf:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, passage_start int, passage_score double, passage string"
        )
    if quantize is not None:
        scale = 10 ** quantize
        weight = F.create_map(
            *[
                x
                for t, w in idf.items()
                for x in (F.lit(t), F.lit(int(round(w * scale))))
            ]
        )
        unscale = lambda c: c.cast("double") / F.lit(float(scale))
    else:
        weight = F.create_map(
            *[x for t, w in idf.items() for x in (F.lit(t), F.lit(float(w)))]
        )
        unscale = lambda c: c

    hits = (
        toks.select("doc_id", "l", F.posexplode("l").alias("i", "term"))
        .filter(F.col("term").isin(list(idf)))
        # tumbling window ordinal; +1 → 1-based start token of the window
        .withColumn("wstart", (F.floor(F.col("i") / window) * window + 1).cast("int"))
        .groupBy("doc_id", "wstart")
        .agg(unscale(F.sum(weight[F.col("term")])).alias("passage_score"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("passage_score").desc(), F.col("wstart").asc()
    )
    winners = hits.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= n_passages
    )
    # slice the passage text only for winners (payload after the rank)
    cols = [
        F.col("doc_id"),
        F.col("wstart").alias("passage_start"),
        F.round("passage_score", 4).alias("passage_score"),
        F.array_join(F.slice(F.col("l"), F.col("wstart"), window), " ").alias(
            "passage"
        ),
    ]
    if n_passages > 1:
        cols.append(F.col("rn").alias("passage_rank"))
    return winners.join(toks, "doc_id").select(*cols)


def fvh_best_passages(
    index,
    docs: DataFrame,
    terms: Sequence[str],
    window: int = 8,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    quantize: int | None = None,
    n_passages: int = 1,
    doc_ids: Sequence[int] | None = None,
) -> DataFrame:
    """FastVectorHighlighter analog: passages scored from the INDEX's
    stored positional postings — the document text is never re-analyzed.

    `highlighter/src/java/org/apache/lucene/search/vectorhighlight/FastVectorHighlighter.java:41`
    builds its FieldPhraseList from term-vector positions instead of
    re-running the analyzer per hit; here the equivalent source is the
    positional posting blocks (`decode_positions`, the same read path
    phrases/spans use), so the cost is
    O(posting blocks of the query terms), not O(corpus tokens):

    - only the query terms' blocks are decoded (term-dictionary prune);
    - with ``doc_ids`` (the usual highlight-the-top-k call), blocks
      whose [first_doc, max_doc] cannot contain a hit are skipped
      before any Python runs (skip-pointer prune), and decoded rows
      are semi-joined to the broadcast hit set;
    - document text is fetched ONLY for winning passages (one join
      against the doc store at the end).

    Scores are identical to :func:`best_passages` (same idf weights and
    tumbling windows) — the differential test asserts it — but the
    plan touches the index, not the corpus. Schema matches
    `best_passages`.
    """
    from lucene_spark.search.positional import decode_positions

    terms = list(dict.fromkeys(terms))
    spark = docs.sparkSession

    # idf from the term dictionary (no corpus pass)
    n_docs = index.doc_count
    import math

    stats = {
        r["term"]: int(r["doc_freq"])
        for r in index.terms.filter(F.col("term").isin(terms)).collect()
    }
    idf = {
        t: math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        for t, df in stats.items()
    }
    if not idf:
        return spark.createDataFrame(
            [], "doc_id long, passage_start int, passage_score double, passage string"
        )
    if quantize is not None:
        scale = 10 ** quantize
        weight = F.create_map(
            *[
                x
                for t, w in idf.items()
                for x in (F.lit(t), F.lit(int(round(w * scale))))
            ]
        )
        unscale = lambda c: c.cast("double") / F.lit(float(scale))
    else:
        weight = F.create_map(
            *[x for t, w in idf.items() for x in (F.lit(t), F.lit(float(w)))]
        )
        unscale = lambda c: c

    doc_range = None
    if doc_ids is not None:
        doc_ids = sorted(set(int(d) for d in doc_ids))
        doc_range = (doc_ids[0], doc_ids[-1])
    pos = decode_positions(
        index, list(idf), doc_range=doc_range, max_tasks=4 * len(idf) + 4
    )
    if doc_ids is not None:
        hit_df = F.broadcast(
            spark.createDataFrame([(d,) for d in doc_ids], "doc_id long")
        )
        pos = pos.join(hit_df, "doc_id", "left_semi")

    hits = (
        pos.select("doc_id", "term", F.explode("positions").alias("i"))
        .withColumn("wstart", (F.floor(F.col("i") / window) * window + 1).cast("int"))
        .groupBy("doc_id", "wstart")
        .agg(unscale(F.sum(weight[F.col("term")])).alias("passage_score"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("passage_score").desc(), F.col("wstart").asc()
    )
    winners = hits.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= n_passages
    )
    # fetch-winner-payload: broadcast the (small) winner set into the
    # doc-store scan so text is split/sliced ONLY for winning docs —
    # without this the join re-tokenizes the whole store and silently
    # reintroduces the corpus pass FVH exists to avoid
    l_col = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    store = docs.select(F.col(doc_id_col).alias("doc_id"), l_col.alias("l"))
    cols = [
        F.col("doc_id"),
        F.col("wstart").alias("passage_start"),
        F.round("passage_score", 4).alias("passage_score"),
        F.array_join(F.slice(F.col("l"), F.col("wstart"), window), " ").alias(
            "passage"
        ),
    ]
    if n_passages > 1:
        cols.append(F.col("rn").alias("passage_rank"))
    return F.broadcast(winners).join(store, "doc_id").select(*cols)
