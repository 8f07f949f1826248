"""Cross-document exact-substring duplication signals.

The exact-substring dedup of Lee et al., "Deduplicating Training Data
Makes Language Models Better" (2022): find token spans of length >= n
that occur in more than one document (boilerplate, licenses, mirrored
articles) and score each document by how much of it is duplicated
text. The paper builds a suffix array over the whole corpus; the
shuffle-native re-expression is the standard n-gram inversion — every
length-L duplicated span contains L-n+1 duplicated n-grams, so
"fraction of duplicated n-gram starts" is a monotone proxy for the
paper's span coverage, computable with ONE partial-aggregated groupBy
on the gram key + one semi-join, no suffix array and no global sort.

Scale shape: the gram table is |tokens| rows wide but never
materialized to the driver; the groupBy partial-aggregates map-side
(hot boilerplate grams collapse to one row per partition before the
shuffle), and the semi-join back to positions shuffles on the same
gram key — two well-distributed exchanges at 100 TB. `as_hash=True`
keys grams by xxhash64 (8 bytes vs the span text) for production
shuffles; the default keeps the raw string so the DuckDB oracle can
reproduce values exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "ngram_spans",
    "repeated_ngrams",
    "duplicated_span_starts",
    "duplicated_spans",
]


def ngram_spans(
    docs: DataFrame,
    n: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    as_hash: bool = False,
) -> DataFrame:
    """(doc_id, pos, gram): every token n-gram start position (0-based)
    per doc; whitespace tokenization. Docs shorter than n tokens emit
    nothing."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    gram = (
        "xxhash64(concat_ws(' ', slice(_toks, i + 1, {n})))"
        if as_hash
        else "concat_ws(' ', slice(_toks, i + 1, {n}))"
    ).format(n=n)
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .filter(F.size("_toks") >= n)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(f"transform(sequence(0, size(_toks) - {n}), i -> {gram})")
            ).alias("pos", "gram"),
        )
    )


def repeated_ngrams(
    docs: DataFrame,
    n: int = 20,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    as_hash: bool = False,
) -> DataFrame:
    """(gram, n_docs, n_occurrences) for n-grams present in >=
    `min_docs` distinct docs — the duplicated-span inventory, ordered
    n_docs desc / gram asc."""
    grams = ngram_spans(docs, n, text_col, id_col, as_hash)
    return (
        grams.groupBy("gram")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .orderBy(F.col("n_docs").desc(), F.col("gram").asc())
    )


def duplicated_span_starts(
    docs: DataFrame,
    n: int = 20,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    as_hash: bool = False,
) -> DataFrame:
    """Per-doc duplication score: (doc_id, total_grams, dup_starts,
    dup_frac) where dup_starts counts n-gram positions whose gram
    occurs in >= `min_docs` docs — the filter signal of the
    exact-substring dedup (docs above a dup_frac threshold get dropped
    or trimmed)."""
    grams = ngram_spans(docs, n, text_col, id_col, as_hash).persist()
    try:
        dup = (
            grams.groupBy("gram")
            .agg(F.countDistinct("doc_id").alias("n_docs"))
            .filter(F.col("n_docs") >= min_docs)
            .select("gram")
        )
        per_doc = grams.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("total_grams")
        )
        dup_per_doc = (
            grams.join(dup, "gram", "semi")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("dup_starts"))
        )
        return (
            per_doc.join(dup_per_doc, "doc_id", "left")
            .select(
                "doc_id",
                "total_grams",
                F.coalesce(F.col("dup_starts"), F.lit(0)).alias("dup_starts"),
                F.round(
                    F.coalesce(F.col("dup_starts"), F.lit(0))
                    / F.col("total_grams"),
                    6,
                ).alias("dup_frac"),
            )
            .orderBy(
                F.col("dup_frac").desc(),
                F.col("dup_starts").desc(),
                F.col("doc_id").asc(),
            )
        ).localCheckpoint()
    finally:
        grams.unpersist()


def duplicated_spans(
    docs: DataFrame,
    n: int = 20,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    as_hash: bool = False,
) -> DataFrame:
    """Maximal duplicated SPANS per doc — Lee et al.'s span semantics,
    not the gram-start proxy of `duplicated_span_starts`.

    A duplicated n-gram starting at token `p` covers tokens
    [p, p+n); the union of those intervals is exactly the set of
    tokens lying inside some cross-document duplicated window of
    length n, i.e. the paper's duplicated-span coverage at the token
    level. Adjacent/overlapping intervals merge when the next start is
    <= previous start + n, a per-doc window-function pass (JVM-side,
    partitioned by doc — no driver loop, no numpy, scales with the
    per-doc posting count like every other window op here).

    Returns (doc_id, total_tokens, n_spans, covered_tokens, coverage)
    for every doc with >= n tokens, coverage desc. Documented
    divergences from the suffix-array construction: (a) only
    CROSS-document duplicates count (`min_docs` distinct docs — a span
    repeated twice inside one doc does not mark itself); (b) spans
    shorter than n tokens are invisible, identical to the paper's
    minimum-match-length parameter.
    """
    grams = ngram_spans(docs, n, text_col, id_col, as_hash).persist()
    try:
        dup = (
            grams.groupBy("gram")
            .agg(F.countDistinct("doc_id").alias("n_docs"))
            .filter(F.col("n_docs") >= min_docs)
            .select("gram")
        )
        pos = grams.join(dup, "gram", "semi").select("doc_id", "pos")
        w = Window.partitionBy("doc_id").orderBy("pos")
        brk = F.when(F.col("pos") - F.lag("pos").over(w) > n, 1).otherwise(0)
        spans = (
            pos.withColumn("_brk", brk)
            .withColumn(
                "span_id",
                F.sum("_brk").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
            )
            .groupBy("doc_id", "span_id")
            .agg(
                F.min("pos").alias("span_start"),
                (F.max("pos") + n).alias("span_end"),
            )
        )
        per_doc = spans.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("span_end") - F.col("span_start")).alias(
                "covered_tokens"
            ),
        )
        toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
        tot = (
            docs.select(
                F.col(id_col).alias("doc_id"), F.size(toks).alias("total_tokens")
            )
            .filter(F.col("total_tokens") >= n)
        )
        return (
            tot.join(per_doc, "doc_id", "left")
            .select(
                "doc_id",
                "total_tokens",
                F.coalesce(F.col("n_spans"), F.lit(0)).alias("n_spans"),
                F.coalesce(F.col("covered_tokens"), F.lit(0)).alias(
                    "covered_tokens"
                ),
                F.round(
                    F.coalesce(F.col("covered_tokens"), F.lit(0))
                    / F.col("total_tokens"),
                    6,
                ).alias("coverage"),
            )
            .orderBy(
                F.col("coverage").desc(),
                F.col("covered_tokens").desc(),
                F.col("doc_id").asc(),
            )
        ).localCheckpoint()
    finally:
        grams.unpersist()
