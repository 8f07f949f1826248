"""Index-backed document classification (the reference's
`classification` module).

Two classifiers, both re-expressed as DataFrame aggregations over the
corpus/class statistics the reference pulls from its index reader:

- :func:`naive_bayes_classes` —
  `lucene/classification/src/java/org/apache/lucene/classification/SimpleNaiveBayesClassifier.java:47`:
  per class ``c``, ``score = log P(c) + Σ_w log P(w|c)`` with add-one
  smoothing, where ``P(w|c) = (docs of c containing w + 1) /
  (avgUniqueTermsPerDoc · docFreq(c) + docsWithClass)`` (the
  denominator is `getTextTermFreqForClass`,
  SimpleNaiveBayesClassifier.java:240) and the prior is
  ``docFreq(c) / docsWithClass`` (calculateLogPrior, :279). Scores are
  then softmax-normalized exactly like `normClassificationResults`
  (:294): ``exp(s − logsumexp(s))``.

- :func:`knn_classify` —
  `classification/KNearestNeighborClassifier.java:40`: a BM25 top-k
  search for the input text's terms, then per class
  ``score = Σ(hit_score / max_score) / min(k, hits_with_class)``
  (buildListFromTopDocs:191 — ``(count · normBoost)/k`` with the
  ``sumdoc < k`` correction; the count cancels).

Scale shape: the corpus-wide statistics (class doc counts, distinct
doc-term pairs, per-class-per-word document frequencies) are one
partial-aggregated groupBy each over the token table; the per-query
work is a semi-join on the query's ≤|words| terms. Nothing collects —
class-cardinality frames (a handful of rows) are combined via
crossJoin with one-row aggregate frames, which Spark broadcasts.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["naive_bayes_classes", "bm25_nb_classes", "knn_classify"]

# quantized decoded length (SmallFloat byte4 round-trip) — the same
# CASE the BM25 parity oracles use, valid in BOTH SQL dialects (Spark
# has bin()/>>/<< too), so engine and oracle share the text verbatim
_DLQ_CASE = (
    "CASE WHEN dl < 24 THEN dl WHEN (dl - 24) < 8 THEN dl "
    "ELSE 24 + (((dl - 24) >> (length(bin(dl - 24)) - 4)) "
    "<< (length(bin(dl - 24)) - 4)) END"
)


def _token_frame(docs: DataFrame, text_col: str, id_col: str, class_col: str):
    toks = F.split(F.col(text_col), " ")
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(class_col).alias("label"),
            F.explode(toks).alias("term"),
        )
        .filter(F.col("term") != "")
    )


def naive_bayes_classes(
    docs: DataFrame,
    words: Sequence[str],
    class_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All classes ranked for an input document given as its analyzed
    ``words`` (with multiplicity, like the reference's `tokenize`).

    Returns (label string, score double) — softmax-normalized
    posteriors, ordered score desc / label asc.
    """
    spark = docs.sparkSession
    tok = _token_frame(docs, text_col, id_col, class_col)
    # distinct (doc, term) pairs: `hits` is a DOCUMENT frequency
    # (indexSearcher.count of word AND class), and sumDocFreq is the
    # number of (term, doc) postings — both deduplicated per doc
    dt = tok.dropDuplicates(["doc_id", "term"])

    classed = F.col(class_col).isNotNull()
    cstats = (
        docs.filter(classed)
        .groupBy(F.col(class_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("df_c"))
    )
    g = (
        docs.agg(
            F.sum(classed.cast("long")).alias("docs_with_class"),
            F.sum(
                (F.col(text_col).isNotNull() & (F.col(text_col) != "")).cast("long")
            ).alias("doc_count"),
        )
        .crossJoin(dt.agg(F.count(F.lit(1)).alias("sum_doc_freq")))
    )

    counts = Counter(words)
    wdf = spark.createDataFrame(
        [(w, int(m)) for w, m in sorted(counts.items())], "term string, m int"
    )
    hits = (
        dt.filter(F.col("label").isNotNull() & F.col("term").isin(*counts))
        .groupBy("label", "term")
        .agg(F.count(F.lit(1)).alias("h"))
    )
    grid = (
        cstats.crossJoin(wdf)
        .join(hits, ["label", "term"], "left")
        .withColumn("h", F.coalesce(F.col("h"), F.lit(0)))
    )
    avg_unique = F.col("sum_doc_freq") * F.lit(1.0) / F.col("doc_count")
    raw = (
        grid.crossJoin(F.broadcast(g))
        .groupBy("label")
        .agg(
            (
                F.log(F.first("df_c").cast("double"))
                - F.log(F.first("docs_with_class").cast("double"))
                + F.sum(
                    F.col("m")
                    * F.log(
                        (F.col("h") + F.lit(1.0))
                        / (avg_unique * F.col("df_c") + F.col("docs_with_class"))
                    )
                )
            ).alias("s")
        )
    )
    # normClassificationResults: exp(s - logsumexp(s)), computed with
    # the reference's max-shift for stability
    smax = raw.agg(F.max("s").alias("smax"))
    loga = (
        raw.crossJoin(F.broadcast(smax))
        .agg((F.log(F.sum(F.exp(F.col("s") - F.col("smax")))) + F.first("smax")).alias("loga"))
    )
    return (
        raw.crossJoin(F.broadcast(loga))
        .select("label", F.exp(F.col("s") - F.col("loga")).alias("score"))
        .orderBy(F.col("score").desc(), F.col("label").asc())
    )


def bm25_nb_classes(
    docs: DataFrame,
    words: Sequence[str],
    class_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25NBClassifier
    (`classification/BM25NBClassifier.java:197-230`): naive Bayes
    where the probabilities are BM25 scores — the prior is
    ``log(top-1 score of TermQuery(class))`` and each word's
    likelihood is ``log(top-1 score of [class MUST, word SHOULD])``.

    With one class token per doc the class field's BM25 collapses to
    the constant ``idf_c / (1 + k1)`` (freq = dl = avgdl = 1), so the
    top-1 of the boolean query is ``s_c + max over class docs of the
    word's text-field BM25`` (or ``s_c`` alone when no class doc
    contains the word). Softmax-normalized like the reference.

    Returns (label, score), ordered score desc / label asc.
    """
    spark = docs.sparkSession
    tok = _token_frame(docs, text_col, id_col, class_col).select("doc_id", "term")

    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    dlq = dl.select("doc_id", F.expr(_DLQ_CASE).alias("dl_q"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sttf")
    )
    counts = Counter(words)
    tf = (
        tok.filter(F.col("term").isin(*counts))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    dfr = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    avgdl = F.col("sttf") * F.lit(1.0) / F.col("n_docs")
    idf_w = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("doc_freq") + F.lit(0.5))
        / (F.col("doc_freq") + F.lit(0.5))
    )
    s1 = (
        idf_w
        * F.col("freq")
        / (
            F.col("freq")
            + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl_q") / avgdl)
        )
    )
    per = (
        tf.join(F.broadcast(dfr), "term")
        .join(dlq, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", s1.alias("s1"))
    )
    labels = docs.filter(F.col(class_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), F.col(class_col).alias("label")
    )
    mx = (
        per.join(labels, "doc_id")
        .groupBy("label", "term")
        .agg(F.max("s1").alias("mx"))
    )

    cstats = labels.groupBy("label").agg(F.count(F.lit(1)).alias("df_c"))
    g = labels.agg(F.count(F.lit(1)).alias("n_class"))
    wdf = spark.createDataFrame(
        [(w, int(m)) for w, m in sorted(counts.items())], "term string, m int"
    )
    sc = (
        F.log(
            F.lit(1.0)
            + (F.col("n_class") - F.col("df_c") + F.lit(0.5))
            / (F.col("df_c") + F.lit(0.5))
        )
        / F.lit(1.0 + k1)
    )
    raw = (
        cstats.crossJoin(wdf)
        .join(mx, ["label", "term"], "left")
        .crossJoin(F.broadcast(g))
        .withColumn("sc", sc)
        .groupBy("label")
        .agg(
            (
                F.log(F.first("sc"))
                + F.sum(
                    F.col("m")
                    * F.log(F.col("sc") + F.coalesce(F.col("mx"), F.lit(0.0)))
                )
            ).alias("s")
        )
    )
    smax = raw.agg(F.max("s").alias("smax"))
    loga = raw.crossJoin(F.broadcast(smax)).agg(
        (F.log(F.sum(F.exp(F.col("s") - F.col("smax")))) + F.first("smax")).alias(
            "loga"
        )
    )
    return (
        raw.crossJoin(F.broadcast(loga))
        .select("label", F.exp(F.col("s") - F.col("loga")).alias("score"))
        .orderBy(F.col("score").desc(), F.col("label").asc())
    )


def knn_classify(
    index,
    docs: DataFrame,
    term_boosts: Dict[str, float],
    k: int = 10,
    class_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Classes ranked by the k nearest BM25 neighbors of the input
    terms (KNearestNeighborClassifier.java:155 `knnSearch` +
    buildListFromTopDocs:191).

    Returns (label string, score double), ordered score desc / label
    asc. ``score = Σ_{hits of class}(s/maxscore) / min(k, hits)``.
    """
    from .parity import _bm25_scored_f64

    scored = _bm25_scored_f64(index, term_boosts)
    topk = (
        scored.orderBy(F.col("s").desc(), F.col("doc_id").asc())
        .limit(k)
        .join(
            docs.select(F.col(id_col).alias("doc_id"), F.col(class_col).alias("label")),
            "doc_id",
        )
        .filter(F.col("label").isNotNull())
    )
    g = topk.agg(
        F.max("s").alias("maxscore"), F.count(F.lit(1)).alias("sumdoc")
    )
    return (
        topk.crossJoin(F.broadcast(g))
        .groupBy("label")
        .agg(
            (
                F.sum(F.col("s") / F.col("maxscore"))
                / F.least(F.lit(float(k)), F.first("sumdoc").cast("double"))
            ).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("label").asc())
    )
