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

__all__ = [
    "naive_bayes_classes",
    "bm25_nb_classes",
    "knn_classify",
    "knn_fuzzy_classify",
    "oracle_knn_fuzzy_sql",
    "perceptron_init",
    "perceptron_train",
    "perceptron_assign",
    "oracle_perceptron_sql",
]

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


def knn_fuzzy_classify(
    index,
    docs: DataFrame,
    source_terms: Sequence[str],
    k: int = 10,
    max_edits: int = 1,
    prefix_length: int = 0,
    max_variants_per_term: int = 50,
    max_num_terms: int = 25,
    class_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """KNearestFuzzyClassifier (`classification/KNearestFuzzy
    Classifier.java:46`): the kNN classifier's class fold applied to
    the top-k of a NearestFuzzyQuery — which scores exactly like
    FuzzyLikeThisQuery (variant expansion by edit distance, sim²·idf
    selection, unit-df scoring), so the retrieval leg reuses
    :func:`lucene_spark.search.fuzzylikethis.fuzzy_like_this_topk`
    verbatim and only the buildListFromTopDocs fold
    (``Σ(s/maxscore) / min(k, classed hits)``) is added here.
    """
    from .fuzzylikethis import fuzzy_like_this_topk

    topk = (
        fuzzy_like_this_topk(
            index,
            source_terms,
            k=k,
            max_edits=max_edits,
            prefix_length=prefix_length,
            max_variants_per_term=max_variants_per_term,
            max_num_terms=max_num_terms,
            round_score=False,
        )
        .withColumnRenamed("score", "s")
        .join(
            docs.select(
                F.col(id_col).alias("doc_id"), F.col(class_col).alias("label")
            ),
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


def oracle_knn_fuzzy_sql(
    source_terms: Sequence[str],
    k: int = 10,
    max_edits: int = 1,
    prefix_length: int = 0,
    max_variants_per_term: int = 50,
    max_num_terms: int = 25,
    class_col: str = "lang",
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`knn_fuzzy_classify`: the full
    FuzzyLikeThis retrieval oracle (unrounded scores) wrapped in the
    kNN class fold."""
    from .fuzzylikethis import oracle_fuzzy_like_this_sql

    flt = oracle_fuzzy_like_this_sql(
        source_terms,
        k=k,
        max_edits=max_edits,
        prefix_length=prefix_length,
        max_variants_per_term=max_variants_per_term,
        max_num_terms=max_num_terms,
        table=table,
        rounded=False,
    )
    return f"""
WITH hits AS ({flt}),
j AS (SELECT h.score AS s, d.{class_col} AS label
      FROM hits h JOIN {table} d USING (doc_id)
      WHERE d.{class_col} IS NOT NULL),
g AS (SELECT max(s) AS maxscore, count(*) AS sumdoc FROM j)
SELECT label, sum(s / maxscore) / least({k}.0, sumdoc * 1.0) AS score
FROM j CROSS JOIN g GROUP BY label, maxscore, sumdoc
ORDER BY score DESC, label ASC
"""


# ---------------------------------------------------------------------------
# BooleanPerceptronClassifier
# ---------------------------------------------------------------------------

def perceptron_init(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bias: float | None = None,
):
    """Initial perceptron state (`classification/BooleanPerceptron
    Classifier.java:60`): weights start at each term's corpus-wide
    totalTermFreq, and when no bias is given it defaults to the average
    total term freq per doc (sumTotalTermFreq / docCount) — both ONE
    partially-aggregated groupBy over the token stream.

    Returns (weights_df(term, w), bias). The weights frame stays
    DISTRIBUTED (the reference holds the whole vocabulary in a RAM
    SortedMap/FST; at 100 TB the vocabulary is a table, and scoring
    joins against it).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    weights = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("w")
    )
    if bias is None or bias == 0.0:
        r = toks.agg(
            (
                F.count(F.lit(1)).cast("double")
                / F.countDistinct("doc_id").cast("double")
            ).alias("b")
        ).collect()[0]
        bias = float(r["b"])
    return weights, float(bias)


def perceptron_train(
    docs: DataFrame,
    weights_df: DataFrame,
    bias: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    class_col: str = "label",
    batch_size: int = 1,
    max_train_rows: int = 10_000,
) -> DataFrame:
    """Sequential perceptron training pass
    (BooleanPerceptronClassifier.java:149-206), exact semantics:

    - docs are visited in docID order; each is first classified with
      the current FST SNAPSHOT (``output >= bias``);
    - on a misclassification, every term of the doc gets
      ``w = max(0, snapshot(term) + modifier * tf_doc)`` where
      ``modifier = signum(correct - assigned)`` — but the snapshot the
      *scoring* sees only refreshes on misclassified docs whose
      position is a multiple of ``batch_size`` (the reference's
      batched updateFST);
    - weights are longs end to end (the FST stores
      ``value.longValue()``).

    The pass is inherently sequential (each doc's prediction depends
    on all previous updates), so — like the reference, which holds it
    all in one thread's RAM — it runs on a row-capped,
    deterministically ordered sample collected to the driver; only the
    sample's OWN vocabulary is collected (semi-join against the
    distributed init weights). The returned weights frame is the init
    frame with the trained terms overridden — distributed again, ready
    for :func:`perceptron_assign`.
    """
    sample = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("text"),
            F.col(class_col).cast("boolean").alias("label"),
        )
        .filter(F.col("label").isNotNull())
        .orderBy("doc_id")
        .limit(max_train_rows)
        .collect()
    )
    vocab = sorted({t for r in sample for t in r["text"].split(" ") if t})
    spark = docs.sparkSession
    vocab_df = spark.createDataFrame([(t,) for t in vocab] or [("",)], "term string")
    init = {
        r["term"]: int(r["w"])
        for r in weights_df.join(F.broadcast(vocab_df), "term", "left_semi").collect()
    }

    weights = dict(init)  # live map (BooleanPerceptronClassifier's SortedMap)
    fst = dict(init)  # the snapshot assignments read (the FST)
    for batch_count, row in enumerate(sample):
        toks = [t for t in row["text"].split(" ") if t]
        output = sum(fst.get(t, 0) for t in toks)
        assigned = output >= bias
        correct = bool(row["label"])
        modifier = (correct > assigned) - (correct < assigned)
        if modifier != 0:
            tf = Counter(toks)
            for t, f in tf.items():
                prev = fst.get(t)
                weights[t] = 0 if prev is None else max(0, prev + modifier * f)
            if batch_count % batch_size == 0:
                fst = dict(weights)

    changed = [(t, int(w)) for t, w in weights.items() if w != init.get(t)]
    if not changed:
        return weights_df
    upd = spark.createDataFrame(changed, "term string, w_new long")
    return (
        weights_df.join(F.broadcast(upd), "term", "left_outer")
        .select("term", F.coalesce("w_new", "w").alias("w"))
    )


def perceptron_assign(
    docs: DataFrame,
    weights_df: DataFrame,
    bias: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed assignClass (BooleanPerceptronClassifier.java:227):
    ``output = Σ_tokens weight(token)`` (absent terms contribute 0),
    ``assigned = output >= bias``,
    ``score = 1 - exp(-|bias - output| / bias)``.

    One explode + one (broadcastable) join + one partial-agg'd groupBy
    — no per-row Python."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    summed = (
        toks.join(F.broadcast(weights_df), "term", "left_outer")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce("w", F.lit(0))).alias("output"))
    )
    # docs whose text produced no tokens score 0 (the reference sums
    # over an empty token stream)
    base = docs.select(F.col(id_col).alias("doc_id")).join(
        summed, "doc_id", "left_outer"
    )
    out = F.coalesce("output", F.lit(0)).cast("double")
    return base.select(
        "doc_id",
        out.cast("long").alias("output"),
        (out >= bias).alias("assigned"),
        (
            F.lit(1.0)
            - F.exp(-F.abs(F.lit(float(bias)) - out) / F.lit(float(bias)))
        ).alias("score"),
    )


def oracle_perceptron_sql(
    where: str = "TRUE",
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for the epoch-0 (initial-FST) decision function:
    weights = corpus totalTermFreq, bias = sumTotalTermFreq/docCount —
    the exact state BooleanPerceptronClassifier scores with before any
    misclassification update (the sequential update pass itself is not
    SQL-expressible; its semantics are pinned by fixture pytests)."""
    return f"""
WITH tok AS (
  SELECT {id_col} AS doc_id, term FROM (
    SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS term FROM {table}
  ) WHERE term <> ''
),
w AS (SELECT term, CAST(count(*) AS BIGINT) AS w FROM tok GROUP BY term),
b AS (SELECT count(*) * 1.0 / count(DISTINCT doc_id) AS bias FROM tok),
o AS (
  SELECT d.{id_col} AS doc_id,
         CAST(coalesce(sum(w.w), 0) AS BIGINT) AS output
  FROM {table} d
  LEFT JOIN tok ON tok.doc_id = d.{id_col}
  LEFT JOIN w USING (term)
  GROUP BY d.{id_col}
)
SELECT doc_id, output,
       output >= bias AS assigned,
       1.0 - exp(-abs(bias - output) / bias) AS score
FROM o CROSS JOIN b
WHERE {where}
ORDER BY doc_id
"""
