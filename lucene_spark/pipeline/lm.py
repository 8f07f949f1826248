"""N-gram language-model perplexity scoring — the CCNet-style quality
filter.

CCNet (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") ranks web documents by the perplexity
of a small n-gram language model trained on a clean reference corpus
and keeps the low-perplexity head/middle buckets; the same signal
drives quality bucketing in most public web-scale pipelines. The
reference LM there is KenLM; the distributed re-expression here is an
interpolated bigram model with add-k smoothing — the statistics are
two partial-aggregated groupBys, scoring is two broadcast joins and
one aggregation, and the whole thing is plain SQL (the DuckDB oracle
runs the identical formula).

Model (per token stream t_1..t_n, whitespace tokens, `<s>` start
symbol, document-frequency-free):

    p(w | v) = (count(v, w) + k) / (count(v) + k * V)
    log10 pp(doc) = -(Σ log10 p(t_i | t_{i-1})) / n

with V = |unigram vocabulary| + 1 (the +1 absorbs unseen successors).
Unseen bigrams get the smoothed floor k / (count(v) + kV); unseen
left-contexts degrade to k / kV = 1/V. Deterministic, no RNG.

Scale shape: the bigram table is corpus-bounded (Zipf: far smaller
than the token stream after map-side combine); scoring joins the
exploded (prev, cur) stream against it on the bigram key — two
well-distributed shuffles, no driver state, no UDF. Train on a clean
reference slice (`train_bigram_lm(ref_docs)`), score any corpus
(`perplexity(docs, model)`), exactly CCNet's split.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

__all__ = ["BigramLM", "train_bigram_lm", "perplexity", "perplexity_buckets"]

_BOS = "<s>"


@dataclass(frozen=True)
class BigramLM:
    """Distributed model state: tiny enough to persist as parquet,
    joined (broadcast when the vocab is small) at scoring time."""

    bigrams: DataFrame  # (prev, cur, c2)
    contexts: DataFrame  # (prev, c1)
    vocab_size: int  # V = |unigrams| + 1
    k: float


def _pairs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, prev, cur) for every adjacent token pair, `<s>`-started."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    return (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
        .filter(F.size("_t") >= 1)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(_t)), i -> struct("
                    f"CASE WHEN i = 1 THEN '{_BOS}' ELSE _t[i - 2] END AS prev, "
                    f"_t[i - 1] AS cur))"
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
    )


def train_bigram_lm(
    ref_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.1,
) -> BigramLM:
    """Fit the smoothed bigram model on the reference corpus: two
    partial-agg'd groupBys + one distinct count, nothing on the
    driver but the vocab size."""
    pairs = _pairs(ref_docs, text_col, id_col)
    bigrams = pairs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c2"))
    contexts = pairs.groupBy("prev").agg(F.count(F.lit(1)).alias("c1"))
    vocab = pairs.filter(F.col("cur") != _BOS).select("cur").distinct().count()
    return BigramLM(bigrams, contexts, vocab + 1, float(k))


def perplexity(
    docs: DataFrame,
    model: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, log10_ppl): CCNet's ranking signal, ascending
    = cleaner. Unseen bigrams/contexts take the smoothed floor."""
    kV = model.k * model.vocab_size
    pairs = _pairs(docs, text_col, id_col)
    scored = (
        pairs.join(model.contexts, "prev", "left")
        .join(model.bigrams, ["prev", "cur"], "left")
        .select(
            "doc_id",
            F.log10(
                (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(model.k))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(kV))
            ).alias("lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(-F.sum("lp") / F.count(F.lit(1)), 6).alias("log10_ppl"),
        )
        .orderBy(F.col("log10_ppl").asc(), F.col("doc_id").asc())
    )


def oracle_perplexity_sql(
    k: float = 0.1,
    ref_where: str = "TRUE",
    score_where: str = "TRUE",
    limit: int = 300,
    table: str = "documents",
) -> str:
    """DuckDB mirror: train on `table WHERE ref_where`, score
    `table WHERE score_where`, identical smoothing arithmetic."""
    return f"""
WITH pr AS (
  SELECT doc_id, i,
         CASE WHEN i = 1 THEN '<s>' ELSE l[i - 1] END AS prev,
         l[i] AS cur
  FROM (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
    FROM {table} WHERE {ref_where}
  ), LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)
  WHERE len(l) >= 1
),
big AS (SELECT prev, cur, count(*) AS c2 FROM pr GROUP BY prev, cur),
ctx AS (SELECT prev, count(*) AS c1 FROM pr GROUP BY prev),
v AS (SELECT count(DISTINCT cur) + 1 AS vs FROM pr WHERE cur <> '<s>'),
sc AS (
  SELECT doc_id, i,
         CASE WHEN i = 1 THEN '<s>' ELSE l[i - 1] END AS prev,
         l[i] AS cur
  FROM (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
    FROM {table} WHERE {score_where}
  ), LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)
  WHERE len(l) >= 1
),
lp AS (
  SELECT s.doc_id,
         log10((coalesce(b.c2, 0) + {k!r})
               / (coalesce(c.c1, 0) + {k!r} * v.vs)) AS lp
  FROM sc s
  LEFT JOIN ctx c USING (prev)
  LEFT JOIN big b ON b.prev = s.prev AND b.cur = s.cur
  CROSS JOIN v
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(-sum(lp) / count(*), 6) AS log10_ppl
FROM lp GROUP BY doc_id
ORDER BY log10_ppl ASC, doc_id ASC LIMIT {limit}
"""


def perplexity_buckets(
    ppl: DataFrame,
    col: str = "log10_ppl",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3): the
    corpus is cut at the 1/3 and 2/3 perplexity quantiles — "head" is
    the cleanest third, "tail" the noisiest. Cutoffs come from ONE
    exact-percentile aggregate (at 100 TB swap in approx_percentile —
    CCNet itself computes the cutoffs once per language on a sample);
    the bucket assignment is then a codegen'd CASE against the two
    broadcast cutoff scalars, no sort and no window over the corpus.
    Returns (bucket, n_docs, min_ppl, max_ppl), bucket asc."""
    cuts = ppl.agg(
        F.expr(
            f"percentile({col}, array(CAST(1.0 AS DOUBLE)/3, "
            f"CAST(2.0 AS DOUBLE)/3))"
        ).alias("c")
    ).select(
        F.col("c")[0].alias("_c1"), F.col("c")[1].alias("_c2")
    )
    v = F.col(col)
    bucket = (
        F.when(v <= F.col("_c1"), F.lit("head"))
        .when(v <= F.col("_c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        ppl.crossJoin(F.broadcast(cuts))
        .select(bucket.alias("bucket"), v.alias("_p"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.min("_p"), 6).alias("min_ppl"),
            F.round(F.max("_p"), 6).alias("max_ppl"),
        )
        .orderBy("bucket")
    )
