"""DSIR — data selection via importance resampling (Xie et al. 2023).

"Data Selection for Language Models via Importance Resampling"
(NeurIPS 2023): fit bag-of-hashed-n-gram multinomials over a TARGET
corpus (the distribution you want, e.g. curated text) and the RAW
corpus (what you have, e.g. a crawl), weight every raw document by

    log w(doc) = Σ_{feature f in doc} [ log p_target(f) - log p_raw(f) ]

and resample raw documents with probability ∝ w (Gumbel-top-k). Docs
that look like the target get up-weighted; boilerplate/noise that is
over-represented in the raw distribution gets suppressed.

Distributed re-expression, fully deterministic and SQL-oracle-able:

- features are hashed unigrams: ``conv(substr(md5(token),1,8),16,10)
  % n_buckets`` — the same md5-bucket trick as `pipeline/sampling.py`,
  identical expression in any engine (no engine-specific hash);
- the two multinomials are one partial-agg'd groupBy each, with add-1
  smoothing over the bucket space (hashing already bounds the vocab);
- per-doc log-weights are one broadcast join (the feature table is
  n_buckets rows) + one aggregation;
- the resampling step replaces i.i.d. Gumbel noise with the
  md5-uniform of (seed, doc_id) — ``g = -ln(-ln(u))`` — so the
  selected set is reproducible across engines and cluster layouts,
  the same determinism contract as `hash_sample`.

At 100 TB: token explode → two bounded groupBys (map-side combine
collapses the Zipf head), a broadcast of n_buckets rows, one shuffle
on doc_id — no driver state beyond nothing, no UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["dsir_log_weights", "dsir_resample", "oracle_dsir_sql"]

_BUCKETS_MOD = 1_000_000  # md5-uniform resolution (matches sampling.py)


def _feat(col, n_buckets: int):
    """Hashed unigram feature id in [0, n_buckets)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % n_buckets


def _doc_feats(docs: DataFrame, n_buckets: int, text_col: str, id_col: str):
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("tok")
    ).select("doc_id", _feat(F.col("tok"), n_buckets).alias("f"))


def _log_weights_raw(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """(doc_id, n_feats, _lw) with the UNROUNDED weight (internal —
    ordering must never run on a rounded value)."""
    rf = _doc_feats(raw, n_buckets, text_col, id_col)
    tf = _doc_feats(target, n_buckets, text_col, id_col)
    p_r = rf.groupBy("f").agg(F.count(F.lit(1)).alias("cr"))
    p_t = tf.groupBy("f").agg(F.count(F.lit(1)).alias("ct"))
    nr = rf.count()
    nt = tf.count()
    # log p(f) = ln((c + 1) / (N + B)) — constants folded driver-side
    lden_r = float(nr + n_buckets)
    lden_t = float(nt + n_buckets)
    ratio = (
        p_r.join(p_t, "f", "full_outer")
        .select(
            "f",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                    / F.lit(lden_t)
                )
                - F.log(
                    (F.coalesce(F.col("cr"), F.lit(0)) + F.lit(1.0))
                    / F.lit(lden_r)
                )
            ).alias("llr"),
        )
    )
    # inner join: every raw feature has a pr row, hence a ratio row
    return (
        rf.join(F.broadcast(ratio), "f")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("llr").alias("_lw"),
        )
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_feats, log_w) for every raw doc: Σ_f [ln p_t(f) −
    ln p_r(f)] with add-1 smoothing over the hashed-feature space."""
    return _log_weights_raw(raw, target, n_buckets, text_col, id_col).select(
        "doc_id", "n_feats", F.round(F.col("_lw"), 6).alias("log_w")
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    n_buckets: int = 10_000,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gumbel-top-k importance resample: keep the k raw docs with the
    largest ``log_w + Gumbel(md5-uniform(seed, doc_id))`` — the
    paper's §2.2 sampling-without-replacement trick, derandomized via
    the md5 uniform so any engine reproduces the exact selection."""
    w = _log_weights_raw(raw, target, n_buckets, text_col, id_col)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _BUCKETS_MOD
        + 1
    ) / float(_BUCKETS_MOD + 1)
    gumbel = -F.log(-F.log(u))
    return (
        w.withColumn("_key", F.col("_lw") + gumbel)
        .orderBy(F.col("_key").desc(), F.col("doc_id").asc())
        .limit(k)
        .select(
            "doc_id",
            "n_feats",
            F.round(F.col("_lw"), 6).alias("log_w"),
            F.round(F.col("_key"), 6).alias("key"),
        )
    )


def oracle_dsir_sql(
    raw_where: str,
    target_where: str,
    k: int,
    n_buckets: int = 10_000,
    seed: int = 42,
    table: str = "documents",
) -> str:
    """DuckDB mirror of :func:`dsir_resample` (same md5 buckets, same
    smoothing, same derandomized Gumbel key)."""

    def feats(where: str) -> str:
        return f"""
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 8))::BIGINT % {n_buckets} AS f
  FROM (
    SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                      x -> x <> '')) AS tok
    FROM {table} WHERE {where}
  )"""

    u = (
        f"(('0x' || substr(md5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, 8))"
        f"::BIGINT % {_BUCKETS_MOD} + 1) / {float(_BUCKETS_MOD + 1)!r}"
    )
    return f"""
WITH rf AS ({feats(raw_where)}),
tf AS ({feats(target_where)}),
pr AS (SELECT f, count(*) AS cr FROM rf GROUP BY f),
pt AS (SELECT f, count(*) AS ct FROM tf GROUP BY f),
nn AS (SELECT (SELECT count(*) FROM rf) AS nr, (SELECT count(*) FROM tf) AS nt),
ratio AS (
  SELECT coalesce(pr.f, pt.f) AS f,
         ln((coalesce(ct, 0) + 1.0) / (nt + {n_buckets}))
         - ln((coalesce(cr, 0) + 1.0) / (nr + {n_buckets})) AS llr
  FROM pr FULL OUTER JOIN pt ON pr.f = pt.f CROSS JOIN nn
),
w AS (
  SELECT rf.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         round(sum(llr), 6) AS log_w, sum(llr) AS _lw
  FROM rf JOIN ratio USING (f) GROUP BY rf.doc_id
)
SELECT doc_id, n_feats, log_w,
       round(_lw + (-ln(-ln({u}))), 6) AS key
FROM w
ORDER BY _lw + (-ln(-ln({u}))) DESC, doc_id ASC LIMIT {k}
"""
