"""Deduplication operators for web-scale training-data pipelines.

All exact/candidate generation is pure DataFrame SQL (JVM-side,
codegen'd); only SimHash uses an Arrow-batched pandas UDF. Hashing is
deliberately md5-string-based so every operator has a bit-identical
ANSI-SQL oracle (DuckDB) — `__spark_entry__.oracle_sql` relies on this.

Scale notes (100 TB corpus):
- exact dedup: one shuffle on a 32-hex-char key, partial-agg'd;
- MinHash/LSH: shingle explosion is the big intermediate — it stays
  (doc_id, shingle) shaped and aggregates per doc before any join; the
  band join is an equi-join on band keys (bounded bucket sizes —
  near-identical docs only), never an O(n²) cross join;
- candidate verification joins shingle sets only for candidate pairs
  (semi-join pushdown), never for all pairs.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

__all__ = [
    "duplicate_clusters",
    "exact_duplicates",
    "paragraph_dedup",
    "word_shingles",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_near_dups",
    "simhash_pairs_from_hashes",
]


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup groups: (content md5, group size, canonical keeper id).

    Returns one row per duplicated content hash (n_dups >= 2), keeper =
    lowest id. One hash-partial-agg'd shuffle on the digest.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("content_md5"), F.col(id_col))
        .groupBy("content_md5")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("keeper_id"),
        )
        .filter(F.col("n_dups") >= 2)
    )


def word_shingles(df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle)."""
    toks = F.split(F.col(text_col), " ")
    # shingle i = tokens[i..i+n-1] joined by ' ' — pure SQL via transform+slice.
    # Guard: Spark sequence(1, x) DESCENDS when x < 1, so gate on size >= n.
    shingles = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(shingles).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 16
) -> DataFrame:
    """MinHash signature per doc: sig_i = min(md5(i || '|' || shingle)).

    String-min over salted md5 hex — order-identical in any engine, so
    the DuckDB oracle reproduces signatures exactly. One groupBy(doc).
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash + LSH near-dup pairs with exact-Jaccard verification.

    shingle → minhash → band → bucket-join (the LSH candidate step) →
    exact n-gram Jaccard on candidates only. Returns
    (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sh = word_shingles(df, n=n, text_col=text_col, id_col=id_col).persist()
    sig = minhash_signatures(sh, num_hashes=num_hashes)
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band"), F.concat_ws("#", *cols).alias("key")))
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    # candidate pairs: docs sharing a band bucket
    a = banded.alias("a")
    b_ = banded.alias("b")
    cand = (
        a.join(b_, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    verified = _verify_jaccard(cand, sh, threshold)
    return verified


def _verify_jaccard(cand: DataFrame, shingles: DataFrame, threshold: float) -> DataFrame:
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        cand.join(shingles.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(
            shingles.select(
                F.col("doc_id").alias("doc_b"), F.col("shingle")
            ),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs; candidates = any shared shingle.

    For corpora where near-dup rate is low this is exact and cheap: the
    shingle self-join only materializes pairs that share content.

    **Scale**: on a web corpus, Zipf-head shingles ("of the and") put
    huge doc sets in one join bucket — the self-join goes quadratic in
    the head. Set ``max_shingle_df`` to drop shingles seen in more than
    that many docs before the join (a standard LSH-era trick: ubiquitous
    shingles carry no near-dup signal). Jaccard is then computed over
    the surviving shingle space — i.e. head shingles are treated as
    stopwords on both the intersection and the union side. For exact
    full-shingle results at scale, prefer
    :func:`minhash_lsh_pairs`, whose band join bounds bucket sizes by
    construction.
    """
    sh = word_shingles(df, n=n, text_col=text_col, id_col=id_col)
    if max_shingle_df is not None:
        sh_df = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        sh = sh.join(
            sh_df.filter(F.col("_df") <= max_shingle_df).select("shingle"),
            "shingle",
            "semi",
        )
    cand = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    return (
        cand.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
        .withColumn("jaccard", F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


# term → 64-bit hash memo shared across Arrow batches in one worker;
# Zipf token reuse makes the hit rate very high on web text
_H64_CACHE: dict = {}
_H64_CACHE_MAX = 1 << 20


def _simhash64_batch(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens, md5-derived term hashes.

    h64(term) = first 16 hex chars of md5(term) as uint64 (big-endian);
    bit j (0 = MSB) votes +freq / -freq; simhash bit j = 1 if vote > 0.
    Deterministic and reproducible in ANSI SQL (the DuckDB oracle
    rebuilds the same bits from md5 hex digits).

    Vectorized: per-(doc, term) frequencies come from one C-level
    pandas groupby over the whole batch; md5 runs once per UNIQUE term
    (memoized across batches); the 64 vote counters accumulate as one
    matrix groupby-sum — no per-token Python in the loop.
    """
    import hashlib

    n = len(texts)
    lists = [
        t.split(" ") if isinstance(t, str) and t else [] for t in texts.tolist()
    ]
    lens = np.fromiter((len(l) for l in lists), dtype=np.int64, count=n)
    if lens.sum() == 0:
        return pd.Series(np.zeros(n, dtype=np.int64))
    doc_idx = np.repeat(np.arange(n), lens)
    toks = np.concatenate([np.asarray(l, dtype=object) for l in lists if l])
    grp = (
        pd.DataFrame({"d": doc_idx, "t": toks})
        .groupby(["d", "t"], sort=False)
        .size()
    )
    d_arr = grp.index.get_level_values(0).to_numpy()
    t_arr = grp.index.get_level_values(1).to_numpy()
    f_arr = grp.to_numpy(dtype=np.int64)
    uniq, inv = np.unique(t_arr, return_inverse=True)
    hvals = np.empty(len(uniq), dtype=np.uint64)
    for i, term in enumerate(uniq):
        v = _H64_CACHE.get(term)
        if v is None:
            v = int(hashlib.md5(term.encode()).hexdigest()[:16], 16)
            if len(_H64_CACHE) < _H64_CACHE_MAX:
                _H64_CACHE[term] = v
        hvals[i] = v
    shifts = np.arange(63, -1, -1, dtype=np.uint64)  # bit 0 = MSB
    signs = (
        ((hvals[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64) * 2 - 1
    )  # (n_unique, 64) of ±1
    contrib = signs[inv] * f_arr[:, None]  # (n_pairs, 64)
    votes_df = pd.DataFrame(contrib)
    votes_df["_d"] = d_arr
    votes_by_doc = votes_df.groupby("_d", sort=True).sum()  # C-level agg
    sim_bits = (votes_by_doc.to_numpy() > 0).astype(np.uint64)
    weights = np.uint64(1) << shifts
    vals = (sim_bits * weights[None, :]).sum(axis=1, dtype=np.uint64)
    out = np.zeros(n, dtype=np.int64)
    out[votes_by_doc.index.to_numpy()] = vals.view(np.int64)
    return pd.Series(out)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash int64) via Arrow-batched pandas UDF."""

    @F.pandas_udf(T.LongType())
    def _udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield _simhash64_batch(s)

    return df.select(F.col(id_col).alias("doc_id"), _udf(F.col(text_col)).alias("simhash"))


def simhash_near_dups(
    df: DataFrame, max_hamming: int = 3, n_blocks: Optional[int] = None, **kw
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Candidate generation by pigeonhole: split the 64-bit hash into
    ``n_blocks`` contiguous blocks; a pair within ``max_hamming`` has
    differing bits in at most ``max_hamming`` blocks, so it agrees
    EXACTLY on some combination of ``n_blocks - max_hamming`` whole
    blocks — equi-joining once per combination finds every true pair
    with no cross join.

    ``n_blocks`` tunes the key width / fan-out trade (the
    block-permutation design of Manku, Jain & Das Sarma, "Detecting
    Near-Duplicates for Web Crawling", WWW 2007 §3):

    - ``n_blocks = max_hamming + 1`` (1 block per key): minimal
      fan-out (h+1 keys/doc) but narrow keys — e.g. 16-bit keys at
      h=3, so buckets hold ~N/65536 docs and the within-bucket
      self-join grows quadratically past ~10^8 docs.
    - larger ``n_blocks`` (keys concatenate ``n_blocks - max_hamming``
      blocks): C(n_blocks, max_hamming) keys per doc but exponentially
      wider keys — ``n_blocks=8, h=3`` gives 56 keys of ~40 bits, so
      expected bucket width stays O(1) up to ~10^11 docs. That is the
      100 TB configuration; the default keeps the minimal-fan-out
      shape for small corpora.

    Candidates are verified with an exact popcount on the full hash
    either way, so ``n_blocks`` affects cost only, never the result.
    """
    return simhash_pairs_from_hashes(
        simhash(df, **kw), max_hamming=max_hamming, n_blocks=n_blocks
    )


def simhash_pairs_from_hashes(
    sh: DataFrame, max_hamming: int = 3, n_blocks: Optional[int] = None
) -> DataFrame:
    """Hamming-near pairs from a precomputed (doc_id, simhash int64)
    DataFrame — the candidate-generation + exact-verify stage of
    :func:`simhash_near_dups`, exposed so stored signatures can be
    re-queried without re-hashing the corpus."""
    if n_blocks is None:
        n_blocks = max_hamming + 1
    if n_blocks <= max_hamming:
        raise ValueError("n_blocks must exceed max_hamming")
    # contiguous block boundaries covering all 64 bits (widths differ by
    # at most 1 when 64 % n_blocks != 0)
    bounds = [round(64 * c / n_blocks) for c in range(n_blocks + 1)]

    def block_col(c: int) -> Column:
        lo, hi = bounds[c], bounds[c + 1]
        mask = (1 << (hi - lo)) - 1
        return F.shiftrightunsigned("simhash", lo).bitwiseAND(F.lit(mask))

    from itertools import combinations

    keep = n_blocks - max_hamming
    chunk_structs = []
    for ci, combo in enumerate(combinations(range(n_blocks), keep)):
        # concatenate the chosen blocks into one packed key (each block
        # is at most ceil(64/n_blocks) bits wide)
        slot = (64 // n_blocks) + 1
        key = F.lit(0).cast("long")
        for j, c in enumerate(combo):
            key = key.bitwiseOR(F.shiftleft(block_col(c), j * slot))
        chunk_structs.append(
            F.struct(F.lit(ci).alias("chunk"), key.alias("key"))
        )
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.array(*chunk_structs)).alias("ck"),
    ).select("doc_id", "simhash", "ck.chunk", "ck.key")
    cand = (
        chunks.alias("a")
        .join(chunks.alias("b"), ["chunk", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def duplicate_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over near-duplicate pairs → dedup clusters.

    Iterative minimum-label propagation (alternating large/small-star
    style): every doc's cluster converges to the smallest doc_id
    reachable through the pair graph. Each iteration is two
    shuffles (join + min-agg); near-dup graphs have tiny diameters so
    this converges in a handful of rounds. At scale, checkpoint the
    label frame every few iterations to cut lineage.

    Returns DataFrame(doc_id, cluster_id) where cluster_id = min doc_id
    of the component; the canonical "keeper" is doc_id == cluster_id.
    """
    spark = pairs.sparkSession
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .union(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("u").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .persist()
    )
    for i in range(max_iters):
        # propagate: each node takes min(own label, neighbors' labels,
        # and its current LABEL's label — pointer-doubling, so chains
        # converge in O(log diameter) rounds instead of O(diameter))
        neigh = (
            edges.join(labels.withColumnRenamed("doc_id", "v"), "v")
            .groupBy(F.col("u").alias("doc_id"))
            .agg(F.min("cluster_id").alias("n_min"))
        )
        via_label = (
            labels.alias("l")
            .join(
                labels.select(
                    F.col("doc_id").alias("cluster_id"),
                    F.col("cluster_id").alias("l2"),
                ),
                "cluster_id",
            )
            .select("doc_id", F.col("l2").alias("p_min"))
        )
        new_labels = (
            labels.join(neigh, "doc_id", "left")
            .join(via_label, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("n_min"), F.col("cluster_id")),
                    F.coalesce(F.col("p_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
        # truncate lineage every round: iterative algorithms otherwise
        # build exponentially deep plans (driver OOM on long chains)
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """Paragraph-level exact deduplication (the RefinedWeb/Falcon and
    Gopher pipelines' line/paragraph dedup stage; same contract as
    repeating the doc-level `exact_duplicates` at paragraph
    granularity): split each document on ``sep``, keep a paragraph
    only in the document with the smallest (id, position) occurrence,
    and reassemble every document from its surviving paragraphs in
    their original order.

    Returns (id_col, clean_text, n_paragraphs, n_kept).

    Plan shape at 100 TB: posexplode keeps (doc, pos, para) narrow;
    the keeper choice is ONE min_by aggregate on the md5 key (partial
    map-side combine — the duplicated-paragraph skew collapses before
    the shuffle because min(struct(id,pos)) combines locally), then a
    semi-join back and a per-doc sort_array reassembly. No window over
    the full corpus, no text in the shuffle beyond one md5 per
    paragraph occurrence."""
    paras = (
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), sep)).alias("_pos", "_para"),
        )
        .filter(F.length(F.trim(F.col("_para"))) >= min_chars)
        .withColumn("_h", F.md5(F.col("_para")))
    )
    keepers = paras.groupBy("_h").agg(
        F.min(F.struct("_id", "_pos")).alias("_k")
    )
    kept = paras.join(
        keepers,
        (paras["_h"] == keepers["_h"])
        & (paras["_id"] == F.col("_k._id"))
        & (paras["_pos"] == F.col("_k._pos")),
    ).select(paras["_id"], paras["_pos"], paras["_para"])
    totals = (
        df.select(
            F.col(id_col).alias("_id"),
            F.size(
                F.filter(
                    F.split(F.col(text_col), sep),
                    lambda p: F.length(F.trim(p)) >= min_chars,
                )
            ).cast("long").alias("n_paragraphs"),
        )
    )
    rebuilt = (
        kept.groupBy("_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("_pos", "_para"))),
                    lambda s: s["_para"],
                ),
                sep,
            ).alias("clean_text"),
            F.count(F.lit(1)).cast("long").alias("n_kept"),
        )
    )
    return (
        totals.join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_paragraphs",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
        .orderBy(id_col)
    )
