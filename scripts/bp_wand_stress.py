#!/usr/bin/env python
"""BP-clustered WAND stress: prove the prune pays at scale.

r4 verdict item #6: WAND's win at the 1M Zipf stress was nominal (4%)
because Zipf impacts saturate per block — no block is prunable. This
harness builds the corpus the prune exists for: a small hot cluster
(high-tf query terms) inside a large cold mass (tf=1), doc order
genuinely produced by `bp_reorder` (recursive graph bisection), so
cold postings land in pure-cold 128-posting blocks whose upper bound
falls below theta - max_ub(other). Reports wand-vs-exhaustive wall
clock, the pruned-block count from the searcher's telemetry, and the
scattered-order control (saturated -> no prune possible), then
appends a section to BENCH.md.

At 100 TB the same structure holds per segment: BP runs per segment
(SCALE.md), the prune scan is block METADATA only (codegen'd filter,
no decode), and the saving scales with the pruned fraction of the
decode+shuffle stage, which dominates the job at real posting counts.

Env: BPW_DOCS (default 2_000_000), BPW_CPUS (default 32),
     BPW_REPS (default 3).

Sizing note (measured): at 1M docs with df=52% the decode+shuffle
stage is ~0.3s of a ~1.2s job — the Spark fixed-cost floor hides the
prune (1.2x despite 92% of blocks pruned). The default below uses
df~100% terms at 2M docs so the exhaustive leg's decode volume (4M
postings across the two terms) dominates the floor, which is the
regime any real index is in (a 100 TB segment decodes orders of
magnitude more than 4M postings per query term).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

DOCS = int(os.environ.get("BPW_DOCS", "2000000"))
CPUS = int(os.environ.get("BPW_CPUS", "32"))
REPS = int(os.environ.get("BPW_REPS", "3"))


def timed(fn, reps=REPS):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return statistics.median(ts)


def corpus(spark):
    """4% hot docs (focus x8 / lens x4), 96% cold (x1 each); topic
    scattered across doc_id so the pre-BP control index interleaves
    hot docs into every block. Hot docs share a dedicated vocabulary
    (hotword/alpha/beta) — the co-occurrence signal BP needs to
    recover the cluster, as topical web pages have."""
    topic = F.pmod(F.xxhash64(F.col("id"), F.lit(11)), F.lit(25))
    pad = F.concat_ws(
        " ",
        F.concat(F.lit("w"), F.pmod(F.col("id"), F.lit(7))),
        F.concat(F.lit("v"), F.pmod(F.col("id"), F.lit(5))),
        F.concat(F.lit("u"), F.pmod(F.col("id"), F.lit(3))),
    )
    hot_txt = F.concat(
        pad, F.lit(" hotword alpha beta "),
        F.lit(" ".join(["focus"] * 8 + ["lens"] * 4)),
    )
    cold_txt = F.concat(pad, F.lit(" coldword gamma delta focus lens"))
    return (
        spark.range(0, DOCS, 1, CPUS * 2)
        .select(
            F.col("id").alias("doc_id"),
            F.when(topic == 0, hot_txt).otherwise(cold_txt).alias("text"),
        )
    )


def main() -> None:
    from lucene_spark.index import InvertedIndex
    from lucene_spark.index.bp import bp_reorder
    from lucene_spark.search import (
        BooleanClause,
        BooleanQuery,
        IndexSearcher,
        Occur,
        TermQuery,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bp_wand_stress")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = corpus(spark).persist()
    df.count()
    q = BooleanQuery.of(
        BooleanClause(TermQuery("focus"), Occur.SHOULD),
        BooleanClause(TermQuery("lens"), Occur.SHOULD),
    )

    # control: scattered doc order (hash topic -> every block hot)
    scat_idx = InvertedIndex.build(df, analyzer="simple", docs_per_segment=1 << 13)
    s_scat = IndexSearcher(scat_idx)
    s_scat.wand_collect_stats = True
    t_scat_wand = timed(lambda: s_scat.search(q, 10, "wand").collect())
    scat_stats = dict(s_scat.last_wand_stats or {})
    t_scat_exh = timed(lambda: s_scat.search(q, 10, "exhaustive").collect())
    scat_idx.unpersist()

    # BP-clustered order (the real reorderer, per-partition bisection)
    t0 = time.time()
    clus = bp_reorder(df, num_partitions=max(2, DOCS // 250_000)).persist()
    clus.count()
    t_bp = time.time() - t0
    clus_idx = InvertedIndex.build(clus, analyzer="simple", docs_per_segment=1 << 13)
    s_clus = IndexSearcher(clus_idx)
    s_clus.wand_collect_stats = True
    res_w = [(r["doc_id"], r["score"]) for r in s_clus.search(q, 10, "wand").collect()]
    clus_stats = dict(s_clus.last_wand_stats or {})
    s_clus.wand_collect_stats = False
    res_e = [
        (r["doc_id"], r["score"]) for r in s_clus.search(q, 10, "exhaustive").collect()
    ]
    t_clus_wand = timed(lambda: s_clus.search(q, 10, "wand").collect())
    t_clus_exh = timed(lambda: s_clus.search(q, 10, "exhaustive").collect())

    speedup = t_clus_exh / max(t_clus_wand, 1e-9)
    out = {
        "metric": "bp_wand_stress",
        "docs": DOCS,
        "cpus": CPUS,
        "reps": REPS,
        "loadavg": round(os.getloadavg()[0], 2),
        "bp_reorder_secs": round(t_bp, 3),
        "scattered_saturated": bool(scat_stats.get("saturated", False)),
        "q_wand_scattered": round(t_scat_wand, 3),
        "q_exhaustive_scattered": round(t_scat_exh, 3),
        "clustered_blocks": clus_stats.get("blocks"),
        "clustered_pruned_blocks": clus_stats.get("pruned"),
        "q_wand_clustered": round(t_clus_wand, 3),
        "q_exhaustive_clustered": round(t_clus_exh, 3),
        "wand_speedup_clustered": round(speedup, 2),
        "wand_equals_exhaustive": res_w == res_e,
    }
    print(json.dumps(out))

    pruned, blocks = out["clustered_pruned_blocks"], out["clustered_blocks"]
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"""

## BP-clustered WAND stress ({DOCS:,} docs, local[{CPUS}], load {out['loadavg']})

Hot/cold corpus (4% hot docs, tf 8 vs 1), doc order from the real
`bp_reorder`. Scattered order is the control: every block holds a hot
doc, impacts saturate, the searcher routes to the exhaustive-shaped
fallback (saturated={out['scattered_saturated']}) — pruning is
impossible by construction, not merely unprofitable.

| leg | wand | exhaustive | note |
|---|---|---|---|
| scattered (control) | {out['q_wand_scattered']} s | {out['q_exhaustive_scattered']} s | saturated fallback |
| BP-clustered | {out['q_wand_clustered']} s | {out['q_exhaustive_clustered']} s | **{out['wand_speedup_clustered']}x**, {pruned}/{blocks} blocks pruned |

bp_reorder itself: {out['bp_reorder_secs']} s. WAND == exhaustive
top-10: {out['wand_equals_exhaustive']}. median of {REPS} reps.

Generated by `scripts/bp_wand_stress.py` at {time.strftime('%Y-%m-%d %H:%M:%S')}.
"""
        )
    spark.stop()


if __name__ == "__main__":
    main()
