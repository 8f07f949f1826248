#!/usr/bin/env python
"""Controlled A/B of the doc-block codec: v1 (fused FOR over
[first, gaps...]) vs v2 (8-byte base header + FOR over gaps only).

Round-4's bench showed q_term_topk 1.22s->3.02s and index_docs_per_sec
858->579 in the same round that switched the codec to v2, under
load-avg > 5 on a shared box. This script decides codec-vs-noise:
each arm runs in its own taskset-pinned subprocess (cores 0..N-1) with
LUCENE_SPARK_DOC_CODEC set before import, REPS=5 medians, and per-leg
load-average recorded.

Usage:
  python scripts/codec_ab.py            # orchestrate both arms, print table
  python scripts/codec_ab.py --arm v2   # one arm (inner, JSON line out)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_REPS", "5"))
BUILD_REPS = int(os.environ.get("BENCH_AB_BUILD_REPS", "3"))
SYN_DOCS = int(os.environ.get("BENCH_SYN_DOCS", "30000"))


def _median(ts):
    return round(statistics.median(ts), 3)


def run_arm(codec: str) -> dict:
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    from lucene_spark.corpus import synthetic_corpus
    from lucene_spark.functions import forutil
    from lucene_spark.index import InvertedIndex
    from lucene_spark.index.merge import log_merge_plan, merge_segments, segment_infos
    from lucene_spark.search import (
        BooleanClause,
        BooleanQuery,
        BoostQuery,
        IndexSearcher,
        Occur,
        TermQuery,
    )

    assert forutil.DOC_CODEC == codec, (
        f"codec env not honored: want {codec}, module saw {forutil.DOC_CODEC}"
    )
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(f"codec_ab_{codec}")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"codec": codec, "cpus": CPUS, "reps": REPS, "loadavg": {}}

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    dps = max(512, n_docs // (CPUS * 2))

    # -- build (median of BUILD_REPS full builds) ---------------------------
    out["loadavg"]["build"] = round(os.getloadavg()[0], 2)
    ts, idx = [], None
    for _ in range(BUILD_REPS):
        if idx is not None:
            idx.unpersist()
        t0 = time.time()
        idx = InvertedIndex.build(
            docs, analyzer="simple", docs_per_segment=dps, positions=True
        )
        ts.append(time.time() - t0)
    out["index_build_docs"] = _median(ts)
    out["index_build_docs_min"] = round(min(ts), 3)
    out["index_build_docs_all"] = [round(t, 3) for t in ts]
    out["index_docs_per_sec"] = round(n_docs / statistics.median(ts), 1)
    out["index_docs_per_sec_best"] = round(n_docs / min(ts), 1)
    out["docs_bytes"] = int(
        idx.blocks.agg({"docs_packed": "sum"}).collect()[0][0]
        if "docs_packed_len" in idx.blocks.columns
        else idx.blocks.selectExpr("sum(length(docs_packed))").collect()[0][0]
    )

    # -- merge round ---------------------------------------------------------
    out["loadavg"]["merge"] = round(os.getloadavg()[0], 2)
    plan = log_merge_plan(segment_infos(idx), merge_factor=10, floor_docs=dps)
    if plan:
        t0 = time.time()
        idx = merge_segments(idx, plan)
        out["merge_round"] = round(time.time() - t0, 3)
        out["merge_postings_per_sec"] = idx.metrics.get("merge_postings_per_sec")

    # -- query legs ------------------------------------------------------------
    searcher = IndexSearcher(idx)

    def timed(fn):
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return ts

    out["loadavg"]["q_term_topk"] = round(os.getloadavg()[0], 2)
    ts = timed(lambda: searcher.search(TermQuery("spark"), 10, "exhaustive").collect())
    out["q_term_topk"] = _median(ts)
    out["q_term_topk_min"] = round(min(ts), 3)
    out["q_term_topk_all"] = [round(t, 3) for t in ts]

    # -- synthetic corpus: the q_syn_exhaustive leg ----------------------------
    corpus = synthetic_corpus(
        spark, SYN_DOCS, seed=42, num_partitions=CPUS * 2, with_doc_id=True
    )
    syn_idx = InvertedIndex.build(
        corpus,
        analyzer="standard",
        docs_per_segment=max(256, SYN_DOCS // (CPUS * 4)),
        layout="aligned",
    )
    syn_searcher = IndexSearcher(syn_idx)
    syn_disj = BooleanQuery.of(
        BooleanClause(TermQuery("spark"), Occur.SHOULD),
        BooleanClause(TermQuery("index"), Occur.SHOULD),
        BooleanClause(BoostQuery(TermQuery("segment"), 2.0), Occur.SHOULD),
    )
    out["loadavg"]["q_syn"] = round(os.getloadavg()[0], 2)
    out["q_syn_exhaustive"] = _median(
        timed(lambda: syn_searcher.search(syn_disj, 10, "exhaustive").collect())
    )
    out["q_syn_wand"] = _median(
        timed(lambda: syn_searcher.search(syn_disj, 10, "wand").collect())
    )
    spark.stop()
    return out


def main() -> None:
    if "--arm" in sys.argv:
        codec = sys.argv[sys.argv.index("--arm") + 1]
        print(json.dumps(run_arm(codec)))
        return

    # interleaved trials (v1,v2,v1,v2,...) so slow drift in box state
    # hits both codecs equally; per-codec best-of-trials is reported,
    # since the min is the noise-robust statistic on a shared VM
    trials = int(os.environ.get("BENCH_AB_TRIALS", "2"))
    runs: dict = {"v1": [], "v2": []}
    for trial in range(trials):
        for codec in ("v1", "v2"):
            # let the previous arm's JVM exit and the load decay
            waited = 0
            while os.getloadavg()[0] > 1.8 and waited < 150:
                time.sleep(5)
                waited += 5
            env = dict(os.environ)
            env["LUCENE_SPARK_DOC_CODEC"] = codec
            cmd = [
                "taskset", "-c", f"0-{CPUS - 1}",
                sys.executable, os.path.abspath(__file__), "--arm", codec,
            ]
            print(
                f"== trial {trial} arm {codec} (pinned 0-{CPUS - 1}, "
                f"reps={REPS}, load {os.getloadavg()[0]:.2f}) ==",
                file=sys.stderr,
            )
            proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
            if proc.returncode != 0:
                print(proc.stderr[-4000:], file=sys.stderr)
                sys.exit(1)
            runs[codec].append(json.loads(proc.stdout.strip().splitlines()[-1]))

    def best(codec, leg, lo_is_best=True):
        vals = [r[leg] for r in runs[codec] if r.get(leg) is not None]
        if not vals:
            return None
        return min(vals) if lo_is_best else max(vals)

    legs = [
        ("index_build_docs_min", True), ("index_docs_per_sec_best", False),
        ("docs_bytes", True), ("merge_round", True),
        ("merge_postings_per_sec", False), ("q_term_topk_min", True),
        ("q_syn_exhaustive", True), ("q_syn_wand", True),
    ]
    print(json.dumps(runs, indent=2))
    print(f"\nbest-of-{trials} interleaved trials (min/max across trials):")
    print("| leg | v1 | v2 | v2/v1 |")
    print("|---|---|---|---|")
    for leg, lo in legs:
        a, b = best("v1", leg, lo), best("v2", leg, lo)
        ratio = round(b / a, 3) if a else None
        print(f"| {leg} | {a} | {b} | {ratio} |")


if __name__ == "__main__":
    main()
