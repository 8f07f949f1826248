#!/usr/bin/env python
"""One indexing job at a fixed parallelism — the scaling-run worker.

Run via spark-submit (or plain python) at two parallelism levels to
evidence the north rule's N → 4N scaling criterion:

    spark-submit --master local[8]  --py-files lucene_spark.zip scripts/index_job.py
    spark-submit --master local[32] --py-files lucene_spark.zip scripts/index_job.py

Prints one JSON line: corpus size, steady-state index-build seconds
(corpus generation and Spark startup excluded), docs/sec, postings/sec.
"""

from __future__ import annotations

import json
import os
import sys
import time

# JOB_NO_REPO_PATH=1: imports must resolve from --py-files (the
# spark-submit packaging path the north rule specifies) rather than
# the repo checkout
if os.environ.get("JOB_NO_REPO_PATH") != "1":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

CPUS = int(os.environ.get("JOB_CPUS", "8"))
DOCS = int(os.environ.get("JOB_DOCS", "40000"))
ANALYZER = os.environ.get("JOB_ANALYZER", "standard")
SEED = int(os.environ.get("JOB_SEED", "42"))
# one segment = one build task; fixed across parallelism levels so the
# N and 4N runs execute the identical job (scaling-evidence fairness)
DOCS_PER_SEGMENT = int(os.environ.get("JOB_DOCS_PER_SEGMENT", "1024"))
# aligned: the generator's corpus is range-partitioned by doc_id, so
# the zero-shuffle ingest applies (set JOB_LAYOUT=hash to compare)
LAYOUT = os.environ.get("JOB_LAYOUT", "aligned")


def main() -> None:
    from lucene_spark.corpus import synthetic_corpus
    from lucene_spark.index import InvertedIndex

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(f"index_job_{CPUS}")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        # modest heap: a huge heap turns post-shuffle full GCs into
        # multi-second serial pauses that poison the parallel stages
        .config("spark.driver.memory", os.environ.get("JOB_DRIVER_MEM", "16g"))
        .config("spark.driver.extraJavaOptions", "-XX:+UseG1GC -XX:MaxGCPauseMillis=200")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # materialize the corpus first so generation cost is excluded
    corpus = synthetic_corpus(
        # fixed input partitioning across parallelism levels: a real
        # N-vs-4N pair reads the SAME files, and with the aligned
        # layout the partition count also fixes the flush boundaries —
        # otherwise the two runs would encode different block sets
        spark, DOCS, seed=SEED, num_partitions=int(os.environ.get("JOB_INPUT_PARTS", "128")), with_doc_id=True
    ).persist()
    corpus.count()
    # best of REPS runs: the sandbox shares hardware with other tenants
    # (load avg >5 at idle), so any single run can be 2x off
    reps = int(os.environ.get("JOB_REPS", "3"))
    secs = float("inf")
    idx = None
    for _ in range(reps):
        if idx is not None:
            # drop ALL cached plans: CacheManager matches by canonical
            # plan, so a repeat build would silently reuse the previous
            # run's materialized blocks and time nothing
            spark.catalog.clearCache()
            corpus = corpus.persist()
            corpus.count()
        t0 = time.time()
        idx = InvertedIndex.build(
            corpus,
            analyzer=ANALYZER,
            docs_per_segment=DOCS_PER_SEGMENT,
            # ~4 task waves: fine enough for balance, coarse enough
            # that per-task overhead stays negligible
            shuffle_partitions=CPUS * 4,
            layout=LAYOUT,
        )
        secs = min(secs, time.time() - t0)
    print(
        json.dumps(
            {
                "cpus": CPUS,
                "docs": DOCS,
                "analyzer": ANALYZER,
                "layout": LAYOUT,
                "build_secs": round(secs, 3),
                "docs_per_sec": round(DOCS / secs, 1),
                # derive from the SAME best-of-reps secs as docs_per_sec
                # (idx.metrics' rate uses only the last rep's clock)
                "postings_per_sec": round(idx.sum_total_term_freq / secs, 1),
                "num_blocks": idx.metrics.get("num_blocks"),
                "sum_total_term_freq": idx.sum_total_term_freq,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
