#!/usr/bin/env python
"""N vs 4N scaling evidence: the same indexing job at two parallelism
levels (the sandbox stand-in for N vs 4N executors, per BASELINE.md's
measurement protocol).

Runs two pairs — local[4]→local[16] and local[8]→local[32] — plus a
pure-Python calibration of the box's memory-bandwidth ceiling, because
on one box all threads share one memory system: a multi-node cluster
at 4N executors brings 4N× bandwidth, this sandbox does not. The
calibration separates "engine doesn't scale" from "box doesn't scale".

Writes BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = int(os.environ.get("SCALING_DOCS", "400000"))
PAIRS = [(4, 16), (8, 32)]


def _pyfiles_zip() -> str:
    """Package lucene_spark/ as the spark-submit --py-files artifact."""
    import zipfile

    zpath = os.path.join("/tmp", "lucene_spark_pyfiles.zip")
    src = os.path.join(REPO, "lucene_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _, names in os.walk(src):
            for n in names:
                if n.endswith(".py"):
                    full = os.path.join(dirpath, n)
                    zf.write(full, os.path.relpath(full, REPO))
    return zpath


def run(cpus: int) -> dict:
    env = dict(os.environ, JOB_CPUS=str(cpus), JOB_DOCS=str(DOCS))
    # Pin the whole process tree to exactly `cpus` cores: without this,
    # a local[8] JVM's GC/shuffle/Netty threads and Python workers
    # overflow onto the box's other cores, inflating the small-N
    # baseline and understating scaling. A real 8-core executor
    # confines ALL of that to 8 cores.
    pin = ["taskset", "-c", f"0-{cpus - 1}"]
    if os.environ.get("SCALING_SUBMIT") == "1":
        # the north rule's deployment shape: spark-submit --py-files.
        # JOB_NO_REPO_PATH=1 removes the checkout from sys.path so the
        # import genuinely resolves from the shipped zip.
        env["JOB_NO_REPO_PATH"] = "1"
        cmd = pin + [
            "spark-submit",
            "--master",
            f"local[{cpus}]",
            # builder-set driver memory is ignored under spark-submit
            # (the JVM is already up) — exit 52 OOM at 1.2M docs without it
            "--driver-memory",
            os.environ.get("JOB_DRIVER_MEM", "16g"),
            "--py-files",
            _pyfiles_zip(),
            "--conf",
            "spark.ui.enabled=false",
            os.path.join(REPO, "scripts", "index_job.py"),
        ]
    else:
        cmd = pin + [
            sys.executable,
            os.path.join(REPO, "scripts", "index_job.py"),
        ]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def _calib_work(n: int) -> float:
    """Analyze 2000 docs drawn with the SAME length distribution as the
    synthetic corpus (log-uniform 0..2000 tokens), so docs/sec is
    comparable with the Spark runs."""
    import numpy as np

    from lucene_spark.analysis.analyzer import term_freqs
    from lucene_spark.corpus import build_vocab

    vocab = build_vocab(2000)
    rng = np.random.default_rng(n)
    lens = np.minimum(
        (np.exp(rng.random(2000) * np.log(2001)) - 1.0).astype(np.int64), 2000
    )
    # Zipf token draw like the corpus (head = short stopwords)
    w = 1.0 / np.power(np.arange(1, 2001, dtype=np.float64), 1.07)
    cdf = np.cumsum(w / w.sum())
    texts = [
        " ".join(vocab[np.searchsorted(cdf, rng.random(int(l)), side="left")])
        for l in lens
    ]
    t0 = time.time()
    for t in texts:
        term_freqs(t)
    return time.time() - t0


def calibrate() -> dict:
    """Pure-Python analyzer throughput at each parallelism level —
    the hardware ceiling with zero framework overhead."""
    sys.path.insert(0, REPO)
    out = {}
    for nproc in sorted({c for pair in PAIRS for c in pair}):
        with mp.Pool(nproc) as p:
            res = p.map(_calib_work, range(nproc))
        # slowest worker's analyze time = the parallel wall of the work
        # itself (pool startup / text generation excluded)
        out[nproc] = round(nproc * 2000 / max(res), 1)
    return out


def main() -> None:
    calib = calibrate()
    results = {}
    for n, n4 in PAIRS:
        r_n = results.get(n) or run(n)
        r_4n = results.get(n4) or run(n4)
        results[n] = r_n
        results[n4] = r_4n

    pair_rows = []
    effs = {}
    for n, n4 in PAIRS:
        eff = (results[n4]["docs_per_sec"] / results[n]["docs_per_sec"]) / (n4 / n)
        hw_eff = (calib[n4] / calib[n]) / (n4 / n)
        effs[f"{n}->{n4}"] = {
            "efficiency": round(eff, 3),
            "hw_ceiling_efficiency": round(hw_eff, 3),
            "efficiency_vs_hw_ceiling": round(eff / hw_eff, 3) if hw_eff else None,
        }
        pair_rows.append((n, n4, eff, hw_eff))

    result = {
        "metric": "indexing_scaling_efficiency",
        "value": effs["8->32"]["efficiency"],
        "unit": "ratio",
        "target": 0.8,
        "docs": DOCS,
        "pairs": effs,
        "calibration_docs_per_sec": calib,
        "runs": {f"local[{c}]": r for c, r in results.items()},
    }
    print(json.dumps(result))

    runs_tbl = "\n".join(
        f"| local[{c}] | {r['build_secs']} | {r['docs_per_sec']} | {r['postings_per_sec']} |"
        for c, r in sorted(results.items())
    )
    pairs_tbl = "\n".join(
        f"| {n}→{n4} | {eff:.3f} | {hw:.3f} | {eff / hw:.3f} |"
        for n, n4, eff, hw in pair_rows
    )
    calib_tbl = "\n".join(f"| {c} | {v} |" for c, v in sorted(calib.items()))
    md = f"""# BENCH — scaling evidence (N vs 4N parallelism)

Same seeded synthetic corpus ({DOCS} docs, full Lucene-equivalent
analysis chain), same config, identical job at two parallelism levels
(the sandbox stand-in for N vs 4N executors per BASELINE.md's
measurement protocol). Startup and corpus generation excluded — build
time only.

| parallelism | build secs | docs/sec | postings/sec |
|---|---|---|---|
{runs_tbl}

| pair | scaling efficiency | hardware ceiling (pure Python, no Spark) | efficiency vs ceiling |
|---|---|---|---|
{pairs_tbl}

The build runs the zero-shuffle **aligned** layout (input
range-partitioned by doc_id → segments grouped in-batch, no corpus
exchange; see `InvertedIndex.build(layout=...)`) with the input
partition count pinned across parallelism levels so the N and 4N runs
encode the identical block set.

**Hardware ceiling**: this sandbox is ONE box — all threads share one
memory system, so even pure Python (zero framework overhead) cannot
scale 4× from 8→32 workers on the tokenizer workload. On a real
multi-node cluster 4N executors bring 4N× memory bandwidth, so the
on-cluster expectation tracks the "efficiency vs ceiling" column (the
engine's own scaling after removing the shared-box artifact). Pure
Python calibration (analyzer throughput, docs/sec):

| procs | docs/sec |
|---|---|
{calib_tbl}

Target: ≥ 0.8 (`BASELINE.json`). Generated by
`scripts/scaling_bench.py` at {time.strftime('%Y-%m-%d %H:%M:%S')}.
"""
    # preserve appended sections (e.g. scale_stress.py's scale-up part)
    bench_path = os.path.join(REPO, "BENCH.md")
    appendix = ""
    if os.path.exists(bench_path):
        old = open(bench_path).read()
        pos = old.find("\n## Scale-up stress")
        if pos != -1:
            appendix = old[pos:]
    with open(bench_path, "w") as f:
        f.write(md + appendix)


if __name__ == "__main__":
    main()
