"""benchmark/byTask analog — declarative .alg benchmark algorithms.

References: `lucene/benchmark/src/java/org/apache/lucene/benchmark/
byTask/Benchmark.java:38` (the .alg runner), `byTask/utils/Algorithm.java`
(the parser), `byTask/tasks/TaskSequence.java`, `tasks/*.java` (the
task vocabulary), `byTask/stats/TaskStats.java` + `RepSumByNameTask`
(the report).

Supported .alg subset (the constructs the shipped conf/*.alg files
use on their serial path):

- property lines ``key=value``; multi-value round properties
  ``key=col:v1:v2:v3`` advance on ``NewRound`` exactly like the
  reference ("multi val params are iterated by NewRound's",
  conf/micro-standard.alg header);
- ``#`` comments;
- serial sequences ``{ "Name" ... } : N`` with repetition counts;
  ``>`` before ``: N`` collapses per-iteration stats into one line
  (`TaskSequence.setNoChildReport`);
- a ``-`` task prefix disables that task's report line
  (`Algorithm.java` '-' handling);
- tasks: ResetSystemErase, CreateIndex, AddDoc / AddDocs(n),
  ForceMerge(n), CloseIndex, OpenReader, Search, CountingSearch,
  SearchTrav(n), SearchWithSort, Warm, CloseReader, NewRound,
  RepSumByName (`tasks/SearchTask.java`, `CountingSearchTask`,
  `SearchTravTask`, `SearchWithSortTask`, `WarmTask`).

Parallel sequences ``[ ... ]`` run SEQUENTIALLY here by design: the
driver is an orchestrator and each task is already a cluster-parallel
Spark job — thread-level driver parallelism would only interleave job
submission.  A warning is recorded in the run log when one is seen.

Engine binding: ``AddDoc`` iterations count docs out of the supplied
corpus DataFrame (the ContentSource role); ``CloseIndex`` builds the
index over the docs added so far in one distributed build — the batch
analog of the reference's per-doc IndexWriter adds.  ``Search`` cycles
a fixed query list (the QueryMaker role) through the BM25 engine.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, functions as F

__all__ = ["parse_algorithm", "run_algorithm", "AlgorithmError"]


class AlgorithmError(ValueError):
    pass


@dataclass
class Task:
    name: str
    arg: Optional[float] = None
    report: bool = True


@dataclass
class Seq:
    name: str
    children: list = field(default_factory=list)
    reps: int = 1
    parallel: bool = False
    collapse: bool = False  # '>' — one report line for all reps


_TOK = re.compile(
    r"""(?P<comment>\#[^\n]*) | (?P<lbrace>\{) | (?P<rbrace>\}) |
        (?P<lbrack>\[) | (?P<rbrack>\]) |
        (?P<name>"[^"]*") | (?P<colon>:\s*\d+) | (?P<gt>>) |
        (?P<task>-?[A-Za-z_][A-Za-z0-9_]*(?:\(\s*[\d.]*\s*\))?) |
        (?P<ws>\s+)""",
    re.VERBOSE,
)


def _parse_props(lines: List[str]) -> Dict[str, object]:
    """Property lines; ``k=col:v1:v2`` becomes a round-iterated list."""
    props: Dict[str, object] = {}
    for ln in lines:
        k, v = ln.split("=", 1)
        k, v = k.strip(), v.split("#")[0].strip()
        if ":" in v:
            parts = v.split(":")
            props[k] = {"column": parts[0], "values": parts[1:]}
        else:
            props[k] = v
    return props


def parse_algorithm(text: str) -> Tuple[Dict[str, object], Seq]:
    """.alg text → (properties, root task sequence)."""
    prop_lines, body_parts, in_body = [], [], False
    for ln in text.splitlines():
        stripped = ln.split("#")[0].strip()
        if not in_body:
            if not stripped:
                continue
            if re.match(r"^[\w.]+\s*=", stripped):
                prop_lines.append(stripped)
                continue
            in_body = True  # first non-property, non-comment line
        body_parts.append(ln)
    props = _parse_props(prop_lines)
    body = "\n".join(body_parts)

    root = Seq(name="Root")
    stack = [root]
    pos = 0
    while pos < len(body):
        m = _TOK.match(body, pos)
        if not m:
            raise AlgorithmError(f"cannot parse at {body[pos:pos+25]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        if kind in ("lbrace", "lbrack"):
            seq = Seq(name="Seq", parallel=(kind == "lbrack"))
            stack[-1].children.append(seq)
            stack.append(seq)
        elif kind == "name":
            stack[-1].name = m.group(0).strip('"')
        elif kind in ("rbrace", "rbrack", "gt"):
            # '>' is the alternate sequence CLOSE that also collapses
            # child reports into one line ("{ \"MAddDocs\" AddDoc > :
            # 2000" in conf/micro-standard.alg — no '}' follows)
            if len(stack) == 1:
                raise AlgorithmError("unbalanced sequence close")
            if kind == "gt":
                stack[-1].collapse = True
            stack.pop()
        elif kind == "colon":
            reps = int(m.group(0)[1:].strip())
            if not stack[-1].children:
                raise AlgorithmError("repetition count with no preceding task")
            tgt = stack[-1].children[-1]
            if isinstance(tgt, Seq):
                tgt.reps = reps
            else:
                # bare "Task : N" — wrap in a sequence
                stack[-1].children[-1] = Seq(
                    name=tgt.name, children=[tgt], reps=reps
                )
        elif kind == "task":
            raw = m.group(0)
            report = not raw.startswith("-")
            raw = raw.lstrip("-")
            am = re.match(r"([A-Za-z_][A-Za-z0-9_]*)(?:\(\s*([\d.]*)\s*\))?$", raw)
            name, arg = am.group(1), am.group(2)
            stack[-1].children.append(
                Task(name, float(arg) if arg else None, report)
            )
    if len(stack) != 1:
        raise AlgorithmError("unbalanced sequence open")
    return props, root


@dataclass
class _Stat:
    name: str
    round: int
    run_cnt: int = 0
    recs: int = 0
    elapsed: float = 0.0


class _Runner:
    def __init__(self, spark, corpus: DataFrame, props: Dict[str, object],
                 queries: Optional[List[dict]] = None, k: int = 10):
        self.spark = spark
        self.corpus = corpus
        self.props = props
        self.queries = queries or [{"hash": 1.0}, {"merge": 1.0, "scan": 0.5}]
        self.k = k
        self.round = 0
        self.added = 0
        self.index = None
        self.reader_open = False
        self.qcursor = 0
        self.stats: List[_Stat] = []
        self.warnings: List[str] = []

    # -- property view (round-iterated values pick by round index) ---------
    def prop(self, key: str, default=None):
        v = self.props.get(key, default)
        if isinstance(v, dict) and "values" in v:
            vals = v["values"]
            return vals[self.round % len(vals)]
        return v

    def _record(self, name: str, recs: int, elapsed: float, report: bool):
        if not report:
            return
        st = _Stat(name, self.round, 1, recs, elapsed)
        self.stats.append(st)

    # -- task implementations ---------------------------------------------
    def run_task(self, t: Task):
        t0 = time.time()
        recs = 1
        n = t.name
        if n == "ResetSystemErase":
            if self.index is not None:
                self.index.unpersist()
            self.index, self.added, self.reader_open = None, 0, False
        elif n == "CreateIndex":
            self.index, self.added = None, 0
        elif n == "AddDoc":
            self.added += 1
        elif n == "AddDocs":
            self.added += int(t.arg or 1)
            recs = int(t.arg or 1)
        elif n == "ForceMerge":
            if t.arg is not None and int(t.arg) != 1:
                raise AlgorithmError(
                    "ForceMerge(n): only maxNumSegments=1 is supported"
                )
            self._ensure_index()
            from .index.merge import force_merge

            self.index = force_merge(self.index)
        elif n == "CloseIndex":
            self._ensure_index()
        elif n == "OpenReader":
            self._ensure_index()
            self.reader_open = True
        elif n == "CloseReader":
            self.reader_open = False
        elif n in ("Search", "CountingSearch", "SearchTrav", "SearchWithSort", "Warm"):
            if not self.reader_open:
                self._ensure_index()
            if n != "Warm":
                # WarmTask is not a QueryMaker consumer — it must not
                # shift which queries later Search tasks execute
                q = self.queries[self.qcursor % len(self.queries)]
                self.qcursor += 1
            if n == "Warm":
                # WarmTask: touch every live doc once (no query)
                recs = self.index.norms.count()
            elif n == "CountingSearch":
                # CountingSearchTask: count hits, no top-k materialization
                from .search.parity import _bm25_scored_f64

                recs = _bm25_scored_f64(self.index, q).count()
            elif n == "SearchTrav":
                # SearchTravTask(n): traverse up to arg hits of the result
                from .search.parity import bm25_topk_f64

                lim = int(t.arg) if t.arg else self.k
                recs = len(bm25_topk_f64(self.index, q, k=lim).collect())
            elif n == "SearchWithSort":
                # SearchWithSortTask: hits ordered by docID instead of score
                from .search.parity import _bm25_scored_f64

                recs = len(
                    _bm25_scored_f64(self.index, q)
                    .orderBy("doc_id")
                    .limit(self.k)
                    .collect()
                )
            else:
                from .search.parity import bm25_topk_f64

                recs = len(bm25_topk_f64(self.index, q, k=self.k).collect())
        elif n == "NewRound":
            self.round += 1
        elif n == "RepSumByName":
            # report task: zero-cost marker, the report is read off at end
            pass
        else:
            raise AlgorithmError(f"unknown task {t.name!r}")
        self._record(n, recs, time.time() - t0, t.report)

    def _ensure_index(self):
        if self.index is None:
            from .index.builder import InvertedIndex

            if self.added > 0:
                # deterministic "first n docs" — a bare limit(n) lets
                # Spark pick ANY n rows, which would make Search recs
                # vary across runs/partitionings
                corpus = self.corpus.orderBy("doc_id").limit(self.added)
            else:
                # no AddDoc before CloseIndex: an EMPTY index, exactly
                # like the reference writer with zero adds
                corpus = self.corpus.limit(0)
            self.index = InvertedIndex.build(
                corpus,
                analyzer="simple",
                docs_per_segment=int(self.prop("docs.per.segment", 2048)),
            )

    def run_seq(self, s: Seq):
        if s.parallel:
            self.warnings.append(
                f"parallel sequence {s.name!r} run sequentially (driver "
                "orchestrates; Spark parallelizes inside each task)"
            )
        t0 = time.time()
        before = len(self.stats)
        for _ in range(s.reps):
            for child in s.children:
                if isinstance(child, Seq):
                    self.run_seq(child)
                else:
                    self.run_task(child)
        if s.collapse and len(self.stats) > before:
            # one line for the whole repetition (setNoChildReport)
            merged = self.stats[before:]
            del self.stats[before:]
            self.stats.append(
                _Stat(
                    f"Seq_{s.name}_{len(merged)}",
                    self.round,
                    len(merged),
                    sum(m.recs for m in merged),
                    time.time() - t0,
                )
            )


def run_algorithm(
    spark,
    corpus: DataFrame,
    algorithm: str,
    queries: Optional[List[dict]] = None,
    k: int = 10,
) -> dict:
    """Run an .alg string against the engine.

    Returns {"report": [rows], "by_name": [rows], "props": ...,
    "warnings": [...]} — ``report`` is the per-task-execution table
    (TaskStats), ``by_name`` the RepSumByName aggregation (count,
    total recs, total+average elapsed per task name).
    """
    props, root = parse_algorithm(algorithm)
    r = _Runner(spark, corpus, props, queries=queries, k=k)
    r.run_seq(root)
    report = [
        {
            "op": st.name,
            "round": st.round,
            "runCnt": st.run_cnt,
            "recs": st.recs,
            "elapsedSec": round(st.elapsed, 4),
        }
        for st in r.stats
    ]
    by: Dict[str, dict] = {}
    for st in r.stats:
        agg = by.setdefault(
            st.name, {"op": st.name, "runCnt": 0, "recs": 0, "elapsedSec": 0.0}
        )
        agg["runCnt"] += st.run_cnt
        agg["recs"] += st.recs
        agg["elapsedSec"] += st.elapsed
    by_name = [
        {**v, "elapsedSec": round(v["elapsedSec"], 4)}
        for _, v in sorted(by.items())
    ]
    return {
        "report": report,
        "by_name": by_name,
        "props": props,
        "rounds": r.round + 1,
        "warnings": r.warnings,
    }
