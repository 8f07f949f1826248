"""TREC quality-benchmark I/O: topics, qrels and run submissions
(`benchmark/quality/trec/TrecTopicsReader.java:47`,
`trec/TrecJudge.java:31`, `utils/SubmissionReport.java:32`).

Parses the classic TREC formats into DataFrames that plug straight
into `search/quality.py`:

- topics:   ``<top> <num> Number: N <title> … <desc> … <narr> … </top>``
  → (query_id, title, description, narrative)
- qrels:    ``qnum 0 doc-name is-relevant`` → (query_id, doc_id, grade)
  — like TrecJudge only non-zero judgments are retained
- run file: the six-column ``qid Q0 doc rank score tag`` submission
  format, both writer (from a quality_stats-shaped run DataFrame) and
  reader.

Parsers are driver-side (topic/qrel files are tiny control inputs —
thousands of rows against a 100 TB corpus); the resulting DataFrames
broadcast into the metric joins.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "parse_trec_topics",
    "parse_qrels",
    "parse_trec_run",
    "format_trec_run",
    "trec_topics_df",
    "qrels_df",
]


def parse_trec_topics(text: str) -> List[dict]:
    """TrecTopicsReader.readQueries: SGML-ish <top> blocks; the id is
    whatever follows ':' on the <num> line, title is the rest of the
    <title> line (or the following line when inline-empty)."""
    out = []
    lines = text.splitlines()
    i = 0
    n = len(lines)

    def skip_to(tag):
        nonlocal i
        while i < n:
            ln = lines[i].strip()
            i += 1
            if ln.startswith("#"):
                continue
            if ln.startswith(tag):
                return ln
        return None

    while True:
        if skip_to("<top>") is None:
            break
        num_ln = skip_to("<num>")
        if num_ln is None:
            break
        qid = num_ln.split(":", 1)[1].strip() if ":" in num_ln else ""
        title_ln = skip_to("<title>")
        title = title_ln.split(">", 1)[1].strip() if title_ln else ""
        if not title and i < n:
            title = lines[i].strip()
            i += 1
        skip_to("<desc>")
        desc_parts = []
        while i < n and not lines[i].startswith("<narr>"):
            desc_parts.append(lines[i].strip())
            i += 1
        i += 1  # consume <narr>
        narr_parts = []
        while i < n and not lines[i].startswith("</top>"):
            narr_parts.append(lines[i].strip())
            i += 1
        i += 1  # consume </top>
        out.append(
            {
                "query_id": qid,
                "title": title,
                "description": " ".join(p for p in desc_parts if p).strip(),
                "narrative": " ".join(p for p in narr_parts if p).strip(),
            }
        )
    return out


def parse_qrels(text: str) -> List[Tuple[str, str, int]]:
    """TrecJudge qrels lines ``qnum 0 doc-name is-relevant``; comments
    and blanks skipped; zero-graded rows dropped (TrecJudge.java:72
    keeps only relevant docs)."""
    out = []
    for ln in text.splitlines():
        ln = ln.strip()
        if not ln or ln.startswith("#"):
            continue
        parts = ln.split()
        if len(parts) != 4:
            raise ValueError(f"wrong qrels format: {ln!r}")
        qid, _zero, doc, grade = parts
        g = int(grade)
        if g != 0:
            out.append((qid, doc, g))
    return out


def parse_trec_run(text: str) -> List[Tuple[str, str, int, float]]:
    """Six-column submission rows ``qid Q0 doc rank score tag``."""
    out = []
    for ln in text.splitlines():
        ln = ln.strip()
        if not ln or ln.startswith("#"):
            continue
        qid, _q0, doc, rank, score, _tag = ln.split()
        out.append((qid, doc, int(rank), float(score)))
    return out


def format_trec_run(rows, tag: str = "lucene_spark") -> str:
    """SubmissionReport.report line format: ``qid Q0 doc rank score
    tag`` (rank ascending per query)."""
    lines = []
    for qid, doc, rank, score in rows:
        lines.append(f"{qid} Q0 {doc} {rank} {score:.4f} {tag}")
    return "\n".join(lines)


def trec_topics_df(spark: SparkSession, text: str) -> DataFrame:
    rows = [
        (t["query_id"], t["title"], t["description"], t["narrative"])
        for t in parse_trec_topics(text)
    ]
    return spark.createDataFrame(
        rows, "query_id string, title string, description string, "
        "narrative string"
    )


def qrels_df(spark: SparkSession, text: str) -> DataFrame:
    return spark.createDataFrame(
        parse_qrels(text), "query_id string, doc_id string, grade int"
    )
