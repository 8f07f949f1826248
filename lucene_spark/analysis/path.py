"""Path hierarchy tokenization — PathHierarchyTokenizer analogs.

Re-expresses
`lucene/analysis/common/src/java/org/apache/lucene/analysis/path/PathHierarchyTokenizer.java:35`
(forward: ``/a/b/c`` → ``/a``, ``/a/b``, ``/a/b/c``) and
`ReversePathHierarchyTokenizer.java:38` (reverse: ``/a/b/c`` →
``/a/b/c``, ``a/b/c``, ``b/c``, ``c``), with the reference's
``delimiter``/``replacement``/``skip`` knobs. Trailing delimiters
produce the trailing variant exactly as the fixtures show
(`TestPathHierarchyTokenizer.java:52` keeps ``/a/b/c/``).

The forward prefix expansion ALSO ships as a pure-Column variant
(`path_prefixes_col`) built from split + sequence + transform — JVM
expressions only, so faceting a 100 TB URL-path column by hierarchy
level is a zero-Python, zero-shuffle projection feeding a normal
partial-agg'd groupBy.
"""

from __future__ import annotations

from typing import List, Optional

__all__ = ["path_tokens", "reverse_path_tokens", "path_prefixes_col"]


def path_tokens(
    s: str,
    delimiter: str = "/",
    replacement: Optional[str] = None,
    skip: int = 0,
) -> List[str]:
    """Forward hierarchy: cumulative prefixes, one per level; a
    trailing delimiter adds the trailing variant. With ``skip`` > 0
    the first ``skip`` levels drop and every remaining token gains a
    leading delimiter (`TestPathHierarchyTokenizer.java:194`:
    ``a/b/c`` skip=1 → ``/b``, ``/b/c``)."""
    rep = delimiter if replacement is None else replacement
    if not s:
        return []
    trailing = s.endswith(delimiter)
    body = s[:-1] if trailing else s
    parts = body.split(delimiter)
    lead = ""
    if parts and parts[0] == "":
        parts = parts[1:]
        lead = delimiter
    if skip > 0:
        if skip >= len(parts):
            return []
        parts = parts[skip:]
        lead = delimiter
    toks = [lead + delimiter.join(parts[:i + 1]) for i in range(len(parts))]
    if trailing and toks:
        toks.append(toks[-1] + delimiter)
    if rep != delimiter:
        toks = [t.replace(delimiter, rep) for t in toks]
    return [t for t in toks if t and t != rep]


def reverse_path_tokens(
    s: str,
    delimiter: str = "/",
    replacement: Optional[str] = None,
    skip: int = 0,
) -> List[str]:
    """Reverse hierarchy: suffixes starting at each level
    (`TestReversePathHierarchyTokenizer.java:39`: ``/a/b/c`` →
    /a/b/c, a/b/c, b/c, c). With ``skip`` the last ``skip`` levels
    drop and the remainder keeps its trailing delimiter (`:132`:
    ``a/b/c`` skip=1 → ``a/b/``, ``b/``)."""
    rep = delimiter if replacement is None else replacement
    if not s:
        return []
    body = s[:-1] if s.endswith(delimiter) else s
    starts = [0] + [i + 1 for i, ch in enumerate(body) if ch == delimiter]
    if skip > 0:
        if skip >= len(starts):
            return []
        s = s[:starts[len(starts) - skip]]
        starts = starts[:len(starts) - skip]
    toks = [s[st:] for st in starts]
    if rep != delimiter:
        toks = [t.replace(delimiter, rep) for t in toks]
    return [t for t in toks if t and t != rep]


def path_prefixes_col(col, delimiter: str = "/"):
    """Pure-Column forward hierarchy over a path/URL-path column:
    array of prefixes, one per level — split + sequence + transform,
    WholeStageCodegen-friendly, no Python."""
    from pyspark.sql import functions as F

    parts = F.split(col, delimiter)
    # level i prefix = first i+1 parts rejoined; empty leading part
    # (absolute paths) folds into the first prefix like the reference
    return F.filter(
        F.transform(
            F.sequence(F.lit(1), F.size(parts)),
            lambda i: F.array_join(F.slice(parts, 1, i), delimiter),
        ),
        lambda p: (p != F.lit("")) & (p != F.lit(delimiter)),
    )
