"""In-place numeric doc-values updates (no reindex).

Re-expression of ``IndexWriter.updateNumericDocValue(Term, field,
value)`` (`core/src/java/org/apache/lucene/index/IndexWriter.java`
updateNumericDocValue / ``DocValuesUpdate.NumericDocValuesUpdate`` in
`index/DocValuesUpdate.java:105`): set a numeric doc-values field to a
new value for every doc matching a term, WITHOUT reindexing the doc —
the classic use is live relevance boosts or click counters riding next
to an immutable text index. Updates stack; for a doc matched by
several, the LAST update wins (the reference applies them in delGen
order, `index/ReadersAndUpdates.java`).

Spark shape: the base doc-values table stays immutable; updates are an
ordered overlay log of (match-set, field, value). ``resolved()``
collapses the log with ONE ``max_by(value, seq)`` groupBy per updated
field plus one left join onto the base — never a join per update, so a
thousand stacked updates still cost a bounded number of shuffles
(#distinct-fields, not #updates). At 100 TB the overlay frames are
usually tiny next to the base (AQE broadcasts them at runtime; a rare
whole-corpus update degrades to one sort-merge join, still bounded);
the base is never rewritten, exactly like the reference's sidecar
``.dvd`` update files.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame, functions as F

__all__ = ["DocValuesUpdates"]


class DocValuesUpdates:
    """An ordered overlay of numeric doc-values updates over a base
    (doc_id, field...) table. Immutable-style: each ``update_numeric``
    returns a new instance sharing the base."""

    def __init__(
        self,
        base: DataFrame,
        id_col: str = "doc_id",
        _log: Tuple[Tuple[DataFrame, str, float], ...] = (),
    ) -> None:
        self.base = base
        self.id_col = id_col
        self._log = _log

    def update_numeric(
        self, match_docs: DataFrame, field: str, value: float
    ) -> "DocValuesUpdates":
        """Queue ``field = value`` for every doc id in `match_docs`
        (one column: the id). Equivalent of one
        ``updateNumericDocValue(term, field, value)`` call where
        `match_docs` is the term's posting list."""
        if field not in self.base.columns:
            raise ValueError(f"unknown doc-values field {field!r}")
        entry = (match_docs.select(self.id_col).distinct(), field, float(value))
        return DocValuesUpdates(self.base, self.id_col, self._log + (entry,))

    def resolved(self) -> DataFrame:
        """The base with all queued updates applied, last-wins per
        (doc, field). Schema identical to the base."""
        if not self._log:
            return self.base
        out = self.base
        fields = sorted({f for _, f, _ in self._log})
        for field in fields:
            parts: List[DataFrame] = []
            for seq, (docs, f_name, value) in enumerate(self._log):
                if f_name != field:
                    continue
                parts.append(
                    docs.select(
                        F.col(self.id_col),
                        F.lit(seq).alias("_seq"),
                        F.lit(value).alias("_val"),
                    )
                )
            ups = parts[0]
            for p in parts[1:]:
                ups = ups.unionByName(p)
            last = ups.groupBy(self.id_col).agg(
                F.max_by("_val", "_seq").alias("_upd")
            )
            out = (
                out.join(last, self.id_col, "left")
                .withColumn(field, F.coalesce(F.col("_upd"), F.col(field)))
                .drop("_upd")
            )
        return out
