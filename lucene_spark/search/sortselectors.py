"""Multi-valued sort fields — SortedNumeric/SortedSetSortField analogs.

References: `lucene/core/src/java/org/apache/lucene/search/
SortedNumericSortField.java:43` + `SortedNumericSelector.java`
(MIN/MAX selection over a doc's numeric value set),
`SortedSetSortField.java:48` + `SortedSetSelector.java`
(MIN/MAX/MIDDLE_MIN/MIDDLE_MAX over a doc's term set),
`comparators/LongComparator.java` (a null ``missingValue`` sorts
numeric docs as 0), ``SortField.STRING_FIRST/STRING_LAST`` (where the
empty set sorts for string fields; FIRST is the default).

Every selector is a codegen'd Column over the array column — no UDF,
no shuffle beyond the TakeOrderedAndProject top-k.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "selected_numeric_key",
    "selected_string_key",
    "sorted_numeric_topk",
    "sorted_set_topk",
]

_NUM_SELECTORS = ("min", "max")
_SET_SELECTORS = ("min", "max", "middle_min", "middle_max")


def selected_numeric_key(
    col: Column, selector: str = "min", missing_value: float = 0
) -> Column:
    """SortedNumericSelector.wrap + the LongComparator missing rule:
    the empty set takes ``missing_value`` (0 unless setMissingValue)."""
    if selector not in _NUM_SELECTORS:
        raise ValueError(f"numeric selector must be one of {_NUM_SELECTORS}")
    val = F.array_min(col) if selector == "min" else F.array_max(col)
    absent = col.isNull() | (F.size(col) == 0)
    return F.when(absent, F.lit(missing_value)).otherwise(val)


def selected_string_key(col: Column, selector: str = "min") -> Column:
    """SortedSetSelector.wrap: MIN/MAX/MIDDLE_MIN/MIDDLE_MAX over the
    doc's sorted term set (middle = middle ord; ties toward min/max
    for even counts — SortedSetSelector.java:48).  Empty sets yield
    NULL; the sort direction helpers place them FIRST or LAST."""
    if selector not in _SET_SELECTORS:
        raise ValueError(f"set selector must be one of {_SET_SELECTORS}")
    s = F.array_sort(col)
    n = F.size(col)
    if selector == "min":
        key = s.getItem(0)
    elif selector == "max":
        key = F.element_at(s, n)
    elif selector == "middle_min":
        key = F.element_at(s, ((n - 1) / 2).cast("int") + 1)
    else:  # middle_max
        key = F.element_at(s, (n / 2).cast("int") + 1)
    return F.when(col.isNull() | (n == 0), F.lit(None)).otherwise(key)


def sorted_numeric_topk(
    docs: DataFrame,
    array_col: str,
    selector: str = "min",
    reverse: bool = False,
    missing_value: float = 0,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k docs by the selected numeric value (docID tie-break)."""
    key = selected_numeric_key(F.col(array_col), selector, missing_value)
    order = key.desc() if reverse else key.asc()
    return (
        docs.select(F.col(id_col), key.alias("sort_key"))
        .orderBy(order, F.col(id_col).asc())
        .limit(k)
    )


def sorted_set_topk(
    docs: DataFrame,
    array_col: str,
    selector: str = "min",
    reverse: bool = False,
    missing: str = "first",
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k docs by the selected term (STRING_FIRST default /
    STRING_LAST for the empty set)."""
    if missing not in ("first", "last"):
        raise ValueError("missing must be 'first' or 'last'")
    key = selected_string_key(F.col(array_col), selector)
    # STRING_FIRST/STRING_LAST name the position in the RESULT order,
    # regardless of reverse (SortField.setMissingValue docs)
    if reverse:
        order = key.desc_nulls_first() if missing == "first" else key.desc_nulls_last()
    else:
        order = key.asc_nulls_first() if missing == "first" else key.asc_nulls_last()
    return (
        docs.select(F.col(id_col), key.alias("sort_key"))
        .orderBy(order, F.col(id_col).asc())
        .limit(k)
    )
