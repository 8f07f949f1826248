"""CollationKeyAnalyzer / ICUCollationKeyAnalyzer analogs
(`collation/CollationKeyAnalyzer.java:48`,
`icu/ICUCollationKeyAnalyzer.java:49`): locale-aware ordering and
ranges via Spark 4 native collations. UTF8_LCASE is dual-emittable
(lower() byte order); ICU collations are pinned by golden orders."""

import duckdb
from pyspark.sql import functions as F

from lucene_spark.analysis.collation import (
    collation_key,
    collation_range,
    collation_sorted,
)


def _df(spark):
    rows = ["b", "A", "a", "Ω", "é", "E", "z", "Zebra", "apple"]
    return spark.createDataFrame([(s,) for s in rows], "s string")


def test_unicode_root_order_golden(spark):
    got = [r.s for r in collation_sorted(_df(spark), "s", "UNICODE").collect()]
    # ICU root: case-insensitive-ish primary weights, accents after
    # base letters, Greek after Latin (pinned golden, matches the ICU
    # root collation of the bundled JVM)
    assert got == ["a", "A", "apple", "b", "E", "é", "z", "Zebra", "Ω"]


def test_lcase_order_matches_lower_binary(spark):
    df = _df(spark)
    got = [
        r.s for r in collation_sorted(df, "s", "UTF8_LCASE").collect()
    ]
    want = [
        r[0]
        for r in duckdb.sql(
            "SELECT s FROM (VALUES ('b'),('A'),('a'),('Ω'),('é'),('E'),('z'),"
            "('Zebra'),('apple')) t(s) ORDER BY lower(s), s"
        ).fetchall()
    ]
    assert got == want


def test_collation_range_case_insensitive(spark):
    hits = {
        r.s
        for r in collation_range(
            _df(spark), "s", "a", "b", collation="UTF8_LCASE"
        ).collect()
    }
    # lower(s) in ['a', 'b']: a, A, apple, b ('applezz' would too)
    assert hits == {"a", "A", "apple", "b"}


def test_locale_ci_groupby_folds_case(spark):
    df = _df(spark)
    n = (
        df.select(collation_key("s", "en_CI").alias("k"))
        .groupBy("k")
        .count()
        .count()
    )
    # en_CI folds ONLY case: of the 9 strings, a==A merge (é != E,
    # accents are not case) -> 8 distinct keys
    assert n == 8
