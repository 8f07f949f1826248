"""PII scrubbing (`pipeline/redact.py`) — mask + audit counts."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lucene_spark.pipeline.redact import pii_counts, redact_pii


def _clean(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(redact_pii(F.col("text")).alias("c")).collect()[0]["c"]


def test_email(spark):
    assert (
        _clean(spark, "mail bob.smith+tag@sub.example.co.uk now")
        == "mail <EMAIL> now"
    )


def test_ipv4(spark):
    assert _clean(spark, "from 10.0.255.7 port 80") == "from <IP> port 80"


def test_ssn_before_phone(spark):
    assert _clean(spark, "ssn 123-45-6789 here") == "ssn <SSN> here"


def test_phone_variants(spark):
    assert _clean(spark, "call +1 555-123-4567 ok") == "call <PHONE> ok"
    assert _clean(spark, "call (555) 123 4567 ok") == "call <PHONE> ok"


def test_prose_numbers_survive(spark):
    s = "pi is 3.14 and the year 1984 had 1,000 events"
    assert _clean(spark, s) == s


def test_eight_digit_runs_survive(spark):
    # dates / order ids: 8-digit runs are below the phone shape's
    # 9-digit minimum and must NOT be masked
    s = "order 20250817 shipped, ref 12345678"
    assert _clean(spark, s) == s


def test_kinds_subset(spark):
    df = spark.createDataFrame([("a@b.co at 1.2.3.4",)], "text string")
    out = df.select(
        redact_pii(F.col("text"), kinds=["email"]).alias("c")
    ).collect()[0]["c"]
    assert out == "<EMAIL> at 1.2.3.4"


def test_counts(spark):
    df = spark.createDataFrame(
        [
            ("a@b.co and c@d.org from 1.2.3.4",),
            ("nothing here",),
            ("ssn 123-45-6789",),
        ],
        "text string",
    )
    row = pii_counts(df).collect()[0]
    assert row["n_email"] == 2
    assert row["n_ip"] == 1
    assert row["n_ssn"] == 1
