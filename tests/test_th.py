"""Thai segmentation (ThaiTokenizer/ThaiAnalyzer analogs): reference
fixture parity (TestThaiAnalyzer.java), mixed-script handling,
stopword increments, unknown-run merging."""

from lucene_spark.analysis.th import (
    THAI_STOP,
    thai_analyze,
    thai_segment,
    thai_tokenize,
)


def test_reference_offsets_fixture():
    # TestThaiAnalyzer.testOffsets
    assert thai_tokenize("การที่ได้ต้องแสดงว่างานดี") == [
        "การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี",
    ]


def test_reference_stopwords_fixture():
    # TestThaiAnalyzer.testStopWords: the five function words drop
    assert [t for t, _ in thai_analyze("การที่ได้ต้องแสดงว่างานดี")] == [
        "แสดง", "งาน", "ดี",
    ]
    # positions are pre-stop ordinals (posInc 5,2,1 in the reference)
    assert thai_analyze("การที่ได้ต้องแสดงว่างานดี") == [
        ("แสดง", 4), ("งาน", 6), ("ดี", 7),
    ]


def test_reference_mixed_script_fixture():
    # TestThaiAnalyzer.testReusableTokenStream
    assert [t for t, _ in thai_analyze(
        "บริษัทชื่อ XY&Z - คุยกับ xyz@demo.com"
    )] == ["บริษัท", "ชื่อ", "xy", "z", "คุย", "กับ", "xyz", "demo.com"]


def test_reference_position_increment_fixture():
    # english stopword adjacent to thai with no whitespace still splits
    assert thai_tokenize("การที่ได้ต้องthe แสดงว่างานดี") == [
        "การ", "ที่", "ได้", "ต้อง", "the", "แสดง", "ว่า", "งาน", "ดี",
    ]


def test_longest_match_preferred():
    # นักเรียน stays one token even though นัก/เรียน-ish splits exist
    assert thai_tokenize("เด็กนักเรียนไปโรงเรียน") == [
        "เด็ก", "นักเรียน", "ไป", "โรงเรียน",
    ]


def test_unknown_runs_merge():
    assert thai_segment("กขฃ") == ("กขฃ",)
    assert thai_tokenize("ฉันรักxyzมาก") == ["ฉัน", "รัก", "xyz", "มาก"]


def test_empty_and_stop_sanity():
    assert thai_tokenize("") == []
    assert "การ" in THAI_STOP and "แสดง" not in THAI_STOP
