"""Telugu normalizer/stemmer and Romanian normalizer vs the
reference's own goldens (TestTeluguNormalizer, TestTeluguStemmer,
TestRomanianAnalyzer normalization)."""

from lucene_spark.analysis.indic import telugu_normalize, telugu_stem
from lucene_spark.analysis.normalize import normalize_token, romanian_normalize


def test_telugu_normalizer_goldens():
    # TestTeluguNormalizer: matra shortening, visarga removal, vowels
    assert telugu_normalize("పదాలూ") == "పదాలు"
    assert telugu_normalize("అబ్బాయీ") == "అబ్బాయి"
    assert telugu_normalize("ఃౌైాిు") == "ౌైాిు"
    assert telugu_normalize("ఔఐఆఈఊ") == "ఓఏఅఇఉ"


def test_telugu_normalizer_compositions():
    # decomposed ai matra; o+length -> oo; o+au-matra -> au; zwj/zwnj
    assert telugu_normalize("ై") == "ై"
    assert telugu_normalize("ఒౕ") == "ఓ"
    assert telugu_normalize("ఒౌ") == "ఔ"
    assert telugu_normalize("క‍ఖ‌గః") == "కఖగ"
    # candrabindu folds to bindu
    assert telugu_normalize("ఀఁ") == "ంం"


def test_telugu_stemmer_goldens():
    # TestTeluguStemmer plurals + verbs
    assert telugu_stem("వస్తువులు") == "వస్తువు"
    assert telugu_stem("పన్నులు") == "పన్ను"
    assert telugu_stem("చేపిస్తున్నది") == "చేపిస్తున్న"
    assert telugu_stem("చేపిస్తున్నడు") == "చేపిస్తున్న"


def test_telugu_stemmer_length_guards():
    # too-short words keep their suffixes (len>2 / len>3 / len>5)
    assert telugu_stem("ిు") == "ిు"
    # len 3 misses the 2-char strip (needs > 3) but cascades into the
    # 1-char matra strip (len > 2) — the reference's exact fall-through
    assert telugu_stem("కడు") == "కడ"


def test_romanian_normalizer():
    # cedilla s/t -> comma-below (RomanianNormalizer.java)
    assert romanian_normalize("peţişoară") == "pețișoară"
    assert romanian_normalize("ŞŢ") == "ȘȚ"
    assert normalize_token("ro", "aşa") == "așa"
