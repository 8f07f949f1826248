"""UAX#29 scanner goldens (the adversarial corpus from the r2 verdict:
emoji sequences, Thai/SEA, apostrophes, Hebrew quotes, keycaps, flags,
marks, 255-chop) + ASCII fast-path equivalence.

Expectations pinned from the UAX#29 spec rules as composed by the
reference grammar (`analysis/standard/StandardTokenizerImpl.jflex`):
token text includes WB4-absorbed Extend/Format marks.
"""

from hypothesis import given, settings, strategies as st

from lucene_spark.analysis.uax29 import (
    _ASCII_WORD,
    uax29_tokenize,
    uax29_url_email_tokenize,
)

GOLDENS = [
    # ALPHANUM / NUM with mid joins (WB5-13b)
    ("Hello, World! foo-bar", ["Hello", "World", "foo", "bar"]),
    ("can't o'clock a.b", ["can't", "o'clock", "a.b"]),
    ("don’t", ["don’t"]),  # U+2019 is MidNumLet
    ("3.14 1,000 2.5.6", ["3.14", "1,000", "2.5.6"]),
    ("1;2 a:b", ["1;2", "a:b"]),  # MidNum ';', MidLetter ':'
    ("a, b .5 x.", ["a", "b", "5", "x"]),
    ("foo_bar x_1 _lead trail_", ["foo_bar", "x_1", "_lead", "trail_"]),
    ("letters2numbers9", ["letters2numbers9"]),  # WB9/WB10
    # scripts
    ("漢字です", ["漢", "字", "で", "す"]),
    ("カタカナtest", ["カタカナ", "test"]),
    ("ひらがな", ["ひ", "ら", "が", "な"]),
    ("한국어 조선말", ["한국어", "조선말"]),
    ("Ｆｕｌｌｗｉｄｔｈ１２３", ["Ｆｕｌｌｗｉｄｔｈ１２３"]),
    # SEA runs stay whole (LB:Complex_Context)
    ("สวัสดีครับ", ["สวัสดีครับ"]),
    ("ไทยtest ลาว", ["ไทย", "test", "ลาว"]),
    ("ភាសាខ្មែរ", ["ភាសាខ្មែរ"]),  # Khmer incl. coeng marks
    # Hebrew quote rules (WB7a-c)
    ('מנכ"ל', ['מנכ"ל']),
    ("אבג' x", ["אבג'", "x"]),
    ('abc"def', ["abc", "def"]),
    # combining marks absorb into the token (WB4)
    ("café time", ["café", "time"]),
    ("x​ y", ["x", "y"]),  # ZWSP breaks (not Format)
    # emoji sequences (UTS#51)
    ("👍🏽 ok", ["👍🏽", "ok"]),  # modifier sequence
    ("👩‍👩‍👧‍👦!", ["👩‍👩‍👧‍👦"]),  # zwj chain
    ("🇺🇸🇫🇷", ["🇺🇸", "🇫🇷"]),  # flag pairs split 2-by-2
    ("☕☀️", ["☕", "☀️"]),  # presentation selector absorbed
    ("#️⃣ tag", ["#️⃣", "tag"]),  # keycap
    ("© 2024", ["©", "2024"]),  # accidental emoji char alone
]


def test_goldens():
    for text, want in GOLDENS:
        assert uax29_tokenize(text) == want, (text, uax29_tokenize(text))


def test_ascii_fast_path_equivalent():
    """For ASCII input the single-regex path must equal the scanner."""

    @settings(max_examples=500, deadline=None)
    @given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=120))
    def check(text):
        assert _ASCII_WORD.findall(text) == _scan(text)

    def _scan(text):
        # force the full scanner by detouring around isascii()
        from lucene_spark.analysis import uax29 as m

        r = m._rules()
        out, pos, n = [], 0, len(text)
        while pos < n:
            ms = r["skip"].match(text, pos)
            if ms:
                pos = ms.end()
                continue
            best = None
            for key in ("emoji", "word", "sea", "han", "hira"):
                mm = r[key].match(text, pos)
                if mm and mm.end() > pos and (best is None or mm.end() > best.end()):
                    best = mm
                if best is not None and key == "word":
                    break
            if best is None:
                pos += 1
                continue
            out.append(best.group(0))
            pos = best.end()
        return out

    check()


def test_stretch_dispatch_equivalent_to_full_scan():
    """The round-4 island dispatch (ASCII regex between whitespace-
    expanded non-ASCII islands, rule scanner inside) must be
    token-identical to running the rule scanner over the whole text —
    the exact pre-dispatch behavior."""
    from lucene_spark.analysis import uax29 as m

    @settings(max_examples=400, deadline=None)
    @given(
        st.text(max_size=120),
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60),
    )
    def check(uni, asc):
        text = asc + uni + " " + asc  # guarantee a mixed shape often
        if text.isascii():
            return
        got = m.uax29_tokenize_spans(text)
        want = m._rule_scan(text, 0, len(text))
        assert got == want, (text, got, want)

    check()


def test_no_crash_on_arbitrary_unicode():
    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=80))
    def check(text):
        toks = uax29_tokenize(text)
        for t in toks:
            assert t  # non-empty
            assert t in text or all(ch in text for ch in t)

    check()


def test_url_email():
    assert uax29_url_email_tokenize(
        "visit https://ex.com/a?b=c or mail bob.smith@foo.org now"
    ) == ["visit", "https://ex.com/a?b=c", "or", "mail", "bob.smith@foo.org", "now"]
    assert uax29_url_email_tokenize("www.example.co.uk/path x") == [
        "www.example.co.uk/path",
        "x",
    ]
    assert uax29_url_email_tokenize("not@@an.email") == ["not", "an.email"]
