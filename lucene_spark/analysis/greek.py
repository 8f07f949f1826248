"""Greek analysis: GreekLowerCaseFilter + GreekStemmer analogs.

Re-expresses the reference's Greek chain
(`lucene/analysis/common/src/java/org/apache/lucene/analysis/el/GreekAnalyzer.java`,
`GreekLowerCaseFilter.java:53` tonos/dialytika folding + final-sigma
standardization, `GreekStemmer.java:32` — the Ntais/Saroukos stemmer:
22 ordered rules plus the rule-21 "long list" applied only when rules
0–20 left the word untouched, each rule an ends-with table with
exact-match exception sets that re-attach part of the suffix).

Two deliberate fidelity points, both encoded by the reference's own
343-vector `TestGreekStemmer.java` fixture (all of which this module
reproduces exactly — see `tests/test_greek.py`):

- several Java conditions rely on `&&` binding tighter than `||`
  (e.g. rule 0's `len > 6 && ends("σκαγιου") || ends("σκαγιων") …`,
  rule 8's tier chain), so the length guard applies ONLY to the first
  alternative; this implementation replicates that exact semantics
  rather than the (probably intended) fully-guarded reading.
- exception sets match the ENTIRE current stem
  (`CharArraySet.contains(s, 0, len)`), not a suffix.

Scale shape: per-token pure function, memoized per unique token,
applied inside the existing Arrow-batched analysis UDFs — zero extra
Spark stages (same contract as `analysis/snowball.py`).
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd

__all__ = ["greek_lowercase", "greek_stem", "greek_analyze",
           "greek_stem_udf", "GREEK_STOP"]

_EL_FOLD = str.maketrans(
    {
        "ς": "σ",
        "ά": "α", "έ": "ε", "ή": "η", "ί": "ι", "ϊ": "ι", "ΐ": "ι",
        "ό": "ο", "ύ": "υ", "ϋ": "υ", "ΰ": "υ", "ώ": "ω",
        "Ά": "α", "Έ": "ε", "Ή": "η", "Ί": "ι", "Ϊ": "ι",
        "Ό": "ο", "Ύ": "υ", "Ϋ": "υ", "Ώ": "ω",
    }
)


def greek_lowercase(word: str) -> str:
    """GreekLowerCaseFilter.java:53: lowercase, strip tonos/dialytika,
    fold final sigma to σ."""
    return word.lower().translate(_EL_FOLD)


_VOWELS = set("αεηιουω")
_VOWELS_NO_Y = set("αεηιοω")  # endsWithVowelNoY: every vowel but υ


def _ev(w: str) -> bool:
    return bool(w) and w[-1] in _VOWELS


def _ev_no_y(w: str) -> bool:
    return bool(w) and w[-1] in _VOWELS_NO_Y


def _rule0(w: str) -> str:
    n = len(w)
    if n > 9 and w.endswith(("καθεστωτοσ", "καθεστωτων")):
        return w[:-4]
    if n > 8 and w.endswith(("γεγονοτοσ", "γεγονοτων")):
        return w[:-4]
    if n > 8 and w.endswith("καθεστωτα"):
        return w[:-3]
    if n > 7 and w.endswith(("τατογιου", "τατογιων")):
        return w[:-4]
    if n > 7 and w.endswith("γεγονοτα"):
        return w[:-3]
    if n > 7 and w.endswith("καθεστωσ"):
        return w[:-2]
    # Java precedence: the len>6 guard binds only to σκαγιου
    if (n > 6 and w.endswith("σκαγιου")) or w.endswith(
        ("σκαγιων", "ολογιου", "ολογιων", "κρεατοσ", "κρεατων",
         "περατοσ", "περατων", "τερατοσ", "τερατων")
    ):
        return w[:-4]
    if n > 6 and w.endswith("τατογια"):
        return w[:-3]
    if n > 6 and w.endswith("γεγονοσ"):
        return w[:-2]
    if n > 5 and w.endswith(("φαγιου", "φαγιων", "σογιου", "σογιων")):
        return w[:-4]
    if n > 5 and w.endswith(("σκαγια", "ολογια", "κρεατα", "περατα",
                             "τερατα")):
        return w[:-3]
    if n > 4 and w.endswith(("φαγια", "σογια", "φωτοσ", "φωτων")):
        return w[:-3]
    if n > 4 and w.endswith(("κρεασ", "περασ", "τερασ")):
        return w[:-2]
    if n > 3 and w.endswith("φωτα"):
        return w[:-2]
    if n > 2 and w.endswith("φωσ"):
        return w[:-1]
    return w


def _rule1(w: str) -> str:
    if len(w) > 4 and w.endswith(("αδεσ", "αδων")):
        stem = w[:-4]
        if not stem.endswith(("οκ", "μαμ", "μαν", "μπαμπ", "πατερ",
                              "γιαγι", "νταντ", "κυρ", "θει", "πεθερ")):
            return stem + "αδ"
        return stem
    return w


def _rule2(w: str) -> str:
    if len(w) > 4 and w.endswith(("εδεσ", "εδων")):
        stem = w[:-4]
        if stem.endswith(("οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ",
                          "κρασπ", "μιλ")):
            return stem + "εδ"
        return stem
    return w


def _rule3(w: str) -> str:
    if len(w) > 5 and w.endswith(("ουδεσ", "ουδων")):
        stem = w[:-5]
        if stem.endswith(("αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ",
                          "σ", "φλ", "φρ", "βελ", "λουλ", "χν", "σπ",
                          "τραγ", "φε")):
            return stem + "ουδ"
        return stem
    return w


_EXC4 = frozenset(("θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"))


def _rule4(w: str) -> str:
    if len(w) > 3 and w.endswith(("εωσ", "εων")):
        stem = w[:-3]
        if stem in _EXC4:
            return stem + "ε"
        return stem
    return w


def _rule5(w: str) -> str:
    if len(w) > 2 and w.endswith("ια"):
        stem = w[:-2]
        if _ev(stem):
            return stem + "ι"
        return stem
    if len(w) > 3 and w.endswith(("ιου", "ιων")):
        stem = w[:-3]
        if _ev(stem):
            return stem + "ι"
        return stem
    return w


_EXC6 = frozenset((
    "αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ", "φυσ",
    "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ", "μπαν",
    "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ", "πετσ", "πιτσ",
    "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
    "υποδ", "φιλον", "φυλοδ", "χασ",
))


def _rule6(w: str) -> str:
    stem = None
    if len(w) > 3 and w.endswith(("ικα", "ικο")):
        stem = w[:-3]
    elif len(w) > 4 and w.endswith(("ικου", "ικων")):
        stem = w[:-4]
    if stem is not None:
        if _ev(stem) or stem in _EXC6:
            return stem + "ικ"
        return stem
    return w


_EXC7 = frozenset(("αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ",
                   "πεθ", "πικρ", "ποτ", "σιχ", "χ"))


def _rule7(w: str) -> str:
    if len(w) == 5 and w.endswith("αγαμε"):
        return w[:-1]
    if len(w) > 7 and w.endswith("ηθηκαμε"):
        w = w[:-7]
    elif len(w) > 6 and w.endswith("ουσαμε"):
        w = w[:-6]
    elif len(w) > 5 and w.endswith(("αγαμε", "ησαμε", "ηκαμε")):
        w = w[:-5]
    if len(w) > 3 and w.endswith("αμε"):
        stem = w[:-3]
        if stem in _EXC7:
            return stem + "αμ"
        return stem
    return w


_EXC8A = frozenset(("τρ", "τσ"))
_EXC8B = frozenset((
    "βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ", "καστελ",
    "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ", "π",
    "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ", "τσαρλατ",
    "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ", "γαλ",
    "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ",
    "ζωντ", "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ", "σιγ",
    "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ",
    "ανικ", "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ", "βαθυγαλ",
    "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ",
    "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ", "μεγλοβιομηχ", "μικροβιομηχ",
    "νταβ", "ξηροκλιβ", "ολιγοδαμ", "ολογαλ", "πενταρφ", "περηφ",
    "περιτρ", "πλατ", "πολυδαπ", "πολυμηχ", "στεφ", "ταβ", "τετ",
    "υπερηφ", "υποκοπ", "χαμηλοδαπ", "ψηλοταβ",
))


def _rule8(w: str) -> str:
    removed = False
    n = len(w)
    if n > 8 and w.endswith("ιουντανε"):
        w = w[:-8]
        removed = True
    # Java precedence: each tier's guard binds only to the first suffix
    elif (n > 7 and w.endswith("ιοντανε")) or w.endswith(
        ("ουντανε", "ηθηκανε")
    ):
        w = w[:-7]
        removed = True
    elif (n > 6 and w.endswith("ιοτανε")) or w.endswith(
        ("οντανε", "ουσανε")
    ):
        w = w[:-6]
        removed = True
    elif (n > 5 and w.endswith("αγανε")) or w.endswith(
        ("ησανε", "οτανε", "ηκανε")
    ):
        w = w[:-5]
        removed = True
    if removed and w in _EXC8A:
        w = w + "αγαν"
    if len(w) > 3 and w.endswith("ανε"):
        stem = w[:-3]
        if _ev_no_y(stem) or stem in _EXC8B:
            return stem + "αν"
        return stem
    return w


_EXC9 = frozenset(("αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ",
                   "βαρον", "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ",
                   "παρακαλ", "σερπ", "σκελ", "συρφ", "τοκ", "υ", "δ",
                   "εμ", "θαρρ", "θ"))


def _rule9(w: str) -> str:
    if len(w) > 5 and w.endswith("ησετε"):
        w = w[:-5]
    if len(w) > 3 and w.endswith("ετε"):
        stem = w[:-3]
        if (stem in _EXC9 or _ev_no_y(stem)
                or stem.endswith(("οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ",
                                  "ενδ", "ευρ", "τιθ", "υπερθ", "ραθ",
                                  "ενθ", "ροθ", "σθ", "πυρ", "αιν",
                                  "συνδ", "συν", "συνθ", "χωρ", "πον",
                                  "βρ", "καθ", "ευθ", "εκθ", "νετ",
                                  "ρον", "αρκ", "βαρ", "βολ", "ωφελ"))):
            return stem + "ετ"
        return stem
    return w


def _rule10(w: str) -> str:
    if len(w) > 5 and w.endswith(("οντασ", "ωντασ")):
        stem = w[:-5]
        if stem == "αρχ":
            stem = stem + "οντ"
        if stem.endswith("κρε"):
            stem = stem + "ωντ"
        return stem
    return w


def _rule11(w: str) -> str:
    if len(w) > 6 and w.endswith("ομαστε"):
        stem = w[:-6]
        if stem == "ον":
            return stem + "ομαστ"
        return stem
    if len(w) > 7 and w.endswith("ιομαστε"):
        stem = w[:-7]
        if stem == "ον":
            return stem + "ομαστ"
        return stem
    return w


_EXC12A = frozenset(("π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"))
_EXC12B = frozenset(("αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ",
                     "προ", "νισ"))


def _rule12(w: str) -> str:
    if len(w) > 5 and w.endswith("ιεστε"):
        stem = w[:-5]
        w = stem + "ιεστ" if stem in _EXC12A else stem
    if len(w) > 4 and w.endswith("εστε"):
        stem = w[:-4]
        w = stem + "εστ" if stem in _EXC12B else stem
    return w


_EXC13 = frozenset(("διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"))


def _rule13(w: str) -> str:
    if len(w) > 6 and w.endswith("ηθηκεσ"):
        w = w[:-6]
    elif len(w) > 5 and w.endswith(("ηθηκα", "ηθηκε")):
        w = w[:-5]
    removed = False
    if len(w) > 4 and w.endswith("ηκεσ"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and w.endswith(("ηκα", "ηκε")):
        w = w[:-3]
        removed = True
    if removed and (w in _EXC13 or w.endswith(("σκωλ", "σκουλ", "ναρθ",
                                               "σφ", "οθ", "πιθ"))):
        w = w + "ηκ"
    return w


_EXC14 = frozenset(("φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ",
                    "λαμπιδ", "λεχ", "μ", "πατ", "ρ", "λ", "μεδ",
                    "μεσαζ", "υποτειν", "αμ", "αιθ", "ανηκ", "δεσποζ",
                    "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε",
                    "τσα"))


def _rule14(w: str) -> str:
    removed = False
    if len(w) > 5 and w.endswith("ουσεσ"):
        w = w[:-5]
        removed = True
    elif len(w) > 4 and w.endswith(("ουσα", "ουσε")):
        w = w[:-4]
        removed = True
    if removed and (w in _EXC14 or _ev(w)
                    or w.endswith(("ποδαρ", "βλεπ", "πανταχ", "φρυδ",
                                   "μαντιλ", "μαλλ", "κυματ", "λαχ",
                                   "ληγ", "φαγ", "ομ", "πρωτ"))):
        w = w + "ουσ"
    return w


_EXC15A = frozenset((
    "αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ",
    "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν", "δροσοπ",
    "ξεφ", "νεοπ", "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ",
    "συμπ", "συντ", "τ", "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ",
    "αποτ", "αρτιπ", "διατ", "εν", "επιτ", "κροκαλοπ", "σιδηροπ", "λ",
    "ναυ", "ουλαμ", "ουρ", "π", "τρ", "μ",
))
_EXC15B = frozenset(("ψοφ", "ναυλοχ"))


def _rule15(w: str) -> str:
    removed = False
    if len(w) > 4 and w.endswith("αγεσ"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and w.endswith(("αγα", "αγε")):
        w = w[:-3]
        removed = True
    if removed:
        cond1 = (w in _EXC15A
                 or w.endswith(("οφ", "πελ", "χορτ", "λλ", "σφ", "ρπ",
                                "φρ", "πρ", "λοχ", "σμην")))
        cond2 = w in _EXC15B or w.endswith("κολλ")
        if cond1 and not cond2:
            w = w + "αγ"
    return w


_EXC16 = frozenset(("ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον",
                    "επταν"))


def _rule16(w: str) -> str:
    removed = False
    if len(w) > 4 and w.endswith("ησου"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and w.endswith(("ησε", "ησα")):
        w = w[:-3]
        removed = True
    if removed and w in _EXC16:
        w = w + "ησ"
    return w


_EXC17 = frozenset(("ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ",
                    "ευχρ", "κοινοχρ", "παλιμψ"))


def _rule17(w: str) -> str:
    if len(w) > 4 and w.endswith("ηστε"):
        stem = w[:-4]
        if stem in _EXC17:
            return stem + "ηστ"
        return stem
    return w


_EXC18 = frozenset(("ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων"))


def _rule18(w: str) -> str:
    removed = False
    if len(w) > 6 and w.endswith(("ησουνε", "ηθουνε")):
        w = w[:-6]
        removed = True
    elif len(w) > 4 and w.endswith("ουνε"):
        w = w[:-4]
        removed = True
    if removed and w in _EXC18:
        w = w + "ουν"
    return w


_EXC19 = frozenset(("παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ",
                    "ασουσ"))


def _rule19(w: str) -> str:
    removed = False
    if len(w) > 6 and w.endswith(("ησουμε", "ηθουμε")):
        w = w[:-6]
        removed = True
    elif len(w) > 4 and w.endswith("ουμε"):
        w = w[:-4]
        removed = True
    if removed and w in _EXC19:
        w = w + "ουμ"
    return w


def _rule20(w: str) -> str:
    if len(w) > 5 and w.endswith(("ματων", "ματοσ")):
        return w[:-3]
    if len(w) > 4 and w.endswith("ματα"):
        return w[:-2]
    return w


_R21_TIERS = (
    (9, ("ιοντουσαν",)),
    (8, ("ιομασταν", "ιοσασταν", "ιουμαστε", "οντουσαν")),
    (7, ("ιεμαστε", "ιεσαστε", "ιομουνα", "ιοσαστε", "ιοσουνα",
         "ιουνται", "ιουνταν", "ηθηκατε", "ομασταν", "οσασταν",
         "ουμαστε")),
    (6, ("ιομουν", "ιονταν", "ιοσουν", "ηθειτε", "ηθηκαν", "ομουνα",
         "οσαστε", "οσουνα", "ουνται", "ουνταν", "ουσατε")),
    (5, ("αγατε", "ιεμαι", "ιεται", "ιεσαι", "ιοταν", "ιουμα", "ηθεισ",
         "ηθουν", "ηκατε", "ησατε", "ησουν", "ομουν", "ονται", "ονταν",
         "οσουν", "ουμαι", "ουσαν")),
    (4, ("αγαν", "αμαι", "ασαι", "αται", "ειτε", "εσαι", "εται", "ηδεσ",
         "ηδων", "ηθει", "ηκαν", "ησαν", "ησει", "ησεσ", "ομαι",
         "οταν")),
    (3, ("αει", "εισ", "ηθω", "ησω", "ουν", "ουσ")),
    (2, ("αν", "ασ", "αω", "ει", "εσ", "ησ", "οι", "οσ", "ου", "υσ",
         "ων")),
)


def _rule21(w: str) -> str:
    for n, tier in _R21_TIERS:
        if len(w) > n and w.endswith(tier):
            return w[:-n]
    if len(w) > 1 and _ev(w):
        return w[:-1]
    return w


def _rule22(w: str) -> str:
    if w.endswith(("εστερ", "εστατ")):
        return w[:-5]
    if w.endswith(("οτερ", "οτατ", "υτερ", "υτατ", "ωτερ", "ωτατ")):
        return w[:-4]
    return w


_SHORT_RULES = (_rule0, _rule1, _rule2, _rule3, _rule4, _rule5, _rule6,
                _rule7, _rule8, _rule9, _rule10, _rule11, _rule12,
                _rule13, _rule14, _rule15, _rule16, _rule17, _rule18,
                _rule19, _rule20)


@lru_cache(maxsize=200_000)
def greek_stem(word: str) -> str:
    """Full chain: GreekLowerCaseFilter fold, then GreekStemmer.stem."""
    w = greek_lowercase(word)
    if len(w) < 4:
        return w
    orig_len = len(w)
    for rule in _SHORT_RULES:
        w = rule(w)
    if len(w) == orig_len:
        w = _rule21(w)
    return _rule22(w)


GREEK_STOP = frozenset(
    """ο η το οι τα του τησ των τον την και κι κ ειμαι εισαι ειναι
    ειμαστε ειστε στο στον στη στην μα αλλα απο για προσ με σε ωσ παρα
    αντι κατα μετα θα να δε δεν μη μην επι ενω εαν αν τοτε που πωσ ποιοσ
    ποια ποιο ποιοι ποιεσ ποιων ποιουσ αυτοσ αυτη αυτο αυτοι αυτων
    αυτουσ αυτεσ αυτα εκεινοσ εκεινη εκεινο εκεινοι εκεινεσ εκεινα
    εκεινων εκεινουσ οπωσ ομωσ ισωσ οσο οτι""".split()
)


def greek_analyze(text):
    """GreekAnalyzer-analog chain: UAX#29 tokenize → Greek lowercase
    fold → stopwords (compared post-fold, as the reference's stopset
    is final-sigma/tonos-folded) → stem. Positions pre-stop."""
    from lucene_spark.analysis.uax29 import uax29_tokenize

    out = []
    for pos, tok in enumerate(uax29_tokenize(text)):
        t = greek_lowercase(tok)
        if t and t not in GREEK_STOP:
            out.append((greek_stem(t), pos))
    return out


def greek_stem_udf():
    """Arrow-batched stem column: string → string."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _stem(s: pd.Series) -> pd.Series:
        return s.map(lambda t: greek_stem(t) if isinstance(t, str) else t)

    return _stem
