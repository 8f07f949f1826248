"""Brazilian Portuguese stemmer (br/BrazilianStemmer.java:25).

Faithful translation of the reference's hand-written Brazilian
stemmer — distinct from both Snowball Portuguese and RSLP: its own
accent folding (including the pt-BR specific ã/õ/ç), R1/R2/RV region
computation, standard-suffix step with R1/R2 gating, a 114-entry verb
ladder over RV, and the residual i / os-a-i-o / e-gue-cie steps.

Upstream quirks reproduced on purpose (parity beats tidiness):

- the ``logias`` branch calls replaceSuffix without assigning the
  result, so CT is left unchanged but step1 still reports "altered"
  (BrazilianStemmer.java:407);
- the first ``ira`` verb entry removes ``ava`` — a no-op — yet
  returns true, shadowing the real ``ira`` strip two entries later
  (BrazilianStemmer.java:958);
- a non-letter term short-circuits to the punctuation-trimmed CT, and
  terms shorter than 3 or longer than 29 chars return the input
  unstemmed (isIndexable, BrazilianStemmer.java:95).

``brazilian_stem`` returns the FILTER-level result
(BrazilianStemFilter.java: keep the original term when the stemmer
yields null or no change is wanted): the stemmed discriminator when
one exists, else the original term.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd

__all__ = ["brazilian_stem", "brazilian_stem_udf"]

_VOWELS = frozenset("aeiou")

_BR_FOLD = {
    "á": "a", "â": "a", "ã": "a",
    "é": "e", "ê": "e",
    "í": "i",
    "ó": "o", "ô": "o", "õ": "o",
    "ú": "u", "ü": "u",
    "ç": "c",
    "ñ": "n",
}

_TRIM_CHARS = "\"\'-,;.?!"


def _change_term(value: str) -> str:
    """changeTerm (BrazilianStemmer.java:219): lowercase + fold."""
    return "".join(_BR_FOLD.get(c, c) for c in value.lower())


def _create_ct(term: str) -> str:
    """createCT (BrazilianStemmer.java:335): fold, then trim ONE
    leading and ONE trailing punctuation character."""
    ct = _change_term(term)
    if len(ct) < 2:
        return ct
    if ct[0] in _TRIM_CHARS:
        ct = ct[1:]
    if len(ct) < 2:
        return ct
    if ct[-1] in _TRIM_CHARS:
        ct = ct[:-1]
    return ct


def _get_r1(value):
    """getR1 (BrazilianStemmer.java:116): region after the first
    non-vowel following a vowel — or None."""
    if value is None:
        return None
    i = len(value) - 1
    j = 0
    while j < i and not value[j] in _VOWELS:
        j += 1
    if not j < i:
        return None
    while j < i and value[j] in _VOWELS:
        j += 1
    if not j < i:
        return None
    return value[j + 1 :]


def _get_rv(value):
    """getRV (BrazilianStemmer.java:164)."""
    if value is None:
        return None
    i = len(value) - 1
    if i > 0 and value[1] not in _VOWELS:
        j = 2
        while j < i and value[j] not in _VOWELS:
            j += 1
        if j < i:
            return value[j + 1 :]
    if i > 1 and value[0] in _VOWELS and value[1] in _VOWELS:
        j = 2
        while j < i and value[j] in _VOWELS:
            j += 1
        if j < i:
            return value[j + 1 :]
    if i > 2:
        return value[3:]
    return None


def _sfx(value, suffix) -> bool:
    return value is not None and value.endswith(suffix)


def _remove(value: str, suffix: str) -> str:
    return value[: -len(suffix)] if value.endswith(suffix) else value


def _replace(value: str, suffix: str, change_to: str) -> str:
    if not value.endswith(suffix):
        return value
    return value[: -len(suffix)] + change_to


def _sfx_preceded(value, suffix, preceded) -> bool:
    return _sfx(value, suffix) and _remove(value, suffix).endswith(preceded)


# (suffix, R-region index 1|2, replacement-or-None) in source order;
# entries whose action differs structurally are special-cased inline
_BR_STEP1 = (
    ("uciones", 2, "u", 0),
    ("imentos", 2, None, 6), ("amentos", 2, None, 6),
    ("adores", 2, None, 6), ("adoras", 2, None, 6),
    ("logias", 2, "__NOOP__", 6),       # unassigned replaceSuffix quirk
    ("encias", 2, "ente", 6), ("amente", 1, None, 6),
    ("idades", 2, None, 6),
    ("acoes", 2, None, 5), ("imento", 2, None, 5), ("amento", 2, None, 5),
    ("adora", 2, None, 5), ("ismos", 2, None, 5), ("istas", 2, None, 5),
    ("logia", 2, "log", 5), ("ucion", 2, "u", 5), ("encia", 2, "ente", 5),
    ("mente", 2, None, 5), ("idade", 2, None, 5),
    ("acao", 2, None, 4), ("ezas", 2, None, 4), ("icos", 2, None, 4),
    ("icas", 2, None, 4), ("ismo", 2, None, 4), ("avel", 2, None, 4),
    ("ivel", 2, None, 4), ("ista", 2, None, 4), ("osos", 2, None, 4),
    ("osas", 2, None, 4), ("ador", 2, None, 4), ("ivas", 2, None, 4),
    ("ivos", 2, None, 4),
    ("__IRAS__", 0, None, 4),
    ("eza", 2, None, 3), ("ico", 2, None, 3), ("ica", 2, None, 3),
    ("oso", 2, None, 3), ("osa", 2, None, 3), ("iva", 2, None, 3),
    ("ivo", 2, None, 3),
    ("__IRA__", 0, None, 3),
)


def _step1(ct, r1, r2, rv):
    """step1 (BrazilianStemmer.java:373) → (new_ct, altered)."""
    for suffix, region, repl, min_len in _BR_STEP1:
        if suffix == "__IRAS__":
            if (
                len(ct) >= 4
                and _sfx(ct, "iras")
                and _sfx(rv, "iras")
                and _sfx_preceded(ct, "iras", "e")
            ):
                return _replace(ct, "iras", "ir"), True
            continue
        if suffix == "__IRA__":
            if (
                len(ct) >= 3
                and _sfx(ct, "ira")
                and _sfx(rv, "ira")
                and _sfx_preceded(ct, "ira", "e")
            ):
                return _replace(ct, "ira", "ir"), True
            continue
        if min_len and len(ct) < min_len:
            continue
        reg = r1 if region == 1 else r2
        if _sfx(ct, suffix) and _sfx(reg, suffix):
            if repl == "__NOOP__":
                return ct, True          # the unassigned-logias quirk
            if repl is None:
                return _remove(ct, suffix), True
            return _replace(ct, suffix, repl), True
    return ct, False


_BR_STEP2 = (
    (7, (
        ('issemos', 'issemos'),
        ('essemos', 'essemos'),
        ('assemos', 'assemos'),
        ('ariamos', 'ariamos'),
        ('eriamos', 'eriamos'),
        ('iriamos', 'iriamos'),
    )),
    (6, (
        ('iremos', 'iremos'),
        ('eremos', 'eremos'),
        ('aremos', 'aremos'),
        ('avamos', 'avamos'),
        ('iramos', 'iramos'),
        ('eramos', 'eramos'),
        ('aramos', 'aramos'),
        ('asseis', 'asseis'),
        ('esseis', 'esseis'),
        ('isseis', 'isseis'),
        ('arieis', 'arieis'),
        ('erieis', 'erieis'),
        ('irieis', 'irieis'),
    )),
    (5, (
        ('irmos', 'irmos'),
        ('iamos', 'iamos'),
        ('armos', 'armos'),
        ('ermos', 'ermos'),
        ('areis', 'areis'),
        ('ereis', 'ereis'),
        ('ireis', 'ireis'),
        ('asses', 'asses'),
        ('esses', 'esses'),
        ('isses', 'isses'),
        ('astes', 'astes'),
        ('assem', 'assem'),
        ('essem', 'essem'),
        ('issem', 'issem'),
        ('ardes', 'ardes'),
        ('erdes', 'erdes'),
        ('irdes', 'irdes'),
        ('ariam', 'ariam'),
        ('eriam', 'eriam'),
        ('iriam', 'iriam'),
        ('arias', 'arias'),
        ('erias', 'erias'),
        ('irias', 'irias'),
        ('estes', 'estes'),
        ('istes', 'istes'),
        ('areis', 'areis'),
        ('aveis', 'aveis'),
    )),
    (4, (
        ('aria', 'aria'),
        ('eria', 'eria'),
        ('iria', 'iria'),
        ('asse', 'asse'),
        ('esse', 'esse'),
        ('isse', 'isse'),
        ('aste', 'aste'),
        ('este', 'este'),
        ('iste', 'iste'),
        ('arei', 'arei'),
        ('erei', 'erei'),
        ('irei', 'irei'),
        ('aram', 'aram'),
        ('eram', 'eram'),
        ('iram', 'iram'),
        ('avam', 'avam'),
        ('arem', 'arem'),
        ('erem', 'erem'),
        ('irem', 'irem'),
        ('ando', 'ando'),
        ('endo', 'endo'),
        ('indo', 'indo'),
        ('arao', 'arao'),
        ('erao', 'erao'),
        ('irao', 'irao'),
        ('adas', 'adas'),
        ('idas', 'idas'),
        ('aras', 'aras'),
        ('eras', 'eras'),
        ('iras', 'iras'),
        ('avas', 'avas'),
        ('ares', 'ares'),
        ('eres', 'eres'),
        ('ires', 'ires'),
        ('ados', 'ados'),
        ('idos', 'idos'),
        ('amos', 'amos'),
        ('emos', 'emos'),
        ('imos', 'imos'),
        ('iras', 'iras'),
        ('ieis', 'ieis'),
    )),
    (3, (
        ('ada', 'ada'),
        ('ida', 'ida'),
        ('ara', 'ara'),
        ('era', 'era'),
        ('ira', 'ava'),
        ('iam', 'iam'),
        ('ado', 'ado'),
        ('ido', 'ido'),
        ('ias', 'ias'),
        ('ais', 'ais'),
        ('eis', 'eis'),
        ('ira', 'ira'),
        ('ear', 'ear'),
    )),
    (2, (
        ('ia', 'ia'),
        ('ei', 'ei'),
        ('am', 'am'),
        ('em', 'em'),
        ('ar', 'ar'),
        ('er', 'er'),
        ('ir', 'ir'),
        ('as', 'as'),
        ('es', 'es'),
        ('is', 'is'),
        ('eu', 'eu'),
        ('iu', 'iu'),
        ('iu', 'iu'),
        ('ou', 'ou'),
    )),
)


def _step2(ct, rv):
    """step2 (BrazilianStemmer.java:573) → (new_ct, altered): verb
    suffix ladder over RV, longest bucket first, source order within
    (including the no-op ira→ava entry that shadows the real strip)."""
    if rv is None:
        return ct, False
    n = len(rv)
    for guard, pairs in _BR_STEP2:
        if n >= guard:
            for match_suf, remove_suf in pairs:
                if rv.endswith(match_suf):
                    return _remove(ct, remove_suf), True
    return ct, False


def _step3(ct, rv):
    if rv is not None and _sfx(rv, "i") and _sfx_preceded(rv, "i", "c"):
        return _remove(ct, "i")
    return ct


def _step4(ct, rv):
    if rv is None:
        return ct
    for suf in ("os", "a", "i", "o"):
        if _sfx(rv, suf):
            return _remove(ct, suf)
    return ct


def _step5(ct, rv):
    if rv is None:
        return ct
    if _sfx(rv, "e"):
        if _sfx_preceded(rv, "e", "gu"):
            return _remove(_remove(ct, "e"), "u")
        if _sfx_preceded(rv, "e", "ci"):
            return _remove(_remove(ct, "e"), "i")
        return _remove(ct, "e")
    return ct


@lru_cache(maxsize=200_000)
def brazilian_stem(term: str) -> str:
    """stem() + the BrazilianStemFilter keep-original contract."""
    ct = _create_ct(term)
    if not (2 < len(ct) < 30):
        return term                      # not indexable → term unchanged
    if not ct.isalpha():
        return ct                        # non-letters → trimmed CT as-is
    r1 = _get_r1(ct)
    r2 = _get_r1(r1)
    rv = _get_rv(ct)

    ct2, altered = _step1(ct, r1, r2, rv)
    if not altered:
        ct2, altered = _step2(ct2, rv)
    if altered:
        ct2 = _step3(ct2, rv)
    else:
        ct2 = _step4(ct2, rv)
    ct2 = _step5(ct2, rv)
    return ct2


def brazilian_stem_udf():
    """Arrow-batched stem column: string → string."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _stem(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: brazilian_stem(t) if isinstance(t, str) else t
        )

    return _stem
