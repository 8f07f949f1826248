"""Double Metaphone (Lawrence Philips, C/C++ Users Journal 2000; the
encoder the reference's phonetic module exposes as
``DoubleMetaphoneFilter`` — analysis/phonetic/DoubleMetaphoneFilter.java:29).

Produces a (primary, alternate) code pair of at most ``max_code_len``
(default 4) characters. The branch structure below follows the
published algorithm clause by clause — Slavo-Germanic detection,
silent starts, the C/CH/G/GH/J/L/S/T/W/X/Z special-case ladders with
their Germanic/Greek/Romance exceptions — so the reference filter's
test vectors (international → ANTR / ANTRNXNL, Kuczewski → KSSK + KXFS,
hello → HL, easgasg → ASKS …) reproduce exactly.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import pandas as pd

__all__ = ["double_metaphone", "double_metaphone_udf"]

_VOWELS = frozenset("AEIOUY")
_SILENT_START = ("GN", "KN", "PN", "WR", "PS")
_L_R_N_M_B_H_F_V_W_SPACE = ("L", "R", "N", "M", "B", "H", "F", "V", "W",
                            " ")


class _Result:
    __slots__ = ("primary", "alternate", "max_len")

    def __init__(self, max_len: int):
        self.primary: list = []
        self.alternate: list = []
        self.max_len = max_len

    def append(self, p: str, a: str = None) -> None:
        self.append_primary(p)
        self.append_alternate(p if a is None else a)

    def append_primary(self, s: str) -> None:
        for ch in s:
            if len(self.primary) < self.max_len:
                self.primary.append(ch)

    def append_alternate(self, s: str) -> None:
        for ch in s:
            if len(self.alternate) < self.max_len:
                self.alternate.append(ch)

    def complete(self) -> bool:
        return (
            len(self.primary) >= self.max_len
            and len(self.alternate) >= self.max_len
        )


def _char(v: str, i: int) -> str:
    if 0 <= i < len(v):
        return v[i]
    return "\0"


def _contains(v: str, start: int, length: int, *criteria: str) -> bool:
    if start < 0 or start + length > len(v):
        return False
    target = v[start : start + length]
    return target in criteria


def _is_vowel(c: str) -> bool:
    return c in _VOWELS


def _slavo_germanic(v: str) -> bool:
    return "W" in v or "K" in v or "CZ" in v or "WITZ" in v


def _silent_start(v: str) -> bool:
    return v.startswith(_SILENT_START)


def _condition_c0(v: str, i: int) -> bool:
    if _contains(v, i, 4, "CHIA"):
        return True
    if i <= 1:
        return False
    if _is_vowel(_char(v, i - 2)):
        return False
    if not _contains(v, i - 1, 3, "ACH"):
        return False
    c = _char(v, i + 2)
    return (c != "I" and c != "E") or _contains(
        v, i - 2, 6, "BACHER", "MACHER"
    )


def _condition_ch0(v: str, i: int) -> bool:
    if i != 0:
        return False
    if not (
        _contains(v, i + 1, 5, "HARAC", "HARIS")
        or _contains(v, i + 1, 3, "HOR", "HYM", "HIA", "HEM")
    ):
        return False
    return not _contains(v, 0, 5, "CHORE")


def _condition_ch1(v: str, i: int) -> bool:
    return (
        _contains(v, 0, 4, "VAN ", "VON ")
        or _contains(v, 0, 3, "SCH")
        or _contains(v, i - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
        or _contains(v, i + 2, 1, "T", "S")
        or (
            (_contains(v, i - 1, 1, "A", "O", "U", "E") or i == 0)
            and (
                _contains(v, i + 2, 1, *_L_R_N_M_B_H_F_V_W_SPACE)
                or i + 1 == len(v) - 1
            )
        )
    )


def _condition_l0(v: str, i: int) -> bool:
    if i == len(v) - 3 and _contains(v, i - 1, 4, "ILLO", "ILLA", "ALLE"):
        return True
    return (
        _contains(v, len(v) - 2, 2, "AS", "OS")
        or _contains(v, len(v) - 1, 1, "A", "O")
    ) and _contains(v, i - 1, 4, "ALLE")


def _condition_m0(v: str, i: int) -> bool:
    if _char(v, i + 1) == "M":
        return True
    return _contains(v, i - 1, 3, "UMB") and (
        i + 1 == len(v) - 1 or _contains(v, i + 2, 2, "ER")
    )


def _handle_c(v, r, i):
    if _condition_c0(v, i):
        if _contains(v, i, 4, "CHIA"):
            r.append("K")
        else:
            r.append("K")
        i += 2
    elif i == 0 and _contains(v, i, 6, "CAESAR"):
        r.append("S")
        i += 2
    elif _contains(v, i, 2, "CH"):
        i = _handle_ch(v, r, i)
    elif _contains(v, i, 2, "CZ") and not _contains(v, i - 2, 4, "WICZ"):
        r.append("S", "X")
        i += 2
    elif _contains(v, i + 1, 3, "CIA"):
        r.append("X")
        i += 3
    elif _contains(v, i, 2, "CC") and not (
        i == 1 and _char(v, 0) == "M"
    ):
        return _handle_cc(v, r, i)
    elif _contains(v, i, 2, "CK", "CG", "CQ"):
        r.append("K")
        i += 2
    elif _contains(v, i, 2, "CI", "CE", "CY"):
        if _contains(v, i, 3, "CIO", "CIE", "CIA"):
            r.append("S", "X")
        else:
            r.append("S")
        i += 2
    else:
        r.append("K")
        if _contains(v, i + 1, 2, " C", " Q", " G"):
            i += 3
        elif _contains(v, i + 1, 1, "C", "K", "Q") and not _contains(
            v, i + 1, 2, "CE", "CI"
        ):
            i += 2
        else:
            i += 1
    return i


def _handle_cc(v, r, i):
    if _contains(v, i + 2, 1, "I", "E", "H") and not _contains(
        v, i + 2, 2, "HU"
    ):
        if (i == 1 and _char(v, i - 1) == "A") or _contains(
            v, i - 1, 5, "UCCEE", "UCCES"
        ):
            r.append("KS")
        else:
            r.append("X")
        i += 3
    else:
        r.append("K")
        i += 2
    return i


def _handle_ch(v, r, i):
    if i > 0 and _contains(v, i, 4, "CHAE"):
        r.append("K", "X")
    elif _condition_ch0(v, i):
        r.append("K")
    elif _condition_ch1(v, i):
        r.append("K")
    else:
        if i > 0:
            if _contains(v, 0, 2, "MC"):
                r.append("K")
            else:
                r.append("X", "K")
        else:
            r.append("X")
    return i + 2


def _handle_d(v, r, i):
    if _contains(v, i, 2, "DG"):
        if _contains(v, i + 2, 1, "I", "E", "Y"):
            r.append("J")
            i += 3
        else:
            r.append("TK")
            i += 2
    elif _contains(v, i, 2, "DT", "DD"):
        r.append("T")
        i += 2
    else:
        r.append("T")
        i += 1
    return i


def _handle_g(v, r, i, sg):
    if _char(v, i + 1) == "H":
        return _handle_gh(v, r, i)
    if _char(v, i + 1) == "N":
        if i == 1 and _is_vowel(_char(v, 0)) and not sg:
            r.append_primary("KN")
            r.append_alternate("N")
        elif (
            not _contains(v, i + 2, 2, "EY")
            and _char(v, i + 1) != "Y"
            and not sg
        ):
            r.append_primary("N")
            r.append_alternate("KN")
        else:
            r.append("KN")
        return i + 2
    if _contains(v, i + 1, 2, "LI") and not sg:
        r.append_primary("KL")
        r.append_alternate("L")
        return i + 2
    if i == 0 and (
        _char(v, i + 1) == "Y"
        or _contains(
            v, i + 1, 2,
            "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI",
            "ER",
        )
    ):
        r.append("K", "J")
        return i + 2
    if (
        _contains(v, i + 1, 2, "ER") or _char(v, i + 1) == "Y"
    ) and not _contains(
        v, 0, 6, "DANGER", "RANGER", "MANGER"
    ) and not _contains(
        v, i - 1, 1, "E", "I"
    ) and not _contains(
        v, i - 1, 3, "RGY", "OGY"
    ):
        r.append("K", "J")
        return i + 2
    if _contains(v, i + 1, 1, "E", "I", "Y") or _contains(
        v, i - 1, 4, "AGGI", "OGGI"
    ):
        if (
            _contains(v, 0, 4, "VAN ", "VON ")
            or _contains(v, 0, 3, "SCH")
            or _contains(v, i + 1, 2, "ET")
        ):
            r.append("K")
        elif _contains(v, i + 1, 4, "IER "):
            r.append("J")
        else:
            r.append("J", "K")
        return i + 2
    if _char(v, i + 1) == "G":
        r.append("K")
        return i + 2
    r.append("K")
    return i + 1


def _handle_gh(v, r, i):
    if i > 0 and not _is_vowel(_char(v, i - 1)):
        r.append("K")
        return i + 2
    if i == 0:
        if _char(v, i + 2) == "I":
            r.append("J")
        else:
            r.append("K")
        return i + 2
    if (
        (i > 1 and _contains(v, i - 2, 1, "B", "H", "D"))
        or (i > 2 and _contains(v, i - 3, 1, "B", "H", "D"))
        or (i > 3 and _contains(v, i - 4, 1, "B", "H"))
    ):
        return i + 2
    if (
        i > 2
        and _char(v, i - 1) == "U"
        and _contains(v, i - 3, 1, "C", "G", "L", "R", "T")
    ):
        r.append("F")
    elif i > 0 and _char(v, i - 1) != "I":
        r.append("K")
    return i + 2


def _handle_h(v, r, i):
    if (i == 0 or _is_vowel(_char(v, i - 1))) and _is_vowel(
        _char(v, i + 1)
    ):
        r.append("H")
        return i + 2
    return i + 1


def _handle_j(v, r, i, sg):
    if _contains(v, i, 4, "JOSE") or _contains(v, 0, 4, "SAN "):
        if (
            (i == 0 and _char(v, i + 4) == " ")
            or len(v) == 4
            or _contains(v, 0, 4, "SAN ")
        ):
            r.append("H")
        else:
            r.append("J", "H")
        return i + 1
    if i == 0 and not _contains(v, i, 4, "JOSE"):
        r.append("J", "A")
    elif (
        _is_vowel(_char(v, i - 1))
        and not sg
        and (_char(v, i + 1) == "A" or _char(v, i + 1) == "O")
    ):
        r.append("J", "H")
    elif i == len(v) - 1:
        r.append_primary("J")
        r.append_alternate(" ")
    elif not _contains(
        v, i + 1, 1, "L", "T", "K", "S", "N", "M", "B", "Z"
    ) and not _contains(v, i - 1, 1, "S", "K", "L"):
        r.append("J")
    if _char(v, i + 1) == "J":
        return i + 2
    return i + 1


def _handle_l(v, r, i):
    if _char(v, i + 1) == "L":
        if _condition_l0(v, i):
            r.append_primary("L")
        else:
            r.append("L")
        return i + 2
    r.append("L")
    return i + 1


def _handle_p(v, r, i):
    if _char(v, i + 1) == "H":
        r.append("F")
        return i + 2
    r.append("P")
    return i + 2 if _contains(v, i + 1, 1, "P", "B") else i + 1


def _handle_r(v, r, i, sg):
    if (
        i == len(v) - 1
        and not sg
        and _contains(v, i - 2, 2, "IE")
        and not _contains(v, i - 4, 2, "ME", "MA")
    ):
        r.append_alternate("R")
    else:
        r.append("R")
    return i + 2 if _char(v, i + 1) == "R" else i + 1


def _handle_s(v, r, i, sg):
    if _contains(v, i - 1, 3, "ISL", "YSL"):
        return i + 1
    if i == 0 and _contains(v, i, 5, "SUGAR"):
        r.append("X", "S")
        return i + 1
    if _contains(v, i, 2, "SH"):
        if _contains(v, i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
            r.append("S")
        else:
            r.append("X")
        return i + 2
    if _contains(v, i, 3, "SIO", "SIA") or _contains(v, i, 4, "SIAN"):
        if sg:
            r.append("S")
        else:
            r.append("S", "X")
        return i + 3
    if (i == 0 and _contains(v, i + 1, 1, "M", "N", "L", "W")) or _contains(
        v, i + 1, 1, "Z"
    ):
        r.append("S", "X")
        return i + 2 if _contains(v, i + 1, 1, "Z") else i + 1
    if _contains(v, i, 2, "SC"):
        return _handle_sc(v, r, i)
    if i == len(v) - 1 and _contains(v, i - 2, 2, "AI", "OI"):
        r.append_alternate("S")
    else:
        r.append("S")
    return i + 2 if _contains(v, i + 1, 1, "S", "Z") else i + 1


def _handle_sc(v, r, i):
    if _char(v, i + 2) == "H":
        if _contains(v, i + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
            if _contains(v, i + 3, 2, "ER", "EN"):
                r.append_primary("X")
                r.append_alternate("SK")
            else:
                r.append("SK")
        else:
            if i == 0 and not _is_vowel(_char(v, 3)) and _char(v, 3) != "W":
                r.append("X", "S")
            else:
                r.append("X")
    elif _contains(v, i + 2, 1, "I", "E", "Y"):
        r.append("S")
    else:
        r.append("SK")
    return i + 3


def _handle_t(v, r, i):
    if _contains(v, i, 4, "TION"):
        r.append("X")
        return i + 3
    if _contains(v, i, 3, "TIA", "TCH"):
        r.append("X")
        return i + 3
    if _contains(v, i, 2, "TH") or _contains(v, i, 3, "TTH"):
        if (
            _contains(v, i + 2, 2, "OM", "AM")
            or _contains(v, 0, 4, "VAN ", "VON ")
            or _contains(v, 0, 3, "SCH")
        ):
            r.append("T")
        else:
            r.append("0", "T")
        return i + 2
    r.append("T")
    return i + 2 if _contains(v, i + 1, 1, "T", "D") else i + 1


def _handle_w(v, r, i):
    if _contains(v, i, 2, "WR"):
        r.append("R")
        return i + 2
    if i == 0 and (
        _is_vowel(_char(v, i + 1)) or _contains(v, i, 2, "WH")
    ):
        if _is_vowel(_char(v, i + 1)):
            r.append("A", "F")
        else:
            r.append("A")
        return i + 1
    if (
        (i == len(v) - 1 and _is_vowel(_char(v, i - 1)))
        or _contains(v, i - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
        or _contains(v, 0, 3, "SCH")
    ):
        r.append_alternate("F")
        return i + 1
    if _contains(v, i, 4, "WICZ", "WITZ"):
        r.append("TS", "FX")
        return i + 4
    return i + 1


def _handle_x(v, r, i):
    if i == 0:
        r.append("S")
        return i + 1
    if not (
        i == len(v) - 1
        and (
            _contains(v, i - 3, 3, "IAU", "EAU")
            or _contains(v, i - 2, 2, "AU", "OU")
        )
    ):
        r.append("KS")
    return i + 2 if _contains(v, i + 1, 1, "C", "X") else i + 1


def _handle_z(v, r, i, sg):
    if _char(v, i + 1) == "H":
        r.append("J")
        return i + 2
    if _contains(v, i + 1, 2, "ZO", "ZI", "ZA") or (
        sg and i > 0 and _char(v, i - 1) != "T"
    ):
        r.append("S", "TS")
    else:
        r.append("S")
    return i + 2 if _char(v, i + 1) == "Z" else i + 1


@lru_cache(maxsize=200_000)
def double_metaphone(
    value: str, max_code_len: int = 4
) -> Tuple[str, str]:
    """Returns the (primary, alternate) Double Metaphone codes, both
    padded only by their natural length (no padding), cut to
    ``max_code_len``; non-letter input yields ('', '')."""
    v = value.strip().upper()
    if not v:
        return "", ""
    sg = _slavo_germanic(v)
    i = 1 if _silent_start(v) else 0
    r = _Result(max_code_len)
    n = len(v)
    while not r.complete() and i <= n - 1:
        c = v[i]
        if c in "AEIOUY":
            if i == 0:
                r.append("A")
            i += 1
        elif c == "B":
            r.append("P")
            i += 2 if _char(v, i + 1) == "B" else 1
        elif c == "Ç":  # Ç
            r.append("S")
            i += 1
        elif c == "C":
            i = _handle_c(v, r, i)
        elif c == "D":
            i = _handle_d(v, r, i)
        elif c == "F":
            r.append("F")
            i += 2 if _char(v, i + 1) == "F" else 1
        elif c == "G":
            i = _handle_g(v, r, i, sg)
        elif c == "H":
            i = _handle_h(v, r, i)
        elif c == "J":
            i = _handle_j(v, r, i, sg)
        elif c == "K":
            r.append("K")
            i += 2 if _char(v, i + 1) == "K" else 1
        elif c == "L":
            i = _handle_l(v, r, i)
        elif c == "M":
            r.append("M")
            i += 2 if _condition_m0(v, i) else 1
        elif c == "N":
            r.append("N")
            i += 2 if _char(v, i + 1) == "N" else 1
        elif c == "Ñ":  # Ñ
            r.append("N")
            i += 1
        elif c == "P":
            i = _handle_p(v, r, i)
        elif c == "Q":
            r.append("K")
            i += 2 if _char(v, i + 1) == "Q" else 1
        elif c == "R":
            i = _handle_r(v, r, i, sg)
        elif c == "S":
            i = _handle_s(v, r, i, sg)
        elif c == "T":
            i = _handle_t(v, r, i)
        elif c == "V":
            r.append("F")
            i += 2 if _char(v, i + 1) == "V" else 1
        elif c == "W":
            i = _handle_w(v, r, i)
        elif c == "X":
            i = _handle_x(v, r, i)
        elif c == "Z":
            i = _handle_z(v, r, i, sg)
        else:
            i += 1
    return (
        "".join(r.primary).rstrip(),
        "".join(r.alternate).rstrip(),
    )


def double_metaphone_udf(max_code_len: int = 4, alternate: bool = False):
    """Arrow-batched encode column: string → string."""
    from pyspark.sql.functions import pandas_udf

    idx = 1 if alternate else 0

    @pandas_udf("string")
    def _dm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: double_metaphone(t, max_code_len)[idx]
            if isinstance(t, str)
            else t
        )

    return _dm
