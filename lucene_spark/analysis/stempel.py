"""Stempel (Egothor) algorithmic stemmer — the Polish analysis module.

Reference parity targets:
  - lucene/analysis/stempel/src/java/org/egothor/stemmer/Trie.java:84
    (serialized trie-of-rows format, ``getLastOnPath`` walk)
  - org/egothor/stemmer/MultiTrie.java:84 and MultiTrie2.java:137
    (trie-of-tries with '*' end-of-multi markers, the ``cannotFollow`` /
    ``skip`` / ``lengthPP`` key-shortening protocol)
  - org/egothor/stemmer/Diff.java:103 (``apply``: patch-command
    interpreter, exception-swallowing partial application) and
    Diff.java:157 (``exec``: Levenshtein-trellis patch-command trainer)
  - org/egothor/stemmer/Compile.java:109 (table training loop)
  - org/apache/lucene/analysis/stempel/StempelStemmer.java:58 (table
    loader dispatch on the method header) and StempelFilter.java:71
    (min-length-3 gate, unchanged token on stem failure)
  - org/apache/lucene/analysis/pl/PolishAnalyzer.java:135 (standard
    tokenize -> lowercase -> Polish stop -> stempel chain)

Architecture notes (Spark-first, not a port):
  - The stemmer table is plain data.  ``load_trie`` decodes the
    reference's Java ``DataOutput`` serialization (big-endian, modified
    UTF-8) so the shipped ``stemmer_20000.tbl`` can be used when a user
    supplies it; the repo itself ships no binary blob — the in-repo
    Polish table is TRAINED at import time from a compact inflection
    lexicon via the same ``Diff.exec`` trainer the reference's Compile
    tool uses.  Training is embarrassingly parallel ((form, lemma) pairs
    are independent), so at 100 TB the patch-command computation runs as
    a Spark map over the corpus lexicon and only the tiny trie assembly
    happens on the driver.
  - Stemming runs inside the existing Arrow analysis stage, memoized
    per unique token per batch (Zipf makes the hit rate high); no extra
    Spark stage, no shuffle, no per-row Python UDF.
"""

from __future__ import annotations

import struct
from functools import lru_cache
from typing import Dict, List, Optional, Sequence, Tuple

__all__ = [
    "JavaDataInput",
    "Trie",
    "MultiTrie2",
    "diff_apply",
    "diff_exec",
    "load_trie",
    "build_table",
    "StempelStemmer",
    "polish_stemmer",
    "polish_stem",
    "POLISH_STOP_WORDS",
    "polish_analyze",
    "polish_stem_udf",
]


# ---------------------------------------------------------------------------
# Java DataInput decoding (big-endian primitives + modified UTF-8)
# ---------------------------------------------------------------------------


class JavaDataInput:
    """Minimal reader for the Java ``DataOutput`` wire format.

    Covers exactly what the Egothor serialization uses: boolean, int,
    char (one UTF-16 code unit) and ``writeUTF`` (2-byte length prefix +
    modified UTF-8: 1/2/3-byte forms, surrogates as CESU-8 pairs, NUL as
    0xC0 0x80).
    """

    def __init__(self, data: bytes):
        self._d = data
        self._p = 0

    def read_boolean(self) -> bool:
        b = self._d[self._p]
        self._p += 1
        return b != 0

    def read_int(self) -> int:
        v = struct.unpack_from(">i", self._d, self._p)[0]
        self._p += 4
        return v

    def read_char(self) -> str:
        v = struct.unpack_from(">H", self._d, self._p)[0]
        self._p += 2
        return chr(v)

    def read_utf(self) -> str:
        n = struct.unpack_from(">H", self._d, self._p)[0]
        self._p += 2
        end = self._p + n
        units: List[int] = []
        d = self._d
        p = self._p
        while p < end:
            b0 = d[p]
            if b0 < 0x80:
                units.append(b0)
                p += 1
            elif (b0 & 0xE0) == 0xC0:
                units.append(((b0 & 0x1F) << 6) | (d[p + 1] & 0x3F))
                p += 2
            else:  # 3-byte form (incl. each half of a CESU-8 surrogate pair)
                units.append(
                    ((b0 & 0x0F) << 12)
                    | ((d[p + 1] & 0x3F) << 6)
                    | (d[p + 2] & 0x3F)
                )
                p += 3
        self._p = end
        # combine any surrogate pairs into real code points
        out: List[str] = []
        i = 0
        while i < len(units):
            u = units[i]
            if 0xD800 <= u <= 0xDBFF and i + 1 < len(units) and 0xDC00 <= units[i + 1] <= 0xDFFF:
                out.append(chr(0x10000 + ((u - 0xD800) << 10) + (units[i + 1] - 0xDC00)))
                i += 2
            else:
                out.append(chr(u))
                i += 1
        return "".join(out)


# ---------------------------------------------------------------------------
# Patch-command interpreter + trainer (Diff.java)
# ---------------------------------------------------------------------------

_BASE = ord("a") - 1


def diff_apply(word: str, diff: Optional[str]) -> str:
    """Apply an Egothor patch string to ``word`` (Diff.java:103).

    The reference swallows StringIndexOutOfBounds mid-application and
    keeps whatever was already applied; we replicate by bounds-checking
    each mutation and stopping (not raising) on violation.
    """
    if diff is None:
        return word
    buf = list(word)
    pos = len(buf) - 1
    if pos < 0:
        return word
    for i in range(len(diff) // 2):
        cmd = diff[2 * i]
        param = diff[2 * i + 1]
        par_num = ord(param) - _BASE
        if cmd == "-":
            pos = pos - par_num + 1
        elif cmd == "R":
            if pos < 0 or pos >= len(buf):
                break
            buf[pos] = param
        elif cmd == "D":
            o = pos
            pos -= par_num - 1
            # StringBuilder.delete throws on start<0, start>len, start>end
            if pos < 0 or pos > len(buf) or pos > o + 1:
                break
            del buf[pos : min(o + 1, len(buf))]
        elif cmd == "I":
            pos += 1
            # StringBuilder.insert throws on offset<0 or offset>len
            if pos < 0 or pos > len(buf):
                break
            buf.insert(pos, param)
        pos -= 1
    return "".join(buf)


def diff_exec(a: str, b: str, ins: int = 1, dele: int = 1, rep: int = 1, noop: int = 0) -> Optional[str]:
    """Produce the patch string transforming ``a`` into ``b`` (Diff.java:157).

    Levenshtein trellis with the reference's exact tie-breaking (``>=``
    toward delete, ``>`` toward insert/replace) so the emitted command
    strings are byte-identical to what Compile.java trains into tables.
    """
    if a is None or b is None:
        return None
    X, Y, R, D = 1, 2, 3, 0
    maxx, maxy = len(a) + 1, len(b) + 1
    net = [[0] * maxy for _ in range(maxx)]
    way = [[0] * maxy for _ in range(maxx)]
    for x in range(1, maxx):
        net[x][0] = x
        way[x][0] = X
    for y in range(1, maxy):
        net[0][y] = y
        way[0][y] = Y
    for x in range(1, maxx):
        ax = a[x - 1]
        nx, nx1 = net[x], net[x - 1]
        wx = way[x]
        for y in range(1, maxy):
            go_x = nx1[y] + dele
            go_y = nx[y - 1] + ins
            go_r = nx1[y - 1] + rep
            go_d = nx1[y - 1] + (noop if ax == b[y - 1] else 100)
            mn, mv = D, go_d
            if mv >= go_x:
                mn, mv = X, go_x
            if mv > go_y:
                mn, mv = Y, go_y
            if mv > go_r:
                mn, mv = R, go_r
            wx[y] = mn
            nx[y] = mv
    out: List[str] = []
    deletes = equals = 0  # counts; rendered as chr(_BASE + n)
    x, y = maxx - 1, maxy - 1
    while x + y != 0:
        w = way[x][y]
        if w == X:  # delete
            if equals:
                out.append("-" + chr(_BASE + equals))
                equals = 0
            deletes += 1
            x -= 1
        elif w == Y:  # insert
            if deletes:
                out.append("D" + chr(_BASE + deletes))
                deletes = 0
            if equals:
                out.append("-" + chr(_BASE + equals))
                equals = 0
            y -= 1
            out.append("I" + b[y])
        elif w == R:  # replace
            if deletes:
                out.append("D" + chr(_BASE + deletes))
                deletes = 0
            if equals:
                out.append("-" + chr(_BASE + equals))
                equals = 0
            y -= 1
            out.append("R" + b[y])
            x -= 1
        else:  # noop
            if deletes:
                out.append("D" + chr(_BASE + deletes))
                deletes = 0
            equals += 1
            x -= 1
            y -= 1
    if deletes:
        out.append("D" + chr(_BASE + deletes))
    return "".join(out)


# ---------------------------------------------------------------------------
# Trie / MultiTrie2 (lookup + add; Trie.java, MultiTrie2.java)
# ---------------------------------------------------------------------------


def _char_at(s: str, i: int) -> str:
    """Java charAt: raises on i<0 (Python would wrap negative indexes)."""
    if i < 0 or i >= len(s):
        raise IndexError(i)
    return s[i]


class Trie:
    """One Egothor trie: rows of (cmd, ref, skip) cells keyed by char."""

    __slots__ = ("forward", "root", "cmds", "rows")

    def __init__(self, forward: bool = False):
        self.forward = forward
        self.root = 0
        self.cmds: List[str] = []
        # each row: dict char -> [cmd, ref, skip]
        self.rows: List[Dict[str, list]] = [{}]

    # -- serialization (Trie.java:84, Row.java:78) --

    @classmethod
    def read(cls, din: JavaDataInput) -> "Trie":
        t = cls.__new__(cls)
        t.forward = din.read_boolean()
        t.root = din.read_int()
        t.cmds = [din.read_utf() for _ in range(din.read_int())]
        t.rows = []
        for _ in range(din.read_int()):
            row: Dict[str, list] = {}
            for _ in range(din.read_int()):
                ch = din.read_char()
                cmd = din.read_int()
                din.read_int()  # cnt — unused for lookup
                ref = din.read_int()
                skip = din.read_int()
                row[ch] = [cmd, ref, skip]
            t.rows.append(row)
        return t

    # -- iteration order (Trie.StrEnum) --

    def _enum(self, key: str) -> List[str]:
        return list(key) if self.forward else list(reversed(key))

    def _row(self, idx: int) -> Optional[Dict[str, list]]:
        if idx < 0 or idx >= len(self.rows):
            return None
        return self.rows[idx]

    # -- lookups --

    def get_fully(self, key: str) -> Optional[str]:
        now = self._row(self.root)
        cmd = -1
        seq = self._enum(key)
        i = 0
        n = len(key)
        while i < n:
            ch = seq[i]
            i += 1
            c = now.get(ch) if now is not None else None
            if c is None:
                return None
            cmd = c[0]
            for _ in range(c[2]):  # skip chars
                if i < n:
                    i += 1
                else:
                    return None
            w = c[1]
            if w >= 0:
                now = self._row(w)
            elif i < n:
                return None
        return None if cmd == -1 else self.cmds[cmd]

    def get_last_on_path(self, key: str) -> Optional[str]:
        now = self._row(self.root)
        last: Optional[str] = None
        seq = self._enum(key)
        for i in range(len(key) - 1):
            ch = seq[i]
            c = now.get(ch)
            if c is not None and c[0] >= 0:
                last = self.cmds[c[0]]
            if c is not None and c[1] >= 0:
                now = self.rows[c[1]]
            else:
                return last
        c = now.get(seq[len(key) - 1])
        if c is not None and c[0] >= 0:
            return self.cmds[c[0]]
        return last

    # -- training (Trie.java:327) --

    def add(self, key: Optional[str], cmd: Optional[str]) -> None:
        if key is None or cmd is None or len(cmd) == 0:
            return
        try:
            id_cmd = self.cmds.index(cmd)
        except ValueError:
            id_cmd = len(self.cmds)
            self.cmds.append(cmd)
        node = self.root
        r = self.rows[node]
        seq = self._enum(key)
        for i in range(len(key) - 1):
            ch = seq[i]
            c = r.get(ch)
            if c is not None and c[1] >= 0:
                r = self.rows[c[1]]
            else:
                node = len(self.rows)
                nr: Dict[str, list] = {}
                self.rows.append(nr)
                if c is None:
                    r[ch] = [-1, node, 0]
                else:
                    c[1] = node
                r = nr
        ch = seq[len(key) - 1]
        c = r.get(ch)
        if c is None:
            r[ch] = [id_cmd, -1, 0]
        else:
            c[0] = id_cmd


_EOM = "*"


class MultiTrie2:
    """Trie-of-tries with skip-delimited command pieces (MultiTrie2.java)."""

    __slots__ = ("forward", "by", "tries")

    def __init__(self, forward: bool = False):
        self.forward = forward
        self.by = 1
        self.tries: List[Trie] = []

    @classmethod
    def read(cls, din: JavaDataInput) -> "MultiTrie2":
        # MultiTrie.store layout: boolean forward, int BY, int count, tries
        m = cls.__new__(cls)
        m.forward = din.read_boolean()
        m.by = din.read_int()
        m.tries = [Trie.read(din) for _ in range(din.read_int())]
        return m

    # -- helpers (MultiTrie2.java:286-330) --

    @staticmethod
    def _cannot_follow(after: str, goes: str) -> bool:
        return after in "-D" and after == goes

    def _skip(self, s: str, count: int) -> str:
        if count < 0 or count > len(s):
            raise IndexError(count)
        return s[count:] if self.forward else s[: len(s) - count]

    @staticmethod
    def _length_pp(cmd: str) -> int:
        ln = 0
        i = 0
        while i < len(cmd):
            c = cmd[i]
            i += 1
            if c in "-D":
                ln += ord(_char_at(cmd, i)) - _BASE
            elif c == "R":
                ln += 1
            # 'I' contributes nothing
            i += 1
        return ln

    @staticmethod
    def _dash_even(cmd: str, frm: int) -> int:
        while frm < len(cmd):
            if cmd[frm] == "-":
                return frm
            frm += 2
        return -1

    def _decompose(self, cmd: str) -> List[str]:
        parts: List[str] = []
        i = 0
        while 0 <= i < len(cmd):
            nxt = self._dash_even(cmd, i)
            if i == nxt:
                parts.append(cmd[i : i + 2])
                i = nxt + 2
            else:
                parts.append(cmd[i:] if nxt < 0 else cmd[i:nxt])
                i = nxt
        return parts

    # -- lookup (MultiTrie2.java:137) --

    def get_last_on_path(self, key: str) -> str:
        result: List[str] = []
        try:
            lastkey = key
            prev: Optional[str] = None
            lastch = " "
            for trie in self.tries:
                r = trie.get_last_on_path(lastkey)
                if r is None or (len(r) == 1 and r[0] == _EOM):
                    return "".join(result)
                if self._cannot_follow(lastch, _char_at(r, 0)):
                    return "".join(result)
                lastch = _char_at(r, len(r) - 2)
                if r[0] == "-":
                    if prev is not None:
                        key = self._skip(key, self._length_pp(prev))
                    key = self._skip(key, self._length_pp(r))
                prev = r
                result.append(r)
                if len(key) != 0:
                    lastkey = key
        except IndexError:
            pass
        return "".join(result)

    # -- training (MultiTrie2.java:196) --

    def add(self, key: str, cmd: str) -> None:
        if len(cmd) == 0:
            return
        p = self._decompose(cmd)
        levels = len(p)
        while levels >= len(self.tries):
            self.tries.append(Trie(self.forward))
        lastkey = key
        for i in range(levels):
            if len(key) > 0:
                self.tries[i].add(key, p[i])
                lastkey = key
            else:
                self.tries[i].add(lastkey, p[i])
            if len(p[i]) > 0 and p[i][0] == "-":
                try:
                    if i > 0:
                        key = self._skip(key, self._length_pp(p[i - 1]))
                    key = self._skip(key, self._length_pp(p[i]))
                except IndexError:
                    key = ""
        if len(key) > 0:
            self.tries[levels].add(key, _EOM)
        else:
            self.tries[levels].add(lastkey, _EOM)


# ---------------------------------------------------------------------------
# Loader (StempelStemmer.java:58) + trainer entry (Compile.java:109)
# ---------------------------------------------------------------------------


def load_trie(data: bytes):
    """Decode a serialized stemmer table (``*.tbl``).

    Dispatches exactly like StempelStemmer.load: a method header
    containing 'M' means a MultiTrie2, otherwise a plain Trie.
    """
    din = JavaDataInput(data)
    method = din.read_utf().upper()
    if "M" in method:
        return MultiTrie2.read(din)
    return Trie.read(din)


def build_table(
    pairs: Sequence[Tuple[str, str]],
    backward: bool = True,
    multi: bool = True,
    store_orig: bool = False,
):
    """Train a stemmer table from (inflected form, lemma) pairs.

    The Compile.java loop: lowercase, skip form==lemma, add the
    Diff.exec patch command under the inflected key.  At scale the
    ``diff_exec`` calls are a Spark map over the distinct lexicon; only
    the (small) trie assembly is driver-side.
    """
    trie = MultiTrie2(not backward) if multi else Trie(not backward)
    for form, lemma in pairs:
        form = form.lower()
        lemma = lemma.lower()
        if store_orig:
            trie.add(lemma, "-a")
        if form != lemma:
            cmd = diff_exec(form, lemma)
            if cmd:
                trie.add(form, cmd)
    return trie


class StempelStemmer:
    """StempelStemmer.java:79 — getLastOnPath + Diff.apply, None on failure."""

    def __init__(self, trie):
        self.trie = trie
        self._memo: Dict[str, Optional[str]] = {}

    def stem(self, word: str) -> Optional[str]:
        hit = self._memo.get(word)
        if hit is not None or word in self._memo:
            return hit
        # Java: only a null command is a failure; an empty MultiTrie2
        # result applies as a no-op and returns the word itself.
        cmd = self.trie.get_last_on_path(word)
        if cmd is None:
            res: Optional[str] = None
        else:
            buf = diff_apply(word, cmd)
            res = buf if len(buf) > 0 else None
        if len(self._memo) < 1_000_000:
            self._memo[word] = res
        return res


# ---------------------------------------------------------------------------
# Compact in-repo Polish table + PolishAnalyzer-shaped chain
# ---------------------------------------------------------------------------

# Hand-curated inflection lexicon (lemma, [inflected forms]) covering the
# productive Polish paradigms (masculine/feminine/neuter noun cases,
# adjective agreement, common verb conjugation).  This is NOT the
# reference's 20k-lexeme trained table — it is a compact training set for
# the same trainer; out-of-lexicon suffixes still generalize because
# getLastOnPath backs off to the longest trained suffix path.
_POLISH_LEXEMES: List[Tuple[str, List[str]]] = [
    ("student", ["studenta", "studentowi", "studentem", "studencie",
                 "studenci", "studentów", "studentom", "studentami",
                 "studentach", "studentu"]),
    ("profesor", ["profesora", "profesorowi", "profesorem", "profesorze",
                  "profesorowie", "profesorów", "profesorom"]),
    ("nauczyciel", ["nauczyciela", "nauczycielowi", "nauczycielem",
                    "nauczyciele", "nauczycieli", "nauczycielom"]),
    ("kot", ["kota", "kotu", "kotem", "kocie", "koty", "kotów", "kotom",
             "kotami", "kotach"]),
    ("dom", ["domu", "domowi", "domem", "domy", "domów", "domom",
             "domami", "domach"]),
    ("miasto", ["miasta", "miastu", "miastem", "mieście", "miast",
                "miastom", "miastami", "miastach"]),
    ("kobieta", ["kobiety", "kobiecie", "kobietę", "kobietą", "kobiet",
                 "kobietom", "kobietami", "kobietach"]),
    ("książka", ["książki", "książce", "książkę", "książką", "książek",
                 "książkom", "książkami", "książkach"]),
    ("droga", ["drogi", "drodze", "drogę", "drogą", "dróg", "drogom",
               "drogami", "drogach"]),
    ("okno", ["okna", "oknu", "oknem", "oknie", "okien", "oknom",
              "oknami", "oknach"]),
    ("dobry", ["dobrego", "dobremu", "dobrym", "dobra", "dobrej",
               "dobrą", "dobre", "dobrzy", "dobrych", "dobrymi"]),
    ("nowy", ["nowego", "nowemu", "nowym", "nowa", "nowej", "nową",
              "nowe", "nowi", "nowych", "nowymi"]),
    ("wielki", ["wielkiego", "wielkiemu", "wielkim", "wielka",
                "wielkiej", "wielką", "wielkie", "wielcy", "wielkich",
                "wielkimi"]),
    ("polski", ["polskiego", "polskiemu", "polskim", "polska",
                "polskiej", "polską", "polskie", "polscy", "polskich",
                "polskimi"]),
    ("robić", ["robię", "robisz", "robi", "robimy", "robicie", "robią",
               "robił", "robiła", "robili", "robiono"]),
    ("pisać", ["piszę", "piszesz", "pisze", "piszemy", "piszecie",
               "piszą", "pisał", "pisała", "pisali", "pisano"]),
    ("czytać", ["czytam", "czytasz", "czyta", "czytamy", "czytacie",
                "czytają", "czytał", "czytała", "czytali", "czytano"]),
    ("mówić", ["mówię", "mówisz", "mówi", "mówimy", "mówicie", "mówią",
               "mówił", "mówiła", "mówili", "mówiono"]),
    ("praca", ["pracy", "pracę", "pracą", "prac", "pracom", "pracami",
               "pracach"]),
    ("rok", ["roku", "rokowi", "rokiem", "lata", "latach", "latami"]),
    ("człowiek", ["człowieka", "człowiekowi", "człowiekiem", "ludzie",
                  "ludzi", "ludziom", "ludźmi", "ludziach"]),
    ("dziecko", ["dziecka", "dziecku", "dzieckiem", "dzieci", "dzieciom",
                 "dziećmi", "dzieciach"]),
    ("woda", ["wody", "wodzie", "wodę", "wodą", "wód", "wodom",
              "wodami", "wodach"]),
    ("ręka", ["ręki", "ręce", "rękę", "ręką", "rąk", "rękom", "rękami",
              "rękach"]),
    ("szkoła", ["szkoły", "szkole", "szkołę", "szkołą", "szkół",
                "szkołom", "szkołami", "szkołach"]),
    ("uniwersytet", ["uniwersytetu", "uniwersytetowi", "uniwersytetem",
                     "uniwersytecie", "uniwersytety", "uniwersytetów"]),
    ("komputer", ["komputera", "komputerowi", "komputerem",
                  "komputerze", "komputery", "komputerów",
                  "komputerom", "komputerami", "komputerach"]),
    ("telefon", ["telefonu", "telefonowi", "telefonem", "telefonie",
                 "telefony", "telefonów", "telefonom", "telefonami"]),
    ("program", ["programu", "programowi", "programem", "programie",
                 "programy", "programów", "programom", "programami"]),
    ("system", ["systemu", "systemowi", "systemem", "systemie",
                "systemy", "systemów", "systemom", "systemami"]),
]

# PolishAnalyzer stopword set (stopwords.txt, carrot2-derived list the
# reference ships; data, not code)
POLISH_STOP_WORDS = frozenset(
    """vol o.o. mgr godz zł www pl ul tel hab prof inż dr i u aby albo ale
    ani aż bardzo bez bo bowiem by byli bym był była było były być będzie
    będą chce choć co coraz coś czy czyli często dla do gdy gdyby gdyż
    gdzie go ich im inne iż ja jak jakie jako je jednak jednym jedynie
    jego jej jest jeszcze jeśli jeżeli już ją kiedy kilku kto która które
    którego której który których którym którzy lat lecz lub ma mają mamy
    mi miał mimo mnie mogą może można mu musi na nad nam nas nawet nic
    nich nie niej nim niż no nowe np nr o od ok on one oraz pan po pod
    ponad ponieważ poza przed przede przez przy raz razie roku również
    się sobie sposób swoje są ta tak takich takie także tam te tego tej
    temu ten teraz też to trzeba tu tych tylko tym tys tzw tę w we wie
    więc wszystko wśród właśnie z za zaś ze że żeby ii iii iv vi vii viii
    ix xi xii xiii xiv xv""".split()
)


@lru_cache(maxsize=1)
def polish_stemmer() -> StempelStemmer:
    pairs = [(form, lemma) for lemma, forms in _POLISH_LEXEMES for form in forms]
    return StempelStemmer(build_table(pairs, backward=True, multi=True))


def polish_stem(word: str) -> str:
    """StempelFilter semantics: min length 3, unchanged on stem failure."""
    if len(word) < 3:
        return word
    s = polish_stemmer().stem(word)
    return word if s is None else s


def polish_analyze(text: str, exclusions: frozenset = frozenset()) -> List[str]:
    """PolishAnalyzer.java:135 chain: standard tokenize -> lowercase ->
    Polish stop -> (keyword-marked exclusions skipped) -> stempel."""
    from .analyzer import tokenize, simple_lowercase

    out: List[str] = []
    for tok in tokenize(text):
        low = simple_lowercase(tok)
        if low in POLISH_STOP_WORDS:
            continue
        out.append(low if low in exclusions else polish_stem(low))
    return out


def polish_stem_udf():
    """pandas_udf: word column → Polish stem (Arrow-batched; the
    StempelStemmer memoizes per unique token, so Zipfian web text pays
    the trie walk once per distinct word per executor)."""
    import pandas as pd
    from pyspark.sql import functions as F

    def _stem(s):
        return s.map(polish_stem)

    # module has `from __future__ import annotations`; give pandas_udf
    # real (non-string) type hints explicitly
    _stem.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(_stem, "string")
