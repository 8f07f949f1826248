"""ExtendableQueryParser analog — pluggable field-extension syntax.

References: `lucene/queryparser/src/java/org/apache/lucene/queryparser/
ext/ExtendableQueryParser.java:40`, `ext/Extensions.java:33`,
`ext/ParserExtension.java`, `ext/ExtensionQuery.java`.

An extension field ``<field><delim><key>`` routes the field's query
text to the :class:`ParserExtension` registered under ``key`` instead
of the normal term analysis; the RAW query string reaches the
extension un-analyzed (`ExtensionQuery.java` docs).  Semantics pinned
from ``TestExtendableQueryParser.java`` / ``TestExtensions.java``:

- ``splitExtensionField`` splits at the FIRST delimiter occurrence;
  a leading delimiter (``indexOf == 0``) resolves to the default
  field; no delimiter → no extension (key ``None``).
- ``buildExtensionField`` inverts the split: ``escape(field) + delim
  + escape(key)`` — the classic ``:`` separating field from term must
  therefore be ESCAPED inside the field part (``aField\\:key:term``).
- an UNescaped inner delimiter before a quoted term is a parse error
  (testUnescapedExtDelimiter).

The single-field engine resolves every field name to the corpus text
column, like the rest of the parser family; the extension mechanism —
what the module exists for — is field-name-faithful.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable, Dict, Optional, Tuple

from .query import Query
from .queryparser import QueryParseError, _Parser, _lex, _term_like

__all__ = [
    "DEFAULT_EXTENSION_FIELD_DELIMITER",
    "Extensions",
    "ExtensionQuery",
    "extendable_parse",
    "escape",
]

DEFAULT_EXTENSION_FIELD_DELIMITER = ":"

# QueryParserBase.escape: every parser special gets a backslash
_SPECIALS = set('\\+-!():^[]"{}~*?|&/')


def escape(s: str) -> str:
    """`classic/QueryParserBase.escape` analog."""
    return "".join("\\" + c if c in _SPECIALS else c for c in s)


def _unescape(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s)


@dataclass
class ExtensionQuery:
    """What a ParserExtension receives: the resolved field and the RAW
    (un-analyzed, unescaped) query string (`ext/ExtensionQuery.java`)."""

    field: str
    raw_query_string: str


class Extensions:
    """Registry of extension key → builder callable
    (``Callable[[ExtensionQuery], Query]`` — the ParserExtension.parse
    surface)."""

    def __init__(self, delimiter: str = DEFAULT_EXTENSION_FIELD_DELIMITER):
        if len(delimiter) != 1:
            raise ValueError("extension delimiter must be one character")
        self.delimiter = delimiter
        self._ext: Dict[str, Callable[[ExtensionQuery], Query]] = {}

    def add(self, key: str, extension: Callable[[ExtensionQuery], Query]) -> None:
        self._ext[key] = extension

    def get_extension(self, key: Optional[str]):
        return self._ext.get(key) if key is not None else None

    def split_extension_field(
        self, default_field: str, field: str
    ) -> Tuple[str, Optional[str]]:
        """(field, extension key): split at the FIRST delimiter;
        leading delimiter → default field; absent → key None
        (`Extensions.java:splitExtensionField`)."""
        idx = field.find(self.delimiter)
        if idx < 0:
            return field, None
        index_field = default_field if idx == 0 else field[:idx]
        return index_field, field[idx + 1 :]

    def build_extension_field(self, extension_key: str, field: str = "") -> str:
        """``escape(field) + delim + escape(key)`` — must invert
        :meth:`split_extension_field` (`Extensions.java` contract)."""
        return escape(field) + self.delimiter + escape(extension_key)


def _first_unescaped_colon(raw: str) -> int:
    i = 0
    while i < len(raw):
        if raw[i] == "\\":
            i += 2
            continue
        if raw[i] == ":":
            return i
        i += 1
    return -1


class _ExtParser(_Parser):
    def __init__(self, tokens, extensions: Extensions, default_field: str):
        super().__init__(tokens)
        self.ext = extensions
        self.default_field = default_field

    def _try_extension(self, raw: str) -> Optional[Query]:
        """Extension dispatch for one term token; None = not ours."""
        sep = _first_unescaped_colon(raw)
        if sep < 0:
            return None
        if sep == 0:
            # leading ext delimiter (":key:term" — default-field form):
            # the field part runs to the NEXT unescaped colon
            nxt_sep = _first_unescaped_colon(raw[1:])
            sep = nxt_sep + 1 if nxt_sep >= 0 else len(raw)
        field_esc, rest = raw[:sep], raw[sep + 1 :]
        if rest == "":
            # "<extfield>:" followed by a quoted term — the phrase body
            # is the raw query string, handed over un-analyzed
            t = self.peek()
            if t is None or t[0] != "phrase":
                return None
            if _first_unescaped_colon(field_esc) > 0:
                # testUnescapedExtDelimiter: the inner delimiter must be
                # escaped in the quoted form ("a\\:key:\"...\"")
                raise QueryParseError(
                    f"unescaped extension field delimiter in {raw!r}"
                )
            field, key = self.ext.split_extension_field(
                self.default_field, _unescape(field_esc)
            )
            builder = self.ext.get_extension(key)
            if builder is None:
                return None
            self.next()  # consume the phrase
            body, _slop = t[1]
            return builder(ExtensionQuery(field, _unescape(body)))
        # unquoted: "<extfield>:<raw term>"
        if rest.endswith(":") and not rest.endswith("\\:"):
            nxt = self.peek()
            if nxt is not None and nxt[0] == "phrase":
                # "a:b:"<quoted>: an unescaped INNER delimiter before a
                # quoted term (testUnescapedExtDelimiter) — the valid
                # quoted form escapes it ("a\\:b:\"...\"", rest == "")
                raise QueryParseError(
                    f"unescaped extension field delimiter in {raw!r}"
                )
        field, key = self.ext.split_extension_field(
            self.default_field, _unescape(field_esc)
        )
        builder = self.ext.get_extension(key)
        if builder is None:
            return None
        return builder(ExtensionQuery(field, _unescape(rest)))

    def parse_atom(self) -> Optional[Query]:
        t = self.peek()
        if t is not None and t[0] == "term":
            self.next()  # consume so _try_extension peeks the FOLLOWING token
            q = self._try_extension(str(t[1]))
            if q is not None:
                return q
            return _term_like(str(t[1]))
        return super().parse_atom()


def extendable_parse(
    s: str, extensions: Extensions, default_field: str = "text"
) -> Query:
    """Parse classic syntax with extension-field dispatch."""
    return _ExtParser(_lex(s), extensions, default_field).parse()
