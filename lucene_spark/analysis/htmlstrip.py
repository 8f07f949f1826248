"""HTML markup stripping — HTMLStripCharFilter analog.

Re-expresses the reference's HTML char filter
(`lucene/analysis/common/src/java/org/apache/lucene/analysis/charfilter/HTMLStripCharFilter.java:39`,
generated from `HTMLStripCharFilter.jflex` +
`HTMLCharacterEntities.jflex`): markup (tags, comments, script/style
bodies, processing instructions, doctypes) is removed, character
entities are decoded, ``<br>`` and closing block-level tags become a
newline (`HTMLStripCharFilter.java:5236` ``BR_*_TAG_REPLACEMENT =
'\\n'``), and everything else — including text inside inline markup —
passes through byte-identical. The reference's ``escapedTags``
constructor option (`HTMLStripCharFilter.java:5242,5264`: tags in the
set are NOT stripped) is supported on the Python path.

Spark-first architecture, two tiers:

- ``html_strip_col(col)`` — a pure-JVM ``Column`` built from chained
  ``regexp_replace``: stays inside WholeStageCodegen, so stripping a
  100 TB ``html`` column is a zero-shuffle, zero-Python projection
  that AQE/codegen fuse with the scan and the downstream analysis
  chain. Decodes the common named entities; numeric character
  references are the documented boundary (they need a per-match
  codepoint conversion no SQL function expresses).
- ``html_strip_udf(escaped_tags=...)`` — Arrow-batched pandas UDF,
  full fidelity: Python's ``html.unescape`` decodes the entire HTML5
  named-entity table plus decimal/hex numeric references (the same
  public W3C table the reference's JFlex scanner compiles in).

The 100 TB shape: both tiers are per-row projections over the
``html:binary`` column of a Common-Crawl-style page table — no
shuffle, no state; partition count is inherited from the scan, so the
job scales linearly with executors.
"""

from __future__ import annotations

import html as _htmllib
import re
from typing import Iterator, Optional, Sequence

import pandas as pd

__all__ = [
    "html_strip_col",
    "html_strip_str",
    "html_strip_udf",
    "extract_html_text",
    "BLOCK_TAGS",
    "NAMED_ENTITIES",
]

# Block-level elements whose *closing* tag (and <br>) emits '\n', so
# that "<p>a</p><p>b</p>" keeps a token/sentence boundary between a
# and b, mirroring the reference scanner's newline substitutions.
BLOCK_TAGS = (
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "tr", "table", "blockquote", "pre", "section", "article", "header",
    "footer", "nav", "aside", "title",
)

# Named entities the pure-SQL tier decodes (the high-frequency subset
# of the W3C table; `&amp;` MUST be decoded last so that e.g.
# "&amp;lt;" round-trips to the literal text "&lt;", not "<").
NAMED_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&copy;", "©"),
    ("&reg;", "®"),
    ("&trade;", "™"),
    ("&hellip;", "…"),
    ("&mdash;", "—"),
    ("&ndash;", "–"),
    ("&lsquo;", "‘"),
    ("&rsquo;", "’"),
    ("&ldquo;", "“"),
    ("&rdquo;", "”"),
    ("&amp;", "&"),  # keep last
)

_CDATA_RE = r"(?s)<!\[CDATA\[(.*?)\]\]>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_SCRIPT_STYLE_RE = r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>"
_BR_RE = r"(?i)<br\s*/?\s*>"
_BLOCK_CLOSE_RE = r"(?i)</(?:%s)\s*>" % "|".join(BLOCK_TAGS)
# quote-aware attribute scan so `title="t>u"` doesn't end the tag early;
# documented divergence from the reference scanner: CDATA *content* is
# re-scanned, so tag-shaped text inside CDATA is also stripped.
_TAG_RE = r"(?s)<[!/?]?[a-zA-Z](?:\"[^\"]*\"|'[^']*'|[^>\"'])*>"


def html_strip_col(col):
    """Pure-JVM markup strip: ``Column`` (string) → ``Column`` (string).

    Chained ``regexp_replace`` projections — WholeStageCodegen end to
    end, no Python, no shuffle. Named-entity subset only (see module
    docstring for the numeric-reference boundary).
    """
    from pyspark.sql import functions as F

    c = F.regexp_replace(col, _CDATA_RE, "$1")
    c = F.regexp_replace(c, _COMMENT_RE, "")
    c = F.regexp_replace(c, _SCRIPT_STYLE_RE, "")
    c = F.regexp_replace(c, _BR_RE, "\n")
    c = F.regexp_replace(c, _BLOCK_CLOSE_RE, "\n")
    c = F.regexp_replace(c, _TAG_RE, "")
    for ent, ch in NAMED_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


_PY_CDATA = re.compile(_CDATA_RE)
_PY_COMMENT = re.compile(_COMMENT_RE)
_PY_SCRIPT_STYLE = re.compile(_SCRIPT_STYLE_RE)
_PY_BR = re.compile(_BR_RE)
_PY_BLOCK_CLOSE = re.compile(_BLOCK_CLOSE_RE)
_PY_TAG = re.compile(_TAG_RE)


def html_strip_str(
    s: Optional[str], escaped_tags: Sequence[str] = ()
) -> Optional[str]:
    """Full-fidelity strip of one string (the UDF kernel).

    ``escaped_tags``: tag names to leave verbatim in the output, the
    reference's ``escapedTags`` option (`HTMLStripCharFilter.java:5264`).
    Entity decoding uses the whole HTML5 table + numeric references
    via ``html.unescape``.
    """
    if s is None:
        return None
    s = _PY_CDATA.sub(r"\1", s)
    s = _PY_COMMENT.sub("", s)
    s = _PY_SCRIPT_STYLE.sub("", s)
    if escaped_tags:
        keep = {t.lower() for t in escaped_tags}

        def _tag_sub(m: "re.Match[str]") -> str:
            name = re.match(r"<[/!?]?\s*([a-zA-Z][a-zA-Z0-9]*)", m.group(0))
            if name and name.group(1).lower() in keep:
                return m.group(0)
            return ""

        if "br" not in keep:
            s = _PY_BR.sub("\n", s)
        s = _PY_BLOCK_CLOSE.sub(
            lambda m: m.group(0)
            if re.match(r"</\s*([a-zA-Z0-9]+)", m.group(0)).group(1).lower()
            in keep
            else "\n",
            s,
        )
        s = _PY_TAG.sub(_tag_sub, s)
    else:
        s = _PY_BR.sub("\n", s)
        s = _PY_BLOCK_CLOSE.sub("\n", s)
        s = _PY_TAG.sub("", s)
    return _htmllib.unescape(s)


def html_strip_udf(escaped_tags: Sequence[str] = ()):
    """Arrow-batched pandas UDF: string column → stripped string."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    tags = tuple(escaped_tags)

    @F.pandas_udf(StringType())
    def _strip(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ser in batches:
            yield ser.map(lambda s: html_strip_str(s, tags))

    return _strip


def extract_html_text(
    df,
    html_col: str = "html",
    out_col: str = "text",
    binary: bool = False,
    exact_entities: bool = False,
):
    """Project a page DataFrame's ``html`` column to extracted text.

    ``binary=True`` decodes the column from UTF-8 bytes first (the
    Common-Crawl-style schema stores ``html:binary``). With
    ``exact_entities`` the Arrow UDF tier (full entity table) is used;
    otherwise the pure-codegen tier.
    """
    from pyspark.sql import functions as F

    src = F.col(html_col)
    if binary:
        src = F.decode(src, "UTF-8")
    stripped = (
        html_strip_udf()(src) if exact_entities else html_strip_col(src)
    )
    return df.withColumn(out_col, stripped)
