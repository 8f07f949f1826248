"""Boilerplate removal: main-content extraction from web pages.

The training-data-pipeline op every Common-Crawl-scale corpus needs
before dedup/quality filtering: split a page into block-level
segments, score each block by text length and link density, keep the
content blocks, drop navigation/footer chrome. The classifier is the
published jusText / Boilerpipe core heuristic (Pomikálek 2011,
"Removing boilerplate and duplicate content from web corpora", §4;
Kohlschütter et al. 2010, "Boilerplate detection using shallow text
features": link density and text density are the two strongest
features) in its language-independent form:

    keep block  ⇔  text_chars ≥ min_text_len
                   AND link_chars / text_chars < max_link_density

Spark-first shape: the whole pipeline is ONE projection built from
``split`` + higher-order functions (``transform`` / ``filter`` /
``aggregate``) — JVM expressions end to end, no Python, no explode,
no shuffle; a 100 TB page table keeps its scan partitioning and the
work scales linearly with executors. Patterns are RE2-compatible (no
backreferences) so the same algorithm is emitted to DuckDB for the
correctness oracle.

Related reference surface: the markup-stripping primitive mirrors
`lucene/analysis/common/src/java/org/apache/lucene/analysis/charfilter/HTMLStripCharFilter.java:39`
(see `analysis/htmlstrip.py`); block classification itself is beyond
Lucene's scope and cited to the public papers above.
"""

from __future__ import annotations

from lucene_spark.analysis.htmlstrip import NAMED_ENTITIES

__all__ = [
    "BLOCK_SPLIT_RE",
    "LINK_RE",
    "block_texts",
    "extract_main_content",
    "oracle_main_content_sql",
]

# Block-level boundary tags (open or close, attributes allowed). The
# delimiters themselves are consumed by split(); inline markup (<a>,
# <b>, <span>, ...) stays inside the block and is handled per block.
_BLOCK_TAG_NAMES = (
    "p|div|h1|h2|h3|h4|h5|h6|li|ul|ol|table|tr|td|th|section|article"
    "|header|footer|nav|aside|blockquote|pre|body|html|head|title|form"
)
BLOCK_SPLIT_RE = r"(?i)</?(?:%s)(?:\s[^>]*)?/?>" % _BLOCK_TAG_NAMES

# Anchor content (group 1) — lazy, dotall; RE2-safe (no backrefs).
LINK_RE = r"(?is)<a\b[^>]*>(.*?)</a\s*>"

_COMMENT_RE = r"(?s)<!--.*?-->"
_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script\s*>"
_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style\s*>"
_ANY_TAG_RE = r"(?s)<[!/?]?[a-zA-Z](?:\"[^\"]*\"|'[^']*'|[^>\"'])*>"


def _text_of(col):
    """Visible text of one block: comments/script/style out, tags out,
    entities decoded, trimmed. Pure Column expression."""
    from pyspark.sql import functions as F

    c = F.regexp_replace(col, _COMMENT_RE, "")
    c = F.regexp_replace(c, _SCRIPT_RE, "")
    c = F.regexp_replace(c, _STYLE_RE, "")
    c = F.regexp_replace(c, _ANY_TAG_RE, "")
    for ent, ch in NAMED_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(c)


def _link_chars_of(col):
    """Total characters of anchor text in one block."""
    from pyspark.sql import functions as F

    return F.aggregate(
        F.regexp_extract_all(col, F.lit(LINK_RE), F.lit(1)),
        F.lit(0),
        lambda acc, x: acc + F.length(x),
    )


def block_texts(html_col):
    """``Column``: html string → array of per-block visible texts."""
    from pyspark.sql import functions as F

    return F.transform(
        F.split(html_col, BLOCK_SPLIT_RE), lambda b: _text_of(b)
    )


def extract_main_content(
    df,
    html_col: str = "html",
    out_col: str = "content",
    min_text_len: int = 25,
    max_link_density_thirds: int = 1,
    stopwords=None,
    min_stop_density_tenths: int = 0,
):
    """Add ``content`` (kept blocks joined by newline), ``n_blocks``
    and ``n_kept`` columns.

    ``max_link_density_thirds``: the density threshold expressed as
    thirds so the comparison stays in integers on both engines —
    1 ⇒ keep iff 3·link_chars < text_chars (jusText's ~0.33 default).

    ``stopwords`` + ``min_stop_density_tenths``: optional jusText
    stopword-density feature — keep additionally requires
    10·stop_tokens ≥ tenths·total_tokens (e.g. 3 ⇒ ≥30% function
    words, the published "good block" signal). Integer math so the
    DuckDB oracle reproduces it bit-for-bit.
    """
    from pyspark.sql import functions as F

    blocks = F.split(F.col(html_col), BLOCK_SPLIT_RE)
    stop_arr = (
        F.array(*[F.lit(w) for w in sorted(set(stopwords))])
        if stopwords
        else None
    )

    def _keep(b):
        t = _text_of(b)
        cond = (F.length(t) >= F.lit(min_text_len)) & (
            F.lit(3) * _link_chars_of(b)
            < F.lit(max_link_density_thirds) * F.length(t)
        )
        if stop_arr is not None and min_stop_density_tenths > 0:
            toks = F.filter(
                F.split(F.lower(t), r"[^\p{L}\p{N}]+"),
                lambda w: w != F.lit(""),
            )
            n_stop = F.size(
                F.filter(toks, lambda w: F.array_contains(stop_arr, w))
            )
            cond = cond & (
                F.lit(10) * n_stop
                >= F.lit(min_stop_density_tenths) * F.size(toks)
            )
        return cond

    kept = F.filter(blocks, _keep)
    return (
        df.withColumn("n_blocks", F.size(blocks))
        .withColumn("n_kept", F.size(kept))
        .withColumn(
            out_col, F.array_join(F.transform(kept, lambda b: _text_of(b)), "\n")
        )
    )


def oracle_main_content_sql(
    html_expr: str,
    min_text_len: int = 25,
    max_link_density_thirds: int = 1,
    stopwords=None,
    min_stop_density_tenths: int = 0,
) -> str:
    """DuckDB expression set re-implementing the SAME algorithm over
    ``html_expr`` with list lambdas — returns a SQL fragment defining
    ``n_blocks``, ``n_kept``, ``content`` (for use in a SELECT list).
    """
    def _q(pat: str) -> str:
        return pat.replace("'", "''")

    ent = (
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        f"b, '{_q(_COMMENT_RE)}', '', 'g'), '{_q(_SCRIPT_RE)}', '', 'g'), "
        f"'{_q(_STYLE_RE)}', '', 'g'), '{_q(_ANY_TAG_RE)}', '', 'g')"
    )
    for e, ch in NAMED_ENTITIES:
        ent = f"replace({ent}, '{_q(e)}', '{_q(ch)}')"
    text_of = f"trim({ent})"
    link_chars = (
        "coalesce(list_sum(list_transform("
        f"regexp_extract_all(b, '{_q(LINK_RE)}', 1), y -> length(y))), 0)"
    )
    stop_cond = ""
    if stopwords and min_stop_density_tenths > 0:
        stop_list = ", ".join(
            f"'{_q(w)}'" for w in sorted(set(stopwords))
        )
        toks = (
            f"list_filter(regexp_split_to_array(lower({text_of}), "
            "'[^\\p{L}\\p{N}]+'), w -> w != '')"
        )
        n_stop = (
            f"len(list_filter({toks}, "
            f"w -> list_contains([{stop_list}], w)))"
        )
        stop_cond = (
            f" AND 10 * {n_stop} >= {min_stop_density_tenths} * len({toks})"
        )
    return f"""
  blocks AS (
    SELECT doc_id,
           regexp_split_to_array({html_expr}, '{BLOCK_SPLIT_RE}') AS bl
    FROM src
  ),
  scored AS (
    SELECT doc_id,
           len(bl) AS n_blocks,
           list_filter(bl, b -> length({text_of}) >= {min_text_len}
                         AND 3 * {link_chars}
                             < {max_link_density_thirds} * length({text_of})
                         {stop_cond})
             AS kept
    FROM blocks
  ),
  final AS (
    SELECT doc_id, n_blocks, len(kept) AS n_kept,
           coalesce(list_aggregate(list_transform(kept, b -> {text_of}),
                                   'string_agg', chr(10)), '') AS content
    FROM scored
  )
"""
