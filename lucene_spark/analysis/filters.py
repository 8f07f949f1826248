"""Common analysis-chain filters as JVM-side column functions.

Lucene's `analysis/common` module ships the token filters every real
deployment composes around the core analyzers. The Spark re-expression
keeps token streams as array columns (`array<string>`, position =
array index) so every filter below is a pure Catalyst expression —
whole-stage-codegen'd, zero Python in the build or query path:

- :func:`whitespace_tokens` — WhitespaceAnalyzer/WhitespaceTokenizer
  (`analysis/common/src/java/org/apache/lucene/analysis/core/WhitespaceTokenizer.java`):
  split on whitespace runs, no lowercasing.
- :func:`keyword_token` — KeywordAnalyzer (`core/KeywordAnalyzer.java`):
  the whole input is one token.
- :func:`length_filter` — LengthFilter (`miscellaneous/LengthFilter.java`):
  keep tokens with min <= len <= max.
- :func:`trim_filter` — TrimFilter (`miscellaneous/TrimFilter.java`).
- :func:`shingles` — ShingleFilter (`shingle/ShingleFilter.java:26-60`):
  word n-grams ("shingles") of sizes [min_shingle, max_shingle] joined
  by a separator, optionally keeping the unigrams — the word-ngram
  source for phrase suggesters and index-time phrase speedups.
- :func:`edge_ngrams` — EdgeNGramTokenFilter
  (`ngram/EdgeNGramTokenFilter.java`): per-token prefixes of length
  [min_gram, max_gram], the standard autocomplete/search-as-you-type
  indexing shape.
- :func:`char_ngrams` — NGramTokenFilter (`ngram/NGramTokenFilter.java`):
  all character n-grams of each token.
- :func:`ascii_fold` — ASCIIFoldingFilter
  (`miscellaneous/ASCIIFoldingFilter.java`): fold Latin-1 Supplement /
  Latin Extended-A letters to ASCII (the subset covering European
  scripts; the reference folds further Unicode blocks).
- :func:`synonym_expand` — SynonymGraphFilter
  (`synonym/SynonymGraphFilter.java`): expand each token into the set
  of terms stacked at its position (original + synonyms, posIncrement
  0), returned as `array<array<string>>` — position = outer index.

At 100 TB these matter precisely because they are column expressions:
a shingle or edge-ngram index build adds zero shuffles (the expansion
happens inside the scan stage before the existing build kernel), and
Catalyst prunes/pushes around them like any other projection.
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import Column, functions as F

__all__ = [
    "keyword_repeat_stemmed",
    "whitespace_tokens",
    "keyword_token",
    "length_filter",
    "trim_filter",
    "shingles",
    "edge_ngrams",
    "char_ngrams",
    "ascii_fold",
    "synonym_expand",
    "delimited_payload_analyzer",
    "delimited_boost_terms",
    "delimited_boost_query",
    "word_delimiter_parts",
    "reverse_tokens",
    "common_grams",
    "tee_tokens",
]


def whitespace_tokens(text_col: Column) -> Column:
    """Split on whitespace runs; drops empty tokens (WhitespaceTokenizer)."""
    return F.filter(F.split(text_col, r"\s+"), lambda t: t != "")


def keyword_token(text_col: Column) -> Column:
    """The entire input as a single token (KeywordAnalyzer); empty input
    yields an empty stream like Lucene's empty TokenStream."""
    return F.when(
        text_col.isNotNull() & (text_col != ""), F.array(text_col)
    ).otherwise(F.array().cast("array<string>"))


def length_filter(tokens_col: Column, min_len: int = 1, max_len: int = 255) -> Column:
    """Keep tokens with min_len <= length <= max_len (LengthFilter)."""
    return F.filter(
        tokens_col,
        lambda t: (F.length(t) >= min_len) & (F.length(t) <= max_len),
    )


def trim_filter(tokens_col: Column) -> Column:
    """Trim leading/trailing whitespace per token (TrimFilter trims
    `Character.isWhitespace`, so regexp \\s rather than SQL TRIM's
    space-only semantics)."""
    return F.transform(
        tokens_col, lambda t: F.regexp_replace(t, r"^\s+|\s+$", "")
    )


def shingles(
    tokens_col: Column,
    min_shingle: int = 2,
    max_shingle: int = 2,
    separator: str = " ",
    output_unigrams: bool = False,
) -> Column:
    """Word n-grams of sizes [min_shingle, max_shingle] (ShingleFilter).

    Emitted in Lucene's stream order: for each start position, the
    unigram (if requested) then each shingle size ascending. No filler
    tokens (input streams here have no stopword holes — stop filtering
    happens downstream of shingling in chains that combine them).
    """
    if min_shingle < 2 or max_shingle < min_shingle:
        raise ValueError("need 2 <= min_shingle <= max_shingle")
    n = F.size(tokens_col)
    sizes = list(range(min_shingle, max_shingle + 1))
    if output_unigrams:
        sizes = [1] + sizes

    def at(i: Column) -> Column:  # grams starting at 0-based index i
        grams = [
            F.when(
                i + size <= n,
                F.array_join(F.slice(tokens_col, i + 1, size), separator),
            )
            for size in sizes
        ]
        return F.filter(F.array(*grams), lambda g: g.isNotNull())

    return F.flatten(
        F.transform(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0))), at)
    )


def edge_ngrams(
    tokens_col: Column,
    min_gram: int = 1,
    max_gram: int = 2,
    preserve_original: bool = False,
) -> Column:
    """Per-token prefixes of length [min_gram, max_gram]
    (EdgeNGramTokenFilter); `preserve_original` additionally emits
    tokens longer than max_gram unchanged (its preserveOriginal flag).
    Tokens shorter than min_gram are dropped, matching the reference.
    """
    if min_gram < 1 or max_gram < min_gram:
        raise ValueError("need 1 <= min_gram <= max_gram")

    def grams(t: Column) -> Column:
        gs = [
            F.when(F.length(t) >= g, F.substring(t, 1, g))
            for g in range(min_gram, max_gram + 1)
        ]
        if preserve_original:
            gs.append(F.when(F.length(t) > max_gram, t))
        return F.filter(F.array(*gs), lambda g: g.isNotNull())

    return F.flatten(F.transform(tokens_col, grams))


def char_ngrams(
    tokens_col: Column, min_gram: int = 1, max_gram: int = 2
) -> Column:
    """All character n-grams of each token (NGramTokenFilter): per
    token, gram sizes ascending, offsets ascending within each size."""
    if min_gram < 1 or max_gram < min_gram:
        raise ValueError("need 1 <= min_gram <= max_gram")

    def grams(t: Column) -> Column:
        per_size = [
            F.when(
                F.length(t) >= g,
                F.transform(
                    F.sequence(F.lit(1), F.length(t) - g + 1),
                    lambda i: t.substr(i, F.lit(g)),
                ),
            ).otherwise(F.array().cast("array<string>"))
            for g in range(min_gram, max_gram + 1)
        ]
        return F.flatten(F.array(*per_size))

    return F.flatten(F.transform(tokens_col, grams))


# 1:1 foldings (Latin-1 Supplement + Latin Extended-A letters)
_FOLD_SRC = (
    "ÀÁÂÃÄÅàáâãäåÇçÈÉÊËèéêëÌÍÎÏìíîïÑñÒÓÔÕÖØòóôõöøÙÚÛÜùúûüÝŸýÿ"
    "ĀāĂăĄąĆćĈĉĊċČčĎďĐđĒēĔĕĖėĘęĚěĜĝĞğĠġĢģĤĥĦħĨĩĪīĬĭĮįİı"
    "ĴĵĶķĹĺĻļĽľĿŀŁłŃńŅņŇňŌōŎŏŐőŔŕŖŗŘřŚśŜŝŞşŠšŢţŤťŦŧ"
    "ŨũŪūŬŭŮůŰűŲųŴŵŶŷŹźŻżŽž"
)
_FOLD_DST = (
    "AAAAAAaaaaaaCcEEEEeeeeIIIIiiiiNnOOOOOOooooooUUUUuuuuYYyy"
    "AaAaAaCcCcCcCcDdDdEeEeEeEeEeGgGgGgGgHhHhIiIiIiIiIi"
    "JjKkLlLlLlLlLlNnNnNnOoOoOoRrRrRrSsSsSsSsTtTtTt"
    "UuUuUuUuUuUuWwYyZzZzZz"
)
assert len(_FOLD_SRC) == len(_FOLD_DST)
# multi-char foldings (ligatures / special letters)
_FOLD_MULTI = [
    ("Æ", "AE"), ("æ", "ae"), ("Œ", "OE"), ("œ", "oe"),
    ("ß", "ss"), ("Þ", "TH"), ("þ", "th"), ("Ð", "D"), ("ð", "d"),
    ("Ĳ", "IJ"), ("ĳ", "ij"), ("ﬁ", "fi"), ("ﬂ", "fl"),
]


def ascii_fold(col: Column) -> Column:
    """Fold accented Latin letters to their ASCII equivalents
    (ASCIIFoldingFilter, Latin-1 Supplement + Latin Extended-A scope).
    Works on a text column or inside `F.transform` over a token array.
    """
    out = F.translate(col, _FOLD_SRC, _FOLD_DST)
    for src, dst in _FOLD_MULTI:
        out = F.replace(out, F.lit(src), F.lit(dst))
    return out


def synonym_expand(
    tokens_col: Column,
    synonyms: Dict[str, List[str]],
    keep_original: bool = True,
) -> Column:
    """Expand each token to the terms stacked at its position
    (SynonymGraphFilter with posIncrement-0 stacking): returns
    `array<array<string>>`, outer index = position. The inner array is
    the original token (unless `keep_original=False`, replace-mode)
    followed by its mapped synonyms.
    """
    if not synonyms:
        return F.transform(tokens_col, lambda t: F.array(t))
    pairs: list = []
    for k, vs in synonyms.items():
        pairs.append(F.lit(k))
        pairs.append(F.array(*[F.lit(v) for v in vs]))
    m = F.create_map(*pairs)
    empty = F.array().cast("array<string>")

    def expand(t: Column) -> Column:
        mapped = F.coalesce(m[t], empty)
        if keep_original:
            return F.concat(F.array(t), mapped)
        # replace-mode: original survives only when unmapped
        return F.when(F.size(mapped) > 0, mapped).otherwise(F.array(t))

    return F.transform(tokens_col, expand)


def delimited_payload_analyzer(delimiter: str = "|", lowercase: bool = False):
    """Analyzer callable: ``"term|payload"`` tokens → (term, position,
    float payload) triples.

    The Python-side analog of WhitespaceTokenizer +
    DelimitedPayloadTokenFilter with the float encoder
    (`analysis/common/src/java/org/apache/lucene/analysis/payloads/
    DelimitedPayloadTokenFilter.java`, `payloads/FloatEncoder.java`):
    each whitespace token is split at the LAST delimiter; the suffix
    parses as the position's payload (missing/empty/unparsable suffix →
    payload 0.0, matching an absent PayloadAttribute read back as
    zeros). Positions are the raw split indexes, matching the 'simple'
    analyzer, so payload-indexed and plain positional builds of the
    same corpus align doc-for-doc.

    Pass the result as ``InvertedIndex.build(..., analyzer=...,
    positions=True, payloads=True)``. It runs inside the build kernel's
    Arrow batches (per-doc Python, not per-row Spark UDF).
    """

    def analyze(text: str):
        out = []
        for pos, raw in enumerate(text.split(" ")):
            if not raw:
                continue
            term, sep, suffix = raw.rpartition(delimiter)
            if not sep:
                term, suffix = raw, ""
            if not term:
                continue
            try:
                pay = float(suffix) if suffix else 0.0
            except ValueError:
                pay = 0.0
            out.append((term.lower() if lowercase else term, pos, pay))
        return out

    return analyze


def delimited_boost_terms(query_text: str, delimiter: str = "|"):
    """DelimitedBoostTokenFilter analog for query analysis:
    ``"term|boost"`` tokens → [(term, boost)] in token order.

    Mirrors `analysis/common/src/java/org/apache/lucene/analysis/boost/
    DelimitedBoostTokenFilter.java:28`: the token splits at the FIRST
    delimiter occurrence, the remainder parses as the BoostAttribute
    float, and a token without the delimiter keeps the default boost
    1.0 (BoostAttribute's initial value).  Unparsable boosts raise,
    matching ``Float.parseFloat``.
    """
    out = []
    for raw in query_text.split():
        term, sep, suffix = raw.partition(delimiter)
        out.append((term, float(suffix) if sep else 1.0))
    return out


def delimited_boost_query(query_text: str, delimiter: str = "|"):
    """Token stream → term→boost map for a boosted SHOULD disjunction.

    A repeated term contributes one BooleanQuery clause per occurrence;
    since per-clause BM25 scores add, the clauses fold to a single
    entry with the boosts summed (score-identical, one posting decode
    instead of n).
    """
    boosts: dict = {}
    for term, boost in delimited_boost_terms(query_text, delimiter):
        boosts[term] = boosts.get(term, 0.0) + boost
    return boosts


def word_delimiter_parts(
    text_col: Column,
    catenate_all: bool = False,
    preserve_original: bool = False,
) -> Column:
    """WordDelimiterGraphFilter's core splits
    (`analysis/common/src/java/org/apache/lucene/analysis/miscellaneous/
    WordDelimiterGraphFilter.java:71`, WordDelimiterIterator rules) as
    an all-JVM codegen chain over a whitespace-tokenized column:

    - sub-word boundaries at non-alphanumerics (``wi-fi`` → wi, fi),
      lower→upper case transitions (``WiFi`` → Wi, Fi; ``HTTPServer``
      → HTTP, Server), and letter↔digit transitions
      (``PowerShot500`` → Power, Shot, 500) — GENERATE_WORD_PARTS +
      GENERATE_NUMBER_PARTS;
    - ``catenate_all`` additionally emits the run with all delimiters
      removed (CATENATE_ALL);
    - ``preserve_original`` additionally emits the unsplit token
      (PRESERVE_ORIGINAL).

    Case is preserved (a LowerCaseFilter composes after, as in the
    reference chain). Returns array<string> of emitted tokens per
    input row. Boundary-insertion uses capture-group regexp_replace —
    no lookaheads, so the same rules express in RE2 for the DuckDB
    oracle. Physical shape: four regexp_replace + one split, all
    inside whole-stage codegen — zero UDFs, zero shuffles.
    """
    s = F.regexp_replace(text_col, r"([a-z0-9])([A-Z])", r"$1 $2")
    s = F.regexp_replace(s, r"([A-Z]+)([A-Z][a-z])", r"$1 $2")
    s = F.regexp_replace(s, r"([A-Za-z])([0-9])", r"$1 $2")
    s = F.regexp_replace(s, r"([0-9])([A-Za-z])", r"$1 $2")
    parts = F.filter(F.split(s, r"[^A-Za-z0-9]+"), lambda t: t != "")
    extras = []
    if catenate_all:
        joined = F.regexp_replace(text_col, r"[^A-Za-z0-9]+", "")
        extras.append(
            F.when(joined != "", F.array(joined)).otherwise(
                F.array().cast("array<string>")
            )
        )
    if preserve_original:
        extras.append(
            F.when(text_col != "", F.array(text_col)).otherwise(
                F.array().cast("array<string>")
            )
        )
    out = parts
    for e in extras:
        out = F.concat(out, e)
    return F.array_distinct(out)


def reverse_tokens(tokens_col: Column) -> Column:
    """ReverseStringFilter (`analysis/common/.../reverse/
    ReverseStringFilter.java:34`): reverse every token. Its real job is
    leading-wildcard acceleration — index the reversed form and
    ``*suffix`` becomes a PREFIX probe on the reversed dictionary,
    which at scale is a sorted-parquet min/max-prunable range scan
    instead of a full-dictionary regex pass."""
    return F.transform(tokens_col, F.reverse)


def common_grams(tokens_col: Column, common_words, separator: str = "_") -> Column:
    """CommonGramsFilter (`analysis/common/.../commongrams/
    CommonGramsFilter.java:51`): for each adjacent pair where either
    side is a common word, emit ``a{sep}b`` — phrase queries containing
    stopwords hit one pre-joined bigram posting instead of intersecting
    a monster stopword posting list. Returns the bigram array (compose
    with the unigram stream as the reference filter does). All-JVM
    higher-order functions, zero shuffles."""
    common = F.array(*[F.lit(w) for w in sorted(set(common_words))])
    n = F.size(tokens_col)
    left = F.slice(tokens_col, 1, F.greatest(n - 1, F.lit(0)))
    right = F.slice(tokens_col, 2, F.greatest(n - 1, F.lit(0)))
    pairs = F.zip_with(
        left,
        right,
        lambda a, b: F.when(
            F.array_contains(common, a) | F.array_contains(common, b),
            F.concat(a, F.lit(separator), b),
        ),
    )
    return F.filter(pairs, lambda x: x.isNotNull())


def fingerprint(tokens_col: Column, separator: str = " ",
                max_output_size: int = 1024) -> Column:
    """FingerprintFilter (`analysis/common/.../miscellaneous/
    FingerprintFilter.java:34`): ONE token = the sorted, de-duplicated
    input tokens joined by ``separator`` — the classic clustering /
    record-linkage key. Emits NULL when the concatenation would exceed
    ``max_output_size`` (the reference emits nothing). All-JVM
    array_distinct + array_sort + array_join, zero shuffles — at
    100 TB this is a projection feeding a normal dedup groupBy."""
    joined = F.array_join(
        F.array_sort(F.array_distinct(tokens_col)), separator
    )
    return F.when(F.length(joined) <= max_output_size, joined)


def keyword_repeat_stemmed(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """KeywordRepeatFilter + PorterStemFilter + RemoveDuplicatesFilter
    (`miscellaneous/KeywordRepeatFilter.java:31`,
    `miscellaneous/RemoveDuplicatesTokenFilter.java:29`): each token is
    emitted twice — the original (keyword-flagged so the stemmer skips
    it) and the stemmed variant at the SAME position (posInc 0) — then
    duplicate (term, position) pairs collapse, so unstemmed==stemmed
    tokens appear once. The standard "index both exact and stemmed
    forms" recipe.

    Spark re-expression: posexplode + one Arrow stem pass +
    array_distinct per position + explode — per-doc local, no shuffle.
    Returns (id_col, pos, term) rows, one per distinct form."""
    from pyspark.sql import functions as F

    from lucene_spark.analysis.porter import porter_stem_udf

    stem = porter_stem_udf()
    toks = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("pos", "term"),
    )
    return (
        toks.withColumn("_stem", stem(F.col("term")))
        .select(
            id_col,
            "pos",
            F.explode(
                F.array_distinct(F.array(F.col("term"), F.col("_stem")))
            ).alias("term"),
        )
        .orderBy(id_col, "pos", "term")
    )


def tee_tokens(docs, text_col: str = "text", analyzer_udf=None):
    """TeeSinkTokenFilter analog (`analysis/common/.../sinks/
    TeeSinkTokenFilter.java:38`): run the analysis chain ONCE and feed
    any number of downstream consumers ("sinks") from the same token
    stream.  The Spark shape is a PERSISTED token frame: the one Arrow
    analysis pass materializes into the columnar cache and every sink
    reads InMemoryTableScan — no re-analysis, exactly the
    tee-then-consume contract (the reference's caveat that sinks see
    tokens only after the source is consumed maps to Spark's laziness:
    the first sink action materializes the cache for all).

    Returns the cached DataFrame with a ``tokens`` column; call
    ``.unpersist()`` when every sink is done.
    """
    from pyspark.sql import functions as F

    if analyzer_udf is None:
        from .analyzer import standard_analyzer_udf

        tok = standard_analyzer_udf()(F.col(text_col))
        tokens = F.transform(tok, lambda t: t["term"])
    else:
        tokens = analyzer_udf(F.col(text_col))
    return docs.withColumn("tokens", tokens).persist()
