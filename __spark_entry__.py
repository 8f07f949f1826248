"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship float32-exact block-max-WAND BM25
query end-to-end on sf0.001. `queries()` exposes one entry per
implemented operator (SURVEY.md §2 + training-data pipeline ops);
`oracle_sql()` gives the DuckDB-equivalent SQL for each, generated from
the same parameter sets (see lucene_spark/search/parity.py for why the
gate queries score BM25 in float64: Lucene float32 semantics are pytest
-verified separately and cannot be expressed in ANSI SQL).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from lucene_spark.index import InvertedIndex
from lucene_spark.search.parity import (
    bm25_topk_f64,
    oracle_similarity_sql,
    similarity_topk_f64,
    dismax_f64,
    oracle_bm25_sql,
    oracle_dismax_sql,
    blended_fuzzy_f64,
    oracle_blended_fuzzy_sql,
    oracle_collapse_sql,
    oracle_feature_sql,
    oracle_rescore_sql,
    oracle_phrase_sql,
    oracle_search_after_sql,
    oracle_synonym_sql,
    phrase_bm25_f64,
    search_after_f64,
    synonym_bm25_f64,
    _bm25_scored_ctes,
    _decode_postings,
)
from lucene_spark.search import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    FuzzyQuery,
    IndexSearcher,
    MultiTermFilterDocsQuery,
    Occur,
    PrefixQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    rewrite,
    diversified_topk,
    doc_values_stats,
    dynamic_range_facets,
    high_freq_terms,
    memory_index_scores,
    profile_df,
)
from lucene_spark.pipeline import (
    cosine_topk,
    exact_duplicates,
    fingerprint_md5,
    language_id,
    lsh_bucket_topk,
    minhash_signatures,
    ngram_jaccard_pairs,
    quality_score,
    rolling_fingerprint,
    simhash,
    simhash_near_dups,
    token_counts,
    word_shingles,
)

# ---------------------------------------------------------------------------
# shared helpers

_INDEX_CACHE: dict = {}
_COMMIT_CACHE: dict = {}
_BP_CACHE: dict = {}
_REPLICA_CACHE: dict = {}
_SORTED_STORE_CACHE: dict = {}
_UPGRADE_CACHE: dict = {}

# compression-ratio gate corpus: pinned texts + their deflate-level-6
# sizes (zlib is pinned in this container; the oracle pins the bytes)
_ZR_TEXTS = [
    "the cat sat on the mat " * 40,
    "Information retrieval systems rank documents by estimated relevance to a user query using statistical signals.",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    "Spark executes declarative plans through a whole-stage code generator that fuses operators into compact loops.",
    "buy now click here buy now click here buy now click here buy now click here",
    "q7fz2kx9mw4vj8tr1ydc5nhb3lgp6soe0aiu",
    "Posting lists compress well when document identifiers are clustered by topical similarity before encoding.",
    "zero zero zero zero zero one one one one one two two two two two",
]
_ZR_GOLDENS = [
    (0, 920, 36, 0.0391),
    (1, 110, 94, 0.8545),
    (2, 40, 12, 0.3),
    (3, 110, 94, 0.8545),
    (4, 75, 30, 0.4),
    (5, 36, 44, 1.2222),
    (6, 106, 93, 0.8774),
    (7, 64, 25, 0.3906),
]

TOK_CTE = (
    "tok AS (SELECT doc_id, term FROM (SELECT doc_id, "
    "unnest(string_split(text, ' ')) AS term FROM documents) WHERE term <> '')"
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _index(spark: SparkSession, sf_dir: str) -> InvertedIndex:
    if sf_dir not in _INDEX_CACHE:
        _INDEX_CACHE[sf_dir] = InvertedIndex.build(
            _docs(spark, sf_dir),
            analyzer="simple",
            docs_per_segment=2048,
            positions=True,  # phrase queries run off the same index
        )
    return _INDEX_CACHE[sf_dir]


def _const_score_docs(spark, sf_dir, query, k=100) -> DataFrame:
    """Multi-term query → constant-score matched docs (doc_id asc, k)."""
    idx = _index(spark, sf_dir)
    searcher = IndexSearcher(idx)
    rw = rewrite(ConstantScoreQuery(query), idx.terms)
    ctx = searcher._bind(rw)
    docs = searcher._matching_docs(rw, ctx).distinct()
    return (
        docs.select("doc_id", F.lit(1.0).alias("score"))
        .orderBy("doc_id")
        .limit(k)
    )


def _const_score_oracle(term_pred: str, k: int = 100) -> str:
    return f"""
WITH {TOK_CTE}
SELECT DISTINCT doc_id, 1.0 AS score FROM tok WHERE {term_pred}
ORDER BY doc_id LIMIT {k}
"""


# Pluggable-similarity gates (engine + oracle generated from the same
# Similarity object, `search/similarities/`): one two-term disjunction
# scored under each built-in family.
_SIM_TERMS = {"hash": 1.0, "join": 1.5}

# query polygon for the newPolygonQuery gate: convex ring, vertices
# off the synthetic shapes' 1/8-degree grid (no boundary ties)
_QPOLY = [(-2.005, -1.255), (1.755, -1.005), (2.005, 1.505), (-1.505, 2.005)]


def _similarity_gates():
    from lucene_spark.search.similarity import (
        AxiomaticF1EXP,
        AxiomaticF1LOG,
        AxiomaticF2EXP,
        AxiomaticF2LOG,
        AxiomaticF3EXP,
        AxiomaticF3LOG,
        BooleanSimilarity,
        ClassicSimilarity,
        DFIChiSquared,
        DFRInL2Similarity,
        IBLLSimilarity,
        DFISaturated,
        DFIStandardized,
        DFRGB2Similarity,
        DFRIFLH3Similarity,
        DFRIneB1Similarity,
        IBSPLSimilarity,
        IBSPLZSimilarity,
        IndriDirichletSimilarity,
        LMDirichletSimilarity,
        LMJelinekMercerSimilarity,
        MultiSimilarity,
        RawTFSimilarity,
    )

    from lucene_spark.search.similarity import (
        SweetSpotHyperbolicSimilarity,
        SweetSpotSimilarity,
    )

    return {
        "classic_term_topk": ClassicSimilarity,
        "lmdirichlet_topk": LMDirichletSimilarity,
        "lmjm_topk": LMJelinekMercerSimilarity,
        "boolean_sim_topk": BooleanSimilarity,
        "dfr_topk": DFRInL2Similarity,
        "axiomatic_topk": AxiomaticF2EXP,
        "dfi_topk": DFIChiSquared,
        "ib_ll_topk": IBLLSimilarity,
        # plateau length norm + baseline tf floor (misc module)
        "sweetspot_topk": lambda: SweetSpotSimilarity(
            tf_min=2.0, tf_base=1.5, ln_min=20, ln_max=40, steepness=0.5
        ),
        # Indri Dirichlet (negative log-prob scores, no clamp)
        "indri_dirichlet_topk": IndriDirichletSimilarity,
        # mean of sub-similarities (MultiSimilarity.MultiSimScorer)
        "multi_sim_topk": lambda: MultiSimilarity(
            (ClassicSimilarity(), RawTFSimilarity())
        ),
        # the remaining DFR/IB/DFI framework members
        "dfr_gb2_topk": DFRGB2Similarity,
        "ib_spl_topk": IBSPLSimilarity,
        "dfi_std_topk": DFIStandardized,
        # the remaining axiomatic variants (F2EXP is covered above)
        "axiomatic_f1exp_topk": AxiomaticF1EXP,
        "axiomatic_f1log_topk": AxiomaticF1LOG,
        "axiomatic_f2log_topk": AxiomaticF2LOG,
        "axiomatic_f3exp_topk": lambda: AxiomaticF3EXP(query_len=2),
        "axiomatic_f3log_topk": lambda: AxiomaticF3LOG(query_len=2),
        "dfr_ifh3_topk": DFRIFLH3Similarity,
        "dfi_sat_topk": DFISaturated,
        # the last DFR/IB component axes: I(ne), H1, Z
        "dfr_ineb1_topk": DFRIneB1Similarity,
        "ib_splz_topk": IBSPLZSimilarity,
        "sweetspot_hyperbolic_topk": lambda: SweetSpotHyperbolicSimilarity(
            ln_min=20, ln_max=40
        ),
    }


_SIMILARITY_GATES = _similarity_gates()


# LatLonShape polygon gate: vertices sit at .005 offsets so no corpus
# point (two-decimal grid) lands exactly on an edge — engine and
# oracle evaluate the identical even-odd expression away from ties
_POLYGON = [
    (35.005, -10.005),
    (60.005, -5.005),
    (55.005, 30.005),
    (40.005, 25.005),
    (30.005, 10.005),
]

# BM25 gate query parameter sets (engine + oracle generated from these)
_BM25_QUERIES = {
    "term_topk": dict(term_boosts={"spark": 1.0}, k=20),
    "term_topk_rare": dict(term_boosts={"vector": 1.0}, k=15),
    "bool_should_topk": dict(term_boosts={"hash": 1.0, "join": 1.0, "merge": 1.0}, k=25),
    "bool_should_boosted": dict(term_boosts={"spark": 2.0, "query": 1.0, "window": 3.0}, k=20),
    "bool_msm2": dict(term_boosts={"hash": 1.0, "join": 1.0, "scan": 1.0}, min_should_match=2, k=20),
    "bool_must": dict(term_boosts={"hash": 1.0}, must_terms=["join"], k=20),
    "bool_must_not": dict(term_boosts={"hash": 1.0}, must_not_terms=["join"], k=20),
    "bool_filter": dict(term_boosts={"merge": 1.0}, filter_terms=["sort"], k=20),
}

_SIMHASH_MAX_ID = 30

# Fixed inflected-form battery for the Porter gate; stems hand-derived
# from the published 1980 algorithm (also pytest goldens). The corpus
# vocabulary's non-identity stems live in _STEM_MAP.
_STEM_BATTERY = {
    "relational": "relat", "conditional": "condit", "hopefulness": "hope",
    "adjustable": "adjust", "replacement": "replac", "digitizer": "digit",
    "motoring": "motor", "caresses": "caress", "ponies": "poni",
    "hopping": "hop", "sized": "size", "happy": "happi",
    "electrical": "electr", "formalize": "formal", "allowance": "allow",
    "controll": "control",
}
_STEM_MAP = {
    "customer": "custom", "merge": "merg", "table": "tabl",
    "value": "valu", "key": "kei", "query": "queri",
}
_STEM_CASE = (
    "CASE "
    + " ".join(f"WHEN term = '{w}' THEN '{s}'" for w, s in _STEM_MAP.items())
    + " ELSE term END"
)


def _simhash_hex(spark, sf_dir) -> DataFrame:
    df = _docs(spark, sf_dir).filter((F.col("doc_id") < _SIMHASH_MAX_ID) & (F.col("text") != ""))
    sh = simhash(df)
    hi = F.shiftrightunsigned("simhash", 32)
    lo = F.col("simhash").bitwiseAND(F.lit(0xFFFFFFFF))
    return sh.select("doc_id", F.format_string("%08x%08x", hi, lo).alias("simhash_hex"))


def _simhash_near_dups_oracle(max_hamming: int = 3) -> str:
    """Brute-force pair oracle: per-doc simhash halves (hi, lo) as
    BIGINTs, hamming = bit_count(xor(hi)) + bit_count(xor(lo))."""

    def bit(j):
        d = j // 4
        s = 3 - (j % 4)
        return (
            f"(((strpos('0123456789abcdef', substr(md5(term), {d + 1}, 1)) - 1) >> {s}) & 1)"
        )

    votes = [
        f"CASE WHEN sum(freq * (2 * {bit(j)} - 1)) > 0 THEN 1 ELSE 0 END AS b{j}"
        for j in range(64)
    ]
    hi = " + ".join(f"(b{j}::BIGINT << {31 - j})" for j in range(32))
    lo = " + ".join(f"(b{j}::BIGINT << {63 - j})" for j in range(32, 64))
    return f"""
WITH tok AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    WHERE text <> ''
  ) WHERE term <> ''
),
tf AS (SELECT doc_id, term, count(*) AS freq FROM tok GROUP BY doc_id, term),
bits AS (SELECT doc_id, {', '.join(votes)} FROM tf GROUP BY doc_id),
h AS (SELECT doc_id, {hi} AS hi, {lo} AS lo FROM bits)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       (bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)))::INT AS hamming
FROM h a JOIN h b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= {max_hamming}
"""


def _simhash_oracle() -> str:
    # bit j (0 = MSB) of the first 16 hex chars of md5(term)
    def bit(j):
        d = j // 4
        s = 3 - (j % 4)
        return (
            f"(((strpos('0123456789abcdef', substr(md5(term), {d + 1}, 1)) - 1) >> {s}) & 1)"
        )

    votes = [
        f"CASE WHEN sum(freq * (2 * {bit(j)} - 1)) > 0 THEN 1 ELSE 0 END AS b{j}"
        for j in range(64)
    ]
    hi = " + ".join(f"(b{j}::BIGINT << {31 - j})" for j in range(32))
    lo = " + ".join(f"(b{j}::BIGINT << {63 - j})" for j in range(32, 64))
    return f"""
WITH {TOK_CTE},
tf AS (
  SELECT doc_id, term, count(*) AS freq FROM tok
  WHERE doc_id < {_SIMHASH_MAX_ID} GROUP BY doc_id, term
),
bits AS (SELECT doc_id, {', '.join(votes)} FROM tf GROUP BY doc_id)
SELECT doc_id, printf('%08x%08x', {hi}, {lo}) AS simhash_hex FROM bits
"""


_SHINGLE_CTE = """
shingles AS (
  SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       LATERAL (SELECT unnest(generate_series(1, greatest(len(l) - 2, 0))) AS i)
)
"""


def _minhash_oracle(num_hashes: int, max_id: int) -> str:
    sigs = ", ".join(
        f"min(md5(concat('{i}|', shingle))) AS sig_{i}" for i in range(num_hashes)
    )
    return f"""
WITH {_SHINGLE_CTE}
SELECT doc_id, {sigs} FROM shingles WHERE doc_id < {max_id} GROUP BY doc_id
"""


_DLQ_CASE = (
    "CASE WHEN dl < 24 THEN dl WHEN (dl - 24) < 8 THEN dl "
    "ELSE 24 + (((dl - 24) >> (length(bin(dl - 24)) - 4)) << (length(bin(dl - 24)) - 4)) END"
)
# ICU folding gate vocabulary: (source token, UTR#30 folding). The
# foldings are spec constants (public Unicode data); both engines see
# the identical source stream (pure function of doc_id), the engine
# folds with unicodedata, the oracle looks the folding up.
_ICU_PAIRS = [
    ("Résumé", "resume"),
    ("NAÏVE", "naive"),
    ("Café", "cafe"),
    ("ZÜRICH", "zurich"),
    ("ﬁnance", "finance"),
    ("ＦＵＬＬ", "full"),
    ("straße", "strasse"),
    ("Σίσυφος", "σισυφοσ"),
    ("İstanbul", "istanbul"),
    ("Ⅻ", "xii"),
    ("ﬂow", "flow"),
    ("東京", "東京"),
]
_ICU_SRC_TOKENS = [s for s, _ in _ICU_PAIRS]

# Stempel (Egothor) Polish stemmer gate corpus: pinned inflected forms +
# their expected lemmas from the in-repo trained table.  The stemming
# algorithm (trie walk + Diff.apply patch commands) is validated
# Java-parity in tests/test_stempel.py against the reference's own
# stemmer_20000.tbl; the oracle pins the trained-table outputs so any
# trainer/trie/apply drift hash-mismatches here.
_PL_STEM_PAIRS = [
    ("studenta", "student"),
    ("studenci", "student"),
    ("książki", "książka"),
    ("książkę", "książka"),
    ("kotami", "kot"),
    ("czytają", "czytać"),
    ("piszę", "pisać"),
    ("mówili", "mówić"),
    ("uniwersytecie", "uniwersytet"),
    ("komputerów", "komputer"),
    ("nowego", "nowy"),
    ("wielkich", "wielki"),
    ("szkołach", "szkoła"),
    ("dzieciom", "dziecko"),
    ("ludzie", "człowiek"),
    ("rąk", "ręka"),
    ("profesorowie", "profesor"),
    ("telefonami", "telefon"),
    ("systemów", "system"),
    ("pracach", "praca"),
    ("drogami", "droga"),
    ("oknie", "okno"),
    ("kobietą", "kobieta"),
    ("miastach", "miasto"),
    ("robiła", "robić"),
    ("xylofon", "xylofon"),
]
_PL_SRC_TOKENS = [s for s, _ in _PL_STEM_PAIRS]

# OpenNLP-analog gate corpus: pinned sentences + the full
# tokenize→POS→chunk→lemmatize chain output (analysis/opennlp.py).
_ONLP_SENTS = [
    "The quick brown fox jumped over the lazy dog.",
    "Dr. Smith went to Washington.",
    "She has written three books and they were published.",
    "Children are playing in the park with their friends.",
    "He quickly ran to the station but the train had left.",
    "The new system processes queries in 3.5 seconds.",
]
_ONLP_GOLDENS = [
    (0, "The", "DT", "B-NP", "the"),
    (0, "quick", "NN", "I-NP", "quick"),
    (0, "brown", "NN", "I-NP", "brown"),
    (0, "fox", "NN", "I-NP", "fox"),
    (0, "jumped", "VBD", "B-VP", "jump"),
    (0, "over", "IN", "B-PP", "over"),
    (0, "the", "DT", "B-NP", "the"),
    (0, "lazy", "NN", "I-NP", "lazy"),
    (0, "dog", "NN", "I-NP", "dog"),
    (0, ".", ".", "O", "."),
    (1, "Dr", "NN", "B-NP", "dr"),
    (1, ".", ".", "O", "."),
    (1, "Smith", "NNP", "B-NP", "smith"),
    (1, "went", "VBD", "B-VP", "go"),
    (1, "to", "TO", "B-PP", "to"),
    (1, "Washington", "NNP", "B-NP", "washington"),
    (1, ".", ".", "O", "."),
    (2, "She", "PRP", "B-NP", "she"),
    (2, "has", "VBZ", "B-VP", "have"),
    (2, "written", "VBN", "I-VP", "write"),
    (2, "three", "NN", "B-NP", "three"),
    (2, "books", "NNS", "I-NP", "book"),
    (2, "and", "CC", "O", "and"),
    (2, "they", "PRP", "B-NP", "they"),
    (2, "were", "VBD", "B-VP", "be"),
    (2, "published", "VBD", "I-VP", "publish"),
    (2, ".", ".", "O", "."),
    (3, "Children", "NN", "B-NP", "children"),
    (3, "are", "VBP", "B-VP", "be"),
    (3, "playing", "VBG", "I-VP", "play"),
    (3, "in", "IN", "B-PP", "in"),
    (3, "the", "DT", "B-NP", "the"),
    (3, "park", "NN", "I-NP", "park"),
    (3, "with", "IN", "B-PP", "with"),
    (3, "their", "PRP$", "B-NP", "their"),
    (3, "friends", "NNS", "I-NP", "friend"),
    (3, ".", ".", "O", "."),
    (4, "He", "PRP", "B-NP", "he"),
    (4, "quickly", "RB", "O", "quickly"),
    (4, "ran", "VBD", "B-VP", "run"),
    (4, "to", "TO", "B-PP", "to"),
    (4, "the", "DT", "B-NP", "the"),
    (4, "station", "NN", "I-NP", "station"),
    (4, "but", "CC", "O", "but"),
    (4, "the", "DT", "B-NP", "the"),
    (4, "train", "NN", "I-NP", "train"),
    (4, "had", "VBD", "B-VP", "have"),
    (4, "left", "VBD", "I-VP", "leave"),
    (4, ".", ".", "O", "."),
    (5, "The", "DT", "B-NP", "the"),
    (5, "new", "NN", "I-NP", "new"),
    (5, "system", "NN", "I-NP", "system"),
    (5, "processes", "NNS", "I-NP", "process"),
    (5, "queries", "NNS", "I-NP", "query"),
    (5, "in", "IN", "B-PP", "in"),
    (5, "3.5", "CD", "B-NP", "3.5"),
    (5, "seconds", "NNS", "I-NP", "second"),
    (5, ".", ".", "O", "."),
]

# Sentence-window chunking gate corpus: pinned multi-sentence texts and
# their detected sentence lists; the oracle rebuilds the overlapping
# windows (w=3, s=2) in pure SQL from the pinned lists.
_CHUNK_TEXTS = [
    "The index was built. It holds many terms. Queries are fast. Results are ranked by score. Users are happy.",
    "Spark reads the table. Partitions are balanced. The shuffle is small.",
    "Dr. Smith wrote the paper. It was published in 2020. Reviewers praised it. The method scales well.",
    "One sentence only.",
    "First things first. Second comes next. Third follows. Fourth arrives. Fifth ends here. Sixth is extra.",
    "Data is loaded. Text is cleaned. Tokens are counted. Stats are saved.",
]
_CHUNK_SENTS = [
    (0, 0, "The index was built."),
    (0, 1, "It holds many terms."),
    (0, 2, "Queries are fast."),
    (0, 3, "Results are ranked by score."),
    (0, 4, "Users are happy."),
    (1, 0, "Spark reads the table."),
    (1, 1, "Partitions are balanced."),
    (1, 2, "The shuffle is small."),
    (2, 0, "Dr. Smith wrote the paper."),
    (2, 1, "It was published in 2020."),
    (2, 2, "Reviewers praised it."),
    (2, 3, "The method scales well."),
    (3, 0, "One sentence only."),
    (4, 0, "First things first."),
    (4, 1, "Second comes next."),
    (4, 2, "Third follows."),
    (4, 3, "Fourth arrives."),
    (4, 4, "Fifth ends here."),
    (4, 5, "Sixth is extra."),
    (5, 0, "Data is loaded."),
    (5, 1, "Text is cleaned."),
    (5, 2, "Tokens are counted."),
    (5, 3, "Stats are saved."),
]

# Morfologik-analog gate corpus: pinned surface forms and ALL their
# dictionary interpretations (ambiguous forms emit multiple rows).
_MORF_WORDS = [
    "mamy", "drogi", "piła", "studenta", "studenci", "książki",
    "miastach", "czytają", "ludzie", "nowego", "polska", "warszawie",
    "lat", "je", "xyzzy", "Mamy",
]
_MORF_GOLDENS = [
    (0, "mamy", "mieć", "verb:fin:pl:pri:imperf"),
    (0, "mamy", "mama", "subst:pl:nom:f+subst:sg:gen:f"),
    (1, "drogi", "droga", "subst:pl:nom:f+subst:sg:gen:f"),
    (1, "drogi", "drogi", "adj:sg:nom:m1"),
    (2, "piła", "pić", "verb:praet:sg:f:imperf"),
    (2, "piła", "piła", "subst:sg:nom:f"),
    (3, "studenta", "student", "subst:sg:gen:m1+subst:sg:acc:m1"),
    (4, "studenci", "student", "subst:pl:nom:m1"),
    (5, "książki", "książka", "subst:pl:nom:f+subst:sg:gen:f"),
    (6, "miastach", "miasto", "subst:pl:loc:n"),
    (7, "czytają", "czytać", "verb:fin:pl:ter:imperf"),
    (8, "ludzie", "człowiek", "subst:pl:nom:m1"),
    (9, "nowego", "nowy", "adj:sg:gen:m1+adj:sg:acc:m1"),
    (10, "polska", "polska", "subst:sg:nom:f"),
    (10, "polska", "polski", "adj:sg:nom:f"),
    (11, "warszawie", "warszawa", "subst:sg:loc:f+subst:sg:dat:f"),
    (12, "lat", "rok", "subst:pl:gen:m3"),
    (12, "lat", "lato", "subst:pl:gen:n"),
    (13, "je", "jeść", "verb:fin:sg:ter:imperf"),
    (13, "je", "on", "ppron3:pl:acc:n"),
    (14, "xyzzy", "xyzzy", ""),
    (15, "Mamy", "mieć", "verb:fin:pl:pri:imperf"),
    (15, "Mamy", "mama", "subst:pl:nom:f+subst:sg:gen:f"),
]

# French gate corpus: pinned sentences + their hand-checked Snowball
# stems (UAX#29 → lowercase → trimmed stop set → FrenchStemmer analog).
# The oracle rebuilds BM25 from the PINNED stem lists, so the whole
# analysis chain is under test, not just the scorer.
_FR_SENTS = [
    "la continuation des activités nationales du gouvernement",
    "les universités nationales développent la recherche scientifique",
    "une conversation naturelle sur la nation et la culture",
    "le développement économique de la nation reste une possibilité",
    "ils travaillent rapidement et heureusement dans la capitale",
    "la recherche scientifique continue naturellement son développement",
    "les institutions internationales soutiennent les nations",
    "une possibilité économique majeure pour les universités",
]
_FR_STEMS = [
    ["continu", "activ", "national", "gouvern"],
    ["univers", "national", "développent", "recherch", "scientif"],
    ["convers", "naturel", "nation", "cultur"],
    ["développ", "économ", "nation", "rest", "possibil"],
    ["travaillent", "rapid", "heureux", "capital"],
    ["recherch", "scientif", "continu", "naturel", "développ"],
    ["institu", "international", "soutiennent", "nation"],
    ["possibil", "économ", "majeur", "univers"],
]

# Snowball battery: hand-derived vectors from the published algorithm
# definitions (region tracing in tests/test_snowball.py)
_SNOWBALL_BATTERY = [
    ("de", "aufeinander", "aufeinand"), ("de", "häuser", "haus"),
    ("de", "katzen", "katz"), ("de", "bücher", "buch"),
    ("de", "größe", "gross"), ("de", "bedeutung", "bedeut"),
    ("de", "arbeiten", "arbeit"), ("de", "möglichkeit", "moglich"),
    ("de", "schönheit", "schonheit"),
    ("es", "caminando", "camin"), ("es", "canciones", "cancion"),
    ("es", "grandes", "grand"), ("es", "rápidamente", "rapid"),
    ("es", "felicidad", "felic"), ("es", "tomándoselo", "tom"),
    ("es", "librería", "libr"), ("es", "trabajando", "trabaj"),
    ("es", "importantes", "import"),
    ("fr", "continuation", "continu"), ("fr", "majestueux", "majestu"),
    ("fr", "possibilités", "possibil"), ("fr", "heureusement", "heureux"),
    ("fr", "nationale", "national"), ("fr", "mangé", "mang"),
    ("fr", "mangeront", "mang"), ("fr", "parlement", "parl"),
    ("fr", "institutions", "institu"),
    ("it", "abbandonata", "abbandon"), ("it", "nazionale", "nazional"),
    ("it", "possibilità", "possibil"), ("it", "velocemente", "veloc"),
    ("it", "mangiare", "mang"), ("it", "cantando", "cant"),
    ("pt", "trabalhando", "trabalh"), ("pt", "nacional", "nacional"),
    ("pt", "possibilidades", "possibil"), ("pt", "rapidamente", "rapid"),
    ("pt", "cantou", "cant"), ("pt", "meninas", "menin"),
    ("pt", "corações", "coraçõ"),
    ("ru", "книгами", "книг"), ("ru", "важный", "важн"),
    ("ru", "делать", "дела"), ("ru", "читала", "чита"),
    ("ru", "последовательность", "последовательн"),
    ("ru", "большие", "больш"), ("ru", "программы", "программ"),
    ("sv", "bilar", "bil"), ("sv", "bilarnas", "bil"),
    ("sv", "flickorna", "flick"), ("sv", "klokaste", "klok"),
    ("sv", "klubben", "klubb"), ("sv", "möjligheterna", "möj"),
    ("sv", "betydelse", "betyd"), ("sv", "skrivandet", "skriv"),
    ("sv", "vackert", "vackert"),
    ("no", "havnedistriktene", "havnedistrikt"), ("no", "bilene", "bil"),
    ("no", "mulighetene", "mul"), ("no", "billig", "bil"),
    ("no", "arbeidet", "arbeid"), ("no", "husets", "hus"),
    ("no", "kastet", "kast"),
    ("da", "undersøgelse", "undersøg"), ("da", "indtagelsen", "indtag"),
    ("da", "dejligst", "dej"), ("da", "bøgerne", "bøg"),
    ("da", "mulighederne", "mulighed"), ("da", "arbejdet", "arbejd"),
    ("da", "venligst", "ven"), ("da", "hurtigt", "hurt"),
    ("nl", "lichamelijk", "licham"), ("nl", "lichamen", "licham"),
    ("nl", "lichaam", "licham"), ("nl", "opheffen", "opheff"),
    ("nl", "opheffing", "opheff"), ("nl", "mogelijkheden", "mogelijk"),
    ("nl", "belangrijke", "belangrijk"), ("nl", "werkende", "werkend"),
    ("nl", "snelheid", "snelheid"),
]

# Light stemmer battery (ArabicStemmer.java light10, HindiStemmer.java
# Ramanathan-Rao, IndonesianStemmer.java Tala): hand-derived vectors
_LIGHT_BATTERY = [
    ("ar", "المدرسة", "مدرس"), ("ar", "والكتاب", "كتاب"),
    ("ar", "كتابها", "كتاب"), ("ar", "المعلمون", "معلم"),
    ("ar", "أستاذ", "استاذ"), ("ar", "مكتبة", "مكتب"),
    ("hi", "लड़की", "लडक"), ("hi", "लड़कियों", "लडक"),
    ("hi", "किताबें", "किताब"), ("hi", "जाएगी", "जाएग"),
    ("hi", "भारतीय", "भारतिय"),
    ("id", "kebijakan", "bijak"), ("id", "menghitung", "hitung"),
    ("id", "memberikan", "beri"), ("id", "diperlukan", "perlu"),
    ("id", "bukunya", "buku"), ("id", "pembangunan", "bangun"),
    ("id", "berjalanlah", "jalan"), ("id", "makanan", "makan"),
    # cz/bg vectors match the reference fixtures
    # (TestCzechStemmer.java / TestBulgarianStemmer.java)
    ("cz", "pánové", "pán"), ("cz", "pánech", "pán"),
    ("cz", "mužích", "muh"), ("cz", "strojů", "stroj"),
    ("cz", "předsedové", "předsd"), ("cz", "hradem", "hrad"),
    ("bg", "градовете", "град"), ("bg", "народите", "народ"),
    ("bg", "пътищата", "път"), ("bg", "дядовците", "дяд"),
    ("bg", "мъжете", "мъж"), ("bg", "краката", "крак"),
    ("fa", "کتابی", "كتابي"), ("fa", "ۀ", "ه"),
    # el vectors match the reference fixtures (TestGreekStemmer.java)
    ("el", "άνθρωπος", "ανθρωπ"), ("el", "ανθρώπων", "ανθρωπ"),
    ("el", "γυναίκα", "γυναικ"), ("el", "γυναικών", "γυναικ"),
    ("el", "παιδιά", "παιδ"), ("el", "παιδιών", "παιδ"),
    ("el", "καθεστώτα", "καθεστ"), ("el", "γεγονότων", "γεγον"),
    # fi: Savoy CLEF-2003 light; lv vectors match TestLatvianStemmer.java
    ("fi", "taloissa", "talo"), ("fi", "kirjoja", "kirjo"),
    ("fi", "presidentti", "president"), ("fi", "opiskelijoiden", "opiskelijo"),
    ("lv", "tēviem", "tēv"), ("lv", "lāčiem", "lāc"),
    ("lv", "akmeņos", "akmen"), ("lv", "kurmjiem", "kurm"),
    # hu: Savoy UniNE light; tr vectors match TestTurkishLowerCaseFilter
    ("hu", "házakat", "haz"), ("hu", "házban", "haz"),
    ("hu", "kocsija", "kocs"), ("hu", "kocsi", "kocs"),
    ("tr", "İSTANBUL", "istanbul"), ("tr", "İZMİR", "izmir"),
    ("tr", "ISPARTA", "ısparta"),
    # ckb vectors match TestSoraniStemFilter.java (stem after
    # normalize, the SoraniAnalyzer chain order); bn vectors match
    # TestBengaliStemmer.java (stem-only, U+09DF precomposed forms)
    ("ckb", "پیاوەکان", "پیاو"),
    ("ckb", "دەرگایەک", "دەرگا"),
    ("ckb", "هۆتیلێکی", "هۆتیل"),
    ("ckb", "نیوەشەودا", "نیوەشەو"),
    ("ckb", "پارەیان", "پارە"),
    ("ckb", "دوورەوە", "دوور"),
    ("bn", "করেছিলাম", "কর"),
    ("bn", "যাইবে", "যা"),
    ("bn", "মেয়েদেরকে", "মে"),
    ("bn", "একটি", "এক"),
    ("bn", "মানুষগুলি", "মানুষ"),
]

# Normalization filter battery (GermanNormalizationFilter.java,
# ScandinavianNormalizer.java, ScandinavianFoldingFilter.java,
# SerbianNormalizationFilter.java, IrishLowerCaseFilter.java,
# ElisionFilter.java): every vector transcribed from the reference's
# own unit tests, so the oracle VALUES table is the reference's truth
_NORMALIZE_BATTERY = [
    ("de_norm", "Schaltflächen", "Schaltflachen"),
    ("de_norm", "Schaltflaechen", "Schaltflachen"),
    ("de_norm", "dauer", "dauer"),
    ("de_norm", "weißbier", "weissbier"),
    ("scn_norm", "blaabaersyltetöj", "blåbærsyltetøj"),
    ("scn_norm", "räksmörgås", "ræksmørgås"),
    ("scn_norm", "raeksmörgaos", "ræksmørgås"),
    ("scn_norm", "raeksmoergås", "ræksmørgås"),
    ("scn_norm", "aeäaeeeae", "æææeeæ"),
    ("scn_norm", "bOEen", "bØen"),
    ("scn_fold", "blaabaarsyltetoej", "blabarsyltetoj"),
    ("scn_fold", "räksmörgås", "raksmorgas"),
    ("scn_fold", "ræksmörgaos", "raksmorgas"),
    ("scn_fold", "aeäaeeeae", "aaaeea"),
    ("scn_fold", "åene", "aene"),
    ("sr_norm", "абвгдђежзијклљмнњопрстћуфхцчџш",
     "abvgddjezzijklljmnnjoprstcufhccdzs"),
    ("sr_norm", "abcčćddžđefghijklljmnnjoprsštuvzž",
     "abcccddzdjefghijklljmnnjoprsstuvzz"),
    ("ga_lower", "nAthair", "n-athair"),
    ("ga_lower", "tUISCE", "t-uisce"),
    ("ga_lower", "hARD", "hard"),
    ("elision_fr", "l'embrouille", "embrouille"),
    ("elision_fr", "qu'avez", "avez"),
    ("elision_fr", "jusqu'ici", "ici"),
    ("elision_fr", "O'brian", "O'brian"),
    ("elision_fr", "M'enfin", "enfin"),
    ("elision_fr", "L’avion", "avion"),
    ("elision_it", "dell'arte", "arte"),
    ("elision_it", "sull'onda", "onda"),
    ("elision_ca", "l'aigua", "aigua"),
    ("elision_ga", "d'athair", "athair"),
]


# RSLP stemmer battery (pt/RSLPStemmerBase.java engine over
# portuguese.rslp + galician.rslp): evenly-spaced samples of the
# reference vocabulary archives (gltestdata.zip ptrslptestdata.zip
# ptminimaltestdata.zip ptlighttestdata.zip — the FULL 105,464-vector
# set was replayed offline with zero mismatches, see tests/test_rslp.py)
_RSLP_BATTERY = [
    ("gl", "a", "a"),
    ("gl", "aluguer", "alugu"),
    ("gl", "augas", "aug"),
    ("gl", "causou", "caus"),
    ("gl", "concorrencia", "concorr"),
    ("gl", "cuncha", "cun"),
    ("gl", "despreocuparse", "despreocupars"),
    ("gl", "emprazado", "empraz"),
    ("gl", "estraño", "estrañ"),
    ("gl", "formiga", "formig"),
    ("gl", "incapaces", "incapaz"),
    ("gl", "levarse", "levars"),
    ("gl", "modiño", "mod"),
    ("gl", "orgánico", "org"),
    ("gl", "plans", "pl"),
    ("gl", "pronunciamentos", "pronunciament"),
    ("gl", "regulamentismo", "regulamentism"),
    ("gl", "saínte", "sai"),
    ("gl", "superlativamente", "superlativ"),
    ("gl", "universais", "univers"),
    ("gl_minimal", "elefantes", "elefante"),
    ("gl_minimal", "kalóres", "kalór"),
    ("gl_minimal", "mas", "mas"),
    ("gl_minimal", "barcelonês", "barcelonês"),
    ("gl_minimal", "bons", "bon"),
    ("gl_minimal", "pires", "pires"),
    ("pt_rslp", "a", "a"),
    ("pt_rslp", "analfabetismo", "analfabet"),
    ("pt_rslp", "autor", "autor"),
    ("pt_rslp", "camargo", "camarg"),
    ("pt_rslp", "colocasse", "coloc"),
    ("pt_rslp", "costureiras", "costur"),
    ("pt_rslp", "desmitificação", "desmitific"),
    ("pt_rslp", "emídio", "emidi"),
    ("pt_rslp", "estrelas", "estrel"),
    ("pt_rslp", "fortune", "fortun"),
    ("pt_rslp", "honolulu", "honolulu"),
    ("pt_rslp", "iph", "iph"),
    ("pt_rslp", "macarronada", "macarron"),
    ("pt_rslp", "mordomias", "mordom"),
    ("pt_rslp", "pág", "pag"),
    ("pt_rslp", "posar", "pos"),
    ("pt_rslp", "readaptou", "readapt"),
    ("pt_rslp", "rudolph", "rudolph"),
    ("pt_rslp", "subornavam", "suborn"),
    ("pt_rslp", "tremenda", "tremend"),
    ("pt_minimal", "a", "a"),
    ("pt_minimal", "analfabetismo", "analfabetismo"),
    ("pt_minimal", "autor", "autor"),
    ("pt_minimal", "camargo", "camargo"),
    ("pt_minimal", "colocasse", "colocasse"),
    ("pt_minimal", "costureiras", "costureira"),
    ("pt_minimal", "desmitificação", "desmitificação"),
    ("pt_minimal", "emídio", "emídio"),
    ("pt_minimal", "estrelas", "estrela"),
    ("pt_minimal", "fortune", "fortune"),
    ("pt_minimal", "honolulu", "honolulu"),
    ("pt_minimal", "iph", "iph"),
    ("pt_minimal", "macarronada", "macarronada"),
    ("pt_minimal", "mordomias", "mordomia"),
    ("pt_minimal", "pág", "pág"),
    ("pt_minimal", "posar", "posar"),
    ("pt_minimal", "readaptou", "readaptou"),
    ("pt_minimal", "rudolph", "rudolph"),
    ("pt_minimal", "subornavam", "subornavam"),
    ("pt_minimal", "tremenda", "tremenda"),
    ("pt_light", "a", "a"),
    ("pt_light", "analfabetismo", "analfabetism"),
    ("pt_light", "autor", "autor"),
    ("pt_light", "camargo", "camarg"),
    ("pt_light", "colocasse", "colocass"),
    ("pt_light", "costureiras", "costureir"),
    ("pt_light", "desmitificação", "desmitificaca"),
    ("pt_light", "emídio", "emidi"),
    ("pt_light", "estrelas", "estrel"),
    ("pt_light", "fortune", "fortun"),
    ("pt_light", "honolulu", "honolulu"),
    ("pt_light", "iph", "iph"),
    ("pt_light", "macarronada", "macarronad"),
    ("pt_light", "mordomias", "mordomi"),
    ("pt_light", "pág", "pág"),
    ("pt_light", "posar", "posar"),
    ("pt_light", "readaptou", "readaptou"),
    ("pt_light", "rudolph", "rudolph"),
    ("pt_light", "subornavam", "subornavam"),
    ("pt_light", "tremenda", "tremend"),
]


# UniNE light/minimal stemmer battery (GermanLightStemmer.java,
# SpanishPluralStemmer.java, FrenchLightStemmer.java, etc.):
# evenly-spaced samples of the 9 reference vocabulary archives
# (293,793 vectors replayed offline with zero mismatches, see
# tests/test_unine.py) plus hand vectors for the archive-less kinds
_UNINE_BATTERY = [
    ("de_light", "a", "a"),
    ("de_light", "aussteigen", "aussteig"),
    ("de_light", "cogitare", "cogitar"),
    ("de_light", "erledigung", "erledigung"),
    ("de_light", "gemachter", "gemacht"),
    ("de_light", "herrenhaus", "herrenhaus"),
    ("de_light", "kontradiktorisch", "kontradiktorisch"),
    ("de_light", "mutlos", "mutlos"),
    ("de_light", "rodeten", "rodet"),
    ("de_light", "spreemetropole", "spreemetropol"),
    ("de_light", "ungleichartiger", "ungleichartig"),
    ("de_light", "wächter", "wacht"),
    ("de_minimal", "a", "a"),
    ("de_minimal", "aussteigen", "aussteig"),
    ("de_minimal", "cogitare", "cogitar"),
    ("de_minimal", "erledigung", "erledigung"),
    ("de_minimal", "gemachter", "gemacht"),
    ("de_minimal", "herrenhaus", "herrenhau"),
    ("de_minimal", "kontradiktorisch", "kontradiktorisch"),
    ("de_minimal", "mutlos", "mutlo"),
    ("de_minimal", "rodeten", "rodet"),
    ("de_minimal", "spreemetropole", "spreemetropol"),
    ("de_minimal", "ungleichartiger", "ungleichartig"),
    ("de_minimal", "wächter", "wacht"),
    ("es_light", "a", "a"),
    ("es_light", "arrojó", "arroj"),
    ("es_light", "cavazos", "cavaz"),
    ("es_light", "cortoplazo", "cortoplaz"),
    ("es_light", "domiciliarias", "domiciliari"),
    ("es_light", "facturación", "facturacion"),
    ("es_light", "implanté", "implant"),
    ("es_light", "logrará", "lograr"),
    ("es_light", "obstinación", "obstinacion"),
    ("es_light", "prescriben", "prescriben"),
    ("es_light", "retratarse", "retratars"),
    ("es_light", "tarjetahabientes", "tarjetahabient"),
    ("es_plural", "abuelos", "abuelo"),
    ("es_plural", "apoyasen", "apoyasen"),
    ("es_plural", "caracter", "caracter"),
    ("es_plural", "controlarse", "controlarse"),
    ("es_plural", "disertara", "disertara"),
    ("es_plural", "explicando", "explicando"),
    ("es_plural", "ibarra", "ibarra"),
    ("es_plural", "llamo", "llamo"),
    ("es_plural", "nunciatura", "nunciatura"),
    ("es_plural", "prehispanico", "prehispanico"),
    ("es_plural", "retinitis", "retiniti"),
    ("es_plural", "tarado", "tarado"),
    ("fr_light", "a", "a"),
    ("fr_light", "attribuera", "atribuera"),
    ("fr_light", "cherchais", "cherchai"),
    ("fr_light", "décachetées", "decachet"),
    ("fr_light", "el", "el"),
    ("fr_light", "fermiers", "fermi"),
    ("fr_light", "impuissants", "impui"),
    ("fr_light", "marchande", "marchand"),
    ("fr_light", "pamphlets", "pamphlet"),
    ("fr_light", "promenant", "promenant"),
    ("fr_light", "réuni", "reuni"),
    ("fr_light", "surveillait", "surveilait"),
    ("fr_minimal", "a", "a"),
    ("fr_minimal", "attribuera", "attribuera"),
    ("fr_minimal", "cherchais", "cherchai"),
    ("fr_minimal", "décachetées", "décachet"),
    ("fr_minimal", "el", "el"),
    ("fr_minimal", "fermiers", "fermi"),
    ("fr_minimal", "impuissants", "impuissant"),
    ("fr_minimal", "marchande", "marchand"),
    ("fr_minimal", "pamphlets", "pamphlet"),
    ("fr_minimal", "promenant", "promenant"),
    ("fr_minimal", "réuni", "réuni"),
    ("fr_minimal", "surveillait", "surveillait"),
    ("it_light", "a", "a"),
    ("it_light", "asterràdal", "asterradal"),
    ("it_light", "cellulare", "cellular"),
    ("it_light", "cuicchi", "cuicc"),
    ("it_light", "etampes", "etampes"),
    ("it_light", "ieltsin", "ieltsin"),
    ("it_light", "lettera", "letter"),
    ("it_light", "nulla", "nulla"),
    ("it_light", "preoccupati", "preoccupat"),
    ("it_light", "rimettermi", "rimetterm"),
    ("it_light", "sfarzosi", "sfarzos"),
    ("it_light", "tema", "tema"),
    ("ru_light", "а", "а"),
    ("ru_light", "возглаголят", "возглаголят"),
    ("ru_light", "дерет", "дерет"),
    ("ru_light", "захотите", "захотит"),
    ("ru_light", "лакейщину", "лакейщин"),
    ("ru_light", "начинкой", "начинк"),
    ("ru_light", "осилил", "осилил"),
    ("ru_light", "подписывались", "подписывалис"),
    ("ru_light", "примеров", "пример"),
    ("ru_light", "решением", "решен"),
    ("ru_light", "сошлются", "сошлютс"),
    ("ru_light", "узаконенной", "узаконен"),
    ("sv_light", "a", "a"),
    ("sv_light", "bloddroppe", "bloddropp"),
    ("sv_light", "erkänner", "erkänn"),
    ("sv_light", "förord", "förord"),
    ("sv_light", "holm", "holm"),
    ("sv_light", "klädd", "klädd"),
    ("sv_light", "låt", "låt"),
    ("sv_light", "olycklige", "olycklig"),
    ("sv_light", "rydbergs", "rydberg"),
    ("sv_light", "snusige", "snusig"),
    ("sv_light", "till", "till"),
    ("sv_light", "vagga", "vagg"),
    ("sv_minimal", "bilar", "bil"),
    ("sv_minimal", "bilarna", "bil"),
    ("sv_minimal", "bilens", "bil"),
    ("sv_minimal", "jakten", "jakt"),
    ("es_minimal", "casas", "casa"),
    ("es_minimal", "voces", "voz"),
    ("es_minimal", "reses", "res"),
    ("es_minimal", "libros", "libro"),
    ("no_light", "bilens", "bil"),
    ("no_light", "hemmeligheten", "hemmelig"),
    ("no_light", "hemmeligheter", "hemmelig"),
    ("no_light", "kristendom", "kristen"),
    ("no_minimal", "bilene", "bil"),
    ("no_minimal", "huset", "hus"),
    ("no_minimal", "kaker", "kak"),
    ("no_minimal", "jenta", "jent"),
]


# Brazilian stemmer battery (br/BrazilianStemmer.java:25):
# every 3rd checkOneTerm vector from TestBrazilianAnalyzer.java
# (the full 84-row set is pinned in tests/test_br.py)
_BR_BATTERY = [
    ("boa", "boa"),
    ("bôas", "boas"),
    ("boate", "boat"),
    ("bob", "bob"),
    ("bobagens", "bobagens"),
    ("bobeira", "bobeir"),
    ("bobo", "bob"),
    ("bocadas", "boc"),
    ("bocaiúva", "bocaiuv"),
    ("bocas", "boc"),
    ("body", "body"),
    ("boemia", "boem"),
    ("boi", "boi"),
    ("quiabo", "quiab"),
    ("quieto", "quiet"),
    ("quilates", "quilat"),
    ("quilombo", "quilomb"),
    ("quilômetro", "quilometr"),
    ("quimica", "quimic"),
    ("quimicas", "quimic"),
    ("quimioterapia", "quimioterap"),
    ("quinhão", "quinha"),
    ("quino", "quin"),
    ("quintana", "quintan"),
    ("quintessência", "quintessente"),
    ("quintos", "quint"),
    ("quinzena", "quinzen"),
    ("Brasília", "brasil"),
]


# MinHashFilter battery (analysis/minhash/MinHashFilter.java:48):
# pinned shingle sets; expected hex signatures pinned from the
# implementation whose murmur/token emission reproduces every
# TestMinHashFilter vector (tests/test_minhash.py)
_MINHASH_DOCS = [
    ('d1', ['woof woof woof woof woof', 'woof woof woof woof puff']),
    ('d2', ['the quick brown fox jumps', 'quick brown fox jumps over', 'brown fox jumps over the', 'fox jumps over the lazy', 'jumps over the lazy dog']),
    ('d3', ['a b c d e']),
    ('d4', ['lorem ipsum dolor sit amet', 'ipsum dolor sit amet consectetur']),
]
_MINHASH_EXPECT = [
    ('d1', '0:2101d33dfa858059219da1c1d671676f'),
    ('d1', '0:8dfbf7e1a805de0bcc3c85b7e24ea53e'),
    ('d1', '0:8dfbf7e1a805de0bcc3c85b7e24ea53e'),
    ('d1', '0:2101d33dfa858059219da1c1d671676f'),
    ('d1', '1:41f7e3349a703a4e1981437c2909d182'),
    ('d1', '1:41f7e3349a703a4e1981437c2909d182'),
    ('d1', '1:aef207d847f09800c420277234e70f51'),
    ('d1', '1:41f7e3349a703a4e1981437c2909d182'),
    ('d1', '2:5bc6fbcadda3bf4924e6589789ce8843'),
    ('d1', '2:5bc6fbcadda3bf4924e6589789ce8843'),
    ('d1', '2:c8c1206e8b241cfbcf853c8d95abc612'),
    ('d1', '2:c8c1206e8b241cfbcf853c8d95abc612'),
    ('d2', '0:2baccf1bcf79ad671412dd287c180ec4'),
    ('d2', '0:46d05a403baf34f4964db0667bace8eb'),
    ('d2', '0:ba54ded769c6c3c6629d1671a97e1638'),
    ('d2', '0:2baccf1bcf79ad671412dd287c180ec4'),
    ('d2', '1:4ca2df126f64675c0bf67ee2ceb078d7'),
    ('d2', '1:4ca2df126f64675c0bf67ee2ceb078d7'),
    ('d2', '1:db4aeece09b17dbb5a80b82bfc16804b'),
    ('d2', '1:db4aeece09b17dbb5a80b82bfc16804b'),
    ('d2', '2:6671f7a8b297ec57175b93fe2f752f98'),
    ('d2', '2:6671f7a8b297ec57175b93fe2f752f98'),
    ('d2', '2:819582cd1ecd73e49996673c2f0a09bf'),
    ('d2', '2:f51a07644ce502b665e5cd475cdb370c'),
    ('d3', '0:caebae162c8d02ecb3426b8e18ba20ae'),
    ('d3', '0:caebae162c8d02ecb3426b8e18ba20ae'),
    ('d3', '0:caebae162c8d02ecb3426b8e18ba20ae'),
    ('d3', '0:caebae162c8d02ecb3426b8e18ba20ae'),
    ('d3', '1:ebe1be0ccc77bce1ab260d486b528ac1'),
    ('d3', '1:ebe1be0ccc77bce1ab260d486b528ac1'),
    ('d3', '1:ebe1be0ccc77bce1ab260d486b528ac1'),
    ('d3', '1:ebe1be0ccc77bce1ab260d486b528ac1'),
    ('d3', '2:05b0d6a30fab41dcb68b2263cc174182'),
    ('d3', '2:05b0d6a30fab41dcb68b2263cc174182'),
    ('d3', '2:05b0d6a30fab41dcb68b2263cc174182'),
    ('d3', '2:05b0d6a30fab41dcb68b2263cc174182'),
    ('d4', '0:92a406e4b663eb4db7ffbbdc38258f0a'),
    ('d4', '0:92a406e4b663eb4db7ffbbdc38258f0a'),
    ('d4', '0:92a406e4b663eb4db7ffbbdc38258f0a'),
    ('d4', '0:92a406e4b663eb4db7ffbbdc38258f0a'),
    ('d4', '1:b39a16db564ea542afe35d968abdf91d'),
    ('d4', '1:b39a16db564ea542afe35d968abdf91d'),
    ('d4', '1:b39a16db564ea542afe35d968abdf91d'),
    ('d4', '1:c8333b6d3c5cdd84d4d281c03de31c44'),
    ('d4', '2:cd692f7199822a3dbb4872b1eb82afde'),
    ('d4', '2:cd692f7199822a3dbb4872b1eb82afde'),
    ('d4', '2:cd692f7199822a3dbb4872b1eb82afde'),
    ('d4', '2:cd692f7199822a3dbb4872b1eb82afde'),
]


# Misc token-filter battery (KeepWordFilter, PatternReplaceFilter,
# PatternCaptureGroupTokenFilter, CapitalizationFilter,
# HyphenatedWordsFilter, TruncateTokenFilter, LimitTokenCountFilter,
# DelimitedTermFrequencyTokenFilter, StemmerOverrideFilter):
# expected outputs pinned from the implementation whose unit tests
# reproduce the reference vectors (tests/test_miscfilters.py)
_MISCF_BATTERY = [
    ('hyph', 'ecologi- cal develop- ment and done', 'ecological development and done'),
    ('hyph', 'abcd- ef geh 12345678-', 'abcdef geh 12345678-'),
    ('capture', 'fooBarBaz', 'Bar Baz'),
    ('capture', 'plainlower', 'plainlower'),
    ('capture', 'CamelCaseWord', 'Camel Case Word'),
    ('capture_pre', 'fooBarBaz', 'fooBarBaz Bar Baz'),
    ('capture_pre', 'Single', 'Single'),
    ('cap_first', 'kiTTEN', 'Kitten'),
    ('cap_first', 'and', 'And'),
    ('cap_first', 'AnD', 'And'),
    ('cap_first', 'BIG', 'BIG'),
    ('cap_first', 'Hello thEre my Name is Ryan', 'Hello there my name is ryan'),
    ('cap_all', 'big and small', 'Big and Small'),
    ('cap_all', 'hello world', 'Hello World'),
    ('patrep', 'fooaabar', 'foo-b-r'),
    ('patrep', 'aaa', '-'),
    ('patrep', 'none', 'none'),
    ('trunc4', 'abcdefg', 'abcd'),
    ('trunc4', 'abc', 'abc'),
    ('limit2', 'a b c d', 'a b'),
    ('limit2', 'one', 'one'),
    ('keepw', 'the quick fox jumps over the dog', 'fox dog'),
    ('keepw', 'no match here', ''),
    ('dtf', 'term|3', 'term:3'),
    ('dtf', 'plain', 'plain:1'),
    ('dtf', 'x|17', 'x:17'),
    ('override', 'mice', 'mouse'),
    ('override', 'feet', 'foot'),
    ('override', 'cats', 'cats'),
    ('hyph2', 'comprehensive-hands-on and ecologi- cal', 'comprehensive-hands-on and ecological'),
]


# Phonetic codec battery (PhoneticFilterFactory.java:65 registry:
# refinedSoundex, caverphone2, nysiis): reference TestPhoneticFilter
# vectors + published spec examples, rest pinned from the verified
# implementation (tests/test_phonetic_codecs.py)
_PHON_BATTERY = [
    ('refined', 'Darda', 'D60960'),
    ('caver2', 'Darda', 'TTA1111111'),
    ('nysiis', 'Darda', 'DARD'),
    ('refined', 'Karleen', 'K309708'),
    ('caver2', 'Karleen', 'KLN1111111'),
    ('nysiis', 'Karleen', 'CARLAN'),
    ('refined', 'Datha', 'D6060'),
    ('caver2', 'Datha', 'TTA1111111'),
    ('nysiis', 'Datha', 'DAT'),
    ('refined', 'Carlene', 'C3097080'),
    ('caver2', 'Carlene', 'KLN1111111'),
    ('nysiis', 'Carlene', 'CARLAN'),
    ('refined', 'Stevenson', 'S360208308'),
    ('caver2', 'Stevenson', 'STFNSN1111'),
    ('nysiis', 'Stevenson', 'STAFAN'),
    ('refined', 'Peter', 'P10609'),
    ('caver2', 'Peter', 'PTA1111111'),
    ('nysiis', 'Peter', 'PATAR'),
    ('refined', 'Thompson', 'T6081308'),
    ('caver2', 'Thompson', 'TMPSN11111'),
    ('nysiis', 'Thompson', 'TANPSA'),
    ('refined', 'aaa', 'A0'),
    ('caver2', 'aaa', 'AA11111111'),
    ('nysiis', 'aaa', 'A'),
    ('refined', 'bbb', 'B1'),
    ('caver2', 'bbb', 'P111111111'),
    ('nysiis', 'bbb', 'B'),
    ('refined', 'ccc', 'C3'),
    ('caver2', 'ccc', 'K111111111'),
    ('nysiis', 'ccc', 'C'),
    ('refined', 'easgasg', 'E034034'),
    ('caver2', 'easgasg', 'ASKSK11111'),
    ('nysiis', 'easgasg', 'EASGAS'),
    ('refined', 'MACINTOSH', 'M803086030'),
    ('caver2', 'MACINTOSH', 'MSNTS11111'),
    ('nysiis', 'MACINTOSH', 'MCANT'),
    ('refined', 'KNUTH', 'K38060'),
    ('caver2', 'KNUTH', 'KNT1111111'),
    ('nysiis', 'KNUTH', 'NAT'),
    ('refined', 'PHILLIPSON', 'P10701308'),
    ('caver2', 'PHILLIPSON', 'FLPSN11111'),
    ('nysiis', 'PHILLIPSON', 'FALAPS'),
    ('refined', 'robert', 'R901096'),
    ('caver2', 'robert', 'RPT1111111'),
    ('nysiis', 'robert', 'RABAD'),
    ('refined', 'rupert', 'R901096'),
    ('caver2', 'rupert', 'RPT1111111'),
    ('nysiis', 'rupert', 'RAPAD'),
    ('refined', 'smith', 'S38060'),
    ('caver2', 'smith', 'SMT1111111'),
    ('nysiis', 'smith', 'SNAT'),
    ('refined', 'smyth', 'S38060'),
    ('caver2', 'smyth', 'SMT1111111'),
    ('nysiis', 'smyth', 'SNYT'),
    ('refined', 'catherine', 'C30609080'),
    ('caver2', 'catherine', 'KTRN111111'),
    ('nysiis', 'catherine', 'CATARA'),
    ('refined', 'kathryn', 'K3060908'),
    ('caver2', 'kathryn', 'KTRN111111'),
    ('nysiis', 'kathryn', 'CATRYN'),
]


# Double Metaphone battery (DoubleMetaphoneFilter.java:29):
# reference filter vectors + the published algorithm's canonical
# examples (tests/test_doublemetaphone.py)
_DM_BATTERY = [
    ('international', 'ANTR', 'ANTR'),
    ('Kuczewski', 'KSSK', 'KXFS'),
    ('hello', 'HL', 'HL'),
    ('easgasg', 'ASKS', 'ASKS'),
    ('testing', 'TSTN', 'TSTN'),
    ('The', '0', 'T'),
    ('quick', 'KK', 'KK'),
    ('brown', 'PRN', 'PRN'),
    ('fox', 'FKS', 'FKS'),
    ('jumped', 'JMPT', 'AMPT'),
    ('over', 'AFR', 'AFR'),
    ('lazy', 'LS', 'LS'),
    ('dogs', 'TKS', 'TKS'),
    ('jose', 'HS', 'HS'),
    ('smith', 'SM0', 'XMT'),
    ('schmidt', 'XMT', 'SMT'),
    ('snider', 'SNTR', 'XNTR'),
    ('school', 'SKL', 'SKL'),
    ('ghislane', 'JLN', 'JLN'),
    ('caesar', 'SSR', 'SSR'),
    ('chianti', 'KNT', 'KNT'),
    ('michael', 'MKL', 'MXL'),
    ('thomas', 'TMS', 'TMS'),
    ('knox', 'NKS', 'NKS'),
    ('accident', 'AKST', 'AKST'),
    ('Xavier', 'SF', 'SFR'),
    ('Wright', 'RT', 'RT'),
]

# Japanese morphological segmentation goldens: hand-pinned expected
# token sequences (normal mode) for the kuromoji-analog Viterbi
# tokenizer; sentences mirror the reference TestJapaneseTokenizer
# basic-segmentation fixtures (JapaneseTokenizer.java:61)
_JA_GOLDEN = [
    ("これは本ではない", ["これ", "は", "本", "で", "は", "ない"]),
    ("関西国際空港に行った", ["関西", "国際", "空港", "に", "行っ", "た"]),
    ("数学部長谷川", ["数学", "部長", "谷川"]),
    ("成田空港、米原油流出", ["成田空港", "米", "原油", "流出"]),
    ("お寿司が食べたい。", ["お", "寿司", "が", "食べ", "たい"]),
    (
        "麻薬の密売は根こそぎ絶やさなければならない",
        ["麻薬", "の", "密売", "は", "根こそぎ", "絶やさ", "なけれ", "ば", "なら", "ない"],
    ),
    ("シニアソフトウェアエンジニア", ["シニアソフトウェアエンジニア"]),
    ("日本の検索エンジンを開発した", ["日本", "の", "検索", "エンジン", "を", "開発", "し", "た"]),
    ("東京で経済学部長と会社の仕事をする", ["東京", "で", "経済", "学", "部長", "と", "会社", "の", "仕事", "を", "する"]),
    ("大学院の研究は形態素解析の評価実験", ["大学院", "の", "研究", "は", "形態素", "解析", "の", "評価", "実験"]),
]

_KO_GOLDEN = [
    ("삼성전자는 한국 기업이다", ["삼성", "전자", "는", "한국", "기업", "이", "다"]),
    ("서울대학교에 갔다", ["서울", "대학교", "에", "갔", "다"]),
    ("검색엔진을 개발했다", ["검색", "엔진", "을", "개발", "했", "다"]),
    ("데이터시스템 성능 평가", ["데이터", "시스템", "성능", "평가"]),
    ("AI 기술은 세계를 바꾼다", ["AI", "기술", "은", "세계", "를", "바꾼", "다"]),
    (
        "선생님께서는 책을 읽었다",
        ["선생", "님", "께서", "는", "책", "을", "읽", "었", "다"],
    ),
    ("형태소분석 결과입니다", ["형태소", "분석", "결과", "입니다"]),
]

_ZH_GOLDEN = [
    ("我购买了道具和服装。", ["我", "购买", "了", "道具", "和", "服装"]),
    ("我是中国人", ["我", "是", "中国人"]),
    ("北京大学的学生在图书馆学习", ["北京大学", "的", "学生", "在", "图书馆", "学习"]),
    ("今天天气很好", ["今天", "天气", "很好"]),
    ("中文分词是自然语言处理的基础", ["中文", "分词", "是", "自然语言", "处理", "的", "基础"]),
    ("他们在上海的公司开发搜索引擎", ["他们", "在", "上海", "的", "公司", "开发", "搜索引擎"]),
    ("我们明天去北京大学", ["我们", "明天", "去", "北京大学"]),
    ("我有2台iPhone手机", ["我", "有", "2", "台", "iphone", "手机"]),
]

# Hunspell gate dictionary (original, NOT a reference fixture): -s/-ed/
# -ing suffixes with e-elision variants, un- prefix cross-producting
_HUNSPELL_AFF = """SET UTF-8

SFX S Y 1
SFX S 0 s [^s]

SFX D Y 2
SFX D 0 ed [^e]
SFX D e ed e

SFX G Y 2
SFX G 0 ing [^e]
SFX G e ing e

PFX U Y 1
PFX U 0 un .
"""
_HUNSPELL_DIC = """5
walk/SDG
bake/SDG
jump/SD
tie/SD
lock/SDGU
"""
# (word, first-stem-or-self) — hand-derived through the affix rules
_HUNSPELL_BATTERY = [
    ("walk", "walk"), ("walks", "walk"), ("walked", "walk"),
    ("walking", "walk"),
    ("bake", "bake"), ("bakes", "bake"), ("baked", "bake"),
    ("baking", "bake"),
    ("jumped", "jump"), ("jumping", "jumping"),  # no G flag on jump
    ("ties", "tie"), ("tied", "tie"),
    ("unlocked", "lock"), ("unlocking", "lock"), ("unlocks", "lock"),
    ("untied", "untied"),  # tie has no U flag: cross product blocked
    ("zzz", "zzz"),
]

# Thai segmentation goldens (tokenizer output, pre-stop, pre-lowercase
# folding happens only in analyze mode); sentences mirror the
# reference's TestThaiAnalyzer fixtures (ThaiTokenizer.java:36)
_TH_GOLDEN = [
    ("การที่ได้ต้องแสดงว่างานดี",
     ["การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี"]),
    ("ประเทศไทยมีภาษาไทย", ["ประเทศ", "ไทย", "มี", "ภาษา", "ไทย"]),
    ("ฉันกินข้าวที่บ้าน", ["ฉัน", "กิน", "ข้าว", "ที่", "บ้าน"]),
    ("เด็กนักเรียนไปโรงเรียน", ["เด็ก", "นักเรียน", "ไป", "โรงเรียน"]),
    ("การที่ได้ต้องthe แสดงว่างานดี",
     ["การ", "ที่", "ได้", "ต้อง", "the", "แสดง", "ว่า", "งาน", "ดี"]),
]

_NORM_BYTE_CASE = (
    "CASE WHEN dl < 24 THEN dl WHEN (dl - 24) < 8 THEN dl "
    "ELSE 24 + (((dl - 24) >> (length(bin(dl - 24)) - 4)) % 8) "
    "+ ((length(bin(dl - 24)) - 3) << 3) END"
)


# The driver evaluates (at most) the FIRST ~50 queries() entries per
# round. Order the registry so everything without fully-green driver
# evidence comes first: positions 1-4 are the four gates the round-2
# verdict flagged (three oracle-typing hash-reds, now CAST-fixed, plus
# search_after whose r2 fix was never re-run), then every round-3
# addition, then a representative spread of already-green families.
_DRIVER_PRIORITY = [
    # the 11 gates that have never fit a driver window (r4 verdict item #2) —
    # they MUST land in CORRECTNESS_r05, so they go first
    "common_terms_topk", "sweetspot_topk", "multi_range", "term_automaton",
    "top_passages", "shape_polygon_relations", "segments_info",
    "bm25_nb_classifier", "word_break", "commit_point_search",
    "phrase_wildcard",
    # round-5 additions
    "ja_morph_tokens", "ko_morph_tokens", "zh_smart_tokens", "snowball_stems",
    "french_term_topk",
    "fvh_snippet", "dup_span_coverage", "flexible_parse_match",
    "fuzzy_like_this", "merge_on_flush_topk", "geo3d_nearest",
    "id_version_updates", "knn_factory_topk", "lm_perplexity",
    "dsir_resample", "dv_multi_range", "point_nearest",
    # round-5 continuation-session additions (driver-evidence after the verdict-directive gates)
    "all_group_heads", "distinct_values_group", "range_group_topk",
    "block_grouping_top", "group_facets",
    "string_value_facets", "long_value_facets", "range_on_range_facets",
    "block_join_sort", "named_matches", "match_positions",
    "suggest_exact_first", "paragraph_dedup", "span_payload_check",
    "function_range_match", "indri_dirichlet_topk", "multi_sim_topk",
    "dfr_gb2_topk", "ib_spl_topk", "dfi_std_topk", "inet_queries", "bigint_range",
    "axiomatic_f1exp_topk", "axiomatic_f1log_topk", "axiomatic_f2log_topk",
    "axiomatic_f3exp_topk", "axiomatic_f3log_topk",
    "dfr_ifh3_topk", "dfi_sat_topk", "sort_rescore", "ppl_buckets", "index_overview",
    "dfr_ineb1_topk", "ib_splz_topk", "temperature_mix", "keyword_repeat_terms", "sweetspot_hyperbolic_topk", "large_num_hits", "bp_vector_reorder_topk",
    # round-5 late-session additions
    "html_strip_text", "boilerplate_extract", "light_stems", "thai_tokens",
    "warc_roundtrip", "decompound_terms", "path_prefix_facets",
    "hunspell_stems", "normalize_terms", "rslp_stems",
    "unine_stems", "facet_set_counts", "brazilian_stems",
    "date_range_day_facets", "date_range_relations", "min_hash_signatures",
    "misc_filter_terms", "quality_eval", "phonetic_codecs",
    "double_metaphone_codes",
    # round-5 final-session additions
    "heatmap_facets", "sorted_early_topk", "embedding_ivfpq_topk",
    "perceptron_classify", "knn_fuzzy_classifier", "shape_grid_query",
    "bbox_overlap_topk", "semdedup_keep", "context_suggest",
    "sorted_range_docs", "collation_range", "cyrillic_translit",
    "polish_stem_terms", "opennlp_pos_chunks", "sentence_chunks",
    "morfologik_lemmas", "histogram_facets", "span_payloads_collect",
    "bp_merge_reorder_topk", "rearrange_stats", "time_limited_topk",
    "upgrade_roundtrip", "compression_ratio", "domain_cap_docs",
    # round-5 closing-session additions
    "auto_stop_topk", "term_ord_seek", "delimited_boost_topk", "wiki_tokens",
    "simpletext_roundtrip", "direct_postings_topk", "bpe_pieces",
    "ext_parse_match", "ts2a_match", "wiki_plain_text", "te_ro_terms",
    "blended_term_stats_topk", "late_interaction_topk",
    "sorted_numeric_selector_topk", "seeded_knn_topk", "indri_and_topk",
    "multi_collector_stats", "concat_graph_paths", "synonym_rules",
    "inet_range_counts", "multi_reader_topk", "parallel_fields_topk",
    "string_distances", "spell_checker_topk", "luke_doc_view",
    # round-4 late-session additions
    "high_freq_terms", "doc_values_stats", "diversified_topk",
    "dynamic_range_facets", "memory_index_scores", "query_profile",
    "bp_reorder_topk", "multi_pass_split_stats", "replica_search",
    "repeated_ngrams", "dup_span_starts",
    "intervals_before", "intervals_not_containing", "word_delimiter_terms",
    "common_grams_top", "leading_wildcard_topk",
    # round-4 additions (never driver-run — must land in the window)
    "span_or_near", "span_containing", "range_field_overlap",
    "function_score_topk", "boost_by_query", "search_after_sorted",
    "suggest_fuzzy", "embedding_hnsw_quantized_topk",
    "blended_infix", "shape_box_relations", "icu_folding",
    "pii_redact", "pii_count_audit", "embedding_ivf_quantized_topk",
    "association_facet", "block_join_score_modes",
    "distance_feature_recency", "distance_feature_geo", "distance_boosted",
    "vector_similarity", "diversifying_knn", "dv_update_score",
    "repetition_signals", "phonetic_match", "soundex_terms",
    "long_range_facets", "js_expression_topk", "js_expression_rescore",
    "c4_filters", "sampled_facets", "nb_classifier", "knn_classifier",
    "join_util_score_modes", "contamination_check",
    # prior rounds' evidence spread
    "reader_stats", "delete_reclaim_stats", "collection_stats",
    "search_after",
    # round-3 additions
    "prefix_semijoin_topk", "classic_term_topk", "lmdirichlet_topk",
    "boolean_sim_topk", "lmjm_topk",
    "geo_polygon", "simple_parse_match", "sloppy_parse_match",
    "payload_avg_score", "soft_deletes_search", "bm25f_weighted",
    "block_join_children", "dfr_topk", "axiomatic_topk",
    "dfi_topk", "ib_ll_topk",
    "uax29_tokens", "uax29_url_email", "surround_near_match",
    "cjk_bigram_terms", "embedding_hnsw_topk", "freetext_suggest",
    "complex_phrase_match", "xml_parse_match", "span_not_match", "span_position_range",
    # representative green spread (r01/r02 evidence exists; re-affirm)
    "search_with_deletes", "term_topk_after_reclaim",
    "porter_stem_tokens", "english_term_topk",
    "fuzzy_transpositions", "span_near_ordered",
    "filtered_knn", "regexp_query", "ngram_phrase",
    "intervals_maxgaps", "geo_box", "shingle_top",
    "rescore_phrase", "facet_taxonomy_children", "index_sorted_topk",
    "best_passage", "covering_query", "trending_terms",
    "collapse_top_per_lang", "query_count",
    "hash_sample", "pack_sequences", "fuzzy_blended_topk",
    "docs_only_topk", "dedup_clusters", "simhash_near_dups",
    "embedding_cosine_topk", "embedding_ivf_topk", "embedding_near_dups",
    "lang_id", "token_counts", "rolling_fingerprint",
    "term_topk", "bool_should_topk", "bool_must", "phrase_bm25",
    "synonym_query", "dismax_query", "classic_parse_match",
    "monitor_percolate", "combined_field", "term_stats",
]


def _driver_order(out: dict) -> dict:
    ordered = {k: out[k] for k in _DRIVER_PRIORITY if k in out}
    for k, v in out.items():
        ordered.setdefault(k, v)
    return ordered


# ---------------------------------------------------------------------------
# the contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: float32-exact BM25 block-max WAND top-k on sf0.001."""
    idx = InvertedIndex.build(
        _docs(spark, "/root/testdata/sf0.001"), analyzer="simple", docs_per_segment=256
    )
    q = BooleanQuery.of(
        BooleanClause(BoostQuery(TermQuery("spark"), 2.0), Occur.SHOULD),
        BooleanClause(TermQuery("join"), Occur.SHOULD),
        BooleanClause(TermQuery("vector"), Occur.SHOULD),
    )
    return IndexSearcher(idx).search(q, k=10, mode="wand")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}

    # --- BM25 boolean retrieval (engine postings + float64 parity math)
    for name, params in _BM25_QUERIES.items():
        out[name] = (
            lambda spark, sf, p=dict(params): bm25_topk_f64(_index(spark, sf), **p)
        )

    # --- constant-score multi-term queries (term-dictionary expansion)
    out["prefix_query"] = lambda spark, sf: _const_score_docs(spark, sf, PrefixQuery("s"))
    out["wildcard_query"] = lambda spark, sf: _const_score_docs(spark, sf, WildcardQuery("j*n"))
    out["fuzzy_query"] = lambda spark, sf: _const_score_docs(spark, sf, FuzzyQuery("quer", 1))
    # transposition semantics: "jion"~1 reaches "join" only under
    # Damerau-Levenshtein (plain Levenshtein distance is 2)
    out["fuzzy_transpositions"] = lambda spark, sf: _const_score_docs(
        spark, sf, FuzzyQuery("jion", 1)
    )
    out["term_in_set"] = lambda spark, sf: _const_score_docs(
        spark, sf, TermInSetQuery(("spark", "flink", "duck"))
    )
    # --- above-cap multi-term query: DISTRIBUTED constant-score route.
    # Every 3rd doc gains 9 unique "id{doc}x{j}" tokens, so
    # PrefixQuery("id") matches ~3*n_docs dictionary terms — above the
    # 1024 maxClauseCount at sf>=0.01 — and must rewrite to the
    # semi-join MultiTermFilterDocsQuery (asserted), never a collected
    # term list (`search/MultiTermQuery.java:39-103`).
    def _wide_index(spark, sf):
        if ("wide", sf) not in _INDEX_CACHE:
            extra = F.concat_ws(
                " ",
                *[
                    F.concat(F.lit("id"), F.col("doc_id"), F.lit(f"x{j}"))
                    for j in range(9)
                ],
            )
            corpus = _docs(spark, sf).withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 3 == 0, F.concat_ws(" ", "text", extra)
                ).otherwise(F.col("text")),
            )
            _INDEX_CACHE[("wide", sf)] = InvertedIndex.build(
                corpus, analyzer="simple", docs_per_segment=2048
            )
        return _INDEX_CACHE[("wide", sf)]

    def prefix_semijoin_topk(spark, sf):
        idx = _wide_index(spark, sf)
        searcher = IndexSearcher(idx)
        rw = rewrite(PrefixQuery("id"), idx.terms)
        assert isinstance(rw.query, MultiTermFilterDocsQuery), (
            "expected the distributed above-cap route at this scale"
        )
        ctx = searcher._bind(rw)
        return (
            searcher._matching_docs(rw, ctx)
            .distinct()
            .select("doc_id", F.lit(1.0).alias("score"))
            .orderBy("doc_id")
            .limit(2000)
        )

    out["prefix_semijoin_topk"] = prefix_semijoin_topk

    # --- UAX#29 StandardTokenizer chain over an adversarial template
    # (emoji modifier sequence, Thai run, Han per-char, Hebrew
    # gershayim, MidNumLet, ExtendNumLet, stopword position increment);
    # the oracle enumerates the expected (term, pos) stream per doc.
    def uax29_tokens(spark, sf):
        from lucene_spark.analysis import standard_analyzer_udf

        base = _docs(spark, sf).select("doc_id").orderBy("doc_id").limit(50)
        text = F.concat(
            F.lit("The Quick can't 3.14 doc"),
            F.col("doc_id"),
            F.lit(' มาก 東京 👍🏽 מנכ"ל x_1'),
        )
        toks = base.select(
            "doc_id", standard_analyzer_udf()(text).alias("toks")
        ).select("doc_id", F.explode("toks").alias("t"))
        return toks.select(
            "doc_id", F.col("t.term").alias("term"), F.col("t.pos").alias("pos")
        ).orderBy("doc_id", "pos")

    out["uax29_tokens"] = uax29_tokens

    # --- UAX29URLEmailTokenizer analog: URLs/emails stay single tokens
    def uax29_url_email(spark, sf):
        from lucene_spark.analysis import url_email_tokenizer_udf

        _tok = url_email_tokenizer_udf()
        base = _docs(spark, sf).select("doc_id").orderBy("doc_id").limit(50)
        text = F.concat(
            F.lit("visit https://site"),
            F.col("doc_id"),
            F.lit(".example.com/p?q="),
            F.col("doc_id"),
            F.lit(" or mail user"),
            F.col("doc_id"),
            F.lit("@host"),
            F.col("doc_id"),
            F.lit(".org now"),
        )
        return (
            base.select("doc_id", F.posexplode(_tok(text)).alias("pos", "term"))
            .select("doc_id", "term", "pos")
            .orderBy("doc_id", "pos")
        )

    out["uax29_url_email"] = uax29_url_email

    # --- CJKAnalyzer (width fold → UAX#29 → CJK bigrams → stop):
    # deterministically map the ASCII corpus onto Han codepoints, build
    # with the CJK chain, and rank bigram terms by docFreq. The same
    # translate() runs in the oracle, whose substr pairs mirror the
    # bigram filter over space-separated runs.
    def cjk_bigram_terms(spark, sf):
        from lucene_spark.analysis.cjk import cjk_analyze

        han = "".join(chr(0x4E00 + i) for i in range(26))
        docs = _docs(spark, sf).withColumn(
            "text", F.translate("text", "abcdefghijklmnopqrstuvwxyz", han)
        )
        idx = InvertedIndex.build(
            docs, analyzer=cjk_analyze, docs_per_segment=2048
        )
        return (
            idx.terms.select("term", F.col("doc_freq").cast("long").alias("doc_freq"))
            .orderBy(F.col("doc_freq").desc(), F.col("term").asc())
            .limit(20)
        )

    out["cjk_bigram_terms"] = cjk_bigram_terms

    # FreeTextSuggester: stupid-backoff bigram+unigram completion of
    # the partial last token ("hash s…"); oracle mirrors the backoff
    def freetext_suggest_gate(spark, sf):
        from lucene_spark.search.suggest import (
            build_freetext_model,
            freetext_suggest,
        )

        model = build_freetext_model(_docs(spark, sf), n=2)
        return freetext_suggest(model, "hash s", k=10)

    out["freetext_suggest"] = freetext_suggest_gate

    # ComplexPhraseQueryParser: wildcard slot inside a quoted phrase
    # rewrites to SpanNear(SpanOr(expanded), 'join'), ordered slop 0
    def complex_phrase_match(spark, sf):
        from lucene_spark.search.complexphrase import complex_phrase_docs

        return (
            complex_phrase_docs(_index(spark, sf), "ha* join")
            .select("doc_id", F.lit(1.0).alias("score"))
            .orderBy("doc_id")
            .limit(200)
        )

    out["complex_phrase_match"] = complex_phrase_match

    # SpanNotQuery: ordered "hash join" spans with no 'fast' within
    # one token before/after the span window
    def span_not_match(spark, sf):
        from lucene_spark.search.spans import span_not_docs

        return (
            span_not_docs(
                _index(spark, sf), [["hash"], ["join"]], ["fast"], pre=1, post=1
            )
            .select("doc_id", F.lit(1.0).alias("score"))
            .orderBy("doc_id")
            .limit(200)
        )

    out["span_not_match"] = span_not_match

    # SpanPositionRangeQuery: 'join' occurrences within positions [3, 10)
    def span_position_range(spark, sf):
        from lucene_spark.search.spans import span_position_range_docs

        return (
            span_position_range_docs(_index(spark, sf), "join", 3, 10)
            .select("doc_id", F.lit(1.0).alias("score"))
            .orderBy("doc_id")
            .limit(300)
        )

    out["span_position_range"] = span_position_range

    # --- pluggable similarities: same index, swapped scoring formula
    for _gate, _sim_f in _SIMILARITY_GATES.items():
        out[_gate] = (
            lambda spark, sf, _s=_sim_f: similarity_topk_f64(
                _index(spark, sf), _SIM_TERMS, _s(), k=20
            )
        )

    # FuzzyLikeThisQuery: fuzzify the (absent) source terms against the
    # term dictionary, best-n variants by sim^2 * source-idf, unit-df
    # scoring (sandbox/queries/FuzzyLikeThisQuery.java:55)
    def fuzzy_like_this(spark, sf):
        from lucene_spark.search.fuzzylikethis import fuzzy_like_this_topk

        return fuzzy_like_this_topk(
            _index(spark, sf),
            ["merg", "jon"],
            k=20,
            max_edits=1,
            prefix_length=1,
            max_num_terms=10,
        )

    out["fuzzy_like_this"] = fuzzy_like_this

    out["term_range"] = lambda spark, sf: _const_score_docs(
        spark, sf, TermRangeQuery("query", "sort")
    )

    # --- phrase (positional match on space-normalized text)
    out["phrase_query"] = lambda spark, sf: (
        _docs(spark, sf)
        .filter(F.concat(F.lit(" "), F.col("text"), F.lit(" ")).like("% hash join %"))
        .select("doc_id", F.lit(1.0).alias("score"))
        .orderBy("doc_id")
        .limit(100)
    )
    # index-backed positional phrase, BM25-scored (ExactPhraseMatcher)
    out["phrase_bm25"] = lambda spark, sf: phrase_bm25_f64(
        _index(spark, sf), ["hash", "join"], k=20
    )
    out["phrase_bm25_tri"] = lambda spark, sf: phrase_bm25_f64(
        _index(spark, sf), ["slow", "hash", "batch"], k=15
    )
    # SynonymQuery: one pseudo-term (df=max, freq=sum)
    out["synonym_query"] = lambda spark, sf: synonym_bm25_f64(
        _index(spark, sf), ["hash", "merge"], k=20
    )
    # DisjunctionMaxQuery with tie-breaker
    out["dismax_query"] = lambda spark, sf: dismax_f64(
        _index(spark, sf), {"hash": 1.0, "join": 2.0, "scan": 1.5}, tie=0.3, k=20
    )
    # searchAfter paging (page 2 of a disjunction)
    out["search_after"] = lambda spark, sf: search_after_f64(
        _index(spark, sf), {"spark": 1.0, "query": 1.0}, k=15
    )

    # MoreLikeThis (queries/mlt): top-5 tf*idf terms of a seed doc →
    # BM25 disjunction (term selection driver-side, like MLT's query build)
    def more_like_this(spark, sf, seed_doc=7, n_terms=5, k=20):
        idx = _index(spark, sf)
        seed_tf = (
            _docs(spark, sf)
            .filter(F.col("doc_id") == seed_doc)
            .select(F.explode(F.split("text", " ")).alias("term"))
            .filter(F.col("term") != "")
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        n = idx.doc_count
        scored = seed_tf.join(idx.terms.select("term", "doc_freq"), "term").select(
            "term",
            (
                F.col("tf")
                * F.log(
                    F.lit(1.0)
                    + (F.lit(float(n)) - F.col("doc_freq") + 0.5) / (F.col("doc_freq") + 0.5)
                )
            ).alias("tfidf"),
        )
        top = scored.orderBy(F.col("tfidf").desc(), F.col("term").asc()).limit(n_terms).collect()
        terms = {r["term"]: 1.0 for r in top}
        return bm25_topk_f64(idx, terms, k=k)

    out["more_like_this"] = more_like_this

    # classic QueryParser syntax end-to-end (constant-score match set)
    def classic_parse_match(spark, sf):
        from lucene_spark.search import parse_query

        return _const_score_docs(
            spark, sf, parse_query("(hash OR sort) AND join -scan"), k=100
        )

    out["classic_parse_match"] = classic_parse_match

    # Flexible (StandardQueryParser) dialect: AND default operator +
    # the syntax extras the flexible pipeline adds over classic —
    # regexp /../ and a half-open range {lo TO hi]
    # (flexible/standard/StandardQueryParser.java:92)
    def flexible_parse_match(spark, sf):
        from lucene_spark.search import StandardQueryParser

        q = StandardQueryParser(default_operator="AND").parse(
            "sort /jo.n/ {hash TO join]"
        )
        return _const_score_docs(spark, sf, q, k=100)

    out["flexible_parse_match"] = flexible_parse_match

    # XML CoreParser dialect end-to-end: same semantics as
    # classic_parse_match, expressed as a query-DSL tree
    def xml_parse_match(spark, sf):
        from lucene_spark.search.xmlparser import xml_parse

        q = xml_parse(
            """
<BooleanQuery>
  <Clause occurs="must">
    <BooleanQuery>
      <Clause occurs="should"><TermQuery>hash</TermQuery></Clause>
      <Clause occurs="should"><TermQuery>sort</TermQuery></Clause>
    </BooleanQuery>
  </Clause>
  <Clause occurs="must"><TermQuery>join</TermQuery></Clause>
  <Clause occurs="mustNot"><TermQuery>scan</TermQuery></Clause>
</BooleanQuery>"""
        )
        return _const_score_docs(spark, sf, q, k=100)

    out["xml_parse_match"] = xml_parse_match

    # hyphenated words are ONE term token (QueryParser.jj _TERM_CHAR),
    # analyzed into a SHOULD group — not hash AND NOT join
    def hyphen_term_query(spark, sf):
        from lucene_spark.search import parse_query

        return _const_score_docs(spark, sf, parse_query("hash-join"), k=100)

    out["hyphen_term_query"] = hyphen_term_query

    # --- queryparser dialects end-to-end (simple / classic-sloppy /
    # surround), all through rewrite + IndexSearcher._matching_docs
    def simple_parse_match(spark, sf):
        from lucene_spark.search import simple_parse

        # (phrase OR prefix) AND (wrapped -scan): exercises the lenient
        # state machine's op-change wrap + negation-as-subquery
        return _const_score_docs(
            spark, sf, simple_parse('"hash join" | merg* + -scan'), k=100
        )

    out["simple_parse_match"] = simple_parse_match

    def sloppy_parse_match(spark, sf):
        from lucene_spark.search import parse_query

        return _const_score_docs(spark, sf, parse_query('"hash join"~2'), k=150)

    out["sloppy_parse_match"] = sloppy_parse_match

    def surround_near_match(spark, sf):
        from lucene_spark.search import surround_parse

        # 2W → SpanNear(slop=1, ordered) per DistanceQuery.java:96
        return _const_score_docs(spark, sf, surround_parse("hash 2w join"), k=150)

    out["surround_near_match"] = surround_near_match

    # --- span queries (queries/spans: SpanNear ordered/unordered, SpanFirst)
    def _span_gate(fn_docs):
        return (
            fn_docs.select("doc_id", F.lit(1.0).alias("score"))
            .orderBy("doc_id")
            .limit(200)
        )

    def span_near_ordered(spark, sf):
        from lucene_spark.search.spans import span_near_docs

        return _span_gate(
            span_near_docs(_index(spark, sf), ["hash", "join"], slop=2, in_order=True)
        )

    def span_near_unordered(spark, sf):
        from lucene_spark.search.spans import span_near_docs

        return _span_gate(
            span_near_docs(_index(spark, sf), ["join", "hash"], slop=1, in_order=False)
        )

    def span_first(spark, sf):
        from lucene_spark.search.spans import span_first_docs

        return _span_gate(span_first_docs(_index(spark, sf), "spark", end=3))

    out["span_near_ordered"] = span_near_ordered
    out["span_near_unordered"] = span_near_unordered
    out["span_first"] = span_first

    # --- filtered KNN (KnnFloatVectorQuery with a filter clause)
    def filtered_knn(spark, sf):
        from lucene_spark.search.knn import knn_filtered_topk

        return knn_filtered_topk(
            _index(spark, sf),
            _emb(spark, sf),
            _qvec(spark, sf),
            BooleanQuery.of(
                BooleanClause(TermQuery("vector"), Occur.MUST),
                BooleanClause(TermQuery("slow"), Occur.MUST_NOT),
            ),
            k=15,
        )

    out["filtered_knn"] = filtered_knn

    # --- RegexpQuery with Lucene RegExp syntax (anchored, @ operator)
    out["regexp_query"] = lambda spark, sf: _const_score_docs(
        spark, sf, __import__("lucene_spark.search.query", fromlist=["RegexpQuery"]).RegexpQuery("(ha|jo)..")
    )

    # --- NGramPhraseQuery over a 3-gram field (substring search)
    def _gram_index(spark, sf):
        if ("gram", sf) not in _INDEX_CACHE:
            t = F.translate(F.col("text"), " ", "_")
            gram_text = F.when(
                F.length(t) >= 3,
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(1), F.length(t) - 2),
                        lambda i: t.substr(i, F.lit(3)),
                    ),
                    " ",
                ),
            ).otherwise(F.lit(""))
            grams = _docs(spark, sf).select("doc_id", gram_text.alias("text"))
            _INDEX_CACHE[("gram", sf)] = InvertedIndex.build(
                grams, analyzer="simple", docs_per_segment=2048, positions=True
            )
        return _INDEX_CACHE[("gram", sf)]

    def ngram_phrase(spark, sf):
        from lucene_spark.search.positional import ngram_phrase_docs

        word = "vector"
        grams = [word[i : i + 3] for i in range(len(word) - 2)]
        return (
            ngram_phrase_docs(_gram_index(spark, sf), grams, n=3)
            .select("doc_id", F.lit(1.0).alias("score"))
            .orderBy("doc_id")
            .limit(500)
        )

    out["ngram_phrase"] = ngram_phrase

    # --- spellcheck (suggest/spell DirectSpellChecker)
    def spellcheck(spark, sf):
        from lucene_spark.search.spellcheck import suggest_corrections

        return suggest_corrections(_index(spark, sf), "quary", max_edits=2, num_suggestions=5)

    out["spellcheck"] = spellcheck

    # --- minimal-interval queries (queries/intervals)
    def intervals_maxgaps(spark, sf):
        from lucene_spark.search import intervals as I

        src = I.max_gaps(2, I.unordered(I.term("sort"), I.term("scan")))
        return (
            I.interval_matches(_index(spark, sf), src)
            .select("doc_id", F.lit(1.0).alias("score"))
            .orderBy("doc_id")
            .limit(300)
        )

    # containing() filters MINIMAL intervals only — a doc where every
    # tight hash..join interval misses 'merge' must NOT match even if a
    # wider (non-minimal) hash..join window would contain it
    def intervals_containing(spark, sf):
        from lucene_spark.search import intervals as I

        src = I.containing(
            I.ordered(I.term("hash"), I.term("join")), I.term("merge")
        )
        return (
            I.interval_matches(_index(spark, sf), src)
            .select("doc_id", F.lit(1.0).alias("score"))
            .orderBy("doc_id")
            .limit(300)
        )

    out["intervals_maxgaps"] = intervals_maxgaps
    out["intervals_containing"] = intervals_containing

    def intervals_before(spark, sf):
        from lucene_spark.search import intervals as I

        src = I.before(
            I.ordered(I.term("hash"), I.term("join")), I.term("merge")
        )
        return (
            I.interval_matches(_index(spark, sf), src)
            .select("doc_id", F.lit(1.0).alias("score"))
            .orderBy("doc_id")
            .limit(300)
        )

    def intervals_not_containing(spark, sf):
        from lucene_spark.search import intervals as I

        src = I.not_containing(
            I.ordered(I.term("hash"), I.term("join")), I.term("merge")
        )
        return (
            I.interval_matches(_index(spark, sf), src)
            .select("doc_id", F.lit(1.0).alias("score"))
            .orderBy("doc_id")
            .limit(300)
        )

    out["intervals_before"] = intervals_before
    out["intervals_not_containing"] = intervals_not_containing

    # --- geo queries (LatLonPoint analog; document/LatLonPoint.java):
    # deterministic synthetic points derived from doc_id so the DuckDB
    # oracle computes bit-identical coordinates
    def _geo_points(spark, sf):
        return _docs(spark, sf).select(
            "doc_id",
            (((F.col("doc_id") * 7919) % 18000) / 100.0 - 90.0).alias("lat"),
            (((F.col("doc_id") * 104729) % 36000) / 100.0 - 180.0).alias("lon"),
        )

    def geo_box(spark, sf):
        from lucene_spark.search.geo import box_query

        return (
            box_query(_geo_points(spark, sf), 10.0, 45.0, -30.0, 60.0)
            .select(
                "doc_id",
                F.round("lat", 2).alias("lat"),
                F.round("lon", 2).alias("lon"),
            )
            .orderBy("doc_id")
            .limit(400)
        )

    def geo_distance(spark, sf):
        from lucene_spark.search.geo import distance_query, haversine_meters

        pts = distance_query(_geo_points(spark, sf), 48.8566, 2.3522, 2_000_000.0)
        d = haversine_meters(
            F.col("lat"), F.col("lon"), F.lit(48.8566), F.lit(2.3522)
        )
        return (
            pts.select("doc_id", F.round(d, 2).alias("dist_m"))
            .orderBy("doc_id")
            .limit(500)
        )

    def geo_nearest(spark, sf):
        from lucene_spark.search.geo import nearest_k

        return nearest_k(_geo_points(spark, sf), -33.8688, 151.2093, k=20)

    def geo_polygon(spark, sf):
        from lucene_spark.search.geo import polygon_query

        return (
            polygon_query(_geo_points(spark, sf), _POLYGON)
            .select(
                "doc_id",
                F.round("lat", 2).alias("lat"),
                F.round("lon", 2).alias("lon"),
            )
            .orderBy("doc_id")
            .limit(400)
        )

    out["geo_polygon"] = geo_polygon

    out["geo_box"] = geo_box
    out["geo_distance"] = geo_distance
    out["geo_nearest"] = geo_nearest

    # geo3d: ellipsoid-exact (Vincenty/WGS84) nearest-k — spatial3d's
    # PlanetModel.surfaceDistance vs the 2D haversine path
    # (spatial3d/Geo3DPoint.java:48, geom/PlanetModel.java:469)
    def geo3d_nearest_gate(spark, sf):
        from lucene_spark.search.geo3d import WGS84, geo3d_nearest

        return geo3d_nearest(
            _geo_points(spark, sf), -33.8688, 151.2093, k=20, planet=WGS84
        )

    out["geo3d_nearest"] = geo3d_nearest_gate

    # SortedNumericDocValuesMultiRangeQuery: multi-VALUED numeric field
    # vs a set of ranges, one codegen'd exists() — no explode
    def dv_multi_range(spark, sf):
        from lucene_spark.search.rangefield import dv_multi_range_match

        vals = F.array(
            F.col("doc_id") % 97,
            (F.col("doc_id") * 7) % 89,
            (F.col("doc_id") * 13) % 83,
        )
        d = _docs(spark, sf).select("doc_id", vals.alias("vals"))
        return (
            dv_multi_range_match(d, "vals", [(5, 10), (40, 45), (80, 82)])
            .select("doc_id", F.lit(1.0).alias("score"))
            .orderBy("doc_id")
            .limit(400)
        )

    out["dv_multi_range"] = dv_multi_range

    # FloatPointNearestNeighbor: k nearest in 2-D point space
    def point_nearest_gate(spark, sf):
        from lucene_spark.search.rangefield import point_nearest

        return point_nearest(
            _geo_points(spark, sf), ["lat", "lon"], [75.0, 120.0], k=20
        )

    out["point_nearest"] = point_nearest_gate

    # --- analysis filters (analysis/common): shingles + edge n-grams
    # as whole-stage-codegen'd column expansions in the scan stage
    def shingle_top(spark, sf):
        from lucene_spark.analysis.filters import shingles, whitespace_tokens

        return (
            _docs(spark, sf)
            .select(
                F.explode(shingles(whitespace_tokens(F.col("text")))).alias("shingle")
            )
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("shingle").asc())
            .limit(20)
        )

    def edge_ngram_terms(spark, sf):
        from lucene_spark.analysis.filters import edge_ngrams, whitespace_tokens

        terms = (
            _docs(spark, sf)
            .select(F.explode(whitespace_tokens(F.col("text"))).alias("term"))
            .distinct()
        )
        return (
            terms.select(
                F.explode(edge_ngrams(F.array(F.col("term")), 2, 4)).alias("gram")
            )
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("nterms"))
            .orderBy("gram")
            .limit(500)
        )

    out["shingle_top"] = shingle_top
    out["edge_ngram_terms"] = edge_ngram_terms

    # --- two-phase retrieval: QueryRescorer + FeatureField signals
    def rescore_phrase(spark, sf):
        from lucene_spark.search.rescore import rescore_phrase_topk

        return rescore_phrase_topk(
            _index(spark, sf),
            {"hash": 1.0, "join": 1.0},
            ["hash", "join"],
            window=40,
            weight=2.0,
            k=15,
        )

    def feature_saturation(spark, sf):
        from lucene_spark.search.rescore import feature_bm25_topk, saturation

        return feature_bm25_topk(
            _index(spark, sf),
            {"merge": 1.0, "sort": 1.0},
            _docs(spark, sf).select("doc_id", "n_chars"),
            saturation(F.col("n_chars"), 500.0),
            weight=0.5,
            k=20,
        )

    out["rescore_phrase"] = rescore_phrase
    out["feature_saturation"] = feature_saturation

    # --- taxonomy facets (hierarchical dimension lang/source)
    def facet_taxonomy_children(spark, sf):
        from lucene_spark.search.facets import taxonomy_children

        d = _docs(spark, sf).withColumn(
            "cat", F.concat_ws("/", F.col("lang"), F.col("source"))
        )
        root = taxonomy_children(d, "cat").withColumn("path", F.lit(""))
        under_en = taxonomy_children(d, "cat", ("en",)).withColumn(
            "path", F.lit("en")
        )
        return root.unionByName(under_en).select("path", "child", "cnt")

    out["facet_taxonomy_children"] = facet_taxonomy_children

    # --- index sorting (IndexWriterConfig.setIndexSort): docIDs are
    # (n_chars desc, orig asc) ranks, so sort-field top-k is ORDER BY
    # doc_id LIMIT k — early termination, no field sort at query time
    def index_sorted_topk(spark, sf):
        from lucene_spark.index.sorting import sort_docs

        if ("sorted", sf) not in _INDEX_CACHE:
            srt = sort_docs(
                _docs(spark, sf),
                [F.col("n_chars").desc(), F.col("orig_doc_id").asc()],
                num_partitions=16,
            ).persist()
            idx = InvertedIndex.build(srt, analyzer="simple", docs_per_segment=4096)
            _INDEX_CACHE[("sorted", sf)] = (srt, idx)
        srt, idx = _INDEX_CACHE[("sorted", sf)]
        return (
            _decode_postings(idx, ["hash"])
            .select("doc_id")
            .distinct()
            .orderBy("doc_id")
            .limit(10)
            .join(srt.select("doc_id", "orig_doc_id", "n_chars"), "doc_id")
            .select(F.col("orig_doc_id").alias("doc_id"), "n_chars")
            .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        )

    out["index_sorted_topk"] = index_sorted_topk

    # --- UnifiedHighlighter analog: best idf-weighted passage per doc
    def best_passage(spark, sf):
        from lucene_spark.search.highlight import best_passages

        return (
            best_passages(_docs(spark, sf), ["hash", "join"], window=8, quantize=6)
            .orderBy(F.col("passage_score").desc(), F.col("doc_id").asc())
            .limit(25)
        )

    out["best_passage"] = best_passage

    # --- FastVectorHighlighter analog: passages from the index's
    # stored positional postings, no re-analysis of text
    # (vectorhighlight/FastVectorHighlighter.java:41)
    def fvh_snippet(spark, sf):
        from lucene_spark.search.highlight import fvh_best_passages

        return (
            fvh_best_passages(
                _index(spark, sf),
                _docs(spark, sf),
                ["merge", "sort"],
                window=8,
                quantize=6,
            )
            .orderBy(F.col("passage_score").desc(), F.col("doc_id").asc())
            .limit(25)
        )

    out["fvh_snippet"] = fvh_snippet

    # --- CoveringQuery: per-doc minimumNumberMatch from a value source
    def covering_query(spark, sf):
        from lucene_spark.search.covering import covering_matches

        th = _docs(spark, sf).select(
            "doc_id",
            F.when(F.col("lang") == "en", F.lit(2)).otherwise(F.lit(3)).alias("min_match"),
        )
        return (
            covering_matches(_index(spark, sf), ["hash", "join", "merge"], th)
            .orderBy("doc_id")
            .limit(300)
        )

    out["covering_query"] = covering_query

    # --- trending terms per event-time window (stream-safe agg +
    # per-trigger rank); deterministic synthetic ts from doc_id
    def trending_terms_gate(spark, sf):
        from lucene_spark.streaming.windows import (
            top_terms_per_window,
            trending_terms,
        )

        d = _docs(spark, sf).withColumn(
            "ts", F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id") * 60)
        )
        ranked = top_terms_per_window(trending_terms(d, "ts", "text", "1 hour"), 3)
        return (
            ranked.select(
                F.unix_timestamp("win_start").alias("win_epoch"), "term", "cnt"
            )
            .orderBy("win_epoch", "term")
            .limit(1000)
        )

    out["trending_terms"] = trending_terms_gate

    # --- field collapsing: best hit per lang inside one top-k
    def collapse_top_per_lang(spark, sf):
        from lucene_spark.search.collapse import collapse_topk

        return collapse_topk(
            _index(spark, sf),
            {"hash": 1.0, "join": 1.0},
            _docs(spark, sf),
            "lang",
            k=10,
        ).withColumnRenamed("group", "grp")

    out["collapse_top_per_lang"] = collapse_top_per_lang

    # --- IndexSearcher.count: docFreq/numDocs shortcuts + match-set counts
    def query_count(spark, sf):
        from lucene_spark.search import MatchAllDocsQuery, parse_query

        s = IndexSearcher(_index(spark, sf))
        rows = [
            ("match_all", s.count(MatchAllDocsQuery())),
            ("term_hash", s.count(TermQuery("hash"))),
            ("hash_and_join", s.count(parse_query("hash AND join"))),
            ("hash_or_join", s.count(parse_query("hash OR join"))),
            ("hash_not_join", s.count(parse_query("hash -join"))),
        ]
        return spark.createDataFrame(rows, "query string, cnt long")

    out["query_count"] = query_count

    # --- deterministic sampling / data mixing / sequence packing
    def hash_sample_docs(spark, sf):
        from lucene_spark.pipeline.sampling import hash_sample

        return (
            hash_sample(_docs(spark, sf), 0.25, seed=7)
            .select("doc_id")
            .orderBy("doc_id")
            .limit(3000)
        )

    def stratified_sample_docs(spark, sf):
        from lucene_spark.pipeline.sampling import stratified_sample

        return (
            stratified_sample(
                _docs(spark, sf), {"en": 0.5, "de": 0.1}, strata_col="lang", seed=3
            )
            .select("doc_id", "lang")
            .orderBy("doc_id")
            .limit(3000)
        )

    def pack_sequences_shards(spark, sf):
        from lucene_spark.pipeline.sampling import pack_sequences

        d = _docs(spark, sf).withColumn(
            "n_tokens",
            F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != "")),
        )
        return (
            pack_sequences(d, 50_000, "n_tokens", "doc_id", num_partitions=16)
            .select("doc_id", "shard")
            .orderBy("doc_id")
            .limit(10000)
        )

    # FuzzyQuery's real scoring default: top-terms expansion with
    # blended (max) docFreq, summed BM25
    out["fuzzy_blended_topk"] = lambda spark, sf: blended_fuzzy_f64(
        _index(spark, sf), "quer", max_edits=1, k=20
    )

    # IndexReader/Terms stats surface (Terms.java: size/getSumDocFreq/
    # getSumTotalTermFreq + reader maxDoc): aggs over the term dictionary
    def reader_stats(spark, sf):
        idx = _index(spark, sf)
        agg = idx.terms.agg(
            F.count(F.lit(1)).alias("unique_terms"),
            F.sum("doc_freq").alias("sum_doc_freq"),
        ).collect()[0]
        return spark.createDataFrame(
            [
                (
                    int(idx.doc_count),
                    int(idx.sum_total_term_freq),
                    int(agg["unique_terms"]),
                    int(agg["sum_doc_freq"]),
                )
            ],
            "max_doc long, sum_ttf long, unique_terms long, sum_doc_freq long",
        )

    out["reader_stats"] = reader_stats

    # IndexOptions.DOCS: freq clamps to 1, dl = unique-term count,
    # sumTotalTermFreq == sumDocFreq — keyword/id-field scoring
    def docs_only_topk(spark, sf):
        if ("docs_only", sf) not in _INDEX_CACHE:
            _INDEX_CACHE[("docs_only", sf)] = InvertedIndex.build(
                _docs(spark, sf),
                analyzer="simple",
                docs_per_segment=4096,
                index_options="docs",
            )
        return bm25_topk_f64(
            _INDEX_CACHE[("docs_only", sf)], {"hash": 1.0, "join": 1.0}, k=20
        )

    out["docs_only_topk"] = docs_only_topk

    out["hash_sample"] = hash_sample_docs
    out["stratified_sample"] = stratified_sample_docs
    out["pack_sequences"] = pack_sequences_shards

    # --- AnalyzingInfixSuggester: fragment-anywhere, weight-ordered
    def suggest_infix(spark, sf):
        from lucene_spark.search.suggest import infix_suggest

        return infix_suggest(_index(spark, sf), "ar", n=10)

    out["suggest_infix"] = suggest_infix

    # monitor module analog: reverse search (which saved query fires per doc)
    def monitor_percolate(spark, sf):
        from lucene_spark.search import parse_query
        from lucene_spark.streaming.monitor import match_monitor_queries

        qs = [
            ("alert_hash_join", parse_query("hash AND join")),
            ("alert_merge_not_sort", parse_query("merge -sort")),
            ("alert_spark", parse_query("spark")),
        ]
        return match_monitor_queries(_docs(spark, sf), qs).orderBy("doc_id", "query_id")

    out["monitor_percolate"] = monitor_percolate

    # CombinedFieldQuery (BM25F): text + keyword pseudo-field
    def combined_field(spark, sf):
        from lucene_spark.search.parity import combined_field_f64

        return combined_field_f64(
            _index(spark, sf), _docs(spark, sf), "src1", w_text=1.0, w_kw=2.0, k=25
        )

    out["combined_field"] = combined_field

    # BM25F with non-uniform field weights tilted toward the keyword
    # field (CombinedFieldQuery per-field weight surface,
    # `search/CombinedFieldQuery.java:139-150` Builder.addField(w))
    def bm25f_weighted(spark, sf):
        from lucene_spark.search.parity import combined_field_f64

        return combined_field_f64(
            _index(spark, sf), _docs(spark, sf), "src2", w_text=0.75, w_kw=3.0, k=25
        )

    out["bm25f_weighted"] = bm25f_weighted
    # and a term that lives in the text field (kw side contributes 0)
    out["combined_field_text"] = lambda spark, sf: __import__(
        "lucene_spark.search.parity", fromlist=["combined_field_f64"]
    ).combined_field_f64(
        _index(spark, sf), _docs(spark, sf), "hash", w_text=1.0, w_kw=2.0, k=25
    )

    # FieldExistsQuery analog: docs with a non-empty text field
    out["field_exists"] = lambda spark, sf: (
        _docs(spark, sf)
        .filter((F.col("text").isNotNull()) & (F.col("text") != ""))
        .select("doc_id")
        .orderBy("doc_id")
        .limit(1000)
    )

    # deterministic docID assignment (IndexSorter / index-sorting analog):
    # rank over a stable total order, partition-layout independent
    def doc_id_assignment(spark, sf):
        from lucene_spark.index import assign_doc_ids

        d = _docs(spark, sf).select(
            F.col("doc_id").alias("orig_id"), "n_chars"
        )
        return assign_doc_ids(
            d.repartition(7), ["n_chars", "orig_id"]
        ).select("orig_id", F.col("doc_id").alias("sorted_id"))

    out["doc_id_assignment"] = doc_id_assignment

    # term vectors analog: per-doc (term, freq) decoded from postings
    def term_vectors(spark, sf):
        idx = _index(spark, sf)
        # skip-pointer pruning: only blocks whose doc range can contain
        # doc_id < 10 are decoded (first_doc metadata)
        return (
            _decode_postings(idx, None, max_doc=9)
            .filter(F.col("doc_id") < 10)
            .select("doc_id", "term", "freq")
            .orderBy("doc_id", "term")
        )

    out["term_vectors"] = term_vectors

    # stored-fields retrieval: hits joined back to the document store
    # (first 10 matches by docID — float32 top-k ranking is pytest-
    # verified; the gate checks the retrieval join deterministically)
    def stored_fields(spark, sf):
        hits = _const_score_docs(spark, sf, TermQuery("vector"), k=10).select("doc_id")
        return (
            hits.join(_docs(spark, sf), "doc_id")
            .select("doc_id", "lang", "source", "n_chars")
            .orderBy("doc_id")
        )

    out["stored_fields"] = stored_fields

    # --- statistics / norms
    def collection_stats(spark, sf):
        # avgdl is the UN-rounded IEEE double sttf/doc_count on both the
        # engine and oracle sides: Python round() vs DuckDB round() can
        # differ in the last ulp and trip the driver's full-precision
        # value hash (the one red row of round 1).
        idx = _index(spark, sf)
        return spark.createDataFrame(
            [
                (
                    idx.doc_count,
                    idx.sum_total_term_freq,
                    idx.sum_total_term_freq / idx.doc_count,
                )
            ],
            "doc_count long, sttf long, avgdl double",
        )

    out["collection_stats"] = collection_stats

    # --- deletes / liveDocs (IndexWriter.deleteDocuments + reclaim) ------

    # tombstones filter results but stats stay (Lucene: docFreq counts
    # deleted docs until merge) — so the oracle is exactly the MUST_NOT
    # oracle: full-corpus stats, excluded docs
    def search_with_deletes(spark, sf):
        from lucene_spark.index import delete_documents

        return bm25_topk_f64(
            delete_documents(_index(spark, sf), "join"), {"hash": 1.0}, k=20
        )

    out["search_with_deletes"] = search_with_deletes

    # soft-delete lifecycle: hide 'scan' docs, revive the doc_id%3==0
    # subset, search — hidden docs leave results but still count in
    # stats (SoftDeletesDirectoryReaderWrapper semantics)
    def soft_deletes_search(spark, sf):
        from lucene_spark.index import soft_delete_by_query, undelete
        from lucene_spark.search import TermQuery

        idx = soft_delete_by_query(_index(spark, sf), TermQuery("scan"))
        idx = undelete(
            idx, idx.soft_deletes.filter(F.col("doc_id") % 3 == 0)
        )
        return bm25_topk_f64(idx, {"hash": 1.0}, k=20)

    out["soft_deletes_search"] = soft_deletes_search

    # payload scoring (PayloadScoreQuery + DelimitedPayloadTokenFilter):
    # rewrite each token to "tok|<split-index>" so every occurrence
    # carries a varying float payload, then rank docs by the
    # AveragePayloadFunction over 'hash' occurrences
    def payload_avg_score(spark, sf):
        from lucene_spark.analysis.filters import delimited_payload_analyzer
        from lucene_spark.search.payloads import payload_score_topk

        docs = _docs(spark, sf).withColumn(
            "text",
            F.concat_ws(
                " ",
                F.expr(
                    "transform(split(text, ' '), "
                    "(t, i) -> concat(t, '|', cast(i AS string)))"
                ),
            ),
        )
        idx = InvertedIndex.build(
            docs,
            analyzer=delimited_payload_analyzer(),
            positions=True,
            payloads=True,
            docs_per_segment=2048,
        )
        return payload_score_topk(idx, "hash", func="avg", k=20).select(
            "doc_id", F.round("score", 4).alias("score")
        )

    out["payload_avg_score"] = payload_avg_score

    def _reclaimed(spark, sf):
        # separate build: apply_deletes rewrites blocks and releases the
        # input's cache root, so never run it on the shared gate index
        from lucene_spark.index import apply_deletes, delete_documents

        if ("reclaim", sf) not in _INDEX_CACHE:
            idx = InvertedIndex.build(
                _docs(spark, sf), analyzer="simple", docs_per_segment=2048
            )
            _INDEX_CACHE[("reclaim", sf)] = apply_deletes(
                delete_documents(idx, "vector")
            )
        return _INDEX_CACHE[("reclaim", sf)]

    # merge-time reclaim: stats now EXCLUDE the deleted docs
    def delete_reclaim_stats(spark, sf):
        idx = _reclaimed(spark, sf)
        return spark.createDataFrame(
            [
                (
                    idx.doc_count,
                    idx.sum_total_term_freq,
                    idx.sum_total_term_freq / idx.doc_count,
                )
            ],
            "doc_count long, sttf long, avgdl double",
        )

    out["delete_reclaim_stats"] = delete_reclaim_stats

    # post-reclaim scoring uses the recomputed stats (df/sttf dropped)
    out["term_topk_after_reclaim"] = lambda spark, sf: bm25_topk_f64(
        _reclaimed(spark, sf), {"hash": 1.0}, k=20
    )

    # MergeOnFlushMergePolicy (sandbox/index/MergeOnFlushMergePolicy
    # .java:30): every sub-threshold segment merges into ONE at commit;
    # scoring over the merged index must be byte-identical to plain BM25
    def merge_on_flush_topk(spark, sf):
        from lucene_spark.index.merge import (
            merge_on_flush_plan,
            merge_segments,
            segment_infos,
        )

        if ("mof", sf) not in _INDEX_CACHE:
            idx = InvertedIndex.build(
                _docs(spark, sf), analyzer="simple", docs_per_segment=256
            )
            plan = merge_on_flush_plan(
                segment_infos(idx), small_segment_threshold_docs=512
            )
            _INDEX_CACHE[("mof", sf)] = (
                merge_segments(idx, plan) if plan else idx
            )
        return bm25_topk_f64(
            _INDEX_CACHE[("mof", sf)], {"merge": 1.0, "scan": 0.5}, k=20
        )

    out["merge_on_flush_topk"] = merge_on_flush_topk

    # ID-version postings (sandbox/codecs/idversion/IDVersionPostings
    # Format.java:36): versioned primary-key map + optimistic-
    # concurrency update merge (stale versions skipped)
    def id_version_updates(spark, sf):
        from lucene_spark.index.idversion import apply_updates, build_id_version

        docs = _docs(spark, sf).select(
            (F.col("doc_id") % 997).alias("id"),
            F.col("doc_id"),
            F.col("doc_id").alias("version"),
        )
        cur = build_id_version(docs)
        ups = (
            _docs(spark, sf)
            .filter(F.col("doc_id") < 1500)
            .select(
                (F.col("doc_id") % 997).alias("id"),
                (F.col("doc_id") + 100000).alias("doc_id"),
                (F.col("doc_id") * 2).alias("version"),
            )
        )
        return (
            apply_updates(cur, ups)
            .orderBy("id")
            .limit(300)
        )

    out["id_version_updates"] = id_version_updates

    # CCNet-style bigram-LM perplexity quality signal (Wenzek et al.
    # 2020): train on the doc_id % 5 != 0 slice, rank the rest by
    # log10 perplexity ascending (= cleaner)
    def lm_perplexity(spark, sf):
        from lucene_spark.pipeline.lm import perplexity, train_bigram_lm

        docs = _docs(spark, sf)
        model = train_bigram_lm(docs.filter(F.col("doc_id") % 5 != 0))
        return perplexity(docs.filter(F.col("doc_id") < 1500), model).limit(300)

    out["lm_perplexity"] = lm_perplexity

    # DSIR importance resampling (Xie et al. 2023): hashed-unigram
    # multinomials target-vs-raw, Gumbel-top-k derandomized via the
    # md5 uniform — raw = doc_id<2000 slice, target = the 'en' slice
    def dsir_resample_gate(spark, sf):
        from lucene_spark.pipeline.dsir import dsir_resample

        docs = _docs(spark, sf)
        return dsir_resample(
            docs.filter(F.col("doc_id") < 2000),
            docs.filter(F.col("lang") == "en"),
            k=200,
            n_buckets=4096,
            seed=42,
        )

    out["dsir_resample"] = dsir_resample_gate

    # --- english analyzer (possessive strip → stop → Porter stem) --------

    # stemmer battery: the engine's vectorized Porter UDF over the
    # actual corpus vocabulary + a fixed inflection list; the oracle's
    # stems are hand-derived from the published 1980 algorithm
    def porter_stem_tokens(spark, sf):
        from lucene_spark.analysis.porter import porter_stem_udf

        corpus_toks = (
            _docs(spark, sf)
            .select(F.explode(F.split("text", " ")).alias("word"))
            .filter(F.col("word") != "")
            .distinct()
        )
        extra = spark.createDataFrame(
            [(w,) for w in sorted(_STEM_BATTERY)], "word string"
        )
        words = corpus_toks.unionByName(extra).distinct()
        return words.select(
            "word", porter_stem_udf()("word").alias("stem")
        ).orderBy("word")

    out["porter_stem_tokens"] = porter_stem_tokens

    def _index_english(spark, sf):
        if ("english", sf) not in _INDEX_CACHE:
            _INDEX_CACHE[("english", sf)] = InvertedIndex.build(
                _docs(spark, sf), analyzer="english", docs_per_segment=2048
            )
        return _INDEX_CACHE[("english", sf)]

    # end-to-end english chain: index with stemming, score BM25 on a
    # stem; oracle re-creates the chain via the hand-derived stem map
    out["english_term_topk"] = lambda spark, sf: bm25_topk_f64(
        _index_english(spark, sf), {"merg": 1.0}, k=20
    )
    out["english_term_stats"] = lambda spark, sf: (
        _index_english(spark, sf)
        .terms.orderBy(F.col("doc_freq").desc(), F.col("term").asc())
        .limit(10)
        .select("term", "doc_freq", "total_term_freq")
    )

    out["term_stats"] = lambda spark, sf: (
        _index(spark, sf)
        .terms.orderBy(F.col("doc_freq").desc(), F.col("term").asc())
        .limit(10)
        .select("term", "doc_freq", "total_term_freq")
    )

    def doc_norms(spark, sf):
        from lucene_spark.functions.smallfloat import byte4_to_int
        import numpy as np

        idx = _index(spark, sf)
        dlq = spark.createDataFrame(
            [(int(i), int(byte4_to_int(np.int64(i)))) for i in range(256)],
            "norm int, dl_q int",
        )
        return (
            idx.norms.filter(F.col("doc_id") < 200)
            .join(F.broadcast(dlq), "norm")
            .select("doc_id", "dl", F.col("norm").alias("norm_byte"), "dl_q")
        )

    out["doc_norms"] = doc_norms

    # --- sorted search / facets / grouping (Lucene module analogs)
    out["top_docs_by_chars"] = lambda spark, sf: (
        _docs(spark, sf)
        .select("doc_id", "n_chars")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .limit(25)
    )
    out["facet_lang_counts"] = lambda spark, sf: (
        _docs(spark, sf).groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    )
    out["facet_chars_histogram"] = lambda spark, sf: (
        _docs(spark, sf)
        .groupBy(F.floor(F.col("n_chars") / 100).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    out["group_top2_per_lang"] = lambda spark, sf: (
        _docs(spark, sf)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
            ),
        )
        .filter(F.col("rn") <= 2)
        .select("lang", "doc_id", "n_chars", "rn")
    )
    out["distinct_sources_per_lang"] = lambda spark, sf: (
        _docs(spark, sf).groupBy("lang").agg(F.countDistinct("source").alias("n_sources"))
    )

    # --- Lucene module analogs: join / facet / grouping / misc -----------

    # ToParentBlockJoinQuery analog: parent (orders) scored by max child
    # (lineitem) contribution, child filter pushed down
    def block_join_orders(spark, sf):
        orders = spark.read.parquet(f"{sf}/orders.parquet")
        items = spark.read.parquet(f"{sf}/lineitem.parquet")
        child = items.filter(F.col("l_quantity") > 30).groupBy("l_orderkey").agg(
            F.round(
                F.max(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 4
            ).alias("best_child"),
            F.count(F.lit(1)).alias("n_children"),
        )
        return (
            orders.join(child, orders.o_orderkey == child.l_orderkey)
            .select("o_orderkey", "o_orderstatus", "best_child", "n_children")
            .orderBy(F.col("best_child").desc(), F.col("o_orderkey").asc())
            .limit(20)
        )

    out["block_join_orders"] = block_join_orders

    # ToChildBlockJoinQuery analog (`join/ToChildBlockJoinQuery.java`):
    # the parent query selects orders; the result set is their CHILD
    # rows. Children co-join the (small) matched-parent set broadcast.
    def block_join_children(spark, sf):
        orders = spark.read.parquet(f"{sf}/orders.parquet")
        items = spark.read.parquet(f"{sf}/lineitem.parquet")
        parents = orders.filter(
            (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 250000)
        )
        return (
            items.join(
                F.broadcast(parents.select("o_orderkey")),
                items.l_orderkey == F.col("o_orderkey"),
            )
            .select(
                "l_orderkey",
                "l_linenumber",
                F.round("l_extendedprice", 4).alias("price"),
            )
            .orderBy("l_orderkey", "l_linenumber")
            .limit(200)
        )

    out["block_join_children"] = block_join_children

    # JoinUtil analog: query-time join customer → orders
    def join_customer_orders(spark, sf):
        cust = spark.read.parquet(f"{sf}/customer.parquet")
        orders = spark.read.parquet(f"{sf}/orders.parquet")
        agg = orders.groupBy("o_custkey").agg(
            F.round(F.sum("o_totalprice"), 4).alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        return (
            cust.join(F.broadcast(agg), cust.c_custkey == agg.o_custkey)
            .select("c_custkey", "total_spent", "n_orders")
            .orderBy(F.col("total_spent").desc(), F.col("c_custkey").asc())
            .limit(25)
        )

    out["join_customer_orders"] = join_customer_orders

    # DrillSideways analog: drill-down on (lang='en', source='src1');
    # each dimension's counts computed with its own filter removed
    def drill_sideways(spark, sf):
        d = _docs(spark, sf)
        lang_dim = (
            d.filter(F.col("source") == "src1")
            .groupBy(F.col("lang").alias("value"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("dim", F.lit("lang"))
        )
        src_dim = (
            d.filter(F.col("lang") == "en")
            .groupBy(F.col("source").alias("value"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("dim", F.lit("source"))
        )
        return lang_dim.unionByName(src_dim).select("dim", "value", "cnt")

    out["drill_sideways"] = drill_sideways

    # expressions module analog: computed score expression + sort
    out["expression_score"] = lambda spark, sf: (
        _docs(spark, sf)
        .select(
            "doc_id",
            F.round(
                F.log(F.lit(1.0) + F.col("n_chars")) * 0.5
                + (F.col("doc_id") % 7) * 0.1,
                6,
            ).alias("expr_score"),
        )
        .orderBy(F.col("expr_score").desc(), F.col("doc_id").asc())
        .limit(20)
    )

    # suggest module analog: prefix completion from the term dictionary,
    # weighted by doc_freq
    out["suggest_prefix"] = lambda spark, sf: (
        _index(spark, sf)
        .terms.filter(F.col("term").startswith("s"))
        .orderBy(F.col("doc_freq").desc(), F.col("term").asc())
        .limit(10)
        .select("term", "doc_freq")
    )

    # highlighter analog: snippet around the first match of 'merge'
    out["highlight_snippet"] = lambda spark, sf: (
        _docs(spark, sf)
        .withColumn("pos", F.locate("merge", F.col("text")))
        .filter(F.col("pos") > 0)
        .select(
            "doc_id",
            F.substring(
                F.col("text"), F.greatest(F.col("pos") - 15, F.lit(1)), 40
            ).alias("snippet"),
        )
        .orderBy("doc_id")
        .limit(50)
    )

    # PointRangeQuery analog (BKD → parquet min/max + predicate pushdown)
    out["point_range"] = lambda spark, sf: (
        _docs(spark, sf)
        .filter((F.col("n_chars") >= 200) & (F.col("n_chars") <= 400))
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
        .limit(100)
    )

    # PointInSetQuery analog over events
    out["point_in_set"] = lambda spark, sf: (
        _events(spark, sf)
        .filter(F.col("event_type").isin("click", "view"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )

    # TopFieldCollector multi-key sort
    out["sort_multi_field"] = lambda spark, sf: (
        _docs(spark, sf)
        .select("doc_id", "lang", "n_chars")
        .orderBy(F.col("lang").asc(), F.col("n_chars").desc(), F.col("doc_id").asc())
        .limit(30)
    )

    # event-time windowed agg (streaming-capable path, batch-checked)
    def events_windowed(spark, sf):
        from lucene_spark.streaming.windows import windowed_event_counts

        return windowed_event_counts(_events(spark, sf), "30 minutes").select(
            "event_type",
            F.unix_timestamp("win_start").alias("win_epoch"),
            "cnt",
            "sum_value",
        )

    out["events_windowed"] = events_windowed

    # --- events table (range facet over time + agg)
    out["events_hourly"] = lambda spark, sf: (
        _events(spark, sf)
        .groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 3600).alias("hour_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 4).alias("sum_value"))
    )

    # --- dedup family
    out["dedup_exact"] = lambda spark, sf: (
        _docs(spark, sf)
        .select(F.md5("text").alias("content_md5"), "doc_id")
        .groupBy("content_md5")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keeper_id"))
    )
    out["minhash_signatures"] = lambda spark, sf: minhash_signatures(
        word_shingles(_docs(spark, sf).filter(F.col("doc_id") < 40)), num_hashes=8
    )
    out["ngram_jaccard_pairs"] = lambda spark, sf: ngram_jaccard_pairs(
        _docs(spark, sf).filter(F.col("doc_id") < 120), n=3, threshold=0.02
    )
    # connected-component dedup clusters over near-dup (jaccard) pairs;
    # oracle: recursive-CTE transitive closure with min labels
    def dedup_clusters(spark, sf):
        from lucene_spark.pipeline import duplicate_clusters

        pairs = ngram_jaccard_pairs(
            _docs(spark, sf).filter(F.col("doc_id") < 120), n=3, threshold=0.02
        ).select("doc_a", "doc_b")
        return duplicate_clusters(pairs).orderBy("doc_id")

    out["dedup_clusters"] = dedup_clusters

    out["simhash"] = _simhash_hex
    out["simhash_near_dups"] = lambda spark, sf: simhash_near_dups(
        _docs(spark, sf).filter(F.col("text") != ""), max_hamming=3
    )  # oracle: brute-force bit_count over SQL-computed simhashes

    # --- similarity search over embeddings
    def _qvec(spark, sf):
        return [
            float(x)
            for x in _emb(spark, sf).filter(F.col("vec_id") == 0).collect()[0]["embedding"]
        ]

    out["embedding_cosine_topk"] = lambda spark, sf: cosine_topk(
        _emb(spark, sf), _qvec(spark, sf), k=15
    )

    # faiss index-factory front end (sandbox/codecs/faiss/FaissKnn
    # VectorsFormat.java:59): description string routes to the
    # distributed engines; IVF8 probed at 8 lists == exact
    def knn_factory_topk(spark, sf):
        from lucene_spark.search.knnformat import knn_index_topk

        return knn_index_topk(
            _emb(spark, sf),
            _qvec(spark, sf),
            k=15,
            description="IDMap,IVF8,Flat",
            n_probes=8,
        )

    out["knn_factory_topk"] = knn_factory_topk
    out["embedding_lsh_topk"] = lambda spark, sf: lsh_bucket_topk(
        _emb(spark, sf), _qvec(spark, sf), k=15
    )  # engine-only: approximate (recall vs brute force tested in pytest)

    # per-segment HNSW graphs + merged top-k (KnnFloatVectorQuery
    # shape). With ef >= rows_per_segment the beam covers each
    # segment, so the result is value-exact vs the brute-force oracle;
    # the approximate (small-ef) regime is recall-tested in pytest.
    def embedding_hnsw_topk(spark, sf):
        from lucene_spark.search.hnsw import build_hnsw_segments, hnsw_topk

        graphs = build_hnsw_segments(
            _emb(spark, sf), rows_per_segment=256, m=16, beam_width=100
        )
        return hnsw_topk(graphs, _qvec(spark, sf), k=15, ef=256)

    out["embedding_hnsw_topk"] = embedding_hnsw_topk

    def embedding_ivf_topk(spark, sf):
        # IVF with all lists probed == exact brute force (oracle-safe)
        from lucene_spark.pipeline import ivf_assign, ivf_topk

        assigned, cent = ivf_assign(_emb(spark, sf), n_lists=8, seed=7)
        return ivf_topk(assigned, cent, _qvec(spark, sf), k=15, n_probes=8).select(
            F.col("vec_id"), F.col("cos")
        )

    out["embedding_ivf_topk"] = embedding_ivf_topk

    def embedding_near_dups_exact(spark, sf):
        e = _emb(spark, sf).filter(F.col("vec_id") < 300).select("vec_id", "embedding")
        a = e.alias("a")
        b = e.alias("b")
        dot = F.aggregate(
            F.zip_with(
                F.col("a.embedding"), F.col("b.embedding"),
                lambda x, y: x.cast("double") * y.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        nrm = lambda s: F.sqrt(
            F.aggregate(
                F.col(f"{s}.embedding"), F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        )
        return (
            a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
            .select(
                F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
                F.round(dot / (nrm("a") * nrm("b")), 6).alias("cos"),
            )
            .filter(F.col("cos") >= 0.4)
        )

    out["embedding_near_dups"] = embedding_near_dups_exact

    # --- text analysis
    out["lang_id"] = lambda spark, sf: language_id(_docs(spark, sf))
    out["quality_score"] = lambda spark, sf: quality_score(_docs(spark, sf))
    out["token_counts"] = lambda spark, sf: token_counts(_docs(spark, sf))
    out["fingerprint_md5"] = lambda spark, sf: fingerprint_md5(_docs(spark, sf))
    out["rolling_fingerprint"] = lambda spark, sf: rolling_fingerprint(
        _docs(spark, sf).filter(F.col("doc_id") < 50)
    )  # oracle: Horner-nested polynomial hash per window position

    # --- round-4 additions --------------------------------------------------

    # SpanOr composed inside SpanNear (queries/spans/SpanOrQuery.java:38):
    # near(ordered, slop=2) over [SpanOr(hash|merge), join]
    def span_or_near(spark, sf):
        from lucene_spark.search.spans import span_near_over, term_or_spans, term_spans

        idx = _index(spark, sf)
        frames = [term_or_spans(idx, ["hash", "merge"]), term_spans(idx, "join")]
        return _span_gate(
            span_near_over(frames, slop=2, in_order=True).select("doc_id").distinct()
        )

    out["span_or_near"] = span_or_near

    # SpanContainingQuery (queries/spans/SpanContainingQuery.java:33):
    # (hash .. join, slop<=3, ordered) windows containing a 'merge'
    def span_containing(spark, sf):
        from lucene_spark.search.spans import (
            span_containing_docs,
            span_near_over,
            term_spans,
        )

        idx = _index(spark, sf)
        big = span_near_over(
            [term_spans(idx, "hash"), term_spans(idx, "join")], slop=6, in_order=True
        )
        return _span_gate(span_containing_docs(idx, big, term_spans(idx, "merge")))

    out["span_containing"] = span_containing

    # Range fields (document/IntRange.java:48 / RangeFieldQuery.java):
    # per-relation match counts of derived event ranges vs query [3, 7]
    def range_field_overlap(spark, sf):
        from lucene_spark.search.rangefield import RELATIONS, range_relation_cond

        ev = _events(spark, sf).select(
            F.col("value").alias("rmin"),
            (F.col("value") + (F.col("user_id") % 10) + F.lit(1.0)).alias("rmax"),
        )
        return ev.agg(
            *[
                F.sum(
                    range_relation_cond(
                        F.col("rmin"), F.col("rmax"), 3.0, 7.0, rel
                    ).cast("long")
                ).alias(rel)
                for rel in RELATIONS
            ]
        )

    out["range_field_overlap"] = range_field_overlap

    # FunctionScoreQuery.boostByValue (queries/function/FunctionScoreQuery.java:64)
    def function_score(spark, sf):
        from lucene_spark.search.functionscore import function_score_topk

        return function_score_topk(
            _index(spark, sf),
            {"hash": 1.0, "join": 0.5},
            _docs(spark, sf),
            F.col("n_chars") / (F.col("n_chars") + F.lit(100.0)),
            mode="multiply",
            k=12,
        )

    out["function_score_topk"] = function_score

    # FunctionScoreQuery.boostByQuery (FunctionScoreQuery.java:78)
    def boost_by_query(spark, sf):
        from lucene_spark.search.functionscore import boost_by_query_topk

        return boost_by_query_topk(
            _index(spark, sf), {"hash": 1.0}, {"scan": 1.0}, boost_value=3.0, k=12
        )

    out["boost_by_query"] = boost_by_query

    # searchAfter over a field Sort (search/IndexSearcher.java:698 +
    # TopFieldCollector after-bottom): page 2 of (lang asc, n_chars desc)
    def search_after_sorted_gate(spark, sf):
        from lucene_spark.search.parity import search_after_sorted

        d = _docs(spark, sf).select("doc_id", "lang", "n_chars")
        spec = [("lang", "asc"), ("n_chars", "desc")]
        p1 = search_after_sorted(d, spec, k=15).collect()
        last = p1[-1]
        anchor = {
            "lang": last["lang"],
            "n_chars": last["n_chars"],
            "doc_id": last["doc_id"],
        }
        return search_after_sorted(d, spec, k=15, anchor=anchor)

    out["search_after_sorted"] = search_after_sorted_gate

    # FuzzySuggester (suggest/analyzing/FuzzySuggester.java:66)
    def suggest_fuzzy(spark, sf):
        from lucene_spark.search.suggest import fuzzy_suggest

        return fuzzy_suggest(_index(spark, sf), "sparl", n=8, max_edits=2)

    out["suggest_fuzzy"] = suggest_fuzzy

    # Scalar-quantized int8 HNSW
    # (codecs/lucene99/Lucene99ScalarQuantizedVectorsFormat.java:34 +
    # Lucene99HnswScalarQuantizedVectorsFormat): int8 traversal, exact
    # float64 re-rank; ef covers each segment so values are exact
    def embedding_hnsw_quantized_topk(spark, sf):
        from lucene_spark.search.hnsw import build_hnsw_segments, hnsw_topk

        graphs = build_hnsw_segments(
            _emb(spark, sf),
            rows_per_segment=256,
            m=16,
            beam_width=100,
            quantize=True,
        )
        return hnsw_topk(graphs, _qvec(spark, sf), k=15, ef=256)

    out["embedding_hnsw_quantized_topk"] = embedding_hnsw_quantized_topk

    # BlendedInfixSuggester (suggest/analyzing/BlendedInfixSuggester.java:56):
    # infix lookup with position-blended weights (reciprocal blender)
    def blended_infix(spark, sf):
        from lucene_spark.search.suggest import blended_infix_suggest

        sug = _docs(spark, sf).select(
            F.array_join(F.slice(F.split(F.col("text"), " "), 1, 6), " ").alias(
                "suggestion"
            ),
            F.col("n_chars").alias("weight"),
        )
        return blended_infix_suggest(sug, "mer", n=12, blender="reciprocal")

    out["blended_infix"] = blended_infix

    # LatLonShape box relations (document/LatLonShape.java:79 +
    # ShapeField.QueryRelation): deterministic synthetic 4-vertex
    # shapes on a 1/8° grid (exact doubles both engines), counted per
    # relation; polygon INTERSECTS exercises the corner-in-polygon path
    def shape_box_relations(spark, sf):
        from lucene_spark.search.shape import (
            line_box_relation,
            polygon_box_relation,
        )

        box = (-2.0, 1.0, -1.0, 2.0)
        d = (
            _docs(spark, sf)
            .select("doc_id")
            .filter(F.col("doc_id") < 400)
            .withColumn(
                "lats",
                F.expr(
                    "transform(sequence(0, 3), j -> "
                    "((doc_id * 37 + j * 59) % 40) / 8.0 - 2.5)"
                ),
            )
            .withColumn(
                "lons",
                F.expr(
                    "transform(sequence(0, 3), j -> "
                    "((doc_id * 23 + j * 83) % 40) / 8.0 - 2.5)"
                ),
            )
        )
        return d.agg(
            F.sum(
                line_box_relation("lats", "lons", box, "intersects").cast("long")
            ).alias("line_intersects"),
            F.sum(
                line_box_relation("lats", "lons", box, "within").cast("long")
            ).alias("line_within"),
            F.sum(
                line_box_relation("lats", "lons", box, "disjoint").cast("long")
            ).alias("line_disjoint"),
            F.sum(
                polygon_box_relation("lats", "lons", box, "intersects").cast("long")
            ).alias("poly_intersects"),
        )

    out["shape_box_relations"] = shape_box_relations

    # ICUFoldingFilter (analysis/icu/.../ICUFoldingFilter.java:64):
    # UTR#30 folding (case + accents + width + compatibility composed
    # with NFKC) over deterministic unicode tokens synthesized from
    # doc_id; folded-term counts. The oracle maps each source token to
    # its spec-derived folding (hand-derived from the public Unicode
    # data, the Porter STEM_MAP precedent).
    def icu_folding(spark, sf):
        from lucene_spark.analysis.icu import icu_fold_tokens_udf

        toks = F.array(*[F.lit(t) for t in _ICU_SRC_TOKENS])
        d = (
            _docs(spark, sf)
            .select("doc_id")
            .filter(F.col("doc_id") < 600)
            .select(
                F.element_at(
                    toks, (F.col("doc_id") % len(_ICU_SRC_TOKENS) + 1).cast("int")
                ).alias("tok")
            )
            .select(
                F.element_at(
                    icu_fold_tokens_udf()(F.array(F.col("tok"))), 1
                ).alias("term")
            )
        )
        return (
            d.groupBy("term")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("term")
        )

    out["icu_folding"] = icu_folding

    # Stempel Polish stemmer (org/egothor/stemmer/Trie.java:84,
    # StempelFilter.java:71, PolishAnalyzer.java:135): pinned inflected
    # forms cycled by doc_id, stemmed by the live Arrow-batched UDF.
    def polish_stem_terms(spark, sf):
        from lucene_spark.analysis.stempel import polish_stem_udf

        toks = F.array(*[F.lit(t) for t in _PL_SRC_TOKENS])
        d = (
            _docs(spark, sf)
            .select("doc_id")
            .filter(F.col("doc_id") < 600)
            .select(
                F.element_at(
                    toks, (F.col("doc_id") % len(_PL_SRC_TOKENS) + 1).cast("int")
                ).alias("word")
            )
            .select("word", polish_stem_udf()(F.col("word")).alias("stem"))
        )
        return (
            d.groupBy("word", "stem")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("word")
        )

    out["polish_stem_terms"] = polish_stem_terms

    # OpenNLP chain analog (opennlp/OpenNLPTokenizer.java:30,
    # OpenNLPPOSFilter.java:36, OpenNLPChunkerFilter.java:31,
    # OpenNLPLemmatizerFilter.java:50): pinned sentences cycled by
    # doc_id through the live tokenize→POS→chunk→lemmatize Arrow pass.
    def opennlp_pos_chunks(spark, sf):
        from lucene_spark.analysis.opennlp import pos_chunk_udf

        sents = F.array(*[F.lit(s) for s in _ONLP_SENTS])
        d = (
            _docs(spark, sf)
            .select("doc_id")
            .filter(F.col("doc_id") < 600)
            .select(
                (F.col("doc_id") % len(_ONLP_SENTS)).cast("int").alias("i"),
                F.element_at(
                    sents, (F.col("doc_id") % len(_ONLP_SENTS) + 1).cast("int")
                ).alias("sent"),
            )
            .select("i", F.explode(pos_chunk_udf()(F.col("sent"))).alias("t"))
        )
        return (
            d.select(
                "i",
                F.col("t.term").alias("term"),
                F.col("t.pos").alias("pos"),
                F.col("t.chunk").alias("chunk"),
                F.col("t.lemma").alias("lemma"),
            )
            .groupBy("i", "term", "pos", "chunk", "lemma")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("i", "term", "pos", "chunk", "lemma")
        )

    out["opennlp_pos_chunks"] = opennlp_pos_chunks

    # Sentence-window chunking (pipeline/chunking.py over the
    # OpenNLPSentenceBreakIterator analog): w=3, s=2 overlapping windows.
    def sentence_chunks(spark, sf):
        from lucene_spark.pipeline.chunking import sentence_windows

        texts = F.array(*[F.lit(t) for t in _CHUNK_TEXTS])
        d = (
            _docs(spark, sf)
            .select("doc_id")
            .filter(F.col("doc_id") < 300)
            .select(
                "doc_id",
                F.element_at(
                    texts, (F.col("doc_id") % len(_CHUNK_TEXTS) + 1).cast("int")
                ).alias("text"),
            )
        )
        return (
            sentence_windows(d, window=3, stride=2)
            .select(
                "doc_id",
                "chunk_id",
                "chunk_text",
                F.col("n_sentences").cast("long").alias("n_sentences"),
                F.col("first_sentence").cast("long").alias("first_sentence"),
            )
            .orderBy("doc_id", "chunk_id")
        )

    out["sentence_chunks"] = sentence_chunks

    # Morfologik dictionary lemmatizer analog
    # (morfologik/MorfologikFilter.java:51): ambiguous surface forms
    # emit every interpretation; unknown forms pass through untagged.
    def morfologik_lemmas(spark, sf):
        from lucene_spark.analysis.morfologik import morfologik_lemmas_udf

        words = F.array(*[F.lit(w) for w in _MORF_WORDS])
        d = (
            _docs(spark, sf)
            .select("doc_id")
            .filter(F.col("doc_id") < 600)
            .select(
                F.element_at(
                    words, (F.col("doc_id") % len(_MORF_WORDS) + 1).cast("int")
                ).alias("word")
            )
            .select("word", F.explode(morfologik_lemmas_udf()(F.col("word"))).alias("m"))
        )
        return (
            d.select(
                "word",
                F.col("m.lemma").alias("lemma"),
                F.concat_ws("+", F.col("m.tags")).alias("tags"),
            )
            .groupBy("word", "lemma", "tags")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("word", "lemma", "tags")
        )

    out["morfologik_lemmas"] = morfologik_lemmas

    # Plain histogram facets (sandbox HistogramCollector.java:52):
    # fixed-width buckets, floorDiv semantics, maxBuckets cap.
    def histogram_facets(spark, sf):
        from lucene_spark.search.facets import histogram_counts

        return histogram_counts(
            _docs(spark, sf).select("n_chars"), "n_chars", 40
        )

    out["histogram_facets"] = histogram_facets

    # PayloadSpanUtil (sandbox/payloads/PayloadSpanUtil.java:37):
    # collect payloads at the positions a (phrase-rewritten) query
    # matches; payload = 0-based token index by construction.
    def span_payloads_collect(spark, sf):
        from lucene_spark.analysis.filters import delimited_payload_analyzer
        from lucene_spark.search.payloads import payloads_for_query

        docs = _docs(spark, sf).withColumn(
            "text",
            F.concat_ws(
                " ",
                F.expr(
                    "transform(split(text, ' '), "
                    "(t, i) -> concat(t, '|', cast(i AS string)))"
                ),
            ),
        )
        idx = InvertedIndex.build(
            docs,
            analyzer=delimited_payload_analyzer(),
            positions=True,
            payloads=True,
            docs_per_segment=2048,
        )
        rows = payloads_for_query(idx, {"phrase": ["table", "value"], "slop": 0})
        return rows.select(
            "doc_id",
            "term",
            F.col("pos").cast("int").alias("pos"),
            F.col("payload").cast("long").alias("payload"),
        ).orderBy("doc_id", "pos")

    out["span_payloads_collect"] = span_payloads_collect

    # BPReorderingMergePolicy analog (misc/index/
    # BPReorderingMergePolicy.java:18): merge + per-merge BP doc map;
    # search results are invariant modulo the id permutation, checked
    # by mapping back to original ids against the plain BM25 oracle.
    def bp_merge_reorder_topk(spark, sf):
        from lucene_spark.index.bpmerge import bp_reordering_merge

        corpus = _docs(spark, sf)
        idx = InvertedIndex.build(
            corpus, analyzer="simple", docs_per_segment=128
        )
        plan = [[0, 1], [2, 3]]
        new_idx, new_corpus, diag = bp_reordering_merge(
            idx, corpus, plan,
            min_natural_merge_num_docs=64, min_partition_size=16,
        )
        assert all(diag.values()), diag  # both merges clear the bar
        from lucene_spark.search.parity import _bm25_scored_f64

        scored = _bm25_scored_f64(new_idx, {"scan": 1.0, "merge": 0.5})
        remap = new_corpus.select(
            F.col("doc_id").alias("nid"), "orig_doc_id"
        )
        return (
            scored.withColumnRenamed("doc_id", "nid")
            .join(remap, "nid")
            .orderBy(F.col("s").desc(), F.col("orig_doc_id").asc())
            .limit(15)
            .select(
                F.col("orig_doc_id").alias("doc_id"),
                F.round(F.col("s"), 4).alias("score"),
            )
        )

    out["bp_merge_reorder_topk"] = bp_merge_reorder_topk

    # IndexRearranger (misc/index/IndexRearranger.java:28): one output
    # segment per selector, selector order preserved; per-segment doc
    # counts AND per-segment postings ('hash' docFreq) must equal the
    # selector partition computed straight from the corpus.
    def rearrange_stats(spark, sf):
        from lucene_spark.index.rearranger import rearrange

        corpus = _docs(spark, sf)
        idx, mapping = rearrange(
            corpus,
            [
                F.col("doc_id") % 3 == 0,
                F.col("doc_id") % 3 == 1,
                F.col("doc_id") % 3 == 2,
            ],
        )
        n_docs = mapping.groupBy("segment_id").agg(
            F.count(F.lit(1)).alias("n_docs")
        )
        hash_docs = (
            idx.blocks.filter(F.col("term") == "hash")
            .groupBy("segment_id")
            .agg(F.sum("num_docs").alias("hash_docs"))
        )
        return (
            n_docs.join(hash_docs, "segment_id", "left")
            .select(
                F.col("segment_id").cast("long").alias("segment_id"),
                F.col("n_docs").cast("long").alias("n_docs"),
                F.coalesce(F.col("hash_docs"), F.lit(0)).cast("long").alias("hash_docs"),
            )
            .orderBy("segment_id")
        )

    out["rearrange_stats"] = rearrange_stats

    # TimeLimitingBulkScorer analog (core/search/
    # TimeLimitingBulkScorer.java:28): chunked scoring with a clock
    # check between chunks; a generous budget must reproduce the plain
    # BM25 ranking exactly and must not report a timeout.
    def time_limited_topk_gate(spark, sf):
        from lucene_spark.search.timelimit import time_limited_topk

        idx = _index(spark, sf)
        topk, timed_out = time_limited_topk(
            idx, {"hash": 1.0, "scan": 0.5}, k=15,
            budget_ms=10 * 60 * 1000.0, chunk_segments=2,
        )
        assert not timed_out
        return topk.select(
            "doc_id", F.round(F.col("s"), 4).alias("score")
        ).orderBy(F.col("score").desc(), F.col("doc_id").asc())

    out["time_limited_topk"] = time_limited_topk_gate

    # IndexUpgrader / backward-codecs analog (core/index/
    # IndexUpgrader.java:48): fabricate a v1-format directory, upgrade
    # it, and the upgraded index must answer BM25 exactly like a fresh
    # current-format build (= the plain oracle).
    def upgrade_roundtrip(spark, sf):
        import json as _json
        import os as _os
        import shutil as _shutil
        import tempfile as _tempfile

        from lucene_spark.functions.forutil import fordelta_decode
        from lucene_spark.index.backward import (
            V1_FORMAT,
            _v1_encode_docs,
            upgrade_index,
        )

        if sf not in _UPGRADE_CACHE:
            path = _os.path.join(
                _tempfile.mkdtemp(prefix="lucene_spark_upgrade_"), "idx"
            )
            idx = InvertedIndex.build(
                _docs(spark, sf), analyzer="simple", docs_per_segment=2048
            )
            idx.save(path)
            blocks = spark.read.parquet(_os.path.join(path, "blocks"))
            pdf = blocks.toPandas()
            pdf["docs_packed"] = [
                _v1_encode_docs(fordelta_decode(bytes(b)))
                for b in pdf["docs_packed"]
            ]
            pdf = pdf.drop(columns=["doc_zones"])
            tmp = _os.path.join(path, "blocks_v1tmp")
            spark.createDataFrame(pdf).write.mode("overwrite").parquet(tmp)
            _shutil.rmtree(_os.path.join(path, "blocks"))
            _os.replace(tmp, _os.path.join(path, "blocks"))
            mp = _os.path.join(path, "manifest.json")
            with open(mp) as fh:
                m = _json.load(fh)
            m["format"] = V1_FORMAT
            with open(mp, "w") as fh:
                _json.dump(m, fh)
            upgrade_index(spark, path)
            _UPGRADE_CACHE[sf] = path
        from lucene_spark.search.parity import _bm25_scored_f64

        upgraded = InvertedIndex.load(spark, _UPGRADE_CACHE[sf])
        return (
            _bm25_scored_f64(upgraded, {"hash": 1.0, "scan": 0.5})
            .orderBy(F.col("s").desc(), F.col("doc_id").asc())
            .limit(15)
            .select("doc_id", F.round(F.col("s"), 4).alias("score"))
        )

    out["upgrade_roundtrip"] = upgrade_roundtrip

    # Deflate compression-ratio quality signal (MassiveText/Gopher-
    # family curation heuristic): pinned texts cycled by doc_id, sizes
    # from the live zlib pass; oracle pins the expected byte counts.
    def compression_ratio_gate(spark, sf):
        from lucene_spark.pipeline.textstats import compression_ratio

        texts = F.array(*[F.lit(t) for t in _ZR_TEXTS])
        d = (
            _docs(spark, sf)
            .select("doc_id")
            .filter(F.col("doc_id") < 400)
            .select(
                "doc_id",
                F.element_at(
                    texts, (F.col("doc_id") % len(_ZR_TEXTS) + 1).cast("int")
                ).alias("text"),
            )
        )
        return compression_ratio(d).orderBy("doc_id")

    out["compression_ratio"] = compression_ratio_gate

    # Per-domain cap + blocklist (C4-family curation): deterministic
    # md5-bucket keep order, exact row_number cap; urls synthesized
    # from doc_id (7 domains), domain site0.com blocklisted.
    def domain_cap_docs(spark, sf):
        from lucene_spark.pipeline.urls import domain_cap

        d = (
            _docs(spark, sf)
            .select("doc_id")
            .filter(F.col("doc_id") < 500)
            .withColumn(
                "url",
                F.concat(
                    F.lit("https://sub.site"),
                    (F.col("doc_id") % 7).cast("string"),
                    F.lit(".com/page/"),
                    F.col("doc_id").cast("string"),
                ),
            )
        )
        kept = domain_cap(d, cap=20, blocklist=["site0.com"], seed=5)
        return kept.select("doc_id").orderBy("doc_id")

    out["domain_cap_docs"] = domain_cap_docs

    # Japanese morphological tokenizer (kuromoji analog,
    # `analysis/ja/JapaneseTokenizer.java:61`): distributed Viterbi
    # segmentation of pinned sentences vs the hand-written goldens
    # (_JA_GOLDEN). The oracle is a literal VALUES table of expected
    # (sentence, token) rows — not a recomputation — so any drift in
    # lexicon, costs, or lattice search turns the gate red.
    def ja_morph_tokens(spark, sf):
        from lucene_spark.analysis.ja import ja_tokens_udf

        sents = F.array(*[F.lit(s) for s, _ in _JA_GOLDEN])
        d = (
            _docs(spark, sf)
            .select("doc_id")
            .filter(F.col("doc_id") < 500)
            .select(
                F.element_at(
                    sents, (F.col("doc_id") % len(_JA_GOLDEN) + 1).cast("int")
                ).alias("sent")
            )
            .select(F.explode(ja_tokens_udf("normal")(F.col("sent"))).alias("term"))
        )
        return d.groupBy("term").agg(F.count(F.lit(1)).alias("n")).orderBy("term")

    out["ja_morph_tokens"] = ja_morph_tokens

    # Korean morphological segmentation (nori analog,
    # analysis/nori/.../ko/KoreanTokenizer.java:67): Viterbi lattice +
    # DISCARD decompound over the pinned golden sentences
    def ko_morph_tokens(spark, sf):
        from lucene_spark.analysis.ko import ko_tokens_udf

        sents = F.array(*[F.lit(s) for s, _ in _KO_GOLDEN])
        d = (
            _docs(spark, sf)
            .select("doc_id")
            .filter(F.col("doc_id") < 500)
            .select(
                F.element_at(
                    sents, (F.col("doc_id") % len(_KO_GOLDEN) + 1).cast("int")
                ).alias("sent")
            )
            .select(
                F.explode(ko_tokens_udf("discard")(F.col("sent"))).alias("term")
            )
        )
        return d.groupBy("term").agg(F.count(F.lit(1)).alias("n")).orderBy("term")

    out["ko_morph_tokens"] = ko_morph_tokens

    # Chinese HHMM segmentation (SmartChineseAnalyzer analog,
    # analysis/cn/smart/hhmm/HHMMSegmenter.java:35): bigram-lattice
    # least-cost segmentation of the pinned golden sentences; the
    # oracle is a literal VALUES table so lexicon/cost/lattice drift
    # turns the gate red
    def zh_smart_tokens(spark, sf):
        from lucene_spark.analysis.zh import zh_tokens_udf

        sents = F.array(*[F.lit(s) for s, _ in _ZH_GOLDEN])
        d = (
            _docs(spark, sf)
            .select("doc_id")
            .filter(F.col("doc_id") < 500)
            .select(
                F.element_at(
                    sents, (F.col("doc_id") % len(_ZH_GOLDEN) + 1).cast("int")
                ).alias("sent")
            )
            .select(F.explode(zh_tokens_udf()(F.col("sent"))).alias("term"))
        )
        return d.groupBy("term").agg(F.count(F.lit(1)).alias("n")).orderBy("term")

    out["zh_smart_tokens"] = zh_smart_tokens

    # Thai dictionary segmentation (ThaiTokenizer.java:36 analog):
    # pinned golden sentences fanned over doc_ids, term counts
    def thai_tokens(spark, sf):
        from lucene_spark.analysis.th import thai_tokens_udf

        sents = F.array(*[F.lit(s) for s, _ in _TH_GOLDEN])
        d = (
            _docs(spark, sf)
            .select("doc_id")
            .filter(F.col("doc_id") < 500)
            .select(
                F.element_at(
                    sents, (F.col("doc_id") % len(_TH_GOLDEN) + 1).cast("int")
                ).alias("sent")
            )
            .select(F.explode(thai_tokens_udf()(F.col("sent"))).alias("term"))
        )
        return d.groupBy("term").agg(F.count(F.lit(1)).alias("n")).orderBy("term")

    out["thai_tokens"] = thai_tokens

    # Snowball stemmer battery (GermanStemmer.java + 5 siblings via
    # FrenchAnalyzer.java:43 etc.): distributed stemming of the pinned
    # multilingual vocab vs hand-derived vectors
    def snowball_stems(spark, sf):
        from lucene_spark.analysis.snowball import snowball_stem_udf

        frames = []
        for lang in ("da", "de", "es", "fr", "it", "nl", "no", "pt", "ru", "sv"):
            words = [(w,) for lg, w, _ in _SNOWBALL_BATTERY if lg == lang]
            df = spark.createDataFrame(words, "word string").select(
                F.lit(lang).alias("lang"),
                "word",
                snowball_stem_udf(lang)("word").alias("stem"),
            )
            frames.append(df)
        out_df = frames[0]
        for f in frames[1:]:
            out_df = out_df.unionByName(f)
        return out_df.orderBy("lang", "word")

    out["snowball_stems"] = snowball_stems

    # Light stemmer battery (ar/hi/id — ArabicStemmer.java,
    # HindiStemmer.java, IndonesianStemmer.java): distributed stemming
    # of the pinned vocab vs hand-derived vectors
    def light_stems(spark, sf):
        from lucene_spark.analysis.lightstem import light_stem_udf

        frames = []
        for lang in ("ar", "bg", "bn", "ckb", "cz", "el", "fa", "fi",
                     "hi", "hu", "id", "lv", "tr"):
            words = [(w,) for lg, w, _ in _LIGHT_BATTERY if lg == lang]
            df = spark.createDataFrame(words, "word string").select(
                F.lit(lang).alias("lang"),
                "word",
                light_stem_udf(lang)("word").alias("stem"),
            )
            frames.append(df)
        out_df = frames[0]
        for f in frames[1:]:
            out_df = out_df.unionByName(f)
        return out_df.orderBy("lang", "word")

    out["light_stems"] = light_stems

    # Normalization filter battery (GermanNormalizationFilter.java:41,
    # ScandinavianNormalizer.java:32, ScandinavianFoldingFilter.java:56,
    # SerbianNormalizationFilter.java:32, IrishLowerCaseFilter.java:28,
    # ElisionFilter.java:31): distributed normalization of the pinned
    # reference-test vocab; the oracle replays the reference's expected
    # outputs as a VALUES table
    def normalize_terms(spark, sf):
        from lucene_spark.analysis.normalize import normalize_udf

        frames = []
        for kind in ("de_norm", "scn_norm", "scn_fold", "sr_norm",
                     "ga_lower", "elision_fr", "elision_it",
                     "elision_ca", "elision_ga"):
            words = [(w,) for k, w, _ in _NORMALIZE_BATTERY if k == kind]
            df = spark.createDataFrame(words, "word string").select(
                F.lit(kind).alias("kind"),
                "word",
                normalize_udf(kind)("word").alias("norm"),
            )
            frames.append(df)
        out_df = frames[0]
        for f in frames[1:]:
            out_df = out_df.unionByName(f)
        return out_df.orderBy("kind", "word")

    out["normalize_terms"] = normalize_terms

    # RSLP stemmer battery (PortugueseStemmer.java:27,
    # GalicianStemmer.java:28, PortugueseMinimalStemmer.java:29,
    # GalicianMinimalStemmer.java:29, PortugueseLightStemmer.java:63):
    # distributed stemming of the pinned vocabulary samples
    def rslp_stems(spark, sf):
        from lucene_spark.analysis.rslp import rslp_stem_udf

        frames = []
        for kind in ("gl", "gl_minimal", "pt_rslp", "pt_minimal",
                     "pt_light"):
            words = [(w,) for k, w, _ in _RSLP_BATTERY if k == kind]
            df = spark.createDataFrame(words, "word string").select(
                F.lit(kind).alias("kind"),
                "word",
                rslp_stem_udf(kind)("word").alias("stem"),
            )
            frames.append(df)
        out_df = frames[0]
        for f in frames[1:]:
            out_df = out_df.unionByName(f)
        return out_df.orderBy("kind", "word")

    out["rslp_stems"] = rslp_stems

    # UniNE light stemmer battery (de/es/fr/it/ru/sv/no light+minimal
    # + es plural): distributed stemming of the pinned vocabulary
    # samples
    def unine_stems(spark, sf):
        from lucene_spark.analysis.unine import unine_stem_udf

        frames = []
        for kind in ("de_light", "de_minimal", "es_light", "es_minimal",
                     "es_plural", "fr_light", "fr_minimal", "it_light",
                     "no_light", "no_minimal", "ru_light", "sv_light",
                     "sv_minimal"):
            words = [(w,) for k, w, _ in _UNINE_BATTERY if k == kind]
            if not words:
                continue
            df = spark.createDataFrame(words, "word string").select(
                F.lit(kind).alias("kind"),
                "word",
                unine_stem_udf(kind)("word").alias("stem"),
            )
            frames.append(df)
        out_df = frames[0]
        for f in frames[1:]:
            out_df = out_df.unionByName(f)
        return out_df.orderBy("kind", "word")

    out["unine_stems"] = unine_stems

    # FacetSets (facet/facetset/MatchingFacetSetsCounts.java:41,
    # ExactFacetSetMatcher.java:27, RangeFacetSetMatcher.java:27):
    # per-order facet sets (quantity, ship-month) matched by exact and
    # range matchers; counts are per matching SET, total is per DOC —
    # the reference's exact counting semantics
    def facet_set_counts(spark, sf):
        from lucene_spark.search.facetset import (
            dim_range,
            exact_matcher,
            matching_facet_sets_counts,
            range_matcher,
        )

        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        docs = (
            li.select(
                "l_orderkey",
                F.array(
                    F.col("l_quantity").cast("long"),
                    F.month("l_shipdate").cast("long"),
                ).alias("fs"),
            )
            .groupBy("l_orderkey")
            .agg(F.collect_list("fs").alias("sets"))
        )
        matchers = [
            exact_matcher("qty17_mar", [17, 3]),
            exact_matcher("qty36_jun", [36, 6]),
            range_matcher("q10_20_h1", [dim_range(10, 20), dim_range(1, 6)]),
            range_matcher(
                "q1_50_dec",
                [dim_range(0, 50, min_inclusive=False), dim_range(12, 12)],
            ),
        ]
        return matching_facet_sets_counts(docs, "sets", matchers).orderBy(
            "label"
        )

    out["facet_set_counts"] = facet_set_counts

    # Brazilian stemmer (br/BrazilianStemmer.java:25): distributed
    # stemming of the pinned TestBrazilianAnalyzer vectors
    def brazilian_stems(spark, sf):
        from lucene_spark.analysis.br import brazilian_stem_udf

        words = [(w,) for w, _ in _BR_BATTERY]
        return (
            spark.createDataFrame(words, "word string")
            .select("word", brazilian_stem_udf()("word").alias("stem"))
            .orderBy("word")
        )

    out["brazilian_stems"] = brazilian_stems

    # DateRangePrefixTree faceting analog (spatial-extras
    # NumberRangePrefixTreeStrategy.java:38 facets at the day level):
    # synthetic per-event ranges [ts, ts + (event_id % 72 + 1) hours]
    # counted per calendar day they touch
    def date_range_day_facets(spark, sf):
        from lucene_spark.search.daterange import date_range_facet_counts

        ev = spark.read.parquet(f"{sf}/events.parquet").select(
            F.col("ts").alias("s"),
            (
                F.col("ts")
                + F.make_interval(
                    hours=(F.col("event_id") % 72 + 1).cast("int")
                )
            ).alias("e"),
        )
        return date_range_facet_counts(ev, "s", "e", "day")

    out["date_range_day_facets"] = date_range_day_facets

    # relation counts over the same ranges (SpatialOperation
    # Intersects/IsWithin/Contains/IsDisjointTo vs a query interval)
    def date_range_relations(spark, sf):
        from lucene_spark.search.daterange import date_range_relation

        ev = spark.read.parquet(f"{sf}/events.parquet").select(
            F.col("ts").alias("s"),
            (
                F.col("ts")
                + F.make_interval(
                    hours=(F.col("event_id") % 72 + 1).cast("int")
                )
            ).alias("e"),
        )
        import datetime

        qs = datetime.datetime(2024, 1, 10)
        qe = datetime.datetime(2024, 1, 15)
        rows = None
        for rel in ("intersects", "within", "contains", "disjoint"):
            r = ev.select(
                date_range_relation(F.col("s"), F.col("e"), qs, qe, rel)
                .cast("long")
                .alias("m")
            ).agg(
                F.lit(rel).alias("relation"),
                F.sum("m").alias("cnt"),
            )
            rows = r if rows is None else rows.unionByName(r)
        return rows.orderBy("relation")

    out["date_range_relations"] = date_range_relations

    # MinHash signatures (MinHashFilter.java:48 with hashCount=3,
    # bucketCount=4, hashSetSize=1, rotation): each doc emits a fixed
    # 12-slot LSH-ready signature; exact Lucene murmur3_x64_128 parity
    def min_hash_signatures(spark, sf):
        from lucene_spark.analysis.minhash import min_hash_udf

        df = spark.createDataFrame(
            _MINHASH_DOCS, "doc string, shingles array<string>"
        )
        mh = min_hash_udf(hash_count=3, bucket_count=4, hash_set_size=1)
        return (
            df.select(
                "doc", F.posexplode(mh("shingles")).alias("slot", "sig")
            )
            .orderBy("doc", "slot")
        )

    out["min_hash_signatures"] = min_hash_signatures

    # Misc token-filter battery: each kind is a per-string transform
    # applied as one Arrow-batched projection
    def misc_filter_terms(spark, sf):
        from lucene_spark.analysis import miscfilters as mf

        kinds = {
            "hyph": lambda s: " ".join(mf.hyphenated_words(s.split())),
            "hyph2": lambda s: " ".join(mf.hyphenated_words(s.split())),
            "capture": lambda s: " ".join(
                mf.pattern_capture_tokens(s, ["([A-Z][a-z]+)"], False)
            ),
            "capture_pre": lambda s: " ".join(
                mf.pattern_capture_tokens(s, ["([A-Z][a-z]+)"], True)
            ),
            "cap_first": lambda s: mf.capitalize_token(
                s, True, ["and", "the", "it", "BIG"], True
            ),
            "cap_all": lambda s: mf.capitalize_token(
                s, only_first_word=False, keep=["and"]
            ),
            "patrep": lambda s: mf.pattern_replace(s, "a+", "-"),
            "trunc4": lambda s: mf.truncate_token(s, 4),
            "limit2": lambda s: " ".join(
                mf.limit_token_count(s.split(), 2)
            ),
            "keepw": lambda s: " ".join(
                mf.keep_word_tokens(s.split(), ["fox", "dog"])
            ),
            "dtf": lambda s: "{}:{}".format(
                *mf.delimited_term_frequency(s)
            ),
            "override": lambda s: mf.stemmer_override(
                s, {"mice": "mouse", "feet": "foot"}
            ),
        }
        from lucene_spark.analysis.miscfilters import string_transform_udf

        frames = []
        for kind in sorted(kinds):
            _f = string_transform_udf(kinds[kind])
            words = [(w,) for k, w, _ in _MISCF_BATTERY if k == kind]
            frames.append(
                spark.createDataFrame(words, "word string").select(
                    F.lit(kind).alias("kind"), "word",
                    _f("word").alias("out"),
                )
            )
        out_df = frames[0]
        for f in frames[1:]:
            out_df = out_df.unionByName(f)
        return out_df.orderBy("kind", "word")

    out["misc_filter_terms"] = misc_filter_terms

    # Search-quality evaluation (benchmark/quality/QualityStats.java:28):
    # P@k / recall@k / AP / windowed MRR / nDCG per query over a
    # deterministic run (term-containment retrieval scored by
    # length(text) % 101) and judgments (doc_id % 5 == 0, double grade
    # on % 10); the oracle re-implements every metric in SQL windows
    def quality_eval(spark, sf):
        from lucene_spark.search.quality import quality_stats

        docs = _docs(spark, sf).select("doc_id", "text")
        frames = []
        for q in ("spark", "merge", "window"):
            frames.append(
                docs.filter(F.col("text").contains(q)).select(
                    F.lit(q).alias("query_id"),
                    "doc_id",
                    (F.length("text") % 101).cast("double").alias("score"),
                )
            )
        run = frames[0]
        for f in frames[1:]:
            run = run.unionByName(f)
        judg = run.filter(F.col("doc_id") % 5 == 0).select(
            "query_id",
            "doc_id",
            F.when(F.col("doc_id") % 10 == 0, F.lit(2))
            .otherwise(F.lit(1))
            .alias("grade"),
        )
        return quality_stats(run, judg, k=10).orderBy("query_id")

    out["quality_eval"] = quality_eval

    # Phonetic codecs (RefinedSoundex / Caverphone 2.0 / NYSIIS):
    # distributed encoding of the pinned battery
    def phonetic_codecs(spark, sf):
        from lucene_spark.analysis.miscfilters import string_transform_udf
        from lucene_spark.analysis.phonetic import (
            caverphone2,
            nysiis,
            refined_soundex,
        )

        fns = {"refined": refined_soundex, "caver2": caverphone2,
               "nysiis": nysiis}
        frames = []
        for kind in sorted(fns):
            words = [(w,) for k, w, _ in _PHON_BATTERY if k == kind]
            frames.append(
                spark.createDataFrame(words, "word string").select(
                    F.lit(kind).alias("kind"), "word",
                    string_transform_udf(fns[kind])("word").alias("code"),
                )
            )
        out_df = frames[0]
        for f in frames[1:]:
            out_df = out_df.unionByName(f)
        return out_df.orderBy("kind", "word")

    out["phonetic_codecs"] = phonetic_codecs

    # Double Metaphone (primary + alternate codes, max length 4)
    def double_metaphone_codes(spark, sf):
        from lucene_spark.analysis.doublemetaphone import (
            double_metaphone_udf,
        )

        words = [(w,) for w, _, _ in _DM_BATTERY]
        return (
            spark.createDataFrame(words, "word string")
            .select(
                "word",
                double_metaphone_udf(4)("word").alias("primary"),
                double_metaphone_udf(4, alternate=True)("word").alias(
                    "alternate"
                ),
            )
            .orderBy("word")
        )

    out["double_metaphone_codes"] = double_metaphone_codes

    # end-to-end French chain: index the pinned sentences with the
    # FrenchAnalyzer-analog (tokenize → stop → FrenchStemmer), BM25 on
    # the stem 'nation'; the oracle recomputes BM25 from the PINNED
    # stem lists so tokenizer+stop+stemmer drift all turn the gate red
    def french_term_topk(spark, sf):
        from lucene_spark.analysis.snowball import snowball_analyze

        key = ("french_sents", sf)
        if key not in _INDEX_CACHE:
            sents = F.array(*[F.lit(s) for s in _FR_SENTS])
            corpus = (
                _docs(spark, sf)
                .select("doc_id")
                .filter(F.col("doc_id") < 400)
                .select(
                    "doc_id",
                    F.element_at(
                        sents, (F.col("doc_id") % len(_FR_SENTS) + 1).cast("int")
                    ).alias("text"),
                )
            )
            _INDEX_CACHE[key] = InvertedIndex.build(
                corpus, analyzer=snowball_analyze("fr"), docs_per_segment=128
            )
        return bm25_topk_f64(_INDEX_CACHE[key], {"nation": 1.0}, k=20)

    out["french_term_topk"] = french_term_topk

    # PII scrub (pipeline/redact.py): deterministic PII-bearing text
    # synthesized from doc_id, masked by the JVM regex chain; a TRUE
    # differential — Spark's Java regex vs DuckDB's RE2 must produce
    # byte-identical masked text
    def pii_redact(spark, sf):
        from lucene_spark.pipeline.redact import redact_pii

        return _pii_dirty(_docs(spark, sf)).select(
            "doc_id", redact_pii(F.col("dirty")).alias("clean")
        )

    out["pii_redact"] = pii_redact

    def pii_count_audit(spark, sf):
        from lucene_spark.pipeline.redact import pii_counts

        return pii_counts(
            _pii_dirty(_docs(spark, sf)), text_col="dirty"
        ).select(
            F.col("n_email").cast("long").alias("n_email"),
            F.col("n_ssn").cast("long").alias("n_ssn"),
            F.col("n_ip").cast("long").alias("n_ip"),
            F.col("n_phone").cast("long").alias("n_phone"),
        )

    out["pii_count_audit"] = pii_count_audit

    # int8-quantized IVF (Lucene99 scalar quantization applied to the
    # IVF layout): probes rank by the quantized dot over the 1-byte
    # codes, exact float64 re-rank of the k·refine survivors. All
    # lists probed + a refine window covering the sf0.01 corpus makes
    # the result value-exact vs the brute-force cosine oracle.
    def embedding_ivf_quantized_topk(spark, sf):
        from lucene_spark.pipeline.similarity import (
            ivf_assign,
            ivf_quantize,
            ivf_quantized_topk,
        )

        assigned, cent = ivf_assign(_emb(spark, sf), n_lists=8, seed=7)
        q, bounds = ivf_quantize(assigned)
        return ivf_quantized_topk(
            q, cent, bounds, _qvec(spark, sf), k=15, n_probes=8, refine=40
        ).select(F.col("vec_id"), F.col("cos"))

    out["embedding_ivf_quantized_topk"] = embedding_ivf_quantized_topk

    # Association facets (facet/taxonomy/FloatAssociationFacetField.java:30):
    # children under the root ranked by the SUMMED per-doc association
    # (n_chars) instead of the count
    def association_facet(spark, sf):
        from lucene_spark.search.facets import association_children

        d = _docs(spark, sf).withColumn(
            "cat", F.concat_ws("/", F.col("lang"), F.col("source"))
        )
        return association_children(d, "cat", "n_chars", agg="sum").select(
            "child", F.round("assoc", 4).alias("assoc"), "cnt"
        )

    out["association_facet"] = association_facet

    # ToParentBlockJoin ScoreMode family (join/ScoreMode.java:20): the
    # same child query rolled up to parents under avg / max / total /
    # min, one row per mode per parent, top by score
    def block_join_score_modes(spark, sf):
        from lucene_spark.search.blockjoin import to_parent_block_join

        orders = spark.read.parquet(f"{sf}/orders.parquet")
        items = spark.read.parquet(f"{sf}/lineitem.parquet").filter(
            F.col("l_quantity") > 30
        )
        outs = []
        for mode in ("avg", "max", "total", "min"):
            j = to_parent_block_join(
                orders.select("o_orderkey"),
                items,
                "o_orderkey",
                "l_orderkey",
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                score_mode=mode,
            ).select(
                F.lit(mode).alias("mode"),
                "o_orderkey",
                F.round("score", 4).alias("score"),
                "n_children",
            )
            outs.append(
                j.orderBy(F.col("score").desc(), F.col("o_orderkey").asc()).limit(10)
            )
        res = outs[0]
        for o in outs[1:]:
            res = res.unionByName(o)
        return res

    out["block_join_score_modes"] = block_join_score_modes

    # LongPoint.newDistanceFeatureQuery (LongDistanceFeatureQuery.java:121):
    # recency boost over event timestamps, score = pivot/(pivot+|ts-origin|)
    def distance_feature_recency(spark, sf):
        from lucene_spark.search.distancefeature import long_distance_feature_topk

        # ts is TIMESTAMP_NTZ: micros-from-origin via timestampdiff is
        # timezone-free on both engines
        ev = _events(spark, sf).select(
            "event_id",
            F.expr(
                "timestampdiff(MICROSECOND, "
                "TIMESTAMP_NTZ '2024-01-15 00:00:00', ts)"
            ).alias("v"),
        )
        return long_distance_feature_topk(
            ev, "event_id", "v", origin=0, pivot=86_400_000_000, k=20
        )

    out["distance_feature_recency"] = distance_feature_recency

    # LatLonPoint.newDistanceFeatureQuery
    # (LatLonPointDistanceFeatureQuery.java:130)
    def distance_feature_geo(spark, sf):
        from lucene_spark.search.distancefeature import geo_distance_feature_topk

        return geo_distance_feature_topk(
            _geo_points(spark, sf), 48.8566, 2.3522, pivot_m=500_000.0, k=20
        )

    out["distance_feature_geo"] = distance_feature_geo

    # distance feature as a SHOULD clause next to a BM25 query (the
    # recommended recency-boost composition): union of match sets,
    # sum of clause scores
    def distance_boosted(spark, sf):
        from lucene_spark.search.distancefeature import distance_boosted_topk
        from lucene_spark.search.parity import _bm25_scored_f64

        idx = _index(spark, sf)
        scored = _bm25_scored_f64(idx, {"hash": 1.0, "merge": 0.7})
        feature = _docs(spark, sf).select("doc_id", "n_chars")
        return distance_boosted_topk(
            scored, feature, "n_chars", origin=300.0, pivot=50.0, k=15
        )

    out["distance_boosted"] = distance_boosted

    # FloatVectorSimilarityQuery (AbstractVectorSimilarityQuery.java:54):
    # radius query on the unit-scaled cosine score
    def vector_similarity(spark, sf):
        from lucene_spark.search.knn import vector_similarity_match

        return vector_similarity_match(
            _emb(spark, sf), _qvec(spark, sf), result_similarity=0.6
        )

    out["vector_similarity"] = vector_similarity

    # DiversifyingChildrenFloatKnnVectorQuery
    # (join/DiversifyingChildrenFloatKnnVectorQuery.java:56): best child
    # per parent, top-k diverse children
    def diversifying_knn(spark, sf):
        from lucene_spark.search.knn import diversifying_children_topk

        children = _emb(spark, sf).withColumn(
            "parent_id", F.expr("vec_id DIV 8")
        )
        return diversifying_children_topk(children, _qvec(spark, sf), k=10)

    out["diversifying_knn"] = diversifying_knn

    # IndexWriter.updateNumericDocValue (DocValuesUpdate.java:105):
    # stacked term-matched updates, last wins, scored through
    # FunctionScoreQuery without reindexing
    def dv_update_score(spark, sf):
        from lucene_spark.index.dvupdates import DocValuesUpdates
        from lucene_spark.search.functionscore import function_score_topk
        from lucene_spark.search.parity import _decode_postings

        idx = _index(spark, sf)
        base = _docs(spark, sf).select(
            "doc_id", ((F.col("doc_id") % 7) + 1).cast("double").alias("w")
        )
        m1 = _decode_postings(idx, ["merge"]).select("doc_id").distinct()
        m2 = _decode_postings(idx, ["vector"]).select("doc_id").distinct()
        dv = (
            DocValuesUpdates(base)
            .update_numeric(m1, "w", 10.0)
            .update_numeric(m2, "w", 3.0)
        )
        return function_score_topk(
            idx, {"hash": 1.0}, dv.resolved(), F.col("w"), mode="multiply", k=15
        )

    out["dv_update_score"] = dv_update_score

    # Gopher/C4 repetition signals (LLM-curation pillar): one
    # shuffle-free Arrow pass per doc
    def repetition(spark, sf):
        from lucene_spark.pipeline.repetition import repetition_signals

        d = _docs(spark, sf).filter(F.col("doc_id") < 500)
        return repetition_signals(d, line_tokens=3)

    out["repetition_signals"] = repetition

    # PhoneticFilter + Soundex (analysis/phonetic/PhoneticFilter.java:33):
    # docs containing a token that SOUNDS like the query
    def phonetic(spark, sf):
        from lucene_spark.analysis.phonetic import phonetic_match

        return (
            phonetic_match(_docs(spark, sf), "sparc")
            .orderBy("doc_id")
            .limit(300)
        )

    out["phonetic_match"] = phonetic

    # soundex code groups over the corpus vocabulary
    def soundex_terms(spark, sf):
        from lucene_spark.analysis.phonetic import soundex_col

        toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        tok = _docs(spark, sf).select(
            "doc_id", F.explode(toks).alias("term")
        )
        return (
            tok.withColumn("code", soundex_col(F.col("term")))
            .groupBy("code")
            .agg(
                F.countDistinct("term").alias("n_terms"),
                F.countDistinct("doc_id").alias("n_docs"),
            )
            .orderBy("code")
        )

    out["soundex_terms"] = soundex_terms

    # LongRangeFacetCounts with OVERLAPPING ranges
    # (facet/range/LongRangeFacetCounts.java:47)
    def long_range_facets(spark, sf):
        from lucene_spark.search.facets import long_range_counts

        return long_range_counts(
            _events(spark, sf),
            "value",
            [
                ("low", 0.0, 100.0),
                ("mid", 50.0, 250.0),
                ("high", 200.0, True, 500.0, True),
                ("all", 0.0, True, 500.0, True),
            ],
        )

    out["long_range_facets"] = long_range_facets

    # the expressions language (expressions/js/JavascriptCompiler.java,
    # grammar Javascript.g4): parsed once, emitted as a codegen'd Spark
    # SQL expression — ternary, comparisons, bitwise, function registry
    _JS_SRC = (
        "sqrt(n_chars) + 10 * (n_chars > 300) "
        "+ min(doc_id % 7, 3) + ((doc_id & 12) >> 2)"
    )

    def js_expression_topk(spark, sf):
        from lucene_spark.search.expressions import compile_expression

        c = compile_expression(_JS_SRC, {"n_chars": "n_chars", "doc_id": "doc_id"})
        return (
            _docs(spark, sf)
            .select("doc_id", c.column().alias("_s"))
            .orderBy(F.col("_s").desc(), F.col("doc_id").asc())
            .limit(15)
            .select("doc_id", F.round("_s", 4).alias("score"))
        )

    out["js_expression_topk"] = js_expression_topk

    # ExpressionRescorer (expressions/ExpressionRescorer.java): the
    # expression reads the wrapped query's score via the _score binding
    def js_expression_rescore(spark, sf):
        from lucene_spark.search.expressions import compile_expression
        from lucene_spark.search.parity import _bm25_scored_f64

        c = compile_expression(
            "_score * 2 + ln(n_chars + 1) - (_score > 3)",
            {"_score": "s", "n_chars": "n_chars"},
        )
        scored = _bm25_scored_f64(_index(spark, sf), {"hash": 1.0, "scan": 0.5})
        joined = scored.join(_docs(spark, sf).select("doc_id", "n_chars"), "doc_id")
        return (
            joined.select("doc_id", c.column().alias("_s"))
            .orderBy(F.col("_s").desc(), F.col("doc_id").asc())
            .limit(15)
            .select("doc_id", F.round("_s", 4).alias("score"))
        )

    out["js_expression_rescore"] = js_expression_rescore

    # C4 document-cleaning heuristics over deterministically
    # synthesized "webby" text (same construction in the oracle —
    # the flat token corpus has no lines/punctuation of its own)
    def c4_filters(spark, sf):
        from lucene_spark.pipeline.textstats import c4_quality_signals

        d = _docs(spark, sf).filter(F.col("doc_id") < 400)
        web = d.select(
            "doc_id",
            F.concat(
                F.expr("replace(text, ' table ', '\n')"),
                F.when(F.col("doc_id") % 5 == 0, F.lit(" lorem ipsum dolor."))
                .when(F.col("doc_id") % 5 == 1, F.lit(" function() { return 1; }"))
                .when(F.col("doc_id") % 5 == 2, F.lit("."))
                .when(F.col("doc_id") % 5 == 3, F.lit(" no punctuation here"))
                .otherwise(F.lit(". done. and more.")),
            ).alias("text"),
        )
        return c4_quality_signals(web)

    out["c4_filters"] = c4_filters

    # RandomSamplingFacetsCollector: facet counts over a deterministic
    # sample of the hit set, amortized back by 1/rate
    def sampled_facets(spark, sf):
        from lucene_spark.search.facets import sampled_facet_counts

        return sampled_facet_counts(
            _docs(spark, sf), "lang", fraction=0.25, seed=5
        )

    out["sampled_facets"] = sampled_facets

    # --- classification (reference `classification` module):
    # SimpleNaiveBayesClassifier posteriors + KNearestNeighborClassifier
    def nb_classifier(spark, sf):
        from lucene_spark.search.classify import naive_bayes_classes

        return naive_bayes_classes(
            _docs(spark, sf), ["hash", "join", "hash", "spark"]
        )

    out["nb_classifier"] = nb_classifier

    def knn_classifier(spark, sf):
        from lucene_spark.search.classify import knn_classify

        return knn_classify(
            _index(spark, sf), _docs(spark, sf), {"hash": 1.0, "join": 1.0}, k=20
        )

    out["knn_classifier"] = knn_classifier

    # JoinUtil ScoreModes (join/ScoreMode.java): from-side scores
    # folded per join value (Max/Total/Min/Avg), broadcast to the
    # to-side scan; top-5 per mode
    def join_util_score_modes(spark, sf):
        from lucene_spark.search.joinutil import join_query

        cust = spark.read.parquet(f"{sf}/customer.parquet").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        supp = spark.read.parquet(f"{sf}/supplier.parquet")
        parts = []
        for mode in ("max", "total", "min", "avg"):
            j = join_query(cust, "c_nationkey", "c_acctbal", supp, "s_nationkey", mode)
            parts.append(
                j.select(
                    F.lit(mode).alias("mode"), "s_suppkey", F.col("join_score")
                )
                .orderBy(F.col("join_score").desc(), F.col("s_suppkey").asc())
                .limit(5)
            )
        out_df = parts[0]
        for p in parts[1:]:
            out_df = out_df.unionAll(p)
        return out_df

    out["join_util_score_modes"] = join_util_score_modes

    # training-data decontamination: word 3-gram overlap of a training
    # slice against an "eval benchmark" slice (any collision flags)
    def contamination_check(spark, sf):
        from lucene_spark.pipeline.contamination import ngram_contamination

        d = _docs(spark, sf)
        return ngram_contamination(
            d.filter(F.col("doc_id") < 400),
            d.filter(F.col("doc_id") % 40 == 0),
            n=3,
        )

    out["contamination_check"] = contamination_check

    # CommonTermsQuery: df-split boolean — rare terms gate the match,
    # stop-like terms only add score
    def common_terms_topk_gate(spark, sf):
        from lucene_spark.search.commonterms import common_terms_topk

        return common_terms_topk(
            _index(spark, sf), ["dup", "hash", "batch"], max_term_frequency=0.5, k=20
        )

    out["common_terms_topk"] = common_terms_topk_gate

    # MultiRangeQuery: union of point ranges in one scan
    def multi_range(spark, sf):
        from lucene_spark.search.rangefield import multi_range_match

        return (
            multi_range_match(
                _events(spark, sf),
                "value",
                [(0.0, 50.0), (40.0, 120.0), (400.0, 450.0)],
            )
            .select("event_id")
            .orderBy("event_id")
            .limit(1000)
        )

    out["multi_range"] = multi_range

    # TermAutomatonQuery: "(hash|merge) <any> scan" automaton over the
    # position stream; freq = distinct accepted start positions
    def term_automaton(spark, sf):
        from lucene_spark.search.termautomaton import (
            TermAutomaton,
            doc_position_frame,
            term_automaton_freqs,
        )

        a = TermAutomaton()
        s1, s2, s3 = a.create_state(), a.create_state(), a.create_state()
        a.add_transition(0, s1, "hash")
        a.add_transition(0, s1, "merge")
        a.add_any_transition(s1, s2)
        a.add_transition(s2, s3, "scan")
        a.set_accept(s3)
        return term_automaton_freqs(
            doc_position_frame(_docs(spark, sf)), a
        ).orderBy("doc_id")

    out["term_automaton"] = term_automaton

    # UnifiedHighlighter maxPassages: top-2 ranked windows per doc
    def top_passages(spark, sf):
        from lucene_spark.search.highlight import best_passages

        return (
            best_passages(
                _docs(spark, sf), ["hash", "join"], window=8, quantize=6, n_passages=2
            )
            .orderBy(F.col("doc_id").asc(), F.col("passage_rank").asc())
            .limit(60)
        )

    out["top_passages"] = top_passages

    # LatLonShape newPolygonQuery: the same synthetic shapes related
    # to a literal query polygon (vertices off the 1/8° data grid)
    def shape_polygon_relations(spark, sf):
        from lucene_spark.search.shape import (
            line_polygon_relation,
            polygon_polygon_relation,
        )

        d = (
            _docs(spark, sf)
            .select("doc_id")
            .filter(F.col("doc_id") < 400)
            .withColumn(
                "lats",
                F.expr(
                    "transform(sequence(0, 3), j -> "
                    "((doc_id * 37 + j * 59) % 40) / 8.0 - 2.5)"
                ),
            )
            .withColumn(
                "lons",
                F.expr(
                    "transform(sequence(0, 3), j -> "
                    "((doc_id * 23 + j * 83) % 40) / 8.0 - 2.5)"
                ),
            )
        )
        return d.agg(
            F.sum(
                line_polygon_relation("lats", "lons", _QPOLY, "intersects").cast("long")
            ).alias("line_intersects"),
            F.sum(
                line_polygon_relation("lats", "lons", _QPOLY, "within").cast("long")
            ).alias("line_within"),
            F.sum(
                line_polygon_relation("lats", "lons", _QPOLY, "disjoint").cast("long")
            ).alias("line_disjoint"),
            F.sum(
                polygon_polygon_relation("lats", "lons", _QPOLY, "intersects").cast(
                    "long"
                )
            ).alias("poly_intersects"),
        )

    out["shape_polygon_relations"] = shape_polygon_relations

    # Luke-style per-segment overview (SegmentInfos / CheckIndex
    # "segments" report): pure metadata aggregation over the blocks
    # table — no posting decode; the oracle recomputes every number
    # from the raw corpus (segment = doc_id // docs_per_segment)
    def segments_info(spark, sf):
        idx = _index(spark, sf)
        posting = idx.blocks.groupBy("segment_id").agg(
            F.countDistinct("term").alias("n_terms"),
            F.sum(F.col("num_docs").cast("long")).alias("sum_doc_freq"),
            F.sum("sum_freq").alias("sum_tf"),
        )
        dps = int(idx.docs_per_segment)
        norms = (
            idx.norms.select(
                (F.col("doc_id") / F.lit(dps)).cast("long").alias("segment_id")
            )
            .groupBy("segment_id")
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )
        return (
            posting.join(norms, "segment_id")
            .select("segment_id", "n_docs", "n_terms", "sum_doc_freq", "sum_tf")
            .orderBy("segment_id")
        )

    out["segments_info"] = segments_info

    # BM25NBClassifier: NB whose prior/likelihoods are top-1 BM25
    # scores (class-field BM25 collapses to idf_c/(1+k1))
    def bm25_nb_classifier(spark, sf):
        from lucene_spark.search.classify import bm25_nb_classes

        return bm25_nb_classes(_docs(spark, sf), ["hash", "join", "hash", "spark"])

    out["bm25_nb_classifier"] = bm25_nb_classifier

    # WordBreakSpellChecker: split 'hashjoin' wherever both halves are
    # dictionary terms (a 7-row candidate probe joined twice)
    def word_break(spark, sf):
        from lucene_spark.search.suggest import word_break_suggest

        return word_break_suggest(_index(spark, sf), "hashjoin", k=10)

    out["word_break"] = word_break

    # --- commit points: point-in-time reader over an older generation
    # (SegmentInfos generations + DirectoryReader.open(IndexCommit) +
    # SnapshotDeletionPolicy; index/commits.py). Gen 0 commits the
    # even-doc_id half of the corpus, gen 1 the full corpus; opening
    # generation 0 must score exactly like a fresh index over the
    # filtered corpus — that is what an immutable commit point means.
    def commit_point_search(spark, sf):
        import tempfile

        from lucene_spark.index import IndexCommits

        if sf not in _COMMIT_CACHE:
            root = tempfile.mkdtemp(prefix="lucene_spark_commits_")
            commits = IndexCommits(spark, root, keep_last=4)
            docs = _docs(spark, sf)
            old = InvertedIndex.build(
                docs.filter(F.col("doc_id") % 2 == 0),
                analyzer="simple",
                docs_per_segment=2048,
            )
            g0 = commits.commit(old, user_data={"source": "even-half"})
            commits.snapshot(g0)  # pin the point-in-time view
            old.unpersist()
            commits.commit(_index(spark, sf), user_data={"source": "full"})
            _COMMIT_CACHE[sf] = commits
        idx0 = _COMMIT_CACHE[sf].open(generation=0)
        return bm25_topk_f64(idx0, {"spark": 1.0, "query": 1.0}, k=15)

    out["commit_point_search"] = commit_point_search

    # --- PhraseWildcardQuery (sandbox): "hash jo*" — phrase with a
    # prefix-expanded slot, freq = exact-phrase alignments
    def phrase_wildcard(spark, sf):
        from lucene_spark.search.positional import phrase_wildcard_freqs

        return (
            phrase_wildcard_freqs(_index(spark, sf), ["hash", PrefixQuery("jo")])
            .select("doc_id", F.col("freq").cast("double").alias("freq"))
            .orderBy("doc_id")
            .limit(500)
        )

    out["phrase_wildcard"] = phrase_wildcard

    # --- misc module analogs (HighFreqTerms / DocValuesStats /
    # DiversifiedTopDocsCollector), sandbox profiler + dynamic ranges,
    # MemoryIndex percolation scoring
    out["high_freq_terms"] = lambda spark, sf: (
        high_freq_terms(_index(spark, sf).terms, 10, order="total_term_freq")
    )

    out["doc_values_stats"] = lambda spark, sf: doc_values_stats(
        _docs(spark, sf)
        .filter(F.array_contains(F.split(F.col("text"), " "), "hash"))
        .withColumn(
            "v",
            F.when(F.col("doc_id") % 5 == 0, F.lit(None)).otherwise(
                F.col("n_chars")
            ),
        ),
        "v",
    )

    def diversified(spark, sf):
        from lucene_spark.search.parity import _bm25_scored_f64

        scored = _bm25_scored_f64(_index(spark, sf), {"hash": 1.0, "spark": 0.7})
        keyed = scored.join(
            _docs(spark, sf).select("doc_id", "lang"), "doc_id"
        )
        return diversified_topk(keyed, "lang", max_per_key=2, k=10).select(
            "doc_id", "lang", F.round(F.col("s"), 4).alias("score")
        )

    out["diversified_topk"] = diversified

    out["dynamic_range_facets"] = lambda spark, sf: dynamic_range_facets(
        _docs(spark, sf).withColumn("w", F.col("doc_id") % 7 + 1),
        "n_chars",
        "w",
        top_n=6,
    )

    out["memory_index_scores"] = lambda spark, sf: memory_index_scores(
        _docs(spark, sf), {"hash": 1.0, "spark": 0.5}, k=10
    )

    def query_profile(spark, sf):
        q = BooleanQuery.of(
            BooleanClause(TermQuery("hash"), Occur.MUST),
            BooleanClause(TermQuery("spark"), Occur.SHOULD),
            BooleanClause(TermQuery("scan"), Occur.MUST_NOT),
        )
        return profile_df(IndexSearcher(_index(spark, sf)), q)

    out["query_profile"] = query_profile

    # --- BPIndexReorderer: graph-bisection docID reassignment must be
    # search-invariant — BM25 top-k on the reordered index, mapped back
    # through orig_doc_id, equals the plain oracle (scores depend only
    # on per-doc stats, which a permutation preserves)
    def bp_reorder_topk(spark, sf):
        from lucene_spark.index.bp import bp_reorder
        from lucene_spark.search.parity import _bm25_scored_f64

        if sf not in _BP_CACHE:
            reordered = bp_reorder(_docs(spark, sf), num_partitions=8)
            idx = InvertedIndex.build(
                reordered, analyzer="simple", docs_per_segment=2048
            )
            idmap = reordered.select("doc_id", "orig_doc_id")
            _BP_CACHE[sf] = (idx, idmap)
        idx, idmap = _BP_CACHE[sf]
        scored = _bm25_scored_f64(idx, {"hash": 1.0, "join": 0.5})
        return (
            scored.join(idmap, "doc_id")
            .orderBy(F.col("s").desc(), F.col("orig_doc_id").asc())
            .limit(15)
            .select(
                F.col("orig_doc_id").alias("doc_id"),
                F.round(F.col("s"), 4).alias("score"),
            )
        )

    out["bp_reorder_topk"] = bp_reorder_topk

    # --- MultiPassIndexSplitter: the parts must cover the corpus
    # exactly once — per-part docFreqs sum to the whole-corpus docFreqs
    def multi_pass_split_stats(spark, sf):
        from lucene_spark.index.splitter import multi_pass_split

        parts = multi_pass_split(
            _docs(spark, sf), 3, analyzer="simple", docs_per_segment=2048
        )
        union = parts[0].terms
        for p in parts[1:]:
            union = union.unionByName(p.terms)
        return (
            union.groupBy("term")
            .agg(
                F.sum("doc_freq").alias("doc_freq"),
                F.sum("total_term_freq").alias("total_term_freq"),
            )
            .orderBy(F.col("doc_freq").desc(), F.col("term").asc())
            .limit(10)
        )

    out["multi_pass_split_stats"] = multi_pass_split_stats

    # --- NRT replication: a synced replica must answer queries
    # identically to the primary commit it copied
    def replica_search(spark, sf):
        import tempfile

        from lucene_spark.index.commits import IndexCommits
        from lucene_spark.index.replicator import PrimaryNode, ReplicaNode

        if sf not in _REPLICA_CACHE:
            proot = tempfile.mkdtemp(prefix="lucene_spark_primary_")
            rroot = tempfile.mkdtemp(prefix="lucene_spark_replica_")
            commits = IndexCommits(spark, proot, keep_last=1)
            commits.commit(_index(spark, sf))
            replica = ReplicaNode(rroot)
            replica.sync(PrimaryNode(commits))
            _REPLICA_CACHE[sf] = replica.open(spark)
        return bm25_topk_f64(
            _REPLICA_CACHE[sf], {"merge": 1.0, "scan": 0.5}, k=15
        )

    out["replica_search"] = replica_search

    # --- exact-substring duplication (Lee et al. 2022): cross-doc
    # repeated token 8-grams + per-doc duplicated-start fraction
    def repeated_ngrams_gate(spark, sf):
        from lucene_spark.pipeline.substrings import repeated_ngrams

        return repeated_ngrams(_docs(spark, sf), n=8, min_docs=2).limit(25)

    out["repeated_ngrams"] = repeated_ngrams_gate

    def dup_span_starts(spark, sf):
        from lucene_spark.pipeline.substrings import duplicated_span_starts

        return duplicated_span_starts(_docs(spark, sf), n=8, min_docs=2).limit(
            25
        )

    out["dup_span_starts"] = dup_span_starts

    # --- maximal duplicated spans (Lee et al. span semantics): merge
    # adjacent duplicated gram starts into intervals, coverage =
    # |union of [p, p+n)| / tokens (pipeline/substrings.py:duplicated_spans)
    def dup_span_coverage(spark, sf):
        from lucene_spark.pipeline.substrings import duplicated_spans

        return duplicated_spans(_docs(spark, sf), n=8, min_docs=2).limit(25)

    out["dup_span_coverage"] = dup_span_coverage

    # --- HTMLStripCharFilter analog (HTMLStripCharFilter.java:39): wrap
    # each doc's text in Common-Crawl-style page markup (entity-encoding
    # the text), strip with the pure-codegen tier, and prove the
    # north-rule invariant — extracted text is byte-identical to the
    # source text — via octet length + md5 + an explicit equality flag
    def html_strip_text(spark, sf):
        from lucene_spark.analysis.htmlstrip import html_strip_col

        d = _docs(spark, sf).filter(F.col("doc_id") < 400)
        enc = F.replace(
            F.replace(
                F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
                F.lit("<"),
                F.lit("&lt;"),
            ),
            F.lit(">"),
            F.lit("&gt;"),
        )
        html = F.concat(
            F.lit(
                '<html><head><title></title><script type="text/javascript">'
                'if (1<2) { var s = "<p>"; }</script>'
                "<style>p > a { color: red }</style></head>"
                '<body><!-- header --><div class="nav"><a href="/">Home</a>'
                ' | <a href="/about">About</a></div><p>'
            ),
            enc,
            F.lit("</p><br/></body></html>"),
        )
        ext = html_strip_col(html)
        expected = F.concat(
            F.lit("\nHome | About\n"), F.col("text"), F.lit("\n\n")
        )
        return d.select(
            "doc_id",
            F.octet_length(ext).alias("n_bytes"),
            F.md5(F.encode(ext, "UTF-8")).alias("text_md5"),
            (ext == expected).cast("int").alias("byte_identical"),
        ).orderBy("doc_id")

    out["html_strip_text"] = html_strip_text

    # --- Boilerplate removal (jusText/Boilerpipe block classifier,
    # pipeline/boilerplate.py): synthesize a page per doc with nav
    # chrome, the doc text as the content block, a short block, and a
    # link-dense footer; both engines run the FULL block-segmentation +
    # link-density classification independently
    def boilerplate_extract(spark, sf):
        from lucene_spark.pipeline.boilerplate import extract_main_content

        d = _docs(spark, sf).filter(F.col("doc_id") < 400)
        enc = F.replace(
            F.replace(
                F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
                F.lit("<"),
                F.lit("&lt;"),
            ),
            F.lit(">"),
            F.lit("&gt;"),
        )
        html = F.concat(
            F.lit(
                '<html><body><div class="nav"><a href="/">Home</a> '
                '<a href="/about">About</a> <a href="/contact">Contact</a>'
                "</div><p>"
            ),
            enc,
            F.lit(
                '</p><div>Copyright 2026 <a href="/legal">Legal</a> '
                '<a href="/privacy">Privacy</a></div></body></html>'
            ),
        )
        out_df = extract_main_content(d.withColumn("page_html", html),
                                      html_col="page_html")
        return out_df.select(
            "doc_id",
            "n_blocks",
            "n_kept",
            F.octet_length("content").alias("n_bytes"),
            F.md5(F.encode("content", "UTF-8")).alias("content_md5"),
        ).orderBy("doc_id")

    out["boilerplate_extract"] = boilerplate_extract

    # --- WARC source round trip (sources/warc.py, ISO 28500): build
    # real WARC/1.0 response records in pure SQL (Content-Length is the
    # UTF-8 octet count, so multi-byte text exercises byte slicing),
    # parse them back with the connector's record parser, and prove the
    # archived page bytes come back byte-identical
    def warc_roundtrip(spark, sf):
        from pyspark.sql.types import (
            StringType,
            StructField,
            StructType,
        )
        from lucene_spark.sources.warc import parse_warc_records

        d = _docs(spark, sf).filter(F.col("doc_id") < 400)
        enc = F.replace(
            F.replace(
                F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
                F.lit("<"),
                F.lit("&lt;"),
            ),
            F.lit(">"),
            F.lit("&gt;"),
        )
        html = F.concat(F.lit("<p>"), enc, F.lit("</p>"))
        url = F.concat(F.lit("http://example.com/doc/"),
                       F.col("doc_id").cast("string"))
        http = F.concat(
            F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                  "Content-Length: "),
            F.octet_length(html).cast("string"),
            F.lit("\r\n\r\n"),
            html,
        )
        rec = F.concat(
            F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
            url,
            F.lit("\r\nWARC-Date: 2026-01-01T00:00:00Z\r\nContent-Type: "
                  "application/http; msgtype=response\r\nContent-Length: "),
            F.octet_length(http).cast("string"),
            F.lit("\r\n\r\n"),
            http,
            F.lit("\r\n\r\n"),
        )

        parsed_t = StructType([
            StructField("url", StringType()),
            StructField("ts", StringType()),
            StructField("payload", StringType()),
        ])

        @F.pandas_udf(parsed_t)
        def _parse(s):
            import pandas as pd

            def one(raw):
                recs = list(parse_warc_records(raw.encode("utf-8")))
                if len(recs) != 1:
                    return ("", "", "")
                rt, u, ts, status, ct, payload = recs[0]
                if rt != "response" or status != 200:
                    return ("", "", "")
                return (u, ts, payload.decode("utf-8"))

            return pd.DataFrame(
                [one(x) for x in s], columns=["url", "ts", "payload"]
            )

        p = d.select("doc_id", url.alias("url"), html.alias("html"),
                     _parse(rec).alias("p"))
        return p.select(
            "doc_id",
            (F.col("p.url") == F.col("url")).cast("int").alias("url_ok"),
            (F.col("p.ts") == F.lit("2026-01-01T00:00:00Z"))
            .cast("int").alias("ts_ok"),
            (F.col("p.payload") == F.col("html")).cast("int")
            .alias("byte_identical"),
            F.md5(F.encode("p.payload", "UTF-8")).alias("html_md5"),
        ).orderBy("doc_id")

    out["warc_roundtrip"] = warc_roundtrip

    # --- DictionaryCompoundWordTokenFilter analog
    # (DictionaryCompoundWordTokenFilter.java:43): the reference's own
    # Swedish test battery, decompounded distributed, order-preserving
    def decompound_terms(spark, sf):
        from lucene_spark.analysis.compound import decompound_udf

        se_dict = ["Bil", "Dörr", "Motor", "Tak", "Borr", "Slag",
                   "Hammar", "Pelar", "Glas", "Ögon", "Fodral", "Bas",
                   "Fiol", "Makare", "Gesäll", "Sko", "Vind", "Rute",
                   "Torkare", "Blad"]
        words = ["Bildörr", "Bilmotor", "Slagborr", "Hammarborr",
                 "Glasögonfodral", "Basfiolsfodral",
                 "Basfiolsfodralmakaregesäll", "Skomakare",
                 "Vindrutetorkare", "Vindrutetorkarblad", "abba"]
        df = spark.createDataFrame([(w,) for w in words], "word string")
        return (
            df.select(
                "word",
                F.posexplode(decompound_udf(se_dict)("word"))
                .alias("ord", "part"),
            )
            .orderBy("word", "ord")
        )

    out["decompound_terms"] = decompound_terms

    # --- PathHierarchyTokenizer analog (PathHierarchyTokenizer.java:35)
    # as a pure-Column HOF projection: synthesize a 3-level URL path per
    # doc, expand every hierarchy prefix, facet-count by prefix — the
    # oracle derives the same three levels arithmetically
    def path_prefix_facets(spark, sf):
        from lucene_spark.analysis.path import path_prefixes_col

        d = _docs(spark, sf).filter(F.col("doc_id") < 2000)
        path = F.concat(
            F.lit("/cat"), (F.col("doc_id") % 5).cast("string"),
            F.lit("/sub"), (F.col("doc_id") % 7).cast("string"),
            F.lit("/item"), F.col("doc_id").cast("string"),
        )
        return (
            d.select(F.explode(path_prefixes_col(path)).alias("prefix"))
            .groupBy("prefix")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") >= 2)  # depth-3 singletons stay out
            .orderBy(F.col("cnt").desc(), F.col("prefix").asc())
        )

    out["path_prefix_facets"] = path_prefix_facets

    # --- Hunspell dictionary stemming (hunspell/Dictionary.java:77,
    # Stemmer.java): a compact English-ish .aff/.dic, every surface
    # form stemmed distributed; the oracle pins hand-derived roots
    def hunspell_stems(spark, sf):
        from lucene_spark.analysis.hunspell import hunspell_stem_udf

        words = [w for w, _ in _HUNSPELL_BATTERY]
        df = spark.createDataFrame([(w,) for w in words], "word string")
        return (
            df.select(
                "word",
                hunspell_stem_udf(_HUNSPELL_AFF, _HUNSPELL_DIC)("word")
                .alias("stem"),
            )
            .orderBy("word")
        )

    out["hunspell_stems"] = hunspell_stems

    # --- WordDelimiterGraphFilter core splits over deterministic
    # mixed-case/product-code tokens synthesized from doc_id
    def word_delimiter_terms(spark, sf):
        from lucene_spark.analysis.filters import word_delimiter_parts

        raw = F.concat(
            F.lit("WiFi-Prod"),
            (F.col("doc_id") % 50).cast("string"),
            F.lit("X HTTPServer"),
            (F.col("doc_id") % 10).cast("string"),
        )
        toks = _docs(spark, sf).select(
            F.explode(F.split(raw, " ")).alias("t")
        )
        return (
            toks.select(
                F.explode(word_delimiter_parts(F.col("t"))).alias("term")
            )
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("term").asc())
            .limit(30)
        )

    out["word_delimiter_terms"] = word_delimiter_terms

    # --- CommonGramsFilter: stopword-adjacent bigrams
    def common_grams_top(spark, sf):
        from lucene_spark.analysis.filters import common_grams

        toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
        return (
            _docs(spark, sf)
            .select(
                F.explode(common_grams(toks, ["the", "a"])).alias("gram")
            )
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("gram").asc())
            .limit(20)
        )

    out["common_grams_top"] = common_grams_top

    # --- leading wildcard (*er): dictionary-driven multi-term route
    out["leading_wildcard_topk"] = lambda spark, sf: _const_score_docs(
        spark, sf, WildcardQuery("*er"), k=100
    )

    # --- HeatmapFacetCounter analog (spatial-extras/prefix/
    # HeatmapFacetCounter.java:40): level-4 quad grid (22.5 x 11.25 deg
    # cells) over the deterministic geo points; one partially-aggregated
    # groupBy on codegen'd cell ids — the oracle consumes the SAME
    # emitted cell arithmetic
    def heatmap_facets(spark, sf):
        from lucene_spark.search.heatmap import heatmap_counts

        return heatmap_counts(
            _geo_points(spark, sf), -60.0, 70.0, -150.0, 160.0, level=4
        ).orderBy("grid_x", "grid_y")

    out["heatmap_facets"] = heatmap_facets

    # --- early-terminated sorted top-k (TopFieldCollector.
    # canEarlyTerminate, search/TopFieldCollector.java:147 +
    # index/Sorter.java:34): docID == sort rank, so top-k is a
    # partition-pruning docID bound — segments past the bound are never
    # opened (the distributed early termination)
    def sorted_early_topk(spark, sf):
        import os
        import tempfile

        from lucene_spark.index.sorting import (
            early_terminated_topk,
            save_sorted,
            sort_docs,
        )

        if sf not in _SORTED_STORE_CACHE:
            path = os.path.join(
                tempfile.mkdtemp(prefix="lucene_spark_sorted_"), "docs_by_chars"
            )
            s = sort_docs(
                _docs(spark, sf),
                [F.col("n_chars").desc(), F.col("orig_doc_id")],
            )
            save_sorted(s, path, docs_per_segment=128)
            _SORTED_STORE_CACHE[sf] = path
        return early_terminated_topk(spark, _SORTED_STORE_CACHE[sf], k=12).select(
            F.col("orig_doc_id").alias("doc_id"), "n_chars"
        )

    out["sorted_early_topk"] = sorted_early_topk

    # --- IVF-PQ (faiss "IVF8,PQ8" factory leg, sandbox/codecs/faiss/
    # FaissKnnVectorsFormat.java:59; Jegou et al. TPAMI 2011): all 8
    # lists probed + generous ADC shortlist + exact float re-rank ==
    # brute force (the tight-budget regime is recall-tested in pytest)
    def embedding_ivfpq_topk(spark, sf):
        from lucene_spark.pipeline.similarity import (
            ivf_assign,
            ivf_pq_topk,
            pq_encode,
            pq_train,
        )

        emb = _emb(spark, sf)
        assigned, cent = ivf_assign(emb, n_lists=8, seed=7)
        books = pq_train(emb, m=8, ksub=32, seed=7)
        coded = pq_encode(assigned, books)
        return ivf_pq_topk(
            coded, cent, books, _qvec(spark, sf), k=15, n_probes=8, refine=20
        )

    out["embedding_ivfpq_topk"] = embedding_ivfpq_topk

    # --- BooleanPerceptronClassifier (classification/BooleanPerceptron
    # Classifier.java:60): epoch-0 decision function (weights = corpus
    # totalTermFreq, bias = avg doc length); the sequential training
    # pass is fixture-pinned in tests/test_classify_ext.py
    def perceptron_classify(spark, sf):
        from lucene_spark.search.classify import (
            perceptron_assign,
            perceptron_init,
        )

        docs = _docs(spark, sf)
        w0, bias = perceptron_init(docs)
        return (
            perceptron_assign(docs, w0, bias)
            .filter(F.col("doc_id") < 150)
            .withColumn("score", F.round("score", 6))
            .orderBy("doc_id")
        )

    out["perceptron_classify"] = perceptron_classify

    # --- KNearestFuzzyClassifier (classification/KNearestFuzzy
    # Classifier.java:46): FuzzyLikeThis retrieval + the kNN class fold
    def knn_fuzzy_classifier(spark, sf):
        from lucene_spark.search.classify import knn_fuzzy_classify

        return knn_fuzzy_classify(
            _index(spark, sf),
            _docs(spark, sf),
            ["merg", "jon"],
            k=15,
            max_edits=1,
            prefix_length=1,
        )

    out["knn_fuzzy_classifier"] = knn_fuzzy_classifier

    # --- prefix-tree shape grid (spatial-extras/prefix/RecursivePrefix
    # TreeStrategy.java:45): adaptive-level cell cover -> probe-set
    # semi-join -> exact refine; results identical to the full scan
    # (the grid is a pure pre-filter), which is what the oracle checks
    def shape_grid_query(spark, sf):
        from lucene_spark.search.shapegrid import (
            shape_grid_box_query,
            shape_grid_cells,
        )

        shapes = (
            _docs(spark, sf)
            .select("doc_id")
            .filter(F.col("doc_id") < 400)
            .withColumn(
                "lats",
                F.expr(
                    "transform(sequence(0, 3), j -> "
                    "((doc_id * 37 + j * 59) % 40) / 8.0 - 2.5)"
                ),
            )
            .withColumn(
                "lons",
                F.expr(
                    "transform(sequence(0, 3), j -> "
                    "((doc_id * 23 + j * 83) % 40) / 8.0 - 2.5)"
                ),
            )
        )
        cells = shape_grid_cells(shapes, max_level=8, max_cells=16)
        return (
            shape_grid_box_query(
                shapes, cells, (-2.0, 1.0, -1.0, 2.0), "intersects", polygon=True
            )
            .select("doc_id")
            .orderBy("doc_id")
        )

    out["shape_grid_query"] = shape_grid_query

    # --- BBoxStrategy overlap-ratio ranking (spatial-extras/bbox/
    # BBoxOverlapRatioValueSource.java:70): deterministic per-doc boxes,
    # top-15 by queryRatio*p + targetRatio*(1-p); the score expression
    # text is shared verbatim with the DuckDB oracle
    def bbox_overlap_gate(spark, sf):
        from lucene_spark.search.bbox import bbox_overlap_topk

        boxes = _docs(spark, sf).select(
            "doc_id",
            (((F.col("doc_id") * 13) % 120) / 2.0 - 30.0).alias("min_lat"),
            (
                ((F.col("doc_id") * 13) % 120) / 2.0
                - 30.0
                + ((F.col("doc_id") * 7) % 40) / 2.0
            ).alias("max_lat"),
            (((F.col("doc_id") * 29) % 240) / 2.0 - 60.0).alias("min_lon"),
            (
                ((F.col("doc_id") * 29) % 240) / 2.0
                - 60.0
                + ((F.col("doc_id") * 11) % 60) / 2.0
            ).alias("max_lon"),
        )
        return bbox_overlap_topk(boxes, (-10.0, 25.0, -20.0, 40.0), k=15)

    out["bbox_overlap_topk"] = bbox_overlap_gate

    # --- SemDeDup (Abbas et al. 2023): n_lists=1 is the exact regime
    # (clustering affects cost only), so the oracle is the brute-force
    # pair closure; the bucketed regime is recall-tested in pytest
    def semdedup_keep(spark, sf):
        from lucene_spark.pipeline.similarity import semdedup

        return semdedup(
            _emb(spark, sf).filter(F.col("vec_id") < 300),
            threshold=0.4,
            n_lists=1,
            seed=7,
        ).orderBy("vec_id")

    out["semdedup_keep"] = semdedup_keep

    # --- ContextQuery / ContextSuggestField (suggest/document/
    # ContextQuery.java:63): per-language term popularity as the
    # context table; prefix completion boosted 2x for English
    def context_suggest_gate(spark, sf):
        from lucene_spark.search.suggest import context_suggest

        sug = (
            _docs(spark, sf)
            .select(
                "doc_id",
                F.col("lang").alias("context"),
                F.explode(F.split(F.col("text"), " ")).alias("suggestion"),
            )
            .filter(F.col("suggestion") != "")
            .groupBy("suggestion", "context")
            .agg(F.countDistinct("doc_id").alias("weight"))
        )
        return context_suggest(sug, "s", {"en": 2.0, "de": 1.0}, n=12)

    out["context_suggest"] = context_suggest_gate

    # --- IndexSortSortedNumericDocValuesRangeQuery (search/IndexSort
    # SortedNumericDocValuesRangeQuery.java:69): a range on the index-
    # sort field binary-searches the manifest's per-segment bounds —
    # non-overlapping segment dirs are never opened (PartitionFilter)
    def sorted_range_docs(spark, sf):
        import os
        import tempfile

        from lucene_spark.index.sorting import (
            save_sorted,
            sort_docs,
            sorted_range_query,
        )

        key = ("range", sf)
        if key not in _SORTED_STORE_CACHE:
            path = os.path.join(
                tempfile.mkdtemp(prefix="lucene_spark_sortedrq_"), "by_chars"
            )
            s = sort_docs(
                _docs(spark, sf),
                [F.col("n_chars").asc(), F.col("orig_doc_id")],
            )
            save_sorted(s, path, docs_per_segment=128, stats_cols=["n_chars"])
            _SORTED_STORE_CACHE[key] = path
        return (
            sorted_range_query(
                spark, _SORTED_STORE_CACHE[key], "n_chars", 200, 400
            )
            .select(F.col("orig_doc_id").alias("doc_id"), "n_chars")
            .orderBy("doc_id")
        )

    out["sorted_range_docs"] = sorted_range_docs

    # --- CollationKeyAnalyzer (collation/CollationKeyAnalyzer.java:48):
    # locale term ranges via Spark 4 native collations. UTF8_LCASE is
    # dual-emittable (lowercased UTF-8 byte order == lower() in DuckDB);
    # ICU locale collations are pinned by golden-order pytests.
    def collation_range_gate(spark, sf):
        from lucene_spark.analysis.collation import collation_range

        terms = (
            _docs(spark, sf)
            .select(F.explode(F.split(F.col("text"), " ")).alias("term"))
            .filter(F.col("term").rlike("^[A-Za-z]+$"))
            .distinct()
        )
        hits = collation_range(terms, "term", "m", "q", collation="UTF8_LCASE")
        return hits.select(
            "term", F.lower(F.col("term")).alias("ckey")
        ).orderBy("ckey", "term")

    out["collation_range"] = collation_range_gate

    # --- ICUTransformFilter (icu/ICUTransformFilter.java:58): ISO 9
    # Cyrillic→Latin is a 1:1 pinned table → pure-JVM translate; the
    # oracle applies the identical table via DuckDB translate()
    def cyrillic_translit_gate(spark, sf):
        from lucene_spark.analysis.translit import icu_transform

        words = F.array(
            F.lit("Москва"), F.lit("щука"), F.lit("Ёж"), F.lit("журнал"),
            F.lit("чай"), F.lit("эхо"), F.lit("юг"), F.lit("яблоко"),
        )
        src = _docs(spark, sf).filter(F.col("doc_id") < 64).select(
            "doc_id",
            F.concat(
                F.element_at(words, (F.col("doc_id") % 8 + 1).cast("int")),
                F.lit(" "),
                F.element_at(words, (F.col("doc_id") % 5 + 1).cast("int")),
            ).alias("cyr"),
        )
        return src.select(
            "doc_id",
            icu_transform(F.col("cyr"), "Cyrillic-Latin").alias("latin"),
        ).orderBy("doc_id")

    out["cyrillic_translit"] = cyrillic_translit_gate

    # --- grouping-module completion (grouping/AllGroupHeadsCollector.java:41,
    # DistinctValuesCollector.java:31, LongRangeFactory.java:47,
    # BlockGroupingCollector.java:46, TermGroupFacetCollector.java:37)
    def all_group_heads_gate(spark, sf):
        from lucene_spark.search.grouping import all_group_heads

        m = (
            _docs(spark, sf)
            .filter(F.col("n_chars") >= 150)
            .select("doc_id", "source", F.col("n_chars").cast("double").alias("s"))
        )
        return all_group_heads(m, "source", score_col="s", tie_col="doc_id")

    out["all_group_heads"] = all_group_heads_gate

    def distinct_values_group_gate(spark, sf):
        from lucene_spark.search.grouping import distinct_values_per_group

        m = _docs(spark, sf).filter(F.col("n_chars") < 230)
        return distinct_values_per_group(m, "lang", "source", k_groups=3)

    out["distinct_values_group"] = distinct_values_group_gate

    def range_group_topk_gate(spark, sf):
        from lucene_spark.search.grouping import range_group_topk

        ev = _events(spark, sf).select(
            "event_id", F.floor("value").cast("long").alias("v")
        )
        return range_group_topk(
            ev, "v", 50, 100, 400, k_within=2, tie_col="event_id"
        )

    out["range_group_topk"] = range_group_topk_gate

    def block_grouping_top_gate(spark, sf):
        from lucene_spark.search.grouping import block_grouping_topk

        c = _events(spark, sf).select(
            "event_id",
            (F.col("user_id") % 37).alias("pk"),
            F.col("value").alias("s"),
        )
        return block_grouping_topk(
            c, "pk", "s", k_groups=5, k_within=2, tie_col="event_id"
        )

    out["block_grouping_top"] = block_grouping_top_gate

    def group_facets_gate(spark, sf):
        from lucene_spark.search.grouping import group_facet_counts

        m = _docs(spark, sf).filter(F.col("n_chars") < 260)
        return group_facet_counts(m, "lang", "source")

    out["group_facets"] = group_facets_gate

    # --- value-source facets (facet/StringValueFacetCounts.java:176,
    # facet/LongValueFacetCounts.java:413): taxonomy-free DV faceting
    # with the totalDocCount/childCount header fields
    def string_value_facets_gate(spark, sf):
        from lucene_spark.search.facets import string_value_facet_counts

        m = _docs(spark, sf).filter(F.col("n_chars") < 240)
        return string_value_facet_counts(m, "source", top_n=5)

    out["string_value_facets"] = string_value_facets_gate

    def long_value_facets_gate(spark, sf):
        from lucene_spark.search.facets import long_value_facet_counts

        ev = _events(spark, sf).select((F.col("user_id") % 23).alias("uv"))
        return long_value_facet_counts(ev, "uv", top_n=6)

    out["long_value_facets"] = long_value_facets_gate

    # --- RangeOnRangeFacetCounts (facet/rangeonrange/
    # RangeOnRangeFacetCounts.java:35): the doc field is itself a range
    def range_on_range_facets_gate(spark, sf):
        from lucene_spark.search.facets import range_on_range_counts

        ev = _events(spark, sf).select(
            F.col("value").alias("rmin"),
            (F.col("value") + (F.col("user_id") % 10) + F.lit(1.0)).alias("rmax"),
        )
        return range_on_range_counts(
            ev,
            "rmin",
            "rmax",
            [("low", 0.0, 100.0), ("mid", 50.0, 250.0), ("high", 240.0, 500.0)],
            relation="intersects",
        )

    out["range_on_range_facets"] = range_on_range_facets_gate

    # --- ToParentBlockJoinSortField (join/ToParentBlockJoinSortField.java:48):
    # parents sorted by the MIN/MAX value of their filtered children
    def block_join_sort_gate(spark, sf):
        from lucene_spark.search.blockjoin import parent_sort_by_child

        orders = spark.read.parquet(f"{sf}/orders.parquet").select("o_orderkey")
        items = spark.read.parquet(f"{sf}/lineitem.parquet").filter(
            F.col("l_quantity") > 45
        )
        return parent_sort_by_child(
            orders,
            items,
            "o_orderkey",
            "l_orderkey",
            F.col("l_extendedprice"),
            selector="max",
            ascending=False,
            k=12,
            tie_col="o_orderkey",
        ).select("o_orderkey", F.round("sort_value", 4).alias("sort_value"))

    out["block_join_sort"] = block_join_sort_gate

    # --- Matches API (search/NamedMatches.java:44, MatchesIterator.java:33)
    def named_matches_gate(spark, sf):
        from lucene_spark.search.matches import named_matches

        return named_matches(
            _index(spark, sf),
            {"q1": ["hash"], "q2": ["join", "merge"], "q3": ["scan"]},
        ).filter(F.col("doc_id") < 300)

    out["named_matches"] = named_matches_gate

    def match_positions_gate(spark, sf):
        from lucene_spark.search.matches import term_match_positions

        return term_match_positions(
            _index(spark, sf), ["hash", "join"], max_doc=120
        )

    out["match_positions"] = match_positions_gate

    # --- AnalyzingSuggester EXACT_FIRST / WFSTCompletionLookup
    # exactFirst (analyzing/AnalyzingSuggester.java:716): the exact key
    # outranks higher-weight completions ('a' df=388 beats 'agg' df=397)
    def suggest_exact_first_gate(spark, sf):
        from lucene_spark.search.suggest import exact_first_suggest

        return exact_first_suggest(_index(spark, sf), "a", n=8)

    out["suggest_exact_first"] = suggest_exact_first_gate

    # --- paragraph-level exact dedup (RefinedWeb/Falcon line-dedup
    # stage): deterministic multi-paragraph docs with heavy repeats
    def paragraph_dedup_gate(spark, sf):
        from lucene_spark.pipeline.dedup import paragraph_dedup

        p4 = F.array(
            F.lit("alpha beta"), F.lit("gamma delta"),
            F.lit("epsilon zeta"), F.lit("eta theta"),
        )
        p3 = F.array(
            F.lit("alpha beta"), F.lit("gamma delta"), F.lit("epsilon zeta")
        )
        d = _docs(spark, sf).filter(F.col("doc_id") < 200).select(
            "doc_id",
            F.concat(
                F.element_at(p4, (F.col("doc_id") % 4 + 1).cast("int")),
                F.lit("\n"),
                F.element_at(p3, (F.col("doc_id") % 3 + 1).cast("int")),
                F.lit("\nunique "),
                F.col("doc_id").cast("string"),
            ).alias("text"),
        )
        return paragraph_dedup(d)

    out["paragraph_dedup"] = paragraph_dedup_gate

    # --- SpanPayloadCheckQuery (queries/payloads/SpanPayloadCheckQuery.java:54):
    # span positions filtered by a payload predicate (payload = token
    # index, same delimited-payload build as payload_avg_score)
    def span_payload_check_gate(spark, sf):
        from lucene_spark.analysis.filters import delimited_payload_analyzer
        from lucene_spark.search.payloads import span_payload_check

        docs = _docs(spark, sf).withColumn(
            "text",
            F.concat_ws(
                " ",
                F.expr(
                    "transform(split(text, ' '), "
                    "(t, i) -> concat(t, '|', cast(i AS string)))"
                ),
            ),
        )
        idx = InvertedIndex.build(
            docs,
            analyzer=delimited_payload_analyzer(),
            positions=True,
            payloads=True,
            docs_per_segment=2048,
        )
        return span_payload_check(idx, "hash", op="lt", value=6.0)

    out["span_payload_check"] = span_payload_check_gate

    # --- FunctionRangeQuery over the expressions language
    # (queries/function/FunctionRangeQuery.java:37): computed
    # DoubleValuesSource bounded to [20, 24]
    def function_range_match_gate(spark, sf):
        from lucene_spark.search.expressions import compile_expression
        from lucene_spark.search.functionscore import function_range_match

        c = compile_expression(
            "sqrt(n_chars) + doc_id % 11",
            {"n_chars": "n_chars", "doc_id": "doc_id"},
        )
        return function_range_match(
            _docs(spark, sf), c.column(), lo=20.0, hi=24.0,
            include_upper=False,
        )

    out["function_range_match"] = function_range_match_gate

    # --- InetAddressPoint (document/InetAddressPoint.java:41): IP
    # range / CIDR-prefix / set / exact queries over the 16-byte
    # sortable hex key (IPv4-mapped, like the reference's encode)
    def inet_queries_gate(spark, sf):
        from lucene_spark.search.inet import (
            inet_exact_query,
            inet_prefix_query,
            inet_range_query,
            inet_set_query,
            ipv4_key_col,
        )

        ips = _events(spark, sf).select(
            "event_id",
            ipv4_key_col(
                F.concat_ws(
                    ".",
                    F.lit("10"),
                    (F.col("user_id") % 200).cast("string"),
                    (F.expr("user_id div 7") % 50).cast("string"),
                    (F.col("user_id") % 250).cast("string"),
                )
            ).alias("k"),
        )
        legs = [
            ("prefix_10_64_s10", inet_prefix_query(ips, "k", "10.64.0.0/10")),
            ("range_50_120", inet_range_query(ips, "k", "10.50.3.7", "10.120.9.200")),
            ("set3", inet_set_query(ips, "k", ["10.1.0.1", "10.5.0.5", "8.8.8.8"])),
            ("exact", inet_exact_query(ips, "k", "10.1.0.1")),
        ]
        res = None
        for label, d in legs:
            one = d.agg(F.count(F.lit(1)).cast("long").alias("cnt")).select(
                F.lit(label).alias("label"), "cnt"
            )
            res = one if res is None else res.unionByName(one)
        return res

    out["inet_queries"] = inet_queries_gate

    # --- BigIntegerPoint (sandbox/document/BigIntegerPoint.java:36):
    # 128-bit signed range over the sign-folded hex key
    def bigint_range_gate(spark, sf):
        from lucene_spark.search.inet import int128_key_col, int128_range_query

        vals = _events(spark, sf).select(
            "event_id",
            int128_key_col(
                F.col("user_id") - F.lit(500), F.col("event_id") * F.lit(1000000007)
            ).alias("k"),
        )
        lo = (-300 << 64) | (17 * 1000000007)
        hi = (250 << 64) | ((1 << 64) - 1)
        m = int128_range_query(vals, "k", lo, hi)
        return m.agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.min("event_id").alias("min_event"),
            F.max("event_id").alias("max_event"),
        )

    out["bigint_range"] = bigint_range_gate

    # --- SortRescorer (core/search/SortRescorer.java:28): first-pass
    # relevance window re-ordered by a sort field
    def sort_rescore_gate(spark, sf):
        from lucene_spark.search.rescore import sort_rescorer_topk

        return sort_rescorer_topk(
            _index(spark, sf),
            {"hash": 1.0, "scan": 0.5},
            _docs(spark, sf).select("doc_id", "n_chars"),
            "n_chars",
            first_pass_k=50,
            top_n=10,
            ascending=False,
        )

    out["sort_rescore"] = sort_rescore_gate

    # --- CCNet head/middle/tail perplexity buckets (Wenzek et al.
    # 2020 §4.3) over the bigram-LM perplexity signal
    def ppl_buckets_gate(spark, sf):
        from lucene_spark.pipeline.lm import (
            perplexity,
            perplexity_buckets,
            train_bigram_lm,
        )

        docs = _docs(spark, sf)
        model = train_bigram_lm(docs.filter(F.col("doc_id") % 5 != 0))
        ppl = perplexity(docs.filter(F.col("doc_id") < 1500), model)
        return perplexity_buckets(ppl)

    out["ppl_buckets"] = ppl_buckets_gate

    # --- Luke Overview-tab analog (luke/app/desktop — index overview:
    # doc count, distinct terms, sum docFreq, sum totalTermFreq): pure
    # aggregates over the terms-table METADATA, no posting decode
    def index_overview_gate(spark, sf):
        idx = _index(spark, sf)
        return idx.terms.agg(
            F.lit(int(idx.doc_count)).cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("doc_freq").cast("long").alias("sum_doc_freq"),
            F.sum("total_term_freq").cast("long").alias("sum_ttf"),
        )

    out["index_overview"] = index_overview_gate

    # --- temperature-based domain mixing (Conneau & Lample 2019 §3.1):
    # p_i ∝ n_i^alpha over per-language counts, expected draws for a
    # 1000-doc epoch
    def temperature_mix_gate(spark, sf):
        from lucene_spark.pipeline.sampling import temperature_mixing_weights

        return temperature_mixing_weights(
            _docs(spark, sf), "lang", alpha=0.7, budget=1000
        )

    out["temperature_mix"] = temperature_mix_gate

    # --- KeywordRepeat + stem + RemoveDuplicates (miscellaneous/
    # KeywordRepeatFilter.java:31): exact AND stemmed forms share a
    # position; identical forms collapse
    def keyword_repeat_gate(spark, sf):
        from lucene_spark.analysis.filters import keyword_repeat_stemmed

        return keyword_repeat_stemmed(
            _docs(spark, sf).filter(F.col("doc_id") < 60)
        )

    out["keyword_repeat_terms"] = keyword_repeat_gate

    # --- LargeNumHitsTopDocsCollector (sandbox/search/
    # LargeNumHitsTopDocsCollector.java:38): window >= hit count, no
    # heap, exact totalHits
    def large_num_hits_gate(spark, sf):
        from lucene_spark.search.misc import large_num_hits_topk

        return large_num_hits_topk(
            _index(spark, sf), {"merge": 1.0, "scan": 0.5}, num_hits=1 << 20
        ).filter(F.col("doc_id") < 400)

    out["large_num_hits"] = large_num_hits_gate

    # --- BpVectorReorderer (misc/index/BpVectorReorderer.java:55):
    # vector-similarity docID clustering; search results must be
    # invariant under the relayout (ids restored via orig_doc_id)
    def bp_vector_reorder_topk_gate(spark, sf):
        from lucene_spark.index.bp import bp_vector_reorder

        emb = _emb(spark, sf)
        re = bp_vector_reorder(
            emb,
            vec_col="embedding",
            doc_id_col="vec_id",
            num_partitions=4,
            min_partition_size=4,
        )
        restored = re.select(
            F.col("orig_doc_id").alias("vec_id"), "embedding"
        )
        return cosine_topk(restored, _qvec(spark, sf), k=15)

    out["bp_vector_reorder_topk"] = bp_vector_reorder_topk_gate

    # --- QueryAutoStopWordAnalyzer (analysis/common/.../query/
    # QueryAutoStopWordAnalyzer.java:51): terms whose docFreq exceeds
    # numDocs*maxPercentDocs become query-time stopwords; 'hash' and
    # 'scan' (~79% of docs) drop, 'dup' (~5%) survives and scores alone
    def auto_stop_topk_gate(spark, sf):
        from lucene_spark.search.autostop import auto_stop_filter_boosts

        idx = _index(spark, sf)
        boosts = auto_stop_filter_boosts(
            idx,
            {"hash": 1.0, "dup": 1.5, "scan": 0.5},
            max_percent_docs=0.5,
        )
        return bm25_topk_f64(idx, boosts, k=15)

    out["auto_stop_topk"] = auto_stop_topk_gate

    # --- blocktreeords TermsEnum.seekExact(ord) (codecs/blocktreeords/
    # OrdsBlockTreeTermsWriter.java:71): dense lexicographic term
    # ordinals over the whole-index dictionary
    def term_ord_seek_gate(spark, sf):
        from lucene_spark.index.ords import seek_by_ord

        return seek_by_ord(_index(spark, sf), [0, 5, 12, 19, 30])

    out["term_ord_seek"] = term_ord_seek_gate

    # --- DelimitedBoostTokenFilter (analysis/common/.../boost/
    # DelimitedBoostTokenFilter.java:28): "term|boost" query tokens →
    # boosted SHOULD clauses (repeated terms' boosts add)
    def delimited_boost_topk_gate(spark, sf):
        from lucene_spark.analysis.filters import delimited_boost_query

        boosts = delimited_boost_query("hash|2.0 join vector|0.5 join")
        return bm25_topk_f64(_index(spark, sf), boosts, k=15)

    out["delimited_boost_topk"] = delimited_boost_topk_gate

    # --- WikipediaTokenizer (analysis/common/.../wikipedia/
    # WikipediaTokenizer.java:52): wiki-markup-aware typed tokens —
    # italics/category/external-link (URL elu + display el at the same
    # position)/heading/citation constructs over a per-doc template
    def wiki_tokens_gate(spark, sf):
        from lucene_spark.analysis.wiki import wikipedia_tokenizer_udf

        base = _docs(spark, sf).select("doc_id").orderBy("doc_id").limit(50)
        text = F.concat(
            F.lit("''Intro'' [[Category:cat"),
            F.col("doc_id"),
            F.lit("]] plain"),
            F.col("doc_id"),
            F.lit(" [http://ex"),
            F.col("doc_id"),
            F.lit(".com site "),
            F.col("doc_id"),
            F.lit("] ==Head== <ref>cite"),
            F.col("doc_id"),
            F.lit("</ref> 3.25 it's"),
        )
        toks = base.select(
            "doc_id", wikipedia_tokenizer_udf()(text).alias("t")
        ).select("doc_id", F.explode("t").alias("tok"))
        return toks.select(
            "doc_id",
            F.col("tok.term").alias("term"),
            F.col("tok.type").alias("type"),
            F.col("tok.pos").alias("pos"),
        ).orderBy("doc_id", "pos", "term")

    out["wiki_tokens"] = wiki_tokens_gate

    # --- SimpleText codec (codecs/simpletext/SimpleTextCodec.java:31):
    # plain-text save → load round-trip must answer exactly like the
    # original index (blocks re-encoded through the standard kernel)
    def simpletext_roundtrip_gate(spark, sf):
        import os
        import tempfile

        from lucene_spark.index.simpletext import load_simpletext, save_simpletext

        key = ("simpletext", sf)
        if key not in _INDEX_CACHE:
            tag = "".join(c if c.isalnum() else "_" for c in str(sf))
            d = os.path.join(
                tempfile.gettempdir(), f"lucene_spark_simpletext_gate_{tag}"
            )
            save_simpletext(_index(spark, sf), d)
            _INDEX_CACHE[key] = load_simpletext(spark, d)
        return bm25_topk_f64(_INDEX_CACHE[key], {"merge": 1.0, "vector": 0.5}, k=15)

    out["simpletext_roundtrip"] = simpletext_roundtrip_gate

    # --- DirectPostingsFormat (codecs/memory/DirectPostingsFormat.java:66):
    # hot-term postings decoded once into Spark's in-memory cache; a
    # query mixing hot ('hash') and cold ('dup') terms must be
    # result-identical to the block-decode path
    def direct_postings_topk_gate(spark, sf):
        from lucene_spark.search.directcache import DirectPostingsCache

        key = ("directcache", sf)
        if key not in _INDEX_CACHE:
            _INDEX_CACHE[key] = DirectPostingsCache(
                _index(spark, sf), terms=["hash", "scan"]
            )
        return _INDEX_CACHE[key].bm25_topk(
            {"hash": 1.0, "scan": 0.5, "dup": 2.0}, k=15
        )

    out["direct_postings_topk"] = direct_postings_topk_gate

    # --- BPE vocabulary training (Sennrich et al. 2016; beyond-
    # reference pipeline op): distributed word histogram + driver-side
    # merge loop; identical per-doc template text makes the learned
    # merges corpus-size-independent, so the encodings are exact pins
    def bpe_pieces_gate(spark, sf):
        from lucene_spark.pipeline.bpe import bpe_encode_udf, train_bpe

        corpus = _docs(spark, sf).select(
            "doc_id",
            F.lit(
                "low low low low low lower lower newest newest newest "
                "newest newest newest widest widest widest"
            ).alias("text"),
        )
        merges = train_bpe(corpus, num_merges=8)["merges"]
        probes = spark.createDataFrame(
            [("lowest",), ("newest",), ("wider",), ("low",)], "word string"
        )
        return probes.select(
            "word",
            F.concat_ws(" ", bpe_encode_udf(merges)("word")).alias("pieces"),
        ).orderBy("word")

    out["bpe_pieces"] = bpe_pieces_gate

    # --- ExtendableQueryParser (queryparser/ext/
    # ExtendableQueryParser.java:40): the "anyof" extension receives
    # its raw CSV un-analyzed and builds a TermInSetQuery; dispatch via
    # the escaped-delimiter extension-field syntax
    def ext_parse_match_gate(spark, sf):
        from lucene_spark.search.extparser import Extensions, extendable_parse

        ext = Extensions()
        ext.add(
            "anyof",
            lambda eq: TermInSetQuery(tuple(eq.raw_query_string.split(","))),
        )
        q = extendable_parse("text\\:anyof:hash,dup", ext)
        assert isinstance(q, TermInSetQuery), q
        return _const_score_docs(spark, sf, q, k=450)

    out["ext_parse_match"] = ext_parse_match_gate

    # --- TokenStreamToTermAutomatonQuery (sandbox/search/
    # TokenStreamToTermAutomatonQuery.java:35): a synonym-graph token
    # stream — "hash" (posLength 2) as a side path over "big data" —
    # followed by "scan"; the automaton accepts either surface form
    def ts2a_match_gate(spark, sf):
        from lucene_spark.search.termautomaton import (
            doc_position_frame,
            term_automaton_freqs,
            token_stream_to_automaton,
        )

        auto = token_stream_to_automaton(
            [("hash", 1, 2), ("big", 0, 1), ("data", 1, 1), ("scan", 1, 1)]
        )
        return term_automaton_freqs(
            doc_position_frame(_docs(spark, sf)), auto
        ).orderBy("doc_id")

    out["ts2a_match"] = ts2a_match_gate

    # --- wiki markup → plain display text: pure JVM regexp chain
    # (codegen, no UDF, no shuffle) — the corpus-scale extraction
    # companion to the WikipediaTokenizer analog
    def wiki_plain_text_gate(spark, sf):
        from lucene_spark.analysis.wiki import wiki_plain_text_col

        base = _docs(spark, sf).select("doc_id").orderBy("doc_id").limit(80)
        markup = F.concat(
            F.lit("''Intro'' [[Category:cat"),
            F.col("doc_id"),
            F.lit("]] see [[target|docs "),
            F.col("doc_id"),
            F.lit("]] at [http://ex.com site "),
            F.col("doc_id"),
            F.lit("] ==Head== <ref>cite</ref> done"),
        )
        return base.select(
            "doc_id", wiki_plain_text_col(markup).alias("plain")
        ).orderBy("doc_id")

    out["wiki_plain_text"] = wiki_plain_text_gate

    # --- Telugu analyzer pieces (te/TeluguNormalizer.java:27,
    # te/TeluguStemmer.java:24) + Romanian cedilla folding
    # (ro/RomanianNormalizer.java:28): reference-golden battery through
    # the Arrow normalize UDFs
    def te_ro_terms_gate(spark, sf):
        from lucene_spark.analysis.normalize import normalize_udf

        te_words = [
            "పదాలూ", "అబ్బాయీ", "ఔఐఆఈఊ", "వస్తువులు",
            "పన్నులు", "చేపిస్తున్నది", "చేపిస్తున్నడు",
        ]
        ro_words = ["peţişoară", "aşa"]
        rows = [("te", w) for w in te_words] + [("ro", w) for w in ro_words]
        df = spark.createDataFrame(rows, "lang string, word string")
        te = df.filter(F.col("lang") == "te").select(
            "lang", "word", normalize_udf("te_stem")("word").alias("out")
        )
        ro = df.filter(F.col("lang") == "ro").select(
            "lang", "word", normalize_udf("ro")("word").alias("out")
        )
        return te.unionByName(ro).orderBy("lang", "word")

    out["te_ro_terms"] = te_ro_terms_gate

    # --- BlendedTermQuery (core/search/BlendedTermQuery.java:47):
    # 'dup' (rare) scored with 'hash's max docFreq — the blend damps
    # rare-variant idf dominance; DisMax rewrite, class-default tie 0.01
    def blended_term_stats_topk_gate(spark, sf):
        from lucene_spark.search.blended import blended_term_topk

        return blended_term_topk(
            _index(spark, sf), {"hash": 1.0, "dup": 1.5}, k=15
        )

    out["blended_term_stats_topk"] = blended_term_stats_topk_gate

    # --- Late-interaction MaxSim rescore (core/search/
    # LateInteractionRescorer.java:28): doc multi-vectors = 4×16
    # chunks of the embedding; query multi-vector = 2 chunks of the
    # probe; cosine-topk first pass rescored by Σ_q max_d (1+cos)/2 —
    # the whole MaxSim is one codegen'd HOF column, no UDF
    def late_interaction_topk_gate(spark, sf):
        from lucene_spark.search.lateinteraction import late_interaction_rescore

        emb = _emb(spark, sf)
        qv = _qvec(spark, sf)
        fp = cosine_topk(emb, qv, k=40)
        docs = emb.select(
            "vec_id",
            F.array(
                F.slice("embedding", 1, 16),
                F.slice("embedding", 17, 16),
                F.slice("embedding", 33, 16),
                F.slice("embedding", 49, 16),
            ).alias("multi_vec"),
        )
        return late_interaction_rescore(
            fp,
            docs,
            [qv[0:16], qv[48:64]],
            id_col="vec_id",
            score_col="cos",
            k=15,
        )

    out["late_interaction_topk"] = late_interaction_topk_gate

    # --- SortedNumericSortField + MAX selector (core/search/
    # SortedNumericSortField.java:43, SortedNumericSelector MAX):
    # multi-valued numeric sort, empty sets at missingValue 0,
    # reverse order, docID ties
    def sorted_numeric_selector_topk_gate(spark, sf):
        from lucene_spark.search.sortselectors import sorted_numeric_topk

        docs = _docs(spark, sf).select(
            "doc_id",
            F.when(
                F.col("doc_id") % 9 == 0, F.array().cast("array<long>")
            )
            .otherwise(
                F.array(
                    F.col("doc_id") % 13,
                    F.col("doc_id") % 7 + 3,
                    F.col("doc_id") % 5 + 1,
                )
            )
            .alias("vals"),
        )
        return sorted_numeric_topk(
            docs, "vals", selector="max", reverse=True, k=40
        )

    out["sorted_numeric_selector_topk"] = sorted_numeric_selector_topk_gate

    # --- SeededKnnVectorQuery (core/search/SeededKnnVectorQuery.java:36):
    # seed-query hits become the layer-0 entry points (descent
    # skipped); with ef >= rows_per_segment the beam still covers each
    # segment, so seeded results are value-exact vs the brute oracle —
    # the seeding plumbing is what this gate pins (recall behavior of
    # small-ef seeded search is pytest-tested)
    def seeded_knn_topk_gate(spark, sf):
        from lucene_spark.search.hnsw import build_hnsw_segments, hnsw_topk

        graphs = build_hnsw_segments(
            _emb(spark, sf), rows_per_segment=256, m=16, beam_width=100
        )
        return hnsw_topk(
            graphs, _qvec(spark, sf), k=15, ef=256, seed_ids=[0, 3, 17]
        )

    out["seeded_knn_topk"] = seeded_knn_topk_gate

    # --- IndriAndQuery (core/search/IndriAndScorer.java:45): belief
    # AND = boost-weighted MEAN over clauses, missing clauses score the
    # Dirichlet smoothing (freq=0) background — every union doc scored
    # by every clause
    def indri_and_topk_gate(spark, sf):
        from lucene_spark.search.indriand import indri_and_topk

        return indri_and_topk(
            _index(spark, sf), {"hash": 1.0, "dup": 2.0, "scan": 0.5}, k=15
        )

    out["indri_and_topk"] = indri_and_topk_gate

    # --- MultiCollector/MultiCollectorManager (core/search/
    # MultiCollector.java:36): TotalHitCount + score-statistics
    # collectors fused into ONE partial-agg'd pass over the scored frame
    def multi_collector_stats_gate(spark, sf):
        from lucene_spark.search.misc import multi_collector_stats

        return multi_collector_stats(
            _index(spark, sf), {"hash": 1.0, "dup": 2.0}
        )

    out["multi_collector_stats"] = multi_collector_stats_gate

    # --- ConcatenateGraphFilter (miscellaneous/
    # ConcatenateGraphFilter.java:45): token-graph paths enumerated as
    # completion keys — synonym side paths, no-separator dedupe, holes
    def concat_graph_paths_gate(spark, sf):
        from pyspark.sql.functions import pandas_udf

        from lucene_spark.analysis.miscfilters import concatenate_graph_paths

        streams = {
            "phrase": ([("a", 1, 1), ("b", 1, 1)], "/"),
            "synonym": (
                [("wifi", 1, 2), ("wi", 0, 1), ("fi", 1, 1), ("net", 1, 1)],
                "/",
            ),
            "nosep": (
                [("wifi", 1, 2), ("wi", 0, 1), ("fi", 1, 1), ("net", 1, 1)],
                None,
            ),
            "hole": ([("a", 1, 1), ("b", 3, 1)], "/"),
        }

        @pandas_udf("array<string>")
        def paths_of(kinds):
            return kinds.map(
                lambda kd: concatenate_graph_paths(
                    streams[kd][0], token_separator=streams[kd][1]
                )
            )

        df = spark.createDataFrame(
            [(k,) for k in sorted(streams)], "kind string"
        )
        return (
            df.select("kind", F.explode(paths_of("kind")).alias("path"))
            .orderBy("kind", "path")
        )

    out["concat_graph_paths"] = concat_graph_paths_gate

    # --- Solr + WordNet synonym-format parsers (synonym/
    # SolrSynonymParser.java:33, WordnetSynonymParser.java:26)
    def synonym_rules_gate(spark, sf):
        from lucene_spark.analysis.synparser import (
            parse_solr_synonyms,
            parse_wordnet_synonyms,
        )

        solr = "# c\nquick, fast\nbig => large, huge\n"
        wn = (
            "s(100000001,1,'wood',n,1,0).\n"
            "s(100000001,2,'forest',n,1,0).\n"
        )
        rules = [
            ("solr",) + r for r in parse_solr_synonyms(solr)
        ] + [("wordnet",) + r for r in parse_wordnet_synonyms(wn)]
        return spark.createDataFrame(
            rules, "fmt string, input string, output string, keep_orig boolean"
        ).orderBy("fmt", "input", "output")

    out["synonym_rules"] = synonym_rules_gate

    # --- InetAddressRange (document/InetAddressRange.java:33): docs
    # store IP ranges; relation counts against a query range over the
    # sortable hex keys (CROSSES = INTERSECTS && !WITHIN)
    def inet_range_counts_gate(spark, sf):
        from lucene_spark.search.inet import inet_range_relation, ipv4_key_col

        ev = spark.read.parquet(f"{sf}/events.parquet").select("event_id", "user_id")
        ranged = ev.select(
            "event_id",
            ipv4_key_col(
                F.format_string("10.%d.0.0", (F.col("user_id") % 200).cast("int"))
            ).alias("lo"),
            ipv4_key_col(
                F.format_string(
                    "10.%d.255.255",
                    (F.col("user_id") % 200 + F.col("user_id") % 5).cast("int"),
                )
            ).alias("hi"),
        )
        parts = []
        for rel in ("intersects", "within", "contains", "crosses"):
            parts.append(
                inet_range_relation(
                    ranged, "lo", "hi", "10.50.0.0", "10.90.0.0", relation=rel
                ).agg(
                    F.lit(rel).alias("label"),
                    F.count(F.lit(1)).cast("long").alias("cnt"),
                )
            )
        out_df = parts[0]
        for p in parts[1:]:
            out_df = out_df.unionByName(p)
        return out_df.orderBy("label")

    out["inet_range_counts"] = inet_range_counts_gate

    # --- MultiReader (core/index/MultiReader.java:33): two halves
    # built independently with LOCAL ids, composed with the
    # BaseCompositeReader docBase rule — the composite must answer
    # exactly like the single whole-corpus index (stats sum, ids remap)
    def multi_reader_topk_gate(spark, sf):
        from lucene_spark.index.multireader import multi_reader

        key = ("multireader", sf)
        if key not in _INDEX_CACHE:
            docs = _docs(spark, sf)
            half = 250
            lo = InvertedIndex.build(
                docs.filter(F.col("doc_id") < half),
                analyzer="simple",
                docs_per_segment=125,
            )
            hi = InvertedIndex.build(
                docs.filter(F.col("doc_id") >= half).withColumn(
                    "doc_id", F.col("doc_id") - half
                ),
                analyzer="simple",
                docs_per_segment=125,
            )
            _INDEX_CACHE[key] = multi_reader([lo, hi])
        return bm25_topk_f64(
            _INDEX_CACHE[key], {"hash": 1.0, "dup": 2.0, "scan": 0.5}, k=20
        )

    out["multi_reader_topk"] = multi_reader_topk_gate

    # --- ParallelReader (core/index/ParallelLeafReader.java:46):
    # title = first 3 tokens, body = the rest, indexed SEPARATELY;
    # the multi-field query sums independent per-field BM25 scores
    # (each field keeps its own stats — the parallel-reader contract)
    def parallel_fields_topk_gate(spark, sf):
        from lucene_spark.index.multireader import ParallelReader

        key = ("parallel", sf)
        if key not in _INDEX_CACHE:
            docs = _docs(spark, sf)
            toks = docs.select(
                "doc_id", F.split(F.col("text"), " ").alias("l")
            )
            title = toks.select(
                "doc_id",
                F.concat_ws(" ", F.slice("l", 1, 3)).alias("text"),
            )
            body = toks.select(
                "doc_id",
                F.concat_ws(
                    " ", F.slice("l", 4, F.greatest(F.size("l") - 3, F.lit(0)))
                ).alias("text"),
            )
            _INDEX_CACHE[key] = ParallelReader(
                {
                    "title": InvertedIndex.build(
                        title, analyzer="simple", docs_per_segment=2048
                    ),
                    "body": InvertedIndex.build(
                        body, analyzer="simple", docs_per_segment=2048
                    ),
                }
            )
        return _INDEX_CACHE[key].bm25_topk(
            {"title": {"hash": 1.0}, "body": {"dup": 2.0, "scan": 0.5}}, k=20
        )

    out["parallel_fields_topk"] = parallel_fields_topk_gate

    # --- StringDistance family (spell/LevenshteinDistance.java:29,
    # LuceneLevenshteinDistance.java:33, JaroWinklerDistance.java:30,
    # NGramDistance.java:33): similarity battery through the Arrow
    # pair UDF
    def string_distances_gate(spark, sf):
        from lucene_spark.search.stringdist import string_distance_udf

        pairs = [
            ("martha", "marhta"),
            ("dwayne", "duane"),
            ("kitten", "sitting"),
            ("al", "al"),
        ]
        kinds = ["jaro_winkler", "levenshtein", "lucene_levenshtein", "ngram"]
        df = spark.createDataFrame(
            [(k, a, b) for k in kinds for a, b in pairs],
            "kind string, a string, b string",
        )
        parts = [
            df.filter(F.col("kind") == k).select(
                "kind", "a", "b",
                F.round(string_distance_udf(k)("a", "b"), 6).alias("sim"),
            )
            for k in kinds
        ]
        out_df = parts[0]
        for p in parts[1:]:
            out_df = out_df.unionByName(p)
        return out_df.orderBy("kind", "a", "b")

    out["string_distances"] = string_distances_gate

    # --- classic n-gram SpellChecker (suggest/spell/
    # SpellChecker.java:66): gram-boosted candidates re-ranked by
    # Levenshtein similarity with the 0.5 accuracy floor, freq-desc
    # tie-break (SuggestWordScoreComparator)
    def spell_checker_topk_gate(spark, sf):
        from lucene_spark.search.spellcheck import spell_checker_suggest

        idx = _index(spark, sf)
        return spell_checker_suggest(
            idx.terms, "hsah", num_sug=5, freq_col="doc_freq"
        )

    out["spell_checker_topk"] = spell_checker_topk_gate

    # --- Luke Documents-tab analog: one document's full indexed view
    # (term, freq), block-range pruned before decode
    def luke_doc_view_gate(spark, sf):
        from lucene_spark.search.misc import document_terms

        return document_terms(_index(spark, sf), 7)

    out["luke_doc_view"] = luke_doc_view_gate

    return _driver_order(out)


def _pii_dirty(docs: DataFrame) -> DataFrame:
    """Deterministic PII-bearing rows (pure function of doc_id; the
    oracle builds the identical strings in SQL)."""
    return docs.filter(F.col("doc_id") < 300).select(
        "doc_id",
        F.concat(
            F.lit("u"),
            F.col("doc_id").cast("string"),
            F.lit("@ex"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".org call +1 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-1234 ip 10."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(".0.9"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" ssn 123-45-6789")).otherwise(
                F.lit("")
            ),
            F.lit(" "),
            F.col("text"),
        ).alias("dirty"),
    )


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for name, params in _BM25_QUERIES.items():
        out[name] = oracle_bm25_sql(**params)

    out["classic_parse_match"] = f"""
WITH {TOK_CTE}
SELECT DISTINCT doc_id, 1.0 AS score FROM tok
WHERE doc_id IN (SELECT doc_id FROM tok WHERE term IN ('hash', 'sort'))
  AND doc_id IN (SELECT doc_id FROM tok WHERE term = 'join')
  AND doc_id NOT IN (SELECT doc_id FROM tok WHERE term = 'scan')
ORDER BY doc_id LIMIT 100
"""
    out["xml_parse_match"] = out["classic_parse_match"]
    out["flexible_parse_match"] = f"""
WITH {TOK_CTE}
SELECT DISTINCT doc_id, 1.0 AS score FROM tok
WHERE doc_id IN (SELECT doc_id FROM tok WHERE term = 'sort')
  AND doc_id IN (SELECT doc_id FROM tok WHERE regexp_matches(term, '^jo.n$'))
  AND doc_id IN (SELECT doc_id FROM tok WHERE term > 'hash' AND term <= 'join')
ORDER BY doc_id LIMIT 100
"""
    from lucene_spark.search.parity import oracle_combined_field_sql

    out["combined_field"] = oracle_combined_field_sql("src1", 1.0, 2.0, k=25)
    out["bm25f_weighted"] = oracle_combined_field_sql("src2", 0.75, 3.0, k=25)
    out["block_join_children"] = """
SELECT l.l_orderkey, l.l_linenumber, round(l.l_extendedprice, 4) AS price
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderstatus = 'F' AND o.o_totalprice > 250000
ORDER BY l.l_orderkey, l.l_linenumber LIMIT 200
"""
    out["combined_field_text"] = oracle_combined_field_sql("hash", 1.0, 2.0, k=25)
    out["monitor_percolate"] = f"""
WITH {TOK_CTE},
t AS (SELECT doc_id, list(DISTINCT term) AS terms FROM tok GROUP BY doc_id)
SELECT doc_id, query_id FROM (
  SELECT doc_id, 'alert_hash_join' AS query_id FROM t
  WHERE list_contains(terms, 'hash') AND list_contains(terms, 'join')
  UNION ALL
  SELECT doc_id, 'alert_merge_not_sort' FROM t
  WHERE list_contains(terms, 'merge') AND NOT list_contains(terms, 'sort')
  UNION ALL
  SELECT doc_id, 'alert_spark' FROM t WHERE list_contains(terms, 'spark')
) ORDER BY doc_id, query_id
"""
    out["hyphen_term_query"] = _const_score_oracle("term IN ('hash', 'join')")
    _POS_CTE = """toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents
)"""
    out["span_near_ordered"] = f"""
WITH {_POS_CTE},
p1 AS (SELECT doc_id, i FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) WHERE l[i] = 'hash'),
p2 AS (SELECT doc_id, i AS j FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) WHERE l[i] = 'join')
SELECT DISTINCT doc_id, 1.0 AS score FROM p1 JOIN p2 USING (doc_id)
WHERE j > i AND j - i - 1 <= 2
ORDER BY doc_id LIMIT 200
"""
    out["simple_parse_match"] = f"""
WITH {TOK_CTE}
SELECT DISTINCT doc_id, 1.0 AS score FROM tok
WHERE (doc_id IN (SELECT doc_id FROM documents
                  WHERE (' ' || text || ' ') LIKE '% hash join %')
       OR doc_id IN (SELECT doc_id FROM tok WHERE term LIKE 'merg%'))
  AND doc_id NOT IN (SELECT doc_id FROM tok WHERE term = 'scan')
ORDER BY doc_id LIMIT 100
"""
    # two-term sloppy phrase: minimal move distance = |j - i - 1|
    # (reversed-adjacent costs 2), matches the exact sloppy kernel
    out["sloppy_parse_match"] = f"""
WITH {_POS_CTE},
p1 AS (SELECT doc_id, i FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) WHERE l[i] = 'hash'),
p2 AS (SELECT doc_id, i AS j FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) WHERE l[i] = 'join')
SELECT DISTINCT doc_id, 1.0 AS score FROM p1 JOIN p2 USING (doc_id)
WHERE abs(j - i - 1) <= 2
ORDER BY doc_id LIMIT 150
"""
    out["surround_near_match"] = f"""
WITH {_POS_CTE},
p1 AS (SELECT doc_id, i FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) WHERE l[i] = 'hash'),
p2 AS (SELECT doc_id, i AS j FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) WHERE l[i] = 'join')
SELECT DISTINCT doc_id, 1.0 AS score FROM p1 JOIN p2 USING (doc_id)
WHERE j > i AND j - i - 1 <= 1
ORDER BY doc_id LIMIT 150
"""
    out["span_near_unordered"] = f"""
WITH {_POS_CTE},
p1 AS (SELECT doc_id, i FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) WHERE l[i] = 'join'),
p2 AS (SELECT doc_id, i AS j FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) WHERE l[i] = 'hash')
SELECT DISTINCT doc_id, 1.0 AS score FROM p1 JOIN p2 USING (doc_id)
WHERE i <> j AND greatest(i, j) - least(i, j) - 1 <= 1
ORDER BY doc_id LIMIT 200
"""
    out["span_first"] = f"""
WITH {_POS_CTE}
SELECT DISTINCT doc_id, 1.0 AS score FROM toks,
LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)
WHERE l[i] = 'spark' AND i <= 3
ORDER BY doc_id LIMIT 200
"""
    out["filtered_knn"] = """
WITH f AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
  ) WHERE term = 'vector'
),
x AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
  ) WHERE term = 'slow'
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
z AS (
  SELECT vec_id, unnest(e.embedding)::DOUBLE AS a, unnest(qv)::DOUBLE AS b
  FROM embeddings e, q
  WHERE vec_id IN (SELECT doc_id FROM f) AND vec_id NOT IN (SELECT doc_id FROM x)
),
s AS (
  SELECT vec_id, sum(a * b) AS dot, sum(a * a) AS na, sum(b * b) AS nq
  FROM z GROUP BY vec_id
)
SELECT vec_id, round(dot / (sqrt(na) * sqrt(nq)), 6) AS cos FROM s
ORDER BY dot / (sqrt(na) * sqrt(nq)) DESC, vec_id ASC LIMIT 15
"""
    out["regexp_query"] = _const_score_oracle(
        "regexp_matches(term, '^(?:(ha|jo)..)$')"
    )
    out["ngram_phrase"] = """
SELECT doc_id, 1.0 AS score FROM documents
WHERE strpos(text, 'vector') > 0
ORDER BY doc_id LIMIT 500
"""
    out["spellcheck"] = f"""
WITH {TOK_CTE},
df AS (SELECT term, count(DISTINCT doc_id) AS doc_freq FROM tok GROUP BY term)
SELECT term AS suggestion, doc_freq,
       damerau_levenshtein(term, 'quary')::INT AS distance
FROM df
WHERE term <> 'quary'
  AND length(term) BETWEEN 3 AND 7
  AND damerau_levenshtein(term, 'quary') <= 2
ORDER BY distance ASC, doc_freq DESC, suggestion ASC LIMIT 5
"""
    out["intervals_maxgaps"] = f"""
WITH {_POS_CTE},
p1 AS (SELECT doc_id, i FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) WHERE l[i] = 'sort'),
p2 AS (SELECT doc_id, i AS j FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) WHERE l[i] = 'scan')
SELECT DISTINCT doc_id, 1.0 AS score FROM p1 JOIN p2 USING (doc_id)
WHERE i <> j AND greatest(i, j) - least(i, j) - 1 <= 2
ORDER BY doc_id LIMIT 300
"""
    out["intervals_containing"] = f"""
WITH {_POS_CTE},
ph AS (SELECT doc_id, i FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) WHERE l[i] = 'hash'),
pj AS (SELECT doc_id, i AS j FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) WHERE l[i] = 'join'),
pm AS (SELECT doc_id, i AS m FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) WHERE l[i] = 'merge'),
pairs AS (SELECT doc_id, i, j FROM ph JOIN pj USING (doc_id) WHERE j > i),
minimal AS (
  SELECT * FROM pairs p WHERE NOT EXISTS (
    SELECT 1 FROM pairs q
    WHERE q.doc_id = p.doc_id AND q.i >= p.i AND q.j <= p.j
      AND (q.i > p.i OR q.j < p.j)
  )
)
SELECT DISTINCT doc_id, 1.0 AS score FROM minimal mi
WHERE EXISTS (
  SELECT 1 FROM pm WHERE pm.doc_id = mi.doc_id AND pm.m BETWEEN mi.i AND mi.j
)
ORDER BY doc_id LIMIT 300
"""
    _IV_MINIMAL_CTE = f"""{{pos_cte}},
ph AS (SELECT doc_id, i FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) WHERE l[i] = 'hash'),
pj AS (SELECT doc_id, i AS j FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) WHERE l[i] = 'join'),
pm AS (SELECT doc_id, i AS m FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) WHERE l[i] = 'merge'),
pairs AS (SELECT doc_id, i, j FROM ph JOIN pj USING (doc_id) WHERE j > i),
minimal AS (
  SELECT * FROM pairs p WHERE NOT EXISTS (
    SELECT 1 FROM pairs q
    WHERE q.doc_id = p.doc_id AND q.i >= p.i AND q.j <= p.j
      AND (q.i > p.i OR q.j < p.j)
  )
)"""

    out["intervals_before"] = f"""
WITH {_IV_MINIMAL_CTE.format(pos_cte=_POS_CTE)}
SELECT DISTINCT doc_id, 1.0 AS score FROM minimal mi
WHERE EXISTS (
  SELECT 1 FROM pm WHERE pm.doc_id = mi.doc_id AND pm.m > mi.j
)
ORDER BY doc_id LIMIT 300
"""

    out["intervals_not_containing"] = f"""
WITH {_IV_MINIMAL_CTE.format(pos_cte=_POS_CTE)}
SELECT DISTINCT doc_id, 1.0 AS score FROM minimal mi
WHERE NOT EXISTS (
  SELECT 1 FROM pm WHERE pm.doc_id = mi.doc_id AND pm.m BETWEEN mi.i AND mi.j
)
ORDER BY doc_id LIMIT 300
"""

    _GEO_CTE = """pts AS (
  SELECT doc_id,
         ((doc_id * 7919) % 18000) / 100.0 - 90.0 AS lat,
         ((doc_id * 104729) % 36000) / 100.0 - 180.0 AS lon
  FROM documents
)"""

    def _hav_sql(center_lat: float, center_lon: float) -> str:
        # identical expression shape to geo.haversine_meters (IEEE parity)
        return (
            f"(2 * 6371008.7714) * asin(sqrt("
            f"pow(sin(radians({center_lat} - lat) / 2), 2) + "
            f"cos(radians(lat)) * cos(radians({center_lat})) * "
            f"pow(sin(radians({center_lon} - lon) / 2), 2)))"
        )

    out["geo_box"] = f"""
WITH {_GEO_CTE}
SELECT doc_id, round(lat, 2) AS lat, round(lon, 2) AS lon FROM pts
WHERE lat BETWEEN 10.0 AND 45.0 AND lon BETWEEN -30.0 AND 60.0
ORDER BY doc_id LIMIT 400
"""
    from lucene_spark.search.geo import polygon_contains_sql

    out["geo_polygon"] = f"""
WITH {_GEO_CTE}
SELECT doc_id, round(lat, 2) AS lat, round(lon, 2) AS lon FROM pts
WHERE {polygon_contains_sql(_POLYGON)}
ORDER BY doc_id LIMIT 400
"""
    out["geo_distance"] = f"""
WITH {_GEO_CTE}
SELECT doc_id, round({_hav_sql(48.8566, 2.3522)}, 2) AS dist_m FROM pts
WHERE {_hav_sql(48.8566, 2.3522)} <= 2000000.0
ORDER BY doc_id LIMIT 500
"""
    out["geo_nearest"] = f"""
WITH {_GEO_CTE}
SELECT doc_id, round({_hav_sql(-33.8688, 151.2093)}, 3) AS distance_m FROM pts
ORDER BY {_hav_sql(-33.8688, 151.2093)} ASC, doc_id ASC LIMIT 20
"""
    from lucene_spark.search.geo3d import WGS84, oracle_geo3d_nearest_sql

    out["geo3d_nearest"] = oracle_geo3d_nearest_sql(
        -33.8688,
        151.2093,
        k=20,
        planet=WGS84,
        points_sql=(
            "SELECT doc_id, ((doc_id * 7919) % 18000) / 100.0 - 90.0 AS lat, "
            "((doc_id * 104729) % 36000) / 100.0 - 180.0 AS lon FROM documents"
        ),
    )
    out["dv_multi_range"] = """
SELECT doc_id, 1.0 AS score FROM (
  SELECT doc_id,
         [doc_id % 97, (doc_id * 7) % 89, (doc_id * 13) % 83] AS vals
  FROM documents
)
WHERE len(list_filter(vals, v -> (v BETWEEN 5 AND 10)
                               OR (v BETWEEN 40 AND 45)
                               OR (v BETWEEN 80 AND 82))) > 0
ORDER BY doc_id LIMIT 400
"""
    out["point_nearest"] = f"""
WITH {_GEO_CTE},
d AS (
  SELECT doc_id,
         (lat - 75.0) * (lat - 75.0) + (lon - 120.0) * (lon - 120.0) AS ds
  FROM pts
)
SELECT doc_id, round(ds, 6) AS dist_sq FROM d
ORDER BY ds ASC, doc_id ASC LIMIT 20
"""
    out["shingle_top"] = """
WITH toks AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS l FROM documents
),
sh AS (
  SELECT l[i] || ' ' || l[i + 1] AS shingle FROM toks,
  LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i)
)
SELECT shingle, count(*) AS cnt FROM sh
GROUP BY shingle ORDER BY cnt DESC, shingle ASC LIMIT 20
"""
    out["edge_ngram_terms"] = """
WITH toks AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS l FROM documents
),
terms AS (SELECT DISTINCT unnest(l) AS term FROM toks),
g AS (
  SELECT substr(term, 1, n) AS gram FROM terms,
  LATERAL (SELECT unnest(generate_series(2, least(4, length(term)))) AS n)
)
SELECT gram, count(*) AS nterms FROM g
GROUP BY gram ORDER BY gram LIMIT 500
"""
    out["rescore_phrase"] = oracle_rescore_sql(
        {"hash": 1.0, "join": 1.0}, ["hash", "join"], window=40, weight=2.0, k=15
    )
    out["feature_saturation"] = oracle_feature_sql(
        {"merge": 1.0, "sort": 1.0}, "n_chars / (n_chars + 500.0)", weight=0.5, k=20
    )
    out["facet_taxonomy_children"] = """
SELECT '' AS path, lang AS child, count(*) AS cnt FROM documents GROUP BY lang
UNION ALL
SELECT 'en' AS path, source AS child, count(*) AS cnt FROM documents
WHERE lang = 'en' GROUP BY source
"""
    out["suggest_infix"] = f"""
WITH {TOK_CTE},
t AS (SELECT term, count(DISTINCT doc_id) AS weight FROM tok GROUP BY term)
SELECT term, weight FROM t WHERE term LIKE '%ar%'
ORDER BY weight DESC, term ASC LIMIT 10
"""
    out["index_sorted_topk"] = """
SELECT doc_id, n_chars FROM documents
WHERE (' ' || text || ' ') LIKE '% hash %'
ORDER BY n_chars DESC, doc_id ASC LIMIT 10
"""
    # idf weights quantized to 1e-6 units (summed as integers) so the
    # passage ranking is order-independent — mirrors quantize=6
    out["best_passage"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l FROM documents
),
n AS (SELECT count(*) AS n_docs FROM documents),
dfq AS (
  SELECT term, CAST(round(ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * 1000000) AS BIGINT) AS w
  FROM (
    SELECT term, count(*) AS df FROM (
      SELECT DISTINCT doc_id, unnest(l) AS term FROM toks
    ) WHERE term IN ('hash', 'join') GROUP BY term
  ) CROSS JOIN n
),
hits AS (
  SELECT doc_id, CAST(((i - 1) // 8) * 8 + 1 AS INT) AS wstart, l[i] AS term
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)
  WHERE l[i] IN ('hash', 'join')
),
scored AS (
  SELECT doc_id, wstart, sum(w) AS q FROM hits JOIN dfq USING (term)
  GROUP BY doc_id, wstart
),
best AS (
  SELECT doc_id, wstart, q,
         row_number() OVER (PARTITION BY doc_id ORDER BY q DESC, wstart ASC) AS rn
  FROM scored
)
SELECT b.doc_id, b.wstart AS passage_start,
       round(b.q / 1000000.0, 4) AS passage_score,
       array_to_string(t.l[b.wstart : b.wstart + 7], ' ') AS passage
FROM best b JOIN toks t USING (doc_id)
WHERE rn = 1
ORDER BY round(b.q / 1000000.0, 4) DESC, b.doc_id ASC LIMIT 25
"""
    out["fvh_snippet"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l FROM documents
),
n AS (SELECT count(*) AS n_docs FROM documents),
dfq AS (
  SELECT term, CAST(round(ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * 1000000) AS BIGINT) AS w
  FROM (
    SELECT term, count(*) AS df FROM (
      SELECT DISTINCT doc_id, unnest(l) AS term FROM toks
    ) WHERE term IN ('merge', 'sort') GROUP BY term
  ) CROSS JOIN n
),
hits AS (
  SELECT doc_id, CAST(((i - 1) // 8) * 8 + 1 AS INT) AS wstart, l[i] AS term
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)
  WHERE l[i] IN ('merge', 'sort')
),
scored AS (
  SELECT doc_id, wstart, sum(w) AS q FROM hits JOIN dfq USING (term)
  GROUP BY doc_id, wstart
),
best AS (
  SELECT doc_id, wstart, q,
         row_number() OVER (PARTITION BY doc_id ORDER BY q DESC, wstart ASC) AS rn
  FROM scored
)
SELECT b.doc_id, b.wstart AS passage_start,
       round(b.q / 1000000.0, 4) AS passage_score,
       array_to_string(t.l[b.wstart : b.wstart + 7], ' ') AS passage
FROM best b JOIN toks t USING (doc_id)
WHERE rn = 1
ORDER BY round(b.q / 1000000.0, 4) DESC, b.doc_id ASC LIMIT 25
"""
    out["covering_query"] = f"""
WITH {TOK_CTE},
m AS (
  SELECT doc_id, count(DISTINCT term) AS nmatch FROM tok
  WHERE term IN ('hash', 'join', 'merge') GROUP BY doc_id
),
t AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 2 ELSE 3 END AS mm FROM documents)
SELECT m.doc_id, nmatch FROM m JOIN t USING (doc_id)
WHERE nmatch >= mm ORDER BY doc_id LIMIT 300
"""
    out["trending_terms"] = """
WITH d AS (
  SELECT CAST(floor((1704067200 + doc_id * 60) / 3600) * 3600 AS BIGINT) AS win_epoch,
         list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS l
  FROM documents
),
t AS (SELECT win_epoch, unnest(l) AS term FROM d),
c AS (SELECT win_epoch, term, count(*) AS cnt FROM t GROUP BY 1, 2),
r AS (
  SELECT win_epoch, term, cnt,
         row_number() OVER (PARTITION BY win_epoch ORDER BY cnt DESC, term ASC) AS rn
  FROM c
)
SELECT win_epoch, term, cnt FROM r WHERE rn <= 3
ORDER BY win_epoch, term LIMIT 1000
"""
    out["collapse_top_per_lang"] = oracle_collapse_sql(
        {"hash": 1.0, "join": 1.0}, "lang", k=10
    )
    out["query_count"] = f"""
WITH {TOK_CTE},
t AS (SELECT doc_id, list(DISTINCT term) AS terms FROM tok GROUP BY doc_id)
SELECT 'match_all' AS query, (SELECT count(*) FROM documents) AS cnt
UNION ALL SELECT 'term_hash', count(*) FROM t WHERE list_contains(terms, 'hash')
UNION ALL SELECT 'hash_and_join', count(*) FROM t
  WHERE list_contains(terms, 'hash') AND list_contains(terms, 'join')
UNION ALL SELECT 'hash_or_join', count(*) FROM t
  WHERE list_contains(terms, 'hash') OR list_contains(terms, 'join')
UNION ALL SELECT 'hash_not_join', count(*) FROM t
  WHERE list_contains(terms, 'hash') AND NOT list_contains(terms, 'join')
"""
    out["fuzzy_blended_topk"] = oracle_blended_fuzzy_sql("quer", max_edits=1, k=20)
    out["reader_stats"] = f"""
WITH {TOK_CTE},
d AS (SELECT term, count(DISTINCT doc_id) AS df, count(*) AS ttf FROM tok GROUP BY term)
SELECT (SELECT count(*) FROM documents) AS max_doc,
       CAST(sum(ttf) AS BIGINT) AS sum_ttf,
       count(*) AS unique_terms,
       CAST(sum(df) AS BIGINT) AS sum_doc_freq
FROM d
"""
    out["docs_only_topk"] = f"""
WITH {TOK_CTE},
dl AS (SELECT doc_id, count(DISTINCT term) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS sttf FROM dl),
dlq AS (SELECT doc_id, {_DLQ_CASE} AS dl_q FROM dl),
tf AS (SELECT DISTINCT doc_id, term FROM tok WHERE term IN ('hash', 'join')),
df AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
scores AS (
  SELECT tf.doc_id,
         sum(ln(1 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5))
             * 1.0 / (1.0 + 1.2 * (1 - 0.75 + 0.75 * dl_q / (sttf * 1.0 / n_docs)))) AS s
  FROM tf JOIN df USING (term) JOIN dlq USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY s DESC, doc_id ASC LIMIT 20
"""
    _BUCKET = (
        "('0x' || substr(md5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
        " % 1000000"
    )
    out["hash_sample"] = f"""
SELECT doc_id FROM documents
WHERE {_BUCKET.format(seed=7)} < 250000
ORDER BY doc_id LIMIT 3000
"""
    out["stratified_sample"] = f"""
SELECT doc_id, lang FROM documents
WHERE {_BUCKET.format(seed=3)} <
  CASE WHEN lang = 'en' THEN 500000 WHEN lang = 'de' THEN 100000 ELSE 0 END
ORDER BY doc_id LIMIT 3000
"""
    out["pack_sequences"] = """
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id,
         coalesce(sum(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS tokens_before
  FROM t
)
SELECT doc_id, CAST(floor(tokens_before / 50000) AS BIGINT) AS shard
FROM c ORDER BY doc_id LIMIT 10000
"""
    out["prefix_query"] = _const_score_oracle("term LIKE 's%'")
    out["wildcard_query"] = _const_score_oracle("regexp_matches(term, '^j.*n$')")
    out["fuzzy_query"] = _const_score_oracle(
        "length(term) BETWEEN 3 AND 5 AND damerau_levenshtein(term, 'quer') <= 1"
    )
    out["fuzzy_transpositions"] = _const_score_oracle(
        "length(term) BETWEEN 3 AND 5 AND damerau_levenshtein(term, 'jion') <= 1"
    )
    out["term_in_set"] = _const_score_oracle("term IN ('spark', 'flink', 'duck')")
    out["term_range"] = _const_score_oracle("term BETWEEN 'query' AND 'sort'")
    # the augmented "id..." tokens exist exactly on doc_id % 3 == 0 docs
    # (no base-vocab word starts with "id"), so the above-cap semi-join
    # match set is that residue class
    out["prefix_semijoin_topk"] = """
SELECT doc_id, 1.0 AS score FROM documents
WHERE doc_id % 3 = 0 ORDER BY doc_id LIMIT 2000
"""
    for _gate, _sim_f in _SIMILARITY_GATES.items():
        out[_gate] = oracle_similarity_sql(_SIM_TERMS, _sim_f(), k=20)

    from lucene_spark.search.fuzzylikethis import oracle_fuzzy_like_this_sql

    out["fuzzy_like_this"] = oracle_fuzzy_like_this_sql(
        ["merg", "jon"], k=20, max_edits=1, prefix_length=1, max_num_terms=10
    )

    # expected (term, pos) stream of the adversarial template: 'the'
    # (pos 0) is stopped but keeps its position increment
    _UAX_ROWS = [
        ("quick", 1), ("can''t", 2), ("3.14", 3), (None, 4),  # doc{d}
        ("มาก", 5), ("東", 6), ("京", 7), ("👍🏽", 8), ('מנכ"ל', 9), ("x_1", 10),
    ]
    _uax_parts = []
    for _t, _p in _UAX_ROWS:
        _term = f"'doc' || CAST(doc_id AS VARCHAR)" if _t is None else f"'{_t}'"
        _uax_parts.append(
            f"SELECT doc_id, {_term} AS term, {_p} AS pos FROM d"
        )
    out["uax29_tokens"] = (
        "WITH d AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 50)\n"
        + "\nUNION ALL ".join(_uax_parts)
        + "\nORDER BY doc_id, pos"
    )

    _URL_ROWS = [
        ("'visit'", 0),
        ("'https://site' || d || '.example.com/p?q=' || d", 1),
        ("'or'", 2),
        ("'mail'", 3),
        ("'user' || d || '@host' || d || '.org'", 4),
        ("'now'", 5),
    ]
    _url_parts = [
        f"SELECT doc_id, {expr} AS term, {p} AS pos FROM d"
        for expr, p in _URL_ROWS
    ]
    out["uax29_url_email"] = (
        "WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS d "
        "FROM documents ORDER BY doc_id LIMIT 50)\n"
        + "\nUNION ALL ".join(_url_parts)
        + "\nORDER BY doc_id, pos"
    )

    # 1-based list index i ↔ 0-based position i-1: p ∈ [3,10) ⇔ i ∈ [4,11)
    out["span_position_range"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents
)
SELECT DISTINCT doc_id, 1.0 AS score
FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)
WHERE l[i] = 'join' AND i >= 4 AND i < 11
ORDER BY doc_id LIMIT 300
"""

    # span window [i, i+2); exclusion widened by pre=1/post=1 → a
    # 'fast' at any position p with p+1 > i-1 and p < i+3 kills it
    out["span_not_match"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents
),
m AS (
  SELECT doc_id, i
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i)
  WHERE l[i] = 'hash' AND l[i + 1] = 'join'
),
ok AS (
  SELECT m.doc_id, m.i FROM m JOIN toks USING (doc_id)
  WHERE NOT EXISTS (
    SELECT 1 FROM (SELECT unnest(generate_series(1, len(toks.l))) AS p)
    WHERE toks.l[p] = 'fast' AND p + 1 > m.i - 1 AND p < m.i + 3
  )
)
SELECT DISTINCT doc_id, 1.0 AS score FROM ok
ORDER BY doc_id LIMIT 200
"""

    out["complex_phrase_match"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents
)
SELECT DISTINCT doc_id, 1.0 AS score
FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i)
WHERE l[i] LIKE 'ha%' AND l[i + 1] = 'join'
ORDER BY doc_id LIMIT 200
"""

    out["freetext_suggest"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents
),
uni AS (
  SELECT l[i] AS term, count(*) AS c
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)
  GROUP BY term
),
tot AS (SELECT sum(c) AS t FROM uni),
big AS (
  SELECT l[i] AS w1, l[i + 1] AS w2, count(*) AS c
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i)
  GROUP BY w1, w2
),
lvl1 AS (
  SELECT 'hash ' || w2 AS suggestion, w2 AS last_tok,
         c * 1.0 / (SELECT c FROM uni WHERE term = 'hash') AS score
  FROM big WHERE w1 = 'hash' AND w2 LIKE 's%'
),
lvl0 AS (
  SELECT 'hash ' || term AS suggestion, term AS last_tok,
         0.4 * c / (SELECT t FROM tot) AS score
  FROM uni
  WHERE term LIKE 's%' AND term NOT IN (SELECT last_tok FROM lvl1)
)
SELECT suggestion, round(score, 6) AS score
FROM (SELECT suggestion, score FROM lvl1
      UNION ALL SELECT suggestion, score FROM lvl0)
ORDER BY score DESC, suggestion ASC LIMIT 10
"""

    _HAN26 = "".join(chr(0x4E00 + i) for i in range(26))
    out["cjk_bigram_terms"] = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(
           string_split(translate(text, 'abcdefghijklmnopqrstuvwxyz', '{_HAN26}'), ' '),
           x -> x <> '')) AS tok
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN length(tok) = 1 THEN tok ELSE substr(tok, i, 2) END AS term
  FROM toks,
       LATERAL (SELECT unnest(generate_series(1, greatest(length(tok) - 1, 1))) AS i)
)
SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
FROM grams GROUP BY term
ORDER BY doc_freq DESC, term ASC LIMIT 20
"""

    out["phrase_query"] = """
SELECT doc_id, 1.0 AS score FROM documents
WHERE (' ' || text || ' ') LIKE '% hash join %'
ORDER BY doc_id LIMIT 100
"""
    out["phrase_bm25"] = oracle_phrase_sql(["hash", "join"], k=20)
    out["phrase_bm25_tri"] = oracle_phrase_sql(["slow", "hash", "batch"], k=15)
    out["synonym_query"] = oracle_synonym_sql(["hash", "merge"], k=20)
    out["dismax_query"] = oracle_dismax_sql(
        {"hash": 1.0, "join": 2.0, "scan": 1.5}, tie=0.3, k=20
    )
    out["search_after"] = oracle_search_after_sql({"spark": 1.0, "query": 1.0}, k=15)
    out["more_like_this"] = f"""
WITH {TOK_CTE},
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS sttf FROM dl),
dlq AS (SELECT doc_id, {_DLQ_CASE} AS dl_q FROM dl),
alldf AS (SELECT term, count(DISTINCT doc_id) AS doc_freq FROM tok GROUP BY term),
seed AS (
  SELECT term, count(*) AS tf FROM tok WHERE doc_id = 7 GROUP BY term
),
top_terms AS (
  SELECT seed.term
  FROM seed JOIN alldf USING (term) CROSS JOIN stats
  ORDER BY tf * ln(1 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5)) DESC,
           seed.term ASC
  LIMIT 5
),
tf AS (
  SELECT doc_id, term, count(*) AS freq FROM tok
  WHERE term IN (SELECT term FROM top_terms) GROUP BY doc_id, term
),
scores AS (
  SELECT tf.doc_id,
         sum(ln(1 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5)) * freq
             / (freq + 1.2 * (1 - 0.75 + 0.75 * dl_q / (sttf * 1.0 / n_docs)))) AS s
  FROM tf JOIN alldf USING (term) JOIN dlq USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY s DESC, doc_id ASC LIMIT 20
"""

    out["field_exists"] = """
SELECT doc_id FROM documents
WHERE text IS NOT NULL AND text <> '' ORDER BY doc_id LIMIT 1000
"""
    out["doc_id_assignment"] = """
SELECT doc_id AS orig_id,
       row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS sorted_id
FROM documents
"""
    out["term_vectors"] = f"""
WITH {TOK_CTE}
SELECT doc_id, term, count(*) AS freq FROM tok
WHERE doc_id < 10 GROUP BY doc_id, term ORDER BY doc_id, term
"""
    out["stored_fields"] = f"""
WITH {TOK_CTE},
hits AS (
  SELECT DISTINCT doc_id FROM tok WHERE term = 'vector'
  ORDER BY doc_id LIMIT 10
)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM hits JOIN documents d USING (doc_id) ORDER BY d.doc_id
"""
    out["collection_stats"] = f"""
WITH {TOK_CTE},
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id)
SELECT count(*) AS doc_count, CAST(sum(dl) AS BIGINT) AS sttf,
       sum(dl) * 1.0 / count(*) AS avgdl
FROM dl
"""
    out["term_stats"] = f"""
WITH {TOK_CTE}
SELECT term, count(DISTINCT doc_id) AS doc_freq, count(*) AS total_term_freq
FROM tok GROUP BY term
ORDER BY doc_freq DESC, term ASC LIMIT 10
"""
    # tombstoned docs excluded, stats untouched == the MUST_NOT oracle
    out["search_with_deletes"] = oracle_bm25_sql(
        {"hash": 1.0}, k=20, must_not_terms=["join"]
    )
    out["soft_deletes_search"] = oracle_bm25_sql(
        {"hash": 1.0},
        k=20,
        hide_doc_pred="term = 'scan' AND doc_id % 3 <> 0",
    )
    # payload = the token's split index; AveragePayloadFunction ≡ the
    # mean 0-based position of 'hash' per doc
    out["payload_avg_score"] = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
pos AS (
  SELECT doc_id, i - 1 AS p, l[i] AS term
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)
),
s AS (
  SELECT doc_id, avg(CAST(p AS DOUBLE)) AS a
  FROM pos WHERE term = 'hash' GROUP BY doc_id
)
SELECT doc_id, round(a, 4) AS score FROM s
ORDER BY a DESC, doc_id ASC LIMIT 20
"""
    _SURVIVORS = (
        "(SELECT * FROM documents WHERE doc_id NOT IN ("
        "SELECT doc_id FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term "
        "FROM documents) WHERE term = 'vector'))"
    )
    out["delete_reclaim_stats"] = f"""
WITH tok AS (SELECT doc_id, term FROM (SELECT doc_id,
  unnest(string_split(text, ' ')) AS term FROM {_SURVIVORS}) WHERE term <> ''),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id)
SELECT count(*) AS doc_count, CAST(sum(dl) AS BIGINT) AS sttf,
       sum(dl) * 1.0 / count(*) AS avgdl
FROM dl
"""
    out["term_topk_after_reclaim"] = oracle_bm25_sql(
        {"hash": 1.0}, k=20, table=_SURVIVORS
    )
    out["merge_on_flush_topk"] = oracle_bm25_sql(
        {"merge": 1.0, "scan": 0.5}, k=20
    )
    from lucene_spark.pipeline.dsir import oracle_dsir_sql

    out["dsir_resample"] = oracle_dsir_sql(
        raw_where="doc_id < 2000",
        target_where="lang = 'en'",
        k=200,
        n_buckets=4096,
        seed=42,
    )
    from lucene_spark.pipeline.lm import oracle_perplexity_sql

    out["lm_perplexity"] = oracle_perplexity_sql(
        k=0.1,
        ref_where="doc_id % 5 <> 0",
        score_where="doc_id < 1500",
        limit=300,
    )
    out["id_version_updates"] = """
WITH base AS (
  SELECT doc_id % 997 AS id, doc_id, doc_id AS version FROM documents
),
cur AS (
  SELECT id, doc_id, version FROM (
    SELECT *, row_number() OVER (
      PARTITION BY id ORDER BY version DESC, doc_id DESC) AS rn
    FROM base
  ) WHERE rn = 1
),
up0 AS (
  SELECT doc_id % 997 AS id, doc_id + 100000 AS doc_id,
         doc_id * 2 AS version
  FROM documents WHERE doc_id < 1500
),
up AS (
  SELECT id, doc_id, version FROM (
    SELECT *, row_number() OVER (
      PARTITION BY id ORDER BY version DESC, doc_id DESC) AS rn
    FROM up0
  ) WHERE rn = 1
)
SELECT coalesce(c.id, u.id) AS id,
       CASE WHEN u.version IS NOT NULL
                 AND (c.version IS NULL OR u.version > c.version)
            THEN u.doc_id ELSE c.doc_id END AS doc_id,
       greatest(coalesce(c.version, -4611686018427387904),
                coalesce(u.version, -4611686018427387904)) AS version
FROM cur c FULL OUTER JOIN up u ON c.id = u.id
ORDER BY id LIMIT 300
"""
    _battery_vals = ", ".join(f"('{w}')" for w in sorted(_STEM_BATTERY))
    _map_vals = ", ".join(
        f"('{w}', '{s}')" for w, s in sorted({**_STEM_MAP, **_STEM_BATTERY}.items())
    )
    out["porter_stem_tokens"] = f"""
WITH corpus AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS word FROM documents
),
words AS (
  SELECT word FROM corpus WHERE word <> ''
  UNION SELECT * FROM (VALUES {_battery_vals})
),
map(word, stem) AS (VALUES {_map_vals})
SELECT w.word, coalesce(m.stem, w.word) AS stem
FROM words w LEFT JOIN map m USING (word) ORDER BY w.word
"""
    _ENG_TOK_CTE = f"""tok AS (
  SELECT doc_id, {_STEM_CASE} AS term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
  ) WHERE term <> '' AND term NOT IN ('a', 'the')
)"""
    out["english_term_topk"] = f"""
WITH {_ENG_TOK_CTE},
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS sttf FROM dl),
dlq AS (SELECT doc_id, {_DLQ_CASE} AS dl_q FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS freq FROM tok
  WHERE term = 'merg' GROUP BY doc_id, term
),
df AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
scores AS (
  SELECT tf.doc_id,
         sum(ln(1 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5)) * freq
             / (freq + 1.2 * (1 - 0.75 + 0.75 * dl_q / (sttf * 1.0 / n_docs)))) AS s
  FROM tf JOIN df USING (term) JOIN dlq USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY s DESC, doc_id ASC LIMIT 20
"""
    out["english_term_stats"] = f"""
WITH {_ENG_TOK_CTE}
SELECT term, count(DISTINCT doc_id) AS doc_freq, count(*) AS total_term_freq
FROM tok GROUP BY term ORDER BY doc_freq DESC, term ASC LIMIT 10
"""
    out["doc_norms"] = f"""
WITH {TOK_CTE},
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id)
SELECT doc_id, dl, {_NORM_BYTE_CASE} AS norm_byte, {_DLQ_CASE} AS dl_q
FROM dl WHERE doc_id < 200
"""

    out["top_docs_by_chars"] = (
        "SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id ASC LIMIT 25"
    )
    out["facet_lang_counts"] = "SELECT lang, count(*) AS cnt FROM documents GROUP BY lang"
    out["facet_chars_histogram"] = (
        "SELECT CAST(floor(n_chars / 100) AS BIGINT) AS bucket, count(*) AS cnt "
        "FROM documents GROUP BY 1"
    )
    out["group_top2_per_lang"] = """
SELECT lang, doc_id, n_chars, rn FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents
) WHERE rn <= 2
"""
    out["distinct_sources_per_lang"] = (
        "SELECT lang, count(DISTINCT source) AS n_sources FROM documents GROUP BY lang"
    )
    out["events_hourly"] = """
SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
       count(*) AS cnt, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""
    out["events_windowed"] = """
SELECT event_type,
       CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) AS win_epoch,
       count(*) AS cnt, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""

    out["block_join_orders"] = """
WITH child AS (
  SELECT l_orderkey,
         round(max(l_extendedprice * (1.0 - l_discount)), 4) AS best_child,
         count(*) AS n_children
  FROM lineitem WHERE l_quantity > 30 GROUP BY l_orderkey
)
SELECT o_orderkey, o_orderstatus, best_child, n_children
FROM orders JOIN child ON o_orderkey = l_orderkey
ORDER BY best_child DESC, o_orderkey ASC LIMIT 20
"""
    out["join_customer_orders"] = """
WITH agg AS (
  SELECT o_custkey, round(sum(o_totalprice), 4) AS total_spent,
         count(*) AS n_orders
  FROM orders GROUP BY o_custkey
)
SELECT c_custkey, total_spent, n_orders
FROM customer JOIN agg ON c_custkey = o_custkey
ORDER BY total_spent DESC, c_custkey ASC LIMIT 25
"""
    out["drill_sideways"] = """
SELECT 'lang' AS dim, lang AS value, count(*) AS cnt
FROM documents WHERE source = 'src1' GROUP BY lang
UNION ALL
SELECT 'source' AS dim, source AS value, count(*) AS cnt
FROM documents WHERE lang = 'en' GROUP BY source
"""
    out["expression_score"] = """
SELECT doc_id,
       round(ln(1.0 + n_chars) * 0.5 + (doc_id % 7) * 0.1, 6) AS expr_score
FROM documents
ORDER BY ln(1.0 + n_chars) * 0.5 + (doc_id % 7) * 0.1 DESC, doc_id ASC LIMIT 20
"""
    out["suggest_prefix"] = f"""
WITH {TOK_CTE}
SELECT term, count(DISTINCT doc_id) AS doc_freq
FROM tok WHERE term LIKE 's%'
GROUP BY term ORDER BY doc_freq DESC, term ASC LIMIT 10
"""
    out["highlight_snippet"] = """
SELECT doc_id,
       substr(text, greatest(strpos(text, 'merge') - 15, 1), 40) AS snippet
FROM documents WHERE strpos(text, 'merge') > 0
ORDER BY doc_id LIMIT 50
"""
    out["point_range"] = """
SELECT doc_id, n_chars FROM documents
WHERE n_chars BETWEEN 200 AND 400 ORDER BY doc_id LIMIT 100
"""
    out["point_in_set"] = """
SELECT event_type, count(*) AS cnt, count(DISTINCT user_id) AS n_users
FROM events WHERE event_type IN ('click', 'view') GROUP BY event_type
"""
    out["sort_multi_field"] = """
SELECT doc_id, lang, n_chars FROM documents
ORDER BY lang ASC, n_chars DESC, doc_id ASC LIMIT 30
"""

    out["dedup_exact"] = (
        "SELECT md5(text) AS content_md5, count(*) AS n_dups, min(doc_id) AS keeper_id "
        "FROM documents GROUP BY 1"
    )
    out["minhash_signatures"] = _minhash_oracle(num_hashes=8, max_id=40)
    out["ngram_jaccard_pairs"] = f"""
WITH {_SHINGLE_CTE},
sh AS (SELECT * FROM shingles WHERE doc_id < 120),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.02
"""
    out["dedup_clusters"] = f"""
WITH RECURSIVE {_SHINGLE_CTE},
sh AS (SELECT * FROM shingles WHERE doc_id < 120),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= 0.02
),
und AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
reach AS (
  SELECT u, v FROM und
  UNION
  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u
)
SELECT u AS doc_id, least(u, min(v)) AS cluster_id
FROM reach GROUP BY u ORDER BY doc_id
"""
    out["simhash"] = _simhash_oracle()
    out["simhash_near_dups"] = _simhash_near_dups_oracle(max_hamming=3)

    out["embedding_cosine_topk"] = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
z AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS x, unnest(qv)::DOUBLE AS y
  FROM embeddings, q
),
s AS (
  SELECT vec_id, sum(x * y) AS dot, sum(x * x) AS na, sum(y * y) AS nq
  FROM z GROUP BY vec_id
)
SELECT vec_id, round(dot / (sqrt(na) * sqrt(nq)), 6) AS cos FROM s
ORDER BY dot / (sqrt(na) * sqrt(nq)) DESC, vec_id ASC LIMIT 15
"""
    # IVF with n_probes == n_lists degenerates to exact search, so the
    # brute-force oracle applies (the pruned variant is pytest-tested)
    out["embedding_ivf_topk"] = out["embedding_cosine_topk"]
    # factory-routed IVF8 probed at all 8 lists is likewise exact
    out["knn_factory_topk"] = out["embedding_cosine_topk"]
    # HNSW with ef >= segment size covers every segment → exact
    out["embedding_hnsw_topk"] = out["embedding_cosine_topk"]
    # seeded entry points do not change the covered-beam result set
    out["seeded_knn_topk"] = out["embedding_cosine_topk"]
    out["embedding_near_dups"] = """
WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300),
z AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         unnest(a.embedding)::DOUBLE AS x, unnest(b.embedding)::DOUBLE AS y
  FROM e a JOIN e b ON a.vec_id < b.vec_id
),
s AS (
  SELECT vec_a, vec_b, sum(x * y) AS dot, sum(x * x) AS na, sum(y * y) AS nb
  FROM z GROUP BY vec_a, vec_b
)
SELECT vec_a, vec_b, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cos FROM s
WHERE round(dot / (sqrt(na) * sqrt(nb)), 6) >= 0.4
"""

    _stoplist = (
        "'a','an','and','are','as','at','be','but','by','for','if','in','into',"
        "'is','it','no','not','of','on','or','such','that','the','their','then',"
        "'there','these','they','this','to','was','will','with'"
    )
    out["lang_id"] = f"""
WITH {TOK_CTE},
st AS (
  SELECT doc_id, count(*) AS n,
         sum(CASE WHEN term IN ({_stoplist}) THEN 1 ELSE 0 END) AS stop_hits
  FROM tok GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN regexp_matches(d.text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
            WHEN regexp_matches(d.text, '[\\x{{ac00}}-\\x{{d7af}}]') THEN 'ko'
            WHEN regexp_matches(d.text, '[\\x{{3040}}-\\x{{30ff}}]') THEN 'ja'
            WHEN coalesce(st.n, 0) > 0 AND st.stop_hits * 1.0 / st.n >= 0.08 THEN 'en'
            ELSE 'unk' END AS lang_guess
FROM documents d LEFT JOIN st ON d.doc_id = st.doc_id
"""
    out["quality_score"] = f"""
WITH {TOK_CTE},
st AS (
  SELECT doc_id, count(*) AS n, count(DISTINCT term) AS n_distinct,
         sum(CASE WHEN term IN ({_stoplist}) THEN 1 ELSE 0 END) AS stop_hits
  FROM tok GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(st.n, 0) AS n_tokens,
       round(CASE WHEN coalesce(st.n, 0) > 0 THEN length(d.text) * 1.0 / st.n ELSE 0 END, 6) AS mean_token_len,
       round(CASE WHEN coalesce(st.n, 0) > 0 THEN st.stop_hits * 1.0 / st.n ELSE 0 END, 6) AS stopword_ratio,
       round(CASE WHEN coalesce(st.n, 0) > 0 THEN st.n_distinct * 1.0 / st.n ELSE 0 END, 6) AS distinct_ratio,
       round(
         (CASE WHEN coalesce(st.n, 0) BETWEEN 10 AND 5000 THEN 0.25 ELSE 0 END)
         + (CASE WHEN coalesce(st.n, 0) > 0 AND length(d.text) * 1.0 / st.n BETWEEN 3.0 AND 12.0 THEN 0.25 ELSE 0 END)
         + (CASE WHEN coalesce(st.n, 0) > 0 AND st.stop_hits * 1.0 / st.n BETWEEN 0.05 AND 0.6 THEN 0.25 ELSE 0 END)
         + (CASE WHEN coalesce(st.n, 0) > 0 THEN st.n_distinct * 1.0 / st.n ELSE 0 END) * 0.25, 6) AS quality
FROM documents d LEFT JOIN st ON d.doc_id = st.doc_id
"""
    out["token_counts"] = """
WITH w AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS ws_tokens,
         len(list_filter(string_split_regex(text, '[^0-9A-Za-z]+'), x -> x <> '')) AS word_pieces,
         length(text) AS n_chars
  FROM documents
)
SELECT doc_id, ws_tokens, word_pieces, n_chars FROM w
"""
    out["fingerprint_md5"] = """
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(
         list_filter(string_split(text, ' '), x -> x <> ''))), ' ')) AS fingerprint
FROM documents
"""

    # Rabin-Karp mod 2^31-1 over 8-codepoint windows, Horner-nested so
    # every intermediate fits BIGINT — bit-identical to the numpy kernel
    horner = "0::BIGINT"
    for t in range(8):
        horner = f"(({horner}) * 257 + unicode(ch[j + {t}])) % 2147483647"
    out["rolling_fingerprint"] = f"""
WITH c AS (
  SELECT doc_id, regexp_split_to_array(text, '') AS ch FROM documents
  WHERE doc_id < 50
),
pos AS (
  SELECT doc_id, ch, unnest(generate_series(1, len(ch) - 7)) AS j
  FROM c WHERE len(ch) >= 8
),
h AS (SELECT doc_id, {horner} AS hv FROM pos),
mn AS (SELECT doc_id, min(hv) AS rolling_fp FROM h GROUP BY doc_id)
SELECT c.doc_id, coalesce(mn.rolling_fp, 0) AS rolling_fp
FROM c LEFT JOIN mn ON c.doc_id = mn.doc_id
"""

    # --- round-4 additions ---------------------------------------------------
    out["span_or_near"] = f"""
WITH {_POS_CTE},
p1 AS (SELECT doc_id, i FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)
       WHERE l[i] IN ('hash', 'merge')),
p2 AS (SELECT doc_id, i AS j FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) WHERE l[i] = 'join')
SELECT DISTINCT doc_id, 1.0 AS score FROM p1 JOIN p2 USING (doc_id)
WHERE j > i AND j - i - 1 <= 2
ORDER BY doc_id LIMIT 200
"""
    out["span_containing"] = f"""
WITH {_POS_CTE},
ph AS (SELECT doc_id, i FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) WHERE l[i] = 'hash'),
pj AS (SELECT doc_id, i AS j FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) WHERE l[i] = 'join'),
pm AS (SELECT doc_id, i AS m FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) WHERE l[i] = 'merge'),
big AS (SELECT doc_id, i, j FROM ph JOIN pj USING (doc_id)
        WHERE j > i AND j - i - 1 <= 6)
SELECT DISTINCT doc_id, 1.0 AS score FROM big
WHERE EXISTS (SELECT 1 FROM pm WHERE pm.doc_id = big.doc_id
              AND pm.m >= big.i AND pm.m <= big.j)
ORDER BY doc_id LIMIT 200
"""
    out["range_field_overlap"] = """
WITH r AS (
  SELECT value AS rmin, value + (user_id % 10) + 1.0 AS rmax FROM events
)
SELECT
  CAST(sum(CASE WHEN rmin <= 7.0 AND rmax >= 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS intersects,
  CAST(sum(CASE WHEN 3.0 <= rmin AND rmax <= 7.0 THEN 1 ELSE 0 END) AS BIGINT) AS within,
  CAST(sum(CASE WHEN rmin <= 3.0 AND 7.0 <= rmax THEN 1 ELSE 0 END) AS BIGINT) AS contains,
  CAST(sum(CASE WHEN (rmin <= 7.0 AND rmax >= 3.0)
             AND NOT (3.0 <= rmin AND rmax <= 7.0) THEN 1 ELSE 0 END) AS BIGINT) AS crosses
FROM r
"""
    _fs_ctes = _bm25_scored_ctes({"hash": 1.0, "join": 0.5})
    out["function_score_topk"] = f"""
WITH {_fs_ctes}
SELECT f.doc_id, round(f.s * (d.n_chars / (d.n_chars + 100.0)), 4) AS score
FROM first f JOIN documents d USING (doc_id)
ORDER BY f.s * (d.n_chars / (d.n_chars + 100.0)) DESC, f.doc_id ASC LIMIT 12
"""
    _bbq_ctes = _bm25_scored_ctes({"hash": 1.0})
    out["boost_by_query"] = f"""
WITH {_bbq_ctes},
bq AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'scan')
SELECT f.doc_id,
       round(CASE WHEN f.doc_id IN (SELECT doc_id FROM bq)
                  THEN f.s * 3.0 ELSE f.s END, 4) AS score
FROM first f
ORDER BY CASE WHEN f.doc_id IN (SELECT doc_id FROM bq)
              THEN f.s * 3.0 ELSE f.s END DESC, f.doc_id ASC LIMIT 12
"""
    out["search_after_sorted"] = """
SELECT doc_id, lang, n_chars FROM documents
ORDER BY lang ASC, n_chars DESC, doc_id ASC LIMIT 15 OFFSET 15
"""
    # prefix lengths with |len - len(key)| <= max_edits can be within
    # distance (DL >= length difference) — same bound the engine uses
    out["suggest_fuzzy"] = f"""
WITH {TOK_CTE},
df AS (SELECT term, count(DISTINCT doc_id) AS doc_freq FROM tok GROUP BY term),
cand AS (SELECT term, doc_freq FROM df
         WHERE substr(term, 1, 1) = 's' AND length(term) >= 3),
hit AS (
  SELECT DISTINCT term, doc_freq FROM cand,
  LATERAL (SELECT unnest(generate_series(3, least(length(term), 7))) AS plen)
  WHERE damerau_levenshtein(substr(term, 1, plen), 'sparl') <= 2
)
SELECT term, doc_freq AS weight FROM hit
ORDER BY weight DESC, term ASC LIMIT 8
"""
    out["embedding_hnsw_quantized_topk"] = out["embedding_cosine_topk"]
    out["embedding_ivf_quantized_topk"] = out["embedding_cosine_topk"]
    out["blended_infix"] = """
WITH s AS (
  SELECT array_to_string(list_slice(string_split(text, ' '), 1, 6), ' ')
           AS suggestion,
         n_chars AS weight
  FROM documents
),
m AS (
  SELECT suggestion, weight,
         (SELECT min(i) - 1
          FROM (SELECT unnest(generate_series(1, len(string_split(suggestion, ' ')))) AS i)
          WHERE substr(string_split(suggestion, ' ')[i], 1, 3) = 'mer') AS p
  FROM s
)
SELECT suggestion,
       CAST(trunc(weight * (1.0 / (p + 1.0))) AS BIGINT) AS score
FROM m WHERE p IS NOT NULL
ORDER BY score DESC, suggestion ASC LIMIT 12
"""
    from lucene_spark.search.shape import (
        oracle_line_box_sql,
        oracle_polygon_box_sql,
    )

    _box = (-2.0, 1.0, -1.0, 2.0)
    out["shape_box_relations"] = f"""
WITH shp AS (
  SELECT doc_id,
         list_transform(generate_series(0, 3),
           j -> ((doc_id * 37 + j * 59) % 40) / 8.0 - 2.5) AS lats,
         list_transform(generate_series(0, 3),
           j -> ((doc_id * 23 + j * 83) % 40) / 8.0 - 2.5) AS lons
  FROM documents WHERE doc_id < 400
)
SELECT
  CAST(sum(CASE WHEN {oracle_line_box_sql('lats', 'lons', _box, 'intersects')}
           THEN 1 ELSE 0 END) AS BIGINT) AS line_intersects,
  CAST(sum(CASE WHEN {oracle_line_box_sql('lats', 'lons', _box, 'within')}
           THEN 1 ELSE 0 END) AS BIGINT) AS line_within,
  CAST(sum(CASE WHEN {oracle_line_box_sql('lats', 'lons', _box, 'disjoint')}
           THEN 1 ELSE 0 END) AS BIGINT) AS line_disjoint,
  CAST(sum(CASE WHEN {oracle_polygon_box_sql('lats', 'lons', _box, 'intersects')}
           THEN 1 ELSE 0 END) AS BIGINT) AS poly_intersects
FROM shp
"""
    _sb_rows = ", ".join(
        f"('{lg}', '{w}', '{s}')" for lg, w, s in _SNOWBALL_BATTERY
    )
    out["snowball_stems"] = f"""
SELECT lang, word, stem FROM (VALUES {_sb_rows}) AS t(lang, word, stem)
ORDER BY lang, word
"""
    _ls_rows = ", ".join(
        f"('{lg}', '{w}', '{s}')" for lg, w, s in _LIGHT_BATTERY
    )
    out["light_stems"] = f"""
SELECT lang, word, stem FROM (VALUES {_ls_rows}) AS t(lang, word, stem)
ORDER BY lang, word
"""
    _nz_rows = ", ".join(
        "('{}', '{}', '{}')".format(
            k, w.replace("'", "''"), s.replace("'", "''")
        )
        for k, w, s in _NORMALIZE_BATTERY
    )
    out["normalize_terms"] = f"""
SELECT kind, word, norm FROM (VALUES {_nz_rows}) AS t(kind, word, norm)
ORDER BY kind, word
"""
    _rslp_rows = ", ".join(
        "('{}', '{}', '{}')".format(k, w, s) for k, w, s in _RSLP_BATTERY
    )
    out["rslp_stems"] = f"""
SELECT kind, word, stem FROM (VALUES {_rslp_rows}) AS t(kind, word, stem)
ORDER BY kind, word
"""
    _un_rows = ", ".join(
        "('{}', '{}', '{}')".format(k, w, s) for k, w, s in _UNINE_BATTERY
    )
    out["unine_stems"] = f"""
SELECT kind, word, stem FROM (VALUES {_un_rows}) AS t(kind, word, stem)
ORDER BY kind, word
"""
    out["facet_set_counts"] = """
WITH s AS (
  SELECT l_orderkey AS doc,
         CAST(l_quantity AS BIGINT) AS d0,
         CAST(month(l_shipdate) AS BIGINT) AS d1
  FROM lineitem
), m AS (
  SELECT doc,
         CASE WHEN d0 = 17 AND d1 = 3 THEN 1 ELSE 0 END AS m0,
         CASE WHEN d0 = 36 AND d1 = 6 THEN 1 ELSE 0 END AS m1,
         CASE WHEN d0 BETWEEN 10 AND 20 AND d1 BETWEEN 1 AND 6
              THEN 1 ELSE 0 END AS m2,
         CASE WHEN d0 BETWEEN 1 AND 50 AND d1 = 12
              THEN 1 ELSE 0 END AS m3
  FROM s
)
SELECT label, cnt FROM (
  SELECT 'qty17_mar' AS label, CAST(SUM(m0) AS BIGINT) AS cnt FROM m
  UNION ALL SELECT 'qty36_jun', CAST(SUM(m1) AS BIGINT) FROM m
  UNION ALL SELECT 'q10_20_h1', CAST(SUM(m2) AS BIGINT) FROM m
  UNION ALL SELECT 'q1_50_dec', CAST(SUM(m3) AS BIGINT) FROM m
  UNION ALL SELECT '__total__', CAST(COUNT(DISTINCT doc) AS BIGINT) FROM m
            WHERE m0 + m1 + m2 + m3 > 0
) ORDER BY label
"""
    _br_rows = ", ".join(
        "('{}', '{}')".format(w, s) for w, s in _BR_BATTERY
    )
    out["brazilian_stems"] = f"""
SELECT word, stem FROM (VALUES {_br_rows}) AS t(word, stem)
ORDER BY word
"""
    out["date_range_day_facets"] = """
WITH r AS (
  SELECT ts AS s,
         ts + ((event_id % 72 + 1) * INTERVAL 1 HOUR) AS e
  FROM events
)
SELECT bucket, CAST(count(*) AS BIGINT) AS cnt FROM (
  SELECT unnest(generate_series(date_trunc('day', s),
                                date_trunc('day', e),
                                INTERVAL 1 DAY)) AS bucket
  FROM r
) GROUP BY bucket ORDER BY bucket
"""
    out["date_range_relations"] = """
WITH r AS (
  SELECT ts AS s,
         ts + ((event_id % 72 + 1) * INTERVAL 1 HOUR) AS e
  FROM events
), q AS (
  SELECT TIMESTAMP '2024-01-10 00:00:00' AS qs,
         TIMESTAMP '2024-01-15 00:00:00' AS qe
)
SELECT relation, cnt FROM (
  SELECT 'intersects' AS relation,
         CAST(SUM(CASE WHEN s <= qe AND e >= qs THEN 1 ELSE 0 END)
              AS BIGINT) AS cnt FROM r, q
  UNION ALL
  SELECT 'within',
         CAST(SUM(CASE WHEN s >= qs AND e <= qe THEN 1 ELSE 0 END)
              AS BIGINT) FROM r, q
  UNION ALL
  SELECT 'contains',
         CAST(SUM(CASE WHEN s <= qs AND e >= qe THEN 1 ELSE 0 END)
              AS BIGINT) FROM r, q
  UNION ALL
  SELECT 'disjoint',
         CAST(SUM(CASE WHEN s > qe OR e < qs THEN 1 ELSE 0 END)
              AS BIGINT) FROM r, q
) ORDER BY relation
"""
    out["min_hash_signatures"] = """
SELECT doc, slot, sig
FROM (VALUES ('d1', 0, '0:2101d33dfa858059219da1c1d671676f'), ('d1', 1, '0:8dfbf7e1a805de0bcc3c85b7e24ea53e'), ('d1', 2, '0:8dfbf7e1a805de0bcc3c85b7e24ea53e'), ('d1', 3, '0:2101d33dfa858059219da1c1d671676f'), ('d1', 4, '1:41f7e3349a703a4e1981437c2909d182'), ('d1', 5, '1:41f7e3349a703a4e1981437c2909d182'), ('d1', 6, '1:aef207d847f09800c420277234e70f51'), ('d1', 7, '1:41f7e3349a703a4e1981437c2909d182'), ('d1', 8, '2:5bc6fbcadda3bf4924e6589789ce8843'), ('d1', 9, '2:5bc6fbcadda3bf4924e6589789ce8843'), ('d1', 10, '2:c8c1206e8b241cfbcf853c8d95abc612'), ('d1', 11, '2:c8c1206e8b241cfbcf853c8d95abc612'), ('d2', 0, '0:2baccf1bcf79ad671412dd287c180ec4'), ('d2', 1, '0:46d05a403baf34f4964db0667bace8eb'), ('d2', 2, '0:ba54ded769c6c3c6629d1671a97e1638'), ('d2', 3, '0:2baccf1bcf79ad671412dd287c180ec4'), ('d2', 4, '1:4ca2df126f64675c0bf67ee2ceb078d7'), ('d2', 5, '1:4ca2df126f64675c0bf67ee2ceb078d7'), ('d2', 6, '1:db4aeece09b17dbb5a80b82bfc16804b'), ('d2', 7, '1:db4aeece09b17dbb5a80b82bfc16804b'), ('d2', 8, '2:6671f7a8b297ec57175b93fe2f752f98'), ('d2', 9, '2:6671f7a8b297ec57175b93fe2f752f98'), ('d2', 10, '2:819582cd1ecd73e49996673c2f0a09bf'), ('d2', 11, '2:f51a07644ce502b665e5cd475cdb370c'), ('d3', 0, '0:caebae162c8d02ecb3426b8e18ba20ae'), ('d3', 1, '0:caebae162c8d02ecb3426b8e18ba20ae'), ('d3', 2, '0:caebae162c8d02ecb3426b8e18ba20ae'), ('d3', 3, '0:caebae162c8d02ecb3426b8e18ba20ae'), ('d3', 4, '1:ebe1be0ccc77bce1ab260d486b528ac1'), ('d3', 5, '1:ebe1be0ccc77bce1ab260d486b528ac1'), ('d3', 6, '1:ebe1be0ccc77bce1ab260d486b528ac1'), ('d3', 7, '1:ebe1be0ccc77bce1ab260d486b528ac1'), ('d3', 8, '2:05b0d6a30fab41dcb68b2263cc174182'), ('d3', 9, '2:05b0d6a30fab41dcb68b2263cc174182'), ('d3', 10, '2:05b0d6a30fab41dcb68b2263cc174182'), ('d3', 11, '2:05b0d6a30fab41dcb68b2263cc174182'), ('d4', 0, '0:92a406e4b663eb4db7ffbbdc38258f0a'), ('d4', 1, '0:92a406e4b663eb4db7ffbbdc38258f0a'), ('d4', 2, '0:92a406e4b663eb4db7ffbbdc38258f0a'), ('d4', 3, '0:92a406e4b663eb4db7ffbbdc38258f0a'), ('d4', 4, '1:b39a16db564ea542afe35d968abdf91d'), ('d4', 5, '1:b39a16db564ea542afe35d968abdf91d'), ('d4', 6, '1:b39a16db564ea542afe35d968abdf91d'), ('d4', 7, '1:c8333b6d3c5cdd84d4d281c03de31c44'), ('d4', 8, '2:cd692f7199822a3dbb4872b1eb82afde'), ('d4', 9, '2:cd692f7199822a3dbb4872b1eb82afde'), ('d4', 10, '2:cd692f7199822a3dbb4872b1eb82afde'), ('d4', 11, '2:cd692f7199822a3dbb4872b1eb82afde')) AS t(doc, slot, sig)
ORDER BY doc, slot
"""
    _mfb_rows = ", ".join(
        "('{}', '{}', '{}')".format(k, w, o) for k, w, o in _MISCF_BATTERY
    )
    out["misc_filter_terms"] = f"""
SELECT kind, word, out FROM (VALUES {_mfb_rows}) AS t(kind, word, out)
ORDER BY kind, word
"""
    out["quality_eval"] = """
WITH run AS (
  SELECT q.query_id, d.doc_id,
         CAST(length(d.text) % 101 AS DOUBLE) AS score
  FROM documents d
  JOIN (VALUES ('spark'), ('merge'), ('window')) AS q(query_id)
    ON d.text LIKE '%' || q.query_id || '%'
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
  FROM run
), judg AS (
  SELECT query_id, doc_id,
         CASE WHEN doc_id % 10 = 0 THEN 2 ELSE 1 END AS grade
  FROM run WHERE doc_id % 5 = 0
), totals AS (
  SELECT query_id, count(*) AS max_good,
         SUM(CASE WHEN jrank <= 10
                  THEN grade / log2(jrank + 1) ELSE 0 END) AS idcg
  FROM (SELECT query_id, grade, row_number() OVER (
          PARTITION BY query_id ORDER BY grade DESC, doc_id ASC) AS jrank
        FROM judg)
  GROUP BY query_id
), hits AS (
  SELECT r.query_id, r.doc_id, r.rank,
         COALESCE(j.grade, 0) AS grade,
         CASE WHEN COALESCE(j.grade, 0) > 0 THEN 1 ELSE 0 END AS rel
  FROM ranked r LEFT JOIN judg j USING (query_id, doc_id)
), cum AS (
  SELECT *, SUM(rel) OVER (
    PARTITION BY query_id ORDER BY rank
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rel
  FROM hits
), per_q AS (
  SELECT query_id,
    SUM(CASE WHEN rank <= 10 THEN rel ELSE 0 END) / 10.0 AS p_at_k,
    SUM(CASE WHEN rank <= 10 THEN rel ELSE 0 END) AS rel_at_k,
    SUM(CASE WHEN rel = 1 THEN CAST(cum_rel AS DOUBLE) / rank
             ELSE 0 END) AS sum_prec,
    MIN(CASE WHEN rel = 1 THEN rank END) AS first_rel,
    SUM(CASE WHEN rank <= 10 AND grade > 0
             THEN grade / log2(rank + 1) ELSE 0 END) AS dcg
  FROM cum GROUP BY query_id
)
SELECT p.query_id,
  ROUND(p.p_at_k, 6) AS p_at_k,
  ROUND(p.rel_at_k / GREATEST(t.max_good, 1), 6) AS recall_at_k,
  ROUND(p.sum_prec / GREATEST(t.max_good, 1), 6) AS ap,
  ROUND(CASE WHEN p.first_rel <= 5 THEN 1.0 / p.first_rel
             ELSE 0.0 END, 6) AS mrr,
  ROUND(CASE WHEN t.idcg > 0 THEN p.dcg / t.idcg ELSE 0.0 END, 6)
    AS ndcg_at_k
FROM per_q p LEFT JOIN totals t USING (query_id)
ORDER BY query_id
"""
    _ph_rows = ", ".join(
        "('{}', '{}', '{}')".format(k, w, c) for k, w, c in _PHON_BATTERY
    )
    out["phonetic_codecs"] = f"""
SELECT kind, word, code FROM (VALUES {_ph_rows}) AS t(kind, word, code)
ORDER BY kind, word
"""
    _dm_rows = ", ".join(
        "('{}', '{}', '{}')".format(w, pp, aa) for w, pp, aa in _DM_BATTERY
    )
    out["double_metaphone_codes"] = f"""
SELECT word, "primary", alternate
FROM (VALUES {_dm_rows}) AS t(word, "primary", alternate)
ORDER BY word
"""
    _fr_tok_rows = ", ".join(
        f"({i}, '{t}')" for i, toks in enumerate(_FR_STEMS) for t in toks
    )
    out["french_term_topk"] = f"""
WITH g(i, term) AS (VALUES {_fr_tok_rows}),
d AS (SELECT doc_id, doc_id % {len(_FR_SENTS)} AS i FROM documents
      WHERE doc_id < 400),
tok AS (SELECT d.doc_id, g.term FROM d JOIN g USING (i)),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS sttf FROM dl),
dlq AS (SELECT doc_id, {_DLQ_CASE} AS dl_q FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS freq FROM tok
  WHERE term = 'nation' GROUP BY doc_id, term
),
df AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
scores AS (
  SELECT tf.doc_id,
         sum(ln(1 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5)) * freq
             / (freq + 1.2 * (1 - 0.75 + 0.75 * dl_q / (sttf * 1.0 / n_docs)))) AS s
  FROM tf JOIN df USING (term) JOIN dlq USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY s DESC, doc_id ASC LIMIT 20
"""
    _ja_rows = ", ".join(
        f"({i}, '{tok}')"
        for i, (_, toks) in enumerate(_JA_GOLDEN)
        for tok in toks
    )
    _ko_rows = ", ".join(
        f"({i}, '{tok}')"
        for i, (_, toks) in enumerate(_KO_GOLDEN)
        for tok in toks
    )
    out["ja_morph_tokens"] = f"""
WITH g(i, term) AS (VALUES {_ja_rows}),
d AS (SELECT doc_id % {len(_JA_GOLDEN)} AS i, count(*) AS nd
      FROM documents WHERE doc_id < 500 GROUP BY 1)
SELECT term, CAST(sum(nd) AS BIGINT) AS n
FROM g JOIN d USING (i) GROUP BY term ORDER BY term
"""
    out["ko_morph_tokens"] = f"""
WITH g(i, term) AS (VALUES {_ko_rows}),
d AS (SELECT doc_id % {len(_KO_GOLDEN)} AS i, count(*) AS nd
      FROM documents WHERE doc_id < 500 GROUP BY 1)
SELECT term, CAST(sum(nd) AS BIGINT) AS n
FROM g JOIN d USING (i) GROUP BY term ORDER BY term
"""
    _zh_rows = ", ".join(
        f"({i}, '{tok}')"
        for i, (_, toks) in enumerate(_ZH_GOLDEN)
        for tok in toks
    )
    out["zh_smart_tokens"] = f"""
WITH g(i, term) AS (VALUES {_zh_rows}),
d AS (SELECT doc_id % {len(_ZH_GOLDEN)} AS i, count(*) AS nd
      FROM documents WHERE doc_id < 500 GROUP BY 1)
SELECT term, CAST(sum(nd) AS BIGINT) AS n
FROM g JOIN d USING (i) GROUP BY term ORDER BY term
"""
    _th_rows = ", ".join(
        f"({i}, '{tok}')"
        for i, (_, toks) in enumerate(_TH_GOLDEN)
        for tok in toks
    )
    out["thai_tokens"] = f"""
WITH g(i, term) AS (VALUES {_th_rows}),
d AS (SELECT doc_id % {len(_TH_GOLDEN)} AS i, count(*) AS nd
      FROM documents WHERE doc_id < 500 GROUP BY 1)
SELECT term, CAST(sum(nd) AS BIGINT) AS n
FROM g JOIN d USING (i) GROUP BY term ORDER BY term
"""
    _icu_case = " ".join(
        f"WHEN {i} THEN '{folded}'" for i, (_, folded) in enumerate(_ICU_PAIRS)
    )
    out["icu_folding"] = f"""
SELECT CASE (doc_id % {len(_ICU_PAIRS)}) {_icu_case} END AS term,
       CAST(count(*) AS BIGINT) AS n
FROM documents WHERE doc_id < 600
GROUP BY 1 ORDER BY 1
"""
    _pl_word_case = " ".join(
        f"WHEN {i} THEN '{w}'" for i, (w, _) in enumerate(_PL_STEM_PAIRS)
    )
    _pl_stem_case = " ".join(
        f"WHEN {i} THEN '{s}'" for i, (_, s) in enumerate(_PL_STEM_PAIRS)
    )
    out["polish_stem_terms"] = f"""
SELECT CASE (doc_id % {len(_PL_STEM_PAIRS)}) {_pl_word_case} END AS word,
       CASE (doc_id % {len(_PL_STEM_PAIRS)}) {_pl_stem_case} END AS stem,
       CAST(count(*) AS BIGINT) AS n
FROM documents WHERE doc_id < 600
GROUP BY 1, 2 ORDER BY word
"""
    _onlp_rows = ", ".join(
        f"({i}, '{t}', '{p}', '{c}', '{l}')" for i, t, p, c, l in _ONLP_GOLDENS
    )
    out["opennlp_pos_chunks"] = f"""
WITH g(i, term, pos, chunk, lemma) AS (VALUES {_onlp_rows}),
d AS (SELECT CAST(doc_id % {len(_ONLP_SENTS)} AS INT) AS i, count(*) AS nd
      FROM documents WHERE doc_id < 600 GROUP BY 1)
SELECT g.i, g.term, g.pos, g.chunk, g.lemma, CAST(sum(d.nd) AS BIGINT) AS n
FROM g JOIN d USING (i)
GROUP BY 1, 2, 3, 4, 5 ORDER BY g.i, g.term, g.pos, g.chunk, g.lemma
"""
    _chunk_sent_rows = ", ".join(
        f"({i}, {si}, '{s}')" for i, si, s in _CHUNK_SENTS
    )
    out["sentence_chunks"] = f"""
WITH s(i, si, sentence) AS (VALUES {_chunk_sent_rows}),
d AS (SELECT doc_id, CAST(doc_id % {len(_CHUNK_TEXTS)} AS INT) AS i
      FROM documents WHERE doc_id < 300),
m AS (
  SELECT d.doc_id, s.si, s.sentence,
         CAST(unnest(generate_series(
           GREATEST(0, CAST(ceil((s.si - 2) / 2.0) AS INT)),
           CAST(floor(s.si / 2.0) AS INT))) AS INT) AS chunk_id
  FROM d JOIN s USING (i)
)
SELECT doc_id, chunk_id,
       string_agg(sentence, ' ' ORDER BY si) AS chunk_text,
       CAST(count(*) AS BIGINT) AS n_sentences,
       CAST(min(si) AS BIGINT) AS first_sentence
FROM m GROUP BY doc_id, chunk_id ORDER BY doc_id, chunk_id
"""
    _morf_rows = ", ".join(
        f"({i}, '{w}', '{l}', '{t}')" for i, w, l, t in _MORF_GOLDENS
    )
    out["morfologik_lemmas"] = f"""
WITH g(i, word, lemma, tags) AS (VALUES {_morf_rows}),
d AS (SELECT CAST(doc_id % {len(_MORF_WORDS)} AS INT) AS i, count(*) AS nd
      FROM documents WHERE doc_id < 600 GROUP BY 1)
SELECT g.word, g.lemma, g.tags, CAST(sum(d.nd) AS BIGINT) AS n
FROM g JOIN d USING (i)
GROUP BY 1, 2, 3 ORDER BY g.word, g.lemma, g.tags
"""
    out["histogram_facets"] = """
SELECT CAST(floor(n_chars / 40.0) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM documents WHERE n_chars IS NOT NULL
GROUP BY 1 ORDER BY bucket
"""
    out["span_payloads_collect"] = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
pos AS (
  SELECT doc_id, i - 1 AS p, l[i] AS term
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)
),
m AS (
  SELECT a.doc_id, a.p
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
  WHERE a.term = 'table' AND b.term = 'value'
),
c AS (
  SELECT doc_id, 'table' AS term, p AS pos FROM m
  UNION
  SELECT doc_id, 'value' AS term, p + 1 AS pos FROM m
)
SELECT doc_id, term, CAST(pos AS INT) AS pos, CAST(pos AS BIGINT) AS payload
FROM c ORDER BY doc_id, pos
"""
    from lucene_spark.pipeline.redact import PII_PATTERNS

    _dirty_sql = """
SELECT doc_id,
       'u' || doc_id || '@ex' || (doc_id % 7)
         || '.org call +1 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
         || '-1234 ip 10.' || (doc_id % 200) || '.0.9'
         || CASE WHEN doc_id % 3 = 0 THEN ' ssn 123-45-6789' ELSE '' END
         || ' ' || text AS dirty
FROM documents WHERE doc_id < 300
"""
    _clean_expr = "dirty"
    for _, _pat, _tok in PII_PATTERNS:
        _p = _pat.replace("'", "''")
        _clean_expr = f"regexp_replace({_clean_expr}, '{_p}', '{_tok}', 'g')"
    out["pii_redact"] = f"""
WITH d AS ({_dirty_sql})
SELECT doc_id, {_clean_expr} AS clean FROM d
"""
    out["association_facet"] = """
SELECT lang AS child,
       round(CAST(sum(n_chars) AS DOUBLE), 4) AS assoc,
       CAST(count(*) AS BIGINT) AS cnt
FROM documents
GROUP BY 1 ORDER BY assoc DESC, child ASC
"""
    _bj_modes = {
        "avg": "avg(l_extendedprice * (1.0 - l_discount))",
        "max": "max(l_extendedprice * (1.0 - l_discount))",
        "total": "sum(l_extendedprice * (1.0 - l_discount))",
        "min": "min(l_extendedprice * (1.0 - l_discount))",
    }
    _bj_selects = " UNION ALL ".join(
        f"""(SELECT '{m}' AS mode, o.o_orderkey,
            round(ch.s_{m}, 4) AS score,
            CAST(ch.n_children AS BIGINT) AS n_children
     FROM orders o JOIN ch ON o.o_orderkey = ch.l_orderkey
     ORDER BY round(ch.s_{m}, 4) DESC, o.o_orderkey ASC LIMIT 10)"""
        for m in ("avg", "max", "total", "min")
    )
    out["block_join_score_modes"] = f"""
WITH ch AS (
  SELECT l_orderkey,
         {', '.join(f'{expr} AS s_{m}' for m, expr in _bj_modes.items())},
         count(*) AS n_children
  FROM lineitem WHERE l_quantity > 30 GROUP BY 1
)
{_bj_selects}
"""
    _dfr = (
        "86400000000.0 / (86400000000.0 + abs(date_diff('microsecond', "
        "TIMESTAMP '2024-01-15 00:00:00', ts)))"
    )
    out["distance_feature_recency"] = f"""
SELECT event_id, round({_dfr}, 6) AS score
FROM events
ORDER BY {_dfr} DESC, event_id ASC
LIMIT 20
"""
    _dfg = f"500000.0 / (500000.0 + {_hav_sql(48.8566, 2.3522)})"
    out["distance_feature_geo"] = f"""
WITH {_GEO_CTE}
SELECT doc_id, round({_dfg}, 6) AS score FROM pts
ORDER BY {_dfg} DESC, doc_id ASC LIMIT 20
"""
    _db_ctes = _bm25_scored_ctes({"hash": 1.0, "merge": 0.7})
    _db_s = "coalesce(f.s, 0) + 50.0 / (50.0 + abs(d.n_chars - 300.0))"
    out["distance_boosted"] = f"""
WITH {_db_ctes}
SELECT d.doc_id, round({_db_s}, 4) AS score
FROM documents d LEFT JOIN first f USING (doc_id)
ORDER BY {_db_s} DESC, d.doc_id ASC LIMIT 15
"""
    _VSIM_CTES = """q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
z AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS x, unnest(qv)::DOUBLE AS y
  FROM embeddings, q
),
s AS (
  SELECT vec_id, sum(x * y) AS dot, sum(x * x) AS na, sum(y * y) AS nq
  FROM z GROUP BY vec_id
),
u AS (SELECT vec_id, (1 + dot / (sqrt(na) * sqrt(nq))) / 2 AS sc FROM s)"""
    out["vector_similarity"] = f"""
WITH {_VSIM_CTES}
SELECT vec_id, round(sc, 6) AS score FROM u
WHERE sc >= 0.6
ORDER BY round(sc, 6) DESC, vec_id ASC
"""
    out["diversifying_knn"] = f"""
WITH {_VSIM_CTES},
ur AS (SELECT vec_id, vec_id // 8 AS parent_id, round(sc, 6) AS sc FROM u),
b AS (SELECT parent_id, max(sc) AS score FROM ur GROUP BY parent_id),
c AS (
  SELECT b.parent_id, min(ur.vec_id) AS vec_id, b.score
  FROM b JOIN ur ON ur.parent_id = b.parent_id AND ur.sc = b.score
  GROUP BY b.parent_id, b.score
)
SELECT parent_id, vec_id, score FROM c
ORDER BY score DESC, parent_id ASC LIMIT 10
"""
    _dvu_ctes = _bm25_scored_ctes({"hash": 1.0})
    out["dv_update_score"] = f"""
WITH {_dvu_ctes},
m1 AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'merge'),
m2 AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'vector'),
w AS (
  SELECT doc_id,
         CASE WHEN doc_id IN (SELECT doc_id FROM m2) THEN 3.0
              WHEN doc_id IN (SELECT doc_id FROM m1) THEN 10.0
              ELSE (doc_id % 7) + 1.0 END AS w
  FROM documents
)
SELECT f.doc_id, round(f.s * w.w, 4) AS score
FROM first f JOIN w USING (doc_id)
ORDER BY f.s * w.w DESC, f.doc_id ASC LIMIT 15
"""
    out["repetition_signals"] = """
WITH base AS (SELECT doc_id, len(text) AS n_chars,
                     list_filter(string_split(text, ' '), x -> x <> '') AS l
              FROM documents WHERE doc_id < 500),
w AS (SELECT doc_id, n_chars, l, len(l) AS n_words FROM base),
li AS (SELECT doc_id, l, unnest(range(0, CAST(ceil(n_words / 3.0) AS BIGINT))) AS i FROM w),
lines AS (SELECT doc_id, array_to_string(l[(i*3+1):(i*3+3)], ' ') AS line FROM li),
lc AS (SELECT doc_id, line, count(*) AS c FROM lines GROUP BY 1, 2),
ls AS (SELECT doc_id, sum(c) AS n_lines, sum(c * len(line)) AS line_chars,
              sum(c - 1) AS dup_occ, sum((c - 1) * len(line)) AS dup_chars
       FROM lc GROUP BY 1),
gi2 AS (SELECT doc_id, l, unnest(range(0, greatest(n_words - 1, 0))) AS i FROM w),
g2c AS (SELECT doc_id, array_to_string(l[(i+1):(i+2)], ' ') AS g, count(*) AS c
        FROM gi2 GROUP BY 1, 2),
t2 AS (SELECT doc_id, max(c * len(g)) AS cov FROM g2c GROUP BY 1),
gi3 AS (SELECT doc_id, l, unnest(range(0, greatest(n_words - 2, 0))) AS i FROM w),
g3c AS (SELECT doc_id, array_to_string(l[(i+1):(i+3)], ' ') AS g, count(*) AS c
        FROM gi3 GROUP BY 1, 2),
t3 AS (SELECT doc_id, max(c * len(g)) AS cov FROM g3c GROUP BY 1),
gi5 AS (SELECT doc_id, l, unnest(range(0, greatest(n_words - 4, 0))) AS i FROM w),
g5c AS (SELECT doc_id, array_to_string(l[(i+1):(i+5)], ' ') AS g, count(*) AS c
        FROM gi5 GROUP BY 1, 2),
d5 AS (SELECT doc_id, sum(c) AS total, sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
       FROM g5c GROUP BY 1)
SELECT w.doc_id,
       CAST(w.n_words AS BIGINT) AS n_words,
       CAST(coalesce(ls.n_lines, 0) AS BIGINT) AS n_lines,
       round(coalesce(ls.dup_occ * 1.0 / nullif(ls.n_lines, 0), 0), 4) AS dup_line_frac,
       round(coalesce(ls.dup_chars * 1.0 / nullif(ls.line_chars, 0), 0), 4) AS dup_line_char_frac,
       round(coalesce(t2.cov * 1.0 / nullif(w.n_chars, 0), 0), 4) AS top2_char_frac,
       round(coalesce(t3.cov * 1.0 / nullif(w.n_chars, 0), 0), 4) AS top3_char_frac,
       round(coalesce(d5.dup * 1.0 / nullif(d5.total, 0), 0), 4) AS dup5_frac
FROM w LEFT JOIN ls ON w.doc_id = ls.doc_id
       LEFT JOIN t2 ON w.doc_id = t2.doc_id
       LEFT JOIN t3 ON w.doc_id = t3.doc_id
       LEFT JOIN d5 ON w.doc_id = d5.doc_id
"""
    from lucene_spark.analysis.phonetic import soundex as _soundex_py
    from lucene_spark.analysis.phonetic import soundex_sql as _soundex_sql

    out["phonetic_match"] = f"""
WITH {TOK_CTE}
SELECT DISTINCT doc_id FROM tok
WHERE {_soundex_sql('term')} = '{_soundex_py("sparc")}'
ORDER BY doc_id LIMIT 300
"""
    out["soundex_terms"] = f"""
WITH {TOK_CTE}
SELECT {_soundex_sql('term')} AS code,
       CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM tok GROUP BY 1 ORDER BY code
"""
    from lucene_spark.search.expressions import compile_expression as _js_compile

    _js_c = _js_compile(
        "sqrt(n_chars) + 10 * (n_chars > 300) "
        "+ min(doc_id % 7, 3) + ((doc_id & 12) >> 2)",
        {"n_chars": "n_chars", "doc_id": "doc_id"},
    )
    out["js_expression_topk"] = f"""
SELECT doc_id, round({_js_c.duckdb_sql}, 4) AS score
FROM documents
ORDER BY {_js_c.duckdb_sql} DESC, doc_id ASC LIMIT 15
"""
    _jsr_c = _js_compile(
        "_score * 2 + ln(n_chars + 1) - (_score > 3)",
        {"_score": "f.s", "n_chars": "d.n_chars"},
    )
    _jsr_ctes = _bm25_scored_ctes({"hash": 1.0, "scan": 0.5})
    out["js_expression_rescore"] = f"""
WITH {_jsr_ctes}
SELECT f.doc_id, round({_jsr_c.duckdb_sql}, 4) AS score
FROM first f JOIN documents d USING (doc_id)
ORDER BY {_jsr_c.duckdb_sql} DESC, f.doc_id ASC LIMIT 15
"""
    out["c4_filters"] = """
WITH web AS (
  SELECT doc_id,
         replace(text, ' table ', chr(10)) ||
         CASE CAST(doc_id % 5 AS INT)
           WHEN 0 THEN ' lorem ipsum dolor.'
           WHEN 1 THEN ' function() { return 1; }'
           WHEN 2 THEN '.'
           WHEN 3 THEN ' no punctuation here'
           ELSE '. done. and more.'
         END AS text
  FROM documents WHERE doc_id < 400
),
sig AS (
  SELECT doc_id, text,
         list_filter(string_split(text, chr(10)), x -> x <> '') AS lines
  FROM web
)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       round(CASE WHEN len(lines) > 0 THEN
         len(list_filter(lines, x -> len(list_filter(string_split(x, ' '), t -> t <> '')) < 5))
           * 1.0 / len(lines) ELSE 0 END, 4) AS short_line_frac,
       round(CASE WHEN len(lines) > 0 THEN
         len(list_filter(lines, x -> regexp_matches(x, '[.!?\"]$')))
           * 1.0 / len(lines) ELSE 0 END, 4) AS terminal_punct_line_frac,
       CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS n_sentences,
       CAST(contains(lower(text), 'lorem ipsum') AS INT) AS has_lorem,
       CAST(contains(text, '{') AS INT) AS has_brace,
       CAST((len(regexp_extract_all(text, '[.!?]+')) >= 3
             AND NOT contains(lower(text), 'lorem ipsum')
             AND NOT contains(text, '{')) AS INT) AS keep
FROM sig
"""
    out["long_range_facets"] = """
SELECT 'low' AS label, CAST(count(*) FILTER (value >= 0.0 AND value < 100.0) AS BIGINT) AS cnt FROM events
UNION ALL
SELECT 'mid', CAST(count(*) FILTER (value >= 50.0 AND value < 250.0) AS BIGINT) FROM events
UNION ALL
SELECT 'high', CAST(count(*) FILTER (value >= 200.0 AND value <= 500.0) AS BIGINT) FROM events
UNION ALL
SELECT 'all', CAST(count(*) FILTER (value >= 0.0 AND value <= 500.0) AS BIGINT) FROM events
"""
    _SFB = (
        "('0x' || substr(md5('5:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
        " % 1000000"
    )
    out["sampled_facets"] = f"""
SELECT lang AS label,
       CAST(count(*) AS BIGINT) AS cnt_sampled,
       round(count(*) / 0.25, 4) AS cnt_est
FROM documents
WHERE {_SFB} < 250000
GROUP BY 1 ORDER BY label
"""
    _cnt_cols = ", ".join(
        f"CAST(sum(len(regexp_extract_all(dirty, '{_pat.replace(chr(39), chr(39) * 2)}'))) AS BIGINT) AS n_{_name}"
        for _name, _pat, _ in PII_PATTERNS
    )
    out["pii_count_audit"] = f"""
WITH d AS ({_dirty_sql})
SELECT {_cnt_cols} FROM d
"""

    # SimpleNaiveBayesClassifier: add-one-smoothed log-likelihood +
    # log prior per class, softmax-normalized (max-shifted logsumexp)
    out["nb_classifier"] = f"""
WITH {TOK_CTE},
dt AS (SELECT DISTINCT t.doc_id, d.lang, t.term
       FROM tok t JOIN documents d USING (doc_id)),
g AS (SELECT (SELECT count(*) FROM documents WHERE lang IS NOT NULL) AS docs_with_class,
             (SELECT count(*) FROM documents
              WHERE text IS NOT NULL AND text <> '') AS doc_count,
             (SELECT count(*) FROM dt) AS sum_doc_freq),
c AS (SELECT lang AS label, count(*) AS df_c FROM documents
      WHERE lang IS NOT NULL GROUP BY lang),
w(term, m) AS (VALUES ('hash', 2), ('join', 1), ('spark', 1)),
hits AS (SELECT dt.lang AS label, dt.term, count(*) AS h FROM dt
         WHERE dt.lang IS NOT NULL AND dt.term IN ('hash', 'join', 'spark')
         GROUP BY dt.lang, dt.term),
grid AS (SELECT c.label, c.df_c, w.term, w.m, coalesce(hits.h, 0) AS h
         FROM c CROSS JOIN w
         LEFT JOIN hits ON hits.label = c.label AND hits.term = w.term),
raw AS (SELECT label,
               ln(df_c * 1.0) - ln(docs_with_class * 1.0)
               + sum(m * ln((h + 1.0)
                   / ((sum_doc_freq * 1.0 / doc_count) * df_c + docs_with_class))) AS s
        FROM grid CROSS JOIN g
        GROUP BY label, df_c, docs_with_class, doc_count, sum_doc_freq),
mx AS (SELECT max(s) AS smax FROM raw),
z AS (SELECT ln(sum(exp(s - smax))) + smax AS loga
      FROM raw CROSS JOIN mx GROUP BY smax)
SELECT label, exp(s - loga) AS score FROM raw CROSS JOIN z
ORDER BY score DESC, label ASC
"""

    # KNearestNeighborClassifier: BM25 top-20 neighbors, per class
    # sum(score/maxscore) / min(k, classed hits)
    out["knn_classifier"] = f"""
WITH {TOK_CTE},
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS sttf FROM dl),
dlq AS (SELECT doc_id, {_DLQ_CASE} AS dl_q FROM dl),
tf AS (SELECT doc_id, term, count(*) AS freq FROM tok
       WHERE term IN ('hash', 'join') GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
scores AS (
  SELECT tf.doc_id,
         sum(ln(1 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5)) * freq
             / (freq + 1.2 * (1 - 0.75 + 0.75 * dl_q / (sttf * 1.0 / n_docs)))) AS s
  FROM tf JOIN df USING (term) JOIN dlq USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
),
topk AS (SELECT doc_id, s FROM scores ORDER BY s DESC, doc_id ASC LIMIT 20),
j AS (SELECT t.s, d.lang AS label FROM topk t JOIN documents d USING (doc_id)
      WHERE d.lang IS NOT NULL),
g AS (SELECT max(s) AS maxscore, count(*) AS sumdoc FROM j)
SELECT label, sum(s / maxscore) / least(20.0, sumdoc * 1.0) AS score
FROM j CROSS JOIN g GROUP BY label, maxscore, sumdoc
ORDER BY score DESC, label ASC
"""

    # JoinUtil ScoreModes: per-nation folded customer balances applied
    # to suppliers, top-5 per mode
    _JU_MODES = [("max", "max"), ("total", "sum"), ("min", "min"), ("avg", "avg")]
    _ju_legs = "\nUNION ALL\n".join(
        f"""SELECT * FROM (
  SELECT '{mode}' AS mode, s_suppkey, {fn}_v AS join_score
  FROM supplier JOIN v ON s_nationkey = nk
  ORDER BY {fn}_v DESC, s_suppkey ASC LIMIT 5)"""
        for mode, fn in _JU_MODES
    )
    out["join_util_score_modes"] = f"""
WITH f AS (SELECT c_nationkey, c_acctbal FROM customer
           WHERE c_mktsegment = 'BUILDING'),
v AS (SELECT c_nationkey AS nk,
             max(c_acctbal) AS max_v, sum(c_acctbal) AS sum_v,
             min(c_acctbal) AS min_v, avg(c_acctbal) AS avg_v
      FROM f GROUP BY c_nationkey)
{_ju_legs}
"""

    out["contamination_check"] = f"""
WITH {_SHINGLE_CTE},
tr AS (SELECT doc_id, shingle FROM shingles WHERE doc_id < 400),
ev AS (SELECT DISTINCT shingle FROM shingles WHERE doc_id % 40 = 0),
tot AS (SELECT doc_id, count(*) AS n_grams FROM tr GROUP BY doc_id),
hit AS (SELECT doc_id, count(*) AS n_hit FROM tr JOIN ev USING (shingle)
        GROUP BY doc_id)
SELECT t.doc_id, t.n_grams, coalesce(h.n_hit, 0) AS n_hit,
       coalesce(h.n_hit, 0) * 1.0 / t.n_grams AS frac,
       CAST(coalesce(h.n_hit, 0) * 1.0 / t.n_grams > 0.0 AS INT) AS contaminated
FROM tot t LEFT JOIN hit h USING (doc_id)
"""

    # CommonTermsQuery: the df split happens IN the query (both
    # engines derive it from the data), low group required, high group
    # additive
    out["common_terms_topk"] = f"""
WITH {TOK_CTE},
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS sttf FROM dl),
dlq AS (SELECT doc_id, {_DLQ_CASE} AS dl_q FROM dl),
tf AS (SELECT doc_id, term, count(*) AS freq FROM tok
       WHERE term IN ('batch', 'dup', 'hash') GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
cls AS (SELECT term, doc_freq,
               CASE WHEN doc_freq > CAST(ceil(0.5 * n_docs) AS BIGINT)
                    THEN 1 ELSE 0 END AS hi
        FROM df CROSS JOIN stats),
per AS (
  SELECT tf.doc_id, cls.hi,
         ln(1 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5)) * freq
         / (freq + 1.2 * (1 - 0.75 + 0.75 * dl_q / (sttf * 1.0 / n_docs))) AS s1
  FROM tf JOIN cls USING (term) JOIN dlq USING (doc_id) CROSS JOIN stats
),
agg AS (SELECT doc_id,
               sum(CASE WHEN hi = 0 THEN s1 END) AS s_low,
               sum(CASE WHEN hi = 1 THEN s1 END) AS s_high,
               count(CASE WHEN hi = 0 THEN 1 END) AS n_low
        FROM per GROUP BY doc_id)
SELECT doc_id, round(s_low + coalesce(s_high, 0.0), 4) AS score
FROM agg WHERE n_low >= 1
ORDER BY s_low + coalesce(s_high, 0.0) DESC, doc_id ASC LIMIT 20
"""

    out["multi_range"] = """
SELECT event_id FROM events
WHERE (value BETWEEN 0.0 AND 50.0)
   OR (value BETWEEN 40.0 AND 120.0)
   OR (value BETWEEN 400.0 AND 450.0)
ORDER BY event_id LIMIT 1000
"""

    # TermAutomatonQuery "(hash|merge) <any> scan": the hole at +1 is
    # implied by the +2 join (position i+2 existing implies i+1 does)
    out["term_automaton"] = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
pos AS (SELECT doc_id, i, l[i] AS term
        FROM t, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)),
m AS (SELECT a.doc_id, a.i
      FROM pos a JOIN pos c ON c.doc_id = a.doc_id AND c.i = a.i + 2
      WHERE a.term IN ('hash', 'merge') AND c.term = 'scan')
SELECT doc_id, CAST(count(*) AS BIGINT) AS freq
FROM m GROUP BY doc_id ORDER BY doc_id
"""

    # UnifiedHighlighter maxPassages=2: same scoring as best_passage,
    # rank <= 2 with the rank column exposed
    out["top_passages"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l FROM documents
),
n AS (SELECT count(*) AS n_docs FROM documents),
dfq AS (
  SELECT term, CAST(round(ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * 1000000) AS BIGINT) AS w
  FROM (
    SELECT term, count(*) AS df FROM (
      SELECT DISTINCT doc_id, unnest(l) AS term FROM toks
    ) WHERE term IN ('hash', 'join') GROUP BY term
  ) CROSS JOIN n
),
hits AS (
  SELECT doc_id, CAST(((i - 1) // 8) * 8 + 1 AS INT) AS wstart, l[i] AS term
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)
  WHERE l[i] IN ('hash', 'join')
),
scored AS (
  SELECT doc_id, wstart, sum(w) AS q FROM hits JOIN dfq USING (term)
  GROUP BY doc_id, wstart
),
best AS (
  SELECT doc_id, wstart, q,
         row_number() OVER (PARTITION BY doc_id ORDER BY q DESC, wstart ASC) AS rn
  FROM scored
)
SELECT b.doc_id, b.wstart AS passage_start,
       round(b.q / 1000000.0, 4) AS passage_score,
       array_to_string(t.l[b.wstart : b.wstart + 7], ' ') AS passage,
       CAST(b.rn AS INT) AS passage_rank
FROM best b JOIN toks t USING (doc_id)
WHERE rn <= 2
ORDER BY b.doc_id ASC, b.rn ASC LIMIT 60
"""

    from lucene_spark.search.shape import (
        oracle_line_polygon_sql,
        oracle_polygon_polygon_sql,
    )

    out["shape_polygon_relations"] = f"""
WITH shp AS (
  SELECT doc_id,
         list_transform(generate_series(0, 3),
           j -> ((doc_id * 37 + j * 59) % 40) / 8.0 - 2.5) AS lats,
         list_transform(generate_series(0, 3),
           j -> ((doc_id * 23 + j * 83) % 40) / 8.0 - 2.5) AS lons
  FROM documents WHERE doc_id < 400
)
SELECT
  CAST(sum(CASE WHEN {oracle_line_polygon_sql('lats', 'lons', _QPOLY, 'intersects')}
           THEN 1 ELSE 0 END) AS BIGINT) AS line_intersects,
  CAST(sum(CASE WHEN {oracle_line_polygon_sql('lats', 'lons', _QPOLY, 'within')}
           THEN 1 ELSE 0 END) AS BIGINT) AS line_within,
  CAST(sum(CASE WHEN {oracle_line_polygon_sql('lats', 'lons', _QPOLY, 'disjoint')}
           THEN 1 ELSE 0 END) AS BIGINT) AS line_disjoint,
  CAST(sum(CASE WHEN {oracle_polygon_polygon_sql('lats', 'lons', _QPOLY, 'intersects')}
           THEN 1 ELSE 0 END) AS BIGINT) AS poly_intersects
FROM shp
"""

    # per-segment overview recomputed from the raw corpus: the engine's
    # blocks metadata must agree with first-principles token counts
    out["segments_info"] = f"""
WITH {TOK_CTE},
base AS (SELECT doc_id // 2048 AS segment_id, doc_id, term FROM tok),
a AS (SELECT segment_id, count(DISTINCT doc_id) AS n_docs,
             count(DISTINCT term) AS n_terms, count(*) AS sum_tf
      FROM base GROUP BY segment_id),
p AS (SELECT segment_id, count(*) AS sum_doc_freq
      FROM (SELECT DISTINCT segment_id, doc_id, term FROM base)
      GROUP BY segment_id)
SELECT a.segment_id, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_terms AS BIGINT) AS n_terms,
       CAST(sum_doc_freq AS BIGINT) AS sum_doc_freq,
       CAST(sum_tf AS BIGINT) AS sum_tf
FROM a JOIN p USING (segment_id) ORDER BY a.segment_id
"""

    # BM25NBClassifier: prior = ln(idf_c/2.2); likelihood_w =
    # ln(idf_c/2.2 + max text-field BM25 of w over class docs)
    _SC = "ln(1.0 + (n_class - df_c + 0.5) / (df_c + 0.5)) / 2.2"
    out["bm25_nb_classifier"] = f"""
WITH {TOK_CTE},
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS sttf FROM dl),
dlq AS (SELECT doc_id, {_DLQ_CASE} AS dl_q FROM dl),
tf AS (SELECT doc_id, term, count(*) AS freq FROM tok
       WHERE term IN ('hash', 'join', 'spark') GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
per AS (
  SELECT tf.doc_id, term,
         ln(1.0 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5)) * freq
         / (freq + 1.2 * ((1.0 - 0.75) + 0.75 * dl_q / (sttf * 1.0 / n_docs))) AS s1
  FROM tf JOIN df USING (term) JOIN dlq USING (doc_id) CROSS JOIN stats
),
mx AS (SELECT d.lang AS label, term, max(s1) AS mx
       FROM per JOIN documents d USING (doc_id)
       WHERE d.lang IS NOT NULL GROUP BY 1, 2),
c AS (SELECT lang AS label, count(*) AS df_c FROM documents
      WHERE lang IS NOT NULL GROUP BY 1),
g AS (SELECT count(*) AS n_class FROM documents WHERE lang IS NOT NULL),
w(term, m) AS (VALUES ('hash', 2), ('join', 1), ('spark', 1)),
grid AS (SELECT c.label, c.df_c, w.term, w.m, mx.mx
         FROM c CROSS JOIN w
         LEFT JOIN mx ON mx.label = c.label AND mx.term = w.term),
raw AS (SELECT label,
               ln({_SC}) + sum(m * ln({_SC} + coalesce(mx, 0.0))) AS s
        FROM grid CROSS JOIN g GROUP BY label, df_c, n_class),
mx2 AS (SELECT max(s) AS smax FROM raw),
z AS (SELECT smax + ln(sum(exp(s - smax))) AS loga FROM raw, mx2 GROUP BY smax)
SELECT label, exp(s - loga) AS score FROM raw CROSS JOIN z
ORDER BY score DESC, label ASC
"""

    out["word_break"] = f"""
WITH {TOK_CTE},
d AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
cand AS (SELECT substr('hashjoin', 1, i) AS left_part,
                substr('hashjoin', i + 1) AS right_part
         FROM (SELECT unnest(generate_series(1, 7)) AS i))
SELECT left_part, right_part,
       CAST(l.df AS BIGINT) AS left_freq, CAST(r.df AS BIGINT) AS right_freq,
       CAST(l.df + r.df AS BIGINT) AS score
FROM cand JOIN d l ON l.term = left_part JOIN d r ON r.term = right_part
WHERE l.df >= 1 AND r.df >= 1
ORDER BY score DESC, left_part ASC LIMIT 10
"""

    # commit point: generation 0 indexed only even doc_ids, so the
    # point-in-time reader must score exactly a fresh BM25 over the
    # filtered corpus (immutable-commit semantics)
    out["commit_point_search"] = oracle_bm25_sql(
        {"spark": 1.0, "query": 1.0},
        k=15,
        table="(SELECT * FROM documents WHERE doc_id % 2 = 0)",
    )

    # phrase wildcard: 'hash' immediately followed by a 'jo'-prefixed
    # token; freq = number of such start positions
    out["phrase_wildcard"] = f"""
WITH {_POS_CTE}
SELECT doc_id, CAST(count(*) AS DOUBLE) AS freq
FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i)
WHERE l[i] = 'hash' AND l[i + 1] LIKE 'jo%'
GROUP BY doc_id ORDER BY doc_id LIMIT 500
"""

    out["high_freq_terms"] = f"""
WITH {TOK_CTE}
SELECT term, count(DISTINCT doc_id) AS doc_freq, count(*) AS total_term_freq
FROM tok GROUP BY term ORDER BY total_term_freq DESC, term ASC LIMIT 10
"""

    out["doc_values_stats"] = """
WITH m AS (
  SELECT CASE WHEN doc_id % 5 = 0 THEN NULL ELSE n_chars END AS v
  FROM documents
  WHERE list_contains(string_split(text, ' '), 'hash')
)
SELECT count(v) AS cnt,
       CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing,
       min(v) AS min_v, max(v) AS max_v,
       CAST(sum(v) AS BIGINT) AS sum_v,
       sum(v) * 1.0 / count(v) AS mean_v,
       round(sum(v * v) * 1.0 / count(v)
             - (sum(v) * 1.0 / count(v)) * (sum(v) * 1.0 / count(v)), 6)
         AS variance,
       round(sqrt(sum(v * v) * 1.0 / count(v)
             - (sum(v) * 1.0 / count(v)) * (sum(v) * 1.0 / count(v))), 6)
         AS stdev
FROM m
"""

    out["diversified_topk"] = f"""
WITH {_bm25_scored_ctes({"hash": 1.0, "spark": 0.7})},
keyed AS (
  SELECT f.doc_id, d.lang, f.s,
         row_number() OVER (PARTITION BY d.lang ORDER BY f.s DESC, f.doc_id ASC)
           AS rk
  FROM first f JOIN documents d USING (doc_id)
)
SELECT doc_id, lang, round(s, 4) AS score FROM keyed
WHERE rk <= 2 ORDER BY s DESC, doc_id ASC LIMIT 10
"""

    # DynamicRangeUtil.computeDynamicNumericRanges: the sequential
    # greedy cut is a recursive CTE — each step finds the first row
    # whose cumulative weight clears the previous cut's base + target
    out["dynamic_range_facets"] = """
WITH RECURSIVE
src AS (
  SELECT CAST(n_chars AS BIGINT) AS v, CAST(doc_id % 7 + 1 AS BIGINT) AS w
  FROM documents WHERE doc_id % 7 + 1 > 0
),
p AS (SELECT count(*) AS n, sum(w) * 1.0 / least(6, count(*)) AS target
      FROM src),
sorted AS (
  SELECT v, w, row_number() OVER (ORDER BY v, w) AS rn,
         sum(w) OVER (ORDER BY v, w
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
  FROM src
),
bounds AS (
  SELECT 0 AS j, CAST(0 AS BIGINT) AS pos
  UNION ALL
  SELECT j + 1,
         coalesce(
           (SELECT min(rn) FROM sorted
            WHERE cw - coalesce(
                    (SELECT cw FROM sorted s2 WHERE s2.rn = b.pos), 0)
                  >= (SELECT target FROM p)),
           (SELECT n FROM p))
  FROM bounds b
  WHERE b.pos < (SELECT n FROM p) AND j < 6
),
ranges AS (
  SELECT b1.j - 1 AS bucket, b0.pos AS lo, b1.pos AS hi
  FROM bounds b0 JOIN bounds b1 ON b1.j = b0.j + 1
  WHERE b1.pos > b0.pos
)
SELECT CAST(bucket AS INT) AS bucket, count(*) AS cnt,
       CAST(sum(s.w) AS BIGINT) AS weight,
       min(s.v) AS min_v, max(s.v) AS max_v,
       sum(s.v) * 1.0 / count(*) AS centroid
FROM sorted s JOIN ranges r ON s.rn > r.lo AND s.rn <= r.hi
GROUP BY bucket ORDER BY bucket
"""

    # MemoryIndex degenerate BM25: N=1, df=1, avgdl=dl → idf ln(4/3),
    # norm factor k1
    out["memory_index_scores"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents
),
s AS (
  SELECT doc_id,
    (CASE WHEN len(list_filter(l, x -> x = 'hash')) > 0 THEN
       1.0 * ln(1.0 + 0.5 / 1.5) * len(list_filter(l, x -> x = 'hash'))
         / (len(list_filter(l, x -> x = 'hash')) + 1.2) ELSE 0 END)
  + (CASE WHEN len(list_filter(l, x -> x = 'spark')) > 0 THEN
       0.5 * ln(1.0 + 0.5 / 1.5) * len(list_filter(l, x -> x = 'spark'))
         / (len(list_filter(l, x -> x = 'spark')) + 1.2) ELSE 0 END) AS s
  FROM toks
)
SELECT doc_id, round(s, 4) AS score FROM s WHERE s > 0
ORDER BY s DESC, doc_id ASC LIMIT 10
"""

    out["query_profile"] = f"""
WITH {TOK_CTE},
h AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'hash'),
sp AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'spark'),
sc AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'scan')
SELECT 0 AS node, 0 AS depth, 'BooleanQuery' AS name,
       '3 clauses' AS description,
       (SELECT count(*) FROM h WHERE doc_id NOT IN (SELECT doc_id FROM sc))
         AS docs
UNION ALL
SELECT 1, 1, 'TermQuery', 'hash', (SELECT count(*) FROM h)
UNION ALL
SELECT 2, 1, 'TermQuery', 'spark', (SELECT count(*) FROM sp)
UNION ALL
SELECT 3, 1, 'TermQuery', 'scan', (SELECT count(*) FROM sc)
ORDER BY node
"""

    # BP reorder is score-invariant → plain BM25 oracle
    out["bp_reorder_topk"] = oracle_bm25_sql({"hash": 1.0, "join": 0.5}, k=15)
    # merge-time BP reorder: invariant vs plain BM25 on original ids
    out["bp_merge_reorder_topk"] = oracle_bm25_sql({"scan": 1.0, "merge": 0.5}, k=15)
    out["rearrange_stats"] = """
SELECT CAST(doc_id % 3 AS BIGINT) AS segment_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN list_contains(string_split(text, ' '), 'hash')
                THEN 1 ELSE 0 END) AS BIGINT) AS hash_docs
FROM documents GROUP BY 1 ORDER BY segment_id
"""
    out["time_limited_topk"] = oracle_bm25_sql({"hash": 1.0, "scan": 0.5}, k=15)
    # v1->v2 upgraded index answers exactly like a fresh v2 build
    out["upgrade_roundtrip"] = oracle_bm25_sql({"hash": 1.0, "scan": 0.5}, k=15)
    _zr_raw = " ".join(f"WHEN {i} THEN {r}" for i, r, _, _ in _ZR_GOLDENS)
    _zr_comp = " ".join(f"WHEN {i} THEN {c}" for i, _, c, _ in _ZR_GOLDENS)
    _zr_ratio = " ".join(f"WHEN {i} THEN {x}" for i, _, _, x in _ZR_GOLDENS)
    out["compression_ratio"] = f"""
SELECT doc_id,
       CAST(CASE (doc_id % {len(_ZR_GOLDENS)}) {_zr_raw} END AS BIGINT) AS raw_bytes,
       CAST(CASE (doc_id % {len(_ZR_GOLDENS)}) {_zr_comp} END AS BIGINT) AS compressed_bytes,
       round(CAST(CASE (doc_id % {len(_ZR_GOLDENS)}) {_zr_ratio} END AS DOUBLE), 4) AS ratio
FROM documents WHERE doc_id < 400 ORDER BY doc_id
"""
    out["domain_cap_docs"] = """
WITH u AS (
  SELECT doc_id,
         'https://sub.site' || CAST(doc_id % 7 AS VARCHAR) || '.com/page/'
           || CAST(doc_id AS VARCHAR) AS url,
         'site' || CAST(doc_id % 7 AS VARCHAR) || '.com' AS dom
  FROM documents WHERE doc_id < 500
),
b AS (
  SELECT doc_id, url, dom,
         ('0x' || substr(md5('5:' || url), 1, 8))::BIGINT % 1000000 AS bucket
  FROM u WHERE dom <> 'site0.com'
),
f AS (
  SELECT doc_id, row_number() OVER (PARTITION BY dom ORDER BY bucket, url) AS rn
  FROM b
)
SELECT doc_id FROM f WHERE rn <= 20 ORDER BY doc_id
"""

    # a synced replica answers exactly like the primary commit
    out["replica_search"] = oracle_bm25_sql({"merge": 1.0, "scan": 0.5}, k=15)

    _GRAMS_CTE = """toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents
),
grams AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(l[i:i+7], ' ') AS gram
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l) - 7)) AS i)
  WHERE len(l) >= 8
)"""

    out["repeated_ngrams"] = f"""
WITH {_GRAMS_CTE}
SELECT gram, count(DISTINCT doc_id) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occurrences
FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
ORDER BY n_docs DESC, gram ASC LIMIT 25
"""

    out["dup_span_starts"] = f"""
WITH {_GRAMS_CTE},
dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
),
tot AS (SELECT doc_id, count(*) AS total_grams FROM grams GROUP BY doc_id),
dps AS (
  SELECT doc_id, count(*) AS dup_starts FROM grams
  WHERE gram IN (SELECT gram FROM dup) GROUP BY doc_id
)
SELECT t.doc_id, CAST(t.total_grams AS BIGINT) AS total_grams,
       CAST(coalesce(d.dup_starts, 0) AS BIGINT) AS dup_starts,
       round(coalesce(d.dup_starts, 0) * 1.0 / t.total_grams, 6) AS dup_frac
FROM tot t LEFT JOIN dps d USING (doc_id)
ORDER BY dup_frac DESC, dup_starts DESC, doc_id ASC LIMIT 25
"""

    out["dup_span_coverage"] = f"""
WITH {_GRAMS_CTE},
dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
),
pos AS (SELECT doc_id, pos FROM grams WHERE gram IN (SELECT gram FROM dup)),
brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
              THEN 1 ELSE 0 END AS b
  FROM pos
),
sp AS (
  SELECT doc_id, pos,
         sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS UNBOUNDED PRECEDING) AS span_id
  FROM brk
),
spans AS (
  SELECT doc_id, span_id, min(pos) AS s, max(pos) + 8 AS e
  FROM sp GROUP BY doc_id, span_id
),
agg AS (
  SELECT doc_id, count(*) AS n_spans, sum(e - s) AS covered
  FROM spans GROUP BY doc_id
),
tot AS (SELECT doc_id, CAST(len(l) AS INTEGER) AS total_tokens
        FROM toks WHERE len(l) >= 8)
SELECT t.doc_id, t.total_tokens,
       CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(a.covered, 0) AS BIGINT) AS covered_tokens,
       round(coalesce(a.covered, 0) * 1.0 / t.total_tokens, 6) AS coverage
FROM tot t LEFT JOIN agg a USING (doc_id)
ORDER BY coverage DESC, covered_tokens DESC, doc_id ASC LIMIT 25
"""

    # HTMLStrip byte-identical invariant: the oracle never parses HTML —
    # it derives the EXPECTED extraction directly from the source text
    # (newline for </title>, the nav line, text, </p> + <br/> newlines),
    # so any markup-handling or entity-decoding drift on the Spark side
    # shows up as an md5/length/flag mismatch
    out["html_strip_text"] = """
WITH exp AS (
  SELECT doc_id,
         chr(10) || 'Home | About' || chr(10) || text || chr(10) || chr(10)
           AS expected
  FROM documents WHERE doc_id < 400
)
SELECT doc_id,
       CAST(octet_length(encode(expected)) AS INTEGER) AS n_bytes,
       md5(expected) AS text_md5,
       1 AS byte_identical
FROM exp ORDER BY doc_id
"""

    # Boilerplate extraction: the oracle re-runs the whole block
    # classifier (split, per-block tag strip + entity decode, anchor
    # char counting, length+link-density keep rule) with DuckDB list
    # lambdas — a genuine independent implementation, not a pin
    from lucene_spark.pipeline.boilerplate import oracle_main_content_sql

    _bp_frag = oracle_main_content_sql("html")
    out["boilerplate_extract"] = f"""
WITH src AS (
  SELECT doc_id,
         '<html><body><div class="nav"><a href="/">Home</a> '
         || '<a href="/about">About</a> <a href="/contact">Contact</a>'
         || '</div><p>'
         || replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'),
                    '>', '&gt;')
         || '</p><div>Copyright 2026 <a href="/legal">Legal</a> '
         || '<a href="/privacy">Privacy</a></div></body></html>' AS html
  FROM documents WHERE doc_id < 400
),
{_bp_frag.strip()}
SELECT doc_id, CAST(n_blocks AS INTEGER) AS n_blocks,
       CAST(n_kept AS INTEGER) AS n_kept,
       CAST(octet_length(encode(content)) AS INTEGER) AS n_bytes,
       md5(content) AS content_md5
FROM final ORDER BY doc_id
"""

    # WARC round trip: the oracle derives the expected payload md5
    # straight from the source text — any byte drift in the SQL-side
    # serialization OR the parser's header/body slicing turns it red
    out["warc_roundtrip"] = """
SELECT doc_id, 1 AS url_ok, 1 AS ts_ok, 1 AS byte_identical,
       md5('<p>' || replace(replace(replace(text, '&', '&amp;'),
                                    '<', '&lt;'), '>', '&gt;') || '</p>')
         AS html_md5
FROM documents WHERE doc_id < 400 ORDER BY doc_id
"""

    # Decompounding: pinned rows from the reference's Swedish battery
    # (TestCompoundWordTokenFilter.testDumbCompoundWordsSE)
    _dc_rows = ", ".join(
        f"('{w}', {i}, '{p}')"
        for w, parts in [
            ("Bildörr", ["Bildörr", "Bil", "dörr"]),
            ("Bilmotor", ["Bilmotor", "Bil", "motor"]),
            ("Slagborr", ["Slagborr", "Slag", "borr"]),
            ("Hammarborr", ["Hammarborr", "Hammar", "borr"]),
            ("Glasögonfodral", ["Glasögonfodral", "Glas", "ögon", "fodral"]),
            ("Basfiolsfodral", ["Basfiolsfodral", "Bas", "fiol", "fodral"]),
            ("Basfiolsfodralmakaregesäll",
             ["Basfiolsfodralmakaregesäll", "Bas", "fiol", "fodral",
              "makare", "gesäll"]),
            ("Skomakare", ["Skomakare", "Sko", "makare"]),
            ("Vindrutetorkare", ["Vindrutetorkare", "Vind", "rute",
                                 "torkare"]),
            ("Vindrutetorkarblad", ["Vindrutetorkarblad", "Vind", "rute",
                                    "blad"]),
            ("abba", ["abba"]),
        ]
        for i, p in enumerate(parts)
    )
    out["decompound_terms"] = f"""
SELECT word, CAST(ord AS INTEGER) AS ord, part
FROM (VALUES {_dc_rows}) AS t(word, ord, part)
ORDER BY word, ord
"""

    _hs_rows = ", ".join(
        f"('{w}', '{s}')" for w, s in _HUNSPELL_BATTERY
    )
    out["hunspell_stems"] = f"""
SELECT word, stem FROM (VALUES {_hs_rows}) AS t(word, stem)
ORDER BY word
"""

    out["path_prefix_facets"] = """
WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 2000),
lv AS (
  SELECT '/cat' || CAST(doc_id % 5 AS VARCHAR) AS p FROM d
  UNION ALL
  SELECT '/cat' || CAST(doc_id % 5 AS VARCHAR)
         || '/sub' || CAST(doc_id % 7 AS VARCHAR) FROM d
  UNION ALL
  SELECT '/cat' || CAST(doc_id % 5 AS VARCHAR)
         || '/sub' || CAST(doc_id % 7 AS VARCHAR)
         || '/item' || CAST(doc_id AS VARCHAR) FROM d
)
SELECT p AS prefix, CAST(count(*) AS BIGINT) AS cnt
FROM lv GROUP BY p HAVING count(*) >= 2
ORDER BY cnt DESC, prefix ASC
"""

    # WordDelimiterGraph splits: the same capture-group boundary
    # insertions, RE2 syntax (\\1, 'g' flag)
    out["word_delimiter_terms"] = r"""
WITH src AS (
  SELECT 'WiFi-Prod' || CAST(doc_id % 50 AS VARCHAR) || 'X HTTPServer'
         || CAST(doc_id % 10 AS VARCHAR) AS raw
  FROM documents
),
tok AS (SELECT unnest(string_split(raw, ' ')) AS t FROM src),
r AS (
  SELECT regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
           '([a-z0-9])([A-Z])', '\1 \2', 'g'),
           '([A-Z]+)([A-Z][a-z])', '\1 \2', 'g'),
           '([A-Za-z])([0-9])', '\1 \2', 'g'),
           '([0-9])([A-Za-z])', '\1 \2', 'g') AS s
  FROM tok
),
parts AS (SELECT unnest(string_split_regex(s, '[^A-Za-z0-9]+')) AS term FROM r)
SELECT term, count(*) AS cnt FROM parts WHERE term <> ''
GROUP BY term ORDER BY cnt DESC, term ASC LIMIT 30
"""

    out["common_grams_top"] = """
WITH toks AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS l FROM documents
),
pairs AS (
  SELECT l[i] AS a, l[i + 1] AS b
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i)
)
SELECT a || '_' || b AS gram, count(*) AS cnt
FROM pairs WHERE a IN ('the', 'a') OR b IN ('the', 'a')
GROUP BY gram ORDER BY cnt DESC, gram ASC LIMIT 20
"""

    out["leading_wildcard_topk"] = _const_score_oracle("term LIKE '%er'")

    # split parts cover the corpus exactly once → whole-corpus stats
    out["multi_pass_split_stats"] = f"""
WITH {TOK_CTE}
SELECT term, count(DISTINCT doc_id) AS doc_freq, count(*) AS total_term_freq
FROM tok GROUP BY term ORDER BY doc_freq DESC, term ASC LIMIT 10
"""

    # heatmap grid counts: the oracle consumes the SAME emitted cell
    # arithmetic the Spark plan runs (heatmap_counts_sql shares
    # _gx_sql/_gy_sql with heatmap_counts)
    from lucene_spark.search.heatmap import heatmap_counts_sql

    out["heatmap_facets"] = (
        "SELECT grid_x, grid_y, cnt FROM ("
        + heatmap_counts_sql(
            f"WITH {_GEO_CTE} SELECT * FROM pts",
            -60.0,
            70.0,
            -150.0,
            160.0,
            level=4,
        )
        + ") ORDER BY grid_x, grid_y"
    )

    # early-terminated sorted top-k == the full sort's top-k (that is
    # the early-termination contract)
    out["sorted_early_topk"] = """
SELECT doc_id, n_chars FROM documents
ORDER BY n_chars DESC, doc_id ASC LIMIT 12
"""

    # IVF-PQ at full probes + generous refine is exact vs brute force
    out["embedding_ivfpq_topk"] = out["embedding_cosine_topk"]

    from lucene_spark.search.classify import (
        oracle_knn_fuzzy_sql,
        oracle_perceptron_sql,
    )

    out["perceptron_classify"] = (
        "SELECT doc_id, output, assigned, round(score, 6) AS score FROM ("
        + oracle_perceptron_sql(where="doc_id < 150")
        + ") ORDER BY doc_id"
    )
    out["knn_fuzzy_classifier"] = oracle_knn_fuzzy_sql(
        ["merg", "jon"], k=15, max_edits=1, prefix_length=1
    )

    # grid-prefiltered shape query == the exact full-scan relation
    out["shape_grid_query"] = f"""
WITH shp AS (
  SELECT doc_id,
         list_transform(generate_series(0, 3),
           j -> ((doc_id * 37 + j * 59) % 40) / 8.0 - 2.5) AS lats,
         list_transform(generate_series(0, 3),
           j -> ((doc_id * 23 + j * 83) % 40) / 8.0 - 2.5) AS lons
  FROM documents WHERE doc_id < 400
)
SELECT doc_id FROM shp
WHERE {oracle_polygon_box_sql('lats', 'lons', _box, 'intersects')}
ORDER BY doc_id
"""

    # BBox overlap ratio: the score expression is the SAME emitted text
    # the Spark plan runs
    from lucene_spark.search.bbox import bbox_overlap_score_sql

    _bb_score = bbox_overlap_score_sql((-10.0, 25.0, -20.0, 40.0))
    out["bbox_overlap_topk"] = f"""
WITH b AS (
  SELECT doc_id,
         ((doc_id * 13) % 120) / 2.0 - 30.0 AS min_lat,
         ((doc_id * 13) % 120) / 2.0 - 30.0
           + ((doc_id * 7) % 40) / 2.0 AS max_lat,
         ((doc_id * 29) % 240) / 2.0 - 60.0 AS min_lon,
         ((doc_id * 29) % 240) / 2.0 - 60.0
           + ((doc_id * 11) % 60) / 2.0 AS max_lon
  FROM documents
),
s AS (SELECT doc_id, {_bb_score} AS sc FROM b)
SELECT doc_id, round(sc, 6) AS score FROM s WHERE sc > 0.0
ORDER BY sc DESC, doc_id ASC LIMIT 15
"""

    # SemDeDup exact regime: transitive closure of cosine>=t pairs,
    # min-label components, keeper = own label
    out["semdedup_keep"] = """
WITH RECURSIVE e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300),
z AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         unnest(a.embedding)::DOUBLE AS x, unnest(b.embedding)::DOUBLE AS y
  FROM e a JOIN e b ON a.vec_id < b.vec_id
),
s AS (
  SELECT vec_a, vec_b, sum(x * y) AS dot, sum(x * x) AS na, sum(y * y) AS nb
  FROM z GROUP BY vec_a, vec_b
),
pairs AS (
  SELECT vec_a, vec_b FROM s
  WHERE round(dot / (sqrt(na) * sqrt(nb)), 6) >= 0.4
),
und AS (SELECT vec_a AS u, vec_b AS v FROM pairs
        UNION SELECT vec_b, vec_a FROM pairs),
reach AS (
  SELECT u, v FROM und
  UNION
  SELECT r.u, e2.v FROM reach r JOIN und e2 ON r.v = e2.u
),
lab AS (SELECT u AS vec_id, least(u, min(v)) AS cluster_id
        FROM reach GROUP BY u)
SELECT e.vec_id,
       coalesce(lab.cluster_id, e.vec_id) AS cluster_id,
       coalesce(lab.cluster_id, e.vec_id) = e.vec_id AS keep
FROM e LEFT JOIN lab USING (vec_id)
ORDER BY e.vec_id
"""

    # ContextQuery: boosted per-context prefix completion, best score
    # per suggestion
    out["context_suggest"] = f"""
WITH {TOK_CTE},
sug AS (
  SELECT term AS suggestion, d.lang AS context,
         count(DISTINCT tok.doc_id) AS weight
  FROM tok JOIN documents d ON d.doc_id = tok.doc_id
  GROUP BY term, d.lang
),
m AS (
  SELECT suggestion,
         max(weight * CASE WHEN context = 'en' THEN 2.0
                           WHEN context = 'de' THEN 1.0 END) AS score
  FROM sug
  WHERE suggestion LIKE 's%' AND context IN ('en', 'de')
  GROUP BY suggestion
)
SELECT suggestion, score FROM m
ORDER BY score DESC, suggestion ASC LIMIT 12
"""

    # index-sort range query == the plain range predicate (segment
    # pruning is a physical property, plan-asserted in pytest)
    out["sorted_range_docs"] = """
SELECT doc_id, n_chars FROM documents
WHERE n_chars BETWEEN 200 AND 400
ORDER BY doc_id
"""

    # UTF8_LCASE collation range == lower() byte-order range (the ICU
    # locale collations have no SQL analog and are golden-pinned in
    # tests/test_collation.py instead)
    out["collation_range"] = """
WITH t AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT term, lower(term) AS ckey FROM t
WHERE regexp_matches(term, '^[A-Za-z]+$')
  AND lower(term) >= 'm' AND lower(term) <= 'q'
ORDER BY ckey, term
"""

    # the identical ISO 9 table, applied via DuckDB translate()
    from lucene_spark.analysis.translit import _iso9_table

    _t = _iso9_table()
    _src, _dst = "".join(_t.keys()), "".join(_t.values())
    out["cyrillic_translit"] = f"""
WITH w AS (
  SELECT ['Москва','щука','Ёж','журнал','чай','эхо','юг','яблоко'] AS a
)
SELECT doc_id,
       translate(a[CAST(doc_id % 8 AS INT) + 1] || ' ' ||
                 a[CAST(doc_id % 5 AS INT) + 1], '{_src}', '{_dst}') AS latin
FROM documents, w WHERE doc_id < 64 ORDER BY doc_id
"""

    # grouping-module completion: every collector is a rank window /
    # groupBy over narrow metadata in both engines
    out["all_group_heads"] = """
WITH m AS (
  SELECT source AS grp, doc_id, CAST(n_chars AS DOUBLE) AS s
  FROM documents WHERE n_chars >= 150
), r AS (
  SELECT grp, doc_id, s,
         row_number() OVER (PARTITION BY grp ORDER BY s DESC, doc_id ASC) AS rn
  FROM m
)
SELECT grp AS "group", doc_id, round(s, 4) AS score
FROM r WHERE rn = 1 ORDER BY "group"
"""
    out["distinct_values_group"] = """
WITH m AS (SELECT lang, source FROM documents WHERE n_chars < 230),
top_g AS (
  SELECT lang AS grp FROM m GROUP BY 1
  ORDER BY count(*) DESC, lang ASC LIMIT 3
)
SELECT m.lang AS "group",
       CAST(count(DISTINCT m.source) AS BIGINT) AS n_distinct,
       string_agg(DISTINCT m.source, '|' ORDER BY m.source) AS "values"
FROM m JOIN top_g ON m.lang = top_g.grp
GROUP BY 1 ORDER BY "group"
"""
    out["range_group_topk"] = """
WITH v AS (
  SELECT event_id, CAST(floor(value) AS BIGINT) AS v FROM events
), g AS (
  SELECT event_id, v,
    CASE WHEN v < 50 THEN -9223372036854775808
         WHEN v >= 400 THEN 400
         ELSE 50 + ((v - 50) // 100) * 100 END AS gmin,
    CASE WHEN v < 50 THEN 50
         WHEN v >= 400 THEN 9223372036854775807
         ELSE 50 + ((v - 50) // 100) * 100 + 100 END AS gmax
  FROM v
), r AS (
  SELECT gmin, gmax, event_id, v,
         row_number() OVER (PARTITION BY gmin, gmax
                            ORDER BY v ASC, event_id ASC) AS rn
  FROM g
)
SELECT gmin, gmax, event_id AS doc_id, v AS value
FROM r WHERE rn <= 2 ORDER BY gmin, gmax, doc_id
"""
    out["block_grouping_top"] = """
WITH c AS (
  SELECT event_id, user_id % 37 AS pk, value AS s FROM events
), r AS (
  SELECT event_id, pk, s,
         row_number() OVER (PARTITION BY pk ORDER BY s DESC, event_id ASC) AS rn
  FROM c
), t AS (
  SELECT pk, s AS gs FROM r WHERE rn = 1
  ORDER BY gs DESC, pk ASC LIMIT 5
)
SELECT r.pk AS "group", round(t.gs, 4) AS group_score,
       r.event_id AS doc_id, round(r.s, 4) AS score
FROM r JOIN t ON r.pk = t.pk
WHERE r.rn <= 2
ORDER BY group_score DESC, "group" ASC, score DESC, doc_id ASC
"""
    out["group_facets"] = """
SELECT source AS facet, CAST(count(DISTINCT lang) AS BIGINT) AS n_groups
FROM documents WHERE n_chars < 260
GROUP BY 1 ORDER BY n_groups DESC, facet ASC
"""
    # value-source facets: count desc, label/value-asc ties, with the
    # totalDocCount/childCount header fields on every row
    out["string_value_facets"] = """
WITH m AS (SELECT doc_id, source FROM documents WHERE n_chars < 240),
c AS (SELECT source AS label, CAST(count(*) AS BIGINT) AS cnt FROM m GROUP BY 1),
h AS (SELECT CAST(count(*) AS BIGINT) AS child_count,
             CAST(sum(cnt) AS BIGINT) AS total_docs FROM c)
SELECT label, cnt, h.total_docs, h.child_count FROM c, h
ORDER BY cnt DESC, label ASC LIMIT 5
"""
    out["long_value_facets"] = """
WITH v AS (SELECT user_id % 23 AS uv FROM events),
c AS (SELECT uv, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY 1),
h AS (SELECT CAST(count(*) AS BIGINT) AS child_count,
             CAST(sum(cnt) AS BIGINT) AS total_docs FROM c),
t AS (SELECT uv, cnt FROM c ORDER BY cnt DESC, uv ASC LIMIT 6)
SELECT CAST(t.uv AS VARCHAR) AS label, t.cnt, h.total_docs, h.child_count
FROM t, h ORDER BY cnt DESC, label ASC
"""
    out["range_on_range_facets"] = """
WITH r AS (
  SELECT value AS rmin, value + (user_id % 10) + 1.0 AS rmax FROM events
)
SELECT * FROM (
  SELECT 'low' AS label,
         CAST(count(*) FILTER (rmin <= 100.0 AND rmax >= 0.0) AS BIGINT) AS cnt,
         CAST(count(*) AS BIGINT) AS total_docs FROM r
  UNION ALL
  SELECT 'mid', CAST(count(*) FILTER (rmin <= 250.0 AND rmax >= 50.0) AS BIGINT),
         CAST(count(*) AS BIGINT) FROM r
  UNION ALL
  SELECT 'high', CAST(count(*) FILTER (rmin <= 500.0 AND rmax >= 240.0) AS BIGINT),
         CAST(count(*) AS BIGINT) FROM r
)
"""
    out["block_join_sort"] = """
WITH pp AS (
  SELECT l_orderkey AS ck, max(l_extendedprice) AS sv
  FROM lineitem WHERE l_quantity > 45 GROUP BY 1
)
SELECT o_orderkey, round(sv, 4) AS sort_value
FROM orders LEFT JOIN pp ON orders.o_orderkey = pp.ck
ORDER BY sv DESC NULLS LAST, o_orderkey ASC LIMIT 12
"""
    out["named_matches"] = f"""
WITH {TOK_CTE},
nm AS (
  SELECT DISTINCT doc_id, 'q1' AS name FROM tok WHERE term = 'hash'
  UNION ALL
  SELECT DISTINCT doc_id, 'q2' FROM tok WHERE term IN ('join', 'merge')
  UNION ALL
  SELECT DISTINCT doc_id, 'q3' FROM tok WHERE term = 'scan'
)
SELECT doc_id, string_agg(name, '|' ORDER BY name) AS names,
       CAST(count(*) AS BIGINT) AS n_matched
FROM nm WHERE doc_id < 300 GROUP BY doc_id ORDER BY doc_id
"""
    out["match_positions"] = f"""
WITH {_POS_CTE},
p AS (
  SELECT doc_id, term, i - 1 AS pos FROM (
    SELECT doc_id, l[i] AS term, i
    FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)
  ) WHERE term IN ('hash', 'join')
)
SELECT doc_id, term,
       string_agg(CAST(pos AS VARCHAR), ',' ORDER BY pos) AS positions,
       CAST(count(*) AS BIGINT) AS freq
FROM p WHERE doc_id < 120
GROUP BY doc_id, term ORDER BY doc_id, term
"""
    out["suggest_exact_first"] = f"""
WITH {TOK_CTE},
df AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS weight
  FROM tok GROUP BY 1
)
SELECT term, weight, CAST(term = 'a' AS INT) AS is_exact
FROM df WHERE term LIKE 'a%'
ORDER BY is_exact DESC, weight DESC, term ASC LIMIT 8
"""
    out["paragraph_dedup"] = """
WITH d AS (
  SELECT doc_id,
         ['alpha beta','gamma delta','epsilon zeta','eta theta'][CAST(doc_id % 4 AS INT) + 1]
         || chr(10) ||
         ['alpha beta','gamma delta','epsilon zeta'][CAST(doc_id % 3 AS INT) + 1]
         || chr(10) || 'unique ' || CAST(doc_id AS VARCHAR) AS text
  FROM documents WHERE doc_id < 200
),
paras AS (
  SELECT doc_id, i - 1 AS pos, p[i] AS para
  FROM (SELECT doc_id, string_split(text, chr(10)) AS p FROM d),
       LATERAL (SELECT unnest(generate_series(1, len(p))) AS i)
  WHERE len(trim(p[i])) >= 1
),
kept AS (
  SELECT doc_id, pos, para FROM (
    SELECT doc_id, pos, para,
           row_number() OVER (PARTITION BY md5(para)
                              ORDER BY doc_id, pos) AS rn
    FROM paras
  ) WHERE rn = 1
),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paragraphs FROM paras GROUP BY 1),
reb AS (
  SELECT doc_id, string_agg(para, chr(10) ORDER BY pos) AS clean_text,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM kept GROUP BY 1
)
SELECT tot.doc_id, coalesce(reb.clean_text, '') AS clean_text,
       tot.n_paragraphs, coalesce(reb.n_kept, 0) AS n_kept
FROM tot LEFT JOIN reb ON tot.doc_id = reb.doc_id
ORDER BY tot.doc_id
"""
    out["span_payload_check"] = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
pos AS (
  SELECT doc_id, i - 1 AS p, l[i] AS term
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)
),
m AS (SELECT doc_id, p FROM pos WHERE term = 'hash' AND CAST(p AS DOUBLE) < 6.0)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matching,
       string_agg(CAST(p AS VARCHAR), ',' ORDER BY p) AS positions
FROM m GROUP BY doc_id ORDER BY doc_id
"""
    from lucene_spark.search.expressions import compile_expression as _ce

    _frm = _ce(
        "sqrt(n_chars) + doc_id % 11",
        {"n_chars": "n_chars", "doc_id": "doc_id"},
    ).duckdb_sql
    out["function_range_match"] = f"""
SELECT doc_id, round(CAST({_frm} AS DOUBLE), 4) AS value
FROM documents
WHERE CAST({_frm} AS DOUBLE) >= 20.0 AND CAST({_frm} AS DOUBLE) < 24.0
ORDER BY doc_id
"""
    from lucene_spark.search.inet import ip_key as _ipk

    _IPS_CTE = (
        "ips AS (SELECT event_id, printf("
        "'00000000000000000000ffff%02x%02x%02x%02x', 10, "
        "CAST(user_id % 200 AS INT), CAST((user_id // 7) % 50 AS INT), "
        "CAST(user_id % 250 AS INT)) AS k FROM events)"
    )
    _ip_set = "', '".join(
        _ipk(i) for i in ["10.1.0.1", "10.5.0.5", "8.8.8.8"]
    )
    out["inet_queries"] = f"""
WITH {_IPS_CTE}
SELECT 'prefix_10_64_s10' AS label, CAST(count(*) AS BIGINT) AS cnt FROM ips
WHERE k BETWEEN '{_ipk("10.64.0.0")}' AND '{_ipk("10.127.255.255")}'
UNION ALL
SELECT 'range_50_120', CAST(count(*) AS BIGINT) FROM ips
WHERE k BETWEEN '{_ipk("10.50.3.7")}' AND '{_ipk("10.120.9.200")}'
UNION ALL
SELECT 'set3', CAST(count(*) AS BIGINT) FROM ips WHERE k IN ('{_ip_set}')
UNION ALL
SELECT 'exact', CAST(count(*) AS BIGINT) FROM ips WHERE k = '{_ipk("10.1.0.1")}'
"""
    from lucene_spark.search.inet import int128_key as _i128

    _blo = _i128((-300 << 64) | (17 * 1000000007))
    _bhi = _i128((250 << 64) | ((1 << 64) - 1))
    out["bigint_range"] = f"""
WITH v AS (
  SELECT event_id,
         printf('%016x%016x',
                xor(CAST(user_id - 500 AS BIGINT),
                    CAST(-9223372036854775808 AS BIGINT)),
                CAST(event_id * 1000000007 AS BIGINT)) AS k
  FROM events
)
SELECT CAST(count(*) AS BIGINT) AS cnt,
       min(event_id) AS min_event, max(event_id) AS max_event
FROM v WHERE k BETWEEN '{_blo}' AND '{_bhi}'
"""
    _srs_ctes = _bm25_scored_ctes({"hash": 1.0, "scan": 0.5})
    out["sort_rescore"] = f"""
WITH {_srs_ctes},
fp AS (SELECT doc_id, s FROM first ORDER BY s DESC, doc_id ASC LIMIT 50)
SELECT fp.doc_id, round(fp.s, 4) AS score, d.n_chars AS sort_value
FROM fp JOIN documents d USING (doc_id)
ORDER BY d.n_chars DESC, fp.doc_id ASC LIMIT 10
"""
    from lucene_spark.pipeline.lm import oracle_perplexity_sql as _opsql

    _ppl_q = _opsql(
        ref_where="doc_id % 5 <> 0",
        score_where="doc_id < 1500",
        limit=1000000000,
    )
    out["ppl_buckets"] = f"""
WITH p AS ({_ppl_q}),
cuts AS (SELECT quantile_cont(log10_ppl, [1.0/3, 2.0/3]) AS c FROM p)
SELECT CASE WHEN log10_ppl <= c[1] THEN 'head'
            WHEN log10_ppl <= c[2] THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(min(log10_ppl), 6) AS min_ppl,
       round(max(log10_ppl), 6) AS max_ppl
FROM p, cuts GROUP BY 1 ORDER BY bucket
"""
    out["index_overview"] = f"""
WITH {TOK_CTE},
df AS (
  SELECT term, count(DISTINCT doc_id) AS doc_freq, count(*) AS ttf
  FROM tok GROUP BY 1
)
SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(doc_freq) AS BIGINT) AS sum_doc_freq,
       CAST(sum(ttf) AS BIGINT) AS sum_ttf
FROM df
"""
    out["temperature_mix"] = """
WITH c AS (
  SELECT lang AS domain, CAST(count(*) AS BIGINT) AS n_docs FROM documents
  GROUP BY 1
),
p AS (SELECT domain, n_docs, pow(CAST(n_docs AS DOUBLE), 0.7) AS w FROM c),
t AS (SELECT sum(w) AS tw FROM p)
SELECT domain, n_docs, round(w / tw, 6) AS weight,
       round(round(w / tw, 6) * 1000.0, 4) AS expected
FROM p, t ORDER BY domain
"""
    out["keyword_repeat_terms"] = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents WHERE doc_id < 60
),
p AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos, l[i] AS term
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)
),
forms AS (
  SELECT doc_id, pos, term FROM p
  UNION
  SELECT doc_id, pos, {_STEM_CASE} AS term FROM p
)
SELECT doc_id, pos, term FROM forms ORDER BY doc_id, pos, term
"""
    _lnh_ctes = _bm25_scored_ctes({"merge": 1.0, "scan": 0.5})
    out["large_num_hits"] = f"""
WITH {_lnh_ctes},
t AS (SELECT CAST(count(*) AS BIGINT) AS total_hits FROM first)
SELECT doc_id, round(s, 4) AS score, t.total_hits
FROM first, t WHERE doc_id < 400
ORDER BY score DESC, doc_id ASC
"""
    # vector relayout must not change search results
    out["bp_vector_reorder_topk"] = out["embedding_cosine_topk"]

    # QueryAutoStopWordAnalyzer: query terms with docFreq >
    # floor(numDocs * 0.5) drop before scoring (strictly-greater per
    # QueryAutoStopWordAnalyzer.java:142; int-truncating threshold per
    # java:115); the survivors score as plain BM25
    from lucene_spark.search.parity import _DLQ_SQL as _DLQ, K1 as _K1, B as _B

    out["auto_stop_topk"] = f"""
WITH tok AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
  ) WHERE term <> ''
),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS sttf FROM dl),
dlq AS (SELECT doc_id, {_DLQ} AS dl_q FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS freq FROM tok
  WHERE term IN ('hash', 'dup', 'scan') GROUP BY doc_id, term
),
df AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
boosts(term, boost) AS (VALUES ('hash', 1.0), ('dup', 1.5), ('scan', 0.5)),
live AS (
  SELECT df.term FROM df CROSS JOIN stats
  WHERE doc_freq <= CAST(floor(n_docs * 0.5) AS BIGINT)
),
scores AS (
  SELECT tf.doc_id,
         sum(boost * ln(1 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5))
             * freq / (freq + {_K1} * (1 - {_B} + {_B} * dl_q / (sttf * 1.0 / n_docs)))) AS s
  FROM tf
  JOIN live USING (term)
  JOIN df USING (term) JOIN boosts USING (term) JOIN dlq USING (doc_id)
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS score FROM scores
ORDER BY s DESC, doc_id ASC LIMIT 15
"""

    # blocktreeords seekExact(ord): dense lexicographic ordinals over
    # the whole-index dictionary, with per-term df/ttf
    out["term_ord_seek"] = """
WITH tok AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
  ) WHERE term <> ''
),
d AS (
  SELECT term, count(DISTINCT doc_id) AS doc_freq, count(*) AS total_term_freq
  FROM tok GROUP BY term
),
o AS (
  SELECT row_number() OVER (ORDER BY term) - 1 AS ord, term,
         CAST(doc_freq AS BIGINT) AS doc_freq,
         CAST(total_term_freq AS BIGINT) AS total_term_freq
  FROM d
)
SELECT ord, term, doc_freq, total_term_freq FROM o
WHERE ord IN (0, 5, 12, 19, 30) ORDER BY ord
"""

    # DelimitedBoostTokenFilter: "hash|2.0 join vector|0.5 join" →
    # hash^2.0, join^(1.0+1.0), vector^0.5
    out["delimited_boost_topk"] = oracle_bm25_sql(
        {"hash": 2.0, "join": 2.0, "vector": 0.5}, k=15
    )

    # WikipediaTokenizer: the expected typed token stream per doc
    # ("site" shares the URL's position — posInc 0 on the first
    # external-link display word, TestWikipediaTokenizer checkLinkPhrases)
    _WIKI_ROWS = [
        ("'Intro'", "'i'", 0),
        ("'cat' || d", "'c'", 1),
        ("'plain' || d", "'<ALPHANUM>'", 2),
        ("'http://ex' || d || '.com'", "'elu'", 3),
        ("'site'", "'el'", 3),
        ("d", "'el'", 4),
        ("'Head'", "'h'", 5),
        ("'cite' || d", "'ci'", 6),
        ("'3.25'", "'<NUM>'", 7),
        ("'it''s'", "'<APOSTROPHE>'", 8),
    ]
    _wiki_parts = [
        f"SELECT doc_id, {t} AS term, {ty} AS type, {p} AS pos FROM d"
        for t, ty, p in _WIKI_ROWS
    ]
    out["wiki_tokens"] = (
        "WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS d "
        "FROM documents ORDER BY doc_id LIMIT 50)\n"
        + "\nUNION ALL ".join(_wiki_parts)
        + "\nORDER BY doc_id, pos, term"
    )

    # SimpleText round-trip is lossless → plain BM25 oracle
    out["simpletext_roundtrip"] = oracle_bm25_sql({"merge": 1.0, "vector": 0.5}, k=15)

    # DirectPostings cache serves identical postings → plain BM25 oracle
    out["direct_postings_topk"] = oracle_bm25_sql(
        {"hash": 1.0, "scan": 0.5, "dup": 2.0}, k=15
    )

    # TokenStreamToTermAutomatonQuery: each transition consumes one doc
    # token (side paths rejoin at the shared state), so accepted starts
    # are "hash scan" adjacent, or "big data scan" — either surface of
    # the synonym graph
    out["ts2a_match"] = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
pos AS (SELECT doc_id, i, l[i] AS term
        FROM t, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)),
m AS (
  SELECT a.doc_id, a.i
  FROM pos a JOIN pos c ON c.doc_id = a.doc_id AND c.i = a.i + 1
  WHERE a.term = 'hash' AND c.term = 'scan'
  UNION
  SELECT a.doc_id, a.i
  FROM pos a
  JOIN pos b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  JOIN pos c ON c.doc_id = a.doc_id AND c.i = a.i + 2
  WHERE a.term = 'big' AND b.term = 'data' AND c.term = 'scan'
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS freq
FROM m GROUP BY doc_id ORDER BY doc_id
"""

    # Luke document view: doc 7's exact (term, freq) postings
    out["luke_doc_view"] = """
SELECT term, CAST(count(*) AS BIGINT) AS freq FROM (
  SELECT unnest(string_split(text, ' ')) AS term
  FROM documents WHERE doc_id = 7
) WHERE term <> '' GROUP BY term ORDER BY term
"""

    # classic SpellChecker: candidate cutoff covers the whole 31-term
    # dictionary at this scale, so the oracle needs only the re-rank
    out["spell_checker_topk"] = """
WITH tok AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
  ) WHERE term <> ''
),
d AS (SELECT term, count(DISTINCT doc_id) AS doc_freq FROM tok GROUP BY term),
g AS (
  SELECT term, doc_freq,
    (CASE WHEN term LIKE 'h%' THEN 2.0 ELSE 0 END
     + CASE WHEN term LIKE '%h' THEN 1.0 ELSE 0 END
     + CASE WHEN instr(term, 'h') > 0 THEN 2.0 ELSE 0 END
     + CASE WHEN instr(term, 's') > 0 THEN 1.0 ELSE 0 END
     + CASE WHEN instr(term, 'a') > 0 THEN 1.0 ELSE 0 END
     + CASE WHEN term LIKE 'hs%' THEN 2.0 ELSE 0 END
     + CASE WHEN term LIKE '%ah' THEN 1.0 ELSE 0 END
     + CASE WHEN instr(term, 'hs') > 0 THEN 1.0 ELSE 0 END
     + CASE WHEN instr(term, 'sa') > 0 THEN 1.0 ELSE 0 END
     + CASE WHEN instr(term, 'ah') > 0 THEN 1.0 ELSE 0 END) AS sc
  FROM d
)
SELECT term,
       round(1.0 - levenshtein(term, 'hsah') * 1.0
             / greatest(length(term), 4), 6) AS sim,
       CAST(doc_freq AS BIGINT) AS freq
FROM g
WHERE sc > 0 AND term <> 'hsah'
  AND 1.0 - levenshtein(term, 'hsah') * 1.0 / greatest(length(term), 4) >= 0.5
ORDER BY sim DESC, freq DESC, term ASC LIMIT 5
"""

    # StringDistance similarity battery (pinned, float64 6dp)
    out["string_distances"] = """
SELECT kind, a, b, CAST(s0 AS DOUBLE) AS sim FROM (VALUES
  ('jaro_winkler', 'al', 'al', 1.0),
  ('jaro_winkler', 'dwayne', 'duane', 0.84),
  ('jaro_winkler', 'kitten', 'sitting', 0.746032),
  ('jaro_winkler', 'martha', 'marhta', 0.961111),
  ('levenshtein', 'al', 'al', 1.0),
  ('levenshtein', 'dwayne', 'duane', 0.666667),
  ('levenshtein', 'kitten', 'sitting', 0.571429),
  ('levenshtein', 'martha', 'marhta', 0.666667),
  ('lucene_levenshtein', 'al', 'al', 1.0),
  ('lucene_levenshtein', 'dwayne', 'duane', 0.6),
  ('lucene_levenshtein', 'kitten', 'sitting', 0.5),
  ('lucene_levenshtein', 'martha', 'marhta', 0.833333),
  ('ngram', 'al', 'al', 1.0),
  ('ngram', 'dwayne', 'duane', 0.583333),
  ('ngram', 'kitten', 'sitting', 0.5),
  ('ngram', 'martha', 'marhta', 0.666667)
) AS t(kind, a, b, s0) ORDER BY kind, a, b
"""

    # MultiReader composite answers like the whole-corpus index
    out["multi_reader_topk"] = oracle_bm25_sql(
        {"hash": 1.0, "dup": 2.0, "scan": 0.5}, k=20
    )

    # ParallelReader: independent per-field BM25s summed per doc
    def _pfield_ctes(pref, toks_expr, terms_sql, boosts_sql):
        return f"""
{pref}tok AS (
  SELECT doc_id, unnest({toks_expr}) AS term FROM tl
),
{pref}tokf AS (SELECT doc_id, term FROM {pref}tok WHERE term <> ''),
{pref}dl AS (SELECT doc_id, count(*) AS dl FROM {pref}tokf GROUP BY doc_id),
{pref}stats AS (SELECT count(*) AS n_docs, sum(dl) AS sttf FROM {pref}dl),
{pref}dlq AS (SELECT doc_id, {{dlq}} AS dl_q FROM {pref}dl),
{pref}tf AS (
  SELECT doc_id, term, count(*) AS freq FROM {pref}tokf
  WHERE term IN ({terms_sql}) GROUP BY doc_id, term
),
{pref}df AS (SELECT term, count(*) AS doc_freq FROM {pref}tf GROUP BY term),
{pref}boosts(term, boost) AS (VALUES {boosts_sql}),
{pref}sc AS (
  SELECT tf.doc_id,
         sum(boost * ln(1 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5))
             * freq / (freq + {{k1}} * (1 - {{b}} + {{b}} * dl_q / (sttf * 1.0 / n_docs)))) AS s
  FROM {pref}tf tf
  JOIN {pref}df USING (term) JOIN {pref}boosts USING (term)
  JOIN {pref}dlq USING (doc_id) CROSS JOIN {pref}stats
  GROUP BY tf.doc_id
)"""

    _pf = (
        "WITH tl AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS l FROM documents),"
        + _pfield_ctes("t_", "l[1:3]", "'hash'", "('hash', 1.0)")
        + ","
        + _pfield_ctes(
            "b_", "l[4:len(l)]", "'dup', 'scan'", "('dup', 2.0), ('scan', 0.5)"
        )
        + """,
u AS (
  SELECT coalesce(t.doc_id, b.doc_id) AS doc_id,
         coalesce(t.s, 0) + coalesce(b.s, 0) AS s
  FROM t_sc t FULL OUTER JOIN b_sc b ON t.doc_id = b.doc_id
)
SELECT doc_id, round(s, 4) AS score FROM u
ORDER BY s DESC, doc_id ASC LIMIT 20
"""
    )
    out["parallel_fields_topk"] = _pf.format(dlq=_DLQ, k1=_K1, b=_B)

    # InetAddressRange relations over sortable keys
    _irq_lo, _irq_hi = _ipk("10.50.0.0"), _ipk("10.90.0.0")
    _IRC_CTE = (
        "r AS (SELECT event_id, "
        "printf('00000000000000000000ffff%02x%02x%02x%02x', 10, "
        "CAST(user_id % 200 AS INT), 0, 0) AS lo, "
        "printf('00000000000000000000ffff%02x%02x%02x%02x', 10, "
        "CAST(user_id % 200 + user_id % 5 AS INT), 255, 255) AS hi "
        "FROM events)"
    )
    out["inet_range_counts"] = f"""
WITH {_IRC_CTE}
SELECT 'contains' AS label, CAST(count(*) AS BIGINT) AS cnt FROM r
WHERE lo <= '{_irq_lo}' AND '{_irq_hi}' <= hi
UNION ALL
SELECT 'crosses', CAST(count(*) AS BIGINT) FROM r
WHERE (lo <= '{_irq_hi}' AND hi >= '{_irq_lo}')
  AND NOT ('{_irq_lo}' <= lo AND hi <= '{_irq_hi}')
UNION ALL
SELECT 'intersects', CAST(count(*) AS BIGINT) FROM r
WHERE lo <= '{_irq_hi}' AND hi >= '{_irq_lo}'
UNION ALL
SELECT 'within', CAST(count(*) AS BIGINT) FROM r
WHERE '{_irq_lo}' <= lo AND hi <= '{_irq_hi}'
ORDER BY label
"""

    # Solr/WordNet synonym rules: expand all-pairs, explicit never-
    # keep-original mappings, synset grouping
    out["synonym_rules"] = """
SELECT * FROM (VALUES
  ('solr', 'big', 'huge', false),
  ('solr', 'big', 'large', false),
  ('solr', 'fast', 'quick', true),
  ('solr', 'quick', 'fast', true),
  ('wordnet', 'forest', 'wood', true),
  ('wordnet', 'wood', 'forest', true)
) AS t(fmt, input, output, keep_orig) ORDER BY fmt, input, output
"""

    # ConcatenateGraph: every accepted path of the token graph
    out["concat_graph_paths"] = """
SELECT * FROM (VALUES
  ('hole', 'a///b'),
  ('nosep', 'wifinet'),
  ('phrase', 'a/b'),
  ('synonym', 'wi/fi/net'),
  ('synonym', 'wifi/net')
) AS t(kind, path) ORDER BY kind, path
"""

    # MultiCollector: one-pass fused scalar collectors over BM25 hits
    _mc_ctes = _bm25_scored_ctes({"hash": 1.0, "dup": 2.0})
    out["multi_collector_stats"] = f"""
WITH {_mc_ctes}
SELECT CAST(count(*) AS BIGINT) AS total_hits,
       round(max(s), 4) AS max_score,
       round(min(s), 4) AS min_score,
       round(sum(s), 4) AS sum_score,
       round(avg(s), 4) AS avg_score
FROM first
"""

    # IndriAnd: boost-weighted mean, smoothing freq=0 for missing clauses
    out["indri_and_topk"] = f"""
WITH tok AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
  ) WHERE term <> ''
),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS sttf FROM dl),
dlq AS (SELECT doc_id, {{_DLQ}} AS dl_q FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS freq FROM tok
  WHERE term IN ('hash', 'dup', 'scan') GROUP BY doc_id, term
),
tt AS (
  SELECT term, count(*) AS ttf FROM tok
  WHERE term IN ('hash', 'dup', 'scan') GROUP BY term
),
u AS (SELECT DISTINCT doc_id FROM tf),
boosts(term, boost) AS (VALUES ('hash', 1.0), ('dup', 2.0), ('scan', 0.5)),
pairs AS (
  SELECT u.doc_id, b.boost, tt.ttf, coalesce(f.freq, 0) AS freq, dlq.dl_q
  FROM u CROSS JOIN boosts b
  JOIN tt USING (term)
  LEFT JOIN tf f ON f.doc_id = u.doc_id AND f.term = b.term
  JOIN dlq ON dlq.doc_id = u.doc_id
),
sc AS (
  SELECT doc_id,
         sum(boost * ln((freq + 2000.0 * (ttf * 1.0 / sttf)) / (dl_q + 2000.0)))
           / (SELECT sum(boost) FROM boosts) AS s
  FROM pairs CROSS JOIN stats GROUP BY doc_id
)
SELECT doc_id, round(s, 4) AS score FROM sc
ORDER BY s DESC, doc_id ASC LIMIT 15
""".format(_DLQ=_DLQ)

    # SortedNumeric MAX selector, reverse, missing=0, docID ties
    out["sorted_numeric_selector_topk"] = """
SELECT doc_id,
       CAST(CASE WHEN doc_id % 9 = 0 THEN 0
            ELSE greatest(doc_id % 13, doc_id % 7 + 3, doc_id % 5 + 1)
       END AS BIGINT) AS sort_key
FROM documents
ORDER BY sort_key DESC, doc_id ASC LIMIT 40
"""

    # Late-interaction MaxSim over 4x16 embedding chunks, 2 query tokens
    out["late_interaction_topk"] = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
z AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS x, unnest(qv)::DOUBLE AS y
  FROM embeddings, q
),
s AS (
  SELECT vec_id, sum(x * y) AS dot, sum(x * x) AS na, sum(y * y) AS nq
  FROM z GROUP BY vec_id
),
fp AS (
  SELECT vec_id FROM s
  ORDER BY dot / (sqrt(na) * sqrt(nq)) DESC, vec_id ASC LIMIT 40
),
mv AS (
  SELECT e.vec_id,
         [e.embedding[1:16], e.embedding[17:32],
          e.embedding[33:48], e.embedding[49:64]] AS chunks
  FROM embeddings e JOIN fp USING (vec_id)
),
qq AS (SELECT qv[1:16]::DOUBLE[] AS q1, qv[49:64]::DOUBLE[] AS q2 FROM q),
sc AS (
  SELECT vec_id,
    list_max(list_transform(chunks,
      c -> (1 + list_cosine_similarity(c::DOUBLE[], q1)) / 2.0))
    + list_max(list_transform(chunks,
      c -> (1 + list_cosine_similarity(c::DOUBLE[], q2)) / 2.0)) AS sim
  FROM mv, qq
)
SELECT vec_id, round(sim, 6) AS score FROM sc
ORDER BY sim DESC, vec_id ASC LIMIT 15
"""

    # BlendedTermQuery: every term scored at df = max(df_i), DisMax 0.01
    out["blended_term_stats_topk"] = f"""
WITH tok AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
  ) WHERE term <> ''
),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS sttf FROM dl),
dlq AS (SELECT doc_id, {{_DLQ}} AS dl_q FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS freq FROM tok
  WHERE term IN ('hash', 'dup') GROUP BY doc_id, term
),
bl AS (SELECT max(doc_freq) AS dfb FROM (
  SELECT term, count(*) AS doc_freq FROM tf GROUP BY term
)),
boosts(term, boost) AS (VALUES ('hash', 1.0), ('dup', 1.5)),
per AS (
  SELECT doc_id,
         boost * ln(1 + (n_docs - dfb + 0.5) / (dfb + 0.5))
           * freq / (freq + {{_K1}} * (1 - {{_B}} + {{_B}} * dl_q / (sttf * 1.0 / n_docs))) AS s_t
  FROM tf JOIN boosts USING (term) JOIN dlq USING (doc_id)
  CROSS JOIN stats CROSS JOIN bl
),
sc AS (
  SELECT doc_id, max(s_t) + 0.01 * (sum(s_t) - max(s_t)) AS s
  FROM per GROUP BY doc_id
)
SELECT doc_id, round(s, 4) AS score FROM sc
ORDER BY s DESC, doc_id ASC LIMIT 15
""".format(_DLQ=_DLQ, _K1=_K1, _B=_B)

    # Telugu normalize→stem chain + Romanian cedilla folding, pinned
    out["te_ro_terms"] = """
SELECT * FROM (VALUES
  ('ro', 'aşa', 'așa'),
  ('ro', 'peţişoară', 'pețișoară'),
  ('te', 'అబ్బాయీ', 'అబ్బాయ'),
  ('te', 'ఔఐఆఈఊ', 'ఓఏఅఇఉ'),
  ('te', 'చేపిస్తున్నడు', 'చెపిస్తున్న'),
  ('te', 'చేపిస్తున్నది', 'చెపిస్తున్న'),
  ('te', 'పదాలూ', 'పదా'),
  ('te', 'పన్నులు', 'పన్ను'),
  ('te', 'వస్తువులు', 'వస్తువు')
) AS t(lang, word, out) ORDER BY lang, word
"""

    # wiki markup → display plain text (template pinned per doc)
    out["wiki_plain_text"] = """
SELECT doc_id,
       'Intro see docs ' || CAST(doc_id AS VARCHAR)
       || ' at site ' || CAST(doc_id AS VARCHAR) || ' Head done' AS plain
FROM documents ORDER BY doc_id LIMIT 80
"""

    # ExtendableQueryParser "anyof" extension → TermInSet const-score
    out["ext_parse_match"] = """
SELECT doc_id, 1.0 AS score FROM documents
WHERE list_contains(string_split(text, ' '), 'hash')
   OR list_contains(string_split(text, ' '), 'dup')
ORDER BY doc_id LIMIT 450
"""

    # BPE on the fixed template: canonical Sennrich merge progression
    # (e+s, es+t, est+</w>, l+o, lo+w, e+w, ew+est</w>, n+ewest</w>)
    out["bpe_pieces"] = """
SELECT * FROM (VALUES
  ('low', 'low </w>'),
  ('lowest', 'low est</w>'),
  ('newest', 'newest</w>'),
  ('wider', 'w i d e r </w>')
) AS t(word, pieces) ORDER BY word
"""
    return out
