"""Tests for the round-4 second-wave operators: distance-feature
queries, vector similarity / diversifying KNN, numeric doc-values
updates, repetition signals, Soundex, overlapping range facets."""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


# ---------------------------------------------------------------- distance


def test_long_distance_feature_scores(spark):
    from lucene_spark.search.distancefeature import long_distance_feature_topk

    df = spark.createDataFrame(
        [(1, 100), (2, 90), (3, 250), (4, None), (5, 101)],
        "id long, v long",
    )
    rows = long_distance_feature_topk(df, "id", "v", origin=100, pivot=10, k=5).collect()
    # id=1 at distance 0 scores 1.0; NULL value never matches
    assert [r["id"] for r in rows] == [1, 5, 2, 3]
    assert rows[0]["score"] == 1.0
    assert rows[1]["score"] == pytest.approx(10 / 11, abs=1e-6)
    assert all(r["id"] != 4 for r in rows)


def test_long_distance_feature_adaptive_matches_exact(spark):
    from lucene_spark.search.distancefeature import long_distance_feature_topk

    df = spark.range(0, 500).select(
        F.col("id"), ((F.col("id") * 37) % 1000).alias("v")
    )
    exact = long_distance_feature_topk(df, "id", "v", 500, 5.0, k=8).collect()
    adapt = long_distance_feature_topk(
        df, "id", "v", 500, 5.0, k=8, adaptive=True
    ).collect()
    assert [tuple(r) for r in exact] == [tuple(r) for r in adapt]


def test_distance_feature_monotone_in_distance(spark):
    from lucene_spark.search.distancefeature import long_distance_feature_topk

    df = spark.createDataFrame([(i, i * 10) for i in range(20)], "id long, v long")
    rows = long_distance_feature_topk(df, "id", "v", origin=0, pivot=50, k=20).collect()
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # score formula check: pivot/(pivot+d)
    assert rows[1]["score"] == pytest.approx(50 / 60, abs=1e-6)


def test_geo_distance_feature(spark):
    from lucene_spark.search.distancefeature import geo_distance_feature_topk

    pts = spark.createDataFrame(
        [(1, 48.8566, 2.3522), (2, 48.9, 2.4), (3, -33.86, 151.2)],
        "doc_id long, lat double, lon double",
    )
    rows = geo_distance_feature_topk(pts, 48.8566, 2.3522, pivot_m=1000.0, k=3).collect()
    assert rows[0]["doc_id"] == 1 and rows[0]["score"] == 1.0
    assert rows[1]["doc_id"] == 2 and rows[2]["doc_id"] == 3
    assert rows[2]["score"] < 0.001  # other side of the planet


def test_distance_boosted_union_semantics(spark):
    from lucene_spark.search.distancefeature import distance_boosted_topk

    scored = spark.createDataFrame([(1, 2.0), (2, 1.0)], "doc_id long, s double")
    feature = spark.createDataFrame(
        [(2, 100), (3, 100), (4, None)], "doc_id long, v long"
    )
    rows = distance_boosted_topk(scored, feature, "v", 100, 10, k=10).collect()
    got = {r["doc_id"]: r["score"] for r in rows}
    # doc 1: text only; doc 2: both; doc 3: feature only; doc 4 NULL -> absent
    assert got == {1: 2.0, 2: 2.0, 3: 1.0}


# ---------------------------------------------------------------- vectors


def test_vector_similarity_threshold(spark):
    from lucene_spark.search.knn import vector_similarity_match

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [-1.0, 0.0]),
            (4, [0.0, 1.0]),
            (5, [0.0, 0.0]),  # zero norm: guarded, scores 0
        ],
        "vec_id long, embedding array<float>",
    )
    rows = vector_similarity_match(emb, [1.0, 0.0], result_similarity=0.75).collect()
    ids = [r["vec_id"] for r in rows]
    assert ids == [1, 2]  # (1+cos)/2: 1.0, ~0.97; orthogonal=0.5; opposite=0.0
    assert rows[0]["score"] == 1.0


def test_vector_similarity_boost_after_threshold(spark):
    from lucene_spark.search.knn import vector_similarity_match

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    rows = vector_similarity_match(
        emb, [1.0, 0.0], result_similarity=0.9, boost=2.0
    ).collect()
    # threshold applies to the raw score, boost scales the output
    assert rows[0]["score"] == 2.0


def test_diversifying_children_one_per_parent(spark):
    from lucene_spark.search.knn import diversifying_children_topk

    rows = [
        (10, 1, [1.0, 0.0]),
        (11, 1, [0.99, 0.01]),
        (20, 2, [0.5, 0.5]),
        (21, 2, [0.6, 0.4]),
        (30, 3, [-1.0, 0.0]),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, parent_id long, embedding array<float>"
    )
    got = diversifying_children_topk(emb, [1.0, 0.0], k=3).collect()
    parents = [r["parent_id"] for r in got]
    assert parents == [1, 2, 3]  # one child each, score order
    assert got[0]["vec_id"] == 10  # best child of parent 1
    assert got[1]["vec_id"] == 21  # 0.6,0.4 beats 0.5,0.5


def test_diversifying_tie_breaks_to_smaller_child(spark):
    from lucene_spark.search.knn import diversifying_children_topk

    emb = spark.createDataFrame(
        [(12, 1, [1.0, 0.0]), (11, 1, [2.0, 0.0])],
        "vec_id long, parent_id long, embedding array<float>",
    )
    got = diversifying_children_topk(emb, [1.0, 0.0], k=1).collect()
    assert got[0]["vec_id"] == 11  # same cosine (colinear): smaller id wins


# ---------------------------------------------------------------- dv updates


def test_dv_update_last_wins(spark):
    from lucene_spark.index.dvupdates import DocValuesUpdates

    base = spark.createDataFrame(
        [(i, 1.0) for i in range(6)], "doc_id long, w double"
    )
    m1 = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    m2 = spark.createDataFrame([(3,), (4,)], "doc_id long")
    dv = (
        DocValuesUpdates(base)
        .update_numeric(m1, "w", 10.0)
        .update_numeric(m2, "w", 3.0)
    )
    got = {r["doc_id"]: r["w"] for r in dv.resolved().collect()}
    assert got == {0: 1.0, 1: 10.0, 2: 10.0, 3: 3.0, 4: 3.0, 5: 1.0}


def test_dv_update_unknown_field_raises(spark):
    from lucene_spark.index.dvupdates import DocValuesUpdates

    base = spark.createDataFrame([(1, 1.0)], "doc_id long, w double")
    with pytest.raises(ValueError):
        DocValuesUpdates(base).update_numeric(base.select("doc_id"), "nope", 1.0)


def test_dv_update_schema_and_no_log_passthrough(spark):
    from lucene_spark.index.dvupdates import DocValuesUpdates

    base = spark.createDataFrame([(1, 1.0)], "doc_id long, w double")
    dv = DocValuesUpdates(base)
    assert dv.resolved() is base
    upd = dv.update_numeric(base.select("doc_id"), "w", 2.0)
    assert upd.resolved().columns == base.columns


# ---------------------------------------------------------------- repetition


def test_repetition_signals_known_doc(spark):
    from lucene_spark.pipeline.repetition import repetition_signals

    text = "a b c a b c x y z"  # lines of 3: 'a b c','a b c','x y z'
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = repetition_signals(df, line_tokens=3).collect()[0]
    assert r["n_words"] == 9 and r["n_lines"] == 3
    assert r["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-4)
    assert r["dup_line_char_frac"] == pytest.approx(5 / 15, abs=1e-4)
    # best 2-gram 'a b' (or 'b c') covers 2*3=6 chars of 17
    assert r["top2_char_frac"] == pytest.approx(6 / 17, abs=1e-4)
    # 5-grams: all 5 distinct -> no dups
    assert r["dup5_frac"] == 0.0


def test_repetition_signals_newline_mode(spark):
    from lucene_spark.pipeline.repetition import repetition_signals

    df = spark.createDataFrame(
        [(1, "hello world\nhello world\nbye")], "doc_id long, text string"
    )
    r = repetition_signals(df).collect()[0]
    assert r["n_lines"] == 3
    assert r["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-4)


def test_repetition_signals_empty_and_short(spark):
    from lucene_spark.pipeline.repetition import repetition_signals

    df = spark.createDataFrame(
        [(1, ""), (2, "one two")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in repetition_signals(df, line_tokens=3).collect()}
    assert rows[1]["n_words"] == 0 and rows[1]["dup5_frac"] == 0.0
    assert rows[2]["dup5_frac"] == 0.0  # shorter than the n-gram


def test_repetition_rounding_is_half_away(spark):
    from lucene_spark.pipeline.repetition import _r4

    assert _r4(1 / 32) == 0.0313  # Python round() would give 0.0312
    assert _r4(0.5) == 0.5


# ---------------------------------------------------------------- phonetic


def test_soundex_reference_vectors():
    from lucene_spark.analysis.phonetic import soundex

    # commons-codec test vectors (H/W transparency included)
    assert soundex("Robert") == "R163"
    assert soundex("Rupert") == "R163"
    assert soundex("Ashcraft") == "A261"
    assert soundex("Ashcroft") == "A261"
    assert soundex("Tymczak") == "T522"
    assert soundex("Pfister") == "P236"
    assert soundex("Honeyman") == "H555"
    assert soundex("") == ""
    # case-expanding codepoints (ß.upper() == 'SS') must be stripped
    # BEFORE upper-casing, like the column/SQL chains strip them
    assert soundex("Straße") == soundex("Strae")
    assert soundex("123") == ""


def test_soundex_three_way_parity(spark):
    import duckdb

    from lucene_spark.analysis.phonetic import soundex, soundex_col, soundex_sql

    words = [
        "Robert", "Rupert", "Ashcraft", "Tymczak", "Pfister", "hash",
        "spark", "sparc", "Honeyman", "Washington", "Lee", "Gutierrez",
        "Jackson", "VanDeusen", "o'brien", "x", "", "Czarkowska",
    ]
    py = [soundex(w) for w in words]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    sp = [r["c"] for r in df.select(soundex_col(F.col("w")).alias("c")).collect()]
    arr = ", ".join("'" + w.replace("'", "''") + "'" for w in words)
    du = [
        r[0]
        for r in duckdb.sql(
            f"SELECT {soundex_sql('w')} FROM (SELECT unnest([{arr}]) AS w)"
        ).fetchall()
    ]
    assert py == sp == du


def test_phonetic_match_finds_sound_alikes(spark):
    from lucene_spark.analysis.phonetic import phonetic_match

    df = spark.createDataFrame(
        [(1, "the spark engine"), (2, "a sparc chip"), (3, "nothing here")],
        "doc_id long, text string",
    )
    ids = sorted(r["doc_id"] for r in phonetic_match(df, "sparc").collect())
    assert ids == [1, 2]


# ---------------------------------------------------------------- range facets


def test_long_range_counts_overlapping(spark):
    from lucene_spark.search.facets import long_range_counts

    df = spark.range(0, 100).withColumnRenamed("id", "v")
    rows = long_range_counts(
        df,
        "v",
        [("lo", 0, 50), ("hi", 50, 100), ("all", 0, True, 99, True), ("mid", 25, 75)],
    ).collect()
    got = {r["label"]: r["cnt"] for r in rows}
    assert got == {"lo": 50, "hi": 50, "all": 100, "mid": 50}
    # overlap: totals exceed row count — not a partition/histogram
    assert sum(got.values()) > 100


def test_long_range_counts_inclusive_flags(spark):
    from lucene_spark.search.facets import long_range_counts

    df = spark.range(0, 10).withColumnRenamed("id", "v")
    rows = long_range_counts(
        df, "v", [("a", 0, False, 9, True), ("b", 0, True, 9, False)]
    ).collect()
    got = {r["label"]: r["cnt"] for r in rows}
    assert got == {"a": 9, "b": 9}


def test_long_range_counts_single_scan_plan(spark):
    from lucene_spark.search.facets import long_range_counts

    df = spark.range(0, 10).withColumnRenamed("id", "v")
    plan = long_range_counts(df, "v", [("a", 0, 5), ("b", 3, 8)])._jdf.queryExecution().executedPlan().toString()
    # no join/union: one aggregate over one scan
    assert "Join" not in plan and "Union" not in plan


# ---------------------------------------------------------------- integration


def test_distance_feature_oracle_parity_small(spark):
    """Engine vs DuckDB on the real sf0.001 events table."""
    import duckdb

    from lucene_spark.search.distancefeature import long_distance_feature_topk

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '2024-01-15 00:00:00', ts)"
        ).alias("v"),
    )
    got = [
        (r["event_id"], r["score"])
        for r in long_distance_feature_topk(
            ev, "event_id", "v", 0, 86_400_000_000, k=10
        ).collect()
    ]
    expr = (
        "86400000000.0 / (86400000000.0 + abs(date_diff('microsecond', "
        "TIMESTAMP '2024-01-15 00:00:00', ts)))"
    )
    want = duckdb.sql(
        f"SELECT event_id, round({expr}, 6) FROM '{SF_DIR}/events.parquet' "
        f"ORDER BY {expr} DESC, event_id LIMIT 10"
    ).fetchall()
    assert got == [(a, b) for a, b in want]


# ---------------------------------------------------------------- c4 / facets


def test_c4_quality_signals(spark):
    from lucene_spark.pipeline.textstats import c4_quality_signals

    docs = [
        (1, "This is a fine sentence.\nAnd another good one!\nA third one?"),
        (2, "short\ntiny"),
        (3, "we have lorem ipsum inside. yes. three. sentences."),
        (4, "code here { x = 1; }. more. text."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in c4_quality_signals(df).collect()}
    assert got[1]["keep"] == 1 and got[1]["n_sentences"] == 3
    assert got[1]["terminal_punct_line_frac"] == 1.0
    assert got[2]["keep"] == 0  # < 3 sentences
    assert got[2]["short_line_frac"] == 1.0
    assert got[3]["keep"] == 0 and got[3]["has_lorem"] == 1
    assert got[4]["keep"] == 0 and got[4]["has_brace"] == 1


def test_sampled_facet_counts_deterministic_and_scaled(spark):
    from lucene_spark.search.facets import sampled_facet_counts

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = sampled_facet_counts(df, "lang", 0.5, seed=1).collect()
    b = sampled_facet_counts(df, "lang", 0.5, seed=1).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]  # deterministic
    total_est = sum(r["cnt_est"] for r in a)
    n = df.count()
    assert abs(total_est - n) / n < 0.25  # amortized estimate ~ truth
    for r in a:
        assert r["cnt_est"] == r["cnt_sampled"] / 0.5


def test_parent_children_block_join(spark):
    from lucene_spark.search.blockjoin import parent_children_block_join

    ch = spark.createDataFrame(
        [(1, 10, 2.0), (1, 11, 3.0), (2, 20, 1.0)],
        "pk long, cid long, v double",
    )
    got = parent_children_block_join(ch, "pk", 1, F.col("v") * 2).collect()
    assert sorted(r["cid"] for r in got) == [10, 11]
    assert {r["cid"]: r["score"] for r in got} == {10: 4.0, 11: 6.0}
    plan = parent_children_block_join(ch, "pk", 1)._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan


def test_join_util_score_modes(spark):
    from lucene_spark.search.joinutil import join_query, join_value_scores

    fr = spark.createDataFrame([(1, 10.0), (1, 20.0), (2, 5.0)], "k int, s double")
    to = spark.createDataFrame(
        [(100, 1), (101, 1), (102, 2), (103, 3)], "id int, k2 int"
    )
    for mode, v1, v2 in [
        ("max", 20.0, 5.0),
        ("total", 30.0, 5.0),
        ("min", 10.0, 5.0),
        ("avg", 15.0, 5.0),
        ("none", 1.0, 1.0),
    ]:
        got = {
            r["id"]: r["join_score"]
            for r in join_query(fr, "k", "s", to, "k2", mode).collect()
        }
        # to-doc 103 has no from-side value and must drop out
        assert got == {100: v1, 101: v1, 102: v2}, mode
    with pytest.raises(ValueError):
        join_value_scores(fr, "k", "s", "bogus")


def test_ngram_contamination(spark):
    from lucene_spark.pipeline.contamination import (
        contaminated_ids,
        ngram_contamination,
    )

    train = spark.createDataFrame(
        [(0, "a b c d e"), (1, "x y z w v"), (2, "a b c d e"), (3, "a b")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "q q a b c q q")], "doc_id long, text string"
    )
    rep = {r["doc_id"]: r for r in ngram_contamination(train, ev, n=3).collect()}
    # doc 3 is shorter than n words -> no shingles, absent from report
    assert set(rep) == {0, 1, 2}
    assert rep[0]["n_grams"] == 3 and rep[0]["n_hit"] == 1  # 'a b c'
    assert rep[0]["frac"] == pytest.approx(1 / 3)
    assert rep[0]["contaminated"] == 1
    assert rep[1]["n_hit"] == 0 and rep[1]["contaminated"] == 0
    assert rep[2]["contaminated"] == 1
    # threshold above the overlap fraction un-flags
    rep2 = {
        r["doc_id"]: r["contaminated"]
        for r in ngram_contamination(train, ev, n=3, threshold=0.5).collect()
    }
    assert rep2 == {0: 0, 1: 0, 2: 0}
    ids = sorted(r["doc_id"] for r in contaminated_ids(train, ev, n=3).collect())
    assert ids == [0, 2]


def test_common_terms_query(spark):
    from lucene_spark.index.builder import InvertedIndex
    from lucene_spark.search.commonterms import common_terms_topk

    rows = [
        (i, "common filler" + (" rare" if i < 2 else "")) for i in range(9)
    ] + [(9, "common")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = InvertedIndex.build(docs, analyzer="simple", docs_per_segment=16)
    # df: common=10, filler=9 (high, > ceil(0.5*10)=5); rare=2 (low)
    got = common_terms_topk(idx, ["rare", "common"], 0.5, k=10).collect()
    assert sorted(r["doc_id"] for r in got) == [0, 1]  # gated by the rare term
    low_only = common_terms_topk(idx, ["rare"], 0.5, k=10).collect()
    assert got[0]["score"] > low_only[0]["score"]  # high term still adds score
    # low group empty -> high terms rewrite to a conjunction
    ho = sorted(
        r["doc_id"] for r in common_terms_topk(idx, ["common", "filler"], 0.5, k=20).collect()
    )
    assert ho == list(range(9))  # doc 9 lacks 'filler'
    with pytest.raises(ValueError):
        common_terms_topk(idx, ["rare"], 0.5, low_occur="must_not")


def test_multi_range_match(spark):
    from lucene_spark.search.rangefield import multi_range_match

    df = spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, v double")
    got = sorted(
        r["id"] for r in multi_range_match(df, "v", [(1, 3), (2, 4), (8, 9)]).collect()
    )
    assert got == [1, 2, 3, 4, 8, 9]  # overlapping ranges don't duplicate
    assert multi_range_match(df, "v", []).count() == 0


def test_term_automaton_basic_shapes(spark):
    from lucene_spark.search.termautomaton import (
        TermAutomaton,
        doc_position_frame,
        term_automaton_freqs,
    )

    docs = spark.createDataFrame(
        [
            (0, "a b c"),
            (1, "a x c"),
            (2, "a b"),
            (3, "q a b c a y c"),
            (4, "c b a"),
        ],
        "doc_id long, text string",
    )
    pos = doc_position_frame(docs)

    def freqs(auto):
        return {
            r["doc_id"]: r["freq"] for r in term_automaton_freqs(pos, auto).collect()
        }

    # exact phrase "a b c" (PhraseQuery degeneration)
    a = TermAutomaton()
    s1, s2, s3 = a.create_state(), a.create_state(), a.create_state()
    a.add_transition(0, s1, "a")
    a.add_transition(s1, s2, "b")
    a.add_transition(s2, s3, "c")
    a.set_accept(s3)
    assert freqs(a) == {0: 1, 3: 1}

    # "a <any> c": hole matches both b and x / y
    h = TermAutomaton()
    t1, t2, t3 = h.create_state(), h.create_state(), h.create_state()
    h.add_transition(0, t1, "a")
    h.add_any_transition(t1, t2)
    h.add_transition(t2, t3, "c")
    h.set_accept(t3)
    assert freqs(h) == {0: 1, 1: 1, 3: 2}

    # synonym alternation "(a|q) b" (MultiPhraseQuery degeneration)
    m = TermAutomaton()
    u1, u2 = m.create_state(), m.create_state()
    m.add_transition(0, u1, "a")
    m.add_transition(0, u1, "q")
    m.add_transition(u1, u2, "b")
    m.set_accept(u2)
    assert freqs(m) == {0: 1, 2: 1, 3: 1}  # doc 3: only 'a b' at pos 1

    # cycles are rejected (unbounded run length)
    c = TermAutomaton()
    v1 = c.create_state()
    c.add_transition(0, v1, "a")
    c.add_any_transition(v1, 0)
    c.set_accept(v1)
    with pytest.raises(ValueError):
        term_automaton_freqs(pos, c)


def test_best_passages_multi(spark):
    from lucene_spark.search.highlight import best_passages

    docs = spark.createDataFrame(
        [(0, "x x x hash join x x x " * 2 + "hash y y y y y y y")],
        "doc_id long, text string",
    )
    one = best_passages(docs, ["hash", "join"], window=8).collect()
    assert len(one) == 1 and "passage_rank" not in one[0].asDict()
    multi = (
        best_passages(docs, ["hash", "join"], window=8, n_passages=3)
        .orderBy("passage_rank")
        .collect()
    )
    assert [r["passage_rank"] for r in multi] == [1, 2, 3]
    scores = [r["passage_score"] for r in multi]
    assert scores == sorted(scores, reverse=True)
    # rank 1 equals the single-passage answer
    assert multi[0]["passage_start"] == one[0]["passage_start"]
    assert multi[0]["passage"] == one[0]["passage"]


def test_shape_polygon_query_relations(spark):
    from lucene_spark.search.shape import shape_polygon_query

    rows = [
        # big triangle ring that CONTAINS the query square (its open
        # polyline never touches the square — only the ring interior)
        (0, [0.0, 0.0, 10.0], [0.0, 10.0, 0.0]),
        (1, [1.1, 1.2], [1.1, 1.2]),  # tiny line inside the square
        (2, [-5.0, 5.0], [1.5, 1.5]),  # line crossing the square
        (3, [50.0, 60.0], [50.0, 60.0]),  # far away
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lats array<double>, lons array<double>"
    )
    q = [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0)]  # unit square 1..2

    def ids(relation, polygon):
        return sorted(
            r["doc_id"]
            for r in shape_polygon_query(df, q, relation, polygon=polygon).collect()
        )

    # as open polylines: the triangle's edges never touch the square
    assert ids("intersects", polygon=False) == [1, 2]
    assert ids("within", polygon=False) == [1]
    assert ids("disjoint", polygon=False) == [0, 3]
    # as polygon rings: shape-contains-query makes the triangle match
    assert ids("intersects", polygon=True) == [0, 1, 2]
    assert ids("disjoint", polygon=True) == [3]


def test_word_break_and_combine_suggest(spark):
    from lucene_spark.index.builder import InvertedIndex
    from lucene_spark.search.suggest import (
        word_break_suggest,
        word_combine_suggest,
    )

    docs = spark.createDataFrame(
        [
            (0, "data base system"),
            (1, "database system"),
            (2, "data base"),
            (3, "database database"),
        ],
        "doc_id long, text string",
    )
    idx = InvertedIndex.build(docs, analyzer="simple", docs_per_segment=8)
    # break 'database' -> data + base (both df=2); no other split exists
    br = word_break_suggest(idx, "database").collect()
    assert [(r["left_part"], r["right_part"], r["score"]) for r in br] == [
        ("data", "base", 4)
    ]
    # min_break_len excludes short parts
    assert word_break_suggest(idx, "database", min_break_len=5).collect() == []
    # combine ['data','base'] -> 'database' with the combined term's df
    cb = word_combine_suggest(idx, ["data", "base", "system"]).collect()
    assert [(r["combined"], r["freq"]) for r in cb] == [("database", 2)]
    # SUGGEST_MORE_POPULAR: combined df (2) equals the components' df
    # (2) -> kept; raising the bar via a more popular component drops it
    assert len(word_combine_suggest(idx, ["data", "base"], more_popular=True).collect()) == 1
    with_sys = word_combine_suggest(idx, ["base", "system"], more_popular=True).collect()
    assert with_sys == []  # 'basesystem' is not a term


def test_phrase_wildcard_matches_literal_expansion(spark):
    from lucene_spark.index.builder import InvertedIndex
    from lucene_spark.search import PrefixQuery, WildcardQuery
    from lucene_spark.search.positional import (
        multi_phrase_freqs,
        phrase_wildcard_freqs,
    )

    docs = spark.createDataFrame(
        [
            (0, "hash join beats nested loop"),
            (1, "hash joins everywhere hash join"),
            (2, "hash table no join here"),
            (3, "merge join after hash jolt"),
            (4, "join hash reversed order"),
        ],
        ["doc_id", "text"],
    )
    idx = InvertedIndex.build(docs, docs_per_segment=4, positions=True)

    got = {
        r["doc_id"]: r["freq"]
        for r in phrase_wildcard_freqs(idx, ["hash", PrefixQuery("jo")]).collect()
    }
    # expansion of jo* in this corpus: join, joins, jolt
    want = {
        r["doc_id"]: r["freq"]
        for r in multi_phrase_freqs(idx, [["hash"], ["join", "joins", "jolt"]]).collect()
    }
    assert got == want == {0: 1.0, 1: 2.0, 3: 1.0}

    # wildcard slot + literal tail
    got2 = sorted(
        r["doc_id"]
        for r in phrase_wildcard_freqs(idx, [WildcardQuery("ha*"), "join"]).collect()
    )
    assert got2 == [0, 1]


def test_phrase_wildcard_empty_expansion_and_budget(spark):
    from lucene_spark.index.builder import InvertedIndex
    from lucene_spark.search import PrefixQuery
    from lucene_spark.search.positional import phrase_wildcard_freqs

    docs = spark.createDataFrame(
        [(0, "hash join"), (1, "hash jab jam join")], ["doc_id", "text"]
    )
    idx = InvertedIndex.build(docs, docs_per_segment=4, positions=True)

    # no dictionary term starts with 'zz' -> empty result, stable schema
    empty = phrase_wildcard_freqs(idx, ["hash", PrefixQuery("zz")])
    assert empty.count() == 0
    assert empty.columns == ["doc_id", "freq", "norm"]

    # whole-query expansion budget: with budget 2, slot jo|ja* takes the
    # first 2 terms in term order (jab, jam) and 'join' is not collected
    got = sorted(
        r["doc_id"]
        for r in phrase_wildcard_freqs(
            idx, ["hash", PrefixQuery("j")], max_expansions=2
        ).collect()
    )
    assert got == [1]  # jab/jam follow hash only in doc 1; join excluded
