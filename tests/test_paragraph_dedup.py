"""Paragraph-level exact dedup (RefinedWeb/Falcon line-dedup stage):
first-(doc,pos) keeper, within-doc repeats collapse, order-preserving
reassembly, empty-paragraph filtering."""

from lucene_spark.pipeline.dedup import paragraph_dedup


def test_paragraph_dedup_keeper_and_rebuild(spark):
    df = spark.createDataFrame(
        [
            (1, "A\nB\nA"),      # within-doc repeat of A
            (2, "B\nC"),          # B already seen in doc 1
            (3, "C\n\n  \nD"),   # blank paragraphs dropped from counts
        ],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    assert rows[1].clean_text == "A\nB" and rows[1].n_paragraphs == 3
    assert rows[1].n_kept == 2
    assert rows[2].clean_text == "C" and rows[2].n_kept == 1
    assert rows[3].clean_text == "D" and rows[3].n_paragraphs == 2
    assert rows[3].n_kept == 1


def test_paragraph_dedup_all_duplicate_doc_empty(spark):
    df = spark.createDataFrame(
        [(1, "X"), (2, "X")], "doc_id bigint, text string"
    )
    rows = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    assert rows[1].clean_text == "X"
    assert rows[2].clean_text == "" and rows[2].n_kept == 0
    assert rows[2].n_paragraphs == 1


def test_perplexity_buckets_tertiles(spark):
    # CCNet head/middle/tail: 9 docs with distinct ppl -> 3/3/3,
    # head holds the lowest values
    from lucene_spark.pipeline.lm import perplexity_buckets

    ppl = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 10)], "doc_id bigint, log10_ppl double"
    )
    rows = {r.bucket: r for r in perplexity_buckets(ppl).collect()}
    assert set(rows) == {"head", "middle", "tail"}
    assert rows["head"].n_docs == 3 and rows["head"].max_ppl == 3.0
    assert rows["tail"].min_ppl == 7.0 and rows["tail"].n_docs == 3


def test_temperature_mixing_weights(spark):
    # alpha=1 -> proportional; alpha=0 -> uniform; alpha=0.5 upweights
    # the low-resource domain
    from lucene_spark.pipeline.sampling import temperature_mixing_weights

    df = spark.createDataFrame(
        [("a",)] * 9 + [("b",)], "d string"
    )
    prop = {r.domain: r.weight for r in
            temperature_mixing_weights(df, "d", alpha=1.0).collect()}
    assert prop == {"a": 0.9, "b": 0.1}
    unif = {r.domain: r.weight for r in
            temperature_mixing_weights(df, "d", alpha=0.0).collect()}
    assert unif == {"a": 0.5, "b": 0.5}
    smooth = {r.domain: r.weight for r in
              temperature_mixing_weights(df, "d", alpha=0.5).collect()}
    assert 0.1 < smooth["b"] < 0.5
    rows = temperature_mixing_weights(df, "d", alpha=0.7, budget=100).collect()
    assert abs(sum(r.expected for r in rows) - 100.0) < 0.1
