"""benchmark/byTask analog: .alg parsing and algorithm execution
(Benchmark.java / Algorithm.java / TaskSequence / RepSumByName)."""

import pytest

from lucene_spark.bytask import (
    AlgorithmError,
    parse_algorithm,
    run_algorithm,
)

MICRO_ALG = """
# micro-standard-shaped algorithm (conf/micro-standard.alg)
merge.factor=mrg:10:100
docs.per.segment=8
log.step=500

{ "Rounds"
    ResetSystemErase
    { "Populate"
        -CreateIndex
        { "MAddDocs" AddDoc > : 20
        -ForceMerge(1)
        -CloseIndex
    }
    OpenReader
    { "SearchSameRdr" Search > : 4
    CloseReader
    NewRound
} : 2
RepSumByName
"""


def test_parse_structure():
    props, root = parse_algorithm(MICRO_ALG)
    assert props["docs.per.segment"] == "8"
    # round-iterated property
    assert props["merge.factor"] == {"column": "mrg", "values": ["10", "100"]}
    rounds = root.children[0]
    assert rounds.name == "Rounds" and rounds.reps == 2
    names = [getattr(c, "name", None) for c in rounds.children]
    assert names == [
        "ResetSystemErase", "Populate", "OpenReader", "SearchSameRdr",
        "CloseReader", "NewRound",
    ]
    populate = rounds.children[1]
    madd = populate.children[1]
    assert madd.name == "MAddDocs" and madd.reps == 20 and madd.collapse
    # '-' prefix disables reporting
    assert populate.children[0].report is False


def test_unbalanced_raises():
    with pytest.raises(AlgorithmError):
        parse_algorithm("{ \"A\" AddDoc")
    with pytest.raises(AlgorithmError):
        parse_algorithm("AddDoc }")


def test_unknown_task_raises(spark, documents):
    with pytest.raises(AlgorithmError):
        run_algorithm(spark, documents, '{ "X" FlyToTheMoon } : 1')


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"hash join merge scan w{i % 5}") for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_run_micro(spark, corpus):
    res = run_algorithm(spark, corpus, MICRO_ALG)
    assert res["rounds"] == 3  # two NewRound + initial
    by = {r["op"]: r for r in res["by_name"]}
    # 2 rounds x 20 collapsed AddDoc lines -> Seq rows, searches recorded
    assert by["Seq_MAddDocs_20"]["runCnt"] == 40
    assert by["Seq_SearchSameRdr_4"]["recs"] > 0
    # '-' tasks produce no report lines
    assert "CreateIndex" not in by and "ForceMerge" not in by
    assert not res["warnings"]


def test_search_hits_added_docs_only(spark, corpus):
    alg = '{ CreateIndex { "Add" AddDocs(10) > : 1 CloseIndex OpenReader { "S" Search > : 1 } : 1'
    # unbalanced on purpose? no — close everything properly:
    alg = (
        '{ "Run" CreateIndex { "Add" AddDocs(10) > : 1 '
        "CloseIndex OpenReader { \"S\" Search > : 1 CloseReader } : 1"
    )
    res = run_algorithm(spark, corpus, alg, queries=[{"hash": 1.0}], k=50)
    by = {r["op"]: r for r in res["by_name"]}
    # only the 10 added docs are searchable (batch ContentSource analog)
    assert by["Seq_S_1"]["recs"] == 10


def test_parallel_runs_sequentially_with_warning(spark, corpus):
    alg = '[ "Par" AddDocs(5) ] : 2'
    res = run_algorithm(spark, corpus, alg)
    assert any("sequentially" in w for w in res["warnings"])
    by = {r["op"]: r for r in res["by_name"]}
    assert by["AddDocs"]["recs"] == 10


def test_round_iterated_property(spark, corpus):
    alg = '{ "R" AddDocs(1) NewRound } : 3'
    props, _ = parse_algorithm("p=c:1:2\n" + alg)
    res = run_algorithm(spark, corpus, "p=c:1:2\n" + alg)
    assert res["rounds"] == 4


def test_search_task_variants(spark, corpus):
    alg = (
        '{ "Run" CreateIndex { "Add" AddDocs(20) > : 1 CloseIndex OpenReader '
        '{ "C" CountingSearch > : 1 { "T" SearchTrav(3) > : 1 '
        '{ "W" Warm > : 1 { "SS" SearchWithSort > : 1 CloseReader } : 1'
    )
    res = run_algorithm(spark, corpus, alg, queries=[{"hash": 1.0}], k=5)
    by = {r["op"]: r for r in res["by_name"]}
    assert by["Seq_C_1"]["recs"] == 20       # every doc matches 'hash'
    assert by["Seq_T_1"]["recs"] == 3        # traversal capped at arg
    assert by["Seq_W_1"]["recs"] == 20       # warm touches every doc
    assert by["Seq_SS_1"]["recs"] == 5       # sorted page of k
