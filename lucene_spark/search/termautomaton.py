"""TermAutomatonQuery: proximity matching by a term automaton
(`lucene/sandbox/src/java/org/apache/lucene/sandbox/search/TermAutomatonQuery.java:83`).

The reference generalizes PhraseQuery / MultiPhraseQuery /
SpanNearQuery to an automaton whose transitions are terms (plus an
ANY transition, `addAnyTransition`:123) and runs it over each
document's position stream. This re-expression simulates the same
automaton as a bounded sequence of DataFrame joins: the frontier of
live runs ``(doc_id, start, pos, state)`` advances one token per
step by joining the position table against the (tiny, broadcast)
transition table; a run that reaches an accept state records its
start position, and ``freq`` is the number of distinct accepted
starts per doc — the reference's per-position match count.

Only ACYCLIC automata are supported (every real use: phrases,
synonym lattices, fixed-width holes); a cycle would make the run
length unbounded, and `finish()`-time determinization in the
reference serves the same normalization role. The step count is then
bounded by the automaton's state count, so the whole match is at most
``n_states`` hash joins on (doc_id, pos) — each one partial and
shuffle-free when the position frame is already hash-partitioned by
doc_id, and the frontier only ever shrinks.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "TermAutomaton",
    "term_automaton_freqs",
    "doc_position_frame",
    "token_stream_to_automaton",
]


class TermAutomaton:
    """Build states/transitions like the reference API: state 0 is the
    initial state; ``None`` as the term is the ANY transition."""

    def __init__(self):
        self.n_states = 1
        self.transitions: List[Tuple[int, int, Optional[str]]] = []
        self.accepts: Set[int] = set()

    def create_state(self) -> int:
        self.n_states += 1
        return self.n_states - 1

    def set_accept(self, state: int, accept: bool = True) -> None:
        if accept:
            self.accepts.add(state)
        else:
            self.accepts.discard(state)

    def add_transition(self, source: int, dest: int, term: str) -> None:
        self.transitions.append((source, dest, term))

    def add_any_transition(self, source: int, dest: int) -> None:
        self.transitions.append((source, dest, None))

    def _check_acyclic(self) -> None:
        adj: Dict[int, List[int]] = {}
        for s, d, _ in self.transitions:
            adj.setdefault(s, []).append(d)
        # states in progress (1) / done (2)
        color: Dict[int, int] = {}

        def dfs(u: int) -> None:
            color[u] = 1
            for v in adj.get(u, []):
                if color.get(v) == 1:
                    raise ValueError(
                        "cyclic term automaton: unbounded run length is "
                        "unsupported (the reference determinizes at finish())"
                    )
                if color.get(v, 0) == 0:
                    dfs(v)
            color[u] = 2

        dfs(0)


def doc_position_frame(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pos, term) token positions via the simple analyzer."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
    ).filter(F.col("term") != "")


def term_automaton_freqs(positions: DataFrame, auto: TermAutomaton) -> DataFrame:
    """(doc_id, freq) for docs the automaton matches, ``freq`` =
    distinct accepted start positions."""
    auto._check_acyclic()
    spark = positions.sparkSession
    term_trans = [(s, d, t) for s, d, t in auto.transitions if t is not None]
    any_trans = [(s, d) for s, d, t in auto.transitions if t is None]

    def step(frontier: DataFrame) -> DataFrame:
        """Advance every live run one token."""
        tok = positions.select("doc_id", F.col("pos").alias("cur"), "term")
        outs = []
        if term_trans:
            tt = spark.createDataFrame(
                term_trans, "state int, dst int, term string"
            )
            outs.append(
                frontier.join(tok, ["doc_id", "cur"])
                .join(F.broadcast(tt), ["state", "term"])
                .select(
                    "doc_id",
                    "start",
                    (F.col("cur") + 1).alias("cur"),
                    F.col("dst").alias("state"),
                )
            )
        if any_trans:
            at = spark.createDataFrame(any_trans, "state int, dst int")
            outs.append(
                frontier.join(tok.select("doc_id", "cur"), ["doc_id", "cur"])
                .join(F.broadcast(at), ["state"])
                .select(
                    "doc_id",
                    "start",
                    (F.col("cur") + 1).alias("cur"),
                    F.col("dst").alias("state"),
                )
            )
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o)
        return out.distinct()

    frontier = positions.select(
        "doc_id", F.col("pos").alias("start"), F.col("pos").alias("cur"), F.lit(0).alias("state")
    )
    accepted = None
    # acyclic: every run consumes one token per step and dies within
    # n_states steps, so this loop is bounded and each step shrinks
    for _ in range(auto.n_states):
        frontier = step(frontier)
        if auto.accepts:
            hit = frontier.filter(
                F.col("state").isin([int(a) for a in auto.accepts])
            ).select("doc_id", "start")
            accepted = hit if accepted is None else accepted.unionByName(hit)

    if accepted is None:
        return positions.select("doc_id").filter(F.lit(False)).withColumn(
            "freq", F.lit(0).cast("long")
        )
    return (
        accepted.distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def token_stream_to_automaton(
    tokens, preserve_position_increments: bool = True
) -> TermAutomaton:
    """TokenStreamToTermAutomatonQuery analog
    (`sandbox/search/TokenStreamToTermAutomatonQuery.java:35`): a token
    stream of ``(term, pos_inc, pos_length)`` triples → term automaton.

    Mirrors the reference exactly: positions become states; a token
    spans ``pos → pos + pos_length`` (posLength > 1 = synonym-graph
    side path); posInc 0 stacks synonyms on one source state; the
    literal term ``"*"`` becomes an ANY transition; a hole
    (posInc > 1) raises unless ``preserve_position_increments`` is
    False, which clamps it to 1 (java:62,66); the LAST created state
    is the sole accept state (java:87).
    """
    auto = TermAutomaton()
    pos = -1
    max_state = 0  # state 0 pre-exists
    saw_token = False
    for term, pos_inc, pos_length in tokens:
        saw_token = True
        if pos_length < 1:
            raise ValueError("pos_length must be >= 1")
        if not preserve_position_increments and pos_inc > 1:
            pos_inc = 1
        if pos < 0 and pos_inc <= 0:
            raise ValueError("first token must have a positive increment")
        if pos_inc > 1:
            raise ValueError(
                "cannot handle holes; to accept any term, use '*' term"
            )
        if pos_inc > 0:
            pos += pos_inc
        end_pos = pos + int(pos_length)
        while max_state < end_pos:
            max_state = auto.create_state()
        if term == "*":
            auto.add_any_transition(pos, end_pos)
        else:
            auto.add_transition(pos, end_pos, term)
    if not saw_token:
        raise ValueError("empty token stream")
    auto.set_accept(max_state, True)
    return auto
