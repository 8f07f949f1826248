"""Property-based tests (hypothesis) for the closing-session modules:
invariants that hold on arbitrary inputs, complementing the pinned
reference goldens."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_spark.analysis.filters import delimited_boost_terms
from lucene_spark.analysis.miscfilters import concatenate_graph_paths
from lucene_spark.analysis.synparser import (
    parse_solr_synonyms,
    synonym_map,
)
from lucene_spark.analysis.wiki import wikipedia_tokenize
from lucene_spark.pipeline.bpe import END_OF_WORD, _merge_loop, bpe_encode

_words = st.text(alphabet="abcdef", min_size=1, max_size=8)


# --- wiki tokenizer --------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(
    st.text(
        alphabet="ab [](')=<>/.|:3wxyz\n\t",
        max_size=80,
    )
)
def test_wiki_offsets_are_faithful(text):
    """Every emitted word token's (start, end) slices back to its term
    in the ORIGINAL text (span tokens cover raw substrings too), and
    positions never decrease."""
    toks = wikipedia_tokenize(text)
    prev = -1
    for t in toks:
        assert text[t["start"] : t["end"]] == t["term"]
        assert t["pos"] >= prev
        prev = t["pos"]


@settings(max_examples=100, deadline=None)
@given(st.lists(_words, min_size=0, max_size=10))
def test_wiki_plain_words_roundtrip(words):
    """Markup-free word text tokenizes to exactly those words."""
    text = " ".join(words)
    toks = wikipedia_tokenize(text)
    assert [t["term"] for t in toks] == [w for w in words if w]


# --- BPE -------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    st.dictionaries(_words, st.integers(1, 50), min_size=1, max_size=12),
    st.integers(0, 40),
)
def test_bpe_encode_reconstructs_word(histogram, num_merges):
    """Encoding never loses characters: the concatenated pieces equal
    word + END_OF_WORD for every word, at any merge count."""
    vocab = [(tuple(w) + (END_OF_WORD,), n) for w, n in histogram.items()]
    merges = _merge_loop(vocab, num_merges)
    for w in histogram:
        assert "".join(bpe_encode(w, merges)) == w + END_OF_WORD


@settings(max_examples=40, deadline=None)
@given(st.dictionaries(_words, st.integers(1, 50), min_size=1, max_size=10))
def test_bpe_training_words_fully_merge(histogram):
    """With unbounded merges every training word encodes to ONE piece
    (its own full form learned as a merge chain)."""
    vocab = [(tuple(w) + (END_OF_WORD,), n) for w, n in histogram.items()]
    merges = _merge_loop(vocab, 10_000)
    for w in histogram:
        assert bpe_encode(w, merges) == [w + END_OF_WORD]


# --- ConcatenateGraphFilter ------------------------------------------------


@settings(max_examples=80, deadline=None)
@given(st.lists(st.tuples(_words, st.booleans()), min_size=1, max_size=8))
def test_concat_graph_path_count(stream_spec):
    """A linear chain with optional posInc-0 synonym stacks yields
    exactly ∏(stack sizes) distinct paths (distinct labels ⇒ no
    dedupe)."""
    tokens = []
    expected = 1
    stack = 0
    for i, (w, stacked) in enumerate(stream_spec):
        term = f"{w}{i}"  # distinct labels
        if stacked and tokens:
            tokens.append((term + "s", 0, 1))
            stack += 1
            expected *= 1  # recomputed below
        else:
            tokens.append((term, 1, 1))
    # recompute expected: group by position
    sizes = {}
    pos = -1
    for term, inc, _ in tokens:
        if inc:
            pos += 1
        sizes[pos] = sizes.get(pos, 0) + 1
    expected = 1
    for v in sizes.values():
        expected *= v
    paths = concatenate_graph_paths(tokens, token_separator="/")
    assert len(paths) == expected
    assert paths == sorted(paths)


# --- DelimitedBoost --------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(_words, st.floats(0.1, 9.9)), max_size=8))
def test_delimited_boost_roundtrip(pairs):
    text = " ".join(f"{w}|{b:.2f}" for w, b in pairs)
    got = delimited_boost_terms(text)
    assert [t for t, _ in got] == [w for w, _ in pairs]
    for (_, gb), (_, b) in zip(got, pairs):
        assert abs(gb - round(b, 2)) < 1e-9


# --- Solr synonym parser ---------------------------------------------------


@settings(max_examples=80, deadline=None)
@given(st.lists(_words, min_size=2, max_size=6, unique=True))
def test_solr_expand_is_symmetric(group):
    rules = parse_solr_synonyms(", ".join(group))
    pairs = {(a, b) for a, b, _ in rules}
    # all-pairs both directions, no self-pairs
    assert pairs == {
        (a, b) for a in group for b in group if a != b
    }
    m = synonym_map(rules)
    for a in group:
        assert set(m[a]) == set(group) - {a}
