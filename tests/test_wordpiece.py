"""Vendored WordPiece tokenizer: BERT wordpiece semantics (greedy
longest-match-first, ## continuations, [UNK], max word length), trainer
determinism, and coverage of the fixture corpus the vocab was trained on.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from docling_core_spark.chunk.wordpiece import (
    MAX_CHARS_PER_WORD,
    UNK_TOKEN,
    WordPieceTokenizer,
    basic_tokenize,
    load_default,
    train_wordpiece,
    wordpiece_count_tokens,
)
from docling_core_spark.fixtures import SHAPE_IDS, gen_spans


def test_basic_tokenize_bert_semantics():
    assert basic_tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    assert basic_tokenize("état Café") == ["etat", "cafe"]  # accents strip
    assert basic_tokenize("a-b c.d") == ["a", "-", "b", "c", ".", "d"]
    assert basic_tokenize("  spaced\tout\n") == ["spaced", "out"]


def test_greedy_longest_match():
    tok = WordPieceTokenizer(
        ["[UNK]", "un", "##aff", "##able", "##ab", "##le", "a"]
    )
    # classic BERT example shape: longest prefix wins at each step
    assert tok.wordpiece("unaffable") == ["un", "##aff", "##able"]
    # longest continuation wins: ##able beats ##ab + ##le
    assert tok.wordpiece("unable") == ["un", "##able"]
    assert tok.wordpiece("zzz") == [UNK_TOKEN]


def test_unk_on_overlong_word():
    tok = load_default()
    assert tok.wordpiece("a" * (MAX_CHARS_PER_WORD + 1)) == [UNK_TOKEN]


def test_default_vocab_covers_fixture_corpus():
    """Every word of the training corpus tokenizes without [UNK] (the
    alphabet covers all its characters), and common corpus words are
    single tokens — the compact-common/split-rare shape of a real
    subword vocab."""
    tok = load_default()
    ids = list(SHAPE_IDS) + [f"doc-{i:08d}" for i in range(64)]
    unk = total = 0
    for did in ids:
        for s in gen_spans(did):
            if s.get("text"):
                pieces = tok.tokenize(s["text"])
                total += len(pieces)
                unk += sum(p == UNK_TOKEN for p in pieces)
    assert total > 0 and unk == 0
    assert tok.tokenize("the") == ["the"]  # frequent word -> one token


def test_counts_are_subword_not_word():
    """A rare word costs more than one token; token count is finer than
    the regex word count for rare text."""
    tok = load_default()
    assert len(tok.wordpiece("characteristically")) > 1
    assert wordpiece_count_tokens("the") == 1


def test_trainer_deterministic_and_continuations():
    corpus = ["low lower lowest", "new newer newest", "low new"] * 5
    v1 = train_wordpiece(corpus, vocab_size=40)
    v2 = train_wordpiece(corpus, vocab_size=40)
    assert v1 == v2
    tok = WordPieceTokenizer(v1)
    for w in ("low", "lower", "newest"):
        pieces = tok.wordpiece(w)
        # pieces reassemble to the word; continuations carry ##
        assert "".join(p.lstrip("#") for p in pieces) == w
        assert all(p.startswith("##") for p in pieces[1:])


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=0, max_size=200))
def test_tokenize_total_function(text):
    """Tokenizer is total and consistent with the counter on arbitrary
    unicode input."""
    tok = load_default()
    pieces = tok.tokenize(text)
    assert wordpiece_count_tokens(text) == len(pieces)
    for p in pieces:
        assert p == UNK_TOKEN or p in tok.vocab
