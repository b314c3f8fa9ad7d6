"""Analyzer parity: our vectorized UAX#29 chain vs the reference DFA.

The oracle (tests/ref_dfa.py) executes the reference's own JFlex tables
(analysis/standard/tokenizerImpl.go) with its two transcription bugs
corrected; golucene_spark implements UAX#29 from the public spec.  These
tests pin the two implementations to each other over hand fixtures and
a seeded random corpus.
"""

import random

import numpy as np
import pytest

from golucene_spark.analysis import StandardAnalyzer, ENGLISH_STOP_WORDS
from golucene_spark.analysis.wordbreak import segment_batch

import ref_dfa

FIXTURES = [
    "The Quick-Brown FOX",
    "foo.bar baz_qux",
    "3.14 x 1,024",
    "a an and are",
    "x" * 256 + " next",  # 256-char token dropped, position bumped
    "日本語 テスト ホッケー",
    "HTTP/2.0 IPv6 C++ C# .NET node.js",
    "foo.bar x:y a'b _lead trail_ x_.y ___ a.b.c don't",
    "if return func for while import class def",
    "",
    "   \t\n  ",
    "...,,;;''::",
    "a",
    "1",
    "_",
    "héllo wörld Straße",  # latin-1 letters
]


def ref_tokens(text):
    return ref_dfa.tokenize(text)


def our_tokens(text):
    toks, rows, pos, lens = segment_batch([text])
    # apply the 255-length rule the way the tokenizer does (positions kept)
    return [(t, int(p)) for t, p in zip(toks, pos.tolist()) if len(t) <= 255]


@pytest.mark.parametrize("text", FIXTURES, ids=range(len(FIXTURES)))
def test_tokenizer_matches_reference_dfa(text):
    assert our_tokens(text) == ref_tokens(text)


def test_random_ascii_corpus_parity():
    rng = random.Random(42)
    alphabet = list("abcdefgXYZ0123456789_.,:;'\"-+ /\t\n()[]{}")
    for _ in range(300):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
        assert our_tokens(s) == ref_tokens(s), repr(s)


def test_random_mixed_unicode_parity():
    rng = random.Random(7)
    pools = ["abc XYZ 012", "日本語", "テスト", "ひらがな", " .,':_ ", "é٣"]
    for _ in range(150):
        s = "".join(rng.choice(rng.choice(pools)) for _ in range(rng.randint(0, 40)))
        assert our_tokens(s) == ref_tokens(s), repr(s)


def test_full_chain_stop_and_positions():
    an = StandardAnalyzer()
    terms, rows, pos = an.analyze_batch(["The Quick-Brown FOX"])
    assert list(zip(terms.tolist(), pos.tolist())) == [("quick", 1), ("brown", 2), ("fox", 3)]
    # all-stop-word doc -> empty stream
    terms, rows, pos = an.analyze_batch(["a an and are"])
    assert len(terms) == 0
    # reference chain equivalence on fixtures
    for text in FIXTURES:
        got = list(zip(*[x.tolist() for x in an.analyze_batch([text])[::2]]))
        assert got == ref_dfa.analyze(text), repr(text)


def test_stop_word_set_is_reference_exact():
    # analysis/core/stop.go:13-19
    assert ENGLISH_STOP_WORDS == frozenset(
        "a an and are as at be but by for if in into is it no not of on or "
        "such that the their then there these they this to was will with".split()
    )
    assert len(ENGLISH_STOP_WORDS) == 33


def test_batch_row_attribution():
    an = StandardAnalyzer()
    terms, rows, pos = an.analyze_batch(["alpha beta", "", None, "the gamma"])
    assert terms.tolist() == ["alpha", "beta", "gamma"]
    assert rows.tolist() == [0, 0, 3]
    assert pos.tolist() == [0, 1, 1]  # "the" leaves a gap


def test_max_token_length_position_gap():
    an = StandardAnalyzer()
    text = "x" * 256 + " next"
    terms, rows, pos = an.analyze_batch([text])
    assert terms.tolist() == ["next"]
    assert pos.tolist() == [1]


def test_folding_analyzer_strips_diacritics():
    import numpy as np

    from golucene_spark.analysis import get_analyzer

    an = get_analyzer("folding")
    terms, rows, pos = an.analyze_batch(["Résumé naïve Café dátá", None, "çà"])
    assert terms.tolist() == ["resume", "naive", "cafe", "data", "ca"]
    assert rows.tolist() == [0, 0, 0, 0, 2]
    # stop words removed after folding
    t2, _, _ = an.analyze_batch(["thé quick"])  # 'thé' folds to stopword 'the'
    assert t2.tolist() == ["quick"]


def test_shingle_analyzer_emits_unigrams_and_bigrams():
    from golucene_spark.analysis import get_analyzer

    an = get_analyzer("shingle")
    terms, rows, pos = an.analyze_batch(["quick brown fox", "", "solo"])
    got = sorted(zip(rows.tolist(), pos.tolist(), terms.tolist()))
    assert got == [
        (0, 0, "quick"), (0, 0, "quick brown"),
        (0, 1, "brown"), (0, 1, "brown fox"),
        (0, 2, "fox"),
        (2, 0, "solo"),
    ]
    # stop words removed BEFORE shingling ('the' vanishes, gap closes)
    t2, r2, p2 = an.analyze_batch(["the quick fox"])
    assert sorted(t2.tolist()) == ["fox", "quick", "quick fox"]
