"""Text front-end tests: token-id ABI and normalization semantics."""

from pathlib import Path

import pytest

from viettts_tpu.config import (
    ALL_PHONEMES,
    SIL_INDEX,
    SPECIAL_PHONEMES,
    WORD_END_INDEX,
)
from viettts_tpu.text import load_lexicon, normalize_text, text_to_tokens
from viettts_tpu.text.frontend import build_char_lexicon, word_to_phonemes

REFERENCE_LEXICON = Path("/root/reference/assets/infore/lexicon.txt")


def test_phoneme_abi():
    # The ABI: 4 specials + 89 normal phonemes, fixed order.
    assert len(ALL_PHONEMES) == 93
    assert ALL_PHONEMES[:4] == ("sil", "sp", "spn", " ")
    assert SIL_INDEX == 0
    assert WORD_END_INDEX == 3
    assert ALL_PHONEMES[4] == "a"
    assert ALL_PHONEMES[-1] == "ỹ"
    # ids are unique
    assert len(set(ALL_PHONEMES)) == len(ALL_PHONEMES)


def test_normalize_text():
    assert normalize_text("Hôm nay, trời đẹp.") == "hôm nay sil trời đẹp sil"
    assert normalize_text('a "b" c') == "a b c"
    assert normalize_text("x\ny") == "x sil y"
    assert normalize_text("nhiều   khoảng    trắng") == "nhiều khoảng trắng"


def test_text_to_tokens_layout():
    toks = text_to_tokens("ba mẹ")
    # sil b a <we> m ẹ <we> sil
    b = ALL_PHONEMES.index("b")
    a = ALL_PHONEMES.index("a")
    m = ALL_PHONEMES.index("m")
    e = ALL_PHONEMES.index("ẹ")
    assert toks == [SIL_INDEX, b, a, WORD_END_INDEX, m, e, WORD_END_INDEX, SIL_INDEX]


def test_special_word_maps_directly():
    toks = text_to_tokens("ba sil mẹ")
    assert toks.count(SIL_INDEX) == 3  # leading, inline, trailing
    # inline sil has no word-end marker after it
    i = toks.index(SIL_INDEX, 1)
    assert toks[i + 1] != WORD_END_INDEX


@pytest.mark.skipif(
    not REFERENCE_LEXICON.exists(), reason="reference lexicon not mounted"
)
def test_char_fallback_reproduces_reference_lexicon():
    """The reference lexicon is purely character-level; our OOV fallback
    must produce identical phoneme sequences for every entry."""
    lex = load_lexicon(REFERENCE_LEXICON)
    assert len(lex) > 7000
    mismatches = [
        w
        for w, phones in lex.items()
        if word_to_phonemes(w, None) != phones.split()
    ]
    # The only differences are entries containing letters outside the
    # phoneme vocabulary (f, j, w, z — absent from Vietnamese): those
    # entries crash the reference tokenizer (text2tokens calls
    # phonemes.index on them), while our fallback silently drops the
    # out-of-vocabulary characters.
    from viettts_tpu.config import ALL_PHONEMES

    vocab = set(ALL_PHONEMES)
    for w in mismatches:
        assert any(c not in vocab for c in w), w


def test_build_char_lexicon():
    lex = build_char_lexicon(["ba", "mẹ", "ba"])
    assert lex == {"ba": "b a", "mẹ": "m ẹ"}
