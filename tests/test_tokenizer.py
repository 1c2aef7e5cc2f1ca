from kg.tokenizer import UNK, Vocab, basic_tokenize, build_vocab, wordpiece


def test_cjk_per_char():
    toks = basic_tokenize("中国致公党")
    assert toks == ["中", "国", "致", "公", "党"]


def test_mixed_latin_cjk_and_punct():
    toks = basic_tokenize("ABC中国,x1")
    assert toks == ["abc", "中", "国", ",", "x1"]


def test_lowercase_and_accent_strip():
    assert basic_tokenize("Café") == ["cafe"]


def test_wordpiece_greedy_longest_match():
    ts = frozenset(["ab", "##cd", "##c", "##d", "a", "b"])
    assert wordpiece("abcd", ts) == ["ab", "##cd"]
    assert wordpiece("abc", ts) == ["ab", "##c"]
    assert wordpiece("zq", ts) == [UNK]


def test_wordpiece_too_long_is_unk():
    ts = frozenset(["a", "##a"])
    assert wordpiece("a" * 101, ts) == [UNK]


def test_vocab_roundtrip_and_determinism(tmp_path):
    v1 = build_vocab(["中国 abc", "党政"])
    v2 = build_vocab(["党政", "中国 abc"])
    assert v1.tokens == v2.tokens  # order-independent
    p = str(tmp_path / "vocab.txt")
    v1.save(p)
    assert Vocab.load(p).tokens == v1.tokens


def test_tokenize_chinese_sentence(vocab):
    toks = vocab.tokenize("中共中央")
    assert toks == ["中", "共", "中", "央"]
    ids = vocab.convert_tokens_to_ids(toks)
    assert all(isinstance(i, int) and i >= 0 for i in ids)


# ---------------------------------------------------------------------------
# Real-vocab fixture (VERDICT r1 item: pin greedy longest-match beyond pure
# CJK).  tests/fixtures/mini_vocab.txt is a bert-base-chinese-STYLE vocab
# subset (specials, latin head words, ##-continuations, CJK chars) in the
# reference's one-token-per-line format (reference tokenization.py:5-10).
# ---------------------------------------------------------------------------

import os

import pytest as _pytest

from kg.tokenizer import UNK, Vocab

_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "mini_vocab.txt")


@_pytest.fixture(scope="module")
def mini_vocab():
    return Vocab.load(_FIXTURE)


@_pytest.mark.parametrize(
    ("text", "want"),
    [
        ("playing", ["play", "##ing"]),          # head + continuation
        ("played", ["played"]),                  # longest match beats play+##ed
        ("plays", ["plays"]),                    # ditto vs play+##s
        ("playable", ["play", "##able"]),
        ("unable", ["un", "##able"]),            # backtracking prefix scan
        ("playingly", ["play", "##ing", "##ly"]),  # multi-continuation chain
        ("CAFE", ["cafe"]),                      # do_lower_case
        ("cafés", ["cafe", "##s"]),         # NFD accent strip + ##piece
        ("xyz", [UNK]),                          # no match at position 0
        ("playing!", ["play", "##ing", "!"]),    # punctuation split
        ("中国人", ["中", "国", "人"]),            # CJK per character
        ("中xyz国", ["中", UNK, "国"]),            # failed wordpiece -> one UNK
        ("a" * 101, [UNK]),                      # max_input_chars guard
        ("to the cafe", ["to", "the", "cafe"]),  # whitespace basic split
    ],
)
def test_mini_vocab_greedy_longest_match(mini_vocab, text, want):
    assert mini_vocab.tokenize(text) == want


def test_mini_vocab_id_roundtrip(mini_vocab):
    # id = line number (reference tokenization.py:5-10 format)
    assert mini_vocab.convert_tokens_to_ids("play") == 22
    toks = mini_vocab.tokenize("playing")
    ids = mini_vocab.convert_tokens_to_ids(toks)
    assert [mini_vocab.tokens[i] for i in ids] == toks
    # unknown token maps to [UNK]'s id
    assert mini_vocab.convert_tokens_to_ids("notinvocab") == 1
