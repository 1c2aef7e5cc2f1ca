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
