"""Property-based tests (hypothesis) — invariants from the reference code
(SURVEY.md §5 item 3)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from kg.config import MAX_LEN, TAG_QUERIES
from kg.oracle import build_example, build_tag2query, decode_example, encode_sentence, parse_segments
from kg.tokenizer import build_vocab

CJK = "中国致公党共央代表大会北京上海人民解放军政治部服务词的贺同志们在之际委员热烈祝"
WORDS = [c1 + c2 for c1 in CJK[:8] for c2 in CJK[:8]] + list(CJK)
TAGS = ["o", "ns", "nt", "nr", "x"]

VOCAB = build_vocab([" ".join(WORDS)] + list(TAG_QUERIES.values()))
T2Q = build_tag2query(VOCAB)

segment = st.tuples(st.sampled_from(WORDS), st.sampled_from(TAGS))
sentence = st.lists(segment, min_size=0, max_size=40).map(
    lambda segs: " ".join(f"{w}/{t}" for w, t in segs)
)


@given(sentence)
@settings(max_examples=60, deadline=None)
def test_label_and_length_invariants(line):
    enc = encode_sentence(line, VOCAB)
    # first/last sub-token rule (ner/dataset.py:49-50)
    assert len(enc.start_tags) == len(enc.end_tags) == len(enc.context_tokens)
    for tag, query in T2Q.items():
        ex = build_example(enc, tag, query, VOCAB)
        n = len(ex["token_ids"])
        assert len(ex["start_labels"]) == n == len(ex["end_labels"])
        assert n <= MAX_LEN
        preds = decode_example(ex)
        # decode output within the upper triangle of context positions
        qlen = ex["query_len"]
        for s, e in preds:
            assert qlen <= s <= e < n - 1
        # decode == surviving gold (gold-projection scorer)
        assert preds == sorted(ex["span_pairs"])


@given(sentence)
@settings(max_examples=30, deadline=None)
def test_parse_segments_roundtrip(line):
    segs = parse_segments(line)
    assert all("/" not in w or True for w, _ in segs)
    rebuilt = " ".join(f"{w}/{t}" for w, t in segs)
    assert rebuilt == line.strip() or line.strip() == ""


@given(st.lists(st.sampled_from(WORDS), min_size=1, max_size=5))
@settings(max_examples=30, deadline=None)
def test_gold_spans_match_labels(words):
    line = " ".join(f"{w}/ns" for w in words)
    enc = encode_sentence(line, VOCAB)
    assert len(enc.offsets["ns"]) == len(words)
    ex = build_example(enc, "ns", T2Q["ns"], VOCAB)
    for s, e in ex["span_pairs"]:
        assert ex["start_labels"][s] == 1 and ex["end_labels"][e] == 1
