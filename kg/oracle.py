"""Single-node reference oracle.

A faithful, plain-Python re-statement of the reference pipeline's semantics,
used to generate golden outputs that the distributed Spark pipeline must
reproduce (P/R >= 0.95 gate, BASELINE.md).  It is deliberately written as
simple per-sentence loops — the *opposite* architecture of the Spark path
(kg/mention.py's vectorized Arrow kernel) — so the parity tests compare two
independent implementations of one semantics.

Semantics transcribed (cited per SURVEY.md):
- corpus line parse:          ner/dataset.py:36-44
- wordpiece + label build:    ner/dataset.py:45-53  (first/last sub-token rule
                              ner/dataset.py:49-50)
- per-tag example expansion:  ner/dataset.py:55
- truncation:                 ner/dataset.py:57-58,65-66 (gold spans past the
                              clip silently dropped, ner/dataset.py:74-75)
- decode predicate:           metrics.py:18-37 — span (i,j) predicted iff
                              start_logit[i]>0 ∧ end_logit[j]>0 ∧
                              span_logit[i,j]>0, masked to context positions
                              (attention ∧ token_type, ner/trainer.py:33) and
                              i<=j (torch.triu, metrics.py:36)
- micro tp/fp/fn + P/R/F1:    metrics.py:39-42, ner/trainer.py:49-51

Scorer: torch/transformers are unavailable (SURVEY.md §7.0), so "the
reference model" is stood in for by the deterministic gold-projection scorer
(SURVEY.md §7.3): logit = +1.0 where the reference's label-construction
yields label 1, else -1.0.  The decode path is still exercised in full; the
P/R gate measures pipeline fidelity.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass

from kg.config import KEYPHRASE_TOP_K, MAX_LEN, REL_WINDOW, TAG_QUERIES
from kg.tokenizer import CLS, SEP, Vocab


def build_tag2query(vocab: Vocab) -> dict[str, list[int]]:
    """tag -> [CLS] query [SEP] token ids (ner/dataset.py:23-32)."""
    out = {}
    for tag in sorted(TAG_QUERIES):
        tokens = [CLS] + vocab.tokenize(TAG_QUERIES[tag]) + [SEP]
        out[tag] = vocab.convert_tokens_to_ids(tokens)
    return out


def parse_segments(line: str) -> list[tuple[str, str]]:
    """line -> [(word, tag)] (ner/dataset.py:38,44).

    The reference uses ``segment.split('/')`` which assumes exactly one '/'
    per segment (holds on all 14,967 corpus segments); we use rsplit-once,
    identical on that corpus and safe on word-internal '/'.
    """
    out = []
    for segment in line.strip().split():
        word, _, tag = segment.rpartition("/")
        out.append((word, tag))
    return out


@dataclass
class SentenceEncoding:
    """Tokenized sentence with per-tag gold offsets (context-token space)."""

    context_tokens: list[str]
    start_tags: list[str]
    end_tags: list[str]
    offsets: dict[str, list[tuple[int, int]]]  # tag -> [(start, end)] inclusive


def encode_sentence(line: str, vocab: Vocab) -> SentenceEncoding:
    """ner/dataset.py:38-53 semantics."""
    context_tokens: list[str] = []
    offsets: dict[str, list[tuple[int, int]]] = defaultdict(list)
    start_tags: list[str] = []
    end_tags: list[str] = []
    for word, tag in parse_segments(line):
        sub_tokens = vocab.tokenize(word)
        context_tokens.extend(sub_tokens)
        if tag in TAG_QUERIES and sub_tokens:
            offsets[tag].append((len(start_tags), len(start_tags) + len(sub_tokens) - 1))
            start_tags.extend([tag] + ["o"] * (len(sub_tokens) - 1))
            end_tags.extend(["o"] * (len(sub_tokens) - 1) + [tag])
        else:
            start_tags.extend(["o"] * len(sub_tokens))
            end_tags.extend(["o"] * len(sub_tokens))
    return SentenceEncoding(context_tokens, start_tags, end_tags, dict(offsets))


def build_example(
    enc: SentenceEncoding, tag: str, query: list[int], vocab: Vocab, max_len: int = MAX_LEN
) -> dict:
    """One MRC example per (sentence, tag) — ner/dataset.py:55-90."""
    context_token_ids = vocab.convert_tokens_to_ids(enc.context_tokens)
    context_token_ids = context_token_ids[: max_len - len(query) - 1]
    context_token_ids.append(vocab.convert_tokens_to_ids(SEP))
    token_ids = query + context_token_ids
    token_type_ids = [0] * len(query) + [1] * len(context_token_ids)
    attention_masks = [1] * len(token_ids)

    start_labels = [0] * len(query) + [1 if t == tag else 0 for t in enc.start_tags]
    end_labels = [0] * len(query) + [1 if t == tag else 0 for t in enc.end_tags]
    start_labels = start_labels[: max_len - 1] + [0]
    end_labels = end_labels[: max_len - 1] + [0]

    assert len(start_labels) == len(end_labels) == len(token_ids) == len(attention_masks) == len(token_type_ids)

    span_pairs: list[tuple[int, int]] = []
    for start, end in enc.offsets.get(tag, []):
        start += len(query)
        end += len(query)
        if start >= len(start_labels) - 1 or end >= len(start_labels) - 1:
            continue  # gold span past truncation silently dropped (ner/dataset.py:74-75)
        assert start_labels[start] == 1
        assert end_labels[end] == 1
        span_pairs.append((start, end))

    return {
        "token_ids": token_ids,
        "token_type_ids": token_type_ids,
        "attention_masks": attention_masks,
        "start_labels": start_labels,
        "end_labels": end_labels,
        "span_pairs": span_pairs,
        "query_len": len(query),
    }


def decode_example(example: dict) -> list[tuple[int, int]]:
    """Gold-projection scoring + the exact decode predicate (metrics.py:18-37).

    Returns predicted spans as inclusive (start, end) in full-sequence token
    space, sorted.  Logits are +1 where label==1 else -1 (SURVEY.md §7.3), so
    `logit > 0` is exercised literally.
    """
    start_logits = [1.0 if y == 1 else -1.0 for y in example["start_labels"]]
    end_logits = [1.0 if y == 1 else -1.0 for y in example["end_labels"]]
    span_pair_set = set(example["span_pairs"])

    # context-only masks: attention ∧ token_type (ner/trainer.py:33)
    masks = [a & t for a, t in zip(example["attention_masks"], example["token_type_ids"])]

    preds = []
    n = len(start_logits)
    for i in range(n):
        if not (start_logits[i] > 0 and masks[i]):
            continue
        for j in range(i, n):  # triu: start <= end (metrics.py:36)
            if not (end_logits[j] > 0 and masks[j]):
                continue
            span_logit = 1.0 if (i, j) in span_pair_set else -1.0
            if span_logit > 0:
                preds.append((i, j))
    return sorted(preds)


def surface(tokens: list[str]) -> str:
    """Join wordpiece tokens back to surface text ('##' stripped)."""
    return "".join(t[2:] if t.startswith("##") else t for t in tokens)


def sentence_mentions(line: str, vocab: Vocab, tag2query: dict[str, list[int]]) -> list[dict]:
    """All decoded mentions of one tagged sentence, context-token space."""
    enc = encode_sentence(line, vocab)
    mentions = []
    for tag in sorted(tag2query):
        example = build_example(enc, tag, tag2query[tag], vocab)
        qlen = example["query_len"]
        for s, e in decode_example(example):
            cs, ce = s - qlen, e - qlen
            mentions.append(
                {
                    "tag": tag,
                    "start": cs,
                    "end": ce,
                    "mention": surface(enc.context_tokens[cs : ce + 1]),
                }
            )
    mentions.sort(key=lambda m: (m["start"], m["end"], m["tag"]))
    return mentions


def sentence_triples(mentions: list[dict]) -> list[tuple[str, str, str]]:
    """Deterministic RE rule (kg/config.py REL_WINDOW; SURVEY.md §7.1 step 6)."""
    triples = []
    for i, a in enumerate(mentions):
        for b in mentions[i + 1 :]:
            if b["start"] <= a["end"]:
                continue  # overlap / nesting: no relation
            if b["start"] - a["end"] > REL_WINDOW:
                continue
            triples.append((a["mention"], f"rel_{a['tag']}_{b['tag']}", b["mention"]))
    return triples


def doc_extract(doc: dict, vocab: Vocab, tag2query: dict[str, list[int]]) -> tuple[list, list]:
    """(mentions, triples) for one interleaved doc (FIXTURES.md §1 shape).

    Media spans (kind != 'text') are untouched — they contribute nothing and
    are carried through by the pipeline's span-sequence invariant.
    """
    out_mentions, out_triples = [], []
    for span in doc["spans"]:
        if span["kind"] != "text" or not span["text"].strip():
            continue
        ms = sentence_mentions(span["text"], vocab, tag2query)
        for m in ms:
            out_mentions.append(
                {
                    "doc_id": doc["doc_id"],
                    "sent_offset": span["offset"],
                    "tag": m["tag"],
                    "start": m["start"],
                    "end": m["end"],
                    "mention": m["mention"],
                }
            )
        for subj, pred, obj in sentence_triples(ms):
            out_triples.append(
                {"subj": subj, "pred": pred, "obj": obj, "doc_id": doc["doc_id"], "sent_offset": span["offset"]}
            )
    return out_mentions, out_triples


def corpus_extract(docs: list[dict], vocab: Vocab) -> tuple[list, list]:
    tag2query = build_tag2query(vocab)
    mentions, triples = [], []
    for doc in docs:
        m, t = doc_extract(doc, vocab, tag2query)
        mentions.extend(m)
        triples.extend(t)
    return mentions, triples


def doc_keyphrases(doc: dict, top_k: int = KEYPHRASE_TOP_K) -> list[dict]:
    """Deterministic keyphrase stage (north_star): per-doc top-k 'o'-tagged
    words (len >= 2) by term frequency, ties broken lexicographically."""
    tf: dict[str, int] = defaultdict(int)
    for span in doc["spans"]:
        if span["kind"] != "text" or not span["text"].strip():
            continue
        for word, tag in parse_segments(span["text"]):
            if tag not in TAG_QUERIES and len(word) >= 2:
                tf[word] += 1
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    return [
        {"doc_id": doc["doc_id"], "phrase": w, "freq": c, "rank": r + 1}
        for r, (w, c) in enumerate(ranked)
    ]


def micro_prf(tp: int, fp: int, fn: int) -> tuple[float, float, float]:
    """Exact epsilon math from ner/trainer.py:49-51."""
    recall = tp / (tp + fn + 1e-10)
    precision = tp / (tp + fp + 1e-10)
    f1 = 2 * recall * precision / (recall + precision + 1e-10)
    return precision, recall, f1
