"""Deterministic BERT-style tokenizer (pure Python/NumPy, no transformers).

Reproduces the *observable* behavior of ``BertTokenizer('bert-base-chinese')``
as used by the reference (tokenize at ner/dataset.py:45, id lookup at
ner/dataset.py:30,56,58; tokenizer constructed at main.py:13):

- BasicTokenizer with ``do_lower_case=True``: NFD-normalize + strip combining
  marks + lowercase; place spaces around every CJK codepoint (so CJK text
  tokenizes per character); split punctuation into standalone tokens.
- Greedy longest-match WordPiece with ``##`` continuation pieces and
  ``[UNK]`` fallback (>100-char words, or no match).

transformers is unavailable in this environment (SURVEY.md §7.0), so the
vocabulary is built deterministically from the corpus character set: every
character gets both a head piece and a ``##`` continuation piece.  For
pure-CJK text this is exactly per-character tokenization — the behavior that
matters for the reference corpus.  This module is the *definition* of
tokenization for both the single-node oracle (kg/oracle.py) and the Spark
pipeline (kg/mention.py); both import it, so parity is by construction at the
function level and tested end-to-end.

Vocab file format mirrors the reference's loader (tokenization.py:5-10):
one token per line, id = line number.
"""

from __future__ import annotations

import unicodedata
from collections.abc import Iterable

PAD, UNK, CLS, SEP = "[PAD]", "[UNK]", "[CLS]", "[SEP]"
SPECIALS = [PAD, UNK, CLS, SEP]


def _is_cjk(cp: int) -> bool:
    """CJK Unified Ideograph ranges (same set BERT's BasicTokenizer uses)."""
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F
        or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF
        or 0x2F800 <= cp <= 0x2FA1F
    )


def _is_punct(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _clean_lower(text: str) -> str:
    """Lowercase + NFD + strip combining marks (BERT do_lower_case path)."""
    text = unicodedata.normalize("NFD", text.lower())
    return "".join(ch for ch in text if unicodedata.category(ch) != "Mn")


def basic_tokenize(text: str) -> list[str]:
    """Whitespace / CJK / punctuation splitting after lowercasing."""
    text = _clean_lower(text)
    out: list[str] = []
    buf: list[str] = []

    def flush() -> None:
        if buf:
            out.append("".join(buf))
            buf.clear()

    for ch in text:
        if ch.isspace():
            flush()
        elif _is_cjk(ord(ch)) or _is_punct(ch):
            flush()
            out.append(ch)
        else:
            buf.append(ch)
    flush()
    return out


def wordpiece(token: str, token_set: frozenset[str], max_input_chars: int = 100) -> list[str]:
    """Greedy longest-match WordPiece; [UNK] on failure (HF semantics)."""
    if len(token) > max_input_chars:
        return [UNK]
    pieces: list[str] = []
    start = 0
    n = len(token)
    while start < n:
        end = n
        cur = None
        while start < end:
            sub = token[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in token_set:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [UNK]
        pieces.append(cur)
        start = end
    return pieces


class Vocab:
    """token<->id table; format mirrors reference tokenization.py:5-10."""

    def __init__(self, tokens: list[str]):
        self.tokens = list(tokens)
        self.token2id = {t: i for i, t in enumerate(self.tokens)}
        self.token_set = frozenset(self.tokens)

    def __len__(self) -> int:
        return len(self.tokens)

    def convert_tokens_to_ids(self, tokens: list[str] | str) -> list[int] | int:
        # mirrors BertTokenizer.convert_tokens_to_ids (used ner/dataset.py:30,56,58)
        unk = self.token2id[UNK]
        if isinstance(tokens, str):
            return self.token2id.get(tokens, unk)
        return [self.token2id.get(t, unk) for t in tokens]

    def tokenize(self, text: str) -> list[str]:
        out: list[str] = []
        for tok in basic_tokenize(text):
            out.extend(wordpiece(tok, self.token_set))
        return out

    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            for t in self.tokens:
                f.write(t + "\n")

    @classmethod
    def load(cls, path: str) -> "Vocab":
        with open(path, encoding="utf-8") as f:
            return cls([line.rstrip("\n") for line in f if line.rstrip("\n")])


def build_vocab(texts: Iterable[str]) -> Vocab:
    """Deterministic vocab: specials + sorted corpus chars (+ ## pieces)."""
    chars: set[str] = set()
    for text in texts:
        for tok in basic_tokenize(text):
            chars.update(tok)
    ordered = sorted(chars)
    tokens = list(SPECIALS) + ordered + ["##" + c for c in ordered]
    return Vocab(tokens)
