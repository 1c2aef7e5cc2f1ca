"""NumPy scoring stack — the reference's tensor kernels re-expressed for
Arrow-batch execution (SURVEY.md §2.6 F8-F11).

- Activation registry mirrors the reference's factory (reference
  factory.py:4-16) including its ``'sigmod'`` typo key for sigmoid.
- ``NonLinear`` / ``MultiNonLinearLayer`` mirror the MLP stack
  (layers.py:6-48) as pure NumPy affine chains (dropout is inference-off).
- ``sequence_mask`` mirrors torch_utils.py:4-10.
- ``SurrogateEncoder`` + ``MRCSpanScorer`` reproduce the *shape* of
  ``BertMRC`` (ner/models.py:7-28): encode -> per-position start/end heads
  -> pairwise-concat span head over candidate pairs only (the candidate
  pruning rewrite of SURVEY.md §4 — never the dense [L,L] tensor).

Weights are deterministic (seeded); no training happens here — the
gold-projection scorer (kg/oracle.py) remains the parity-gated extraction
path, while this module proves out the numeric kernel surface a real
checkpoint would plug into (swap ``SurrogateEncoder`` for a BERT ONNX/torch
encode inside the same Arrow kernel).
"""

from __future__ import annotations

import numpy as np

# -- activations (factory.py:4-16; note the reference's 'sigmod' typo key) --


def relu(x: np.ndarray) -> np.ndarray:
    return np.maximum(x, 0.0)


def sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    z = x - x.max(axis=axis, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=axis, keepdims=True)


def gelu(x: np.ndarray) -> np.ndarray:
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def tanh(x: np.ndarray) -> np.ndarray:
    return np.tanh(x)


ACTIVATIONS = {
    "relu": relu,
    "sigmod": sigmoid,  # reference typo key, factory.py:7
    "sigmoid": sigmoid,
    "softmax": softmax,
    "gelu": gelu,
    "tanh": tanh,
}


def get_activation(name: str):
    """Registry dispatch (factory.py:13-16 semantics: KeyError on unknown)."""
    if name not in ACTIVATIONS:
        raise KeyError(f"unknown activation: {name}")
    return ACTIVATIONS[name]


def sequence_mask(lengths: np.ndarray, max_len: int) -> np.ndarray:
    """Boolean [B, max_len] mask — torch_utils.py:4-10 semantics."""
    return np.arange(max_len)[None, :] < np.asarray(lengths)[:, None]


# -- MLP stack (layers.py:6-48) ---------------------------------------------


class NonLinear:
    """Affine + optional activation (layers.py:6-27)."""

    def __init__(self, in_dim: int, out_dim: int, activation: str | None = None, seed: int = 0):
        rs = np.random.RandomState(seed)
        bound = 1.0 / np.sqrt(in_dim)
        self.w = rs.uniform(-bound, bound, size=(in_dim, out_dim))
        self.b = rs.uniform(-bound, bound, size=(out_dim,))
        self.act = get_activation(activation) if activation else None

    def __call__(self, x: np.ndarray) -> np.ndarray:
        y = x @ self.w + self.b
        return self.act(y) if self.act else y


class MultiNonLinearLayer:
    """Chain of NonLinear layers (layers.py:30-48): hidden layers activated,
    final projection linear."""

    def __init__(self, in_dim: int, out_dim: int, n_layers: int = 2,
                 hidden: int | None = None, activation: str = "gelu", seed: int = 0):
        if n_layers < 1:
            raise ValueError("n_layers must be >= 1")  # layers.py:38-48 validation
        hidden = hidden or in_dim
        dims = [in_dim] + [hidden] * (n_layers - 1) + [out_dim]
        self.layers = [
            NonLinear(dims[i], dims[i + 1],
                      activation if i < n_layers - 1 else None, seed=seed + i)
            for i in range(n_layers)
        ]

    def __call__(self, x: np.ndarray) -> np.ndarray:
        for layer in self.layers:
            x = layer(x)
        return x


# -- surrogate encoder + MRC heads (ner/models.py:7-28 shape) ----------------


class SurrogateEncoder:
    """Deterministic stand-in for the BERT encode call (ner/models.py:16).

    hash-bucketed token embeddings + position encodings + one mixing layer;
    enough to exercise the full numeric path with realistic shapes.  A real
    deployment swaps this for an ONNX/torch BERT inside the same kernel.
    """

    def __init__(self, vocab_size: int, dim: int = 64, seed: int = 1):
        rs = np.random.RandomState(seed)
        self.emb = rs.standard_normal((vocab_size, dim)) * 0.1
        self.pos = rs.standard_normal((512, dim)) * 0.02
        self.mix = NonLinear(dim, dim, "gelu", seed=seed + 1)

    def __call__(self, token_ids: np.ndarray) -> np.ndarray:
        """[L] int ids -> [L, dim] hidden states."""
        h = self.emb[token_ids % self.emb.shape[0]] + self.pos[: len(token_ids)]
        return self.mix(h)


class MRCSpanScorer:
    """start/end heads + pairwise-concat span head (ner/models.py:11-13,19-28).

    ``score`` evaluates span logits ONLY at candidate (i, j) pairs where the
    start and end predicates already fired — the algebraic rewrite that
    replaces the reference's dense [L, L] expansion (ner/models.py:22-26);
    valid because the decode conjunction (metrics.py:31-33) makes span
    scores of non-candidate pairs unobservable.
    """

    def __init__(self, dim: int = 64, seed: int = 2):
        self.start_head = NonLinear(dim, 1, seed=seed)
        self.end_head = NonLinear(dim, 1, seed=seed + 1)
        self.span_head = MultiNonLinearLayer(dim * 2, 1, n_layers=2, seed=seed + 2)

    def score(self, hidden: np.ndarray, mask: np.ndarray) -> tuple[np.ndarray, np.ndarray, list[tuple[int, int, float]]]:
        start_logits = self.start_head(hidden)[:, 0]
        end_logits = self.end_head(hidden)[:, 0]
        starts = np.flatnonzero((start_logits > 0) & mask)
        ends = np.flatnonzero((end_logits > 0) & mask)
        spans: list[tuple[int, int, float]] = []
        if starts.size and ends.size:
            ii, jj = np.meshgrid(starts, ends, indexing="ij")
            keep = ii <= jj  # triu (metrics.py:36)
            ii, jj = ii[keep], jj[keep]
            if ii.size:
                feats = np.concatenate([hidden[ii], hidden[jj]], axis=1)
                s = self.span_head(feats)[:, 0]
                pos = s > 0
                spans = list(zip(ii[pos].tolist(), jj[pos].tolist(), s[pos].tolist()))
        return start_logits, end_logits, spans


# ---------------------------------------------------------------------------
# Masked-mean BCE loss (SURVEY §2 A2 — reference ner/trainer.py:18-45)
# ---------------------------------------------------------------------------


def bce_with_logits(logits: np.ndarray, targets: np.ndarray) -> np.ndarray:
    """Elementwise binary cross-entropy on raw logits, numerically stable
    (the max(x,0) - x*t + log1p(exp(-|x|)) form torch uses internally;
    reference F.binary_cross_entropy_with_logits, ner/trainer.py:21)."""
    x = np.asarray(logits, dtype=np.float64)
    t = np.asarray(targets, dtype=np.float64)
    return np.maximum(x, 0.0) - x * t + np.log1p(np.exp(-np.abs(x)))


def masked_mean_loss(logits: np.ndarray, targets: np.ndarray, masks: np.ndarray) -> float:
    """(loss * masks).sum() / masks.sum() — ner/trainer.py:19-23 verbatim."""
    m = np.asarray(masks, dtype=np.float64)
    return float((bce_with_logits(logits, targets) * m).sum() / m.sum())


def mrc_total_loss(
    start_logits: np.ndarray,
    end_logits: np.ndarray,
    span_logits: np.ndarray,
    start_labels: np.ndarray,
    end_labels: np.ndarray,
    span_labels: np.ndarray,
    attention_mask: np.ndarray,
    token_type_ids: np.ndarray,
) -> dict:
    """Batch loss exactly as composed at ner/trainer.py:25-45: positional
    masks = attention ∧ token_type; span mask = upper triangle of the
    outer product of the positional mask with itself (triu, diagonal=0);
    total = start + end + span masked means.  Shapes: [B, L] for the
    positional tensors, [B, L, L] for span_logits/span_labels."""
    masks = (np.asarray(attention_mask, dtype=bool) & np.asarray(token_type_ids, dtype=bool)).astype(np.float64)
    span_masks = masks[:, :, None] * masks[:, None, :]
    span_masks = np.triu(span_masks, k=0)
    out = {
        "start_loss": masked_mean_loss(start_logits, start_labels, masks),
        "end_loss": masked_mean_loss(end_logits, end_labels, masks),
        "span_loss": masked_mean_loss(span_logits, span_labels, span_masks),
    }
    out["loss"] = out["start_loss"] + out["end_loss"] + out["span_loss"]
    return out
