import numpy as np
import pytest

from kg.scoring import (
    ACTIVATIONS,
    MRCSpanScorer,
    MultiNonLinearLayer,
    NonLinear,
    SurrogateEncoder,
    get_activation,
    sequence_mask,
    sigmoid,
    softmax,
)


def test_activation_registry_mirrors_reference_keys():
    # factory.py:4-16 — including the 'sigmod' typo key (factory.py:7)
    for key in ("relu", "sigmod", "softmax", "gelu", "tanh"):
        assert callable(get_activation(key))
    with pytest.raises(KeyError):
        get_activation("nope")


def test_sigmoid_softmax_numerics():
    x = np.array([-700.0, 0.0, 700.0])
    s = softmax(x)
    assert np.isfinite(s).all() and abs(s.sum() - 1) < 1e-12
    assert sigmoid(np.array([0.0]))[0] == 0.5


def test_sequence_mask_matches_reference_semantics():
    # torch_utils.py:4-10: arange(max_len) < len per row
    m = sequence_mask(np.array([0, 2, 5]), 4)
    assert m.tolist() == [
        [False, False, False, False],
        [True, True, False, False],
        [True, True, True, True],
    ]


def test_mlp_shapes_and_validation():
    x = np.random.RandomState(0).standard_normal((7, 16))
    mlp = MultiNonLinearLayer(16, 3, n_layers=3, hidden=8)
    assert mlp(x).shape == (7, 3)
    with pytest.raises(ValueError):
        MultiNonLinearLayer(16, 3, n_layers=0)
    lin = NonLinear(16, 4)
    assert lin(x).shape == (7, 4)


def test_scorer_determinism_and_pruning_semantics():
    enc = SurrogateEncoder(vocab_size=100, dim=32)
    scorer = MRCSpanScorer(dim=32)
    ids = np.arange(20)
    mask = np.ones(20, dtype=bool)
    mask[:5] = False  # query positions masked out
    h = enc(ids)
    s1, e1, spans1 = scorer.score(h, mask)
    s2, e2, spans2 = scorer.score(enc(ids), mask)
    assert np.allclose(s1, s2) and spans1 == spans2  # deterministic
    for i, j, sc in spans1:
        assert 5 <= i <= j < 20  # only masked-in, upper-triangular pairs
        assert s1[i] > 0 and e1[j] > 0 and sc > 0  # decode conjunction


def test_scorer_no_candidates_no_span_eval():
    scorer = MRCSpanScorer(dim=8)
    h = np.full((6, 8), -10.0)  # heads push all logits negative
    _, _, spans = scorer.score(h, np.ones(6, dtype=bool))
    assert spans == []
