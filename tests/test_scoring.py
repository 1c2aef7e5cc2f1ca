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


# -- A2: masked-mean BCE (reference ner/trainer.py:18-45) --------------------


def test_bce_with_logits_matches_naive_formula():
    import numpy as np

    from kg.scoring import bce_with_logits, sigmoid

    rs = np.random.RandomState(3)
    x = rs.standard_normal(500) * 4
    t = (rs.random_sample(500) < 0.3).astype(float)
    naive = -(t * np.log(sigmoid(x)) + (1 - t) * np.log(1 - sigmoid(x)))
    assert np.allclose(bce_with_logits(x, t), naive, atol=1e-10)
    # x=0 -> ln 2 regardless of target
    assert abs(bce_with_logits(np.zeros(1), np.ones(1))[0] - np.log(2)) < 1e-12


def test_mrc_total_loss_masking_semantics():
    import numpy as np

    from kg.scoring import mrc_total_loss

    B, L = 2, 4
    rs = np.random.RandomState(5)
    att = np.ones((B, L), dtype=int)
    tok = np.array([[0, 1, 1, 1], [0, 0, 1, 1]])  # query positions masked out
    sl = rs.standard_normal((B, L))
    el = rs.standard_normal((B, L))
    sp = rs.standard_normal((B, L, L))
    zeros_pos = np.zeros((B, L))
    zeros_span = np.zeros((B, L, L))
    out = mrc_total_loss(sl, el, sp, zeros_pos, zeros_pos, zeros_span, att, tok)
    assert out["loss"] == out["start_loss"] + out["end_loss"] + out["span_loss"]
    # changing a logit at a masked position must not change the loss
    sl2 = sl.copy()
    sl2[0, 0] += 100.0
    out2 = mrc_total_loss(sl2, el, sp, zeros_pos, zeros_pos, zeros_span, att, tok)
    assert out2["start_loss"] == out["start_loss"]
    # span mask is the triu of the positional outer product: lower-triangle
    # span logits are inert too
    sp2 = sp.copy()
    sp2[0, 3, 1] += 100.0  # i > j
    out3 = mrc_total_loss(sl, el, sp2, zeros_pos, zeros_pos, zeros_span, att, tok)
    assert out3["span_loss"] == out["span_loss"]
    # ...but an in-mask change does
    sp3 = sp.copy()
    sp3[0, 1, 3] += 100.0
    out4 = mrc_total_loss(sl, el, sp3, zeros_pos, zeros_pos, zeros_span, att, tok)
    assert out4["span_loss"] != out["span_loss"]


def test_masked_loss_spark_matches_numpy_twin(spark):
    import numpy as np

    from kg import relational as R
    from kg.scoring import masked_mean_loss

    sf = "/root/testdata/sf0.001"
    row = R.masked_loss(spark, sf).collect()[0]
    ev = spark.read.parquet(f"{sf}/events.parquet").select("value", "event_type").collect()
    x = np.array([(r.value - 50.0) / 10.0 for r in ev])
    t = np.array([1.0 if r.event_type == "click" else 0.0 for r in ev])
    m = np.array([1.0 if r.value > 10.0 else 0.0 for r in ev])
    want = masked_mean_loss(x, t, m)
    assert abs(row.masked_bce - round(want, 6)) <= 1e-6
    assert row.n_masked == int(m.sum())
