"""FLOP-counter consistency (utils/flops.py; ADVICE r3: joint mode must
count ONE decoder over the concatenated width — matching
gen_fused._eff_dims — and vanilla cells must not be billed the 4U LSTM
gate width)."""

from multinn_tpu.models.multinn import MultINNConfig
from multinn_tpu.utils import flops


def _cfg(**kw):
    base = dict(n_tracks=4, n_pitches=32, mode="per-track",
                decoder_type="rnn-rbm", n_hidden=24, n_rnn=16)
    base.update(kw)
    return MultINNConfig(**base)


def test_joint_counts_one_wide_decoder():
    per = _cfg(mode="per-track")
    joint = _cfg(mode="joint")
    k, d, h, u, ctx = flops._dims(joint)
    assert (k, d, ctx) == (1, 4 * 32, 0)
    # ONE decoder of H hiddens over the K*D-wide roll is cheaper than K
    # decoders of H hiddens each (the energy/bias terms scale with D*H and
    # the joint model has 1/K the total hidden units) — the old bug counted
    # joint as K independent width-D decoders, i.e. exactly per-track
    assert flops.train_step_flops(joint, 2, 3) < \
        flops.train_step_flops(per, 2, 3)
    assert flops.train_step_flops(joint, 2, 3) != \
        4 * flops.train_step_flops(_cfg(n_tracks=1, mode="per-track"), 2, 3)


def test_vanilla_cell_cheaper_than_lstm():
    lstm = _cfg(cell="lstm")
    van = _cfg(cell="vanilla")
    assert flops._gate_mult(van) == 1
    for fn in (flops.train_step_flops,):
        assert fn(van, 2, 3) < fn(lstm, 2, 3)
    for fn in (flops.gen_step_flops_rbm, flops.gen_step_flops_nade):
        rv, rl = fn(van, 1), fn(lstm, 1)
        assert rv["model"] < rl["model"]
        assert rv["executed"] < rl["executed"]


def test_dbn_encoder_uses_feature_dim():
    enc = _cfg(encoder_hidden=(16,))
    k, d, h, u, ctx = flops._dims(enc)
    assert d == 16
    assert flops.train_step_flops(enc, 2, 3) < \
        flops.train_step_flops(_cfg(), 2, 3)


def test_stacked_layers_counted_in_generation():
    deep = _cfg(rnn_layers=2)
    assert flops.gen_step_flops_rbm(deep, 1)["model"] > \
        flops.gen_step_flops_rbm(_cfg(), 1)["model"]
    assert flops.gen_step_flops_nade(deep, 1)["model"] > \
        flops.gen_step_flops_nade(_cfg(), 1)["model"]
