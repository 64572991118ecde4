"""Dispatch-gate tests for the whole-generation kernels — pure Python
shape/byte accounting, millisecond-fast, deliberately OUTSIDE the slow-
marked interpret-mode module so the fast tier keeps regression coverage of
the fused-vs-scan dispatch rules, the VMEM gates, and the bf16
weight-storage capacity rule."""

import jax.numpy as jnp

from multinn_tpu.models.multinn import MultINNConfig
from multinn_tpu.ops import gen_fused

K, D, H, U = 3, 16, 12, 10


def cfg_for(mode="feedback", **kw):
    base = dict(n_tracks=K, n_pitches=D, mode=mode, decoder_type="rnn-rbm",
                n_hidden=H, n_rnn=U, cd_k=1, gen_k=3, w_std=0.2)
    base.update(kw)
    return MultINNConfig(**base)


def nade_cfg(mode="feedback", **kw):
    base = dict(n_tracks=K, n_pitches=D, mode=mode, decoder_type="rnn-nade",
                n_hidden=H, n_rnn=U, w_std=0.2)
    base.update(kw)
    return MultINNConfig(**base)


def test_supported_gating():
    assert gen_fused.supported(cfg_for(), 1)
    assert gen_fused.supported(cfg_for(), 8)          # batched serving shape
    assert not gen_fused.supported(cfg_for(decoder_type="rnn-nade"), 1)
    assert gen_fused.supported(cfg_for(encoder_hidden=(8,)), 1)  # DBN latent space
    assert gen_fused.supported(cfg_for(rnn_layers=2), 1)  # stacked cells
    assert gen_fused.supported(cfg_for(mode="joint"), 1)  # 1 track of K*D
    assert gen_fused.supported(cfg_for(cell="vanilla"), 1)  # tanh cells in-kernel
    # the VMEM gate measures the real arg builders: weights that cannot fit
    # (block-diag (K*D, K*H) alone ~75 MB) must be rejected even at batch 1
    assert not gen_fused.supported(cfg_for(n_pitches=512, n_hidden=2048), 1)
    # and a batch large enough to blow the state rows must be rejected
    assert not gen_fused.supported(cfg_for(), 200_000)


def test_nade_supported_gating():
    assert gen_fused.supported_nade(nade_cfg(), 1)
    assert gen_fused.supported_nade(nade_cfg(), 8)      # batched serving
    assert not gen_fused.supported_nade(nade_cfg(), 2)  # not tile-aligned
    assert not gen_fused.supported_nade(cfg_for(), 1)   # rnn-rbm
    assert gen_fused.supported_nade(nade_cfg(rnn_layers=2), 1)  # stacked
    assert not gen_fused.supported_nade(nade_cfg(), 80_000)  # VMEM


def test_rbm_weight_dtype_capacity_mode():
    """The RBM gate's weight-storage rule: f32 while it fits, bf16 capacity
    mode past the f32 VMEM budget (large serving batches / stacked
    flagship cells), None only when even bf16 cannot fit."""
    flagship = MultINNConfig(n_tracks=5, n_pitches=84, mode="feedback",
                             decoder_type="rnn-rbm", n_hidden=150,
                             n_rnn=100, cd_k=1, gen_k=10)
    assert gen_fused.rbm_weight_dtype(flagship, 8) == jnp.float32
    big = gen_fused.rbm_weight_dtype(flagship, 32)
    assert big == jnp.bfloat16          # f32 no longer fits; capacity mode
    assert gen_fused.supported(flagship, 32)
    two_layer = MultINNConfig(n_tracks=5, n_pitches=84, mode="feedback",
                              decoder_type="rnn-rbm", n_hidden=150,
                              n_rnn=100, rnn_layers=2)
    assert gen_fused.rbm_weight_dtype(two_layer, 1) == jnp.bfloat16
    assert gen_fused.rbm_weight_dtype(flagship, 200_000) is None



def test_nade_spec_env_knob_resolves_per_call(monkeypatch):
    """Regression (round-3 review): MULTINN_NADE_SPEC must be honored on
    EVERY call — the resolver runs outside the jitted function (a
    trace-time read with spec=None as the static key would pin the first
    choice for the process lifetime)."""
    monkeypatch.delenv("MULTINN_NADE_SPEC", raising=False)
    assert gen_fused._resolve_spec(16) == 4
    assert gen_fused._resolve_spec(6) == 2
    assert gen_fused._resolve_spec(7) == 1
    monkeypatch.setenv("MULTINN_NADE_SPEC", "1")
    assert gen_fused._resolve_spec(16) == 1
    monkeypatch.setenv("MULTINN_NADE_SPEC", "2")
    assert gen_fused._resolve_spec(16) == 2
    monkeypatch.setenv("MULTINN_NADE_SPEC", "4")
    assert gen_fused._resolve_spec(6) == 2      # 4 does not divide 6
