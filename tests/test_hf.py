"""Hessian-free optimizer (training/hf.py — the paper's RNN-NADE-HF
training regime, beyond the reference which shipped first-order only).

Pins: (a) the CE objective HF linearizes equals multinn.loss for rnn-nade;
(b) the Gauss-Newton matvec is PSD; (c) a macro-step decreases the loss on
a batch and adapts damping sanely; (d) the Trainer surface trains e2e with
optimizer='hf' incl. checkpoint roundtrip of HFState; (e) error contracts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinn_tpu.models import multinn
from multinn_tpu.training import hf


def _setup(mode="per-track", mask=False, seed=0):
    cfg = multinn.MultINNConfig(n_tracks=3, n_pitches=10, mode=mode,
                                decoder_type="rnn-nade", n_hidden=12,
                                n_rnn=8, w_std=0.2)
    params = multinn.init(jax.random.PRNGKey(seed), cfg)
    x = jax.random.bernoulli(jax.random.PRNGKey(seed + 1), 0.25,
                             (4, 6, 3, 10)).astype(jnp.float32)
    fm = None
    if mask:
        fm = (jnp.arange(6)[None, :] < jnp.array([6, 5, 3, 6])[:, None]
              ).astype(jnp.float32)
    return cfg, params, x, fm


@pytest.mark.parametrize("mode", ["per-track", "feedback"])
@pytest.mark.parametrize("mask", [False, True])
def test_ce_objective_equals_exact_nll(mode, mask):
    """hf's masked-CE reconstruction from conditional_logits must equal the
    production loss — otherwise rho/accept compare different objectives."""
    cfg, params, x, fm = _setup(mode, mask)
    ref, _ = multinn.loss(params, jax.random.PRNGKey(9), x, detailed=False,
                          frame_mask=fm)
    logits, targets = multinn.conditional_logits(params, x)
    w_tb = hf._ce_weights(cfg, x.shape, fm)
    got = hf._ce_loss(logits, targets, w_tb)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


@pytest.mark.slow
def test_gnvp_is_psd():
    cfg, params, x, _ = _setup("feedback")
    state = hf.init_state(params, lam0=0.0)

    def logits_fn(p):
        return multinn.conditional_logits(p, x)[0]

    logits0, vjp_fn = jax.vjp(logits_fn, params)
    p0 = jax.nn.sigmoid(logits0)
    w_tb = hf._ce_weights(cfg, x.shape, None)
    h_diag = p0 * (1 - p0) * w_tb[None, :, :, None]

    def gnvp(v):
        _, jv = jax.jvp(logits_fn, (params,), (v,))
        (gv,) = vjp_fn(h_diag * jv)
        return gv

    for s in range(3):
        v = jax.tree.map(
            lambda a: jax.random.normal(jax.random.PRNGKey(hash((s, a.size))
                                                           % (2**31)),
                                        a.shape), params)
        quad = float(hf._dot(v, gnvp(v)))
        assert quad >= -1e-6, quad
    del state


@pytest.mark.slow
def test_hf_step_decreases_loss_and_adapts_damping():
    cfg, params, x, _ = _setup("feedback")
    state = hf.init_state(params, lam0=1.0)
    key = jax.random.PRNGKey(0)
    step = jax.jit(lambda p, s: hf.hf_step(p, s, x, key, cg_iters=15))
    loss_prev = None
    for i in range(4):
        params, state, m = step(params, state)
        assert np.isfinite(float(m["loss"]))
        if loss_prev is not None:
            assert float(m["loss"]) <= loss_prev + 1e-6
        loss_prev = float(m["loss"])
    # on a deterministic full-batch objective HF should be accepting steps
    assert int(state.accepted) >= 3
    assert 1e-4 <= float(state.lam) <= 1e4


@pytest.mark.slow
def test_hf_beats_same_budget_adam_on_fixed_batch():
    """Second-order credentials on the deterministic objective: 8 HF
    macro-steps beat 8 Adam steps from the same init on the same batch."""
    import optax
    cfg, params, x, _ = _setup("per-track")
    key = jax.random.PRNGKey(0)

    hf_params, state = params, hf.init_state(params, lam0=1.0)
    step = jax.jit(lambda p, s: hf.hf_step(p, s, x, key, cg_iters=20))
    for _ in range(8):
        hf_params, state, m = step(hf_params, state)

    opt = optax.adam(1e-2)
    os_ = opt.init(params)
    ad_params = params

    @jax.jit
    def adam_step(p, s):
        g = jax.grad(lambda q: multinn.loss(q, key, x, detailed=False)[0])(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s

    for _ in range(8):
        ad_params, os_ = adam_step(ad_params, os_)
    l_hf = float(multinn.loss(hf_params, key, x, detailed=False)[0])
    l_ad = float(multinn.loss(ad_params, key, x, detailed=False)[0])
    assert l_hf < l_ad, (l_hf, l_ad)


@pytest.mark.slow
def test_trainer_hf_end_to_end(tmp_path):
    from multinn_tpu.data.datasets import DataConfig
    from multinn_tpu.training.trainer import Trainer
    from multinn_tpu.utils import config as cfg_mod
    data = DataConfig.from_preset("synthetic", n_tracks=2, pitch_min=40,
                                  pitch_max=63, window=16, batch_size=4,
                                  synthetic_songs=8, synthetic_steps=64)
    model = multinn.MultINNConfig(n_tracks=2, n_pitches=24, mode="per-track",
                                  decoder_type="rnn-nade", n_hidden=16,
                                  n_rnn=12)
    train = cfg_mod.TrainConfig(epochs=2, optimizer="hf", hf_cg_iters=10,
                                ckpt_every_steps=0,
                                run_dir=str(tmp_path / "hfrun"))
    cfg = cfg_mod.ExperimentConfig(name="hf", data=data, model=model,
                                   train=train).validate()
    tr = Trainer(cfg)
    ev0 = tr.evaluate("valid")
    tr.train()
    ev1 = tr.evaluate("valid")
    assert np.isfinite(ev1["loss"]) and ev1["loss"] < ev0["loss"]
    # checkpoint roundtrip incl. HFState (lam/delta/accepted)
    tr.save_checkpoint()
    tr.ckpt.wait()
    t2 = Trainer(cfg)
    t2.restore()
    assert int(t2.step) == int(tr.step)
    np.testing.assert_allclose(float(t2.opt_state.lam),
                               float(tr.opt_state.lam))
    tr.close()
    t2.close()


def test_hf_error_contracts(tmp_path):
    from multinn_tpu.data.datasets import DataConfig
    from multinn_tpu.training.trainer import Trainer
    from multinn_tpu.utils import config as cfg_mod
    data = DataConfig.from_preset("synthetic", n_tracks=2, pitch_min=40,
                                  pitch_max=63, window=16, batch_size=4,
                                  synthetic_songs=8, synthetic_steps=64)
    model = multinn.MultINNConfig(n_tracks=2, n_pitches=24,
                                  decoder_type="rnn-rbm")
    train = cfg_mod.TrainConfig(optimizer="hf",
                                run_dir=str(tmp_path / "bad"))
    cfg = cfg_mod.ExperimentConfig(name="bad", data=data, model=model,
                                   train=train).validate()
    with pytest.raises(ValueError, match="rnn-nade"):
        Trainer(cfg)
    with pytest.raises(ValueError, match="rnn-nade"):
        multinn.conditional_logits(
            multinn.init(jax.random.PRNGKey(0), model),
            jnp.zeros((2, 4, 2, 24)))


@pytest.mark.slow
def test_hf_with_dbn_pretraining_and_bf16_policy(tmp_path):
    """Regression (round-3 review): (a) pretrain_encoders under
    optimizer='hf' must rebuild HFState, not call the absent optax
    optimizer; (b) the HF step pins the f32 matmul policy internally, so
    matmul_dtype='bf16' + optimizer='hf' must train (jvp cannot pass
    through the bf16 custom_vjp); (c) with a DBN encoder the HF gradient
    is the TRUE loss gradient (targets not stopped)."""
    from multinn_tpu.data.datasets import DataConfig
    from multinn_tpu.training.trainer import Trainer
    from multinn_tpu.utils import config as cfg_mod
    data = DataConfig.from_preset("synthetic", n_tracks=2, pitch_min=40,
                                  pitch_max=63, window=16, batch_size=4,
                                  synthetic_songs=8, synthetic_steps=64)
    model = multinn.MultINNConfig(n_tracks=2, n_pitches=24, mode="feedback",
                                  decoder_type="rnn-nade",
                                  encoder_hidden=(10,), n_hidden=16,
                                  n_rnn=12, matmul_dtype="bf16")
    train = cfg_mod.TrainConfig(epochs=2, optimizer="hf", hf_cg_iters=8,
                                pretrain_encoder_epochs=1,
                                ckpt_every_steps=0,
                                run_dir=str(tmp_path / "hfdbn"))
    cfg = cfg_mod.ExperimentConfig(name="hfdbn", data=data, model=model,
                                   train=train).validate()
    tr = Trainer(cfg)
    ev0 = tr.evaluate("valid")
    tr.train()                      # runs pretrain_encoders() itself: must
    #                                 not crash, must rebuild HFState
    assert isinstance(tr.opt_state, hf.HFState)
    ev1 = tr.evaluate("valid")
    tr.close()
    assert np.isfinite(ev1["loss"]) and ev1["loss"] < ev0["loss"]


@pytest.mark.slow
def test_hf_gradient_is_true_loss_gradient_with_dbn_encoder():
    """The HF right-hand side must equal grad of the production loss with a
    DBN encoder in the loop — both sides must treat the (frozen, binary —
    encoders.features) latent targets identically; a mismatch (one side
    differentiating through features the other freezes) would diverge."""
    cfg = multinn.MultINNConfig(n_tracks=2, n_pitches=10, mode="per-track",
                                decoder_type="rnn-nade",
                                encoder_hidden=(6,), n_hidden=8, n_rnn=6,
                                w_std=0.3)
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.bernoulli(jax.random.PRNGKey(1), 0.3,
                             (3, 5, 2, 10)).astype(jnp.float32)
    key = jax.random.PRNGKey(2)
    g_true = jax.grad(
        lambda p: multinn.loss(p, key, x, detailed=False)[0])(params)
    # one zero-CG-iteration macro-step: delta = cg_warm * 0 = 0 start, 0
    # iterations -> delta stays 0, so metrics["grad_norm"] is the norm of
    # the step's internal g — compare against the true gradient's norm
    st = hf.init_state(params, 1.0)
    _, _, m = hf.hf_step(params, st, x, key, cg_iters=0)
    true_norm = float(jnp.sqrt(hf._dot(g_true, g_true)))
    np.testing.assert_allclose(float(m["grad_norm"]), true_norm,
                               rtol=1e-5)
