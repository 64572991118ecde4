"""MultINN composition tests (SURVEY C11/C12): all inter-track
architectures × both decoder families — loss/grads, generation shape and
binarity, feedback-context influence, encoder stacking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinn_tpu.models import multinn
from multinn_tpu.models.multinn import MultINNConfig

B, T, K, D = 2, 8, 3, 12


def make_cfg(mode, dec="rnn-rbm", enc_hidden=()):
    return MultINNConfig(
        n_tracks=K, n_pitches=D, mode=mode, decoder_type=dec,
        encoder_hidden=enc_hidden, n_hidden=16, n_rnn=12, cd_k=1, gen_k=2)


def data(key=0):
    return jax.random.bernoulli(
        jax.random.PRNGKey(key), 0.3, (B, T, K, D)).astype(jnp.float32)


@pytest.mark.parametrize("mode", ["per-track", "feedback", "joint", "hybrid"])
@pytest.mark.parametrize("dec", ["rnn-rbm", "rnn-nade"])
def test_loss_and_grads(mode, dec):
    cfg = make_cfg(mode, dec)
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    x = data()
    (val, metrics), grads = jax.value_and_grad(
        lambda p: multinn.loss(p, jax.random.PRNGKey(1), x),
        has_aux=True)(params)
    assert np.isfinite(float(val))
    for leaf in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
    # metrics contract: 'loss_per_track' exists in EVERY mode (joint has
    # one decoder over the concatenated tracks -> a (1,) vector)
    expect = (1,) if mode == "joint" else (K,)
    assert metrics["loss_per_track"].shape == expect
    np.testing.assert_allclose(float(jnp.mean(metrics["loss_per_track"])),
                               float(val), rtol=1e-6)


@pytest.mark.parametrize("mode", ["per-track", "feedback", "joint", "hybrid"])
@pytest.mark.parametrize("dec", ["rnn-rbm", "rnn-nade"])
def test_generate(mode, dec):
    cfg = make_cfg(mode, dec)
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    st = multinn.init_state(params, B)
    st = multinn.prime(params, st, data())
    gen = jax.jit(lambda kk: multinn.generate(params, kk, st, 6)[1])
    roll = gen(jax.random.PRNGKey(2))
    assert roll.shape == (B, 6, K, D)
    assert set(np.unique(np.asarray(roll))) <= {0.0, 1.0}
    # fixed-seed reproducibility
    roll2 = gen(jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(roll), np.asarray(roll2))


def test_prime_uses_carried_feedback_ctx():
    """prime() in feedback mode must condition the first seed frame's RNN
    advance on the INCOMING state's cross-track context (ctx(t) =
    latents(t-1)) — chained generate -> prime -> generate is a supported
    session. Reference: frame-by-frame forced_step threading the context
    exactly as generation does."""
    from multinn_tpu.models import rnn_nade as dec
    cfg = make_cfg("feedback", "rnn-nade")
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    st0 = multinn.init_state(params, B)
    st1, _ = multinn.generate(params, jax.random.PRNGKey(1), st0, 5)
    assert float(jnp.abs(st1.ctx).sum()) > 0     # the carried ctx is real
    seed = data(3)
    primed = multinn.prime(params, st1, seed)

    st, ctx = st1.decoder, st1.ctx
    feats_k = multinn._encode_tracks(params, seed)           # (K, B, T, F)
    for t in range(seed.shape[1]):
        v_t = feats_k[:, :, t]                               # (K, B, F)
        st = jax.vmap(lambda p, s, v: dec.forced_step(p, s, v, ctx))(
            params.decoder, st, v_t)
        ctx = multinn._flatten_latents(v_t)
    np.testing.assert_allclose(np.asarray(primed.ctx), np.asarray(ctx))
    for a, b in zip(jax.tree.leaves(primed.decoder), jax.tree.leaves(st)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # fresh states carry zero ctx -> bit-exact with the zero-prefix path
    # (the pre-fix behavior) for every existing prime consumer
    np.testing.assert_array_equal(np.asarray(st0.ctx),
                                  np.zeros_like(np.asarray(st0.ctx)))


def test_feedback_context_matters():
    """In feedback mode the cross-track context must influence the loss:
    permuting OTHER tracks' content changes track 0's conditional loss."""
    cfg = make_cfg("feedback", "rnn-nade")
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    x = data()
    _, m1 = multinn.loss(params, jax.random.PRNGKey(1), x)
    # change only track 1's frames; track 0's per-track loss must change
    # (it sees track 1 through the shared feedback context)
    x2 = x.at[:, :, 1, :].set(1.0 - x[:, :, 1, :])
    _, m2 = multinn.loss(params, jax.random.PRNGKey(1), x2)
    l0_before = float(m1["loss_per_track"][0])
    l0_after = float(m2["loss_per_track"][0])
    assert l0_before != l0_after


def test_per_track_independence():
    """In per-track mode, track 0's loss must NOT depend on other tracks."""
    cfg = make_cfg("per-track", "rnn-nade")
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    x = data()
    _, m1 = multinn.loss(params, jax.random.PRNGKey(1), x)
    x2 = x.at[:, :, 1, :].set(1.0 - x[:, :, 1, :])
    _, m2 = multinn.loss(params, jax.random.PRNGKey(1), x2)
    assert float(m1["loss_per_track"][0]) == pytest.approx(
        float(m2["loss_per_track"][0]), rel=1e-6)


@pytest.mark.slow
def test_dbn_encoder_stack():
    cfg = make_cfg("per-track", "rnn-rbm", enc_hidden=(10, 8))
    assert cfg.feature_dim() == 8
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    x = data()
    val, _ = multinn.loss(params, jax.random.PRNGKey(1), x)
    assert np.isfinite(float(val))
    st = multinn.init_state(params, B)
    _, roll = multinn.generate(params, jax.random.PRNGKey(2), st, 4)
    assert roll.shape == (B, 4, K, D)
    assert set(np.unique(np.asarray(roll))) <= {0.0, 1.0}


def test_log_likelihood_shapes():
    for dec in ("rnn-rbm", "rnn-nade"):
        cfg = make_cfg("per-track", dec)
        params = multinn.init(jax.random.PRNGKey(0), cfg)
        ll = multinn.log_likelihood(params, jax.random.PRNGKey(1), data())
        assert ll.shape == (B,)
        assert np.all(np.isfinite(np.asarray(ll)))
        assert np.all(np.asarray(ll) <= 0) or dec == "rnn-rbm"


@pytest.mark.slow
def test_vanilla_cell_multinn():
    """The paper's original vanilla-RNN conditioning (C7 math) end-to-end."""
    cfg = MultINNConfig(n_tracks=2, n_pitches=12, mode="per-track",
                        decoder_type="rnn-rbm", cell="vanilla",
                        n_hidden=16, n_rnn=12, gen_k=2)
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    x = data()[:, :, :2, :12]
    (val, _), grads = jax.value_and_grad(
        lambda p: multinn.loss(p, jax.random.PRNGKey(1), x),
        has_aux=True)(params)
    assert np.isfinite(float(val))
    st = multinn.init_state(params, 2)
    _, roll = multinn.generate(params, jax.random.PRNGKey(2), st, 4)
    assert roll.shape == (2, 4, 2, 12)


@pytest.mark.slow
def test_joint_mode_with_dbn_encoder():
    cfg = MultINNConfig(n_tracks=3, n_pitches=12, mode="joint",
                        decoder_type="rnn-nade", encoder_hidden=(20,),
                        n_hidden=16, n_rnn=12, gen_k=2)
    assert cfg.feature_dim() == 20
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.bernoulli(
        jax.random.PRNGKey(1), 0.3, (2, 6, 3, 12)).astype(jnp.float32)
    val, _ = multinn.loss(params, jax.random.PRNGKey(2), x)
    assert np.isfinite(float(val))
    st = multinn.init_state(params, 2)
    _, roll = multinn.generate(params, jax.random.PRNGKey(3), st, 4)
    assert roll.shape == (2, 4, 3, 12)
    assert set(np.unique(np.asarray(roll))) <= {0.0, 1.0}


def test_generate_gibbs_k_override():
    """k passed to generate overrides the model's gen_k (C14 knob)."""
    cfg = make_cfg("per-track", "rnn-rbm")
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    st = multinn.init_state(params, B)
    _, r1 = multinn.generate(params, jax.random.PRNGKey(1), st, 4, k=1)
    _, r2 = multinn.generate(params, jax.random.PRNGKey(1), st, 4, k=7)
    assert r1.shape == r2.shape
    # different chain lengths consume different amounts of randomness
    assert not np.array_equal(np.asarray(r1), np.asarray(r2))


def test_musegan_mode_aliases():
    """C12 extra modes: MuseGAN vocabulary normalizes to the native wiring
    (jamming = independent per-track, composer = fully joint)."""
    assert make_cfg("jamming").mode == "per-track"
    assert make_cfg("composer").mode == "joint"
    with pytest.raises(ValueError, match="mode must be"):
        make_cfg("bogus")


def test_hybrid_mode_shares_encoder_but_not_decoders():
    """hybrid = ONE shared encoder (weight tying across tracks), independent
    per-track decoders, NO cross-track feedback context."""
    cfg = make_cfg("hybrid", enc_hidden=(8,))
    assert cfg.shared_encoder and cfg.ctx_dim() == 0
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    # shared encoder: leaves carry NO leading track axis
    enc_leaf = jax.tree.leaves(params.encoder)[0]
    assert enc_leaf.shape[0] != K or enc_leaf.ndim == 2
    # decoders: stacked per-track
    dec_leaf = jax.tree.leaves(params.decoder)[0]
    assert dec_leaf.shape[0] == K
    # unlike feedback, per-track losses are INDEPENDENT of other tracks:
    # perturbing track 2's input must not change track 0's loss
    x = data()
    x2 = x.at[:, :, 2, :].set(1.0 - x[:, :, 2, :])
    _, m1 = multinn.loss(params, jax.random.PRNGKey(1), x, detailed=False)
    _, m2 = multinn.loss(params, jax.random.PRNGKey(1), x2, detailed=False)
    np.testing.assert_allclose(np.asarray(m1["loss_per_track"][0]),
                               np.asarray(m2["loss_per_track"][0]),
                               rtol=1e-6)


def test_init_visible_biases_and_decode_calibration():
    """Marginal visible-bias init (Hinton 2010 §8): layer-0 bv = logit of
    the data marginal; decode from an otherwise-random encoder is then
    CALIBRATED (decode marginal ≈ data marginal) — the r4 fix for the
    measured 6.5× generation-density overshoot of under-pretrained DBNs."""
    from multinn_tpu.models import encoders as enc_mod
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.random((400, 24)) < 0.05).astype(np.float32))
    ecfg = enc_mod.EncoderConfig(n_in=24, hidden_sizes=(10, 6), w_std=0.01)
    params = enc_mod.init(jax.random.PRNGKey(0), ecfg)
    inited = enc_mod.init_visible_biases(params, x)
    m = np.clip(np.asarray(x).mean(axis=0), 1e-4, 1 - 1e-4)
    np.testing.assert_allclose(np.asarray(inited[0].bv),
                               np.log(m / (1 - m)), rtol=1e-5)
    # upper layer's bv comes from the chained σ features' marginal
    feats1 = jax.nn.sigmoid(x @ inited[0].w + inited[0].bh)
    m1 = np.clip(np.asarray(feats1).mean(axis=0), 1e-4, 1 - 1e-4)
    np.testing.assert_allclose(np.asarray(inited[1].bv),
                               np.log(m1 / (1 - m1)), atol=1e-5)
    # w/bh untouched; pass-through encoders are a no-op
    np.testing.assert_array_equal(np.asarray(inited[0].w),
                                  np.asarray(params[0].w))
    assert enc_mod.init_visible_biases((), x) == ()
    # calibration: bias-inited random encoder decodes at the data marginal
    cal = {k: float(v)
           for k, v in enc_mod.decode_calibration(inited, x).items()}
    assert cal["data_mean"] == pytest.approx(float(x.mean()), rel=1e-5)
    ratio = cal["decode_mean"] / cal["data_mean"]
    assert 0.5 < ratio < 2.0, cal
    # ...while the zero-bias init decodes near 0.5 — wildly miscalibrated
    cal0 = {k: float(v)
            for k, v in enc_mod.decode_calibration(params, x).items()}
    assert cal0["decode_mean"] / cal0["data_mean"] > 5.0, cal0
