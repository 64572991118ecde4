"""Generation-time sampling temperature (GenerateConfig.temperature).

Temperature is implemented as an EXACT decoder-parameter transform
(multinn.tempered_params; per-family math in rnn_rbm/rnn_nade
.tempered_params) plus a logit scale on the DBN decode conditional
(multinn._decode_sample) — no kernel changes, so the scan path, the
per-step Pallas samplers and the whole-generation fused kernels temper
identically. These tests pin:

  * T=1.0 is bit-exact (params unchanged; generate(temperature=1.0) ==
    generate()),
  * the NADE transform scales exactly the per-dim conditional logit,
  * the RBM transform tempers the joint: exact enumeration shows entropy
    monotone in T and the T→∞ marginal uniform,
  * end-to-end density ordering low-T < T=1 < high-T (≈0.5) for both
    decoder families and the DBN decode stage,
  * the fused kernels (interpret mode) see the same tempered distribution.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinn_tpu.models import encoders as enc_mod
from multinn_tpu.models import multinn, rnn_nade, rnn_rbm
from multinn_tpu.models.multinn import MultINNConfig
from multinn_tpu.nn import nade as nade_nn
from multinn_tpu.nn import rbm as rbm_nn

K, D, H, U = 3, 12, 10, 8


def cfg_for(decoder="rnn-nade", mode="feedback", **kw):
    base = dict(n_tracks=K, n_pitches=D, mode=mode, decoder_type=decoder,
                n_hidden=H, n_rnn=U, cd_k=1, gen_k=3, w_std=0.1)
    base.update(kw)
    return MultINNConfig(**base)


def biased_params(cfg, bias=-1.5, key=0):
    """init params with a strongly negative visible bias so temperature has
    visible work to do (random-init logits sit near 0 where any T maps to
    p≈0.5)."""
    params = multinn.init(jax.random.PRNGKey(key), cfg)
    dec = params.decoder
    return params.replace(decoder=dec.replace(bv=dec.bv + bias))


def density(roll) -> float:
    return float(np.asarray(roll, dtype=np.float64).mean())


# ---------------------------------------------------------------------------
# transform-level properties
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("decoder", ["rnn-rbm", "rnn-nade"])
def test_tempered_params_identity_at_t1(decoder):
    params = multinn.init(jax.random.PRNGKey(0), cfg_for(decoder))
    out = multinn.tempered_params(params, 1.0)
    assert out is params            # bit-exact default: same object


@pytest.mark.parametrize("decoder", ["rnn-rbm", "rnn-nade"])
def test_tempered_params_rejects_nonpositive(decoder):
    params = multinn.init(jax.random.PRNGKey(0), cfg_for(decoder))
    with pytest.raises(ValueError):
        multinn.tempered_params(params, 0.0)
    with pytest.raises(ValueError):
        multinn.tempered_params(params, -2.0)


def test_nade_transform_scales_exactly_the_conditional_logit():
    """The NADE transform {v, bv} -> {v/T, bv/T} must divide every per-dim
    conditional logit by T while leaving the hidden path untouched."""
    key = jax.random.PRNGKey(3)
    kw, kv, kbv, kbh, kx = jax.random.split(key, 5)
    w = jax.random.normal(kw, (D, H)) * 0.3
    v = jax.random.normal(kv, (D, H)) * 0.3
    bv = jax.random.normal(kbv, (D,))
    bh = jax.random.normal(kbh, (H,))
    x = (jax.random.uniform(kx, (7, D)) < 0.3).astype(jnp.float32)
    t = 2.5
    base = nade_nn.conditionals_logits(x, w, v, bv, bh)
    scaled = nade_nn.conditionals_logits(x, w, v / t, bv / t, bh)
    np.testing.assert_allclose(np.asarray(scaled), np.asarray(base) / t,
                               rtol=1e-5, atol=1e-6)


def test_rnn_nade_tempered_params_fields():
    cfg = cfg_for("rnn-nade")
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    tp = multinn.tempered_params(params, 2.0)
    d0, d1 = params.decoder, tp.decoder
    np.testing.assert_allclose(np.asarray(d1.v), np.asarray(d0.v) / 2.0)
    np.testing.assert_allclose(np.asarray(d1.bv), np.asarray(d0.bv) / 2.0)
    np.testing.assert_allclose(np.asarray(d1.wuv), np.asarray(d0.wuv) / 2.0)
    # hidden path and the RNN cell untouched
    np.testing.assert_array_equal(np.asarray(d1.w), np.asarray(d0.w))
    np.testing.assert_array_equal(np.asarray(d1.bh), np.asarray(d0.bh))
    np.testing.assert_array_equal(np.asarray(d1.wuh), np.asarray(d0.wuh))
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), d1.cell, d0.cell))


def test_rbm_tempered_joint_exact_enumeration():
    """Scaling {w, bv, bh} by β is inverse-temperature β on the RBM joint:
    exact marginals (2^D × 2^H enumeration) must show entropy monotonically
    increasing in T, and the T→∞ marginal uniform."""
    d, h = 4, 3
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (d, h)) * 1.5
    bv = jnp.array([1.0, -1.0, 0.5, -0.5])
    bh = jnp.array([0.3, -0.3, 0.8])
    vs = jnp.array([[(i >> j) & 1 for j in range(d)]
                    for i in range(2 ** d)], dtype=jnp.float32)

    def marginal(beta):
        f = rbm_nn.free_energy(vs, w * beta, bv * beta, bh * beta)
        p = jnp.exp(-(f - f.min()))
        return np.asarray(p / p.sum(), dtype=np.float64)

    def entropy(p):
        return float(-(p * np.log(np.maximum(p, 1e-300))).sum())

    h_cold = entropy(marginal(1.0 / 0.25))   # T = 0.25
    h_base = entropy(marginal(1.0))
    h_hot = entropy(marginal(1.0 / 8.0))     # T = 8
    assert h_cold < h_base < h_hot
    np.testing.assert_allclose(marginal(1e-6), np.full(2 ** d, 2.0 ** -d),
                               atol=1e-4)


def test_decode_logits_matches_decode():
    ecfg = enc_mod.EncoderConfig(n_in=D, hidden_sizes=(8, 6))
    ep = enc_mod.init(jax.random.PRNGKey(5), ecfg)
    hsamp = (jax.random.uniform(jax.random.PRNGKey(6), (9, 6)) < 0.5
             ).astype(jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(enc_mod.decode(ep, hsamp)),
        np.asarray(jax.nn.sigmoid(enc_mod.decode_logits(ep, hsamp))))
    # pass-through encoder: decode stays identity
    np.testing.assert_array_equal(np.asarray(enc_mod.decode((), hsamp)),
                                  np.asarray(hsamp))


def test_decode_sample_temperature_ordering():
    """The DBN decode conditional sharpens toward its bias at low T and
    flattens to 0.5 at high T."""
    ecfg = enc_mod.EncoderConfig(n_in=D, hidden_sizes=(6,))
    ep = enc_mod.init(jax.random.PRNGKey(7), ecfg)
    ep = (ep[0].replace(bv=ep[0].bv - 1.2),)
    lat = (jax.random.uniform(jax.random.PRNGKey(8), (64, 6)) < 0.5
           ).astype(jnp.float32)
    kd = jax.random.PRNGKey(9)
    d_cold = density(multinn._decode_sample(ep, kd, lat, beta=1 / 0.05))
    d_base = density(multinn._decode_sample(ep, kd, lat, beta=1.0))
    d_hot = density(multinn._decode_sample(ep, kd, lat, beta=1 / 50.0))
    assert d_cold < d_base < d_hot
    assert 0.4 < d_hot < 0.6
    assert d_cold < 0.05


# ---------------------------------------------------------------------------
# end-to-end generation
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("decoder,mode", [("rnn-rbm", "per-track"),
                                          ("rnn-nade", "feedback")])
def test_generate_t1_kwarg_bit_exact(decoder, mode):
    params = biased_params(cfg_for(decoder, mode))
    st = multinn.init_state(params, 2)
    _, r0 = multinn.generate(params, jax.random.PRNGKey(2), st, 6)
    _, r1 = multinn.generate(params, jax.random.PRNGKey(2), st, 6,
                             temperature=1.0)
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))


@pytest.mark.slow
def test_generate_t1_kwarg_bit_exact_dbn():
    cfg = cfg_for("rnn-rbm", "hybrid", encoder_hidden=(8,))
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    st = multinn.init_state(params, 2)
    _, r0 = multinn.generate(params, jax.random.PRNGKey(2), st, 5)
    _, r1 = multinn.generate(params, jax.random.PRNGKey(2), st, 5,
                             temperature=1.0)
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))


@pytest.mark.parametrize("decoder,mode", [("rnn-rbm", "per-track"),
                                          ("rnn-nade", "feedback"),
                                          ("rnn-nade", "joint")])
def test_generate_density_ordering(decoder, mode):
    """bv = -1.5 ⇒ base density σ(-1.5)≈0.18-ish; low T sharpens toward 0,
    high T flattens toward 0.5."""
    params = biased_params(cfg_for(decoder, mode))
    st = multinn.init_state(params, 4)
    n = 32

    def dens(t):
        _, roll = multinn.generate(params, jax.random.PRNGKey(4), st, n,
                                   temperature=t)
        return density(roll)

    d_cold, d_base, d_hot = dens(0.05), dens(1.0), dens(100.0)
    assert d_cold < d_base < d_hot, (d_cold, d_base, d_hot)
    assert 0.4 < d_hot < 0.6
    assert d_cold < 0.6 * d_base + 1e-9


def test_nade_low_temperature_near_deterministic():
    """T→0 drives every NADE conditional to a hard 0/1 decision: two
    independent sampling keys must produce (nearly) the same roll."""
    params = biased_params(cfg_for("rnn-nade", "per-track"), bias=-1.0)
    st = multinn.init_state(params, 2)
    _, ra = multinn.generate(params, jax.random.PRNGKey(11), st, 16,
                             temperature=0.02)
    _, rb = multinn.generate(params, jax.random.PRNGKey(12), st, 16,
                             temperature=0.02)
    agree = float((np.asarray(ra) == np.asarray(rb)).mean())
    assert agree > 0.99, agree


def test_generator_reads_temperature_from_config():
    """cfg.generate.temperature flows through Generator (and therefore
    serving, which wraps Generator)."""
    from multinn_tpu.training.generator import Generator
    from multinn_tpu.utils.config import ExperimentConfig, GenerateConfig
    from multinn_tpu.data.datasets import DataConfig

    model = cfg_for("rnn-nade", "per-track", n_tracks=2)
    data = DataConfig(n_tracks=2, pitch_min=21, pitch_max=21 + D - 1,
                      window=8, batch_size=4)
    params = biased_params(model)
    base_cfg = ExperimentConfig(name="t", data=data, model=model)
    hot_cfg = dataclasses.replace(
        base_cfg, generate=GenerateConfig(temperature=100.0))
    r_base = Generator(base_cfg, params).generate(jax.random.PRNGKey(0), 24,
                                                  batch=4)
    r_hot = Generator(hot_cfg, params).generate(jax.random.PRNGKey(0), 24,
                                                batch=4)
    assert density(r_hot) > density(r_base)
    assert 0.4 < density(r_hot) < 0.6


# ---------------------------------------------------------------------------
# fused kernels (interpret mode)
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("decoder", ["rnn-rbm", "rnn-nade"])
def test_fused_tempered_matches_scan_density(decoder):
    """The fused whole-generation kernels receive tempered params as data:
    their tempered distribution must match the scan path's (same ordering
    and close density; RNG streams differ by contract)."""
    cfg = cfg_for(decoder, "per-track", n_pitches=16)
    params = biased_params(cfg)
    st = multinn.init_state(params, 1)
    n = 48
    for t in (0.2, 1.0, 100.0):
        tp = multinn.tempered_params(params, t)
        _, r_scan = multinn.generate(params, jax.random.PRNGKey(1), st, n,
                                     fused=False, temperature=t)
        _, r_fused = multinn._generate_fused(tp, jax.random.PRNGKey(2), st,
                                             n, interpret=True,
                                             dec_beta=1.0 / t)
        assert r_fused.shape == r_scan.shape
        assert abs(density(r_fused) - density(r_scan)) < 0.08, t
