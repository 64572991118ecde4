"""Multi-layer RNN and remat (long-context lever, SURVEY §5.7) tests:
stacked-cell equivalence at 1 layer, gradient flow at 3 layers, and
remat == no-remat numerical equality (checkpointing must not change math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinn_tpu.models import rnn_nade, rnn_rbm
from multinn_tpu.models.base import DecoderConfig
from multinn_tpu.nn import rnn as rnn_nn

B, T, D = 3, 10, 12


def test_stacked_one_layer_equals_plain_cell():
    key = jax.random.PRNGKey(0)
    stacked = rnn_nn.stacked_init("lstm", key, 5, 7, 1, w_std=0.2)
    xs = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 5))
    st0 = rnn_nn.stacked_zero_state("lstm", (2,), 7, 1)
    finals, hs = rnn_nn.stacked_scan("lstm", stacked, st0, xs)
    final_plain, hs_plain = rnn_nn.lstm_scan(
        stacked[0], rnn_nn.lstm_zero_state((2,), 7), xs)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_plain),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(finals[0].c),
                               np.asarray(final_plain.c), rtol=1e-6)


def test_stacked_step_matches_scan():
    p = rnn_nn.stacked_init("lstm", jax.random.PRNGKey(0), 5, 7, 3,
                            w_std=0.2)
    xs = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 5))
    st = rnn_nn.stacked_zero_state("lstm", (2,), 7, 3)
    finals, hs = rnn_nn.stacked_scan("lstm", p, st, xs)
    st2 = rnn_nn.stacked_zero_state("lstm", (2,), 7, 3)
    for t in range(4):
        st2 = rnn_nn.stacked_step("lstm", p, st2, xs[t])
    for a, b in zip(finals, st2):
        np.testing.assert_allclose(np.asarray(a.h), np.asarray(b.h),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dec", [rnn_rbm, rnn_nade])
@pytest.mark.slow
def test_multilayer_decoder_trains_and_generates(dec):
    cfg = DecoderConfig(n_visible=D, n_hidden=16, n_rnn=10, rnn_layers=3,
                        gen_k=2)
    params = dec.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.bernoulli(
        jax.random.PRNGKey(1), 0.3, (B, T, D)).astype(jnp.float32)
    (val, _), grads = jax.value_and_grad(
        lambda p: dec.loss(p, jax.random.PRNGKey(2), x),
        has_aux=True)(params)
    assert np.isfinite(float(val))
    # all three layers must receive gradient
    for layer in grads.cell:
        assert float(jnp.abs(layer.wh).max()) > 0
    st = dec.init_state(params, (B,))
    st = dec.prime(params, st, x)
    _, v = dec.generate(params, jax.random.PRNGKey(3), st, 5)
    assert v.shape == (B, 5, D)


@pytest.mark.parametrize("dec", [rnn_rbm, rnn_nade])
@pytest.mark.slow
def test_remat_matches_norematerialization(dec):
    """jax.checkpoint must not change loss values or gradients."""
    x = jax.random.bernoulli(
        jax.random.PRNGKey(1), 0.3, (B, T, D)).astype(jnp.float32)
    vals, grads = [], []
    for remat in (False, True):
        cfg = DecoderConfig(n_visible=D, n_hidden=16, n_rnn=10,
                            remat=remat, gen_k=2)
        params = dec.init(jax.random.PRNGKey(0), cfg)
        (val, _), g = jax.value_and_grad(
            lambda p: dec.loss(p, jax.random.PRNGKey(2), x),
            has_aux=True)(params)
        vals.append(float(val))
        grads.append(g)
    assert vals[0] == pytest.approx(vals[1], rel=1e-6)
    for a, b in zip(jax.tree.leaves(grads[0]), jax.tree.leaves(grads[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
