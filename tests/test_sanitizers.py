"""Numerical-sanitizer sweeps (SURVEY §5.2): the JAX analogue of running under
sanitizers — jax_debug_nans catches silent NaN production in a train step, and
jax_disable_jit exercises op-by-op semantics (catches tracing-only bugs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-tier: multi-device equality / interpret-mode kernels

from multinn_tpu.models import multinn
from multinn_tpu.models.multinn import MultINNConfig


def tiny(dec):
    cfg = MultINNConfig(n_tracks=2, n_pitches=12, mode="per-track",
                        decoder_type=dec, n_hidden=8, n_rnn=6, gen_k=2)
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.bernoulli(
        jax.random.PRNGKey(1), 0.3, (2, 4, 2, 12)).astype(jnp.float32)
    return params, x


@pytest.mark.parametrize("dec", ["rnn-rbm", "rnn-nade"])
def test_debug_nans_clean_train_step(dec):
    params, x = tiny(dec)
    jax.config.update("jax_debug_nans", True)
    try:
        (val, _), grads = jax.value_and_grad(
            lambda p: multinn.loss(p, jax.random.PRNGKey(2), x),
            has_aux=True)(params)
        assert np.isfinite(float(val))
    finally:
        jax.config.update("jax_debug_nans", False)


def test_debug_nans_actually_fires():
    """Sanity: the sanitizer itself must detect an injected NaN."""
    jax.config.update("jax_debug_nans", True)
    try:
        with pytest.raises((FloatingPointError, ZeroDivisionError)):
            jax.jit(lambda x: 0.0 / x)(jnp.float32(0.0)).block_until_ready()
    finally:
        jax.config.update("jax_debug_nans", False)


@pytest.mark.parametrize("dec", ["rnn-rbm", "rnn-nade"])
def test_disable_jit_sweep(dec):
    """Loss and a short generation must work op-by-op (no jit)."""
    params, x = tiny(dec)
    with jax.disable_jit():
        val, _ = multinn.loss(params, jax.random.PRNGKey(2), x)
        assert np.isfinite(float(val))
        st = multinn.init_state(params, 2)
        _, roll = multinn.generate(params, jax.random.PRNGKey(3), st, 3)
        assert roll.shape == (2, 3, 2, 12)
