"""Unit tests for RNN cells (SURVEY §4.1): scan-based recurrence vs
hand-unrolled reference over 3 steps."""

import jax
import jax.numpy as jnp
import numpy as np

from multinn_tpu.nn import rnn


def test_lstm_scan_matches_manual_unroll():
    key = jax.random.PRNGKey(0)
    p = rnn.lstm_init(key, n_in=5, n_hidden=7, w_std=0.3)
    xs = jax.random.normal(jax.random.PRNGKey(1), (3, 2, 5))  # (T, B, in)
    st0 = rnn.lstm_zero_state((2,), 7)

    st, hs = rnn.lstm_scan(p, st0, xs)

    st_ref = st0
    hs_ref = []
    for t in range(3):
        st_ref = rnn.lstm_step(p, st_ref, xs[t])
        hs_ref.append(st_ref.h)
    hs_ref = jnp.stack(hs_ref)

    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.c), np.asarray(st_ref.c),
                               rtol=1e-5, atol=1e-6)


def test_vanilla_scan_matches_manual_unroll():
    p = rnn.vanilla_init(jax.random.PRNGKey(2), n_in=4, n_hidden=6, w_std=0.3)
    xs = jax.random.normal(jax.random.PRNGKey(3), (3, 2, 4))
    st0 = rnn.vanilla_zero_state((2,), 6)

    st, hs = rnn.vanilla_scan(p, st0, xs)

    st_ref = st0
    for t in range(3):
        st_ref = rnn.vanilla_step(p, st_ref, xs[t])
    np.testing.assert_allclose(np.asarray(st.h), np.asarray(st_ref.h),
                               rtol=1e-5, atol=1e-6)
    assert hs.shape == (3, 2, 6)


def test_forget_bias_init():
    p = rnn.lstm_init(jax.random.PRNGKey(4), 3, 5, forget_bias=1.0)
    np.testing.assert_allclose(np.asarray(p.b[5:10]), 1.0)
    np.testing.assert_allclose(np.asarray(p.b[:5]), 0.0)


def test_cell_dispatch():
    for cell in ("lstm", "vanilla"):
        p = rnn.cell_init(cell, jax.random.PRNGKey(5), 4, 6)
        st = rnn.cell_zero_state(cell, (2,), 6)
        st2 = rnn.cell_step(cell, p, st, jnp.ones((2, 4)))
        assert rnn.state_h(st2).shape == (2, 6)
        stf, hs = rnn.cell_scan(cell, p, st, jnp.ones((3, 2, 4)))
        assert hs.shape == (3, 2, 6)
