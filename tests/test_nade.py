"""Unit tests for NADE (SURVEY §4.1): exact-likelihood normalization by
brute-force enumeration over all 2^D states, chunked-vs-full parity, sequential
recurrence vs cumsum formulation, and sampler-vs-likelihood agreement."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinn_tpu.nn import nade


def all_states(d):
    return jnp.array(list(itertools.product([0.0, 1.0], repeat=d)),
                     dtype=jnp.float32)


@pytest.fixture
def small_nade():
    p = nade.init(jax.random.PRNGKey(0), n_visible=6, n_hidden=4, w_std=0.5)
    return p.replace(bv=0.3 * jnp.arange(6, dtype=jnp.float32) - 0.5,
                     bh=jnp.array([0.1, -0.2, 0.3, 0.0]))


def test_log_prob_normalizes(small_nade):
    """Σ_v p(v) over all 2^6 states must equal 1 (exact likelihood model)."""
    p = small_nade
    vs = all_states(6)
    lp = nade.log_prob(vs, p.w, p.v, p.bv, p.bh)
    total = jax.scipy.special.logsumexp(lp)
    np.testing.assert_allclose(float(total), 0.0, atol=1e-4)


def test_log_prob_matches_sequential_definition(small_nade):
    """Cumsum formulation must equal the textbook sequential recurrence."""
    p = small_nade
    x = jax.random.bernoulli(
        jax.random.PRNGKey(1), 0.5, (9, 6)).astype(jnp.float32)

    # hand-rolled sequential reference
    def seq_logprob(xi):
        a = p.bh
        total = 0.0
        for i in range(6):
            h = jax.nn.sigmoid(a)
            logit = p.bv[i] + h @ p.v[i]
            total = total + (xi[i] * jax.nn.log_sigmoid(logit)
                             + (1 - xi[i]) * jax.nn.log_sigmoid(-logit))
            a = a + xi[i] * p.w[i]
        return total

    ref = jnp.stack([seq_logprob(x[j]) for j in range(9)])
    got = nade.log_prob(x, p.w, p.v, p.bv, p.bh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_chunked_matches_full(small_nade):
    p = small_nade
    x = jax.random.bernoulli(
        jax.random.PRNGKey(2), 0.5, (4, 7, 6)).astype(jnp.float32)
    full = nade.log_prob(x, p.w, p.v, p.bv, p.bh)
    chunked = nade.log_prob_chunked(x, p.w, p.v, p.bv, p.bh, chunk=2)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_chunked_with_batched_biases(small_nade):
    """RNN-NADE contract: per-(batch,time) biases broadcast through chunked LL."""
    p = small_nade
    b, t = 3, 4
    x = jax.random.bernoulli(
        jax.random.PRNGKey(3), 0.5, (b, t, 6)).astype(jnp.float32)
    bv = jnp.broadcast_to(p.bv, (b, t, 6)) + 0.05
    bh = jnp.broadcast_to(p.bh, (b, t, 4)) - 0.05
    full = nade.log_prob(x, p.w, p.v, bv, bh)
    chunked = nade.log_prob_chunked(x, p.w, p.v, bv, bh, chunk=3)
    assert full.shape == (b, t)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_sample_distribution_matches_log_prob(small_nade):
    """Empirical frequencies of 20k ancestral samples vs exact p(v): total
    variation distance must be small. This validates the sampler against the
    likelihood — the strongest end-to-end check of the NADE pair."""
    p = small_nade
    n = 20000
    xs = nade.sample(jax.random.PRNGKey(4), p.w, p.v, p.bv, p.bh,
                     batch_shape=(n,))
    assert xs.shape == (n, 6)
    # index each sample as an integer
    # itertools.product orders states with the LAST dim fastest-varying,
    # so dim i has place value 2^(D-1-i)
    pow2 = 2 ** jnp.arange(5, -1, -1)
    idx = np.asarray((xs * pow2).sum(-1)).astype(int)
    emp = np.bincount(idx, minlength=64) / n
    exact = np.exp(np.asarray(
        nade.log_prob(all_states(6), p.w, p.v, p.bv, p.bh)))
    tvd = 0.5 * np.abs(emp - exact).sum()
    assert tvd < 0.03, f"TVD {tvd} too large"


def test_sample_with_batched_biases(small_nade):
    p = small_nade
    bv = jnp.broadcast_to(p.bv, (5, 6)) + 0.1
    bh = jnp.broadcast_to(p.bh, (5, 4))
    xs = nade.sample(jax.random.PRNGKey(5), p.w, p.v, bv, bh,
                     batch_shape=(5,))
    assert xs.shape == (5, 6)
    assert set(np.unique(np.asarray(xs))) <= {0.0, 1.0}


def test_gradients_flow_everywhere(small_nade):
    """NADE is exact-likelihood: gradients must be finite and nonzero for all
    parameter leaves (teacher-forced training, unlike CD)."""
    p = small_nade
    x = jax.random.bernoulli(
        jax.random.PRNGKey(6), 0.5, (32, 6)).astype(jnp.float32)

    g = jax.grad(
        lambda q: -nade.log_prob(x, q.w, q.v, q.bv, q.bh).mean())(p)
    for leaf in jax.tree.leaves(g):
        arr = np.asarray(leaf)
        assert np.all(np.isfinite(arr))
        assert np.abs(arr).max() > 0


def test_tri_form_matches_cumsum(small_nade):
    """The strictly-lower-triangular-matmul evaluation of the exclusive
    cumsum (nn.nade._a_excl form='tri' — the MXU-friendly variant the TPU
    dispatch can pick) must agree with the cumsum form to float tolerance,
    on plain and batched (time-conditioned) biases, and its gradients must
    match too."""
    p = small_nade
    x = jax.random.bernoulli(
        jax.random.PRNGKey(7), 0.4, (9, 6)).astype(jnp.float32)
    ll_c = nade.log_prob(x, p.w, p.v, p.bv, p.bh, form="cumsum")
    ll_t = nade.log_prob(x, p.w, p.v, p.bv, p.bh, form="tri")
    np.testing.assert_allclose(np.asarray(ll_t), np.asarray(ll_c),
                               rtol=1e-5, atol=1e-5)
    bv = jnp.broadcast_to(p.bv, (9, 6)) + 0.3
    bh = jnp.broadcast_to(p.bh, (9, 4)) - 0.1
    np.testing.assert_allclose(
        np.asarray(nade.log_prob(x, p.w, p.v, bv, bh, form="tri")),
        np.asarray(nade.log_prob(x, p.w, p.v, bv, bh, form="cumsum")),
        rtol=1e-5, atol=1e-5)
    g_c = jax.grad(lambda q: -nade.log_prob(
        x, q.w, q.v, q.bv, q.bh, form="cumsum").mean())(p)
    g_t = jax.grad(lambda q: -nade.log_prob(
        x, q.w, q.v, q.bv, q.bh, form="tri").mean())(p)
    for a, b in zip(jax.tree.leaves(g_c), jax.tree.leaves(g_t)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)
