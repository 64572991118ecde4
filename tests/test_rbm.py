"""Unit tests for the RBM math core (SURVEY §4.1): free energy vs brute-force
partition function, Gibbs conditional distributions, and CD-k gradient sign on
an analytic case."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinn_tpu.nn import rbm


def all_states(d):
    return jnp.array(list(itertools.product([0.0, 1.0], repeat=d)),
                     dtype=jnp.float32)


@pytest.fixture
def small_rbm():
    key = jax.random.PRNGKey(0)
    p = rbm.init(key, n_visible=4, n_hidden=3, w_std=0.5)
    # non-trivial biases
    p = p.replace(bv=jnp.array([0.3, -0.2, 0.1, 0.0]),
                  bh=jnp.array([-0.1, 0.2, 0.05]))
    return p


def test_free_energy_matches_marginalized_energy(small_rbm):
    """F(v) must equal -log Σ_h exp(-E(v,h)) exactly."""
    p = small_rbm
    vs = all_states(4)
    hs = all_states(3)
    # E(v,h) = -v·bv - h·bh - v W h for every (v, h) pair
    energy = (-(vs @ p.bv)[:, None] - (hs @ p.bh)[None, :]
              - vs @ p.w @ hs.T)                       # (16, 8)
    f_brute = -jax.scipy.special.logsumexp(-energy, axis=1)
    f = rbm.free_energy(vs, p.w, p.bv, p.bh)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_brute),
                               rtol=1e-5, atol=1e-5)


def test_free_energy_defines_normalized_distribution(small_rbm):
    """Σ_v exp(-F(v)) / Z == 1 by construction; check Z consistency with the
    joint: Σ_v exp(-F(v)) must equal Σ_{v,h} exp(-E(v,h))."""
    p = small_rbm
    vs, hs = all_states(4), all_states(3)
    f = rbm.free_energy(vs, p.w, p.bv, p.bh)
    z_from_f = jax.scipy.special.logsumexp(-f)
    energy = (-(vs @ p.bv)[:, None] - (hs @ p.bh)[None, :]
              - vs @ p.w @ hs.T)
    z_joint = jax.scipy.special.logsumexp(-energy)
    np.testing.assert_allclose(float(z_from_f), float(z_joint), rtol=1e-5)


def test_gibbs_conditionals(small_rbm):
    """Empirical p(h|v) from many Gibbs ups must match σ(vW + bh)."""
    p = small_rbm
    v = jnp.array([1.0, 0.0, 1.0, 1.0])
    n = 20000
    keys = jax.random.split(jax.random.PRNGKey(1), n)

    def up(k):
        kh, _ = jax.random.split(k)
        ph = rbm.prob_h_given_v(v, p.w, p.bh)
        return (jax.random.uniform(kh, ph.shape) < ph).astype(jnp.float32)

    hs = jax.vmap(up)(keys)
    emp = hs.mean(0)
    expected = rbm.prob_h_given_v(v, p.w, p.bh)
    np.testing.assert_allclose(np.asarray(emp), np.asarray(expected), atol=0.02)


def test_gibbs_chain_shapes_and_binarity(small_rbm):
    p = small_rbm
    v0 = jnp.zeros((7, 5, 4))
    vk = rbm.gibbs_chain(jax.random.PRNGKey(2), v0, p.w, p.bv, p.bh, k=3)
    assert vk.shape == (7, 5, 4)
    assert set(np.unique(np.asarray(vk))) <= {0.0, 1.0}


def test_cd_gradient_sign():
    """Analytic case: data = all-ones vectors. The CD-1 gradient on bv must
    push bv UP (negative gradient on loss means optimizer increases bv),
    because data has v_i=1 always while model reconstructions don't (yet)."""
    key = jax.random.PRNGKey(3)
    p = rbm.init(key, n_visible=6, n_hidden=4, w_std=0.01)
    v0 = jnp.ones((256, 6))

    def loss(bv):
        return rbm.cd_loss(jax.random.PRNGKey(4), v0, p.w, bv, p.bh, k=1)

    g = jax.grad(loss)(p.bv)
    # ∂L/∂bv = -mean(v0) + mean(vk); v0 == 1, vk ≈ 0.5 at init ⇒ strictly < 0
    assert np.all(np.asarray(g) < 0)


def test_cd_no_gradient_through_chain():
    """The CD loss value at vk==v0 is 0 and grads come only from the two F
    terms; verify grad exists, is finite, and that stop_gradient kills the
    chain path: perturbing the RNG (changing vk) changes the grad only via
    F(vk)'s bias/weight terms, never via a backprop through sampling (which
    would be NaN/None). Smoke-level guarantee."""
    key = jax.random.PRNGKey(5)
    p = rbm.init(key, n_visible=5, n_hidden=3, w_std=0.1)
    v0 = jax.random.bernoulli(
        jax.random.PRNGKey(6), 0.4, (64, 5)).astype(jnp.float32)

    def loss(params):
        return rbm.cd_loss(jax.random.PRNGKey(7), v0,
                           params.w, params.bv, params.bh, k=2)

    g = jax.grad(loss)(p)
    for leaf in jax.tree.leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_cd_training_reduces_free_energy_of_data():
    """50 SGD steps of CD-1 on a fixed two-mode dataset must lower data free
    energy relative to random states (i.e., the model learns the modes)."""
    key = jax.random.PRNGKey(8)
    p = rbm.init(key, n_visible=8, n_hidden=6, w_std=0.05)
    # two modes: 11110000 and 00001111
    a = jnp.tile(jnp.array([1., 1., 1., 1., 0., 0., 0., 0.]), (64, 1))
    b = jnp.tile(jnp.array([0., 0., 0., 0., 1., 1., 1., 1.]), (64, 1))
    data = jnp.concatenate([a, b])

    lr = 0.1

    @jax.jit
    def step(params, k):
        g = jax.grad(lambda q: rbm.cd_loss(k, data, q.w, q.bv, q.bh, k=1))(params)
        return jax.tree.map(lambda x, gg: x - lr * gg, params, g)

    for i in range(300):
        p = step(p, jax.random.PRNGKey(100 + i))

    f_data = rbm.free_energy(data, p.w, p.bv, p.bh).mean()
    rand = jax.random.bernoulli(
        jax.random.PRNGKey(9), 0.5, (128, 8)).astype(jnp.float32)
    f_rand = rbm.free_energy(rand, p.w, p.bv, p.bh).mean()
    assert float(f_data) < float(f_rand) - 0.5, (float(f_data), float(f_rand))


@pytest.mark.slow
def test_per_sample_biases_broadcast(small_rbm):
    """Time-conditioned biases (B, T, D)/(B, T, H) must broadcast through all
    RBM ops — this is the RNN-RBM contract."""
    p = small_rbm
    b, t = 3, 5
    v = jax.random.bernoulli(
        jax.random.PRNGKey(10), 0.5, (b, t, 4)).astype(jnp.float32)
    bv = jnp.broadcast_to(p.bv, (b, t, 4)) + 0.1
    bh = jnp.broadcast_to(p.bh, (b, t, 3)) - 0.1
    f = rbm.free_energy(v, p.w, bv, bh)
    assert f.shape == (b, t)
    vk = rbm.gibbs_chain(jax.random.PRNGKey(11), v, p.w, bv, bh, k=2)
    assert vk.shape == (b, t, 4)
    loss = rbm.cd_loss(jax.random.PRNGKey(12), v, p.w, bv, bh, k=1)
    assert np.isfinite(float(loss))


def test_pseudo_log_likelihood_finite(small_rbm):
    p = small_rbm
    v = jax.random.bernoulli(
        jax.random.PRNGKey(13), 0.5, (16, 4)).astype(jnp.float32)
    pll = rbm.pseudo_log_likelihood(jax.random.PRNGKey(14), v, p.w, p.bv, p.bh)
    assert pll.shape == (16,)
    assert np.all(np.isfinite(np.asarray(pll)))
    assert np.all(np.asarray(pll) <= 0)
