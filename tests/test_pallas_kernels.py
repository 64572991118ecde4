"""Pallas kernel tests (SURVEY §4.5): kernels vs pure-XLA fallbacks in
interpreter mode on CPU — distribution-level parity (the RNG contract pins
streams to differ between impls; means/conditionals must match), shapes,
binarity, and determinism per seed."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinn_tpu.nn import nade as nade_nn
from multinn_tpu.nn import rbm as rbm_nn
from multinn_tpu.ops import gibbs_pallas, nade_pallas


# ---------------------------------------------------------------------------
# Gibbs kernel
# ---------------------------------------------------------------------------

def test_gibbs_kernel_shapes_binary_deterministic():
    key = jax.random.PRNGKey(0)
    d, h = 24, 16
    p = rbm_nn.init(jax.random.PRNGKey(1), d, h, w_std=0.5)
    v0 = jax.random.bernoulli(
        jax.random.PRNGKey(2), 0.4, (4, 8, d)).astype(jnp.float32)
    vk = gibbs_pallas.gibbs_chain(key, v0, p.w, p.bv, p.bh, k=3,
                                  interpret=True)
    assert vk.shape == v0.shape
    assert set(np.unique(np.asarray(vk))) <= {0.0, 1.0}
    vk2 = gibbs_pallas.gibbs_chain(key, v0, p.w, p.bv, p.bh, k=3,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(vk), np.asarray(vk2))
    vk3 = gibbs_pallas.gibbs_chain(jax.random.PRNGKey(9), v0, p.w, p.bv,
                                   p.bh, k=3, interpret=True)
    assert not np.array_equal(np.asarray(vk), np.asarray(vk3))


def test_gibbs_kernel_stationary_distribution_matches_xla():
    """Long chains from both impls must land in the same stationary
    distribution: compare mean visible activations over a large batch."""
    d, h = 12, 8
    p = rbm_nn.init(jax.random.PRNGKey(1), d, h, w_std=0.8)
    p = p.replace(bv=jnp.linspace(-1.0, 1.0, d))
    v0 = jax.random.bernoulli(
        jax.random.PRNGKey(2), 0.5, (4096, d)).astype(jnp.float32)
    k = 20
    vk_pallas = gibbs_pallas.gibbs_chain(jax.random.PRNGKey(3), v0, p.w,
                                         p.bv, p.bh, k=k, interpret=True)
    vk_xla = rbm_nn.gibbs_chain(jax.random.PRNGKey(4), v0, p.w, p.bv, p.bh,
                                k=k)
    np.testing.assert_allclose(np.asarray(vk_pallas.mean(0)),
                               np.asarray(vk_xla.mean(0)), atol=0.04)


def test_gibbs_kernel_per_sample_biases():
    """RNN-RBM contract: (B, T, D)-shaped conditioned biases."""
    d, h = 16, 8
    p = rbm_nn.init(jax.random.PRNGKey(1), d, h, w_std=0.3)
    v0 = jax.random.bernoulli(
        jax.random.PRNGKey(2), 0.3, (8, 4, d)).astype(jnp.float32)
    bv = jnp.broadcast_to(p.bv, (8, 4, d)) + 0.2
    bh = jnp.broadcast_to(p.bh, (8, 4, h)) - 0.1
    vk = gibbs_pallas.gibbs_chain(jax.random.PRNGKey(3), v0, p.w, bv, bh,
                                  k=2, interpret=True)
    assert vk.shape == (8, 4, d)
    # strong positive visible bias on dim 0 must raise its activation
    bv_hi = bv.at[..., 0].set(6.0)
    vk_hi = gibbs_pallas.gibbs_chain(jax.random.PRNGKey(3), v0, p.w, bv_hi,
                                     bh, k=5, interpret=True)
    assert float(vk_hi[..., 0].mean()) > 0.9


def test_gibbs_kernel_batch_padding():
    """Non-multiple-of-tile batch sizes must round-trip through padding."""
    d, h = 12, 8
    p = rbm_nn.init(jax.random.PRNGKey(1), d, h, w_std=0.3)
    v0 = jax.random.bernoulli(
        jax.random.PRNGKey(2), 0.3, (13, d)).astype(jnp.float32)
    vk = gibbs_pallas.gibbs_chain(jax.random.PRNGKey(3), v0, p.w, p.bv,
                                  p.bh, k=1, interpret=True)
    assert vk.shape == (13, d)


# ---------------------------------------------------------------------------
# NADE sweep kernel
# ---------------------------------------------------------------------------

def all_states(d):
    return jnp.array(list(itertools.product([0.0, 1.0], repeat=d)),
                     dtype=jnp.float32)


def test_nade_kernel_distribution_matches_log_prob():
    """Empirical distribution of kernel samples vs the exact NADE likelihood
    (the same end-to-end check the XLA sampler passes in test_nade.py)."""
    p = nade_nn.init(jax.random.PRNGKey(0), 6, 4, w_std=0.5)
    p = p.replace(bv=0.3 * jnp.arange(6, dtype=jnp.float32) - 0.5)
    n = 20000
    xs = nade_pallas.sample(jax.random.PRNGKey(1), p.w, p.v, p.bv, p.bh,
                            batch_shape=(n,), interpret=True)
    assert xs.shape == (n, 6)
    assert set(np.unique(np.asarray(xs))) <= {0.0, 1.0}
    pow2 = 2 ** jnp.arange(5, -1, -1)
    idx = np.asarray((xs * pow2).sum(-1)).astype(int)
    emp = np.bincount(idx, minlength=64) / n
    exact = np.exp(np.asarray(
        nade_nn.log_prob(all_states(6), p.w, p.v, p.bv, p.bh)))
    tvd = 0.5 * np.abs(emp - exact).sum()
    assert tvd < 0.03, f"TVD {tvd}"


def test_nade_kernel_batched_biases_and_determinism():
    p = nade_nn.init(jax.random.PRNGKey(0), 8, 6, w_std=0.3)
    bv = jnp.broadcast_to(p.bv, (5, 8)) + jnp.linspace(-1, 1, 5)[:, None]
    bh = jnp.broadcast_to(p.bh, (5, 6))
    xs = nade_pallas.sample(jax.random.PRNGKey(1), p.w, p.v, bv, bh,
                            batch_shape=(5,), interpret=True)
    assert xs.shape == (5, 8)
    xs2 = nade_pallas.sample(jax.random.PRNGKey(1), p.w, p.v, bv, bh,
                             batch_shape=(5,), interpret=True)
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(xs2))


def test_nade_kernel_respects_bias_conditioning():
    """Huge positive visible bias -> all ones; huge negative -> all zeros."""
    p = nade_nn.init(jax.random.PRNGKey(0), 8, 6, w_std=0.01)
    # ±30 puts sigmoid within 1e-13 of {0,1} — beyond the 2^-24 resolution
    # of the kernel's uniforms, so the asserts hold for ANY RNG stream
    ones = nade_pallas.sample(jax.random.PRNGKey(1), p.w, p.v,
                              p.bv + 30.0, p.bh, batch_shape=(16,),
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(ones), 1.0)
    zeros = nade_pallas.sample(jax.random.PRNGKey(2), p.w, p.v,
                               p.bv - 30.0, p.bh, batch_shape=(16,),
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(zeros), 0.0)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def test_dispatch_auto_uses_xla_on_cpu():
    """On the CPU test backend, impl='auto' must fall back to XLA (pallas is
    TPU-only here) and produce valid chains."""
    from multinn_tpu.ops import gibbs as gibbs_ops
    from multinn_tpu.ops import nade_ops
    p = rbm_nn.init(jax.random.PRNGKey(1), 8, 6, w_std=0.3)
    v0 = jnp.zeros((4, 8))
    vk = gibbs_ops.gibbs_chain(jax.random.PRNGKey(0), v0, p.w, p.bv, p.bh,
                               k=2, impl="auto")
    assert vk.shape == (4, 8)
    np_ = nade_nn.init(jax.random.PRNGKey(2), 8, 6)
    xs = nade_ops.nade_sample(jax.random.PRNGKey(3), np_.w, np_.v, np_.bv,
                              np_.bh, batch_shape=(4,), impl="auto")
    assert xs.shape == (4, 8)


def test_gibbs_kernel_safe_under_grad():
    """The kernel must be usable inside value_and_grad (zero-tangent JVP):
    the CD-style loss around it gets correct bias gradients."""
    d, h = 12, 8
    p = rbm_nn.init(jax.random.PRNGKey(1), d, h, w_std=0.3)
    v0 = jnp.ones((16, d))

    def loss(bv):
        vk = jax.lax.stop_gradient(gibbs_pallas.gibbs_chain(
            jax.random.PRNGKey(0), v0, p.w, bv, p.bh, k=1, interpret=True))
        return jnp.mean(rbm_nn.free_energy(v0, p.w, bv, p.bh)
                        - rbm_nn.free_energy(vk, p.w, bv, p.bh))

    g = jax.grad(loss)(p.bv)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.all(np.asarray(g) < 0)      # data all-ones pushes bv up


def test_nade_kernel_safe_under_grad():
    p = nade_nn.init(jax.random.PRNGKey(0), 8, 6, w_std=0.3)

    def f(bv):
        xs = nade_pallas.sample(jax.random.PRNGKey(1), p.w, p.v, bv, p.bh,
                                batch_shape=(4,), interpret=True)
        return jnp.sum(xs * bv)           # grads flow to bv only directly

    g = jax.grad(f)(p.bv)
    assert np.all(np.isfinite(np.asarray(g)))


def test_kernel_rng_full_64bit_keying():
    """Kernel PRNG streams are keyed by BOTH 32-bit words of the jax key
    (ops.sampling.key_to_seeds). Keys engineered to collide under the old
    single-word fold (w0 ^ w1*2654435761) must now yield distinct streams."""
    from multinn_tpu.ops import kernel_prng
    from multinn_tpu.ops.sampling import key_to_seeds

    c = np.uint32(2654435761)
    k_a = jnp.array([0, 0], jnp.uint32)              # fold = 0
    k_b = jnp.array([c, 1], jnp.uint32)              # fold = c ^ (1*c) = 0
    s_a = np.asarray(key_to_seeds(k_a))
    s_b = np.asarray(key_to_seeds(k_b))
    assert not np.array_equal(s_a, s_b)

    u_a = np.asarray(kernel_prng.random_uniform(
        (8, 128), jnp.int32(s_a[0]), jnp.int32(s_a[1])))
    u_b = np.asarray(kernel_prng.random_uniform(
        (8, 128), jnp.int32(s_b[0]), jnp.int32(s_b[1])))
    assert not np.allclose(u_a, u_b)
    # and sequential jax keys map to distinct (s0, s1) pairs
    seeds = {tuple(np.asarray(key_to_seeds(jax.random.PRNGKey(i))))
             for i in range(256)}
    assert len(seeds) == 256


def test_nade_kernel_joint_distribution_chi2():
    """Distribution-level closure (round-1 VERDICT weak #10): the fused NADE
    sampler must reproduce the EXACT joint distribution, not just the same
    algebra. D=3 -> 8 outcomes; empirical frequencies over N kernel samples
    vs exact probabilities from nn.nade.log_prob, Pearson chi^2 with a
    p~1e-3 threshold (fixed seed -> deterministic test)."""
    import itertools
    D_, H_ = 3, 5
    p = nade_nn.init(jax.random.PRNGKey(3), D_, H_, w_std=1.0)
    bv = p.bv + jnp.array([0.5, -0.3, 0.2])

    states = jnp.array(list(itertools.product([0.0, 1.0], repeat=D_)))
    logp = np.asarray(jax.vmap(
        lambda s: nade_nn.log_prob(s, p.w, p.v, bv, p.bh))(states))
    probs = np.exp(logp)
    np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-5)

    N = 8192
    samples = np.asarray(nade_pallas.sample(
        jax.random.PRNGKey(11), p.w, p.v, bv, p.bh, batch_shape=(N,),
        interpret=True))
    codes = samples @ np.array([4, 2, 1])
    counts = np.bincount(codes.astype(int), minlength=8)
    chi2 = float(((counts - N * probs) ** 2 / (N * probs)).sum())
    assert chi2 < 24.3, (chi2, counts, np.round(N * probs, 1))  # df=7, p~1e-3


@pytest.mark.slow
def test_gen_fused_rbm_stationary_distribution_chi2():
    """Distribution-level closure for the WHOLE-GENERATION RBM kernel
    (VERDICT r2 weak #6 — the last sampling path pinned only at mean level):
    with the RNN conditioning zeroed the per-step biases are fixed, so each
    emitted frame is a gen_k-sweep block-Gibbs draw whose stationary law is
    the exact RBM joint p(v) ∝ exp(−F(v)). gen_k=25 mixes a 3-dim RBM far
    past any autocorrelation this χ² can see; per-track empirical
    frequencies over T frames vs the enumerated joint, per-track biases
    distinct so a track mixup would be caught."""
    import itertools
    from multinn_tpu.models import multinn as mn
    K_, D_, H_ = 2, 3, 4
    cfg = mn.MultINNConfig(n_tracks=K_, n_pitches=D_, mode="per-track",
                           decoder_type="rnn-rbm", n_hidden=H_, n_rnn=4,
                           w_std=0.8, gen_k=25)
    params = mn.init(jax.random.PRNGKey(0), cfg)
    dec = params.decoder
    bv = jnp.stack([dec.bv[0] + jnp.array([0.6, -0.4, 0.1]),
                    dec.bv[1] + jnp.array([-0.5, 0.3, -0.2])])
    params = params.replace(decoder=dec.replace(
        bv=bv, wuv=jnp.zeros_like(dec.wuv), wuh=jnp.zeros_like(dec.wuh)))
    dec = params.decoder

    T = 4096
    st = mn.init_state(params, 1)
    _, roll = mn._generate_fused(params, jax.random.PRNGKey(21), st, T,
                                 interpret=True)         # (1, T, K, D)
    states = jnp.array(list(itertools.product([0.0, 1.0], repeat=D_)))
    for k in range(K_):
        fe = np.asarray(jax.vmap(
            lambda s: rbm_nn.free_energy(s, dec.w[k], dec.bv[k], dec.bh[k])
        )(states))
        probs = np.exp(-fe - (-fe).max())
        probs /= probs.sum()
        codes = (np.asarray(roll[0, :, k]) @ np.array([4, 2, 1])).astype(int)
        counts = np.bincount(codes, minlength=8)
        chi2 = float(((counts - T * probs) ** 2 / (T * probs)).sum())
        assert chi2 < 24.3, (k, chi2, counts, np.round(T * probs, 1))


@pytest.mark.slow
def test_gen_fused_nade_joint_distribution_chi2():
    """Same closure for the WHOLE-GENERATION NADE kernel: with the RNN
    conditioning zeroed, the T emitted frames are iid draws from each
    track's NADE joint — per-track empirical frequencies must match the
    exact per-track distributions."""
    import itertools
    from multinn_tpu.models import multinn as mn
    from multinn_tpu.nn import nade as nn_nade
    K_, D_ = 2, 3
    cfg = mn.MultINNConfig(n_tracks=K_, n_pitches=D_, mode="per-track",
                           decoder_type="rnn-nade", n_hidden=5, n_rnn=4,
                           w_std=1.0)
    params = mn.init(jax.random.PRNGKey(0), cfg)
    dec = params.decoder
    # zero the RNN conditioning so every step's conditionals are identical;
    # give the tracks different biases so a track mixup would be caught
    bv = jnp.stack([dec.bv[0] + jnp.array([0.6, -0.4, 0.1]),
                    dec.bv[1] + jnp.array([-0.5, 0.3, -0.2])])
    params = params.replace(decoder=dec.replace(
        bv=bv, wuv=jnp.zeros_like(dec.wuv), wuh=jnp.zeros_like(dec.wuh)))
    dec = params.decoder

    T = 4096
    st = mn.init_state(params, 1)
    _, roll = mn._generate_fused(params, jax.random.PRNGKey(9), st, T,
                                 interpret=True)        # (1, T, K, D)
    states = jnp.array(list(itertools.product([0.0, 1.0], repeat=D_)))
    for k in range(K_):
        logp = np.asarray(jax.vmap(
            lambda s: nn_nade.log_prob(s, dec.w[k], dec.v[k], dec.bv[k],
                                       dec.bh[k]))(states))
        probs = np.exp(logp)
        codes = (np.asarray(roll[0, :, k]) @ np.array([4, 2, 1])).astype(int)
        counts = np.bincount(codes, minlength=8)
        chi2 = float(((counts - T * probs) ** 2 / (T * probs)).sum())
        assert chi2 < 24.3, (k, chi2, counts, np.round(T * probs, 1))
