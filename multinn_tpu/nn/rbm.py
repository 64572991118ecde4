"""Restricted Boltzmann Machine primitives (SURVEY C5).

Math follows Boulanger-Lewandowski et al. 2012 (arXiv:1206.6392 §2): for binary
visible units v ∈ {0,1}^D and hidden units h ∈ {0,1}^H with weights W ∈ R^{D×H},
visible bias bv ∈ R^D, hidden bias bh ∈ R^H:

    E(v, h)  = -v·bv - h·bh - v W h
    F(v)     = -v·bv - Σ_j softplus(bh_j + (v W)_j)        (free energy)
    p(h|v)   = σ(v W + bh)          (block Gibbs up)
    p(v|h)   = σ(h Wᵀ + bv)         (block Gibbs down)

CD-k gradient (§2.2): ∇θ ≈ ∇θ F(v⁰) − ∇θ F(vᵏ) where vᵏ is the k-step Gibbs
reconstruction treated as a constant (no gradient flows through the chain; in
the RNN-RBM the per-timestep biases bv(t), bh(t) DO receive gradient through
both F terms — that is how the RNN learns).

TPU notes: all functions broadcast over arbitrary leading batch dims, so the
RNN-RBM trainer runs ONE batched Gibbs chain over the flattened (batch×time)
axis — k sequential steps total, each an MXU matmul, instead of k×T tiny ones.
The fused Pallas variant of the chain lives in ``multinn_tpu.ops.gibbs``; this
module is the math-of-record and the pure-XLA fallback.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from flax import struct

from multinn_tpu.ops import precision


@struct.dataclass
class RBMParams:
    """RBM parameter pytree. w: (D, H); bv: (D,); bh: (H,)."""

    w: jax.Array
    bv: jax.Array
    bh: jax.Array

    @property
    def n_visible(self) -> int:
        return self.w.shape[0]

    @property
    def n_hidden(self) -> int:
        return self.w.shape[1]


def init(key: jax.Array, n_visible: int, n_hidden: int,
         w_std: float = 0.01, dtype=jnp.float32) -> RBMParams:
    """Small-std normal weights, zero biases (reference init convention)."""
    w = w_std * jax.random.normal(key, (n_visible, n_hidden), dtype=dtype)
    return RBMParams(w=w, bv=jnp.zeros((n_visible,), dtype),
                     bh=jnp.zeros((n_hidden,), dtype))


def free_energy(v: jax.Array, w: jax.Array, bv: jax.Array,
                bh: jax.Array) -> jax.Array:
    """F(v) = -v·bv - Σ_j softplus(bh_j + (vW)_j).

    v: (..., D); bv: (..., D) or (D,); bh: (..., H) or (H,) — per-sample biases
    broadcast, which is exactly what the RNN-RBM's time-conditioned biases need.
    Returns (...,).
    """
    vis_term = jnp.sum(v * bv, axis=-1)
    hid_term = jnp.sum(jax.nn.softplus(
        precision.mm(v, w) + bh), axis=-1)
    return -vis_term - hid_term


def prob_h_given_v(v, w, bh):
    return jax.nn.sigmoid(precision.mm(v, w) + bh)


def prob_v_given_h(h, w, bv):
    return jax.nn.sigmoid(precision.mm(h, w.T) + bv)


def _bernoulli(key: jax.Array, p: jax.Array) -> jax.Array:
    """Framework-wide Bernoulli primitive (single definition; re-exported as
    ops.sampling.bernoulli, which carries the RNG-contract docs — the import
    points that way round to avoid an ops->nn->ops cycle)."""
    u = jax.random.uniform(key, p.shape, dtype=p.dtype)
    return (u < p).astype(p.dtype)


def gibbs_step(key: jax.Array, v: jax.Array, w, bv, bh,
               sample_v: bool = True) -> Tuple[jax.Array, jax.Array]:
    """One block Gibbs sweep v -> h -> v'. Returns (v', h).

    ``sample_v=False`` returns the mean-field visible probabilities instead of
    a binary sample (used for the final sweep of mean-field reconstruction).
    """
    kh, kv = jax.random.split(key)
    h = _bernoulli(kh, prob_h_given_v(v, w, bh))
    pv = prob_v_given_h(h, w, bv)
    v_new = _bernoulli(kv, pv) if sample_v else pv
    return v_new, h


def gibbs_chain(key: jax.Array, v0: jax.Array, w, bv, bh, k: int) -> jax.Array:
    """k sweeps of block Gibbs starting from v0 (pure-XLA fallback path).

    The k-loop is a ``lax.scan`` (k is static): each sweep is two MXU matmuls
    plus VPU sigmoid/compare — XLA keeps the chain state in registers/VMEM.
    """
    keys = jax.random.split(key, k)

    def body(v, kk):
        v_new, _ = gibbs_step(kk, v, w, bv, bh, sample_v=True)
        return v_new, None

    vk, _ = jax.lax.scan(body, v0, keys)
    return vk


@partial(jax.jit, static_argnames=("k",))
def cd_loss(key: jax.Array, v0: jax.Array, w, bv, bh, k: int = 1) -> jax.Array:
    """Contrastive-divergence surrogate loss, mean over all leading dims:

        L = mean[ F(v⁰) − F(stop_grad(vᵏ)) ]

    ∇L is exactly the CD-k gradient estimate. vᵏ is stopped; the (possibly
    per-sample, time-conditioned) biases are NOT stopped — gradient reaches the
    conditioning RNN through both free-energy terms.
    """
    vk = jax.lax.stop_gradient(gibbs_chain(key, v0, w, bv, bh, k))
    return jnp.mean(free_energy(v0, w, bv, bh) - free_energy(vk, w, bv, bh))


def reconstruction(key: jax.Array, v0: jax.Array, w, bv, bh,
                   k: int = 1) -> jax.Array:
    """k-step Gibbs reconstruction with a mean-field final visible pass —
    the monitoring quantity (cross-entropy vs v0 is the reference's loss proxy).
    """
    k_chain, k_final = jax.random.split(key)   # independent streams
    if k > 1:
        v = gibbs_chain(k_chain, v0, w, bv, bh, k - 1)
    else:
        v = v0
    v_mf, _ = gibbs_step(k_final, v, w, bv, bh, sample_v=False)
    return v_mf


def pseudo_log_likelihood(key: jax.Array, v: jax.Array, w, bv, bh) -> jax.Array:
    """Stochastic pseudo-log-likelihood estimate: flip one random visible unit
    per sample, PLL ≈ D * log σ(F(ṽ) − F(v)). Cheap train-time LL proxy.
    """
    d = v.shape[-1]
    idx = jax.random.randint(key, v.shape[:-1], 0, d)
    flip = jax.nn.one_hot(idx, d, dtype=v.dtype)
    v_flip = v * (1 - flip) + (1 - v) * flip
    fe, fe_flip = free_energy(v, w, bv, bh), free_energy(v_flip, w, bv, bh)
    return d * jax.nn.log_sigmoid(fe_flip - fe)
