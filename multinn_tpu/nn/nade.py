"""Neural Autoregressive Distribution Estimator primitives (SURVEY C6).

Math follows Boulanger-Lewandowski et al. 2012 (arXiv:1206.6392 §3.3) / Larochelle
& Murray 2011: for v ∈ {0,1}^D, hidden width H, weights W ∈ R^{D×H} (encoding),
V ∈ R^{D×H} (decoding), hidden bias bh ∈ R^H, visible bias bv ∈ R^D:

    a_i  = bh + Σ_{j<i} v_j W_j        (running activation, a_0 = bh)
    h_i  = σ(a_i)
    p(v_i = 1 | v_<i) = σ(bv_i + V_i · h_i)
    log p(v) = Σ_i log p(v_i | v_<i)    — EXACT likelihood.

TPU-first formulation: the reference (TF1) evaluates the O(D) recurrence
sequentially even in training. Here training/eval likelihood uses the
**exclusive-cumsum form**: a = bh + cumsum_exclusive(v_j ⊗ W_j, axis=D), which
is fully parallel over D (XLA computes cumsum in log-depth) and turns the whole
likelihood into two batched matmul-shaped ops — MXU-friendly, no sequential
loop at all. Memory is O(B·T·D·H); ``logprob_chunked`` trades it back via a
scan over D-chunks when needed.

Sampling is inherently sequential over D; the pure-XLA fallback here scans over
dims, and the fused on-chip sweep lives in ``multinn_tpu.ops.nade_pallas``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from flax import struct

from multinn_tpu.nn import rbm as rbm_nn


@struct.dataclass
class NADEParams:
    """NADE parameter pytree. w: (D, H) encode; v: (D, H) decode;
    bv: (D,); bh: (H,)."""

    w: jax.Array
    v: jax.Array
    bv: jax.Array
    bh: jax.Array

    @property
    def n_visible(self) -> int:
        return self.w.shape[0]

    @property
    def n_hidden(self) -> int:
        return self.w.shape[1]


def init(key: jax.Array, n_visible: int, n_hidden: int,
         w_std: float = 0.01, dtype=jnp.float32) -> NADEParams:
    kw, kv = jax.random.split(key)
    return NADEParams(
        w=w_std * jax.random.normal(kw, (n_visible, n_hidden), dtype=dtype),
        v=w_std * jax.random.normal(kv, (n_visible, n_hidden), dtype=dtype),
        bv=jnp.zeros((n_visible,), dtype),
        bh=jnp.zeros((n_hidden,), dtype),
    )


def bernoulli_ll(logits: jax.Array, x: jax.Array) -> jax.Array:
    """Elementwise Bernoulli log-likelihood x·logσ(l) + (1−x)·logσ(−l).

    THE single definition of the likelihood-from-logits math: the exact NADE
    LL (log_prob / log_prob_chunked), the kernel-backed likelihood dispatch
    (ops/nade_ops.py), the detailed-metrics path (models/rnn_nade.py) and the
    Hessian-free CE objective (training/hf.py) must all agree bit-for-bit —
    they share this function rather than re-deriving it."""
    return (x * jax.nn.log_sigmoid(logits)
            + (1 - x) * jax.nn.log_sigmoid(-logits))


def _a_excl(contrib: jax.Array, form: str) -> jax.Array:
    """Exclusive cumulative sum of per-dim contributions over the dim axis.

    form='cumsum': XLA cumulative sum — log-depth shifted adds, each pass
    touching the full (..., D, H) tensor (bandwidth ~ log2(D) x tensor).
    form='tri': ONE strictly-lower-triangular (D, D) matmul — touches the
    tensor once and puts the work on the MXU instead (D x the FLOPs, which
    is the right trade once the tensor spills past VMEM). A/B-measured on
    v5e in BASELINE.md; ops/nade_ops.py picks the default per backend.
    Both are exact (f32 accumulation; summation order differs in the last
    ulp only)."""
    if form == "tri":
        d = contrib.shape[-2]
        lstrict = jnp.tril(jnp.ones((d, d), contrib.dtype), k=-1)
        return jnp.einsum("ij,...jh->...ih", lstrict, contrib)
    csum = jnp.cumsum(contrib, axis=-2)
    return jnp.concatenate(
        [jnp.zeros_like(csum[..., :1, :]), csum[..., :-1, :]], axis=-2)


def conditionals_logits(x: jax.Array, w, v, bv, bh,
                        form: str = "cumsum") -> jax.Array:
    """All D conditional logits for observed x, in parallel.

    x: (..., D); w, v: (D, H); bv: (..., D) or (D,); bh: (..., H) or (H,).
    Returns logits (..., D) with logits_i = bv_i + V_i · σ(a_i).
    ``form`` selects the exclusive-cumsum evaluation (see _a_excl).
    """
    # contrib[..., j, :] = x_j * W_j   -> (..., D, H)
    contrib = x[..., :, None] * w
    a = _a_excl(contrib, form) + bh[..., None, :]
    h = jax.nn.sigmoid(a)                      # (..., D, H)
    return bv + jnp.einsum("...dh,dh->...d", h, v)


def log_prob(x: jax.Array, w, v, bv, bh, form: str = "cumsum") -> jax.Array:
    """Exact log p(x) = Σ_i log p(x_i | x_<i). Returns (...,)."""
    logits = conditionals_logits(x, w, v, bv, bh, form=form)
    return jnp.sum(bernoulli_ll(logits, x), axis=-1)


def log_prob_chunked(x: jax.Array, w, v, bv, bh, chunk: int = 16) -> jax.Array:
    """Memory-bounded exact log-likelihood: scan over D in chunks of ``chunk``
    dims, carrying the running activation. Peak extra memory O(B·chunk·H)
    instead of O(B·D·H); within each chunk the cumsum form keeps parallelism.
    D must be divisible by chunk (pad upstream if not).
    """
    d, h_dim = w.shape
    if d % chunk:
        raise ValueError(f"D={d} not divisible by chunk={chunk}")
    n_chunks = d // chunk
    batch_shape = x.shape[:-1]

    # Reshape per-dim tensors to (n_chunks, chunk, ...), scan over chunks.
    xc = jnp.moveaxis(x.reshape(*batch_shape, n_chunks, chunk), -2, 0)
    wc = w.reshape(n_chunks, chunk, h_dim)
    vc = v.reshape(n_chunks, chunk, h_dim)
    bvc = jnp.moveaxis(
        jnp.broadcast_to(bv, (*batch_shape, d)).reshape(
            *batch_shape, n_chunks, chunk), -2, 0)

    a0 = jnp.broadcast_to(bh, (*batch_shape, h_dim)).astype(x.dtype)

    def body(a, inp):
        x_i, w_i, v_i, bv_i = inp   # (..., chunk), (chunk,H), (chunk,H), (..., chunk)
        contrib = x_i[..., :, None] * w_i            # (..., chunk, H)
        csum = jnp.cumsum(contrib, axis=-2)
        a_excl = jnp.concatenate(
            [jnp.zeros_like(csum[..., :1, :]), csum[..., :-1, :]], axis=-2)
        h = jax.nn.sigmoid(a[..., None, :] + a_excl)
        logits = bv_i + jnp.einsum("...ch,ch->...c", h, v_i)
        return (a + csum[..., -1, :],
                jnp.sum(bernoulli_ll(logits, x_i), axis=-1))

    _, lls = jax.lax.scan(body, a0, (xc, wc, vc, bvc))
    return jnp.sum(lls, axis=0)


def sample(key: jax.Array, w, v, bv, bh,
           batch_shape: Tuple[int, ...] = ()) -> jax.Array:
    """Ancestral sampling: sequential sweep over D dims (pure-XLA fallback;
    the fused Pallas sweep is ops.nade_pallas). bv/bh may carry batch dims
    (time-conditioned RNN-NADE biases). Returns (*batch_shape, D).
    """
    d, h_dim = w.shape
    bh_b = jnp.broadcast_to(bh, (*batch_shape, h_dim))
    bv_b = jnp.broadcast_to(bv, (*batch_shape, d))
    keys = jax.random.split(key, d)
    bv_t = jnp.moveaxis(bv_b, -1, 0)            # (D, ...)

    def body(a, inp):
        kk, w_i, v_i, bv_i = inp
        h = jax.nn.sigmoid(a)                    # (..., H)
        logit = bv_i + jnp.einsum("...h,h->...", h, v_i)
        p = jax.nn.sigmoid(logit)
        x_i = rbm_nn._bernoulli(kk, p)
        return a + x_i[..., None] * w_i, x_i

    _, xs = jax.lax.scan(body, bh_b.astype(w.dtype), (keys, w, v, bv_t))
    return jnp.moveaxis(xs, 0, -1)               # (..., D)
