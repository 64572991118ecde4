"""Mixed-precision matmul policy for the training hot path.

Reference counterpart: none — the reference (TF1, CPU/GPU) computes
everything in f32 (SURVEY §2 C5/C7). This module is a TPU-native addition:
the v5e MXU runs bf16×bf16→f32 at ~2× the f32 rate, and at scale-stress
shapes (H ≥ 1024, SURVEY §2.2 TP row / VERDICT r2 next #3) the train step
is matmul-bound, so feeding the hot matmuls bf16 is the standard lever.

Design (the classic TPU mixed-precision recipe):
  * master weights, optimizer state, losses, gates, recurrent carries and
    reductions stay f32 — ONLY matmul operand FEEDS are cast;
  * accumulation stays f32 on the MXU (``preferred_element_type``);
  * the backward pass feeds bf16 too (custom_vjp below — without it, XLA's
    transpose would promote the bf16 residuals back to f32 and the
    backward 2/3 of training FLOPs would see no speedup);
  * the policy is a TRACE-TIME context (same idiom as
    ops.sampling.force_impl): the Trainer enters it inside its jitted step
    bodies from ``MultINNConfig.matmul_dtype``, so any call site traces
    the configured precision.

Scope: RBM free-energy/Gibbs matmuls (nn/rbm.py), LSTM/vanilla-RNN cell
matmuls (nn/rnn.py), DBN encoder layers (models/encoders.py). The NADE
exact-likelihood path stays f32 on purpose: it is bandwidth-bound on the
exclusive-cumsum (B·T·D·H) tensors, and its "EXACT log-likelihood" claim
(SURVEY C6) is the property the tests pin.

Measured (v5e, scripts/scale_stress.py --dtype bf16): see BASELINE.md
scale-stress rows; at reference scales (H=150) the policy is neutral —
keep f32 there.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp

_POLICY: contextvars.ContextVar = contextvars.ContextVar(
    "multinn_matmul_dtype", default=None)

_NAMES = {None: None, "f32": None, "float32": None,
          "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16}


def matmul_dtype():
    """The active matmul-feed dtype (jnp.bfloat16) or None (= f32)."""
    return _POLICY.get()


@contextlib.contextmanager
def matmul_precision(name):
    """Trace everything inside with matmul feeds cast to ``name``
    ('f32'/None = no-op; 'bf16' = bfloat16 feeds, f32 accumulation)."""
    if name not in _NAMES:
        raise ValueError(
            f"unknown matmul precision {name!r}; pick one of "
            f"{sorted(k for k in _NAMES if isinstance(k, str))}")
    token = _POLICY.set(_NAMES[name])
    try:
        yield
    finally:
        _POLICY.reset(token)


@jax.custom_vjp
def _mm_bf16(a: jax.Array, b: jax.Array) -> jax.Array:
    """matmul(a, b) with bf16 feeds and f32 accumulation, forward and
    backward. a: (..., K); b: (K, N) strictly 2D — every policy call site
    contracts against a 2D weight (or its transpose)."""
    return jnp.matmul(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


def _mm_bf16_fwd(a, b):
    a16, b16 = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
    out = jnp.matmul(a16, b16, preferred_element_type=jnp.float32)
    # bf16 residuals: halves activation residency vs f32 (x is {0,1} or
    # σ/tanh outputs here — bf16 carries them to ~3 decimal digits, the
    # usual mixed-precision tradeoff)
    return out, (a16, b16)


def _mm_bf16_bwd(res, g):
    a16, b16 = res
    g16 = g.astype(jnp.bfloat16)
    da = jnp.matmul(g16, b16.T, preferred_element_type=jnp.float32)
    db = jnp.matmul(a16.reshape(-1, a16.shape[-1]).T,
                    g16.reshape(-1, g16.shape[-1]),
                    preferred_element_type=jnp.float32)
    return da.astype(jnp.float32), db.astype(jnp.float32)


_mm_bf16.defvjp(_mm_bf16_fwd, _mm_bf16_bwd)


def mm(a: jax.Array, b: jax.Array) -> jax.Array:
    """Policy-aware matmul for the training hot path.

    f32 in, f32 out always; when the bf16 policy is active (trace-time),
    both operand feeds — forward AND backward — are bf16 with f32 MXU
    accumulation. ``b`` must be 2D (a weight matrix or its transpose);
    ``a`` may carry any leading batch dims."""
    if _POLICY.get() is None or a.dtype != jnp.float32:
        return jnp.matmul(a, b)
    return _mm_bf16(a, b)
