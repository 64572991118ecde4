"""RNN-NADE decoder (SURVEY C8; math: arXiv:1206.6392 §3.3, reference
counterpart ``modules/decoders/rnn_nade.py`` [K]).

Model: a NADE over each frame v(t) whose biases are conditioned on the RNN
state (same conditioning scheme as the RNN-RBM):

    bv(t) = bv + u(t-1) @ Wuv          bh(t) = bh + u(t-1) @ Wuh
    u(t)  = Cell(u(t-1), [v(t); ctx(t)])

Training is EXACT maximum likelihood (teacher forced; gradients flow through
everything — no CD approximation). TPU-first: the per-dimension NADE
recurrence is evaluated in the parallel exclusive-cumsum form over ALL (batch,
time, dim) positions at once — there is no sequential dim loop in training at
all (the reference's TF1 graph loops over D even for likelihood).

Generation runs the sequential per-dim sweep inside a single jitted time scan
(fused Pallas sweep when available — SURVEY hard part #1).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from flax import struct

from multinn_tpu.models import base
from multinn_tpu.models.base import DecoderConfig, rnn_input
from multinn_tpu.nn import rnn as rnn_nn
from multinn_tpu.ops import nade_ops
from multinn_tpu.training.metrics import frame_metrics
from multinn_tpu.nn import nade as nade_nn


@struct.dataclass
class Params:
    cell: object
    w: jax.Array            # (F, H) NADE encode weights
    v: jax.Array            # (F, H) NADE decode weights
    bv: jax.Array           # (F,)
    bh: jax.Array           # (H,)
    wuv: jax.Array          # (U, F)
    wuh: jax.Array          # (U, H)
    cfg: DecoderConfig = struct.field(pytree_node=False)


@struct.dataclass
class State:
    cell: object
    v_prev: jax.Array


def init(key: jax.Array, cfg: DecoderConfig) -> Params:
    kc, kw, kv, kuv, kuh = jax.random.split(key, 5)
    f, h, u = cfg.n_visible, cfg.n_hidden, cfg.n_rnn
    return Params(
        cell=rnn_nn.stacked_init(cfg.cell, kc, f + cfg.n_ctx, u,
                                 cfg.rnn_layers, w_std=cfg.w_std),
        w=cfg.w_std * jax.random.normal(kw, (f, h)),
        v=cfg.w_std * jax.random.normal(kv, (f, h)),
        bv=jnp.zeros((f,)),
        bh=jnp.zeros((h,)),
        wuv=cfg.w_std * jax.random.normal(kuv, (u, f)),
        wuh=cfg.w_std * jax.random.normal(kuh, (u, h)),
        cfg=cfg,
    )


def init_state(params: Params, batch_shape: Tuple[int, ...]) -> State:
    return base.init_recurrent_state(State, params.cfg, batch_shape)


# shared plumbing (models/base.py) — one definition for both decoders
_scan_states = base.scan_states
_biases = base.conditioned_biases


def _nll(params: Params, x: jax.Array, ctx: Optional[jax.Array],
         m_tm: Optional[jax.Array] = None, seq=None, need_logits=False):
    """Mean per-frame negative log-likelihood. x: (B, T, F); m_tm: optional
    time-major frame mask (T, B). ``need_logits=True`` (the detailed-metrics
    path) evaluates the per-dim conditional logits ONCE and derives the NLL
    from their Bernoulli cross-entropy — identical math to nade_log_prob
    (which computes exactly those logits internally), but the logits are
    reusable for metrics without a second grid/kernel pass."""
    x_tm = jnp.swapaxes(x, 0, 1)
    ctx_tm = None if ctx is None else jnp.swapaxes(ctx, 0, 1)
    state = init_state(params, x.shape[:1])
    _, u_prev = _scan_states(params, state, rnn_input(x_tm, ctx_tm), seq)
    bv_t, bh_t = _biases(params, u_prev)
    if need_logits:
        logits = nade_ops.nade_conditionals_logits(
            x_tm, params.w, params.v, bv_t, bh_t)
        ll = nade_nn.bernoulli_ll(logits, x_tm).sum(-1)
    else:
        logits = None
        ll = nade_ops.nade_log_prob(x_tm, params.w, params.v, bv_t, bh_t)
    if m_tm is None:
        return -jnp.mean(ll), (x_tm, logits)
    nll = -jnp.sum(ll * m_tm) / jnp.maximum(jnp.sum(m_tm), 1.0)
    return nll, (x_tm, logits)


def loss(params: Params, key: jax.Array, x: jax.Array,
         ctx: Optional[jax.Array] = None, detailed: bool = True,
         frame_mask: Optional[jax.Array] = None, seq=None):
    """Exact NLL loss. ``key`` is unused (kept for the decoder contract).
    Returns (scalar_loss, metrics). ``detailed=False`` skips the extra
    conditional-probability pass used for frame metrics (trainer hot path).
    ``frame_mask`` (B, T) excludes padded frames (eval integrity).
    ``seq`` (parallel.seqpipe.SeqSpec): time-sharded pipelined recurrence."""
    del key
    m_tm = (None if frame_mask is None
            else jnp.swapaxes(frame_mask, 0, 1).astype(jnp.float32))
    nll, (x_tm, logits) = _nll(params, x, ctx, m_tm, seq,
                               need_logits=detailed)
    if not detailed:
        return nll, {"loss": nll}
    # teacher-forced conditional probabilities for frame metrics (the same
    # logits the NLL above was derived from — one pass, stop-gradient here)
    probs = jax.nn.sigmoid(jax.lax.stop_gradient(logits))
    metrics = frame_metrics(probs, x_tm, mask=m_tm)
    metrics["nll"] = nll
    metrics["loss"] = nll
    return nll, metrics


def conditional_logits(params: Params, x: jax.Array,
                       ctx: Optional[jax.Array] = None,
                       seq=None) -> jax.Array:
    """Teacher-forced per-dim conditional logits, time-major (T, B, F).

    This is the Gauss-Newton linearization point for the Hessian-free
    optimizer (training/hf.py): the exact NLL equals the Bernoulli
    cross-entropy of these logits against the (teacher-forced) features,
    so GGN·v = Jᵀ diag(σ'(l)) J v with J = ∂logits/∂params."""
    x_tm = jnp.swapaxes(x, 0, 1)
    ctx_tm = None if ctx is None else jnp.swapaxes(ctx, 0, 1)
    state = init_state(params, x.shape[:1])
    _, u_prev = _scan_states(params, state, rnn_input(x_tm, ctx_tm), seq)
    bv_t, bh_t = _biases(params, u_prev)
    return nade_nn.conditionals_logits(x_tm, params.w, params.v, bv_t, bh_t,
                                       form=nade_ops.default_ll_form())


def log_likelihood(params: Params, key: jax.Array, x: jax.Array,
                   ctx: Optional[jax.Array] = None,
                   frame_mask: Optional[jax.Array] = None,
                   seq=None) -> jax.Array:
    """EXACT per-sequence log-likelihood (B,), summed over (real, local
    under ``seq``) time frames — the paper's Table-1 quantity (reported per
    frame upstream)."""
    del key
    x_tm = jnp.swapaxes(x, 0, 1)
    ctx_tm = None if ctx is None else jnp.swapaxes(ctx, 0, 1)
    state = init_state(params, x.shape[:1])
    _, u_prev = _scan_states(params, state, rnn_input(x_tm, ctx_tm), seq)
    bv_t, bh_t = _biases(params, u_prev)
    ll = nade_ops.nade_log_prob(x_tm, params.w, params.v, bv_t, bh_t)
    if frame_mask is not None:
        ll = ll * jnp.swapaxes(frame_mask, 0, 1).astype(ll.dtype)
    return jnp.sum(ll, axis=0)


# alias so trainer can treat decoders uniformly
log_likelihood_proxy = log_likelihood


def prime(params: Params, state: State, x: jax.Array,
          ctx: Optional[jax.Array] = None) -> State:
    """Advance the RNN state over a seed sequence x: (B, T, F)."""
    return base.prime_state(State, params, state, x, ctx)


def tempered_params(params: Params, temperature: float) -> Params:
    """EXACT per-conditional sampling temperature as a parameter transform:
    each ancestral conditional is p(v_i|v_<i) = σ(bv_i(t) + V_i·h_i) with
    h_i = σ(bh(t) + Σ_{j<i} W_j v_j); scaling {v, bv, wuv} by 1/T scales
    exactly that output logit (h_i is untouched — it depends only on
    w/bh/wuh), giving σ(logit/T), the standard autoregressive temperature.
    Because it lives in the params, the lax.scan sweep, the per-step Pallas
    sweep and the speculative whole-generation kernel are all tempered
    identically with zero kernel changes. Unlike the RBM transform this
    tempers each CONDITIONAL, not the joint (the AR convention).
    ``temperature`` must be a static Python float; T=1 returns ``params``
    unchanged (bit-exact default)."""
    if temperature == 1.0:
        return params
    if temperature <= 0.0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    b = 1.0 / temperature
    return params.replace(v=params.v * b, bv=params.bv * b,
                          wuv=params.wuv * b)


def sample_frame(params: Params, key: jax.Array, state: State,
                 k: Optional[int] = None) -> jax.Array:
    """Ancestral NADE sample at biases from u(t-1) WITHOUT advancing the
    state (the frame conditional depends only on u(t-1); any cross-track
    ctx conditions the RNN advance, not this conditional). ``k`` is
    ignored (NADE sampling is exact)."""
    del k
    u_prev = rnn_nn.state_h(state.cell[-1])
    bv_t, bh_t = _biases(params, u_prev)
    return nade_ops.nade_sample(key, params.w, params.v, bv_t, bh_t,
                                batch_shape=u_prev.shape[:-1])


def forced_step(params: Params, state: State, v: jax.Array,
                ctx: Optional[jax.Array] = None) -> State:
    """Advance the cell one step with a GIVEN frame (teacher-forced)."""
    return base.forced_step(State, params, state, v, ctx)


def sample_step(params: Params, key: jax.Array, state: State,
                ctx: Optional[jax.Array] = None,
                k: Optional[int] = None) -> Tuple[State, jax.Array]:
    """One generation step: ancestral NADE sample at biases from u(t-1),
    then advance the cell. ctx: (..., C) for this step."""
    v = sample_frame(params, key, state, k=k)
    return forced_step(params, state, v, ctx), v


def generate(params: Params, key: jax.Array, state: State, n_steps: int,
             ctx: Optional[jax.Array] = None,
             k: Optional[int] = None) -> Tuple[State, jax.Array]:
    """Autoregressive generation as ONE lax.scan program. ctx: optional
    (B, n_steps, C) precomputed per-step context (the feedback architecture
    drives sample_step itself instead). Returns (state, v (B, n_steps, F))."""
    return base.generate_scan(sample_step, params, key, state, n_steps,
                              ctx, k)
