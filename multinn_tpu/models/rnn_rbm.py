"""RNN-RBM decoder (SURVEY C7; math: arXiv:1206.6392 §2.3, reference
counterpart ``modules/decoders/rnn_rbm.py`` [K] — MultINN uses LSTM cells in
place of the paper's vanilla RNN, both supported via DecoderConfig.cell).

Model: an RBM over each frame v(t) whose biases are conditioned on the hidden
state of a deterministic RNN that consumed frames < t:

    bh(t) = bh + u(t-1) @ Wuh          bv(t) = bv + u(t-1) @ Wuv
    u(t)  = Cell(u(t-1), [v(t); ctx(t)])

TPU-first training: the RNN runs once as a time-major lax.scan (teacher
forcing), producing ALL conditioned biases in two batched MXU matmuls; the
CD-k Gibbs chains of every (batch, time) position are then independent and run
as ONE batched chain over (T, B, D) — k sequential sweeps total for the whole
batch instead of the reference's per-step tf.while_loop chains.

Generation is a single jitted lax.scan over time: each step runs the Gibbs
chain at that step's biases starting from the previous frame, then advances
the cell — no host round-trips (SURVEY call stack 3.2's latency fix).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from flax import struct

from multinn_tpu.models import base
from multinn_tpu.models.base import DecoderConfig, rnn_input
from multinn_tpu.nn import rbm as rbm_nn
from multinn_tpu.nn import rnn as rnn_nn
from multinn_tpu.ops import gibbs as gibbs_ops
from multinn_tpu.training.metrics import frame_metrics, binary_cross_entropy


@struct.dataclass
class Params:
    cell: object            # rnn_nn.LSTMParams | VanillaRNNParams
    w: jax.Array            # (F, H) RBM weights
    bv: jax.Array           # (F,)
    bh: jax.Array           # (H,)
    wuv: jax.Array          # (U, F) state -> visible-bias conditioning
    wuh: jax.Array          # (U, H) state -> hidden-bias conditioning
    cfg: DecoderConfig = struct.field(pytree_node=False)


@struct.dataclass
class State:
    """Carried generation/priming state: RNN state + previous frame."""
    cell: object
    v_prev: jax.Array       # (..., F)


def init(key: jax.Array, cfg: DecoderConfig) -> Params:
    kc, kw, kuv, kuh = jax.random.split(key, 4)
    f, h, u = cfg.n_visible, cfg.n_hidden, cfg.n_rnn
    return Params(
        cell=rnn_nn.stacked_init(cfg.cell, kc, f + cfg.n_ctx, u,
                                 cfg.rnn_layers, w_std=cfg.w_std),
        w=cfg.w_std * jax.random.normal(kw, (f, h)),
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


def loss(params: Params, key: jax.Array, x: jax.Array,
         ctx: Optional[jax.Array] = None, detailed: bool = True,
         frame_mask: Optional[jax.Array] = None, seq=None):
    """CD-k loss, teacher forced. x: (B, T, F); ctx: (B, T, C) or None.

    Returns (scalar_loss, metrics). Gradients flow into the RNN through the
    conditioned biases of BOTH free-energy terms; never through the chain.

    ``detailed=False`` skips the monitoring extras (mean-field reconstruction
    pass, PLL, frame metrics) — the trainer's hot path uses it and computes
    full metrics only on logging steps.

    ``seq`` (parallel.seqpipe.SeqSpec): x/ctx are this device's time chunk;
    the recurrence runs pipelined across the seq mesh axis, everything else
    (biases, CD, metrics) is per-frame local.
    """
    cfg = params.cfg
    x_tm = jnp.swapaxes(x, 0, 1)                      # (T, B, F)
    ctx_tm = None if ctx is None else jnp.swapaxes(ctx, 0, 1)
    state = init_state(params, x.shape[:1])
    _, u_prev = _scan_states(params, state, rnn_input(x_tm, ctx_tm), seq)
    bv_t, bh_t = _biases(params, u_prev)              # (T, B, F/H)

    k1, k2, k3 = jax.random.split(key, 3)
    m_tm = (None if frame_mask is None
            else jnp.swapaxes(frame_mask, 0, 1).astype(jnp.float32))

    if m_tm is None:
        cd = gibbs_ops.cd_loss(k1, x_tm, params.w, bv_t, bh_t, k=cfg.cd_k)
    else:
        # masked CD: weighted mean of the per-position free-energy diffs
        # (padded frames excluded — SURVEY §4 eval-integrity)
        vk = jax.lax.stop_gradient(gibbs_ops.gibbs_chain(
            k1, x_tm, params.w, bv_t, bh_t, k=cfg.cd_k))
        diffs = (rbm_nn.free_energy(x_tm, params.w, bv_t, bh_t)
                 - rbm_nn.free_energy(vk, params.w, bv_t, bh_t))   # (T, B)
        cd = jnp.sum(diffs * m_tm) / jnp.maximum(jnp.sum(m_tm), 1.0)
    if not detailed:
        return cd, {"loss": cd}

    # Monitoring: mean-field reconstruction + transduction frame metrics.
    recon = rbm_nn.reconstruction(k2, x_tm, params.w, bv_t, bh_t, k=cfg.cd_k)
    recon = jax.lax.stop_gradient(recon)
    metrics = frame_metrics(recon, x_tm, mask=m_tm)
    metrics["bce_recon"] = binary_cross_entropy(recon, x_tm, mask=m_tm)
    fe = rbm_nn.free_energy(x_tm, params.w, bv_t, bh_t)
    pll = jax.lax.stop_gradient(
        rbm_nn.pseudo_log_likelihood(k3, x_tm, params.w, bv_t, bh_t))
    if m_tm is None:
        metrics["free_energy"] = jnp.mean(fe)
        metrics["pll"] = jnp.mean(pll)
    else:
        denom = jnp.maximum(jnp.sum(m_tm), 1.0)
        metrics["free_energy"] = jnp.sum(fe * m_tm) / denom
        metrics["pll"] = jnp.sum(pll * m_tm) / denom
    metrics["loss"] = cd
    return cd, metrics


def log_likelihood_proxy(params: Params, key: jax.Array, x: jax.Array,
                         ctx: Optional[jax.Array] = None,
                         frame_mask: Optional[jax.Array] = None,
                         seq=None) -> jax.Array:
    """Per-sequence pseudo-LL (RBM LL is intractable; PLL is the eval proxy).
    Returns (B,) summed over (real, local under ``seq``) time frames."""
    x_tm = jnp.swapaxes(x, 0, 1)
    ctx_tm = None if ctx is None else jnp.swapaxes(ctx, 0, 1)
    state = init_state(params, x.shape[:1])
    _, u_prev = _scan_states(params, state, rnn_input(x_tm, ctx_tm), seq)
    bv_t, bh_t = _biases(params, u_prev)
    pll = rbm_nn.pseudo_log_likelihood(key, x_tm, params.w, bv_t, bh_t)
    if frame_mask is not None:
        pll = pll * jnp.swapaxes(frame_mask, 0, 1).astype(pll.dtype)
    return jnp.sum(pll, axis=0)


def prime(params: Params, state: State, x: jax.Array,
          ctx: Optional[jax.Array] = None) -> State:
    """Advance the RNN state over a seed sequence x: (B, T, F)."""
    return base.prime_state(State, params, state, x, ctx)


def tempered_params(params: Params, temperature: float) -> Params:
    """EXACT sampling temperature as a parameter transform: scaling
    {w, bv, bh, wuv, wuh} by β = 1/T makes every Gibbs conditional
    σ(β·logit), i.e. the chain samples the inverse-temperature-β joint
    p_β(v,h) ∝ exp(−β·E(v,h)) — including the RNN-conditioned biases, since
    bv(t) = β·bv + u·(β·wuv) = β·bv(t). The RNN cell itself is untouched
    (it conditions, it does not sample). Because temperature lives in the
    params, EVERY sampling path — lax.scan, the per-step Pallas chain and
    the whole-generation fused kernel — is tempered identically with zero
    kernel changes. ``temperature`` must be a static Python float; T=1
    returns ``params`` unchanged (bit-exact default)."""
    if temperature == 1.0:
        return params
    if temperature <= 0.0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    b = 1.0 / temperature
    return params.replace(w=params.w * b, bv=params.bv * b,
                          bh=params.bh * b, wuv=params.wuv * b,
                          wuh=params.wuh * b)


def sample_frame(params: Params, key: jax.Array, state: State,
                 k: Optional[int] = None) -> jax.Array:
    """Gibbs-sample v(t) at biases from u(t-1), chain initialized at v(t-1)
    (paper §2.3), WITHOUT advancing the state (the frame conditional
    depends only on u(t-1) and v(t-1); any cross-track ctx conditions the
    RNN advance, not this conditional)."""
    cfg = params.cfg
    k = cfg.gen_k if k is None else k
    u_prev = rnn_nn.state_h(state.cell[-1])
    bv_t, bh_t = _biases(params, u_prev)
    return gibbs_ops.gibbs_chain(key, state.v_prev, params.w, bv_t, bh_t,
                                 k=k)


def forced_step(params: Params, state: State, v: jax.Array,
                ctx: Optional[jax.Array] = None) -> State:
    """Advance the cell one step with a GIVEN frame (teacher-forced)."""
    return base.forced_step(State, params, state, v, ctx)


def sample_step(params: Params, key: jax.Array, state: State,
                ctx: Optional[jax.Array] = None,
                k: Optional[int] = None) -> Tuple[State, jax.Array]:
    """One generation step: Gibbs-sample v(t) at biases from u(t-1), chain
    initialized at v(t-1) (paper §2.3 sampling procedure), then advance the
    cell. ctx: (..., C) for this step."""
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
