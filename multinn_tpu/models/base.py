"""Decoder/Encoder contracts (SURVEY C9, C10-base).

A decoder is a *module* (functional style — a namespace of pure functions plus
a params pytree), with this uniform surface (reference counterpart:
``modules/decoders/decoder.py`` Decoder ABC [K]):

    init(key, cfg: DecoderConfig) -> Params
    loss(params, key, x, ctx=None) -> (scalar_loss, metrics: dict)
        x: (B, T, F) features, teacher-forced — binary pianoroll frames
           or [0,1] mean-field DBN features (free energy and the NADE
           likelihood are well-defined on either).
        ctx: optional (B, T, C) extra conditioning (feedback architecture).
    init_state(params, batch_shape) -> State
    prime(params, state, x, ctx=None) -> State        # advance over seed
    sample_step(params, key, state, ctx=None, k=None) -> (State, v: (..., F))
    generate(params, key, state, n_steps, ctx=None, k=None)
        -> (State, v_seq: (B, n_steps, F))   # ONE jitted lax.scan program

All decoders model binary feature vectors; the RNN state is carried explicitly
so the generator (C14) and the feedback architecture (C12b) can thread it.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Shared decoder hyperparameters (SURVEY C7/C8 key knobs).

    n_visible: feature dim F the decoder models (88/128 pitches, or encoder
        latent width).
    n_hidden: RBM/NADE hidden units H.
    n_rnn: RNN hidden size U (per layer).
    n_ctx: width of the optional conditioning context appended to the RNN
        input (0 = none; feedback architecture sets this).
    cell: 'lstm' (MultINN default) or 'vanilla' (the 2012 paper's RNN).
    cd_k: Gibbs sweeps for CD-k training (RBM only).
    gen_k: Gibbs sweeps at generation time (RBM only; more sweeps = better
        mixing, still cheap because the whole chain is on-chip).
    """

    n_visible: int
    n_hidden: int = 150
    n_rnn: int = 100
    n_ctx: int = 0
    cell: str = "lstm"
    rnn_layers: int = 1
    cd_k: int = 1
    gen_k: int = 10
    w_std: float = 0.01
    remat: bool = False      # jax.checkpoint the time scan (SURVEY §5.7)


def get_decoder(name: str):
    """Decoder registry: name -> module implementing the contract above."""
    from multinn_tpu.models import rnn_rbm, rnn_nade
    registry = {
        "rnn-rbm": rnn_rbm,
        "rnn-nade": rnn_nade,
        "rnnrbm": rnn_rbm,
        "rnnnade": rnn_nade,
    }
    key = name.lower().replace("_", "-")
    if key not in registry:
        raise ValueError(
            f"Unknown decoder '{name}'; available: rnn-rbm, rnn-nade")
    return registry[key]


def rnn_input(x: jax.Array, ctx: Optional[jax.Array]) -> jax.Array:
    """Concatenate visible features with optional conditioning context."""
    if ctx is None:
        return x
    import jax.numpy as jnp
    return jnp.concatenate([x, ctx], axis=-1)


# ---------------------------------------------------------------------------
# Shared recurrent plumbing (used verbatim by BOTH decoder families — a
# divergence here would silently split their conditioning semantics).
# Decoder Params expose .cell/.bv/.bh/.wuv/.wuh; States expose .cell/.v_prev.
# ---------------------------------------------------------------------------

def init_recurrent_state(state_cls, cfg: DecoderConfig, batch_shape):
    import jax.numpy as jnp
    from multinn_tpu.nn import rnn as rnn_nn
    return state_cls(
        cell=rnn_nn.stacked_zero_state(cfg.cell, batch_shape,
                                       cfg.n_rnn, cfg.rnn_layers),
        v_prev=jnp.zeros((*batch_shape, cfg.n_visible)))


def scan_states(params, state, x_tm: jax.Array, seq=None):
    """Run the cell stack over time-major inputs; return (final_cell_state,
    u_prev) where u_prev[t] = TOP-layer hidden state BEFORE consuming x[t]
    (bias conditioning uses u(t-1) per arXiv:1206.6392 §2.3).

    ``seq`` (a parallel.seqpipe.SeqSpec) switches to the time-sharded
    pipelined recurrence: x_tm is then this device's chunk of the window and
    the carry crosses chunk boundaries via ppermute (final state not
    materialized — returns (None, u_prev)). The seqpipe path IGNORES
    ``state`` and always starts from zeros (training windows are stateless
    truncated BPTT; a primed state cannot enter a pipeline mid-schedule) —
    callers with a non-fresh state must not pass ``seq``."""
    import jax.numpy as jnp
    from multinn_tpu.nn import rnn as rnn_nn
    if seq is not None:
        from multinn_tpu.parallel import seqpipe
        return seqpipe.scan_states_pipelined(params, x_tm, seq)
    cfg = params.cfg
    final, us = rnn_nn.stacked_scan(cfg.cell, params.cell, state.cell,
                                    x_tm, remat=cfg.remat)
    u0 = rnn_nn.state_h(state.cell[-1])
    u_prev = jnp.concatenate([u0[None], us[:-1]], axis=0)   # (T, B, U)
    return final, u_prev


def conditioned_biases(params, u_prev: jax.Array):
    """bv(t) = bv + u(t-1) @ Wuv;  bh(t) = bh + u(t-1) @ Wuh."""
    from multinn_tpu.ops import precision
    return (params.bv + precision.mm(u_prev, params.wuv),
            params.bh + precision.mm(u_prev, params.wuh))


def prime_state(state_cls, params, state, x: jax.Array,
                ctx: Optional[jax.Array] = None):
    """Advance the RNN state over a seed sequence x: (B, T, F)."""
    import jax.numpy as jnp
    from multinn_tpu.nn import rnn as rnn_nn
    cfg = params.cfg
    x_tm = jnp.swapaxes(x, 0, 1)
    ctx_tm = None if ctx is None else jnp.swapaxes(ctx, 0, 1)
    final, _ = rnn_nn.stacked_scan(cfg.cell, params.cell, state.cell,
                                   rnn_input(x_tm, ctx_tm),
                                   remat=cfg.remat)
    return state_cls(cell=final, v_prev=x[:, -1, :])


def forced_step(state_cls, params, state, v: jax.Array,
                ctx: Optional[jax.Array] = None):
    """Advance the RNN state ONE step with a GIVEN frame v (..., F) —
    teacher-forcing a single generation step (sample_step = sample_frame +
    forced_step; the accompaniment path feeds conditioned tracks' given
    frames through here instead of sampled ones)."""
    from multinn_tpu.nn import rnn as rnn_nn
    cfg = params.cfg
    new_cell = rnn_nn.stacked_step(cfg.cell, params.cell, state.cell,
                                   rnn_input(v, ctx))
    return state_cls(cell=new_cell, v_prev=v)


def generate_scan(sample_step_fn, params, key, state, n_steps: int,
                  ctx: Optional[jax.Array] = None, k: Optional[int] = None):
    """Autoregressive generation as ONE lax.scan program over
    ``sample_step_fn(params, key, state, ctx, k)``."""
    import jax
    import jax.numpy as jnp
    keys = jax.random.split(key, n_steps)
    ctx_tm = None if ctx is None else jnp.swapaxes(ctx, 0, 1)

    def body(st, inp):
        if ctx_tm is None:
            st, v = sample_step_fn(params, inp, st, None, k)
        else:
            kk, c = inp
            st, v = sample_step_fn(params, kk, st, c, k)
        return st, v

    xs = keys if ctx_tm is None else (keys, ctx_tm)
    final, vs = jax.lax.scan(body, state, xs)
    return final, jnp.swapaxes(vs, 0, 1)
