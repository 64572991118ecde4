"""Sequence (time-axis) parallelism for teacher-forced training — the
SURVEY §2.2 SP/CP row, built for the one place it applies in this model
family (no attention anywhere, so ring-attention/Ulysses have no counterpart;
what CAN shard is the teacher-forced RNN recurrence over the window axis).

Design (the "carried-state handoff" slot of SURVEY §2.2/§5.7, implemented):

  * The training window T is chunked over the mesh axis ``seq``: device s
    holds frames [s·T/S, (s+1)·T/S). Everything per-frame — encoding, the
    conditioned biases, CD free energies, the NADE exclusive-cumsum
    likelihood, metrics — is embarrassingly parallel over time and stays
    local. The ONLY sequential object is the RNN carry, a single O(U) state
    vector per sequence (the halo is tiny — this is why time-sharding an RNN
    is cheap where attention needs ring schedules).
  * The carry crosses chunk boundaries via ``lax.ppermute`` (s -> s+1).
    A naive handoff would serialize the devices, so the local batch is split
    into M microbatches and the chunks run as a GPipe-style pipeline: at
    stage j, device s scans microbatch j-s through its chunk and hands the
    final state to device s+1. All devices are busy in steady state;
    efficiency = S·M / (S+M-1) of ideal (→ S-fold speedup for M >> S).
  * The backward pass needs no extra machinery: ``ppermute`` is linear, so
    autodiff reverses the pipeline automatically (cotangents flow s+1 -> s
    in reverse stage order).
  * The feedback architecture's cross-track context is a time-shift of
    per-frame latents, so its chunk-boundary halo is ONE frame of latents,
    exchanged once per step (``shift_right_seq``) — not per stage.

Exactness: with full (unmasked) training windows every device holds the same
frame count, so pmean over (data, seq) of per-shard means equals the global
mean, and gradients match the single-device step up to float reduction order
(equality-tested in tests/test_parallel.py). Generation is inherently
sequential over time and stays unsharded over ``seq`` (SURVEY §2.2).

Used by Trainer under ``mesh.style="seqpipe"`` (shard_map over (data, seq));
plumbed into the decoders through ``models/base.scan_states(seq=...)``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SeqSpec:
    """Static description of the time-sharded execution context.

    axis: mesh axis name the time chunks live on.
    n_seq: number of chunks S (mesh axis size).
    microbatches: pipeline depth M; must divide the device-local batch.
    """

    axis: str
    n_seq: int
    microbatches: int


def auto_microbatches(b_local: int, n_seq: int, requested: int = 0) -> int:
    """Pick the pipeline depth M: the largest divisor of the device-local
    batch ≤ the target. Larger M → better pipeline efficiency (S·M/(S+M-1))
    but smaller per-stage matmuls; the default target 2·S is past the knee
    of the efficiency curve (≥ 2/3 of ideal) while keeping microbatches fat.
    ``requested`` (mesh.seq_microbatches) overrides the target — it is a
    CAP, not an exact value, so short (padded) eval-tail batches still get a
    valid depth."""
    target = requested if requested else max(1, min(b_local, 2 * n_seq))
    for m in range(min(target, b_local), 0, -1):
        if b_local % m == 0:
            return m
    return 1


def shift_right_seq(lat: jax.Array, spec: SeqSpec) -> jax.Array:
    """ctx(t) = lat(t-1) across chunk boundaries (the feedback architecture's
    one-frame halo). lat: (B, T_local, C) batch-major local chunk; device s
    receives the last frame of device s-1's chunk (zeros into device 0 — the
    t=0 convention of multinn._feedback_ctx)."""
    perm = [(i, i + 1) for i in range(spec.n_seq - 1)]
    incoming = jax.lax.ppermute(lat[:, -1], spec.axis, perm)
    return jnp.concatenate([incoming[:, None], lat[:, :-1]], axis=1)


def scan_states_pipelined(params, x_tm: jax.Array, spec: SeqSpec):
    """Time-sharded drop-in for ``models/base.scan_states`` inside a
    shard_map over ``spec.axis``.

    ALWAYS starts from the zero RNN state (rebuilt here at microbatch
    size) — there is deliberately no initial-state parameter: teacher-forced
    training windows are stateless (truncated BPTT, SURVEY §5.7), and a
    primed state cannot be threaded through the pipeline (microbatch j's
    state would have to enter at device 0 mid-schedule). Priming and
    generation run unsharded over time (models/base.prime_state).

    x_tm: (T_local, B_local, I) — this device's time chunk of the whole
    window (time-major). Returns ``(None, u_prev)`` with u_prev[t] = the
    top-layer hidden state BEFORE consuming x[t] (u(t-1) conditioning,
    arXiv:1206.6392 §2.3), u_prev: (T_local, B_local, U). The final cell
    state is not materialized (teacher-forced losses never use it).
    """
    from multinn_tpu.nn import rnn as rnn_nn

    cfg = params.cfg
    t_loc, b_loc = x_tm.shape[0], x_tm.shape[1]
    m = spec.microbatches
    if b_loc % m:
        raise ValueError(f"microbatches={m} does not divide local batch "
                         f"{b_loc}")
    mb = b_loc // m
    s = spec.n_seq
    idx = jax.lax.axis_index(spec.axis)
    perm = [(i, i + 1) for i in range(s - 1)]

    # (T_loc, B_loc, I) -> (M, T_loc, mb, I): contiguous microbatch split
    xs_mb = jnp.moveaxis(x_tm.reshape(t_loc, m, mb, x_tm.shape[-1]), 1, 0)
    state0 = rnn_nn.stacked_zero_state(cfg.cell, (mb,), cfg.n_rnn,
                                       cfg.rnn_layers)
    # incoming-carry shape == state0 shape; device 0 always overrides with
    # state0 so the zeros ppermute feeds into device 0 are never consumed
    bufs0 = jnp.zeros((m, t_loc, mb, cfg.n_rnn), x_tm.dtype)

    def stage(carry, j):
        state_in, bufs = carry
        q = j - idx                       # microbatch this device works on
        valid = jnp.logical_and(q >= 0, q < m)
        qc = jnp.clip(q, 0, m - 1)
        x_q = jax.lax.dynamic_index_in_dim(xs_mb, qc, axis=0,
                                           keepdims=False)  # (T_loc, mb, I)
        state_use = jax.tree.map(
            lambda z, si: jnp.where(idx == 0, z, si), state0, state_in)
        final, us = rnn_nn.stacked_scan(cfg.cell, params.cell, state_use,
                                        x_q, remat=cfg.remat)
        u0 = rnn_nn.state_h(state_use[-1])
        u_prev = jnp.concatenate([u0[None], us[:-1]], axis=0)
        u_prev = jnp.where(valid, u_prev, jnp.zeros_like(u_prev))
        onehot = jax.nn.one_hot(qc, m, dtype=bufs.dtype) * valid
        bufs = bufs + onehot[:, None, None, None] * u_prev[None]
        state_out = jax.tree.map(
            lambda a: jax.lax.ppermute(a, spec.axis, perm), final)
        return (state_out, bufs), None

    (_, bufs), _ = jax.lax.scan(stage, (state0, bufs0),
                                jnp.arange(s + m - 1))
    # (M, T_loc, mb, U) -> (T_loc, B_local, U)
    u_prev = jnp.moveaxis(bufs, 0, 1).reshape(t_loc, b_loc, -1)
    return None, u_prev
