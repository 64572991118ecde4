"""Whole-generation fused Pallas kernels for MultINN (SURVEY hard parts
#1/#4 taken to their limit): the ENTIRE autoregressive loop — per-track bias
conditioning, the sampling inner loop (k-sweep Gibbs chain for RNN-RBM /
per-dimension conditional sweep for RNN-NADE), the cross-track feedback
context and the LSTM state advance for ALL tracks and ALL T steps — runs as
ONE device kernel with every weight and the full carried state resident in
VMEM. Measured on v5e: 64-bar 5-track generation 37 ms (RBM, 2.2x over the
scan path) / 60 ms (NADE, 3.1x).

Why: generation latency is not FLOP-bound (per-step matmuls are (1,·)·(·,·)
vectors) — it is op-dispatch/HBM-latency bound in the lax.scan formulation
(~69 µs/step measured). Fusing the loop removes all per-step HBM traffic and
op overheads.

Scope (auto-dispatch gate in models/multinn.py): batch=1, pass-through
encoder, single-layer LSTM, rnn-rbm decoder, per-track or feedback mode.
Everything else falls back to the scan path — same distribution, different
RNG stream (ops/sampling.py contract).

Weight layout: per-track stacks flattened to 2D so every per-track slice is a
static sublane-range read (k is a Python-loop constant -> fully unrolled):
    w_all   (K*D, H)    RBM weights        wuv_all (K*U, D)
    wuh_all (K*U, H)    wx_all  (K*(D+C), 4U)    wh_all (K*U, 4U)
VMEM budget at flagship size (K=5, D=84, H=150, U=100, C=420): ~5.5 MB.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multinn_tpu.ops import kernel_prng
from multinn_tpu.ops.sampling import key_to_seeds

_MAX_VMEM_BYTES = 10 * 1024 * 1024


def supported(cfg, batch: int, n_steps: int = 2048,
              gen_k: int = None) -> bool:
    """Gate for the auto-dispatch (see module docstring). The (n_steps*K, D)
    roll output and the per-step (K*gen_k, H/D) RNG buffers are VMEM-resident
    for the whole kernel, so n_steps and gen_k are part of the budget —
    over-budget requests fall back to the scan path instead of failing at
    Mosaic compile time."""
    if (batch != 1 or cfg.decoder_type != "rnn-rbm"
            or cfg.encoder_hidden or cfg.cell != "lstm"
            or cfg.rnn_layers != 1 or cfg.mode == "joint"):
        return False
    k, d, h, u = cfg.n_tracks, cfg.n_pitches, cfg.n_hidden, cfg.n_rnn
    c = cfg.ctx_dim()
    gk = cfg.gen_k if gen_k is None else gen_k
    vmem = 4 * (k * d * h + k * u * d + k * u * h
                + k * (d + c) * 4 * u + k * u * 4 * u
                + n_steps * k * d                    # roll output
                + k * gk * (h + d))                  # per-step RNG buffers
    return vmem <= _MAX_VMEM_BYTES


def _rbm_kernel(seed_ref, wb_ref, wbt_ref, wuvb_ref, wuhb_ref,
                bv_ref, bh_ref, wxv_ref, wh_ref, wctx_ref, b_ref,
                h0_ref, c0_ref, v0_ref,
                roll_ref, hout_ref, cout_ref,
                h_s, c_s, v_s, z_s, uh_s, uv_s, *,
                n_steps: int, n_tracks: int, d: int, hid: int, u: int,
                ctx_dim: int, gen_k: int):
    """Row-layout RBM generation: every per-track quantity lives in a
    (1, K*X) row with per-track lane blocks, so each Gibbs sweep is TWO
    block-diagonal matmuls for ALL tracks ((1,K*D)@(K*D,K*H) and its
    transpose) instead of 2K small ones — measured ~19% faster than the
    per-track-loop formulation at flagship shape."""
    kseed = seed_ref[0]
    kseed1 = seed_ref[1]                  # full 64-bit keying (ops.sampling)
    kk = n_tracks
    h_s[:] = h0_ref[:]                    # (1, K*U)
    c_s[:] = c0_ref[:]
    v_s[:] = v0_ref[:]                    # (1, K*D)

    def step(t, _):
        h_row = h_s[:]
        v_prev = v_s[:]                   # ctx(t) = latents(t-1) [training
        #                                   parity; at t=0 the primed v_prev]

        # conditioned biases for all tracks: two block-diagonal matmuls
        bv_row = bv_ref[:] + jnp.dot(h_row, wuvb_ref[:],
                                     preferred_element_type=jnp.float32)
        bh_row = bh_ref[:] + jnp.dot(h_row, wuhb_ref[:],
                                     preferred_element_type=jnp.float32)

        # all of this step's randomness in two bulk threefry calls
        # (into scratch refs: dynamic per-sweep row reads need refs)
        uh_s[:] = kernel_prng.random_uniform(uh_s.shape, kseed,
                                             kseed1 + 2 * t)
        uv_s[:] = kernel_prng.random_uniform(uv_s.shape, kseed,
                                             kseed1 + 2 * t + 1)

        def sweep(s, v):
            ph = jax.nn.sigmoid(jnp.dot(
                v, wb_ref[:], preferred_element_type=jnp.float32) + bh_row)
            h = (uh_s[pl.ds(s, 1), :] < ph).astype(jnp.float32)
            pv = jax.nn.sigmoid(jnp.dot(
                h, wbt_ref[:], preferred_element_type=jnp.float32) + bv_row)
            return (uv_s[pl.ds(s, 1), :] < pv).astype(jnp.float32)

        v_new = jax.lax.fori_loop(0, gen_k, sweep, v_prev)
        v_s[:] = v_new
        roll_ref[pl.ds(t, 1), :] = v_new

        # LSTM advance: own-sample projection per track (compact wx_v) into
        # the z scratch, feedback ctx from the PREVIOUS frame in one dense
        # matmul, recurrent term per track (compact wh).
        for k in range(kk):
            z_s[:, k * 4 * u:(k + 1) * 4 * u] = (
                jnp.dot(v_new[:, k * d:(k + 1) * d],
                        wxv_ref[k * d:(k + 1) * d, :],
                        preferred_element_type=jnp.float32)
                + jnp.dot(h_row[:, k * u:(k + 1) * u],
                          wh_ref[k * u:(k + 1) * u, :],
                          preferred_element_type=jnp.float32))
        z = z_s[:] + b_ref[:]
        if ctx_dim:
            z = z + jnp.dot(v_prev, wctx_ref[:],
                            preferred_element_type=jnp.float32)
        for k in range(kk):
            zk = z[:, k * 4 * u:(k + 1) * 4 * u]
            i_g = jax.nn.sigmoid(zk[:, :u])
            f_g = jax.nn.sigmoid(zk[:, u:2 * u])
            g_g = jnp.tanh(zk[:, 2 * u:3 * u])
            o_g = jax.nn.sigmoid(zk[:, 3 * u:])
            c_new = f_g * c_s[:, k * u:(k + 1) * u] + i_g * g_g
            c_s[:, k * u:(k + 1) * u] = c_new
            h_s[:, k * u:(k + 1) * u] = o_g * jnp.tanh(c_new)
        return 0

    jax.lax.fori_loop(0, n_steps, step, 0)
    hout_ref[:] = h_s[:]
    cout_ref[:] = c_s[:]


@functools.partial(jax.jit,
                   static_argnames=("n_steps", "gen_k", "interpret"))
def generate_rbm(key: jax.Array, dec_params, h0, c0, v0, n_steps: int,
                 gen_k: int, interpret: bool = False
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run the fused whole-generation kernel (row layout — see _rbm_kernel).

    dec_params: track-STACKED rnn_rbm.Params (leading axis K, single-layer
    LSTM cell). h0/c0: (K, 1, U); v0: (K, 1, D) — batch must be 1.
    Returns (roll (n_steps, K, D), h_final (K, 1, U), c_final (K, 1, U)).
    """
    lstm = dec_params.cell[0]
    k, xin_dim, four_u = lstm.wx.shape
    u = four_u // 4
    d, hid = dec_params.w.shape[1], dec_params.w.shape[2]
    ctx_dim = xin_dim - d
    idx = jnp.arange(k)

    def block_diag(mat_kxy):
        """(K, X, Y) -> (K*X, K*Y) with per-track diagonal blocks."""
        _, x, y = mat_kxy.shape
        out = jnp.zeros((k, x, k, y), mat_kxy.dtype)
        out = out.at[idx, :, idx, :].set(mat_kxy)
        return out.reshape(k * x, k * y)

    wb = block_diag(dec_params.w)                           # (K*D, K*H)
    wbt = block_diag(jnp.transpose(dec_params.w, (0, 2, 1)))  # (K*H, K*D)
    wuvb = block_diag(dec_params.wuv)                       # (K*U, K*D)
    wuhb = block_diag(dec_params.wuh)                       # (K*U, K*H)
    wx_v = lstm.wx[:, :d, :].reshape(k * d, four_u)         # compact per-track
    if ctx_dim:
        # rows [j*D + i]: d z/d v_{j,i}(t-1) for all target tracks' gates
        wx_ctx = lstm.wx[:, d:, :].reshape(k, k, d, four_u)   # [k][j][i]
        wctx = jnp.transpose(wx_ctx, (1, 2, 0, 3)).reshape(k * d, k * four_u)
    else:
        wctx = jnp.zeros((k * d, k * four_u), lstm.wx.dtype)

    seed = key_to_seeds(key)
    args = (
        wb, wbt, wuvb, wuhb,
        dec_params.bv.reshape(1, k * d),
        dec_params.bh.reshape(1, k * hid),
        wx_v,
        lstm.wh.reshape(k * u, four_u),
        wctx,
        lstm.b.reshape(1, k * four_u),
        h0.reshape(1, k * u),
        c0.reshape(1, k * u),
        v0.reshape(1, k * d),
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[vmem] * len(args),
        out_specs=(vmem, vmem, vmem),
        scratch_shapes=[pltpu.VMEM((1, k * u), jnp.float32),      # h
                        pltpu.VMEM((1, k * u), jnp.float32),      # c
                        pltpu.VMEM((1, k * d), jnp.float32),      # v
                        pltpu.VMEM((1, k * four_u), jnp.float32),  # z
                        pltpu.VMEM((gen_k, k * hid), jnp.float32),  # uh
                        pltpu.VMEM((gen_k, k * d), jnp.float32)],   # uv
    )
    roll, h_out, c_out = pl.pallas_call(
        functools.partial(_rbm_kernel, n_steps=n_steps, n_tracks=k,
                          d=d, hid=hid, u=u, ctx_dim=ctx_dim, gen_k=gen_k),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_steps, k * d), jnp.float32),
                   jax.ShapeDtypeStruct((1, k * u), jnp.float32),
                   jax.ShapeDtypeStruct((1, k * u), jnp.float32)),
        interpret=(pltpu.InterpretParams() if interpret else False),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_steps * k * (
                2 * gen_k * d * hid + u * (d + hid) + (xin_dim + u) * four_u),
            bytes_accessed=4 * (n_steps * k * d),
            transcendentals=n_steps * k * (gen_k * (d + hid) + 5 * u),
        ),
    )(seed, *args)
    return (roll.reshape(n_steps, k, d),
            h_out.reshape(k, 1, u),
            c_out.reshape(k, 1, u))


# ===========================================================================
# RNN-NADE whole-generation fused kernel
# ===========================================================================
#
# The NADE per-dimension sweep is restructured so ALL K tracks advance
# together through the D dims: per-track quantities live in block layouts
# (running activation a: (1, K*H); per-dim weight rows: (K, K*H) block rows
# of a dim-major matrix), so each dim costs three small dot_generals for all
# tracks at once and no transposes/shape-casts ever happen in-kernel:
#
#   s     = Vrows_i (K,K*H) · σ(a) (1,K*H)ᵀ            -> (K,1) logits
#   x_i   = Bernoulli(σ(s + bv_dm rows))                -> (K,1)
#   a    += x_iᵀ · Wrows_i (K,K*H)                      -> (1,K*H)
#   z_acc+= x_iᵀ · Mrows_i (K,K*4U)                     -> (1,K*4U)  (LSTM
#           input projection accumulated during the sweep — the feedback
#           context never needs materializing)
#
# Block matrices are assembled once per call in XLA (wrapper below).

def supported_nade(cfg, batch: int, n_steps: int = 2048) -> bool:
    if (batch != 1 or cfg.decoder_type != "rnn-nade"
            or cfg.encoder_hidden or cfg.cell != "lstm"
            or cfg.rnn_layers != 1 or cfg.mode == "joint"):
        return False
    k, d, h, u = cfg.n_tracks, cfg.n_pitches, cfg.n_hidden, cfg.n_rnn
    if k > 8:
        return False                 # dim blocks are stride-8 padded
    kp = 8
    vmem = (2 * d * kp * k * (2 * h + 4 * u + u)      # bf16 block matrices
            + 2 * k * d * k * 4 * u                   # bf16 Wctx
            + 4 * (k * u * (h + 4 * u))               # compact wuh/wh f32
            + 4 * 3 * d * kp                          # bv'/uniform scratches
            + 4 * n_steps * k * d)                    # roll output
    return vmem <= _MAX_VMEM_BYTES


_KP = 8   # dim-block row stride: Mosaic requires dynamic sublane offsets to
          # be provably multiples of 8, so each dim's K track-rows are padded
          # to 8 (pad rows carry -inf visible bias -> always sample 0 -> their
          # contributions to every accumulation vanish)


def _nade_kernel(seed_ref, wdm_ref, vdm_ref, mdm_ref, wuvdm_ref,
                 wuh_ref, wh_ref, wctx_ref, bv_ref, bh_ref, b_ref,
                 h0_ref, c0_ref, v0_ref,
                 roll_ref, hout_ref, cout_ref,
                 h_s, c_s, v_s, bhp_s, bvp_s, u_s, zctx_s, *,
                 n_steps: int, n_tracks: int, d: int, hid: int, u: int,
                 ctx_dim: int):
    kseed = seed_ref[0]
    kseed1 = seed_ref[1]                  # full 64-bit keying (ops.sampling)
    h_s[:] = h0_ref[:]                    # (1, K*U)
    c_s[:] = c0_ref[:]
    v_s[:] = v0_ref[:]                    # (KP, D) (rows >= K are padding;
    #                                       carried for the state contract)
    kk = n_tracks

    def ctx_projection(v_rows):
        """Feedback-context contribution to every track's LSTM gates:
        Σ_j v_j @ Wctx[j-block] -> (1, K*4U). ctx(t) = latents(t-1), so this
        is computed from the PREVIOUS step's samples (training parity with
        multinn._feedback_ctx's time shift; at t=0 from the primed v_prev)."""
        z = jnp.zeros_like(b_ref[:])
        for j in range(kk):
            z = z + jnp.dot(
                v_rows[j:j + 1, :],
                wctx_ref[j * d:(j + 1) * d, :].astype(jnp.float32),
                preferred_element_type=jnp.float32)
        return z

    if ctx_dim:
        zctx_s[:] = ctx_projection(v0_ref[:])

    def step(t, _):
        h_row = h_s[:]                    # (1, K*U)

        # per-track conditioned biases -> block scratches
        for k in range(kk):
            h_k = h_row[:, k * u:(k + 1) * u]                 # (1, U)
            bhp_s[:, k * hid:(k + 1) * hid] = (
                bh_ref[k:k + 1, :] + jnp.dot(
                    h_k, wuh_ref[k * u:(k + 1) * u, :],
                    preferred_element_type=jnp.float32))
        # visible biases dim-major: (D*KP, 1) = bv_dm + Wuv_dm · h
        # (pad rows: bv_dm = -1e9, Wuv_dm = 0 -> stay -1e9)
        bvp_s[:] = bv_ref[:] + jax.lax.dot_general(
            wuvdm_ref[:].astype(jnp.float32), h_row,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # all of this step's randomness at once
        u_s[:] = kernel_prng.random_uniform(u_s.shape, kseed, kseed1 + t)

        a0 = bhp_s[:]                     # (1, K*H)
        zb = jnp.zeros_like(b_ref[:])     # (1, K*4U) input-projection acc
        vacc0 = jnp.zeros_like(v_s[:])    # (KP, D)

        def dim_body(i, carry):
            a, z_acc, v_acc = carry
            base = pl.multiple_of(i * _KP, _KP)
            h_act = jax.nn.sigmoid(a)                          # (1, K*H)
            # block matrices are stored bf16 (VMEM budget); compute in f32
            vrows = vdm_ref[pl.ds(base, _KP), :].astype(jnp.float32)
            # (KP,1)-shaped matmul results are unsupported by Mosaic here;
            # a VPU broadcast-multiply + lane reduction is equivalent
            s = jnp.sum(vrows * h_act, axis=1, keepdims=True)  # (KP, 1)
            p = jax.nn.sigmoid(s + bvp_s[pl.ds(base, _KP), :])
            x = (u_s[pl.ds(base, _KP), :] < p).astype(jnp.float32)
            wrows = wdm_ref[pl.ds(base, _KP), :].astype(jnp.float32)
            a = a + jax.lax.dot_general(
                x, wrows, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (1, K*H)
            mrows = mdm_ref[pl.ds(base, _KP), :].astype(jnp.float32)
            z_acc = z_acc + jax.lax.dot_general(
                x, mrows, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (1, K*4U)
            col = jax.lax.broadcasted_iota(jnp.int32, v_acc.shape, 1)
            v_acc = v_acc + x * (col == i).astype(jnp.float32)
            return (a, z_acc, v_acc)

        _, z_acc, v_new = jax.lax.fori_loop(0, d, dim_body, (a0, zb, vacc0))

        v_s[:] = v_new
        for k in range(kk):
            roll_ref[pl.ds(t * kk + k, 1), :] = v_new[k:k + 1, :]

        # LSTM advance: z = z_acc (own-sample input projection, accumulated
        # during the sweep) + zctx (previous step's cross-track latents)
        # + per-track h @ wh + b
        zctx = zctx_s[:] if ctx_dim else None
        for k in range(kk):
            h_k = h_row[:, k * u:(k + 1) * u]
            z = (z_acc[:, k * 4 * u:(k + 1) * 4 * u]
                 + jnp.dot(h_k, wh_ref[k * u:(k + 1) * u, :],
                           preferred_element_type=jnp.float32)
                 + b_ref[:, k * 4 * u:(k + 1) * 4 * u])        # (1, 4U)
            if ctx_dim:
                z = z + zctx[:, k * 4 * u:(k + 1) * 4 * u]
            i_g = jax.nn.sigmoid(z[:, :u])
            f_g = jax.nn.sigmoid(z[:, u:2 * u])
            g_g = jnp.tanh(z[:, 2 * u:3 * u])
            o_g = jax.nn.sigmoid(z[:, 3 * u:])
            c_new = f_g * c_s[:, k * u:(k + 1) * u] + i_g * g_g
            c_s[:, k * u:(k + 1) * u] = c_new
            h_s[:, k * u:(k + 1) * u] = o_g * jnp.tanh(c_new)
        if ctx_dim:
            zctx_s[:] = ctx_projection(v_new)
        return 0

    jax.lax.fori_loop(0, n_steps, step, 0)
    hout_ref[:] = h_s[:]
    cout_ref[:] = c_s[:]


@functools.partial(jax.jit, static_argnames=("n_steps", "interpret"))
def generate_nade(key: jax.Array, dec_params, h0, c0, v0, n_steps: int,
                  interpret: bool = False
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused whole-generation for track-stacked rnn_nade.Params (batch 1).
    h0/c0: (K, 1, U); v0: (K, 1, D).
    Returns (roll (n_steps, K, D), h_final (K,1,U), c_final (K,1,U))."""
    lstm = dec_params.cell[0]
    k, xin_dim, four_u = lstm.wx.shape
    u = four_u // 4
    d, hid = dec_params.w.shape[1], dec_params.w.shape[2]
    ctx_dim = xin_dim - d
    idx = jnp.arange(k)
    kp = _KP

    def pad_rows(blocks_dkx):
        """(D, K, X) per-dim track blocks -> (D*KP, X) stride-8-padded bf16
        (pad rows zero)."""
        ddim, _, x = blocks_dkx.shape
        out = jnp.zeros((ddim, kp, x), jnp.bfloat16)
        out = out.at[:, :k, :].set(blocks_dkx.astype(jnp.bfloat16))
        return out.reshape(ddim * kp, x)

    def diag_dm(mat_kdh):
        """(K, D, X) -> padded dim-major block rows (D*KP, K*X)."""
        ddim, x = mat_kdh.shape[1], mat_kdh.shape[2]
        out = jnp.zeros((ddim, k, k, x), mat_kdh.dtype)
        out = out.at[:, idx, idx, :].set(jnp.transpose(mat_kdh, (1, 0, 2)))
        return pad_rows(out.reshape(ddim, k, k * x))

    w_dm = diag_dm(dec_params.w)                       # (D*KP, K*H) bf16
    v_dm = diag_dm(dec_params.v)                       # (D*KP, K*H) bf16
    # Own-sample LSTM input projection, dim-major (DIAGONAL blocks only —
    # x(t) = [v_k(t); ctx(t)=latents(t-1)], so only the v_k(t) part can be
    # accumulated during the sweep; the ctx part is applied from the
    # previous step's samples via Wctx below).
    wx_v = lstm.wx[:, :d, :]                           # (K, D, 4U)
    m4 = jnp.zeros((d, k, k, four_u), lstm.wx.dtype)
    m4 = m4.at[:, idx, idx, :].add(jnp.transpose(wx_v, (1, 0, 2)))
    m_dm = pad_rows(m4.reshape(d, k, k * four_u))      # (D*KP, K*4U) bf16
    # Feedback-context projection: rows [j*D + i] map source sample v_{j,i}
    # (from step t-1) to all K target tracks' gates.
    if ctx_dim:
        wx_ctx = lstm.wx[:, d:, :].reshape(k, k, d, four_u)   # [k][j][i]
        wctx = jnp.transpose(wx_ctx, (1, 2, 0, 3)).reshape(
            k * d, k * four_u).astype(jnp.bfloat16)
    else:
        wctx = jnp.zeros((k * d, k * four_u), jnp.bfloat16)
    # visible-bias conditioning, dim-major rows: row (i*KP + j) = wuv_j[:, i]
    # placed in lane-block j  ->  (D*KP, K*U)
    wuv4 = jnp.zeros((d, k, k, u), dec_params.wuv.dtype)
    wuv4 = wuv4.at[:, idx, idx, :].set(
        jnp.transpose(dec_params.wuv, (2, 0, 1)))      # (D, K, U)
    wuv_dm = pad_rows(wuv4.reshape(d, k, k * u))
    # bv dim-major, pad rows at -1e9 so padded tracks always sample 0
    bv_full = jnp.full((d, kp), -1e9, jnp.float32)
    bv_full = bv_full.at[:, :k].set(jnp.transpose(dec_params.bv, (1, 0)))
    bv_dm = bv_full.reshape(d * kp, 1)
    v0_pad = jnp.zeros((kp, d), jnp.float32).at[:k].set(v0.reshape(k, d))

    seed = key_to_seeds(key)
    args = (
        w_dm, v_dm, m_dm, wuv_dm,
        dec_params.wuh.reshape(k * u, hid),
        lstm.wh.reshape(k * u, four_u),
        wctx,
        bv_dm,
        dec_params.bh,                                 # (K, H)
        lstm.b.reshape(1, k * four_u),
        h0.reshape(1, k * u),
        c0.reshape(1, k * u),
        v0_pad,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[vmem] * len(args),
        out_specs=(vmem, vmem, vmem),
        scratch_shapes=[pltpu.VMEM((1, k * u), jnp.float32),    # h
                        pltpu.VMEM((1, k * u), jnp.float32),    # c
                        pltpu.VMEM((kp, d), jnp.float32),       # v
                        pltpu.VMEM((1, k * hid), jnp.float32),  # bh'
                        pltpu.VMEM((d * kp, 1), jnp.float32),   # bv'
                        pltpu.VMEM((d * kp, 1), jnp.float32),   # uniforms
                        pltpu.VMEM((1, k * four_u), jnp.float32)],  # zctx
    )
    roll, h_out, c_out = pl.pallas_call(
        functools.partial(_nade_kernel, n_steps=n_steps, n_tracks=k,
                          d=d, hid=hid, u=u, ctx_dim=ctx_dim),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_steps * k, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, k * u), jnp.float32),
                   jax.ShapeDtypeStruct((1, k * u), jnp.float32)),
        interpret=(pltpu.InterpretParams() if interpret else False),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_steps * d * k * k * (2 * hid + 4 * u)
            + 2 * n_steps * k * u * (hid + 4 * u),
            bytes_accessed=4 * n_steps * (d * k * k * (2 * hid + 4 * u)),
            transcendentals=n_steps * d * (k * hid + k) + n_steps * 5 * k * u,
        ),
    )(seed, *args)
    return (roll.reshape(n_steps, k, d),
            h_out.reshape(k, 1, u),
            c_out.reshape(k, 1, u))
