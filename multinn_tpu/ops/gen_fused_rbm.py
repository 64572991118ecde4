"""RNN-RBM whole-generation fused Pallas kernel (see gen_fused.py for the
family-level design notes; SURVEY hard parts #1/#4).

The T time steps are the PALLAS GRID (sequential on TPU; scratch carries
the LSTM/visible state across iterations), and each step's sampled frame is
emitted through a per-iteration output block that Pallas pipelines back to
HBM. The roll therefore never occupies VMEM, which is what makes BATCHED
generation (serving shape, B=8..128) fit: VMEM holds only weights +
(B, K*X) state rows. Per-track quantities live in (B, K*X) rows with
per-track lane blocks, so each Gibbs sweep is TWO block-diagonal matmuls
for ALL tracks and samples at once. Measured on v5e (flagship 5-track
feedback, gen_k=10): 6.1 µs/step device time at B=1 and the SAME µs/step at
B=8; bf16 weight-storage capacity mode reaches B=128 serving.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multinn_tpu.ops import kernel_prng, vmem
from multinn_tpu.ops.gen_common import (_common_gate, _decoder_param_shapes,
                                        _eff_dims, _stack_joint)
from multinn_tpu.ops.sampling import key_to_seeds

def _rbm_args(dec_params, h0, c0, v0, wdtype=jnp.float32):
    """Kernel inputs from track-STACKED rnn_rbm.Params + state.

    h0/c0: (L, K, B, U) stacked over the LSTM layers; v0: (K, B, D). Every
    per-track stack is flattened to a 2D block layout so per-track slices
    are static sublane ranges and the Gibbs sweep is block-diagonal
    matmuls:

        wb     (K*D, K*H)       block-diag RBM weights    wbt (K*H, K*D)
        wuvb   (K*U, K*D)       bias conditioning         wuhb (K*U, K*H)
        wx_v   (K*D, 4U)        compact per-track layer-0 input projection
        wx_r   ((L-1)*K*U, 4U)  layers>=1 input projections (prev layer h)
        wh     (L*K*U, 4U)      compact per-track recurrent weights
        wctx   (K*D, K*4U)      feedback-context projection (zeros if unused)
        b      (L, K*4U)        per-layer gate biases

    State rows are (B, L*K*X) with layer-major, then per-track lane blocks.

    ``wdtype=bfloat16`` stores the five BIG block matrices (wb/wbt/wuvb/
    wuhb/wctx) bf16 — the capacity mode the gate falls back to when the
    f32 layout exceeds the VMEM budget (large serving batches, stacked
    flagship cells). The kernel feeds them to the MXU directly with f32
    accumulation; weights round to bf16 (~3 decimal digits), the same
    storage trade the NADE kernel always makes.
    """
    cells = dec_params.cell
    n_layers = len(cells)
    lstm = cells[0]
    # four_u is the GATE width g: 4U for LSTM cells, U for vanilla tanh
    # cells — every layout below is parameterized by it
    k, xin_dim, four_u = lstm.wx.shape
    u = lstm.wh.shape[1]
    d, hid = dec_params.w.shape[1], dec_params.w.shape[2]
    ctx_dim = xin_dim - d
    b = h0.shape[2]
    idx = jnp.arange(k)

    def block_diag(mat_kxy):
        """(K, X, Y) -> (K*X, K*Y) with per-track diagonal blocks."""
        _, x, y = mat_kxy.shape
        out = jnp.zeros((k, x, k, y), wdtype)
        out = out.at[idx, :, idx, :].set(mat_kxy.astype(wdtype))
        return out.reshape(k * x, k * y)

    wb = block_diag(dec_params.w)                           # (K*D, K*H)
    wbt = block_diag(jnp.transpose(dec_params.w, (0, 2, 1)))  # (K*H, K*D)
    wuvb = block_diag(dec_params.wuv)                       # (K*U, K*D)
    wuhb = block_diag(dec_params.wuh)                       # (K*U, K*H)
    wx_v = lstm.wx[:, :d, :].reshape(k * d, four_u)         # compact per-track
    if ctx_dim:
        # rows [j*D + i]: d z/d v_{j,i}(t-1) for all target tracks' gates
        wx_ctx = lstm.wx[:, d:, :].reshape(k, k, d, four_u)   # [k][j][i]
        wctx = jnp.transpose(wx_ctx, (1, 2, 0, 3)).reshape(
            k * d, k * four_u).astype(wdtype)
    else:
        wctx = jnp.zeros((k * d, k * four_u), wdtype)
    wh_all = jnp.concatenate(
        [c.wh.reshape(k * u, four_u) for c in cells], axis=0)
    b_all = jnp.stack([c.b.reshape(k * four_u) for c in cells])  # (L, K*4U)

    def rows(x_lkbx):                      # (L, K, B, X) -> (B, L*K*X)
        return jnp.moveaxis(x_lkbx, 2, 0).reshape(b, -1)

    args = [
        wb, wbt, wuvb, wuhb,
        dec_params.bv.reshape(1, k * d),
        dec_params.bh.reshape(1, k * hid),
        wx_v,
        wh_all,
        wctx,
        b_all,
        rows(h0), rows(c0),
        jnp.moveaxis(v0, 1, 0).reshape(b, k * d),
    ]
    if n_layers > 1:
        args.append(jnp.concatenate(
            [c.wx.reshape(k * u, four_u) for c in cells[1:]], axis=0))
    return tuple(args)


def _rbm_scratch(batch: int, k: int, d: int, u: int, n_layers: int = 1,
                 gate_w: int = None):
    gate_w = 4 * u if gate_w is None else gate_w
    return [pltpu.VMEM((batch, n_layers * k * u), jnp.float32),   # h
            pltpu.VMEM((batch, n_layers * k * u), jnp.float32),   # c
            pltpu.VMEM((batch, k * d), jnp.float32),              # v
            pltpu.VMEM((batch, k * gate_w), jnp.float32)]         # z


def supported(cfg, batch: int, n_steps: int = 2048,
              gen_k: int = None, conditioned: bool = False) -> bool:
    """Gate for the auto-dispatch. The roll is streamed to HBM per step, so
    n_steps does not bound VMEM; batch does (state rows + per-sweep RNG all
    scale with B). Byte counts come from the real builders via eval_shape —
    over-budget requests fall back to the scan path instead of failing at
    Mosaic compile time. ``conditioned``: charge the accompaniment given-
    feature stream block (generate_rbm with given/given_tracks)."""
    if not _common_gate(cfg, "rnn-rbm") or batch < 1:
        return False
    return rbm_weight_dtype(cfg, batch, conditioned=conditioned) is not None


def _rbm_fixed_bytes(batch: int, k: int, d: int, u: int, hid: int,
                     nl: int, gate_w: int = None,
                     conditioned: bool = False) -> int:
    """Non-weight VMEM bytes of the RBM kernel (shared between the gate and
    generate_rbm's auto weight-dtype rule — one formula, no drift)."""
    fixed = vmem.scratch_bytes(_rbm_scratch(batch, k, d, u, nl, gate_w))
    fixed += 2 * 4 * batch * k * d           # roll block, double-buffered
    fixed += 2 * 4 * batch * nl * k * u      # hout/cout blocks
    fixed += 2 * 4 * batch * k * (hid + d)   # per-sweep uniform temporaries
    if conditioned:
        fixed += 2 * 4 * batch * k * d       # given stream, double-buffered
    return fixed


def rbm_weight_dtype(cfg, batch: int, conditioned: bool = False):
    """The weight-storage dtype the dispatch will use for this config/batch
    (shared rule between the gate and generate_rbm's auto mode): f32 when
    the full-precision layout fits the VMEM budget, else bf16 (capacity
    mode — see _rbm_args), else None (fall back to the scan path)."""
    from multinn_tpu.models import rnn_rbm
    (k, d), u = _eff_dims(cfg), cfg.n_rnn
    hid, nl = cfg.n_hidden, cfg.rnn_layers
    params = _decoder_param_shapes(cfg, rnn_rbm)
    st = jax.ShapeDtypeStruct((nl, k, batch, u), jnp.float32)
    v0 = jax.ShapeDtypeStruct((k, batch, d), jnp.float32)
    gate_w = 4 * u if cfg.cell == "lstm" else u
    fixed = _rbm_fixed_bytes(batch, k, d, u, hid, nl, gate_w,
                             conditioned=conditioned)
    for wdtype in (jnp.float32, jnp.bfloat16):
        need = fixed + vmem.eval_shape_bytes(
            functools.partial(_rbm_args, wdtype=wdtype), params, st, st, v0)
        if need <= vmem.VMEM_BUDGET_BYTES:
            return wdtype
    return None


def _rbm_kernel(seed_ref, *refs,
                n_tracks: int, d: int, hid: int, u: int,
                ctx_dim: int, gen_k: int, n_layers: int = 1,
                gate_w: int = None, lstm_cell: bool = True,
                given_tracks: Tuple[int, ...] = ()):
    """One GRID ITERATION = one generation step for all tracks and all B
    samples. Scratch (h/c/v rows) carries the state across iterations; the
    sampled frame is written to this iteration's roll block (Pallas streams
    it to HBM while the next step computes). Every per-track quantity is a
    (B, K*X) row, so each Gibbs sweep is TWO block-diagonal matmuls
    ((B,K*D)@(K*D,K*H) and its transpose) for all tracks at once. Stacked
    LSTMs (n_layers > 1) keep layer-major state rows (B, L*K*U): layer l's
    input is layer l-1's fresh h; bias conditioning reads the TOP layer's
    previous h (scan-path parity: u(t-1) = top-layer state).

    ``given_tracks`` (static) enables ACCOMPANIMENT: an extra per-step
    input block streams the given tracks' teacher features, which REPLACE
    those tracks' Gibbs output before the frame is emitted / carried. The
    replacement is exactly conditional sampling: the RBM weights are
    block-diagonal over tracks, so within a frame the chains are per-track
    independent and masking the given tracks' lanes equals never sampling
    them; all cross-track coupling (feedback ctx, next step's state) flows
    through the MERGED frame, matching the scan path's forced_step
    semantics for given tracks."""
    (wb_ref, wbt_ref, wuvb_ref, wuhb_ref, bv_ref, bh_ref, wxv_ref,
     wh_ref, wctx_ref, b_ref, h0_ref, c0_ref, v0_ref) = refs[:13]
    n_in = 13 + (n_layers > 1) + bool(given_tracks)
    pos = 13
    if n_layers > 1:
        wxr_ref = refs[pos]
        pos += 1
    if given_tracks:
        giv_ref = refs[pos]
        pos += 1
    (roll_ref, hout_ref, cout_ref, h_s, c_s, v_s, z_s) = refs[n_in:]
    t = pl.program_id(0)
    kseed = seed_ref[0]
    kseed1 = seed_ref[1]                  # full 64-bit keying (ops.sampling)
    kk = n_tracks
    gw = 4 * u if gate_w is None else gate_w
    lku = kk * u
    top = (n_layers - 1) * lku

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:]                # (B, L*K*U)
        c_s[:] = c0_ref[:]
        v_s[:] = v0_ref[:]                # (B, K*D)

    h_top = h_s[:, top:top + lku]         # u(t-1): TOP layer previous h
    v_prev = v_s[:]                       # ctx(t) = latents(t-1) [training
    #                                       parity; at t=0 the primed v_prev]

    def wdot(a, w):
        # capacity mode (bf16-stored block matrices): feed the MXU bf16 on
        # BOTH sides with f32 accumulation. The Gibbs operands are binary
        # (exact in bf16); h_top rounds to bf16 in the bias conditioning.
        if w.dtype == jnp.bfloat16:
            a = a.astype(jnp.bfloat16)
        return jnp.dot(a, w, preferred_element_type=jnp.float32)

    # conditioned biases for all tracks: two block-diagonal matmuls
    bv_row = bv_ref[:] + wdot(h_top, wuvb_ref[:])
    bh_row = bh_ref[:] + wdot(h_top, wuhb_ref[:])

    salt0 = kseed1 + t * (2 * gen_k)

    def sweep(s, v):
        ph = jax.nn.sigmoid(wdot(v, wb_ref[:]) + bh_row)
        uh = kernel_prng.random_uniform(ph.shape, kseed, salt0 + 2 * s)
        h = (uh < ph).astype(jnp.float32)
        pv = jax.nn.sigmoid(wdot(h, wbt_ref[:]) + bv_row)
        uv = kernel_prng.random_uniform(pv.shape, kseed, salt0 + 2 * s + 1)
        return (uv < pv).astype(jnp.float32)

    v_new = jax.lax.fori_loop(0, gen_k, sweep, v_prev)
    if given_tracks:
        # lane mask over the (B, K*D) row: given tracks' lane blocks take
        # the streamed teacher features (given_tracks is static; the mask
        # is built in-kernel — Pallas rejects captured array constants)
        lane_trk = jax.lax.broadcasted_iota(
            jnp.int32, (1, kk * d), 1) // d
        gmask = functools.reduce(
            jnp.logical_or,
            [lane_trk == tr for tr in given_tracks])
        v_new = jnp.where(gmask, giv_ref[0], v_new)
    v_s[:] = v_new
    roll_ref[0] = v_new                   # -> HBM via the output pipeline

    # LSTM advance, layer by layer: layer 0's input is the fresh sample
    # (compact wx_v per track) + the feedback ctx from the PREVIOUS frame;
    # layer l>=1's input is layer l-1's FRESH h (compact wx_r per track).
    # Reading h_s/c_s at offset l before writing it keeps each layer's own
    # recurrent input at t-1.
    for layer in range(n_layers):
        off = layer * lku
        h_l = h_s[:, off:off + lku]
        for k in range(kk):
            if layer == 0:
                zin = jnp.dot(v_new[:, k * d:(k + 1) * d],
                              wxv_ref[k * d:(k + 1) * d, :],
                              preferred_element_type=jnp.float32)
            else:
                base = ((layer - 1) * kk + k) * u
                zin = jnp.dot(inp[:, k * u:(k + 1) * u],
                              wxr_ref[base:base + u, :],
                              preferred_element_type=jnp.float32)
            z_s[:, k * gw:(k + 1) * gw] = (
                zin + jnp.dot(h_l[:, k * u:(k + 1) * u],
                              wh_ref[(layer * kk + k) * u:
                                     (layer * kk + k + 1) * u, :],
                              preferred_element_type=jnp.float32))
        z = z_s[:] + b_ref[layer:layer + 1, :]
        if ctx_dim and layer == 0:
            z = z + wdot(v_prev, wctx_ref[:])
        for k in range(kk):
            zk = z[:, k * gw:(k + 1) * gw]
            col = off + k * u
            if lstm_cell:
                i_g = jax.nn.sigmoid(zk[:, :u])
                f_g = jax.nn.sigmoid(zk[:, u:2 * u])
                g_g = jnp.tanh(zk[:, 2 * u:3 * u])
                o_g = jax.nn.sigmoid(zk[:, 3 * u:])
                c_new = f_g * c_s[:, col:col + u] + i_g * g_g
                c_s[:, col:col + u] = c_new
                h_s[:, col:col + u] = o_g * jnp.tanh(c_new)
            else:                          # vanilla: u(t) = tanh(z)
                h_s[:, col:col + u] = jnp.tanh(zk)
        inp = h_s[:, off:off + lku]       # fresh h -> next layer's input
    hout_ref[:] = h_s[:]
    cout_ref[:] = c_s[:]


def generate_rbm(key: jax.Array, dec_params, h0, c0, v0, n_steps: int,
                 gen_k: int, interpret: bool = False, wdtype=None,
                 given=None, given_tracks: Tuple[int, ...] = ()
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Public entry — normalizes ``given_tracks`` to a hashable tuple
    (lists are accepted, mirroring generate_nade's wrapper) before the
    jitted implementation, whose static_argnames would otherwise reject
    a list at the jit boundary."""
    return _generate_rbm(key, dec_params, h0, c0, v0, n_steps, gen_k,
                         interpret=interpret, wdtype=wdtype, given=given,
                         given_tracks=tuple(given_tracks))


@functools.partial(jax.jit,
                   static_argnames=("n_steps", "gen_k", "interpret",
                                    "wdtype", "given_tracks"))
def _generate_rbm(key: jax.Array, dec_params, h0, c0, v0, n_steps: int,
                  gen_k: int, interpret: bool = False, wdtype=None,
                  given=None, given_tracks: Tuple[int, ...] = ()
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run the fused whole-generation kernel (see _rbm_kernel).

    dec_params: track-STACKED rnn_rbm.Params (leading axis K; any LSTM
    stack depth). h0/c0: (L, K, B, U) stacked over layers ((K, B, U)
    auto-promotes for single-layer cells); v0: (K, B, D) — any batch B the
    VMEM gate admits. Returns (roll (B, n_steps, K, D),
    h_final (L, K, B, U), c_final (L, K, B, U)).

    ``given`` (B, n_steps, K, D feature-space) + static ``given_tracks``
    enable ACCOMPANIMENT: the given tracks' frames stream into the kernel
    per step and replace those tracks in the emitted/carried frame (see
    _rbm_kernel). Conditioning on the kernel's own unconditional output is
    bit-identical to the unconditional run (tested)."""
    cells = dec_params.cell
    n_layers = len(cells)
    if h0.ndim == 3 and n_layers == 1:
        h0, c0 = h0[None], c0[None]
    lstm = cells[0]
    k, xin_dim, four_u = lstm.wx.shape   # four_u = gate width g (4U | U)
    u = lstm.wh.shape[1]
    lstm_cell = four_u == 4 * u
    d, hid = dec_params.w.shape[1], dec_params.w.shape[2]
    ctx_dim = xin_dim - d
    b = h0.shape[2]
    lku = n_layers * k * u
    if (given is None) != (not given_tracks):
        raise ValueError("given and given_tracks must be passed together")
    if wdtype is None:
        # auto: f32 when it fits, else the bf16 capacity mode (same rule as
        # rbm_weight_dtype — shared fixed-bytes formula)
        need32 = (_rbm_fixed_bytes(b, k, d, u, hid, n_layers, four_u,
                                   conditioned=given is not None)
                  + vmem.eval_shape_bytes(
                      functools.partial(_rbm_args, wdtype=jnp.float32),
                      dec_params, h0, c0, v0))
        wdtype = (jnp.float32 if need32 <= vmem.VMEM_BUDGET_BYTES
                  else jnp.bfloat16)

    args = list(_rbm_args(dec_params, h0, c0, v0, wdtype=wdtype))
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args)
    if given is not None:
        # (B, T, K, D) -> per-step (T, B, K*D) row blocks, streamed from
        # HBM through the input pipeline (one block per grid iteration)
        args.append(jnp.transpose(given, (1, 0, 2, 3))
                    .reshape(n_steps, b, k * d).astype(jnp.float32))
        in_specs.append(pl.BlockSpec((1, b, k * d), lambda t, s: (t, 0, 0),
                                     memory_space=pltpu.VMEM))
    seed = key_to_seeds(key)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, b, k * d), lambda t, s: (t, 0, 0),
                         memory_space=pltpu.VMEM),          # roll stream
            pl.BlockSpec((b, lku), lambda t, s: (0, 0),
                         memory_space=pltpu.VMEM),          # h final
            pl.BlockSpec((b, lku), lambda t, s: (0, 0),
                         memory_space=pltpu.VMEM),          # c final
        ),
        scratch_shapes=_rbm_scratch(b, k, d, u, n_layers, four_u),
    )
    roll, h_out, c_out = pl.pallas_call(
        functools.partial(_rbm_kernel, n_tracks=k,
                          d=d, hid=hid, u=u, ctx_dim=ctx_dim, gen_k=gen_k,
                          n_layers=n_layers, gate_w=four_u,
                          lstm_cell=lstm_cell,
                          given_tracks=tuple(given_tracks)),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_steps, b, k * d), jnp.float32),
                   jax.ShapeDtypeStruct((b, lku), jnp.float32),
                   jax.ShapeDtypeStruct((b, lku), jnp.float32)),
        interpret=(pltpu.InterpretParams() if interpret else False),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_steps * b * k * (
                2 * gen_k * k * d * hid + u * k * (d + hid)
                + (xin_dim + n_layers * u) * four_u
                + (n_layers - 1) * u * four_u),
            bytes_accessed=4 * (n_steps * b * k * d),
            transcendentals=n_steps * b * k * (gen_k * (d + hid)
                                               + 5 * n_layers * u),
        ),
    )(seed, *args)
    roll = jnp.moveaxis(roll.reshape(n_steps, b, k, d), 0, 1)  # (B,T,K,D)
    # (B, L*K*U) layer-major rows -> (L, K, B, U)
    unrows = lambda r: jnp.moveaxis(r.reshape(b, n_layers, k, u), 0, 2)
    return roll, unrows(h_out), unrows(c_out)


