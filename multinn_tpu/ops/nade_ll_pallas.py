"""Grid-free NADE exact-likelihood logits as Pallas TPU kernels (SURVEY
§2.1 row 2 — the TRAINING-side hot path; reference counterpart: the TF1
per-dim conditional loop used for the exact NLL [K]).

The parallel exclusive-cumsum forms in ``nn.nade`` (cumsum / strict-tri
matmul) are MXU-shaped but MATERIALIZE the (N, D, H) hidden-activation grid
in HBM — at flagship train shapes the step is bandwidth-bound streaming that
grid (BASELINE.md: tri form 6.35 ms/step, ~26x the model FLOPs' roofline).
These kernels never build the grid: the running activation a lives in VMEM
and the D-dim recurrence is swept sequentially per N-tile, exactly like the
generation kernel (``nade_pallas``) but teacher-forced and with a custom VJP:

    forward    per dim i:  h = sigma(a);  logit_i = bv_i + V_i . h;
                           a += x_i (x) W_i
    backward   dA_i = (V_i (x) g_i) * h_i (1 - h_i)
               dbh  = sum_i dA_i
               dV_i = g_i . h_i^T
               r_i  = sum_{i' > i} dA_i'            (suffix sum)
               dW_i = x_i . r_i^T ;  dx_i = W_i . r_i

The backward is ONE reverse sweep: the forward saves its final running
activation a_D (an O(N*H) residual — the only one), and the reverse sweep
DOWNDATES it (a_i = a_{i+1} - x_i (x) W_i) to recover each h_i while the
suffix sum r accumulates naturally in reverse order. No O(N*D*H) activation
grid ever touches HBM in either direction; traffic is O(N*(D+H)) total.
(Downdating reintroduces one rounding per visited dim relative to the
forward accumulation — bounded by D ulps of the running activation, far
inside gradient tolerance; parity-tested against jax.grad of the XLA form.)

Layout is DIM-MAJOR like the sampling kernel: per-dim tensors (x, biases,
logits, grads) are (D, N) so per-dim access is a sublane row read/write; the
running activation and its adjoints are (H, N). N (= B*T rows) is tiled over
a 1-D grid; dW/dV are emitted as per-tile partials and reduced in XLA (no
cross-grid-step state, no program_id use -> safe under vmap over tracks).

The XLA forms stay behind the same dispatch (ops.nade_ops.nade_log_prob);
equality is exact up to f32 summation order (tolerance-tested against
jax.grad of the reference form).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multinn_tpu.ops import vmem

_LANE = 128
_NT_CHOICES = (2048, 1024, 512, 256, 128)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bwd_block_shapes(d: int, h: int, nt: int):
    """VMEM block shapes of the BACKWARD pallas_call, in argument order —
    THE single source for both ``_bwd_2d``'s specs and the VMEM gate (a
    hand-maintained byte formula drifted from the real allocation once —
    round-4 review; deriving both from this list fixes the class of bug,
    per ops/vmem.py's gate rule). Returns (pipelined, scratch) shape lists:
    in/out blocks are double-buffered by Mosaic's grid pipeline; scratch is
    single."""
    pipelined = [
        (d, h), (d, h),                 # in:  w, v (replicated blocks)
        (d, nt), (d, nt), (h, nt),      # in:  x, g, a_end
        (1, d, h), (1, d, h),           # out: dW, dV per-tile partials
        (d, nt), (h, nt),               # out: dx, dbh
    ]
    scratch = [(h, nt), (h, nt)]        # a, r
    return pipelined, scratch


def _bwd_bytes(d: int, h: int, nt: int) -> int:
    """HONEST peak VMEM of the backward pallas_call (2x every pipelined
    block + scratch, from the canonical shape list above). Flagship shapes
    D=84, H=150, NT=2048 come to ~11.9 MiB — measured working on v5e;
    NT=1024 was 7.6% slower."""
    pipelined, scratch = _bwd_block_shapes(d, h, nt)
    elems = (2 * sum(math.prod(s) for s in pipelined)
             + sum(math.prod(s) for s in scratch))
    return 4 * elems


def pick_tile(d: int, h: int, n: int) -> int:
    """Largest N-tile whose BACKWARD working set fits the standalone-kernel
    VMEM budget (the backward allocation dominates the forward one).
    0 = unsupported."""
    cap = _round_up(max(n, _LANE), _LANE)
    for nt in _NT_CHOICES:
        if (nt <= cap and
                _bwd_bytes(d, h, nt) <= vmem.STANDALONE_KERNEL_BUDGET_BYTES):
            return nt
    return 0


def supported(w: jax.Array, n: int) -> bool:
    if w.dtype != jnp.float32:
        return False
    d, h = w.shape
    return pick_tile(d, h, n) > 0


# ---------------------------------------------------------------------------
# kernels (dim-major: per-dim refs (D, NT); activations (H, NT))
# ---------------------------------------------------------------------------

def _unroll(d: int) -> int:
    """Dims swept per loop iteration. Mosaic's fori_loop only supports
    unroll=1 or =num_steps; full unroll measured +3-7% step time but ~15x
    Mosaic compile time (55 s/program) — manual partial unroll keeps most
    of the win at ~unroll x program size. Largest of 4..1 dividing D."""
    for u in (4, 3, 2):
        if d % u == 0:
            return u
    return 1

def _fwd_kernel(w_ref, v_ref, x_ref, bv_ref, bh_ref, out_ref, aend_ref, *,
                d: int):
    # aend is an OUTPUT doubling as the accumulator: after the loop it holds
    # a_D, the backward's only residual
    aend_ref[:] = bh_ref[:]                                # (H, NT)

    def dim_step(i, _):
        h = jax.nn.sigmoid(aend_ref[:])                    # (H, NT)
        vrow = v_ref[pl.ds(i, 1), :]                       # (1, H)
        s = jax.lax.dot_general(vrow, h, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out_ref[pl.ds(i, 1), :] = s + bv_ref[pl.ds(i, 1), :]
        xrow = x_ref[pl.ds(i, 1), :]                       # (1, NT)
        wrow = w_ref[pl.ds(i, 1), :]                       # (1, H)
        # rank-1 update (1,H)^T (x) (1,NT) -> (H,NT), no transpose op
        aend_ref[:] = aend_ref[:] + jax.lax.dot_general(
            wrow, xrow, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    u = _unroll(d)

    def block_step(b, _):
        for j in range(u):           # manual partial unroll (Mosaic's
            dim_step(b * u + j, 0)   # fori_loop is all-or-nothing)
        return 0

    jax.lax.fori_loop(0, d // u, block_step, 0)


def _bwd_kernel(w_ref, v_ref, x_ref, g_ref, aend_ref,
                dw_ref, dv_ref, dx_ref, dbh_ref, a_ref, r_ref, *, d: int):
    # ONE reverse sweep: downdate a from its saved end state; r accumulates
    # the suffix sum of dA (its value BEFORE adding dA_i is exactly r_i)
    a_ref[:] = aend_ref[:]
    r_ref[:] = jnp.zeros_like(r_ref)

    def rev_step(t, _):
        i = d - 1 - t
        xrow = x_ref[pl.ds(i, 1), :]                       # (1, NT)
        wrow = w_ref[pl.ds(i, 1), :]                       # (1, H)
        a_ref[:] = a_ref[:] - jax.lax.dot_general(
            wrow, xrow, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # now a = a_i
        h = jax.nn.sigmoid(a_ref[:])                       # (H, NT)
        grow = g_ref[pl.ds(i, 1), :]                       # (1, NT)
        # dV_i[hh] = sum_n g[i,n] h[hh,n]  -> (1, H)
        dv_ref[0, pl.ds(i, 1), :] = jax.lax.dot_general(
            grow, h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        r = r_ref[:]
        # dW_i[hh] = sum_n x[i,n] r[hh,n] -> (1, H)
        dw_ref[0, pl.ds(i, 1), :] = jax.lax.dot_general(
            xrow, r, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dx_i[n] = sum_hh w[i,hh] r[hh,n] -> (1, NT)
        dx_ref[pl.ds(i, 1), :] = jax.lax.dot_general(
            wrow, r, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        vrow = v_ref[pl.ds(i, 1), :]                       # (1, H)
        da = jax.lax.dot_general(vrow, grow, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        r_ref[:] = r_ref[:] + da * (h - h * h)
        return 0

    u = _unroll(d)

    def block_step(b, _):
        for j in range(u):
            rev_step(b * u + j, 0)
        return 0

    jax.lax.fori_loop(0, d // u, block_step, 0)
    dbh_ref[:] = r_ref[:]


# ---------------------------------------------------------------------------
# pallas_call wrappers (dim-major, N padded to a tile multiple)
# ---------------------------------------------------------------------------

def _replicated(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _n_blocked(rows, nt):
    return pl.BlockSpec((rows, nt), lambda i: (0, i),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("nt", "interpret"))
def _fwd_2d(w, v, xd, bvd, bhd, nt: int, interpret: bool = False):
    d, h_dim = w.shape
    n = xd.shape[1]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, d=d),
        grid=(n // nt,),
        in_specs=[_replicated((d, h_dim)), _replicated((d, h_dim)),
                  _n_blocked(d, nt), _n_blocked(d, nt), _n_blocked(h_dim, nt)],
        out_specs=(_n_blocked(d, nt), _n_blocked(h_dim, nt)),
        out_shape=(jax.ShapeDtypeStruct((d, n), jnp.float32),
                   jax.ShapeDtypeStruct((h_dim, n), jnp.float32)),
        interpret=(pltpu.InterpretParams() if interpret else False),
        cost_estimate=pl.CostEstimate(
            flops=6 * d * h_dim * n,
            bytes_accessed=4 * (2 * d * h_dim + 3 * d * n + 2 * h_dim * n),
            transcendentals=d * h_dim * n,
        ),
    )(w, v, xd, bvd, bhd)


@functools.partial(jax.jit, static_argnames=("nt", "interpret"))
def _bwd_2d(w, v, xd, gd, aend, nt: int, interpret: bool = False):
    d, h_dim = w.shape
    n = xd.shape[1]
    n_tiles = n // nt
    # specs derive from the SAME canonical block-shape list the VMEM gate
    # charges (positional zip — extending one without the other fails here)
    (s_w, s_v, s_x, s_g, s_ae, s_dw, s_dv, s_dx, s_dbh), scr = (
        _bwd_block_shapes(d, h_dim, nt))

    def per_tile_3d(shape):
        return pl.BlockSpec(shape, lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    dwp, dvp, dxd, dbhd = pl.pallas_call(
        functools.partial(_bwd_kernel, d=d),
        grid=(n_tiles,),
        in_specs=[_replicated(s_w), _replicated(s_v),
                  _n_blocked(*s_x), _n_blocked(*s_g), _n_blocked(*s_ae)],
        out_specs=(
            per_tile_3d(s_dw),
            per_tile_3d(s_dv),
            _n_blocked(*s_dx),
            _n_blocked(*s_dbh),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, *s_dw[1:]), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, *s_dv[1:]), jnp.float32),
            jax.ShapeDtypeStruct((s_dx[0], n), jnp.float32),
            jax.ShapeDtypeStruct((s_dbh[0], n), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM(s, jnp.float32) for s in scr],
        interpret=(pltpu.InterpretParams() if interpret else False),
        cost_estimate=pl.CostEstimate(
            flops=14 * d * h_dim * n,
            bytes_accessed=4 * (6 * d * h_dim + 4 * d * n + 2 * h_dim * n),
            transcendentals=d * h_dim * n,
        ),
    )(w, v, xd, gd, aend)
    return dwp.sum(axis=0), dvp.sum(axis=0), dxd, dbhd


# ---------------------------------------------------------------------------
# public custom_vjp surface (row-major (..., D) like nn.nade)
# ---------------------------------------------------------------------------

def _to_dim_major(x, w, v, bv, bh, nt):
    """Broadcast biases, flatten leading dims to N, pad N to a tile multiple
    and transpose to dim-major. Returns (xd, bvd, bhd, n, batch_shape)."""
    d, h_dim = w.shape
    batch_shape = x.shape[:-1]
    xf = x.reshape(-1, d)
    n = xf.shape[0]
    bvf = jnp.broadcast_to(bv, (*batch_shape, d)).reshape(-1, d)
    bhf = jnp.broadcast_to(bh, (*batch_shape, h_dim)).reshape(-1, h_dim)
    n_pad = _round_up(n, nt)
    if n_pad != n:
        pad = ((0, n_pad - n), (0, 0))
        xf, bvf, bhf = (jnp.pad(a, pad) for a in (xf, bvf, bhf))
    return xf.T, bvf.T, bhf.T, n, batch_shape


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def nade_logits(x, w, v, bv, bh, interpret: bool = False):
    """All D teacher-forced conditional logits, grid-free on TPU.

    x: (..., D); w, v: (D, H); bv: (..., D) or (D,); bh: (..., H) or (H,).
    Drop-in for ``nn.nade.conditionals_logits`` under reverse-mode autodiff
    (custom VJP — forward-mode stays on the XLA forms, see training/hf.py).
    """
    logits, _ = _fwd_res(x, w, v, bv, bh, interpret)
    return logits


def _fwd_res(x, w, v, bv, bh, interpret):
    d, h_dim = w.shape
    nt = pick_tile(d, h_dim, x[..., 0].size)
    if nt == 0:
        raise ValueError(
            f"nade_ll_pallas: no N-tile fits VMEM for D={d}, H={h_dim} "
            "(gate with supported() before dispatching)")
    xd, bvd, bhd, n, batch_shape = _to_dim_major(x, w, v, bv, bh, nt)
    out, aend = _fwd_2d(w, v, xd, bvd, bhd, nt, interpret=interpret)
    logits = out.T[:n].reshape(*batch_shape, d)
    # residuals: dim-major padded x and the FINAL running activation a_D —
    # the reverse sweep downdates it (biases are not needed in the backward)
    return logits, (w, v, xd, aend, n, batch_shape, nt, bv.shape, bh.shape)


def _fwd_fwd(x, w, v, bv, bh, interpret):
    return _fwd_res(x, w, v, bv, bh, interpret)


def _fwd_bwd(interpret, res, g):
    w, v, xd, aend, n, batch_shape, nt, bv_shape, bh_shape = res
    d, h_dim = w.shape
    gf = g.reshape(-1, d)
    n_pad = xd.shape[1]
    if n_pad != n:
        gf = jnp.pad(gf, ((0, n_pad - n), (0, 0)))
    dw, dv, dxd, dbhd = _bwd_2d(w, v, xd, gf.T, aend, nt, interpret=interpret)
    dx = dxd.T[:n].reshape(*batch_shape, d)
    dbh_full = dbhd.T[:n].reshape(*batch_shape, h_dim)
    # dbv = g (logits are bv + ...); biases were broadcast to the full batch
    # shape in _to_dim_major, so their cotangents reduce back to input shape
    dbv = _unbroadcast(g, bv_shape)
    dbh = _unbroadcast(dbh_full, bh_shape)
    return dx, dw, dv, dbv, dbh


def _unbroadcast(grad, orig_shape):
    """Reduce a full-batch-shape cotangent back to the (possibly broadcast)
    input bias shape: sum the prepended leading dims, then the size-1 dims."""
    extra = grad.ndim - len(orig_shape)
    if extra:
        grad = grad.sum(axis=tuple(range(extra)))
    keep = tuple(ax for ax, sz in enumerate(orig_shape) if sz == 1)
    if keep:
        grad = grad.sum(axis=keep, keepdims=True)
    return grad.reshape(orig_shape)


nade_logits.defvjp(_fwd_fwd, _fwd_bwd)
