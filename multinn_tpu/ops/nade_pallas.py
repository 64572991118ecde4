"""Fused NADE per-dimension sampling sweep as a Pallas TPU kernel (SURVEY
§2.1 row 2 — hard part #1: D sequential conditionals inside every generation
step).

The kernel keeps W (encode), V (decode), the running activation a and the
growing sample entirely in VMEM and sweeps the D dimensions in one program:

    per dim i:  h = σ(a);  logit_i = bv_i + V_i·h;  x_i ~ Bern(σ(logit_i));
                a += x_i ⊗ W_i

Layout is DIM-MAJOR: per-dim tensors (biases, output) are stored (D, B) so
the dynamic per-dim access is a sublane-indexed row read/write (cheap on TPU),
never a lane-dim gather; the running activation lives as (H, B) so both the
conditional dot and the rank-1 update are dot_generals that never transpose.

The XLA fallback (nn.nade.sample, lax.scan over dims) stays behind the same
dispatch (ops.nade_ops.nade_sample). Distribution-level parity; hardware-PRNG
stream differs from jax.random (ops/sampling.py contract).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multinn_tpu.ops import kernel_prng
from multinn_tpu.ops.sampling import key_to_seeds

from multinn_tpu.ops import vmem

_MAX_VMEM_BYTES = vmem.PER_STEP_KERNEL_BUDGET_BYTES


def supported(w: jax.Array) -> bool:
    if w.dtype != jnp.float32:
        return False
    d, h = w.shape
    return 4 * (2 * d * h) <= _MAX_VMEM_BYTES


def _kernel(seed_ref, w_ref, v_ref, bv_ref, bh_ref, out_ref, a_ref, u_ref, *,
            d: int):
    kseed = seed_ref[0] ^ (pl.program_id(0) * jnp.int32(0x85EB))
    a_ref[:] = bh_ref[:]                                 # (H, B)
    # hoist ALL RNG off the serial critical path: one (D, B) uniform matrix
    # (full 64-bit keying: both jax key words feed the threefry key)
    u_ref[:] = kernel_prng.random_uniform(u_ref.shape, kseed, seed_ref[1])

    def dim_step(i, _):
        h = jax.nn.sigmoid(a_ref[:])                     # (H, B)
        vrow = v_ref[pl.ds(i, 1), :]                     # (1, H)
        # (1,H)·(H,B) -> (1,B): the conditional logit for every sample
        s = jax.lax.dot_general(vrow, h, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jax.nn.sigmoid(s + bv_ref[pl.ds(i, 1), :])   # (1, B)
        x = (u_ref[pl.ds(i, 1), :] < p).astype(jnp.float32)
        out_ref[pl.ds(i, 1), :] = x
        wrow = w_ref[pl.ds(i, 1), :]                     # (1, H)
        # rank-1 update (1,H)ᵀ⊗(1,B) -> (H,B) without an explicit transpose
        a_ref[:] = a_ref[:] + jax.lax.dot_general(
            wrow, x, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, d, dim_step, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sample_2d(key, w, v, bv_db, bh_hb, interpret: bool = False):
    """bv_db: (D, B); bh_hb: (H, B). Returns (D, B) binary samples."""
    d, h_dim = w.shape
    b = bv_db.shape[1]
    seed = key_to_seeds(key)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((d, h_dim), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),       # w
            pl.BlockSpec((d, h_dim), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),       # v
            pl.BlockSpec((d, b), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),       # bv
            pl.BlockSpec((h_dim, b), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),       # bh
        ],
        out_specs=pl.BlockSpec((d, b), lambda i, s: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h_dim, b), jnp.float32),
                        pltpu.VMEM((d, b), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_kernel, d=d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, b), jnp.float32),
        interpret=(pltpu.InterpretParams()
                   if interpret else False),
        cost_estimate=pl.CostEstimate(
            flops=4 * d * h_dim * b,
            bytes_accessed=4 * (2 * d * h_dim + 2 * d * b),
            transcendentals=d * (h_dim + 1) * b,
        ),
    )(seed, w, v, bv_db, bh_hb)


@functools.partial(jax.custom_jvp, nondiff_argnums=(5, 6))
def sample(key: jax.Array, w, v, bv, bh, batch_shape=(),
           interpret: bool = False) -> jax.Array:
    """Drop-in for nn.nade.sample. bv/bh may carry batch dims (RNN-NADE's
    time-conditioned biases). Returns (*batch_shape, D)."""
    d, h_dim = w.shape
    bv_b = jnp.broadcast_to(bv, (*batch_shape, d)).reshape(-1, d)
    bh_b = jnp.broadcast_to(bh, (*batch_shape, h_dim)).reshape(-1, h_dim)
    out = _sample_2d(key, w, v, bv_b.T, bh_b.T, interpret=interpret)
    return out.T.reshape(*batch_shape, d)


@sample.defjvp
def _sample_jvp(batch_shape, interpret, primals, tangents):
    out = sample(*primals, batch_shape, interpret)
    return out, jnp.zeros_like(out)
