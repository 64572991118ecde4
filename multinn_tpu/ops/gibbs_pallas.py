"""Fused CD-k block-Gibbs chain as a Pallas TPU kernel (SURVEY §2.1 row 1).

One kernel runs the ENTIRE k-sweep chain with the visible/hidden state
resident in VMEM and the TPU hardware PRNG generating the Bernoulli draws —
zero HBM round-trips between sweeps (the XLA fallback re-materializes v each
sweep at batch scale). Per sweep: two MXU matmuls ((B,D)x(D,H) and its
transpose) + VPU sigmoid/compare.

Layout: batch-major (B, D)/(B, H) blocks, B tiled over the grid; per-sample
biases (the RNN-RBM's time-conditioned biases) are streamed per block.

RNG contract (ops/sampling.py): the hardware PRNG stream differs from the
jax.random fallback; distributions are identical, and each (block, sweep)
draws an independent stream seeded from the same jax key.
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

_LANE = 128
# batch-tiling budget: this kernel tiles B over the grid, so the constant is
# a tile-size choice (weights + one tile's rows), not a hard gate — leave a
# wider margin under the shared budget for pipeline double-buffers
_MAX_VMEM_BYTES = vmem.PER_STEP_KERNEL_BUDGET_BYTES


def _block_b(b: int, d: int, h: int) -> int:
    """Largest batch tile (multiple of 8) whose buffers fit the VMEM budget."""
    per_row = 4 * (2 * d + 2 * h + d + h)     # v, bv, out, h, bh, logits
    bb = max(8, min(b, _MAX_VMEM_BYTES // max(per_row, 1)))
    bb = (bb // 8) * 8
    return max(8, min(bb, 1024))


def supported(v0: jax.Array, w: jax.Array) -> bool:
    """Kernel constraints: float32, static 2D weights, total batch in
    [8, 2048]. The upper bound is a measured perf crossover, not a
    correctness limit: the fused kernel wins while the chain is
    latency-bound (3.4× at B=64, 1.5× at B=256, 1.1× at B=1024 on v5e,
    D=84 H=150 k=25) but XLA's pipelined fusion wins once the matmuls are
    big enough to hide dispatch (B=4096: 64 vs 59 M sweeps/s) — above the
    bound the dispatch falls back to the XLA path."""
    if v0.dtype != jnp.float32 or w.dtype != jnp.float32:
        return False
    b = 1
    for s in v0.shape[:-1]:
        b *= s
    return 8 <= b <= 2048 and v0.shape[-1] == w.shape[0]


def _kernel(seed_ref, v0_ref, w_ref, bv_ref, bh_ref, out_ref, *, k: int):
    # per-block stream: fold the grid position into the first threefry key
    # word; the second word carries the other half of the jax key (full
    # 64-bit keying — see ops.sampling.key_to_seeds) and is salted per draw
    kseed = seed_ref[0] ^ (pl.program_id(0) * jnp.int32(0x85EB))
    kseed1 = seed_ref[1]
    w = w_ref[:]                                   # (D, H)
    bv = bv_ref[:]                                 # (BB, D)
    bh = bh_ref[:]                                 # (BB, H)
    v = v0_ref[:]                                  # (BB, D)

    def sweep(i, v):
        ph = jax.nn.sigmoid(
            jnp.dot(v, w, preferred_element_type=jnp.float32) + bh)
        h = (kernel_prng.random_uniform(ph.shape, kseed, kseed1 + 2 * i)
             < ph).astype(jnp.float32)
        pv = jax.nn.sigmoid(
            jax.lax.dot_general(h, w, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) + bv)
        return (kernel_prng.random_uniform(pv.shape, kseed, kseed1 + 2 * i + 1)
                < pv).astype(jnp.float32)

    out_ref[:] = jax.lax.fori_loop(0, k, sweep, v)


@functools.partial(jax.custom_jvp, nondiff_argnums=(5, 6))
def gibbs_chain(key: jax.Array, v0: jax.Array, w, bv, bh, k: int,
                interpret: bool = False) -> jax.Array:
    """Drop-in for nn.rbm.gibbs_chain (distribution-level parity; RNG stream
    differs — see module docstring). v0: (..., D); biases broadcastable.

    Differentiation contract: binary sampling is piecewise-constant, so the
    tangent is zero almost everywhere — declared via custom_jvp so the kernel
    is safe inside value_and_grad (CD-k additionally stop_gradients the chain
    output; see nn.rbm.cd_loss)."""
    orig_shape = v0.shape
    d, h_dim = w.shape
    v0_2d = v0.reshape(-1, d)
    b = v0_2d.shape[0]
    bv_2d = jnp.broadcast_to(bv, orig_shape).reshape(-1, d)
    bh_2d = jnp.broadcast_to(bh, (*orig_shape[:-1], h_dim)).reshape(-1, h_dim)

    bb = _block_b(b, d, h_dim)
    if b % bb:                                     # pad batch to a tile
        pad = bb - (b % bb)
        v0_2d = jnp.concatenate(
            [v0_2d, jnp.zeros((pad, d), v0_2d.dtype)])
        bv_2d = jnp.concatenate(
            [bv_2d, jnp.zeros((pad, d), bv_2d.dtype)])
        bh_2d = jnp.concatenate(
            [bh_2d, jnp.zeros((pad, h_dim), bh_2d.dtype)])
    n_blocks = v0_2d.shape[0] // bb

    seed = key_to_seeds(key)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((bb, d), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),          # v0
            pl.BlockSpec((d, h_dim), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),          # w
            pl.BlockSpec((bb, d), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),          # bv
            pl.BlockSpec((bb, h_dim), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),          # bh
        ],
        out_specs=pl.BlockSpec((bb, d), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, k=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(v0_2d.shape, jnp.float32),
        interpret=(pltpu.InterpretParams()
                   if interpret else False),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * k * v0_2d.shape[0] * d * h_dim,
            bytes_accessed=4 * v0_2d.size * 3,
            transcendentals=k * v0_2d.shape[0] * (d + h_dim),
        ),
    )(seed, v0_2d, w, bv_2d, bh_2d)
    return out[:b].reshape(orig_shape)


@gibbs_chain.defjvp
def _gibbs_chain_jvp(k, interpret, primals, tangents):
    out = gibbs_chain(*primals, k, interpret)
    return out, jnp.zeros_like(out)
