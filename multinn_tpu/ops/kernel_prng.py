"""Counter-based PRNG for Pallas kernels: Threefry-2x32-20 (Random123 /
Salmon et al. 2011 — the same generator family as jax.random's default).

Why not ``pltpu.prng_random_bits``: the TPU hardware PRNG is unavailable in
Pallas interpret mode (returns zeros), which would leave the sampling kernels
untestable on the CPU CI mesh. Threefry is 20 rounds of 32-bit add/xor/rotate
— pure VPU ops, bit-identical in interpret mode, on CPU, and on real TPU —
and its cost is negligible next to the kernels' matmuls.

Streams are keyed (seed, salt) and countered by element position, so every
(block, sweep, element) draw is independent and reproducible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_ROT_EVEN = (13, 15, 26, 6)
_ROT_ODD = (17, 29, 16, 24)
_PARITY = 0x1BD11BDA          # plain int: jnp constants must be created
                              # inside the kernel trace, not captured


def _rotl(x, r: int):
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def threefry2x32(k0, k1, x0, x1):
    """One Threefry-2x32-20 block: (k0,k1) key, (x0,x1) counter -> 2 words.
    All inputs uint32 arrays of one broadcastable shape."""
    ks = (k0, k1, k0 ^ k1 ^ jnp.uint32(_PARITY))
    x0 = x0 + ks[0]
    x1 = x1 + ks[1]
    for d in range(5):
        rots = _ROT_EVEN if d % 2 == 0 else _ROT_ODD
        for r in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x1 ^ x0
        x0 = x0 + ks[(d + 1) % 3]
        x1 = x1 + ks[(d + 2) % 3] + jnp.uint32(d + 1)
    return x0, x1


def random_bits(shape, seed, salt):
    """uint32 random bits of ``shape`` (2D+) from (seed, salt) — usable inside
    Pallas kernels (uses broadcasted_iota; no 1D iota). ``seed``/``salt`` are
    scalar int32/uint32 (may be traced)."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 1)
    n_cols = jnp.uint32(shape[-1])
    counter = rows * n_cols + cols
    k0 = jnp.asarray(seed).astype(jnp.uint32)
    k1 = jnp.asarray(salt).astype(jnp.uint32)
    out0, _ = threefry2x32(jnp.broadcast_to(k0, shape),
                           jnp.broadcast_to(k1, shape),
                           counter, counter ^ jnp.uint32(0x9E3779B9))
    return out0


def random_uniform(shape, seed, salt):
    """floats in [0, 1): set the exponent to [1,2) via the mantissa trick."""
    bits = random_bits(shape, seed, salt)
    f = jax.lax.bitcast_convert_type(
        (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000), jnp.float32)
    return f - 1.0
