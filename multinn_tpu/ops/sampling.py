"""Sampling utilities (SURVEY C20): Bernoulli sampling with the framework-wide
RNG contract.

RNG contract: all randomness flows from explicit ``jax.random`` keys threaded
through scans (counter-based threefry — reproducible at fixed seed regardless
of device count or sharding). Pallas kernels derive their in-kernel Threefry
key from the same key via ``key_to_seeds`` (both 32-bit words — full 64-bit
keying); XLA and Pallas paths therefore produce
*different streams* but identical distributions — parity tests pin means and
distributions, bit-exactness is only guaranteed within one impl (SURVEY hard
part #3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bernoulli(key: jax.Array, p: jax.Array) -> jax.Array:
    """Sample {0,1} in p's dtype (keeps downstream matmuls in one dtype).
    Single definition lives in nn.rbm (this module re-exports it so the RNG
    contract documentation has one import point without an import cycle)."""
    from multinn_tpu.nn.rbm import _bernoulli
    return _bernoulli(key, p)


def key_to_seeds(key: jax.Array) -> jax.Array:
    """Both 32-bit words of a jax PRNG key as a (2,) int32 array — the full
    64-bit Threefry key for the in-kernel PRNG (ops/kernel_prng.py). Folding
    to one word (as an earlier revision did) exposes ~2^16-launch birthday
    collisions between kernel RNG streams over long trainings; feeding both
    words keeps streams collision-free to ~2^32 launches."""
    data = jax.random.key_data(key) if jnp.issubdtype(
        key.dtype, jax.dtypes.prng_key) else key
    data = data.astype(jnp.uint32).reshape(-1)
    return jnp.stack([data[0], data[-1]]).astype(jnp.int32)
