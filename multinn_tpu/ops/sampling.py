"""Sampling utilities (SURVEY C20): Bernoulli sampling with the framework-wide
RNG contract.

RNG contract: all randomness flows from explicit ``jax.random`` keys threaded
through scans (counter-based threefry — reproducible at fixed seed regardless
of device count or sharding). Pallas kernels derive their hardware PRNG seed
from the same key via ``key_to_seed``; XLA and Pallas paths therefore produce
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


def key_to_seed(key: jax.Array) -> jax.Array:
    """Fold a jax PRNG key into a single int32 seed for the Pallas TPU PRNG."""
    data = jax.random.key_data(key) if jnp.issubdtype(
        key.dtype, jax.dtypes.prng_key) else key
    data = data.astype(jnp.uint32)
    return (data[..., 0] ^ (data[..., -1] * jnp.uint32(2654435761))
            ).astype(jnp.int32)
