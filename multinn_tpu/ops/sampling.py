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

import contextlib
import contextvars

import jax
import jax.numpy as jnp

# Trace-time override for the sampler-impl dispatches (ops/gibbs.py,
# ops/nade_ops.py). Needed because impl="auto" resolves while TRACING: a
# Pallas custom call inside a multi-device GSPMD program cannot be
# partitioned by XLA's SPMD pass, so mesh-sharded generation must compile
# the (fully partitionable) XLA formulation instead. The Generator wraps
# its jitted calls in ``force_impl("xla")`` whenever a multi-device mesh is
# active; single-chip programs are unaffected.
_FORCED_IMPL: contextvars.ContextVar = contextvars.ContextVar(
    "multinn_forced_sampler_impl", default=None)


def forced_impl():
    """The active trace-time impl override ('xla'/'pallas') or None."""
    return _FORCED_IMPL.get()


@contextlib.contextmanager
def force_impl(name: str):
    """Force every sampler dispatch traced inside this context to ``name``."""
    token = _FORCED_IMPL.set(name)
    try:
        yield
    finally:
        _FORCED_IMPL.reset(token)


def partitionable_ctx(mesh, manual: bool = False):
    """The context Trainer/Generator enter inside their step bodies (at trace
    time): force the SPMD-partitionable XLA samplers whenever ``mesh`` spans
    more than one device, no-op otherwise (single-chip programs keep
    auto-picking the Pallas kernels).

    ``manual=True`` declares the step a per-shard (manual-mode) program — a
    ``shard_map``/seqpipe body, where each device traces its own block and a
    Mosaic custom call is an ordinary per-device op the partitioner never has
    to split. Those programs keep the Pallas kernels (and the env A/B knob);
    only global-view GSPMD programs must force XLA."""
    if mesh is not None and mesh.size > 1 and not manual:
        return force_impl("xla")
    return contextlib.nullcontext()


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
