"""Dispatch for the CD-k block-Gibbs chain (SURVEY §2.1 row 1).

Implementations:
  * ``xla``    — ``multinn_tpu.nn.rbm.gibbs_chain`` (lax.scan over k sweeps;
                 XLA fuses sigmoid+compare into the matmuls, chain state stays
                 on-chip). Differentiable context handled by cd_loss.
  * ``pallas`` — fused single-kernel chain with VMEM-resident state and the
                 TPU hardware PRNG (``multinn_tpu.ops.gibbs_pallas``).
  * ``auto``   — pallas on TPU backends when shapes are supported, else xla.

Both produce identical *distributions*; bit-streams differ (RNG contract in
``multinn_tpu.ops.sampling``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from multinn_tpu.nn import rbm as _rbm


def _pallas_supported(v0, w) -> bool:
    try:
        from multinn_tpu.ops import gibbs_pallas
    except Exception:   # pragma: no cover - import-time failure = no pallas
        return False
    return gibbs_pallas.supported(v0, w)


def gibbs_chain(key: jax.Array, v0: jax.Array, w, bv, bh, k: int,
                impl: str = "auto") -> jax.Array:
    """k-sweep block Gibbs from v0. v0: (..., D); biases broadcastable.

    impl='auto' picks the Pallas kernel on TPU (override with env
    MULTINN_GIBBS_IMPL=xla|pallas — perf A/B knob). Precedence: an active
    ``ops.sampling.force_impl`` context WINS over the env knob — it exists
    for correctness (global-view GSPMD programs cannot partition a Mosaic
    custom call), while the env var is only a perf experiment. Manual-mode
    (shard_map/seqpipe) step bodies don't enter that context
    (sampling.partitionable_ctx(manual=True)), so the env knob and the
    kernels stay live there."""
    if impl == "auto":
        import os
        from multinn_tpu.ops import sampling
        forced = sampling.forced_impl() or os.environ.get(
            "MULTINN_GIBBS_IMPL")
        if forced:
            impl = forced
        else:
            use_pallas = (jax.default_backend() == "tpu"
                          and _pallas_supported(v0, w))
            impl = "pallas" if use_pallas else "xla"
    if impl == "pallas":
        from multinn_tpu.ops import gibbs_pallas
        return gibbs_pallas.gibbs_chain(key, v0, w, bv, bh, k)
    return _rbm.gibbs_chain(key, v0, w, bv, bh, k)


@partial(jax.jit, static_argnames=("k", "impl"))
def cd_loss(key: jax.Array, v0: jax.Array, w, bv, bh, k: int = 1,
            impl: str = "auto") -> jax.Array:
    """CD-k surrogate loss with the chain from the selected impl
    (math-of-record: nn.rbm.cd_loss)."""
    vk = jax.lax.stop_gradient(gibbs_chain(key, v0, w, bv, bh, k, impl=impl))
    return jnp.mean(_rbm.free_energy(v0, w, bv, bh)
                    - _rbm.free_energy(vk, w, bv, bh))
