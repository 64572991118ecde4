"""Dispatch for NADE hot ops (SURVEY §2.1 row 2): exact log-likelihood and the
sequential per-dimension sampling sweep.

  * log-likelihood: parallel cumsum form (``nn.nade.log_prob``) by default —
    it is already MXU-shaped; ``chunk`` switches to the memory-bounded scan.
  * sampling: ``xla`` = lax.scan over dims (``nn.nade.sample``); ``pallas`` =
    fused on-chip sweep keeping W, V and the running activation in VMEM
    (``multinn_tpu.ops.nade_pallas``); ``auto`` picks pallas on TPU when
    supported.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from multinn_tpu.nn import nade as _nade


def default_ll_form() -> str:
    """Exclusive-cumsum evaluation for the exact likelihood (nn.nade._a_excl):
    on TPU the strictly-lower-triangular MATMUL form wins — it touches the
    (B·T·D·H) activation tensor once on the MXU instead of log2(D)
    bandwidth passes (measured v5e, flagship NADE train step: 9.17 → 6.35
    ms/step, BASELINE.md). Elsewhere the plain cumsum (D× fewer FLOPs)
    stays the default. Resolved at trace time."""
    return "tri" if jax.default_backend() == "tpu" else "cumsum"


def nade_log_prob(x: jax.Array, w, v, bv, bh,
                  chunk: Optional[int] = None,
                  form: Optional[str] = None) -> jax.Array:
    if chunk is not None:
        return _nade.log_prob_chunked(x, w, v, bv, bh, chunk=chunk)
    return _nade.log_prob(x, w, v, bv, bh,
                          form=form or default_ll_form())


def _pallas_supported(w) -> bool:
    try:
        from multinn_tpu.ops import nade_pallas
    except Exception:   # pragma: no cover
        return False
    return nade_pallas.supported(w)


def nade_sample(key: jax.Array, w, v, bv, bh,
                batch_shape: Tuple[int, ...] = (),
                impl: str = "auto") -> jax.Array:
    if impl == "auto":
        from multinn_tpu.ops import sampling
        forced = sampling.forced_impl()
        if forced:
            impl = forced
        else:
            impl = ("pallas" if jax.default_backend() == "tpu"
                    and _pallas_supported(w) else "xla")
    if impl == "pallas":
        from multinn_tpu.ops import nade_pallas
        return nade_pallas.sample(key, w, v, bv, bh, batch_shape)
    return _nade.sample(key, w, v, bv, bh, batch_shape)
