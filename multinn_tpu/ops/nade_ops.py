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


def _ll_pallas_supported(w, n: int) -> bool:
    try:
        from multinn_tpu.ops import nade_ll_pallas
    except Exception:   # pragma: no cover
        return False
    return nade_ll_pallas.supported(w, n)


def _pick_ll_impl(impl: str, form, w, n: int) -> str:
    """Resolve auto dispatch for the likelihood-side ops (kernel precedence
    rules shared by nade_log_prob / nade_conditionals_logits). A resolved
    'pallas' — whether forced by MULTINN_NADE_LL_IMPL or passed explicitly —
    is still checked against the kernel's supported() gate so an unsupported
    shape/dtype fails HERE with an actionable message instead of a
    trace-time error deep in the kernel wrapper (round-4 review)."""
    if impl == "auto" and form is None:
        import os
        from multinn_tpu.ops import sampling
        forced = sampling.forced_impl() or os.environ.get(
            "MULTINN_NADE_LL_IMPL")
        if forced:
            impl = forced
        elif (jax.default_backend() == "tpu"
                and _ll_pallas_supported(w, n)):
            impl = "pallas"
    if impl == "pallas" and not _ll_pallas_supported(w, n):
        raise ValueError(
            f"NADE LL impl forced to 'pallas' but the kernel does not "
            f"support w{tuple(w.shape)}/{w.dtype} at N={n} (f32 only; "
            f"VMEM gate in ops/nade_ll_pallas.pick_tile). Unset "
            f"MULTINN_NADE_LL_IMPL or pass impl='xla'.")
    return impl


def nade_conditionals_logits(x: jax.Array, w, v, bv, bh,
                             form: Optional[str] = None,
                             impl: str = "auto") -> jax.Array:
    """All D teacher-forced conditional logits (..., D). auto -> the
    grid-free kernel on TPU (reverse-mode differentiable through its custom
    VJP). FORWARD-mode (jvp) callers — the Hessian-free GGN matvecs,
    training/hf.py — must stay on the XLA form (models/rnn_nade.py
    ``conditional_logits`` does; custom_vjp has no jvp rule)."""
    impl = _pick_ll_impl(impl, form, w, x[..., 0].size)
    if impl == "pallas":
        from multinn_tpu.ops import nade_ll_pallas
        return nade_ll_pallas.nade_logits(x, w, v, bv, bh)
    return _nade.conditionals_logits(x, w, v, bv, bh,
                                     form=form or default_ll_form())


def nade_log_prob(x: jax.Array, w, v, bv, bh,
                  chunk: Optional[int] = None,
                  form: Optional[str] = None,
                  impl: str = "auto") -> jax.Array:
    """Exact log p(x) (...,). impl='auto' picks the grid-free Pallas kernel
    on TPU (ops/nade_ll_pallas.py — the training hot path never materializes
    the (N, D, H) activation grid); override with MULTINN_NADE_LL_IMPL=
    xla|pallas (perf A/B knob). Precedence matches ops/gibbs.py: an active
    ``ops.sampling.force_impl`` context WINS (global-view GSPMD programs
    cannot partition a Mosaic custom call); manual-mode (shard_map/seqpipe)
    step bodies keep the kernel live. ``chunk``/``form`` force the XLA
    formulations (nn/nade.py)."""
    if chunk is not None:
        return _nade.log_prob_chunked(x, w, v, bv, bh, chunk=chunk)
    impl = _pick_ll_impl(impl, form, w, x[..., 0].size)
    if impl == "pallas":
        from multinn_tpu.ops import nade_ll_pallas
        logits = nade_ll_pallas.nade_logits(x, w, v, bv, bh)
        return _nade.bernoulli_ll(logits, x).sum(axis=-1)
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
