"""Whole-generation fused Pallas kernels for MultINN (SURVEY hard parts
#1/#4 taken to their limit): the ENTIRE autoregressive loop — per-track bias
conditioning, the sampling inner loop (k-sweep Gibbs chain for RNN-RBM /
per-dimension conditional sweep for RNN-NADE), the cross-track feedback
context and the LSTM state advance for ALL tracks and ALL T steps — runs as
ONE device kernel with every weight and the carried state resident in VMEM.

Why: generation latency is not FLOP-bound (per-step matmuls are small) — it
is op-dispatch/HBM-latency bound in the lax.scan formulation (~69 µs/step
measured on v5e). Fusing the loop removes all per-step dispatch overheads.

This module is the STABLE PUBLIC SURFACE; the two kernel families live in
sibling modules (split at ~1000 LoC per the round-3 review):

  * gen_fused_rbm.py  — k-sweep Gibbs chain kernel; block-diagonal per-track
    matmul layout; bf16 weight-storage capacity mode (B=128 serving).
    Measured: 6.1 µs/step at B=1, same µs/step at B=8 (0.78 ms/song).
  * gen_fused_nade.py — per-dim conditional sweep kernel; dim-major padded
    block rows; speculative quad/pair sweep (spec=4: 17.7 µs/step at B=1).
  * gen_common.py     — shared layout/gate helpers (_eff_dims & friends).

Scope (auto-dispatch gate in models/multinn.py): EVERY model config —
any encoder (DBN latent rolls decode to pianoroll in XLA after the
kernel), LSTM or vanilla cells of any stack depth (layer-major state
rows; layer l consumes layer l-1's fresh h in-kernel), any inter-track
mode (joint enters as one track of the joint feature width — see
gen_common._eff_dims); rnn-rbm any batch that fits VMEM (gate measures
exactly; bf16 weight-storage capacity mode past the f32 budget), rnn-nade
batch 1 or a multiple of 8. Only VMEM overflow falls back to the scan path
— same distribution, different RNG stream (ops/sampling.py contract; full
64-bit keying via key_to_seeds).

VMEM gates: ``supported*()`` compute byte counts by ``jax.eval_shape`` over
the SAME ``_rbm_args``/``_nade_args`` builders the dispatch uses, plus the
actual scratch lists — the gate cannot drift from the kernel's allocation
(ops/vmem.py).
"""

from __future__ import annotations

from multinn_tpu.ops.gen_common import (_decoder_param_shapes, _eff_dims,
                                        _stack_joint)
from multinn_tpu.ops.gen_fused_nade import (_resolve_spec, generate_nade,
                                            supported_nade)
from multinn_tpu.ops.gen_fused_rbm import (generate_rbm, rbm_weight_dtype,
                                           supported)

__all__ = ["supported", "rbm_weight_dtype", "generate_rbm",
           "supported_nade", "generate_nade"]
