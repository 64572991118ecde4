"""multinn_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for multi-track
symbolic music generation, with the capabilities of the ilya16/MultINN reference
(TF1.x research code; see SURVEY.md for the capability inventory this build
implements: C1–C21).

Design principles (TPU-first, not a port):
  * All recurrences are time-major ``jax.lax.scan`` — one compiled program per
    train/generate call, zero per-step host round-trips.
  * CD-k Gibbs sampling and NADE per-dimension conditional sweeps are fused
    Pallas TPU kernels with pure-XLA fallbacks behind one dispatch interface
    (``multinn_tpu.ops``).
  * Parallelism is a ``jax.sharding.Mesh`` with axes ``(data, track)`` driven
    through ``shard_map`` — XLA:TPU compiles the collectives onto ICI/DCN;
    there is no hand-written communication backend (SURVEY §5.8).
  * Parameters live in ``flax.struct`` pytree dataclasses; every model API is a
    pure function of (params, inputs, rng).
"""

__version__ = "0.1.0"
