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
  * Parallelism is a ``jax.sharding.Mesh`` with axes ``(data, track,
    model, seq)`` — DP, per-track expert parallelism, tensor-parallel hidden
    dims and a time-axis ppermute pipeline (``parallel/seqpipe.py``); XLA:TPU
    compiles the collectives onto ICI/DCN; there is no hand-written
    communication backend (SURVEY §5.8).
  * Parameters live in ``flax.struct`` pytree dataclasses; every model API is a
    pure function of (params, inputs, rng).
"""

__version__ = "0.1.0"

# Public API surface (B:5: model / trainer / generator). Lazy so that
# importing the package does not initialize a JAX backend prematurely.
_EXPORTS = {
    "MultINNConfig": ("multinn_tpu.models.multinn", "MultINNConfig"),
    "MultINNParams": ("multinn_tpu.models.multinn", "MultINNParams"),
    "multinn": ("multinn_tpu.models", "multinn"),
    "Trainer": ("multinn_tpu.training.trainer", "Trainer"),
    "Generator": ("multinn_tpu.training.generator", "Generator"),
    "Dataset": ("multinn_tpu.data.datasets", "Dataset"),
    "DataConfig": ("multinn_tpu.data.datasets", "DataConfig"),
    "ExperimentConfig": ("multinn_tpu.utils.config", "ExperimentConfig"),
    "TrainConfig": ("multinn_tpu.utils.config", "TrainConfig"),
    "GenerateConfig": ("multinn_tpu.utils.config", "GenerateConfig"),
    "MeshConfig": ("multinn_tpu.parallel.mesh", "MeshConfig"),
    "load_config": ("multinn_tpu.utils.config", "load_json"),
}


def __getattr__(name):
    if name in _EXPORTS:
        import importlib
        module, attr = _EXPORTS[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'multinn_tpu' has no attribute '{name}'")


def __dir__():
    return sorted(list(globals()) + list(_EXPORTS))
