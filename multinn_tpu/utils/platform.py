"""Platform selection + persistent-compile-cache helpers.

Some environments (e.g. this one's axon PJRT boot hook) force the backend via
``jax.config`` at interpreter start, which pre-empts the ``JAX_PLATFORMS`` env
var. ``MULTINN_PLATFORM=cpu python train.py ...`` restores user control: the
CLIs call ``apply_platform_env()`` before any jax computation.

The same entry point wires JAX's persistent compilation cache: the first
process pays the full XLA (and, on tunneled TPUs, remote-compile) cost — every
later process deserializes the executable from disk in seconds. This is the
standard mitigation for the multi-minute cold start measured in BASELINE.md.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE = os.path.expanduser("~/.cache/multinn_tpu/xla-cache")
_OFF_VALUES = ("0", "off", "none", "disabled")


def enable_compilation_cache(cache_dir: str = None):
    """Point jax at an on-disk compilation cache (jax_compilation_cache_dir).

    Resolution order: explicit arg > ``MULTINN_COMPILE_CACHE`` env >
    ``~/.cache/multinn_tpu/xla-cache``. Set the env var to ``off`` to
    disable. Returns the active cache dir or None. Idempotent; safe to call
    before or after backend initialization (the config only affects
    compilations issued afterwards)."""
    explicit = bool(cache_dir or os.environ.get("MULTINN_COMPILE_CACHE"))
    cache_dir = cache_dir or os.environ.get("MULTINN_COMPILE_CACHE",
                                            _DEFAULT_CACHE)
    if not cache_dir or cache_dir.lower() in _OFF_VALUES:
        return None
    import jax
    # the IMPLICIT default dir is for accelerator backends only. The
    # cache exists to amortize the remote-TPU compile cost; CPU compiles
    # are fast AND caching them in a long-lived shared dir is actively
    # dangerous: XLA:CPU caches AOT executables keyed without the host's
    # CPU features, so an entry written by a machine with different
    # vector extensions segfaults/SIGILLs when deserialized later
    # (observed 2026-08-19: a cross-round ~/.cache entry with
    # +prefer-no-scatter/+avx512* flags this host lacks crashed the test
    # suite inside compilation_cache.get_executable_and_time). An
    # EXPLICIT dir (arg or MULTINN_COMPILE_CACHE) is honored on any
    # backend — same-machine CPU caching is the audit's tested mechanic.
    if not explicit and jax.default_backend() == "cpu":
        return None
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every program: the per-entry disk cost is tiny next to this
    # environment's 1-8 min remote-compile cold start (BASELINE.md)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir


def apply_platform_env() -> None:
    platform = os.environ.get("MULTINN_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
    enable_compilation_cache()
