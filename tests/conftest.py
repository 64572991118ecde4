"""Test harness config: run every test on a virtual 8-device CPU mesh
(SURVEY §4.4 — the standard JAX recipe for testing sharding without a pod).

Note: this environment's sitecustomize imports jax at interpreter start to
register the axon TPU backend, so env vars alone are too late — we must update
jax.config directly (backends are not initialized until first use, so this is
still early enough).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
