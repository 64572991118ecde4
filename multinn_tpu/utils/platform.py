"""Platform selection helper.

Some environments (e.g. this one's axon PJRT boot hook) force the backend via
``jax.config`` at interpreter start, which pre-empts the ``JAX_PLATFORMS`` env
var. ``MULTINN_PLATFORM=cpu python train.py ...`` restores user control: the
CLIs call ``apply_platform_env()`` before any jax computation.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    platform = os.environ.get("MULTINN_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
