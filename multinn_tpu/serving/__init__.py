"""Production serving runtime for trained MultINN models.

Beyond reference parity: the reference (single-process TF1 research code,
SURVEY §0/§1) has no serving layer; this subsystem packages the measured
pipelined-serving recipe (BASELINE.md serving rows) as a deployable
component — continuous batching over the fused whole-generation kernels,
async-dispatch pipelining to hide the host dispatch floor, and a
dependency-free HTTP front end (serve.py at the repo root).
"""

from multinn_tpu.serving.service import (GenerationService, ServeConfig,
                                         ServeResult)

__all__ = ["GenerationService", "ServeConfig", "ServeResult"]
