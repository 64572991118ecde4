"""Parallelism layer (SURVEY §2.2/§5.8): device mesh with axes
``(data, track, model, seq)`` — DP + per-track expert parallelism +
tensor-parallel hidden dims (GSPMD) and a time-axis microbatch pipeline
(``seqpipe``, explicit ppermute). XLA:TPU compiles the collectives onto
ICI/DCN — there is no hand-written communication backend; this layer IS the
distributed story."""

from multinn_tpu.parallel.mesh import (  # noqa: F401
    MeshConfig, make_mesh, data_spec, replicated_spec, track_param_spec)
from multinn_tpu.parallel.seqpipe import SeqSpec  # noqa: F401
