"""Parallelism layer (SURVEY §2.2/§5.8): device mesh with axes
``(data, track)`` (``seq`` reserved), shard_map-wrapped train/generate steps.
XLA:TPU compiles the collectives onto ICI/DCN — there is no hand-written
communication backend; this layer IS the distributed story."""

from multinn_tpu.parallel.mesh import (  # noqa: F401
    MeshConfig, make_mesh, data_spec, replicated_spec, track_param_spec)
