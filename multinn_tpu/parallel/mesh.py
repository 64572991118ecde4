"""Device mesh construction and PartitionSpecs (SURVEY §5.8).

The mesh has two active axes (a third, ``seq``, is reserved — SURVEY §2.2):

  * ``data``  — batch (DP). Gradients are psum-reduced across it; this is the
    core scaling axis [B:5]. Collectives ride ICI within a slice and DCN
    across slices — XLA:TPU places them; nothing here speaks NCCL/MPI.
  * ``track`` — the per-track modules of MultINN are independent experts
    (the EP analogue, SURVEY §2.2); per-track-stacked params shard their
    leading K axis here. The feedback architecture adds one all-gather of
    per-track latents per step [B:10].

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` (the
driver's gang scheduler handles process launch; §5.3 — no elastic membership).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TRACK_AXIS = "track"
SEQ_AXIS = "seq"            # reserved (time-sharded scan design slot, §2.2)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """data=0 means 'all devices not used by track'; track=1 disables track
    sharding. use_mesh=False runs plain single-device jit (the default on one
    chip)."""

    use_mesh: bool = False
    data: int = 0
    track: int = 1

    def resolved_data(self, n_devices: int) -> int:
        if self.data > 0:
            return self.data
        assert n_devices % self.track == 0, (n_devices, self.track)
        return n_devices // self.track


def make_mesh(cfg: MeshConfig,
              devices: Optional[list] = None) -> Optional[Mesh]:
    if not cfg.use_mesh:
        return None
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    d = cfg.resolved_data(n)
    t = cfg.track
    if d * t != n:
        raise ValueError(
            f"mesh {d}x{t} (data x track) != device count {n}")
    arr = np.asarray(devices).reshape(d, t)
    return Mesh(arr, (DATA_AXIS, TRACK_AXIS))


def data_spec(mesh: Optional[Mesh]) -> P:
    """Batch arrays: shard the leading (batch) axis over ``data``."""
    return P(DATA_AXIS) if mesh is not None else P()


def replicated_spec() -> P:
    return P()


def track_param_spec(mesh: Optional[Mesh], track_sharded: bool) -> P:
    """Per-track-stacked parameter leaves: shard leading K over ``track``."""
    if mesh is not None and track_sharded:
        return P(TRACK_AXIS)
    return P()


def put_replicated(tree, mesh: Optional[Mesh]):
    """Replicate a pytree across the mesh (params/opt state under DP)."""
    if mesh is None:
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def put_data_sharded(array, mesh: Optional[Mesh]):
    if mesh is None:
        return array
    return jax.device_put(array, NamedSharding(mesh, P(DATA_AXIS)))
