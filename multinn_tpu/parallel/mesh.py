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
    chip).

    style selects how the step is partitioned:
      * "gspmd"     — params/batch are device_put with NamedShardings and the
        jitted global-view step is partitioned by XLA's SPMD propagation;
        supports data × track simultaneously (the feedback architecture's
        per-step latent all-gather is inserted by the partitioner). This is
        the default and the only style that shards the track axis.
      * "shard_map" — the fully-explicit collective path of SURVEY §5.8:
        per-shard code with hand-written pmean of grads and psum of eval
        sums over the data axis. Feature parity with gspmd for DP training
        (incl. fused multi-step programs and exact short-tail eval via
        zero-mask padding); track sharding deliberately stays gspmd-only —
        the cross-track feedback gather is exactly what SPMD propagation is
        for, and duplicating it by hand would be a second implementation of
        the model's coupling semantics.
    """

    use_mesh: bool = False
    data: int = 0
    track: int = 1
    style: str = "gspmd"

    def resolved_data(self, n_devices: int) -> int:
        if self.data > 0:
            return self.data
        assert n_devices % self.track == 0, (n_devices, self.track)
        return n_devices // self.track


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (SURVEY §5.8): call once per process BEFORE
    make_mesh on multi-host pods; after this, ``jax.devices()`` spans the
    slice and the (data, track) mesh lays out over ICI within a slice and DCN
    across slices (XLA places the collectives — no transport code here).
    Arguments default to TPU auto-detection (GCE metadata / megascale env).
    JAX/TPU jobs are gang-scheduled; there is no elastic membership (§5.3) —
    recovery is checkpoint-resume."""
    import jax
    kwargs = {}
    if coordinator is not None:
        kwargs.update(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


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


# ---------------------------------------------------------------------------
# GSPMD shardings for MultINN pytrees (dp × track)
# ---------------------------------------------------------------------------

def multinn_param_shardings(params, mesh: Mesh, track_sharded: bool):
    """NamedSharding tree matching a MultINNParams pytree.

    Per-track-STACKED subtrees (decoder always; encoder only in per-track
    mode) shard their leading K axis over ``track``; shared/joint subtrees
    replicate. XLA SPMD propagates these through the whole train step —
    including the feedback architecture's cross-track latent gather.
    """
    mode = params.cfg.mode
    rep = NamedSharding(mesh, P())
    trk = NamedSharding(mesh, P(TRACK_AXIS))

    def shard_subtree(tree, stacked: bool):
        return jax.tree.map(lambda _: trk if stacked else rep, tree)

    dec_stacked = track_sharded and mode in ("per-track", "feedback",
                                             "hybrid")
    enc_stacked = track_sharded and mode == "per-track"
    return params.replace(
        encoder=shard_subtree(params.encoder, enc_stacked),
        decoder=shard_subtree(params.decoder, dec_stacked))


def batch_sharding(mesh: Mesh, track_sharded: bool,
                   stacked: bool = False) -> NamedSharding:
    """(B, T, K, D) pianoroll batches: B over data, K over track.
    ``stacked`` handles (N, B, T, K, D) multi-step super-batches (leading
    steps axis unsharded)."""
    lead = (None,) if stacked else ()
    if track_sharded:
        return NamedSharding(mesh, P(*lead, DATA_AXIS, None, TRACK_AXIS,
                                     None))
    return NamedSharding(mesh, P(*lead, DATA_AXIS))


def put_multinn_sharded(params, mesh: Optional[Mesh],
                        track_sharded: bool = False):
    if mesh is None:
        return params
    shardings = multinn_param_shardings(params, mesh, track_sharded)
    return jax.tree.map(jax.device_put, params, shardings)
