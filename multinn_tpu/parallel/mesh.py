"""Device mesh construction and PartitionSpecs (SURVEY §5.8).

Mesh axes (SURVEY §2.2's parallelism rows):

  * ``data``  — batch (DP). Gradients are psum-reduced across it; this is the
    core scaling axis [B:5]. Collectives ride ICI within a slice and DCN
    across slices — XLA:TPU places them; nothing here speaks NCCL/MPI.
  * ``track`` — the per-track modules of MultINN are independent experts
    (the EP analogue, SURVEY §2.2); per-track-stacked params shard their
    leading K axis here. The feedback architecture adds one all-gather of
    per-track latents per step [B:10].
  * ``model`` — tensor parallelism (Megatron-style column split): the RBM/NADE
    hidden dimension H is sharded, so the big (B·T, F) × (F, H) visible→hidden
    matmuls compute H/m columns per device and the free-energy softplus
    reduction over H becomes a psum the partitioner inserts. Not needed at
    reference scales (SURVEY §2.2 marks it optional) but fully implemented:
    ``MeshConfig.model > 1`` shards w/v/bh/wuh; bv/wuv/RNN cells replicate
    (the RNN is the small serial part — splitting it would put a collective
    inside every scan step for no FLOP win).
  * ``seq``   — time axis of teacher-forced training (parallel/seqpipe.py):
    windows are chunked over this axis and the RNN carry is handed device to
    device via ppermute in a microbatch pipeline (the SURVEY §2.2 SP row;
    generation stays unsharded — it is inherently sequential).

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
MODEL_AXIS = "model"        # tensor parallelism: RBM/NADE hidden dim
SEQ_AXIS = "seq"            # time-sharded teacher forcing (parallel/seqpipe)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """data=0 means 'all devices not used by other axes'; track=1 / model=1 /
    seq=1 disable those axes. use_mesh=False runs plain single-device jit (the
    default on one chip).

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
      * "seqpipe"   — time-axis parallelism (requires seq > 1): shard_map
        over (data, seq) where training windows chunk over ``seq`` and the
        RNN carry pipelines device-to-device via ppermute
        (parallel/seqpipe.py). A separate style because no GSPMD annotation
        can express a software pipeline — the partitioner would serialize a
        time-sharded scan. Composes with DP; track/model sharding stay
        gspmd-only.
    """

    use_mesh: bool = False
    data: int = 0
    track: int = 1
    model: int = 1
    seq: int = 1
    seq_microbatches: int = 0   # 0 = auto (seqpipe picks from local batch)
    style: str = "gspmd"

    def __post_init__(self):
        # loud, like unknown optimizer/lr_schedule — a typo'd style would
        # otherwise silently select the explicit shard_map path (different
        # batch placement, RNG folding, sampler-kernel selection)
        if self.style not in ("gspmd", "shard_map", "seqpipe"):
            raise ValueError(
                f"unknown mesh.style '{self.style}' "
                "(expected gspmd | shard_map | seqpipe)")

    def resolved_data(self, n_devices: int) -> int:
        if self.data > 0:
            return self.data
        other = self.track * self.model * self.seq
        if n_devices % other:
            raise ValueError(
                f"track*model*seq = {other} does not divide the device "
                f"count {n_devices}; set mesh.data explicitly or adjust "
                f"the axis sizes")
        return n_devices // other


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
    """Lay out the (data, track[, model][, seq]) mesh. Axes of size 1 beyond
    ``track`` are dropped so single-purpose meshes keep their simple shape
    (and their PartitionSpecs never name an absent axis)."""
    if not cfg.use_mesh:
        return None
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    d = cfg.resolved_data(n)
    sizes = [d, cfg.track]
    names = [DATA_AXIS, TRACK_AXIS]
    if cfg.model > 1:
        sizes.append(cfg.model)
        names.append(MODEL_AXIS)
    if cfg.seq > 1:
        sizes.append(cfg.seq)
        names.append(SEQ_AXIS)
    if int(np.prod(sizes)) != n:
        raise ValueError(
            f"mesh {'x'.join(map(str, sizes))} ({' x '.join(names)}) "
            f"!= device count {n}")
    arr = np.asarray(devices).reshape(*sizes)
    return Mesh(arr, tuple(names))


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

# Decoder param fields whose LAST axis is the RBM/NADE hidden dim H — the
# tensor-parallel (Megatron column-split) axis. bv/wuv (visible-dim) and the
# RNN cell stay replicated: splitting the cell would put a collective inside
# every scan step for tiny matmuls.
_HIDDEN_DIM_FIELDS = ("w", "v", "bh", "wuh")


def multinn_param_shardings(params, mesh: Mesh, track_sharded: bool):
    """NamedSharding tree matching a MultINNParams pytree.

    Per-track-STACKED subtrees (decoder always; encoder only in per-track
    mode) shard their leading K axis over ``track``; shared/joint subtrees
    replicate. If the mesh has a ``model`` axis, decoder fields with a hidden
    (H) last axis additionally shard it (TP). XLA SPMD propagates these
    through the whole train step — inserting the feedback architecture's
    cross-track latent gather and the TP free-energy psum over H.
    """
    mode = params.cfg.mode
    rep = NamedSharding(mesh, P())
    trk = NamedSharding(mesh, P(TRACK_AXIS))
    model_sharded = (MODEL_AXIS in mesh.axis_names
                     and mesh.shape[MODEL_AXIS] > 1)

    def shard_subtree(tree, stacked: bool):
        return jax.tree.map(lambda _: trk if stacked else rep, tree)

    dec_stacked = track_sharded and mode in ("per-track", "feedback",
                                             "hybrid")
    enc_stacked = track_sharded and mode == "per-track"
    decoder = shard_subtree(params.decoder, dec_stacked)
    if model_sharded:
        def hidden_sharding(leaf):
            spec = [TRACK_AXIS] if dec_stacked else []
            spec += [None] * (leaf.ndim - len(spec) - 1) + [MODEL_AXIS]
            return NamedSharding(mesh, P(*spec))

        updates = {
            name: jax.tree.map(hidden_sharding, getattr(params.decoder, name))
            for name in _HIDDEN_DIM_FIELDS
            if getattr(params.decoder, name, None) is not None
        }
        decoder = decoder.replace(**updates)
    return params.replace(
        encoder=shard_subtree(params.encoder, enc_stacked),
        decoder=decoder)


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
    # one pytree device_put (batched transfer), not one dispatch per leaf
    return jax.device_put(params, shardings)
