"""Generation engine (SURVEY C14/L5; reference counterpart ``generator.py``).

Primes model state on a seed pianoroll, autoregressively samples T steps for
all tracks, assembles the multi-track pianoroll and writes ``.mid`` via the
first-party MIDI writer. The reference's per-step ``sess.run`` chatter
(SURVEY call stack 3.2) is replaced by ONE jitted lax.scan device program for
the whole generation — the <1 s 64-bar target lives here [B:5].
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multinn_tpu.data import pianoroll as pr
from multinn_tpu.models import multinn


def _transport(roll: jnp.ndarray, packed) -> jnp.ndarray:
    """Device-side transport stage shared by every generation program.
    ``packed`` (static): False ships uint8 frames (4x fewer bytes than
    f32); True bit-packs the pitch axis (8x more — ops/bitpack);
    "sparse" ships only the nonzero packed bytes (~3.4x fewer bytes
    again at musical densities — ops/sparsebytes) alongside the packed
    roll (the lazily held overflow fallback: only the arrays
    fetch_rolls actually pulls cross the device->host link)."""
    if packed == "sparse":
        from multinn_tpu.ops import bitpack, sparsebytes
        pk = bitpack.pack_rolls(roll)
        buf, count = sparsebytes.sparse_pack(
            pk, sparsebytes.record_cap(pk.size))
        return {"sparse": buf, "count": count, "packed": pk}
    if packed:
        from multinn_tpu.ops import bitpack
        return bitpack.pack_rolls(roll)
    return roll.astype(jnp.uint8)


class Generator:
    """Public generator API (B:5). Shares the trainer's checkpoint artifact:
    construct with params restored by ``Trainer.restore`` or fresh ones."""

    def __init__(self, cfg, params: multinn.MultINNParams, mesh=None,
                 track_sharded: bool = None):
        """``mesh``: optional jax.sharding.Mesh — generation batch-shards
        over the ``data`` axis (sampling is per-sequence independent, so DP
        is embarrassingly parallel across chips) and, with ``track_sharded``
        (default: from cfg.mesh under gspmd), shards the per-track expert
        modules over the ``track`` axis: the feedback architecture's
        cross-track context assembly inside the sampling scan becomes the
        per-step latent all-gather, inserted by the SPMD partitioner
        [B:10] — same collective as training (SURVEY §2.2 EP row)."""
        self.cfg = cfg
        self.mesh = mesh
        if track_sharded is None:
            mesh_cfg = getattr(cfg, "mesh", None)
            track_sharded = bool(mesh_cfg is not None
                                 and mesh_cfg.track > 1
                                 and mesh_cfg.style == "gspmd")
        self.track_sharded = track_sharded and mesh is not None
        if mesh is not None:
            from multinn_tpu.parallel import mesh as mesh_mod
            if self.track_sharded:
                params = mesh_mod.put_multinn_sharded(params, mesh,
                                                      track_sharded=True)
            else:
                params = mesh_mod.put_replicated(params, mesh)
        self.params = params
        # set by sparse-transport fetches (serving size_hint/demotion
        # feedback)
        self.last_sparse_count = None
        self.last_sparse_overflowed = False
        self._sparse_slicer = None    # lazily-built chunk-fetch program
        # the fused whole-generation kernels are single-chip programs; under
        # a multi-device mesh force the (GSPMD-shardable) scan path
        self._multi_device = mesh is not None and mesh.size > 1
        multi_device = self._multi_device
        fused = False if multi_device else None

        gibbs_k = getattr(cfg.generate, "gibbs_k", 0) or None
        # sampling temperature (static float -> baked into the compiled
        # program; priming stays untempered — multinn.generate tempers only
        # the decoder params/decode conditional, never the encode pass)
        temperature = float(getattr(cfg.generate, "temperature", 1.0))

        def _impl(params, key, seed, n_steps: int, batch: int,
                  packed):
            state = multinn.init_state(params, batch)
            if seed is not None:
                state = multinn.prime(params, state, seed)
            elif self._multi_device:
                # UNSEEDED mesh generation: the state is built inside jit
                # from replicated params, so nothing would push the batch
                # onto the data axis — constrain it explicitly (seeded runs
                # inherit the sharding from the device_put seed instead)
                state = self._constrain_state_batch(state, batch)
            # generate.gibbs_k overrides the model's gen_k (0 = model default)
            _, roll = multinn.generate(params, key, state, n_steps,
                                       fused=fused, k=gibbs_k,
                                       temperature=temperature)
            return _transport(roll, packed)

        # one compiled program per (n_steps, batch, packed, seed-shape)
        self._jit_impl = jax.jit(_impl, static_argnames=("n_steps", "batch",
                                                         "packed"))

        def _accomp_impl(params, key, given, seed, tracks, packed):
            state = multinn.init_state(params, given.shape[0])
            if seed is not None:
                state = multinn.prime(params, state, seed)
            _, roll = multinn.generate_accompaniment(
                params, key, state, given, tracks, k=gibbs_k,
                temperature=temperature, fused=fused,
                # a track-sharded decoder stack keeps the uniformly sharded
                # all-K sweep: the subset gather would insert per-step
                # cross-shard collectives (see generate_accompaniment)
                subset=not self.track_sharded)
            return _transport(roll, packed)   # same contract as _impl

        # one compiled program per (given-shape, tracks, seed-shape, packed)
        self._jit_accomp = jax.jit(_accomp_impl,
                                   static_argnames=("tracks", "packed"))

    def _constrain_state_batch(self, state, batch: int):
        """Trace-time sharding constraint pinning an UNSEEDED generation
        state's batch axis to the mesh's ``data`` axis (and, when track-
        sharded, the decoder states' leading K axis to ``track``), so DP
        generation parallelizes without a primed seed. ``batch`` is static;
        unshardable batches stay replicated (still correct, just serial)."""
        from multinn_tpu.parallel import mesh as mesh_mod
        n_data = self.mesh.shape[mesh_mod.DATA_AXIS]
        if batch % n_data:
            return state
        constrain = jax.lax.with_sharding_constraint
        if self.cfg.model.mode == "joint":       # state leaves: (B, ...)
            dec_spec = mesh_mod.P(mesh_mod.DATA_AXIS)
        else:                                    # state leaves: (K, B, ...)
            lead = mesh_mod.TRACK_AXIS if self.track_sharded else None
            dec_spec = mesh_mod.P(lead, mesh_mod.DATA_AXIS)
        decoder = jax.tree.map(
            lambda leaf: constrain(
                leaf, mesh_mod.NamedSharding(self.mesh, dec_spec)),
            state.decoder)
        ctx = state.ctx
        if ctx is not None:                      # (B, K*F)
            ctx = constrain(ctx, mesh_mod.NamedSharding(
                self.mesh, mesh_mod.P(mesh_mod.DATA_AXIS)))
        return state.replace(decoder=decoder, ctx=ctx)

    def _generate_impl(self, key, seed, n_steps: int, batch: int,
                       packed: bool = False):
        if self.mesh is not None and seed is not None:
            from multinn_tpu.parallel import mesh as mesh_mod
            n_data = self.mesh.shape[mesh_mod.DATA_AXIS]
            if seed.shape[0] % n_data:
                spec = mesh_mod.P()          # unshardable small batch
            else:
                spec = (mesh_mod.P(mesh_mod.DATA_AXIS, None,
                                   mesh_mod.TRACK_AXIS, None)
                        if self.track_sharded
                        else mesh_mod.P(mesh_mod.DATA_AXIS))
            seed = jax.device_put(
                seed, mesh_mod.NamedSharding(self.mesh, spec))
        # per-step Pallas sampler kernels are Mosaic custom calls that XLA's
        # SPMD partitioner cannot shard — on a multi-device mesh force the
        # (fully partitionable) XLA formulations at trace time (first call
        # per shape traces; later calls hit the jit cache)
        from multinn_tpu.ops import sampling
        with sampling.partitionable_ctx(self.mesh):
            return self._jit_impl(self.params, key, seed, n_steps, batch,
                                  packed)

    def generate_async(self, key: jax.Array, n_steps: int,
                       batch: int = 1,
                       seed: Optional[np.ndarray] = None,
                       packed=False) -> jax.Array:
        """Dispatch one generation WITHOUT blocking on the result: returns
        the lazy device array (model-space roll, (batch, n_steps, K, D)
        uint8 — or (batch, n_steps, K, ceil(D/8)) bit-packed when
        ``packed=True``, see ops/bitpack.unpack_rolls; or, when
        ``packed="sparse"``, a dict of lazy device arrays in the
        sparse-byte transport, decoded by fetch_rolls —
        ops/sparsebytes); materialize with np.asarray / fetch_rolls when
        needed. ``seed``: optional (batch, T_seed, K, D)
        model-space priming roll (one compiled program per seed shape).
        This is the serving building block (multinn_tpu/serving): JAX
        dispatch is asynchronous, so a serving loop that submits batches
        back-to-back pipelines the host dispatch floor behind device work,
        and ``packed`` cuts the drain's device->host bytes 8x — "sparse"
        a further ~3.4x at musical densities (the serving
        bottleneck at full 64-bar payloads — BASELINE.md)."""
        seed_dev = (None if seed is None
                    else jnp.asarray(seed).astype(jnp.float32))
        if seed_dev is not None and seed_dev.shape[0] != batch:
            raise ValueError(f"seed batch {seed_dev.shape[0]} != {batch}")
        return self._generate_impl(key, seed_dev, n_steps, batch, packed)

    def generate(self, key: jax.Array, n_steps: int,
                 seed: Optional[np.ndarray] = None,
                 batch: Optional[int] = None) -> np.ndarray:
        """Returns a binary pianoroll (batch, n_steps, K, D) on host.
        ``seed``: optional (batch, T_seed, K, D) priming pianoroll; when
        given, batch defaults to the seed's — an EXPLICIT conflicting batch
        raises, same contract as generate_async (silently returning a
        different sample count than asked is worse than the error)."""
        seed_dev = (None if seed is None
                    else jnp.asarray(seed).astype(jnp.float32))
        if seed_dev is not None:
            if batch is not None and batch != seed_dev.shape[0]:
                raise ValueError(
                    f"seed batch {seed_dev.shape[0]} != batch {batch}")
            batch = seed_dev.shape[0]
        elif batch is None:
            batch = 1
        # transport bit-packed and unpack on host (8x fewer device->host
        # bytes; bit-exact — ops/bitpack): the fetch, not generation,
        # dominates wall time for big sample batches
        packed = self._generate_impl(key, seed_dev, n_steps, batch,
                                     packed=True)
        return self.fetch_rolls(packed)

    def accompany_async(self, key: jax.Array, given: np.ndarray,
                        given_tracks, seed: Optional[np.ndarray] = None,
                        packed=False) -> jax.Array:
        """Dispatch one track-conditional generation WITHOUT blocking: fix
        ``given_tracks`` to the MODEL-SPACE roll ``given`` (B, T, K, D) and
        sample the rest (multinn.generate_accompaniment — conditioning
        binds in the feedback architecture). ``seed``: optional
        (B, T_seed, K, D) priming roll. Returns the lazy device array
        (uint8 roll, or bit-packed when ``packed`` — decode with
        fetch_rolls); this is the serving building block, mirroring
        generate_async."""
        given_dev = jnp.asarray(given).astype(jnp.float32)
        seed_dev = (None if seed is None
                    else jnp.asarray(seed).astype(jnp.float32))
        if seed_dev is not None and seed_dev.shape[0] != given_dev.shape[0]:
            raise ValueError(f"seed batch {seed_dev.shape[0]} != "
                             f"given batch {given_dev.shape[0]}")
        if self.mesh is not None:
            # batch-shard the given roll (and seed) over the data axis,
            # mirroring _generate_impl's seed placement — sampling is
            # per-sequence independent, so DP accompaniment parallelizes
            from multinn_tpu.parallel import mesh as mesh_mod
            n_data = self.mesh.shape[mesh_mod.DATA_AXIS]
            spec = (mesh_mod.P(mesh_mod.DATA_AXIS)
                    if given_dev.shape[0] % n_data == 0 else mesh_mod.P())
            sharding = mesh_mod.NamedSharding(self.mesh, spec)
            given_dev = jax.device_put(given_dev, sharding)
            if seed_dev is not None:
                seed_dev = jax.device_put(seed_dev, sharding)
        from multinn_tpu.ops import sampling
        with sampling.partitionable_ctx(self.mesh):
            return self._jit_accomp(self.params, key, given_dev, seed_dev,
                                    tuple(int(i) for i in given_tracks),
                                    packed)

    def accompany(self, key: jax.Array, given: np.ndarray,
                  given_tracks, seed: Optional[np.ndarray] = None
                  ) -> np.ndarray:
        """Blocking accompany_async: returns a binary (B, T, K, D) uint8
        pianoroll on host whose given-track slices equal ``given``
        bit-exactly. Ships bit-packed (8x fewer device->host bytes;
        fetch_rolls is the single decode point)."""
        packed = self.accompany_async(key, given, given_tracks, seed=seed,
                                      packed=True)
        return self.fetch_rolls(packed)

    def fetch_rolls(self, packed, size_hint: Optional[int] = None
                    ) -> np.ndarray:
        """Materialize a generation result to (batch, n_steps, K, D)
        uint8 on host. The transport contract's SINGLE decode point —
        every consumer (generate() above, the serving drain) goes
        through here. Accepts either transport: a bit-packed roll
        (``packed=True`` dispatch) or a sparse-record dict
        (``packed="sparse"``) — for sparse, only the count scalar and a
        bucket-quantized valid prefix of the record buffer cross the
        device->host link; overflow (the count is exact) falls back to
        the dict's lazily-held packed roll. ``size_hint`` (sparse only,
        e.g. the previous batch's count in a serving loop) sizes the
        prefix fetch BEFORE the count is known, saving the count's
        round trip in the common case; a too-small hint costs one
        refetch, never correctness."""
        from multinn_tpu.ops import bitpack
        if isinstance(packed, dict):
            return self._fetch_sparse_rolls(packed, size_hint)
        return bitpack.unpack_rolls(np.asarray(jax.device_get(packed)),
                                    self.cfg.model.n_pitches)

    def _sparse_chunk_dev(self, buf, i: int):
        """Device array for chunk ``i`` of a record buffer, through the
        ONE cached dynamic_slice program (the chunk start is a traced
        argument — on this environment's remote-compile tunnel every new
        program SHAPE costs minutes cold, so the adaptive prefix fetch
        must not mint a program per length; ops/sparsebytes docstring)."""
        from multinn_tpu.ops import sparsebytes
        if self._sparse_slicer is None:
            chunk = sparsebytes.FETCH_CHUNK

            def _slice(b, start):
                return jax.lax.dynamic_slice(
                    b, (start, 0), (min(chunk, b.shape[0]), b.shape[1]))

            self._sparse_slicer = jax.jit(_slice)
        return self._sparse_slicer(buf, i * sparsebytes.FETCH_CHUNK)

    def _fetch_sparse_rolls(self, out, size_hint: Optional[int]
                            ) -> np.ndarray:
        from multinn_tpu.ops import bitpack, sparsebytes
        cap = out["sparse"].shape[0]
        # the count and the first chunk(s) travel in ONE device_get (the
        # per-fetch round trip through the tunnel rivals the payload
        # time); chunk 0 is always needed, and ``size_hint`` (a serving
        # loop passes the previous batch's count) widens the prefetch so
        # the typical batch needs no second round trip at all
        n_pre = (sparsebytes.n_chunks(int(size_hint * 1.25))
                 if size_hint else 1)
        n_pre = min(n_pre, sparsebytes.n_chunks(cap))
        devs = [self._sparse_chunk_dev(out["sparse"], i)
                for i in range(n_pre)]
        got = jax.device_get([out["count"]] + devs)
        count = int(np.asarray(got[0]))
        chunks = [np.asarray(g) for g in got[1:]]
        # serving loops read these back: the count as the next batch's
        # size_hint, the overflow flag to demote a too-dense model's
        # service to the packed fallback (serving/service.py). An
        # over-cap count must NOT become a hint — it would prefetch the
        # ENTIRE record buffer (1.25x the packed bytes) before the next
        # overflow is even detected.
        self.last_sparse_overflowed = count > cap
        self.last_sparse_count = None if self.last_sparse_overflowed \
            else count
        if self.last_sparse_overflowed:   # buffer overflow: frame fallback
            return self.fetch_rolls(out["packed"])
        for i in range(n_pre, sparsebytes.n_chunks(count)):
            chunks.append(np.asarray(jax.device_get(
                self._sparse_chunk_dev(out["sparse"], i))))
        buf = np.concatenate(chunks, axis=0) if len(chunks) > 1 else chunks[0]
        pk = sparsebytes.sparse_unpack(buf, count, out["packed"].shape)
        return bitpack.unpack_rolls(pk, self.cfg.model.n_pitches)

    def finalize(self, rolls: np.ndarray) -> np.ndarray:
        """Model-space rolls -> user-facing FRAME pianorolls: decode the
        data encoding (onset/hold -> sounding frames, no-op for 'frame'),
        then the opt-in generate.{gap_fill_steps,min_note_steps}
        post-processing. Everything user-facing (MIDI, PNGs, the saved
        .npz, musical metrics) consumes finalized rolls; raw model-space
        rolls stay available via generate()."""
        rolls = pr.decode_rolls(rolls, self.cfg.data.encoding)
        gcfg = self.cfg.generate
        gap = getattr(gcfg, "gap_fill_steps", 0)
        min_steps = getattr(gcfg, "min_note_steps", 0)
        if gap or min_steps:
            rolls = pr.postprocess_roll(rolls, gap, min_steps)
        return rolls

    def to_midi(self, roll: np.ndarray, path: str,
                bpm: float = 120.0) -> None:
        """Write one FRAME pianoroll (T, K, D) as a .mid file (finalize()
        model-space rolls first when data.encoding != 'frame')."""
        spec = self.cfg.data.spec()
        mid = pr.roll_to_midi(roll, spec, bpm=bpm)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        from multinn_tpu.data import midi as midi_mod
        midi_mod.save(mid, path)

    def write_files(self, rolls: np.ndarray, out_dir: str,
                    prefix: str = "sample", bpm: float = 120.0,
                    write_images: bool = True) -> list:
        """Write finalized frame rolls (batch, T, K, D) as MIDI files (+ a
        pianoroll PNG grid, C19) into ``out_dir``; returns the MIDI paths.
        The single output-layout point for generate_to_files AND the
        accompaniment CLI path."""
        os.makedirs(out_dir, exist_ok=True)
        paths = []
        for i in range(rolls.shape[0]):
            p = os.path.join(out_dir, f"{prefix}_{i:03d}.mid")
            self.to_midi(rolls[i], p, bpm=bpm)
            paths.append(p)
        if write_images:
            from multinn_tpu.utils.images import save_sample_grid
            save_sample_grid(rolls, out_dir, prefix=prefix)
        return paths

    def generate_to_files(self, key: jax.Array, out_dir: str,
                          n_samples: int, n_steps: int,
                          seed: Optional[np.ndarray] = None,
                          bpm: float = 120.0,
                          write_images: bool = True) -> Tuple[np.ndarray, list]:
        """Returns (finalized frame rolls, written MIDI paths)."""
        rolls = self.generate(key, n_steps, seed=seed,
                              batch=(seed.shape[0] if seed is not None
                                     else n_samples))
        rolls = self.finalize(rolls)
        paths = self.write_files(rolls[:n_samples], out_dir, bpm=bpm,
                                 write_images=write_images)
        return rolls, paths
