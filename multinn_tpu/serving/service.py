"""Continuous-batching generation service (serving runtime core).

The reference has no serving layer (single-process TF1 research code —
SURVEY §0/§1); this is the TPU-native serving story for the same models,
built from three measured facts (BASELINE.md):

  * the fused whole-generation kernels amortize the serial sampling chain
    almost perfectly over the batch axis (B=128 RBM serving runs at the
    same µs/step as B=1), so a server wants FIXED, LARGE batches;
  * JAX dispatch is asynchronous — submitting the next batch while the
    previous executes hides the per-execute host floor (~30 ms through
    this environment's tunnel; measured +46–53% steady-state throughput,
    BASELINE "PIPELINED serving" rows);
  * XLA programs are shape-specialized — a server compiles ONE
    (batch, n_steps) program up front and never recompiles.

So the service is: a request queue -> a dispatcher thread that coalesces
up to ``batch`` requests per device call (waiting at most ``max_wait_ms``
after the first request of a batch; under-full batches run padded — the
program shape never changes) -> a bounded in-flight window of
``pipeline_depth`` dispatched batches -> a drainer thread that fetches
results, decodes the data encoding + post-processing (Generator.finalize
semantics), and resolves per-request futures.

With ``seed_steps > 0`` requests may carry a priming seed roll (the
continuation use-case): seeds normalize to ONE fixed shape (crop/left-pad
to seed_steps model-space frames), so seeded serving adds exactly one more
compiled program; seeded and unseeded requests coalesce into separate
batches (different programs), each keeping its queue position.

RNG contract: batch ``i`` samples under ``fold_in(PRNGKey(seed), i)``;
a request's provenance ``(batch_index, row)`` therefore pins its exact
sample stream. Per-request reproducibility across server runs requires
the same arrival order (same batch composition) — documented, not
promised, serving behavior.
"""

from __future__ import annotations

import collections
import dataclasses
import threading
import time
from concurrent.futures import Future
from typing import List, Optional

import numpy as np


@dataclasses.dataclass(frozen=True)
class ServeConfig:
    """Server knobs (CLI-exposed by serve.py)."""
    batch: int = 0             # 0 = auto: largest fused-gate-admitted batch
    n_steps: int = 0           # 0 = cfg.generate.n_steps
    max_wait_ms: float = 5.0   # batching window after the first request
    pipeline_depth: int = 3    # max dispatched-but-unfetched device batches
    seed: int = 0              # base RNG seed (batch i uses fold_in(seed, i))
    history: int = 1024        # latency samples kept for percentile stats
    seed_steps: int = 0        # >0 enables PRIMED requests: a request may
    #                            carry a frame-space seed roll, normalized to
    #                            exactly this many model-space frames (crop
    #                            to the last seed_steps / left-pad zeros), so
    #                            seeded serving is ONE more compiled program
    #                            shape, not one per request. Requests
    #                            coalesce per kind (seeded vs unseeded).
    accompany_tracks: tuple = ()  # non-empty enables ACCOMPANIMENT requests:
    #                            a request may carry a frame-space roll whose
    #                            listed tracks are fixed while the rest are
    #                            sampled (Generator.accompany — conditioning
    #                            binds in the feedback architecture). The
    #                            track set is fixed at service construction
    #                            and rolls normalize to accompany_steps
    #                            frames, so this too is ONE more compiled
    #                            program shape.
    accompany_steps: int = 0   # accompaniment output length (0 = n_steps)
    transport: str = "auto"    # device->host roll transport: "packed"
    #                            (bit-packed frames, ops/bitpack) |
    #                            "sparse" (nonzero packed bytes + packed
    #                            overflow fallback, ops/sparsebytes —
    #                            wins when the payload is large and
    #                            musically sparse) |
    #                            "auto" (sparse iff the packed batch
    #                            payload exceeds _SPARSE_AUTO_BYTES — the
    #                            regime where the drain fetch is the
    #                            bottleneck, BASELINE "SERVING SERVICE")


@dataclasses.dataclass
class ServeResult:
    """Resolved value of one request's future."""
    roll: np.ndarray           # finalized FRAME pianoroll (n_steps, K, D)
    batch_index: int           # provenance: which device batch
    row: int                   # provenance: row within the batch
    queue_s: float             # enqueue -> dispatch
    total_s: float             # enqueue -> resolution


class _Request:
    """One queued generation; ``future`` is a stdlib
    concurrent.futures.Future resolving to a ServeResult (``result(timeout)``
    raises the builtin TimeoutError on expiry)."""
    __slots__ = ("future", "t_enqueue", "seed", "given")

    def __init__(self, seed: Optional[np.ndarray] = None,
                 given: Optional[np.ndarray] = None):
        self.future = Future()
        self.t_enqueue = time.time()
        self.seed = seed       # normalized model-space (seed_steps, K, D)
        self.given = given     # normalized model-space (accompany_steps,K,D)

    @property
    def kind(self) -> str:
        """One compiled device program per kind; batches hold one kind."""
        if self.given is not None:
            return "accompany"
        return "seeded" if self.seed is not None else "plain"


def _resolve_transport(choice: str, cfg, batch: int, n_steps: int):
    """ServeConfig.transport -> the Generator ``packed`` flag. "auto"
    picks sparse iff the bit-packed batch payload is at least 2x the
    sparse path's MINIMUM possible fetch (one whole record chunk +
    count): below that, sparse strictly ships more bytes than packed —
    its smallest fetch is a fixed FETCH_CHUNK*RECORD_BYTES = 1.31 MB
    (ops/sparsebytes). ``n_steps`` must be the LARGEST program the
    service dispatches (callers fold in accompany_steps) — transport is
    a per-service choice, so size it for the dominant payload."""
    if choice not in ("auto", "packed", "sparse"):
        raise ValueError(f"transport must be auto|packed|sparse, "
                         f"got {choice!r}")
    if choice == "auto":
        from multinn_tpu.ops import bitpack, sparsebytes
        packed_bytes = (batch * n_steps * cfg.model.n_tracks
                        * bitpack.packed_width(cfg.model.n_pitches))
        min_sparse = sparsebytes.FETCH_CHUNK * sparsebytes.RECORD_BYTES
        return "sparse" if packed_bytes >= 2 * min_sparse else True
    return "sparse" if choice == "sparse" else True


def auto_batch(cfg, n_steps: int) -> int:
    """Largest fused-kernel-gate-admitted serving batch for this config on
    this device (the gates measure real VMEM byte counts — ops/gen_fused);
    8 when nothing is admitted (the scan path still serves, just slower)."""
    from multinn_tpu.ops import gen_fused
    if cfg.model.decoder_type == "rnn-nade":
        cands = (8, 16, 32, 48, 64, 128)
        gate = lambda b: gen_fused.supported_nade(cfg.model, b, n_steps)
    else:
        cands = (8, 16, 32, 64, 128, 256)
        gate = lambda b: gen_fused.supported(cfg.model, b, n_steps)
    return max((b for b in cands if gate(b)), default=8)


class GenerationService:
    """Continuous-batching generation server core (module docstring).

    Thread model: all jitted dispatches happen on ONE dispatcher thread;
    all device->host fetches happen on ONE drainer thread (fetching array
    A while array B dispatches is safe — they are independent JAX arrays);
    ``submit``/``stats`` are called from any number of front-end threads.
    """

    def __init__(self, cfg, params, serve_cfg: ServeConfig = None,
                 mesh=None):
        import jax
        from multinn_tpu.training.generator import Generator

        self._jax = jax
        self.cfg = cfg
        self.serve_cfg = serve_cfg or ServeConfig()
        self.n_steps = self.serve_cfg.n_steps or cfg.generate.n_steps
        self.batch = self.serve_cfg.batch or auto_batch(cfg, self.n_steps)
        self.generator = Generator(cfg, params, mesh=mesh)
        self._base_key = jax.random.PRNGKey(self.serve_cfg.seed)
        # resolved transport flag for every dispatch (True = bit-packed
        # frames; "sparse" = nonzero packed bytes w/ packed overflow
        # fallback; sparse fetches feed the previous batch's record
        # count back as the next fetch's size_hint — saves the count
        # round-trip in steady state)
        steps_max = max(self.n_steps,
                        (self.serve_cfg.accompany_steps or self.n_steps)
                        if self.serve_cfg.accompany_tracks else 0)
        self._packed = _resolve_transport(self.serve_cfg.transport, cfg,
                                          self.batch, steps_max)

        self._accompany_tracks = tuple(
            int(i) for i in self.serve_cfg.accompany_tracks)
        self._accompany_steps = (self.serve_cfg.accompany_steps
                                 or self.n_steps)
        self._lock = threading.Condition()
        # one FIFO per request KIND (plain/seeded/accompany) — a device
        # batch holds one kind (different compiled programs), and per-kind
        # deques make dispatch O(batch) instead of O(queue^2) under backlog
        self._queues = {"plain": collections.deque(),
                        "seeded": collections.deque(),
                        "accompany": collections.deque()}
        self._closed = False
        self._inflight = threading.Semaphore(self.serve_cfg.pipeline_depth)
        # (device_array, requests, batch_index, t_dispatch) awaiting fetch
        self._done_q: collections.deque = collections.deque()
        self._done_cv = threading.Condition()

        self._stats_lock = threading.Lock()
        self._n_requests = 0
        self._n_sparse_overflows = 0   # consecutive; 2 demote to packed
        self._transport_demoted = False
        self._n_batches = 0
        self._n_seeded_batches = 0
        self._n_accompany_batches = 0
        self._n_padded_rows = 0
        self._n_errors = 0
        self._t_started = time.time()
        self._latencies = collections.deque(maxlen=self.serve_cfg.history)
        self._queue_waits = collections.deque(maxlen=self.serve_cfg.history)
        self._done_times = collections.deque(maxlen=self.serve_cfg.history)

        # user-facing seed rolls are FRAME space; the model may be onset_hold
        self._frame_dim = (cfg.model.n_pitches // 2
                           if cfg.data.encoding == "onset_hold"
                           else cfg.model.n_pitches)

        # compile + warm every program shape the server can dispatch before
        # accepting traffic (first request must not pay the cold compile):
        # one unseeded program, plus one seeded program iff seed_steps > 0.
        # Warming goes through fetch_rolls — the transport decode path —
        # because it is the provable completion barrier for EVERY
        # transport (np.asarray on the sparse transport's dict output is
        # a no-op object array, not a fetch) and it also warms the
        # drain-side slice programs.
        self.generator.fetch_rolls(self.generator.generate_async(
            self._base_key, self.n_steps, self.batch, packed=self._packed))
        if self.serve_cfg.seed_steps > 0:
            zeros = np.zeros((self.batch, self.serve_cfg.seed_steps,
                              cfg.model.n_tracks, cfg.model.n_pitches),
                             np.float32)
            self.generator.fetch_rolls(self.generator.generate_async(
                self._base_key, self.n_steps, self.batch, seed=zeros,
                packed=self._packed))
        if self._accompany_tracks:
            zeros = np.zeros((self.batch, self._accompany_steps,
                              cfg.model.n_tracks, cfg.model.n_pitches),
                             np.float32)
            self.generator.fetch_rolls(self.generator.accompany_async(
                self._base_key, zeros, self._accompany_tracks,
                packed=self._packed))

        self._dispatcher = threading.Thread(target=self._dispatch_loop,
                                            name="multinn-serve-dispatch",
                                            daemon=True)
        self._drainer = threading.Thread(target=self._drain_loop,
                                         name="multinn-serve-drain",
                                         daemon=True)
        self._dispatcher.start()
        self._drainer.start()

    # -- front end -----------------------------------------------------------

    def _normalize_seed(self, seed: np.ndarray) -> np.ndarray:
        """User frame-space seed roll (T, K, D_frame) -> model-space
        (seed_steps, K, D_model) float32: validate, encode the FULL roll
        (hold continuity across the crop boundary matches how training
        windows are encoded — datasets encode whole songs, then chop),
        keep the LAST seed_steps frames, left-pad zeros."""
        if self.serve_cfg.seed_steps <= 0:
            raise ValueError("this service has seed_steps=0: seeded "
                             "requests are disabled (restart serve.py "
                             "with --seed-steps N)")
        from multinn_tpu.data import pianoroll as pr
        seed = np.asarray(seed)
        k, d = self.cfg.model.n_tracks, self._frame_dim
        if seed.ndim != 3 or seed.shape[1:] != (k, d) or seed.shape[0] < 1:
            raise ValueError(f"seed roll must be (T>=1, {k}, {d}) "
                             f"frame-space, got {seed.shape}")
        enc = pr.encode_rolls((seed > 0).astype(np.uint8),
                              self.cfg.data.encoding)
        s = self.serve_cfg.seed_steps
        enc = enc[-s:]
        if enc.shape[0] < s:
            pad = np.zeros((s - enc.shape[0],) + enc.shape[1:], enc.dtype)
            enc = np.concatenate([pad, enc], axis=0)
        return enc.astype(np.float32)

    def _normalize_given(self, given: np.ndarray) -> np.ndarray:
        """User frame-space accompaniment roll (T, K, D_frame) ->
        model-space (accompany_steps, K, D_model) float32: validate, encode
        the FULL roll, keep the FIRST accompany_steps frames (the given
        music plays from the start of the generation), right-pad zeros
        (trailing silence on the given tracks)."""
        if not self._accompany_tracks:
            raise ValueError(
                "this service has no accompany_tracks: accompaniment "
                "requests are disabled (restart serve.py with "
                "--accompany-tracks i,j,...)")
        from multinn_tpu.data import pianoroll as pr
        given = np.asarray(given)
        k, d = self.cfg.model.n_tracks, self._frame_dim
        if given.ndim != 3 or given.shape[1:] != (k, d) or given.shape[0] < 1:
            raise ValueError(f"accompaniment roll must be (T>=1, {k}, {d}) "
                             f"frame-space, got {given.shape}")
        enc = pr.encode_rolls((given > 0).astype(np.uint8),
                              self.cfg.data.encoding)
        s = self._accompany_steps
        enc = enc[:s]
        if enc.shape[0] < s:
            pad = np.zeros((s - enc.shape[0],) + enc.shape[1:], enc.dtype)
            enc = np.concatenate([enc, pad], axis=0)
        return enc.astype(np.float32)

    def submit(self, seed: Optional[np.ndarray] = None,
               given: Optional[np.ndarray] = None) -> Future:
        """Enqueue one generation request; returns its future (resolving to
        a ServeResult). ``seed``: optional frame-space pianoroll
        (T, K, D_frame) to prime the model state on (requires
        ServeConfig.seed_steps > 0; see _normalize_seed). ``given``:
        optional frame-space pianoroll whose ServeConfig.accompany_tracks
        slices are fixed while the other tracks are sampled (requires
        accompany_tracks; see _normalize_given)."""
        return self.submit_many(1, seed=seed, given=given)[0]

    def submit_many(self, n: int,
                    seed: Optional[np.ndarray] = None,
                    given: Optional[np.ndarray] = None) -> List[Future]:
        """Enqueue ``n`` requests atomically (one lock acquisition, one
        seed/given normalization — the bulk front-end path); all carry the
        same seed/given (or none). Returns their futures in submission
        order."""
        if seed is not None and given is not None:
            raise ValueError("a request carries either a priming seed or "
                             "an accompaniment roll, not both")
        norm_s = self._normalize_seed(seed) if seed is not None else None
        norm_g = self._normalize_given(given) if given is not None else None
        reqs = [_Request(norm_s, norm_g) for _ in range(n)]
        if not reqs:            # n=0: graceful no-op (kind is undecidable)
            return []
        with self._lock:
            if self._closed:
                raise RuntimeError("service is closed")
            self._queues[reqs[0].kind].extend(reqs)
            self._lock.notify()
        with self._stats_lock:
            self._n_requests += n
        return [r.future for r in reqs]

    def stats(self) -> dict:
        """Service counters + latency percentiles over the recent window."""
        with self._stats_lock:
            lat = np.asarray(self._latencies, np.float64)
            qw = np.asarray(self._queue_waits, np.float64)
            uptime = time.time() - self._t_started
            out = {
                "batch": self.batch,
                "n_steps": self.n_steps,
                "transport": ("sparse" if self._packed == "sparse"
                              else "packed"),
                "transport_demoted": self._transport_demoted,
                "pipeline_depth": self.serve_cfg.pipeline_depth,
                "requests": self._n_requests,
                "batches": self._n_batches,
                "seeded_batches": self._n_seeded_batches,
                "accompany_batches": self._n_accompany_batches,
                "accompany_tracks": list(self._accompany_tracks),
                "seed_steps": self.serve_cfg.seed_steps,
                "padded_rows": self._n_padded_rows,
                "errors": self._n_errors,
                "uptime_s": round(uptime, 3),
                "queued": sum(len(q) for q in self._queues.values()),
            }
            if lat.size:
                out["latency_ms"] = {
                    "p50": round(float(np.percentile(lat, 50)) * 1e3, 2),
                    "p95": round(float(np.percentile(lat, 95)) * 1e3, 2),
                    "p99": round(float(np.percentile(lat, 99)) * 1e3, 2),
                    "window": int(lat.size),
                }
                out["queue_wait_ms_p50"] = round(
                    float(np.percentile(qw, 50)) * 1e3, 2)
                # steady-state throughput over the recent completion window
                # (first->last completion timestamp; NOT uptime, which an
                # idle server would dilute to a meaningless number)
                if len(self._done_times) >= 2:
                    span = self._done_times[-1] - self._done_times[0]
                    out["songs_per_s"] = round(
                        (len(self._done_times) - 1) / max(span, 1e-9), 2)
            return out

    def close(self, timeout: float = 30.0) -> None:
        """Stop accepting requests, drain in-flight work, join threads.
        Queued-but-undispatched requests are rejected. Idempotent."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
            pending = [r for q in self._queues.values() for r in q]
            for q in self._queues.values():
                q.clear()
            self._lock.notify_all()
        for req in pending:
            req.future.set_exception(RuntimeError("service closed"))
        with self._done_cv:
            self._done_cv.notify_all()
        self._dispatcher.join(timeout)
        self._drainer.join(timeout)

    def _note_sparse_overflow(self, overflowed: bool) -> None:
        """Adaptive transport demotion: the static "auto" rule sees only
        payload SIZE; density is a property of the model, observed at
        runtime. Two consecutive sparse-buffer overflows (each already
        served correctly through the packed fallback, at the cost of a
        wasted count round-trip + device compaction) mean this model is
        too dense for the sparse codec — demote: the drain stops
        attempting the sparse fetch and reads every future batch's
        packed fallback directly. The DISPATCH program deliberately
        stays "sparse": it already computes the packed roll as an
        output, whereas switching to packed=True would mint a new
        compiled program mid-serving (minutes of cold remote compile —
        ops/sparsebytes docstring) for the device-side saving of one
        ~ms compaction."""
        if not overflowed:
            self._n_sparse_overflows = 0
            return
        self._n_sparse_overflows += 1
        if self._n_sparse_overflows >= 2:
            self._transport_demoted = True

    # -- dispatcher thread ----------------------------------------------------

    def _take_batch(self) -> Optional[List[_Request]]:
        """Block until >=1 request; then wait up to max_wait_ms for the
        batch to fill. A device batch holds ONE kind of request (seeded or
        unseeded — they are different compiled programs): the OLDEST queued
        request picks the kind, and only its kind coalesces behind it (the
        other kind keeps its queue for the next batch). O(batch) per
        dispatch. Returns None on shutdown."""
        deadline = None
        with self._lock:
            while True:
                live = [q for q in self._queues.values() if q]
                if live:
                    q = min(live, key=lambda q: q[0].t_enqueue)
                    if deadline is None:
                        deadline = (q[0].t_enqueue
                                    + self.serve_cfg.max_wait_ms / 1e3)
                    if len(q) >= self.batch or time.time() >= deadline:
                        return [q.popleft()
                                for _ in range(min(self.batch, len(q)))]
                    self._lock.wait(max(deadline - time.time(), 0.0))
                elif self._closed:
                    return None
                else:
                    deadline = None
                    self._lock.wait(0.1)

    def _dispatch_loop(self) -> None:
        jax = self._jax
        while True:
            reqs = self._take_batch()
            if reqs is None:
                return
            self._inflight.acquire()           # bound dispatched-unfetched
            kind = reqs[0].kind
            with self._stats_lock:
                bi = self._n_batches
                self._n_batches += 1
                self._n_seeded_batches += int(kind == "seeded")
                self._n_accompany_batches += int(kind == "accompany")
                self._n_padded_rows += self.batch - len(reqs)
            key = jax.random.fold_in(self._base_key, bi)
            seed_arr = None
            if kind == "seeded":               # pad rows prime on zeros
                seed_arr = np.zeros(
                    (self.batch,) + reqs[0].seed.shape, np.float32)
                for row, r in enumerate(reqs):
                    seed_arr[row] = r.seed
            t_dispatch = time.time()
            try:
                if kind == "accompany":        # pad rows accompany silence
                    given_arr = np.zeros(
                        (self.batch,) + reqs[0].given.shape, np.float32)
                    for row, r in enumerate(reqs):
                        given_arr[row] = r.given
                    out = self.generator.accompany_async(
                        key, given_arr, self._accompany_tracks, packed=self._packed)
                else:
                    out = self.generator.generate_async(key, self.n_steps,
                                                        self.batch,
                                                        seed=seed_arr,
                                                        packed=self._packed)
            except Exception as e:            # pragma: no cover - defensive
                self._inflight.release()
                with self._stats_lock:
                    self._n_errors += len(reqs)
                for r in reqs:
                    r.future.set_exception(e)
                continue
            with self._done_cv:
                self._done_q.append((out, reqs, bi, t_dispatch))
                self._done_cv.notify()

    # -- drainer thread --------------------------------------------------------

    def _drain_loop(self) -> None:
        while True:
            with self._done_cv:
                while not self._done_q:
                    if self._closed and not self._dispatcher.is_alive():
                        return
                    self._done_cv.wait(0.1)
                out, reqs, bi, t_dispatch = self._done_q.popleft()
            try:
                # value fetch forces device completion; the roll ships
                # BIT-PACKED (8x fewer device->host bytes; the drain fetch
                # is the serving bottleneck at full 64-bar payloads) —
                # Generator.fetch_rolls is the transport contract's single
                # decode point
                if isinstance(out, dict) and self._transport_demoted:
                    # demoted: skip the doomed count+chunk fetch and read
                    # the dict's packed fallback directly — the dispatch
                    # program stays "sparse" (compiling a packed=True
                    # program mid-serving would stall every request for
                    # the cold-compile minutes the design exists to avoid)
                    out, was_sparse = out["packed"], False
                else:
                    was_sparse = isinstance(out, dict)
                hint = (self.generator.last_sparse_count if was_sparse
                        else None)
                rolls = self.generator.fetch_rolls(out, size_hint=hint)
                rolls = self.generator.finalize(rolls)
                if was_sparse:
                    self._note_sparse_overflow(
                        self.generator.last_sparse_overflowed)
            except Exception as e:            # covered: drainer-failure test
                self._inflight.release()
                with self._stats_lock:
                    self._n_errors += len(reqs)
                for r in reqs:
                    r.future.set_exception(e)
                continue
            self._inflight.release()
            t_done = time.time()
            with self._stats_lock:
                for r in reqs:
                    self._latencies.append(t_done - r.t_enqueue)
                    self._queue_waits.append(t_dispatch - r.t_enqueue)
                    self._done_times.append(t_done)
            for row, r in enumerate(reqs):
                r.future.set_result(ServeResult(
                    roll=rolls[row], batch_index=bi, row=row,
                    queue_s=t_dispatch - r.t_enqueue,
                    total_s=t_done - r.t_enqueue))
