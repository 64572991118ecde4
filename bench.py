#!/usr/bin/env python
"""Benchmark harness (SURVEY §6 metric axes; run on the real TPU chip).

Measures the three driver metric axes on the flagship config:
  1. pianoroll steps/sec/chip (train) — MultINN 5-track feedback RNN-RBM
  2. 64-bar 5-track generation latency (1024 grid steps, one scan program)
  3. Gibbs sweeps/s (batched block-Gibbs chain)
plus the NADE family, serving (kernel-level + end-to-end service +
packed/sparse transport A/B), and fused accompaniment.

EMISSION CONTRACT (VERDICT r4 #1 — the harness must be impossible to zero
out): the run is split into SECTIONS, driver-metric axes first. After every
section completes the FULL aggregate-so-far is flushed to stdout as one JSON
line — the LAST line on stdout is always the most complete snapshot, so a
kill at any moment after the first section still leaves a parseable record.
The schema of every line is the classic one:
    {"metric", "value", "unit", "vs_baseline", "extra"}
with ``extra.sections`` recording per-section status
(ok|error|stalled|skipped_budget|skipped_dep) and ``extra.budget`` the wall
accounting.

ROBUSTNESS (VERDICT r4 #1/#2 — this environment's tunnel has documented
10–15-min stalls, ~1-in-3 one evening; TODO.md):
  * every section runs in a daemon worker thread bounded by
    min(section cap, remaining global budget); on timeout the section is
    marked "stalled" and ALL thread stacks are dumped to stderr
    (faulthandler) before moving on — forensics, not silence.
  * a global wall budget (env ``MULTINN_BENCH_BUDGET_S``, default 540 s)
    skips not-yet-started optional sections once exhausted; a SIGALRM
    backstop fires shortly after it in case the runner itself wedges.
  * SIGTERM/SIGINT flush the aggregate-so-far and exit — the driver's
    ``timeout`` kill produces a record instead of nothing.
  * ``kill -USR1 <pid>`` dumps all-thread stacks any time (the
    serve_loadtest trick, made standard here).
  * device->host fetches in the serving sections carry short timeouts
    (stall forensics on expiry) instead of the old 600 s silent waits.

``MULTINN_BENCH_TINY=1`` shrinks every shape/iteration so CI can exercise
the FULL runner (incl. the kill-mid-run contract) on CPU in seconds
(tests/test_bench_emission.py).

The reference publishes no numbers (BASELINE.md) — ``vs_baseline`` is
measured against the driver's north-star target of 1.0 s for 64-bar 5-track
generation [B:5]: vs_baseline = 1.0 / latency (>1 beats the target).
"""

from __future__ import annotations

import faulthandler
import json
import os
import signal
import sys
import threading
import time
import traceback

_START = time.time()
BUDGET_S = float(os.environ.get("MULTINN_BENCH_BUDGET_S", "540"))
TINY = os.environ.get("MULTINN_BENCH_TINY") == "1"


def _remaining() -> float:
    return BUDGET_S - (time.time() - _START)


def _dump_stacks(reason: str) -> None:
    msg = (f"[bench] {reason} at t+{time.time() - _START:.0f}s; "
           "all-thread stacks:\n")
    try:
        sys.stderr.write(msg)
        sys.stderr.flush()
    except RuntimeError:
        # called from a signal handler that landed inside a buffered
        # stderr write — fall back to the raw fd
        os.write(2, msg.encode())
    # faulthandler writes the traceback through the raw fd — safe in
    # signal-handler context by design
    faulthandler.dump_traceback(file=sys.stderr)


class Aggregate:
    """Running result store; renders the one-line JSON snapshot."""

    def __init__(self):
        self.extra = {}
        self.sections = {}
        self.status = "running"
        # REENTRANT: the signal-flush handler runs ON the main thread and
        # calls render() — with a plain Lock, a signal landing while the
        # main thread is inside update()/section() would deadlock the
        # handler and the process would never flush-and-exit
        self._lock = threading.RLock()
        self._any_hung = False

    def section(self, name: str, status: str, elapsed: float,
                error: str = None) -> None:
        with self._lock:
            rec = {"status": status, "elapsed_s": round(elapsed, 1)}
            if error:
                rec["error"] = error
            self.sections[name] = rec
            if status in ("stalled", "cut_budget"):
                # either way a worker thread may still be alive holding
                # device/client locks — teardown must use os._exit
                self._any_hung = True

    def update(self, metrics: dict) -> None:
        with self._lock:
            self.extra.update(metrics)

    def render(self) -> dict:
        with self._lock:
            ex = dict(self.extra)
        ex["sections"] = dict(self.sections)
        ex["budget"] = {"budget_s": BUDGET_S,
                        "elapsed_s": round(time.time() - _START, 1),
                        "status": self.status}
        ex.setdefault("note", "vs_baseline = north-star 1.0s / measured "
                              "latency; reference publishes no numbers "
                              "(BASELINE.md)")
        # headline = gen latency when measured; earlier snapshots fall back
        # to the train axis so even a 2-section record carries a driver axis
        if "gen_latency_64bar_5track_s" in ex:
            lat = ex["gen_latency_64bar_5track_s"]
            return {"metric": "gen_latency_64bar_5track", "value": lat,
                    "unit": "s",
                    "vs_baseline": round(1.0 / lat, 2) if lat else 0.0,
                    "extra": ex}
        if "train_pianoroll_steps_per_sec_per_chip" in ex:
            v = ex["train_pianoroll_steps_per_sec_per_chip"]
            return {"metric": "train_pianoroll_steps_per_sec_per_chip",
                    "value": v, "unit": "frames/s",
                    "vs_baseline": 0.0, "extra": ex}
        return {"metric": "bench_incomplete", "value": 0.0, "unit": "",
                "vs_baseline": 0.0, "extra": ex}

    def emit(self) -> None:
        print(json.dumps(self.render()), flush=True)


AGG = Aggregate()


def _install_signal_handlers() -> None:
    faulthandler.register(signal.SIGUSR1, file=sys.stderr, all_threads=True)

    def flush_exit(signum, frame):
        AGG.status = f"signal:{signal.Signals(signum).name}"
        _dump_stacks(f"received {signal.Signals(signum).name}")
        # RAW fd write only: the signal may have landed inside a regular
        # emit's print — touching the SAME buffered sys.stdout here raises
        # "reentrant call inside BufferedWriter" and the record dies with
        # the process (faulthandler uses raw fds for the same reason). The
        # leading newline detaches the record from any torn mid-print line
        # (a blank line is harmless); the buffered prefix of a torn emit is
        # abandoned rather than flushed reentrantly.
        os.write(1, b"\n" + json.dumps(AGG.render()).encode() + b"\n")
        os._exit(0)

    signal.signal(signal.SIGTERM, flush_exit)
    signal.signal(signal.SIGINT, flush_exit)
    signal.signal(signal.SIGALRM, flush_exit)
    # backstop: if the section machinery itself ever wedges (it shouldn't —
    # joins are bounded), the alarm still flushes a record. Slack over the
    # budget leaves room for the normal budget-skip path to finish first.
    signal.alarm(int(BUDGET_S + 45))


def run_section(name: str, fn, cap_s: float, needs=()) -> bool:
    """Run one section in a bounded daemon thread; record status + metrics;
    emit the aggregate snapshot. Returns False only when the global budget
    is exhausted (callers then skip the rest)."""
    rem = _remaining()
    if rem < 10:
        AGG.section(name, "skipped_budget", 0.0)
        AGG.emit()
        return False
    for dep in needs:
        if dep not in CTX:
            AGG.section(name, "skipped_dep", 0.0,
                        error=f"missing upstream result: {dep}")
            AGG.emit()
            return True
    box = {}

    def work():
        try:
            box["result"] = fn()
        except BaseException:  # noqa: BLE001 — report, keep benching
            box["error"] = traceback.format_exc()[-2000:]

    th = threading.Thread(target=work, daemon=True, name=f"bench-{name}")
    t0 = time.time()
    th.start()
    th.join(min(cap_s, rem))
    elapsed = time.time() - t0
    if th.is_alive():
        if elapsed < cap_s:
            # the join was bounded by the REMAINING GLOBAL BUDGET, not the
            # section's own cap: a healthy-but-slow section out of budget
            # is not a stall — don't misreport an environment fault
            sys.stderr.write(f"[bench] section '{name}' cut by the global "
                             f"budget after {elapsed:.0f}s (cap "
                             f"{cap_s:.0f}s)\n")
            AGG.section(name, "cut_budget", elapsed)
        else:
            _dump_stacks(f"section '{name}' stalled after {elapsed:.0f}s "
                         f"(cap {cap_s:.0f}s, budget remaining {rem:.0f}s)")
            AGG.section(name, "stalled", elapsed)
    elif "error" in box:
        AGG.section(name, "error", elapsed, error=box["error"])
    else:
        AGG.update(box.get("result") or {})
        AGG.section(name, "ok", elapsed)
    AGG.emit()
    return True


# --------------------------------------------------------------------------
# Shared state between sections (populated by sec_setup).
CTX = {}
# per-process JAX monitoring listener state (see sec_setup)
from collections import Counter as _Counter  # noqa: E402
_CACHE_EVENTS = _Counter()
_LISTENER_INSTALLED = False

# Tiny-mode knobs (CI exercises the full runner on CPU in seconds).
if TINY:
    SHAPE = dict(n_tracks=4, n_pitches=24, n_hidden=12, n_rnn=8)
    B, T, BN = 2, 8, 2
    N_STEPS = 32
    N_ITER, ITERS, WARMUP = 3, 2, 1
    GIBBS = dict(D=24, H=12, BB=32, K_SWEEPS=3, n_chains=3)
    SLOPE_MULT, N_PIPE = 2, 2
    FETCH_TIMEOUT_S = 60.0
else:
    SHAPE = dict(n_tracks=5, n_pitches=84, n_hidden=150, n_rnn=100)
    B, T, BN = 16, 64, 64
    N_STEPS = 1024                                 # 64 bars x 16 steps/bar
    N_ITER, ITERS, WARMUP = 50, 5, 1
    GIBBS = dict(D=84, H=150, BB=4096, K_SWEEPS=25, n_chains=40)
    SLOPE_MULT, N_PIPE = 8, 8
    # well under any section cap: a stalled fetch surfaces as forensics +
    # section error, never a silent 600 s wait (VERDICT r4 weak #2)
    FETCH_TIMEOUT_S = 90.0


def _fetch_futures(futs, label: str):
    """Drain serving futures with bounded waits + stall forensics."""
    import concurrent.futures as cf
    deadline = time.time() + FETCH_TIMEOUT_S
    for f in futs:
        left = deadline - time.time()
        if left <= 0:
            _dump_stacks(f"{label}: futures still pending after "
                         f"{FETCH_TIMEOUT_S:.0f}s")
            raise TimeoutError(f"{label} drain exceeded "
                               f"{FETCH_TIMEOUT_S:.0f}s")
        try:
            f.result(timeout=left)
        # cf.TimeoutError only became an alias of the builtin in 3.11 —
        # catch both so the forensics dump runs on 3.10 too
        except (TimeoutError, cf.TimeoutError):
            _dump_stacks(f"{label}: future fetch timed out")
            raise


def sec_setup():
    """Backend + persistent compile cache + compile-service warm-up + the
    flagship RBM model. Everything later depends on this."""
    import jax

    # this environment's sitecustomize registers the axon TPU backend at
    # interpreter start, pre-empting the JAX_PLATFORMS env var — honor an
    # explicit request (the CI kill-tests bench on CPU) via jax.config,
    # which still wins because backends initialize on first use
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)
    import jax.numpy as jnp

    from multinn_tpu.models import multinn
    from multinn_tpu.models.multinn import MultINNConfig
    from multinn_tpu.utils.platform import enable_compilation_cache
    from multinn_tpu.utils.profiling import force

    # persistent compile cache: the first process pays the remote-compile
    # cold start (1-8 min here); later processes deserialize in seconds.
    # Hit/miss counters come from JAX monitoring events (ground truth —
    # VERDICT r3 #1; scripts/compile_audit.py is the standalone prover).
    # The listener is installed ONCE per process (jax.monitoring has no
    # deregistration — repeated bench() calls would otherwise accumulate
    # listeners); the shared Counter is cleared per run by _reset.
    global _LISTENER_INSTALLED
    if not _LISTENER_INSTALLED:
        jax.monitoring.register_event_listener(
            lambda name, **kw: _CACHE_EVENTS.update([name])
            if "compilation_cache" in name else None)
        _LISTENER_INSTALLED = True
    cache_events = _CACHE_EVENTS
    cache_dir = enable_compilation_cache()
    cache_was_warm = bool(cache_dir and os.path.isdir(cache_dir)
                          and len(os.listdir(cache_dir)) > 0)

    # this environment's remote TPU compile service has a 1-8 min cold
    # start on the FIRST large compile of a process (see repo memory); a
    # small grad-of-scan warmup first has been observed to shrink it
    def tiny_warm(p):
        def body(c, x):
            return jnp.tanh(c @ p + x), c
        c, ys = jax.lax.scan(body, jnp.zeros((1, 8)), jnp.ones((4, 1, 8)))
        return jnp.sum(ys) + jnp.sum(c)
    force(jax.jit(jax.grad(tiny_warm))(jnp.eye(8)))

    cfg = MultINNConfig(mode="feedback", decoder_type="rnn-rbm",
                        cd_k=1, gen_k=10 if not TINY else 2, **SHAPE)
    # the gate key ("cfg" — every later section's `needs`) is set LAST:
    # multinn.init is the first big device op through the tunnel (the
    # likeliest stall point), and a stalled worker that has already
    # published "cfg" would let later sections run into KeyError('params')
    # instead of a clean skipped_dep
    CTX["params"] = multinn.init(jax.random.PRNGKey(0), cfg)
    CTX["cache_events"] = cache_events
    CTX["cfg"] = cfg
    return {"device": str(jax.devices()[0]),
            "compile_cache": {"dir": cache_dir,
                              "dir_populated": cache_was_warm}}


def _measure_train_many(params0, opt_, xb, n_iter):
    """Steady-state s/optimizer-step of the fused multi-step program —
    compile + TWO warm-up executions first (a fresh executable pays a
    one-time program-load overhead, ~80 ms/step observed), then min-of-3
    timed calls with value-fetch sync. The ONE measurement protocol behind
    every train-throughput row (RBM and NADE). In-program measurement
    (lax.scan of N optimizer steps — what the Trainer runs with
    steps_per_call>1): per-EXECUTE host overhead on this tunneled TPU is
    ~30-70 ms (and varies minute to minute), many times the device step
    time, so the fused multi-step program is both the honest device number
    and the real production configuration."""
    import jax

    from multinn_tpu.models import multinn
    from multinn_tpu.utils.profiling import force

    import optax

    @jax.jit
    def train_many(p, s, key, xb):
        def body(carry, kk):
            p, s = carry
            (l, _), g = jax.value_and_grad(
                lambda q: multinn.loss(q, kk, xb, detailed=False),
                has_aux=True)(p)
            u2, s = opt_.update(g, s)
            return (optax.apply_updates(p, u2), s), l
        (p, s), ls = jax.lax.scan(body, (p, s),
                                  jax.random.split(key, n_iter))
        return p, s, ls[-1]

    p2, s2 = params0, opt_.init(params0)
    kk = jax.random.PRNGKey(2)
    for i in range(3):
        p2, s2, loss2 = train_many(p2, s2, jax.random.fold_in(kk, i), xb)
    force(loss2)
    times = []
    for i in range(3, 6):
        t0 = time.time()
        p2, s2, loss2 = train_many(p2, s2, jax.random.fold_in(kk, i), xb)
        force(loss2)
        times.append(time.time() - t0)
    return min(times) / n_iter


def sec_train_rbm():
    """Driver axis 1: pianoroll frames/s/chip, flagship RNN-RBM."""
    import jax
    import jax.numpy as jnp
    import optax

    from multinn_tpu.models import multinn
    from multinn_tpu.utils.profiling import force

    cfg, params = CTX["cfg"], CTX["params"]
    # The batch is a jit ARGUMENT, never a closed-over device constant:
    # embedding a device array as an MLIR constant makes lowering fetch its
    # VALUE back through the tunnel (measured: 17 s for this 27.5 MB batch —
    # the bulk of what BENCH_r01–r03 reported as "compile_train_s")
    x = jax.device_put(jax.random.bernoulli(
        jax.random.PRNGKey(1), 0.06,
        (B, T, cfg.n_tracks, cfg.n_pitches)).astype(jnp.float32))
    opt = optax.adam(1e-3)

    @jax.jit
    def train_step(p, s, k, xb):
        (loss, _), g = jax.value_and_grad(
            lambda q: multinn.loss(q, k, xb, detailed=False),
            has_aux=True)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, loss

    t0 = time.time()
    _, _, loss = train_step(params, opt.init(params), jax.random.PRNGKey(2),
                            x)
    force(loss)            # value-fetch sync: block_until_ready can return
    compile_train = time.time() - t0   # before the execute RPC on axon

    step_s = _measure_train_many(params, opt, x, n_iter=N_ITER)
    CTX["train_step_s"] = step_s
    return {"train_pianoroll_steps_per_sec_per_chip":
                round((B * T) / step_s, 0),
            "train_step_ms": round(step_s * 1e3, 2),
            "compile_train_s": round(compile_train, 1)}


def _make_gen(pp, ss, n):
    """Whole-generation program with params/state as jit ARGUMENTS (a
    closure would embed them as MLIR constants and lowering would fetch
    their values back through the tunnel — same trap as the batch)."""
    import jax

    from multinn_tpu.models import multinn
    j = jax.jit(lambda p_, s_, kk: multinn.generate(p_, kk, s_, n)[1])
    return lambda kk: j(pp, ss, kk)


def sec_gen_rbm():
    """Driver axis 2: 64-bar 5-track generation latency (+ device-time
    slope and the B=8 batched per-song number)."""
    import jax

    from multinn_tpu.models import multinn
    from multinn_tpu.utils.profiling import force, timeit

    params = CTX["params"]
    state = multinn.init_state(params, 1)
    gen = _make_gen(params, state, N_STEPS)
    t0 = time.time()
    force(gen(jax.random.PRNGKey(3)))
    compile_gen = time.time() - t0
    res = timeit(gen, jax.random.PRNGKey(4), iters=ITERS, warmup=WARMUP)
    gen_latency = res["min_s"]

    # device time via the slope over n_steps (subtracts this environment's
    # ~30 ms/execute tunnel floor)
    gen_long = _make_gen(params, state, SLOPE_MULT * N_STEPS)
    res_long = timeit(gen_long, jax.random.PRNGKey(4), iters=max(3, ITERS - 2),
                      warmup=WARMUP)
    us_per_step = ((res_long["min_s"] - gen_latency)
                   / ((SLOPE_MULT - 1) * N_STEPS) * 1e6)
    state8 = multinn.init_state(params, 8)
    gen8 = _make_gen(params, state8, N_STEPS)
    res8 = timeit(gen8, jax.random.PRNGKey(4), iters=ITERS, warmup=WARMUP)

    CTX["gen_us_per_step"] = us_per_step
    # scan-path B=8 per-song time: the serving section's fallback when no
    # batch passes the fused-kernel VMEM gate (ADVICE r3)
    CTX["per_song_b8"] = res8["min_s"] / 8
    return {"gen_latency_64bar_5track_s": round(gen_latency, 4),
            "gen_device_s_64bar": round(us_per_step * N_STEPS / 1e6, 4),
            "gen_device_us_per_step": round(us_per_step, 2),
            "gen_per_song_s_at_batch8": round(res8["min_s"] / 8, 4),
            "compile_gen_s": round(compile_gen, 1)}


def sec_gibbs():
    """Driver axis 3: Gibbs sweeps/s (in-program amortized scan of
    chains)."""
    import jax
    import jax.numpy as jnp

    from multinn_tpu.ops import gibbs as gibbs_ops
    from multinn_tpu.utils.profiling import timeit

    D, H = GIBBS["D"], GIBBS["H"]
    BB, K_SWEEPS, n_chains = GIBBS["BB"], GIBBS["K_SWEEPS"], GIBBS["n_chains"]
    w = 0.01 * jax.random.normal(jax.random.PRNGKey(5), (D, H))
    bv, bh = jnp.zeros((D,)), jnp.zeros((H,))
    v0 = jax.random.bernoulli(jax.random.PRNGKey(6), 0.1, (BB, D)
                              ).astype(jnp.float32)

    def many(kk, v0_, w_, bv_, bh_):
        def body(v, k1):
            # the dispatch picks the faster impl per shape (pallas kernel
            # while latency-bound, XLA fusion at large batch)
            return gibbs_ops.gibbs_chain(k1, v, w_, bv_, bh_,
                                         k=K_SWEEPS), None
        v, _ = jax.lax.scan(body, v0_, jax.random.split(kk, n_chains))
        return v

    many_jit = jax.jit(many)
    res_g = timeit(lambda kk: many_jit(kk, v0, w, bv, bh),
                   jax.random.PRNGKey(7), iters=ITERS, warmup=2)
    sweeps = n_chains * K_SWEEPS * BB / res_g["min_s"]
    CTX["gibbs_sweeps_per_sec"] = sweeps
    return {"gibbs_sweeps_per_sec": round(sweeps, 0)}


def sec_train_nade():
    """NADE train throughput (grid-free exact-LL kernel on TPU —
    ops/nade_ll_pallas.py; the auto dispatch picks it). Same measurement
    protocol as the RBM train row."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from multinn_tpu.models import multinn

    cfg_n = dataclasses.replace(CTX["cfg"], decoder_type="rnn-nade",
                                cd_k=1)
    params_n = multinn.init(jax.random.PRNGKey(0), cfg_n)
    xn = jax.device_put(jax.random.bernoulli(
        jax.random.PRNGKey(8), 0.06,
        (BN, T, cfg_n.n_tracks, cfg_n.n_pitches)).astype(jnp.float32))
    step_s = _measure_train_many(params_n, optax.adam(1e-3), xn,
                                 n_iter=N_ITER)
    # gate key ("cfg_n") set last — sec_gen_nade's dep check
    CTX["params_n"] = params_n
    CTX["cfg_n"] = cfg_n
    return {"train_nade_frames_per_sec_per_chip":
                round((BN * T) / step_s, 0),
            "train_nade_step_ms": round(step_s * 1e3, 2),
            "train_nade_batch": BN}


def sec_gen_nade():
    """RNN-NADE flagship generation (the second decoder family's fused
    whole-generation kernel; same slope method for device time)."""
    import dataclasses

    import jax

    from multinn_tpu.models import multinn
    from multinn_tpu.utils.profiling import timeit

    if "cfg_n" not in CTX:       # nade train skipped/stalled — still gen
        cfg_n = dataclasses.replace(CTX["cfg"],
                                    decoder_type="rnn-nade", cd_k=1)
        CTX["params_n"] = multinn.init(jax.random.PRNGKey(0), cfg_n)
        CTX["cfg_n"] = cfg_n
    params_n = CTX["params_n"]
    state_n = multinn.init_state(params_n, 1)
    mult = min(4, SLOPE_MULT)
    gen_n = _make_gen(params_n, state_n, N_STEPS)
    gen_n4 = _make_gen(params_n, state_n, mult * N_STEPS)
    rn1 = timeit(gen_n, jax.random.PRNGKey(4), iters=ITERS, warmup=WARMUP)
    rn4 = timeit(gen_n4, jax.random.PRNGKey(4), iters=max(3, ITERS - 2),
                 warmup=WARMUP)
    nade_device_s = ((rn4["min_s"] - rn1["min_s"])
                     / ((mult - 1) * N_STEPS) * N_STEPS)
    CTX["nade_device_s"] = nade_device_s
    return {"gen_nade_device_s_64bar": round(nade_device_s, 4)}


def sec_serving_kernel():
    """Kernel-level serving ceilings: gate-max batch + pipelined dispatch,
    both decoder families."""
    import jax

    from multinn_tpu.models import multinn
    from multinn_tpu.ops import gen_fused
    from multinn_tpu.utils.profiling import force, timeit

    cfg, params = CTX["cfg"], CTX["params"]
    out = {}
    ks = [jax.random.fold_in(jax.random.PRNGKey(4), i)
          for i in range(N_PIPE)]

    def pipelined(gen_fn, batch):
        # PIPELINED serving: a real serving loop submits continuously, so
        # async dispatch hides the ~30 ms/execute tunnel floor behind
        # device work — submit N batches back-to-back, force once at the
        # end (the value fetch drains the whole queue; see profiling.force)
        force(gen_fn(ks[0]))  # warm, drained
        t0 = time.time()
        outs = [gen_fn(kk) for kk in ks]
        force(outs[-1])          # single-device PJRT executes FIFO, so the
        t_pipe = time.time() - t0   # last program completing implies all do
        # verify the FIFO assumption rather than trust it: draining the
        # earlier outputs should cost only the per-fetch host floor; any
        # excess is device work the timed region missed — count it
        floor = time.time(); force(outs[-1]); floor = time.time() - floor
        t1 = time.time()
        for o in outs[:-1]:
            force(o)
        excess = (time.time() - t1) - (N_PIPE - 1) * floor
        if excess > 0.1 * t_pipe:
            t_pipe += excess
        return N_PIPE * batch / t_pipe

    # serving throughput at the gate's max batch (bf16 weight-storage
    # capacity mode past the f32 budget — BASELINE.md)
    if TINY:
        b_serve = 4
    else:
        b_serve = max((b for b in (8, 16, 32, 64, 128, 256)
                       if gen_fused.supported(cfg, b, N_STEPS)), default=0)
    if b_serve:
        state_s = multinn.init_state(params, b_serve)
        gen_s = _make_gen(params, state_s, N_STEPS)
        res_s = timeit(gen_s, jax.random.PRNGKey(4), iters=max(4, ITERS - 1),
                       warmup=WARMUP)
        out["serving_songs_per_sec"] = round(b_serve / res_s["min_s"], 1)
        out["serving_pipelined_songs_per_sec"] = round(
            pipelined(gen_s, b_serve), 1)
    elif "per_song_b8" in CTX:
        # no serving batch fits this device's VMEM gate (ADVICE r3): fall
        # back to the already-measured B=8 scan path rather than dropping
        # the serving rows from the record
        out["serving_songs_per_sec"] = round(1.0 / CTX["per_song_b8"], 1)
        out["serving_pipelined_songs_per_sec"] = out[
            "serving_songs_per_sec"]
    out["serving_batch"] = b_serve
    CTX["b_serve"] = b_serve

    cfg_n, params_n = CTX.get("cfg_n"), CTX.get("params_n")
    if cfg_n is not None:
        if TINY:
            bn_serve = 4
        else:
            # NADE gate max (bf16 aux capacity mode past B=48 — r4)
            bn_serve = max((b for b in (8, 16, 32, 48, 64)
                            if gen_fused.supported_nade(cfg_n, b, N_STEPS)),
                           default=0)
        if bn_serve:
            state_ns = multinn.init_state(params_n, bn_serve)
            gen_ns = _make_gen(params_n, state_ns, N_STEPS)
            res_ns = timeit(gen_ns, jax.random.PRNGKey(4),
                            iters=max(4, ITERS - 1), warmup=WARMUP)
            out["serving_nade_songs_per_sec"] = round(
                bn_serve / res_ns["min_s"], 1)
            out["serving_nade_pipelined_songs_per_sec"] = round(
                pipelined(gen_ns, bn_serve), 1)
        out["serving_nade_batch"] = bn_serve
    return out


def _service_cfg():
    from multinn_tpu.utils import config as cfgm
    cfg = CTX["cfg"]
    data = cfgm.DataConfig.from_preset(
        "synthetic", n_tracks=cfg.n_tracks, pitch_min=21,
        pitch_max=21 + cfg.n_pitches - 1, window=32 if not TINY else 8,
        batch_size=8)
    return cfgm.ExperimentConfig(
        name="bench_serve", data=data, model=cfg,
        generate=cfgm.GenerateConfig(n_steps=N_STEPS)).validate()


def sec_serving_service():
    """The serving SERVICE end-to-end (multinn_tpu/serving, r4): the full
    runtime — queue -> continuous batching -> bounded async pipeline ->
    drain/finalize/futures — open-loop at the gate-max batch. COMPLETED
    songs only; kernel-level rows above remain the device ceiling."""
    from multinn_tpu.serving import GenerationService, ServeConfig

    b_serve = CTX.get("b_serve", 0)
    if not b_serve:
        return {"serving_service_songs_per_sec": 0.0}
    ecfg = _service_cfg()
    CTX["ecfg"] = ecfg
    # transport pinned to packed: random-init params emit ~50% density,
    # where auto would pick sparse and demote — the sparse story is
    # measured at calibrated density in the A/B section
    svc = GenerationService(ecfg, CTX["params"],
                            ServeConfig(batch=b_serve, n_steps=N_STEPS,
                                        max_wait_ms=2.0,
                                        transport="packed"))
    # full-payload drains ride the tunnel: median of 3 rounds + spread +
    # bound tag, same regression-comparability treatment as the musical
    # A/B rows (VERDICT r4 weak #3)
    rates = []
    try:
        n_req = (3 if not TINY else 2) * b_serve
        for _ in range(3):
            t0 = time.time()
            _fetch_futures(svc.submit_many(n_req), "serving_service")
            rates.append(n_req / (time.time() - t0))
    finally:
        svc.close()
    rates.sort()
    import numpy as np
    return {"serving_service_songs_per_sec":
                round(float(np.median(rates)), 1),
            "serving_service_spread": {"min": round(rates[0], 1),
                                       "max": round(rates[-1], 1),
                                       "n_rounds": len(rates)},
            "serving_service_bound": "host-link"}


def sec_serving_service_ab():
    """Sparse vs packed drain transport through the SERVICE (r4 session-4,
    ops/sparsebytes): the transports differ only in drain bytes, so the
    variable that matters is output DENSITY — random-init params emit ~50%
    density (where sparse correctly falls back / demotes), so calibrate the
    visible bias to the measured converged-model density (BASELINE
    density-matrix row, ~0.008) and interleave rounds to defeat the
    tunnel's minute-scale bandwidth drift.

    These rows are HOST-LINK-bound on this environment (~6 MB/s tunneled
    device->host link; BASELINE.md measured the same transport 57–667
    songs/s across link drift), so each carries median + min/max spread
    over the interleaved rounds and a ``bound`` tag — two rounds differing
    2x on link weather is NOT a regression (VERDICT r4 weak #3)."""
    import jax.numpy as jnp
    import numpy as np

    from multinn_tpu.serving import GenerationService, ServeConfig

    b_serve = CTX.get("b_serve", 0)
    if not b_serve:
        return {}
    ecfg = CTX.get("ecfg") or _service_cfg()
    params = CTX["params"]
    bv_cal = float(np.log(0.008 / (1 - 0.008)))
    params_cal = params.replace(decoder=params.decoder.replace(
        bv=jnp.full_like(params.decoder.bv, bv_cal)))
    times_tr = {"packed": [], "sparse": []}
    svcs = {}
    n_rounds = 3
    try:
        for tr in ("packed", "sparse"):
            svcs[tr] = GenerationService(
                ecfg, params_cal,
                ServeConfig(batch=b_serve, n_steps=N_STEPS,
                            max_wait_ms=2.0, transport=tr))
        for _ in range(n_rounds):
            for tr in ("packed", "sparse"):
                n_req = 2 * b_serve
                t0 = time.time()
                _fetch_futures(svcs[tr].submit_many(n_req),
                               f"serving_ab_{tr}")
                times_tr[tr].append((time.time() - t0) / n_req)
    finally:
        for sv in svcs.values():
            sv.close()
    out = {}
    for tr, key in (("packed", "serving_service_musical_packed"),
                    ("sparse", "serving_service_musical_sparse")):
        rates = sorted(1.0 / t for t in times_tr[tr])
        out[f"{key}_songs_per_sec"] = round(float(np.median(rates)), 1)
        out[f"{key}_spread"] = {"min": round(rates[0], 1),
                                "max": round(rates[-1], 1),
                                "n_rounds": len(rates)}
    out["serving_service_musical_bound"] = "host-link"
    return out


def sec_accompaniment():
    """Fused-kernel ACCOMPANIMENT (r4: track-conditional generation — fix
    given tracks, sample the complement) at flagship shapes, 2-of-5 given:
    the driver-visible artifact for the newest capability (VERDICT r4 weak
    #4). Reports wall latency for a 64-bar conditional song and the
    device-time slope (same method as the unconditional rows), plus which
    dispatch path ran (the auto dispatch picks the fused kernels on TPU at
    these shapes; the scan path elsewhere)."""
    import jax
    import jax.numpy as jnp

    from multinn_tpu.models import multinn
    from multinn_tpu.ops import gen_fused
    from multinn_tpu.utils.profiling import timeit

    cfg, params = CTX["cfg"], CTX["params"]
    given_tracks = (0, 1)
    fused = (jax.default_backend() == "tpu"
             and gen_fused.supported(cfg, 1, N_STEPS, conditioned=True))

    def make_accomp(n):
        g = jax.random.bernoulli(
            jax.random.PRNGKey(9), 0.06,
            (1, n, cfg.n_tracks, cfg.n_pitches)).astype(jnp.float32)
        g = jax.device_put(g)
        st = multinn.init_state(params, 1)
        j = jax.jit(lambda p_, s_, g_, kk: multinn.generate_accompaniment(
            p_, kk, s_, g_, given_tracks)[1])
        return lambda kk: j(params, st, g, kk)

    acc = make_accomp(N_STEPS)
    res = timeit(acc, jax.random.PRNGKey(10), iters=ITERS, warmup=WARMUP)
    mult = min(4, SLOPE_MULT)
    acc_long = make_accomp(mult * N_STEPS)
    res_l = timeit(acc_long, jax.random.PRNGKey(10),
                   iters=max(3, ITERS - 2), warmup=WARMUP)
    us_per_step = ((res_l["min_s"] - res["min_s"])
                   / ((mult - 1) * N_STEPS) * 1e6)
    return {"accomp_latency_64bar_2of5_s": round(res["min_s"], 4),
            "accomp_device_us_per_step": round(us_per_step, 2),
            "accomp_fused": bool(fused)}


def sec_mfu():
    """MFU / roofline (VERDICT r2 #1: FLOPs-counted utilization) — pure
    arithmetic over the earlier sections' measurements. Model-FLOPs
    utilization against the v5e bf16 MXU peak; the fused generation
    kernels also report EXECUTED utilization (their per-track
    block-diagonal layouts multiply K-1 zero blocks — see utils/flops.py)."""
    from multinn_tpu.utils import flops as flops_mod

    cfg = CTX["cfg"]
    rep = {}
    if "train_step_s" in CTX:
        train_flops = flops_mod.train_step_flops(cfg, B, T)
        rep["train_mfu"] = round(
            flops_mod.mfu(train_flops, CTX["train_step_s"]), 4)
        rep["train_model_gflops_per_step"] = round(train_flops / 1e9, 3)
    if "gen_us_per_step" in CTX:
        g_rbm = flops_mod.gen_step_flops_rbm(cfg, batch=1)
        sdev = CTX["gen_us_per_step"] / 1e6
        rep["gen_rbm_mfu"] = round(flops_mod.mfu(g_rbm["model"], sdev), 5)
        rep["gen_rbm_hw_util"] = round(
            flops_mod.mfu(g_rbm["executed"], sdev), 5)
    if "nade_device_s" in CTX and "cfg_n" in CTX:
        g_nade = flops_mod.gen_step_flops_nade(CTX["cfg_n"], batch=1)
        s_n = CTX["nade_device_s"] / N_STEPS
        rep["gen_nade_mfu"] = round(flops_mod.mfu(g_nade["model"], s_n), 6)
        rep["gen_nade_hw_util"] = round(
            flops_mod.mfu(g_nade["executed"], s_n), 6)
    if "gibbs_sweeps_per_sec" in CTX:
        D, H = GIBBS["D"], GIBBS["H"]
        rep["gibbs_bench_mfu"] = round(
            flops_mod.mfu(4 * D * H * CTX["gibbs_sweeps_per_sec"], 1.0), 4)
    rep["bound"] = {
        # classifications argued from the numbers above; the full
        # roofline note lives in BASELINE.md
        "train": "latency (T-sequential LSTM scan; per-step matmuls "
                 "(B,604)x(604,400) underfill the 128x128 MXU)",
        "gen_rbm": "latency (serial T chain of ~1us-scale ops; "
                   "MFU<<1% is structural, us/step is the metric)",
        "gen_nade": "latency (D serial dims x T steps)",
        "gibbs_bench": "sampler/VPU (RNG+compare at B=4096 outweigh "
                       "the 84x150 matmuls)",
    }
    out = {"mfu": rep}
    ev = CTX.get("cache_events")
    if ev is not None:
        # COPY, don't mutate AGG's nested dict in place: results must only
        # land in the aggregate through run_section's update (discarded on
        # stall/error, lock-guarded)
        cc = dict(AGG.extra.get("compile_cache", {}))
        # measured per-process event counts: hits prove the persistent
        # cache served THIS run's programs
        cc.update({k.rsplit("/", 1)[-1]: v for k, v in ev.items()})
        out["compile_cache"] = cc
    return out


SECTIONS = [
    # driver-metric axes FIRST (VERDICT r4 #1): a snapshot surviving only
    # the first ~2 min already carries train + gen latency + Gibbs
    ("setup", sec_setup, 180, ()),
    ("train_rbm", sec_train_rbm, 240, ("cfg",)),
    ("gen_rbm", sec_gen_rbm, 240, ("cfg",)),
    ("gibbs", sec_gibbs, 120, ("cfg",)),
    ("train_nade", sec_train_nade, 180, ("cfg",)),
    ("gen_nade", sec_gen_nade, 180, ("cfg",)),
    ("serving_kernel", sec_serving_kernel, 180, ("cfg",)),
    ("serving_service", sec_serving_service, 180, ("cfg",)),
    ("serving_service_ab", sec_serving_service_ab, 240, ("cfg",)),
    ("accompaniment", sec_accompaniment, 180, ("cfg",)),
    ("mfu", sec_mfu, 30, ("cfg",)),
]


def _reset() -> None:
    """Fresh run state: the budget clock starts NOW (not at module import)
    and no stale sections/metrics leak between runs — bench() may be called
    long after import, or twice in one process."""
    global AGG, _START
    AGG = Aggregate()
    CTX.clear()
    _CACHE_EVENTS.clear()
    _START = time.time()


def _run_all() -> None:
    for name, fn, cap, needs in SECTIONS:
        if not run_section(name, fn, cap, needs):
            AGG.status = "budget_exhausted"
            # mark everything not yet attempted
            for nm, _, _, _ in SECTIONS:
                if nm not in AGG.sections:
                    AGG.section(nm, "skipped_budget", 0.0)
            break
    else:
        AGG.status = "complete"


def main() -> int:
    _reset()
    _install_signal_handlers()
    _run_all()
    AGG.emit()
    sys.stdout.flush()
    if AGG._any_hung:
        # a stalled/cut worker thread may still hold the device/client
        # locks — don't let interpreter teardown hang on it
        os._exit(0)
    return 0


def bench() -> dict:
    """Programmatic entry: run all sections (same budget machinery, fresh
    run state, no signal handlers) and return the final aggregate dict."""
    _reset()
    _run_all()
    return AGG.render()


if __name__ == "__main__":
    sys.exit(main())
