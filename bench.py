#!/usr/bin/env python
"""Benchmark harness (SURVEY §6 metric axes; run on the real TPU chip).

Measures the three driver metric axes on the flagship config:
  1. pianoroll steps/sec/chip (train) — MultINN 5-track feedback RNN-RBM
  2. 64-bar 5-track generation latency (1024 grid steps, one scan program)
  3. Gibbs sweeps/s (batched block-Gibbs chain)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
The reference publishes no numbers (BASELINE.md) — ``vs_baseline`` is measured
against the driver's north-star target of 1.0 s for 64-bar 5-track generation
[B:5]: vs_baseline = 1.0 / latency (>1 beats the target).
"""

from __future__ import annotations

import json
import time


def _warmup_compile_service():
    """This environment's remote TPU compile service has a 1-8 min cold start
    on the FIRST large compile of a process (see repo memory); a small
    grad-of-scan warmup first has been observed to shrink it."""
    import jax
    import jax.numpy as jnp

    def tiny(p):
        def body(c, x):
            return jnp.tanh(c @ p + x), c
        c, ys = jax.lax.scan(body, jnp.zeros((1, 8)), jnp.ones((4, 1, 8)))
        return jnp.sum(ys) + jnp.sum(c)

    from multinn_tpu.utils.profiling import force
    force(jax.jit(jax.grad(tiny))(jnp.eye(8)))


def bench():
    import os
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multinn_tpu.models import multinn
    from multinn_tpu.models.multinn import MultINNConfig
    from multinn_tpu.ops import gibbs as gibbs_ops
    from multinn_tpu.utils import flops as flops_mod
    from multinn_tpu.utils.platform import enable_compilation_cache
    from multinn_tpu.utils.profiling import force, timeit

    # persistent compile cache: the first process pays the remote-compile
    # cold start (1-8 min here); later processes deserialize in seconds.
    # Hit/miss counters come from JAX monitoring events (ground truth —
    # VERDICT r3 #1; scripts/compile_audit.py is the standalone prover).
    from collections import Counter
    cache_events = Counter()
    jax.monitoring.register_event_listener(
        lambda name, **kw: cache_events.update([name])
        if "compilation_cache" in name else None)
    cache_dir = enable_compilation_cache()
    cache_was_warm = bool(cache_dir and os.path.isdir(cache_dir)
                          and len(os.listdir(cache_dir)) > 0)

    _warmup_compile_service()

    cfg = MultINNConfig(n_tracks=5, n_pitches=84, mode="feedback",
                        decoder_type="rnn-rbm", n_hidden=150, n_rnn=100,
                        cd_k=1, gen_k=10)
    params = multinn.init(jax.random.PRNGKey(0), cfg)

    # ---- 1) train throughput --------------------------------------------
    import optax
    B, T = 16, 64
    # The batch is a jit ARGUMENT, never a closed-over device constant:
    # embedding a device array as an MLIR constant makes lowering fetch its
    # VALUE back through the tunnel (measured: 17 s for this 27.5 MB batch —
    # the bulk of what BENCH_r01–r03 reported as "compile_train_s")
    x = jax.device_put(jax.random.bernoulli(
        jax.random.PRNGKey(1), 0.06,
        (B, T, cfg.n_tracks, cfg.n_pitches)).astype(jnp.float32))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(p, s, k, xb):
        (loss, _), g = jax.value_and_grad(
            lambda q: multinn.loss(q, k, xb, detailed=False),
            has_aux=True)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, loss

    p, s = params, opt_state
    k = jax.random.PRNGKey(2)
    t0 = time.time()
    p, s, loss = train_step(p, s, k, x)
    force(loss)            # value-fetch sync: block_until_ready can return
    compile_train = time.time() - t0   # before the execute RPC on axon
    # In-program measurement (lax.scan of N optimizer steps — what the
    # Trainer runs with steps_per_call>1): per-EXECUTE host overhead on this
    # tunneled TPU is ~30-70 ms (and varies minute to minute), many times
    # the actual device step time, so the fused multi-step program is both
    # the honest device number and the real production configuration.
    # n_iter=50 keeps the unamortized floor under ~0.6 ms/step.
    def measure_train_many(params0, opt_, xb, n_iter):
        """Steady-state s/optimizer-step of the fused multi-step program —
        compile + TWO warm-up executions first (a fresh executable pays a
        one-time program-load overhead, ~80 ms/step observed), then
        min-of-3 timed calls with value-fetch sync. The ONE measurement
        protocol behind every train-throughput row (RBM and NADE)."""
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

    step_s = measure_train_many(p, opt, x, n_iter=50)
    train_steps_per_sec = (B * T) / step_s          # pianoroll steps/sec/chip

    # ---- 2) 64-bar 5-track generation latency ----------------------------
    n_steps = 1024                                   # 64 bars x 16 steps/bar

    def make_gen(pp, ss, n):
        """Whole-generation program with params/state as jit ARGUMENTS (a
        closure would embed them as MLIR constants and lowering would fetch
        their values back through the tunnel — same trap as the batch)."""
        j = jax.jit(lambda p_, s_, kk: multinn.generate(p_, kk, s_, n)[1])
        return lambda kk: j(pp, ss, kk)

    state = multinn.init_state(params, 1)
    gen = make_gen(params, state, n_steps)
    t0 = time.time()
    r = gen(jax.random.PRNGKey(3))
    force(r)
    compile_gen = time.time() - t0
    res = timeit(gen, jax.random.PRNGKey(4), iters=5, warmup=1)
    gen_latency = res["min_s"]

    # device time via the slope over n_steps (subtracts this environment's
    # ~30 ms/execute tunnel floor), and batched serving throughput: the
    # grid-streamed kernel runs B=8 at the same us/step as B=1.
    gen_long = make_gen(params, state, 8 * n_steps)
    res_long = timeit(gen_long, jax.random.PRNGKey(4), iters=3, warmup=1)
    us_per_step = (res_long["min_s"] - gen_latency) / (7 * n_steps) * 1e6
    gen_device_latency = us_per_step * n_steps / 1e6
    state8 = multinn.init_state(params, 8)
    gen8 = make_gen(params, state8, n_steps)
    res8 = timeit(gen8, jax.random.PRNGKey(4), iters=5, warmup=1)
    per_song_b8 = res8["min_s"] / 8

    # serving throughput at the gate's max batch (bf16 weight-storage
    # capacity mode past the f32 budget — BASELINE.md)
    from multinn_tpu.ops import gen_fused
    b_serve = max((b for b in (8, 16, 32, 64, 128, 256)
                   if gen_fused.supported(cfg, b, n_steps)), default=0)
    n_pipe = 8
    ks = [jax.random.fold_in(jax.random.PRNGKey(4), i)
          for i in range(n_pipe)]
    if b_serve:
        state_s = multinn.init_state(params, b_serve)
        gen_s = make_gen(params, state_s, n_steps)
        res_s = timeit(gen_s, jax.random.PRNGKey(4), iters=4, warmup=1)
        songs_per_sec = b_serve / res_s["min_s"]
        # PIPELINED serving: a real serving loop submits continuously, so
        # async dispatch hides the ~30 ms/execute tunnel floor behind
        # device work — submit N batches back-to-back, force once at the
        # end (the value fetch drains the whole queue; see profiling.force)
        force(gen_s(ks[0]))  # warm, drained
        t0 = time.time()
        outs = [gen_s(kk) for kk in ks]
        force(outs[-1])          # single-device PJRT executes FIFO, so the
        t_pipe = time.time() - t0   # last program completing implies all do
        # verify the FIFO assumption rather than trust it: draining the
        # earlier outputs should cost only the per-fetch host floor; any
        # excess is device work the timed region missed — count it
        floor = time.time(); force(outs[-1]); floor = time.time() - floor
        t1 = time.time()
        for o in outs[:-1]:
            force(o)
        t_drain = time.time() - t1
        excess = t_drain - (n_pipe - 1) * floor
        if excess > 0.1 * t_pipe:
            t_pipe += excess
        pipe_songs_per_sec = n_pipe * b_serve / t_pipe
    else:
        # no serving batch fits this device's VMEM gate (ADVICE r3): fall
        # back to the already-measured B=8 scan path rather than crashing
        songs_per_sec = 1.0 / per_song_b8
        pipe_songs_per_sec = songs_per_sec

    # serving SERVICE end-to-end (multinn_tpu/serving, r4): the full
    # runtime — queue -> continuous batching -> bounded async pipeline ->
    # drain/finalize/futures — open-loop at the gate-max batch. COMPLETED
    # songs only; kernel-level rows above remain the device ceiling.
    svc_songs_per_sec = 0.0
    if b_serve:
        from multinn_tpu.serving import GenerationService, ServeConfig
        from multinn_tpu.utils import config as _cfgm
        _data = _cfgm.DataConfig.from_preset(
            "synthetic", n_tracks=cfg.n_tracks, pitch_min=21,
            pitch_max=21 + cfg.n_pitches - 1, window=32, batch_size=8)
        _ecfg = _cfgm.ExperimentConfig(
            name="bench_serve", data=_data, model=cfg,
            generate=_cfgm.GenerateConfig(n_steps=n_steps)).validate()
        # transport pinned to packed: random-init params emit ~50%
        # density, where auto would pick sparse and demote — the sparse
        # story is measured at calibrated density in the A/B block below
        svc = GenerationService(_ecfg, params,
                                ServeConfig(batch=b_serve, n_steps=n_steps,
                                            max_wait_ms=2.0,
                                            transport="packed"))
        try:
            n_req = 8 * b_serve
            t0 = time.time()
            futs = svc.submit_many(n_req)
            for f in futs:
                f.result(timeout=600)
            svc_songs_per_sec = n_req / (time.time() - t0)
        finally:
            svc.close()

    # sparse vs packed drain transport through the SERVICE (r4 session-4,
    # ops/sparsebytes): the transports differ only in drain bytes, so the
    # variable that matters is output DENSITY — random-init params emit
    # ~50% density (where sparse correctly falls back / demotes), so
    # calibrate the visible bias to the measured converged-model density
    # (BASELINE density-matrix row, ~0.008) and interleave rounds to
    # defeat the tunnel's minute-scale bandwidth drift.
    svc_sparse = svc_packed_musical = 0.0
    if b_serve:
        bv_cal = float(np.log(0.008 / (1 - 0.008)))
        params_cal = params.replace(decoder=params.decoder.replace(
            bv=jnp.full_like(params.decoder.bv, bv_cal)))
        times_tr = {"packed": [], "sparse": []}
        svcs = {}
        try:
            for tr in ("packed", "sparse"):
                svcs[tr] = GenerationService(
                    _ecfg, params_cal,
                    ServeConfig(batch=b_serve, n_steps=n_steps,
                                max_wait_ms=2.0, transport=tr))
            for _ in range(3):
                for tr in ("packed", "sparse"):
                    n_req = 2 * b_serve
                    t0 = time.time()
                    for f in svcs[tr].submit_many(n_req):
                        f.result(timeout=600)
                    times_tr[tr].append((time.time() - t0) / n_req)
        finally:
            for sv in svcs.values():
                sv.close()
        svc_packed_musical = 1.0 / float(np.median(times_tr["packed"]))
        svc_sparse = 1.0 / float(np.median(times_tr["sparse"]))

    # RNN-NADE flagship generation (the second decoder family's fused
    # whole-generation kernel; same slope method for device time)
    cfg_n = MultINNConfig(n_tracks=5, n_pitches=84, mode="feedback",
                          decoder_type="rnn-nade", n_hidden=150, n_rnn=100)
    params_n = multinn.init(jax.random.PRNGKey(0), cfg_n)
    state_n = multinn.init_state(params_n, 1)
    gen_n = make_gen(params_n, state_n, n_steps)
    gen_n4 = make_gen(params_n, state_n, 4 * n_steps)
    rn1 = timeit(gen_n, jax.random.PRNGKey(4), iters=5, warmup=1)
    rn4 = timeit(gen_n4, jax.random.PRNGKey(4), iters=3, warmup=1)
    nade_device_s = (rn4["min_s"] - rn1["min_s"]) / (3 * n_steps) * n_steps

    # NADE serving at ITS gate max (bf16 aux capacity mode past B=48 — r4)
    bn_serve = max((b for b in (8, 16, 32, 48, 64)
                    if gen_fused.supported_nade(cfg_n, b, n_steps)),
                   default=0)
    if bn_serve:
        state_ns = multinn.init_state(params_n, bn_serve)
        gen_ns = make_gen(params_n, state_ns, n_steps)
        res_ns = timeit(gen_ns, jax.random.PRNGKey(4), iters=4, warmup=1)
        nade_songs_per_sec = bn_serve / res_ns["min_s"]
        force(gen_ns(ks[0]))                 # pipelined (see RBM block)
        t0 = time.time()
        outs = [gen_ns(kk) for kk in ks]
        force(outs[-1])
        t_pipe = time.time() - t0
        floor = time.time(); force(outs[-1]); floor = time.time() - floor
        t1 = time.time()
        for o in outs[:-1]:
            force(o)
        excess = (time.time() - t1) - (n_pipe - 1) * floor
        if excess > 0.1 * t_pipe:
            t_pipe += excess
        nade_pipe_songs_per_sec = n_pipe * bn_serve / t_pipe
    else:
        nade_songs_per_sec = 0.0
        nade_pipe_songs_per_sec = 0.0

    # NADE TRAIN throughput (grid-free exact-LL kernel, r4 —
    # ops/nade_ll_pallas.py; the auto dispatch picks it on TPU). Same
    # measurement protocol as the RBM train row (measure_train_many).
    Bn = 64
    xn = jax.device_put(jax.random.bernoulli(
        jax.random.PRNGKey(8), 0.06,
        (Bn, T, cfg_n.n_tracks, cfg_n.n_pitches)).astype(jnp.float32))
    nade_step_train_s = measure_train_many(params_n, optax.adam(1e-3), xn,
                                           n_iter=50)
    nade_train_fps = (Bn * T) / nade_step_train_s

    # ---- 3) Gibbs sweeps/s (in-program amortized: scan of chains) ---------
    D, H, BB, K_SWEEPS = 84, 150, 4096, 25
    w = 0.01 * jax.random.normal(jax.random.PRNGKey(5), (D, H))
    bv = jnp.zeros((D,))
    bh = jnp.zeros((H,))
    v0 = jax.random.bernoulli(jax.random.PRNGKey(6), 0.1, (BB, D)
                              ).astype(jnp.float32)
    n_chains = 40

    def many(kk, v0_, w_, bv_, bh_):
        def body(v, k1):
            # the dispatch picks the faster impl per shape (pallas kernel
            # while latency-bound, XLA fusion at large batch)
            return gibbs_ops.gibbs_chain(k1, v, w_, bv_, bh_,
                                         k=K_SWEEPS), None
        v, _ = jax.lax.scan(body, v0_, jax.random.split(kk, n_chains))
        return v

    many_jit = jax.jit(many)
    chain = lambda kk: many_jit(kk, v0, w, bv, bh)
    res_g = timeit(chain, jax.random.PRNGKey(7), iters=5, warmup=2)
    gibbs_sweeps_per_sec = n_chains * K_SWEEPS * BB / res_g["min_s"]

    # ---- 4) MFU / roofline (VERDICT r2 #1: FLOPs-counted utilization) -----
    # Model-FLOPs utilization against the v5e bf16 MXU peak; the fused
    # generation kernels also report EXECUTED utilization (their per-track
    # block-diagonal layouts multiply K-1 zero blocks — see utils/flops.py).
    peak = flops_mod.V5E_PEAK_FLOPS
    train_flops = flops_mod.train_step_flops(cfg, B, T)
    train_mfu = flops_mod.mfu(train_flops, step_s)
    g_rbm = flops_mod.gen_step_flops_rbm(cfg, batch=1)
    step_dev_s = us_per_step / 1e6
    gen_rbm_mfu = flops_mod.mfu(g_rbm["model"], step_dev_s)
    gen_rbm_hw = flops_mod.mfu(g_rbm["executed"], step_dev_s)
    g_nade = flops_mod.gen_step_flops_nade(cfg_n, batch=1)
    nade_step_s = nade_device_s / n_steps
    gen_nade_mfu = flops_mod.mfu(g_nade["model"], nade_step_s)
    gen_nade_hw = flops_mod.mfu(g_nade["executed"], nade_step_s)
    # Gibbs microbench: 4DH model FLOPs per row-sweep
    gibbs_mfu = flops_mod.mfu(4 * D * H * gibbs_sweeps_per_sec, 1.0)

    mfu_report = {
        "train_mfu": round(train_mfu, 4),
        "train_model_gflops_per_step": round(train_flops / 1e9, 3),
        "gen_rbm_mfu": round(gen_rbm_mfu, 5),
        "gen_rbm_hw_util": round(gen_rbm_hw, 5),
        "gen_nade_mfu": round(gen_nade_mfu, 6),
        "gen_nade_hw_util": round(gen_nade_hw, 6),
        "gibbs_bench_mfu": round(gibbs_mfu, 4),
        "bound": {
            # classifications argued from the numbers above; the full
            # roofline note lives in BASELINE.md
            "train": "latency (T-sequential LSTM scan; per-step matmuls "
                     "(B,604)x(604,400) underfill the 128x128 MXU)",
            "gen_rbm": "latency (serial T chain of ~1us-scale ops; "
                       "MFU<<1% is structural, us/step is the metric)",
            "gen_nade": "latency (D serial dims x T steps)",
            "gibbs_bench": "sampler/VPU (RNG+compare at B=4096 outweigh "
                           "the 84x150 matmuls)",
        },
    }

    return {
        "metric": "gen_latency_64bar_5track",
        "value": round(gen_latency, 4),
        "unit": "s",
        "vs_baseline": round(1.0 / gen_latency, 2),
        "extra": {
            "gen_device_s_64bar": round(gen_device_latency, 4),
            "gen_device_us_per_step": round(us_per_step, 2),
            "gen_per_song_s_at_batch8": round(per_song_b8, 4),
            "serving_songs_per_sec": round(songs_per_sec, 1),
            "serving_pipelined_songs_per_sec": round(pipe_songs_per_sec, 1),
            "serving_service_songs_per_sec": round(svc_songs_per_sec, 1),
            # full-payload service at converged-model density, interleaved
            # packed/sparse A/B (ops/sparsebytes; medians of 3 rounds)
            "serving_service_musical_packed_songs_per_sec":
                round(svc_packed_musical, 1),
            "serving_service_musical_sparse_songs_per_sec":
                round(svc_sparse, 1),
            "serving_batch": b_serve,
            "serving_nade_songs_per_sec": round(nade_songs_per_sec, 1),
            "serving_nade_pipelined_songs_per_sec":
                round(nade_pipe_songs_per_sec, 1),
            "serving_nade_batch": bn_serve,
            "gen_nade_device_s_64bar": round(nade_device_s, 4),
            "train_pianoroll_steps_per_sec_per_chip":
                round(train_steps_per_sec, 0),
            "train_step_ms": round(step_s * 1e3, 2),
            "train_nade_frames_per_sec_per_chip": round(nade_train_fps, 0),
            "train_nade_step_ms": round(nade_step_train_s * 1e3, 2),
            "train_nade_batch": Bn,
            "gibbs_sweeps_per_sec": round(gibbs_sweeps_per_sec, 0),
            "compile_train_s": round(compile_train, 1),
            "compile_gen_s": round(compile_gen, 1),
            "compile_cache": {
                "dir": cache_dir, "dir_populated": cache_was_warm,
                # measured per-process event counts: hits prove the
                # persistent cache served THIS run's programs
                **{k.rsplit("/", 1)[-1]: v for k, v in cache_events.items()},
            },
            "mfu": mfu_report,
            "device": str(jax.devices()[0]),
            "note": ("vs_baseline = north-star 1.0s / measured latency; "
                     "reference publishes no numbers (BASELINE.md)"),
        },
    }


if __name__ == "__main__":
    print(json.dumps(bench()))
