#!/usr/bin/env python
"""Scale-stress measurement (VERDICT r2 next #3): train the flagship
architecture WELL past reference scale on the real chip and record step
time, throughput and MFU — the reference scales (H=150, U=100) never bind
the MXU, so this is where the framework's single-chip compute story is
actually tested.

Also verifies the Gibbs dispatch crossover does what its gate promises at
these shapes (B*T rows >> 2048 -> XLA formulation, not the Pallas kernel).

Run:  python scripts/scale_stress.py [--h 1024] [--batch 256] [--t 64]
Appends one JSON line per config to stdout; rows land in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(n_hidden: int, n_rnn: int, batch: int, t_window: int,
            n_iter: int = 10, mode: str = "feedback",
            dtype: str = "f32") -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from multinn_tpu.models import multinn
    from multinn_tpu.models.multinn import MultINNConfig
    from multinn_tpu.ops import gibbs_pallas, precision
    from multinn_tpu.utils import flops as flops_mod

    cfg = MultINNConfig(n_tracks=5, n_pitches=84, mode=mode,
                        decoder_type="rnn-rbm", n_hidden=n_hidden,
                        n_rnn=n_rnn, cd_k=1, gen_k=10, matmul_dtype=dtype)
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.bernoulli(
        jax.random.PRNGKey(1), 0.06,
        (batch, t_window, cfg.n_tracks, cfg.n_pitches)).astype(jnp.float32)
    opt = optax.adam(1e-3)
    s = opt.init(params)

    # the CD chain sees (T, B, D) rows; at this scale the Pallas per-step
    # kernel's perf-crossover gate must hand the chain to XLA
    w_probe = jnp.zeros((cfg.n_pitches, n_hidden))
    v_probe = jnp.zeros((t_window, batch, cfg.n_pitches))
    gibbs_impl = ("pallas" if gibbs_pallas.supported(v_probe, w_probe)
                  else "xla")

    # the batch is a jit ARGUMENT (a closed-over device array becomes an
    # MLIR constant whose value lowering fetches back through the tunnel),
    # and sync is a value FETCH (profiling.force) — bare block_until_ready
    # can return before the execute RPC is issued on the axon backend
    from multinn_tpu.utils.profiling import force

    def train_many(p, s, key, xb):
        def body(carry, kk):
            p, s = carry
            with precision.matmul_precision(cfg.matmul_dtype):
                (l, _), g = jax.value_and_grad(
                    lambda q: multinn.loss(q, kk, xb, detailed=False),
                    has_aux=True)(p)
            u2, s = opt.update(g, s)
            return (optax.apply_updates(p, u2), s), l
        (p, s), ls = jax.lax.scan(body, (p, s),
                                  jax.random.split(key, n_iter))
        return p, s, ls[-1]

    step_fn = jax.jit(train_many, donate_argnums=(0, 1))
    k = jax.random.PRNGKey(2)
    t0 = time.time()
    params, s, loss = step_fn(params, s, k, x)
    force(loss)
    compile_s = time.time() - t0
    times = []
    for i in range(3):
        t0 = time.time()
        params, s, loss = step_fn(params, s, jax.random.fold_in(k, i), x)
        force(loss)
        times.append(time.time() - t0)
    step_s = min(times) / n_iter
    frames = batch * t_window
    fl = flops_mod.train_step_flops(cfg, batch, t_window)
    return {
        "config": {"H": n_hidden, "U": n_rnn, "B": batch, "T": t_window,
                   "K": 5, "D": 84, "mode": mode, "cd_k": 1,
                   "matmul_dtype": dtype},
        "step_ms": round(step_s * 1e3, 2),
        "frames_per_sec_per_chip": round(frames / step_s, 0),
        "model_gflops_per_step": round(fl / 1e9, 1),
        "mfu": round(flops_mod.mfu(fl, step_s), 4),
        "gibbs_dispatch": gibbs_impl,
        "compile_s": round(compile_s, 1),
        "loss_finite": bool(jax.numpy.isfinite(loss)),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--h", type=int, default=1024)
    p.add_argument("--u", type=int, default=512)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--t", type=int, default=64)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                   help="matmul-feed precision (ops/precision.py)")
    args = p.parse_args(argv)
    from multinn_tpu.utils.platform import (apply_platform_env,
                                            enable_compilation_cache)
    apply_platform_env()
    enable_compilation_cache()
    res = measure(args.h, args.u, args.batch, args.t, n_iter=args.iters,
                  dtype=args.dtype)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
