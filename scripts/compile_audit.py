#!/usr/bin/env python
"""Persistent-compile-cache audit (VERDICT r3 #1).

Measures what the flagship programs actually cost to compile in a FRESH
process, twice, against the on-disk XLA cache
(~/.cache/multinn_tpu/xla-cache): the first run is allowed to miss, the
second run of a byte-identical program MUST hit. Per-program hit/miss
counts come from JAX's monitoring events (``/jax/compilation_cache/*``) —
the ground truth the ``warm`` flag in older BENCH files only guessed at.

    python scripts/compile_audit.py                   # all programs, 2 runs
    python scripts/compile_audit.py --programs train  # subset
    python scripts/compile_audit.py --child train     # (internal)

Prints ONE JSON line with, per program: [run1, run2] compile seconds and
cache hit/miss counters. Interpretation: run2 ``cache_hits >= 1`` and
seconds ≪ run1 = the persistent cache works for that program; run2 misses
mean the cache KEY is unstable across processes (the bug class to chase).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROGRAMS = ("train", "train_multi", "gen_rbm", "gen_nade",
            "gen_sparse", "hf", "accomp")


def _child(program: str, platform: str = None) -> dict:
    """Compile one flagship program in THIS process; report seconds +
    persistent-cache event counts."""
    from collections import Counter

    import jax

    if platform:         # the axon boot hook pre-empts JAX_PLATFORMS (see
        jax.config.update("jax_platforms", platform)   # utils/platform.py)
    import jax.numpy as jnp

    from multinn_tpu.utils.platform import enable_compilation_cache

    events = Counter()
    durations = {}
    jax.monitoring.register_event_listener(
        lambda name, **kw: events.update([name]))
    jax.monitoring.register_event_duration_secs_listener(
        lambda name, secs, **kw: durations.setdefault(name, []).append(secs))
    cache_dir = enable_compilation_cache()

    import optax

    from multinn_tpu.models import multinn
    from multinn_tpu.models.multinn import MultINNConfig

    cfg = MultINNConfig(n_tracks=5, n_pitches=84, mode="feedback",
                        decoder_type="rnn-rbm", n_hidden=150, n_rnn=100,
                        cd_k=1, gen_k=10)
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    B, T = 16, 64
    x = jax.random.bernoulli(jax.random.PRNGKey(1), 0.06,
                             (B, T, cfg.n_tracks, cfg.n_pitches)
                             ).astype(jnp.float32)
    opt = optax.adam(1e-3)
    key = jax.random.PRNGKey(2)

    # Every jitted program takes its big operands as ARGUMENTS — a
    # closed-over device array becomes an MLIR constant whose VALUE
    # lowering fetches back through the tunnel (measured: ~17 s for the
    # 27.5 MB batch; this, not XLA, dominated BENCH_r01–r03
    # "compile_train_s"). lower_s below reports that phase separately.
    t_l0 = time.time()
    if program == "train":
        def step(p, s, k, xb):
            (loss, _), g = jax.value_and_grad(
                lambda q: multinn.loss(q, k, xb, detailed=False),
                has_aux=True)(p)
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s, loss
        lowered = jax.jit(step).lower(params, opt.init(params), key, x)
    elif program == "train_multi":
        # the Trainer's production shape: steps_per_call scan of optimizer
        # steps (24 = the shipped configs' value)
        def many(p, s, k, xb):
            def body(carry, kk):
                p, s = carry
                (l, _), g = jax.value_and_grad(
                    lambda q: multinn.loss(q, kk, xb, detailed=False),
                    has_aux=True)(p)
                u2, s = opt.update(g, s)
                return (optax.apply_updates(p, u2), s), l
            (p, s), ls = jax.lax.scan(body, (p, s), jax.random.split(k, 24))
            return p, s, ls[-1]
        lowered = jax.jit(many).lower(params, opt.init(params), key, x)
    elif program == "gen_rbm":
        state = multinn.init_state(params, 1)
        lowered = jax.jit(
            lambda pp, ss, kk: multinn.generate(pp, kk, ss, 1024)[1]
        ).lower(params, state, key)
    elif program == "gen_nade":
        cfg_n = MultINNConfig(n_tracks=5, n_pitches=84, mode="feedback",
                              decoder_type="rnn-nade", n_hidden=150,
                              n_rnn=100)
        params_n = multinn.init(jax.random.PRNGKey(0), cfg_n)
        state_n = multinn.init_state(params_n, 1)
        lowered = jax.jit(
            lambda pp, ss, kk: multinn.generate(pp, kk, ss, 1024)[1]
        ).lower(params_n, state_n, key)
    elif program == "gen_sparse":
        # the sparse-transport generation program FAMILY (r4 session-4 —
        # ops/sparsebytes): built through the Generator's own transport
        # stage so the audited HLO has the dispatch's exact output
        # structure ({sparse, count, packed}); B=64 at this audit's
        # flagship config. Serving configs differ per user, so this
        # certifies the family's cache behavior, not one service's key.
        from multinn_tpu.training.generator import _transport
        state64 = multinn.init_state(params, 64)

        def gen_sparse(pp, ss, kk):
            roll = multinn.generate(pp, kk, ss, 1024)[1]
            return _transport(roll, "sparse")
        lowered = jax.jit(gen_sparse).lower(params, state64, key)
    elif program == "accomp":
        # fused-kernel accompaniment (r5 bench section): 2-of-5 given,
        # B=1 flagship — the auto dispatch resolves fused at trace time,
        # so on TPU this audits the conditional Pallas program family
        state1 = multinn.init_state(params, 1)
        giv = jax.random.bernoulli(
            jax.random.PRNGKey(3), 0.06,
            (1, 1024, cfg.n_tracks, cfg.n_pitches)).astype(jnp.float32)
        lowered = jax.jit(
            lambda pp, ss, gg, kk: multinn.generate_accompaniment(
                pp, kk, ss, gg, (0, 1))[1]
        ).lower(params, state1, giv, key)
    elif program == "hf":
        from multinn_tpu.training import hf
        cfg_n = MultINNConfig(n_tracks=5, n_pitches=84, mode="feedback",
                              decoder_type="rnn-nade", n_hidden=150,
                              n_rnn=100)
        params_n = multinn.init(jax.random.PRNGKey(0), cfg_n)
        lowered = jax.jit(
            lambda p, s, xx, k: hf.hf_step(p, s, xx, k, cg_iters=25)
        ).lower(params_n, hf.init_state(params_n), x, key)
    else:
        raise SystemExit(f"unknown program {program}")
    lower_s = time.time() - t_l0

    t0 = time.time()
    compiled = lowered.compile()
    compile_s = time.time() - t0
    del compiled
    cache = {k.rsplit("/", 1)[-1]: v for k, v in events.items()
             if "compilation_cache" in k}
    return {"program": program, "compile_s": round(compile_s, 1),
            "lower_s": round(lower_s, 1),
            "cache_events": cache,
            "cache_get_s": [round(s, 2) for s in durations.get(
                "/jax/compilation_cache/cache_retrieval", [])],
            "backend": str(jax.devices()[0].platform),
            "cache_dir": cache_dir}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__, allow_abbrev=False)
    ap.add_argument("--child", default=None, help="(internal) program name")
    ap.add_argument("--programs", default=",".join(PROGRAMS))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--platform", default=None,
                    help="force a backend in the child (e.g. cpu)")
    args = ap.parse_args(argv)

    if args.child:
        print("AUDIT " + json.dumps(_child(args.child, args.platform)))
        return 0

    out = {}
    for prog in args.programs.split(","):
        runs = []
        for _ in range(args.runs):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--child", prog]
            if args.platform:
                cmd += ["--platform", args.platform]
            r = subprocess.run(
                cmd,
                capture_output=True, text=True, timeout=3600,
                cwd=os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))))
            line = [ln for ln in r.stdout.splitlines()
                    if ln.startswith("AUDIT ")]
            if not line:
                runs.append({"error": r.stderr[-1500:]})
                break
            runs.append(json.loads(line[0][6:]))
        hits2 = (runs[-1].get("cache_events", {}).get("cache_hits", 0)
                 if len(runs) > 1 else 0)
        out[prog] = {
            "compile_s": [r.get("compile_s") for r in runs],
            "lower_s": [r.get("lower_s") for r in runs],
            "cache_events": [r.get("cache_events") for r in runs],
            "warm_hit": bool(hits2),
            # warm compiles can round to 0.0 s; clamp the denominator to
            # the rounding granularity so the ratio stays meaningful
            "speedup": (round(runs[0]["compile_s"]
                              / max(runs[-1]["compile_s"], 0.1), 1)
                        if len(runs) > 1 and "compile_s" in runs[0]
                        and "compile_s" in runs[-1] else None),
        }
        print(f"# {prog}: {out[prog]['compile_s']} s, "
              f"warm_hit={out[prog]['warm_hit']}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
