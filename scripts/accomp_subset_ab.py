"""A/B track-conditional generation (accompaniment): mask-merge over a
full-K sample_frame sweep (the original formulation) vs subset sampling
(sample_frame runs ONLY for the non-given tracks — multinn.py commit
"Accompaniment samples only the complement tracks").

The two are bit-exact by construction (tests/test_accompaniment.py
test_subset_sampling_bit_exact_with_masked_full_sampling); this script
measures what the skipped Gibbs/NADE ancestral sweeps are worth on the
live chip at the flagship LPD-5 shapes. The whole accompaniment program
is ONE lax.scan over T steps, so the ~30 ms per-dispatch tunnel overhead
amortizes in-program (BASELINE.md measurement notes); arms are
interleaved and medians reported.

The old arm is loaded verbatim from git (``--old-rev``, default the
commit preceding the subset-sampling change) under a standalone module
name — no reimplementation drift. Run:
    python scripts/accomp_subset_ab.py [--iters N] [--steps T]
"""

import argparse
import importlib.util
import os
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OLD_REV_DEFAULT = "514ffe4"  # last commit with the mask-merge formulation


def load_old_multinn(rev: str):
    """Materialize multinn.py at ``rev`` as an independent module."""
    src = subprocess.check_output(
        ["git", "show", f"{rev}:multinn_tpu/models/multinn.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    with tempfile.NamedTemporaryFile("wb", suffix=".py", delete=False) as f:
        f.write(src)
        path = f.name
    spec = importlib.util.spec_from_file_location("old_multinn", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["old_multinn"] = mod   # dataclasses resolves cls.__module__
    try:
        spec.loader.exec_module(mod)
    finally:
        os.unlink(path)                # don't leak a temp .py per run
    return mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=7)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--old-rev", default=OLD_REV_DEFAULT)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multinn_tpu.models import multinn
    from multinn_tpu.models.multinn import MultINNConfig
    from multinn_tpu.utils.platform import enable_compilation_cache
    from multinn_tpu.utils.profiling import force

    enable_compilation_cache()
    old = load_old_multinn(args.old_rev)
    print(f"backend={jax.default_backend()} old_rev={args.old_rev} "
          f"T={args.steps} B={args.batch}", flush=True)

    # both flagship LPD-5 configs; 2 of 5 tracks given (melody+bass ->
    # generate the band), the serving default shape
    cases = [
        ("nade", MultINNConfig(n_tracks=5, n_pitches=84, mode="feedback",
                               decoder_type="rnn-nade", encoder_hidden=(64,),
                               n_hidden=150, n_rnn=100)),
        ("rbm", MultINNConfig(n_tracks=5, n_pitches=84, mode="per-track",
                              decoder_type="rnn-rbm", encoder_hidden=(64,),
                              n_hidden=150, n_rnn=100, gen_k=25)),
    ]
    given_tracks = (0, 1)
    results = {}
    for name, cfg in cases:
        params = multinn.init(jax.random.PRNGKey(0), cfg)
        given = (jax.random.uniform(
            jax.random.PRNGKey(1),
            (args.batch, args.steps, cfg.n_tracks, cfg.n_pitches)) <
            0.05).astype(jnp.float32)

        def run_new(key, g):
            st0 = multinn.init_state(params, args.batch)
            # fused=False isolates the SUBSET-SAMPLING change this script
            # documents — at HEAD the fused=None auto-dispatch would route
            # these shapes to the Pallas kernels and measure the (much
            # larger) fused-kernel win instead
            return multinn.generate_accompaniment(
                params, key, st0, g, given_tracks, fused=False)[1]

        def run_old(key, g):
            st0 = old.init_state(params, args.batch)
            return old.generate_accompaniment(
                params, key, st0, g, given_tracks)[1]

        jit_new = jax.jit(run_new)
        jit_old = jax.jit(run_old)
        key = jax.random.PRNGKey(2)
        force(jit_new(key, given))   # compile
        force(jit_old(key, given))
        t_new, t_old = [], []
        for i in range(args.iters):  # interleaved (link-drift hygiene)
            t0 = time.perf_counter()
            force(jit_old(key, given))
            t_old.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            force(jit_new(key, given))
            t_new.append(time.perf_counter() - t0)
        mo, mn = statistics.median(t_old), statistics.median(t_new)
        per_step_us = mn / args.steps * 1e6
        print(f"{name}: old {mo*1e3:8.2f} ms  new {mn*1e3:8.2f} ms  "
              f"speedup {mo/mn:0.2f}x  ({per_step_us:0.1f} us/step new, "
              f"B={args.batch})", flush=True)
        results[name] = (mo, mn)
    return results


if __name__ == "__main__":
    main()
