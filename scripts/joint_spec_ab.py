#!/usr/bin/env python
"""Joint-mode NADE speculative-depth A/B (VERDICT r4 next-item 8, stretch).

Joint mode concatenates all K tracks into ONE decoder of K*D visible dims
(420 at the flagship shape), so its fused-generation ancestral sweep is a
420-dim serial chain — measured r3 at 70.6 µs/step vs per-track's 17.7.
The speculative sweep (ops/gen_fused_nade.py) shrinks the chain to
D/spec dependency rounds; this script measures the joint config at every
available depth (1, 2, 4) to answer whether a joint-specific depth choice
closes any of the ~4x gap, or whether the gap is structural (420/84 = 5x
the serial dims; depth 8 is closed by the exponential-branch arithmetic in
TODO.md AND by 8 not dividing 420).

Run on the real chip with no other load:
    python scripts/joint_spec_ab.py [--iters 5] [--n-steps 1024]

Prints one JSON line: {"spec1": us_per_step, "spec2": ..., "spec4": ...,
"per_track_spec4": ...} (the per-track flagship number re-measured in the
same process for an apples-to-apples drift-free ratio).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__, allow_abbrev=False)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--n-steps", type=int, default=1024)
    args = ap.parse_args(argv)

    import jax

    from multinn_tpu.models import multinn
    from multinn_tpu.models.multinn import MultINNConfig
    from multinn_tpu.utils.platform import enable_compilation_cache
    from multinn_tpu.utils.profiling import timeit

    enable_compilation_cache()
    n = args.n_steps
    out = {"n_steps": n, "device": str(jax.devices()[0])}

    def us_per_step(cfg, label):
        """Device time per generation step via the slope method (1x vs 4x
        n_steps subtracts the ~30 ms/execute tunnel floor). A fresh jit
        wrapper per call so MULTINN_NADE_SPEC is re-resolved at trace time
        (ops/gen_fused_nade._resolve_spec is read OUTSIDE jit on direct
        calls but baked into wrapper traces — rebuild the wrapper per
        setting, per its docstring)."""
        params = multinn.init(jax.random.PRNGKey(0), cfg)
        state = multinn.init_state(params, 1)

        def make(steps):
            j = jax.jit(lambda p_, s_, kk: multinn.generate(
                p_, kk, s_, steps)[1])
            return lambda kk: j(params, state, kk)

        r1 = timeit(make(n), jax.random.PRNGKey(4), iters=args.iters,
                    warmup=1)
        r4 = timeit(make(4 * n), jax.random.PRNGKey(4),
                    iters=max(3, args.iters - 2), warmup=1)
        us = (r4["min_s"] - r1["min_s"]) / (3 * n) * 1e6
        print(f"# {label}: {us:.2f} us/step (wall 1x {r1['min_s']:.3f}s)",
              file=sys.stderr)
        return round(us, 2)

    cfg_j = MultINNConfig(n_tracks=5, n_pitches=84, mode="joint",
                          decoder_type="rnn-nade", n_hidden=150, n_rnn=100)
    for spec in (4, 2, 1):
        os.environ["MULTINN_NADE_SPEC"] = str(spec)
        out[f"joint_spec{spec}_us_per_step"] = us_per_step(
            cfg_j, f"joint spec={spec}")
    os.environ.pop("MULTINN_NADE_SPEC", None)

    cfg_t = MultINNConfig(n_tracks=5, n_pitches=84, mode="feedback",
                          decoder_type="rnn-nade", n_hidden=150, n_rnn=100)
    out["per_track_spec4_us_per_step"] = us_per_step(cfg_t,
                                                     "per-track spec=4")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
