#!/usr/bin/env python
"""Interleaved packed-vs-sparse serving transport A/B on a trained run.

    python scripts/serve_transport_ab.py --run runs/<dir> [--batch 64]
        [--n-steps 1024] [--rounds 4]

Builds TWO GenerationServices (transport=packed and =sparse) on the
run's best checkpoint and alternates full-batch rounds between them, so
the tunnel's minute-scale bandwidth drift hits both sides equally
(BASELINE "SPARSE-BYTE drain transport" row: single-run serving numbers
swung 57-166 songs/s on the packed side purely with link weather).
Prints per-round rates and medians as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__, allow_abbrev=False)
    p.add_argument("--run", required=True)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--n-steps", type=int, default=1024)
    p.add_argument("--rounds", type=int, default=4)
    p.add_argument("--batches-per-round", type=int, default=4)
    args = p.parse_args(argv)

    from multinn_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import numpy as np

    from multinn_tpu.data.datasets import Dataset
    from multinn_tpu.serving import GenerationService, ServeConfig
    from multinn_tpu.training.trainer import Trainer
    from multinn_tpu.utils import config as cfg_mod

    cfg = cfg_mod.load_run_config(args.run, None, [])
    trainer = Trainer(cfg, dataset=Dataset(cfg.data))
    trainer.restore(step=trainer.ckpt.best_step())
    params = trainer.params
    trainer.close()

    svcs, times = {}, {"packed": [], "sparse": []}
    for tr in ("packed", "sparse"):
        t0 = time.time()
        svcs[tr] = GenerationService(cfg, params, ServeConfig(
            batch=args.batch, n_steps=args.n_steps, transport=tr))
        print(f"init {tr}: {time.time() - t0:.1f}s", file=sys.stderr)
    n_req = args.batches_per_round * args.batch
    try:
        for rnd in range(args.rounds):
            for tr in ("packed", "sparse"):
                t0 = time.time()
                for f in svcs[tr].submit_many(n_req):
                    f.result(timeout=600)
                dt = time.time() - t0
                times[tr].append(dt)
                print(f"round {rnd} {tr}: {dt:.2f}s "
                      f"({n_req / dt:.0f} songs/s)", file=sys.stderr)
    finally:
        for sv in svcs.values():
            sv.close()
    report = {"run": args.run, "batch": args.batch,
              "n_steps": args.n_steps, "songs_per_round": n_req}
    for tr in ("packed", "sparse"):
        med = float(np.median(times[tr]))
        report[f"{tr}_songs_per_s_median"] = round(n_req / med, 1)
        report[f"{tr}_songs_per_s_range"] = [
            round(n_req / max(times[tr]), 1),
            round(n_req / min(times[tr]), 1)]
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
