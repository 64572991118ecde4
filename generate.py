#!/usr/bin/env python
"""Generation entry point (SURVEY C21; reference counterpart ``generate.py``).

    python generate.py --run runs/jsb_rnnrbm [--generate.n_steps=1024 ...]
    python generate.py --config configs/jsb_rnnrbm.json --step 1200

Restores the checkpoint (best by default, latest with --latest), primes on
validation seed windows, samples, writes .mid files + an .npz of pianorolls.

Accompaniment (track-conditional generation — fix some tracks to given
music, sample the rest; conditioning binds in the feedback architecture):

    python generate.py --run runs/lpd5 --accompany melody.mid \
        --accompany-tracks 1,3
        # .mid/.midi: quantized through the run's own grid/track spec
        # (C1-C3) — MIDI in, MIDI out. Or an .npz (key "roll") with a
        # FRAME-space (T, K, D) or (B, T, K, D) pianoroll. Only the
        # --accompany-tracks slices are read either way.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__, allow_abbrev=False)
    p.add_argument("--run", help="run dir (reads its config.json + ckpt/)")
    p.add_argument("--config", help="explicit config JSON (alternative)")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: best, else latest)")
    p.add_argument("--latest", action="store_true",
                   help="use latest instead of best checkpoint")
    p.add_argument("--no-seed", action="store_true",
                   help="generate from scratch (no priming)")
    p.add_argument("--accompany", default=None,
                   help="given music whose --accompany-tracks slices are "
                        "fixed (the other tracks are sampled): a .mid/"
                        ".midi file (quantized via the run's data spec) or "
                        "an npz (key 'roll') with a FRAME-space (T, K, D) "
                        "or (B, T, K, D) pianoroll")
    p.add_argument("--accompany-tracks", default="",
                   help="comma-separated track indices fixed to --accompany")
    return p.parse_known_args(argv)


def main(argv=None) -> int:
    args, overrides = parse_args(argv)
    from multinn_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    from multinn_tpu.utils import config as cfg_mod
    try:
        cfg = cfg_mod.load_run_config(args.run, args.config, overrides)
    except FileNotFoundError as e:
        print(e, file=sys.stderr)
        return 2

    import jax
    from multinn_tpu.data.datasets import Dataset
    from multinn_tpu.training.trainer import Trainer
    from multinn_tpu.training.generator import Generator

    dataset = Dataset(cfg.data)
    trainer = Trainer(cfg, dataset=dataset)
    step = args.step
    if step is None and not args.latest:
        step = trainer.ckpt.best_step()
    trainer.restore(step=step)

    gen = Generator(cfg, trainer.params)
    gcfg = cfg.generate
    seed = None
    if not args.no_seed and gcfg.seed_steps > 0:
        seed = dataset.seed_windows("valid", n=gcfg.n_samples)
        seed = seed[:, :gcfg.seed_steps]
    key = jax.random.PRNGKey(cfg.train.seed + 7)
    out_dir = os.path.join(cfg.train.run_dir, gcfg.out_dir)
    if args.accompany:
        from multinn_tpu.data import pianoroll as pr
        tracks = tuple(int(t) for t in args.accompany_tracks.split(",")
                       if t.strip() != "")
        if not tracks:
            print("--accompany needs --accompany-tracks", file=sys.stderr)
            return 2
        if args.accompany.lower().endswith((".mid", ".midi")):
            # MIDI in, MIDI out — the natural accompaniment workflow
            # (give a melody file, generate the band): quantize through
            # the run's own grid/track spec (C1-C3), same pipeline the
            # datasets use, so track indices line up with training
            from multinn_tpu.data.datasets import parse_midi_file
            given = parse_midi_file(args.accompany, cfg.data.spec(),
                                    use_native=False)
            if given is None:
                print(f"--accompany: {args.accompany} is not parseable "
                      "MIDI", file=sys.stderr)
                return 2
            given = given[None]                      # (1, T, K, D)
        else:
            try:
                given = np.load(args.accompany)["roll"]
            except Exception:
                print(f"--accompany: {args.accompany} must be a .mid/"
                      ".midi file or an .npz with a 'roll' array "
                      "(B, T, K, D)", file=sys.stderr)
                return 2
        if given.ndim == 3:
            given = given[None]
        if gcfg.n_steps and given.shape[1] > gcfg.n_steps:
            given = given[:, :gcfg.n_steps]   # length knob, both formats
        if not np.any(given[:, :, list(tracks)]):
            # quantization can silently empty the requested tracks — most
            # commonly a MIDI given on a model with n_tracks not in {1, 5},
            # where every instrument maps to track 0 (the LPD-5 program
            # mapping applies only at K=5)
            print(f"warning: --accompany-tracks {tracks} are all-silent "
                  "in the given roll — accompaniment will condition on "
                  "silence (MIDI track mapping collapses to track 0 "
                  "unless the model has 5 tracks)", file=sys.stderr)
        # binarize BEFORE any encoding (same normalization as the serving
        # path's _normalize_given): a velocity or float roll would feed the
        # bitwise onset/hold ops garbage or crash them
        given = (np.asarray(given) > 0).astype(np.uint8)
        if cfg.data.encoding == "onset_hold":    # frame -> model space
            given = np.stack([pr.encode_onset_hold(g) for g in given])
        if seed is not None:                     # match the given batch
            reps = -(-given.shape[0] // seed.shape[0])
            seed = np.concatenate([seed] * reps)[:given.shape[0]]
        rolls = gen.accompany(key, given, tracks, seed=seed)
        rolls = gen.finalize(rolls)
        paths = gen.write_files(rolls, out_dir, prefix="accompany",
                                bpm=gcfg.bpm)
    else:
        rolls, paths = gen.generate_to_files(
            key, out_dir, n_samples=gcfg.n_samples, n_steps=gcfg.n_steps,
            seed=seed, bpm=gcfg.bpm)
    np.savez_compressed(os.path.join(out_dir, "pianorolls.npz"),
                        rolls=rolls)
    print(f"wrote {len(paths)} MIDI files to {out_dir} "
          f"(pianoroll shape {rolls.shape}, density {rolls.mean():.4f})")
    trainer.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
