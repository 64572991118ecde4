#!/usr/bin/env python
"""Training entry point (SURVEY C21; reference counterpart ``train.py``).

    python train.py --config configs/jsb_rnnrbm.json [--a.b.c=value ...]
    python train.py --preset jsb --model.decoder_type=rnn-nade

Builds dataset + model + trainer from the JSON config (+ dot-path overrides),
auto-resumes from the latest checkpoint in the run dir, trains, reports final
validation metrics.
"""

from __future__ import annotations

import argparse
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__,
                                allow_abbrev=False)
    p.add_argument("--config", help="path to an ExperimentConfig JSON")
    p.add_argument("--preset", help="dataset preset (synthetic/jsb/...) when "
                                    "no --config is given")
    p.add_argument("--no-resume", action="store_true",
                   help="do not auto-resume from run_dir checkpoints")
    p.add_argument("--profile-steps", type=int, default=0,
                   help="capture a jax.profiler device trace of the first N "
                        "steps of epoch 0 into <run_dir>/trace "
                        "(TensorBoard/Perfetto; SURVEY §5.1)")
    return p.parse_known_args(argv)


def build_config(args, overrides):
    from multinn_tpu.utils import config as cfg_mod
    if args.config:
        cfg = cfg_mod.load_json(args.config)
    else:
        from multinn_tpu.data.datasets import DataConfig
        from multinn_tpu.models.multinn import MultINNConfig
        data = DataConfig.from_preset(args.preset or "synthetic")
        model = MultINNConfig(n_tracks=data.n_tracks,
                              n_pitches=data.frame_dim)
        cfg = cfg_mod.ExperimentConfig(name=args.preset or "synthetic",
                                       data=data, model=model)
    if overrides:
        cfg = cfg_mod.apply_overrides(cfg, overrides)
        # preset path: the model's visible width derives from the data
        # config, so a data override (e.g. --data.encoding=onset_hold)
        # re-syncs it unless the user pinned model.n_pitches explicitly
        if (not args.config
                and not any(o.lstrip("-").startswith("model.n_pitches=")
                            for o in overrides)
                and cfg.model.n_pitches != cfg.data.frame_dim):
            cfg = cfg_mod.apply_overrides(
                cfg, [f"model.n_pitches={cfg.data.frame_dim}"])
    return cfg.validate()


def main(argv=None) -> int:
    args, overrides = parse_args(argv)
    from multinn_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    cfg = build_config(args, overrides)

    from multinn_tpu.training.trainer import Trainer
    from multinn_tpu.utils import config as cfg_mod

    os.makedirs(cfg.train.run_dir, exist_ok=True)
    cfg_mod.save_json(cfg, os.path.join(cfg.train.run_dir, "config.json"))

    trainer = Trainer(cfg)
    if not args.no_resume:
        trainer.maybe_resume()
    if args.profile_steps:
        trainer.profile_steps(args.profile_steps)
    final = trainer.train()
    trainer.log.info("done: %s", {k: round(v, 4) for k, v in final.items()
                                  if isinstance(v, float)})
    trainer.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
