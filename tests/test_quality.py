"""Pinned quality-regression tests (VERDICT r3 #2 / SURVEY §4.6
strengthened): convergence on the PINNED synthetic corpus must reach
measured thresholds — a silent CD-sign, RNG-stream, or optimizer regression
passes loss-decreases tests but fails these.

Thresholds were measured on this CPU×8 mesh 2026-08-17 (r4) with ~40%
margin:
    rnn-nade/adam 12 epochs: valid ll/frame  -2.79  -> threshold -4.5
    rnn-nade/hf    6 epochs: valid ll/frame  -0.69  -> threshold -1.5
    rnn-rbm/adam  15 epochs: valid PLL/frame -1.85  -> threshold -4.0
All runs start from the same seeded init at valid ll/frame ≈ -16.6.
"""

import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from multinn_tpu.data.datasets import DataConfig
from multinn_tpu.models.multinn import MultINNConfig
from multinn_tpu.training.trainer import Trainer
from multinn_tpu.utils import config as cfg_mod


def _train(dec, opt, epochs, tmp):
    data = DataConfig.from_preset("synthetic", n_tracks=3, pitch_min=40,
                                  pitch_max=63, window=32, batch_size=8,
                                  synthetic_songs=12, synthetic_steps=64)
    model = MultINNConfig(n_tracks=3, n_pitches=24, mode="feedback",
                          decoder_type=dec, n_hidden=32, n_rnn=24, gen_k=2)
    tkw = dict(epochs=epochs, lr=3e-3, log_every_steps=50,
               ckpt_every_steps=0, eval_every_epochs=100,
               early_stop_patience=0, run_dir=tmp, optimizer=opt)
    if opt == "hf":
        tkw["hf_cg_iters"] = 10
    cfg = cfg_mod.ExperimentConfig(
        name=f"quality_{dec}_{opt}", data=data, model=model,
        train=cfg_mod.TrainConfig(**tkw)).validate()
    t = Trainer(cfg)
    init_ll = float(t.evaluate("valid")["ll_per_frame"])
    t.train()
    ev = t.evaluate("valid")
    t.close()
    return init_ll, ev


def test_nade_adam_reaches_pinned_ll(tmp_path):
    init_ll, ev = _train("rnn-nade", "adam", 12, str(tmp_path))
    assert init_ll < -10, "seeded init drifted — regenerate thresholds"
    assert float(ev["ll_per_frame"]) >= -4.5, dict(ev)


def test_nade_hf_reaches_pinned_ll_faster_than_adam(tmp_path):
    """The paper's HF regime: at HALF the epochs HF must beat the Adam
    threshold with room (measured -0.69 vs Adam's 12-epoch -2.79)."""
    init_ll, ev = _train("rnn-nade", "hf", 6, str(tmp_path))
    assert init_ll < -10
    assert float(ev["ll_per_frame"]) >= -1.5, dict(ev)


def test_rbm_adam_reaches_pinned_pll(tmp_path):
    init_ll, ev = _train("rnn-rbm", "adam", 15, str(tmp_path))
    assert init_ll < -10
    assert float(ev["pll"]) >= -4.0, dict(ev)
