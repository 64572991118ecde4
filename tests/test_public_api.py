"""Public API surface (B:5 model/trainer/generator contract): top-level
re-exports resolve and a user can drive the whole flow through them."""

import jax
import numpy as np
import pytest


def test_top_level_exports():
    import multinn_tpu as mt
    for name in ("MultINNConfig", "Trainer", "Generator", "Dataset",
                 "DataConfig", "ExperimentConfig", "MeshConfig",
                 "load_config", "multinn"):
        assert getattr(mt, name) is not None
    assert "Trainer" in dir(mt)


@pytest.mark.slow
def test_api_flow(tmp_path):
    import multinn_tpu as mt

    data = mt.DataConfig.from_preset("synthetic", n_tracks=2, pitch_min=40,
                                     pitch_max=63, window=8, batch_size=4,
                                     synthetic_songs=4, synthetic_steps=32)
    model = mt.MultINNConfig(n_tracks=2, n_pitches=24,
                             decoder_type="rnn-nade", n_hidden=8, n_rnn=6,
                             gen_k=2)
    cfg = mt.ExperimentConfig(
        name="api", data=data, model=model,
        train=mt.TrainConfig(epochs=1, run_dir=str(tmp_path / "api"),
                             ckpt_every_steps=0)).validate()
    trainer = mt.Trainer(cfg)
    trainer.train()
    gen = mt.Generator(cfg, trainer.params)
    rolls = gen.generate(jax.random.PRNGKey(0), n_steps=4, batch=2)
    assert rolls.shape == (2, 4, 2, 24)
    assert set(np.unique(rolls)) <= {0, 1}
    trainer.close()
