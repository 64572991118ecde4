"""Distributed tests without a cluster (SURVEY §4.4): 8 virtual CPU devices
(conftest). Sharded-vs-single-device numerical equality for DP gradients and
dp×track GSPMD steps, mesh construction, and sharding placement checks."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-tier: multi-device equality / interpret-mode kernels

from multinn_tpu.data.datasets import DataConfig
from multinn_tpu.models.multinn import MultINNConfig
from multinn_tpu.parallel import mesh as mesh_mod
from multinn_tpu.parallel.mesh import MeshConfig
from multinn_tpu.training.trainer import Trainer
from multinn_tpu.utils import config as cfg_mod


def exp_cfg(tmp_path, mesh: MeshConfig, name="par", mode="per-track",
            dec="rnn-nade", n_tracks=2, epochs=1):
    data = DataConfig.from_preset("synthetic", n_tracks=n_tracks,
                                  pitch_min=40, pitch_max=63, window=8,
                                  batch_size=8, synthetic_songs=8,
                                  synthetic_steps=32)
    model = MultINNConfig(n_tracks=n_tracks, n_pitches=24, mode=mode,
                          decoder_type=dec, n_hidden=12, n_rnn=8, gen_k=2)
    train = cfg_mod.TrainConfig(epochs=epochs, lr=1e-3, log_every_steps=100,
                                ckpt_every_steps=0,
                                run_dir=str(tmp_path / name))
    return cfg_mod.ExperimentConfig(name=name, data=data, model=model,
                                    train=train, mesh=mesh).validate()


def test_mesh_construction():
    m = mesh_mod.make_mesh(MeshConfig(use_mesh=True, track=2))
    assert m.shape == {"data": 4, "track": 2}
    m2 = mesh_mod.make_mesh(MeshConfig(use_mesh=True))
    assert m2.shape == {"data": 8, "track": 1}
    m3 = mesh_mod.make_mesh(MeshConfig(use_mesh=True, track=2, model=2))
    assert m3.shape == {"data": 2, "track": 2, "model": 2}
    m4 = mesh_mod.make_mesh(MeshConfig(use_mesh=True, seq=4))
    assert m4.shape == {"data": 2, "track": 1, "seq": 4}
    assert mesh_mod.make_mesh(MeshConfig(use_mesh=False)) is None
    with pytest.raises(ValueError):
        mesh_mod.make_mesh(MeshConfig(use_mesh=True, data=3, track=2))


def _one_step(trainer):
    batch = next(iter(trainer.dataset.batches("train", epoch=0)))
    key = jax.random.PRNGKey(123)
    dev = trainer._put_batch(batch)
    params, opt_state, metrics = trainer._train_step(
        trainer.params, trainer.opt_state, dev, key)
    return jax.device_get(params), jax.device_get(metrics)


@pytest.mark.parametrize("style", ["gspmd", "shard_map"])
def test_dp_step_matches_single_device(tmp_path, style):
    """One NADE train step (exact-likelihood; the shard_map path folds RNG by
    shard so only the GSPMD path is bit-comparable — for shard_map we check
    the loss, which is key-independent for NADE)."""
    cfg_single = exp_cfg(tmp_path, MeshConfig(use_mesh=False), name="s")
    cfg_mesh = exp_cfg(tmp_path, MeshConfig(use_mesh=True, style=style),
                       name=f"m_{style}")
    t_single = Trainer(cfg_single)
    t_mesh = Trainer(cfg_mesh)

    # identical init (same seed)
    p_s = jax.device_get(t_single.params)
    p_m = jax.device_get(t_mesh.params)
    for a, b in zip(jax.tree.leaves(p_s), jax.tree.leaves(p_m)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    new_s, met_s = _one_step(t_single)
    new_m, met_m = _one_step(t_mesh)
    np.testing.assert_allclose(float(met_s["loss"]), float(met_m["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_s), jax.tree.leaves(new_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    t_single.close()
    t_mesh.close()


@pytest.mark.parametrize("mode", ["per-track", "feedback"])
def test_dp_track_gspmd_matches_single_device(tmp_path, mode):
    """dp=4 × track=2 GSPMD step == single-device step, NADE decoders.
    The feedback mode exercises the partitioner-inserted cross-track latent
    all-gather [B:10]."""
    cfg_single = exp_cfg(tmp_path, MeshConfig(use_mesh=False),
                         name=f"s_{mode}", mode=mode)
    cfg_mesh = exp_cfg(tmp_path,
                       MeshConfig(use_mesh=True, track=2, style="gspmd"),
                       name=f"m_{mode}", mode=mode)
    t_single = Trainer(cfg_single)
    t_mesh = Trainer(cfg_mesh)
    new_s, met_s = _one_step(t_single)
    new_m, met_m = _one_step(t_mesh)
    np.testing.assert_allclose(float(met_s["loss"]), float(met_m["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_s), jax.tree.leaves(new_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    t_single.close()
    t_mesh.close()


@pytest.mark.parametrize("dec", ["rnn-rbm", "rnn-nade"])
def test_tp_step_matches_single_device(tmp_path, dec):
    """Tensor parallelism: hidden dim sharded over the ``model`` axis
    (dp=2 × model=4). The free-energy softplus sum / NADE running-activation
    contraction over H become partitioner-inserted psums; the step must match
    single-device within float-reduction-reorder tolerance. The RBM case also
    pins partitionable-threefry RNG: Gibbs h-samples on an H-sharded shape
    must equal the unsharded stream."""
    cfg_single = exp_cfg(tmp_path, MeshConfig(use_mesh=False),
                         name=f"tp_s_{dec}", dec=dec)
    cfg_mesh = exp_cfg(tmp_path,
                       MeshConfig(use_mesh=True, model=4, style="gspmd"),
                       name=f"tp_m_{dec}", dec=dec)
    t_single = Trainer(cfg_single)
    t_mesh = Trainer(cfg_mesh)
    new_s, met_s = _one_step(t_single)
    new_m, met_m = _one_step(t_mesh)
    np.testing.assert_allclose(float(met_s["loss"]), float(met_m["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_s), jax.tree.leaves(new_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    t_single.close()
    t_mesh.close()


def test_dp_track_model_gspmd_matches_single_device(tmp_path):
    """The full 3D mesh (dp=2 × track=2 × model=2) on the feedback
    architecture: cross-track latent all-gather AND hidden-dim TP psum in one
    program, equal to the single-device step."""
    cfg_single = exp_cfg(tmp_path, MeshConfig(use_mesh=False), name="3d_s",
                         mode="feedback")
    cfg_mesh = exp_cfg(tmp_path,
                       MeshConfig(use_mesh=True, track=2, model=2,
                                  style="gspmd"),
                       name="3d_m", mode="feedback")
    t_single = Trainer(cfg_single)
    t_mesh = Trainer(cfg_mesh)
    new_s, met_s = _one_step(t_single)
    new_m, met_m = _one_step(t_mesh)
    np.testing.assert_allclose(float(met_s["loss"]), float(met_m["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_s), jax.tree.leaves(new_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    t_single.close()
    t_mesh.close()


def test_tp_sharding_placement(tmp_path):
    """Hidden-dim leaves must actually shard over ``model``; visible-dim and
    RNN-cell leaves must stay replicated (the TP layout contract)."""
    cfg = exp_cfg(tmp_path, MeshConfig(use_mesh=True, model=2,
                                       style="gspmd"), name="tp_place")
    t = Trainer(cfg)
    dec = t.params.decoder
    assert dec.w.sharding.spec[-1] == mesh_mod.MODEL_AXIS
    assert dec.bh.sharding.spec[-1] == mesh_mod.MODEL_AXIS
    assert dec.wuh.sharding.spec[-1] == mesh_mod.MODEL_AXIS
    assert mesh_mod.MODEL_AXIS not in (dec.bv.sharding.spec or ())
    assert mesh_mod.MODEL_AXIS not in (dec.wuv.sharding.spec or ())
    for leaf in jax.tree.leaves(dec.cell):
        assert mesh_mod.MODEL_AXIS not in (leaf.sharding.spec or ())
    _one_step(t)
    t.close()


def test_track_sharding_placement(tmp_path):
    """Decoder param leaves must actually be sharded over the track axis."""
    cfg = exp_cfg(tmp_path, MeshConfig(use_mesh=True, track=2,
                                       style="gspmd"), name="place")
    t = Trainer(cfg)
    leaf = jax.tree.leaves(t.params.decoder)[0]
    spec = leaf.sharding.spec
    assert spec and spec[0] == mesh_mod.TRACK_AXIS, spec
    # training still runs
    _one_step(t)
    t.close()


def test_rbm_dp_training_runs_on_mesh(tmp_path):
    """RBM decoders (stochastic CD) under DP: full epoch runs, loss finite."""
    cfg = exp_cfg(tmp_path, MeshConfig(use_mesh=True, style="gspmd"),
                  name="rbm_dp", dec="rnn-rbm")
    t = Trainer(cfg)
    t.train()
    ev = t.evaluate("valid")
    assert np.isfinite(ev["loss"])
    t.close()


@pytest.mark.parametrize("mode", ["per-track", "feedback"])
def test_seqpipe_step_matches_single_device(tmp_path, mode):
    """Time-axis parallelism (SURVEY §2.2 SP row): dp=2 × seq=4 pipelined
    teacher forcing must equal the single-device step. The RNN carry crosses
    chunk boundaries via ppermute in a microbatch pipeline; the feedback
    mode additionally exercises the one-frame cross-track latent halo.
    NADE losses are key-independent, so params after one optimizer step are
    comparable to float-reduction tolerance."""
    cfg_single = exp_cfg(tmp_path, MeshConfig(use_mesh=False),
                         name=f"sp_s_{mode}", mode=mode)
    cfg_pipe = exp_cfg(tmp_path,
                       MeshConfig(use_mesh=True, data=2, seq=4,
                                  style="seqpipe"),
                       name=f"sp_m_{mode}", mode=mode)
    t_single = Trainer(cfg_single)
    t_pipe = Trainer(cfg_pipe)
    new_s, met_s = _one_step(t_single)
    new_p, met_p = _one_step(t_pipe)
    np.testing.assert_allclose(float(met_s["loss"]), float(met_p["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_s), jax.tree.leaves(new_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    t_single.close()
    t_pipe.close()


def test_seqpipe_rbm_training_runs(tmp_path):
    """RBM decoders under seqpipe: the CD Gibbs chains run per-chunk with
    per-shard folded RNG (streams differ from single-device by design);
    a full epoch must run with finite loss and the fused multi-step path."""
    cfg = exp_cfg(tmp_path,
                  MeshConfig(use_mesh=True, data=2, seq=4, style="seqpipe"),
                  name="sp_rbm", dec="rnn-rbm", mode="feedback")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, steps_per_call=2))
    t = Trainer(cfg)
    t.train()
    ev = t.evaluate("valid")
    assert np.isfinite(ev["loss"])
    t.close()


def test_seqpipe_microbatch_autopick():
    from multinn_tpu.parallel import seqpipe
    assert seqpipe.auto_microbatches(8, 4) == 8       # min(8, 2*4)
    assert seqpipe.auto_microbatches(6, 4) == 6
    assert seqpipe.auto_microbatches(7, 2) == 1       # 7 prime, target 4
    assert seqpipe.auto_microbatches(8, 2, requested=3) == 2  # cap, divisor
    assert seqpipe.auto_microbatches(1, 8) == 1


def test_invalid_mesh_configs(tmp_path):
    with pytest.raises(ValueError, match="not divisible"):
        exp_cfg(tmp_path, MeshConfig(use_mesh=True, track=2), n_tracks=3)
    with pytest.raises(ValueError, match="gspmd"):
        exp_cfg(tmp_path, MeshConfig(use_mesh=True, track=2,
                                     style="shard_map"))
    with pytest.raises(ValueError, match="joint"):
        exp_cfg(tmp_path, MeshConfig(use_mesh=True, track=2), mode="joint")
    # n_hidden=12 in exp_cfg: model=5 does not divide it
    with pytest.raises(ValueError, match="n_hidden"):
        exp_cfg(tmp_path, MeshConfig(use_mesh=True, model=5))
    with pytest.raises(ValueError, match="gspmd"):
        exp_cfg(tmp_path, MeshConfig(use_mesh=True, model=2,
                                     style="shard_map"))
    with pytest.raises(ValueError, match="seqpipe"):
        exp_cfg(tmp_path, MeshConfig(use_mesh=True, seq=2, style="gspmd"))


@pytest.mark.parametrize("style", ["gspmd", "shard_map", "seqpipe"])
def test_eval_matches_single_device_with_short_tail(tmp_path, style):
    """evaluate() must be exact under a mesh even when the split has a short
    tail batch and unequal per-shard real-frame counts: the shard_map path
    zero-mask-pads to the mesh width and psums frame-weighted sums (pmean of
    per-shard means would bias toward light shards). NADE losses/LL are
    key-independent, so mesh and single-device results must agree."""
    # synthetic_steps=36, window=8 -> 4 full + 1 masked tail window per song;
    # batch_size=8 over 9 valid windows leaves a 1-window tail batch.
    def mk(mesh, name):
        data = DataConfig.from_preset("synthetic", n_tracks=2, pitch_min=40,
                                      pitch_max=63, window=8, batch_size=8,
                                      synthetic_songs=10, synthetic_steps=36)
        model = MultINNConfig(n_tracks=2, n_pitches=24, mode="per-track",
                              decoder_type="rnn-nade", n_hidden=12, n_rnn=8,
                              gen_k=2)
        train = cfg_mod.TrainConfig(epochs=1, ckpt_every_steps=0,
                                    run_dir=str(tmp_path / name))
        return cfg_mod.ExperimentConfig(name=name, data=data, model=model,
                                        train=train, mesh=mesh).validate()

    t_single = Trainer(mk(MeshConfig(use_mesh=False), "ev_s"))
    mesh_cfg = (MeshConfig(use_mesh=True, data=2, seq=4, style="seqpipe")
                if style == "seqpipe"
                else MeshConfig(use_mesh=True, style=style))
    t_mesh = Trainer(mk(mesh_cfg, f"ev_{style}"))
    ev_s = t_single.evaluate("valid")
    ev_m = t_mesh.evaluate("valid")
    assert ev_s.keys() == ev_m.keys()
    assert "loss_per_track_0" in ev_s          # per-track health visible
    # linear-in-frames metrics are exact across sharding
    for name in ("loss", "ll_per_frame", "loss_per_track_0", "bce_recon"
                 if "bce_recon" in ev_s else "loss"):
        np.testing.assert_allclose(ev_s[name], ev_m[name], rtol=1e-4,
                                   err_msg=name)
    # ratio metrics (f1 etc.) are frame-weighted averages of per-shard
    # ratios under shard_map vs per-batch ratios single-device (micro vs
    # macro granularity) — close but not bit-equal by construction
    np.testing.assert_allclose(ev_s["f1"], ev_m["f1"], rtol=2e-2)
    t_single.close()
    t_mesh.close()


def test_mesh_sharded_generation_matches_single_device(tmp_path):
    """Generation batch-sharded over the data axis must equal single-device
    generation bit-for-bit (same keys, GSPMD is semantics-preserving)."""
    from multinn_tpu.training.generator import Generator
    cfg = exp_cfg(tmp_path, MeshConfig(use_mesh=False), name="gen_s")
    t = Trainer(cfg)
    seed = t.dataset.seed_windows("valid", n=8)

    gen_single = Generator(cfg, t.params)
    r1 = gen_single.generate(jax.random.PRNGKey(5), n_steps=6, seed=seed)

    mesh = mesh_mod.make_mesh(MeshConfig(use_mesh=True))
    gen_mesh = Generator(cfg, t.params, mesh=mesh)
    r2 = gen_mesh.generate(jax.random.PRNGKey(5), n_steps=6, seed=seed)
    np.testing.assert_array_equal(r1, r2)
    t.close()


def test_unseeded_mesh_generation_matches_single_device(tmp_path):
    """UNSEEDED generate(batch=16) on a data mesh must (a) really shard the
    program over ``data`` — the state is built inside jit from replicated
    params, so the Generator constrains its batch axis explicitly
    (VERDICT r2 weak #4) — and (b) match single-device bit-for-bit
    (partitionable threefry)."""
    from multinn_tpu.training.generator import Generator
    cfg = exp_cfg(tmp_path, MeshConfig(use_mesh=False), name="gen_us")
    t = Trainer(cfg)
    r1 = Generator(cfg, t.params).generate(jax.random.PRNGKey(7),
                                           n_steps=6, batch=16)

    mesh = mesh_mod.make_mesh(MeshConfig(use_mesh=True))
    gen_mesh = Generator(cfg, t.params, mesh=mesh)
    key = jax.random.PRNGKey(7)
    roll_dev = gen_mesh._generate_impl(key, None, 6, 16)
    spec_axes = [ax for entry in tuple(roll_dev.sharding.spec)
                 for ax in ((entry,) if isinstance(entry, str)
                            else (entry or ()))]
    assert mesh_mod.DATA_AXIS in spec_axes, roll_dev.sharding
    r2 = np.asarray(jax.device_get(roll_dev)).astype(np.uint8)
    np.testing.assert_array_equal(r1, r2)
    # unshardable batch (not a multiple of the data axis) stays correct
    r3 = gen_mesh.generate(jax.random.PRNGKey(7), n_steps=6, batch=3)
    assert r3.shape == (3, 6, cfg.model.n_tracks, cfg.model.n_pitches)
    t.close()


def test_partitionable_ctx_manual_mode():
    """GSPMD programs force the XLA samplers (Mosaic custom calls cannot be
    SPMD-partitioned); manual-mode (shard_map) step bodies keep the Pallas
    kernels — per-shard custom calls are legal (ADVICE r2 #3)."""
    from multinn_tpu.ops import sampling
    mesh = mesh_mod.make_mesh(MeshConfig(use_mesh=True))
    with sampling.partitionable_ctx(mesh):
        assert sampling.forced_impl() == "xla"
    with sampling.partitionable_ctx(mesh, manual=True):
        assert sampling.forced_impl() is None
    with sampling.partitionable_ctx(None):
        assert sampling.forced_impl() is None


@pytest.mark.parametrize("mode", ["feedback", "per-track"])
def test_track_sharded_generation_matches_single_device(tmp_path, mode):
    """Generation with the per-track expert modules sharded over the track
    axis (dp=4 x track=2) must equal single-device generation bit-for-bit.
    In feedback mode the cross-track context assembly inside the sampling
    scan is the per-step latent all-gather the partitioner inserts [B:10]
    — the SURVEY §2.2 EP obligation for generation."""
    from multinn_tpu.training.generator import Generator
    cfg = exp_cfg(tmp_path, MeshConfig(use_mesh=False),
                  name=f"tsg_{mode}", mode=mode)
    t = Trainer(cfg)
    seed = t.dataset.seed_windows("valid", n=8)

    gen_single = Generator(cfg, t.params)
    r1 = gen_single.generate(jax.random.PRNGKey(5), n_steps=6, seed=seed)

    mesh_cfg = MeshConfig(use_mesh=True, track=2, style="gspmd")
    cfg_mesh = exp_cfg(tmp_path, mesh_cfg, name=f"tsg_m_{mode}", mode=mode)
    mesh = mesh_mod.make_mesh(mesh_cfg)
    gen_mesh = Generator(cfg_mesh, t.params, mesh=mesh)
    assert gen_mesh.track_sharded
    # params really live sharded over the track axis
    leaf = jax.tree.leaves(gen_mesh.params.decoder)[0]
    assert leaf.sharding.spec and leaf.sharding.spec[0] == mesh_mod.TRACK_AXIS
    r2 = gen_mesh.generate(jax.random.PRNGKey(5), n_steps=6, seed=seed)
    np.testing.assert_array_equal(r1, r2)
    t.close()


def test_checkpoint_roundtrip_across_topologies(tmp_path):
    """One artifact, any topology: a checkpoint written by a 3D-mesh
    (dp×track×model) trainer must restore bit-exactly both into another
    mesh trainer AND into a single-device trainer (orbax reshards on
    restore against the consumer's param placement) — the SURVEY §5.4
    'one artifact, three consumers' contract extended to sharded params."""
    mesh3d = MeshConfig(use_mesh=True, data=2, track=2, model=2,
                        style="gspmd")
    cfg = exp_cfg(tmp_path, mesh3d, name="ckpt3d", mode="feedback")
    t = Trainer(cfg)
    t.train()
    t.ckpt.wait()
    p_trained = jax.device_get(t.params)
    t.close()

    t2 = Trainer(cfg)
    assert t2.maybe_resume()
    for a, b in zip(jax.tree.leaves(p_trained),
                    jax.tree.leaves(jax.device_get(t2.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    t2.close()

    cfg_single = dataclasses.replace(cfg, mesh=MeshConfig(use_mesh=False))
    t3 = Trainer(cfg_single)
    assert t3.maybe_resume()
    for a, b in zip(jax.tree.leaves(p_trained),
                    jax.tree.leaves(jax.device_get(t3.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(t3.evaluate("valid")["loss"])
    t3.close()


def test_3d_mesh_generation_matches_single_device(tmp_path):
    """Generation with experts on the track axis AND the hidden dim
    tensor-sharded over model (dp=2 × track=2 × model=2) must equal
    single-device generation bit-for-bit (GSPMD is semantics-preserving;
    partitionable threefry keeps the Bernoulli streams identical on the
    H-sharded conditional shapes)."""
    from multinn_tpu.training.generator import Generator
    cfg = exp_cfg(tmp_path, MeshConfig(use_mesh=False), name="g3d_s",
                  mode="feedback")
    t = Trainer(cfg)
    seed = t.dataset.seed_windows("valid", n=8)
    r1 = Generator(cfg, t.params).generate(jax.random.PRNGKey(5),
                                           n_steps=6, seed=seed)

    mesh_cfg = MeshConfig(use_mesh=True, track=2, model=2, style="gspmd")
    cfg_m = exp_cfg(tmp_path, mesh_cfg, name="g3d_m", mode="feedback")
    mesh = mesh_mod.make_mesh(mesh_cfg)
    gen = Generator(cfg_m, t.params, mesh=mesh)
    leaf = gen.params.decoder.w
    assert leaf.sharding.spec[-1] == mesh_mod.MODEL_AXIS
    r2 = gen.generate(jax.random.PRNGKey(5), n_steps=6, seed=seed)
    np.testing.assert_array_equal(r1, r2)
    t.close()


def test_seqpipe_multilayer_remat_matches_single_device(tmp_path):
    """seqpipe composed with the other §5.7 levers: 2-layer stacked LSTM
    (the carry handoff moves ALL layers' states across chunk boundaries)
    and remat (checkpointed chunk scans inside the pipeline)."""
    def mk(mesh, name):
        cfg = exp_cfg(tmp_path, mesh, name=name, mode="feedback")
        model = dataclasses.replace(cfg.model, rnn_layers=2, remat=True)
        return dataclasses.replace(cfg, model=model).validate()

    t_single = Trainer(mk(MeshConfig(use_mesh=False), "spml_s"))
    t_pipe = Trainer(mk(MeshConfig(use_mesh=True, data=2, seq=4,
                                   style="seqpipe"), "spml_m"))
    new_s, met_s = _one_step(t_single)
    new_p, met_p = _one_step(t_pipe)
    np.testing.assert_allclose(float(met_s["loss"]), float(met_p["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_s), jax.tree.leaves(new_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    t_single.close()
    t_pipe.close()


def test_hf_gspmd_step_matches_single_device(tmp_path):
    """Hessian-free macro-step under a GSPMD data mesh (the mesh style the
    Trainer admits for optimizer='hf'): the whole CG solve is one
    global-view program, so loss/params must match single-device to float
    tolerance (the NADE objective is key-independent and the CG is
    deterministic — differences come only from reduction orders)."""
    def mk(mesh, name):
        cfg = exp_cfg(tmp_path, mesh, name=name)
        import dataclasses
        return dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, optimizer="hf",
                                           hf_cg_iters=8))
    t_single = Trainer(mk(MeshConfig(use_mesh=False), "hf_s"))
    t_mesh = Trainer(mk(MeshConfig(use_mesh=True, style="gspmd"), "hf_m"))
    new_s, met_s = _one_step(t_single)
    new_m, met_m = _one_step(t_mesh)
    np.testing.assert_allclose(float(met_s["loss"]), float(met_m["loss"]),
                               rtol=1e-5)
    assert float(met_s["hf_accepted"]) == float(met_m["hf_accepted"])
    for a, b in zip(jax.tree.leaves(new_s), jax.tree.leaves(new_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
    t_single.close()
    t_mesh.close()


@pytest.mark.parametrize("style,mesh_kw", [("shard_map", {}),
                                           ("seqpipe", {"seq": 4})])
def test_hf_explicit_style_matches_single_device(tmp_path, style, mesh_kw):
    """HF under the EXPLICIT-collective styles (r3 weak #4): hf_step's
    pmean'd loss/grad/GGN-matvecs keep the CG state replicated, so the
    macro-step solves ONE global system — params must match single-device
    to float tolerance on balanced shards (the NADE objective is
    key-independent and HF does no sampling, so the per-shard RNG fold
    cannot diverge the comparison; differences are reduction order only).
    seqpipe additionally routes the GGN jvp/vjp through the ppermute carry
    handoffs (linear collectives — jvp is ppermute, transpose reverses)."""
    def mk(mesh, name):
        cfg = exp_cfg(tmp_path, mesh, name=name)
        return dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, optimizer="hf",
                                           hf_cg_iters=8))
    t_single = Trainer(mk(MeshConfig(use_mesh=False), f"hf_s_{style}"))
    t_mesh = Trainer(mk(MeshConfig(use_mesh=True, style=style, **mesh_kw),
                        f"hf_m_{style}"))
    new_s, met_s = _one_step(t_single)
    new_m, met_m = _one_step(t_mesh)
    np.testing.assert_allclose(float(met_s["loss"]), float(met_m["loss"]),
                               rtol=1e-5)
    assert float(met_s["hf_accepted"]) == float(met_m["hf_accepted"])
    for a, b in zip(jax.tree.leaves(new_s), jax.tree.leaves(new_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
    t_single.close()
    t_mesh.close()


def test_init_distributed_arg_plumbing(monkeypatch):
    """§5.8 multi-host bring-up: the wrapper forwards explicit coordinator
    args verbatim and passes NOTHING on the auto-detect path (VERDICT r3
    weak #6 — a typo here would ship silently; real multi-host cannot run
    in this environment, so the call contract is what we can pin)."""
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    mesh_mod.init_distributed()
    mesh_mod.init_distributed(coordinator="10.0.0.1:8476",
                              num_processes=4, process_id=2)
    assert calls[0] == {}
    assert calls[1] == {"coordinator_address": "10.0.0.1:8476",
                        "num_processes": 4, "process_id": 2}


def test_init_distributed_single_process_smoke():
    """The degenerate 1-process path actually initializes: a fresh
    subprocess (jax.distributed.initialize is once-per-process) brings up
    the coordinator on localhost and reports process_count()==1."""
    import subprocess
    import sys
    prog = (
        "import multinn_tpu  # noqa: F401  (sys.path bootstrap)\n"
        "import jax\n"
        "from multinn_tpu.parallel.mesh import init_distributed\n"
        "init_distributed(coordinator='localhost:18476',\n"
        "                 num_processes=1, process_id=0)\n"
        "assert jax.process_count() == 1\n"
        "assert jax.process_index() == 0\n"
        "print('DIST_OK')\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", prog], capture_output=True,
                       text=True, timeout=240, env=env,
                       cwd=os.path.dirname(os.path.dirname(__file__)))
    assert "DIST_OK" in r.stdout, r.stderr[-2000:]


def test_dbn_masked_optimizer_gspmd_matches_single_device(tmp_path):
    """DBN configs use an optax.masked optimizer (the frozen encoder is
    excluded from updates — r4): the masked state must place correctly on a
    GSPMD dp x track mesh and the step must equal single-device, with the
    encoder bit-unchanged on both."""
    def dbn_cfg(mesh, name):
        cfg = exp_cfg(tmp_path, mesh, name=name, mode="feedback")
        return dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, encoder_hidden=(6,)),
            train=dataclasses.replace(cfg.train, weight_decay=0.01))
    t_single = Trainer(dbn_cfg(MeshConfig(use_mesh=False), "dbn_s"))
    t_mesh = Trainer(dbn_cfg(
        MeshConfig(use_mesh=True, track=2, style="gspmd"), "dbn_m"))
    enc0 = [np.asarray(a).copy()
            for a in jax.tree.leaves(jax.device_get(t_single.params.encoder))]
    new_s, met_s = _one_step(t_single)
    new_m, met_m = _one_step(t_mesh)
    np.testing.assert_allclose(float(met_s["loss"]), float(met_m["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_s), jax.tree.leaves(new_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    for a, b in zip(enc0, jax.tree.leaves(new_s.encoder)):
        np.testing.assert_array_equal(a, np.asarray(b))
    t_single.close()
    t_mesh.close()


def test_mesh_style_validated():
    """A typo'd mesh.style must raise, not silently select the explicit
    shard_map path (round-4 review)."""
    with pytest.raises(ValueError, match="unknown mesh.style"):
        MeshConfig(use_mesh=True, style="spmd")
    with pytest.raises(ValueError, match="unknown mesh.style"):
        MeshConfig(style="GSPMD")


def test_sampler_ctx_global_view_forces_xla(tmp_path):
    """Global-view jits traced under an EXPLICIT style (encoder pretraining,
    image-summary generation) must force the partitionable XLA samplers:
    they span the mesh like GSPMD programs, where a Mosaic custom call
    cannot be partitioned (round-4 review)."""
    from multinn_tpu.ops import sampling
    cfg = exp_cfg(tmp_path, MeshConfig(use_mesh=True, style="shard_map"),
                  name="samplerctx")
    t = Trainer(cfg)
    with t._sampler_ctx():                      # step bodies: per-shard
        assert sampling.forced_impl() is None
    with t._sampler_ctx(manual=False):          # global-view programs
        assert sampling.forced_impl() == "xla"
    t.close()


def test_profile_steps_does_not_perturb_training_state(tmp_path):
    """profile_steps traces on COPIES: params, opt_state and the step
    counter are bit-identical before/after (an earlier version advanced the
    optimizer n+1 updates on one repeated batch, desynchronizing the LR
    schedule from self.step — round-4 review)."""
    cfg = exp_cfg(tmp_path, MeshConfig(use_mesh=False), name="profsteps")
    t = Trainer(cfg)
    p_before = jax.tree.map(lambda x: np.asarray(x).copy(), t.params)
    o_before = jax.tree.map(lambda x: np.asarray(x).copy(), t.opt_state)
    t.profile_steps(2)
    assert t.step == 0
    for a, b in zip(jax.tree.leaves(p_before), jax.tree.leaves(t.params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    for a, b in zip(jax.tree.leaves(o_before),
                    jax.tree.leaves(t.opt_state)):
        np.testing.assert_array_equal(a, np.asarray(b))
    t.close()


def test_sgd_weight_decay_applies():
    """optimizer=sgd with weight_decay must actually shrink weights
    (an earlier version silently dropped the knob — round-4 review)."""
    from multinn_tpu.training.trainer import make_optimizer
    import optax
    tc = cfg_mod.TrainConfig(optimizer="sgd", weight_decay=0.1,
                             grad_clip=0.0, lr=1.0)
    tc0 = dataclasses.replace(tc, weight_decay=0.0)
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.zeros((3,))}
    for cfg_i, expect_move in ((tc, True), (tc0, False)):
        opt = make_optimizer(cfg_i)
        state = opt.init(params)
        updates, _ = opt.update(grads, state, params)
        moved = bool(np.any(np.asarray(updates["w"]) != 0))
        assert moved == expect_move, cfg_i.weight_decay
