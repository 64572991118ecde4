"""Track-conditional ("accompaniment") generation —
multinn.generate_accompaniment / Generator.accompany: fix some tracks to a
given pianoroll, sample the rest. Pins:

  * given tracks pass through BIT-EXACTLY (pass-through and DBN encoders),
  * conditioning binds in the feedback architecture (different given music
    changes the sampled tracks) and does NOT in per-track (independent
    decoders — same key, same samples regardless of the given content),
  * the decoder refactor (sample_step = sample_frame + forced_step) is
    bit-identical to the previous fused body,
  * temperature tempers only the sampled tracks,
  * joint mode / bad track sets raise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinn_tpu.models import multinn
from multinn_tpu.models.base import get_decoder
from multinn_tpu.models.multinn import MultINNConfig

K, D, H, U = 3, 10, 8, 6


def cfg_for(decoder="rnn-nade", mode="feedback", **kw):
    base = dict(n_tracks=K, n_pitches=D, mode=mode, decoder_type=decoder,
                n_hidden=H, n_rnn=U, cd_k=1, gen_k=3, w_std=0.2)
    base.update(kw)
    return MultINNConfig(**base)


def given_roll(b=2, t=12, key=0, density=0.3):
    rng = np.random.default_rng(key)
    return (rng.random((b, t, K, D)) < density).astype(np.float32)


@pytest.mark.parametrize("decoder,mode", [("rnn-rbm", "feedback"),
                                          ("rnn-nade", "feedback"),
                                          ("rnn-nade", "per-track")])
def test_given_tracks_pass_through_bit_exact(decoder, mode):
    params = multinn.init(jax.random.PRNGKey(0), cfg_for(decoder, mode))
    g = given_roll()
    st = multinn.init_state(params, g.shape[0])
    _, roll = multinn.generate_accompaniment(params, jax.random.PRNGKey(1),
                                             st, jnp.asarray(g), (0, 2))
    roll = np.asarray(roll)
    assert roll.shape == g.shape
    np.testing.assert_array_equal(roll[:, :, 0], g[:, :, 0])
    np.testing.assert_array_equal(roll[:, :, 2], g[:, :, 2])
    assert set(np.unique(roll)) <= {0.0, 1.0}


def test_given_tracks_pass_through_bit_exact_dbn():
    cfg = cfg_for("rnn-rbm", "feedback", encoder_hidden=(6,))
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    g = given_roll()
    st = multinn.init_state(params, g.shape[0])
    _, roll = multinn.generate_accompaniment(params, jax.random.PRNGKey(1),
                                             st, jnp.asarray(g), (1,))
    roll = np.asarray(roll)
    np.testing.assert_array_equal(roll[:, :, 1], g[:, :, 1])
    assert set(np.unique(roll)) <= {0.0, 1.0}


def test_feedback_conditions_on_given_music_per_track_does_not():
    """Same key, two different given rolls: in feedback mode the sampled
    tracks must react (cross-track context carries the given latents); in
    per-track mode the decoders are independent so the sampled tracks are
    IDENTICAL."""
    g_a = given_roll(b=2, t=16, key=1, density=0.6)
    g_b = np.zeros_like(g_a)
    key = jax.random.PRNGKey(3)

    def sampled(mode, g):
        params = multinn.init(jax.random.PRNGKey(0), cfg_for("rnn-nade",
                                                             mode))
        st = multinn.init_state(params, g.shape[0])
        _, roll = multinn.generate_accompaniment(params, key, st,
                                                 jnp.asarray(g), (0,))
        return np.asarray(roll)[:, :, 1:]        # the sampled tracks

    assert not np.array_equal(sampled("feedback", g_a),
                              sampled("feedback", g_b))
    np.testing.assert_array_equal(sampled("per-track", g_a),
                                  sampled("per-track", g_b))


@pytest.mark.parametrize("decoder", ["rnn-rbm", "rnn-nade"])
def test_sample_step_refactor_bit_exact(decoder):
    """sample_step must equal sample_frame + forced_step exactly (the
    accompaniment path relies on this decomposition)."""
    dec = get_decoder(decoder)
    cfg = cfg_for(decoder, "per-track").decoder_config()
    params = dec.init(jax.random.PRNGKey(0), cfg)
    st = dec.init_state(params, (2,))
    key = jax.random.PRNGKey(5)
    st1, v1 = dec.sample_step(params, key, st)
    v2 = dec.sample_frame(params, key, st)
    st2 = dec.forced_step(params, st, v2)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), st1, st2))


@pytest.mark.parametrize("decoder", [
    pytest.param("rnn-rbm", marks=pytest.mark.slow), "rnn-nade"])
def test_subset_sampling_bit_exact_with_masked_full_sampling(decoder):
    """generate_accompaniment runs sample_frame ONLY for the sampled
    complement (the expensive per-step work — gen_k Gibbs sweeps / the NADE
    ancestral sweep); it must be bit-exact with the reference formulation
    that samples ALL K tracks and mask-merges (per-track keys are
    tkeys[track] in both; given_tracks is static)."""
    cfg = cfg_for(decoder, "feedback")
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    g = given_roll(b=2, t=10)
    st0 = multinn.init_state(params, 2)
    key = jax.random.PRNGKey(7)
    _, roll = multinn.generate_accompaniment(params, key, st0,
                                             jnp.asarray(g), (0, 2))

    dec = get_decoder(decoder)
    mask = jnp.zeros((K, 1, 1)).at[jnp.asarray((0, 2)), 0, 0].set(1.0)
    feats_g = multinn._encode_tracks(params, jnp.asarray(g))
    feats_tm = jnp.moveaxis(feats_g, 2, 0)                   # (T, K, B, F)
    keys = jax.random.split(key, g.shape[1])
    st, ctx = st0.decoder, st0.ctx
    outs = []
    for t in range(g.shape[1]):
        key1, _kd = jax.random.split(keys[t])
        tkeys = jax.random.split(key1, K)
        vs = jax.vmap(lambda p, kx, s: dec.sample_frame(p, kx, s, k=None))(
            params.decoder, tkeys, st)                       # ALL K tracks
        v_final = mask * feats_tm[t] + (1.0 - mask) * vs
        st = jax.vmap(lambda p, s, v: dec.forced_step(p, s, v, ctx))(
            params.decoder, st, v_final)
        ctx = multinn._flatten_latents(v_final)
        outs.append(v_final)
    ref = jnp.transpose(jnp.stack(outs), (2, 0, 1, 3))       # (B, T, K, D)
    np.testing.assert_array_equal(np.asarray(roll), np.asarray(ref))

    # the in-repo subset=False path (the track-sharded mesh formulation —
    # uniform all-K vmap + mask-merge) must ALSO be bit-exact
    _, roll_full = multinn.generate_accompaniment(
        params, key, st0, jnp.asarray(g), (0, 2), subset=False)
    np.testing.assert_array_equal(np.asarray(roll_full), np.asarray(ref))


def test_accompaniment_temperature_only_tempers_sampled_tracks():
    params = multinn.init(jax.random.PRNGKey(0), cfg_for("rnn-nade"))
    params = params.replace(decoder=params.decoder.replace(
        bv=params.decoder.bv - 1.5))
    g = given_roll(b=4, t=24, density=0.25)
    st = multinn.init_state(params, g.shape[0])
    _, hot = multinn.generate_accompaniment(params, jax.random.PRNGKey(1),
                                            st, jnp.asarray(g), (0,),
                                            temperature=100.0)
    hot = np.asarray(hot)
    np.testing.assert_array_equal(hot[:, :, 0], g[:, :, 0])   # untempered
    assert 0.4 < hot[:, :, 1:].mean() < 0.6                   # flattened


def test_accompaniment_validation():
    params = multinn.init(jax.random.PRNGKey(0), cfg_for("rnn-nade"))
    g = jnp.asarray(given_roll())
    st = multinn.init_state(params, 2)
    with pytest.raises(ValueError):
        multinn.generate_accompaniment(params, jax.random.PRNGKey(1), st,
                                       g, ())                  # empty
    with pytest.raises(ValueError):
        multinn.generate_accompaniment(params, jax.random.PRNGKey(1), st,
                                       g, (0, 1, 2))           # all given
    with pytest.raises(ValueError):
        multinn.generate_accompaniment(params, jax.random.PRNGKey(1), st,
                                       g, (7,))                # out of range
    pj = multinn.init(jax.random.PRNGKey(0), cfg_for("rnn-nade", "joint"))
    stj = multinn.init_state(pj, 2)
    with pytest.raises(ValueError):
        multinn.generate_accompaniment(pj, jax.random.PRNGKey(1), stj,
                                       g, (0,))                # joint


def test_generator_accompany_end_to_end():
    from multinn_tpu.training.generator import Generator
    from multinn_tpu.utils.config import ExperimentConfig
    from multinn_tpu.data.datasets import DataConfig

    model = cfg_for("rnn-rbm", "feedback")
    data = DataConfig(n_tracks=K, pitch_min=21, pitch_max=21 + D - 1,
                      window=8, batch_size=4)
    params = multinn.init(jax.random.PRNGKey(0), model)
    cfg = ExperimentConfig(name="acc", data=data, model=model)
    gen = Generator(cfg, params)
    g = given_roll(b=2, t=10)
    seed = given_roll(b=2, t=4, key=9)
    out = gen.accompany(jax.random.PRNGKey(0), g, (1,), seed=seed)
    assert out.dtype == np.uint8 and out.shape == g.shape
    np.testing.assert_array_equal(out[:, :, 1], g[:, :, 1].astype(np.uint8))
    with pytest.raises(ValueError):
        gen.accompany(jax.random.PRNGKey(0), g, (1,),
                      seed=given_roll(b=3, t=4))


@pytest.mark.slow
def test_accompany_on_mesh_matches_single_device():
    """Accompaniment batch-sharded over the data axis must equal
    single-device accompaniment bit-for-bit (scan path is GSPMD-shardable;
    same keys, partitionable threefry)."""
    from multinn_tpu.parallel import mesh as mesh_mod
    from multinn_tpu.parallel.mesh import MeshConfig
    from multinn_tpu.training.generator import Generator
    from multinn_tpu.utils.config import ExperimentConfig
    from multinn_tpu.data.datasets import DataConfig

    model = cfg_for("rnn-rbm", "feedback")
    data = DataConfig(n_tracks=K, pitch_min=21, pitch_max=21 + D - 1,
                      window=8, batch_size=4)
    params = multinn.init(jax.random.PRNGKey(0), model)
    cfg = ExperimentConfig(name="accm", data=data, model=model)
    g = given_roll(b=8, t=10)
    seed = given_roll(b=8, t=4, key=9)

    r1 = Generator(cfg, params).accompany(jax.random.PRNGKey(0), g, (0,),
                                          seed=seed)
    mesh = mesh_mod.make_mesh(MeshConfig(use_mesh=True))
    gen_mesh = Generator(cfg, params, mesh=mesh)
    r2 = gen_mesh.accompany(jax.random.PRNGKey(0), g, (0,), seed=seed)
    np.testing.assert_array_equal(r1, r2)
    # unshardable batch (not a multiple of the data axis) stays correct
    r3 = gen_mesh.accompany(jax.random.PRNGKey(1), given_roll(b=3, t=6),
                            (0,))
    assert r3.shape == (3, 6, K, D)


@pytest.mark.slow
def test_accompany_track_sharded_matches_single_device():
    """Accompaniment with the per-track expert modules sharded over the
    track axis must equal single-device accompaniment bit-for-bit. The
    Generator passes subset=False there: the uniform all-K sample sweep
    keeps the decoder state's K axis uniformly sharded, where the
    single-chip subset gather would insert per-step cross-shard
    collectives over a K_samp stack that need not partition over the
    track axis (generate_accompaniment docstring)."""
    from multinn_tpu.parallel import mesh as mesh_mod
    from multinn_tpu.parallel.mesh import MeshConfig
    from multinn_tpu.training.generator import Generator
    from multinn_tpu.utils.config import ExperimentConfig
    from multinn_tpu.data.datasets import DataConfig

    k4 = 4                          # n_tracks must divide the track axis
    model = cfg_for("rnn-rbm", "feedback", n_tracks=k4)
    data = DataConfig(n_tracks=k4, pitch_min=21, pitch_max=21 + D - 1,
                      window=8, batch_size=4)
    params = multinn.init(jax.random.PRNGKey(0), model)
    mesh_cfg = MeshConfig(use_mesh=True, track=2, style="gspmd")
    cfg = ExperimentConfig(name="accts", data=data, model=model)
    cfg_mesh = ExperimentConfig(name="accts_m", data=data, model=model,
                                mesh=mesh_cfg)
    rng = np.random.default_rng(3)
    g = (rng.random((8, 10, k4, D)) < 0.3).astype(np.float32)
    seed = (rng.random((8, 4, k4, D)) < 0.3).astype(np.float32)

    r1 = Generator(cfg, params).accompany(jax.random.PRNGKey(0), g, (0, 2),
                                          seed=seed)
    mesh = mesh_mod.make_mesh(mesh_cfg)
    gen_mesh = Generator(cfg_mesh, params, mesh=mesh)
    assert gen_mesh.track_sharded
    r2 = gen_mesh.accompany(jax.random.PRNGKey(0), g, (0, 2), seed=seed)
    np.testing.assert_array_equal(r1, r2)
