"""Mixed-precision matmul policy (ops/precision.py).

Pins: (a) policy OFF is the default and exactly preserves f32 math;
(b) the bf16 policy computes what it documents (bf16 feeds, f32
accumulation, forward and backward); (c) a full train step under the
policy stays finite and its gradients track the f32 gradients; (d) the
config knob reaches the trainer's step body.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinn_tpu.models import multinn
from multinn_tpu.ops import precision


def test_policy_off_is_exact_f32():
    a = jax.random.normal(jax.random.PRNGKey(0), (4, 7))
    b = jax.random.normal(jax.random.PRNGKey(1), (7, 3))
    np.testing.assert_array_equal(np.asarray(precision.mm(a, b)),
                                  np.asarray(jnp.matmul(a, b)))
    assert precision.matmul_dtype() is None


def test_bf16_forward_matches_cast_matmul():
    a = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 7))
    b = jax.random.normal(jax.random.PRNGKey(1), (7, 3))
    with precision.matmul_precision("bf16"):
        out = precision.mm(a, b)
    ref = jnp.matmul(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    assert out.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_bf16_backward_feeds_bf16():
    """The custom_vjp must reproduce d/da = g16 @ b16ᵀ and
    d/db = Σ_batch a16ᵀ @ g16 (bf16 feeds, f32 accumulation) — the property
    that makes the backward 2/3 of training FLOPs see the policy."""
    a = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 7))
    b = jax.random.normal(jax.random.PRNGKey(1), (7, 3))
    g = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 3))

    with precision.matmul_precision("bf16"):
        _, vjp = jax.vjp(precision.mm, a, b)
        da, db = vjp(g)
    a16, b16, g16 = (x.astype(jnp.bfloat16) for x in (a, b, g))
    da_ref = jnp.matmul(g16, b16.T, preferred_element_type=jnp.float32)
    db_ref = jnp.matmul(a16.reshape(-1, 7).T, g16.reshape(-1, 3),
                        preferred_element_type=jnp.float32)
    assert da.dtype == db.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(da), np.asarray(da_ref))
    np.testing.assert_array_equal(np.asarray(db), np.asarray(db_ref))


def test_bad_policy_name_rejected():
    with pytest.raises(ValueError, match="matmul precision"):
        with precision.matmul_precision("fp8"):
            pass
    with pytest.raises(ValueError, match="matmul_dtype"):
        multinn.MultINNConfig(n_tracks=2, n_pitches=8, matmul_dtype="fp8")


@pytest.mark.parametrize("dec", [
    pytest.param("rnn-rbm", marks=pytest.mark.slow), "rnn-nade"])
def test_bf16_train_grads_track_f32(dec):
    """Model-level: loss gradients under the bf16 policy stay finite and
    close to the f32 gradients (bf16 carries ~3 decimal digits; a wiring
    bug — wrong operand, dropped accumulation — would produce O(1)
    relative errors)."""
    cfg = multinn.MultINNConfig(n_tracks=3, n_pitches=12, mode="feedback",
                                decoder_type=dec, n_hidden=16, n_rnn=8,
                                cd_k=1, w_std=0.3)
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.bernoulli(jax.random.PRNGKey(1), 0.3,
                             (4, 6, 3, 12)).astype(jnp.float32)
    key = jax.random.PRNGKey(2)

    def loss_fn(p):
        return multinn.loss(p, key, x, detailed=False)[0]

    l32, g32 = jax.value_and_grad(loss_fn)(params)
    with precision.matmul_precision("bf16"):
        l16, g16 = jax.value_and_grad(loss_fn)(params)

    assert np.isfinite(float(l16))
    assert abs(float(l16) - float(l32)) < 0.05 * (abs(float(l32)) + 1.0)
    flat32 = jnp.concatenate([jnp.ravel(t) for t in jax.tree.leaves(g32)
                              if isinstance(t, jax.Array)])
    flat16 = jnp.concatenate([jnp.ravel(t) for t in jax.tree.leaves(g16)
                              if isinstance(t, jax.Array)])
    assert bool(jnp.all(jnp.isfinite(flat16)))
    # cosine similarity of the full gradient (direction is what training
    # uses; RBM losses are stochastic but both traces consume the SAME key
    # so the Gibbs chains see near-identical probabilities)
    cos = jnp.dot(flat32, flat16) / (
        jnp.linalg.norm(flat32) * jnp.linalg.norm(flat16) + 1e-12)
    assert float(cos) > 0.99


@pytest.mark.slow
def test_trainer_wires_matmul_dtype(tmp_path):
    """The config knob must reach the jitted step body (trainer enters the
    precision context inside step_fn) and training must stay finite and
    learn under it."""
    from multinn_tpu.data.datasets import DataConfig
    from multinn_tpu.training.trainer import Trainer
    from multinn_tpu.utils import config as cfg_mod
    data = DataConfig.from_preset("synthetic", n_tracks=2, pitch_min=40,
                                  pitch_max=63, window=16, batch_size=4,
                                  synthetic_songs=8, synthetic_steps=64)
    model = multinn.MultINNConfig(n_tracks=2, n_pitches=24, mode="per-track",
                                  decoder_type="rnn-nade", n_hidden=16,
                                  n_rnn=12, matmul_dtype="bf16")
    train = cfg_mod.TrainConfig(epochs=2, lr=3e-3, ckpt_every_steps=0,
                                run_dir=str(tmp_path / "bf16run"))
    cfg = cfg_mod.ExperimentConfig(name="bf16", data=data, model=model,
                                   train=train).validate()
    tr = Trainer(cfg)
    ev0 = tr.evaluate("valid")
    tr.train()
    ev1 = tr.evaluate("valid")
    tr.close()
    assert np.isfinite(ev1["loss"])
    assert ev1["loss"] < ev0["loss"]
