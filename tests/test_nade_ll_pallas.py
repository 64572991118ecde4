"""Grid-free NADE likelihood kernel (ops/nade_ll_pallas.py) vs the XLA
exclusive-cumsum forms — value AND gradient parity in interpret mode
(SURVEY §4.5 kernel-vs-fallback contract)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinn_tpu.nn import nade as nade_nn
from multinn_tpu.ops import nade_ll_pallas

jax.config.update("jax_enable_x64", False)


def _mk(key, d=11, h=9, n=37, batched_biases=True):
    ks = jax.random.split(key, 5)
    p = nade_nn.init(ks[0], d, h, w_std=0.3)
    x = jax.random.bernoulli(ks[1], 0.4, (n, d)).astype(jnp.float32)
    if batched_biases:
        bv = 0.3 * jax.random.normal(ks[2], (n, d))
        bh = 0.3 * jax.random.normal(ks[3], (n, h))
    else:
        bv, bh = p.bv + 0.1, p.bh - 0.1
    return p, x, bv, bh


def _ref_logits(x, w, v, bv, bh, form):
    return nade_nn.conditionals_logits(x, w, v, bv, bh, form=form)


_kernel_logits = functools.partial(nade_ll_pallas.nade_logits,
                                   interpret=True)


@pytest.mark.parametrize("form", ["cumsum", "tri"])
@pytest.mark.parametrize("batched_biases", [True, False])
def test_logits_match_xla_forms(form, batched_biases):
    p, x, bv, bh = _mk(jax.random.PRNGKey(0), batched_biases=batched_biases)
    ref = _ref_logits(x, p.w, p.v, bv, bh, form)
    got = _kernel_logits(x, p.w, p.v, bv, bh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_logits_multi_leading_dims_and_padding():
    # (T, B, D) leading dims with N=T*B far from a lane multiple
    p, _, _, _ = _mk(jax.random.PRNGKey(1), d=7, h=5)
    t, b = 5, 3
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.bernoulli(ks[0], 0.5, (t, b, 7)).astype(jnp.float32)
    bv = jax.random.normal(ks[1], (t, b, 7))
    bh = jax.random.normal(ks[2], (t, b, 5))
    ref = _ref_logits(x, p.w, p.v, bv, bh, "cumsum")
    got = _kernel_logits(x, p.w, p.v, bv, bh)
    assert got.shape == (t, b, 7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _bce_loss(logits_fn, x, w, v, bv, bh):
    logits = logits_fn(x, w, v, bv, bh)
    ll = (x * jax.nn.log_sigmoid(logits)
          + (1 - x) * jax.nn.log_sigmoid(-logits))
    # weighted sum (not mean) exercises non-uniform cotangents
    wts = 1.0 + 0.1 * jnp.arange(x.shape[-1])
    return jnp.sum(ll * wts)


@pytest.mark.parametrize("batched_biases", [True, False])
def test_grads_match_autodiff_of_reference(batched_biases):
    """Custom VJP vs jax.grad through the cumsum form, all five inputs."""
    p, x, bv, bh = _mk(jax.random.PRNGKey(3), d=10, h=8, n=29,
                       batched_biases=batched_biases)
    argnums = (0, 1, 2, 3, 4)
    ref_fn = functools.partial(_ref_logits, form="cumsum")
    g_ref = jax.grad(functools.partial(_bce_loss, ref_fn),
                     argnums=argnums)(x, p.w, p.v, bv, bh)
    g_ker = jax.grad(functools.partial(_bce_loss, _kernel_logits),
                     argnums=argnums)(x, p.w, p.v, bv, bh)
    for name, a, b in zip("x w v bv bh".split(), g_ker, g_ref):
        assert a.shape == b.shape, name
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


@pytest.mark.slow
def test_grads_under_vmap_over_tracks():
    """multinn.loss vmaps the decoder loss over track-stacked params — the
    kernel (and its VJP) must batch correctly under vmap."""
    k_tracks = 3
    keys = jax.random.split(jax.random.PRNGKey(4), k_tracks)
    packs = [_mk(k, d=6, h=5, n=17) for k in keys]
    ws = jnp.stack([pk[0].w for pk in packs])
    vs = jnp.stack([pk[0].v for pk in packs])
    xs = jnp.stack([pk[1] for pk in packs])
    bvs = jnp.stack([pk[2] for pk in packs])
    bhs = jnp.stack([pk[3] for pk in packs])

    def total(logits_fn, ws, vs, xs, bvs, bhs):
        losses = jax.vmap(
            lambda w, v, x, bv, bh: _bce_loss(logits_fn, x, w, v, bv, bh)
        )(ws, vs, xs, bvs, bhs)
        return jnp.sum(losses)

    ref_fn = functools.partial(_ref_logits, form="tri")
    args = (ws, vs, xs, bvs, bhs)
    g_ref = jax.grad(functools.partial(total, ref_fn),
                     argnums=(0, 1, 2, 3, 4))(*args)
    g_ker = jax.grad(functools.partial(total, _kernel_logits),
                     argnums=(0, 1, 2, 3, 4))(*args)
    np.testing.assert_allclose(
        float(total(_kernel_logits, *args)), float(total(ref_fn, *args)),
        rtol=1e-5)
    for name, a, b in zip("w v x bv bh".split(), g_ker, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_log_prob_value_through_kernel_matches_reference():
    """The exact composition nade_ops.nade_log_prob uses on the pallas path."""
    p, x, bv, bh = _mk(jax.random.PRNGKey(5), d=12, h=7, n=33)
    logits = _kernel_logits(x, p.w, p.v, bv, bh)
    ll = (x * jax.nn.log_sigmoid(logits)
          + (1 - x) * jax.nn.log_sigmoid(-logits)).sum(-1)
    ref = nade_nn.log_prob(x, p.w, p.v, bv, bh, form="cumsum")
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_supported_gate_and_tile_pick():
    w32 = jnp.zeros((84, 150), jnp.float32)
    assert nade_ll_pallas.supported(w32, 1024)
    assert nade_ll_pallas.pick_tile(84, 150, 1024) >= 512
    # bf16 weights: unsupported (f32-only kernel)
    assert not nade_ll_pallas.supported(w32.astype(jnp.bfloat16), 1024)
    # absurd H: no tile fits the budget
    assert not nade_ll_pallas.supported(jnp.zeros((84, 300000),
                                                  jnp.float32), 64)


def test_dispatch_stays_on_xla_off_tpu():
    """nade_ops auto dispatch must not pick the kernel on CPU."""
    from multinn_tpu.ops import nade_ops
    p, x, bv, bh = _mk(jax.random.PRNGKey(6), d=8, h=6, n=13)
    out = nade_ops.nade_log_prob(x, p.w, p.v, bv, bh)
    ref = nade_nn.log_prob(x, p.w, p.v, bv, bh,
                           form=nade_ops.default_ll_form())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


@pytest.mark.slow
def test_detailed_loss_equals_hot_path_loss():
    """rnn_nade.loss detailed=True derives the NLL from the (reusable)
    conditional logits instead of nade_log_prob — same math, one pass
    (guards the r4 refactor in models/rnn_nade._nll)."""
    from multinn_tpu.models import multinn
    from multinn_tpu.models.multinn import MultINNConfig
    cfg = MultINNConfig(n_tracks=3, n_pitches=12, mode="feedback",
                        decoder_type="rnn-nade", n_hidden=9, n_rnn=7)
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.bernoulli(jax.random.PRNGKey(1), 0.3,
                             (4, 6, 3, 12)).astype(jnp.float32)
    mask = (jnp.arange(6)[None, :] < jnp.array([6, 4, 6, 3])[:, None]
            ).astype(jnp.float32)
    l_hot, _ = multinn.loss(params, jax.random.PRNGKey(2), x,
                            detailed=False, frame_mask=mask)
    l_det, m = multinn.loss(params, jax.random.PRNGKey(2), x,
                            detailed=True, frame_mask=mask)
    np.testing.assert_allclose(float(l_det), float(l_hot), rtol=1e-6)
    np.testing.assert_allclose(float(m["nll"]), float(l_hot), rtol=1e-6)


def test_forced_pallas_on_unsupported_shape_is_actionable(monkeypatch):
    """A forced 'pallas' LL impl on an unsupported shape/dtype must fail at
    DISPATCH with an actionable message (round-4 review), not deep in the
    kernel wrapper."""
    from multinn_tpu.ops import nade_ops
    p, x, bv, bh = _mk(jax.random.PRNGKey(7), d=8, h=6, n=13)
    w16 = p.w.astype(jnp.bfloat16)
    monkeypatch.setenv("MULTINN_NADE_LL_IMPL", "pallas")
    with pytest.raises(ValueError, match="MULTINN_NADE_LL_IMPL"):
        nade_ops.nade_log_prob(x, w16, p.v, bv, bh)
    # and the explicit-arg route hits the same gate
    monkeypatch.delenv("MULTINN_NADE_LL_IMPL")
    with pytest.raises(ValueError, match="does not support"):
        nade_ops.nade_conditionals_logits(x, w16, p.v, bv, bh, impl="pallas")
